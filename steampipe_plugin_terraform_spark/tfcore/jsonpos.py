"""Locate block line spans inside plan/state JSON text.

Behavior port of ``findBlockLinesFromJSON`` / ``getSourceFromFile``
(/root/reference/terraform/utils.go:376-567), operating on an in-memory text
column instead of re-opening the file per row. Semantics preserved:

- pretty-printed JSON: brace-counting line scan; a resource block starts at
  the line of the most recent ``{`` when its identifying pair is seen
  (plan: ``"address": X`` then peek-forward for ``"type": Y``;
  state: ``"type": X`` then peek-forward for ``"name": Y``), and ends on the
  line where the running brace counter returns to zero
- ``outputs`` map: the named key's ``"name": {`` line starts the block;
  counting ``{``/``}`` per line closes it (``variables`` intentionally has no
  named-key handling and always lands in the fallback, matching the reference)
- source text is the inclusive line range, each line suffixed with ``\n``
  (getSourceFromFile appends a newline per line — unlike the HCL getBlock
  join, which has no trailing newline)
- single-line (unformatted) JSON fallback (utils.go:496-547): lines 1..N,
  and for plan files the matching resource object re-serialized (sorted-key
  compact JSON, Go map-marshal order) becomes the ``source``
"""

from __future__ import annotations

import json
import re
from typing import Any

from ..functions.jsonenc import canonical_json

_PLAN_RESOURCES_RE = re.compile(r'"planned_values":\{.*"root_module":\{"resources":(.*)\}\},"resource_changes"')


def find_block_lines(text: str, block_name: str, *path_name: str) -> tuple[int, int, str]:
    """Return (start_line, end_line, source) for a block in JSON text.

    ``block_name`` is ``"resources"``, ``"outputs"``, or ``"variables"``;
    ``path_name`` is (address, type) for plan resources, (type, name) for
    state resources, or (name,) for outputs/variables.
    """
    lines = text.split("\n")
    current_line = 0
    start_line = end_line = 0
    bracket_counter = start_counter = 0
    in_block = in_output = in_target = False

    def peek_contains(from_line: int, needle: str) -> bool:
        # scan forward until the needle or a closing brace (utils.go:429-439)
        k = from_line  # 1-based index of the line AFTER the trigger line
        while k < len(lines):
            peek = lines[k]
            if needle in peek:
                return True
            if "}" in peek:
                return False
            k += 1
        return False

    for raw in lines:
        current_line += 1
        trimmed = raw.strip()

        if not in_block and (trimmed == f'"{block_name}": {{' or trimmed == f'"{block_name}": ['):
            in_block = True
            start_line = current_line
            continue
        elif in_block and block_name == "outputs" and path_name and trimmed == f'"{path_name[0]}": {{':
            # NOTE: only "outputs" gets named-key handling; "variables" falls
            # through to the whole-file fallback exactly like the reference
            # (utils.go:406 checks blockName == "outputs" only)
            in_output = True
            bracket_counter = 1
            start_line = current_line
            continue
        elif in_block and block_name == "resources":
            if "{" in trimmed:
                bracket_counter += 1
                start_counter = current_line
            if "}" in trimmed:
                bracket_counter -= 1

            # plan files: address+type is the unique pair (utils.go:420-445)
            if len(path_name) >= 2 and f'"address": "{path_name[0]}"' in trimmed:
                if peek_contains(current_line, f'"type": "{path_name[1]}"'):
                    in_target = True
                    start_line = start_counter

            # state files: type+name pair (utils.go:447-469)
            if len(path_name) >= 2 and f'"type": "{path_name[0]}"' in trimmed:
                if peek_contains(current_line, f'"name": "{path_name[1]}"'):
                    in_target = True
                    start_line = start_counter

        if in_block and in_output and not in_target:
            bracket_counter += raw.count("{")
            bracket_counter -= raw.count("}")
            if bracket_counter == 0:
                end_line = current_line
                break

        if in_block and in_target and bracket_counter == 0:
            end_line = current_line
            break

    source = _source_lines(lines, start_line, end_line)

    if start_line != 0 and end_line == 0:
        start_line = 0

    if start_line == 0 and end_line == 0:
        # unformatted single-line JSON fallback (utils.go:496-547)
        start_line = 1
        end_line = current_line if current_line else 1
        m = _PLAN_RESOURCES_RE.search(text)
        if m and len(path_name) >= 2:
            try:
                resources: list[Any] = json.loads(m.group(1))
            except (ValueError, TypeError):
                return start_line, end_line, source
            for r in resources:
                blob = canonical_json(r)
                if path_name[0] in blob and path_name[1] in blob and isinstance(r, dict):
                    source = blob
    return start_line, end_line, source


def _source_lines(lines: list[str], start_line: int, end_line: int) -> str:
    if start_line <= 0 or end_line < start_line:
        return ""
    return "".join(ln + "\n" for ln in lines[start_line - 1 : end_line])
