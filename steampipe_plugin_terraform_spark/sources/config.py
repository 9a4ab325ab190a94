"""Connection config: the reference's ``.spc`` defaults and loader.

Behavior port of ``connection_config.go:7-12`` + ``config/terraform.spc:23-25``:

- four HCL list attributes: ``configuration_file_paths``, ``plan_file_paths``,
  ``state_file_paths``, and the deprecated ``paths`` (which, when set, is
  used as the configuration list — utils.go:71-75).
- out-of-box defaults (terraform.spc:23-25): ``["*.tf"]`` config,
  ``["tfplan.json", "*.tfplan.json"]`` plan, ``["*.tfstate"]`` state — all
  resolved relative to the CWD ("Defaults to CWD", terraform.spc:22).
- ``.spc`` files are HCL; we parse them with the same parser that handles
  ``.tf`` files (hcl/parser.py), so quoting/comment semantics match.

Defaults apply only when NO path list is configured (utils.go:64-67 returns
early — i.e. an explicitly empty config scans nothing only if a list is
present); mirroring that, ``resolve()`` falls back to the defaults when all
four fields are None.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from ..hcl.parser import parse_file as _parse_hcl

DEFAULT_CONFIGURATION_FILE_PATHS = ["*.tf"]
DEFAULT_PLAN_FILE_PATHS = ["tfplan.json", "*.tfplan.json"]
DEFAULT_STATE_FILE_PATHS = ["*.tfstate"]

_FIELDS = ("configuration_file_paths", "paths", "plan_file_paths", "state_file_paths")


@dataclass
class TerraformConnectionConfig:
    """The reference's ``terraformConfig`` struct (connection_config.go:7-12).

    ``None`` means "not configured" (HCL ``optional``); an explicit empty
    list means "configured to scan nothing", matching Go nil-vs-empty-slice
    semantics in utils.go:64-75.
    """

    configuration_file_paths: list[str] | None = None
    paths: list[str] | None = None  # deprecated alias (utils.go:71-75)
    plan_file_paths: list[str] | None = None
    state_file_paths: list[str] | None = None

    def resolve(self, base_dir: str | None = None) -> tuple[list[str], list[str], list[str]]:
        """(config, plan, state) glob lists with defaults + base-dir applied.

        Relative globs are anchored at ``base_dir`` (default: process CWD),
        the reference's "Local paths are resolved relative to the CWD"
        (terraform.spc:10). Remote URLs and absolute paths pass through.
        """
        if all(getattr(self, f) is None for f in _FIELDS):
            config = list(DEFAULT_CONFIGURATION_FILE_PATHS)
            plan = list(DEFAULT_PLAN_FILE_PATHS)
            state = list(DEFAULT_STATE_FILE_PATHS)
        else:
            # deprecated `paths` wins over configuration_file_paths when set
            config = list(
                self.paths
                if self.paths is not None
                else (self.configuration_file_paths or [])
            )
            plan = list(self.plan_file_paths or [])
            state = list(self.state_file_paths or [])

        base = os.path.abspath(base_dir) if base_dir else os.getcwd()

        def anchor(p: str) -> str:
            if "://" in p or "::" in p or p.startswith(("~", os.sep)):
                return p
            return os.path.join(base, p)

        return [anchor(p) for p in config], [anchor(p) for p in plan], [anchor(p) for p in state]


def load_spc(path: str, connection: str | None = None) -> TerraformConnectionConfig:
    """Parse a Steampipe ``.spc`` file into a TerraformConnectionConfig.

    Reads the first ``connection`` block (or the one whose label matches
    ``connection``); unknown attributes (``plugin = ...``) are ignored, like
    the SDK's HCL decode of tagged struct fields.
    """
    with open(path, encoding="utf-8") as f:
        src = f.read()
    return parse_spc(src, connection)


def parse_spc(src: str, connection: str | None = None) -> TerraformConnectionConfig:
    for block in _parse_hcl(src):
        if block.block_type != "connection":
            continue
        if connection is not None and (not block.labels or block.labels[0] != connection):
            continue
        kwargs = {}
        for field in _FIELDS:
            if field in block.body:
                val = block.body[field]
                if not isinstance(val, list):
                    raise ValueError(f"{field} must be a list of strings, got {val!r}")
                kwargs[field] = [str(v) for v in val]
        return TerraformConnectionConfig(**kwargs)
    raise ValueError(
        f"no connection block{' ' + connection if connection else ''} found in .spc source"
    )
