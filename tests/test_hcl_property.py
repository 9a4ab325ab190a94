"""Property tests for the HCL parser (hypothesis).

Invariants:
1. literal round-trip: any JSON-ish literal rendered as HCL parses back to
   the same Python value
2. totality: arbitrary text either parses or raises HCLParseError — never
   IndexError/KeyError/RecursionError
3. positions: every block's span is ordered and within the file
"""

import json

from hypothesis import given, settings, strategies as st

from steampipe_plugin_terraform_spark.hcl import parse_document, parse_file
from steampipe_plugin_terraform_spark.hcl.parser import HCLParseError

# strings safe to embed in quoted HCL without escaping machinery
_safe_text = st.text(
    alphabet=st.characters(
        codec="ascii", exclude_characters='"\\$%{}\n\r', exclude_categories=("Cc",)
    ),
    max_size=20,
)

_ident = st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True)

_literal = st.recursive(
    st.one_of(
        st.integers(min_value=-(2**31), max_value=2**31),
        st.booleans(),
        st.none(),
        _safe_text,
    ),
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(_ident, children, max_size=4),
    ),
    max_leaves=12,
)


def _render(v) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return json.dumps(v)
    if isinstance(v, str):
        return '"' + v + '"'
    if isinstance(v, list):
        return "[" + ", ".join(_render(i) for i in v) + "]"
    if isinstance(v, dict):
        return "{ " + ", ".join(f"{k} = {_render(x)}" for k, x in v.items()) + " }"
    raise TypeError(type(v))


@given(_literal)
@settings(max_examples=200, deadline=None)
def test_literal_round_trip(value):
    src = f'resource "t" "n" {{\n  x = {_render(value)}\n}}\n'
    doc = parse_document(src)
    assert doc["resource"]["t"]["n"]["x"] == value


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_parser_total(src):
    try:
        parse_file(src)
    except HCLParseError:
        pass  # rejection is fine; any other exception type is a bug


@given(st.lists(st.tuples(_ident, _ident, st.dictionaries(_ident, st.integers(-100, 100), max_size=3)), min_size=1, max_size=5))
@settings(max_examples=100, deadline=None)
def test_block_positions_ordered(blocks_spec):
    lines = []
    for btype, label, body in blocks_spec:
        lines.append(f'{btype} "{label}" {{')
        for k, v in body.items():
            lines.append(f"  {k} = {v}")
        lines.append("}")
    src = "\n".join(lines) + "\n"
    n_lines = src.count("\n")
    blocks = parse_file(src)
    assert len(blocks) == len(blocks_spec)
    prev_end = 0
    for b in blocks:
        assert 1 <= b.start_line <= b.end_line <= n_lines
        assert b.start_line > prev_end
        prev_end = b.end_line
