"""Canonical JSON rendering for expression values and argument maps.

Behavior contract (reference: /root/reference/terraform/utils.go:210-251
``convertExpressionValue`` and Go ``encoding/json`` map marshaling):

- numbers/bools render as bare JSON scalars (``2``, ``true``); integral floats
  render without a decimal point (Go cty numbers marshal ``2``, not ``2.0``)
- strings render JSON-quoted (``"\"${var.foo}\""`` for expression strings)
- maps render as compact JSON objects with **sorted keys** (Go marshals map
  keys in sorted order)
- arrays render as ``[item,item,...]`` where each item is recursively
  converted — note this matches utils.go:236-245, which joins *converted*
  strings, so an array of strings becomes ``["a","b"]`` exactly like JSON
- ``null`` renders as ``null``

One canonicalizer for the whole engine (SURVEY.md §7.4 risk 1): every JSON
column in every table goes through this module, so value-hash comparisons are
deterministic.
"""

from __future__ import annotations

import json
from typing import Any


def _norm(v: Any) -> Any:
    """Normalize numeric types the way Go cty does: integral floats → int."""
    if isinstance(v, bool):
        return v
    if isinstance(v, float) and v.is_integer():
        return int(v)
    if isinstance(v, dict):
        return {k: _norm(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_norm(x) for x in v]
    return v


def canonical_json(v: Any) -> str:
    """Compact, sorted-key JSON — the engine-wide canonical form."""
    return json.dumps(_norm(v), sort_keys=True, separators=(",", ":"), ensure_ascii=False)


def convert_expression_value(v: Any) -> str:
    """Serialize a parsed HCL value to its JSON-string column form.

    Port of the behavior of ``convertExpressionValue``
    (/root/reference/terraform/utils.go:210-251): scalars via JSON marshal,
    maps via (sorted-key) JSON marshal, arrays recursively joined.
    """
    if v is None or isinstance(v, (bool, int, float)):
        return canonical_json(v)
    if isinstance(v, str):
        return json.dumps(v, ensure_ascii=False)
    if isinstance(v, dict):
        return canonical_json(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(convert_expression_value(i) for i in v) + "]"
    raise TypeError(f"cannot convert value of type {type(v).__name__}")
