"""Catalog-wide physical-plan anti-pattern scan: every batch entry's
declared plan is checked for the two classes of scale-killer that
individual plan-shape tests can't keep up with as the catalog grows:

- ``CartesianProduct`` — a non-broadcast cross join. The catalog's only
  cross joins are 1-row scalar broadcasts, which plan as
  BroadcastNestedLoopJoin over a single-row side (allowed); a real
  cartesian means a join condition got lost.
- ``BatchEvalPython`` — a row-at-a-time Python UDF in the plan. The
  repo's contract (CLAUDE.md) is JVM expressions or Arrow-batched
  mapInPandas/applyInPandas only; those plan as MapInPandas /
  FlatMapGroupsInPandas nodes, never BatchEvalPython.

Streaming entries are excluded (invoking them executes a drain, and
their plans live behind writeStream); the terraform entries run the HCL
parse inside mapInPandas and are covered by the same scan.
"""

import pytest

from steampipe_plugin_terraform_spark.catalog import QUERIES, STAGED_QUERIES

SF = "/root/testdata/sf0.001"

# executing these starts streams or writes session stores; the batch
# plan-only scan covers everything else
_SKIP_PREFIXES = ("stream_",)

# staged (pre-promotion) entries are held to the same bar from day one —
# an anti-pattern caught at staging time never reaches the driver surface
_ALL = {**QUERIES, **STAGED_QUERIES}

_BATCH = sorted(
    n for n in _ALL if not n.startswith(_SKIP_PREFIXES)
)


@pytest.mark.parametrize("name", _BATCH)
def test_no_cartesian_no_python_udf(spark, name):
    plan = _ALL[name](spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: non-broadcast cross join"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
