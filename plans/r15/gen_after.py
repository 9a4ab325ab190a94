#!/usr/bin/env python
"""Regenerate plans/r15/<query>_after.txt — the .explain("formatted")
output at sf0.1 for every query with a committed _before.txt (the r15
judge checks plan-diff claims against these files).

Usage: python plans/r15/gen_after.py [suffix]   (default: after)
"""
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from steampipe_plugin_terraform_spark.catalog import QUERIES, STAGED_QUERIES
from steampipe_plugin_terraform_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
HERE = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "after"
    names = sorted(
        os.path.basename(p)[: -len("_before.txt")]
        for p in glob.glob(os.path.join(HERE, "*_before.txt"))
    )
    spark = get_spark("plans-r15")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = QUERIES.get(name) or STAGED_QUERIES[name]
        df = fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out = os.path.join(HERE, f"{name}_{suffix}.txt")
        with open(out, "w") as f:
            f.write(plan)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
