#!/usr/bin/env python
"""Capture .explain('formatted') for named catalog entries into
plans/r16/<name>_<suffix>.txt. Usage:
  python plans/r16/capture.py before q_basket_brand_lift dedup_minhash_lsh ...
Runs at sf0.1 on the bench session factory so plans match the bench."""

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from steampipe_plugin_terraform_spark.catalog import QUERIES, STAGED_QUERIES
from steampipe_plugin_terraform_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
OUT = Path(__file__).resolve().parent


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = QUERIES.get(name) or STAGED_QUERIES[name]
        df = fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (OUT / f"{name}_{suffix}.txt").write_text(buf.getvalue())
        txt = buf.getvalue()
        print(
            f"{name}: scans={txt.count('Scan parquet')} "
            f"exchanges={txt.count('Exchange')} joins={txt.count('Join')} "
            f"-> {name}_{suffix}.txt"
        )


if __name__ == "__main__":
    main()
