#!/usr/bin/env python
"""Steal-annotated noop timing of catalog entries (bench protocol:
1 untimed warm pass + N timed passes, min reported). Usage:
  python plans/r16/timeq.py [-n N] [--cold] name [name ...]
--cold reports the FIRST pass (fresh plan, codegen cold) separately.
Runs at sf0.1 on the bench session factory, local[32]."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from steampipe_plugin_terraform_spark.catalog import QUERIES, STAGED_QUERIES
from steampipe_plugin_terraform_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"


def steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def main() -> None:
    args = sys.argv[1:]
    n = 3
    cold = False
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    if args and args[0] == "--cold":
        cold = True
        args = args[1:]
    spark = get_spark("timeq")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    wdf = spark.range(64).selectExpr("id", "id % 4 AS k")
    wdf.mapInPandas(lambda it: it, "id long, k long").write.format("noop").mode(
        "overwrite"
    ).save()
    for name in args:
        fn = QUERIES.get(name) or STAGED_QUERIES[name]

        def run():
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

        spark.sparkContext.setJobDescription(f"timeq:{name}")
        samples = []
        s0, t0 = steal(), time.perf_counter()
        run()  # warm pass (reported only with --cold)
        warm_t, warm_s = time.perf_counter() - t0, steal() - s0
        for _ in range(n):
            s0, t0 = steal(), time.perf_counter()
            run()
            samples.append((round(time.perf_counter() - t0, 3), steal() - s0))
        secs = [s for s, _ in samples]
        cold_note = f" cold={warm_t:.3f}s/steal{warm_s}" if cold else ""
        print(
            f"{name}: min={min(secs):.3f}s samples={samples}{cold_note}",
            flush=True,
        )
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
