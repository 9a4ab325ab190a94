#!/usr/bin/env python
"""Steal-annotated per-entry timing harness (round-15 measurement tool).

Usage: python plans/r15/timeq.py <entry> [<entry> ...] [--n N]

For each entry: one untimed warm pass, then N (default 4) timed noop-sink
passes; prints each sample with the hypervisor-steal ticks accrued during
it (/proc/stat cpu field 8). Min of low-steal samples is the honest
number (the box's noise is one-sided).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from steampipe_plugin_terraform_spark.catalog import QUERIES, STAGED_QUERIES
from steampipe_plugin_terraform_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = 4
    for a in sys.argv[1:]:
        if a.startswith("--n"):
            n = int(a.split("=")[1]) if "=" in a else int(sys.argv[sys.argv.index(a) + 1])
    spark = get_spark("timeq")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    wdf = spark.range(64).selectExpr("id", "id % 4 AS k")
    wdf.mapInPandas(lambda it: it, "id long, k long").write.format("noop").mode("overwrite").save()
    for name in args:
        fn = QUERIES.get(name) or STAGED_QUERIES[name]

        def run(fn=fn):
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

        spark.sparkContext.setJobDescription(f"timeq:{name}:warm")
        run()
        samples = []
        for i in range(n):
            spark.sparkContext.setJobDescription(f"timeq:{name}:{i}")
            s0, t0 = steal(), time.perf_counter()
            run()
            dt, ds = time.perf_counter() - t0, steal() - s0
            samples.append((dt, ds))
            print(f"  {name} sample {i}: {dt:.3f}s steal={ds}", flush=True)
        low = [dt for dt, ds in samples if ds <= 2 * max(1, int(samples[0][0]) + 1)]
        best = min(dt for dt, _ in samples)
        print(f"{name}: min={best:.3f}s  samples={[(round(d,3), s) for d, s in samples]}", flush=True)


if __name__ == "__main__":
    main()
