#!/usr/bin/env python
"""Benchmark headline queries; prints ONE JSON line for the driver.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. Each query materializes fully via the noop sink
(no driver-side collect — measures cluster-shaped execution)."""

from __future__ import annotations

import json
import os
import re
import sys
import time

from steampipe_plugin_terraform_spark.catalog import QUERIES
from steampipe_plugin_terraform_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q_top3_orders_per_segment",
    "q_rollup_revenue",
    "q_events_sessions",
    "q_events_hourly",
    "dedup_first_event",
    "docs_token_stats",
    "docs_fingerprint",
    "dedup_jaccard_pairs",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "emb_cosine_topk",
    "emb_near_dup_pairs",
    "docs_winnow_fingerprint",
    "docs_zscore_by_lang",
    "media_metadata",
    "tf_resources",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    # JVM/codegen warmup so the first measured query isn't paying JIT cost
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        start = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - start, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
