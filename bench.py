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


def _tf_corpus(n_files: int) -> str:
    """Deterministic synthetic .tf corpus (~n_files files, 3 resources +
    1 variable + 1 output each) for the parse-throughput benchmark."""
    import tempfile

    d = tempfile.mkdtemp(prefix="tf_bench_")
    for i in range(n_files):
        with open(f"{d}/mod_{i:04d}.tf", "w") as f:
            f.write(
                f'''variable "env_{i}" {{
  type    = string
  default = "dev-{i}"
}}

resource "aws_instance" "app_{i}" {{
  ami           = "ami-{i:08x}"
  instance_type = var.env_{i} == "prod" ? "m5.large" : "t3.micro"
  count         = {i % 5}
  tags = {{ Name = "app-{i}", Index = {i} }}
}}

resource "aws_s3_bucket" "b_{i}" {{
  bucket = "bucket-{i}"
  lifecycle {{ prevent_destroy = true }}
}}

resource "aws_security_group" "sg_{i}" {{
  name = "sg-{i}"
  ingress {{
    from_port = 443
    to_port   = 443
  }}
  ingress {{
    from_port = 80
    to_port   = 80
  }}
}}

output "app_id_{i}" {{
  value = aws_instance.app_{i}[0].id
}}
'''
            )
    return d


def bench_tf_parse(spark, n_files: int = 500) -> float:
    """Full 7-table materialization over n_files HCL files (one parse pass,
    executor-parallel — the reference serializes this behind a mutex)."""
    from steampipe_plugin_terraform_spark import TerraformEngine

    import shutil

    d = _tf_corpus(n_files)
    try:
        start = time.perf_counter()
        eng = TerraformEngine(spark, config_paths=[f"{d}/*.tf"], cache=False)
        eng.wide().write.format("noop").mode("overwrite").save()
        return time.perf_counter() - start
    finally:
        shutil.rmtree(d, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    # JVM/codegen warmup so the first measured query isn't paying JIT cost
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # Python-worker/Arrow warmup so the first pandas-path query isn't paying
    # worker spin-up (mapInPandas and cogrouped applyInPandas lanes)
    wdf = spark.range(64).selectExpr("id", "id % 4 AS k")
    wdf.mapInPandas(lambda it: it, "id long, k long").write.format("noop").mode("overwrite").save()
    (
        wdf.groupby("k")
        .cogroup(wdf.groupby("k"))
        .applyInPandas(lambda l, r: l, "id long, k long")
        .write.format("noop").mode("overwrite").save()
    )
    # page-cache prewarm: pull the input bytes once so per-query timings
    # measure compute, not which query happens to pay the cold disk read
    import glob as _glob

    for p in _glob.glob(os.path.join(sf_dir, "*.parquet")):
        with open(p, "rb") as f:
            while f.read(1 << 22):
                pass

    # best-of-2 per query: the box shows intermittent multi-second
    # hypervisor CPU-steal windows (a 3 s query can read 15 s), and run 1
    # additionally pays one-time whole-stage-codegen compilation. The min
    # of two runs is the standard way to report the query's actual compute
    # cost under both noise sources; BOTH samples also go into the JSON
    # ("samples") so a regression can be adjudicated against noise from the
    # recorded artifact alone, without the stderr log.
    timings: dict[str, float] = {}
    all_samples: dict[str, list[float]] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        samples = []
        for _ in range(2):
            start = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - start)
        timings[name] = round(min(samples), 3)
        all_samples[name] = [round(s, 3) for s in samples]
        print(f"# {name}: {timings[name]}s (samples: {all_samples[name]})", file=sys.stderr)

    # round-5 extension flagships: timed once (not best-of-2) and reported
    # under "extended", NOT summed into "value" — the headline total stays
    # comparable across rounds while new operators still get a throughput
    # record in the artifact.
    extended: dict[str, float] = {}
    for name in [
        "docs_semantic_dedup",
        "emb_cluster_balanced_sample",
        "emb_curation_pipeline",
        "docs_temperature_sample",
        "media_byte_histogram",
        "q_incident_click_range_join",
        "q_bucketed_cokey_join",
        "q_events_daily_rollup",
    ]:
        start = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        extended[name] = round(time.perf_counter() - start, 3)
        print(f"# extended {name}: {extended[name]}s", file=sys.stderr)

    parse_samples = [bench_tf_parse(spark, 500) for _ in range(2)]
    timings["tf_parse_500_files"] = round(min(parse_samples), 3)
    all_samples["tf_parse_500_files"] = [round(s, 3) for s in parse_samples]
    print(
        f"# tf_parse_500_files: {timings['tf_parse_500_files']}s "
        f"(samples: {all_samples['tf_parse_500_files']})",
        file=sys.stderr,
    )

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "samples": all_samples,
        "extended": extended,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
