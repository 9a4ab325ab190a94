"""Branch pins for the staged tf_plan_state_drift entry on a SYNTHETIC
corpus — the fixture corpus's plan matches its state except for one
destroy, so the golden oracle never exercises ``create_pending`` or
``scale_pending``; this corpus manufactures both. Also pins the
maintenance identities behind the other two r10-staged entries:
incremental IVF ingest ≡ full re-assignment against the same frozen
centroids (at a SECOND batch split, so the entry's own 1/8 split isn't
the only covered point), and merged log-sketches ≡ the whole-data
sketch bucket-for-bucket."""

import json

from pyspark.sql import functions as F

from steampipe_plugin_terraform_spark.catalog import _plan_state_drift_frame
from steampipe_plugin_terraform_spark.engine import TerraformEngine


def _plan(resources):
    return json.dumps(
        {
            "format_version": "1.2",
            "terraform_version": "1.5.0",
            "planned_values": {"root_module": {"resources": resources}},
        }
    )


def _state(resources):
    return json.dumps(
        {"version": 4, "terraform_version": "1.5.0", "resources": resources}
    )


def _inst(n):
    return [{"index_key": i, "attributes": {"id": f"i-{i}"}} for i in range(n)]


def test_plan_state_drift_branches(spark, tmp_path):
    (tmp_path / "tfplan.json").write_text(
        _plan(
            [
                # scale-up: plan holds 3 instances, state holds 2
                *[
                    {"address": f"aws_instance.web[{i}]", "mode": "managed",
                     "type": "aws_instance", "name": "web", "values": {}}
                    for i in range(3)
                ],
                # matches state exactly
                {"address": "aws_s3_bucket.logs", "mode": "managed",
                 "type": "aws_s3_bucket", "name": "logs", "values": {}},
                # planned, nothing applied yet
                {"address": "aws_sqs_queue.new", "mode": "managed",
                 "type": "aws_sqs_queue", "name": "new", "values": {}},
                # data-mode planned rows never count
                {"address": "data.aws_ami.ubuntu", "mode": "data",
                 "type": "aws_ami", "name": "ubuntu", "values": {}},
            ]
        )
    )
    (tmp_path / "terraform.tfstate").write_text(
        _state(
            [
                {"mode": "managed", "type": "aws_instance", "name": "web",
                 "provider": "p", "instances": _inst(2)},
                {"mode": "managed", "type": "aws_s3_bucket", "name": "logs",
                 "provider": "p", "instances": _inst(1)},
                # applied but absent from the planned end-state
                {"mode": "managed", "type": "aws_eip", "name": "gone",
                 "provider": "p", "instances": _inst(1)},
            ]
        )
    )
    eng = TerraformEngine(
        spark,
        plan_paths=[f"{tmp_path}/tfplan.json"],
        state_paths=[f"{tmp_path}/terraform.tfstate"],
        cache=False,
    )
    out = _plan_state_drift_frame(
        eng.wide()
        .filter(F.col("tf_table") == "terraform_resource")
        .select("address", "mode", "file_kind")
    )
    rows = {
        r.address: (r.planned_instances, r.applied_instances, r.action)
        for r in out.collect()
    }
    assert rows == {
        "aws_instance.web": (3, 2, "scale_pending"),
        "aws_s3_bucket.logs": (1, 1, "no_change"),
        "aws_sqs_queue.new": (1, 0, "create_pending"),
        "aws_eip.gone": (0, 1, "destroy_pending"),
    }


def test_ivf_incremental_identity_second_split(spark):
    """assign_to_centroids(batch) ∪ base assignment must equal the full
    re-assignment against the same frozen centroids at a split OTHER
    than the entry's own 1/8 (here 1/4) — per-row independence is the
    whole identity, so it must hold at any batch boundary."""
    from steampipe_plugin_terraform_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    corpus = emb.filter(F.col("vec_id") >= 10)
    base = corpus.filter(F.col("vec_id") % 4 != 3)
    batch = corpus.filter(F.col("vec_id") % 4 == 3)
    base_assigned, cents = similarity.kmeans_lloyd(base, k=16, iters=2)
    merged = base_assigned.unionByName(
        similarity.assign_to_centroids(batch, cents)
    )
    full = similarity.assign_to_centroids(corpus, cents)
    m = {r.vec_id: r.bucket for r in merged.collect()}
    f = {r.vec_id: r.bucket for r in full.collect()}
    assert m == f and len(m) == corpus.count()


def test_logsketch_merge_equals_whole_bucket_exact(spark):
    """Merged slice sketches must equal the whole-data sketch
    BUCKET-FOR-BUCKET (not just at the quantile estimates): counts are
    additive and the bucket key carries no per-sketch state."""
    from steampipe_plugin_terraform_spark.operators import sketch

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    cents = orders.select(
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias("v"),
        "o_orderdate",
    )
    cut = "1995-01-01"
    parts = [
        sketch.logsketch(cents.filter(F.col("o_orderdate") < F.lit(cut)), "v"),
        sketch.logsketch(cents.filter(F.col("o_orderdate") >= F.lit(cut)), "v"),
    ]
    merged = {(r.lb, r.cnt) for r in sketch.logsketch_merge(parts).collect()}
    whole = {(r.lb, r.cnt) for r in sketch.logsketch(cents, "v").collect()}
    assert merged == whole and len(whole) > 10
