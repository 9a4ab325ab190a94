"""Similarity-search operator tests: brute force vs LSH vs IVF."""

import pytest
from pyspark.sql import functions as F

from steampipe_plugin_terraform_spark.operators.similarity import (
    build_ivf,
    cosine_topk,
    ivf_topk,
    lsh_cosine_topk,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def split(emb):
    return emb.filter(F.col("vec_id") < 10), emb.filter(F.col("vec_id") >= 10)


def _pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def test_ivf_full_probe_equals_brute_force(spark, split):
    queries, corpus = split
    exact = cosine_topk(queries, corpus, k=5)
    assigned, centroids = build_ivf(corpus, n_centroids=8)
    ivf_all = ivf_topk(queries, assigned, centroids, k=5, nprobe=8)
    assert _pairs(ivf_all) == _pairs(exact)
    # identical rounded scores, not just the same ids
    exact_rows = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact.collect()}
    for r in ivf_all.collect():
        assert exact_rows[(r["query_id"], r["neighbor_id"])] == r["cosine"]


def test_ivf_partial_probe_recall(spark, split):
    queries, corpus = split
    exact = _pairs(cosine_topk(queries, corpus, k=5))
    assigned, centroids = build_ivf(corpus, n_centroids=8)
    approx = _pairs(ivf_topk(queries, assigned, centroids, k=5, nprobe=4))
    recall = len(exact & approx) / len(exact)
    # random embeddings cluster weakly; half the buckets should still
    # recover a solid share of true neighbors
    assert recall >= 0.4, f"recall {recall}"


def test_lsh_topk_shape_and_bucket_pruning(spark, split):
    queries, corpus = split
    res = lsh_cosine_topk(queries, corpus, num_planes=8, k=5)
    rows = res.collect()
    assert rows  # bucketing returns results for at least some queries
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_ivf_store_roundtrip_and_pruning(spark, tmp_path):
    from steampipe_plugin_terraform_spark.operators.similarity import (
        build_ivf,
        ivf_load,
        ivf_save,
        ivf_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.limit(5)
    assigned, cents = build_ivf(emb, n_centroids=8)
    path = str(tmp_path / "ivf")
    ivf_save(assigned, cents, path)
    loaded, c2 = ivf_load(spark, path)
    assert c2 == cents
    mem = sorted(map(tuple, ivf_topk(queries, assigned, cents, k=3, nprobe=2).collect()))
    disk = sorted(map(tuple, ivf_topk(queries, loaded, c2, k=3, nprobe=2, static_prune=True).collect()))
    assert mem == disk
    # the serving probe must PRUNE: the store scan's PartitionFilters carry
    # the probed-bucket IN list (reads nprobe partitions, not the corpus)
    plan = (
        ivf_topk(queries, loaded, c2, k=3, nprobe=2, static_prune=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    scan_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert any("bucket" in l and "IN" in l for l in scan_lines), scan_lines
