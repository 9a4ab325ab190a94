"""Corpus-sized cluster counts (round-6: the k=16 pin became a floor).

``catalog._effective_k`` sizes Lloyd's k as max(K_MIN, ceil(N/K_TARGET)) so
per-cluster work stays ~K_TARGET² regardless of corpus size, and the
oracle's ``ksel`` CTE derives the SAME k from the corpus count inside the
SQL — one static oracle string that stays value-exact at every SF. These
tests pin (a) the sizing rule itself, (b) that the two SF families really
exercise DIFFERENT effective k, and (c) full Spark↔DuckDB value parity for
the Lloyd-backed entries at the larger-k SF."""

import sys

import pytest

from steampipe_plugin_terraform_spark import catalog
from steampipe_plugin_terraform_spark.catalog import ORACLES, QUERIES

sys.path.insert(0, "tests")
from parity import compare, duckdb_con  # noqa: E402

SF_SMALL = "/root/testdata/sf0.01"   # 500 vectors  -> k = 16 (floor)
SF_LARGE = "/root/testdata/sf0.1"    # 2000 vectors -> k = 32 (scaled)


def test_effective_k_rule():
    assert catalog._effective_k(1) == 16
    assert catalog._effective_k(500) == 16
    assert catalog._effective_k(16 * 64) == 16          # exactly at the floor
    assert catalog._effective_k(16 * 64 + 1) == 17      # first scaled value
    assert catalog._effective_k(2000) == 32
    assert catalog._effective_k(10**9) == 15625000      # rule is unbounded


def test_sf_families_differ_in_effective_k(spark):
    n_small = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").count()
    n_large = spark.read.parquet(f"{SF_LARGE}/embeddings.parquet").count()
    k_small, k_large = catalog._effective_k(n_small), catalog._effective_k(n_large)
    assert k_small == 16 and k_large > k_small


def test_spark_side_uses_scaled_k(spark):
    _, centroids = catalog._kmeans16(spark, SF_LARGE, "full")
    n = spark.read.parquet(f"{SF_LARGE}/embeddings.parquet").count()
    assert len(centroids) == catalog._effective_k(n) > 16


@pytest.mark.parametrize(
    "name",
    [
        "emb_cluster_balanced_sample",  # Lloyd(k=32) + md5-rank sampler
        "docs_semantic_dedup",          # Lloyd(k=32) + per-cluster prune
        "emb_ivf_topk",                 # Lloyd(k=32) over the ge10 corpus
    ],
)
def test_lloyd_entries_parity_at_scaled_k(spark, name):
    ok, msg = compare(
        QUERIES[name](spark, SF_LARGE), duckdb_con(SF_LARGE), ORACLES[name]
    )
    assert ok, f"{name} @ {SF_LARGE}: {msg}"
