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
    # round-7 sqrt cap: binds only above K_TARGET² = 4096 (never at a
    # tested SF); bounds assignment FLOPs and the centroid broadcast
    assert catalog._effective_k(4096) == 64             # crossover: both rules agree
    assert catalog._effective_k(4097) == 65             # sqrt cap takes over
    assert catalog._effective_k(10**6) == 1000          # was 15625 uncapped
    assert catalog._effective_k(10**9) == 31623         # was 15625000 uncapped


def test_effective_k_matches_duckdb_ksel():
    """The python rule and the oracle's ksel SQL expression must agree —
    including around perfect squares, where ceil(sqrt(n)) is the risky
    spot (IEEE sqrt of a perfect square ≤ 2^52 is exact, so no ulp
    divergence is possible)."""
    import duckdb

    probe = [1, 500, 2000, 4095, 4096, 4097, 10**6 - 1, 10**6, 10**6 + 1,
             31622**2, 31622**2 + 1, 10**9]
    for n in probe:
        sql_k = duckdb.sql(
            f"SELECT GREATEST({catalog._K_MIN}, LEAST("
            f"CAST(ceil({n} / {catalog._K_TARGET}.0) AS INT), "
            f"CAST(ceil(sqrt({n})) AS INT)))"
        ).fetchone()[0]
        assert sql_k == catalog._effective_k(n), n


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


def test_train_cap_binding_lockstep(spark):
    """Force the round-7 training-sample cap to BIND (cap=32 over the
    500-vector corpus) and check the Spark pipeline still matches the
    DuckDB replay bucket-for-bucket: init + every Lloyd round on the
    md5-rank sample, final assignment over the FULL corpus."""
    from steampipe_plugin_terraform_spark.operators import similarity

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    assigned, _ = similarity.kmeans_lloyd(emb, k=16, iters=3, train_cap=32)
    sdf = (
        assigned.select("vec_id", "bucket")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    sql = (
        "WITH "
        + ",\n".join(catalog._lloyd_parts("TRUE", 3, 64, k_fixed=16, train_cap=32))
        + " SELECT nid AS vec_id, bucket FROM af ORDER BY vec_id"
    )
    odf = duckdb_con(SF_SMALL).execute(sql).fetchdf()
    assert len(sdf) == len(odf) == 500
    assert (sdf["bucket"].to_numpy() == odf["bucket"].to_numpy()).all()


def test_train_cap_default_is_noop_at_tested_sizes(spark):
    """TRAIN_CAP (65536) exceeds every test corpus, so the default-capped
    run must produce exactly the centroids of uncapped training."""
    from steampipe_plugin_terraform_spark.operators import similarity

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    assert similarity.TRAIN_CAP > emb.count()
    _, c_capped = similarity.kmeans_lloyd(emb, k=16, iters=2)
    _, c_uncapped = similarity.kmeans_lloyd(emb, k=16, iters=2, train_cap=None)
    assert c_capped == c_uncapped
