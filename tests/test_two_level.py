"""Two-level coarse quantizer ↔ grouped-Lloyd SQL replay lockstep.

`similarity.kmeans_two_level` is the 100 TB design point SCALE.md names
for corpus-derived cell counts (k1·k2 cells; no pass scores a vector
against more than k1 + k2 centroids). Not yet a catalog entry (round-7
freeze); these tests pin the full two-level assignment against the
chained `_lloyd_parts` + `_lloyd2_parts` DuckDB replay, with and without
the level-1 training cap binding.
"""

import pytest

from steampipe_plugin_terraform_spark import catalog
from steampipe_plugin_terraform_spark.operators import similarity

from .parity import duckdb_con

SF_DIR = "/root/testdata/sf0.001"
DIM = 64


def _sql(k1, k2, iters, train_cap):
    parts = catalog._lloyd_parts(
        "TRUE", iters, DIM, k_fixed=k1, train_cap=train_cap
    ) + catalog._lloyd2_parts(iters, DIM, k2, src="af", prefix="g")
    return (
        "WITH "
        + ",\n".join(parts)
        + " SELECT nid AS vec_id, cell1, cell2 FROM gaf ORDER BY vec_id"
    )


@pytest.mark.parametrize(
    "k1,k2,iters,train_cap",
    [
        (4, 4, 2, None),   # uncapped: both levels see every vector
        (4, 4, 2, 32),     # level-1 training cap BINDS (32 of 500)
        (3, 5, 1, None),   # asymmetric cells, single iteration
    ],
)
def test_two_level_matches_grouped_sql_replay(spark, k1, k2, iters, train_cap):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    assigned, _, _ = similarity.kmeans_two_level(
        emb, k1=k1, k2=k2, iters=iters, train_cap=train_cap
    )
    sdf = (
        assigned.toPandas().sort_values("vec_id").reset_index(drop=True)
    )
    odf = duckdb_con(SF_DIR).execute(_sql(k1, k2, iters, train_cap)).fetchdf()
    assert len(sdf) == len(odf) == 500
    assert (sdf["cell1"].to_numpy() == odf["cell1"].to_numpy()).all()
    assert (sdf["cell2"].to_numpy() == odf["cell2"].to_numpy()).all()


def test_two_level_centroids_shape(spark):
    """The codebook comes out of the SAME per-cell pass that assigns:
    k1 cells × min(k2, |cell|) sub-cells, every centroid dim-length, and
    every assigned (cell1, cell2) pair backed by a codebook row."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    assigned, centroids, l1 = similarity.kmeans_two_level(emb, k1=4, k2=4, iters=2)
    cent = centroids.collect()
    assert {r.cell1 for r in cent} == {0, 1, 2, 3}
    assert all(len(r.centroid) == DIM for r in cent)
    assert len(l1) == 4 and all(len(c) == DIM for c in l1)
    pairs = {(r.cell1, r.cell2) for r in cent}
    used = {(r.cell1, r.cell2) for r in assigned.select("cell1", "cell2").distinct().collect()}
    assert used <= pairs


def test_two_level_full_probe_equals_brute_force(spark):
    """nprobe1=k1 and nprobe2=k2 probe every cell, so the two-stage probe
    must return EXACTLY the brute-force top-k (same rounded-cosine rank
    device, same neighbor-id tiebreak) — the correctness identity the
    single-level IVF entry pins, extended to two levels."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter("vec_id < 8")
    corpus = emb.filter("vec_id >= 8")
    assigned, centroids, l1 = similarity.kmeans_two_level(corpus, k1=4, k2=4, iters=2)
    approx = similarity.two_level_topk(
        queries, corpus, assigned, centroids, l1, k=5, nprobe1=4, nprobe2=4
    )
    exact = similarity.cosine_topk(queries, corpus, k=5)
    a = {(r.query_id, r.rank): r.neighbor_id for r in approx.collect()}
    e = {(r.query_id, r.rank): r.neighbor_id for r in exact.collect()}
    assert a == e


def test_two_level_partial_probe_recall(spark):
    """Partial probes must still return k rows per query, and recall must
    rise monotonically with probe width toward the full-probe identity.
    Deterministic data + deterministic quantizer make the measured values
    REGRESSION PINS, not statistical hopes (2x2 of 4x4 = 0.475 on this
    corpus — the synthetic embeddings are near-uniform, so quarter-probe
    recall sits near the corpus-fraction floor; a real clustered corpus
    sits far above it)."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter("vec_id < 8")
    corpus = emb.filter("vec_id >= 8")
    assigned, centroids, l1 = similarity.kmeans_two_level(corpus, k1=4, k2=4, iters=2)
    exact = similarity.cosine_topk(queries, corpus, k=5)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    recalls = {}
    for np1, np2 in [(2, 2), (2, 4), (3, 4)]:
        approx = similarity.two_level_topk(
            queries, corpus, assigned, centroids, l1, k=5, nprobe1=np1, nprobe2=np2
        )
        a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
        per_q = {}
        for qid, _nid in a:
            per_q[qid] = per_q.get(qid, 0) + 1
        assert set(per_q.values()) == {5}
        recalls[(np1, np2)] = len(a & e) / len(e)
    assert recalls[(2, 2)] >= 0.45, recalls
    assert recalls[(2, 4)] >= 0.65, recalls
    assert recalls[(3, 4)] >= 0.85, recalls
    assert recalls[(2, 2)] <= recalls[(2, 4)] <= recalls[(3, 4)]
