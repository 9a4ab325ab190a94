"""MMR re-rank hardening: the degenerate λ=1 identity (no diversity
penalty → MMR selection IS the relevance top-k in rank order) — the
full-probe ≡ exact analog the IVF / two-level / matryoshka entries pin."""

from pyspark.sql import functions as F

from steampipe_plugin_terraform_spark.operators import similarity
from steampipe_plugin_terraform_spark.catalog import _t

SF = "/root/testdata/sf0.001"


def test_mmr_lambda_one_is_relevance_topk(spark):
    emb = _t(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    c = emb.filter(F.col("vec_id") >= 10)
    mmr = {
        (r["query_id"], r["select_order"]): r["neighbor_id"]
        for r in similarity.mmr_select(q, c, k_select=4, lam10=10).collect()
    }
    top = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in similarity.cosine_topk(q, c, k=4).collect()
    }
    assert mmr == top


def test_mmr_selects_k_distinct_per_query(spark):
    emb = _t(spark, SF, "embeddings")
    rows = similarity.mmr_select(
        emb.filter(F.col("vec_id") < 10),
        emb.filter(F.col("vec_id") >= 10),
        k_select=4,
    ).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert len(per_q) == 10
    for qid, nids in per_q.items():
        assert len(nids) == 4 and len(set(nids)) == 4, qid
