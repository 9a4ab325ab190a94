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


def test_mmr_matches_pure_python_reference(spark):
    """Independent reimplementation check (the scd2-merge discipline):
    run mmr_select against a from-scratch Python MMR over seeded
    deterministic vectors — same snapped-integer contract, written
    straight from the definition rather than sharing the operator's
    code path."""
    import hashlib

    import numpy as np

    def vec(i):
        # deterministic pseudo-random 8-dim vector from md5 bytes
        h = hashlib.md5(f"mmr:{i}".encode()).digest()
        return [((b / 255.0) * 2 - 1) for b in h[:8]]

    n_q, n_c = 4, 12
    rows = [(i, vec(i)) for i in range(n_q + n_c)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") < n_q)
    c = df.filter(F.col("vec_id") >= n_q)

    from steampipe_plugin_terraform_spark.operators import similarity

    got = {
        (r["query_id"], r["select_order"]): (
            r["neighbor_id"],
            r["mmr_score_x1e7"],
        )
        for r in similarity.mmr_select(
            q, c, k_candidates=8, k_select=4, lam10=7
        ).collect()
    }

    # pure-Python reference
    V = {i: np.array(v, dtype="float64") for i, v in rows}

    def cos_e6(a, b):
        x = float(V[a] @ V[b] / (np.linalg.norm(V[a]) * np.linalg.norm(V[b])))
        import math

        return int(math.floor(x * 1e6 + 0.5))

    want = {}
    for qi in range(n_q):
        scored = sorted(
            ((cos_e6(qi, ci), ci) for ci in range(n_q, n_q + n_c)),
            key=lambda t: (-t[0], t[1]),
        )
        cand = scored[:8]  # (rel_e6, nid) in rank order
        sel = []
        for step in range(1, 5):
            best = None
            for rel, nid in cand:
                if nid in [s[0] for s in sel]:
                    continue
                pen = max((cos_e6(nid, s[0]) for s in sel), default=0)
                score = 7 * rel - 3 * pen
                key = (-score, nid)
                if best is None or key < best[0]:
                    best = (key, nid, score)
            sel.append((best[1], best[2]))
            want[(qi, step)] = (best[1], best[2])

    assert got == want
