"""Scale-shape tests for the blocked similarity operators (round-2 rework).

Round 1 collected the corpus to the driver (toPandas + broadcast) and
shipped the full |Q|·|C| cartesian through the rank window. These tests pin
the blocked rewrites: identical results at any block count, no collect in
the lineage, and signature parity for the vectorized hyperplane matmul.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from steampipe_plugin_terraform_spark.operators.similarity import (
    _hyperplanes,
    cosine_near_dup_pairs,
    cosine_topk,
    lsh_bucket_signatures,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_near_dup_pairs_match_local_brute_force(spark, emb):
    got = _rows(cosine_near_dup_pairs(emb, threshold=0.4), "id_a", "id_b", "cosine")
    # independent local reference: exact all-pairs cosine in numpy
    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy()
    M = np.stack(pdf["embedding"].to_numpy()).astype("float64")
    S = (M @ M.T) / np.outer(np.sqrt((M * M).sum(1)), np.sqrt((M * M).sum(1)))
    want = []
    for i, j in zip(*np.nonzero(S > 0.4)):
        if ids[i] < ids[j]:
            want.append((int(ids[i]), int(ids[j]), float(np.floor(S[i, j] * 1e6 + 0.5) / 1e6)))
    assert got == sorted(want)


@pytest.mark.parametrize("num_blocks", [1, 3, 8])
def test_near_dup_pairs_block_count_invariant(spark, emb, num_blocks):
    base = _rows(cosine_near_dup_pairs(emb, threshold=0.4, num_blocks=5), "id_a", "id_b", "cosine")
    other = _rows(
        cosine_near_dup_pairs(emb, threshold=0.4, num_blocks=num_blocks), "id_a", "id_b", "cosine"
    )
    assert base == other


def test_near_dup_pairs_no_driver_collect(spark, emb):
    """The plan must be a pure distributed lineage: building it must not
    trigger any job (round 1 ran toPandas at plan-construction time)."""
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    df = cosine_near_dup_pairs(emb, threshold=0.4)
    after = tracker.getJobIdsForGroup(None)
    assert len(after) == len(before), "plan construction ran a Spark job (driver collect?)"
    assert df.count() > 0


@pytest.mark.parametrize("num_blocks", [1, 4])
def test_cosine_topk_blocked_equals_global_window(spark, emb, num_blocks):
    """Blocked local-top-k + tiny global rank must equal the naive global
    ranking (computed here with a plain window over all scored pairs)."""
    queries = emb.filter(F.col("vec_id") < 10)
    corpus = emb.filter(F.col("vec_id") >= 10)
    res = cosine_topk(queries, corpus, k=5, num_blocks=num_blocks)
    # count() exercises Catalyst's column pruning through the self-cogroup
    # (queries and corpus share lineage here, like the catalog entry)
    assert res.count() == 50
    got = _rows(res, "query_id", "neighbor_id", "cosine", "rank")
    # naive reference in numpy with identical rounding + tiebreak
    qp = queries.select("vec_id", "embedding").toPandas()
    cp = corpus.select("vec_id", "embedding").toPandas()
    Q = np.stack(qp["embedding"].to_numpy()).astype("float64")
    C = np.stack(cp["embedding"].to_numpy()).astype("float64")
    S = (Q @ C.T) / np.outer(np.sqrt((Q * Q).sum(1)), np.sqrt((C * C).sum(1)))
    S = np.floor(S * 1e6 + 0.5) / 1e6
    want = []
    nids = cp["vec_id"].to_numpy()
    for qi, qid in enumerate(qp["vec_id"]):
        order = sorted(range(len(nids)), key=lambda j: (-S[qi, j], nids[j]))[:5]
        want.extend(
            (int(qid), int(nids[j]), float(S[qi, j]), r + 1) for r, j in enumerate(order)
        )
    assert got == sorted(want)


def test_lsh_signature_matmul_matches_expression_form(spark, emb):
    """The vectorized (matmul) signatures must reproduce the round-1
    interpreted-HOF construction bit-for-bit (same planes, same >= 0
    sign rule) — pins bucket stability across the rewrite."""
    dim, num_planes, seed = 64, 8, 42
    got = {r["id"]: r["bucket"] for r in lsh_bucket_signatures(emb, dim=dim, num_planes=num_planes, seed=seed).collect()}
    planes = _hyperplanes(dim, num_planes, seed)
    base = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v"))
    sig_bits = []
    for i, p in enumerate(planes):
        arr = "array(" + ",".join(f"CAST({x!r} AS DOUBLE)" for x in p) + ")"
        dot = f"aggregate(zip_with(v, {arr}, (x, y) -> CAST(x AS DOUBLE) * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        sig_bits.append(
            f"CASE WHEN {dot} >= 0 THEN shiftleft(CAST(1 AS BIGINT), {i}) ELSE CAST(0 AS BIGINT) END"
        )
    want = {r["id"]: r["bucket"] for r in base.withColumn("bucket", F.expr(" + ".join(sig_bits))).collect()}
    assert got == want
