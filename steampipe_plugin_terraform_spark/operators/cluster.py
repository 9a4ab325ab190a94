"""Duplicate-cluster resolution: distributed connected components.

Near-dup pair generators (minhash_lsh_pairs, simhash_near_dups,
cosine_near_dup_pairs) emit EDGES; an actual dedup pass needs COMPONENTS —
"these 17 docs are all the same article; keep one". This module closes that
gap with the alternating large-star/small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14), the standard
shuffle-bounded formulation:

- large-star: for every node u, connect every strictly-larger neighbor to
  the minimum of u's neighborhood (including u).
- small-star: orient every edge toward the smaller endpoint; connect every
  neighbor ≤ u (and u itself) to the neighborhood minimum.

Each round is one groupBy shuffle over the edge list; the edge count never
grows beyond the input size + node count, and the number of rounds is
O(log n) — vs O(graph diameter) for naive label propagation, which
degenerates on chain-shaped duplicate runs (crawl mirrors, boilerplate
families). At convergence every node points directly at its component's
minimum id, which we use as the cluster id.

Scale notes (100 TB design point):
- per-round lineage is truncated with localCheckpoint(eager): iterative
  DataFrame loops otherwise accumulate a plan per round and re-execute
  the whole history every round (and overwhelm the optimizer by ~round 8).
- convergence test is an aggregate (count of label changes), never a
  collect of rows.
- the hub nodes large-star creates (everything links to the component min)
  are bounded: large-star emits only (bigger → min) edges, so a component
  of size k contributes ≤ k rows keyed by its min — the classic skew is on
  the GROUP BY of the min-keyed star, which AQE skew-split handles since
  the combiner (min) is associative and applies map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _star_round(edges: DataFrame, large: bool) -> DataFrame:
    """One large-star or small-star round over an undirected edge list with
    columns (u, v). Returns a deduplicated (u, v) edge list with u != v."""
    if large:
        # symmetric view: every node sees its full neighborhood
        nbrs = edges.unionByName(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        # m = min over N(u) ∪ {u}; connect strictly-larger neighbors to m
        grouped = nbrs.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m"),
            F.collect_set("v").alias("nv"),
        )
        out = grouped.select(
            F.explode("nv").alias("a"), F.col("m").alias("b"), F.col("u")
        ).where(F.col("a") > F.col("u"))
    else:
        # orient toward the smaller endpoint: key = max, value = min
        oriented = edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        grouped = oriented.groupBy("u").agg(
            F.min("v").alias("m"), F.collect_set("v").alias("nv")
        )
        # connect u and every (≤ u) neighbor to the minimum
        out = grouped.select(
            F.explode(F.array_union("nv", F.array("u"))).alias("a"),
            F.col("m").alias("b"),
        )
    return (
        out.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 50,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``, where
    ``component`` is the smallest node id in the node's connected component.

    ``pairs`` is an undirected edge list (duplicate pairs); direction and
    duplicate edges are irrelevant.
    """
    edges = (
        pairs.select(F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_count = edges.count()
    converged = False
    for _ in range(max_rounds):
        after_large = _star_round(edges, large=True)
        after_small = _star_round(after_large, large=False).localCheckpoint(eager=True)
        # fixpoint test: both sides are distinct sets, so equality is
        # count-equality plus an empty one-sided difference (small-star
        # output is canonically oriented u > v, as is the previous round's)
        new_count = after_small.count()
        canon_prev = edges.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        converged = new_count == prev_count and after_small.exceptAll(canon_prev).isEmpty()
        edges, prev_count = after_small, new_count
        if converged:
            break
    if not converged:
        # star-contraction needs O(log n) rounds; hitting the cap means the
        # labels may not be component minima yet — surface it loudly rather
        # than silently returning partial clusters
        raise RuntimeError(
            f"connected_components did not converge within {max_rounds} rounds; "
            "raise max_rounds (the alternating algorithm needs O(log n) rounds)"
        )
    # converged star graph: every non-min node points at its component min
    stars = edges.select(F.greatest("u", "v").alias("node"), F.least("u", "v").alias("component"))
    mins = stars.select(F.col("component").alias("node"), F.col("component"))
    return stars.unionByName(mins).distinct()


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
    broadcast_limit: int = 2_000_000,
) -> DataFrame:
    """Full dedup assignment over a corpus: (doc_id, cluster_id,
    is_canonical) for EVERY document — docs in no near-dup pair form
    singleton clusters of themselves; within a cluster the smallest doc_id
    is canonical (the copy a dedup pass keeps).
    """
    comp = connected_components(pairs, src=src, dst=dst).withColumnRenamed("node", "doc_id")
    # the component map holds only nodes that appear in a near-dup pair —
    # typically a small fraction of the corpus — so broadcast it when it is;
    # past the limit fall back to a hash join on uniformly-distributed ids
    if comp.count() <= broadcast_limit:
        comp = F.broadcast(comp)
    out = docs.select(F.col(id_col).cast("long").alias("doc_id")).join(comp, "doc_id", "left")
    return out.select(
        "doc_id",
        F.coalesce("component", "doc_id").alias("cluster_id"),
        (F.coalesce("component", "doc_id") == F.col("doc_id")).alias("is_canonical"),
    )
