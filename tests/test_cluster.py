"""Connected-components dedup clustering (operators/cluster.py)."""

import pytest

from steampipe_plugin_terraform_spark.operators import cluster


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = cluster.connected_components(df, **kw)
    return {(r["node"], r["component"]) for r in out.collect()}


def test_single_chain_collapses_to_min(spark):
    # a 12-node path: worst case for naive label propagation (diameter 11);
    # star-contraction must still converge and label everything with 1
    edges = [(i, i + 1) for i in range(1, 12)]
    got = _cc(spark, edges)
    assert got == {(i, 1) for i in range(1, 13)}


def test_two_components_and_duplicate_reversed_edges(spark):
    edges = [(5, 3), (3, 5), (3, 9), (20, 30), (30, 20), (40, 30)]
    got = _cc(spark, edges)
    assert got == {(3, 3), (5, 3), (9, 3), (20, 20), (30, 20), (40, 20)}


def test_self_loops_ignored(spark):
    got = _cc(spark, [(7, 7), (7, 8)])
    assert got == {(7, 7), (8, 7)}


def test_dedup_clusters_full_assignment(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    pairs = spark.createDataFrame([(2, 4), (4, 6), (3, 5)], "id_a long, id_b long")
    out = cluster.dedup_clusters(docs, pairs)
    rows = {r["doc_id"]: (r["cluster_id"], r["is_canonical"]) for r in out.collect()}
    assert rows == {
        1: (1, True),
        2: (2, True),
        3: (3, True),
        4: (2, False),
        5: (3, False),
        6: (2, False),
        7: (7, True),
    }
    # exactly one canonical per cluster
    canon = [d for d, (_, c) in rows.items() if c]
    assert sorted(canon) == [1, 2, 3, 7]


@pytest.mark.parametrize("shape", ["star", "clique", "binary_tree"])
def test_topologies(spark, shape):
    if shape == "star":
        edges = [(100, i) for i in range(1, 20)]
        want_root = 1
        nodes = set(range(1, 20)) | {100}
    elif shape == "clique":
        nodes = {10, 11, 12, 13, 14}
        edges = [(a, b) for a in nodes for b in nodes if a < b]
        want_root = 10
    else:
        edges = [(i, 2 * i) for i in range(1, 16)] + [(i, 2 * i + 1) for i in range(1, 16)]
        nodes = set(range(1, 32))
        want_root = 1
    got = _cc(spark, edges)
    assert got == {(n, want_root) for n in nodes}


def test_pagerank_one_iteration_hand_computed(spark):
    """a→b, b→c, a→c with damping 0.85, one iteration:
    a (no in-edges) = 0.15; b = 0.15 + 0.85·(1/2) = 0.575;
    c = 0.15 + 0.85·(1/2 + 1/1) = 1.425."""
    from steampipe_plugin_terraform_spark.operators.cluster import pagerank_fixed

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c")], schema="src string, dst string"
    )
    got = {r.node: r.pr for r in pagerank_fixed(edges, iters=1).collect()}
    assert got == {"a": 0.15, "b": 0.575, "c": 1.425}


def test_pagerank_dangling_floor(spark):
    """A sink-only node never contributes; every node's rank floor is the
    teleport mass (1-d) and ranks stay finite across iterations."""
    from steampipe_plugin_terraform_spark.operators.cluster import pagerank_fixed

    edges = spark.createDataFrame([("a", "b")], schema="src string, dst string")
    got = {r.node: r.pr for r in pagerank_fixed(edges, iters=3).collect()}
    assert got["a"] == 0.15  # nothing points at a after iteration 1
    # b receives a's full (snapped) rank each round: 0.15 + 0.85·0.15
    assert got["b"] == 0.2775


def test_triangle_counts_known_topologies(spark):
    """K4: C(4,3)=4 triangles, every node in exactly 3; a path has none;
    a triangle with a pendant leaves the pendant out of the result."""
    from steampipe_plugin_terraform_spark.operators.cluster import triangle_counts

    k4 = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(a + 1, 4)], schema="a long, b long"
    )
    got = {r.node: r.triangles for r in triangle_counts(k4).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}

    path = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], schema="a long, b long")
    assert triangle_counts(path).count() == 0

    pendant = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (2, 3)], schema="a long, b long"
    )
    got = {r.node: r.triangles for r in triangle_counts(pendant).collect()}
    assert got == {0: 1, 1: 1, 2: 1}  # node 3 is in no triangle


def test_kcore_peel_known_topologies(spark):
    """K4 survives 3-core peeling intact (every degree 3); a star peels to
    nothing; K4 plus a pendant chain peels the chain then keeps K4."""
    from steampipe_plugin_terraform_spark.operators.cluster import kcore_peel

    k4_edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    k4 = spark.createDataFrame(k4_edges, schema="a long, b long")
    got = {r.node: r.degree for r in kcore_peel(k4, k=3, iters=2).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}

    star = spark.createDataFrame([(0, i) for i in range(1, 6)], schema="a long, b long")
    assert kcore_peel(star, k=2, iters=2).count() == 0

    chained = spark.createDataFrame(
        k4_edges + [(3, 4), (4, 5)], schema="a long, b long"
    )
    got = {r.node: r.degree for r in kcore_peel(chained, k=3, iters=2).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}  # chain gone, core intact
