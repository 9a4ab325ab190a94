"""Semantic (not plan) properties of the sketch/analytics entries: the
inequalities and invariants the algorithms guarantee by construction.
Complements the oracle parity suite, which checks cross-engine equality
but not that the values mean what the docstrings claim."""

from steampipe_plugin_terraform_spark.catalog import QUERIES

SF = "/root/testdata/sf0.001"


def test_countmin_never_underestimates(spark):
    rows = QUERIES["q_events_countmin"](spark, SF).collect()
    assert rows
    assert all(r.est_cnt >= r.exact_cnt for r in rows)


def test_countmin_stream_state_matches_batch_build(spark):
    """Mergeability: the drained streaming sketch equals the batch cells."""
    stream = {
        (r.i, r.cell): r.cell_cnt
        for r in QUERIES["stream_countmin_sketch"](spark, SF).collect()
    }
    batch = QUERIES["q_events_countmin"](spark, SF).collect()
    # every probe estimate must be reproducible from the streamed sketch
    for r in batch:
        assert r.est_cnt <= max(stream.values())
    assert sum(stream.values()) % 4 == 0  # d rows per event, d=4


def test_kmv_is_exact_below_k_and_close_above(spark):
    rows = QUERIES["q_kmv_distinct"](spark, SF).collect()
    assert rows
    for r in rows:
        if r.exact_customers < 64:
            assert r.kmv_customers == r.exact_customers
        else:
            # KMV standard error is 1/sqrt(k-2) ~ 13% at k=64; allow 5 sigma
            assert abs(r.kmv_customers - r.exact_customers) <= 0.65 * r.exact_customers


def test_pareto_cut_sufficient_and_minimal(spark):
    kept = QUERIES["q_customer_pareto"](spark, SF).collect()
    assert kept
    import duckdb

    # per-customer cents then summed — replicates the entry's grid
    total = duckdb.sql(
        f"SELECT CAST(sum(vc) AS BIGINT) FROM (SELECT CAST(floor(sum(o_totalprice)*100+0.5) AS BIGINT) vc "
        f"FROM '{SF}/orders.parquet' GROUP BY o_custkey)"
    ).fetchone()[0]
    kept_cents = sum(round(r.revenue * 100) for r in kept)
    smallest = min(round(r.revenue * 100) for r in kept)
    assert kept_cents * 10 >= total * 8  # covers 80%
    assert (kept_cents - smallest) * 10 < total * 8  # minimal


def test_transitions_probabilities_form_distribution(spark):
    rows = QUERIES["q_events_transitions"](spark, SF).collect()
    assert rows
    from collections import defaultdict

    by_prev = defaultdict(float)
    for r in rows:
        assert 0.0 <= r.p <= 1.0
        by_prev[r.prev_type] += r.p
    # integer-floor division loses at most |types|/1e6 per row
    assert all(1.0 - 3e-5 <= s <= 1.0 for s in by_prev.values())


def test_ohlc_bar_invariants(spark):
    rows = QUERIES["q_events_ohlc"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.low <= r.open <= r.high
        assert r.low <= r.close <= r.high
        assert r.n_events >= 1


def test_ewma_bounded_by_per_type_extremes(spark):
    rows = QUERIES["q_events_ewma"](spark, SF).collect()
    assert rows
    from collections import defaultdict

    lo, hi = defaultdict(lambda: 1 << 60), defaultdict(int)
    for r in rows:
        lo[r.event_type] = min(lo[r.event_type], r.cnt)
        hi[r.event_type] = max(hi[r.event_type], r.cnt)
    for r in rows:
        assert lo[r.event_type] <= r.ewma <= hi[r.event_type]


def test_quantile_sketch_exact_below_k(spark):
    """Strata smaller than k are sampled losslessly: at sf0.001 every
    segment is under 64 customers, so sketch == exact."""
    rows = QUERIES["q_quantile_bottomk_sketch"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n < 64 and r.sketch_median == r.exact_median


def test_skyline_no_point_is_dominated(spark):
    """Brute-force check of the frontier: no kept customer may be
    strictly dominated by ANY customer (kept or not)."""
    import duckdb

    allpts = duckdb.sql(
        f"SELECT c.c_custkey, floor(c.c_acctbal*100+0.5) bal, "
        f"floor(sum(o.o_totalprice)*100+0.5) rev "
        f"FROM '{SF}/customer.parquet' c JOIN '{SF}/orders.parquet' o "
        f"ON o.o_custkey = c.c_custkey GROUP BY 1, c.c_acctbal"
    ).fetchall()
    kept = QUERIES["q_customer_skyline"](spark, SF).collect()
    assert kept
    for r in kept:
        kb, kr = round(r.acctbal * 100), round(r.revenue * 100)
        assert not any(b > kb and v > kr for (_, b, v) in allpts), r


def test_countmin_partials_merge_exactly(spark):
    """THE scale property: CMS counters are sums, so sketches built on
    disjoint halves of the corpus merge (cell-wise add) into exactly the
    full-corpus sketch — partial aggregation on any cluster topology."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")

    def cms(df):
        uc = df.groupBy("user_id").agg(F.count("*").alias("cnt"))
        cells = uc.select(
            "cnt",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("i"),
                            (
                                F.conv(
                                    F.substring(
                                        F.md5(
                                            F.concat(
                                                F.lit(str(i)),
                                                F.lit(":"),
                                                F.col("user_id").cast("string"),
                                            )
                                        ),
                                        1,
                                        12,
                                    ),
                                    16,
                                    10,
                                ).cast("long")
                                % 256
                            ).alias("cell"),
                        )
                        for i in range(4)
                    ]
                )
            ).alias("x"),
        ).select(F.col("x.i").alias("i"), F.col("x.cell").alias("cell"), "cnt")
        return cells.groupBy("i", "cell").agg(F.sum("cnt").alias("s"))

    full = {(r.i, r.cell): r.s for r in cms(ev).collect()}
    a = cms(ev.filter("event_id % 2 = 0"))
    b = cms(ev.filter("event_id % 2 = 1"))
    merged = {
        (r.i, r.cell): r.s
        for r in a.unionByName(b).groupBy("i", "cell").agg(F.sum("s").alias("s")).collect()
    }
    assert merged == full


def test_kmv_partials_merge_exactly(spark):
    """Bottom-k of the union of two bottom-k summaries equals bottom-k of
    the union — the KMV merge rule that lets distinct-count sketches
    combine across partitions/datasets without rescanning."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    K = 64
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")

    def hashes(df):
        return df.select(
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10)
            .cast("long")
            .alias("h")
        ).distinct()

    def bottomk(df):
        w = Window.orderBy("h")
        return [r.h for r in df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= K).collect()]

    full = bottomk(hashes(ev))
    a = bottomk(hashes(ev.filter("event_id % 2 = 0")))
    b = bottomk(hashes(ev.filter("event_id % 2 = 1")))
    merged = sorted(set(a) | set(b))[:K]
    assert merged == full


# ---- bitmap_distinct (r12-staged device): exactness + mergeability ----

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_ids_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.integers(min_value=0, max_value=5000),
    ),
    min_size=1,
    max_size=80,
)


@given(rows=_ids_strategy)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_bitmap_distinct_equals_count_distinct(spark, rows):
    from steampipe_plugin_terraform_spark.operators import sketch

    df = spark.createDataFrame(rows, "k string, id long")
    got = {
        r["k"]: r["n_distinct"]
        for r in sketch.bitmap_distinct(df, ["k"], "id").collect()
    }
    want: dict = {}
    for k, i in rows:
        want.setdefault(k, set()).add(i)
    assert got == {k: len(v) for k, v in want.items()}


def test_bitmap_distinct_words_merge_by_or(spark):
    # the mergeability contract stated directly: bit_or-merging two
    # slices' word tables answers the union's distinct count exactly —
    # the same re-aggregation the partial agg does across partitions,
    # proven here across DATASETS (the cross-slice rollup case)
    from pyspark.sql import functions as F

    from steampipe_plugin_terraform_spark.operators import sketch

    a = spark.range(0, 400).select(F.lit("k").alias("k"), (F.col("id") * 3).alias("id"))
    b = spark.range(0, 400).select(F.lit("k").alias("k"), (F.col("id") * 2).alias("id"))

    def words(df):
        return df.groupBy(
            "k", F.expr("id DIV 62").alias("word_idx")
        ).agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(id % 62 AS INT)))").alias("word"))

    merged = (
        words(a).unionByName(words(b))
        .groupBy("k", "word_idx")
        .agg(F.expr("bit_or(word)").alias("word"))
        .groupBy("k")
        .agg(F.expr("CAST(sum(bit_count(word)) AS BIGINT)").alias("n"))
        .collect()[0]["n"]
    )
    exact = a.unionByName(b).select("id").distinct().count()
    assert merged == exact


def test_bitmap_distinct_ignores_null_ids(spark):
    # COUNT(DISTINCT) semantics: NULL ids contribute neither to the
    # count nor to the word-table size — and a key group whose ids are
    # ALL NULL still appears, with (0, 0), exactly as
    # count(DISTINCT id) GROUP BY k would report it
    from steampipe_plugin_terraform_spark.operators import sketch

    df = spark.createDataFrame(
        [("k", 1), ("k", 1), ("k", None), ("k", 200), ("allnull", None)],
        "k string, id long",
    )
    rows = {
        r["k"]: (r["n_distinct"], r["n_words"])
        for r in sketch.bitmap_distinct(df, ["k"], "id").collect()
    }
    assert rows["k"] == (2, 2)  # words 0 and 3, no phantom NULL word
    assert rows["allnull"] == (0, 0)  # group survives with zeros
