"""Unit tests for top_ngrams / redact_pii / pack_greedy / quantize_int8."""

from steampipe_plugin_terraform_spark.operators import pack, similarity, text


def test_top_ngrams_counts_and_short_text_guard(spark):
    df = spark.createDataFrame(
        [("a b a b",), ("a b",), ("x",), ("",)], "text string"
    )
    got = {(r["ngram"], r["cnt"]) for r in text.top_ngrams(df, n=2, k=10).collect()}
    # "x" and "" are shorter than one bigram and must contribute nothing
    assert got == {("a b", 3), ("b a", 1)}


def test_top_ngrams_tie_break_deterministic(spark):
    df = spark.createDataFrame([("b c",), ("a b",)], "text string")
    rows = text.top_ngrams(df, n=2, k=1).collect()
    assert [(r["ngram"], r["cnt"]) for r in rows] == [("a b", 1)]


def test_redact_pii_all_patterns(spark):
    df = spark.createDataFrame(
        [(1, "mail bob.smith+x@corp.example.org server 192.168.0.1 tel +1 (415) 555-0199 end")],
        "doc_id long, text string",
    )
    r = text.redact_pii(df).collect()[0]
    assert r["clean_text"] == "mail <EMAIL> server <IP> tel <PHONE> end"
    assert r["n_redactions"] == 3


def test_redact_pii_no_double_count_ip_inside_email(spark):
    # the local part looks like an IP; email fires first and swallows it,
    # so the IP pass sees nothing and the count stays 1
    df = spark.createDataFrame(
        [(1, "x 1.2.3.4@example.com y")], "doc_id long, text string"
    )
    r = text.redact_pii(df).collect()[0]
    assert r["clean_text"] == "x <EMAIL> y"
    assert r["n_redactions"] == 1


def test_pack_greedy_boundaries(spark):
    # budget 10: [4,6] fills a bin exactly; 7 starts a new one; an oversized
    # 25 sits alone; following 1 starts fresh
    df = spark.createDataFrame(
        [(i, "en", w) for i, w in enumerate([4, 6, 7, 25, 1])],
        "doc_id long, lang string, n_tok long",
    )
    out = pack.pack_greedy(df, budget=10, weight_col="n_tok", shards=1)
    got = {r["doc_id"]: r["seq_id"] for r in out.collect()}
    assert got == {0: 0, 1: 0, 2: 1, 3: 2, 4: 3}


def test_pack_greedy_groups_and_shards_are_independent(spark):
    rows = [(i, "en" if i < 4 else "de", 6) for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tok long")
    out = pack.pack_greedy(df, budget=10, weight_col="n_tok", shards=2).collect()
    # every (lang, shard) stream has 2 docs of weight 6 -> each doc its own seq
    for r in out:
        assert r["seq_id"] in (0, 1)
    keys = {(r["lang"], r["shard"]) for r in out}
    assert len(keys) == 4


def test_quantize_int8_roundtrip_and_zero_vector(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in similarity.quantize_int8(df).collect()}
    assert rows[1]["q"] == [64, -127, 32]  # 0.5*127=63.5 -> floor(+0.5)=64
    assert abs(rows[1]["scale"] - 1.0 / 127.0) < 1e-12
    assert rows[2]["q"] == [0, 0, 0] and rows[2]["scale"] == 0.0
    # dequantized error bounded by scale/2
    deq = [q * rows[1]["scale"] for q in rows[1]["q"]]
    for a, b in zip(deq, [0.5, -1.0, 0.25]):
        assert abs(a - b) <= rows[1]["scale"] / 2 + 1e-9


def test_leakage_safe_split_keeps_clusters_whole(spark):
    """The defining invariant: no duplicate cluster may straddle a split
    fence (that straddle IS the leakage the entry exists to prevent)."""
    from pyspark.sql import functions as F

    from steampipe_plugin_terraform_spark.catalog import QUERIES

    df = QUERIES["docs_leakage_safe_split"](spark, "/root/testdata/sf0.001")
    straddlers = (
        df.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter("k > 1")
        .count()
    )
    assert straddlers == 0
    sizes = {r.split: r["count"] for r in df.groupBy("split").count().collect()}
    assert set(sizes) == {"train", "val", "test"}
    assert sizes["train"] > sizes["val"] and sizes["train"] > sizes["test"]
