"""Round-3 training-pipeline text operators: repetition signals, span
dedup, unigram logprob, source mix — edge semantics beyond oracle parity."""

import math

import pytest
from pyspark.sql import functions as F

from steampipe_plugin_terraform_spark.operators import text


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "a b a b a b a b c d", "s1"),
            (2, "x y z w q r s t u v", "s1"),
            (3, "a", "s2"),
            (4, "a b a b a b a b c d", "s2"),  # exact dup of 1
            (5, "a b a b a b a b zz qq", "s2"),  # shares doc 1's first chunk
        ],
        "doc_id long, text string, source string",
    )


def test_repetition_counts(docs):
    rows = {r.doc_id: r for r in text.repetition_signals(docs).collect()}
    # doc 1: bigrams = 4x "a b", 3x "b a", "b c", "c d" -> top 4/9, distinct 4
    assert rows[1].n_ngrams == 9
    assert rows[1].top_ngram_frac == pytest.approx(0.4444)
    assert rows[1].dup_ngram_frac == pytest.approx(1 - 4 / 9, abs=1e-4)
    # doc 2: all distinct -> dup fraction exactly 0
    assert rows[2].top_ngram_frac == pytest.approx(1 / 9, abs=1e-4)
    assert rows[2].dup_ngram_frac == 0.0
    # doc shorter than n: 0 ngrams, NULL fractions
    assert rows[3].n_ngrams == 0 and rows[3].top_ngram_frac is None


def test_repetition_is_shuffle_free(docs):
    plan = text.repetition_signals(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_span_dedup_first_occurrence_wins(docs):
    rows = {r.doc_id: r for r in text.span_dedup(docs, window=8).collect()}
    # doc 1 is first: fully kept, reassembled in order
    assert rows[1].clean_text == "a b a b a b a b c d"
    # doc 4 duplicates every chunk of doc 1 -> pure duplicate, NULL text
    assert rows[4].clean_text is None and rows[4].n_dropped == 2
    # doc 5 shares only the first 8-token chunk; its novel tail survives
    assert rows[5].clean_text == "zz qq" and rows[5].n_dropped == 1
    # nothing dropped from the corpus-first doc
    assert rows[1].n_dropped == 0 and rows[1].n_chunks == 2


def test_span_dedup_is_deterministic_across_layouts(docs):
    a = sorted(map(tuple, text.span_dedup(docs, window=8).collect()))
    b = sorted(map(tuple, text.span_dedup(docs.repartition(7), window=8).collect()))
    assert a == b


def test_unigram_logprob_orders_quality(docs):
    rows = {r.doc_id: r for r in text.unigram_logprob(docs).collect()}
    # doc 2 is all rare tokens -> lowest mean logprob; doc 1 repeats common
    # tokens -> highest among the 10-token docs
    assert rows[2].mean_logprob < rows[5].mean_logprob <= rows[1].mean_logprob
    # hand-check doc 3: single token 'a' occurs 13 times of 41 total
    assert rows[3].mean_logprob == pytest.approx(
        math.floor(math.log(13 / 41) * 10000 + 0.5) / 10000
    )


def test_source_mix_weights_normalize(docs):
    rows = text.source_mix(docs).collect()
    assert {r.source for r in rows} == {"s1", "s2"}
    assert sum(r.mix_weight for r in rows) == pytest.approx(1.0, abs=1e-4)
    by = {r.source: r for r in rows}
    assert by["s1"].n_docs == 2 and by["s2"].n_docs == 3
    assert by["s1"].n_tokens == 20 and by["s2"].n_tokens == 21
    # sub-linear: s2 has 3 of 5 docs but weight ~sqrt share, not doc share
    assert by["s2"].mix_weight < 3 / 5


def test_chunk_overlap_invariants(spark):
    # every word position must be covered; consecutive chunks share
    # size - stride words; the final chunk may be short but never empty
    rows = [(i, " ".join(f"w{j}" for j in range(n))) for i, n in enumerate([1, 5, 20, 21, 35, 36, 50, 64])]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = text.chunk_overlap(df, size=20, stride=15).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for (doc_id, text_s), _ in zip(rows, rows):
        n = len(text_s.split(" "))
        chunks = sorted(by_doc[doc_id], key=lambda r: r.chunk_idx)
        # chunk count = 1 + ceil(max(n - 20, 0) / 15)
        import math
        assert len(chunks) == 1 + math.ceil(max(n - 20, 0) / 15)
        # indices contiguous from 0; last word covered; no empty chunk
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
        assert all(c.n_words >= 1 for c in chunks)
        last = chunks[-1]
        assert last.chunk_idx * 15 + last.n_words == n  # tail reaches the end
        for c in chunks[:-1]:
            assert c.n_words == 20  # all non-final chunks are full


def test_bm25_rare_term_outranks_common(spark):
    # a doc containing the rare query term must outrank docs with only
    # common terms: idf (N+1)/(df+1) dominates when df is tiny
    rows = [(0, "rare " + "common " * 30)] + [
        (i, ("common " * 25).strip()) for i in range(1, 40)
    ]
    df = spark.createDataFrame([(i, t.strip()) for i, t in rows], ["doc_id", "text"])
    top = text.bm25_topk(df, query_terms=("rare", "common"), k=3).collect()
    assert top[0].doc_id == 0 and top[0].rank == 1


def test_new_ops_degenerate_inputs(spark):
    """Empty corpora and no-match queries return empty results, not
    errors: bm25 with absent terms, chunking an empty frame, triangles
    and k-core on an empty edge list."""
    from steampipe_plugin_terraform_spark.operators import cluster

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert text.chunk_overlap(empty_docs).count() == 0
    assert text.bm25_topk(empty_docs, query_terms=("x",), k=5).count() == 0

    some_docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    assert text.bm25_topk(some_docs, query_terms=("zzz",), k=5).count() == 0

    empty_edges = spark.createDataFrame([], "a long, b long")
    assert cluster.triangle_counts(empty_edges).count() == 0
    assert cluster.kcore_peel(empty_edges, k=3, iters=2).count() == 0
