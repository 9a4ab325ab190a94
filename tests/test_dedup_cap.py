"""Document-frequency cap for the shingle self-joins (SCALE hot-key fix).

One boilerplate shingle shared by N docs turns the shared-shingle join into
an O(N²) hot key. The cap drops shingles with df > df_max before the join;
these tests pin that (a) boilerplate-only pairs stop surfacing, (b) honest
near-dups survive with exact-up-to-boilerplate Jaccard, and (c) the default
cap leaves the oracle-checked corpora untouched.
"""

import pytest

from steampipe_plugin_terraform_spark.operators import dedup


BOILER = "this license header is identical in every file"  # 8 tokens → shared 5-grams


@pytest.fixture(scope="module")
def docs(spark):
    # 40 docs that share ONLY the boilerplate header + 2 true near-dups
    rows = [(i, f"{BOILER} unique body {i} alpha beta gamma delta epsilon zeta") for i in range(40)]
    rows.append((100, "the quick brown fox jumps over the lazy dog again and again today"))
    rows.append((101, "the quick brown fox jumps over the lazy dog again and again tomorrow"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cap_kills_boilerplate_only_pairs(docs):
    # uncapped: every boilerplate pair with enough relative overlap shows up
    # at a low threshold; capped at df_max=5 the boilerplate shingles (df=40)
    # are dropped, so NO pair among docs 0..39 survives
    capped = dedup.shingle_jaccard_pairs(docs, threshold=0.1, df_max=5).collect()
    assert all(not (r.id_a < 40 and r.id_b < 40) for r in capped)
    # ...but the true near-dup pair (unique shingles, df=1 each) survives
    assert any((r.id_a, r.id_b) == (100, 101) for r in capped)


def test_cap_default_is_noop_on_small_corpus(docs):
    # df_max default (10k) >> corpus size → identical output to uncapped
    a = sorted(map(tuple, dedup.shingle_jaccard_pairs(docs, threshold=0.1, df_max=None).collect()))
    b = sorted(map(tuple, dedup.shingle_jaccard_pairs(docs, threshold=0.1).collect()))
    assert a == b
    am = sorted(map(tuple, dedup.minhash_lsh_pairs(docs, threshold=0.5, df_max=None).collect()))
    bm = sorted(map(tuple, dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()))
    assert am == bm


def test_minhash_verify_join_respects_cap(docs):
    # with the boilerplate shingles capped out of the verify join, pairs
    # whose overlap is only boilerplate verify to jaccard≈0 and drop even
    # when banding makes them candidates
    capped = dedup.minhash_lsh_pairs(docs, threshold=0.3, df_max=5).collect()
    assert all(not (r.id_a < 40 and r.id_b < 40) for r in capped)


def test_jaccard_denominator_counts_all_shingles(docs):
    # surviving pairs' jaccard uses FULL shingle-set sizes: the near-dup
    # pair's score must be identical capped vs uncapped (its own shingles
    # are rare; only the denominator could drift if sizes were capped too)
    def score(df_max):
        rows = dedup.shingle_jaccard_pairs(docs, threshold=0.1, df_max=df_max).collect()
        return {(r.id_a, r.id_b): r.jaccard for r in rows}[(100, 101)]

    assert score(5) == score(None)


def test_hashed_shingles_carries_exact_set_size(docs):
    # r15 restructure: n_sh rides every posting row (a per-doc constant)
    # instead of a separate count aggregate — it must equal the number of
    # posting rows the doc emits (its distinct-shingle count), on every row
    sh = dedup._hashed_shingles(docs, "doc_id", "text", 5)
    bad = (
        sh.groupBy("id", "n_sh")
        .count()
        .filter("n_sh != count")
        .count()
    )
    assert bad == 0
    assert dict(sh.dtypes)["n_sh"] == "bigint"  # historical count(*) type
