"""Drive the r13 degenerate-division guards on BOTH engines (the r12
advice's complaint was precisely that these branches were an
UNEXERCISED divergence: Spark's non-ANSI DIV yields NULL where DuckDB's
// raises — the guards exist so both sides emit NULL deliberately, and
this module is the only place the branches actually fire).

A synthetic corpus directory is assembled per test class: the table
under test is replaced by a crafted degenerate parquet (single
linestatus group, all-tied quantities, zero-variance discount margin,
single-token language) and every other table symlinks to sf0.001 so
``parity.duckdb_con`` can still bind all ten views. Each test then runs
the EXACT driver compare — not just the Spark side — and additionally
asserts the guarded column is genuinely NULL (a compare that passed
with non-NULL values would prove nothing about the branch)."""

import math
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from steampipe_plugin_terraform_spark.catalog import (
    ORACLES,
    QUERIES,
    STAGED_ORACLES,
    STAGED_QUERIES,
)

from .parity import TABLES, compare, duckdb_con

SF_SRC = "/root/testdata/sf0.001"


def _corpus(tmp_path, overrides: dict) -> str:
    """Build a corpus dir: crafted parquet for `overrides`, symlinks to
    the sf0.001 files for every other table."""
    d = tmp_path / "corpus"
    d.mkdir()
    for t in TABLES:
        if t in overrides:
            pq.write_table(overrides[t], str(d / f"{t}.parquet"))
        else:
            os.symlink(f"{SF_SRC}/{t}.parquet", str(d / f"{t}.parquet"))
    return str(d)


def _lineitem(rows) -> pa.Table:
    return pa.table(
        {
            "l_quantity": pa.array([r[0] for r in rows], pa.float64()),
            "l_linestatus": pa.array([r[1] for r in rows], pa.string()),
            "l_returnflag": pa.array([r[2] for r in rows], pa.string()),
            "l_discount": pa.array([r[3] for r in rows], pa.float64()),
        }
    )


def _entry(name):
    fn = STAGED_QUERIES.get(name) or QUERIES[name]
    sql = STAGED_ORACLES.get(name) or ORACLES[name]
    return fn, sql


def _run(spark, tmp_path, name, overrides):
    sf = _corpus(tmp_path, overrides)
    fn, sql = _entry(name)
    df = fn(spark, sf)
    rows = df.collect()
    con = duckdb_con(sf)
    try:
        ok, msg = compare(fn(spark, sf), con, sql)
    finally:
        con.close()
    assert ok, f"{name} degenerate parity: {msg}"
    return rows


def test_mannwhitney_missing_group_nulls_z(spark, tmp_path):
    # only linestatus 'F' exists → n_b = 0 → mean2 = 0 → z2_e3 NULL on
    # BOTH sides (DuckDB would raise on // 0 without the CASE guard)
    rows = _run(
        spark, tmp_path, "q_lineitem_mannwhitney_u",
        {"lineitem": _lineitem([(1.0, "F", "A", 0.0), (2.0, "F", "A", 0.0),
                                (3.0, "F", "R", 0.0)])},
    )
    assert len(rows) == 1 and rows[0]["z2_e3"] is None
    assert (rows[0]["n_a"], rows[0]["n_b"]) == (3, 0)


def test_kruskal_all_tied_pool_nulls_h(spark, tmp_path):
    # every quantity identical → a single pooled level → every rank2 =
    # nn+1 → s_den = 0 → h_e6 and reject_05 NULL on both sides
    rows = _run(
        spark, tmp_path, "q_lineitem_kruskal_wallis",
        {"lineitem": _lineitem([(5.0, "F", "A", 0.0), (5.0, "O", "N", 0.0),
                                (5.0, "F", "R", 0.0), (5.0, "O", "A", 0.0)])},
    )
    assert len(rows) == 1
    assert rows[0]["h_e6"] is None and rows[0]["reject_05"] is None


def test_ks_missing_group_nulls_d(spark, tmp_path):
    rows = _run(
        spark, tmp_path, "q_lineitem_ks_test",
        {"lineitem": _lineitem([(1.0, "O", "A", 0.0), (4.0, "O", "N", 0.0)])},
    )
    assert len(rows) == 1
    assert rows[0]["d_e6"] is None and rows[0]["reject_05"] is None


def test_spearman_zero_variance_margin_nulls_rho(spark, tmp_path):
    # constant discount → Dy = 0 → rho2_e8_signed NULL on both sides
    rows = _run(
        spark, tmp_path, "q_lineitem_spearman",
        {"lineitem": _lineitem([(1.0, "F", "A", 0.05), (2.0, "O", "N", 0.05),
                                (3.0, "F", "R", 0.05)])},
    )
    assert len(rows) == 1 and rows[0]["rho2_e8_signed"] is None


def test_simpson_single_token_lang_nulls_lambda(spark, tmp_path):
    # lang 'xx' has ONE token total → N = 1 → simpson_e6 NULL while
    # top_share_bp still reports 10000 (mixed null/non-null row)
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["solo", "two tokens here two"], pa.string()),
            "lang": pa.array(["xx", "en"], pa.string()),
            "source": pa.array(["s", "s"], pa.string()),
            "n_chars": pa.array([4, 19], pa.int64()),
        }
    )
    rows = _run(
        spark, tmp_path, "docs_simpson_diversity", {"documents": docs}
    )
    by_lang = {r["lang"]: r for r in rows}
    assert by_lang["xx"]["simpson_e6"] is None
    assert by_lang["xx"]["top_share_bp"] == 10000
    # the en slice is healthy: 4 tokens, 'two' twice → pairs=2, λ·1e6
    assert by_lang["en"]["simpson_e6"] == 2 * 1000000 // (4 * 3)


def test_dow_chi2_empty_orders_empty_result(spark, tmp_path):
    # zero orders: both engines produce ZERO rows (the GROUP BY nn
    # collapses an empty input to no groups) — emptiness parity, the
    # guard's N = 0 edge can never emit a row to disagree on
    orders = pa.table(
        {"o_orderdate": pa.array([], pa.timestamp("us"))}
    )
    rows = _run(spark, tmp_path, "q_orders_dow_chi2", {"orders": orders})
    assert rows == []


def test_trimmed_mean_tiny_frame_no_trim(spark, tmp_path):
    # N = 4 → k = 0: nothing trims, the clamp contributes zero from
    # both tails, and the mean is the plain snapped mean — the boundary
    # the partial-level clamp must get right
    rows = _run(
        spark, tmp_path, "q_lineitem_trimmed_mean",
        {"lineitem": _lineitem([(1.0, "F", "A", 0.0), (2.0, "O", "N", 0.0),
                                (3.0, "F", "R", 0.0), (6.0, "O", "A", 0.0)])},
    )
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_rows"], r["trim_k"], r["trimmed_sum"]) == (4, 0, 12)
    assert r["trimmed_mean_e4"] == 12 * 10000 // 4


def test_brown_forsythe_all_tied_groups_null_f(spark, tmp_path):
    # every quantity identical → z ≡ 0 in every group → ssw = 0 →
    # f_e6 and reject_05 NULL on both sides (and the k = 3 decision
    # gate is moot)
    rows = _run(
        spark, tmp_path, "q_lineitem_brown_forsythe",
        {"lineitem": _lineitem([(5.0, "F", "A", 0.0), (5.0, "O", "N", 0.0),
                                (5.0, "F", "R", 0.0), (5.0, "O", "A", 0.0)])},
    )
    assert len(rows) == 1
    assert rows[0]["f_e6"] is None and rows[0]["reject_05"] is None


def test_mood_median_all_above_impossible_a_zero_nulls_chi2(spark, tmp_path):
    # every quantity identical → pooled low median = that value → no row
    # is strictly above it → A = 0 → chi2_e6 and reject_05 NULL on both
    # sides (DuckDB would raise on // (a * (nn - a)) without the guard)
    rows = _run(
        spark, tmp_path, "q_lineitem_mood_median",
        {"lineitem": _lineitem([(5.0, "F", "A", 0.0), (5.0, "O", "N", 0.0),
                                (5.0, "F", "R", 0.0), (5.0, "O", "A", 0.0)])},
    )
    assert len(rows) == 1
    assert rows[0]["n_above"] == 0
    assert rows[0]["chi2_e6"] is None and rows[0]["reject_05"] is None


def test_mood_median_empty_lineitem_one_null_row(spark, tmp_path):
    # empty input: the GLOBAL aggregate (deliberately not a groupBy on
    # the constant keys) emits ONE all-NULL row on BOTH engines — the
    # empty-input row-count agreement the global-agg shape exists for
    rows = _run(
        spark, tmp_path, "q_lineitem_mood_median",
        {"lineitem": _lineitem([])},
    )
    assert len(rows) == 1
    assert rows[0]["n_rows"] is None and rows[0]["chi2_e6"] is None


def test_zipf_slope_single_bucket_spectrum_nulls_slope(spark, tmp_path):
    # every word occurs exactly once → one spectrum point → D = 0 →
    # slope NULL on both sides (the ≤1-distinct-x guard)
    docs = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["alpha beta gamma"], pa.string()),
            "lang": pa.array(["en"], pa.string()),
            "source": pa.array(["s"], pa.string()),
            "n_chars": pa.array([16], pa.int64()),
        }
    )
    rows = _run(spark, tmp_path, "docs_zipf_slope", {"documents": docs})
    assert len(rows) == 1
    assert rows[0]["n_points"] == 1
    assert rows[0]["slope_e6_signed"] is None


def test_source_drift_empty_documents_one_null_row(spark, tmp_path):
    # empty corpus: margins empty → the global aggregate emits one row
    # with NULL n_docs / chi2_e6 / reject_05 on BOTH sides
    docs = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "text": pa.array([], pa.string()),
            "lang": pa.array([], pa.string()),
            "source": pa.array([], pa.string()),
            "n_chars": pa.array([], pa.int64()),
        }
    )
    rows = _run(spark, tmp_path, "docs_source_drift_chi2", {"documents": docs})
    assert len(rows) == 1
    assert rows[0]["chi2_e6"] is None and rows[0]["reject_05"] is None
    assert (rows[0]["n_sources"], rows[0]["n_langs"]) == (0, 0)


def test_source_drift_single_source_zero_chi2(spark, tmp_path):
    # one source → every cell equals its lang margin → every d = 0 →
    # chi2 exactly 0 (not NULL); df = 0 ≠ 76 → reject_05 NULL
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["a", "b", "c"], pa.string()),
            "lang": pa.array(["en", "fr", "en"], pa.string()),
            "source": pa.array(["s0", "s0", "s0"], pa.string()),
            "n_chars": pa.array([1, 1, 1], pa.int64()),
        }
    )
    rows = _run(spark, tmp_path, "docs_source_drift_chi2", {"documents": docs})
    assert len(rows) == 1
    assert rows[0]["chi2_e6"] == 0 and rows[0]["reject_05"] is None


def _embeddings(vectors) -> pa.Table:
    return pa.table(
        {
            "vec_id": pa.array(range(1, len(vectors) + 1), pa.int64()),
            "embedding": pa.array(vectors, pa.list_(pa.float32())),
            "label": pa.array([0] * len(vectors), pa.int32()),
        }
    )


def test_cov_top_eigen_identical_vectors_null_eigen(spark, tmp_path):
    # all vectors identical → M = N·Σqqᵀ − ssᵀ = 0 → every power step
    # is 0 → den = 0 → top_eigen_e6 / top_energy_bp NULL on both sides
    # while trace_e6 reports exactly 0
    v = [0.25] * 64
    rows = _run(
        spark, tmp_path, "emb_cov_top_eigen",
        {"embeddings": _embeddings([v, v, v])},
    )
    assert len(rows) == 1
    r = rows[0]
    assert r["n_vecs"] == 3 and r["trace_e6"] == 0
    assert r["top_eigen_e6"] is None and r["top_energy_bp"] is None


def test_cov_top_eigen_empty_embeddings_null_row(spark, tmp_path):
    rows = _run(
        spark, tmp_path, "emb_cov_top_eigen", {"embeddings": _embeddings([])},
    )
    assert len(rows) == 1
    r = rows[0]
    assert r["n_vecs"] == 0 and r["top_eigen_e6"] is None


def test_kendall_tau_b_single_level_margin_nulls_tau(spark, tmp_path):
    # every price in one $10k band → n0 = n2 → the tie-corrected
    # denominator vanishes → tau2_e8_signed NULL on both sides (gamma
    # would also see C = D = 0 here; τ-b's guard is the margin, not
    # the pair counts)
    rows = _run(
        spark, tmp_path, "q_lineitem_kendall_tau_b",
        {"lineitem": pa.table({
            "l_quantity": pa.array([1.0, 2.0, 3.0], pa.float64()),
            "l_extendedprice": pa.array([100.0, 200.0, 300.0], pa.float64()),
        })},
    )
    assert len(rows) == 1
    assert rows[0]["tau2_e8_signed"] is None


def _docs(rows) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["s"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )


def test_hapax_empty_corpus_one_zeros_row(spark, tmp_path):
    # empty corpus → the global-agg device emits exactly ONE row of
    # zero counts with NULL ratios on BOTH engines (a groupBy would
    # emit zero rows and silently diverge from the oracle's agg)
    rows = _run(spark, tmp_path, "docs_hapax_legomena", {"documents": _docs([])})
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_tokens"], r["n_types"], r["n_hapax"]) == (0, 0, 0)
    assert r["ttr_bp"] is None and r["hapax_share_bp"] is None


def test_hapax_all_hapax_corpus(spark, tmp_path):
    # every token unique → n_hapax = n_types = n_tokens → both ratios
    # exactly 10000 (the division grid's upper edge, no rounding)
    rows = _run(
        spark, tmp_path, "docs_hapax_legomena",
        {"documents": _docs([(1, "alpha beta"), (2, "gamma delta")])},
    )
    r = rows[0]
    assert (r["n_tokens"], r["n_types"], r["n_hapax"]) == (4, 4, 4)
    assert r["ttr_bp"] == 10000 and r["hapax_share_bp"] == 10000


def test_code_detect_empty_text_null_sym_bp(spark, tmp_path):
    # empty text: n_chars = 0 → sym_bp NULL on BOTH sides (Spark DIV
    # NULL vs DuckDB // error is the divergence class the CASE guard
    # exists for); n_lines = 1 → indent_bp = 0 → looks_code false via
    # the coalesce fuse
    rows = _run(
        spark, tmp_path, "docs_code_detect", {"documents": _docs([(1, "")])},
    )
    r = rows[0]
    assert r["n_lines"] == 1 and r["sym_bp"] is None
    assert r["indent_bp"] == 0 and r["looks_code"] is False


def test_code_detect_codey_text_trips_both_axes(spark, tmp_path):
    # a genuinely code-shaped doc crosses BOTH thresholds: symbol
    # density > 3 % and indented-line share > 20 %
    code = "def f(x):\n  return {x: (x + 1)};\n  # comment\nz = f(2)"
    rows = _run(
        spark, tmp_path, "docs_code_detect", {"documents": _docs([(7, code)])},
    )
    r = rows[0]
    assert r["sym_bp"] >= 300 and r["indent_bp"] >= 2000
    assert r["looks_code"] is True


def test_sign_bit_balance_empty_corpus_zero_rows(spark, tmp_path):
    # no vectors → no (dim, vector) pairs → ZERO rows on both engines
    # (the grouped shape's empty contract, unlike the global-agg
    # entries' one-NULL-row contract — documented, not accidental)
    rows = _run(
        spark, tmp_path, "emb_sign_bit_balance", {"embeddings": _embeddings([])},
    )
    assert rows == []


def test_sign_bit_balance_constant_sign_extremes(spark, tmp_path):
    # an all-positive dimension reports share 10000 / balanced false;
    # an all-non-positive one reports 0 / false — the saturated-dim
    # signal the screen exists to flag (0.0 > 0 is FALSE: zeros count
    # as non-positive on both engines)
    v1 = [1.0] * 32 + [-1.0] * 16 + [0.0] * 16
    rows = _run(
        spark, tmp_path, "emb_sign_bit_balance",
        {"embeddings": _embeddings([v1, v1, v1])},
    )
    by = {r["dim"]: r for r in rows}
    assert by[1]["pos_share_bp"] == 10000 and by[1]["balanced"] is False
    assert by[33]["pos_share_bp"] == 0 and by[33]["balanced"] is False
    assert by[49]["pos_share_bp"] == 0 and by[49]["balanced"] is False


def test_ahash_clusters_all_short_payloads_all_singletons(spark, tmp_path):
    # nothing reaches the hasher: every doc is its own cluster of size 1
    # on both engines (the full-coverage contract, unlike the pair view
    # which would emit zero rows)
    rows = _run(
        spark, tmp_path, "media_ahash_clusters",
        {"documents": _docs([(1, "tiny"), (2, "also tiny")])},
    )
    assert {(r["doc_id"], r["cluster_id"], r["cluster_size"]) for r in rows} \
        == {(1, 1, 1), (2, 2, 1)}


def test_ahash_clusters_empty_corpus_zero_rows(spark, tmp_path):
    rows = _run(spark, tmp_path, "media_ahash_clusters", {"documents": _docs([])})
    assert rows == []


def test_cramers_v_single_margin_level_undefined(spark, tmp_path):
    # only one linestatus level → min(r,c) = 1 → m = 0 → V² NULL +
    # 'undefined' on BOTH sides (Spark DIV-by-zero NULL vs DuckDB //
    # error is the divergence class the CASE guard exists for); the
    # chi2 roll-up itself is still well-defined (independence is exact
    # when a margin is degenerate → every contrib 0)
    rows = _run(
        spark, tmp_path, "q_lineitem_cramers_v",
        {"lineitem": _lineitem([
            (1.0, "F", "A", 0.0), (2.0, "F", "A", 0.0),
            (3.0, "F", "N", 0.0),
        ])},
    )
    assert len(rows) == 1
    r = rows[0]
    assert (r["r_levels"], r["c_levels"]) == (2, 1)
    assert r["df"] == 0 and r["chi2_e6"] == 0
    assert r["v2_e8"] is None and r["effect"] == "undefined"


def test_cramers_v_empty_table_zeros_row(spark, tmp_path):
    # empty lineitem → the global-agg device emits ONE row of zero
    # counts with NULL V² on both engines
    rows = _run(spark, tmp_path, "q_lineitem_cramers_v", {"lineitem": _lineitem([])})
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_tot"], r["r_levels"], r["c_levels"], r["df"]) == (0, 0, 0, 0)
    assert r["chi2_e6"] == 0
    assert r["v2_e8"] is None and r["effect"] == "undefined"


def test_norm_buckets_zero_vector_bucket_zero(spark, tmp_path):
    # the all-zeros vector has norm² = 0, which the bin-length device
    # maps to bucket 0 (bin(0) = '0' → length 1) — covered, not
    # dropped; with every vector zero the single bucket carries the
    # whole corpus at share 10000
    rows = _run(
        spark, tmp_path, "emb_norm_buckets",
        {"embeddings": _embeddings([[0.0] * 64, [0.0] * 64])},
    )
    assert len(rows) == 1
    r = rows[0]
    assert (r["bucket"], r["n_vecs"]) == (0, 2)
    assert (r["min_norm2"], r["max_norm2"]) == (0, 0)
    assert r["share_bp"] == 10000


def test_norm_buckets_empty_corpus_zero_rows(spark, tmp_path):
    # no vectors → zero rows on both engines (the grouped shape's
    # empty contract; DuckDB's NULL list_sum on empty lists never
    # fires because there are no rows at all)
    rows = _run(spark, tmp_path, "emb_norm_buckets", {"embeddings": _embeddings([])})
    assert rows == []


def test_ari_no_sentence_marker_unmeasurable(spark, tmp_path):
    # no '.' anywhere → S = 0 → the guarded division yields NULL +
    # 'unmeasurable' on BOTH sides; empty text is the same branch
    # (W = 1 by the split-on-space device, S = 0)
    rows = _run(
        spark, tmp_path, "docs_ari_readability",
        {"documents": _docs([(1, "no terminal punctuation here"), (2, "")])},
    )
    by = {r["doc_id"]: r for r in rows}
    assert by[1]["ari_centi"] is None and by[1]["band"] == "unmeasurable"
    assert by[2]["n_words"] == 1 and by[2]["n_chars_ns"] == 0
    assert by[2]["ari_centi"] is None and by[2]["band"] == "unmeasurable"


def test_ari_single_word_sentence_floor(spark, tmp_path):
    # "ok." → C = 3, W = 1, S = 1 → shifted = 471·3 + 50 = 1463 →
    # grade −680 centi (negative grades are legal output; only the
    # DIVISION had to stay positive — the algebraic-shift device)
    rows = _run(
        spark, tmp_path, "docs_ari_readability",
        {"documents": _docs([(5, "ok.")])},
    )
    r = rows[0]
    assert (r["n_chars_ns"], r["n_words"], r["n_sentences"]) == (3, 1, 1)
    assert r["ari_centi"] == (471 * 3 * 1 + 50 * 1) // 1 - 2143
    assert r["band"] == "elementary"


def test_code_mix_empty_corpus_zero_rows(spark, tmp_path):
    rows = _run(spark, tmp_path, "docs_code_mix", {"documents": _docs([])})
    assert rows == []


def test_code_mix_all_code_lang_share_10000(spark, tmp_path):
    # a lang whose only doc classifies as code reports share 10000 —
    # the division grid's upper edge, no rounding
    code = "def f(x):\n  return {x: (x + 1)};\n  # c\nz = f(2)"
    rows = _run(
        spark, tmp_path, "docs_code_mix",
        {"documents": _docs([(1, code), (2, "plain prose text")])},
    )
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_docs"], r["n_code"], r["code_share_bp"]) == (2, 1, 5000)


def _lineitem_graph(rows) -> pa.Table:
    # (l_orderkey, l_partkey) pairs, all shipped mid-1995
    import datetime
    ts = datetime.datetime(1995, 6, 1)
    return pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            "l_shipdate": pa.array([ts] * len(rows), pa.timestamp("us")),
        }
    )


def test_assortativity_uniform_degrees_undefined(spark, tmp_path):
    # one order shipping two parts → one edge, both degrees 1 → zero
    # degree variance → den = 0 → r NULL + 'undefined' on BOTH sides
    # (Spark DIV-by-zero NULL vs DuckDB // error is the divergence
    # class the CASE guard exists for)
    rows = _run(
        spark, tmp_path, "q_part_degree_assortativity",
        {"lineitem": _lineitem_graph([(1, 10), (1, 20)])},
    )
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_nodes"], r["n_edges"]) == (2, 1)
    assert r["r_e6"] is None and r["mixing"] == "undefined"


def test_assortativity_empty_graph_undefined(spark, tmp_path):
    rows = _run(
        spark, tmp_path, "q_part_degree_assortativity",
        {"lineitem": _lineitem_graph([])},
    )
    r = rows[0]
    assert (r["n_nodes"], r["n_edges"]) == (0, 0)
    assert r["r_e6"] is None and r["mixing"] == "undefined"


def test_assortativity_path_graph_exact_minus_one(spark, tmp_path):
    # the 3-node path a−b−c: directed degree pairs (1,2),(2,1),(2,1),
    # (1,2) → r = −1 exactly → r_e6 = −1000000, 'disassortative' — the
    # negative-numerator branch of the sign device, exact on both sides
    rows = _run(
        spark, tmp_path, "q_part_degree_assortativity",
        {"lineitem": _lineitem_graph([(1, 10), (1, 20), (2, 20), (2, 30)])},
    )
    r = rows[0]
    assert (r["n_nodes"], r["n_edges"]) == (3, 2)
    assert r["r_e6"] == -1000000 and r["mixing"] == "disassortative"


def test_cluster_size_buckets_empty_corpus_zero_rows(spark, tmp_path):
    rows = _run(
        spark, tmp_path, "dedup_cluster_size_buckets",
        {"documents": _docs([])},
    )
    assert rows == []


def test_cluster_size_buckets_pairs_land_in_bucket_one(spark, tmp_path):
    # two identical docs + one unique: the duplicate pair is one
    # cluster of size 2 (bucket 1), the unique doc a singleton
    # (bucket 0) — shares 6667/3333 by the floor division
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = _run(
        spark, tmp_path, "dedup_cluster_size_buckets",
        {"documents": _docs([(1, text), (2, text), (3, "totally different words here now")])},
    )
    by = {r["bucket"]: r for r in rows}
    assert by[1]["n_clusters"] == 1 and by[1]["n_docs"] == 2
    assert by[1]["max_size"] == 2 and by[1]["docs_share_bp"] == 6666
    assert by[0]["n_clusters"] == 1 and by[0]["n_docs"] == 1
    assert by[0]["docs_share_bp"] == 3333


def test_rate_by_source_empty_corpus_zero_rows(spark, tmp_path):
    rows = _run(
        spark, tmp_path, "dedup_rate_by_source", {"documents": _docs([])},
    )
    assert rows == []


def test_rate_by_source_duplicate_charged_to_own_source(spark, tmp_path):
    # 2 identical docs + 1 unique, all one source: the non-canonical
    # member charges its source with exactly one duplicate → 1/3 =
    # 3333 bp by the floor division
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = _run(
        spark, tmp_path, "dedup_rate_by_source",
        {"documents": _docs([(1, text), (2, text), (3, "other words entirely here now yes")])},
    )
    assert len(rows) == 1
    r = rows[0]
    assert (r["source"], r["n_docs"], r["n_dups"]) == ("s", 3, 1)
    assert r["dup_rate_bp"] == 3333
