"""Text-analysis operators for the documents table (SURVEY.md §2.11).

Everything here is built-in-function Spark SQL (whole-stage codegen) — the
formulas are intentionally engine-portable so the DuckDB oracle can run the
same arithmetic. No Python in the data path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword profiles for the heuristic language scorer
LANG_STOPWORDS = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "y", "que"),
    "de": ("der", "die", "das", "und", "zu"),
    "fr": ("le", "la", "de", "et", "les"),
}

STOPWORDS = LANG_STOPWORDS["en"]

_BPE_ISH_TOKEN_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"


def _in_list(col: str, words: tuple) -> str:
    quoted = ",".join(f"'{w}'" for w in words)
    return f"size(filter(split({col}, ' '), w -> w in ({quoted})))"


def pround(sql: str, digits: int) -> str:
    """Engine-portable fixed-point rounding: floor(x·10^d + 0.5)/10^d.

    Spark's round() goes through exact BigDecimal HALF_UP while DuckDB
    rounds the double numerically — they disagree on exact-rational ties
    (e.g. 0.37625 → 0.3763 vs 0.3762). This formula is pure IEEE double
    arithmetic, so any engine computes the identical bits."""
    scale = 10 ** digits
    return f"floor(({sql}) * {scale} + 0.5) / {scale}"


def n_tokens_expr(text_col: str = "text") -> Column:
    return F.expr(f"CAST(size(split({text_col}, ' ')) AS BIGINT)")


def stopword_ratio_expr(text_col: str = "text", digits: int = 4) -> Column:
    toks = f"split({text_col}, ' ')"
    return F.expr(pround(f"{_in_list(text_col, STOPWORDS)} / size({toks})", digits))


def quality_expr(text_col: str = "text") -> Column:
    """score = 0.5 · min(n_tokens/100, 1) + 0.5 · min(stopword_ratio·5, 1)."""
    toks = f"split({text_col}, ' ')"
    sw = pround(f"{_in_list(text_col, STOPWORDS)} / size({toks})", 4)
    return F.expr(
        pround(f"0.5 * least(size({toks}) / 100.0, 1.0) + 0.5 * least(({sw}) * 5.0, 1.0)", 4)
    )


def lang_pred_expr(text_col: str = "text") -> Column:
    """The language whose stopword profile hits the most tokens; fixed
    priority (dict order) breaks ties; zero hits → 'und'."""
    pred: Column = F.lit("und")
    best: Column = F.lit(0)
    # fixed priority = dict order; a strictly-greater score takes over
    for lang, words in LANG_STOPWORDS.items():
        cnt = F.expr(_in_list(text_col, words))
        take = cnt > best
        pred = F.when(take, F.lit(lang)).otherwise(pred)
        best = F.when(take, cnt).otherwise(best)
    return pred


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document token statistics: counts, lengths, stopword/punct ratios.

    Columns: n_tokens, n_chars_nospace, avg_token_len, stopword_ratio.
    """
    toks = f"split({text_col}, ' ')"
    nchars = f"length(replace({text_col}, ' ', ''))"
    return df.select(
        F.col(id_col),
        n_tokens_expr(text_col).alias("n_tokens"),
        F.expr(f"CAST({nchars} AS BIGINT)").alias("n_chars_nospace"),
        F.expr(pround(f"{nchars} / size({toks})", 4)).alias("avg_token_len"),
        stopword_ratio_expr(text_col).alias("stopword_ratio"),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic quality score in [0, 1]: rewards moderate length and
    stopword presence (the standard cheap pre-filter for LLM corpora)."""
    return df.select(F.col(id_col), quality_expr(text_col).alias("quality"))


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic language ID: the language whose stopword profile hits the
    most tokens wins; fixed priority order breaks ties; zero hits → 'und'."""
    return df.select(F.col(id_col), lang_pred_expr(text_col).alias("pred_lang"))


def bpe_ish_token_count(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Token count under a BPE-ish regex (letter runs | single digits |
    single punctuation) — the cheap proxy for LLM token budgeting."""
    return df.select(
        F.col(id_col),
        F.expr(f"CAST(size(regexp_extract_all({text_col}, '{_BPE_ISH_TOKEN_RE}', 0)) AS BIGINT)").alias("n_bpe_tokens"),
    )


def zscore_by_group(
    df: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    value_col: str = "n_chars",
) -> DataFrame:
    """Per-group z-score via ``applyInPandas`` (grouped-map pandas UDF).

    Deliberately implemented on the Python grouped-map path to exercise the
    §2.9 UDF surface with an oracle (the same math is a window expression in
    SQL). Shape: one shuffle on the group key; each group materializes as a
    pandas frame — fine for natural groups (languages, sources); for
    high-cardinality keys prefer the window-function form.

    Returns (id, group, z) with z = (x - mean) / stddev_samp, portable-
    rounded to 4; singleton/zero-variance groups yield NULL.
    """
    import pandas as pd

    out_schema = f"{id_col} long, {group_col} string, z double"

    def norm(pdf: "pd.DataFrame") -> "pd.DataFrame":
        x = pdf[value_col].astype("float64")
        sd = x.std(ddof=1)
        if not sd or sd != sd:  # 0 or NaN
            # nullable Float64 so Arrow emits true SQL NULLs — a plain
            # float64 NaN would survive as NaN in the DoubleType column
            # and dodge `z IS NULL` filters
            z = pd.array([None] * len(x), dtype="Float64")
        else:
            import numpy as np

            z = np.floor((x - x.mean()) / sd * 10000 + 0.5) / 10000
        return pd.DataFrame({id_col: pdf[id_col], group_col: pdf[group_col], "z": z})

    return df.groupBy(group_col).applyInPandas(norm, schema=out_schema)


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of the normalized (lowercased,
    space-collapsed) text — the exact-dedup key for content-addressing."""
    norm = f"regexp_replace(lower({text_col}), '\\\\s+', ' ')"
    return df.select(F.col(id_col), F.expr(f"md5({norm})").alias("fp"))


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """Winnowing fingerprint (Schleimer et al.): hash every character
    k-gram, slide a window of w hashes, keep each window's minimum; the
    distinct minima are the document's fingerprint set.

    md5-as-rolling-hash keeps it engine-portable (bit-identical in SQL
    oracles); the array pipeline is whole-stage-codegen JVM work, one row
    per document — no explode, no shuffle. Docs shorter than k+w-1 chars
    are dropped (no complete window exists).

    Returns (id, n_fps, min_fp).
    """
    # Compute each window's min DIRECTLY from the text (md5 of the w k-grams
    # starting at j) instead of materializing a k-gram array column: Spark's
    # CollapseProject would re-inline the k-gram transform into every window
    # lambda, turning O(len·w) md5 calls into O(len²) — measured 30× slower.
    # This form is a single expression with bounded w-fold redundancy.
    wins = (
        f"transform(sequence(1, length({text_col}) - {k + w - 2}),"
        f" j -> array_min(transform(sequence(0, {w - 1}),"
        f" o -> md5(substring({text_col}, j + o, {k})))))"
    )
    # explode + aggregate instead of array_distinct/array_min over the same
    # array expression twice: explode evaluates `wins` ONCE per row, and the
    # distinct-count/min aggregation is codegen'd (halves the md5 work).
    # Repartition first: a small single-file input is ONE partition, which
    # would serialize the md5-heavy expression on one core (at real scale
    # the input arrives already partitioned and this coalesces to a no-op
    # shuffle of the narrow id+text projection).
    par = df.sparkSession.sparkContext.defaultParallelism
    win_rows = (
        df.filter(F.expr(f"length({text_col}) >= {k + w - 1}"))
        .select(id_col, text_col)
        .repartition(par)
        .select(F.col(id_col), F.explode(F.expr(wins)).alias("win"))
    )
    return win_rows.groupBy(id_col).agg(
        F.countDistinct("win").alias("n_fps"),
        F.min("win").alias("min_fp"),
    )


def top_ngrams(
    df: DataFrame,
    n: int = 2,
    k: int = 20,
    text_col: str = "text",
    sep: str = " ",
) -> DataFrame:
    """Global top-k word n-grams by occurrence count — the corpus-vocabulary
    scan of a training pipeline (boilerplate detection, tokenizer seeding).

    Scale: explode is narrow; the count is a hash aggregate with map-side
    partial combine (n-gram keys are near-uniform, no hot key worse than the
    corpus' own most-common phrase); the final top-k is TakeOrdered over
    per-partition k-row heaps, NOT a global sort shuffle. Ties break on the
    n-gram string so results are deterministic across cluster layouts.
    """
    toks = f"split({text_col}, '{sep}')"
    grams = F.expr(
        # sequence(1, 0) yields DESCENDING [1, 0], not [] — guard short rows
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"transform(sequence(1, size({toks}) - {n - 1}),"
        f" i -> concat_ws('{sep}', slice({toks}, i, {n}))) "
        f"ELSE array() END"
    )
    return (
        df.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("ngram"))
        .limit(k)
    )


# (name, pattern, replacement) applied IN ORDER; each pattern is counted on
# the text as already redacted by the previous ones, so overlapping matches
# (an IP inside an email) are never double-counted. Patterns restrict to
# syntax valid in BOTH Java regex (Spark) and RE2 (DuckDB oracle): no
# backrefs, no lookaround.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+[0-9][0-9() -]{6,}[0-9]", "<PHONE>"),
]


def redact_pii(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Scrub emails / IPv4s / international-format phone numbers, returning
    (id, clean_text, n_redactions). Pure regexp_replace chain — whole-stage
    codegen, no Python, embarrassingly parallel (no shuffle at any scale).
    """
    cur: Column = F.col(text_col)
    count = F.lit(0)
    for _, pat, repl in PII_PATTERNS:
        count = count + F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
        cur = F.regexp_replace(cur, pat, repl)
    return df.select(
        F.col(id_col), cur.alias("clean_text"), count.cast("long").alias("n_redactions")
    )
