"""Local replica of the driver's correctness gate: run a catalog query via
Spark AND its DuckDB oracle on the same parquet, compare row count, schema
column names, and order-insensitive values."""

from __future__ import annotations

import math

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def duckdb_con(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v):
    if v is None:
        return "\x00null"
    if isinstance(v, float):
        if math.isnan(v):
            # pandas renders SQL NULL in nullable columns as NaN
            return "\x00null"
        # driver-style canonicalization: repr of the double
        return repr(v)
    if isinstance(v, bool):
        return str(v)
    return str(v)


def canonical_rows(columns, rows):
    """Sort columns by name, normalize cells, sort rows — order-insensitive."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(columns), sorted(out)


def compare(spark_df, con, oracle_sql: str) -> tuple[bool, str]:
    sdf = spark_df.toPandas()
    odf = con.execute(oracle_sql).fetchdf()
    s_cols, s_rows = canonical_rows(list(sdf.columns), sdf.itertuples(index=False, name=None))
    o_cols, o_rows = canonical_rows(list(odf.columns), odf.itertuples(index=False, name=None))
    if [c.lower() for c in s_cols] != [c.lower() for c in o_cols]:
        return False, f"column mismatch: spark={s_cols} oracle={o_cols}"
    if len(s_rows) != len(o_rows):
        return False, f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    if s_rows != o_rows:
        diffs = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:3]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, f"ok ({len(s_rows)} rows)"
