"""Replays the driver's DuckDB-oracle compare locally (row count +
schema + order-insensitive value multiset) so correctness mismatches
surface at sf0.001 before the driver's sf0.01 gate."""

from __future__ import annotations

import datetime
import math

import duckdb

from roblox_vector_search_datagen_spark.sources.tables import TPCH_TABLES

def duckdb_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    rows = res.fetchall()
    con.close()
    return cols, rows

def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 2**53:
            return repr(float(v))
        return repr(v)
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, int):
        return int(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    try:  # Decimal and friends
        import decimal

        if isinstance(v, decimal.Decimal):
            return repr(float(v))
    except ImportError:
        pass
    return v

def normalize(cols, rows):
    """Sort columns by name (driver semantics), normalize cells, return
    a sorted multiset of row tuples."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(repr(x) for x in t))

def compare_spark_duckdb(spark_df, oracle: str, sf_dir: str):
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols, d_rows = duckdb_run(oracle, sf_dir)

    assert sorted(c.lower() for c in s_cols) == sorted(c.lower() for c in d_cols), (
        f"schema mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), f"row count: spark={len(s_rows)} duckdb={len(d_rows)}"

    sn_cols, sn = normalize(s_cols, s_rows)
    dn_cols, dn = normalize(d_cols, d_rows)
    mismatches = [(a, b) for a, b in zip(sn, dn) if a != b]
    assert not mismatches, f"value mismatch ({len(mismatches)} rows), first: {mismatches[0]}"
