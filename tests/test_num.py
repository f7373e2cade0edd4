"""functions/num.py contract tests: the quantized aggregates must be
(a) within quantization error of the plain float aggregate, (b) BIT-
identical regardless of partitioning/row order — the whole point — and
(c) bit-identical to their DuckDB *_sql twins on the same data,
including negative (logprob/pmi-like) values."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from roblox_vector_search_datagen_spark.functions import num

VALUES = [
    3.14159265,
    -0.000001,
    2.5e-7,          # rounds to a micro-unit boundary
    -9.87654321,
    1234.5678901,
    0.0,
    -2.5e-7,
    57.81,
    -13.371337,
] * 7  # 63 rows so repartitioning actually reorders partial sums


def _spark_agg(spark, values, parts):
    df = (
        spark.createDataFrame([(v,) for v in values], "x double")
        .repartition(parts)
        .agg(num.qsum6("x").alias("s"), num.qmean6("x").alias("m"))
    )
    r = df.collect()[0]
    return r.s, r.m


def test_close_to_float_aggregate(spark):
    s, m = _spark_agg(spark, VALUES, 4)
    n = len(VALUES)
    assert s == pytest.approx(round(sum(VALUES), 6), abs=5e-7 * n)
    assert m == pytest.approx(sum(VALUES) / n, abs=5e-7 + 1e-9)


def test_partitioning_and_order_invariance(spark):
    base = _spark_agg(spark, VALUES, 1)
    for parts in (2, 7, 32):
        assert _spark_agg(spark, VALUES, parts) == base
    assert _spark_agg(spark, list(reversed(VALUES)), 5) == base


def test_matches_duckdb_sql_twins_bitwise(spark):
    s, m = _spark_agg(spark, VALUES, 8)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in VALUES])
    ds, dm = con.execute(
        f"SELECT {num.qsum6_sql('x')}, {num.qmean6_sql('x')} FROM t"
    ).fetchone()
    # exact equality, not approx — cross-engine bit-parity is the contract
    assert (s, m) == (ds, dm)


def test_null_semantics_match_avg(spark):
    vals = [1.5, None, 2.5, None]
    df = spark.createDataFrame([(v,) for v in vals], "x double").agg(
        num.qsum6("x").alias("s"), num.qmean6("x").alias("m")
    )
    r = df.collect()[0]
    assert r.s == 4.0
    assert r.m == 2.0  # count(x) = 2, not 4
