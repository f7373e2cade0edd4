"""Pins both name orderings of the games listing against non-ASCII
names: `list_games_df` (binary collation, the documented deviation) and
`list_games_unicode_df` (ICU root via collate(), the localeCompare-
parity path). A collation or Spark upgrade that shifts either order
fails here before it can silently change which rows a LIMIT keeps."""

from __future__ import annotations

import duckdb
import pytest

from roblox_vector_search_datagen_spark.operators import search
from roblox_vector_search_datagen_spark.schemas import GAME_SCHEMA

NAMES = ["zebra", "Ängstrom", "éclair", "Apple Pie", "apple pie", "ß-test", "ss-test", "日本語", "123 go"]

@pytest.fixture(scope="module")
def games_df(spark):
    rows = [(i + 1, 1000 + i, n, None, None, None) for i, n in enumerate(NAMES)]
    return spark.createDataFrame(rows, GAME_SCHEMA)

def test_default_listing_uses_icu_order(games_df):
    # round 3: the default listing adopts the reference's localeCompare
    # (ICU) order whenever the Spark build supports collation
    got = [r.name for r in search.list_games_df(games_df).collect()]
    assert got == ["123 go", "Ängstrom", "apple pie", "Apple Pie", "éclair", "ss-test", "ß-test", "zebra", "日本語"]

def test_binary_fallback_order_pinned(games_df, spark):
    # capability-check fallback: a Spark build without collation
    # support must still produce the documented bytewise order
    search._ICU_OK[id(spark)] = False
    try:
        got = [r.name for r in search.list_games_df(games_df).collect()]
    finally:
        search._ICU_OK.pop(id(spark), None)
    # bytewise UTF-8: digits < uppercase < lowercase < Latin-1 < CJK
    assert got == ["123 go", "Apple Pie", "apple pie", "ss-test", "zebra", "Ängstrom", "ß-test", "éclair", "日本語"]

def test_unicode_order_pinned(games_df):
    got = [r.name for r in search.list_games_unicode_df(games_df).collect()]
    # ICU root: numerics first, case-insensitive primary with lowercase
    # before uppercase at tertiary, accents sort next to their base
    assert got == ["123 go", "Ängstrom", "apple pie", "Apple Pie", "éclair", "ss-test", "ß-test", "zebra", "日本語"]

def test_unicode_order_matches_duckdb_icu(games_df):
    got = [r.name for r in search.list_games_unicode_df(games_df).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE g(n VARCHAR)")
    con.executemany("INSERT INTO g VALUES (?)", [(n,) for n in NAMES])
    want = [r[0] for r in con.execute('SELECT n FROM g ORDER BY n COLLATE "en_us"').fetchall()]
    assert got == want
