"""Reference-format JSON IO (S1-S4): tri-state import mapping, export
byte-format, and lossless roundtrips both directions."""

from __future__ import annotations

import json

import pytest

from roblox_vector_search_datagen_spark.sources import jsonio, tables

REF_GAMES = [
    # full row — every field present
    {
        "universeId": 1,
        "rootPlaceId": 11,
        "name": "alpha",
        "description": "a game",
        "gameplayDescription": "**Gameplay Summary**: fun",
        "playerCount": 5,
    },
    # JSON null = known blank (reference marks not-found games null,
    # downloadDescriptions.ts:56-59)
    {"universeId": 2, "rootPlaceId": 22, "name": "beta", "description": None},
    # keys absent = never fetched (JS undefined)
    {"universeId": 3, "rootPlaceId": 33, "name": "gamma"},
]

@pytest.fixture()
def games_json(tmp_path):
    p = tmp_path / "games.json"
    p.write_text(json.dumps(REF_GAMES, indent=4))
    return str(p)

def test_read_games_json_tristate(spark, games_json):
    rows = {r["universeId"]: r for r in jsonio.read_games_json(spark, games_json).collect()}
    assert len(rows) == 3
    assert rows[1]["description"] == "a game"
    assert rows[1]["playerCount"] == 5
    # JSON null -> '' (known blank)
    assert rows[2]["description"] == ""
    # absent -> NULL (never fetched)
    assert rows[3]["description"] is None
    assert rows[2]["gameplayDescription"] is None

def test_games_json_roundtrip(spark, tmp_path, games_json):
    df = jsonio.read_games_json(spark, games_json)
    out = tmp_path / "out.json"
    n = jsonio.write_games_json(df, str(out))
    assert n == 3
    data = json.load(open(out))
    # sorted by universeId, reference key layout
    assert [g["universeId"] for g in data] == [1, 2, 3]
    assert data[1]["description"] is None  # known blank -> JSON null
    assert "description" not in data[2]  # never fetched -> key absent
    assert "playerCount" not in data[1]
    # a second read of our own export is a fixed point
    again = jsonio.read_games_json(spark, str(out)).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, df.collect()))

def test_embeddings_json_roundtrip(spark, tmp_path):
    src = tmp_path / "embeddings.json"
    src.write_text(json.dumps({"7": [0.5, 1.0], "3": [2.0, 3.5]}))
    df = jsonio.read_embeddings_json(spark, str(src))
    rows = {r["universeId"]: list(r["embedding"]) for r in df.collect()}
    assert rows == {7: [0.5, 1.0], 3: [2.0, 3.5]}
    out = tmp_path / "out.json"
    assert jsonio.write_embeddings_json(df, str(out)) == 2
    data = json.load(open(out))
    assert data == {"3": [2.0, 3.5], "7": [0.5, 1.0]}
    # compact + numerically ascending keys, like JS JSON.stringify
    text = out.read_text()
    assert "\n" not in text and text.index('"3"') < text.index('"7"')

def test_games_jsonl_roundtrip(spark, sf_dir, tmp_path):
    """Distributed scale path preserves the engine encoding exactly
    (NULL -> absent -> NULL, '' -> \"\" -> '')."""
    df = tables.games(spark, sf_dir)
    path = str(tmp_path / "games_jsonl")
    jsonio.write_games_jsonl(df, path)
    back = jsonio.read_games_jsonl(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))

def test_images_dir_roundtrip(spark, tmp_path):
    """S13 loose-PNG tree -> binaryFile import -> export reproduces the
    reference directory layout byte-for-byte."""
    from roblox_vector_search_datagen_spark.corpus import Corpus

    src = tmp_path / "images"
    for uid, kind, blob in [(7, "icon", b"PNG7i"), (7, "thumbnail", b"PNG7t"), (9, "icon", b"PNG9i")]:
        d = src / str(uid)
        d.mkdir(exist_ok=True, parents=True)
        (d / f"{kind}.png").write_bytes(blob)
    c = Corpus(spark, str(tmp_path / "data"))
    c.import_images_dir(str(src))
    rows = {(r["universeId"], r["kind"]): bytes(r["content"]) for r in c.images().collect()}
    assert rows == {(7, "icon"): b"PNG7i", (7, "thumbnail"): b"PNG7t", (9, "icon"): b"PNG9i"}
    out = tmp_path / "out_images"
    assert c.export_images_dir(str(out)) == 3
    assert (out / "7" / "thumbnail.png").read_bytes() == b"PNG7t"
    assert (out / "9" / "icon.png").read_bytes() == b"PNG9i"
