"""Reference-file-format IO (S1-S4): games.json and embeddings.json
import/export, byte-compatible with the reference's on-disk layout.

The reference persists its corpus as two whole-file JSON documents —
a pretty-printed `Game[]` array (src/lib/commands/gatherGames.ts:93,
4-space indent, sorted by universeId) and a compact
`{universeId: number[]}` map (src/lib/commands/generateEmbeddings.ts:108).
Those formats are inherently single-file; the compat reader parses them
with Spark (wholetext scan + from_json) and the compat writer streams a
sorted DataFrame through the driver. Engine-internal storage is parquet
(see tables.py), and the SCALE path for JSON interchange is the
line-delimited reader/writer pair at the bottom — fully distributed.

Tri-state text encoding (SURVEY.md §7.4.2; schemas.py GAME_SCHEMA):

    JS / JSON on disk          engine column value
    key absent  (undefined) -> NULL   ("never fetched")
    key: null               -> ''     ("known blank — don't refetch")
    key: "text"             -> "text"

A stored JSON `""` imports as `''` and therefore merges with the
known-blank state; the reference's predicates treat `""` like undefined
(refetchable, src/lib/commands/downloadDescriptions.ts:13-18) — this is
the one documented deviation of the two-state column encoding.

The absent-vs-null distinction is recovered by parsing each game object
to `map<string,string>`: from_json keeps a JSON-null entry in the map
with a NULL value, while an absent key is simply not in the map, so
`map_contains_key` separates the two (verified against Spark 4.1).
"""

from __future__ import annotations

import json
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import GAME_SCHEMA

_TRISTATE_COLS = ("description", "gameplayDescription")

# ---------------------------------------------------------------------------
# games.json (S1 scan / S2 sink)
# ---------------------------------------------------------------------------

def read_games_json(spark: SparkSession, path: str) -> DataFrame:
    """S1: reference games.json (pretty-printed JSON array) -> GAME_SCHEMA
    rows with the tri-state mapping above.

    Wholetext scan: the file is one JSON document, so the parse is a
    single task — matching the reference, which JSON.parses the whole
    file per command (gatherGames.ts:49-53). For distributed ingest use
    read_games_jsonl.
    """
    raw = spark.read.text(path, wholetext=True)
    g = F.explode(F.from_json("value", "array<map<string,string>>")).alias("g")
    m = raw.select(g)

    def tri(col: str) -> F.Column:
        return (
            F.when(~F.map_contains_key("g", col), F.lit(None).cast("string"))
            .when(F.col("g")[col].isNull(), F.lit(""))
            .otherwise(F.col("g")[col])
            .alias(col)
        )

    return m.select(
        F.col("g")["universeId"].cast("long").alias("universeId"),
        F.col("g")["rootPlaceId"].cast("long").alias("rootPlaceId"),
        F.col("g")["name"].alias("name"),
        tri("description"),
        tri("gameplayDescription"),
        F.col("g")["playerCount"].cast("int").alias("playerCount"),
    )

def write_games_json(df: DataFrame, path: str) -> int:
    """S2: export to the reference's exact sink format — JSON array,
    4-space indent, sorted by universeId (gatherGames.ts:89-93), with
    the tri-state reverse mapping (NULL -> key omitted, '' -> null).

    Streams the sorted result through the driver (toLocalIterator, one
    partition in memory at a time); single-file pretty JSON is a compat
    export, not a scale sink. Returns the row count written.
    """
    rows: list[dict] = []
    for r in df.orderBy("universeId").toLocalIterator():
        g: dict = {
            "universeId": r["universeId"],
            "rootPlaceId": r["rootPlaceId"],
            "name": r["name"],
        }
        for col in _TRISTATE_COLS:
            v = r[col]
            if v == "":
                g[col] = None  # known blank -> JSON null
            elif v is not None:
                g[col] = v
        if r["playerCount"] is not None:
            g["playerCount"] = r["playerCount"]
        rows.append(g)
    with open(path, "w") as f:
        json.dump(rows, f, indent=4)
    return len(rows)

# ---------------------------------------------------------------------------
# embeddings.json (S3 scan / S4 sink)
# ---------------------------------------------------------------------------

def read_embeddings_json(spark: SparkSession, path: str) -> DataFrame:
    """S3: reference embeddings.json `{universeId: number[]}` map ->
    (universeId LONG, embedding ARRAY<FLOAT>) rows.

    The map file is the reference's poor-man's hash index
    (src/lib/commands/search.ts:52-54); relationally it is just a
    two-column table, so it is exploded immediately.
    """
    raw = spark.read.text(path, wholetext=True)
    kv = F.explode(F.from_json("value", "map<string,array<float>>")).alias("k", "v")
    return raw.select(kv).select(
        F.col("k").cast("long").alias("universeId"),
        F.col("v").alias("embedding"),
    )

def write_embeddings_json(df: DataFrame, path: str) -> int:
    """S4: compact JSON map sink (generateEmbeddings.ts:100,108 uses
    JSON.stringify with no indent). Keys ascend numerically — the same
    order JS gives integer-like object keys. Returns rows written."""
    n = 0
    with open(path, "w") as f:
        f.write("{")
        for r in df.orderBy("universeId").toLocalIterator():
            if n:
                f.write(",")
            f.write(json.dumps(str(r["universeId"])))
            f.write(":")
            f.write(json.dumps([float(x) for x in r["embedding"]]))
            n += 1
        f.write("}")
    return n

# ---------------------------------------------------------------------------
# Scale path: line-delimited JSON (distributed both directions)
# ---------------------------------------------------------------------------

def read_games_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Distributed games ingest: one JSON object per line, explicit
    schema (never inference), splittable across executors. Wire form of
    known-blank is `""` (the writer below emits it), so absent -> NULL
    and `""` -> '' reproduce the engine encoding exactly."""
    return spark.read.schema(GAME_SCHEMA).json(path)

def write_games_jsonl(df: DataFrame, path: str) -> None:
    """Distributed games export: NULL columns are omitted per line
    (ignoreNullFields), '' serializes as `""` — lossless w.r.t. the
    engine's two-state encoding and splittable on read."""
    df.write.mode("overwrite").option("ignoreNullFields", "true").json(path)
