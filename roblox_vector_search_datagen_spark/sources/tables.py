"""Table loaders over the driver-provided parquet fixtures, plus the
deterministic *games projection* that maps the TPC-H-ish tables onto the
reference's domain model (FIXTURES.md §7).

The reference's datasets are games.json + embeddings.json
(src/lib/commands/gatherGames.ts:49-53, generateEmbeddings.ts:17-21).
The driver fixtures don't ship those, so reference-parity operators run
over a deterministic projection:

  games            <- part        (p_partkey -> universeId, p_name -> name, ...)
  game_embeddings  <- embeddings  (vec_id -> universeId)

Both a DataFrame builder and an equivalent ANSI-SQL fragment are kept
here so the DuckDB oracle sees byte-identical input semantics. The
projection bakes in the tri-state text encoding (NULL = never fetched,
'' = known blank, text = present — SURVEY.md §7.4.2) and playerCount
values spanning 0, <100 and >500 (popularity-boost saturation,
reference src/endpoints/search.get.ts:120-121).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan. Column pruning + predicate pushdown reach the scan
    because downstream operators select/filter declaratively."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")

# ---------------------------------------------------------------------------
# games projection (reference Game rows — src/types.d.ts:59-66)
# ---------------------------------------------------------------------------

def games(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic games table derived from `part`.

    Tri-state description by p_partkey % 10: 0-5 text, 6-7 known-blank
    (''), 8-9 never-fetched (NULL). gameplayDescription by % 4 in the
    reference's markdown shape (generateGameplayDescriptions.ts:160-163).
    playerCount by % 10: 0-6 -> (p_partkey*37) % 700 (covers 0, <100,
    >500), else NULL.
    """
    p = load_table(spark, sf_dir, "part")
    mod10 = F.col("p_partkey") % 10
    mod4 = F.col("p_partkey") % 4
    nl2 = F.lit("\n\n")
    gameplay = F.concat(
        F.lit("**Gameplay Summary**: "), F.col("p_name"), nl2,
        F.lit("**Genre Tags**: "), F.col("p_brand"), F.lit(", "), F.col("p_type"), nl2,
        F.lit("**Game Features**: "), F.col("p_size").cast("string"), F.lit(" players"),
    )
    return p.select(
        F.col("p_partkey").cast("long").alias("universeId"),
        (F.col("p_partkey") * 10 + 1).cast("long").alias("rootPlaceId"),
        F.col("p_name").alias("name"),
        F.when(mod10 <= 5, F.concat_ws(" ", F.col("p_type"), F.col("p_name"), F.lit("kit")))
        .when(mod10 <= 7, F.lit(""))
        .otherwise(F.lit(None).cast("string"))
        .alias("description"),
        F.when(mod4 <= 1, gameplay)
        .when(mod4 == 2, F.lit(""))
        .otherwise(F.lit(None).cast("string"))
        .alias("gameplayDescription"),
        F.when(mod10 <= 6, ((F.col("p_partkey") * 37) % 700).cast("int"))
        .otherwise(F.lit(None).cast("int"))
        .alias("playerCount"),
    )

# DuckDB-parsable equivalent of games(); chr(10) keeps the newline
# portable across SQL dialects.
GAMES_SQL = """
SELECT
  CAST(p_partkey AS BIGINT) AS universeId,
  CAST(p_partkey * 10 + 1 AS BIGINT) AS rootPlaceId,
  p_name AS name,
  CASE
    WHEN p_partkey % 10 <= 5 THEN p_type || ' ' || p_name || ' kit'
    WHEN p_partkey % 10 <= 7 THEN ''
    ELSE NULL
  END AS description,
  CASE
    WHEN p_partkey % 4 <= 1 THEN
      '**Gameplay Summary**: ' || p_name || chr(10) || chr(10)
      || '**Genre Tags**: ' || p_brand || ', ' || p_type || chr(10) || chr(10)
      || '**Game Features**: ' || CAST(p_size AS VARCHAR) || ' players'
    WHEN p_partkey % 4 = 2 THEN ''
    ELSE NULL
  END AS gameplayDescription,
  CASE
    WHEN p_partkey % 10 <= 6 THEN CAST((p_partkey * 37) % 700 AS INT)
    ELSE NULL
  END AS playerCount
FROM part
"""

def game_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings.json analog: (universeId, embedding ARRAY<FLOAT>).

    vec_id maps to universeId; ids beyond the part range are orphan
    embeddings (exercising the J4 anti-join, pruneGames.ts:188-198).
    """
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        F.col("vec_id").cast("long").alias("universeId"),
        F.col("embedding"),
    )

GAME_EMBEDDINGS_SQL = "SELECT CAST(vec_id AS BIGINT) AS universeId, embedding FROM embeddings"

def with_domain_views(sql: str) -> str:
    """Wrap an oracle query with the games/game_embeddings CTEs so it can
    reference the projected domain tables by name."""
    return (
        "WITH games AS (" + GAMES_SQL + "),\n"
        "game_embeddings AS (" + GAME_EMBEDDINGS_SQL + ")\n" + sql
    )
