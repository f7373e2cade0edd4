"""Bucketed table layout: pre-shuffled storage for repeated equi-joins.

Every reference query that touches both corpora joins games and
embeddings on universeId (vectorSearch.get.ts:154-168,
pruneGames.ts:129-198, generateEmbeddings.ts:24-29). On a 100 TB
corpus the games side stops being broadcastable, and every such join
becomes a full two-sided shuffle. Bucketing amortizes that shuffle
into the WRITE: both tables are hash-partitioned into the same number
of buckets on the join key at save time, so every later sort-merge
join is exchange-free — the scan itself satisfies the join's
distribution requirement. This is Spark's native bucketing
(`DataFrameWriter.bucketBy` + `saveAsTable`); at cluster scale the
same layout comes from Iceberg/Delta bucket transforms.

Sizing: bucket count should give ~128-512 MB per bucket file at the
target scale; the helpers default to 32 (right for the test SFs) and
take it as a parameter because the number is a storage-layout contract
— both sides must match for the exchange elision to fire.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from ..sources import tables

def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    buckets: int = 32,
    sort: list[str] | None = None,
) -> None:
    """Persist df hash-bucketed (and per-file sorted) on `keys`. The
    sort makes each bucket file merge-join-ready, so a downstream SMJ
    needs neither Exchange nor (with one file per bucket) Sort.

    The in-memory catalog forgets tables across JVMs but their files
    survive in the warehouse dir, and saveAsTable refuses a location it
    did not create — so both the catalog entry and any orphaned
    location are cleared first (a metastore-backed deployment would
    just DROP TABLE)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    leftover = os.path.join(warehouse.removeprefix("file:"), table.lower())
    if os.path.exists(leftover):
        shutil.rmtree(leftover)
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, *keys)
        .sortBy(*(sort or keys))
        .saveAsTable(table)
    )

def cobucket_corpus(
    spark: SparkSession, sf_dir: str, buckets: int = 32
) -> tuple[DataFrame, DataFrame]:
    """Materialize the games and game-embeddings corpora co-bucketed on
    universeId and return the table handles. Joining the two results on
    universeId is exchange-free (asserted in tests/test_plans.py)."""
    write_bucketed(tables.games(spark, sf_dir), "games_bucketed", ["universeId"], buckets)
    write_bucketed(
        tables.game_embeddings(spark, sf_dir),
        "game_embeddings_bucketed",
        ["universeId"],
        buckets,
    )
    return spark.table("games_bucketed"), spark.table("game_embeddings_bucketed")
