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

# (applicationId, sf_dir, name) -> DataFrame. A PLAN memo, not a result
# memo: a DataFrame is an immutable lazy plan, so every action on it
# still recomputes from the parquet files — only the plan-construction
# cost (a spark.read.parquet round-trip is ~0.1 s of py4j + file
# listing + schema read, and every builder pays it 1-4 times) is
# amortized across a session. Profiled r12: builder invocation was 45%
# of the whole-registry bench, and redundant scans were a top line
# item. Cleared by dedup.clear_session_memos alongside the other memos
# (an ingest that mutates a previously-read sf_dir must invalidate the
# captured file listing the same way it invalidates persisted
# subtrees).
_TABLE_MEMO: dict[tuple[str, str, str], DataFrame] = {}


def _plan_memo(fn):
    """Memoize a zero-extra-arg (spark, sf_dir) -> DataFrame projection
    builder per (applicationId, sf_dir) — same rationale and
    invalidation contract as _TABLE_MEMO (the games/new_games/images/
    jobs/game_embeddings projections are rebuilt by dozens of query
    builders per bench run; each build is ~0.2 s of py4j)."""
    import functools

    @functools.wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        key = (spark.sparkContext.applicationId, sf_dir, fn.__name__)
        memo = _TABLE_MEMO.get(key)
        if memo is None:
            memo = _TABLE_MEMO[key] = fn(spark, sf_dir)
        return memo

    return wrapped



def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan. Column pruning + predicate pushdown reach the scan
    because downstream operators select/filter declaratively.

    events.ts is normalized to TIMESTAMP_NTZ whatever the fixture's
    physical encoding happens to be in a given round:

    * timestamp[us] (current fixtures) reads as NTZ natively — no-op;
    * TIMESTAMP(NANOS) (earlier fixtures) needs
      spark.sql.legacy.parquet.nanosAsLong (a *runtime* conf, set here
      rather than only at session-build time because the driver harness
      hands in a SparkSession built without it) and then an integer-
      division nanos->micros conversion (double division would lose low
      bits at 1e18 ns);
    * a TIMESTAMP (LTZ) reading is re-rendered as NTZ.

    Downstream epoch arithmetic goes through functions.timeutil.epoch_us
    so the NTZ wall-clock is always interpreted as UTC — matching the
    DuckDB oracles' epoch_us over the same naive timestamps. Both
    legacy branches build the NTZ by adding epoch micros to an NTZ
    epoch literal — pure NTZ arithmetic that never consults
    spark.sql.session.timeZone, so a non-UTC driver session cannot
    shift the wall-clock (an NTZ<->LTZ cast would).
    """
    key = (spark.sparkContext.applicationId, sf_dir, name)
    memo = _TABLE_MEMO.get(key)
    if memo is not None:
        return memo
    if name == "events":
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass  # locked-down conf: fall through and hope the session was built with it
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # nanos-as-long fixture: integer-divide to micros (double
            # division would lose low bits at 1e18 ns)
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, ts div 1000,"
                    " TIMESTAMP_NTZ'1970-01-01 00:00:00')"
                ),
            )
        elif ts_type == "timestamp":
            # LTZ fixture: unix_micros reads the instant directly
            # (tz-independent), then re-render as UTC wall-clock
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, unix_micros(ts),"
                    " TIMESTAMP_NTZ'1970-01-01 00:00:00')"
                ),
            )
    _TABLE_MEMO[key] = df
    return df

# ---------------------------------------------------------------------------
# games projection (reference Game rows — src/types.d.ts:59-66)
# ---------------------------------------------------------------------------

@_plan_memo
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

@_plan_memo
def new_games(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic merge-input batch (FIXTURES.md §3): the role of a
    fresh gather result (gatherGames.ts:9-40). Derived from `part`:

    * p_partkey % 5 == 0 -> same universeId as an existing game, changed
      name/rootPlaceId (matched-update path)
    * % 5 == 1 -> new id (p_partkey + 1_000_000) (insert path)
    * % 5 == 2 -> new id (p_partkey + 2_000_000) emitted TWICE with an
      `ord` batch-position column (keep-last dedup, gatherGames.ts:89)

    description is text-or-NULL only (no known-blank '') so the
    rolimons `?? `-coalesce variant is unambiguous under the tri-state
    encoding.
    """
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 5 <= 2)
    mod5 = F.col("p_partkey") % 5
    base = p.select(
        F.when(mod5 == 0, F.col("p_partkey"))
        .when(mod5 == 1, F.col("p_partkey") + 1_000_000)
        .otherwise(F.col("p_partkey") + 2_000_000)
        .cast("long")
        .alias("universeId"),
        (F.col("p_partkey") * 10 + 7).cast("long").alias("rootPlaceId"),
        F.concat(F.lit("new "), F.col("p_name")).alias("name"),
        F.when(F.col("p_partkey") % 2 == 0, F.concat(F.lit("fresh "), F.col("p_type")))
        .otherwise(F.lit(None).cast("string"))
        .alias("description"),
        ((F.col("p_partkey") * 11) % 600).cast("int").alias("playerCount"),
        (F.col("p_partkey") * 2).cast("long").alias("ord"),
    )
    dups = (
        p.filter(mod5 == 2)
        .select(
            (F.col("p_partkey") + 2_000_000).cast("long").alias("universeId"),
            (F.col("p_partkey") * 10 + 9).cast("long").alias("rootPlaceId"),
            F.concat(F.lit("dup "), F.col("p_name")).alias("name"),
            F.lit(None).cast("string").alias("description"),
            F.lit(None).cast("int").alias("playerCount"),
            (F.col("p_partkey") * 2 + 1).cast("long").alias("ord"),
        )
    )
    return base.unionByName(dups)

NEW_GAMES_SQL = """
SELECT
  CAST(CASE WHEN p_partkey % 5 = 0 THEN p_partkey
            WHEN p_partkey % 5 = 1 THEN p_partkey + 1000000
            ELSE p_partkey + 2000000 END AS BIGINT) AS universeId,
  CAST(p_partkey * 10 + 7 AS BIGINT) AS rootPlaceId,
  'new ' || p_name AS name,
  CASE WHEN p_partkey % 2 = 0 THEN 'fresh ' || p_type ELSE NULL END AS description,
  CAST((p_partkey * 11) % 600 AS INT) AS playerCount,
  CAST(p_partkey * 2 AS BIGINT) AS ord
FROM part WHERE p_partkey % 5 <= 2
UNION ALL
SELECT
  CAST(p_partkey + 2000000 AS BIGINT),
  CAST(p_partkey * 10 + 9 AS BIGINT),
  'dup ' || p_name,
  NULL,
  NULL,
  CAST(p_partkey * 2 + 1 AS BIGINT)
FROM part WHERE p_partkey % 5 = 2
"""

@_plan_memo
def images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-inventory listing table (FIXTURES.md §4): which games have
    icon/thumbnail files (reference probes the filesystem per row,
    stats.get.ts:48-71; here it's a DataFrame the stats/skip-existing
    operators anti-join against). ~70% icons, ~60% thumbnails."""
    p = load_table(spark, sf_dir, "part").select(F.col("p_partkey").cast("long").alias("universeId"))
    icon = p.filter(F.col("universeId") % 10 <= 6).select(
        "universeId", F.lit("icon").alias("kind")
    )
    thumb = p.filter(F.col("universeId") % 10 <= 5).select(
        "universeId", F.lit("thumbnail").alias("kind")
    )
    both = icon.unionByName(thumb)
    return both.withColumn(
        "path",
        F.concat(F.lit("images/"), F.col("universeId").cast("string"), F.lit("/"), F.col("kind"), F.lit(".png")),
    )

IMAGES_SQL = """
SELECT CAST(p_partkey AS BIGINT) AS universeId, kind,
       'images/' || CAST(p_partkey AS VARCHAR) || '/' || kind || '.png' AS path
FROM part, (SELECT unnest(['icon','thumbnail']) AS kind)
WHERE (kind = 'icon' AND p_partkey % 10 <= 6)
   OR (kind = 'thumbnail' AND p_partkey % 10 <= 5)
"""

@_plan_memo
def jobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jobs metadata table (SQLite DDL, jobManager.ts:46-60) projected
    from `events`: event_id -> job id, ts -> created_at, deterministic
    status/progress so ordering + paging + status-group queries have
    all four statuses and NULL progress pairs."""
    e = load_table(spark, sf_dir, "events")
    m10 = F.col("event_id") % 10
    status = (
        F.when(m10 <= 3, "completed").when(m10 <= 6, "running").when(m10 <= 8, "pending").otherwise("failed")
    )
    return e.select(
        F.concat(F.lit("job_"), F.col("event_id").cast("string")).alias("id"),
        F.col("event_type").alias("command"),
        status.alias("status"),
        F.when(F.col("event_id") % 2 == 0, F.floor(F.col("value") % 100).cast("int"))
        .otherwise(F.lit(None).cast("int"))
        .alias("progress_current"),
        F.when(F.col("event_id") % 2 == 0, F.lit(100).cast("int"))
        .otherwise(F.lit(None).cast("int"))
        .alias("progress_total"),
        F.when(m10 == 9, F.lit("boom")).otherwise(F.lit(None).cast("string")).alias("error"),
        F.col("ts").alias("created_at"),
        F.when(m10 <= 6, F.col("ts") + F.expr("INTERVAL 1 MINUTE")).alias("started_at"),
        F.when((m10 <= 3) | (m10 == 9), F.col("ts") + F.expr("INTERVAL 5 MINUTE")).alias(
            "completed_at"
        ),
    )

JOBS_SQL = """
SELECT
  'job_' || CAST(event_id AS VARCHAR) AS id,
  event_type AS command,
  CASE WHEN event_id % 10 <= 3 THEN 'completed'
       WHEN event_id % 10 <= 6 THEN 'running'
       WHEN event_id % 10 <= 8 THEN 'pending'
       ELSE 'failed' END AS status,
  CASE WHEN event_id % 2 = 0 THEN CAST(floor(value % 100) AS INT) END AS progress_current,
  CASE WHEN event_id % 2 = 0 THEN CAST(100 AS INT) END AS progress_total,
  CASE WHEN event_id % 10 = 9 THEN 'boom' END AS error,
  ts AS created_at,
  CASE WHEN event_id % 10 <= 6 THEN ts + INTERVAL 1 MINUTE END AS started_at,
  CASE WHEN event_id % 10 <= 3 OR event_id % 10 = 9 THEN ts + INTERVAL 5 MINUTE END AS completed_at
FROM events
"""

@_plan_memo
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
    """Wrap an oracle query with the domain-view CTEs so it can
    reference the projected tables (games, game_embeddings, new_games,
    images, jobs) by name."""
    return (
        "WITH games AS (" + GAMES_SQL + "),\n"
        "game_embeddings AS (" + GAME_EMBEDDINGS_SQL + "),\n"
        "new_games AS (" + NEW_GAMES_SQL + "),\n"
        "images AS (" + IMAGES_SQL + "),\n"
        "jobs AS (" + JOBS_SQL + ")\n" + sql
    )
