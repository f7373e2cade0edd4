"""Query-surface operators: vector search, similar search, text search,
listing, stats and counts.

Reference endpoints: src/endpoints/vectorSearch.get.ts,
similarSearch.get.ts, search.get.ts, games.get.ts, stats.get.ts and CLI
countGames.ts. The reference loads both JSON datasets wholesale per
request and scores in a JS loop; here each query is a declarative plan:

  scan (pruned cols) -> narrow left join for the popularity factor
  -> Catalyst cosine / scoring cascade -> TakeOrderedAndProject top-k
  -> broadcast decoration join of the tiny top-k against games

The two-phase join matters at scale: ranking happens on narrow rows
(id, sim), so the sort never carries wide text columns, and the
decoration join broadcasts k<=100 rows instead of shuffling the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import vector as V
from ..sources import tables

GAME_COLS = ["universeId", "rootPlaceId", "name", "description", "gameplayDescription", "playerCount"]

def popularity_factor(player_count):
    """min(0.2, playerCount/500) + 0.8 — reference search.get.ts:120-121,
    vectorSearch.get.ts:141-142 (missing playerCount counts as 0)."""
    return F.least(F.lit(0.2), F.coalesce(player_count, F.lit(0)).cast("double") / 500.0) + 0.8

POPULARITY_SQL = "(least(0.2, CAST(coalesce({pc}, 0) AS DOUBLE) / 500.0) + 0.8)"

def _decorate_topk(topk: DataFrame, games_df: DataFrame) -> DataFrame:
    """J7 decoration join. The reference slices top-k first and *then*
    drops ids with no game row (filter(g !== null),
    vectorSearch.get.ts:154-168) — so the inner join runs after limit
    and can legitimately return fewer than k rows. topk is tiny; Spark
    broadcasts it against the corpus-sized games table."""
    return (
        games_df.join(F.broadcast(topk), "universeId", "inner")
        .select(*GAME_COLS, "similarity")
    )

def vector_search_df(
    games_df: DataFrame, emb_df: DataFrame, query_vec: list[float], limit: int = 10
) -> DataFrame:
    """DataFrame-level core of semantic search — shared by the fixture
    registry query and the corpus CLI/API surface.

    Deliberate deviation: similarity is rounded to 6dp BEFORE top-k
    ranking (the reference sorts unrounded and rounds after slicing,
    vectorSearch.get.ts:189-198). Rounding first quantizes float noise
    so Spark and the DuckDB oracle — whose summation orders differ in
    the last bits — agree on near-tie ordering, with universeId as the
    deterministic tie-break. At 6dp the rank inversion window is ~1e-6,
    far below embedding noise."""
    limit = max(1, min(100, limit))  # clamp, vectorSearch.get.ts:84-90
    qv = V.vector_lit_spark_sql(query_vec)
    sim = (
        f"round(({V.cosine_expr_sql('embedding', qv)})"
        f" * {POPULARITY_SQL.format(pc='playerCount')}, 6)"
    )
    scored = (
        emb_df.filter(F.size("embedding") == len(query_vec))  # P11 guard, search.ts:74-76
        .join(games_df.select("universeId", "playerCount"), "universeId", "left")
        .selectExpr("universeId", f"{sim} AS similarity")
    )
    topk = scored.orderBy(F.col("similarity").desc_nulls_last(), F.col("universeId")).limit(limit)
    return _decorate_topk(topk, games_df)

def vector_search(
    spark: SparkSession, sf_dir: str, query_text: str = "deep space mining adventure", limit: int = 10
) -> DataFrame:
    """Semantic search (vectorSearch.get.ts:72-168).

    Query embedding is computed once on the driver and enters the plan
    as a literal array — broadcast with the task closures, no join.
    """
    return vector_search_df(
        tables.games(spark, sf_dir),
        tables.game_embeddings(spark, sf_dir),
        V.embed_query(query_text),
        limit,
    )

def vector_search_oracle(query_text: str = "deep space mining adventure", limit: int = 10) -> str:
    limit = max(1, min(100, limit))
    qv = V.vector_sql_literal(V.embed_query(query_text))
    cos = V.cosine_sql("e.embedding", "q.qv")
    pop = POPULARITY_SQL.format(pc="g.playerCount")
    return tables.with_domain_views(f"""
, q AS (SELECT {qv} AS qv)
, scored AS (
    SELECT e.universeId, round({cos} * {pop}, 6) AS similarity
    FROM game_embeddings e CROSS JOIN q
    LEFT JOIN games g ON g.universeId = e.universeId
    WHERE len(e.embedding) = 64
)
, topk AS (
    SELECT * FROM scored ORDER BY similarity DESC NULLS LAST, universeId LIMIT {limit}
)
SELECT g.universeId, g.rootPlaceId, g.name, g.description, g.gameplayDescription,
       g.playerCount, t.similarity
FROM topk t JOIN games g ON g.universeId = t.universeId
""")

def similar_search_df(
    games_df: DataFrame, emb_df: DataFrame, target: int, limit: int = 10
) -> DataFrame:
    """DataFrame-level core of item-to-item similarity."""
    limit = max(1, min(100, limit))
    target_vec = F.broadcast(
        emb_df.filter(F.col("universeId") == target).select(F.col("embedding").alias("qv"))
    )
    scored = (
        emb_df.filter(F.col("universeId") != target)  # J8
        .crossJoin(target_vec)
        .join(games_df.select("universeId", "playerCount"), "universeId", "left")
        .select(
            "universeId",
            F.round(
                V.cosine_expr(F.col("embedding"), F.col("qv"))
                * popularity_factor(F.col("playerCount")),
                6,
            ).alias("similarity"),
        )
    )
    topk = scored.orderBy(F.col("similarity").desc_nulls_last(), F.col("universeId")).limit(limit)
    return _decorate_topk(topk, games_df)

def similar_search(spark: SparkSession, sf_dir: str, target: int = 7, limit: int = 10) -> DataFrame:
    """Item-to-item similarity (similarSearch.get.ts:104-159): seed
    vector from the stored embedding of `target`, score everything else
    (J8 self-exclusion), boost, top-k, decorate.

    The single-row target side is broadcast — a degenerate
    broadcast-nested-loop join, exactly the right physical plan for
    one-vs-all at any scale.
    """
    return similar_search_df(
        tables.games(spark, sf_dir), tables.game_embeddings(spark, sf_dir), target, limit
    )

def similar_search_oracle(target: int = 7, limit: int = 10) -> str:
    limit = max(1, min(100, limit))
    cos = V.cosine_sql("e.embedding", "q.qv")
    pop = POPULARITY_SQL.format(pc="g.playerCount")
    return tables.with_domain_views(f"""
, q AS (SELECT embedding AS qv FROM game_embeddings WHERE universeId = {target})
, scored AS (
    SELECT e.universeId, round({cos} * {pop}, 6) AS similarity
    FROM game_embeddings e CROSS JOIN q
    LEFT JOIN games g ON g.universeId = e.universeId
    WHERE e.universeId <> {target}
)
, topk AS (
    SELECT * FROM scored ORDER BY similarity DESC NULLS LAST, universeId LIMIT {limit}
)
SELECT g.universeId, g.rootPlaceId, g.name, g.description, g.gameplayDescription,
       g.playerCount, t.similarity
FROM topk t JOIN games g ON g.universeId = t.universeId
""")

# ---------------------------------------------------------------------------
# Text search (search.get.ts:104-202) — pure Catalyst, zero UDFs.
# ---------------------------------------------------------------------------

def _word_overlap_ratio(text_col, qwords, n_qwords: int):
    """F6: fraction of query words contained in at least one word of the
    text (search.get.ts:143-152) — higher-order array functions; the
    text token array is let-bound so the split runs once per row."""
    from ..functions.hashing import let_expr

    overlap = let_expr(
        F.split(F.lower(text_col), r"\s+"),
        lambda twords: F.size(
            F.filter(qwords, lambda w: F.exists(twords, lambda t: t.contains(w)))
        ),
    )
    return overlap.cast("double") / float(n_qwords)

def text_search_df(games_df: DataFrame, q: str = "blue rod", limit: int = 10) -> DataFrame:
    """F7 scoring cascade, first-match-wins priority title > description
    > gameplayDescription (search.get.ts:123-187), popularity boost,
    2-decimal rounding (F10), top-k."""
    limit = max(1, min(100, limit))
    ql = q.lower()
    n_qwords = max(1, len(ql.split()))
    qwords = F.split(F.lit(ql), r"\s+")
    g = games_df

    name_l = F.lower(F.col("name"))
    title_hit = name_l.contains(ql)
    title_score = (
        F.lit(100.0)
        + F.when(name_l == ql, 50.0).when(name_l.startswith(ql), 25.0).otherwise(0.0)
    )
    desc_ok = F.col("description").isNotNull() & (F.trim("description") != "")
    desc_hit = desc_ok & F.lower(F.col("description")).contains(ql)
    desc_score = F.lit(50.0) + _word_overlap_ratio(F.col("description"), qwords, n_qwords) * 20.0
    gp_ok = F.col("gameplayDescription").isNotNull() & (F.trim("gameplayDescription") != "")
    gp_hit = gp_ok & F.lower(F.col("gameplayDescription")).contains(ql)
    gp_score = F.lit(25.0) + _word_overlap_ratio(F.col("gameplayDescription"), qwords, n_qwords) * 15.0

    scored = g.select(
        *GAME_COLS,
        F.when(title_hit, title_score)
        .when(desc_hit, desc_score)
        .when(gp_hit, gp_score)
        .alias("base_score"),
        F.when(title_hit, "title")
        .when(desc_hit, "description")
        .when(gp_hit, "gameplayDescription")
        .alias("matchType"),
    ).filter(F.col("base_score").isNotNull())

    return (
        scored.select(
            *GAME_COLS,
            "matchType",
            F.round(F.col("base_score") * popularity_factor(F.col("playerCount")), 2).alias("score"),
        )
        .orderBy(F.col("score").desc_nulls_last(), F.col("universeId"))
        .limit(limit)
    )

def text_search(spark: SparkSession, sf_dir: str, q: str = "blue rod", limit: int = 10) -> DataFrame:
    return text_search_df(tables.games(spark, sf_dir), q, limit)

def text_search_oracle(q: str = "blue rod", limit: int = 10) -> str:
    limit = max(1, min(100, limit))
    ql = q.lower().replace("'", "''")
    n_qwords = max(1, len(q.lower().split()))
    pop = POPULARITY_SQL.format(pc="playerCount")

    def overlap(col: str) -> str:
        return (
            f"(CAST(len(list_filter(string_split_regex('{ql}', '\\s+'), "
            f"w -> len(list_filter(string_split_regex(lower({col}), '\\s+'), "
            f"t -> contains(t, w))) > 0)) AS DOUBLE) / {float(n_qwords)})"
        )

    return tables.with_domain_views(f"""
, scored AS (
  SELECT *,
    CASE
      WHEN contains(lower(name), '{ql}') THEN
        100.0 + CASE WHEN lower(name) = '{ql}' THEN 50.0
                     WHEN starts_with(lower(name), '{ql}') THEN 25.0 ELSE 0.0 END
      WHEN description IS NOT NULL AND trim(description) <> ''
           AND contains(lower(description), '{ql}') THEN
        50.0 + {overlap('description')} * 20.0
      WHEN gameplayDescription IS NOT NULL AND trim(gameplayDescription) <> ''
           AND contains(lower(gameplayDescription), '{ql}') THEN
        25.0 + {overlap('gameplayDescription')} * 15.0
    END AS base_score,
    CASE
      WHEN contains(lower(name), '{ql}') THEN 'title'
      WHEN description IS NOT NULL AND trim(description) <> ''
           AND contains(lower(description), '{ql}') THEN 'description'
      WHEN gameplayDescription IS NOT NULL AND trim(gameplayDescription) <> ''
           AND contains(lower(gameplayDescription), '{ql}') THEN 'gameplayDescription'
    END AS matchType
  FROM games
)
SELECT universeId, rootPlaceId, name, description, gameplayDescription, playerCount,
       matchType, round(base_score * {pop}, 2) AS score
FROM scored WHERE base_score IS NOT NULL
ORDER BY score DESC NULLS LAST, universeId LIMIT {limit}
""")

# ---------------------------------------------------------------------------
# Listing / stats / counts
# ---------------------------------------------------------------------------

# per-session capability probe for ICU collation expressions
# (Spark >= 4.0); spark.sql analyzes eagerly, so an unsupported build
# raises here without running a job
_ICU_OK: dict[int, bool] = {}

def _icu_collation_available(spark: SparkSession) -> bool:
    key = id(spark)
    if key not in _ICU_OK:
        try:
            spark.sql("SELECT collate('a', 'UNICODE')")
            _ICU_OK[key] = True
        except Exception:
            _ICU_OK[key] = False
    return _ICU_OK[key]

def list_games_df(games_df: DataFrame, limit: int | None = 50) -> DataFrame:
    g = games_df.select("universeId", "name", "rootPlaceId")
    spark = games_df.sparkSession
    name_key = (
        F.expr("collate(name, 'UNICODE')")
        if _icu_collation_available(spark)
        else F.col("name")
    )
    out = g.orderBy(name_key, "universeId")
    return out.limit(limit) if limit else out

def list_games(spark: SparkSession, sf_dir: str, limit: int | None = 50) -> DataFrame:
    """GET /games (games.get.ts:63-66): name-sorted listing with the
    reference's ICU localeCompare order (Spark `collate(name,
    'UNICODE')` == DuckDB ICU "en_us" — the parity `list_games_unicode`
    pinned in round 2), falling back to binary collation on a Spark
    build without collation support. The ICU sort pays a per-row
    collation-key build, which is why the fallback (and pre-round-3
    default) is binary; universeId breaks ties so the LIMIT cut is
    deterministic either way."""
    return list_games_df(tables.games(spark, sf_dir), limit)

def list_games_oracle(limit: int | None = 50) -> str:
    lim = f" LIMIT {limit}" if limit else ""
    return tables.with_domain_views(
        f'SELECT universeId, name, rootPlaceId FROM games ORDER BY name COLLATE "en_us", universeId{lim}'
    )

def list_games_unicode(spark: SparkSession, sf_dir: str, limit: int = 50) -> DataFrame:
    """ICU locale-aware listing — closes the localeCompare deviation
    (games.get.ts:63-66). Spark's `collate(name, 'UNICODE')` (ICU root
    collation, Spark >= 4.0) produces the same total order as DuckDB's
    ICU `en_us` collation — verified on a mixed case/accent/ß/CJK
    sample and by the driver oracle at sf0.01. universeId breaks exact
    ties so the LIMIT cut is deterministic in both engines. The binary-
    collation `list_games` remains the bench/default path (collated
    sorts pay an ICU key-build per row)."""
    return list_games_unicode_df(tables.games(spark, sf_dir), limit)

def list_games_unicode_df(games_df: DataFrame, limit: int = 50) -> DataFrame:
    g = games_df.select("universeId", "name", "rootPlaceId")
    return g.orderBy(F.expr("collate(name, 'UNICODE')"), "universeId").limit(limit)

def list_games_unicode_oracle(limit: int = 50) -> str:
    return tables.with_domain_views(
        f'SELECT universeId, name, rootPlaceId FROM games ORDER BY name COLLATE "en_us", universeId LIMIT {limit}'
    )

def count_games_df(games_df: DataFrame) -> DataFrame:
    """CLI countGames (countGames.ts:10-17): total + conditional counts.
    Single pass, three count_ifs — map-side partial aggregation."""
    g = games_df
    has = lambda c: F.col(c).isNotNull() & (F.trim(c) != "")
    return g.agg(
        F.count(F.lit(1)).alias("total"),
        F.count_if(has("description")).alias("with_description"),
        F.count_if(has("gameplayDescription")).alias("with_gameplay_description"),
    )

def count_games(spark: SparkSession, sf_dir: str) -> DataFrame:
    return count_games_df(tables.games(spark, sf_dir))

def count_games_oracle() -> str:
    return tables.with_domain_views("""
SELECT CAST(count(*) AS BIGINT) AS total,
       CAST(count(*) FILTER (description IS NOT NULL AND trim(description) <> '') AS BIGINT) AS with_description,
       CAST(count(*) FILTER (gameplayDescription IS NOT NULL AND trim(gameplayDescription) <> '') AS BIGINT) AS with_gameplay_description
FROM games
""")

def stats_df(games_df: DataFrame, emb_df: DataFrame) -> DataFrame:
    """GET /stats (stats.get.ts:45-113): corpus completeness. The
    missing-embeddings metric is a left-anti probe; expressed as a
    broadcast-able existence join then count_if so the whole thing is
    one aggregation pass over games."""
    g = games_df
    emb_ids = emb_df.select("universeId").distinct()
    lacking = lambda c: F.col(c).isNull() | (F.trim(c) == "")
    joined = g.join(
        emb_ids.withColumn("has_embedding", F.lit(1)), "universeId", "left"
    )
    return joined.agg(
        F.count(F.lit(1)).alias("total_games"),
        F.count_if(lacking("description")).alias("lacking_description"),
        F.count_if(lacking("gameplayDescription")).alias("lacking_gameplay_description"),
        F.count_if(F.col("playerCount").isNull()).alias("lacking_player_count"),
        F.count_if(F.col("has_embedding").isNull()).alias("lacking_embeddings"),
    )

def stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stats_df(tables.games(spark, sf_dir), tables.game_embeddings(spark, sf_dir))

def stats_oracle() -> str:
    return tables.with_domain_views("""
SELECT CAST(count(*) AS BIGINT) AS total_games,
       CAST(count(*) FILTER (description IS NULL OR trim(description) = '') AS BIGINT) AS lacking_description,
       CAST(count(*) FILTER (gameplayDescription IS NULL OR trim(gameplayDescription) = '') AS BIGINT) AS lacking_gameplay_description,
       CAST(count(*) FILTER (playerCount IS NULL) AS BIGINT) AS lacking_player_count,
       CAST(count(*) FILTER (e.universeId IS NULL) AS BIGINT) AS lacking_embeddings
FROM games g LEFT JOIN (SELECT DISTINCT universeId FROM game_embeddings) e
  ON g.universeId = e.universeId
""")
