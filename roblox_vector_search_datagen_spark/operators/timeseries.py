"""Event-time relational operators the reference lacks but a
training-data pipeline at scale needs: as-of (attribution) join,
per-group exact quantiles, and sketch-based approximate aggregates.

Scale design notes:

* The as-of join is NOT a range join. Spark's generic range-join plan
  (BroadcastNestedLoop or a cross-product filter) is quadratic per key;
  the windowed formulation below shuffles both event streams ONCE on
  the join key and resolves "latest at-or-before" with a running
  `last(..., ignorenulls)` inside each sorted partition — linear work,
  one exchange, no pair blowup. This is the standard distributed as-of
  shape (per-key merge of two time-sorted streams).
* Quantiles use Spark's exact `percentile` (sort-based within group)
  so the DuckDB oracle (`quantile_cont`) matches bit-for-bit after
  rounding; at 100 TB you would flip to `approx_percentile`
  (t-digest, mergeable partial aggregates) — exposed here as the
  sketch variant alongside HyperLogLog++ distinct counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.caching import persist_if
from ..functions.num import qmean6, qsum6
from ..functions.timeutil import epoch_us
from ..sources import tables

# ---------------------------------------------------------------------------
# As-of join: purchase -> latest prior click (attribution)
# ---------------------------------------------------------------------------

def asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every `purchase` event, the same user's most recent `click`
    at-or-before the purchase time (left as-of join: purchases with no
    prior click keep NULL attribution), plus the click->purchase
    latency in seconds.

    Both sides come from one filtered scan; the window runs over the
    interleaved (click|purchase) stream per user ordered by event time,
    carrying the last click seen — the reference has no temporal joins
    at all (SURVEY.md §2.3), so this is pure scale-path surface.

    Equal-timestamp semantics are pinned, not fixture-dependent: the
    window orders by (ts, event_type, event_id), which sorts a same-ts
    click BEFORE the purchase ('click' < 'purchase'), so at-or-before
    includes it; among same-ts clicks the LAST by event_id wins. The
    oracle encodes exactly that with an ORDER BY ... LIMIT 1 lateral
    (DuckDB's ASOF leaves the equal-key pick unspecified).
    """
    e = tables.load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_type", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_click = F.col("event_type") == "click"
    carried = e.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.last(F.when(is_click, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("click_event_id"),
        F.last(F.when(is_click, F.col("ts")), ignorenulls=True).over(w).alias("click_ts"),
    )
    return carried.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "click_event_id",
        "click_ts",
        F.round(
            (epoch_us("ts") - epoch_us("click_ts")) / F.lit(1_000_000.0), 6
        ).alias("latency_sec"),
    )

def asof_attribution_oracle() -> str:
    return """
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
       m.event_id AS click_event_id, m.ts AS click_ts,
       round((epoch_us(p.ts) - epoch_us(m.ts)) / 1000000.0, 6) AS latency_sec
FROM p LEFT JOIN LATERAL (
  SELECT c.event_id, c.ts FROM c
  WHERE c.user_id = p.user_id AND c.ts <= p.ts
  ORDER BY c.ts DESC, c.event_id DESC LIMIT 1
) m ON true
"""

# ---------------------------------------------------------------------------
# Per-group exact quantiles
# ---------------------------------------------------------------------------

def event_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction + rollup: parse the events `props`
    JSON column against an explicit schema (from_json — never schema
    inference in the engine) and aggregate the extracted field per
    event_type. The parse is a per-row projection fused into the scan
    stage; the rollup is one map-side-combined aggregation, so the
    shuffle carries |event_type| rows. At 100 TB the same pattern
    handles wide telemetry payloads — parse once, project typed
    columns, drop the raw string before anything shuffles."""
    e = tables.load_table(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k INT")["k"]
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("k").isNull(), 1).otherwise(0)).cast("bigint").alias("null_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )

def event_props_rollup_oracle() -> str:
    return """
WITH x AS (
  SELECT event_type, CAST(props->>'k' AS INT) AS k FROM events
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_k,
       round(avg(k), 6) AS avg_k,
       min(k) AS min_k, max(k) AS max_k
FROM x GROUP BY event_type
"""

INTERVAL_JOIN_MIN = 10

def interval_click_counts(
    spark: SparkSession, sf_dir: str, window_min: int = INTERVAL_JOIN_MIN
) -> DataFrame:
    """Bounded-interval join: for every purchase, the count of the same
    user's clicks in the trailing `window_min` minutes (asof_attribution
    keeps only the LAST click; this is the all-matches interval-join
    class).

    Scale shape: a naive (user_id, range) join degenerates to per-user
    cross products. Because the interval is bounded, each purchase can
    only match clicks in its own or the previous `window_min` time
    bucket — so the purchase side explodes to exactly 2 bucket probes
    and the join key becomes the fully-equi (user_id, bucket), hash-
    partitionable like any other join; the exact range predicate then
    filters the candidates. Join fan-out is bounded by bucket density,
    never by user history length. Left semantics (zero-click purchases
    kept) survive the explode because count() ignores the NULL probes."""
    e = tables.load_table(spark, sf_dir, "events")
    us = 60 * 1_000_000 * window_min
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        epoch_us("ts").alias("click_us"),
        (epoch_us("ts") / us).cast("long").alias("bucket"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        epoch_us("ts").alias("p_us"),
    )
    probes = purchases.select(
        "*",
        F.explode(
            F.array((F.col("p_us") / us).cast("long"), (F.col("p_us") / us).cast("long") - 1)
        ).alias("bucket"),
    )
    p, c = probes.alias("p"), clicks.alias("c")
    # the range predicate is part of the JOIN condition (not a post-
    # filter) so a purchase whose bucket candidates all miss the window
    # still emits its NULL row — left semantics survive
    cond = (
        (F.col("p.user_id") == F.col("c.user_id"))
        & (F.col("p.bucket") == F.col("c.bucket"))
        & (F.col("c.click_us") <= F.col("p.p_us"))
        & (F.col("c.click_us") > F.col("p.p_us") - us)
    )
    return (
        p.join(c, cond, "left")
        .groupBy(F.col("p.purchase_id").alias("purchase_id"),
                 F.col("p.user_id").alias("user_id"),
                 F.col("p.purchase_ts").alias("purchase_ts"))
        .agg(F.count("c.click_us").alias("n_clicks"))
    )

def interval_click_counts_oracle(window_min: int = INTERVAL_JOIN_MIN) -> str:
    return f"""
SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
       CAST(count(c.ts) AS BIGINT) AS n_clicks
FROM events p
LEFT JOIN events c
  ON c.user_id = p.user_id AND c.event_type = 'click'
 AND c.ts <= p.ts AND c.ts > p.ts - INTERVAL {window_min} MINUTE
WHERE p.event_type = 'purchase'
GROUP BY 1, 2, 3
"""

def event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP aggregation: event counts and value sums at
    (nation, event_type), per-nation subtotal, and grand-total levels in
    ONE pass — the OLAP reporting shape (grouping-sets). grouping_id
    disambiguates genuine NULL keys from subtotal rows. Spark computes
    rollups by replicating map-side partial aggregates per grouping
    set, so the exchange still carries only aggregated rows; the user
    dimension joins broadcast before any aggregation."""
    from ..streaming.events import _dim_users

    e = tables.load_table(spark, sf_dir, "events")
    enriched = e.join(F.broadcast(_dim_users(spark, sf_dir)), "user_id")
    return (
        enriched.rollup("nation", "event_type")
        .agg(
            F.grouping_id().cast("int").alias("level"),
            F.count(F.lit(1)).alias("n"),
            qsum6("value").alias("sum_value"),
        )
        .select("nation", "event_type", "level", "n", "sum_value")
    )

def event_rollup_oracle() -> str:
    return """
SELECT n.n_name AS nation, e.event_type,
       CAST(GROUPING(n.n_name) * 2 + GROUPING(e.event_type) AS INT) AS level,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(CAST(round((e.value) * 1e6) AS BIGINT)) / 1e6, 6) AS sum_value
FROM events e
JOIN customer c ON c.c_custkey = e.user_id
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY ROLLUP(n.n_name, e.event_type)
"""

def event_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p25/p50/p75 (linear interpolation), mean and count of
    `value` per event_type — the distribution profile a pipeline
    computes before setting quality-filter thresholds."""
    e = tables.load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.25)), 6).alias("p25"),
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.75)), 6).alias("p75"),
        qmean6("value").alias("mean_value"),
        F.count(F.lit(1)).alias("n"),
    )

def event_value_quantiles_oracle() -> str:
    return """
SELECT event_type,
       round(quantile_cont(value, 0.25), 6) AS p25,
       round(quantile_cont(value, 0.50), 6) AS p50,
       round(quantile_cont(value, 0.75), 6) AS p75,
       CAST(round(sum(CAST(round((value) * 1e6) AS BIGINT)) / count(value)) AS BIGINT) / 1e6 AS mean_value,
       count(*) AS n
FROM events GROUP BY event_type
"""

# ---------------------------------------------------------------------------
# Funnel + cohort retention (classic event analytics over the same table)
# ---------------------------------------------------------------------------

FUNNEL_STAGES = ("signup", "click", "purchase")

def funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup -> click -> purchase: a user
    reaches stage N when they have an event of stage N's type at-or-
    after their stage N-1 entry time. Emits (stage, event_type, users).

    Scale shape: each stage is one filtered scan aggregated to one row
    per user (map-side combined), then an equi-join on user_id against
    the previous stage's (user_id, entry_ts) — all three joins hash-
    partition on the same key, so AQE coalesces them onto one exchange
    lineage; nothing is ever ordered globally and no per-user history
    is materialized (contrast the window formulation, which would sort
    every user's full event list)."""
    e = tables.load_table(spark, sf_dir, "events")
    stage_dfs = []
    prev = None
    for i, et in enumerate(FUNNEL_STAGES, start=1):
        cur = e.filter(F.col("event_type") == et).select("user_id", "ts")
        if prev is not None:
            cur = cur.join(prev, "user_id").filter(F.col("ts") >= F.col("entry_ts"))
        cur = cur.groupBy("user_id").agg(F.min("ts").alias("entry_ts"))
        stage_dfs.append(
            cur.agg(F.count(F.lit(1)).alias("users")).select(
                F.lit(i).cast("int").alias("stage"),
                F.lit(et).alias("event_type"),
                F.col("users"),
            )
        )
        prev = cur
    out = stage_dfs[0]
    for s in stage_dfs[1:]:
        out = out.unionByName(s)
    return out

def funnel_counts_oracle() -> str:
    return """
WITH s1 AS (
  SELECT user_id, min(ts) AS entry_ts FROM events WHERE event_type = 'signup' GROUP BY 1
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS entry_ts
  FROM events e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts >= s1.entry_ts GROUP BY 1
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS entry_ts
  FROM events e JOIN s2 ON s2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= s2.entry_ts GROUP BY 1
)
SELECT CAST(1 AS INT) AS stage, 'signup' AS event_type, CAST(count(*) AS BIGINT) AS users FROM s1
UNION ALL
SELECT CAST(2 AS INT), 'click', CAST(count(*) AS BIGINT) FROM s2
UNION ALL
SELECT CAST(3 AS INT), 'purchase', CAST(count(*) AS BIGINT) FROM s3
"""

FUNNEL_GAP_HOURS = 72


def funnel_within(
    spark: SparkSession, sf_dir: str, gap_hours: int = FUNNEL_GAP_HOURS
) -> DataFrame:
    """Time-bounded conversion funnel: stage N counts users whose stage
    N event lands within `gap_hours` of their stage N-1 entry — the
    funnel marketers actually run (an unbounded funnel credits a
    purchase a month after the click). Emits (stage, event_type,
    users, conversion) with conversion = stage users / previous-stage
    users (1.0 at stage 1, 6-dp rounded).

    Same scale shape as `funnel_counts`: one filtered scan per stage
    aggregated to (user_id, entry_ts), equi-joined on user_id against
    the previous stage — all stages hash-partition on the same key.
    The conversion ratios join three 1-row aggregates (driver-sized;
    broadcast), never a window over the funnel rows."""
    e = tables.load_table(spark, sf_dir, "events")
    gap = F.expr(f"INTERVAL {gap_hours} HOURS")
    counts = []
    prev = None
    for i, et in enumerate(FUNNEL_STAGES, start=1):
        cur = e.filter(F.col("event_type") == et).select("user_id", "ts")
        if prev is not None:
            cur = cur.join(prev, "user_id").filter(
                (F.col("ts") >= F.col("entry_ts"))
                & (F.col("ts") <= F.col("entry_ts") + gap)
            )
        cur = cur.groupBy("user_id").agg(F.min("ts").alias("entry_ts"))
        counts.append(
            cur.agg(F.count(F.lit(1)).alias("users")).select(
                F.lit(i).cast("int").alias("stage"),
                F.lit(et).alias("event_type"),
                F.col("users"),
            )
        )
        prev = cur
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    # persisted: the conversion self-join reads `out` twice — without
    # this, Catalyst re-plans the whole three-stage chain per side
    out = persist_if(out, gap_hours == FUNNEL_GAP_HOURS)
    prev_counts = out.select(
        (F.col("stage") + 1).alias("stage"), F.col("users").alias("prev_users")
    )
    return out.join(F.broadcast(prev_counts), "stage", "left").select(
        "stage",
        "event_type",
        "users",
        # try_divide: a stage can empty under a tight gap (0 users), and
        # with ANSI mode on a plain `/` would throw DIVIDE_BY_ZERO where
        # the DuckDB oracle yields NULL — both engines must agree on NULL
        F.when(F.col("prev_users").isNull(), F.lit(1.0))
        .otherwise(F.round(F.try_divide(F.col("users"), F.col("prev_users")), 6))
        .alias("conversion"),
    )


def funnel_within_oracle(gap_hours: int = FUNNEL_GAP_HOURS) -> str:
    return f"""
WITH s1 AS (
  SELECT user_id, min(ts) AS entry_ts FROM events WHERE event_type = 'signup' GROUP BY 1
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS entry_ts
  FROM events e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts >= s1.entry_ts
    AND e.ts <= s1.entry_ts + INTERVAL {gap_hours} HOUR
  GROUP BY 1
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS entry_ts
  FROM events e JOIN s2 ON s2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= s2.entry_ts
    AND e.ts <= s2.entry_ts + INTERVAL {gap_hours} HOUR
  GROUP BY 1
),
counts AS (
  SELECT CAST(1 AS INT) AS stage, 'signup' AS event_type, CAST(count(*) AS BIGINT) AS users FROM s1
  UNION ALL
  SELECT CAST(2 AS INT), 'click', CAST(count(*) AS BIGINT) FROM s2
  UNION ALL
  SELECT CAST(3 AS INT), 'purchase', CAST(count(*) AS BIGINT) FROM s3
)
SELECT c.stage, c.event_type, c.users,
       CASE WHEN p.users IS NULL THEN 1.0
            ELSE round(CAST(c.users AS DOUBLE) / nullif(p.users, 0), 6) END AS conversion
FROM counts c LEFT JOIN counts p ON p.stage = c.stage - 1
"""


def user_activity_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral diversity profile per user: Shannon entropy (nats)
    of the event-type distribution plus the dominant type's share —
    the bot/abuse screen for behavioral logs (a scripted account hits
    one endpoint in a loop: entropy ~0, top_share ~1; organic usage
    spreads). Emits (user_id, n_events, n_types, entropy, top_share).

    Two aggregations, both keyed on user_id ((user, type) counts fold
    into per-user rows on the SAME hash partitioning, so AQE plans one
    exchange lineage). The entropy sum is micro-unit-quantized per
    TERM before the integer per-user fold (functions/num.py
    discipline), so per-partition accumulation order can't move the
    6th decimal."""
    e = tables.load_table(spark, sf_dir, "events")
    per_type = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    totals = per_type.groupBy("user_id").agg(F.sum("c").alias("n_events"))
    p = F.col("c") / F.col("n_events")
    term_micro = F.round(-(p * F.log(p)) * 1e6, 0).cast("bigint")
    return (
        per_type.join(totals, "user_id")
        .groupBy("user_id", "n_events")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
            (F.sum(term_micro) / F.lit(1e6)).alias("entropy"),
            F.round(F.max("c") / F.col("n_events"), 6).alias("top_share"),
        )
        .select("user_id", "n_events", "n_types", "entropy", "top_share")
    )


def user_activity_entropy_oracle() -> str:
    return """
WITH per_type AS (
  SELECT user_id, event_type, count(*) AS c FROM events GROUP BY 1, 2
),
totals AS (
  SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events FROM per_type GROUP BY 1
)
SELECT t.user_id, t.n_events,
       CAST(count(*) AS BIGINT) AS n_types,
       sum(CAST(round(-(CAST(c AS DOUBLE) / t.n_events)
                      * ln(CAST(c AS DOUBLE) / t.n_events) * 1e6) AS BIGINT)) / 1e6 AS entropy,
       round(CAST(max(c) AS DOUBLE) / t.n_events, 6) AS top_share
FROM per_type p JOIN totals t USING (user_id)
GROUP BY t.user_id, t.n_events
"""


def user_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen day, and
    for each (cohort_day, day_offset) the count of distinct cohort
    members active that many days later. Emits (cohort_day STRING
    yyyy-MM-dd, day_offset INT, users).

    Two aggregations on user_id (first-seen, then activity) and one
    equi-join between them — the join is on the aggregation key, so
    both sides are already hash-partitioned on user_id and the
    retention rollup's (cohort, offset) key space is tiny. cohort_day
    is emitted as a formatted string: DATE columns round-trip
    differently through Arrow/pandas on the two engines and the driver
    compares rendered values."""
    e = tables.load_table(spark, sf_dir, "events")
    first = e.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    joined = e.select("user_id", "ts").join(first, "user_id")
    return (
        joined.select(
            "user_id",
            F.date_format(F.col("first_ts"), "yyyy-MM-dd").alias("cohort_day"),
            F.datediff(F.to_date("ts"), F.to_date("first_ts")).cast("int").alias("day_offset"),
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("user_id").alias("users"))
    )

def user_retention_oracle() -> str:
    return """
WITH f AS (SELECT user_id, min(ts) AS first_ts FROM events GROUP BY 1)
SELECT strftime(f.first_ts, '%Y-%m-%d') AS cohort_day,
       CAST(date_diff('day', CAST(f.first_ts AS DATE), CAST(e.ts AS DATE)) AS INT) AS day_offset,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS users
FROM events e JOIN f ON f.user_id = e.user_id
GROUP BY 1, 2
"""

# ---------------------------------------------------------------------------
# Sketch aggregates (approximate, mergeable — the 100 TB path)
# ---------------------------------------------------------------------------

def sketch_event_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate per-event_type profile: HyperLogLog++ distinct users
    and approx-percentile value medians. Both sketches are mergeable
    partial aggregates — constant memory per partition, one map-side
    combine + one small shuffle regardless of input size, which is why
    they (not the exact forms) are the 100 TB plan.

    DuckDB cannot reproduce Spark's sketch ESTIMATES (different
    algorithms), so the estimates are not emitted raw. Instead the
    query emits the exact values (computable by both engines at
    fixture scale) plus booleans asserting each in-plan estimate sits
    within the sketch's accuracy contract — the same bounds
    tests/test_properties.py enforces. The oracle expects TRUE, so a
    broken sketch path flips the driver row red: the sketches stay
    load-bearing while every emitted column is hash-matchable.

    The p50 contract asserts what Greenwald-Khanna actually
    guarantees — the estimate is a GENUINE element of the group whose
    RANK brackets the median (rank error <= n/accuracy) — not a
    value-distance bound: value distance is a property of the data's
    density, and a sparse-valued group (small n, wide gaps) can put
    the rank-correct element arbitrarily far from the interpolated
    exact median (surfaced by the generative edge corpus in
    tests/test_generative_oracle.py). Checking rank needs the
    estimate joined back over the events (a second narrow pass;
    `agg` is persisted so the broadcast probe side doesn't recompute
    the sketch aggregation)."""
    e = tables.load_table(spark, sf_dir, "events")
    # keep count_distinct OUT of the main aggregate: mixing a distinct
    # aggregate with the percentile/sketch aggregates makes Catalyst
    # rewrite the whole agg through an Expand (every input row
    # duplicated per distinct group) — measured 8x slower. A separate
    # distinct-pairs aggregation is two narrow hash aggs, then a
    # 5-row join back.
    agg = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("au"),
        F.approx_percentile("value", F.lit(0.5), F.lit(10_000)).alias("ap50"),
    )
    nu = (
        e.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    agg = persist_if(agg.join(nu, "event_type"), True)
    rk = (
        e.select("event_type", "value")
        .join(F.broadcast(agg.select("event_type", "ap50")), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum((F.col("value") < F.col("ap50")).cast("long")).alias("n_lt"),
            F.sum((F.col("value") <= F.col("ap50")).cast("long")).alias("n_le"),
            F.sum((F.col("value") == F.col("ap50")).cast("long")).alias("n_eq"),
        )
    )
    # GK rank-error allowance: <= n/accuracy ranks, +1 for the
    # engine's target-rank rounding convention
    eps = F.ceil(F.col("n") / F.lit(10_000.0)) + F.lit(1)
    return agg.join(rk, "event_type").select(
        "event_type",
        "n",
        "n_users",
        "p50",
        (
            F.abs(F.col("au") - F.col("n_users"))
            <= F.greatest(F.lit(1.0), 0.05 * F.col("n_users"))
        ).alias("users_est_in_bounds"),
        (
            (F.col("n_eq") >= 1)
            & (F.col("n_lt") <= F.ceil(F.col("n") * 0.5) + eps)
            & (F.col("n_le") >= F.floor(F.col("n") * 0.5) - eps)
        ).alias("p50_est_in_bounds"),
    )

def sketch_event_profile_oracle() -> str:
    return """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       round(quantile_cont(value, 0.5), 6) AS p50,
       TRUE AS users_est_in_bounds,
       TRUE AS p50_est_in_bounds
FROM events GROUP BY event_type
"""

def asof_next_action(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: for every `click`, the same user's FIRST
    `purchase` at-or-after the click (time-to-conversion). The mirror
    of `asof_attribution` — same single-shuffle windowed shape, with
    the carried value computed over the reversed frame
    (currentRow..unboundedFollowing, `first` ignoring nulls) instead of
    a backward `last`. Clicks that never convert keep NULLs.

    Equal-timestamp semantics are pinned: ordering by (ts, event_type,
    event_id) sorts a same-ts purchase AFTER the click, so at-or-after
    includes it, and among same-ts purchases the FIRST by event_id
    wins — mirrored in the oracle's ORDER BY ... LIMIT 1 lateral.
    Emits (click_id, user_id, click_ts, purchase_id, purchase_ts,
    conversion_sec)."""
    e = tables.load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_type", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    is_purchase = F.col("event_type") == "purchase"
    carried = e.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.first(F.when(is_purchase, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("purchase_id"),
        F.first(F.when(is_purchase, F.col("ts")), ignorenulls=True).over(w).alias("purchase_ts"),
    )
    return carried.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
        "purchase_id",
        "purchase_ts",
        F.round(
            (epoch_us("purchase_ts") - epoch_us("ts")) / F.lit(1_000_000.0), 6
        ).alias("conversion_sec"),
    )

def asof_next_action_oracle() -> str:
    return """
WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
       m.event_id AS purchase_id, m.ts AS purchase_ts,
       round((epoch_us(m.ts) - epoch_us(c.ts)) / 1000000.0, 6) AS conversion_sec
FROM c LEFT JOIN LATERAL (
  SELECT p.event_id, p.ts FROM p
  WHERE p.user_id = c.user_id AND p.ts >= c.ts
  ORDER BY p.ts ASC, p.event_id ASC LIMIT 1
) m ON true
"""

ANOMALY_Z = 2.0

def event_anomalies(spark: SparkSession, sf_dir: str, z_thresh: float = ANOMALY_Z) -> DataFrame:
    """Volume-anomaly detection: hourly event counts per type, z-scored
    against that type's own distribution, flagged when |z| exceeds the
    threshold — the monitoring query an ingestion pipeline alerts on.

    The z-score window runs over the ALREADY-AGGREGATED (type, hour)
    table (|types| × |hours| rows — thousands, not billions), so the
    only corpus-sized work is the first map-side-combined count; the
    population stats per type are a tiny second aggregation broadcast
    back. Emits (event_type, hour_start, n, z, is_anomaly)."""
    e = tables.load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(F.date_trunc("hour", "ts").alias("hour_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # mu/sigma from exact integer moments (sum n, sum n^2 are BIGINT —
    # order-independent), then one IEEE-deterministic formula mirrored
    # verbatim in the oracle. stddev_samp's streaming accumulation is
    # engine- and partition-order-dependent at the last ulp, which
    # flips round(z, 6) near 6th-decimal midpoints.
    stats = (
        hourly.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum("n").alias("s1"),
            F.sum(F.col("n") * F.col("n")).alias("s2"),
        )
        .select(
            "event_type",
            (F.col("s1").cast("double") / F.col("c").cast("double")).alias("mu"),
            F.when(
                F.col("c") > 1,
                F.sqrt(
                    F.greatest(
                        (
                            F.col("s2").cast("double")
                            - F.col("s1").cast("double")
                            * F.col("s1").cast("double")
                            / F.col("c").cast("double")
                        )
                        / (F.col("c").cast("double") - 1.0),
                        F.lit(0.0),
                    )
                ),
            ).alias("sigma"),
        )
    )
    z = F.when(
        F.col("sigma") > 0, (F.col("n") - F.col("mu")) / F.col("sigma")
    ).otherwise(F.lit(0.0))
    return (
        hourly.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "hour_start",
            "n",
            F.round(z, 6).alias("z"),
            (F.abs(z) > z_thresh).alias("is_anomaly"),
        )
    )

def event_anomalies_oracle(z_thresh: float = ANOMALY_Z) -> str:
    return f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour_start, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
),
moments AS (
  SELECT event_type, count(*) AS c,
         sum(n) AS s1, sum(n * n) AS s2
  FROM hourly GROUP BY 1
),
stats AS (
  SELECT event_type,
         CAST(s1 AS DOUBLE) / CAST(c AS DOUBLE) AS mu,
         CASE WHEN c > 1 THEN sqrt(greatest(
                (CAST(s2 AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(c AS DOUBLE))
                / (CAST(c AS DOUBLE) - 1.0), 0.0))
         END AS sigma
  FROM moments
)
SELECT h.event_type, h.hour_start, CAST(h.n AS BIGINT) AS n,
       round(CASE WHEN s.sigma > 0 THEN (h.n - s.mu) / s.sigma ELSE 0.0 END, 6) AS z,
       (abs(CASE WHEN s.sigma > 0 THEN (h.n - s.mu) / s.sigma ELSE 0.0 END) > {z_thresh}) AS is_anomaly
FROM hourly h JOIN stats s USING (event_type)
"""

HIST_BINS = 10
HIST_LO = 0.0
HIST_HI = 100.0

def event_value_histogram(
    spark: SparkSession, sf_dir: str, bins: int = HIST_BINS, lo: float = HIST_LO, hi: float = HIST_HI
) -> DataFrame:
    """Fixed-bin value histogram per event_type (width_bucket
    semantics: bin 0 = underflow, bins+1 = overflow) — the
    distribution profile that feeds dashboards without shipping raw
    values. One map-side-combined aggregation; the shuffle carries
    |types| × (bins+2) rows regardless of input size. Emits
    (event_type, bin, lo_edge, n)."""
    e = tables.load_table(spark, sf_dir, "events")
    width = (hi - lo) / bins
    bin_expr = (
        F.when(F.col("value") < lo, 0)
        .when(F.col("value") >= hi, bins + 1)
        .otherwise(F.floor((F.col("value") - lo) / width) + 1)
        .cast("int")
    )
    return (
        e.select("event_type", bin_expr.alias("bin"))
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "event_type",
            "bin",
            F.round(F.lit(lo) + (F.col("bin") - 1) * width, 6).alias("lo_edge"),
            "n",
        )
    )

def event_value_histogram_oracle(
    bins: int = HIST_BINS, lo: float = HIST_LO, hi: float = HIST_HI
) -> str:
    width = (hi - lo) / bins
    return f"""
WITH binned AS (
  SELECT event_type,
         CAST(CASE WHEN value < {lo} THEN 0
                   WHEN value >= {hi} THEN {bins + 1}
                   ELSE floor((value - {lo}) / {width}) + 1 END AS INT) AS bin
  FROM events
)
SELECT event_type, bin,
       round({lo} + (bin - 1) * {width}, 6) AS lo_edge,
       CAST(count(*) AS BIGINT) AS n
FROM binned GROUP BY 1, 2
"""

def hll_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-user sketches: one Apache DataSketches HLL
    per (day, event_type), and — via hll_union_agg over the STORED
    sketches, not the raw events — the all-types daily estimate. This
    is the 100 TB cardinality pattern: sketches are built once per
    partition of the fact table (map-side, constant memory), persisted
    bytes are unioned for any coarser rollup without re-scanning
    events, and accuracy is a fixed lgConfigK budget.

    DuckDB cannot reproduce DataSketches estimates, so the estimates
    are emitted as accuracy-contract BOOLEANS against exact distinct
    counts (the bounds tests/test_quality_layout.py enforces; exact
    twins are adjudication scaffolding, fine at fixture scale). The
    oracle expects TRUE — a broken sketch or union path flips the
    driver row red, so the HLL path stays load-bearing while every
    emitted column is hash-matchable. Emits (day STRING, event_type,
    n_users, day_total_users, est_in_bounds, day_est_in_bounds)."""
    e = tables.load_table(spark, sf_dir, "events")
    day = F.date_format("ts", "yyyy-MM-dd").alias("day")
    # sketches in one clean hash agg (no distinct mixing — that would
    # Expand-rewrite the full events scan); exact twins from ONE
    # distinct-triples pass reused for both grains
    cells = e.groupBy(day, "event_type").agg(F.hll_sketch_agg("user_id").alias("sk"))
    day_totals = cells.groupBy("day").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("day_est")
    )
    du = e.select(day, "event_type", "user_id").distinct()
    cell_exact = du.groupBy("day", "event_type").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    day_exact = (
        du.select("day", "user_id")
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("day_total_users"))
    )
    return (
        cells.select(
            "day",
            "event_type",
            F.hll_sketch_estimate("sk").alias("est"),
        )
        .join(cell_exact, ["day", "event_type"])
        .join(day_totals, "day")
        .join(day_exact, "day")
        .select(
            "day",
            "event_type",
            "n_users",
            "day_total_users",
            (
                F.abs(F.col("est") - F.col("n_users"))
                <= F.greatest(F.lit(3.0), 0.05 * F.col("n_users"))
            ).alias("est_in_bounds"),
            (
                F.abs(F.col("day_est") - F.col("day_total_users"))
                <= F.greatest(F.lit(3.0), 0.05 * F.col("day_total_users"))
            ).alias("day_est_in_bounds"),
        )
    )

def hll_daily_users_oracle() -> str:
    return """
WITH cells AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
         count(DISTINCT user_id) AS n_users
  FROM events GROUP BY 1, 2
),
days AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day,
         count(DISTINCT user_id) AS day_total_users
  FROM events GROUP BY 1
)
SELECT c.day, c.event_type, CAST(c.n_users AS BIGINT) AS n_users,
       CAST(d.day_total_users AS BIGINT) AS day_total_users,
       TRUE AS est_in_bounds, TRUE AS day_est_in_bounds
FROM cells c JOIN days d USING (day)
"""

def retention_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort-normalized retention curve: for each day offset, the
    fraction of each cohort still active — the headline number the
    retention triangle (`user_retention`) feeds. A rollup of the
    already-tiny triangle (cohorts × offsets rows), normalized by each
    cohort's day-0 size. Emits (cohort_day, day_offset, users,
    cohort_size, retention)."""
    tri = user_retention(spark, sf_dir)
    day0 = tri.filter(F.col("day_offset") == 0).select(
        "cohort_day", F.col("users").alias("cohort_size")
    )
    return (
        tri.join(day0, "cohort_day")
        .select(
            "cohort_day",
            "day_offset",
            "users",
            "cohort_size",
            F.round(F.col("users") / F.col("cohort_size"), 6).alias("retention"),
        )
    )

def retention_curve_oracle() -> str:
    return f"""
WITH tri AS ({user_retention_oracle()}),
day0 AS (SELECT cohort_day, users AS cohort_size FROM tri WHERE day_offset = 0)
SELECT t.cohort_day, t.day_offset, t.users, d.cohort_size,
       round(CAST(t.users AS DOUBLE) / d.cohort_size, 6) AS retention
FROM tri t JOIN day0 d USING (cohort_day)
"""

# ---------------------------------------------------------------------------
# Rate-limit admission (per-user windowed cap)
# ---------------------------------------------------------------------------

RATE_LIMIT_N = 5
RATE_WINDOW_MIN = 10

def rate_limited_events(
    spark: SparkSession,
    sf_dir: str,
    limit: int = RATE_LIMIT_N,
    window_min: int = RATE_WINDOW_MIN,
) -> DataFrame:
    """Deterministic rate-limit admission over the event stream: within
    each (user, tumbling window) the first `limit` events by
    (ts, event_id) are admitted, the rest are marked throttled — the
    ingestion-guard every shared pipeline endpoint needs (abusive
    producers otherwise skew every downstream per-user aggregate).

    Sequential token buckets don't parallelize; a windowed rank DOES
    and gives the same admission set for a fixed window grid: the rank
    window partitions on (user_id, window_start) — narrow keys whose
    cardinality grows with users x time, so no single reducer hotspot
    at 100 TB (one celebrity user in one window is the only funnel, and
    its size is bounded by that user's single-window event count). The
    streaming twin of this shape is a keyed counter in
    applyInPandasWithState. Emits (event_id, user_id, ts, win_start,
    seq_in_win, admitted)."""
    e = tables.load_table(spark, sf_dir, "events")
    win_us = window_min * 60 * 1_000_000
    win_start = (F.floor(epoch_us("ts") / win_us) * win_us).cast("bigint")
    keyed = e.select("event_id", "user_id", "ts", win_start.alias("win_start"))
    w = Window.partitionBy("user_id", "win_start").orderBy("ts", "event_id")
    return keyed.select(
        "event_id",
        "user_id",
        "ts",
        "win_start",
        F.row_number().over(w).cast("int").alias("seq_in_win"),
    ).withColumn("admitted", F.col("seq_in_win") <= limit)

def rate_limited_events_oracle(
    limit: int = RATE_LIMIT_N, window_min: int = RATE_WINDOW_MIN
) -> str:
    win_us = window_min * 60 * 1_000_000
    return f"""
WITH keyed AS (
  SELECT event_id, user_id, ts,
         CAST(floor(epoch_us(ts) / {win_us}) * {win_us} AS BIGINT) AS win_start
  FROM events
)
SELECT event_id, user_id, ts, win_start,
       CAST(row_number() OVER (PARTITION BY user_id, win_start
                               ORDER BY ts, event_id) AS INT) AS seq_in_win,
       row_number() OVER (PARTITION BY user_id, win_start
                          ORDER BY ts, event_id) <= {limit} AS admitted
FROM keyed
"""

# ---------------------------------------------------------------------------
# SCD2 state history (change-data-capture intervals)
# ---------------------------------------------------------------------------

def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) history of each user's
    event-type state: consecutive same-type events collapse into one
    validity interval [valid_from, valid_to), the latest state is
    open-ended (NULL valid_to), and `version` numbers each user's
    states in order — the temporal table a lakehouse keeps next to a
    mutable dimension so point-in-time joins stay possible after
    updates (Kimball SCD2; Delta/Hudi/Iceberg merge pipelines build
    exactly this shape).

    Two narrow windows per user (lag to detect change, lead over the
    collapsed rows to close intervals) — both partition on user_id and
    carry only (ts, event_type): no self-join, no corpus-wide state.
    Emits (user_id, state, valid_from, valid_to, version)."""
    e = tables.load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", F.col("event_type").alias("state")
    )
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = e.withColumn("prev_state", F.lag("state").over(wo)).filter(
        F.col("prev_state").isNull() | (F.col("prev_state") != F.col("state"))
    )
    wc = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        "state",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(wc).alias("valid_to"),
        F.row_number().over(wc).cast("int").alias("version"),
    )

def scd2_user_state_oracle() -> str:
    return """
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type AS state,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_state
  FROM events
),
changes AS (
  SELECT user_id, state, ts, event_id FROM ordered
  WHERE prev_state IS NULL OR prev_state <> state
)
SELECT user_id, state, ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS version
FROM changes
"""

# ---------------------------------------------------------------------------
# Winsorized value statistics (outlier-robust metric prep)
# ---------------------------------------------------------------------------

WINSOR_LO = 0.05
WINSOR_HI = 0.95

def winsorized_event_stats(
    spark: SparkSession, sf_dir: str, lo: float = WINSOR_LO, hi: float = WINSOR_HI
) -> DataFrame:
    """Per-event-type value statistics with and without winsorization
    (clipping at the [lo, hi] quantiles) — the outlier-robust metric
    prep that keeps one whale purchase from moving a mean-based
    dashboard or reward signal.

    The clip thresholds are the EXACT per-group percentiles rounded to
    6 dp (the rounding is part of the operator contract so engine and
    oracle clip at the identical boundary; exact percentile needs the
    group's sorted values — at 100 TB substitute approx_percentile and
    keep the same contract). Two aggregations: one tiny percentile
    table per event_type (broadcast back), one clip-and-count pass.
    Emits (event_type, n, p_lo, p_hi, n_clipped_lo, n_clipped_hi,
    mean_raw, mean_winsorized)."""
    e = tables.load_table(spark, sf_dir, "events")
    pct = e.groupBy("event_type").agg(
        F.round(F.expr(f"percentile(value, {lo})"), 6).alias("p_lo"),
        F.round(F.expr(f"percentile(value, {hi})"), 6).alias("p_hi"),
    )
    j = e.select("event_type", "value").join(F.broadcast(pct), "event_type")
    clipped = F.least(F.greatest(F.col("value"), F.col("p_lo")), F.col("p_hi"))
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("p_lo").alias("p_lo"),
        F.min("p_hi").alias("p_hi"),
        F.sum((F.col("value") < F.col("p_lo")).cast("long")).alias("n_clipped_lo"),
        F.sum((F.col("value") > F.col("p_hi")).cast("long")).alias("n_clipped_hi"),
        qmean6(F.col("value")).alias("mean_raw"),
        qmean6(clipped).alias("mean_winsorized"),
    )

def winsorized_event_stats_oracle(lo: float = WINSOR_LO, hi: float = WINSOR_HI) -> str:
    return f"""
WITH pct AS (
  SELECT event_type,
         round(quantile_cont(value, {lo}), 6) AS p_lo,
         round(quantile_cont(value, {hi}), 6) AS p_hi
  FROM events GROUP BY event_type
),
j AS (
  SELECT e.event_type, e.value, p.p_lo, p.p_hi,
         least(greatest(e.value, p.p_lo), p.p_hi) AS clipped
  FROM events e JOIN pct p USING (event_type)
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       min(p_lo) AS p_lo, min(p_hi) AS p_hi,
       CAST(sum(CASE WHEN value < p_lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_lo,
       CAST(sum(CASE WHEN value > p_hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_hi,
       CAST(round(sum(CAST(round((value) * 1e6) AS BIGINT)) / count(value)) AS BIGINT) / 1e6 AS mean_raw,
       CAST(round(sum(CAST(round((clipped) * 1e6) AS BIGINT)) / count(clipped)) AS BIGINT) / 1e6 AS mean_winsorized
FROM j GROUP BY event_type
"""

APPROX_PCT_ACCURACY = 100


def event_value_quantiles_approx(
    spark: SparkSession, sf_dir: str, accuracy: int = APPROX_PCT_ACCURACY
) -> DataFrame:
    """The 100 TB twin of `event_value_quantiles`: Greenwald-Khanna
    approx_percentile (mergeable per-partition summaries, constant
    memory, rank error <= n/accuracy) instead of exact percentile
    (which buffers each group's values). DuckDB cannot reproduce GK
    merge results, so — the `hll_daily_users` contract pattern — the
    hash-matched columns are the EXACT quantiles and the approx path
    is emitted as accuracy-contract booleans.

    The booleans assert GK's ACTUAL guarantee — each estimate is a
    genuine element whose rank sits within n/accuracy (+1 for the
    target-rank rounding convention) of the requested quantile's rank
    — not a value-distance bound: a value-relative tolerance is a
    property of the data's density, and a sparse-valued group can put
    the rank-correct element arbitrarily far from the interpolated
    exact quantile (the flaw the generative edge corpus surfaced in
    the sibling `sketch_event_profile`). Rank checking joins the
    estimates back over the events (one extra narrow pass; the
    aggregate is persisted so the broadcast probe side doesn't rerun
    the sketch). Emits (event_type, n, p25, p50, p75, approx_p25_ok,
    approx_p50_ok, approx_p75_ok)."""
    e = tables.load_table(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.percentile("value", F.lit(0.25)), 6).alias("p25"),
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.75)), 6).alias("p75"),
        F.expr(
            f"approx_percentile(value, array(0.25, 0.5, 0.75), {accuracy})"
        ).alias("ap"),
    )
    agg = persist_if(agg, accuracy == APPROX_PCT_ACCURACY)
    rank_aggs = []
    for i in range(3):
        rank_aggs += [
            F.sum((F.col("value") < F.col("ap")[i]).cast("long")).alias(f"lt{i}"),
            F.sum((F.col("value") <= F.col("ap")[i]).cast("long")).alias(f"le{i}"),
            F.sum((F.col("value") == F.col("ap")[i]).cast("long")).alias(f"eq{i}"),
        ]
    rk = (
        e.select("event_type", "value")
        .join(F.broadcast(agg.select("event_type", "ap")), "event_type")
        .groupBy("event_type")
        .agg(*rank_aggs)
    )
    eps = F.ceil(F.col("n") / F.lit(float(accuracy))) + F.lit(1)

    def rank_ok(i: int, q: float):
        return (
            (F.col(f"eq{i}") >= 1)
            & (F.col(f"lt{i}") <= F.ceil(F.col("n") * q) + eps)
            & (F.col(f"le{i}") >= F.floor(F.col("n") * q) - eps)
        )

    return agg.join(rk, "event_type").select(
        "event_type",
        "n",
        "p25",
        "p50",
        "p75",
        rank_ok(0, 0.25).alias("approx_p25_ok"),
        rank_ok(1, 0.5).alias("approx_p50_ok"),
        rank_ok(2, 0.75).alias("approx_p75_ok"),
    )


def event_value_quantiles_approx_oracle(accuracy: int = APPROX_PCT_ACCURACY) -> str:
    return """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       round(quantile_cont(value, 0.25), 6) AS p25,
       round(quantile_cont(value, 0.50), 6) AS p50,
       round(quantile_cont(value, 0.75), 6) AS p75,
       TRUE AS approx_p25_ok, TRUE AS approx_p50_ok, TRUE AS approx_p75_ok
FROM events GROUP BY event_type
"""


def winsorized_event_stats_approx(
    spark: SparkSession,
    sf_dir: str,
    lo: float = WINSOR_LO,
    hi: float = WINSOR_HI,
    accuracy: int = APPROX_PCT_ACCURACY,
) -> DataFrame:
    """The 100 TB twin of `winsorized_event_stats`: clip thresholds
    from approx_percentile (the substitution that operator's docstring
    promises at scale), validated against the exact twin in the same
    plan. Hash-matched columns are the exact winsorized stats; the
    approx path contributes contract booleans that are THEOREMS, not
    tuned tolerances (the lesson from the generative edge corpus):

    * approx_thresholds_ok — each GK threshold is a genuine element of
      the group whose RANK sits within n/accuracy (+1 rounding) of the
      requested tail quantile's rank; the rank counts ride the clip
      join that already probes every event against the per-type
      thresholds, so the contract adds no extra pass.
    * approx_mean_ok — winsorization is 1-Lipschitz in each threshold
      (shifting a clip bound by d moves every affected row by at most
      d), so |approx mean - exact mean| <= |a_lo - p_lo| +
      |a_hi - p_hi| (+2e-6 for the two 6-dp roundings).

    Emits (event_type, n, p_lo, p_hi, mean_winsorized,
    approx_thresholds_ok, approx_mean_ok)."""
    e = tables.load_table(spark, sf_dir, "events")
    pct = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.percentile("value", F.lit(lo)), 6).alias("p_lo"),
        F.round(F.percentile("value", F.lit(hi)), 6).alias("p_hi"),
        F.expr(f"approx_percentile(value, array({lo}, {hi}), {accuracy})").alias("ap"),
    )
    j = e.select("event_type", "value").join(F.broadcast(pct), "event_type")
    clip_exact = F.least(F.greatest(F.col("value"), F.col("p_lo")), F.col("p_hi"))
    clip_approx = F.least(F.greatest(F.col("value"), F.col("ap")[0]), F.col("ap")[1])
    rank_aggs = []
    for i, tag in ((0, "lo"), (1, "hi")):
        rank_aggs += [
            F.sum((F.col("value") < F.col("ap")[i]).cast("long")).alias(f"lt_{tag}"),
            F.sum((F.col("value") <= F.col("ap")[i]).cast("long")).alias(f"le_{tag}"),
            F.sum((F.col("value") == F.col("ap")[i]).cast("long")).alias(f"eq_{tag}"),
        ]
    agg = j.groupBy("event_type").agg(
        F.min("n").alias("n"),
        F.min("p_lo").alias("p_lo"),
        F.min("p_hi").alias("p_hi"),
        F.min(F.col("ap")[0]).alias("a_lo"),
        F.min(F.col("ap")[1]).alias("a_hi"),
        qmean6(clip_exact).alias("mean_winsorized"),
        qmean6(clip_approx).alias("mean_w_approx"),
        *rank_aggs,
    )
    eps = F.ceil(F.col("n") / F.lit(float(accuracy))) + F.lit(1)

    def rank_ok(tag: str, q: float):
        return (
            (F.col(f"eq_{tag}") >= 1)
            & (F.col(f"lt_{tag}") <= F.ceil(F.col("n") * q) + eps)
            & (F.col(f"le_{tag}") >= F.floor(F.col("n") * q) - eps)
        )

    mean_tol = (
        F.abs(F.col("a_lo") - F.col("p_lo"))
        + F.abs(F.col("a_hi") - F.col("p_hi"))
        + F.lit(2e-6)
    )
    return agg.select(
        "event_type",
        "n",
        "p_lo",
        "p_hi",
        "mean_winsorized",
        (rank_ok("lo", lo) & rank_ok("hi", hi)).alias("approx_thresholds_ok"),
        (F.abs(F.col("mean_w_approx") - F.col("mean_winsorized")) <= mean_tol).alias(
            "approx_mean_ok"
        ),
    )


def winsorized_event_stats_approx_oracle(
    lo: float = WINSOR_LO, hi: float = WINSOR_HI, accuracy: int = APPROX_PCT_ACCURACY
) -> str:
    return f"""
WITH pct AS (
  SELECT event_type,
         round(quantile_cont(value, {lo}), 6) AS p_lo,
         round(quantile_cont(value, {hi}), 6) AS p_hi
  FROM events GROUP BY event_type
),
j AS (
  SELECT e.event_type, p.p_lo, p.p_hi,
         least(greatest(e.value, p.p_lo), p.p_hi) AS clipped
  FROM events e JOIN pct p USING (event_type)
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       min(p_lo) AS p_lo, min(p_hi) AS p_hi,
       CAST(round(sum(CAST(round((clipped) * 1e6) AS BIGINT)) / count(clipped)) AS BIGINT) / 1e6
         AS mean_winsorized,
       TRUE AS approx_thresholds_ok, TRUE AS approx_mean_ok
FROM j GROUP BY event_type
"""


def point_in_time_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment against the SCD2 table: for every
    `purchase` event, the user's state interval valid AT the purchase
    timestamp — the feature-store join that makes a type-2 history
    usable (training-serving skew dies exactly here: features must be
    as-of the label event, never leakage from later state).

    Join shape: equi-key on user_id with the validity-range predicate
    on top — Spark executes the equi part as a hash join and applies
    the range residual post-probe, so there is no cross product; each
    event matches EXACTLY one interval by construction (intervals
    partition each user's timeline: valid_from <= ts < valid_to, the
    final open interval catching the tail; ties at a boundary belong
    to the interval that starts there). At 100 TB both sides hash-
    partition on user_id — co-located, no skew beyond the per-user
    event count. Emits (event_id, user_id, ts, state, state_since,
    version)."""
    e = tables.load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select("event_id", "user_id", "ts")
    s = scd2_user_state(spark, sf_dir)
    cond = (
        (e["user_id"] == s["user_id"])
        & (e["ts"] >= s["valid_from"])
        & (s["valid_to"].isNull() | (e["ts"] < s["valid_to"]))
    )
    return e.join(s, cond).select(
        e["event_id"],
        e["user_id"],
        e["ts"],
        s["state"],
        s["valid_from"].alias("state_since"),
        s["version"],
    )

def point_in_time_state_oracle() -> str:
    return f"""
WITH scd AS ({scd2_user_state_oracle()}),
p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
SELECT p.event_id, p.user_id, p.ts, s.state, s.valid_from AS state_since, s.version
FROM p JOIN scd s
  ON s.user_id = p.user_id
 AND p.ts >= s.valid_from
 AND (s.valid_to IS NULL OR p.ts < s.valid_to)
"""

# ---------------------------------------------------------------------------
# Min/max time-series downsampling (dashboard rendering)
# ---------------------------------------------------------------------------

DOWNSAMPLE_BUCKET_MIN = 60

def event_minmax_downsample(
    spark: SparkSession, sf_dir: str, bucket_min: int = DOWNSAMPLE_BUCKET_MIN
) -> DataFrame:
    """Min/max downsampling of the event value series per type: one
    (min-value, max-value) witness point per time bucket — the standard
    lossy reduction a dashboard applies before rendering (min/max
    preserves every visual extreme exactly, unlike averaging, which is
    why monitoring systems store it alongside the mean).

    No window function at all: each extreme is a lexicographic
    min/max over a (value, ts, event_id) struct inside a plain
    (type, bucket) hash aggregation — map-side combined, shuffle
    cardinality = types x buckets regardless of event volume, and the
    struct tie-break makes the witness deterministic. Emits
    (event_type, bucket_start, n, min_value, min_ts, max_value,
    max_ts)."""
    e = tables.load_table(spark, sf_dir, "events")
    bucket_us = bucket_min * 60 * 1_000_000
    b = (F.floor(epoch_us("ts") / bucket_us) * bucket_us).cast("bigint")
    keyed = e.select(
        "event_type",
        b.alias("bucket_start"),
        F.struct(F.col("value"), F.col("ts"), F.col("event_id")).alias("s"),
    )
    agg = keyed.groupBy("event_type", "bucket_start").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("s").alias("lo"),
        F.max("s").alias("hi"),
    )
    return agg.select(
        "event_type",
        "bucket_start",
        "n",
        F.round(F.col("lo.value"), 6).alias("min_value"),
        F.col("lo.ts").alias("min_ts"),
        F.round(F.col("hi.value"), 6).alias("max_value"),
        F.col("hi.ts").alias("max_ts"),
    )

def event_minmax_downsample_oracle(bucket_min: int = DOWNSAMPLE_BUCKET_MIN) -> str:
    bucket_us = bucket_min * 60 * 1_000_000
    return f"""
WITH keyed AS (
  SELECT event_type,
         CAST(floor(epoch_us(ts) / {bucket_us}) * {bucket_us} AS BIGINT) AS bucket_start,
         struct_pack(value := value, ts := ts, event_id := event_id) AS s
  FROM events
)
SELECT event_type, bucket_start, CAST(count(*) AS BIGINT) AS n,
       round(min(s).value, 6) AS min_value, min(s).ts AS min_ts,
       round(max(s).value, 6) AS max_value, max(s).ts AS max_ts
FROM keyed GROUP BY event_type, bucket_start
"""
