"""Structured Streaming over the events table.

The reference has no streaming (SURVEY.md §2.8) — its nearest analog is
resumable incremental batch. This module adds the native Spark
streaming surface a large-scale pipeline needs: event-time tumbling
windows with watermarked late-data handling, and gap-based
sessionization (the custom stateful operator pattern).

Each streaming query has a BATCH twin with identical semantics; the
batch twin is DuckDB-oracle-checked, and tests assert stream (
Trigger.AvailableNow over the same parquet) == batch. That is the
correctness story for the streaming path without a live source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.num import qsum6
from ..functions.timeutil import epoch_us
from ..sources import tables

SESSION_GAP_MIN = 30

def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the fixture directory (the file source
    needs a directory; the glob narrows it to the events table).

    Unlike the batch loader (which normalizes ts to TIMESTAMP_NTZ),
    the stream carries ts as TIMESTAMP (LTZ): Spark's event-time
    watermark is only defined on LTZ. The NTZ->LTZ cast reads the
    session timezone; streaming runs only under the repo session
    (session.py pins UTC), so the wall-clock is preserved and the
    `_ntz` helper below restores the batch twins' NTZ rendering on
    output timestamps for comparison."""
    batch = tables.load_table(spark, sf_dir, "events")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    assert [f.name for f in stream.schema] == [f.name for f in batch.schema]
    return stream

def _ntz(col) -> F.Column:
    """Render a streaming LTZ timestamp back as TIMESTAMP_NTZ so the
    streaming twins' output schema matches the batch twins (UTC session
    makes the cast wall-clock-preserving)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp_ntz")

# ---------------------------------------------------------------------------
# Tumbling-window aggregation
# ---------------------------------------------------------------------------

def windowed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin: 1-hour tumbling windows per event_type — counts and
    value sums. Map-side partial agg + one shuffle on (window, type)."""
    e = tables.load_table(spark, sf_dir, "events")
    w = F.window("ts", "1 hour")
    return (
        e.groupBy(w.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), qsum6("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )

def windowed_event_counts_oracle() -> str:
    return """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       CAST(count(*) AS BIGINT) AS n, round(sum(CAST(round((value) * 1e6) AS BIGINT)) / 1e6, 6) AS sum_value
FROM events GROUP BY 1, 2
"""

def stream_windowed_event_counts(
    spark: SparkSession, sf_dir: str, raw: DataFrame | None = None
) -> DataFrame:
    """Streaming twin: file-source readStream over the same parquet,
    1-hour watermark for late data, same windowed agg. Run with
    Trigger.AvailableNow into a sink; complete-mode output equals the
    batch twin on a static directory. `raw` overrides the source (the
    late-data tests feed a multi-microbatch out-of-order stream through
    it to pin the watermark-drop semantics)."""
    raw = _events_stream(spark, sf_dir) if raw is None else raw
    return (
        raw.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), qsum6("value").alias("sum_value"))
        .select(_ntz("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )

def run_stream_to_memory(stream_df: DataFrame, name: str, output_mode: str = "complete"):
    """Drain an AvailableNow stream into an in-memory table and return
    the query handle (caller awaits termination and reads the table)."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )

# ---------------------------------------------------------------------------
# Sliding-window aggregation
# ---------------------------------------------------------------------------

SLIDE_WINDOW = "15 minutes"
SLIDE_STEP = "5 minutes"

def sliding_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin: 15-minute windows sliding every 5 minutes per
    event_type — the overlapping-window shape (rate monitoring, rolling
    trend detection) that tumbling windows can't express. Spark's
    window() fans each event into window/slide = 3 rows scan-side, then
    it's the same single (window, type) shuffle as the tumbling twin —
    the fan-out factor is a plan constant, not data-dependent."""
    e = tables.load_table(spark, sf_dir, "events")
    w = F.window("ts", SLIDE_WINDOW, SLIDE_STEP)
    return (
        e.groupBy(w.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), qsum6("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )

def sliding_event_counts_oracle() -> str:
    # each event belongs to exactly 3 slide-aligned windows:
    # floor_5m(ts) - i*5min for i in 0..2 (epoch-aligned, matching
    # Spark's window() bucketing)
    return """
SELECT time_bucket(INTERVAL '5 minutes', ts) - (g.i * INTERVAL '5 minutes') AS window_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(CAST(round((value) * 1e6) AS BIGINT)) / 1e6, 6) AS sum_value
FROM events CROSS JOIN generate_series(0, 2) AS g(i)
GROUP BY 1, 2
"""

def stream_sliding_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin: same sliding windows over the file stream with a
    1-hour watermark; complete-mode output on a static directory equals
    the batch twin."""
    raw = _events_stream(spark, sf_dir)
    return (
        raw.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", SLIDE_WINDOW, SLIDE_STEP).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), qsum6("value").alias("sum_value"))
        .select(_ntz("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )

# ---------------------------------------------------------------------------
# Sessionization (gap-based)
# ---------------------------------------------------------------------------

def sessionize(spark: SparkSession, sf_dir: str, gap_min: int = SESSION_GAP_MIN) -> DataFrame:
    """Batch sessionization: a new session starts when the gap from the
    previous event of the same user exceeds `gap_min`. Classic
    lag + running-sum over a per-user window; one shuffle on user_id.
    Emits per-session rollups."""
    e = tables.load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond arithmetic, and >= so a gap of exactly gap_min starts a
    # new session — matching session_window's exclusive [start, last+gap)
    gap = epoch_us("ts") - F.lag(epoch_us("ts")).over(w)
    new_sess = F.when(gap.isNull() | (gap >= gap_min * 60 * 1_000_000), 1).otherwise(0)
    sess = e.withColumn("sess_seq", F.sum(new_sess).over(w))
    return sess.groupBy("user_id", "sess_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        qsum6("value").alias("sum_value"),
    )

def sessionize_oracle(gap_min: int = SESSION_GAP_MIN) -> str:
    return f"""
WITH g AS (
  SELECT *, CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= {gap_min * 60 * 1_000_000}
                 THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_seq
  FROM g
)
SELECT user_id, sess_seq, min(ts) AS session_start, max(ts) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events, round(sum(CAST(round((value) * 1e6) AS BIGINT)) / 1e6, 6) AS sum_value
FROM s GROUP BY user_id, sess_seq
"""

def stream_sessionize(
    spark: SparkSession,
    sf_dir: str,
    gap_min: int = SESSION_GAP_MIN,
    raw: DataFrame | None = None,
) -> DataFrame:
    """Streaming sessionization via the built-in session_window — the
    watermark bounds state so Spark can emit and evict closed sessions
    (applyInPandasWithState would be the fully-custom variant; the
    built-in gap window expresses exactly this operator). `raw`
    overrides the source (the late-data tests feed out-of-order
    multi-microbatch streams through it to pin the hardest watermark
    semantics in the repo: a late event MERGING two open sessions
    vs being dropped after they finalized)."""
    raw = _events_stream(spark, sf_dir) if raw is None else raw
    return (
        raw.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", f"{gap_min} minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), qsum6("value").alias("sum_value"))
        .select(
            "user_id",
            _ntz("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )

# ---------------------------------------------------------------------------
# Stream-static dimension enrichment
# ---------------------------------------------------------------------------

def _dim_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User dimension: customer decorated with its nation name — the
    small side of the enrichment join (dimension tables stay dimension-
    sized while the fact stream grows without bound)."""
    c = tables.load_table(spark, sf_dir, "customer")
    n = tables.load_table(spark, sf_dir, "nation")
    return c.join(
        F.broadcast(n.select(F.col("n_nationkey").cast("int").alias("c_nationkey"), "n_name")),
        "c_nationkey",
    ).select(F.col("c_custkey").alias("user_id"), "c_mktsegment", F.col("n_name").alias("nation"))

def enriched_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin: every event decorated with its user's market segment
    and nation — two broadcast hash joins, fact side never shuffles."""
    e = tables.load_table(spark, sf_dir, "events")
    return e.join(F.broadcast(_dim_users(spark, sf_dir)), "user_id").select(
        "event_id", "user_id", "event_type", "value", "c_mktsegment", "nation"
    )

def enriched_events_oracle() -> str:
    return """
SELECT e.event_id, e.user_id, e.event_type, e.value, c.c_mktsegment, n.n_name AS nation
FROM events e
JOIN customer c ON c.c_custkey = e.user_id
JOIN nation n ON n.n_nationkey = c.c_nationkey
"""

def stream_enriched_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin: stream-static join — the canonical streaming
    enrichment shape. The static dimension is planned as a broadcast
    per microbatch (and re-resolved each batch, so a slowly-changing
    dimension picks up updates without restarting the query); the
    stream side needs no watermark because an inner stream-static join
    keeps no stream state."""
    raw = _events_stream(spark, sf_dir)
    return raw.join(F.broadcast(_dim_users(spark, sf_dir)), "user_id").select(
        "event_id", "user_id", "event_type", "value", "c_mktsegment", "nation"
    )

# ---------------------------------------------------------------------------
# Custom stateful operator (applyInPandasWithState)
# ---------------------------------------------------------------------------

def running_user_totals_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stateful stream below: final per-user totals."""
    e = tables.load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"), qsum6("value").alias("sum_value")
    )

def stream_running_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fully-custom stateful streaming operator: cumulative per-user
    event count + value total maintained in GroupState across
    microbatches (applyInPandasWithState — the escape hatch when the
    built-in windowed/session aggregations can't express the state
    machine). Each microbatch emits the group's updated running totals;
    state is two scalars per user, so memory is O(users) regardless of
    stream length."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    raw = _events_stream(spark, sf_dir)

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        n, total_u = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            # accumulate integer micro-units so the running total is
            # order-independent and exactly equals the batch twin's
            # qsum6 regardless of microbatch slicing
            total_u += int((pdf["value"] * 1e6).round().astype("int64").sum())
        state.update((n, total_u))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "sum_value": [round(total_u / 1e6, 6)]}
        )

    return raw.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id BIGINT, n_events BIGINT, sum_value DOUBLE",
        stateStructType="n BIGINT, total_u BIGINT",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

# ---------------------------------------------------------------------------
# Stream-stream interval join (watermarked)
# ---------------------------------------------------------------------------

def stream_interval_click_purchases(
    spark: SparkSession, sf_dir: str, window_min: int = 10
) -> DataFrame:
    """Streaming twin of operators.timeseries.interval_click_counts's
    join core: purchases joined to the same user's clicks in the
    trailing `window_min` minutes, as a watermarked STREAM-STREAM inner
    join — the only streaming join class not covered by the
    stream-static enrichment above. Both sides carry a watermark and
    the join condition bounds click_ts to a closed interval behind
    purchase_ts, so Spark can size the state store and evict rows
    older than the slack — unbounded state otherwise.

    Emits one row per (purchase, matching click); the batch comparison
    aggregates both sides to per-purchase counts (inner semantics:
    zero-click purchases are absent — the batch twin keeps them via its
    left join, so the test filters those)."""
    raw = _events_stream(spark, sf_dir)
    purchases = (
        raw.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    clicks = (
        raw.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    cond = (
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") > F.col("purchase_ts") - F.expr(f"INTERVAL {window_min} MINUTES"))
    )
    return purchases.join(clicks, cond, "inner").select(
        "purchase_id", F.col("p_user").alias("user_id"), "purchase_ts", "click_id", "click_ts"
    )

# ---------------------------------------------------------------------------
# Streaming rate-limit admission (stateful per-(user, window) counter)
# ---------------------------------------------------------------------------

def stream_rate_limited_events(
    spark: SparkSession,
    sf_dir: str,
    limit: int | None = None,
    window_min: int | None = None,
    raw: DataFrame | None = None,
) -> DataFrame:
    """Streaming twin of operators.timeseries.rate_limited_events: a
    per-(user, tumbling-window) admission counter in GroupState. Each
    group's state is ONE integer (events seen so far in that window),
    so state memory is O(active user-windows) — at scale the window key
    in the group key is what lets old state age out naturally.

    Ordering contract: within a microbatch the group's rows are
    admitted in (ts, event_id) order; across microbatches, admission is
    arrival order (the true streaming semantic — an already-admitted
    event is never revoked). With in-order arrival the admitted set
    equals the batch twin's; the stream==batch test feeds the fixture
    as one batch, which satisfies that. Emits (event_id, user_id,
    win_start, seq_in_win, admitted)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..operators.timeseries import RATE_LIMIT_N, RATE_WINDOW_MIN

    limit = RATE_LIMIT_N if limit is None else limit
    window_min = RATE_WINDOW_MIN if window_min is None else window_min
    raw = _events_stream(spark, sf_dir) if raw is None else raw
    win_us = window_min * 60 * 1_000_000
    keyed = raw.select(
        "event_id",
        "user_id",
        (F.floor(epoch_us("ts") / win_us) * win_us).cast("bigint").alias("win_start"),
        "ts",
    )

    def update(key, pdfs, state: GroupState):
        user_id, win_start = key
        (n,) = state.get if state.exists else (0,)
        rows = pd.concat(list(pdfs))
        rows = rows.sort_values(["ts", "event_id"]).reset_index(drop=True)
        seq = n + 1 + rows.index.to_numpy()
        n += len(rows)
        state.update((n,))
        yield pd.DataFrame(
            {
                "event_id": rows["event_id"],
                "user_id": user_id,
                "win_start": win_start,
                "seq_in_win": seq.astype("int32"),
                "admitted": seq <= limit,
            }
        )

    return keyed.groupBy("user_id", "win_start").applyInPandasWithState(
        update,
        outputStructType=(
            "event_id BIGINT, user_id BIGINT, win_start BIGINT, "
            "seq_in_win INT, admitted BOOLEAN"
        ),
        stateStructType="n BIGINT",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_user_activity_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of operators.timeseries.user_activity_entropy:
    per-user event-type counts maintained in GroupState (two parallel
    arrays — the event-type vocabulary is small and bounded, so state
    is O(users x types)); each microbatch emits the user's refreshed
    entropy profile computed exactly as the batch twin does (per-term
    micro-quantized fold, round-6 top share), so the final update per
    user equals the batch row. The always-on form of the bot screen:
    a scripted account's entropy collapses within its first bursts,
    long before a daily batch audit would see it."""
    import math

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    raw = _events_stream(spark, sf_dir)

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        types, counts = state.get if state.exists else ([], [])
        tally = dict(zip(list(types), list(counts)))
        for pdf in pdfs:
            for et, c in pdf["event_type"].value_counts().items():
                tally[et] = tally.get(et, 0) + int(c)
        state.update((list(tally.keys()), list(tally.values())))
        n = sum(tally.values())
        ent_u = sum(
            int(round(-(c / n) * math.log(c / n) * 1e6)) for c in tally.values()
        )
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "n_types": [len(tally)],
                "entropy": [ent_u / 1e6],
                "top_share": [round(max(tally.values()) / n, 6)],
            }
        )

    return raw.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=(
            "user_id BIGINT, n_events BIGINT, n_types BIGINT, "
            "entropy DOUBLE, top_share DOUBLE"
        ),
        stateStructType="types ARRAY<STRING>, counts ARRAY<BIGINT>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming gap-bounded funnel (stateful per-user stage tracker)
# ---------------------------------------------------------------------------

def stream_funnel_within(
    spark: SparkSession,
    sf_dir: str,
    gap_hours: int | None = None,
    raw: DataFrame | None = None,
) -> DataFrame:
    """Streaming twin of operators.timeseries.funnel_within: a per-user
    stage tracker in GroupState. State is the user's funnel-relevant
    event times (three epoch-micro arrays, one per stage type); each
    microbatch merges the new arrivals and RE-DERIVES the entry chain
    with exactly the batch rule — s1 = min(signup), s2 = min(click in
    [s1, s1+gap]), s3 = min(purchase in [s2, s2+gap]) — so late or
    out-of-order arrivals retroactively repair the chain (an early
    click that arrives before its user's even-earlier signup is
    re-evaluated once the signup lands) and the final update per user
    equals the batch semantics over everything seen.

    Emits (user_id, n_seen, s1_us, s2_us, s3_us) per update; n_seen is
    monotone, so 'latest update per user' is a max(), and the funnel
    report (stage counts, conversions) is a metadata-sized fold over
    final states. State is O(funnel events per user) — exactness
    against retroactive repair requires keeping the times; a production
    deployment bounds it with a watermark TTL on state (evict users
    whose s3 completed or whose last event predates the gap horizon),
    which this twin omits to stay value-identical to the batch
    operator."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..operators.timeseries import FUNNEL_GAP_HOURS, FUNNEL_STAGES

    gap_hours = FUNNEL_GAP_HOURS if gap_hours is None else gap_hours
    gap_us = gap_hours * 3600 * 1_000_000
    raw = _events_stream(spark, sf_dir) if raw is None else raw
    keyed = raw.filter(F.col("event_type").isin(*FUNNEL_STAGES)).select(
        "user_id", "event_type", epoch_us("ts").alias("ts_us")
    )
    stage_of = {et: i for i, et in enumerate(FUNNEL_STAGES)}

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        times = [list(a) for a in state.get] if state.exists else [[], [], []]
        for pdf in pdfs:
            for et, ts_us in zip(pdf["event_type"], pdf["ts_us"]):
                times[stage_of[et]].append(int(ts_us))
        state.update(tuple(times))
        entries: list[int | None] = []
        prev: int | None = None
        for i, stage_times in enumerate(times):
            if i == 0:
                cur = min(stage_times) if stage_times else None
            elif prev is None:
                cur = None
            else:
                in_gap = [t for t in stage_times if prev <= t <= prev + gap_us]
                cur = min(in_gap) if in_gap else None
            entries.append(cur)
            prev = cur
        yield pd.DataFrame(
            {
                "user_id": pd.array([user_id], dtype="Int64"),
                "n_seen": pd.array([sum(map(len, times))], dtype="Int64"),
                "s1_us": pd.array([entries[0]], dtype="Int64"),
                "s2_us": pd.array([entries[1]], dtype="Int64"),
                "s3_us": pd.array([entries[2]], dtype="Int64"),
            }
        )

    return keyed.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=(
            "user_id BIGINT, n_seen BIGINT, s1_us BIGINT, s2_us BIGINT, s3_us BIGINT"
        ),
        stateStructType=(
            "signups ARRAY<BIGINT>, clicks ARRAY<BIGINT>, purchases ARRAY<BIGINT>"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
