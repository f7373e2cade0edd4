"""Streaming twins vs batch semantics (Trigger.AvailableNow over the
static fixture directory — the documented correctness story for the
streaming path)."""

from __future__ import annotations

from roblox_vector_search_datagen_spark.streaming import events as S

def _collect_set(rows, cols):
    return {tuple(getattr(r, c) for c in cols) for r in rows}

def test_stream_windowed_counts_equals_batch(spark, sf_dir):
    batch = S.windowed_event_counts(spark, sf_dir).collect()
    q = S.run_stream_to_memory(S.stream_windowed_event_counts(spark, sf_dir), "win_counts")
    q.awaitTermination(120)
    streamed = spark.sql("SELECT * FROM win_counts").collect()
    cols = ["window_start", "event_type", "n", "sum_value"]
    assert _collect_set(streamed, cols) == _collect_set(batch, cols)
    assert len(batch) > 0

def test_stream_sessionize_matches_batch_sessions(spark, sf_dir):
    batch = S.sessionize(spark, sf_dir).collect()
    q = S.run_stream_to_memory(S.stream_sessionize(spark, sf_dir), "sessions")
    q.awaitTermination(120)
    streamed = spark.sql("SELECT * FROM sessions").collect()
    cols = ["user_id", "session_start", "n_events", "sum_value"]
    assert _collect_set(streamed, cols) == _collect_set(batch, cols)
    assert len(batch) > 0

def test_stream_enriched_events_equals_batch(spark, sf_dir):
    """Stream-static join twin: append-mode output over the static
    directory equals the batch enrichment row-for-row."""
    batch = S.enriched_events(spark, sf_dir).collect()
    q = S.run_stream_to_memory(
        S.stream_enriched_events(spark, sf_dir), "enriched", output_mode="append"
    )
    q.awaitTermination(120)
    streamed = spark.sql("SELECT * FROM enriched").collect()
    cols = ["event_id", "user_id", "event_type", "value", "c_mktsegment", "nation"]
    assert _collect_set(streamed, cols) == _collect_set(batch, cols)
    assert len(batch) > 0

def test_foreachbatch_parquet_sink_is_idempotent(spark, sf_dir, tmp_path):
    """Exactly-once contract: draining the same bounded stream twice
    (fresh checkpoint the second time, simulating a reprocess into the
    same directory) yields the batch row count once, not twice —
    batch-scoped overwrite makes replays self-replacing."""
    from roblox_vector_search_datagen_spark.streaming import sinks

    batch_n = S.enriched_events(spark, sf_dir).count()
    out = str(tmp_path / "out")
    for i in range(2):
        q = sinks.stream_to_parquet_idempotent(
            S.stream_enriched_events(spark, sf_dir), out, str(tmp_path / f"ckpt{i}")
        )
        q.awaitTermination(120)
    assert spark.read.parquet(out).count() == batch_n > 0

def test_stateful_running_totals_matches_batch(spark, sf_dir):
    """applyInPandasWithState custom operator: the last update emitted
    per user equals the batch aggregate (float compared with tolerance —
    pandas partial sums accumulate in a different order than the batch
    agg)."""
    batch = {r.user_id: r for r in S.running_user_totals_batch(spark, sf_dir).collect()}
    q = S.run_stream_to_memory(
        S.stream_running_user_totals(spark, sf_dir), "running_totals", output_mode="update"
    )
    q.awaitTermination(120)
    latest = {}
    for r in spark.sql("SELECT * FROM running_totals").collect():
        # update mode: totals are monotone, so the row with the highest
        # n_events is the final state regardless of sink row order
        if r.user_id not in latest or r.n_events > latest[r.user_id].n_events:
            latest[r.user_id] = r
    assert set(latest) == set(batch) and len(batch) > 0
    for uid, b in batch.items():
        s = latest[uid]
        assert s.n_events == b.n_events, uid
        assert abs(s.sum_value - b.sum_value) < 1e-6, uid

def test_stream_stream_interval_join_matches_batch_counts(spark, sf_dir):
    """Watermarked stream-stream join == the batch interval join's
    per-purchase counts (restricted to purchases with >=1 click, the
    inner-join subset)."""
    from pyspark.sql import functions as F

    from roblox_vector_search_datagen_spark.operators import timeseries

    batch = {
        (r.purchase_id, r.n_clicks)
        for r in timeseries.interval_click_counts(spark, sf_dir).collect()
        if r.n_clicks > 0
    }
    q = S.run_stream_to_memory(
        S.stream_interval_click_purchases(spark, sf_dir), "ss_join", output_mode="append"
    )
    q.awaitTermination(120)
    streamed = {
        (r.purchase_id, r.n)
        for r in spark.sql(
            "SELECT purchase_id, count(*) AS n FROM ss_join GROUP BY purchase_id"
        ).collect()
    }
    assert streamed == batch
    assert len(batch) > 0

def test_stream_ingest_dedup_matches_batch(spark, sf_dir):
    """Stream-static anti-join dedup-at-ingest == batch twin."""
    from roblox_vector_search_datagen_spark.streaming import ingest

    batch = {(r.doc_id, r.digest) for r in ingest.ingest_dedup(spark, sf_dir).collect()}
    q = S.run_stream_to_memory(
        ingest.stream_ingest_dedup(spark, sf_dir), "ingest_dedup", output_mode="append"
    )
    q.awaitTermination(120)
    streamed = {
        (r.doc_id, r.digest) for r in spark.sql("SELECT * FROM ingest_dedup").collect()
    }
    assert streamed == batch
    assert len(batch) > 0

def test_stream_sliding_counts_equals_batch(spark, sf_dir):
    batch = S.sliding_event_counts(spark, sf_dir).collect()
    q = S.run_stream_to_memory(S.stream_sliding_event_counts(spark, sf_dir), "slide_counts")
    q.awaitTermination(120)
    streamed = spark.sql("SELECT * FROM slide_counts").collect()
    cols = ["window_start", "event_type", "n", "sum_value"]
    assert _collect_set(streamed, cols) == _collect_set(batch, cols)
    # every event lands in exactly window/slide = 3 windows
    from roblox_vector_search_datagen_spark.sources import tables

    n_events = tables.load_table(spark, sf_dir, "events").count()
    assert sum(r.n for r in batch) == 3 * n_events

def test_stream_ingest_near_dedup_matches_batch(spark, sf_dir):
    """Per-band stream-static probes == exploded batch anti-join; the
    stream twin is stateless (append mode, no watermark)."""
    from roblox_vector_search_datagen_spark.streaming import ingest

    batch = {r.doc_id for r in ingest.ingest_near_dedup(spark, sf_dir).collect()}
    q = S.run_stream_to_memory(
        ingest.stream_ingest_near_dedup(spark, sf_dir),
        "ingest_near_dedup",
        output_mode="append",
    )
    q.awaitTermination(120)
    streamed = {
        r.doc_id for r in spark.sql("SELECT * FROM ingest_near_dedup").collect()
    }
    assert streamed == batch
    assert 0 < len(batch)
    # near-dedup is strictly stronger than exact dedup at ingest: every
    # survivor of the band filter also survives the digest filter
    exact = {r.doc_id for r in ingest.ingest_dedup(spark, sf_dir).collect()}
    assert batch <= exact

def test_stream_rate_limit_matches_batch(spark, sf_dir):
    """The stateful streaming admission counter reproduces the batch
    rate_limited_events verdict per event when the fixture arrives
    in order (one microbatch)."""
    from roblox_vector_search_datagen_spark.operators.timeseries import rate_limited_events

    batch = {
        r.event_id: (r.seq_in_win, r.admitted)
        for r in rate_limited_events(spark, sf_dir).collect()
    }
    q = S.run_stream_to_memory(
        S.stream_rate_limited_events(spark, sf_dir), "rate_limited", output_mode="update"
    )
    q.awaitTermination(120)
    streamed = {
        r.event_id: (r.seq_in_win, r.admitted)
        for r in spark.sql("SELECT * FROM rate_limited").collect()
    }
    assert len(batch) > 0 and set(streamed) == set(batch)
    assert streamed == batch
