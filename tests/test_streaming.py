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
