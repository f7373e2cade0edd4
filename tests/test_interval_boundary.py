"""Pins the interval-join boundary semantics of interval_click_counts:
the trailing window is half-open, (purchase_ts - window, purchase_ts] —
a click exactly AT purchase_ts counts, a click exactly AT
purchase_ts - window does not. The oracle uses `>` and `<=`; these
tests keep a refactor from drifting either edge."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from roblox_vector_search_datagen_spark.operators import timeseries

WINDOW_MIN = 10
T = datetime(2025, 6, 1, 12, 0, 0)
US = timedelta(microseconds=1)

# one purchase, clicks planted exactly on and 1µs off both window edges
EVENTS = [
    (100, T, 1, "purchase", 9.99, None),
    (1, T - timedelta(minutes=WINDOW_MIN), 1, "click", None, None),        # AT lower edge: OUT
    (2, T - timedelta(minutes=WINDOW_MIN) + US, 1, "click", None, None),   # 1µs inside: IN
    (3, T, 1, "click", None, None),                                        # AT purchase: IN
    (4, T + US, 1, "click", None, None),                                   # 1µs after: OUT
    (5, T - timedelta(minutes=3), 1, "click", None, None),                 # mid-window: IN
    (6, T - timedelta(minutes=3), 2, "click", None, None),                 # other user: OUT
    (200, T, 3, "purchase", 1.0, None),                                    # zero-click purchase
]

@pytest.fixture(scope="module")
def ev_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("interval")
    spark.createDataFrame(
        EVENTS,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).coalesce(1).write.parquet(str(d / "events.parquet"))
    return str(d)

def test_window_edges(spark, ev_dir):
    rows = timeseries.interval_click_counts(spark, ev_dir, window_min=WINDOW_MIN).collect()
    got = {r.purchase_id: r.n_clicks for r in rows}
    # clicks 2, 3, 5 are in-window for purchase 100; 1 and 4 sit exactly
    # outside the half-open interval; user-3 purchase keeps its 0 row
    assert got == {100: 3, 200: 0}

def test_edge_click_lands_in_previous_bucket_probe(spark, ev_dir):
    # the 1µs-inside click (id 2) falls in the PREVIOUS time bucket of
    # the purchase — the explode-2-probes design must find it; shrink
    # the window so the bucket boundary sits inside the window to prove
    # the cross-bucket probe works at the exact boundary
    rows = timeseries.interval_click_counts(spark, ev_dir, window_min=7).collect()
    got = {r.purchase_id: r.n_clicks for r in rows}
    # 7-minute window: only clicks 3 (at T) and 5 (T-3min) qualify
    assert got == {100: 2, 200: 0}
