"""Per-query disposition pass over the events/timeseries family — the
largest block r12 left untouched (VERDICT r12 item 4). For every family
query this measures, in ONE warm session:

  * builder seconds (plan construction, the r12 driver-side cost),
  * first noop run (codegen/first-touch) and steady-state min,
  * executed-plan shape: Exchange count, per-Exchange partitioning
    keys, Window specs, and whether any two shuffles share a key (a
    fusion candidate) or an exchange feeds a window that a preceding
    aggregation already clustered (a removable shuffle).

The output is the evidence for either fusing windows or formally
closing the family as "every exchange is window/agg-required".

Usage: python scripts/events_disposition_r13.py [--sf DIR]
"""

from __future__ import annotations

import io
import json
import os
import re
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVENTS_QUERIES = [
    "enriched_events", "sessionize", "windowed_event_counts",
    "sliding_event_counts", "latest_event_per_user", "funnel_counts",
    "funnel_within", "interval_click_counts", "asof_attribution",
    "asof_next_action", "event_rollup", "event_props_rollup",
    "event_value_quantiles", "event_value_quantiles_approx",
    "event_value_histogram", "event_anomalies", "event_minmax_downsample",
    "rate_limited_events", "scd2_user_state", "point_in_time_state",
    "user_activity_entropy", "user_retention", "retention_curve",
    "hll_daily_users", "sketch_event_profile", "winsorized_event_stats",
    "winsorized_event_stats_approx", "events_zorder",
]


def main() -> int:
    sf_dir = "/root/testdata/sf0.1"
    argv = sys.argv[1:]
    if "--sf" in argv:
        sf_dir = argv[argv.index("--sf") + 1]

    from roblox_vector_search_datagen_spark.plans.registry import QUERIES
    from roblox_vector_search_datagen_spark.session import get_spark

    spark = get_spark("rvsd-events-r13")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    QUERIES["latest_event_per_user"].builder(spark, sf_dir).collect()  # warm

    for name in EVENTS_QUERIES:
        if name not in QUERIES:
            print(json.dumps({"q": name, "skip": "not in registry"}))
            continue
        t0 = time.perf_counter()
        df = QUERIES[name].builder(spark, sf_dir)
        t_build = time.perf_counter() - t0
        runs = []
        for i in range(4):
            spark.sparkContext.setJobDescription(f"events:{name}:{i}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        exchanges = re.findall(
            r"Arguments: (hashpartitioning|rangepartitioning|SinglePartition|RoundRobinPartitioning)\(?([^,)]*)", plan
        )
        windows = len(re.findall(r"\(\d+\) Window", plan))
        keys = [f"{kind}:{arg.strip()}" for kind, arg in exchanges]
        dup_keys = sorted({k for k in keys if keys.count(k) > 1})
        print(
            json.dumps(
                {
                    "q": name,
                    "build_s": round(t_build, 3),
                    "first": runs[0],
                    "steady": min(runs[1:]),
                    "n_exchange": len(keys),
                    "exchange_keys": keys,
                    "n_window": windows,
                    "repeated_exchange_keys": dup_keys,
                }
            )
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
