"""Isolate one registry query: time it with the noop sink (guide §1.4),
print `.explain("formatted")`, and dump per-stage/task metrics so the
cost can be attributed (scan vs shuffle vs Python boundary).

Usage: python scripts/profile_query.py <query> [query ...]
         [--sf DIR] [--runs N] [--explain-only] [--plan-dir DIR]

Timing methodology: noop sink forces every column of every row without
paying a real write; run 1 is reported separately (it pays codegen/JIT
and any shared-subtree first-touch), the min over the remaining runs is
the steady-state number.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    runs = 4
    plan_dir = None
    if "--sf" in flags:
        sf_dir = flags[flags.index("--sf") + 1]
    if "--runs" in flags:
        runs = int(flags[flags.index("--runs") + 1])
    if "--plan-dir" in flags:
        plan_dir = flags[flags.index("--plan-dir") + 1]
    explain_only = "--explain-only" in flags
    names = [a for a in args if a not in (sf_dir, str(runs), plan_dir)]

    from roblox_vector_search_datagen_spark.plans.registry import QUERIES
    from roblox_vector_search_datagen_spark.session import get_spark

    spark = get_spark("rvsd-profile")
    spark.sparkContext.setLogLevel("ERROR")

    # same warmup as bench.py so first-run numbers aren't JVM spin-up
    if not explain_only:
        spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
        for w in ("latest_event_per_user", "merge_games_gather", "ann_topk",
                  "token_counts", "media_resize"):
            if w in QUERIES:
                QUERIES[w].builder(spark, sf_dir).collect()

    for name in names:
        q = QUERIES[name]
        df = q.builder(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        if plan_dir:
            os.makedirs(plan_dir, exist_ok=True)
            with open(os.path.join(plan_dir, f"{name}.txt"), "w") as f:
                f.write(plan)
        else:
            print(f"===== plan: {name} =====")
            print(plan)
        if explain_only:
            continue
        times = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"profile:{name}:run{i}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        # collect-based timing too: the bench/driver methodology
        t0 = time.perf_counter()
        df.collect()
        t_collect = round(time.perf_counter() - t0, 3)
        print(json.dumps({
            "q": name, "sf": sf_dir, "noop_runs": times,
            "first": times[0], "steady": min(times[1:]) if len(times) > 1 else times[0],
            "collect_after_warm": t_collect,
        }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
