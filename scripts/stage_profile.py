"""Per-stage attribution for one registry query: run it once warm via
the noop sink, then dump every stage of that run with task time, input
rows/bytes, shuffle bytes, and parallelism from the status store.

Usage: python scripts/stage_profile.py <query> [--sf DIR]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    name = sys.argv[1]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]

    from roblox_vector_search_datagen_spark.plans.registry import QUERIES
    from roblox_vector_search_datagen_spark.session import get_spark

    spark = get_spark("rvsd-stage-profile")
    spark.sparkContext.setLogLevel("ERROR")
    df = QUERIES[name].builder(spark, sf_dir)
    # warm run: codegen/JIT + first-touch of persisted subtrees
    df.write.format("noop").mode("overwrite").save()

    store = spark.sparkContext._jsc.sc().statusStore()
    before_ids = {s.stageId() for s in _stages(store)}

    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0

    print(f"query={name} warm_noop_wall={wall:.3f}s")
    print(f"{'stage':>6} {'tasks':>5} {'task_ms':>8} {'inRows':>9} "
          f"{'inMB':>7} {'shRdMB':>7} {'shWrMB':>7}  name")
    total_ms = 0
    for s in _stages(store):
        if s.stageId() in before_ids:
            continue
        ms = s.executorRunTime()
        total_ms += ms
        print(f"{s.stageId():>6} {s.numCompleteTasks():>5} {ms:>8} "
              f"{s.inputRecords():>9} {s.inputBytes()/1048576:>7.2f} "
              f"{s.shuffleReadBytes()/1048576:>7.2f} "
              f"{s.shuffleWriteBytes()/1048576:>7.2f}  "
              f"{s.name()[:60]}")
    print(f"total_task_ms={total_ms} wall={wall:.3f}s "
          f"parallelism={total_ms/1000/max(wall,1e-9):.1f}")
    return 0


def _stages(store):
    from pyspark import SparkContext

    jvm = SparkContext._active_spark_context._jvm
    empty = jvm.java.util.ArrayList()  # no status filter -> all stages
    quantiles = SparkContext._active_spark_context._gateway.new_array(
        jvm.double, 0
    )
    it = store.stageList(empty, False, False, quantiles, empty).iterator()
    out = []
    while it.hasNext():
        out.append(it.next())
    return out


if __name__ == "__main__":
    raise SystemExit(main())
