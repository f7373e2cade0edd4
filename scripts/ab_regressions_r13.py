"""Interleaved same-session A/B for the two r12 regressions VERDICT
flagged as plausibly real (training_corpus +15%, ingest_decision_report
+12%) — the discipline that caught and reverted the constraint_audit
spread in r12: alternate variants within ONE warm session, min-of-N
noop-sink runs each, so host drift hits both arms equally.

Arms:
  training_corpus        : spread_scan ON (r12 code) vs OFF
                           (SPARK_GRAFT_NO_SPREAD toggled around the
                           builder call — the gate reads the env at
                           call time).
  ingest_decision_report : r12 SQL-text band-signature expression vs
                           the r11 Column-built twin (reconstructed
                           here verbatim from git 7ea75ca) substituted
                           via monkeypatch — plan cost aside, the two
                           parse to the same expression tree; this arm
                           isolates whether the rewrite changed the
                           EXECUTED plan at all.

Usage: python scripts/ab_regressions_r13.py [--sf DIR] [--rounds N]
Prints one JSON line per (query, arm) with the min/median of rounds.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = "/root/testdata/sf0.1"
    rounds = 5
    argv = sys.argv[1:]
    if "--sf" in argv:
        sf_dir = argv[argv.index("--sf") + 1]
    if "--rounds" in argv:
        rounds = int(argv[argv.index("--rounds") + 1])

    from pyspark.sql import functions as F

    from roblox_vector_search_datagen_spark.functions import hashing as H
    from roblox_vector_search_datagen_spark.operators import textprep
    from roblox_vector_search_datagen_spark.session import get_spark
    from roblox_vector_search_datagen_spark.streaming import ingest

    spark = get_spark("rvsd-ab-r13")
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    def r11_rowwise_band_sigs() -> F.Column:
        """The pre-r12 Column-built band-signature expression, verbatim
        from git 7ea75ca (streaming/ingest.py)."""

        def build(hv: F.Column) -> F.Column:
            comps = [
                F.coalesce(
                    F.array_min(
                        F.transform(
                            hv,
                            lambda h: (F.lit(H.MINHASH_A[i]) * h + F.lit(H.MINHASH_B[i]))
                            % H.P,
                        )
                    ),
                    F.lit(-1),
                )
                for i in range(H.MINHASH_K)
            ]
            bands = []
            for b in range(H.LSH_BANDS):
                cols = comps[b * H.ROWS_PER_BAND : (b + 1) * H.ROWS_PER_BAND]
                bands.append(
                    F.concat_ws(",", F.lit(str(b)), *[c.cast("string") for c in cols])
                )
            return F.array(*bands)

        hashed = F.transform(
            H.word_shingles_expr(F.col("text")), lambda x: H.h32_expr(x) % H.P
        )
        return H.let_expr(hashed, build)

    def time_noop(builder) -> float:
        t0 = time.perf_counter()
        builder().write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def tc_spread_on():
        os.environ.pop("SPARK_GRAFT_NO_SPREAD", None)
        return textprep.training_corpus(spark, sf_dir)

    def tc_spread_off():
        os.environ["SPARK_GRAFT_NO_SPREAD"] = "1"
        try:
            return textprep.training_corpus(spark, sf_dir)
        finally:
            os.environ.pop("SPARK_GRAFT_NO_SPREAD", None)

    def idr_r12():
        return ingest.ingest_decision_report(spark, sf_dir)

    def idr_r11():
        orig = ingest._rowwise_band_sigs
        ingest._rowwise_band_sigs = r11_rowwise_band_sigs
        try:
            return ingest.ingest_decision_report(spark, sf_dir)
        finally:
            ingest._rowwise_band_sigs = orig

    arms = [
        ("training_corpus", "spread_on", tc_spread_on),
        ("training_corpus", "spread_off", tc_spread_off),
        ("ingest_decision_report", "expr_r12", idr_r12),
        ("ingest_decision_report", "expr_r11", idr_r11),
    ]
    # one untimed pass each (codegen / shared-subtree first touch)
    for _, _, b in arms:
        time_noop(b)
    samples: dict[tuple[str, str], list[float]] = {(q, a): [] for q, a, _ in arms}
    for _ in range(rounds):
        for q, a, b in arms:  # interleave: both arms see the same drift
            samples[(q, a)].append(time_noop(b))
    for (q, a), xs in samples.items():
        print(
            json.dumps(
                {
                    "query": q,
                    "arm": a,
                    "min": round(min(xs), 3),
                    "median": round(statistics.median(xs), 3),
                    "runs": [round(x, 3) for x in xs],
                }
            )
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
