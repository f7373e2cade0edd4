"""Cross-SF scaling trend: compare two bench maps (same machine, same
session discipline) and rank queries by their time ratio against the
10x data growth between them.

A query whose wall time grows ~1x is plan-setup-bound (fine); ~<=10x is
at-or-below linear in the data (fine — the cluster absorbs it with
executors); >>10x is super-linear and is exactly the operator that
falls over first at 100 TB. The probe exists to make that list explicit
every round instead of discovering it at scale.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python bench.py  # small map
  python scripts/scaling_probe.py <small_map.json> <big_map.json> [growth]
Prints one JSON line: worst ratios + the distribution.
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(
            "usage: scaling_probe.py <small_map.json> <big_map.json> [growth]",
            file=sys.stderr,
        )
        return 2
    small_path, big_path = sys.argv[1], sys.argv[2]
    growth = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    small = json.load(open(small_path))["queries"]
    big = json.load(open(big_path))["queries"]
    overlap = sorted(set(small) & set(big))
    ratios = {
        q: round(big[q] / small[q], 2)
        for q in overlap
        # sub-100ms small-side times are all JVM noise; a ratio over
        # them says nothing about data scaling
        if small[q] >= 0.1
    }
    ranked = sorted(ratios.items(), key=lambda x: -x[1])
    n = len(ratios)
    supra = [q for q, r in ranked if r > growth]
    out = {
        "n_compared": n,
        "growth": growth,
        "median_ratio": round(statistics.median(ratios.values()), 2) if n else None,
        "super_linear": {q: ratios[q] for q in supra},
        "worst10": dict(ranked[:10]),
        "total_small": round(sum(small[q] for q in overlap), 1),
        "total_big": round(sum(big[q] for q in overlap), 1),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
