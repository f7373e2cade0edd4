"""Cache-lifecycle stress: the registry's persist discipline keeps
~20 session-invariant subtrees cached across a long query session,
with LRU eviction as the only backstop. This suite proves the
correctness half of that design: under a deliberately squeezed unified
memory pool (spark.testing.memory), eviction must degrade to
RECOMPUTE — every query still matches its DuckDB oracle — never to
wrong answers. The performance half (don't evict on a 128 GiB host)
is session.py's host-aware driver memory + bench.py's per-query
storage instrumentation.

Runs scripts/driver_sim.py in subprocesses because the memory manager
is fixed at JVM launch — the suite's shared session can't be shrunk.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

# the persist-heavy cohort: every query here either persists a subtree
# or consumes one another query persists (signatures, assignments, tf,
# media decode) — the shapes eviction would corrupt if Spark's cache
# substitution were unsound under pressure
CACHE_HEAVY = [
    "minhash_signatures",
    "lsh_candidate_pairs",
    "minhash_jaccard_estimates",
    "simhash_banded_near_dups",
    "dedup_clusters",
    "ivf_assignments",
    "ivf_train",
    "ivf_train_iters",
    "ann_ivf_topk",
    "bm25_search",
    "pmi_collocations",
    "media_features",
    "semantic_dedup",
]


def _run(sf_dir: str, extra_env: dict) -> subprocess.CompletedProcess:
    env = os.environ | extra_env
    return subprocess.run(
        [sys.executable, "scripts/driver_sim.py", sf_dir, *CACHE_HEAVY],
        cwd="/root/repo",
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )


@pytest.mark.parametrize(
    "label,env",
    [
        ("ample", {}),
        # 64 MiB total (reserved memory zeroed): the ~38 MiB unified
        # pool is shared by 16 execution threads AND every persisted
        # subtree, so storage sits permanently below its protected
        # share and cached blocks face real eviction. (At 32 MiB the
        # run fails LOUDLY with task memory-acquisition errors — also
        # acceptable-by-design: never a silent wrong answer.)
        ("constrained", {"DRIVER_SIM_TESTING_MEMORY": str(64 * 1024 * 1024)}),
    ],
)
def test_cache_heavy_cohort_correct_under_memory_pressure(label, env, sf_dir):
    res = _run(sf_dir, env)
    tail = "\n".join(res.stdout.splitlines()[-3:])
    assert res.returncode == 0, f"{label}: exit {res.returncode}\n{tail}\n{res.stderr[-2000:]}"
    assert '"failures": []' in res.stdout, f"{label}: {tail}"
