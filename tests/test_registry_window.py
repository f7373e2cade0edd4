"""Machine checks for the adjudication window (plans/registry.py).

The r7/r8/r9 advisories each caught the same class of slip: the
hand-maintained prose around _ADJUDICATE_FIRST (cohort sizes, registry
count) drifting from the tuple it describes. The r9 verdict ordered
this test: the counts now live in named cohort tuples and every number
the comment states is parsed and compared here, plus the staleness
invariant the rotation exists to maintain is recomputed from the
committed CORRECTNESS_r*.json history.
"""

from __future__ import annotations

import glob
import json
import os
import re

from roblox_vector_search_datagen_spark.plans import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50
# the window cycles the registry in ceil(|registry| / WINDOW) rounds;
# the staleness ceiling is that many rounds minus one behind the newest
CYCLE_ROUNDS = -(-len(registry.QUERIES) // WINDOW)


def _newest_driver_round() -> dict[str, int]:
    newest: dict[str, int] = {}
    for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f)
        rnd = int(m.group(1))
        with open(f, encoding="utf-8") as fh:
            for name in json.load(fh):
                newest[name] = max(newest.get(name, 0), rnd)
    return newest


def test_window_is_exactly_fifty_unique_registry_queries():
    w = registry._ADJUDICATE_FIRST
    assert len(w) == WINDOW
    assert len(set(w)) == WINDOW, "duplicate window entries"
    missing = [n for n in w if n not in registry.QUERIES]
    assert not missing, f"window names not in registry: {missing}"
    # the reorder must actually put the window first
    assert list(registry.QUERIES)[:WINDOW] == list(w)


def test_cohort_tuples_sum_to_the_window():
    cohorts = [
        getattr(registry, n)
        for n in dir(registry)
        if re.fullmatch(r"_R\d+_[A-Z0-9_]+", n)
    ]
    assert cohorts, "no cohort tuples found"
    assert sum(len(c) for c in cohorts) == WINDOW
    flat = tuple(q for c in cohorts for q in c)
    assert sorted(flat) == sorted(registry._ADJUDICATE_FIRST)


def test_comment_arithmetic_matches_the_tuples():
    """Every '# cohort <name> (N)' line must state the length of the
    tuple that follows it, and the '<N>-query registry' prose must
    state len(QUERIES)."""
    src_path = os.path.join(
        REPO, "roblox_vector_search_datagen_spark", "plans", "registry.py"
    )
    with open(src_path, encoding="utf-8") as fh:
        src = fh.read()

    stated = re.findall(r"# cohort ([a-z0-9-]+) \((\d+)\)", src)
    assert stated, "cohort comments must carry machine-checkable counts"
    # map comment slug -> following tuple length via source order
    tuples = re.findall(r"^(_R\d+_[A-Z0-9_]+) = \(", src, flags=re.M)
    assert len(stated) == len(tuples), (stated, tuples)
    for (slug, count), tname in zip(stated, tuples):
        assert len(getattr(registry, tname)) == int(count), (
            f"comment says cohort {slug} has {count} queries but "
            f"{tname} has {len(getattr(registry, tname))}"
        )

    reg_counts = {int(n) for n in re.findall(r"(\d+)-query registry", src)}
    assert reg_counts == {len(registry.QUERIES)}, (
        f"comment registry counts {reg_counts} != {len(registry.QUERIES)}"
    )


def test_window_covers_every_stale_and_unadjudicated_query():
    """The rotation's purpose, recomputed from the committed driver
    artifacts: (a) every registry query with NO driver row yet must be
    in the window; (b) every query whose newest driver row is at or
    beyond the staleness ceiling (CYCLE_ROUNDS-1 rounds behind the
    newest round) must be in the window. This test failing at the
    START of a round means: rotate the window before doing anything
    else."""
    newest = _newest_driver_round()
    if not newest:  # fresh clone without artifacts — nothing to check
        return
    max_round = max(newest.values())
    window = set(registry._ADJUDICATE_FIRST)

    never = [n for n in registry.QUERIES if n not in newest]
    not_windowed = [n for n in never if n not in window]
    assert not not_windowed, f"new queries missing from window: {not_windowed}"

    threshold = max_round - (CYCLE_ROUNDS - 1)
    stale = [n for n, r in newest.items() if r <= threshold and n in registry.QUERIES]
    missed = [n for n in stale if n not in window]
    assert not missed, (
        f"queries with newest driver row <= r{threshold} not in window: {missed}"
    )
