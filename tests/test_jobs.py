"""Job state machine (S17 / §3.3): lifecycle transitions, keep-last
current view, paging, cleanup — deterministic via an injected clock."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from roblox_vector_search_datagen_spark.jobs.manager import JobManager

class FakeClock:
    def __init__(self):
        self.t = datetime(2026, 1, 1)

    def __call__(self):
        self.t += timedelta(minutes=1)
        return self.t

@pytest.fixture()
def jm(spark, tmp_path):
    return JobManager(spark, str(tmp_path / "joblog"), clock=FakeClock())

def test_lifecycle_completed(jm):
    jid = jm.create_job("generateEmbeddings")
    assert jm.get_job(jid)["status"] == "pending"
    jm.start_job(jid)
    job = jm.get_job(jid)
    assert job["status"] == "running" and job["started_at"] is not None
    jm.update_progress(jid, 5, 10, "halfway")
    job = jm.get_job(jid)
    assert (job["progress_current"], job["progress_total"]) == (5, 10)
    jm.complete_job(jid, result="ok")
    job = jm.get_job(jid)
    assert job["status"] == "completed" and job["result"] == "ok"
    assert job["completed_at"] > job["started_at"] > job["created_at"]

def test_run_job_failure_path(jm):
    jid = jm.create_job("gatherGames")

    def boom():
        raise RuntimeError("upstream 500")

    job = jm.run_job(jid, boom)
    assert job["status"] == "failed" and "upstream 500" in job["error"]
    # terminal states reject further transitions
    with pytest.raises(ValueError):
        jm.start_job(jid)

def test_illegal_transitions(jm):
    jid = jm.create_job("x")
    with pytest.raises(ValueError):
        jm.complete_job(jid)  # pending -> completed skips running
    with pytest.raises(KeyError):
        jm.start_job("nope")

def test_listing_counts_and_cleanup(jm):
    ids = [jm.create_job(f"cmd{i}") for i in range(5)]
    jm.run_job(ids[0], lambda: "r0")
    jm.run_job(ids[1], lambda: (_ for _ in ()).throw(RuntimeError("e")))
    # newest-first page over CURRENT state only (one row per job)
    page = jm.list_jobs(limit=3).collect()
    assert len(page) == 3
    created = [r["created_at"] for r in page]
    assert created == sorted(created, reverse=True)
    counts = {r["status"]: r["count"] for r in jm.counts_by_status().collect()}
    assert counts == {"pending": 3, "completed": 1, "failed": 1}
    # compaction preserves the current view
    before = sorted(map(tuple, jm.current().collect()))
    jm.compact()
    assert sorted(map(tuple, jm.current().collect())) == before
    # cleanup drops only terminal jobs older than cutoff
    removed = jm.delete_old_jobs(cutoff=datetime(2040, 1, 1))
    assert removed == 2
    assert jm.current().count() == 3
