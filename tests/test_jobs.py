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

@pytest.mark.slow
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

@pytest.mark.slow
def test_run_job_failure_path(jm):
    jid = jm.create_job("gatherGames")

    def boom():
        raise RuntimeError("upstream 500")

    job = jm.run_job(jid, boom)
    assert job["status"] == "failed" and "upstream 500" in job["error"]
    # terminal states reject further transitions
    with pytest.raises(ValueError):
        jm.start_job(jid)

@pytest.mark.slow
def test_illegal_transitions(jm):
    jid = jm.create_job("x")
    with pytest.raises(ValueError):
        jm.complete_job(jid)  # pending -> completed skips running
    with pytest.raises(KeyError):
        jm.start_job("nope")

@pytest.mark.slow
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

# ---------------------------------------------------------------------------
# SQLite interchange (byte-level parity with the reference's data/jobs.db)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_sqlite_roundtrip_preserves_current_state(jm, spark, tmp_path):
    import sqlite3

    from roblox_vector_search_datagen_spark.sources import sqlite_jobs

    j1 = jm.create_job("gatherGames")
    jm.start_job(j1)
    jm.update_progress(j1, 3, 10, "gathering")
    j2 = jm.create_job("generateEmbeddings")
    jm.start_job(j2)
    jm.complete_job(j2, result="done")
    j3 = jm.create_job("downloadImages")

    db = str(tmp_path / "jobs.db")
    n = sqlite_jobs.write_jobs_db(jm.current(), db)
    assert n == 3

    # the written file matches the reference DDL: column names/order and
    # the status CHECK constraint both enforced
    con = sqlite3.connect(db)
    cols = [r[1] for r in con.execute("PRAGMA table_info(jobs)")]
    assert cols == [f.name for f in sqlite_jobs.JOB_SCHEMA.fields]
    with pytest.raises(sqlite3.IntegrityError):
        con.execute(
            "INSERT INTO jobs (id, command, status, created_at)"
            " VALUES ('x', 'c', 'bogus', '2026-01-01 00:00:00')"
        )
    idx = {r[0] for r in con.execute("SELECT name FROM sqlite_master WHERE type='index'")}
    assert {"idx_jobs_status", "idx_jobs_created_at", "idx_jobs_command"} <= idx
    con.close()

    back = {r["id"]: r.asDict() for r in sqlite_jobs.read_jobs_db(spark, db).collect()}
    orig = {r["id"]: r.asDict() for r in jm.current().collect()}
    assert set(back) == set(orig) == {j1, j2, j3}
    for jid in orig:
        assert back[jid] == orig[jid], jid

def test_sqlite_read_rejects_unknown_status(spark, tmp_path):
    import sqlite3

    from roblox_vector_search_datagen_spark.sources import sqlite_jobs

    db = str(tmp_path / "bad.db")
    con = sqlite3.connect(db)
    con.execute(sqlite_jobs.JOBS_DDL.replace("CHECK (status IN ('pending', 'running', 'completed', 'failed'))", ""))
    con.execute(
        "INSERT INTO jobs (id, command, status, created_at)"
        " VALUES ('j', 'c', 'exploded', '2026-01-01 00:00:00')"
    )
    con.commit()
    con.close()
    with pytest.raises(ValueError, match="unknown status"):
        sqlite_jobs.read_jobs_db(spark, db)

@pytest.mark.slow
def test_job_updated_events(jm):
    """jobUpdated observer hook (jobManager.ts:188-192): every mutation
    notifies subscribers with the post-transition row; unsubscribe
    stops delivery; a raising listener doesn't fail the transition."""
    seen: list[tuple[str, str]] = []
    off = jm.on_job_updated(lambda row: seen.append((row["id"], row["status"])))

    def boom(row):
        raise RuntimeError("listener bug")

    jm.on_job_updated(boom)  # must be isolated
    jid = jm.create_job("gatherGames")
    jm.start_job(jid)
    jm.update_progress(jid, 1, 10, "page 1")
    jm.complete_job(jid, "ok")
    assert [s for i, s in seen if i == jid] == [
        "pending",
        "running",
        "running",
        "completed",
    ]
    off()
    jid2 = jm.create_job("gatherGames")
    assert all(i != jid2 for i, _ in seen)
