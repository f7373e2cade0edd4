"""Job orchestration layer (S17 / SURVEY.md §3.3): the reference's
SQLite-backed jobManager (src/lib/jobManager.ts:46-268) re-expressed for
Spark storage.

Spark tables have no in-place row UPDATE, so the state machine is an
**append-only transition log** + a keep-last *current-state view* — the
same pattern a streaming upsert sink uses. Every transition appends one
row (JOB_SCHEMA plus a monotonically increasing `seq`); `current()`
resolves the latest row per job with a window. At reference scale the
log is tiny; at cluster scale the append is a parquet file-add (no
read-modify-write race between jobs) and the view compacts via
`compact()` whenever the log grows.

State machine (jobManager.ts:6, 245-268):

    pending --start--> running --+--> completed (result)
                                 +--> failed    (error)

Transitions are validated; the reference enforces the same set with a
CHECK constraint (jobManager.ts:50).
"""

from __future__ import annotations

import uuid
from datetime import datetime, timezone
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import JOB_SCHEMA, JOB_STATUSES

LOG_SCHEMA = T.StructType(JOB_SCHEMA.fields + [T.StructField("seq", T.LongType(), False)])

_ALLOWED = {
    ("pending", "running"),
    ("running", "completed"),
    ("running", "failed"),
    # progress updates re-append the current status
    ("running", "running"),
    ("pending", "pending"),
}

class JobManager:
    """Append-only job log at `log_dir` (parquet directory).

    `clock` is injectable so tests are deterministic; production default
    is wall-clock UTC (reference uses SQLite datetime('now'),
    jobManager.ts:74-76).
    """

    def __init__(self, spark: SparkSession, log_dir: str, clock: Callable[[], datetime] | None = None):
        self.spark = spark
        self.log_dir = log_dir
        self._clock = clock or (lambda: datetime.now(timezone.utc).replace(tzinfo=None))
        # jobUpdated observers (jobManager.ts:188-192 emits an
        # EventEmitter notification on every job mutation; the API's
        # long-poll endpoints hang off it). Each callback receives the
        # full post-transition row dict. Observer errors are isolated —
        # a bad listener must not fail the job transition itself.
        self._observers: list[Callable[[dict], None]] = []
        # resume the sequence from the persisted log: a manager built
        # over an existing log (process restart, second worker) must not
        # append transitions with seq below rows already present, or
        # current()'s keep-last would resolve to stale state
        self._seq = self._load_seq()

    # -- log primitives ----------------------------------------------------

    def _load_seq(self) -> int:
        try:
            mx = self._log().agg(F.max("seq")).collect()[0][0]
            return int(mx) if mx is not None else 0
        except Exception:  # PATH_NOT_FOUND: fresh log directory
            return 0

    def _append(self, row: dict) -> None:
        self._seq += 1
        row = {**row, "seq": self._seq}
        self.spark.createDataFrame([row], LOG_SCHEMA).coalesce(1).write.mode("append").parquet(
            self.log_dir
        )

    def _log(self) -> DataFrame:
        return self.spark.read.schema(LOG_SCHEMA).parquet(self.log_dir)

    def current(self) -> DataFrame:
        """Latest state per job (keep-last by seq — T2 window dedup).
        Ties on seq (two writers that resumed from the same log high-
        water mark) break on the most recent transition timestamp, so a
        completed/failed row beats a concurrent progress update."""
        latest_ts = F.coalesce("completed_at", "started_at", "created_at")
        w = Window.partitionBy("id").orderBy(F.col("seq").desc(), latest_ts.desc_nulls_last())
        return (
            self._log()
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "seq")
        )

    def compact(self) -> None:
        """Rewrite the log to one row per job. Keeps the read path O(jobs)
        instead of O(transitions) when the log has grown."""
        snapshot = [r.asDict() for r in self.current().collect()]
        rows = [{**r, "seq": i + 1} for i, r in enumerate(snapshot)]
        self._seq = len(rows)  # compacted log renumbers from 1
        df = self.spark.createDataFrame(rows, LOG_SCHEMA)
        df.write.mode("overwrite").parquet(self.log_dir + "_compact")
        self.spark.read.schema(LOG_SCHEMA).parquet(self.log_dir + "_compact").write.mode(
            "overwrite"
        ).parquet(self.log_dir)

    def seed_from(self, jobs_df: DataFrame) -> int:
        """Append a current-state snapshot (e.g. a reference jobs.db
        read through sources.sqlite_jobs) into the log — each imported
        row becomes one transition, sequenced after any existing rows
        so current() resolves imported state only where the log has no
        newer transition for that id. Returns rows imported."""
        snapshot = [r.asDict() for r in jobs_df.collect()]
        rows = []
        for r in snapshot:
            self._seq += 1
            rows.append({**r, "seq": self._seq})
        if rows:
            self.spark.createDataFrame(rows, LOG_SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(self.log_dir)
        return len(rows)

    # -- reference API surface (jobManager.ts:70-243) ----------------------

    def create_job(self, command: str) -> str:
        job_id = str(uuid.uuid4())
        row = {
            "id": job_id,
            "command": command,
            "status": "pending",
            "progress_current": None,
            "progress_total": None,
            "progress_message": None,
            "result": None,
            "error": None,
            "created_at": self._clock(),
            "started_at": None,
            "completed_at": None,
        }
        self._append(row)
        self._notify(row)
        return job_id

    def get_job(self, job_id: str) -> dict | None:
        rows = self.current().filter(F.col("id") == job_id).collect()
        return rows[0].asDict() if rows else None

    def _transition(self, job_id: str, status: str, **updates) -> dict:
        if status not in JOB_STATUSES:
            raise ValueError(f"unknown status {status!r}")
        cur = self.get_job(job_id)
        if cur is None:
            raise KeyError(job_id)
        if (cur["status"], status) not in _ALLOWED:
            raise ValueError(f"illegal transition {cur['status']} -> {status} for {job_id}")
        nxt = {**cur, "status": status, **updates}
        self._append(nxt)
        self._notify(nxt)
        return nxt

    # -- jobUpdated events (jobManager.ts:188-192) -------------------------

    def on_job_updated(self, callback: Callable[[dict], None]) -> Callable[[], None]:
        """Subscribe to every job mutation (creation + each transition,
        including progress re-appends). Returns an unsubscribe thunk."""
        self._observers.append(callback)
        return lambda: self._observers.remove(callback)

    def _notify(self, row: dict) -> None:
        for cb in list(self._observers):
            try:
                cb(dict(row))
            except Exception:  # noqa: BLE001 — listener bugs don't fail jobs
                pass

    def start_job(self, job_id: str) -> dict:
        return self._transition(job_id, "running", started_at=self._clock())

    def update_progress(self, job_id: str, current: int, total: int, message: str | None = None) -> dict:
        cur = self.get_job(job_id)
        if cur is None:
            raise KeyError(job_id)
        return self._transition(
            job_id,
            cur["status"],
            progress_current=current,
            progress_total=total,
            progress_message=message,
        )

    def complete_job(self, job_id: str, result: str | None = None) -> dict:
        return self._transition(job_id, "completed", result=result, completed_at=self._clock())

    def fail_job(self, job_id: str, error: str) -> dict:
        return self._transition(job_id, "failed", error=error, completed_at=self._clock())

    def run_job(self, job_id: str, fn: Callable[[], str | None]) -> dict:
        """runJob (jobManager.ts:245-268): running -> fn() -> completed
        with its result, or failed with the error message."""
        self.start_job(job_id)
        try:
            result = fn()
        except Exception as e:  # noqa: BLE001 — reference stores any error
            return self.fail_job(job_id, str(e))
        return self.complete_job(job_id, result)

    # -- queries (jobManager.ts:93-102, 218-243) ---------------------------

    def list_jobs(self, limit: int = 100, offset: int = 0) -> DataFrame:
        """Newest-first page; limit clamped to the reference's 1..1000
        (jobsList.get.ts:95-100). Offset via row_number window — at
        driver-metadata scale the single-partition window is fine."""
        limit = max(1, min(1000, limit))
        w = Window.orderBy(F.col("created_at").desc(), F.col("id").desc())
        return (
            self.current()
            .withColumn("_rn", F.row_number().over(w))
            .filter((F.col("_rn") > offset) & (F.col("_rn") <= offset + limit))
            .drop("_rn")
        )

    def counts_by_status(self) -> DataFrame:
        return self.current().groupBy("status").count()

    def delete_old_jobs(self, cutoff: datetime) -> int:
        """deleteOldJobs (jobManager.ts:209-216): drop completed/failed
        jobs created before the cutoff; rewrites the compacted log."""
        keep = self.current().filter(
            ~(F.col("status").isin("completed", "failed") & (F.col("created_at") < F.lit(cutoff)))
        )
        rows = [r.asDict() for r in keep.collect()]
        removed = self.current().count() - len(rows)
        rows = [{**r, "seq": i + 1} for i, r in enumerate(rows)]
        self._seq = len(rows)
        df = self.spark.createDataFrame(rows, LOG_SCHEMA)
        df.write.mode("overwrite").parquet(self.log_dir + "_compact")
        self.spark.read.schema(LOG_SCHEMA).parquet(self.log_dir + "_compact").write.mode(
            "overwrite"
        ).parquet(self.log_dir)
        return removed
