"""Streaming sinks: exactly-once parquet output via foreachBatch.

Structured Streaming's file sink is append-only with its own log; when
the target is a plain parquet directory (or a table a batch engine also
writes), the portable exactly-once recipe is foreachBatch + an
idempotent write keyed by batchId: replays of a batch after a crash
overwrite the same directory instead of duplicating rows. The batchId
check makes restarts safe even when the checkpoint says a batch is
in-flight (the write is the transaction; the directory name is the
transaction id). At cluster scale the same hook writes MERGEs into
Iceberg/Delta — the batchId-idempotence contract is identical.

Transactional MERGE (upsert) has two arms here:

* `stream_merge_keep_last` — the PORTABLE arm, no table format
  required: each microbatch merges into the previous committed
  snapshot (full-outer keep-last, the J1 semantics the registry's
  merge oracles pin), writes the result to a batchId-keyed version
  directory, and atomically repoints a CURRENT marker
  (functions/warehouse.py's os.replace publish). Readers racing a
  commit see the old or the new complete snapshot, never a partial
  table; a replayed batch either no-ops (marker already at its
  version) or rebuilds its version from the prior snapshot —
  exactly-once end to end. Cost model: each commit rewrites the
  snapshot (O(|table|) per batch) — the right trade below the scale
  where a log-structured format pays for itself, and the reason the
  Delta arm exists above it.
* `stream_merge_delta` — the log-structured arm, capability-gated on
  the Delta Lake runtime (`delta_available()`): per-batch
  `DeltaTable.merge` whenMatchedUpdateAll/whenNotMatchedInsertAll,
  O(|batch| + touched files) per commit instead of O(|table|). The
  container this repo is developed in ships no Delta jar (documented
  every round since r6), so the arm raises a clear capability error
  here and the test suite pins the gate, not the merge.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions import warehouse

def stream_to_parquet_idempotent(stream_df: DataFrame, out_dir: str, checkpoint_dir: str):
    """Start an AvailableNow foreachBatch query writing each microbatch
    to `<out_dir>/batch=<id>/`, overwriting on replay (idempotent).
    Returns the streaming query handle."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # mode=overwrite scoped to THIS batch's directory: a replayed
        # batch replaces itself and can never double-append
        batch_df.write.mode("overwrite").parquet(os.path.join(out_dir, f"batch={batch_id}"))

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def delta_available() -> bool:
    """True when the Delta Lake python bindings (and therefore the jar
    they load) are importable — the capability gate for
    `stream_merge_delta`. This container ships neither, so the gate is
    False here by design; a cluster with delta-spark on the classpath
    flips the same code path on without edits."""
    try:  # pragma: no cover - delta not installed in this environment
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def stream_merge_keep_last(
    stream_df: DataFrame,
    out_base: str,
    key_cols: list[str],
    checkpoint_dir: str,
    order_col: str | None = None,
):
    """Start an AvailableNow foreachBatch query MERGING each microbatch
    into a versioned parquet snapshot with keep-last upsert semantics
    (the registry's J1 merge contract): rows whose keys exist are
    replaced, new keys are inserted, within-batch duplicates collapse
    to the `order_col`-latest (arrival order when None). Each batch
    commits `<out_base>_v<batchId>` and atomically repoints
    `<out_base>.CURRENT`; read the table via `current_snapshot`.

    Exactly-once without a table format: the version directory is
    keyed by batchId, so a replay after a crash either (a) no-ops —
    the marker already points at this batch's version (commit
    completed, only the checkpoint write was lost), or (b) rebuilds
    its version from the PRIOR committed snapshot (the marker moves
    last, so a half-written version is never the read path). The
    keep-last merge is idempotent under replay by construction: same
    keys, same values."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        vpath = f"{out_base}_v{batch_id}"
        if warehouse.read_current(out_base) == vpath and warehouse.tables_ready(vpath):
            return  # replay of a fully-committed batch: no-op
        # collapse within-batch duplicates to the latest per key
        if order_col is not None:
            w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).desc())
            batch_last = (
                batch_df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        else:
            batch_last = batch_df.dropDuplicates(key_cols)
        cur = warehouse.read_current(out_base)
        if cur is not None:
            base = spark.read.parquet(cur)
            # keep-last merge: batch rows win over snapshot rows
            merged = base.join(
                batch_last.select(*key_cols), key_cols, "left_anti"
            ).unionByName(batch_last)
        else:
            merged = batch_last
        merged.write.mode("overwrite").parquet(vpath)
        warehouse.repoint_current(out_base, vpath)
        # commit-time retention (retain = pointed): the prior snapshot
        # was fully read into `merged` before this write, and a replay
        # of THIS batch no-ops on the marker check above — so the
        # superseded version is unreachable the moment the marker moves
        # and can be collected here instead of waiting for gcWarehouse
        warehouse.collect_superseded(out_base)

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def current_snapshot(spark, out_base: str) -> DataFrame:
    """The committed keep-last table: the snapshot the CURRENT marker
    points at (raises if nothing has committed yet)."""
    cur = warehouse.read_current(out_base)
    if cur is None:
        raise FileNotFoundError(f"no committed snapshot under {out_base}")
    return spark.read.parquet(cur)


def stream_merge_delta(
    stream_df: DataFrame,
    target_path: str,
    key_cols: list[str],
    checkpoint_dir: str,
):
    """The log-structured MERGE arm: per-batch DeltaTable.merge with
    whenMatchedUpdateAll / whenNotMatchedInsertAll — O(|batch| +
    touched files) per commit, the upgrade from the portable
    snapshot-rewrite arm once the table outgrows full rewrites.
    Capability-gated: raises RuntimeError with the remediation when
    the Delta runtime is absent (this container), so a caller can fall
    back to `stream_merge_keep_last` explicitly rather than silently
    losing transactionality."""
    if not delta_available():
        raise RuntimeError(
            "Delta Lake runtime not on the classpath: install delta-spark / add "
            "the delta jars, or use stream_merge_keep_last (portable versioned-"
            "snapshot MERGE with the same keep-last semantics)."
        )

    from delta.tables import DeltaTable  # pragma: no cover - gated above

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:  # pragma: no cover
        spark = batch_df.sparkSession
        cond = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
        if not DeltaTable.isDeltaTable(spark, target_path):
            batch_df.write.format("delta").mode("overwrite").save(target_path)
            return
        (
            DeltaTable.forPath(spark, target_path)
            .alias("t")
            .merge(batch_df.dropDuplicates(key_cols).alias("s"), cond)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )

    return (  # pragma: no cover - gated above
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
