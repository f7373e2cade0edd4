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
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

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
