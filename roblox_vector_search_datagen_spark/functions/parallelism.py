"""Scale-adaptive partition sizing for CPU-heavy per-row stages.

The fixture tables are single-row-group parquet files, so every scan is
one task and every byte-light subtree AQE-coalesces to one partition —
which serializes the stages whose cost is CPU per row, not bytes
(vendored codec decode chains, the BPE merge fold, synthetic-corpus
generators). On a real cluster the scan side is parallel from file
splits, so the repartition count must NOT be a local[32] constant: it
is derived from the input size with the session's own split sizing
(`spark.sql.files.maxPartitionBytes`) and floored at the cluster's
`defaultParallelism` — the same arithmetic the scan planner applies,
so at 100 TB the pinned count matches what a parallel scan would have
produced anyway, and at fixture scale it spreads the per-row work over
the available cores.

The repartitions this feeds are KEY-ONLY or metadata-width exchanges
(doc_id streams, text already bound for a doc_id window) — never a
second pass over heavy payload bytes; see each call site's docstring.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession

# (applicationId, sf_dir, table) -> partition count; os.stat is cheap
# but builders run inside the bench's timed loop, so even microseconds
# are paid 3x per query — and the value is session-stable anyway.
_PARTS_MEMO: dict[tuple[str, str, str], int] = {}


def _size_bytes(path: str) -> int:
    if os.path.isdir(path):
        total = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
        return total
    try:
        return os.path.getsize(path)
    except OSError:
        return 0


def _max_partition_bytes(spark: SparkSession) -> int:
    raw = spark.conf.get("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    units = {"k": 1024, "m": 1024**2, "g": 1024**3}
    s = raw.strip().lower().removesuffix("b")
    if s and s[-1] in units:
        return int(s[:-1]) * units[s[-1]]
    try:
        return int(s)
    except ValueError:
        return 128 * 1024 * 1024


def corpus_partitions(spark: SparkSession, sf_dir: str, table: str = "documents") -> int:
    """max(defaultParallelism, ceil(table bytes / maxPartitionBytes)) —
    the partition count a parallel scan of `table` would get, floored
    at one task per core so fixture-scale inputs still use the whole
    machine for CPU-bound per-row work."""
    key = (spark.sparkContext.applicationId, sf_dir, table)
    n = _PARTS_MEMO.get(key)
    if n is None:
        size = _size_bytes(os.path.join(sf_dir, f"{table}.parquet"))
        n = max(
            spark.sparkContext.defaultParallelism,
            math.ceil(size / _max_partition_bytes(spark)),
        )
        _PARTS_MEMO[key] = n
    return n
