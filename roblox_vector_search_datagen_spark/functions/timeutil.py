"""Timestamp helpers shared by the event-time operators.

The fixture `events.ts` arrives as TIMESTAMP_NTZ (parquet
timestamp[us] with no timezone — see sources.tables.load_table, which
normalizes every legacy encoding to NTZ). Spark's `unix_micros` only
accepts TIMESTAMP (LTZ), so epoch arithmetic over the fixtures needs
one explicit, session-timezone-independent hop: interpret the NTZ
wall-clock as UTC (`to_utc_timestamp(ts, 'UTC')` — a no-op rendering
that only changes the type) and take `unix_micros` of the resulting
instant. DuckDB's `epoch_us(ts)` over the same naive timestamps makes
the identical UTC assumption, which is what keeps the oracles exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

def epoch_us(col: Column | str) -> Column:
    """Epoch microseconds of a TIMESTAMP_NTZ column, treating the
    wall-clock as UTC. Deterministic regardless of session timezone
    (never cast NTZ->LTZ directly: that cast reads the *session*
    timezone and would change results between the repo session and a
    driver-built one)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(F.to_utc_timestamp(c, "UTC"))
