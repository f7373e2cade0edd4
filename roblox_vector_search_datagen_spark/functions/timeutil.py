"""Timestamp helpers shared by the event-time operators.

The fixture `events.ts` arrives as TIMESTAMP_NTZ (parquet
timestamp[us] with no timezone — see sources.tables.load_table, which
normalizes every legacy encoding to NTZ). Spark's `unix_micros` only
accepts TIMESTAMP (LTZ), and EVERY NTZ->LTZ hop Spark offers reads
`spark.sql.session.timeZone` — `cast('timestamp')` directly, and
`to_utc_timestamp` through its implicit input cast — so converting
first would make epoch arithmetic depend on a conf the driver's own
session does not pin (and silently shift results on a non-UTC host,
or break on DST-gap wall times that don't exist in the session zone).

Instead the epoch is assembled from timezone-free wall-clock fields:
date difference to 1970-01-01 plus hour/minute/fractional-second
extraction. That interprets the NTZ wall-clock as UTC exactly like
DuckDB's `epoch_us(ts)` over the same naive timestamps, under ANY
session timezone — pinned by tests/test_quality_layout.py, which
evaluates it per-row under non-UTC session zones.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_US_PER_DAY = 86_400_000_000
_US_PER_HOUR = 3_600_000_000
_US_PER_MIN = 60_000_000

def epoch_us(col: Column | str) -> Column:
    """Epoch microseconds of a TIMESTAMP_NTZ column, treating the
    wall-clock as UTC, independent of spark.sql.session.timeZone.
    date_part('SECOND') returns a DECIMAL carrying the microsecond
    fraction, so the `* 1_000_000` is exact."""
    c = F.col(col) if isinstance(col, str) else col
    days = F.datediff(c.cast("date"), F.lit("1970-01-01").cast("date")).cast("long")
    sec = F.call_function("date_part", F.lit("SECOND"), c)
    return (
        days * _US_PER_DAY
        + F.hour(c).cast("long") * _US_PER_HOUR
        + F.minute(c).cast("long") * _US_PER_MIN
        + (sec * 1_000_000).cast("long")
    )
