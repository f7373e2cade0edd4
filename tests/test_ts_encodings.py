"""load_table must yield the same UTC wall-clock NTZ `ts` for every
physical encoding the round fixtures have shipped (micros, nanos-as-
long, LTZ instant) under ANY session timezone — the fixture-drift
failure class that broke round 1 (PARQUET_TYPE_ILLEGAL / shifted
walls). The legacy branches build NTZ by adding epoch micros to an NTZ
epoch literal, never via an NTZ<->LTZ cast, so the session zone cannot
leak in."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from roblox_vector_search_datagen_spark.sources import tables

# one DST-gap wall time (02:30 America/New_York on 2026-03-08 does not
# exist locally) to catch session-zone round-trips that shift or throw
EPOCH_US = [1768478400123456, 1772937000000001, 0]
WALLS = [
    "2026-01-15 12:00:00.123456",
    "2026-03-08 02:30:00.000001",
    "1970-01-01 00:00:00",
]


def _write(tmp_path, name: str, arr: pa.Array) -> str:
    d = str(tmp_path / name)
    t = pa.table(
        {
            "event_id": pa.array(range(len(EPOCH_US)), pa.int64()),
            "ts": arr,
            "user_id": pa.array([1] * len(EPOCH_US), pa.int64()),
            "event_type": pa.array(["click"] * len(EPOCH_US)),
            "value": pa.array([1.0] * len(EPOCH_US)),
            "props": pa.array(["{}"] * len(EPOCH_US)),
        }
    )
    (tmp_path / name).mkdir()
    pq.write_table(t, f"{d}/events.parquet")
    return d


@pytest.mark.parametrize("tz", ["UTC", "America/New_York", "Asia/Tokyo"])
def test_load_table_normalizes_every_ts_encoding(spark, tmp_path, tz):
    micros = _write(tmp_path, "micros", pa.array(EPOCH_US, pa.timestamp("us")))
    nanos = _write(
        tmp_path, "nanos", pa.array([u * 1000 for u in EPOCH_US], pa.timestamp("ns"))
    )
    ltz = _write(tmp_path, "ltz", pa.array(EPOCH_US, pa.timestamp("us", tz="UTC")))

    original = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", tz)
        for enc_dir in (micros, nanos, ltz):
            df = tables.load_table(spark, enc_dir, "events")
            assert dict(df.dtypes)["ts"] == "timestamp_ntz", enc_dir
            # str() of a naive datetime drops a zero fraction, matching
            # WALLS[2] exactly
            got = [
                str(r.ts)
                for r in df.select("ts", "event_id").orderBy("event_id").collect()
            ]
            assert got == WALLS, (enc_dir, tz, got)
    finally:
        spark.conf.set("spark.sql.session.timeZone", original)
