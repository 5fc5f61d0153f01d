"""load_table normalization: every datagen timestamp encoding —
TIMESTAMP(NANOS) (epoch-nanos long under nanosAsLong) and
TIMESTAMP(MICROS, isAdjustedToUTC=false) (TIMESTAMP_NTZ) — must arrive
as plain TimestampType with identical wall-clock values, for ANY table
and column (the generic NTZ pass), on externally-built sessions too."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql.types import TimestampType

from dimagi_data_platform_spark.catalog import load_table

WALL = [
    datetime.datetime(1995, 3, 15, 12, 30, 45, 123456),
    datetime.datetime(1997, 7, 1, 0, 0, 0),
]


def _write(dir_path, name, arrow_type):
    arr = pa.array(WALL, type=arrow_type)
    t = pa.table({"o_orderkey": pa.array([1, 2], type=pa.int64()), "o_orderdate": arr})
    pq.write_table(t, str(dir_path / f"{name}.parquet"))


def test_ntz_micros_normalized_generically(spark, tmp_path):
    # no tz annotation -> parquet isAdjustedToUTC=false -> Spark NTZ;
    # orders.o_orderdate is NOT in any per-column allowlist, so this
    # exercises the generic TimestampNTZType pass
    _write(tmp_path, "orders", pa.timestamp("us"))
    df = load_table(spark, str(tmp_path), "orders")
    assert isinstance(df.schema["o_orderdate"].dataType, TimestampType)
    got = [r.o_orderdate for r in df.orderBy("o_orderkey").collect()]
    assert got == WALL


def test_nanos_long_normalized_via_allowlist(spark, tmp_path):
    # nanos-precision parquet reads as epoch-nanos LONG under
    # nanosAsLong; the o_orderdate allowlist entry must rebuild the
    # exact wall clock (test values are µs-precision)
    _write(tmp_path, "orders", pa.timestamp("ns"))
    df = load_table(spark, str(tmp_path), "orders")
    assert isinstance(df.schema["o_orderdate"].dataType, TimestampType)
    got = [r.o_orderdate for r in df.orderBy("o_orderkey").collect()]
    assert got == WALL


def test_both_encodings_hash_identically(spark, tmp_path):
    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    _write(tmp_path / "a", "orders", pa.timestamp("us"))
    _write(tmp_path / "b", "orders", pa.timestamp("ns"))
    a = load_table(spark, str(tmp_path / "a"), "orders").collect()
    b = load_table(spark, str(tmp_path / "b"), "orders").collect()
    assert a == b
