"""Regression tests for the TIMESTAMP_NTZ drift that crashed the round-3
driver bench (VERDICT r3 §What's wrong 1-2).

The testdata parquet stores naive ``timestamp[us]``, which Spark 4 reads as
TIMESTAMP_NTZ — a dialect ``withWatermark`` rejects and NTZ→DOUBLE casts
can't handle. The unit suite previously built every timestamp fixture with
``createDataFrame`` (LTZ) and so could never catch this class of breakage;
these tests source their timestamps FROM PARQUET, both through ``load_table``
(which normalizes) and through a raw ``spark.read.parquet`` (deliberately
un-normalized NTZ) to pin the operators' own hardening.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from polars_numba_spark.operators.sessionize import sessionize
from polars_numba_spark.operators.timeseries import (
    gap_fill_interpolate,
    rolling_range_agg,
)
from polars_numba_spark.sources.tables import load_stream, load_table
from polars_numba_spark.streaming.stateful import (
    streaming_exact_dedup,
    windowed_rollup,
)

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def _raw_events(spark):
    """The un-normalized parquet read — ts arrives as whatever Spark infers
    (TIMESTAMP_NTZ for the current testdata)."""
    return spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))


def test_load_table_normalizes_event_time_to_ltz(spark):
    df = load_table(spark, "events", SF_DIR)
    assert isinstance(df.schema["ts"].dataType, T.TimestampType), (
        "load_table must hand downstream operators session-zone TIMESTAMP, "
        f"got {df.schema['ts'].dataType}"
    )


def test_load_table_normalization_preserves_wall_clock(spark):
    # Session tz is UTC (session.py), so NTZ→LTZ must not shift values.
    raw = _raw_events(spark).select(F.max("ts").alias("m")).collect()[0]["m"]
    norm = (
        load_table(spark, "events", SF_DIR).select(F.max("ts").alias("m")).collect()[0]["m"]
    )
    assert raw.replace(tzinfo=None) == norm.replace(tzinfo=None)


def test_load_stream_schema_matches_batch(spark):
    batch = load_table(spark, "events", SF_DIR)
    stream = load_stream(spark, "events", SF_DIR)
    assert stream.schema == batch.schema


def test_gap_fill_on_raw_ntz_parquet(spark):
    # The exact round-3 crash: NTZ ts → cast to double inside gap_fill.
    df = _raw_events(spark).where(F.col("user_id") < 5)
    out = gap_fill_interpolate(
        df, "ts", "value", step_seconds=3600, partition_by="user_id"
    )
    assert out.count() > 0


def test_gap_fill_parquet_matches_ltz_fixture(spark):
    # Same rows through the raw-NTZ path and the normalized path.
    raw = _raw_events(spark).where(F.col("user_id") < 5)
    norm = load_table(spark, "events", SF_DIR).where(F.col("user_id") < 5)
    out_raw = gap_fill_interpolate(raw, "ts", "value", 3600, "user_id")
    out_norm = gap_fill_interpolate(norm, "ts", "value", 3600, "user_id")
    rows_raw = sorted(
        (r["user_id"], str(r["ts"]).replace("+00:00", ""), r["value"])
        for r in out_raw.collect()
    )
    rows_norm = sorted(
        (r["user_id"], str(r["ts"]).replace("+00:00", ""), r["value"])
        for r in out_norm.collect()
    )
    assert rows_raw == rows_norm


def test_rolling_range_on_raw_ntz_parquet(spark):
    df = _raw_events(spark).where(F.col("user_id") < 5)
    out = rolling_range_agg(
        df, "ts", 3600, {"roll_sum": F.sum("value")}, partition_by="user_id"
    )
    assert out.count() == df.count()


def test_streaming_watermark_rollup_on_parquet_source(spark, tmp_path):
    # Round-3 failure #2: withWatermark on NTZ event time is illegal.
    stream = load_stream(spark, "events", SF_DIR)
    rolled = windowed_rollup(
        stream,
        "ts",
        window_duration="1 day",
        watermark="1 hour",
        group_by=["event_type"],
        aggs={"n": F.count(F.lit(1))},
    )
    q = (
        rolled.writeStream.format("memory")
        .queryName("ntz_rollup_regression")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish within timeout"
    got = spark.sql("select * from ntz_rollup_regression").count()
    batch = windowed_rollup(
        load_table(spark, "events", SF_DIR),
        "ts",
        window_duration="1 day",
        group_by=["event_type"],
        aggs={"n": F.count(F.lit(1))},
    ).count()
    assert got == batch


def test_sessionize_watermark_analyzes_on_raw_ntz_stream(spark):
    # sessionize hardens the time column itself; analysis must not raise
    # EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE even on a raw NTZ stream.
    raw_schema = spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(SF_DIR)
    )
    out = sessionize(
        stream, "ts", gap="30 minutes", group_by="user_id", watermark="1 hour"
    )
    # .explain() forces analysis; the r3 bug raised here.
    out.explain()


def test_streaming_exact_dedup_watermark_analyzes_on_raw_ntz_stream(spark):
    raw_schema = spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(SF_DIR)
    )
    out = streaming_exact_dedup(stream, "props", time_col="ts", watermark="1 hour")
    out.explain()
