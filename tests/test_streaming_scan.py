"""Streaming grouped scan vs batch grouped scan parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_numba_spark.operators.scan import grouped_scan
from polars_numba_spark.sources import load_stream, load_table
from polars_numba_spark.streaming import streaming_grouped_scan

SF = "/root/testdata/sf0.001"


def add_cents(acc, cents):
    return acc + cents


def test_streaming_scan_matches_batch(spark, tmp_path):
    batch = load_table(spark, "events", SF).withColumn(
        "cents", F.round(F.col("value") * 100).cast("double")
    )
    expected = {
        (r["user_id"], r["event_id"]): r["scan"]
        for r in grouped_scan(
            batch.select("user_id", "event_id", "ts", "cents"),
            "user_id", add_cents, 0.0, "double",
            columns=["cents"], order_by=["ts", "event_id"],
        ).collect()
    }

    stream = load_stream(spark, "events", SF).withColumn(
        "cents", F.round(F.col("value") * 100).cast("double")
    )
    out = streaming_grouped_scan(
        stream.select("user_id", "event_id", "ts", "cents"),
        "user_id", add_cents, 0.0, "double",
        columns=["cents"], order_by=["ts", "event_id"],
    )
    query = (
        out.writeStream.format("memory")
        .queryName("scan_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert query.awaitTermination(120), "stream did not finish within timeout"
    got = {
        (r["user_id"], r["event_id"]): r["scan"]
        for r in spark.sql("SELECT user_id, event_id, scan FROM scan_stream").collect()
    }
    assert got == expected


def test_staged_scan_is_batch_count_independent(spark):
    """Round-2 verdict #3: the driver's streaming balance query must match
    the global window oracle even when input arrives in MANY micro-batches.
    Force one file per trigger over a multi-file staged layout (8 files →
    8+ batches) and compare against the single-stream batch kernel."""
    from polars_numba_spark.queries.io_streaming import (
        staged_streaming_scan_balance,
    )

    batch = load_table(spark, "events", SF).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long")
    )
    expected = {
        (r["user_id"], r["event_id"]): r["scan"]
        for r in grouped_scan(
            batch.select("user_id", "event_id", "ts", "cents"),
            "user_id", add_cents, 0, "long",
            columns=["cents"], order_by=["ts", "event_id"],
        ).collect()
    }

    out = staged_streaming_scan_balance(
        spark, SF, n_staging_files=8, max_files_per_trigger=1
    )
    got = {(r["user_id"], r["event_id"]): r["scan"] for r in out.collect()}
    assert got == expected
