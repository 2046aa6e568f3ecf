"""Time-series and chunking operator unit tests (literal golden cases)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from polars_numba_spark.operators.chunking import chunk_documents
from polars_numba_spark.operators.timeseries import (
    gap_fill_interpolate,
    resample_grid,
    rolling_range_agg,
)

T0 = datetime(2024, 1, 1, 0, 0, 0)


def test_rolling_range_agg_irregular_spacing(spark):
    rows = [
        ("u", T0, 10),
        ("u", T0 + timedelta(seconds=30), 20),   # within 60s of the first
        ("u", T0 + timedelta(seconds=100), 40),  # both earlier rows outside (Δ=70, 100)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v long")
    out = rolling_range_agg(df, "ts", 60, {"s": F.sum("v")}, partition_by="k")
    got = {r["v"]: r["s"] for r in out.collect()}
    assert got == {10: 10, 20: 30, 40: 40}


def test_resample_grid_bounds(spark):
    rows = [("u", T0), ("u", T0 + timedelta(hours=2, minutes=30))]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    grid = resample_grid(df, "ts", 3600, partition_by="k")
    times = sorted(r["ts"] for r in grid.collect())
    assert times == [T0, T0 + timedelta(hours=1), T0 + timedelta(hours=2)]


def test_gap_fill_linear_golden(spark):
    # observations at t=0 (v=0) and t=4h (v=400) → 1h grid interpolates 100/h
    rows = [("u", T0, 0.0), ("u", T0 + timedelta(hours=4), 400.0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = gap_fill_interpolate(df, "ts", "v", 3600, partition_by="k", method="linear")
    got = {r["ts"]: r["v"] for r in out.collect()}
    expected = {T0 + timedelta(hours=h): 100.0 * h for h in range(5)}
    assert got == expected


def test_gap_fill_ffill(spark):
    rows = [("u", T0, 7.0), ("u", T0 + timedelta(hours=2), 9.0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = gap_fill_interpolate(df, "ts", "v", 3600, partition_by="k", method="ffill")
    got = {r["ts"]: r["v"] for r in out.collect()}
    assert got == {T0: 7.0, T0 + timedelta(hours=1): 7.0, T0 + timedelta(hours=2): 9.0}


def test_gap_fill_bad_method(spark):
    df = spark.createDataFrame([("u", T0, 1.0)], "k string, ts timestamp, v double")
    with pytest.raises(ValueError, match="unknown fill method"):
        gap_fill_interpolate(df, "ts", "v", 60, method="cubic")


def test_chunking_golden(spark):
    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=4, overlap=1).orderBy("chunk_idx").collect()
    # stride 3: starts 0,3,6 → ceil((10-1)/3)=3 chunks
    assert [r["chunk_idx"] for r in out] == [0, 1, 2]
    assert out[0]["chunk_text"] == "w0 w1 w2 w3"
    assert out[1]["chunk_text"] == "w3 w4 w5 w6"
    assert out[2]["chunk_text"] == "w6 w7 w8 w9"
    assert [r["n_chunk_tokens"] for r in out] == [4, 4, 4]


def test_chunking_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=64, overlap=16).collect()
    assert len(out) == 1 and out[0]["chunk_text"] == "a b"


def test_chunking_invalid_overlap(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_gap_fill_ignores_null_valued_observations(spark):
    """A null-valued observation must contribute neither value nor TIME —
    regression: its timestamp desynchronized the interpolation fraction."""
    rows = [
        ("u", T0, 0.0),
        ("u", T0 + timedelta(seconds=10), None),
        ("u", T0 + timedelta(seconds=20), 20.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = gap_fill_interpolate(df, "ts", "v", 4, partition_by="k", method="linear")
    got = {r["ts"]: r["v"] for r in out.collect()}
    expected = {T0 + timedelta(seconds=s): float(s) for s in range(0, 21, 4)}
    assert got == expected


def test_chunking_null_text_filtered(spark):
    df = spark.createDataFrame([(1, "a b"), (2, None)], "doc_id long, text string")
    out = chunk_documents(df)
    assert [r["doc_id"] for r in out.collect()] == [1]
