"""Dtype-table coverage for the fold/scan kernels (SURVEY.md §1.2):
boolean, integral widths, floats, timestamp, date inputs; unsupported types
rejected."""

from __future__ import annotations

from datetime import date, datetime

import pytest
from pyspark.sql import types as T

from polars_numba_spark import collect_fold, collect_scan
from polars_numba_spark.dtypes import normalize_spark_type, spark_type_to_numpy


def test_boolean_input(spark):
    df = spark.createDataFrame(
        [(True, 0), (False, 1), (True, 2)], "b boolean, ord long"
    )

    def count_true(acc, b):
        return acc + 1 if b else acc

    assert collect_fold(df, count_true, 0, column_names=["b"], order_by="ord") == 2


def test_small_int_widths(spark):
    df = spark.createDataFrame(
        [(1, 2, 3, 4, 0)],
        T.StructType(
            [
                T.StructField("a", T.ByteType()),
                T.StructField("b", T.ShortType()),
                T.StructField("c", T.IntegerType()),
                T.StructField("d", T.LongType()),
                T.StructField("ord", T.LongType()),
            ]
        ),
    )

    def add(acc, a, b, c, d):
        return acc + a + b + c + d

    assert collect_fold(df, add, 0, column_names=["a", "b", "c", "d"]) == 10


def test_timestamp_input(spark):
    """Timestamps arrive in the kernel as datetime64[us] — comparisons and
    passthrough work; the reference uses dates only as passthrough columns
    (`examples_fold.py:17`) but our kernels accept them as inputs."""
    rows = [
        (datetime(2024, 1, 1), 0),
        (datetime(2024, 6, 1), 1),
        (datetime(2023, 12, 1), 2),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, ord long")

    def latest(acc, ts):
        return ts if acc is None or ts > acc else acc

    # via scan (timestamp return dtype)
    out = collect_scan(
        df,
        lambda acc, ts: ts if ts > acc else acc,
        datetime(1970, 1, 1),
        "timestamp",
        column_names=["ts"],
        order_by="ord",
    )
    vals = [r["scan"] for r in out.orderBy("ord").collect()]
    assert vals == [datetime(2024, 1, 1), datetime(2024, 6, 1), datetime(2024, 6, 1)]


def test_float32_input_and_output(spark):
    df = spark.createDataFrame(
        [(1.5, 0), (2.5, 1)],
        T.StructType(
            [T.StructField("f", T.FloatType()), T.StructField("ord", T.LongType())]
        ),
    )

    def add(acc, f):
        return acc + f

    out = collect_scan(df, add, 0.0, T.FloatType, column_names=["f"], order_by="ord")
    assert [r["scan"] for r in out.orderBy("ord").collect()] == [1.5, 4.0]


def test_unsupported_types_rejected():
    for bad in (T.StringType(), T.ArrayType(T.LongType()), T.MapType(T.StringType(), T.LongType()), T.DecimalType(10, 2)):
        with pytest.raises(TypeError, match="not supported"):
            spark_type_to_numpy(bad)


def test_normalize_accepts_instance_class_and_string():
    assert normalize_spark_type(T.IntegerType()) == T.IntegerType()
    assert normalize_spark_type(T.IntegerType) == T.IntegerType()
    assert normalize_spark_type("int") == T.IntegerType()
    assert normalize_spark_type("array<double>") == T.ArrayType(T.DoubleType())
    with pytest.raises(TypeError):
        normalize_spark_type(42)


def test_scan_over_nullable_date_column(spark):
    """DateType scan input with nulls: the zero-fill path must not crash
    (regression: int64→date32 Arrow cast is unsupported)."""
    from datetime import date

    df = spark.createDataFrame(
        [(date(2024, 1, 2), 0), (None, 1), (date(2024, 1, 5), 2)],
        "d date, ord long",
    )

    def latest(acc, d):
        return d if d > acc else acc

    out = collect_scan(
        df, latest, date(1970, 1, 1), "date", column_names=["d"], order_by="ord"
    )
    vals = [r["scan"] for r in out.orderBy("ord").collect()]
    assert vals == [date(2024, 1, 2), None, date(2024, 1, 5)]
