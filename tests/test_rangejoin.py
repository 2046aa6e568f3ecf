"""Interval-join unit tests: exact semantics + no-nested-loop plan."""

from __future__ import annotations

from polars_numba_spark import plans
from polars_numba_spark.operators.rangejoin import interval_join


def test_interval_join_golden(spark):
    points = spark.createDataFrame([(1, 5), (2, 10), (3, 25)], "pid long, t long")
    intervals = spark.createDataFrame(
        [(100, 0, 9), (200, 10, 19), (300, 5, 30)], "iid long, lo long, hi long"
    )
    out = interval_join(points, intervals, "t", "lo", "hi", bucket_width=10)
    got = sorted((r["pid"], r["iid"]) for r in out.collect())
    assert got == [(1, 100), (1, 300), (2, 200), (2, 300), (3, 300)]


def test_interval_join_closed_variants(spark):
    points = spark.createDataFrame([(1, 10)], "pid long, t long")
    intervals = spark.createDataFrame([(7, 10, 20), (8, 0, 10)], "iid long, lo long, hi long")
    both = {r["iid"] for r in interval_join(points, intervals, "t", "lo", "hi", 10).collect()}
    assert both == {7, 8}
    neither = {
        r["iid"]
        for r in interval_join(points, intervals, "t", "lo", "hi", 10, closed="neither").collect()
    }
    assert neither == set()


def test_interval_join_with_keys(spark):
    points = spark.createDataFrame([("a", 1, 5), ("b", 2, 5)], "k string, pid long, t long")
    intervals = spark.createDataFrame([("a", 9, 0, 10)], "k string, iid long, lo long, hi long")
    out = interval_join(points, intervals, "t", "lo", "hi", 10, by="k").collect()
    assert [(r["pid"], r["iid"]) for r in out] == [(1, 9)]


def test_interval_join_avoids_nested_loop(spark):
    points = spark.createDataFrame([(1, 5)], "pid long, t long")
    intervals = spark.createDataFrame([(9, 0, 10)], "iid long, lo long, hi long")
    out = interval_join(points, intervals, "t", "lo", "hi", 10)
    text = plans.explain_string(out)
    assert "BroadcastNestedLoopJoin" not in text
    assert "CartesianProduct" not in text


def test_interval_join_right_keeps_unmatched_intervals(spark):
    points = spark.createDataFrame([(1, 5)], "pid long, t long")
    intervals = spark.createDataFrame(
        [(100, 0, 9), (200, 40, 60)], "iid long, lo long, hi long"
    )
    out = interval_join(
        points, intervals, "t", "lo", "hi", bucket_width=10,
        how="right", right_keys=["iid"],
    ).collect()
    got = sorted((r["iid"], r["pid"]) for r in out)
    # interval 200 overlaps 3 buckets but must surface exactly ONCE, unmatched
    assert got == [(100, 1), (200, None)]


def test_interval_join_right_requires_keys(spark):
    points = spark.createDataFrame([(1, 5)], "pid long, t long")
    intervals = spark.createDataFrame([(9, 0, 10)], "iid long, lo long, hi long")
    import pytest

    with pytest.raises(ValueError, match="right_keys"):
        interval_join(points, intervals, "t", "lo", "hi", 10, how="right")


def test_interval_join_right_with_by_keys_preserves_key_values(spark):
    points = spark.createDataFrame([("u1", 1, 5)], "k string, pid long, t long")
    intervals = spark.createDataFrame(
        [("u1", 100, 0, 9), ("u2", 200, 0, 9)], "k string, iid long, lo long, hi long"
    )
    out = interval_join(
        points, intervals, "t", "lo", "hi", bucket_width=10,
        by="k", how="right", right_keys=["iid"],
    ).collect()
    got = sorted((r["k"], r["iid"], r["pid"]) for r in out)
    # u2's unmatched interval must keep its key value, not come back NULL
    assert got == [("u1", 100, 1), ("u2", 200, None)]
