"""CDC operators: last-write-wins snapshot, merge/upsert, SCD2 history."""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_numba_spark.operators.cdc import (
    latest_snapshot,
    merge_upsert,
    scd2_history,
)


def test_latest_snapshot_picks_highest_seq_and_applies_deletes(spark):
    rows = [
        (1, 1, "a", "U"),
        (1, 3, "c", "U"),
        (1, 2, "b", "U"),
        (2, 1, "x", "U"),
        (2, 2, None, "D"),  # delete wins — key 2 vanishes
        (3, 5, "z", "D"),
        (3, 7, "z2", "U"),  # later upsert resurrects key 3
    ]
    df = spark.createDataFrame(rows, "k long, seq long, v string, op string")
    got = {
        r["k"]: r["v"]
        for r in latest_snapshot(df, "k", "seq", op_col="op").collect()
    }
    assert got == {1: "c", 3: "z2"}


def test_latest_snapshot_tiebreak_makes_ordering_total(spark):
    rows = [(1, 5, 10, "lo"), (1, 5, 20, "hi")]
    df = spark.createDataFrame(rows, "k long, seq long, tb long, v string")
    got = latest_snapshot(df, "k", "seq", tiebreak="tb").collect()
    assert [(r["k"], r["v"]) for r in got] == [(1, "hi")]


def test_merge_upsert_insert_update_delete(spark):
    base = spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three")], "k long, v string"
    )
    changes = spark.createDataFrame(
        [
            (2, "TWO", 1, "U"),    # update
            (4, "four", 1, "U"),   # insert (key absent from base)
            (3, None, 1, "D"),     # delete
        ],
        "k long, v string, seq long, op string",
    )
    got = {
        r["k"]: r["v"]
        for r in merge_upsert(base, changes, "k", "seq", op_col="op").collect()
    }
    # untouched base row kept (NULL op is not a delete), update applied,
    # insert present, deleted key gone
    assert got == {1: "one", 2: "TWO", 4: "four"}


def test_merge_upsert_later_delete_beats_earlier_update(spark):
    base = spark.createDataFrame([(1, "one")], "k long, v string")
    changes = spark.createDataFrame(
        [(1, "ONE", 1, "U"), (1, None, 2, "D")],
        "k long, v string, seq long, op string",
    )
    assert merge_upsert(base, changes, "k", "seq", op_col="op").count() == 0


def test_scd2_history_intervals_chain_and_mark_current(spark):
    rows = [(1, 10, "a"), (1, 20, "b"), (1, 30, "c"), (2, 5, "x")]
    df = spark.createDataFrame(rows, "k long, seq long, v string")
    got = {
        (r["k"], r["v"]): (r["valid_from"], r["valid_to"], r["is_current"])
        for r in scd2_history(df, "k", "seq").collect()
    }
    assert got == {
        (1, "a"): (10, 20, False),
        (1, "b"): (20, 30, False),
        (1, "c"): (30, None, True),
        (2, "x"): (5, None, True),
    }
