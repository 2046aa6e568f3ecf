"""As-of join unit tests (backward/inclusive semantics, null when no match)."""

from __future__ import annotations

from polars_numba_spark.operators.asof import asof_join


def test_asof_basic(spark):
    left = spark.createDataFrame(
        [("u1", 5, "l1"), ("u1", 10, "l2"), ("u1", 20, "l3"), ("u2", 7, "l4")],
        "k string, t long, lval string",
    )
    right = spark.createDataFrame(
        [("u1", 4, "r1"), ("u1", 10, "r2"), ("u1", 15, "r3"), ("u3", 1, "rX")],
        "k string, t long, rval string",
    )
    out = asof_join(left, right, on="t", by="k", value_cols=["rval"])
    got = {(r["k"], r["t"]): r["rval_asof"] for r in out.collect()}
    assert got == {
        ("u1", 5): "r1",     # latest right ≤ 5 is t=4
        ("u1", 10): "r2",    # inclusive: right at t=10 matches
        ("u1", 20): "r3",
        ("u2", 7): None,     # no right rows for u2
    }


def test_asof_multiple_value_columns(spark):
    left = spark.createDataFrame([(60, 100)], "t long, x long")
    right = spark.createDataFrame([(50, 7, 8.5)], "t long, a long, b double")
    out = asof_join(left, right, on="t", value_cols=["a", "b"]).collect()[0]
    assert (out["a_asof"], out["b_asof"]) == (7, 8.5)
    assert out["x"] == 100


def test_asof_null_right_value_is_carried_not_skipped(spark):
    """A right row whose VALUE is null is still the as-of match (DuckDB ASOF
    semantics) — naive last(value, ignorenulls) would wrongly carry the older
    non-null value; with two value columns it could even blend rows."""
    left = spark.createDataFrame([("u", 3, "L")], "k string, t long, tag string")
    right = spark.createDataFrame(
        [("u", 1, 5, 100), ("u", 2, None, 7)], "k string, t long, v integer, w integer"
    )
    out = asof_join(left, right, on="t", by="k", value_cols=["v", "w"]).collect()[0]
    assert out["v_asof"] is None   # from the t=2 row, NOT 5 from t=1
    assert out["w_asof"] == 7      # same row — no cross-row blending


def test_asof_null_time_right_rows_never_match(spark):
    """A right row with a NULL time is not a match (regression: nulls-first
    sort made it the carried payload for every left row)."""
    left = spark.createDataFrame([("u", 5)], "k string, t long")
    right = spark.createDataFrame([("u", None, 99.0)], "k string, t long, v double")
    out = asof_join(left, right, on="t", by="k", value_cols=["v"]).collect()[0]
    assert out["v_asof"] is None


def test_asof_matches_pandas_merge_asof_property(spark):
    """Differential vs a third independent implementation: pandas
    merge_asof(direction='backward') on randomized inputs."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    for trial in range(3):
        left_pd = pd.DataFrame({
            "k": rng.choice(["a", "b"], 15),
            "t": rng.randint(0, 50, 15).astype("int64"),
        }).sort_values("t").reset_index(drop=True)
        left_pd["lid"] = range(len(left_pd))
        right_pd = pd.DataFrame({
            "k": rng.choice(["a", "b"], 10),
            "t": rng.randint(0, 50, 10).astype("int64"),
            "v": rng.randint(0, 1000, 10).astype("int64"),
        }).sort_values("t").reset_index(drop=True)
        # merge_asof requires unique-ish ordering; drop duplicate (k,t) on the
        # right to make the expected match unambiguous
        right_pd = right_pd.drop_duplicates(["k", "t"], keep="last").sort_values("t")

        expected = pd.merge_asof(
            left_pd, right_pd, on="t", by="k", direction="backward"
        ).set_index("lid")["v"].to_dict()

        left = spark.createDataFrame(left_pd)
        right = spark.createDataFrame(right_pd)
        got = {
            r["lid"]: r["v_asof"]
            for r in asof_join(left, right, on="t", by="k", value_cols=["v"]).collect()
        }
        for lid, exp_v in expected.items():
            g = got[lid]
            if pd.isna(exp_v):
                assert g is None, (trial, lid)
            else:
                assert g == exp_v, (trial, lid)
