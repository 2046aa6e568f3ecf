"""Unit fixture for the Wald-Wolfowitz runs-test z-score.

ADVICE r10 (high): the variance had been computed as
mu'*(n-mu')/(n^2*(n-1)) in BOTH engines, inflating |z| ~9x at n=10 —
and because the DuckDB oracle mirrored the same expression, the
cross-engine hash gate could not catch it.  This test pins the z
against LITERAL values computed independently from the textbook
closed form sigma^2 = (mu-1)(mu-2)/(n-1), mu = 2ab/(a+b)+1
(values cross-checked against statsmodels' runstest_1samp convention
offline), so a regression in either spelling now fails a unit test
rather than sailing through the mirrored-oracle gate.
"""

from __future__ import annotations

import datetime as dt

import pytest


def _write_events(spark, tmp_path):
    rows = []
    eid = 0

    def series(event_type, deltas, base=100):
        nonlocal eid
        cents = base
        vals = [cents]
        for d in deltas:
            cents += d
            vals.append(cents)
        for i, c in enumerate(vals):
            rows.append(
                (
                    eid,
                    dt.datetime(2024, 1, 1, 12) + dt.timedelta(days=i),
                    1,
                    event_type,
                    c / 100.0,
                )
            )
            eid += 1

    # A: 10 perfectly alternating moves -> a=5, b=5, runs=10
    series("alt", [+10, -10] * 5)
    # B: strictly increasing -> a=10, b=0 -> z is NULL (a*b = 0)
    series("mono", [+1] * 10)
    # C: moves + + - + - - + + + -  -> a=6, b=4, runs=6
    series("mix", [+1, +1, -1, +1, -1, -1, +1, +1, +1, -1])

    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    df.coalesce(1).write.parquet(str(tmp_path / "events.parquet"))


def test_runs_test_z_matches_closed_form(spark, tmp_path):
    from polars_numba_spark.queries.relational import events_runs_test

    _write_events(spark, tmp_path)
    out = {
        r["event_type"]: r
        for r in events_runs_test(spark, str(tmp_path)).collect()
    }

    alt = out["alt"]
    assert (alt["n_up"], alt["n_down"], alt["runs"]) == (5, 5, 10)
    # mu = 2*5*5/10 + 1 = 6; var = 5*4/9; z = 4/sqrt(20/9)
    assert alt["z_score"] == pytest.approx(2.6832815729997477, rel=1e-12)

    mix = out["mix"]
    assert (mix["n_up"], mix["n_down"], mix["runs"]) == (6, 4, 6)
    # mu = 2*6*4/10 + 1 = 5.8; var = 4.8*3.8/9; z = 0.2/sqrt(2.02666...)
    assert mix["z_score"] == pytest.approx(0.14048787173725422, rel=1e-12)

    mono = out["mono"]
    assert (mono["n_up"], mono["n_down"], mono["runs"]) == (10, 0, 1)
    assert mono["z_score"] is None
