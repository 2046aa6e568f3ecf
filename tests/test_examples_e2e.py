"""End-to-end golden tests: the reference's executable examples with the
exact same literal inputs and expected outputs (FIXTURES.md F1/F2/F9;
ref `examples_fold.py`, `examples_scan.py`, `examples_collect_*.py`).
"""

from __future__ import annotations

from polars_numba_spark import assoc_scan, collect_fold, collect_scan


def test_freezing_streak_fold(spark):
    """F1: longest run of max_temp <= 0 over [2,0,-2,3,-2,-1,-4,1,-1] == 3
    (ref `examples_fold.py:15-40`)."""
    temps = [2, 0, -2, 3, -2, -1, -4, 1, -1]
    df = spark.createDataFrame(
        [(t, i) for i, t in enumerate(temps)], "max_temp long, ord long"
    )

    def streak(acc, t):
        current, best = acc
        current = current + 1 if t <= 0 else 0
        return (current, best if best > current else current)

    assert collect_fold(
        df, streak, (0, 0), column_names=["max_temp"], order_by="ord"
    ) == (1, 3)


def test_credit_card_fold_and_scan(spark):
    """F2: cap-1000 balance over [50,900,70,-400,60] → fold 610,
    scan [50,950,950,550,610] (ref `examples_fold.py:75`, `examples_scan.py:60`)."""
    df = spark.createDataFrame(
        [(50.0, 0), (900.0, 1), (70.0, 2), (-400.0, 3), (60.0, 4)],
        "amt double, ord long",
    )

    def cap(acc, amt):
        new = acc + amt
        if new > 1000.0 or new < 0.0:
            return acc
        return new

    assert collect_fold(df, cap, 0.0, column_names=["amt"], order_by="ord") == 610.0
    out = collect_scan(df, cap, 0.0, "double", column_names=["amt"], order_by="ord")
    assert [r["scan"] for r in out.orderBy("ord").collect()] == [
        50.0, 950.0, 950.0, 550.0, 610.0,
    ]


def test_running_max_scan(spark):
    """F9: running max of [20,19,21,22,23,21,20,24,25] →
    [20,20,21,22,23,23,23,24,25] (ref `examples_scan.py:12-25`), via both the
    kernel and the declarative window fast path."""
    prices = [20, 19, 21, 22, 23, 21, 20, 24, 25]
    expected = [20, 20, 21, 22, 23, 23, 23, 24, 25]
    df = spark.createDataFrame([(p, i) for i, p in enumerate(prices)], "price long, ord long")

    def step(acc, p):
        return p if p > acc else acc

    kernel = collect_scan(df, step, 0, "long", column_names=["price"], order_by="ord")
    assert [r["scan"] for r in kernel.orderBy("ord").collect()] == expected

    window = assoc_scan(df, "max", "price", order_by="ord")
    assert [r["scan"] for r in window.orderBy("ord").collect()] == expected
