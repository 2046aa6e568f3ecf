"""Scan examples — the reference's scan walkthrough
(`/root/reference/examples_scan.py`): running max, running balances, and a
multi-output purchase-order scan."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from pyspark.sql import types as T

from polars_numba_spark import SizedArray, assoc_scan, collect_scan, get_spark, grouped_scan


def main() -> None:
    spark = get_spark(app_name="example-scan")
    spark.sparkContext.setLogLevel("ERROR")

    # Running max (ref examples_scan.py:12-25) — kernel and window fast path
    prices = [20, 19, 21, 22, 23, 21, 20, 24, 25]
    df = spark.createDataFrame([(p, i) for i, p in enumerate(prices)], "price long, ord long")

    def running_max(acc, p):
        return p if p > acc else acc

    kernel = collect_scan(df, running_max, 0, "long", column_names=["price"], order_by="ord")
    window = assoc_scan(df, "max", "price", order_by="ord")
    expected = [20, 20, 21, 22, 23, 23, 23, 24, 25]
    assert [r["scan"] for r in kernel.orderBy("ord").collect()] == expected
    assert [r["scan"] for r in window.orderBy("ord").collect()] == expected
    print("running max:", expected)

    # Per-user running balances (ref examples_scan.py:66-82)
    def cap(acc, limit, amt):
        new = acc + amt
        return acc if new > limit or new < 0 else new

    user_purchases = spark.createDataFrame(
        [("alice", 50.0, 0), ("alice", 900.0, 1), ("alice", 70.0, 2),
         ("alice", -400.0, 3), ("alice", 60.0, 4), ("bob", 17.0, 5), ("bob", 0.5, 6)],
        "user string, attempted_purchase double, ord long",
    )
    balances = grouped_scan(
        user_purchases, "user", cap, 0.0, "double",
        columns=["attempted_purchase"], order_by="ord", extra_args=(1000.0,),
    )
    alice = [r["scan"] for r in balances.where("user = 'alice'").orderBy("ord").collect()]
    assert alice == [50.0, 950.0, 950.0, 550.0, 610.0]
    print("alice balances:", alice)

    # Multi-output: (balance, units) with caps (ref examples_scan.py:91-142)
    orders = spark.createDataFrame(
        [(100.0, 20.0, 0), (800.0, 2.0, 1), (300.0, 5.0, 2), (0.0, 0.0, 3), (60.0, 1.0, 4)],
        "price double, units double, ord long",
    )

    def order_step(acc, max_price, max_units, price, units):
        bal, got = acc
        if bal + price > max_price or got + units > max_units:
            return acc
        return (bal + price, got + units)

    out = collect_scan(
        orders, order_step, (0.0, 0.0), SizedArray(T.DoubleType(), 2),
        extra_args=(1000.0, 25.0), column_names=["price", "units"], order_by="ord",
    )
    pairs = [tuple(r["scan"]) for r in out.orderBy("ord").collect()]
    assert pairs[-1] == (960.0, 23.0)
    print("final (balance, units):", pairs[-1])
    spark.stop()


if __name__ == "__main__":
    main()
