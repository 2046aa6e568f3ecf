"""Grouped + global fold examples — the reference's fold walkthrough
(`/root/reference/examples_fold.py`) re-expressed on Spark, same literal
inputs and asserted outputs."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from polars_numba_spark import collect_fold, get_spark, grouped_fold


def main() -> None:
    spark = get_spark(app_name="example-fold")
    spark.sparkContext.setLogLevel("ERROR")

    # Longest freezing streak (ref examples_fold.py:15-40)
    temps = [2, 0, -2, 3, -2, -1, -4, 1, -1]
    weather = spark.createDataFrame(
        [(t, i) for i, t in enumerate(temps)], "max_temp long, ord long"
    )

    def streak(acc, t):
        current, best = acc
        current = current + 1 if t <= 0 else 0
        return (current, best if best > current else current)

    _, longest = collect_fold(weather, streak, (0, 0), column_names=["max_temp"], order_by="ord")
    assert longest == 3
    print("longest freezing streak:", longest)

    # Credit-card cap fold, global (ref examples_fold.py:47-75)
    purchases = spark.createDataFrame(
        [(50.0, 0), (900.0, 1), (70.0, 2), (-400.0, 3), (60.0, 4)],
        "attempted_purchase double, ord long",
    )

    def cap(acc, limit, amt):
        new = acc + amt
        return acc if new > limit or new < 0 else new

    balance = collect_fold(
        purchases, cap, 0.0, extra_args=(1000.0,),
        column_names=["attempted_purchase"], order_by="ord",
    )
    assert balance == 610.0
    print("final balance:", balance)

    # Per-user grouped fold (ref examples_fold.py:81-97)
    user_purchases = spark.createDataFrame(
        [("alice", 50.0, 0), ("alice", 900.0, 1), ("alice", 70.0, 2),
         ("alice", -400.0, 3), ("alice", 60.0, 4), ("bob", 17.0, 5), ("bob", 0.5, 6)],
        "user string, attempted_purchase double, ord long",
    )
    balances = grouped_fold(
        user_purchases, "user", cap, 0.0, "double",
        columns=["attempted_purchase"], order_by="ord", extra_args=(1000.0,),
    )
    got = dict(sorted((r["user"], r["fold"]) for r in balances.collect()))
    assert got == {"alice": 610.0, "bob": 17.5}
    print("per-user balances:", got)

    # Native aggregates + kernel folds in ONE grouped result — the Spark
    # spelling of the reference's fold-Expr-inside-group_by().agg(...)
    # (ref examples_fold.py:87-97). Folds sharing an ordering are fused
    # into a single shuffle+sort+kernel pass.
    from pyspark.sql import functions as F

    from polars_numba_spark import agg_with_fold

    def total(acc, amt):
        return acc + amt

    mixed = agg_with_fold(
        user_purchases,
        "user",
        native_aggs={"n_purchases": F.count(F.lit(1)),
                     "max_attempt": F.max("attempted_purchase")},
        folds={
            "balance": dict(function=cap, initial_accumulator=0.0,
                            return_dtype="double",
                            columns=["attempted_purchase"],
                            order_by="ord", extra_args=(1000.0,)),
            "attempted_total": dict(function=total, initial_accumulator=0.0,
                                    return_dtype="double",
                                    columns=["attempted_purchase"],
                                    order_by="ord"),
        },
    )
    rows = {r["user"]: r for r in mixed.collect()}
    assert rows["alice"]["n_purchases"] == 5 and rows["alice"]["balance"] == 610.0
    assert rows["alice"]["attempted_total"] == 680.0
    assert rows["bob"]["max_attempt"] == 17.0 and rows["bob"]["balance"] == 17.5
    print("mixed aggregates:", {u: (r["n_purchases"], r["balance"]) for u, r in rows.items()})
    spark.stop()


if __name__ == "__main__":
    main()
