"""Round-6 surface tour: CDC (merge/upsert + SCD2), exact heavy hitters
over a bounded Misra-Gries candidate pass, and bounded-state histogram
quantiles — the lakehouse-maintenance and frequency/quantile-sketch
additions, over the sf0.001 tables."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from polars_numba_spark import get_spark
from polars_numba_spark.operators.cdc import (
    latest_snapshot,
    merge_upsert,
    scd2_history,
)
from polars_numba_spark.operators.sketch import heavy_hitters, histogram_quantiles
from polars_numba_spark.operators.text import tokens
from polars_numba_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(app_name="example-cdc-sketch")
    spark.sparkContext.setLogLevel("ERROR")

    # --- CDC: events as a changelog of per-user state --------------------
    events = load_table(spark, "events", SF)
    snap = latest_snapshot(
        events, keys="user_id", seq_col="ts", tiebreak="event_id"
    )
    print("latest event per user (5 rows):")
    snap.select("user_id", "event_type", "ts").orderBy("user_id").show(5)

    # MERGE INTO without a table format: update + delete waves over orders
    orders = load_table(spark, "orders", SF)
    base = orders.select("o_orderkey", "o_orderstatus")
    upd = (
        orders.where(F.col("o_orderkey") % 10 == 0)
        .select("o_orderkey", F.lit("X").alias("o_orderstatus"))
        .withColumn("__seq", F.lit(1))
        .withColumn("__op", F.lit("U"))
    )
    dels = (
        orders.where(F.col("o_orderkey") % 97 == 0)
        .select("o_orderkey", F.lit(None).cast("string").alias("o_orderstatus"))
        .withColumn("__seq", F.lit(2))
        .withColumn("__op", F.lit("D"))
    )
    merged = merge_upsert(
        base, upd.unionByName(dels), keys="o_orderkey", seq_col="__seq",
        op_col="__op",
    )
    print(
        "merge_upsert: base", base.count(), "-> snapshot", merged.count(),
        "(deletes removed, updates applied)",
    )

    # SCD2: validity intervals of a user's signup/purchase states
    hist = scd2_history(
        events.where(F.col("event_type").isin("signup", "purchase")),
        keys="user_id", seq_col="ts", tiebreak="event_id",
    )
    print("SCD2 current-state rows:", hist.where("is_current").count())

    # --- Heavy hitters: stopword discovery at bounded shuffle cost -------
    docs = load_table(spark, "documents", SF)
    occ = docs.select("lang", F.explode(tokens("text")).alias("token"))
    hh = heavy_hitters(occ, "token", "lang", k=40)
    print("per-language heavy tokens (>1/40 share):")
    hh.orderBy(F.desc("share")).show(5)

    # --- Histogram quantiles: deterministic bounded-state percentiles ----
    hq = histogram_quantiles(
        orders, "o_totalprice", "o_orderpriority",
        probs=(0.5, 0.9, 0.99), lo=1000.0, hi=500000.0, n_bins=256,
    )
    print("p50/p90/p99 of order price per priority (256-bin histogram):")
    hq.orderBy("o_orderpriority", "prob").show(15)

    spark.stop()


if __name__ == "__main__":
    main()
