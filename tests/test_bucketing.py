"""Bucketed-join tests: the no-shuffle property is the feature."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_numba_spark import plans
from polars_numba_spark.sources import load_table
from polars_numba_spark.sources.bucketing import bucketed_join_ready

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    orders = load_table(spark, "orders", SF)
    lineitem = load_table(spark, "lineitem", SF).withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    yield bucketed_join_ready(spark, orders, lineitem, "o_orderkey", num_buckets=4)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_join_has_no_shuffle(spark, bucketed_pair):
    left, right = bucketed_pair
    joined = left.join(right, "o_orderkey")
    assert plans.count_exchanges(joined) == 0, plans.explain_string(joined)


def test_bucketed_join_correct(spark, bucketed_pair):
    left, right = bucketed_pair
    joined = left.join(right, "o_orderkey")
    plain = load_table(spark, "orders", SF).join(
        load_table(spark, "lineitem", SF),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    assert joined.count() == plain.count()


def test_bucketed_aggregation_has_no_shuffle(spark, bucketed_pair):
    left, _ = bucketed_pair
    agg = left.groupBy("o_orderkey").agg(F.sum("o_totalprice").alias("s"))
    assert plans.count_exchanges(agg) == 0, plans.explain_string(agg)
