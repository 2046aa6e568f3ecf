"""Under-split-scan parallelization (r14, sources/tables.py).

A table whose input fits in fewer splits than cores serializes every
scan-side computation onto that many tasks (the SCALE.md round-13
split-sizing lesson, guide §2.5). ``load_table`` round-robin-repartitions
exactly those inputs to the core count; anything that already fills the
cores keeps its native splits (the production branch — no extra exchange
at scale).
"""

from __future__ import annotations

import os

from polars_numba_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_tiny_input_is_repartitioned_to_core_count(spark):
    df = load_table(spark, "documents", SF)
    assert df.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_kill_switch_keeps_native_splits(spark):
    os.environ["PNS_SCAN_PARALLELIZE"] = "0"
    try:
        df = load_table(spark, "documents", SF)
    finally:
        os.environ.pop("PNS_SCAN_PARALLELIZE", None)
    assert df.rdd.getNumPartitions() == 1  # single small file = one split


def test_well_split_input_keeps_native_scan(spark):
    """The no-op branch: when the estimated split count reaches the core
    count (any production-scale table), no repartition is added. Simulated
    by shrinking maxPartitionBytes so the same file counts as many
    splits."""
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1k")
    try:
        df = load_table(spark, "documents", SF)
        # native parquet splitting applies — partition count is whatever
        # the scan planner chooses, NOT the round-robin core count, and
        # the plan carries no Repartition node
        assert "Repartition" not in df._jdf.queryExecution().logical().toString()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_results_identical_both_branches(spark):
    os.environ["PNS_SCAN_PARALLELIZE"] = "0"
    try:
        base = load_table(spark, "documents", SF)
        rows_off = sorted(
            (r.doc_id, r.text) for r in base.select("doc_id", "text").collect()
        )
    finally:
        os.environ.pop("PNS_SCAN_PARALLELIZE", None)
    rows_on = sorted(
        (r.doc_id, r.text)
        for r in load_table(spark, "documents", SF).select("doc_id", "text").collect()
    )
    assert rows_off == rows_on
