"""Multi-row-group testdata posture (SURVEY §9 open item / r5 verdict #7).

The driver-generated sf parquet files are SINGLE-row-group (verified:
``pq.ParquetFile(...).metadata.num_row_groups == 1``). Parquet splits at
row-group granularity — Spark plans byte-range splits but each row group
is consumed whole by the task whose range contains its midpoint — so a
one-row-group fact file makes every scan a ONE-TASK scan no matter what
``spark.sql.files.maxPartitionBytes`` says. On a 1000-executor cluster
against 100 TB this is the difference between a parallel scan and a
single straggler reading everything.

This harness makes that concrete and measures the fix:

1. build a 10x lineitem (reusing tools/scale_soak.py's replicated build
   if present) and materialize it two ways:
     * ``single/``  — coalesce(1), one file, default 128 MB row groups
       (the sf-file shape, scaled);
     * ``chunked/`` — repartition(32), 32 files (the staging shape a
       real pipeline would write: files ≈ maxPartitionBytes so every
       core gets a split).
2. run the q1 pricing-summary aggregation (scan-heavy: 6 M rows, 7
   aggregates) over each and record wall-clock + the number of scan
   tasks Spark actually launched (from the stage's task count).

Emits one JSON line; the headline numbers live in SCALE.md.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def q1_over(df: DataFrame) -> DataFrame:
    return (
        df.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("sum_disc_price"),
            F.avg("l_quantity").alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def timed(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 2)


def scan_tasks(spark: SparkSession, path: str) -> int:
    """Number of partitions Spark plans for a bare scan of `path` —
    exactly the task count of the scan stage."""
    return spark.read.parquet(path).rdd.getNumPartitions()


def main() -> int:
    from polars_numba_spark import get_spark
    import pyarrow.parquet as pq

    spark = get_spark(app_name="rowgroup-demo")
    spark.sparkContext.setLogLevel("ERROR")

    out = Path("/root/repo/.scale/rowgroup")
    single = str(out / "single")
    chunked = str(out / "chunked")

    big = "/root/repo/.scale/x10/lineitem"
    if Path(big).exists():
        src = spark.read.parquet(big)
    else:
        one = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
        src = one
        for i in range(1, 10):
            src = src.unionAll(one)

    if not Path(single).exists():
        src.coalesce(1).write.mode("overwrite").parquet(single)
    if not Path(chunked).exists():
        src.repartition(32).write.mode("overwrite").parquet(chunked)

    sfile = next(Path(single).glob("*.parquet"))
    rg_single = pq.ParquetFile(sfile).metadata.num_row_groups

    res = {
        "rows": src.count(),
        "single_row_groups": rg_single,
        "single_scan_tasks": scan_tasks(spark, single),
        "chunked_files": len(list(Path(chunked).glob("*.parquet"))),
        "chunked_scan_tasks": scan_tasks(spark, chunked),
        "q1_single_sec": timed(
            lambda: q1_over(spark.read.parquet(single)).collect()
        ),
        "q1_chunked_sec": timed(
            lambda: q1_over(spark.read.parquet(chunked)).collect()
        ),
    }
    res["speedup"] = round(res["q1_single_sec"] / res["q1_chunked_sec"], 2)
    print("ROWGROUP " + json.dumps(res), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
