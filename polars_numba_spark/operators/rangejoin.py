"""Range (interval) join: match rows by value-in-interval predicates.

Spark plans a bare ``l.t BETWEEN r.lo AND r.hi`` join as a broadcast
nested loop or cartesian product — O(|L|·|R|) comparisons, a scale
disaster. The standard fix is **bucketization**: quantize the range
dimension into fixed-width buckets, explode each right interval to the
buckets it overlaps, put each left point in its bucket, equi-join on
(keys..., bucket) — a plain hash join whose fan-out is
interval_width / bucket_width — then apply the exact predicate.

A point lands in exactly one bucket, so no post-join dedup is needed.
Bucket width trades join fan-out (wide buckets → more false candidates)
against explode factor (narrow buckets → more right-side rows); pick it
near the median interval width.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_numba_spark.operators._prep import as_list


def interval_join(
    left: DataFrame,
    right: DataFrame,
    point: str,
    lower: str,
    upper: str,
    bucket_width: int,
    by: str | Sequence[str] = (),
    how: str = "inner",
    closed: str = "both",
) -> DataFrame:
    """Join left points to right intervals: ``lower <= point <= upper``
    (``closed='both'``; 'left'/'right'/'neither' adjust the endpoints).

    ``point``/``lower``/``upper`` are numeric (epoch-cast timestamps work:
    ``F.unix_timestamp``). Output: all left columns + all right columns.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            "interval_join supports how='inner'/'left' only: the right side "
            "is exploded per bucket, so right/full outer would emit one "
            "duplicate row per overlapped bucket for unmatched intervals"
        )
    keys = as_list(by)
    lo_op = {"both": "<=", "left": "<=", "right": "<", "neither": "<"}[closed]
    hi_op = {"both": "<=", "left": "<", "right": "<=", "neither": "<"}[closed]

    l_b = left.withColumn("__bucket", (F.col(point) / bucket_width).cast("long"))
    r_b = right.withColumn(
        "__buckets",
        F.sequence(
            (F.col(lower) / bucket_width).cast("long"),
            (F.col(upper) / bucket_width).cast("long"),
        ),
    ).withColumn("__bucket", F.explode("__buckets")).drop("__buckets")

    cond = F.col(f"l.__bucket") == F.col("r.__bucket")
    for k in keys:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    exact = F.expr(f"r.{lower} {lo_op} l.{point}") & F.expr(
        f"l.{point} {hi_op} r.{upper}"
    )
    joined = l_b.alias("l").join(r_b.alias("r"), cond & exact, how)
    out_cols = [F.col(f"l.{c}") for c in left.columns] + [
        F.col(f"r.{c}").alias(c if c not in left.columns else f"{c}_r")
        for c in right.columns
        if c not in keys
    ]
    return joined.select(*out_cols)
