"""Deterministic cardinality sketches.

Spark's built-in ``approx_count_distinct`` is HyperLogLog++ — fast and
mergeable, but its estimates are engine-specific (no cross-engine oracle
possible; the catalog's ``distinct_users_sketch`` query is therefore its
own accuracy report). This module adds the classic K-Minimum-Values
sketch (Bar-Yossef et al. 2002) built ENTIRELY from deterministic
engine-portable pieces — md5-derived 60-bit hashes, a per-group top-k,
and the ``(k-1) / U_(k)`` estimator — so the whole sketch, estimate
included, reproduces bit-for-bit in any engine with md5 and is fully
DuckDB-oracled (``distinct_users_kmv``).

Scale shape: the per-group k smallest distinct hashes come from a
row_number window over the distinct (group, hash) pairs — the same
group-keyed shuffle an exact COUNT(DISTINCT) pays, with the window state
bounded by the group's distinct count. KMV's real scale win (a bounded
k-item accumulator, mergeable map-side) needs a custom aggregate
Spark-side SQL cannot express; at that point use HLL++
(``approx_count_distinct``) — this operator's niche is deterministic,
cross-engine-verifiable estimation.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_numba_spark.operators._prep import as_list
from polars_numba_spark.operators.dedup import md5_long

# md5_long yields 60-bit hashes: uniform on [0, 2^60)
_HASH_SPACE = float(1 << 60)


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    by: str | Sequence[str],
    k: int = 64,
) -> DataFrame:
    """Per-group KMV distinct-count estimate:
    ``(group cols, kmv_estimate)``.

    The k-th smallest of the distinct md5-hash values estimates the
    cardinality as ``(k-1) * 2^60 / h_k`` (uniform order statistics); a
    group with fewer than k distinct values reports its exact count (the
    sketch holds every value). NULL values are excluded up front —
    ``COUNT(DISTINCT)`` semantics, and necessary for engine parity: a
    null hash would sort NULLS-FIRST into Spark's top-k but NULLS-LAST in
    other engines, silently corrupting the estimate. Deterministic: same
    input ⇒ same estimate, in every engine with md5.
    """
    keys = as_list(by)
    hashed = (
        df.where(F.col(value_col).isNotNull())
        .select(*keys, F.col(value_col).cast("string").alias("__v"))
        .distinct()
        .select(*keys, md5_long(F.col("__v")).alias("__h"))
    )
    w = Window.partitionBy(*keys).orderBy("__h")
    topk = hashed.withColumn("__rn", F.row_number().over(w)).where(
        F.col("__rn") <= k
    )
    return topk.groupBy(*keys).agg(
        F.max("__h").alias("__hk"), F.count(F.lit(1)).alias("__nk")
    ).select(
        *keys,
        F.when(F.col("__nk") < k, F.col("__nk").cast("double"))
        .otherwise(
            F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / F.col("__hk").cast("double")
        )
        .alias("kmv_estimate"),
    )
