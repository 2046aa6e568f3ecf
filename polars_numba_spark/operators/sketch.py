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

Scale shape (bounded-state, round 6): the sketch is computed as a real
two-level aggregate. A ``mapInPandas`` partial keeps, per input
partition, only each group's k smallest DISTINCT hashes (bounded
accumulator: ≤k longs per group per partition, exactly the KMV merge
property — any global top-k element is a top-k element of its own
partition). The shuffle therefore carries at most ``k × n_partitions``
hashes per group instead of every distinct value; the JVM-side merge
(``collect_set → array_sort → slice``) re-derives the global k smallest
distinct hashes and the estimator reads the k-th order statistic off
that array. Same estimate as an unbounded computation — pinned by tests
and by the unchanged DuckDB oracle — at a shuffle cost that no longer
matches exact COUNT(DISTINCT). The streaming face
(``streaming/stateful.py::streaming_kmv_distinct``) holds the same
bounded ≤k-longs state per group across micro-batches.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_numba_spark.operators._prep import as_list
from polars_numba_spark.operators.dedup import md5_long

# md5_long yields 60-bit hashes: uniform on [0, 2^60)
_HASH_SPACE = float(1 << 60)


def _partial_topk_fn(keys: list[str], k: int):
    """Per-partition bounded partial: emit each group's k smallest
    distinct ``__h`` seen in this partition (≤k rows per group)."""

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # group tuple -> ascending np.ndarray of ≤k distinct hashes
        state: dict[tuple, np.ndarray] = {}
        template: pd.DataFrame | None = None
        for pdf in batches:
            if template is None:
                template = pdf.iloc[:0]
            if len(pdf) == 0:
                continue
            for gkey, sub in pdf.groupby(keys, sort=False, dropna=False):
                if not isinstance(gkey, tuple):
                    gkey = (gkey,)
                vals = sub["__h"].to_numpy(dtype=np.int64)
                prev = state.get(gkey)
                merged = (
                    np.unique(vals)
                    if prev is None
                    else np.unique(np.concatenate([prev, vals]))
                )
                state[gkey] = merged[:k]  # np.unique sorts ascending
        if template is None or not state:
            return
        n_rows = sum(len(arr) for arr in state.values())
        out: dict[str, np.ndarray | list] = {}
        for i, key_col in enumerate(keys):
            out[key_col] = [
                gkey[i] for gkey, arr in state.items() for _ in range(len(arr))
            ]
        out["__h"] = np.concatenate(list(state.values())) if n_rows else []
        yield pd.DataFrame(out).astype(template.dtypes.to_dict(), errors="ignore")

    return partial


def kmv_partials(
    df: DataFrame, value_col: str, keys: list[str], k: int
) -> DataFrame:
    """The bounded partial stage of :func:`kmv_distinct`, exposed so tests
    can pin the shuffle-volume contract directly: hash JVM-side, then a
    per-partition ``mapInPandas`` that emits each group's ≤k smallest
    distinct hashes. The rows of THIS frame are what the group-by shuffle
    carries."""
    hashed = df.where(F.col(value_col).isNotNull()).select(
        *keys,
        md5_long(F.col(value_col).cast("string")).alias("__h"),
    )
    return hashed.mapInPandas(_partial_topk_fn(keys, k), schema=hashed.schema)


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

    Execution is the bounded-state two-level aggregate described in the
    module docstring: the hash is computed JVM-side, a ``mapInPandas``
    partial bounds per-partition state to k distinct hashes per group,
    and the merge is a plain JVM aggregate over ≤k×P rows per group.
    Grouping keys round-trip through Arrow in the partial; keys should be
    string/int/date-typed (nullable-int keys surface as float64 in
    pandas — cast such keys to string first).
    """
    keys = as_list(by)
    partials = kmv_partials(df, value_col, keys, k)
    merged = partials.groupBy(*keys).agg(
        F.slice(F.array_sort(F.collect_set("__h")), 1, k).alias("__topk")
    )
    return merged.select(
        *keys,
        F.size("__topk").alias("__nk"),
        F.element_at("__topk", F.size("__topk")).alias("__hk"),
    ).select(
        *keys,
        F.when(F.col("__nk") < k, F.col("__nk").cast("double"))
        .otherwise(
            F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / F.col("__hk").cast("double")
        )
        .alias("kmv_estimate"),
    )
