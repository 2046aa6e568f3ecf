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


def _mg_partial_fn(keys: list[str], value_col: str, k: int):
    """Per-partition bounded Misra-Gries partial: emit, per group, the
    ≤k candidate values whose MG counter is still positive after the
    whole partition has streamed through.

    Mergeable-summaries bound (Agarwal et al. 2012): combining batch
    counts then subtracting the (k+1)-th largest counter decrements every
    item by a total ≤ m_p/(k+1) across the partition, so any value with
    true partition frequency > m_p/(k+1) survives. State is ≤k counters
    per group per partition regardless of the distinct count."""

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state: dict[tuple, pd.Series] = {}
        template: pd.DataFrame | None = None
        for pdf in batches:
            if template is None:
                template = pdf.iloc[:0]
            if len(pdf) == 0:
                continue
            for gkey, sub in pdf.groupby(keys, sort=False, dropna=False):
                if not isinstance(gkey, tuple):
                    gkey = (gkey,)
                vc = sub[value_col].dropna().value_counts()
                prev = state.get(gkey)
                s = vc if prev is None else prev.add(vc, fill_value=0)
                if len(s) > k:
                    dec = s.nlargest(k + 1).iloc[-1]
                    s = s - dec
                    s = s[s > 0]
                state[gkey] = s
        if template is None or not state:
            return
        out: dict[str, list] = {}
        for i, key_col in enumerate(keys):
            out[key_col] = [
                gkey[i] for gkey, s in state.items() for _ in range(len(s))
            ]
        out[value_col] = [v for s in state.values() for v in s.index]
        yield pd.DataFrame(out).astype(template.dtypes.to_dict(), errors="ignore")

    return partial


def heavy_hitter_candidates(
    df: DataFrame, value_col: str, keys: list[str], k: int
) -> DataFrame:
    """The bounded candidate stage of :func:`heavy_hitters`, exposed so
    tests can pin the contract directly: per input partition, at most k
    candidate values per group reach the shuffle — independent of the
    group's distinct count."""
    cols = df.select(*keys, value_col)
    return cols.mapInPandas(
        _mg_partial_fn(keys, value_col, k), schema=cols.schema
    ).distinct()


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    by: str | Sequence[str],
    k: int = 100,
) -> DataFrame:
    """EXACT per-group heavy hitters — every value occurring in more than
    a 1/k share of its group — at a bounded shuffle cost:
    ``(group cols, value_col, cnt, share)``.

    Two passes, the classic distributed frequent-items shape:

    1. **Bounded candidate pass**: a per-partition Misra-Gries summary
       (≤k counters per group per partition, ``mapInPandas``) whose
       survivors are a SUPERSET of the true heavy hitters — any value
       with global share > 1/k has, by pigeonhole, partition frequency
       > m_p/(k+1) somewhere, and the MG bound keeps such values alive.
       The shuffle carries ≤ k × n_partitions candidate rows per group,
       never the full distinct-value set.
    2. **Exact recount**: a broadcast semi-join keeps only candidate
       rows, a JVM aggregate counts them exactly, and the 1/k-share
       filter drops the false positives the MG pass over-admitted.

    The output is therefore EXACT (same rows and counts as a full
    ``GROUP BY`` + ``HAVING cnt*k > total``) — fully oracle-able — while
    the only unbounded aggregate is the cheap per-group total. NULL
    values are excluded (COUNT semantics). ``share`` is rounded to 6
    decimals for cross-engine hash stability.
    """
    keys = as_list(by)
    cands = heavy_hitter_candidates(
        df.where(F.col(value_col).isNotNull()), value_col, keys, k
    )
    totals = df.where(F.col(value_col).isNotNull()).groupBy(*keys).agg(
        F.count(F.lit(1)).alias("__total")
    )
    exact = (
        df.join(F.broadcast(cands), on=[*keys, value_col], how="left_semi")
        .groupBy(*keys, value_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        exact.join(F.broadcast(totals), on=keys)
        .where(F.col("cnt") * F.lit(k) > F.col("__total"))
        .select(
            *keys,
            value_col,
            "cnt",
            F.round(F.col("cnt") / F.col("__total"), 6).alias("share"),
        )
    )


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


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    by: str | Sequence[str],
    probs: Sequence[float],
    lo: float,
    hi: float,
    n_bins: int = 256,
    round_to: int = 6,
) -> DataFrame:
    """Bounded-state per-group quantile estimates from a fixed-bin
    histogram: ``(group cols, prob, quantile_est)``.

    Spark's ``approx_percentile`` (GK) and DuckDB's ``approx_quantile``
    (t-digest) are engine-specific — no cross-engine oracle possible. A
    fixed [lo, hi) equi-width histogram is the deterministic mergeable
    alternative: the aggregate carries ≤ ``n_bins`` counter rows per group
    through the shuffle regardless of row count (map-side partial
    aggregation collapses each partition to its bin counts first — the
    shuffle never carries values, unlike sort-based exact percentile),
    the merge is counter addition, and the estimate — linear
    interpolation inside the first bin whose cumulative count reaches
    ``p·total`` — is the SAME arithmetic in any engine, so the whole
    thing oracles exactly.

    Error bound: estimates are exact-rank within one bin width
    ((hi-lo)/n_bins); values outside [lo, hi) clamp into the edge bins.
    ``probs`` must lie in (0, 1]. NULL values are excluded (aggregate
    semantics).
    """
    from pyspark.sql import Window

    keys = as_list(by)
    width = (hi - lo) / n_bins
    bin_col = (
        F.least(
            F.lit(n_bins - 1),
            F.greatest(
                F.lit(0), F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))
            ),
        )
        .cast("int")
        .alias("__bin")
    )
    counts = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*keys, bin_col)
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy("__bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*keys)
    cum = counts.select(
        *keys,
        "__bin",
        "__n",
        F.sum("__n").over(w_cum).alias("__cum"),
        F.sum("__n").over(w_all).alias("__total"),
    )
    p = F.explode(
        F.array(*[F.lit(float(x)) for x in probs])
    ).alias("prob")
    exploded = cum.select(*keys, "__bin", "__n", "__cum", "__total", p)
    target = F.col("prob") * F.col("__total").cast("double")
    hit = exploded.where(
        (F.col("__cum").cast("double") >= target)
        & ((F.col("__cum") - F.col("__n")).cast("double") < target)
    )
    frac = (target - (F.col("__cum") - F.col("__n")).cast("double")) / F.col(
        "__n"
    ).cast("double")
    est = F.lit(lo) + F.lit(width) * (F.col("__bin").cast("double") + frac)
    return hit.select(
        *keys, "prob", F.round(est, round_to).alias("quantile_est")
    )
