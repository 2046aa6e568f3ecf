"""Associative fast paths: fold → native aggregate, scan → window frame.

The generic fold/scan kernels (fold.py / scan.py) are correct for ANY step
function but pay the sequential-stream and Python-boundary costs. When the
step function is associative (+ has an identity), Catalyst can do better —
a fold becomes a plain aggregate (map-side partial aggregation, no single
stream) and a scan becomes a running window frame
(``rowsBetween(unboundedPreceding, currentRow)``) — fully JVM-side,
whole-stage-codegen'd, parallel across partitions/groups.

This is SURVEY.md §7 M4: the reference has no such rewrite (its engine is
single-node so the sequential loop is already optimal there); at 100 TB the
rewrite is the difference between a one-task bottleneck and a linear scan.

Supported step kinds: ``sum``, ``min``, ``max``, ``count``, ``product``,
``avg`` (scan: running average). ``avg`` is not a binary fold in the
reference's sense but included for completeness of the running-agg surface.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from polars_numba_spark.operators._prep import as_list

_AGGS = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "avg": F.avg,
    "product": F.product,
}


def _agg(kind: str, col: str) -> Column:
    try:
        return _AGGS[kind](col)
    except KeyError:
        raise ValueError(
            f"unknown associative step kind {kind!r}; supported: {sorted(_AGGS)}"
        ) from None


def running_window(
    partition_by: str | Sequence[str] | None,
    order_by: str | Sequence[str],
) -> WindowSpec:
    """The running-accumulator frame: unbounded-preceding → current row."""
    order_cols = as_list(order_by)
    if not order_cols:
        raise ValueError("a running window requires order_by")
    keys = as_list(partition_by)
    w = Window.partitionBy(*keys) if keys else Window.partitionBy()
    return w.orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )


def assoc_fold(
    df: DataFrame,
    kind: str,
    column: str,
    group_by: str | Sequence[str] | None = None,
    result_name: str = "fold",
) -> DataFrame:
    """Associative fold as a native aggregate (declarative ``grouped_fold``).

    Equivalent to ``grouped_fold`` with an associative step, but executes as
    hash aggregation with map-side combine — no Python, no per-group ordering
    requirement (associativity + commutativity of these kinds makes order
    irrelevant, which is exactly why the rewrite is legal).
    """
    keys = as_list(group_by)
    agg = _agg(kind, column).alias(result_name)
    if keys:
        return df.groupBy(*keys).agg(agg)
    return df.agg(agg)


def assoc_scan(
    df: DataFrame,
    kind: str,
    column: str,
    order_by: str | Sequence[str],
    partition_by: str | Sequence[str] | None = None,
    result_name: str = "scan",
) -> DataFrame:
    """Associative running scan as a window frame (declarative
    ``grouped_scan`` / ``collect_scan``).

    ``partition_by=None`` is the global scan — note that, like the generic
    global scan, a single-partition window is a sequential bottleneck by
    nature; Spark evaluates it in one task. With ``partition_by`` the scan is
    parallel across groups.
    """
    w = running_window(partition_by, order_by)
    return df.withColumn(result_name, _agg(kind, column).over(w))


def running_agg(
    df: DataFrame,
    aggs: dict[str, tuple[str, str]],
    order_by: str | Sequence[str],
    partition_by: str | Sequence[str] | None = None,
) -> DataFrame:
    """Several running aggregates in one window pass.

    ``aggs`` maps output column name → (kind, input column). All share one
    WindowSpec so Catalyst plans a single sort+window exchange.
    """
    w = running_window(partition_by, order_by)
    out = df
    for name, (kind, col) in aggs.items():
        out = out.withColumn(name, _agg(kind, col).over(w))
    return out
