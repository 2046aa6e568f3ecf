"""As-of join: for each left row, the most recent right row at-or-before it.

Spark has no native ASOF JOIN (DuckDB/Pandas do). The naive formulations are
wrong at scale: an inequality join explodes into a range join
(O(n × matches)), and ``applyInPandas`` + ``merge_asof`` caps each key group
at one worker. This implementation is the classic **union + running
last-value window**:

1. tag right rows 0 / left rows 1, union on (keys, time, tag);
2. one window per key ordered by (time, tag): ``last(value, ignorenulls)``
   over unbounded-preceding..current carries the latest right-side value
   forward;
3. keep left rows.

Cost: ONE shuffle + sort over |L| + |R| — the same exchange a grouped
aggregate would pay; no row explosion, no per-group memory cap beyond
Spark's own sort spill, fully codegen'd. Ordering right(0) before left(1)
at equal timestamps gives the inclusive (>=, "backward") semantics of
DuckDB's ``ASOF JOIN`` — which is exactly how the catalog query's oracle
checks this operator.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from polars_numba_spark.operators._prep import as_list


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | Sequence[str] = (),
    value_cols: Sequence[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward (inclusive) as-of join.

    Parameters: ``on`` — the time/order column present in both sides;
    ``by`` — equality key(s); ``value_cols`` — right-side columns to carry
    (default: all non-key, non-time right columns), appearing in the output
    as ``<name><suffix>``. Left rows with no prior right row get nulls.

    Null contract (part of the public API, matching DuckDB/pandas ASOF
    semantics): right rows with a NULL ``on`` value or a NULL ``by`` key are
    never match candidates — NULL equality keys do not match anything, so
    those rows are dropped from the right side before the join. Left rows
    with NULL keys still flow through and simply find no match (null
    ``value_cols``). Callers needing Spark's null-safe grouping (NULL keys
    matching each other) should pre-coalesce the keys to a sentinel value.
    """
    keys = as_list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in keys and c != on]
    value_cols = list(value_cols)

    # The carried payload is ONE struct per right row (never null for right
    # rows, null for left rows): last(struct, ignorenulls) then picks the
    # latest right ROW atomically — a right row whose individual value
    # columns are NULL is still the match (DuckDB ASOF semantics), and
    # multiple value columns can never blend across different right rows.
    # A right row with a null `on` value can never be an as-of match
    # (DuckDB/pandas semantics); without this filter Spark's nulls-first
    # ascending sort would place it before every left row and carry it.
    # Same for a null `by` key: ASOF equality keys never match on NULL
    # (SQL semantics — and two anonymous rows are not the same entity),
    # but Spark's partitionBy would happily group them together. Null-key
    # LEFT rows still flow through and simply find no match.
    right = right.where(F.col(on).isNotNull())
    for k in keys:
        right = right.where(F.col(k).isNotNull())
    r = right.select(
        *keys,
        F.col(on).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("__payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in left.columns],
    )
    l = left.select(  # noqa: E741
        *keys,
        F.col(on).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None)
        .cast(
            T.StructType([T.StructField(c, right.schema[c].dataType) for c in value_cols])
        )
        .alias("__payload"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    unioned = r.unionByName(l)
    w = (
        Window.partitionBy(*keys)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "__side",
        *[F.col(f"__l_{c}") for c in left.columns],
        F.last(F.col("__payload"), ignorenulls=True).over(w).alias("__match"),
    )
    return carried.where(F.col("__side") == 1).select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        *[F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
