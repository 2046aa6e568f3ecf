"""Sessionization: gap-based session assignment over an event stream.

Batch face: ``F.session_window`` (Spark's native gap-session operator —
sessions close after ``gap`` of inactivity). Streaming face: the identical
expression under ``readStream`` + watermark (Spark's unified semantics).
The catalog query checks the batch face against an independent
gaps-and-islands SQL formulation in DuckDB — the classic
lag → new-session flag → running-sum island id — so the operator's
semantics are pinned by a structurally different computation.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_numba_spark.operators._prep import as_list, ensure_event_time


def sessionize(
    df: DataFrame,
    time_col: str,
    gap: str = "30 minutes",
    group_by: str | Sequence[str] = (),
    aggs: dict | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based sessions per key: one row per session with
    ``session_start`` (min event time) plus the given aggregates.

    Boundary semantics (verified empirically): an event exactly ``gap``
    after the previous one is merged into the SAME session — Spark's
    session_window treats the window end as inclusive for merging. The
    gaps-and-islands oracle formulation must therefore use
    ``ts - lag(ts) > gap`` (strict) for the new-session flag."""
    keys = as_list(group_by)
    aggs = aggs or {"n_events": F.count(F.lit(1))}
    out = ensure_event_time(df, time_col)
    if df.isStreaming and watermark:
        out = out.withWatermark(time_col, watermark)
    return (
        out.groupBy(F.session_window(F.col(time_col), gap).alias("session"), *keys)
        .agg(*[expr.alias(name) for name, expr in aggs.items()])
        .select(
            *keys,
            F.col("session.start").alias("session_start"),
            *aggs.keys(),
        )
    )
