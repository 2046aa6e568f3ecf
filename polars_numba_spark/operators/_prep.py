"""Shared input preparation for fold/scan operators."""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from polars_numba_spark.dtypes import spark_type_to_numpy


def group_boundaries(pdf: "pd.DataFrame", keys: Sequence[str]) -> tuple[np.ndarray, np.ndarray]:
    """(starts, ends) of contiguous key groups in a key-sorted batch.

    Null-aware: two adjacent null keys belong to the SAME group (Spark's
    groupBy semantics — null is one group), which naive ``!=`` change
    detection gets wrong because NaN != NaN.
    """
    n = len(pdf)
    change = np.zeros(n, dtype=bool)
    for k in keys:
        s = pdf[k]
        prev = s.shift()
        neq = s.ne(prev) & ~(s.isna() & prev.isna())
        change |= neq.to_numpy(dtype=bool)
    change[0] = True
    starts = np.flatnonzero(change)
    return starts, np.append(starts[1:], n)


def key_tuple(pdf: "pd.DataFrame", keys: Sequence[str], row: int) -> tuple:
    """Normalized key tuple at a row position: NaN/NaT → None so tuple
    equality works across batch boundaries."""
    out = []
    for k in keys:
        v = pdf[k].iloc[row]
        out.append(None if pd.isna(v) else v)
    return tuple(out)


def ensure_event_time(df: DataFrame, time_col: str) -> DataFrame:
    """Coerce a TIMESTAMP_NTZ event-time column to session-zone TIMESTAMP.

    ``withWatermark`` and several time arithmetics are only legal on
    TIMESTAMP (LTZ); parquet-sourced naive timestamps arrive as NTZ.
    No-op when the column is already LTZ (or anything else castable the
    caller wants to keep as-is).
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if isinstance(df.schema[time_col].dataType, T.TimestampNTZType):
        return df.withColumn(time_col, F.col(time_col).cast(T.TimestampType()))
    return df


def as_list(value: str | Sequence[str] | None) -> list[str]:
    if value is None:
        return []
    if isinstance(value, str):
        return [value]
    return list(value)


def resolve_input_columns(
    df: DataFrame,
    column_names: Sequence[str] | None,
    exclude: Sequence[str] = (),
) -> list[str]:
    """Kernel input columns.

    Default mirrors the reference's whole-frame behavior — *all* frame
    columns, positionally, in frame order (ref `__init__.py:346-348,714-716`;
    tested `tests/test_collect_fold.py:75-85`) — except that ordering /
    grouping columns (which the reference does not need, Polars frames being
    inherently ordered) are excluded from the default.
    """
    if column_names is not None:
        cols = as_list(column_names)
        if not cols:
            raise ValueError("You must pass in at least one column name")
        return cols
    excluded = set(exclude)
    return [c for c in df.columns if c not in excluded]


def input_numpy_dtypes(df: DataFrame, cols: Sequence[str]) -> dict[str, np.dtype]:
    """NumPy dtype per kernel input column; raises TypeError for types the
    kernels don't support (strings/arrays/maps — same restriction as the
    reference, `__init__.py:408-424`)."""
    schema = {f.name: f.dataType for f in df.schema.fields}
    out: dict[str, np.dtype] = {}
    for c in cols:
        if c not in schema:
            raise KeyError(f"column {c!r} not found in DataFrame (has {df.columns})")
        out[c] = spark_type_to_numpy(schema[c])
    return out
