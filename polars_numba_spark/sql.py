"""SQL-callable fold/scan: Python UDTFs over TABLE arguments.

The reference's operators are Python-API-only; Spark 4's polymorphic table
functions give them a pure-SQL spelling:

    SELECT * FROM my_scan(TABLE(events) PARTITION BY user_id ORDER BY ts)

Spark instantiates the UDTF once per partition key, feeds rows in the
declared order, and ``terminate`` fires at group end — exactly the grouped
fold/scan lifecycle. Semantics match the DataFrame operators (same null
rules); execution is row-at-a-time Python, so this surface is for SQL
ergonomics and moderate volumes — the vectorized mapInPandas operators
remain the scale path (measured ~3.5× slower at sf0.1: BASELINE.md
"UDTF overhead" note).

Because a user typing the SQL form gets the slow path silently, both
registrars carry a size guard: ``max_rows_per_group`` (default 10M) fails
the query with a pointer at :func:`polars_numba_spark.grouped_scan` /
:func:`~polars_numba_spark.grouped_fold` when any single partition group
exceeds it. Pass ``None`` to run unguarded.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

from polars_numba_spark.kernels import compile_step_function


def _guard_message(name: str, limit: int, vectorized: str) -> str:
    return (
        f"UDTF '{name}' exceeded max_rows_per_group={limit}: the SQL "
        f"spelling runs row-at-a-time Python (~3.5x slower than the "
        f"vectorized kernel). Use polars_numba_spark.{vectorized} for this "
        f"volume, or re-register with max_rows_per_group=None to override."
    )


def register_scan_udtf(
    spark: SparkSession,
    name: str,
    function: Callable,
    initial_accumulator: Any,
    input_cols: Sequence[str],
    key_cols: Sequence[str],
    return_schema: str,
    extra_args: Sequence[Any] = (),
    max_rows_per_group: int | None = 10_000_000,
) -> None:
    """Register ``name`` as a running-scan table function: emits every input
    row's key/input columns plus ``scan`` (null in → null out, accumulator
    carries — the reference scan null rule).

    ``max_rows_per_group`` is the slow-path size guard (module docstring);
    exceeding it fails the query pointing at the vectorized operator."""
    compile_step_function(function)  # closure guard at registration time
    cols = list(input_cols)
    keys = list(key_cols)
    extra = tuple(extra_args)
    acc0 = initial_accumulator
    limit = max_rows_per_group

    @udtf(returnType=return_schema)
    class _Scan:
        def __init__(self) -> None:
            self.acc = acc0
            self.n_rows = 0

        def eval(self, row):
            self.n_rows += 1
            if limit is not None and self.n_rows > limit:
                raise RuntimeError(_guard_message(name, limit, "grouped_scan"))
            values = [row[c] for c in cols]
            if any(v is None for v in values):
                out = None
            else:
                self.acc = function(self.acc, *extra, *values)
                out = self.acc
            yield tuple(row[k] for k in keys) + tuple(values) + (out,)

    spark.udtf.register(name, _Scan)


def register_fold_udtf(
    spark: SparkSession,
    name: str,
    function: Callable,
    initial_accumulator: Any,
    input_cols: Sequence[str],
    key_cols: Sequence[str],
    return_schema: str,
    extra_args: Sequence[Any] = (),
    max_rows_per_group: int | None = 10_000_000,
) -> None:
    """Register ``name`` as a grouped-fold table function: one output row
    per partition key (keys + ``fold``); null rows dropped (reference fold
    null rule).

    ``max_rows_per_group`` is the slow-path size guard (module docstring);
    exceeding it fails the query pointing at the vectorized operator."""
    compile_step_function(function)
    cols = list(input_cols)
    keys = list(key_cols)
    extra = tuple(extra_args)
    acc0 = initial_accumulator
    limit = max_rows_per_group

    @udtf(returnType=return_schema)
    class _Fold:
        def __init__(self) -> None:
            self.acc = acc0
            self.key: tuple | None = None
            self.n_rows = 0

        def eval(self, row):
            self.n_rows += 1
            if limit is not None and self.n_rows > limit:
                raise RuntimeError(_guard_message(name, limit, "grouped_fold"))
            if self.key is None:
                self.key = tuple(row[k] for k in keys)
            values = [row[c] for c in cols]
            if not any(v is None for v in values):
                self.acc = function(self.acc, *extra, *values)
            return
            yield  # generator protocol, no per-row output

        def terminate(self):
            if self.key is not None:
                yield self.key + (self.acc,)

    spark.udtf.register(name, _Fold)
