"""SQL-callable fold/scan: Python UDTFs over TABLE arguments.

The reference's operators are Python-API-only; Spark 4's polymorphic table
functions give them a pure-SQL spelling:

    SELECT * FROM my_scan(TABLE(events) PARTITION BY user_id ORDER BY ts)

Spark instantiates the UDTF once per partition key, feeds rows in the
declared order, and ``terminate`` fires at group end — exactly the grouped
fold/scan lifecycle. Semantics match the DataFrame operators (same null
rules); execution is row-at-a-time Python, so this surface is for SQL
ergonomics and moderate volumes — the vectorized mapInPandas operators
remain the scale path.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

from polars_numba_spark.kernels import compile_step_function


def register_scan_udtf(
    spark: SparkSession,
    name: str,
    function: Callable,
    initial_accumulator: Any,
    input_cols: Sequence[str],
    key_cols: Sequence[str],
    return_schema: str,
    extra_args: Sequence[Any] = (),
) -> None:
    """Register ``name`` as a running-scan table function: emits every input
    row's key/input columns plus ``scan`` (null in → null out, accumulator
    carries — the reference scan null rule)."""
    compile_step_function(function)  # closure guard at registration time
    cols = list(input_cols)
    keys = list(key_cols)
    extra = tuple(extra_args)
    acc0 = initial_accumulator

    @udtf(returnType=return_schema)
    class _Scan:
        def __init__(self) -> None:
            self.acc = acc0

        def eval(self, row):
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
) -> None:
    """Register ``name`` as a grouped-fold table function: one output row
    per partition key (keys + ``fold``); null rows dropped (reference fold
    null rule)."""
    compile_step_function(function)
    cols = list(input_cols)
    keys = list(key_cols)
    extra = tuple(extra_args)
    acc0 = initial_accumulator

    @udtf(returnType=return_schema)
    class _Fold:
        def __init__(self) -> None:
            self.acc = acc0
            self.key: tuple | None = None

        def eval(self, row):
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
