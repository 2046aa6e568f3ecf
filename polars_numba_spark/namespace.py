"""``df.plumba`` — DataFrame-level namespace mirroring the reference's
registered expression namespace.

The reference exposes fold/scan via
``pl.api.register_expr_namespace("plumba")`` so they compose as
``pl.col("x").plumba.fold(...)`` (ref `__init__.py:802-827`). PySpark has no
user-registrable Column namespace, so the engine's equivalent composition
point is the DataFrame: after :func:`attach`, every DataFrame gains a
``.plumba`` accessor whose methods return DataFrames/values and therefore
chain with the rest of the API.

    >>> from polars_numba_spark.namespace import attach
    >>> attach()
    >>> df.plumba.grouped_fold("user", step, 0.0, "double", columns=["amt"],
    ...                        order_by="ord")
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

from polars_numba_spark.operators.asof import asof_join
from polars_numba_spark.operators.fold import (
    agg_with_fold,
    collect_fold,
    grouped_fold,
    grouped_multi_fold,
)
from polars_numba_spark.operators.scan import collect_scan, grouped_multi_scan, grouped_scan
from polars_numba_spark.operators.window import assoc_fold, assoc_scan, running_agg


class PlumbaNamespace:
    """Accessor object bound to one DataFrame."""

    def __init__(self, df: DataFrame) -> None:
        self._df = df

    def collect_fold(self, *args: Any, **kwargs: Any) -> Any:
        return collect_fold(self._df, *args, **kwargs)

    def collect_scan(self, *args: Any, **kwargs: Any) -> DataFrame:
        return collect_scan(self._df, *args, **kwargs)

    def grouped_fold(self, *args: Any, **kwargs: Any) -> DataFrame:
        return grouped_fold(self._df, *args, **kwargs)

    def grouped_scan(self, *args: Any, **kwargs: Any) -> DataFrame:
        return grouped_scan(self._df, *args, **kwargs)

    def fold(self, *args: Any, **kwargs: Any) -> DataFrame:
        """Alias of grouped_fold (the reference's expression ``fold``)."""
        return grouped_fold(self._df, *args, **kwargs)

    def scan(self, *args: Any, **kwargs: Any) -> DataFrame:
        """Alias of grouped_scan (the reference's expression ``scan``)."""
        return grouped_scan(self._df, *args, **kwargs)

    def assoc_fold(self, *args: Any, **kwargs: Any) -> DataFrame:
        return assoc_fold(self._df, *args, **kwargs)

    def assoc_scan(self, *args: Any, **kwargs: Any) -> DataFrame:
        return assoc_scan(self._df, *args, **kwargs)

    def running_agg(self, *args: Any, **kwargs: Any) -> DataFrame:
        return running_agg(self._df, *args, **kwargs)

    def asof_join(self, *args: Any, **kwargs: Any) -> DataFrame:
        return asof_join(self._df, *args, **kwargs)

    def agg_with_fold(self, *args: Any, **kwargs: Any) -> DataFrame:
        """Native aggregates + kernel folds in one grouped result."""
        return agg_with_fold(self._df, *args, **kwargs)

    def grouped_multi_fold(self, *args: Any, **kwargs: Any) -> DataFrame:
        """Several same-ordering folds in one shuffle+sort+kernel pass."""
        return grouped_multi_fold(self._df, *args, **kwargs)

    def grouped_multi_scan(self, *args: Any, **kwargs: Any) -> DataFrame:
        """Several same-ordering scans in one pass (N result columns)."""
        return grouped_multi_scan(self._df, *args, **kwargs)


def attach() -> None:
    """Install the ``.plumba`` property on pyspark's DataFrame (idempotent)."""
    if getattr(DataFrame, "plumba", None) is not None:
        return
    DataFrame.plumba = property(PlumbaNamespace)  # type: ignore[attr-defined]
