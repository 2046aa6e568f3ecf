"""Query catalog: every public operator exposed as a (spark, sf_dir) →
DataFrame callable plus, where SQL-expressible, a DuckDB oracle string.

This is the engine's demonstration surface — the driver's correctness gate
runs each pair side-by-side at sf0.01 and the bench harness times the
headline set at sf0.1.
"""

from polars_numba_spark.queries import catalog
from polars_numba_spark.queries.catalog import flagship

__all__ = ["catalog", "flagship"]
