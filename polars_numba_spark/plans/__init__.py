"""Physical-plan inspection: the 100-TB posture audit tooling.

A plan that "works" at sf0.1 but scans all columns, misses a pushdown, or
sort-merge-joins a 25-row dimension is wrong at scale even though it returns
correct rows. These helpers turn `.explain("formatted")` into assertions so
plan shape is pinned by tests, not by eyeballing.
"""

from polars_numba_spark.plans.inspect import (
    explain_string,
    pushed_filters,
    read_schemas,
    count_exchanges,
    has_broadcast_join,
    has_partial_aggregation,
    wholestage_codegen_spans,
)

__all__ = [
    "explain_string",
    "pushed_filters",
    "read_schemas",
    "count_exchanges",
    "has_broadcast_join",
    "has_partial_aggregation",
    "wholestage_codegen_spans",
]
