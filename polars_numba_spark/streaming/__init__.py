"""Structured Streaming analogs of the engine's stateful operators."""

from polars_numba_spark.streaming.stateful import (
    streaming_exact_dedup,
    streaming_grouped_fold,
    streaming_kmv_distinct,
    streaming_latest_snapshot,
    streaming_grouped_scan,
    windowed_rollup,
)

__all__ = [
    "streaming_exact_dedup",
    "streaming_grouped_fold",
    "streaming_kmv_distinct",
    "streaming_latest_snapshot",
    "streaming_grouped_scan",
    "windowed_rollup",
]
