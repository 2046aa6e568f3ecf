"""Structured Streaming analogs of the engine's stateful operators."""

from polars_numba_spark.streaming.neardup import (
    ingest_neardup_batch,
    neardup_verdict,
    streaming_minhash_keep_list,
)
from polars_numba_spark.streaming.stateful import (
    streaming_exact_dedup,
    streaming_grouped_fold,
    streaming_hll_distinct,
    streaming_kmv_distinct,
    streaming_latest_snapshot,
    streaming_grouped_scan,
    windowed_rollup,
)

__all__ = [
    "ingest_neardup_batch",
    "neardup_verdict",
    "streaming_exact_dedup",
    "streaming_grouped_fold",
    "streaming_hll_distinct",
    "streaming_kmv_distinct",
    "streaming_latest_snapshot",
    "streaming_grouped_scan",
    "streaming_minhash_keep_list",
    "windowed_rollup",
]
