"""Sequence packing: assign documents to fixed-capacity training sequences.

LLM pretraining consumes fixed-length token sequences, not documents; the
standard layout (GPT-style "concat-then-chunk") concatenates the corpus in
a deterministic order and cuts every ``capacity`` tokens — a document
belongs to the sequence where its first token lands, and may straddle the
boundary into the next. The greedy/first-fit alternatives are inherently
sequential; concat-then-chunk is the variant that scales, because a
cumulative-sum window per SHARD places every document independently:

1. shard = content-hash(doc) % n_shards — scan-side, no data movement;
   each shard becomes one independent packing stream (cluster parallelism
   = n_shards, chosen to taste; sequences are per-shard so no cross-shard
   coordination ever happens).
2. within a shard, order by (hash, id) — deterministic and
   growth-stable-ish (a new doc perturbs only its own shard), then
   ``cum_before = sum(size) over preceding rows``.
3. seq_index = floor(cum_before / capacity): integer arithmetic only, so
   the assignment reproduces bit-for-bit in any engine — the catalog query
   oracles exact membership.

One shuffle (the per-shard window sort). At 100 TB the shard count bounds
the biggest sort partition: 10k shards over 100 TB ⇒ ~10 GB per shard —
and because sizes are integers the cumsum can also run as a two-pass
parallel prefix (per-partition totals broadcast, offsets added) if a
single window per shard ever became the bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_numba_spark.operators.sampling import hash_bucket, sql_hash_bucket


def pack_sequences(
    df: DataFrame,
    id_col: str,
    size_col: str,
    capacity: int,
    n_shards: int = 8,
) -> DataFrame:
    """Concat-then-chunk packing: returns the input plus ``shard``,
    ``seq_index`` (which fixed-``capacity`` sequence this row STARTS in,
    within its shard) and ``offset_in_seq`` (token offset of the row's
    first token inside that sequence). Rows with NULL ids or non-positive
    sizes are excluded (an empty document occupies no tokens).
    """
    if capacity < 1:
        raise ValueError("capacity must be ≥ 1")
    if n_shards < 1:
        raise ValueError("n_shards must be ≥ 1")
    eligible = df.where(F.col(id_col).isNotNull() & (F.col(size_col) > 0))
    sharded = eligible.withColumn("shard", hash_bucket(id_col, n_shards))
    w = (
        Window.partitionBy("shard")
        .orderBy(hash_bucket(id_col, 2**31), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(F.col(size_col)).over(w), F.lit(0))
    return sharded.withColumn(
        "seq_index", F.floor(cum_before / F.lit(capacity)).cast("long")
    ).withColumn("offset_in_seq", (cum_before % F.lit(capacity)).cast("long"))


def sql_pack_sequences(
    table: str,
    id_expr: str,
    size_expr: str,
    capacity: int,
    n_shards: int = 8,
    where: str = "TRUE",
) -> str:
    """DuckDB replica of :func:`pack_sequences` (oracle fragment): yields a
    subquery selecting ``{id, size, shard, seq_index, offset_in_seq}``."""
    shard = sql_hash_bucket(id_expr, n_shards)
    order = sql_hash_bucket(id_expr, 2**31)
    return f"""
    SELECT id, size, shard,
           CAST(FLOOR(cum_before / {capacity}) AS BIGINT) AS seq_index,
           CAST(cum_before % {capacity} AS BIGINT) AS offset_in_seq
    FROM (
        SELECT {id_expr} AS id, {size_expr} AS size, {shard} AS shard,
               COALESCE(SUM({size_expr}) OVER (
                   PARTITION BY {shard}
                   ORDER BY {order}, {id_expr}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS cum_before
        FROM {table}
        WHERE ({where}) AND {id_expr} IS NOT NULL AND {size_expr} > 0
    )
    """
