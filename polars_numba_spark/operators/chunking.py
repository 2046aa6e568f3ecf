"""Document chunking: split long texts into overlapping token-window chunks
— the standard pre-tokenization step of a training-data pipeline (context
windows, embedding inputs).

Pure codegen: tokenize → slice windows with ``sequence`` + ``transform`` →
``posexplode``. Linear in total tokens, no Python, no shuffle (chunking is
a per-row operation); the chunk id keeps provenance (doc_id, chunk_idx).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_numba_spark.operators.text import tokens


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """One row per chunk: (id, chunk_idx, n_chunk_tokens, chunk_text).

    Windows start every ``chunk_tokens - overlap`` tokens; the final partial
    window is kept (training pipelines want the tail). Documents shorter
    than one window yield exactly one chunk.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must satisfy 0 <= overlap < chunk_tokens")
    # Null texts produce no chunks (filtered explicitly — a null array would
    # silently vanish in posexplode anyway; making it explicit keeps the
    # one-chunk-minimum contract honest: it applies to non-null documents).
    df = df.where(F.col(text_col).isNotNull())
    stride = chunk_tokens - overlap
    toks = tokens(text_col)
    n = F.size(toks)
    # start offsets: 0, stride, 2*stride, ... while start < n (at least one)
    n_starts = F.greatest(F.ceil((n - F.lit(overlap)) / F.lit(stride)), F.lit(1))
    starts = F.transform(
        F.sequence(F.lit(0), n_starts.cast("int") - 1), lambda i: i * stride
    )
    chunks = F.transform(
        starts, lambda s: F.slice(toks, s + 1, chunk_tokens)
    )
    exploded = df.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_idx", "chunk_toks"),
    )
    return exploded.select(
        id_col,
        "chunk_idx",
        F.size("chunk_toks").alias("n_chunk_tokens"),
        F.concat_ws(" ", "chunk_toks").alias("chunk_text"),
    )
