"""Source/sink format helpers beyond parquet.

The reference reads no files at all (in-memory frames only, SURVEY.md §2.B);
this engine's I/O surface is Spark's DataSource V2, wrapped thinly so schema
discipline is kept explicit — at 100 TB, schema inference is a full extra
scan, so every reader here takes or derives an explicit schema.

Formats: parquet (primary, in tables.py), CSV, JSON-lines, ORC (built
into spark-sql — columnar, predicate-pushdown-capable, the
Hive-ecosystem interchange format), and a partitioned-parquet writer for
hive-style layout (partition pruning on read). Avro is NOT available
(external spark-avro module, not in this container — verified: the
DataSource lookup fails).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from polars_numba_spark.operators._prep import as_list


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV with a mandatory schema (no inference scan)."""
    reader = spark.read.option("header", str(header).lower())
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.schema(schema).csv(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | str, **options: str
) -> DataFrame:
    """JSON-lines with a mandatory schema."""
    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.schema(schema).json(path)


def read_orc(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """ORC reader. Schema is optional here (ORC files carry their schema
    like parquet — no inference scan), but passing one still pins the
    contract and prunes the read to the named columns."""
    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_by: str | Sequence[str],
    max_records_per_file: int | None = None,
) -> None:
    """Hive-layout parquet: downstream readers get partition pruning for
    filters on the partition columns (the cheapest filter there is — the
    files are never opened)."""
    writer = df.write.mode("overwrite").partitionBy(*as_list(partition_by))
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)


def write_sorted_parquet(
    df: DataFrame, path: str, sort_cols: str | Sequence[str], n_files: int = 32
) -> None:
    """Zone-map layout: range-partition on ``sort_cols`` and sort within
    each file, so every row group's parquet min/max statistics cover a
    NARROW, non-overlapping slice of the sort key. A pushed-down range
    predicate then skips whole row groups at the reader (footer stats
    checked before any page I/O) — at 100 TB this is the difference
    between scanning a table and scanning the one-month slice a query
    asks for, without maintaining any index. The write costs one range
    shuffle + per-file sort; do it once at ingest for the columns queries
    filter on (time first).

    ``repartitionByRange`` samples the sort key for balanced ranges, so
    file sizes track the data distribution, not the key space.

    Timestamps are written as TIMESTAMP_MICROS for the duration of the
    write: Spark's default INT96 encoding carries NO parquet min/max
    statistics, which silently disables the very skipping this layout
    exists for (discovered by the footer test — INT96 footers come back
    statistics=None)."""
    cols = as_list(sort_cols)
    spark = df.sparkSession
    conf_key = "spark.sql.parquet.outputTimestampType"
    prev = spark.conf.get(conf_key)
    spark.conf.set(conf_key, "TIMESTAMP_MICROS")
    try:
        (
            df.repartitionByRange(n_files, *cols)
            .sortWithinPartitions(*cols)
            .write.mode("overwrite")
            .parquet(path)
        )
    finally:
        spark.conf.set(conf_key, prev)


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_file_bytes: int = 128 << 20,
) -> int:
    """Small-file compaction (the lakehouse maintenance pass): rewrite a
    fragmented parquet directory into ``ceil(total_bytes /
    target_file_bytes)`` files. Streaming sinks and frequent small batch
    writes leave thousands of KB-sized files; at 100 TB the scan then
    pays one task + one footer read PER FILE, and the driver pays the
    listing — compaction restores files ≈ ``maxPartitionBytes`` so every
    scan task gets one full split. Returns the target file count.

    Sizing uses a local directory listing (this engine's testbed is local
    files); on an object store, size from the FileSystem/catalog listing
    instead — the rewrite itself is identical."""
    import math
    import os as _os

    total = sum(
        e.stat().st_size
        for e in _os.scandir(src_dir)
        if e.is_file() and e.name.endswith(".parquet")
    )
    n = max(1, math.ceil(total / target_file_bytes))
    (
        spark.read.parquet(src_dir)
        .repartition(n)
        .write.mode("overwrite")
        .parquet(dst_dir)
    )
    return n


def write_zorder_parquet(
    df: DataFrame,
    path: str,
    dims: Sequence,
    n_files: int = 32,
    bits: int = 16,
) -> None:
    """Multi-dimensional zone-map layout (the lakehouse OPTIMIZE ZORDER):
    scale each of ``dims`` into ``bits``-bit integers against its own
    in-plan min/max, interleave the bits into one Morton/Z value, then
    range-partition + sort by that value — so every row group's parquet
    min/max statistics are narrow on EVERY listed dimension at once.
    A single-column sorted layout answers range predicates on the sort
    key only; the Z layout trades a little per-dim tightness for
    footer-level skipping on all of them — the right ingest layout when
    a 100-TB fact is filtered sometimes by time, sometimes by key.

    ``dims`` entries are column names or numeric Column expressions
    (pre-convert timestamps to an epoch-day/bigint expression). The
    scaling uses integer DIV arithmetic only (exact for bigint inputs —
    no double rounding at any magnitude); nulls scale to bucket 0. The
    interleave is a plain bitwise expression (``bits`` terms per dim),
    fully inside whole-stage codegen; the Z column itself is dropped
    before the write, so the on-disk schema is untouched. Costs one
    range shuffle + per-file sort, once, at ingest. Timestamps write as
    TIMESTAMP_MICROS for the same reason as write_sorted_parquet: INT96
    carries no statistics."""
    from pyspark.sql import functions as F

    d = len(dims)
    if d < 2:
        raise ValueError("zorder needs >= 2 dims; use write_sorted_parquet")
    if bits * d > 62:
        raise ValueError(f"bits*dims = {bits * d} overflows a signed long")
    spark = df.sparkSession
    tmp = df
    for i, dim in enumerate(dims):
        col = F.col(dim) if isinstance(dim, str) else dim
        tmp = tmp.withColumn(f"__dim{i}", col.cast("bigint"))
    stats = tmp.agg(
        *[
            f(F.col(f"__dim{i}")).alias(f"__{nm}{i}")
            for i in range(d)
            for nm, f in (("min", F.min), ("max", F.max))
        ]
    )
    tmp = tmp.crossJoin(F.broadcast(stats))
    scale = 1 << bits
    # A dimension whose value range approaches 2^63/scale (e.g. a raw
    # epoch-micros column passed directly) would overflow the
    # (value - min) * scale product — raising under ANSI, silently
    # corrupting the Z layout with ANSI off. Pre-shrink wide ranges by an
    # in-plan integer divisor so (value - min) DIV div stays below
    # 2^62/scale; integer division is monotone, so the bucketing (and the
    # Z order it induces) is preserved. The remaining requirement is
    # |max - min| < 2^63, which holds for any real bigint column that is
    # not itself adversarially spanning the full signed-long range.
    safe = (1 << 62) // scale
    for i in range(d):
        tmp = tmp.withColumn(
            f"__div{i}",
            F.expr(
                f"CASE WHEN __max{i} - __min{i} >= {safe}L"
                f" THEN (__max{i} - __min{i}) DIV {safe}L + 1"
                f" ELSE 1L END"
            ),
        )
        tmp = tmp.withColumn(
            f"__u{i}",
            F.expr(
                f"CAST((((coalesce(__dim{i}, __min{i}) - __min{i})"
                f" DIV __div{i}) * {scale})"
                f" DIV ((__max{i} - __min{i}) DIV __div{i} + 1) AS BIGINT)"
            ),
        )
    terms = [
        f"shiftleft(shiftright(__u{i}, {b}) & 1, {b * d + i})"
        for i in range(d)
        for b in range(bits)
    ]
    tmp = tmp.withColumn("__z", F.expr(" | ".join(terms)))
    helper = [f"__dim{i}" for i in range(d)]
    helper += [f"__min{i}" for i in range(d)] + [f"__max{i}" for i in range(d)]
    helper += [f"__u{i}" for i in range(d)] + [f"__div{i}" for i in range(d)]
    conf_key = "spark.sql.parquet.outputTimestampType"
    prev = spark.conf.get(conf_key)
    spark.conf.set(conf_key, "TIMESTAMP_MICROS")
    try:
        (
            tmp.repartitionByRange(n_files, "__z")
            .sortWithinPartitions("__z")
            .drop("__z", *helper)
            .write.mode("overwrite")
            .parquet(path)
        )
    finally:
        spark.conf.set(conf_key, prev)
