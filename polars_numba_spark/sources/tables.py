"""Loaders for the driver's TPC-H-ish parquet tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}/``.

Scale notes: each loader is a plain ``spark.read.parquet`` so Catalyst can
push filters into the scan and prune columns/partitions. The small dimension
tables (region, nation, supplier, part, customer at low SF) are ideal
broadcast-join candidates; query code marks them with ``F.broadcast``
explicitly rather than trusting the 10 MB autoBroadcast threshold at
cluster scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _normalize_timestamps(df: DataFrame) -> DataFrame:
    """Cast every TIMESTAMP_NTZ column to session-zone TIMESTAMP (LTZ).

    The testdata parquet stores naive ``timestamp[us]``, which Spark 4
    infers as TIMESTAMP_NTZ — a dialect half the engine rejects:
    ``withWatermark`` raises EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE and
    NTZ→DOUBLE casts are illegal. The engine runs with
    ``spark.sql.session.timeZone=UTC`` (session.py), so the cast is
    wall-clock-preserving and oracle-exact (DuckDB reads the same naive
    micros). Normalizing ONCE here gives every downstream operator a single
    timestamp dialect — the round-3 driver bench crash came from exactly
    this drift (VERDICT r3 §What's wrong 1-2).
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    ntz_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, T.TimestampNTZType)]
    for c in ntz_cols:
        df = df.withColumn(c, F.col(c).cast(T.TimestampType()))
    return df


def _conf_bytes(spark: SparkSession, key: str, default: int) -> int:
    """A byte-valued Spark conf as int (accepts '134217728', '128m', '1g')."""
    try:
        raw = str(spark.conf.get(key)).strip().lower()
    except Exception:
        return default
    mult = 1
    for suffix, m in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30), ("b", 1)):
        if raw.endswith(suffix):
            raw = raw[: -len(suffix)]
            mult = m
            break
    try:
        return int(float(raw) * mult)
    except ValueError:
        return default


def _parallelize_underscplit_scan(
    spark: SparkSession, df: DataFrame, path: str
) -> DataFrame:
    """Round-robin-repartition a scan whose INPUT SPLIT COUNT is below the
    core count — the under-split-input hazard (guide §2.5 "input skew",
    SCALE.md round-13 split-sizing lesson): a table that fits in fewer
    splits than cores serializes every scan-side computation (tokenize /
    shingle-explode / hash / pair-scoring — the bulk of this engine's
    CPU) onto that many tasks. Measured at sf0.1 (r14): the single-file
    tables plan exactly ONE scan task, so CPU-bound faces ran at
    parallelism ≈ 1 of 32 (embedding_near_dup_pairs: 6 CPU-s ≈ 5.3s
    wall single-task; 0.9s wall after this change).

    Scale-adaptive by construction: the split estimate is driver-side
    metadata only (Hadoop ContentSummary / maxPartitionBytes — correct
    for any filesystem scheme), and any input big enough to fill the
    cluster's cores (≥ cores × maxPartitionBytes, e.g. any 100 TB table)
    takes the no-op branch, so production scans keep their native splits
    and pay no extra exchange. Filter pushdown and column pruning pass
    through Repartition (verified in the plan: PushedFilters/ReadSchema
    unchanged), and the round-robin is deterministic under retry (Spark
    sorts before round-robin repartition, SPARK-23207). Kill switch:
    PNS_SCAN_PARALLELIZE=0.
    """
    if os.environ.get("PNS_SCAN_PARALLELIZE") == "0":
        return df
    par = spark.sparkContext.defaultParallelism
    try:
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        size = fs.getContentSummary(hpath).getLength()
    except Exception:
        return df  # unreadable metadata: keep the native scan
    max_bytes = _conf_bytes(
        spark, "spark.sql.files.maxPartitionBytes", 128 << 20
    )
    est_splits = max(1, -(-int(size) // max(1, max_bytes)))
    if est_splits >= par:
        return df
    return df.repartition(par)


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Read one table; path layout is ``{sf_dir}/{name}.parquet``.

    Timestamp columns are normalized to session-zone TIMESTAMP (see
    ``_normalize_timestamps``). A legacy fallback also handles
    TIMESTAMP(NANOS) parquet (SPARK-40819: read as raw nanos and
    floor-convert to microseconds, the same truncation DuckDB applies),
    though the current testdata ships plain ``timestamp[us]``.
    Under-split inputs are repartitioned to the core count — see
    :func:`_parallelize_underscplit_scan`.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = _parallelize_underscplit_scan(spark, spark.read.parquet(path), path)
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return _normalize_timestamps(df)


def load_stream(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Read one table as a Structured Streaming source (file stream over the
    same parquet; schema taken from a batch read so the nanos→µs events
    conversion applies identically)."""
    batch = load_table(spark, name, sf_dir)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, f"{name}.parquet")
    raw_schema = spark.read.parquet(path).schema
    # the file-stream source only accepts DIRECTORIES; pathGlobFilter only
    # matches LEAF file names. So: a table materialized as a parquet
    # directory (part-files inside, e.g. the scale-soak builds) streams by
    # its own path, while a single-file table (the testdata layout, where
    # the glob form is the only one the source accepts) streams the parent
    # filtered to that file. The old glob-always form silently streamed
    # ZERO rows for directory-shaped tables.
    if os.path.isdir(path):
        stream = spark.readStream.schema(raw_schema).parquet(path)
    else:
        stream = (
            spark.readStream.schema(raw_schema)
            .option("pathGlobFilter", f"{name}.parquet")
            .parquet(sf_dir)
        )
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        if isinstance(raw_schema["ts"].dataType, T.LongType):
            stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    stream = _normalize_timestamps(stream)
    assert stream.schema == batch.schema
    return stream


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Read all tables into a dict keyed by table name."""
    return {name: load_table(spark, name, sf_dir) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Read all tables and register them as temp views for ``spark.sql``."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
