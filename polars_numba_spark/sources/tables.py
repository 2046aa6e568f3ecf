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


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Read one table; path layout is ``{sf_dir}/{name}.parquet``.

    Timestamp columns are normalized to session-zone TIMESTAMP (see
    ``_normalize_timestamps``). A legacy fallback also handles
    TIMESTAMP(NANOS) parquet (SPARK-40819: read as raw nanos and
    floor-convert to microseconds, the same truncation DuckDB applies),
    though the current testdata ships plain ``timestamp[us]``.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
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
