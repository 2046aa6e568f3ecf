"""Driver-gated queries for the I/O-format and Structured Streaming
surfaces — the two SURVEY.md §2.B families that previously had pytest
coverage but no CORRECTNESS row.

Both queries keep the (spark, sf_dir) -> batch DataFrame contract:

- the formats query materializes a deterministic slice of ``orders`` as CSV
  and JSON-lines, reads both back through the schema-mandatory readers, and
  aggregates — the oracle aggregates the same slice straight off parquet, so
  any value lost or mangled in either text codec (double shortest-roundtrip,
  ISO-8601 timestamps) breaks the hash;
- the streaming query runs a real Structured Streaming job (file source →
  event-time tumbling windows → memory sink, ``availableNow`` trigger) and
  returns the sink table; with bounded input the final streaming state must
  equal the batch aggregate the oracle computes.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polars_numba_spark.queries.catalog import (
    _DSUM,
    SCAN_BALANCE_ORACLE,
    _t,
    register,
)
from polars_numba_spark.sources import load_stream
from polars_numba_spark.sources.formats import (
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
    write_partitioned_parquet,
)
from polars_numba_spark.streaming import windowed_rollup


def _scratch_dir(tag: str, sf_dir: str) -> str:
    """Deterministic per-(tag, sf) scratch dir: the lazily-returned
    DataFrame still references these files when the caller collects, so
    they cannot be deleted here — instead every rerun overwrites the SAME
    directory (mode 'overwrite'), bounding disk at one copy per sf rather
    than one per invocation."""
    sf_key = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), f"pns_{tag}_{sf_key}")
    os.makedirs(path, exist_ok=True)
    return path


@register(
    "formats_csv_jsonl_roundtrip",
    oracle=f"""
    SELECT fmt, o_orderstatus, COUNT(*) AS n_orders,
           {_DSUM.format(x='o_totalprice')} AS total_price,
           CAST(MAX(o_orderdate) AS TIMESTAMP) AS last_order
    FROM orders, (SELECT UNNEST(['csv', 'jsonl']) AS fmt) f
    WHERE o_orderkey < 5000
    GROUP BY fmt, o_orderstatus
    """,
)
def formats_csv_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV + JSON-lines round-trip differential: parquet slice → write both
    text formats → schema-mandatory read back → per-format aggregate. The
    oracle computes the identical aggregate from parquet for each format
    tag, so the hash proves byte-exact codec round-trips (doubles survive
    via shortest-roundtrip repr, timestamps via ISO-8601 at UTC)."""
    base = _scratch_dir("formats", sf_dir)
    o = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") < 5000)
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    )
    write_csv(o, f"{base}/csv")
    write_jsonl(o, f"{base}/jsonl")
    schema = (
        "o_orderkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp"
    )
    c = read_csv(spark, f"{base}/csv", schema).withColumn("fmt", F.lit("csv"))
    j = read_jsonl(spark, f"{base}/jsonl", schema).withColumn("fmt", F.lit("jsonl"))
    return (
        c.unionByName(j)
        .groupBy("fmt", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr(_DSUM.format(x="o_totalprice")).alias("total_price"),
            F.max("o_orderdate").alias("last_order"),
        )
    )


@register(
    "formats_partitioned_pruning",
    oracle=f"""
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           {_DSUM.format(x='o_totalprice')} AS total_price
    FROM orders WHERE o_orderstatus = 'O'
    GROUP BY o_orderstatus
    """,
)
def formats_partitioned_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-layout partitioned parquet end-to-end: write orders partitioned
    by o_orderstatus, read back with a filter on the partition column —
    non-matching partition directories are never opened (partition pruning,
    asserted in tests/test_formats.py) — and aggregate; the oracle computes
    the same aggregate from the unpartitioned source."""
    base = _scratch_dir("part", sf_dir)
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    write_partitioned_parquet(o, base, "o_orderstatus")
    back = spark.read.parquet(base).where(F.col("o_orderstatus") == "O")
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.expr(_DSUM.format(x="o_totalprice")).alias("total_price"),
    )


@register(
    "streaming_daily_rollup",
    oracle="""
    SELECT time_bucket(INTERVAL '1 day', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM events
    GROUP BY 1, 2
    """,
)
def streaming_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The windowed rollup executed as an actual Structured Streaming job:
    file-stream the events parquet, event-time 1-day tumbling windows per
    event_type, complete-mode memory sink, availableNow trigger. Bounded
    input ⇒ the final sink state must equal the batch aggregate (Spark's
    unified semantics), which the oracle computes independently — a hard
    driver signal for the streaming engine path, not just its batch twin."""
    stream = load_stream(spark, "events", sf_dir)
    out = windowed_rollup(
        stream,
        "ts",
        "1 day",
        group_by=["event_type"],
        aggs={
            "n_events": F.count(F.lit(1)),
            "total_cents": F.sum(F.round(F.col("value") * 100).cast("long")),
        },
    )
    sink = f"pns_stream_daily_{uuid.uuid4().hex[:8]}"
    query = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    if not query.awaitTermination(300):
        query.stop()
        raise TimeoutError(
            "streaming_daily_rollup: availableNow stream did not finish in "
            "300s — refusing to return a partial complete-mode aggregate"
        )
    return spark.table(sink).select(
        F.col("window.start").alias("window_start"),
        "event_type",
        "n_events",
        "total_cents",
    )


@register(
    "streaming_scan_user_balance",
    oracle=SCAN_BALANCE_ORACLE.format(alias="scan"),
)
def streaming_scan_user_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STATEFUL STREAMING kernel scan through the hard gate: per-user
    running balance via applyInPandasWithState (accumulator in the state
    store), driven as a real availableNow job into a memory sink, compared
    against the plain SQL window oracle (shared with the batch kernel and
    SQL-UDTF spellings — SCAN_BALANCE_ORACLE). Append mode emits one output
    row per input event (10k at the correctness SF, 100k at bench sf0.1).

    Oracle equality requires the table to arrive as ONE micro-batch:
    ``order_by`` sorts within a batch, and cross-batch order is arrival
    order (the documented streaming caveat). That holds here — the table is
    a single parquet file and no maxFilesPerTrigger is set — and the batch
    count is ASSERTED after termination rather than assumed, so a future
    multi-file testdata layout fails loudly instead of hash-mismatching."""
    from polars_numba_spark.streaming import streaming_grouped_scan

    stream = load_stream(spark, "events", sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long")
    )

    def add(acc, cents):
        return acc + cents

    out = streaming_grouped_scan(
        stream.select("user_id", "event_id", "ts", "cents"),
        "user_id",
        add,
        0,
        "long",
        columns=["cents"],
        order_by=["ts", "event_id"],
    )
    run_id = uuid.uuid4().hex[:8]
    sink = f"pns_stream_scan_{run_id}"
    # fresh checkpoint per run (a reused one would mark the file processed
    # and emit nothing); removed after termination — the memory sink holds
    # the results, the state store is not needed once the query stops
    ckpt = os.path.join(tempfile.gettempdir(), f"pns_ckpt_{run_id}")
    query = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not query.awaitTermination(300):
            query.stop()
            raise TimeoutError(
                "streaming_scan_user_balance: stream did not finish in 300s"
            )
        fed = [p for p in query.recentProgress if p["numInputRows"] > 0]
        if len(fed) > 1:
            raise RuntimeError(
                f"streaming_scan_user_balance: input arrived in {len(fed)} "
                "micro-batches — per-batch ordering no longer matches the "
                "global window oracle (multi-file testdata?)"
            )
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(sink).select("user_id", "event_id", "scan")


@register(
    "streaming_dedup_docs",
    oracle="""
    SELECT COUNT(*) AS n_unique,
           CAST(SUM(CAST(length(text) AS BIGINT)) AS BIGINT) AS total_chars
    FROM (SELECT DISTINCT text FROM documents)
    """,
)
def streaming_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup as a REAL streaming job: file-stream the
    documents table through streaming_exact_dedup (stateful first-arrival
    per content digest), availableNow → memory sink, then aggregate the
    sink. Which copy survives a digest race is arbitrary across partitions,
    so the result projects only digest-determined values (count + summed
    text length over distinct texts) — deterministic regardless of arrival
    order, and equal to the batch DISTINCT the oracle computes."""
    from polars_numba_spark.streaming import streaming_exact_dedup

    stream = load_stream(spark, "documents", sf_dir)
    deduped = streaming_exact_dedup(stream, "text")
    sink = f"pns_stream_dedup_{uuid.uuid4().hex[:8]}"
    query = (
        deduped.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not query.awaitTermination(300):
        query.stop()
        raise TimeoutError("streaming_dedup_docs: stream did not finish in 300s")
    return spark.table(sink).agg(
        F.count(F.lit(1)).alias("n_unique"),
        F.sum(F.length("text").cast("long")).cast("long").alias("total_chars"),
    )
