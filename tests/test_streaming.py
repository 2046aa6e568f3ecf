"""Structured Streaming tests: the streaming fold (accumulator as keyed
state) must agree with its batch counterpart, and the windowed rollup must
produce identical results in batch and streaming execution (Spark's unified
semantics).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_numba_spark.operators.fold import grouped_fold
from polars_numba_spark.sources import load_stream, load_table
from polars_numba_spark.streaming import streaming_grouped_fold, windowed_rollup

SF = "/root/testdata/sf0.001"


def add_cents(acc, cents):
    return acc + cents


def test_streaming_fold_matches_batch(spark, tmp_path):
    """Stream the events table (availableNow) through the stateful fold and
    compare final per-user accumulators with the batch grouped_fold."""
    batch = load_table(spark, "events", SF).withColumn(
        "cents", F.round(F.col("value") * 100).cast("double")
    )
    expected = {
        r["user_id"]: r["fold"]
        for r in grouped_fold(
            batch, "user_id", add_cents, 0.0, "double",
            columns=["cents"], order_by=["ts", "event_id"],
        ).collect()
    }

    stream = load_stream(spark, "events", SF).withColumn(
        "cents", F.round(F.col("value") * 100).cast("double")
    )
    out = streaming_grouped_fold(
        stream.select("user_id", "ts", "event_id", "cents"),
        "user_id", add_cents, 0.0, "double",
        columns=["cents"], order_by=["ts", "event_id"],
    )
    query = (
        out.writeStream.format("memory")
        .queryName("fold_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert query.awaitTermination(120), "stream did not finish within timeout"
    got = {
        r["user_id"]: r["fold"]
        for r in spark.sql(
            "SELECT user_id, fold FROM fold_stream"
        ).collect()
    }
    assert got == expected


def test_windowed_rollup_batch_stream_parity(spark, tmp_path):
    batch = load_table(spark, "events", SF)
    aggs = {
        "n_events": F.count(F.lit(1)),
        "total_cents": F.sum(F.round(F.col("value") * 100).cast("long")),
    }
    expected = {
        (r["window"]["start"], r["n_events"], r["total_cents"])
        for r in windowed_rollup(batch, "ts", "6 hours", "1 hour", aggs=aggs).collect()
    }

    stream = load_stream(spark, "events", SF)
    out = windowed_rollup(stream, "ts", "6 hours", "1 hour", aggs=aggs)
    query = (
        out.writeStream.format("memory")
        .queryName("rollup_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    assert query.awaitTermination(120), "stream did not finish within timeout"
    got = {
        (r["window"]["start"], r["n_events"], r["total_cents"])
        for r in spark.sql("SELECT * FROM rollup_stream").collect()
    }
    assert got == expected


def test_sessionize_batch_stream_parity(spark, tmp_path):
    """Session windows under readStream (complete mode + watermark) must
    equal the batch sessionization — Spark's unified semantics, pinned."""
    from polars_numba_spark.operators.sessionize import sessionize

    batch = load_table(spark, "events", SF)
    expected = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in sessionize(batch, "ts", gap="30 minutes", group_by="user_id").collect()
    }

    stream = load_stream(spark, "events", SF)
    out = sessionize(
        stream, "ts", gap="30 minutes", group_by="user_id", watermark="1 hour"
    )
    query = (
        out.writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True)
        .start()
    )
    assert query.awaitTermination(120), "stream did not finish within timeout"
    got = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in spark.sql("SELECT * FROM sess_stream").collect()
    }
    assert got == expected


def test_streaming_fold_integer_state_not_degraded(spark, tmp_path):
    """The state store holds PICKLED accumulators — an integer accumulator
    stays an int across micro-batches (the old DoubleType state store would
    silently coerce it to float)."""
    from polars_numba_spark.operators.fold import grouped_fold
    from polars_numba_spark.streaming import streaming_grouped_fold

    stream = load_stream(spark, "events", SF)
    batch = load_table(spark, "events", SF)

    def count_only(acc, v):
        return acc + 1

    sout = streaming_grouped_fold(
        stream.select("user_id", "ts", "event_id", "value"),
        "user_id", count_only, 0, "long",
        columns=["value"], order_by=["ts", "event_id"],
    )
    q = (
        sout.writeStream.format("memory").queryName("fold_int_state")
        .outputMode("update").option("checkpointLocation", str(tmp_path / "ck4"))
        .trigger(availableNow=True).start()
    )
    assert q.awaitTermination(120), "stream did not finish within timeout"
    got = {
        r["user_id"]: r["fold"]
        for r in spark.sql("SELECT * FROM fold_int_state").collect()
    }
    expected = {
        r["user_id"]: r["fold"]
        for r in grouped_fold(batch, "user_id", count_only, 0, "long",
                              columns=["value"], order_by=["ts", "event_id"]).collect()
    }
    assert got == expected and all(isinstance(v, int) for v in got.values())


def test_streaming_exact_dedup(spark, tmp_path):
    """Streaming dedup keeps one row per content digest; count matches the
    batch dedup of the same data."""
    from polars_numba_spark.streaming import streaming_exact_dedup

    batch = load_table(spark, "events", SF).select("event_id", "ts", "event_type")
    expected = streaming_exact_dedup(batch, "event_type").count()  # batch path

    stream = load_stream(spark, "events", SF).select("event_id", "ts", "event_type")
    out = streaming_exact_dedup(stream, "event_type", time_col="ts", watermark="90 days")
    q = (
        out.writeStream.format("memory").queryName("dedup_stream")
        .outputMode("append").option("checkpointLocation", str(tmp_path / "ckd"))
        .trigger(availableNow=True).start()
    )
    assert q.awaitTermination(120), "stream did not finish within timeout"
    got = spark.sql("SELECT COUNT(*) c FROM dedup_stream").collect()[0]["c"]
    assert got == expected == 5  # 5 distinct event types


def test_windowed_rollup_drops_late_rows_past_watermark(spark, tmp_path):
    """The core watermark semantic, pinned end-to-end: once a micro-batch
    advances the watermark past a window's end, late rows for that window
    are DROPPED (append mode emits the window once, without them).

    Timing nuance (real engine behavior, verified): the watermark computed
    from batch N takes effect in batch N+1, and a window is emitted+evicted
    at the end of the first batch that RUNS with the watermark past its
    end — a straggler arriving in that same batch still merges. The drop
    only hits rows arriving after eviction, so the test needs three
    batches under maxFilesPerTrigger=1: A advances event time to 10:30,
    B (filler) runs with watermark 10:20 and evicts+emits [9:00, 9:30),
    C delivers the 9:10 straggler — dropped, the sink keeps the on-time
    count."""
    import time

    from polars_numba_spark.streaming import windowed_rollup

    src = tmp_path / "late_src"
    src.mkdir()

    def write_file(rows, name):
        spark.createDataFrame(rows, "ts timestamp, v long").coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / ("stage_" + name)))
        import glob
        import shutil

        part = glob.glob(str(tmp_path / ("stage_" + name) / "part-*.parquet"))[0]
        shutil.copy(part, str(src / name))

    import datetime as dt

    t = lambda h, m: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    write_file([(t(9, 0), 1), (t(9, 5), 1), (t(10, 30), 1)], "a.parquet")
    time.sleep(1.1)  # file-source processes in mtime order; keep A < B < C
    write_file([(t(10, 31), 1)], "b.parquet")
    time.sleep(1.1)
    write_file([(t(9, 10), 1)], "c.parquet")

    stream = (
        spark.readStream.schema("ts timestamp, v long")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    rolled = windowed_rollup(
        stream, "ts", window_duration="30 minutes", watermark="10 minutes"
    )
    query = (
        rolled.writeStream.format("memory")
        .queryName("late_rollup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_late"))
        .trigger(availableNow=True)
        .start()
    )
    assert query.awaitTermination(120), "stream did not finish within timeout"
    got = {
        (r["window"]["start"], r["n_events"])
        for r in spark.sql("SELECT * FROM late_rollup").collect()
    }
    # [9:00, 9:30) emitted with the 2 on-time events; the 9:10 straggler
    # arrived after the watermark passed 9:30 and must NOT be counted.
    assert (t(9, 0), 2) in got, got
    assert (t(9, 0), 3) not in got, got


def test_streaming_dedup_state_expires_past_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark's contract, pinned end-to-end: a
    duplicate arriving while the digest is in state is suppressed, but one
    arriving after the watermark expired the digest is emitted AGAIN (the
    duplicates-arrive-close-together contract — state is bounded, not a
    forever-set). Like window eviction, state expiry lags the watermark by
    one batch (the watermark computed from batch N takes effect in N+1 and
    expiry happens at the end of the batch that runs with it), so four
    mtime-ordered batches: the original, an advance, a filler during which
    the digest expires, then the re-arrival."""
    import datetime as dt
    import glob
    import shutil
    import time

    from polars_numba_spark.streaming import streaming_exact_dedup

    src = tmp_path / "dedup_src"
    src.mkdir()

    def write_file(rows, name):
        spark.createDataFrame(rows, "ts timestamp, text string").coalesce(
            1
        ).write.mode("overwrite").parquet(str(tmp_path / ("stage_" + name)))
        part = glob.glob(str(tmp_path / ("stage_" + name) / "part-*.parquet"))[0]
        shutil.copy(part, str(src / name))

    t = lambda h, m: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    write_file([(t(9, 0), "dup"), (t(9, 0, ), "dup"), (t(9, 0), "other")], "a.parquet")
    time.sleep(1.1)
    write_file([(t(12, 0), "advance")], "b.parquet")  # watermark → 11:59
    time.sleep(1.1)
    write_file([(t(12, 0), "filler")], "b2.parquet")  # expiry runs this batch
    time.sleep(1.1)
    write_file([(t(12, 1), "dup")], "c.parquet")  # digest expired → re-emitted

    stream = (
        spark.readStream.schema("ts timestamp, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    out = streaming_exact_dedup(stream, "text", time_col="ts", watermark="1 minute")
    query = (
        out.writeStream.format("memory")
        .queryName("dedup_expiry")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    assert query.awaitTermination(120), "stream did not finish within timeout"
    emitted = [r["text"] for r in spark.sql("SELECT * FROM dedup_expiry").collect()]
    # batch A: "dup" once (in-state duplicate suppressed) + "other";
    # batch C: "dup" again — its digest expired when the watermark passed
    assert sorted(emitted) == ["advance", "dup", "dup", "filler", "other"], emitted


def test_streaming_kmv_batch_split_invariant(spark, tmp_path):
    """The KMV state merge (union -> keep k smallest) is associative, so a
    forced 3-batch run (maxFilesPerTrigger=1) must land on the SAME final
    estimate as the batch kmv_distinct over the union of the files."""
    from polars_numba_spark.operators.sketch import kmv_distinct
    from polars_numba_spark.streaming import streaming_kmv_distinct

    src = tmp_path / "src"
    batch = load_table(spark, "events", SF).select("event_type", "user_id")
    # three disjoint slices, one file each -> three micro-batches
    for i in range(3):
        batch.where(F.pmod(F.col("user_id"), F.lit(3)) == i).coalesce(
            1
        ).write.mode("append").parquet(str(src))

    expected = {
        r["event_type"]: round(r["kmv_estimate"], 6)
        for r in kmv_distinct(
            spark.read.parquet(str(src)), "user_id", "event_type", k=32
        ).collect()
    }

    stream = spark.readStream.schema(batch.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src))
    out = streaming_kmv_distinct(stream, "user_id", "event_type", k=32)
    query = (
        out.writeStream.format("memory")
        .queryName("kmv_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert query.awaitTermination(120), "stream did not finish in time"
        got = {
            r["event_type"]: round(r["est"], 6)
            for r in spark.sql(
                "SELECT event_type, max_by(kmv_estimate, batches_seen) AS est "
                "FROM kmv_stream GROUP BY event_type"
            ).collect()
        }
    finally:
        spark.sql("DROP TABLE IF EXISTS kmv_stream")
    assert got == expected


def test_streaming_latest_snapshot_batch_split_invariant(spark, tmp_path):
    """The last-write-wins merge (newer beats older) is associative and
    commutative, so a forced 3-batch run must land on the SAME snapshot as
    the batch latest_snapshot over the union of the files — including when
    the winning row arrives in an EARLY batch."""
    from polars_numba_spark.operators.cdc import latest_snapshot
    from polars_numba_spark.streaming import streaming_latest_snapshot

    src = tmp_path / "lww_src"
    batch = load_table(spark, "events", SF).select(
        "user_id", "event_id", "event_type", "ts"
    )
    # slice by event_id mod 3: winners land in arbitrary batches
    for i in range(3):
        batch.where(F.pmod(F.col("event_id"), F.lit(3)) == i).coalesce(
            1
        ).write.mode("append").parquet(str(src))

    expected = {
        r["user_id"]: (r["event_id"], r["event_type"])
        for r in latest_snapshot(
            spark.read.parquet(str(src)), "user_id", "ts", tiebreak="event_id"
        ).collect()
    }

    stream = spark.readStream.schema(batch.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src))
    out = streaming_latest_snapshot(
        stream, keys="user_id", seq_col="ts", tiebreak="event_id"
    )
    query = (
        out.writeStream.format("memory")
        .queryName("lww_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "lww_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert query.awaitTermination(120), "stream did not finish in time"
        got = {
            r["user_id"]: (r["event_id"], r["event_type"])
            for r in spark.sql(
                "SELECT user_id, max_by(event_id, batches_seen) AS event_id, "
                "max_by(event_type, batches_seen) AS event_type "
                "FROM lww_stream GROUP BY user_id"
            ).collect()
        }
    finally:
        spark.sql("DROP TABLE IF EXISTS lww_stream")
    assert got == expected


def test_stream_stream_outer_join_emits_unmatched(spark):
    """The LEFT OUTER stream-stream join must emit BOTH faces: matched
    signup→purchase pairs AND null-purchase rows for signups that never
    converted — the latter only exist if the sentinel punctuation actually
    advances the watermark past the bounded stream's tail (without it, the
    unmatched tail stays buffered in the join state forever and the result
    silently equals the inner join)."""
    from polars_numba_spark.queries.io_streaming import (
        streaming_signup_conversion_outer,
    )

    got = streaming_signup_conversion_outer(spark, SF).toPandas()

    ev = load_table(spark, "events", SF).where(
        F.col("event_type").isin("signup", "purchase")
    )
    s = ev.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        "user_id",
        F.col("ts").alias("signup_ts"),
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    want = (
        s.join(
            p,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_ts") >= F.col("signup_ts"))
            & (F.col("purchase_ts") <= F.col("signup_ts") + F.expr("INTERVAL 7 DAYS")),
            "left",
        )
        .select("signup_id", "user_id", "signup_ts", "purchase_id", "purchase_ts")
        .toPandas()
    )
    assert len(got) == len(want)
    n_unmatched = int(want["purchase_id"].isna().sum())
    assert n_unmatched > 0, "corpus has no unmatched signups — test is vacuous"
    assert int(got["purchase_id"].isna().sum()) == n_unmatched
    key = lambda df: sorted(  # noqa: E731
        zip(df["signup_id"].tolist(),
            [None if x != x else int(x) for x in df["purchase_id"]])
    )
    assert key(got) == key(want)


def test_stream_stream_join_state_is_evicted(spark, tmp_path):
    """The watermark must BOUND the join state, not just gate output: after
    the sentinel advances it, the state stores shed the buffered real rows.
    Asserted from the engine's own state-operator metrics (numRowsTotal per
    micro-batch), not inferred from output."""
    import datetime as dt
    import os
    import time as _time

    staging = str(tmp_path / "stage")
    rows = []
    t0 = dt.datetime(2020, 1, 1)
    for i in range(500):
        rows.append((i, i % 50, "signup", t0 + dt.timedelta(minutes=i)))
        rows.append((1000 + i, i % 50, "purchase", t0 + dt.timedelta(minutes=i, seconds=30)))
    df = spark.createDataFrame(rows, "event_id long, user_id long, event_type string, ts timestamp")
    df.coalesce(2).write.parquet(os.path.join(staging, "real"))
    sent = spark.range(2).select(
        F.lit(-1).cast("long").alias("event_id"),
        F.lit(-1).cast("long").alias("user_id"),
        F.when(F.col("id") == 0, F.lit("signup")).otherwise(F.lit("purchase")).alias("event_type"),
        F.lit(t0 + dt.timedelta(days=400)).alias("ts"),
    )
    for tag, bump in [("sa", 60), ("sb", 120)]:
        p = os.path.join(staging, tag)
        sent.coalesce(1).write.parquet(p)
        now = _time.time()
        for f in os.listdir(p):
            os.utime(os.path.join(p, f), (now + bump, now + bump))

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(os.path.join(staging, "*"))
    )
    s = (
        stream.where(F.col("event_type") == "signup")
        .select(F.col("event_id").alias("signup_id"), "user_id", F.col("ts").alias("signup_ts"))
        .withWatermark("signup_ts", "10 minutes")
    )
    p = (
        stream.where(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"), F.col("user_id").alias("p_user_id"), F.col("ts").alias("purchase_ts"))
        .withWatermark("purchase_ts", "10 minutes")
    )
    j = s.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("signup_ts"))
        & (F.col("purchase_ts") <= F.col("signup_ts") + F.expr("INTERVAL 1 HOUR")),
        "leftOuter",
    )
    q = (
        j.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    totals = [
        sop["numRowsTotal"]
        for pr in q.recentProgress
        for sop in pr["stateOperators"]
        if pr["stateOperators"]
    ]
    assert totals, "no state-operator metrics captured"
    peak, final = max(totals), totals[-1]
    # real rows buffered at peak; after the sentinel batches only the
    # sentinels themselves (and nothing from the real window) may remain
    assert peak >= 1000, totals
    assert final <= 4, totals


def test_foreach_batch_upsert_sink_is_exactly_once(spark, tmp_path):
    """The versioned-snapshot sink must (a) equal the batch last-write-wins
    snapshot after a real streamed run, and (b) be IDEMPOTENT: replaying a
    committed micro-batch (foreachBatch's at-least-once failure mode)
    leaves the published state byte-identical."""
    import os

    from polars_numba_spark.operators.cdc import latest_snapshot
    from polars_numba_spark.streaming.sinks import (
        read_snapshot,
        upsert_batch_handler,
    )

    events = load_table(spark, "events", SF).select(
        "user_id", "event_id", "ts", "event_type"
    )
    staging = str(tmp_path / "stage")
    events.repartition(4).write.parquet(staging)

    snap_dir = str(tmp_path / "snap")
    handler = upsert_batch_handler(
        spark, snap_dir, "user_id", "ts", tiebreak="event_id"
    )
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")  # force multiple micro-batches
        .parquet(staging)
    )
    q = (
        stream.writeStream.foreachBatch(handler)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)

    got = read_snapshot(spark, snap_dir).orderBy("user_id").toPandas()
    want = (
        latest_snapshot(events, "user_id", "ts", tiebreak="event_id")
        .select(got.columns.tolist())
        .orderBy("user_id")
        .toPandas()
    )
    assert got.equals(want)

    # replay the LAST committed batch verbatim: published state must not move
    last = max(
        int(n[1:]) for n in os.listdir(snap_dir)
        if n.startswith("v") and n[1:].isdigit()
    )
    before = sorted(os.listdir(snap_dir))
    handler(events.limit(50), last)          # replayed batch id
    handler(events.limit(50), last - 1)      # stale batch id
    assert sorted(os.listdir(snap_dir)) == before
    again = read_snapshot(spark, snap_dir).orderBy("user_id").toPandas()
    assert again.equals(want)


def test_streaming_hll_batch_split_invariant(spark, tmp_path):
    """The HLL register merge (elementwise max) is associative, commutative
    AND idempotent, so a forced 3-batch run (maxFilesPerTrigger=1) — with
    one slice written TWICE to simulate replay — must land on the exact
    same registers, and therefore bit-identical estimate, as the batch
    hll_distinct over the distinct union."""
    from polars_numba_spark.operators.sketch import hll_distinct, hll_estimate_expr
    from polars_numba_spark.streaming import streaming_hll_distinct

    src = tmp_path / "src"
    batch = load_table(spark, "events", SF).select("event_type", "user_id")
    for i in range(3):
        batch.where(F.pmod(F.col("user_id"), F.lit(3)) == i).coalesce(
            1
        ).write.mode("append").parquet(str(src))
    # replayed slice: duplicate delivery must not move any register
    batch.where(F.pmod(F.col("user_id"), F.lit(3)) == 0).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))

    expected = {
        r["event_type"]: (r["n_registers"], r["hll_estimate"])
        for r in hll_distinct(batch, "user_id", "event_type", p=12).collect()
    }

    stream = spark.readStream.schema(batch.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src))
    out = streaming_hll_distinct(stream, "user_id", "event_type", p=12)
    query = (
        out.writeStream.format("memory")
        .queryName("hll_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert query.awaitTermination(120), "stream did not finish in time"
        final = spark.sql(
            "SELECT event_type, "
            "max_by(struct(n_registers, z_present), batches_seen) AS st "
            "FROM hll_stream GROUP BY event_type"
        )
        got = {
            r["event_type"]: (r["n_registers"], r["est"])
            for r in final.select(
                "event_type",
                F.col("st.n_registers").cast("int").alias("n_registers"),
                F.round(
                    hll_estimate_expr(
                        F.col("st.n_registers").cast("int"),
                        F.col("st.z_present"),
                        p=12,
                    ),
                    6,
                ).alias("est"),
            ).collect()
        }
    finally:
        spark.sql("DROP TABLE IF EXISTS hll_stream")
    assert got == expected


def test_streaming_cms_batch_split_invariant(spark, tmp_path):
    """CMS counters add (the count-min merge), so a forced 3-batch
    complete-mode run must land on the EXACT counter table cms_build
    produces over the union of the files — every (j, bucket, cnt) row
    equal, not just the probed estimates."""
    from polars_numba_spark.operators.sketch import cms_build, cms_coords

    src = tmp_path / "cms_src"
    batch = load_table(spark, "events", SF).select("user_id")
    for i in range(3):
        batch.where(F.pmod(F.col("user_id"), F.lit(3)) == i).coalesce(
            1
        ).write.mode("append").parquet(str(src))

    expected = sorted(
        tuple(r)
        for r in cms_build(
            spark.read.parquet(str(src)), "user_id", depth=4, width=256
        ).collect()
    )

    stream = spark.readStream.schema(batch.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src))
    agg = (
        cms_coords(stream, "user_id", depth=4, width=256)
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    query = (
        agg.writeStream.format("memory")
        .queryName("cms_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "cms_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert query.awaitTermination(120), "stream did not finish in time"
        got = sorted(
            tuple(r) for r in spark.table("cms_stream").collect()
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS cms_stream")
    assert got == expected
