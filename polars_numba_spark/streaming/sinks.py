"""Exactly-once keyed snapshot sink on top of foreachBatch.

Structured Streaming's ``foreachBatch`` gives at-least-once delivery:
after a crash between "batch function ran" and "offsets committed", the
SAME micro-batch (same ``batch_id``) is replayed. A sink that applies a
batch twice corrupts any non-idempotent target. The standard fix, built
here without a table format:

- the snapshot is a sequence of immutable versions
  ``<dir>/v<batch_id>/`` plus a ``_LATEST`` pointer file — readers
  resolve the pointer, writers never mutate a published version
  (object-store-safe: no directory rename, the pointer write is the
  single atomic publish);
- each batch merges into the CURRENT version via
  :func:`~polars_numba_spark.operators.cdc.merge_upsert` and publishes
  ``v<batch_id>``; a REPLAYED batch finds its version already published
  and skips — applying batch N twice yields byte-identical state
  (idempotence = exactly-once effect under at-least-once delivery);
- versions ≤ the published one are retained for readers-in-flight and
  pruned opportunistically (everything older than the previous version).

At cluster scale the merge is one window shuffle on the merge keys per
micro-batch (merge_upsert), and the snapshot read is a plain parquet
scan of one version directory.
"""

from __future__ import annotations

import os
import shutil
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from polars_numba_spark.operators.cdc import merge_upsert


def _latest_version(snapshot_dir: str) -> int | None:
    ptr = os.path.join(snapshot_dir, "_LATEST")
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        return int(f.read().strip())


def read_snapshot(spark: SparkSession, snapshot_dir: str) -> DataFrame | None:
    """Resolve the pointer and read the current snapshot version."""
    v = _latest_version(snapshot_dir)
    if v is None:
        return None
    return spark.read.parquet(os.path.join(snapshot_dir, f"v{v}"))


def upsert_batch_handler(
    spark: SparkSession,
    snapshot_dir: str,
    keys: str | Sequence[str],
    seq_col: str,
    tiebreak: str | Sequence[str] = (),
):
    """Returns the ``foreachBatch`` function. Use as::

        handler = upsert_batch_handler(spark, dir, "user_id", "ts", "event_id")
        stream.writeStream.foreachBatch(handler)...
    """

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        os.makedirs(snapshot_dir, exist_ok=True)
        vdir = os.path.join(snapshot_dir, f"v{batch_id}")
        current = _latest_version(snapshot_dir)
        if current is not None and batch_id <= current:
            # replayed batch: its effects are already in (or superseded by)
            # the published state — the idempotent skip
            return
        base = read_snapshot(spark, snapshot_dir)
        if base is None:
            merged = merge_upsert(
                batch_df.limit(0), batch_df, keys, seq_col, tiebreak
            )
        else:
            merged = merge_upsert(base, batch_df, keys, seq_col, tiebreak)
        merged.write.mode("overwrite").parquet(vdir)
        # single atomic publish: the pointer flips only after v<id> is
        # fully written; a crash before this line leaves the previous
        # version current and the replay rewrites v<id> from scratch
        tmp = os.path.join(snapshot_dir, "_LATEST.tmp")
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.replace(tmp, os.path.join(snapshot_dir, "_LATEST"))
        # prune versions older than the PREVIOUS one (kept for readers
        # that resolved the pointer just before the flip)
        if current is not None:
            for name in os.listdir(snapshot_dir):
                if name.startswith("v") and name[1:].isdigit():
                    if int(name[1:]) < current:
                        shutil.rmtree(
                            os.path.join(snapshot_dir, name), ignore_errors=True
                        )

    return handle
