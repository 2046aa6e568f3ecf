"""PNS_CHECKPOINT_MODE=reliable (VERDICT r14 #8): the tracked-checkpoint
helper must route through Spark's reliable checkpoint (checkpoint-dir
backed, survives executor loss) instead of non-replicated executor blocks,
with results and the release() contract unchanged."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from polars_numba_spark.plans import checkpoint as CK


@pytest.fixture
def reliable_env(tmp_path, monkeypatch):
    monkeypatch.setenv("PNS_CHECKPOINT_MODE", "reliable")
    monkeypatch.setenv("PNS_CHECKPOINT_DIR", str(tmp_path / "ck"))
    yield


def test_reliable_mode_checkpoints_and_releases(spark, reliable_env):
    df = spark.range(100).withColumn("x", F.col("id") * 2)
    out, ids = CK.tracked_local_checkpoint(df)
    # reliable checkpoints create no persistent-RDD blocks to track
    assert ids == set()
    assert out.count() == 100
    assert sorted(r["x"] for r in out.collect())[:3] == [0, 2, 4]
    # the checkpoint dir was actually used
    ckdir = str(spark.sparkContext._jsc.sc().getCheckpointDir().get())
    assert "ck" in ckdir
    # release of an empty id set is a no-op, not an error
    CK.release(spark, ids)


def test_default_mode_unchanged(spark, monkeypatch):
    monkeypatch.delenv("PNS_CHECKPOINT_MODE", raising=False)
    df = spark.range(10)
    out, ids = CK.tracked_local_checkpoint(df)
    assert out.count() == 10
    assert ids  # local mode tracks the new persistent-RDD blocks
    CK.release(spark, ids)


def test_reliable_mode_without_dir_raises(spark, monkeypatch):
    monkeypatch.setenv("PNS_CHECKPOINT_MODE", "reliable")
    monkeypatch.delenv("PNS_CHECKPOINT_DIR", raising=False)
    if not spark.sparkContext._jsc.sc().getCheckpointDir().isEmpty():
        pytest.skip("checkpoint dir already set in this session")
    with pytest.raises(RuntimeError, match="PNS_CHECKPOINT_DIR"):
        CK.tracked_local_checkpoint(spark.range(3))
