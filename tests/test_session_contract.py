"""Session-configuration contract: the defaults the engine's scale posture
depends on must actually be set by get_spark()."""

from __future__ import annotations


def test_session_defaults(spark):
    conf = spark.conf
    assert conf.get("spark.sql.adaptive.enabled") == "true"
    assert conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    assert conf.get("spark.sql.execution.arrow.pyspark.enabled") == "true"
    # reference chunk-size parity (ref __init__.py:344: 50k-row batches)
    assert conf.get("spark.sql.execution.arrow.maxRecordsPerBatch") == "50000"
    assert conf.get("spark.sql.session.timeZone") == "UTC"


def test_worker_reuse_keeps_compile_cache_warm(spark):
    """spark.python.worker.reuse mirrors the reference's _NUMBA_CACHE
    amortization (ref __init__.py:167) — pinned as part of the contract."""
    sc = spark.sparkContext
    assert sc.getConf().get("spark.python.worker.reuse") == "true"
