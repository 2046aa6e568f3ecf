from __future__ import annotations

import os

import pytest

# Spark's Python workers import step functions defined in test modules by
# reference; make the tests dir importable in workers (must be set before the
# JVM/gateway launches so the env propagates).
_TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
os.environ["PYTHONPATH"] = (
    _TESTS_DIR + os.pathsep + os.environ.get("PYTHONPATH", "")
)

from polars_numba_spark import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    extra = {}
    if os.environ.get("PNS_TEST_TINY_BATCHES"):
        # adversarial batching: exercises every batch-boundary carry path
        extra["spark.sql.execution.arrow.maxRecordsPerBatch"] = "19"
    s = get_spark(
        app_name="polars-numba-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf=extra or None,
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
