"""r15 phase profiler for the two iterative faces the VERDICT flags:
streaming_neardup_keeplist (per-batch overhead) and dedup_clusters
(per-round component loop). Times each sub-phase with perf_counter and
prints a breakdown; read-only diagnostics, not part of any query path.

Usage: python tools/profile_r15.py [neardup|clusters]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _mark(label, t0):
    t1 = time.perf_counter()
    print(f"  {label}: {t1 - t0:.2f}s", flush=True)
    return t1


def profile_neardup(spark):
    import shutil
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from polars_numba_spark.queries.io_streaming import _fresh_dir, _scratch_dir
    from polars_numba_spark.queries.catalog import _t
    from polars_numba_spark.streaming.neardup import (
        ingest_neardup_batch,
        neardup_verdict,
    )

    run_id = uuid.uuid4().hex[:8]
    staging = _fresh_dir(_scratch_dir("neardup_prof_stage", SF), run_id)
    store = _fresh_dir(_scratch_dir("neardup_prof_store", SF), run_id)

    t0 = time.perf_counter()
    docs = _t(spark, SF, "documents").where(F.col("doc_id") < 1000).select(
        "doc_id", "text"
    )
    docs.repartition(5).write.mode("overwrite").parquet(staging)
    t0 = _mark("staging write", t0)

    import glob

    files = sorted(glob.glob(os.path.join(staging, "*.parquet")))
    print(f"  ({len(files)} staged files)")
    for i, f in enumerate(files):
        batch = spark.read.schema(docs.schema).parquet(f)
        ingest_neardup_batch(spark, batch, store, portable=True)
        t0 = _mark(f"batch {i} ingest (direct)", t0)

    v = neardup_verdict(spark, store)
    v.orderBy("id").write.format("noop").mode("overwrite").save()
    _mark("verdict (components + noop)", t0)


def profile_clusters(spark):
    from pyspark.sql import functions as F

    from polars_numba_spark.operators import dedup as D
    from polars_numba_spark.queries.catalog import _t

    t0 = time.perf_counter()
    d = _t(spark, SF, "documents").where(F.col("doc_id") < 1000)
    pairs = D.minhash_dedup_pairs(
        d, num_hashes=32, bands=8, threshold=0.9, portable=True
    )
    pairs.write.format("noop").mode("overwrite").save()
    t0 = _mark("pairs (noop)", t0)

    pairs2 = D.minhash_dedup_pairs(
        d, num_hashes=32, bands=8, threshold=0.9, portable=True
    )
    verdict = D.dedup_keep_list(d, pairs2)
    verdict.orderBy("id").write.format("noop").mode("overwrite").save()
    _mark("full face (pairs + components + noop)", t0)


def main():
    from polars_numba_spark import get_spark

    which = sys.argv[1] if len(sys.argv) > 1 else "neardup"
    spark = get_spark(app_name=f"profile-r15-{which}")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"loadavg {os.getloadavg()}")
    if which == "neardup":
        profile_neardup(spark)
    elif which == "clusters":
        profile_clusters(spark)
    else:
        raise SystemExit(f"unknown target {which}")


if __name__ == "__main__":
    main()
