"""Round-13 second soak: pq_encode at 100× with FIXED codebooks — the
production posture (train once on a bounded sample, encode the corpus;
encode is a broadcast join + argmin, so wall should track corpus size
sublinearly with zero pair-shaped stages). Uses the exact-copy x100
embeddings build (.scale/x100, 200k vectors) from the r11/r12 decades.

Prints one JSON line; transcribed into SCALE.md by hand.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from scale_soak import build_replicated  # noqa: E402

from polars_numba_spark import get_spark  # noqa: E402


def main() -> int:
    sf_dir = "/root/testdata/sf0.1"
    big = "/root/repo/.scale/x100"

    spark = get_spark(app_name="r13-pq-soak")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.isdir(big):
        build_replicated(spark, sf_dir, big, 100)

    from polars_numba_spark.operators.vector import (
        pq_encode,
        pq_train_codebooks,
    )
    from polars_numba_spark.plans.checkpoint import release_session_checkpoints
    from polars_numba_spark.sources import load_table

    # train ONCE on the 1x corpus (the bounded-sample posture), reuse the
    # codebooks for both encode scales. Materialize the m*k=128-row table
    # driver-side and recreate it as a local relation: the trainer's
    # lineage rides session-scoped checkpoint blocks that the per-scale
    # scrub releases, and a FIXED codebook is the production storage form
    # anyway (it ships as a file/broadcast, not a live plan).
    base = load_table(spark, "embeddings", sf_dir)
    trained = pq_train_codebooks(base, m=8, k=16, iterations=2)
    books = spark.createDataFrame(trained.collect(), trained.schema)
    release_session_checkpoints(spark)

    results = {}
    for tag, d in (("1x", sf_dir), ("100x", big)):
        e = load_table(spark, "embeddings", d)
        n = e.count()
        pq_encode(e, books, m=8).write.format("noop").mode("overwrite").save()
        release_session_checkpoints(spark)
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        pq_encode(e, books, m=8).write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 2)
        results[tag] = {"sec": wall, "vectors": n, "code_rows": n * 8}
        print(f"R13PQSOAK-{tag} " + json.dumps(results[tag]), flush=True)
    results["ratio"] = round(results["100x"]["sec"] / results["1x"]["sec"], 2)
    print("R13PQSOAK " + json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
