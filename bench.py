"""Benchmark harness: runs the ENTIRE query catalog at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop write (full computation, no
driver collect), after a warm-up query to amortize JVM/session start.
Round 1 benched a 32-query headline subset; since round 2 the bench covers
every catalog entry (per-query r1 numbers in BASELINE.md remain directly
comparable — names match).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from polars_numba_spark import get_spark
    from polars_numba_spark.queries import catalog

    spark = get_spark(app_name="polars-numba-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = catalog.spark_queries()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # Warm-up: JVM JIT + parquet footer cache (q6) and the Python worker
    # pool (capped_balance) — the first Pandas-path query in a session pays
    # ~2s of worker startup that is not a property of any query.
    run("q6_revenue_forecast")
    run("capped_balance_per_user")

    timings: dict[str, float] = {}
    for name in queries:
        timings[name] = round(run(name), 4)
        print(f"  {name}: {timings[name]:.2f}s", file=sys.stderr, flush=True)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "full_catalog_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
