"""Benchmark harness: runs the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop write (full computation, no
driver collect), after a warm-up query to amortize JVM/session start.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q6_revenue_forecast",
    "top_customers_by_spend",
    "orders_rank_in_customer",
    "events_sessionize_stats",
    "running_max_order_price",
    "user_running_event_count",
    "kernel_fold_event_cents",
    "kernel_scan_user_balance_cents",
    "capped_balance_per_user",
    "asof_last_signup_before_purchase",
    "part_supplier_distinct",
    "doc_token_stats",
    "dedup_exact_digests",
    "dedup_jaccard_pairs",
    "embedding_topk_bruteforce",
    "multimodal_features",
    "q13_customer_order_distribution",
    "q14_promo_revenue_share",
    "user_sessions",
    "rolling_hour_user_value",
    "gap_fill_user_value",
    "doc_chunks",
    "top_bigrams",
    "doc_train_valid_test_split",
    "label_centroids",
    "order_price_quantiles",
    "recent_order_pressure",
    "training_data_pipeline",
]


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
    for name in HEADLINE:
        if name not in queries:
            continue
        timings[name] = round(run(name), 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
