"""Product-analytics tour: the round-8 session-3 behavioral/monitoring
surface end to end over the sf0.001 events table — journeys, funnels by
another name, inequality, monitoring, and privacy, each face one call.

Run: python examples/example_product_analytics.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polars_numba_spark import get_spark
from polars_numba_spark.queries.catalog import spark_queries

SF = "/root/testdata/sf0.001"

TOUR = [
    # what shifted, what co-moves, what cycles
    ("events_cusum_changepoints", "CUSUM level-shift monitor (closed form)"),
    ("events_daily_acf", "per-type autocorrelation, lags 1-7"),
    ("event_type_correlations", "cross-series Pearson (exact integers)"),
    # who the users are and what they do
    ("session_top_paths", "top session-opening journeys"),
    ("user_value_concentration", "Gini / entropy / HHI / top-1% share"),
    ("audience_overlap_kmv", "audience intersections from sketches alone"),
    ("user_events_cms", "count-min frequency estimates vs exact"),
    # value distribution and lifecycle
    ("user_value_pareto_deciles", "Lorenz deciles: who drives the value"),
    ("signup_survival_km", "Kaplan-Meier conversion survival"),
    ("ab_conversion_ztest", "A/B readout with pooled z-test"),
    # enrichment + governance
    ("views_point_in_time_state", "leak-free SCD2 point-in-time join"),
    ("events_kanonymity_audit", "re-identification risk ladder"),
    ("orders_dq_expectations", "expectation-suite publish gate"),
    ("corpus_datacard", "the one-row release data card"),
]


def main() -> None:
    spark = get_spark(app_name="example-product-analytics")
    spark.sparkContext.setLogLevel("ERROR")
    qs = spark_queries()
    for name, blurb in TOUR:
        print(f"\n=== {name} — {blurb} ===")
        qs[name](spark, SF).show(8, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
