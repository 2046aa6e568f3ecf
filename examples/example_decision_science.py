"""Decision-science tour: the round-9 analytics surface end to end over
the sf0.001 tables — trend, seasonality, recommendation, attribution,
evaluation, audit — each face one call.

Run: python examples/example_decision_science.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polars_numba_spark import get_spark
from polars_numba_spark.queries.catalog import spark_queries

SF = "/root/testdata/sf0.001"

TOUR = [
    # where the series is going and when it repeats
    ("events_ols_trend", "per-type OLS drift: slope / intercept / R²"),
    ("events_dow_seasonality", "weekly seasonal indices + 3σ outlier days"),
    # what to show next and what earned the sale
    ("item_cooccurrence_recs", "item-item cosine: top-3 neighbors each"),
    ("purchase_attribution_items", "linear / first / last touch credit"),
    ("event_markov_backtest", "next-event model: train before, score after"),
    ("ab_value_cuped", "CUPED: the variance the covariate buys back"),
    # how far influence reaches
    ("customer_match_bfs_hops", "BFS blast radius over the match graph"),
    # is the data honest, is the release safe
    ("orders_benford_audit", "first-digit law + χ² fraud screen"),
    ("events_ldiversity_audit", "attribute-disclosure risk ladder"),
    # is the text fluent
    ("doc_kneser_ney_logprob", "Kneser-Ney LM fluency scores"),
]


def main() -> None:
    spark = get_spark(app_name="example-decision-science")
    spark.sparkContext.setLogLevel("ERROR")
    qs = spark_queries()
    for name, blurb in TOUR:
        print(f"\n=== {name} — {blurb} ===")
        qs[name](spark, SF).show(8, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
