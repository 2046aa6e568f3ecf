"""Evaluation & statistics tour: the round-10 surface end to end over the
sf0.001 tables — nonparametric and sequential testing, forecast and
cluster evaluation, corpus governance, exact set algebra — each face one
call.

Run: python examples/example_eval_statistics.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polars_numba_spark import get_spark
from polars_numba_spark.queries.catalog import spark_queries

SF = "/root/testdata/sf0.001"

TOUR = [
    # did the experiment move the metric (three lenses on the same arms)
    ("ab_value_mannwhitney", "rank-sum test: heavy tails welcome"),
    ("ab_sequential_sprt", "Wald SPRT: how many users until conclusive"),
    ("events_chisq_independence", "is traffic mix a function of weekday"),
    # is the model any good
    ("events_seasonal_backtest", "seasonal-naive MAE/SMAPE baseline"),
    ("kmeans_silhouette", "cluster tightness vs confusability"),
    ("embedding_centroid_classify", "held-out Rocchio confusion matrix"),
    # how heavy is the tail, who anchors the graph
    ("events_hill_tail_index", "Hill α over the top-500 values"),
    ("customer_part_hits", "hubs buy well, authorities get bought"),
    # corpus governance before a training run
    ("doc_readability", "Flesch-Kincaid grade per source"),
    ("doc_lexical_richness", "TTR / hapax / Yule's K template-spam screen"),
    ("corpus_mixture_weights", "target mixture -> capped sampling weights"),
    # exact audience algebra
    ("segment_overlap_bitmap", "bit_or bitmaps: exact segment Jaccard"),
]


def main() -> None:
    spark = get_spark(app_name="example-eval-statistics")
    spark.sparkContext.setLogLevel("ERROR")
    qs = spark_queries()
    for name, blurb in TOUR:
        print(f"\n=== {name} — {blurb} ===")
        qs[name](spark, SF).show(8, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
