"""Dedup + sketch tour: the passage/containment/semantic dedup family and
the deterministic KMV cardinality sketch (batch and streaming) over the
sf0.001 tables — the round-5 extension surface end to end."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from polars_numba_spark import get_spark
from polars_numba_spark.operators.dedup import (
    containment_join,
    duplicated_spans,
    remove_duplicated_passages,
)
from polars_numba_spark.operators.sketch import kmv_distinct
from polars_numba_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(app_name="example-dedup-sketch")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, "documents", SF)

    # ExactSubstr: duplicated passage spans, then the removal pass
    spans = duplicated_spans(docs, shingle_n=8, via="join")
    print("duplicated spans:", spans.count())
    cleaned = remove_duplicated_passages(docs, shingle_n=8, via="join")
    kept = cleaned.agg(F.sum("n_tokens_kept")).collect()[0][0]
    print("tokens kept after passage removal:", kept)
    assert cleaned.count() == docs.count()

    # complete containment search (prefix filtering — no LSH recall loss)
    contained = containment_join(docs, threshold=0.9)
    print("directional >=0.9-containment pairs:", contained.count())

    # deterministic KMV distinct-count sketch vs the exact count
    events = load_table(spark, "events", SF)
    est = kmv_distinct(events, "user_id", "event_type", k=64)
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact")
    )
    report = est.join(exact, "event_type").select(
        "event_type", "exact", F.round("kmv_estimate", 1).alias("kmv")
    )
    report.show()
    rows = report.collect()
    assert rows and all(
        abs(r["kmv"] - r["exact"]) / r["exact"] < 0.5 for r in rows
    )
    spark.stop()


if __name__ == "__main__":
    main()
