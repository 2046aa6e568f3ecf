"""Round-8 continuation-session soak driver: 10x curves for the session's
new faces over the existing .scale/x10 replicated build (documents,
embeddings, and events replicate 10x; orders/customer are verbatim, so
orders_bloom_prefilter is excluded — its probe is a pure projection whose
linearity is pinned by the broadcast-only plan test instead).

Prints one JSON line per query; transcribed into SCALE.md by hand.
"""
import json
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from scale_soak import run_soak  # noqa: E402

from polars_numba_spark import get_spark  # noqa: E402

QUERIES = [
    # documents-based
    "doc_gopher_filter",
    "doc_char_entropy",
    "doc_quality_calibrated",
    "bpe_merge_candidates",
    "corpus_vocab_growth",
    # events-based
    "user_retention_cohorts",
    "event_type_transitions",
    "user_value_ewma",
    "streaming_user_ewma",
    # embeddings-based
    "embedding_pq_recall",
]


def main() -> int:
    spark = get_spark(app_name="r8s2-soaks")
    spark.sparkContext.setLogLevel("ERROR")
    results = run_soak(
        spark, "/root/testdata/sf0.1", "/root/repo/.scale/x10", 10, QUERIES
    )
    print(json.dumps({"part": "r8s2_new_faces_10x", "results": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
