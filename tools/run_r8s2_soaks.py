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

# the late-session additions (part 2; lineitem-based order_basket_lift is
# excluded — lineitem stays verbatim in the x10 build)
QUERIES_PART2 = [
    "doc_search_authority_rrf",
    "doc_rake_keyphrases",
    "events_burst_windows",
    "source_drift_psi",
    "user_rfm_segments",
    "funnel_conversion_latency",
]


def main() -> int:
    part2 = "--part2" in sys.argv
    spark = get_spark(app_name="r8s2-soaks")
    spark.sparkContext.setLogLevel("ERROR")
    qs = QUERIES_PART2 if part2 else QUERIES
    results = run_soak(
        spark, "/root/testdata/sf0.1", "/root/repo/.scale/x10", 10, qs
    )
    tag = "r8s2_new_faces_10x_part2" if part2 else "r8s2_new_faces_10x"
    print(json.dumps({"part": tag, "results": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
