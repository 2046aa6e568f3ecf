"""Round-8 session-3 soak driver: 10x curves for the session's new faces
over the existing .scale/x10 replicated build (documents / embeddings /
events replicate 10x; orders / customer / lineitem stay verbatim, so the
fixed-slice faces — customer_golden_record, customer_graph_triangles —
and the verbatim-table faces — formats_zorder_skipping (one range-shuffle
ingest rewrite), orders_dq_expectations (one-scan plan test) — are
excluded by construction).

Prints one JSON line per query; transcribed into SCALE.md by hand.
"""
import json
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from scale_soak import run_soak  # noqa: E402

from polars_numba_spark import get_spark  # noqa: E402

QUERIES = [
    # events-based
    "events_cusum_changepoints",
    "events_daily_acf",
    "user_events_cms",
    "audience_overlap_kmv",
    "user_value_concentration",
    "user_value_holt",
    "streaming_user_cms",
    # documents-based
    "doc_phrase_search",
]


# Part 2: the late-session faces (doc_winnowing_overlap_pairs excluded by
# construction — its doc_id<500 slice is replica-invariant in the x10
# id-offset build, like the other fixed-slice faces).
QUERIES_PART2 = [
    "session_top_paths",
    "signup_survival_km",
    "ab_conversion_ztest",
    "user_value_pareto_deciles",
    "event_type_correlations",
    "events_kanonymity_audit",
    "views_point_in_time_state",
    "streaming_burst_windows",
    "corpus_zipf_fit",
]


def main() -> int:
    part2 = "--part2" in sys.argv
    spark = get_spark(app_name="r8s3-soaks")
    spark.sparkContext.setLogLevel("ERROR")
    qs = QUERIES_PART2 if part2 else QUERIES
    results = run_soak(
        spark, "/root/testdata/sf0.1", "/root/repo/.scale/x10", 10, qs
    )
    tag = "r8s3_new_faces_10x_part2" if part2 else "r8s3_new_faces_10x"
    print(json.dumps({"part": tag, "results": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())


