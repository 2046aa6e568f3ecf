"""Round-10 soak driver: 10x curves for the twelve round-10 faces over the
replicated build (documents / embeddings / events replicate 10x with id
offsets; orders / customer / lineitem stay verbatim, so the two
verbatim-table faces — customer_part_hits and segment_overlap_bitmap —
are replica-invariant BY CONSTRUCTION and excluded here; their scale
posture is pinned by plan tests instead: checkpoint-truncated keyed
joins, and a bitmap table sized by id-space/63 not by row count).

Rebuilds .scale/x10 if absent (the build is not kept between rounds).
Prints one JSON line per query; transcribed into SCALE.md by hand.
"""
import json
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from scale_soak import build_replicated, run_soak  # noqa: E402

from polars_numba_spark import get_spark  # noqa: E402

QUERIES = [
    # events-based (10x events / users)
    "ab_value_mannwhitney",
    "ab_sequential_sprt",
    "events_chisq_independence",
    "events_seasonal_backtest",
    "events_hill_tail_index",
    # documents-based (10x docs)
    "doc_readability",
    "doc_lexical_richness",
    "corpus_mixture_weights",
    # embeddings-based (10x vectors)
    "kmeans_silhouette",
    "embedding_centroid_classify",
]

# wave-2 faces (streaming_sprt_monitor is excluded like the other
# availableNow twins: its wall is micro-batch orchestration, not data
# volume, and its per-user state is exactly the batch aggregate that
# ab_value_mannwhitney / ab_sequential_sprt soak above)
QUERIES_PART2 = [
    "source_drift_wasserstein",
    "events_entropy_rate",
]


def main() -> int:
    spark = get_spark(app_name="r10-soaks")
    spark.sparkContext.setLogLevel("ERROR")
    big = "/root/repo/.scale/x10"
    if not os.path.exists(f"{big}/events.parquet"):
        print("building replicated x10 variant...", flush=True)
        build_replicated(spark, "/root/testdata/sf0.1", big, 10)
    part2 = "--part2" in sys.argv
    qs = QUERIES_PART2 if part2 else QUERIES
    results = run_soak(spark, "/root/testdata/sf0.1", big, 10, qs)
    tag = "r10_new_faces_10x_part2" if part2 else "r10_new_faces_10x"
    print(json.dumps({"part": tag, "results": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
