"""Round-11 soak driver: 10x curves for the two de-quadratized faces.

The r10 verdict flagged embedding_contrastive_triplets (label-wide
positive mining, sigma |label|^2) and the semantic_dedup faces (pinned
k=8, linear |cluster| growth). Both now bound their pair stage by a
k-means cell count that self-scales (k_for_corpus = max(8, ceil(sqrt n))),
so their 10x wall ratio should sit near-linear (the k-means assignment
pass is n*k = n^1.5, so strictly-linear is NOT the expectation — ~1.5x-3x
headroom over linear at 10x embeddings is the n^1.5 curve, vs the old
quadratic's ~100x pair mass).

Rebuilds .scale/x10 if absent. Prints one JSON line per query;
transcribed into SCALE.md by hand.
"""
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from scale_soak import build_replicated, run_soak  # noqa: E402

from polars_numba_spark import get_spark  # noqa: E402

QUERIES = [
    # embeddings-based (10x vectors; k self-scales 45 -> 142)
    "embedding_contrastive_triplets",
    "semantic_dedup_pairs",
    "semantic_dedup_keeplist",
]


def main() -> int:
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    big = "/root/repo/.scale/x10"
    spark = get_spark(app_name="r11-soaks")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(big, "embeddings.parquet")):
        build_replicated(spark, base, big, 10)
    run_soak(spark, base, big, 10, QUERIES)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
