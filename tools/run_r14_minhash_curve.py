"""Round-14 minhash keep-list cost curve (VERDICT r13 #5).

The r13 300x soak showed the minhash keep-list's wall is dominated by the
signature stage (explode -> k hashes -> map-side MIN per doc; 34.0x wall at
300x data, the heaviest of the three dedup families).  Signature cost is
linear in ``num_hashes``, so the obvious lever is a smaller signature —
IF the banding recall survives.  This harness measures both sides:

1. **Recall leg** (sf0.01, the committed recall-probe posture): for each
   (num_hashes, bands) config, empirical candidate recall against exact
   all-pairs Jaccard at thresholds {0.6, 0.7, 0.8, 0.9} — on BOTH unigram
   token sets (the committed ``dedup_minhash_recall`` ground truth) and
   8-token shingles (the production keep-list / soak config).  All configs
   keep rows-per-band r = num_hashes/bands = 4, the s-curve shape the
   engine ships (collision p = 1-(1-j^4)^bands), plus two r=8
   precision-heavy alternates for the table.
2. **Wall leg** (sf0.1, full table): end-to-end keep-list wall
   (signature -> bands -> star edges -> verify -> components) per config,
   with the shingle_n=8 / threshold=0.8 soak posture, best-of-2 per config
   (first run in a session pays checkpoint warm-up).

Decision rule (from the verdict): if 16x4 holds recall >= 0.99 at
theta >= 0.8 on both ground truths, 16x4 becomes the keep-list default.
Committed output: the table in SCALE.md round-14.

Usage: python tools/run_r14_minhash_curve.py [recall_sf_dir] [wall_sf_dir]
Prints one MINHASHCURVE json line per leg; exits 0.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

CONFIGS = [(16, 4), (32, 8), (64, 16), (32, 4), (64, 8)]
THRESHOLDS = [0.6, 0.7, 0.8, 0.9]


def recall_leg(spark, sf_dir: str, cap: int = 500) -> dict:
    """Empirical candidate recall per config x threshold x tokenization."""
    from polars_numba_spark.operators import dedup as D
    from polars_numba_spark.sources import load_table

    d = load_table(spark, "documents", sf_dir).where(F.col("doc_id") < cap)
    d = d.cache()
    d.count()
    out: dict = {}
    for shingle_n, tag in ((None, "unigram"), (8, "shingle8")):
        ids = d.select(F.col("doc_id").alias("a_id"))
        allp = (
            ids.crossJoin(d.select(F.col("doc_id").alias("b_id")))
            .where(F.col("a_id") < F.col("b_id"))
        )
        exact = D.jaccard_pairs(d, allp, shingle_n=shingle_n).cache()
        n_true = {
            t: exact.where(F.col("jaccard") >= t).count() for t in THRESHOLDS
        }
        for num_hashes, bands in CONFIGS:
            cands = D.minhash_lsh_candidates(
                d, num_hashes=num_hashes, bands=bands, shingle_n=shingle_n
            ).withColumn("__c", F.lit(1))
            marked = exact.join(cands, ["a_id", "b_id"], "left").select(
                "jaccard", F.coalesce(F.col("__c"), F.lit(0)).alias("c")
            ).cache()
            key = f"{tag}:{num_hashes}x{bands}"
            out[key] = {}
            for t in THRESHOLDS:
                caught = (
                    marked.where(F.col("jaccard") >= t)
                    .agg(F.sum("c"))
                    .collect()[0][0]
                    or 0
                )
                out[key][str(t)] = {
                    "n_true": n_true[t],
                    "n_caught": int(caught),
                    "recall": round(caught / n_true[t], 4) if n_true[t] else None,
                }
            marked.unpersist()
        exact.unpersist()
    d.unpersist()
    return out


def wall_leg(spark, sf_dir: str) -> dict:
    """Keep-list end-to-end wall per config at the soak posture."""
    from polars_numba_spark.operators import dedup as D
    from polars_numba_spark.sources import load_table

    d = load_table(spark, "documents", sf_dir)
    out: dict = {}
    for num_hashes, bands in CONFIGS:
        walls = []
        for _ in range(2):  # best-of-2: first run pays checkpoint warm-up
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            D.minhash_dedup_pairs(
                d, num_hashes=num_hashes, bands=bands, threshold=0.8,
                shingle_n=8, emit="keeplist",
            ).write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 2))
        out[f"{num_hashes}x{bands}"] = {
            "wall_best": min(walls),
            "walls": walls,
        }
    return out


def main() -> int:
    recall_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    wall_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from polars_numba_spark import get_spark
    from polars_numba_spark.plans.checkpoint import release_session_checkpoints

    spark = get_spark(app_name="r14-minhash-curve")
    spark.sparkContext.setLogLevel("ERROR")

    rec = recall_leg(spark, recall_dir)
    print("MINHASHCURVE-RECALL " + json.dumps({"sf_dir": recall_dir, **rec}),
          flush=True)
    release_session_checkpoints(spark)
    walls = wall_leg(spark, wall_dir)
    print("MINHASHCURVE-WALL " + json.dumps({"sf_dir": wall_dir, **walls}),
          flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
