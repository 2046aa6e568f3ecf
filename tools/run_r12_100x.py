"""Round-12 soaks: the 100× point for the five most expensive plans
(VERDICT r11 #2). Extends the round-11 decade (run_r11_100x.py) to the
faces whose deepest committed curve stopped short:

1. SemDeDup pairs + keep-list at 100× (deepest curve was 10×, r11) —
   self-scaling k (k_for_corpus: 45 → 448 at this decade), exact-copy
   x100 embeddings (200k vectors). Pair output legitimately explodes
   (every 100-clone group in a cluster emits 4,950 true pairs); the
   keep-list stays ~one row per survivor. Rows are reported at both
   scales so wall ratios can be attributed to output mass.
2. doc_search_authority_rrf at 10×/100× (never soaked as a composition)
   — BM25 inverted index + 3-iteration PageRank over the doc-term
   bipartite graph at 500k docs; the term vocabulary is fixed under
   replication so the graph's edge mass grows ~linearly with docs.
3. dedup_containment_complete at 100× on the MUTATED build (deepest
   curve was 30×, r9 ladder) — true-pair mass ~linear by construction
   (~857M pairs expected at 100×, extrapolating the r9 257M/30×
   measurement), so the curve measures prefix-join fan-out, not answer
   mass. This one is output-heavy: it uses a SINGLE timed pass after the
   count warm-up (instead of the harness best-of-2) to keep the soak
   under an hour; single-pass walls are noted as such in SCALE.md.

Prints one JSON line per part; transcribed into SCALE.md by hand.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from scale_soak import (  # noqa: E402
    _operator_soak,
    build_mutated,
    build_replicated,
    run_soak,
)

from polars_numba_spark import get_spark  # noqa: E402


def main() -> int:
    sf_dir = "/root/testdata/sf0.1"
    out = "/root/repo/.scale"
    big = f"{out}/x100"
    mut = f"{out}/mut100"

    spark = get_spark(app_name="r12-100x-soaks")
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.isdir(big):
        print(f"building {big}...", flush=True)
        build_replicated(spark, sf_dir, big, 100)

    from polars_numba_spark.operators.vector import (
        semantic_dedup_keep,
        semantic_dedup_pairs,
    )
    from polars_numba_spark.sources import load_table

    soak = {}

    def pairs_build(d):
        e = load_table(spark, "embeddings", d)
        return lambda: semantic_dedup_pairs(e, k=None, iterations=2, threshold=0.3)

    soak["semdedup_pairs_100x"] = _operator_soak(
        spark,
        "semantic_dedup_pairs_selfk",
        [("1x", pairs_build(sf_dir), {}), ("100x", pairs_build(big), {})],
        100,
    )
    print("R12SOAK-SEMPAIRS " + json.dumps(soak["semdedup_pairs_100x"]), flush=True)

    def keep_build(d):
        e = load_table(spark, "embeddings", d)
        return lambda: semantic_dedup_keep(
            e, semantic_dedup_pairs(e, k=None, iterations=2, threshold=0.3)
        )

    soak["semdedup_keep_100x"] = _operator_soak(
        spark,
        "semantic_dedup_keep_selfk",
        [("1x", keep_build(sf_dir), {}), ("100x", keep_build(big), {})],
        100,
    )
    print("R12SOAK-SEMKEEP " + json.dumps(soak["semdedup_keep_100x"]), flush=True)

    soak["authority_rrf_100x"] = run_soak(
        spark, sf_dir, big, 100, queries=["doc_search_authority_rrf"]
    )
    print("R12SOAK-RRF " + json.dumps(soak["authority_rrf_100x"]), flush=True)

    # --- containment at 100x: single timed pass (output-heavy, see doc) ---
    if not os.path.isdir(mut):
        print(f"building {mut}...", flush=True)
        build_mutated(spark, sf_dir, mut, 100)

    from polars_numba_spark.operators.dedup import containment_join
    from polars_numba_spark.plans.checkpoint import release_session_checkpoints

    def contain_once(d: str) -> dict:
        docs = load_table(spark, "documents", d)
        n = containment_join(docs, threshold=0.9).count()  # warm + volume
        release_session_checkpoints(spark)
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        containment_join(docs, threshold=0.9).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.perf_counter() - t0
        release_session_checkpoints(spark)
        spark.catalog.clearCache()
        return {"sec": round(wall, 1), "rows": n}

    one = contain_once(sf_dir)
    hundred = contain_once(mut)
    soak["containment_100x"] = {
        "containment_join_operator": {
            "sec_1x": one["sec"], "rows_1x": one["rows"],
            "sec_100x": hundred["sec"], "rows_100x": hundred["rows"],
            "ratio": round(hundred["sec"] / one["sec"], 2),
            "passes": "count warm-up + ONE timed noop (output-heavy)",
        }
    }
    print("R12SOAK-CONTAIN " + json.dumps(soak["containment_100x"]), flush=True)

    print("R12SOAK " + json.dumps(soak), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
