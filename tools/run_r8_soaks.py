"""Round-8 soak driver (r7 verdict next-round #2 and #6):

1. keep-list emission soak at 1x/10x on the replicated duplicate-heavy
   build — re-measured locally so SCALE.md carries a committed curve (the
   r7 runner produced numbers that were never transcribed; the judge's own
   r7 run measured minhash 1.48x / simhash 1.22x wall at 10x with exactly
   input-linear output).
2. The 30x second decade for incremental dedup + containment (r6 asks
   #3/#5, builds already on disk at .scale/x30 and .scale/mut30).
3. NEW: keep-list at 30x — the minhash keep-list's 1.48x at 10x was the
   worst keep-list ratio and the verify stage's shingle-array Jaccard is
   the suspect; the 30x point decides whether it stays ~linear or gets
   the hashed-shingle treatment.

Prints one JSON line per part; transcribed into SCALE.md by hand.
"""
import json
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from scale_soak import (  # noqa: E402
    build_mutated,
    build_replicated,
    run_containment_soak,
    run_incremental_soak,
    run_keeplist_soak,
)

from polars_numba_spark import get_spark  # noqa: E402


def main() -> int:
    sf_dir = "/root/testdata/sf0.1"
    out = "/root/repo/.scale"

    spark = get_spark(app_name="r8-soaks")
    spark.sparkContext.setLogLevel("ERROR")

    # builds are idempotent: skip if present
    import os

    for path, factor, builder in (
        (f"{out}/x10", 10, build_replicated),
        (f"{out}/x30", 30, build_replicated),
        (f"{out}/mut30", 30, build_mutated),
    ):
        if not os.path.isdir(path):
            print(f"building {path}...", flush=True)
            builder(spark, sf_dir, path, factor)

    soak = {}
    soak["keeplist_10x"] = run_keeplist_soak(spark, sf_dir, f"{out}/x10", 10)
    print("R8SOAK-PART1 " + json.dumps(soak["keeplist_10x"]), flush=True)

    soak["incremental_30x"] = run_incremental_soak(spark, sf_dir, f"{out}/x30", 30)
    print("R8SOAK-PART2a " + json.dumps(soak["incremental_30x"]), flush=True)

    soak["containment_30x"] = run_containment_soak(spark, sf_dir, f"{out}/mut30", 30)
    print("R8SOAK-PART2b " + json.dumps(soak["containment_30x"]), flush=True)

    soak["keeplist_30x"] = run_keeplist_soak(spark, sf_dir, f"{out}/x30", 30)
    print("R8SOAK-PART3 " + json.dumps(soak["keeplist_30x"]), flush=True)

    print("R8SOAK " + json.dumps(soak), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
