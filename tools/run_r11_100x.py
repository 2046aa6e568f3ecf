"""Round-11 third decade: 100x soaks for the headline dedup machinery.

SCALE.md's curves stop at 30x (run_r8_soaks). This runner adds the 100x
point for the three shapes whose scale story matters most at 100 TB:

1. keep-list emission (minhash + simhash) on the exact-copy replicated
   build — the duplicate-density worst case: true-pair mass grows ~N^2
   (every replica pair is a true pair) while the keep-list contract
   emits one row per input doc, so wall must track INPUT.
2. incremental dedup with a FIXED 60-doc ingest batch against a corpus
   grown 100x — the delta-ingest contract says wall tracks the corpus
   linearly (banding + broadcast delta join), never corpus^2.
3. the production bucketed embedding near-dup operator over 200k
   vectors (100x of sf0.1) — output legitimately explodes (each vector
   gains 99 exact copies -> ~100 true pairs each); rows are reported at
   both scales so the ratio can be attributed to result volume.

Prints one JSON line per part; transcribed into SCALE.md by hand.
"""
import json
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from scale_soak import (  # noqa: E402
    build_replicated,
    run_incremental_soak,
    run_keeplist_soak,
    run_neardup_soak,
)

from polars_numba_spark import get_spark  # noqa: E402


def main() -> int:
    sf_dir = "/root/testdata/sf0.1"
    out = "/root/repo/.scale"
    big = f"{out}/x100"

    spark = get_spark(app_name="r11-100x-soaks")
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.isdir(big):
        print(f"building {big}...", flush=True)
        build_replicated(spark, sf_dir, big, 100)

    soak = {}
    soak["keeplist_100x"] = run_keeplist_soak(spark, sf_dir, big, 100)
    print("R11SOAK-KEEPLIST " + json.dumps(soak["keeplist_100x"]), flush=True)

    soak["incremental_100x"] = run_incremental_soak(spark, sf_dir, big, 100)
    print("R11SOAK-INCR " + json.dumps(soak["incremental_100x"]), flush=True)

    soak["neardup_100x"] = run_neardup_soak(spark, sf_dir, big, 100)
    print("R11SOAK-NEARDUP " + json.dumps(soak["neardup_100x"]), flush=True)

    print("R11SOAK " + json.dumps(soak), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
