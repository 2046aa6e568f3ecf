"""Round-7 soak driver (r6 verdict #3 and #5):

1. keep-list emission soak at 1x/10x on the replicated duplicate-heavy
   build — pair-free output contract vs the 46.8x pair-mass line.
2. SECOND SOAK DECADE (30x) for the two scale-critical paths: the
   fixed-batch incremental dedup (100-TB ingest story, replicated build)
   and the complete containment join (mutated build, ~linear true pairs).

Reuses tools/scale_soak.py builders/runners; prints one JSON line per
soak; transcribed into SCALE.md by hand."""
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

    spark = get_spark(app_name="r7-soaks")
    spark.sparkContext.setLogLevel("ERROR")

    soak = {}
    # 1) keep-list emission vs pair emission (x10 replicated build exists)
    big10 = f"{out}/x10"
    soak.update(run_keeplist_soak(spark, sf_dir, big10, 10))
    print("R7SOAK-PART1 " + json.dumps(soak), flush=True)

    # 2) second decade: 30x builds
    big30 = f"{out}/x30"
    mut30 = f"{out}/mut30"
    print("building 30x replicated variant...", flush=True)
    build_replicated(spark, sf_dir, big30, 30)
    print("building 30x mutated variant...", flush=True)
    build_mutated(spark, sf_dir, mut30, 30)
    soak.update(run_incremental_soak(spark, sf_dir, big30, 30))
    soak.update(run_containment_soak(spark, sf_dir, mut30, 30))
    print("R7SOAK " + json.dumps(soak), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
