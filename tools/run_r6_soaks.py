"""One-off round-6 driver: run ONLY the two soaks whose curves are not
yet in SCALE.md (bounded-state batch KMV; mutated-corpus containment),
reusing tools/scale_soak.py's builders and runners. Results print as one
JSON line; transcribed into SCALE.md by hand."""
import json
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from scale_soak import build_mutated, build_replicated, run_containment_soak, run_kmv_soak  # noqa: E402

from polars_numba_spark import get_spark  # noqa: E402


def main() -> int:
    sf_dir = "/root/testdata/sf0.1"
    out = "/root/repo/.scale"
    factor = 10
    big_dir = f"{out}/x{factor}"
    mut_dir = f"{out}/mut{factor}"

    spark = get_spark(app_name="r6-soaks")
    spark.sparkContext.setLogLevel("ERROR")

    print("building replicated variant...", flush=True)
    build_replicated(spark, sf_dir, big_dir, factor)
    print("building mutated variant...", flush=True)
    build_mutated(spark, sf_dir, mut_dir, factor)

    soak = {}
    soak.update(run_kmv_soak(spark, sf_dir, big_dir, factor))
    soak.update(run_containment_soak(spark, sf_dir, mut_dir, factor))
    print("R6SOAK " + json.dumps(soak), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
