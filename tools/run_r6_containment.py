"""Containment-only soak rerun (round 6): the builds under /root/repo/.scale
already exist; re-measure run_containment_soak after the verify-stage
repartition fix in operators/dedup.py::containment_join."""
import json
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from scale_soak import run_containment_soak  # noqa: E402

from polars_numba_spark import get_spark  # noqa: E402


def main() -> int:
    spark = get_spark(app_name="r6-containment-soak")
    spark.sparkContext.setLogLevel("ERROR")
    soak = run_containment_soak(
        spark, "/root/testdata/sf0.1", "/root/repo/.scale/mut10", 10
    )
    print("R6CONTAIN " + json.dumps(soak), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
