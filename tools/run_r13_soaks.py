"""Round-13 soak: containment KEEP-LIST at the decades where the pair form
hit the single-host disk ceiling (VERDICT r12 #2).

The r12 measurement pinned `containment_join` (pair emission) at a
cumulative job-shuffle footprint ~linear in true-pair mass: 30× (~257M
pairs) fit this host's scratch, 50×/100× (mutated build) tripped the
12 GB-free disk guard. `containment_keep_list` replaces the candidate
pair materialization with star edges (mass bounded by prefix-active
posting volume — linear in corpus size, independent of duplicate
density), so the SAME builds should complete within disk. This soak
runs 1× (sf0.1) → 50× (mut50) → 100× (mut100) with the disk guard now
COMMITTED (a watchdog thread cancels all jobs below the free-space
floor instead of an ad-hoc watcher).

Prints one JSON line per decade; transcribed into SCALE.md by hand.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from scale_soak import build_mutated  # noqa: E402

from polars_numba_spark import get_spark  # noqa: E402

DISK_GUARD_GB = 12


def _disk_watchdog(spark, stop: threading.Event, tripped: threading.Event):
    while not stop.wait(5):
        free_gb = shutil.disk_usage("/").free / 1e9
        if free_gb < DISK_GUARD_GB:
            tripped.set()
            print(
                f"DISK GUARD: {free_gb:.1f} GB free < {DISK_GUARD_GB} GB — "
                "cancelling all jobs",
                flush=True,
            )
            spark.sparkContext.cancelAllJobs()
            return


def main() -> int:
    sf_dir = "/root/testdata/sf0.1"
    scale = "/root/repo/.scale"
    builds = [("1x", sf_dir), ("50x", f"{scale}/mut50"), ("100x", f"{scale}/mut100")]

    spark = get_spark(app_name="r13-keeplist-soak")
    spark.sparkContext.setLogLevel("ERROR")

    for tag, d in builds[1:]:
        if not os.path.isdir(d):
            print(f"building {d}...", flush=True)
            build_mutated(spark, sf_dir, d, int(tag[:-1]))

    from polars_numba_spark.operators.dedup import containment_keep_list
    from polars_numba_spark.plans.checkpoint import release_session_checkpoints
    from polars_numba_spark.sources import load_table

    results = {}
    for tag, d in builds:
        stop, tripped = threading.Event(), threading.Event()
        dog = threading.Thread(
            target=_disk_watchdog, args=(spark, stop, tripped), daemon=True
        )
        dog.start()
        docs = load_table(spark, "documents", d)
        try:
            # count pass = warm-up + output volume (keep contract: one row
            # per doc); then ONE timed noop pass, the r12 convention for
            # output-heavy soaks
            verdict = containment_keep_list(docs, threshold=0.9)
            n = verdict.count()
            kept = verdict.where("keep").count()
            release_session_checkpoints(spark)
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            containment_keep_list(docs, threshold=0.9).write.format(
                "noop"
            ).mode("overwrite").save()
            wall = round(time.perf_counter() - t0, 1)
            results[tag] = {"sec": wall, "rows": n, "kept": kept}
        except Exception as exc:
            results[tag] = {
                "error": f"{type(exc).__name__}: {exc}"[:300],
                "disk_guard_tripped": tripped.is_set(),
            }
        finally:
            stop.set()
            release_session_checkpoints(spark)
            spark.catalog.clearCache()
        print(f"R13SOAK-{tag} " + json.dumps(results[tag]), flush=True)
        if tripped.is_set():
            break

    if "1x" in results and "sec" in results.get("1x", {}):
        for tag in ("50x", "100x"):
            if "sec" in results.get(tag, {}):
                results[tag]["ratio_vs_1x"] = round(
                    results[tag]["sec"] / results["1x"]["sec"], 2
                )
    print("R13SOAK " + json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
