"""Round-13 late soak: minhash/simhash KEEP-LISTs at 300x — symmetric with
the containment 300x point (tools/run_r13b_soak.py).

The committed curves stop at 100x on the exact-replicated duplicate-heavy
build (minhash keep-list 10.35x wall, simhash 3.14x — SCALE.md round-13).
This run extends both to 300x (1.5M docs, every original doc x300 verbatim
with id offsets — maximum duplicate density, the regime where pair
emission's output is O(N^2) by construction) so all three dedup families'
keep-list forms carry a past-the-pair-ceiling decade.

The 300x corpus uses the SAME rows as scale_soak.build_replicated but
replicates via posexplode instead of a 300-way union (O(1) plan size);
only the documents table is needed by these operators, the rest are
verbatim copies.

Prints one JSON line per operator; transcribed into SCALE.md by hand.
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

from pyspark.sql import functions as F  # noqa: E402

from scale_soak import ALL_TABLES, ID_OFFSET, REPLICATED_TABLES  # noqa: E402
from polars_numba_spark import get_spark  # noqa: E402

DISK_GUARD_GB = 12
FACTOR = 300


def build_replicated_exploded(spark, src_dir: str, out_dir: str, factor: int) -> None:
    """build_replicated's rows via one posexplode per table.

    The write REPARTITIONS on the replica index first. Without it the
    exploded frame inherits the single-file source's one input split and
    lands as ONE snappy part file whose duplicate-dense pages compress
    ~100x — and byte-based split sizing (maxPartitionBytes) then hands the
    300x scan 1-4 splits, serializing every downstream explode onto <=4
    cores. (Found live: the un-repartitioned 300x build turned the minhash
    soak's ~1-minute signature stage into an hour-long 4-task grind. The
    union-based builder never hit this because each replica wrote its own
    files.) One part file per replica mirrors the union builder's layout.
    """
    os.makedirs(out_dir, exist_ok=True)
    for table in ALL_TABLES:
        src = f"{src_dir}/{table}.parquet"
        dst = f"{out_dir}/{table}.parquet"
        if table not in REPLICATED_TABLES:
            if not os.path.exists(dst):
                shutil.copy(src, dst)
            continue
        id_col = REPLICATED_TABLES[table]
        base = spark.read.parquet(src)
        (
            base.select(
                F.posexplode(F.array_repeat(F.lit(1), factor)).alias("k", "_one"),
                "*",
            )
            .withColumn(
                id_col,
                (
                    F.col(id_col) + F.col("k").cast("long") * F.lit(ID_OFFSET)
                ).cast("long"),
            )
            .repartition(factor, F.col("k"))
            .drop("k", "_one")
            .write.mode("overwrite")
            .parquet(dst)
        )


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
    big = f"/root/repo/.scale/x{FACTOR}"

    spark = get_spark(app_name="r13c-keeplist-300x")
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.isdir(big):
        print(f"building {big}...", flush=True)
        t0 = time.perf_counter()
        build_replicated_exploded(spark, sf_dir, big, FACTOR)
        print(f"built in {time.perf_counter() - t0:.0f}s", flush=True)

    from polars_numba_spark.operators.dedup import (
        minhash_dedup_pairs,
        simhash_dedup_pairs,
    )
    from polars_numba_spark.sources import load_table

    ops = {
        "simhash_keeplist": lambda docs: simhash_dedup_pairs(
            docs, bits=32, max_hamming=3, emit="keeplist"
        ),
        "minhash_keeplist": lambda docs: minhash_dedup_pairs(
            docs, num_hashes=32, bands=8, threshold=0.8, shingle_n=8,
            emit="keeplist",
        ),
    }

    results: dict[str, dict] = {}
    for op_name, make in ops.items():
        results[op_name] = {}
        for tag, d in [("1x", sf_dir), (f"{FACTOR}x", big)]:
            stop, tripped = threading.Event(), threading.Event()
            threading.Thread(
                target=_disk_watchdog, args=(spark, stop, tripped), daemon=True
            ).start()
            docs = load_table(spark, "documents", d)
            try:
                n = make(docs).count()  # warm-up + output volume
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                make(docs).write.format("noop").mode("overwrite").save()
                wall = round(time.perf_counter() - t0, 1)
                results[op_name][tag] = {"sec": wall, "rows": n}
            except Exception as exc:
                results[op_name][tag] = {
                    "error": f"{type(exc).__name__}: {exc}"[:300],
                    "disk_guard_tripped": tripped.is_set(),
                }
            finally:
                stop.set()
                spark.catalog.clearCache()
            print(
                f"R13CSOAK-{op_name}-{tag} " + json.dumps(results[op_name][tag]),
                flush=True,
            )
            if tripped.is_set():
                break
        one, big_r = results[op_name].get("1x", {}), results[op_name].get(
            f"{FACTOR}x", {}
        )
        if "sec" in one and "sec" in big_r and one["sec"]:
            big_r["ratio_vs_1x"] = round(big_r["sec"] / one["sec"], 2)
        if tripped.is_set():
            # ADVICE r13: a disk-guard trip must end the whole soak, not
            # just this operator — the next operator would start its run
            # on a nearly-full disk and wait for the watchdog to re-trip.
            print("R13CSOAK disk guard tripped; aborting remaining operators",
                  flush=True)
            break

    print("R13CSOAK " + json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
