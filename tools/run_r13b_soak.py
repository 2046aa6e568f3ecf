"""Round-13 late soak: containment keep-list at 300x — one decade PAST the
ceiling that killed the pair form.

The committed curve (SCALE.md round-13) shows the keep-list completing the
50x/100x mutated builds the pair-emitting form was disk-guard-killed on,
at 8.07x wall for 100x input. This run extends the same measurement one
more point to 300x (1.5M docs) to pin that nothing superlinear appears
past the last committed decade.

The 300x corpus uses the SAME mutation semantics as scale_soak.build_mutated
(replica k perturbs ~30% of token values keyed on (token, k); replica 0
unmutated; doc_id offset per replica) but replicates via posexplode instead
of a 300-way DataFrame union — identical rows, O(1) plan size.

Prints one JSON line; transcribed into SCALE.md by hand.
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

from scale_soak import ID_OFFSET  # noqa: E402
from polars_numba_spark import get_spark  # noqa: E402

DISK_GUARD_GB = 12
FACTOR = 300


def build_mutated_exploded(spark, src_dir: str, out_dir: str, factor: int) -> None:
    """build_mutated's rows via one posexplode (plan stays O(1) at any factor)."""
    from polars_numba_spark.operators.text import tokens

    os.makedirs(out_dir, exist_ok=True)
    base = spark.read.parquet(f"{src_dir}/documents.parquet")
    rep = base.select(
        F.posexplode(F.array_repeat(F.lit(1), factor)).alias("k", "_one"),
        "*",
    )
    k_tag = F.concat(F.lit("#rep"), F.col("k").cast("string"))
    m_tag = F.concat(F.lit("m"), F.col("k").cast("string"))
    mutated_text = F.concat_ws(
        " ",
        F.transform(
            tokens("text"),
            lambda t: F.when(
                F.pmod(F.xxhash64(F.concat(t, k_tag)), F.lit(10)) < 3,
                F.concat(t, m_tag),
            ).otherwise(t),
        ),
    )
    # Repartition on the replica index before writing: the exploded frame
    # otherwise inherits the single-file source's one split and lands as one
    # duplicate-dense ~100x-compressed part file, which byte-based split
    # sizing then scans with 1-4 tasks — serializing every downstream
    # explode (see build_replicated_exploded in run_r13c_soak.py; one part
    # file per replica mirrors the union builder's layout).
    (
        rep.withColumn(
            "text", F.when(F.col("k") == 0, F.col("text")).otherwise(mutated_text)
        )
        .withColumn(
            "doc_id",
            (F.col("doc_id") + F.col("k").cast("long") * F.lit(ID_OFFSET)).cast(
                "long"
            ),
        )
        .repartition(factor, F.col("k"))
        .drop("k", "_one")
        .write.mode("overwrite")
        .parquet(f"{out_dir}/documents.parquet")
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
    scale = "/root/repo/.scale"
    mut_dir = f"{scale}/mut{FACTOR}"

    spark = get_spark(app_name="r13b-keeplist-300x")
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.isdir(mut_dir):
        print(f"building {mut_dir}...", flush=True)
        t0 = time.perf_counter()
        build_mutated_exploded(spark, sf_dir, mut_dir, FACTOR)
        print(f"built in {time.perf_counter() - t0:.0f}s", flush=True)

    from polars_numba_spark.operators.dedup import containment_keep_list
    from polars_numba_spark.plans.checkpoint import release_session_checkpoints
    from polars_numba_spark.sources import load_table

    results = {}
    for tag, d in [("1x", sf_dir), (f"{FACTOR}x", mut_dir)]:
        stop, tripped = threading.Event(), threading.Event()
        threading.Thread(
            target=_disk_watchdog, args=(spark, stop, tripped), daemon=True
        ).start()
        docs = load_table(spark, "documents", d)
        try:
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
        print(f"R13BSOAK-{tag} " + json.dumps(results[tag]), flush=True)
        if tripped.is_set():
            break

    if "sec" in results.get("1x", {}) and "sec" in results.get(f"{FACTOR}x", {}):
        results[f"{FACTOR}x"]["ratio_vs_1x"] = round(
            results[f"{FACTOR}x"]["sec"] / results["1x"]["sec"], 2
        )
    print("R13BSOAK " + json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
