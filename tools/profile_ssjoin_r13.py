"""Round-13 profile of the availableNow variance band (VERDICT r12 #3).

The r12 keeper's discarded 394.9s run recorded streaming_signup_purchase_join
at 19.9s vs its ~2.5s floor — the third round this band showed up on the
stream-stream faces. This harness runs both faces N times in ONE session
(bench-style scrub between runs), with a session-global
StreamingQueryListener capturing every micro-batch's durationMs breakdown
(triggerExecution / getBatch / addBatch / walCommit / commitOffsets /
stateOperators), so a slow run shows WHERE the wall went: state-store
commit, offset log, file-source listing, or plain host scheduling.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/profile_ssjoin_r13.py [N]
Writes /tmp/ssjoin_profile_r13.json and prints a summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

_TOOLS = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_TOOLS)
sys.path.insert(0, _REPO)

FACES = ["streaming_signup_purchase_join", "streaming_signup_conversion_outer"]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql.streaming import StreamingQueryListener

    from polars_numba_spark import get_spark
    from polars_numba_spark.plans.checkpoint import release_session_checkpoints
    from polars_numba_spark.queries import catalog

    batches: list[dict] = []

    class _Capture(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            p = event.progress
            batches.append(
                {
                    "t": time.time(),
                    "batch_id": p.batchId,
                    "numInputRows": p.numInputRows,
                    "durationMs": dict(p.durationMs or {}),
                    "stateOperators": [
                        {
                            "operatorName": getattr(s, "operatorName", None),
                            "commitTimeMs": getattr(s, "commitTimeMs", None),
                            "numRowsTotal": getattr(s, "numRowsTotal", None),
                        }
                        for s in (p.stateOperators or [])
                    ],
                }
            )

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    spark = get_spark(app_name="pns-ssjoin-profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.streams.addListener(_Capture())

    queries = catalog.spark_queries()

    def scrub() -> None:
        for t in spark.catalog.listTables():
            if t.name.startswith("pns_"):
                spark.catalog.dropTempView(t.name)
        release_session_checkpoints(spark)
        spark.catalog.clearCache()

    # warm-up (uncounted): JVM, python workers, file-source machinery
    for f in FACES:
        queries[f](spark, sf_dir).write.format("noop").mode("overwrite").save()
        scrub()

    runs: dict[str, list] = {f: [] for f in FACES}
    for i in range(n):
        for f in FACES:
            batches.clear()
            t0 = time.perf_counter()
            queries[f](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = round(time.perf_counter() - t0, 3)
            scrub()
            runs[f].append({"wall": wall, "batches": list(batches)})
            print(
                f"  run {i}: {f} {wall}s ({len(batches)} batches)",
                file=sys.stderr,
                flush=True,
            )

    summary = {}
    for f in FACES:
        walls = [r["wall"] for r in runs[f]]
        slowest = max(runs[f], key=lambda r: r["wall"])
        summary[f] = {
            "walls": walls,
            "min": min(walls),
            "max": max(walls),
            "spread": round(max(walls) / min(walls), 2),
            "slowest_batches": slowest["batches"],
        }
    with open("/tmp/ssjoin_profile_r13.json", "w") as fh:
        json.dump({"n": n, "sf_dir": sf_dir, "runs": runs, "summary": summary}, fh)
    print(
        json.dumps(
            {
                f: {k: v for k, v in s.items() if k != "slowest_batches"}
                for f, s in summary.items()
            }
        )
    )


if __name__ == "__main__":
    main()
