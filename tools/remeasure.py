"""Quiet-host best-of-N isolated re-measure (the r5/r7 methodology,
BASELINE.md "Isolated re-measure" sections): one warm session at
$SPARK_GRAFT_SF_DIR, N back-to-back noop-sink runs per named query with
full per-query session hygiene, printing per-run seconds and the warm
floor. Usage:

    python tools/remeasure.py [N] query1 query2 ...

Record the host load average alongside the numbers — runs that race other
JVMs are contaminated (BASELINE.md round-6 lesson)."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    args = sys.argv[1:]
    n = 3
    if args and args[0].isdigit():
        n = int(args[0])
        args = args[1:]
    if not args:
        raise SystemExit("usage: remeasure.py [N] query1 query2 ...")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from polars_numba_spark import get_spark
    from polars_numba_spark.plans.checkpoint import release_session_checkpoints
    from polars_numba_spark.queries import catalog

    spark = get_spark(app_name="remeasure")
    spark.sparkContext.setLogLevel("ERROR")
    queries = catalog.spark_queries()
    unknown = [q for q in args if q not in queries]
    if unknown:
        raise SystemExit(f"not in catalog: {unknown}")

    def scrub() -> None:
        for table in spark.catalog.listTables():
            if table.name.startswith("pns_"):
                spark.catalog.dropTempView(table.name)
        release_session_checkpoints(spark)
        spark.catalog.clearCache()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        elapsed = time.perf_counter() - t0
        scrub()
        return elapsed

    def cpu_tree_seconds() -> float:
        """Total user+sys CPU seconds of this process and every live
        descendant (the JVM and its python workers). Wall clock on a
        shared host is scheduling-noisy; total CPU burned by a query is
        far more stable, so A/B comparisons report both (r14)."""
        tick = os.sysconf("SC_CLK_TCK")
        me = os.getpid()
        procs: dict[int, tuple[int, float]] = {}
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/stat") as f:
                    parts = f.read().rsplit(")", 1)[1].split()
                ppid = int(parts[1])
                cpu = (int(parts[11]) + int(parts[12])) / tick
                procs[int(pid)] = (ppid, cpu)
            except OSError:
                continue
        total = 0.0
        for pid, (ppid, cpu) in procs.items():
            p = pid
            while p > 1:
                if p == me:
                    total += cpu
                    break
                p = procs.get(p, (0, 0.0))[0]
        return total

    print(f"load avg at start: {os.getloadavg()}", flush=True)
    for warm in ("q6_revenue_forecast", "capped_balance_per_user"):
        run(warm)

    out = {}
    for name in args:
        runs, cpus = [], []
        for _ in range(n):
            c0 = cpu_tree_seconds()
            runs.append(round(run(name), 3))
            cpus.append(round(cpu_tree_seconds() - c0, 2))
        out[name] = {"runs": runs, "floor": min(runs),
                     "cpu": cpus, "cpu_floor": min(cpus)}
        print(f"{name}: {' / '.join(f'{r:.2f}' for r in runs)}  floor={min(runs):.2f}"
              f"  cpu={' / '.join(f'{c:.1f}' for c in cpus)} cpu_floor={min(cpus):.1f}",
              flush=True)
    print("REMEASURE " + json.dumps({"sf_dir": sf_dir, "results": out,
                                     "load_end": os.getloadavg()}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
