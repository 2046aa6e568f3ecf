"""One-command dirty-data gate (VERDICT r11 #4): build the seven adversarial
corpus variants, run the FULL cross-engine differential on each, emit one
verdict JSON.

The driver's synthetic testdata is pristine — zero nulls, pure ASCII, no
duplicates — so its hash gate is structurally blind to null-contract,
unicode, tie-break and degenerate-input bugs, and to any formula error
mirrored into the oracle. The round-11 sweeps found ~30 real fixes this
way; this tool makes the sweep a single end-of-round ritual that survives
context resets.

The seven corpora (all single-file parquet under /tmp, derived from
sf0.001):

- ``nulls``    — deterministic NULL injection (build_dirty_corpora)
- ``micro``    — 1-5-row degenerate slices (build_dirty_corpora)
- ``unicode``  — İ / final-sigma / CJK / NBSP injection; gated under
                 ``PNS_CASEFOLD=simple`` so the only known cross-engine
                 divergence class (JVM full vs utf8proc simple case
                 mapping) is removed and the expectation is 0 failures
- ``empty``    — every table zero rows, real schemas
- ``skewed``   — 40% of events on one hot user, 30% of documents one
                 boilerplate text (scale_soak.build_skewed)
- ``dup``      — pipeline tables replicated x3 with id offsets
                 (scale_soak.build_replicated)
- ``combined`` — nulls + unicode + x3 duplicates in ONE build (r12 #6:
                 damage-class interactions); ``PNS_CASEFOLD=simple``

Each differential runs ``tools/check_oracle.py`` in a SUBPROCESS (fresh
JVM + correct env per corpus); per-corpus ok/FAIL counts and the overall
verdict land in ``/tmp/dirty_gate.json`` and on stdout.

Usage:
    python tools/dirty_gate.py              # all seven (~30-45 min)
    python tools/dirty_gate.py nulls empty  # subset of corpora
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

_TOOLS = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_TOOLS)
sys.path.insert(0, _REPO)
sys.path.insert(0, _TOOLS)

SRC = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

CORPORA = {
    "nulls": {"dir": "/tmp/sfnulls"},
    "micro": {"dir": "/tmp/sfmicro"},
    "unicode": {"dir": "/tmp/sfunicode", "env": {"PNS_CASEFOLD": "simple"}},
    "empty": {"dir": "/tmp/sfempty_gate"},
    "skewed": {"dir": "/tmp/sfskew_gate"},
    "dup": {"dir": "/tmp/sfdup_gate"},
    # seventh leg (VERDICT r12 #6): nulls + unicode + x3 duplicates in ONE
    # build — damage-class interactions are the blind spot six single-axis
    # corpora leave. Unicode text => same casefold env as the unicode leg.
    "combined": {"dir": "/tmp/sfcombined", "env": {"PNS_CASEFOLD": "simple"}},
}


def _flatten(src_dir: str, dst_dir: str) -> None:
    """Spark writes directory-parquet; check_oracle's DuckDB views read
    single files. COPY each table through DuckDB into a flat file."""
    import duckdb

    con = duckdb.connect()
    os.makedirs(dst_dir, exist_ok=True)
    for t in TABLES:
        src = f"{src_dir}/{t}.parquet"
        glob = f"{src}/*.parquet" if os.path.isdir(src) else src
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{glob}')) "
            f"TO '{dst_dir}/{t}.parquet' (FORMAT PARQUET)"
        )


def build(names: list[str]) -> None:
    import duckdb

    import build_dirty_corpora as B

    if "nulls" in names:
        B.build_nulls(CORPORA["nulls"]["dir"])
    if "micro" in names:
        B.build_micro(CORPORA["micro"]["dir"])
    if "unicode" in names:
        B.build_unicode(CORPORA["unicode"]["dir"])
    if "combined" in names:
        B.build_combined(CORPORA["combined"]["dir"])
    if "empty" in names:
        dst = CORPORA["empty"]["dir"]
        os.makedirs(dst, exist_ok=True)
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet') "
                f"LIMIT 0) TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
            )
    spark_builds = [n for n in ("skewed", "dup") if n in names]
    if spark_builds:
        import shutil
        import tempfile

        import scale_soak as S

        from polars_numba_spark import get_spark

        spark = get_spark(app_name="dirty-gate-build")
        spark.sparkContext.setLogLevel("ERROR")
        for n in spark_builds:
            staging = tempfile.mkdtemp(prefix=f"pns_dirty_{n}_")
            try:
                if n == "skewed":
                    S.build_skewed(spark, SRC, staging)
                else:
                    S.build_replicated(spark, SRC, staging, factor=3)
                _flatten(staging, CORPORA[n]["dir"])
            finally:
                shutil.rmtree(staging, ignore_errors=True)


def run_differential(name: str) -> dict:
    spec = CORPORA[name]
    env = dict(os.environ, **spec.get("env", {}))
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(_TOOLS, "check_oracle.py"), spec["dir"]],
        capture_output=True, text=True, env=env, cwd=_REPO,
    )
    out = proc.stdout + proc.stderr
    clean = re.sub(r".*\r", "", out)
    oks = len(re.findall(r"^ok    ", clean, re.M))
    fail_lines = [ln for ln in clean.splitlines() if ln.startswith("FAIL")]
    m = re.search(r"^(\d+) failures", clean, re.M)
    failures = int(m.group(1)) if m else None
    return {
        "dir": spec["dir"],
        "ok": oks,
        "failures": failures,
        "rc": proc.returncode,
        "wall_sec": round(time.time() - t0, 1),
        "fail_lines": fail_lines[:40],
        "env": spec.get("env", {}),
    }


def main() -> int:
    names = sys.argv[1:] or list(CORPORA)
    unknown = [n for n in names if n not in CORPORA]
    if unknown:
        raise SystemExit(f"unknown corpora {unknown}; choose from {list(CORPORA)}")
    print(f"building: {names}", flush=True)
    build(names)
    results = {}
    for n in names:
        print(f"differential over {n} ({CORPORA[n]['dir']}) ...", flush=True)
        results[n] = run_differential(n)
        r = results[n]
        print(f"  {n}: {r['ok']} ok, {r['failures']} failures "
              f"[{r['wall_sec']}s]", flush=True)
        for ln in r["fail_lines"]:
            print(f"    {ln}", flush=True)
    verdict = {
        "green": all(r["failures"] == 0 and r["rc"] == 0
                     for r in results.values()),
        "corpora": results,
    }
    with open("/tmp/dirty_gate.json", "w") as f:
        json.dump(verdict, f, indent=1)
    print(json.dumps({"dirty_gate_green": verdict["green"],
                      "per_corpus": {n: r["failures"]
                                     for n, r in results.items()}}))
    return 0 if verdict["green"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
