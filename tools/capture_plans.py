"""Capture .explain('formatted') for named catalog queries into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> <suffix> query1 query2 ...
Writes plans/<tag>/<query>_<suffix>.txt (suffix: before/after).

NOTE: building a query's DataFrame may run small plan-construction jobs
(via='auto' sketches); streaming faces RUN their streaming job during
construction — acceptable (the plan captured is the final batch read plus
whatever the face returns), but budget time accordingly.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main() -> int:
    tag, suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    from polars_numba_spark import get_spark
    from polars_numba_spark.plans.inspect import explain_string
    from polars_numba_spark.queries import catalog

    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = catalog.spark_queries()
    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            text = explain_string(df, "formatted")
        except Exception as exc:
            text = f"ERROR: {type(exc).__name__}: {exc}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text)} chars)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
