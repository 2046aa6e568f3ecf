"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and, where an oracle
exists, the matching ``oracle_sql()`` in DuckDB against the same parquet
tables; compares row count and order-insensitive values (columns sorted by
name, rows sorted by all columns). Exact equality for ints/strings/timestamps;
doubles compared bitwise first, then to 1e-9 relative as a diagnostic.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(rows: list[tuple], colnames: list[str]) -> list[tuple]:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            if isinstance(v, list):
                v = tuple(v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda r: tuple((x is None, str(type(x)), x) for x in r))
    return out


def compare(name: str, spark_rows, spark_cols, duck_rows, duck_cols) -> list[str]:
    problems = []
    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"schema: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(f"rowcount: spark={len(spark_rows)} duck={len(duck_rows)}")
        return problems
    a = normalize(spark_rows, spark_cols)
    b = normalize(duck_rows, duck_cols)
    n_mismatch = 0
    first = None
    for ra, rb in zip(a, b):
        if ra != rb:
            exactish = all(
                (
                    va == vb
                    or (
                        isinstance(va, float)
                        and isinstance(vb, float)
                        and (
                            math.isclose(va, vb, rel_tol=1e-9, abs_tol=1e-12)
                            or (math.isnan(va) and math.isnan(vb))
                        )
                    )
                )
                for va, vb in zip(ra, rb)
            )
            n_mismatch += 1
            if first is None:
                first = (ra, rb, "close" if exactish else "FAR")
    if n_mismatch:
        problems.append(f"values: {n_mismatch}/{len(a)} rows differ; first={first}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from polars_numba_spark import get_spark

    spark = get_spark(app_name="oracle-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connect(sf_dir)

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_cols = sdf.columns
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            failures += 1
            continue
        if name not in oracles:
            status = "rows-only"
            print(f"ok    {name}: {len(spark_rows)} rows ({status}) "
                  f"[{time.time()-t0:.1f}s]")
            if len(spark_rows) == 0:
                print(f"WARN  {name}: zero rows")
            continue
        try:
            rel = con.execute(oracles[name])
            duck_cols = [d[0] for d in rel.description]
            duck_rows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            failures += 1
            continue
        problems = compare(name, spark_rows, spark_cols, duck_rows, duck_cols)
        if problems:
            failures += 1
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"ok    {name}: {len(spark_rows)} rows match oracle "
                  f"[{time.time()-t0:.1f}s]")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
