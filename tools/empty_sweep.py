"""Empty-corpus robustness sweep: run every catalog face against
zero-row tables in BOTH engines; record crash vs empty-result vs rows.
At 100 TB an empty source/partition/filter result is routine — faces
should degrade to empty frames, not stack traces (the hill-tail-index
lesson, ADVICE r10 #3)."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from polars_numba_spark import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    spark = get_spark(app_name="empty-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    src, dst = "/root/testdata/sf0.001", "/tmp/sfempty"
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        p = f"{dst}/{t}.parquet"
        if not os.path.exists(p):
            (spark.read.parquet(f"{src}/{t}.parquet").limit(0)
             .coalesce(1).write.mode("overwrite").parquet(p))

    import __spark_entry__ as E
    qs, osql = E.queries(), E.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{dst}/{t}.parquet/*.parquet')"
        )

    results = {}
    for name, fn in qs.items():
        row = {}
        try:
            row["spark_rows"] = fn(spark, dst).count()
        except Exception as e:  # noqa: BLE001
            row["spark_err"] = f"{type(e).__name__}: {str(e)[:300]}"
        if name in osql:
            try:
                row["oracle_rows"] = len(con.execute(osql[name]).fetchall())
            except Exception as e:  # noqa: BLE001
                row["oracle_err"] = f"{type(e).__name__}: {str(e)[:300]}"
        results[name] = row
        flag = ""
        if "spark_err" in row:
            flag = " SPARK-ERR"
        if "oracle_err" in row:
            flag += " ORACLE-ERR"
        if ("spark_rows" in row and "oracle_rows" in row
                and row["spark_rows"] != row["oracle_rows"]):
            flag += " ROWS-DIVERGE"
        print(f"{name}: {row}{flag}", flush=True)
    with open("/tmp/empty_sweep.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
