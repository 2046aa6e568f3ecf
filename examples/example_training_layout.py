"""Round-6 training-layout tour: exact-k weighted sampling without
replacement (Efraimidis–Spirakis), concat-then-chunk sequence packing,
and the zone-map sorted-parquet layout — the steps between a curated
corpus and the files a training job actually reads, over sf0.001."""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from polars_numba_spark import get_spark
from polars_numba_spark.operators.packing import pack_sequences
from polars_numba_spark.operators.sampling import weighted_sample_k
from polars_numba_spark.sources import load_table
from polars_numba_spark.sources.formats import write_sorted_parquet

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(app_name="example-training-layout")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, "documents", SF)

    # --- weighted sample: 3 docs per source, P ∝ n_chars ----------------
    sample = weighted_sample_k(
        docs, "doc_id", "n_chars", k=3, group_col="source", salt="tour"
    )
    print("length-weighted sample (3 per source, first 6 rows):")
    sample.select("source", "doc_id", "n_chars").orderBy("source", "doc_id").show(6)

    # --- sequence packing: 512-token sequences, chars/4 proxy ------------
    packed = pack_sequences(
        docs.withColumn("n_tokens", F.expr("(n_chars + 3) div 4")),
        "doc_id",
        "n_tokens",
        capacity=512,
        n_shards=4,
    )
    print("packing: docs per sequence (per shard):")
    packed.groupBy("shard", "seq_index").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("tokens"),
    ).orderBy("shard", "seq_index").show(8)

    # --- zone-map layout: sort lineitem by shipdate, show the stats ------
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "lineitem_sorted")
        l = load_table(spark, "lineitem", SF).select(  # noqa: E741
            "l_orderkey", "l_extendedprice", "l_shipdate"
        )
        write_sorted_parquet(l, path, "l_shipdate", n_files=8)
        month = spark.read.parquet(path).where(
            (F.col("l_shipdate") >= "1995-03-01")
            & (F.col("l_shipdate") < "1995-04-01")
        )
        print(f"one-month slice over sorted layout: {month.count()} rows")

    spark.stop()


if __name__ == "__main__":
    main()
