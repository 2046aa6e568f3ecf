"""Round-8 continuation-session surface tour on the sf0.001 tables: the
quality-filtering rules (Gopher flags, char entropy), per-source score
calibration, the Bloom runtime-filter join, tokenizer/corpus statistics
(BPE merge candidates, Heaps-law vocabulary growth), the non-associative
EWMA scan, and product-quantized embedding search with exact rerank."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from polars_numba_spark import get_spark
from polars_numba_spark.operators.sketch import bloom_build, bloom_probe
from polars_numba_spark.operators.text import gopher_quality_flags
from polars_numba_spark.operators.vector import (
    pq_encode,
    pq_rerank_topk,
    pq_train_codebooks,
)
from polars_numba_spark.queries.catalog import EWMA_ALPHA, spark_queries
from polars_numba_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(app_name="example-quality-curation")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, "documents", SF)

    # --- Gopher rules: which docs survive the word-level filters? --------
    flags = gopher_quality_flags(docs, "text", "doc_id")
    kept = flags.where(F.col("keep")).count()
    print(f"Gopher filter keeps {kept}/{docs.count()} docs")
    flags.orderBy("id").show(5)

    # --- corpus statistics: first BPE merges + vocabulary growth ---------
    q = spark_queries()
    print("Top BPE merge candidates:")
    q["bpe_merge_candidates"](spark, SF).show(5)
    print("Heaps-law vocabulary growth (checkpoint deciles):")
    q["corpus_vocab_growth"](spark, SF).show(10)

    # --- Bloom runtime filter: prefilter a fact scan by a selective dim --
    custs = load_table(spark, "customer", SF).where(F.col("c_acctbal") > 5000)
    bloom = bloom_build(custs, "c_custkey")
    orders = load_table(spark, "orders", SF)
    passed = bloom_probe(orders, "o_custkey", bloom).where(F.col("passes_bloom"))
    print(
        f"Bloom prefilter passes {passed.count()}/{orders.count()} orders "
        "to the exact join (false positives re-verified there)"
    )

    # --- EWMA: the non-associative scan, per user ------------------------
    print(f"Per-user EWMA (alpha={EWMA_ALPHA}) of event values:")
    q["user_value_ewma"](spark, SF).orderBy("user_id", "event_id").show(5)

    # --- PQ search: ADC shortlist, exact rerank --------------------------
    emb = load_table(spark, "embeddings", SF)
    books = pq_train_codebooks(emb, m=8, k=16, iterations=2)
    codes = pq_encode(emb, books, m=8)
    queries = emb.where(F.col("vec_id") < 3)
    print("PQ-ADC shortlist -> exact rerank, top-3 per query:")
    pq_rerank_topk(codes, emb, queries, books, k=3, shortlist=20, m=8).orderBy(
        "query_id", "rank"
    ).show(9)

    spark.stop()


if __name__ == "__main__":
    main()
