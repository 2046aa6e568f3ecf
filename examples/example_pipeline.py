"""Training-data pipeline example: quality → dedup → split → chunks over
the documents table, plus embedding similarity search — the extension
surface beyond the reference."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from pyspark.sql import functions as F

from polars_numba_spark import get_spark
from polars_numba_spark.operators.chunking import chunk_documents
from polars_numba_spark.operators.dedup import minhash_dedup_pairs
from polars_numba_spark.operators.sampling import split_by_hash
from polars_numba_spark.operators.similarity import brute_force_topk
from polars_numba_spark.operators.text import quality_score
from polars_numba_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(app_name="example-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, "documents", SF)

    # quality signals: length/stopword score, repetition, LM-proxy logprob
    from polars_numba_spark.operators.text import (
        redact_pii,
        repetition_stats,
        unigram_logprob_scores,
    )

    rep = repetition_stats(docs)
    lp = unigram_logprob_scores(docs)
    scored = (
        docs.select("doc_id", "source", "text", quality_score("text").alias("q"))
        .join(rep.select("doc_id", "token_rep_frac"), "doc_id")
        .join(lp.select("doc_id", "avg_logprob"), "doc_id")
    )
    curated = scored.where(
        (F.col("q") >= 0.5) & (F.col("token_rep_frac") <= 0.9)
    ).withColumn("text", redact_pii("text"))
    print("curated docs:", curated.count())
    assert curated.count() > 0

    # weighted mixing, split, chunking
    from polars_numba_spark.operators.sampling import weighted_mix_by_hash

    mixed = weighted_mix_by_hash(
        curated, "doc_id", "source", {"src0": 1.0}, default_fraction=0.5
    )
    split = split_by_hash(mixed, "doc_id", {"train": 0.9, "test": 0.1})
    chunks = chunk_documents(split.where(F.col("split") == "train"))
    print("train chunks:", chunks.count())
    assert chunks.count() > 0

    near_dups = minhash_dedup_pairs(docs, threshold=0.9)
    print("near-dup pairs (jaccard ≥ 0.9):", near_dups.count())

    # passage-level dedup: duplicated spans, then the removal pass
    from polars_numba_spark.operators.dedup import (
        duplicated_spans,
        remove_duplicated_passages,
    )

    spans = duplicated_spans(docs, shingle_n=8, via="join")
    cleaned = remove_duplicated_passages(docs, shingle_n=8, via="join")
    print("duplicated passage spans:", spans.count())
    assert cleaned.count() == docs.count()  # removal never drops documents

    emb = load_table(spark, "embeddings", SF)

    # SemDeDup: cluster-bounded semantic near-dup pairs + keep policy
    from polars_numba_spark.operators.vector import (
        semantic_dedup_keep,
        semantic_dedup_pairs,
    )

    sem_pairs = semantic_dedup_pairs(emb, k=4, iterations=2, threshold=0.3)
    sem_kept = semantic_dedup_keep(emb, sem_pairs)
    print("semantic near-dup pairs:", sem_pairs.count(), "kept:", sem_kept.count())
    assert sem_kept.count() <= emb.count()

    topk = brute_force_topk(emb, emb.where(F.col("vec_id") < 3), k=3)
    assert topk.count() == 9
    print("top-3 neighbors per query:")
    topk.show(9, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
