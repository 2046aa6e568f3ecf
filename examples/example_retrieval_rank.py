"""Round-8 surface tour: the retrieval / ranking / sketch additions end to
end on the sf0.001 tables — BM25 search-based decontamination, PageRank
corpus centrality, contrastive triplet mining, and the portable HLL (batch
face; the streaming face holds the same registers as keyed state)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from polars_numba_spark import get_spark
from polars_numba_spark.operators.graphrank import pagerank
from polars_numba_spark.operators.sketch import hll_distinct
from polars_numba_spark.operators.text import bm25_topk, tokens
from polars_numba_spark.operators.vector import contrastive_triplets
from polars_numba_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(app_name="example-retrieval-rank")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, "documents", SF)

    # --- BM25: which training docs would these eval probes retrieve? -----
    # (search-based decontamination: top hits are removal candidates)
    probes = [
        ("eval_joins", "hash join merge"),
        ("eval_scans", "table scan fast"),
    ]
    hits = bm25_topk(docs, probes, k=5)
    print("BM25 top hits per eval probe (decontamination candidates):")
    hits.show(10, truncate=False)

    # --- PageRank: corpus centrality on the doc-term graph ---------------
    occ = docs.select("doc_id", F.explode(tokens("text")).alias("term")).distinct()
    d_node = F.concat(F.lit("d:"), F.col("doc_id").cast("string"))
    t_node = F.concat(F.lit("t:"), F.col("term"))
    edges = occ.select(d_node.alias("src"), t_node.alias("dst")).union(
        occ.select(t_node.alias("src"), d_node.alias("dst"))
    )
    central = (
        pagerank(edges, iterations=3)
        .where(F.col("node").startswith("d:"))
        .orderBy(F.col("rank").desc())
        .limit(5)
    )
    print("most corpus-central documents (PageRank over doc-term graph):")
    central.show(truncate=False)

    # --- contrastive triplets over the labeled embeddings ----------------
    emb = load_table(spark, "embeddings", SF)
    trips = contrastive_triplets(emb, negatives=2)
    print("contrastive triplets (anchor, hardest positive, hash-picked negative):")
    trips.orderBy("anchor_id", "slot").show(6)

    # --- portable HLL: engine-reproducible distinct sketch ---------------
    events = load_table(spark, "events", SF)
    print("per-type distinct users, portable HLL (p=12):")
    hll_distinct(events, "user_id", "event_type").orderBy("event_type").show()

    spark.stop()


if __name__ == "__main__":
    main()
