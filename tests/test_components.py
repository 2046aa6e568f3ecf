"""Connected-components / keep-list tests (the cluster step of dedup)."""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_numba_spark.operators.dedup import (
    connected_components,
    dedup_keep_list,
    minhash_dedup_pairs,
)


def test_components_basic_graph(spark):
    # components: {1,2,3,4} (chain), {10,11}, {20 isolated via self-ref edge}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 20)], "a_id long, b_id long"
    )
    comps = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert comps == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}


def test_components_long_chain_converges(spark):
    n = 30
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "a_id long, b_id long"
    )
    comps = connected_components(edges, max_iterations=40).collect()
    assert all(r["component"] == 0 for r in comps)
    assert len(comps) == n + 1


def test_keep_list_on_real_near_dups(spark):
    from polars_numba_spark.sources import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001").limit(40)
    clone = docs.where(F.col("doc_id") < 3).withColumn(
        "doc_id", F.col("doc_id") + 50000
    )
    with_dups = docs.union(clone)
    pairs = minhash_dedup_pairs(with_dups, threshold=0.95)
    verdict = dedup_keep_list(with_dups, pairs)
    rows = {r["id"]: (r["keep"], r["component"]) for r in verdict.collect()}
    assert len(rows) == 43
    # every injected clone is dropped, its original kept
    for orig in [0, 1, 2]:
        clone_id = orig + 50000
        if clone_id in rows:  # clone present
            keep_clone, comp_clone = rows[clone_id]
            keep_orig, comp_orig = rows[orig]
            assert comp_clone == comp_orig
            assert keep_orig and not keep_clone
    # unpaired docs all keep themselves
    assert all(k for i, (k, c) in rows.items() if c == i)


def test_components_raises_on_iteration_cap(spark):
    import pytest

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "a_id long, b_id long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iterations=3)
