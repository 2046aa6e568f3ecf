"""Cross-engine parity of the self-scaling cluster count.

k_for_corpus (Python, drives kmeans_iterations' seed limit) and
K_FOR_CORPUS_SQL (DuckDB, drives the unrolled k-means oracle CTE) must
agree for EVERY corpus size, or the SemDeDup / triplet oracles silently
cluster with a different k than the Spark side and the hash gate reads a
plan difference as a correctness failure. No Spark session needed."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from polars_numba_spark.operators.vector import (
    K_FOR_CORPUS_SQL,
    k_for_corpus,
)


def _sql_k(n: int) -> int:
    # the oracle spelling, with COUNT(*) replaced by the literal n
    expr = K_FOR_CORPUS_SQL.replace("COUNT(*)", str(n))
    return duckdb.sql(f"SELECT {expr} AS k").fetchone()[0]


def test_known_points():
    assert k_for_corpus(1) == 8
    assert k_for_corpus(64) == 8
    assert k_for_corpus(65) == 9  # ceil(sqrt(65)) = 9
    assert k_for_corpus(500) == 23  # the sf0.01 embeddings corpus
    assert k_for_corpus(2000) == 45  # the sf0.1 corpus
    assert k_for_corpus(20000) == 142  # the 10x soak build
    assert k_for_corpus(2500) == 50  # perfect square: no ceil straddle
    assert k_for_corpus(10**9) == 31623  # the SemDeDup-on-LAION order


@settings(max_examples=300, deadline=None)
@given(
    st.one_of(
        st.integers(min_value=1, max_value=100_000),
        st.integers(min_value=1, max_value=10**12),
        # perfect squares and their neighbors: the ceil boundary cases
        st.integers(min_value=1, max_value=10**6).map(lambda r: r * r),
        st.integers(min_value=2, max_value=10**6).map(lambda r: r * r - 1),
        st.integers(min_value=1, max_value=10**6).map(lambda r: r * r + 1),
    )
)
def test_python_matches_sql_spelling(n):
    assert k_for_corpus(n) == _sql_k(n)
