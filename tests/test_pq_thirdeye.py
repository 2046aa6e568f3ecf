"""Third-eye recomputation of the PORTABLE PQ pipeline (VERDICT r12 #4).

The `embedding_pq_encode` face is gated Spark-vs-DuckDB; this suite is the
THIRD independent implementation (pure Python, no Spark/DuckDB code
shared): the portable 2-iteration Lloyd training (`round_to=9` — per-dim
means accumulated as exact decimals quantized to 12 then rounded to 9,
the DECIMAL(28,12) recipe; round-before-compare argmins with ties on
code) and the final encode, recomputed from the raw vectors and compared
code-for-code. A mirrored-formula bug that fooled both engines the same
way would still diverge here.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import pytest
from pyspark.sql import functions as F

M, K, ITERS, DIM = 4, 16, 2, 64


def _round_half_up(x: float, scale: int) -> float:
    # Spark's Cast(double->decimal) and round() go through
    # BigDecimal.valueOf(double) = Double.toString (shortest repr), then
    # setScale(scale, HALF_UP); Decimal(repr(x)) reproduces that exactly.
    return float(Decimal(repr(x)).quantize(Decimal(1).scaleb(-scale), ROUND_HALF_UP))


def _sub(v: list[float], s: int) -> list[float]:
    w = len(v) // M
    return v[s * w : (s + 1) * w] if s < M - 1 else v[(M - 1) * w :]


def _fold_dot(a: list[float], b: list[float]) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _fold_sq(a: list[float]) -> float:
    acc = 0.0
    for x in a:
        acc = acc + x * x
    return acc


def _assign(subs: dict, cents: dict) -> dict:
    """(id, s) -> code by argmin round9(-2<v,c> + |c|^2), ties on code."""
    out = {}
    cn2 = {(s, c): _fold_sq(cv) for (s, c), cv in cents.items()}
    for (i, s), v in subs.items():
        best = None
        for (cs, c), cv in cents.items():
            if cs != s:
                continue
            d2 = _round_half_up(-2.0 * _fold_dot(v, cv) + cn2[(cs, c)], 9)
            key = (d2, c)
            if best is None or key < best:
                best = key
        out[(i, s)] = best[1]
    return out


def _py_pq_encode(vectors: dict) -> dict:
    subs = {(i, s): _sub(v, s) for i, v in vectors.items() for s in range(M)}
    seed_ids = sorted(vectors)[:K]
    cents = {
        (s, code): subs[(i, s)]
        for code, i in enumerate(seed_ids)
        for s in range(M)
    }
    for _ in range(ITERS):
        assigned = _assign(subs, cents)
        members: dict = {}
        for (i, s), code in assigned.items():
            members.setdefault((s, code), []).append(subs[(i, s)])
        cents = {}
        for (s, code), vecs in members.items():
            dim = len(vecs[0])
            cent = []
            for d in range(dim):
                total = sum(
                    Decimal(repr(v[d])).quantize(
                        Decimal("1e-12"), ROUND_HALF_UP
                    )
                    for v in vecs
                )
                cent.append(_round_half_up(float(total) / len(vecs), 9))
            cents[(s, code)] = cent
    return _assign(subs, cents)


@pytest.fixture(scope="module")
def vectors(spark):
    from polars_numba_spark.sources import load_table

    rows = (
        load_table(spark, "embeddings", "/root/testdata/sf0.001")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
        .collect()
    )
    return {r["vec_id"]: list(r["e"]) for r in rows}


def test_portable_pq_encode_matches_pure_python(spark, vectors):
    from polars_numba_spark.operators.vector import (
        pq_encode,
        pq_train_codebooks,
    )
    from polars_numba_spark.sources import load_table

    e = load_table(spark, "embeddings", "/root/testdata/sf0.001")
    books = pq_train_codebooks(e, m=M, k=K, iterations=ITERS, round_to=9)
    codes = {
        (r["id"], r["s"]): r["code"]
        for r in pq_encode(e, books, m=M, round_to=9).collect()
    }
    expected = _py_pq_encode(vectors)
    assert len(codes) == len(vectors) * M
    mism = {k: (codes[k], expected[k]) for k in expected if codes[k] != expected[k]}
    assert mism == {}, f"{len(mism)} code mismatches, e.g. {list(mism.items())[:5]}"


def test_portable_codebooks_match_pure_python_centroids(spark, vectors):
    """The trained centroid VALUES themselves (not just the codes) must
    match the decimal-exact recipe bit-for-bit."""
    from polars_numba_spark.operators.vector import pq_train_codebooks
    from polars_numba_spark.sources import load_table

    e = load_table(spark, "embeddings", "/root/testdata/sf0.001")
    books = {
        (r["s"], r["code"]): list(r["centroid"])
        for r in pq_train_codebooks(
            e, m=M, k=K, iterations=ITERS, round_to=9
        ).collect()
    }
    # recompute training only (the first ITERS-1 assignments + final means)
    subs = {(i, s): _sub(v, s) for i, v in vectors.items() for s in range(M)}
    seed_ids = sorted(vectors)[:K]
    cents = {
        (s, code): subs[(i, s)]
        for code, i in enumerate(seed_ids)
        for s in range(M)
    }
    for _ in range(ITERS):
        assigned = _assign(subs, cents)
        members: dict = {}
        for (i, s), code in assigned.items():
            members.setdefault((s, code), []).append(subs[(i, s)])
        cents = {}
        for (s, code), vecs in members.items():
            cent = []
            for d in range(len(vecs[0])):
                total = sum(
                    Decimal(repr(v[d])).quantize(
                        Decimal("1e-12"), ROUND_HALF_UP
                    )
                    for v in vecs
                )
                cent.append(_round_half_up(float(total) / len(vecs), 9))
            cents[(s, code)] = cent
    assert set(books) == set(cents)
    for key in cents:
        assert books[key] == cents[key], key
