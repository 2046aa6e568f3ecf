"""Third-eye fixtures for the text/drift pipeline faces.

Same rationale as tests/test_stat_thirdeye.py (the mirrored-oracle blind
spot): each statistic is recomputed INDEPENDENTLY in pure python/numpy
from the same synthetic documents parquet, pinning the textbook formula
rather than either engine spelling.  Covers: Flesch-Kincaid readability,
lexical richness (TTR/hapax/Yule's K), the Zipf rank-frequency fit, PSI
(Laplace-smoothed), the two-sample KS statistic, and 1-Wasserstein drift.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pytest

N_DOCS = 120
PSI_BIN_W = 32


def _gen_documents():
    rng = np.random.RandomState(13)
    rows = []
    for i in range(N_DOCS):
        src = f"src{i % 3}"
        # source-dependent length profile so the drift stats are non-trivial
        n_tok = int(rng.randint(20, 120)) + 40 * (i % 3)
        toks = []
        for j in range(n_tok):
            k = int(min(rng.zipf(1.5), 500))
            toks.append(f"tok{k}a")
            if j % 11 == 10:
                toks[-1] += "." if rng.rand() < 0.7 else "!"
        text = " ".join(toks)
        rows.append((i, text, "en", src, len(text)))
    return rows


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("thirdeye_docs")
    spark.createDataFrame(
        _gen_documents(),
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def docs():
    return _gen_documents()


def _by_source(docs):
    out = {}
    for _, text, _, src, n_chars in docs:
        out.setdefault(src, []).append((text, n_chars))
    return out


# --------------------------------------------------------------------- #
# doc_readability — Flesch-Kincaid constants                             #
# --------------------------------------------------------------------- #
def test_doc_readability(spark, docs_dir, docs):
    from polars_numba_spark.queries.pipeline import doc_readability

    got = {r["source"]: r for r in doc_readability(spark, docs_dir)
           .collect()}
    for src, items in _by_source(docs).items():
        sw = sum(len(t.strip().lower().split()) for t, _ in items)
        ss = sum(max(1, len(re.findall(r"[.!?]+", t))) for t, _ in items)
        sy = sum(len(re.findall(r"[aeiouy]+", t.lower())) for t, _ in items)
        wps, spw = sw / ss, sy / sw
        row = got[src]
        assert row["n_docs"] == len(items)
        assert row["words_per_sentence"] == pytest.approx(wps, rel=1e-12)
        assert row["syllables_per_word"] == pytest.approx(spw, rel=1e-12)
        assert row["fk_grade"] == pytest.approx(
            0.39 * wps + 11.8 * spw - 15.59, rel=1e-10)
        assert row["flesch_ease"] == pytest.approx(
            206.835 - 1.015 * wps - 84.6 * spw, rel=1e-10)


# --------------------------------------------------------------------- #
# doc_lexical_richness — Yule's K                                        #
# --------------------------------------------------------------------- #
def test_doc_lexical_richness(spark, docs_dir, docs):
    from polars_numba_spark.queries.pipeline import doc_lexical_richness

    got = {r["source"]: r for r in doc_lexical_richness(spark, docs_dir)
           .collect()}
    for src, items in _by_source(docs).items():
        freq = {}
        for t, _ in items:
            for tok in t.strip().lower().split():
                freq[tok] = freq.get(tok, 0) + 1
        n = sum(freq.values())
        v = len(freq)
        v1 = sum(1 for f in freq.values() if f == 1)
        f2 = sum(f * f for f in freq.values())
        row = got[src]
        assert (row["n_tokens"], row["vocab"], row["hapax"]) == (n, v, v1)
        assert row["ttr"] == pytest.approx(v / n, rel=1e-12)
        assert row["hapax_frac"] == pytest.approx(v1 / v, rel=1e-12)
        assert row["yule_k"] == pytest.approx(
            10000.0 * (f2 - n) / (n * n), rel=1e-10)


# --------------------------------------------------------------------- #
# corpus_zipf_fit — log-log OLS over the top-1000 tokens                 #
# --------------------------------------------------------------------- #
def test_corpus_zipf_fit(spark, docs_dir, docs):
    from polars_numba_spark.queries.pipeline import corpus_zipf_fit

    row = corpus_zipf_fit(spark, docs_dir).collect()[0]

    freq = {}
    for _, t, _, _, _ in docs:
        for tok in t.strip().lower().split():
            freq[tok] = freq.get(tok, 0) + 1
    top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
    x = np.log(np.arange(1, len(top) + 1, dtype=float))
    y = np.log(np.array([f for _, f in top], dtype=float))
    slope, _ = np.polyfit(x, y, 1)
    r = np.corrcoef(x, y)[0, 1]

    assert row["n_tokens"] == len(top)
    assert row["top_freq"] == top[0][1]
    assert row["zipf_slope"] == pytest.approx(slope, rel=1e-6)
    assert row["r2"] == pytest.approx(r * r, rel=1e-6)
    assert row["zipf_slope"] < 0  # rank-frequency must decay


# --------------------------------------------------------------------- #
# source_drift_psi — Laplace-smoothed PSI on 32-char length bins         #
# --------------------------------------------------------------------- #
def test_source_drift_psi(spark, docs_dir, docs):
    from polars_numba_spark.queries.pipeline import source_drift_psi

    got = {r["source"]: r for r in source_drift_psi(spark, docs_dir)
           .collect()}

    all_bins = [len(t) // PSI_BIN_W for _, t, _, _, _ in docs]
    grid = sorted(set(all_bins))
    n_bins = len(grid)
    nt = len(all_bins)
    base = {b: all_bins.count(b) for b in grid}
    for src, items in _by_source(docs).items():
        src_bins = [len(t) // PSI_BIN_W for t, _ in items]
        ns = len(src_bins)
        psi = 0.0
        for b in grid:
            ps = (src_bins.count(b) + 1) / (ns + n_bins)
            pb = (base[b] + 1) / (nt + n_bins)
            psi += (ps - pb) * math.log(ps / pb)
        row = got[src]
        assert row["n_docs"] == ns
        assert row["psi"] == pytest.approx(psi, abs=1e-6)


# --------------------------------------------------------------------- #
# source_drift_ks / source_drift_wasserstein — CDF grid statistics       #
# --------------------------------------------------------------------- #
def _cdf_stats(docs):
    """(per-source KS sup, per-source W1) over n_chars vs the corpus."""
    all_x = sorted({n for _, _, _, _, n in docs})
    corpus = [n for _, _, _, _, n in docs]
    n_all = len(corpus)
    out = {}
    for src, items in _by_source(docs).items():
        vals = [n for _, n in items]
        n_g = len(vals)
        ks = 0.0
        w1 = 0.0
        for i, x in enumerate(all_x):
            cg = sum(1 for v in vals if v <= x) / n_g
            ca = sum(1 for v in corpus if v <= x) / n_all
            ks = max(ks, abs(cg - ca))
            if i + 1 < len(all_x):
                w1 += abs(cg - ca) * (all_x[i + 1] - x)
        out[src] = (n_g, ks, w1)
    return out


def test_source_drift_ks_and_wasserstein(spark, docs_dir, docs):
    from polars_numba_spark.queries.pipeline import (
        source_drift_ks,
        source_drift_wasserstein,
    )

    expect = _cdf_stats(docs)
    ks_got = {r["source"]: r for r in source_drift_ks(spark, docs_dir)
              .collect()}
    w1_got = {r["source"]: r
              for r in source_drift_wasserstein(spark, docs_dir).collect()}
    for src, (n_g, ks, w1) in expect.items():
        assert ks_got[src]["n_docs"] == n_g
        assert ks_got[src]["ks_stat"] == pytest.approx(ks, abs=1e-8)
        assert w1_got[src]["n_docs"] == n_g
        assert w1_got[src]["w1"] == pytest.approx(w1, abs=1e-5)
