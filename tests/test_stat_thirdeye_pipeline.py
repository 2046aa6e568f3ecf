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


# --------------------------------------------------------------------- #
# bm25_topk + search_ranking_metrics — Okapi BM25 and P@10/MRR/NDCG      #
# --------------------------------------------------------------------- #
_QUERY_VOCAB = ("customer order value hash join merge table scan fast "
                "stream window batch").split()


def _gen_retrieval_docs():
    rng = np.random.RandomState(29)
    fill = [f"fill{k}" for k in range(30)]
    rows = []
    for i in range(60):
        n_tok = int(rng.randint(15, 60))
        toks = []
        for _ in range(n_tok):
            if rng.rand() < 0.35:
                toks.append(_QUERY_VOCAB[int(rng.randint(len(_QUERY_VOCAB)))])
            else:
                toks.append(fill[int(rng.randint(len(fill)))])
        text = " ".join(toks)
        rows.append((i, text, "en", f"src{i % 3}", len(text)))
    return rows


def _python_bm25(docs, queries, k1=1.2, b=0.75, k=10):
    """Independent Okapi BM25 + binary-relevance ranking metrics."""
    toks = {d: t.strip().lower().split() for d, t, _, _, _ in docs}
    tf = {d: {} for d in toks}
    for d, ts in toks.items():
        for t in ts:
            tf[d][t] = tf[d].get(t, 0) + 1
    dl = {d: len(ts) for d, ts in toks.items()}
    n_docs = sum(1 for ts in toks.values() if ts)
    avgdl = sum(dl.values()) / n_docs
    df = {}
    for d, fs in tf.items():
        for t in fs:
            df[t] = df.get(t, 0) + 1

    ranked, metrics = {}, {}
    for qid, qtext in queries:
        terms = sorted(set(qtext.lower().split()))
        scored = []
        for d, fs in tf.items():
            matched = [t for t in terms if t in fs]
            if not matched:
                continue
            s = 0.0
            for t in matched:
                idf = math.log(1 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
                denom = fs[t] + k1 * (1 - b + b * dl[d] / avgdl)
                s += idf * fs[t] * (k1 + 1) / denom
            scored.append((-s, d, len(matched), s))
        scored.sort()
        top = scored[:k]
        ranked[qid] = [(d, r + 1, nm, s)
                       for r, (_, d, nm, s) in enumerate(top)]
        rel = {d for d, fs in tf.items() if all(t in fs for t in terms)}
        hits = [(i + 1, row[1] in rel) for i, row in enumerate(top)]
        n_hits = sum(1 for _, h in hits if h)
        first = min((r for r, h in hits if h), default=0)
        dcg = sum(1.0 / math.log2(r + 1) for r, h in hits if h)
        idcg = sum(1.0 / math.log2(i + 1)
                   for i in range(1, min(len(rel), 10) + 1))
        metrics[qid] = {
            "n_relevant": len(rel),
            "precision_at_10": n_hits / 10.0,
            "mrr": (1.0 / first) if first else 0.0,
            "ndcg_at_10": (dcg / idcg) if idcg > 0 else 0.0,
        }
    return ranked, metrics


@pytest.fixture(scope="module")
def retrieval_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("thirdeye_retrieval")
    spark.createDataFrame(
        _gen_retrieval_docs(),
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_bm25_and_ranking_metrics(spark, retrieval_dir):
    from polars_numba_spark.operators import text as X
    from polars_numba_spark.queries.pipeline import (
        _BM25_QUERIES,
        search_ranking_metrics,
    )
    from polars_numba_spark.sources import load_table

    docs = _gen_retrieval_docs()
    exp_ranked, exp_metrics = _python_bm25(docs, _BM25_QUERIES)

    d = load_table(spark, "documents", retrieval_dir)
    got_ranked = {}
    for r in X.bm25_topk(d, _BM25_QUERIES, k=10).collect():
        got_ranked.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["n_terms"], float(r["score"])))
    for qid, rows in exp_ranked.items():
        got = sorted(got_ranked[qid])
        assert len(got) == len(rows)
        for (doc, rank, nm, score), (g_rank, g_doc, g_nm, g_score) in zip(
                rows, got):
            assert (g_rank, g_doc, g_nm) == (rank, doc, nm), qid
            assert g_score == pytest.approx(score, abs=1e-6)

    got_m = {r["query_id"]: r
             for r in search_ranking_metrics(spark, retrieval_dir).collect()}
    for qid, m in exp_metrics.items():
        row = got_m[qid]
        assert row["n_relevant"] == m["n_relevant"]
        assert row["precision_at_10"] == pytest.approx(
            m["precision_at_10"], abs=1e-9)
        assert row["mrr"] == pytest.approx(m["mrr"], abs=1e-9)
        assert row["ndcg_at_10"] == pytest.approx(
            m["ndcg_at_10"], abs=1e-6)


# --------------------------------------------------------------------- #
# kmeans_silhouette — centroid silhouette s = (b−a)/max(a,b)             #
# --------------------------------------------------------------------- #
def _gen_embeddings():
    rng = np.random.RandomState(41)
    rows = []
    centers = rng.randn(4, 8) * 3.0
    for i in range(40):
        v = centers[i % 4] + rng.randn(8) * 0.4
        rows.append((i, [float(np.float32(x)) for x in v], int(i % 4)))
    return rows


@pytest.fixture(scope="module")
def emb_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("thirdeye_emb")
    spark.createDataFrame(
        _gen_embeddings(), "vec_id long, embedding array<float>, label int",
    ).coalesce(1).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


def test_kmeans_silhouette(spark, emb_dir):
    from polars_numba_spark.queries.pipeline import kmeans_silhouette

    rows = _gen_embeddings()
    # float32 storage read back as float64 — mirror the cast exactly
    vecs = {i: np.array(v, dtype=np.float32).astype(np.float64)
            for i, v, _ in rows}

    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    # the face's recipe: seeds = first k=8 vectors by id, ONE Lloyd
    # iteration (assign to seeds -> mean centroids), then re-assign.
    seeds = {lab: vecs[lab] for lab in range(8)}
    assign0 = {i: max(seeds, key=lambda c: (cos(v, seeds[c]), -c))
               for i, v in vecs.items()}
    cent1 = {}
    for c in sorted(set(assign0.values())):
        members = [vecs[i] for i, a in assign0.items() if a == c]
        cent1[c] = np.round(np.mean(members, axis=0), 9)
    assign1 = {i: max(cent1, key=lambda c: (cos(v, cent1[c]), -c))
               for i, v in vecs.items()}

    per_cluster = {}
    for i, v in vecs.items():
        rcos = {c: round(cos(v, cv), 9) for c, cv in cent1.items()}
        own = assign1[i]
        a = 1.0 - rcos[own]
        others = [rc for c, rc in rcos.items() if c != own]
        b = 1.0 - max(others)
        s = (b - a) / max(a, b) if max(a, b) > 0 else 0.0
        per_cluster.setdefault(own, []).append(round(s, 9))

    got = {r["cluster"]: r for r in kmeans_silhouette(spark, emb_dir)
           .collect()}
    assert set(got) == set(per_cluster)
    for c, ss in per_cluster.items():
        assert got[c]["n_members"] == len(ss)
        assert got[c]["mean_silhouette"] == pytest.approx(
            sum(ss) / len(ss), abs=1e-6)
    # well-separated synthetic clusters: overall mean silhouette must be
    # decisively positive (a sign error in a or b flips it negative)
    all_s = [s for ss in per_cluster.values() for s in ss]
    assert sum(all_s) / len(all_s) > 0.3


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
