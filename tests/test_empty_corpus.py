"""Empty-corpus regression pins (round-11 sweep, tools/empty_sweep.py).

At 100 TB an empty source / partition / filter result is routine, so a
face must degrade to an empty (or all-null-spine) frame — not a stack
trace, and not a row-count the mirrored oracle disagrees with.  The
round-11 sweep ran all 237 faces against zero-row tables in BOTH
engines and found seven divergers; these tests pin the fixed behavior
of each so it cannot regress.  (The other 230 faces already agreed;
re-running all of them per-suite would cost ~15 minutes, so the sweep
itself stays a tool, not a test.)
"""

from __future__ import annotations

import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def empty_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sfempty")
    for t in TABLES:
        schema = spark.read.parquet(
            f"/root/testdata/sf0.001/{t}.parquet"
        ).schema
        spark.createDataFrame([], schema).coalesce(1).write.parquet(
            str(d / f"{t}.parquet")
        )
    return str(d)


@pytest.fixture(scope="module")
def micro_dir(spark, tmp_path_factory):
    """Degenerate micro slices (1-5 rows per pipeline table): the scale
    where single-day series, zero-variance pairs, wedge-free graphs and
    empty truth sets appear — all of which must yield NULL statistics,
    not ANSI divide-by-zero errors."""
    from pyspark.sql import functions as F

    d = tmp_path_factory.mktemp("sfmicro")
    preds = {
        "region": None, "nation": None,
        "customer": F.col("c_custkey") < 5,
        "supplier": F.col("s_suppkey") < 3,
        "part": F.col("p_partkey") < 5,
        "orders": F.col("o_orderkey") < 40,
        "lineitem": F.col("l_orderkey") < 40,
        "events": F.col("event_id") < 60,
        "documents": F.col("doc_id") < 3,
        "embeddings": F.col("vec_id") < 5,
    }
    for t, pred in preds.items():
        df = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
        if pred is not None:
            df = df.where(pred)
        df.coalesce(1).write.parquet(str(d / f"{t}.parquet"))
    return str(d)


def test_micro_corpus_no_ansi_divide_by_zero(spark, micro_dir):
    """Round-11 micro sweep: five faces crashed with DIVIDE_BY_ZERO on
    degenerate denominators (n=1 OLS, constant-series ACF, zero-variance
    Pearson, wedge-free clustering, empty recall truth set). All five
    must now return NULL for the undefined statistic instead."""
    from polars_numba_spark.queries import catalog

    qs = catalog.spark_queries()
    for name, col in [
        ("events_ols_trend", "slope"),
        ("events_daily_acf", "acf"),
        ("event_type_correlations", "pearson"),
        ("customer_graph_triangles", "clustering"),
        ("embedding_near_dup_recall", "recall"),
    ]:
        rows = qs[name](spark, micro_dir).collect()  # must not raise
        assert rows, name  # the degenerate inputs still produce rows
        assert col in rows[0].asDict(), name


def test_empty_corpus_divergers_fixed(spark, empty_dir):
    from polars_numba_spark.queries import catalog

    qs = catalog.spark_queries()
    # face -> expected Spark row count on an all-empty corpus
    expected = {
        "events_chisq_independence": 0,     # was: oracle emitted 1 NULL row
        "nation_order_rollup": 0,           # was: DuckDB ROLLUP grand total
        "nation_order_cube": 0,             # was: DuckDB CUBE grand total
        "user_value_concentration": 0,      # was: Spark ungrouped agg -> 1
        "formats_partitioned_pruning": 0,   # was: schema-inference crash
        "streaming_signup_conversion_outer": 0,  # was: None + timedelta
        "corpus_vocab_growth": 10,          # fixed 10-row spine, null betas
    }
    for name, want in expected.items():
        got = qs[name](spark, empty_dir)
        assert got.count() == want, name
        if name == "corpus_vocab_growth":
            rows = got.collect()
            assert all(r["heaps_beta"] is None for r in rows)
            assert all(r["n_tokens_cum"] == 0 for r in rows)


def test_empty_corpus_round12_dirty_gate_divergers_fixed(spark, empty_dir):
    """Round-12: the one-command dirty gate runs the FULL differential on
    the empty build (the r11 sweep used a weaker crash-vs-rows check) and
    found six more faces that crashed or diverged on zero rows — five
    ANSI divide-by-zero crashes (three recall reports, the datacard
    dup-rate, both z-test arms) and one COUNT-FILTER-vs-SUM asymmetry in
    the DQ referential-integrity rule. All must now return their one-row
    (or 7-row) report with NULLs for the undefined statistics."""
    from polars_numba_spark.queries import catalog

    qs = catalog.spark_queries()
    r = qs["embedding_pq_recall"](spark, empty_dir).collect()
    assert len(r) == 1 and r[0]["adc_recall_at_5"] is None
    assert r[0]["rerank_recall_at_5"] is None and r[0]["exact_scan_frac"] is None
    r = qs["embedding_ivf_recall"](spark, empty_dir).collect()
    assert len(r) == 1 and r[0]["recall_at_5"] is None
    r = qs["embedding_int8_recall"](spark, empty_dir).collect()
    assert len(r) == 1 and r[0]["recall_at_5"] is None
    r = qs["corpus_datacard"](spark, empty_dir).collect()
    assert len(r) == 1 and r[0]["exact_dup_rate"] is None
    assert r[0]["n_docs"] == 0
    r = qs["ab_conversion_ztest"](spark, empty_dir).collect()
    assert len(r) == 1 and r[0]["rate_a"] is None and r[0]["z_score"] is None
    rows = {x["rule"]: x for x in qs["orders_dq_expectations"](spark, empty_dir).collect()}
    assert len(rows) == 7
    # COUNT FILTER semantics: the FK rule reports 0 violations / pass on
    # an empty join, matching the oracle (SUM would yield NULL)
    assert rows["lineitem_fk_orders"]["n_violations"] == 0
    assert rows["lineitem_fk_orders"]["pass"] is True
