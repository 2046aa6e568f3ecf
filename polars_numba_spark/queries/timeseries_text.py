"""Time-series and text-pipeline queries: rolling range windows, gap-fill
interpolation (oracled by an independent double-ASOF formulation), document
chunking, n-gram statistics, and exact moment statistics via decimal sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polars_numba_spark.operators import sampling as SAMPLING
from polars_numba_spark.operators import text as X
from polars_numba_spark.operators.chunking import chunk_documents
from polars_numba_spark.operators.packing import sql_pack_sequences
from polars_numba_spark.operators.text import tokens
from polars_numba_spark.operators.timeseries import (
    gap_fill_interpolate,
    rolling_range_agg,
)
from polars_numba_spark.queries.catalog import _t, register


@register(
    "rolling_hour_user_value",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
               PARTITION BY user_id
               ORDER BY CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS hour_cents
    FROM events
    """,
)
def rolling_hour_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour per-user value sum — a RANGE frame over epoch seconds
    (row frames are wrong for irregular event spacing)."""
    e = _t(spark, sf_dir, "events").withColumn(
        "cents", F.round(F.col("value") * 100).cast("long")
    )
    out = rolling_range_agg(
        e.select("event_id", "user_id", "ts", "cents"),
        "ts",
        3600,
        {"hour_cents": F.sum("cents")},
        partition_by="user_id",
    )
    return out.select("event_id", "user_id", "hour_cents")


@register(
    "gap_fill_user_value",
    oracle="""
    WITH obs AS (
        -- value IS NOT NULL: a null measurement is a NON-observation; it
        -- can neither anchor interpolation nor define the grid bounds.
        -- user_id IS NOT NULL: per-user series need an identified user
        -- (the ASOF equality join could never match the NULL key anyway)
        SELECT user_id, CAST(ts AS TIMESTAMP) AS t, value AS v
        FROM events WHERE event_type = 'purchase'
          AND value IS NOT NULL AND user_id IS NOT NULL
    ), bounds AS (
        SELECT user_id, MIN(t) AS t0, MAX(t) AS t1 FROM obs GROUP BY user_id
    ), grid AS (
        SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 6 HOUR)) AS g
        FROM bounds
    ), with_prev AS (
        SELECT grid.user_id, grid.g, p.t AS pt, p.v AS pv
        FROM grid ASOF LEFT JOIN obs p
          ON grid.user_id = p.user_id AND grid.g >= p.t
    ), with_both AS (
        SELECT wp.user_id, wp.g, wp.pt, wp.pv, n.t AS nt, n.v AS nv
        FROM with_prev wp ASOF LEFT JOIN obs n
          ON wp.user_id = n.user_id AND wp.g <= n.t
    )
    SELECT user_id, g AS ts,
           CASE WHEN pt = g THEN pv
                WHEN nv IS NULL THEN pv
                WHEN pv IS NULL THEN nv
                WHEN nt = pt THEN pv
                ELSE pv + (nv - pv) * ((epoch(g) - epoch(pt)) / (epoch(nt) - epoch(pt)))
           END AS value
    FROM with_both
    """,
)
def gap_fill_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill + linear interpolation of per-user purchase values onto a
    6-hour grid. Our union+window single-pass implementation vs a genuinely
    different algorithm in the oracle (two directional ASOF joins) — same
    numbers required, including the interpolation arithmetic. Contract:
    identified users, real measurements — null value rows are
    non-observations and null users have no per-user series (mirrored
    WHERE in the oracle)."""
    e = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .where(F.col("value").isNotNull() & F.col("user_id").isNotNull())
    )
    out = gap_fill_interpolate(
        e.select("user_id", "ts", "value"),
        "ts",
        "value",
        step_seconds=6 * 3600,
        partition_by="user_id",
        method="linear",
    )
    return out.select("user_id", "ts", "value")


@register(
    "doc_chunks",
    oracle="""
    WITH t AS (
        -- text IS NOT NULL: a missing doc has no chunks (DuckDB's
        -- NULL-skipping GREATEST would otherwise fabricate one)
        SELECT doc_id,
               string_split_regex(trim(lower(text)), '\\s+') AS toks
        FROM documents WHERE doc_id < 100 AND text IS NOT NULL
    ), s AS (
        SELECT doc_id, toks,
               greatest(CAST(ceil((len(toks) - 16) / 48.0) AS BIGINT), 1) AS ns
        FROM t
    ), e AS (
        SELECT doc_id, toks, unnest(range(ns)) AS ci FROM s
    )
    SELECT doc_id,
           CAST(ci AS INTEGER) AS chunk_idx,
           CAST(len(toks[ci*48+1 : least(ci*48+64, len(toks))]) AS INTEGER) AS n_chunk_tokens,
           array_to_string(toks[ci*48+1 : least(ci*48+64, len(toks))], ' ') AS chunk_text
    FROM e
    """,
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (64-token windows, 16 overlap) —
    the context-window prep step, pure codegen, provenance kept."""
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    return chunk_documents(d, chunk_tokens=64, overlap=16)


@register(
    "top_bigrams",
    oracle="""
    WITH t AS (
        SELECT string_split_regex(trim(lower(text)), '\\s+') AS toks
        FROM documents
    ), b AS (
        SELECT unnest(list_transform(range(1, len(toks)),
                                     i -> toks[i] || ' ' || toks[i+1])) AS bigram
        FROM t
    )
    SELECT bigram, COUNT(*) AS n
    FROM b GROUP BY bigram
    ORDER BY n DESC, bigram LIMIT 20
    """,
)
def top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram frequencies (n-gram surface): zip adjacent tokens,
    explode, count, deterministic top-20."""
    d = _t(spark, sf_dir, "documents")
    toks = tokens("text")
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(20)
    )


@register(
    "lineitem_price_moments",
    oracle="""
    WITH s AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS s1,
               CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS s2
        FROM lineitem
    )
    SELECT n, s1 / n AS mean_price,
           (s2 - s1 * s1 / n) / (n - 1) AS var_price
    FROM s
    """,
)
def lineitem_price_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact moment statistics: mean and sample variance derived from
    decimal-exact Σx and Σx² — bit-identical across engines, unlike native
    var_samp whose float accumulation order differs."""
    l = _t(spark, sf_dir, "lineitem")  # noqa: E741
    s = l.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)").alias("s1"),
        F.expr(
            "CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)"
        ).alias("s2"),
    )
    return s.select(
        "n",
        (F.col("s1") / F.col("n")).alias("mean_price"),
        ((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)).alias(
            "var_price"
        ),
    )


@register(
    "doc_train_valid_test_split",
    oracle=f"""
    WITH b AS (
        SELECT doc_id, {SAMPLING.sql_hash_bucket('doc_id')} AS bucket
        FROM documents
    )
    SELECT CASE WHEN bucket < 8000 THEN 'train'
                WHEN bucket < 9000 THEN 'valid'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
    FROM b GROUP BY 1
    """,
)
def doc_train_valid_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/valid/test split by content-hash bucket
    — reproducible across engines (oracle computes the identical md5
    bucket), stable under data growth, zero shuffle for the assignment."""
    from polars_numba_spark.operators.sampling import split_by_hash

    d = _t(spark, sf_dir, "documents")
    out = split_by_hash(d, "doc_id", {"train": 0.8, "valid": 0.1, "test": 0.1})
    return out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


@register(
    "doc_weighted_mix",
    oracle=f"""
    WITH b AS (
        SELECT doc_id, source, {SAMPLING.sql_hash_bucket('doc_id')} AS bucket
        FROM documents
    ), kept AS (
        SELECT doc_id, source FROM b
        WHERE bucket < CASE source
                           WHEN 'src0' THEN 10000
                           WHEN 'src1' THEN 5000
                           WHEN 'src2' THEN 2500
                           ELSE 1000 END
    )
    SELECT source, COUNT(*) AS n_docs, MIN(doc_id) AS min_id,
           MAX(doc_id) AS max_id
    FROM kept GROUP BY source
    """,
)
def doc_weighted_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus mixing: keep 100% of src0, 50% of src1, 25% of src2
    and 10% of everything else by content-hash threshold — the
    sampling-ratio step in front of a training run, decided scan-side per
    row (no join, no shuffle, stable under data growth). Oracle replays the
    identical md5 buckets and thresholds."""
    d = _t(spark, sf_dir, "documents")
    kept = SAMPLING.weighted_mix_by_hash(
        d,
        "doc_id",
        "source",
        {"src0": 1.0, "src1": 0.5, "src2": 0.25},
        default_fraction=0.1,
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


@register(
    "doc_stratified_sample",
    oracle="""
    WITH sizes AS (
        SELECT source, COUNT(*) AS n,
               (COUNT(*) * 2000) // 10000 AS base,
               (COUNT(*) * 2000) % 10000 AS rem
        FROM documents GROUP BY source
    ), tot AS (
        SELECT (SUM(n) * 2000) // 10000 AS t, SUM(base) AS base_sum
        FROM sizes
    ), seats AS (
        SELECT source,
               base + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, source)
                                <= t.t - t.base_sum
                           THEN 1 ELSE 0 END AS quota
        FROM sizes CROSS JOIN tot t
    ), ranked AS (
        SELECT source, doc_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY CAST(CAST(('0x' || substr(
                       md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT)
                       AS BIGINT), doc_id
               ) AS INTEGER) AS rank
        FROM documents
    )
    SELECT r.source, r.doc_id, r.rank, CAST(s.quota AS BIGINT) AS quota
    FROM ranked r JOIN seats s USING (source)
    WHERE r.rank <= s.quota
    """,
)
def doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-COUNT proportional stratified sample (largest-remainder /
    Hamilton allocation) — a 20% corpus sample whose TOTAL size is
    exactly N·0.2 rounded down and whose per-source quotas are
    proportional to the floor plus largest-remainder seats: the
    allocation evaluation splits and mixture recipes need, where
    hash-threshold sampling only lands near the fraction in expectation.
    The fraction is the basis-point integer 2000, so every quota is pure
    integer arithmetic; row selection is portable-md5 rank within each
    stratum — membership, not just counts, is hash-proven. See
    operators/sampling.py::stratified_exact_sample for the plan shape
    (the |strata|-row seat window runs over the broadcast directory, not
    the data)."""
    d = _t(spark, sf_dir, "documents")
    return SAMPLING.stratified_exact_sample(d, "source", "doc_id", frac_bp=2000)


@register(
    "doc_source_caps",
    oracle=f"""
    WITH ranked AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY {SAMPLING.sql_hash_bucket('doc_id', 2**31)}, doc_id
               ) AS rnk
        FROM documents
    ), kept AS (
        SELECT doc_id, source FROM ranked WHERE rnk <= 10
    )
    SELECT source, COUNT(*) AS n_docs, MIN(doc_id) AS min_id,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM kept GROUP BY source
    """,
)
def doc_source_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota (the domain-cap curation step): keep at most 10
    documents per source, selected by content-hash rank — deterministic
    across runs and engines, which the oracle proves by reproducing the
    exact kept set (id_sum pins membership, not just counts) from the same
    md5 ranking in DuckDB."""
    d = _t(spark, sf_dir, "documents")
    kept = SAMPLING.stratified_cap_by_hash(d, "source", 10, "doc_id")
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_id"),
        F.sum("doc_id").alias("id_sum"),
    )


@register(
    "doc_weighted_sample",
    oracle=f"""
    WITH keyed AS (
        SELECT source, doc_id, n_chars,
               {SAMPLING.sql_es_sample_key('doc_id', 'n_chars', 'mix1')} AS es_key
        FROM documents
        WHERE doc_id IS NOT NULL AND n_chars > 0
    ), ranked AS (
        SELECT source, doc_id, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY source ORDER BY es_key DESC, doc_id
               ) AS rn
        FROM keyed
    )
    SELECT source, doc_id, n_chars FROM ranked WHERE rn <= 5
    """,
)
def doc_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k weighted sample without replacement per source (Efraimidis–
    Spirakis): 5 documents per source drawn with probability ∝ n_chars —
    the length-weighted curriculum-sampling step — from a deterministic
    content-hash uniform, so the SAMPLE ITSELF is cross-engine
    reproducible: the oracle re-draws it in DuckDB from the same md5-based
    ES keys and the hash compares exact membership row by row."""
    d = _t(spark, sf_dir, "documents")
    kept = SAMPLING.weighted_sample_k(
        d, "doc_id", "n_chars", k=5, group_col="source", salt="mix1"
    )
    return kept.select("source", "doc_id", "n_chars")


@register(
    "doc_leakage_safe_split",
    oracle=f"""
    WITH g AS (
        SELECT doc_id, md5(text) AS digest,
               MIN(doc_id) OVER (PARTITION BY md5(text)) AS gkey
        FROM documents
    ), b AS (
        SELECT doc_id, digest, {SAMPLING.sql_hash_bucket('gkey')} AS bucket
        FROM g
    )
    SELECT CASE WHEN bucket < 8000 THEN 'train'
                WHEN bucket < 9000 THEN 'valid'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT digest) AS n_groups,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM b GROUP BY 1
    """,
)
def doc_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/valid/test split: a document's split is decided
    by its EXACT-DUP GROUP (min doc_id over the content digest), not its
    own id, so duplicated text can never straddle train and test — the
    contamination a per-row split silently allows. One window shuffle on
    the digest; membership pinned cross-engine by id_sum per split."""
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents").withColumn("digest", F.md5("text"))
    d = d.withColumn(
        "gkey", F.min("doc_id").over(Window.partitionBy("digest"))
    )
    out = SAMPLING.split_by_hash(
        d, "gkey", {"train": 0.8, "valid": 0.1, "test": 0.1}
    )
    return out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("digest").alias("n_groups"),
        F.sum("doc_id").alias("id_sum"),
    )


@register(
    "doc_token_budget",
    oracle=f"""
    WITH scored AS (
        SELECT source, doc_id, (n_chars + 3) // 4 AS n_tokens,
               ROUND({X.sql_quality('text')}, 9) AS q
        FROM documents
    ), c AS (
        SELECT source, doc_id, n_tokens, q,
               SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY q DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum_tokens
        FROM scored
    )
    SELECT source, doc_id, q, CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM c WHERE cum_tokens <= 1500
    """,
)
def doc_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus selection: per source, take documents in
    descending quality order until a 1500-token budget is spent (strict
    prefix rule — the first overflowing doc and everything after it is
    dropped, so the kept set is a deterministic function of the corpus).
    Quality rounds to 9 decimals BEFORE ranking (round-before-rank) and
    ties break by doc_id, so the kept membership — returned row by row —
    reproduces exactly in DuckDB. One window shuffle per source."""
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.expr("(n_chars + 3) div 4").alias("n_tokens"),
        F.round(X.quality_score("text"), 9).alias("q"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("q"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .where(F.col("cum_tokens") <= 1500)
        .select("source", "doc_id", "q", "cum_tokens")
    )


_PROFILE_COL = """
    SELECT '{name}' AS column, '{dtype}' AS dtype,
           COUNT(*) AS n_rows,
           COUNT(*) - COUNT({name}) AS n_nulls,
           COUNT(DISTINCT {name}) AS n_distinct,
           CAST(MIN({summary}) AS DOUBLE) AS min_d,
           CAST(MAX({summary}) AS DOUBLE) AS max_d
    FROM events
"""


@register(
    "events_profile",
    oracle=" UNION ALL ".join(
        _PROFILE_COL.format(name=n, dtype=d, summary=s)
        for n, d, s in [
            ("event_id", "bigint", "event_id"),
            ("ts", "timestamp", "epoch_us(ts)"),
            ("user_id", "bigint", "user_id"),
            ("event_type", "string", "length(event_type)"),
            ("value", "double", "value"),
            ("props", "string", "length(props)"),
        ]
    ),
)
def events_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profile of the events table: null counts, exact
    distinct counts and orderable ranges (values for numerics, epoch
    micros for timestamps, lengths for strings) for every column in a
    single aggregate job — the before-you-query table summary that at
    100 TB must cost exactly one scan. The oracle recomputes each
    column's row independently in DuckDB."""
    from polars_numba_spark.operators.profile import profile_table

    return profile_table(_t(spark, sf_dir, "events"))


@register(
    "split_contamination_audit",
    oracle=f"""
    WITH g AS (
        SELECT doc_id, text,
               MIN(doc_id) OVER (PARTITION BY md5(text)) AS gkey
        FROM documents
    ), assigned AS (
        SELECT doc_id, text, 'naive' AS policy,
               CASE WHEN {SAMPLING.sql_hash_bucket('doc_id')} < 9000
                    THEN 'train' ELSE 'test' END AS split
        FROM g
        UNION ALL
        SELECT doc_id, text, 'group_safe' AS policy,
               CASE WHEN {SAMPLING.sql_hash_bucket('gkey')} < 9000
                    THEN 'train' ELSE 'test' END AS split
        FROM g
    ), sh AS (
        SELECT DISTINCT policy, split,
               CAST(CAST(('0x' || substr(md5(s0), 1, 15)) AS UBIGINT) AS BIGINT) AS s
        FROM (
            SELECT policy, split, UNNEST({X.sql_token_shingles('text')}) AS s0
            FROM assigned
        )
    )
    SELECT a.policy, COUNT(DISTINCT a.s) AS shared_shingles
    FROM sh a JOIN sh b
      ON a.policy = b.policy AND a.s = b.s
     AND a.split = 'train' AND b.split = 'test'
    GROUP BY a.policy
    """,
)
def split_contamination_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→test contamination, MEASURED, under two split policies: the
    naive per-document hash split and the leakage-safe per-exact-dup-group
    split (`doc_leakage_safe_split`). Counts distinct 8-token shingles
    present in BOTH train and test — the overlap an eval-set
    decontamination pass would have to remove. The group-safe policy's
    number is strictly lower (exact dups can no longer straddle); both
    numbers reproduce in DuckDB from the same md5 buckets and shingles.
    Shape (r14): BOTH policies' splits are pure per-document functions
    (hash of doc_id / of the dup-group key), so they ride the explode as
    two narrow columns instead of joining a 2-rows-per-doc policy map
    back onto the exploded shingle mass — the r13 form's join shuffled
    every (doc, shingle) row by doc_id AND doubled it (one copy per
    policy) before the flag aggregation. Now: ONE shingle explode → ONE
    per-shingle aggregation (map-side combined) carrying four membership
    flags → unpivot to (policy, tr, te) at DISTINCT-shingle granularity
    (orders of magnitude below occurrence granularity) → filter
    both-present → count. No join at all touches the shingle mass."""
    from pyspark.sql import Window

    base = _t(spark, sf_dir, "documents")
    # Explicit repartition ON the window key: the window's own exchange
    # would be AQE-coalesced by BYTES (~0.6 MB of docs → 1 partition),
    # serializing the entire downstream explode+hash chain onto one core
    # (the _joined_pair_sets lesson). An explicit keyed repartition is
    # exempt from coalescing and the window reuses its partitioning —
    # same exchange count, full-width compute.
    d = base.repartition(
        spark.sparkContext.defaultParallelism, F.md5("text")
    ).withColumn("gkey", F.min("doc_id").over(Window.partitionBy(F.md5("text"))))
    split_of = lambda key: F.when(  # noqa: E731
        SAMPLING.hash_bucket(key) < 9000, F.lit("train")
    ).otherwise(F.lit("test"))
    from polars_numba_spark.operators.dedup import md5_long

    # Shingles shuffle as 60-bit md5 longs, not ~50-byte strings (~6×
    # less shuffle volume); the hash is the SAME portable md5 the oracle
    # applies, so the count is identical in both engines. Collisions at
    # ~1M distinct shingles: p ≈ 4e-7 — and identical cross-engine anyway.
    sh_doc = d.select(
        split_of("doc_id").alias("naive_split"),
        split_of("gkey").alias("safe_split"),
        F.explode(X.token_shingles("text")).alias("s0"),
    ).select("naive_split", "safe_split", md5_long(F.col("s0")).alias("s"))

    def flag(col: str, split: str):
        return F.max(F.when(F.col(col) == split, 1).otherwise(0))

    per_sh = sh_doc.groupBy("s").agg(
        flag("naive_split", "train").alias("tr_naive"),
        flag("naive_split", "test").alias("te_naive"),
        flag("safe_split", "train").alias("tr_safe"),
        flag("safe_split", "test").alias("te_safe"),
    )
    flags = per_sh.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("naive").alias("policy"),
                    F.col("tr_naive").alias("tr"),
                    F.col("te_naive").alias("te"),
                ),
                F.struct(
                    F.lit("group_safe").alias("policy"),
                    F.col("tr_safe").alias("tr"),
                    F.col("te_safe").alias("te"),
                ),
            )
        ).alias("p")
    ).select("p.*")
    return (
        flags.where((F.col("tr") == 1) & (F.col("te") == 1))
        .groupBy("policy")
        .agg(F.count(F.lit(1)).alias("shared_shingles"))
    )


@register(
    "order_price_outliers",
    oracle="""
    WITH med AS (
        SELECT o_orderpriority, quantile_cont(o_totalprice, 0.5) AS med
        FROM orders GROUP BY o_orderpriority
    ), mad AS (
        SELECT o.o_orderpriority,
               quantile_cont(ABS(o.o_totalprice - m.med), 0.5) AS mad
        FROM orders o JOIN med m USING (o_orderpriority)
        GROUP BY o.o_orderpriority
    )
    SELECT o.o_orderpriority,
           COUNT(*) AS n_orders,
           COUNT(*) FILTER (
               WHERE ABS(o.o_totalprice - m.med) > 4.4478 * d.mad
           ) AS n_outliers,
           m.med AS med, d.mad AS mad
    FROM orders o
    JOIN med m USING (o_orderpriority)
    JOIN mad d ON d.o_orderpriority = o.o_orderpriority
    GROUP BY o.o_orderpriority, m.med, d.mad
    """,
)
def order_price_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) outlier counts per order priority: the
    data-cleaning filter that survives wild values, via two exact grouped
    percentiles broadcast back onto the scan (operators/profile.py::
    robust_outliers — the data itself never shuffles). percentile ≡
    quantile_cont bit-for-bit and the 3-MAD threshold is one shared
    double literal, so counts, medians and MADs all hash-match."""
    from polars_numba_spark.operators.profile import robust_outliers

    o = _t(spark, sf_dir, "orders")
    flagged = robust_outliers(o, "o_totalprice", by="o_orderpriority", n_mads=3.0)
    return flagged.groupBy("o_orderpriority", "med", "mad").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("is_outlier").cast("long")).alias("n_outliers"),
    ).select("o_orderpriority", "n_orders", "n_outliers", "med", "mad")


PACKING_SQL = sql_pack_sequences(
    "documents", "doc_id", "(n_chars + 3) // 4", 2048, 8
)


@register(
    "doc_sequence_packing",
    oracle=f"""
    SELECT shard, seq_index,
           COUNT(*) AS n_docs,
           CAST(SUM(id) AS BIGINT) AS id_sum,
           CAST(SUM(size) AS BIGINT) AS tokens_started,
           CAST(MAX(offset_in_seq) AS BIGINT) AS last_offset
    FROM ({PACKING_SQL})
    GROUP BY shard, seq_index
    """,
)
def doc_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing (the GPT-pretraining layout):
    documents hash-sharded, deterministically ordered, cumulatively summed
    and cut into 2048-token sequences — per-sequence stats (doc membership
    pinned by id_sum, offsets by last_offset) reproduce bit-for-bit in
    DuckDB because the assignment is pure integer arithmetic. Token counts
    use the chars/4 proxy; the operator takes any size column (e.g. real
    BPE counts) unchanged."""
    from polars_numba_spark.operators.packing import pack_sequences

    d = _t(spark, sf_dir, "documents").withColumn(
        "n_tokens", F.expr("(n_chars + 3) div 4")
    )
    packed = pack_sequences(d, "doc_id", "n_tokens", capacity=2048, n_shards=8)
    return packed.groupBy("shard", "seq_index").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("id_sum"),
        F.sum("n_tokens").alias("tokens_started"),
        F.max("offset_in_seq").alias("last_offset"),
    )


@register(
    "order_price_changes",
    oracle="""
    SELECT o_custkey, o_orderkey,
           o_totalprice - lag(o_totalprice) OVER w AS price_change,
           lead(o_totalprice) OVER w AS next_price,
           CAST(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS price_quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def order_price_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window functions (lag/lead/ntile): per-customer order price
    deltas and global price quartiles with deterministic tie-breaks."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wq = Window.orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        (F.col("o_totalprice") - F.lag("o_totalprice").over(w)).alias("price_change"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.ntile(4).over(wq).alias("price_quartile"),
    )


@register(
    "training_data_pipeline",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, text,
               {SAMPLING.sql_hash_bucket('doc_id')} AS bucket,
               {X.SQL_FINGERPRINT.format(c='text')} AS fp,
               {X.sql_quality('text')} AS quality
        FROM documents
    ), curated AS (
        SELECT doc_id, text, bucket FROM (
            SELECT doc_id, text, bucket,
                   ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
            FROM scored WHERE quality >= 0.5
        ) WHERE rn = 1
    ), chunked AS (
        SELECT doc_id, bucket,
               unnest(range(greatest(CAST(ceil((length(string_split_regex(trim(lower(text)), '\\s+')) - 16) / 48.0) AS BIGINT), 1))) AS ci
        FROM curated
    )
    SELECT CASE WHEN bucket < 8000 THEN 'train'
                WHEN bucket < 9000 THEN 'valid'
                ELSE 'test' END AS split,
           COUNT(DISTINCT doc_id) AS n_docs,
           COUNT(*) AS n_chunks
    FROM chunked GROUP BY 1
    """,
)
def training_data_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation pipeline in ONE Catalyst plan: quality scoring →
    fingerprint dedup → deterministic train/valid/test split → overlapping
    chunking → per-split corpus stats. Five oracled operators composed; the
    oracle recomputes the entire pipeline independently in DuckDB."""
    from pyspark.sql import Window

    from polars_numba_spark.operators.chunking import chunk_documents
    from polars_numba_spark.operators.sampling import split_by_hash
    from polars_numba_spark.operators.text import fingerprint, quality_score

    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "text",
        fingerprint("text").alias("fp"),
        quality_score("text").alias("quality"),
    ).where(F.col("quality") >= 0.5)
    w = Window.partitionBy("fp").orderBy("doc_id")
    curated = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "text")
    )
    chunks = chunk_documents(curated, chunk_tokens=64, overlap=16)
    # split is a pure function of doc_id — assign on the chunk output
    # instead of joining back (which would re-evaluate the whole curation
    # lineage a second time)
    chunks = split_by_hash(chunks, "doc_id", {"train": 0.8, "valid": 0.1, "test": 0.1})
    return chunks.groupBy("split").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_chunks"),
    )
