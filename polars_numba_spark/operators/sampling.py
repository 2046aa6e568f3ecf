"""Deterministic sampling and dataset splitting.

Training pipelines need splits that are (a) reproducible across runs and
engines, (b) stable under data growth (a document's split must not change
when other rows arrive), and (c) computable scan-side with no shuffle.
``rand()``-based sampling fails (a) and (b); the standard answer is
content-hash bucketing: ``bucket = H(key) % N`` and split by bucket range.

H here is the first 15 hex chars of md5 (60 bits) — chosen over the faster
xxhash64 because md5 is engine-portable (DuckDB, Trino, BigQuery all parse
it identically), which makes every split/sample decision oracle-checkable.
For pure-Spark hot paths where portability is irrelevant, swap in
``F.xxhash64`` — same structure, ~3× cheaper.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_BUCKETS = 10_000


def hash_bucket(col: Column | str, buckets: int = HASH_BUCKETS) -> Column:
    """Stable content-hash bucket in [0, buckets): md5 → 60-bit int → mod.

    NULL keys bucket to 0 (deterministic and identical for split_by_hash
    and sample_by_hash — without the coalesce, nulls would fall through
    when-chains to the LAST split but be DROPPED by sample filters)."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("bigint")
    return F.coalesce(h % buckets, F.lit(0))


def sql_hash_bucket(expr: str, buckets: int = HASH_BUCKETS) -> str:
    """The same bucket in DuckDB SQL (oracle fragment)."""
    return (
        f"CAST(CAST(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 15)) AS UBIGINT)"
        f" % {buckets} AS BIGINT)"
    )


def split_by_hash(
    df: DataFrame,
    key: str,
    weights: dict[str, float],
    split_name: str = "split",
) -> DataFrame:
    """Assign each row a named split by hash-bucket range.

    ``weights`` maps split name → fraction (must sum to ≤ 1; remainder goes
    to the last split). Assignment depends only on the row's own key —
    adding data never moves existing rows between splits.
    """
    total = sum(weights.values())
    if not 0 < total <= 1.0 + 1e-9:
        raise ValueError(f"split weights must sum to (0, 1], got {total}")
    bucket = hash_bucket(key)
    expr = None
    upper = 0.0
    names = list(weights.items())
    for name, w in names[:-1]:
        upper += w
        cond = bucket < int(upper * HASH_BUCKETS)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = names[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(split_name, expr)


def sample_by_hash(df: DataFrame, key: str, fraction: float) -> DataFrame:
    """Deterministic ~fraction sample: keep rows whose bucket falls below
    the threshold. Same row set every run, every engine."""
    if not 0 < fraction <= 1:
        raise ValueError("fraction must be in (0, 1]")
    return df.where(hash_bucket(key) < int(fraction * HASH_BUCKETS))


def weighted_mix_by_hash(
    df: DataFrame,
    key: str,
    group_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic weighted dataset mixing: keep ~``fractions[group]`` of
    each group's rows (e.g. down-sample web crawl to 30% while keeping 100%
    of curated sources — the corpus-mixing step in front of every training
    run). Same hash-bucket mechanism as the splits, so the decision is
    per-row-stable under data growth, reproducible across engines, and
    computable scan-side: the group→threshold map compiles to a when-chain,
    no join and no shuffle.
    """
    for g, f in fractions.items():
        if not 0 <= f <= 1:
            raise ValueError(f"fraction for {g!r} must be in [0, 1], got {f}")
    if not 0 <= default_fraction <= 1:
        raise ValueError("default_fraction must be in [0, 1]")
    bucket = hash_bucket(key)
    thresh = None
    gc = F.col(group_col)
    for g, f in fractions.items():
        cond = gc.eqNullSafe(F.lit(g))
        t = F.lit(int(f * HASH_BUCKETS))
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    thresh = (
        F.lit(int(default_fraction * HASH_BUCKETS))
        if thresh is None
        else thresh.otherwise(F.lit(int(default_fraction * HASH_BUCKETS)))
    )
    return df.where(bucket < thresh)


def stratified_cap_by_hash(
    df: DataFrame,
    group_col: str,
    n: int,
    key: str,
) -> DataFrame:
    """Deterministic per-group quota: keep at most ``n`` rows per group
    (the "domain cap" curation step — no single source may dominate the
    corpus), chosen by content-hash rank so the selection is reproducible
    across runs and engines and stable under reordering. A row can still be
    evicted when new rows hash below it — quotas are corpus-relative by
    nature, unlike the threshold filters (:func:`sample_by_hash`), which
    are per-row stable.

    Shape: one shuffle on the group (window rank over the hash order with
    the key as tie-break), filter to rank ≤ n. Group skew is bounded by the
    groups themselves (a hot group's rows land one partition — the same
    shape as any per-group top-k; pre-salting cannot apply because rank is
    global per group).
    """
    if n < 1:
        raise ValueError("n must be ≥ 1")
    w = Window.partitionBy(group_col).orderBy(hash_bucket(key, 2**31), F.col(key))
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .where(F.col("__rank") <= n)
        .drop("__rank")
    )


def es_sample_key(key: Column | str, weight: Column | str, salt: str) -> Column:
    """Efraimidis–Spirakis sampling key: ln(u)/w with u = (H(salt:key)+1)/2^60
    ∈ (0, 1], rounded to 9 decimals (the cross-engine ulp guard every
    ln-carrying oracle here uses). Taking the k LARGEST keys per group is an
    exact weighted sample without replacement — P(row drawn next) ∝ weight —
    because u^(1/w) order equals ln(u)/w order and log-form avoids the
    underflow of u^(1/w) at large weights."""
    c = F.col(key) if isinstance(key, str) else key
    w = (F.col(weight) if isinstance(weight, str) else weight).cast("double")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), c.cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    u = (h + F.lit(1)).cast("double") / F.lit(float(1 << 60))
    return F.round(F.log(u) / w, 9)


def sql_es_sample_key(key_expr: str, weight_expr: str, salt: str) -> str:
    """The identical ES key in DuckDB SQL (oracle fragment)."""
    h = (
        f"CAST(CAST(('0x' || substr(md5('{salt}:' || CAST({key_expr} AS VARCHAR)),"
        f" 1, 15)) AS UBIGINT) AS BIGINT)"
    )
    return (
        f"ROUND(LN(({h} + 1) / 1152921504606846976.0)"
        f" / CAST({weight_expr} AS DOUBLE), 9)"
    )


def weighted_sample_k(
    df: DataFrame,
    key: str,
    weight: str,
    k: int,
    group_col: str | None = None,
    salt: str = "es",
) -> DataFrame:
    """Exact-k weighted sample WITHOUT replacement per group (Efraimidis &
    Spirakis 2006, "Weighted random sampling with a reservoir"): each row
    draws key = u^(1/weight) from a deterministic content-hash uniform and
    the k largest keys per group win. Deterministic (same corpus ⇒ same
    sample, any engine with md5 — oracle-checkable), single-pass, and
    reservoir-friendly: at cluster scale the same key supports a
    per-partition bounded top-k partial (exactly the KMV two-level shape)
    so the shuffle carries ≤ k rows per partition per group.

    Rows with NULL keys or non-positive/NULL weights are excluded — the ES
    key is undefined there (a zero-weight row has draw probability 0 anyway).
    Ties after the 9-decimal round break by ``key`` for cross-engine rank
    stability.
    """
    if k < 1:
        raise ValueError("k must be ≥ 1")
    eligible = df.where(F.col(key).isNotNull() & (F.col(weight) > 0))
    parts = [group_col] if group_col else []
    w = Window.partitionBy(*parts).orderBy(
        es_sample_key(key, weight, salt).desc(), F.col(key)
    )
    return (
        eligible.withColumn("__rank", F.row_number().over(w))
        .where(F.col("__rank") <= k)
        .drop("__rank")
    )


def stratified_exact_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    frac_bp: int = 2000,
) -> DataFrame:
    """EXACT-COUNT proportional stratified sampling by the largest-
    remainder (Hamilton) method: the total sample size is exactly
    ``N·frac_bp // 10000`` and every stratum receives its proportional
    quota — the floor allocation plus one extra seat for the strata with
    the largest remainders (ties → stratum value ascending). The fraction
    is a BASIS-POINT integer, so every quota is integer arithmetic: no
    float rounding anywhere, which is what lets both engines agree on
    every seat. (Hash-threshold sampling — :func:`sample_by_hash` — only
    approximates per-stratum counts; evaluation splits and mixture
    recipes often need them exact.)

    Row selection within a stratum is content-hash rank (portable md5
    order, key as tie-break): reproducible across runs, engines and row
    order. Returns the selected rows as ``(strata, key, rank, quota)``.

    Shape: one group-size aggregate (|strata| rows, broadcast), one
    |strata|-row seat allocation (remainder rank window over the tiny
    directory), one data-sized window rank per stratum, one broadcast
    quota join. The directory math is driver-free — everything stays in
    the plan.
    """
    from polars_numba_spark.operators.dedup import md5_long

    s = F.col(strata_col)
    sizes = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n"))
    sizes = sizes.select(
        strata_col,
        "__n",
        (F.col("__n") * frac_bp).alias("__scaled"),
    ).select(
        strata_col,
        "__n",
        F.expr("__scaled DIV 10000").alias("__base"),
        (F.col("__scaled") % 10000).alias("__rem"),
    )
    tot = sizes.agg(
        F.sum("__n").alias("__N"), F.sum("__base").alias("__base_sum")
    ).select(
        F.expr(f"__N * {frac_bp} DIV 10000").alias("__T"), "__base_sum"
    )
    wrem = Window.orderBy(F.col("__rem").desc(), s)
    quotas = (
        sizes.crossJoin(F.broadcast(tot))
        .withColumn("__seat_rank", F.row_number().over(wrem))
        .select(
            strata_col,
            (
                F.col("__base")
                + F.when(
                    F.col("__seat_rank") <= F.col("__T") - F.col("__base_sum"),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).alias("quota"),
        )
    )
    wr = Window.partitionBy(strata_col).orderBy(
        md5_long(F.col(key_col).cast("string")), F.col(key_col)
    )
    return (
        df.select(strata_col, key_col)
        .withColumn("rank", F.row_number().over(wr).cast("int"))
        .join(F.broadcast(quotas), strata_col)
        .where(F.col("rank") <= F.col("quota"))
        .select(strata_col, key_col, "rank", F.col("quota").cast("long"))
    )
