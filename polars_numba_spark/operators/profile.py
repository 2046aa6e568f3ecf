"""One-pass column profiling: the stats a 100 TB table is worth knowing
before any query touches it (null fractions, cardinalities, ranges).

The whole profile is ONE aggregate job — every column's statistics are
computed in the same map-side-combining pass over the scan, then the
single result row is exploded into one row per column. No per-column
scans, no shuffle beyond the one-row final combine; at cluster scale the
cost is exactly one read of the table.

Per column: row/null counts, distinct count, and an orderable summary
(``min_d``/``max_d`` as doubles): numeric columns report their value
range, timestamps their epoch-microsecond range (exact in a double up to
~year 2255), strings their LENGTH range (string value min/max would hang
cross-engine comparison on collation; length is collation-free). The
distinct count is exact by default — the deterministic, oracle-checkable
choice — with ``distinct='approx'`` switching to HLL
(``approx_count_distinct``) for the cluster-scale profile where exact
per-column distincts would shuffle every value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _summary_cols(field: T.StructField) -> tuple:
    c = F.col(field.name)
    dt = field.dataType
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        v = F.unix_micros(c).cast("double")
    elif isinstance(dt, T.NumericType):
        v = c.cast("double")
    elif isinstance(dt, T.StringType):
        v = F.length(c).cast("double")
    else:  # arrays/maps/structs/binary: no orderable scalar summary
        v = F.lit(None).cast("double")
    return F.min(v), F.max(v)


def profile_table(df: DataFrame, distinct: str = "exact") -> DataFrame:
    """Profile every column of ``df`` in one aggregate pass. Returns one
    row per column: ``column, dtype, n_rows, n_nulls, n_distinct, min_d,
    max_d`` (see module docstring for the summary encoding)."""
    if distinct not in ("exact", "approx"):
        raise ValueError("distinct must be 'exact' or 'approx'")
    ndv = F.countDistinct if distinct == "exact" else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for f in df.schema.fields:
        mn, mx = _summary_cols(f)
        aggs.append(
            F.struct(
                F.count(F.when(F.col(f.name).isNull(), 1)).alias("n_nulls"),
                ndv(f.name).alias("n_distinct"),
                mn.alias("min_d"),
                mx.alias("max_d"),
            ).alias(f"__p_{f.name}")
        )
    row = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(f.name).alias("column"),
                F.lit(f.dataType.simpleString()).alias("dtype"),
                F.col(f"__p_{f.name}.n_nulls").alias("n_nulls"),
                F.col(f"__p_{f.name}.n_distinct").alias("n_distinct"),
                F.col(f"__p_{f.name}.min_d").alias("min_d"),
                F.col(f"__p_{f.name}.max_d").alias("max_d"),
            )
            for f in df.schema.fields
        ]
    )
    return (
        row.select(F.col("__n").alias("n_rows"), F.explode(per_col).alias("p"))
        .select(
            "p.column",
            "p.dtype",
            "n_rows",
            "p.n_nulls",
            "p.n_distinct",
            "p.min_d",
            "p.max_d",
        )
    )


def robust_outliers(
    df: DataFrame,
    value_col: str,
    by: str | None = None,
    n_mads: float = 3.0,
) -> DataFrame:
    """Median/MAD outlier flagging — the robust alternative to mean/stddev
    z-scores (one wild value shifts a mean; it cannot shift a median).
    Flags rows where ``|x - median| > n_mads * 1.4826 * MAD`` (1.4826 =
    the normal-consistency constant), optionally per group.

    Two grouped EXACT-percentile aggregations (median, then MAD of the
    residuals) broadcast back onto the scan — group counts are small by
    definition, so both joins are broadcasts and the data itself is never
    shuffled. Exact percentile over a group does collect that group's
    values into one aggregation buffer; at extreme per-group cardinality
    swap in approx_percentile with the same plan shape (the flag then
    inherits the sketch's rank error). Returns the input plus ``med``,
    ``mad``, ``is_outlier``."""
    keys = [by] if by else []
    g = lambda frame: frame.groupBy(*keys) if keys else frame.groupBy()  # noqa: E731
    med = g(df).agg(F.expr(f"percentile({value_col}, 0.5)").alias("med"))
    with_med = df.join(F.broadcast(med), on=keys) if keys else df.crossJoin(
        F.broadcast(med)
    )
    mad = g(
        with_med.withColumn("__resid", F.abs(F.col(value_col) - F.col("med")))
    ).agg(F.expr("percentile(__resid, 0.5)").alias("mad"))
    out = (
        with_med.join(F.broadcast(mad), on=keys)
        if keys
        else with_med.crossJoin(F.broadcast(mad))
    )
    thresh = float(n_mads) * 1.4826
    return out.withColumn(
        "is_outlier",
        F.abs(F.col(value_col) - F.col("med")) > F.lit(thresh) * F.col("mad"),
    )


def ks_drift(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Per-group two-sample Kolmogorov–Smirnov drift statistic against the
    whole corpus: ``(group, n_docs, ks_stat)`` where ``ks_stat =
    max_x |CDF_group(x) - CDF_corpus(x)|`` — the distribution-shift audit a
    curation pipeline runs per source/shard/snapshot ("did this source's
    length/quality profile drift from the corpus?").

    Engine-portable by construction: both CDFs are ratios of integer
    counts (rank arithmetic — no order-sensitive float accumulation), the
    sup runs over the value grid where step functions change, and the
    result rounds to 9. Shape: one (group, value) count aggregate, a
    small value-grid × group frame (distinct stat values × groups — a
    profiling stat has bounded distinct values at any corpus size), two
    stacked window cumsums keyed by group, one max aggregate. NULL values
    are excluded from both CDFs.
    """
    from pyspark.sql import Window

    v = df.where(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("g"), F.col(value_col).alias("x")
    )
    per_gv = v.groupBy("g", "x").agg(F.count(F.lit(1)).alias("c"))
    per_v = v.groupBy("x").agg(F.count(F.lit(1)).alias("call"))
    totals = v.groupBy("g").agg(F.count(F.lit(1)).alias("n_g"))
    n_all = v.agg(F.count(F.lit(1)).alias("n_all"))

    # full grid: every group × every distinct value (step-change points)
    grid = per_v.select("x").crossJoin(totals.select("g"))
    joined = (
        grid.join(per_gv, ["g", "x"], "left")
        .join(per_v, "x")
        .select(
            "g",
            "x",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
            "call",
        )
    )
    wg = Window.partitionBy("g").orderBy("x").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = joined.select(
        "g",
        "x",
        F.sum("c").over(wg).alias("cum_g"),
        F.sum("call").over(wg).alias("cum_all"),
    )
    diff = (
        cum.join(F.broadcast(totals), "g")
        .crossJoin(F.broadcast(n_all))
        .select(
            "g",
            F.col("n_g"),
            F.abs(
                F.col("cum_g").cast("double") / F.col("n_g").cast("double")
                - F.col("cum_all").cast("double") / F.col("n_all").cast("double")
            ).alias("d"),
        )
    )
    return diff.groupBy("g").agg(
        F.max("n_g").cast("long").alias("n_docs"),
        F.round(F.max("d"), 9).alias("ks_stat"),
    ).select(F.col("g").alias(group_col), "n_docs", "ks_stat")


def global_ranks(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    n_partitions: int = 32,
) -> DataFrame:
    """Dense global 1-based row ranks WITHOUT a single-reducer total sort —
    the distributed-sort-rank pattern: range-partition on the order
    columns (boundaries from Spark's reservoir sample), rank locally
    within each range, then add broadcast cumulative partition offsets.
    Every stage is partition-parallel; the only single-reducer object is
    the P-row offset table. A plain ``row_number() OVER (ORDER BY ...)``
    funnels the whole input through one task — the exact trap the r8 soak
    caught in the calibration face's global ntile.

    Ranks follow ``order_cols`` ascending. Include a unique tiebreaker
    column for fully deterministic ranks; without one, ranks within ties
    are assignment-arbitrary but any RANK-SUM over tie blocks (Lorenz /
    Gini arithmetic) is invariant, because a tie block always occupies
    the same set of consecutive positions."""
    from pyspark.sql import Window

    ranged = df.repartitionByRange(n_partitions, *order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("__pid").orderBy(*order_cols)
    local = ranged.withColumn("__lr", F.row_number().over(w_local))
    offsets = (
        local.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__c"))
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__c").over(
                    Window.orderBy("__pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0).cast("long"),
            ),
        )
        .select("__pid", "__off")
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(rank_col, (F.col("__off") + F.col("__lr")).cast("long"))
        .drop("__pid", "__lr", "__off")
    )


def wasserstein_drift(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Per-group 1-Wasserstein (earth-mover) distance against the whole
    corpus: ``(group, n_docs, w1)`` where ``W1 = ∫|CDF_group −
    CDF_corpus| dx`` over the value grid — the "HOW FAR did it drift"
    companion to :func:`ks_drift`'s "did it drift" sup statistic (KS is
    blind to how far displaced mass traveled; W1 is the shift magnitude
    in value units, the number a re-balancing decision actually needs).

    Same engine-portable construction as ks_drift: integer-count CDF
    ratios on the step grid, each segment's |ΔCDF|·Δx computed in one
    mirrored double expression, rounded to 9 decimals and accumulated as
    DECIMAL(28,9) — exact addition, aggregation-order-proof. Same scale
    shape too: one (group, value) count aggregate, a bounded value-grid ×
    group frame, windowed cumsums keyed by group, one keyed sum."""
    from pyspark.sql import Window

    v = df.where(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("g"), F.col(value_col).alias("x")
    )
    per_gv = v.groupBy("g", "x").agg(F.count(F.lit(1)).alias("c"))
    per_v = v.groupBy("x").agg(F.count(F.lit(1)).alias("call"))
    totals = v.groupBy("g").agg(F.count(F.lit(1)).alias("n_g"))
    n_all = v.agg(F.count(F.lit(1)).alias("n_all"))

    grid = per_v.select("x").crossJoin(totals.select("g"))
    joined = (
        grid.join(per_gv, ["g", "x"], "left")
        .join(per_v, "x")
        .select(
            "g",
            "x",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
            "call",
        )
    )
    wg = Window.partitionBy("g").orderBy("x").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wnext = Window.partitionBy("g").orderBy("x")
    cum = joined.select(
        "g",
        "x",
        F.sum("c").over(wg).alias("cum_g"),
        F.sum("call").over(wg).alias("cum_all"),
        F.lead("x").over(wnext).alias("x_next"),
    )
    seg = (
        cum.where(F.col("x_next").isNotNull())
        .join(F.broadcast(totals), "g")
        .crossJoin(F.broadcast(n_all))
        .select(
            "g",
            "n_g",
            F.round(
                F.abs(
                    F.col("cum_g").cast("double") / F.col("n_g").cast("double")
                    - F.col("cum_all").cast("double")
                    / F.col("n_all").cast("double")
                )
                * (F.col("x_next").cast("double") - F.col("x").cast("double")),
                9,
            )
            .cast("decimal(28,9)")
            .alias("seg"),
        )
    )
    return seg.groupBy("g").agg(
        F.max("n_g").cast("long").alias("n_docs"),
        F.sum("seg").cast("decimal(38,9)").cast("double").alias("w1"),
    ).select(F.col("g").alias(group_col), "n_docs", "w1")
