"""Time-series operators: rolling range windows, resampling, gap-fill with
interpolation.

All declarative — range-frame windows and sequence/explode generation — so
they parallelize by partition key and stay in whole-stage codegen. The
reference has none of these (Polars does; its fold/scan can emulate some),
but an analytics engine over event streams needs them as first-class ops.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from polars_numba_spark.operators._prep import as_list


def rolling_range_agg(
    df: DataFrame,
    time_col: str,
    window_seconds: int,
    aggs: dict[str, Column],
    partition_by: str | Sequence[str] = (),
) -> DataFrame:
    """Trailing time-range window (e.g. "sum over the last hour" per row):
    ``RANGE BETWEEN window_seconds PRECEDING AND CURRENT ROW`` over the
    epoch-seconds ordering. Unlike row frames, range frames handle irregular
    event spacing correctly."""
    keys = as_list(partition_by)
    w = (
        (Window.partitionBy(*keys) if keys else Window.partitionBy())
        .orderBy(F.unix_timestamp(F.col(time_col)))
        .rangeBetween(-window_seconds, 0)
    )
    out = df
    for name, expr in aggs.items():
        out = out.withColumn(name, expr.over(w))
    return out


def resample_grid(
    df: DataFrame,
    time_col: str,
    step_seconds: int,
    partition_by: str | Sequence[str] = (),
) -> DataFrame:
    """Dense per-key time grid spanning each key's [min, max] at a fixed
    step — the skeleton for gap-fill. Generated with sequence+explode (no
    Python), one aggregate + one explode per key."""
    keys = as_list(partition_by)
    bounds = df.groupBy(*keys).agg(
        F.min(time_col).alias("__t0"), F.max(time_col).alias("__t1")
    )
    return bounds.select(
        *keys,
        F.explode(
            F.sequence(
                F.col("__t0"),
                F.col("__t1"),
                F.expr(f"INTERVAL {step_seconds} SECOND"),
            )
        ).alias(time_col),
    )


def gap_fill_interpolate(
    df: DataFrame,
    time_col: str,
    value_col: str,
    step_seconds: int,
    partition_by: str | Sequence[str] = (),
    method: str = "linear",
) -> DataFrame:
    """Resample onto a fixed grid and fill missing points from neighbors:
    ``method='ffill'`` carries the previous observation; ``'linear'``
    interpolates between the surrounding observations by time fraction.

    Implementation is the union+window idiom (same family as the as-of
    join): observations and grid points are unioned, previous/next
    observation values+times are propagated with last/first over
    directional frames, then the fill is a pure expression. One shuffle per
    direction; no Python."""
    keys = as_list(partition_by)
    obs = df.select(
        *keys,
        F.col(time_col).alias("__t"),
        F.col(value_col).alias("__v"),
        F.lit(1).alias("__is_obs"),
    )
    grid = resample_grid(df, time_col, step_seconds, keys).select(
        *keys,
        F.col(time_col).alias("__t"),
        F.lit(None).cast(df.schema[value_col].dataType).alias("__v"),
        F.lit(0).alias("__is_obs"),
    )
    unioned = obs.unionByName(grid)
    base = Window.partitionBy(*keys).orderBy("__t", F.col("__is_obs").desc())
    w_prev = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_next = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    # NTZ-safe epoch seconds: TIMESTAMP_NTZ cannot cast to DOUBLE directly;
    # routing through TIMESTAMP is wall-clock-shift-invariant here because
    # ts only ever appears in differences (interpolation fractions)
    ts = F.col("__t").cast("timestamp").cast("double")
    # time and value are carried as ONE struct from observations whose value
    # is non-null — a null-valued observation must contribute neither its
    # value nor its timestamp, or the interpolation fraction desynchronizes
    obs_pair = F.when(
        (F.col("__is_obs") == 1) & F.col("__v").isNotNull(),
        F.struct(ts.alias("t"), F.col("__v").alias("v")),
    )
    prev = F.last(obs_pair, ignorenulls=True).over(w_prev)
    nxt = F.first(obs_pair, ignorenulls=True).over(w_next)
    prev_v, prev_t = prev["v"], prev["t"]
    next_v, next_t = nxt["v"], nxt["t"]
    if method == "ffill":
        filled = prev_v
    elif method == "linear":
        frac = (ts - prev_t) / (next_t - prev_t)
        filled = (
            F.when(F.col("__v").isNotNull(), F.col("__v"))
            .when(next_v.isNull(), prev_v)
            .when(prev_v.isNull(), next_v)
            .when(next_t == prev_t, prev_v)
            .otherwise(prev_v + (next_v - prev_v) * frac)
        )
    else:
        raise ValueError(f"unknown fill method {method!r} (use 'linear' or 'ffill')")
    return (
        unioned.withColumn("__filled", filled)
        .where(F.col("__is_obs") == 0)
        .select(
            *keys,
            F.col("__t").alias(time_col),
            F.col("__filled").alias(value_col),
        )
    )
