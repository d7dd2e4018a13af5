"""Time-series repair primitives.

fill_missing_hours (in the gate registry) zero-fills count series;
`interpolate_linear` here repairs VALUE series, where a zero is wrong
and the honest estimate for a gap is the line between its neighbors —
sensor feeds, hourly revenue, metric exports. Everything is window
arithmetic over the (already aggregated, calendar-bounded) series
frame: no self-joins, no per-row lookups, state is O(1) per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interpolate_linear(
    series: DataFrame,
    key_cols: list[str],
    time_col: str,
    value_col: str,
) -> DataFrame:
    """Linearly interpolate NULL values between their nearest non-null
    neighbors per key (rows outside any bracketing pair stay NULL).

    Adds `<value_col>_filled`. One window pass per direction with
    IGNORE NULLS last/first — the carried neighbor value AND its
    timestamp ride the same frames, so the slope needs no join back.
    """
    v = F.col(value_col)
    w_prev = (
        Window.partitionBy(*key_cols)
        .orderBy(time_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_next = (
        Window.partitionBy(*key_cols)
        .orderBy(time_col)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    t_us = F.unix_micros(F.col(time_col).cast("timestamp"))
    prev_v = F.last(v, ignorenulls=True).over(w_prev)
    prev_t = F.last(F.when(v.isNotNull(), t_us), ignorenulls=True).over(w_prev)
    next_v = F.first(v, ignorenulls=True).over(w_next)
    next_t = F.first(F.when(v.isNotNull(), t_us), ignorenulls=True).over(w_next)
    frac = (t_us - prev_t) / (next_t - prev_t)
    interp = prev_v + (next_v - prev_v) * frac
    # Equal-timestamp brackets (duplicate rows per instant, one null)
    # would divide by zero -> Inf/NaN silently landing in _filled;
    # guard so the result is NULL instead (the row has no bracket).
    filled = F.when(v.isNotNull(), v).otherwise(
        F.when(
            prev_v.isNotNull() & next_v.isNotNull() & (next_t != prev_t),
            interp,
        )
    )
    return series.withColumn(f"{value_col}_filled", filled)


def cusum_profile(
    series: DataFrame,
    time_col: str,
    value_col: str,
) -> DataFrame:
    """CUSUM changepoint profile of an (already aggregated,
    calendar-bounded) series: per row, the scaled cumulative deviation
    S_i = N * cumsum_i(x) - i * total(x) — N times the classic
    cumsum-of-(x - mean), kept EXACT by clearing the mean's division.
    The row where |S_i| peaks is the single-changepoint estimate
    (Page 1954 / Taylor's cumulative-sum changepoint method).

    Adds `s_num` (decimal(38,0), exact at any scale: the product is
    bounded by n_rows * total, and a calendar-bounded series keeps
    n_rows small even at 100 TB of raw input) and `is_peak`. One
    ordered window pass over the bounded series frame + one 1-row
    totals broadcast + one 1-row max broadcast.
    """
    w = Window.orderBy(time_col).rowsBetween(Window.unboundedPreceding, 0)
    tot = series.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("__n"),
        F.sum(F.col(value_col).cast("decimal(19,0)")).cast("decimal(38,0)").alias("__t"),
    )
    prof = (
        series.withColumn("__cum", F.sum(F.col(value_col).cast("decimal(19,0)")).over(w))
        .withColumn("__i", F.row_number().over(Window.orderBy(time_col)))
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "s_num",
            (
                F.col("__n") * F.col("__cum").cast("decimal(38,0)")
                - F.col("__i").cast("decimal(38,0)") * F.col("__t")
            ).cast("decimal(38,0)"),
        )
        .drop("__cum", "__i", "__n", "__t")
    )
    peak = prof.agg(F.max(F.abs(F.col("s_num"))).alias("__pk"))
    return (
        prof.crossJoin(F.broadcast(peak))
        .withColumn("is_peak", F.abs(F.col("s_num")) == F.col("__pk"))
        .drop("__pk")
    )
