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
