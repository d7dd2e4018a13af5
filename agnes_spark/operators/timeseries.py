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


def holt_smoothing(
    series: DataFrame,
    time_col: str,
    value_col: str,
    alpha: float = 0.3,
    beta: float = 0.2,
) -> DataFrame:
    """Holt double exponential smoothing (level + linear trend) over
    an already-aggregated, calendar-bounded series: one output row
    per input row with the running `level` and `trend` after
    consuming that observation. Init convention: the first point
    seeds level = y_1, trend = 0.

    Determinism: the recursion folds left over the time-ordered
    observation list with the FIRST ELEMENT AS the initial
    accumulator (mirroring engines whose list_reduce has no init
    slot), every step a fixed double expression over the same
    literals — bit-identical anywhere. The per-row prefix fold is
    O(n^2) in the series length, which is bounded (calendar days),
    never data-sized; the 1-row observation-list broadcast rides the
    same bounded frame. Inputs should be integral (quantize
    upstream) so observations are exact."""
    a, b1 = float(alpha), float(beta)
    obs = F.struct(
        F.col(value_col).cast("double").alias("l"),
        F.lit(0.0).alias("b"),
        F.col(value_col).cast("double").alias("y"),
    )
    w_rn = Window.orderBy(time_col)
    rows = series.withColumn("__obs", obs).withColumn(
        "__rn", F.row_number().over(w_rn)
    )
    fl = rows.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col(time_col), F.col("__obs")))),
            lambda st: st.getField("__obs"),
        ).alias("__fl")
    )
    # step: l' = a*y + (1-a)*(l + b); b' = beta*(l' - l) + (1-beta)*b.
    # l' is written out twice (no let-binding in either lambda
    # dialect) — identical subexpressions, identical bits.
    def _step(acc, x):
        lp = (
            F.lit(a) * x.getField("y")
            + F.lit(1.0 - a) * (acc.getField("l") + acc.getField("b"))
        )
        return F.struct(
            lp.alias("l"),
            (
                F.lit(b1)
                * (
                    F.lit(a) * x.getField("y")
                    + F.lit(1.0 - a) * (acc.getField("l") + acc.getField("b"))
                    - acc.getField("l")
                )
                + F.lit(1.0 - b1) * acc.getField("b")
            ).alias("b"),
            x.getField("y").alias("y"),
        )

    state = F.aggregate(
        F.slice("__fl", 2, F.col("__rn") - 1),
        F.element_at("__fl", 1),
        _step,
    )
    return (
        rows.crossJoin(F.broadcast(fl))
        .withColumn("__st", state)
        .select(
            F.col(time_col),
            F.col(value_col),
            F.col("__st.l").alias("level"),
            F.col("__st.b").alias("trend"),
        )
        .orderBy(time_col)
    )
