"""Categorical feature encoding for training-data pipelines.

The three encodings every tabular feature pipeline needs before a
model sees a categorical column, each in its minimal Spark shape:

- frequency_encode: ONE grouped count + a broadcast join back (the
  category frame is bounded by the column's cardinality, never by
  rows) — exact integers.
- target_encode_loo: leave-one-out target mean, the leakage-free form
  of mean/target encoding (each row's own target is excluded from its
  category's mean). Same one-aggregate + broadcast-join shape; the
  encoding is a SINGLE division of exact accumulators, so it is
  bit-deterministic cross-engine for integral targets.
- one_hot_encode: a fixed, caller-supplied category list (at 100 TB
  the category inventory comes from a profiling pass, not a dynamic
  scan — dynamic schemas don't compose with downstream jobs) expanded
  to 0/1 int columns in one projection, no shuffle at all.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequency_encode(
    df: DataFrame, col: str, out_col: str | None = None
) -> DataFrame:
    """Add `<col>_freq`: the exact occurrence count of the row's
    category (NULL categories count as their own group via a
    null-safe aggregate key)."""
    out = out_col or f"{col}_freq"
    counts = df.groupBy(F.col(col).alias("__cat")).agg(
        F.count(F.lit(1)).cast("long").alias(out)
    )
    return df.join(
        F.broadcast(counts), df[col].eqNullSafe(counts["__cat"]), "left"
    ).drop("__cat")


def target_encode_loo(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Add `<cat_col>_te`: the leave-one-out mean of `target_col`
    within the row's category, (S_g - y_i) / (n_g - 1) — NULL when the
    row is alone in its category (no leak-free estimate exists) or its
    own target is NULL.

    Integral targets sum through decimal accumulators (the welch
    discipline) so S_g is exact and the per-row encoding is one
    double division — bit-identical across engines and partitionings.
    """
    out = out_col or f"{cat_col}_te"
    t = F.col(target_col)
    integral = dict(df.dtypes)[target_col] in {
        "tinyint",
        "smallint",
        "int",
        "bigint",
    }
    acc = t.cast("decimal(19,0)") if integral else t.cast("double")
    stats = df.filter(t.isNotNull()).groupBy(F.col(cat_col).alias("__cat")).agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(acc).alias("__s"),
    )
    joined = df.join(
        F.broadcast(stats), df[cat_col].eqNullSafe(stats["__cat"]), "left"
    ).drop("__cat")
    loo = (
        (F.col("__s").cast("double") - t.cast("double"))
        / (F.col("__n") - F.lit(1)).cast("double")
    )
    return joined.withColumn(
        out,
        F.when(t.isNotNull() & (F.col("__n") > 1), loo),
    ).drop("__n", "__s")


def one_hot_encode(
    df: DataFrame, col: str, categories: Sequence[str]
) -> DataFrame:
    """Add one `<col>_is_<cat>` 0/1 int column per listed category —
    one stateless projection, no scan of the column's domain."""
    out = df
    for cat in categories:
        safe = str(cat).lower().replace(" ", "_").replace("-", "_")
        out = out.withColumn(
            f"{col}_is_{safe}",
            F.when(F.col(col) == cat, F.lit(1)).otherwise(F.lit(0)),
        )
    return out


def standardize(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Add `<value_col>_z`: the z-score (x - mean)/stddev_samp within
    the row's group (or globally with group_cols=None) — the standard
    feature scaling before distance-based models. Integral inputs sum
    through decimal accumulators (welch discipline), so mean and
    variance derive from exact sums; sqrt is IEEE-correctly-rounded,
    making the score bit-deterministic cross-engine. Groups need
    n >= 2 and nonzero variance; otherwise NULL. One grouped
    aggregate broadcast back — no window, no second scan."""
    out = out_col or f"{value_col}_z"
    t = F.col(value_col)
    integral = dict(df.dtypes)[value_col] in {
        "tinyint",
        "smallint",
        "int",
        "bigint",
    }
    acc = t.cast("decimal(19,0)") if integral else t.cast("double")
    keys = list(group_cols) if group_cols else []
    gb = df.filter(t.isNotNull())
    stats = (gb.groupBy(*keys) if keys else gb.groupBy()).agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(acc).cast("double").alias("__s"),
        F.sum(acc * acc).cast("double").alias("__ss"),
    )
    joined = (
        df.join(F.broadcast(stats), keys, "left") if keys else df.crossJoin(F.broadcast(stats))
    )
    nd = F.col("__n").cast("double")
    mean = F.col("__s") / nd
    var = (F.col("__ss") - nd * mean * mean) / (nd - F.lit(1.0))
    z = (t.cast("double") - mean) / F.sqrt(var)
    return joined.withColumn(
        out, F.when(t.isNotNull() & (F.col("__n") > 1) & (var > 0), z)
    ).drop("__n", "__s", "__ss")


def robust_scale(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Add `<value_col>_rs`: (x - median) / IQR within the row's group
    — the outlier-immune scaler (sklearn RobustScaler semantics).
    Exact percentiles with linear interpolation (Spark percentile ==
    DuckDB quantile_cont); over integer inputs the quantile fractions
    are dyadic (0/.25/.5/.75), so q1/q2/q3 are exactly representable
    doubles and the scale is bit-deterministic. NULL when IQR == 0.
    Same one-aggregate-broadcast shape as standardize."""
    out = out_col or f"{value_col}_rs"
    t = F.col(value_col)
    keys = list(group_cols) if group_cols else []
    gb = df.filter(t.isNotNull())
    pcts = F.percentile(t, F.lit([0.25, 0.5, 0.75]))
    stats = (gb.groupBy(*keys) if keys else gb.groupBy()).agg(
        pcts.getItem(0).alias("__q1"),
        pcts.getItem(1).alias("__q2"),
        pcts.getItem(2).alias("__q3"),
    )
    joined = (
        df.join(F.broadcast(stats), keys, "left") if keys else df.crossJoin(F.broadcast(stats))
    )
    iqr = F.col("__q3") - F.col("__q1")
    rs = (t.cast("double") - F.col("__q2")) / iqr
    return joined.withColumn(
        out, F.when(t.isNotNull() & (iqr > 0), rs)
    ).drop("__q1", "__q2", "__q3")


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Quantile normalization (Bolstad et al. 2003): replace each
    row's value with the GLOBAL value at the same within-group rank
    quantile, so every group ends up with the same distribution —
    the cross-source calibration step before mixing heterogeneous
    feeds. Deterministic exact form: within-group ordinal rank r of
    n_g maps to global ordinal position ceil(r * N / n_g) (pure
    integer arithmetic), and the value at a global position resolves
    through the distinct-value interval frame (cum+1 .. cum+t) — a
    range join against a frame bounded by the DISTINCT VALUE count,
    never by rows. Ties order by (value, id) everywhere. Adds
    `<value_col>_qn`.

    Scale shape: one partitioned rank window (by group), one grouped
    count, one distinct-value prefix frame broadcast into a bounded
    range join. No data-sized global window."""
    from pyspark.sql import Window

    dt = dict(df.dtypes).get(value_col)
    if dt not in ("tinyint", "smallint", "int", "bigint"):
        # the exact rank/interval arithmetic is integer-only; a silent
        # cast would truncate float inputs and re-emit the truncated
        # value under the original column name
        raise ValueError(
            f"quantile_normalize requires an integral value column "
            f"(got {value_col}: {dt}); quantize upstream, e.g. "
            f"round(x * scale).cast('long')"
        )
    v = F.col(value_col).cast("long")
    rows = df.select(
        F.col(group_col).alias("__g"), v.alias("__v"), F.col(id_col).alias("__id")
    )
    w_g = Window.partitionBy("__g").orderBy("__v", "__id")
    ranked = rows.withColumn("__r", F.row_number().over(w_g))
    ng = rows.groupBy("__g").agg(F.count(F.lit(1)).cast("long").alias("__ng"))
    totals = rows.agg(F.count(F.lit(1)).cast("long").alias("__nn"))
    # distinct-value interval frame: global position p falls in value
    # v iff cum(v) < p <= cum(v) + t(v)
    per_v = rows.groupBy("__v").agg(F.count(F.lit(1)).cast("long").alias("__t"))
    w_v = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, -1)
    iv = per_v.withColumn(
        "__cum", F.coalesce(F.sum("__t").over(w_v), F.lit(0)).cast("long")
    ).select(
        F.col("__v").alias("__gv"),
        (F.col("__cum") + F.lit(1)).alias("__lo"),
        (F.col("__cum") + F.col("__t")).alias("__hi"),
    )
    num = F.col("__r") * F.col("__nn") + F.col("__ng") - F.lit(1)
    pos = ((num - F.pmod(num, F.col("__ng"))) / F.col("__ng")).cast("long")
    placed = (
        ranked.join(ng, "__g")
        .crossJoin(F.broadcast(totals))
        .withColumn("__p", pos)
        .join(
            F.broadcast(iv),
            (F.col("__p") >= F.col("__lo")) & (F.col("__p") <= F.col("__hi")),
        )
    )
    return placed.select(
        F.col("__g").alias(group_col),
        F.col("__id").alias(id_col),
        F.col("__v").alias(value_col),
        F.col("__gv").alias(f"{value_col}_qn"),
    )
