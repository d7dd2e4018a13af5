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
