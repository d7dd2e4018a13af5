"""Partitioning & skew-mitigation helpers.

AQE's skew-join handling covers most cases at runtime; these are the
explicit tools for when you know the skew ahead of time (a null-heavy
foreign key, one hot customer, a power-law join key at 100 TB).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting: the (large, skewed) left side gets a
    deterministic salt in [0, salt_factor) derived from its full row
    hash, and the (smaller) right side is replicated once per salt
    value. The join key becomes (key, salt), splitting each hot key's
    rows across `salt_factor` shuffle partitions.

    Results are identical to the plain join for how='inner'/'left'
    (the only modes allowed): each left row carries exactly one salt
    value, so it meets each matching right key exactly once. Right/full
    outer joins would emit every UNMATCHED right row once per replica
    (salt_factor copies), so they are rejected — flip the sides and use
    how='left' instead.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            "salted_join supports how='inner' or 'left' only: the right side "
            "is replicated per salt value, so right/full outer joins would "
            f"duplicate unmatched right rows {salt_factor}x (got how={how!r})"
        )
    on = list(on)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt_factor))
    l2 = left.withColumn("__salt", salt)
    r2 = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_factor)]))
    )
    out = l2.join(r2, on=on + ["__salt"], how=how)
    return out.drop("__salt")


def repartition_for_join(df: DataFrame, keys: Sequence[str], num_partitions: int | None = None) -> DataFrame:
    """Pre-shuffle on the join keys so several downstream joins/aggs on
    the same keys reuse one exchange (Catalyst reuses compatible
    hash-partitionings instead of re-shuffling per operator)."""
    if num_partitions:
        return df.repartition(num_partitions, *[F.col(k) for k in keys])
    return df.repartition(*[F.col(k) for k in keys])


def key_skew_profile(df: DataFrame, key: str, top_n: int = 10) -> DataFrame:
    """Heavy-hitter profile of a join/groupBy key: the top_n hottest
    key values with row counts and share of total. Run this before
    choosing salt factors / AQE skew thresholds at 100 TB — one
    aggregate pass, top-N via TakeOrdered (no global sort)."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("share", F.round(F.col("n") / F.lit(total), 6))
        .orderBy(F.col("n").desc(), F.col(key).asc())
        .limit(top_n)
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    keys: Sequence[str],
    num_buckets: int = 32,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist bucketed by the join key: later equi-joins between
    tables bucketed the same way are shuffle-free (SortMergeJoin reads
    co-located buckets). `path` makes it an external table (data at
    `path`, metadata in the catalog)."""
    w = df.write.mode(mode).bucketBy(num_buckets, *keys).sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table_name)
