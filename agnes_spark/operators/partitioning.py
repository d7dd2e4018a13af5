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


def zorder_value(cols: Sequence, bits: int = 16):
    """Morton (Z-order) code Column: interleaves the low `bits` bits of
    each integer column (caller scales/buckets beforehand — see
    write_zordered for the min/max scaling variant). Points close in
    EVERY dimension get close codes, so range-partitioning + sorting by
    this value clusters multi-dimensional locality into the same files
    and row groups — parquet min/max stats then prune scans for
    predicates on ANY of the dimensions, not just the leading sort key.
    Pure shift/mask Column arithmetic (whole-stage codegen)."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    n = len(cs)
    if bits * n > 63:
        # Java shiftleft wraps shifts mod 64 and bit 63 is the sign bit, so
        # codes past 63 bits silently corrupt the ordering. Refuse loudly.
        raise ValueError(
            f"zorder_value: bits*len(cols) = {bits * n} exceeds 63; "
            f"use bits <= {63 // n} for {n} columns"
        )
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cs):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, b * n + i)
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 12,
    num_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered by the Z-order of `cols`: each column is
    min/max-scaled to [0, 2^bits) (one tiny agg pass), rows are
    range-partitioned and sorted by the interleaved code, and the sort
    column itself is dropped from the output. At 100 TB this is the
    data-layout lever for multi-dimensional pruning — a filter on any
    subset of `cols` skips most files via footer stats, where a plain
    sort only prunes on its leading column."""
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    top = (1 << bits) - 1
    scaled = []
    for c in cols:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        span = (mx - mn) or 1.0
        scaled.append(
            F.least(
                F.lit(top),
                F.floor((F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * top),
            ).cast("long")
        )
    z = df.withColumn("__z", zorder_value(scaled, bits))
    (
        z.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def compact_small_files(
    spark,
    in_path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
) -> int:
    """Small-file compaction — the table-maintenance pass every
    long-running ingest needs: streaming/incremental writers emit one
    file per (batch x partition), and a 100 TB table quietly decays
    into millions of KB-sized files whose per-file open/footer cost
    dominates scans. Rewrites `in_path` into ceil(bytes / target)
    files of ~`target_file_bytes` each and returns that file count.

    Sizing reads the directory's ContentSummary through the Hadoop
    FileSystem API (works on any supported FS — local, HDFS, S3A),
    not a local os.walk; the parquet rewrite itself delegates to
    sources.formats.compact_parquet (which also offers the staged
    in-place swap when no out_path separation is wanted).
    """
    import math

    jvm = spark.sparkContext._jvm  # noqa: SLF001
    hconf = spark.sparkContext._jsc.hadoopConfiguration()  # noqa: SLF001
    jpath = jvm.org.apache.hadoop.fs.Path(in_path)
    fs = jpath.getFileSystem(hconf)
    total_bytes = fs.getContentSummary(jpath).getLength()
    n_files = max(1, math.ceil(total_bytes / target_file_bytes))
    if fmt == "parquet":
        from agnes_spark.sources.formats import compact_parquet

        compact_parquet(spark, in_path, n_files, out_path=out_path)
    else:
        df = spark.read.format(fmt).load(in_path)
        df.coalesce(n_files).write.mode("overwrite").format(fmt).save(out_path)
    return n_files
