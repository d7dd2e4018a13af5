"""Horizontal, row-aligned merge of two views.

Reference: agnes src/view.rs:609 `ViewMerge` / :644 `merge` — agnes
merges two views that share row count, producing a wider view; rows
align positionally (views over the same store share its permutation).

Spark has no positional identity across two arbitrary DataFrames, so
alignment must come from somewhere explicit:

- `on=` key columns -> a plain equi-join (the scalable path; this is
  what "views over the same store" degenerate to when the store has a
  key).
- `order_by=` (per side) -> positional alignment derived from an
  explicit sort order: `row_number()` over the given columns on each
  side, joined on the number. Stays entirely in Tungsten (no Python
  RDD hop); the global window is a single-partition sort, the same
  cost the reference's positional merge pays to define an order at
  all. Prefer this whenever ANY ordering column exists.
- positional (no key, no order): each side gets a contiguous index
  from a JVM-only two-pass numbering (per-partition local offsets
  from monotonically_increasing_id, partition counts prefix-summed
  and broadcast back — the zipWithIndex algorithm without the Python
  RDD hop) and the sides join on the index. Order-sensitive by
  definition, exactly like the reference; the documented degenerate
  path for truly keyless, orderless input.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_IDX = "__agnes_row_idx"


def with_row_index(df: DataFrame, name: str = _IDX) -> DataFrame:
    """Attach a 0-based contiguous row index preserving current order.

    JVM-only two-pass numbering — the zipWithIndex algorithm without
    the Python RDD hop: monotonically_increasing_id encodes
    (partition_id << 33) + 0-based local row number, so local position
    is mid % 2^33; per-partition row counts (numPartitions rows)
    prefix-sum into partition offsets with one tiny window and
    broadcast-join back on partition id. The broadcast hash join is
    map-side, so partition-local row order is preserved; the offsets
    impose the global order — identical semantics to zipWithIndex,
    zero serialization out of Tungsten. The indexed frame is
    materialized once (eager localCheckpoint) and BOTH passes read it,
    mirroring zipWithIndex's one-execution contract (see the inline
    comment for the sf1.0 failure a re-scanning counts pass caused)."""
    from pyspark.sql import Window

    pid = "__agnes_pid"
    local = "__agnes_local"
    # The counts pass and the join pass MUST observe the SAME physical
    # execution: pid/local are execution-dependent, and re-running the
    # lineage for the offsets branch let the two passes land on
    # different layouts (AQE coalescing / sort handling diverge between
    # the broadcast job and the main job) — intermittent row loss at
    # sf1.0 (150000 -> ~65k after the index join; sf0.1 always
    # collapsed both branches to one partition, hiding it). Eagerly
    # localCheckpoint the indexed frame so both passes read one
    # materialized set of blocks — zipWithIndex's one-execution
    # contract, kept JVM-side.
    base = (
        df.withColumn(pid, F.spark_partition_id())
        .withColumn(local, F.monotonically_increasing_id() % F.lit(1 << 33))
        .localCheckpoint(eager=True)
    )
    w = Window.orderBy(pid).rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        base.groupBy(pid)
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn("__off", F.coalesce(F.sum("__n").over(w), F.lit(0)))
        .select(pid, "__off")
    )
    return (
        base.join(F.broadcast(offsets), pid)
        .withColumn(name, (F.col("__off") + F.col(local)).cast("long"))
        .drop(pid, local, "__off")
    )


def merge_views(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | None = None,
    order_by: tuple[Sequence[str], Sequence[str]] | Sequence[str] | None = None,
) -> DataFrame:
    """`on` > `order_by` > RDD positional (see module docstring).

    `order_by` is either one column list applied to both sides or a
    (left_cols, right_cols) pair when the sides name their ordering
    columns differently."""
    if on:
        return left.join(right, on=list(on), how="inner")
    if order_by:
        from pyspark.sql import Window

        if (
            len(order_by) == 2
            and not isinstance(order_by[0], str)
            and not isinstance(order_by[1], str)
        ):
            l_ord, r_ord = list(order_by[0]), list(order_by[1])
        else:
            l_ord = r_ord = list(order_by)
        lhs = left.withColumn(
            _IDX, F.row_number().over(Window.orderBy(*[F.col(c) for c in l_ord]))
        )
        rhs = right.withColumn(
            _IDX, F.row_number().over(Window.orderBy(*[F.col(c) for c in r_ord]))
        )
    else:
        lhs = with_row_index(left)
        rhs = with_row_index(right)
    # rename collisions on the right, matching agnes' relabel-before-merge
    for c in right.columns:
        if c in left.columns:
            rhs = rhs.withColumnRenamed(c, f"{c}_1")
    out = lhs.join(rhs, on=_IDX, how="inner").orderBy(_IDX).drop(_IDX)
    return out
