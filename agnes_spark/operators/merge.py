"""Horizontal, row-aligned merge of two views.

Reference: agnes src/view.rs:609 `ViewMerge` / :644 `merge` — agnes
merges two views that share row count, producing a wider view; rows
align positionally (views over the same store share its permutation).

Spark has no positional identity across two arbitrary DataFrames, so
alignment must come from somewhere explicit:

- `on=` key columns -> a plain equi-join (the scalable path; this is
  what "views over the same store" degenerate to when the store has a
  key).
- positional (no key): each side is numbered with
  `rdd.zipWithIndex` — a two-pass distributed numbering that preserves
  the incoming row order (partition sizes are counted, then each
  partition offsets locally; no single-point bottleneck) — and joined
  on the index. Order-sensitive by definition, exactly like the
  reference; callers should sort both sides consistently first.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_IDX = "__agnes_row_idx"


def with_row_index(df: DataFrame, name: str = _IDX) -> DataFrame:
    """Attach a 0-based contiguous row index preserving current order."""
    from pyspark.sql.types import LongType, StructField, StructType

    rdd = df.rdd.zipWithIndex().map(lambda pair: pair[0] + (pair[1],))
    # build a fresh StructType: StructType.add would mutate df's cached schema
    out_schema = StructType(list(df.schema.fields) + [StructField(name, LongType(), False)])
    return df.sparkSession.createDataFrame(rdd, out_schema)


def merge_views(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | None = None,
) -> DataFrame:
    if on:
        return left.join(right, on=list(on), how="inner")
    lhs = with_row_index(left)
    rhs = with_row_index(right)
    # rename collisions on the right, matching agnes' relabel-before-merge
    for c in right.columns:
        if c in left.columns:
            rhs = rhs.withColumnRenamed(c, f"{c}_1")
    out = lhs.join(rhs, on=_IDX, how="inner").orderBy(_IDX).drop(_IDX)
    return out
