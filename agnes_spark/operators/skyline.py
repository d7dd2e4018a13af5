"""Pareto-frontier (skyline) queries.

The 2-D skyline — rows not dominated by any other row on a
(minimize, maximize) objective pair — is the classic "cheapest AND
best" query (Borzsony, Kossmann & Stocker, ICDE'01). The naive form
is an all-pairs dominance test; the scalable Spark shape here is the
grid-prefix decomposition:

1. bucket rows by the minimize column (integer `DIV bucket_width`);
2. ONE grouped aggregate -> per-bucket max of the maximize column
   (the bucket frame is bounded by value_range / bucket_width, a
   constant, never by row count);
3. a prefix-max over the ordered bucket frame gives, for every
   bucket, the best maximize value at any strictly cheaper bucket —
   a single-task window over the bounded bucket frame only;
4. broadcast the bucket stats back and finish dominance INSIDE each
   bucket with keyed windows (partitioned by bucket / by exact
   minimize value), so no row-level work ever funnels through one
   task.

A row survives iff nothing strictly cheaper (previous buckets OR
same bucket at a strictly smaller value) reaches its maximize value,
and nothing at the SAME minimize value strictly exceeds it.
Equal (min, max) duplicates do not dominate each other and are all
emitted, matching the NOT EXISTS dominance definition.

Reference parity: the reference engine exposes filter/sort/aggregate
primitives (src/view.rs) a user would compose into exactly this
staircase; here it is one declarative operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pareto_frontier_2d(
    df: DataFrame,
    minimize_col: str,
    maximize_col: str,
    bucket_width: int = 1000,
) -> DataFrame:
    """Return the rows of `df` on the 2-D Pareto frontier: no other
    row has `minimize_col` <= and `maximize_col` >= with at least one
    strict. Both columns must be integral (exact dominance — no FP
    ties). Output keeps every input column.

    Scale shape: one bounded grouped agg + one bounded-frame prefix
    window + two keyed row windows; zero all-pairs joins, zero
    row-level single-partition funnels.
    """
    mn = F.col(minimize_col)
    mx = F.col(maximize_col)
    # integer floor-division bucket (inputs are integral; pmod keeps
    # the arithmetic exact for negatives too)
    bucket = ((mn - F.pmod(mn, F.lit(bucket_width))) / bucket_width).cast(
        "long"
    )
    rows = df.withColumn("__b", bucket)

    bstats = rows.groupBy("__b").agg(F.max(mx).alias("__bmax"))
    w_prev = (
        Window.orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bstats = bstats.withColumn("__pmax_prev", F.max("__bmax").over(w_prev)).drop(
        "__bmax"
    )

    joined = rows.join(F.broadcast(bstats), "__b")
    # strictly-cheaper rows inside the SAME bucket (integer range frame)
    w_in = (
        Window.partitionBy("__b")
        .orderBy(mn)
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    # best maximize value at the EXACT same minimize value
    w_eq = Window.partitionBy(minimize_col)
    scored = joined.withColumn("__mlt_in", F.max(mx).over(w_in)).withColumn(
        "__meq", F.max(mx).over(w_eq)
    )
    best_cheaper = F.greatest(F.col("__pmax_prev"), F.col("__mlt_in"))
    frontier = scored.filter(
        (best_cheaper.isNull() | (best_cheaper < mx)) & (F.col("__meq") == mx)
    )
    return frontier.drop("__b", "__pmax_prev", "__mlt_in", "__meq")
