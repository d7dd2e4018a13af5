"""Decision-tree induction primitives.

decision_stump is the inner step of CART/C4.5 tree building: find
the single best binary split "feature <= v" of a 0/1 target by
weighted Gini impurity. At scale the candidate set is every distinct
feature value, so the prefix counts that price each split use the
same two-level bucketed prefix sum as stats._value_counts_cum
(range buckets from a 1-row bounds agg, per-bucket offsets on the
constant-size bucket frame, within-bucket windows partition BY
BUCKET) — no global single-partition window over data-sized frames.

Every impurity term is a division of exact integer counts, and the
argmin ties break by ascending split value via lexicographic
(gini, v) struct comparison — bit-deterministic cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def decision_stump(
    df: DataFrame,
    feature_col: str,
    target_col: str,
    n_buckets: int = 64,
) -> DataFrame:
    """One row: the best split of integral `feature_col` for the 0/1
    `target_col` — (split_value, gini, n_left, pos_left, n_right,
    pos_right) where left means feature <= split_value and gini is
    the weighted two-sided Gini impurity. Splits leaving either side
    empty are not candidates."""
    v = F.col(feature_col)
    y = F.col(target_col).cast("long")
    per_v = (
        df.filter(v.isNotNull() & y.isNotNull())
        .groupBy(v.alias("v"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("t"),
            F.sum(y).cast("long").alias("p"),
        )
        # NOT persisted: A/B-measured flat-to-slower with a persist here
        # (decision_stump_orders 1.47->1.52s min) — exchange reuse
        # already covers the multi-consumption
    )
    bounds = per_v.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    bucketed = per_v.crossJoin(F.broadcast(bounds)).withColumn(
        "__bkt",
        F.least(
            F.lit(n_buckets - 1),
            F.floor(
                (F.col("v") - F.col("lo"))
                * F.lit(n_buckets)
                / (F.col("hi") - F.col("lo") + F.lit(1))
            ).cast("int"),
        ),
    )
    w_in = (
        Window.partitionBy("__bkt")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_bkt = Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        bucketed.groupBy("__bkt")
        .agg(
            F.sum("t").alias("bt"),
            F.sum("p").alias("bp"),
        )
        .withColumn("off_t", F.coalesce(F.sum("bt").over(w_bkt), F.lit(0)))
        .withColumn("off_p", F.coalesce(F.sum("bp").over(w_bkt), F.lit(0)))
        .select("__bkt", "off_t", "off_p")
    )
    totals = per_v.agg(
        F.sum("t").cast("long").alias("nn"), F.sum("p").cast("long").alias("pp")
    )
    cand = (
        bucketed.join(F.broadcast(offs), "__bkt")
        .withColumn(
            "nl", (F.col("off_t") + F.sum("t").over(w_in)).cast("long")
        )
        .withColumn(
            "pl", (F.col("off_p") + F.sum("p").over(w_in)).cast("long")
        )
        .crossJoin(F.broadcast(totals))
        .filter(F.col("nl") < F.col("nn"))  # right side must be nonempty
    )
    nl = F.col("nl").cast("double")
    pl = F.col("pl").cast("double")
    nn = F.col("nn").cast("double")
    nr = (F.col("nn") - F.col("nl")).cast("double")
    pr = (F.col("pp") - F.col("pl")).cast("double")
    gini_l = F.lit(1.0) - (pl / nl) * (pl / nl) - ((nl - pl) / nl) * (
        (nl - pl) / nl
    )
    gini_r = F.lit(1.0) - (pr / nr) * (pr / nr) - ((nr - pr) / nr) * (
        (nr - pr) / nr
    )
    gini = (nl / nn) * gini_l + (nr / nn) * gini_r
    best = cand.agg(
        F.min(
            F.struct(
                gini.alias("g"),
                F.col("v").alias("v"),
                F.col("nl").alias("nl"),
                F.col("pl").alias("pl"),
                (F.col("nn") - F.col("nl")).alias("nr"),
                (F.col("pp") - F.col("pl")).alias("pr"),
            )
        ).alias("b")
    )
    return best.select(
        F.col("b.v").alias("split_value"),
        F.col("b.g").alias("gini"),
        F.col("b.nl").alias("n_left"),
        F.col("b.pl").alias("pos_left"),
        F.col("b.nr").alias("n_right"),
        F.col("b.pr").alias("pos_right"),
    )
