"""Item-item collaborative filtering over co-occurrence baskets.

The classic recsys neighborhood model (Sarwar et al., WWW'01
"Item-Based Collaborative Filtering"): two items are similar when
the baskets containing them overlap, scored by binary cosine
similarity c_ab / sqrt(d_a * d_b) where c_ab counts shared baskets
and d_x the item's basket degree.

Scale shape: the pair generator is within_group_pairs (ONE shuffle:
items collect per basket, pairs expand map-side, bounded by
items-per-basket squared — never item-cardinality squared), the
degree join is keyed equi, and the top-k cut is a per-item window.
The score is one double division over exact integer counts and one
correctly-rounded sqrt of an exact integer product, so results are
bit-deterministic cross-engine; ranking ties break by neighbor id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from agnes_spark.operators.graph import within_group_pairs


def itemitem_cosine(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_common: int = 2,
    topk: int = 3,
) -> DataFrame:
    """Top-`topk` most similar items per item: (p, q, common, sim)
    with binary-cosine sim, at least `min_common` shared baskets,
    ties broken by ascending q. Duplicate (basket, item) rows
    collapse first so c and d count DISTINCT baskets."""
    bp = df.select(
        F.col(basket_col).alias("o"), F.col(item_col).cast("long").alias("p")
    ).distinct()
    deg = bp.groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("d"))
    common = (
        within_group_pairs(bp, "o", "p")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .filter(F.col("c") >= min_common)
    )
    sym = common.select(
        F.col("a").alias("p"), F.col("b").alias("q"), "c"
    ).unionByName(
        common.select(F.col("b").alias("p"), F.col("a").alias("q"), "c")
    )
    scored = (
        sym.join(deg.select(F.col("p"), F.col("d").alias("dp")), "p")
        .join(
            deg.select(F.col("p").alias("q"), F.col("d").alias("dq")), "q"
        )
        .withColumn(
            "sim",
            F.col("c").cast("double")
            / F.sqrt((F.col("dp") * F.col("dq")).cast("double")),
        )
    )
    w = Window.partitionBy("p").orderBy(F.desc("sim"), F.asc("q"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= topk)
        .select("p", "q", F.col("c").alias("common"), "sim")
    )


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_common: int = 2,
    top: int = 20,
) -> DataFrame:
    """Directed association rules a -> b from co-occurrence baskets
    (Agrawal & Srikant, VLDB'94 semantics at pair length): support
    c/N, confidence c/d_a, lift c*N/(d_a*d_b), keeping the global
    top-`top` rules by (lift desc, antecedent, consequent). Same
    one-shuffle pair generation as itemitem_cosine; every score is a
    fixed expression over exact integers — bit-deterministic."""
    bp = df.select(
        F.col(basket_col).alias("o"), F.col(item_col).cast("long").alias("p")
    ).distinct()
    n_baskets = bp.agg(
        F.countDistinct("o").cast("long").alias("nb")
    )
    deg = bp.groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("d"))
    common = (
        within_group_pairs(bp, "o", "p")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .filter(F.col("c") >= min_common)
    )
    directed = common.select(
        F.col("a").alias("ante"), F.col("b").alias("cons"), "c"
    ).unionByName(
        common.select(F.col("b").alias("ante"), F.col("a").alias("cons"), "c")
    )
    scored = (
        directed.join(
            deg.select(F.col("p").alias("ante"), F.col("d").alias("da")),
            "ante",
        )
        .join(
            deg.select(F.col("p").alias("cons"), F.col("d").alias("db")),
            "cons",
        )
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "ante",
            "cons",
            F.col("c").alias("common"),
            (F.col("c").cast("double") / F.col("nb").cast("double")).alias(
                "support"
            ),
            (F.col("c").cast("double") / F.col("da").cast("double")).alias(
                "confidence"
            ),
            (
                (F.col("c") * F.col("nb")).cast("double")
                / (F.col("da") * F.col("db")).cast("double")
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.desc("lift"), F.asc("ante"), F.asc("cons")
    ).limit(top)
