"""Tour of the graph operators over the part co-purchase graph.

Edges connect parts ordered together in the same basket
(graph.within_group_pairs: ONE shuffle, pairs expand map-side).
On that graph:

  1. triangle_count          exact census via degree-oriented wedge join
  2. connected_components    co-purchase communities (min-label rounds)
  3. pagerank                the structurally central parts
  4. frequent pair supports  the classic market-basket view

Run: python examples/graph_analytics.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from agnes_spark import get_spark
from agnes_spark.operators.graph import (
    connected_components_auto,
    pagerank,
    triangle_count,
    within_group_pairs,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("graph_analytics_example")

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_orderkey", "l_partkey"
    )
    pairs = within_group_pairs(li, "l_orderkey", "l_partkey")
    support = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("support"))

    print("== strongest co-purchase pairs ==")
    support.orderBy(F.desc("support"), "a", "b").show(5)

    print("== triangle census ==")
    triangle_count(pairs, "a", "b").show()

    print("== co-purchase communities (support >= 2 backbone) ==")
    backbone = support.filter(F.col("support") >= 2)
    comp = connected_components_auto(backbone, "a", "b")
    comp.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n_parts")).orderBy(
        F.desc("n_parts"), "cluster_id"
    ).show(5)

    print("== most central parts (pagerank) ==")
    # pagerank walks DIRECTED edges; symmetrize the undirected graph
    sym = pairs.unionByName(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    pagerank(sym, "a", "b").orderBy(F.desc("rank"), "id").show(5)


if __name__ == "__main__":
    main()
