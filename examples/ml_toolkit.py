"""Classical-ML toolkit tour — the round-7 model-building operators
composed into one train/evaluate/mine pipeline, every step exact or
bit-deterministic (no RNG, no logs, no library black boxes):

1. deterministic k-fold assignment (pure integer arithmetic)
2. k-means clustering of the embedding cloud (integer-quantized
   Lloyd, broadcast-literal centroids)
3. PCA top component from the exact integer Gram matrix
4. a decision stump trained by exact-Gini prefix sums, evaluated
   with a confusion matrix on held-out folds
5. hard-negative mining (nearest different-label embedding) for
   contrastive training pairs
6. two-predictor OLS by exact normal equations + Cramer's rule

Run: python examples/ml_toolkit.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from agnes_spark import get_spark
from agnes_spark.operators.clustering import kmeans_assign
from agnes_spark.operators.pca import pca_power_top
from agnes_spark.operators.sampling import assign_folds
from agnes_spark.operators.stats import ols_two_features, trimmed_mean
from agnes_spark.operators.trees import decision_stump


def main() -> None:
    spark = get_spark("example_ml_toolkit")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))

    # 1. reproducible folds: any engine that can multiply integers
    # assigns the same rows to the same folds
    folded = assign_folds(orders, "o_orderkey", k=5)
    print("fold sizes:", sorted((r["fold"], r["n"]) for r in
          folded.groupBy("fold").agg(F.count(F.lit(1)).alias("n")).collect()))

    # 2. cluster the embedding cloud (3 Lloyd rounds, k=4)
    asg = kmeans_assign(emb, "vec_id", "embedding", k=4, rounds=3)
    print("cluster sizes:", sorted((r["cluster"], r["n"]) for r in
          asg.groupBy("cluster").agg(F.count(F.lit(1)).alias("n")).collect()))

    # 3. top principal component: one Arrow Gram pass + bounded-frame
    # power iteration
    pc = pca_power_top(emb, "embedding", rounds=6).collect()[0]
    print(f"top eigenvalue: {pc['eigenvalue']:.2f}")

    # 4. train a stump on train folds, evaluate on the held-out fold
    train = folded.filter(F.col("fold") != 0).select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        (F.col("o_orderpriority") == "1-URGENT").cast("int").alias("y"),
    )
    test = folded.filter(F.col("fold") == 0).select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        (F.col("o_orderpriority") == "1-URGENT").cast("int").alias("y"),
    )
    s = decision_stump(train, "cents", "y").collect()[0]
    pred_left = int(s["pos_left"] * s["n_right"] > s["pos_right"] * s["n_left"])
    scored = test.withColumn(
        "p",
        F.when(F.col("cents") <= s["split_value"], F.lit(pred_left))
        .otherwise(F.lit(1 - pred_left)),
    )
    acc = scored.agg(
        F.avg((F.col("p") == F.col("y")).cast("double")).alias("a")
    ).collect()[0]["a"]
    base = test.agg(F.avg(F.col("y").cast("double")).alias("r")).collect()[0]["r"]
    print(
        f"stump split at {s['split_value']} -> held-out accuracy {acc:.3f} "
        f"(positive rate {base:.3f}; the synthetic target is noise, so a "
        f"weak learner hovers at the base rates)"
    )

    # 5. hard negatives: nearest different-label embedding per anchor
    q = F.transform(
        F.col("embedding"), lambda x: F.round(x.cast("double") * 1000).cast("long")
    )
    e = emb.select("vec_id", "label", q.alias("q"))
    anchors = e.orderBy("vec_id").limit(4).select(
        F.col("vec_id").alias("a_id"), F.col("label").alias("a_label"),
        F.col("q").alias("a_q"),
    )
    d2 = F.aggregate(
        F.zip_with("a_q", "q", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"), lambda acc, x: acc + x,
    )
    hn = (
        e.crossJoin(F.broadcast(anchors))
        .filter(F.col("label") != F.col("a_label"))
        .withColumn("d2", d2)
        .groupBy("a_id")
        .agg(F.min(F.struct("d2", "vec_id")).alias("b"))
        .selectExpr("a_id", "b.vec_id AS neg_id", "b.d2 AS dist2")
    )
    print("hard negatives:", sorted(map(tuple, hn.collect())))

    # 6. multiple regression by exact normal equations
    feats = li.select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
        F.round(F.col("l_quantity")).cast("long").alias("x1"),
        F.round(F.col("l_discount") * 100).cast("long").alias("x2"),
    )
    beta = ols_two_features(feats, "y", "x1", "x2").collect()[0]
    print(
        f"price ~ {beta['b0']:.1f} + {beta['b1']:.1f}*qty + {beta['b2']:.1f}*disc"
    )

    # bonus: robust location for the price column
    tm = trimmed_mean(feats, "y", trim_pct=5).collect()[0]
    print(f"trimmed mean price cents: {tm['mean']:.1f} over {tm['n_kept']} rows")

    spark.stop()


if __name__ == "__main__":
    main()
