"""Embedding-column analytics (beyond similarity search): per-group
vector aggregation.

`label_centroids` is the building block for cluster summaries, class
prototypes, and drift monitoring over an embedding corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from agnes_spark.functions import vec_double


def label_centroids(
    df: DataFrame,
    label_col: str,
    vec_col: str = "embedding",
) -> DataFrame:
    """Element-wise mean vector per label: (label, n_vecs, centroid).

    posexplode -> groupBy(label, dim) -> avg -> reassemble in dim order.
    Two shuffles, both on (label[, dim]) — the explode multiplies rows
    by the dimension count but each row is 16 bytes, so the shuffled
    volume equals the raw vector data; no Python, no collect. At 100 TB
    partial aggregation collapses each map partition to
    |labels| x dims rows before the shuffle.
    """
    exploded = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(vec_double(F.col(vec_col))).alias("dim", "val"),
    )
    per_dim = exploded.groupBy("label", "dim").agg(
        F.avg("val").alias("m"), F.count(F.lit(1)).alias("n")
    )
    return (
        per_dim.groupBy("label")
        .agg(
            F.max("n").alias("n_vecs"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "m"))),
                lambda s: F.round(s["m"], 6),
            ).alias("centroid"),
        )
        .select("label", "n_vecs", "centroid")
    )
