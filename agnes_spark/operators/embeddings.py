"""Embedding-column analytics (beyond similarity search): per-group
vector aggregation.

`label_centroids` is the building block for cluster summaries, class
prototypes, and drift monitoring over an embedding corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from agnes_spark.functions import vec_double


def _per_dim_means(df: DataFrame, label_col: str, vec_col: str) -> DataFrame:
    """posexplode -> groupBy(label, dim) -> avg. The explode multiplies
    rows by the dimension count but each row is 16 bytes, so the
    shuffled volume equals the raw vector data; no Python, no collect.
    At 100 TB partial aggregation collapses each map partition to
    |labels| x dims rows before the shuffle."""
    exploded = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(vec_double(F.col(vec_col))).alias("dim", "val"),
    )
    return exploded.groupBy("label", "dim").agg(
        F.avg("val").alias("m"), F.count(F.lit(1)).alias("n")
    )


def label_centroids(
    df: DataFrame,
    label_col: str,
    vec_col: str = "embedding",
) -> DataFrame:
    """Element-wise mean vector per label: (label, n_vecs, centroid
    array<double>) — reassembled in dim order for downstream vector use."""
    per_dim = _per_dim_means(df, label_col, vec_col)
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


def quantize_embeddings(
    df: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    out_col: str = "q_vec",
    scale_col: str = "q_scale",
) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization: scale =
    max|v|/127, q_i = round(v_i/scale) in [-127, 127]. At 100 TB this
    is the storage/bandwidth lever for ANN serving — 4x smaller than
    float32 (8x vs the double compute form), and the dot product of two
    int8 vectors reconstructs cosine to ~1e-2 after multiplying the two
    scales back on. Pure Column expressions (transform/array_max), no
    Python; an all-zero vector gets scale 1.0 and quantizes to zeros.
    """
    v = vec_double(F.col(vec_col))
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = F.when(amax > 0, amax / F.lit(127.0)).otherwise(F.lit(1.0))
    return df.withColumn(scale_col, scale).withColumn(
        out_col,
        F.transform(v, lambda x: F.round(x / F.col(scale_col)).cast("tinyint")),
    )


def dequantize_embeddings(
    df: DataFrame,
    q_col: str = "q_vec",
    scale_col: str = "q_scale",
    out_col: str = "embedding",
) -> DataFrame:
    """Inverse of quantize_embeddings: v_i ≈ q_i * scale (array<double>)."""
    return df.withColumn(
        out_col,
        F.transform(F.col(q_col), lambda q: q.cast("double") * F.col(scale_col)),
    )


def label_centroids_long(
    df: DataFrame,
    label_col: str,
    vec_col: str = "embedding",
) -> DataFrame:
    """Long-format centroids: one row per (label, dim) with the mean and
    the vector count. Cheaper than the array form (one shuffle, no
    collect_list) and emits only scalar columns — the shape the driver's
    canonicalizer (and any SQL consumer) can hash."""
    per_dim = _per_dim_means(df, label_col, vec_col)
    return per_dim.select(
        "label",
        "dim",
        F.round(F.col("m"), 6).alias("val"),
        F.col("n").alias("n_vecs"),
    )


def quantize_embeddings_floor(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "q_vec",
) -> DataFrame:
    """Symmetric int8-range quantization with FLOOR instead of round:
    q_i = floor(v_i * 127 / max|v|) in [-127, 127]. Same storage
    lever as quantize_embeddings, but floor on doubles is a pure IEEE
    operation with no decimal-representation ambiguity — two engines
    computing the identical double floor to the identical integer,
    which makes downstream exact-integer kernels (gram_matrix_int)
    hash-verifiable cross-engine. round()'s half-up boundary is
    engine-dependent (BigDecimal shortest-repr vs raw binary), which
    is why the round-based quantizer's gate is recall-twinned instead.
    All-zero vectors quantize to zeros."""
    v = vec_double(F.col(vec_col))
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    return df.withColumn(
        out_col,
        F.when(
            amax > 0,
            F.transform(
                v, lambda x: F.floor(x * F.lit(127.0) / amax).cast("long")
            ),
        ).otherwise(F.transform(v, lambda x: F.lit(0).cast("long"))),
    )


def gram_matrix_int(df: DataFrame, q_col: str = "q_vec") -> DataFrame:
    """Exact integer Gram matrix G = sum over rows of q q^T for an
    integer-vector column — the distributed heavy half of PCA/whitening
    /covariance pipelines (the d x d eigen step that follows is a
    driver-trivial O(d^3)). Returns the upper triangle as (i, j, g)
    with 0-based dims, i <= j, g an exact BIGINT.

    Scale shape: ONE mapInPandas pass computes a d x d int64 partial
    per Arrow batch (numpy matmul — d^2 cells, thousands of times
    smaller than the batch), then a tiny groupBy sums partials; the
    shuffle is d(d+1)/2 rows per partition regardless of data size.
    int64-exact while N * (127^2) fits — ~5e14 rows at int8 range.
    """
    import pandas as pd

    def part(batches):
        import numpy as np

        acc = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.asarray(pdf[q_col].tolist(), dtype=np.int64)
            g = mat.T @ mat
            acc = g if acc is None else acc + g
        if acc is not None:
            iu = np.triu_indices(acc.shape[0])
            yield pd.DataFrame(
                {"i": iu[0].astype("int32"), "j": iu[1].astype("int32"), "g": acc[iu]}
            )

    return (
        df.select(q_col)
        .mapInPandas(part, "i int, j int, g long")
        .groupBy("i", "j")
        .agg(F.sum("g").cast("long").alias("g"))
    )
