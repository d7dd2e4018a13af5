"""Similarity search over embedding columns.

Baseline: brute-force cosine top-k (exact — the correctness oracle).
Scale path: random-hyperplane LSH bucketing so each query only scores
its bucket's candidates; multi-probe keeps recall up.

Both paths keep the score computation JVM-side (zip_with/aggregate
dot products); queries are broadcast (they are small by definition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from agnes_spark.functions import dot, l2_norm, vec_double


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k by cosine: broadcast queries x corpus, windowed
    top-k per query (rank on raw double score, deterministic id
    tie-break). Cost is |Q| * |corpus| dot products, all codegen'd —
    the right baseline, and exactly what an IVF probe does per cell.
    """
    # norms are per-ROW, computed once before the pair join — inside
    # the join each pair costs one dot product, not dot + two norms
    # (the norm expression is identical, so cos is bit-stable)
    q = queries.select(
        F.col(query_id).alias("q_id"), vec_double(F.col(vec_col)).alias("q_v")
    ).withColumn("q_norm", l2_norm(F.col("q_v")))
    c = corpus.select(
        F.col(corpus_id).alias("n_id"), vec_double(F.col(vec_col)).alias("n_v")
    ).withColumn("n_norm", l2_norm(F.col("n_v")))
    scored = (
        c.join(F.broadcast(q), on=F.col("q_id") != F.col("n_id"))
        .withColumn(
            "cos", dot(F.col("q_v"), F.col("n_v")) / (F.col("q_norm") * F.col("n_norm"))
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "n_id", F.round("cos", 6).alias("cos"))
    )


class IvfIndex:
    """A built IVF-flat index: corpus rows assigned to KMeans cells
    (hash-partitioned by cell, persisted) + the centroid table.

    Build once, serve many query batches — at 100 TB the (cell -> rows)
    layout is written to a bucketed table and every query batch is an
    equi-join on cell id. `topk` is that join + exact rerank.
    """

    def __init__(self, assigned: DataFrame, centers: DataFrame, n_cells: int):
        self.assigned = assigned
        self.centers = centers
        self.n_cells = n_cells

    @classmethod
    def build(
        cls,
        corpus: DataFrame,
        corpus_id: str,
        vec_col: str = "embedding",
        n_cells: int = 16,
        max_iter: int = 10,
        seed: int = 42,
    ) -> "IvfIndex":
        """Train KMeans (the iterative part — at 100 TB train on a
        sample) and assign every corpus row to its cell."""
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        c = corpus.select(
            F.col(corpus_id).alias("n_id"), vec_double(F.col(vec_col)).alias("n_v")
        ).withColumn("n_norm", l2_norm(F.col("n_v")))
        feat = c.withColumn("features", array_to_vector("n_v"))
        model = KMeans(k=n_cells, seed=seed, maxIter=max_iter).fit(feat)
        assigned = (
            model.transform(feat)
            .select("n_id", "n_v", "n_norm", F.col("prediction").alias("cell"))
            .repartition("cell")
            .persist()
        )
        centers = corpus.sparkSession.createDataFrame(
            [(i, [float(x) for x in ctr]) for i, ctr in enumerate(model.clusterCenters())],
            "cell int, ctr array<double>",
        )
        return cls(assigned, centers, n_cells)

    def topk(
        self,
        queries: DataFrame,
        query_id: str,
        vec_col: str = "embedding",
        k: int = 5,
        n_probe: int = 3,
    ) -> DataFrame:
        """Probe each query's n_probe nearest cells, exact rerank."""
        q = queries.select(
            F.col(query_id).alias("q_id"), vec_double(F.col(vec_col)).alias("q_v")
        ).withColumn("q_norm", l2_norm(F.col("q_v")))
        d2 = F.aggregate(
            F.zip_with(F.col("q_v"), F.col("ctr"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        wp = Window.partitionBy("q_id").orderBy(F.col("d2").asc(), F.col("cell").asc())
        probes = (
            q.crossJoin(F.broadcast(self.centers))
            .withColumn("d2", d2)
            .withColumn("pr", F.row_number().over(wp))
            .filter(F.col("pr") <= n_probe)
            .select("q_id", "q_v", "q_norm", "cell")
        )
        scored = (
            self.assigned.join(F.broadcast(probes), on="cell")
            .filter(F.col("q_id") != F.col("n_id"))
            .withColumn(
                "cos",
                dot(F.col("q_v"), F.col("n_v")) / (F.col("q_norm") * F.col("n_norm")),
            )
        )
        w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "rank", "n_id", F.round("cos", 6).alias("cos"))
        )

    def unpersist(self) -> None:
        self.assigned.unpersist()


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 3,
    max_iter: int = 10,
    seed: int = 42,
) -> DataFrame:
    """One-shot IVF-flat approximate top-k: build the index, probe it.
    Reuse `IvfIndex.build(...)` directly when serving many query
    batches against one corpus. Recall/cost dial: n_probe/n_cells.

    Non-SQL-expressible (iterative training) — rows-only gate check;
    tests pin recall against brute_force_topk.
    """
    index = IvfIndex.build(
        corpus, corpus_id, vec_col, n_cells=n_cells, max_iter=max_iter, seed=seed
    )
    return index.topk(queries, query_id, vec_col=vec_col, k=k, n_probe=n_probe)


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane: component j is
    +-1 from a splitmix-style integer hash of (plane_idx, j). Fixed by
    construction — every executor and every run derives the same planes
    (no driver-side RNG state to broadcast)."""
    comps = []
    for j in range(dim):
        x = (plane_idx * 0x9E3779B97F4A7C15 + j * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 31
        x = (x * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        comps.append(1.0 if (x >> 32) & 1 else -1.0)
    return comps


def lsh_bucket(vec_col, dim: int, num_planes: int = 12):
    """Sign-bit bucket id (int) of an array<double> column under
    `num_planes` fixed random hyperplanes."""
    bucket = F.lit(0)
    for p in range(num_planes):
        plane = F.array(*[F.lit(c) for c in _hyperplane(dim, p)])
        bit = F.when(dot(vec_col, plane) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket * 2 + bit
    return bucket


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 5,
    num_planes: int = 8,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors sharing the query's
    hyperplane-sign bucket (equi-join on bucket id), exact rerank inside.

    At 100 TB the corpus is hash-partitioned by bucket once and reused;
    recall is tuned by num_planes (fewer planes => bigger buckets =>
    higher recall, more compute). Multi-probe (default): each query
    also probes every single-bit-flip neighbor bucket — (p+1)x probe
    cost on the tiny query side only, large recall gain when neighbors
    straddle a hyperplane.
    """
    q = queries.select(
        F.col(query_id).alias("q_id"), vec_double(F.col(vec_col)).alias("q_v")
    ).withColumn("q_norm", l2_norm(F.col("q_v"))).withColumn(
        "bucket", lsh_bucket(F.col("q_v"), dim, num_planes)
    )
    if multiprobe:
        q = q.withColumn(
            "bucket",
            F.explode(
                F.array(
                    F.col("bucket"),
                    *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(num_planes)],
                )
            ),
        )
    c = corpus.select(
        F.col(corpus_id).alias("n_id"), vec_double(F.col(vec_col)).alias("n_v")
    ).withColumn("n_norm", l2_norm(F.col("n_v"))).withColumn(
        "bucket", lsh_bucket(F.col("n_v"), dim, num_planes)
    )
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn(
            "cos", dot(F.col("q_v"), F.col("n_v")) / (F.col("q_norm") * F.col("n_norm"))
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "n_id", F.round("cos", 6).alias("cos"))
    )
