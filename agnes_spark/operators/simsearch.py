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
    max_queries: int | None = 10_000,
) -> DataFrame:
    """Exact top-k by cosine — ORACLE / SMALL-QUERY-SET ONLY.

    Broadcast queries x corpus, windowed top-k per query (rank on raw
    double score, deterministic id tie-break). Cost is |Q| * |corpus|
    dot products via a BroadcastNestedLoopJoin — by construction, not
    by accident: this IS the exact all-pairs baseline the ANN recall
    gates (check_lsh_scores_exact, check_ivf_autotuned_recall) compare
    against, and exactly what an IVF probe does per cell. Never point
    it at a large query set — use `IvfIndex.topk` / `lsh_topk` there.
    `max_queries` (default 10k) enforces that: the call fails fast if
    the query side exceeds it; pass None only when you mean it.
    """
    if max_queries is not None:
        n_q = queries.limit(max_queries + 1).count()
        if n_q > max_queries:
            raise ValueError(
                f"brute_force_topk: query side has > {max_queries} rows — "
                "this is an exact all-pairs oracle (BroadcastNestedLoopJoin); "
                "use IvfIndex.topk or lsh_topk for large query sets, or pass "
                "max_queries=None to override"
            )
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
        max_train_rows: int = 100_000,
    ) -> "IvfIndex":
        """Train KMeans on a bounded sample, assign EVERY corpus row.

        Training is the iterative part: k-means|| init plus max_iter
        full passes. Re-reading a 100 TB corpus 11+ times for centroids
        that converge on any large sample is the classic IVF-build
        mistake — every production ANN index (FAISS et al.) trains on
        a subsample. `max_train_rows` caps the training set via a
        per-ROW hash filter on the id — pmod(xxhash64(id, seed), M) —
        which, unlike DataFrame.sample (seeded per-PARTITION, so the
        selected rows change with input layout), picks the same rows
        whatever the partitioning: centroids and every downstream
        IVF/dedup output are reproducible across repartitions. The
        single full-corpus pass that remains is the cell assignment.
        Cells stay balanced because the hash is uniform over ids.
        """
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        c = corpus.select(
            F.col(corpus_id).alias("n_id"), vec_double(F.col(vec_col)).alias("n_v")
        ).withColumn("n_norm", l2_norm(F.col("n_v")))
        # cache the feature frame: training (on the sample) + the final
        # assignment pass both re-read it — without the cache each pass
        # re-runs the parquet scan and the array->vector conversion
        feat = c.withColumn("features", array_to_vector("n_v")).persist()
        n = feat.count()  # also materializes the cache before training
        if n > max_train_rows:
            _M = 1_000_000
            thresh = int(_M * max_train_rows / n)
            train = feat.filter(
                F.pmod(F.xxhash64("n_id", F.lit(seed)), F.lit(_M)) < thresh
            )
        else:
            train = feat
        # canonicalize the training layout: the row SELECTION above is
        # layout-independent, but KMeans training itself is not —
        # k-means|| init draws with a per-partition seeded RNG, so
        # partition contents/order leak into the centroids. Hash-
        # repartition by id + sort within partitions gives every input
        # layout the same partitioning, so (seed -> centroids) is a
        # pure function of the corpus content. The extra shuffle moves
        # only the bounded training set.
        train = train.repartition(32, "n_id").sortWithinPartitions("n_id")
        # random init: k-means|| init dominates build time at larger k
        # (5.4s vs 1.5s fit at k=80/sf0.1) with no quality edge here —
        # cells only need rough locality for blocking/probing, every
        # emitted pair is exact-verified downstream, and recall gates
        # (check_embedding_auto_recall, check_ivf_autotuned_recall) pin
        # the floor. Deterministic: init draws on the canonicalized
        # layout above with a fixed seed.
        model = KMeans(k=n_cells, seed=seed, maxIter=max_iter, initMode="random").fit(train)
        assigned = (
            model.transform(feat)
            .select("n_id", "n_v", "n_norm", F.col("prediction").alias("cell"))
            .repartition("cell")
            .persist()
        )
        assigned.count()  # materialize before dropping the feature cache
        # truncate lineage: catalog.clearCache() (bench/gate isolation)
        # unpersists SQL-cached frames, and WITHOUT this every reuse
        # after it replays scan + vector-conversion + model.transform;
        # localCheckpoint blocks live at the RDD layer, which
        # clearCache does not touch. Local-mode/driver-lifetime only —
        # cluster deployments persist via save()/load() instead.
        assigned = assigned.localCheckpoint()
        feat.unpersist()
        ctrs = model.clusterCenters()
        # a degenerate build (KMeans collapsing to <2 cells) would make
        # every cell-equi consumer silently return empty/garbage — the
        # condition-less broadcast join in embedding_dedup_auto yields
        # zero pairs instead of erroring (ADVICE r3). Fail loudly here.
        if len(ctrs) < 2:
            raise ValueError(
                f"IvfIndex.build: degenerate index — KMeans produced "
                f"{len(ctrs)} cell(s) (requested {n_cells}); need >= 2"
            )
        centers = corpus.sparkSession.createDataFrame(
            [(i, [float(x) for x in ctr]) for i, ctr in enumerate(ctrs)],
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

    def save(self, path: str) -> None:
        """Persist the built index to parquet so it survives sessions:
        `<path>/assigned` holds the cell-partitioned corpus rows (at
        100 TB this is the expensive artifact — KMeans training plus a
        full corpus pass — rebuilt never, reloaded per query batch),
        `<path>/centers` the tiny centroid table."""
        self.assigned.write.mode("overwrite").partitionBy("cell").parquet(
            path + "/assigned"
        )
        self.centers.write.mode("overwrite").parquet(path + "/centers")

    @classmethod
    def load(cls, spark, path: str) -> "IvfIndex":
        """Reload a saved index — no KMeans retrain, no corpus re-scan
        beyond the parquet read. Partition pruning on `cell` means a
        probe touches only the probed cells' files."""
        assigned = (
            spark.read.parquet(path + "/assigned")
            .select("n_id", "n_v", "n_norm", "cell")
            .repartition("cell")
            .persist()
        )
        centers = spark.read.parquet(path + "/centers")
        return cls(assigned, centers, centers.count())

    def autotune_n_probe(
        self,
        queries: DataFrame,
        query_id: str,
        vec_col: str = "embedding",
        k: int = 5,
        target_recall: float = 0.9,
    ) -> tuple[int, dict[int, float]]:
        """Smallest n_probe whose recall@k vs exact search meets
        `target_recall`, plus the full recall curve.

        ONE distributed plan measures every n_probe value at once: for
        each (query, true-neighbor) pair from exact top-k, find the
        probe rank of the neighbor's cell for that query; the recall
        curve is the cumulative distribution of those ranks. No
        per-n_probe loop, no repeated scoring. At 100 TB run this on a
        query SAMPLE — cost is one brute-force pass over the corpus for
        the sampled queries (the same cost as validating recall at all).
        """
        q = queries.select(
            F.col(query_id).alias("q_id"), vec_double(F.col(vec_col)).alias("q_v")
        ).withColumn("q_norm", l2_norm(F.col("q_v")))
        # exact ground truth straight off the assigned corpus rows
        truth = (
            self.assigned.join(F.broadcast(q), on=F.col("q_id") != F.col("n_id"))
            .withColumn(
                "cos",
                dot(F.col("q_v"), F.col("n_v")) / (F.col("q_norm") * F.col("n_norm")),
            )
            .withColumn(
                "rank",
                F.row_number().over(
                    Window.partitionBy("q_id").orderBy(
                        F.col("cos").desc(), F.col("n_id").asc()
                    )
                ),
            )
            .filter(F.col("rank") <= k)
            .select("q_id", "n_id")
        )
        # probe rank of every cell for every query (cells are few)
        d2 = F.aggregate(
            F.zip_with(F.col("q_v"), F.col("ctr"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        wp = Window.partitionBy("q_id").orderBy(F.col("d2").asc(), F.col("cell").asc())
        probe_rank = (
            q.crossJoin(F.broadcast(self.centers))
            .withColumn("d2", d2)
            .withColumn("pr", F.row_number().over(wp))
            .select("q_id", "cell", "pr")
        )
        neighbor_cell = self.assigned.select("n_id", "cell")
        ranks = (
            truth.join(neighbor_cell, "n_id")
            .join(probe_rank, ["q_id", "cell"])
            .groupBy("pr")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("pr")
            .collect()  # <= n_cells rows
        )
        total = sum(r["n"] for r in ranks)
        curve: dict[int, float] = {}
        cum = 0
        best = self.n_cells
        for r in ranks:
            cum += r["n"]
            curve[r["pr"]] = cum / total
        # curve has gaps where no neighbor lands at that probe rank —
        # recall at pr is the last cum value at or below pr; fill ALL
        # ranks (the curve is the promised deliverable, `best` is just
        # the first rank meeting the target)
        rec = 0.0
        for pr in range(1, self.n_cells + 1):
            rec = curve.get(pr, rec)
            curve[pr] = rec
            if rec >= target_recall and best > pr:
                best = pr
        return best, curve

    def unpersist(self) -> None:
        self.assigned.unpersist()


# Built indexes for repeated ivf_topk calls over one corpus, keyed by
# (spark app id, caller cache key, id col, vec col, n_cells, max_iter,
# seed) — the in-process twin of IvfIndex.save/load, same contract as
# dedup._AUTO_INDEX_CACHE (training dominates the one-shot cost).
_IVF_TOPK_CACHE: dict[tuple, "IvfIndex"] = {}


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
    cache_key: str | None = None,
) -> DataFrame:
    """One-shot IVF-flat approximate top-k: build the index, probe it.
    Reuse `IvfIndex.build(...)` directly when serving many query
    batches against one corpus. Recall/cost dial: n_probe/n_cells.

    `cache_key`: opt-in reuse of the built index across calls in one
    process (pass a corpus identifier, e.g. its path); safe because the
    build is deterministic and layout-independent — skip it when the
    corpus content can change between calls under the same key.

    Non-SQL-expressible (iterative training) — rows-only gate check;
    tests pin recall against brute_force_topk.
    """
    key = None
    if cache_key is not None:
        key = (
            corpus.sparkSession.sparkContext.applicationId,
            cache_key, corpus_id, vec_col, n_cells, max_iter, seed,
        )
        index = _IVF_TOPK_CACHE.get(key)
        if index is not None:
            # re-mark after any spark.catalog.clearCache() (see
            # embedding_dedup_auto); training is not redone either way
            index.assigned.persist()
            return index.topk(queries, query_id, vec_col=vec_col, k=k, n_probe=n_probe)
    index = IvfIndex.build(
        corpus, corpus_id, vec_col, n_cells=n_cells, max_iter=max_iter, seed=seed
    )
    if key is not None:
        _IVF_TOPK_CACHE[key] = index
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
