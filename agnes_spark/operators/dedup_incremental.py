"""Incremental (delta-shard) deduplication against persisted corpus state.

The 100 TB pattern the one-shot dedup operators don't cover: the
corpus was deduped once; every new shard arriving after that must be
deduped against it WITHOUT rescanning corpus text. Dedup state lives
in compact, joinable stores, and per-shard cost is O(|delta|) plus
bucket-local lookups into the store:

- exact: a content-hash store — one (sha256, keeper id) row per
  distinct content — written BUCKETED by hash (write_bucketed), so
  the shard's anti-join never reshuffles the store side; only the
  delta's hashes move.
- near-dup (MinHash): two stores — the band-bucket index
  (band, bucket, id) and the shingle-set table (id, shash). A shard
  computes its own bands, equi-joins the band index for candidate
  corpus ids, then verifies exact Jaccard against only those ids'
  shingle rows. Both joins are equi; nothing touches corpus text.

Correctness contract (gated): incremental output == the one-shot
operator run over (corpus ∪ delta), restricted to rows/pairs that
involve the delta. Holds exactly because candidate generation and
verification reuse the same shingle/band/hash code paths
(dedup.shingle_sets / dedup.minhash_bands).

Reference: agnes has no incremental dedup (its FUTURE.md lists
streaming as future work); semantics here are defined by the
restriction contract above, same as operators/incremental.py does for
rollups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from agnes_spark.operators.dedup import (
    minhash_bands,
    minhash_lsh_pairs_from_sets,
    shingle_sets,
    two_nearest_cells,
)


def exact_hash_store(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(content_hash, keep_id): one row per distinct content — the
    whole exact-dedup state, 40ish bytes per distinct doc."""
    return (
        df.select(F.sha2(F.col(text_col), 256).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"))
    )


def write_exact_store(
    store: DataFrame, table_name: str, path: str | None = None, num_buckets: int = 32
) -> None:
    """Persist the hash store bucketed by content_hash: every future
    shard's anti-join reads co-located buckets instead of reshuffling
    the (corpus-sized) store. At 100 TB this asymmetry IS the feature —
    the store is written once, shards only ever bucket-probe it."""
    from agnes_spark.operators.partitioning import write_bucketed

    write_bucketed(store, table_name, ["content_hash"], num_buckets, path=path)


def incremental_exact_new(
    delta: DataFrame, store: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Delta rows with genuinely NEW content: first occurrence (min id)
    of their hash within the delta, and hash absent from the store.
    Returns (id, content_hash) — exactly the rows to append to the
    store after the shard is accepted."""
    h = delta.select(
        F.col(id_col), F.sha2(F.col(text_col), 256).alias("content_hash")
    )
    first_in_delta = h.groupBy("content_hash").agg(F.min(id_col).alias(id_col))
    return first_in_delta.join(
        store.select("content_hash"), "content_hash", "left_anti"
    ).select(id_col, "content_hash")


def minhash_state(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_perm: int = 64,
    num_bands: int = 16,
) -> tuple[DataFrame, DataFrame]:
    """Build the near-dup state for a corpus: (band index, shingle
    table). Persist both with write.parquet / write_bucketed; the band
    index is what shards probe, the shingle table is what verification
    reads (candidate ids only)."""
    base = shingle_sets(df, id_col, text_col, n)
    bands = minhash_bands(base, id_col, num_perm, num_bands)
    return bands, base


def incremental_minhash_pairs(
    delta: DataFrame,
    corpus_bands: DataFrame,
    corpus_shingles: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_perm: int = 64,
    num_bands: int = 16,
    threshold: float = 0.5,
    sets: DataFrame | None = None,
    banded: DataFrame | None = None,
) -> DataFrame:
    """All verified near-dup pairs involving the delta: delta-vs-corpus
    via the persisted band index, plus delta-internal via the one-shot
    operator on the (small) delta alone. Output (a_id, b_id, jaccard)
    with a_id < b_id — the same orientation as minhash_lsh_pairs, so
    the parity gate's comparison is a plain anti-join.

    `sets` / `banded` optionally supply the delta's (id, shash) shingle
    frame and its (id, band, bucket) band keys when the caller already
    computed them (the streaming ingest sink shingles and bands each
    micro-batch exactly ONCE for probe, intra-batch pairs, and the
    state append — previously the batch text was re-shingled for each
    of the three); absent, both are derived here as before. The frames
    must come from `shingle_sets` / `minhash_bands` with the same
    parameters, so reuse cannot change any result — both stages are
    deterministic functions of the batch."""
    d_base = sets if sets is not None else shingle_sets(
        delta, id_col, text_col, n
    ).persist()
    # A locally derived band frame is consumed three times (corpus
    # probe join + both sides of the LSH self-join inside
    # minhash_lsh_pairs_from_sets): persist it, or the MinHash
    # signature UDF re-runs per consumer — the exact recomputation the
    # sets/banded pass-through exists to avoid (the streaming sink
    # passes both, so only direct callers hit this path).
    d_banded = (
        banded
        if banded is not None
        else minhash_bands(d_base, id_col, num_perm, num_bands).persist()
    )
    c_bands = corpus_bands.select(
        F.col(id_col).alias("c_id"), "band", "bucket"
    )
    cand = (
        d_banded.select(F.col(id_col).alias("d_id"), "band", "bucket")
        .join(c_bands, ["band", "bucket"])
        .select("d_id", "c_id")
        .distinct()
    )
    d_sets = d_base.select(F.col(id_col).alias("d_id"), F.col("shash").alias("d_sh"))
    c_sets = corpus_shingles.select(
        F.col(id_col).alias("c_id"), F.col("shash").alias("c_sh")
    )
    cross = (
        cand.join(d_sets, "d_id")
        .join(c_sets, "c_id")
        .withColumn("inter", F.size(F.array_intersect("d_sh", "c_sh")))
        .withColumn(
            "jaccard",
            F.col("inter") / (F.size("d_sh") + F.size("c_sh") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.least("d_id", "c_id").alias("a_id"),
            F.greatest("d_id", "c_id").alias("b_id"),
            F.round("jaccard", 6).alias("jaccard"),
        )
    )
    intra = minhash_lsh_pairs_from_sets(
        d_base,
        id_col,
        num_perm=num_perm,
        num_bands=num_bands,
        threshold=threshold,
        banded=d_banded,
    ).select("a_id", "b_id", "jaccard")
    # corpus ids and delta ids are disjoint, and intra pairs are
    # delta-delta only, so the union is already duplicate-free
    return cross.unionByName(intra)


def embedding_cell_store(index) -> DataFrame:
    """The persisted near-dup state for embeddings: every corpus vector
    replicated to its TWO nearest cells of a built `IvfIndex` — write
    this (partitioned by cell) next to the index; shards equi-probe it
    by cell, never rescanning corpus vectors."""
    return two_nearest_cells(index.assigned.drop("cell"), index.centers)


def incremental_embedding_pairs(
    delta: DataFrame,
    centers: DataFrame,
    cell_store: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding near-dup pairs involving a NEW shard, against the
    persisted corpus cell store (see `embedding_cell_store`): the shard
    is assigned to its two nearest CORPUS-trained cells, equi-joined to
    the store on cell, exact-cosine verified; shard-internal pairs use
    the same cell blocking. No corpus rescan, no KMeans retrain.

    Unlike the exact/minhash incremental paths this is NOT bit-equal to
    a full re-run: a full run would retrain centroids on corpus ∪ delta
    and may block differently. The invariants that hold (and are gated
    by check_incremental_embedding) are no-false-positives (exact
    verify) and bounded blocking recall vs the exhaustive pairs.
    Output (a_id, b_id, cos) with a_id < b_id."""
    from agnes_spark.functions import dot, l2_norm, vec_double

    d = delta.select(
        F.col(id_col).alias("n_id"), vec_double(F.col(vec_col)).alias("n_v")
    ).withColumn("n_norm", l2_norm(F.col("n_v")))
    d2 = two_nearest_cells(d, centers).persist()
    d_side = d2.select(
        "cell",
        F.col("n_id").alias("d_id"),
        F.col("n_v").alias("d_v"),
        F.col("n_norm").alias("d_n"),
    )
    c_side = cell_store.select(
        "cell",
        F.col("n_id").alias("c_id"),
        F.col("n_v").alias("c_v"),
        F.col("n_norm").alias("c_n"),
    )
    cross = (
        d_side.join(c_side, "cell")
        .withColumn("cos", dot(F.col("d_v"), F.col("c_v")) / (F.col("d_n") * F.col("c_n")))
        .filter(F.col("cos") >= threshold)
        .select(
            F.least("d_id", "c_id").alias("a_id"),
            F.greatest("d_id", "c_id").alias("b_id"),
            F.round("cos", 6).alias("cos"),
        )
        .dropDuplicates(["a_id", "b_id"])
    )
    intra_b = d_side.select(
        "cell",
        F.col("d_id").alias("b_id"),
        F.col("d_v").alias("b_v"),
        F.col("d_n").alias("b_n"),
    )
    intra = (
        d_side.join(intra_b, "cell")
        .filter(F.col("d_id") < F.col("b_id"))
        .withColumn("cos", dot(F.col("d_v"), F.col("b_v")) / (F.col("d_n") * F.col("b_n")))
        .filter(F.col("cos") >= threshold)
        .select(F.col("d_id").alias("a_id"), "b_id", F.round("cos", 6).alias("cos"))
        .dropDuplicates(["a_id", "b_id"])
    )
    # corpus and delta id spaces are disjoint -> no overlap to dedup
    return cross.unionByName(intra)
