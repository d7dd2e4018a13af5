"""Incremental (delta-shard) dedup: equivalence with the one-shot
operators restricted to the delta, and the bucketed-store scan shape."""

from pyspark.sql import functions as F

from agnes_spark.operators.dedup import exact_dedup, minhash_lsh_pairs
from agnes_spark.operators.dedup_incremental import (
    exact_hash_store,
    incremental_exact_new,
    incremental_minhash_pairs,
    minhash_state,
    write_exact_store,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _split(docs):
    return (
        docs.filter(F.col("doc_id") % 10 != 0),
        docs.filter(F.col("doc_id") % 10 == 0),
    )


def test_incremental_exact_matches_full_restriction(spark, sf_dir):
    """New-content ids from the incremental path == keepers of the full
    (corpus ∪ delta) dedup that are delta rows (a keeper from the delta
    means no corpus or earlier-delta row had that content)."""
    docs = _docs(spark, sf_dir)
    corpus, delta = _split(docs)
    store = exact_hash_store(corpus, "doc_id", "text")
    got = {
        r.doc_id
        for r in incremental_exact_new(delta, store, "doc_id", "text").collect()
    }
    full_keepers = {
        r.keep_id
        for r in exact_dedup(docs, "doc_id", "text").collect()
        if r.keep_id % 10 == 0
    }
    assert got == full_keepers
    assert got  # scenario must actually exercise the path


def test_incremental_exact_bucketed_store_scan(spark, sf_dir, tmp_path):
    """The persisted store is a bucketed table: the anti-join plan must
    read it bucketed (store side never reshuffles)."""
    corpus, delta = _split(_docs(spark, sf_dir))
    write_exact_store(
        exact_hash_store(corpus, "doc_id", "text"),
        "agnes_hash_store_test",
        path=str(tmp_path / "store"),
    )
    store = spark.table("agnes_hash_store_test")
    out = incremental_exact_new(delta, store, "doc_id", "text")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan
    assert out.count() > 0


def test_incremental_embedding_no_false_pos_and_recall(spark, sf_dir):
    """Delta-vs-corpus-state embedding pairs: every emitted pair is a
    true near-dup (exact verify), and the corpus-trained 2-nearest cell
    blocking recovers most exhaustive pairs involving the delta."""
    import numpy as np

    from agnes_spark.operators.dedup_incremental import (
        embedding_cell_store,
        incremental_embedding_pairs,
    )
    from agnes_spark.operators.simsearch import IvfIndex

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    delta = emb.filter(F.col("vec_id") % 10 == 0)
    index = IvfIndex.build(corpus, "vec_id", "embedding", n_cells=4, max_iter=4)
    got = {
        (r.a_id, r.b_id)
        for r in incremental_embedding_pairs(
            delta, index.centers, embedding_cell_store(index),
            "vec_id", "embedding", threshold=0.35,
        ).collect()
    }
    index.unpersist()
    rows = emb.collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
    ids = sorted(vecs)
    mat = np.stack([vecs[i] / np.linalg.norm(vecs[i]) for i in ids])
    sims = mat @ mat.T
    exact = {
        (ids[i], ids[j])
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if sims[i, j] >= 0.35 and (ids[i] % 10 == 0 or ids[j] % 10 == 0)
    }
    assert got <= exact  # exact cosine verify: no false positives
    assert exact and len(got & exact) / len(exact) >= 0.5  # blocking recall


def test_incremental_minhash_parity_with_full(spark, sf_dir):
    """Incremental minhash pairs (delta probed against persisted corpus
    band index + shingle table) == full-run pairs involving the delta."""
    docs = _docs(spark, sf_dir)
    corpus, delta = _split(docs)
    bands, shingles = minhash_state(corpus, "doc_id", "text")
    inc = {
        (r.a_id, r.b_id, r.jaccard)
        for r in incremental_minhash_pairs(
            delta, bands, shingles, "doc_id", "text", threshold=0.5
        ).collect()
    }
    full = {
        (r.a_id, r.b_id, r.jaccard)
        for r in minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5).collect()
        if r.a_id % 10 == 0 or r.b_id % 10 == 0
    }
    assert inc == full
    assert inc  # the synthetic docs contain planted near-dups


def test_incremental_minhash_sets_only_path_matches(spark, sf_dir):
    """Passing precomputed `sets` WITHOUT `banded` (the r12-advice
    path: the band frame is then derived AND persisted internally)
    yields bit-identical pairs to the all-derived call."""
    from agnes_spark.operators.dedup import shingle_sets

    docs = _docs(spark, sf_dir)
    corpus, delta = _split(docs)
    bands, shingles = minhash_state(corpus, "doc_id", "text")
    base = incremental_minhash_pairs(
        delta, bands, shingles, "doc_id", "text", threshold=0.5
    )
    pre_sets = shingle_sets(delta, "doc_id", "text", 3).persist()
    via_sets = incremental_minhash_pairs(
        delta,
        bands,
        shingles,
        "doc_id",
        "text",
        threshold=0.5,
        sets=pre_sets,
    )
    rows = lambda df: {(r.a_id, r.b_id, r.jaccard) for r in df.collect()}
    assert rows(via_sets) == rows(base)
