"""Dedup operator tests: LSH variants are checked against their exact
counterparts (recall), plus deterministic unit fixtures."""

from pyspark.sql import functions as F

from agnes_spark.operators.dedup import (
    embedding_dedup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from agnes_spark.sources.memory import table


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_exact_dedup_finds_planted_duplicates(spark):
    df = table(
        spark,
        {"doc_id": [1, 2, 3, 4], "text": ["aa bb", "cc dd", "aa bb", "aa bb"]},
        types={"doc_id": "bigint", "text": "string"},
    )
    out = exact_dedup(df, "doc_id", "text").collect()
    by_keep = {r.keep_id: r.n_copies for r in out}
    assert by_keep == {1: 3, 2: 1}


def test_ngram_jaccard_identical_and_disjoint(spark):
    df = table(
        spark,
        {
            "doc_id": [1, 2, 3],
            "text": [
                "a b c d e f",
                "a b c d e f",      # identical -> jaccard 1.0
                "x y z w q r",      # disjoint  -> no pair
            ],
        },
        types={"doc_id": "bigint", "text": "string"},
    )
    out = ngram_jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.5).collect()
    assert [(r.a_id, r.b_id, r.jaccard) for r in out] == [(1, 2, 1.0)]


def test_minhash_lsh_recall_vs_exact(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    exact = {
        (r.a_id, r.b_id)
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", 3, 0.5).collect()
    }
    lsh = {
        (r.a_id, r.b_id)
        for r in minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    # verification step guarantees precision == 1; banding should keep
    # recall high at J >= 0.5 (16 bands x 4 rows)
    assert lsh <= exact or not exact
    if exact:
        assert len(lsh & exact) / len(exact) >= 0.9


def test_simhash_identical_docs_distance_zero(spark):
    df = table(
        spark,
        {"doc_id": [1, 2, 3], "text": ["spark is a fast engine", "spark is a fast engine", "completely different words entirely here now"]},
        types={"doc_id": "bigint", "text": "string"},
    )
    out = simhash_pairs(df, "doc_id", "text", max_hamming=3).collect()
    assert [(r.a_id, r.b_id, r.hamming) for r in out] == [(1, 2, 0)]


def test_embedding_dedup_blocked_pairs(spark):
    df = table(
        spark,
        {
            "vec_id": [1, 2, 3, 4],
            "embedding": [[1.0, 0.0], [1.0, 0.01], [0.0, 1.0], [1.0, 0.0]],
            "label": [0, 0, 0, 1],  # vec 4 blocked away from vec 1
        },
        types={"vec_id": "bigint", "embedding": "array<float>", "label": "int"},
    )
    out = embedding_dedup_pairs(df, "vec_id", "embedding", "label", threshold=0.99).collect()
    assert [(r.a_id, r.b_id) for r in out] == [(1, 2)]


def test_embedding_dedup_auto_recall(spark, sf_dir):
    """Learned (KMeans) blocking recovers most true near-dup pairs
    found by exhaustive all-pairs comparison."""
    import numpy as np

    from agnes_spark.operators.dedup import embedding_dedup_auto

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = emb.collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
    ids = sorted(vecs)
    exact = set()
    mat = np.stack([vecs[i] / np.linalg.norm(vecs[i]) for i in ids])
    sims = mat @ mat.T
    tau = 0.35
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if sims[i, j] >= tau:
                exact.add((ids[i], ids[j]))
    got = {(r.a_id, r.b_id) for r in
           embedding_dedup_auto(emb, "vec_id", threshold=tau, n_cells=4).collect()}
    assert got <= exact or not exact  # no false positives (exact cosine verify)
    if exact:
        assert len(got & exact) / len(exact) >= 0.6  # blocking recall


def test_embedding_dedup_auto_cache_reuses_index(spark, sf_dir):
    """cache_key= reuses the built IvfIndex across calls (no KMeans
    retrain) and yields identical pairs — including after a
    clearCache(), the state bench runs in between queries."""
    from agnes_spark.operators.dedup import _AUTO_INDEX_CACHE, embedding_dedup_auto

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    _AUTO_INDEX_CACHE.clear()
    first = {(r.a_id, r.b_id) for r in embedding_dedup_auto(
        emb, "vec_id", threshold=0.35, n_cells=4, cache_key="t"
    ).collect()}
    assert len(_AUTO_INDEX_CACHE) == 1
    cached_index = next(iter(_AUTO_INDEX_CACHE.values()))
    spark.catalog.clearCache()
    second = {(r.a_id, r.b_id) for r in embedding_dedup_auto(
        emb, "vec_id", threshold=0.35, n_cells=4, cache_key="t"
    ).collect()}
    assert second == first
    assert next(iter(_AUTO_INDEX_CACHE.values())) is cached_index
    _AUTO_INDEX_CACHE.clear()


def test_exact_dedup_keep_best_argmax_and_ties(spark):
    df = table(
        spark,
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": ["aa bb", "aa bb", "aa bb", "cc dd", "cc dd"],
            "score": [0.2, 0.9, 0.9, 0.5, 0.5],
        },
        types={"doc_id": "bigint", "text": "string", "score": "double"},
    )
    from agnes_spark.operators.dedup import exact_dedup_keep_best

    out = exact_dedup_keep_best(df, "doc_id", "text", "score").collect()
    by_keep = {r.keep_id: (r.best_score, r.n_copies) for r in out}
    # highest score wins; score tie -> minimal id (2 over 3, 4 over 5)
    assert by_keep == {2: (0.9, 3), 4: (0.5, 2)}


def test_exact_dedup_kept_keeps_min_id_rows(spark):
    df = table(
        spark,
        {
            "doc_id": [5, 2, 3, 4, 1],
            "text": ["aa bb", "aa bb", "aa bb", "cc dd", "cc dd"],
            "source": ["s5", "s2", "s3", "s4", "s1"],
        },
        types={"doc_id": "bigint", "text": "string", "source": "string"},
    )
    from agnes_spark.operators.dedup import exact_dedup, exact_dedup_kept

    out = {(r.doc_id, r.text, r.source) for r in exact_dedup_kept(df, "doc_id", "text").collect()}
    # minimal id per distinct content, full row carried through
    assert out == {(2, "aa bb", "s2"), (1, "cc dd", "s1")}
    # agrees with the summary form's keeper choice
    keepers = {r.keep_id for r in exact_dedup(df, "doc_id", "text").collect()}
    assert {d for d, _, _ in out} == keepers


def test_duplicate_spans_detects_and_merges(spark):
    """A 12-token phrase shared by three docs (twice in one) is
    reported as ONE maximal span per occurrence at the right 0-based
    offsets; unique docs report nothing; overlapping windows merge."""
    from agnes_spark.operators.dedup import duplicate_spans

    common = "the quick brown fox jumps over the lazy dog again and again"
    docs = [
        (1, "alpha beta " + common + " gamma delta"),
        (2, "one two three four " + common),
        (3, "totally unique text with nothing shared at all among documents"),
        (4, "prefix " + common + " mid filler words " + common + " tail"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_id, r.start_tok, r.end_tok, r.n_windows)
        for r in duplicate_spans(df, "doc_id", "text", k=5, min_count=2).collect()
    }
    # 12-token span = 8 windows of k=5
    assert got == {
        (1, 2, 13, 8),
        (2, 4, 15, 8),
        (4, 1, 12, 8),
        (4, 16, 27, 8),
    }


def test_duplicate_spans_intra_doc_repeat_counts(spark):
    """A span repeated only WITHIN one doc still counts (corpus-wide
    occurrence >= 2, the Lee et al. definition — boilerplate inside a
    single doc is a duplicate)."""
    from agnes_spark.operators.dedup import duplicate_spans

    phrase = "a b c d e f"
    df = spark.createDataFrame(
        [(1, phrase + " x y z " + phrase), (2, "p q r s t u v w")],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.start_tok, r.end_tok)
        for r in duplicate_spans(df, "doc_id", "text", k=6, min_count=2).collect()
    }
    assert got == {(1, 0, 5), (1, 9, 14)}


def test_drop_duplicate_spans_cuts_and_passes_through(spark):
    from agnes_spark.operators.dedup import drop_duplicate_spans, duplicate_spans

    common = "the quick brown fox jumps over the lazy dog again and again"
    docs = [
        (1, "alpha beta " + common + " gamma delta"),
        (2, "one two three four " + common),
        (3, "totally unique text with nothing shared at all among documents"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    spans = duplicate_spans(df, "doc_id", "text", k=5, min_count=2)
    out = {
        r.doc_id: (r.text_deduped, r.n_tok_removed)
        for r in drop_duplicate_spans(df, spans, "doc_id", "text").collect()
    }
    assert out[1] == ("alpha beta gamma delta", 12)
    assert out[2] == ("one two three four", 12)
    assert out[3] == (docs[2][1], 0)  # untouched doc passes through


# --- binary-payload near-dup dedup (r10 verdict item 6) ---

def test_byte_shingles_content_defined_sampling_is_shift_robust(spark):
    from agnes_spark.operators.dedup import byte_shingle_sets

    base = b"The quick brown fox jumps over the lazy dog. " * 30
    # a 5-byte insertion shifts every downstream window position;
    # content-defined 0-mod-p sampling keeps the shared windows anyway
    rows = [(0, base), (1, base[:600] + b"MUT!x" + base[600:])]
    df = spark.createDataFrame(rows, "id bigint, payload binary")
    sets = {r.id: set(r.shash) for r in byte_shingle_sets(df, "id", "payload").collect()}
    inter = len(sets[0] & sets[1])
    union = len(sets[0] | sets[1])
    assert inter / union > 0.5, (inter, union)


def test_byte_shingles_short_payload_dropped(spark):
    from agnes_spark.operators.dedup import byte_shingle_sets

    df = spark.createDataFrame(
        [(0, b"tiny"), (1, bytes(range(100)))], "id bigint, payload binary"
    )
    got = byte_shingle_sets(df, "id", "payload", k=8).collect()
    assert [r.id for r in got] == [1]


def test_binary_minhash_subset_of_exact_and_finds_neardups(spark):
    from agnes_spark.operators.dedup import (
        binary_jaccard_pairs,
        binary_minhash_pairs,
    )

    base = b"The quick brown fox jumps over the lazy dog. " * 30
    rows = [
        (0, base),
        (1, base[:600] + b"MUT!" + base[600:]),
        (2, bytes(range(256)) * 5),
        (3, base.replace(b"quick", b"rapid")),
    ]
    df = spark.createDataFrame(rows, "id bigint, payload binary")
    mh = binary_minhash_pairs(df, "id", "payload", threshold=0.5)
    ex = binary_jaccard_pairs(df, "id", "payload", threshold=0.5)
    ex_pairs = {(r.a_id, r.b_id) for r in ex.collect()}
    mh_pairs = {(r.a_id, r.b_id) for r in mh.collect()}
    assert (0, 1) in ex_pairs and (0, 3) in ex_pairs
    assert all(p[0] < p[1] for p in mh_pairs)
    assert mh_pairs <= ex_pairs  # LSH may miss, never invents
    assert not any(2 in p for p in ex_pairs)


def test_byte_shingles_stay_jvm_side(spark):
    from agnes_spark.operators.dedup import byte_shingle_sets

    df = spark.createDataFrame([(0, b"x" * 100)], "id bigint, payload binary")
    plan = (
        byte_shingle_sets(df, "id", "payload")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan
