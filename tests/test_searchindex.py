"""Persisted inverted index + BM25 query serving."""

import uuid

from agnes_spark.operators.searchindex import bm25_search, build_search_index
from agnes_spark.sources.memory import table


def _build(spark):
    docs = table(
        spark,
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "spark query engine",
                "query query query engine",
                "fast spark",
                "unrelated words only",
            ],
        },
        types={"doc_id": "bigint", "text": "string"},
    )
    prefix = "t_srch_" + uuid.uuid4().hex[:8]
    build_search_index(docs, "doc_id", "text", prefix, num_buckets=2)
    return prefix


def test_bm25_search_ranks_matches_and_skips_nonmatches(spark):
    prefix = _build(spark)
    got = bm25_search(spark, prefix, ["spark", "query"], k=10).collect()
    ids = [r.id for r in got]
    assert 4 not in ids                      # no query term -> absent
    assert set(ids) == {1, 2, 3}
    by_id = {r.id: r for r in got}
    assert by_id[1].n_terms_matched == 2
    assert by_id[2].n_terms_matched == 1
    assert by_id[3].n_terms_matched == 1
    assert all(r.score > 0 for r in got)
    # doc 1 matches both terms; its score beats single-term doc 3
    assert by_id[1].score > by_id[3].score


def test_bm25_search_duplicate_query_terms_collapse(spark):
    prefix = _build(spark)
    once = bm25_search(spark, prefix, ["spark"], k=10).collect()
    twice = bm25_search(spark, prefix, ["spark", "spark"], k=10).collect()
    assert [(r.id, r.score) for r in once] == [(r.id, r.score) for r in twice]


def test_rrf_fuse_orders_by_reciprocal_rank_sum(spark):
    from agnes_spark.operators.searchindex import rrf_fuse

    # list A ranks: d1, d2, d3; list B ranks: d2, d3
    a = spark.createDataFrame(
        [(1, 9.0), (2, 5.0), (3, 1.0)], "id long, score double"
    )
    b = spark.createDataFrame([(2, 8.0), (3, 2.0)], "id long, score double")
    got = {r.id: (r.n_lists, r.rrf) for r in rrf_fuse([a, b], topk=10).collect()}
    assert got[2] == (2, round(1 / 62 + 1 / 61, 9))  # rank 2 in A, 1 in B
    assert got[1] == (1, round(1 / 61, 9))
    assert got[3] == (2, round(1 / 63 + 1 / 62, 9))
    # doc in both lists outranks the single-list leader
    order = [r.id for r in rrf_fuse([a, b], topk=10).collect()]
    assert order[0] == 2


def test_dedup_fused_candidates_dominance_rule(spark):
    from agnes_spark.operators.searchindex import dedup_fused_candidates

    # fused list: 10 > 20 > 30 > 40 by rrf
    fused = spark.createDataFrame(
        [(10, 2, 0.9), (20, 2, 0.8), (30, 1, 0.7), (40, 1, 0.6)],
        "id long, n_lists long, rrf double",
    )
    docs = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta"),
            (20, "alpha beta gamma delta"),   # dup of 10 (j=1.0)
            (30, "totally different words here"),
            (40, "alpha beta gamma epsilon"), # j=3/5=0.6 vs 10 -> kept at 0.9
        ],
        "doc_id long, text string",
    )
    got = {
        r.id: (r.rank, r.is_kept, r.dup_of)
        for r in dedup_fused_candidates(fused, docs, threshold=0.9, n=1).collect()
    }
    assert got[10] == (1, True, None)
    assert got[20] == (2, False, 10)
    assert got[30] == (3, True, None)
    assert got[40] == (4, True, None)
    # lower threshold also sweeps 40 under 10 (its best-ranked dominator)
    got2 = {
        r.id: (r.is_kept, r.dup_of)
        for r in dedup_fused_candidates(fused, docs, threshold=0.5, n=1).collect()
    }
    assert got2[40] == (False, 10)
    assert got2[30] == (True, None)
