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
