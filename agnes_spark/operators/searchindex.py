"""Persisted inverted index + BM25 query serving — the search-engine
surface of the engine.

Reference scope: agnes computes per-view statistics and filters but has
no retrieval surface; BM25 scoring exists here as the per-doc
bm25_top_terms (textanalysis.py). This module adds the two-phase form
a 100 TB corpus actually needs: build the index ONCE (postings, doc
lengths, document frequencies, corpus stats persisted as bucketed
tables), then serve many queries by probing only the matched terms'
postings — per-query cost is O(sum of matched postings), never a
corpus scan.

Layout (the dedup_incremental discipline): postings and term-df
bucket by term — a query's term probe is bucket-local; doc lengths
bucket by doc id — the tf-side join reshuffles only matched postings
(bounded by the query's posting lists, not the corpus). Corpus stats
are one exact-integer row (n_docs, sum_dl), so avgdl is a single
division both at build and query time.

Determinism: per-(doc, term) BM25 contributions are one double
expression over exact integers; the per-doc total folds the
term-sorted contribution array left-to-right (F.aggregate over
array_sort), so the sum order is fixed — bit-identical across
partitionings and engines (the ordered-cumsum convention).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from agnes_spark.functions import ws_tokens


def build_search_index(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    table_prefix: str,
    num_buckets: int = 32,
) -> None:
    """Tokenize once and persist four index tables under
    `table_prefix`: _postings (term, id, tf) and _df (term, df)
    bucketed by term; _doclens (id, dl) bucketed by id; _stats one
    exact row (n_docs, sum_dl)."""
    from agnes_spark.operators.partitioning import write_bucketed

    # Idempotent across PROCESSES, not just sessions: the in-memory
    # catalog forgets managed tables between runs while their
    # warehouse directories survive, so a bare saveAsTable would die
    # with LOCATION_ALREADY_EXISTS on the next process. Drop any
    # registration AND delete the orphan location first (the
    # bucketed-layout-gate convention).
    spark = docs.sparkSession
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").removeprefix(
        "file:"
    )
    jvm = spark.sparkContext._jvm  # noqa: SLF001
    hconf = spark.sparkContext._jsc.hadoopConfiguration()  # noqa: SLF001
    for suffix in ("_postings", "_df", "_doclens", "_stats"):
        t = f"{table_prefix}{suffix}"
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        jpath = jvm.org.apache.hadoop.fs.Path(os.path.join(wh, t))
        fs = jpath.getFileSystem(hconf)
        if fs.exists(jpath):
            fs.delete(jpath, True)

    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(ws_tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy("term", "id").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    write_bucketed(tf, f"{table_prefix}_postings", ["term"], num_buckets)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    write_bucketed(dfreq, f"{table_prefix}_df", ["term"], num_buckets)
    dl = toks.groupBy("id").agg(F.count(F.lit(1)).cast("long").alias("dl"))
    write_bucketed(dl, f"{table_prefix}_doclens", ["id"], num_buckets)
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
    )
    stats.write.mode("overwrite").saveAsTable(f"{table_prefix}_stats")


def bm25_search(
    spark: SparkSession,
    table_prefix: str,
    terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents for a bag-of-terms query by summed Okapi BM25
    (Lucene +1-shifted idf, never negative):

      idf(t)  = ln((N - df + 0.5) / (df + 0.5) + 1)
      s(t, d) = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    Returns (id, n_terms_matched, score) ordered by the ROUNDED
    score desc, id asc (deterministic cut). Only the query terms'
    postings are read — the probe is bucket-local on term; the
    doc-length join moves matched postings only."""
    q = spark.createDataFrame([(t,) for t in dict.fromkeys(terms)], "term string")
    post = spark.table(f"{table_prefix}_postings").join(F.broadcast(q), "term")
    dfreq = spark.table(f"{table_prefix}_df").join(F.broadcast(q), "term")
    dl = spark.table(f"{table_prefix}_doclens")
    stats = spark.table(f"{table_prefix}_stats")
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    denom = F.col("tf") + F.lit(float(k1)) * (
        F.lit(1.0 - float(b)) + F.lit(float(b)) * F.col("dl") / avgdl
    )
    contrib = idf * F.col("tf") * F.lit(float(k1) + 1.0) / denom
    scored = (
        post.join(dfreq, "term")
        .join(dl, "id")
        .crossJoin(F.broadcast(stats))
        .select("id", "term", contrib.alias("s"))
    )
    per_doc = scored.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms_matched"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("term", "s"))),
            F.lit(0.0),
            lambda acc, x: acc + x["s"],
        ).alias("score"),
    )
    return (
        per_doc.select(
            "id", "n_terms_matched", F.round("score", 6).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(int(k))
    )


def rrf_fuse(rankings, id_col: str = "id", score_col: str = "score", k_const: int = 60, topk: int = 15) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR'09):
    fused(d) = sum over input lists of 1 / (k_const + rank_list(d)) —
    the standard score-free way to combine retrieval lists (query
    variants, BM25 + dense, shards).

    `rankings` are already-CUT candidate frames (a top-k per list, the
    canonical RRF input): ranks are assigned by (score_col desc,
    id_col asc) inside each list with a global row_number window that
    is bounded by the list's constant k, never data-sized. The fused
    sum folds contributions in list order (sorted struct fold), so the
    double total is bit-deterministic cross-engine."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking frame")
    parts = []
    for qi, r in enumerate(rankings):
        w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        parts.append(
            r.select(
                F.col(id_col).alias("id"),
                F.lit(qi).cast("int").alias("qid"),
                F.row_number().over(w).alias("rank"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    contrib = F.lit(1.0) / (
        F.lit(float(k_const)) + F.col("rank").cast("double")
    )
    fused = (
        u.select("id", "qid", contrib.alias("c"))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lists"),
            F.aggregate(
                F.sort_array(F.collect_list(F.struct(F.col("qid"), F.col("c")))),
                F.lit(0.0),
                lambda acc, s: acc + s["c"],
            ).alias("rrf"),
        )
    )
    return (
        fused.orderBy(F.round("rrf", 9).desc(), F.col("id").asc())
        .limit(topk)
        .select("id", "n_lists", F.round("rrf", 9).alias("rrf"))
    )


def dedup_fused_candidates(
    fused: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.9,
    n: int = 1,
) -> DataFrame:
    """Cross-list dedup of a fused candidate list: RRF over query
    variants / hybrid retrievers routinely surfaces the same content
    several times (mirrors, boilerplate variants), so the fused top-k
    is deduplicated before display/labeling. Drop rule: a candidate is
    dropped iff some HIGHER-ranked candidate (rrf desc, id asc) has
    n-gram Jaccard >= threshold with it — one-pass dominance, not
    greedy-survivor chains, so the result is order-free, deterministic,
    and exactly SQL-expressible. `dup_of` names the best-ranked
    dominator for audit.

    Scale shape: the fused frame is constant-k (15-100 rows), so it is
    localCheckpointed once and BROADCAST everywhere — the only
    corpus-sized work is one semi-join-pruned scan to fetch the k
    candidate texts; the pair join is k^2 on single-digit-KB shingle
    arrays. Default n=1 (bag-of-words Jaccard) suits dedup of short
    result snippets; corpus-scale near-dup uses n=3..5 upstream
    (operators/dedup.py)."""
    from agnes_spark.operators.dedup import shingle_sets

    w = Window.orderBy(F.col("rrf").desc(), F.col("id").asc())
    # constant-k frame consumed by three joins: checkpoint so the
    # upstream retrieval (BM25 over the corpus) runs once, not thrice
    ranked = fused.withColumn("rank", F.row_number().over(w)).localCheckpoint(
        eager=True
    )
    cand = docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t")).join(
        F.broadcast(ranked.select("id")), "id", "left_semi"
    )
    sh = shingle_sets(cand, "id", "__t", n).select("id", "shash")
    feat = ranked.join(sh, "id", "left")
    a = feat.select(
        F.col("id").alias("a_id"), F.col("rank").alias("a_rank"),
        F.col("shash").alias("a_sh"),
    )
    b = feat.select(
        F.col("id").alias("b_id"), F.col("rank").alias("b_rank"),
        F.col("shash").alias("b_sh"),
    )
    inter = F.size(F.array_intersect("a_sh", "b_sh"))
    union = F.size("a_sh") + F.size("b_sh") - inter
    dropped = (
        a.join(F.broadcast(b), F.col("a_rank") < F.col("b_rank"))
        .withColumn("j", inter.cast("double") / union.cast("double"))
        .filter(F.col("j") >= threshold)
        .groupBy("b_id")
        .agg(F.min_by("a_id", "a_rank").alias("dup_of"))
    )
    return (
        ranked.join(F.broadcast(dropped), ranked.id == dropped.b_id, "left")
        .select(
            "id", "n_lists", "rrf",
            F.col("rank").cast("bigint").alias("rank"),
            F.col("dup_of").isNull().alias("is_kept"),
            "dup_of",
        )
        .orderBy("rank")
    )
