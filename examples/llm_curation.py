"""End-to-end LLM training-data curation over the documents corpus.

The full last mile in one script, each stage an agnes_spark operator:

  1. exact dedup            (operators/dedup.exact_dedup)
  2. near-dup clustering    (ngram_jaccard_pairs -> connected_components
                             -> canonical_per_cluster)
  3. quality + repetition   (textanalysis.quality + repetition_metrics)
  4. PII scrub              (textprep.pii_scrub)
  5. decontamination        (textprep.decontaminate vs a held-out slice)
  6. deterministic shuffle  (textprep.shuffle_deterministic)
  7. sequence packing       (textprep.pack_chunks)

Run: python examples/llm_curation.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from agnes_spark import get_spark
from agnes_spark.operators.dedup import exact_dedup, ngram_jaccard_pairs
from agnes_spark.operators.graph import canonical_per_cluster, connected_components
from agnes_spark.operators.textanalysis import repetition_metrics
from agnes_spark.operators.textprep import (
    decontaminate,
    pack_chunks,
    pii_scrub,
    shuffle_deterministic,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("llm_curation_example")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n0 = docs.count()

    # 1. exact dedup: keep the minimal doc_id per distinct content
    keep_exact = exact_dedup(docs, "doc_id", "text").select(
        F.col("keep_id").alias("doc_id")
    )
    docs = docs.join(keep_exact, "doc_id", "left_semi")
    n1 = docs.count()

    # 2. near-dup clusters: one canonical doc per jaccard>=0.5 cluster
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    comps = connected_components(pairs)
    docs = canonical_per_cluster(docs, comps, "doc_id")
    n2 = docs.count()

    # 3. repetition/quality cut: drop template spam
    rep = repetition_metrics(docs, "doc_id", "text")
    good = rep.filter(
        (F.col("dup_word_frac") < 0.9) & (F.col("top_bigram_frac") < 0.5)
    ).select("doc_id")
    # materialize the kept corpus before the stages that reference it
    # repeatedly (scrub joins docs to itself; decontaminate reads a
    # train AND an eval slice of it): without the cut, every reference
    # re-runs the dedup->cluster->score lineage — and its Python-stage
    # subplans get no exchange reuse, so the recompute is
    # multiplicative (measured minutes vs ~15 s for this script). In a
    # production pipeline this is the natural "write the curated
    # corpus to parquet between phases" point.
    docs = docs.join(good, "doc_id", "left_semi").localCheckpoint()
    n3 = docs.count()

    # 4. PII scrub
    docs = (
        pii_scrub(docs, "doc_id", "text")
        .select("doc_id", F.col("scrubbed").alias("text"))
        .join(docs.drop("text"), "doc_id")
    )

    # 5. decontaminate against a held-out eval slice
    ev = docs.filter(F.col("doc_id") % 50 == 0)
    train = docs.filter(F.col("doc_id") % 50 != 0)
    contaminated = decontaminate(train, ev, "doc_id", "text", n=8).select("doc_id")
    train = train.join(contaminated, "doc_id", "left_anti")
    n5 = train.count()

    # 6-7. deterministic shuffle, then pack into 512-token sequences
    train = shuffle_deterministic(train, ["doc_id"], seed=13)
    packed = pack_chunks(
        train.withColumn("shard", F.lit("shard-0")),
        "shard",
        "doc_id",
        F.size(F.split(F.col("text"), r"\s+")),
        max_len=512,
    )
    n_seqs = packed.agg(F.max("end_seq")).first()[0]

    print(
        f"corpus {n0} -> exact-dedup {n1} -> near-dup {n2} -> "
        f"quality {n3} -> decontaminated train {n5} -> "
        f"packed into {int(n_seqs) + 1} sequences of 512 tokens"
    )


if __name__ == "__main__":
    main()
