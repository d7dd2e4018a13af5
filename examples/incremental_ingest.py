"""Continuous-ingest dedup: the pipeline shape for a corpus that never
stops growing.

Day 0 builds the corpus state once; every later shard (or stream
micro-batch) probes that state instead of rescanning corpus text:

  1. bootstrap            exact_hash_store + minhash_state, persisted
  2. batch delta          incremental_exact_new / incremental_minhash_pairs
  3. streaming delta      run_ingest_dedup (foreachBatch against the
                          same persisted hash store)

Run: python examples/incremental_ingest.py [sf_dir]
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from agnes_spark import get_spark
from agnes_spark.operators.dedup_incremental import (
    exact_hash_store,
    incremental_exact_new,
    incremental_minhash_pairs,
    minhash_state,
)
from agnes_spark.streaming.sinks import run_ingest_dedup


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("incremental_ingest_example")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    delta = docs.filter(F.col("doc_id") % 10 == 0)
    base = tempfile.mkdtemp(prefix="agnes_ingest_example_")

    # 1. bootstrap: persist the dedup state once
    store_path = os.path.join(base, "hash_store")
    exact_hash_store(corpus, "doc_id", "text").write.parquet(store_path)
    bands, shingles = minhash_state(corpus, "doc_id", "text")
    bands.write.parquet(os.path.join(base, "bands"))
    shingles.write.parquet(os.path.join(base, "shingles"))

    # 2. batch shard: probe the persisted state, never the corpus text
    store = spark.read.parquet(store_path)
    new_rows = incremental_exact_new(delta, store, "doc_id", "text")
    near = incremental_minhash_pairs(
        delta,
        spark.read.parquet(os.path.join(base, "bands")),
        spark.read.parquet(os.path.join(base, "shingles")),
        "doc_id",
        "text",
    )
    print(f"batch shard: {new_rows.count()} new docs, {near.count()} near-dup pairs")

    # 3. streaming shard: same store, continuous arrival
    src = os.path.join(base, "stream_src")
    os.makedirs(src)
    delta.limit(50).coalesce(1).write.parquet(os.path.join(src, "s1.parquet"))
    stream = spark.readStream.schema(docs.schema).parquet(os.path.join(src, "*.parquet"))
    run_ingest_dedup(
        stream,
        store_path,
        os.path.join(base, "accepted"),
        os.path.join(base, "ckpt"),
        "doc_id",
        "text",
    )
    accepted = spark.read.parquet(os.path.join(base, "accepted"))
    print(f"streaming shard: {accepted.count()} docs accepted into the corpus")
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
