"""Microbenchmark: pandas-UDF vs Catalyst-expression shingle hashing.

VERDICT r1 flagged the pandas shingle UDF (functions/__init__.py
hashed_shingles_udf) as the single biggest CPU line in
dedup_ngram_jaccard + dedup_minhash (~36% of the whole bench) and
asked for the claim "pandas wins" to be pinned by a bench number.

Three contenders, all producing array<long> of distinct shingle
hashes per doc (hash IDENTITY differs; callers only need a
consistent 64-bit hash, so set sizes / jaccard are unchanged):

  udf    — hashed_shingles_udf: Arrow batch -> Python str.split +
           blake2b per shingle
  expr   — hashed_shingles: concat_ws over slice() per shingle,
           then xxhash64 (nested higher-order funcs, interpreted)
  fast   — hashed_shingles_fast: hash each TOKEN once with xxhash64,
           then each shingle = xxhash64(th[i], ..., th[i+n-1]) —
           no string building, no per-shingle array slicing

Run:  python scripts/bench_shingles.py [sf_dir] [reps]
"""

import sys
import time

from pyspark.sql import functions as F

from agnes_spark.functions import (
    hashed_shingles,
    hashed_shingles_fast,
    hashed_shingles_udf,
)
from agnes_spark.session import get_spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    docs = docs.repartition(32, "doc_id").persist()
    n = docs.count()
    print(f"docs: {n}")

    udf = hashed_shingles_udf(3)
    variants = {
        "udf": lambda: docs.select(udf(F.col("text")).alias("s")),
        "expr": lambda: docs.select(hashed_shingles(F.col("text"), 3).alias("s")),
        "fast": lambda: docs.select(hashed_shingles_fast(F.col("text"), 3).alias("s")),
    }
    # force full evaluation: aggregate total shingle count
    results = {}
    for name, build in variants.items():
        times = []
        total = None
        for _ in range(reps):
            t0 = time.time()
            total = build().agg(F.sum(F.size("s"))).collect()[0][0]
            times.append(time.time() - t0)
        times.sort()
        results[name] = times[len(times) // 2]
        print(f"{name}: median {results[name]:.3f}s  (all {['%.3f' % t for t in times]})  total_shingles={total}")
    print({"winner": min(results, key=results.get), **{k: round(v, 3) for k, v in results.items()}})


if __name__ == "__main__":
    main()
