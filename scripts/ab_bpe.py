"""Interleaved A/B: bpe_train lazy replace chain (checkpoint_every=8,
HEAD default — never fires at merges=5) vs the r11 per-round eager
checkpoint (checkpoint_every=1). r12 VERDICT item 2: reconcile
bpe_merges_docs against the committed r11 record (1.64s median).

Run: python scripts/ab_bpe.py [sf_dir] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from agnes_spark.operators.bpe import bpe_train
from agnes_spark.session import get_spark


def canary(spark):
    t0 = time.perf_counter()
    spark.range(2_000_000).agg(F.max(F.xxhash64("id"))).collect()
    return time.perf_counter() - t0


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark()
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("lang") == "en")
    )

    variants = {
        "lazy_k8": lambda: bpe_train(docs, "text", merges=5, checkpoint_every=8),
        "ckpt_k1": lambda: bpe_train(docs, "text", merges=5, checkpoint_every=1),
    }
    # warmup both once (untimed)
    for name, fn in variants.items():
        fn().count()
    results = {k: [] for k in variants}
    for r in range(reps):
        for name, fn in variants.items():
            spark.catalog.clearCache()
            c0 = canary(spark)
            t0 = time.perf_counter()
            n = fn().count()
            dt = time.perf_counter() - t0
            c1 = canary(spark)
            results[name].append((dt, c0, c1, n))
            print(
                f"rep{r} {name}: {dt:.3f}s rows={n} canary {c0:.3f}/{c1:.3f}",
                flush=True,
            )
    for name, rs in results.items():
        ts = sorted(t for t, *_ in rs)
        print(f"{name}: min={ts[0]:.3f} med={ts[len(ts)//2]:.3f} all={[round(t,3) for t in ts]}")
    # output parity between variants
    a = variants["lazy_k8"]().collect()
    b = variants["ckpt_k1"]().collect()
    print("parity:", sorted(map(tuple, a)) == sorted(map(tuple, b)))


if __name__ == "__main__":
    main()
