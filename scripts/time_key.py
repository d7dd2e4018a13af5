"""Warm in-session timing of registry keys — the diagnostic twin of
bench.py's timed action (build the frame, .count()), with canary
bracketing, N runs per key, interleaved across the requested keys so
a host contention wave hits all keys equally.

Run: python scripts/time_key.py key1,key2 [reps] [sf_dir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from agnes_spark.session import get_spark


def canary(spark):
    t0 = time.perf_counter()
    spark.range(2_000_000).agg(F.max(F.xxhash64("id"))).collect()
    return time.perf_counter() - t0


def main():
    keys = sys.argv[1].split(",")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    spark = get_spark()
    qs = entrymod.queries()
    for k in keys:
        if k in getattr(entrymod, "SHARED_CACHE_DEPS", {}):
            t0 = time.perf_counter()
            entrymod.prewarm_shared_caches(spark, sf_dir, k)
            print(f"{k}: cache_build {time.perf_counter()-t0:.3f}s", flush=True)
        qs[k](spark, sf_dir).count()  # untimed warmup
    results = {k: [] for k in keys}
    for r in range(reps):
        for k in keys:
            # mirror bench.py isolation: per-query persisted frames are
            # dropped between runs, so every rep pays materialization
            spark.catalog.clearCache()
            c0 = canary(spark)
            t0 = time.perf_counter()
            n = qs[k](spark, sf_dir).count()
            dt = time.perf_counter() - t0
            c1 = canary(spark)
            results[k].append(dt)
            print(
                f"rep{r} {k}: {dt:.3f}s rows={n} canary {c0:.3f}/{c1:.3f}",
                flush=True,
            )
    for k, ts in results.items():
        s = sorted(ts)
        print(f"{k}: min={s[0]:.3f} med={s[len(s)//2]:.3f} all={[round(t,3) for t in s]}")


if __name__ == "__main__":
    main()
