"""Spark-side scale spot-check: run registry keys at two scale dirs
and report per-key runtimes + the scaling ratio.

Complements scripts/check_oracle.py for the keys whose DuckDB oracle
replay is impractical at the larger scale (the unrolled iterative
graph CTEs): correctness at sf0.01/sf0.1 comes from the oracle gate;
THIS check asks the 100 TB question — does the runtime scale ~linearly
with the data?

Usage:
  python scripts/scale_check.py SMALL_DIR BIG_DIR key [key ...]
Prints one JSON line: {key: {"small_s":…, "big_s":…, "ratio":…}, …}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from agnes_spark import get_spark


def main() -> int:
    small, big = sys.argv[1], sys.argv[2]
    keys = sys.argv[3:]
    spark = get_spark("scale_check")
    qs = entrymod.queries()
    out = {}
    for k in keys:
        fn = qs[k]
        rec = {}
        for label, sf_dir in (("small_s", small), ("big_s", big)):
            fn(spark, sf_dir).count()  # warm: fixture/caches + codegen
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            rec[label] = round(time.perf_counter() - t0, 2)
            spark.catalog.clearCache()
        rec["ratio"] = round(rec["big_s"] / max(rec["small_s"], 1e-9), 1)
        out[k] = rec
        print(f"{k}: {rec}", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
