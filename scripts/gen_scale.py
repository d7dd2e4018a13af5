"""Deterministic scale-up of the driver testdata for scale spot-checks.

Produces an sfK directory (default 10x sf0.1 -> "sf1.0") by unioning K
key-shifted replicas of each fact table: every key space (orderkey,
custkey, partkey, suppkey, doc_id, vec_id, event_id, user_id) is offset
by replica*STRIDE, so referential integrity holds within each replica
and the replicas are disjoint. Dimension tables (region, nation) copy
once. Values, dates and text are unchanged — distributions are
preserved exactly, row counts scale linearly, and the whole thing is
bit-deterministic (no RNG), so DuckDB oracles remain valid at the new
scale.

Semantics note for dedup-family gates: replicating documents verbatim
multiplies every exact-dup cluster by K — a legitimate (worst-case)
dedup stress, but output SIZES change accordingly; the scale check
cares about runtime scaling and oracle agreement, not about comparing
outputs across scale factors.

Usage: python scripts/gen_scale.py [K] [SRC_DIR] [DST_DIR]
Defaults: K=10, SRC=/root/testdata/sf0.1, DST=.scratch/sf1.0
"""

from __future__ import annotations

import os
import sys

import duckdb

STRIDE = 10_000_000

# table -> columns to offset by replica*STRIDE
KEY_COLS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
}
DIM_TABLES = ["region", "nation"]


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "sf1.0")
    )
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t, keys in KEY_COLS.items():
        src_path = os.path.join(src, f"{t}.parquet")
        cols = [r[0] for r in con.sql(f"describe select * from '{src_path}'").fetchall()]
        sel = ", ".join(
            f"({c} + r.off) AS {c}" if c in keys else c for c in cols
        )
        # max key must stay below STRIDE or replicas would collide
        for c in keys:
            mx = con.sql(f"select max({c}) from '{src_path}'").fetchone()[0]
            assert mx < STRIDE, f"{t}.{c} max {mx} >= stride {STRIDE}"
        con.sql(
            f"COPY (SELECT {sel} FROM '{src_path}' CROSS JOIN "
            f"(SELECT unnest(range(0, {k})) * {STRIDE} AS off) r "
            f"ORDER BY r.off) TO '{os.path.join(dst, t + '.parquet')}' "
            f"(FORMAT PARQUET)"
        )
        n = con.sql(f"select count(*) from '{os.path.join(dst, t + '.parquet')}'").fetchone()[0]
        print(f"{t}: {n} rows")
    for t in DIM_TABLES:
        con.sql(
            f"COPY (SELECT * FROM '{os.path.join(src, t + '.parquet')}') "
            f"TO '{os.path.join(dst, t + '.parquet')}' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")
    print(f"wrote {dst} (K={k}, stride={STRIDE})")


if __name__ == "__main__":
    main()
