"""In-DuckDB hash compare for oracle keys whose result sets are too
large for check_oracle.py's Python multiset compare (the r9 sf1.0
sweep left melt_wide unverified: the 24M-row melt is a trivial Spark
projection+explode, but pulling both sides into Python and sorting
tuples is output-bound at ~50min/batch).

Protocol (mirrors the driver's own hash-compare idea, kept entirely
inside DuckDB so neither result set ever materializes in Python):
  1. Run the Spark query, write it to a temp parquet.
  2. Register BOTH sides as DuckDB relations (parquet scan / oracle
     SQL over the same table views check_oracle.py uses).
  3. Normalize every cell to a string with the SAME rules as
     check_oracle.norm_cell — but expressed in SQL, so both sides go
     through the identical code path (no Python-vs-C float-format
     parity question).
  4. Compare (count, sum(hash), bit_xor(hash)) of the per-row
     normalized strings, columns sorted by name — an order- and
     layout-insensitive multiset fingerprint.

Supported cell types: integers, double/float (incl. NaN), boolean,
varchar, date, decimal. Timestamps/lists are not needed by the keys
this tool exists for and raise explicitly.

Usage: [SF_DIR=...] python scripts/check_oracle_hash.py key [key ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from agnes_spark import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

SEP = "chr(31)"  # unit separator — not present in any testdata column


def _norm_expr(col: str, dtype: str, force_double: bool = False) -> str:
    """SQL expression normalizing one cell to check_oracle.norm_cell's
    string form. `dtype` is DuckDB's DESCRIBE column_type.
    `force_double` routes a DECIMAL column through the DOUBLE %.9g
    path — set when the OTHER side types the same column as DOUBLE, so
    both sides share one normalization class (r11 advice: the exact
    DECIMAL trim disagrees with %.9g past 9 significant digits, which
    would false-fail a mixed DOUBLE-vs-DECIMAL key)."""
    q = f'"{col}"'
    t = dtype.upper()
    if t.startswith("BOOLEAN"):
        body = f"CASE WHEN {q} THEN 'bool:True' ELSE 'bool:False' END"
    elif t.startswith(("DOUBLE", "FLOAT", "REAL")):
        body = (
            f"CASE WHEN isnan({q}) THEN 'NaN' ELSE printf('%.9g', {q}) END"
        )
    elif t.startswith("DECIMAL"):
        if force_double:
            body = f"printf('%.9g', CAST({q} AS DOUBLE))"
        else:
            # EXACT normalization at any precision (r10 advice: the old
            # %.9g-through-DOUBLE form silently lost digits past 9
            # significant figures): canonical VARCHAR with trailing
            # fractional zeros (and a bare trailing point) trimmed, so
            # the same numeric value hashes identically whichever scale
            # the two sides' DECIMAL types carry — no rounding anywhere
            v = f"CAST({q} AS VARCHAR)"
            body = (
                f"CASE WHEN {v} LIKE '%.%' "
                f"THEN rtrim(rtrim({v}, '0'), '.') ELSE {v} END"
            )
    elif t.startswith("DATE"):
        body = f"strftime({q}, '%Y-%m-%d')"
    elif t.startswith(("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT", "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT")):
        body = f"CAST({q} AS VARCHAR)"
    elif t.startswith("VARCHAR"):
        body = q
    else:
        raise SystemExit(f"unsupported column type for hash compare: {col} {dtype}")
    return f"COALESCE({body}, '<NULL>')"


def _describe(con, rel_sql: str) -> list:
    desc = con.execute(f"DESCRIBE {rel_sql}").fetchall()
    return sorted((r[0], r[1]) for r in desc)


def _double_cols(cols: list) -> set:
    """Columns this side types as a binary float."""
    return {
        c
        for c, t in cols
        if t.upper().startswith(("DOUBLE", "FLOAT", "REAL"))
    }


def _fingerprint(
    con, rel_sql: str, cols: list | None = None, other_doubles: set = frozenset()
) -> tuple:
    """Multiset fingerprint of rel_sql with `cols` (name, type) sorted
    by name (described from rel_sql when omitted). A DECIMAL column
    whose name appears in `other_doubles` (the OTHER side's
    float-typed columns) is normalized through the DOUBLE path so both
    sides agree on the normalization class."""
    if cols is None:
        cols = _describe(con, rel_sql)
    row = f" || {SEP} || ".join(
        _norm_expr(c, t, force_double=(c in other_doubles)) for c, t in cols
    )
    n, hsum, hxor = con.execute(
        f"SELECT count(*), sum(CAST(hash(__r) AS HUGEINT)), bit_xor(hash(__r)) "
        f"FROM (SELECT {row} AS __r FROM ({rel_sql}))"
    ).fetchone()
    return [c for c, _ in cols], n, hsum, hxor


def main() -> int:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    keys = sys.argv[1:]
    if not keys:
        print(__doc__)
        return 2
    spark = get_spark("check_oracle_hash")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name in keys:
        if name not in oracles:
            print(f"SKIP  {name}: no oracle")
            continue
        tmp = tempfile.mkdtemp(prefix=f"oraclehash_{name}_")
        out = os.path.join(tmp, "spark_result")
        try:
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.mode("overwrite").parquet(out)
            spark_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            spark_rel = f"SELECT * FROM '{out}/*.parquet'"
            sdesc = _describe(con, spark_rel)
            odesc = _describe(con, oracles[name])
            scols, sn, ssum, sxor = _fingerprint(
                con, spark_rel, sdesc, _double_cols(odesc)
            )
            ocols, on, osum, oxor = _fingerprint(
                con, oracles[name], odesc, _double_cols(sdesc)
            )
            cmp_s = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: error: {e}")
            failures.append(name)
            shutil.rmtree(tmp, ignore_errors=True)
            continue
        shutil.rmtree(tmp, ignore_errors=True)
        if scols != ocols:
            print(f"FAIL  {name}: columns differ spark={scols} duck={ocols}")
            failures.append(name)
        elif sn != on:
            print(f"FAIL  {name}: rowcount spark={sn} duck={on}")
            failures.append(name)
        elif (ssum, sxor) != (osum, oxor):
            print(
                f"FAIL  {name}: multiset hash differs "
                f"spark=(sum {ssum}, xor {sxor}) duck=(sum {osum}, xor {oxor})"
            )
            failures.append(name)
        else:
            print(
                f"OK    {name}: {sn} rows hash-match "
                f"[spark {spark_s:.2f}s, compare {cmp_s:.2f}s]"
            )
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
