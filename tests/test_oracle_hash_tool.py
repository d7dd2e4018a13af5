"""The in-DuckDB hash compare (scripts/check_oracle_hash.py) is
itself a verifier, so pin that it (a) normalizes cells exactly like
check_oracle.norm_cell and (b) actually detects mismatches — a
fingerprint that never fires is worse than the slow Python compare
it replaces.

DuckDB-only (no SparkSession): the tool's Spark side is just
write-parquet, already covered by the sf-scale runs it exists for.
"""

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from check_oracle import norm_cell  # noqa: E402
from check_oracle_hash import _fingerprint, _norm_expr  # noqa: E402


def test_norm_expr_matches_python_norm_cell():
    con = duckdb.connect()
    cases = [
        ("CAST(42 AS BIGINT)", "BIGINT", 42),
        ("CAST(NULL AS BIGINT)", "BIGINT", None),
        ("TRUE", "BOOLEAN", True),
        ("FALSE", "BOOLEAN", False),
        ("CAST(68423.46 AS DOUBLE)", "DOUBLE", 68423.46),
        ("CAST(1e20 AS DOUBLE)", "DOUBLE", 1e20),
        ("CAST(0.05 AS DOUBLE)", "DOUBLE", 0.05),
        ("CAST('nan' AS DOUBLE)", "DOUBLE", float("nan")),
        ("CAST(NULL AS DOUBLE)", "DOUBLE", None),
        ("'hello'", "VARCHAR", "hello"),
        ("DATE '2020-01-02'", "DATE", __import__("datetime").date(2020, 1, 2)),
        ("CAST(12345.67 AS DECIMAL(12,2))", "DECIMAL(12,2)", None),  # canonical trim below
        # > 9 significant digits: the exact VARCHAR normalizer keeps
        # every digit (the old %.9g DOUBLE path would have lost two)
        ("CAST(123456789012.34 AS DECIMAL(14,2))", "DECIMAL(14,2)", None),
        # scale-dependent trailing zeros trim to one canonical form
        ("CAST(100 AS DECIMAL(10,3))", "DECIMAL(10,3)", None),
    ]
    for sql_lit, dtype, pyval in cases:
        got = con.execute(
            f"SELECT {_norm_expr('c', dtype)} FROM (SELECT {sql_lit} AS c)"
        ).fetchone()[0]
        if pyval is None and "NULL" in sql_lit:
            assert got == "<NULL>", (sql_lit, got)
        elif dtype.startswith("DECIMAL"):
            want = {
                "DECIMAL(12,2)": "12345.67",
                "DECIMAL(14,2)": "123456789012.34",
                "DECIMAL(10,3)": "100",
            }[dtype]
            assert got == want, (dtype, got, want)
        else:
            assert got == norm_cell(pyval), (sql_lit, got, norm_cell(pyval))
    assert not math.isnan(float("inf"))  # silence unused-import style


def test_fingerprint_detects_value_count_and_column_mismatches():
    con = duckdb.connect()
    con.execute("CREATE TABLE a AS SELECT * FROM (VALUES (1, 'x', 1.5), (2, 'y', 2.5)) t(k, s, v)")
    base = _fingerprint(con, "SELECT * FROM a")
    # identical multiset, shuffled row/column order -> same fingerprint
    same = _fingerprint(con, "SELECT v, k, s FROM a ORDER BY k DESC")
    assert base[1:] == same[1:] and base[0] == same[0]
    # one value off by one ulp-scale amount -> differs
    diff_val = _fingerprint(con, "SELECT k, s, v + CASE WHEN k = 2 THEN 0.001 ELSE 0 END AS v FROM a")
    assert diff_val[2:] != base[2:]
    # duplicated row -> count differs (and sum-hash differs)
    dup = _fingerprint(con, "SELECT * FROM a UNION ALL SELECT * FROM a WHERE k = 1")
    assert dup[1] != base[1]
    # renamed column -> column list differs
    ren = _fingerprint(con, "SELECT k AS kk, s, v FROM a")
    assert ren[0] != base[0]
    # two rows swapping cell values (same bag of cells, different rows) -> differs
    swap = _fingerprint(con, "SELECT * FROM (VALUES (1, 'y', 1.5), (2, 'x', 2.5)) t(k, s, v)")
    assert swap[2:] != base[2:]


def test_fingerprint_mixed_decimal_vs_double_sides_agree():
    """r11 advice: when one side types a column DOUBLE (Spark parquet)
    and the other DECIMAL (DuckDB oracle), the exact-DECIMAL trim and
    the DOUBLE %.9g path disagree past 9 significant digits
    ('1.23456789e+11' vs '123456789012.34') and would false-fail the
    key. The compare must force BOTH sides through one normalization
    class (DOUBLE) for such columns — and keep the exact trim when
    both sides are DECIMAL."""
    from check_oracle_hash import _describe, _double_cols

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE dbl AS SELECT CAST(123456789012.34 AS DOUBLE) AS v, 1 AS k"
    )
    con.execute(
        "CREATE TABLE dec AS SELECT CAST(123456789012.34 AS DECIMAL(14,2)) AS v, 1 AS k"
    )
    ddesc = _describe(con, "SELECT * FROM dbl")
    cdesc = _describe(con, "SELECT * FROM dec")
    a = _fingerprint(con, "SELECT * FROM dbl", ddesc, _double_cols(cdesc))
    b = _fingerprint(con, "SELECT * FROM dec", cdesc, _double_cols(ddesc))
    assert a[1:] == b[1:], (a, b)
    # both-DECIMAL sides keep the EXACT trim: > 9 significant digits
    # still distinguish values the %.9g form would conflate
    x = _fingerprint(
        con, "SELECT CAST(123456789012.34 AS DECIMAL(14,2)) AS v, 1 AS k"
    )
    y = _fingerprint(
        con, "SELECT CAST(123456789012.30 AS DECIMAL(14,2)) AS v, 1 AS k"
    )
    assert x[2:] != y[2:]
