"""Declarative data-quality expectations — the Deequ/Great-Expectations
class of pipeline validation, compiled to ONE aggregate pass.

Reference scope: agnes validates per-field types/NA at load
(src/field.rs typed columns + NA handling); a warehouse-scale engine
additionally needs dataset-level assertions (completeness, uniqueness,
set/range membership, referential integrity) run as part of every
ingest. The Spark-first shape: every row-local expectation is a
conditional count inside a single hash aggregate (one scan, map-side
combined, no shuffle beyond the 1-row merge); uniqueness rides the
same aggregate as count(*) - count(distinct col); referential
integrity is a broadcast/shuffle ANTI join counted per FK spec. At
100 TB the whole report costs one pass over the fact table plus one
semi-join per foreign key — the minimum any validator pays.

Each check yields (check_name, n_violations, n_rows, passed) with
exact integer counts — engine-portable, full-oracle-able.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> dict:
    """Expect no NULLs in `col` (completeness)."""
    return {"name": f"not_null:{col}", "kind": "row", "pred": F.col(col).isNull()}


def in_set(col: str, values: Sequence) -> dict:
    """Expect every non-null value of `col` to be one of `values`."""
    return {
        "name": f"in_set:{col}",
        "kind": "row",
        "pred": F.col(col).isNotNull() & ~F.col(col).isin(list(values)),
    }


def in_range(col: str, lo, hi) -> dict:
    """Expect every non-null value of `col` inside [lo, hi]."""
    c = F.col(col)
    return {
        "name": f"in_range:{col}",
        "kind": "row",
        "pred": c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi))),
    }


def matches(col: str, pattern: str) -> dict:
    """Expect every non-null value of `col` to match the regex."""
    c = F.col(col)
    return {
        "name": f"matches:{col}",
        "kind": "row",
        "pred": c.isNotNull() & ~c.rlike(pattern),
    }


def satisfies(name: str, violation: Column) -> dict:
    """Custom expectation: `violation` is a boolean Column that is
    true on each offending row."""
    return {"name": f"satisfies:{name}", "kind": "row", "pred": violation}


def unique(col: str) -> dict:
    """Expect `col` values to be distinct (null-safe: each NULL counts
    as its own row but never as a duplicate of another NULL is NOT the
    convention here — violations = count(col) - count(distinct col),
    the number of surplus rows among non-null duplicates)."""
    return {"name": f"unique:{col}", "kind": "unique", "col": col}


def foreign_key(col: str, dim: DataFrame, dim_col: str) -> dict:
    """Expect every non-null `col` to exist in dim[dim_col]
    (referential integrity)."""
    return {"name": f"foreign_key:{col}", "kind": "fk", "col": col,
            "dim": dim, "dim_col": dim_col}


def expectations_report(df: DataFrame, checks: Sequence[dict]) -> DataFrame:
    """Run all expectations and return one row per check:
    (check_name, n_violations, n_rows, passed), ordered by check_name.

    All row-local checks and uniqueness share ONE aggregate over one
    scan; each foreign_key adds one anti-join count (dim side
    broadcast when small — Catalyst's call). Counts are exact BIGINTs.
    """
    aggs = [F.count(F.lit(1)).cast("long").alias("__n_rows")]
    for ck in checks:
        if ck["kind"] == "row":
            aggs.append(
                F.sum(F.when(ck["pred"], 1).otherwise(0))
                .cast("long")
                .alias(ck["name"])
            )
        elif ck["kind"] == "unique":
            c = ck["col"]
            aggs.append(
                (F.count(F.col(c)) - F.count_distinct(F.col(c)))
                .cast("long")
                .alias(ck["name"])
            )
    base = df.agg(*aggs)

    spark = df.sparkSession
    long_rows = None
    for ck in checks:
        if ck["kind"] != "fk":
            continue
        dim_keys = ck["dim"].select(F.col(ck["dim_col"]).alias("__k")).distinct()
        viol = (
            df.select(F.col(ck["col"]).alias("__k"))
            .filter(F.col("__k").isNotNull())
            .join(dim_keys, "__k", "left_anti")
            .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
            .select(F.lit(ck["name"]).alias("check_name"), "n_violations")
        )
        long_rows = viol if long_rows is None else long_rows.unionByName(viol)

    names = [ck["name"] for ck in checks if ck["kind"] != "fk"]
    melted = base.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(n).alias("check_name"),
                        F.col(n).alias("n_violations"),
                        F.col("__n_rows").alias("__nr"),
                    )
                    for n in names
                ]
            )
        ).alias("e")
    ).select("e.check_name", "e.n_violations", F.col("e.__nr").alias("__nr"))

    nr = base.select(F.col("__n_rows").alias("__nr"))
    if long_rows is not None:
        fk_rows = long_rows.crossJoin(F.broadcast(nr))
        melted = melted.unionByName(fk_rows)
    return melted.select(
        "check_name",
        "n_violations",
        F.col("__nr").alias("n_rows"),
        (F.col("n_violations") == 0).alias("passed"),
    ).orderBy("check_name")


def profile_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """One-scan, per-column dataset profile: (col_name, n_rows,
    n_null, n_distinct, min_val, max_val) with values compared AS
    STRINGS (uniform schema across heterogeneous columns) — the
    first-look profiler a 100 TB onboarding runs before writing
    expectations.

    Spark-first shape: the columns MELT via one stack() projection
    (k output rows per input row, still one scan of only the profiled
    columns — column pruning reaches the parquet reader), then ONE
    grouped aggregate per col_name computes all five stats;
    count(distinct) rides the same aggregate via Spark's expand. No
    per-column passes, no driver loop. Callers profiling float
    columns should pre-cast to a canonical string form if the profile
    must be engine-portable (double->string formatting is not).
    """
    stack_args = ", ".join(
        f"'{c}', CAST(`{c}` AS STRING)" for c in cols
    )
    melted = df.select(
        F.expr(f"stack({len(cols)}, {stack_args}) AS (col_name, val)")
    )
    return (
        melted.groupBy("col_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            (F.count(F.lit(1)) - F.count("val")).cast("long").alias("n_null"),
            F.count_distinct(F.col("val")).cast("long").alias("n_distinct"),
            F.min("val").alias("min_val"),
            F.max("val").alias("max_val"),
        )
        .orderBy("col_name")
    )
