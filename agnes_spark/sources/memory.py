"""In-memory table construction.

Reference: agnes `table!` macro (src/test_utils.rs / examples) —
build a typed table from column literals. Spark-first:
createDataFrame over the Arrow path.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession


def table(spark: SparkSession, columns: Mapping[str, Sequence], types: Mapping[str, str] | None = None) -> DataFrame:
    """table![ A = [..]; B = [..] ] equivalent: dict of column -> values.

    All columns must be equal length. Types optionally forced via a
    label -> Spark DDL type mapping; otherwise inferred from values.
    """
    names = list(columns)
    lengths = {len(v) for v in columns.values()}
    if len(lengths) > 1:
        raise ValueError(f"column length mismatch: { {n: len(v) for n, v in columns.items()} }")
    rows = list(zip(*[columns[n] for n in names])) if columns else []
    if types:
        ddl = ", ".join(f"{n} {types.get(n, 'string')}" for n in names)
        return spark.createDataFrame(rows, schema=ddl)
    return spark.createDataFrame(rows, schema=names)
