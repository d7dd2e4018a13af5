"""Distinct values over a label list.

Reference: agnes src/view.rs:1016 `unique_indices` / :1030
`unique_values`. agnes builds a HashSet of row hashes driver-side;
Spark-first: `select(labels).distinct()` — a hash aggregate with
map-side partial dedup, shuffled only on the label columns (column
pruning keeps the shuffle narrow at 100 TB).

`unique_indices` (positional row indices into the view) has no stable
meaning under distributed execution and is intentionally not exposed;
`unique_values` covers the reference's use cases.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def unique_values(df: DataFrame, labels: Sequence[str]) -> DataFrame:
    return df.select(*labels).distinct()


def drop_duplicate_rows(df: DataFrame, labels: Sequence[str]) -> DataFrame:
    """Keep one full row per distinct label-list value (first wins,
    nondeterministic tie-break — mirror of dropDuplicates)."""
    return df.dropDuplicates(list(labels))
