"""Physical-plan inspection helpers.

Used by tests (and by hand while tuning) to assert the plans we want
at 100 TB actually materialize: filters reach the parquet scan,
small dims broadcast, scans prune columns, no accidental cartesian
products.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every parquet scan in the plan."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan_string(df)):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema strings of every scan — check column pruning."""
    return re.findall(r"ReadSchema: (\S+)", plan_string(df))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_string(df) or "BroadcastNestedLoopJoin" in plan_string(df)


def has_cartesian(df: DataFrame) -> bool:
    return "CartesianProduct" in plan_string(df)


def num_shuffles(df: DataFrame) -> int:
    return plan_string(df).count("Exchange hashpartitioning") + plan_string(df).count(
        "Exchange rangepartitioning"
    )


def codegen_stage_count(df: DataFrame) -> int:
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan_string(df))))
