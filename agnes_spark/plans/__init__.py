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


def audit_plan(df: DataFrame) -> list[dict]:
    """Scan a physical plan for the scale red flags that quietly turn
    a working query into a 100 TB incident. Returns one finding dict
    per hit ({rule, detail}); an empty list is a clean bill.

    Rules:
    - cartesian_product: any CartesianProduct node (all-pairs blowup).
    - nested_loop_join: BroadcastNestedLoopJoin — all-pairs against
      the broadcast side; intentional for small/oracle joins only.
    - row_python_udf: BatchEvalPython — a row-at-a-time Python UDF in
      the plan (Arrow-batched UDFs show as ArrowEvalPython and pass).
    - single_partition_exchange: Exchange SinglePartition outside a
      TakeOrderedAndProject/limit — the whole dataset through one task.
    - unpushed_filter: a parquet scan whose PushedFilters is empty
      while a Filter node sits in the plan — predicates evaluated
      after the read instead of inside it.
    """
    p = plan_string(df)
    findings: list[dict] = []
    if "CartesianProduct" in p:
        findings.append({"rule": "cartesian_product", "detail": "CartesianProduct node present"})
    if "BroadcastNestedLoopJoin" in p:
        findings.append({
            "rule": "nested_loop_join",
            "detail": "BroadcastNestedLoopJoin — all-pairs against the broadcast side; "
            "fine for a small build side or an intentional exact baseline, fatal otherwise",
        })
    if "BatchEvalPython" in p:
        findings.append({
            "rule": "row_python_udf",
            "detail": "row-at-a-time Python UDF (BatchEvalPython); use a pandas_udf",
        })
    for m in re.finditer(r"Exchange SinglePartition[^\n]*", p):
        ctx = p[max(0, m.start() - 400): m.start()]
        if "TakeOrderedAndProject" not in ctx and "CollectLimit" not in ctx:
            findings.append({
                "rule": "single_partition_exchange",
                "detail": "Exchange SinglePartition outside top-N/limit — one-task bottleneck",
            })
            break
    scans_wo_pushdown = p.count("PushedFilters: []")
    # Match an actual Filter operator node (formatted-plan tree line like
    # "* Filter (3)" / "+- Filter ..."), not the bare substring "Filter" —
    # "PushedFilters" itself contains it, which made this rule vacuous.
    has_filter_node = re.search(r"(?m)^[\s*+:\-]*Filter[\s(]", p) is not None
    if scans_wo_pushdown and has_filter_node:
        findings.append({
            "rule": "unpushed_filter",
            "detail": f"{scans_wo_pushdown} scan(s) with empty PushedFilters under a Filter node",
        })
    return findings
