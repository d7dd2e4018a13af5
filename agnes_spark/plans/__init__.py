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
    """Data shuffles (hash/range repartitioning exchanges) in the plan.
    Counted on the SIMPLE plan string, where an Exchange's arguments
    print inline — the formatted mode puts them on an Arguments:
    detail line, which made the old substring count vacuous (always 0,
    the same bug class as the fixed single-partition/filter rules).
    Broadcast and single-partition exchanges are deliberately not
    counted: they are not data-sized network passes."""
    p = plan_string(df, "simple")
    return p.count("Exchange hashpartitioning") + p.count("Exchange rangepartitioning")


def codegen_stage_count(df: DataFrame) -> int:
    """Distinct WholeStageCodegen subtrees. Under AQE the pre-execution
    plan is an opaque AdaptiveSparkPlan with no codegen annotations
    (grepping the formatted plan always returned 0 — the same vacuity
    class as the old num_shuffles), so the query is RE-PLANNED with
    AQE off for the measurement: df.select("*") forces a fresh
    QueryExecution under the toggled conf, the logical plan is
    untouched, and the conf is restored. The non-adaptive count is the
    meaningful one — it is the fusion structure AQE starts from.

    NOT thread-safe: the toggle is on the session-wide conf, so a
    concurrently planned query in the SAME session can observe AQE
    disabled during the measurement window. Call from one thread (the
    plan-audit tests do), or from a dedicated spark.newSession()."""
    sess = df.sparkSession
    old = sess.conf.get("spark.sql.adaptive.enabled", None)
    sess.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        p = plan_string(df.select("*"), "codegen")
    finally:
        # restore exactly: unset if it was unset (a blanket 'true'
        # write would pin the default and shadow later cluster confs)
        if old is None:
            sess.conf.unset("spark.sql.adaptive.enabled")
        else:
            sess.conf.set("spark.sql.adaptive.enabled", old)
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", p)
    if m:
        return int(m.group(1))
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", p)))


def _plan_tree(p: str) -> dict[int, dict]:
    """Parse the tree section of a FORMATTED plan into
    {node_id: {name, parent, children}} using indentation depth.
    Formatted mode prints operator arguments in detail blocks, not on
    the tree line — rules that grep for 'Exchange SinglePartition' as
    one substring silently never fire (the same vacuity class as the
    old unpushed-filter rule)."""
    nodes: dict[int, dict] = {}
    stack: list[tuple[int, int]] = []  # (indent, id)
    for line in p.split("\n"):
        m = re.match(r"^([\s:+\-*]*)([A-Za-z][\w ]*?) \((\d+)\)", line)
        if not m:
            if line.startswith("==") or not line.strip():
                if nodes and not line.strip():
                    break  # end of tree section
            continue
        indent = len(m.group(1))
        name, nid = m.group(2).strip(), int(m.group(3))
        while stack and stack[-1][0] >= indent:
            stack.pop()
        parent = stack[-1][1] if stack else None
        nodes[nid] = {"name": name, "parent": parent, "children": []}
        if parent is not None:
            nodes[parent]["children"].append(nid)
        stack.append((indent, nid))
    return nodes


_SP_OK_CHILD = ("HashAggregate", "SortAggregate", "ObjectHashAggregate")
_SP_OK_ANCESTOR = ("TakeOrderedAndProject", "CollectLimit", "GlobalLimit")


def _single_partition_findings(p: str) -> list[dict]:
    """SinglePartition exchanges that are NOT a global-aggregate merge
    and NOT under a top-N/limit. The agg-merge test is on the
    exchange's PARENT (the final aggregate consuming it) combined with
    an aggregate child (the partial producing it): a child-only test
    also matched FINAL grouped aggregates feeding a global window —
    i.e. the whole grouped result through one task, the exact
    anti-pattern this rule exists to catch. What remains after both
    exemptions funnels unaggregated (or fully-grouped) data through a
    single task."""
    sp_ids = {
        int(m.group(1))
        for m in re.finditer(
            r"\((\d+)\) Exchange[^\n]*\n(?:(?!\()[^\n]*\n)*?Arguments: SinglePartition", p
        )
    }
    if not sp_ids:
        return []
    nodes = _plan_tree(p)
    out = []
    for nid in sorted(sp_ids):
        node = nodes.get(nid)
        if node is None:
            continue
        child_names = [nodes[c]["name"] for c in node["children"]]
        parent = node["parent"]
        parent_name = nodes[parent]["name"] if parent is not None else ""
        is_agg_merge = parent_name.startswith(_SP_OK_CHILD) and any(
            n.startswith(_SP_OK_CHILD) for n in child_names
        )
        if is_agg_merge:
            continue
        anc, cur = [], parent
        while cur is not None:
            anc.append(nodes[cur]["name"])
            cur = nodes[cur]["parent"]
        if any(a.startswith(_SP_OK_ANCESTOR) for a in anc):
            continue
        out.append({
            "rule": "single_partition_exchange",
            "detail": (
                f"Exchange ({nid}) SinglePartition feeding "
                f"{child_names or 'unknown'} into {parent_name or 'root'} "
                "outside agg-merge/top-N — one-task bottleneck"
            ),
        })
    return out


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
    findings.extend(_single_partition_findings(p))
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


def explain_summary(df: DataFrame) -> dict:
    """Compact, machine-readable digest of a physical plan — the
    five numbers a reviewer checks before shipping a query at scale,
    without reading 200 lines of formatted explain:

      scans          parquet scans with their pushed filters/schema
      joins          join operator names in plan order
      num_shuffles   Exchange count (each is a full network pass)
      codegen_stages WholeStageCodegen spans (wider = more fused JVM work)
      findings       audit_plan red flags (empty = clean)

    Pairs with audit_plan: audit says "is anything wrong", this says
    "what does it actually do".
    """
    p = plan_string(df)
    tree = _plan_tree(p)
    scans = []
    for m in re.finditer(r"\((\d+)\) Scan (\w+)", p):
        nid = m.group(1)
        block_m = re.search(
            rf"^\({nid}\) Scan .*?(?=^\(\d+\) |\Z)", p, re.M | re.S
        )
        block = block_m.group(0) if block_m else ""
        pf = re.search(r"PushedFilters: \[(.*?)\]", block)
        rs = re.search(r"ReadSchema: (\S+)", block)
        scans.append({
            "format": m.group(2),
            "pushed_filters": pf.group(1) if pf else "",
            "read_schema": rs.group(1) if rs else "",
        })
    joins = [
        n["name"]
        for _, n in sorted(tree.items())
        if "Join" in n["name"] or n["name"].startswith("CartesianProduct")
    ]
    return {
        "scans": scans,
        "joins": joins,
        "num_shuffles": num_shuffles(df),
        "codegen_stages": codegen_stage_count(df),
        "findings": audit_plan(df),
    }
