"""Driver contract for the spark-graft builder (PySpark target).

Maps SURVEY.md §2's operator inventory to (queries, oracle_sql) pairs.
Every queries() entry returns a DataFrame built through agnes_spark's
operators; oracle_sql() is the DuckDB-runnable ANSI equivalent the
driver compares against at sf=0.01 (row-count + schema +
order-insensitive value-hash).

Column-name discipline: every computed column is aliased identically
on both sides; double-typed aggregates are rounded identically on both
sides so association-order FP noise can't flip the value hash.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---------------------------------------------------------------------------
# §2.2 headline: TPC-H-ish
# ---------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-agg on lineitem; partial aggs map-side,
    8 aggregates in one pass, whole-stage codegen end to end."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                            AS sum_qty,
       round(sum(l_extendedprice), 2)                                       AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                    AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)      AS sum_charge,
       round(avg(l_quantity), 4)                                            AS avg_qty,
       round(avg(l_extendedprice), 4)                                       AS avg_price,
       round(avg(l_discount), 6)                                            AS avg_disc,
       count(*)                                                             AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# §2.1 core agnes surface
# ---------------------------------------------------------------------------

def subview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """agnes DataView::subview (src/view.rs:147) — projection."""
    from agnes_spark import DataView

    return DataView(_t(spark, sf_dir, "customer")).subview("c_custkey", "c_name", "c_acctbal").df


def relabel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """agnes DataView::relabel (src/view.rs:541)."""
    from agnes_spark import DataView

    v = DataView(_t(spark, sf_dir, "customer")).subview("c_custkey", "c_acctbal")
    return v.relabel("c_custkey", "customer_id").relabel("c_acctbal", "balance").df


def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """agnes DataView::filter (src/view.rs:770) — pushed to the scan."""
    from agnes_spark import DataView

    v = DataView(_t(spark, sf_dir, "customer"))
    return v.filter("c_acctbal", lambda c: c > 5000.0).subview("c_custkey", "c_acctbal", "c_mktsegment").df


def sort_two_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """agnes sort_by_label(_comparator) (src/view.rs:703): observable via
    deterministic top-100 (desc price, asc key tiebreak)."""
    from agnes_spark import DataView

    v = DataView(_t(spark, sf_dir, "orders"))
    return (
        v.sort_by_label("o_totalprice", "o_orderkey", ascending=[False, True])
        .subview("o_orderkey", "o_totalprice")
        .df.limit(100)
    )


def join_equal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """agnes Join<L,R,Equal> (src/join.rs:228) — Catalyst broadcasts the
    25-row nation side automatically."""
    from agnes_spark.operators.join import predicate_join

    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    out = predicate_join(cust, nat, "c_nationkey", "n_nationkey", "==")
    return out.select("c_custkey", "c_name", "n_name")


def join_lt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """agnes Join<L,R,GreaterThan> (src/join.rs:320) — theta join;
    both sides tiny -> broadcast nested loop is the right plan."""
    from agnes_spark.operators.join import predicate_join

    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    out = predicate_join(nat, reg, "n_regionkey", "r_regionkey", ">", broadcast_right=True)
    return out.select("n_name", "r_name")


def join_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalable range join (|price_a - price_b| <= 0.02 band): bucketed
    equi-join instead of a nested loop (operators/join.py band_join)."""
    from agnes_spark.operators.join import band_join

    p1 = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("a_key"), F.col("p_retailprice").alias("a_price")
    )
    p2 = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("b_key"), F.col("p_retailprice").alias("b_price")
    )
    out = band_join(p1, p2, "a_price", "b_price", width=0.02)
    return out.filter(F.col("a_key") < F.col("b_key")).select("a_key", "b_key", "a_price", "b_price")


def merge_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """agnes DataView::merge (src/view.rs:644) — positional horizontal
    concat of two row-aligned views (both sorted by c_custkey)."""
    from agnes_spark import DataView
    from agnes_spark.operators.merge import merge_views as _merge

    cust = _t(spark, sf_dir, "customer")
    left = DataView(cust).sort_by_label("c_custkey").subview("c_custkey", "c_name").df
    right = DataView(cust).sort_by_label("c_custkey").subview("c_acctbal", "c_mktsegment").df
    return _merge(left, right)


def melt_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """agnes melt (src/view.rs:1278) — unpivot 4 lineitem measures."""
    from agnes_spark.operators.melt import melt

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax"
    )
    return melt(
        li,
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "value",
    )


def aggregate_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """agnes aggregate (src/view.rs:1498) — sum fold with NA->0."""
    from agnes_spark.operators.aggregate import aggregate

    orders = _t(spark, sf_dir, "orders")
    out = aggregate(orders, ["o_custkey"], "o_totalprice", "sum", "total_spent")
    return out.select("o_custkey", F.round("total_spent", 2).alias("total_spent"))


def unique_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """agnes unique_values (src/view.rs:1030)."""
    from agnes_spark.operators.unique import unique_values as _uniq

    return _uniq(_t(spark, sf_dir, "customer"), ["c_mktsegment", "c_nationkey"])


def field_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """agnes stats traits (src/stats.rs) — all stats, one pass."""
    from agnes_spark.operators.stats import field_stats_df

    out = field_stats_df(_t(spark, sf_dir, "lineitem"), "l_extendedprice")
    return out.select(
        "num_na",
        "num_exists",
        F.round("sum", 2).alias("sum"),
        F.round("mean", 4).alias("mean"),
        F.round(F.col("sum_sq") / 1e6, 2).alias("sum_sq_millions"),
        F.round("var", 2).alias("var"),
        F.round("varp", 2).alias("varp"),
        F.round("stdev", 4).alias("stdev"),
        F.round("min", 2).alias("min"),
        F.round("max", 2).alias("max"),
    )


def view_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """agnes view_stats (src/view_stats.rs:230) — per-field summary."""
    from agnes_spark.operators.stats import view_stats as _vs

    out = _vs(_t(spark, sf_dir, "part"), ["p_partkey", "p_size", "p_retailprice"])
    return out.select(
        "field",
        "num_na",
        "num_exists",
        F.round("sum", 2).alias("sum"),
        F.round("mean", 4).alias("mean"),
        F.round("stdev", 4).alias("stdev"),
        F.round("min", 2).alias("min"),
        F.round("max", 2).alias("max"),
    )


def field_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """agnes ops (src/ops/field_op.rs, scalar_op.rs) — charge =
    extendedprice * (1 - discount) * (1 + tax), identical eval order
    both sides so doubles are bit-exact."""
    from agnes_spark.operators.ops import field_op, rscalar_op, scalar_op

    li = _t(spark, sf_dir, "lineitem")
    li = rscalar_op(li, 1.0, "-", "l_discount", out_label="one_minus_disc")
    li = scalar_op(li, "l_tax", "+", 1.0, out_label="one_plus_tax")
    li = field_op(li, "l_extendedprice", "*", "one_minus_disc", "disc_price")
    li = field_op(li, "disc_price", "*", "one_plus_tax", "charge")
    return li.select("l_orderkey", "l_linenumber", "disc_price", "charge")


def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per priority — window row_number, no
    global sort; partial ranking inside each hash partition."""
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_orderpriority", "rk", "o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q1_pricing_summary": q1_pricing_summary,
        "subview": subview,
        "relabel": relabel,
        "filter_pred": filter_pred,
        "sort_two_keys": sort_two_keys,
        "join_equal": join_equal,
        "join_lt": join_lt,
        "join_band": join_band,
        "merge_views": merge_views,
        "melt_wide": melt_wide,
        "aggregate_sum": aggregate_sum,
        "unique_values": unique_values,
        "field_stats": field_stats,
        "view_stats": view_stats,
        "field_arith": field_arith,
        "topk_per_group": topk_per_group,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": _Q1_SQL,
        "subview": "SELECT c_custkey, c_name, c_acctbal FROM customer",
        "relabel": "SELECT c_custkey AS customer_id, c_acctbal AS balance FROM customer",
        "filter_pred": (
            "SELECT c_custkey, c_acctbal, c_mktsegment FROM customer WHERE c_acctbal > 5000.0"
        ),
        "sort_two_keys": (
            "SELECT o_orderkey, o_totalprice FROM orders "
            "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100"
        ),
        "join_equal": (
            "SELECT c_custkey, c_name, n_name FROM customer "
            "JOIN nation ON c_nationkey = n_nationkey"
        ),
        "join_lt": (
            "SELECT n_name, r_name FROM nation JOIN region ON n_regionkey > r_regionkey"
        ),
        "join_band": (
            "SELECT p1.p_partkey AS a_key, p2.p_partkey AS b_key, "
            "p1.p_retailprice AS a_price, p2.p_retailprice AS b_price "
            "FROM part p1 JOIN part p2 ON abs(p1.p_retailprice - p2.p_retailprice) <= 0.02 "
            "WHERE p1.p_partkey < p2.p_partkey"
        ),
        "merge_views": "SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer",
        "melt_wide": (
            "SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value FROM lineitem "
            "UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem "
            "UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem "
            "UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem"
        ),
        "aggregate_sum": (
            "SELECT o_custkey, round(sum(o_totalprice), 2) AS total_spent "
            "FROM orders GROUP BY o_custkey"
        ),
        "unique_values": "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
        "field_stats": (
            "SELECT count(CASE WHEN l_extendedprice IS NULL THEN 1 END) AS num_na, "
            "count(l_extendedprice) AS num_exists, "
            "round(coalesce(sum(l_extendedprice), 0.0), 2) AS sum, "
            "round(avg(l_extendedprice), 4) AS mean, "
            "round(coalesce(sum(l_extendedprice * l_extendedprice), 0.0) / 1e6, 2) AS sum_sq_millions, "
            "round(coalesce(var_samp(l_extendedprice), 0.0), 2) AS var, "
            "round(coalesce(var_pop(l_extendedprice), 0.0), 2) AS varp, "
            "round(coalesce(stddev_samp(l_extendedprice), 0.0), 4) AS stdev, "
            "round(min(l_extendedprice), 2) AS min, "
            "round(max(l_extendedprice), 2) AS max "
            "FROM lineitem"
        ),
        "view_stats": (
            " UNION ALL ".join(
                "SELECT '{c}' AS field, "
                "count(CASE WHEN {c} IS NULL THEN 1 END) AS num_na, "
                "count({c}) AS num_exists, "
                "round(coalesce(sum({c}), 0.0), 2) AS sum, "
                "round(avg({c}), 4) AS mean, "
                "round(coalesce(stddev_samp({c}), 0.0), 4) AS stdev, "
                "round(min({c}) * 1.0, 2) AS min, "
                "round(max({c}) * 1.0, 2) AS max "
                "FROM part".format(c=c)
                for c in ("p_partkey", "p_size", "p_retailprice")
            )
        ),
        "field_arith": (
            "SELECT l_orderkey, l_linenumber, "
            "l_extendedprice * (1.0 - l_discount) AS disc_price, "
            "(l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax) AS charge "
            "FROM lineitem"
        ),
        "topk_per_group": (
            "SELECT o_orderpriority, rk, o_orderkey, o_totalprice FROM ("
            "SELECT o_orderpriority, o_orderkey, o_totalprice, "
            "row_number() OVER (PARTITION BY o_orderpriority "
            "ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk FROM orders) "
            "WHERE rk <= 3"
        ),
    }
