"""Plot-data export — the engine-side half of visualization.

The reference's FUTURE.md lists "Data visualization through rhubarb";
a distributed engine's honest contribution to that story is producing
SMALL, plot-ready aggregates (a chart never wants 100 TB of points —
it wants the few hundred rows a renderer can draw), exported in the
interchange formats plotting stacks consume. This example computes
three classic chart payloads and writes each as single-file JSON/CSV:

- histogram: order totalprice distribution (bar chart)
- time series: monthly revenue (line chart)
- category breakdown: revenue by market segment (pie/bar)

Everything heavy happens distributed; only the final tiny aggregate is
coalesced for the single-file export.

Run: python examples/plot_export.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from agnes_spark import get_spark


def main() -> None:
    spark = get_spark("example_plot_export")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    out_base = tempfile.mkdtemp(prefix="agnes_plots_")
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    customer = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))

    # 1. histogram of order totals: 20 equi-width bins
    lo, hi = orders.agg(
        F.min("o_totalprice"), F.max("o_totalprice")
    ).first()
    width = (hi - lo) / 20 or 1.0
    hist = (
        orders.groupBy(
            F.least(F.lit(19), F.floor((F.col("o_totalprice") - F.lit(lo)) / width))
            .cast("int")
            .alias("bin")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            F.round(F.lit(lo) + F.col("bin") * width, 2).alias("bin_lo"),
            F.round(F.lit(lo) + (F.col("bin") + 1) * width, 2).alias("bin_hi"),
            "n",
        )
        .orderBy("bin")
    )

    # 2. monthly revenue time series
    monthly = (
        orders.groupBy(F.trunc("o_orderdate", "month").alias("month"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        .orderBy("month")
    )

    # 3. revenue by market segment
    segments = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.col("revenue").desc())
    )

    for name, df in (("histogram", hist), ("monthly", monthly), ("segments", segments)):
        # tiny aggregates -> cache so the JSON write, CSV write, and
        # count share ONE computation, then single file each
        df = df.persist()
        df.coalesce(1).write.mode("overwrite").json(f"{out_base}/{name}_json")
        df.coalesce(1).write.mode("overwrite").option("header", True).csv(
            f"{out_base}/{name}_csv"
        )
        print(f"{name}: {df.count()} rows -> {out_base}/{name}_{{json,csv}}")
        df.unpersist()
    print(f"plot payloads at {out_base}")


if __name__ == "__main__":
    main()
