"""Mirror of the reference's examples/melt_aggregate.rs.

The reference builds an in-memory salary table with the `table!`
macro, melts the per-year columns into (SalaryYear, Salary) long form,
and aggregates total salary per employee. Same program with
agnes_spark: sources.memory.table is `table!`, DataView.melt is the
unpivot, DataView.aggregate the group-fold.

Run: python examples/melt_aggregate.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from agnes_spark import DataView, get_spark
from agnes_spark.sources.memory import table


def main() -> None:
    spark = get_spark("example_melt_aggregate")

    # table![ EmpId = [...]; Year2010 = [...]; ... ]
    orig = table(
        spark,
        {
            "EmpId": [0, 1, 2],
            "Year2010": [1500.0, 900.0, 600.0],
            "Year2011": [1600.0, 920.0, 800.0],
            "Year2012": [1700.0, 940.0, 900.0],
            "Year2013": [1850.0, 940.0, 1020.0],
            "Year2014": [2000.0, 970.0, 1100.0],
        },
        types={"EmpId": "long", **{f"Year{y}": "double" for y in range(2010, 2015)}},
    )

    # melt::<...>() — wide years -> long (SalaryYear, Salary)
    long_form = DataView(orig).melt(
        [f"Year{y}" for y in range(2010, 2015)], "SalaryYear", "Salary"
    )
    long_form.df.orderBy("EmpId", "SalaryYear").show()

    # aggregate::<...>() — total salary per employee
    totals = long_form.aggregate(
        ["EmpId"], F.sum("Salary").alias("TotalYearlySalary")
    )
    totals.df.orderBy("EmpId").show()


if __name__ == "__main__":
    main()
