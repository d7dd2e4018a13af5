"""Tour of the Spark 4 SQL surfaces the engine gates:

  1. session variables   DECLARE / SET VARIABLE parameterized queries
  2. SQL scripting       BEGIN ... END compound statements
  3. recursive CTEs      WITH RECURSIVE chain walks
  4. Python UDTF         Arrow-batched, LATERAL-joined table function

Run: python examples/sql_surfaces.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnes_spark import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("sql_surfaces_example")
    spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).createOrReplaceTempView(
        "orders"
    )

    # 1. session variables: one query text, swappable threshold
    spark.sql("DECLARE OR REPLACE VARIABLE thr DOUBLE DEFAULT 0.0")
    for t in (150000.0, 300000.0):
        spark.sql(f"SET VARIABLE thr = {t}")
        n = spark.sql("SELECT count(*) AS n FROM orders WHERE o_totalprice > thr")
        print(f"orders above {t:>9,.0f}:", n.first()["n"])

    # 2. scripting: compute into a variable, use it in the final SELECT
    print("above/below the mean price:")
    spark.sql(
        """
        BEGIN
          DECLARE mean_p DOUBLE;
          SET mean_p = (SELECT avg(o_totalprice) FROM orders);
          SELECT CASE WHEN o_totalprice >= mean_p THEN 'above' ELSE 'below' END
                   AS bucket, count(*) AS n
          FROM orders GROUP BY 1;
        END
        """
    ).show()

    # 3. recursive CTE: how deep do customer order chains go?
    print("order-chain depth distribution (recursion rounds = deepest chain):")
    spark.sql(
        """
        WITH RECURSIVE chain AS (
          SELECT o_custkey, row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey) AS step
          FROM orders
        ),
        walk AS (
          SELECT o_custkey, step FROM chain WHERE step = 1
          UNION ALL
          SELECT c.o_custkey, c.step FROM walk w
          JOIN chain c ON c.o_custkey = w.o_custkey AND c.step = w.step + 1
        )
        SELECT max(step) AS depth, count(*) AS n_rows_walked FROM walk
        """
    ).show()

    # 4. Python UDTF (Arrow-batched), LATERAL-joined per row
    from pyspark.sql.functions import udtf

    @udtf(returnType="part string, idx int", useArrow=True)
    class SplitPriority:
        def eval(self, s: str):
            for i, part in enumerate(s.split("-")):
                yield part, i

    spark.udtf.register("split_priority", SplitPriority)
    print("priority labels split by the UDTF:")
    spark.sql(
        "SELECT DISTINCT p.part, p.idx FROM orders, "
        "LATERAL split_priority(o_orderpriority) p ORDER BY idx, part"
    ).show()


if __name__ == "__main__":
    main()
