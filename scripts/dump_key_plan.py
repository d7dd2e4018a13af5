"""Dump one registry key's formatted physical plan to a file.

Run: python scripts/dump_key_plan.py <key> <outfile> [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from agnes_spark import get_spark
from agnes_spark.plans import plan_string


def main() -> None:
    key, outfile = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    spark = get_spark("dump_key_plan")
    df = entrymod.queries()[key](spark, sf_dir)
    with open(outfile, "w") as f:
        f.write(plan_string(df).strip() + "\n")
    print("wrote", outfile)


if __name__ == "__main__":
    main()
