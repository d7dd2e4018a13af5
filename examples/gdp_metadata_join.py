"""Mirror of the reference's examples/gdp_metadata_join.rs.

The reference declares a `tablespace!` of typed labels, loads two CSVs
with `schema![fieldname ...]` specs, filters out rows with a missing
Region, and equi-joins on CountryCode. Same program here with
agnes_spark: CsvSpec replaces the schema macro, DataView carries the
fluent ops, and Catalyst prunes/pushes everything into the csv scan.

Run: python examples/gdp_metadata_join.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnes_spark import DataView, get_spark
from agnes_spark.operators.join import predicate_join
from agnes_spark.sources.csv import CsvSpec, load_csv

GDP_CSV = """Country Name,Country Code,2015
Aruba,ABW,2919553073
Andorra,AND,2811489409
Afghanistan,AFG,19199437962
Angola,AGO,116193649124
"""

META_CSV = """Country Code,Region,IncomeGroup
ABW,Latin America & Caribbean,High income
AND,,High income
AFG,South Asia,Low income
AGO,Sub-Saharan Africa,Lower middle income
"""


def main() -> None:
    spark = get_spark("example_gdp_join")
    d = tempfile.mkdtemp(prefix="agnes_example_")
    gdp_path = os.path.join(d, "gdp.csv")
    meta_path = os.path.join(d, "gdp_metadata.csv")
    with open(gdp_path, "w") as f:
        f.write(GDP_CSV)
    with open(meta_path, "w") as f:
        f.write(META_CSV)

    # schema![ fieldname gdp::CountryName = "Country Name"; ... ]
    gdp_spec = CsvSpec(
        fields={
            "CountryName": ("Country Name", "string"),
            "CountryCode": ("Country Code", "string"),
            "Gdp2015": ("2015", "f64"),
        }
    )
    meta_spec = CsvSpec(
        fields={
            "CountryCode": ("Country Code", "string"),
            "Region": ("Region", "string"),
        }
    )

    gdp_view = DataView(load_csv(spark, gdp_path, gdp_spec))
    meta_view = DataView(load_csv(spark, meta_path, meta_spec)).filter(
        "Region", lambda c: c.isNotNull()
    )

    # join::<Join<gdp::CountryCode, gdp_metadata::CountryCode, Equal>>
    joined = predicate_join(
        gdp_view.df,
        meta_view.df.withColumnRenamed("CountryCode", "MetaCountryCode"),
        "CountryCode",
        "MetaCountryCode",
        "==",
    ).drop("MetaCountryCode")

    joined.orderBy("CountryCode").show(truncate=False)


if __name__ == "__main__":
    main()
