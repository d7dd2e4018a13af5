"""Declarative expectations: each check counts exactly its planted
violations, shares one aggregate pass, and FK rides an anti join."""

from pyspark.sql import functions as F

from agnes_spark.operators import dataquality as dq
from agnes_spark.sources.memory import table


def _fixture(spark):
    return table(
        spark,
        {
            "id": [1, 2, 2, 4, None],
            "grade": ["a", "b", "z", None, "a"],
            "score": [0.5, 1.5, 0.2, 0.9, -0.1],
            "ref": [10, 10, 20, 99, None],
        },
        types={
            "id": "bigint",
            "grade": "string",
            "score": "double",
            "ref": "bigint",
        },
    )


def test_expectations_report_counts_planted_violations(spark):
    df = _fixture(spark)
    dim = table(spark, {"k": [10, 20, 30]}, types={"k": "bigint"})
    rep = dq.expectations_report(
        df,
        [
            dq.not_null("id"),
            dq.unique("id"),
            dq.in_set("grade", ["a", "b", "c"]),
            dq.in_range("score", 0.0, 1.0),
            dq.matches("grade", "^[a-c]$"),
            dq.satisfies("id_even", F.col("id") % 2 == 1),
            dq.foreign_key("ref", dim, "k"),
        ],
    )
    got = {r.check_name: r for r in rep.collect()}
    assert got["not_null:id"].n_violations == 1
    # ids (1,2,2,4): one surplus duplicate among non-nulls
    assert got["unique:id"].n_violations == 1
    assert got["in_set:grade"].n_violations == 1  # 'z'; NULL not counted
    assert got["in_range:score"].n_violations == 2  # 1.5 and -0.1
    assert got["matches:grade"].n_violations == 1
    assert got["satisfies:id_even"].n_violations == 1  # id=1
    assert got["foreign_key:ref"].n_violations == 1  # 99; NULL not counted
    assert all(r.n_rows == 5 for r in got.values())
    assert not got["unique:id"].passed


def test_expectations_report_all_green_passes(spark):
    df = table(
        spark,
        {"id": [1, 2, 3], "grade": ["a", "b", "c"]},
        types={"id": "bigint", "grade": "string"},
    )
    rep = dq.expectations_report(
        df, [dq.not_null("id"), dq.unique("id"), dq.in_set("grade", ["a", "b", "c"])]
    ).collect()
    assert len(rep) == 3
    assert all(r.passed and r.n_violations == 0 for r in rep)


def test_profile_columns_one_pass_stats(spark):
    from agnes_spark.operators.dataquality import profile_columns

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "a")], "x long, s string"
    )
    out = {r.col_name: r for r in profile_columns(df, ["x", "s"]).collect()}
    assert out["x"].n_rows == 4 and out["x"].n_null == 1
    assert out["x"].n_distinct == 2
    assert (out["x"].min_val, out["x"].max_val) == ("1", "2")
    assert out["s"].n_null == 1 and out["s"].n_distinct == 2
    assert (out["s"].min_val, out["s"].max_val) == ("a", "b")
