"""Categorical encoding operators (operators/encoding.py)."""

from agnes_spark.operators.encoding import (
    frequency_encode,
    one_hot_encode,
    target_encode_loo,
)


def test_frequency_encode_counts_nulls_as_group(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3), (None, 4), (None, 5)], "c string, y long"
    )
    out = {(r.c, r.y): r.c_freq for r in frequency_encode(df, "c").collect()}
    assert out[("a", 1)] == 2 and out[("b", 3)] == 1
    assert out[(None, 4)] == 2  # null-safe group


def test_target_encode_loo_excludes_own_row(spark):
    df = spark.createDataFrame(
        [("a", 10), ("a", 20), ("a", 30), ("b", 5), ("b", None)],
        "c string, y long",
    )
    rows = target_encode_loo(df, "c", "y").collect()
    got = {(r.c, r.y): r.c_te for r in rows}
    assert got[("a", 10)] == 25.0  # (20+30)/2
    assert got[("a", 20)] == 20.0
    assert got[("a", 30)] == 15.0
    assert got[("b", 5)] is None  # alone among non-null targets
    assert got[("b", None)] is None  # own target null


def test_one_hot_encode_fixed_categories(spark):
    df = spark.createDataFrame([("O",), ("F",), ("X",)], "s string")
    out = one_hot_encode(df, "s", ["O", "F"]).collect()
    got = {r.s: (r.s_is_o, r.s_is_f) for r in out}
    assert got == {"O": (1, 0), "F": (0, 1), "X": (0, 0)}
