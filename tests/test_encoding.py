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


def test_standardize_matches_direct(spark):
    import statistics

    from agnes_spark.operators.encoding import standardize

    vals = [10, 12, 14, 30, 5]
    df = spark.createDataFrame([("g", v) for v in vals] + [("g", None)], "c string, y long")
    out = standardize(df, "y", ["c"]).collect()
    mean, sd = statistics.mean(vals), statistics.stdev(vals)
    got = {r.y: r.y_z for r in out}
    for v in vals:
        assert abs(got[v] - (v - mean) / sd) < 1e-12
    assert got[None] is None


def test_robust_scale_matches_numpy_quantiles(spark):
    import numpy as np

    from agnes_spark.operators.encoding import robust_scale

    vals = [1, 2, 3, 4, 5, 6, 7, 100]
    df = spark.createDataFrame([(v,) for v in vals], "y long")
    out = robust_scale(df, "y").collect()
    q1, q2, q3 = np.percentile(vals, [25, 50, 75])  # linear interpolation
    got = {r.y: r.y_rs for r in out}
    for v in vals:
        assert abs(got[v] - (v - q2) / (q3 - q1)) < 1e-12


def test_quantile_normalize_equalizes_groups(spark):
    from agnes_spark.operators.encoding import quantile_normalize

    # two same-size groups with shifted distributions
    a = [(f"a", 10 * i, i) for i in range(1, 9)]
    b = [(f"b", 1000 + 3 * i, 100 + i) for i in range(1, 9)]
    df = spark.createDataFrame(a + b, "g string, v long, id long")
    out = quantile_normalize(df, "g", "v", "id").collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r.g, []).append(r.v_qn)
    # after normalization both groups carry the SAME distribution
    assert sorted(by_g["a"]) == sorted(by_g["b"])
    # equal group sizes -> rank r maps to global position 2r (even
    # positions of the 16-value global order)
    global_sorted = sorted([v for _, v, _ in a + b])
    want = [global_sorted[2 * r - 1] for r in range(1, 9)]
    assert sorted(by_g["a"]) == sorted(want)


def test_quantile_normalize_preserves_rank_order(spark):
    from agnes_spark.operators.encoding import quantile_normalize

    rows = [("g1", 5, 1), ("g1", 1, 2), ("g1", 9, 3), ("g2", 7, 4)]
    df = spark.createDataFrame(rows, "g string, v long, id long")
    got = {(r.g, r.id): r.v_qn for r in quantile_normalize(df, "g", "v", "id").collect()}
    # within a group, normalization is monotone in the original value
    assert got[("g1", 2)] <= got[("g1", 1)] <= got[("g1", 3)]
    # a singleton group maps to the global maximum (position N)
    assert got[("g2", 4)] == 9


def test_quantile_normalize_rejects_non_integral_values(spark):
    import pytest

    from agnes_spark.operators.encoding import quantile_normalize

    df = spark.createDataFrame(
        [("g", 1.5, 1)], "g string, v double, id long"
    )
    with pytest.raises(ValueError, match="integral value column"):
        quantile_normalize(df, "g", "v", "id")
