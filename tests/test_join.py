"""Join operator tests — model: reference src/join.rs predicate tests."""

from pyspark.sql import functions as F

from agnes_spark.operators.join import asof_join, band_join, predicate_join
from agnes_spark.sources.memory import table


def _sides(spark):
    left = table(spark, {"lk": [1, 2, 3], "lv": [10.0, 20.0, 30.0]}, types={"lk": "int", "lv": "double"})
    right = table(spark, {"rk": [2, 3, 4], "rv": [200.0, 300.0, 400.0]}, types={"rk": "int", "rv": "double"})
    return left, right


def test_equal_join(spark):
    left, right = _sides(spark)
    out = predicate_join(left, right, "lk", "rk", "==")
    assert sorted((r.lk, r.rk) for r in out.collect()) == [(2, 2), (3, 3)]


def test_theta_joins(spark):
    left, right = _sides(spark)
    lt = predicate_join(left, right, "lk", "rk", "<")
    assert sorted((r.lk, r.rk) for r in lt.collect()) == [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
    ]
    ge = predicate_join(left, right, "lk", "rk", ">=")
    assert sorted((r.lk, r.rk) for r in ge.collect()) == [(2, 2), (3, 2), (3, 3)]


def test_outer_how(spark):
    left, right = _sides(spark)
    out = predicate_join(left, right, "lk", "rk", "==", how="left")
    assert out.count() == 3
    missing = [r for r in out.collect() if r.rk is None]
    assert len(missing) == 1 and missing[0].lk == 1


def test_band_join_equals_nested_loop(spark, lineitem):
    a = lineitem.select(F.col("l_orderkey").alias("ak"), F.col("l_quantity").alias("av")).limit(300)
    b = lineitem.select(F.col("l_orderkey").alias("bk"), F.col("l_quantity").alias("bv")).limit(300)
    width = 0.5
    banded = band_join(a, b, "av", "bv", width).count()
    exact = a.join(b, F.abs(a["av"] - b["bv"]) <= width).count()
    assert banded == exact


def test_asof_join_backward(spark):
    trades = table(
        spark,
        {"sym": ["A", "A", "B"], "ts": [3, 7, 5], "px": [1.0, 2.0, 9.0]},
        types={"sym": "string", "ts": "bigint", "px": "double"},
    )
    quotes = table(
        spark,
        {"sym": ["A", "A", "A", "B"], "ts": [1, 4, 8, 9], "bid": [0.9, 1.1, 2.1, 8.0]},
        types={"sym": "string", "ts": "bigint", "bid": "double"},
    )
    out = asof_join(trades, quotes, on="ts", by=["sym"], right_values=["bid"])
    got = {(r.sym, r.ts): r.bid for r in out.collect()}
    # A@3 -> quote@1; A@7 -> quote@4; B@5 -> no quote yet
    assert got == {("A", 3): 0.9, ("A", 7): 1.1, ("B", 5): None}


def test_asof_join_forward(spark):
    trades = table(spark, {"sym": ["A"], "ts": [3], "px": [1.0]}, types={"sym": "string", "ts": "bigint", "px": "double"})
    quotes = table(
        spark,
        {"sym": ["A", "A"], "ts": [1, 4], "bid": [0.9, 1.1]},
        types={"sym": "string", "ts": "bigint", "bid": "double"},
    )
    out = asof_join(trades, quotes, on="ts", by=["sym"], right_values=["bid"], direction="forward")
    assert out.collect()[0].bid == 1.1


def test_asof_join_exact_timestamp_match(spark):
    """Both directions include a right row at exactly the left timestamp
    (pandas merge_asof default, allow_exact_matches=True)."""
    trades = table(
        spark,
        {"sym": ["A", "A"], "ts": [3, 6], "px": [1.0, 2.0]},
        types={"sym": "string", "ts": "bigint", "px": "double"},
    )
    quotes = table(
        spark,
        {"sym": ["A", "A"], "ts": [3, 6], "bid": [0.9, 1.1]},
        types={"sym": "string", "ts": "bigint", "bid": "double"},
    )
    fwd = asof_join(trades, quotes, on="ts", by=["sym"], right_values=["bid"], direction="forward")
    assert {r.ts: r.bid for r in fwd.collect()} == {3: 0.9, 6: 1.1}
    bwd = asof_join(trades, quotes, on="ts", by=["sym"], right_values=["bid"])
    assert {r.ts: r.bid for r in bwd.collect()} == {3: 0.9, 6: 1.1}


def test_asof_join_tolerance(spark):
    """Matches further than tolerance_seconds are nulled (pandas
    merge_asof parity)."""
    from agnes_spark.operators.join import asof_join
    from agnes_spark.sources.memory import table

    trades = table(
        spark,
        {"sym": ["A", "A", "A"], "t": [100.0, 200.0, 500.0], "qty": [1, 2, 3]},
        types={"sym": "string", "t": "double", "qty": "int"},
    )
    quotes = table(
        spark,
        {"sym": ["A", "A"], "t": [95.0, 180.0], "px": [10.0, 11.0]},
        types={"sym": "string", "t": "double", "px": "double"},
    )
    out = asof_join(
        trades, quotes, on="t", by=["sym"], right_values=["px"],
        tolerance_seconds=30.0,
    )
    got = {r.t: r.px for r in out.collect()}
    # t=100 matches 95 (gap 5), t=200 matches 180 (gap 20), t=500's
    # nearest prior quote is 320s old -> nulled
    assert got == {100.0: 10.0, 200.0: 11.0, 500.0: None}

    no_tol = asof_join(trades, quotes, on="t", by=["sym"], right_values=["px"])
    assert {r.t: r.px for r in no_tol.collect()} == {100.0: 10.0, 200.0: 11.0, 500.0: 11.0}


def test_fuzzy_join_banded_full_recall(spark):
    """Length banding must lose no true match (the length bound is
    implied by the distance bound): every pair within max_dist appears,
    nothing beyond it does, and the join stays equi (no cartesian)."""
    from agnes_spark.operators.join import fuzzy_join
    from agnes_spark.plans import has_cartesian

    left = spark.createDataFrame(
        [(1, "red widget"), (2, "blu bolt"), (3, "xyzzy")], "id long, q string"
    )
    right = spark.createDataFrame(
        [("red widget",), ("blue bolt",), ("hot gear",)], "name string"
    )
    out = fuzzy_join(left, right, "q", "name", max_dist=1)
    got = {(r["id"], r["name"], r["edit_dist"]) for r in out.collect()}
    assert got == {(1, "red widget", 0), (2, "blue bolt", 1)}
    assert not has_cartesian(out)


def test_fuzzy_join_empty_strings_match(spark):
    """levenshtein(x, '') = len(x), so empty right-side strings ARE
    within max_dist of left strings of length <= max_dist; the
    length-0 bucket must not be filtered out of the candidate set."""
    from agnes_spark.operators.join import fuzzy_join

    left = spark.createDataFrame([(1, "a"), (2, ""), (3, "abc")], "id long, q string")
    right = spark.createDataFrame([("",), ("b",)], "name string")
    got = {
        (r["id"], r["name"], r["edit_dist"])
        for r in fuzzy_join(left, right, "q", "name", max_dist=1).collect()
    }
    assert got == {(1, "", 1), (1, "b", 1), (2, "", 0), (2, "b", 1)}
