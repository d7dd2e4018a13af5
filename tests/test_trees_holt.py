"""Decision stump and Holt smoothing — brute force / hand recursion."""

import itertools

from agnes_spark.operators.timeseries import holt_smoothing
from agnes_spark.operators.trees import decision_stump


def _brute_stump(rows):
    vals = sorted({v for v, _ in rows})
    n = len(rows)
    best = None
    for v in vals[:-1]:  # both sides nonempty
        left = [(x, y) for x, y in rows if x <= v]
        right = [(x, y) for x, y in rows if x > v]
        nl, nr = len(left), len(right)
        pl = sum(y for _, y in left)
        pr = sum(y for _, y in right)
        gl = 1.0 - (pl / nl) ** 2 - ((nl - pl) / nl) ** 2
        gr = 1.0 - (pr / nr) ** 2 - ((nr - pr) / nr) ** 2
        g = nl / n * gl + nr / n * gr
        cand = (g, v, nl, pl, nr, pr)
        if best is None or cand < best:
            best = cand
    return best


def test_decision_stump_matches_bruteforce(spark):
    rows = [((i * 37) % 200, 1 if (i * 37) % 200 < 90 else (i % 7 == 0)) for i in range(300)]
    rows = [(v, int(y)) for v, y in rows]
    df = spark.createDataFrame(rows, "x long, y int")
    got = decision_stump(df, "x", "y").collect()[0]
    g, v, nl, pl, nr, pr = _brute_stump(rows)
    assert got.split_value == v
    assert abs(got.gini - g) < 1e-12
    assert (got.n_left, got.pos_left, got.n_right, got.pos_right) == (
        nl,
        pl,
        nr,
        pr,
    )
    # sanity: a perfectly separating split exists near 89/90 boundary
    assert 80 <= got.split_value <= 95


def test_decision_stump_perfect_split(spark):
    rows = [(i, 1 if i < 50 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, "x long, y int")
    got = decision_stump(df, "x", "y").collect()[0]
    assert got.split_value == 49
    assert got.gini == 0.0
    assert got.pos_left == 50 and got.pos_right == 0


def test_holt_matches_hand_recursion(spark):
    ys = [100, 130, 90, 160, 170, 40, 200, 210]
    rows = [(i, y) for i, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "t long, y long")
    got = {
        r.t: (r.level, r.trend)
        for r in holt_smoothing(df, "t", "y", alpha=0.3, beta=0.2).collect()
    }
    l, b = float(ys[0]), 0.0
    assert got[0] == (l, b)
    for i, y in enumerate(ys[1:], start=1):
        lp = 0.3 * y + 0.7 * (l + b)
        b = 0.2 * (0.3 * y + 0.7 * (l + b) - l) + 0.8 * b
        l = lp
        assert got[i] == (l, b), i
    # trend turns positive on the rising tail
    assert got[7][1] > 0
