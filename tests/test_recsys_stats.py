"""Item-item CF, two-feature OLS, and Kaplan-Meier — checked against
brute force / numpy / hand-worked textbook values."""

import math

import numpy as np

from agnes_spark.operators.recsys import itemitem_cosine
from agnes_spark.operators.stats import kaplan_meier, ols_two_features


def test_itemitem_cosine_bruteforce(spark):
    baskets = {
        1: [10, 11, 12],
        2: [10, 11],
        3: [10, 12],
        4: [11, 12],
        5: [10, 11, 13],
        6: [13],
    }
    rows = [(o, p) for o, ps in baskets.items() for p in ps]
    df = spark.createDataFrame(rows, "o long, p long")
    got = {
        (r.p, r.q): (r.common, r.sim)
        for r in itemitem_cosine(df, "o", "p", min_common=2, topk=2).collect()
    }
    # degrees: 10->4, 11->4, 12->3, 13->2; commons: (10,11)=3 (10,12)=2 (11,12)=2
    assert got[(10, 11)] == (3, 3 / math.sqrt(16))
    assert got[(10, 12)] == (2, 2 / math.sqrt(12))
    assert got[(12, 10)][0] == 2  # symmetric direction present
    assert (10, 13) not in got  # common=1 < min_common
    # topk respected: item 10 has exactly 2 neighbors listed
    assert len([k for k in got if k[0] == 10]) == 2


def test_itemitem_duplicate_rows_collapse(spark):
    rows = [(1, 10), (1, 10), (1, 11), (2, 10), (2, 11)]
    df = spark.createDataFrame(rows, "o long, p long")
    got = {
        (r.p, r.q): r.common
        for r in itemitem_cosine(df, "o", "p", min_common=2, topk=3).collect()
    }
    assert got[(10, 11)] == 2  # duplicate (1,10) did not inflate counts


def test_ols_two_features_matches_numpy(spark):
    rng = np.random.RandomState(3)
    x1 = rng.randint(1, 50, 400)
    x2 = rng.randint(0, 10, 400)
    y = (7 + 3 * x1 - 2 * x2 + rng.randint(-4, 5, 400)).astype(np.int64)
    df = spark.createDataFrame(
        [(int(a), int(b), int(c)) for a, b, c in zip(y, x1, x2)],
        "y long, x1 long, x2 long",
    )
    row = ols_two_features(df, "y", "x1", "x2").collect()[0]
    X = np.column_stack([np.ones(400), x1, x2])
    want, *_ = np.linalg.lstsq(X, y.astype(np.float64), rcond=None)
    assert row.n == 400
    assert abs(row.b0 - want[0]) < 1e-6
    assert abs(row.b1 - want[1]) < 1e-8
    assert abs(row.b2 - want[2]) < 1e-8


def test_kaplan_meier_textbook(spark):
    # classic worked example: events at 6 (3x), 7, 10, 13, 16, 22, 23
    # with censorings interleaved (Freireich 6-MP arm, first steps)
    data = [
        (6, 1), (6, 1), (6, 1), (6, 0), (7, 1), (9, 0), (10, 1), (10, 0),
        (11, 0), (13, 1), (16, 1), (17, 0), (19, 0), (20, 0), (22, 1),
        (23, 1), (25, 0), (32, 0), (32, 0), (34, 0), (35, 0),
    ]
    df = spark.createDataFrame(data, "t long, e int")
    got = {r.t: (r.n_risk, r.n_events, r.survival) for r in kaplan_meier(df, "t", "e").collect()}
    assert got[6][:2] == (21, 3)
    assert abs(got[6][2] - 18 / 21) < 1e-12
    assert got[7][:2] == (17, 1)
    assert abs(got[7][2] - (18 / 21) * (16 / 17)) < 1e-12
    assert got[10][:2] == (15, 1)
    assert abs(got[10][2] - (18 / 21) * (16 / 17) * (14 / 15)) < 1e-12
    # censor-only times never appear as output rows
    assert 9 not in got and 11 not in got


def test_ks_distance_matrix_bruteforce(spark):
    from agnes_spark.operators.stats import ks_distance_matrix

    rows = (
        [("a", v) for v in [1, 2, 2, 3, 7]]
        + [("b", v) for v in [2, 3, 3, 9]]
        + [("c", v) for v in [1, 1, 1]]
    )
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        (r.group_a, r.group_b): (r.n_a, r.n_b, r.ks_num, r.ks)
        for r in ks_distance_matrix(df, "g", "v").collect()
    }

    def brute(xs, ys):
        vals = sorted(set(xs) | set(ys))
        best = 0
        for t in vals:
            ca = sum(1 for x in xs if x <= t)
            cb = sum(1 for y in ys if y <= t)
            best = max(best, abs(ca * len(ys) - cb * len(xs)))
        return best

    data = {"a": [1, 2, 2, 3, 7], "b": [2, 3, 3, 9], "c": [1, 1, 1]}
    for ga, gb in [("a", "b"), ("a", "c"), ("b", "c")]:
        num = brute(data[ga], data[gb])
        n_a, n_b = len(data[ga]), len(data[gb])
        assert got[(ga, gb)] == (n_a, n_b, num, num / (n_a * n_b))
    # identical distributions would give 0; disjoint ones give 1
    assert got[("b", "c")][3] == 1.0  # c entirely below b's support


def test_winsorized_mean_reference(spark):
    from agnes_spark.operators.stats import winsorized_mean

    vals = list(range(1, 101)) + [10_000, -10_000]  # n=102, lo=5
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    row = winsorized_mean(df, "v", pct=5).collect()[0]
    srt = sorted(vals)
    lo = 102 * 5 // 100
    lo_cut, hi_cut = srt[lo], srt[102 - lo - 1]
    wins = [min(max(v, lo_cut), hi_cut) for v in vals]
    assert (row.n_total, row.lo_cut, row.hi_cut) == (102, lo_cut, hi_cut)
    assert abs(row.mean - sum(wins) / 102) < 1e-9
    # clamping (not dropping): sample size preserved, outliers tamed
    assert 40 < row.mean < 60


def test_winsorized_no_clamp_when_pct_zero_bucket(spark):
    from agnes_spark.operators.stats import winsorized_mean

    vals = [3, 1, 2]  # n=3, lo = 0 -> plain mean
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    row = winsorized_mean(df, "v", pct=5).collect()[0]
    assert row.mean == 2.0 and row.lo_cut == 1 and row.hi_cut == 3


def test_theil_sen_exact_line_recovers_slope(spark):
    from agnes_spark.operators.stats import theil_sen

    # y = 3x + 7 exactly: every pairwise slope is 3, every residual 7
    rows = [(x, 3 * x + 7) for x in range(10)]
    df = spark.createDataFrame(rows, "x long, y long")
    r = theil_sen(df, "x", "y").first()
    assert (r.n_points, r.n_pairs) == (10, 45)
    assert r.slope == 3.0 and r.intercept == 7.0


def test_theil_sen_ignores_one_outlier(spark):
    from agnes_spark.operators.stats import theil_sen

    # one wild outlier cannot bend the median slope (OLS it would)
    rows = [(x, 2 * x) for x in range(20)] + [(20, 100000)]
    df = spark.createDataFrame(rows, "x long, y long")
    r = theil_sen(df, "x", "y").first()
    assert r.slope == 2.0
