"""Naive-Bayes lift tokens, trimmed mean, association rules."""

import numpy as np

from agnes_spark.operators.classify import naive_bayes_top_tokens
from agnes_spark.operators.recsys import association_rules
from agnes_spark.operators.stats import trimmed_mean


def test_nb_top_tokens_lift_values(spark):
    rows = [
        ("fr", "le chat le chien le"),
        ("fr", "le vin le pain"),
        ("en", "the cat the dog the"),
        ("en", "the wine the bread"),
    ]
    df = spark.createDataFrame(rows, "lang string, text string")
    got = {
        (r.cls, r.token): (r.n, r.lift)
        for r in naive_bayes_top_tokens(
            df, "lang", "text", top=3, min_count=3
        ).collect()
    }
    # corpus: 18 tokens, vocab 10; 'le' 5x all in fr (fr has 9 tokens)
    n, lift = got[("fr", "le")]
    assert n == 5
    want = ((5 + 1) / (9 + 10)) / ((5 + 1) / (18 + 10))
    assert abs(lift - want) < 1e-15
    assert ("en", "the") in got
    assert ("fr", "chat") not in got  # below min_count


def test_trimmed_mean_matches_numpy(spark):
    vals = list(range(1, 101)) + [10_000, -10_000]  # gross outliers
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    row = trimmed_mean(df, "v", trim_pct=5).collect()[0]
    # n=102, lo = 5, hi = 97 -> keeps sorted[5:97]
    srt = np.sort(np.array(vals))
    want = srt[5:97].mean()
    assert row.n_total == 102 and row.n_kept == 92
    assert abs(row.mean - want) < 1e-12
    # outliers gone: mean is near the clean center
    assert 40 < row.mean < 60


def test_trimmed_mean_with_heavy_ties(spark):
    vals = [1] * 50 + [2] * 50
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    row = trimmed_mean(df, "v", trim_pct=10).collect()[0]
    # lo=10, hi=90: keeps 40 ones + 40 twos
    assert row.n_kept == 80 and row.mean == 1.5


def test_association_rules_scores(spark):
    baskets = {1: [10, 11], 2: [10, 11], 3: [10, 12], 4: [10, 12], 5: [11]}
    rows = [(o, p) for o, ps in baskets.items() for p in ps]
    df = spark.createDataFrame(rows, "o long, p long")
    got = {
        (r.ante, r.cons): (r.common, r.support, r.confidence, r.lift)
        for r in association_rules(df, "o", "p", min_common=2, top=10).collect()
    }
    # N=5 baskets; d10=4, d11=3, d12=2; c(10,11)=2, c(10,12)=2
    c, s, conf, lift = got[(10, 11)]
    assert (c, s) == (2, 2 / 5)
    assert conf == 2 / 4
    assert lift == (2 * 5) / (4 * 3)
    assert got[(11, 10)][2] == 2 / 3  # directed confidence differs
    assert got[(12, 10)][3] == (2 * 5) / (2 * 4)
