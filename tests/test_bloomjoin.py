"""Bloom semi-join reduction: no false negatives, exact join parity,
and the sizing contract."""

import pytest
from pyspark.sql import functions as F

from agnes_spark.operators.bloomjoin import (
    bloom_might_contain,
    bloom_semi_join,
    build_bloom,
)


def test_no_false_negatives(spark, sf_dir):
    """Every dimension key must pass its own filter's probe — a false
    negative would silently drop matching fact rows."""
    dim = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(500)
    words = build_bloom(dim, "o_orderkey", num_bits=1 << 12, num_hashes=4)
    missed = dim.filter(
        ~bloom_might_contain(F.col("o_orderkey"), words, 1 << 12, 4)
    ).count()
    assert missed == 0


def test_join_parity_with_plain_join(spark, sf_dir):
    """bloom_semi_join == plain join, row for row (false positives are
    removed by the exact join stage)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_totalprice") > 400000.0
    )
    got = (
        bloom_semi_join(li, o, "l_orderkey", "o_orderkey", 1 << 13, 5)
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_orderkey").alias("s"),
        )
        .first()
    )
    want = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_orderkey").alias("s"))
        .first()
    )
    assert (got["n"], got["s"]) == (want["n"], want["s"]) and want["n"] > 0


def test_probe_prunes_most_nonmatching_rows(spark, sf_dir):
    """With sane sizing the false-positive leakage is a sliver: the
    pruned fact side must be far closer to the true match count than
    to the full table (this is the reduction that saves the shuffle)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-03-01")
    )
    words = build_bloom(o, "o_orderkey", num_bits=1 << 14, num_hashes=5)
    total = li.count()
    pruned = li.filter(
        bloom_might_contain(F.col("l_orderkey"), words, 1 << 14, 5)
    ).count()
    true_matches = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert pruned < total * 0.10
    assert pruned - true_matches <= 0.01 * total  # fp leakage < 1% of the table


def test_word_count_is_bounded_not_data_sized(spark):
    """The driver-side artifact is num_bits/64 longs regardless of how
    many keys went in."""
    dim = spark.range(10_000).withColumnRenamed("id", "k")
    words = build_bloom(dim, "k", num_bits=1 << 12, num_hashes=3)
    assert len(words) == (1 << 12) // 64


def test_num_bits_must_be_word_aligned(spark):
    dim = spark.range(10).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="multiple of 64"):
        build_bloom(dim, "k", num_bits=100)


def test_size_bloom_holds_fp_rate_across_scales(spark, sf_dir):
    """Sizing from the key count keeps the probe's leakage near the
    target at any dimension size (a fixed size would degrade 10x when
    the dimension grows 10x)."""
    from agnes_spark.operators.bloomjoin import size_bloom

    # textbook check: 1k and 10k keys at 1% -> ~9.6 bits/key, k ~ 7
    for n in (1_000, 10_000):
        m, k = size_bloom(n, 0.01)
        assert 9.0 <= m / n <= 10.5
        assert 6 <= k <= 8
        assert m % 64 == 0
    # degenerate inputs stay valid
    assert size_bloom(0) == (64, 1)


def test_auto_sized_semi_join_parity(spark, sf_dir):
    """num_bits=None sizes from dim.count() and still returns the
    exact join result."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    got = bloom_semi_join(li, o, "l_orderkey", "o_orderkey").count()
    want = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert got == want and want > 0


def test_outer_and_anti_joins_rejected(spark):
    """Left/full outer and anti joins would need the fact rows the
    probe removes — the operator must refuse instead of silently
    returning wrong results."""
    f = spark.range(10).withColumnRenamed("id", "fk")
    d = spark.range(3).withColumnRenamed("id", "dk")
    for how in ("left", "full", "left_anti", "anti"):
        with pytest.raises(ValueError, match="inner/semi/right"):
            bloom_semi_join(f, d, "fk", "dk", 64, 2, how=how)
