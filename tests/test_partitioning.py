"""Skew-mitigation tests: salted join must be result-identical to the
plain join, and split hot keys across salt values."""

from pyspark.sql import functions as F

from agnes_spark.operators.partitioning import repartition_for_join, salted_join
from agnes_spark.sources.memory import table


def _skewed(spark):
    # hot key 1 (100 rows), long tail
    left = table(
        spark,
        {
            "k": [1] * 100 + list(range(2, 22)),
            "v": list(range(120)),
        },
        types={"k": "int", "v": "int"},
    )
    right = table(
        spark,
        {"k": list(range(1, 22)), "name": [f"n{i}" for i in range(1, 22)]},
        types={"k": "int", "name": "string"},
    )
    return left, right


def test_salted_join_matches_plain_join(spark):
    left, right = _skewed(spark)
    plain = {(r.k, r.v, r.name) for r in left.join(right, "k").collect()}
    salted = {(r.k, r.v, r.name) for r in salted_join(left, right, ["k"], salt_factor=4).collect()}
    assert salted == plain
    assert len(salted) == 120


def test_salted_join_outer(spark):
    left, right = _skewed(spark)
    right_missing = right.filter(F.col("k") != 1)  # hot key unmatched
    plain = {(r.k, r.v, r.name) for r in left.join(right_missing, "k", "left").collect()}
    salted = {
        (r.k, r.v, r.name)
        for r in salted_join(left, right_missing, ["k"], salt_factor=4, how="left").collect()
    }
    assert salted == plain


def test_salt_actually_splits_hot_key(spark):
    left, _ = _skewed(spark)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(4))
    n_salts = left.filter(F.col("k") == 1).select(salt.alias("s")).distinct().count()
    assert n_salts > 1  # the hot key's rows really fan out


def test_repartition_for_join_sets_partitioning(spark):
    left, _ = _skewed(spark)
    df = repartition_for_join(left, ["k"], 8)
    assert df.rdd.getNumPartitions() == 8


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    """Tables co-bucketed on the join key sort-merge-join with ZERO
    exchanges — the 100 TB play for repeated fact-fact joins."""
    from agnes_spark.operators.partitioning import write_bucketed
    from agnes_spark.plans import plan_string

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    spark.sql("DROP TABLE IF EXISTS bk_cust")
    spark.sql("DROP TABLE IF EXISTS bk_orders")
    write_bucketed(cust, "bk_cust", ["c_custkey"], num_buckets=4, path=str(tmp_path / "c"))
    write_bucketed(
        orders.withColumnRenamed("o_custkey", "c_custkey"),
        "bk_orders", ["c_custkey"], num_buckets=4, path=str(tmp_path / "o"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bk_cust").join(spark.table("bk_orders"), "c_custkey")
        plan = plan_string(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == cust.join(orders, cust.c_custkey == orders.o_custkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bk_cust")
        spark.sql("DROP TABLE IF EXISTS bk_orders")


def test_zorder_value_interleaves_bits(spark):
    """Known Morton codes for 2-D points: z(x=0b11, y=0b01) with 2 bits
    = x0 + y0<<1 + x1<<2 + y1<<3 = 1 + 2 + 4 + 0 = 7."""
    from agnes_spark.operators.partitioning import zorder_value
    from agnes_spark.sources.memory import table

    df = table(
        spark,
        {"x": [3, 0, 1, 3], "y": [1, 0, 1, 3]},
        types={"x": "bigint", "y": "bigint"},
    )
    out = [r.z for r in df.select(zorder_value(["x", "y"], bits=2).alias("z")).collect()]
    assert out == [7, 0, 3, 15]


def test_write_zordered_clusters_both_dimensions(spark, sf_dir, tmp_path):
    """Files written z-ordered on (l_orderkey, l_partkey) carry narrow
    per-file ranges on BOTH columns: the max per-file key span is far
    below the global span for each dimension (a plain single-column
    sort achieves this only for its leading key)."""
    from pyspark.sql import functions as F

    from agnes_spark.operators.partitioning import write_zordered

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    out = str(tmp_path / "zli")
    write_zordered(li, out, ["l_orderkey", "l_partkey"], bits=10, num_files=16)
    back = spark.read.parquet(out)
    assert back.count() == li.count()
    per_file = (
        back.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(
            (F.max("l_orderkey") - F.min("l_orderkey")).alias("ospan"),
            (F.max("l_partkey") - F.min("l_partkey")).alias("pspan"),
        )
        .collect()
    )
    g = li.agg(
        (F.max("l_orderkey") - F.min("l_orderkey")).alias("o"),
        (F.max("l_partkey") - F.min("l_partkey")).alias("p"),
    ).collect()[0]
    assert len(per_file) > 4
    # median per-file span well under the global span in BOTH dims
    ospans = sorted(r.ospan for r in per_file)
    pspans = sorted(r.pspan for r in per_file)
    assert ospans[len(ospans) // 2] < g.o * 0.5
    assert pspans[len(pspans) // 2] < g.p * 0.5


def test_compact_small_files_merges_and_preserves(spark, sf_dir, tmp_path):
    """Compaction collapses a fragmented directory into the computed
    file count without touching any row."""
    from agnes_spark.operators.partitioning import compact_small_files

    nat = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    frag = str(tmp_path / "frag")
    out = str(tmp_path / "compact")
    nat.repartition(16).write.parquet(frag)
    n_frag = len(list((tmp_path / "frag").glob("*.parquet")))
    assert n_frag == 16
    # target far above total size -> everything fits in one file
    n = compact_small_files(spark, frag, out, target_file_bytes=1 << 30)
    assert n == 1
    assert len(list((tmp_path / "compact").glob("*.parquet"))) == 1
    a = {tuple(r) for r in nat.collect()}
    b = {tuple(r) for r in spark.read.parquet(out).collect()}
    assert a == b
