"""Incremental partition-level rollup maintenance."""

from pyspark.sql import functions as F

from agnes_spark.operators.incremental import (
    build_rollup,
    incremental_refresh,
    write_rollup,
)
from agnes_spark.sources.memory import table


def _facts(spark, rows):
    days, keys, vals = zip(*rows)
    return table(
        spark,
        {"day": list(days), "k": list(keys), "v": list(vals)},
        types={"day": "string", "k": "string", "v": "long"},
    )


def test_incremental_refresh_rebuilds_only_touched_partitions(spark, tmp_path):
    base = str(tmp_path / "roll")
    aggs = [F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")]
    v1 = _facts(spark, [("d1", "a", 1), ("d1", "b", 2), ("d2", "a", 3)])
    write_rollup(build_rollup(v1, "day", ["k"], aggs), base, "day")

    # late rows land in d2 and a brand-new d3; d1 must stay untouched
    late = _facts(spark, [("d2", "a", 10), ("d3", "b", 7)])
    v2 = v1.unionByName(late)
    parts = incremental_refresh(v2, late, base, "day", ["k"], aggs)
    assert sorted(parts) == ["d2", "d3"]

    got = {
        (r.day, r.k): (r.n, r.s)
        for r in spark.read.parquet(base).collect()
    }
    expected = {
        (r.day, r.k): (r.n, r.s)
        for r in build_rollup(v2, "day", ["k"], aggs).collect()
    }
    assert got == expected


def test_incremental_refresh_empty_updates_is_noop(spark, tmp_path):
    base = str(tmp_path / "roll")
    aggs = [F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")]
    v1 = _facts(spark, [("d1", "a", 1)])
    write_rollup(build_rollup(v1, "day", ["k"], aggs), base, "day")
    parts = incremental_refresh(v1, v1.filter(F.lit(False)), base, "day", ["k"], aggs)
    assert parts == []
    assert spark.read.parquet(base).count() == 1
