"""Streaming joins vs their batch twins (memory-sink driven)."""

import os

import pytest
from pyspark.sql import functions as F

from agnes_spark.streaming.joins import enrich_stream, stream_self_join
from agnes_spark.streaming.windows import read_events_stream, run_stream_to_memory


@pytest.fixture(scope="module")
def events_dir(sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("events_joins")
    os.symlink(os.path.join(sf_dir, "events.parquet"), d / "part-0.parquet")
    return str(d)


def _batch_events(spark, sf_dir):
    from agnes_spark.sources.events import read_events

    return read_events(spark, os.path.join(sf_dir, "events.parquet"))


def test_enrich_stream_matches_batch(spark, sf_dir, events_dir):
    dim = spark.createDataFrame(
        [("click", 1.0), ("view", 0.5), ("purchase", 10.0)], "event_type string, weight double"
    )
    ev = read_events_stream(spark, events_dir)
    run_stream_to_memory(enrich_stream(ev, dim, "event_type"), "enriched_out")
    got = spark.sql("SELECT count(*) AS c, round(sum(weight), 2) AS s FROM enriched_out").collect()[0]
    batch = _batch_events(spark, sf_dir).join(dim, "event_type")
    expect = batch.agg(
        F.count(F.lit(1)).alias("c"), F.round(F.sum("weight"), 2).alias("s")
    ).collect()[0]
    assert (got.c, got.s) == (expect.c, expect.s)


def test_stream_self_join_matches_batch(spark, sf_dir, events_dir):
    ev = read_events_stream(spark, events_dir)
    joined = stream_self_join(ev, band="30 minutes", watermark="100 days")
    run_stream_to_memory(joined, "selfjoin_out")
    got = spark.sql("SELECT count(*) AS c FROM selfjoin_out").collect()[0].c

    b = _batch_events(spark, sf_dir)
    l = b.select(F.col("user_id").alias("k"), F.col("event_id").alias("l_id"), F.col("ts").alias("l_ts"))
    r = b.select(F.col("user_id").alias("k2"), F.col("event_id").alias("r_id"), F.col("ts").alias("r_ts"))
    expect = (
        l.join(
            r,
            (F.col("k") == F.col("k2"))
            & (F.col("l_id") < F.col("r_id"))
            & (F.col("r_ts") >= F.col("l_ts"))
            & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 30 minutes")),
        ).count()
    )
    assert got == expect
