"""foreachBatch parquet sink: streamed windowed agg == batch agg."""

import os

import pytest
from pyspark.sql import functions as F

from agnes_spark.streaming.sinks import run_stream_to_parquet
from agnes_spark.streaming.windows import read_events_stream, windowed_counts


@pytest.fixture(scope="module")
def events_dir(sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("events_sink")
    os.symlink(os.path.join(sf_dir, "events.parquet"), d / "part-0.parquet")
    return str(d)


def test_parquet_sink_matches_batch(spark, sf_dir, events_dir, tmp_path):
    ev = read_events_stream(spark, events_dir)
    agg = windowed_counts(ev, window="1 hour", watermark="100 days")
    out = str(tmp_path / "rollup")
    run_stream_to_parquet(
        agg, out, str(tmp_path / "ckpt"), partition_cols=["event_type"], output_mode="update"
    )
    got = spark.read.parquet(out)

    from agnes_spark.sources.events import read_events

    batch = (
        read_events(spark, os.path.join(sf_dir, "events.parquet"))
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )
    g = {(r.hour, r.event_type): (r.n, r.total_value) for r in got.collect()}
    b = {(r.hour, r.event_type): (r.n, r.total_value) for r in batch.collect()}
    assert g == b
