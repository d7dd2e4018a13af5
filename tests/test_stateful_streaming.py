"""Stateful streaming: native dedup state and applyInPandasWithState,
driven through memory sinks and checked against batch equivalents."""

import os

import pytest
from pyspark.sql import functions as F

from agnes_spark.streaming.stateful import running_user_stats, streaming_dedup
from agnes_spark.streaming.windows import read_events_stream, run_stream_to_memory


@pytest.fixture(scope="module")
def events_dir(sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stateful")
    os.symlink(os.path.join(sf_dir, "events.parquet"), d / "part-0.parquet")
    return str(d)


def test_streaming_dedup_matches_batch_distinct(spark, sf_dir, events_dir):
    ev = read_events_stream(spark, events_dir)
    dd = streaming_dedup(ev, ["user_id", "event_type"], "ts", "100 days")
    run_stream_to_memory(dd, "dedup_out", output_mode="append")
    got = spark.sql("SELECT count(*) AS c FROM dedup_out").collect()[0].c
    expect = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .select("user_id", "event_type", "ts")
        .distinct()
        .count()
    )
    assert got == expect


def test_running_user_stats_final_state_matches_batch(spark, sf_dir, events_dir):
    ev = read_events_stream(spark, events_dir)
    stats = running_user_stats(ev.select("user_id", "value"))
    run_stream_to_memory(stats, "stats_out", output_mode="update")
    # state emits one row per user per micro-batch; the LAST emission per
    # user is the final running total — compare against batch groupBy
    final = spark.sql(
        """
        SELECT user_id, n_events, total_value FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
          FROM stats_out) WHERE rn = 1
        """
    ).collect()
    got = {r.user_id: (r.n_events, r.total_value) for r in final}
    batch = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("tv"))
        .collect()
    )
    expect = {r.user_id: (r.n, r.tv) for r in batch}
    assert got == expect
