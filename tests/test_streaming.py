"""Structured Streaming twins driven end-to-end through memory sinks,
cross-checked against the oracle-verified batch queries."""

import os

import pytest

import __spark_entry__ as entry
from agnes_spark.streaming.windows import (
    read_events_stream,
    run_stream_to_memory,
    session_windows,
    windowed_counts,
)


@pytest.fixture(scope="module")
def events_dir(sf_dir, tmp_path_factory):
    # the streaming file source consumes a directory (prod layout:
    # events/part-*.parquet); stage the single test file into one
    d = tmp_path_factory.mktemp("events_stream")
    os.symlink(os.path.join(sf_dir, "events.parquet"), d / "part-0.parquet")
    return str(d)


@pytest.fixture(scope="module")
def events_stream_results(spark, events_dir):
    ev = read_events_stream(spark, events_dir)
    agg = windowed_counts(ev, window="1 hour", watermark="100 days")
    run_stream_to_memory(agg, "win_out", output_mode="complete")
    return spark.sql("SELECT * FROM win_out")


def test_windowed_counts_match_batch(spark, sf_dir, events_stream_results):
    batch = {
        (r.hour, r.event_type): (r.n, r.total_value)
        for r in entry.events_windowed(spark, sf_dir).collect()
    }
    stream = {
        (r.hour, r.event_type): (r.n, r.total_value)
        for r in events_stream_results.collect()
    }
    assert stream == batch


def test_session_window_stream_runs(spark, sf_dir, events_dir):
    ev = read_events_stream(spark, events_dir)
    sess = session_windows(ev, gap="1 hour", watermark="100 days")
    run_stream_to_memory(sess, "sess_out", output_mode="complete")
    rows = spark.sql("SELECT * FROM sess_out").collect()
    assert len(rows) > 0
    # session bounds sane: start <= end, n_events >= 1
    assert all(r.session_start <= r.session_end and r.n_events >= 1 for r in rows)
