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


def test_ingest_dedup_first_arrival_wins_across_batches(spark, tmp_path):
    """Cross-batch store semantics: a later batch's duplicate is dropped
    even when it carries a LOWER id than the stored keeper — i.e. the
    store implements first-ARRIVAL-wins, not global min-id. Also checks
    in-batch dedup (min id within the first batch)."""
    from agnes_spark.sources.memory import table
    from agnes_spark.streaming.sinks import run_ingest_dedup

    src = tmp_path / "src"
    src.mkdir()
    t = {"doc_id": "bigint", "text": "string"}
    # batch 1: ids 10,11 (+ an in-batch dup 12 of 10's text)
    table(
        spark,
        {"doc_id": [10, 11, 12], "text": ["aa", "bb", "aa"]},
        types=t,
    ).coalesce(1).write.parquet(str(src / "f1.parquet"))
    # batch 2: id 1 duplicates "aa" (lower id than keeper 10), id 13 is new
    table(
        spark,
        {"doc_id": [1, 13], "text": ["aa", "cc"]},
        types=t,
    ).coalesce(1).write.parquet(str(src / "f2.parquet"))
    # file stream orders by mod time: make f1 strictly older
    for root, offset in ((src / "f1.parquet", -1000), (src / "f2.parquet", 0)):
        for p in root.rglob("*"):
            os.utime(p, (p.stat().st_mtime + offset, p.stat().st_mtime + offset))
    schema = "doc_id bigint, text string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*.parquet"))
    )
    run_ingest_dedup(
        stream,
        str(tmp_path / "store"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        "doc_id",
        "text",
    )
    kept = {r.doc_id for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert kept == {10, 11, 13}
    store = {
        (r.content_hash[:8], r.keep_id)
        for r in spark.read.parquet(str(tmp_path / "store")).collect()
    }
    assert {k for _, k in store} == {10, 11, 13}


def test_ingest_neardup_finds_cross_batch_pairs(spark, tmp_path):
    """A later batch's near-duplicate of an earlier batch's document is
    detected via the persisted band index (no rescan of earlier text),
    and batch-internal pairs are found too."""
    from agnes_spark.sources.memory import table
    from agnes_spark.streaming.sinks import run_ingest_neardup

    base = "the quick brown fox jumps over the lazy dog again and again today"
    src = tmp_path / "src"
    src.mkdir()
    t = {"doc_id": "bigint", "text": "string"}
    table(
        spark,
        {"doc_id": [1, 2], "text": [base, "completely different words appear in this one here"]},
        types=t,
    ).coalesce(1).write.parquet(str(src / "f1.parquet"))
    table(
        spark,
        {
            "doc_id": [10, 11],
            "text": [base + " extra", base + " extra"],  # near-dup of 1 + exact pair
        },
        types=t,
    ).coalesce(1).write.parquet(str(src / "f2.parquet"))
    for root, offset in ((src / "f1.parquet", -1000), (src / "f2.parquet", 0)):
        for p in root.rglob("*"):
            os.utime(p, (p.stat().st_mtime + offset, p.stat().st_mtime + offset))
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*.parquet"))
    )
    run_ingest_neardup(
        stream,
        str(tmp_path / "state"),
        str(tmp_path / "pairs"),
        str(tmp_path / "ckpt"),
        "doc_id",
        "text",
        threshold=0.5,
    )
    pairs = {
        (r.a_id, r.b_id) for r in spark.read.parquet(str(tmp_path / "pairs")).collect()
    }
    assert (1, 10) in pairs and (1, 11) in pairs  # cross-batch via the index
    assert (10, 11) in pairs                      # batch-internal
    assert all(2 not in p for p in pairs)


def test_ingest_dedup_checkpoint_resume_no_reprocess(spark, tmp_path):
    """Restarting the ingest stream with the same checkpoint processes
    only NEW files: already-accepted content is not duplicated in the
    output and the store grows only by the new batch's new hashes."""
    from agnes_spark.sources.memory import table
    from agnes_spark.streaming.sinks import run_ingest_dedup

    src = tmp_path / "src"
    src.mkdir()
    t = {"doc_id": "bigint", "text": "string"}
    table(spark, {"doc_id": [1, 2], "text": ["aa", "bb"]}, types=t).coalesce(
        1
    ).write.parquet(str(src / "f1.parquet"))
    args = (
        str(tmp_path / "store"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        "doc_id",
        "text",
    )
    schema = "doc_id bigint, text string"

    def run():
        stream = spark.readStream.schema(schema).parquet(str(src / "*.parquet"))
        run_ingest_dedup(stream, *args)

    run()
    assert spark.read.parquet(str(tmp_path / "out")).count() == 2
    # second file arrives: one dup of doc 1's content, one new doc
    table(spark, {"doc_id": [3, 4], "text": ["aa", "cc"]}, types=t).coalesce(
        1
    ).write.parquet(str(src / "f2.parquet"))
    run()  # resume from the same checkpoint
    kept = {r.doc_id for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert kept == {1, 2, 4}  # f1 NOT reprocessed, dup 3 rejected
    store_ids = {
        r.keep_id for r in spark.read.parquet(str(tmp_path / "store")).collect()
    }
    assert store_ids == {1, 2, 4}
