"""Production sink patterns for streaming queries.

The memory sink in windows.py is for tests; real deployments write
through foreachBatch so each micro-batch lands transactionally and
reprocessing is idempotent. Patterns here:

- `parquet_upsert_sink`: partition-overwrite idempotence — every
  micro-batch (re)writes exactly the partitions it touches (dynamic
  partitionOverwriteMode), so replaying a batch after a failure
  converges instead of duplicating.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def parquet_upsert_sink(out_path: str, partition_cols: list[str]):
    """foreachBatch function writing each micro-batch to parquet with
    dynamic partition overwrite (only touched partitions replaced).

    Use with a watermarked aggregation in update/complete mode where a
    partition column (e.g. window start hour) keys the output: late
    re-emissions overwrite their partition with the corrected rows.
    """

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.columns:
            return
        spark = batch_df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                batch_df.write.mode("overwrite")
                .partitionBy(*partition_cols)
                .parquet(out_path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return _write


def run_stream_to_parquet(
    stream_df: DataFrame,
    out_path: str,
    checkpoint_path: str,
    partition_cols: list[str],
    output_mode: str = "update",
):
    """Drive a streaming DataFrame through the idempotent parquet sink
    to completion (synchronous; tests/backfills)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(parquet_upsert_sink(out_path, partition_cols))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q
