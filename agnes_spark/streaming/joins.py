"""Streaming joins.

Two shapes that matter in production:
- stream-static enrich: the streaming side joins a (periodically
  refreshed) dimension table; the dim broadcasts, no streaming state.
- stream-stream self-join within a time band: both sides watermarked,
  the event-time range condition bounds the state store on each side
  (rows older than watermark + band are evicted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(events: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static inner join. The static side is re-read per
    micro-batch (so a dim refresh is picked up); Catalyst broadcasts it
    when small — no streaming state is kept for this join."""
    return events.join(F.broadcast(dim), on=on)


def stream_self_join(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    band: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream self-join: pairs of events from the
    same key within `band` of each other (earlier -> later only).

    Both inputs carry the watermark and the join condition bounds the
    event-time distance, so each side's state store holds at most
    watermark + band of history — O(window), not O(stream). This is
    the funnel/attribution primitive (view -> purchase within 30 min).

    Expected log noise: Spark's StreamingJoinHelper WARNs that it
    cannot extract a state watermark from the non-time `l_id < r_id`
    conjunct ("Error trying to extract state constraint"). That term
    only de-duplicates pair orientation; state stays bounded by the
    two event-time terms, which the helper does extract. The WARN is
    cosmetic — do not chase it.
    """
    left = (
        events.select(
            F.col(key).alias("l_key"),
            F.col("event_id").alias("l_id"),
            F.col("event_type").alias("l_type"),
            F.col(ts_col).alias("l_ts"),
        ).withWatermark("l_ts", watermark)
    )
    right = (
        events.select(
            F.col(key).alias("r_key"),
            F.col("event_id").alias("r_id"),
            F.col("event_type").alias("r_type"),
            F.col(ts_col).alias("r_ts"),
        ).withWatermark("r_ts", watermark)
    )
    return left.join(
        right,
        (F.col("l_key") == F.col("r_key"))
        & (F.col("l_id") < F.col("r_id"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {band}")),
    ).select("l_key", "l_id", "r_id", "l_type", "r_type", "l_ts", "r_ts")
