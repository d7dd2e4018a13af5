"""Multimodal (image/audio/video) column plumbing.

Opaque payloads travel as `binary` columns next to a typed metadata
struct; per-modality transforms run as Arrow-batched mapInPandas so
payload bytes never round-trip through Python row-by-row. The
Spark-side plumbing (schemas, batching, partition sizing) is real and
tested; the actual codec work is stubbed behind `_decode_*` because
image/audio libraries are not in this environment — swap the stub body
for PIL/ffmpeg calls and nothing else changes.

Scale notes: binary payloads dominate partition size, so repartition
by `maxRecordsPerBatch`-compatible counts before heavy UDFs, and keep
metadata-only transforms on pruned columns (never scan payload bytes
to read a width).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_type string, width int, height int, duration_ms int, codec string"
)


def attach_media_meta(
    df: DataFrame,
    payload_col: str,
    media_type: str,
    codec: str = "raw",
) -> DataFrame:
    """Wrap a binary column with the typed metadata struct (dimensions
    unknown until decode -> null)."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit(codec).alias("codec"),
        ),
    )


def _decode_image_stub(payload: bytes) -> tuple[int, int]:
    """STUB: deterministic fake decode (no image libs in this env).

    Derives (width, height) from a content hash so tests are stable.
    Production: `PIL.Image.open(io.BytesIO(payload)).size`.
    """
    h = hashlib.sha256(payload).digest()
    return 16 + h[0] % 240, 16 + h[1] % 240


def decode_image_meta(df: DataFrame, payload_col: str, id_col: str) -> DataFrame:
    """Fill width/height by decoding each payload — Arrow-batched
    mapInPandas; one Python roundtrip per batch, not per row."""
    out_schema = f"{id_col} bigint, width int, height int, content_sha string"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = [_decode_image_stub(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": [w for w, _ in dims],
                    "height": [h for _, h in dims],
                    "content_sha": [hashlib.sha256(p).hexdigest() for p in pdf[payload_col]],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)


def resize_images(df: DataFrame, payload_col: str, id_col: str, size: tuple[int, int]) -> DataFrame:
    """Resize stub: passes payloads through the real mapInPandas batch
    path; production swaps the body for an actual resampler."""
    w, h = size
    out_schema = f"{id_col} bigint, resized binary, width int, height int"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "resized": pdf[payload_col],  # STUB: no-op resample
                    "width": w,
                    "height": h,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)


def sample_frames(
    df: DataFrame, payload_col: str, id_col: str, every_ms: int = 1000, max_frames: int = 8
) -> DataFrame:
    """Video frame sampling stub: one output row per sampled frame.

    Emits (id, frame_idx, ts_ms, frame binary). Deterministic fake
    frame count from payload length; production: ffmpeg seek+decode.
    """
    out_schema = f"{id_col} bigint, frame_idx int, ts_ms int, frame binary"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, tss, frames = [], [], [], []
            for _, row in pdf.iterrows():
                payload = row[payload_col]
                n = min(max_frames, 1 + len(payload) % max_frames)  # STUB
                for i in range(n):
                    ids.append(row[id_col])
                    idxs.append(i)
                    tss.append(i * every_ms)
                    frames.append(payload[:16])  # STUB: fake frame bytes
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "ts_ms": tss, "frame": frames}
            )

    return df.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)
