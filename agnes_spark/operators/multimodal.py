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


def _be_uint(b, pos, n: int):
    """Big-endian unsigned int read from a binary column at 1-based
    byte offset `pos` (int or Column), `n` bytes — hex->conv keeps the
    whole read inside whole-stage codegen (no UDF, no Python)."""
    if isinstance(pos, int):
        pos = F.lit(pos)
    return F.conv(F.hex(b.substr(pos, F.lit(n))), 16, 10).cast("bigint")


def _le_uint(b, pos: int, n: int):
    """Little-endian unsigned int read (GIF / RIFF-WebP headers are
    LE): sum byte[pos+i] << 8i over n <= 4 single-byte reads — still
    pure column expressions inside codegen."""
    total = F.lit(0).cast("bigint")
    for i in range(n):
        total = total + _be_uint(b, pos + i, 1) * F.lit(1 << (8 * i))
    return total


def image_header_meta(
    df: DataFrame, content_col: str = "content", max_segments: int = 16
) -> DataFrame:
    """Parse image format + pixel dimensions straight from the header
    BYTES of a binary column — JVM-side column expressions only, no
    decoder library, no Python row work (the metadata half of an image
    pipeline: decode stays stubbed, but format/dims/size census over
    100 TB of payloads is pure scan work and should never leave codegen).

    - PNG: magic `89504E470D0A1A0A`, then width/height are fixed-offset
      big-endian u32s inside the IHDR chunk (bytes 17-24, 1-based).
    - JPEG: magic `FFD8`; dimensions live in the first SOF segment at a
      VARIABLE offset, so the parser walks the segment chain — marker
      (2B), big-endian length (2B, includes itself), hop `2+len` — as a
      bounded `F.aggregate` fold over `max_segments` steps. SOF0/1/2
      payload is precision(1) height(2) width(2). The walk stops at
      SOS/EOI or any non-`FF` byte (truncated/corrupt input -> NULL
      dims, never an error). The same walk records whether any APP1
      segment carries an `Exif\\0\\0` payload (`has_exif` — the
      orientation-metadata presence signal an image pipeline keys
      rotation handling on).
    - GIF: magic `GIF87a`/`GIF89a`; logical-screen width/height are
      LITTLE-endian u16s at fixed offsets 7/9.
    - WebP (RIFF): `RIFF....WEBP`, then one of three fourCCs at 13 —
      `VP8 ` (lossy: start code 9D012A, 14-bit LE dims at 27/29),
      `VP8L` (lossless: sig 2F, width-1/height-1 packed in the LE u32
      at 22), `VP8X` (extended: canvas-1 as 24-bit LEs at 25/28).

    Adds `img_format` (png|jpeg|gif|webp|unknown), `img_width`,
    `img_height` (bigint, NULL when unparseable), `has_exif`
    (boolean, NULL for non-JPEG) and `img_bytes` to `df`.
    """
    out = df.withColumn("__img_b", F.col(content_col))
    b = F.col("__img_b")
    png_sig = (F.hex(b.substr(1, 8)) == "89504E470D0A1A0A") & (
        F.hex(b.substr(13, 4)) == "49484452"  # "IHDR"
    )
    jpeg_sig = F.hex(b.substr(1, 2)) == "FFD8"
    gif_sig = F.hex(b.substr(1, 6)).isin("474946383761", "474946383961")  # GIF87a/89a
    webp_sig = (F.hex(b.substr(1, 4)) == "52494646") & (  # "RIFF"
        F.hex(b.substr(9, 4)) == "57454250"  # "WEBP"
    )
    webp_cc = F.hex(b.substr(13, 4))  # "VP8 " / "VP8L" / "VP8X"

    def seg_step(acc, _i):
        marker = F.hex(b.substr(acc["pos"].cast("int"), F.lit(2)))
        seg_len = _be_uint(b, acc["pos"] + 2, 2)
        is_sof = marker.isin("FFC0", "FFC1", "FFC2")
        is_exif = (marker == "FFE1") & (
            F.hex(b.substr((acc["pos"] + 4).cast("int"), F.lit(6))) == "457869660000"
        )
        exif = (acc["exif"] | is_exif).alias("exif")
        halt = (
            acc["w"].isNotNull()
            | ~marker.startswith("FF")
            | marker.isin("FFDA", "FFD9")  # SOS / EOI: no SOF before scan data
            | (acc["pos"] + 9 > F.octet_length(b))
        )
        return (
            F.when(halt, acc)
            .when(
                is_sof,
                F.struct(
                    acc["pos"].alias("pos"),
                    _be_uint(b, acc["pos"] + 7, 2).alias("w"),
                    _be_uint(b, acc["pos"] + 5, 2).alias("h"),
                    exif,
                ),
            )
            .otherwise(
                F.struct(
                    (acc["pos"] + 2 + seg_len).alias("pos"),
                    acc["w"].alias("w"),
                    acc["h"].alias("h"),
                    exif,
                )
            )
        )

    jpg = F.aggregate(
        F.sequence(F.lit(1), F.lit(max_segments)),
        F.struct(
            F.lit(3).cast("bigint").alias("pos"),
            F.lit(None).cast("bigint").alias("w"),
            F.lit(None).cast("bigint").alias("h"),
            F.lit(False).alias("exif"),
        ),
        seg_step,
    )
    # WebP per-flavor dimension reads (all fixed-offset or one-hop)
    vp8_ok = F.hex(b.substr(24, 3)) == "9D012A"  # keyframe start code
    vp8_w = F.pmod(_le_uint(b, 27, 2), F.lit(16384))
    vp8_h = F.pmod(_le_uint(b, 29, 2), F.lit(16384))
    vp8l_ok = F.hex(b.substr(21, 1)) == "2F"
    vp8l_bits = _le_uint(b, 22, 4)  # < 2^32: double-exact floor-div below
    vp8l_w = F.pmod(vp8l_bits, F.lit(16384)) + 1
    vp8l_h = F.pmod((vp8l_bits / F.lit(16384)).cast("bigint"), F.lit(16384)) + 1
    vp8x_w = _le_uint(b, 25, 3) + 1
    vp8x_h = _le_uint(b, 28, 3) + 1
    webp_w = (
        F.when((webp_cc == "56503820") & vp8_ok, vp8_w)  # "VP8 "
        .when((webp_cc == "5650384C") & vp8l_ok, vp8l_w)  # "VP8L"
        .when(webp_cc == "56503858", vp8x_w)  # "VP8X"
    )
    webp_h = (
        F.when((webp_cc == "56503820") & vp8_ok, vp8_h)
        .when((webp_cc == "5650384C") & vp8l_ok, vp8l_h)
        .when(webp_cc == "56503858", vp8x_h)
    )
    fmt = (
        F.when(png_sig, F.lit("png"))
        .when(jpeg_sig, F.lit("jpeg"))
        .when(gif_sig, F.lit("gif"))
        .when(webp_sig, F.lit("webp"))
        .otherwise(F.lit("unknown"))
    )
    width = (
        F.when(png_sig, _be_uint(b, 17, 4))
        .when(jpeg_sig, jpg["w"])
        .when(gif_sig, _le_uint(b, 7, 2))
        .when(webp_sig, webp_w)
    )
    height = (
        F.when(png_sig, _be_uint(b, 21, 4))
        .when(jpeg_sig, jpg["h"])
        .when(gif_sig, _le_uint(b, 9, 2))
        .when(webp_sig, webp_h)
    )
    return (
        out.withColumn("img_format", fmt)
        .withColumn("img_width", width.cast("bigint"))
        .withColumn("img_height", height.cast("bigint"))
        .withColumn(
            "has_exif",
            F.when(jpeg_sig, jpg["exif"]).otherwise(F.lit(None).cast("boolean")),
        )
        .withColumn("img_bytes", F.octet_length(b).cast("bigint"))
        .drop("__img_b")
    )


def make_png_bytes(width: int, height: int, extra_payload: int = 0) -> bytes:
    """Minimal structurally-valid PNG header bytes (signature + IHDR)
    for fixtures: real pipelines get real files; tests and the oracle
    gate need deterministic bytes whose header encodes known dims."""
    import struct as _struct

    ihdr = _struct.pack(">II", width, height) + bytes([8, 6, 0, 0, 0])
    return (
        b"\x89PNG\r\n\x1a\x0a"
        + _struct.pack(">I", 13)
        + b"IHDR"
        + ihdr
        + b"\x00\x00\x00\x00"  # CRC placeholder (parser never reads it)
        + bytes(extra_payload)
    )


def make_jpeg_bytes(
    width: int,
    height: int,
    app0_pad: int = 0,
    com_len: int = 0,
    trailing: int = 0,
    exif_pad: int | None = None,
) -> bytes:
    """Minimal structurally-valid JPEG bytes with a VARIABLE-length
    APP0 + COM segment chain before SOF0, so parsers must genuinely
    walk segments (fixed-offset reads give wrong answers). With
    `exif_pad` set (>= 0), an APP1 `Exif\\0\\0` segment of that much
    extra payload is inserted after APP0 — 10 + exif_pad bytes — so
    EXIF presence is a real segment to detect, not a flag."""
    import struct as _struct

    len1 = 16 + app0_pad
    # segment length includes its own 2 bytes: payload = len1 - 2,
    # of which "JFIF\0" takes 5
    app0 = b"\xff\xe0" + _struct.pack(">H", len1) + b"JFIF\x00" + bytes(len1 - 7)
    app1 = b""
    if exif_pad is not None:
        app1 = (
            b"\xff\xe1"
            + _struct.pack(">H", 8 + exif_pad)
            + b"Exif\x00\x00"
            + bytes(exif_pad)
        )
    len2 = 2 + com_len
    com = b"\xff\xfe" + _struct.pack(">H", len2) + bytes(com_len)
    sof = (
        b"\xff\xc0"
        + _struct.pack(">H", 17)
        + bytes([8])
        + _struct.pack(">HH", height, width)
        + bytes([3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
    )
    return b"\xff\xd8" + app0 + app1 + com + sof + bytes(trailing) + b"\xff\xd9"


def make_gif_bytes(width: int, height: int, version: str = "87a", trailing: int = 0) -> bytes:
    """Minimal GIF87a/89a bytes: header + logical screen descriptor
    (LE u16 dims, no global color table) + padding + trailer."""
    import struct as _struct

    return (
        b"GIF" + version.encode("ascii")
        + _struct.pack("<HH", width, height)
        + bytes([0, 0, 0])  # packed/bg/aspect, GCT flag off
        + bytes(trailing)
        + b"\x3b"
    )


def make_webp_bytes(width: int, height: int, flavor: str = "vp8", pad: int = 0) -> bytes:
    """Minimal RIFF/WEBP bytes for the three self-describing flavors:
    `vp8` (lossy keyframe header: start code + 14-bit LE dims), `vp8l`
    (lossless: 0x2F sig + packed width-1/height-1 LE u32), `vp8x`
    (extended: 24-bit LE canvas-1 dims)."""
    import struct as _struct

    if flavor == "vp8":
        data = bytes(3) + b"\x9d\x01\x2a" + _struct.pack("<HH", width, height) + bytes(pad)
        cc = b"VP8 "
    elif flavor == "vp8l":
        bits = (width - 1) | ((height - 1) << 14)
        data = b"\x2f" + _struct.pack("<I", bits) + bytes(pad)
        cc = b"VP8L"
    elif flavor == "vp8x":
        data = bytes(4) + _struct.pack("<I", width - 1)[:3] + _struct.pack("<I", height - 1)[:3] + bytes(pad)
        cc = b"VP8X"
    else:
        raise ValueError(f"unknown webp flavor: {flavor}")
    chunk = cc + _struct.pack("<I", len(data)) + data
    return b"RIFF" + _struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def media_header_meta(
    df: DataFrame, content_col: str = "content", max_chunks: int = 16
) -> DataFrame:
    """Audio/video header census — the WAV/MP4 twin of
    image_header_meta: container format, audio shape (channels /
    sample rate / bit depth), MP4 brand and playback duration parsed
    straight from header BYTES with pure column expressions (no codec
    library, no Python row work — a media census over 100 TB of
    payloads is scan work and stays inside whole-stage codegen).

    - WAV (RIFF): magic `RIFF....WAVE`, then a CHUNK WALK — id (4B),
      LITTLE-endian u32 size, hop `8 + size + pad` (chunks are
      word-aligned) — as a bounded `F.aggregate` fold, because `fmt `
      is not guaranteed first (JUNK/LIST chunks precede it in the
      wild). `fmt ` payload: channels (LE u16 @ +10), sample rate
      (LE u32 @ +12), byte rate (LE u32 @ +16), bits/sample (LE u16
      @ +22); the `data` chunk size turns byte rate into duration:
      floor(data_bytes * 1000 / byte_rate) ms.
    - MP4 (ISO BMFF): a top-level BOX WALK — BIG-endian u32 size,
      fourCC type — records the `ftyp` major brand and finds `moov`;
      a second bounded walk INSIDE moov finds `mvhd`, whose version
      picks the timescale/duration offsets (v0: u32s @ +20/+24; v1:
      64-bit times, so @ +28/+32 with a u64 duration). duration_ms =
      floor(duration * 1000 / timescale). 64-bit `largesize` boxes
      (size==1) and size==0 tail boxes halt the walk -> NULLs.

    Truncated/corrupt payloads yield NULL fields, never an error
    (every read is length-guarded; the walks halt at the payload
    end). Adds media_format (wav|mp4|unknown), audio_channels,
    sample_rate_hz, bits_per_sample, mp4_brand, media_duration_ms,
    media_bytes. Reference parity: agnes FUTURE.md media-column
    ambitions, re-expressed as scan-side codegen over binary."""
    out = df.withColumn("__med_b", F.col(content_col))
    b = F.col("__med_b")
    blen = F.octet_length(b)
    wav_sig = (F.hex(b.substr(1, 4)) == "52494646") & (  # "RIFF"
        F.hex(b.substr(9, 4)) == "57415645"  # "WAVE"
    )
    mp4_sig = F.hex(b.substr(5, 4)) == "66747970"  # "ftyp" box type

    # --- WAV chunk walk: (pos, ch, sr, brate, bits, dbytes) ---
    def wav_step(acc, _i):
        pos = acc["pos"]
        cid = F.hex(b.substr(pos.cast("int"), F.lit(4)))
        csize = _le_uint(b, pos + 4, 4)
        is_fmt = (cid == "666D7420") & (csize >= 16) & (pos + 23 <= blen)
        is_data = cid == "64617461"
        halt = (
            (pos + 7 > blen)
            | (acc["ch"].isNotNull() & acc["dbytes"].isNotNull())
        )
        nxt = pos + 8 + csize + F.pmod(csize, F.lit(2))
        return F.when(halt, acc).otherwise(
            F.struct(
                nxt.alias("pos"),
                F.coalesce(
                    acc["ch"], F.when(is_fmt, _le_uint(b, pos + 10, 2))
                ).alias("ch"),
                F.coalesce(
                    acc["sr"], F.when(is_fmt, _le_uint(b, pos + 12, 4))
                ).alias("sr"),
                F.coalesce(
                    acc["brate"], F.when(is_fmt, _le_uint(b, pos + 16, 4))
                ).alias("brate"),
                F.coalesce(
                    acc["bits"], F.when(is_fmt, _le_uint(b, pos + 22, 2))
                ).alias("bits"),
                F.coalesce(acc["dbytes"], F.when(is_data, csize)).alias(
                    "dbytes"
                ),
            )
        )

    wav0 = F.struct(
        F.lit(13).cast("bigint").alias("pos"),
        *[
            F.lit(None).cast("bigint").alias(f)
            for f in ("ch", "sr", "brate", "bits", "dbytes")
        ],
    )
    wav = F.aggregate(F.sequence(F.lit(1), F.lit(max_chunks)), wav0, wav_step)

    # --- MP4 top-level box walk: (pos, brand, moov) ---
    def box_step(target_hex):
        def step(acc, _i):
            pos = acc["pos"]
            size = _be_uint(b, pos, 4)
            t = F.hex(b.substr((pos + 4).cast("int"), F.lit(4)))
            # stop is the first byte PAST the enclosing box, so the full
            # 8-byte child header fits only when pos + 8 <= stop — at
            # pos = stop - 7 the header's last byte would straddle into
            # the sibling box's bytes
            halt = acc["hit"].isNotNull() | (pos + 7 > blen) | (
                acc["stop"].isNotNull() & (pos + 8 > acc["stop"])
            )
            dead = size < 8  # size 0 (to-EOF) or 1 (largesize): stop
            return F.when(halt, acc).otherwise(
                F.struct(
                    F.when(dead, blen + 8).otherwise(pos + size).alias("pos"),
                    F.coalesce(
                        acc["brand"],
                        F.when(
                            (t == "66747970") & (pos + 11 <= blen),
                            b.substr((pos + 8).cast("int"), F.lit(4)).cast(
                                "string"
                            ),
                        ),
                    ).alias("brand"),
                    F.when(t == target_hex, pos).cast("bigint").alias("hit"),
                    acc["stop"].alias("stop"),
                )
            )

        return step

    def box_walk(start, target_hex, stop=None):
        init = F.struct(
            start.cast("bigint").alias("pos"),
            F.lit(None).cast("string").alias("brand"),
            F.lit(None).cast("bigint").alias("hit"),
            (
                stop if stop is not None else F.lit(None).cast("bigint")
            ).alias("stop"),
        )
        return F.aggregate(
            F.sequence(F.lit(1), F.lit(max_chunks)), init, box_step(target_hex)
        )

    top = box_walk(F.lit(1), "6D6F6F76")  # find "moov"
    moov = top["hit"]
    moov_end = moov + _be_uint(b, moov, 4)
    inner = box_walk(moov + 8, "6D766864", stop=moov_end)  # find "mvhd"
    mvhd = inner["hit"]
    ver = _be_uint(b, mvhd + 8, 1)
    ts = F.when((ver == 0) & (mvhd + 27 <= blen), _be_uint(b, mvhd + 20, 4)).when(
        (ver == 1) & (mvhd + 39 <= blen), _be_uint(b, mvhd + 28, 4)
    )
    dur = F.when((ver == 0) & (mvhd + 27 <= blen), _be_uint(b, mvhd + 24, 4)).when(
        (ver == 1) & (mvhd + 39 <= blen), _be_uint(b, mvhd + 32, 8)
    )

    def _floordiv(num, den):
        # exact integer floor division as column arithmetic (both
        # operands non-negative here); engine-portable, no doubles
        return ((num - F.pmod(num, den)) / den).cast("bigint")

    wav_dur_ms = F.when(
        wav["dbytes"].isNotNull() & (wav["brate"] > 0),
        _floordiv(wav["dbytes"] * F.lit(1000), wav["brate"]),
    )
    mp4_dur_ms = F.when(ts > 0, _floordiv(dur * F.lit(1000), ts))

    # --- FLAC: "fLaC" magic, STREAMINFO is the mandatory first
    # metadata block (type 0, 34-byte payload at fixed offset 9). The
    # packed audio-shape group lives in the two BE u32s at 19/23
    # (1-based): hi = sample_rate(20b) | channels-1(3b) | bps-1(5b) |
    # total_samples[35:32]; lo = total_samples[31:0]. Two u32 reads
    # keep every intermediate < 2^32 (no signed-overflow edge).
    flac_sig = F.hex(b.substr(1, 4)) == "664C6143"
    flac_ok = flac_sig & (blen >= 26) & (
        F.pmod(_be_uint(b, 5, 1), F.lit(128)) == 0  # block type 0
    )
    fhi = _be_uint(b, 19, 4)
    flo = _be_uint(b, 23, 4)
    flac_sr = (fhi / F.lit(4096)).cast("bigint")  # >> 12
    flac_ch = F.pmod((fhi / F.lit(512)).cast("bigint"), F.lit(8)) + 1
    flac_bps = F.pmod((fhi / F.lit(16)).cast("bigint"), F.lit(32)) + 1
    flac_total = F.pmod(fhi, F.lit(16)) * F.lit(1 << 32) + flo
    flac_dur_ms = F.when(
        flac_ok & (flac_sr > 0), _floordiv(flac_total * F.lit(1000), flac_sr)
    )

    # --- MP3: an optional ID3v2 tag ("ID3" + syncsafe u28 size at
    # 7..10) is hopped, then the first MPEG audio frame header (sync
    # 0xFFE). MPEG1 Layer III fields: bitrate index (table) and sample
    # rate index in byte 3. CBR duration estimate: audio bytes * 8 /
    # bitrate_kbps ms — the standard header-only estimate.
    id3_sig = F.hex(b.substr(1, 3)) == "494433"
    id3_size = (
        F.pmod(_be_uint(b, 7, 1), F.lit(128)) * F.lit(1 << 21)
        + F.pmod(_be_uint(b, 8, 1), F.lit(128)) * F.lit(1 << 14)
        + F.pmod(_be_uint(b, 9, 1), F.lit(128)) * F.lit(1 << 7)
        + F.pmod(_be_uint(b, 10, 1), F.lit(128))
    )
    moff = F.when(id3_sig, id3_size + 11).otherwise(F.lit(1).cast("bigint"))
    mh1 = _be_uint(b, moff, 1)
    mh2 = _be_uint(b, moff + 1, 1)
    mh3 = _be_uint(b, moff + 2, 1)
    mp3_frame = (
        (moff + 3 <= blen)
        & (mh1 == 255)
        & ((mh2 / F.lit(32)).cast("bigint") == 7)  # sync 0xFFE
    )
    mp3_sig = id3_sig | ((F.hex(b.substr(1, 1)) == "FF") & mp3_frame)
    mp3_v1l3 = mp3_frame & (
        F.pmod((mh2 / F.lit(2)).cast("bigint"), F.lit(16)) == 13  # MPEG1 L3
    )
    br_idx = (mh3 / F.lit(16)).cast("bigint")
    sr_idx = F.pmod((mh3 / F.lit(4)).cast("bigint"), F.lit(4))
    _MP3_BR = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    mp3_br = F.lit(None).cast("bigint")
    for i, kbps in enumerate(_MP3_BR):
        if kbps:
            mp3_br = F.when(br_idx == i, F.lit(kbps)).otherwise(mp3_br)
    mp3_br = F.when(mp3_v1l3, mp3_br)
    mp3_sr = F.when(
        mp3_v1l3,
        F.when(sr_idx == 0, F.lit(44100))
        .when(sr_idx == 1, F.lit(48000))
        .when(sr_idx == 2, F.lit(32000)),
    )
    mp3_dur_ms = F.when(
        mp3_br > 0, _floordiv((blen - moff + 1) * F.lit(8), mp3_br)
    )

    fmt = (
        F.when(wav_sig, F.lit("wav"))
        .when(mp4_sig, F.lit("mp4"))
        .when(flac_sig, F.lit("flac"))
        .when(mp3_sig, F.lit("mp3"))
        .otherwise(F.lit("unknown"))
    )
    return (
        out.withColumn("media_format", fmt)
        .withColumn(
            "audio_channels",
            F.when(wav_sig, wav["ch"])
            .when(flac_ok, flac_ch)
            .cast("bigint"),
        )
        .withColumn(
            "sample_rate_hz",
            F.when(wav_sig, wav["sr"])
            .when(flac_ok, flac_sr)
            .when(mp3_sig, mp3_sr)
            .cast("bigint"),
        )
        .withColumn(
            "bits_per_sample",
            F.when(wav_sig, wav["bits"])
            .when(flac_ok, flac_bps)
            .cast("bigint"),
        )
        .withColumn("mp4_brand", F.when(mp4_sig, top["brand"]))
        .withColumn(
            "bitrate_kbps", F.when(mp3_sig, mp3_br).cast("bigint")
        )
        .withColumn(
            "media_duration_ms",
            F.when(wav_sig, wav_dur_ms)
            .when(mp4_sig, mp4_dur_ms)
            .when(flac_sig, flac_dur_ms)
            .when(mp3_sig, mp3_dur_ms)
            .cast("bigint"),
        )
        .withColumn("media_bytes", blen.cast("bigint"))
        .drop("__med_b")
    )


def make_wav_bytes(
    channels: int,
    sample_rate: int,
    bits: int,
    data_bytes: int,
    junk_pad: int = 0,
) -> bytes:
    """Minimal structurally-valid RIFF/WAVE bytes: optional JUNK chunk
    (so parsers must genuinely walk chunks), canonical 16-byte `fmt `
    chunk, `data` chunk of `data_bytes` zeros. Even-size chunks only
    (word alignment stays trivial for the oracle's closed form)."""
    import struct as _struct

    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    chunks = b""
    if junk_pad:
        if junk_pad % 2:
            raise ValueError("junk_pad must be even")
        chunks += b"JUNK" + _struct.pack("<I", junk_pad) + bytes(junk_pad)
    chunks += b"fmt " + _struct.pack(
        "<IHHIIHH", 16, 1, channels, sample_rate, byte_rate, block_align, bits
    )
    if data_bytes % 2:
        raise ValueError("data_bytes must be even")
    chunks += b"data" + _struct.pack("<I", data_bytes) + bytes(data_bytes)
    return b"RIFF" + _struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def make_mp4_bytes(
    brand: str,
    timescale: int,
    duration: int,
    version: int = 0,
    free_pad: int | None = None,
    ftyp_only: bool = False,
) -> bytes:
    """Minimal structurally-valid ISO-BMFF bytes: `ftyp` (major brand,
    minor version 0), optional `free` box (so the top-level walk must
    hop boxes), `moov` containing a spec-sized `mvhd` (v0: 108 bytes,
    v1: 120) whose timescale/duration encode the given values."""
    import struct as _struct

    ftyp = _struct.pack(">I", 16) + b"ftyp" + brand.encode("ascii") + bytes(4)
    if ftyp_only:
        return ftyp
    out = ftyp
    if free_pad is not None:
        out += _struct.pack(">I", 8 + free_pad) + b"free" + bytes(free_pad)
    if version == 0:
        mvhd = (
            _struct.pack(">I", 108)
            + b"mvhd"
            + bytes([0, 0, 0, 0])
            + _struct.pack(">IIII", 0, 0, timescale, duration)
            + bytes(108 - 28)
        )
    elif version == 1:
        mvhd = (
            _struct.pack(">I", 120)
            + b"mvhd"
            + bytes([1, 0, 0, 0])
            + _struct.pack(">QQIQ", 0, 0, timescale, duration)
            + bytes(120 - 40)
        )
    else:
        raise ValueError(f"unsupported mvhd version: {version}")
    out += _struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    return out


def make_flac_bytes(
    sample_rate: int,
    channels: int,
    bits: int,
    total_samples: int,
    trailing: int = 0,
) -> bytes:
    """Minimal structurally-valid FLAC bytes: `fLaC` magic + a
    last-block STREAMINFO (type 0, 34-byte payload) whose packed
    group encodes sample rate / channels / bit depth / total
    samples; `trailing` junk bytes stand in for frames."""
    import struct as _struct

    hi = (
        (sample_rate << 12)
        | ((channels - 1) << 9)
        | ((bits - 1) << 4)
        | ((total_samples >> 32) & 0xF)
    )
    lo = total_samples & 0xFFFFFFFF
    payload = (
        _struct.pack(">HH", 4096, 4096)  # min/max blocksize
        + bytes(6)  # min/max framesize (u24 x2, unknown)
        + _struct.pack(">II", hi, lo)
        + bytes(16)  # md5 of the audio data (unread)
    )
    assert len(payload) == 34
    return (
        b"fLaC"
        + bytes([0x80])  # last-block flag + type 0 (STREAMINFO)
        + _struct.pack(">I", 34)[1:]  # 24-bit BE length
        + payload
        + bytes(trailing)
    )


def make_mp3_bytes(
    bitrate_kbps: int,
    sample_rate: int,
    audio_pad: int = 0,
    id3_size: int | None = None,
) -> bytes:
    """Minimal structurally-valid MP3 bytes: optional ID3v2 tag
    (syncsafe size) followed by one MPEG1 Layer III frame header with
    the given bitrate/sample-rate indices + `audio_pad` junk bytes of
    'audio'."""
    br_table = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    sr_table = (44100, 48000, 32000)
    br_idx = br_table.index(bitrate_kbps)
    sr_idx = sr_table.index(sample_rate)
    hdr = bytes(
        [
            0xFF,
            0xFB,  # sync + MPEG1 + Layer III + no CRC
            (br_idx << 4) | (sr_idx << 2),
            0x00,
        ]
    )
    out = b""
    if id3_size is not None:
        assert 0 <= id3_size < (1 << 28)
        ss = bytes(
            [
                (id3_size >> 21) & 0x7F,
                (id3_size >> 14) & 0x7F,
                (id3_size >> 7) & 0x7F,
                id3_size & 0x7F,
            ]
        )
        out += b"ID3" + bytes([4, 0, 0]) + ss + bytes(id3_size)
    return out + hdr + bytes(audio_pad)
