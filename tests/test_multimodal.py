"""Multimodal plumbing tests: real Arrow-batched mapInPandas paths
with the deterministic stub codecs."""

from agnes_spark.operators.multimodal import (
    attach_media_meta,
    decode_image_meta,
    resize_images,
    sample_frames,
)
from agnes_spark.sources.memory import table


def _media(spark):
    return table(
        spark,
        {
            "media_id": [1, 2, 3],
            "payload": [b"\x89PNG-fake-1", b"\x89PNG-fake-22", b"RIFF-fake-333"],
        },
        types={"media_id": "bigint", "payload": "binary"},
    )


def test_attach_media_meta_schema(spark):
    df = attach_media_meta(_media(spark), "payload", "image", codec="png")
    meta = df.schema["media_meta"].dataType
    assert [f.name for f in meta.fields] == [
        "media_type", "width", "height", "duration_ms", "codec",
    ]
    row = df.collect()[0].media_meta
    assert row.media_type == "image" and row.codec == "png" and row.width is None


def test_decode_image_meta_deterministic(spark):
    df = _media(spark)
    a = {r.media_id: (r.width, r.height, r.content_sha) for r in decode_image_meta(df, "payload", "media_id").collect()}
    b = {r.media_id: (r.width, r.height, r.content_sha) for r in decode_image_meta(df, "payload", "media_id").collect()}
    assert a == b
    assert all(16 <= w < 256 and 16 <= h < 256 for w, h, _ in a.values())


def test_resize_images_passthrough_stub(spark):
    out = resize_images(_media(spark), "payload", "media_id", (64, 64)).collect()
    assert all(r.width == 64 and r.height == 64 and r.resized is not None for r in out)


def test_sample_frames_one_row_per_frame(spark):
    out = sample_frames(_media(spark), "payload", "media_id", every_ms=500, max_frames=4).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.media_id, []).append((r.frame_idx, r.ts_ms))
    for frames in by_id.values():
        idxs = sorted(i for i, _ in frames)
        assert idxs == list(range(len(idxs)))  # contiguous frame indices
        assert all(ts == i * 500 for i, ts in frames)


def test_image_header_meta_parses_png_and_jpeg(spark):
    from agnes_spark.operators.multimodal import (
        image_header_meta,
        make_jpeg_bytes,
        make_png_bytes,
    )

    rows = [
        (1, make_png_bytes(640, 480, extra_payload=7)),
        # variable APP0+COM padding: a fixed-offset reader fails here
        (2, make_jpeg_bytes(1920, 1080, app0_pad=5, com_len=30, trailing=11)),
        (3, make_jpeg_bytes(31, 17)),
        (4, b"\xff\xd8\xff\xe0\x00\x05"),  # truncated: NULL dims, no error
        (5, b"not an image at all"),
        (6, make_jpeg_bytes(65535, 65535, app0_pad=31, com_len=56)),
    ]
    df = spark.createDataFrame(rows, "id bigint, content binary")
    got = {
        r.id: (r.img_format, r.img_width, r.img_height, r.img_bytes)
        for r in image_header_meta(df).collect()
    }
    assert got[1] == ("png", 640, 480, 40)
    assert got[2] == ("jpeg", 1920, 1080, 91)
    assert got[3] == ("jpeg", 31, 17, 45)
    assert got[4] == ("jpeg", None, None, 6)
    assert got[5] == ("unknown", None, None, 19)
    assert got[6] == ("jpeg", 65535, 65535, 132)


def test_image_header_meta_parses_gif_webp_exif(spark):
    """GIF87a/89a LE dims, the three WebP flavors' packed dims, EXIF
    APP1 presence on JPEG (and NULL has_exif off-JPEG), plus truncated
    variants of each new format -> NULL dims, never an error."""
    from agnes_spark.operators.multimodal import (
        image_header_meta,
        make_gif_bytes,
        make_jpeg_bytes,
        make_webp_bytes,
    )

    rows = [
        (1, make_gif_bytes(320, 200, version="87a", trailing=9)),
        (2, make_gif_bytes(65535, 1, version="89a")),
        (3, make_webp_bytes(2063, 17, flavor="vp8", pad=6)),
        (4, make_webp_bytes(16383, 16383, flavor="vp8l")),
        (5, make_webp_bytes(1, 1, flavor="vp8l", pad=3)),
        (6, make_webp_bytes(4096, 2160, flavor="vp8x", pad=2)),
        (7, make_jpeg_bytes(99, 44, app0_pad=3, exif_pad=12)),
        (8, make_jpeg_bytes(99, 44, app0_pad=3)),
        (9, b"RIFFxxxxWEBPVP8 "),  # truncated: no start code
        (10, b"GIF89a\x40"),  # truncated LSD
    ]
    df = spark.createDataFrame(rows, "id bigint, content binary")
    got = {
        r.id: (r.img_format, r.img_width, r.img_height, r.has_exif, r.img_bytes)
        for r in image_header_meta(df).collect()
    }
    assert got[1] == ("gif", 320, 200, None, 23)
    assert got[2] == ("gif", 65535, 1, None, 14)
    assert got[3] == ("webp", 2063, 17, None, 36)
    assert got[4] == ("webp", 16383, 16383, None, 25)
    assert got[5] == ("webp", 1, 1, None, 28)
    assert got[6] == ("webp", 4096, 2160, None, 32)
    assert got[7] == ("jpeg", 99, 44, True, 70)
    assert got[8] == ("jpeg", 99, 44, False, 48)
    assert got[9] == ("webp", None, None, None, 16)
    assert got[10][0] == "gif" and got[10][4] == 7


def test_image_header_meta_stays_jvm_side(spark):
    """The census must be pure codegen — no BatchEvalPython / ArrowEval
    in the plan (100 TB of binary payloads never leave the JVM)."""
    from agnes_spark.operators.multimodal import image_header_meta, make_png_bytes

    df = spark.createDataFrame([(1, make_png_bytes(8, 8))], "id bigint, content binary")
    plan = (
        image_header_meta(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan


# --- media_header_meta: WAV/MP4 header census (r10 verdict item 5) ---

def test_media_header_meta_wav_mp4_variants(spark):
    from agnes_spark.operators.multimodal import (
        make_mp4_bytes,
        make_wav_bytes,
        media_header_meta,
    )

    rows = [
        (0, make_wav_bytes(2, 44100, 16, 176400)),           # exactly 1s
        (1, make_wav_bytes(1, 8000, 8, 4000, junk_pad=10)),  # JUNK first
        (2, make_mp4_bytes("isom", 600, 1500, version=0)),
        (3, make_mp4_bytes("mp42", 1000, 3210, version=1)),  # v1 offsets
        (4, make_mp4_bytes("avc1", 90000, 90000 * 7 + 45000,
                           version=0, free_pad=24)),          # hop free box
        (5, make_wav_bytes(2, 44100, 16, 1000)[:14]),         # truncated
        (6, make_mp4_bytes("dash", 1, 1, ftyp_only=True)),    # no moov
        (7, b"notamedia"),                                    # unknown
    ]
    df = spark.createDataFrame(rows, "id bigint, content binary")
    got = {
        r.id: (
            r.media_format, r.audio_channels, r.sample_rate_hz,
            r.bits_per_sample, r.mp4_brand, r.media_duration_ms,
            r.media_bytes,
        )
        for r in media_header_meta(df, "content").collect()
    }
    assert got[0] == ("wav", 2, 44100, 16, None, 1000, 176444)
    assert got[1] == ("wav", 1, 8000, 8, None, 500, 4062)
    assert got[2] == ("mp4", None, None, None, "isom", 2500, 132)
    assert got[3] == ("mp4", None, None, None, "mp42", 3210, 144)
    assert got[4] == ("mp4", None, None, None, "avc1", 7500, 164)
    # truncated input -> NULL fields, never an error
    assert got[5] == ("wav", None, None, None, None, None, 14)
    assert got[6] == ("mp4", None, None, None, "dash", None, 16)
    assert got[7] == ("unknown", None, None, None, None, None, 9)


def test_media_header_meta_stays_jvm_side(spark):
    from agnes_spark.operators.multimodal import (
        make_wav_bytes,
        media_header_meta,
    )

    df = spark.createDataFrame(
        [(0, make_wav_bytes(1, 8000, 16, 100))], "id bigint, content binary"
    )
    plan = (
        media_header_meta(df, "content")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan


def test_media_header_meta_flac_mp3(spark):
    from agnes_spark.operators.multimodal import (
        make_flac_bytes,
        make_mp3_bytes,
        media_header_meta,
    )

    rows = [
        (0, make_flac_bytes(44100, 2, 16, 441000, trailing=33)),  # 10s
        (1, make_flac_bytes(48000, 1, 24, 4800)),                 # 100ms
        # 1600 bytes at 128 kbps -> 100 ms CBR estimate
        (2, make_mp3_bytes(128, 44100, audio_pad=1596)),
        # ID3v2 tag hopped via syncsafe size before the frame header
        (3, make_mp3_bytes(320, 32000, audio_pad=396, id3_size=50)),
        (4, make_flac_bytes(44100, 2, 16, 1000)[:10]),            # truncated
    ]
    df = spark.createDataFrame(rows, "id bigint, content binary")
    got = {
        r.id: (
            r.media_format, r.audio_channels, r.sample_rate_hz,
            r.bits_per_sample, r.bitrate_kbps, r.media_duration_ms,
            r.media_bytes,
        )
        for r in media_header_meta(df, "content").collect()
    }
    assert got[0] == ("flac", 2, 44100, 16, None, 10000, 75)
    assert got[1] == ("flac", 1, 48000, 24, None, 100, 42)
    assert got[2] == ("mp3", None, 44100, None, 128, 100, 1600)
    assert got[3] == ("mp3", None, 32000, None, 320, 10, 460)
    assert got[4] == ("flac", None, None, None, None, None, 10)


def test_media_header_moov_walk_never_reads_straddling_header(spark):
    """r11 advice: the bounded moov child walk halted at pos+7 > stop,
    one byte short — a crafted 8-byte child header whose last byte
    lies just past the moov box end was still read, pulling mvhd
    fields out of the SIBLING box's bytes. The full header must fit
    inside moov (pos + 8 <= stop) or the walk halts with NULLs."""
    import struct

    from agnes_spark.operators.multimodal import media_header_meta

    payload = (
        struct.pack(">I", 16) + b"ftyp" + b"isom" + b"\x00" * 4
        # moov declared size 23: header(8) + free child(8) + 7 bytes of
        # a PARTIAL child header (4-byte size + "mvh"); the final 'd'
        # of "mvhd" is the first byte of the next sibling box
        + struct.pack(">I", 23) + b"moov"
        + struct.pack(">I", 8) + b"free"
        + struct.pack(">I", 100) + b"mvh"
        + b"d" + b"\x00" * 12  # sibling bytes; fake mvhd v0 layout...
        + struct.pack(">I", 1000) + struct.pack(">I", 2000)  # ts, dur
    )
    assert len(payload) == 60
    df = spark.createDataFrame([(0, payload)], "id bigint, content binary")
    r = media_header_meta(df, "content").collect()[0]
    assert r.media_format == "mp4"
    assert r.mp4_brand == "isom"
    # pre-fix this read ts=1000/dur=2000 from the sibling -> 2000 ms
    assert r.media_duration_ms is None
