"""Multimodal landing-zone intake over a mixed crawl drop — the
round-11 operator family composed end to end:

  1. URL canonicalization + PSL registered domain
                            (urltools.normalize_url /
                             registered_domain_psl — full wildcard/
                             exception semantics vs a PSL snapshot)
  2. media header census    (multimodal.media_header_meta — WAV/MP4/
                             FLAC/MP3 shape + duration from header
                             bytes, zero Python)
  3. binary near-dup dedup  (dedup.binary_minhash_pairs — byte
                             shingles in codegen, content-defined
                             0-mod-p sampling, LSH bands, exact
                             verify)
  4. fuzzy decontamination  (textprep.decontaminate_fuzzy — 8-gram
                             Jaccard vs a held-out eval slice,
                             recall-lossless broadcast candidates)
  5. per-domain intake stats (one groupBy on the PSL domain)

Run: python examples/landing_zone.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from agnes_spark import get_spark
from agnes_spark.operators.dedup import binary_minhash_pairs
from agnes_spark.operators.multimodal import (
    make_flac_bytes,
    make_mp3_bytes,
    make_wav_bytes,
    media_header_meta,
)
from agnes_spark.operators.textprep import decontaminate_fuzzy
from agnes_spark.operators.urltools import registered_domain_psl

PSL = ["com", "org", "uk", "co.uk", "jp", "co.jp", "*.ck", "!www.ck"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("landing_zone")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    # 1. every crawled doc gets a host; PSL-correct owner domain
    host = F.concat(
        F.col("source"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(".co.uk"))
        .when(F.col("doc_id") % 3 == 1, F.lit(".com"))
        .otherwise(F.lit(".foo.ck")),
    )
    with_dom = registered_domain_psl(
        docs.withColumn("host", host), "host", PSL, out_col="domain"
    )

    # 2. a synthetic media sidecar per 25th doc, censused from bytes
    media_rows = [
        (int(r.doc_id), _payload(int(r.doc_id)))
        for r in docs.filter(F.col("doc_id") % 25 == 0).select("doc_id").collect()
    ]
    media = media_header_meta(
        spark.createDataFrame(media_rows, "doc_id bigint, content binary"),
        "content",
    )
    census = (
        media.groupBy("media_format")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("media_duration_ms").alias("total_ms"),
        )
        .orderBy("media_format")
    )

    # 3. binary near-dups across the payload column
    pairs = binary_minhash_pairs(
        spark.createDataFrame(media_rows, "doc_id bigint, payload binary"),
        "doc_id",
        "payload",
        threshold=0.5,
    )

    # 4. paraphrase-robust decontamination vs the eval slice
    train = with_dom.filter(F.col("doc_id") % 10 != 0)
    ev = with_dom.filter(F.col("doc_id") % 10 == 0)
    contaminated = decontaminate_fuzzy(
        train, ev, "doc_id", "doc_id", "text", n=8, threshold=0.3
    )

    # 5. per-domain intake rollup on the clean remainder
    clean = train.join(contaminated.select("doc_id"), "doc_id", "left_anti")
    rollup = (
        clean.groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("chars"))
        .orderBy(F.col("n_docs").desc())
    )

    print("media census:")
    census.show(truncate=False)
    print(f"binary near-dup pairs: {pairs.count()}")
    print(f"fuzzy-contaminated train docs: {contaminated.count()}")
    print("per-domain intake (top 10):")
    rollup.show(10, truncate=False)


def _payload(i: int) -> bytes:
    v = (i // 25) % 4
    if v == 0:
        return make_wav_bytes(1 + i % 2, 16000, 16, 2 * (400 + i % 200))
    if v == 1:
        return make_mp3_bytes(128, 44100, audio_pad=300 + i % 100, id3_size=64)
    if v == 2:
        return make_flac_bytes(44100, 2, 16, 44100 * (1 + i % 5))
    return b"opaque-blob-" + bytes([i % 251]) * (64 + i % 32)


if __name__ == "__main__":
    main()
