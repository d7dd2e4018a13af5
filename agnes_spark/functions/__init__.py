"""Shared Column-expression helpers (all JVM-side; no Python UDFs).

These are the building blocks for the dedup / similarity / text
operators. Everything here compiles to Catalyst expressions so the
hot path stays inside whole-stage codegen at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# -- vectors ---------------------------------------------------------------

def vec_double(col) -> Column:
    """array<float> -> array<double> (exact widening, matches DuckDB)."""
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b) -> Column:
    """Dot product of two array<double> columns via zip_with+aggregate —
    sequential left-to-right summation (deterministic, bit-stable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> Column:
    """Cosine similarity of two array<double> columns."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


# -- text ------------------------------------------------------------------

def ws_tokens(col) -> Column:
    """Whitespace tokenization, empty-safe."""
    return F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != "")


def word_shingles(col, n: int = 3) -> Column:
    """Distinct n-word shingles of a text column as array<string>.

    Built from sequence+transform (no explode needed by callers that
    only count); callers that join on shingles explode afterwards.
    """
    toks = ws_tokens(col)
    k = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    idx = F.sequence(F.lit(1), k)  # 1-based, empty when k == 0
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    )


def hashed_shingles(col, n: int = 3) -> Column:
    """Shingles hashed to int64 immediately — at scale we never shuffle
    shingle *strings*, only 8-byte hashes."""
    return F.transform(word_shingles(col, n), lambda s: F.xxhash64(s))


def minhash_signature(shingle_hashes, num_perm: int = 64) -> Column:
    """MinHash signature: for seed i, min over shingles of
    xxhash64(seed_i, h). Universal-hash family via seeded xxhash64;
    one pass, pure expressions (array of int64 length num_perm)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_perm - 1)),
        lambda seed: F.array_min(
            F.transform(shingle_hashes, lambda h: F.xxhash64(seed, h))
        ),
    )


def band_hashes(signature, num_bands: int, rows_per_band: int) -> Column:
    """LSH banding: hash each contiguous `rows_per_band` slice of the
    signature into one int64 bucket key per band."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_bands - 1)),
        lambda b: F.xxhash64(
            b, F.concat_ws(",", F.slice(signature, b * rows_per_band + 1, rows_per_band))
        ),
    )


def simhash_bits(col, num_bits: int = 64) -> Column:
    """SimHash fingerprint as an array<int> of bits (index 0 = MSB).

    Each token votes its xxhash64 bits; fingerprint bit i is 1 when
    the vote is positive. Kept as a bit array rather than one int64:
    Spark's shift functions take literal distances only, and packing
    the top bit would overflow ANSI long arithmetic — the array form
    stays pure-expression and chunk-packs safely (<= 32 bits each).
    """
    toks = ws_tokens(col)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_bits - 1)),
        lambda i: F.when(
            F.aggregate(
                hashes,
                F.lit(0),
                lambda acc, h: acc
                + F.when(F.getbit(h, i) == 1, F.lit(1)).otherwise(F.lit(-1)),
            )
            > 0,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )


def pack_bits(bits_slice) -> Column:
    """Pack a <=32-bit slice (array<int> of 0/1) into one int64 key."""
    return F.aggregate(
        bits_slice, F.lit(0).cast("long"), lambda acc, b: acc * 2 + b
    )


def hamming_bits(a, b) -> Column:
    """Hamming distance between two equal-length bit arrays."""
    return F.size(F.filter(F.zip_with(a, b, lambda x, y: x != y), lambda d: d))
