"""Shared Column-expression helpers (all JVM-side; no Python UDFs).

These are the building blocks for the dedup / similarity / text
operators. Everything here compiles to Catalyst expressions so the
hot path stays inside whole-stage codegen at 100 TB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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
    k = F.size(toks) - F.lit(n - 1)
    # guard k < 1 explicitly: sequence(1, 0) counts DOWN ([1, 0]) in
    # Spark rather than producing an empty array
    idx = F.when(k >= 1, F.sequence(F.lit(1), k)).otherwise(
        F.array().cast("array<int>")
    )
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    )


def hashed_shingles(col, n: int = 3) -> Column:
    """Shingles hashed to int64 immediately — at scale we never shuffle
    shingle *strings*, only 8-byte hashes."""
    return F.transform(word_shingles(col, n), lambda s: F.xxhash64(s))


def hashed_shingles_fast(col, n: int = 3) -> Column:
    """Distinct n-word shingle hashes as array<long>, pure Catalyst,
    with the string work minimized: each TOKEN is hashed exactly once
    (xxhash64), then each shingle hash combines n consecutive token
    hashes with one more xxhash64 over longs — no per-shingle string
    concat, no per-shingle array slice. The remaining cost is the
    interpreted higher-order transform over ~|tokens| elements of
    integer-only hashing.

    Hash identity differs from hashed_shingles/_udf, which is fine for
    every caller (dedup jaccard/minhash need only a consistent 64-bit
    hash; set sizes and jaccard values are hash-independent modulo
    ~n^2/2^64 collisions).
    """
    toks = ws_tokens(col)
    th = F.transform(toks, lambda t: F.xxhash64(t))
    k = F.size(toks) - F.lit(n - 1)
    idx = F.when(k >= 1, F.sequence(F.lit(1), k)).otherwise(
        F.array().cast("array<int>")
    )
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.xxhash64(*[F.element_at(th, i + j) for j in range(n)]),
        )
    )


def word_shingles_udf(n: int = 3):
    """Vectorized twin of word_shingles (array<string> of distinct
    n-word shingles) as an Arrow-batched pandas UDF.

    Semantically identical to the expression form (same \\s+ split,
    same distinct), but ~10x faster in bulk: the nested
    sequence/transform/slice expression tree is evaluated interpreted
    per array element, while this does plain Python string ops per
    batch. Use the expression form inside larger Column expressions,
    this one for corpus-scale dedup pipelines.
    """

    @F.pandas_udf("array<string>")
    def _shingle(texts: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return []
            toks = t.split()
            if len(toks) < n:
                return []
            seen = dict.fromkeys(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1))
            return list(seen)

        return texts.apply(one)

    return _shingle


def positional_kgram_hashes_udf(k: int = 10):
    """POSITIONAL k-word-gram hashes as array<long>: element i is the
    keyed 8-byte blake2b of tokens[i:i+k] joined by one space (t.split()
    tokenization, same as hashed_shingles_udf). Unlike the shingle UDF
    this keeps every position and does NOT dedupe — the array index IS
    the token offset, which substring-span detection needs to map hash
    matches back to document coordinates. Gram strings never cross the
    Arrow boundary; only 8-byte hashes shuffle. A hash collision can
    merge two unrelated grams (odds ~positions^2/2^64 — negligible even
    at corpus scale, same accepted class as hashed_shingles_udf)."""
    import hashlib

    @F.pandas_udf("array<long>")
    def _h(texts: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return []
            toks = t.split()
            if len(toks) < k:
                return []
            out = []
            for i in range(len(toks) - k + 1):
                v = int.from_bytes(
                    hashlib.blake2b(
                        " ".join(toks[i : i + k]).encode("utf-8"), digest_size=8
                    ).digest(),
                    "big",
                )
                out.append(v - (1 << 64) if v >= (1 << 63) else v)
            return out

        return texts.apply(one)

    return _h


def hashed_shingles_udf(n: int = 3):
    """Distinct n-word shingles hashed straight to int64 inside the
    UDF (keyed 8-byte blake2b) — shingle STRINGS never cross the
    Arrow boundary and never shuffle. This is the bulk-dedup fast
    path; hash identity doesn't matter to callers (any consistent
    64-bit hash yields the same set sizes / jaccard, collision odds
    ~n^2/2^64).

    Measured (scripts/bench_shingles.py, sf0.1 documents, 32 cores,
    median of 3): udf 0.63s, expression form 0.89s, token-hash-once
    expression (hashed_shingles_fast) 4.33s — the Arrow-batched UDF
    wins, so dedup keeps it; the interpreted higher-order transforms
    lose despite staying JVM-side."""
    import hashlib

    @F.pandas_udf("array<long>")
    def _h(texts: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return []
            toks = t.split()
            if len(toks) < n:
                return []
            seen = dict.fromkeys(
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            )
            out = []
            for s in seen:
                v = int.from_bytes(
                    hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big"
                )
                out.append(v - (1 << 64) if v >= (1 << 63) else v)
            return out

        return texts.apply(one)

    return _h


def minhash_signature(shingle_hashes, num_perm: int = 64) -> Column:
    """MinHash signature as pure Catalyst expressions: for seed i, min
    over shingles of xxhash64(seed_i, h).

    NOTE: nested higher-order array functions are evaluated
    interpreted (not codegen'd) — O(num_perm * |shingles|) object
    churn per row. Correct, but for bulk runs prefer
    `minhash_signature_udf` (vectorized Arrow kernel, ~10x faster).
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_perm - 1)),
        lambda seed: F.array_min(
            F.transform(shingle_hashes, lambda h: F.xxhash64(seed, h))
        ),
    )


def _splitmix64(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def minhash_signature_udf(num_perm: int = 64):
    """Vectorized MinHash signature: a pandas UDF computing all
    `num_perm` permutations per row with one numpy broadcast
    (multiply-shift hashing a_i*h+b_i over uint64 wraparound).

    Deterministic: coefficients derive from splitmix64(i), identical
    on every executor and every run — no RNG state to ship. This is
    the documented slow-path escape hatch used precisely because the
    pure-expression form (minhash_signature) interprets nested array
    lambdas per element.
    """
    a = np.array([_splitmix64(2 * i + 1) | 1 for i in range(num_perm)], dtype=np.uint64)
    b = np.array([_splitmix64(2 * i + 2) for i in range(num_perm)], dtype=np.uint64)

    @F.pandas_udf("array<long>")
    def _sig(sh: pd.Series) -> pd.Series:
        def one(hashes):
            if hashes is None or len(hashes) == 0:
                return []
            h = np.asarray(hashes, dtype=np.int64).astype(np.uint64)
            vals = a[:, None] * h[None, :] + b[:, None]  # uint64 wrap
            return vals.min(axis=1).astype(np.int64).tolist()

        return sh.apply(one)

    return _sig


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


def simhash_bits_udf(num_bits: int = 64):
    """Vectorized twin of simhash_bits: blake2b token digests unpacked
    to bit matrices, +-1 votes summed with numpy. Deterministic
    (keyed blake2b, no process-dependent hashing); same output shape
    (array<int> of 0/1, index 0 = MSB of the 8-byte digest)."""
    import hashlib

    @F.pandas_udf("array<int>")
    def _simhash(texts: pd.Series) -> pd.Series:
        nbytes = num_bits // 8

        def one(t):
            toks = t.split() if t else []
            if not toks:
                return [0] * num_bits
            digests = b"".join(
                hashlib.blake2b(tok.encode("utf-8"), digest_size=nbytes).digest()
                for tok in toks
            )
            bits = np.unpackbits(np.frombuffer(digests, dtype=np.uint8)).reshape(
                len(toks), num_bits
            )
            votes = bits.astype(np.int32).sum(axis=0) * 2 - len(toks)
            return (votes > 0).astype(np.int32).tolist()

        return texts.apply(one)

    return _simhash


def pack_bits(bits_slice) -> Column:
    """Pack a <=32-bit slice (array<int> of 0/1) into one int64 key."""
    return F.aggregate(
        bits_slice, F.lit(0).cast("long"), lambda acc, b: acc * 2 + b
    )


def hamming_bits(a, b) -> Column:
    """Hamming distance between two equal-length bit arrays."""
    return F.size(F.filter(F.zip_with(a, b, lambda x, y: x != y), lambda d: d))
