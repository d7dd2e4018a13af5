"""Bloom-filter semi-join reduction — prune a huge fact table against a
dimension's key set BEFORE the join shuffle.

The 100 TB problem: joining a fact table to a filtered dimension whose
surviving key set is too large to broadcast as an exact hash relation
(Spark's autoBroadcastJoinThreshold) still shuffles the ENTIRE fact
side, even though only a sliver of fact rows will match. Spark's own
answer is runtime row-level filtering (InjectRuntimeFilter builds a
BloomFilterAggregate on the creation side and probes it on the
application side before the exchange) — but it only fires above
size thresholds tuned for production (10 GB application-side scans)
and cannot be asked for explicitly from the DataFrame API.

This module is the explicit, same-shaped tool: a bitset Bloom filter

- BUILT distributed: keys -> k bit positions (xxhash64 seeded per
  hash) -> per-64-bit-word `bit_or` aggregate. Only the aggregated
  words (num_bits/64 rows, e.g. 1024 longs for a 2^16-bit filter)
  ever reach the driver, regardless of key count.
- PROBED JVM-side with zero shuffle: the word array is embedded as an
  array literal in the filter expression (shipped with tasks exactly
  like Spark's own runtime-filter subquery result), so the fact scan
  drops non-matching rows inside WholeStageCodegen before any
  exchange.

Sizing (standard Bloom math): for n keys and target false-positive
rate p, num_bits ~= -n*ln(p)/ln(2)^2 and num_hashes ~= num_bits/n*ln(2).
The defaults (2^16 bits, 5 hashes) give p < 1% up to ~5k keys; a 10M-key
dimension at p=1% wants ~12 MB of bits — still a cheap task broadcast
next to shuffling a 100 TB fact table.

False positives are fine for semi-join REDUCTION: the pruned fact side
still goes through the exact join, so results are identical to the
unpruned plan (bloom_semi_join below composes both). NULL fact keys may
pass the probe (xxhash64(NULL) hashes to the seed value) and are then
dropped by the exact join, matching plain-join semantics.

Reference parity: agnes has no Bloom operator; this generalizes its
equijoin (reference src/view.rs join) to the scale regime the reference
never reaches.
"""

from __future__ import annotations

import functools
import math
import operator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["size_bloom", "build_bloom", "bloom_might_contain", "bloom_semi_join"]


def size_bloom(n_keys: int, fp_rate: float = 0.01) -> tuple[int, int]:
    """Standard Bloom sizing for n keys at target false-positive rate:
    (num_bits, num_hashes) with num_bits word-aligned. Callers should
    size from the actual dimension key count (one tiny count job) —
    a fixed filter that is right at sf0.01 is 10x undersized at sf0.1
    and the false-positive leakage quietly eats the pruning."""
    if n_keys <= 0:
        return 64, 1
    ln2 = math.log(2.0)
    m = math.ceil(-n_keys * math.log(fp_rate) / (ln2 * ln2))
    m = max(64, ((m + 63) // 64) * 64)
    k = max(1, round(m / n_keys * ln2))
    return m, k


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """The k bit positions for a key: xxhash64 re-seeded per hash index
    by hashing (key, i). pmod keeps positions in [0, num_bits)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def build_bloom(
    dim: DataFrame, key_col: str, num_bits: int = 1 << 16, num_hashes: int = 5
) -> list[int]:
    """Build the filter distributed; return the packed word array
    (num_bits/64 longs). The aggregation is a single hash agg over at
    most num_bits/64 groups — the driver never sees the keys."""
    if num_bits % 64 != 0:
        raise ValueError(f"num_bits must be a multiple of 64 (got {num_bits})")
    key = F.col(key_col)
    pos = F.explode(F.array(*_positions(key, num_bits, num_hashes))).alias("pos")
    words = (
        dim.select(pos)
        .select(
            F.shiftright("pos", 6).alias("word_idx"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), F.pmod("pos", F.lit(64)).cast("int")
            ).alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
        .collect()  # <= num_bits/64 rows by construction, never data-sized
    )
    packed = [0] * (num_bits // 64)
    for r in words:
        packed[r["word_idx"]] = r["word"]
    return packed


def bloom_might_contain(
    key: Column, words: list[int], num_bits: int, num_hashes: int
) -> Column:
    """Membership probe as a pure JVM expression (no UDF, no shuffle):
    all k bits must be set in the embedded word array.

    The word array is shipped as ONE string literal and split/cast to
    array<bigint> — split and cast over a literal are foldable, so
    Catalyst's ConstantFolding collapses each reference to a single
    array Literal before codegen and the per-row probe is direct array
    indexing. The naive alternative, F.lit(list_of_longs), expands to
    one CreateArray with a Literal child PER WORD (one py4j call each):
    for a ~500-word filter referenced by k=5 hash tests that was a
    ~2,800-node predicate built from ~540 py4j round-trips PER
    INVOCATION — measured at 46-61s/run inside a long-lived session
    with 150+ accumulated queries (BENCH_r07) vs 0.9s in a fresh one,
    because both the gateway latency and the analyzer/optimizer passes
    over the giant tree degrade with session state. The folded form is
    ~80 nodes and ~10 py4j calls regardless of filter size."""
    mask = F.split(F.lit(",".join(map(str, words))), ",").cast("array<bigint>")
    tests = []
    for p in _positions(key, num_bits, num_hashes):
        word = F.get(mask, F.shiftright(p, 6).cast("int"))
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), F.pmod(p, F.lit(64)).cast("int")
        )
        tests.append(word.bitwiseAND(bit) != F.lit(0).cast("long"))
    return functools.reduce(operator.and_, tests)


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    num_bits: int | None = None,
    num_hashes: int = 5,
    how: str = "inner",
) -> DataFrame:
    """Exact join with Bloom pre-pruning of the fact side: identical
    results to fact.join(dim, ...) (the exact join removes the filter's
    false positives), but only the ~p false-positive fraction of
    non-matching fact rows ever reaches the join exchange.

    With num_bits=None (the default) the filter is sized from the
    dimension's actual key count via size_bloom (one count job — row
    count, which over-sizes on duplicate keys: conservative — at 1%
    target fp rate); pass explicit parameters only when the count is
    already known.

    Only inner/semi/right joins are allowed: the probe drops
    non-matching FACT rows before the join, so a left/full outer join
    would lose the null-extended rows those fact rows produce (and an
    anti join would return only the false positives) — silently wrong
    results, same failure class salted_join rejects."""
    if how not in ("inner", "semi", "left_semi", "leftsemi", "right", "right_outer", "rightouter"):
        raise ValueError(
            "bloom_semi_join supports inner/semi/right joins only: the Bloom "
            "probe removes non-matching fact rows BEFORE the join, which a "
            f"left/full outer or anti join would need to keep (got how={how!r})"
        )
    if num_bits is None:
        num_bits, num_hashes = size_bloom(dim.count(), 0.01)
    words = build_bloom(dim, dim_key, num_bits, num_hashes)
    pruned = fact.filter(
        bloom_might_contain(F.col(fact_key), words, num_bits, num_hashes)
    )
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], how)
