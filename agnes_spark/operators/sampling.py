"""Deterministic sampling primitives for training-data pipelines.

`stratified_sample_exact` complements the fraction-based
`DataFrame.sampleBy` (used by the `stratified_sample` gate): sampleBy
is Bernoulli — per-stratum sizes fluctuate and the selection depends
on the engine's RNG stream — while training pipelines usually need
"exactly k per class, reproducible anywhere". Ranking by a pure
ARITHMETIC hash gives both: the same rows are selected by any engine
that can multiply integers, and every stratum yields exactly
min(k, |stratum|) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Knuth multiplicative hash constant (2^32 / phi)
_KNUTH = 2654435761
_M31 = 2147483648  # 2^31
_M32 = 4294967296  # 2^32


def stratified_sample_exact(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    k: int,
    seed: int = 0,
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, deterministically.

    Rows rank within each stratum by a Knuth multiplicative hash of
    the id — pure BIGINT arithmetic ((id mod 2^31) * 2654435761 + seed
    mod 2^32; the pre-mod keeps the product inside int64 under ANSI
    overflow checking) — and the first k per stratum survive. Pure
    arithmetic means any engine reproduces the exact selection, unlike
    RNG-stream sampling (sampleBy) whose choices are engine-private.

    One shuffle on the stratum key; the rank is a bounded window (top-k
    per partition), which Spark executes with a partial WindowGroupLimit
    below the exchange, so only ~k rows per stratum per map partition
    shuffle at 100 TB.
    """
    key = F.pmod(
        F.pmod(F.col(id_col).cast("bigint"), F.lit(_M31)) * F.lit(_KNUTH)
        + F.lit(seed),
        F.lit(_M32),
    )
    w = Window.partitionBy(strata_col).orderBy(
        key.asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
