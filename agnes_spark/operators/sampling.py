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
    key = _knuth_key(id_col, seed)
    w = Window.partitionBy(strata_col).orderBy(
        key.asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def _knuth_key(id_col: str, seed: int):
    """(id mod 2^31) * KNUTH + seed, mod 2^32 — pure BIGINT arithmetic
    any engine reproduces bit-exactly (see stratified_sample_exact)."""
    return F.pmod(
        F.pmod(F.col(id_col).cast("bigint"), F.lit(_M31)) * F.lit(_KNUTH)
        + F.lit(seed),
        F.lit(_M32),
    )


def sample_to_budget(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    weight_col: str,
    budget: float | dict,
    seed: int = 0,
) -> DataFrame:
    """Domain-mixing sampler: deterministically select rows per stratum
    until a per-stratum WEIGHT budget is met (token/char/byte counts —
    how pretraining mixes are actually specified, e.g. "20 B tokens of
    web, 5 B of code"), not a row count.

    Rows rank within their stratum by the same Knuth arithmetic hash as
    stratified_sample_exact; a row survives iff the cumulative weight of
    the rows ranked BEFORE it is still below the stratum's budget, so
    the selection always overshoots by at most one document and is
    reproducible on any engine. `budget` is one number for every
    stratum or a {stratum: budget} dict (missing strata get 0 — i.e.
    excluded entirely, never silently everything).

    One shuffle on the stratum key plus a running-sum window. The
    window sorts each stratum; at 100 TB with few strata, pre-filter
    with a cheap global cap (e.g. hash-threshold to ~2x the budget /
    avg-weight rows) before the exact pass so the sort input is bounded.
    """
    key = _knuth_key(id_col, seed)
    w = Window.partitionBy(strata_col).orderBy(key.asc(), F.col(id_col).asc())
    if isinstance(budget, dict):
        pairs = [x for kv in budget.items() for x in (F.lit(kv[0]), F.lit(float(kv[1])))]
        bud = F.coalesce(F.create_map(*pairs)[F.col(strata_col)], F.lit(0.0))
    else:
        bud = F.lit(float(budget))
    cum_before = F.coalesce(
        F.sum(F.col(weight_col).cast("double")).over(w) - F.col(weight_col).cast("double"),
        F.lit(0.0),
    )
    return df.withColumn("__cb", cum_before).filter(F.col("__cb") < bud).drop("__cb")
