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


def sample_to_budget_scalable(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    weight_col: str,
    budget: float | dict,
    seed: int = 0,
    margin: float = 4.0,
) -> DataFrame:
    """sample_to_budget with a BOUNDED sort input — the 100 TB form.

    The plain operator's running-sum window sorts every row of every
    stratum; at corpus scale that is the whole corpus through one sort.
    But the selection is a PREFIX of the Knuth-hash rank order and the
    hash is uniform, so the winners almost surely sit below a hash
    threshold of ~(budget/total_weight): one cheap aggregate computes
    per-stratum totals, rows above `margin` times that fraction are
    dropped BEFORE the window, and the exact pass runs on ~margin *
    budget worth of rows per stratum instead of everything.

    Exactness is verified, not assumed: a stratum's prefilter is
    provably sufficient when its selection actually exhausted the
    budget (or the stratum was taken whole); any stratum where weight
    skew beat the margin falls back to the exact pass over just that
    stratum. Output is row-identical to sample_to_budget for every
    input (test-pinned), and the driver-side state is one row per
    stratum — never row data.
    """
    totals = {
        r["s"]: (float(r["tw"] or 0.0), int(r["n"]))
        for r in df.groupBy(F.col(strata_col).alias("s"))
        .agg(
            F.sum(F.col(weight_col).cast("double")).alias("tw"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    buddict = budget if isinstance(budget, dict) else {s: float(budget) for s in totals}
    frac = {}
    for s, (tw, _n) in totals.items():
        b = float(buddict.get(s, 0.0))
        frac[s] = 1.0 if tw <= 0 else min(1.0, margin * b / tw)
    pairs = [x for s, fr in frac.items() for x in (F.lit(s), F.lit(int(fr * _M32)))]
    thresh = F.coalesce(F.create_map(*pairs)[F.col(strata_col)], F.lit(0))
    cand = df.filter(_knuth_key(id_col, seed) < thresh)
    out = sample_to_budget(cand, strata_col, id_col, weight_col, budget, seed=seed)
    # sufficiency check per stratum: selected weight >= budget means the
    # prefix stopped INSIDE the candidate set — any row the prefilter
    # dropped ranks after every candidate, so the full-data selection is
    # identical. Only a stratum whose candidates ran dry below budget
    # (weight skew beat the margin) needs the exact fallback.
    sel = {
        r["s"]: float(r["sw"] or 0.0)
        for r in out.groupBy(F.col(strata_col).alias("s"))
        .agg(F.sum(F.col(weight_col).cast("double")).alias("sw"))
        .collect()
    }
    retry = []
    for s, (tw, _n) in totals.items():
        b = float(buddict.get(s, 0.0))
        if b <= 0 or frac[s] >= 1.0:
            continue
        if sel.get(s, 0.0) < b:  # truncated by the prefilter
            retry.append(s)
    if retry:
        exact = sample_to_budget(
            df.filter(F.col(strata_col).isin(retry)),
            strata_col, id_col, weight_col, budget, seed=seed,
        )
        out = out.filter(~F.col(strata_col).isin(retry)).unionByName(exact)
    return out


def budget_fill_by_rank(
    df: DataFrame,
    strata_col: str,
    weight_col: str,
    budget: float | dict,
    rank_cols: list,
    rank_col: str = "fill_rank",
) -> DataFrame:
    """Per-stratum budget fill in an EXPLICIT rank order — the
    RefinedWeb per-domain crawl-cap step: keep each domain's BEST
    documents (quality-first, not hash-random like sample_to_budget)
    until a char/token budget is met.

    `rank_cols` is the full ordering (e.g. [quality.desc(),
    doc_id.asc()]); make it total or the selection is undefined. A row
    survives iff the cumulative weight of rows ranked BEFORE it is
    still below the stratum's budget — overshoot is at most one row,
    and the selection is reproducible by any engine that sorts the
    same keys. `budget` is one number or a {stratum: budget} dict
    (missing strata get 0 — excluded, never silently everything).
    Emits `rank_col`, the 1-based rank within the stratum.

    The running sum uses an explicit ROWS frame (unboundedPreceding ..
    currentRow), so even a NON-total `rank_cols` degrades to a
    deterministic-frame semantics: each row's cumulative weight counts
    rows in its (engine-chosen but frame-consistent) row order rather
    than silently including every tied peer's weight, and it always
    agrees with the row_number() rank emitted alongside.

    One shuffle on the stratum key + a running-sum window. This exact
    form sorts every row of every stratum; at corpus scale use
    budget_fill_by_rank_scalable, which bounds the sort input to
    ~budget-worth of rows per stratum and is row-identical.
    """
    # explicit ROWS frame: the default RANGE frame would include ALL
    # tied peers' weights in the running sum when rank_cols is not
    # total (r10 advice) — ROWS keeps it consistent with row_number()
    w = (
        Window.partitionBy(strata_col)
        .orderBy(*rank_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_rank = Window.partitionBy(strata_col).orderBy(*rank_cols)
    if isinstance(budget, dict):
        pairs = [x for kv in budget.items() for x in (F.lit(kv[0]), F.lit(float(kv[1])))]
        bud = F.coalesce(F.create_map(*pairs)[F.col(strata_col)], F.lit(0.0))
    else:
        bud = F.lit(float(budget))
    cum_before = F.coalesce(
        F.sum(F.col(weight_col).cast("double")).over(w) - F.col(weight_col).cast("double"),
        F.lit(0.0),
    )
    return (
        df.withColumn(rank_col, F.row_number().over(w_rank))
        .withColumn("__cb", cum_before)
        .filter(F.col("__cb") < bud)
        .drop("__cb")
    )


def budget_fill_by_rank_scalable(
    df: DataFrame,
    strata_col: str,
    weight_col: str,
    budget: float | dict,
    key_col: str,
    tiebreak_col: str,
    rank_col: str = "fill_rank",
) -> DataFrame:
    """budget_fill_by_rank with a BOUNDED sort input — the 100 TB form
    (threshold-then-boundary-sort).

    Requires the primary rank key to be one NUMERIC column, ascending
    = better (negate a quality score for quality-first fill), with
    `tiebreak_col` ascending completing the total order, and weights
    to be NON-NEGATIVE: pass-1 key pruning assumes cumulative weight
    is monotone in key order, so a negative weight could revive a key
    the prune dropped — the exact form accepts any weights, this form
    does not (r10 advice; enforced below, not just documented). Pass 1
    aggregates (stratum, key) -> weight — map-side combined, the
    shuffle carries one row per DISTINCT key, not per row — and a
    window over that per-key frame keeps exactly the keys whose
    strictly-better predecessors haven't exhausted the budget. Any
    row of a dropped key is provably unselectable (even ranked first
    within its key, >= budget weight precedes it), so the exact pass
    runs on ~budget-worth of candidate rows per stratum plus one
    boundary key — no margin parameter, no fallback, row-identical to
    the exact form for every input (test-pinned).
    """
    if isinstance(budget, dict):
        pairs = [x for kv in budget.items() for x in (F.lit(kv[0]), F.lit(float(kv[1])))]
        bud = F.coalesce(F.create_map(*pairs)[F.col(strata_col)], F.lit(0.0))
    else:
        bud = F.lit(float(budget))
    # enforce the non-negative-weight precondition IN the pass-1 scan
    # (a per-row branch, negligible next to the shuffle): silently
    # divergent selections are worse than a loud failure
    wchk = F.col(weight_col).cast("double")
    wchk = F.when(wchk.isNull() | (wchk >= 0), wchk).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "budget_fill_by_rank_scalable requires weight >= 0, got "
                ),
                wchk.cast("string"),
            )
        )
    )
    perkey = df.groupBy(strata_col, key_col).agg(F.sum(wchk).alias("__kw"))
    wk = Window.partitionBy(strata_col).orderBy(F.col(key_col).asc())
    cum_before = F.coalesce(
        F.sum("__kw").over(wk) - F.col("__kw"), F.lit(0.0)
    )
    kept = (
        perkey.withColumn("__cb", cum_before)
        .filter(F.col("__cb") < bud)
        .select(strata_col, key_col)
    )
    cand = df.join(kept, on=[strata_col, key_col], how="left_semi")
    return budget_fill_by_rank(
        cand,
        strata_col,
        weight_col,
        budget,
        [F.col(key_col).asc(), F.col(tiebreak_col).asc()],
        rank_col=rank_col,
    )


def weighted_sample_aes(
    df: DataFrame,
    id_col: str,
    weight_col,
    k: int,
    seed: int = 0,
) -> DataFrame:
    """Weighted sampling without replacement via A-ES rank keys
    (Efraimidis & Spirakis, IPL 2006): each row gets rank
    u^(1/weight) for u uniform in (0,1); the k largest ranks are a
    weighted sample without replacement. One TakeOrdered over a pure
    projection — no per-row RNG state, no rejection loop, and the
    selection is a deterministic function of (id, weight, seed): any
    engine that can multiply integers draws the SAME sample, so a
    resumed/re-run 100 TB job reproduces its sample exactly.

    Weights are used at face value — fractional weights in (0,1)
    keep their true inclusion odds (u^(1/w) for w<1 pushes ranks
    toward 0, as A-ES requires). Rows with weight <= 0 are excluded
    from the sample frame entirely (A-ES is undefined there; they
    must never be sampleable), matching the paper's w > 0 domain.

    `u` comes from the Knuth multiplicative hash of (id + seed) —
    arithmetic, engine-portable (same rationale as
    stratified_sample_exact) — never from rand().
    """
    # pmod BEFORE the multiply (same pattern as stratified_sample_exact):
    # the product is then bounded by 2^31 * KNUTH < int64 max, where
    # (id + seed) * KNUTH overflows under ANSI mode for ids >= ~3.47e9 —
    # exactly the id range a 100 TB corpus reaches.
    u = (
        (
            F.pmod(
                F.pmod(F.col(id_col) + F.lit(seed), F.lit(_M31)) * F.lit(_KNUTH),
                F.lit(_M31),
            )
            + 0.5
        )
        / F.lit(float(_M31))
    )
    w = (
        weight_col if not isinstance(weight_col, str) else F.col(weight_col)
    ).cast("double")
    rk = F.pow(u, F.lit(1.0) / w)
    return (
        df.filter(w > F.lit(0.0))
        .withColumn("aes_rank", rk)
        .orderBy(F.col("aes_rank").desc(), F.col(id_col).asc())
        .limit(k)
    )


def domain_mixture_weights(
    df: DataFrame,
    domain_cols: list[str],
    size_col,
    temperature: float = 0.7,
) -> DataFrame:
    """Temperature-scaled sampling weights per domain — the mixture
    schedule of multilingual/multi-source training runs (raise rare
    domains, damp dominant ones: w_d proportional to p_d^tau, tau<1
    flattens). Returns one row per domain: the exact size sum, the
    share p_d, and the normalized weight.

    One domain aggregate (exact integer sizes) + a 1-row totals
    broadcast; p^tau is exp/ln-class math over ratios of exact
    integers (round-6 stable cross-engine, the lm_surprise
    precedent), and the final normalization sums |domains| doubles —
    a bounded cell frame, never data-sized."""
    per = df.groupBy(*[F.col(c) for c in domain_cols]).agg(
        F.sum(F.col(size_col).cast("long")).cast("long").alias("n_size")
    )
    tot = per.agg(F.sum("n_size").cast("long").alias("n_tot"))
    p = F.col("n_size").cast("double") / F.col("n_tot").cast("double")
    scaled = per.crossJoin(F.broadcast(tot)).withColumn(
        "__pt", F.pow(p, F.lit(float(temperature)))
    )
    denom = scaled.agg(F.sum("__pt").alias("__z"))
    return (
        scaled.crossJoin(F.broadcast(denom))
        .select(
            *domain_cols,
            "n_size",
            p.alias("share"),
            (F.col("__pt") / F.col("__z")).alias("weight"),
        )
    )


def assign_folds(
    df: DataFrame,
    key_col: str,
    k: int = 5,
    mult: int = 40503,
    inc: int = 7,
) -> DataFrame:
    """Add `fold`: a deterministic k-fold assignment from pure integer
    arithmetic on `key_col` — the cross-validation / sharded-eval
    splitter. pmod-before-multiply keeps the product inside int64 for
    any key magnitude (the weighted_sample_aes overflow lesson), and
    the LCG-style mix decorrelates fold from key order so folds are
    size-balanced without any shuffle: one stateless projection,
    reproducible by ANY engine that can multiply integers (unlike
    rand(seed), whose stream is engine-private).
    """
    key = F.pmod(F.col(key_col).cast("long"), F.lit(_M31))
    fold = F.pmod(key * F.lit(mult) + F.lit(inc), F.lit(int(k)))
    return df.withColumn("fold", fold.cast("int"))
