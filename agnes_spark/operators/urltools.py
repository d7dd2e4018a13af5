"""URL canonicalization for web-corpus dedup (the C4 / RefinedWeb
"one document per URL" step).

Web crawls carry the same page under many spellings — scheme/host
case, `www.`, default ports, tracking query params, param order,
trailing slashes, index files, fragments. `normalize_url` folds all of
those into one canonical string with built-in column functions only
(try_parse_url + regexp/array ops — whole-stage codegen, no UDF), so
URL-level dedup over a 100 TB crawl is a scan + one groupBy on the
canonical string.

`registered_domain` extracts the eTLD+1-ish owner domain (a compact
embedded multi-part-suffix list stands in for the full Public Suffix
List; swap `MULTI_PART_SUFFIXES` for a PSL snapshot in production) —
the key for per-domain crawl budgets and domain-level mixture stats.

Reference parity: the reference engine's text/dedup surface
(agnes FUTURE.md corpus-curation bullets); re-expressed Spark-first.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Query params that identify a click, not a resource (dropped wholesale).
TRACKING_PARAM_RE = (
    "^(utm_[^=]*|fbclid|gclid|gbraid|wbraid|msclkid|mc_eid|mc_cid|ref"
    "|ref_src|igshid|spm|yclid|_ga|s_kwcid)="
)

# Multi-part public suffixes where the registered domain is LABEL.SUFFIX
# with a two-label suffix (tiny embedded subset of the PSL).
MULTI_PART_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "co.jp", "ne.jp", "or.jp", "ac.jp",
    "co.kr", "or.kr", "com.br", "net.br", "org.br", "com.mx",
    "com.cn", "net.cn", "org.cn", "com.tr", "co.in", "net.in",
    "co.za", "com.ar", "com.sg", "co.nz", "net.nz", "org.nz",
)

_DEFAULT_PORTS = (("http", "80"), ("https", "443"), ("ftp", "21"))


def normalize_url(url: Column | str) -> Column:
    """Canonicalize a URL column: lowercase scheme+host, strip `www.`
    and trailing host dots, drop scheme-default ports (keep others),
    strip trailing slashes and `/index.html|htm|php`, drop tracking
    params, sort surviving query params, drop the fragment. NULL in ->
    NULL out; a URL with no parseable host canonicalizes to NULL
    (crawl rows with junk URLs fall out of the dedup key instead of
    colliding on a garbage string)."""
    u = F.trim(F.col(url) if isinstance(url, str) else url)
    scheme = F.lower(F.try_parse_url(u, F.lit("PROTOCOL")))
    authority = F.try_parse_url(u, F.lit("AUTHORITY"))
    host = F.regexp_replace(
        F.regexp_replace(F.lower(F.try_parse_url(u, F.lit("HOST"))), r"^www\.", ""),
        r"\.$",
        "",
    )
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    default_port = F.lit("")
    for sch, p in _DEFAULT_PORTS:
        default_port = F.when(scheme == sch, F.lit(p)).otherwise(default_port)
    port_part = F.when(
        (port == "") | (port == default_port), F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.regexp_replace(
        F.coalesce(F.try_parse_url(u, F.lit("PATH")), F.lit("")),
        r"(/index\.(html?|php))?/*$",
        "",
    )
    query = F.coalesce(F.try_parse_url(u, F.lit("QUERY")), F.lit(""))
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~F.lower(p).rlike(TRACKING_PARAM_RE),
    )
    qnorm = F.array_join(F.array_sort(kept), "&")
    query_part = F.when(qnorm == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), qnorm)
    )
    return F.when(
        host.isNull() | (host == "") | scheme.isNull(),
        F.lit(None).cast("string"),
    ).otherwise(F.concat(scheme, F.lit("://"), host, port_part, path, query_part))


def registered_domain(host: Column | str) -> Column:
    """Owner domain of a (lowercased) hostname: last two labels, or
    last three when the two-label tail is a multi-part public suffix
    (`news.bbc.co.uk` -> `bbc.co.uk`, not `co.uk`). Hosts with a
    single label (localhost, intranet names) pass through unchanged.

    This is the LIGHTWEIGHT form — a pure column expression over the
    embedded suffix subset, fine for tests and single-lineage gates.
    Production domain-level budgets/rollups should use
    `registered_domain_psl` with a real Public Suffix List snapshot:
    the embedded subset mis-groups ccTLD domains it doesn't know
    (e.g. `*.gov.br`) and cannot express wildcard/exception rules."""
    h = F.col(host) if isinstance(host, str) else host
    parts = F.split(h, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2), F.element_at(parts, -1)
    )
    return (
        F.when(n <= 2, h)
        .when(last2.isin(*MULTI_PART_SUFFIXES), last3)
        .otherwise(last2)
    )


def parse_psl_rules(lines) -> list[tuple[str, str]]:
    """Parse Public Suffix List text lines into (kind, suffix) pairs,
    kind in {"exact", "wild", "exc"} — the publicsuffix.org format:
    comments (`//`) and blanks skipped, `*.<base>` stored as
    ("wild", base), `!<rule>` as ("exc", rule), everything else as
    ("exact", rule); lowercased. Only leftmost-label wildcards are
    supported (the only form the published list uses)."""
    out = []
    for ln in lines:
        s = ln.strip().lower()
        if not s or s.startswith("//"):
            continue
        if s.startswith("!"):
            out.append(("exc", s[1:]))
        elif s.startswith("*."):
            out.append(("wild", s[2:]))
        elif s == "*":
            continue  # the implicit default rule is always applied
        else:
            out.append(("exact", s))
    return out


def registered_domain_psl(
    df,
    host_col: str,
    psl_rules,
    out_col: str = "registered_domain",
):
    """eTLD+1 per the full Public Suffix List algorithm
    (publicsuffix.org/list/), against a USER-SUPPLIED snapshot —
    wildcard (`*.ck`) and exception (`!www.ck`) rules included.

    `psl_rules` is an iterable of PSL text lines (or pre-parsed
    (kind, suffix) pairs from parse_psl_rules). The snapshot is
    grouped by label count driver-side (~10k rules, trivially
    broadcastable) and matched with ONE left broadcast hash join per
    distinct rule label count against the host's k-label tail — no
    explode, no shuffle, no re-aggregation: the big side keeps its
    single scan lineage and partitioning. Matching follows the spec:
    an exception rule wins outright (its public suffix drops the
    leftmost label), else the longest matching exact/wildcard rule,
    else the implicit `*` default (last label). The registered domain
    is the public suffix plus one preceding label; a host that IS a
    public suffix (or NULL) yields NULL — unlike the lightweight
    `registered_domain`, which passes single-label hosts through.

    Hosts are matched lowercased; supply already-normalized hostnames
    (normalize_url lowercases).
    """
    from pyspark.sql import functions as F  # noqa: F811 (local clarity)

    rules = list(psl_rules)
    if rules and isinstance(rules[0], str):
        rules = parse_psl_rules(rules)
    # group rules by the label count of the TAIL they match:
    #   exact rule with k labels  -> matches tail_k, public suffix k
    #   wild  base with k labels  -> matches tail_(k+1), suffix k+1
    #   exc   rule with k labels  -> matches tail_k, suffix k-1
    by_k: dict[int, dict[str, tuple[bool, bool, bool]]] = {}
    for kind, sfx in rules:
        k = sfx.count(".") + 1
        key_k = k  # label count of the JOIN KEY (the stored string)
        e, w, x = by_k.setdefault(key_k, {}).get(sfx, (False, False, False))
        if kind == "exact":
            e = True
        elif kind == "wild":
            w = True
        elif kind == "exc":
            x = True
        else:
            raise ValueError(f"unknown PSL rule kind: {kind}")
        by_k[key_k][sfx] = (e, w, x)

    spark = df.sparkSession
    h = F.lower(F.col(host_col))
    parts = F.split(h, r"\.")
    n = F.size(parts)
    out = df.withColumn("__psl_n", n)
    ps_candidates = [F.lit(1)]  # the implicit default rule
    exc_ps = F.lit(None).cast("int")
    for k in sorted(by_k):
        tbl = spark.createDataFrame(
            [(s, e, w, x) for s, (e, w, x) in sorted(by_k[k].items())],
            f"__psl_key_{k} string, __psl_e_{k} boolean, "
            f"__psl_w_{k} boolean, __psl_x_{k} boolean",
        )
        tail_k = F.when(
            F.size(F.split(F.lower(F.col(host_col)), r"\.")) >= k,
            F.concat_ws(
                ".", F.slice(F.split(F.lower(F.col(host_col)), r"\."), -k, k)
            ),
        )
        out = out.join(
            F.broadcast(tbl),
            tail_k == F.col(f"__psl_key_{k}"),
            "left",
        ).drop(f"__psl_key_{k}")
        # exact rule with k labels -> public suffix length k
        ps_candidates.append(
            F.when(F.col(f"__psl_e_{k}") & (F.col("__psl_n") >= k), F.lit(k))
        )
        # wildcard base with k labels -> suffix k+1, host needs k+1 labels
        ps_candidates.append(
            F.when(
                F.col(f"__psl_w_{k}") & (F.col("__psl_n") >= k + 1), F.lit(k + 1)
            )
        )
        # exception rule with k labels -> public suffix k-1, wins outright
        exc_ps = F.coalesce(
            F.when(F.col(f"__psl_x_{k}") & (F.col("__psl_n") >= k), F.lit(k - 1)),
            exc_ps,
        )
    # greatest() needs >= 2 args; an empty (or comment-only) rule
    # snapshot leaves only the implicit-default literal, which must
    # still apply as the '*' fallback rather than raise WRONG_NUM_COLUMNS
    best_rule = (
        F.greatest(*ps_candidates)
        if len(ps_candidates) > 1
        else ps_candidates[0]
    )
    ps = F.coalesce(exc_ps, best_rule)
    parts2 = F.split(F.lower(F.col(host_col)), r"\.")
    reg = F.when(
        F.col(host_col).isNotNull() & (F.col("__psl_n") > ps),
        F.concat_ws(".", F.slice(parts2, -(ps + F.lit(1)), ps + F.lit(1))),
    )
    out = out.withColumn(out_col, reg)
    drop = ["__psl_n"] + [
        c
        for k in by_k
        for c in (f"__psl_e_{k}", f"__psl_w_{k}", f"__psl_x_{k}")
    ]
    return out.drop(*drop)
