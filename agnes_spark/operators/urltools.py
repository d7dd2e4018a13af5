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
    single label (localhost, intranet names) pass through unchanged."""
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
