"""URL canonicalization (operators/urltools.py) — the C4/RefinedWeb
one-doc-per-URL dedup key."""

from agnes_spark.operators.urltools import normalize_url, registered_domain


def _norm(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.c for r in df.select(normalize_url("url").alias("c")).collect()]


def test_normalize_url_folds_all_variant_classes(spark):
    got = _norm(
        spark,
        [
            # case + www + default port + tracking + unsorted params + fragment
            "HTTPS://WWW.Example.COM:443/Articles/5/?utm_source=f&z=1&id=3#frag",
            "https://example.com/Articles/5?id=3&z=1",
            # non-default port is MEANINGFUL and kept
            "http://example.com:8080/a/index.html",
            # trailing host dot, trailing path slash
            "http://news.bbc.co.uk./path/",
            # bare host, no path
            "https://example.com",
            # all-tracking query disappears entirely
            "http://example.com/?fbclid=xyz&REF=home",
        ],
    )
    assert got[0] == got[1] == "https://example.com/Articles/5?id=3&z=1"
    assert got[2] == "http://example.com:8080/a"
    assert got[3] == "http://news.bbc.co.uk/path"
    assert got[4] == "https://example.com"
    assert got[5] == "http://example.com"


def test_normalize_url_junk_and_null_give_null(spark):
    got = _norm(spark, ["not a url", None])
    assert got == [None, None]


def test_registered_domain_multi_part_suffixes(spark):
    hosts = [
        "news.bbc.co.uk", "bbc.co.uk", "example.com", "localhost",
        "a.b.c.com.au", "x.org", "deep.sub.example.com",
    ]
    df = spark.createDataFrame([(h,) for h in hosts], "h string")
    got = [r.rd for r in df.select(registered_domain("h").alias("rd")).collect()]
    assert got == [
        "bbc.co.uk", "bbc.co.uk", "example.com", "localhost",
        "c.com.au", "x.org", "example.com",
    ]


def test_normalize_url_stays_jvm_side(spark):
    df = spark.createDataFrame([("http://a.com/x",)], "url string")
    plan = (
        df.select(normalize_url("url").alias("c"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan


# --- registered_domain_psl: the real-PSL snapshot path (r10 verdict
# item 4) — wildcard and exception rules, deep ccTLD suffixes, and
# the spec's host-is-a-suffix -> NULL behavior, pinned against hand
# computed eTLD+1 values from the published algorithm.

PSL_SNAPSHOT = """\
// ===BEGIN ICANN DOMAINS===
com
net
org
uk
co.uk
gov.uk
jp
co.jp
br
gov.br
// wildcard: every label under ck is a public suffix ...
*.ck
// ... except www.ck, which is registrable
!www.ck
// ===END ICANN DOMAINS===
"""


def test_registered_domain_psl_spec_cases(spark):
    from agnes_spark.operators.urltools import registered_domain_psl

    cases = [
        # (host, expected eTLD+1 per publicsuffix.org algorithm)
        ("example.com", "example.com"),
        ("deep.sub.example.com", "example.com"),
        ("news.bbc.co.uk", "bbc.co.uk"),
        ("bbc.co.uk", "bbc.co.uk"),
        ("foo.gov.uk", "foo.gov.uk"),
        ("a.b.foo.gov.uk", "foo.gov.uk"),
        ("keio.ac.jp", "ac.jp"),  # ac.jp NOT in this snapshot -> jp rules
        ("sony.co.jp", "sony.co.jp"),
        ("blog.sony.co.jp", "sony.co.jp"),
        ("registro.gov.br", "registro.gov.br"),
        # wildcard *.ck: foo.ck is itself a suffix -> no registrable dom
        ("foo.ck", None),
        ("bar.foo.ck", "bar.foo.ck"),
        ("deep.bar.foo.ck", "bar.foo.ck"),
        # exception !www.ck: www.ck IS registrable
        ("www.ck", "www.ck"),
        ("sub.www.ck", "www.ck"),
        # unknown TLD -> implicit * default rule (last label is suffix)
        ("example.zz", "example.zz"),
        ("sub.example.zz", "example.zz"),
        ("zz", None),  # host IS the (default-rule) suffix
        ("com", None),  # host IS a listed suffix
        ("uk", None),
        ("co.uk", None),
        ("MiXeD.ExAmPle.COM", "example.com"),  # matched lowercased
        (None, None),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "h string")
    out = registered_domain_psl(df, "h", PSL_SNAPSHOT.splitlines())
    got = {r.h: r.registered_domain for r in out.collect()}
    for host, want in cases:
        assert got[host] == want, (host, got[host], want)
    # row count preserved (left joins only, one rule row per key)
    assert out.count() == len(cases)


def test_registered_domain_psl_no_shuffle_no_python(spark):
    from agnes_spark.operators.urltools import registered_domain_psl

    df = spark.createDataFrame([("a.example.co.uk",)], "h string")
    out = registered_domain_psl(df, "h", PSL_SNAPSHOT.splitlines())
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    # every PSL lookup is a broadcast hash join: the big side never
    # shuffles (Exchange only appears for broadcast distribution)
    import re

    non_broadcast_exchanges = [
        ln
        for ln in plan.splitlines()
        if re.search(r"\bExchange\b", ln) and "broadcast" not in ln.lower()
    ]
    assert not non_broadcast_exchanges, non_broadcast_exchanges


def test_parse_psl_rules_kinds_and_noise():
    from agnes_spark.operators.urltools import parse_psl_rules

    lines = [
        "// comment",
        "",
        "COM",           # lowercased
        "co.uk",
        "*.ck",
        "!www.ck",
        "*",             # implicit default rule: skipped
        "  gov.br  ",    # trimmed
    ]
    got = parse_psl_rules(lines)
    assert got == [
        ("exact", "com"),
        ("exact", "co.uk"),
        ("wild", "ck"),
        ("exc", "www.ck"),
        ("exact", "gov.br"),
    ]


def test_registered_domain_psl_accepts_preparsed_rules(spark):
    from agnes_spark.operators.urltools import registered_domain_psl

    df = spark.createDataFrame(
        [("a.b.example.co.uk",), ("x.ck",)], "h string"
    )
    out = registered_domain_psl(
        df, "h", [("exact", "co.uk"), ("wild", "ck")]
    )
    got = {r.h: r.registered_domain for r in out.collect()}
    assert got["a.b.example.co.uk"] == "example.co.uk"
    assert got["x.ck"] is None  # x.ck IS a wildcard public suffix


def test_registered_domain_psl_empty_snapshot_falls_back_to_default(spark):
    """r11 advice: an empty (or comment-only) rule snapshot used to
    raise WRONG_NUM_COLUMNS from a 1-arg greatest(); it must instead
    apply only the implicit '*' default rule (last label is the public
    suffix)."""
    from agnes_spark.operators.urltools import registered_domain_psl

    df = spark.createDataFrame(
        [("sub.example.com",), ("example.com",), ("com",), (None,)],
        "h string",
    )
    for snapshot in ([], ["// comments only", "", "// nothing else"]):
        out = registered_domain_psl(df, "h", snapshot)
        got = {r.h: r.registered_domain for r in out.collect()}
        assert got["sub.example.com"] == "example.com"
        assert got["example.com"] == "example.com"
        assert got["com"] is None  # host IS the default-rule suffix
        assert got[None] is None
