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
