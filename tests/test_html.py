"""HTML main-content extraction: block splitting, boilerplate-region
removal, entity decoding, the density filter, and the zero-Python
plan pin."""

from agnes_spark.operators.html import html_extract_main

PAGE = (
    "<html><!-- generated -->"
    "<head><title>T</title><STYLE>body{color:red}</STYLE></head>"
    "<body>"
    "<NAV><a href='/'>Home</a> <a href='/a'>About</a></NAV>"
    "<P>This paragraph is the long main content of the page, kept.</P>"
    '<div class="ad">Click here now!</div>'
    "<script>var x = 1 < 2;</script>"
    "<footer>Copyright 2026 Example Corp &amp; Partners</footer>"
    "</body></html>"
)


def test_html_extract_main_end_to_end(spark):
    df = spark.createDataFrame([(1, PAGE)], "doc_id bigint, html string")
    r = html_extract_main(df, "html").collect()[0]
    # title (inside head, not a dropped region) + nav + main + ad + footer
    main = "This paragraph is the long main content of the page, kept."
    assert r.main_text == main
    assert r.n_content_blocks == 1
    # visible blocks: T / Home About / main / Click here now! / footer
    assert r.n_blocks == 5
    footer = "Copyright 2026 Example Corp & Partners"  # entity decoded
    assert r.visible_chars == (
        len("T") + len("Home About") + len(main) + len("Click here now!") + len(footer)
    )
    assert r.main_chars == len(main)
    assert 0.4 < r.boilerplate_frac < 0.6
    assert abs(r.boilerplate_frac - (1 - r.main_chars / r.visible_chars)) < 1e-6


def test_html_extract_entities_and_no_content(spark):
    rows = [
        # &amp;lt; decodes to the TEXT '&lt;', not to '<'
        (1, "<p>big big big big big big big big big &amp;lt; escaped text</p>"),
        # nothing reaches min_block_chars -> NULL main_text, frac 1.0
        (2, "<p>tiny</p><nav>menu</nav>"),
        # no visible text at all
        (3, "<script>x</script><!-- c -->"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, html string")
    got = {r.doc_id: r for r in html_extract_main(df, "html").collect()}
    assert got[1].main_text.endswith("&lt; escaped text")
    assert got[2].main_text is None
    assert got[2].n_blocks == 2 and got[2].n_content_blocks == 0
    assert got[2].boilerplate_frac == 1.0
    assert got[3].n_blocks == 0 and got[3].visible_chars == 0
    assert got[3].boilerplate_frac is None


def test_html_extract_multiblock_join_and_case(spark):
    html = (
        "<DIV>First dense block of content with plenty of characters here.</DIV>"
        "<p>Second dense block of content, also safely past the bar.</p>"
    )
    df = spark.createDataFrame([(1, html)], "doc_id bigint, html string")
    r = html_extract_main(df, "html").collect()[0]
    assert r.n_content_blocks == 2
    assert r.main_text.count("\n") == 1
    assert r.boilerplate_frac == 0.0


def test_html_extract_stays_jvm_side(spark):
    df = spark.createDataFrame([(1, PAGE)], "doc_id bigint, html string")
    plan = (
        html_extract_main(df, "html")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan
    assert "Exchange" not in plan  # per-row projection, no shuffle
