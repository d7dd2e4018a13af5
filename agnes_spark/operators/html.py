"""HTML main-content extraction — the step every crawl-curation
pipeline runs BEFORE text analysis: strip script/style/comments, drop
boilerplate regions (nav/header/footer/aside), split what remains into
block-level text runs, and keep the dense ones as main content.

Everything is pure Column expressions (regexp + array codegen — the
pii_scrub pattern): at 100 TB raw-HTML scale this runs at parquet-scan
speed inside whole-stage codegen, zero Python, no shuffle — it is a
per-row projection, embarrassingly parallel across splits.

Reference parity: the reference pipeline (agnes) starts at clean text;
this extends the curation chain upstream to raw crawl HTML the way
C4/RefinedWeb-style pipelines do (tag stripping, boilerplate removal,
block text-density selection).

Caveats (documented, not hidden): region removal is non-greedy
regexp-based, so a NESTED same-name region (<nav><nav></nav></nav>)
leaves a tail; real-world HTML with unclosed region tags keeps the
region's text (visible, counted as boilerplate only via the block
length filter). Both are the standard trade-offs of scan-side regex
extraction vs a DOM parse — the point is a 100 TB-capable first pass,
not a browser.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Regions whose TEXT is dropped entirely (never visible): code, styling
# and comments.
INVISIBLE_REGIONS = ("script", "style")
# Block-level regions that are visible but boilerplate by role: their
# text counts toward visible_chars yet never into main content.
BOILERPLATE_REGIONS = ("nav", "header", "footer", "aside")
# Block-level elements: a tag boundary here ends a text run. Inline
# tags (<a>, <b>, <span>, ...) are stripped to spaces WITHIN a run.
_BLOCK_ELEMS = (
    "p|div|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tr|td|th|section"
    "|article|main|blockquote|pre|figure|figcaption|form|fieldset|hr|br"
    "|nav|header|footer|aside|body|html|head|title"
)
BLOCK_TAG_RE = rf"(?i)</?(?:{_BLOCK_ELEMS})\b[^>]*>"

# Minimal entity set decoded after tag stripping; '&amp;' is decoded
# LAST so '&amp;lt;' becomes '&lt;' (the text), not '<'.
_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]


def _drop_regions(col: Column, tags: tuple) -> Column:
    # one non-greedy dotall replace per tag name: RE2 (the DuckDB
    # oracle's engine) has no backreferences, so the oracle mirrors
    # these exact per-tag patterns — keep them backreference-free here
    # too for 1:1 parity
    for t in tags:
        col = F.regexp_replace(col, rf"(?is)<{t}\b[^>]*>.*?</{t}\s*>", " ")
    return col


def _strip_comments(col: Column) -> Column:
    return F.regexp_replace(col, r"(?s)<!--.*?-->", " ")


def _block_texts(col: Column) -> Column:
    """Array of ws-normalized text runs: split on block-level tags,
    strip inline tags to spaces, decode entities, collapse whitespace;
    empty runs dropped."""
    arr = F.split(col, BLOCK_TAG_RE)
    def norm(b: Column) -> Column:
        b = F.regexp_replace(b, r"<[^>]*>", " ")
        for src, dst in _ENTITIES:
            b = F.replace(b, F.lit(src), F.lit(dst))
        return F.trim(F.regexp_replace(b, r"\s+", " "))
    return F.filter(F.transform(arr, norm), lambda b: F.length(b) > 0)


def _sum_len(blocks: Column) -> Column:
    return F.aggregate(
        blocks, F.lit(0).cast("bigint"), lambda acc, b: acc + F.length(b)
    )


def html_extract_main(
    df: DataFrame,
    html_col: str = "html",
    min_block_chars: int = 30,
) -> DataFrame:
    """Adds main_text (content blocks joined with newlines), n_blocks /
    n_content_blocks, visible_chars / main_chars and boilerplate_frac
    = 1 - main/visible (the quality signal: how much of the page's
    visible text is chrome). A block is content when its normalized
    text reaches `min_block_chars` and it is outside every
    boilerplate region."""
    visible_src = _drop_regions(
        _strip_comments(F.col(html_col)), INVISIBLE_REGIONS
    )
    content_src = _drop_regions(visible_src, BOILERPLATE_REGIONS)
    all_blocks = _block_texts(visible_src)
    content_blocks = F.filter(
        _block_texts(content_src),
        lambda b: F.length(b) >= min_block_chars,
    )
    out = (
        df.withColumn("__all_b", all_blocks)
        .withColumn("__con_b", content_blocks)
        .withColumn("n_blocks", F.size("__all_b").cast("bigint"))
        .withColumn("n_content_blocks", F.size("__con_b").cast("bigint"))
        .withColumn("visible_chars", _sum_len(F.col("__all_b")))
        .withColumn("main_chars", _sum_len(F.col("__con_b")))
        .withColumn(
            "main_text",
            F.when(
                F.size("__con_b") > 0, F.array_join("__con_b", "\n")
            ),
        )
        .withColumn(
            "boilerplate_frac",
            F.when(
                F.col("visible_chars") > 0,
                F.round(
                    1 - F.col("main_chars") / F.col("visible_chars"), 6
                ),
            ),
        )
    )
    return out.drop("__all_b", "__con_b")
