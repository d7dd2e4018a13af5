"""BPE merge training (operators/bpe.py) against the classic
Sennrich et al. worked example vocabulary."""

from agnes_spark.operators.bpe import bpe_train


def test_bpe_sennrich_example(spark):
    # vocab: low:5, lower:2, newest:6, widest:3
    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    df = spark.createDataFrame([(" ".join(words),)], "text string")
    got = [
        (r.round, r.left, r.right, r.pair_count)
        for r in bpe_train(df, "text", merges=5).orderBy("round").collect()
    ]
    # hand-derived with the (count desc, left, right) tie rule:
    # r1: (e,s)=9 ties (s,t)=9 -> lexicographic left wins
    # r3: (l,o)=7 ties (o,w)=7 -> l < o
    # r5: (e,w)=6 ties (n,e),(w,est) -> e smallest
    assert got == [
        (1, "e", "s", 9),
        (2, "es", "t", 9),
        (3, "l", "o", 7),
        (4, "lo", "w", 7),
        (5, "e", "w", 6),
    ]


def test_bpe_greedy_left_scan_on_repeats(spark):
    # 'aaaa' -> pairs (a,a)x3; after merging (a,a) the greedy left
    # scan leaves 'aa aa' (not 'a aa a'), so round 2 merges (aa,aa)
    df = spark.createDataFrame([("aaaa aaaa aaaa",)], "text string")
    got = [
        (r.round, r.left, r.right)
        for r in bpe_train(df, "text", merges=2).orderBy("round").collect()
    ]
    assert got == [(1, "a", "a"), (2, "aa", "aa")]


def test_bpe_ignores_non_alpha_tokens(spark):
    df = spark.createDataFrame(
        [("ab ab 123 ab7 AB! ab",)], "text string"
    )
    got = bpe_train(df, "text", merges=1).collect()
    # only the pure-alpha lowercase 'ab' tokens count (AB! and ab7
    # are filtered, so the pair count is 3)
    assert (got[0].left, got[0].right, got[0].pair_count) == ("a", "b", 3)


def test_bpe_stops_early_when_no_pairs_remain(spark):
    # single-letter words have no adjacent pairs: zero merge rows,
    # not a crash (min() over an empty pair frame is NULL)
    df = spark.createDataFrame([("a b c a",)], "text string")
    assert bpe_train(df, "text", merges=3).count() == 0


def test_bpe_early_stop_after_exhausting_vocab(spark):
    # 'ab' supports exactly one merge; asking for 3 returns 1 row
    df = spark.createDataFrame([("ab ab",)], "text string")
    got = bpe_train(df, "text", merges=3).collect()
    assert [(r.round, r.left, r.right) for r in got] == [(1, "a", "b")]


def test_bpe_encode_counts_applies_merges(spark):
    from agnes_spark.operators.bpe import bpe_encode_counts

    # merges (a,b)->ab then (ab,c)->abc: 'abc' encodes to 1 token,
    # 'abd' to 2 (ab + d), 'xyz' untouched to 3
    df = spark.createDataFrame([("abc abd xyz",)], "text string")
    got = {
        r.w: r.n_tokens
        for r in bpe_encode_counts(df, "text", [("a", "b"), ("ab", "c")]).collect()
    }
    assert got == {"abc": 1, "abd": 2, "xyz": 3}


def test_bpe_encode_counts_no_merges_is_char_count(spark):
    from agnes_spark.operators.bpe import bpe_encode_counts

    df = spark.createDataFrame([("hello a",)], "text string")
    got = {r.w: r.n_tokens for r in bpe_encode_counts(df, "text", []).collect()}
    assert got == {"hello": 5, "a": 1}


def test_bpe_oracle_agrees_with_spark_on_exhausted_corpus(spark):
    """r8 advice: the DuckDB oracle replays a FIXED 5 rounds while
    bpe_train early-stops when pairs run out — on an exhausting corpus
    the unguarded oracle NULL-cascaded. The CASE/WHERE guards must make
    empty rounds a no-op so both sides emit the same merge table."""
    import duckdb

    import __spark_entry__ as entry

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "('ab', 'en'), ('ab', 'en')) t(text, lang)"
    )
    oracle = [
        tuple(r) for r in con.execute(entry._bpe_oracle_sql()).fetchall()
    ]
    df = spark.createDataFrame([("ab",), ("ab",)], "text string")
    got = [
        (r["round"], r["left"], r["right"], r["pair_count"])
        for r in bpe_train(df, "text", merges=5).orderBy("round").collect()
    ]
    assert got == [(1, "a", "b", 2)]
    assert oracle == [(1, "a", "b", 2)]
