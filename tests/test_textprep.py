"""Training-data prep: decontamination, packing, sentences, shuffle."""

from pyspark.sql import functions as F

from agnes_spark.operators.textprep import (
    decontaminate,
    pack_chunks,
    pack_greedy,
    shuffle_deterministic,
    split_sentences,
)
from agnes_spark.sources.memory import table


def test_decontaminate_flags_overlapping_doc(spark):
    train = table(
        spark,
        {
            "doc_id": [1, 2],
            "text": [
                "the quick brown fox jumps over the lazy dog today",
                "completely different words about nothing in particular here now",
            ],
        },
        types={"doc_id": "long", "text": "string"},
    )
    ev = table(
        spark,
        {"doc_id": [9], "text": ["xx the quick brown fox jumps over the lazy dog yy"]},
        types={"doc_id": "long", "text": "string"},
    )
    out = decontaminate(train, ev, "doc_id", "text", n=8).collect()
    assert [r.doc_id for r in out] == [1]
    # "the quick brown fox jumps over the lazy dog today" has three
    # 8-grams; the first two appear in the eval doc, the last does not
    assert out[0].n_shingles == 3 and out[0].n_shared == 2


def test_pack_chunks_offsets(spark):
    docs = table(
        spark,
        {"g": ["a"] * 3, "i": [1, 2, 3], "t": [6, 3, 5]},
        types={"g": "string", "i": "long", "t": "long"},
    )
    got = {r.i: (r.start_seq, r.start_off, r.end_seq) for r in
           pack_chunks(docs, "g", "i", "t", 8).collect()}
    # token stream: doc1 [0..5], doc2 [6..8], doc3 [9..13]; cuts at 8, 16
    assert got == {1: (0, 0, 0), 2: (0, 6, 1), 3: (1, 1, 1)}


def test_pack_greedy_no_split_and_overflow(spark):
    docs = table(
        spark,
        {"g": ["a"] * 4, "i": [1, 2, 3, 4], "t": [5, 5, 12, 2]},
        types={"g": "string", "i": "long", "t": "long"},
    )
    got = {r.i: (r.seq_id, r.overflow) for r in
           pack_greedy(docs, "g", "i", "t", 10).collect()}
    # 5 fits seq0; +5 fits seq0 exactly; 12 overflows into its own seq1;
    # 2 starts fresh seq2
    assert got == {1: (0, False), 2: (0, False), 3: (1, True), 4: (2, False)}


def test_split_sentences(spark):
    docs = table(
        spark,
        {"doc_id": [1], "text": ["One two. Three four! Five"]},
        types={"doc_id": "long", "text": "string"},
    )
    got = [(r.sent_idx, r.sentence) for r in split_sentences(docs, "doc_id", "text").collect()]
    assert got == [(1, "One two"), (2, "Three four"), (3, "Five")]


def test_shuffle_deterministic_layout_independent(spark):
    docs = table(
        spark,
        {"doc_id": list(range(100))},
        types={"doc_id": "long"},
    )
    o1 = [r.doc_id for r in shuffle_deterministic(docs, ["doc_id"], seed=3).collect()]
    o2 = [r.doc_id for r in shuffle_deterministic(docs.repartition(7), ["doc_id"], seed=3).collect()]
    assert o1 == o2
    assert sorted(o1) == list(range(100))
    assert o1 != list(range(100))  # it actually shuffles
    o3 = [r.doc_id for r in shuffle_deterministic(docs, ["doc_id"], seed=4).collect()]
    assert o1 != o3  # seed matters


def test_pii_scrub(spark):
    from agnes_spark.operators.textprep import pii_scrub

    df = spark.createDataFrame(
        [
            (1, "mail a.b-c@example.org then call 555-123-4567 from 10.0.0.7"),
            (2, "no pii here at all"),
            (3, "two mails: x@y.io and z@w.co"),
        ],
        "id long, text string",
    )
    rows = {r.id: r for r in pii_scrub(df, "id", "text").collect()}
    assert rows[1].scrubbed == "mail <EMAIL> then call <PHONE> from <IP>"
    assert (rows[1].n_email, rows[1].n_phone, rows[1].n_ip) == (1, 1, 1)
    assert rows[2].scrubbed == "no pii here at all"
    assert (rows[2].n_email, rows[2].n_phone, rows[2].n_ip) == (0, 0, 0)
    assert rows[3].scrubbed == "two mails: <EMAIL> and <EMAIL>"
    assert rows[3].n_email == 2


def test_decontaminate_fuzzy_flags_paraphrase_and_best_match(spark):
    from agnes_spark.operators.textprep import decontaminate, decontaminate_fuzzy

    eval_text = " ".join(f"w{i}" for i in range(40))
    rows = [
        # near-verbatim copy of the eval doc (one word changed)
        (1, eval_text.replace("w20", "zz")),
        # shares exactly one 8-gram run with the eval doc, rest unrelated
        (2, " ".join(f"w{i}" for i in range(8)) + " " + " ".join(f"q{i}" for i in range(40))),
        # unrelated
        (3, " ".join(f"r{i}" for i in range(40))),
    ]
    train = spark.createDataFrame(rows, "doc_id bigint, text string")
    ev = spark.createDataFrame([(100, eval_text)], "doc_id bigint, text string")
    fz = {
        r.doc_id: (r.best_eval_id, r.best_jaccard, r.n_eval_matches)
        for r in decontaminate_fuzzy(
            train, ev, "doc_id", "doc_id", "text", n=8, threshold=0.3
        ).collect()
    }
    # the paraphrased copy is flagged with the right eval doc...
    assert set(fz) == {1}
    assert fz[1][0] == 100 and fz[1][1] >= 0.3 and fz[1][2] == 1
    # ...while exact single-8-gram decontamination flags doc 2 as well
    ex = {
        r.doc_id
        for r in decontaminate(train, ev, "doc_id", "text", n=8).collect()
    }
    assert {1, 2} <= ex
    # sound containment: fuzzy hits are a subset of exact hits
    assert set(fz) <= ex


def test_decontaminate_fuzzy_banded_under_reports_only(spark):
    from agnes_spark.operators.textprep import (
        decontaminate_fuzzy,
        decontaminate_fuzzy_banded,
    )

    eval_text = " ".join(f"w{i}" for i in range(60))
    rows = [
        (1, eval_text.replace("w30", "zz")),              # near-verbatim
        (2, " ".join(f"r{i}" for i in range(60))),         # unrelated
        (3, eval_text.replace("w10", "aa").replace("w40", "bb")),
    ]
    train = spark.createDataFrame(rows, "doc_id bigint, text string")
    ev = spark.createDataFrame([(100, eval_text)], "doc_id bigint, text string")
    kw = dict(n=8, threshold=0.3)
    full = {
        r.doc_id: (r.n_eval_matches, r.best_jaccard)
        for r in decontaminate_fuzzy(
            train, ev, "doc_id", "doc_id", "text", **kw
        ).collect()
    }
    banded = {
        r.doc_id: (r.n_eval_matches, r.best_jaccard)
        for r in decontaminate_fuzzy_banded(
            train, ev, "doc_id", "doc_id", "text", **kw
        ).collect()
    }
    assert set(full) == {1, 3}
    # banded can only under-report: subset of docs, dominated stats
    assert set(banded) <= set(full)
    for d, (nm, bj) in banded.items():
        assert nm <= full[d][0] and bj <= full[d][1] + 1e-9
    # on this corpus the band probe should actually find both
    assert set(banded) == {1, 3}


def test_decontaminate_fuzzy_string_eval_ids(spark):
    """r11 advice: the best-match tiebreak used to cast the eval id to
    bigint (CAST_INVALID_INPUT under ANSI for ids like 'ev_a'); it
    must work with any orderable id type, ties to the LEXICOGRAPHIC
    smallest for strings."""
    from agnes_spark.operators.textprep import (
        decontaminate_fuzzy,
        decontaminate_fuzzy_banded,
    )

    eval_text = " ".join(f"w{i}" for i in range(40))
    train = spark.createDataFrame(
        [(1, eval_text.replace("w20", "zz"))], "doc_id bigint, text string"
    )
    # two IDENTICAL eval docs under string ids: same jaccard, so the
    # tiebreak must deterministically pick 'ev_a' (< 'ev_b')
    ev = spark.createDataFrame(
        [("ev_b", eval_text), ("ev_a", eval_text)],
        "eid string, text string",
    )
    for fn in (decontaminate_fuzzy, decontaminate_fuzzy_banded):
        rows = fn(train, ev, "doc_id", "eid", "text", n=8, threshold=0.3).collect()
        assert len(rows) == 1, fn.__name__
        r = rows[0]
        assert r.doc_id == 1 and r.n_eval_matches == 2
        assert r.best_eval_id == "ev_a", fn.__name__
        assert r.best_jaccard >= 0.3
