"""Character-trigram language ID: real multilingual discrimination
(incl. the it/pt/nl long tail the stopword profiles miss), edge cases,
and determinism of the profile builder."""

from agnes_spark.operators.textanalysis import (
    TRIGRAM_CORPORA,
    lang_id_trigram,
    trigram_profile,
)

SENTENCES = {
    "en": "the cat sat on the mat and looked out of the window at the rain",
    "de": "der hund lief durch den wald und wir haben nicht mit dem wetter gerechnet",
    "fr": "le chien est dans le jardin et nous avons pour une fois le temps de lire",
    "es": "el perro está en el jardín y no tenemos más tiempo para leer el libro",
    "it": "il cane è nel giardino e non abbiamo più tempo per leggere questo libro",
    "pt": "o cão está no jardim e não temos mais tempo para ler o livro hoje",
    "nl": "de hond loopt door het bos en wij hebben niet veel tijd om het boek te lezen",
}


def test_trigram_profile_deterministic_and_ranked():
    p1 = trigram_profile(TRIGRAM_CORPORA["en"], 100)
    p2 = trigram_profile(TRIGRAM_CORPORA["en"], 100)
    assert p1 == p2
    assert len(p1) == 100
    assert [r for _, r in p1] == list(range(1, 101))
    tgs = [tg for tg, _ in p1]
    assert len(set(tgs)) == 100 and all(len(t) == 3 for t in tgs)
    # ' th'/'the'/'he ' are top-of-profile English trigrams
    assert {" th", "the", "he "} <= set(tgs[:10])


def test_lang_id_trigram_discriminates_seven_languages(spark):
    rows = [(i, s) for i, s in enumerate(SENTENCES.values())]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r.doc_id: (r.pred_lang_tg, r.best_distance, r.n_top)
        for r in lang_id_trigram(df, "doc_id", "text").collect()
    }
    langs = list(SENTENCES)
    for i, lang in enumerate(langs):
        assert got[i][0] == lang, (lang, got[i])
        assert got[i][1] is not None and got[i][1] > 0
        assert 0 < got[i][2] <= 60


def test_lang_id_trigram_edge_cases(spark):
    rows = [
        (1, ""),          # empty -> no trigrams -> 'und'
        (2, "ab"),        # too short after padding? ' ab ' has trigrams
        (3, None),        # null text -> 'und'
        (4, "12345 67"),  # digits strip to nothing -> 'und'
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r for r in lang_id_trigram(df, "doc_id", "text").collect()}
    assert got[1].pred_lang_tg == "und" and got[1].n_top == 0
    assert got[1].best_distance is None
    # ' ab ' yields trigrams; prediction is SOME deterministic language
    assert got[2].n_top > 0
    assert got[3].pred_lang_tg == "und"
    assert got[4].pred_lang_tg == "und" and got[4].n_top == 0
    # row count preserved: one row per input doc
    assert len(got) == 4


def test_lang_id_trigram_beats_stopword_profile_on_long_tail(spark):
    """it/pt/nl are NOT in the stopword profile set — lang_id maps
    them onto one of its 4 languages; the trigram path names them."""
    rows = [(i, SENTENCES[l]) for i, l in enumerate(("it", "pt", "nl"))]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r.pred_lang_tg for r in lang_id_trigram(df, "doc_id", "text").collect()}
    assert got == {0: "it", 1: "pt", 2: "nl"}
