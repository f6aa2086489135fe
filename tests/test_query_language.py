"""Query-language parsing and composed execution semantics
(operators/query_language.py)."""

from __future__ import annotations

import pytest

from bm25_pagerank_rpi_spark.operators import scorer
from bm25_pagerank_rpi_spark.operators.query_language import parse_query, search


def test_parse_query_shapes():
    pq = parse_query('key value "table hash" spark -scan lang:en table')
    assert pq.terms == ["key", "value", "table", "hash", "spark", "table"]
    assert pq.phrases == [["table", "hash"]]
    assert pq.excludes == ["scan"]
    assert pq.fields == [("lang", "en")]

    # degenerate tokens stay bare terms, never errors
    pq = parse_query("- a: :b plain")
    assert pq.terms == ["-", "a:", ":b", "plain"]
    assert not pq.excludes and not pq.fields

    # negated phrase, multiple fields, empty quotes
    pq = parse_query('-"bad seq" role:user tool:code ""')
    assert pq.phrases == [["-", "bad", "seq"]]
    assert pq.fields == [("role", "user"), ("tool", "code")]
    assert pq.terms == []


DOCS = [
    ("d1", "alpha beta gamma", "en", "user"),
    ("d2", "beta alpha gamma", "en", "user"),       # phrase "alpha beta" absent
    ("d3", "alpha beta filler gamma", "en", "tool"),
    ("d4", "alpha beta gamma", "fr", "user"),       # filtered out by lang
    ("d5", "alpha beta gamma noise", "en", "user"), # excluded by -noise
]


def _docs(spark):
    return spark.createDataFrame(
        DOCS, "doc_id string, text string, lang string, role string"
    )


def test_search_gates_and_filters(spark):
    docs = _docs(spark)
    got = {r.doc_id: r for r in search(docs, 'alpha "alpha beta" -noise lang:en').collect()}
    # d2: no phrase; d4: wrong lang; d5: excluded; d3: has phrase, kept
    assert set(got) == {"d1", "d3"}

    # gates do NOT change scores: same scoring terms (the phrase's terms
    # score as bare occurrences) without the gates give identical bm25
    ungated = {
        r.doc_id: r.bm25
        for r in search(docs, "alpha alpha beta lang:en").collect()
    }
    gated = {
        r.doc_id: r.bm25
        for r in search(docs, 'alpha "alpha beta" -noise lang:en').collect()
    }
    for d, s in gated.items():
        assert s == pytest.approx(ungated[d], abs=1e-12)

    # field filter changes the corpus: N shrinks, so idf shifts
    en_only = {r.doc_id: r.bm25 for r in search(docs, "alpha lang:en").collect()}
    all_docs = {r.doc_id: r.bm25 for r in search(docs, "alpha").collect()}
    assert en_only["d1"] != all_docs["d1"]

    # negated phrase excludes the docs containing it
    neg = {r.doc_id for r in search(docs, 'gamma -"alpha beta"').collect()}
    assert neg == {"d2"}


def test_search_unknown_field_raises(spark):
    with pytest.raises(ValueError, match="unknown field"):
        search(_docs(spark), "alpha nosuch:field")


def test_search_no_terms_empty(spark):
    assert search(_docs(spark), "lang:en -noise").count() == 0
    assert search(_docs(spark), "").count() == 0


def test_search_matches_plain_bm25_when_no_operators(spark):
    docs = _docs(spark).select("doc_id", "text")
    plain = search(docs, "alpha gamma gamma")
    q = spark.createDataFrame(
        [("q", "alpha gamma gamma")], "query_id string, text string"
    )
    want = {
        (r.doc_id, r.rank): r.bm25
        for r in scorer.rank_documents(docs, q, k=20).collect()
    }
    got = {(r.doc_id, r.rank): r.bm25 for r in plain.collect()}
    assert got.keys() == want.keys()
    for key, v in want.items():
        assert got[key] == pytest.approx(v, abs=1e-6)  # search() rounds to 6dp


def test_parse_boosts_and_ranges():
    pq = parse_query("key^2 value hash^0.5 n_chars:[200 TO 5000] ts:[* TO 2024-02-01]")
    assert pq.terms == ["key", "value", "hash"]
    assert pq.weights == [2.0, 1.0, 0.5]
    assert pq.ranges == [
        ("n_chars", "200", "5000"),
        ("ts", None, "2024-02-01"),
    ]
    # malformed range degrades to a bare term; bare ^ degrades too
    pq = parse_query("a:[1 2] b^x")
    assert pq.terms == ["a:[1 2]", "b^x"]
    assert pq.weights == [1.0, 1.0]


def test_search_boost_weighting(spark):
    docs = _docs(spark)
    # boost == scoring each weight group separately and summing w * bm25
    plain = {
        r.doc_id: r.bm25 for r in search(docs, "alpha", k=10).collect()
    }
    gamma = {
        r.doc_id: r.bm25 for r in search(docs, "gamma", k=10).collect()
    }
    boosted = {
        r.doc_id: r.bm25 for r in search(docs, "alpha^3 gamma", k=10).collect()
    }
    for d, s in boosted.items():
        expect = 3.0 * plain.get(d, 0.0) + gamma.get(d, 0.0)
        assert s == pytest.approx(expect, abs=5e-6)  # 6-dp rounding per leg


def test_search_integer_boost_equals_repetition(spark):
    docs = _docs(spark)
    # occurrence-multiplicity semantics: alpha^2 == typing alpha twice
    b = {r.doc_id: r.bm25 for r in search(docs, "alpha^2 beta", k=10).collect()}
    rep = {r.doc_id: r.bm25 for r in search(docs, "alpha alpha beta", k=10).collect()}
    assert b.keys() == rep.keys()
    for d in b:
        assert b[d] == pytest.approx(rep[d], abs=1e-9)


def test_search_range_filters_corpus(spark):
    rows = [
        ("d1", "alpha beta", 10),
        ("d2", "alpha beta", 20),
        ("d3", "alpha beta", 30),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string, n int")
    got = {r.doc_id for r in search(docs, "alpha n:[15 TO 25]", k=10).collect()}
    assert got == {"d2"}
    # numeric, not lexicographic: [5 TO 25] must include 10 and 20
    got = {r.doc_id for r in search(docs, "alpha n:[5 TO 25]", k=10).collect()}
    assert got == {"d1", "d2"}
    # open ends
    got = {r.doc_id for r in search(docs, "alpha n:[* TO 15]", k=10).collect()}
    assert got == {"d1"}
    got = {r.doc_id for r in search(docs, "alpha n:[25 TO *]", k=10).collect()}
    assert got == {"d3"}
    # range filter changes the CORPUS: stats describe the filtered set
    full = {r.doc_id: r.bm25 for r in search(docs, "alpha", k=10).collect()}
    filt = {r.doc_id: r.bm25 for r in search(docs, "alpha n:[5 TO 25]", k=10).collect()}
    assert filt["d1"] != full["d1"]  # N and df changed -> idf changed


def test_search_range_unknown_field_raises(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="unknown field"):
        search(docs, "alpha nope:[1 TO 2]").collect()


def test_parse_negated_range():
    pq = parse_query("alpha -n_chars:[300 TO 900] -beta")
    assert pq.terms == ["alpha"]
    assert pq.neg_ranges == [("n_chars", "300", "900")]
    assert pq.excludes == ["beta"]
    # open ends compose with negation
    pq = parse_query("alpha -ts:[* TO 2024-02-01]")
    assert pq.neg_ranges == [("ts", None, "2024-02-01")]
    # malformed negated range degrades to a bare token, like typos
    pq = parse_query("alpha -a:[1 2]")
    assert pq.neg_ranges == []
    assert pq.terms == ["alpha", "-a:[1 2]"]


def test_search_negated_range_filters_corpus(spark):
    rows = [
        ("d1", "alpha beta", 10),
        ("d2", "alpha beta", 20),
        ("d3", "alpha beta", 30),
        ("d4", "alpha beta", None),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string, n int")
    got = {r.doc_id for r in search(docs, "alpha -n:[15 TO 25]", k=10).collect()}
    assert got == {"d1", "d3", "d4"}  # NULL never matches a range -> kept
    got = {r.doc_id for r in search(docs, "alpha -n:[* TO 15]", k=10).collect()}
    assert got == {"d2", "d3", "d4"}
    got = {r.doc_id for r in search(docs, "alpha -n:[25 TO *]", k=10).collect()}
    assert got == {"d1", "d2", "d4"}
    # negated range changes the CORPUS: stats describe the surviving set
    full = {r.doc_id: r.bm25 for r in search(docs, "alpha", k=10).collect()}
    filt = {
        r.doc_id: r.bm25
        for r in search(docs, "alpha -n:[15 TO 25]", k=10).collect()
    }
    assert filt["d1"] != full["d1"]
