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
