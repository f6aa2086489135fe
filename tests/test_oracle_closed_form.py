"""Closed-form cases ported from the reference's unit tests, run against the
NumPy oracle (oracle.py IS the executable spec; the DataFrame scorer is then
checked against the oracle in test_scorer.py — transitively pinning the
engine to the reference).

Sources: /root/reference/internal/ranking/features_test.go (IDF 39-117,
TF stats 119-251, NormTF 253-391, BM25 393-542, TFIDF 544-630, URL 632-694)
and ranker_test.go:205-334 (TF union).
"""

from __future__ import annotations

import math

import pytest

from bm25_pagerank_rpi_spark import oracle

K1, B = oracle.K1, oracle.B
EPS = 1e-12


def test_idf_smoothing_and_negative():
    # features_test.go:50-89: df = posting-entry count; ln(N/(df+1)); can be negative
    index = {"t1": [("d1", 1), ("d2", 2)], "t2": [("d1", 3)]}
    idf = oracle.idf_map(index, 10)
    assert abs(idf["t1"] - math.log(10 / 3)) < EPS
    assert abs(idf["t2"] - math.log(10 / 2)) < EPS
    # negative: N=1, df=1 -> ln(1/2) < 0
    idf2 = oracle.idf_map({"t": [("d1", 1)]}, 1)
    assert abs(idf2["t"] - math.log(1 / 2)) < EPS
    assert idf2["t"] < 0
    assert oracle.idf_map({}, 5) == {}


def test_tf_union_duplicate_postings_sum():
    # ranker_test.go:286-310: duplicate (term, doc) postings are summed
    index = {"t1": [("d1", 2), ("d1", 3), ("d2", 1)]}
    docs = oracle.tf_union(index)
    assert docs["d1"]["t1"] == 5
    assert docs["d2"]["t1"] == 1


def test_tf_stats_missing_terms_zero():
    # features_test.go:119-251
    s, mn, mx, mean, var = oracle.tf_stats(["a", "b", "c"], {"a": 3})
    assert (s, mn, mx) == (3, 0, 3)
    assert abs(mean - 1.0) < EPS
    assert abs(var - 2.0) < EPS  # pop variance of [3,0,0]


def test_tf_stats_empty_query():
    assert oracle.tf_stats([], {"a": 3}) == (0, 0, 0, 0.0, 0.0)


def test_tf_stats_duplicate_query_terms():
    s, mn, mx, mean, var = oracle.tf_stats(["a", "a"], {"a": 2})
    assert (s, mn, mx) == (4, 2, 2)
    assert abs(mean - 2.0) < EPS and abs(var) < EPS


def test_norm_tf_zero_doclength():
    # features_test.go:253-391: docLength<=0 -> all zeros
    assert oracle.norm_tf_stats(["a"], {"a": 3}, 0) == (0.0, 0.0, 0.0, 0.0, 0.0)
    assert oracle.norm_tf_stats(["a"], {"a": 3}, -1) == (0.0, 0.0, 0.0, 0.0, 0.0)


def test_norm_tf_single_term():
    s, mn, mx, mean, var = oracle.norm_tf_stats(["a"], {"a": 3}, 10)
    assert abs(s - 0.3) < EPS and mn == mx == 0.3 and abs(var) < EPS


BM25_CASES = [
    # (terms, tf, idf, docLength, avgDocLength, want) — features_test.go:393-542
    (
        ["term1"], {"term1": 3}, {"term1": 1.2}, 100, 120.0,
        1.2 * ((3 * (K1 + 1)) / (3 + K1 * ((1 - B) + B * (100.0 / 120.0)))),
    ),
    (
        ["term1", "term2"], {"term1": 3, "term2": 2},
        {"term1": 1.2, "term2": 1.5}, 100, 120.0,
        1.2 * ((3 * (K1 + 1)) / (3 + K1 * ((1 - B) + B * (100.0 / 120.0))))
        + 1.5 * ((2 * (K1 + 1)) / (2 + K1 * ((1 - B) + B * (100.0 / 120.0)))),
    ),
    (  # term2 has no IDF -> skipped
        ["term1", "term2"], {"term1": 3, "term2": 2}, {"term1": 1.2}, 100, 120.0,
        1.2 * ((3 * (K1 + 1)) / (3 + K1 * ((1 - B) + B * (100.0 / 120.0)))),
    ),
    (  # tf present but zero -> contributes 0
        ["term1", "term2"], {"term1": 0, "term2": 2},
        {"term1": 1.2, "term2": 1.5}, 100, 120.0,
        1.5 * ((2 * (K1 + 1)) / (2 + K1 * ((1 - B) + B * (100.0 / 120.0)))),
    ),
    (  # long document
        ["term1"], {"term1": 10}, {"term1": 1.2}, 1000, 500.0,
        1.2 * ((10 * (K1 + 1)) / (10 + K1 * ((1 - B) + B * (1000.0 / 500.0)))),
    ),
    (  # duplicate query terms contribute once per occurrence
        ["term1", "term1"], {"term1": 10}, {"term1": 1.2}, 1000, 500.0,
        2 * 1.2 * ((10 * (K1 + 1)) / (10 + K1 * ((1 - B) + B * (1000.0 / 500.0)))),
    ),
    (  # term3 has idf but no tf -> skipped
        ["term1", "term3"], {"term1": 3, "term2": 2},
        {"term1": 1.2, "term3": 0.8}, 100, 120.0,
        1.2 * ((3 * (K1 + 1)) / (3 + K1 * ((1 - B) + B * (100.0 / 120.0)))),
    ),
]


@pytest.mark.parametrize("terms,tf,idf,dl,avgdl,want", BM25_CASES)
def test_bm25_closed_form(terms, tf, idf, dl, avgdl, want):
    got = oracle.bm25(terms, tf, idf, dl, avgdl)
    assert abs(got - want) <= EPS


def test_tfidf_stats_idf_covered_only():
    # features_test.go:544-630: divisor = count of idf-covered occurrences;
    # tf=0 terms WITH idf are included
    s, mn, mx, mean, var = oracle.tfidf_stats(
        ["a", "b", "c"], {"a": 2, "c": 1}, {"a": 1.0, "b": 2.0}
    )
    # covered: a -> 2*1=2, b -> 0*2=0 ; c has no idf -> excluded
    assert abs(s - 2.0) < EPS and mn == 0.0 and mx == 2.0
    assert abs(mean - 1.0) < EPS and abs(var - 1.0) < EPS


def test_tfidf_stats_no_valid_terms():
    assert oracle.tfidf_stats(["x"], {}, {}) == (0.0, 0.0, 0.0, 0.0, 0.0)


def test_url_analysis():
    # features_test.go:632-694
    assert oracle.analyze_url("http://a/b/c") == (4, 12)
    assert oracle.analyze_url("") == (0, 0)
    assert oracle.analyze_url("nohost") == (0, 6)


def test_covered_duplicates_count_twice():
    c, r = oracle.covered(["a", "a", "b"], {"a": 1})
    assert c == 2 and abs(r - 2 / 3) < EPS


def test_rank_documents_end_to_end():
    # mirrors ranker_test.go:9-203 shape: tiny corpus, distinct scores,
    # ordered doc ids + ranks
    texts = {
        "d1": "apple banana apple",
        "d2": "banana cherry",
        "d3": "apple apple apple banana",
        "d4": "unrelated words only",
    }
    index, dls, n, avg = oracle.build_index_from_texts(texts)
    out = oracle.rank_documents("apple banana", index, dls, n, avg)
    ids = [d.doc_id for d in out]
    assert set(ids) == {"d1", "d2", "d3"}  # d4 shares no terms
    assert [d.rank for d in out] == [1, 2, 3]
    scores = [d.bm25 for d in out]
    assert scores == sorted(scores, reverse=True)
    # empty index -> []
    assert oracle.rank_documents("zzz", index, dls, n, avg) == []
    # empty query -> []
    assert oracle.rank_documents("", index, dls, n, avg) == []
