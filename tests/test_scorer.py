"""Rank-identical verification: the DataFrame scorer vs the NumPy oracle
on a deterministic synthetic corpus (SURVEY.md §5 item 2).

Checks docIDs, ranks, BM25 scores (<=1e-12 like the reference epsilon,
types.go:15) AND the full index-derived feature block (<=1e-9, matching the
reference's batch-feature tolerance, features_test.go:799-936).
"""

from __future__ import annotations

import pytest

from bm25_pagerank_rpi_spark import oracle
from bm25_pagerank_rpi_spark.operators import scorer

QUERIES = {
    "q_single": "hello,",
    "q_multi": None,  # filled from corpus vocab at runtime
    "q_dup": None,
    "q_absent": "zzzz_not_in_corpus",
    "q_mixed": None,
    "q_empty": "",
    "q_ws": "   ",
}

FEATURE_COLS = [
    "covered_query_term_number",
    "covered_query_term_ratio",
    "sum_tf",
    "min_tf",
    "max_tf",
    "mean_tf",
    "var_tf",
    "stream_length",
    "sum_ntf",
    "min_ntf",
    "max_ntf",
    "mean_ntf",
    "var_ntf",
    "sum_tfidf",
    "min_tfidf",
    "max_tfidf",
    "mean_tfidf",
    "var_tfidf",
]

ORACLE_KEYS = [
    "covered_query_term_number",
    "covered_query_term_ratio",
    "sum_tf",
    "min_tf",
    "max_tf",
    "mean_tf",
    "var_tf",
    "stream_length",
    "sum_ntf",
    "min_ntf",
    "max_ntf",
    "mean_ntf",
    "var_ntf",
    "sum_tfidf",
    "min_tfidf",
    "max_tfidf",
    "mean_tfidf",
    "var_tfidf",
]


def _queries_for(corpus: dict[str, str]) -> dict[str, str]:
    # pick real vocabulary from the corpus so joins actually hit
    toks = sorted({t for text in corpus.values() for t in text.split()})
    q = dict(QUERIES)
    q["q_multi"] = f"{toks[0]} {toks[3]} {toks[7]}"
    q["q_dup"] = f"{toks[1]} {toks[1]} {toks[4]}"
    q["q_mixed"] = f"{toks[2]} zzzz_not_in_corpus {toks[5]}"
    return q


@pytest.fixture(scope="module")
def ranked(spark, corpus):
    queries = _queries_for(corpus)
    docs_df = spark.createDataFrame(list(corpus.items()), "doc_id string, text string")
    q_df = spark.createDataFrame(list(queries.items()), "query_id string, text string")
    got = scorer.rank_documents(docs_df, q_df, k=1000).collect()
    return queries, got


def _oracle_rank(corpus, qtext, k=1000):
    index, dls, n, avg = oracle.build_index_from_texts(corpus)
    docs = oracle.rank_documents(qtext, index, dls, n, avg, k=k)
    # attach full oracle feature block
    idx = {t: index[t] for t in set(oracle.tokenize(qtext)) if t in index}
    return docs


def test_rank_identical(ranked, corpus):
    queries, got = ranked
    by_q: dict[str, list] = {}
    for row in got:
        by_q.setdefault(row.query_id, []).append(row)
    for qid, qtext in queries.items():
        expected = _oracle_rank(corpus, qtext)
        rows = sorted(by_q.get(qid, []), key=lambda r: r.rank)
        assert len(rows) == len(expected), f"{qid}: candidate count mismatch"
        for row, exp in zip(rows, expected):
            assert row.doc_id == exp.doc_id, f"{qid} rank {exp.rank}: doc mismatch"
            assert row.rank == exp.rank
            assert abs(row.bm25 - exp.bm25) <= 1e-12, f"{qid}/{row.doc_id}: bm25"


def test_features_match_oracle(ranked, corpus):
    queries, got = ranked
    index, dls, n, avg = oracle.build_index_from_texts(corpus)
    for row in got:
        qtext = queries[row.query_id]
        terms = oracle.tokenize(qtext)
        qindex = {t: index[t] for t in set(terms) if t in index}
        tf = oracle.tf_union(qindex).get(row.doc_id, {})
        idf = oracle.idf_map(qindex, n)
        dl = dls[row.doc_id]
        exp = {}
        exp["covered_query_term_number"], exp["covered_query_term_ratio"] = oracle.covered(terms, tf)
        (exp["sum_tf"], exp["min_tf"], exp["max_tf"], exp["mean_tf"], exp["var_tf"]) = oracle.tf_stats(terms, tf)
        exp["stream_length"] = dl
        (exp["sum_ntf"], exp["min_ntf"], exp["max_ntf"], exp["mean_ntf"], exp["var_ntf"]) = oracle.norm_tf_stats(terms, tf, dl)
        (exp["sum_tfidf"], exp["min_tfidf"], exp["max_tfidf"], exp["mean_tfidf"], exp["var_tfidf"]) = oracle.tfidf_stats(terms, tf, idf)
        for col in FEATURE_COLS:
            got_v = getattr(row, col)
            assert abs(float(got_v) - float(exp[col])) <= 1e-9, (
                f"{row.query_id}/{row.doc_id}/{col}: got {got_v} want {exp[col]}"
            )


def test_topk_truncation(spark, corpus):
    docs_df = spark.createDataFrame(list(corpus.items()), "doc_id string, text string")
    toks = sorted({t for text in corpus.values() for t in text.split()})
    q_df = spark.createDataFrame([("q", toks[0])], "query_id string, text string")
    out = scorer.rank_documents(docs_df, q_df, k=2).collect()
    assert len(out) <= 2
    assert [r.rank for r in sorted(out, key=lambda r: r.rank)] == list(range(1, len(out) + 1))


# ---------------------------------------------------------------------------
# explain_scores
# ---------------------------------------------------------------------------


def test_explain_contributions_sum_to_bm25(spark):
    docs = spark.createDataFrame(
        [
            (1, "hash join hash table scan"),
            (2, "hash merge sort"),
            (3, "window frame row"),
        ],
        "doc_id long, text string",
    )
    # duplicate term ("hash" twice) + absent term ("zzz")
    q = spark.createDataFrame(
        [("q1", "hash hash join zzz")], "query_id string, text string"
    )
    dlen = scorer.doc_lengths(docs)
    dtf = scorer.doc_term_frequencies(docs)
    stats = scorer.corpus_stats(dlen)
    exp = scorer.explain_scores(dtf, dlen, stats, q, k=10).collect()
    ranked = {
        r.doc_id: r.bm25
        for r in scorer.topk(
            scorer.score_candidates(dtf, dlen, stats, q), k=10
        ).collect()
    }
    by_doc = {}
    for r in exp:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(ranked)  # every top-k doc explained
    for doc_id, rows in by_doc.items():
        # one row per QUERY OCCURRENCE (4 tokens, dup kept)
        assert len(rows) == 4
        assert sum(r.contribution for r in rows) == pytest.approx(
            ranked[doc_id], abs=1e-12
        )
        # the duplicate term contributes identically at both positions
        hash_rows = [r for r in rows if r.term == "hash"]
        assert len(hash_rows) == 2
        assert hash_rows[0].contribution == hash_rows[1].contribution
        # the absent term: idf NULL, contribution 0
        zzz = [r for r in rows if r.term == "zzz"][0]
        assert zzz.idf is None and zzz.contribution == 0.0 and zzz.tf == 0
