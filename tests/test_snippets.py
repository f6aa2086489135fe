"""Snippet extraction (operators/snippets.py): window choice, tie-break,
distinct-term counting, highlight rendering, top-k composition."""

from __future__ import annotations

from bm25_pagerank_rpi_spark.operators.snippets import (
    best_snippet,
    snippets_for_topk,
)


def _run(spark, corpus, terms, window):
    df = spark.createDataFrame(
        list(corpus.items()), "doc_id string, text string"
    )
    return {
        r.doc_id: (r.start, r.n_matched, r.snippet)
        for r in best_snippet(df, terms, window=window).collect()
    }


def test_picks_densest_window(spark):
    got = _run(
        spark,
        {"d1": "a b c q1 d q2 e f g h i"},
        ["q1", "q2"],
        3,
    )
    assert got == {"d1": (3, 2, "[q1] d [q2]")}


def test_tie_breaks_to_smallest_start(spark):
    # q at offsets 1 and 5: both windows score 1 -> leftmost wins
    got = _run(spark, {"d1": "a q b c d q e"}, ["q"], 2)
    assert got["d1"][0] == 0  # window [a q]
    assert got["d1"][2] == "a [q]"


def test_counts_distinct_terms_not_occurrences(spark):
    # window with q1 twice (n=1) must lose to window with q1 and q2 (n=2)
    got = _run(spark, {"d1": "q1 q1 x x q1 q2"}, ["q1", "q2"], 2)
    assert got["d1"] == (4, 2, "[q1] [q2]")


def test_no_match_excluded_and_short_doc(spark):
    got = _run(spark, {"d1": "x y", "d2": "q"}, ["q"], 10)
    assert "d1" not in got
    assert got["d2"] == (0, 1, "[q]")


def test_duplicate_query_terms_collapse(spark):
    a = _run(spark, {"d": "a q b"}, ["q", "q"], 3)
    b = _run(spark, {"d": "a q b"}, ["q"], 3)
    assert a == b


def test_snippets_for_topk_left_join_keeps_ranks(spark):
    docs = spark.createDataFrame(
        [("1", "x q y"), ("2", "a b c"), ("3", "q q q")],
        "doc_id string, text string",
    )
    topk = spark.createDataFrame(
        [("1", 1), ("3", 2)], "doc_id string, rank int"
    )
    out = snippets_for_topk(topk, docs, ["q"], window=2)
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {"1", "3"}
    assert rows["1"].rank == 1 and rows["1"].n_matched == 1
    assert rows["3"].snippet == "[q] [q]"
