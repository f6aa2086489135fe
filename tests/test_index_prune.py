"""Static impact-ordered pruning (plans/index_prune.py): keep_df >= max df
is a no-op (exact parity with the full index); aggressive pruning keeps
exactly the top-m postings per term by encoded factor and scores
survivors with FROZEN full-corpus idf."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from bm25_pagerank_rpi_spark import B, K1
from bm25_pagerank_rpi_spark.operators import wand
from bm25_pagerank_rpi_spark.plans.index_build import build_index
from bm25_pagerank_rpi_spark.plans.index_prune import prune_index

ROWS = [
    ("c0", 0, "spark hash join table"),
    ("c0", 1, "merge sort join window"),
    ("c1", 0, "hash hash table scan"),
    ("c1", 1, "table table table spark scan extra"),
    ("c2", 0, "window filter key value merge"),
    ("c2", 1, "spark table key value"),
    ("c3", 0, "join join join hash"),
    ("c3", 1, "scan filter window sort"),
]


def _transcripts(spark):
    return spark.createDataFrame(
        [
            (c, t, "user", text, "none", datetime.datetime(2025, 1, 1))
            for (c, t, text) in ROWS
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )


def _queries(spark):
    return spark.createDataFrame(
        [("q1", "hash table spark")], "query_id string, text string"
    )


def _topk(cat, spark, k=10):
    return {
        r.doc_id: round(r.bm25, 9)
        for r in wand.wand_topk(cat, _queries(spark), k=k).collect()
    }


def _expected_pruned(cat, keep_df, qterms):
    """Brute-force pruned scoring from the catalog's own relations."""
    _, avgdl = cat.scalar_stats()
    posts = cat.postings().collect()
    idf = {r.term: r.idf for r in cat.terms().collect()}
    by_term: dict[str, list] = {}
    for r in posts:
        f = (r.tf * (K1 + 1.0)) / (
            r.tf + K1 * ((1.0 - B) + B * (r.doc_length / avgdl))
        )
        by_term.setdefault(r.term, []).append((-f, r.doc_int, f))
    scores: dict[int, float] = {}
    for term, lst in by_term.items():
        if term not in qterms:
            continue
        for negf, doc_int, f in sorted(lst)[:keep_df]:
            scores[doc_int] = scores.get(doc_int, 0.0) + idf[term] * f
    ints = {r.doc_int: r.doc_id for r in cat.doc_meta().collect()}
    return {ints[d]: round(s, 9) for d, s in scores.items()}


def test_prune_noop_parity(spark, tmp_path):
    full = build_index(
        spark, _transcripts(spark), str(tmp_path / "full"), n_buckets=4
    )
    pruned = prune_index(spark, full, str(tmp_path / "p100"), keep_df=100)
    assert _topk(pruned, spark) == _topk(full, spark)
    # frozen stats: df/idf identical to the source terms table
    f_terms = {r.term: (r.df, r.idf) for r in full.terms().collect()}
    p_terms = {r.term: (r.df, r.idf) for r in pruned.terms().collect()}
    assert p_terms == f_terms


def test_prune_keeps_top_m_by_impact(spark, tmp_path):
    full = build_index(
        spark, _transcripts(spark), str(tmp_path / "full"), n_buckets=4
    )
    pruned = prune_index(spark, full, str(tmp_path / "p2"), keep_df=2)

    per_term = (
        pruned.postings().groupBy("term").count().collect()
    )
    assert max(r["count"] for r in per_term) <= 2

    exp = _expected_pruned(full, 2, {"hash", "table", "spark"})
    got = {
        r.doc_id: round(r.bm25, 9)
        for r in wand.wand_topk(pruned, _queries(spark), k=20).collect()
    }
    assert got == exp

    # resume short-circuit on identical (source, keep_df)
    again = prune_index(spark, full, str(tmp_path / "p2"), keep_df=2)
    assert again.read_manifest()["pruned_from"] == [full.root, 2]


def test_prune_rejects_bad_keep_df(spark, tmp_path):
    full = build_index(
        spark, _transcripts(spark), str(tmp_path / "f2"), n_buckets=4
    )
    with pytest.raises(ValueError, match="keep_df"):
        prune_index(spark, full, str(tmp_path / "bad"), keep_df=0)
