"""IR evaluation metrics, MMR diversification, PMI collocations, and
exact quantiles — semantics pinned against hand-computed / pure-Python
oracles on tiny fixtures."""

from __future__ import annotations

import itertools
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from bm25_pagerank_rpi_spark.operators import evaluation, similarity, textstats


def _log2(x: float) -> float:
    return math.log(x) / math.log(2)


def test_eval_metrics_hand_computed(spark):
    # run q1: ranks 1..5 over docs 10..14; qrels: 11 -> rel 2, 13 -> rel 1,
    # 99 -> rel 3 (never retrieved)
    run = spark.createDataFrame(
        [("q1", 10 + i, i + 1) for i in range(5)],
        "query_id string, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [("q1", 11, 2), ("q1", 13, 1), ("q1", 99, 3), ("q1", 10, 0)],
        "query_id string, doc_id long, rel int",
    )
    got = evaluation.eval_metrics(run, qrels, k=5).collect()[0]

    dcg = (2**2 - 1) / _log2(3) + (2**1 - 1) / _log2(5)
    # ideal ordering: rel 3, 2, 1
    idcg = (2**3 - 1) / _log2(2) + (2**2 - 1) / _log2(3) + (2**1 - 1) / _log2(4)
    assert got.ndcg == pytest.approx(dcg / idcg, abs=1e-12)
    assert got.mrr == pytest.approx(1 / 2, abs=1e-12)
    assert got.precision_at_k == pytest.approx(2 / 5, abs=1e-12)
    assert got.recall_at_k == pytest.approx(2 / 3, abs=1e-12)
    # AP@5: hits at rank 2 (prec 1/2) and rank 4 (prec 2/4); R=3 -> /3
    assert got.ap == pytest.approx((1 / 2 + 2 / 4) / 3, abs=1e-12)


def test_eval_metrics_no_relevant(spark):
    run = spark.createDataFrame(
        [("q1", 1, 1), ("q1", 2, 2)], "query_id string, doc_id long, rank int"
    )
    qrels = spark.createDataFrame(
        [("q1", 1, 0)], "query_id string, doc_id long, rel int"
    )
    got = evaluation.eval_metrics(run, qrels, k=2).collect()[0]
    assert (got.ndcg, got.mrr, got.precision_at_k, got.recall_at_k, got.ap) == (
        0.0,
        0.0,
        0.0,
        0.0,
        0.0,
    )


def test_eval_metrics_unjudged_query_scores_zero(spark):
    run = spark.createDataFrame(
        [("q1", 1, 1), ("q2", 1, 1)], "query_id string, doc_id long, rank int"
    )
    qrels = spark.createDataFrame(
        [("q1", 1, 1)], "query_id string, doc_id long, rel int"
    )
    got = {r.query_id: r for r in evaluation.eval_metrics(run, qrels, k=1).collect()}
    assert got["q1"].ndcg == pytest.approx(1.0)
    assert got["q2"].ndcg == 0.0 and got["q2"].recall_at_k == 0.0


def test_eval_metrics_perfect_run(spark):
    qrels = spark.createDataFrame(
        [("q1", i, 3 - i) for i in range(3)],
        "query_id string, doc_id long, rel int",
    )
    run = spark.createDataFrame(
        [("q1", i, i + 1) for i in range(3)],
        "query_id string, doc_id long, rank int",
    )
    got = evaluation.eval_metrics(run, qrels, k=3).collect()[0]
    assert got.ndcg == pytest.approx(1.0, abs=1e-12)
    assert got.ap == pytest.approx(1.0, abs=1e-12)
    assert got.mrr == 1.0


def _greedy_mmr_oracle(rel, sims, lam, k):
    """Brute-force greedy MMR over index space; ties -> smallest index."""
    n = len(rel)
    chosen, scores = [], []
    for step in range(min(k, n)):
        best, best_score = None, None
        for i in range(n):
            if i in chosen:
                continue
            if not chosen:
                s = rel[i]
            else:
                s = round(lam * rel[i] - (1 - lam) * max(sims[i][j] for j in chosen), 6)
            if best is None or s > best_score:
                best, best_score = i, s
        chosen.append(best)
        scores.append(best_score)
    return chosen, scores


def test_mmr_matches_pure_python_greedy(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(12, 8)
    rel = [round(float(x), 6) for x in rng.rand(12)]
    cands = spark.createDataFrame(
        [("q1", i, rel[i]) for i in range(12)],
        "query_id string, doc_id long, rel double",
    )
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(12)],
        "vec_id long, embedding array<float>",
    )
    got = (
        similarity.mmr_rerank(cands, emb, lam=0.5, k=6)
        .orderBy("rank")
        .collect()
    )
    # oracle sims from the SAME float32-widened vectors Spark sees
    v64 = vecs.astype(np.float32).astype(np.float64)
    nrm = np.linalg.norm(v64, axis=1)
    sims = np.round((v64 @ v64.T) / np.outer(nrm, nrm), 6)
    chosen, scores = _greedy_mmr_oracle(rel, sims, 0.5, 6)
    assert [r.doc_id for r in got] == chosen
    for r, s in zip(got, scores):
        assert r.mmr_score == pytest.approx(s, abs=1e-9)


def test_mmr_prefers_diversity_over_redundancy(spark):
    # two near-identical high-rel docs + one different mid-rel doc:
    # rank 2 must be the different doc, not the duplicate
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.999, 0.001]),
            (2, [0.0, 1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    cands = spark.createDataFrame(
        [("q1", 0, 0.99), ("q1", 1, 0.98), ("q1", 2, 0.60)],
        "query_id string, doc_id long, rel double",
    )
    got = (
        similarity.mmr_rerank(cands, emb, lam=0.5, k=3).orderBy("rank").collect()
    )
    assert [r.doc_id for r in got] == [0, 2, 1]


def test_mmr_pool_smaller_than_k(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    cands = spark.createDataFrame(
        [("q1", 0, 0.9), ("q1", 1, 0.8)], "query_id string, doc_id long, rel double"
    )
    got = similarity.mmr_rerank(cands, emb, lam=0.7, k=10).collect()
    assert len(got) == 2


def test_collocations_pmi_closed_form(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b x y"), (3, "a b")],
        "doc_id long, text string",
    )
    out = {
        (r.w1, r.w2): r
        for r in textstats.collocations_pmi(docs, min_count=2).collect()
    }
    # bigrams: doc1 (a,b),(b,a),(a,b),(b,c); doc2 (a,b),(b,x),(x,y);
    # doc3 (a,b) -> (a,b) x4, total 8; tokens: 5 + 4 + 2 = 11
    assert set(out) == {("a", "b")}
    r = out[("a", "b")]
    assert r.c12 == 4
    n_tok, n_big, c_a, c_b = 11.0, 8.0, 4, 4
    expect = math.log((4 * n_tok * n_tok) / (n_big * c_a * c_b))
    assert r.pmi == pytest.approx(expect, abs=1e-12)


def test_collocations_empty_and_short_docs(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, "solo"), (3, "x y")], "doc_id long, text string"
    )
    got = textstats.collocations_pmi(docs, min_count=1).collect()
    assert {(r.w1, r.w2, r.c12) for r in got} == {("x", "y", 1)}


def test_quantiles_match_numpy(spark):
    vals = [1.0, 2.0, 4.0, 8.0, 16.0, 32.0, 64.0]
    df = spark.createDataFrame([(v,) for v in vals], "doc_length double")
    got = df.agg(
        F.expr("percentile(doc_length, array(0.25, 0.5, 0.9))").alias("q")
    ).collect()[0].q
    expect = np.percentile(vals, [25, 50, 90], method="linear")
    for g, e in zip(got, expect):
        assert g == pytest.approx(float(e), abs=1e-9)


class TestRbo:
    def test_closed_form(self, spark):
        # A = [d1,d2,d3], B = [d2,d1,d4]; k=3, p=0.5
        # overlaps: X_1=0, X_2=2 (d1,d2), X_3=2
        # RBO = (1-p) * (p^0*0/1 + p^1*2/2 + p^2*2/3)
        a = spark.createDataFrame(
            [("q", "d1", 1), ("q", "d2", 2), ("q", "d3", 3)],
            "query_id string, doc_id string, rank int",
        )
        b = spark.createDataFrame(
            [("q", "d2", 1), ("q", "d1", 2), ("q", "d4", 3)],
            "query_id string, doc_id string, rank int",
        )
        got = evaluation.rbo(a, b, k=3, p=0.5).collect()[0]
        want = 0.5 * (0.5 * 1.0 + 0.25 * 2 / 3)
        assert got.rbo == pytest.approx(want, abs=1e-12)

    def test_identical_and_disjoint(self, spark):
        a = spark.createDataFrame(
            [("q", f"d{i}", i) for i in range(1, 6)],
            "query_id string, doc_id string, rank int",
        )
        ident = evaluation.rbo(a, a, k=5, p=0.9).collect()[0].rbo
        want = 0.1 * sum(0.9 ** (d - 1) for d in range(1, 6))
        assert ident == pytest.approx(want, abs=1e-12)
        b = spark.createDataFrame(
            [("q", f"x{i}", i) for i in range(1, 6)],
            "query_id string, doc_id string, rank int",
        )
        assert evaluation.rbo(a, b, k=5).collect()[0].rbo == 0.0
