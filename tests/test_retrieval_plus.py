"""Layered retrieval operators (operators/retrieval_plus.py): MaxP
conversation aggregation, BM25F field weighting, more-like-this,
facets, and pseudo-relevance feedback — closed-form + equivalence."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bm25_pagerank_rpi_spark import B, K1
from bm25_pagerank_rpi_spark.operators import retrieval_plus as rp
from bm25_pagerank_rpi_spark.operators import scorer


# ---------------------------------------------------------------------------
# conversation_topk
# ---------------------------------------------------------------------------


def _conv(spark, rows, k=10):
    df = spark.createDataFrame(
        rows, "query_id string, conv_id string, turn_idx int, bm25 double"
    )
    return {
        r.conv_id: r for r in rp.conversation_topk(df, k=k).collect()
    }


def test_conversation_maxp_and_tiebreaks(spark):
    rows = [
        ("q1", "c1", 0, 1.0),
        ("q1", "c1", 3, 5.0),
        ("q1", "c2", 2, 5.0),
        ("q1", "c2", 1, 5.0),  # same score as turn 2 -> lowest turn wins
        ("q1", "c3", 0, 2.0),
    ]
    got = _conv(spark, rows, k=3)
    assert got["c1"].conv_score == 5.0 and got["c1"].best_turn_idx == 3
    assert got["c2"].best_turn_idx == 1  # tie -> lowest turn_idx
    assert got["c1"].n_turns_matched == 2 and got["c2"].n_turns_matched == 2
    assert abs(got["c1"].sum_score - 6.0) < 1e-12
    assert abs(got["c2"].mean_score - 5.0) < 1e-12
    # equal conv scores (5.0): conv_id asc breaks the tie
    assert got["c1"].rank == 1 and got["c2"].rank == 2 and got["c3"].rank == 3


def test_conversation_topk_cuts(spark):
    rows = [("q1", f"c{i}", 0, float(i)) for i in range(6)]
    got = _conv(spark, rows, k=2)
    assert set(got) == {"c5", "c4"}
    assert got["c5"].rank == 1


def test_conversation_per_query_partitioning(spark):
    rows = [
        ("qa", "c1", 0, 1.0),
        ("qb", "c1", 0, 9.0),
        ("qb", "c2", 0, 3.0),
    ]
    df = spark.createDataFrame(
        rows, "query_id string, conv_id string, turn_idx int, bm25 double"
    )
    out = rp.conversation_topk(df, k=1).collect()
    by_q = {r.query_id: r for r in out}
    assert by_q["qa"].conv_id == "c1" and by_q["qa"].rank == 1
    assert by_q["qb"].conv_id == "c1" and by_q["qb"].conv_score == 9.0


# ---------------------------------------------------------------------------
# BM25F
# ---------------------------------------------------------------------------


def _bm25f_ref(docs_fields, weights, query_terms):
    """Pure-Python simple-BM25F reference (occurrence semantics)."""
    wtf: dict = {}
    wdl: dict = {}
    for d, fields in docs_fields.items():
        wdl[d] = 0.0
        wtf[d] = {}
        for f, w in weights.items():
            toks = fields.get(f, "").split()
            wdl[d] += w * len(toks)
            for t in toks:
                wtf[d][t] = wtf[d].get(t, 0.0) + w
    n = len(docs_fields)
    avg = sum(wdl.values()) / n

    def df(t):
        return sum(1 for d in wtf if t in wtf[d])

    out = {}
    for d in docs_fields:
        s, cov = 0.0, 0
        for t in query_terms:
            v = wtf[d].get(t)
            if v is None:
                continue
            idf = math.log(n / (df(t) + 1))
            s += idf * (v * (K1 + 1)) / (v + K1 * (1 - B + B * (wdl[d] / avg)))
            cov += 1
        if cov > 0 or any(t in wtf[d] for t in query_terms):
            out[d] = (s, cov)
    return out


def test_bm25f_matches_reference(spark):
    docs_fields = {
        1: {"text": "alpha beta beta gamma", "tag": "code"},
        2: {"text": "alpha alpha delta", "tag": "search"},
        3: {"text": "gamma delta epsilon zeta", "tag": "code"},
        4: {"text": "", "tag": "browser"},
    }
    weights = {"text": 1.0, "tag": 2.0}
    df = spark.createDataFrame(
        [(d, f["text"], f["tag"]) for d, f in docs_fields.items()],
        "doc_id long, text string, tag string",
    )
    qdf = spark.createDataFrame(
        [("q1", "alpha code beta")], "query_id string, text string"
    )
    got = {
        r.doc_id: (r.bm25f, r.covered)
        for r in rp.bm25f_score(df, qdf, weights).collect()
    }
    exp = _bm25f_ref(docs_fields, weights, ["alpha", "code", "beta"])
    exp = {d: v for d, v in exp.items() if v[1] > 0}
    assert set(got) == set(exp)
    for d in exp:
        assert abs(got[d][0] - exp[d][0]) < 1e-9, d
        assert got[d][1] == exp[d][1]


def test_bm25f_single_text_field_equals_bm25(spark):
    """With one field at weight 1.0, BM25F degenerates to plain BM25."""
    texts = {
        10: "hash join table table",
        11: "hash scan index",
        12: "sort merge join",
        13: "",
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    qdf = spark.createDataFrame(
        [("q1", "hash join join")], "query_id string, text string"
    )
    f_scores = {
        r.doc_id: r.bm25f
        for r in rp.bm25f_score(df, qdf, {"text": 1.0}).collect()
    }
    dlen = scorer.doc_lengths(df)
    base = {
        r.doc_id: r.bm25
        for r in scorer.score_candidates(
            scorer.doc_term_frequencies(df), dlen,
            scorer.corpus_stats(dlen), qdf,
        ).collect()
    }
    assert set(f_scores) == set(base)
    for d in base:
        assert abs(f_scores[d] - base[d]) < 1e-12, d


def test_bm25f_topk_rank_and_cut(spark):
    df = spark.createDataFrame(
        [(i, "common", "t%d" % i) for i in range(5)],
        "doc_id long, text string, tag string",
    )
    qdf = spark.createDataFrame(
        [("q1", "common")], "query_id string, text string"
    )
    out = rp.bm25f_topk(df, qdf, {"text": 1.0, "tag": 1.0}, k=3).collect()
    assert [r.doc_id for r in sorted(out, key=lambda r: r.rank)] == [0, 1, 2]


# ---------------------------------------------------------------------------
# more_like_this
# ---------------------------------------------------------------------------


def test_mlt_term_mining_and_exclusion(spark):
    texts = {
        1: "zebra yak xylo common",
        2: "zebra yak xylo other",
        3: "common common common",
        4: "unrelated words here",
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    dtf = scorer.doc_term_frequencies(df)
    stats = scorer.corpus_stats(scorer.doc_lengths(df))
    # all four source terms have tf=1, df=2 -> equal tf*idf; the pinned
    # tie-break (term asc) makes the n_terms=3 cut deterministic
    terms = rp.more_like_this_terms(dtf, stats, 1, n_terms=3)
    assert terms == ["common", "xylo", "yak"]

    out = rp.more_like_this(df, 1, n_terms=3, k=10).collect()
    ids = {r.doc_id for r in out}
    assert 1 not in ids  # source excluded
    assert ids == {2, 3}  # doc2 via xylo+yak, doc3 via common
    by_id = {r.doc_id: r for r in out}
    assert by_id[2].rank == 1  # matches 2 of 3 query terms


def test_mlt_empty_source_doc(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "alpha beta")], "doc_id long, text string"
    )
    assert rp.more_like_this(df, 1, n_terms=5, k=5).count() == 0


# ---------------------------------------------------------------------------
# facet_counts
# ---------------------------------------------------------------------------


def test_facet_counts_histogram(spark):
    rows = [
        (1, "hash join", "en", "web"),
        (2, "hash scan", "en", "wiki"),
        (3, "sort merge", "de", "web"),   # no query term -> not a candidate
        (4, "join only", "de", "web"),
        (5, "", "fr", "books"),           # empty doc -> not a candidate
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    qdf = spark.createDataFrame(
        [("q1", "hash join")], "query_id string, text string"
    )
    got = {
        (r.field, r.value): r.n_docs
        for r in rp.facet_counts(df, qdf, ["lang", "source"]).collect()
    }
    assert got == {
        ("lang", "en"): 2,
        ("lang", "de"): 1,
        ("source", "web"): 2,
        ("source", "wiki"): 1,
    }


# ---------------------------------------------------------------------------
# prf
# ---------------------------------------------------------------------------


def _prf_corpus(spark):
    texts = {
        1: "hash join probe bucket",       # feedback doc
        2: "hash join radix bucket",       # feedback doc
        3: "probe radix bucket",           # only expansion terms
        4: "unrelated words entirely",     # never matches
        5: "hash",                         # weak pass-1 match
    }
    return spark.createDataFrame(list(texts.items()), "doc_id long, text string")


def test_prf_expansion_excludes_query_terms(spark):
    df = _prf_corpus(spark)
    qdf = spark.createDataFrame(
        [("q1", "hash join")], "query_id string, text string"
    )
    dtf = scorer.doc_term_frequencies(df)
    dlen = scorer.doc_lengths(df)
    stats = scorer.corpus_stats(dlen)
    pass1 = scorer.score_candidates(dtf, dlen, stats, qdf).select(
        "query_id", "doc_id", "bm25"
    )
    exp = [
        r.term
        for r in rp.prf_expansion_terms(
            pass1, dtf, dlen, stats, qdf, fb_docs=3, fb_terms=3
        ).collect()
    ]
    assert len(exp) <= 3
    assert "hash" not in exp and "join" not in exp
    # expansion mined from docs 1/2/5: bucket appears in both top docs
    assert "bucket" in exp


def test_prf_second_pass_reaches_expansion_only_docs(spark):
    df = _prf_corpus(spark)
    qdf = spark.createDataFrame(
        [("q1", "hash join")], "query_id string, text string"
    )
    out = rp.prf_topk(df, qdf, fb_docs=2, fb_terms=3, k=10).collect()
    ids = {r.doc_id for r in out}
    assert 3 in ids   # matches only expansion terms -> found by pass 2
    assert 4 not in ids


def test_prf_no_expansion_equals_plain_bm25(spark):
    """fb_terms=0 -> the second pass scores the original query."""
    df = _prf_corpus(spark)
    qdf = spark.createDataFrame(
        [("q1", "hash join")], "query_id string, text string"
    )
    got = {
        r.doc_id: (r.bm25, r.rank)
        for r in rp.prf_topk(df, qdf, fb_docs=2, fb_terms=0, k=10).collect()
    }
    dlen = scorer.doc_lengths(df)
    base = scorer.score_candidates(
        scorer.doc_term_frequencies(df), dlen,
        scorer.corpus_stats(dlen), qdf,
    ).select("doc_id", F.round("bm25", 6).alias("bm25"))
    exp = {
        r.doc_id: r.bm25
        for r in base.collect()
    }
    assert set(got) == set(exp)
    for d, v in exp.items():
        assert abs(got[d][0] - v) < 1e-12


# ---------------------------------------------------------------------------
# blended_topk
# ---------------------------------------------------------------------------


def test_blended_prior_reorders(spark):
    scored = spark.createDataFrame(
        [("q1", 1, 2.0), ("q1", 2, 1.5), ("q1", 3, 1.0)],
        "query_id string, doc_id long, bm25 double",
    )
    prior = spark.createDataFrame(
        [(2, 1.0), (3, 0.1)], "doc_id long, prior double"
    )
    out = {
        r.doc_id: r
        for r in rp.blended_topk(scored, prior, weight=1.0, k=3).collect()
    }
    # doc2: 1.5 + 1.0 = 2.5 beats doc1: 2.0 + 0 (missing prior -> 0)
    assert out[2].rank == 1 and abs(out[2].blended - 2.5) < 1e-12
    assert out[1].rank == 2 and out[1].prior == 0.0
    assert out[3].rank == 3 and abs(out[3].blended - 1.1) < 1e-12


def test_blended_zero_weight_keeps_order(spark):
    scored = spark.createDataFrame(
        [("q1", 1, 2.0), ("q1", 2, 3.0)],
        "query_id string, doc_id long, bm25 double",
    )
    prior = spark.createDataFrame([(1, 99.0)], "doc_id long, prior double")
    out = sorted(
        rp.blended_topk(scored, prior, weight=0.0, k=2).collect(),
        key=lambda r: r.rank,
    )
    assert [r.doc_id for r in out] == [2, 1]


# ---------------------------------------------------------------------------
# time_histogram
# ---------------------------------------------------------------------------


def test_time_histogram_buckets(spark):
    rows = [
        (1, "hash join", "2025-03-01 10:00:05"),
        (2, "hash scan", "2025-03-01 10:00:59"),
        (3, "join", "2025-03-01 10:02:30"),
        (4, "nothing relevant", "2025-03-01 10:03:00"),  # not a candidate
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    qdf = spark.createDataFrame(
        [("q1", "hash join")], "query_id string, text string"
    )
    got = {
        r.bucket_start: r.n_docs
        for r in rp.time_histogram(df, qdf, bucket="minute").collect()
    }
    assert got == {
        "2025-03-01 10:00:00": 2,
        "2025-03-01 10:02:00": 1,
    }


# ---------------------------------------------------------------------------
# fuzzy matching
# ---------------------------------------------------------------------------


def test_fuzzy_term_matches_classes(spark):
    vocab = spark.createDataFrame(
        [("join",), ("table",), ("hash",), ("ba",)], "term string"
    )
    q = spark.createDataFrame(
        [("q1", "jorn"), ("q1", "tble"), ("q2", "hash"),
         ("q2", "zzz"), ("q3", "ab")],
        "query_id string, term string",
    )
    got = {
        (r.query_id, r.qterm, r.term, r.dist)
        for r in rp.fuzzy_term_matches(vocab, q).collect()
    }
    assert ("q1", "jorn", "join", 1) in got      # substitution
    assert ("q1", "tble", "table", 1) in got     # insertion
    assert ("q2", "hash", "hash", 0) in got      # exact
    assert not any(r[1] == "zzz" for r in got)   # no match
    # transposition is Levenshtein distance 2: candidate generated by the
    # deletion join ("ab"/"ba" share variants) but killed by the verify
    assert not any(r[1] == "ab" and r[2] == "ba" for r in got)


def test_fuzzy_topk_equals_corrected_query(spark):
    docs = spark.createDataFrame(
        [(1, "join table"), (2, "join join scan"), (3, "scan filter")],
        "doc_id long, text string",
    )
    # 'jorn' expands to exactly {join} in this vocab, so fuzzy scoring
    # must equal plain BM25 of the corrected query
    fuzzy = rp.fuzzy_topk(
        docs, spark.createDataFrame([("q1", "jorn")], "query_id string, text string")
    ).collect()
    exact = {
        r.doc_id: r.bm25
        for r in scorer.topk(
            scorer.score_candidates(
                scorer.doc_term_frequencies(docs),
                scorer.doc_lengths(docs),
                scorer.corpus_stats(scorer.doc_lengths(docs)),
                spark.createDataFrame(
                    [("q1", "join")], "query_id string, text string"
                ),
            ).select("query_id", "doc_id", "bm25")
        ).collect()
    }
    got = {r.doc_id: r.bm25 for r in fuzzy}
    assert set(got) == set(exact) == {1, 2}
    for d in got:
        assert abs(got[d] - exact[d]) < 1e-12


def test_fuzzy_no_match_returns_empty(spark):
    docs = spark.createDataFrame([(1, "join table")], "doc_id long, text string")
    q = spark.createDataFrame([("q1", "qqqqqq")], "query_id string, text string")
    assert rp.fuzzy_topk(docs, q).count() == 0


# ---------------------------------------------------------------------------
# substring search
# ---------------------------------------------------------------------------


def test_substring_search_matches_python_in(spark):
    rows = [
        (1, "hash join table"),
        (2, "window scan"),
        (3, "aggregate pipeline"),
        (4, "HASH JOIN upper"),
    ]
    pats = [("p1", "sh jo"), ("p2", "ow sc"), ("p3", "agg"), ("p4", "qu"), ("p5", "zz")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pdf = spark.createDataFrame(pats, "query_id string, text string")
    got = {(r.query_id, r.doc_id) for r in rp.substring_search(docs, pdf).collect()}
    exp = {
        (qid, did)
        for qid, pat in pats
        for did, txt in rows
        if pat in txt.lower()
    }
    assert got == exp
    assert ("p1", 1) in exp and ("p1", 4) in exp  # case-folding caught doc 4
    assert not any(q == "p5" for q, _ in exp)     # no-match pattern


# ---------------------------------------------------------------------------
# suggest_terms / bm25_not_topk
# ---------------------------------------------------------------------------


def test_suggest_ranked_by_df(spark):
    docs = spark.createDataFrame(
        [(1, "scan sort scan"), (2, "scan small"), (3, "sort table")],
        "doc_id long, text string",
    )
    pre = spark.createDataFrame([("p1", "s"), ("p2", "ta"), ("p3", "zz")],
                                "query_id string, text string")
    got = [
        (r.query_id, r.term, r.df, r.rank)
        for r in rp.suggest_terms(docs, pre, n=2)
        .orderBy("query_id", "rank").collect()
    ]
    # df: scan=2 docs, sort=2, small=1 -> top-2 for 's' is (scan, sort)
    # by the term-asc tie-break; 'ta' -> table; 'zz' -> nothing
    assert got == [
        ("p1", "scan", 2, 1), ("p1", "sort", 2, 2), ("p2", "table", 1, 1),
    ]


def test_bm25_not_excludes(spark):
    docs = spark.createDataFrame(
        [(1, "join table"), (2, "join batch"), (3, "join merge table")],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [("q1", "join", "batch merge")],
        "query_id string, text string, neg_text string",
    )
    got = {r.doc_id for r in rp.bm25_not_topk(docs, q).collect()}
    assert got == {1}


def test_bm25_not_empty_neg_is_plain(spark):
    docs = spark.createDataFrame(
        [(1, "join table"), (2, "join batch")], "doc_id long, text string"
    )
    q = spark.createDataFrame(
        [("q1", "join", "")], "query_id string, text string, neg_text string"
    )
    got = {r.doc_id for r in rp.bm25_not_topk(docs, q).collect()}
    assert got == {1, 2}


# ---------------------------------------------------------------------------
# significant_terms (JLH foreground-vs-background contrast)
# ---------------------------------------------------------------------------


def test_significant_terms_jlh(spark):
    import pytest

    # 6 docs; query "alpha" matches d1..d3 (the foreground with fg_docs>=3);
    # "rare" rides only foreground docs, "common" rides every doc.
    docs = spark.createDataFrame(
        [
            (1, "alpha rare common x1"),
            (2, "alpha alpha rare common x2"),
            (3, "alpha rare common x3"),
            (4, "common other y1"),
            (5, "common other y2"),
            (6, "common other y3"),
        ],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([("q1", "alpha")], "query_id string, text string")
    got = {
        r.term: r
        for r in rp.significant_terms(docs, q, fg_docs=3, n_terms=10).collect()
    }
    assert "alpha" not in got  # query terms excluded
    # rare: fg 3/3, bg 3/6 -> (1 - 0.5) * (1/0.5) = 1.0
    assert got["rare"].fg_df == 3 and got["rare"].bg_df == 3
    assert got["rare"].score == pytest.approx(1.0, abs=1e-12)
    # common: fg 3/3, bg 6/6 -> (1 - 1) * 1 = 0 (corpus-wide term scores 0)
    assert got["common"].score == pytest.approx(0.0, abs=1e-12)
    # rare outranks common
    assert got["rare"].rank < got["common"].rank
    # background-only terms never appear (no fg_df row)
    assert "other" not in got


# ---------------------------------------------------------------------------
# rrf_fusion (hybrid-search merge)
# ---------------------------------------------------------------------------


def test_rrf_fusion_closed_form(spark):
    import pytest

    lex = spark.createDataFrame(
        [("q1", 10, 1), ("q1", 20, 2), ("q1", 30, 3)],
        "query_id string, doc_id long, rank int",
    )
    sem = spark.createDataFrame(
        [("q1", 20, 1), ("q1", 40, 2)],
        "query_id string, doc_id long, rank int",
    )
    got = {r.doc_id: r for r in rp.rrf_fusion([lex, sem], k=10, c=60).collect()}
    # doc 20 appears in both systems: 1/62 + 1/61
    assert got[20].rrf_score == pytest.approx(1 / 62 + 1 / 61, abs=1e-12)
    assert got[20].n_systems == 2 and got[20].rank == 1
    # single-system docs keep their reciprocal rank
    assert got[10].rrf_score == pytest.approx(1 / 61, abs=1e-12)
    assert got[40].rrf_score == pytest.approx(1 / 62, abs=1e-12)
    # rank 1 beats rank 2 within a system; cross-system consensus wins all
    assert got[10].rank == 2 and got[40].rank == 3 and got[30].rank == 4
    order = sorted(got.values(), key=lambda r: r.rank)
    assert [r.doc_id for r in order] == [20, 10, 40, 30]


# ---------------------------------------------------------------------------
# Index-backed twins (VERDICT r3 #3): each *_from_index variant must be
# value-identical to its from-raw sibling on the same corpus.
# ---------------------------------------------------------------------------


def _twin_fixture(spark, corpus, tmp_path):
    from bm25_pagerank_rpi_spark.plans.index_build import (
        build_index,
        build_trigram_index,
    )
    from tests.test_index_build import transcripts_df

    t = transcripts_df(spark, corpus)
    cat = build_index(
        spark, t, str(tmp_path / "idx"), n_buckets=8, block_size=16, range_rows=32
    )
    build_trigram_index(cat, t, n_buckets=8)
    docs = spark.createDataFrame(
        sorted(corpus.items()), "doc_id string, text string"
    )
    return cat, docs


def _toks(corpus):
    return sorted({t for text in corpus.values() for t in text.split()})


def test_mlt_from_index_equals_raw(spark, corpus, tmp_path):
    cat, docs = _twin_fixture(spark, corpus, tmp_path)
    src = next(d for d, t in sorted(corpus.items()) if len(t.split()) > 5)
    raw = rp.more_like_this(docs, src, n_terms=6, k=10).collect()
    idx = rp.more_like_this_from_index(cat, src, n_terms=6, k=10).collect()
    assert [(r.doc_id, r.bm25, r.rank) for r in sorted(raw, key=lambda r: r.rank)] \
        == [(r.doc_id, r.bm25, r.rank) for r in sorted(idx, key=lambda r: r.rank)]


def test_prf_from_index_equals_raw(spark, corpus, tmp_path):
    cat, docs = _twin_fixture(spark, corpus, tmp_path)
    toks = _toks(corpus)
    qdf = spark.createDataFrame(
        [("q1", f"{toks[0]} {toks[3]}"), ("q2", f"{toks[5]} {toks[5]} {toks[9]}")],
        "query_id string, text string",
    )
    raw = rp.prf_topk(docs, qdf, fb_docs=5, fb_terms=3, k=10).collect()
    idx = rp.prf_topk_from_index(cat, qdf, fb_docs=5, fb_terms=3, k=10).collect()
    key = lambda r: (r.query_id, r.rank)
    assert [(r.query_id, r.doc_id, r.bm25, r.covered, r.rank)
            for r in sorted(raw, key=key)] == \
           [(r.query_id, r.doc_id, r.bm25, r.covered, r.rank)
            for r in sorted(idx, key=key)]


def test_fuzzy_from_index_equals_raw(spark, corpus, tmp_path):
    cat, docs = _twin_fixture(spark, corpus, tmp_path)
    toks = [t for t in _toks(corpus) if len(t) >= 4]
    typo = toks[0][:-1] + ("x" if toks[0][-1] != "x" else "y")
    qdf = spark.createDataFrame(
        [("q1", f"{typo} {toks[3]}"), ("q2", toks[5][1:])],
        "query_id string, text string",
    )
    raw = rp.fuzzy_topk(docs, qdf, k=10).collect()
    idx = rp.fuzzy_topk_from_index(cat, qdf, k=10).collect()
    by_q_raw, by_q_idx = {}, {}
    for r in raw:
        by_q_raw.setdefault(r.query_id, []).append(r)
    for r in idx:
        by_q_idx.setdefault(r.query_id, []).append(r)
    assert set(by_q_raw) == set(by_q_idx)
    for q in by_q_raw:
        a = sorted(by_q_raw[q], key=lambda r: r.rank)
        b = sorted(by_q_idx[q], key=lambda r: r.rank)
        assert [r.doc_id for r in a] == [r.doc_id for r in b]
        for x, y in zip(a, b):
            assert abs(x.bm25 - y.bm25) < 1e-9


def test_suggest_from_index_equals_raw(spark, corpus, tmp_path):
    cat, docs = _twin_fixture(spark, corpus, tmp_path)
    toks = _toks(corpus)
    prefixes = spark.createDataFrame(
        [("p1", toks[0][:1]), ("p2", toks[4][:2])], "query_id string, text string"
    )
    raw = {tuple(r) for r in rp.suggest_terms(docs, prefixes, n=5).collect()}
    idx = {tuple(r) for r in rp.suggest_terms_from_index(cat, prefixes, n=5).collect()}
    assert raw == idx and raw


def test_sig_terms_from_index_equals_raw(spark, corpus, tmp_path):
    cat, docs = _twin_fixture(spark, corpus, tmp_path)
    toks = _toks(corpus)
    qdf = spark.createDataFrame(
        [("q1", f"{toks[2]} {toks[6]}")], "query_id string, text string"
    )
    raw = rp.significant_terms(docs, qdf, fg_docs=8, n_terms=10).collect()
    idx = rp.significant_terms_from_index(cat, qdf, fg_docs=8, n_terms=10).collect()
    key = lambda r: (r.query_id, r.rank)
    assert [(r.term, r.fg_df, r.bg_df, round(r.score, 6), r.rank)
            for r in sorted(raw, key=key)] == \
           [(r.term, r.fg_df, r.bg_df, round(r.score, 6), r.rank)
            for r in sorted(idx, key=key)]


def test_substring_from_index_matches_raw_and_python(spark, corpus, tmp_path):
    cat, docs = _twin_fixture(spark, corpus, tmp_path)
    toks = [t for t in _toks(corpus) if len(t) >= 5]
    pats = [("s1", toks[0][1:5]), ("s2", toks[3][:4].upper()), ("s3", "zq")]
    pdf = spark.createDataFrame(pats, "query_id string, text string")
    raw = {(r.query_id, r.doc_id) for r in rp.substring_search(docs, pdf).collect()}
    idx = {
        (r.query_id, r.doc_id)
        for r in rp.substring_search_from_index(cat, pdf).collect()
    }
    expect = {
        (qid, d)
        for qid, p in pats
        for d, t in corpus.items()
        if p.lower() in t.lower()
    }
    assert raw == expect
    assert idx == expect


def test_substring_from_index_requires_stage(spark, corpus, tmp_path):
    import pytest as _pytest

    from bm25_pagerank_rpi_spark.plans.index_build import build_index
    from tests.test_index_build import transcripts_df

    cat = build_index(
        spark, transcripts_df(spark, corpus), str(tmp_path / "idx2"),
        n_buckets=8, block_size=16, range_rows=32,
    )
    pdf = spark.createDataFrame([("s1", "abcd")], "query_id string, text string")
    with _pytest.raises(ValueError, match="trigram"):
        rp.substring_search_from_index(cat, pdf)


# ---------------------------------------------------------------------------
# recency decay / neighbor turns / sparse tf-idf similarity
# ---------------------------------------------------------------------------


def test_recency_decay_closed_form(spark):
    scored = spark.createDataFrame(
        [("q1", 0, 2.0), ("q1", 1, 1.0), ("q1", 2, 1.0)],
        "query_id string, doc_id long, bm25 double",
    )
    # doc 0 is 2h old, doc 1 is fresh (future ts clamps to age 0), doc 2 at origin
    ts = spark.createDataFrame(
        [
            (0, "2025-01-01 22:00:00"),
            (1, "2025-01-02 05:00:00"),
            (2, "2025-01-02 00:00:00"),
        ],
        "doc_id long, ts_s string",
    ).select("doc_id", F.col("ts_s").cast("timestamp").alias("ts"))
    got = {
        r.doc_id: r
        for r in rp.recency_decay_topk(
            scored, ts, origin="2025-01-02 00:00:00", half_life_s=7200.0, k=10
        ).collect()
    }
    assert got[0].decay == 0.5 and abs(got[0].blended - 1.0) < 1e-12
    assert got[1].decay == 1.0 and got[1].blended == 1.0  # clamped, no boost
    assert got[2].decay == 1.0
    # ranks: doc 1 and 2 tie doc 0 on blended=1.0 -> doc_id asc
    assert [got[d].rank for d in (0, 1, 2)] == [1, 2, 3]


def test_with_neighbor_turns_boundaries(spark):
    transcripts = spark.createDataFrame(
        [
            ("c1", 0, "t0"), ("c1", 1, "t1"), ("c1", 2, "t2"),
            ("c2", 0, "u0"),
        ],
        "conv_id string, turn_idx int, text string",
    )
    top = spark.createDataFrame(
        [("c1", 0), ("c1", 1), ("c1", 2), ("c2", 0)],
        "conv_id string, turn_idx int",
    )
    got = {
        (r.conv_id, r.turn_idx): (r.prev_text, r.next_text)
        for r in rp.with_neighbor_turns(top, transcripts).collect()
    }
    assert got[("c1", 0)] == (None, "t1")
    assert got[("c1", 1)] == ("t0", "t2")
    assert got[("c1", 2)] == ("t1", None)
    assert got[("c2", 0)] == (None, None)  # no bleed across conversations


def _np_sparse_cosine(rows, sources, k=10):
    import numpy as np

    tf = {}
    for doc_id, text in rows:
        for t in text.split():
            tf[(doc_id, t)] = tf.get((doc_id, t), 0) + 1
    docs = sorted({d for d, _ in tf})
    terms = sorted({t for _, t in tf})
    n = len(rows)
    df = {t: sum(1 for d in docs if (d, t) in tf) for t in terms}
    w = {
        (d, t): tf[(d, t)] * math.log(n / (df[t] + 1))
        for (d, t) in tf
    }
    vec = {
        d: np.array([w.get((d, t), 0.0) for t in terms]) for d in docs
    }
    out = set()
    for s in sources:
        sims = []
        for d in docs:
            if d == s:
                continue
            dot = float(vec[s] @ vec[d])
            if dot == 0.0 and not any((d, t) in tf and (s, t) in tf for t in terms):
                continue  # no shared term: the operator never emits the pair
            na, nb = np.linalg.norm(vec[s]), np.linalg.norm(vec[d])
            if na > 0 and nb > 0:
                sims.append((d, dot / (na * nb)))
        sims.sort(key=lambda x: (-round(x[1], 6), x[0]))
        for rank, (d, c) in enumerate(sims[:k], 1):
            out.add((s, d, round(c, 6), rank))
    return out


def test_similar_docs_sparse_numpy_parity(spark):
    rows = [
        (0, "spark shuffle join hash"),
        (1, "spark shuffle join sort"),
        (2, "hash join spark shuffle"),   # same bag as 0 -> cosine 1 with 0
        (3, "completely unrelated words here"),
        (4, "spark"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.src_id, r.doc_id, round(r.cosine, 6), r.rank)
        for r in rp.similar_docs_sparse(docs, [0, 3], k=10).collect()
    }
    assert got == _np_sparse_cosine(rows, [0, 3], k=10)
    # bag-of-words identical docs have cosine 1.0
    assert any(s == 0 and d == 2 and c == 1.0 for s, d, c, _ in got)


def test_similar_docs_from_index_equals_raw(spark, corpus, tmp_path):
    cat, docs = _twin_fixture(spark, corpus, tmp_path)
    srcs = sorted(corpus)[:3]
    raw = {
        (r.src_id, r.doc_id, round(r.cosine, 6), r.rank)
        for r in rp.similar_docs_sparse(docs, srcs, k=10).collect()
    }
    idx = {
        (r.src_id, r.doc_id, round(r.cosine, 6), r.rank)
        for r in rp.similar_docs_from_index(cat, srcs, k=10).collect()
    }
    assert raw == idx and raw
    # with the persisted docnorms stage the values must not move
    from bm25_pagerank_rpi_spark.plans.index_build import build_docnorm_index

    build_docnorm_index(cat)
    assert cat.stage_complete("docnorms")
    idx2 = {
        (r.src_id, r.doc_id, round(r.cosine, 6), r.rank)
        for r in rp.similar_docs_from_index(cat, srcs, k=10).collect()
    }
    assert idx2 == raw


# ---------------------------------------------------------------------------
# wildcard (trailing-*) prefix queries
# ---------------------------------------------------------------------------

WILD_DOCS = [
    ("d1", "table tablet tabulate join"),
    ("d2", "table table join"),
    ("d3", "tablet zebra"),
    ("d4", "zebra zoo"),
]


def test_wildcard_expansion_cap_by_df(spark):
    docs = spark.createDataFrame(WILD_DOCS, "doc_id string, text string")
    vocab = scorer.doc_term_frequencies(docs).groupBy("term").agg(
        F.count_distinct("doc_id").alias("df")
    )
    pats = spark.createDataFrame([("q1", "ta")], "query_id string, pattern string")
    # df: table=2, tablet=2, tabulate=1 -> cap 2 keeps (table, tablet)
    got = {
        r["term"]
        for r in rp.wildcard_term_matches(
            vocab, pats, max_expansions=2
        ).collect()
    }
    assert got == {"table", "tablet"}


def test_wildcard_topk_equals_expanded_literal_query(spark):
    docs = spark.createDataFrame(WILD_DOCS, "doc_id string, text string")
    qs = spark.createDataFrame([("q1", "ta* join")], "query_id string, text string")
    got = rp.wildcard_topk(docs, qs, k=10).select(
        "query_id", "doc_id", F.round("bm25", 9).alias("bm25")
    )
    # full expansion of ta* = {table, tablet, tabulate}; multiplicity-1
    # disjunction == scoring the deduped literal query
    lit = spark.createDataFrame(
        [("q1", "join table tablet tabulate")], "query_id string, text string"
    )
    dlen = scorer.doc_lengths(docs)
    exp = scorer.score_candidates(
        scorer.doc_term_frequencies(docs), dlen, scorer.corpus_stats(dlen), lit
    ).select("query_id", "doc_id", F.round("bm25", 9).alias("bm25"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_wildcard_bare_star_and_no_match(spark):
    docs = spark.createDataFrame(WILD_DOCS, "doc_id string, text string")
    qs = spark.createDataFrame(
        [("q1", "* qqq*"), ("q2", "zeb*")], "query_id string, text string"
    )
    rows = rp.wildcard_topk(docs, qs, k=10).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], set()).add(r["doc_id"])
    assert "q1" not in by_q  # bare * dropped, qqq* matches nothing
    assert by_q["q2"] == {"d3", "d4"}


# ---------------------------------------------------------------------------
# Rocchio explicit relevance feedback
# ---------------------------------------------------------------------------

ROCCHIO_DOCS = [
    ("1", "apple banana"),
    ("2", "apple cherry cherry"),
    ("3", "durian banana"),
    ("4", "elderberry"),
]


def _rocchio_inputs(spark, qrels_rows):
    docs = spark.createDataFrame(ROCCHIO_DOCS, "doc_id string, text string")
    qs = spark.createDataFrame([("q1", "apple")], "query_id string, text string")
    qrels = spark.createDataFrame(
        qrels_rows, "query_id string, doc_id string, label int"
    )
    return docs, qs, qrels


def test_rocchio_weights_closed_form(spark):
    import math

    docs, qs, qrels = _rocchio_inputs(
        spark, [("q1", "2", 1), ("q1", "3", 0)]
    )
    dtf = scorer.doc_term_frequencies(docs)
    dlen = scorer.doc_lengths(docs)
    stats = scorer.corpus_stats(dlen)
    got = {
        r["term"]: r["w"]
        for r in rp.rocchio_weights(dtf, stats, qs, qrels).collect()
    }
    idf = lambda df: math.log(4 / (df + 1))
    # apple: alpha*1 + beta*tf_in_d2(1)/1 = 1.75, times idf(df=2)
    assert got["apple"] == round(1.75 * idf(2), 6)
    # cherry: beta*2/1 = 1.5, times idf(df=1)
    assert got["cherry"] == round(1.5 * idf(1), 6)
    # banana: only in the non-relevant doc -> negative -> filtered
    assert "banana" not in got
    # durian: gamma-only -> negative -> filtered
    assert "durian" not in got


def test_rocchio_feedback_reaches_expansion_only_docs(spark):
    docs, qs, qrels = _rocchio_inputs(spark, [("q1", "2", 1)])
    ranked = rp.rocchio_topk(docs, qs, qrels, k=10).collect()
    by_doc = {r["doc_id"]: r["rank"] for r in ranked if r["query_id"] == "q1"}
    # cherry came only from feedback; doc 2 holds apple+cherry -> rank 1
    assert by_doc["2"] == 1
    # plain query 'apple' would never reach a cherry-only doc; all docs
    # matching any expanded term appear
    assert set(by_doc) == {"1", "2"}


def test_rocchio_no_judgments_is_plain_weighted_query(spark):
    docs, qs, _ = _rocchio_inputs(spark, [("qX", "1", 1)])
    empty_qrels = spark.createDataFrame([], "query_id string, doc_id string, label int")
    ranked = rp.rocchio_topk(docs, qs, empty_qrels, k=10).collect()
    docs_hit = {r["doc_id"] for r in ranked}
    assert docs_hit == {"1", "2"}  # the apple docs, ranked by w*bm25


# ---------------------------------------------------------------------------
# search_after pagination
# ---------------------------------------------------------------------------


def test_search_after_pages_tile_the_full_ranking(spark):
    docs = spark.createDataFrame(
        [(str(i), "apple " * (i % 5 + 1)) for i in range(1, 20)],
        "doc_id string, text string",
    )
    qs = spark.createDataFrame([("q1", "apple")], "query_id string, text string")
    dlen = scorer.doc_lengths(docs)
    sc = scorer.score_candidates(
        scorer.doc_term_frequencies(docs), dlen, scorer.corpus_stats(dlen), qs
    ).select("query_id", "doc_id", F.round("bm25", 6).alias("bm25"))
    full = scorer.topk(sc, 100).orderBy("rank").collect()

    # page through with cursors of size 4; concatenation == full ranking
    seen = []
    cursor = None
    while True:
        if cursor is None:
            cursors = spark.createDataFrame(
                [], "query_id string, after_score double, after_doc string"
            )
        else:
            cursors = spark.createDataFrame(
                [("q1", cursor[0], cursor[1])],
                "query_id string, after_score double, after_doc string",
            )
        page = (
            rp.search_after_topk(docs, qs, cursors, k=4)
            .orderBy("rank")
            .collect()
        )
        if not page:
            break
        seen.extend((r["doc_id"], r["bm25"]) for r in page)
        cursor = (float(page[-1]["bm25"]), page[-1]["doc_id"])
        assert [r["rank"] for r in page] == list(range(1, len(page) + 1))
    assert seen == [(r["doc_id"], r["bm25"]) for r in full]


def test_regexp_matches_anchored_and_capped(spark):
    docs = spark.createDataFrame(WILD_DOCS, "doc_id string, text string")
    vocab = scorer.doc_term_frequencies(docs).groupBy("term").agg(
        F.count_distinct("doc_id").alias("df")
    )
    pats = spark.createDataFrame(
        [("q1", "tab.*"), ("q2", "zeb")], "query_id string, pattern string"
    )
    got = {}
    for r in rp.regexp_term_matches(vocab, pats, max_expansions=2).collect():
        got.setdefault(r["query_id"], set()).add(r["term"])
    # df cap: table(2), tablet(2) beat tabulate(1)
    assert got["q1"] == {"table", "tablet"}
    # anchored: 'zeb' must NOT partially match 'zebra'
    assert "q2" not in got


def test_regexp_topk_scores_expansion_union(spark):
    docs = spark.createDataFrame(WILD_DOCS, "doc_id string, text string")
    pats = spark.createDataFrame(
        [("q1", "zebra|zoo")], "query_id string, pattern string"
    )
    hits = {r["doc_id"] for r in rp.regexp_topk(docs, pats, k=10).collect()}
    assert hits == {"d3", "d4"}


def test_spell_suggest_ranking(spark):
    docs = spark.createDataFrame(
        [("1", "tables tables tabled"), ("2", "tables stables"), ("3", "tabled")],
        "doc_id string, text string",
    )
    terms = spark.createDataFrame([("s", "tables")], "query_id string, term string")
    rows = rp.spell_suggest(docs, terms, n=3).orderBy("rank").collect()
    # exact match first (dist 0), then dist-1 ties broken by df desc
    assert [(r["term"], r["dist"]) for r in rows] == [
        ("tables", 0), ("tabled", 1), ("stables", 1),
    ]


def test_percolate_conjunctive_semantics(spark):
    docs = spark.createDataFrame(
        [("d1", "alpha beta gamma"), ("d2", "alpha alpha"), ("d3", "beta")],
        "doc_id string, text string",
    )
    sq = spark.createDataFrame(
        [("qa", "alpha beta"), ("qb", "alpha"), ("qc", "alpha zzz")],
        "query_id string, text string",
    )
    got = {(r["doc_id"], r["query_id"]) for r in rp.percolate(docs, sq).collect()}
    assert got == {("d1", "qa"), ("d1", "qb"), ("d2", "qb")}


def test_synonym_expansion_reaches_synonym_only_docs(spark):
    docs = spark.createDataFrame(
        [("d1", "car fast"), ("d2", "automobile slow"), ("d3", "bike")],
        "doc_id string, text string",
    )
    qs = spark.createDataFrame([("q1", "car")], "query_id string, text string")
    syns = spark.createDataFrame(
        [("car", "automobile"), ("automobile", "car")], "term string, syn string"
    )
    hits = {r["doc_id"] for r in rp.synonym_topk(docs, qs, syns, k=10).collect()}
    assert hits == {"d1", "d2"}
    # empty thesaurus degrades to plain BM25 candidates
    empty = spark.createDataFrame([], "term string, syn string")
    hits0 = {r["doc_id"] for r in rp.synonym_topk(docs, qs, empty, k=10).collect()}
    assert hits0 == {"d1"}


def test_collapsed_topk_keeps_canonicals_only(spark):
    docs = spark.createDataFrame(
        [
            ("1", "apple pie"), ("2", "apple pie"), ("9", "apple pie"),
            ("3", "apple tart"), ("4", "banana"),
        ],
        "doc_id string, text string",
    )
    qs = spark.createDataFrame([("q1", "apple")], "query_id string, text string")
    rows = rp.collapsed_topk(docs, qs, k=10).collect()
    hit = {r["doc_id"]: r for r in rows}
    # cluster {1,2,9} collapses to canonical '1'; '3' unaffected
    assert set(hit) == {"1", "3"}
    # collapse filters, never rescores: surviving scores == plain BM25
    dlen = scorer.doc_lengths(docs)
    plain = {
        r["doc_id"]: r["bm25"]
        for r in scorer.score_candidates(
            scorer.doc_term_frequencies(docs), dlen,
            scorer.corpus_stats(dlen), qs,
        ).collect()
    }
    for d, r in hit.items():
        assert r["bm25"] == plain[d]
    # ranks re-number densely over survivors
    assert sorted(r["rank"] for r in rows) == [1, 2]


def test_dis_max_combines_field_legs(spark):
    import pytest
    # field A: text; field B: a one-token "tag" field
    docs = spark.createDataFrame(
        [("1", "apple pie apple"), ("2", "banana split"), ("3", "cherry")],
        "doc_id string, text string",
    )
    tags = spark.createDataFrame(
        [("1", "fruit"), ("2", "apple"), ("3", "nut")],
        "doc_id string, term string",
    )
    qs = spark.createDataFrame([("q1", "apple")], "query_id string, text string")
    dlen = scorer.doc_lengths(docs)
    fields = [
        ("text", scorer.doc_term_frequencies(docs), dlen),
        (
            "tag",
            tags.select("doc_id", "term", F.lit(1).cast("int").alias("tf")),
            tags.select("doc_id", F.lit(1).alias("doc_length")),
        ),
    ]
    tie = 0.4
    got = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in rp.dis_max_score(fields, qs, tie).collect()
    }
    # leg scores computed independently with each field's own stats
    text_leg = {
        r["doc_id"]: r["bm25"]
        for r in scorer.score_candidates(
            scorer.doc_term_frequencies(docs), dlen,
            scorer.corpus_stats(dlen), qs,
        ).collect()
    }
    # tag field: 3 docs, dl=avgdl=1, df('apple')=1 -> idf=ln(3/2),
    # tf=1 -> bm25 term = idf * (k1+1)/(1+k1)  = idf
    tag_leg = {"2": math.log(3.0 / 2.0)}
    # doc 1 matches only text; doc 2 only the tag field; doc 3 neither
    assert set(got) == {("q1", "1"), ("q1", "2")}
    # single-leg docs: dis_max == that leg's score (tie adds nothing)
    assert got[("q1", "1")] == pytest.approx(text_leg["1"], abs=1e-12)
    assert got[("q1", "2")] == pytest.approx(tag_leg["2"], abs=1e-12)
    # two-leg combine: widen the query so doc 1 matches BOTH fields
    qs2 = spark.createDataFrame(
        [("q2", "apple fruit")], "query_id string, text string"
    )
    got2 = {
        r["doc_id"]: r["score"]
        for r in rp.dis_max_score(fields, qs2, tie).collect()
    }
    text2 = {
        r["doc_id"]: r["bm25"]
        for r in scorer.score_candidates(
            scorer.doc_term_frequencies(docs), dlen,
            scorer.corpus_stats(dlen), qs2,
        ).collect()
    }
    # tag leg for q2: df(apple)=1, df(fruit)=1 over 3 one-token docs;
    # matched tf=1, dl=avgdl=1 -> contribution = idf = ln(3/2)
    tag2 = {"1": math.log(3.0 / 2.0), "2": math.log(3.0 / 2.0)}
    both = [text2["1"], tag2["1"]]
    exp1 = max(both) + tie * (sum(both) - max(both))
    assert got2["1"] == pytest.approx(exp1, abs=1e-12)


def test_range_facet_bounds_inclusive_exclusive(spark):
    import pytest
    docs = spark.createDataFrame(
        [("1", "apple", 10.0), ("2", "apple", 20.0), ("3", "apple", 19.999),
         ("4", "apple", 30.0), ("5", "banana", 99.0)],
        "doc_id string, text string, size double",
    )
    qs = spark.createDataFrame([("q1", "apple")], "query_id string, text string")
    rows = rp.range_facet_counts(docs, qs, "size", [20.0, 30.0]).collect()
    got = {r["bucket_idx"]: r for r in rows}
    # ES bounds: [-inf,20) [20,30) [30,inf); value 20.0 lands UP (from-inclusive)
    assert [got[i]["n_docs"] for i in range(3)] == [2, 1, 1]
    assert got[0]["lo"] is None and got[0]["hi"] == 20.0
    assert got[2]["lo"] == 30.0 and got[2]["hi"] is None
    # non-candidate doc 5 excluded entirely
    assert sum(r["n_docs"] for r in rows) == 4
    # empty bucket still emitted
    rows2 = rp.range_facet_counts(docs, qs, "size", [1000.0]).collect()
    got2 = {r["bucket_idx"]: r["n_docs"] for r in rows2}
    assert got2 == {0: 4, 1: 0}


def test_facet_top_hits_per_bucket_rank(spark):
    docs = spark.createDataFrame(
        [("1", "apple apple", "en"), ("2", "apple", "en"),
         ("3", "apple apple apple", "fr"), ("4", "banana", "fr")],
        "doc_id string, text string, lang string",
    )
    qs = spark.createDataFrame([("q1", "apple")], "query_id string, text string")
    rows = rp.facet_top_hits(docs, qs, "lang", 1).collect()
    got = {r["value"]: r["doc_id"] for r in rows}
    # best candidate per lang bucket; doc 4 never a candidate
    assert got == {"en": "1", "fr": "3"}
    assert all(r["bucket_rank"] == 1 for r in rows)


def test_phrase_suggest_collation_prunes(spark):
    import pytest
    docs = spark.createDataFrame(
        [
            ("1", "alpha beta"), ("2", "alpha beta"), ("3", "alpha gamma"),
            ("4", "altha delta"),  # 'altha' is lev-1 from 'alpha'
        ],
        "doc_id string, text string",
    )
    # query 'alpha betb': corrections include (alpha|altha) x (beta),
    # but 'altha beta' co-occurs in no doc -> collation prunes it
    rows = rp.phrase_suggest(docs, ["alpha", "betb"], per_term=3, n=5).collect()
    sugg = {r["suggestion"]: r for r in rows}
    assert "alpha beta" in sugg
    assert "altha beta" not in sugg
    top = sugg["alpha beta"]
    assert top["total_dist"] == 1  # betb -> beta
    assert top["n_matching_docs"] == 2  # docs 1 and 2
    import math
    # lm_score = ln(df_alpha+1) + ln(df_beta+1) = ln(4) + ln(3)
    assert top["lm_score"] == pytest.approx(
        round(math.log(4.0) + math.log(3.0), 6), abs=1e-9
    )
    # identity phrase of an all-valid query ranks first at dist 0
    rows2 = rp.phrase_suggest(docs, ["alpha", "beta"], per_term=3, n=5).collect()
    first = min(rows2, key=lambda r: r["rank"])
    assert first["suggestion"] == "alpha beta" and first["total_dist"] == 0


# ---------------------------------------------------------------------------
# common_terms_topk (Lucene CommonTermsQuery gating)
# ---------------------------------------------------------------------------


def _ct_corpus(spark):
    # 'x' appears in 1/5 docs (rare under cutoff 0.5); 'cm' in all 5
    rows = [
        (1, "cm x y"),
        (2, "cm cm cm"),
        (3, "cm z"),
        (4, "cm w"),
        (5, "cm v"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_common_terms_rare_gate(spark):
    docs = _ct_corpus(spark)
    q = spark.createDataFrame([("q1", "cm x")], "query_id string, text string")
    got = rp.common_terms_topk(docs, q, cutoff_frequency=0.5, k=10).collect()
    # only doc 1 contains the rare term 'x' -> sole candidate, even
    # though doc 2 has the highest cm tf
    assert [r.doc_id for r in got] == [1]


def test_common_terms_all_common_fallback(spark):
    docs = _ct_corpus(spark)
    q = spark.createDataFrame([("q1", "cm")], "query_id string, text string")
    got = rp.common_terms_topk(docs, q, cutoff_frequency=0.5, k=10).collect()
    # no rare matching term -> plain disjunction over all terms
    assert sorted(r.doc_id for r in got) == [1, 2, 3, 4, 5]


def test_common_terms_scores_all_terms(spark):
    # scoring includes the common terms on the gated candidates: 'cm'
    # appears in every doc, so idf(cm) = ln(5/6) < 0 and the two-term
    # query scores strictly BELOW the rare-term-only query — proving the
    # common term reached the scorer instead of being dropped
    docs = _ct_corpus(spark)
    q_both = spark.createDataFrame(
        [("q1", "cm x")], "query_id string, text string"
    )
    q_rare = spark.createDataFrame(
        [("q1", "x")], "query_id string, text string"
    )
    s_both = rp.common_terms_topk(docs, q_both, 0.5, k=10).collect()[0].bm25
    s_rare = rp.common_terms_topk(docs, q_rare, 0.5, k=10).collect()[0].bm25
    assert s_both < s_rare - 1e-9


# ---------------------------------------------------------------------------
# linear_fusion (min-max alpha-blend)
# ---------------------------------------------------------------------------


def _leg(spark, rows):
    return spark.createDataFrame(
        rows, "query_id string, doc_id long, score double"
    )


def test_linear_fusion_normalization_and_weights(spark):
    a = _leg(spark, [("q1", 1, 10.0), ("q1", 2, 5.0), ("q1", 3, 0.0)])
    b = _leg(spark, [("q1", 2, 0.9), ("q1", 3, 0.1)])
    got = {
        r.doc_id: r
        for r in rp.linear_fusion([a, b], [0.6, 0.4], k=10).collect()
    }
    # doc1: 0.6*1.0 + missing = 0.6 ; doc2: 0.6*0.5 + 0.4*1.0 = 0.7
    assert abs(got[1].fused - 0.6) < 1e-12 and got[1].n_systems == 1
    assert abs(got[2].fused - 0.7) < 1e-12 and got[2].n_systems == 2
    # doc3: 0.6*0.0 + 0.4*0.0 = 0.0, present in both legs
    assert abs(got[3].fused - 0.0) < 1e-12 and got[3].n_systems == 2
    assert got[2].rank == 1 and got[1].rank == 2


def test_linear_fusion_constant_leg_maps_to_one(spark):
    a = _leg(spark, [("q1", 1, 7.0), ("q1", 2, 7.0)])
    got = {r.doc_id: r for r in rp.linear_fusion([a], [1.0], k=10).collect()}
    assert abs(got[1].fused - 1.0) < 1e-12
    assert abs(got[2].fused - 1.0) < 1e-12


def test_linear_fusion_validates_args(spark):
    import pytest

    with pytest.raises(ValueError):
        rp.linear_fusion([], [], k=5)
    a = _leg(spark, [("q1", 1, 1.0)])
    with pytest.raises(ValueError):
        rp.linear_fusion([a], [0.5, 0.5], k=5)


# ---------------------------------------------------------------------------
# rank_feature_topk (bounded feature boosts)
# ---------------------------------------------------------------------------


def _rf_scored(spark):
    return spark.createDataFrame(
        [("q1", 1, 1.0), ("q1", 2, 1.0), ("q1", 3, 2.0)],
        "query_id string, doc_id long, bm25 double",
    )


def test_rank_feature_saturation_bounded(spark):
    scored = _rf_scored(spark)
    feats = spark.createDataFrame(
        [(1, 1e9), (2, 0.5)], "doc_id long, feature double"
    )
    got = {
        r.doc_id: r
        for r in rp.rank_feature_topk(
            scored, feats, boost=2.0, mode="saturation", pivot=0.5
        ).collect()
    }
    # runaway feature saturates below boost; f == pivot -> boost/2
    assert got[1].blended < 1.0 + 2.0
    assert got[1].blended > 1.0 + 2.0 * 0.999
    assert abs(got[2].blended - (1.0 + 1.0)) < 1e-9
    # missing feature -> contribution 0, feature reported as 0
    assert got[3].blended == 2.0 and got[3].feature == 0.0


def test_rank_feature_modes_and_validation(spark):
    import math

    import pytest

    scored = _rf_scored(spark)
    feats = spark.createDataFrame([(1, 3.0)], "doc_id long, feature double")
    log = {
        r.doc_id: r
        for r in rp.rank_feature_topk(
            scored, feats, boost=1.0, mode="log", scaling_factor=2.0
        ).collect()
    }
    assert abs(log[1].blended - (1.0 + math.log(5.0))) < 1e-9
    sig = {
        r.doc_id: r
        for r in rp.rank_feature_topk(
            scored, feats, boost=1.0, mode="sigmoid", pivot=3.0, exponent=2.0
        ).collect()
    }
    assert abs(sig[1].blended - (1.0 + 0.5)) < 1e-9
    with pytest.raises(ValueError):
        rp.rank_feature_topk(scored, feats, mode="nope")


# ---------------------------------------------------------------------------
# bm25f_score_from_index (per-field catalogs == from-raw BM25F)
# ---------------------------------------------------------------------------


def test_bm25f_from_index_matches_raw(spark, tmp_path):
    import pytest

    from bm25_pagerank_rpi_spark.plans.index_build import build_index

    rows = [
        ("conv_0", 0, "user", "hash join table", "search"),
        ("conv_0", 1, "assistant", "hash scan", "code"),
        ("conv_1", 0, "user", "sort merge join", "search"),
        ("conv_1", 1, "assistant", "", "none"),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    ).withColumn("ts", F.lit("2025-01-01 00:00:00").cast("timestamp"))
    weights = {"text": 1.0, "role": 0.5, "tool": 2.0}
    cats = {}
    for fld in weights:
        src = t if fld == "text" else t.withColumn("text", F.col(fld))
        cats[fld] = build_index(
            spark, src, str(tmp_path / f"f_{fld}"), n_buckets=4
        )
    qdf = spark.createDataFrame(
        [("q1", "hash search user join")], "query_id string, text string"
    )
    docs = t.withColumn(
        "doc_id", F.concat_ws(":", "conv_id", "turn_idx")
    )
    raw = {
        r.doc_id: (round(r.bm25f, 9), r.covered)
        for r in rp.bm25f_score(docs, qdf, weights).collect()
    }
    idx = {
        r.doc_id: (round(r.bm25f, 9), r.covered)
        for r in rp.bm25f_score_from_index(cats, weights, qdf).collect()
    }
    assert idx == raw and len(raw) > 0

    with pytest.raises(ValueError):
        rp.bm25f_score_from_index({"text": cats["text"]}, weights, qdf)


# ---------------------------------------------------------------------------
# rescore_window (ES two-phase rescoring)
# ---------------------------------------------------------------------------

def test_rescore_window_semantics(spark):
    from pyspark.sql import functions as F

    # primary: d1 > d2 > d3 > d4; window=2 means only d1/d2 rescoreable
    scored = spark.createDataFrame(
        [("q", 1, 4.0), ("q", 2, 3.0), ("q", 3, 2.0), ("q", 4, 1.0)],
        "query_id string, doc_id long, bm25 double",
    )
    secondary = spark.createDataFrame(
        [(2, 5.0), (3, 100.0)], "doc_id long, rescore double"
    )
    out = rp.rescore_window(
        scored, secondary, k=4, window=2
    ).orderBy("rank").collect()
    # d2 (in window) blends 3+5=8 and overtakes d1 (4.0, no secondary);
    # d3's huge secondary is IGNORED (outside the window) -> keeps 2.0
    assert [(r.doc_id, r.score) for r in out] == [
        (2, 8.0), (1, 4.0), (3, 2.0), (4, 1.0),
    ]
    assert [r.rank for r in out] == [1, 2, 3, 4]


def test_rescore_window_weights_and_k(spark):
    scored = spark.createDataFrame(
        [("q", i, float(10 - i)) for i in range(1, 6)],
        "query_id string, doc_id long, bm25 double",
    )
    secondary = spark.createDataFrame([(5, 4.0)], "doc_id long, rescore double")
    out = rp.rescore_window(
        scored, secondary, k=2, window=5, query_weight=0.5, rescore_weight=2.0
    ).orderBy("rank").collect()
    # all in window: d1 0.5*9=4.5, d5 0.5*5+2*4=10.5 -> d5 first, k=2 rows
    assert [(r.doc_id, r.score) for r in out] == [(5, 10.5), (1, 4.5)]


def test_boosting_topk_demotes_without_excluding(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple apple"),          # strong match, no neg
            (2, "apple apple apple banana"),   # strong match + neg term
            (3, "apple"),                      # weak match, no neg
            (4, "cherry"),                     # no positive match
        ],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [("q", "apple", "banana")],
        "query_id string, text string, neg_text string",
    )
    out = {r.doc_id: (r.bm25, r.rank) for r in
           rp.boosting_topk(docs, queries, negative_boost=0.5, k=10).collect()}
    # doc 4 never matched the positive query -> absent, NOT demoted-in
    assert set(out) == {1, 2, 3}
    hard = {r.doc_id for r in
            rp.bm25_not_topk(docs, queries, k=10).collect()}
    # the hard NOT drops doc 2; boosting keeps it with half the score
    assert hard == {1, 3}
    import math
    full = rp.bm25_not_topk(
        docs, queries.select("query_id", "text",
                             queries.neg_text.substr(1, 0).alias("neg_text")),
        k=10,
    )
    base = {r.doc_id: r.bm25 for r in full.collect()}
    assert math.isclose(out[2][0], round(round(base[2], 6) * 0.5, 6),
                        abs_tol=1e-9)
    assert math.isclose(out[1][0], round(base[1], 6), abs_tol=1e-9)
