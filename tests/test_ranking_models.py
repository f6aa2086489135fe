"""LM Dirichlet / Jelinek-Mercer similarities vs a pure-Python oracle."""

from __future__ import annotations

import math

import pytest

from bm25_pagerank_rpi_spark.operators import ranking_models, scorer

DOCS = [
    ("d1", "apple banana apple cherry"),
    ("d2", "banana banana durian"),
    ("d3", "cherry apple"),
    ("d4", "elderberry fig fig fig"),
    ("d5", ""),
]
QUERY = "apple banana banana zzznope"  # dup term -> multiplicity, absent term -> skip


def _py_scores(model: str, mu: float = 2000.0, lam: float = 0.1) -> dict[str, float]:
    toks = {d: t.split() for d, t in DOCS if t}
    tf = {d: {} for d in toks}
    for d, ts in toks.items():
        for t in ts:
            tf[d][t] = tf[d].get(t, 0) + 1
    dl = {d: len(ts) for d, ts in toks.items()}
    total = float(sum(dl.values()))
    qocc = QUERY.split()
    ctf = {
        t: float(sum(tf[d].get(t, 0) for d in tf))
        for t in set(qocc)
    }
    cand = {d for d in tf if any(tf[d].get(t, 0) > 0 for t in set(qocc))}
    out = {}
    for d in cand:
        s = 0.0
        for t in qocc:
            if ctf[t] == 0:
                continue  # absent from collection: occurrence skipped
            f = float(tf[d].get(t, 0))
            pc = ctf[t] / total
            if model == "dir":
                s += math.log(1.0 + f / (mu * pc)) + math.log(mu / (dl[d] + mu))
            else:
                s += math.log(1.0 + ((1.0 - lam) / lam) * (f / dl[d]) / pc) if f > 0 else 0.0
        out[d] = s
    return out


@pytest.fixture(scope="module")
def inputs(spark):
    docs = spark.createDataFrame(DOCS, "doc_id string, text string")
    qs = spark.createDataFrame([("q1", QUERY)], "query_id string, text string")
    return (
        scorer.doc_term_frequencies(docs),
        scorer.doc_lengths(docs),
        qs,
    )


def test_lmdir_matches_oracle(inputs):
    got = {
        r["doc_id"]: r["score"]
        for r in ranking_models.lmdir_score(*inputs).collect()
    }
    exp = _py_scores("dir")
    assert set(got) == set(exp)
    for d in exp:
        assert got[d] == pytest.approx(exp[d], abs=1e-12)


def test_lmjm_matches_oracle(inputs):
    got = {
        r["doc_id"]: r["score"]
        for r in ranking_models.lmjm_score(*inputs).collect()
    }
    exp = _py_scores("jm")
    assert set(got) == set(exp)
    for d in exp:
        assert got[d] == pytest.approx(exp[d], abs=1e-12)


def test_topk_tiebreak(inputs):
    scored = ranking_models.lmdir_score(*inputs)
    rows = ranking_models.topk(scored, 3).orderBy("rank").collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    # rank order == (round(score,6) desc, doc_id asc)
    keys = [(-r["score"], r["doc_id"]) for r in rows]
    assert keys == sorted(keys)


def test_bm25_variants_match_oracle(inputs):
    import math

    from bm25_pagerank_rpi_spark import B, K1

    toks = {d: t.split() for d, t in DOCS if t}
    tf = {}
    for d, ts in toks.items():
        tf[d] = {}
        for t in ts:
            tf[d][t] = tf[d].get(t, 0) + 1
    dl = {d: len(ts) for d, ts in toks.items()}
    n_docs = len(DOCS)  # empty doc counts toward doc_count/avgdl
    avgdl = sum(dl.values()) / n_docs
    qocc = QUERY.split()
    df = {t: sum(1 for d in tf if t in tf[d]) for t in set(qocc)}
    cand = {d for d in tf if any(t in tf[d] for t in set(qocc))}

    def idf(t):
        return math.log(n_docs / (df[t] + 1))

    def plus(d):
        s = 0.0
        for t in qocc:
            if df[t] == 0 or t not in tf[d]:
                continue
            f = tf[d][t]
            norm = 1 - B + B * dl[d] / avgdl
            s += idf(t) * (f * (K1 + 1) / (f + K1 * norm) + 1.0)
        return s

    def l_(d):
        s = 0.0
        for t in qocc:
            if df[t] == 0 or t not in tf[d]:
                continue
            c = tf[d][t] / (1 - B + B * dl[d] / avgdl)
            s += idf(t) * ((K1 + 1) * (c + 0.5)) / (K1 + c + 0.5)
        return s

    from bm25_pagerank_rpi_spark.operators import ranking_models as rm

    got_p = {r["doc_id"]: r["score"] for r in rm.bm25_plus_score(*inputs).collect()}
    got_l = {r["doc_id"]: r["score"] for r in rm.bm25l_score(*inputs).collect()}
    assert set(got_p) == cand and set(got_l) == cand
    for d in cand:
        assert got_p[d] == pytest.approx(plus(d), abs=1e-12)
        assert got_l[d] == pytest.approx(l_(d), abs=1e-12)


def test_classic_dfi_pl2_match_oracle(inputs):
    import math

    toks = {d: t.split() for d, t in DOCS if t}
    tf = {}
    for d, ts in toks.items():
        tf[d] = {}
        for t in ts:
            tf[d][t] = tf[d].get(t, 0) + 1
    dl = {d: len(ts) for d, ts in toks.items()}
    n_docs = float(len(DOCS))  # empty doc counts toward doc_count/avgdl
    avgdl = sum(dl.values()) / n_docs
    total = float(sum(dl.values()))
    qocc = QUERY.split()
    df = {t: float(sum(1 for d in tf if t in tf[d])) for t in set(qocc)}
    ctf = {t: float(sum(tf[d].get(t, 0) for d in tf)) for t in set(qocc)}
    cand = {d for d in tf if any(t in tf[d] for t in set(qocc))}

    def classic(d):
        s = 0.0
        for t in qocc:
            if ctf[t] == 0 or t not in tf[d]:
                continue
            i = 1.0 + math.log(n_docs / (df[t] + 1.0))
            s += math.sqrt(tf[d][t]) * i * i / math.sqrt(dl[d])
        return s

    def dfi(d):
        s = 0.0
        for t in qocc:
            if ctf[t] == 0:
                continue
            f = float(tf[d].get(t, 0))
            e = dl[d] * ctf[t] / total
            if f > 0 and f > e:
                s += math.log2((f - e) / math.sqrt(e) + 1.0)
        return s

    def pl2(d, c=ranking_models.PL2_C):
        s = 0.0
        for t in qocc:
            if ctf[t] == 0 or t not in tf[d]:
                continue
            tfn = tf[d][t] * math.log2(1.0 + c * avgdl / dl[d])
            lam = ctf[t] / n_docs
            s += (1.0 / (tfn + 1.0)) * (
                tfn * math.log2(tfn / lam)
                + (lam - tfn) / math.log(2.0)
                + 0.5 * math.log2(2.0 * math.pi * tfn)
            )
        return s

    got_c = {
        r["doc_id"]: r["score"]
        for r in ranking_models.classic_tfidf_score(*inputs).collect()
    }
    got_d = {
        r["doc_id"]: r["score"]
        for r in ranking_models.dfi_score(*inputs).collect()
    }
    got_p = {
        r["doc_id"]: r["score"]
        for r in ranking_models.pl2_score(*inputs).collect()
    }
    assert set(got_c) == cand and set(got_d) == cand and set(got_p) == cand
    for d in cand:
        assert got_c[d] == pytest.approx(classic(d), abs=1e-12)
        assert got_d[d] == pytest.approx(dfi(d), abs=1e-12)
        assert got_p[d] == pytest.approx(pl2(d), abs=1e-12)
