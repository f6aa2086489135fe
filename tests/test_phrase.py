"""Phrase search: Catalyst sliding-window counts vs a Python oracle, and
raw-text vs positional-index path parity (SURVEY.md §5 test strategy:
every operator gets an independent oracle + a cross-path parity pin)."""

from __future__ import annotations

import math

import pytest

from bm25_pagerank_rpi_spark import B, K1
from bm25_pagerank_rpi_spark.operators import phrase, scorer
from bm25_pagerank_rpi_spark.plans.index_build import build_index
from tests.conftest import make_corpus
from tests.test_index_build import transcripts_df


def _docs_df(spark, texts: dict[str, str]):
    return spark.createDataFrame(
        sorted(texts.items()), "doc_id string, text string"
    )


def _py_phrase_tf(text: str, terms: list[str]) -> int:
    toks = text.split()
    n = len(terms)
    return sum(
        1 for i in range(len(toks) - n + 1) if toks[i : i + n] == terms
    )


def test_phrase_tf_handcrafted(spark):
    texts = {
        "d1": "a b c a b",      # "a b" twice (start + interior)
        "d2": "x a b",          # at end
        "d3": "a a a",          # overlapping "a a" -> 2
        "d4": "b a",            # reversed, no match
        "d5": "a",              # shorter than phrase
        "d6": "",               # empty doc
        "d7": "a b",            # exact doc == phrase
    }
    df = _docs_df(spark, texts)
    got = {
        r.doc_id: r.phrase_tf
        for r in phrase.phrase_match(df, ["a", "b"]).collect()
    }
    assert got == {"d1": 2, "d2": 1, "d7": 1}
    got_aa = {
        r.doc_id: r.phrase_tf
        for r in phrase.phrase_match(df, ["a", "a"]).collect()
    }
    assert got_aa == {"d3": 2}
    # single-term phrase == plain term frequency
    got_a = {
        r.doc_id: r.phrase_tf for r in phrase.phrase_match(df, ["a"]).collect()
    }
    assert got_a == {"d1": 2, "d2": 1, "d3": 3, "d4": 1, "d5": 1, "d7": 1}
    # absent phrase -> empty result
    assert phrase.phrase_match(df, ["zz", "qq"]).count() == 0
    with pytest.raises(ValueError):
        phrase.phrase_match(df, [])


def test_phrase_tf_matches_python_oracle(spark, corpus):
    df = _docs_df(spark, corpus)
    # pick phrases that actually occur: bigrams/trigram from the corpus
    sample_texts = [t for t in corpus.values() if len(t.split()) >= 3]
    t0 = sample_texts[0].split()
    phrases = [t0[:2], t0[1:3], t0[:3], ["hello,", "world!"]]
    for terms in phrases:
        expect = {
            d: _py_phrase_tf(t, terms)
            for d, t in corpus.items()
            if _py_phrase_tf(t, terms) > 0
        }
        got = {
            r.doc_id: r.phrase_tf
            for r in phrase.phrase_match(df, terms).collect()
        }
        assert got == expect, terms


def test_phrase_topk_scoring(spark):
    texts = {f"d{i}": "w x " * (i + 1) + "pad " * i for i in range(5)}
    texts["nomatch"] = "x w x w"  # "w x" never consecutive left-to-right? it is: x [w x] w
    df = _docs_df(spark, texts)
    out = phrase.phrase_topk(df, ["w", "x"], k=3).collect()
    assert [r.rank for r in out] == [1, 2, 3]
    # score oracle in pure python
    lens = {d: len(t.split()) for d, t in texts.items()}
    tfs = {d: _py_phrase_tf(t, ["w", "x"]) for d, t in texts.items()}
    matched = {d: tf for d, tf in tfs.items() if tf > 0}
    n, avgdl = len(texts), sum(lens.values()) / len(texts)
    idf = math.log(n / (len(matched) + 1))
    def score(d):
        tf, dl = matched[d], lens[d]
        return idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / avgdl))
    expect = sorted(matched, key=lambda d: (-score(d), d))[:3]
    assert [r.doc_id for r in out] == expect
    for r in out:
        assert abs(r.bm25 - score(r.doc_id)) < 1e-12


@pytest.fixture(scope="module")
def pos_index(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pos_index"))
    return build_index(
        spark,
        transcripts_df(spark, corpus),
        out,
        n_buckets=8,
        block_size=16,
        range_rows=32,
        with_positions=True,
    )


def test_phrase_index_parity(spark, corpus, pos_index):
    """Raw-text path and positional-index path must agree exactly."""
    df = _docs_df(spark, corpus)
    sample = [t for t in corpus.values() if len(t.split()) >= 3][1].split()
    for terms in (sample[:2], sample[:3], [sample[0]]):
        raw = {
            (r.doc_id, r.phrase_tf): r.bm25
            for r in phrase.phrase_topk(df, terms, k=1000).collect()
        }
        idx = {
            (r.doc_id, r.phrase_tf): r.bm25
            for r in phrase.phrase_topk_from_index(pos_index, terms, k=1000).collect()
        }
        assert set(raw) == set(idx), terms
        for key, v in raw.items():
            assert abs(v - idx[key]) <= 1e-12


def test_phrase_duplicate_term_from_index(spark, pos_index):
    """Duplicate-term phrases intersect one positions list at two offsets."""
    # find a doc with a repeated consecutive token in the corpus
    corpus = make_corpus()
    dup_terms = None
    for text in corpus.values():
        toks = text.split()
        for a, b in zip(toks, toks[1:]):
            if a == b:
                dup_terms = [a, a]
                break
        if dup_terms:
            break
    if dup_terms is None:
        pytest.skip("seeded corpus has no consecutive duplicate token")
    df = _docs_df(spark, corpus)
    raw = {(r.doc_id, r.phrase_tf) for r in phrase.phrase_topk(df, dup_terms, k=1000).collect()}
    idx = {
        (r.doc_id, r.phrase_tf)
        for r in phrase.phrase_topk_from_index(pos_index, dup_terms, k=1000).collect()
    }
    assert raw == idx and raw


def test_phrase_requires_positions(spark, corpus, tmp_path):
    cat = build_index(
        spark, transcripts_df(spark, corpus), str(tmp_path / "nopos"),
        n_buckets=4, block_size=16, range_rows=32,
    )
    with pytest.raises(ValueError, match="positions"):
        phrase.phrase_topk_from_index(cat, ["a", "b"])


# ---------------------------------------------------------------------------
# proximity (minimal covering span)
# ---------------------------------------------------------------------------


def test_proximity_min_span_closed_form(spark):
    from bm25_pagerank_rpi_spark.operators.phrase import proximity_topk

    docs = spark.createDataFrame(
        [
            ("d1", "a x x b"),             # span a..b = 4
            ("d2", "b a"),                 # unordered: span 2
            ("d3", "a x x x x x x x b"),   # span 9 (> window)
            ("d4", "a a b a"),             # best span = 2 ("b a" / "a b"? -> a@1,b@2)
            ("d5", "a only"),              # missing b -> no match
            ("d6", "b b b"),               # missing a -> no match
        ],
        "doc_id string, text string",
    )
    got = {r.doc_id: r for r in proximity_topk(docs, ["a", "b"], window=5).collect()}
    assert set(got) == {"d1", "d2", "d4"}
    assert got["d1"].min_span == 4
    assert got["d2"].min_span == 2
    assert got["d4"].min_span == 2
    # rank: tightest first, doc_id tie-break
    assert got["d2"].rank == 1 and got["d4"].rank == 2 and got["d1"].rank == 3
    # single-term proximity degenerates to presence with span 1
    one = {r.doc_id: r.min_span for r in proximity_topk(docs, ["b"], window=1).collect()}
    assert one == {"d1": 1, "d2": 1, "d3": 1, "d4": 1, "d6": 1}


def test_proximity_index_path_parity(spark, corpus, tmp_path):
    from bm25_pagerank_rpi_spark.operators.phrase import (
        proximity_topk,
        proximity_topk_from_index,
    )

    cat = build_index(
        spark,
        transcripts_df(spark, corpus),
        str(tmp_path / "pidx"),
        n_buckets=4,
        block_size=8,
        range_rows=16,
        with_positions=True,
    )
    docs = spark.createDataFrame(
        list(corpus.items()), "doc_id string, text string"
    )
    # pick two terms that co-occur in this seeded corpus
    terms = ["hello,", "world!"]
    raw = {(r.doc_id, r.min_span) for r in proximity_topk(docs, terms, window=30, k=50).collect()}
    idx = {(r.doc_id, r.min_span) for r in proximity_topk_from_index(cat, terms, window=30, k=50).collect()}
    assert raw == idx


def test_ordered_span_closed_form(spark):
    from bm25_pagerank_rpi_spark.operators.phrase import ordered_span_topk

    docs = spark.createDataFrame(
        [
            ("d1", "a x x b"),            # ordered a..b span 4
            ("d2", "b a"),                # wrong order -> no match
            ("d3", "a b x a x x b"),      # best ordered span: a@3,b@6 -> 4? no: a@0,b@1 -> 2
            ("d4", "b a b"),              # a@1,b@2 -> 2
            ("d5", "a only"),
            ("d6", "a a a"),              # missing b
        ],
        "doc_id string, text string",
    )
    got = {
        r.doc_id: r
        for r in ordered_span_topk(docs, ["a", "b"], window=5).collect()
    }
    assert set(got) == {"d1", "d3", "d4"}
    assert got["d1"].min_span == 4
    assert got["d3"].min_span == 2
    assert got["d4"].min_span == 2
    # duplicate sequence elements need DISTINCT occurrences, in order
    dup = {
        r.doc_id: r.min_span
        for r in ordered_span_topk(docs, ["a", "a"], window=5).collect()
    }
    assert dup == {"d3": 4, "d6": 2}


def test_ordered_span_vs_unordered(spark):
    from bm25_pagerank_rpi_spark.operators.phrase import (
        ordered_span_topk,
        proximity_topk,
    )

    docs = spark.createDataFrame(
        [("d1", "b x a"), ("d2", "a x b")], "doc_id string, text string"
    )
    unord = {r.doc_id for r in proximity_topk(docs, ["a", "b"], window=5).collect()}
    order = {r.doc_id for r in ordered_span_topk(docs, ["a", "b"], window=5).collect()}
    assert unord == {"d1", "d2"}
    assert order == {"d2"}


def test_ordered_span_index_path_parity(spark, corpus, tmp_path):
    from bm25_pagerank_rpi_spark.operators.phrase import (
        ordered_span_topk,
        ordered_span_topk_from_index,
    )

    cat = build_index(
        spark,
        transcripts_df(spark, corpus),
        str(tmp_path / "ospan_idx"),
        n_buckets=4,
        block_size=8,
        range_rows=16,
        with_positions=True,
    )
    docs = spark.createDataFrame(
        list(corpus.items()), "doc_id string, text string"
    )
    terms = ["hello,", "world!"]
    raw = {(r.doc_id, r.min_span) for r in ordered_span_topk(docs, terms, window=30, k=50).collect()}
    idx = {(r.doc_id, r.min_span) for r in ordered_span_topk_from_index(cat, terms, window=30, k=50).collect()}
    assert raw == idx


# ---------------------------------------------------------------------------
# phrase_prefix_topk (match_phrase_prefix)
# ---------------------------------------------------------------------------


def test_phrase_prefix_counts_expansions(spark):
    from bm25_pagerank_rpi_spark.operators.phrase import phrase_prefix_topk

    rows = [
        (1, "hash table hash the hash x"),  # 2 windows: table, the
        (2, "hash join"),                   # no t-expansion
        (3, "table hash"),                  # wrong order
        (4, "hash t"),                      # bare 't' matches prefix 't'
        (5, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in phrase_prefix_topk(docs, ["hash"], "t", k=10).collect()}
    assert set(got) == {1, 4}
    assert got[1].phrase_tf == 2
    assert got[4].phrase_tf == 1


def test_phrase_prefix_overlapping_and_short(spark):
    from bm25_pagerank_rpi_spark.operators.phrase import phrase_prefix_topk

    rows = [(1, "a ta ta"), (2, "ta")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # fixed [] is invalid shape here (needs >= 1 window slot) -- use
    # single fixed term 'ta' with prefix 'ta': "ta ta" window in doc 1
    got = {r.doc_id: r for r in phrase_prefix_topk(docs, ["ta"], "ta", k=10).collect()}
    assert set(got) == {1}
    assert got[1].phrase_tf == 1  # doc 2 is shorter than the window


def test_phrase_prefix_empty_prefix_raises(spark):
    import pytest

    from bm25_pagerank_rpi_spark.operators.phrase import phrase_prefix_topk

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        phrase_prefix_topk(docs, ["a"], "", k=5)
