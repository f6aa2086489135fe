"""Text-analysis operator semantics vs pure-Python oracles."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from bm25_pagerank_rpi_spark.operators import textstats

ROWS = [
    (1, "The quick brown fox, it jumps over the lazy dog!"),
    (2, "el perro y el gato en la casa de la abuela"),
    (3, "le chat est sur le toit de la maison pour dormir"),
    (4, "der hund und die katze sind in den garten von mir"),
    (5, "xxyy zz qq"),
    (6, ""),
    (7, "aaa aaa aaa aaa aaa aaa aaa aaa aaa aaa aaa aaa"),
]


def _docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_token_counts(spark):
    got = {r.doc_id: r for r in textstats.token_counts(_docs(spark)).collect()}
    for doc_id, text in ROWS:
        toks = text.split()
        subwords = re.findall(r"[A-Za-z0-9_]+|[^A-Za-z0-9_ \t\n]", text)
        r = got[doc_id]
        assert r.n_chars == len(text)
        assert r.n_tokens == len(toks)
        assert r.n_subwords == len(subwords)
        expect_avg = sum(map(len, toks)) / len(toks) if toks else 0.0
        assert r.avg_token_len == pytest.approx(expect_avg, abs=1e-12)


def test_quality_features(spark):
    got = {r.doc_id: r for r in textstats.quality_features(_docs(spark)).collect()}
    r = got[1]
    text = ROWS[0][1]
    toks = text.split()
    stop = sum(1 for t in toks if t.lower() in textstats.STOPWORDS["en"])
    assert r.stopword_ratio == pytest.approx(stop / len(toks), abs=1e-12)
    assert r.punct_ratio == pytest.approx(2 / len(text), abs=1e-12)  # ',' and '!'
    # repetition detector: doc 7 is one token repeated
    assert got[7].unique_token_ratio == pytest.approx(1 / 12, abs=1e-12)
    # empty doc scores 0 everywhere except punct bonus
    assert got[6].n_tokens == 0 and got[6].quality_score == pytest.approx(0.25)
    for r in got.values():
        assert 0.0 <= r.quality_score <= 1.0


def test_lang_id(spark):
    got = {r.doc_id: r.lang_pred for r in textstats.lang_id(_docs(spark)).collect()}
    assert got[1] == "en"
    assert got[2] == "es"
    assert got[3] == "fr"
    assert got[4] == "de"
    assert got[5] == "und"
    assert got[6] == "und"


def test_fingerprints_stability(spark):
    fp = {r.doc_id: r for r in textstats.fingerprints(_docs(spark)).collect()}
    # identical text -> identical hashes; distinct text -> distinct content hash
    assert fp[1].content_hash != fp[2].content_hash
    assert fp[6].min_shingle_hash is None  # empty doc has no shingles
    # near-edit stability: dropping ONE trailing token keeps min-shingle
    # hash with high probability; at minimum the column is deterministic
    again = {r.doc_id: r for r in textstats.fingerprints(_docs(spark)).collect()}
    for k in fp:
        assert fp[k].content_hash == again[k].content_hash
        assert fp[k].min_shingle_hash == again[k].min_shingle_hash


# ---------------------------------------------------------------------------
# pii_scrub / dataset_split
# ---------------------------------------------------------------------------


def test_pii_scrub_redacts_and_counts(spark):
    from bm25_pagerank_rpi_spark.operators import textstats as ts

    docs = spark.createDataFrame(
        [
            (1, "mail bob@example.com and sue@test.org end"),
            (2, "ssn 123-45-6789 phone (555) 123-4567"),
            (3, "server 10.0.0.1 clean text"),
            (4, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in ts.pii_scrub(docs).collect()}
    assert got[1].n_email == 2 and "[EMAIL]" in got[1].text_redacted
    assert "bob@example.com" not in got[1].text_redacted
    assert got[2].n_ssn == 1 and got[2].n_phone == 1
    assert "[SSN]" in got[2].text_redacted and "[PHONE]" in got[2].text_redacted
    assert got[3].n_ipv4 == 1 and "[IP]" in got[3].text_redacted
    assert got[4].text_redacted == "nothing sensitive here"
    assert (got[4].n_email, got[4].n_ipv4, got[4].n_ssn, got[4].n_phone) == (0, 0, 0, 0)


def test_dataset_split_deterministic_and_proportional(spark):
    from bm25_pagerank_rpi_spark.operators import textstats as ts

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r.doc_id: r.split for r in ts.dataset_split(df, w).collect()}
    b = {r.doc_id: r.split for r in ts.dataset_split(df.repartition(7), w).collect()}
    assert a == b  # pure function of (salt, id): partitioning-independent
    from collections import Counter

    c = Counter(a.values())
    assert abs(c["train"] / 2000 - 0.8) < 0.03
    assert abs(c["val"] / 2000 - 0.1) < 0.02
    assert abs(c["test"] / 2000 - 0.1) < 0.02
    # growing the corpus never reassigns an existing row
    big = {
        r.doc_id: r.split
        for r in ts.dataset_split(
            spark.range(0, 4000).withColumnRenamed("id", "doc_id"), w
        ).collect()
    }
    assert all(big[d] == s for d, s in a.items())


def _py_ngrams(toks, n):
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def test_repetition_features(spark):
    got = {
        r.doc_id: r
        for r in textstats.repetition_features(_docs(spark)).collect()
    }
    from collections import Counter

    for doc_id, text in ROWS:
        toks = text.split()
        r = got[doc_id]
        assert r.n_tokens == len(toks)
        dup_tok = (len(toks) - len(set(toks))) / len(toks) if toks else 0.0
        assert r.dup_token_frac == pytest.approx(dup_tok, abs=1e-12)
        g2 = Counter(_py_ngrams(toks, 2))
        top2 = max(g2.values()) / sum(g2.values()) if g2 else 0.0
        assert r.top_bigram_frac == pytest.approx(top2, abs=1e-12)
        g3 = Counter(_py_ngrams(toks, 3))
        dup3 = (
            sum(c for c in g3.values() if c > 1) / sum(g3.values()) if g3 else 0.0
        )
        assert r.dup_trigram_frac == pytest.approx(dup3, abs=1e-12)
    # the degenerate all-same doc is maximally repetitive
    assert got[7].dup_token_frac == pytest.approx(11 / 12, abs=1e-12)
    assert got[7].top_bigram_frac == 1.0 and got[7].dup_trigram_frac == 1.0


def test_ngram_contamination(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g"),          # contains bench 5-gram "c d e f g"
            (2, "x y z w v u"),            # no overlap
            (3, "c d e f g h"),            # shares "c d e f g"
            (4, "too short"),              # < n tokens
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "q q c d e f g q q")], "doc_id long, text string"
    )
    got = {
        r.doc_id: r
        for r in textstats.ngram_contamination(docs, bench, n=5).collect()
    }
    assert got[1].n_ngrams == 3 and got[1].n_contaminated == 1
    assert got[1].contamination_frac == pytest.approx(1 / 3, abs=1e-12)
    assert got[2].n_contaminated == 0 and got[2].contamination_frac == 0.0
    assert got[3].n_ngrams == 2 and got[3].n_contaminated == 1
    assert got[4].n_ngrams == 0 and got[4].contamination_frac == 0.0
    # a doc IS its own contamination if it appears in the benchmark
    self_hit = textstats.ngram_contamination(bench, bench, n=5).collect()[0]
    assert self_hit.contamination_frac == 1.0


class TestLmCrossEntropy:
    def test_closed_form(self, spark):
        import math

        docs = spark.createDataFrame(
            [("d1", "a b a b"), ("d2", "a b c")], "doc_id string, text string"
        )
        got = {
            r.doc_id: (r.n_bigrams, r.cross_entropy)
            for r in textstats.lm_cross_entropy(docs).collect()
        }
        # corpus model: C(a,b)=3 C(b,a)=1 C(b,c)=1; contexts a·=3 b·=2; V=3
        p_ab = (3 + 1) / (3 + 3)
        p_ba = (1 + 1) / (2 + 3)
        p_bc = (1 + 1) / (2 + 3)
        want_d1 = -(2 * math.log(p_ab) + math.log(p_ba)) / 3
        want_d2 = -(math.log(p_ab) + math.log(p_bc)) / 2
        assert got["d1"][0] == 3 and got["d2"][0] == 2
        assert got["d1"][1] == pytest.approx(want_d1, rel=1e-12)
        assert got["d2"][1] == pytest.approx(want_d2, rel=1e-12)

    def test_short_docs_absent_and_boilerplate_scores_low(self, spark):
        rows = [("one", "solo")] + [
            (f"b{i}", "the same boilerplate line here") for i in range(20)
        ] + [("odd", "qq zz vv kk pp")]
        docs = spark.createDataFrame(rows, "doc_id string, text string")
        out = {r.doc_id: r.cross_entropy
               for r in textstats.lm_cross_entropy(docs).collect()}
        assert "one" not in out  # < 2 tokens -> no bigrams
        # the repeated boilerplate is maximally typical; the line noise is not
        assert out["b0"] < out["odd"]


class TestDatasetMixAndPacking:
    def test_mix_rates_and_determinism(self, spark):
        rows = [(i, "en" if i % 3 == 0 else ("de" if i % 3 == 1 else "fr"))
                for i in range(3000)]
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        out = textstats.dataset_mix(
            df, {"en": 1.0, "de": 0.5, "fr": 0.0}, group_col="lang",
            default_rate=0.0,
        )
        got = {(r.doc_id, r.lang) for r in out.collect()}
        got2 = {(r.doc_id, r.lang) for r in out.collect()}
        assert got == got2  # deterministic
        en = {g for g in got if g[1] == "en"}
        de = {g for g in got if g[1] == "de"}
        fr = {g for g in got if g[1] == "fr"}
        assert len(en) == 1000 and len(fr) == 0
        assert 0.35 * 1000 < len(de) < 0.65 * 1000
        # monotone: raising a rate only ADDS rows (subset property)
        bigger = {
            (r.doc_id, r.lang)
            for r in textstats.dataset_mix(
                df, {"en": 1.0, "de": 0.8, "fr": 0.0}, group_col="lang"
            ).collect()
        }
        assert got <= bigger

    def test_pack_shards_matches_sequential_oracle(self, spark):
        import hashlib

        rows = [(f"d{i}", "tok " * (i % 37 + 1)) for i in range(500)]
        df = spark.createDataFrame(rows, "doc_id string, text string")
        budget = 300
        got = {r.doc_id: (r.n_tokens, r.shard_id)
               for r in textstats.pack_shards(df, budget).collect()}

        def phash_py(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

        seq = sorted(
            ((phash_py(f"pack-v1-{d}"), d, len(t.split())) for d, t in rows)
        )
        cum, want = 0, {}
        for _k, d, n in seq:
            want[d] = (n, cum // budget)
            cum += n
        assert got == want
        # shards fill to budget: every shard's token total reaches the
        # budget before the next shard starts (can overflow by one doc)
        totals: dict[int, int] = {}
        for n, s in got.values():
            totals[s] = totals.get(s, 0) + n
        last = max(totals)
        for s, tot in totals.items():
            if s != last:
                assert tot + max(n for n, _ in got.values()) > budget


class TestBpePieceCounts:
    def test_matches_python_re(self, spark):
        import re

        rows = [
            (1, "hello world's 3rd test-case!!  x9"),
            (2, "it'll re've 'quote' a,b;c"),
            (3, ""),
            (4, "  lead tab\tnew\nline"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: (r.n_pieces, r.chars_per_piece)
               for r in textstats.bpe_piece_counts(docs).collect()}
        for did, text in rows:
            want = len(re.findall(textstats.BPE_PIECE_RE, text))
            assert got[did][0] == want, (did, text)
            if want:
                assert got[did][1] == pytest.approx(len(text) / want)
            else:
                assert got[did][1] == 0.0


def test_quality_stratified_sample(spark):
    import pytest

    from bm25_pagerank_rpi_spark.operators import textstats as ts

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * 3) for i in range(20)]
        + [(100 + i, "zzz qqq xxx unusual words here %d" % i) for i in range(20)]
        + [(900, "short")],  # < 2 tokens -> unscorable, tail bucket
        "doc_id long, text string",
    )
    ce = {
        r["doc_id"]: r["cross_entropy"]
        for r in ts.lm_cross_entropy(docs).collect()
    }
    bound = sorted(ce.values())[len(ce) // 2]
    rows = ts.quality_stratified_sample(docs, [bound], [1.0, 0.0]).collect()
    kept = {r["doc_id"] for r in rows}
    # rate-1.0 bucket keeps ALL its docs, rate-0 bucket and the
    # unscorable doc (tail) keep none
    expect = {d for d, v in ce.items() if v < bound}
    assert kept == expect
    assert 900 not in kept
    # unscorable doc lands in the last bucket with NULL ce when kept
    rows2 = ts.quality_stratified_sample(docs, [bound], [0.0, 1.0]).collect()
    by_id = {r["doc_id"]: r for r in rows2}
    assert 900 in by_id
    assert by_id[900]["cross_entropy"] is None
    assert by_id[900]["bucket"] == 1
    # monotone: a lower-rate sample is a subset of a higher-rate one
    lo = {
        r["doc_id"]
        for r in ts.quality_stratified_sample(docs, [bound], [0.3, 0.3]).collect()
    }
    hi = {
        r["doc_id"]
        for r in ts.quality_stratified_sample(docs, [bound], [0.8, 0.8]).collect()
    }
    assert lo <= hi
    with pytest.raises(ValueError):
        ts.quality_stratified_sample(docs, [bound], [1.0])


# ---------------------------------------------------------------------------
# DSIR importance selection (dsir_importance / dsir_topk)
# ---------------------------------------------------------------------------


def test_dsir_prefers_target_like_docs(spark):
    from bm25_pagerank_rpi_spark.operators.textstats import dsir_topk

    rows = [
        # target domain: talks about "code bug fix"
        (1, "code bug fix code", "tgt"),
        (2, "bug fix code patch", "tgt"),
        # raw pool: one target-like doc, one off-domain doc
        (3, "code bug fix", "raw"),
        (4, "pasta recipe basil pasta", "raw"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = dsir_topk(docs, F.col("source") == "tgt", k=10)
    ranked = [r.doc_id for r in got.orderBy("rank").collect()]
    # target-like raw doc must outrank the off-domain doc
    assert ranked.index(3) < ranked.index(4)
    w = {r.doc_id: r.weight for r in got.collect()}
    assert w[3] > 0 > w[4]


def test_dsir_importance_closed_form(spark):
    import math

    from bm25_pagerank_rpi_spark.operators.textstats import dsir_importance

    rows = [(1, "a a b", True), (2, "b c", False)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    got = {
        r.doc_id: r.weight
        for r in dsir_importance(docs, F.col("tgt")).collect()
    }
    # raw: a=2 b=2 c=1 (R=5), tgt: a=2 b=1 c=0 (T=3), V=3, alpha=1
    def lr(t, r):
        return math.log((t + 1) / (3 + 3)) - math.log((r + 1) / (5 + 3))

    exp1 = 2 * lr(2, 2) + 1 * lr(1, 2)
    exp2 = 1 * lr(1, 2) + 1 * lr(0, 1)
    assert abs(got[1] - exp1) < 1e-12
    assert abs(got[2] - exp2) < 1e-12


def test_weighted_sample_properties(spark):
    from pyspark.sql import functions as F

    from bm25_pagerank_rpi_spark.operators import textstats

    df = spark.createDataFrame(
        [(i, 10.0 if i < 5 else 0.1) for i in range(100)]
        + [(200, 0.0), (201, -1.0)],
        "doc_id long, w double",
    )
    out = textstats.weighted_sample(df, "w", k=10).collect()
    assert len(out) == 10
    ids = [r.doc_id for r in out]
    # zero/negative weights can never be drawn
    assert 200 not in ids and 201 not in ids
    # heavy weights (w=10 vs 0.1) dominate the sample: all 5 heavy rows in
    picked_heavy = sum(1 for i in ids if i < 5)
    assert picked_heavy == 5
    # ranks are 1..10, keys non-increasing
    assert [r.rank for r in sorted(out, key=lambda r: r.rank)] == list(range(1, 11))
    keys = [r.wkey for r in sorted(out, key=lambda r: r.rank)]
    assert all(a >= b for a, b in zip(keys, keys[1:]))
    # determinism: same salt -> identical sample; different salt -> different keys
    again = [r.doc_id for r in textstats.weighted_sample(df, "w", k=10).collect()]
    assert again == ids
    other = {r.doc_id: r.wkey for r in
             textstats.weighted_sample(df, "w", k=10, salt="other").collect()}
    first = {r.doc_id: r.wkey for r in out}
    assert other != first
