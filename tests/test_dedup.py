"""Dedup operator semantics on hand-built corpora (NumPy/pure-Python
oracles, independent of the DuckDB driver check)."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from bm25_pagerank_rpi_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _shingles(text, n=3):
    toks = text.split()
    if not toks:
        return set()
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _jaccard(a, b):
    sa, sb = _shingles(a), _shingles(b)
    if not sa and not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    (3, "quick brown fox jumps over the lazy dog"),      # near dup (drop 1)
    (4, "an entirely different sentence about spark engines"),
    (5, "an entirely different sentence about flink engines"),
    (6, "ok"),                                           # shorter than n
    (7, "ok"),                                           # exact dup of 6
    (8, ""),                                             # empty
]


def test_exact_duplicates(spark):
    out = dedup.exact_duplicates(_docs(spark, CORPUS)).collect()
    got = {(r.doc_id, r.canonical_id) for r in out}
    assert got == {(1, 1), (2, 1), (6, 6), (7, 6)}


def test_shingles_match_python_oracle(spark):
    sh = dedup.doc_shingles(_docs(spark, CORPUS)).collect()
    got: dict[int, set] = {}
    for r in sh:
        got.setdefault(r.doc_id, set()).add(r.shingle)
    for doc_id, text in CORPUS:
        expected = _shingles(text)
        assert got.get(doc_id, set()) == expected, doc_id


def test_ngram_jaccard_pairs_exact_values(spark):
    out = dedup.ngram_jaccard_pairs(_docs(spark, CORPUS), threshold=0.2).collect()
    got = {(r.doc_a, r.doc_b): r.jaccard for r in out}
    expected = {}
    for (ia, ta), (ib, tb) in itertools.combinations(CORPUS, 2):
        j = _jaccard(ta, tb)
        if j >= 0.2 and _shingles(ta) & _shingles(tb):
            expected[(ia, ib)] = j
    assert set(got) == set(expected)
    for k, v in expected.items():
        assert got[k] == pytest.approx(v, abs=1e-12)


def test_minhash_lsh_finds_exact_and_near_dups(spark):
    out = dedup.minhash_dedup_pairs(_docs(spark, CORPUS), threshold=0.5).collect()
    pairs = {(r.doc_a, r.doc_b) for r in out}
    # exact duplicates always collide in every band
    assert (1, 2) in pairs and (6, 7) in pairs
    # jaccard values on emitted pairs are exact
    for r in out:
        ta = dict(CORPUS)[r.doc_a]
        tb = dict(CORPUS)[r.doc_b]
        assert r.jaccard == pytest.approx(_jaccard(ta, tb), abs=1e-12)
    # unrelated docs don't pair
    assert not any({a, b} == {4, 1} for a, b in pairs)


def test_simhash_identical_docs_and_bands(spark):
    sim = dedup.simhash(_docs(spark, CORPUS))
    vals = {r.doc_id: r.simhash for r in sim.collect()}
    assert vals[1] == vals[2]  # identical text -> identical simhash
    assert 0 <= vals[1] < (1 << dedup.SIMHASH_BITS)
    pairs = dedup.simhash_pairs(sim, max_hamming=3).collect()
    got = {(r.doc_a, r.doc_b): r.hamming for r in pairs}
    assert got.get((1, 2)) == 0
    assert got.get((6, 7)) == 0
    # hamming values agree with a python recomputation
    for (a, b), h in got.items():
        assert bin(vals[a] ^ vals[b]).count("1") == h


def test_simhash_banding_recall_guarantee(spark):
    """Any pair within hamming <= bands-1 shares a band chunk (pigeonhole),
    so simhash_pairs must find ALL such pairs among the corpus."""
    sim = dedup.simhash(_docs(spark, CORPUS))
    vals = {r.doc_id: r.simhash for r in sim.collect()}
    found = {
        (r.doc_a, r.doc_b)
        for r in dedup.simhash_pairs(sim, max_hamming=dedup.SIMHASH_BANDS - 1).collect()
    }
    for a, b in itertools.combinations(sorted(vals), 2):
        if bin(vals[a] ^ vals[b]).count("1") <= dedup.SIMHASH_BANDS - 1:
            assert (a, b) in found


def test_degenerate_skew_bucket_survival(spark):
    """VERDICT r2 #3 adversarial fixture: 10k near-identical docs — every
    shingle is a stop-shingle and every LSH bucket is degenerate. Both
    Jaccard paths must complete with LINEAR candidate volume instead of
    the ~5*10^7-pair explosion of uncapped all-pairs; the identity
    classes remain fully linked through exact_duplicates (hash groupBy),
    which is the right tool for mass-duplicate corpora."""
    n = 10_000
    docs = spark.range(n).selectExpr(
        "cast(id as string) as doc_id",
        "concat('the quick brown fox jumps over the lazy dog variant ',"
        " cast(id % 7 as string)) as text",
    )
    # exact dedup links all 7 identity classes in O(n)
    ex = dedup.exact_duplicates(docs)
    assert ex.count() == n
    assert ex.select("canonical_id").distinct().count() == 7
    # minhash LSH: degenerate buckets emit their star -> linear candidates
    cand = dedup.lsh_candidate_pairs(dedup.minhash_signatures(docs))
    n_cand = cand.count()
    assert 0 < n_cand < 5 * n  # not ~n^2/2 = 5*10^7
    # exact n-gram Jaccard: stop-shingles (df 10k >> cap) are dropped
    # before the self-join, so the query completes instead of exploding;
    # all-stop-shingle pairs are exact_duplicates' job (documented trade)
    assert dedup.ngram_jaccard_pairs(docs, threshold=0.7).count() == 0
    # uncapped semantics still available explicitly on small corpora
    small = docs.filter(F.col("doc_id").cast("long") < 20)
    capped = dedup.ngram_jaccard_pairs(small, threshold=0.7, max_shingle_df=None)
    assert capped.count() > 0  # identical docs rejoin at jaccard 1.0


# ---------------------------------------------------------------------------
# exact duplicated-span statistics
# ---------------------------------------------------------------------------

SPAN_CORPUS = [
    # doc 1 and 2 share the 8-token prefix; doc 1 is 10 tokens (3 spans),
    # doc 2 is exactly 8 (1 span)
    (1, "a b c d e f g h i j"),
    (2, "a b c d e f g h"),
    (3, "z y x w v u t s r q"),          # unique spans only
    (4, "short doc"),                     # < n tokens: omitted
    (5, ""),                              # empty: omitted
]


def _py_span_stats(rows, n=8):
    grams = {}
    per_doc = {}
    for doc_id, text in rows:
        toks = [t for t in text.split() if t]
        spans = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        if not spans:
            continue
        per_doc[doc_id] = spans
        for g in set(spans):
            grams.setdefault(g, set()).add(doc_id)
    out = {}
    for doc_id, spans in per_doc.items():
        dup = sum(1 for g in spans if len(grams[g]) >= 2)
        out[doc_id] = (len(spans), dup, dup / len(spans))
    return out


def test_dup_span_stats_closed_form(spark):
    got = {
        r.doc_id: (r.n_spans, r.dup_spans, r.dup_fraction)
        for r in dedup.dup_span_stats(_docs(spark, SPAN_CORPUS), n=8).collect()
    }
    want = _py_span_stats(SPAN_CORPUS, n=8)
    assert set(got) == set(want) == {1, 2, 3}
    for d in got:
        assert got[d][:2] == want[d][:2]
        assert got[d][2] == pytest.approx(want[d][2])
    # doc 1: spans at offsets 0..2; only offset 0 ("a..h") is shared
    assert got[1] == (3, 1, pytest.approx(1 / 3))
    assert got[2] == (1, 1, pytest.approx(1.0))
    assert got[3][1] == 0


def test_dup_span_stats_hashed_parity(spark):
    docs = _docs(spark, SPAN_CORPUS + [(10 + i, f"p{i} " * 12) for i in range(6)])
    s = {
        r.doc_id: (r.n_spans, r.dup_spans)
        for r in dedup.dup_span_stats(docs, n=8, hashed=False).collect()
    }
    h = {
        r.doc_id: (r.n_spans, r.dup_spans)
        for r in dedup.dup_span_stats(docs, n=8, hashed=True).collect()
    }
    assert s == h


def test_containment_directed(spark):
    from bm25_pagerank_rpi_spark.operators.dedup import ngram_containment_pairs

    docs = spark.createDataFrame(
        [
            ("small", "a b c d e"),                    # shingles fully inside big
            ("big", "x y a b c d e z w q r s t u v"),  # superset, much longer
            ("other", "p q r s t"),
        ],
        "doc_id string, text string",
    )
    rows = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in ngram_containment_pairs(docs, threshold=0.9).collect()
    }
    # small ⊂ big: containment(small in big) = 1.0; the reverse is far below
    assert rows == {("small", "big"): 1.0}


# ---------------------------------------------------------------------------
# bipartite near-dup contamination (contamination_near_dup)
# ---------------------------------------------------------------------------


def test_contamination_near_dup_bipartite(spark):
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three four five six seven eight"),
            (3, "unrelated totally different words entirely here now ok"),
        ],
        "doc_id long, text string",
    )
    eval_docs = spark.createDataFrame(
        [
            # near-copy of train doc 1 (first token dropped)
            (100, "beta gamma delta epsilon zeta eta theta"),
            # unseen benchmark doc
            (101, "completely novel benchmark question text here"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.eval_id): r.jaccard
        for r in dedup.contamination_near_dup(
            train, eval_docs, threshold=0.5
        ).collect()
    }
    assert (1, 100) in got
    # 6 shared shingles of 6 (train has 6, eval has 5, inter 5):
    # j = 5 / (6 + 5 - 5) = 5/6
    assert abs(got[(1, 100)] - 5 / 6) < 1e-12
    # no train doc flagged against the unseen eval doc
    assert all(e != 101 for _, e in got)
    # clean train docs not flagged at all
    assert all(d == 1 for d, _ in got)


def test_contamination_respects_threshold(spark):
    # the 5/6-jaccard near-copy IS an LSH candidate (most bands agree);
    # a threshold above its jaccard must filter it at the verify step
    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    eval_docs = spark.createDataFrame(
        [(100, "beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    lo = dedup.contamination_near_dup(train, eval_docs, threshold=0.5)
    got = lo.collect()
    assert len(got) == 1 and abs(got[0].jaccard - 5 / 6) < 1e-12
    hi = dedup.contamination_near_dup(train, eval_docs, threshold=0.9)
    assert hi.count() == 0


def test_contamination_low_jaccard_below_lsh_recall(spark):
    # j = 1/7: the (1-(1-j^r)^b) recall curve is ~0.2% at r=4, b=4 — a
    # low-overlap pair is NOT surfaced even at a permissive threshold
    # (that is exact-ngram contamination's job, not LSH's)
    train = spark.createDataFrame(
        [(1, "a b c d e f")], "doc_id long, text string"
    )
    eval_docs = spark.createDataFrame(
        [(9, "a b c x y z")], "doc_id long, text string"
    )
    assert dedup.contamination_near_dup(train, eval_docs, threshold=0.1).count() == 0
