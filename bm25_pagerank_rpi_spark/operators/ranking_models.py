"""Alternative ranking similarities: query-likelihood language models.

Lucene/Elasticsearch let an index swap BM25 for LMDirichletSimilarity or
LMJelinekMercerSimilarity per field; a user switching from the reference
engine to this repo gets the same menu. Both models score the SAME
disjunctive candidate set the exact BM25 scorer uses (docs holding >= 1
query-term posting — the S1/S2 posting-fetch contract,
/root/reference/internal/ranking/data_getters.go:17-40), so the candidate
relations (doc_tf, doc_lengths) and the broadcast-query-terms join shape
are shared with operators/scorer.py and inherit its plan properties: one
hash agg per relation, broadcast stats, a single per-query window for the
final top-k. Nothing here shuffles more than bm25_topk does.

Model definitions (Zhai & Lafferty 2001, "A Study of Smoothing Methods
for Language Models Applied to Ad Hoc Information Retrieval"):

- Dirichlet: per query occurrence t (duplicates kept, multiplicity
  matters — same convention as A7 BM25) whose term exists in the
  collection,
      contrib = ln(1 + tf(t,d) / (mu * p(t|C))) + ln(mu / (dl + mu))
  with p(t|C) = ctf(t) / total_tokens. Occurrences of terms absent from
  the collection are skipped (the missing-idf analogue). tf(t,d) = 0
  occurrences contribute only the length normalizer.
- Jelinek-Mercer: contrib = ln(1 + ((1-lam)/lam) * (tf(t,d)/dl) / p(t|C));
  tf=0 occurrences contribute ln(1) = 0, dl=0 docs contribute 0.

Scores are 6-dp-rounded BEFORE the rank window so tie-breaks are
engine-portable (the repo-wide oracle convention).

100-TB notes: ctf/total_tokens are one broadcastable vocabulary-sized
aggregate restricted to the query's distinct terms (broadcast semi-join
prunes the agg input exactly like term_idf); candidates shuffle once on
doc_id; the rank window is per-query WindowGroupLimit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import scorer

MU = 2000.0
LAMBDA = 0.1


def _occ(
    doc_tf: DataFrame,
    doc_len: DataFrame,
    queries: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """Shared occurrence relation: (query_id, pos, term, doc_id, tf, dl,
    ctf, total_tokens) for every (query occurrence x candidate doc), plus
    the 1-row collection stats. Terms with zero collection frequency are
    dropped (inner join on ctf)."""
    qocc = scorer.query_term_occurrences(queries)
    qterms = qocc.select("term").distinct()
    coll = doc_len.agg(F.sum("doc_length").cast("double").alias("total_tokens"))
    ctf = (
        doc_tf.join(F.broadcast(qterms), "term")
        .groupBy("term")
        .agg(F.sum("tf").cast("double").alias("ctf"))
    )
    cand = (
        doc_tf.join(F.broadcast(qocc.select("query_id", "term").distinct()), "term")
        .select("query_id", "doc_id")
        .distinct()
    )
    occ = (
        qocc.join(F.broadcast(ctf), "term")
        .join(cand, "query_id")
        .join(
            doc_tf.select("doc_id", "term", "tf"),
            ["doc_id", "term"],
            "left",
        )
        .join(doc_len, "doc_id")
        .crossJoin(F.broadcast(coll))
        .select(
            "query_id",
            "doc_id",
            "pos",
            "term",
            F.coalesce("tf", F.lit(0)).cast("double").alias("tf"),
            F.col("doc_length").cast("double").alias("dl"),
            "ctf",
            "total_tokens",
        )
    )
    return occ, coll


def lmdir_score(
    doc_tf: DataFrame,
    doc_len: DataFrame,
    queries: DataFrame,
    mu: float = MU,
) -> DataFrame:
    """(query_id, doc_id, score) under Dirichlet-smoothed query likelihood."""
    occ, _ = _occ(doc_tf, doc_len, queries)
    contrib = F.log(
        F.lit(1.0) + F.col("tf") / (F.lit(mu) * F.col("ctf") / F.col("total_tokens"))
    ) + F.log(F.lit(mu) / (F.col("dl") + F.lit(mu)))
    return (
        occ.select("query_id", "doc_id", contrib.alias("c"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("c").alias("score"))
    )


def lmjm_score(
    doc_tf: DataFrame,
    doc_len: DataFrame,
    queries: DataFrame,
    lam: float = LAMBDA,
) -> DataFrame:
    """(query_id, doc_id, score) under Jelinek-Mercer query likelihood."""
    occ, _ = _occ(doc_tf, doc_len, queries)
    ratio = F.when(
        (F.col("dl") > 0) & (F.col("tf") > 0),
        (F.lit((1.0 - lam) / lam) * (F.col("tf") / F.col("dl")))
        / (F.col("ctf") / F.col("total_tokens")),
    ).otherwise(F.lit(0.0))
    contrib = F.log(F.lit(1.0) + ratio)
    return (
        occ.select("query_id", "doc_id", contrib.alias("c"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("c").alias("score"))
    )


def topk(scored: DataFrame, k: int, score_col: str = "score") -> DataFrame:
    """Per-query top-k on the 6-dp-rounded score, doc_id-asc tie-break."""
    r = F.round(F.col(score_col), 6)
    w = Window.partitionBy("query_id").orderBy(r.desc(), F.col("doc_id").asc())
    return (
        scored.select("query_id", "doc_id", r.alias(score_col))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# Lower-bounded BM25 variants (Lv & Zhai 2011, CIKM: "Lower-Bounding Term
# Frequency Normalization") — the BM25+ / BM25L menu Lucene exposes.
# ---------------------------------------------------------------------------

DELTA_PLUS = 1.0
DELTA_L = 0.5


def _idf_occ(
    doc_tf: DataFrame, doc_len: DataFrame, queries: DataFrame
) -> DataFrame:
    """(query_id, pos, term, doc_id, tf, dl, avgdl, idf) per (query
    occurrence x candidate doc), occurrences of idf-less terms dropped —
    the A7 candidate/multiplicity contract with idf attached."""
    from .. import B, K1  # noqa: F401  (documented constants live here)
    from . import scorer as _s

    qocc = _s.query_term_occurrences(queries)
    qterms = qocc.select("term").distinct()
    stats = _s.corpus_stats(doc_len)
    idf = _s.term_idf(doc_tf, stats, terms=qterms)
    cand = (
        doc_tf.join(F.broadcast(qocc.select("query_id", "term").distinct()), "term")
        .select("query_id", "doc_id")
        .distinct()
    )
    return (
        qocc.join(F.broadcast(idf.select("term", "idf")), "term")
        .join(cand, "query_id")
        .join(doc_tf.select("doc_id", "term", "tf"), ["doc_id", "term"], "left")
        .join(doc_len, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            "pos",
            "term",
            F.coalesce("tf", F.lit(0)).cast("double").alias("tf"),
            F.col("doc_length").cast("double").alias("dl"),
            F.col("avg_doc_length").alias("avgdl"),
            "idf",
        )
    )


def bm25_plus_score(
    doc_tf: DataFrame,
    doc_len: DataFrame,
    queries: DataFrame,
    k1: float | None = None,
    b: float | None = None,
    delta: float = DELTA_PLUS,
) -> DataFrame:
    """BM25+: matched occurrences gain a flat lower bound delta inside
    the idf product — contribution = idf * (tf*(k1+1)/(tf + k1*norm) +
    delta) for tf > 0, exactly 0 for tf = 0 (missing terms score
    nothing, same as A7). Fixes BM25's over-penalization of long docs."""
    from .. import B, K1

    k1 = K1 if k1 is None else k1
    b = B if b is None else b
    occ = _idf_occ(doc_tf, doc_len, queries)
    norm = F.lit(1.0 - b) + F.lit(b) * (F.col("dl") / F.col("avgdl"))
    contrib = F.when(
        F.col("tf") > 0,
        F.col("idf")
        * (
            (F.col("tf") * F.lit(k1 + 1.0)) / (F.col("tf") + F.lit(k1) * norm)
            + F.lit(delta)
        ),
    ).otherwise(F.lit(0.0))
    return (
        occ.select("query_id", "doc_id", contrib.alias("c"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("c").alias("score"))
    )


def classic_tfidf_score(
    doc_tf: DataFrame,
    doc_len: DataFrame,
    queries: DataFrame,
) -> DataFrame:
    """Lucene ClassicSimilarity (pre-BM25 default TFIDFSimilarity):
    contribution per matched query occurrence = sqrt(tf) * idf_c^2 /
    sqrt(dl) with idf_c = 1 + ln(N/(df+1)) — idf squared because the
    classic formula weights BOTH the query and document vectors by idf;
    1/sqrt(dl) is lengthNorm. queryNorm/coord were removed in Lucene 7
    and are omitted here too (they don't change ranking). Occurrences of
    terms absent from the collection are skipped (repo A7 convention);
    tf = 0 occurrences contribute 0."""
    occ = _stats_occ(doc_tf, doc_len, queries)
    idf_c = F.lit(1.0) + F.log(F.col("doc_count") / (F.col("df") + F.lit(1.0)))
    contrib = F.when(
        F.col("tf") > 0,
        F.sqrt(F.col("tf")) * idf_c * idf_c / F.sqrt(F.col("dl")),
    ).otherwise(F.lit(0.0))
    return (
        occ.select("query_id", "doc_id", contrib.alias("c"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("c").alias("score"))
    )


def dfi_score(
    doc_tf: DataFrame,
    doc_len: DataFrame,
    queries: DataFrame,
) -> DataFrame:
    """Lucene DFISimilarity with standardized independence (Kocabas &
    Dincer 2014, "A nonparametric term weighting method for information
    retrieval based on measuring the divergence from independence"):
    expected tf under independence e = dl * ctf / total_tokens; matched
    occurrences with tf > e contribute log2((tf - e)/sqrt(e) + 1);
    occurrences at or below expectation contribute 0 (Lucene's documented
    saturation — frequencies explained by chance score nothing)."""
    occ = _stats_occ(doc_tf, doc_len, queries)
    e = F.col("dl") * F.col("ctf") / F.col("total_tokens")
    contrib = F.when(
        (F.col("tf") > 0) & (F.col("tf") > e),
        F.log2((F.col("tf") - e) / F.sqrt(e) + F.lit(1.0)),
    ).otherwise(F.lit(0.0))
    return (
        occ.select("query_id", "doc_id", contrib.alias("c"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("c").alias("score"))
    )


PL2_C = 1.0


def pl2_score(
    doc_tf: DataFrame,
    doc_len: DataFrame,
    queries: DataFrame,
    c: float = PL2_C,
) -> DataFrame:
    """Terrier's default DFR model PL2 (Amati & van Rijsbergen 2002:
    Poisson randomness, Laplace after-effect, normalization 2):
    tfn = tf * log2(1 + c * avgdl / dl), lambda = ctf / N, contribution
    per matched occurrence =
        (1/(tfn+1)) * (tfn*log2(tfn/lambda) + (lambda - tfn)*log2(e)
                       + 0.5*log2(2*pi*tfn)).
    tf = 0 occurrences contribute 0; terms absent from the collection
    are skipped (inner ctf join)."""
    import math

    occ = _stats_occ(doc_tf, doc_len, queries)
    tfn = F.col("tf") * F.log2(
        F.lit(1.0) + F.lit(c) * F.col("avgdl") / F.col("dl")
    )
    lam = F.col("ctf") / F.col("doc_count")
    log2e = F.lit(1.0 / math.log(2.0))
    contrib = F.when(
        F.col("tf") > 0,
        (F.lit(1.0) / (tfn + F.lit(1.0)))
        * (
            tfn * F.log2(tfn / lam)
            + (lam - tfn) * log2e
            + F.lit(0.5) * F.log2(F.lit(2.0 * math.pi) * tfn)
        ),
    ).otherwise(F.lit(0.0))
    return (
        occ.select("query_id", "doc_id", contrib.alias("c"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("c").alias("score"))
    )


def _stats_occ(
    doc_tf: DataFrame,
    doc_len: DataFrame,
    queries: DataFrame,
) -> DataFrame:
    """The _occ relation widened with df / doc_count / avgdl — the full
    per-occurrence statistics row the classic/DFI/PL2 models need. Same
    plan shape: every stats side broadcasts, candidates shuffle once."""
    qocc = scorer.query_term_occurrences(queries)
    qterms = qocc.select("term").distinct()
    stats = scorer.corpus_stats(doc_len)
    coll = doc_len.agg(F.sum("doc_length").cast("double").alias("total_tokens"))
    tstats = (
        doc_tf.join(F.broadcast(qterms), "term")
        .groupBy("term")
        .agg(
            F.sum("tf").cast("double").alias("ctf"),
            F.countDistinct("doc_id").cast("double").alias("df"),
        )
    )
    cand = (
        doc_tf.join(F.broadcast(qocc.select("query_id", "term").distinct()), "term")
        .select("query_id", "doc_id")
        .distinct()
    )
    return (
        qocc.join(F.broadcast(tstats), "term")
        .join(cand, "query_id")
        .join(doc_tf.select("doc_id", "term", "tf"), ["doc_id", "term"], "left")
        .join(doc_len, "doc_id")
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(coll))
        .select(
            "query_id",
            "doc_id",
            "pos",
            "term",
            F.coalesce("tf", F.lit(0)).cast("double").alias("tf"),
            F.col("doc_length").cast("double").alias("dl"),
            F.col("avg_doc_length").alias("avgdl"),
            F.col("doc_count").cast("double").alias("doc_count"),
            "ctf",
            "df",
            "total_tokens",
        )
    )


def bm25l_score(
    doc_tf: DataFrame,
    doc_len: DataFrame,
    queries: DataFrame,
    k1: float | None = None,
    b: float | None = None,
    delta: float = DELTA_L,
) -> DataFrame:
    """BM25L: length-normalize FIRST (c' = tf / norm), then lower-bound —
    contribution = idf * (k1+1)*(c'+delta) / (k1 + c' + delta) for
    tf > 0, else 0."""
    from .. import B, K1

    k1 = K1 if k1 is None else k1
    b = B if b is None else b
    occ = _idf_occ(doc_tf, doc_len, queries)
    norm = F.lit(1.0 - b) + F.lit(b) * (F.col("dl") / F.col("avgdl"))
    cprime = F.col("tf") / norm
    contrib = F.when(
        F.col("tf") > 0,
        F.col("idf")
        * (F.lit(k1 + 1.0) * (cprime + F.lit(delta)))
        / (F.lit(k1) + cprime + F.lit(delta)),
    ).otherwise(F.lit(0.0))
    return (
        occ.select("query_id", "doc_id", contrib.alias("c"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("c").alias("score"))
    )
