"""Driver pairs for the alternative ranking similarities
(operators/ranking_models.py): Dirichlet and Jelinek-Mercer query
likelihood over the SAME query and candidate contract as bm25_topk.

The oracle replays the model definition verbatim in DuckDB over the same
tokenizer CTEs the BM25 skeleton uses; scores are 6-dp-rounded before the
rank window on BOTH sides (repo-wide tie-break convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import B, K1
from .entry_queries import (
    QUERY_TERMS,
    _docs,
    _qterms_values,
    _queries_df,
    register,
)
from .operators import ranking_models, scorer

_LM_BASE = f"""
WITH toks AS (
  SELECT doc_id, t.term
  FROM documents, unnest(string_split(text, ' ')) AS t(term)
  WHERE t.term <> ''
),
doc_tf AS (
  SELECT doc_id, term, count(*)::INT AS tf FROM toks GROUP BY doc_id, term
),
doc_len AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE length(text) - length(replace(text, ' ', '')) + 1 END AS doc_length
  FROM documents
),
coll AS (
  SELECT sum(doc_length)::DOUBLE AS total_tokens FROM doc_len
),
qocc AS (
  SELECT * FROM (VALUES {_qterms_values(QUERY_TERMS)}) AS v(pos, term)
),
ctf AS (
  SELECT term, sum(tf)::DOUBLE AS ctf
  FROM doc_tf WHERE term IN (SELECT DISTINCT term FROM qocc)
  GROUP BY term
),
cand AS (
  SELECT DISTINCT doc_id FROM doc_tf
  WHERE term IN (SELECT DISTINCT term FROM qocc)
),
occ AS (
  SELECT q.pos, q.term, c.doc_id, coalesce(dt.tf, 0)::DOUBLE AS tf,
         dl.doc_length::DOUBLE AS dl, t.ctf,
         (SELECT total_tokens FROM coll) AS total_tokens
  FROM qocc q
  JOIN ctf t USING (term)
  CROSS JOIN cand c
  LEFT JOIN doc_tf dt ON dt.doc_id = c.doc_id AND dt.term = q.term
  JOIN doc_len dl ON dl.doc_id = c.doc_id
),
"""

_LM_TOPK = """
SELECT doc_id, score, rank FROM (
  SELECT doc_id, round(score, 6) AS score,
         row_number() OVER (ORDER BY round(score, 6) DESC, doc_id ASC)::INT AS rank
  FROM perdoc
) WHERE rank <= 20
"""

ORACLE_LMDIR = _LM_BASE + f"""
perdoc AS (
  SELECT doc_id,
         sum(ln(1.0 + tf / ({ranking_models.MU} * ctf / total_tokens))
             + ln({ranking_models.MU} / (dl + {ranking_models.MU}))) AS score
  FROM occ GROUP BY doc_id
)
""" + _LM_TOPK

ORACLE_LMJM = _LM_BASE + f"""
perdoc AS (
  SELECT doc_id,
         sum(CASE WHEN tf > 0 AND dl > 0
             THEN ln(1.0 + ({(1.0 - ranking_models.LAMBDA) / ranking_models.LAMBDA}
                  * (tf / dl)) / (ctf / total_tokens))
             ELSE 0.0 END) AS score
  FROM occ GROUP BY doc_id
)
""" + _LM_TOPK


def _lm_inputs(spark: SparkSession, sf_dir: str):
    docs = _docs(spark, sf_dir)
    return (
        scorer.doc_term_frequencies(docs),
        scorer.doc_lengths(docs),
        _queries_df(spark),
    )


@register("lmdir_topk", ORACLE_LMDIR)
def q_lmdir_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc_tf, dlen, qs = _lm_inputs(spark, sf_dir)
    scored = ranking_models.lmdir_score(doc_tf, dlen, qs)
    return ranking_models.topk(scored, 20).select("doc_id", "score", "rank")


@register("lmjm_topk", ORACLE_LMJM)
def q_lmjm_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc_tf, dlen, qs = _lm_inputs(spark, sf_dir)
    scored = ranking_models.lmjm_score(doc_tf, dlen, qs)
    return ranking_models.topk(scored, 20).select("doc_id", "score", "rank")


# ---------------------------------------------------------------------------
# Analyzed-field BM25 (lowercase + punctuation strip + stopwords)
# ---------------------------------------------------------------------------

from .functions.analyzer import STOPWORDS, analyzed_sql, analyzed_tokens_col  # noqa: E402
from .operators.scorer import topk as _topk  # noqa: E402

# raw query exercises case folding, punctuation splitting ('KEY-value' ->
# two terms), stopword drops ('The/of/the'), and duplicate multiplicity
ANALYZED_QUERY_RAW = "The KEY-value, Hash JOIN of the Table... table!"


def _analyze_py(text: str) -> list[str]:
    """Driver-side twin of analyzed_tokens_col (query planning only)."""
    import re

    toks = re.sub(r"[^a-z0-9 ]+", " ", text.lower()).split()
    return [t for t in toks if t not in STOPWORDS]


_AQ_TERMS = _analyze_py(ANALYZED_QUERY_RAW)

ORACLE_ANALYZED = f"""
WITH toks AS (
  SELECT doc_id, t.term
  FROM documents, unnest({analyzed_sql("text")}) AS t(term)
),
doc_tf AS (
  SELECT doc_id, term, count(*)::INT AS tf FROM toks GROUP BY doc_id, term
),
tok_len AS (
  SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id
),
doc_len AS (
  SELECT d.doc_id, coalesce(l.n, 0) AS doc_length
  FROM documents d LEFT JOIN tok_len l USING (doc_id)
),
stats AS (
  SELECT count(*) AS doc_count, avg(doc_length) AS avg_doc_length FROM doc_len
),
qterms AS (
  SELECT * FROM (VALUES {_qterms_values(_AQ_TERMS)}) AS v(pos, term)
),
term_df AS (
  SELECT term, count(DISTINCT doc_id) AS df
  FROM doc_tf WHERE term IN (SELECT DISTINCT term FROM qterms)
  GROUP BY term
),
idf AS (
  SELECT term, df, ln(CAST((SELECT doc_count FROM stats) AS DOUBLE) / (df + 1)) AS idf
  FROM term_df
),
cand AS (
  SELECT DISTINCT doc_tf.doc_id
  FROM doc_tf WHERE term IN (SELECT DISTINCT term FROM qterms)
),
occ AS (
  SELECT q.pos, q.term, c.doc_id, dt.tf, i.idf, dl.doc_length, s.avg_doc_length
  FROM qterms q
  CROSS JOIN cand c
  LEFT JOIN doc_tf dt ON dt.doc_id = c.doc_id AND dt.term = q.term
  LEFT JOIN idf i ON i.term = q.term
  JOIN doc_len dl ON dl.doc_id = c.doc_id
  CROSS JOIN stats s
),
perdoc AS (
  SELECT doc_id,
    sum(CASE WHEN tf IS NOT NULL AND idf IS NOT NULL
        THEN idf * (tf * {K1 + 1.0}) /
             (tf + {K1} * ({1.0 - B} + {B} * (doc_length / avg_doc_length)))
        ELSE 0.0 END) AS bm25
  FROM occ GROUP BY doc_id
)
SELECT doc_id, bm25, rank FROM (
  SELECT doc_id, round(bm25, 6) AS bm25,
         row_number() OVER (ORDER BY round(bm25, 6) DESC, doc_id ASC)::INT AS rank
  FROM perdoc
) WHERE rank <= 20
"""


@register("bm25_topk_analyzed", ORACLE_ANALYZED)
def q_bm25_topk_analyzed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 over ANALYZED fields (functions/analyzer.py): the analyzer
    runs symmetrically on documents (analyzed doc_tf / doc_length) and
    on the query (driver-side twin, then the standard occurrence
    semantics — duplicate surviving terms keep multiplicity)."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id", F.explode(analyzed_tokens_col("text")).alias("term")
    )
    dtf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("int").alias("tf")
    )
    dlen = docs.select(
        "doc_id", F.size(analyzed_tokens_col("text")).alias("doc_length")
    )
    qs = spark.createDataFrame(
        [("q1", " ".join(_AQ_TERMS))], "query_id string, text string"
    )
    sc = scorer.score_candidates(dtf, dlen, scorer.corpus_stats(dlen), qs)
    ranked = _topk(
        sc.select("query_id", "doc_id", F.round("bm25", 6).alias("bm25")), 20
    )
    return ranked.select("doc_id", "bm25", "rank")


@register("wand_analyzed_topk", ORACLE_ANALYZED)
def q_wand_analyzed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analyzer as a first-class INDEX capability, by composition:
    analysis is a codegen projection on the build input (text :=
    rejoined analyzed tokens), after which the unchanged T1 pipeline,
    block codec, and block-max WAND serve analyzed queries — same
    oracle as the from-raw analyzed pair, served from the compressed
    index."""
    import hashlib

    from pyspark.sql import Window

    from .operators import wand as wand_mod
    from .plans.index_build import build_index
    from .sources.transcripts import synthesize_transcripts

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    t = synthesize_transcripts(spark, sf_dir, replicas=1).withColumn(
        "text", F.array_join(analyzed_tokens_col("text"), " ")
    )
    cat = build_index(
        spark, t, f"/tmp/driver_analyzed_index_v1_{tag}", n_buckets=8
    )
    qdf = spark.createDataFrame(
        [("q1", " ".join(_AQ_TERMS))], "query_id string, text string"
    )
    out = wand_mod.wand_topk(cat, qdf, k=1000)
    conv = F.regexp_extract("doc_id", r"conv_(\d+):", 1).cast("long")
    turn = F.regexp_extract("doc_id", r":(\d+)$", 1).cast("long")
    w = Window.orderBy(F.desc(F.round("bm25", 6)), F.asc("doc_id_long"))
    return (
        out.select(
            (conv * 8 + turn).alias("doc_id_long"),
            F.round("bm25", 6).alias("bm25"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
        .select(F.col("doc_id_long").alias("doc_id"), "bm25", "rank")
    )


# ---------------------------------------------------------------------------
# Lower-bounded BM25 variants (Lv & Zhai 2011): BM25+ and BM25L
# ---------------------------------------------------------------------------

_LB_BASE = f"""
WITH toks AS (
  SELECT doc_id, t.term
  FROM documents, unnest(string_split(text, ' ')) AS t(term)
  WHERE t.term <> ''
),
doc_tf AS (
  SELECT doc_id, term, count(*)::INT AS tf FROM toks GROUP BY doc_id, term
),
doc_len AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE length(text) - length(replace(text, ' ', '')) + 1 END AS doc_length
  FROM documents
),
stats AS (
  SELECT count(*) AS doc_count, avg(doc_length) AS avg_doc_length FROM doc_len
),
qocc AS (
  SELECT * FROM (VALUES {_qterms_values(QUERY_TERMS)}) AS v(pos, term)
),
tdf AS (
  SELECT term, count(DISTINCT doc_id) AS df
  FROM doc_tf WHERE term IN (SELECT DISTINCT term FROM qocc) GROUP BY term
),
idf AS (
  SELECT term, ln(CAST((SELECT doc_count FROM stats) AS DOUBLE) / (df + 1)) AS idf
  FROM tdf
),
cand AS (
  SELECT DISTINCT doc_id FROM doc_tf
  WHERE term IN (SELECT DISTINCT term FROM qocc)
),
occ AS (
  SELECT q.pos, q.term, c.doc_id, dt.tf, i.idf,
         dl.doc_length::DOUBLE AS dl, s.avg_doc_length AS avgdl
  FROM qocc q
  JOIN idf i USING (term)
  CROSS JOIN cand c
  LEFT JOIN doc_tf dt ON dt.doc_id = c.doc_id AND dt.term = q.term
  JOIN doc_len dl ON dl.doc_id = c.doc_id
  CROSS JOIN stats s
),
"""

_LB_TOPK = """
SELECT doc_id, score, rank FROM (
  SELECT doc_id, round(score, 6) AS score,
         row_number() OVER (ORDER BY round(score, 6) DESC, doc_id ASC)::INT AS rank
  FROM perdoc
) WHERE rank <= 20
"""

ORACLE_BM25_PLUS = _LB_BASE + f"""
perdoc AS (
  SELECT doc_id,
         sum(CASE WHEN tf IS NOT NULL THEN
             idf * ((tf * {K1 + 1.0}) /
                    (tf + {K1} * ({1.0 - B} + {B} * (dl / avgdl)))
                    + {ranking_models.DELTA_PLUS})
             ELSE 0.0 END) AS score
  FROM occ GROUP BY doc_id
)
""" + _LB_TOPK

ORACLE_BM25L = _LB_BASE + f"""
perdoc AS (
  SELECT doc_id,
         sum(CASE WHEN tf IS NOT NULL THEN
             idf * ({K1 + 1.0} * (tf / ({1.0 - B} + {B} * (dl / avgdl))
                                  + {ranking_models.DELTA_L}))
                 / ({K1} + tf / ({1.0 - B} + {B} * (dl / avgdl))
                         + {ranking_models.DELTA_L})
             ELSE 0.0 END) AS score
  FROM occ GROUP BY doc_id
)
""" + _LB_TOPK


# ---------------------------------------------------------------------------
# Classic TF-IDF / DFI / PL2 (the rest of the Lucene+Terrier similarity menu)
# ---------------------------------------------------------------------------

_ST_BASE = f"""
WITH toks AS (
  SELECT doc_id, t.term
  FROM documents, unnest(string_split(text, ' ')) AS t(term)
  WHERE t.term <> ''
),
doc_tf AS (
  SELECT doc_id, term, count(*)::INT AS tf FROM toks GROUP BY doc_id, term
),
doc_len AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE length(text) - length(replace(text, ' ', '')) + 1 END AS doc_length
  FROM documents
),
stats AS (
  SELECT count(*)::DOUBLE AS doc_count, avg(doc_length) AS avg_doc_length,
         sum(doc_length)::DOUBLE AS total_tokens
  FROM doc_len
),
qocc AS (
  SELECT * FROM (VALUES {{qterms}}) AS v(pos, term)
),
tstats AS (
  SELECT term, sum(tf)::DOUBLE AS ctf, count(DISTINCT doc_id)::DOUBLE AS df
  FROM doc_tf WHERE term IN (SELECT DISTINCT term FROM qocc)
  GROUP BY term
),
cand AS (
  SELECT DISTINCT doc_id FROM doc_tf
  WHERE term IN (SELECT DISTINCT term FROM qocc)
),
occ AS (
  SELECT q.pos, q.term, c.doc_id, coalesce(dt.tf, 0)::DOUBLE AS tf,
         dl.doc_length::DOUBLE AS dl, s.avg_doc_length AS avgdl,
         s.doc_count, t.ctf, t.df, s.total_tokens
  FROM qocc q
  JOIN tstats t USING (term)
  CROSS JOIN cand c
  LEFT JOIN doc_tf dt ON dt.doc_id = c.doc_id AND dt.term = q.term
  JOIN doc_len dl ON dl.doc_id = c.doc_id
  CROSS JOIN stats s
),
""".replace("{qterms}", _qterms_values(QUERY_TERMS))

ORACLE_CLASSIC = _ST_BASE + """
perdoc AS (
  SELECT doc_id,
         sum(CASE WHEN tf > 0 THEN
             sqrt(tf) * pow(1.0 + ln(doc_count / (df + 1.0)), 2) / sqrt(dl)
             ELSE 0.0 END) AS score
  FROM occ GROUP BY doc_id
)
""" + _LM_TOPK

ORACLE_DFI = _ST_BASE + """
perdoc AS (
  SELECT doc_id,
         sum(CASE WHEN tf > 0 AND tf > dl * ctf / total_tokens THEN
             log2((tf - dl * ctf / total_tokens)
                  / sqrt(dl * ctf / total_tokens) + 1.0)
             ELSE 0.0 END) AS score
  FROM occ GROUP BY doc_id
)
""" + _LM_TOPK

ORACLE_PL2 = _ST_BASE + f"""
perdoc AS (
  SELECT doc_id,
         sum(CASE WHEN tf > 0 THEN
             (1.0 / (tf * log2(1.0 + {ranking_models.PL2_C} * avgdl / dl) + 1.0))
             * (tf * log2(1.0 + {ranking_models.PL2_C} * avgdl / dl)
                  * log2(tf * log2(1.0 + {ranking_models.PL2_C} * avgdl / dl)
                         / (ctf / doc_count))
                + (ctf / doc_count
                   - tf * log2(1.0 + {ranking_models.PL2_C} * avgdl / dl))
                  / ln(2.0)
                + 0.5 * log2(2.0 * pi()
                             * tf * log2(1.0 + {ranking_models.PL2_C} * avgdl / dl)))
             ELSE 0.0 END) AS score
  FROM occ GROUP BY doc_id
)
""" + _LM_TOPK


@register("classic_tfidf_topk", ORACLE_CLASSIC)
def q_classic_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc_tf, dlen, qs = _lm_inputs(spark, sf_dir)
    scored = ranking_models.classic_tfidf_score(doc_tf, dlen, qs)
    return ranking_models.topk(scored, 20).select("doc_id", "score", "rank")


@register("dfi_topk", ORACLE_DFI)
def q_dfi_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc_tf, dlen, qs = _lm_inputs(spark, sf_dir)
    scored = ranking_models.dfi_score(doc_tf, dlen, qs)
    return ranking_models.topk(scored, 20).select("doc_id", "score", "rank")


@register("pl2_topk", ORACLE_PL2)
def q_pl2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc_tf, dlen, qs = _lm_inputs(spark, sf_dir)
    scored = ranking_models.pl2_score(doc_tf, dlen, qs)
    return ranking_models.topk(scored, 20).select("doc_id", "score", "rank")


@register("bm25_plus_topk", ORACLE_BM25_PLUS)
def q_bm25_plus_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc_tf, dlen, qs = _lm_inputs(spark, sf_dir)
    scored = ranking_models.bm25_plus_score(doc_tf, dlen, qs)
    return ranking_models.topk(scored, 20).select("doc_id", "score", "rank")


@register("bm25l_topk", ORACLE_BM25L)
def q_bm25l_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc_tf, dlen, qs = _lm_inputs(spark, sf_dir)
    scored = ranking_models.bm25l_score(doc_tf, dlen, qs)
    return ranking_models.topk(scored, 20).select("doc_id", "score", "rank")
