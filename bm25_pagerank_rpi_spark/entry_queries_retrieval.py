"""Driver pairs for the layered retrieval operators (retrieval_plus.py).

Five capabilities over the documents/transcripts corpus, each with a
full-value DuckDB oracle:

- conversation_topk  — MaxP conversation ranking over per-turn BM25
- bm25f_topk         — weighted multi-field BM25F (text/role/tool)
- more_like_this     — source doc's top tf-idf terms as the query
- facet_counts       — facet histogram over the disjunctive candidate set
- prf_topk           — pseudo-relevance-feedback two-pass retrieval

Transcript-derived pairs use synthesize_transcripts(replicas=1), which is
a bijection doc_id <-> (conv = doc_id // 8, turn = doc_id % 8) with text
bit-identical to documents.parquet, so the oracle reconstructs role/tool
arithmetically from doc_id (sources/transcripts.py ROLES/TOOLS tables).

All ranked outputs order by ROUND(score, 6) desc then id asc on BOTH
sides so near-ties break identically across engines (house convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import B, K1
from .entry_queries import (
    AND_QUERY_TEXT,
    SQL_SKELETON,
    _docs,
    _queries_df,
    _r,
    _sql_skeleton,
    register,
)
from .operators import retrieval_plus, scorer
from .sources.transcripts import synthesize_transcripts

_K1P1 = K1 + 1.0
_1MB = 1.0 - B

# the occurrence BM25 term, shared by the appended second-pass oracles
_BM25_TERM_SQL = f"""CASE WHEN tf IS NOT NULL AND idf IS NOT NULL THEN
      idf * (tf * {_K1P1}) /
      (tf + {K1} * ({_1MB} + {B} * (doc_length / avg_doc_length)))
      ELSE 0.0 END"""


def _turn_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcripts (replicas=1) as scoreable turn-docs with numeric ids."""
    t = synthesize_transcripts(spark, sf_dir, replicas=1)
    conv = F.regexp_extract("conv_id", r"conv_(\d+)", 1).cast("long")
    return t.select(
        (conv * 8 + F.col("turn_idx")).alias("doc_id"),
        conv.alias("conv_num"),
        F.col("turn_idx"),
        "role",
        "tool",
        "text",
    )


# ---------------------------------------------------------------------------
# Conversation-level retrieval (MaxP)
# ---------------------------------------------------------------------------

ORACLE_CONV = SQL_SKELETON + """
, conv AS (
  SELECT doc_id // 8 AS conv_id, (doc_id % 8)::INT AS turn_idx,
         round(bm25, 6) AS s
  FROM perdoc
),
cagg AS (
  SELECT conv_id, max(s) AS conv_score, count(*)::INT AS n_turns_matched
  FROM conv GROUP BY conv_id
),
cbest AS (
  SELECT conv_id, turn_idx FROM (
    SELECT conv_id, turn_idx,
           row_number() OVER (PARTITION BY conv_id ORDER BY s DESC, turn_idx ASC) AS rn
    FROM conv
  ) WHERE rn = 1
)
SELECT conv_id, best_turn_idx, conv_score, n_turns_matched, rank FROM (
  SELECT a.conv_id, b.turn_idx AS best_turn_idx, a.conv_score,
         a.n_turns_matched,
         row_number() OVER (ORDER BY a.conv_score DESC, a.conv_id ASC)::INT AS rank
  FROM cagg a JOIN cbest b USING (conv_id)
) WHERE rank <= 10
"""


@register("conversation_topk", ORACLE_CONV)
def q_conversation_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank CONVERSATIONS by their best-scoring turn (MaxP). Turn scores
    are 6-dp-rounded before aggregation so the argmax/tie-breaks are
    engine-portable; replicas=1 keeps turn text == documents text."""
    turns = _turn_docs(spark, sf_dir)
    sc = scorer.score_candidates(
        scorer.doc_term_frequencies(turns),
        scorer.doc_lengths(turns),
        scorer.corpus_stats(scorer.doc_lengths(turns)),
        _queries_df(spark),
    ).select("query_id", "doc_id", _r("bm25").alias("bm25"))
    scored = sc.select(
        "query_id",
        (F.col("doc_id") / 8).cast("long").alias("conv_id"),
        (F.col("doc_id") % 8).cast("int").alias("turn_idx"),
        "bm25",
    )
    out = retrieval_plus.conversation_topk(scored, k=10, score_col="bm25")
    return out.select(
        "conv_id",
        "best_turn_idx",
        F.col("conv_score"),
        "n_turns_matched",
        "rank",
    )


# ---------------------------------------------------------------------------
# BM25F — weighted fields text (1.0) / role (0.5) / tool (2.0)
# ---------------------------------------------------------------------------

BM25F_QUERY_TEXT = "hash join search assistant"
BM25F_WEIGHTS = {"text": 1.0, "role": 0.5, "tool": 2.0}

_BM25F_QTERMS = ", ".join(
    f"({i}, '{t}')" for i, t in enumerate(BM25F_QUERY_TEXT.split())
)

ORACLE_BM25F = f"""
WITH ftoks AS (
  SELECT doc_id, t.term AS term, 1.0 AS w
  FROM documents, unnest(string_split(text, ' ')) AS t(term)
  WHERE t.term <> ''
  UNION ALL
  SELECT doc_id,
         list_extract(['user','assistant','system','tool'], (doc_id % 4 + 1)::INT),
         0.5
  FROM documents
  UNION ALL
  SELECT doc_id,
         list_extract(['none','search','code','browser'], ((doc_id % 16) // 4 + 1)::INT),
         2.0
  FROM documents
),
wtf AS (SELECT doc_id, term, sum(w) AS wtf FROM ftoks GROUP BY doc_id, term),
wdl AS (
  SELECT d.doc_id, coalesce(s.wdl, 0.0) AS wdl
  FROM documents d
  LEFT JOIN (SELECT doc_id, sum(w) AS wdl FROM ftoks GROUP BY doc_id) s USING (doc_id)
),
fstats AS (SELECT count(*) AS doc_count, avg(wdl) AS avg_wdl FROM wdl),
fqterms AS (SELECT * FROM (VALUES {_BM25F_QTERMS}) AS v(pos, term)),
fdf AS (
  SELECT term, count(*) AS df FROM wtf
  WHERE term IN (SELECT term FROM fqterms) GROUP BY term
),
fidf AS (
  SELECT term, ln((SELECT doc_count FROM fstats)::DOUBLE / (df + 1)) AS idf
  FROM fdf
),
fcand AS (
  SELECT DISTINCT doc_id FROM wtf WHERE term IN (SELECT term FROM fqterms)
),
focc AS (
  SELECT q.term, c.doc_id, w.wtf, i.idf, l.wdl, s.avg_wdl
  FROM fqterms q CROSS JOIN fcand c
  LEFT JOIN wtf w ON w.doc_id = c.doc_id AND w.term = q.term
  LEFT JOIN fidf i ON i.term = q.term
  JOIN wdl l ON l.doc_id = c.doc_id
  CROSS JOIN fstats s
),
fperdoc AS (
  SELECT doc_id,
    sum(CASE WHEN wtf IS NOT NULL AND idf IS NOT NULL THEN
        idf * (wtf * {_K1P1}) /
        (wtf + {K1} * ({_1MB} + {B} * (wdl / avg_wdl)))
        ELSE 0.0 END) AS bm25f,
    sum(CASE WHEN wtf IS NOT NULL AND idf IS NOT NULL THEN 1 ELSE 0 END)::INT AS covered
  FROM focc GROUP BY doc_id
)
SELECT doc_id, bm25f, covered, rank FROM (
  SELECT doc_id, round(bm25f, 6) AS bm25f, covered,
         row_number() OVER (ORDER BY round(bm25f, 6) DESC, doc_id ASC)::INT AS rank
  FROM fperdoc
) WHERE rank <= 20
"""


@register("bm25f_topk", ORACLE_BM25F)
def q_bm25f_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple BM25F over the transcript fields: tool tokens weigh 2x,
    role tokens 0.5x, body text 1x. The oracle reconstructs role/tool
    from doc_id arithmetic (the replicas=1 synthesis is a bijection)."""
    turns = _turn_docs(spark, sf_dir)
    qdf = spark.createDataFrame(
        [("q1", BM25F_QUERY_TEXT)], "query_id string, text string"
    )
    sc = retrieval_plus.bm25f_score(turns, qdf, BM25F_WEIGHTS)
    w = Window.orderBy(F.desc(F.round("bm25f", 6)), F.asc("doc_id"))
    return (
        sc.select("doc_id", _r("bm25f").alias("bm25f"), "covered")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
    )


# ---------------------------------------------------------------------------
# More-like-this — doc 42's top-8 tf-idf terms as the query
# ---------------------------------------------------------------------------

MLT_SOURCE_DOC = 42
MLT_N_TERMS = 8

ORACLE_MLT = f"""
WITH toks AS (
  SELECT doc_id, t.term FROM documents, unnest(string_split(text, ' ')) AS t(term)
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
src AS (SELECT term, tf FROM doc_tf WHERE doc_id = {MLT_SOURCE_DOC}),
sdf AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM doc_tf
  WHERE term IN (SELECT term FROM src) GROUP BY term
),
sidf AS (
  SELECT term, ln((SELECT doc_count FROM stats)::DOUBLE / (df + 1)) AS idf
  FROM sdf
),
qsel AS (
  SELECT term, idf FROM (
    SELECT s.term, i.idf,
           row_number() OVER (ORDER BY round(s.tf * i.idf, 6) DESC, s.term ASC) AS rn
    FROM src s JOIN sidf i USING (term)
  ) WHERE rn <= {MLT_N_TERMS}
),
mcand AS (
  SELECT DISTINCT doc_id FROM doc_tf
  WHERE term IN (SELECT term FROM qsel) AND doc_id <> {MLT_SOURCE_DOC}
),
mocc AS (
  SELECT q.term, c.doc_id, dt.tf, q.idf, dl.doc_length, s.avg_doc_length
  FROM qsel q CROSS JOIN mcand c
  LEFT JOIN doc_tf dt ON dt.doc_id = c.doc_id AND dt.term = q.term
  JOIN doc_len dl ON dl.doc_id = c.doc_id
  CROSS JOIN stats s
),
mperdoc AS (
  SELECT doc_id,
    sum({_BM25_TERM_SQL}) AS bm25
  FROM mocc GROUP BY doc_id
)
SELECT doc_id, bm25, rank FROM (
  SELECT doc_id, round(bm25, 6) AS bm25,
         row_number() OVER (ORDER BY round(bm25, 6) DESC, doc_id ASC)::INT AS rank
  FROM mperdoc
) WHERE rank <= 20
"""


@register("more_like_this", ORACLE_MLT)
def q_more_like_this(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = retrieval_plus.more_like_this(
        _docs(spark, sf_dir), MLT_SOURCE_DOC, n_terms=MLT_N_TERMS, k=20
    )
    return out.select("doc_id", "bm25", "rank")


# ---------------------------------------------------------------------------
# Faceted search — lang/source histograms of the candidate set
# ---------------------------------------------------------------------------

ORACLE_FACETS = SQL_SKELETON + """
SELECT field, value, n_docs FROM (
  SELECT 'lang' AS field, d.lang AS value, count(*)::BIGINT AS n_docs
  FROM cand c JOIN documents d USING (doc_id) GROUP BY d.lang
  UNION ALL
  SELECT 'source', d.source, count(*)::BIGINT
  FROM cand c JOIN documents d USING (doc_id) GROUP BY d.source
)
"""


@register("facet_counts", ORACLE_FACETS)
def q_facet_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = retrieval_plus.facet_counts(
        _docs(spark, sf_dir), _queries_df(spark), ["lang", "source"]
    )
    return out.select("field", "value", "n_docs")


# ---------------------------------------------------------------------------
# Pseudo-relevance feedback — two-pass retrieval
# ---------------------------------------------------------------------------

PRF_FB_DOCS = 10
PRF_FB_TERMS = 5

ORACLE_PRF = _sql_skeleton(AND_QUERY_TEXT.split()) + f"""
, fb AS (
  SELECT doc_id FROM (
    SELECT doc_id, row_number() OVER (ORDER BY round(bm25, 6) DESC, doc_id ASC) AS rn
    FROM perdoc
  ) WHERE rn <= {PRF_FB_DOCS}
),
fmass AS (
  SELECT dt.term, sum(dt.tf::DOUBLE / dl.doc_length) AS mass
  FROM doc_tf dt JOIN fb USING (doc_id)
  JOIN doc_len dl ON dl.doc_id = dt.doc_id
  GROUP BY dt.term
),
fdf2 AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM doc_tf
  WHERE term IN (SELECT term FROM fmass) GROUP BY term
),
fw AS (
  SELECT m.term,
         round(m.mass * ln((SELECT doc_count FROM stats)::DOUBLE / (d.df + 1)), 6) AS w
  FROM fmass m JOIN fdf2 d USING (term)
  WHERE m.term NOT IN (SELECT DISTINCT term FROM qterms)
),
exp AS (
  SELECT term FROM (
    SELECT term, row_number() OVER (ORDER BY w DESC, term ASC) AS rn FROM fw
  ) WHERE rn <= {PRF_FB_TERMS}
),
q2 AS (SELECT term FROM qterms UNION ALL SELECT term FROM exp),
df2 AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM doc_tf
  WHERE term IN (SELECT DISTINCT term FROM q2) GROUP BY term
),
idf2 AS (
  SELECT term, ln((SELECT doc_count FROM stats)::DOUBLE / (df + 1)) AS idf
  FROM df2
),
cand2 AS (
  SELECT DISTINCT doc_id FROM doc_tf WHERE term IN (SELECT DISTINCT term FROM q2)
),
occ2 AS (
  SELECT q.term, c.doc_id, dt.tf, i.idf, dl.doc_length, s.avg_doc_length
  FROM q2 q CROSS JOIN cand2 c
  LEFT JOIN doc_tf dt ON dt.doc_id = c.doc_id AND dt.term = q.term
  LEFT JOIN idf2 i ON i.term = q.term
  JOIN doc_len dl ON dl.doc_id = c.doc_id
  CROSS JOIN stats s
),
perdoc2 AS (
  SELECT doc_id,
    sum({_BM25_TERM_SQL}) AS bm25,
    sum(CASE WHEN tf IS NOT NULL THEN 1 ELSE 0 END)::INT AS covered
  FROM occ2 GROUP BY doc_id
)
SELECT doc_id, bm25, covered, rank FROM (
  SELECT doc_id, round(bm25, 6) AS bm25, covered,
         row_number() OVER (ORDER BY round(bm25, 6) DESC, doc_id ASC)::INT AS rank
  FROM perdoc2
) WHERE rank <= 20
"""


@register("prf_topk", ORACLE_PRF)
def q_prf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    qdf = spark.createDataFrame(
        [("q1", AND_QUERY_TEXT)], "query_id string, text string"
    )
    out = retrieval_plus.prf_topk(
        _docs(spark, sf_dir), qdf,
        fb_docs=PRF_FB_DOCS, fb_terms=PRF_FB_TERMS, k=20,
    )
    return out.select("doc_id", "bm25", "covered", "rank")


# ---------------------------------------------------------------------------
# Index-served conversation retrieval (WAND -> MaxP)
# ---------------------------------------------------------------------------

ORACLE_CONV_INDEX = SQL_SKELETON + """
, conv AS (
  SELECT doc_id // 8 AS conv_id, (doc_id % 8)::INT AS turn_idx,
         round(bm25, 6) AS s
  FROM perdoc
),
cagg AS (SELECT conv_id, max(s) AS conv_score FROM conv GROUP BY conv_id),
cbest AS (
  SELECT conv_id, turn_idx FROM (
    SELECT conv_id, turn_idx,
           row_number() OVER (PARTITION BY conv_id ORDER BY s DESC, turn_idx ASC) AS rn
    FROM conv
  ) WHERE rn = 1
)
SELECT conv_id, conv_score, best_turn_idx, rank FROM (
  SELECT a.conv_id, a.conv_score, b.turn_idx AS best_turn_idx,
         row_number() OVER (ORDER BY a.conv_score DESC, a.conv_id ASC)::INT AS rank
  FROM cagg a JOIN cbest b USING (conv_id)
) WHERE rank <= 10
"""


@register("conversation_topk_from_index", ORACLE_CONV_INDEX)
def q_conversation_topk_from_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The serving-path twin of conversation_topk: block-max WAND top
    turns -> MaxP aggregation (turns_k=1000 >= 8*k makes the top-10
    conversations exact; see conversation_topk_from_index docstring).
    Shares the cached v3 driver index with wand_topk_from_index. Scores
    round to 6 dp BEFORE aggregation so argmax/tie-breaks are portable;
    conv numbers come from the doc_id bijection conv*8+turn."""
    import hashlib

    from .operators import retrieval_plus
    from .plans.index_build import build_index

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    idx_dir = f"/tmp/driver_wand_index_v3_{tag}"
    t = synthesize_transcripts(spark, sf_dir, replicas=1)
    cat = build_index(spark, t, idx_dir, n_buckets=8)

    from .operators.wand import wand_topk

    turns = wand_topk(cat, _queries_df(spark), k=1000)
    scored = turns.select(
        "query_id",
        F.regexp_extract("doc_id", r"conv_(\d+):", 1).cast("long").alias("conv_id"),
        F.regexp_extract("doc_id", r":(\d+)$", 1).cast("int").alias("turn_idx"),
        F.round("bm25", 6).alias("bm25"),
    )
    out = retrieval_plus.conversation_topk(scored, k=10, score_col="bm25")
    return out.select("conv_id", "conv_score", "best_turn_idx", "rank")


# ---------------------------------------------------------------------------
# Static-rank blending — BM25 + weighted PageRank prior
# ---------------------------------------------------------------------------

BLEND_WEIGHT = 200.0


def _blend_oracle() -> str:
    # scoring skeleton + the recursive-CTE PageRank graph (shared with the
    # pagerank pair) + the linear blend; RECURSIVE must mark the WITH once
    from .entry_queries_graph import SQL_GRAPH

    skel = SQL_SKELETON.replace("WITH toks", "WITH RECURSIVE toks", 1)
    return skel + ",\n" + SQL_GRAPH + f"""
SELECT doc_id, bm25, prior, blended, rank FROM (
  SELECT p.doc_id, round(p.bm25, 6) AS bm25, round(f.rank, 6) AS prior,
         round(p.bm25 + {BLEND_WEIGHT} * f.rank, 6) AS blended,
         row_number() OVER (
           ORDER BY round(p.bm25 + {BLEND_WEIGHT} * f.rank, 6) DESC, p.doc_id ASC
         )::INT AS rank
  FROM perdoc p JOIN pr_final f ON f.node = p.doc_id
) WHERE rank <= 20
"""


@register("blended_pagerank_topk", _blend_oracle())
def q_blended_pagerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 blended with a weighted PageRank prior (the linear serving
    shape of the reference's LTR feature combination, types.go:50-89).
    Graph + damping/iterations shared with the pagerank pair; rank on
    the 6-dp-rounded blend for engine portability."""
    from .entry_queries_graph import DAMPING, ITERS, _doc_graph
    from .operators import pagerank as pr_mod

    docs = _docs(spark, sf_dir)
    dlen = scorer.doc_lengths(docs)
    sc = scorer.score_candidates(
        scorer.doc_term_frequencies(docs), dlen,
        scorer.corpus_stats(dlen), _queries_df(spark),
    ).select("query_id", "doc_id", "bm25")
    nodes, edges = _doc_graph(docs)
    prior = pr_mod.pagerank_table(
        nodes, edges, damping=DAMPING, iterations=ITERS
    ).select(F.col("node").alias("doc_id"), F.col("pagerank").alias("prior"))
    out = retrieval_plus.blended_topk(
        sc, prior, weight=BLEND_WEIGHT, k=1000, prior_col="prior"
    )
    w = Window.orderBy(F.desc(F.round("blended", 6)), F.asc("doc_id"))
    return (
        out.select(
            "doc_id", _r("bm25").alias("bm25"), _r("prior").alias("prior"),
            _r("blended").alias("blended"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
    )


# ---------------------------------------------------------------------------
# Time-histogram facet over the candidate set
# ---------------------------------------------------------------------------

ORACLE_TIME_HIST = SQL_SKELETON + """
SELECT bucket_start, n_docs FROM (
  SELECT strftime(date_trunc('minute',
           TIMESTAMP '2025-01-01 00:00:00' + c.doc_id * INTERVAL 1 SECOND),
           '%Y-%m-%d %H:%M:%S') AS bucket_start,
         count(*)::BIGINT AS n_docs
  FROM cand c
  GROUP BY 1
)
"""


@register("time_histogram", ORACLE_TIME_HIST)
def q_time_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-histogram facet of the candidate set by turn timestamp
    (minute buckets). The transcript synthesis assigns
    ts = 2025-01-01T00:00:00 + doc_id seconds (replicas=1 bijection),
    which the oracle reconstructs arithmetically."""
    t = synthesize_transcripts(spark, sf_dir, replicas=1)
    conv = F.regexp_extract("conv_id", r"conv_(\d+)", 1).cast("long")
    docs = t.select(
        (conv * 8 + F.col("turn_idx")).alias("doc_id"), "text", "ts"
    )
    out = retrieval_plus.time_histogram(
        docs, _queries_df(spark), ts_col="ts", bucket="minute"
    )
    return out.select("bucket_start", "n_docs")


# ---------------------------------------------------------------------------
# Typo-tolerant retrieval (deletion-neighborhood fuzzy matching)
# ---------------------------------------------------------------------------

# one real misspelling per trigger class: deletion (batc -> batch),
# substitution (jorn -> join), plus a second query to pin per-query grouping
FUZZY_QUERIES = [("q1", "batc jorn"), ("q2", "ustomer")]

ORACLE_FUZZY = f"""
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
qraw AS (
  SELECT * FROM (VALUES ('q1', 'batc'), ('q1', 'jorn'), ('q2', 'ustomer'))
  AS v(query_id, qterm)
),
vocab AS (SELECT DISTINCT term FROM doc_tf),
qexp AS (
  SELECT DISTINCT q.query_id, v.term
  FROM qraw q JOIN vocab v ON levenshtein(q.qterm, v.term) <= 1
),
tdf AS (
  SELECT term, count(DISTINCT doc_id) AS df
  FROM doc_tf WHERE term IN (SELECT term FROM qexp) GROUP BY term
),
idf AS (
  SELECT term, ln(CAST((SELECT doc_count FROM stats) AS DOUBLE) / (df + 1)) AS idf
  FROM tdf
),
scored AS (
  SELECT e.query_id, dt.doc_id,
         sum(i.idf * (dt.tf * {_K1P1}) /
             (dt.tf + {K1} * ({_1MB} + {B} * (dl.doc_length / s.avg_doc_length)))) AS bm25
  FROM qexp e
  JOIN doc_tf dt ON dt.term = e.term
  JOIN idf i ON i.term = e.term
  JOIN doc_len dl ON dl.doc_id = dt.doc_id
  CROSS JOIN stats s
  GROUP BY e.query_id, dt.doc_id
)
SELECT query_id, doc_id, bm25, rank FROM (
  SELECT query_id, doc_id, round(bm25, 6) AS bm25,
         row_number() OVER (
           PARTITION BY query_id ORDER BY round(bm25, 6) DESC, doc_id ASC
         )::INT AS rank
  FROM scored
) WHERE rank <= 10
"""


@register("fuzzy_topk", ORACLE_FUZZY)
def q_fuzzy_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-tolerant BM25: SymSpell deletion-neighborhood candidate
    generation + exact levenshtein verify, expanded terms scored as a
    plain disjunction (each matched term keeps its own idf). Oracle
    brute-forces the vocab x qterm levenshtein join (small scale);
    rank on the 6-dp-rounded score for engine portability."""
    docs = _docs(spark, sf_dir)
    queries = spark.createDataFrame(FUZZY_QUERIES, "query_id string, text string")
    out = retrieval_plus.fuzzy_topk(docs, queries, k=1000)
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("bm25", 6)), F.asc("doc_id")
    )
    return (
        out.select("query_id", "doc_id", _r("bm25").alias("bm25"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
    )


# ---------------------------------------------------------------------------
# Substring search via trigram index
# ---------------------------------------------------------------------------

# long patterns exercise the trigram prefilter (one crosses a word
# boundary); 'qu' exercises the short-pattern scan path
SUBSTRING_PATTERNS = [
    ("q1", "ustom"), ("q2", "w sca"), ("q3", "agg"), ("q4", "qu"),
]

ORACLE_SUBSTRING = """
SELECT p.query_id, d.doc_id
FROM (VALUES ('q1', 'ustom'), ('q2', 'w sca'), ('q3', 'agg'), ('q4', 'qu'))
     AS p(query_id, pat), documents d
WHERE contains(lower(d.text), p.pat)
"""


@register("substring_search", ORACLE_SUBSTRING)
def q_substring_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pg_trgm-shaped substring search: trigram-index conjunctive
    prefilter + exact instr verify; short (<3 char) patterns take the
    direct scan branch. Oracle is the ground-truth contains() scan."""
    docs = _docs(spark, sf_dir)
    pats = spark.createDataFrame(
        SUBSTRING_PATTERNS, "query_id string, text string"
    )
    return retrieval_plus.substring_search(docs, pats)


# ---------------------------------------------------------------------------
# Prefix autocomplete (term suggest)
# ---------------------------------------------------------------------------

SUGGEST_PREFIXES = [("p1", "s"), ("p2", "wind"), ("p3", "b")]

ORACLE_SUGGEST = """
WITH toks AS (
  SELECT doc_id, t.term
  FROM documents, unnest(string_split(text, ' ')) AS t(term)
  WHERE t.term <> ''
),
vocab AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM toks GROUP BY term
)
SELECT query_id, term, df, rank FROM (
  SELECT p.query_id, v.term, v.df,
         row_number() OVER (
           PARTITION BY p.query_id ORDER BY v.df DESC, v.term ASC
         )::INT AS rank
  FROM (VALUES ('p1', 's'), ('p2', 'wind'), ('p3', 'b')) AS p(query_id, prefix)
  JOIN vocab v ON v.term LIKE p.prefix || '%'
) WHERE rank <= 5
"""


@register("suggest_terms", ORACLE_SUGGEST)
def q_suggest_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix autocomplete from the corpus vocabulary, df-ranked.
    Equi-join on substring(term, 1, len(prefix)) — no nested-loop."""
    docs = _docs(spark, sf_dir)
    prefixes = spark.createDataFrame(
        SUGGEST_PREFIXES, "query_id string, text string"
    )
    return retrieval_plus.suggest_terms(docs, prefixes, n=5)


# ---------------------------------------------------------------------------
# Boolean NOT exclusion
# ---------------------------------------------------------------------------

NOT_NEG_TEXT = "batch merge"

ORACLE_NOT = SQL_SKELETON + f"""
SELECT doc_id, bm25, rank FROM (
  SELECT doc_id, round(bm25, 6) AS bm25,
         row_number() OVER (
           ORDER BY round(bm25, 6) DESC, doc_id ASC
         )::INT AS rank
  FROM perdoc
  WHERE doc_id NOT IN (
    SELECT DISTINCT doc_id FROM toks
    WHERE term IN ({", ".join(repr(t) for t in NOT_NEG_TEXT.split())})
  )
) WHERE rank <= 20
"""


@register("bm25_not_topk", ORACLE_NOT)
def q_bm25_not_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 with '-term' exclusion: canonical query, docs containing
    'batch' or 'merge' anti-joined out before ranking."""
    from .entry_queries import QUERY_TEXT

    docs = _docs(spark, sf_dir)
    queries = spark.createDataFrame(
        [("q1", QUERY_TEXT, NOT_NEG_TEXT)],
        "query_id string, text string, neg_text string",
    )
    out = retrieval_plus.bm25_not_topk(docs, queries, k=1000)
    w = Window.orderBy(F.desc(F.round("bm25", 6)), F.asc("doc_id"))
    return (
        out.select("doc_id", _r("bm25").alias("bm25"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
    )


# ---------------------------------------------------------------------------
# Significant terms (JLH): terms overrepresented in the query's top-20
# result set vs the whole corpus — "what is this result set about".
# ---------------------------------------------------------------------------

ORACLE_SIG_TERMS = SQL_SKELETON + """
, fg AS (
  SELECT doc_id FROM (
    SELECT doc_id, row_number() OVER (ORDER BY round(bm25, 6) DESC, doc_id ASC) AS rn
    FROM perdoc
  ) WHERE rn <= 20
),
fg_n AS (SELECT count(*) AS n FROM fg),
fg_df AS (
  SELECT term, count(DISTINCT doc_id) AS fg_df
  FROM doc_tf WHERE doc_id IN (SELECT doc_id FROM fg)
  GROUP BY term
),
bg_df AS (
  SELECT term, count(DISTINCT doc_id) AS bg_df
  FROM doc_tf WHERE term IN (SELECT term FROM fg_df)
  GROUP BY term
),
sig AS (
  SELECT f.term, f.fg_df, b.bg_df,
         (f.fg_df::DOUBLE / (SELECT n FROM fg_n)
          - b.bg_df::DOUBLE / (SELECT doc_count FROM stats))
         * ((f.fg_df::DOUBLE / (SELECT n FROM fg_n))
            / (b.bg_df::DOUBLE / (SELECT doc_count FROM stats))) AS score
  FROM fg_df f JOIN bg_df b USING (term)
  WHERE f.term NOT IN (SELECT DISTINCT term FROM qterms)
)
SELECT term, fg_df::BIGINT AS fg_df, bg_df::BIGINT AS bg_df, score, rank FROM (
  SELECT term, fg_df, bg_df, round(score, 6) AS score,
         row_number() OVER (ORDER BY round(score, 6) DESC, term ASC)::INT AS rank
  FROM sig
) WHERE rank <= 15
"""


@register("significant_terms", ORACLE_SIG_TERMS)
def q_significant_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = retrieval_plus.significant_terms(
        _docs(spark, sf_dir), _queries_df(spark), fg_docs=20, n_terms=15
    )
    return out.select(
        "term", "fg_df", "bg_df", _r("score").alias("score"), "rank"
    )


# ---------------------------------------------------------------------------
# Index-backed twins (VERDICT r3 #3): same oracles as the from-raw pairs —
# the twins plan against the shared cached driver index (pruned postings +
# persisted terms table + trigram stage) and must be value-identical.
# doc ids map back through the replicas=1 bijection doc_id = conv*8 + turn.
# ---------------------------------------------------------------------------


def _driver_cat(spark: SparkSession, sf_dir: str, trigrams: bool = False):
    import hashlib

    from .plans.index_build import build_index, build_trigram_index

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    idx_dir = f"/tmp/driver_wand_index_v3_{tag}"
    t = synthesize_transcripts(spark, sf_dir, replicas=1)
    cat = build_index(spark, t, idx_dir, n_buckets=8)
    if trigrams:
        build_trigram_index(cat, t, n_buckets=8)
    return cat


def _doc_long(col: str = "doc_id"):
    conv = F.regexp_extract(col, r"conv_(\d+):", 1).cast("long")
    turn = F.regexp_extract(col, r":(\d+)$", 1).cast("long")
    return (conv * 8 + turn).alias("doc_id_long")


@register("more_like_this_from_index", ORACLE_MLT)
def q_more_like_this_from_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _driver_cat(spark, sf_dir)
    src = f"conv_{MLT_SOURCE_DOC // 8:08d}:{MLT_SOURCE_DOC % 8}"
    out = retrieval_plus.more_like_this_from_index(
        cat, src, n_terms=MLT_N_TERMS, k=20
    )
    return out.select(
        _doc_long().alias("doc_id"), F.col("bm25"), F.col("rank")
    )


@register("prf_topk_from_index", ORACLE_PRF)
def q_prf_topk_from_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _driver_cat(spark, sf_dir)
    qdf = spark.createDataFrame(
        [("q1", AND_QUERY_TEXT)], "query_id string, text string"
    )
    out = retrieval_plus.prf_topk_from_index(
        cat, qdf, fb_docs=PRF_FB_DOCS, fb_terms=PRF_FB_TERMS, k=20
    )
    return out.select(
        _doc_long().alias("doc_id"), F.col("bm25"), F.col("covered"), F.col("rank")
    )


@register("fuzzy_topk_from_index", ORACLE_FUZZY)
def q_fuzzy_topk_from_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _driver_cat(spark, sf_dir)
    queries = spark.createDataFrame(FUZZY_QUERIES, "query_id string, text string")
    out = retrieval_plus.fuzzy_topk_from_index(cat, queries, k=1000)
    ranked = out.select(
        "query_id", _doc_long().alias("doc_id"), _r("bm25").alias("bm25")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("bm25"), F.asc("doc_id"))
    return (
        ranked.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
    )


@register("suggest_terms_from_index", ORACLE_SUGGEST)
def q_suggest_terms_from_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _driver_cat(spark, sf_dir)
    prefixes = spark.createDataFrame(
        SUGGEST_PREFIXES, "query_id string, text string"
    )
    return retrieval_plus.suggest_terms_from_index(cat, prefixes, n=5)


@register("significant_terms_from_index", ORACLE_SIG_TERMS)
def q_significant_terms_from_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _driver_cat(spark, sf_dir)
    out = retrieval_plus.significant_terms_from_index(
        cat, _queries_df(spark), fg_docs=20, n_terms=15
    )
    return out.select(
        "term", "fg_df", "bg_df", _r("score").alias("score"), "rank"
    )


@register("substring_search_from_index", ORACLE_SUBSTRING)
def q_substring_search_from_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _driver_cat(spark, sf_dir, trigrams=True)
    pats = spark.createDataFrame(
        SUBSTRING_PATTERNS, "query_id string, text string"
    )
    out = retrieval_plus.substring_search_from_index(cat, pats)
    return out.select("query_id", _doc_long().alias("doc_id"))


# ---------------------------------------------------------------------------
# Wildcard (trailing-*) prefix queries — Lucene PrefixQuery analog
# ---------------------------------------------------------------------------

# q1 mixes two patterns with a literal; q2 pins per-query grouping and a
# pattern whose expansion set is smaller than the cap
WILDCARD_QUERIES = [("q1", "qu* join s*"), ("q2", "window batc*")]
WILDCARD_MAX_EXP = 4  # small enough that the df-ranked cap bites on 's*'

ORACLE_WILDCARD = f"""
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
vocab AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM doc_tf GROUP BY term
),
praw AS (
  SELECT * FROM (VALUES ('q1', 'qu'), ('q1', 's'), ('q2', 'batc'))
  AS v(query_id, pat)
),
lraw AS (
  SELECT * FROM (VALUES ('q1', 'join'), ('q2', 'window'))
  AS v(query_id, term)
),
pexp AS (
  SELECT query_id, term FROM (
    SELECT p.query_id, p.pat, v.term,
           row_number() OVER (
             PARTITION BY p.query_id, p.pat ORDER BY v.df DESC, v.term ASC
           ) AS rn
    FROM praw p JOIN vocab v ON substring(v.term, 1, length(p.pat)) = p.pat
  ) WHERE rn <= {WILDCARD_MAX_EXP}
),
qexp AS (
  SELECT DISTINCT query_id, term
  FROM (SELECT query_id, term FROM pexp UNION ALL SELECT query_id, term FROM lraw)
),
tdf AS (
  SELECT term, count(DISTINCT doc_id) AS df
  FROM doc_tf WHERE term IN (SELECT term FROM qexp) GROUP BY term
),
idf AS (
  SELECT term, ln(CAST((SELECT doc_count FROM stats) AS DOUBLE) / (df + 1)) AS idf
  FROM tdf
),
scored AS (
  SELECT e.query_id, dt.doc_id,
         sum(i.idf * (dt.tf * {_K1P1}) /
             (dt.tf + {K1} * ({_1MB} + {B} * (dl.doc_length / s.avg_doc_length)))) AS bm25
  FROM qexp e
  JOIN doc_tf dt ON dt.term = e.term
  JOIN idf i ON i.term = e.term
  JOIN doc_len dl ON dl.doc_id = dt.doc_id
  CROSS JOIN stats s
  GROUP BY e.query_id, dt.doc_id
)
SELECT query_id, doc_id, bm25, rank FROM (
  SELECT query_id, doc_id, round(bm25, 6) AS bm25,
         row_number() OVER (
           PARTITION BY query_id ORDER BY round(bm25, 6) DESC, doc_id ASC
         )::INT AS rank
  FROM scored
) WHERE rank <= 10
"""


@register("wildcard_topk", ORACLE_WILDCARD)
def q_wildcard_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-* prefix queries: each pattern expands to its top
    WILDCARD_MAX_EXP vocabulary terms by (df desc, term asc) — Lucene's
    top-terms rewrite cap — and the literal+expansion union scores as a
    plain BM25 disjunction (multiplicity 1, own idf per term)."""
    docs = _docs(spark, sf_dir)
    queries = spark.createDataFrame(WILDCARD_QUERIES, "query_id string, text string")
    out = retrieval_plus.wildcard_topk(
        docs, queries, k=1000, max_expansions=WILDCARD_MAX_EXP
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("bm25", 6)), F.asc("doc_id")
    )
    return (
        out.select("query_id", "doc_id", _r("bm25").alias("bm25"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
    )


@register("wildcard_topk_from_index", ORACLE_WILDCARD)
def q_wildcard_topk_from_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _driver_cat(spark, sf_dir)
    queries = spark.createDataFrame(WILDCARD_QUERIES, "query_id string, text string")
    out = retrieval_plus.wildcard_topk_from_index(
        cat, queries, k=1000, max_expansions=WILDCARD_MAX_EXP
    )
    ranked = out.select(
        "query_id", _doc_long().alias("doc_id"), _r("bm25").alias("bm25")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("bm25"), F.asc("doc_id"))
    return (
        ranked.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
    )


# ---------------------------------------------------------------------------
# Rocchio explicit relevance feedback
# ---------------------------------------------------------------------------

# judged sets are literal doc ids so the oracle replays them; q1 reuses the
# reference query (dup term -> q_tf=2, absent term -> dropped by idf join)
ROCCHIO_QRELS = [
    ("q1", 5, 1), ("q1", 42, 1), ("q1", 99, 1), ("q1", 7, 0), ("q1", 13, 0),
    ("q2", 12, 1), ("q2", 200, 1), ("q2", 3, 0),
]
ROCCHIO_QUERIES = [
    ("q1", "key value hash join table table spark zzzabsent"),
    ("q2", "merge sort window"),
]
# q_tf per (query_id, term), written out so the oracle needs no tokenizer
_ROCCHIO_QTF = """
  SELECT * FROM (VALUES
    ('q1', 'key', 1.0), ('q1', 'value', 1.0), ('q1', 'hash', 1.0),
    ('q1', 'join', 1.0), ('q1', 'table', 2.0), ('q1', 'spark', 1.0),
    ('q1', 'zzzabsent', 1.0),
    ('q2', 'merge', 1.0), ('q2', 'sort', 1.0), ('q2', 'window', 1.0)
  ) AS v(query_id, term, q_tf)
"""

ORACLE_ROCCHIO = f"""
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
qtf AS ({_ROCCHIO_QTF}),
qrels AS (
  SELECT * FROM (VALUES
    ('q1', 5, 1), ('q1', 42, 1), ('q1', 99, 1), ('q1', 7, 0), ('q1', 13, 0),
    ('q2', 12, 1), ('q2', 200, 1), ('q2', 3, 0)
  ) AS v(query_id, doc_id, label)
),
sizes AS (
  SELECT query_id,
         sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS n_rel,
         sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS n_nonrel
  FROM qrels GROUP BY query_id
),
fb AS (
  SELECT r.query_id, dt.term,
         sum(CASE WHEN r.label = 1 THEN dt.tf ELSE 0 END)::DOUBLE AS rel_tf,
         sum(CASE WHEN r.label = 0 THEN dt.tf ELSE 0 END)::DOUBLE AS nonrel_tf
  FROM qrels r JOIN doc_tf dt ON dt.doc_id = r.doc_id
  GROUP BY r.query_id, dt.term
),
vec AS (
  SELECT coalesce(q.query_id, f.query_id) AS query_id,
         coalesce(q.term, f.term) AS term,
         1.0 * coalesce(q.q_tf, 0)
         + CASE WHEN s.n_rel > 0
                THEN 0.75 * coalesce(f.rel_tf, 0) / s.n_rel ELSE 0 END
         - CASE WHEN s.n_nonrel > 0
                THEN 0.15 * coalesce(f.nonrel_tf, 0) / s.n_nonrel ELSE 0 END
         AS tf_part
  FROM qtf q
  FULL JOIN fb f ON f.query_id = q.query_id AND f.term = q.term
  JOIN sizes s ON s.query_id = coalesce(q.query_id, f.query_id)
),
tdf AS (
  SELECT term, count(DISTINCT doc_id) AS df
  FROM doc_tf WHERE term IN (SELECT DISTINCT term FROM vec) GROUP BY term
),
idf AS (
  SELECT term, ln(CAST((SELECT doc_count FROM stats) AS DOUBLE) / (df + 1)) AS idf
  FROM tdf
),
wts AS (
  SELECT query_id, term, w FROM (
    SELECT v.query_id, v.term, round(v.tf_part * i.idf, 6) AS w,
           row_number() OVER (
             PARTITION BY v.query_id
             ORDER BY round(v.tf_part * i.idf, 6) DESC, v.term ASC
           ) AS rn
    FROM vec v JOIN idf i USING (term)
    WHERE round(v.tf_part * i.idf, 6) > 0
  ) WHERE rn <= 10
),
scored AS (
  SELECT w.query_id, dt.doc_id,
         round(sum(w.w * i.idf * (dt.tf * {_K1P1}) /
             (dt.tf + {K1} * ({_1MB} + {B} * (dl.doc_length / s.avg_doc_length)))), 6) AS score
  FROM wts w
  JOIN idf i ON i.term = w.term
  JOIN doc_tf dt ON dt.term = w.term
  JOIN doc_len dl ON dl.doc_id = dt.doc_id
  CROSS JOIN stats s
  GROUP BY w.query_id, dt.doc_id
)
SELECT query_id, doc_id, score, rank FROM (
  SELECT query_id, doc_id, score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         )::INT AS rank
  FROM scored
) WHERE rank <= 15
"""


@register("rocchio_topk", ORACLE_ROCCHIO)
def q_rocchio_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit relevance feedback (Rocchio 1971): tf-idf query vector
    moved toward judged-relevant centroids and away from non-relevant
    ones, top-10 positive weights re-scored as a weighted BM25
    disjunction. The PRF pair's explicit-judgment sibling."""
    docs = _docs(spark, sf_dir)
    queries = spark.createDataFrame(ROCCHIO_QUERIES, "query_id string, text string")
    qrels = spark.createDataFrame(
        ROCCHIO_QRELS, "query_id string, doc_id long, label int"
    )
    return retrieval_plus.rocchio_topk(docs, queries, qrels, k=15)


# ---------------------------------------------------------------------------
# search_after pagination
# ---------------------------------------------------------------------------

ORACLE_SEARCH_AFTER = SQL_SKELETON + """
SELECT doc_id, bm25, (rank - 5)::INT AS rank FROM (
  SELECT doc_id, round(bm25, 6) AS bm25,
         row_number() OVER (ORDER BY round(bm25, 6) DESC, doc_id ASC) AS rank
  FROM perdoc
) WHERE rank BETWEEN 6 AND 10
"""


@register("search_after_page2", ORACLE_SEARCH_AFTER)
def q_search_after_page2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deep paging via a (score, doc_id) cursor: page 2 of size 5 must
    equal ranks 6-10 of the full ranking. The cursor is the collected
    last hit of page 1 (a bounded 1-row planning collect — exactly what
    a paging client round-trips)."""
    docs = _docs(spark, sf_dir)
    dlen = scorer.doc_lengths(docs)
    sc = scorer.score_candidates(
        scorer.doc_term_frequencies(docs), dlen,
        scorer.corpus_stats(dlen), _queries_df(spark),
    ).select("query_id", "doc_id", _r("bm25").alias("bm25"))
    last = scorer.topk(sc, 5).filter(F.col("rank") == 5).collect()[0]
    cursors = spark.createDataFrame(
        [("q1", float(last["bm25"]), int(last["doc_id"]))],
        "query_id string, after_score double, after_doc long",
    )
    out = retrieval_plus.search_after_topk(
        docs, _queries_df(spark), cursors, k=5
    )
    return out.select("doc_id", "bm25", F.col("rank").cast("int").alias("rank"))


# ---------------------------------------------------------------------------
# Regexp term queries
# ---------------------------------------------------------------------------

# Java/RE2-common subset only (the PII-pattern portability rule):
# q1 = dot wildcard + alternation, q2 = class + quantifier
REGEXP_PATTERNS = [("q1", "ta.le|s(ort|can)"), ("q2", "qu[a-z]+y")]

ORACLE_REGEXP = f"""
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
vocab AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM doc_tf GROUP BY term
),
praw AS (
  SELECT * FROM (VALUES ('q1', 'ta.le|s(ort|can)'), ('q2', 'qu[a-z]+y'))
  AS v(query_id, pat)
),
qexp AS (
  SELECT DISTINCT query_id, term FROM (
    SELECT p.query_id, p.pat, v.term,
           row_number() OVER (
             PARTITION BY p.query_id, p.pat ORDER BY v.df DESC, v.term ASC
           ) AS rn
    FROM praw p JOIN vocab v ON regexp_full_match(v.term, p.pat)
  ) WHERE rn <= 64
),
tdf AS (
  SELECT term, count(DISTINCT doc_id) AS df
  FROM doc_tf WHERE term IN (SELECT term FROM qexp) GROUP BY term
),
idf AS (
  SELECT term, ln(CAST((SELECT doc_count FROM stats) AS DOUBLE) / (df + 1)) AS idf
  FROM tdf
),
scored AS (
  SELECT e.query_id, dt.doc_id,
         sum(i.idf * (dt.tf * {_K1P1}) /
             (dt.tf + {K1} * ({_1MB} + {B} * (dl.doc_length / s.avg_doc_length)))) AS bm25
  FROM qexp e
  JOIN doc_tf dt ON dt.term = e.term
  JOIN idf i ON i.term = e.term
  JOIN doc_len dl ON dl.doc_id = dt.doc_id
  CROSS JOIN stats s
  GROUP BY e.query_id, dt.doc_id
)
SELECT query_id, doc_id, bm25, rank FROM (
  SELECT query_id, doc_id, round(bm25, 6) AS bm25,
         row_number() OVER (
           PARTITION BY query_id ORDER BY round(bm25, 6) DESC, doc_id ASC
         )::INT AS rank
  FROM scored
) WHERE rank <= 10
"""


@register("regexp_topk", ORACLE_REGEXP)
def q_regexp_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp term queries: whole-term (anchored) matching against the
    vocabulary, df-ranked expansion cap, expansion union scored as a
    BM25 disjunction — wildcard_topk's general-pattern sibling."""
    docs = _docs(spark, sf_dir)
    pats = spark.createDataFrame(REGEXP_PATTERNS, "query_id string, pattern string")
    out = retrieval_plus.regexp_topk(docs, pats, k=1000)
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("bm25", 6)), F.asc("doc_id")
    )
    return (
        out.select("query_id", "doc_id", _r("bm25").alias("bm25"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
    )


# ---------------------------------------------------------------------------
# Spell suggestion + percolation
# ---------------------------------------------------------------------------

SPELL_TERMS = [("s1", "batc"), ("s1", "tabl"), ("s2", "windoq")]

ORACLE_SPELL = """
WITH toks AS (
  SELECT doc_id, t.term
  FROM documents, unnest(string_split(text, ' ')) AS t(term)
  WHERE t.term <> ''
),
vocab AS (
  SELECT term, count(DISTINCT doc_id) AS df
  FROM toks GROUP BY term
),
qraw AS (
  SELECT * FROM (VALUES ('s1', 'batc'), ('s1', 'tabl'), ('s2', 'windoq'))
  AS v(query_id, qterm)
),
m AS (
  SELECT q.query_id, q.qterm, v.term, levenshtein(q.qterm, v.term) AS dist, v.df
  FROM qraw q JOIN vocab v ON levenshtein(q.qterm, v.term) <= 1
)
SELECT query_id, qterm, term, dist, df, rank FROM (
  SELECT query_id, qterm, term, dist, df,
         row_number() OVER (
           PARTITION BY query_id, qterm
           ORDER BY dist ASC, df DESC, term ASC
         )::INT AS rank
  FROM m
) WHERE rank <= 5
"""


@register("spell_suggest", ORACLE_SPELL)
def q_spell_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES term-suggester: Levenshtein-1 corrections from the vocabulary,
    ranked (dist asc, df desc, term asc). Candidates via the SymSpell
    deletion-neighborhood join; oracle brute-forces the distance join."""
    docs = _docs(spark, sf_dir)
    terms = spark.createDataFrame(SPELL_TERMS, "query_id string, term string")
    out = retrieval_plus.spell_suggest(docs, terms, n=5)
    return out.select(
        "query_id", "qterm", "term",
        F.col("dist").cast("int").alias("dist"),
        "df", F.col("rank").cast("int").alias("rank"),
    )


# stored queries: q_a is a 2-term conjunction, q_b single-term, q_c has an
# absent term so it can never match
PERCOLATE_QUERIES = [
    ("q_a", "hash join"), ("q_b", "window"), ("q_c", "window zzznothere"),
]

ORACLE_PERCOLATE = """
WITH doc_terms AS (
  SELECT DISTINCT doc_id, t.term
  FROM documents, unnest(string_split(text, ' ')) AS t(term)
  WHERE t.term <> ''
),
qterms AS (
  SELECT DISTINCT query_id, t.term
  FROM (VALUES ('q_a', 'hash join'), ('q_b', 'window'),
               ('q_c', 'window zzznothere')) AS v(query_id, text),
       unnest(string_split(text, ' ')) AS t(term)
),
need AS (SELECT query_id, count(*) AS n FROM qterms GROUP BY query_id),
hits AS (
  SELECT d.doc_id, q.query_id, count(*) AS got
  FROM doc_terms d JOIN qterms q USING (term)
  GROUP BY d.doc_id, q.query_id
)
SELECT h.doc_id, h.query_id
FROM hits h JOIN need n USING (query_id)
WHERE h.got = n.n
"""


@register("percolate_matches", ORACLE_PERCOLATE)
def q_percolate_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percolator (reverse search): every (doc, stored query) pair where
    the doc holds ALL the query's terms — the saved-search/alerting
    primitive over a document stream; the registry broadcasts."""
    docs = _docs(spark, sf_dir)
    sq = spark.createDataFrame(PERCOLATE_QUERIES, "query_id string, text string")
    return retrieval_plus.percolate(docs, sq)


# ---------------------------------------------------------------------------
# Query-time synonym expansion
# ---------------------------------------------------------------------------

SYNONYMS = [
    ("hash", "digest"), ("digest", "hash"),
    ("join", "merge"), ("merge", "join"),
    ("window", "frame"), ("frame", "window"),
]
SYNONYM_QUERIES = [("q1", "hash join"), ("q2", "window")]

ORACLE_SYNONYM = f"""
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
qraw AS (
  SELECT DISTINCT query_id, t.term
  FROM (VALUES ('q1', 'hash join'), ('q2', 'window')) AS v(query_id, text),
       unnest(string_split(text, ' ')) AS t(term)
),
syns AS (
  SELECT * FROM (VALUES
    ('hash', 'digest'), ('digest', 'hash'),
    ('join', 'merge'), ('merge', 'join'),
    ('window', 'frame'), ('frame', 'window')
  ) AS v(term, syn)
),
qexp AS (
  SELECT DISTINCT query_id, term FROM (
    SELECT query_id, term FROM qraw
    UNION ALL
    SELECT q.query_id, s.syn AS term FROM qraw q JOIN syns s USING (term)
  )
),
tdf AS (
  SELECT term, count(DISTINCT doc_id) AS df
  FROM doc_tf WHERE term IN (SELECT term FROM qexp) GROUP BY term
),
idf AS (
  SELECT term, ln(CAST((SELECT doc_count FROM stats) AS DOUBLE) / (df + 1)) AS idf
  FROM tdf
),
scored AS (
  SELECT e.query_id, dt.doc_id,
         sum(i.idf * (dt.tf * {_K1P1}) /
             (dt.tf + {K1} * ({_1MB} + {B} * (dl.doc_length / s.avg_doc_length)))) AS bm25
  FROM qexp e
  JOIN doc_tf dt ON dt.term = e.term
  JOIN idf i ON i.term = e.term
  JOIN doc_len dl ON dl.doc_id = dt.doc_id
  CROSS JOIN stats s
  GROUP BY e.query_id, dt.doc_id
)
SELECT query_id, doc_id, bm25, rank FROM (
  SELECT query_id, doc_id, round(bm25, 6) AS bm25,
         row_number() OVER (
           PARTITION BY query_id ORDER BY round(bm25, 6) DESC, doc_id ASC
         )::INT AS rank
  FROM scored
) WHERE rank <= 10
"""


@register("synonym_topk", ORACLE_SYNONYM)
def q_synonym_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-side synonym expansion over a broadcast thesaurus; the
    expanded union scores as a multiplicity-1 BM25 disjunction."""
    docs = _docs(spark, sf_dir)
    qs = spark.createDataFrame(SYNONYM_QUERIES, "query_id string, text string")
    syns = spark.createDataFrame(SYNONYMS, "term string, syn string")
    out = retrieval_plus.synonym_topk(docs, qs, syns, k=1000)
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("bm25", 6)), F.asc("doc_id")
    )
    return (
        out.select("query_id", "doc_id", _r("bm25").alias("bm25"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
    )


# ---------------------------------------------------------------------------
# dis_max multi-field query (best_fields multi_match)
# ---------------------------------------------------------------------------

DISMAX_QUERY_TEXT = "hash join search assistant"
DISMAX_TIE = 0.3

_DISMAX_QTERMS = ", ".join(
    f"({i}, '{t}')" for i, t in enumerate(DISMAX_QUERY_TEXT.split())
)


def _dismax_leg(p: str, toks_sql: str) -> str:
    """One per-field BM25 leg (house skeleton semantics) as a CTE chain
    prefixed with `p`; ends with {p}perdoc(doc_id, score) = the field's
    candidate set scored with its OWN df / doc_count / avgdl."""
    return f"""
{p}toks AS ({toks_sql}),
{p}tf AS (
  SELECT doc_id, term, count(*)::INT AS tf FROM {p}toks GROUP BY doc_id, term
),
{p}len AS (
  SELECT d.doc_id, coalesce(l.n, 0) AS doc_length
  FROM documents d
  LEFT JOIN (SELECT doc_id, count(*) AS n FROM {p}toks GROUP BY doc_id) l
    USING (doc_id)
),
{p}stats AS (
  SELECT count(*) AS doc_count, avg(doc_length) AS avg_doc_length FROM {p}len
),
{p}df AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM {p}tf
  WHERE term IN (SELECT DISTINCT term FROM dq) GROUP BY term
),
{p}idf AS (
  SELECT term,
         ln((SELECT doc_count FROM {p}stats)::DOUBLE / (df + 1)) AS idf
  FROM {p}df
),
{p}cand AS (
  SELECT DISTINCT doc_id FROM {p}tf
  WHERE term IN (SELECT DISTINCT term FROM dq)
),
{p}perdoc AS (
  SELECT c.doc_id,
         sum(CASE WHEN dt.tf IS NOT NULL AND i.idf IS NOT NULL THEN
             i.idf * (dt.tf * {_K1P1}) /
             (dt.tf + {K1} * ({_1MB} + {B} * (dl.doc_length /
                              (SELECT avg_doc_length FROM {p}stats))))
             ELSE 0.0 END) AS score
  FROM dq q
  CROSS JOIN {p}cand c
  LEFT JOIN {p}tf dt ON dt.doc_id = c.doc_id AND dt.term = q.term
  LEFT JOIN {p}idf i ON i.term = q.term
  JOIN {p}len dl ON dl.doc_id = c.doc_id
  GROUP BY c.doc_id
)"""


ORACLE_DISMAX = (
    f"""
WITH dq AS (SELECT * FROM (VALUES {_DISMAX_QTERMS}) AS v(pos, term)),
"""
    + _dismax_leg(
        "t_",
        """SELECT doc_id, t.term FROM documents,
       unnest(string_split(text, ' ')) AS t(term) WHERE t.term <> ''""",
    )
    + ","
    + _dismax_leg(
        "r_",
        """SELECT doc_id,
       list_extract(['user','assistant','system','tool'],
                    (doc_id % 4 + 1)::INT) AS term
       FROM documents""",
    )
    + ","
    + _dismax_leg(
        "o_",
        """SELECT doc_id,
       list_extract(['none','search','code','browser'],
                    ((doc_id % 16) // 4 + 1)::INT) AS term
       FROM documents""",
    )
    + f""",
legs AS (
  SELECT doc_id, score FROM t_perdoc
  UNION ALL SELECT doc_id, score FROM r_perdoc
  UNION ALL SELECT doc_id, score FROM o_perdoc
),
dm AS (
  SELECT doc_id,
         max(score) + {DISMAX_TIE} * (sum(score) - max(score)) AS score
  FROM legs GROUP BY doc_id
)
SELECT doc_id, score, rank FROM (
  SELECT doc_id, round(score, 6) AS score,
         row_number() OVER (ORDER BY round(score, 6) DESC, doc_id ASC)::INT AS rank
  FROM dm
) WHERE rank <= 20
"""
)


@register("dis_max_topk", ORACLE_DISMAX)
def q_dis_max_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene DisjunctionMaxQuery over three transcript fields: each
    field (text body, role, tool) scores independently through the
    UNCHANGED exact BM25 path with its own df/avgdl statistics, and the
    per-doc combine is max + tie_breaker * (sum - max). Contrast with
    bm25f_topk, which merges fields BEFORE scoring (weighted tf/dl);
    dis_max is ES's best_fields, BM25F is its combined-fields."""
    turns = _turn_docs(spark, sf_dir)
    text_docs = turns.select("doc_id", "text")
    fields = [
        (
            "text",
            scorer.doc_term_frequencies(text_docs),
            scorer.doc_lengths(text_docs),
        ),
        (
            "role",
            turns.select(
                "doc_id",
                F.col("role").alias("term"),
                F.lit(1).cast("int").alias("tf"),
            ),
            turns.select("doc_id", F.lit(1).alias("doc_length")),
        ),
        (
            "tool",
            turns.select(
                "doc_id",
                F.col("tool").alias("term"),
                F.lit(1).cast("int").alias("tf"),
            ),
            turns.select("doc_id", F.lit(1).alias("doc_length")),
        ),
    ]
    qdf = spark.createDataFrame(
        [("q1", DISMAX_QUERY_TEXT)], "query_id string, text string"
    )
    out = retrieval_plus.dis_max_topk(fields, qdf, 20, DISMAX_TIE)
    return out.select("doc_id", "score", "rank")


# ---------------------------------------------------------------------------
# Facet top-hits + range facet (ES top_hits / range aggregations)
# ---------------------------------------------------------------------------

ORACLE_FACET_TOP_HITS = SQL_SKELETON + """
SELECT value, doc_id, bm25, bucket_rank FROM (
  SELECT d.lang AS value, p.doc_id, round(p.bm25, 6) AS bm25,
         row_number() OVER (
           PARTITION BY d.lang
           ORDER BY round(p.bm25, 6) DESC, p.doc_id ASC
         )::INT AS bucket_rank
  FROM perdoc p JOIN documents d USING (doc_id)
) WHERE bucket_rank <= 3
"""


@register("facet_top_hits", ORACLE_FACET_TOP_HITS)
def q_facet_top_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES top_hits-inside-terms-agg: the standard query's candidates,
    top 3 per lang bucket by exact BM25 (rank window partitioned by
    (query, facet value) — WindowGroupLimit applies per bucket)."""
    docs = _docs(spark, sf_dir)
    out = retrieval_plus.facet_top_hits(
        docs, _queries_df(spark), "lang", 3
    )
    return out.select("value", "doc_id", "bm25", "bucket_rank")


RANGE_FACET_BOUNDS = [200.0, 350.0, 500.0]

_RANGE_FRAME_VALUES = ", ".join(
    f"({i}, {lo if lo is not None else 'NULL::DOUBLE'}, "
    f"{hi if hi is not None else 'NULL::DOUBLE'})"
    for i, (lo, hi) in enumerate(
        zip(
            [None] + RANGE_FACET_BOUNDS,
            RANGE_FACET_BOUNDS + [None],
        )
    )
)

_RANGE_IDX_SQL = " + ".join(
    f"(CASE WHEN v >= {b} THEN 1 ELSE 0 END)" for b in RANGE_FACET_BOUNDS
)

ORACLE_RANGE_FACET = SQL_SKELETON + f"""
, rjoin AS (
  SELECT p.doc_id, d.n_chars::DOUBLE AS v
  FROM perdoc p JOIN documents d USING (doc_id)
),
got AS (
  SELECT ({_RANGE_IDX_SQL}) AS bucket_idx, count(*)::BIGINT AS n_docs
  FROM rjoin GROUP BY 1
),
frame AS (
  SELECT * FROM (VALUES {_RANGE_FRAME_VALUES}) AS f(bucket_idx, lo, hi)
)
SELECT f.bucket_idx::INT AS bucket_idx, f.lo, f.hi,
       coalesce(g.n_docs, 0)::BIGINT AS n_docs
FROM frame f LEFT JOIN got g USING (bucket_idx)
"""


@register("range_facet_counts", ORACLE_RANGE_FACET)
def q_range_facet_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES range aggregation over the candidate set: n_chars buckets
    [-inf,200) [200,350) [350,500) [500,inf) with from-inclusive /
    to-exclusive ES bounds; empty buckets emitted with n_docs = 0."""
    docs = _docs(spark, sf_dir)
    out = retrieval_plus.range_facet_counts(
        docs, _queries_df(spark), "n_chars", RANGE_FACET_BOUNDS
    )
    return out.select("bucket_idx", "lo", "hi", "n_docs")


# ---------------------------------------------------------------------------
# Phrase suggester with collation ("did you mean")
# ---------------------------------------------------------------------------

PHRASE_SUGGEST_TERMS = ["hash", "joon", "tabl"]


def _ps_cand(i: int, t: str) -> str:
    return f"""
cand{i} AS (
  SELECT term, dist, df FROM (
    SELECT v.term, levenshtein('{t}', v.term) AS dist, v.df,
           row_number() OVER (
             ORDER BY levenshtein('{t}', v.term) ASC, v.df DESC, v.term ASC
           ) AS rn
    FROM vocab v WHERE levenshtein('{t}', v.term) <= 1
  ) WHERE rn <= 3
)"""


ORACLE_PHRASE_SUGGEST = (
    """
WITH toks AS (
  SELECT doc_id, t.term
  FROM documents, unnest(string_split(text, ' ')) AS t(term)
  WHERE t.term <> ''
),
vocab AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term
),
doc_terms AS (
  SELECT DISTINCT doc_id, term FROM toks
),"""
    + ",".join(_ps_cand(i, t) for i, t in enumerate(PHRASE_SUGGEST_TERMS))
    + """,
combos AS (
  SELECT c0.term AS t0, c1.term AS t1, c2.term AS t2,
         (c0.dist + c1.dist + c2.dist)::INT AS total_dist,
         round(ln(c0.df + 1.0) + ln(c1.df + 1.0) + ln(c2.df + 1.0), 6)
           AS lm_score,
         concat(c0.term, ' ', c1.term, ' ', c2.term) AS suggestion
  FROM cand0 c0 CROSS JOIN cand1 c1 CROSS JOIN cand2 c2
),
cterms AS (
  SELECT DISTINCT suggestion, t.term
  FROM combos, unnest([t0, t1, t2]) AS t(term)
),
need AS (SELECT suggestion, count(*) AS n_need FROM cterms GROUP BY suggestion),
hits AS (
  SELECT c.suggestion, d.doc_id, count(DISTINCT d.term) AS n_have
  FROM doc_terms d JOIN cterms c USING (term)
  GROUP BY c.suggestion, d.doc_id
),
collated AS (
  SELECT h.suggestion, count(*)::BIGINT AS n_matching_docs
  FROM hits h JOIN need n USING (suggestion)
  WHERE h.n_have = n.n_need
  GROUP BY h.suggestion
)
SELECT suggestion, total_dist, lm_score, n_matching_docs, rank FROM (
  SELECT cb.suggestion, cb.total_dist, cb.lm_score, co.n_matching_docs,
         row_number() OVER (
           ORDER BY cb.total_dist ASC, cb.lm_score DESC, cb.suggestion ASC
         )::INT AS rank
  FROM combos cb JOIN collated co USING (suggestion)
) WHERE rank <= 5
"""
)


@register("phrase_suggest_collated", ORACLE_PHRASE_SUGGEST)
def q_phrase_suggest_collated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES phrase suggester with collate+prune: per-position Levenshtein-1
    candidates compose into whole-query suggestions, kept only when >= 1
    document contains every corrected term; ranked by fewest edits, then
    unigram lm_score = sum ln(df+1), then text. The oracle brute-forces
    the distance join and replays composition + collation in SQL."""
    docs = _docs(spark, sf_dir)
    out = retrieval_plus.phrase_suggest(
        docs, PHRASE_SUGGEST_TERMS, per_term=3, n=5
    )
    return out.select(
        "suggestion",
        F.col("total_dist").cast("int").alias("total_dist"),
        "lm_score",
        F.col("n_matching_docs").cast("long").alias("n_matching_docs"),
        F.col("rank").cast("int").alias("rank"),
    )


# ---------------------------------------------------------------------------
# ES-style rescore window (two-phase ranking)
# ---------------------------------------------------------------------------

_RESCORE_PHRASE = "join table"
_RESCORE_WINDOW = 30
_RESCORE_K = 15

ORACLE_RESCORE = SQL_SKELETON + f"""
, primary_ranked AS (
  SELECT doc_id, round(bm25, 6) AS s,
         row_number() OVER (ORDER BY round(bm25, 6) DESC, doc_id ASC) AS prank
  FROM perdoc
),
flags AS (
  SELECT doc_id,
         CASE WHEN instr(' ' || text || ' ', ' {_RESCORE_PHRASE} ') > 0
              THEN 2.0 ELSE 0.0 END AS rescore
  FROM documents
),
combined AS (
  SELECT p.doc_id,
         CASE WHEN p.prank <= {_RESCORE_WINDOW}
              THEN round(p.s + coalesce(f.rescore, 0.0), 6)
              ELSE p.s END AS score
  FROM primary_ranked p LEFT JOIN flags f ON f.doc_id = p.doc_id
)
SELECT doc_id, score, rank FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC)::INT AS rank
  FROM combined
) WHERE rank <= {_RESCORE_K}
"""


@register("rescore_phrase_topk", ORACLE_RESCORE)
def q_rescore_phrase_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES rescore semantics: BM25 phase one, then only the top-30 docs
    get an exact-phrase secondary score (+2.0 when the contiguous phrase
    appears); docs beyond the window keep their untouched BM25 and the
    final top-15 re-sorts the union. The expensive phrase check touches
    a corpus-independent window, not every candidate."""
    docs = _docs(spark, sf_dir)
    dlen = scorer.doc_lengths(docs)
    sc = scorer.score_candidates(
        scorer.doc_term_frequencies(docs),
        dlen,
        scorer.corpus_stats(dlen),
        _queries_df(spark),
    ).select("query_id", "doc_id", "bm25")
    flags = docs.select(
        "doc_id",
        F.when(
            F.instr(
                F.concat(F.lit(" "), F.col("text"), F.lit(" ")),
                f" {_RESCORE_PHRASE} ",
            )
            > 0,
            F.lit(2.0),
        )
        .otherwise(F.lit(0.0))
        .alias("rescore"),
    )
    out = retrieval_plus.rescore_window(
        sc, flags, k=_RESCORE_K, window=_RESCORE_WINDOW
    )
    return out.select("doc_id", "score", "rank")


# ---------------------------------------------------------------------------
# ES boosting query (negative-query demotion without exclusion)
# ---------------------------------------------------------------------------

_BOOSTING_NEG = 0.2

ORACLE_BOOSTING = SQL_SKELETON + f"""
, demoted AS (
  SELECT DISTINCT doc_id FROM toks
  WHERE term IN ({", ".join(repr(t) for t in NOT_NEG_TEXT.split())})
),
adj AS (
  SELECT p.doc_id,
         round(CASE WHEN d.doc_id IS NOT NULL
               THEN round(p.bm25, 6) * {_BOOSTING_NEG!r}
               ELSE round(p.bm25, 6) END, 6) AS bm25
  FROM perdoc p LEFT JOIN demoted d ON d.doc_id = p.doc_id
)
SELECT doc_id, bm25, rank FROM (
  SELECT doc_id, bm25,
         row_number() OVER (ORDER BY bm25 DESC, doc_id ASC)::INT AS rank
  FROM adj
) WHERE rank <= 20
"""


@register("boosting_topk", ORACLE_BOOSTING)
def q_boosting_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES boosting query: canonical positive query; docs containing
    'batch' or 'merge' are demoted to 0.2x their BM25 instead of being
    excluded (compare bm25_not_topk, the hard-NOT twin on the same
    negative set)."""
    from .entry_queries import QUERY_TEXT

    docs = _docs(spark, sf_dir)
    queries = spark.createDataFrame(
        [("q1", QUERY_TEXT, NOT_NEG_TEXT)],
        "query_id string, text string, neg_text string",
    )
    out = retrieval_plus.boosting_topk(
        docs, queries, negative_boost=_BOOSTING_NEG, k=1000
    )
    w = Window.orderBy(F.desc(F.round("bm25", 6)), F.asc("doc_id"))
    return (
        out.select("doc_id", _r("bm25").alias("bm25"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
    )
