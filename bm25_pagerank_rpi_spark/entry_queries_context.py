"""Driver pairs: recency decay, neighbor-turn context, sparse tf-idf
similarity, and duplicated-span statistics.

All run over the deterministic transcript mapping (sources/transcripts.py):
at replicas=1 turn doc_id == documents.doc_id and text is unchanged, and
ts == TIMESTAMP '2025-01-01' + doc_id seconds — so every oracle can
reconstruct the transcript columns from the `documents` view exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .entry_queries import (
    SQL_SKELETON,
    _docs,
    _queries_df,
    _r,
    register,
)
from .operators import conversations, dedup, retrieval_plus, scorer
from .sources.transcripts import synthesize_transcripts

# ---------------------------------------------------------------------------
# Recency-decay blended ranking (ES function_score exp decay)
# ---------------------------------------------------------------------------

DECAY_ORIGIN = "2025-01-03 00:00:00"  # 172800s past the transcript epoch
DECAY_HALF_LIFE_S = 21600.0  # 6 hours
# the exact double coefficient, computed ONCE in Python and inlined into
# both engines so neither re-derives it with its own division
_DECAY_COEF = -0.6931471805599453 / DECAY_HALF_LIFE_S

ORACLE_DECAY = SQL_SKELETON + f"""
SELECT doc_id, bm25, decay, blended, rank FROM (
  SELECT doc_id, round(bm25, 6) AS bm25,
         round(exp({_DECAY_COEF!r} * greatest(0.0, 172800.0 - doc_id)), 6) AS decay,
         round(bm25 * exp({_DECAY_COEF!r} * greatest(0.0, 172800.0 - doc_id)), 6) AS blended,
         row_number() OVER (
           ORDER BY round(bm25 * exp({_DECAY_COEF!r} * greatest(0.0, 172800.0 - doc_id)), 6) DESC,
                    doc_id ASC
         )::INT AS rank
  FROM perdoc
) WHERE rank <= 20
"""


@register("recency_decay_topk", ORACLE_DECAY)
def q_recency_decay_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 scaled by exponential recency decay (half-life 6h from a fixed
    origin). The turn timestamp is epoch + doc_id seconds (the transcript
    synthesis), so age = 172800 - doc_id for every doc in the test sfs."""
    docs = _docs(spark, sf_dir)
    dlen = scorer.doc_lengths(docs)
    sc = scorer.score_candidates(
        scorer.doc_term_frequencies(docs), dlen,
        scorer.corpus_stats(dlen), _queries_df(spark),
    ).select("query_id", "doc_id", "bm25")
    ts_rel = docs.select(
        "doc_id",
        (
            F.lit("2025-01-01 00:00:00").cast("timestamp")
            + F.col("doc_id") * F.expr("INTERVAL 1 SECOND")
        ).alias("ts"),
    )
    out = retrieval_plus.recency_decay_topk(
        sc, ts_rel, origin=DECAY_ORIGIN, half_life_s=DECAY_HALF_LIFE_S, k=1000
    )
    w = Window.orderBy(F.desc(F.round("blended", 6)), F.asc("doc_id"))
    return (
        out.select(
            "doc_id", _r("bm25").alias("bm25"), _r("decay").alias("decay"),
            _r("blended").alias("blended"),
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 20)
    )


# ---------------------------------------------------------------------------
# Top-k turns WITH neighbor-turn context
# ---------------------------------------------------------------------------

ORACLE_TURN_CONTEXT = SQL_SKELETON + """
, ranked AS (
  SELECT doc_id, round(bm25, 6) AS bm25,
         row_number() OVER (ORDER BY bm25 DESC, doc_id ASC)::INT AS rank
  FROM perdoc
)
SELECT r.doc_id, (r.doc_id % 8)::INT AS turn_idx, r.bm25, r.rank,
       p.text AS prev_text, n.text AS next_text
FROM ranked r
LEFT JOIN documents p ON p.doc_id = r.doc_id - 1 AND r.doc_id % 8 <> 0
LEFT JOIN documents n ON n.doc_id = r.doc_id + 1 AND r.doc_id % 8 <> 7
WHERE r.rank <= 10
"""


@register("turn_context_topk", ORACLE_TURN_CONTEXT)
def q_turn_context_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 transcript turns enriched with the previous/next turn's text
    via broadcast (conv_id, turn_idx±1) joins — the real serving shape
    over (conv_id, turn_idx) keys, checked against the doc_id±1 oracle
    the deterministic synthesis makes equivalent."""
    t = synthesize_transcripts(spark, sf_dir, replicas=1)
    conv = F.regexp_extract("conv_id", r"conv_(\d+)", 1).cast("long")
    turn_docs = t.select(
        (conv * 8 + F.col("turn_idx")).alias("doc_id"),
        "conv_id", "turn_idx", "text",
    )
    dlen = scorer.doc_lengths(turn_docs)
    sc = scorer.score_candidates(
        scorer.doc_term_frequencies(turn_docs), dlen,
        scorer.corpus_stats(dlen), _queries_df(spark),
    )
    top = scorer.topk(sc.select("query_id", "doc_id", "bm25"), k=10).join(
        turn_docs.select("doc_id", "conv_id", "turn_idx"), "doc_id"
    )
    out = retrieval_plus.with_neighbor_turns(top, t)
    return out.select(
        "doc_id", F.col("turn_idx").cast("int").alias("turn_idx"),
        _r("bm25").alias("bm25"), F.col("rank").cast("int").alias("rank"),
        "prev_text", "next_text",
    )


# ---------------------------------------------------------------------------
# Sparse tf-idf cosine similarity (from raw + from index)
# ---------------------------------------------------------------------------

SIM_SOURCE_IDS = [0, 7, 42]

ORACLE_SIMILAR = """
WITH toks AS (
  SELECT doc_id, t.term
  FROM documents, unnest(string_split(text, ' ')) AS t(term)
  WHERE t.term <> ''
),
doc_tf AS (
  SELECT doc_id, term, count(*)::INT AS tf FROM toks GROUP BY doc_id, term
),
stats AS (SELECT count(*) AS doc_count FROM documents),
term_df AS (SELECT term, count(*) AS df FROM doc_tf GROUP BY term),
w AS (
  SELECT doc_id, term,
         tf::DOUBLE * ln((SELECT doc_count FROM stats)::DOUBLE / (df + 1)) AS w
  FROM doc_tf JOIN term_df USING (term)
),
norms AS (SELECT doc_id, sqrt(sum(w * w)) AS norm FROM w GROUP BY doc_id),
src AS (
  SELECT doc_id AS src_id, term, w AS sw FROM w WHERE doc_id IN (0, 7, 42)
),
dots AS (
  SELECT s.src_id, w.doc_id, sum(w.w * s.sw) AS dot
  FROM w JOIN src s USING (term)
  WHERE w.doc_id <> s.src_id
  GROUP BY s.src_id, w.doc_id
),
cosv AS (
  SELECT d.src_id, d.doc_id, d.dot / (n1.norm * n2.norm) AS cosine
  FROM dots d
  JOIN norms n1 ON n1.doc_id = d.doc_id
  JOIN norms n2 ON n2.doc_id = d.src_id
  WHERE n1.norm > 0 AND n2.norm > 0
)
SELECT src_id, doc_id, round(cosine, 6) AS cosine, rank FROM (
  SELECT src_id, doc_id, cosine,
         row_number() OVER (
           PARTITION BY src_id ORDER BY round(cosine, 6) DESC, doc_id ASC
         )::INT AS rank
  FROM cosv
) WHERE rank <= 10
"""


@register("similar_docs_sparse", ORACLE_SIMILAR)
def q_similar_docs_sparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = retrieval_plus.similar_docs_sparse(
        _docs(spark, sf_dir), SIM_SOURCE_IDS, k=10
    )
    return out.select(
        "src_id", "doc_id", _r("cosine").alias("cosine"),
        F.col("rank").cast("int").alias("rank"),
    )


@register("similar_docs_from_index", ORACLE_SIMILAR)
def q_similar_docs_from_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .entry_queries_retrieval import _driver_cat

    cat = _driver_cat(spark, sf_dir)
    srcs = [f"conv_{i // 8:08d}:{i % 8}" for i in SIM_SOURCE_IDS]
    out = retrieval_plus.similar_docs_from_index(cat, srcs, k=10)

    def _long(c: str):
        return (
            F.regexp_extract(c, r"conv_(\d+):", 1).cast("long") * 8
            + F.regexp_extract(c, r":(\d+)$", 1).cast("long")
        )

    return out.select(
        _long("src_id").alias("src_id"),
        _long("doc_id").alias("doc_id"),
        _r("cosine").alias("cosine"),
        F.col("rank").cast("int").alias("rank"),
    )


# ---------------------------------------------------------------------------
# Exact duplicated-span statistics (Lee et al. 2022 style)
# ---------------------------------------------------------------------------

DUP_SPAN_N = dedup.DUP_SPAN_N

ORACLE_DUP_SPANS = f"""
WITH dtoks AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS l
  FROM documents
),
grams AS (
  SELECT doc_id,
         array_to_string(list_slice(l, i, i + {DUP_SPAN_N - 1}), ' ') AS gram
  FROM dtoks, unnest(generate_series(1, len(l) - {DUP_SPAN_N - 1})) AS g(i)
),
gram_df AS (
  SELECT gram, count(DISTINCT doc_id) AS df_g FROM grams GROUP BY gram
)
SELECT doc_id,
       count(*)::INT AS n_spans,
       sum(CASE WHEN df_g >= 2 THEN 1 ELSE 0 END)::INT AS dup_spans,
       round(sum(CASE WHEN df_g >= 2 THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
         AS dup_fraction
FROM grams JOIN gram_df USING (gram)
GROUP BY doc_id
"""


@register("dup_span_stats", ORACLE_DUP_SPANS)
def q_dup_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = dedup.dup_span_stats(_docs(spark, sf_dir), n=DUP_SPAN_N)
    return out.select(
        "doc_id", "n_spans", "dup_spans", _r("dup_fraction").alias("dup_fraction")
    )


# ---------------------------------------------------------------------------
# Score explanation (per-term BM25 breakdown of the top-k)
# ---------------------------------------------------------------------------

from .entry_queries_retrieval import _BM25_TERM_SQL  # noqa: E402

ORACLE_EXPLAIN = SQL_SKELETON + f"""
, ranked AS (
  SELECT doc_id, bm25,
         row_number() OVER (ORDER BY bm25 DESC, doc_id ASC)::INT AS rank
  FROM perdoc
)
SELECT o.doc_id, r.rank, round(r.bm25, 6) AS bm25, o.pos, o.term,
       coalesce(o.tf, 0)::INT AS tf, round(o.idf, 6) AS idf,
       round({_BM25_TERM_SQL}, 6) AS contribution
FROM occ o JOIN ranked r ON r.doc_id = o.doc_id
WHERE r.rank <= 5
"""


@register("explain_scores_topk", ORACLE_EXPLAIN)
def q_explain_scores_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Elasticsearch-_explain analog: one row per (query occurrence,
    top-5 doc) with tf / idf / additive BM25 contribution. The reference
    query's duplicate term contributes twice and its absent term shows
    idf NULL + contribution 0 — the multiplicity and missing-skip
    semantics made visible."""
    docs = _docs(spark, sf_dir)
    dlen = scorer.doc_lengths(docs)
    out = scorer.explain_scores(
        scorer.doc_term_frequencies(docs), dlen,
        scorer.corpus_stats(dlen), _queries_df(spark), k=5,
    )
    return out.select(
        "doc_id", F.col("rank").cast("int").alias("rank"),
        _r("bm25").alias("bm25"), "pos", "term", "tf",
        _r("idf").alias("idf"), _r("contribution").alias("contribution"),
    )


# ---------------------------------------------------------------------------
# Conversation-level transcript profile (operators/conversations.py)
# ---------------------------------------------------------------------------

ORACLE_CONV_PROFILE = """
WITH turns AS (
  SELECT printf('conv_%08d', doc_id // 8) AS conv_id,
         list_extract(['user','assistant','system','tool'],
                      ((doc_id % 8) % 4 + 1)::INT) AS role,
         list_extract(['none','search','code','browser'],
                      ((doc_id % 16) // 4 + 1)::INT) AS tool,
         CASE WHEN trim(text) = '' THEN 0
              ELSE length(text) - length(replace(text, ' ', '')) + 1
         END AS n_tokens,
         doc_id AS epoch
  FROM documents
)
SELECT conv_id,
       count(*) AS n_turns,
       sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END)::BIGINT AS n_role_user,
       sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)::BIGINT AS n_role_assistant,
       sum(CASE WHEN role = 'system' THEN 1 ELSE 0 END)::BIGINT AS n_role_system,
       sum(CASE WHEN role = 'tool' THEN 1 ELSE 0 END)::BIGINT AS n_role_tool,
       sum(CASE WHEN tool <> 'none' THEN 1 ELSE 0 END)::BIGINT AS n_tool_calls,
       count(DISTINCT CASE WHEN tool <> 'none' THEN tool END)::BIGINT AS distinct_tools,
       sum(n_tokens)::BIGINT AS total_tokens,
       round(avg(n_tokens), 6) AS avg_turn_tokens,
       max(epoch) - min(epoch) AS duration_s
FROM turns GROUP BY conv_id
"""


@register("conversation_stats", ORACLE_CONV_PROFILE)
def q_conversation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation profile (role mix, tool usage, token volume,
    wall-clock span) over the deterministic transcript table. The oracle
    reconstructs conv/role/tool/ts from the documents view via the
    replicas=1 bijection (ts == epoch + doc_id seconds, so duration ==
    max(doc_id) - min(doc_id) within a conversation)."""
    t = synthesize_transcripts(spark, sf_dir, replicas=1)
    return conversations.conversation_profile(t)


# ---------------------------------------------------------------------------
# Trending terms: top-k terms per event-time window (batch twin of
# streaming/turn_stats.windowed_term_counts + trending_terms)
# ---------------------------------------------------------------------------

_TREND_WINDOW_S = 120
_TREND_K = 5

ORACLE_TRENDING = f"""
WITH turns AS (
  SELECT doc_id, text,
         TIMESTAMP '2025-01-01 00:00:00'
           + (doc_id // {_TREND_WINDOW_S}) * {_TREND_WINDOW_S} * INTERVAL 1 SECOND
           AS wstart
  FROM documents
),
tok AS (
  SELECT wstart, t.term
  FROM turns, unnest(string_split(text, ' ')) AS t(term)
  WHERE t.term <> ''
),
wc AS (
  SELECT wstart, term, count(*) AS n FROM tok GROUP BY wstart, term
)
SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start, term, n, rank
FROM (
  SELECT wstart, term, n,
         row_number() OVER (
           PARTITION BY wstart ORDER BY n DESC, term ASC
         )::INT AS rank
  FROM wc
) WHERE rank <= {_TREND_K}
"""


@register("trending_terms", ORACLE_TRENDING)
def q_trending_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k terms per tumbling event-time window — the batch twin of the
    streaming windowed_term_counts sink + trending_terms rank (a window's
    top-k is only defined once the watermark closes it; the oracle
    reconstructs window starts from ts == epoch + doc_id seconds, and
    epoch is 120s-aligned so Spark's epoch-aligned window() boundaries
    coincide)."""
    from .functions.tokenize import tokens_col
    from .streaming.turn_stats import trending_terms

    t = synthesize_transcripts(spark, sf_dir, replicas=1)
    tc = (
        t.select("ts", F.explode(tokens_col("text")).alias("term"))
        .groupBy(
            F.window("ts", f"{_TREND_WINDOW_S} seconds").alias("window"), "term"
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = trending_terms(tc, k=_TREND_K)
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "term",
        "n",
        F.col("rank").cast("int").alias("rank"),
    )
