"""Driver pairs for the round-4 extras: index introspection
(term_vectors / index_stats), CommonTermsQuery, match_phrase_prefix,
min-max linear hybrid fusion, and DSIR importance selection.

Each pair follows the house rules: floats rounded to 6 dp on both
sides, ranks computed over the ROUNDED score with doc_id tie-break,
arrays string-joined for engine-portable value hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import B, K1
from .entry_queries import _docs, _queries_df, _r, _sql_skeleton, register
from .entry_queries_pipeline import _COS
from .operators import introspect, phrase, retrieval_plus, scorer, similarity, textstats

# ---------------------------------------------------------------------------
# term_vectors — ES _termvectors?term_statistics=true over three docs
# ---------------------------------------------------------------------------

_TV_DOC_IDS = [1, 2, 3]

ORACLE_TERM_VECTORS = f"""
WITH tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
occ AS (
  SELECT doc_id, toks[i] AS term, (i - 1)::INT AS pos
  FROM tok, unnest(generate_series(1, len(toks))) AS g(i)
),
local AS (
  SELECT doc_id, term, count(*)::INT AS tf,
         string_agg(pos::VARCHAR, ',' ORDER BY pos) AS positions
  FROM occ WHERE doc_id IN ({", ".join(str(i) for i in _TV_DOC_IDS)})
  GROUP BY doc_id, term
),
stats AS (
  SELECT term, count(DISTINCT doc_id)::INT AS df, count(*)::BIGINT AS ttf
  FROM occ WHERE term IN (SELECT DISTINCT term FROM local)
  GROUP BY term
)
SELECT l.doc_id, l.term, l.tf, l.positions, s.df, s.ttf
FROM local l JOIN stats s USING (term)
"""


@register("term_vectors", ORACLE_TERM_VECTORS)
def q_term_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = introspect.term_vectors(_docs(spark, sf_dir), _TV_DOC_IDS)
    return out.select(
        "doc_id",
        "term",
        "tf",
        F.array_join(
            F.transform("positions", lambda p: p.cast("string")), ","
        ).alias("positions"),
        "df",
        "ttf",
    )


# ---------------------------------------------------------------------------
# index_stats — the _stats / CheckIndex corpus summary
# ---------------------------------------------------------------------------

ORACLE_INDEX_STATS = """
WITH tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
d AS (SELECT doc_id, len(toks) AS dl FROM tok),
ds AS (
  SELECT count(*)::BIGINT AS doc_count,
         sum(CASE WHEN dl = 0 THEN 1 ELSE 0 END)::BIGINT AS empty_docs,
         sum(dl)::BIGINT AS total_tokens,
         round(avg(dl), 6) AS avg_doc_length,
         max(dl)::INT AS max_doc_length
  FROM d
),
occ AS (
  SELECT doc_id, toks[i] AS term
  FROM tok, unnest(generate_series(1, len(toks))) AS g(i)
),
t AS (SELECT doc_id, term, count(*) AS tf FROM occ GROUP BY 1, 2),
ts AS (
  SELECT count(DISTINCT term)::BIGINT AS distinct_terms, max(tf)::INT AS max_tf
  FROM t
)
SELECT doc_count, empty_docs, total_tokens, distinct_terms,
       avg_doc_length, max_doc_length, max_tf
FROM ds CROSS JOIN ts
"""


@register("index_stats", ORACLE_INDEX_STATS)
def q_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = introspect.index_stats(_docs(spark, sf_dir))
    return out.select(
        F.col("doc_count").cast("long").alias("doc_count"),
        F.col("empty_docs").cast("long").alias("empty_docs"),
        F.col("total_tokens").cast("long").alias("total_tokens"),
        F.col("distinct_terms").cast("long").alias("distinct_terms"),
        _r(F.col("avg_doc_length")).alias("avg_doc_length"),
        F.col("max_doc_length").cast("int").alias("max_doc_length"),
        F.col("max_tf").cast("int").alias("max_tf"),
    )


# ---------------------------------------------------------------------------
# common_terms_topk — Lucene CommonTermsQuery: 'dup' is the only rare
# term at every sf (df ~5% vs ~78% for the rest), so the gate admits
# only dup-containing docs while hash/table still contribute score.
# ---------------------------------------------------------------------------

CT_QUERY_TEXT = "dup hash table zzzabsent"
_CT_TERMS = CT_QUERY_TEXT.split()
_CT_CUTOFF = 0.5

ORACLE_COMMON_TERMS = _sql_skeleton(_CT_TERMS) + f"""
, pq AS (
  SELECT q.term,
         (td.df IS NOT NULL
          AND td.df < {_CT_CUTOFF} * (SELECT doc_count FROM stats)) AS is_rare
  FROM (SELECT DISTINCT term FROM qterms) q
  LEFT JOIN term_df td USING (term)
),
nr AS (SELECT count(*) FILTER (WHERE is_rare) AS n_rare FROM pq),
gate AS (SELECT term FROM pq CROSS JOIN nr WHERE is_rare OR n_rare = 0),
admitted AS (
  SELECT DISTINCT doc_id FROM doc_tf WHERE term IN (SELECT term FROM gate)
)
SELECT doc_id, bm25, rank FROM (
  SELECT doc_id, round(bm25, 6) AS bm25,
         row_number() OVER (ORDER BY round(bm25, 6) DESC, doc_id ASC)::INT AS rank
  FROM perdoc JOIN admitted USING (doc_id)
) WHERE rank <= 20
"""


@register("common_terms_topk", ORACLE_COMMON_TERMS)
def q_common_terms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    qdf = spark.createDataFrame(
        [("q1", CT_QUERY_TEXT)], "query_id string, text string"
    )
    out = retrieval_plus.common_terms_topk(
        _docs(spark, sf_dir), qdf, cutoff_frequency=_CT_CUTOFF, k=20
    )
    return out.select("doc_id", _r("bm25").alias("bm25"), "rank")


# ---------------------------------------------------------------------------
# match_phrase_prefix — "hash t" expands to "hash table" / "hash the"
# ---------------------------------------------------------------------------

_PP_FIXED = ["hash"]
_PP_PREFIX = "t"

ORACLE_PHRASE_PREFIX = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
m AS (
  SELECT doc_id, len(t) AS doc_length,
         CASE WHEN len(t) >= 2 THEN
           len(list_filter(range(1, len(t)),
               i -> t[i] = '{_PP_FIXED[0]}' AND t[i+1] LIKE '{_PP_PREFIX}%'))
         ELSE 0 END AS phrase_tf
  FROM toks
),
stats AS (SELECT count(*) AS doc_count, avg(doc_length) AS avg_doc_length FROM m),
matched AS (SELECT * FROM m WHERE phrase_tf > 0),
pdf AS (SELECT count(*) AS phrase_df FROM matched),
scored AS (
  SELECT doc_id, phrase_tf,
         round(ln(doc_count::DOUBLE / (phrase_df + 1)) * (phrase_tf * {K1 + 1.0}) /
               (phrase_tf + {K1} * ({1.0 - B} + {B} * (doc_length / avg_doc_length))),
               6) AS bm25
  FROM matched CROSS JOIN stats CROSS JOIN pdf
)
SELECT doc_id, phrase_tf, bm25, rank FROM (
  SELECT doc_id, phrase_tf, bm25,
         row_number() OVER (ORDER BY bm25 DESC, doc_id ASC)::INT AS rank
  FROM scored
) WHERE rank <= 20
"""


@register("phrase_prefix_topk", ORACLE_PHRASE_PREFIX)
def q_phrase_prefix_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = phrase.phrase_prefix_topk(
        _docs(spark, sf_dir), _PP_FIXED, _PP_PREFIX, k=10**9
    )
    w = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    return (
        out.select("doc_id", "phrase_tf", _r("bm25").alias("bm25"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
    )


# ---------------------------------------------------------------------------
# hybrid_linear_topk — alpha-blend of min-max-normalized BM25 + cosine
# legs (the score-space sibling of hybrid_rrf_topk). Legs are rounded to
# 6 dp BEFORE normalization on both sides so min/max boundaries agree.
# ---------------------------------------------------------------------------

_LIN_LEG_K = 30
_LIN_ALPHA = 0.7

ORACLE_HYBRID_LINEAR = _sql_skeleton(
    "key value hash join table table spark zzzabsent".split()
) + f"""
, bm25_top AS (
  SELECT doc_id, s FROM (
    SELECT doc_id, round(bm25, 6) AS s,
           row_number() OVER (ORDER BY round(bm25, 6) DESC, doc_id ASC) AS rank
    FROM perdoc
  ) WHERE rank <= {_LIN_LEG_K}
),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
qv AS (SELECT v AS qv FROM e WHERE vec_id = 0),
ann_top AS (
  SELECT doc_id, s FROM (
    SELECT e.vec_id AS doc_id, round({_COS.format(a='qv', b='e.v')}, 6) AS s,
           row_number() OVER (
             ORDER BY round({_COS.format(a='qv', b='e.v')}, 6) DESC,
                      e.vec_id ASC) AS rank
    FROM e CROSS JOIN qv WHERE e.vec_id <> 0
  ) WHERE rank <= {_LIN_LEG_K}
),
bn AS (
  SELECT doc_id,
         {_LIN_ALPHA} * (CASE WHEN mx = mn THEN 1.0 ELSE (s - mn) / (mx - mn) END)
           AS contrib
  FROM (SELECT doc_id, s, min(s) OVER () AS mn, max(s) OVER () AS mx FROM bm25_top)
),
an AS (
  SELECT doc_id,
         {1.0 - _LIN_ALPHA} * (CASE WHEN mx = mn THEN 1.0 ELSE (s - mn) / (mx - mn) END)
           AS contrib
  FROM (SELECT doc_id, s, min(s) OVER () AS mn, max(s) OVER () AS mx FROM ann_top)
),
un AS (SELECT * FROM bn UNION ALL SELECT * FROM an),
f AS (
  SELECT doc_id, sum(contrib) AS fused, count(*)::INT AS n_systems
  FROM un GROUP BY doc_id
)
SELECT doc_id, fused, n_systems, rank FROM (
  SELECT doc_id, round(fused, 6) AS fused, n_systems,
         row_number() OVER (ORDER BY round(fused, 6) DESC, doc_id ASC)::INT AS rank
  FROM f
) WHERE rank <= 20
"""


@register("hybrid_linear_topk", ORACLE_HYBRID_LINEAR)
def q_hybrid_linear_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    dlen = scorer.doc_lengths(docs)
    sc = scorer.score_candidates(
        scorer.doc_term_frequencies(docs),
        dlen,
        scorer.corpus_stats(dlen),
        _queries_df(spark),
    ).select("query_id", "doc_id", _r("bm25").alias("bm25"))
    bm25_leg = scorer.topk(sc, _LIN_LEG_K).select(
        "query_id", "doc_id", F.col("bm25").alias("score")
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ann_leg = similarity.brute_force_topk(emb, [0], k=_LIN_LEG_K).select(
        F.lit("q1").alias("query_id"),
        F.col("vec_id").alias("doc_id"),
        _r("cos").alias("score"),
    )
    out = retrieval_plus.linear_fusion(
        [bm25_leg, ann_leg], [_LIN_ALPHA, 1.0 - _LIN_ALPHA], k=20
    )
    return out.select("doc_id", _r("fused").alias("fused"), "n_systems", "rank")


# ---------------------------------------------------------------------------
# dsir_topk — DSIR importance selection, target = src7/src8 documents
# ---------------------------------------------------------------------------

_DSIR_SOURCES = ("src7", "src8")

ORACLE_DSIR = f"""
WITH toks AS (
  SELECT doc_id, (source IN ('{_DSIR_SOURCES[0]}', '{_DSIR_SOURCES[1]}')) AS is_target,
         t.term
  FROM documents, unnest(string_split(text, ' ')) AS t(term)
  WHERE t.term <> ''
),
dtf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
counts AS (
  SELECT term, count(*) AS raw_n,
         sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS tgt_n
  FROM toks GROUP BY 1
),
tot AS (
  SELECT sum(raw_n)::DOUBLE AS raw_total, sum(tgt_n)::DOUBLE AS tgt_total,
         count(*)::DOUBLE AS vocab
  FROM counts
),
ratio AS (
  SELECT term,
         ln((tgt_n + 1.0) / (tgt_total + vocab))
           - ln((raw_n + 1.0) / (raw_total + vocab)) AS log_ratio
  FROM counts CROSS JOIN tot
),
wgt AS (
  SELECT doc_id, sum(tf * log_ratio) AS weight
  FROM dtf JOIN ratio USING (term) GROUP BY doc_id
)
SELECT doc_id, weight, rank FROM (
  SELECT doc_id, round(weight, 6) AS weight,
         row_number() OVER (ORDER BY round(weight, 6) DESC, doc_id ASC)::INT AS rank
  FROM wgt
) WHERE rank <= 20
"""


@register("dsir_topk", ORACLE_DSIR)
def q_dsir_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = textstats.dsir_topk(
        _docs(spark, sf_dir),
        F.col("source").isin(*_DSIR_SOURCES),
        k=20,
        alpha=1.0,
    )
    return out.select("doc_id", _r("weight").alias("weight"), "rank")


# ---------------------------------------------------------------------------
# Indexed introspection twins: the forward term-vector store + catalog
# statistics. Shares the cached v3 driver index (resume adds the forward
# stage once); documents doc_id n <-> catalog doc_id conv_{n//8:08d}:{n%8}.
# ---------------------------------------------------------------------------

ORACLE_TERM_VECTORS_IDX = f"""
WITH tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
occ AS (
  SELECT doc_id, toks[i] AS term
  FROM tok, unnest(generate_series(1, len(toks))) AS g(i)
),
local AS (
  SELECT doc_id, term, count(*)::INT AS tf
  FROM occ WHERE doc_id IN ({", ".join(str(i) for i in _TV_DOC_IDS)})
  GROUP BY doc_id, term
),
stats AS (
  SELECT term, count(DISTINCT doc_id)::INT AS df, count(*)::BIGINT AS ttf
  FROM occ WHERE term IN (SELECT DISTINCT term FROM local)
  GROUP BY term
)
SELECT l.doc_id, l.term, l.tf, s.df, s.ttf
FROM local l JOIN stats s USING (term)
"""


def _driver_index(spark: SparkSession, sf_dir: str):
    import hashlib

    from .plans.index_build import build_forward_index, build_index
    from .sources.transcripts import synthesize_transcripts

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    idx_dir = f"/tmp/driver_wand_index_v3_{tag}"
    t = synthesize_transcripts(spark, sf_dir, replicas=1)
    cat = build_index(spark, t, idx_dir, n_buckets=8)
    return build_forward_index(cat)


def _cat_doc_id(n: int) -> str:
    return f"conv_{n // 8:08d}:{n % 8}"


@register("term_vectors_from_index", ORACLE_TERM_VECTORS_IDX)
def q_term_vectors_from_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _driver_index(spark, sf_dir)
    out = introspect.term_vectors_from_index(
        cat, [_cat_doc_id(n) for n in _TV_DOC_IDS]
    )
    src = (
        F.regexp_extract("doc_id", r"conv_(\d+):", 1).cast("long") * 8
        + F.regexp_extract("doc_id", r":(\d+)$", 1).cast("long")
    )
    return out.select(
        src.alias("doc_id"), "term", "tf", "df", "ttf"
    )


@register("index_stats_from_index", ORACLE_INDEX_STATS)
def q_index_stats_from_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _driver_index(spark, sf_dir)
    out = introspect.index_stats_from_index(cat)
    return out.select(
        F.col("doc_count").cast("long").alias("doc_count"),
        F.col("empty_docs").cast("long").alias("empty_docs"),
        F.col("total_tokens").cast("long").alias("total_tokens"),
        F.col("distinct_terms").cast("long").alias("distinct_terms"),
        _r(F.col("avg_doc_length")).alias("avg_doc_length"),
        F.col("max_doc_length").cast("int").alias("max_doc_length"),
        F.col("max_tf").cast("int").alias("max_tf"),
    )


# ---------------------------------------------------------------------------
# int8 scalar-quantized ANN (quantize -> approx top-m -> exact rescore)
# ---------------------------------------------------------------------------

_SQ_K = 10
_SQ_M = 30

ORACLE_ANN_SQ = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
qt AS (
  SELECT vec_id, v,
         greatest(list_max(list_transform(v, x -> abs(x))) / 127.0, 1e-12) AS s,
         sqrt(list_dot_product(v, v)) AS nrm
  FROM e
),
q8 AS (
  SELECT vec_id, list_transform(v, x -> floor(x / s + 0.5)) AS q, s, nrm, v
  FROM qt
),
qq AS (
  SELECT vec_id AS query_id, q AS qv8, s AS qs, nrm AS qn, v AS qv
  FROM q8 WHERE vec_id IN (0, 1, 2, 3, 4)
),
approx AS (
  SELECT query_id, a.vec_id,
         round(list_dot_product(a.q, qv8) * a.s * qs / (a.nrm * qn), 6) AS approx,
         a.v, a.nrm
  FROM q8 a CROSS JOIN qq WHERE a.vec_id <> query_id
),
cand AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY approx DESC, vec_id ASC) AS arank
    FROM approx
  ) WHERE arank <= {_SQ_M}
),
ex AS (
  SELECT c.query_id, c.vec_id, c.approx,
         round(list_dot_product(q.qv, c.v) / (q.qn * c.nrm), 6) AS cos
  FROM cand c JOIN qq q USING (query_id)
)
SELECT query_id, vec_id, approx, cos, rank FROM (
  SELECT query_id, vec_id, approx, cos,
         row_number() OVER (
           PARTITION BY query_id ORDER BY cos DESC, vec_id ASC)::INT AS rank
  FROM ex
) WHERE rank <= {_SQ_K}
"""


@register("ann_sq_topk", ORACLE_ANN_SQ)
def q_ann_sq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.sq_topk(
        emb, [0, 1, 2, 3, 4], k=_SQ_K, rescore_multiplier=_SQ_M // _SQ_K
    )


# ---------------------------------------------------------------------------
# quality-aware canonical selection over the minhash dup clusters
# ---------------------------------------------------------------------------

from .entry_queries_pipeline import (  # noqa: E402
    SQL_DOCS_AUG,
    SQL_MINHASH,
    SQL_TOK_SH,
    _docs_aug,
)

ORACLE_KEEP_BEST = f"""
WITH RECURSIVE {SQL_DOCS_AUG},
{SQL_TOK_SH},
{SQL_MINHASH},
pairs AS (
  SELECT doc_a, doc_b FROM (
    SELECT c.doc_a, c.doc_b,
           coalesce(i.inter, 0)::DOUBLE
             / (sa.n_sh + sb.n_sh - coalesce(i.inter, 0)) AS jaccard
    FROM cand c
    LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
    JOIN sizes sa ON sa.doc_id = c.doc_a
    JOIN sizes sb ON sb.doc_id = c.doc_b
  ) WHERE jaccard >= 0.7
),
nodes AS (SELECT doc_a AS node FROM pairs UNION SELECT doc_b FROM pairs),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach(node, comp) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.b, r.comp FROM reach r JOIN edges e ON e.a = r.node
),
compo AS (
  SELECT node::BIGINT AS doc_id, min(comp)::BIGINT AS component_id
  FROM reach GROUP BY node
)
SELECT doc_id, component_id, quality, is_canonical FROM (
  SELECT r.doc_id, r.component_id, length(d.text)::INT AS quality,
         (row_number() OVER (
            PARTITION BY r.component_id
            ORDER BY length(d.text) DESC, r.doc_id ASC) = 1) AS is_canonical
  FROM compo r JOIN docs_aug d USING (doc_id)
)
"""


@register("dedup_keep_best", ORACLE_KEEP_BEST)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import dedup
    from .operators.components import connected_components, dedup_keep_best

    docs = _docs_aug(spark, sf_dir)
    pairs = dedup.minhash_dedup_pairs(docs, threshold=0.7)
    comp = connected_components(pairs)
    out = dedup_keep_best(
        comp, docs.select("doc_id", F.length("text").alias("quality"))
    )
    return out.select(
        "doc_id", "component_id", F.col("quality").cast("int").alias("quality"),
        "is_canonical",
    )


# ---------------------------------------------------------------------------
# rank_feature query: saturating PageRank boost over BM25 (bounded, unlike
# the raw linear blend of blended_pagerank_topk). Graph + damping shared
# with the pagerank pair.
# ---------------------------------------------------------------------------

_RF_BOOST = 1.5
_RF_PIVOT = 0.002


def _rank_feature_oracle() -> str:
    from .entry_queries import SQL_SKELETON
    from .entry_queries_graph import SQL_GRAPH

    skel = SQL_SKELETON.replace("WITH toks", "WITH RECURSIVE toks", 1)
    sat = f"{_RF_BOOST} * f.rank / (f.rank + {_RF_PIVOT})"
    return skel + ",\n" + SQL_GRAPH + f"""
SELECT doc_id, bm25, feature, blended, rank FROM (
  SELECT p.doc_id, round(p.bm25, 6) AS bm25, round(f.rank, 6) AS feature,
         round(p.bm25 + {sat}, 6) AS blended,
         row_number() OVER (
           ORDER BY round(p.bm25 + {sat}, 6) DESC, p.doc_id ASC
         )::INT AS rank
  FROM perdoc p JOIN pr_final f ON f.node = p.doc_id
) WHERE rank <= 20
"""


@register("rank_feature_topk", _rank_feature_oracle())
def q_rank_feature_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .entry_queries_graph import DAMPING, ITERS, _doc_graph
    from .operators import pagerank as pr_mod

    docs = _docs(spark, sf_dir)
    dlen = scorer.doc_lengths(docs)
    sc = scorer.score_candidates(
        scorer.doc_term_frequencies(docs), dlen,
        scorer.corpus_stats(dlen), _queries_df(spark),
    ).select("query_id", "doc_id", "bm25")
    nodes, edges = _doc_graph(docs)
    feat = pr_mod.pagerank_table(
        nodes, edges, damping=DAMPING, iterations=ITERS
    ).select(F.col("node").alias("doc_id"), F.col("pagerank").alias("feature"))
    out = retrieval_plus.rank_feature_topk(
        sc, feat, k=20, boost=_RF_BOOST, mode="saturation", pivot=_RF_PIVOT,
    )
    return out.select(
        "doc_id", _r("bm25").alias("bm25"), _r("feature").alias("feature"),
        _r("blended").alias("blended"), "rank",
    )


# ---------------------------------------------------------------------------
# Event-stream analytics (operators/events.py): Markov transitions,
# ordered funnel, JSON-property aggregation over the events table
# ---------------------------------------------------------------------------

ORACLE_TRANSITIONS = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
),
c AS (
  SELECT prev_type, event_type, count(*)::BIGINT AS n
  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
)
SELECT prev_type, event_type, n,
       round(n::DOUBLE / sum(n) OVER (PARTITION BY prev_type), 6) AS prob
FROM c
"""


@register("event_transitions", ORACLE_TRANSITIONS)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import events as ev_mod

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = ev_mod.event_transitions(ev)
    return out.select("prev_type", "event_type", "n", _r("prob").alias("prob"))


_FUNNEL_STEPS = ["view", "click", "purchase"]

ORACLE_FUNNEL = f"""
WITH s1 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = '{_FUNNEL_STEPS[0]}' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = '{_FUNNEL_STEPS[1]}' AND e.ts > s1.t
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s2 ON s2.user_id = e.user_id
  WHERE e.event_type = '{_FUNNEL_STEPS[2]}' AND e.ts > s2.t
  GROUP BY e.user_id
),
base AS (SELECT count(*)::BIGINT AS base_users FROM s1),
rep AS (
  SELECT 1 AS step, '{_FUNNEL_STEPS[0]}' AS event_type, count(*)::BIGINT AS users FROM s1
  UNION ALL
  SELECT 2, '{_FUNNEL_STEPS[1]}', count(*)::BIGINT FROM s2
  UNION ALL
  SELECT 3, '{_FUNNEL_STEPS[2]}', count(*)::BIGINT FROM s3
)
SELECT step, event_type, users,
       round(CASE WHEN base_users = 0 THEN 0.0
             ELSE users::DOUBLE / base_users END, 6) AS rate
FROM rep CROSS JOIN base
"""


@register("funnel_conversion", ORACLE_FUNNEL)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import events as ev_mod

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = ev_mod.funnel_conversion(ev, _FUNNEL_STEPS)
    return out.select(
        "step", "event_type", "users", _r("rate").alias("rate")
    )


ORACLE_JSON_PROPS = r"""
SELECT event_type, count(*)::BIGINT AS n,
       count(k)::BIGINT AS with_key,
       sum(k)::BIGINT AS sum_k,
       round(avg(k), 6) AS avg_k,
       max(k)::BIGINT AS max_k
FROM (
  SELECT event_type,
         try_cast(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS k
  FROM events
)
GROUP BY event_type
"""


@register("json_props_stats", ORACLE_JSON_PROPS)
def q_json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import events as ev_mod

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = ev_mod.json_props_stats(ev, key="k")
    return out.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("with_key").cast("long").alias("with_key"),
        F.col("sum_k").cast("long").alias("sum_k"),
        _r("avg_k").alias("avg_k"),
        F.col("max_k").cast("long").alias("max_k"),
    )


# ---------------------------------------------------------------------------
# Near-dup train/eval contamination: bipartite MinHash-LSH. Eval set =
# first-token-dropped variants of every 25th document (the docs_aug
# near-dup recipe applied cross-set).
# ---------------------------------------------------------------------------

from .functions.hashing import phash_sql  # noqa: E402
from .operators import dedup as dedup_mod  # noqa: E402

_CONTAM_MH = phash_sql("concat(shingle, '#', CAST(s.i AS VARCHAR))")
_CONTAM_ROWS = dedup_mod.NUM_HASHES // dedup_mod.BANDS

ORACLE_CONTAM_NEAR = rf"""
WITH tok_t AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
  FROM documents
),
eval_docs AS (
  SELECT doc_id AS eval_id,
         array_to_string(list_slice(toks, 2, len(toks)), ' ') AS text
  FROM tok_t WHERE doc_id % 25 = 3 AND len(toks) > 3
),
tok_e AS (
  SELECT eval_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
  FROM eval_docs
),
sh_t AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, unnest(CASE WHEN len(toks) >= 3
        THEN list_transform(generate_series(1, len(toks) - 2),
                            i -> array_to_string(list_slice(toks, i, i + 2), ' '))
        ELSE [array_to_string(toks, ' ')] END) AS shingle
    FROM tok_t) WHERE shingle <> ''
),
sh_e AS (
  SELECT DISTINCT eval_id, shingle FROM (
    SELECT eval_id, unnest(CASE WHEN len(toks) >= 3
        THEN list_transform(generate_series(1, len(toks) - 2),
                            i -> array_to_string(list_slice(toks, i, i + 2), ' '))
        ELSE [array_to_string(toks, ' ')] END) AS shingle
    FROM tok_e) WHERE shingle <> ''
),
mh_t AS (
  SELECT doc_id, s.i AS i, min({_CONTAM_MH}) AS minhash
  FROM sh_t CROSS JOIN generate_series(0, {dedup_mod.NUM_HASHES - 1}) AS s(i)
  GROUP BY doc_id, s.i
),
mh_e AS (
  SELECT eval_id, s.i AS i, min({_CONTAM_MH}) AS minhash
  FROM sh_e CROSS JOIN generate_series(0, {dedup_mod.NUM_HASHES - 1}) AS s(i)
  GROUP BY eval_id, s.i
),
bands_t AS (
  SELECT doc_id, band, string_agg(minhash::VARCHAR, ',' ORDER BY i) AS band_key
  FROM (SELECT doc_id, i, minhash, i // {_CONTAM_ROWS} AS band FROM mh_t)
  GROUP BY doc_id, band
),
bands_e AS (
  SELECT eval_id, band, string_agg(minhash::VARCHAR, ',' ORDER BY i) AS band_key
  FROM (SELECT eval_id, i, minhash, i // {_CONTAM_ROWS} AS band FROM mh_e)
  GROUP BY eval_id, band
),
cand AS (
  SELECT DISTINCT t.doc_id, e.eval_id
  FROM bands_t t JOIN bands_e e USING (band, band_key)
),
sizes_t AS (SELECT doc_id, count(*) AS n_t FROM sh_t GROUP BY doc_id),
sizes_e AS (SELECT eval_id, count(*) AS n_e FROM sh_e GROUP BY eval_id),
inter AS (
  SELECT c.doc_id, c.eval_id, count(*) AS inter
  FROM cand c
  JOIN sh_t ON sh_t.doc_id = c.doc_id
  JOIN sh_e ON sh_e.eval_id = c.eval_id AND sh_e.shingle = sh_t.shingle
  GROUP BY c.doc_id, c.eval_id
)
SELECT doc_id, eval_id, jaccard FROM (
  SELECT c.doc_id, c.eval_id,
         round(coalesce(i.inter, 0)::DOUBLE
               / (st.n_t + se.n_e - coalesce(i.inter, 0)), 6) AS jaccard
  FROM cand c
  LEFT JOIN inter i ON i.doc_id = c.doc_id AND i.eval_id = c.eval_id
  JOIN sizes_t st ON st.doc_id = c.doc_id
  JOIN sizes_e se ON se.eval_id = c.eval_id
) WHERE jaccard >= 0.5
"""


@register("contamination_near_dup", ORACLE_CONTAM_NEAR)
def q_contamination_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.tokenize import tokens_col

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    eval_docs = (
        docs.withColumn("toks", tokens_col("text"))
        .filter((F.col("doc_id") % 25 == 3) & (F.size("toks") > 3))
        .select(
            "doc_id",
            F.array_join(F.slice("toks", 2, F.size("toks") - 1), " ").alias(
                "text"
            ),
        )
    )
    out = dedup_mod.contamination_near_dup(docs, eval_docs, threshold=0.5)
    return out.select("doc_id", "eval_id", _r("jaccard").alias("jaccard"))


# ---------------------------------------------------------------------------
# ES pipeline aggregations over the hourly event histogram
# ---------------------------------------------------------------------------

ORACLE_HIST_PIPELINE = """
WITH c AS (
  SELECT date_trunc('hour', ts) AS bucket, count(*)::BIGINT AS n
  FROM events GROUP BY 1
)
SELECT strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket_start, n,
       sum(n) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)::BIGINT AS cum,
       (n - lag(n) OVER (ORDER BY bucket))::BIGINT AS deriv,
       round(avg(n) OVER (
         ORDER BY bucket ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mavg
FROM c
"""


@register("histogram_pipeline", ORACLE_HIST_PIPELINE)
def q_histogram_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import events as ev_mod

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = ev_mod.histogram_pipeline(ev, granularity="hour")
    return out.select(
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
        "n",
        F.col("cum").cast("long").alias("cum"),
        F.col("deriv").cast("long").alias("deriv"),
        _r("mavg").alias("mavg"),
    )


# ---------------------------------------------------------------------------
# BM25F served from per-field index catalogs (same oracle as bm25f_topk)
# ---------------------------------------------------------------------------


@register(
    "bm25f_topk_from_index",
    None,  # oracle attached below (shared with bm25f_topk)
)
def q_bm25f_topk_from_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    from .entry_queries_retrieval import BM25F_QUERY_TEXT, BM25F_WEIGHTS
    from .plans.index_build import build_index
    from .sources.transcripts import synthesize_transcripts

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    t = synthesize_transcripts(spark, sf_dir, replicas=1)
    cats = {}
    for f in BM25F_WEIGHTS:
        src = t if f == "text" else t.withColumn("text", F.col(f))
        cats[f] = build_index(
            spark, src, f"/tmp/driver_bm25f_index_{f}_{tag}", n_buckets=8
        )
    qdf = spark.createDataFrame(
        [("q1", BM25F_QUERY_TEXT)], "query_id string, text string"
    )
    sc = retrieval_plus.bm25f_score_from_index(cats, BM25F_WEIGHTS, qdf)
    num = (
        F.regexp_extract("doc_id", r"conv_(\d+):", 1).cast("long") * 8
        + F.regexp_extract("doc_id", r":(\d+)$", 1).cast("long")
    )
    out = sc.select(
        num.alias("doc_id"), _r("bm25f").alias("bm25f"), "covered"
    )
    w = Window.orderBy(F.desc(F.round("bm25f", 6)), F.asc("doc_id"))
    return (
        out.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
    )


from .entry_queries_retrieval import ORACLE_BM25F as _ORACLE_BM25F  # noqa: E402
from .entry_queries import ORACLES as _REG_ORACLES  # noqa: E402

_REG_ORACLES["bm25f_topk_from_index"] = _ORACLE_BM25F


# ---------------------------------------------------------------------------
# Product-quantized ANN (ADC + exact rescore)
# ---------------------------------------------------------------------------

_PQ_SUB = similarity.EMB_DIM // similarity.PQ_M


def _pq_book_values() -> str:
    rows = []
    for j, book in enumerate(similarity.pq_codebooks()):
        for cid, c in enumerate(book):
            arr = "[" + ", ".join(f"{x:.6f}" for x in c) + "]::DOUBLE[]"
            rows.append(f"({j}, {cid}, {arr}, {similarity._cn2(c)!r})")
    return ", ".join(rows)


ORACLE_ANN_PQ = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
books(j, cid, c, cn2) AS (VALUES {{books}}),
subs AS (
  SELECT vec_id, s.j, v[s.j*{_PQ_SUB}+1 : s.j*{_PQ_SUB}+{_PQ_SUB}] AS sv
  FROM e, unnest(generate_series(0, {similarity.PQ_M - 1})) AS s(j)
),
dist AS (
  SELECT vec_id, s.j, b.cid, b.cn2 - 2*list_dot_product(s.sv, b.c) AS d, b.cn2
  FROM subs s JOIN books b ON b.j = s.j
),
codes AS (
  SELECT vec_id, j, cid, cn2 FROM (
    SELECT vec_id, j, cid, cn2,
           row_number() OVER (PARTITION BY vec_id, j ORDER BY d ASC, cid ASC) AS rn
    FROM dist
  ) WHERE rn = 1
),
pqn AS (SELECT vec_id, sqrt(list_sum(list(cn2 ORDER BY j))) AS pq_nrm
       FROM codes GROUP BY vec_id),
q AS (
  SELECT vec_id AS query_id, v AS qv, sqrt(list_dot_product(v, v)) AS qn
  FROM e WHERE vec_id IN (0, 1, 2, 3, 4)
),
qsub AS (
  SELECT query_id, s.j, qv[s.j*{_PQ_SUB}+1 : s.j*{_PQ_SUB}+{_PQ_SUB}] AS qsv
  FROM q, unnest(generate_series(0, {similarity.PQ_M - 1})) AS s(j)
),
adc AS (
  SELECT qs.query_id, c.vec_id,
         list_sum(list(list_dot_product(qs.qsv, b.c) ORDER BY c.j)) AS adc
  FROM codes c
  JOIN books b ON b.j = c.j AND b.cid = c.cid
  JOIN qsub qs ON qs.j = c.j
  GROUP BY 1, 2
),
approx AS (
  SELECT a.query_id, a.vec_id, round(a.adc / (q.qn * p.pq_nrm), 6) AS approx
  FROM adc a
  JOIN q ON q.query_id = a.query_id
  JOIN pqn p ON p.vec_id = a.vec_id
  WHERE a.vec_id <> a.query_id
),
cand AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY approx DESC, vec_id ASC) AS arank
    FROM approx
  ) WHERE arank <= {_SQ_M}
),
ex AS (
  SELECT c.query_id, c.vec_id, c.approx,
         round(list_dot_product(q.qv, e.v)
               / (q.qn * sqrt(list_dot_product(e.v, e.v))), 6) AS cos
  FROM cand c JOIN q USING (query_id) JOIN e ON e.vec_id = c.vec_id
)
SELECT query_id, vec_id, approx, cos, rank FROM (
  SELECT query_id, vec_id, approx, cos,
         row_number() OVER (
           PARTITION BY query_id ORDER BY cos DESC, vec_id ASC)::INT AS rank
  FROM ex
) WHERE rank <= {_SQ_K}
""".replace("{books}", _pq_book_values())


@register("ann_pq_topk", ORACLE_ANN_PQ)
def q_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized ANN: 8 subspaces x 16 fixed codebook centroids,
    ADC scoring via per-query lookup tables, exact rescore of the top-30
    pool, final top-10. The oracle replays encode (argmin by
    ||c||^2 - 2*dot, centroid-id tie-break), the reconstructed-norm
    denominator, and both ranking phases with identical literals."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.pq_topk(
        emb, [0, 1, 2, 3, 4], k=_SQ_K, rescore_multiplier=_SQ_M // _SQ_K
    )


# ---------------------------------------------------------------------------
# IVF-PQ ANN (coarse-cell pruning x PQ/ADC compression + exact rescore)
# ---------------------------------------------------------------------------

from .entry_queries_pipeline import _centroid_values  # noqa: E402

ORACLE_ANN_IVFPQ = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents(ccid, cc) AS (VALUES {{cents}}),
books(j, cid, c, cn2) AS (VALUES {{books}}),
scoredc AS (
  SELECT e.vec_id, e.v, cents.ccid, list_dot_product(e.v, cents.cc) AS d
  FROM e CROSS JOIN cents
),
rankedc AS (
  SELECT vec_id, v, ccid,
         row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, ccid DESC) AS rn
  FROM scoredc
),
assign AS (SELECT vec_id, ccid AS cell FROM rankedc WHERE rn = 1),
subs AS (
  SELECT vec_id, s.j, v[s.j*{_PQ_SUB}+1 : s.j*{_PQ_SUB}+{_PQ_SUB}] AS sv
  FROM e, unnest(generate_series(0, {similarity.PQ_M - 1})) AS s(j)
),
dist AS (
  SELECT vec_id, s.j, b.cid, b.cn2 - 2*list_dot_product(s.sv, b.c) AS d, b.cn2
  FROM subs s JOIN books b ON b.j = s.j
),
codes AS (
  SELECT vec_id, j, cid, cn2 FROM (
    SELECT vec_id, j, cid, cn2,
           row_number() OVER (PARTITION BY vec_id, j ORDER BY d ASC, cid ASC) AS rn
    FROM dist
  ) WHERE rn = 1
),
pqn AS (SELECT vec_id, sqrt(list_sum(list(cn2 ORDER BY j))) AS pq_nrm
       FROM codes GROUP BY vec_id),
q AS (
  SELECT vec_id AS query_id, v AS qv, sqrt(list_dot_product(v, v)) AS qn
  FROM e WHERE vec_id IN (0, 1, 2, 3, 4)
),
qprobe AS (
  SELECT vec_id AS query_id, ccid AS cell
  FROM rankedc WHERE vec_id IN (0, 1, 2, 3, 4) AND rn <= {similarity.NPROBE}
),
qsub AS (
  SELECT query_id, s.j, qv[s.j*{_PQ_SUB}+1 : s.j*{_PQ_SUB}+{_PQ_SUB}] AS qsv
  FROM q, unnest(generate_series(0, {similarity.PQ_M - 1})) AS s(j)
),
cand0 AS (
  SELECT qp.query_id, a.vec_id
  FROM qprobe qp JOIN assign a USING (cell)
  WHERE a.vec_id <> qp.query_id
),
adc AS (
  SELECT c0.query_id, c0.vec_id,
         list_sum(list(list_dot_product(qs.qsv, b.c) ORDER BY c.j)) AS adc
  FROM cand0 c0
  JOIN codes c ON c.vec_id = c0.vec_id
  JOIN books b ON b.j = c.j AND b.cid = c.cid
  JOIN qsub qs ON qs.query_id = c0.query_id AND qs.j = c.j
  GROUP BY 1, 2
),
approx AS (
  SELECT a.query_id, a.vec_id, round(a.adc / (q.qn * p.pq_nrm), 6) AS approx
  FROM adc a
  JOIN q ON q.query_id = a.query_id
  JOIN pqn p ON p.vec_id = a.vec_id
),
cand AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY approx DESC, vec_id ASC) AS arank
    FROM approx
  ) WHERE arank <= {_SQ_M}
),
ex AS (
  SELECT c.query_id, c.vec_id, c.approx,
         round(list_dot_product(q.qv, e.v)
               / (q.qn * sqrt(list_dot_product(e.v, e.v))), 6) AS cos
  FROM cand c JOIN q USING (query_id) JOIN e ON e.vec_id = c.vec_id
)
SELECT query_id, vec_id, approx, cos, rank FROM (
  SELECT query_id, vec_id, approx, cos,
         row_number() OVER (
           PARTITION BY query_id ORDER BY cos DESC, vec_id ASC)::INT AS rank
  FROM ex
) WHERE rank <= {_SQ_K}
""".replace("{books}", _pq_book_values()).replace("{cents}", _centroid_values())


@register("ann_ivfpq_topk", ORACLE_ANN_IVFPQ)
def q_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ: nprobe coarse cells prune the candidate set, PQ/ADC table
    lookups score it, exact rescore of the top-30 pool, final top-10 —
    the FAISS IVFx,PQy serving architecture with both fixed-literal
    quantizers replayed by the oracle."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.ivfpq_topk(
        emb, [0, 1, 2, 3, 4], k=_SQ_K,
        rescore_multiplier=_SQ_M // _SQ_K,
    )


# ---------------------------------------------------------------------------
# ES matrix_stats aggregation: pairwise covariance/correlation matrix
# ---------------------------------------------------------------------------

_MS_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _matrix_stats_oracle() -> str:
    cols = _MS_COLS
    moments = ["count(*)::BIGINT AS n"]
    for c in cols:
        moments.append(f"sum({c}::DOUBLE) AS s_{c}")
    for i, a in enumerate(cols):
        for b in cols[i:]:
            moments.append(f"sum({a}::DOUBLE * {b}::DOUBLE) AS p_{a}_{b}")
    rows = []
    for i, a in enumerate(cols):
        for b in cols[i:]:
            rows.append(f"""
SELECT '{a}' AS field_a, '{b}' AS field_b, n AS count,
       round(s_{a} / n, 6) AS mean_a,
       round(p_{a}_{b} / n - (s_{a} / n) * (s_{b} / n), 6) AS covariance,
       round(CASE WHEN (p_{a}_{a} / n - (s_{a} / n) * (s_{a} / n)) > 0
                   AND (p_{b}_{b} / n - (s_{b} / n) * (s_{b} / n)) > 0
             THEN (p_{a}_{b} / n - (s_{a} / n) * (s_{b} / n))
                  / sqrt((p_{a}_{a} / n - (s_{a} / n) * (s_{a} / n))
                         * (p_{b}_{b} / n - (s_{b} / n) * (s_{b} / n)))
             END, 6) AS correlation
FROM m""")
    return (
        "WITH m AS (SELECT " + ", ".join(moments)
        + ", count(*)::DOUBLE AS nd FROM lineitem)\n"
        + "\nUNION ALL".join(rows)
    ).replace("/ n", "/ nd")


@register("matrix_stats", _matrix_stats_oracle())
def q_matrix_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES matrix_stats over lineitem's four numeric measures: one 1-row
    moment aggregate, matrix derived driver-free via a literal pair
    explode; population covariance + Pearson correlation at 6dp."""
    from .operators import events as events_mod

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return events_mod.matrix_stats(li, _MS_COLS)
