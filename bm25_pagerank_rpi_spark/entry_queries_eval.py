"""Driver pairs: retrieval-quality evaluation, MMR diversification,
collocation mining, and exact corpus quantiles.

qrels fixture for the evaluation pair: deterministic graded judgments
derived from the documents table — a doc is judged relevant iff it
covers >= 6 of the reference query's term slots AND doc_id % 3 == 0
(grade = covered - 5, so 1 or 2). The %3 filter decorrelates judgments
from the BM25 ordering enough that every metric lands strictly inside
(0, 1) — the formulas are actually exercised, not saturated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .entry_queries import (
    SQL_SKELETON,
    _docs,
    _queries_df,
    _r,
    register,
)
from .operators import evaluation, scorer, similarity, textstats

_RUN_K = 20
_EVAL_K = 10

ORACLE_EVAL = SQL_SKELETON + f"""
, run AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY round(bm25, 6) DESC, doc_id ASC) AS rank
  FROM perdoc QUALIFY rank <= {_RUN_K}
),
qrels AS (
  SELECT doc_id,
         CASE WHEN covered_query_term_number >= 6 AND doc_id % 3 = 0
              THEN covered_query_term_number - 5 ELSE 0 END AS rel
  FROM perdoc
),
top AS (
  SELECT r.rank, coalesce(q.rel, 0) AS rel,
         CASE WHEN coalesce(q.rel, 0) > 0 THEN 1 ELSE 0 END AS hit
  FROM run r LEFT JOIN qrels q USING (doc_id)
  WHERE r.rank <= {_EVAL_K}
),
topc AS (SELECT *, sum(hit) OVER (ORDER BY rank) AS cum_hits FROM top),
agg AS (
  SELECT sum((pow(2, rel) - 1) / (ln(rank + 1) / ln(2))) AS dcg,
         sum(hit) AS hits,
         sum(hit * cum_hits::DOUBLE / rank) AS ap_num,
         min(CASE WHEN hit = 1 THEN rank END) AS first_hit
  FROM topc
),
ideal AS (
  SELECT sum(CASE WHEN irank <= {_EVAL_K}
                  THEN (pow(2, rel) - 1) / (ln(irank + 1) / ln(2))
                  ELSE 0 END) AS idcg,
         count(*) AS n_rel
  FROM (SELECT rel, row_number() OVER (ORDER BY rel DESC, doc_id ASC) AS irank
        FROM qrels WHERE rel > 0)
)
SELECT 'q1' AS query_id,
       round(CASE WHEN coalesce(idcg, 0) > 0 THEN dcg / idcg ELSE 0 END, 6) AS ndcg,
       round(coalesce(1.0 / first_hit, 0), 6) AS mrr,
       round(hits::DOUBLE / {_EVAL_K}, 6) AS precision_at_k,
       round(CASE WHEN n_rel > 0 THEN hits::DOUBLE / n_rel ELSE 0 END, 6) AS recall_at_k,
       round(CASE WHEN n_rel > 0
                  THEN coalesce(ap_num, 0) / least(n_rel, {_EVAL_K})
                  ELSE 0 END, 6) AS ap
FROM agg CROSS JOIN ideal
"""


@register("ir_eval_metrics", ORACLE_EVAL)
def q_ir_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    dlen = scorer.doc_lengths(docs)
    sc = scorer.score_candidates(
        scorer.doc_term_frequencies(docs), dlen,
        scorer.corpus_stats(dlen), _queries_df(spark),
    )
    run = scorer.topk(
        sc.select("query_id", "doc_id", _r("bm25").alias("bm25")), _RUN_K
    ).select("query_id", "doc_id", "rank")
    qrels = sc.select(
        "query_id",
        "doc_id",
        F.when(
            (F.col("covered_query_term_number") >= 6) & (F.col("doc_id") % 3 == 0),
            F.col("covered_query_term_number") - 5,
        )
        .otherwise(F.lit(0))
        .alias("rel"),
    )
    out = evaluation.eval_metrics(run, qrels, k=_EVAL_K)
    return out.select(
        "query_id",
        _r("ndcg").alias("ndcg"),
        _r("mrr").alias("mrr"),
        _r("precision_at_k").alias("precision_at_k"),
        _r("recall_at_k").alias("recall_at_k"),
        _r("ap").alias("ap"),
    )


# ---------------------------------------------------------------------------
# MMR diversified re-ranking over the embedding ANN pool (greedy selection,
# recursive-CTE oracle). lam = 0.7, pool = exact top-30 around vec 0.
# ---------------------------------------------------------------------------

_MMR_POOL = 30
_MMR_K = 10
_MMR_LAM = 0.7

_COS = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)

ORACLE_MMR = f"""
WITH RECURSIVE
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
qv AS (SELECT v AS qv FROM e WHERE vec_id = 0),
cand AS (
  SELECT vec_id AS doc_id, v, rel FROM (
    SELECT e.vec_id, e.v,
           round({_COS.format(a='qv', b='e.v')}, 6) AS rel,
           row_number() OVER (
             ORDER BY round({_COS.format(a='qv', b='e.v')}, 6) DESC,
                      e.vec_id ASC) AS rn
    FROM e CROSS JOIN qv WHERE e.vec_id <> 0
  ) WHERE rn <= {_MMR_POOL}
),
sims AS (
  SELECT a.doc_id AS da, b.doc_id AS db,
         round({_COS.format(a='a.v', b='b.v')}, 6) AS sim
  FROM cand a JOIN cand b ON a.doc_id <> b.doc_id
),
sel(step, doc_id, mmr_score, chosen) AS (
  (SELECT 1, doc_id, rel, [doc_id] FROM cand
   ORDER BY rel DESC, doc_id ASC LIMIT 1)
  UNION ALL
  (SELECT s.step + 1, c.doc_id,
          round({_MMR_LAM} * c.rel - {1.0 - _MMR_LAM} * ms.m, 6),
          list_append(s.chosen, c.doc_id)
   FROM sel s
   JOIN cand c ON NOT list_contains(s.chosen, c.doc_id)
   JOIN LATERAL (
     SELECT max(sim) AS m FROM sims
     WHERE da = c.doc_id AND list_contains(s.chosen, db)
   ) ms ON true
   WHERE s.step < {_MMR_K}
   ORDER BY round({_MMR_LAM} * c.rel - {1.0 - _MMR_LAM} * ms.m, 6) DESC,
            c.doc_id ASC
   LIMIT 1)
)
SELECT 'q1' AS query_id, doc_id, round(mmr_score, 6) AS mmr_score,
       step::INT AS rank
FROM sel
"""


@register("mmr_rerank_topk", ORACLE_MMR)
def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cands = similarity.brute_force_topk(emb, [0], k=_MMR_POOL).select(
        F.lit("q1").alias("query_id"),
        F.col("vec_id").alias("doc_id"),
        F.col("cos").alias("rel"),
    )
    out = similarity.mmr_rerank(cands, emb, lam=_MMR_LAM, k=_MMR_K)
    return out.select(
        "query_id", "doc_id", _r("mmr_score").alias("mmr_score"), "rank"
    )


# ---------------------------------------------------------------------------
# PMI bigram collocations over the corpus (min_count=5, top-50)
# ---------------------------------------------------------------------------

_COLL_MIN = 5
_COLL_TOP = 50

ORACLE_COLLOC = f"""
WITH toklists AS (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS l FROM documents
),
uni AS (
  SELECT t.term, count(*) AS c
  FROM toklists, unnest(l) AS t(term) GROUP BY 1
),
pairs AS (
  SELECT z[1] AS w1, z[2] AS w2 FROM (
    SELECT unnest(list_zip(l, l[2:])) AS z FROM toklists
  ) WHERE z[2] IS NOT NULL
),
tot AS (
  SELECT (SELECT sum(c)::DOUBLE FROM uni) AS n_tok,
         (SELECT count(*)::DOUBLE FROM pairs) AS n_big
),
big AS (
  SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY 1, 2
  HAVING count(*) >= {_COLL_MIN}
),
scored AS (
  SELECT b.w1, b.w2, b.c12,
         round(ln((b.c12 * t.n_tok * t.n_tok) / (t.n_big * u1.c * u2.c)), 6) AS pmi
  FROM big b
  JOIN uni u1 ON u1.term = b.w1
  JOIN uni u2 ON u2.term = b.w2
  CROSS JOIN tot t
)
SELECT w1, w2, c12, pmi, rank FROM (
  SELECT *, row_number() OVER (ORDER BY pmi DESC, w1 ASC, w2 ASC)::INT AS rank
  FROM scored
) WHERE rank <= {_COLL_TOP}
"""


@register("collocations_pmi", ORACLE_COLLOC)
def q_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    out = textstats.collocations_pmi(_docs(spark, sf_dir), min_count=_COLL_MIN)
    out = out.select("w1", "w2", "c12", _r("pmi").alias("pmi"))
    w = Window.orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
    return (
        out.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _COLL_TOP)
    )


# ---------------------------------------------------------------------------
# Exact doc-length quantiles (linear interpolation — Spark `percentile`
# == DuckDB `quantile_cont`): the corpus-profiling numbers a curation
# pipeline reports before choosing length filters.
# ---------------------------------------------------------------------------

ORACLE_QUANTILES = SQL_SKELETON + """
SELECT round(quantile_cont(doc_length, 0.25), 6) AS q25,
       round(quantile_cont(doc_length, 0.50), 6) AS q50,
       round(quantile_cont(doc_length, 0.75), 6) AS q75,
       round(quantile_cont(doc_length, 0.90), 6) AS q90,
       round(quantile_cont(doc_length, 0.99), 6) AS q99
FROM doc_len
"""


@register("doc_length_quantiles", ORACLE_QUANTILES)
def q_doc_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    dlen = scorer.doc_lengths(_docs(spark, sf_dir))
    return dlen.agg(
        *[
            _r(F.expr(f"percentile(doc_length, {p})")).alias(name)
            for p, name in [
                (0.25, "q25"),
                (0.50, "q50"),
                (0.75, "q75"),
                (0.90, "q90"),
                (0.99, "q99"),
            ]
        ]
    )


# ---------------------------------------------------------------------------
# Gap-based sessionization (streaming session_window's batch twin) vs the
# classic gaps-and-islands SQL. 4h gap ~ the events fixture's 25th-pctile
# inter-event spacing, so sessions genuinely merge AND break.
# ---------------------------------------------------------------------------

_SESSION_GAP_S = 4 * 3600

ORACLE_SESSIONS = f"""
WITH o AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch(ts - lag(ts) OVER w) > {_SESSION_GAP_S} THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
i AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts) AS sid FROM o
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end_ts,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM i GROUP BY user_id, sid
"""


@register("events_sessions", ORACLE_SESSIONS)
def q_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming.turn_stats import sessionized_stats

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = sessionized_stats(ev, gap=f"{_SESSION_GAP_S} seconds")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return out.select(
        "user_id",
        F.date_format("session_start", fmt).alias("session_start"),
        F.date_format("session_end_ts", fmt).alias("session_end_ts"),
        "n_events",
        _r("sum_value").alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# Query-language extensions: term boost (^w) + numeric range filter.
# Oracle re-derives the weighted BM25 from the skeleton's occ relation with
# a per-position weight join — the same additive-over-occurrences algebra
# the Spark side exploits (one exact-scorer pass per distinct weight).
# ---------------------------------------------------------------------------

from . import B, K1  # noqa: E402
from .entry_queries import _sql_skeleton  # noqa: E402

_QLB_QUERY = "key^2 value hash -scan lang:en n_chars:[300 TO 900]"
_QLB_TERMS = ["key", "value", "hash"]
_QLB_WHERE = "lang = 'en' AND n_chars BETWEEN 300 AND 900"

ORACLE_QL_BOOSTED = _sql_skeleton(_QLB_TERMS, where=_QLB_WHERE) + f"""
, wts AS (SELECT * FROM (VALUES (0, 2.0), (1, 1.0), (2, 1.0)) v(pos, w)),
perdocw AS (
  SELECT o.doc_id,
         sum(CASE WHEN o.tf IS NOT NULL AND o.idf IS NOT NULL
             THEN w.w * o.idf * (o.tf * {K1 + 1.0}) /
                  (o.tf + {K1} * ({1.0 - B} + {B} * (o.doc_length / o.avg_doc_length)))
             ELSE 0.0 END) AS bm25
  FROM occ o JOIN wts w USING (pos) GROUP BY o.doc_id
),
gates AS (
  SELECT doc_id, NOT list_contains(
           list_filter(string_split(text, ' '), x -> x <> ''), 'scan') AS ok
  FROM documents WHERE {_QLB_WHERE}
)
SELECT doc_id, bm25, rank FROM (
  SELECT p.doc_id, round(p.bm25, 6) AS bm25,
         row_number() OVER (ORDER BY round(p.bm25, 6) DESC, p.doc_id ASC)::INT AS rank
  FROM perdocw p JOIN gates g ON g.doc_id = p.doc_id AND g.ok
) WHERE rank <= 20
"""


@register("search_query_boosted", ORACLE_QL_BOOSTED)
def q_search_query_boosted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.query_language import search

    return search(_docs(spark, sf_dir), _QLB_QUERY, k=20)


# ---------------------------------------------------------------------------
# Rank-biased overlap between the BM25 run and a length-ordered run
# (Webber et al. 2010, truncated @10, p=0.9). The oracle computes the
# per-doc prefix weight W(m) = sum_{d=m..k} p^(d-1)/d via generate_series.
# ---------------------------------------------------------------------------

_RBO_K = 10
_RBO_P = 0.9

ORACLE_RBO = SQL_SKELETON + f"""
, run_a AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY round(bm25, 6) DESC, doc_id ASC) AS rank
  FROM perdoc QUALIFY rank <= {_RBO_K}
),
run_b AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) AS rank
  FROM documents QUALIFY rank <= {_RBO_K}
),
matched AS (
  SELECT a.doc_id, greatest(a.rank, b.rank) AS m
  FROM run_a a JOIN run_b b USING (doc_id)
),
contrib AS (
  SELECT sum(pow({_RBO_P}, d.d - 1) / d.d) AS w
  FROM matched, generate_series(1, {_RBO_K}) AS d(d)
  WHERE d.d >= matched.m
)
SELECT 'q1' AS query_id,
       round((1 - {_RBO_P}) * coalesce((SELECT w FROM contrib), 0), 6) AS rbo
"""


@register("rbo_rank_similarity", ORACLE_RBO)
def q_rbo(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    dlen = scorer.doc_lengths(docs)
    sc = scorer.score_candidates(
        scorer.doc_term_frequencies(docs), dlen,
        scorer.corpus_stats(dlen), _queries_df(spark),
    )
    run_a = scorer.topk(
        sc.select("query_id", "doc_id", _r("bm25").alias("bm25")), _RBO_K
    ).select("query_id", "doc_id", "rank")
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("n_chars"), F.asc("doc_id"))
    run_b = (
        docs.select("doc_id", "n_chars")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _RBO_K)
        .select(F.lit("q1").alias("query_id"), "doc_id", "rank")
    )
    out = evaluation.rbo(run_a, run_b, k=_RBO_K, p=_RBO_P)
    return out.select("query_id", _r("rbo").alias("rbo"))
