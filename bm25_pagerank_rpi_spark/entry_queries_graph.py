"""Driver pairs for the link-analysis family: native PageRank and the
full 24-dimensional feature vector (reference types.go:50-89).

The graph for the driver check derives deterministically from the
``documents`` table with the same conv/turn arithmetic as the transcript
synthesis (sources/transcripts.py, replicas=1): conv = doc_id // 8,
turn = doc_id % 8. Edges: forward within-conversation adjacency
(doc -> doc+1 in the same conv) plus a return-to-root edge
(doc -> conv*8 for turn > 0). Every node has out-degree >= 1, so no
dangling mass and the damped power method is oracle-checkable with a
recursive CTE in DuckDB — a full value check on an iterative algorithm,
not a rows-only fallback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .entry_queries import SQL_SKELETON, _docs, _feature_block, _r, register
from .operators import features, pagerank
from .sources.transcripts import ROLES, TOOLS

DAMPING = 0.85
ITERS = 10


def _doc_graph(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    nodes = docs.select(F.col("doc_id").alias("node"))
    a = docs.select(F.col("doc_id").alias("src"))
    b = docs.select(F.col("doc_id").alias("dst"))
    forward = a.join(
        b,
        (F.col("dst") == F.col("src") + 1)
        & (F.expr("src div 8") == F.expr("dst div 8")),
    )
    to_root = docs.filter(F.col("doc_id") % 8 != 0).select(
        F.col("doc_id").alias("src"),
        (F.expr("doc_id div 8") * 8).alias("dst"),
    )
    return nodes, forward.unionByName(to_root)


SQL_GRAPH = """
nodes AS (SELECT doc_id AS node FROM documents),
edges AS (
  SELECT a.doc_id AS src, b.doc_id AS dst
  FROM documents a JOIN documents b
    ON b.doc_id = a.doc_id + 1 AND a.doc_id // 8 = b.doc_id // 8
  UNION ALL
  SELECT doc_id, (doc_id // 8) * 8 FROM documents WHERE doc_id % 8 <> 0
),
outs AS (SELECT src, list(dst) AS dsts, count(*) AS out_deg FROM edges GROUP BY src),
nn AS (SELECT count(*) AS n FROM nodes),
pr AS (
  SELECT 0 AS iter, node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes
  UNION ALL
  SELECT iter, (s).t AS node,
         {base} / (SELECT n FROM nn) + {damping} * sum((s).v) AS rank
  FROM (
    SELECT p.iter + 1 AS iter,
           unnest(list_prepend(struct_pack(t := p.node, v := 0.0),
             coalesce(list_transform(o.dsts, x -> struct_pack(t := x, v := p.rank / o.out_deg)),
                      CAST([] AS STRUCT(t BIGINT, v DOUBLE)[])))) AS s
    FROM pr p LEFT JOIN outs o ON o.src = p.node
    WHERE p.iter < {iters}
  )
  GROUP BY iter, (s).t
),
pr_final AS (SELECT node, rank FROM pr WHERE iter = {iters}),
link_info AS (
  SELECT n.node,
         coalesce(i.c, 0)::INT AS inlinks,
         coalesce(o.out_deg, 0)::INT AS outlinks
  FROM nodes n
  LEFT JOIN (SELECT dst, count(*) AS c FROM edges GROUP BY dst) i ON i.dst = n.node
  LEFT JOIN outs o ON o.src = n.node
)""".format(base=1.0 - DAMPING, damping=DAMPING, iters=ITERS)


@register(
    "pagerank",
    f"""
WITH RECURSIVE {SQL_GRAPH}
SELECT node, round(rank, 6) AS pagerank, inlinks, outlinks
FROM pr_final JOIN link_info USING (node)
""",
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes, edges = _doc_graph(_docs(spark, sf_dir))
    out = pagerank.pagerank_table(nodes, edges, damping=DAMPING, iterations=ITERS)
    return out.select("node", _r("pagerank").alias("pagerank"), "inlinks", "outlinks")


# ---------------------------------------------------------------------------
# full 24-feature vector (types.go:50-89) for the reference query's top-20
# ---------------------------------------------------------------------------

def _url_col() -> F.Column:
    turn = (F.col("doc_id") % 8).cast("int")
    conv = F.concat(F.lit("conv_"), F.format_string("%08d", F.expr("doc_id div 8")))
    role = F.element_at(F.array(*[F.lit(r) for r in ROLES]), turn % 4 + 1)
    tool = F.element_at(
        F.array(*[F.lit(t) for t in TOOLS]), (F.col("doc_id") % 16 / 4 + 1).cast("int")
    )
    return F.concat_ws("/", conv, turn.cast("string"), role, tool)


def _role_sql() -> str:
    whens = " ".join(f"WHEN {i} THEN '{r}'" for i, r in enumerate(ROLES[:-1]))
    return f"CASE (doc_id % 8) % 4 {whens} ELSE '{ROLES[-1]}' END"


def _tool_sql() -> str:
    whens = " ".join(f"WHEN {i} THEN '{t}'" for i, t in enumerate(TOOLS[:-1]))
    return f"CASE (doc_id % 16) // 4 {whens} ELSE '{TOOLS[-1]}' END"


_FEATURE_SQL = f"""
, urlt AS (
  SELECT doc_id,
         concat_ws('/', concat('conv_', printf('%08d', doc_id // 8)),
                   CAST(doc_id % 8 AS VARCHAR), {_role_sql()}, {_tool_sql()}) AS url
  FROM documents
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY round(bm25, 6) DESC, doc_id ASC)::INT AS rank
  FROM perdoc
)
SELECT r.doc_id, r.rank,
  r.covered_query_term_number,
  round(r.covered_query_term_number::DOUBLE / r.n_terms, 6) AS covered_query_term_ratio,
  r.sum_tf, r.min_tf, r.max_tf,
  round(r.mean_tf, 6) AS mean_tf, round(r.var_tf, 6) AS var_tf,
  r.stream_length::INT AS stream_length,
  round(coalesce(r.s_ntf, 0.0), 6) AS sum_ntf,
  round(coalesce(r.mn_ntf, 0.0), 6) AS min_ntf,
  round(coalesce(r.mx_ntf, 0.0), 6) AS max_ntf,
  round(coalesce(r.me_ntf, 0.0), 6) AS mean_ntf,
  round(coalesce(r.v_ntf, 0.0), 6) AS var_ntf,
  round(CASE WHEN r.n_idf_terms > 0 THEN r.s_tfidf ELSE 0.0 END, 6) AS sum_tfidf,
  round(CASE WHEN r.n_idf_terms > 0 THEN r.mn_tfidf ELSE 0.0 END, 6) AS min_tfidf,
  round(CASE WHEN r.n_idf_terms > 0 THEN r.mx_tfidf ELSE 0.0 END, 6) AS max_tfidf,
  round(CASE WHEN r.n_idf_terms > 0 THEN r.me_tfidf ELSE 0.0 END, 6) AS mean_tfidf,
  round(CASE WHEN r.n_idf_terms > 0 THEN r.v_tfidf ELSE 0.0 END, 6) AS var_tfidf,
  round(r.bm25, 6) AS bm25,
  (length(u.url) - length(replace(u.url, '/', '')))::INT AS num_slashes_in_url,
  strlen(u.url)::INT AS length_of_url,
  li.inlinks AS inlink_count,
  li.outlinks AS outlink_count,
  round(coalesce(p.rank, 0.0), 6) AS page_rank
FROM ranked r
JOIN urlt u ON u.doc_id = r.doc_id
LEFT JOIN pr_final p ON p.node = r.doc_id
LEFT JOIN link_info li ON li.node = r.doc_id
WHERE r.rank <= 20
"""


@register(
    "feature_vector",
    SQL_SKELETON.replace("WITH toks", "WITH RECURSIVE toks", 1)
    + ", "
    + SQL_GRAPH.lstrip("\n")
    + _FEATURE_SQL,
)
def q_feature_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    scored = _feature_block(spark, sf_dir)
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("bm25", 6)), F.asc("doc_id")
    )
    top = scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 20)
    meta = docs.select("doc_id", _url_col().alias("url"))
    nodes, edges = _doc_graph(docs)
    prt = pagerank.pagerank_table(nodes, edges, damping=DAMPING, iterations=ITERS)
    out = features.assemble(top, meta, prt)
    dbl = {
        "covered_query_term_ratio", "mean_tf", "var_tf",
        "sum_ntf", "min_ntf", "max_ntf", "mean_ntf", "var_ntf",
        "sum_tfidf", "min_tfidf", "max_tfidf", "mean_tfidf", "var_tfidf",
        "bm25", "page_rank",
    }
    cols = [
        _r(c).alias(c) if c in dbl else F.col(c)
        for c in ["doc_id", "rank", *features.FEATURE_COLUMNS]
    ]
    return out.select(*cols)


# ---------------------------------------------------------------------------
# Personalized PageRank: teleport uniform over the source set
# (doc_id % 97 == 0) instead of all nodes — full recursive-CTE value check
# of the iterative computation, like the uniform pair above.
# ---------------------------------------------------------------------------

ORACLE_PPR = """
WITH RECURSIVE
nodes AS (SELECT doc_id AS node FROM documents),
edges AS (
  SELECT a.doc_id AS src, b.doc_id AS dst
  FROM documents a JOIN documents b
    ON b.doc_id = a.doc_id + 1 AND a.doc_id // 8 = b.doc_id // 8
  UNION ALL
  SELECT doc_id, (doc_id // 8) * 8 FROM documents WHERE doc_id % 8 <> 0
),
outs AS (SELECT src, list(dst) AS dsts, count(*) AS out_deg FROM edges GROUP BY src),
ns AS (SELECT count(*) AS k FROM nodes WHERE node % 97 = 0),
ppr AS (
  SELECT 0 AS iter, node,
         CASE WHEN node % 97 = 0 THEN 1.0 / (SELECT k FROM ns) ELSE 0.0 END AS rank
  FROM nodes
  UNION ALL
  SELECT iter, (s).t AS node,
         CASE WHEN (s).t % 97 = 0
              THEN {base} / (SELECT k FROM ns) ELSE 0.0 END
           + {damping} * sum((s).v) AS rank
  FROM (
    SELECT p.iter + 1 AS iter,
           unnest(list_prepend(struct_pack(t := p.node, v := 0.0),
             coalesce(list_transform(o.dsts, x -> struct_pack(t := x, v := p.rank / o.out_deg)),
                      CAST([] AS STRUCT(t BIGINT, v DOUBLE)[])))) AS s
    FROM ppr p LEFT JOIN outs o ON o.src = p.node
    WHERE p.iter < {iters}
  )
  GROUP BY iter, (s).t
)
SELECT node, round(rank, 6) AS pagerank FROM ppr WHERE iter = {iters}
""".format(base=1.0 - DAMPING, damping=DAMPING, iters=ITERS)


@register("personalized_pagerank", ORACLE_PPR)
def q_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    nodes, edges = _doc_graph(docs)
    sources = nodes.filter(F.col("node") % 97 == 0)
    out = pagerank.personalized_pagerank(
        nodes, edges, sources, damping=DAMPING, iterations=ITERS
    )
    return out.select("node", _r("pagerank").alias("pagerank"))


# ---------------------------------------------------------------------------
# HITS hubs/authorities over the same doc graph
# ---------------------------------------------------------------------------

HITS_ITERS = 4


def _hits_oracle(iters: int) -> str:
    """Unrolled HITS: one (auth_raw, auth, hub_raw, hub) CTE quartet per
    iteration — a full value oracle for the iterative algorithm, like the
    recursive-CTE PageRank check but with the L1 normalizer per half-step
    (window-free, so no recursion restrictions apply).

    Every CTE is MATERIALIZED: DuckDB inlines plain CTEs, and each
    iteration references the previous one twice (the normalizer subquery
    + the join), so un-materialized the plan tree — and the number of
    parquet scans of `documents` — doubles per half-step (fd exhaustion
    at 4 iterations). Materialization makes it linear, 0.05s at sf0.001."""
    parts = ["""
WITH nodes AS MATERIALIZED (SELECT doc_id AS node FROM documents),
edges AS MATERIALIZED (
  SELECT a.doc_id AS src, b.doc_id AS dst
  FROM documents a JOIN documents b
    ON b.doc_id = a.doc_id + 1 AND a.doc_id // 8 = b.doc_id // 8
  UNION ALL
  SELECT doc_id, (doc_id // 8) * 8 FROM documents WHERE doc_id % 8 <> 0
),
h0 AS MATERIALIZED (SELECT node, 1.0 AS h FROM nodes)"""]
    for i in range(1, iters + 1):
        parts.append(f""",
a{i}r AS MATERIALIZED (SELECT e.dst AS node, sum(p.h) AS v
          FROM edges e JOIN h{i - 1} p ON p.node = e.src GROUP BY e.dst),
a{i} AS MATERIALIZED (SELECT n.node,
           CASE WHEN (SELECT sum(v) FROM a{i}r) > 0
                THEN coalesce(r.v, 0.0) / (SELECT sum(v) FROM a{i}r)
                ELSE 0.0 END AS a
         FROM nodes n LEFT JOIN a{i}r r USING (node)),
h{i}r AS MATERIALIZED (SELECT e.src AS node, sum(p.a) AS v
          FROM edges e JOIN a{i} p ON p.node = e.dst GROUP BY e.src),
h{i} AS MATERIALIZED (SELECT n.node,
           CASE WHEN (SELECT sum(v) FROM h{i}r) > 0
                THEN coalesce(r.v, 0.0) / (SELECT sum(v) FROM h{i}r)
                ELSE 0.0 END AS h
         FROM nodes n LEFT JOIN h{i}r r USING (node))""")
    parts.append(f"""
SELECT n.node, round(a.a, 6) AS authority, round(h.h, 6) AS hub
FROM nodes n JOIN a{iters} a USING (node) JOIN h{iters} h USING (node)""")
    return "".join(parts)


@register("hits_scores", _hits_oracle(HITS_ITERS))
def q_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kleinberg HITS over the deterministic doc graph: within a
    conversation the root turn collects every return edge (top
    authority), later turns that link forward AND back are the hubs —
    the complementary link-analysis signal to the PageRank prior."""
    nodes, edges = _doc_graph(_docs(spark, sf_dir))
    out = pagerank.hits(nodes, edges, iterations=HITS_ITERS)
    return out.select(
        "node", _r("authority").alias("authority"), _r("hub").alias("hub")
    )


# ---------------------------------------------------------------------------
# Weighted PageRank: same graph, return-to-root edges carry 3x the mass of
# forward adjacency — rank distributes proportionally to edge weight
# (out_deg becomes the weight sum). Same recursive-CTE value oracle with
# weighted transitions.
# ---------------------------------------------------------------------------

_W_FWD, _W_ROOT = 1.0, 3.0

SQL_WGRAPH = """
nodes AS (SELECT doc_id AS node FROM documents),
edges AS (
  SELECT a.doc_id AS src, b.doc_id AS dst, {wf} AS w
  FROM documents a JOIN documents b
    ON b.doc_id = a.doc_id + 1 AND a.doc_id // 8 = b.doc_id // 8
  UNION ALL
  SELECT doc_id, (doc_id // 8) * 8, {wr} FROM documents WHERE doc_id % 8 <> 0
),
outs AS (
  SELECT src, list(struct_pack(t := dst, w := w)) AS dsts, sum(w) AS out_w
  FROM edges GROUP BY src
),
nn AS (SELECT count(*) AS n FROM nodes),
pr AS (
  SELECT 0 AS iter, node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes
  UNION ALL
  SELECT iter, (s).t AS node,
         {base} / (SELECT n FROM nn) + {damping} * sum((s).v) AS rank
  FROM (
    SELECT p.iter + 1 AS iter,
           unnest(list_prepend(struct_pack(t := p.node, v := 0.0),
             coalesce(list_transform(o.dsts,
                        x -> struct_pack(t := x.t, v := p.rank * x.w / o.out_w)),
                      CAST([] AS STRUCT(t BIGINT, v DOUBLE)[])))) AS s
    FROM pr p LEFT JOIN outs o ON o.src = p.node
    WHERE p.iter < {iters}
  )
  GROUP BY iter, (s).t
),
pr_final AS (SELECT node, rank FROM pr WHERE iter = {iters})
""".format(
    base=1.0 - DAMPING, damping=DAMPING, iters=ITERS, wf=_W_FWD, wr=_W_ROOT
)


def _weighted_doc_graph(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    nodes, edges_unw = _doc_graph(docs)
    a = docs.select(F.col("doc_id").alias("src"))
    b = docs.select(F.col("doc_id").alias("dst"))
    forward = a.join(
        b,
        (F.col("dst") == F.col("src") + 1)
        & (F.expr("src div 8") == F.expr("dst div 8")),
    ).withColumn("weight", F.lit(_W_FWD))
    to_root = docs.filter(F.col("doc_id") % 8 != 0).select(
        F.col("doc_id").alias("src"),
        (F.expr("doc_id div 8") * 8).alias("dst"),
    ).withColumn("weight", F.lit(_W_ROOT))
    return nodes, forward.unionByName(to_root)


@register(
    "weighted_pagerank",
    f"""
WITH RECURSIVE {SQL_WGRAPH}
SELECT node, round(rank, 6) AS pagerank FROM pr_final
""",
)
def q_weighted_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes, edges = _weighted_doc_graph(_docs(spark, sf_dir))
    out = pagerank.pagerank(nodes, edges, damping=DAMPING, iterations=ITERS)
    return out.select("node", _r("pagerank").alias("pagerank"))


# ---------------------------------------------------------------------------
# SALSA: degree-normalized HITS (random walk on the bipartite graph)
# ---------------------------------------------------------------------------

SALSA_ITERS = 4


def _salsa_oracle(iters: int) -> str:
    """Unrolled SALSA on the same doc graph as hits_scores: edge weights
    1/outdeg(src) (auth pass) and 1/indeg(dst) (hub pass) precomputed in
    a MATERIALIZED wedges CTE, then the identical normalize-per-half-step
    unroll as _hits_oracle."""
    parts = ["""
WITH nodes AS MATERIALIZED (SELECT doc_id AS node FROM documents),
edges AS MATERIALIZED (
  SELECT a.doc_id AS src, b.doc_id AS dst
  FROM documents a JOIN documents b
    ON b.doc_id = a.doc_id + 1 AND a.doc_id // 8 = b.doc_id // 8
  UNION ALL
  SELECT doc_id, (doc_id // 8) * 8 FROM documents WHERE doc_id % 8 <> 0
),
wedges AS MATERIALIZED (
  SELECT e.src, e.dst,
         1.0 / od.n AS w_auth, 1.0 / id.n AS w_hub
  FROM edges e
  JOIN (SELECT src, count(*) AS n FROM edges GROUP BY src) od USING (src)
  JOIN (SELECT dst, count(*) AS n FROM edges GROUP BY dst) id USING (dst)
),
h0 AS MATERIALIZED (SELECT node, 1.0 AS h FROM nodes)"""]
    for i in range(1, iters + 1):
        parts.append(f""",
a{i}r AS MATERIALIZED (SELECT e.dst AS node, sum(p.h * e.w_auth) AS v
          FROM wedges e JOIN h{i - 1} p ON p.node = e.src GROUP BY e.dst),
a{i} AS MATERIALIZED (SELECT n.node,
           CASE WHEN (SELECT sum(v) FROM a{i}r) > 0
                THEN coalesce(r.v, 0.0) / (SELECT sum(v) FROM a{i}r)
                ELSE 0.0 END AS a
         FROM nodes n LEFT JOIN a{i}r r USING (node)),
h{i}r AS MATERIALIZED (SELECT e.src AS node, sum(p.a * e.w_hub) AS v
          FROM wedges e JOIN a{i} p ON p.node = e.dst GROUP BY e.src),
h{i} AS MATERIALIZED (SELECT n.node,
           CASE WHEN (SELECT sum(v) FROM h{i}r) > 0
                THEN coalesce(r.v, 0.0) / (SELECT sum(v) FROM h{i}r)
                ELSE 0.0 END AS h
         FROM nodes n LEFT JOIN h{i}r r USING (node))""")
    parts.append(f"""
SELECT n.node, round(a.a, 6) AS authority, round(h.h, 6) AS hub
FROM nodes n JOIN a{iters} a USING (node) JOIN h{iters} h USING (node)""")
    return "".join(parts)


@register("salsa_scores", _salsa_oracle(SALSA_ITERS))
def q_salsa_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SALSA (Lempel & Moran 2000) over the same deterministic doc graph
    as hits_scores: degree-normalized propagation damps the
    tightly-knit-community inflation HITS exhibits — the link-analysis
    menu's third member alongside PageRank and HITS."""
    nodes, edges = _doc_graph(_docs(spark, sf_dir))
    out = pagerank.salsa(nodes, edges, iterations=SALSA_ITERS)
    return out.select(
        "node", _r("authority").alias("authority"), _r("hub").alias("hub")
    )
