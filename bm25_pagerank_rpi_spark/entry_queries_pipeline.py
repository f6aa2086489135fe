"""Driver query/oracle pairs for the training-data pipeline operators:
deduplication (exact / n-gram Jaccard / MinHash-LSH / SimHash /
embedding-cosine), similarity search (brute-force + LSH ANN), and the
text-analysis battery.

The driver testdata has no natural duplicates (documents are distinct,
embedding cosines top out ~0.48), so the dedup queries PLANT deterministic
duplicates inside the query itself — the identical construction in Spark
and in the oracle SQL:

  exact copies : doc_id % 10 == 0  ->  doc_id + 1_000_000, same text
  near copies  : doc_id % 10 == 1  ->  doc_id + 2_000_000, first token
                 dropped (shingle-Jaccard stays high)
  embedding    : vec_id % 50 == 0  ->  vec_id + 1_000_000, v * 2
                 (cosine == 1 with the original)

All hashing is the portable md5-based ``phash`` so MinHash/SimHash values
are bit-identical across engines (functions/hashing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .entry_queries import _docs, _r, register
from .functions.hashing import phash_sql
from .functions.tokenize import tokens_col
from .operators import dedup, similarity, textstats

# ---------------------------------------------------------------------------
# shared Spark-side constructions
# ---------------------------------------------------------------------------


def _docs_aug(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    exact = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    near = (
        docs.withColumn("toks", tokens_col("text"))
        .filter((F.col("doc_id") % 10 == 1) & (F.size("toks") > 1))
        .select(
            (F.col("doc_id") + 2000000).alias("doc_id"),
            F.array_join(F.slice("toks", 2, F.size("toks") - 1), " ").alias("text"),
        )
    )
    return docs.unionByName(exact).unionByName(near)


def _emb_aug(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", similarity.as_double_vec("embedding").alias("embedding")
    )
    planted = emb.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 2.0).alias("embedding"),
    )
    return emb.unionByName(planted)


# ---------------------------------------------------------------------------
# shared oracle CTE fragments
# ---------------------------------------------------------------------------

SQL_DOCS_AUG = r"""
docs_aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT t.doc_id + 2000000, array_to_string(list_slice(t.toks, 2, len(t.toks)), ' ')
  FROM (SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
        FROM documents) t
  WHERE t.doc_id % 10 = 1 AND len(t.toks) > 1
)"""

SQL_TOK_SH = r"""
tok AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
  FROM docs_aug
),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, unnest(CASE WHEN len(toks) >= 3
        THEN list_transform(generate_series(1, len(toks) - 2),
                            i -> array_to_string(list_slice(toks, i, i + 2), ' '))
        ELSE [array_to_string(toks, ' ')] END) AS shingle
    FROM tok) WHERE shingle <> ''
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id)"""

_MH = phash_sql("concat(shingle, '#', CAST(s.i AS VARCHAR))")

SQL_MINHASH = f"""
mh AS (
  SELECT doc_id, s.i AS i, min({_MH}) AS minhash
  FROM sh CROSS JOIN generate_series(0, {dedup.NUM_HASHES - 1}) AS s(i)
  GROUP BY doc_id, s.i
),
bands AS (
  SELECT doc_id, band, string_agg(minhash::VARCHAR, ',' ORDER BY i) AS band_key
  FROM (SELECT doc_id, i, minhash, i // {dedup.NUM_HASHES // dedup.BANDS} AS band FROM mh)
  GROUP BY doc_id, band
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS inter
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY c.doc_a, c.doc_b
)"""


# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------

@register(
    "dedup_exact",
    f"""
WITH {SQL_DOCS_AUG},
hashed AS (SELECT doc_id, {phash_sql('text')} AS content_hash FROM docs_aug),
grp AS (
  SELECT content_hash, min(doc_id) AS canonical_id
  FROM hashed GROUP BY content_hash HAVING count(*) >= 2
)
SELECT h.doc_id, g.canonical_id, h.content_hash
FROM hashed h JOIN grp g USING (content_hash)
""",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_duplicates(_docs_aug(spark, sf_dir))


@register(
    "dedup_ngram_jaccard",
    f"""
WITH {SQL_DOCS_AUG},
{SQL_TOK_SH},
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard FROM (
  SELECT i.doc_a, i.doc_b,
         i.inter::DOUBLE / (sa.n_sh + sb.n_sh - i.inter) AS jaccard
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.doc_a
  JOIN sizes sb ON sb.doc_id = i.doc_b
) WHERE jaccard >= 0.7
""",
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = dedup.ngram_jaccard_pairs(_docs_aug(spark, sf_dir), threshold=0.7)
    return out.select("doc_a", "doc_b", _r("jaccard").alias("jaccard"))


@register(
    "dedup_minhash_lsh",
    f"""
WITH {SQL_DOCS_AUG},
{SQL_TOK_SH},
{SQL_MINHASH}
SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard FROM (
  SELECT c.doc_a, c.doc_b,
         coalesce(i.inter, 0)::DOUBLE
           / (sa.n_sh + sb.n_sh - coalesce(i.inter, 0)) AS jaccard
  FROM cand c
  LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
  JOIN sizes sa ON sa.doc_id = c.doc_a
  JOIN sizes sb ON sb.doc_id = c.doc_b
) WHERE jaccard >= 0.7
""",
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = dedup.minhash_dedup_pairs(_docs_aug(spark, sf_dir), threshold=0.7)
    return out.select("doc_a", "doc_b", _r("jaccard").alias("jaccard"))


_TH = phash_sql("term")

@register(
    "dedup_simhash",
    f"""
WITH {SQL_DOCS_AUG},
tok AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS toks
  FROM docs_aug
),
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM tok)
  GROUP BY doc_id, term
),
sig0 AS (
  SELECT doc_id, j.j AS j,
         sum(tf * (2 * ((({_TH}) >> j.j) & 1) - 1)) AS bit_sum
  FROM tf CROSS JOIN generate_series(0, {dedup.SIMHASH_BITS - 1}) AS j(j)
  GROUP BY doc_id, j.j
),
sig AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN bit_sum >= 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS simhash
  FROM sig0 GROUP BY doc_id
),
chunks AS (
  SELECT doc_id, simhash, b.b AS band, (simhash >> (b.b * 8)) & 255 AS chunk
  FROM sig CROSS JOIN generate_series(0, {dedup.SIMHASH_BANDS - 1}) AS b(b)
)
SELECT doc_a, doc_b, hamming FROM (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         bit_count(xor(a.simhash, b.simhash))::INT AS hamming
  FROM chunks a JOIN chunks b
    ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id
) WHERE hamming <= 3
""",
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    sim = dedup.simhash(_docs_aug(spark, sf_dir))
    return dedup.simhash_pairs(sim, max_hamming=3)


# ---------------------------------------------------------------------------
# Dup-cluster assembly: connected components over the MinHash-LSH verified
# pair graph (operators/components.py, alternating large-star/small-star).
# Oracle: transitive closure via a recursive CTE over the SAME pair SQL.
# ---------------------------------------------------------------------------

@register(
    "dedup_components",
    f"""
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
)
SELECT node::BIGINT AS doc_id, min(comp)::BIGINT AS component_id
FROM reach GROUP BY node
""",
)
def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.components import connected_components

    pairs = dedup.minhash_dedup_pairs(_docs_aug(spark, sf_dir), threshold=0.7)
    return connected_components(pairs)


def _planes_sql() -> str:
    planes = similarity.hyperplanes()
    return ", ".join(
        "[" + ", ".join(f"{x:.6f}" for x in row) + "]" for row in planes
    )


def _bucket_sql(vec: str) -> str:
    planes = similarity.hyperplanes()
    parts = []
    for p, row in enumerate(planes):
        arr = "[" + ", ".join(f"{x:.6f}" for x in row) + "]"
        parts.append(
            f"CASE WHEN list_dot_product({vec}, {arr}) >= 0 THEN {1 << p} ELSE 0 END"
        )
    return "CAST(" + " + ".join(parts) + " AS BIGINT)"


_COS = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)


@register(
    "dedup_embedding_cosine",
    f"""
WITH emb_aug AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000, list_transform(embedding::DOUBLE[], x -> x * 2.0)
  FROM embeddings WHERE vec_id % 50 = 0
),
bucketed AS (SELECT vec_id, v, {_bucket_sql('v')} AS bucket FROM emb_aug)
SELECT vec_a, vec_b, cos FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         round({_COS.format(a='a.v', b='b.v')}, 6) AS cos
  FROM bucketed a JOIN bucketed b
    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
) WHERE cos >= 0.95
""",
)
def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    # planes pinned to the fixed hyperplane literals so the oracle SQL is
    # data-independent; the library default scales planes with corpus size
    return similarity.cosine_dedup_pairs(
        _emb_aug(spark, sf_dir), threshold=0.95, planes=similarity.hyperplanes()
    )


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

ANN_QUERY_IDS = [0, 1, 2, 3, 4]
ANN_K = 10


@register(
    "ann_cosine_topk",
    f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN (0, 1, 2, 3, 4)),
scored AS (
  SELECT query_id, e.vec_id AS vec_id,
         round({_COS.format(a='qv', b='e.v')}, 6) AS cos
  FROM q CROSS JOIN e WHERE e.vec_id <> q.query_id
)
SELECT query_id, vec_id, cos, rank FROM (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC)::INT AS rank
  FROM scored
) WHERE rank <= {ANN_K}
""",
)
def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.brute_force_topk(emb, ANN_QUERY_IDS, k=ANN_K)


@register(
    "postings_positions",
    r"""
WITH tok AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
  FROM documents
),
occ AS (
  SELECT doc_id, toks[i] AS term, (i - 1)::INT AS pos
  FROM tok, unnest(generate_series(1, len(toks))) AS g(i)
)
SELECT doc_id, term, count(*)::INT AS tf,
       string_agg(pos::VARCHAR, ',' ORDER BY pos) AS positions
FROM occ GROUP BY doc_id, term
""",
)
def q_postings_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 posting contract incl. Positions (reference types.go:92-96);
    positions emitted as a comma-joined string for engine-portable
    value hashing."""
    from .operators import scorer

    out = scorer.doc_term_positions(_docs(spark, sf_dir))
    return out.select(
        "doc_id", "term", "tf",
        F.array_join(F.transform("positions", lambda p: p.cast("string")), ",").alias(
            "positions"
        ),
    )


# GEMM scale path, same output contract -> same oracle
from .entry_queries import ORACLES as _ORACLES  # noqa: E402

register("ann_gemm_topk", _ORACLES["ann_cosine_topk"])(
    lambda spark, sf_dir: similarity.brute_force_topk_gemm(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"), ANN_QUERY_IDS, k=ANN_K
    )
)


def _centroid_values() -> str:
    rows = []
    for i, c in enumerate(similarity.ivf_centroids()):
        arr = "[" + ", ".join(f"{x:.6f}" for x in c) + "]::DOUBLE[]"
        rows.append(f"({i}, {arr})")
    return ", ".join(rows)


@register(
    "ann_ivf_topk",
    f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents(cid, c) AS (VALUES {_centroid_values()}),
scoredc AS (
  SELECT e.vec_id, e.v, cents.cid, list_dot_product(e.v, cents.c) AS d
  FROM e CROSS JOIN cents
),
rankedc AS (
  SELECT vec_id, v, cid,
         row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid DESC) AS rn
  FROM scoredc
),
assign AS (SELECT vec_id, v, cid AS cell FROM rankedc WHERE rn = 1),
qprobe AS (
  SELECT vec_id AS query_id, v AS qv, cid AS cell
  FROM rankedc WHERE vec_id IN (0, 1, 2, 3, 4) AND rn <= {similarity.NPROBE}
),
scored AS (
  SELECT q.query_id, a.vec_id AS vec_id,
         round({_COS.format(a='q.qv', b='a.v')}, 6) AS cos
  FROM qprobe q JOIN assign a USING (cell) WHERE a.vec_id <> q.query_id
)
SELECT query_id, vec_id, cos, rank FROM (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC)::INT AS rank
  FROM scored
) WHERE rank <= {ANN_K}
""",
)
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantizer ANN (assign to nearest of 16 deterministic
    unit centroids, probe the 4 nearest cells) — the oracle replicates
    assignment and probing with the identical centroid literals and
    (dot desc, cid desc) tie-break."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.ivf_topk(emb, ANN_QUERY_IDS, k=ANN_K)


_PROBE_MASKS = similarity.probe_masks(similarity.N_PLANES, 2)

@register(
    "ann_lsh_topk",
    f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
b AS (SELECT vec_id, v, {_bucket_sql('v')} AS bucket FROM e),
q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b WHERE vec_id IN (0, 1, 2, 3, 4)),
probes AS (
  SELECT query_id, qv, xor(q.bucket, m.mask) AS bucket
  FROM q, (SELECT unnest([{", ".join(str(m) for m in _PROBE_MASKS)}]) AS mask) m
),
scored AS (
  SELECT p.query_id, b.vec_id AS vec_id,
         round({_COS.format(a='p.qv', b='b.v')}, 6) AS cos
  FROM probes p JOIN b USING (bucket) WHERE b.vec_id <> p.query_id
)
SELECT query_id, vec_id, cos, rank FROM (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC)::INT AS rank
  FROM scored
) WHERE rank <= {ANN_K}
""",
)
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN at the default serving radius (2) — the oracle
    replicates the probe-bucket expansion with xor over the same mask
    list. Planes pinned to the fixed literals (data-independent oracle)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.lsh_topk(
        emb, ANN_QUERY_IDS, k=ANN_K, planes=similarity.hyperplanes()
    )


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

@register(
    "text_token_counts",
    r"""
WITH tok AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
  FROM documents
)
SELECT doc_id,
       length(text)::INT AS n_chars,
       len(toks)::INT AS n_tokens,
       len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_ \t\n]'))::INT AS n_subwords,
       round(CASE WHEN len(toks) > 0
             THEN list_sum(list_transform(toks, t -> length(t)))::DOUBLE / len(toks)
             ELSE 0.0 END, 6) AS avg_token_len
FROM tok
""",
)
def q_text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = textstats.token_counts(_docs(spark, sf_dir))
    return out.select(
        "doc_id", "n_chars", "n_tokens", "n_subwords",
        _r("avg_token_len").alias("avg_token_len"),
    )


_EN_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in textstats.STOPWORDS["en"]) + "]"

@register(
    "text_quality",
    rf"""
WITH tok AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
  FROM documents
),
feats AS (
  SELECT doc_id,
         length(text)::INT AS n_chars,
         len(toks)::INT AS n_tokens,
         CASE WHEN length(text) > 0
              THEN len(regexp_extract_all(text, '[^A-Za-z0-9_ \t\n]'))::DOUBLE / length(text)
              ELSE 0.0 END AS punct_ratio,
         CASE WHEN len(toks) > 0
              THEN len(list_filter(toks, t -> list_contains({_EN_STOP_SQL}, lower(t))))::DOUBLE / len(toks)
              ELSE 0.0 END AS stopword_ratio,
         CASE WHEN length(text) > 0
              THEN len(regexp_extract_all(text, '[A-Z]'))::DOUBLE / length(text)
              ELSE 0.0 END AS upper_ratio,
         CASE WHEN len(toks) > 0
              THEN len(list_distinct(toks))::DOUBLE / len(toks)
              ELSE 0.0 END AS unique_token_ratio
  FROM tok
)
SELECT doc_id, n_chars, n_tokens,
       round(punct_ratio, 6) AS punct_ratio,
       round(stopword_ratio, 6) AS stopword_ratio,
       round(upper_ratio, 6) AS upper_ratio,
       round(unique_token_ratio, 6) AS unique_token_ratio,
       round(
         (CASE WHEN n_tokens >= 10 THEN 0.25 ELSE 0.0 END)
         + (CASE WHEN punct_ratio <= 0.2 THEN 0.25 ELSE 0.0 END)
         + 0.25 * least(stopword_ratio * 5, 1.0)
         + 0.25 * unique_token_ratio, 6) AS quality_score
FROM feats
""",
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = textstats.quality_features(_docs(spark, sf_dir))
    return out.select(
        "doc_id", "n_chars", "n_tokens",
        _r("punct_ratio").alias("punct_ratio"),
        _r("stopword_ratio").alias("stopword_ratio"),
        _r("upper_ratio").alias("upper_ratio"),
        _r("unique_token_ratio").alias("unique_token_ratio"),
        _r("quality_score").alias("quality_score"),
    )


def _lang_sql() -> str:
    hits = {
        lang: (
            "len(list_intersect(low, ["
            + ", ".join(f"'{w}'" for w in textstats.STOPWORDS[lang])
            + "]))::INT"
        )
        for lang in textstats.LANG_ORDER
    }
    hit_cols = ",\n         ".join(f"{expr} AS hits_{lang}" for lang, expr in hits.items())
    best = "greatest(" + ", ".join(f"hits_{lang}" for lang in textstats.LANG_ORDER) + ")"
    cases = " ".join(
        f"WHEN best > 0 AND hits_{lang} = best THEN '{lang}'"
        for lang in textstats.LANG_ORDER
    )
    return rf"""
WITH tok AS (
  SELECT doc_id,
         list_distinct(list_transform(
           list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''),
           t -> lower(t))) AS low
  FROM documents
),
hits AS (
  SELECT doc_id,
         {hit_cols}
  FROM tok
),
scored AS (SELECT doc_id, hits_en, hits_es, hits_fr, hits_de, {best} AS best FROM hits)
SELECT doc_id,
       CASE {cases} ELSE 'und' END AS lang_pred,
       best AS lang_hits
FROM scored
"""


@register("text_lang_id", _lang_sql())
def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.lang_id(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# Repetition battery (Gopher-style dup-token / top-bigram / dup-trigram
# fractions) and n-gram train/eval contamination — the two curation ops a
# 100 TB pretraining pipeline runs right after quality scoring.
# ---------------------------------------------------------------------------

def _ngram_sql(n: int) -> str:
    """DuckDB expression for space-joined token n-grams over list ``t``
    (1-based) — the SQL twin of textstats._ngrams_col."""
    parts = " || ' ' || ".join(f"t[i+{k}]" if k else "t[i]" for k in range(n))
    return f"list_transform(generate_series(1, len(t) - {n - 1}), i -> {parts})"


ORACLE_REPETITION = rf"""
WITH tok AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents
),
base AS (
  SELECT doc_id, len(t)::INT AS n_tokens,
         CASE WHEN len(t) > 0
              THEN (len(t) - len(list_distinct(t)))::DOUBLE / len(t)
              ELSE 0.0 END AS dup_token_frac,
         t
  FROM tok
),
g2 AS (
  SELECT doc_id, u.g FROM base, unnest({_ngram_sql(2)}) AS u(g)
  WHERE len(t) >= 2
),
c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g),
s2 AS (SELECT doc_id, max(c)::DOUBLE / sum(c) AS top_bigram_frac FROM c2 GROUP BY doc_id),
g3 AS (
  SELECT doc_id, u.g FROM base, unnest({_ngram_sql(3)}) AS u(g)
  WHERE len(t) >= 3
),
c3 AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY doc_id, g),
s3 AS (
  SELECT doc_id,
         sum(CASE WHEN c > 1 THEN c ELSE 0 END)::DOUBLE / sum(c) AS dup_trigram_frac
  FROM c3 GROUP BY doc_id
)
SELECT b.doc_id, n_tokens,
       round(dup_token_frac, 6) AS dup_token_frac,
       round(coalesce(top_bigram_frac, 0.0), 6) AS top_bigram_frac,
       round(coalesce(dup_trigram_frac, 0.0), 6) AS dup_trigram_frac
FROM base b LEFT JOIN s2 USING (doc_id) LEFT JOIN s3 USING (doc_id)
"""


@register("text_repetition", ORACLE_REPETITION)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = textstats.repetition_features(_docs(spark, sf_dir))
    return out.select(
        "doc_id", "n_tokens",
        _r("dup_token_frac").alias("dup_token_frac"),
        _r("top_bigram_frac").alias("top_bigram_frac"),
        _r("dup_trigram_frac").alias("dup_trigram_frac"),
    )


_CONTAM_N = 5  # testdata docs are a few dozen tokens; 8+ is the prod default

ORACLE_CONTAMINATION = rf"""
WITH tok AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents
),
ex AS (
  SELECT doc_id, u.g
  FROM tok, unnest(list_distinct({_ngram_sql(_CONTAM_N)})) AS u(g)
  WHERE len(t) >= {_CONTAM_N}
),
bench AS (
  SELECT DISTINCT u.g
  FROM tok, unnest({_ngram_sql(_CONTAM_N)}) AS u(g)
  WHERE doc_id % 50 = 0 AND len(t) >= {_CONTAM_N}
),
hit AS (
  SELECT doc_id, count(*) AS n_ngrams,
         sum(CASE WHEN g IN (SELECT g FROM bench) THEN 1 ELSE 0 END) AS n_contaminated
  FROM ex GROUP BY doc_id
)
SELECT tok.doc_id,
       coalesce(n_ngrams, 0)::INT AS n_ngrams,
       coalesce(n_contaminated, 0)::INT AS n_contaminated,
       round(CASE WHEN coalesce(n_ngrams, 0) > 0
                  THEN n_contaminated::DOUBLE / n_ngrams
                  ELSE 0.0 END, 6) AS contamination_frac
FROM tok LEFT JOIN hit USING (doc_id)
"""


@register("ngram_contamination", ORACLE_CONTAMINATION)
def q_ngram_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    out = textstats.ngram_contamination(docs, bench, n=_CONTAM_N)
    return out.select(
        "doc_id", "n_ngrams", "n_contaminated",
        _r("contamination_frac").alias("contamination_frac"),
    )


@register(
    "text_fingerprint",
    rf"""
WITH docs_aug AS (SELECT doc_id, text FROM documents),
{SQL_TOK_SH.replace("docs_aug", "docs_aug")}
SELECT d.doc_id, {phash_sql('d.text')} AS content_hash, m.min_shingle_hash
FROM documents d
LEFT JOIN (
  SELECT doc_id, min({phash_sql('shingle')}) AS min_shingle_hash
  FROM sh GROUP BY doc_id
) m ON m.doc_id = d.doc_id
""",
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.fingerprints(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# PII scrubbing — deterministic augmented input (the synthetic corpus has
# no PII, so both sides append identical fictional PII by doc_id class)
# ---------------------------------------------------------------------------

_PII_AUG_SQL = """
  SELECT doc_id,
         text || CASE
           WHEN doc_id % 7 = 0 THEN ' reach user' || doc_id || '@example.com now'
           WHEN doc_id % 7 = 1 THEN ' ssn on file 123-45-6789 ok'
           WHEN doc_id % 7 = 2 THEN ' call (555) 123-4567 today'
           WHEN doc_id % 7 = 3 THEN ' host 10.0.0.1 and 255.255.255.0 up'
           ELSE '' END AS text
  FROM documents
"""


def _pii_oracle() -> str:
    pats = dict((n, p) for n, p, _ in textstats.PII_PATTERNS)
    toks = dict((n, t) for n, _, t in textstats.PII_PATTERNS)
    red = "text"
    for name, _, _ in textstats.PII_PATTERNS:
        red = f"regexp_replace({red}, '{pats[name]}', '{toks[name]}', 'g')"
    counts = ",\n  ".join(
        f"length(regexp_extract_all(text, '{pats[name]}'))::INT AS n_{name}"
        for name, _, _ in textstats.PII_PATTERNS
    )
    return f"""
WITH aug AS ({_PII_AUG_SQL})
SELECT doc_id,
  {red} AS text_redacted,
  {counts}
FROM aug
"""


@register("pii_scrub", _pii_oracle())
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction battery (email/IPv4/SSN/phone) as a zero-shuffle
    codegen projection; RE2-safe patterns shared verbatim with the
    DuckDB oracle."""
    docs = _docs(spark, sf_dir)
    did = F.col("doc_id")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(did % 7 == 0,
                   F.concat(F.lit(" reach user"), did.cast("string"),
                            F.lit("@example.com now")))
            .when(did % 7 == 1, F.lit(" ssn on file 123-45-6789 ok"))
            .when(did % 7 == 2, F.lit(" call (555) 123-4567 today"))
            .when(did % 7 == 3, F.lit(" host 10.0.0.1 and 255.255.255.0 up"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return textstats.pii_scrub(aug)


# ---------------------------------------------------------------------------
# Deterministic dataset split
# ---------------------------------------------------------------------------

ORACLE_SPLIT = f"""
SELECT doc_id,
       CASE WHEN h < 8000 THEN 'train'
            WHEN h < 9000 THEN 'val'
            ELSE 'test' END AS split
FROM (
  SELECT doc_id,
         {phash_sql("'split-v1-' || CAST(doc_id AS VARCHAR)")} % 10000 AS h
  FROM documents
)
"""


@register("dataset_split", ORACLE_SPLIT)
def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test assignment as a pure function of
    (salt, doc_id) via the portable 60-bit hash — stable across runs,
    partitionings, and corpus growth (unlike randomSplit)."""
    docs = _docs(spark, sf_dir).select("doc_id")
    out = textstats.dataset_split(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    return out.select("doc_id", "split")


# ---------------------------------------------------------------------------
# Hybrid search: reciprocal-rank fusion of lexical BM25 and embedding ANN
# (retrieval_plus.rrf_fusion). doc_id and vec_id share the id domain in the
# driver testdata, standing in for a corpus with both text and embeddings.
# ---------------------------------------------------------------------------

from pyspark.sql import Window  # noqa: E402

from . import B, K1  # noqa: E402
from .entry_queries import SQL_SKELETON, _queries_df  # noqa: E402
from .operators import retrieval_plus, scorer  # noqa: E402

_RRF_C = 60
_HYBRID_LEG_K = 30

ORACLE_HYBRID = SQL_SKELETON + f"""
, bm25_top AS (
  SELECT doc_id, rank FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY round(bm25, 6) DESC, doc_id ASC) AS rank
    FROM perdoc
  ) WHERE rank <= {_HYBRID_LEG_K}
),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
qv AS (SELECT v AS qv FROM e WHERE vec_id = 0),
ann_top AS (
  SELECT vec_id AS doc_id, rank FROM (
    SELECT e.vec_id,
           row_number() OVER (
             ORDER BY round({_COS.format(a='qv', b='e.v')}, 6) DESC,
                      e.vec_id ASC) AS rank
    FROM e CROSS JOIN qv WHERE e.vec_id <> 0
  ) WHERE rank <= {_HYBRID_LEG_K}
),
un AS (
  SELECT doc_id, rank FROM bm25_top
  UNION ALL
  SELECT doc_id, rank FROM ann_top
),
f AS (
  SELECT doc_id, sum(1.0 / ({_RRF_C} + rank)) AS rrf_score,
         count(*) AS n_systems
  FROM un GROUP BY doc_id
)
SELECT doc_id, rrf_score, n_systems, rank FROM (
  SELECT doc_id, round(rrf_score, 6) AS rrf_score, n_systems::INT AS n_systems,
         row_number() OVER (ORDER BY round(rrf_score, 6) DESC, doc_id ASC)::INT AS rank
  FROM f
) WHERE rank <= 20
"""


@register("hybrid_rrf_topk", ORACLE_HYBRID)
def q_hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    dlen = scorer.doc_lengths(docs)
    sc = scorer.score_candidates(
        scorer.doc_term_frequencies(docs), dlen,
        scorer.corpus_stats(dlen), _queries_df(spark),
    ).select("query_id", "doc_id", _r("bm25").alias("bm25"))
    bm25 = scorer.topk(sc, _HYBRID_LEG_K).select("query_id", "doc_id", "rank")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ann = similarity.brute_force_topk(emb, [0], k=_HYBRID_LEG_K).select(
        F.lit("q1").alias("query_id"), F.col("vec_id").alias("doc_id"), "rank"
    )
    out = retrieval_plus.rrf_fusion([bm25, ann], k=20, c=_RRF_C)
    return out.select(
        "doc_id", _r("rrf_score").alias("rrf_score"), "n_systems", "rank"
    )


# ---------------------------------------------------------------------------
# Bigram-LM cross-entropy quality scoring (corpus-trained, add-1 smoothed):
# the statistical stand-in for neural-perplexity filtering. Oracle re-derives
# the same model from the same corpus with DuckDB list_zip bigrams.
# ---------------------------------------------------------------------------

ORACLE_LM_CE = """
WITH toklists AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
  FROM documents
),
pairs AS (
  SELECT doc_id, z[1] AS w1, z[2] AS w2 FROM (
    SELECT doc_id, unnest(list_zip(l, l[2:])) AS z FROM toklists
  ) WHERE z[2] IS NOT NULL
),
dbig AS (
  SELECT doc_id, w1, w2, count(*) AS m FROM pairs GROUP BY 1, 2, 3
),
big AS (SELECT w1, w2, sum(m) AS c12 FROM dbig GROUP BY 1, 2),
ctx AS (SELECT w1, sum(c12) AS c1 FROM big GROUP BY 1),
voc AS (
  SELECT count(DISTINCT t.term)::DOUBLE AS v
  FROM toklists, unnest(l) AS t(term)
)
SELECT d.doc_id,
       sum(d.m)::INT AS n_bigrams,
       round(-sum(d.m * ln((b.c12 + 1.0) / (c.c1 + 1.0 * voc.v))) / sum(d.m),
             6) AS cross_entropy
FROM dbig d
JOIN big b ON b.w1 = d.w1 AND b.w2 = d.w2
JOIN ctx c ON c.w1 = d.w1
CROSS JOIN voc
GROUP BY d.doc_id
"""


@register("lm_cross_entropy", ORACLE_LM_CE)
def q_lm_cross_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = textstats.lm_cross_entropy(
        _docs(spark, sf_dir).select("doc_id", "text"), k_smooth=1.0
    )
    return out.select("doc_id", "n_bigrams", _r("cross_entropy").alias("cross_entropy"))


# ---------------------------------------------------------------------------
# Mixture weighting: deterministic per-domain subsampling (dataset_mix).
# Rates keyed by the `lang` column; docs hash-gate within their group.
# ---------------------------------------------------------------------------

_MIX_RATES = {"en": 1.0, "de": 0.5, "fr": 0.25}
_MIX_DEFAULT = 0.1

ORACLE_MIX = f"""
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         {phash_sql("'mix-v1-' || CAST(doc_id AS VARCHAR)")} % 1000000 AS h,
         CASE lang WHEN 'en' THEN 1000000 WHEN 'de' THEN 500000
                   WHEN 'fr' THEN 250000 ELSE 100000 END AS thr
  FROM documents
) WHERE h < thr
"""


@register("dataset_mix", ORACLE_MIX)
def q_dataset_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select("doc_id", "lang")
    return textstats.dataset_mix(
        docs, _MIX_RATES, group_col="lang", default_rate=_MIX_DEFAULT
    )


# ---------------------------------------------------------------------------
# Token-budget shard packing: global running token total over a stable
# hash permutation; shard = floor(tokens_before / budget). The oracle's
# single-ordered window IS the semantics; the Spark side computes the
# same cumsum with the two-phase range-partition pattern (no global
# window) — the pair pins their equivalence.
# ---------------------------------------------------------------------------

_PACK_BUDGET = 5_000

ORACLE_PACK = f"""
WITH t AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens,
         {phash_sql("'pack-v1-' || CAST(doc_id AS VARCHAR)")} AS k
  FROM documents
)
SELECT doc_id, n_tokens::INT AS n_tokens,
       (coalesce(sum(n_tokens) OVER (
          ORDER BY k, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
        ), 0) // {_PACK_BUDGET})::BIGINT AS shard_id
FROM t
"""


@register("pack_shards", ORACLE_PACK)
def q_pack_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    return textstats.pack_shards(docs, budget_tokens=_PACK_BUDGET)


# ---------------------------------------------------------------------------
# BPE-ish tokenizer piece counts (GPT-2 pre-tokenization regex, ASCII form
# shared verbatim across Spark/DuckDB/Python — see textstats.BPE_PIECE_RE).
# ---------------------------------------------------------------------------

ORACLE_BPE = """
SELECT doc_id,
       length(text)::INT AS n_chars,
       len(regexp_extract_all(text, '{pat}'))::INT AS n_pieces,
       CASE WHEN len(regexp_extract_all(text, '{pat}')) > 0
            THEN round(length(text)::DOUBLE
                       / len(regexp_extract_all(text, '{pat}')), 6)
            ELSE 0.0 END AS chars_per_piece
FROM documents
""".format(pat=textstats.BPE_PIECE_RE.replace("'", "''"))


@register("bpe_piece_counts", ORACLE_BPE)
def q_bpe_piece_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = textstats.bpe_piece_counts(_docs(spark, sf_dir).select("doc_id", "text"))
    return out.select(
        "doc_id", "n_chars", "n_pieces", _r("chars_per_piece").alias("chars_per_piece")
    )


# ---------------------------------------------------------------------------
# Duplicate-collapsed search over the augmented corpus (which contains
# exact-duplicate clusters by construction): plain BM25 scoring on
# docs_aug, non-canonical duplicates anti-joined out, ranks re-numbered.
# ---------------------------------------------------------------------------

_COLLAPSE_QUERY = "key value hash join table table spark zzzabsent"
_COLLAPSE_QTERMS = ", ".join(
    f"({i}, '{t}')" for i, t in enumerate(_COLLAPSE_QUERY.split())
)

ORACLE_COLLAPSED = f"""
WITH {SQL_DOCS_AUG},
toks AS (
  SELECT doc_id, t.term
  FROM docs_aug, unnest(string_split(text, ' ')) AS t(term)
  WHERE t.term <> ''
),
doc_tf AS (
  SELECT doc_id, term, count(*)::INT AS tf FROM toks GROUP BY doc_id, term
),
doc_len AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE length(text) - length(replace(text, ' ', '')) + 1 END AS doc_length
  FROM docs_aug
),
stats AS (
  SELECT count(*) AS doc_count, avg(doc_length) AS avg_doc_length FROM doc_len
),
hashed AS (SELECT doc_id, {phash_sql('text')} AS h FROM docs_aug),
grp AS (
  SELECT h, min(doc_id) AS canonical_id FROM hashed GROUP BY h HAVING count(*) >= 2
),
losers AS (
  SELECT ha.doc_id FROM hashed ha JOIN grp g USING (h)
  WHERE ha.doc_id <> g.canonical_id
),
qterms AS (
  SELECT * FROM (VALUES {_COLLAPSE_QTERMS}) AS v(pos, term)
),
term_df AS (
  SELECT term, count(DISTINCT doc_id) AS df
  FROM doc_tf WHERE term IN (SELECT DISTINCT term FROM qterms)
  GROUP BY term
),
idf AS (
  SELECT term, ln(CAST((SELECT doc_count FROM stats) AS DOUBLE) / (df + 1)) AS idf
  FROM term_df
),
cand AS (
  SELECT DISTINCT doc_tf.doc_id
  FROM doc_tf WHERE term IN (SELECT DISTINCT term FROM qterms)
),
occ AS (
  SELECT q.term, c.doc_id, dt.tf, i.idf, dl.doc_length, s.avg_doc_length
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
),
kept AS (
  SELECT p.* FROM perdoc p LEFT JOIN losers l USING (doc_id)
  WHERE l.doc_id IS NULL
)
SELECT doc_id, bm25, rank FROM (
  SELECT doc_id, round(bm25, 6) AS bm25,
         row_number() OVER (ORDER BY round(bm25, 6) DESC, doc_id ASC)::INT AS rank
  FROM kept
) WHERE rank <= 20
"""


@register("collapsed_topk", ORACLE_COLLAPSED)
def q_collapsed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    queries = spark.createDataFrame(
        [("q1", _COLLAPSE_QUERY)], "query_id string, text string"
    )
    out = retrieval_plus.collapsed_topk(_docs_aug(spark, sf_dir), queries, k=1000)
    w = Window.orderBy(F.desc(F.round("bm25", 6)), F.asc("doc_id"))
    return (
        out.select("doc_id", _r("bm25").alias("bm25"))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 20)
    )


@register(
    "dedup_containment",
    f"""
WITH {SQL_DOCS_AUG},
{SQL_TOK_SH},
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, round(containment, 6) AS containment FROM (
  SELECT i.doc_a, i.doc_b, i.inter::DOUBLE / sa.n_sh AS containment
  FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a
) WHERE containment >= 0.9
""",
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broder containment (directed |A∩B|/|A| over shingle sets): the
    augmented corpus's truncated docs (prefix removed) are CONTAINED in
    their originals even when Jaccard sits below threshold."""
    out = dedup.ngram_containment_pairs(_docs_aug(spark, sf_dir), threshold=0.9)
    return out.select("doc_a", "doc_b", _r("containment").alias("containment"))


# ---------------------------------------------------------------------------
# Quality-stratified sampling: CE buckets x deterministic per-bucket rates
# ---------------------------------------------------------------------------

_QS_BOUNDS = [3.37, 3.40]
_QS_RATES = [1.0, 0.5, 0.1]

_QS_CE_BODY = ORACLE_LM_CE.split("SELECT d.doc_id,")[0]

ORACLE_QSAMPLE = _QS_CE_BODY + f""",
ce AS (
  SELECT d.doc_id,
         round(-sum(d.m * ln((b.c12 + 1.0) / (c.c1 + 1.0 * voc.v))) / sum(d.m),
               6) AS cross_entropy
  FROM dbig d
  JOIN big b ON b.w1 = d.w1 AND b.w2 = d.w2
  JOIN ctx c ON c.w1 = d.w1
  CROSS JOIN voc
  GROUP BY d.doc_id
),
bucketed AS (
  SELECT doc.doc_id, ce.cross_entropy,
         CASE WHEN ce.cross_entropy IS NULL THEN {len(_QS_BOUNDS)}
              ELSE (CASE WHEN ce.cross_entropy >= {_QS_BOUNDS[0]} THEN 1 ELSE 0 END
                    + CASE WHEN ce.cross_entropy >= {_QS_BOUNDS[1]} THEN 1 ELSE 0 END)
         END::INT AS bucket,
         {phash_sql("'qsample-v1-' || CAST(doc.doc_id AS VARCHAR)")} % 1000000 AS h
  FROM documents doc LEFT JOIN ce USING (doc_id)
)
SELECT doc_id, cross_entropy, bucket FROM bucketed
WHERE h < CASE bucket WHEN 0 THEN {int(_QS_RATES[0] * 1_000_000)}
                      WHEN 1 THEN {int(_QS_RATES[1] * 1_000_000)}
                      ELSE {int(_QS_RATES[2] * 1_000_000)} END
"""


@register("quality_stratified_sample", ORACLE_QSAMPLE)
def q_quality_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style curation sampling: bigram-LM cross-entropy buckets
    (head/middle/tail) x deterministic keep rates (100%/50%/10%), the
    standard perplexity-stratified recipe for pretraining mixtures."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    return textstats.quality_stratified_sample(
        docs, _QS_BOUNDS, _QS_RATES
    )


# ---------------------------------------------------------------------------
# First-occurrence dedup (batch twin of streaming/stream_dedup.py)
# ---------------------------------------------------------------------------

_FD_HASH_SQL = phash_sql(
    "coalesce(CAST(event_type AS VARCHAR), chr(0) || 'null') || chr(31) || "
    "coalesce(CAST(value AS VARCHAR), chr(0) || 'null')"
)

ORACLE_FIRST_DEDUP = f"""
SELECT event_id, user_id, event_type, content_hash FROM (
  SELECT event_id, ts, user_id, event_type, content_hash,
         row_number() OVER (
           PARTITION BY content_hash ORDER BY ts ASC, event_id ASC
         ) AS rn
  FROM (
    SELECT event_id, ts, user_id, event_type,
           {_FD_HASH_SQL} AS content_hash
    FROM events
  )
) WHERE rn = 1
"""


@register("dedup_first_occurrence", ORACLE_FIRST_DEDUP)
def q_dedup_first_occurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the earliest (ts, event_id) copy per content key — the batch
    authority for the streaming dropDuplicatesWithinWatermark deployment
    (streaming/stream_dedup.py). Content key = portable hash of
    (event_type, value), sharing phash with exact dedup."""
    from .streaming.stream_dedup import keep_first

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = keep_first(ev, ["event_type", "value"], ts_col="ts", id_col="event_id")
    return out.select("event_id", "user_id", "event_type", "content_hash")


# ---------------------------------------------------------------------------
# Curation pipeline summary (plans/curation.py): the staged composition
# exact-dedup -> near-dup -> quality -> decontaminate -> split, with
# per-stage survivor counts as the value-checked manifest. The oracle
# replays every stage by composing the SAME SQL fragments the individual
# pair oracles use, re-sourced onto each stage's survivor relation.
# ---------------------------------------------------------------------------

_CUR_QUALITY_T = 0.65
_CUR_CONTAM_MAX = 0.5

ORACLE_CURATION = f"""
WITH {SQL_DOCS_AUG},
hashed AS (SELECT doc_id, {phash_sql('text')} AS content_hash FROM docs_aug),
grp AS (
  SELECT content_hash, min(doc_id) AS canonical_id
  FROM hashed GROUP BY content_hash HAVING count(*) >= 2
),
s1 AS (
  SELECT d.doc_id, d.text FROM docs_aug d
  WHERE d.doc_id NOT IN (
    SELECT h.doc_id FROM hashed h JOIN grp g USING (content_hash)
    WHERE h.doc_id <> g.canonical_id)
),
{SQL_TOK_SH.replace("FROM docs_aug", "FROM s1").lstrip()},
{SQL_MINHASH.lstrip()},
pairs AS (
  SELECT i.doc_a, i.doc_b,
         i.inter::DOUBLE / (za.n_sh + zb.n_sh - i.inter) AS jaccard
  FROM inter i
  JOIN sizes za ON za.doc_id = i.doc_a
  JOIN sizes zb ON zb.doc_id = i.doc_b
),
s2 AS (
  SELECT s1.doc_id, s1.text FROM s1
  WHERE s1.doc_id NOT IN (SELECT DISTINCT doc_b FROM pairs WHERE jaccard >= 0.7)
),
ftok AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS toks
  FROM s2
),
ffeats AS (
  SELECT doc_id,
         len(toks)::INT AS n_tokens,
         CASE WHEN length(text) > 0
              THEN len(regexp_extract_all(text, '[^A-Za-z0-9_ \\t\\n]'))::DOUBLE / length(text)
              ELSE 0.0 END AS punct_ratio,
         CASE WHEN len(toks) > 0
              THEN len(list_filter(toks, t -> list_contains({_EN_STOP_SQL}, lower(t))))::DOUBLE / len(toks)
              ELSE 0.0 END AS stopword_ratio,
         CASE WHEN len(toks) > 0
              THEN len(list_distinct(toks))::DOUBLE / len(toks)
              ELSE 0.0 END AS unique_token_ratio
  FROM ftok
),
fq AS (
  SELECT doc_id,
         (CASE WHEN n_tokens >= 10 THEN 0.25 ELSE 0.0 END)
         + (CASE WHEN punct_ratio <= 0.2 THEN 0.25 ELSE 0.0 END)
         + 0.25 * least(stopword_ratio * 5, 1.0)
         + 0.25 * unique_token_ratio AS quality_score
  FROM ffeats
),
s3 AS (
  SELECT s2.doc_id, s2.text FROM s2 JOIN fq USING (doc_id)
  WHERE round(quality_score, 6) >= {_CUR_QUALITY_T!r}
),
ctok AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
  FROM s3
),
cbtok AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
  FROM documents WHERE doc_id % 50 = 0
),
cbench AS (
  SELECT DISTINCT u.g FROM cbtok, unnest({_ngram_sql(_CONTAM_N)}) AS u(g)
  WHERE len(t) >= {_CONTAM_N}
),
cex AS (
  SELECT doc_id, u.g FROM ctok, unnest(list_distinct({_ngram_sql(_CONTAM_N)})) AS u(g)
  WHERE len(t) >= {_CONTAM_N}
),
chit AS (
  SELECT doc_id, count(*) AS n_ngrams,
         sum(CASE WHEN g IN (SELECT g FROM cbench) THEN 1 ELSE 0 END) AS n_cont
  FROM cex GROUP BY doc_id
),
cfrac AS (
  SELECT ctok.doc_id,
         round(CASE WHEN coalesce(n_ngrams, 0) > 0
               THEN n_cont::DOUBLE / n_ngrams ELSE 0.0 END, 6) AS frac
  FROM ctok LEFT JOIN chit USING (doc_id)
),
s4 AS (
  SELECT s3.doc_id FROM s3 JOIN cfrac USING (doc_id)
  WHERE frac <= {_CUR_CONTAM_MAX!r}
),
sp AS (
  SELECT doc_id,
         CASE WHEN h < 8000 THEN 'train'
              WHEN h < 9000 THEN 'val'
              ELSE 'test' END AS split
  FROM (
    SELECT doc_id,
           {phash_sql("'split-v1-' || CAST(doc_id AS VARCHAR)")} % 10000 AS h
    FROM s4
  )
)
SELECT 'exact_dedup' AS stage,
       (SELECT count(*) FROM docs_aug) AS docs_in,
       (SELECT count(*) FROM s1) AS docs_out
UNION ALL SELECT 'near_dup', (SELECT count(*) FROM s1), (SELECT count(*) FROM s2)
UNION ALL SELECT 'quality', (SELECT count(*) FROM s2), (SELECT count(*) FROM s3)
UNION ALL SELECT 'decontaminate', (SELECT count(*) FROM s3), (SELECT count(*) FROM s4)
UNION ALL
SELECT 'split_' || split, (SELECT count(*) FROM s4), count(*)
FROM sp GROUP BY split
"""


@register("curation_summary", ORACLE_CURATION)
def q_curation_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full pre-training curation pipeline over the augmented corpus
    (planted exact + near dups): per-stage survivor counts plus final
    split sizes, value-checked stage by stage against the composed SQL
    replay. Benchmark relation for decontamination = every 50th original
    document (the ngram_contamination pair's convention)."""
    from .plans import curation

    docs = _docs_aug(spark, sf_dir)
    bench = _docs(spark, sf_dir).filter(F.col("doc_id") % 50 == 0)
    return curation.curation_summary(
        docs,
        bench,
        quality_threshold=_CUR_QUALITY_T,
        contamination_max=_CUR_CONTAM_MAX,
        contamination_n=_CONTAM_N,
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis-Spirakis), weighted by
# the quality score — the subsample-proportional-to-quality curation step.
# ---------------------------------------------------------------------------

_WSAMPLE_K = 50
_POW60 = float(1 << 60)

ORACLE_WSAMPLE = rf"""
WITH wtok AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
  FROM documents
),
wfeats AS (
  SELECT doc_id,
         len(toks)::INT AS n_tokens,
         CASE WHEN length(text) > 0
              THEN len(regexp_extract_all(text, '[^A-Za-z0-9_ \t\n]'))::DOUBLE / length(text)
              ELSE 0.0 END AS punct_ratio,
         CASE WHEN len(toks) > 0
              THEN len(list_filter(toks, t -> list_contains({_EN_STOP_SQL}, lower(t))))::DOUBLE / len(toks)
              ELSE 0.0 END AS stopword_ratio,
         CASE WHEN len(toks) > 0
              THEN len(list_distinct(toks))::DOUBLE / len(toks)
              ELSE 0.0 END AS unique_token_ratio
  FROM wtok
),
wq AS (
  SELECT doc_id,
         (CASE WHEN n_tokens >= 10 THEN 0.25 ELSE 0.0 END)
         + (CASE WHEN punct_ratio <= 0.2 THEN 0.25 ELSE 0.0 END)
         + 0.25 * least(stopword_ratio * 5, 1.0)
         + 0.25 * unique_token_ratio AS quality_score
  FROM wfeats
),
keyed AS (
  SELECT doc_id, quality_score AS weight,
         round(pow(
           ({phash_sql("'wsample-v1-' || CAST(doc_id AS VARCHAR)")}::DOUBLE + 1.0)
             / {_POW60!r},
           1.0 / quality_score), 6) AS wkey
  FROM wq WHERE quality_score > 0
)
SELECT doc_id, round(weight, 6) AS weight, wkey, rank FROM (
  SELECT doc_id, weight, wkey,
         row_number() OVER (ORDER BY wkey DESC, doc_id ASC)::INT AS rank
  FROM keyed
) WHERE rank <= {_WSAMPLE_K}
"""


@register("weighted_sample_topk", ORACLE_WSAMPLE)
def q_weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted deterministic sample of 50 documents: key =
    u^(1/quality_score) with u a pure hash of (salt, doc_id) — k
    sequential weighted draws without replacement, engine-replayable."""
    docs = _docs(spark, sf_dir)
    scored = docs.join(
        textstats.quality_features(docs).select("doc_id", "quality_score"),
        "doc_id",
    )
    out = textstats.weighted_sample(
        scored, "quality_score", k=_WSAMPLE_K
    )
    return out.select(
        "doc_id", _r("weight").alias("weight"), "wkey", "rank"
    )
