"""Driver pairs for the LTR side pipelines (S7/J4/O4/A10/A11/M2/A9) and
the multimodal plumbing.

LETOR input is synthesized deterministically from ``lineitem``
(relevance = l_linenumber, qid = l_orderkey, f1..f4 = quantity /
extendedprice / discount / tax), formatted into real "rel qid:X i:v"
lines with %.4f (exact round-trip for these 2-dp values), and parsed
back with the S7 parser — so the parser itself is under oracle test,
not just the arithmetic."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .entry_queries import _r, register
from .functions.hashing import phash_sql
from .operators import ltr, multimodal

FEATURES = ["f1", "f2", "f3", "f4"]
LETOR_FMT = "%d qid:%d 1:%.4f 2:%.4f 3:%.4f 4:%.4f"

SQL_PARSED = """
parsed AS (
  SELECT l_orderkey::INT AS qid, l_linenumber::INT AS relevance,
         l_quantity::DOUBLE AS f1, l_extendedprice::DOUBLE AS f2,
         l_discount::DOUBLE AS f3, l_tax::DOUBLE AS f4
  FROM lineitem
)"""


def _letor_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.select(
        F.format_string(
            LETOR_FMT,
            F.col("l_linenumber").cast("int"),
            F.col("l_orderkey").cast("int"),
            F.col("l_quantity").cast("double"),
            F.col("l_extendedprice").cast("double"),
            F.col("l_discount").cast("double"),
            F.col("l_tax").cast("double"),
        ).alias("line")
    )


def _parsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ltr.parse_letor(_letor_lines(spark, sf_dir), [1, 2, 3, 4])


@register(
    "letor_parse",
    f"""
WITH {SQL_PARSED}
SELECT relevance, qid,
       round(f1, 6) AS f1, round(f2, 6) AS f2,
       round(f3, 6) AS f3, round(f4, 6) AS f4
FROM parsed
""",
)
def q_letor_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _parsed(spark, sf_dir)
    return p.select("relevance", "qid", *[_r(c).alias(c) for c in FEATURES])


_PAIR_HASH = phash_sql(
    "concat_ws('#', qid::VARCHAR, i::VARCHAR, j::VARCHAR)"
)

@register(
    "ltr_pairwise_sample",
    f"""
WITH {SQL_PARSED},
rows_ AS (
  SELECT *, row_number() OVER (
    PARTITION BY qid ORDER BY relevance, f1, f2, f3, f4)::INT AS i
  FROM parsed
),
pairs AS (
  SELECT a.qid AS qid, a.i AS i, b.i AS j,
         CASE WHEN a.relevance > b.relevance THEN 1 ELSE -1 END AS label,
         a.f1 - b.f1 AS d_f1, a.f2 - b.f2 AS d_f2,
         a.f3 - b.f3 AS d_f3, a.f4 - b.f4 AS d_f4
  FROM rows_ a JOIN rows_ b
    ON a.qid = b.qid AND a.i <> b.i AND abs(a.relevance - b.relevance) >= 3
)
SELECT qid, i, j, label,
       round(d_f1, 6) AS d_f1, round(d_f2, 6) AS d_f2,
       round(d_f3, 6) AS d_f3, round(d_f4, 6) AS d_f4
FROM (SELECT *, {_PAIR_HASH} AS h FROM pairs ORDER BY h LIMIT 1000)
""",
)
def q_ltr_pairwise_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = ltr.pairwise_examples(_parsed(spark, sf_dir), FEATURES, min_diff=3)
    out = ltr.sample_deterministic(pairs, 1000, ["qid", "i", "j"])
    return out.select(
        "qid", "i", "j", "label", *[_r(f"d_{c}").alias(f"d_{c}") for c in FEATURES]
    )


@register(
    "ltr_standardize",
    """
WITH stats AS (
  SELECT avg(l_quantity) AS mu1, stddev_pop(l_quantity) AS sd1,
         avg(l_extendedprice) AS mu2, stddev_pop(l_extendedprice) AS sd2,
         avg(l_discount) AS mu3, stddev_pop(l_discount) AS sd3
  FROM lineitem
)
SELECT l_orderkey::INT AS qid, l_linenumber::INT AS line_no,
       round((l_quantity - mu1) / (CASE WHEN sd1 = 0 THEN 1.0 ELSE sd1 END), 6) AS z_l_quantity,
       round((l_extendedprice - mu2) / (CASE WHEN sd2 = 0 THEN 1.0 ELSE sd2 END), 6) AS z_l_extendedprice,
       round((l_discount - mu3) / (CASE WHEN sd3 = 0 THEN 1.0 ELSE sd3 END), 6) AS z_l_discount
FROM lineitem CROSS JOIN stats
""",
)
def q_ltr_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    out = ltr.standardize(li, cols)
    return out.select(
        F.col("l_orderkey").cast("int").alias("qid"),
        F.col("l_linenumber").cast("int").alias("line_no"),
        *[_r(f"z_{c}").alias(f"z_{c}") for c in cols],
    )


@register(
    "ltr_robust_scale",
    """
WITH stats AS (
  SELECT quantile_cont(l_quantity, 0.5) AS md1,
         quantile_cont(l_quantity, 0.75) - quantile_cont(l_quantity, 0.25) AS iqr1,
         quantile_cont(l_extendedprice, 0.5) AS md2,
         quantile_cont(l_extendedprice, 0.75) - quantile_cont(l_extendedprice, 0.25) AS iqr2
  FROM lineitem
)
SELECT l_orderkey::INT AS qid, l_linenumber::INT AS line_no,
       round((l_quantity - md1) / (CASE WHEN iqr1 = 0 THEN 1.0 ELSE iqr1 END), 6) AS r_l_quantity,
       round((l_extendedprice - md2) / (CASE WHEN iqr2 = 0 THEN 1.0 ELSE iqr2 END), 6) AS r_l_extendedprice
FROM lineitem CROSS JOIN stats
""",
)
def q_ltr_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cols = ["l_quantity", "l_extendedprice"]
    out = ltr.robust_scale(li, cols)
    return out.select(
        F.col("l_orderkey").cast("int").alias("qid"),
        F.col("l_linenumber").cast("int").alias("line_no"),
        *[_r(f"r_{c}").alias(f"r_{c}") for c in cols],
    )


W = {"z_l_quantity": 0.8, "z_l_extendedprice": -0.5, "z_l_discount": 1.2}
BIAS = 0.1

@register(
    "ltr_confusion_matrix",
    f"""
WITH stats AS (
  SELECT avg(l_quantity) AS mu1, stddev_pop(l_quantity) AS sd1,
         avg(l_extendedprice) AS mu2, stddev_pop(l_extendedprice) AS sd2,
         avg(l_discount) AS mu3, stddev_pop(l_discount) AS sd3
  FROM lineitem
),
z AS (
  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE -1 END AS label,
         (l_quantity - mu1) / (CASE WHEN sd1 = 0 THEN 1.0 ELSE sd1 END) AS z1,
         (l_extendedprice - mu2) / (CASE WHEN sd2 = 0 THEN 1.0 ELSE sd2 END) AS z2,
         (l_discount - mu3) / (CASE WHEN sd3 = 0 THEN 1.0 ELSE sd3 END) AS z3
  FROM lineitem CROSS JOIN stats
),
pred AS (
  SELECT label,
         CASE WHEN 1.0 / (1.0 + exp(-({BIAS} + {W['z_l_quantity']} * z1
              + {W['z_l_extendedprice']} * z2 + {W['z_l_discount']} * z3))) >= 0.5
              THEN 1 ELSE -1 END AS prediction
  FROM z
)
SELECT label, prediction, count(*) AS n FROM pred GROUP BY label, prediction
""",
)
def q_ltr_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    z = ltr.standardize(li, cols).withColumn(
        "label", F.when(F.col("l_returnflag") == "R", 1).otherwise(-1)
    )
    pred = ltr.predict_linear(z, W, BIAS)
    return ltr.confusion_matrix(pred)


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------

@register(
    "multimodal_meta",
    """
WITH media AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
         encode(text) AS payload,
         ((doc_id % 8 + 1) * 160)::INT AS width,
         (doc_id % 30 + 1)::DOUBLE AS duration_s
  FROM documents
)
SELECT media_type, count(*) AS n,
       CAST(sum(octet_length(payload)) AS BIGINT) AS total_bytes,
       round(avg(width), 6) AS avg_width,
       round(avg(duration_s), 6) AS avg_duration_s
FROM media GROUP BY media_type
""",
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = multimodal.media_metadata_stats(multimodal.media_table(docs))
    return out.select(
        "media_type", "n", "total_bytes",
        _r("avg_width").alias("avg_width"),
        _r("avg_duration_s").alias("avg_duration_s"),
    )


@register(
    "multimodal_decode",
    """
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
       octet_length(encode(text))::INT AS n_bytes,
       CASE WHEN length(text) = 0 THEN 0.0
            ELSE round(list_avg(list_transform(string_split_regex(text, ''), c -> ascii(c))), 6)
       END AS byte_mean
FROM documents
""",
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-checks the Arrow decode path: n_bytes/byte_mean computed by the
    mapInPandas byte-feature extractor vs DuckDB byte arithmetic over the
    same utf-8 payloads (text is ASCII in the synthetic corpus, so ascii()
    per char == byte value). The array-typed ``feature`` column stays out
    of the driver projection (its canonicalizer can't sort list cells);
    the feature vector itself is pinned by tests/test_multimodal.py."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = multimodal.decode_media(multimodal.media_table(docs))
    return out.select(
        "doc_id", "media_type", "n_bytes", _r("byte_mean").alias("byte_mean")
    )


@register(
    "multimodal_decode_real",
    """
SELECT doc_id,
       CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                       WHEN 2 THEN 'gif' ELSE 'wav' END AS fmt,
       CASE WHEN doc_id % 4 = 3 THEN NULL
            ELSE ((doc_id % 8 + 1) * 160) END::INT AS width,
       CASE WHEN doc_id % 4 = 3 THEN NULL
            ELSE ((doc_id % 8 + 1) * 90) END::INT AS height,
       CASE WHEN doc_id % 4 = 3 THEN 16 ELSE 8 END::INT AS bit_depth,
       CASE WHEN doc_id % 4 = 3 THEN (doc_id % 8) // 4 + 1
            ELSE NULL END::INT AS channels,
       CASE WHEN doc_id % 4 = 3 THEN 8000 * (doc_id % 3 + 1)
            ELSE NULL END::INT AS sample_rate,
       CASE doc_id % 4 WHEN 0 THEN 45 WHEN 1 THEN 41
                       WHEN 2 THEN 13 ELSE 44 END::INT AS n_bytes
FROM documents
""",
)
def q_multimodal_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trips REAL container bytes: media_table_real synthesizes
    header-complete PNG/JPEG/GIF/WAV payloads deterministically from
    doc_id inside an Arrow kernel, decode_media(real=True) parses them
    back with the pure-Python header decoders, and the oracle recomputes
    the expected metadata closed-form from doc_id — so a parser bug
    (endianness, offset, CRC) breaks the hash match."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return multimodal.decode_media(multimodal.media_table_real(docs), real=True)
