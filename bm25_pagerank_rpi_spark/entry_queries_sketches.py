"""Driver pairs for the deterministic cardinality sketches
(operators/sketches.py): KMV and HyperLogLog distinct-term counts over
the documents corpus.

Unlike Spark's builtin approx_count_distinct (engine-private HLL++
registers), these sketches are defined purely in terms of the portable
60-bit md5 hash, so DuckDB replays the register/min-hash computation
bit-for-bit and the driver's value-hash compare holds exactly."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .entry_queries import _docs, register
from .functions.hashing import phash_sql
from .functions.tokenize import tokens_col
from .operators import sketches
from .operators.sketches import (
    HLL_ALPHA,
    HLL_P,
    HLL_VALUE_BITS,
    KMV_DEFAULT_K,
    RHO_CAP,
)

_TOKS = """
WITH toks AS (
  SELECT doc_id, t.term
  FROM documents, unnest(string_split(text, ' ')) AS t(term)
  WHERE t.term <> ''
),
"""

_M = 1 << HLL_P
_ALPHA_M2 = HLL_ALPHA * _M * _M
_POW_CAP = float(1 << RHO_CAP)

ORACLE_KMV = _TOKS + f"""
h AS (SELECT DISTINCT {phash_sql("term")} AS h FROM toks),
mins AS (SELECT h FROM h ORDER BY h LIMIT {KMV_DEFAULT_K}),
agg AS (SELECT count(*) AS n_seen, max(h) AS kth_hash FROM mins)
SELECT {KMV_DEFAULT_K} AS k, kth_hash,
       round(CASE WHEN n_seen < {KMV_DEFAULT_K} THEN n_seen::DOUBLE
             ELSE {float(KMV_DEFAULT_K - 1)!r} * {float(1 << 60)!r} / kth_hash::DOUBLE
             END, 6) AS estimate
FROM agg
"""

ORACLE_HLL = _TOKS + f"""
h AS (SELECT {phash_sql("term")} AS h FROM toks),
rr AS (SELECT h >> {HLL_VALUE_BITS} AS register,
              h - ((h >> {HLL_VALUE_BITS}) << {HLL_VALUE_BITS}) AS rem
       FROM h),
rho AS (SELECT register,
               CASE WHEN strpos(lpad(bin(rem), {HLL_VALUE_BITS}, '0'), '1') = 0
                    THEN {RHO_CAP}
                    ELSE strpos(lpad(bin(rem), {HLL_VALUE_BITS}, '0'), '1')
               END AS rho
        FROM rr),
regs AS (SELECT register, max(rho) AS max_rho FROM rho GROUP BY register),
agg AS (SELECT count(*) AS n_regs,
               sum(1::BIGINT << ({RHO_CAP} - max_rho))::BIGINT AS present_sum
        FROM regs),
est AS (
  SELECT ({_M} - n_regs)::BIGINT AS zero_registers,
         (present_sum + ({_M} - n_regs) * (1::BIGINT << {RHO_CAP}))::BIGINT AS sum_scaled
  FROM agg
),
raw AS (
  SELECT zero_registers, sum_scaled,
         {_ALPHA_M2!r}::DOUBLE * {_POW_CAP!r}::DOUBLE / sum_scaled::DOUBLE AS raw
  FROM est
)
SELECT {_M} AS m, zero_registers, sum_scaled,
       round(CASE WHEN raw <= {2.5 * _M!r}::DOUBLE AND zero_registers > 0
             THEN {float(_M)!r}::DOUBLE * ln({float(_M)!r}::DOUBLE / zero_registers::DOUBLE)
             ELSE raw END, 6) AS estimate
FROM raw
"""


def _term_occurrences(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        F.explode(tokens_col("text")).alias("term")
    )


@register("kmv_distinct_terms", ORACLE_KMV)
def q_kmv_distinct_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sketches.kmv_distinct(_term_occurrences(spark, sf_dir), "term")


@register("hll_distinct_terms", ORACLE_HLL)
def q_hll_distinct_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sketches.hll_cardinality(_term_occurrences(spark, sf_dir), "term")


# ---------------------------------------------------------------------------
# Count-Min sketch: point estimates for a candidate term set
# ---------------------------------------------------------------------------

from .operators.sketches import CMS_D, CMS_W  # noqa: E402

_CMS_ITEMS = ["hash", "join", "table", "key", "value", "spark", "zzzabsent"]
_CMS_SEEDS = ", ".join(str(j) for j in range(CMS_D))
_CMS_ITEM_VALUES = ", ".join(f"('{it}')" for it in _CMS_ITEMS)

ORACLE_CMS = _TOKS + f"""
cnt AS (
  SELECT s.j, {phash_sql("term || '#cms' || s.j::VARCHAR")} % {CMS_W} AS bucket,
         count(*) AS counter
  FROM toks, unnest([{_CMS_SEEDS}]) AS s(j)
  GROUP BY 1, 2
),
items AS (SELECT * FROM (VALUES {_CMS_ITEM_VALUES}) AS v(item)),
probes AS (
  SELECT item, s.j,
         {phash_sql("item || '#cms' || s.j::VARCHAR")} % {CMS_W} AS bucket
  FROM items, unnest([{_CMS_SEEDS}]) AS s(j)
)
SELECT item, min(coalesce(counter, 0))::BIGINT AS estimate
FROM probes LEFT JOIN cnt ON cnt.j = probes.j AND cnt.bucket = probes.bucket
GROUP BY item
"""


@register("cms_term_counts", ORACLE_CMS)
def q_cms_term_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min point estimates for the bench query vocabulary (plus one
    absent term, exercising the untouched-bucket zero path) over the
    documents corpus's term occurrences."""
    return sketches.cms_point_estimates(
        _term_occurrences(spark, sf_dir), "term", _CMS_ITEMS
    )


# ---------------------------------------------------------------------------
# Merged per-segment sketches: the distributed property, value-checked.
# Sketch each half of the corpus independently, merge the <= m-row /
# <= d*w-row sketch tables, and emit — BIT-IDENTICAL to sketching the
# union directly, so each pair reuses the direct path's oracle verbatim.
# ---------------------------------------------------------------------------

def _term_occurrences_half(spark, sf_dir, parity: int):
    return (
        _docs(spark, sf_dir)
        .filter(F.col("doc_id") % 2 == parity)
        .select(F.explode(tokens_col("text")).alias("term"))
    )


@register("hll_merged_terms", ORACLE_HLL)
def q_hll_merged_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = sketches.hll_registers(_term_occurrences_half(spark, sf_dir, 0), "term")
    b = sketches.hll_registers(_term_occurrences_half(spark, sf_dir, 1), "term")
    return sketches.hll_cardinality_from_registers(sketches.hll_merge(a, b))


@register("cms_merged_counts", ORACLE_CMS)
def q_cms_merged_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = sketches.cms_counters(_term_occurrences_half(spark, sf_dir, 0), "term")
    b = sketches.cms_counters(_term_occurrences_half(spark, sf_dir, 1), "term")
    return sketches.cms_point_estimates_from_counters(
        sketches.cms_merge(a, b), _CMS_ITEMS
    )
