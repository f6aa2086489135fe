"""Deterministic sketches: KMV, HyperLogLog, and Count-Min.

At 100 TB the first question about a text corpus is "how many distinct
terms / doc ids / shingles are there" — and exact count-distinct is a
full shuffle of the distinct key set. These sketches answer it with a
bounded-size aggregate. Both are built on the portable 60-bit md5 hash
(functions/hashing.py), so they are bit-identical across Spark and the
DuckDB oracle — unlike Spark's builtin approx_count_distinct, whose
HLL++ register layout is engine-private and can't be value-checked.

KMV (k minimum values, Bar-Yossef et al. 2002): keep the k smallest
distinct hash values; estimate = (k-1) * 2^60 / h_(k). The plan is
groupBy(hash) [map-side combine dedups each partition before the
shuffle] -> orderBy(h).limit(k) [TakeOrderedAndProject: per-partition
top-k, no global sort]. Shuffle volume is the per-partition-distinct
hash set, not the row count.

HyperLogLog (Flajolet et al. 2007): m = 2^P registers; register index =
top P bits of the hash, rho = 1 + leading zeros of the remaining
(60 - P) bits, capped so 2^(CAP - rho) stays integral. The register
aggregate is a groupBy(register).max — map-side combine collapses every
partition to <= m rows, so the shuffle is m rows TOTAL regardless of
corpus size; this is the sketch you'd run on 10^12 turns. The estimate
uses an integer-scaled harmonic sum (sum of 2^(CAP - rho) as BIGINT —
exact, order-independent) so the only floating-point op is one final
division: deterministic to the last ulp in both engines. Small-range
linear-counting correction per the original paper.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import phash

HASH_BITS = 60
KMV_DEFAULT_K = 256
HLL_P = 9  # m = 512 registers
HLL_VALUE_BITS = HASH_BITS - HLL_P  # 51 bits examined for the leading-1
RHO_CAP = HLL_VALUE_BITS + 1  # rho in [1, 52]; 2^(RHO_CAP - rho) >= 1
# alpha_m for m >= 128 (Flajolet et al. 2007, fig. 3)
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / (1 << HLL_P))


def kmv_distinct(values: DataFrame, col: str, k: int = KMV_DEFAULT_K) -> DataFrame:
    """1-row (k, kth_hash, estimate): KMV distinct-count of ``col``.

    ``estimate = (k-1) * 2^60 / kth smallest distinct hash``. If fewer
    than k distinct hashes exist the estimate IS the exact distinct
    count (kth_hash is the max seen; formula not applied)."""
    h = values.select(phash(F.col(col)).alias("h")).distinct()
    mins = h.orderBy("h").limit(k)
    return mins.agg(
        F.count(F.lit(1)).alias("n_seen"),
        F.max("h").alias("kth_hash"),
    ).select(
        F.lit(k).alias("k"),
        "kth_hash",
        F.round(
            F.when(
                F.col("n_seen") < k, F.col("n_seen").cast("double")
            ).otherwise(
                F.lit(float(k - 1))
                * F.lit(float(1 << HASH_BITS))
                / F.col("kth_hash").cast("double")
            ),
            6,
        ).alias("estimate"),
    )


def _rho(rem: Column) -> Column:
    """1 + leading zeros of the low HLL_VALUE_BITS bits of the hash.

    Via the binary-string position of the first '1' in the zero-padded
    bin() rendering — pure string ops, identical in Spark and DuckDB
    (rem = 0 => no '1' => rho = RHO_CAP)."""
    padded = F.lpad(F.bin(rem), HLL_VALUE_BITS, "0")
    pos = F.instr(padded, "1")
    return F.when(pos == 0, F.lit(RHO_CAP)).otherwise(pos)


def hll_registers(values: DataFrame, col: str) -> DataFrame:
    """(register, max_rho) — the HLL register table (<= m rows)."""
    h = values.select(phash(F.col(col)).alias("h"))
    reg = F.shiftright("h", HLL_VALUE_BITS)
    rem = F.col("h") - F.shiftleft(F.shiftright("h", HLL_VALUE_BITS), HLL_VALUE_BITS)
    return (
        h.select(reg.alias("register"), _rho(rem).alias("rho"))
        .groupBy("register")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Union per-segment register tables into one sketch: max per
    register. HLL's register max is associative/commutative/idempotent,
    so merging N segment sketches is BIT-IDENTICAL to sketching the
    union directly — the property that lets every segment/partition
    sketch independently and a coordinator combine <= m-row tables."""
    out = register_tables[0]
    for t in register_tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("register").agg(F.max("max_rho").alias("max_rho"))


def hll_cardinality_from_registers(regs: DataFrame) -> DataFrame:
    """Estimate from a (register, max_rho) table — shared by the direct
    path and merged per-segment sketches (:func:`hll_merge`)."""
    m = 1 << HLL_P
    agg = regs.agg(
        F.count(F.lit(1)).alias("n_regs"),
        # shiftleft needs a literal shift in the python API -> expr form
        F.sum(F.expr(f"shiftleft(1L, {RHO_CAP} - max_rho)")).alias("present_sum"),
    )
    zeros = F.lit(m) - F.col("n_regs")
    # empty input: agg yields (n_regs=0, present_sum=NULL) -> all-zeros sketch
    sum_scaled = F.coalesce("present_sum", F.lit(0).cast("long")) + zeros * F.lit(
        1 << RHO_CAP
    ).cast("long")
    raw = (
        F.lit(HLL_ALPHA * m * m)
        * F.lit(float(1 << RHO_CAP))
        / sum_scaled.cast("double")
    )
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(
        F.lit(m).alias("m"),
        zeros.cast("long").alias("zero_registers"),
        sum_scaled.cast("long").alias("sum_scaled"),
        F.round(est, 6).alias("estimate"),
    )


def hll_cardinality(values: DataFrame, col: str) -> DataFrame:
    """1-row (m, zero_registers, sum_scaled, estimate): HLL estimate.

    sum_scaled = sum over ALL m registers of 2^(RHO_CAP - rho), with
    rho = 0 for absent registers (2^RHO_CAP each) — exact BIGINT, so the
    raw estimate alpha * m^2 * 2^RHO_CAP / sum_scaled is one IEEE
    division. Small-range correction: raw <= 2.5m and zero registers
    present => linear counting m * ln(m / zero_registers)."""
    return hll_cardinality_from_registers(hll_registers(values, col))


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------

CMS_D = 4  # depth: independent hash rows; P(over by > eps*N) <= e^-d
CMS_W = 512  # width: buckets per row; eps = e / w


def cms_counters(
    values: DataFrame, col: str, d: int = CMS_D, w: int = CMS_W
) -> DataFrame:
    """(j, bucket, counter) — the Count-Min sketch table (<= d*w rows).

    bucket_j(v) = phash(v || '#cms' || j) % w (hash-domain separation for
    the d rows, same portable-seeding trick as the MinHash family). The
    plan is one groupBy(j, bucket).count over a posexplode of the d
    bucket ids per occurrence: map-side combine collapses every partition
    to <= d*w rows before the shuffle, so — like the HLL register table —
    the exchanged state is sketch-sized (d*w rows TOTAL) no matter how
    many occurrences stream through. This is the frequency sketch to run
    alongside HLL on a 10^12-turn corpus: one scan, bounded memory,
    mergeable across partitions/segments by cell-wise addition."""
    buckets = [
        F.pmod(
            phash(F.concat(F.col(col), F.lit(f"#cms{j}"))), F.lit(w)
        ).cast("int")
        for j in range(d)
    ]
    return (
        values.select(F.posexplode(F.array(*buckets)).alias("j", "bucket"))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("counter"))
    )


def cms_point_estimates(
    values: DataFrame,
    col: str,
    items: list[str],
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """(item, estimate) — CMS point queries for ``items``.

    estimate(v) = min over the d rows of the counter at (j, bucket_j(v)):
    always >= the true occurrence count, and over by more than (e/w)*N
    with probability <= e^-d. ``items`` is a driver-side candidate list
    (in practice: a sampled or domain-known head set — the sketch answers
    "how often", not "which items"); the sketch-sized (d*w-row) counter
    table is the broadcast build side of the probe join, so the probe
    costs nothing at corpus scale. Untouched buckets estimate 0 via the
    left-join coalesce."""
    return cms_point_estimates_from_counters(
        cms_counters(values, col, d, w), items, d, w
    )


def cms_merge(*counter_tables: DataFrame) -> DataFrame:
    """Union per-segment CMS tables into one sketch: cell-wise counter
    addition. Like the HLL register max, CMS addition is associative and
    commutative, so N segment sketches merge into a table bit-identical
    to sketching the union directly — each merge input is <= d*w rows."""
    out = counter_tables[0]
    for t in counter_tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("j", "bucket").agg(F.sum("counter").alias("counter"))


def cms_point_estimates_from_counters(
    cnt: DataFrame, items: list[str], d: int = CMS_D, w: int = CMS_W
) -> DataFrame:
    """Point estimates against a prebuilt / merged counter table
    (shared tail of :func:`cms_point_estimates`)."""
    spark = cnt.sparkSession
    idf = spark.createDataFrame([(it,) for it in items], "item string")
    probe_buckets = [
        F.pmod(
            phash(F.concat(F.col("item"), F.lit(f"#cms{j}"))), F.lit(w)
        ).cast("int")
        for j in range(d)
    ]
    probes = idf.select(
        "item", F.posexplode(F.array(*probe_buckets)).alias("j", "bucket")
    )
    # probes preserved on the LEFT, counters broadcast on the right: Spark
    # cannot broadcast the stream-preserved side of a right-outer join, so
    # the previous cnt.join(broadcast(probes), 'right') spelling silently
    # ignored the hint. The counter table is sketch-sized (<= d*w rows)
    # by construction, so it is the correct build side at any corpus size.
    return (
        probes.join(F.broadcast(cnt), ["j", "bucket"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce("counter", F.lit(0).cast("long"))).alias("estimate"))
    )
