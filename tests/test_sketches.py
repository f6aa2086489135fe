"""KMV / HyperLogLog cardinality sketches: accuracy and edge cases."""

from __future__ import annotations

import pytest

from bm25_pagerank_rpi_spark.operators import sketches


def _values(spark, n_distinct: int, dup: int = 3):
    return (
        spark.range(n_distinct * dup)
        .selectExpr(f"concat('v_', id % {n_distinct}) AS v")
    )


def test_kmv_accuracy(spark):
    n = 5000
    row = sketches.kmv_distinct(_values(spark, n), "v", k=256).collect()[0]
    assert row["k"] == 256
    # KMV relative error ~ 1/sqrt(k-1) ~= 6%; allow 4 sigma
    assert row["estimate"] == pytest.approx(n, rel=0.25)


def test_kmv_below_k_is_exact(spark):
    row = sketches.kmv_distinct(_values(spark, 100), "v", k=256).collect()[0]
    assert row["estimate"] == 100.0


def test_hll_accuracy(spark):
    n = 5000
    row = sketches.hll_cardinality(_values(spark, n), "v").collect()[0]
    assert row["m"] == 512
    # HLL std error ~ 1.04/sqrt(512) ~= 4.6%; allow 4 sigma
    assert row["estimate"] == pytest.approx(n, rel=0.2)


def test_hll_small_range_linear_counting(spark):
    # 30 distinct << 2.5 m -> the linear-counting branch
    row = sketches.hll_cardinality(_values(spark, 30), "v").collect()[0]
    assert row["zero_registers"] > 0
    assert row["estimate"] == pytest.approx(30, rel=0.25)


def test_duplicates_do_not_change_sketch(spark):
    a = sketches.hll_cardinality(_values(spark, 500, dup=1), "v").collect()[0]
    b = sketches.hll_cardinality(_values(spark, 500, dup=7), "v").collect()[0]
    assert a == b
    ka = sketches.kmv_distinct(_values(spark, 500, dup=1), "v").collect()[0]
    kb = sketches.kmv_distinct(_values(spark, 500, dup=7), "v").collect()[0]
    assert ka == kb


def test_hll_empty_input(spark):
    empty = spark.createDataFrame([], "v string")
    row = sketches.hll_cardinality(empty, "v").collect()[0]
    assert row["zero_registers"] == 512
    assert row["estimate"] == 0.0


# ---------------------------------------------------------------------------
# Count-Min
# ---------------------------------------------------------------------------

def _skewed(spark):
    # 'hot' x 400, 'warm' x 50, 'v_i' x 1 for 200 tail items
    return spark.range(650).selectExpr(
        "CASE WHEN id < 400 THEN 'hot' WHEN id < 450 THEN 'warm' "
        "ELSE concat('v_', id) END AS v"
    )


def test_cms_never_underestimates(spark):
    est = {
        r["item"]: r["estimate"]
        for r in sketches.cms_point_estimates(
            _skewed(spark), "v", ["hot", "warm", "v_500", "absent"]
        ).collect()
    }
    assert est["hot"] >= 400
    assert est["warm"] >= 50
    assert est["v_500"] >= 1
    # w=512 >> 200 distinct tail items: heavy hitters come back near-exact
    assert est["hot"] <= 400 + 250  # loose union bound on collisions
    assert est["absent"] >= 0


def test_cms_counter_table_is_sketch_sized(spark):
    cnt = sketches.cms_counters(_skewed(spark), "v")
    assert cnt.count() <= sketches.CMS_D * sketches.CMS_W
    # total mass per row j = total occurrences
    per_row = {r["j"]: r["s"] for r in
               cnt.groupBy("j").agg(__import__("pyspark").sql.functions.sum("counter").alias("s")).collect()}
    assert set(per_row) == set(range(sketches.CMS_D))
    assert all(v == 650 for v in per_row.values())


def test_cms_absent_item_zero_when_buckets_untouched(spark):
    tiny = spark.createDataFrame([("a",), ("a",), ("b",)], "v string")
    est = {
        r["item"]: r["estimate"]
        for r in sketches.cms_point_estimates(
            tiny, "v", ["a", "b", "zzz_never_seen"]
        ).collect()
    }
    assert est["a"] == 2 and est["b"] == 1
    # 3 occupied cells out of 2048: the absent probe hits empty cells
    assert est["zzz_never_seen"] == 0


def test_merged_sketches_equal_direct(spark):
    vals = _values(spark, 800, dup=2).withColumn(
        "part", __import__("pyspark").sql.functions.expr("abs(hash(v)) % 3")
    )
    parts = [vals.filter(f"part = {i}").select("v") for i in range(3)]
    # HLL: merged register table == direct register table
    direct = {(r.register, r.max_rho)
              for r in sketches.hll_registers(vals, "v").collect()}
    merged_regs = sketches.hll_merge(
        *[sketches.hll_registers(p, "v") for p in parts]
    )
    assert {(r.register, r.max_rho) for r in merged_regs.collect()} == direct
    assert (
        sketches.hll_cardinality_from_registers(merged_regs).collect()
        == sketches.hll_cardinality(vals, "v").collect()
    )
    # CMS: merged counter table == direct counter table
    dcnt = {(r.j, r.bucket): r.counter
            for r in sketches.cms_counters(vals, "v").collect()}
    mcnt = {(r.j, r.bucket): r.counter
            for r in sketches.cms_merge(
                *[sketches.cms_counters(p, "v") for p in parts]).collect()}
    assert mcnt == dcnt
