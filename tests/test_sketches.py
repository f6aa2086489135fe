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
