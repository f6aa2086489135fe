"""Index aliases (sources/aliases.py): atomic rollover, snapshot
isolation for in-flight readers, rollback via history."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from bm25_pagerank_rpi_spark.plans.index_build import build_index
from bm25_pagerank_rpi_spark.sources import aliases


def _transcripts(spark, texts):
    rows = [
        ("conv_0", i, "user", t, "none") for i, t in enumerate(texts)
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    ).withColumn("ts", F.lit("2025-01-01 00:00:00").cast("timestamp"))


@pytest.fixture(scope="module")
def two_gens(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("alias")
    a = str(root / "gen_a")
    b = str(root / "gen_b")
    build_index(spark, _transcripts(spark, ["alpha beta", "beta gamma"]), a, n_buckets=2)
    build_index(
        spark, _transcripts(spark, ["delta epsilon", "epsilon zeta", "zeta eta"]),
        b, n_buckets=2,
    )
    return str(root / "serving.alias"), a, b


def test_alias_swap_and_resolve(spark, two_gens):
    alias, a, b = two_gens
    aliases.set_alias(alias, a)
    assert aliases.resolve_alias(alias) == a
    cat = aliases.open_alias(spark, alias)
    assert cat.scalar_stats()[0] == 2  # gen_a has 2 docs
    aliases.set_alias(alias, b)
    assert aliases.resolve_alias(alias) == b
    # in-flight reader keeps the pinned generation (snapshot isolation)
    assert cat.root == a and cat.scalar_stats()[0] == 2
    # a reader opened after the swap sees the new generation
    assert aliases.open_alias(spark, alias).scalar_stats()[0] == 3


def test_alias_history_enables_rollback(spark, two_gens):
    alias, a, b = two_gens
    aliases.set_alias(alias, a)
    aliases.set_alias(alias, b)
    with open(alias) as f:
        doc = json.load(f)
    assert doc["history"][-1]["target"] == a
    # rollback = plain swap to the recorded previous target
    aliases.set_alias(alias, doc["history"][-1]["target"])
    assert aliases.resolve_alias(alias) == a


def test_alias_rejects_missing_target(two_gens):
    alias, a, _ = two_gens
    with pytest.raises(FileNotFoundError):
        aliases.set_alias(alias, a + "_nope")


def test_alias_pointer_file_is_atomic_artifact(two_gens):
    alias, a, _ = two_gens
    aliases.set_alias(alias, a)
    # no .tmp residue after a successful swap
    assert not os.path.exists(alias + ".tmp")
