"""Connected components (operators/components.py) vs a union-find oracle.

The operator claims: component_id == min doc id reachable through the
pair graph, every node in the input pairs emitted exactly once, and
convergence in far fewer rounds than the graph diameter (star collapse).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from bm25_pagerank_rpi_spark.operators.components import (
    connected_components,
    dedup_clusters,
)


def _uf_oracle(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min of component: path-compress to roots, then the root
    # IS the min because unions always hang the larger root under the
    # smaller one
    return {x: find(x) for x in parent}


def _run(spark, pairs):
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    out = connected_components(df)
    got = {r.doc_id: r.component_id for r in out.collect()}
    assert out.count() == len(got), "duplicate doc_id rows"
    return got


def test_disjoint_pairs_and_triangle(spark):
    pairs = [(1, 2), (10, 11), (11, 12), (10, 12), (20, 21)]
    assert _run(spark, pairs) == _uf_oracle(pairs)


def test_chain_collapses(spark):
    """A 200-node chain: diameter 199, but star alternation needs only
    O(log n) rounds — max_rounds=15 passes where label propagation
    would need 200."""
    pairs = [(i, i + 1) for i in range(200)]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    out = connected_components(df, max_rounds=15)
    got = {r.doc_id: r.component_id for r in out.collect()}
    assert got == {i: 0 for i in range(201)}


@pytest.mark.parametrize("seed", [7, 19])
def test_randomized_vs_union_find(spark, seed):
    rng = random.Random(seed)
    nodes = list(range(0, 400, 3))  # non-contiguous ids
    pairs = [
        (rng.choice(nodes), rng.choice(nodes))
        for _ in range(150)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    assert _run(spark, pairs) == _uf_oracle(pairs)


def test_direction_and_duplicate_edges_irrelevant(spark):
    base = [(5, 9), (9, 3), (14, 20)]
    noisy = base + [(b, a) for a, b in base] + base
    assert _run(spark, noisy) == _uf_oracle(base)


def test_empty_pairs(spark):
    df = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(df).count() == 0


def test_dedup_clusters_canonical_flag(spark):
    pairs = [(1, 2), (2, 3), (7, 8)]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    out = dedup_clusters(df)
    keep = sorted(r.doc_id for r in out.filter("is_canonical").collect())
    drop = sorted(r.doc_id for r in out.filter("NOT is_canonical").collect())
    assert keep == [1, 7]
    assert drop == [2, 3, 8]


def test_string_ids_cast(spark):
    df = spark.createDataFrame(
        [("100", "200"), ("200", "300")], "doc_a string, doc_b string"
    )
    got = {r.doc_id: r.component_id for r in connected_components(df).collect()}
    assert got == {100: 100, 200: 100, 300: 100}


def test_dedup_keep_best_quality_canonical(spark):
    from pyspark.sql import functions as F

    from bm25_pagerank_rpi_spark.operators.components import (
        connected_components,
        dedup_keep_best,
    )

    # cluster {1,2,3}: doc 3 has the best quality -> canonical despite
    # NOT being the min id; cluster {7,8}: tie -> min id 7 wins
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "doc_a long, doc_b long"
    )
    quality = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0), (7, 5.0), (8, 5.0)],
        "doc_id long, quality double",
    )
    comp = connected_components(pairs)
    got = {
        r.doc_id: r for r in dedup_keep_best(comp, quality).collect()
    }
    assert [d for d, r in got.items() if r.is_canonical and r.component_id == got[1].component_id] == [3]
    assert got[7].is_canonical and not got[8].is_canonical
    # exactly one canonical per component
    from collections import Counter

    per_comp = Counter(
        r.component_id for r in got.values() if r.is_canonical
    )
    assert all(v == 1 for v in per_comp.values())
