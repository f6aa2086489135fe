"""Similarity-search operator semantics vs a NumPy oracle."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql.types import (
    ArrayType, FloatType, LongType, StructField, StructType,
)

from bm25_pagerank_rpi_spark.operators import similarity

DIM = 8
N = 40


def _emb(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(N, DIM).astype(np.float32)
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(N)]
    return spark.createDataFrame(rows, schema), vecs.astype(np.float64)


def _np_cosine(a, b):
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_brute_force_topk_matches_numpy(spark):
    emb, vecs = _emb(spark)
    out = similarity.brute_force_topk(emb, [0, 1], k=5).collect()
    by_q: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r.query_id, r.rank)):
        by_q.setdefault(r.query_id, []).append(r)
    for q in (0, 1):
        sims = [
            (round(_np_cosine(vecs[q], vecs[i]), 6), i)
            for i in range(N)
            if i != q
        ]
        expect = sorted(sims, key=lambda t: (-t[0], t[1]))[:5]
        got = [(r.cos, r.vec_id) for r in by_q[q]]
        assert got == [(pytest.approx(c, abs=1e-9), i) for c, i in expect]
        assert [r.rank for r in by_q[q]] == [1, 2, 3, 4, 5]


def test_lsh_bucket_is_sign_pattern(spark):
    emb, vecs = _emb(spark)
    planes = np.array(similarity.hyperplanes(dim=DIM))
    got = {r.vec_id: r.bucket for r in similarity.with_lsh_bucket(emb, planes.tolist()).collect()}
    for i in range(N):
        expect = sum(
            (1 << p) for p in range(planes.shape[0]) if float(np.dot(vecs[i], planes[p])) >= 0
        )
        assert got[i] == expect


def test_lsh_topk_subset_of_bruteforce_universe(spark):
    emb, vecs = _emb(spark)
    planes = [[round(float(x), 6) for x in row] for row in np.array(similarity.hyperplanes(dim=DIM))]
    out = similarity.lsh_topk(emb, [0], k=5, planes=planes).collect()
    # every returned neighbor sits within the probe radius (Hamming <= 1
    # sign-bit flips of the query's bucket) and cosine is exact
    buckets = {r.vec_id: r.bucket for r in similarity.with_lsh_bucket(emb, planes).collect()}
    for r in out:
        assert bin(buckets[r.vec_id] ^ buckets[0]).count("1") <= 1
        assert r.cos == pytest.approx(round(_np_cosine(vecs[0], vecs[r.vec_id]), 6), abs=1e-9)
    # radius 0 restricts to the exact bucket
    for r in similarity.lsh_topk(emb, [0], k=5, planes=planes, probe_hamming=0).collect():
        assert buckets[r.vec_id] == buckets[0]


def test_cosine_dedup_finds_planted_pair(spark):
    emb, vecs = _emb(spark)
    planes = [[round(float(x), 6) for x in row] for row in np.array(similarity.hyperplanes(dim=DIM))]
    from pyspark.sql import functions as F

    planted = emb.filter(F.col("vec_id") == 3).select(
        (F.col("vec_id") + 100).alias("vec_id"),
        F.transform("embedding", lambda x: x * 2.0).alias("embedding"),
    )
    aug = emb.unionByName(planted)
    pairs = similarity.cosine_dedup_pairs(aug, threshold=0.95, planes=planes).collect()
    assert {(r.vec_a, r.vec_b) for r in pairs} == {(3, 103)}
    assert pairs[0].cos == pytest.approx(1.0, abs=1e-9)


def test_ivf_topk_probes_nearest_cells(spark):
    emb, vecs = _emb(spark)
    import numpy as np

    from pyspark.sql import functions as F

    cents = similarity.ivf_centroids(dim=DIM)
    out = similarity.ivf_topk(emb, [0], k=5, nprobe=2, cents=cents).collect()
    assert out  # some neighbors share the probed cells
    cm = np.array(cents)
    assign = {
        r.vec_id: r.cell
        for r in similarity.with_ivf_cell(emb, cents).collect()
    }
    # numpy replica of the assignment: argmax dot with (dot desc, cid desc)
    for vid, cell in assign.items():
        d = cm @ np.array(vecs[vid])
        best = max(range(len(cents)), key=lambda i: (round(d[i], 12), i))
        assert cell == best
    # probed cells of the query = its 2 best centroids
    dq = cm @ np.array(vecs[0])
    probe = set(sorted(range(len(cents)), key=lambda i: (-dq[i], -i))[:2])
    for r in out:
        assert assign[r.vec_id] in probe
        assert r.cos == pytest.approx(round(_np_cosine(vecs[0], vecs[r.vec_id]), 6), abs=1e-9)
