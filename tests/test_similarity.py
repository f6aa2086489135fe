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
    out = similarity.lsh_topk(emb, [0], k=5, planes=planes, probe_hamming=1).collect()
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


def test_n_planes_for_bucket_size_control():
    """VERDICT r2 #4: plane count scales with corpus size so the expected
    bucket population stays ~target instead of growing linearly."""
    assert similarity.n_planes_for(1_000_000, 256) == 12
    assert similarity.n_planes_for(512, 256) == 1
    assert similarity.n_planes_for(0, 256) == 1
    for n in (10**4, 10**6, 10**8):
        p = similarity.n_planes_for(n, 256)
        assert n / (1 << p) <= 256  # bucket population bounded by target
        assert n / (1 << max(p - 1, 1)) > 256 or p == 1  # and not overshot


def test_hyperplanes_prefix_stable():
    """Widening the plane set keeps the first rows identical, so adaptive
    plane counts refine existing buckets instead of reshuffling them."""
    base = similarity.hyperplanes(dim=DIM, n_planes=4)
    wide = similarity.hyperplanes(dim=DIM, n_planes=10)
    assert wide[:4] == base
    assert similarity.hyperplanes(dim=DIM)[:4] == base


def test_cosine_dedup_banded_recall(spark):
    """Banding sign-hashes (MinHash-style) recovers the recall that a
    single wide sign pattern loses: every all-plane collision is also a
    per-band collision (superset), and near-dup recall rises sharply."""
    rng = np.random.RandomState(11)
    base = rng.randn(60, DIM)
    noisy = base + 0.12 * rng.randn(60, DIM)
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    rows = [(int(i), [float(x) for x in base[i]]) for i in range(60)] + [
        (int(1000 + i), [float(x) for x in noisy[i]]) for i in range(60)
    ]
    emb = spark.createDataFrame(rows, schema)
    # float32 storage: compute the ground truth on the WIDENED values
    base32 = base.astype(np.float32).astype(np.float64)
    noisy32 = noisy.astype(np.float32).astype(np.float64)
    truth = {
        (i, 1000 + i)
        for i in range(60)
        if round(_np_cosine(base32[i], noisy32[i]), 6) >= 0.95
    }
    assert len(truth) >= 30  # the fixture actually contains near-dups
    planes12 = similarity.hyperplanes(dim=DIM, n_planes=12)
    single = {
        (r.vec_a, r.vec_b)
        for r in similarity.cosine_dedup_pairs(
            emb, 0.95, planes=planes12, bands=1
        ).collect()
    }
    banded = {
        (r.vec_a, r.vec_b)
        for r in similarity.cosine_dedup_pairs(
            emb, 0.95, planes=planes12, bands=4
        ).collect()
    }
    assert single <= banded  # per-band collision is implied by all-plane
    rec_single = len(single & truth) / len(truth)
    rec_banded = len(banded & truth) / len(truth)
    assert rec_banded >= 0.9
    assert rec_banded > rec_single


def test_cosine_dedup_adaptive_planes(spark):
    """planes=None sizes the plane count from the corpus; returned pairs
    are still exact-verified."""
    emb, vecs = _emb(spark)
    from pyspark.sql import functions as F

    planted = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 100).alias("vec_id"),
        F.transform("embedding", lambda x: x * 3.0).alias("embedding"),
    )
    aug = emb.unionByName(planted)
    out = similarity.cosine_dedup_pairs(
        aug, 0.95, bands=4, target_bucket_size=8, dim=DIM
    ).collect()
    got = {(r.vec_a, r.vec_b) for r in out}
    # scaled copies are cos==1 with their original and MUST collide in
    # every band (identical sign patterns)
    assert {(i, 100 + i) for i in range(5)} <= got
    for r in out:
        a = vecs[r.vec_a % 100]
        b = vecs[r.vec_b % 100]
        assert r.cos == pytest.approx(round(_np_cosine(a, b), 6), abs=1e-9)
        assert r.cos >= 0.95


def test_kmeans_centroids_lift_ivf_recall_on_clustered(spark):
    """VERDICT r2 #2: sampled-kmeans centroids on clustered embeddings
    lift IVF recall to >= 0.8 at a 25% scan fraction (nprobe 4 of 16)."""
    from bm25_pagerank_rpi_spark.sources.embeddings_fixture import (
        synthesize_clustered_embeddings,
    )

    emb = synthesize_clustered_embeddings(
        spark, 400, dim=16, n_clusters=8, seed=5
    ).select("vec_id", "embedding")
    cents = similarity.kmeans_centroids(emb, n=16, sample=400, iters=10)
    assert len(cents) == 16 and all(len(c) == 16 for c in cents)
    for c in cents:
        assert abs(float(np.linalg.norm(c)) - 1.0) < 1e-3
    # deterministic: same corpus -> same centroids
    assert cents == similarity.kmeans_centroids(emb, n=16, sample=400, iters=10)
    qids = [0, 1, 2, 3, 4]
    exact = {
        (r.query_id, r.vec_id)
        for r in similarity.brute_force_topk(emb, qids, k=10).collect()
    }
    got = {
        (r.query_id, r.vec_id)
        for r in similarity.ivf_topk(emb, qids, k=10, nprobe=4, cents=cents).collect()
    }
    assert len(exact & got) / len(exact) >= 0.8


# ---------------------------------------------------------------------------
# int8 scalar quantization (sq_quantize / sq_topk)
# ---------------------------------------------------------------------------


def test_sq_quantize_bounds_and_reconstruction(spark):
    import numpy as np

    from bm25_pagerank_rpi_spark.operators.similarity import sq_quantize

    rng = np.random.RandomState(7)
    rows = [(i, [float(x) for x in rng.randn(16)]) for i in range(20)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = sq_quantize(emb).collect()
    for r in got:
        v = np.array(dict(rows)[r.vec_id])
        assert max(abs(q) for q in r.q) <= 127
        assert abs(r.scale - max(1e-12, np.abs(v).max() / 127.0)) < 1e-15
        # dequantized reconstruction error bounded by scale/2 per coord
        rec = np.array(r.q, dtype=float) * r.scale
        assert np.max(np.abs(rec - v)) <= r.scale / 2 + 1e-12


def test_sq_topk_matches_exact_on_separated_data(spark):
    import numpy as np

    from bm25_pagerank_rpi_spark.operators.similarity import (
        brute_force_topk,
        sq_topk,
    )

    # well-separated clusters: quantization noise cannot reorder the
    # true top-k, so SQ top-k == exact top-k ids
    rng = np.random.RandomState(3)
    centers = rng.randn(4, 12) * 10
    rows = []
    for i in range(40):
        c = centers[i % 4]
        rows.append((i, [float(x) for x in (c + rng.randn(12) * 0.01)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {
        (r.query_id, r.rank): r.vec_id
        for r in brute_force_topk(emb, [0, 1], k=5).collect()
    }
    sq = {
        (r.query_id, r.rank): r.vec_id
        for r in sq_topk(emb, [0, 1], k=5, rescore_multiplier=4).collect()
    }
    assert sq == exact
    # exact rescore column equals the brute-force cosine
    bf = {
        (r.query_id, r.vec_id): r.cos
        for r in brute_force_topk(emb, [0, 1], k=5).collect()
    }
    for r in sq_topk(emb, [0, 1], k=5, rescore_multiplier=4).collect():
        assert abs(r.cos - bf[(r.query_id, r.vec_id)]) < 1e-9


def test_pq_encode_shapes_and_determinism(spark):
    from bm25_pagerank_rpi_spark.operators import similarity as sim

    emb, _ = _emb(spark)
    enc = sim.pq_encode(emb)
    rows = enc.collect()
    assert len(rows) == N
    for r in rows[:10]:
        for j in range(sim.PQ_M):
            assert 0 <= r[f"code{j}"] < sim.PQ_K
        assert r["pq_nrm"] > 0
    # same input -> identical codes (pure expression work, no sampling)
    again = {r.vec_id: tuple(r[f"code{j}"] for j in range(sim.PQ_M))
             for r in sim.pq_encode(emb).collect()}
    first = {r.vec_id: tuple(r[f"code{j}"] for j in range(sim.PQ_M))
             for r in rows}
    assert again == first


def test_pq_topk_rescore_is_exact_cosine(spark):
    from bm25_pagerank_rpi_spark.operators import similarity as sim

    emb, vecs = _emb(spark)
    out = sim.pq_topk(emb, [0, 1], k=5, rescore_multiplier=6).collect()
    assert {r.query_id for r in out} == {0, 1}
    for r in out:
        expect = _np_cosine(vecs[r.query_id], vecs[r.vec_id])
        assert abs(r.cos - expect) < 1e-5  # 6dp rounding on the spark side
    # ranks are 1..5 without gaps, ordered by cos desc
    for qid in (0, 1):
        got = sorted((r.rank, -r.cos) for r in out if r.query_id == qid)
        assert [g[0] for g in got] == [1, 2, 3, 4, 5]


def test_pq_topk_recovers_exact_on_separated_clusters(spark):
    import numpy as np

    from bm25_pagerank_rpi_spark.operators import similarity as sim

    # same regime as the SQ test: inter-cluster gaps dwarf quantization
    # error, so the ADC pool contains the true top-k and the exact
    # rescore restores the brute-force ranking
    rng = np.random.RandomState(5)
    centers = rng.randn(4, 64) * 10
    rows = []
    for i in range(48):
        c = centers[i % 4]
        rows.append((i, [float(x) for x in (c + rng.randn(64) * 0.01)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {
        (r.query_id, r.rank): r.vec_id
        for r in sim.brute_force_topk(emb, [0, 1], k=5).collect()
    }
    pq = {
        (r.query_id, r.rank): r.vec_id
        for r in sim.pq_topk(emb, [0, 1], k=5, rescore_multiplier=6).collect()
    }
    assert pq == exact


def test_ivfpq_candidates_come_from_probed_cells(spark):
    from bm25_pagerank_rpi_spark.operators import similarity as sim

    emb, _ = _emb(spark)
    cents = sim.ivf_centroids(dim=DIM)
    books = sim.pq_codebooks(dim=DIM, m=4, k=8)
    out = sim.ivfpq_topk(emb, [0], k=5, nprobe=2, rescore_multiplier=4,
                         cents=cents, books=books).collect()
    assert 0 < len(out) <= 5
    # every returned candidate's assigned cell is one of the query's
    # 2 probed cells
    assigned = {
        r.vec_id: r.cell for r in sim.with_ivf_cell(emb, cents).collect()
    }
    import numpy as np
    qv = [r.v for r in sim._vecs(emb).filter("vec_id = 0").collect()][0]
    sims = np.array(cents) @ np.array(qv)
    order = sorted(range(len(cents)), key=lambda c: (-sims[c], -c))
    probed = set(order[:2])
    for r in out:
        assert assigned[r.vec_id] in probed
    # rescore column is the exact cosine
    for r in out:
        vecs = {x.vec_id: x.v for x in sim._vecs(emb).collect()}
        assert abs(r.cos - _np_cosine(np.array(qv), np.array(vecs[r.vec_id]))) < 1e-5
        break


def test_ivfpq_matches_pq_at_full_probe(spark):
    from bm25_pagerank_rpi_spark.operators import similarity as sim

    emb, _ = _emb(spark)
    cents = sim.ivf_centroids(dim=DIM)
    books = sim.pq_codebooks(dim=DIM, m=4, k=8)
    # probing ALL cells makes IVF pruning a no-op -> ivfpq == pq exactly
    full = {
        (r.query_id, r.rank): (r.vec_id, r.cos)
        for r in sim.ivfpq_topk(
            emb, [0, 1], k=5, nprobe=sim.N_CENTROIDS, rescore_multiplier=4,
            cents=cents, books=books,
        ).collect()
    }
    pq = {
        (r.query_id, r.rank): (r.vec_id, r.cos)
        for r in sim.pq_topk(
            emb, [0, 1], k=5, rescore_multiplier=4, books=books
        ).collect()
    }
    assert full == pq
