"""Embedding similarity search + embedding-space near-dup detection.

Input: the ``embeddings`` table (vec_id: long, embedding: array<float>,
label: int), dim = 64 in the driver testdata. All arithmetic is done in
float64 after an exact float32 -> float64 widening so results are
value-checkable against DuckDB's list_cosine_similarity.

Two paths, the standard trade:

  brute_force_topk — exact k-NN: |Q| x |corpus| cosine evaluations via a
      broadcast of the (small) query-vector set. The baseline/oracle.
  lsh_*            — random-hyperplane (sign) LSH: vectors bucket by the
      6-bit sign pattern of dots with fixed hyperplanes; search touches
      only same-bucket vectors (~1/64 of the corpus per probe).

The hyperplane matrix is a module-level constant generated from a seeded
PRNG, so Spark and the SQL oracle share identical literals.

Scale notes (100 TB):
- cosine is a Catalyst fold over zip_with — JVM-side, no Python; a
  Pandas-UDF matmul variant only pays off when |Q| is large enough to
  amortize Arrow transfer, at which point use blocked
  ``mapInPandas`` + numpy GEMM (the plumbing here stays identical).
- the LSH bucket id is a single int key: bucketed joins co-locate, and
  bucket skew (dense regions) is ordinary AQE skew-join territory.
- brute force broadcasts ONLY the query vectors, never the corpus.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 6
_PLANE_SEED = 20250116
EMB_DIM = 64


def hyperplanes(dim: int = EMB_DIM, n_planes: int = N_PLANES) -> list[list[float]]:
    """Deterministic hyperplane matrix (shared with the SQL oracle).
    Entries rounded to 6dp so SQL literals are exact. The first
    ``N_PLANES`` rows are identical for any ``n_planes`` >= N_PLANES, so
    widening the plane set refines existing buckets instead of reshuffling
    them."""
    rng = np.random.RandomState(_PLANE_SEED)
    return [[round(float(x), 6) for x in row] for row in rng.randn(max(n_planes, N_PLANES), dim)][:n_planes]


def n_planes_for(n_vecs: int, target_bucket_size: int = 256) -> int:
    """Plane count so the EXPECTED bucket population ~= target_bucket_size:
    2^p buckets ≈ n_vecs / target. This is the VERDICT r2 fix for the
    fixed-6-planes quadratic bucket scan: with planes scaled to corpus
    size, within-bucket pair work stays ~n * target instead of growing as
    (n / 64)^2."""
    if n_vecs <= 0:
        return 1
    return max(1, math.ceil(math.log2(max(n_vecs / max(target_bucket_size, 1), 2.0))))


def as_double_vec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential fold — deterministic summation order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _vecs(emb: DataFrame) -> DataFrame:
    return emb.select("vec_id", as_double_vec("embedding").alias("v"))


def brute_force_topk(
    emb: DataFrame, query_vec_ids: list[int], k: int = 10
) -> DataFrame:
    """(query_id, vec_id, cos, rank) — exact cosine top-k per query vector.

    Per-vector norms are computed ONCE and carried next to the vector, so
    each pair costs a single zip_with/aggregate fold (interpreted
    higher-order functions are the bottleneck of this path; the GEMM
    variant below is the high-|Q| scale path).

    Rank is computed on the 6-dp-rounded score with vec_id tie-break, the
    same convention as BM25 top-k, so ordering is engine-independent."""
    vecs = _vecs(emb).withColumn("nrm", norm(F.col("v")))
    q = vecs.filter(F.col("vec_id").isin(query_vec_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    scored = (
        vecs.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm")), 6
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def brute_force_topk_gemm(
    emb: DataFrame, query_vec_ids: list[int], k: int = 10
) -> DataFrame:
    """GEMM scale path for the same query: the query matrix broadcasts to
    every task; each Arrow batch of corpus vectors is scored with one
    numpy matmul and reduced to a per-batch top-k, so the final global
    window sees |tasks| * |Q| * k rows instead of |corpus| * |Q|.
    Output contract identical to :func:`brute_force_topk`."""
    import numpy as np
    import pandas as pd

    spark = emb.sparkSession
    vecs = _vecs(emb)
    qrows = vecs.filter(F.col("vec_id").isin(query_vec_ids)).collect()
    if not qrows:
        return spark.createDataFrame(
            [], "query_id long, vec_id long, cos double, rank int"
        )
    qids = np.array([r.vec_id for r in qrows], dtype=np.int64)
    qm = np.array([r.v for r in qrows], dtype=np.float64)
    qm_n = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    bqids = spark.sparkContext.broadcast(qids)
    bqm = spark.sparkContext.broadcast(qm_n)

    def fn(batches):
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            m = np.array(list(pdf["v"]), dtype=np.float64)
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            scores = bqm.value @ m.T  # (Q, batch)
            out = []
            for qi, qid in enumerate(bqids.value):
                s = scores[qi]
                mask = ids != qid
                sm, im = s[mask], ids[mask]
                take = min(k, sm.size)
                if take == 0:
                    continue
                # per-batch truncation must use the SAME ordering as the
                # final global window — (rounded cos desc, vec_id asc) —
                # or a rounded tie at the k boundary could drop the
                # smaller vec_id the global tie-break prefers
                sr = np.round(sm, 6)
                part = np.lexsort((im, -sr))[:take]
                out.append(
                    pd.DataFrame(
                        {"query_id": qid, "vec_id": im[part], "cos": sr[part]}
                    )
                )
            yield pd.concat(out) if out else pd.DataFrame(
                {"query_id": [], "vec_id": [], "cos": []}
            )

    partial = vecs.mapInPandas(fn, "query_id long, vec_id long, cos double")
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return partial.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def lsh_bucket_col(v: Column, planes: list[list[float]]) -> Column:
    """6-bit sign-pattern bucket id: bit p set iff dot(v, plane_p) >= 0."""
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(x) for x in plane])
        bucket = bucket + F.when(dot(v, plane_col) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def with_lsh_bucket(emb: DataFrame, planes: list[list[float]] | None = None) -> DataFrame:
    planes = planes or hyperplanes()
    return (
        _vecs(emb)
        .withColumn("bucket", lsh_bucket_col(F.col("v"), planes))
        .withColumn("nrm", norm(F.col("v")))
    )


def probe_masks(n_planes: int, probe_hamming: int) -> list[int]:
    """All sign-bit flip masks within the probe Hamming radius."""
    return [
        m for m in range(1 << n_planes) if bin(m).count("1") <= probe_hamming
    ]


def lsh_topk(
    emb: DataFrame, query_vec_ids: list[int], k: int = 10,
    planes: list[list[float]] | None = None,
    probe_hamming: int = 2,
    target_bucket_size: int | None = None,
    dim: int = EMB_DIM,
) -> DataFrame:
    """(query_id, vec_id, cos, rank) — approximate top-k: candidates are
    restricted to buckets within ``probe_hamming`` sign-bit flips of the
    query's LSH bucket (multi-probe LSH: a near neighbor that disagrees
    with the query on a few hyperplanes still lands in a probed bucket).
    Radius 0 scans ~1/2^p of the corpus, radius 1 ~(p+1)/2^p, radius 2
    ~(1+p+C(p,2))/2^p — the recall/scan-fraction knob, quantified per
    radius AND per fixture (isotropic vs clustered) in bench.py against
    the brute-force exact top-k. Default radius 2 with 6 planes scans
    ~22/64 = 34% of the corpus.

    ``target_bucket_size`` (optional) scales the plane count with corpus
    size (``n_planes_for``) so bucket population stays bounded as the
    corpus grows; at a fixed probe radius that trades recall for scan
    fraction explicitly. Costs one count() job to size the corpus."""
    if planes is None and target_bucket_size is not None:
        planes = hyperplanes(
            dim=dim, n_planes=n_planes_for(emb.count(), target_bucket_size)
        )
    b = with_lsh_bucket(emb, planes)
    masks = probe_masks(N_PLANES if planes is None else len(planes), probe_hamming)
    q = (
        b.filter(F.col("vec_id").isin(query_vec_ids))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qnrm"),
            F.explode(
                F.array(*[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks])
            ).alias("bucket"),
        )
    )
    scored = (
        b.join(F.broadcast(q), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm")), 6
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


N_CENTROIDS = 16
NPROBE = 4


def ivf_centroids(dim: int = EMB_DIM, n: int = N_CENTROIDS) -> list[list[float]]:
    """Deterministic UNIT-NORM coarse-quantizer centroids (shared with the
    SQL oracle; 6dp so literals are exact). A production IVF fits these
    with k-means on a corpus sample — the assignment/probe plan below is
    identical either way; fixed seeded centroids keep the driver oracle
    data-independent."""
    rng = np.random.RandomState(_PLANE_SEED + 1)
    m = rng.randn(n, dim)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    return [[round(float(x), 6) for x in row] for row in m]


def _nearest_cells(v: Column, cents: list[list[float]], n: int) -> Column:
    """ids of the n nearest centroids by (dot desc, cid desc) — unit-norm
    centroids make dot order == cosine order."""
    scored = F.array(
        *[
            F.struct(
                dot(v, F.array(*[F.lit(x) for x in c])).alias("d"),
                F.lit(i).alias("c"),
            )
            for i, c in enumerate(cents)
        ]
    )
    ordered = F.reverse(F.array_sort(scored))
    return F.transform(F.slice(ordered, 1, n), lambda s: s["c"])


def with_ivf_cell(emb: DataFrame, cents: list[list[float]] | None = None) -> DataFrame:
    cents = cents or ivf_centroids()
    v = F.col("v")
    return (
        _vecs(emb)
        .withColumn("cell", _nearest_cells(v, cents, 1)[0])
        .withColumn("nrm", norm(v))
    )


def ivf_topk(
    emb: DataFrame, query_vec_ids: list[int], k: int = 10,
    nprobe: int = NPROBE,
    cents: list[list[float]] | None = None,
) -> DataFrame:
    """(query_id, vec_id, cos, rank) — IVF approximate top-k: every vector
    is assigned to its nearest coarse centroid (one cell each; at scale
    the table is WRITTEN partitioned by cell, so a probe reads nprobe/n
    of the corpus via partition pruning); a query scans only its nprobe
    nearest cells. Complements the LSH path: cells adapt to the data's
    angular layout, probes trade recall for scan fraction explicitly."""
    cents = cents or ivf_centroids()
    b = with_ivf_cell(emb, cents)
    q = (
        b.filter(F.col("vec_id").isin(query_vec_ids))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qnrm"),
            F.explode(_nearest_cells(F.col("v"), cents, nprobe)).alias("cell"),
        )
    )
    scored = (
        b.join(F.broadcast(q), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm")), 6
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def kmeans_centroids(
    emb: DataFrame,
    n: int = N_CENTROIDS,
    sample: int = 4096,
    iters: int = 10,
    seed: int = _PLANE_SEED + 2,
) -> list[list[float]]:
    """Unit-norm IVF centroids fit by SAMPLED spherical k-means: at most
    ``sample`` vectors are collected to the driver (deterministic
    hash-mod sample — independent of partitioning), the corpus itself is
    never collected. This is the production centroid path the fixed
    seeded ``ivf_centroids`` stand in for in the data-independent driver
    oracle; on clustered data it lifts IVF recall from random-centroid
    levels to near-exhaustive (quantified per fixture in bench.py).
    At 100 TB the sample read is a scan of one hash-mod stripe; everything
    downstream (assignment, probe) is the same plan as fixed centroids."""
    vecs = _vecs(emb)
    total = vecs.count()
    if total == 0:
        return ivf_centroids(n=n)
    mod = max(1, total // sample)
    # orderBy before limit: the hash filter alone can match more than
    # ``sample`` rows, and a bare limit truncates in partition order —
    # making the collected set (and the rng.choice seeding that consumes
    # its row order) vary across partitionings. Sort+limit collapses to
    # TakeOrderedAndProject, so determinism costs one per-partition top-k.
    rows = (
        vecs.filter(F.pmod(F.xxhash64(F.col("vec_id")), F.lit(mod)) == 0)
        .orderBy("vec_id")
        .limit(sample)
        .collect()
    )
    m = np.array([r.v for r in rows], dtype=np.float64)
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    k = min(n, m.shape[0])
    cents = m[rng.choice(m.shape[0], k, replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(m @ cents.T, axis=1)  # cosine == dot (unit norm)
        for c in range(k):
            members = m[assign == c]
            if members.size == 0:  # empty cell: reseed from a random point
                cents[c] = m[rng.randint(m.shape[0])]
            else:
                mu = members.mean(axis=0)
                cents[c] = mu / max(np.linalg.norm(mu), 1e-12)
    if k < n:  # degenerate tiny corpus: pad with fixed unit centroids
        cents = np.vstack([cents, np.array(ivf_centroids(n=n))[k - n :]])
    return [[round(float(x), 6) for x in row] for row in cents]


def _band_bucket_col(v: Column, planes: list[list[float]]) -> Column:
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(x) for x in plane])
        bucket = bucket + F.when(dot(v, plane_col) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def cosine_dedup_pairs(
    emb: DataFrame, threshold: float = 0.95,
    planes: list[list[float]] | None = None,
    bands: int = 1,
    target_bucket_size: int | None = 256,
    dim: int = EMB_DIM,
) -> DataFrame:
    """(vec_a, vec_b, cos) — near-duplicate embedding pairs found within
    sign-LSH buckets and VERIFIED with exact cosine (precision is always
    exact; the bucketing only bounds which pairs are examined).

    Scale controls (VERDICT r2 #4 — the fixed-6-planes quadratic scan):
    - plane count defaults to ``n_planes_for(corpus, target_bucket_size)``
      per band, so expected bucket population stays ~target as the corpus
      grows (costs one count() job); pass explicit ``planes`` (e.g. the
      fixed ``hyperplanes()``) for data-independent behavior — the driver
      oracle pair does exactly that.
    - ``bands`` > 1 splits the planes into MinHash-style bands: a pair is
      a candidate if it agrees on ALL planes of >= 1 band, recovering the
      recall that more planes per band take away
      (P(candidate) = 1-(1-(1-theta/pi)^r)^b for angle theta)."""
    if planes is None:
        per_band = n_planes_for(emb.count(), target_bucket_size or 256)
        planes = hyperplanes(dim=dim, n_planes=bands * per_band)
    r = len(planes) // bands
    assert r >= 1, "need at least one plane per band"
    vecs = _vecs(emb).withColumn("nrm", norm(F.col("v")))
    band_structs = F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                _band_bucket_col(F.col("v"), planes[band * r : (band + 1) * r]).alias("bucket"),
            )
            for band in range(bands)
        ]
    )
    b = vecs.select(
        "vec_id", "v", "nrm", F.explode(band_structs).alias("bc")
    ).select(
        "vec_id", "v", "nrm",
        F.col("bc.band").alias("band"), F.col("bc.bucket").alias("bucket"),
    )
    a = b.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
        F.col("nrm").alias("na"), "band", "bucket",
    )
    c = b.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
        F.col("nrm").alias("nb"), "band", "bucket",
    )
    out = (
        a.join(c, ["band", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
    # a pair colliding in several bands is computed per collision (bands
    # is small); distinct collapses the duplicates
    return out.distinct() if bands > 1 else out


def mmr_rerank(
    cands: DataFrame,
    vecs: DataFrame,
    lam: float = 0.7,
    k: int = 10,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998):
    greedily select k results trading relevance against redundancy,

        MMR_i = argmax_{d not selected} [ lam * rel(d)
                                          - (1-lam) * max_{s in S} sim(d, s) ]

    the standard result-diversification pass a search engine runs AFTER
    top-k truncation.

    Inputs: ``cands`` (query_id, doc_id, rel) — a post-truncation pool
    (tens to hundreds of rows per query, corpus-independent); ``vecs``
    (vec_id, embedding) for the pooled docs. Greedy selection is
    inherently sequential in k, so it runs per query inside ONE
    applyInPandas group over the joined pool — O(pool^2) sims on <=
    hundreds of rows, while queries parallelize across tasks. Nothing
    here ever sees the corpus; the expensive part (candidate generation)
    stays in the distributed BM25/ANN paths.

    Determinism: rel is used as given (callers pass 6-dp-rounded scores),
    pairwise cosines and the MMR objective round to 6dp before argmax,
    ties break to the smallest doc_id — the same portable convention as
    every top-k in this repo, so the DuckDB recursive-CTE oracle matches
    hash-for-hash.

    Returns (query_id, doc_id, mmr_score, rank) with rank 1..k; the
    rank-1 row is pure argmax-relevance (its mmr_score is just rel).
    """
    import pandas as pd

    pool = cands.join(
        _vecs(vecs).select(F.col("vec_id").alias("doc_id"), "v"), "doc_id"
    ).select("query_id", "doc_id", "rel", "v")

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(
                {"query_id": [], "doc_id": [], "mmr_score": [], "rank": []}
            )
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        mat = np.asarray(pdf["v"].tolist(), dtype=np.float64)
        nrm = np.linalg.norm(mat, axis=1)
        nrm[nrm == 0.0] = 1.0
        sims = np.round((mat @ mat.T) / np.outer(nrm, nrm), 6)
        rel = pdf["rel"].to_numpy(dtype=np.float64)
        n = len(pdf)
        selected: list[int] = []
        scores: list[float] = []
        remaining = np.ones(n, dtype=bool)
        max_sim = np.full(n, -np.inf)
        for _ in range(min(k, n)):
            if not selected:
                obj = rel.copy()
            else:
                obj = np.round(lam * rel - (1.0 - lam) * max_sim, 6)
            obj = np.where(remaining, obj, -np.inf)
            pick = int(np.argmax(obj))  # argmax takes the FIRST max:
            # rows are doc_id-sorted, so ties resolve to smallest doc_id
            selected.append(pick)
            scores.append(float(obj[pick]))
            remaining[pick] = False
            max_sim = np.maximum(max_sim, sims[:, pick])
        return pd.DataFrame(
            {
                "query_id": pdf["query_id"].iloc[selected].to_numpy(),
                "doc_id": pdf["doc_id"].iloc[selected].to_numpy(),
                "mmr_score": scores,
                "rank": np.arange(1, len(selected) + 1, dtype=np.int32),
            }
        )

    schema = (
        "query_id string, doc_id long, mmr_score double, rank int"
    )
    return pool.groupBy("query_id").applyInPandas(fn, schema)


# ---------------------------------------------------------------------------
# int8 scalar quantization (SQ) ANN: quantize -> approx top-m -> exact rescore
# ---------------------------------------------------------------------------

SQ_LEVELS = 127.0
_SQ_EPS = 1e-12


def sq_quantize(emb: DataFrame) -> DataFrame:
    """(vec_id, q, scale, nrm) — symmetric int8 scalar quantization with a
    per-vector scale (the FAISS ``SQ8``/Lucene ``int8_hnsw`` storage
    format): scale = max|v_i| / 127, q_i = floor(v_i/scale + 0.5).
    floor(x + 0.5) is used instead of engine round() so Spark and the
    DuckDB oracle agree bit-for-bit on ties. The full-precision norm is
    kept alongside (one double per vector) for cosine denominators.

    At 100 TB this is THE memory-bandwidth lever for brute-force scans:
    int8 rows are 4x smaller than float32 (8x vs these test doubles), so
    a GEMM/scan pass streams 4x more vectors per second at equal DRAM
    bandwidth — rescoring only the tiny candidate pool at full
    precision."""
    v = as_double_vec("embedding") if "embedding" in emb.columns else F.col("v")
    base = emb.select("vec_id", v.alias("v")).withColumn(
        "scale",
        F.greatest(
            F.aggregate(
                F.col("v"), F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
            )
            / F.lit(SQ_LEVELS),
            F.lit(_SQ_EPS),
        ),
    )
    return base.select(
        "vec_id",
        F.transform(
            "v", lambda x: F.floor(x / F.col("scale") + F.lit(0.5)).cast("int")
        ).alias("q"),
        "scale",
        norm(F.col("v")).alias("nrm"),
        "v",
    )


def sq_topk(
    emb: DataFrame,
    query_vec_ids: list[int],
    k: int = 10,
    rescore_multiplier: int = 3,
) -> DataFrame:
    """(query_id, vec_id, approx, cos, rank) — SQ-accelerated cosine
    top-k: the int8 scan ranks by the dequantized approximate cosine
    (dot(q_a,q_b) * s_a * s_b / (nrm_a * nrm_b)), keeps the top
    ``k * rescore_multiplier`` candidates per query, then rescores
    EXACTLY those at full precision — the standard quantize-then-rescore
    recipe (approx ordering errors inside the pool are corrected; only
    a true top-k member falling outside the pool can be missed, and
    widening the multiplier trades scan cost for that recall).

    Both ranks run over 6-dp-rounded scores with vec_id tie-break so the
    DuckDB oracle replays the pipeline exactly."""
    qt = sq_quantize(emb)
    q = qt.filter(F.col("vec_id").isin(query_vec_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qq"),
        F.col("scale").alias("qs"),
        F.col("nrm").alias("qn"),
        F.col("v").alias("qv"),
    )
    int_dot = F.aggregate(
        F.zip_with(
            F.col("q"), F.col("qq"), lambda x, y: (x * y).cast("double")
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    approx = (
        qt.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                int_dot * F.col("scale") * F.col("qs")
                / (F.col("nrm") * F.col("qn")),
                6,
            ).alias("approx"),
            "v",
            "nrm",
        )
    )
    m = k * rescore_multiplier
    wa = Window.partitionBy("query_id").orderBy(F.desc("approx"), F.asc("vec_id"))
    cand = approx.withColumn("arank", F.row_number().over(wa)).filter(
        F.col("arank") <= m
    )
    exact = cand.join(
        F.broadcast(q.select("query_id", "qv", "qn")), "query_id"
    ).select(
        "query_id",
        "vec_id",
        "approx",
        F.round(
            dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm")), 6
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return exact.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


# ---------------------------------------------------------------------------
# Product quantization (Jegou, Douze & Schmid 2011)
# ---------------------------------------------------------------------------

PQ_M = 8  # subspaces: 64-dim -> 8 dims each
PQ_K = 16  # centroids per subspace codebook (4-bit codes)


def pq_codebooks(
    dim: int = EMB_DIM, m: int = PQ_M, k: int = PQ_K
) -> list[list[list[float]]]:
    """[m][k][dim/m] deterministic per-subspace codebooks (6dp literals,
    shared with the SQL oracle). Entries scale like unit-norm embedding
    components (1/sqrt(dim)); a production deployment trains each
    subspace's codebook with k-means on a corpus sample — the
    encode / ADC plan below is identical either way, only the literal
    centroid values change (same fixed-vs-kmeans split as the IVF
    family)."""
    rng = np.random.RandomState(_PLANE_SEED + 3)
    sub = dim // m
    books = rng.randn(m, k, sub) / math.sqrt(dim)
    return [[[round(float(x), 6) for x in c] for c in book] for book in books]


def _cn2(c: list[float]) -> float:
    return float(sum(x * x for x in c))


def pq_encode(emb: DataFrame, books: list | None = None) -> DataFrame:
    """(vec_id, v, nrm, code0..code{m-1}, pq_nrm) — PQ encoding.

    code_j = argmin over the subspace-j codebook of ||v_sub - c||^2,
    computed as (||c||^2 - 2*dot) since ||v_sub||^2 is constant per
    (vec, j); ties break on the smaller centroid id. pq_nrm is the norm
    of the RECONSTRUCTED vector under the per-subspace independence of
    PQ (sqrt of the sum of the chosen centroids' squared norms) — the
    denominator the ADC cosine uses.

    At 100 TB: m 4-bit codes replace dim floats (64x smaller than
    float32 at these defaults), so the candidate scan streams from
    codes + per-query lookup tables and never touches raw vectors until
    the rescore pool. The encode itself is pure whole-stage-codegen
    expression work — no shuffle, no Python."""
    books = books or pq_codebooks()
    m = len(books)
    sub = len(books[0][0])
    df = _vecs(emb).withColumn("nrm", norm(F.col("v")))
    code_cols = []
    for j, book in enumerate(books):
        sv = F.slice(F.col("v"), j * sub + 1, sub)
        scored = F.array(
            *[
                F.struct(
                    (
                        F.lit(_cn2(c))
                        - F.lit(2.0) * dot(sv, F.array(*[F.lit(x) for x in c]))
                    ).alias("d"),
                    F.lit(i).alias("c"),
                )
                for i, c in enumerate(book)
            ]
        )
        code_cols.append(F.array_sort(scored)[0]["c"].alias(f"code{j}"))
    enc = df.select("vec_id", "v", "nrm", *code_cols)
    # fixed j-ascending addition order; the DuckDB oracle pins the same
    # order via list_sum(list(... ORDER BY j)) rather than a bare SUM(),
    # so the 6-dp-rounded scores agree by construction, not by luck
    pq_n2 = None
    for j, book in enumerate(books):
        cn2s = F.array(*[F.lit(_cn2(c)) for c in book])
        term = F.element_at(cn2s, F.col(f"code{j}") + 1)
        pq_n2 = term if pq_n2 is None else pq_n2 + term
    return enc.withColumn("pq_nrm", F.sqrt(pq_n2))


def pq_topk(
    emb: DataFrame,
    query_vec_ids: list[int],
    k: int = 10,
    rescore_multiplier: int = 3,
    books: list | None = None,
) -> DataFrame:
    """(query_id, vec_id, approx, cos, rank) — PQ/ADC cosine top-k with
    exact rescore (the quantize-then-rescore recipe, as sq_topk).

    ADC (asymmetric distance computation): the query stays full
    precision; per query and subspace a 16-entry lookup table of
    dot(q_sub, centroid) is computed ONCE, and each candidate's
    approximate dot is m table lookups — no vector arithmetic in the
    scan. approx cos = sum_j t_j[code_j] / (qnorm * pq_nrm). The top
    k * rescore_multiplier by approx are rescored exactly; both ranks
    run over 6-dp-rounded scores with vec_id tie-break (house
    convention, engine-portable)."""
    books = books or pq_codebooks()
    m = len(books)
    sub = len(books[0][0])
    enc = pq_encode(emb, books)
    q = _vecs(emb).filter(F.col("vec_id").isin(query_vec_ids))
    luts = []
    for j, book in enumerate(books):
        qs = F.slice(F.col("v"), j * sub + 1, sub)
        luts.append(
            F.array(
                *[dot(qs, F.array(*[F.lit(x) for x in c])) for c in book]
            ).alias(f"t{j}")
        )
    q = q.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        norm(F.col("v")).alias("qn"),
        *luts,
    )
    adc = None
    for j in range(m):
        term = F.element_at(F.col(f"t{j}"), F.col(f"code{j}") + 1)
        adc = term if adc is None else adc + term
    approx = (
        enc.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(adc / (F.col("qn") * F.col("pq_nrm")), 6).alias("approx"),
            "v",
            "nrm",
        )
    )
    mm = k * rescore_multiplier
    wa = Window.partitionBy("query_id").orderBy(F.desc("approx"), F.asc("vec_id"))
    cand = approx.withColumn("arank", F.row_number().over(wa)).filter(
        F.col("arank") <= mm
    )
    exact = cand.join(F.broadcast(q.select("query_id", "qv", "qn")), "query_id").select(
        "query_id",
        "vec_id",
        "approx",
        F.round(dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm")), 6).alias(
            "cos"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return exact.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def pq_codebooks_kmeans(
    emb: DataFrame,
    m: int = PQ_M,
    k: int = PQ_K,
    sample: int = 4096,
    iters: int = 10,
    seed: int = _PLANE_SEED + 3,
) -> list[list[list[float]]]:
    """Per-subspace codebooks fit by SAMPLED k-means (standard Lloyd in
    each subspace, Euclidean — PQ quantizes raw subvectors, not
    directions). Same sampling contract as kmeans_centroids: at most
    ``sample`` vectors reach the driver via a deterministic hash-mod
    stripe, the corpus is never collected, and everything downstream
    (pq_encode / pq_topk) is the identical plan with different literals.
    This is the production codebook path the fixed ``pq_codebooks``
    stand in for in the data-independent driver oracle."""
    vecs = _vecs(emb)
    total = vecs.count()
    if total == 0:
        return pq_codebooks(m=m, k=k)
    mod = max(1, total // sample)
    # orderBy before limit: the hash filter alone can match more than
    # ``sample`` rows, and a bare limit truncates in partition order —
    # making the collected set (and the rng.choice seeding that consumes
    # its row order) vary across partitionings. Sort+limit collapses to
    # TakeOrderedAndProject, so determinism costs one per-partition top-k.
    rows = (
        vecs.filter(F.pmod(F.xxhash64(F.col("vec_id")), F.lit(mod)) == 0)
        .orderBy("vec_id")
        .limit(sample)
        .collect()
    )
    mat = np.array([r.v for r in rows], dtype=np.float64)
    dim = mat.shape[1]
    sub = dim // m
    rng = np.random.RandomState(seed)
    books = []
    for j in range(m):
        s = mat[:, j * sub : (j + 1) * sub]
        kk = min(k, s.shape[0])
        cents = s[rng.choice(s.shape[0], kk, replace=False)].copy()
        for _ in range(iters):
            d2 = ((s[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(kk):
                members = s[assign == c]
                if members.size == 0:
                    cents[c] = s[rng.randint(s.shape[0])]
                else:
                    cents[c] = members.mean(axis=0)
        if kk < k:  # degenerate tiny corpus: pad from the fixed books
            fixed = np.array(pq_codebooks(dim=dim, m=m, k=k)[j])
            cents = np.vstack([cents, fixed[kk - k :]])
        books.append([[round(float(x), 6) for x in c] for c in cents])
    return books


def ivfpq_topk(
    emb: DataFrame,
    query_vec_ids: list[int],
    k: int = 10,
    nprobe: int = NPROBE,
    rescore_multiplier: int = 3,
    cents: list[list[float]] | None = None,
    books: list | None = None,
) -> DataFrame:
    """(query_id, vec_id, approx, cos, rank) — IVF-PQ: the composition
    both halves exist for (the FAISS `IVFx,PQy` architecture, Jegou et
    al. 2011 §V). The coarse quantizer PRUNES — a query touches only its
    nprobe nearest cells' rows (partition pruning when the table is
    written partitioned by cell) — and PQ COMPRESSES what remains: the
    probed candidates are scored via ADC table lookups over m 4-bit
    codes, never raw vectors. Exact rescore of the top pool restores
    full precision exactly as pq_topk/sq_topk.

    At 10^12 turns this is the serving-shape ANN: scan fraction
    nprobe/n_cells, bytes-per-candidate m/2, both knobs independent.
    Fixed-literal centroids + codebooks keep the driver oracle
    data-independent; pass kmeans_centroids / pq_codebooks_kmeans for
    real corpora — the plan is identical."""
    cents = cents or ivf_centroids()
    books = books or pq_codebooks()
    m = len(books)
    sub = len(books[0][0])
    enc = pq_encode(emb, books).withColumn(
        "cell", _nearest_cells(F.col("v"), cents, 1)[0]
    )
    q_base = _vecs(emb).filter(F.col("vec_id").isin(query_vec_ids))
    luts = []
    for j, book in enumerate(books):
        qs = F.slice(F.col("v"), j * sub + 1, sub)
        luts.append(
            F.array(
                *[dot(qs, F.array(*[F.lit(x) for x in c])) for c in book]
            ).alias(f"t{j}")
        )
    q = q_base.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        norm(F.col("v")).alias("qn"),
        F.explode(_nearest_cells(F.col("v"), cents, nprobe)).alias("cell"),
        *luts,
    )
    adc = None
    for j in range(m):
        term = F.element_at(F.col(f"t{j}"), F.col(f"code{j}") + 1)
        adc = term if adc is None else adc + term
    approx = (
        enc.join(F.broadcast(q), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(adc / (F.col("qn") * F.col("pq_nrm")), 6).alias("approx"),
            "v",
            "nrm",
        )
    )
    mm = k * rescore_multiplier
    wa = Window.partitionBy("query_id").orderBy(F.desc("approx"), F.asc("vec_id"))
    cand = approx.withColumn("arank", F.row_number().over(wa)).filter(
        F.col("arank") <= mm
    )
    qv = q.select("query_id", "qv", "qn").dropDuplicates(["query_id"])
    exact = cand.join(F.broadcast(qv), "query_id").select(
        "query_id",
        "vec_id",
        "approx",
        F.round(dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm")), 6).alias(
            "cos"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return exact.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
