#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline pipeline at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Measured pieces:
  build        — full inverted-index build (tokenize -> postings ->
                 compressed blocks -> term stats) over transcripts
                 synthesized from documents.parquet; also reported as
                 ``build_turns_per_sec`` (the north-rule throughput metric).
  q_exact      — exact DataFrame BM25 top-k straight from raw text.
  q_wand       — block-max pruned top-k over the prebuilt index (the
                 serving path: per-query latency at scale).
  q_index_exact— exact scorer reading the prebuilt postings table
                 (partition-pruned scan instead of corpus re-tokenize).
  plus representative operator families (joins, window top-k, dedup,
  similarity) so regressions anywhere in the engine show up here.

Set ``BENCH_REPLICAS`` to amplify the corpus (default 20 -> ~100k turns
at sf0.1), ``BENCH_K`` for top-k size.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICAS = int(os.environ.get("BENCH_REPLICAS", "20"))
K = int(os.environ.get("BENCH_K", "1000"))
# zipf vocabulary extension for the synthesized corpus (default off: the
# headline suite stays comparable round-over-round). Scaling runs set
# this to exercise the head-skew/long-tail paths a real transcript
# corpus has — see sources/transcripts.synthesize_transcripts.
ZIPF_TOKENS = int(os.environ.get("BENCH_ZIPF_TOKENS", "0"))
INDEX_DIR = os.environ.get(
    "BENCH_INDEX_DIR",
    f"/tmp/bm25_bench_index_c{CPUS}_r{REPLICAS}"
    + (f"_z{ZIPF_TOKENS}" if ZIPF_TOKENS else ""),
)


def main() -> None:
    from pyspark.sql import functions as F

    from bm25_pagerank_rpi_spark.entry_queries import QUERIES, QUERY_TEXT
    from bm25_pagerank_rpi_spark.operators import query_exact, scorer, wand
    from bm25_pagerank_rpi_spark.plans.index_build import build_index
    from bm25_pagerank_rpi_spark.session import get_spark
    from bm25_pagerank_rpi_spark.sources.transcripts import (
        synthesize_transcripts,
        with_doc_identity,
    )

    spark = get_spark("bench", cores=CPUS)
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    timings: dict[str, float] = {}
    extra_metrics: dict[str, float] = {}

    # host-window quality (VERDICT r3 #8): the box's effective memory
    # bandwidth wanders >10x minute-to-minute, so every suite run carries
    # its own pre/post probes — round-over-round tables self-qualify
    # instead of needing post-hoc diagnosis.
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
    from scaling import window_probe

    extra_metrics["window_pre"] = window_probe()

    # pieces that can safely be re-timed if the host window collapses
    # mid-suite (idempotent reads — no index rebuild, no state mutation)
    rerunnable: dict[str, object] = {}

    def timed(name: str, fn, rerun_ok: bool = False):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        if rerun_ok:
            rerunnable[name] = fn
        return out

    # ---- warm-up (JVM codegen + Python workers; cluster startup is not the
    # benchmarked quantity) --------------------------------------------------
    spark.range(100000).groupBy((F.col("id") % 7).alias("g")).count().count()
    spark.range(100000).mapInPandas(lambda it: it, "id long").count()

    # ---- corpus + index build ---------------------------------------------
    # materialize the synthetic corpus ONCE (untimed): the engine's real
    # input is a stored table, and a lazy crossJoin source would otherwise
    # be recomputed by every build stage that scans transcripts
    corpus_dir = f"{INDEX_DIR}_transcripts"
    if not os.path.exists(corpus_dir):
        synthesize_transcripts(
            spark, SF_DIR, replicas=REPLICAS, zipf_tokens=ZIPF_TOKENS
        ).write.mode("overwrite").parquet(corpus_dir)
    transcripts = spark.read.parquet(corpus_dir)
    n_turns = transcripts.count()  # warm-up scan, excluded from build time

    # untimed warm-up build over a tiny sample: JIT/codegen compilation is
    # a one-time per-JVM cost that long-running executors amortize away;
    # without this the measured build charges it in full
    warm_dir = f"{INDEX_DIR}_warmup"
    shutil.rmtree(warm_dir, ignore_errors=True)
    build_index(spark, transcripts.limit(2000), warm_dir)
    shutil.rmtree(warm_dir, ignore_errors=True)

    shutil.rmtree(INDEX_DIR, ignore_errors=True)
    cat = timed("build", lambda: build_index(spark, transcripts, INDEX_DIR))
    build_tps = n_turns / timings["build"]

    if os.environ.get("BENCH_BUILD_ONLY"):
        print(
            json.dumps(
                {
                    "metric": "index_build_seconds",
                    "value": timings["build"],
                    "unit": "sec",
                    "queries": timings,
                    "sf": sf,
                    "cores": CPUS,
                    "turns": n_turns,
                    "build_turns_per_sec": round(build_tps, 1),
                    "replicas": REPLICAS,
                }
            )
        )
        spark.stop()
        return

    queries_df = spark.createDataFrame(
        [("q1", QUERY_TEXT)], "query_id string, text string"
    )
    docs = with_doc_identity(transcripts).select("doc_id", "text")

    # ---- headline query paths ---------------------------------------------
    timed("q_exact", lambda: scorer.rank_documents(docs, queries_df, k=K).count(),
          rerun_ok=True)
    timed("q_wand", lambda: wand.wand_topk(cat, queries_df, k=K).count(),
          rerun_ok=True)
    timed(
        "q_index_exact",
        lambda: query_exact.rank_from_index(cat, queries_df, k=K).count(),
        rerun_ok=True,
    )

    # p50 serving latency: distinct single queries through the WAND path
    # (the north-rule metric). Cold = one-shot wand_topk (re-reads the
    # catalog per request); warm = WandSession with terms/meta/blocks
    # cached across requests (the serving deployment shape).
    p50_queries = [
        "hash join table", "key value spark", "filter window merge",
        "table scan batch", "group order vector", "column row data",
        "stream join key",
    ]
    lat = []
    for i, text in enumerate(p50_queries):
        qdf = spark.createDataFrame([(f"p{i}", text)], "query_id string, text string")
        t0 = time.time()
        wand.wand_topk(cat, qdf, k=K).count()
        lat.append(time.time() - t0)
    lat.sort()
    timings["q_wand_p50"] = round(lat[len(lat) // 2], 3)

    with wand.WandSession(cat) as sess:
        warm = []
        for i, text in enumerate(p50_queries):
            t0 = time.time()
            sess.topk_text(f"w{i}", text, k=K).count()
            warm.append(time.time() - t0)
        warm.sort()
        timings["q_wand_warm_p50"] = round(warm[len(warm) // 2], 3)

        # batch serving throughput: 64 distinct queries in ONE call.
        # wand shards on (query_id, doc-range), so a batch amortizes the
        # scan/job overhead across queries — the number that matters for
        # offline re-ranking and high-QPS serving, vs the p50 of
        # one-query-per-job above.
        vocab = sorted({w for q in p50_queries for w in q.split()})
        batch = [
            (f"b{i}", " ".join(vocab[(i + j) % len(vocab)] for j in range(3)))
            for i in range(64)
        ]
        bdf = spark.createDataFrame(batch, "query_id string, text string")
        t0 = time.time()
        sess.topk(bdf, k=K).count()
        batch_s = time.time() - t0
        # headline metric since round 4 (VERDICT r3 #6): batch serving is
        # the deployment shape for offline re-ranking / high-QPS serving.
        # Round-over-round total comparisons must subtract q_wand_batch64
        # when diffing against rounds 1-3.
        timings["q_wand_batch64"] = round(batch_s, 3)
        extra_metrics["wand_batch64_s"] = round(batch_s, 3)
        extra_metrics["wand_batch64_qps"] = round(64.0 / batch_s, 1)

    # ---- representative operator families ----------------------------------
    for name in (
        "join_metadata_agg",
        "events_topk_per_user",
        "dedup_minhash_lsh",
        "ann_cosine_topk",
        "ann_gemm_topk",
        "ann_sq_topk",
        "text_quality",
        "pagerank",
    ):
        fn = QUERIES.get(name)
        if fn is not None:
            timed(name, lambda fn=fn: fn(spark, SF_DIR).count(), rerun_ok=True)

    # ANN quality (untimed): recall@10 vs brute-force exact top-10 with
    # the matching scan fraction, on TWO distributions — the driver's
    # isotropic embeddings (structureless: the ANN worst case) and a
    # 20-cluster Gaussian-mixture fixture (the regime real embedding
    # corpora live in). LSH curves per probe radius; IVF with the fixed
    # data-independent centroids AND sampled-kmeans centroids per nprobe.
    from bm25_pagerank_rpi_spark.entry_queries_pipeline import ANN_QUERY_IDS
    from bm25_pagerank_rpi_spark.operators import similarity
    from bm25_pagerank_rpi_spark.sources.embeddings_fixture import (
        synthesize_clustered_embeddings,
    )

    def recall_curves(emb_df):
        exact_nn = {
            (r.query_id, r.vec_id)
            for r in similarity.brute_force_topk(emb_df, ANN_QUERY_IDS, k=10).collect()
        }

        def rec(df):
            got = {(r.query_id, r.vec_id) for r in df.collect()}
            return round(len(exact_nn & got) / max(len(exact_nn), 1), 4)

        planes = similarity.hyperplanes()
        out = {"lsh": {}, "ivf_fixed": {}, "ivf_kmeans": {}}
        for radius in (0, 1, 2):
            out["lsh"][f"radius{radius}"] = {
                "recall": rec(similarity.lsh_topk(
                    emb_df, ANN_QUERY_IDS, k=10, planes=planes,
                    probe_hamming=radius,
                )),
                "scan_frac": round(
                    len(similarity.probe_masks(len(planes), radius))
                    / (1 << len(planes)), 4,
                ),
            }
        kmeans_cents = similarity.kmeans_centroids(emb_df)
        for key, cents in (
            ("ivf_fixed", similarity.ivf_centroids()),
            ("ivf_kmeans", kmeans_cents),
        ):
            for nprobe in (1, 2, 4):
                out[key][f"nprobe{nprobe}"] = {
                    "recall": rec(similarity.ivf_topk(
                        emb_df, ANN_QUERY_IDS, k=10, nprobe=nprobe, cents=cents
                    )),
                    "scan_frac": round(nprobe / len(cents), 4),
                }
        # PQ quality: ADC scans ALL codes (compression, not pruning — the
        # scan reads 4-bit codes instead of floats), so the knob is the
        # exact-rescore pool width, not a scan fraction.
        out["pq_kmeans"] = {}
        pq_books = similarity.pq_codebooks_kmeans(emb_df)
        for mult in (1, 3):
            out["pq_kmeans"][f"mult{mult}"] = {
                "recall": rec(similarity.pq_topk(
                    emb_df, ANN_QUERY_IDS, k=10,
                    rescore_multiplier=mult, books=pq_books,
                )),
            }
        return out

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_emb = emb.count()
    clustered = synthesize_clustered_embeddings(spark, n_emb)
    ann_recall = {
        "isotropic": recall_curves(emb),
        "clustered": recall_curves(clustered),
    }
    recall = {k.replace("radius", "r"): v["recall"]
              for k, v in ann_recall["isotropic"]["lsh"].items()}
    recall_at_10 = recall["r2"]  # the default serving radius
    ivf_recall = ann_recall["isotropic"]["ivf_fixed"]["nprobe4"]["recall"]

    extra_metrics["window_post"] = window_probe()

    # Self-requalification (VERDICT r4 #4): if host bandwidth collapsed
    # DURING the suite (post-probe < 50% of pre-probe), the affected
    # timings describe the host, not the code. Mark the run and re-time
    # the window-sensitive idempotent pieces once, keeping the better
    # reading per piece (the collapse can only have inflated them); both
    # samples are recorded so the table stays auditable.
    pre_bw = extra_metrics["window_pre"]["memcpy_mbps"]
    post_bw = extra_metrics["window_post"]["memcpy_mbps"]
    if os.environ.get("BENCH_FORCE_COLLAPSED"):  # harness self-test switch
        post_bw = 0
    # the clean band on this host is ~5-8 GB/s memcpy; a window where BOTH
    # probes sit far below it is uniformly throttled — timings then
    # describe the host, not the code, even though pre/post agree
    NOMINAL_CLEAN_MBPS = 2000
    window = "clean"
    if max(pre_bw, post_bw) < NOMINAL_CLEAN_MBPS:
        window = "throttled"
    if post_bw < 0.5 * pre_bw:
        window = "collapsed"
        first_pass = {}
        for name, fn in rerunnable.items():
            t0 = time.time()
            fn()
            retime = round(time.time() - t0, 3)
            first_pass[name] = timings[name]
            timings[name] = min(timings[name], retime)
        extra_metrics["collapsed_first_pass"] = first_pass
        extra_metrics["window_post_rerun"] = window_probe()
        if extra_metrics["window_post_rerun"]["memcpy_mbps"] >= 0.5 * pre_bw:
            window = "recovered"
    extra_metrics["window"] = window
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "bm25_index_build_plus_query_suite",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cores": CPUS,
                "turns": n_turns,
                "build_turns_per_sec": round(build_tps, 1),
                "replicas": REPLICAS,
                "ann_lsh_recall_at_10": recall_at_10,
                "ann_lsh_recall_by_probe_radius": recall,
                "ann_ivf_recall_at_10": ivf_recall,
                "ann_recall": ann_recall,
                **extra_metrics,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
