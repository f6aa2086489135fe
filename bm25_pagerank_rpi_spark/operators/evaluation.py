"""Retrieval-quality evaluation: nDCG@k, MRR, P@k, recall@k, AP@k.

The reference evaluates its rankers offline (accuracy of the pairwise
classifier, internal/training/regression_model.go:232-260 and
training/test.py:60-77) but has no ranking-quality metrics over runs.
A production engine needs them: given a *run* (the engine's ranked
output) and *qrels* (graded relevance judgments), score each query with
the standard TREC metrics so A/B-ing two ranking configs is one join.

Shapes (everything is linear in |run| + |qrels| and partitions by
query_id — no per-query collect, no quadratic blow-up; a 10^9-query run
evaluates as one shuffle-by-query_id pass):

- run:   (query_id, doc_id, rank)  rank 1-based; rows with rank > k
         are ignored.
- qrels: (query_id, doc_id, rel)   int grade >= 0; 0 rows are allowed
         and count as non-relevant.

Metric definitions (TREC conventions, graded gain 2^rel - 1):

- nDCG@k = DCG@k / IDCG@k, DCG = sum over ranked hits of
  (2^rel - 1) / log2(rank + 1); IDCG from qrels sorted by rel desc
  (doc_id asc tie-break), truncated at k. 0 when the query has no
  relevant docs.
- MRR    = 1 / (first rank with rel > 0), 0 if none in the top k.
- P@k    = (# rel>0 docs in top k) / k.
- recall@k = (# rel>0 docs in top k) / (# rel>0 docs in qrels).
- AP@k   = sum over relevant ranks r of (cum_hits(r) / r), divided by
  min(R, k) where R = total relevant. 0 when R = 0.

Every formula is a Catalyst expression (joins + one window per input +
hash agg) — no Python at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_LN2 = 0.6931471805599453


def _gain(rel):
    return F.pow(F.lit(2.0), rel.cast("double")) - F.lit(1.0)


def _disc(rank):
    # log2(rank + 1); rank is 1-based so this is never 0
    return F.log(rank.cast("double") + F.lit(1.0)) / F.lit(_LN2)


def eval_metrics(run: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """Per-query (query_id, ndcg, mrr, precision_at_k, recall_at_k, ap).

    Queries present in ``run`` but absent from ``qrels`` score 0 on all
    metrics (the information-need had no judged relevant documents).
    """
    top = (
        run.filter(F.col("rank") <= k)
        .join(
            qrels.select("query_id", "doc_id", F.col("rel").cast("int").alias("rel")),
            ["query_id", "doc_id"],
            "left",
        )
        .withColumn("rel", F.coalesce("rel", F.lit(0)))
        .withColumn("hit", (F.col("rel") > 0).cast("int"))
    )

    w = Window.partitionBy("query_id").orderBy("rank")
    top = top.withColumn("cum_hits", F.sum("hit").over(w))

    per_run = top.groupBy("query_id").agg(
        F.sum(_gain(F.col("rel")) / _disc(F.col("rank"))).alias("dcg"),
        F.sum("hit").alias("hits"),
        F.sum(F.col("hit") * F.col("cum_hits") / F.col("rank")).alias("ap_num"),
        F.min(F.when(F.col("hit") == 1, F.col("rank"))).alias("first_hit"),
    )

    # ideal ordering of the judged docs, truncated at k -> IDCG + R
    wq = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("doc_id"))
    per_qrels = (
        qrels.filter(F.col("rel") > 0)
        .withColumn("irank", F.row_number().over(wq))
        .groupBy("query_id")
        .agg(
            F.sum(
                F.when(
                    F.col("irank") <= k,
                    _gain(F.col("rel")) / _disc(F.col("irank")),
                ).otherwise(F.lit(0.0))
            ).alias("idcg"),
            F.count(F.lit(1)).alias("n_rel"),
        )
    )

    out = (
        run.select("query_id")
        .distinct()
        .join(per_run, "query_id", "left")
        .join(per_qrels, "query_id", "left")
    )
    n_rel = F.coalesce("n_rel", F.lit(0))
    hits = F.coalesce("hits", F.lit(0))
    return out.select(
        "query_id",
        F.when(
            F.coalesce("idcg", F.lit(0.0)) > 0, F.col("dcg") / F.col("idcg")
        )
        .otherwise(F.lit(0.0))
        .alias("ndcg"),
        F.coalesce(F.lit(1.0) / F.col("first_hit"), F.lit(0.0)).alias("mrr"),
        (hits.cast("double") / F.lit(float(k))).alias("precision_at_k"),
        F.when(n_rel > 0, hits.cast("double") / n_rel).otherwise(F.lit(0.0)).alias(
            "recall_at_k"
        ),
        F.when(
            n_rel > 0,
            F.coalesce("ap_num", F.lit(0.0)) / F.least(n_rel, F.lit(k)).cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("ap"),
    )


def rbo(
    run_a: DataFrame,
    run_b: DataFrame,
    k: int = 10,
    p: float = 0.9,
) -> DataFrame:
    """Rank-biased overlap@k (Webber, Moffat & Zobel 2010, truncated
    form, no extrapolation) between two runs per query — the standard
    top-weighted similarity for comparing two rankers (exact vs WAND,
    two fusion legs, index versions):

        RBO@k = (1-p) * Σ_{d=1..k} p^(d-1) * |A[:d] ∩ B[:d]| / d

    A doc ranked ra in A and rb in B joins every prefix d >= max(ra, rb),
    so its total contribution is W(m) = Σ_{d=m..k} p^(d-1)/d with
    m = max(ra, rb) — W is a k-entry constant table computed driver-side
    and inlined as an array literal, making the whole metric one
    equi-join on (query_id, doc_id) plus a hash agg per query. Queries
    with disjoint prefixes score 0; identical prefixes score
    (1-p) * Σ p^(d-1) (≈1 for k→∞).

    Inputs: (query_id, doc_id, rank), 1-based; rows with rank > k are
    ignored. Returns (query_id, rbo).
    """
    w = [0.0] * (k + 2)
    for d in range(k, 0, -1):
        w[d] = w[d + 1] + (p ** (d - 1)) / d
    warr = F.array(*[F.lit(float(w[m])) for m in range(1, k + 1)])

    a = run_a.filter(F.col("rank") <= k).select(
        "query_id", "doc_id", F.col("rank").alias("_ra")
    )
    b = run_b.filter(F.col("rank") <= k).select(
        "query_id", "doc_id", F.col("rank").alias("_rb")
    )
    m = F.greatest("_ra", "_rb").cast("int")
    qids = a.select("query_id").union(b.select("query_id")).distinct()
    per_q = (
        a.join(b, ["query_id", "doc_id"])
        .select("query_id", F.element_at(warr, m).alias("_w"))
        .groupBy("query_id")
        .agg((F.lit(1.0 - p) * F.sum("_w")).alias("rbo"))
    )
    return (
        qids.join(per_q, "query_id", "left")
        .select("query_id", F.coalesce("rbo", F.lit(0.0)).alias("rbo"))
    )
