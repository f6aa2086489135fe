"""Pre-training data curation pipeline: the composition the individual
operators exist FOR at 100 TB — one staged pass that takes a raw
(doc_id, text) corpus to a deduplicated, quality-filtered,
decontaminated, split-assigned training set, with per-stage counts as
the curation manifest.

The reference engine indexes a pre-cleaned corpus (its cleaning happens
upstream of /root/reference's indexing service); this plan IS that
upstream, built from the repo's own oracle-checked operators:

  1. exact_dedup    — content-hash groups keep their min-doc_id
                      canonical (operators/dedup.exact_duplicates).
  2. near_dup       — MinHash-LSH verified pairs at a Jaccard threshold;
                      policy: drop every doc that has ANY smaller-id
                      near-duplicate (the greedy keep-first-occurrence
                      rule — doc_a < doc_b pairs drop doc_b). This is
                      the standard streaming-friendly policy and is
                      exactly SQL-replayable; the component-exact
                      variants (cluster canonical / quality-aware
                      keep-best) live behind dedup_components /
                      dedup_keep_best.
  3. quality        — textstats.quality_features score >= threshold
                      (length / punctuation / stopword / uniqueness).
  4. decontaminate  — textstats.ngram_contamination vs a benchmark
                      relation; docs above the contamination cap drop.
  5. split          — leakage-safe deterministic train/val/test
                      assignment (pure hash of (salt, doc_id)).

Scale shape: stages 1-2 are the shuffle-bearing ones (hash groupBy +
banded LSH, both linear with the documented skew guards); 3-5 are
zero-shuffle codegen projections / broadcast joins against the shrinking
survivor set, and the benchmark side of stage 4 broadcasts. Nothing
here collects corpus-sized state to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import dedup, textstats

DEFAULT_SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _drop_exact_duplicates(docs: DataFrame) -> DataFrame:
    ex = dedup.exact_duplicates(docs)
    non_canonical = ex.filter(
        F.col("doc_id") != F.col("canonical_id")
    ).select("doc_id")
    return docs.join(non_canonical, "doc_id", "left_anti")


def _drop_near_duplicates(
    docs: DataFrame, jaccard_threshold: float
) -> DataFrame:
    pairs = dedup.minhash_dedup_pairs(docs, threshold=jaccard_threshold)
    # doc_a < doc_b by construction: dropping every doc_b keeps each
    # doc iff it has no smaller-id near-duplicate (greedy first-occurrence)
    dropped = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return docs.join(dropped, "doc_id", "left_anti")


def _drop_low_quality(docs: DataFrame, quality_threshold: float) -> DataFrame:
    kept = (
        textstats.quality_features(docs)
        .filter(F.round("quality_score", 6) >= quality_threshold)
        .select("doc_id")
    )
    return docs.join(kept, "doc_id", "left_semi")


def _drop_contaminated(
    docs: DataFrame, benchmark: DataFrame, contamination_max: float, n: int
) -> DataFrame:
    kept = (
        textstats.ngram_contamination(docs, benchmark, n=n)
        .filter(F.round("contamination_frac", 6) <= contamination_max)
        .select("doc_id")
    )
    return docs.join(kept, "doc_id", "left_semi")


def curate(
    docs: DataFrame,
    benchmark: DataFrame,
    jaccard_threshold: float = 0.7,
    quality_threshold: float = 0.5,
    contamination_max: float = 0.5,
    contamination_n: int = 5,
    splits: dict[str, float] | None = None,
    persist: bool = True,
) -> dict[str, DataFrame]:
    """Run the staged pipeline; returns every stage's survivor relation
    plus the split assignment:

    {"input", "exact_dedup", "near_dup", "quality", "decontaminate",
     "split"} — each a DataFrame; "split" carries (doc_id, split) over
    the final survivors.

    ``persist`` materializes each stage's survivor relation (the
    production shape: a 100-TB pipeline WRITES every stage's output
    between passes — stage outputs are restart points and audit
    artifacts). It is also a correctness-of-cost necessity here: each
    stage filter is a join whose small side derives from the FULL
    upstream chain, so without a materialization barrier every
    downstream action re-executes every upstream stage once per
    broadcast build — measured ~5x cost growth PER STAGE (exponential
    in pipeline depth) on the unpersisted lineage.

    When done with the result, call :func:`release` on it (or unpersist
    the four stage frames yourself) — a long-lived session that calls
    ``curate`` repeatedly would otherwise accumulate cached relations
    until executor storage evicts them."""
    s1 = _drop_exact_duplicates(docs)
    if persist:
        s1 = s1.persist()
    s2 = _drop_near_duplicates(s1, jaccard_threshold)
    if persist:
        s2 = s2.persist()
    s3 = _drop_low_quality(s2, quality_threshold)
    if persist:
        s3 = s3.persist()
    s4 = _drop_contaminated(
        s3, benchmark, contamination_max, contamination_n
    )
    if persist:
        s4 = s4.persist()
    sp = textstats.dataset_split(
        s4.select("doc_id"), splits or DEFAULT_SPLITS
    )
    return {
        "input": docs,
        "exact_dedup": s1,
        "near_dup": s2,
        "quality": s3,
        "decontaminate": s4,
        "split": sp,
    }


_PERSISTED_STAGES = ("exact_dedup", "near_dup", "quality", "decontaminate")


def release(stages: dict[str, DataFrame]) -> None:
    """Unpersist the stage relations :func:`curate` cached
    (non-blocking; safe to call whether or not persist=True was used)."""
    for name in _PERSISTED_STAGES:
        df = stages.get(name)
        if df is not None:
            df.unpersist()


def curation_summary(
    docs: DataFrame,
    benchmark: DataFrame,
    **kwargs,
) -> DataFrame:
    """(stage, docs_in, docs_out) — the curation manifest as one lazy
    DataFrame: per-stage survivor counts, then one row per split with
    docs_in = final survivor count. Each row is a crossJoin of two
    1-row count aggregates (broadcast), so the whole summary is a union
    of tiny frames over the shared stage lineage.

    Each call persists the four stage relations (see :func:`curate`);
    a long-lived session invoking this repeatedly should instead call
    ``curate`` directly and :func:`release` the stages after consuming
    the summary, or pass ``persist=False``."""
    stages = curate(docs, benchmark, **kwargs)
    order = ["exact_dedup", "near_dup", "quality", "decontaminate"]
    frames = []
    prev = stages["input"]
    for name in order:
        cur = stages[name]
        row = (
            prev.agg(F.count(F.lit(1)).alias("docs_in"))
            .crossJoin(cur.agg(F.count(F.lit(1)).alias("docs_out")))
            .select(F.lit(name).alias("stage"), "docs_in", "docs_out")
        )
        frames.append(row)
        prev = cur
    final_count = stages["decontaminate"].agg(
        F.count(F.lit(1)).alias("docs_in")
    )
    split_rows = (
        stages["split"]
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("docs_out"))
        .crossJoin(F.broadcast(final_count))
        .select(
            F.concat(F.lit("split_"), F.col("split")).alias("stage"),
            "docs_in",
            "docs_out",
        )
    )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.unionByName(split_rows)
