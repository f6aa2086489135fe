"""Curation pipeline (plans/curation.py): stage composition, policy
semantics, and the summary manifest."""

from __future__ import annotations

from pyspark.sql import functions as F

from bm25_pagerank_rpi_spark.plans import curation


def _corpus(spark):
    base = [
        # ten "good" docs: >=10 tokens, some stopwords, and no 5-token
        # run shared across docs (the doc{i} tokens break every run at
        # length 4), so cross-doc 5-gram contamination is zero
        (i, f"the quick brown fox number{i} jumps over a lazy dog{i} word{i} extra{i}")
        for i in range(10)
    ]
    extra = [
        (100, base[0][1]),                      # exact dup of doc 0
        (101, " ".join(base[1][1].split()[1:])),  # near dup of doc 1 (drop first token)
        (102, "x! y! z!"),                       # short + punct-heavy -> low quality
    ]
    return spark.createDataFrame(base + extra, "doc_id long, text string")


def test_curate_stage_policies(spark):
    docs = _corpus(spark)
    bench = docs.filter(F.col("doc_id") == 2)  # doc 2 is "benchmark" -> contaminated
    stages = curation.curate(
        docs, bench,
        jaccard_threshold=0.5, quality_threshold=0.5,
        contamination_max=0.5, contamination_n=5,
    )
    s1 = {r.doc_id for r in stages["exact_dedup"].select("doc_id").collect()}
    assert 100 not in s1 and 0 in s1          # exact dup dropped, canonical kept
    s2 = {r.doc_id for r in stages["near_dup"].select("doc_id").collect()}
    assert 101 not in s2 and 1 in s2          # near dup dropped (greedy keep-min-id)
    s3 = {r.doc_id for r in stages["quality"].select("doc_id").collect()}
    assert 102 not in s3                       # low quality dropped
    s4 = {r.doc_id for r in stages["decontaminate"].select("doc_id").collect()}
    assert 2 not in s4                         # benchmark doc fully contaminated
    assert {0, 1, 3}.issubset(s4)              # the rest survive
    sp = {r.doc_id: r.split for r in stages["split"].collect()}
    assert set(sp) == s4
    assert set(sp.values()).issubset({"train", "val", "test"})


def test_curation_summary_counts_are_consistent(spark):
    docs = _corpus(spark)
    bench = docs.filter(F.col("doc_id") == 2)
    rows = {r.stage: (r.docs_in, r.docs_out) for r in curation.curation_summary(
        docs, bench,
        jaccard_threshold=0.5, quality_threshold=0.5,
        contamination_max=0.5, contamination_n=5,
    ).collect()}
    assert rows["exact_dedup"][0] == 13
    # chain: every stage's docs_in == previous stage's docs_out
    assert rows["near_dup"][0] == rows["exact_dedup"][1]
    assert rows["quality"][0] == rows["near_dup"][1]
    assert rows["decontaminate"][0] == rows["quality"][1]
    final = rows["decontaminate"][1]
    split_total = sum(v[1] for k, v in rows.items() if k.startswith("split_"))
    assert split_total == final
    assert all(v[0] == final for k, v in rows.items() if k.startswith("split_"))


def test_curate_release_unpersists_stages(spark):
    docs = _corpus(spark)
    bench = docs.filter(F.col("doc_id") == 2)
    stages = curation.curate(docs, bench, jaccard_threshold=0.5)
    stages["split"].count()  # materialize the chain (and the caches)
    cached = [stages[n] for n in curation._PERSISTED_STAGES]
    assert all(df.storageLevel.useMemory or df.storageLevel.useDisk for df in cached)
    curation.release(stages)
    assert all(
        not (df.storageLevel.useMemory or df.storageLevel.useDisk)
        for df in cached
    )
    # idempotent and persist=False-safe
    curation.release(stages)
    curation.release(curation.curate(docs, bench, persist=False))
