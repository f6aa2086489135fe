"""Exact BM25 + LTR-feature scorer as a pure DataFrame plan.

This is the oracle-checkable path (SURVEY.md §4: "pure-DataFrame exact
scorer"). Semantics pinned to the reference (see oracle.py for the spec and
the reference citations); every aggregate below reproduces
/root/reference/internal/ranking/features.go:11-209 exactly:

- duplicate query terms are kept as separate occurrences (posexplode, no
  distinct) so they contribute once per occurrence (features_test.go:498-513);
- tf defaults to 0 for query terms absent from a candidate doc but still
  participates in tf / normalized-tf stats (features.go:30-34);
- normalized tf divides each occurrence's tf by doc_length FIRST, then
  aggregates (features.go:85) — we do the same, not the algebraic rescale;
- tf-idf stats run only over idf-covered occurrences (features.go:158-170);
- BM25 skips occurrences with missing tf OR missing idf (features.go:123-129);
- all variances are population variance (``var_pop``);
- idf = ln(docCount / (df+1)), natural log, may be negative (features.go:15);
- top-k: bm25 desc with the pinned deterministic tie-break doc_id asc,
  rank = row_number (ranker.go:44-68 + SURVEY.md §2.5 O1).

Scale notes (100 TB thinking):
- ``doc_tf`` is the exploded index relation; at build time it is persisted
  term-bucketed so the ``broadcast(query_terms) ⋈ doc_tf`` semi-join prunes
  partitions instead of scanning the corpus (plans/index_build.py).
- Everything folds into ONE hash aggregate keyed (query_id, doc_id) with
  map-side partial combine; no collect_list, no arrays on the shuffle.
- Corpus stats are a 1-row broadcast; idf covers only the query's distinct
  terms and is broadcast.
- Metadata/URL/PageRank features join AFTER top-k truncation (they do not
  affect rank — ranker.go sorts on BM25 alone), so the expensive joins see
  k<=1000 rows per query instead of every candidate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import B, K1, MAX_DOCUMENTS
from ..functions.tokenize import tokens_col


def doc_tokens(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, tokens) under the T1 tokenizer."""
    return docs.select(F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("tokens"))


def doc_lengths(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, doc_length) — |d| = token count (SURVEY.md §1.3)."""
    return doc_tokens(docs, id_col, text_col).select(
        "doc_id", F.size("tokens").alias("doc_length")
    )


def doc_term_frequencies(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, term, tf) — the exploded inverted-index relation.

    Equivalent of the reference's per-doc TermFrequencies map built by the
    A1 posting-union (ranker.go:77-107) — here a single hash aggregate with
    free map-side combine."""
    return (
        doc_tokens(docs, id_col, text_col)
        .select("doc_id", F.explode("tokens").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("int").alias("tf"))
    )


def doc_term_positions(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, term, tf, positions) — the full reference posting contract
    including 0-based token positions (documentIndex, reference
    internal/ranking/types.go:92-96). Ranking never consumes positions
    (features.go uses Frequency only), so the index build keeps them
    opt-in (plans/index_build.py with_positions)."""
    occ = doc_tokens(docs, id_col, text_col).select(
        "doc_id", F.posexplode("tokens").alias("pos", "term")
    )
    return occ.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("int").alias("tf"),
        F.sort_array(F.collect_list("pos")).alias("positions"),
    )


def corpus_stats(doc_len: DataFrame) -> DataFrame:
    """1-row (doc_count, avg_doc_length) — S4 (data_getters.go:115-144)."""
    return doc_len.agg(
        F.count(F.lit(1)).alias("doc_count"),
        F.avg("doc_length").alias("avg_doc_length"),
    )


def query_term_occurrences(queries: DataFrame, id_col: str = "query_id", text_col: str = "text") -> DataFrame:
    """(query_id, pos, term) — one row per occurrence, duplicates kept."""
    return queries.select(
        F.col(id_col).alias("query_id"),
        F.posexplode(tokens_col(text_col)).alias("pos", "term"),
    )


def term_idf(doc_tf: DataFrame, stats: DataFrame, terms: DataFrame | None = None) -> DataFrame:
    """(term, df, idf) with idf = ln(doc_count / (df+1)) — A3
    (features.go:11-18). ``terms`` (a small distinct-term DataFrame)
    restricts the computation to query terms via a broadcast semi-join;
    terms with no postings get NO row (they are skipped by BM25 and
    tf-idf stats, matching the missing-idf semantics)."""
    base = doc_tf
    if terms is not None:
        base = base.join(F.broadcast(terms.select("term").distinct()), "term")
    df_rel = base.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    return df_rel.crossJoin(F.broadcast(stats)).select(
        "term",
        "df",
        F.log(
            F.col("doc_count").cast("double") / (F.col("df") + F.lit(1)).cast("double")
        ).alias("idf"),
    )


def score_candidates(
    doc_tf: DataFrame,
    doc_len: DataFrame,
    stats: DataFrame,
    queries: DataFrame,
) -> DataFrame:
    """Per-(query, candidate-doc) BM25 + the index-derived feature block.

    Candidates = docs whose TF map contains >=1 query term (ranker.go:77-98:
    only docs present in some query-term posting list exist at all).

    Returns one row per (query_id, doc_id) with columns: bm25,
    covered_query_term_number/ratio, sum/min/max/mean/var_tf,
    stream_length, sum/min/max/mean/var_ntf, sum/min/max/mean/var_tfidf.
    """
    qocc = query_term_occurrences(queries)
    qterms = qocc.select("query_id", "term").distinct()

    idf = term_idf(doc_tf, stats, qterms)

    # candidate set + its doc_length: (query_id, doc_id, doc_length).
    # qterms broadcasts so the big doc_tf relation is never exchanged on
    # ``term`` for candidate discovery.
    cand = (
        doc_tf.select("term", "doc_id").join(F.broadcast(qterms), "term")
        .select("query_id", "doc_id")
        .distinct()
        .join(doc_len, "doc_id")
    )

    # occurrence × candidate grid; tf / idf attach as LEFT joins (missing
    # tf -> 0 in stats, missing idf -> occurrence excluded from tfidf/bm25).
    # qocc (|queries| × |terms| rows) broadcasts: joining the candidate
    # relation on the LOW-cardinality ``query_id`` key via shuffle would
    # hash every candidate row of a query into ONE reduce partition — a
    # serial bottleneck growing with corpus size. Broadcasting keeps the
    # candidates partitioned as produced; the following (doc_id, term) and
    # (query_id, doc_id) shuffles are on well-distributed keys.
    occ = (
        cand.join(F.broadcast(qocc), "query_id")
        .join(doc_tf, ["doc_id", "term"], "left")
        .join(F.broadcast(idf.select("term", "idf")), "term", "left")
        .crossJoin(F.broadcast(stats))
    )

    tf0 = F.coalesce(F.col("tf"), F.lit(0)).cast("double")
    has_tf = F.col("tf").isNotNull()
    has_idf = F.col("idf").isNotNull()
    dl = F.col("doc_length").cast("double")
    # divide-first, like the reference (features.go:85); doc_length==0 rows
    # are handled by the zero-fallback after the agg
    ntf = F.when(F.col("doc_length") > 0, tf0 / dl)
    tfidf = F.when(has_idf, tf0 * F.col("idf"))
    bm25_term = F.when(
        has_tf & has_idf,
        F.col("idf")
        * (tf0 * F.lit(K1 + 1.0))
        / (tf0 + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * (dl / F.col("avg_doc_length")))),
    ).otherwise(F.lit(0.0))

    per_doc = occ.groupBy("query_id", "doc_id").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.max("doc_length").alias("stream_length"),
        F.sum(F.when(has_tf, 1).otherwise(0)).cast("int").alias("covered_query_term_number"),
        F.sum(bm25_term).alias("bm25"),
        F.sum(tf0).cast("long").alias("sum_tf"),
        F.min(tf0).cast("long").alias("min_tf"),
        F.max(tf0).cast("long").alias("max_tf"),
        F.avg(tf0).alias("mean_tf"),
        F.var_pop(tf0).alias("var_tf"),
        F.var_pop(ntf).alias("_var_ntf"),
        F.count(tfidf).alias("n_idf_terms"),
        F.sum(tfidf).alias("_sum_tfidf"),
        F.min(tfidf).alias("_min_tfidf"),
        F.max(tfidf).alias("_max_tfidf"),
        F.avg(tfidf).alias("_mean_tfidf"),
        F.var_pop(tfidf).alias("_var_tfidf"),
    )

    def _z(col: str) -> F.Column:  # zero-fallback for empty ntf group
        return F.coalesce(F.col(col), F.lit(0.0))

    def _zi(col: str) -> F.Column:  # zero-fallback for empty tfidf group
        return F.when(F.col("n_idf_terms") > 0, F.col(col)).otherwise(F.lit(0.0))

    # ntf sum/min/max/mean: doc_length is CONSTANT within the group, so the
    # reference's divide-first aggregation (features.go:85) is algebraically
    # sum/min/max(tf)/dl with a SINGLE division — and that form is exact
    # (integer aggregates + one correctly-rounded IEEE division), immune to
    # the float-accumulation-order noise of summing tf_i/dl per occurrence.
    # Variance keeps the divide-first accumulation (no exact shortcut).
    dlo = F.col("stream_length").cast("double")
    has_dl = F.col("stream_length") > 0

    def _ntf(num: str, per_term: bool = False) -> F.Column:
        e = F.col(num).cast("double") / dlo
        if per_term:
            e = e / F.col("n_terms").cast("double")
        return F.when(has_dl, e).otherwise(F.lit(0.0))

    return per_doc.select(
        "query_id",
        "doc_id",
        "bm25",
        "covered_query_term_number",
        (F.col("covered_query_term_number").cast("double") / F.col("n_terms")).alias(
            "covered_query_term_ratio"
        ),
        "sum_tf",
        "min_tf",
        "max_tf",
        "mean_tf",
        "var_tf",
        "stream_length",
        _ntf("sum_tf").alias("sum_ntf"),
        _ntf("min_tf").alias("min_ntf"),
        _ntf("max_tf").alias("max_ntf"),
        _ntf("sum_tf", per_term=True).alias("mean_ntf"),
        _z("_var_ntf").alias("var_ntf"),
        _zi("_sum_tfidf").alias("sum_tfidf"),
        _zi("_min_tfidf").alias("min_tfidf"),
        _zi("_max_tfidf").alias("max_tfidf"),
        _zi("_mean_tfidf").alias("mean_tfidf"),
        _zi("_var_tfidf").alias("var_tfidf"),
    )


def topk(scored: DataFrame, k: int = MAX_DOCUMENTS) -> DataFrame:
    """O1+O2+O3: per-query top-k with pinned tie-break and rank assignment.

    ``row_number`` over (bm25 desc, doc_id asc); Spark >=3.5 pushes the
    rank-limit into the sort (WindowGroupLimit), so no full per-query sort
    materializes at scale."""
    w = Window.partitionBy("query_id").orderBy(F.desc("bm25"), F.asc("doc_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def rank_documents(
    docs: DataFrame,
    queries: DataFrame,
    k: int = MAX_DOCUMENTS,
) -> DataFrame:
    """End-to-end exact path from raw (doc_id, text) docs: the Spark twin of
    reference ranker.go:11-74. Returns (query_id, doc_id, bm25, rank,
    <feature block>) truncated to top-k per query.

    Plan (round 4 — query-vocabulary pushdown): every consumer of the
    postings relation inside score_candidates — df/idf (A3), candidate
    discovery, the occurrence left join — only ever reads rows whose term
    IS a query term, so the corpus-wide (doc_id, term) hash aggregate the
    previous plan built (explode + groupBy over EVERY token, its measured
    dominant cost: 4.8-5.1s of the old plan's clean-window time at 100k
    turns) was dead weight. The query batch's distinct terms are collected
    at plan time (bounded planning state: it is the user's own query text,
    the same bound as WAND planning) and pushed as an InSet predicate on
    the token arrays BEFORE the explode, so the aggregate's input shrinks
    from every token in the corpus to just query-term occurrences — the
    from-raw mirror of rank_from_index's pruned-postings layout. Corpus
    statistics (A2: doc count + avg length over ALL docs, matching or not)
    ride the SAME tokenize lineage (a doc-level frame of doc_length +
    matching tokens) and are materialized once into a literal 1-row frame
    so the two broadcast consumers inside score_candidates don't re-scan
    the corpus. At 100x corpus scale the old plan shuffled and aggregated
    every (doc, term) group per call; this one tokenizes the corpus once
    and moves only the query terms' postings.

    An oversized query vocabulary (>4096 distinct terms across the batch,
    where the literal InSet stops being sensible planning state) or an
    empty one falls back to a broadcast semi-join after the explode —
    same row pruning, no driver-side literals."""
    qocc = query_term_occurrences(queries)
    # bounded planning collect: the query batch's own distinct terms
    vocab = [r["term"] for r in qocc.select("term").distinct().collect()]
    toks = doc_tokens(docs)
    # ONE tokenize pass over the corpus (its cost, not any aggregate,
    # dominates the from-raw path — measured round 4): a doc-level frame
    # carrying |d| and only the MATCHING tokens. Cached payload per doc is
    # (doc_id, int, few-token array), not the full token arrays the old
    # plan pinned.
    if 0 < len(vocab) <= 4096:
        kept = F.filter("tokens", lambda t: t.isin(*vocab))
    else:
        # degenerate (empty query) or oversized vocabulary: no literal
        # InSet — fall back to keeping everything and pruning via the
        # broadcast semi-join after the explode below
        kept = F.col("tokens")
    base = toks.select(
        "doc_id",
        F.size("tokens").alias("doc_length"),
        kept.alias("kept"),
    )
    # base is deliberately NOT persisted: it is read exactly twice (the
    # stats row below, the dtf_q materialization), each a ~cheap projection
    # scan, and pinning a corpus-wide doc-level frame is exactly what a
    # 100-TB corpus cannot afford
    # A2 is plan-time state (the reference fetches it precomputed from a
    # service, data_getters.go:115-144): materialized once into a literal
    # 1-row frame, so the two broadcast consumers inside score_candidates
    # don't re-scan
    stats = corpus_stats(base.select("doc_length"))
    stats = stats.sparkSession.createDataFrame([stats.first()], stats.schema)
    occ_src = base.select(
        "doc_id", "doc_length", F.explode("kept").alias("term")
    )
    if not (0 < len(vocab) <= 4096):
        occ_src = occ_src.join(F.broadcast(qocc.select("term").distinct()), "term")
    dtf_q = (
        occ_src.groupBy("doc_id", "term")
        .agg(
            F.count(F.lit(1)).cast("int").alias("tf"),
            F.max("doc_length").alias("doc_length"),  # functional dep of doc_id
        )
        .persist()  # three consumers in score_candidates; tiny (query-term postings only)
    )
    # candidate doc lengths ride the filtered postings — no corpus-wide
    # length join before truncation (cf. rank_from_index doc_len)
    cand_len = dtf_q.select("doc_id", "doc_length").distinct()
    scored = score_candidates(dtf_q.select("doc_id", "term", "tf"), cand_len, stats, queries)
    # the result is k rows per query — materialize it eagerly (lineage cut)
    # so the intermediate cache can be released NOW instead of leaking one
    # entry per call in a long-lived session
    out = topk(scored, k).localCheckpoint(eager=True)
    dtf_q.unpersist()
    return out


def explain_scores(
    doc_tf: DataFrame,
    doc_len: DataFrame,
    stats: DataFrame,
    queries: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Per-query-term BM25 breakdown for each query's top-k documents —
    the Elasticsearch ``_explain`` analog for relevance debugging. The
    reference computes exactly these per-term quantities inside its
    scoring loop (features.go:118-139) and keeps only the sum; this
    exposes them: one row per (query occurrence, top-k doc) with the
    occurrence's tf (0 when the doc lacks the term), idf (null when no
    posting exists corpus-wide — the skipped-term case), and its additive
    ``contribution`` to the doc's bm25 (so sum(contribution) over a doc
    == its bm25).

    Scale shape: the ranking itself is the normal score_candidates +
    topk pass; the breakdown then touches ONLY #queries x k docs — their
    ids broadcast as a semi-join filter on doc_tf / doc_len, so the
    explain stage's cost is independent of corpus size."""
    qocc = query_term_occurrences(queries)
    qterms = qocc.select("query_id", "term").distinct()
    idf = term_idf(doc_tf, stats, qterms)
    ranked = topk(
        score_candidates(doc_tf, doc_len, stats, queries).select(
            "query_id", "doc_id", "bm25"
        ),
        k,
    )
    ids = ranked.select("doc_id").distinct()
    # postings / lengths of the k docs only: broadcast semi-joins, so the
    # corpus-sized relations are filtered in place, never re-shuffled
    dtf_k = doc_tf.join(F.broadcast(ids), "doc_id")
    dlen_k = doc_len.join(F.broadcast(ids), "doc_id")
    grid = (
        ranked.join(qocc, "query_id")
        .join(dtf_k, ["doc_id", "term"], "left")
        .join(idf.select("term", "idf"), "term", "left")
        .join(dlen_k, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    tf0 = F.coalesce(F.col("tf"), F.lit(0)).cast("double")
    contribution = F.when(
        F.col("tf").isNotNull() & F.col("idf").isNotNull(),
        F.col("idf")
        * (tf0 * F.lit(K1 + 1.0))
        / (
            tf0
            + F.lit(K1)
            * (
                F.lit(1.0 - B)
                + F.lit(B)
                * (F.col("doc_length").cast("double") / F.col("avg_doc_length"))
            )
        ),
    ).otherwise(F.lit(0.0))
    return grid.select(
        "query_id",
        "doc_id",
        "rank",
        "bm25",
        "pos",
        "term",
        F.coalesce(F.col("tf"), F.lit(0)).cast("int").alias("tf"),
        "idf",
        contribution.alias("contribution"),
    )
