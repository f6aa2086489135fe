"""Positional phrase search: exact-adjacency match + BM25-style ranking.

The reference's index already stores per-(term, doc) token positions
(documentIndex.Positions, reference internal/ranking/types.go:92-96) but
never consumes them — its ranking reads Frequency only (features.go).
This module is the operator those positions exist FOR: find documents
containing the query terms as a CONSECUTIVE token sequence under the T1
tokenizer, count occurrences (sliding-window, overlaps counted), and
rank with the phrase treated as a single BM25 pseudo-term:

    idf       = ln(doc_count / (phrase_df + 1))       (A3 smoothing)
    score     = idf * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))

Two execution paths, result-identical (pinned by tests/test_phrase.py):

- ``phrase_topk`` — from raw (doc_id, text): phrase_tf is a single pure
  Catalyst array expression evaluated scan-side (``F.filter`` over a
  0..|d|-n index sequence); NO shuffle until the final top-k window and
  no explode — the corpus is read once, projected to (doc_id, tf, len).
- ``phrase_topk_from_index`` — from a positional index
  (``build_index(..., with_positions=True)``): reads ONLY the phrase
  terms' postings (term-bucket partition pruning, same as WAND), groups
  them per doc, and intersects position lists with offset-shifted
  ``array_intersect`` — cost scales with the phrase terms' df, not the
  corpus, which is the serving shape at 10^12 turns.

Both paths share the same scoring tail so they cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .. import B, K1
from ..functions.tokenize import tokens_col
from ..sources.catalog import IndexCatalog, term_bucket


def phrase_tf_col(tokens: Column, terms: list[str]) -> Column:
    """Sliding-window phrase count over a token array, as one Catalyst
    expression: #{ i : tokens[i+k] == terms[k] for all k }. Overlapping
    occurrences count ("a a a" contains "a a" twice)."""
    if not terms:
        raise ValueError("phrase must have at least one term")
    n = len(terms)

    def window_matches(i: Column) -> Column:
        cond = F.get(tokens, i) == F.lit(terms[0])
        for k, w in enumerate(terms[1:], start=1):
            cond = cond & (F.get(tokens, i + k) == F.lit(w))
        return cond

    counted = F.size(F.filter(F.sequence(F.lit(0), F.size(tokens) - n), window_matches))
    # sequence(0, negative) would produce a DESCENDING range — guard short docs
    return F.when(F.size(tokens) >= n, counted).otherwise(F.lit(0)).cast("int")


def phrase_match(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, phrase_tf, doc_length) for docs containing the phrase.
    One corpus scan, zero shuffles: tf and |d| are row-local expressions,
    and the tf>0 filter discards non-matching docs scan-side."""
    toks = tokens_col(text_col)
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            phrase_tf_col(toks, terms).alias("phrase_tf"),
            F.size(toks).alias("doc_length"),
        )
        .filter(F.col("phrase_tf") > 0)
    )


def _score_and_rank(matched: DataFrame, stats: DataFrame, k: int) -> DataFrame:
    """Shared scoring tail: BM25 of the phrase pseudo-term + top-k.

    ``matched``: (doc_id, phrase_tf, doc_length), assumed small relative
    to the corpus (phrase df). ``stats``: 1-row (doc_count,
    avg_doc_length). phrase_df folds in as a 1-row broadcast so the whole
    computation stays in-plan (no driver collect between scan and rank).
    """
    pdf = matched.agg(F.count(F.lit(1)).alias("phrase_df"))
    tf = F.col("phrase_tf").cast("double")
    dl = F.col("doc_length").cast("double")
    idf = F.log(
        F.col("doc_count").cast("double") / (F.col("phrase_df") + F.lit(1)).cast("double")
    )
    score = idf * (tf * F.lit(K1 + 1.0)) / (
        tf + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * (dl / F.col("avg_doc_length")))
    )
    w = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    return (
        matched.crossJoin(F.broadcast(pdf))
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "phrase_tf", score.alias("bm25"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def phrase_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k phrase search from raw text. Returns (doc_id, phrase_tf,
    bm25, rank). Corpus stats (doc_count, avgdl) are computed from the
    same docs relation — on an indexed corpus prefer
    ``phrase_topk_from_index`` which reuses the catalog's stored stats
    and reads only the phrase terms' postings."""
    toks = tokens_col(text_col)
    stats = docs.select(F.size(toks).alias("doc_length")).agg(
        F.count(F.lit(1)).alias("doc_count"),
        F.avg("doc_length").alias("avg_doc_length"),
    )
    return _score_and_rank(phrase_match(docs, terms, id_col, text_col), stats, k)


def phrase_tf_from_positions(postings: DataFrame, terms: list[str]) -> DataFrame:
    """(doc_int, phrase_tf, doc_length) from a positional postings
    relation (term, doc_int, doc_length, positions).

    Offset-intersection: doc d contains the phrase at position p iff
    positions(term_k) contains p+k for every k, so the candidate set is
    ∩_k (positions_k - k), built with ``array_intersect`` over the
    per-doc map {term -> positions}. Duplicate phrase terms share one
    map entry and still intersect correctly at their distinct offsets.
    """
    if not terms:
        raise ValueError("phrase must have at least one term")
    distinct = sorted(set(terms))
    per_doc = (
        postings.filter(F.col("term").isin(distinct))
        .groupBy("doc_int")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("term", "positions"))
            ).alias("pos"),
            F.max("doc_length").alias("doc_length"),
        )
        # conjunctive gate: every distinct phrase term must occur
        .filter(F.size("pos") == len(distinct))
    )
    def shift(col: Column, off: int) -> Column:
        # NOTE: must be a 1-parameter lambda — F.transform passes the array
        # INDEX as a second argument to 2-parameter callables, so the usual
        # `lambda p, off=off:` default-capture idiom silently breaks here
        return F.transform(col, lambda p: p - F.lit(off))

    cand = F.col("pos")[terms[0]]
    for off, w in enumerate(terms[1:], start=1):
        cand = F.array_intersect(cand, shift(F.col("pos")[w], off))
    return (
        per_doc.select(
            "doc_int",
            F.size(cand).cast("int").alias("phrase_tf"),
            "doc_length",
        )
        .filter(F.col("phrase_tf") > 0)
    )


def phrase_topk_from_index(cat: IndexCatalog, terms: list[str], k: int = 20) -> DataFrame:
    """Top-k phrase search over a positional index (built with
    ``with_positions=True``). Returns (doc_id, phrase_tf, bm25, rank).

    Scan cost = the phrase terms' posting lists only: the postings table
    is partitioned by term bucket, so the ``bucket IN (...)`` predicate
    prunes partitions and the ``term IN (...)`` predicate row-groups —
    the corpus itself is never touched (stats come from the catalog's
    corpus_stats table, doc_id from doc_meta joined AFTER truncation to
    k rows)."""
    post = cat.postings()
    if "positions" not in post.columns:
        raise ValueError(
            "index has no positions column — rebuild with "
            "build_index(..., with_positions=True) to serve phrase queries"
        )
    n_buckets = int(cat.read_manifest()["config"]["n_buckets"])
    distinct = sorted(set(terms))
    buckets = _buckets_of(cat, distinct, n_buckets)
    pruned = post.filter(F.col("bucket").isin(buckets)).select(
        "term", "doc_int", "doc_length", "positions"
    )
    # tombstone masking (Lucene-style deletes, sources/catalog.py)
    if cat.n_deletes():
        pruned = pruned.join(F.broadcast(cat.deletes()), "doc_int", "left_anti")
    matched = phrase_tf_from_positions(pruned, terms)
    out = _score_and_rank(
        matched.withColumnRenamed("doc_int", "doc_id"), cat.corpus_stats(), k
    ).withColumnRenamed("doc_id", "doc_int")
    meta = cat.doc_meta().select("doc_int", "doc_id")
    return out.join(meta, "doc_int").select("doc_id", "phrase_tf", "bm25", "rank")


def _buckets_of(cat: IndexCatalog, terms: list[str], n_buckets: int) -> list[int]:
    """Driver-side bucket ids for the query terms — ONE 1-row Catalyst
    eval for all terms so the hash is bit-identical to the build's
    xxhash64 partitioning without launching a job per term."""
    row = cat.spark.range(1).select(
        *[term_bucket(F.lit(t), n_buckets).alias(f"b{i}") for i, t in enumerate(terms)]
    ).collect()[0]
    return sorted({int(v) for v in row})


# ---------------------------------------------------------------------------
# Proximity search: minimal covering span over the query terms
# ---------------------------------------------------------------------------

def _min_cover_span(rel: DataFrame, terms: list[str]) -> DataFrame:
    """(doc_id, min_span) over a (doc_id, term, pos) relation: the length
    of the SHORTEST token window containing every distinct query term.

    Classic ordered sweep as ONE window pass: walking positions in order,
    the tightest window ending at position p spans from the most stale
    per-term last-occurrence to p — so per distinct term t we carry
    max(pos where term=t) over (doc partition, rows unbounded preceding),
    and min over rows of (pos - least(lasts) + 1) is the global minimum.
    Cost: the window runs over only the query terms' occurrence rows
    (sum of their tfs per doc), not the document — the shuffle key is
    doc_id but the per-doc row count is query-bounded."""
    distinct = sorted(set(terms))
    if not distinct:
        raise ValueError("proximity query needs at least one term")
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lasts = [
        F.max(F.when(F.col("term") == t, F.col("pos"))).over(w).alias(f"_l{i}")
        for i, t in enumerate(distinct)
    ]
    df = rel.select("doc_id", "pos", *lasts)
    cond = F.lit(True)
    for i in range(len(distinct)):
        cond = cond & F.col(f"_l{i}").isNotNull()
    stale = (
        F.least(*[F.col(f"_l{i}") for i in range(len(distinct))])
        if len(distinct) > 1
        else F.col("_l0")
    )
    span = F.col("pos") - stale + 1
    return (
        df.filter(cond)
        .groupBy("doc_id")
        .agg(F.min(span).cast("int").alias("min_span"))
    )


def proximity_topk(
    docs: DataFrame, terms: list[str], window: int, k: int = 20
) -> DataFrame:
    """(doc_id, min_span, rank): documents containing ALL distinct query
    terms within a token window of at most ``window`` tokens, ranked
    tightest-first (min_span asc, doc_id asc) — unordered proximity, the
    relaxation between exact phrase (span == len(terms), order fixed)
    and conjunctive AND (span unbounded). From raw (doc_id, text)."""
    toks = tokens_col("text")
    rel = docs.select(
        "doc_id", F.posexplode(toks).alias("pos", "term")
    ).filter(F.col("term").isin(sorted(set(terms))))
    return _rank_spans(_min_cover_span(rel, terms), window, k)


def proximity_topk_from_index(
    cat: IndexCatalog, terms: list[str], window: int, k: int = 20
) -> DataFrame:
    """Proximity search over a positional index — scan cost is the query
    terms' posting lists only (bucket partition-prune + term predicate),
    the same serving shape as phrase_topk_from_index. Result-identical
    to :func:`proximity_topk` on the same corpus (pinned by
    tests/test_phrase.py)."""
    post = cat.postings()
    if "positions" not in post.columns:
        raise ValueError(
            "index has no positions column — rebuild with "
            "build_index(..., with_positions=True) to serve proximity queries"
        )
    n_buckets = int(cat.read_manifest()["config"]["n_buckets"])
    distinct = sorted(set(terms))
    buckets = _buckets_of(cat, distinct, n_buckets)
    pruned = (
        post.filter(F.col("bucket").isin(buckets))
        .filter(F.col("term").isin(distinct))
        .select("term", "doc_int", "positions")
    )
    if cat.n_deletes():
        pruned = pruned.join(F.broadcast(cat.deletes()), "doc_int", "left_anti")
    rel = pruned.select(
        F.col("doc_int").alias("doc_id"), "term",
        F.explode("positions").alias("pos"),
    )
    ranked = _rank_spans(
        _min_cover_span(rel, terms), window, k
    ).withColumnRenamed("doc_id", "doc_int")
    meta = cat.doc_meta().select("doc_int", "doc_id")
    return ranked.join(meta, "doc_int").select("doc_id", "min_span", "rank")


def _rank_spans(spans: DataFrame, window: int, k: int) -> DataFrame:
    w = Window.orderBy(F.asc("min_span"), F.asc("doc_id"))
    return (
        spans.filter(F.col("min_span") <= window)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "min_span", "rank")
    )


# ---------------------------------------------------------------------------
# Ordered span (Lucene span_near in_order=true)
# ---------------------------------------------------------------------------


def _min_ordered_span(rel: DataFrame, terms: list[str]) -> DataFrame:
    """(doc_id, min_span) over a (doc_id, term, pos) relation: length of
    the shortest window containing the terms IN SEQUENCE ORDER (strictly
    increasing positions; duplicate terms in the sequence need distinct
    occurrences).

    Dynamic program as cascaded window passes: s_j(p) = the latest start
    of an ordered match of terms[0..j] ending at p = max of s_{j-1} over
    strictly-earlier rows, taken only on term==terms[j] rows. len(terms)
    window passes, each over the query terms' occurrence rows only —
    same query-bounded per-doc row count as the unordered sweep."""
    if not terms:
        raise ValueError("ordered-span query needs at least one term")
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    df = rel.withColumn(
        "_s", F.when(F.col("term") == terms[0], F.col("pos"))
    )
    for j in range(1, len(terms)):
        df = df.withColumn("_p", F.max("_s").over(w_prev)).withColumn(
            "_s", F.when(F.col("term") == terms[j], F.col("_p"))
        )
    return (
        df.filter(F.col("_s").isNotNull())
        .groupBy("doc_id")
        .agg(F.min(F.col("pos") - F.col("_s") + 1).cast("int").alias("min_span"))
    )


def ordered_span_topk(
    docs: DataFrame, terms: list[str], window: int, k: int = 20
) -> DataFrame:
    """(doc_id, min_span, rank): docs containing the terms in order
    within at most ``window`` tokens — the middle ground between exact
    phrase (adjacent, ordered) and proximity (windowed, unordered)."""
    toks = tokens_col("text")
    rel = docs.select(
        "doc_id", F.posexplode(toks).alias("pos", "term")
    ).filter(F.col("term").isin(sorted(set(terms))))
    return _rank_spans(_min_ordered_span(rel, terms), window, k)


def ordered_span_topk_from_index(
    cat: IndexCatalog, terms: list[str], window: int, k: int = 20
) -> DataFrame:
    """Ordered span over the positional index — same pruned-postings
    serving shape as proximity_topk_from_index."""
    post = cat.postings()
    if "positions" not in post.columns:
        raise ValueError(
            "index has no positions column — rebuild with "
            "build_index(..., with_positions=True) to serve span queries"
        )
    n_buckets = int(cat.read_manifest()["config"]["n_buckets"])
    distinct = sorted(set(terms))
    buckets = _buckets_of(cat, distinct, n_buckets)
    pruned = (
        post.filter(F.col("bucket").isin(buckets))
        .filter(F.col("term").isin(distinct))
        .select("term", "doc_int", "positions")
    )
    if cat.n_deletes():
        pruned = pruned.join(F.broadcast(cat.deletes()), "doc_int", "left_anti")
    rel = pruned.select(
        F.col("doc_int").alias("doc_id"), "term",
        F.explode("positions").alias("pos"),
    )
    ranked = _rank_spans(
        _min_ordered_span(rel, terms), window, k
    ).withColumnRenamed("doc_id", "doc_int")
    meta = cat.doc_meta().select("doc_int", "doc_id")
    return ranked.join(meta, "doc_int").select("doc_id", "min_span", "rank")


def phrase_prefix_tf_col(tokens: Column, fixed_terms: list[str], prefix: str) -> Column:
    """Sliding-window count of phrase-prefix occurrences: positions i
    where ``tokens[i+k] == fixed_terms[k]`` for every fixed term and the
    NEXT token starts with ``prefix``. The Catalyst twin of
    phrase_tf_col with the last slot relaxed to a prefix test —
    match_phrase_prefix's matching rule with unlimited expansions (the
    31-term driver vocabulary makes ES's max_expansions=50 cap a
    no-op; a capped variant would pre-rank expansions by df)."""
    if not prefix:
        raise ValueError("phrase prefix must be non-empty")
    n = len(fixed_terms) + 1

    def window_matches(i: Column) -> Column:
        cond = F.get(tokens, i + n - 1).startswith(F.lit(prefix))
        for k, w in enumerate(fixed_terms):
            cond = (F.get(tokens, i + k) == F.lit(w)) & cond
        return cond

    counted = F.size(F.filter(F.sequence(F.lit(0), F.size(tokens) - n), window_matches))
    return F.when(F.size(tokens) >= n, counted).otherwise(F.lit(0)).cast("int")


def phrase_prefix_topk(
    docs: DataFrame,
    fixed_terms: list[str],
    prefix: str,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, phrase_tf, bm25, rank) — ``match_phrase_prefix``
    (search-as-you-type): the phrase ``fixed_terms`` followed by any
    token starting with ``prefix``. Matching counts EVERY expansion
    occurrence into one pseudo-term tf (so "hash t" counts "hash table"
    and "hash the" windows alike), then scores the pseudo-term with the
    same BM25 tail phrase_topk uses — the score-unified treatment of
    ES's expanded SpanNear rewrite.

    Scale shape identical to phrase_topk: tf and |d| are row-local
    Catalyst expressions, the tf>0 filter prunes scan-side, the
    phrase-df and corpus stats fold in as 1-row broadcasts. Zero
    Python, zero corpus-sized shuffles."""
    toks = tokens_col(text_col)
    matched = docs.select(
        F.col(id_col).alias("doc_id"),
        phrase_prefix_tf_col(toks, fixed_terms, prefix).alias("phrase_tf"),
        F.size(toks).alias("doc_length"),
    ).filter(F.col("phrase_tf") > 0)
    stats = docs.select(F.size(toks).alias("doc_length")).agg(
        F.count(F.lit(1)).alias("doc_count"),
        F.avg("doc_length").alias("avg_doc_length"),
    )
    return _score_and_rank(matched, stats, k)
