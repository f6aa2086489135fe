"""Layered retrieval operators composed over the exact BM25 scorer.

Production retrieval stacks layer these five capabilities over plain
per-document BM25 (the reference serves only the flat ranker,
internal/ranking/ranker.go:44-68; these are the standard next rungs a
user of that service asks for, each built Spark-first):

- ``conversation_topk``  — passage->document aggregation (MaxP): rank
  CONVERSATIONS by their best-scoring turn. The transcript corpus
  (conv_id, turn_idx) is the natural unit pair.
- ``bm25f_score`` / ``bm25f_topk`` — simple BM25F: per-field weighted
  term frequencies and weighted length normalization (Robertson et al.,
  "Simple BM25 extension to multiple weighted fields", CIKM 2004).
- ``more_like_this`` — similar-document retrieval: the source doc's top
  tf-idf terms become the query (Lucene's MoreLikeThis semantics).
- ``facet_counts`` — facet aggregation over the candidate set (every
  doc matching >=1 query term), grouped by metadata columns.
- ``prf_expand`` / ``prf_topk`` — pseudo-relevance feedback: expansion
  terms mined from the top feedback docs re-weight a second scoring
  pass (RM-style two-pass retrieval, Lavrenko & Croft 2001,
  simplified to a deterministic tf/len * idf term weight).

Scale notes (100 TB thinking):
- every stage is pure Catalyst (no Python in the hot path); the only
  driver-side materialization is QUERY PLANNING state bounded by
  #queries x n_terms (more_like_this / prf expansion term lists — the
  same bounded collect the WAND session does for query stats).
- conversation aggregation is ONE extra hash aggregate keyed
  (query_id, conv_id) after the per-turn score agg; the best-turn
  argmax rides the same aggregate as a struct-max, no window pass.
- BM25F's fielded token union multiplies the explode volume by the
  number of SHORT fields only (role/tool are 1 token vs ~100 for
  text), so the posting volume grows a few percent, not x3.
- facet counting joins the (small) candidate id set to metadata via
  the same broadcast-semi-join shape the feature joins use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import B, K1
from ..functions.tokenize import tokens_col
from . import scorer

# ---------------------------------------------------------------------------
# Conversation-level retrieval (MaxP aggregation)
# ---------------------------------------------------------------------------


def conversation_topk(
    scored_turns: DataFrame,
    k: int = 10,
    score_col: str = "bm25",
) -> DataFrame:
    """Aggregate per-turn scores to conversations; rank by best turn.

    Input: one row per (query_id, conv_id, turn_idx) with ``score_col``
    (produced by ``scorer.score_candidates`` over turn-docs). Output one
    row per (query_id, conv_id): the MaxP conversation score, the
    best-scoring turn (ties -> lowest turn_idx), how many turns matched,
    and the conversation rank (score desc, conv_id asc).

    MaxP (max of passage scores) is the standard passage->document
    aggregation; sum/mean over matching turns are also emitted so the
    caller can re-rank without re-scoring.
    """
    s = F.col(score_col)
    agg = scored_turns.groupBy("query_id", "conv_id").agg(
        # struct-max argmax: highest score, then LOWEST turn_idx on ties
        # (negating turn makes lexicographic struct order pick it) — one
        # hash aggregate, no second window pass over the turn relation
        F.max(F.struct(s.alias("s"), (-F.col("turn_idx")).alias("nt"))).alias("best"),
        F.sum(s).alias("sum_score"),
        F.avg(s).alias("mean_score"),
        F.count(F.lit(1)).cast("int").alias("n_turns_matched"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.col("best.s")), F.asc("conv_id")
    )
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "conv_id",
            F.col("best.s").alias("conv_score"),
            (-F.col("best.nt")).cast("int").alias("best_turn_idx"),
            "sum_score",
            "mean_score",
            "n_turns_matched",
            "rank",
        )
    )


# ---------------------------------------------------------------------------
# BM25F — weighted multi-field scoring
# ---------------------------------------------------------------------------


def fielded_term_frequencies(
    docs: DataFrame,
    field_weights: dict[str, float],
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, term, wtf): weighted tf summed across fields.

    wtf(d, t) = sum_f w_f * tf_f(d, t) — the "simple BM25F" field
    combination. One union of per-field exploded tokens, one hash
    aggregate; each field's tokens carry the field weight as a literal.
    """
    parts = []
    for col, w in field_weights.items():
        parts.append(
            docs.select(
                F.col(id_col).alias("doc_id"),
                F.explode(tokens_col(col)).alias("term"),
                F.lit(float(w)).alias("w"),
            )
        )
    toks = parts[0]
    for p in parts[1:]:
        toks = toks.unionByName(p)
    return toks.groupBy("doc_id", "term").agg(F.sum("w").alias("wtf"))


def fielded_doc_lengths(
    docs: DataFrame,
    field_weights: dict[str, float],
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, wdl): weighted document length sum_f w_f * |field_f|.

    Computed directly from the source row (size of each field's token
    array) — no explode, includes docs whose every field is empty.
    """
    wdl = None
    for col, w in field_weights.items():
        term = F.size(tokens_col(col)).cast("double") * F.lit(float(w))
        wdl = term if wdl is None else wdl + term
    return docs.select(F.col(id_col).alias("doc_id"), wdl.alias("wdl"))


def bm25f_score(
    docs: DataFrame,
    queries: DataFrame,
    field_weights: dict[str, float],
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-(query, candidate) simple-BM25F score over weighted fields.

    Scoring mirrors the house BM25 occurrence semantics (duplicate query
    terms count per occurrence; occurrences with no posting or no idf are
    skipped) with tf -> wtf and |d| -> weighted length:

        score = sum_occ idf(t) * wtf*(k1+1) / (wtf + k1*(1-b + b*wdl/avgwdl))

    idf(t) = ln(N / (df+1)) with df counted over the UNION of fields
    (a doc containing t in any weighted field is a match).
    """
    wtf = fielded_term_frequencies(docs, field_weights, id_col)
    wdl = fielded_doc_lengths(docs, field_weights, id_col)
    return _bm25f_score_relations(wtf, wdl, queries)


def _bm25f_score_relations(
    wtf: DataFrame, wdl: DataFrame, queries: DataFrame
) -> DataFrame:
    """Shared BM25F scoring tail over pre-built (doc_id, term, wtf) and
    (doc_id, wdl) relations — the raw path feeds fielded explodes, the
    indexed path feeds per-field pruned postings. ``wtf`` may already be
    restricted to the queries' terms (the qterms joins below are then
    no-ops); df/doc_count/avg semantics are identical either way."""
    stats = wdl.agg(
        F.count(F.lit(1)).alias("doc_count"),
        F.avg("wdl").alias("avg_wdl"),
    )

    qocc = scorer.query_term_occurrences(queries)
    qterms = qocc.select("query_id", "term").distinct()

    df_rel = (
        wtf.join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    idf = df_rel.crossJoin(F.broadcast(stats)).select(
        "term",
        F.log(F.col("doc_count").cast("double") / (F.col("df") + 1)).alias("idf"),
    )

    cand = (
        wtf.select("term", "doc_id")
        .join(F.broadcast(qterms), "term")
        .select("query_id", "doc_id")
        .distinct()
        .join(wdl, "doc_id")
    )
    occ = (
        cand.join(F.broadcast(qocc), "query_id")
        .join(wtf, ["doc_id", "term"], "left")
        .join(F.broadcast(idf), "term", "left")
        .crossJoin(F.broadcast(stats))
    )
    has = F.col("wtf").isNotNull() & F.col("idf").isNotNull()
    term_score = F.when(
        has,
        F.col("idf")
        * (F.col("wtf") * F.lit(K1 + 1.0))
        / (
            F.col("wtf")
            + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * (F.col("wdl") / F.col("avg_wdl")))
        ),
    ).otherwise(F.lit(0.0))
    return occ.groupBy("query_id", "doc_id").agg(
        F.sum(term_score).alias("bm25f"),
        F.sum(F.when(has, 1).otherwise(0)).cast("int").alias("covered"),
    )


def bm25f_topk(
    docs: DataFrame,
    queries: DataFrame,
    field_weights: dict[str, float],
    k: int = 20,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k by BM25F (desc, doc_id asc tie-break), with rank."""
    sc = bm25f_score(docs, queries, field_weights, id_col)
    w = Window.partitionBy("query_id").orderBy(F.desc("bm25f"), F.asc("doc_id"))
    return sc.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# More-like-this — similar-document retrieval
# ---------------------------------------------------------------------------


def more_like_this_terms(
    doc_tf: DataFrame,
    stats: DataFrame,
    source_doc_id,
    n_terms: int = 8,
) -> list[str]:
    """The source doc's top ``n_terms`` terms by tf*idf.

    Selection key is ROUND(tf*idf, 6) desc then term asc — the rounding
    makes the cut engine-portable (same convention as every ranked
    driver pair). Returns a Python list: this is bounded QUERY PLANNING
    state (n_terms strings), not data movement.
    """
    src = doc_tf.filter(F.col("doc_id") == source_doc_id).select("term", "tf")
    idf = scorer.term_idf(doc_tf, stats, src.select("term"))
    ranked = (
        src.join(idf.select("term", "idf"), "term")
        .select("term", F.round(F.col("tf") * F.col("idf"), 6).alias("w"))
        .orderBy(F.desc("w"), F.asc("term"))
        .limit(n_terms)
    )
    return [r["term"] for r in ranked.collect()]


def more_like_this(
    docs: DataFrame,
    source_doc_id,
    n_terms: int = 8,
    k: int = 20,
) -> DataFrame:
    """Docs most similar to ``source_doc_id``: BM25 over its top terms.

    Two passes: (1) mine the source doc's top tf-idf terms (bounded
    collect), (2) score the corpus with those terms as a disjunctive
    query, excluding the source doc itself. Rank = (rounded bm25 desc,
    doc_id asc) so the ordering is engine-portable.
    """
    spark = docs.sparkSession
    dtf = scorer.doc_term_frequencies(docs)
    dlen = scorer.doc_lengths(docs)
    stats = scorer.corpus_stats(dlen)
    terms = more_like_this_terms(dtf, stats, source_doc_id, n_terms)
    if not terms:
        return spark.createDataFrame(
            [], "query_id string, doc_id long, bm25 double, rank int"
        )
    qdf = spark.createDataFrame(
        [("mlt", " ".join(terms))], "query_id string, text string"
    )
    sc = (
        scorer.score_candidates(dtf, dlen, stats, qdf)
        .filter(F.col("doc_id") != source_doc_id)
        .select("query_id", "doc_id", F.round("bm25", 6).alias("bm25"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("bm25"), F.asc("doc_id"))
    return sc.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# Faceted search — metadata aggregation over the candidate set
# ---------------------------------------------------------------------------


def facet_counts(
    docs: DataFrame,
    queries: DataFrame,
    facet_cols: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, field, value, n_docs): facet histogram of candidates.

    Candidates = docs containing >=1 query term (the same disjunctive
    candidate rule the scorer uses). One row per facet value per field.
    The candidate set stays an id relation until the single metadata
    join; per-field histograms union after aggregation (each union leg
    aggregates the SAME joined relation, so Catalyst reuses the scan).
    """
    dtf = scorer.doc_term_frequencies(docs, id_col, text_col)
    qterms = scorer.query_term_occurrences(queries).select("query_id", "term").distinct()
    cand = (
        dtf.select("term", "doc_id")
        .join(F.broadcast(qterms), "term")
        .select("query_id", "doc_id")
        .distinct()
    )
    meta = cand.join(
        docs.select(F.col(id_col).alias("doc_id"), *facet_cols), "doc_id"
    )
    parts = []
    for col in facet_cols:
        parts.append(
            meta.groupBy("query_id", F.col(col))
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .select(
                "query_id",
                F.lit(col).alias("field"),
                F.col(col).cast("string").alias("value"),
                "n_docs",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# Pseudo-relevance feedback (RM-style, deterministic)
# ---------------------------------------------------------------------------


def prf_expansion_terms(
    scored: DataFrame,
    doc_tf: DataFrame,
    doc_len: DataFrame,
    stats: DataFrame,
    queries: DataFrame,
    fb_docs: int = 10,
    fb_terms: int = 5,
) -> DataFrame:
    """(query_id, term): expansion terms mined from the feedback docs.

    Feedback set = top ``fb_docs`` by (rounded bm25 desc, doc_id asc).
    Term weight = sum over feedback docs of (tf/|d|) * idf(t) — a
    deterministic RM1-style weight; original query terms are excluded.
    Top ``fb_terms`` by (rounded weight desc, term asc).

    Stays a DataFrame: callers that need the terms driver-side (to build
    the expanded query) collect #queries x fb_terms rows — bounded
    planning state.
    """
    w_fb = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("bm25", 6)), F.asc("doc_id")
    )
    fb = (
        scored.withColumn("rn", F.row_number().over(w_fb))
        .filter(F.col("rn") <= fb_docs)
        .select("query_id", "doc_id")
    )
    # tf/|d| mass per (query, term) across the feedback docs; fb is tiny
    # (#queries x fb_docs) -> broadcast against the big doc_tf relation
    mass = (
        doc_tf.join(F.broadcast(fb), "doc_id")
        .join(doc_len, "doc_id")
        .groupBy("query_id", "term")
        .agg(
            F.sum(
                F.col("tf").cast("double") / F.col("doc_length").cast("double")
            ).alias("mass")
        )
    )
    # idf over exactly the candidate expansion vocabulary
    idf = scorer.term_idf(doc_tf, stats, mass.select("term").distinct())
    qterms = scorer.query_term_occurrences(queries).select("query_id", "term").distinct()
    weighted = (
        mass.join(F.broadcast(idf.select("term", "idf")), "term")
        .join(F.broadcast(qterms), ["query_id", "term"], "left_anti")
        .select("query_id", "term", F.round(F.col("mass") * F.col("idf"), 6).alias("w"))
    )
    w_t = Window.partitionBy("query_id").orderBy(F.desc("w"), F.asc("term"))
    return (
        weighted.withColumn("rn", F.row_number().over(w_t))
        .filter(F.col("rn") <= fb_terms)
        .select("query_id", "term")
    )


def prf_topk(
    docs: DataFrame,
    queries: DataFrame,
    fb_docs: int = 10,
    fb_terms: int = 5,
    k: int = 20,
) -> DataFrame:
    """Two-pass retrieval: score, expand from top docs, re-score, top-k.

    The expanded query = original occurrence list + each expansion term
    once; pass 2 scores it with the standard occurrence semantics.
    Output: (query_id, doc_id, bm25, covered, rank) of the SECOND pass.
    """
    spark = docs.sparkSession
    dtf = scorer.doc_term_frequencies(docs)
    dlen = scorer.doc_lengths(docs)
    stats = scorer.corpus_stats(dlen)
    pass1 = scorer.score_candidates(dtf, dlen, stats, queries).select(
        "query_id", "doc_id", "bm25"
    )
    exp = prf_expansion_terms(
        pass1, dtf, dlen, stats, queries, fb_docs=fb_docs, fb_terms=fb_terms
    )
    # bounded planning collect: #queries x fb_terms rows
    exp_by_q: dict[str, list[str]] = {}
    for r in exp.collect():
        exp_by_q.setdefault(r["query_id"], []).append(r["term"])
    base = {
        r["query_id"]: r["text"]
        for r in queries.select("query_id", "text").collect()
    }
    expanded = [
        (qid, " ".join([text] + sorted(exp_by_q.get(qid, []))))
        for qid, text in base.items()
    ]
    qdf2 = spark.createDataFrame(expanded, "query_id string, text string")
    sc = scorer.score_candidates(dtf, dlen, stats, qdf2).select(
        "query_id",
        "doc_id",
        F.round("bm25", 6).alias("bm25"),
        F.col("covered_query_term_number").cast("int").alias("covered"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("bm25"), F.asc("doc_id"))
    return sc.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def conversation_topk_from_index(
    cat,
    queries: DataFrame,
    k: int = 10,
    turns_k: int = 1000,
    turns_per_conv: int = 8,
) -> DataFrame:
    """Index-served conversation retrieval: WAND top turns -> MaxP convs.

    Rank-safety: a conversation's MaxP score is its best turn's score,
    and turns scoring above the true k-th conversation's best turn can
    come only from the (k-1) better conversations — at most
    ``turns_per_conv`` turns each. So ``turns_k >= k * turns_per_conv``
    makes the top-k conversations EXACT (up to equal-score boundary
    ties), while the index prunes with block-max bounds instead of
    scoring the corpus. Only (conv_score, best_turn_idx) are exact under
    truncation — matched-turn counts/sums need the full candidate set,
    so this serving variant does not emit them (use conversation_topk
    over the exact scorer for analytics).

    ``doc_id`` in the index is ``conv_id:turn_idx`` (SURVEY.md §1.3).
    """
    from .wand import wand_topk

    turns = wand_topk(cat, queries, k=max(turns_k, k * turns_per_conv))
    scored = turns.select(
        "query_id",
        F.regexp_extract("doc_id", r"^(.*):(\d+)$", 1).alias("conv_id"),
        F.regexp_extract("doc_id", r":(\d+)$", 1).cast("int").alias("turn_idx"),
        F.col("bm25"),
    )
    return conversation_topk(scored, k=k, score_col="bm25").select(
        "query_id", "conv_id", "conv_score", "best_turn_idx", "rank"
    )


# ---------------------------------------------------------------------------
# Static-rank blending and time histograms
# ---------------------------------------------------------------------------


def blended_topk(
    scored: DataFrame,
    prior: DataFrame,
    weight: float = 0.5,
    k: int = 20,
    score_col: str = "bm25",
    prior_col: str = "prior",
) -> DataFrame:
    """Blend a query-dependent score with a query-INDEPENDENT prior.

    blended = score + weight * prior, ranked (blended desc, doc_id asc).
    The prior is any per-doc static rank — PageRank, recency decay,
    quality score (the reference feeds PageRank into its LTR features,
    types.go:50-89; this is the direct linear-blend serving shape).

    ``prior`` joins AFTER scoring on doc_id (left join, missing -> 0),
    so the blend adds one join against a relation of corpus cardinality
    — broadcastable when the prior is top-sliced, shuffle-on-doc_id
    otherwise (well-distributed key).
    """
    out = (
        scored.join(
            prior.select(
                F.col("doc_id"), F.col(prior_col).alias("_prior")
            ),
            "doc_id",
            "left",
        )
        .withColumn("prior", F.coalesce(F.col("_prior"), F.lit(0.0)))
        .withColumn("blended", F.col(score_col) + F.lit(weight) * F.col("prior"))
        .drop("_prior")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("blended"), F.asc("doc_id"))
    return out.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def rescore_window(
    scored: DataFrame,
    secondary: DataFrame,
    k: int = 10,
    window: int = 50,
    query_weight: float = 1.0,
    rescore_weight: float = 1.0,
    score_col: str = "bm25",
    rescore_col: str = "rescore",
) -> DataFrame:
    """(query_id, doc_id, score, rank) — ES-style two-phase rescoring
    (the ``rescore`` request section): only the primary ranking's top
    ``window`` docs per query get their score recomputed as
    ``query_weight * primary + rescore_weight * secondary``; docs beyond
    the window keep the primary score untouched, and the final top-k
    re-sorts the union (a rescored doc can therefore fall below, or an
    un-rescored doc rise above, its phase-one position — exactly ES's
    semantics with the default ``total`` score mode).

    Scale shape: this exists so an expensive secondary signal (exact
    phrase proximity, a model forward pass) touches only ``window`` docs
    per query — corpus-independent — instead of every candidate.
    ``secondary`` is joined left on doc_id (and query_id when present)
    with missing -> 0; primary scores are 6-dp-rounded before the blend
    on both engines so near-ties break identically (house convention).
    """
    w0 = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(score_col, 6)), F.asc("doc_id")
    )
    ranked = scored.withColumn("_prank", F.row_number().over(w0))
    join_keys = (
        ["query_id", "doc_id"] if "query_id" in secondary.columns else ["doc_id"]
    )
    joined = ranked.join(secondary, join_keys, "left")
    primary_r = F.round(F.col(score_col), 6)
    combined = F.when(
        F.col("_prank") <= window,
        F.round(
            F.lit(query_weight) * primary_r
            + F.lit(rescore_weight)
            * F.coalesce(F.col(rescore_col), F.lit(0.0)),
            6,
        ),
    ).otherwise(primary_r)
    out = joined.withColumn("score", combined)
    w1 = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        out.withColumn("rank", F.row_number().over(w1))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


def time_histogram(
    docs: DataFrame,
    queries: DataFrame,
    ts_col: str = "ts",
    bucket: str = "minute",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, bucket_start, n_docs): date-histogram facet of the
    candidate set (docs matching >=1 query term), bucketed by
    ``date_trunc(bucket, ts)``. ``bucket_start`` is a formatted string
    so results are engine/timezone-portable.

    Same candidate semi-join shape as facet_counts; the histogram is one
    hash aggregate on (query_id, bucket) — low cardinality keys, but the
    map-side partial agg collapses each partition to #buckets rows
    before the exchange, so the shuffle is tiny at any corpus size.
    """
    dtf = scorer.doc_term_frequencies(docs, id_col, text_col)
    qterms = scorer.query_term_occurrences(queries).select("query_id", "term").distinct()
    cand = (
        dtf.select("term", "doc_id")
        .join(F.broadcast(qterms), "term")
        .select("query_id", "doc_id")
        .distinct()
    )
    meta = cand.join(
        docs.select(F.col(id_col).alias("doc_id"), F.col(ts_col).alias("_ts")),
        "doc_id",
    )
    return (
        meta.groupBy(
            "query_id",
            F.date_format(F.date_trunc(bucket, F.col("_ts")), "yyyy-MM-dd HH:mm:ss").alias(
                "bucket_start"
            ),
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# Typo-tolerant retrieval (SymSpell-style deletion neighborhoods)
# ---------------------------------------------------------------------------


def _deletion_variants(rel: DataFrame, term_col: str = "term") -> DataFrame:
    """Explode each term into {term} ∪ {term minus one char}.

    The SymSpell candidate-generation trick (Garbe's public symspell
    algorithm): two terms are within Levenshtein distance 1 iff their
    1-deletion neighborhoods (including the terms themselves) intersect
    — substitution deletes the differing position from both sides,
    insertion/deletion makes one side a variant of the other. The
    neighborhood join OVER-generates (e.g. transposed bigrams collide),
    so matches are verified with an exact ``levenshtein`` after the
    equi-join; it never under-generates for distance <= 1.
    """
    variants = F.array_union(
        F.array(F.col(term_col)),
        F.expr(
            f"transform(sequence(1, length({term_col})), i ->"
            f" concat(substring({term_col}, 1, i - 1),"
            f" substring({term_col}, i + 1, length({term_col}))))"
        ),
    )
    return rel.select(
        "*", F.explode(variants).alias("_variant")
    )


def fuzzy_term_matches(
    vocab: DataFrame,
    queries: DataFrame,
    max_edits: int = 1,
) -> DataFrame:
    """(query_id, qterm, term, dist): index terms within ``max_edits``
    (Levenshtein) of each query term.

    ``vocab`` is the corpus's distinct-term relation (term [, df]) —
    at scale the precomputed, persisted deletion-neighborhood index of
    the term dictionary (vocabulary cardinality, NOT posting
    cardinality, so the explode is a few × |vocab| rows). Candidate
    pairs come from an equi-join on the shared variant key — never a
    vocab × query cross product — and are verified with the exact
    JVM-side ``levenshtein``. max_edits > 1 chains deletions; only 1 is
    implemented (the standard serving choice).
    """
    if max_edits != 1:
        raise ValueError("only max_edits=1 is supported")
    qv = _deletion_variants(
        queries.select("query_id", F.col("term").alias("qterm")), "qterm"
    )
    vv = _deletion_variants(vocab.select("term"), "term")
    return (
        qv.join(vv, qv["_variant"] == vv["_variant"])
        .select("query_id", "qterm", "term")
        .distinct()
        .withColumn("dist", F.levenshtein("qterm", "term"))
        .filter(F.col("dist") <= max_edits)
    )


def fuzzy_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 top-k with typo-tolerant term matching (edit distance <= 1).

    Each query term expands to the vocabulary terms within Levenshtein
    distance 1 (``fuzzy_term_matches``); the union of matched terms —
    deduplicated, each with multiplicity 1 — is scored as a plain BM25
    disjunction (each matched term keeps ITS OWN idf, the standard
    fuzzy-scoring choice). Query terms with no vocabulary match drop
    out; a query with zero matches returns no rows.

    Scale shape: vocabulary-sized deletion index (broadcastable vs
    posting volume), then the ordinary broadcast-query scoring path —
    no new shuffle beyond ``score_candidates``.
    """
    dtf = scorer.doc_term_frequencies(docs, id_col, text_col)
    dlen = scorer.doc_lengths(docs, id_col, text_col)
    stats = scorer.corpus_stats(dlen)
    qterms = (
        scorer.query_term_occurrences(queries)
        .select("query_id", "term").distinct()
    )
    matched = fuzzy_term_matches(dtf.select("term").distinct(), qterms)
    # rebuild a query-text relation from the expanded term set:
    # sort_array pins determinism; scoring is term-order independent
    fuzzy_queries = (
        matched.groupBy("query_id")
        .agg(F.concat_ws(" ", F.sort_array(F.collect_set("term"))).alias("text"))
    )
    scored = scorer.score_candidates(dtf, dlen, stats, fuzzy_queries)
    return scorer.topk(scored.select("query_id", "doc_id", "bm25"), k)


# ---------------------------------------------------------------------------
# Substring search via trigram index (pg_trgm-style)
# ---------------------------------------------------------------------------


def text_trigrams(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, trigram): distinct sliding character 3-grams of the
    lowercased text — the trigram INDEX relation (persist it next to the
    postings at scale; computed inline here). Docs shorter than 3 chars
    produce no rows."""
    tri = F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(length(lower({text_col})) - 2, 0)),"
            f" i -> substring(lower({text_col}), i, 3))"
        )
    )
    return docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tri).alias("trigram")
    )


def substring_search(
    docs: DataFrame,
    patterns: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, doc_id): docs whose lowercased text contains the
    (lowercased) pattern as a contiguous substring.

    pg_trgm's two-phase shape: (1) candidate generation — a doc can
    contain the pattern only if its trigram set covers ALL pattern
    trigrams (any contiguous substring's trigrams are a subset of the
    string's), counted via one broadcast join + agg on the trigram
    index; (2) exact verification — ``instr`` on the candidate rows
    only. Correctness never depends on phase 1; it only prunes the
    verification scan from |corpus| to |candidates|. Patterns shorter
    than 3 characters skip phase 1 (no trigram to prune with) and scan.
    """
    pats = patterns.select(
        "query_id", F.lower(F.col("text")).alias("_pat")
    )
    short = pats.filter(F.length("_pat") < 3)
    long = pats.filter(F.length("_pat") >= 3)

    ptri = (
        long.select(
            "query_id", "_pat",
            F.explode(
                F.array_distinct(
                    F.expr(
                        "transform(sequence(1, length(_pat) - 2),"
                        " i -> substring(_pat, i, 3))"
                    )
                )
            ).alias("trigram"),
        )
    )
    n_tri = ptri.groupBy("query_id", "_pat").agg(
        F.count(F.lit(1)).alias("_n_tri")
    )
    cand = (
        text_trigrams(docs, id_col, text_col)
        .join(F.broadcast(ptri), "trigram")
        .groupBy("query_id", "_pat", "doc_id")
        .agg(F.count(F.lit(1)).alias("_n_hit"))
        .join(F.broadcast(n_tri), ["query_id", "_pat"])
        .filter(F.col("_n_hit") == F.col("_n_tri"))
        .select("query_id", "_pat", "doc_id")
    )
    verified = (
        cand.join(
            docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_txt")),
            "doc_id",
        )
        .filter(F.instr(F.lower(F.col("_txt")), F.col("_pat")) > 0)
        .select("query_id", "doc_id")
    )
    # short patterns: direct scan filter (cross join against the tiny
    # broadcast pattern side). Pattern lengths aren't knowable at plan
    # time without an action, so the union is unconditional; with no
    # short patterns the broadcast side is empty and the branch emits
    # nothing.
    scanned = (
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_txt"))
        .crossJoin(F.broadcast(short))
        .filter(F.instr(F.lower(F.col("_txt")), F.col("_pat")) > 0)
        .select("query_id", "doc_id")
    )
    return verified.unionByName(scanned)


# ---------------------------------------------------------------------------
# Prefix autocomplete and boolean NOT
# ---------------------------------------------------------------------------


def suggest_terms(
    docs: DataFrame,
    prefixes: DataFrame,
    n: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, term, df, rank): top-n completions of each prefix from
    the corpus vocabulary, ranked by document frequency (df desc, term
    asc — the standard suggest ordering).

    The vocabulary relation (term, df) is one agg over the posting
    relation; the prefix probe is a broadcast join against the tiny
    prefix side, keyed on ``substring(term, 1, len(prefix))`` — an
    EQUI-join (prefix length is a column of the broadcast side), so no
    nested-loop scan. At scale the persisted term dictionary is
    df-sorted within prefix buckets and this becomes an index range
    scan."""
    vocab = (
        scorer.doc_term_frequencies(docs, id_col, text_col)
        .groupBy("term")
        .agg(F.count_distinct("doc_id").alias("df"))
    )
    pats = prefixes.select(
        "query_id",
        F.col("text").alias("_prefix"),
        F.length("text").alias("_plen"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("df"), F.asc("term"))
    return (
        vocab.join(
            F.broadcast(pats),
            F.expr("substring(term, 1, _plen)") == F.col("_prefix"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
        .select("query_id", "term", "df", "rank")
    )


def bm25_not_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 top-k with NOT exclusion: ``queries`` carries (query_id,
    text, neg_text); docs containing ANY negative term are excluded
    from that query's candidates BEFORE ranking (the '-term' operator).

    The exclusion is one broadcast semi-join to find excluded
    (query_id, doc_id) pairs (negative terms are few, their postings
    stream through the same doc_tf relation) and one left_anti join on
    the scored relation — no second corpus scan."""
    dtf = scorer.doc_term_frequencies(docs, id_col, text_col)
    dlen = scorer.doc_lengths(docs, id_col, text_col)
    scored = scorer.score_candidates(
        dtf, dlen, scorer.corpus_stats(dlen),
        queries.select("query_id", "text"),
    ).select("query_id", "doc_id", "bm25")
    neg_terms = (
        scorer.query_term_occurrences(
            queries.select("query_id", F.col("neg_text").alias("text"))
        )
        .select("query_id", "term")
        .distinct()
    )
    excluded = (
        dtf.select("term", "doc_id")
        .join(F.broadcast(neg_terms), "term")
        .select("query_id", "doc_id")
        .distinct()
    )
    kept = scored.join(excluded, ["query_id", "doc_id"], "left_anti")
    return scorer.topk(kept, k)


def boosting_topk(
    docs: DataFrame,
    queries: DataFrame,
    negative_boost: float = 0.2,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ES ``boosting`` query — demotion without exclusion, the soft
    sibling of :func:`bm25_not_topk`: docs matched by the positive query
    keep their BM25 score unless they ALSO contain a negative-query
    term, in which case the score is multiplied by ``negative_boost``
    (0..1). ``queries`` carries (query_id, text, neg_text).

    Plan shape is identical to NOT exclusion: one broadcast semi-join
    finds demoted (query_id, doc_id) pairs and ONE left join applies the
    factor on the scored relation — no second corpus scan, no second
    scoring kernel. Final rank on the 6-dp-rounded demoted score with
    doc_id tie-break (house convention)."""
    dtf = scorer.doc_term_frequencies(docs, id_col, text_col)
    dlen = scorer.doc_lengths(docs, id_col, text_col)
    scored = scorer.score_candidates(
        dtf, dlen, scorer.corpus_stats(dlen),
        queries.select("query_id", "text"),
    ).select("query_id", "doc_id", "bm25")
    neg_terms = (
        scorer.query_term_occurrences(
            queries.select("query_id", F.col("neg_text").alias("text"))
        )
        .select("query_id", "term")
        .distinct()
    )
    demoted = (
        dtf.select("term", "doc_id")
        .join(F.broadcast(neg_terms), "term")
        .select("query_id", "doc_id")
        .distinct()
        .withColumn("_demote", F.lit(True))
    )
    primary_r = F.round(F.col("bm25"), 6)  # demote the 6-dp score (house convention)
    out = scored.join(demoted, ["query_id", "doc_id"], "left").select(
        "query_id",
        "doc_id",
        F.round(
            F.when(
                F.col("_demote"), primary_r * F.lit(negative_boost)
            ).otherwise(primary_r),
            6,
        ).alias("bm25"),
    )
    return scorer.topk(out, k)


def significant_terms(
    docs: DataFrame,
    queries: DataFrame,
    fg_docs: int = 20,
    n_terms: int = 15,
) -> DataFrame:
    """(query_id, term, fg_df, bg_df, score, rank) — significant-terms
    aggregation (Elasticsearch's JLH heuristic): terms statistically
    OVERREPRESENTED in a query's result set relative to the whole corpus
    — "what is this result set about", the standard guided-navigation /
    topic-drilldown primitive. Unlike prf_expansion_terms (tf-mass
    weighting for recall), this contrasts foreground vs background
    document frequencies, so corpus-common terms score near zero however
    often they appear in the results.

    Foreground = top ``fg_docs`` by (rounded bm25 desc, doc_id asc).
    With fg% = fg_df/|fg| and bg% = bg_df/N:  score = (fg% - bg%) *
    (fg% / bg%)  (JLH: absolute lift x relative lift). Original query
    terms are excluded; ranked by (rounded score desc, term asc).

    Scale shape: the foreground id set is #queries x fg_docs rows ->
    broadcast semi-join prunes the corpus scan to foreground postings;
    the background df agg is corpus-wide BUT pruned to the foreground
    vocabulary by broadcasting the (foreground-vocab-sized) fg_df
    relation into it — on an indexed catalog, read bg_df straight from
    cat.terms() instead and skip that aggregate entirely."""
    dtf = scorer.doc_term_frequencies(docs)
    dlen = scorer.doc_lengths(docs)
    stats = scorer.corpus_stats(dlen)
    scored = scorer.score_candidates(dtf, dlen, stats, queries)
    w_fg = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("bm25", 6)), F.asc("doc_id")
    )
    fg = (
        scored.withColumn("rn", F.row_number().over(w_fg))
        .filter(F.col("rn") <= fg_docs)
        .select("query_id", "doc_id")
    )
    fg_n = fg.groupBy("query_id").agg(F.count(F.lit(1)).alias("fg_n"))
    fg_df = (
        dtf.join(F.broadcast(fg), "doc_id")
        .groupBy("query_id", "term")
        .agg(F.countDistinct("doc_id").alias("fg_df"))
    )
    bg_df = (
        dtf.join(F.broadcast(fg_df.select("term").distinct()), "term")
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("bg_df"))
    )
    qterms = (
        scorer.query_term_occurrences(queries)
        .select("query_id", "term")
        .distinct()
    )
    fg_pct = F.col("fg_df").cast("double") / F.col("fg_n")
    bg_pct = F.col("bg_df").cast("double") / F.col("doc_count")
    out = (
        fg_df.join(F.broadcast(fg_n), "query_id")
        .join(bg_df, "term")
        .join(F.broadcast(qterms), ["query_id", "term"], "left_anti")
        .crossJoin(F.broadcast(stats.select("doc_count")))
        .withColumn("score", (fg_pct - bg_pct) * (fg_pct / bg_pct))
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("score", 6)), F.asc("term")
    )
    return (
        out.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= n_terms)
        .select("query_id", "term", "fg_df", "bg_df", "score", "rank")
    )


# ---------------------------------------------------------------------------
# Index-backed twins (VERDICT r3 #3): the serving-path variants of the
# retrieval layer. The from-raw operators above re-derive doc_term_
# frequencies / vocabulary / trigram relations from text on every call —
# correct, and the right shape for their DuckDB oracles, but at 100x they
# are full-corpus scans + TF-agg shuffles per query. These twins plan
# against the IndexCatalog instead:
#   - query-term postings come from the PRUNED postings table (partition
#     pruning on term bucket + broadcast semi-join — query_exact.py);
#   - per-term df/idf come from the PERSISTED terms table (zero corpus
#     aggregation at query time);
#   - document term vectors (MLT source doc, PRF feedback docs,
#     significant-terms foreground) come from ONE broadcast semi-join scan
#     of the postings table on the bounded doc set — no re-tokenize, no
#     shuffle. (A forward index — doc_int -> term vector — would turn that
#     scan into a point lookup; it is the natural next build stage if
#     MLT/PRF become hot single-query serving paths.)
#   - substring candidates come from the persisted trigram index built by
#     plans.index_build.build_trigram_index.
# Each twin is value-identical to its from-raw sibling on the same corpus
# (driver pairs share the oracle SQL).
# ---------------------------------------------------------------------------


def _scored_from_index(cat, queries: DataFrame) -> DataFrame:
    """Exact BM25 scoring over pruned postings — the shared first pass of
    the from-index twins. Output matches scorer.score_candidates with
    doc_id = doc_int (the index's dense long id)."""
    from .query_exact import pruned_postings

    post = pruned_postings(cat, queries)
    doc_tf = post.select("term", F.col("doc_int").alias("doc_id"), "tf")
    doc_len = post.select(
        F.col("doc_int").alias("doc_id"), "doc_length"
    ).distinct()
    return scorer.score_candidates(doc_tf, doc_len, cat.corpus_stats(), queries)


def _with_string_ids(cat, ranked: DataFrame) -> DataFrame:
    """Map the index's doc_int back to the catalog doc_id string; keeps
    every other column. ``ranked`` must carry ``doc_int``."""
    meta = cat.doc_meta().select("doc_int", "doc_id")
    return ranked.join(meta, "doc_int")


def more_like_this_from_index(
    cat,
    source_doc_id: str,
    n_terms: int = 8,
    k: int = 20,
) -> DataFrame:
    """Index-served MoreLikeThis: the source doc's term vector comes from
    one postings semi-scan, its term idfs from the persisted terms table,
    and the expansion query scores through the pruned-postings path —
    zero corpus-wide aggregation at query time.

    ``source_doc_id`` is the CATALOG doc id (conv_id:turn_idx). Output:
    (query_id, doc_id, doc_int, bm25, rank), ranked by (rounded bm25
    desc, doc_int asc) — value-identical to more_like_this over the same
    corpus."""
    spark = cat.spark
    empty = spark.createDataFrame(
        [], "query_id string, doc_id string, doc_int long, bm25 double, rank int"
    )
    src_rows = (
        cat.doc_meta()
        .filter(F.col("doc_id") == source_doc_id)
        .select("doc_int")
        .collect()
    )
    if not src_rows:
        return empty
    src_int = int(src_rows[0][0])
    src_terms = (
        cat.postings()
        .filter(F.col("doc_int") == src_int)
        .select("term", "tf")
        .join(cat.terms().select("term", "idf"), "term")
        .select("term", F.round(F.col("tf") * F.col("idf"), 6).alias("w"))
        .orderBy(F.desc("w"), F.asc("term"))
        .limit(n_terms)
    )
    terms = [r["term"] for r in src_terms.collect()]  # bounded: n_terms
    if not terms:
        return empty
    qdf = spark.createDataFrame(
        [("mlt", " ".join(terms))], "query_id string, text string"
    )
    sc = (
        _scored_from_index(cat, qdf)
        .filter(F.col("doc_id") != src_int)
        .select(
            "query_id",
            F.col("doc_id").alias("doc_int"),
            F.round("bm25", 6).alias("bm25"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("bm25"), F.asc("doc_int"))
    ranked = sc.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
    return _with_string_ids(cat, ranked).select(
        "query_id", "doc_id", "doc_int", "bm25", "rank"
    )


def prf_topk_from_index(
    cat,
    queries: DataFrame,
    fb_docs: int = 10,
    fb_terms: int = 5,
    k: int = 20,
) -> DataFrame:
    """Index-served PRF: both scoring passes run over pruned postings;
    expansion-term idf reads the persisted terms table; the feedback
    docs' term mass comes from one postings semi-scan on the bounded
    (#queries x fb_docs) feedback set. Output: (query_id, doc_id,
    doc_int, bm25, covered, rank)."""
    spark = cat.spark
    pass1 = _scored_from_index(cat, queries).select("query_id", "doc_id", "bm25")
    w_fb = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("bm25", 6)), F.asc("doc_id")
    )
    fb = (
        pass1.withColumn("rn", F.row_number().over(w_fb))
        .filter(F.col("rn") <= fb_docs)
        .select("query_id", F.col("doc_id").alias("doc_int"))
    )
    mass = (
        cat.postings()
        .join(F.broadcast(fb), "doc_int")
        .groupBy("query_id", "term")
        .agg(
            F.sum(
                F.col("tf").cast("double") / F.col("doc_length").cast("double")
            ).alias("mass")
        )
    )
    qterms = (
        scorer.query_term_occurrences(queries).select("query_id", "term").distinct()
    )
    weighted = (
        mass.join(cat.terms().select("term", "idf"), "term")
        .join(F.broadcast(qterms), ["query_id", "term"], "left_anti")
        .select(
            "query_id", "term", F.round(F.col("mass") * F.col("idf"), 6).alias("w")
        )
    )
    w_t = Window.partitionBy("query_id").orderBy(F.desc("w"), F.asc("term"))
    exp = (
        weighted.withColumn("rn", F.row_number().over(w_t))
        .filter(F.col("rn") <= fb_terms)
        .select("query_id", "term")
    )
    # bounded planning collect: #queries x fb_terms rows
    exp_by_q: dict[str, list[str]] = {}
    for r in exp.collect():
        exp_by_q.setdefault(r["query_id"], []).append(r["term"])
    base = {
        r["query_id"]: r["text"] for r in queries.select("query_id", "text").collect()
    }
    expanded = [
        (qid, " ".join([text] + sorted(exp_by_q.get(qid, []))))
        for qid, text in base.items()
    ]
    qdf2 = spark.createDataFrame(expanded, "query_id string, text string")
    sc = _scored_from_index(cat, qdf2).select(
        "query_id",
        F.col("doc_id").alias("doc_int"),
        F.round("bm25", 6).alias("bm25"),
        F.col("covered_query_term_number").cast("int").alias("covered"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("bm25"), F.asc("doc_int"))
    ranked = sc.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
    return _with_string_ids(cat, ranked).select(
        "query_id", "doc_id", "doc_int", "bm25", "covered", "rank"
    )


def fuzzy_topk_from_index(cat, queries: DataFrame, k: int = 20) -> DataFrame:
    """Index-served typo-tolerant retrieval: the deletion-neighborhood
    candidate join runs against the PERSISTED term dictionary
    (cat.terms()) instead of a per-call distinct over exploded text, and
    the expanded disjunction scores through the pruned-postings exact
    path. Output matches query_exact.rank_from_index."""
    from .query_exact import rank_from_index

    qterms = (
        scorer.query_term_occurrences(queries).select("query_id", "term").distinct()
    )
    matched = fuzzy_term_matches(cat.terms().select("term"), qterms)
    fuzzy_queries = matched.groupBy("query_id").agg(
        F.concat_ws(" ", F.sort_array(F.collect_set("term"))).alias("text")
    )
    return rank_from_index(cat, fuzzy_queries, k=k)


def suggest_terms_from_index(cat, prefixes: DataFrame, n: int = 10) -> DataFrame:
    """Index-served prefix autocomplete: reads (term, df) straight from
    the persisted terms table — ZERO aggregation at query time (the
    from-raw variant pays a corpus-wide distinct-count per call). Same
    output contract as suggest_terms."""
    vocab = cat.terms().select("term", "df")
    pats = prefixes.select(
        "query_id",
        F.col("text").alias("_prefix"),
        F.length("text").alias("_plen"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("df"), F.asc("term"))
    return (
        vocab.join(
            F.broadcast(pats),
            F.expr("substring(term, 1, _plen)") == F.col("_prefix"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
        .select("query_id", "term", "df", "rank")
    )


def significant_terms_from_index(
    cat,
    queries: DataFrame,
    fg_docs: int = 20,
    n_terms: int = 15,
) -> DataFrame:
    """Index-served significant terms (JLH): background df reads the
    persisted terms table (the from-raw variant's corpus-wide bg_df
    aggregate disappears entirely); the foreground term histogram is one
    postings semi-scan on the bounded foreground id set. NB the persisted
    df is frozen at encode time under tombstoned deletes — the same
    freeze Lucene's docFreq has between merges (sources/catalog.py)."""
    scored = _scored_from_index(cat, queries)
    w_fg = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("bm25", 6)), F.asc("doc_id")
    )
    fg = (
        scored.withColumn("rn", F.row_number().over(w_fg))
        .filter(F.col("rn") <= fg_docs)
        .select("query_id", F.col("doc_id").alias("doc_int"))
    )
    fg_n = fg.groupBy("query_id").agg(F.count(F.lit(1)).alias("fg_n"))
    fg_df = (
        cat.postings()
        .join(F.broadcast(fg), "doc_int")
        .groupBy("query_id", "term")
        .agg(F.countDistinct("doc_int").alias("fg_df"))
    )
    bg_df = cat.terms().select("term", F.col("df").alias("bg_df"))
    qterms = (
        scorer.query_term_occurrences(queries).select("query_id", "term").distinct()
    )
    stats = cat.corpus_stats()
    fg_pct = F.col("fg_df").cast("double") / F.col("fg_n")
    bg_pct = F.col("bg_df").cast("double") / F.col("doc_count")
    out = (
        fg_df.join(F.broadcast(fg_n), "query_id")
        .join(bg_df, "term")
        .join(F.broadcast(qterms), ["query_id", "term"], "left_anti")
        .crossJoin(F.broadcast(stats.select("doc_count")))
        .withColumn("score", (fg_pct - bg_pct) * (fg_pct / bg_pct))
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("score", 6)), F.asc("term")
    )
    return (
        out.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= n_terms)
        .select("query_id", "term", "fg_df", "bg_df", "score", "rank")
    )


def substring_search_from_index(cat, patterns: DataFrame) -> DataFrame:
    """Index-served substring search over the persisted trigram index
    (plans.index_build.build_trigram_index): candidate generation prunes
    the trigram table on the patterns' trigram BUCKETS (parquet partition
    pruning) before the conjunctive-coverage join; exact ``instr``
    verification reads the stored lowercased text (doc_text) for
    CANDIDATE rows only — the pg_trgm index-then-heap-fetch shape with
    the heap inside the catalog. Output: (query_id, doc_id, doc_int)."""
    from ..sources.catalog import trigram_bucket

    spark = cat.spark
    st = cat.read_manifest().get("stages", {}).get("trigrams")
    if not st or not st.get("completed"):
        raise ValueError(
            f"catalog at {cat.root} has no trigram index — run "
            "plans.index_build.build_trigram_index first"
        )
    n_buckets = int(st.get("metrics", {}).get("trigram_buckets", 16))
    # bounded planning collect: the pattern relation is tiny by contract
    pats = [
        (r["query_id"], (r["text"] or "").lower())
        for r in patterns.select("query_id", "text").collect()
    ]
    long_rows = []
    for qid, p in pats:
        if len(p) >= 3:
            tris = sorted({p[i : i + 3] for i in range(len(p) - 2)})
            for t in tris:
                long_rows.append((qid, p, t, len(tris)))
    short_rows = [(qid, p) for qid, p in pats if 0 < len(p) < 3]

    doc_text = cat.read("doc_text")
    parts = []
    if long_rows:
        ptri = spark.createDataFrame(
            long_rows, "query_id string, _pat string, trigram string, _n_tri int"
        )
        buckets = sorted(
            {
                r["b"]
                for r in ptri.select(
                    trigram_bucket("trigram", n_buckets).alias("b")
                ).collect()
            }
        )
        cand = (
            cat.read("trigrams")
            .filter(F.col("bucket").isin(buckets))
            .join(F.broadcast(ptri), "trigram")
            .groupBy("query_id", "_pat", "_n_tri", "doc_int")
            .agg(F.count(F.lit(1)).alias("_n_hit"))
            .filter(F.col("_n_hit") == F.col("_n_tri"))
            .select("query_id", "_pat", "doc_int")
        )
        parts.append(
            cand.join(doc_text, "doc_int")
            .filter(F.instr(F.col("text"), F.col("_pat")) > 0)
            .select("query_id", "doc_int")
        )
    if short_rows:
        sdf = spark.createDataFrame(short_rows, "query_id string, _pat string")
        parts.append(
            doc_text.crossJoin(F.broadcast(sdf))
            .filter(F.instr(F.col("text"), F.col("_pat")) > 0)
            .select("query_id", "doc_int")
        )
    if not parts:
        return spark.createDataFrame(
            [], "query_id string, doc_id string, doc_int long"
        )
    un = parts[0]
    for p in parts[1:]:
        un = un.unionByName(p)
    return _with_string_ids(cat, un).select("query_id", "doc_id", "doc_int")


def rrf_fusion(
    rankings: list[DataFrame], k: int = 20, c: int = 60
) -> DataFrame:
    """(query_id, doc_id, rrf_score, n_systems, rank) — reciprocal-rank
    fusion (Cormack, Clarke & Buettcher, SIGIR 2009): score(d) =
    sum over systems of 1 / (c + rank_sys(d)), c = 60 per the paper.

    THE merge step of hybrid search (lexical BM25 x embedding ANN):
    fusing in rank space needs no score calibration between systems
    whose score scales are incomparable. Each input relation must carry
    (query_id, doc_id, rank); docs missing from a system simply
    contribute nothing for it (the standard convention).

    Scale shape: a unionAll of already-truncated top-k relations
    (#queries x k rows each), one hash agg, one per-query window —
    every input is post-truncation, so fusion cost is independent of
    corpus size."""
    if not rankings:
        raise ValueError("rrf_fusion needs at least one ranking")
    parts = [
        r.select(
            "query_id",
            "doc_id",
            (F.lit(1.0) / (F.lit(float(c)) + F.col("rank").cast("double"))).alias(
                "rrf"
            ),
        )
        for r in rankings
    ]
    un = parts[0]
    for p in parts[1:]:
        un = un.unionByName(p)
    scored = un.groupBy("query_id", "doc_id").agg(
        F.sum("rrf").alias("rrf_score"),
        F.count(F.lit(1)).cast("int").alias("n_systems"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("rrf_score", 6)), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rrf_score", "n_systems", "rank")
    )


# ---------------------------------------------------------------------------
# Recency decay, neighbor-turn context, sparse tf-idf similarity
# ---------------------------------------------------------------------------


def recency_decay_topk(
    scored: DataFrame,
    doc_ts: DataFrame,
    origin: str,
    half_life_s: float,
    k: int = 20,
    score_col: str = "bm25",
    ts_col: str = "ts",
) -> DataFrame:
    """Elasticsearch-style ``function_score`` exponential recency decay:
    blended = score * exp(ln(0.5) * age / half_life), age in seconds from
    ``origin`` (docs newer than origin clamp to age 0 — no future boost).

    The multiplicative-decay twin of blended_topk's additive prior: where
    PageRank blending ADDS a static quality prior, time decay SCALES the
    lexical score so staleness can never be outvoted by a huge BM25 hit
    alone — the standard shape for ranking agent transcripts where recent
    turns matter (reference stores a timestamp per example it never uses
    in ranking; this is the consumer).

    Same scale shape as blended_topk: one doc_id equi-join of the scored
    candidates against the (doc_id, ts) relation (broadcastable when the
    candidate set is post-truncation, shuffle-on-doc_id otherwise), a
    codegen projection, one per-query WindowGroupLimit top-k."""
    age = F.greatest(
        F.lit(0.0),
        F.lit(origin).cast("timestamp").cast("double")
        - F.col("_ts").cast("double"),
    )
    decay = F.exp(F.lit(_LN_HALF / float(half_life_s)) * age)
    out = (
        scored.join(doc_ts.select("doc_id", F.col(ts_col).alias("_ts")), "doc_id")
        .withColumn("decay", decay)
        .withColumn("blended", F.col(score_col) * F.col("decay"))
        .drop("_ts")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("blended"), F.asc("doc_id"))
    return out.withColumn("rank", F.row_number().over(w).cast("int")).filter(
        F.col("rank") <= k
    )


_LN_HALF = -0.6931471805599453  # ln(0.5), exact double


def with_neighbor_turns(
    topk_df: DataFrame,
    transcripts: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    text_col: str = "text",
) -> DataFrame:
    """Attach the previous and next turn's text to an already-truncated
    top-k of transcript turns — the "show the match in context" serving
    shape for conversation search (a result turn is rarely useful without
    the turn that prompted it).

    Scale shape: the top-k relation is #queries x k rows — but a LEFT
    join with the tiny relation on the left cannot broadcast (Spark's
    BroadcastHashJoin only builds the RIGHT side of a left-outer join,
    and the right side here is the corpus), so the naive join would
    shuffle the whole transcript table to enrich k rows. Instead the
    corpus is first INNER-joined against the broadcast key set (BHJ
    BuildRight: the corpus streams map-side, zero exchange), which
    bounds the neighbor relation at <= 2k rows; the left joins then run
    tiny-vs-tiny. Never a window over the full corpus either (a global
    lag/lead would sort every conversation)."""
    t = transcripts.select(
        F.col(conv_col).alias("_c"),
        F.col(turn_col).alias("_t"),
        F.col(text_col).alias("_txt"),
    )
    base = topk_df.withColumn("_c", F.col(conv_col)).withColumn(
        "_tt", F.col(turn_col)
    )
    keys = base.select("_c", "_tt")
    prev = (
        t.select(
            F.col("_c"), (F.col("_t") + 1).alias("_tt"),
            F.col("_txt").alias("prev_text"),
        )
        .join(F.broadcast(keys), ["_c", "_tt"])
    )
    nxt = (
        t.select(
            F.col("_c"), (F.col("_t") - 1).alias("_tt"),
            F.col("_txt").alias("next_text"),
        )
        .join(F.broadcast(keys), ["_c", "_tt"])
    )
    return (
        base.join(F.broadcast(prev), ["_c", "_tt"], "left")
        .join(F.broadcast(nxt), ["_c", "_tt"], "left")
        .drop("_c", "_tt")
    )


def _tfidf_weights(dtf: DataFrame, stats: DataFrame) -> DataFrame:
    """(doc_id, term, w) with w = tf * ln(N / (df + 1)) — the engine's own
    idf convention (A3, negative idf allowed) so sparse similarity and
    BM25 agree on what a rare term is."""
    df_rel = dtf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return (
        dtf.join(df_rel, "term")
        .crossJoin(F.broadcast(stats.select("doc_count")))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf").cast("double")
                * F.log(
                    F.col("doc_count").cast("double")
                    / (F.col("df") + F.lit(1)).cast("double")
                )
            ).alias("w"),
        )
    )


def _sparse_cosine_topk(
    weights: DataFrame,
    source_ids: list[int],
    k: int,
    norms: DataFrame | None = None,
) -> DataFrame:
    """Shared core: cosine over sparse tf-idf vectors via a term equi-join
    against the source docs' rows. The source side is |sources| docs'
    terms — broadcast — so the corpus side is ONE postings-shaped scan +
    one (src, doc) hash agg; nothing quadratic in the corpus. Pass a
    precomputed ``norms`` (doc_id, norm) relation to skip the corpus-wide
    norm aggregate (the persisted ``docnorms`` build stage)."""
    if norms is None:
        norms = weights.groupBy("doc_id").agg(
            F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm")
        )
    src_w = weights.filter(F.col("doc_id").isin(source_ids)).select(
        F.col("doc_id").alias("src_id"), "term", F.col("w").alias("sw")
    )
    dots = (
        weights.join(F.broadcast(src_w), "term")
        .filter(F.col("doc_id") != F.col("src_id"))
        .groupBy("src_id", "doc_id")
        .agg(F.sum(F.col("w") * F.col("sw")).alias("dot"))
    )
    out = (
        dots.join(norms, "doc_id")
        .join(
            F.broadcast(
                norms.filter(F.col("doc_id").isin(source_ids)).select(
                    F.col("doc_id").alias("src_id"), F.col("norm").alias("src_norm")
                )
            ),
            "src_id",
        )
        .filter((F.col("norm") > 0) & (F.col("src_norm") > 0))
        .select(
            "src_id",
            "doc_id",
            (F.col("dot") / (F.col("norm") * F.col("src_norm"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("src_id").orderBy(
        F.desc(F.round("cosine", 6)), F.asc("doc_id")
    )
    return out.withColumn("rank", F.row_number().over(w).cast("int")).filter(
        F.col("rank") <= k
    )


def similar_docs_sparse(
    docs: DataFrame,
    source_ids: list[int],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(src_id, doc_id, cosine, rank) — top-k nearest docs to each source
    doc under sparse tf-idf cosine (the inverted-index-native similarity,
    complementary to the embedding ANN in operators/similarity.py: no
    model, exact, vocabulary-interpretable).

    Differs from more_like_this: MLT truncates the source to its top
    tf-idf terms and re-scores with BM25 (a retrieval query); this is the
    EXACT cosine over full sparse vectors (a similarity metric) — the
    "related documents" panel vs the "more like this" search."""
    dtf = scorer.doc_term_frequencies(docs, id_col, text_col)
    stats = scorer.corpus_stats(scorer.doc_lengths(docs, id_col, text_col))
    return _sparse_cosine_topk(_tfidf_weights(dtf, stats), source_ids, k)


def similar_docs_from_index(
    cat, source_doc_ids: list[str], k: int = 10
) -> DataFrame:
    """Index-backed twin of similar_docs_sparse: postings supply (doc, term,
    tf), the persisted terms table supplies df, the manifest's corpus
    stats supply N — zero raw-text re-aggregation per call. Norms come
    from the persisted ``docnorms`` table when the optional
    plans.index_build.build_docnorm_index stage ran (one corpus-wide
    aggregate paid at build time, not per call); otherwise they fall back
    to an O(postings) aggregate in-plan.

    ``source_doc_ids`` are catalog doc_id strings; resolving them to the
    index's dense doc_int (and the results back) is two doc_meta joins —
    the source side a bounded planning collect (it is the user's own
    source list)."""
    doc_count, _ = cat.scalar_stats()
    meta = cat.doc_meta().select("doc_int", "doc_id")
    src_ints = [
        r.doc_int
        for r in meta.filter(F.col("doc_id").isin(source_doc_ids)).collect()
    ]
    post = cat.postings().select(
        F.col("doc_int").alias("doc_id"), "term", "tf"
    )
    terms = cat.terms().select("term", "df")
    weights = post.join(terms, "term").select(
        "doc_id",
        "term",
        (
            F.col("tf").cast("double")
            * F.log(
                F.lit(float(doc_count)) / (F.col("df") + F.lit(1)).cast("double")
            )
        ).alias("w"),
    )
    norms = None
    if cat.stage_complete("docnorms"):
        norms = cat.read("docnorms").select(
            F.col("doc_int").alias("doc_id"), "norm"
        )
    ranked = _sparse_cosine_topk(weights, src_ints, k, norms=norms)
    return (
        ranked.withColumnRenamed("doc_id", "doc_int")
        .join(meta, "doc_int")
        .drop("doc_int")
        .join(
            F.broadcast(
                meta.select(
                    F.col("doc_int").alias("src_id"),
                    F.col("doc_id").alias("src_doc_id"),
                )
            ),
            "src_id",
        )
        .select(
            F.col("src_doc_id").alias("src_id"), "doc_id", "cosine", "rank"
        )
    )


# ---------------------------------------------------------------------------
# Wildcard (trailing-*) prefix queries — Lucene PrefixQuery analog
# ---------------------------------------------------------------------------


def wildcard_term_matches(
    vocab: DataFrame, patterns: DataFrame, max_expansions: int = 64
) -> DataFrame:
    """(query_id, term): vocabulary expansions of trailing-* prefixes.

    ``vocab`` is (term, df); ``patterns`` is (query_id, pattern) with the
    '*' already stripped. Each pattern expands to its top
    ``max_expansions`` matching terms by (df desc, term asc) — Lucene's
    TopTermsBlendedFreqScoringRewrite cap, which keeps a head pattern
    like 's*' from turning into a million-term disjunction at real
    vocabulary sizes. The probe is a broadcast join against the tiny
    pattern side keyed on substring(term, 1, len(pattern)), same shape
    as suggest_terms."""
    pats = patterns.select(
        "query_id",
        F.col("pattern").alias("_pat"),
        F.length("pattern").alias("_plen"),
    )
    w = Window.partitionBy("query_id", "_pat").orderBy(
        F.desc("df"), F.asc("term")
    )
    return (
        vocab.join(
            F.broadcast(pats),
            F.expr("substring(term, 1, _plen)") == F.col("_pat"),
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_expansions)
        .select("query_id", "term")
    )


def _split_wildcards(queries: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Query tokens -> (literal (query_id, term), pattern (query_id,
    pattern)) relations; a pattern is a token with a trailing '*' and a
    non-empty prefix (a bare '*' is dropped, matching nothing)."""
    occ = scorer.query_term_occurrences(queries)
    is_pat = F.col("term").endswith("*") & (F.length("term") > 1)
    lits = occ.filter(~F.col("term").endswith("*")).select("query_id", "term")
    pats = occ.filter(is_pat).select(
        "query_id",
        F.expr("substring(term, 1, length(term) - 1)").alias("pattern"),
    )
    return lits.distinct(), pats.distinct()


def wildcard_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 20,
    max_expansions: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 top-k for queries mixing literal terms and trailing-*
    prefix patterns ('qu* join s*').

    Patterns expand against the corpus vocabulary
    (``wildcard_term_matches``); the union of literals and expansions is
    deduplicated (each term scores with multiplicity 1 and its OWN idf —
    the fuzzy_topk convention) and ranked through the unchanged exact
    BM25 path. Patterns with no vocabulary match and literals absent
    from the corpus drop out via the standard missing-idf skip."""
    dtf = scorer.doc_term_frequencies(docs, id_col, text_col)
    dlen = scorer.doc_lengths(docs, id_col, text_col)
    vocab = dtf.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    lits, pats = _split_wildcards(queries)
    expanded = wildcard_term_matches(vocab, pats, max_expansions)
    wq = (
        lits.unionByName(expanded)
        .groupBy("query_id")
        .agg(F.concat_ws(" ", F.sort_array(F.collect_set("term"))).alias("text"))
    )
    scored = scorer.score_candidates(dtf, dlen, scorer.corpus_stats(dlen), wq)
    return scorer.topk(scored.select("query_id", "doc_id", "bm25"), k)


def wildcard_topk_from_index(
    cat, queries: DataFrame, k: int = 20, max_expansions: int = 64
) -> DataFrame:
    """Index-served wildcard retrieval: expansion probes the PERSISTED
    (term, df) dictionary — zero query-time vocabulary aggregation — and
    the expanded disjunction scores through the pruned-postings exact
    path. Output matches query_exact.rank_from_index."""
    from .query_exact import rank_from_index

    lits, pats = _split_wildcards(queries)
    expanded = wildcard_term_matches(
        cat.terms().select("term", "df"), pats, max_expansions
    )
    wq = (
        lits.unionByName(expanded)
        .groupBy("query_id")
        .agg(F.concat_ws(" ", F.sort_array(F.collect_set("term"))).alias("text"))
    )
    return rank_from_index(cat, wq, k=k)


# ---------------------------------------------------------------------------
# Rocchio explicit relevance feedback (Rocchio 1971, SMART)
# ---------------------------------------------------------------------------


def rocchio_weights(
    doc_tf: DataFrame,
    stats: DataFrame,
    queries: DataFrame,
    qrels: DataFrame,
    alpha: float = 1.0,
    beta: float = 0.75,
    gamma: float = 0.15,
    n_terms: int = 10,
) -> DataFrame:
    """(query_id, term, w): the top-``n_terms`` positive Rocchio weights.

    Classic tf-idf-space Rocchio: q' = alpha*q + beta*centroid(R) -
    gamma*centroid(NR) over JUDGED docs (``qrels``: query_id, doc_id,
    label 1/0). Since tfidf(t,d) = tf * idf(t), the vector factors as
        w(t) = idf(t) * (alpha*q_tf(t)
                         + beta * sum_R tf / |R| - gamma * sum_NR tf / |NR|)
    so idf is computed once per term. Terms absent from the corpus have
    no idf and drop out (the missing-idf skip). Weights are 6-dp-rounded
    BEFORE the (w desc, term asc) top-n cut so tie-breaks are portable.

    Scale shape: the judged-doc set is tiny and broadcasts; its term
    profile is one semi-join against doc_tf, idf covers only
    query+feedback terms, and the output is <= |queries| * n_terms rows.
    """
    q_tf = (
        scorer.query_term_occurrences(queries)
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("q_tf"))
    )
    sizes = (
        qrels.groupBy("query_id")
        .agg(
            F.sum(F.when(F.col("label") == 1, 1).otherwise(0)).alias("n_rel"),
            F.sum(F.when(F.col("label") == 0, 1).otherwise(0)).alias("n_nonrel"),
        )
    )
    fb = (
        doc_tf.join(F.broadcast(qrels), "doc_id")
        .groupBy("query_id", "term")
        .agg(
            F.sum(F.when(F.col("label") == 1, F.col("tf")).otherwise(0))
            .cast("double")
            .alias("rel_tf"),
            F.sum(F.when(F.col("label") == 0, F.col("tf")).otherwise(0))
            .cast("double")
            .alias("nonrel_tf"),
        )
    )
    vec = (
        q_tf.join(fb, ["query_id", "term"], "full")
        .join(F.broadcast(sizes), "query_id", "left")
        .select(
            "query_id",
            "term",
            (
                F.lit(alpha) * F.coalesce("q_tf", F.lit(0.0))
                + F.when(
                    F.col("n_rel") > 0,
                    F.lit(beta) * F.coalesce("rel_tf", F.lit(0.0)) / F.col("n_rel"),
                ).otherwise(F.lit(0.0))
                - F.when(
                    F.col("n_nonrel") > 0,
                    F.lit(gamma)
                    * F.coalesce("nonrel_tf", F.lit(0.0))
                    / F.col("n_nonrel"),
                ).otherwise(F.lit(0.0))
            ).alias("tf_part"),
        )
    )
    idf = scorer.term_idf(doc_tf, stats, terms=vec.select("term").distinct())
    w = Window.partitionBy("query_id").orderBy(F.desc("w"), F.asc("term"))
    return (
        vec.join(F.broadcast(idf.select("term", "idf")), "term")
        .select(
            "query_id",
            "term",
            F.round(F.col("tf_part") * F.col("idf"), 6).alias("w"),
        )
        .filter(F.col("w") > 0)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_terms)
        .select("query_id", "term", "w")
    )


def rocchio_topk(
    docs: DataFrame,
    queries: DataFrame,
    qrels: DataFrame,
    alpha: float = 1.0,
    beta: float = 0.75,
    gamma: float = 0.15,
    n_terms: int = 10,
    k: int = 20,
) -> DataFrame:
    """(query_id, doc_id, score, rank): weighted-BM25 retrieval with the
    Rocchio-expanded query — each expanded term contributes
    w(t) * bm25_term(t, d) (the query_language boost semantics with
    continuous weights). Candidates = docs matching >= 1 expanded term."""
    dtf = scorer.doc_term_frequencies(docs)
    dlen = scorer.doc_lengths(docs)
    stats = scorer.corpus_stats(dlen)
    wts = rocchio_weights(
        dtf, stats, queries, qrels, alpha, beta, gamma, n_terms
    )
    idf = scorer.term_idf(dtf, stats, terms=wts.select("term").distinct())
    scored = (
        wts.join(F.broadcast(idf.select("term", "idf")), "term")
        .join(dtf, "term")
        .join(dlen, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            (
                F.col("w")
                * F.col("idf")
                * (F.col("tf") * F.lit(K1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(K1)
                    * (
                        F.lit(1.0 - B)
                        + F.lit(B)
                        * (F.col("doc_length") / F.col("avg_doc_length"))
                    )
                )
            ).alias("c"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("c"), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


# ---------------------------------------------------------------------------
# search_after pagination (Elasticsearch deep-paging cursor)
# ---------------------------------------------------------------------------


def search_after_topk(
    docs: DataFrame,
    queries: DataFrame,
    cursors: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, doc_id, bm25, rank): the next ``k`` hits strictly after
    a (score, doc_id) cursor in the engine's total order (bm25 6-dp desc,
    doc_id asc).

    ``cursors`` is (query_id, after_score, after_doc) — the last hit of
    the previous page, score already 6-dp rounded; queries without a
    cursor row page from the top. Unlike offset paging (whose window must
    rank offset+k rows per query), the cursor predicate is a plain filter
    on the scored relation — candidates at or above the cursor fall out
    BEFORE the rank window, so page depth never grows the window input.
    ``rank`` restarts at 1 within the page."""
    dlen = scorer.doc_lengths(docs, id_col, text_col)
    scored = scorer.score_candidates(
        scorer.doc_term_frequencies(docs, id_col, text_col),
        dlen,
        scorer.corpus_stats(dlen),
        queries,
    ).select("query_id", "doc_id", F.round("bm25", 6).alias("bm25"))
    j = scored.join(F.broadcast(cursors), "query_id", "left")
    after = (
        F.col("after_score").isNull()
        | (F.col("bm25") < F.col("after_score"))
        | ((F.col("bm25") == F.col("after_score")) & (F.col("doc_id") > F.col("after_doc")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("bm25"), F.asc("doc_id"))
    return (
        j.filter(after)
        .select("query_id", "doc_id", "bm25")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# Regexp term queries — Lucene RegexpQuery analog
# ---------------------------------------------------------------------------


def regexp_term_matches(
    vocab: DataFrame, patterns: DataFrame, max_expansions: int = 64
) -> DataFrame:
    """(query_id, term): vocabulary terms whose WHOLE text matches the
    pattern (Lucene RegexpQuery is implicitly anchored), capped at the
    top ``max_expansions`` by (df desc, term asc) like the wildcard
    rewrite. Patterns must stay in the Java/RE2-common regex subset
    (classes, alternation, quantifiers — no backrefs/lookaround), the
    same portability rule the PII patterns follow."""
    pats = patterns.select("query_id", F.col("pattern").alias("_pat"))
    w = Window.partitionBy("query_id", "_pat").orderBy(
        F.desc("df"), F.asc("term")
    )
    return (
        vocab.crossJoin(F.broadcast(pats))
        .filter(
            F.regexp_like(
                F.col("term"), F.concat(F.lit("^("), F.col("_pat"), F.lit(")$"))
            )
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_expansions)
        .select("query_id", "term")
    )


def regexp_topk(
    docs: DataFrame,
    patterns: DataFrame,
    k: int = 20,
    max_expansions: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 top-k for regexp term queries: each (query_id, pattern) row
    expands against the corpus vocabulary and the per-query expansion
    union scores as a plain BM25 disjunction (multiplicity 1, own idf —
    the wildcard/fuzzy convention). The vocabulary scan is one agg; the
    regex probe touches vocab x patterns rows, never postings."""
    dtf = scorer.doc_term_frequencies(docs, id_col, text_col)
    dlen = scorer.doc_lengths(docs, id_col, text_col)
    vocab = dtf.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    matched = regexp_term_matches(vocab, patterns, max_expansions)
    rq = matched.groupBy("query_id").agg(
        F.concat_ws(" ", F.sort_array(F.collect_set("term"))).alias("text")
    )
    scored = scorer.score_candidates(dtf, dlen, scorer.corpus_stats(dlen), rq)
    return scorer.topk(scored.select("query_id", "doc_id", "bm25"), k)


# ---------------------------------------------------------------------------
# Spell suggestion (ES term suggester) and percolation (reverse search)
# ---------------------------------------------------------------------------


def spell_suggest(
    docs: DataFrame,
    terms: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, qterm, term, dist, df, rank): top-n corrections of each
    input term from the corpus vocabulary — candidates within Levenshtein
    1 via the SymSpell deletion-neighborhood join (fuzzy_term_matches),
    ranked the way term suggesters do: closer first, then more frequent,
    then lexicographic. Exact matches rank first (dist 0) — callers
    typically suggest only when the input term itself has low/zero df."""
    vocab = (
        scorer.doc_term_frequencies(docs, id_col, text_col)
        .groupBy("term")
        .agg(F.count_distinct("doc_id").alias("df"))
    )
    m = fuzzy_term_matches(vocab.select("term"), terms)
    w = Window.partitionBy("query_id", "qterm").orderBy(
        F.asc("dist"), F.desc("df"), F.asc("term")
    )
    return (
        m.join(vocab, "term")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
        .select("query_id", "qterm", "term", "dist", "df", "rank")
    )


def percolate(
    docs: DataFrame,
    stored_queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, query_id): which STORED queries match each incoming doc —
    Elasticsearch's percolator, the alerting/routing primitive (saved
    searches over a document stream). Match semantics: conjunctive —
    every distinct term of the stored query occurs in the doc.

    Scale shape: the stored-query registry is bounded (it broadcasts);
    incoming docs contribute their DISTINCT terms once; the (doc, query)
    match count aggregates with map-side combine. Works identically on a
    micro-batch of a streaming ingest (docs = the batch)."""
    qterms = (
        scorer.query_term_occurrences(stored_queries)
        .select("query_id", "term")
        .distinct()
    )
    need = qterms.groupBy("query_id").agg(F.count(F.lit(1)).alias("_need"))
    doc_terms = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.array_distinct(tokens_col(text_col))).alias("term"),
        )
    )
    hits = (
        doc_terms.join(F.broadcast(qterms), "term")
        .groupBy("doc_id", "query_id")
        .agg(F.count(F.lit(1)).alias("_got"))
    )
    return (
        hits.join(F.broadcast(need), "query_id")
        .filter(F.col("_got") == F.col("_need"))
        .select("doc_id", "query_id")
    )


# ---------------------------------------------------------------------------
# Query-time synonym expansion (Lucene SynonymGraphFilter, query side)
# ---------------------------------------------------------------------------


def synonym_topk(
    docs: DataFrame,
    queries: DataFrame,
    synonyms: DataFrame,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 top-k with query-side synonym expansion: every query term
    pulls in its synonym-group siblings (``synonyms``: (term, syn) rows,
    direction as given — pass both directions for symmetric thesauri),
    and the union scores as a multiplicity-1 disjunction with each term's
    own idf (the fuzzy/wildcard expansion convention; Lucene's query-time
    SynonymQuery differs only in blending df across the group).

    The thesaurus is vocabulary-shaped — it broadcasts; expansion never
    touches postings."""
    dtf = scorer.doc_term_frequencies(docs, id_col, text_col)
    dlen = scorer.doc_lengths(docs, id_col, text_col)
    qterms = (
        scorer.query_term_occurrences(queries).select("query_id", "term").distinct()
    )
    expanded = qterms.unionByName(
        qterms.join(F.broadcast(synonyms), "term").select(
            "query_id", F.col("syn").alias("term")
        )
    )
    sq = expanded.groupBy("query_id").agg(
        F.concat_ws(" ", F.sort_array(F.collect_set("term"))).alias("text")
    )
    scored = scorer.score_candidates(dtf, dlen, scorer.corpus_stats(dlen), sq)
    return scorer.topk(scored.select("query_id", "doc_id", "bm25"), k)


# ---------------------------------------------------------------------------
# Duplicate-collapsed search (field-collapse on content identity)
# ---------------------------------------------------------------------------


def collapsed_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 top-k where exact-content duplicates collapse to their
    cluster canonical (min doc_id): the search-result face of the dedup
    family — a corpus crawled at 100 TB serves every page once, not once
    per mirror. Non-canonical cluster members are removed by ONE
    left_anti join on the scored relation (content identity via the
    portable 60-bit hash, operators/dedup.py); ranks re-number over the
    survivors. Identical scores to plain BM25 for every survivor —
    collapse filters, never rescores."""
    from . import dedup

    dups = dedup.exact_duplicates(docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")))
    losers = dups.filter(F.col("doc_id") != F.col("canonical_id")).select("doc_id")
    dlen = scorer.doc_lengths(docs, id_col, text_col)
    scored = scorer.score_candidates(
        scorer.doc_term_frequencies(docs, id_col, text_col),
        dlen,
        scorer.corpus_stats(dlen),
        queries,
    ).select("query_id", "doc_id", "bm25")
    kept = scored.join(losers, "doc_id", "left_anti")
    return scorer.topk(kept, k)


# ---------------------------------------------------------------------------
# dis_max multi-field query (Elasticsearch dis_max / best_fields multi_match)
# ---------------------------------------------------------------------------


def dis_max_score(
    fields: list[tuple[str, DataFrame, DataFrame]],
    queries: DataFrame,
    tie_breaker: float = 0.3,
) -> DataFrame:
    """Disjunction-max over independently scored fields: each field leg
    is the UNCHANGED exact BM25 scorer run against that field's own
    (doc_tf, doc_len) relations — its own df / doc_count / avgdl — and
    the per-(query, doc) combination is Lucene DisjunctionMaxQuery:

        score = max_f s_f + tie_breaker * (sum_f s_f - max_f s_f)

    A doc matching in no field has no leg row and is absent (dis_max
    candidates = union of per-field candidate sets). `fields` is a list
    of (name, doc_tf, doc_len); the name is carried only for debugging.

    100-TB notes: each leg keeps the exact scorer's plan (broadcast
    query terms + stats, one candidate shuffle); the combine is one hash
    agg on (query_id, doc_id) over the unioned post-scoring legs, whose
    size is bounded by sum of candidate sets — no cross product, no
    second scoring kernel.
    """
    from functools import reduce

    legs = []
    for _name, dtf, dlen in fields:
        s = scorer.score_candidates(
            dtf, dlen, scorer.corpus_stats(dlen), queries
        ).select("query_id", "doc_id", F.col("bm25").alias("s"))
        legs.append(s)
    u = reduce(lambda a, b: a.unionByName(b), legs)
    mx = F.max("s")
    return (
        u.groupBy("query_id", "doc_id")
        .agg(
            (mx + F.lit(tie_breaker) * (F.sum("s") - mx)).alias("score"),
        )
    )


def dis_max_topk(
    fields: list[tuple[str, DataFrame, DataFrame]],
    queries: DataFrame,
    k: int,
    tie_breaker: float = 0.3,
) -> DataFrame:
    """Per-query top-k of dis_max_score (6-dp rounding, doc_id asc ties)."""
    scored = dis_max_score(fields, queries, tie_breaker)
    return scorer.topk(
        scored.select(
            "query_id", "doc_id", F.round("score", 6).alias("bm25")
        ),
        k,
    ).select("query_id", "doc_id", F.col("bm25").alias("score"), "rank")


# ---------------------------------------------------------------------------
# Facet top-hits and range facets (ES top_hits / range aggregations)
# ---------------------------------------------------------------------------


def facet_top_hits(
    docs: DataFrame,
    queries: DataFrame,
    facet_col: str,
    k_per_bucket: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ES `top_hits` inside a terms aggregation: per (query, facet value),
    the top-k_per_bucket candidate docs by exact BM25.

    (query_id, value, doc_id, bm25, bucket_rank). Scoring is the
    UNCHANGED exact path over the full disjunctive candidate set; the
    only addition is one metadata join to attach the facet value and a
    rank window partitioned by (query_id, value) instead of query_id —
    Spark >= 3.5 still pushes the per-partition limit into the sort
    (WindowGroupLimit), so no bucket ever materializes a full sort.
    """
    dtf = scorer.doc_term_frequencies(docs, id_col, text_col)
    dlen = scorer.doc_lengths(docs, id_col, text_col)
    scored = scorer.score_candidates(
        dtf, dlen, scorer.corpus_stats(dlen), queries
    ).select("query_id", "doc_id", F.round("bm25", 6).alias("bm25"))
    meta = scored.join(
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(facet_col).cast("string").alias("value"),
        ),
        "doc_id",
    )
    w = Window.partitionBy("query_id", "value").orderBy(
        F.desc("bm25"), F.asc("doc_id")
    )
    return (
        meta.withColumn("bucket_rank", F.row_number().over(w))
        .filter(F.col("bucket_rank") <= k_per_bucket)
        .select("query_id", "value", "doc_id", "bm25", "bucket_rank")
    )


def range_facet_counts(
    docs: DataFrame,
    queries: DataFrame,
    range_col: str,
    bounds: list[float],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ES `range` aggregation over the candidate set: buckets are
    [-inf, b0), [b0, b1), ..., [b_{n-1}, +inf) — from inclusive, to
    exclusive, exactly ES's convention. Returns (query_id, bucket_idx,
    lo, hi, n_docs) with NULL lo/hi on the open ends; empty buckets are
    emitted with n_docs = 0 (ES keeps them), via a literal bucket frame
    cross-joined per query.

    The bucket index is computed map-side with one CASE chain (bounds
    are a query-time literal list), so the agg input is already
    (query_id, bucket) pairs — #distinct keys <= queries x buckets.
    """
    dtf = scorer.doc_term_frequencies(docs, id_col, text_col)
    qterms = (
        scorer.query_term_occurrences(queries)
        .select("query_id", "term")
        .distinct()
    )
    cand = (
        dtf.select("term", "doc_id")
        .join(F.broadcast(qterms), "term")
        .select("query_id", "doc_id")
        .distinct()
    )
    meta = cand.join(
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(range_col).cast("double").alias("v"),
        ),
        "doc_id",
    )
    # bucket_idx = number of bounds <= v  (from-inclusive / to-exclusive)
    idx = F.lit(0)
    for b in bounds:
        idx = idx + F.when(F.col("v") >= F.lit(float(b)), 1).otherwise(0)
    got = (
        meta.select("query_id", idx.alias("bucket_idx"))
        .groupBy("query_id", "bucket_idx")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    ext = [None] + [float(b) for b in bounds] + [None]
    frame_rows = [
        (i, ext[i], ext[i + 1]) for i in range(len(bounds) + 1)
    ]
    spark = docs.sparkSession
    frame = spark.createDataFrame(
        frame_rows, "bucket_idx int, lo double, hi double"
    )
    qids = queries.select("query_id").distinct()
    full = qids.crossJoin(F.broadcast(frame))
    return (
        full.join(got, ["query_id", "bucket_idx"], "left")
        .select(
            "query_id",
            "bucket_idx",
            "lo",
            "hi",
            F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
        )
    )


# ---------------------------------------------------------------------------
# Phrase suggester with collation ("did you mean", ES phrase suggester)
# ---------------------------------------------------------------------------


def phrase_suggest(
    docs: DataFrame,
    terms: list[str],
    per_term: int = 3,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Whole-query correction: per-position spell candidates (Levenshtein
    <= 1 from the corpus vocabulary, the spell_suggest ranking) compose
    into candidate phrases, which are COLLATED — kept only if at least
    one document contains every corrected term (ES phrase suggester with
    `collate` + prune). Returns (suggestion, total_dist, lm_score,
    n_matching_docs, rank), ranked by fewest edits, then highest
    lm_score = sum ln(df+1) (a unigram stand-in for ES's word-gram LM),
    then suggestion asc. The identity phrase ranks first when every input
    term exists (dist 0).

    `terms` is the tokenized query — driver-side planning state, same
    convention as WAND query planning. Candidate composition is a fold
    of broadcast joins over per-position legs (per_term^len(terms) rows,
    both factors query-time literals); the corpus-scale work — the
    vocabulary df agg and the conjunctive collation probe — stays
    distributed: collation explodes candidate terms (bounded) against
    the postings relation and counts distinct matched terms per
    (candidate, doc), so no per-candidate corpus scan.
    """
    from functools import reduce

    spark = docs.sparkSession
    qdf = spark.createDataFrame(
        [("q", t) for t in sorted(set(terms))], "query_id string, term string"
    )
    sugg = spell_suggest(docs, qdf, n=per_term, id_col=id_col, text_col=text_col)
    legs = []
    for i, t in enumerate(terms):
        legs.append(
            sugg.filter(F.col("qterm") == t).select(
                F.col("term").alias(f"t{i}"),
                F.col("dist").alias(f"d{i}"),
                F.col("df").alias(f"f{i}"),
            )
        )
    combined = reduce(lambda a, b: a.crossJoin(F.broadcast(b)), legs)
    phrase = F.concat_ws(" ", *[F.col(f"t{i}") for i in range(len(terms))])
    total_dist = sum(F.col(f"d{i}") for i in range(len(terms)))
    lm = sum(F.log(F.col(f"f{i}") + F.lit(1.0)) for i in range(len(terms)))
    cands = combined.select(
        phrase.alias("suggestion"),
        total_dist.cast("int").alias("total_dist"),
        F.round(lm, 6).alias("lm_score"),
    )
    # collation: >=1 doc containing ALL distinct terms of the suggestion
    cterms = cands.select(
        "suggestion", F.explode(F.split("suggestion", " ")).alias("term")
    ).distinct()
    need = cterms.groupBy("suggestion").agg(
        F.count(F.lit(1)).alias("n_need")
    )
    dtf = scorer.doc_term_frequencies(docs, id_col, text_col)
    hits = (
        dtf.join(F.broadcast(cterms), "term")
        .groupBy("suggestion", "doc_id")
        .agg(F.count_distinct("term").alias("n_have"))
    )
    collated = (
        hits.join(F.broadcast(need), "suggestion")
        .filter(F.col("n_have") == F.col("n_need"))
        .groupBy("suggestion")
        .agg(F.count(F.lit(1)).alias("n_matching_docs"))
    )
    w = Window.orderBy(
        F.asc("total_dist"), F.desc("lm_score"), F.asc("suggestion")
    )
    return (
        cands.join(collated, "suggestion")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
        .select("suggestion", "total_dist", "lm_score", "n_matching_docs", "rank")
    )


def common_terms_topk(
    docs: DataFrame,
    queries: DataFrame,
    cutoff_frequency: float = 0.5,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, doc_id, bm25, rank) — Lucene ``CommonTermsQuery``
    semantics (the pre-BM25-era stopword killer, still the cheapest
    recall/cost knob on high-df terms): query terms are split by
    document frequency at ``cutoff_frequency * doc_count``; documents
    must match at least one LOW-frequency (rare) term to become
    candidates, while high-frequency (common) terms contribute to the
    BM25 score but cannot admit a document alone. When the query has no
    rare matching term at all, the gate degenerates to the plain
    any-term disjunction (Lucene's fallback when all terms are common).

    Scoring is the exact A7 BM25 over ALL query terms on the gated
    candidate set — same multiplicity and missing-idf-skip semantics as
    bm25_topk (reference features.go:127-129, features_test.go:498-513).

    Scale shape: the rare/common split is a per-term relation (bounded
    by #distinct query terms) computed from the same doc_tf stream the
    scorer aggregates — no extra corpus scan; the "no rare term"
    fallback folds in as a 1-row n_rare broadcast so the whole plan
    stays data-independent (no driver-side branching on df values). The
    candidate gate is one broadcast semi-join against the scored
    relation — at 10^12 turns the gate REMOVES work (common-only docs
    never reach the top-k window)."""
    dtf = scorer.doc_term_frequencies(docs, id_col, text_col)
    dlen = scorer.doc_lengths(docs, id_col, text_col)
    stats = scorer.corpus_stats(dlen)
    scored = scorer.score_candidates(
        dtf, dlen, stats, queries.select("query_id", "text")
    ).select("query_id", "doc_id", "bm25")

    qterms = (
        scorer.query_term_occurrences(queries.select("query_id", "text"))
        .select("query_id", "term")
        .distinct()
    )
    # df of each query term over the corpus: filter-before-agg, so the
    # exchange carries only the query terms' postings.
    tdf = (
        dtf.join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("term")
        .agg(F.count_distinct("doc_id").alias("df"))
    )
    per_q = (
        qterms.join(tdf, "term", "left")
        .crossJoin(F.broadcast(stats.select("doc_count")))
        .select(
            "query_id",
            "term",
            (
                F.col("df").isNotNull()
                & (
                    F.col("df").cast("double")
                    < F.lit(float(cutoff_frequency)) * F.col("doc_count").cast("double")
                )
            ).alias("is_rare"),
        )
    )
    n_rare = per_q.groupBy("query_id").agg(
        F.sum(F.col("is_rare").cast("int")).alias("n_rare")
    )
    gate_terms = (
        per_q.join(F.broadcast(n_rare), "query_id")
        .filter(F.col("is_rare") | (F.col("n_rare") == 0))
        .select("query_id", "term")
    )
    admitted = (
        dtf.select("term", "doc_id")
        .join(F.broadcast(gate_terms), "term")
        .select("query_id", "doc_id")
        .distinct()
    )
    kept = scored.join(admitted, ["query_id", "doc_id"], "left_semi")
    return scorer.topk(kept, k)


def linear_fusion(
    legs: list[DataFrame],
    weights: list[float],
    k: int = 20,
) -> DataFrame:
    """(query_id, doc_id, fused, n_systems, rank) — convex score fusion
    of heterogeneous retrieval legs with per-leg min-max normalization:
    each leg's scores are rescaled to [0, 1] WITHIN its (query, leg)
    pool (a constant-score pool maps to 1.0), then combined as
    sum_i w_i * norm_i with a document missing from a leg contributing
    0 for it. This is the score-space sibling of rrf_fusion — the
    standard "alpha-blend" hybrid every vector store exposes
    (weights=[alpha, 1-alpha] over a BM25 leg and a cosine leg).

    Each leg must carry (query_id, doc_id, score). Scale shape: legs
    are post-truncation top-n pools (#queries x n rows), so per-leg
    min/max is a tiny hash agg broadcast back onto its leg; the union +
    fused agg + per-query window are all corpus-independent."""
    if not legs:
        raise ValueError("linear_fusion needs at least one leg")
    if len(legs) != len(weights):
        raise ValueError("one weight per leg")
    parts = []
    for w_i, leg in zip(weights, legs):
        pool = leg.select("query_id", "doc_id", F.col("score").cast("double").alias("s"))
        mm = pool.groupBy("query_id").agg(
            F.min("s").alias("lo"), F.max("s").alias("hi")
        )
        parts.append(
            pool.join(F.broadcast(mm), "query_id").select(
                "query_id",
                "doc_id",
                (
                    F.lit(float(w_i))
                    * F.when(F.col("hi") == F.col("lo"), F.lit(1.0)).otherwise(
                        (F.col("s") - F.col("lo")) / (F.col("hi") - F.col("lo"))
                    )
                ).alias("contrib"),
            )
        )
    un = parts[0]
    for p in parts[1:]:
        un = un.unionByName(p)
    fused = un.groupBy("query_id", "doc_id").agg(
        F.sum("contrib").alias("fused"),
        F.count(F.lit(1)).cast("int").alias("n_systems"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("fused", 6)), F.asc("doc_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "fused", "n_systems", "rank")
    )


def rank_feature_topk(
    scored: DataFrame,
    features: DataFrame,
    k: int = 20,
    boost: float = 1.0,
    mode: str = "saturation",
    pivot: float = 1.0,
    scaling_factor: float = 1.0,
    exponent: float = 1.0,
    score_col: str = "bm25",
    feature_col: str = "feature",
) -> DataFrame:
    """(query_id, doc_id, bm25, feature, blended, rank) — Elasticsearch's
    ``rank_feature`` query: a query-independent per-doc feature (PageRank,
    url_length, freshness) contributes a BOUNDED boost through one of the
    three standard shaping functions, added to the lexical score:

      saturation: boost * f / (f + pivot)           (in [0, boost))
      log:        boost * ln(scaling_factor + f)
      sigmoid:    boost * f^exp / (f^exp + pivot^exp)

    The bounded shapes are the point vs blended_topk's raw linear blend:
    a runaway feature value (spam page with huge PageRank) can never
    contribute more than ``boost``, so lexical relevance stays in
    charge. Docs missing from ``features`` contribute 0 (ES semantics:
    rank_feature clauses never match-gate, they only score).

    Same scale shape as blended_topk: one left doc_id equi-join against
    the static feature relation + a codegen projection + the per-query
    top-k window."""
    f = F.coalesce(F.col("_f"), F.lit(0.0))
    if mode == "saturation":
        contrib = F.lit(float(boost)) * f / (f + F.lit(float(pivot)))
    elif mode == "log":
        contrib = F.lit(float(boost)) * F.log(F.lit(float(scaling_factor)) + f)
    elif mode == "sigmoid":
        fe = F.pow(f, F.lit(float(exponent)))
        contrib = F.lit(float(boost)) * fe / (
            fe + F.lit(float(pivot) ** float(exponent))
        )
    else:
        raise ValueError(f"unknown rank_feature mode: {mode!r}")
    out = (
        scored.join(
            features.select("doc_id", F.col(feature_col).alias("_f")),
            "doc_id",
            "left",
        )
        .withColumn("feature", F.coalesce(F.col("_f"), F.lit(0.0)))
        .withColumn("blended", F.col(score_col) + contrib)
        .drop("_f")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("blended", 6)), F.asc("doc_id")
    )
    return (
        out.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", score_col, "feature", "blended", "rank")
    )


def bm25f_score_from_index(
    cats: dict, field_weights: dict[str, float], queries: DataFrame
) -> DataFrame:
    """BM25F served from PER-FIELD index catalogs (the Lucene layout:
    each field has its own postings; scores combine at query time).
    ``cats[field]`` is an IndexCatalog built over that field's content
    for the same document set. Weighted tf comes from each field's
    PRUNED postings (bucket partition pruning + broadcast term
    semi-join — only the query terms' lists are read, reference S1
    contract data_getters.go:17-40); weighted doc length comes from the
    catalogs' doc_meta tables (metadata-sized scans, zero text).
    Score-identical to the from-raw bm25f_score by construction — both
    feed the shared _bm25f_score_relations tail."""
    from .query_exact import pruned_postings

    missing = [f for f in field_weights if f not in cats]
    if missing:
        raise ValueError(f"no catalog for fields: {missing}")
    tf_parts, dl_parts = [], []
    for f, w in field_weights.items():
        cat = cats[f]
        meta = cat.doc_meta().select("doc_id", "doc_int", "doc_length")
        pr = pruned_postings(cat, queries).select("term", "doc_int", "tf")
        tf_parts.append(
            pr.join(meta.select("doc_int", "doc_id"), "doc_int").select(
                "doc_id",
                "term",
                (F.col("tf").cast("double") * F.lit(float(w))).alias("p"),
            )
        )
        dl_parts.append(
            meta.select(
                "doc_id",
                (F.col("doc_length").cast("double") * F.lit(float(w))).alias("p"),
            )
        )
    tf_un = tf_parts[0]
    for p in tf_parts[1:]:
        tf_un = tf_un.unionByName(p)
    wtf = tf_un.groupBy("doc_id", "term").agg(F.sum("p").alias("wtf"))
    dl_un = dl_parts[0]
    for p in dl_parts[1:]:
        dl_un = dl_un.unionByName(p)
    wdl = dl_un.groupBy("doc_id").agg(F.sum("p").alias("wdl"))
    return _bm25f_score_relations(wtf, wdl, queries)
