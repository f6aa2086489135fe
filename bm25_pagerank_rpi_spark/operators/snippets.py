"""Snippet extraction / hit highlighting for serving results.

Given query terms and the raw turn text, find the WINDOW of `window`
consecutive tokens containing the most DISTINCT query terms (ties ->
smallest start offset) and render it with the matched terms bracketed —
the result-page feature every retrieval engine pairs with top-k ranking.
The reference serves raw documents only (its UI is out of repo scope);
this is the Spark-side operator a user of the engine needs next.

Execution shape: one corpus scan, ZERO shuffles, zero Python — the whole
window search is a single Catalyst expression tree per row
(sequence -> transform -> array_max over (count, -start) structs), so it
runs inside WholeStageCodegen at scan speed and composes with the top-k
paths (apply to the <=k ranked rows after truncation, where the corpus
join is broadcast-sized).

Cost per doc is O(|doc| * window) comparisons against a small query-term
set — scan-bound at any corpus size; at serving time it runs on k rows,
not the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokens_col

DEFAULT_WINDOW = 10


def _window_hits(tokens: Column, terms: list[str], window: int) -> Column:
    """array<struct<n:int, negstart:int>> — distinct-query-term count per
    window start (1-based slice starts), encoded so array_max picks
    (max n, then min start)."""
    qterms = F.array(*[F.lit(t) for t in sorted(set(terms))])
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(tokens) - window + 1, F.lit(1))
    )

    def score(s: Column) -> Column:
        win = F.slice(tokens, s, window)
        n = F.size(F.array_intersect(F.array_distinct(win), qterms))
        return F.struct(
            n.cast("int").alias("n"), (-s).cast("int").alias("negstart")
        )

    return F.transform(starts, score)


def best_snippet(
    docs: DataFrame,
    terms: list[str],
    window: int = DEFAULT_WINDOW,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, start, n_matched, snippet) — the best `window`-token
    window per document, matched terms bracketed as [term]. Only
    documents matching at least one query term are emitted. `start` is
    the 0-based token offset of the window."""
    if not terms:
        raise ValueError("query must have at least one term")
    toks = tokens_col(text_col)
    best = F.array_max(_window_hits(toks, terms, window))
    qterms = F.array(*[F.lit(t) for t in sorted(set(terms))])

    with_best = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("toks"),
        best.alias("best"),
    ).filter(F.col("best.n") > 0)

    win = F.slice(F.col("toks"), -F.col("best.negstart"), window)
    marked = F.transform(
        win,
        lambda t: F.when(
            F.array_contains(qterms, t), F.concat(F.lit("["), t, F.lit("]"))
        ).otherwise(t),
    )
    return with_best.select(
        "doc_id",
        (-F.col("best.negstart") - 1).cast("int").alias("start"),
        F.col("best.n").alias("n_matched"),
        F.array_join(marked, " ").alias("snippet"),
    )


def snippets_for_topk(
    topk: DataFrame,
    docs: DataFrame,
    terms: list[str],
    window: int = DEFAULT_WINDOW,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Attach snippets to a ranked result: topk (doc_id, ..., rank) joined
    to its source texts, snippet search running on the <=k joined rows
    only. The topk side is broadcast (k rows), so the corpus scan stays
    pruned to a semi-join and nothing shuffles."""
    keys = topk.select(F.col(id_col).alias("__snippet_key"))
    hits = docs.join(
        F.broadcast(keys), docs[id_col] == keys["__snippet_key"], "left_semi"
    )
    return topk.join(
        best_snippet(hits, terms, window, id_col=id_col, text_col=text_col),
        "doc_id",
        "left",
    )
