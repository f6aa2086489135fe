"""Mini query language: one string in, ranked documents out.

The reference API takes a bare term string (cmd/api/main.go:86-126 —
`?text=` is whitespace-split and every token scores). Real users of a
search endpoint immediately ask for the standard operators on top, so
this module parses the Lucene-ish surface syntax and composes the
operators this repo already has into ONE executable plan:

    hash join "table hash" -scan lang:en

  bare terms        score (BM25, occurrence multiplicity as typed)
  "quoted phrase"   candidate gate: doc must contain the exact-adjacency
                    phrase (operators/phrase.py semantics); the phrase's
                    terms ALSO score as occurrences
  -term             candidate gate: doc must NOT contain the term
  field:value       corpus filter: metadata equality, applied BEFORE
                    stats — the searchable corpus IS the filtered corpus
                    (same semantics as bm25_topk_filtered)

Two-level predicate semantics, deliberately:
- field filters restrict the CORPUS (they change N, avgdl, df — you are
  searching "the English docs", so stats describe that corpus);
- phrase and NOT gates restrict the CANDIDATES (they do not change what
  the corpus is, only which matches are admissible) — scores of the
  surviving docs are identical to the ungated query's scores.

Scale shape: the gates are one scan-side Catalyst projection over the
(already field-filtered) corpus; scoring is the standard broadcast
score_candidates plan; the gate join is a semi-join probing with the
candidate set (bounded by the query terms' df). Nothing here adds a
Python UDF or a new shuffle beyond the scoring aggregation itself.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokens_col
from . import scorer
from .phrase import phrase_tf_col

_TOKEN_RE = re.compile(r'-"([^"]*)"|"([^"]*)"|(\S+)')


@dataclass
class ParsedQuery:
    terms: list[str] = field(default_factory=list)       # scoring occurrences
    phrases: list[list[str]] = field(default_factory=list)
    excludes: list[str] = field(default_factory=list)
    fields: list[tuple[str, str]] = field(default_factory=list)


def parse_query(text: str) -> ParsedQuery:
    """Parse the surface syntax. Unknown shapes degrade to bare terms
    (a lone '-' or 'a:' is just a token — queries never error on typos).
    A '-"quoted phrase"' excludes every doc containing the phrase."""
    pq = ParsedQuery()
    for m in _TOKEN_RE.finditer(text or ""):
        neg_phrase, phrase, tok = m.group(1), m.group(2), m.group(3)
        if neg_phrase is not None:
            ph = neg_phrase.split()
            if ph:
                pq.phrases.append(["-"] + ph)  # marker consumed below
            continue
        if phrase is not None:
            ph = phrase.split()
            if ph:
                pq.phrases.append(ph)
                pq.terms.extend(ph)
            continue
        if tok.startswith("-") and len(tok) > 1:
            pq.excludes.append(tok[1:])
        elif ":" in tok[1:-1]:
            f_, v = tok.split(":", 1)
            pq.fields.append((f_, v))
        else:
            pq.terms.append(tok)
    return pq


def search(
    docs: DataFrame,
    query_text: str,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, bm25, rank) for one parsed query over a raw (doc_id,
    text [, metadata...]) relation. Ranks on the 6-dp-rounded score with
    doc_id tie-break (house convention). Unknown field names raise (the
    one user error worth failing loudly on — a silent empty result hides
    a typo'd column forever)."""
    pq = parse_query(query_text)
    base = docs
    for f_, v in pq.fields:
        if f_ not in docs.columns:
            raise ValueError(
                f"unknown field '{f_}' — available: "
                f"{[c for c in docs.columns if c != text_col]}"
            )
        base = base.filter(F.col(f_).cast("string") == v)

    if not pq.terms:
        spark = docs.sparkSession
        return spark.createDataFrame(
            [], f"{id_col} string, bm25 double, rank int"
        )

    toks = tokens_col(text_col)
    gate = F.lit(True)
    for ph in pq.phrases:
        if ph and ph[0] == "-":
            gate = gate & (phrase_tf_col(toks, ph[1:]) == 0)
        else:
            gate = gate & (phrase_tf_col(toks, ph) > 0)
    for ex in pq.excludes:
        gate = gate & ~F.array_contains(toks, ex)
    gated = base.filter(gate).select(F.col(id_col).alias("doc_id"))

    qdf = docs.sparkSession.createDataFrame(
        [("q", " ".join(pq.terms))], "query_id string, text string"
    )
    dlen = scorer.doc_lengths(base.select(F.col(id_col).alias("doc_id"), text_col))
    sc = scorer.score_candidates(
        scorer.doc_term_frequencies(
            base.select(F.col(id_col).alias("doc_id"), text_col)
        ),
        dlen,
        scorer.corpus_stats(dlen),
        qdf,
    )
    out = sc.join(gated, "doc_id", "left_semi").select(
        "query_id", "doc_id", F.round("bm25", 6).alias("bm25")
    )
    return (
        scorer.topk(out, k)
        .select(F.col("doc_id").alias(id_col), "bm25", "rank")
    )
