"""Mini query language: one string in, ranked documents out.

The reference API takes a bare term string (cmd/api/main.go:86-126 —
`?text=` is whitespace-split and every token scores). Real users of a
search endpoint immediately ask for the standard operators on top, so
this module parses the Lucene-ish surface syntax and composes the
operators this repo already has into ONE executable plan:

    hash join "table hash" -scan lang:en key^2 n_chars:[200 TO 5000]

  bare terms        score (BM25, occurrence multiplicity as typed)
  term^2.5          boosted term: its BM25 contribution is multiplied
                    by the boost (Lucene ^ syntax); implemented by
                    scoring each boost-weight group with the UNCHANGED
                    exact scorer and summing w * bm25 — BM25 is additive
                    over query-occurrence subsets, so no second scoring
                    kernel exists to drift from the reference semantics
  "quoted phrase"   candidate gate: doc must contain the exact-adjacency
                    phrase (operators/phrase.py semantics); the phrase's
                    terms ALSO score as occurrences
  -term             candidate gate: doc must NOT contain the term
  field:value       corpus filter: metadata equality, applied BEFORE
                    stats — the searchable corpus IS the filtered corpus
                    (same semantics as bm25_topk_filtered)
  field:[a TO b]    corpus filter: inclusive range on any orderable
                    column (timestamps, numerics, strings); '*' opens an
                    end (Lucene range syntax). The literal casts to the
                    COLUMN's type, so n_chars:[20 TO 100] compares
                    numerically, not lexicographically.
  -field:[a TO b]   corpus filter: keeps docs OUTSIDE the inclusive
                    range (NULL field values survive — they never match
                    a range, so negation keeps them).

Two-level predicate semantics, deliberately:
- field filters restrict the CORPUS (they change N, avgdl, df — you are
  searching "the English docs", so stats describe that corpus);
- phrase and NOT gates restrict the CANDIDATES (they do not change what
  the corpus is, only which matches are admissible) — scores of the
  surviving docs are identical to the ungated query's scores.

Scale shape: the gates are one scan-side Catalyst projection over the
(already field-filtered) corpus; scoring is the standard broadcast
score_candidates plan, once per DISTINCT boost weight (queries use 1-3
weights in practice), merged by a doc_id hash agg over per-group top
candidates. Nothing here adds a Python UDF or a new shuffle beyond the
scoring aggregations themselves.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokens_col
from . import scorer
from .phrase import phrase_tf_col

_TOKEN_RE = re.compile(
    r'-"([^"]*)"|"([^"]*)"|-(\w+):\[([^\]]*)\]|(\w+):\[([^\]]*)\]|(\S+)'
)
_BOOST_RE = re.compile(r"^(.+)\^(\d+(?:\.\d+)?)$")
_RANGE_RE = re.compile(r"^\s*(\S+)\s+TO\s+(\S+)\s*$")


@dataclass
class ParsedQuery:
    terms: list[str] = field(default_factory=list)       # scoring occurrences
    weights: list[float] = field(default_factory=list)   # parallel to terms
    phrases: list[list[str]] = field(default_factory=list)
    excludes: list[str] = field(default_factory=list)
    fields: list[tuple[str, str]] = field(default_factory=list)
    ranges: list[tuple[str, str | None, str | None]] = field(default_factory=list)
    neg_ranges: list[tuple[str, str | None, str | None]] = field(
        default_factory=list
    )


def parse_query(text: str) -> ParsedQuery:
    """Parse the surface syntax. Unknown shapes degrade to bare terms
    (a lone '-' or 'a:' is just a token — queries never error on typos).
    A '-"quoted phrase"' excludes every doc containing the phrase."""
    pq = ParsedQuery()

    def add_term(tok: str, w: float = 1.0) -> None:
        m = _BOOST_RE.match(tok)
        if m:
            tok, w = m.group(1), w * float(m.group(2))
        if tok:
            pq.terms.append(tok)
            pq.weights.append(w)

    for m in _TOKEN_RE.finditer(text or ""):
        neg_phrase, phrase, nrfield, nrbody, rfield, rbody, tok = m.groups()
        if neg_phrase is not None:
            ph = neg_phrase.split()
            if ph:
                pq.phrases.append(["-"] + ph)  # marker consumed below
            continue
        if phrase is not None:
            ph = phrase.split()
            if ph:
                pq.phrases.append(ph)
                for p in ph:
                    pq.terms.append(p)
                    pq.weights.append(1.0)
            continue
        if nrfield is not None:
            rm = _RANGE_RE.match(nrbody)
            if rm:
                lo = None if rm.group(1) == "*" else rm.group(1)
                hi = None if rm.group(2) == "*" else rm.group(2)
                pq.neg_ranges.append((nrfield, lo, hi))
            else:  # malformed negated range degrades to a bare token
                add_term(f"-{nrfield}:[{nrbody}]")
            continue
        if rfield is not None:
            rm = _RANGE_RE.match(rbody)
            if rm:
                lo = None if rm.group(1) == "*" else rm.group(1)
                hi = None if rm.group(2) == "*" else rm.group(2)
                pq.ranges.append((rfield, lo, hi))
            else:  # malformed range degrades to a bare token, like typos
                add_term(f"{rfield}:[{rbody}]")
            continue
        if tok.startswith("-") and len(tok) > 1:
            pq.excludes.append(tok[1:])
        elif ":" in tok[1:-1]:
            f_, v = tok.split(":", 1)
            pq.fields.append((f_, v))
        else:
            add_term(tok)
    return pq


def _check_field(docs: DataFrame, f_: str, text_col: str) -> None:
    if f_ not in docs.columns:
        raise ValueError(
            f"unknown field '{f_}' — available: "
            f"{[c for c in docs.columns if c != text_col]}"
        )


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
        _check_field(docs, f_, text_col)
        base = base.filter(F.col(f_).cast("string") == v)
    dtypes = dict(docs.dtypes)
    for f_, lo, hi in pq.ranges:
        _check_field(docs, f_, text_col)
        dt = dtypes[f_]
        if lo is not None:
            base = base.filter(F.col(f_) >= F.lit(lo).cast(dt))
        if hi is not None:
            base = base.filter(F.col(f_) <= F.lit(hi).cast(dt))
    # -field:[a TO b] keeps docs OUTSIDE the inclusive range; a NULL field
    # never matches a range so it survives the negation (coalesce).
    for f_, lo, hi in pq.neg_ranges:
        _check_field(docs, f_, text_col)
        dt = dtypes[f_]
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col(f_) >= F.lit(lo).cast(dt))
        if hi is not None:
            cond = cond & (F.col(f_) <= F.lit(hi).cast(dt))
        base = base.filter(~F.coalesce(cond, F.lit(False)))

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

    corpus = base.select(F.col(id_col).alias("doc_id"), text_col)
    dlen = scorer.doc_lengths(corpus)
    dtf = scorer.doc_term_frequencies(corpus)
    stats = scorer.corpus_stats(dlen)

    # one exact-scorer pass per distinct boost weight; BM25 is a sum over
    # query occurrences, so total = sum_w w * bm25(occurrences with w)
    by_w: dict[float, list[str]] = {}
    for t, w in zip(pq.terms, pq.weights):
        by_w.setdefault(w, []).append(t)
    parts = []
    for w, terms in sorted(by_w.items()):
        qdf = docs.sparkSession.createDataFrame(
            [("q", " ".join(terms))], "query_id string, text string"
        )
        part = scorer.score_candidates(dtf, dlen, stats, qdf).select(
            "doc_id", (F.col("bm25") * F.lit(float(w))).alias("wbm25")
        )
        parts.append(part)
    merged = reduce(DataFrame.unionByName, parts)
    sc = (
        merged.groupBy("doc_id")
        .agg(F.round(F.sum("wbm25"), 6).alias("bm25"))
        .select(F.lit("q").alias("query_id"), "doc_id", "bm25")
    )

    out = sc.join(gated, "doc_id", "left_semi")
    return (
        scorer.topk(out, k)
        .select(F.col("doc_id").alias(id_col), "bm25", "rank")
    )
