"""Analyzer chain: lowercase + punctuation strip + stopword removal.

The reference tokenizer (T1, functions/tokenize.py) is whitespace-only by
spec. A real engine also ships analyzed fields (Lucene StandardAnalyzer +
StopFilter); this module is that menu item, used symmetrically on the
index side and the query side — the same silent-rank-corruption rule as
T1: mismatched analysis between the two sides is a bug, so both call
``analyzed_tokens_col``.

Chain (all pure Catalyst, codegen'd, zero shuffle):
  lower(text)
  -> regexp_replace('[^a-z0-9 ]+', ' ')   # punctuation/symbols -> space
  -> split on space runs, drop empties
  -> drop stopwords (fixed list, inlined as a literal filter — NOT
     array_except, which would also deduplicate surviving tokens)

The DuckDB oracle replays the identical chain (lower / regexp_replace
with the 'g' flag / string_split / NOT IN), so analyzed pairs
value-check like every other pair.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# a classic minimal English stoplist; fixed here because index and query
# sides must agree forever (changing it is an index-breaking change)
STOPWORDS = [
    "the", "a", "an", "of", "to", "and", "in", "is", "it", "for", "on",
]

_PUNCT = "[^a-z0-9 ]+"


def analyzed_tokens_col(
    text: Column | str, stopwords: list[str] | None = None
) -> Column:
    """Array of analyzed tokens (order and multiplicity preserved)."""
    stops = STOPWORDS if stopwords is None else stopwords
    c = F.col(text) if isinstance(text, str) else text
    arr = F.split(F.regexp_replace(F.lower(c), _PUNCT, " "), " +")
    return F.filter(arr, lambda t: (t != F.lit("")) & ~t.isin(*stops))


def analyzed_sql(expr: str, stopwords: list[str] | None = None) -> str:
    """The DuckDB fragment producing one row per analyzed token of
    ``expr``: use inside
    ``FROM documents, unnest({analyzed_sql('text')}) AS t(term)``."""
    stops = STOPWORDS if stopwords is None else stopwords
    inlist = ", ".join(f"'{s}'" for s in stops)
    return (
        f"list_filter(string_split(regexp_replace(lower({expr}), "
        f"'{_PUNCT}', ' ', 'g'), ' '), "
        f"t -> t <> '' AND t NOT IN ({inlist}))"
    )
