"""T1 — the tokenizer. Semantics pinned to the reference:

``strings.Fields(text)`` (reference internal/ranking/types.go:24-26):
split on runs of **Unicode** whitespace; no lowercasing, no punctuation
stripping, no stemming ("hello," stays "hello," — types_test.go:47-54);
empty / all-whitespace text -> empty array.

Two interchangeable implementations, byte-identical on output (pinned by
tests/test_tokenize.py):

- ``tokens_col``     — pure Catalyst expression (JVM-side, codegen'd).
  ``(?U)`` turns on UNICODE_CHARACTER_CLASS so Java's ``\\s`` matches the
  Unicode White_Space property, same table Go's ``unicode.IsSpace`` uses.
- ``tokenize_udf``   — Arrow pandas UDF using pandas ``str.split()`` with no
  args (Python ``str.split`` == whitespace-run split over Unicode
  whitespace). Used inside the index-build mapInPandas stage where we are
  already in an Arrow batch.

The SAME function must be used on the index-build side and the query side —
tokenization mismatch is a silent rank-corruption bug.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

# Java regex: (?U) => \s matches Unicode White_Space (Go unicode.IsSpace).
_WS_PATTERN = r"(?U)\s+"


def tokens_col(text: Column | str) -> Column:
    """Catalyst-native tokenizer: array of whitespace-run-separated tokens.

    ``split`` produces a leading "" for leading whitespace and a trailing ""
    for trailing whitespace; ``filter`` drops empties, which also maps
    all-whitespace / empty input to an empty array (types_test.go:29-45).
    """
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, _WS_PATTERN), lambda x: x != F.lit(""))


def doc_length_col(text: Column | str) -> Column:
    """|d| = token count under T1 (reference uses metadata DocLength as the
    BM25 normalizer, features.go:134; for our native corpus DocLength is
    defined as the token count of the turn text — SURVEY.md §1.3)."""
    return F.size(tokens_col(text))


def tokenize_series(s: pd.Series) -> pd.Series:
    """Pandas-side twin of ``tokens_col`` for use inside Arrow batches."""
    # str.split() with no args: split on runs of whitespace, discard empties.
    out = s.fillna("").str.split()
    return out.apply(lambda x: x if isinstance(x, list) else [])


tokenize_udf = F.pandas_udf(tokenize_series, ArrayType(StringType()))
