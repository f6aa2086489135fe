"""Portable 60-bit hash used by dedup / LSH / sampling operators.

``phash(expr) = first 15 hex digits of md5(expr), as a BIGINT``

md5 is bit-identical across Spark (JVM) and DuckDB, so every operator
built on it (minhash, simhash, LSH bands, deterministic sampling) is
value-checkable against an ANSI-SQL oracle — unlike xxhash64/murmur,
whose implementations differ across engines. 15 hex digits = 60 bits,
safely inside a signed 64-bit integer in both engines.

Scale note: md5 is ~3x slower than xxhash64 but both are memory-bound on
a parquet scan; the hot-path index build keeps xxhash64 for bucketing
(sources/catalog.py) while the dedup/sampling family pays the portable
price for oracle checkability. Swapping ``phash`` to xxhash64 on a real
cluster is a one-line change.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def phash(col: Column | str) -> Column:
    """60-bit deterministic hash of a string column (JVM-side, codegen)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def phash_sql(expr: str) -> str:
    """DuckDB twin of :func:`phash` for oracle SQL strings."""
    return f"CAST(concat('0x', substring(md5({expr}), 1, 15)) AS BIGINT)"
