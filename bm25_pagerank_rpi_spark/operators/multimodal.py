"""Multimodal-column plumbing: opaque binary payloads + typed metadata,
with decode / feature-extraction as Arrow-batched ``mapInPandas``.

The real decoders (PIL / torchaudio / ffmpeg) are NOT in this container,
so ``decode_media`` is STUBBED: with ``real=True`` it raises
NotImplementedError at the exact seam where a decoder plugs in; the
default path computes DETERMINISTIC byte-level features instead. The
Spark-side contract — schema, Arrow batch shape, partition behavior —
is the real thing and is what the tests pin.

At 100 TB the rules this module embodies:
- payloads stay ``binary`` columns; never stringify, never collect.
- metadata (type/width/height/duration) lives in ordinary typed columns
  so filters on it prune parquet row-groups WITHOUT touching payloads
  (column pruning: a metadata-only query never reads the binary column).
- decode runs inside ``mapInPandas`` so each task streams Arrow batches;
  batch size bounds executor memory regardless of payload skew.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_TYPES = ["image", "audio", "video"]

DECODE_SCHEMA = (
    "doc_id long, media_type string, n_bytes int, byte_mean double, "
    "byte_entropy double, feature array<double>"
)

FEATURE_DIM = 8


def media_table(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from the documents relation: payload =
    utf-8 bytes of the text (a deterministic stand-in for real image/audio
    bytes), media_type + dimensions derived from doc_id."""
    mt = F.element_at(
        F.array(*[F.lit(t) for t in MEDIA_TYPES]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return docs.select(
        "doc_id",
        mt.alias("media_type"),
        F.to_binary(F.col("text"), F.lit("utf-8")).alias("payload"),
        ((F.col("doc_id") % 8 + 1) * 160).cast("int").alias("width"),
        ((F.col("doc_id") % 8 + 1) * 90).cast("int").alias("height"),
        (F.col("doc_id") % 30 + 1).cast("double").alias("duration_s"),
    )


def _byte_features(payload: bytes) -> tuple[int, float, float, list[float]]:
    arr = np.frombuffer(payload, dtype=np.uint8)
    n = int(arr.size)
    if n == 0:
        return 0, 0.0, 0.0, [0.0] * FEATURE_DIM
    mean = float(arr.mean())
    counts = np.bincount(arr, minlength=256).astype(np.float64)
    p = counts[counts > 0] / n
    entropy = float(-(p * np.log2(p)).sum())
    # deterministic fake embedding: mean byte value of FEATURE_DIM stripes
    stripes = np.array_split(arr, FEATURE_DIM)
    feat = [float(s.mean()) if s.size else 0.0 for s in stripes]
    return n, mean, entropy, feat


def decode_media(media: DataFrame, real: bool = False) -> DataFrame:
    """Arrow-batched decode/feature-extract over the payload column.

    ``real=True`` marks where an actual decoder (PIL.Image.open /
    soundfile / pyav frame sampling) would run — unavailable in this
    environment, so it raises; the default deterministic byte-feature
    path exercises identical plumbing."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if real:
            raise NotImplementedError(
                "real media decoding requires PIL/soundfile/av; "
                "plug the decoder in here"
            )
        for pdf in batches:
            rows = [_byte_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "media_type": pdf["media_type"].to_numpy(),
                    "n_bytes": [r[0] for r in rows],
                    "byte_mean": [r[1] for r in rows],
                    "byte_entropy": [r[2] for r in rows],
                    "feature": [r[3] for r in rows],
                }
            )

    return media.select("doc_id", "media_type", "payload").mapInPandas(
        fn, schema=DECODE_SCHEMA
    )


def media_metadata_stats(media: DataFrame) -> DataFrame:
    """Per-type rollup touching ONLY metadata columns — the plan must show
    the payload column pruned out of the scan."""
    return media.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.octet_length("payload")).alias("total_bytes"),
        F.avg("width").alias("avg_width"),
        F.avg("duration_s").alias("avg_duration_s"),
    )
