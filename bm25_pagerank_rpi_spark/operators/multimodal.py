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

    ``real=True`` runs the pure-Python container decoders
    (``parse_media_header``: PNG / JPEG / GIF / WAV) and returns parsed
    format + dimensions per payload (``DECODE_REAL_SCHEMA``); payloads
    that are not a recognized container decode to NULLs rather than
    erroring — at 100 TB a corrupt object must not fail the stage. Full
    pixel/sample decoding (PIL / soundfile / pyav) still plugs in at the
    same seam when those libraries exist."""

    if real:

        def fn_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = [parse_media_header(p) for p in pdf["payload"]]
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"].to_numpy(),
                        "fmt": pd.array([r[0] for r in rows], dtype="string"),
                        "width": pd.array([r[1] for r in rows], dtype="Int32"),
                        "height": pd.array([r[2] for r in rows], dtype="Int32"),
                        "bit_depth": pd.array([r[3] for r in rows], dtype="Int32"),
                        "channels": pd.array([r[4] for r in rows], dtype="Int32"),
                        "sample_rate": pd.array([r[5] for r in rows], dtype="Int32"),
                        "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    }
                )

        return media.select("doc_id", "payload").mapInPandas(
            fn_real, schema=DECODE_REAL_SCHEMA
        )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
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


DECODE_REAL_SCHEMA = (
    "doc_id long, fmt string, width int, height int, bit_depth int, "
    "channels int, sample_rate int, n_bytes int"
)

_NO_HEADER = (None, None, None, None, None, None)


def parse_media_header(b: bytes | None):
    """Pure-Python container-header decode: (fmt, width, height,
    bit_depth, channels, sample_rate), NULL-padded per modality.

    Formats: PNG (IHDR, CRC-verified), JPEG (segment walk to SOFn),
    GIF (logical screen descriptor), WAV (RIFF/WAVE fmt chunk).
    Anything else — including truncated or corrupt headers — returns
    all-NULL instead of raising: a malformed object at web scale is a
    row to quarantine, not a stage failure."""
    import struct
    import zlib

    if not b:
        return _NO_HEADER
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n":
            (ln,) = struct.unpack(">I", b[8:12])
            if b[12:16] != b"IHDR" or ln != 13:
                return _NO_HEADER
            if zlib.crc32(b[12 : 16 + 13]) != struct.unpack(">I", b[29:33])[0]:
                return _NO_HEADER
            w, h = struct.unpack(">II", b[16:24])
            depth = b[24]
            return ("png", w, h, depth, None, None)
        if b[:2] == b"\xff\xd8":
            o = 2
            while o + 4 <= len(b):
                if b[o] != 0xFF:
                    return _NO_HEADER
                marker = b[o + 1]
                if marker == 0xD9:  # EOI before any SOF
                    return _NO_HEADER
                if 0xD0 <= marker <= 0xD8 or marker == 0x01:
                    o += 2
                    continue
                (seg,) = struct.unpack(">H", b[o + 2 : o + 4])
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    depth = b[o + 4]
                    h, w = struct.unpack(">HH", b[o + 5 : o + 9])
                    return ("jpeg", w, h, depth, None, None)
                o += 2 + seg
            return _NO_HEADER
        if b[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", b[6:10])
            depth = ((b[10] >> 4) & 0x7) + 1  # color resolution bits
            return ("gif", w, h, depth, None, None)
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            o = 12
            while o + 8 <= len(b):
                cid = b[o : o + 4]
                (clen,) = struct.unpack("<I", b[o + 4 : o + 8])
                if cid == b"fmt ":
                    ch, sr = struct.unpack("<HI", b[o + 10 : o + 16])
                    (bits,) = struct.unpack("<H", b[o + 22 : o + 24])
                    return ("wav", None, None, bits, ch, sr)
                o += 8 + clen + (clen & 1)
            return _NO_HEADER
    except (struct.error, IndexError):
        return _NO_HEADER
    return _NO_HEADER


def make_media_payload(doc_id: int) -> bytes:
    """Deterministic REAL container bytes (header-complete, body-empty)
    for round-trip testing without image/audio libraries: doc_id % 4
    cycles png / jpeg / gif / wav; dimensions derive from doc_id the
    same way media_table's metadata columns do."""
    import struct
    import zlib

    fmt = ("png", "jpeg", "gif", "wav")[doc_id % 4]
    w = (doc_id % 8 + 1) * 160
    h = (doc_id % 8 + 1) * 90
    if fmt == "png":
        ihdr = b"IHDR" + struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        iend = b"IEND"
        return (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13) + ihdr + struct.pack(">I", zlib.crc32(ihdr))
            + struct.pack(">I", 0) + iend + struct.pack(">I", zlib.crc32(iend))
        )
    if fmt == "jpeg":
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
        sof0 = (
            b"\xff\xc0" + struct.pack(">H", 17) + bytes([8])
            + struct.pack(">HH", h, w) + bytes([3])
            + bytes([1, 0x22, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
        )
        return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"
    if fmt == "gif":
        return b"GIF89a" + struct.pack("<HH", w, h) + bytes([0x70, 0, 0])
    # wav: header-only RIFF with an empty data chunk
    ch = (doc_id % 8) // 4 + 1  # wav ids are odd, so vary on the 8-cycle
    sr = 8000 * (doc_id % 3 + 1)
    bits = 16
    fmtc = struct.pack("<HHIIHH", 1, ch, sr, sr * ch * bits // 8, ch * bits // 8, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmtc + b"data" + struct.pack("<I", 0)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def media_table_real(docs: DataFrame) -> DataFrame:
    """Media relation whose payloads are REAL container bytes
    (make_media_payload), synthesized deterministically from doc_id in
    an Arrow-batched kernel — the honest input for decode_media(real=True)
    round-trip checks."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            yield pd.DataFrame(
                {"doc_id": ids, "payload": [make_media_payload(int(i)) for i in ids]}
            )

    return docs.select("doc_id").mapInPandas(fn, schema="doc_id long, payload binary")


def media_metadata_stats(media: DataFrame) -> DataFrame:
    """Per-type rollup touching ONLY metadata columns — the plan must show
    the payload column pruned out of the scan."""
    return media.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.octet_length("payload")).alias("total_bytes"),
        F.avg("width").alias("avg_width"),
        F.avg("duration_s").alias("avg_duration_s"),
    )
