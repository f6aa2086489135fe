"""Multimodal plumbing: schema, Arrow batch behavior, deterministic
byte-feature decode, and the NotImplementedError seam for real decoders."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bm25_pagerank_rpi_spark.operators import multimodal


def _docs(spark):
    rows = [(i, f"payload number {i} " + "x" * i) for i in range(12)] + [(12, "")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_media_table_schema_and_types(spark):
    media = multimodal.media_table(_docs(spark))
    schema = {f.name: f.dataType.simpleString() for f in media.schema.fields}
    assert schema == {
        "doc_id": "bigint", "media_type": "string", "payload": "binary",
        "width": "int", "height": "int", "duration_s": "double",
    }
    rows = {r.doc_id: r for r in media.collect()}
    assert rows[0].media_type == "image"
    assert rows[1].media_type == "audio"
    assert rows[2].media_type == "video"
    assert bytes(rows[3].payload) == b"payload number 3 xxx"


def test_decode_features_match_numpy(spark):
    media = multimodal.media_table(_docs(spark))
    out = {r.doc_id: r for r in multimodal.decode_media(media).collect()}
    payloads = {r.doc_id: bytes(r.payload) for r in media.collect()}
    for doc_id, payload in payloads.items():
        r = out[doc_id]
        assert r.n_bytes == len(payload)
        if payload:
            arr = np.frombuffer(payload, dtype=np.uint8)
            assert r.byte_mean == pytest.approx(float(arr.mean()), abs=1e-9)
            counts = np.bincount(arr, minlength=256)
            p = counts[counts > 0] / arr.size
            assert r.byte_entropy == pytest.approx(float(-(p * np.log2(p)).sum()), abs=1e-9)
            assert len(r.feature) == multimodal.FEATURE_DIM
        else:
            assert r.byte_mean == 0.0 and r.feature == [0.0] * multimodal.FEATURE_DIM


def test_header_parse_round_trip():
    # every synthesized container parses back to its construction params
    for d in range(16):
        p = multimodal.make_media_payload(d)
        fmt, w, h, depth, ch, sr = multimodal.parse_media_header(p)
        assert fmt == ("png", "jpeg", "gif", "wav")[d % 4]
        if fmt == "wav":
            assert (w, h) == (None, None)
            assert depth == 16
            assert ch == (d % 8) // 4 + 1
            assert sr == 8000 * (d % 3 + 1)
        else:
            assert w == (d % 8 + 1) * 160 and h == (d % 8 + 1) * 90
            assert depth == 8 and ch is None and sr is None


def test_header_parse_rejects_corrupt():
    none6 = (None,) * 6
    assert multimodal.parse_media_header(b"") == none6
    assert multimodal.parse_media_header(None) == none6
    assert multimodal.parse_media_header(b"not an image at all") == none6
    # truncated PNG signature only
    assert multimodal.parse_media_header(b"\x89PNG\r\n\x1a\n\x00\x00") == none6
    # CRC-corrupted PNG IHDR must NOT yield dimensions
    bad = bytearray(multimodal.make_media_payload(0))
    bad[20] ^= 0xFF
    assert multimodal.parse_media_header(bytes(bad)) == none6
    # JPEG with no SOF before EOI
    assert multimodal.parse_media_header(b"\xff\xd8\xff\xd9") == none6


def test_real_decode_spark_round_trip(spark):
    media = multimodal.media_table_real(_docs(spark))
    rows = {
        r.doc_id: r
        for r in multimodal.decode_media(media, real=True).collect()
    }
    for d, r in rows.items():
        fmt, w, h, depth, ch, sr = multimodal.parse_media_header(
            multimodal.make_media_payload(d)
        )
        assert (r.fmt, r.width, r.height, r.bit_depth, r.channels,
                r.sample_rate) == (fmt, w, h, depth, ch, sr)
        assert r.n_bytes == len(multimodal.make_media_payload(d))
    # a non-container payload decodes to NULLs, not an error
    junk = multimodal.media_table(_docs(spark))  # utf-8 text payloads
    out = multimodal.decode_media(junk, real=True).collect()
    assert all(r.fmt is None and r.width is None for r in out)


def test_metadata_stats_prune_payload(spark):
    media = multimodal.media_table(_docs(spark))
    out = {r.media_type: r for r in multimodal.media_metadata_stats(media).collect()}
    assert set(out) == {"image", "audio", "video"}
    assert sum(r.n for r in out.values()) == 13
    # total_bytes equals sum of utf-8 lengths per type
    texts = {r.doc_id: r for r in _docs(spark).collect()}
    expect_img = sum(len(texts[i].text.encode()) for i in range(13) if i % 3 == 0)
    assert out["image"].total_bytes == expect_img
