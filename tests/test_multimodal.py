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


def test_real_decoder_seam_raises(spark):
    media = multimodal.media_table(_docs(spark))
    with pytest.raises(Exception) as exc_info:
        multimodal.decode_media(media, real=True).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_metadata_stats_prune_payload(spark):
    media = multimodal.media_table(_docs(spark))
    out = {r.media_type: r for r in multimodal.media_metadata_stats(media).collect()}
    assert set(out) == {"image", "audio", "video"}
    assert sum(r.n for r in out.values()) == 13
    # total_bytes equals sum of utf-8 lengths per type
    texts = {r.doc_id: r for r in _docs(spark).collect()}
    expect_img = sum(len(texts[i].text.encode()) for i in range(13) if i % 3 == 0)
    assert out["image"].total_bytes == expect_img
