"""gob interop (VERDICT r1 #10): read the reference's checked-in
``data/raw/examples_*.gob`` fixtures (Go ``encoding/gob`` streams holding
a ``Documents`` slice) into the engine's feature schema."""

from __future__ import annotations

import glob

import pytest

from bm25_pagerank_rpi_spark.sources import gob

FIXTURES = sorted(glob.glob("/root/reference/data/raw/*.gob"))


@pytest.mark.skipif(not FIXTURES, reason="reference fixtures not present")
def test_decode_reference_fixtures():
    for p in FIXTURES:
        (docs,) = gob.decode_gob(p)
        assert isinstance(docs, list) and docs
        for d in docs:
            assert d["DocID"].startswith("doc")
            assert d["Metadata"]["URL"].startswith("http://")
            assert isinstance(d["TermFrequencies"], dict)
            assert d["Features"]["BM25"] > 0
    # known values from the fixture pair (ranker.go scoring of the tiny
    # 2-doc corpus the reference's own test wrote)
    (docs1,) = gob.decode_gob(FIXTURES[0])
    assert docs1[0]["DocID"] == "doc1"
    assert docs1[0]["TermFrequencies"] == {"term1": 1}
    assert docs1[0]["Features"]["BM25"] == pytest.approx(1.7272016621244008)


@pytest.mark.skipif(not FIXTURES, reason="reference fixtures not present")
def test_gob_to_dataframe(spark):
    df = gob.read_documents_gob(spark, FIXTURES)
    rows = df.collect()
    assert len(rows) == sum(len(v) for p in FIXTURES for v in gob.decode_gob(p))
    cols = set(df.columns)
    # the 25-feature block + identity columns are all present and typed
    for c in ("doc_id", "bm25", "pagerank", "sum_ntf", "covered_query_term_ratio"):
        assert c in cols
    by_id = {r.doc_id: r for r in rows}
    assert by_id["doc1"].sum_tf == 1
    assert by_id["doc2"].bm25 == pytest.approx(1.736878799683318)
    assert by_id["doc2"].url == "http://example2.com"


def test_gob_scalar_roundtrip_encoding():
    """Wire-level scalar decoding pinned against hand-assembled bytes
    (values from the encoding/gob documentation's examples)."""
    d = gob.GobDecoder(bytes([0x07]))
    assert d.read_uint() == 7
    d = gob.GobDecoder(bytes([0xFE, 0x01, 0x00]))
    assert d.read_uint() == 256
    d = gob.GobDecoder(bytes([0x05]))  # zigzag: 5 -> -3
    assert d.read_int() == -3
    d = gob.GobDecoder(bytes([0x04]))
    assert d.read_int() == 2
    # float 17.0 = IEEE 0x4031000000000000, byte-reversed -> 0x1031.. -> two bytes
    d = gob.GobDecoder(bytes([0xFE, 0x31, 0x40]))
    assert d.read_float() == 17.0


@pytest.mark.skipif(not FIXTURES, reason="reference fixtures not present")
def test_encoder_roundtrip_reference_fixtures():
    """Write side (S8 twin): re-encoding a decoded fixture produces a
    stream OUR decoder — which follows Go's documented wire format —
    decodes back to identical values. Byte-identity with the original is
    not required (gob map-key order is random per Go run; we sort), but
    a second encode of our own output IS byte-stable (deterministic)."""
    for p in FIXTURES:
        (docs,) = gob.decode_gob(p)
        blob = gob.GobEncoder().encode_documents(docs)
        redecoded = gob.GobDecoder(blob).decode()
        assert redecoded == [docs]
        assert gob.GobEncoder().encode_documents(docs) == blob


def test_encoder_zero_field_omission_and_scalars():
    """gob omits zero-valued struct fields; uint/int/float wire forms per
    the encoding/gob spec."""
    enc = gob.GobEncoder
    assert enc.uint_bytes(0x7F) == bytes([0x7F])
    assert enc.uint_bytes(0x80) == bytes([0xFF, 0x80])
    assert enc.int_bytes(-1) == bytes([0x01])
    assert enc.int_bytes(1) == bytes([0x02])
    doc = {"DocID": "", "Rank": 0, "Metadata": {}, "TermFrequencies": {},
           "Features": {}}
    blob = gob.GobEncoder().encode_documents([doc])
    (back,) = gob.GobDecoder(blob).decode()
    # all-zero doc round-trips to the decoder's zero values
    assert back[0]["DocID"] == "" and back[0]["Rank"] == 0
    assert back[0]["Features"]["BM25"] == 0.0


@pytest.mark.skipif(not FIXTURES, reason="reference fixtures not present")
def test_write_documents_gob_dataframe_roundtrip(spark, tmp_path):
    """DataFrame -> .gob -> DataFrame closes the loop: a feature table in
    the engine's schema becomes a file the reference's Go trainer loads
    (internal/datagen/data_loader.go:44-67), and reading it back yields
    the same rows."""
    df = gob.read_documents_gob(spark, FIXTURES[0])
    out = str(tmp_path / "examples_rt.gob")
    gob.write_documents_gob(df, out)
    back = gob.read_documents_gob(spark, out)
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b
