"""Codec round-trip + block-metadata invariants (SURVEY.md §5 item 4)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bm25_pagerank_rpi_spark.index import codec


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    out = codec.varint_decode(codec.varint_encode(arr))
    assert out.tolist() == vals


def test_varint_known_bytes():
    # classic LEB128: 300 -> 0xAC 0x02
    assert codec.varint_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"
    assert codec.varint_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert codec.varint_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert codec.varint_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"


@given(
    st.lists(
        st.integers(min_value=0, max_value=10**12), min_size=1, max_size=500, unique=True
    )
)
@settings(max_examples=100, deadline=None)
def test_block_roundtrip(doc_ints):
    doc_ints = np.array(sorted(doc_ints), dtype=np.int64)
    rng = np.random.default_rng(7)
    tfs = rng.integers(1, 1000, size=doc_ints.size).astype(np.int64)
    factors = rng.random(doc_ints.size)
    blk = codec.encode_block(doc_ints, tfs, factors)
    d, t, f = codec.decode_block(blk)
    assert (d == doc_ints).all()
    assert (t == tfs).all()
    assert (f == factors).all()  # bit-exact float64
    assert blk["min_doc"] == doc_ints[0] and blk["max_doc"] == doc_ints[-1]
    assert blk["max_factor"] >= f.max() and blk["min_factor"] <= f.min()


def test_blocks_for_term_split_and_order():
    n = 10_000
    rng = np.random.default_rng(3)
    docs = np.sort(rng.choice(10**9, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 50, n).astype(np.int64)
    factors = rng.random(n)
    # feed unsorted — blocks_for_term must sort
    perm = rng.permutation(n)
    blocks = codec.blocks_for_term(docs[perm], tfs[perm], factors[perm], block_size=4096)
    assert [b["block_id"] for b in blocks] == [0, 1, 2]
    assert sum(b["count"] for b in blocks) == n
    all_docs, all_tfs, all_f = [], [], []
    prev_max = -1
    for b in blocks:
        d, t, f = codec.decode_block(b)
        assert d[0] > prev_max  # blocks disjoint and ordered
        prev_max = int(d[-1])
        all_docs.append(d)
        all_tfs.append(t)
        all_f.append(f)
    assert (np.concatenate(all_docs) == docs).all()
    assert (np.concatenate(all_tfs) == tfs).all()
    assert (np.concatenate(all_f) == factors).all()


def test_compression_ratio_dense_docs():
    # dense doc ids (gaps ~ small) should compress far below 8 bytes/doc
    docs = np.arange(0, 100_000, 3, dtype=np.int64)
    tfs = np.ones(docs.size, dtype=np.int64)
    factors = np.zeros(docs.size)
    blk = codec.encode_block(docs, tfs, factors)
    assert len(blk["docs_enc"]) < docs.size * 2  # ~1 byte/gap
    assert len(blk["tfs_enc"]) == docs.size  # tf-1=0 -> 1 byte each


def test_encode_block_rejects_duplicates():
    with pytest.raises(AssertionError):
        codec.encode_block(
            np.array([1, 1], dtype=np.int64),
            np.array([1, 1], dtype=np.int64),
            np.array([0.1, 0.2]),
        )
