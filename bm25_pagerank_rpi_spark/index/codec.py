"""Posting-block codec: delta-gap + varint doc ids, varint tfs, float64
score factors, per-block max-score metadata.

The reference keeps postings as uncompressed JSON served per term
(/root/reference/internal/ranking/data_getters.go:43-76 — {docID,
frequency, positions}). At 10^12-turn scale that layout is untenable;
this codec gives the standard inverted-index physical format
(docID-sorted, delta-gap + varint — cf. the block-max WAND literature,
PAPERS.md) while remaining a pure data-plane concern behind Arrow UDFs.

All encode/decode paths are vectorized NumPy — no per-value Python loops
(the loops below run over BYTE-WIDTH (<=10) or are bitwise scatter/gather,
i.e. O(max_varint_len) numpy passes, not O(n) Python iterations).

Block layout (one row per block in the `index_blocks` table):
  term        string   — the token
  block_id    int      — ordinal of the block within the term (doc order)
  count       int      — number of postings
  min_doc / max_doc    — int64 doc-int bounds (for skipping)
  max_factor / min_factor — float64 bounds of the BM25 tf/length factor
      factor := (k1+1)*tf / (tf + k1*(1-b+b*dl/avgdl))
      (score contribution of a posting = idf_term * factor; the block's
      score upper bound for WAND = idf*max_factor if idf>=0 else
      idf*min_factor — both stored so sign-aware bounds work)
  docs_enc    binary   — varint(delta-gap(doc_ints))
  tfs_enc     binary   — varint(tf - 1)   (tf >= 1 always in a built index)
  factors_enc binary   — raw little-endian float64 array (exactness required
      for rank-identical parity; quantization would break the 1e-12 bound)
"""

from __future__ import annotations

import numpy as np

DEFAULT_BLOCK_SIZE = 4096


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-style varint encoding of a uint64 array, vectorized."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # bytes needed per value: ceil(bitlen/7), min 1
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    # bit length via 10 shift rounds (uint64 max -> 10 varint bytes)
    nbytes = np.ones(v.shape, dtype=np.int64)
    tmp = tmp >> np.uint64(7)
    while tmp.any():
        nbytes += (tmp > 0).astype(np.int64)
        tmp = tmp >> np.uint64(7)
    del nbits
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    for j in range(int(nbytes.max())):
        mask = nbytes > j
        idx = starts[mask] + j
        byte = ((v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] > (j + 1)).astype(np.uint8) << 7
        out[idx] = byte | cont
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Inverse of ``varint_encode`` — fully vectorized boundary discovery."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = (b & 0x80) == 0  # terminal byte of each value
    n_values = int(ends.sum())
    # value id of each byte = number of terminals strictly before it
    value_id = np.concatenate(([0], np.cumsum(ends)[:-1]))
    starts = np.flatnonzero(np.concatenate(([True], ends[:-1])))
    byte_pos = np.arange(b.size, dtype=np.int64) - starts[value_id]
    values = np.zeros(n_values, dtype=np.uint64)
    np.bitwise_or.at(
        values, value_id, (b & np.uint8(0x7F)).astype(np.uint64) << (7 * byte_pos).astype(np.uint64)
    )
    return values


def delta_encode(doc_ints: np.ndarray) -> np.ndarray:
    d = np.ascontiguousarray(doc_ints, dtype=np.int64)
    if d.size == 0:
        return np.empty(0, dtype=np.uint64)
    out = np.empty(d.size, dtype=np.uint64)
    out[0] = np.uint64(d[0])
    out[1:] = np.diff(d).astype(np.uint64)
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    if gaps.size == 0:
        return np.empty(0, dtype=np.int64)
    return np.cumsum(gaps.astype(np.int64))


def encode_block(doc_ints: np.ndarray, tfs: np.ndarray, factors: np.ndarray) -> dict:
    """Encode one docID-sorted block. Returns the block-row dict (without
    term/block_id, which the caller owns)."""
    d = np.ascontiguousarray(doc_ints, dtype=np.int64)
    t = np.ascontiguousarray(tfs, dtype=np.int64)
    f = np.ascontiguousarray(factors, dtype=np.float64)
    assert d.size == t.size == f.size and d.size > 0
    assert (np.diff(d) > 0).all(), "doc ids must be strictly increasing"
    return {
        "count": int(d.size),
        "min_doc": int(d[0]),
        "max_doc": int(d[-1]),
        "max_factor": float(f.max()),
        "min_factor": float(f.min()),
        "docs_enc": varint_encode(delta_encode(d)),
        "tfs_enc": varint_encode((t - 1).astype(np.uint64)),
        "factors_enc": f.tobytes(),
    }


def decode_block(row) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(doc_ints int64, tfs int64, factors float64) from a block row
    (dict-like or object with attributes)."""
    get = row.get if hasattr(row, "get") else lambda k: getattr(row, k)
    docs = delta_decode(varint_decode(bytes(get("docs_enc"))))
    tfs = varint_decode(bytes(get("tfs_enc"))).astype(np.int64) + 1
    factors = np.frombuffer(bytes(get("factors_enc")), dtype=np.float64)
    return docs, tfs, factors


def blocks_for_term(
    doc_ints: np.ndarray,
    tfs: np.ndarray,
    factors: np.ndarray,
    block_size: int = DEFAULT_BLOCK_SIZE,
    first_block_id: int = 0,
) -> list[dict]:
    """Split a term's docID-sorted postings into fixed-size encoded blocks."""
    order = np.argsort(doc_ints, kind="stable")
    d, t, f = doc_ints[order], tfs[order], factors[order]
    out = []
    for i, start in enumerate(range(0, d.size, block_size)):
        sl = slice(start, start + block_size)
        blk = encode_block(d[sl], t[sl], f[sl])
        blk["block_id"] = first_block_id + i
        out.append(blk)
    return out
