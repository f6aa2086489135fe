"""Minimal pure-Python decoder for Go's ``encoding/gob`` streams — the
last interop gap with the reference: its offline ranker persists scored
candidate sets as ``data/raw/examples_*.gob`` holding a ``Documents``
slice (``[]Document`` with nested ``DocumentMetadata``, a
``map[string]int`` term-frequency map, and the 25-field ``Features``
struct) via ``saveData`` (/root/reference/internal/ranking/io.go:14-46,
written at ranker.go:60; re-loaded by
internal/datagen/data_loader.go:44-67).

The wire format implemented here is the one documented publicly in the
Go standard library (``encoding/gob`` package docs): a stream of
length-delimited messages; negative type ids introduce ``wireType``
definitions (themselves gob-encoded with bootstrap type ids 16-23);
positive ids carry a value of that type. Scalars: unsigned ints are a
single byte < 128 or a minus-byte-count prefix; signed ints are
zig-zag; float64 is the byte-reversed IEEE bits as an unsigned int;
strings/bytes are length-prefixed. Structs are (field-delta, value)
pairs terminated by delta 0 with zero-valued fields omitted; slices and
maps are count-prefixed.

Only the subset the reference writes is supported (no interfaces, no
GobEncoder custom types) — anything else raises.

This is a DRIVER-SIDE reader for small fixture files: a .gob file is a
single sequential stream (no splittable structure), so it cannot be a
distributed scan. ``read_documents_gob`` decodes on the driver and
returns a Spark DataFrame; at scale the reference itself would emit
many files, which parallelize per-file via ``gob_paths``.
"""

from __future__ import annotations

import struct as _struct
from typing import Any

from pyspark.sql import DataFrame, SparkSession

# predefined gob type ids (encoding/gob documentation)
_BOOL, _INT, _UINT, _FLOAT, _BYTES, _STRING, _COMPLEX, _INTERFACE = range(1, 9)
_WIRE_TYPE, _ARRAY_T, _COMMON_T, _SLICE_T, _STRUCT_T, _FIELD_T, _FIELD_SLICE, _MAP_T = (
    16, 17, 18, 19, 20, 21, 22, 23,
)

# bootstrap struct descriptors: {field_index: (name, typeid)}
_BOOTSTRAP: dict[int, dict] = {
    _WIRE_TYPE: {
        "kind": "struct",
        "fields": [
            ("ArrayT", _ARRAY_T), ("SliceT", _SLICE_T), ("StructT", _STRUCT_T),
            ("MapT", _MAP_T), ("GobEncoderT", -1), ("BinaryMarshalerT", -1),
            ("TextMarshalerT", -1),
        ],
    },
    _ARRAY_T: {
        "kind": "struct",
        "fields": [("CommonType", _COMMON_T), ("Elem", _INT), ("Len", _INT)],
    },
    _COMMON_T: {"kind": "struct", "fields": [("Name", _STRING), ("Id", _INT)]},
    _SLICE_T: {
        "kind": "struct",
        "fields": [("CommonType", _COMMON_T), ("Elem", _INT)],
    },
    _STRUCT_T: {
        "kind": "struct",
        "fields": [("CommonType", _COMMON_T), ("Field", _FIELD_SLICE)],
    },
    _FIELD_T: {"kind": "struct", "fields": [("Name", _STRING), ("Id", _INT)]},
    _FIELD_SLICE: {"kind": "slice", "elem": _FIELD_T},
    _MAP_T: {
        "kind": "struct",
        "fields": [("CommonType", _COMMON_T), ("Key", _INT), ("Elem", _INT)],
    },
}


class GobDecoder:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.types: dict[int, dict] = dict(_BOOTSTRAP)

    # -- scalars ------------------------------------------------------------
    def _byte(self) -> int:
        b = self.data[self.pos]
        self.pos += 1
        return b

    def read_uint(self) -> int:
        b = self._byte()
        if b < 0x80:
            return b
        n = 256 - b
        if not 1 <= n <= 8:
            raise ValueError(f"bad uint byte count {n} at {self.pos}")
        v = int.from_bytes(self.data[self.pos : self.pos + n], "big")
        self.pos += n
        return v

    def read_int(self) -> int:
        u = self.read_uint()
        return ~(u >> 1) if u & 1 else u >> 1

    def read_float(self) -> float:
        u = self.read_uint()
        return _struct.unpack("<d", u.to_bytes(8, "big"))[0]

    def read_bytes(self) -> bytes:
        n = self.read_uint()
        v = self.data[self.pos : self.pos + n]
        self.pos += n
        return bytes(v)

    # -- values -------------------------------------------------------------
    def _zero(self, typeid: int) -> Any:
        if typeid == _BOOL:
            return False
        if typeid in (_INT, _UINT):
            return 0
        if typeid == _FLOAT:
            return 0.0
        if typeid == _BYTES:
            return b""
        if typeid == _STRING:
            return ""
        t = self.types.get(typeid)
        if t is None:
            # unreferenced placeholder (e.g. the GobEncoderT wireType
            # fields the reference never uses) — zero value is "absent"
            return None
        if t["kind"] == "struct":
            return {name: self._zero(fid) for name, fid in t["fields"]}
        if t["kind"] in ("slice", "array"):
            return []
        if t["kind"] == "map":
            return {}
        raise ValueError(f"no zero for {t}")

    def read_value(self, typeid: int) -> Any:
        if typeid == _BOOL:
            return self.read_uint() != 0
        if typeid == _INT:
            return self.read_int()
        if typeid == _UINT:
            return self.read_uint()
        if typeid == _FLOAT:
            return self.read_float()
        if typeid == _BYTES:
            return self.read_bytes()
        if typeid == _STRING:
            return self.read_bytes().decode("utf-8")
        t = self.types.get(typeid)
        if t is None:
            raise ValueError(f"unsupported/unknown type id {typeid}")
        kind = t["kind"]
        if kind == "struct":
            out = {name: self._zero(fid) for name, fid in t["fields"]}
            fieldnum = -1
            while True:
                delta = self.read_uint()
                if delta == 0:
                    break
                fieldnum += delta
                name, fid = t["fields"][fieldnum]
                out[name] = self.read_value(fid)
            return out
        if kind in ("slice", "array"):
            n = self.read_uint()
            return [self.read_value(t["elem"]) for _ in range(n)]
        if kind == "map":
            n = self.read_uint()
            return {
                self.read_value(t["key"]): self.read_value(t["elem"])
                for _ in range(n)
            }
        raise ValueError(f"unsupported kind {kind}")

    # -- type definitions ---------------------------------------------------
    def _register(self, typeid: int) -> None:
        wire = self.read_value(_WIRE_TYPE)
        if wire.get("StructT") and wire["StructT"]["CommonType"]["Name"]:
            self.types[typeid] = {
                "kind": "struct",
                "fields": [(f["Name"], f["Id"]) for f in wire["StructT"]["Field"]],
            }
        elif wire.get("SliceT") and (
            wire["SliceT"]["Elem"] or wire["SliceT"]["CommonType"]["Name"]
        ):
            self.types[typeid] = {"kind": "slice", "elem": wire["SliceT"]["Elem"]}
        elif wire.get("MapT") and wire["MapT"]["Elem"]:
            self.types[typeid] = {
                "kind": "map",
                "key": wire["MapT"]["Key"],
                "elem": wire["MapT"]["Elem"],
            }
        elif wire.get("ArrayT") and wire["ArrayT"]["CommonType"]["Name"]:
            self.types[typeid] = {
                "kind": "array",
                "elem": wire["ArrayT"]["Elem"],
                "len": wire["ArrayT"]["Len"],
            }
        else:
            raise ValueError(f"cannot interpret wireType for {typeid}: {wire}")

    # -- stream -------------------------------------------------------------
    def decode(self) -> list[Any]:
        """Decode every top-level value in the stream."""
        values: list[Any] = []
        while self.pos < len(self.data):
            _msg_len = self.read_uint()
            typeid = self.read_int()
            if typeid < 0:
                self._register(-typeid)
                continue
            t = self.types.get(typeid)
            if not (t and t.get("kind") == "struct"):
                # non-struct top-level values are wrapped as a singleton
                # "struct" with one field: a delta byte precedes the value
                delta = self.read_uint()
                if delta != 0:
                    raise ValueError(f"bad singleton delta {delta}")
            values.append(self.read_value(typeid))
        return values


def decode_gob(path: str) -> list[Any]:
    with open(path, "rb") as f:
        return GobDecoder(f.read()).decode()


# ---------------------------------------------------------------------------
# Documents fixture -> Spark
# ---------------------------------------------------------------------------

DOCUMENTS_GOB_SCHEMA = (
    "doc_id string, rank int, doc_length int, url string, "
    "covered_query_term_number int, covered_query_term_ratio double, "
    "sum_tf long, min_tf long, max_tf long, mean_tf double, var_tf double, "
    "stream_length long, sum_ntf double, min_ntf double, max_ntf double, "
    "mean_ntf double, var_ntf double, sum_tfidf double, min_tfidf double, "
    "max_tfidf double, mean_tfidf double, var_tfidf double, bm25 double, "
    "num_slashes_in_url int, length_of_url int, inlink_count int, "
    "outlink_count int, pagerank double"
)

_FEATURE_MAP = [
    ("covered_query_term_number", "CoveredQueryTermNumber"),
    ("covered_query_term_ratio", "CoveredQueryTermRatio"),
    ("sum_tf", "SumTermFrequency"),
    ("min_tf", "MinTermFrequency"),
    ("max_tf", "MaxTermFrequency"),
    ("mean_tf", "MeanTermFrequency"),
    ("var_tf", "VarianceTermFrequency"),
    ("stream_length", "StreamLength"),
    ("sum_ntf", "SumStreamLengthNormalizedTF"),
    ("min_ntf", "MinStreamLengthNormalizedTF"),
    ("max_ntf", "MaxStreamLengthNormalizedTF"),
    ("mean_ntf", "MeanStreamLengthNormalizedTF"),
    ("var_ntf", "VarianceStreamLengthNormalizedTF"),
    ("sum_tfidf", "SumTFIDF"),
    ("min_tfidf", "MinTFIDF"),
    ("max_tfidf", "MaxTFIDF"),
    ("mean_tfidf", "MeanTFIDF"),
    ("var_tfidf", "VarianceTFIDF"),
    ("bm25", "BM25"),
    ("num_slashes_in_url", "NumSlashesInURL"),
    ("length_of_url", "LengthOfURL"),
    ("inlink_count", "InlinkCount"),
    ("outlink_count", "OutlinkCount"),
    ("pagerank", "PageRank"),
]


def _doc_row(d: dict) -> tuple:
    feats = d.get("Features", {})
    meta = d.get("Metadata", {})
    return (
        d.get("DocID", ""),
        int(d.get("Rank", 0)),
        int(meta.get("DocLength", 0)),
        meta.get("URL", ""),
        *[
            (float(feats.get(go, 0)) if col_go_is_float(go) else int(feats.get(go, 0)))
            for _name, go in _FEATURE_MAP
        ],
    )


_INT_FEATURES = {
    "CoveredQueryTermNumber", "SumTermFrequency", "MinTermFrequency",
    "MaxTermFrequency", "StreamLength", "NumSlashesInURL", "LengthOfURL",
    "InlinkCount", "OutlinkCount",
}


def col_go_is_float(go_name: str) -> bool:
    return go_name not in _INT_FEATURES


def read_documents_gob(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """Read one or more reference ``examples_*.gob`` fixture files into a
    DataFrame with the engine's feature-vector column names (S6/S8 twin,
    feature order per /root/reference/internal/datagen/data_loader.go:96-117)."""
    if isinstance(paths, str):
        paths = [paths]
    rows: list[tuple] = []
    for p in paths:
        for value in decode_gob(p):
            if isinstance(value, list):  # Documents slice
                rows.extend(_doc_row(d) for d in value)
    return spark.createDataFrame(rows, DOCUMENTS_GOB_SCHEMA)


# ---------------------------------------------------------------------------
# write side: encode Documents back to the reference's .gob dump format
# ---------------------------------------------------------------------------

# the exact type graph the reference's saveData emits
# (/root/reference/internal/ranking/io.go:14-46 via gob.NewEncoder on a
# Documents value; struct shapes per internal/ranking/types.go). Ids and
# DEFINITION ORDER replicate an actual reference fixture stream, so our
# own reader — and Go's decoder, which follows the same documented wire
# format — accept the output.
_GO_FEATURE_FIELDS = [
    ("CoveredQueryTermNumber", _INT), ("CoveredQueryTermRatio", _FLOAT),
    ("SumTermFrequency", _INT), ("MinTermFrequency", _INT),
    ("MaxTermFrequency", _INT), ("MeanTermFrequency", _FLOAT),
    ("VarianceTermFrequency", _FLOAT), ("StreamLength", _INT),
    ("SumStreamLengthNormalizedTF", _FLOAT),
    ("MinStreamLengthNormalizedTF", _FLOAT),
    ("MaxStreamLengthNormalizedTF", _FLOAT),
    ("MeanStreamLengthNormalizedTF", _FLOAT),
    ("VarianceStreamLengthNormalizedTF", _FLOAT),
    ("SumTFIDF", _FLOAT), ("MinTFIDF", _FLOAT), ("MaxTFIDF", _FLOAT),
    ("MeanTFIDF", _FLOAT), ("VarianceTFIDF", _FLOAT), ("BM25", _FLOAT),
    ("NumSlashesInURL", _INT), ("LengthOfURL", _INT), ("InlinkCount", _INT),
    ("OutlinkCount", _INT), ("PageRank", _FLOAT),
]

_GO_TYPES: dict[int, tuple[str, dict]] = {
    68: ("Documents", {"kind": "slice", "elem": 64}),
    64: ("Document", {"kind": "struct", "fields": [
        ("DocID", _STRING), ("Rank", _INT), ("Metadata", 65),
        ("TermFrequencies", 66), ("Features", 67),
    ]}),
    65: ("DocumentMetadata", {"kind": "struct", "fields": [
        ("DocLength", _INT), ("TimeLastUpdated", _STRING),
        ("FileType", _STRING), ("ImageCount", _INT),
        ("DocTitle", _STRING), ("URL", _STRING),
    ]}),
    66: ("map[string]int", {"kind": "map", "key": _STRING, "elem": _INT}),
    67: ("Features", {"kind": "struct", "fields": _GO_FEATURE_FIELDS}),
}
_GO_DEF_ORDER = [68, 64, 65, 66, 67]


class GobEncoder:
    """Encoder mirror of :class:`GobDecoder` for the reference's
    ``Documents`` dump — the S8 write-side twin, so example files can be
    fed BACK to the reference's Go trainer
    (internal/datagen/data_loader.go:44-67). Pinned by a byte/value
    round-trip test against all four reference fixtures."""

    def __init__(self):
        self.out = bytearray()
        self.types: dict[int, dict] = dict(_BOOTSTRAP)
        for tid, (_name, desc) in _GO_TYPES.items():
            self.types[tid] = desc

    # -- scalars --------------------------------------------------------------
    @staticmethod
    def uint_bytes(v: int) -> bytes:
        if v < 0x80:
            return bytes([v])
        b = v.to_bytes((v.bit_length() + 7) // 8, "big")
        return bytes([256 - len(b)]) + b

    @classmethod
    def int_bytes(cls, v: int) -> bytes:
        u = (v << 1) if v >= 0 else ((~v << 1) | 1)
        return cls.uint_bytes(u)

    @classmethod
    def float_bytes(cls, v: float) -> bytes:
        u = int.from_bytes(_struct.pack("<d", float(v)), "big")
        return cls.uint_bytes(u)

    @classmethod
    def string_bytes(cls, s: str) -> bytes:
        b = s.encode("utf-8")
        return cls.uint_bytes(len(b)) + b

    # -- values ---------------------------------------------------------------
    def _is_zero(self, typeid: int, v: Any) -> bool:
        if v is None:
            return True
        if typeid == _BOOL:
            return not v
        if typeid in (_INT, _UINT):
            return v == 0
        if typeid == _FLOAT:
            return v == 0.0
        if typeid in (_BYTES, _STRING):
            return len(v) == 0
        t = self.types[typeid]
        if t["kind"] == "struct":
            return all(self._is_zero(fid, v.get(name)) for name, fid in t["fields"])
        return len(v) == 0  # slice/array/map: empty is zero

    def value_bytes(self, typeid: int, v: Any) -> bytes:
        if typeid == _BOOL:
            return self.uint_bytes(1 if v else 0)
        if typeid == _INT:
            return self.int_bytes(int(v))
        if typeid == _UINT:
            return self.uint_bytes(int(v))
        if typeid == _FLOAT:
            return self.float_bytes(v)
        if typeid == _BYTES:
            return self.uint_bytes(len(v)) + bytes(v)
        if typeid == _STRING:
            return self.string_bytes(v)
        t = self.types[typeid]
        kind = t["kind"]
        if kind == "struct":
            out = bytearray()
            prev = -1
            for idx, (name, fid) in enumerate(t["fields"]):
                fv = (v or {}).get(name)
                if fv is None or self._is_zero(fid, fv):
                    continue  # gob omits zero-valued fields
                out += self.uint_bytes(idx - prev)
                out += self.value_bytes(fid, fv)
                prev = idx
            out += self.uint_bytes(0)  # terminator
            return bytes(out)
        if kind in ("slice", "array"):
            out = bytearray(self.uint_bytes(len(v)))
            for item in v:
                out += self.value_bytes(t["elem"], item)
            return bytes(out)
        if kind == "map":
            # deterministic key order (Go's map order is random per run;
            # any order decodes identically)
            out = bytearray(self.uint_bytes(len(v)))
            for k in sorted(v):
                out += self.value_bytes(t["key"], k)
                out += self.value_bytes(t["elem"], v[k])
            return bytes(out)
        raise ValueError(f"cannot encode kind {kind}")

    # -- messages -------------------------------------------------------------
    def _message(self, payload: bytes) -> None:
        self.out += self.uint_bytes(len(payload)) + payload

    def _wire_def(self, typeid: int) -> dict:
        name, desc = _GO_TYPES[typeid]
        common = {"Name": name, "Id": typeid}
        if desc["kind"] == "struct":
            return {"StructT": {
                "CommonType": common,
                "Field": [{"Name": n, "Id": fid} for n, fid in desc["fields"]],
            }}
        if desc["kind"] == "slice":
            return {"SliceT": {"CommonType": common, "Elem": desc["elem"]}}
        if desc["kind"] == "map":
            return {"MapT": {
                "CommonType": common, "Key": desc["key"], "Elem": desc["elem"],
            }}
        raise ValueError(desc["kind"])

    def encode_documents(self, docs: list[dict]) -> bytes:
        """One gob stream holding one ``Documents`` value — the decoded
        shape ``decode_gob`` returns (list of Document dicts)."""
        for tid in _GO_DEF_ORDER:
            self._message(
                self.int_bytes(-tid) + self.value_bytes(_WIRE_TYPE, self._wire_def(tid))
            )
        # non-struct top-level value: zero field-delta precedes the value
        self._message(
            self.int_bytes(68) + self.uint_bytes(0) + self.value_bytes(68, docs)
        )
        return bytes(self.out)


def encode_documents_gob(docs: list[dict], path: str) -> None:
    with open(path, "wb") as f:
        f.write(GobEncoder().encode_documents(docs))


def write_documents_gob(df: DataFrame, path: str) -> None:
    """Inverse of :func:`read_documents_gob`: a DataFrame in the engine's
    feature-vector schema (DOCUMENTS_GOB_SCHEMA column names; extra
    columns ignored, missing ones default to zero) becomes one reference
    ``examples_*.gob`` dump. Driver-side like the reader — the reference
    emits one modest file per query (ranker.go:60), not a distributed
    table; shard per query upstream for many files."""
    cols = set(df.columns)
    docs = []
    for r in df.collect():
        d = r.asDict()
        feats = {
            go: (float(d.get(col, 0) or 0) if col_go_is_float(go) else int(d.get(col, 0) or 0))
            for col, go in _FEATURE_MAP
        }
        meta = {
            "DocLength": int(d.get("doc_length", 0) or 0),
            "URL": d.get("url", "") or "",
        }
        doc = {
            "DocID": d.get("doc_id", "") or "",
            "Rank": int(d.get("rank", 0) or 0),
            "Metadata": meta,
            "TermFrequencies": d.get("term_frequencies", {}) or {},
            "Features": feats,
        }
        docs.append(doc)
    _ = cols
    encode_documents_gob(docs, path)
