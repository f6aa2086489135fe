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
