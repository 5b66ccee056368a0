"""Parquet footer probe: a hand-written Thrift compact-protocol
reader over the FileMetaData struct.

The capstone of the probe family: the lakehouse's OWN storage format,
parsed from bytes. A parquet file ends with [footer][footer_len:4 LE]
["PAR1"]; the footer is a Thrift compact-protocol FileMetaData
struct. This module implements the compact protocol generically
(zigzag varints, short/long field headers with field-id deltas,
list headers, recursive skip for every type — THRIFT compact spec)
and extracts the triage fields an ingest wants without any parquet
library: format version, row count, row-group count, leaf-column
count, and the writer's created_by string. pyarrow sits only on the
fixture side (multimodal.with_parquet_media writes real files), so
the parse is genuinely independent — the same fabricate-with-stdlib /
parse-by-hand discipline as the ZIP/TAR walks.

Why it matters at 100 TB: footer-only reads are how a catalog/ingest
sizes a petabyte of unregistered parquet (row counts, schema shape,
writer provenance) at O(footer bytes) per file — no column data is
touched. Spark's own scanner does this internally; doing it by hand
proves the engine understands its own substrate.

Scalar by design — runs inside Arrow mapInPandas batches
(multimodal.extract_parquet_meta).
"""

from __future__ import annotations

import struct

# thrift compact type ids
_STOP = 0
_TRUE = 1
_FALSE = 2
_BYTE = 3
_I16 = 4
_I32 = 5
_I64 = 6
_DOUBLE = 7
_BINARY = 8
_LIST = 9
_SET = 10
_MAP = 11
_STRUCT = 12


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def byte(self) -> int:
        b = self.buf[self.pos]
        self.pos += 1
        return b

    def varint(self) -> int:
        out = 0
        shift = 0
        while True:
            b = self.byte()
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out
            shift += 7
            if shift > 70:
                raise ValueError("parquet: runaway varint")

    def zigzag(self) -> int:
        v = self.varint()
        return (v >> 1) ^ -(v & 1)

    def skip(self, ttype: int) -> None:
        if ttype in (_TRUE, _FALSE):
            return
        if ttype == _BYTE:
            self.pos += 1
        elif ttype in (_I16, _I32, _I64):
            self.varint()
        elif ttype == _DOUBLE:
            self.pos += 8
        elif ttype == _BINARY:
            # NB: two statements — `self.pos += self.varint()` would
            # read the OLD pos before varint() advances it
            ln = self.varint()
            self.pos += ln
        elif ttype in (_LIST, _SET):
            size, etype = self.list_header()
            if etype in (_TRUE, _FALSE):
                # compact protocol encodes bool LIST ELEMENTS as one
                # byte each (unlike bool struct fields, which live in
                # the field header) — a zero-width skip would desync
                # the whole footer walk
                self.pos += size
            else:
                for _ in range(size):
                    self.skip(etype)
        elif ttype == _MAP:
            size = self.varint()
            if size:
                kv = self.byte()
                for _ in range(size):
                    self.skip(kv >> 4)
                    self.skip(kv & 0x0F)
        elif ttype == _STRUCT:
            fid = 0
            while True:
                hdr = self.byte()
                if hdr == _STOP:
                    return
                delta = hdr >> 4
                ftype = hdr & 0x0F
                fid = fid + delta if delta else self.zigzag()
                self.skip(ftype)
        else:
            raise ValueError(f"parquet: unknown thrift type {ttype}")

    def list_header(self) -> tuple[int, int]:
        hdr = self.byte()
        size = hdr >> 4
        if size == 15:
            size = self.varint()
        return size, hdr & 0x0F


def _schema_element_children(r: "_Reader") -> int:
    """Walk one SchemaElement struct, returning its num_children
    (field 5, i32; 0 when absent — i.e. a LEAF column)."""
    fid = 0
    children = 0
    while True:
        hdr = r.byte()
        if hdr == _STOP:
            return children
        delta = hdr >> 4
        ftype = hdr & 0x0F
        fid = fid + delta if delta else r.zigzag()
        if fid == 5 and ftype == _I32:
            children = r.zigzag()
        else:
            r.skip(ftype)


def parse_parquet_footer(payload: bytes) -> dict:
    """Probe the FileMetaData struct: version, num_rows,
    n_row_groups, n_columns (LEAF schema elements — num_children
    absent or 0, so group nodes of nested struct/list/map columns are
    not counted), created_by. Raises on bad magic / truncated
    footer."""
    n = len(payload)
    if n < 12 or payload[:4] != b"PAR1" or payload[-4:] != b"PAR1":
        raise ValueError("parquet: bad magic")
    (flen,) = struct.unpack_from("<I", payload, n - 8)
    start = n - 8 - flen
    if start < 4:
        raise ValueError("parquet: footer length exceeds file")
    r = _Reader(payload, start)
    version = num_rows = None
    n_schema = n_row_groups = None
    created_by = None
    fid = 0
    while True:
        hdr = r.byte()
        if hdr == _STOP:
            break
        delta = hdr >> 4
        ftype = hdr & 0x0F
        fid = fid + delta if delta else r.zigzag()
        if fid == 1 and ftype == _I32:
            version = r.zigzag()
        elif fid == 2 and ftype == _LIST:  # schema: list<SchemaElement>
            size, etype = r.list_header()
            if etype != _STRUCT:
                raise ValueError("parquet: schema list of non-structs")
            n_schema = 0  # leaf count (root + group nodes excluded)
            for i in range(size):
                if _schema_element_children(r) == 0 and i > 0:
                    n_schema += 1
        elif fid == 3 and ftype == _I64:
            num_rows = r.zigzag()
        elif fid == 4 and ftype == _LIST:  # row_groups
            size, etype = r.list_header()
            n_row_groups = size
            for _ in range(size):
                r.skip(etype)
        elif fid == 6 and ftype == _BINARY:
            ln = r.varint()
            created_by = r.buf[r.pos : r.pos + ln].decode(
                "utf-8", "replace"
            )
            r.pos += ln
        else:
            r.skip(ftype)
    if version is None or num_rows is None or n_schema is None:
        raise ValueError("parquet: required FileMetaData fields missing")
    return {
        "version": version,
        "num_rows": num_rows,
        "n_row_groups": n_row_groups or 0,
        "n_columns": n_schema,  # leaf elements only (see above)
        "created_by": created_by,
    }
