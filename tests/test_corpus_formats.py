"""Corpus-container formats added in round 9: WARC record walk,
mojibake detection/repair, TIFF/EXIF IFD probe (both byte orders) —
unit-level parser behavior plus the Spark fixture/extract pairs behind
warc_record_stats / mojibake_repair_profile / tiff_ifd_probe."""

from __future__ import annotations

import struct

import pytest

from instacart_medallion_lakehouse_spark.operators import multimodal
from instacart_medallion_lakehouse_spark.operators.tiffprobe import parse_tiff
from instacart_medallion_lakehouse_spark.queries_llm import (
    _detect_mojibake,
    _with_mojibake_text,
)


def _warc_record(wtype: str, payload: bytes, rid: str = "r1") -> bytes:
    return (
        f"WARC/1.0\r\nWARC-Type: {wtype}\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode() + payload + b"\r\n\r\n"


class TestWarc:
    def test_walk(self, spark):
        stream = (
            _warc_record("warcinfo", b"software: x")
            + _warc_record("response", b"hello world" * 5)
            + _warc_record("request", b"GET /")
            + _warc_record("response", b"")
        )
        df = spark.createDataFrame(
            [(0, bytearray(stream))], "doc_id long, payload binary"
        )
        r = multimodal.extract_warc_stats(df).collect()[0]
        assert r.n_records == 4
        assert r.n_response == 2
        assert r.total_payload_bytes == 11 + 55 + 5 + 0

    def test_desync_quarantined(self, spark):
        good = _warc_record("response", b"abc")
        bad = good[:-6] + b"xxxxxx"  # clobber the separator
        df = spark.createDataFrame(
            [(0, bytearray(bad)), (1, bytearray(good))],
            "doc_id long, payload binary",
        )
        got = {r.doc_id for r in multimodal.extract_warc_stats(df).collect()}
        assert got == {1}

    def test_fixture_matches_closed_form(self, spark):
        docs = spark.range(0, 30).toDF("doc_id")
        got = {
            r.doc_id: r
            for r in multimodal.extract_warc_stats(
                multimodal.with_warc_media(docs)
            ).collect()
        }
        for d in range(30):
            n = 2 + d % 3
            r = got[d]
            assert r.n_records == n
            assert r.n_response == sum(1 for i in range(n) if (d + i) % 3 == 1)
            assert r.total_payload_bytes == sum(
                10 + (d + i) % 40 for i in range(n)
            )


class TestMojibake:
    def test_detector_semantics(self, spark):
        rows = [
            (0, "plain ascii only"),          # round-trips to itself
            (1, "clean café text"),           # latin-1 bytes not UTF-8
            (2, "cafÃ© mojibake"),            # repairs to 'café mojibake'
            (3, None),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: r for r in _detect_mojibake(df).collect()}
        assert got[0].is_mojibake is False
        assert got[0].n_chars_repaired == len("plain ascii only")
        assert got[1].is_mojibake is False
        assert got[2].is_mojibake is True
        assert got[2].n_chars_repaired == len("café mojibake")
        assert 3 not in got

    def test_fixture_plants_real_corruption(self, spark):
        docs = spark.createDataFrame(
            [(0, "zero"), (1, "one"), (4, "four")],
            "doc_id long, text string",
        )
        texts = {r.doc_id: r.text for r in _with_mojibake_text(docs).collect()}
        assert texts[1] == "café one"
        assert texts[0] == "café zero".encode("utf-8").decode("latin-1")
        assert "Ã©" in texts[4]


class TestTiff:
    def _payload(self, le: bool, w=100, h=50, ori=6, spp=3) -> bytes:
        e = "<" if le else ">"
        hdr = (b"II" if le else b"MM") + struct.pack(e + "H", 42)
        hdr += struct.pack(e + "I", 8)
        ifd = struct.pack(e + "H", 4)
        for tag, val in ((256, w), (257, h), (274, ori), (277, spp)):
            ifd += struct.pack(e + "HHI", tag, 3, 1)
            ifd += struct.pack(e + "H", val) + b"\x00\x00"
        ifd += struct.pack(e + "I", 0)
        return hdr + ifd

    def test_both_byte_orders(self):
        for le in (True, False):
            m = parse_tiff(self._payload(le))
            assert m["byte_order"] == ("II" if le else "MM")
            assert (m["width"], m["height"]) == (100, 50)
            assert m["orientation"] == 6
            assert m["samples_per_pixel"] == 3

    def test_long_type_and_unknown_tags(self):
        e = "<"
        hdr = b"II" + struct.pack(e + "HI", 42, 8)
        ifd = struct.pack(e + "H", 3)
        ifd += struct.pack(e + "HHII", 256, 4, 1, 70000)  # LONG width
        ifd += struct.pack(e + "HHII", 257, 4, 1, 90000)
        ifd += struct.pack(e + "HHII", 999, 4, 1, 1)  # unknown: skipped
        ifd += struct.pack(e + "I", 0)
        m = parse_tiff(hdr + ifd)
        assert (m["width"], m["height"]) == (70000, 90000)

    def test_corrupt(self):
        with pytest.raises(ValueError):
            parse_tiff(b"XX\x2a\x00" + bytes(8))
        with pytest.raises(ValueError):
            parse_tiff(self._payload(True)[:14])

    def test_spark_pair(self, spark):
        docs = spark.range(0, 20).toDF("doc_id")
        got = {
            r.doc_id: r
            for r in multimodal.extract_tiff_meta(
                multimodal.with_tiff_media(docs)
            ).collect()
        }
        for d in range(20):
            r = got[d]
            assert r.byte_order == ("II" if d % 2 == 0 else "MM")
            assert r.width == 16 + d % 640
            assert r.height == 16 + d % 480
            assert r.orientation == 1 + d % 8
            assert r.samples_per_pixel == 1 + d % 4
