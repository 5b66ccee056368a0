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


class TestArchives:
    def _zip(self, members):
        import io
        import zipfile

        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            for name, body, stored in members:
                zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
                z.writestr(
                    zi,
                    body,
                    compress_type=(
                        zipfile.ZIP_STORED if stored else zipfile.ZIP_DEFLATED
                    ),
                )
        return buf.getvalue()

    def test_zip_walk(self):
        from instacart_medallion_lakehouse_spark.operators.archiveprobe import (
            parse_zip,
        )

        p = self._zip(
            [("a.txt", b"12345", True), ("b/c.txt", b"x" * 100, False)]
        )
        m = parse_zip(p)
        assert m["n_members"] == 2
        assert m["n_stored"] == 1
        assert m["total_uncompressed"] == 105
        assert m["members"] == ["a.txt", "b/c.txt"]
        with pytest.raises(ValueError):
            parse_zip(p[: len(p) // 2])  # EOCD gone
        with pytest.raises(ValueError):
            parse_zip(b"not an archive")

    def test_tar_walk_and_checksum(self):
        import io
        import tarfile

        from instacart_medallion_lakehouse_spark.operators.archiveprobe import (
            parse_tar,
        )

        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as t:
            for i, size in enumerate((1, 511, 512, 513)):
                ti = tarfile.TarInfo(f"f{i}")
                ti.size = size
                ti.mtime = 0
                t.addfile(ti, io.BytesIO(b"z" * size))
        m = parse_tar(buf.getvalue())
        assert m["n_members"] == 4
        assert m["total_file_bytes"] == 1 + 511 + 512 + 513
        corrupted = bytearray(buf.getvalue())
        corrupted[0] ^= 0xFF
        with pytest.raises(ValueError, match="checksum"):
            parse_tar(bytes(corrupted))

    def test_spark_pairs(self, spark):
        docs = spark.range(0, 20).toDF("doc_id")
        zs = {
            r.doc_id: r
            for r in multimodal.extract_zip_stats(
                multimodal.with_zip_media(docs)
            ).collect()
        }
        ts = {
            r.doc_id: r
            for r in multimodal.extract_tar_stats(
                multimodal.with_tar_media(docs)
            ).collect()
        }
        for d in range(20):
            kz = 1 + d % 5
            assert zs[d].n_members == kz
            assert zs[d].total_uncompressed == sum(
                5 + (d + i) % 20 for i in range(kz)
            )
            assert zs[d].n_stored == sum(
                1 for i in range(kz) if (d + i) % 2 == 0
            )
            kt = 1 + d % 4
            assert ts[d].n_members == kt
            assert ts[d].total_file_bytes == sum(
                5 + (d + i) % 20 for i in range(kt)
            )


class TestParquetFooter:
    def test_flat_and_multi_row_group(self):
        import io

        import pyarrow as pa
        import pyarrow.parquet as pq

        from instacart_medallion_lakehouse_spark.operators.parquetprobe import (
            parse_parquet_footer,
        )

        t = pa.table({f"c{j}": list(range(120)) for j in range(3)})
        buf = io.BytesIO()
        pq.write_table(t, buf, row_group_size=40)
        m = parse_parquet_footer(buf.getvalue())
        assert m["num_rows"] == 120
        assert m["n_row_groups"] == 3
        assert m["n_columns"] == 3
        assert m["created_by"] and "arrow" in m["created_by"]

    def test_real_testdata_files_agree_with_duckdb(self, sf_dir):
        import glob
        import os

        import duckdb

        from instacart_medallion_lakehouse_spark.operators.parquetprobe import (
            parse_parquet_footer,
        )

        files = sorted(glob.glob(os.path.join(sf_dir, "*.parquet")))
        if not files:
            pytest.skip("no testdata")
        for f in files:
            m = parse_parquet_footer(open(f, "rb").read())
            (n,) = duckdb.sql(
                f"SELECT count(*) FROM read_parquet('{f}')"
            ).fetchone()
            assert m["num_rows"] == n, f
            assert m["n_row_groups"] >= 1

    def test_nested_schema_counts_leaves_only(self):
        import io

        import pyarrow as pa
        import pyarrow.parquet as pq

        from instacart_medallion_lakehouse_spark.operators.parquetprobe import (
            parse_parquet_footer,
        )

        # struct column (group node + 2 leaves) + 1 flat column:
        # 3 leaves, not 4 schema elements
        t = pa.table({"s": [{"a": 1, "b": 2}], "x": [1]})
        buf = io.BytesIO()
        pq.write_table(t, buf)
        assert parse_parquet_footer(buf.getvalue())["n_columns"] == 3

    def test_corrupt(self):
        from instacart_medallion_lakehouse_spark.operators.parquetprobe import (
            parse_parquet_footer,
        )

        with pytest.raises(ValueError):
            parse_parquet_footer(b"PAR1xxPAR1")
        with pytest.raises(ValueError):
            parse_parquet_footer(b"notparquet")

    def test_spark_pair(self, spark):
        docs = spark.range(0, 24).toDF("doc_id")
        got = {
            r.doc_id: r
            for r in multimodal.extract_parquet_meta(
                multimodal.with_parquet_media(docs)
            ).collect()
        }
        for d in range(24):
            r = got[d]
            assert r.num_rows == 12 * (1 + d % 4)
            assert r.n_row_groups == 1 + d % 3
            assert r.n_columns == 1 + d % 4


class TestUrlCanonical:
    def test_groups_collapse(self, spark, sf_dir):
        from instacart_medallion_lakehouse_spark.queries_llm import (
            url_canonical_dedup,
        )

        rows = url_canonical_dedup(spark, sf_dir).collect()
        by_url = {r.url: r for r in rows}
        # every canonical is fully normalized
        for u in by_url:
            assert u.startswith("https://example.com/doc/")
            assert u.endswith("?a=1&b=2")
            assert ":443" not in u and "utm" not in u and "#" not in u
        # groups genuinely merge raw variants (case/port/utm/fragment
        # differ across members of a bucket)
        total = sum(r.n_docs for r in rows)
        assert total >= 120 and len(rows) == min(120, total)


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


class TestHardening:
    """Round-10 adversarial-input fixes (ADVICE r9): malformed WARC
    Content-Length must quarantine (never raise or hang), ZIP64
    sentinels must error loudly, thrift list<bool> skip must consume
    one byte per element."""

    def test_warc_non_integer_content_length(self):
        bad = (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"Content-Length: oops\r\n\r\nxxx\r\n\r\n"
        )
        assert multimodal._walk_warc_records(bad) is None

    def test_warc_negative_content_length_terminates(self):
        # crafted so the implied record end lands on an EARLIER
        # CRLF CRLF — the pre-fix walk looped forever here
        hdr = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: -8\r\n\r\n"
        bad = hdr + b"\r\n\r\n" + b"pad"
        assert multimodal._walk_warc_records(bad) is None

    def test_warc_negative_content_length_variants(self):
        for clen in (-1, -4, -100):
            hdr = (
                f"WARC/1.0\r\nWARC-Type: response\r\n"
                f"Content-Length: {clen}\r\n\r\n"
            ).encode()
            assert multimodal._walk_warc_records(hdr + b"\r\n\r\n" * 3) is None

    def test_zip64_sentinel_rejected(self):
        from instacart_medallion_lakehouse_spark.operators.archiveprobe import (
            parse_zip,
        )

        eocd = b"PK\x05\x06" + struct.pack(
            "<HHHHIIH", 0, 0, 0xFFFF, 0xFFFF, 0xFFFFFFFF, 0xFFFFFFFF, 0
        )
        with pytest.raises(ValueError, match="ZIP64"):
            parse_zip(eocd)

    def test_thrift_bool_list_skip(self):
        from instacart_medallion_lakehouse_spark.operators.parquetprobe import (
            _FALSE,
            _I32,
            _LIST,
            _TRUE,
            _Reader,
        )

        # struct { 1: list<bool> [true,false,true]; 2: i32 7; stop }
        # compact: field hdr (delta=1,type=LIST), list hdr
        # (size=3,etype=TRUE), 3 one-byte bool elements, field hdr
        # (delta=1,type=I32), varint 14 (zigzag(7)), STOP
        buf = bytes(
            [
                (1 << 4) | _LIST,
                (3 << 4) | _TRUE,
                _TRUE,
                _FALSE,
                _TRUE,
                (1 << 4) | _I32,
                14,
                0,
            ]
        )
        r = _Reader(buf)
        hdr = r.byte()
        assert hdr & 0x0F == _LIST
        r.skip(_LIST)
        hdr2 = r.byte()
        assert hdr2 & 0x0F == _I32, "bool-list skip desynced the walk"
        assert r.zigzag() == 7
        assert r.byte() == 0  # STOP
