"""Multimodal plumbing tests: the mapInPandas path must round-trip
binary payloads losslessly, keep its declared schema, and decode REAL
container headers (PNG IHDR / JPEG SOF0 / WAVE fmt) from the payload
bytes — asserted both against the fabrication arithmetic and against
an independent re-read of the raw header fields.
"""

from __future__ import annotations

import base64
import hashlib
import struct

import pytest

from instacart_medallion_lakehouse_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
    return multimodal.with_media(docs)


class TestMediaPlumbing:
    def test_payload_is_binary_with_typed_metadata(self, media):
        dtypes = dict(media.dtypes)
        assert dtypes == {
            "doc_id": "bigint",
            "media_type": "string",
            "payload": "binary",
        }
        types = {r["media_type"] for r in media.select("media_type").distinct().collect()}
        assert types <= set(multimodal.MEDIA_TYPES)

    def test_headers_decode_from_payload_bytes(self, media):
        out = multimodal.extract_media_features(media)
        assert out.schema == multimodal.MEDIA_FEATURE_SCHEMA
        feats = {r["doc_id"]: r for r in out.collect()}
        payloads = {r["doc_id"]: bytes(r["payload"]) for r in media.collect()}
        assert feats.keys() == payloads.keys()
        seen = set()
        for doc_id, payload in payloads.items():
            r = feats[doc_id]
            seen.add(r["format"])
            assert r["n_bytes"] == len(payload)
            assert (
                r["checksum"]
                == hashlib.md5(base64.b64encode(payload)).hexdigest()
            )
            if r["format"] == "png":
                # the parsed dimensions must equal BOTH the fabrication
                # arithmetic and an independent read of the IHDR bytes
                assert payload[:8] == b"\x89PNG\r\n\x1a\n"
                w, h = struct.unpack(">II", payload[16:24])
                assert (r["width"], r["height"]) == (w, h)
                assert r["width"] == 1 + doc_id % 640
                assert r["height"] == 1 + doc_id % 480
                assert r["channels"] in (1, 3, 4)
                assert r["n_frames"] == 1
            elif r["format"] == "jpeg":
                assert payload[:2] == b"\xff\xd8"
                assert r["width"] == 1 + doc_id % 512
                assert r["height"] == 1 + doc_id % 384
                assert r["channels"] == 3
            elif r["format"] == "wav":
                assert payload[:4] == b"RIFF"
                assert r["channels"] == struct.unpack("<H", payload[22:24])[0]
                assert r["sample_rate"] == 8000 * (1 + doc_id % 4)
                assert r["width"] is None and r["height"] is None
            else:
                assert r["format"] == "raw"
                assert r["n_frames"] == len(payload) % 30
        # the 60-doc sample must exercise every branch
        assert seen == {"png", "jpeg", "wav", "raw"}

    def test_batch_iterator_sees_multiple_partitions(self, media):
        # repartition and confirm every partition's rows survive the
        # Arrow round-trip (no batch dropped or duplicated)
        n_in = media.count()
        out = multimodal.extract_media_features(media.repartition(7))
        assert out.count() == n_in


class TestHeaderParser:
    def test_jpeg_walk_skips_leading_segments(self):
        # APP0 segment before SOF0 — the walk must skip it by length
        app0 = b"\xff\xe0" + struct.pack(">H", 6) + b"JFIF"
        sof0 = b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(
            ">HH", 99, 123
        ) + b"\x03" + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
        parsed = multimodal.parse_media_header(b"\xff\xd8" + app0 + sof0)
        assert (parsed["width"], parsed["height"]) == (123, 99)
        assert parsed["format"] == "jpeg" and parsed["channels"] == 3

    def test_truncated_payload_falls_back_to_raw(self):
        assert multimodal.parse_media_header(b"\x89PNG")["format"] == "raw"
        assert multimodal.parse_media_header(b"")["format"] == "raw"


class TestCodecStubs:
    def test_decode_image_stubbed(self):
        with pytest.raises(NotImplementedError):
            multimodal.decode_image(b"\x89PNG")

    def test_resize_image_stubbed(self):
        with pytest.raises(NotImplementedError):
            multimodal.resize_image(b"", 10, 10)

    def test_sample_frames_stubbed(self):
        with pytest.raises(NotImplementedError):
            multimodal.sample_frames(b"")


class TestPlanningStages:
    def test_thumbnail_plan_preserves_aspect_and_never_upscales(
        self, spark, sf_dir
    ):
        from instacart_medallion_lakehouse_spark.operators.multimodal import (
            plan_thumbnails,
            with_media,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        rows = plan_thumbnails(with_media(docs), 128, 128).collect()
        assert rows
        for r in rows:
            assert 1 <= r.target_w <= min(r.width, 128)
            assert 1 <= r.target_h <= min(r.height, 128)
            # aspect preserved within integer truncation
            if r.width > 128 or r.height > 128:
                scale = min(128 / r.width, 128 / r.height)
                assert r.target_w == max(1, int(r.width * scale))
                assert r.target_h == max(1, int(r.height * scale))
            else:
                assert (r.target_w, r.target_h) == (r.width, r.height)

    def test_frame_samples_stride_and_bounds(self, spark, sf_dir):
        from instacart_medallion_lakehouse_spark.operators.multimodal import (
            plan_frame_samples,
            with_media,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        rows = plan_frame_samples(with_media(docs), every_n=5).collect()
        assert rows
        by_doc: dict[int, list[int]] = {}
        for r in rows:
            assert 0 <= r.frame_idx < r.n_frames
            assert r.frame_idx % 5 == 0
            by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
        for doc, idxs in by_doc.items():
            assert sorted(idxs) == list(range(0, max(idxs) + 1, 5))


class TestBinaryFileIngest:
    def test_disk_roundtrip_matches_inline_media(self, spark, sf_dir, tmp_path):
        """Write media payloads to loose files, re-ingest via the
        binaryFile source, and demand feature-extraction parity with
        the inline path — the whole point of the filename contract."""
        from instacart_medallion_lakehouse_spark.io import read_media_dir

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
        inline = multimodal.with_media(docs)
        media_dir = tmp_path / "media"
        media_dir.mkdir()
        for r in inline.collect():
            p = media_dir / f"{r['doc_id']}_{r['media_type']}.bin"
            p.write_bytes(bytes(r["payload"]))

        from_disk = read_media_dir(spark, str(media_dir), glob="*.bin")
        a = {
            r["doc_id"]: (r["media_type"], bytes(r["payload"]))
            for r in inline.collect()
        }
        b = {
            r["doc_id"]: (r["media_type"], bytes(r["payload"]))
            for r in from_disk.collect()
        }
        assert a == b

        feats = multimodal.extract_media_features(from_disk)
        assert feats.schema == multimodal.MEDIA_FEATURE_SCHEMA
        assert feats.count() == 20

    def test_glob_prunes_at_listing(self, spark, tmp_path):
        from instacart_medallion_lakehouse_spark.io import read_media_dir

        d = tmp_path / "mixed"
        d.mkdir()
        (d / "1_image.bin").write_bytes(b"\x89PNG")
        (d / "ignore.txt").write_bytes(b"nope")
        out = read_media_dir(spark, str(d), glob="*.bin")
        assert out.count() == 1
        assert out.first()["doc_id"] == 1

    def test_malformed_filename_fails_loudly(self, spark, tmp_path):
        """A file that matches the glob but violates the
        '{doc_id}_{media_type}.bin' convention must raise at execution,
        not become a null-keyed row that downstream joins silently drop."""
        import pytest

        from instacart_medallion_lakehouse_spark.io import read_media_dir

        d = tmp_path / "bad"
        d.mkdir()
        (d / "1_image.bin").write_bytes(b"\x89PNG")
        (d / "not-a-doc.bin").write_bytes(b"oops")
        out = read_media_dir(spark, str(d), glob="*.bin")
        with pytest.raises(Exception, match="naming convention"):
            out.count()
