"""Multimodal plumbing tests: the mapInPandas path must round-trip
binary payloads losslessly, keep its declared schema, and match the
pure-Python stub computation row for row.
"""

from __future__ import annotations

import hashlib

import pytest

from instacart_medallion_lakehouse_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
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

    def test_features_schema_and_values(self, spark, sf_dir, media):
        out = multimodal.extract_media_features(media)
        assert out.schema == multimodal.MEDIA_FEATURE_SCHEMA
        feats = {r["doc_id"]: r for r in out.collect()}
        docs = {
            r["doc_id"]: r["text"]
            for r in spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50).collect()
        }
        assert feats.keys() == docs.keys()
        for doc_id, txt in docs.items():
            payload = txt.encode("utf-8")
            r = feats[doc_id]
            assert r["n_bytes"] == len(payload)
            assert r["checksum"] == hashlib.md5(payload).hexdigest()
            assert r["fake_width"] == len(payload) % 640
            expected_frames = (
                len(payload) % 30 if r["media_type"] == "video" else 1
            )
            assert r["fake_n_frames"] == expected_frames

    def test_batch_iterator_sees_multiple_partitions(self, media):
        # repartition and confirm every partition's rows survive the
        # Arrow round-trip (no batch dropped or duplicated)
        n_in = media.count()
        out = multimodal.extract_media_features(media.repartition(7))
        assert out.count() == n_in


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
