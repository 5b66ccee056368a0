"""Multimodal column operators: opaque binary payloads + typed metadata,
processed with Arrow-batched ``mapInPandas``.

A 100 TB training-data pipeline carries images/audio/video as opaque
``binary`` columns beside typed metadata, and runs decode / resize /
feature-extract / frame-sample as vectorized Python over Arrow batches —
the ONE place Python-per-batch is the right tool (codecs aren't SQL).
This module makes that plumbing real:

- ``with_media`` fabricates a deterministic media column from the
  documents table (payload = utf-8 bytes of the text, media_type from
  the doc id) so the pipeline is exercisable without binary fixtures.
- ``extract_media_features`` is the production shape: ``mapInPandas``
  with an explicit output schema, batch-at-a-time pandas, zero
  driver-side collection. Its stub "decode" computes deterministic
  features (byte length, md5 checksum, fake dimensions) so results are
  DuckDB-oracle-checkable end to end.
- ``decode_image`` / ``resize_image`` / ``sample_frames`` are the real
  codec entry points, stubbed with NotImplementedError because no
  image/audio libraries exist in this environment. The Spark-side
  contract (schemas, batching, partitioning) is identical for the real
  implementations — swap the stub body, keep the plumbing.

Scale notes: mapInPandas streams Arrow record batches through one
Python worker per core with no shuffle; partition sizing is inherited
from the scan, so `spark.sql.files.maxPartitionBytes` bounds worker
memory. Select the binary column LAST in projections — column pruning
can't split a row group, but pruning every other column keeps the
Arrow transfer minimal.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_TYPES = ["image", "audio", "video"]

MEDIA_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
        StructField("fake_width", IntegerType()),
        StructField("fake_height", IntegerType()),
        StructField("fake_n_frames", IntegerType()),
    ]
)


def with_media(docs: DataFrame) -> DataFrame:
    """Attach a deterministic binary payload + media_type metadata.

    payload = utf-8 bytes of ``text``; media_type cycles by doc_id.
    This is the canonical layout for multimodal tables: (id, typed
    metadata..., binary payload).
    """
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(t) for t in MEDIA_TYPES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
    )


def _stub_decode_features(doc_id: int, media_type: str, payload: bytes) -> dict:
    """STUB decode: deterministic features derived from the raw bytes.

    A real implementation would decode the codec here (PIL / ffmpeg /
    soundfile); none are installed in this environment, so the features
    are computable fakes with the same shapes — and, deliberately,
    SQL-replicable, which lets the whole mapInPandas path be
    oracle-verified.
    """
    n = len(payload)
    return {
        "doc_id": doc_id,
        "media_type": media_type,
        "n_bytes": n,
        "checksum": hashlib.md5(payload).hexdigest(),
        "fake_width": n % 640,
        "fake_height": (n * 7) % 480,
        "fake_n_frames": (n % 30) if media_type == "video" else 1,
    }


def extract_media_features(media: DataFrame) -> DataFrame:
    """Vectorized feature extraction over (doc_id, media_type, payload).

    Arrow-batched mapInPandas: each partition arrives as an iterator of
    pandas DataFrames; we emit feature frames with an explicit schema.
    No shuffle, no collect — the plan is scan → PythonMapInArrow →
    project, and it parallelizes per input partition.
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                _stub_decode_features(d, t, bytes(p))
                for d, t, p in zip(pdf["doc_id"], pdf["media_type"], pdf["payload"])
            ]
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_FEATURE_SCHEMA])

    return media.mapInPandas(featurize, MEDIA_FEATURE_SCHEMA)


# --- real codec entry points (stubbed: no media libraries in this env) -----


def decode_image(payload: bytes) -> "object":
    """Decode an image payload to HxWxC uint8. Requires PIL/cv2."""
    raise NotImplementedError(
        "image decode requires PIL or cv2, not available in this environment; "
        "plug the real decoder into _stub_decode_features/featurize"
    )


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Resize an image payload. Requires PIL/cv2."""
    raise NotImplementedError("image resize requires PIL or cv2")


def sample_frames(payload: bytes, every_n: int = 30) -> list[bytes]:
    """Sample every-nth frame from a video payload. Requires ffmpeg."""
    raise NotImplementedError("frame sampling requires ffmpeg bindings")
