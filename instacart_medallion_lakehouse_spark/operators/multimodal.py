"""Multimodal column operators: opaque binary payloads + typed metadata,
processed with Arrow-batched ``mapInPandas``.

A 100 TB training-data pipeline carries images/audio/video as opaque
``binary`` columns beside typed metadata, and runs decode / resize /
feature-extract / frame-sample as vectorized Python over Arrow batches —
the ONE place Python-per-batch is the right tool (codecs aren't SQL).
This module makes that plumbing real, including REAL container-header
decoding:

- ``with_media`` fabricates a deterministic media column from the
  documents table whose payloads carry genuine format headers — a PNG
  signature + IHDR chunk, a JPEG SOI + SOF0 segment, or a RIFF/WAVE
  fmt chunk — with dimensions/channels/sample-rate derived from the
  doc id, followed by the utf-8 document bytes as the "pixel data".
- ``extract_media_features`` is the production shape: ``mapInPandas``
  with an explicit output schema, batch-at-a-time pandas, zero
  driver-side collection. Its decode step PARSES the binary headers
  with ``struct`` (big-endian IHDR fields, JPEG marker-segment walk,
  little-endian WAVE fmt fields) — the decoded width/height/channels/
  sample_rate come from the payload bytes, and the SQL oracle
  recomputes the same values arithmetically from doc_id, so a parser
  bug is a cross-engine mismatch.
- ``decode_image`` / ``resize_image`` are REAL for PNG / 24-bit BMP /
  binary PPM+PGM / BASELINE JPEG — pure numpy + stdlib codecs in
  operators/imagecodec.py and jpegcodec.py — and
  ``materialize_thumbnails`` executes the thumbnail plan over those
  codecs as one mapInPandas pass with quarantine semantics
  (undecodable rows carry the error, never kill the stage).
  ``sample_frames`` REALLY demuxes uncompressed YUV4MPEG2 video
  (operators/y4mcodec.py) and PNG-encodes the sampled frames. JPEG
  covers baseline AND progressive (jpegcodec.py). Only COMPRESSED
  video containers and the exotic JPEG SOFs (arithmetic/hierarchical)
  remain explicit NotImplementedError: mp4/mkv demux belongs to a real
  codec library, and the Spark-side contract (schemas, batching,
  partitioning) is identical once one is plugged in.

Scale notes: mapInPandas streams Arrow record batches through one
Python worker per core with no shuffle; partition sizing is inherited
from the scan, so `spark.sql.files.maxPartitionBytes` bounds worker
memory. Select the binary column LAST in projections — column pruning
can't split a row group, but pruning every other column keeps the
Arrow transfer minimal.
"""

from __future__ import annotations

import base64
import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
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
        StructField("format", StringType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

# PNG color type -> samples per pixel (PNG spec, IHDR colour types)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _be_hex(col: Column, nbytes: int) -> Column:
    """Zero-padded big-endian hex of a non-negative integer column."""
    return F.lpad(F.hex(col), 2 * nbytes, "0")


def _le_hex(col: Column, nbytes: int) -> Column:
    """Little-endian hex (byte-swapped) — RIFF/WAVE fields are LE."""
    h = F.lpad(F.hex(col), 2 * nbytes, "0")
    return F.concat(
        *[F.substring(h, 2 * i + 1, 2) for i in reversed(range(nbytes))]
    )


def with_media(docs: DataFrame) -> DataFrame:
    """Attach a deterministic binary payload + media_type metadata.

    media_type cycles by doc_id (0=image, 1=audio, 2=video). Image and
    audio payloads get REAL format headers built byte-for-byte from hex
    expressions (JVM-side, scan-local): images alternate PNG (IHDR with
    doc-id-derived width/height and a cycling grey/RGB/RGBA colour
    type; CRC zeroed — dimension parsers don't checksum) and JPEG (SOI
    + SOF0 with height-before-width per the JFIF spec, 3 components);
    audio is a 44-byte canonical WAVE header (PCM, doc-id-derived
    channel count and sample rate, little-endian fields); video is a
    complete YUV4MPEG2 stream (doc-id-derived even dimensions and frame
    count, constant-byte C444 planes) that parse_media_header probes
    and sample_frames really demuxes. Image/audio payloads carry the
    document's utf-8 bytes after the header as body bytes, so those are
    content-sized, not toy constants.
    """
    body = F.encode("text", "UTF-8")
    blen = F.octet_length(body)
    d = F.col("doc_id")

    png_w = F.lit(1) + d % 640
    png_h = F.lit(1) + d % 480
    # doc_id % 6 == 0 for PNG rows, so doc_id % 18 cycles {0, 6, 12}:
    # colour type cycles greyscale (0) / truecolour (2) / RGBA (6)
    png_ct = F.element_at(
        F.array(F.lit(0), F.lit(2), F.lit(6)),
        (F.floor((d % 18) / 6) + 1).cast("int"),
    )
    png_hdr = F.unhex(
        F.concat(
            F.lit("89504E470D0A1A0A0000000D49484452"),  # signature + IHDR len/tag
            _be_hex(png_w, 4),
            _be_hex(png_h, 4),
            F.lit("08"),  # bit depth
            _be_hex(png_ct, 1),
            F.lit("00000000000000"),  # compression, filter, interlace, CRC(0)
        )
    )

    jpg_w = F.lit(1) + d % 512
    jpg_h = F.lit(1) + d % 384
    jpg_hdr = F.unhex(
        F.concat(
            F.lit("FFD8FFC0001108"),  # SOI, SOF0, len 17, precision 8
            _be_hex(jpg_h, 2),  # SOF0 stores height first
            _be_hex(jpg_w, 2),
            F.lit("03011100021101031101"),  # 3 components
        )
    )

    wav_ch = F.lit(1) + d % 2
    wav_rate = (F.lit(8000) * (F.lit(1) + d % 4)).cast("bigint")
    wav_hdr = F.unhex(
        F.concat(
            F.lit("52494646"),  # RIFF
            _le_hex(F.lit(36) + blen, 4),
            F.lit("57415645666D7420"),  # WAVE, "fmt "
            F.lit("100000000100"),  # fmt chunk size 16 (LE), PCM format 1 (LE)
            _le_hex(wav_ch, 2),
            _le_hex(wav_rate, 4),
            _le_hex(wav_rate * wav_ch * 2, 4),  # byte rate (16-bit samples)
            _le_hex(wav_ch * 2, 2),  # block align
            F.lit("1000"),  # bits per sample
            F.lit("64617461"),  # data
            _le_hex(blen, 4),
        )
    )

    # video: a REAL YUV4MPEG2 stream — even doc-id-derived dimensions,
    # C444, 1 + d%12 frames whose planes are one doc-id-derived byte
    # value (hex-repeat builds the exact frame bytes JVM-side; the SQL
    # oracle rebuilds the identical blob with the same repeat())
    y4m_w = F.lit(2) * (F.lit(2) + d % 16)  # 4..34, even
    y4m_h = F.lit(2) * (F.lit(2) + d % 12)  # 4..26, even
    y4m_n = (F.lit(1) + d % 12).cast("int")
    y4m_hdr = F.encode(
        F.concat(
            F.lit("YUV4MPEG2 W"),
            y4m_w.cast("string"),
            F.lit(" H"),
            y4m_h.cast("string"),
            F.lit(" F25:1 Ip A1:1 C444\n"),
        ),
        "UTF-8",
    )
    y4m_unit_hex = F.concat(
        F.lit("4652414D450A"),  # "FRAME\n"
        F.repeat(
            F.lpad(F.hex(d % 256), 2, "0"),
            (y4m_w * y4m_h * 3).cast("int"),
        ),
    )
    y4m_payload = F.concat(y4m_hdr, F.unhex(F.repeat(y4m_unit_hex, y4m_n)))

    mt = (d % 3).cast("int")
    payload = (
        F.when((mt == 0) & (d % 6 == 0), F.concat(png_hdr, body))
        .when(mt == 0, F.concat(jpg_hdr, body))
        .when(mt == 1, F.concat(wav_hdr, body))
        .otherwise(y4m_payload)
    )
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(t) for t in MEDIA_TYPES]), (mt + 1).cast("int")
        ).alias("media_type"),
        payload.alias("payload"),
    )


def parse_media_header(payload: bytes) -> dict:
    """REAL header decode with stdlib ``struct`` — no codec libraries.

    Recognizes PNG (signature + IHDR big-endian fields), JPEG (marker-
    segment walk to the first SOF0/1/2 frame header), YUV4MPEG2 (ASCII
    stream header + FRAME walk for a real frame count), and RIFF/WAVE
    (little-endian fmt fields). Anything else is an opaque payload:
    format 'raw' with the n_bytes%30 pseudo frame count standing in for
    the ffmpeg-dependent compressed-video probe (see sample_frames).
    """
    n = len(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and n >= 26:
        w, h = struct.unpack(">II", payload[16:24])
        ct = payload[25]
        return {
            "format": "png",
            "width": w,
            "height": h,
            "channels": _PNG_CHANNELS.get(ct),
            "sample_rate": None,
            "n_frames": 1,
        }
    if payload[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= n and payload[i] == 0xFF:
            marker = payload[i + 1]
            seglen = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            if marker in (0xC0, 0xC1, 0xC2) and i + 10 <= n:
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return {
                    "format": "jpeg",
                    "width": w,
                    "height": h,
                    "channels": payload[i + 9],
                    "sample_rate": None,
                    "n_frames": 1,
                }
            i += 2 + seglen
    if payload[:9] == b"YUV4MPEG2":
        from .y4mcodec import parse_y4m_header

        try:
            y4m = parse_y4m_header(payload)
        except ValueError:
            pass  # magic-prefixed but not a stream: opaque 'raw' below
        else:
            return {
                "format": "y4m",
                "width": y4m["width"],
                "height": y4m["height"],
                "channels": 3,
                "sample_rate": None,
                "n_frames": y4m["n_frames"],
            }
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE" and n >= 28:
        (ch,) = struct.unpack("<H", payload[22:24])
        (rate,) = struct.unpack("<I", payload[24:28])
        return {
            "format": "wav",
            "width": None,
            "height": None,
            "channels": ch,
            "sample_rate": rate,
            "n_frames": None,
        }
    return {
        "format": "raw",
        "width": None,
        "height": None,
        "channels": None,
        "sample_rate": None,
        "n_frames": n % 30,
    }


def extract_media_features(media: DataFrame) -> DataFrame:
    """Vectorized feature extraction over (doc_id, media_type, payload).

    Arrow-batched mapInPandas: each partition arrives as an iterator of
    pandas DataFrames; we emit feature frames with an explicit schema.
    No shuffle, no collect — the plan is scan → PythonMapInArrow →
    project, and it parallelizes per input partition.

    The checksum is md5 over the base64 text of the payload — base64 is
    the engine-portable bytes→text bridge (the DuckDB oracle's md5 only
    accepts VARCHAR, and raw header bytes aren't valid utf-8).
    """

    cols = [f.name for f in MEDIA_FEATURE_SCHEMA]

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, mtype, p in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                if p is None:
                    # a NULL payload (e.g. synthesized from a NULL text
                    # body) must not kill the whole stage with
                    # bytes(None); emit a null-feature row so the doc
                    # stays visible to downstream quality gates
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "media_type": mtype,
                            "n_bytes": None,
                            "checksum": None,
                            "format": None,
                            "width": None,
                            "height": None,
                            "channels": None,
                            "sample_rate": None,
                            "n_frames": None,
                        }
                    )
                    continue
                payload = bytes(p)
                parsed = parse_media_header(payload)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "media_type": mtype,
                        "n_bytes": len(payload),
                        "checksum": hashlib.md5(
                            base64.b64encode(payload)
                        ).hexdigest(),
                        **parsed,
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(featurize, MEDIA_FEATURE_SCHEMA)


# --- corpus triage: route every payload ok / not_implemented / corrupt /
# unsupported_container through the REAL codecs, without ever killing the
# pass — the per-source quarantine-rate profile a 100 TB ingest runs
# before committing decode budget.

QUARANTINE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("format", StringType()),
        StructField("status", StringType()),
    ]
)

# Static quarantine-class payload fragments (hex). The arithmetic-coded
# JPEG is a real SOI + SOF9 frame header (T.81 arithmetic sequential —
# the QM-coder boundary decode_jpeg keeps loud now that the SOF3
# lossless process decodes for real); the corrupt PNG is a valid
# signature + IHDR with no IDAT chunk (header-only payload); the mp4
# fragment is a complete 24-byte ftyp box; the mkv fragment is the
# EBML magic plus padding.
_HEX_JPEG_ARITH = "FFD8FFC9000B080010001001011100"
_HEX_PNG_NO_IDAT = (
    "89504E470D0A1A0A0000000D49484452"
    "0000001000000010080200000000000000"
)
_HEX_MP4_FTYP = "00000018667479706D7034320000000069736F6D6D703432"
_HEX_MKV_EBML = "1A45DFA30000000000000000"

# mvhd version-0 fixed fragments (ISO/IEC 14496-12 8.2.2): the 108-byte
# box split around the doc-id-derived timescale/duration/next-track
# fields. Timescale is the classic 600 units/second.
_HEX_MVHD_PRE = (
    "0000006C"  # size 108
    "6D766864"  # 'mvhd'
    "00000000"  # version 0 + flags
    "00000000"  # creation
    "00000000"  # modification
    "00000258"  # timescale = 600
)
_HEX_MVHD_POST = (
    "00010000"  # rate 1.0
    "0100"      # volume 1.0
    "0000"      # reserved
    + "0" * 16  # reserved[2] (8 bytes)
    # unity matrix: 0x00010000, 0,0, 0, 0x00010000, 0, 0,0, 0x40000000
    + "00010000" + "00000000" * 3
    + "00010000" + "00000000" * 3
    + "40000000"
    + "0" * 48  # pre_defined[6] (24 bytes)
)
_HEX_TRAK = "000000087472616B"  # minimal 8-byte 'trak' box


MP4_PROBE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("brand", StringType()),
        StructField("timescale", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("n_tracks", IntegerType()),
    ]
)


def with_mp4_media(docs: DataFrame) -> DataFrame:
    """Attach a deterministic, structurally-valid ISO-BMFF payload:
    ftyp (brand mp42) + moov holding a version-0 mvhd (timescale 600,
    duration 600*(1 + doc_id%30) + 60*(doc_id%10) units — exactly
    1000*(1+d%30) + 100*(d%10) ms, integer-exact) and 1 + doc_id%3
    minimal trak boxes. Every field the probe reads is pure arithmetic
    the SQL oracle can restate, while the Spark side must actually
    WALK the boxes to agree."""
    d = F.col("doc_id")
    k = (F.lit(1) + d % 3).cast("int")
    dur = (
        F.lit(600) * (F.lit(1) + d % 30) + F.lit(60) * (d % 10)
    ).cast("bigint")
    moov_size = (F.lit(8 + 108) + F.lit(8) * k).cast("bigint")
    payload = F.unhex(
        F.concat(
            F.lit(_HEX_MP4_FTYP),
            _be_hex(moov_size, 4),
            F.lit("6D6F6F76"),  # 'moov'
            F.lit(_HEX_MVHD_PRE),
            _be_hex(dur, 4),
            F.lit(_HEX_MVHD_POST),
            _be_hex((k + 1).cast("bigint"), 4),  # next_track_id
            F.repeat(F.lit(_HEX_TRAK), k),
        )
    )
    return docs.select("doc_id", payload.alias("payload"))


MKV_PROBE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("doctype", StringType()),
        StructField("timestamp_scale_ns", LongType()),
        StructField("n_tracks", IntegerType()),
    ]
)


def with_mkv_media(docs: DataFrame) -> DataFrame:
    """Attach a deterministic, structurally-valid Matroska payload:
    EBML header (DocType 'matroska') + Segment holding Info
    (TimestampScale = 1_000_000 * (1 + doc_id%3) ns) and Tracks with
    1 + doc_id%4 empty TrackEntry elements — every probed field is
    doc_id arithmetic the SQL oracle can restate, while the Spark side
    must actually WALK the EBML var-int elements to agree."""
    d = F.col("doc_id")
    k = (F.lit(1) + d % 4).cast("int")
    scale = (F.lit(1_000_000) * (F.lit(1) + d % 3)).cast("bigint")
    # EBML \x1A45DFA3, size 0x8B, DocType \x4282 size 0x88 "matroska"
    ebml_hdr = F.lit("1A45DFA38B4282886D6174726F736B61")
    # Info \x1549A966 size 0x88: TimestampScale \x2AD7B1 size 0x84 + u32
    info = F.concat(F.lit("1549A966882AD7B184"), _be_hex(scale, 4))
    # Tracks \x1654AE6B size 0x80+2k: k x (TrackEntry \xAE size 0x80)
    tracks = F.concat(
        F.lit("1654AE6B"),
        _be_hex((F.lit(0x80) + k * 2).cast("bigint"), 1),
        F.repeat(F.lit("AE80"), k),
    )
    # Segment \x18538067, body = Info(13) + Tracks(5 + 2k) = 18 + 2k
    seg = F.concat(
        F.lit("18538067"),
        _be_hex((F.lit(0x80 + 18) + k * 2).cast("bigint"), 1),
        info,
        tracks,
    )
    payload = F.unhex(F.concat(ebml_hdr, seg))
    return docs.select("doc_id", payload.alias("payload"))


def extract_mkv_meta(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Matroska/WebM container metadata without any codec: one Arrow
    mapInPandas pass of operators/mkvprobe.parse_mkv over the payload
    bytes — doctype, timestamp scale, track count. The EBML sibling of
    extract_mp4_meta; unparseable payloads contribute no rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .mkvprobe import parse_mkv

        cols = list(MKV_PROBE_SCHEMA.names)
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf["payload"]):
                try:
                    m = parse_mkv(bytes(p) if p is not None else b"")
                except Exception:  # noqa: BLE001 — quarantine
                    continue
                rows.append(
                    {
                        "doc_id": doc_id,
                        "doctype": m["doctype"],
                        "timestamp_scale_ns": m["timestamp_scale_ns"],
                        "n_tracks": m["n_tracks"],
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return media.select(id_col, "payload").mapInPandas(
        run, MKV_PROBE_SCHEMA
    )


def extract_mp4_meta(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Container-level video metadata WITHOUT any codec: one Arrow
    mapInPandas pass of operators/mp4probe.parse_mp4 over the payload
    bytes — brand, movie timescale, duration in ms, track count. The
    triage step a 100 TB video corpus runs before deciding what is
    worth shipping to an ffmpeg farm (frame DECODE stays
    NotImplementedError — sample_frames' contract is unchanged).
    Unparseable payloads contribute no rows (quarantine by omission,
    like extract_video_frame_stats)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .mp4probe import parse_mp4

        cols = list(MP4_PROBE_SCHEMA.names)
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf["payload"]):
                try:
                    m = parse_mp4(bytes(p) if p is not None else b"")
                except Exception:  # noqa: BLE001 — quarantine
                    continue
                rows.append(
                    {
                        "doc_id": doc_id,
                        "brand": m["brand"],
                        "timescale": m["timescale"],
                        "duration_ms": m["duration_ms"],
                        "n_tracks": m["n_tracks"],
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return media.select(id_col, "payload").mapInPandas(
        run, MP4_PROBE_SCHEMA
    )


def with_quarantine_media(docs: DataFrame) -> DataFrame:
    """Attach a deterministic payload drawn from SIX triage classes
    (doc_id % 6): a VALID binary PNM image (0), a VALID PCM WAV (1), an
    mp4 ftyp box (2), a matroska EBML stream (3), an ARITHMETIC-coded
    JPEG (4), and a header-only PNG with no IDAT (5). Unlike
    with_media, every payload is fabricated from doc_id alone (no text
    body), so the expected (format, status) of each row is pure
    arithmetic the SQL oracle can state in a CASE — while the Spark
    side must actually run the codecs to agree."""
    d = F.col("doc_id")
    c = (d % 6).cast("int")
    byte_hex = F.lpad(F.hex(d % 256), 2, "0")

    pnm_w = (F.lit(1) + d % 8).cast("int")
    pnm_h = (F.lit(1) + d % 6).cast("int")
    pnm_payload = F.concat(
        F.encode(
            F.concat(
                F.lit("P6\n"),
                pnm_w.cast("string"),
                F.lit(" "),
                pnm_h.cast("string"),
                F.lit("\n255\n"),
            ),
            "UTF-8",
        ),
        F.unhex(F.repeat(byte_hex, pnm_w * pnm_h * 3)),
    )

    wav_ch = F.lit(1) + d % 2
    wav_rate = (F.lit(8000) * (F.lit(1) + d % 4)).cast("bigint")
    wav_datalen = (F.lit(2) * (F.lit(1) + d % 50)).cast("bigint")
    wav_payload = F.unhex(
        F.concat(
            F.lit("52494646"),  # RIFF
            _le_hex(F.lit(36) + wav_datalen, 4),
            F.lit("57415645666D7420"),  # WAVE, "fmt "
            F.lit("100000000100"),  # fmt size 16 (LE), PCM format 1 (LE)
            _le_hex(wav_ch, 2),
            _le_hex(wav_rate, 4),
            _le_hex(wav_rate * wav_ch * 2, 4),
            _le_hex(wav_ch * 2, 2),
            F.lit("1000"),  # bits per sample
            F.lit("64617461"),  # data
            _le_hex(wav_datalen, 4),
            F.repeat(byte_hex, wav_datalen.cast("int")),
        )
    )

    payload = (
        F.when(c == 0, pnm_payload)
        .when(c == 1, wav_payload)
        .when(c == 2, F.unhex(F.lit(_HEX_MP4_FTYP)))
        .when(c == 3, F.unhex(F.lit(_HEX_MKV_EBML)))
        .when(c == 4, F.unhex(F.lit(_HEX_JPEG_ARITH)))
        .otherwise(F.unhex(F.lit(_HEX_PNG_NO_IDAT)))
    )
    return docs.select("doc_id", payload.alias("payload"))


def sniff_format(payload: bytes) -> str:
    """Container sniff by magic bytes — the routing key for triage."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    if payload[:2] in (b"P5", b"P6"):
        return "pnm"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "avi"
    if payload[:4] == b"fLaC":
        return "flac"
    if payload[:3] == b"ID3" or (
        # a full MPEG-1 Layer III header check, not just the 11-bit
        # sync: arbitrary 0xFF-prefixed binary must stay 'raw'
        # (unsupported_container), not misroute into the mp3 bucket
        len(payload) >= 3
        and payload[0] == 0xFF
        and (payload[1] & 0xE0) == 0xE0
        and (payload[1] & 0x18) == 0x18  # MPEG-1
        and (payload[1] & 0x06) == 0x02  # Layer III
        and 1 <= (payload[2] >> 4) <= 14  # valid bitrate index
        and ((payload[2] >> 2) & 0x03) <= 2  # valid sample-rate index
    ):
        return "mp3"  # after the jpeg check: FFD8 never reaches here
    if payload[:9] == b"YUV4MPEG2":
        return "y4m"
    if payload[4:8] == b"ftyp":
        return "mp4"
    if payload[:4] == b"\x1aE\xdf\xa3":
        return "mkv"
    return "raw"


def triage_media(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, format, status): attempt the real decode path for every
    payload and classify the outcome — ``ok``, ``not_implemented`` (a
    loud codec boundary: arithmetic/hierarchical JPEG, compressed
    video),
    ``corrupt`` (malformed bytes inside a supported container), or
    ``unsupported_container`` (mp4/mkv/unknown magic — ffmpeg
    territory, multimodal.py sample_frames contract). One Arrow
    mapInPandas pass, no shuffle; an exception NEVER kills the stage —
    that is the quarantine contract a 100 TB pass needs."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .imagecodec import decode
        from .y4mcodec import parse_y4m_header

        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf["payload"]):
                payload = bytes(p) if p is not None else b""
                fmt = sniff_format(payload)
                if fmt == "mp4":
                    # r11: mp4 walks the sample tables for real —
                    # MJPEG tracks are 'ok' (decodable), inter-frame
                    # codecs are the counted 'not_implemented'
                    # boundary, and probe-only/metadata payloads (no
                    # walkable moov) stay 'unsupported_container'
                    from .mp4codec import _INTRA_JPEG, parse_mp4_samples

                    try:
                        meta = parse_mp4_samples(payload)
                        status = (
                            "ok"
                            if meta["fourcc"].encode() in _INTRA_JPEG
                            else "not_implemented"
                        )
                    except Exception:  # noqa: BLE001 — quarantine
                        status = "unsupported_container"
                elif fmt in ("mkv", "raw"):
                    status = "unsupported_container"
                elif fmt == "wav":
                    status = (
                        "ok"
                        if parse_media_header(payload)["format"] == "wav"
                        else "corrupt"
                    )
                elif fmt == "y4m":
                    try:
                        parse_y4m_header(payload)
                        status = "ok"
                    except Exception:  # noqa: BLE001 — quarantine
                        status = "corrupt"
                elif fmt == "avi":  # container-level triage, like y4m
                    from .avicodec import parse_avi

                    try:
                        parse_avi(payload)
                        status = "ok"
                    except Exception:  # noqa: BLE001 — quarantine
                        status = "corrupt"
                elif fmt in ("mp3", "flac"):  # header-walk triage
                    from .audioprobe import parse_flac, parse_mp3

                    probe = parse_flac if fmt == "flac" else parse_mp3
                    try:
                        probe(payload)
                        status = "ok"
                    except Exception:  # noqa: BLE001 — quarantine
                        status = "corrupt"
                else:  # png / jpeg / pnm / bmp / gif: the real decoder
                    try:
                        decode(payload)
                        status = "ok"
                    except NotImplementedError:
                        status = "not_implemented"
                    except Exception:  # noqa: BLE001 — quarantine
                        status = "corrupt"
                rows.append(
                    {"doc_id": doc_id, "format": fmt, "status": status}
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in QUARANTINE_SCHEMA]
            )

    return media.select(id_col, "payload").mapInPandas(
        run, QUARANTINE_SCHEMA
    )


# --- deep-codec entry points ------------------------------------------------
# PNG/BMP/PPM/PGM/JPEG (baseline + progressive) decode + resize are
# REAL (pure numpy + stdlib — operators/imagecodec.py and jpegcodec.py
# implement the format specs directly), as is uncompressed Y4M video
# demux. Compressed-video demux stays explicit NotImplementedError:
# it is a codec library's job (no PIL/cv2/ffmpeg in this environment),
# and a loud error beats silently-wrong pixels — the quarantine path
# routes those rows.


def decode_image(payload: bytes) -> "object":
    """Decode an image payload to HxWxC uint8 pixels (numpy). Supports
    PNG (colour types 0/2/3/4/6 — palette through PLTE/tRNS — at
    1/2/4/8-bit depth plus 16-bit stripped to the high byte, both
    non-interlaced and Adam7), 24-bit BMP, binary PPM/PGM, GIF87a/89a
    (LZW, interlace, local palettes, transparency — first composed
    frame; animations via gifcodec.decode_gif_frames), and JPEG —
    baseline and progressive (grayscale/YCbCr, 4:4:4/4:2:2/4:2:0,
    restart markers, successive approximation); JPEG — the SOF3
    LOSSLESS process too (raw components, exact reconstruction); raises
    NotImplementedError for arithmetic/hierarchical JPEG and ValueError
    for other containers and for header-only payloads with no pixel
    data."""
    from .imagecodec import decode

    return decode(bytes(payload))


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Resize an image payload with deterministic nearest-neighbor
    sampling, re-encoded in the payload's own container family."""
    from .imagecodec import decode, encode_like, resize_nearest

    p = bytes(payload)
    return encode_like(resize_nearest(decode(p), width, height), p)


def sample_frames(payload: bytes, every_n: int = 30) -> list[bytes]:
    """Sample every-nth frame from a video payload, PNG-encoded.

    REAL for four containers: YUV4MPEG2 (.y4m — pure-arithmetic demux,
    operators/y4mcodec.py), AVI/Motion-JPEG (RIFF chunk walk +
    per-frame JPEG decode, operators/avicodec.py over jpegcodec.py),
    MJPEG-in-MP4 (ISO-BMFF sample-table walk, operators/mp4codec.py —
    r11), and animated GIF (LZW + composition, operators/gifcodec.py).
    Inter-frame-predicted codecs (H.26x/VP9/AV1 inside mp4/mkv/webm)
    keep the explicit NotImplementedError: entropy-coded motion-
    compensated decode is ffmpeg's job, and the quarantine path routes
    those rows. The planning half — WHICH frames to pull — is
    plan_frame_samples."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")
    p = bytes(payload)
    from .imagecodec import encode_png

    if p.startswith(b"YUV4MPEG2"):
        from .y4mcodec import iter_y4m_frames

        # step-aware demux: non-sampled frames are seeked past, never
        # YCbCr-decoded (y4mcodec.iter_y4m_frames step contract)
        return [
            encode_png(frame) for frame in iter_y4m_frames(p, step=every_n)
        ]
    if p[:4] == b"RIFF" and p[8:12] == b"AVI ":
        from .avicodec import iter_avi_frames

        # same seek discipline: skipped frames are never JPEG-decoded
        return [
            encode_png(frame) for frame in iter_avi_frames(p, step=every_n)
        ]
    if p[:6] in (b"GIF87a", b"GIF89a"):
        from .gifcodec import decode_gif_frames

        # GIF frames compose incrementally, so every frame must be
        # LZW-decoded to build the canvas; sampling selects afterwards
        frames = decode_gif_frames(p)
        return [encode_png(f) for f in frames[::every_n]]
    if p[4:8] == b"ftyp":
        from .mp4codec import iter_mp4_frames

        # MJPEG-in-MP4 decodes natively (r11, operators/mp4codec.py:
        # sample-table walk + JPEG decode, skipped samples never
        # entropy-decoded); inter-frame codecs raise the loud
        # NotImplementedError at the stsd gate inside iter_mp4_frames
        return [
            encode_png(frame) for frame in iter_mp4_frames(p, step=every_n)
        ]
    raise NotImplementedError(
        "frame sampling requires ffmpeg bindings for inter-frame-"
        "predicted containers (y4m, AVI/MJPEG, MJPEG-in-MP4 and GIF "
        "are decoded natively)"
    )


VIDEO_FRAME_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_r", IntegerType()),
        StructField("mean_g", IntegerType()),
        StructField("mean_b", IntegerType()),
    ]
)


def extract_video_frame_stats(
    media: DataFrame, every_n: int = 5, id_col: str = "doc_id"
) -> DataFrame:
    """Per-sampled-frame RGB statistics from VIDEO payload bytes: a
    REAL Y4M demux + planar YCbCr->RGB decode (operators/y4mcodec.py)
    of frames 0, n, 2n, ..., one mapInPandas pass — the actual frame
    extraction step of a multimodal pipeline, not a planning stub.
    Non-Y4M or NULL payloads contribute no rows (quarantine by
    omission, like plan_frame_samples)."""
    import numpy as np

    from .y4mcodec import iter_y4m_frames

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = list(VIDEO_FRAME_STATS_SCHEMA.names)
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf["payload"]):
                payload = bytes(p) if p is not None else b""
                if not payload.startswith(b"YUV4MPEG2"):
                    continue
                # step-aware demux: skipped frames are seeked past,
                # never YCbCr-decoded; yielded frame k is index k*n
                for k, frame in enumerate(
                    iter_y4m_frames(payload, step=every_n)
                ):
                    m = frame.astype(np.float64).mean(axis=(0, 1))
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": k * every_n,
                            "width": frame.shape[1],
                            "height": frame.shape[0],
                            "mean_r": int(round(m[0])),
                            "mean_g": int(round(m[1])),
                            "mean_b": int(round(m[2])),
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return media.select(id_col, "payload").mapInPandas(
        run, VIDEO_FRAME_STATS_SCHEMA
    )


PCM_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("peak", IntegerType()),
        StructField("dc_mean", LongType()),
        StructField("mean_square", LongType()),
    ]
)


def with_pcm_media(docs: DataFrame) -> DataFrame:
    """Attach a deterministic 16-bit PCM WAV whose SAMPLE VALUES are
    doc_id arithmetic: mono, 8 kHz, 2*(1 + doc_id%40) samples
    alternating v1 = 100*(1 + doc_id%50) and v2 = -50*(1 + doc_id%30)
    (little-endian two's complement, built JVM-side). Both values are
    even, so the DC mean and the mean square are INTEGER-exact — the
    oracle restates them in closed form while the Spark side must
    actually decode the int16 stream."""
    d = F.col("doc_id")
    m = (F.lit(1) + d % 40).cast("int")
    v1 = (F.lit(100) * (F.lit(1) + d % 50)).cast("bigint")
    v2c = (F.lit(65536) - F.lit(50) * (F.lit(1) + d % 30)).cast("bigint")
    datalen = (m * 4).cast("bigint")  # 2 samples x 2 bytes per pair
    payload = F.unhex(
        F.concat(
            F.lit("52494646"),  # RIFF
            _le_hex(F.lit(36) + datalen, 4),
            F.lit("57415645666D7420"),  # WAVE, "fmt "
            F.lit("100000000100"),  # fmt size 16, PCM
            _le_hex(F.lit(1), 2),  # mono
            _le_hex(F.lit(8000), 4),
            _le_hex(F.lit(16000), 4),  # byte rate
            _le_hex(F.lit(2), 2),  # block align
            F.lit("1000"),  # 16 bits/sample
            F.lit("64617461"),  # data
            _le_hex(datalen, 4),
            F.repeat(F.concat(_le_hex(v1, 2), _le_hex(v2c, 2)), m),
        )
    )
    return docs.select("doc_id", payload.alias("payload"))


def extract_pcm_stats(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL audio sample decode — the audio sibling of
    extract_video_frame_stats' pixel path: walk the RIFF chunks to the
    ``data`` payload, reinterpret it as little-endian int16 PCM with
    numpy, and aggregate per clip (sample count, absolute peak, exact
    integer DC mean and mean square — loudness/clipping triage without
    any transcendental in the compared surface). One Arrow mapInPandas
    pass; non-WAV / malformed / non-16-bit payloads contribute no rows
    (quarantine by omission)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = list(PCM_STATS_SCHEMA.names)
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf["payload"]):
                payload = bytes(p) if p is not None else b""
                fmt, data, _ = _wav_chunks(payload)
                if fmt is None or len(fmt) < 16 or data is None:
                    continue
                (bits,) = struct.unpack_from("<H", fmt, 14)
                if bits != 16 or len(data) < 2:
                    continue
                s = np.frombuffer(
                    data, dtype="<i2", count=len(data) // 2
                ).astype(np.int64)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_samples": len(s),
                        "peak": int(np.abs(s).max()),
                        # exact integer stats (fabrication guarantees
                        # divisibility; foreign audio would use the
                        # floor, documented)
                        "dc_mean": int(s.sum()) // len(s),
                        "mean_square": int((s * s).sum()) // len(s),
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return media.select(id_col, "payload").mapInPandas(
        run, PCM_STATS_SCHEMA
    )


def _wav_chunks(payload: bytes):
    """Shared RIFF/WAVE chunk walk (even-padded chunk advance):
    returns (fmt_bytes, data_bytes, data_len_claimed) — data_bytes may
    be shorter than the claim when the payload is truncated on disk;
    duration-style consumers use the CLAIM (what ffprobe reports),
    sample decoders use the bytes. (None, None, None) when the payload
    is not RIFF/WAVE. One definition for the four audio extractors, so
    a chunk-walk fix lands everywhere at once."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None, None, None
    pos, fmt, data, data_len = 12, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        if cid == b"fmt ":
            fmt = payload[pos + 8 : pos + 8 + clen]
        elif cid == b"data":
            data = payload[pos + 8 : pos + 8 + clen]
            data_len = clen
            break
        pos += 8 + clen + (clen & 1)  # chunks pad to even
    return fmt, data, data_len


def _python_parallelism(df: DataFrame) -> int:
    """Partition count for Python-codec-heavy mapInPandas stages: the
    session's core parallelism (NOT spark.sql.shuffle.partitions,
    which is sized for data shuffles, not CPU-bound Arrow batches)."""
    return max(1, df.sparkSession.sparkContext.defaultParallelism)


GIF_FRAME_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
        StructField("ywsum_r", LongType()),
    ]
)


def with_gif_media(docs: DataFrame) -> DataFrame:
    """Attach a deterministic ANIMATED GIF payload, produced by the
    engine's own real GIF89a encoder (operators/gifcodec.encode_gif —
    genuine LZW, variable-width codes): per doc, a
    (2 + d%24) x (2 + d%17) logical screen with 1 + d%5 full-canvas
    frames; frame k's rows carry palette index (y + k) % 4; frames
    where (d + k) % 2 == 0 are INTERLACED (4-pass row reorder inside
    the LZW stream); frames where k % 3 == 2 carry a LOCAL color table
    (q[j] formulas) instead of the global one (p[j] formulas). Every
    decoded statistic is therefore closed-form doc_id arithmetic the
    SQL oracle restates — but the Spark side has to run the actual
    LZW + de-interlace + palette resolution to agree.

    Fabrication is a mapInPandas stage (unlike the hex-built WAV/mp4
    fixtures) because real LZW output is not expressible as a SQL hex
    template — which is exactly the point: this exercises a true
    encode -> decode round trip across executors."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .gifcodec import encode_gif

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w = 2 + d % 24
                h = 2 + d % 17
                n = 1 + d % 5
                gp = np.array(
                    [
                        [
                            (7 * d + 53 * j) % 256,
                            (11 * d + 29 * j) % 256,
                            (13 * d + 17 * j) % 256,
                        ]
                        for j in range(4)
                    ],
                    np.uint8,
                )
                lp = np.array(
                    [
                        [
                            (5 * d + 19 * j) % 256,
                            (3 * d + 37 * j) % 256,
                            (17 * d + 7 * j) % 256,
                        ]
                        for j in range(4)
                    ],
                    np.uint8,
                )
                frames = []
                opts = []
                for k in range(n):
                    col = ((np.arange(h) + k) % 4).astype(np.uint8)
                    frames.append(np.repeat(col[:, None], w, axis=1))
                    o: dict = {
                        "interlace": (d + k) % 2 == 0,
                        "delay_cs": 4,
                        "disposal": 1,
                    }
                    if k % 3 == 2:
                        o["palette"] = lp
                    opts.append(o)
                rows.append(
                    {
                        "doc_id": d,
                        "payload": encode_gif(frames, gp, frame_opts=opts),
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    # the testdata parquet is one row group -> one scan task; an
    # explicit numeric repartition (NOT coalesced by AQE) spreads the
    # Python LZW work across the executor cores — the shuffle moves
    # only doc_ids, and at 100 TB decode parallelism IS the partition
    # count (measured here: 2.6s -> sub-second at sf0.1)
    ids = docs.select("doc_id").repartition(_python_parallelism(docs))
    return ids.mapInPandas(run, "doc_id long, payload binary")


def extract_gif_frame_stats(
    media: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Per-frame statistics from ANIMATED GIF payload bytes: a real
    LZW decode + de-interlace + palette resolution + animation
    composition (operators/gifcodec.decode_gif_frames), one Arrow
    mapInPandas pass. Emits exact integer channel sums plus a
    row-position-weighted sum (ywsum_r = sum over pixels of y * R) —
    the weighted term breaks permutation invariance, so a broken
    4-pass de-interlace flips rows even when the pixel multiset is
    right. Non-GIF or malformed payloads contribute no rows
    (quarantine by omission)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .gifcodec import decode_gif_frames

        cols = list(GIF_FRAME_STATS_SCHEMA.names)
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf["payload"]):
                payload = bytes(p) if p is not None else b""
                if payload[:6] not in (b"GIF87a", b"GIF89a"):
                    continue
                try:
                    frames = decode_gif_frames(payload)
                except Exception:  # noqa: BLE001 — quarantine
                    continue
                for k, fr in enumerate(frames):
                    c = fr.astype(np.int64)
                    ys = np.arange(fr.shape[0], dtype=np.int64)[:, None]
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": k,
                            "width": fr.shape[1],
                            "height": fr.shape[0],
                            "sum_r": int(c[:, :, 0].sum()),
                            "sum_g": int(c[:, :, 1].sum()),
                            "sum_b": int(c[:, :, 2].sum()),
                            "ywsum_r": int((ys * c[:, :, 0]).sum()),
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return media.select(id_col, "payload").mapInPandas(
        run, GIF_FRAME_STATS_SCHEMA
    )


AVI_FRAME_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
        StructField("ywsum_r", LongType()),
    ]
)


def with_avi_media(docs: DataFrame) -> DataFrame:
    """Attach a deterministic AVI/Motion-JPEG payload built by the
    engine's own codecs end to end: per doc, 1 + d%4 frames of size
    (3 + d%13) x (2 + d%11), each frame a REAL JPEG stream carrying
    the SOF3 LOSSLESS process (jpegcodec.encode_jpeg(lossless=True) —
    Huffman-coded predictor residuals, exact reconstruction), muxed
    into a spec-shaped RIFF container (avicodec.encode_avi_mjpeg:
    hdrl/avih/strl, movi 00dc chunks with word padding, idx1). Frame
    k's pixel rows carry r = (3d + 11k + 2y) % 256,
    g = (5d + 7k + 3y) % 256, b = (d + 13k + 5y) % 256 (constant
    along x), so every decoded statistic is closed-form doc_id
    arithmetic — but the Spark side must run the genuine RIFF walk +
    lossless-JPEG entropy decode to agree. Lossless frames make the
    oracle EXACT; the baseline-JPEG demux path shares all the
    container code and is pytest-pinned instead (quant rounding has
    no closed SQL form)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .avicodec import encode_avi_mjpeg
        from .jpegcodec import encode_jpeg

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w = 3 + d % 13
                h = 2 + d % 11
                n = 1 + d % 4
                ys = np.arange(h, dtype=np.int64)[:, None]
                frames = []
                for k in range(n):
                    r = (3 * d + 11 * k + 2 * ys) % 256
                    g = (5 * d + 7 * k + 3 * ys) % 256
                    b = (d + 13 * k + 5 * ys) % 256
                    arr = np.broadcast_to(
                        np.stack(
                            [r, g, b], axis=2
                        ),  # (h, 1, 3) -> (h, w, 3)
                        (h, w, 3),
                    ).astype(np.uint8)
                    frames.append(encode_jpeg(arr, lossless=True))
                rows.append(
                    {
                        "doc_id": d,
                        "payload": encode_avi_mjpeg(frames, w, h),
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    # spread the per-frame JPEG entropy coding across cores (see
    # with_gif_media — the one-row-group scan would otherwise run the
    # whole corpus encode+decode in a single Python worker)
    ids = docs.select("doc_id").repartition(_python_parallelism(docs))
    return ids.mapInPandas(run, "doc_id long, payload binary")


def extract_avi_frame_stats(
    media: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Per-frame statistics from AVI/MJPEG payload bytes: a real RIFF
    chunk walk + per-frame JPEG decode (operators/avicodec.py over
    jpegcodec.py), one Arrow mapInPandas pass. Emits exact integer
    channel sums plus the row-position-weighted ywsum_r (the same
    permutation-breaking discipline as extract_gif_frame_stats — a
    frame-order or row-order bug cannot cancel). Non-AVI or malformed
    payloads contribute no rows (quarantine by omission)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .avicodec import iter_avi_frames

        cols = list(AVI_FRAME_STATS_SCHEMA.names)
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf["payload"]):
                payload = bytes(p) if p is not None else b""
                if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
                    continue
                try:
                    frames = list(iter_avi_frames(payload))
                except Exception:  # noqa: BLE001 — quarantine
                    continue
                for k, fr in enumerate(frames):
                    if fr.shape[2] == 1:
                        fr = np.repeat(fr, 3, axis=2)
                    c = fr.astype(np.int64)
                    ys = np.arange(fr.shape[0], dtype=np.int64)[:, None]
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": k,
                            "width": fr.shape[1],
                            "height": fr.shape[0],
                            "sum_r": int(c[:, :, 0].sum()),
                            "sum_g": int(c[:, :, 1].sum()),
                            "sum_b": int(c[:, :, 2].sum()),
                            "ywsum_r": int((ys * c[:, :, 0]).sum()),
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return media.select(id_col, "payload").mapInPandas(
        run, AVI_FRAME_STATS_SCHEMA
    )


MP4_FRAME_STATS_SCHEMA = AVI_FRAME_STATS_SCHEMA


def with_mp4_mjpeg_media(docs: DataFrame) -> DataFrame:
    """Attach a deterministic MJPEG-in-MP4 payload built by the
    engine's own codecs end to end (r11, VERDICT r10 #4): per doc,
    1 + d%3 frames of size (3 + d%11) x (2 + d%9), each frame a REAL
    JPEG stream carrying the SOF3 LOSSLESS process
    (jpegcodec.encode_jpeg(lossless=True) — exact reconstruction),
    muxed into a spec-shaped ISO-BMFF file
    (mp4codec.encode_mp4_mjpeg: ftyp|mdat|moov with full
    stsd/stts/stsc/stsz/stco sample tables, samples packed two per
    chunk so the stsc run map is non-trivial). Frame k's pixel rows
    carry r = (7d + 5k + 3y) % 256, g = (3d + 13k + y) % 256,
    b = (11d + 2k + 7y) % 256 (constant along x), so every decoded
    statistic is closed-form doc_id arithmetic — but the Spark side
    must run the genuine sample-table walk + lossless-JPEG entropy
    decode to agree."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .jpegcodec import encode_jpeg
        from .mp4codec import encode_mp4_mjpeg

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w = 3 + d % 11
                h = 2 + d % 9
                n = 1 + d % 3
                ys = np.arange(h, dtype=np.int64)[:, None]
                frames = []
                for k in range(n):
                    r = (7 * d + 5 * k + 3 * ys) % 256
                    g = (3 * d + 13 * k + ys) % 256
                    b = (11 * d + 2 * k + 7 * ys) % 256
                    arr = np.broadcast_to(
                        np.stack([r, g, b], axis=2), (h, w, 3)
                    ).astype(np.uint8)
                    frames.append(encode_jpeg(arr, lossless=True))
                rows.append(
                    {
                        "doc_id": d,
                        "payload": encode_mp4_mjpeg(frames, w, h),
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    # spread the per-frame JPEG entropy coding across cores (see
    # with_avi_media)
    ids = docs.select("doc_id").repartition(_python_parallelism(docs))
    return ids.mapInPandas(run, "doc_id long, payload binary")


def extract_mp4_frame_stats(
    media: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Per-frame statistics from MJPEG-in-MP4 payload bytes: a real
    ISO-BMFF sample-table walk + per-sample JPEG decode
    (operators/mp4codec.py over jpegcodec.py), one Arrow mapInPandas
    pass. Emits exact integer channel sums plus the
    row-position-weighted ywsum_r (the permutation-breaking discipline
    of extract_avi_frame_stats — a frame-order or row-order bug cannot
    cancel). Non-MP4 or malformed payloads contribute no rows
    (quarantine by omission); inter-frame codecs raise LOUDLY inside
    iter_mp4_frames and are likewise quarantined here — the
    classify/triage path (media_quarantine_profile) is where they are
    counted, not silently decoded."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .mp4codec import iter_mp4_frames

        cols = list(MP4_FRAME_STATS_SCHEMA.names)
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf["payload"]):
                payload = bytes(p) if p is not None else b""
                if payload[4:8] != b"ftyp":
                    continue
                try:
                    frames = list(iter_mp4_frames(payload))
                except Exception:  # noqa: BLE001 — quarantine
                    continue
                for k, fr in enumerate(frames):
                    if fr.shape[2] == 1:
                        fr = np.repeat(fr, 3, axis=2)
                    c = fr.astype(np.int64)
                    ys = np.arange(fr.shape[0], dtype=np.int64)[:, None]
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": k,
                            "width": fr.shape[1],
                            "height": fr.shape[0],
                            "sum_r": int(c[:, :, 0].sum()),
                            "sum_g": int(c[:, :, 1].sum()),
                            "sum_b": int(c[:, :, 2].sum()),
                            "ywsum_r": int((ys * c[:, :, 0]).sum()),
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return media.select(id_col, "payload").mapInPandas(
        run, MP4_FRAME_STATS_SCHEMA
    )


MP3_PROBE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("bitrate_kbps", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("channel_mode", StringType()),
        StructField("n_frames", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

# MPEG-1 Layer III bitrate table as a SQL/JVM-shared hex of kbps values
_MP3_KBPS = (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
_MP3_SR = (44100, 48000, 32000)


def with_mp3_media(docs: DataFrame) -> DataFrame:
    """Attach a deterministic, structurally-valid MPEG-1 Layer III
    stream built byte-for-byte JVM-side: an ID3v2 tag of 3*(d%7) body
    bytes (syncsafe size), then 1 + d%6 identical frames — header
    FF FB (sync, MPEG-1, Layer III, no CRC) with bitrate index
    1 + d%14 and sample-rate index d%3, zero audio bytes padded to the
    EXACT frame length floor(144000*kbps/sr). Every probed field is
    doc_id arithmetic the SQL oracle restates, but the Spark side must
    actually run the frame walk (a wrong length formula desyncs the
    frame count)."""
    d = F.col("doc_id")
    bi = (F.lit(1) + d % 14).cast("int")
    si = (d % 3).cast("int")
    n = (F.lit(1) + d % 6).cast("int")
    t = (F.lit(3) * (d % 7)).cast("int")  # ID3 body size, < 128
    kbps = F.element_at(
        F.array(*[F.lit(v) for v in _MP3_KBPS]), bi
    )
    sr = F.element_at(
        F.array(*[F.lit(v) for v in _MP3_SR]), si + 1
    )
    flen = F.floor(F.lit(144_000) * kbps / sr).cast("int")
    frame_hex = F.concat(
        F.lit("FFFB"),
        _be_hex((F.shiftleft(bi, 4) + F.shiftleft(si, 2)).cast("bigint"), 1),
        F.lit("00"),
        F.repeat(F.lit("00"), flen - 4),
    )
    id3_hex = F.concat(
        F.lit("494433030000"),  # "ID3" v2.3, no flags
        F.lit("000000"),
        _be_hex(t.cast("bigint"), 1),  # syncsafe: t < 128 fits last byte
        F.repeat(F.lit("00"), t),
    )
    payload = F.unhex(F.concat(id3_hex, F.repeat(frame_hex, n)))
    return docs.select("doc_id", payload.alias("payload"))


def extract_mp3_meta(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """MP3 stream metadata without audio decode: one Arrow mapInPandas
    pass of operators/audioprobe.parse_mp3 (ID3v2 skip + real MPEG-1
    Layer III frame walk). Unparseable payloads contribute no rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .audioprobe import parse_mp3

        cols = list(MP3_PROBE_SCHEMA.names)
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf["payload"]):
                try:
                    m = parse_mp3(bytes(p) if p is not None else b"")
                except Exception:  # noqa: BLE001 — quarantine
                    continue
                rows.append({"doc_id": doc_id, **m})
            yield pd.DataFrame(rows, columns=cols)

    return media.select(id_col, "payload").mapInPandas(run, MP3_PROBE_SCHEMA)


FLAC_PROBE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("bits_per_sample", IntegerType()),
        StructField("total_samples", LongType()),
        StructField("duration_ms", LongType()),
    ]
)


def with_flac_media(docs: DataFrame) -> DataFrame:
    """Attach a deterministic 'fLaC' + STREAMINFO payload built
    JVM-side. The bit-packed STREAMINFO tail (sample rate 20 bits,
    channels-1 3 bits, bits-per-sample-1 5 bits, total samples 36
    bits) is ONE 64-bit big-endian integer, so the hex template is
    pure arithmetic: packed = sr*2^44 + (ch-1)*2^41 + (bps-1)*2^36 +
    total. Fields: sr = 8000*(1 + d%6), ch = 1 + d%8,
    bps = 8 + 4*(d%3), total = 1000 + d%9999."""
    d = F.col("doc_id")
    sr = (F.lit(8000) * (F.lit(1) + d % 6)).cast("bigint")
    ch = (F.lit(1) + d % 8).cast("bigint")
    bps = (F.lit(8) + F.lit(4) * (d % 3)).cast("bigint")
    total = (F.lit(1000) + d % 9999).cast("bigint")
    packed = (
        sr * F.lit(1 << 44).cast("bigint")
        + (ch - 1) * F.lit(1 << 41).cast("bigint")
        + (bps - 1) * F.lit(1 << 36).cast("bigint")
        + total
    )
    payload = F.unhex(
        F.concat(
            F.lit("664C6143"),  # 'fLaC'
            F.lit("80000022"),  # last block, type 0, length 34
            F.lit("10001000"),  # min/max blocksize 4096
            F.lit("000000000000"),  # frame-size bounds unknown
            _be_hex(packed, 8),
            F.repeat(F.lit("00"), 16),  # md5 unset
        )
    )
    return docs.select("doc_id", payload.alias("payload"))


def extract_flac_meta(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """FLAC STREAMINFO metadata without audio decode: one Arrow
    mapInPandas pass of operators/audioprobe.parse_flac (metadata
    block walk + bit-field unpack). Unparseable payloads contribute
    no rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .audioprobe import parse_flac

        cols = list(FLAC_PROBE_SCHEMA.names)
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf["payload"]):
                try:
                    m = parse_flac(bytes(p) if p is not None else b"")
                except Exception:  # noqa: BLE001 — quarantine
                    continue
                rows.append(
                    {
                        "doc_id": doc_id,
                        "sample_rate": m["sample_rate"],
                        "channels": m["channels"],
                        "bits_per_sample": m["bits_per_sample"],
                        "total_samples": m["total_samples"],
                        "duration_ms": m["duration_ms"],
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return media.select(id_col, "payload").mapInPandas(
        run, FLAC_PROBE_SCHEMA
    )


G711_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("peak", IntegerType()),
        StructField("dc_sum", LongType()),
        StructField("energy", LongType()),
    ]
)


def with_g711_media(docs: DataFrame) -> DataFrame:
    """Attach a deterministic G.711 mu-law WAV (format tag 7, 8-bit
    coded samples, mono 8 kHz): 1 + d%50 pairs of alternating coded
    bytes b1 = (7d + 13) % 256 and b2 = (11d + 97) % 256, built
    JVM-side. The DECODED 14-bit linear values are closed-form
    arithmetic over the coded bytes (the CCITT expansion formula), so
    the oracle restates every statistic while the Spark side must run
    the real mu-law expansion."""
    d = F.col("doc_id")
    m = (F.lit(1) + d % 50).cast("int")
    b1 = ((F.lit(7) * d + 13) % 256).cast("bigint")
    b2 = ((F.lit(11) * d + 97) % 256).cast("bigint")
    datalen = (m * 2).cast("bigint")
    payload = F.unhex(
        F.concat(
            F.lit("52494646"),  # RIFF
            _le_hex(F.lit(36) + datalen, 4),
            F.lit("57415645666D7420"),  # WAVE, "fmt "
            F.lit("100000000700"),  # fmt size 16, format 7 = mu-law
            _le_hex(F.lit(1), 2),  # mono
            _le_hex(F.lit(8000), 4),
            _le_hex(F.lit(8000), 4),  # byte rate (1 byte/sample)
            _le_hex(F.lit(1), 2),  # block align
            F.lit("0800"),  # 8 bits per coded sample
            F.lit("64617461"),  # data
            _le_hex(datalen, 4),
            F.repeat(F.concat(_be_hex(b1, 1), _be_hex(b2, 1)), m),
        )
    )
    return docs.select("doc_id", payload.alias("payload"))


def extract_g711_stats(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL G.711 mu-law sample decode: walk the RIFF chunks, check
    format tag 7 / 8-bit, then expand every coded byte with the CCITT
    formula (u = ~code; t = ((u & 0xF) << 3) + 0x84 shifted by the
    segment; sign via bit 7) — vectorized over numpy, one Arrow
    mapInPandas pass. Emits exact integer loudness stats on the
    decoded 14-bit linear samples. Non-mu-law payloads contribute no
    rows (quarantine by omission)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = list(G711_STATS_SCHEMA.names)
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf["payload"]):
                payload = bytes(p) if p is not None else b""
                fmt, data, _ = _wav_chunks(payload)
                if fmt is None or len(fmt) < 16 or not data:
                    continue
                (tag,) = struct.unpack_from("<H", fmt, 0)
                (bits,) = struct.unpack_from("<H", fmt, 14)
                if tag != 7 or bits != 8:
                    continue
                code = np.frombuffer(data, np.uint8).astype(np.int64)
                u = 255 - code  # ~code & 0xFF
                t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)
                s = np.where(u & 0x80, 0x84 - t, t - 0x84)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_samples": len(s),
                        "peak": int(np.abs(s).max()),
                        "dc_sum": int(s.sum()),
                        "energy": int((s * s).sum()),
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return media.select(id_col, "payload").mapInPandas(
        run, G711_STATS_SCHEMA
    )


ADPCM_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("peak", IntegerType()),
        StructField("dc_sum", LongType()),
        StructField("energy", LongType()),
        StructField("last_sample", IntegerType()),
    ]
)


def with_adpcm_media(docs: DataFrame) -> DataFrame:
    """Attach a deterministic IMA ADPCM WAV (format tag 0x11, 4-bit
    codes, mono, one block): a 4-byte block header seeding the decoder
    state (initial predictor 100*(d%50) - 2000 as little-endian two's
    complement int16, step index d%89), then 8*(1 + d%12) code bytes
    whose nibble stream is n_k = (d + k) % 16 (low nibble first —
    period 16 over k means the BYTE stream has period 8, so the hex
    template is a repeat of one arithmetic 8-byte unit). Every decoded
    sample is a stateful recurrence over the whole prefix — which is
    the point: the oracle must restate it as a recursive CTE, not
    closed-form arithmetic."""
    d = F.col("doc_id")
    u = (F.lit(1) + d % 12).cast("int")  # 8-byte units
    pred0 = (F.lit(100) * (d % 50) - 2000).cast("bigint")
    idx0 = (d % 89).cast("bigint")
    datalen = (F.lit(4) + F.lit(8) * u).cast("bigint")
    unit_hex = F.concat(
        *[
            _be_hex(
                (
                    (d + 2 * j) % 16 + F.lit(16) * ((d + 2 * j + 1) % 16)
                ).cast("bigint"),
                1,
            )
            for j in range(8)
        ]
    )
    payload = F.unhex(
        F.concat(
            F.lit("52494646"),  # RIFF
            _le_hex(F.lit(36) + datalen, 4),
            F.lit("57415645666D7420"),  # WAVE, "fmt "
            F.lit("100000001100"),  # fmt size 16, format 0x11 IMA ADPCM
            _le_hex(F.lit(1), 2),  # mono
            _le_hex(F.lit(8000), 4),
            _le_hex(F.lit(4000), 4),  # nominal byte rate
            _le_hex(datalen, 2),  # block align = the single block
            F.lit("0400"),  # 4 bits per code
            F.lit("64617461"),  # data
            _le_hex(datalen, 4),
            _le_hex(F.pmod(pred0, F.lit(65536)), 2),  # header: predictor
            _be_hex(idx0, 1),  # header: step index
            F.lit("00"),  # header: reserved
            F.repeat(unit_hex, u),
        )
    )
    return docs.select("doc_id", payload.alias("payload"))


def extract_adpcm_stats(
    media: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """REAL IMA ADPCM decode (operators/audioprobe.ima_adpcm_decode —
    the 89-entry step table, shift-add diff expansion, int16 clamp,
    index clamp): walk the RIFF chunks, check format tag 0x11 / 4-bit,
    seed the state from the block header, emit the header predictor as
    sample 0 (the Microsoft IMA-WAV convention) followed by one sample
    per nibble (low nibble first). Exact integer loudness stats plus
    last_sample, which depends on EVERY previous code — a single
    step-table or clamp error anywhere in the stream flips it.
    Non-ADPCM payloads contribute no rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .audioprobe import ima_adpcm_decode

        cols = list(ADPCM_STATS_SCHEMA.names)
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf["payload"]):
                payload = bytes(p) if p is not None else b""
                fmt, data, _ = _wav_chunks(payload)
                if fmt is None or len(fmt) < 16 or data is None:
                    continue
                (tag,) = struct.unpack_from("<H", fmt, 0)
                (bits,) = struct.unpack_from("<H", fmt, 14)
                if tag != 0x11 or bits != 4 or len(data) < 4:
                    continue
                (pred0,) = struct.unpack_from("<h", data, 0)
                idx0 = data[2]
                nibbles = []
                for b in data[4:]:
                    nibbles.append(b & 0x0F)
                    nibbles.append(b >> 4)
                try:
                    decoded = ima_adpcm_decode(nibbles, pred0, idx0)
                except ValueError:
                    continue  # quarantine malformed state
                samples = [pred0, *decoded]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_samples": len(samples),
                        "peak": max(abs(s) for s in samples),
                        "dc_sum": sum(samples),
                        "energy": sum(s * s for s in samples),
                        "last_sample": samples[-1],
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return media.select(id_col, "payload").mapInPandas(
        run, ADPCM_STATS_SCHEMA
    )


TIFF_PROBE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_order", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("orientation", IntegerType()),
        StructField("samples_per_pixel", IntegerType()),
    ]
)


def with_tiff_media(docs: DataFrame) -> DataFrame:
    """Attach a deterministic TIFF header + one IFD, alternating BYTE
    ORDER by doc parity ('II' little-endian on even doc_ids, 'MM'
    big-endian on odd — the probe must honor both): four SHORT
    entries (ImageWidth 16 + d%640, ImageLength 16 + d%480,
    Orientation 1 + d%8, SamplesPerPixel 1 + d%4) with left-justified
    inline values and a zero next-IFD pointer, built JVM-side."""
    d = F.col("doc_id")
    is_le = (d % 2 == 0)
    w = (F.lit(16) + d % 640).cast("bigint")
    h = (F.lit(16) + d % 480).cast("bigint")
    ori = (F.lit(1) + d % 8).cast("bigint")
    spp = (F.lit(1) + d % 4).cast("bigint")

    def u16(v: Column) -> Column:
        return F.when(is_le, _le_hex(v, 2)).otherwise(_be_hex(v, 2))

    def entry(tag: int, val: Column) -> Column:
        # tag, type SHORT(3), count 1, left-justified u16 value + pad
        return F.concat(
            u16(F.lit(tag).cast("bigint")),
            u16(F.lit(3).cast("bigint")),
            F.when(is_le, F.lit("01000000")).otherwise(F.lit("00000001")),
            u16(val),
            F.lit("0000"),
        )

    header = F.when(is_le, F.lit("49492A0008000000")).otherwise(
        F.lit("4D4D002A00000008")
    )
    payload = F.unhex(
        F.concat(
            header,
            u16(F.lit(4).cast("bigint")),  # entry count
            entry(256, w),
            entry(257, h),
            entry(274, ori),
            entry(277, spp),
            F.lit("00000000"),  # next IFD: none
        )
    )
    return docs.select("doc_id", payload.alias("payload"))


def extract_tiff_meta(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """EXIF-style image-metadata triage without pixel decode: one
    Arrow mapInPandas pass of operators/tiffprobe.parse_tiff over the
    payload bytes. Unparseable payloads contribute no rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .tiffprobe import parse_tiff

        cols = list(TIFF_PROBE_SCHEMA.names)
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf["payload"]):
                try:
                    m = parse_tiff(bytes(p) if p is not None else b"")
                except Exception:  # noqa: BLE001 — quarantine
                    continue
                rows.append({"doc_id": doc_id, **m})
            yield pd.DataFrame(rows, columns=cols)

    return media.select(id_col, "payload").mapInPandas(
        run, TIFF_PROBE_SCHEMA
    )


WARC_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_records", IntegerType()),
        StructField("n_response", IntegerType()),
        StructField("total_payload_bytes", LongType()),
    ]
)

_WARC_TYPES = ("warcinfo", "response", "request")


def with_warc_media(docs: DataFrame) -> DataFrame:
    """Attach a deterministic multi-record WARC/1.0 stream — the
    container web-scale text corpora actually arrive in (ISO 28500):
    2 + d%3 records per doc, record i carrying WARC-Type
    {warcinfo,response,request}[(d + i) % 3], a record id, a
    Content-Length header that must be HONORED to find the next
    record, and a payload of 10 + (d + i) % 40 'x' bytes, with the
    spec's CRLF CRLF record separator. Built JVM-side (pure string
    concat), parsed for real on the extract side."""
    d = F.col("doc_id")

    def record(i: int) -> Column:
        wtype = F.element_at(
            F.array(*[F.lit(t) for t in _WARC_TYPES]),
            ((d + i) % 3 + 1).cast("int"),
        )
        plen = (F.lit(10) + (d + i) % 40).cast("int")
        return F.concat(
            F.lit("WARC/1.0\r\nWARC-Type: "),
            wtype,
            F.lit("\r\nWARC-Record-ID: <urn:uuid:doc-"),
            d.cast("string"),
            F.lit(f"-{i}>"),
            F.lit("\r\nContent-Length: "),
            plen.cast("string"),
            F.lit("\r\n\r\n"),
            F.repeat(F.lit("x"), plen),
            F.lit("\r\n\r\n"),
        )

    n = (F.lit(2) + d % 3).cast("int")
    # records 0..n-1; n ranges 2..4, so build 4 and trim by n
    stream = F.concat(
        *[F.when(F.lit(i) < n, record(i)).otherwise(F.lit("")) for i in range(4)]
    )
    return docs.select(
        "doc_id", F.encode(stream, "UTF-8").alias("payload")
    )


def _walk_warc_records(payload: bytes):
    """Shared WARC/1.0 record walk: parse each record's version line
    and headers, honor Content-Length to skip the payload, require
    the CRLF CRLF separator, repeat to end of stream. Returns
    (n_records, n_response, total_payload_bytes) or None when the
    stream is malformed or empty. One definition for the plain and
    gzip-member extractors."""
    pos = 0
    n_records = n_response = 0
    total = 0
    while pos < len(payload):
        hdr_end = payload.find(b"\r\n\r\n", pos)
        if hdr_end < 0 or not payload.startswith(b"WARC/1.0\r\n", pos):
            return None
        headers = payload[pos:hdr_end].decode("utf-8", "replace")
        clen = wtype = None
        for line in headers.split("\r\n")[1:]:
            k, _, v = line.partition(":")
            k = k.strip().lower()
            if k == "content-length":
                # non-integer => malformed record, quarantine the row
                # (never raise out of the Spark task); negative lengths
                # are rejected below — a crafted negative value can land
                # the implied record end on an EARLIER separator and
                # stall the walk forever
                try:
                    clen = int(v.strip())
                except ValueError:
                    clen = None
            elif k == "warc-type":
                wtype = v.strip()
        body = hdr_end + 4
        if clen is None or clen < 0 or body + clen + 4 > len(payload):
            return None
        if payload[body + clen : body + clen + 4] != b"\r\n\r\n":
            return None
        n_records += 1
        total += clen
        if wtype == "response":
            n_response += 1
        nxt = body + clen + 4
        if nxt <= pos:  # walk must strictly advance — hang guard
            return None
        pos = nxt
    if n_records == 0:
        return None
    return n_records, n_response, total


def extract_warc_stats(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL WARC record walk (_walk_warc_records) — the record
    enumeration a WET/WARC ingest runs before any text extraction.
    Emits record count, response-record count, and total payload
    bytes; malformed streams contribute no rows (quarantine by
    omission). A wrong Content-Length interpretation desyncs the walk
    and flips every count."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = list(WARC_STATS_SCHEMA.names)
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf["payload"]):
                payload = bytes(p) if p is not None else b""
                walked = _walk_warc_records(payload)
                if walked is None:
                    continue
                n_records, n_response, total = walked
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_records": n_records,
                        "n_response": n_response,
                        "total_payload_bytes": total,
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return media.select(id_col, "payload").mapInPandas(
        run, WARC_STATS_SCHEMA
    )


WARCGZ_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_members", IntegerType()),
        StructField("n_records", IntegerType()),
        StructField("n_response", IntegerType()),
        StructField("total_payload_bytes", LongType()),
    ]
)


def with_warcgz_media(docs: DataFrame) -> DataFrame:
    """Attach a deterministic .warc.gz — the EXACT container Common
    Crawl ships: each WARC record is INDIVIDUALLY gzip-compressed
    (mtime pinned) and the members are concatenated, which is what
    makes per-record random access possible at archive scale. Record
    arithmetic matches with_warc_media (2 + d%3 records, type cycle
    (d + i) % 3, payload 10 + (d + i) % 40 bytes), so the oracle is
    the same closed form plus n_members == n_records."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import gzip

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                parts = []
                for i in range(2 + d % 3):
                    wtype = _WARC_TYPES[(d + i) % 3]
                    plen = 10 + (d + i) % 40
                    rec = (
                        f"WARC/1.0\r\nWARC-Type: {wtype}\r\n"
                        f"WARC-Record-ID: <urn:uuid:doc-{d}-{i}>\r\n"
                        f"Content-Length: {plen}\r\n\r\n"
                    ).encode() + b"x" * plen + b"\r\n\r\n"
                    parts.append(gzip.compress(rec, mtime=0))
                rows.append({"doc_id": d, "payload": b"".join(parts)})
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    ids = docs.select("doc_id").repartition(_python_parallelism(docs))
    return ids.mapInPandas(run, "doc_id long, payload binary")


def extract_warcgz_stats(
    media: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """REAL gzip-member demux + WARC record walk: iterate the
    concatenated gzip members with zlib.decompressobj (wbits=31,
    advancing by each member's consumed bytes via unused_data — the
    random-access property .warc.gz exists for), then run the shared
    record walk over the decompressed stream. n_members pins the
    member demux independently of n_records; a member-boundary bug or
    a header-walk bug flips different columns. Malformed payloads
    contribute no rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        cols = list(WARCGZ_STATS_SCHEMA.names)
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf["payload"]):
                payload = bytes(p) if p is not None else b""
                pos = 0
                members = []
                ok = len(payload) > 0
                while pos < len(payload):
                    dec = zlib.decompressobj(wbits=31)
                    try:
                        chunk = dec.decompress(payload[pos:])
                    except zlib.error:
                        ok = False
                        break
                    if not dec.eof:
                        ok = False  # truncated final member
                        break
                    members.append(chunk)
                    pos = len(payload) - len(dec.unused_data)
                if not ok or not members:
                    continue
                walked = _walk_warc_records(b"".join(members))
                if walked is None:
                    continue
                n_records, n_response, total = walked
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_members": len(members),
                        "n_records": n_records,
                        "n_response": n_response,
                        "total_payload_bytes": total,
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return media.select(id_col, "payload").mapInPandas(
        run, WARCGZ_STATS_SCHEMA
    )


ZIP_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_members", IntegerType()),
        StructField("total_uncompressed", LongType()),
        StructField("n_stored", IntegerType()),
    ]
)


def with_zip_media(docs: DataFrame) -> DataFrame:
    """Attach a deterministic ZIP archive built with stdlib zipfile
    (pinned DOS timestamp, so bytes are reproducible): 1 + d%5
    members, member i holding 5 + (d + i) % 20 'x' bytes, STORED on
    even (d + i) and DEFLATED on odd — the archive-of-documents
    delivery shape. The extract side parses the central directory
    MANUALLY (operators/archiveprobe.parse_zip), so stdlib zipfile
    sits only on this fabrication side of the contract."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import zipfile

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                buf = io.BytesIO()
                with zipfile.ZipFile(buf, "w") as z:
                    for i in range(1 + d % 5):
                        zi = zipfile.ZipInfo(
                            f"m{i}.txt", date_time=(1980, 1, 1, 0, 0, 0)
                        )
                        z.writestr(
                            zi,
                            b"x" * (5 + (d + i) % 20),
                            compress_type=(
                                zipfile.ZIP_STORED
                                if (d + i) % 2 == 0
                                else zipfile.ZIP_DEFLATED
                            ),
                        )
                rows.append({"doc_id": d, "payload": buf.getvalue()})
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    # same core-parallelism spread as the other Python fixture stages
    ids = docs.select("doc_id").repartition(_python_parallelism(docs))
    return ids.mapInPandas(run, "doc_id long, payload binary")


def extract_zip_stats(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """ZIP member enumeration via a REAL central-directory walk
    (operators/archiveprobe.parse_zip — EOCD backward scan, entry
    count honored, per-member method/size fields). Malformed archives
    contribute no rows (quarantine by omission)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .archiveprobe import parse_zip

        cols = list(ZIP_STATS_SCHEMA.names)
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf["payload"]):
                try:
                    m = parse_zip(bytes(p) if p is not None else b"")
                except Exception:  # noqa: BLE001 — quarantine
                    continue
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_members": m["n_members"],
                        "total_uncompressed": m["total_uncompressed"],
                        "n_stored": m["n_stored"],
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return media.select(id_col, "payload").mapInPandas(
        run, ZIP_STATS_SCHEMA
    )


TAR_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_members", IntegerType()),
        StructField("total_file_bytes", LongType()),
    ]
)


def with_tar_media(docs: DataFrame) -> DataFrame:
    """Attach a deterministic ustar TAR (stdlib tarfile, mtime pinned
    to 0): 1 + d%4 regular-file members, member i holding
    5 + (d + i) % 20 bytes. The extract side walks the 512-byte
    blocks manually and VERIFIES each header checksum
    (operators/archiveprobe.parse_tar)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import tarfile

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                buf = io.BytesIO()
                with tarfile.open(fileobj=buf, mode="w") as t:
                    for i in range(1 + d % 4):
                        ti = tarfile.TarInfo(f"f{i}.txt")
                        ti.size = 5 + (d + i) % 20
                        ti.mtime = 0
                        t.addfile(ti, io.BytesIO(b"y" * ti.size))
                rows.append({"doc_id": d, "payload": buf.getvalue()})
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    # same core-parallelism spread as the other Python fixture stages
    ids = docs.select("doc_id").repartition(_python_parallelism(docs))
    return ids.mapInPandas(run, "doc_id long, payload binary")


def extract_tar_stats(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """TAR member enumeration via a REAL ustar block walk with header
    checksum verification (operators/archiveprobe.parse_tar).
    Malformed archives contribute no rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .archiveprobe import parse_tar

        cols = list(TAR_STATS_SCHEMA.names)
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf["payload"]):
                try:
                    m = parse_tar(bytes(p) if p is not None else b"")
                except Exception:  # noqa: BLE001 — quarantine
                    continue
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_members": m["n_members"],
                        "total_file_bytes": m["total_file_bytes"],
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return media.select(id_col, "payload").mapInPandas(
        run, TAR_STATS_SCHEMA
    )


PARQUET_PROBE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("num_rows", LongType()),
        StructField("n_row_groups", IntegerType()),
        StructField("n_columns", IntegerType()),
    ]
)


def with_parquet_media(docs: DataFrame) -> DataFrame:
    """Attach a REAL parquet file per doc (pyarrow writer, fixture
    side only): 12*(1 + d%4) int64 rows over 1 + d%4 flat columns,
    split into exactly 1 + d%3 row groups (12 is divisible by 1/2/3,
    so row_group_size = n/g yields exactly g groups). Only
    writer-independent fields (row count, row-group count, column
    count) enter the compared surface — version/created_by vary by
    pyarrow release and are probed but not oracled."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        import pyarrow as pa
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 12 * (1 + d % 4)
                g = 1 + d % 3
                ncols = 1 + d % 4
                table = pa.table(
                    {
                        f"c{j}": list(range(d + j, d + j + n))
                        for j in range(ncols)
                    }
                )
                buf = io.BytesIO()
                pq.write_table(table, buf, row_group_size=n // g)
                rows.append({"doc_id": d, "payload": buf.getvalue()})
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    # spread the per-doc parquet writes across cores (the same
    # one-row-group-scan serialization as the GIF/AVI fixtures)
    ids = docs.select("doc_id").repartition(_python_parallelism(docs))
    return ids.mapInPandas(run, "doc_id long, payload binary")


def extract_parquet_meta(
    media: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Footer-only parquet triage via the hand-written Thrift
    compact-protocol reader (operators/parquetprobe.py) — O(footer
    bytes) per file, no column data touched, no parquet library.
    Malformed payloads contribute no rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .parquetprobe import parse_parquet_footer

        cols = list(PARQUET_PROBE_SCHEMA.names)
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf["payload"]):
                try:
                    m = parse_parquet_footer(
                        bytes(p) if p is not None else b""
                    )
                except Exception:  # noqa: BLE001 — quarantine
                    continue
                rows.append(
                    {
                        "doc_id": doc_id,
                        "num_rows": m["num_rows"],
                        "n_row_groups": m["n_row_groups"],
                        "n_columns": m["n_columns"],
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return media.select(id_col, "payload").mapInPandas(
        run, PARQUET_PROBE_SCHEMA
    )


def with_gzip_text(docs: DataFrame) -> DataFrame:
    """Gzip-compress every document body into a binary payload
    (stdlib gzip, mtime pinned to 0 so the member header is
    deterministic) — the shape a web-scale text corpus actually
    arrives in (WARC/WET members). NULL-text docs carry NULL
    payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import gzip

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                payload = (
                    gzip.compress(text.encode("utf-8"), mtime=0)
                    if text is not None
                    else None
                )
                rows.append({"doc_id": doc_id, "payload": payload})
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return docs.select("doc_id", "text").mapInPandas(
        run, "doc_id long, payload binary"
    )


GZIP_TEXT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
    ]
)


def extract_gzip_text(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Decompress gzip payloads and emit the decompressed byte length
    plus the md5 hex digest of the decompressed bytes — exact equality
    with the oracle's md5 over the ORIGINAL text proves the
    compress -> decompress round trip is byte-perfect across
    executors. Malformed/NULL payloads contribute no rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import gzip
        import hashlib

        cols = list(GZIP_TEXT_SCHEMA.names)
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf["payload"]):
                if p is None:
                    continue
                try:
                    raw = gzip.decompress(bytes(p))
                except Exception:  # noqa: BLE001 — quarantine
                    continue
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_bytes": len(raw),
                        "digest": hashlib.md5(raw).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return media.select(id_col, "payload").mapInPandas(
        run, GZIP_TEXT_SCHEMA
    )


AUDIO_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_ms", LongType()),
    ]
)


def extract_audio_stats(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Audio-length features from the payload bytes: a REAL RIFF chunk
    walk (not a fixed 44-byte offset — WAVs may carry LIST/fact chunks
    before ``data``) finds the ``fmt `` and ``data`` chunks, then
    n_samples = data bytes / (channels x bytes-per-sample) and
    duration_ms = n_samples x 1000 / rate, all integer-exact. The
    training-data use is duration filtering/bucketing without decoding
    a single sample. Non-WAV or NULL payloads yield NULL stats — same
    quarantine convention as materialize_thumbnails."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = list(AUDIO_STATS_SCHEMA.names)
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf["payload"]):
                rec = {
                    "doc_id": doc_id,
                    "channels": None,
                    "sample_rate": None,
                    "n_samples": None,
                    "duration_ms": None,
                }
                payload = bytes(p) if p is not None else b""
                if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
                    # duration comes from the data chunk's CLAIMED
                    # length (the payload may be truncated on disk;
                    # the claim is what ffprobe reports)
                    fmt, _, data_len = _wav_chunks(payload)
                    if fmt is not None and len(fmt) >= 16 and data_len is not None:
                        (ch,) = struct.unpack_from("<H", fmt, 2)
                        (rate,) = struct.unpack_from("<I", fmt, 4)
                        (bits,) = struct.unpack_from("<H", fmt, 14)
                        bytes_per = ch * (bits // 8)
                        if bytes_per and rate:
                            n = data_len // bytes_per
                            rec.update(
                                channels=ch,
                                sample_rate=rate,
                                n_samples=n,
                                duration_ms=n * 1000 // rate,
                            )
                rows.append(rec)
            yield pd.DataFrame(rows, columns=cols)

    return media.select(id_col, "payload").mapInPandas(run, AUDIO_STATS_SCHEMA)


THUMBNAIL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("format", StringType()),
        StructField("target_w", IntegerType()),
        StructField("target_h", IntegerType()),
        StructField("thumbnail", BinaryType()),
        StructField("decode_error", StringType()),
    ]
)


def materialize_thumbnails(
    media: DataFrame, max_dim: int = 16, id_col: str = "doc_id"
) -> DataFrame:
    """EXECUTE the thumbnail plan: decode each image payload, resize to
    the aspect-preserving target (same arithmetic as plan_thumbnails),
    and re-encode in the source container — one mapInPandas pass, the
    production shape for pixel work at scale (Arrow batches through
    Python workers, no shuffle, no driver collection).

    Rows whose container the pure-numpy codecs can't decode
    (arithmetic JPEGs, header-only payloads, audio/video) come back
    with a NULL thumbnail and the decode error string — a corrupt or
    unsupported payload must not kill a 100 TB pass, it must land in a
    quarantine bucket the pipeline can route on.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .imagecodec import decode, encode_like, resize_nearest

        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf["payload"]):
                rec = {
                    "doc_id": doc_id,
                    "format": None,
                    "target_w": None,
                    "target_h": None,
                    "thumbnail": None,
                    "decode_error": None,
                }
                try:
                    payload = bytes(p) if p is not None else b""
                    arr = decode(payload)
                    h, w = arr.shape[:2]
                    scale = max(w, h) / max_dim
                    tw = max(1, int(w / scale)) if scale > 1 else w
                    th = max(1, int(h / scale)) if scale > 1 else h
                    rec["format"] = (
                        "png" if payload[:8] == b"\x89PNG\r\n\x1a\n"
                        else "bmp" if payload[:2] == b"BM"
                        else "jpeg" if payload[:2] == b"\xff\xd8"
                        else "pnm"
                    )
                    rec["target_w"], rec["target_h"] = tw, th
                    rec["thumbnail"] = encode_like(
                        resize_nearest(arr, tw, th), payload
                    )
                except Exception as e:  # noqa: BLE001 — quarantine
                    # semantics: ANY malformed payload (bad chunk
                    # length -> zlib.error, short header -> struct
                    # .error, format issues -> ValueError) routes to
                    # the error column, never kills the pass
                    rec["decode_error"] = f"{type(e).__name__}: {e}"[:200]
                rows.append(rec)
            yield pd.DataFrame(rows, columns=list(THUMBNAIL_SCHEMA.names))

    return media.select(id_col, "payload").mapInPandas(run, THUMBNAIL_SCHEMA)


# --- codec-free planning stages (real arithmetic over parsed headers) ------

THUMBNAIL_PLAN_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("target_w", IntegerType()),
        StructField("target_h", IntegerType()),
    ]
)

FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_frames", IntegerType()),
        StructField("frame_idx", IntegerType()),
    ]
)


def plan_thumbnails(
    media: DataFrame, max_w: int = 128, max_h: int = 128
) -> DataFrame:
    """Aspect-preserving thumbnail plan for every IMAGE payload: parse
    the real container header (parse_media_header), then compute the
    fit-inside-(max_w, max_h) target dimensions — never upscale, never
    emit a zero dimension. This is the sizing stage of a resize
    pipeline with the pixel resample left to resize_image (the one
    step that needs PIL); everything up to it — header decode, batch
    shape, schema, partition-local execution — is the production
    plumbing, exercised for real.
    """

    cols = [f.name for f in THUMBNAIL_PLAN_SCHEMA]

    def plan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, mtype, p in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                if mtype != "image" or p is None:
                    continue
                parsed = parse_media_header(bytes(p))
                w, h = parsed["width"], parsed["height"]
                if not w or not h:
                    continue
                scale = min(max_w / w, max_h / h, 1.0)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "format": parsed["format"],
                        "width": w,
                        "height": h,
                        "target_w": max(1, int(w * scale)),
                        "target_h": max(1, int(h * scale)),
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(plan, THUMBNAIL_PLAN_SCHEMA)


def plan_frame_samples(media: DataFrame, every_n: int = 5) -> DataFrame:
    """Frame-sampling plan for every VIDEO payload: one OUTPUT ROW per
    sampled frame index (0, every_n, 2*every_n, ...) — the
    one-row-in/many-rows-out batch-explode shape a real frame extractor
    uses, with the ffmpeg probe stubbed by the deterministic
    n_bytes %% 30 pseudo frame count (parse_media_header). Swapping in
    ffmpeg changes only the probe and the per-frame payload; the
    mapInPandas contract — schema, expansion, no shuffle — is exactly
    this."""

    cols = [f.name for f in FRAME_SAMPLE_SCHEMA]

    def plan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, mtype, p in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                if mtype != "video" or p is None:
                    continue
                n_frames = parse_media_header(bytes(p))["n_frames"] or 0
                for idx in range(0, n_frames, every_n):
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "n_frames": n_frames,
                            "frame_idx": idx,
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(plan, FRAME_SAMPLE_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual-hash (dHash) image dedup — round 10
# ---------------------------------------------------------------------------

DHASH_GRID_W = 9  # block columns -> 8 horizontal comparisons per row
DHASH_GRID_H = 7  # block rows -> 56 bits total (fits signed int64
#                   without touching the sign bit on either engine)
DHASH_BANDS = 4
DHASH_BAND_BITS = 14


def _dhash_block_value(d: int, g: int, bx: int, by: int) -> int:
    """Closed-form gray value of block (bx, by) for doc ``d`` (group
    ``g = d // 2``) — THE single definition the fixture paints, the
    SQL oracle restates, and tests replay. Even/odd doc pairs share a
    group; the odd member gets one +3-bumped block, so a pair's
    hashes differ by 0-2 bits (the two comparisons that block touches)
    — a planted NEAR-duplicate, not an exact one."""
    v = (g * bx + 7 * bx * bx + 17 * by + 29 * g) % 199 + (
        (g * 13 + 5 * bx * bx + g * by + 3 * bx * by) % 23
    ) * 2
    if d % 2 == 1 and bx == g % DHASH_GRID_W and by == g % DHASH_GRID_H:
        v += 3
    return v


def with_dhash_media(docs: DataFrame) -> DataFrame:
    """Attach a deterministic grayscale IMAGE payload for perceptual-
    hash dedup: per doc, a (9*sx) x (7*sy) image (sx = 1 + d%3,
    sy = 1 + d%2) painted as a 9x7 grid of constant-value blocks from
    _dhash_block_value, encoded through the engine's own REAL codecs —
    format cycles PNG / BMP / PNM by d % 3, so the extractor exercises
    all three decode paths. Block-constant pixels make the dHash
    block means exact integers, so every decoded hash is closed-form
    doc_id arithmetic the SQL oracle restates — but the Spark side has
    to run a genuine decode + block-mean resize + bit pack to agree.

    Fabrication is a mapInPandas stage (real zlib/PNG output is not a
    SQL hex template), repartitioned to core parallelism like the
    other codec fixtures."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .imagecodec import encode_bmp, encode_png, encode_pnm

        encoders = (encode_png, encode_bmp, encode_pnm)
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                g = d // 2
                sx = 1 + d % 3
                sy = 1 + d % 2
                grid = np.array(
                    [
                        [
                            _dhash_block_value(d, g, bx, by)
                            for bx in range(DHASH_GRID_W)
                        ]
                        for by in range(DHASH_GRID_H)
                    ],
                    np.uint8,
                )
                img = np.repeat(np.repeat(grid, sy, axis=0), sx, axis=1)
                rows.append(
                    {"doc_id": d, "payload": encoders[d % 3](img)}
                )
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    ids = docs.select("doc_id").repartition(_python_parallelism(docs))
    return ids.mapInPandas(run, "doc_id long, payload binary")


DHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("dhash", LongType()),
    ]
)


def extract_dhash(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL perceptual hash: decode the image (PNG/BMP/PNM via the
    pure-numpy codecs), downsample to the 9x7 dHash grid by exact
    block SUMS (the image dimensions are grid multiples; comparing
    sums of equal-sized blocks equals comparing means with no float
    division anywhere), then pack bit p = by*8 + bx as
    sum(bx, by) > sum(bx+1, by) into an int64. Images whose dimensions
    are not grid multiples are quarantined by omission, like every
    other malformed-payload extractor here."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .imagecodec import decode

        cols = list(DHASH_SCHEMA.names)
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf["payload"]):
                if p is None:
                    continue
                try:
                    arr = decode(bytes(p))
                except ValueError:
                    continue  # quarantine by omission
                if arr.ndim == 3:  # luma-less fixture is grayscale, but
                    arr = arr.mean(axis=2)  # accept RGB defensively
                h, w = arr.shape[:2]
                if h % DHASH_GRID_H or w % DHASH_GRID_W:
                    continue
                sy, sx = h // DHASH_GRID_H, w // DHASH_GRID_W
                sums = (
                    arr.astype(np.int64)
                    .reshape(DHASH_GRID_H, sy, DHASH_GRID_W, sx)
                    .sum(axis=(1, 3))
                )
                bits = 0
                for by in range(DHASH_GRID_H):
                    for bx in range(DHASH_GRID_W - 1):
                        if sums[by, bx] > sums[by, bx + 1]:
                            bits |= 1 << (by * 8 + bx)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": w,
                        "height": h,
                        "dhash": bits,
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return media.select(id_col, "payload").mapInPandas(run, DHASH_SCHEMA)


# ---------------------------------------------------------------------------
# Audio fingerprint dedup (round 10) — the audio sibling of dHash
# ---------------------------------------------------------------------------

AUDIO_FP_FRAMES = 32  # frames per clip -> 31 energy-gradient bits
AUDIO_FP_FRAME_SAMPLES = 4  # samples per frame (fixture contract)
AUDIO_FP_BANDS = 4
AUDIO_FP_BAND_BITS = 8


def _audio_fp_amplitude(d: int, g: int, f: int) -> int:
    """Closed-form int16 amplitude of frame ``f`` for doc ``d`` (group
    ``g = d // 2``) — painted by the fixture, restated by the SQL
    oracle, replayed by tests. The odd group member gets ONE bumped
    frame, so a pair's fingerprints differ by 0-2 bits: a planted
    near-duplicate clip (same recording, one transient)."""
    a = (
        (g * (f + 2) + 11 * f * f + 23 * g) % 997
        + ((g * 31 + 7 * f * f + 3 * g * f) % 131) * 9
    ) * 8
    if d % 2 == 1 and f == g % AUDIO_FP_FRAMES:
        a += 24
    return a


def with_fingerprint_audio(docs: DataFrame) -> DataFrame:
    """Attach a deterministic mono 16-bit PCM WAV shaped for acoustic
    fingerprinting: 32 frames x 4 samples, frame ``f`` holding the
    constant amplitude _audio_fp_amplitude(d, g, f). Constant-valued
    frames make per-frame energies exact integer arithmetic, so the
    fingerprint is closed-form — but the Spark side must walk the RIFF
    chunks and decode the little-endian int16 stream to agree. Built
    JVM-side from hex expressions like the other WAV fixtures."""
    d = F.col("doc_id")
    g = F.floor(d / 2).cast("bigint")
    frames = []
    for f in range(AUDIO_FP_FRAMES):
        # two co-prime moduli with f-coupled second residue: a single
        # mod-997 form keys every clip's whole GRADIENT-SIGN pattern to
        # g mod 997 alone (~1600 fingerprint classes corpus-wide -> hot
        # band buckets, a fixture artifact no real corpus has); the
        # mixed term makes fingerprints effectively unique per group
        # (2498/2500 distinct at sf0.1)
        a = (
            (g * (f + 2) + F.lit(11 * f * f) + F.lit(23) * g) % 997
            + ((g * 31 + F.lit(7 * f * f) + F.lit(3 * f) * g) % 131) * 9
        ) * 8
        a = a + F.when(
            (d % 2 == 1) & (g % AUDIO_FP_FRAMES == f), 24
        ).otherwise(0)
        frames.append(
            F.repeat(_le_hex(a.cast("bigint"), 2), AUDIO_FP_FRAME_SAMPLES)
        )
    datalen = F.lit(AUDIO_FP_FRAMES * AUDIO_FP_FRAME_SAMPLES * 2).cast(
        "bigint"
    )
    payload = F.unhex(
        F.concat(
            F.lit("52494646"),
            _le_hex(F.lit(36) + datalen, 4),
            F.lit("57415645666D7420"),
            F.lit("100000000100"),  # fmt size 16, PCM
            _le_hex(F.lit(1), 2),  # mono
            _le_hex(F.lit(8000), 4),
            _le_hex(F.lit(16000), 4),
            _le_hex(F.lit(2), 2),
            F.lit("1000"),
            F.lit("64617461"),
            _le_hex(datalen, 4),
            *frames,
        )
    )
    # repartition to core parallelism BEFORE the downstream Python
    # decode stage: the one-row-group testdata scan would otherwise
    # funnel every clip through a single Arrow worker (the gotcha the
    # gif/avi fixtures hit in round 9)
    return docs.repartition(_python_parallelism(docs)).select(
        "doc_id", payload.alias("payload")
    )


AUDIO_FP_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_frames", IntegerType()),
        StructField("fingerprint", LongType()),
    ]
)


def extract_audio_fingerprint(
    media: DataFrame,
    id_col: str = "doc_id",
    frame_samples: int = AUDIO_FP_FRAME_SAMPLES,
) -> DataFrame:
    """REAL acoustic fingerprint (energy-gradient family, the
    chromaprint/shazam shape without the FFT): walk the RIFF chunks,
    decode int16 PCM, sum per-frame INTEGER energies over fixed-size
    frames, and pack bit f = energy(f) > energy(f+1) into an int64.
    Clips whose sample count is not a whole number of frames are
    trimmed to the last full frame; non-WAV / non-16-bit payloads are
    quarantined by omission. Exact integer arithmetic end to end —
    both engines compare the same numbers."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = list(AUDIO_FP_SCHEMA.names)
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf["payload"]):
                payload = bytes(p) if p is not None else b""
                fmt, data, _ = _wav_chunks(payload)
                if fmt is None or len(fmt) < 16 or data is None:
                    continue
                (bits16,) = struct.unpack_from("<H", fmt, 14)
                if bits16 != 16 or len(data) < 2 * frame_samples:
                    continue
                s = np.frombuffer(
                    data, dtype="<i2", count=len(data) // 2
                ).astype(np.int64)
                nf = len(s) // frame_samples
                if nf < 2:
                    continue
                e = (
                    (s[: nf * frame_samples] ** 2)
                    .reshape(nf, frame_samples)
                    .sum(axis=1)
                )
                bits = 0
                for f in range(min(nf - 1, 63)):
                    if e[f] > e[f + 1]:
                        bits |= 1 << f
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_frames": nf,
                        "fingerprint": bits,
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return media.select(id_col, "payload").mapInPandas(
        run, AUDIO_FP_SCHEMA
    )


# ---------------------------------------------------------------------------
# Video fingerprint dedup (round 10) — temporal luma-gradient bits;
# with text/embeddings/images/audio this completes per-modality near-dup
# ---------------------------------------------------------------------------

VIDEO_FP_FRAMES = 32  # frames per clip -> 31 temporal-gradient bits
VIDEO_FP_W = 6
VIDEO_FP_H = 4
VIDEO_FP_BANDS = 4
VIDEO_FP_BAND_BITS = 8


def _video_fp_luma(d: int, g: int, k: int) -> int:
    """Closed-form constant luma of frame ``k`` for doc ``d`` (group
    ``g = d // 2``). The odd group member gets ONE bumped frame — a
    re-encode/transient variant of the same clip, flipping 0-2
    temporal-gradient bits."""
    a = (g * (k + 3) + 5 * k * k + 41 * g) % 199 + (
        (g * 17 + 3 * k * k + g * k) % 23
    ) * 2
    if d % 2 == 1 and k == g % VIDEO_FP_FRAMES:
        a += 7
    return a


def with_fingerprint_video(docs: DataFrame) -> DataFrame:
    """Attach a deterministic Y4M C444 stream shaped for temporal
    fingerprinting: 32 frames of constant luma _video_fp_luma with
    NEUTRAL chroma (Cb = Cr = 128 — the YCbCr->RGB matrix then returns
    the luma byte exactly, so decoded frame means are closed-form
    integers). Built JVM-side from hex expressions like the other Y4M
    fixtures."""
    d = F.col("doc_id")
    g = F.floor(d / 2).cast("bigint")
    wh = VIDEO_FP_W * VIDEO_FP_H
    hdr = F.lit(
        f"YUV4MPEG2 W{VIDEO_FP_W} H{VIDEO_FP_H} F25:1 Ip A1:1 C444\n"
    )
    frames = []
    for k in range(VIDEO_FP_FRAMES):
        # two co-prime moduli (see with_fingerprint_audio): max luma
        # 198 + 44 + 7 = 249, still a valid byte
        a = (
            (g * (k + 3) + F.lit(5 * k * k) + F.lit(41) * g) % 199
            + ((g * 17 + F.lit(3 * k * k) + g * F.lit(k)) % 23) * 2
        )
        a = a + F.when(
            (d % 2 == 1) & (g % VIDEO_FP_FRAMES == k), 7
        ).otherwise(0)
        frames.append(
            F.concat(
                F.lit("4652414D450A"),  # "FRAME\n"
                F.repeat(F.lpad(F.hex(a.cast("bigint")), 2, "0"), wh),
                F.repeat(F.lit("80"), 2 * wh),  # neutral Cb + Cr planes
            )
        )
    payload = F.concat(
        F.encode(hdr, "UTF-8"), F.unhex(F.concat(*frames))
    )
    # repartition before the downstream Python decode (see
    # with_fingerprint_audio — the one-row-group scan funnel)
    return docs.repartition(_python_parallelism(docs)).select(
        "doc_id", payload.alias("payload")
    )


VIDEO_FP_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_frames", IntegerType()),
        StructField("fingerprint", LongType()),
    ]
)


def extract_video_fingerprint(
    media: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """REAL temporal video fingerprint: demux + decode every frame
    (operators/y4mcodec.iter_y4m_frames — genuine YCbCr->RGB), sum each
    frame's pixel values as exact integers, and pack bit k =
    sum(k) > sum(k+1) into an int64 — the shot-boundary/temporal-
    activity signature a video dedup pass hashes. Non-Y4M payloads are
    quarantined by omission."""
    import numpy as np

    def _bulk_sums(payload: bytes) -> "list[int] | None":
        """Vectorized C444 path: when every frame unit is the plain
        6-byte ``FRAME\\n`` marker + a fixed-size payload (our fixtures
        and most real Y4M), ONE reshape decodes the whole clip — the
        same YCbCr->RGB math as the per-frame iterator, but one numpy
        dispatch per CLIP instead of per frame (measured 4.5s -> ~1s at
        sf0.1: 160k tiny frames are Python-overhead-bound). Returns
        None when the layout doesn't match (parameterized FRAME lines,
        C420) — caller falls back to the general iterator."""
        from .y4mcodec import _ycbcr_to_rgb, parse_y4m_header

        hdr = parse_y4m_header(payload)
        if hdr["colorspace"] != "444":
            return None
        fb, start = hdr["frame_bytes"], hdr["header_len"]
        unit = 6 + fb
        body = payload[start:]
        if not body or len(body) % unit:
            return None
        raw = np.frombuffer(body, np.uint8).reshape(-1, unit)
        if not (raw[:, :6] == np.frombuffer(b"FRAME\n", np.uint8)).all():
            return None
        wh = hdr["width"] * hdr["height"]
        planes = raw[:, 6:].astype(np.float64)
        rgb = _ycbcr_to_rgb(
            planes[:, :wh], planes[:, wh : 2 * wh], planes[:, 2 * wh :]
        )
        return [int(s) for s in rgb.astype(np.int64).sum(axis=(1, 2))]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .y4mcodec import iter_y4m_frames

        cols = list(VIDEO_FP_SCHEMA.names)
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf["payload"]):
                payload = bytes(p) if p is not None else b""
                if not payload.startswith(b"YUV4MPEG2"):
                    continue
                try:
                    sums = _bulk_sums(payload)
                    if sums is None:
                        sums = [
                            int(f.astype(np.int64).sum())
                            for f in iter_y4m_frames(payload)
                        ]
                except ValueError:
                    continue  # quarantine by omission
                if len(sums) < 2:
                    continue
                bits = 0
                for k in range(min(len(sums) - 1, 63)):
                    if sums[k] > sums[k + 1]:
                        bits |= 1 << k
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_frames": len(sums),
                        "fingerprint": bits,
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return media.select(id_col, "payload").mapInPandas(
        run, VIDEO_FP_SCHEMA
    )
