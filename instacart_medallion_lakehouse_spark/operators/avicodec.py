"""AVI (RIFF) container demux + mux for Motion-JPEG video.

With the GIF animation path (gifcodec.py) this closes the last video
boundary the engine could honestly close without a codec library:
AVI/MJPEG is the one mainstream COMPRESSED video container whose frame
payloads are plain JPEG streams — which the sibling jpegcodec.py
already decodes for real (baseline, progressive, and the SOF3 lossless
process). So an AVI/MJPEG corpus demuxes here with a pure RIFF chunk
walk and frame-decodes through the existing pure-numpy JPEG codec;
only inter-frame-predicted codecs (H.26x/VP9/AV1 inside mp4/mkv)
remain sample_frames' loud NotImplementedError.

Decode surface:
- ``parse_avi``: header probe (width/height/us-per-frame/total frames,
  stream fourcc) plus the '##dc'/'##db' frame byte ranges from the
  'movi' LIST — no pixel work, the triage half.
- ``iter_avi_frames``: step-aware frame decode — skipped frames are
  never entropy-decoded (the byte ranges come from the chunk walk),
  mirroring y4mcodec.iter_y4m_frames' seek discipline.

Encode surface: ``encode_avi_mjpeg`` writes a spec-shaped AVI (hdrl
with avih + one vids strl, movi with even-padded 00dc chunks, idx1)
from a list of JPEG frame payloads — used to fabricate deterministic
fixtures whose decoded statistics a SQL oracle restates in closed form
(queries_ext ``avi_frame_stats``: frames carry the SOF3 lossless
process, so decode is EXACT), and round-trip-tested against the
demuxer with baseline frames too.

Like the sibling codecs, functions are scalar (payload -> arrays) by
design: they run inside Arrow mapInPandas batches, so Spark
parallelism comes from the batch stream, not from here.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np

_AVIF_HASINDEX = 0x00000010


def _expect(cond: bool, msg: str) -> None:
    if not cond:
        raise ValueError(f"avi: {msg}")


def parse_avi(payload: bytes) -> dict:
    """RIFF/AVI chunk walk: returns width, height, us_per_frame,
    n_frames (counted from the movi LIST, not trusted from avih),
    the stream handler fourcc, and the (offset, size) byte range of
    every video frame chunk ('##dc' compressed / '##db' uncompressed),
    in stream order. No pixel work."""
    n = len(payload)
    _expect(
        payload[:4] == b"RIFF" and payload[8:12] == b"AVI ",
        "bad signature",
    )
    width = height = None
    us_per_frame = None
    fourcc = None
    avih_frames = None
    frames: list[tuple[int, int]] = []

    def walk(pos: int, end: int, in_movi: bool) -> None:
        nonlocal width, height, us_per_frame, fourcc, avih_frames
        while pos + 8 <= end:
            cid = payload[pos : pos + 4]
            (clen,) = struct.unpack_from("<I", payload, pos + 4)
            body = pos + 8
            _expect(body + clen <= n, f"truncated chunk {cid!r}")
            if cid == b"LIST":
                ltype = payload[body : body + 4]
                walk(
                    body + 4,
                    body + clen,
                    in_movi or ltype == b"movi",
                )
            elif cid == b"avih":
                _expect(clen >= 40, "short avih")
                (us_per_frame,) = struct.unpack_from("<I", payload, body)
                (avih_frames,) = struct.unpack_from(
                    "<I", payload, body + 16
                )
                width, height = struct.unpack_from(
                    "<II", payload, body + 32
                )
            elif cid == b"strh":
                _expect(clen >= 8, "short strh")
                if payload[body : body + 4] == b"vids" and fourcc is None:
                    fourcc = payload[body + 4 : body + 8].decode(
                        "ascii", "replace"
                    )
            elif in_movi and len(cid) == 4 and cid[2:4] in (b"dc", b"db"):
                frames.append((body, clen))
            pos = body + clen + (clen & 1)  # chunks are word-aligned

    walk(12, min(n, 8 + struct.unpack_from("<I", payload, 4)[0]), False)
    _expect(width is not None, "missing avih header")
    return {
        "width": int(width),
        "height": int(height),
        "us_per_frame": int(us_per_frame),
        "avih_frames": int(avih_frames),
        "n_frames": len(frames),
        "fourcc": fourcc,
        "frames": frames,
    }


def iter_avi_frames(
    payload: bytes, step: int = 1
) -> Iterator[np.ndarray]:
    """Yield every ``step``-th video frame (0, step, 2*step, ...) as a
    decoded HxWxC uint8 array. Skipped frames are never entropy-
    decoded — the chunk walk already knows every frame's byte range,
    so sampling at every_n=30 does ~1/30th of the JPEG work (the same
    seek discipline as y4mcodec.iter_y4m_frames)."""
    if step < 1:
        raise ValueError("avi: step must be >= 1")
    from .jpegcodec import decode_jpeg

    meta = parse_avi(payload)
    for idx in range(0, meta["n_frames"], step):
        off, size = meta["frames"][idx]
        frame = payload[off : off + size]
        _expect(frame[:2] == b"\xff\xd8", f"frame {idx} is not JPEG")
        arr = decode_jpeg(frame)
        yield arr[:, :, None] if arr.ndim == 2 else arr


def encode_avi_mjpeg(
    jpeg_frames: list[bytes],
    width: int,
    height: int,
    us_per_frame: int = 40_000,
) -> bytes:
    """Assemble an AVI/MJPG container around already-encoded JPEG
    frame payloads (use jpegcodec.encode_jpeg for the frames): RIFF
    [hdrl(avih, strl(strh 'vids'/'MJPG', strf BITMAPINFOHEADER)),
    movi(00dc...), idx1]. Deterministic byte-for-byte for fixed
    inputs."""
    if not jpeg_frames:
        raise ValueError("avi: need at least one frame")
    nf = len(jpeg_frames)
    max_size = max(len(f) for f in jpeg_frames)

    avih = struct.pack(
        "<14I",
        us_per_frame,
        0,  # max bytes/sec (informational)
        0,  # padding granularity
        _AVIF_HASINDEX,
        nf,
        0,  # initial frames
        1,  # streams
        max_size,
        width,
        height,
        0, 0, 0, 0,  # reserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIIi",
            0,  # flags
            0, 0,  # priority, language
            0,  # initial frames
            us_per_frame,  # scale
            1_000_000,  # rate -> fps = rate/scale
            0,  # start
            nf,  # length
            max_size,
            0,  # quality (driver default)
            0,  # sample size (varies per frame)
        )
        + struct.pack("<4H", 0, 0, width, height)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,
        width,
        height,
        1,
        24,
        b"MJPG",
        width * height * 3,
        0, 0, 0, 0,
    )

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)

    movi_chunks = []
    idx_entries = []
    # idx1 offsets are relative to the start of the 'movi' fourcc
    off = 4
    for f in jpeg_frames:
        ck = chunk(b"00dc", f)
        movi_chunks.append(ck)
        idx_entries.append(
            b"00dc" + struct.pack("<III", 0x10, off, len(f))
        )
        off += len(ck)
    movi = lst(b"movi", b"".join(movi_chunks))
    idx1 = chunk(b"idx1", b"".join(idx_entries))

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body
