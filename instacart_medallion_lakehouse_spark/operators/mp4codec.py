"""ISO-BMFF (MP4/MOV, ISO/IEC 14496-12) sample-table demux + mux for
Motion-JPEG video — the r11 closure of the mp4 boundary (VERDICT r10
#4): mp4probe.py stays the cheap top-level METADATA probe; this module
walks the full ``moov/trak/mdia/minf/stbl`` sample tables
(``stsd``/``stts``/``stsc``/``stsz``/``stco``/``co64``) to recover
every video sample's exact byte range, and — when the sample entry is
the intra-frame ``jpeg``/``mjpa`` codec — feeds the sample payloads
through the existing pure-numpy JPEG codec (jpegcodec.py). MJPEG-in-MP4
is the mainstream QuickTime/ISO container whose frame payloads are
plain JPEG streams, the same reasoning that closed the AVI boundary
(avicodec.py); inter-frame codecs (``avc1``/``hvc1``/``vp09``/``av01``)
remain a LOUD NotImplementedError at the stsd gate — never a silent
wrong answer — and the quarantine path counts them.

Demux surface:
- ``parse_mp4_samples``: sample-table walk. Returns width/height, the
  stsd fourcc, timescale + per-sample durations (stts), and the
  (offset, size) byte range of every sample in the first video track,
  reconstructed from the stsc run-length chunk map + stsz sizes +
  stco/co64 chunk offsets. No pixel work — the triage half.
- ``iter_mp4_frames``: step-aware frame decode — skipped samples are
  never entropy-decoded (the byte ranges come from the table walk),
  the same seek discipline as avicodec.iter_avi_frames.

Mux surface: ``encode_mp4_mjpeg`` writes a spec-shaped
``ftyp | mdat | moov`` file from already-encoded JPEG payloads, packing
samples TWO PER CHUNK so the stsc run map is non-trivial (an
odd sample count produces a second stsc run) — a decoder that assumes
one-sample-per-chunk or trusts stsz alone fails the round trip.

Like the sibling codecs, functions are scalar (payload -> arrays) by
design: they run inside Arrow mapInPandas batches, so Spark
parallelism comes from the batch stream, not from here.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np

_INTRA_JPEG = (b"jpeg", b"mjpa")
_INTER_FRAME = (b"avc1", b"avc3", b"hvc1", b"hev1", b"vp09", b"av01")


def _expect(cond: bool, msg: str) -> None:
    if not cond:
        raise ValueError(f"mp4: {msg}")


def _boxes(payload: bytes, pos: int, end: int):
    """Yield (type, body_start, body_end) for each box in [pos, end)."""
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", payload, pos)
        typ = payload[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            _expect(pos + 16 <= end, "truncated largesize box")
            (size,) = struct.unpack_from(">Q", payload, pos + 8)
            hdr = 16
        elif size == 0:
            size = end - pos
        _expect(size >= hdr and pos + size <= end, f"bad box size {typ!r}")
        yield typ, pos + hdr, pos + size
        pos += size


def _find(payload: bytes, pos: int, end: int, typ: bytes):
    for t, b, e in _boxes(payload, pos, end):
        if t == typ:
            return b, e
    return None


def parse_mp4_samples(payload: bytes) -> dict:
    """Walk the first VIDEO track's sample tables: {fourcc, width,
    height, timescale, durations, samples:[(offset, size), ...]}.
    Raises ValueError for malformed/missing tables (quarantine path).
    The fourcc gate is the CALLER's codec decision — this function
    returns byte ranges for any codec."""
    n = len(payload)
    moov = _find(payload, 0, n, b"moov")
    _expect(moov is not None, "no moov box")
    for typ, tb, te in _boxes(payload, moov[0], moov[1]):
        if typ != b"trak":
            continue
        mdia = _find(payload, tb, te, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(payload, mdia[0], mdia[1], b"hdlr")
        if hdlr is None or payload[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        mdhd = _find(payload, mdia[0], mdia[1], b"mdhd")
        _expect(mdhd is not None, "video trak missing mdhd")
        ver = payload[mdhd[0]]
        (timescale,) = struct.unpack_from(
            ">I", payload, mdhd[0] + (20 if ver == 1 else 12)
        )
        minf = _find(payload, mdia[0], mdia[1], b"minf")
        _expect(minf is not None, "video trak missing minf")
        stbl = _find(payload, minf[0], minf[1], b"stbl")
        _expect(stbl is not None, "video trak missing stbl")
        return _parse_stbl(payload, stbl[0], stbl[1], timescale)
    raise ValueError("mp4: no video track")


def _parse_stbl(
    payload: bytes, pos: int, end: int, timescale: int
) -> dict:
    stsd = _find(payload, pos, end, b"stsd")
    _expect(stsd is not None, "missing stsd")
    (entry_count,) = struct.unpack_from(">I", payload, stsd[0] + 4)
    _expect(entry_count >= 1, "empty stsd")
    se = stsd[0] + 8  # first sample entry
    fourcc = payload[se + 4 : se + 8]
    # VisualSampleEntry: 6 reserved + 2 dataref + 16 predefined/reserved
    width, height = struct.unpack_from(">HH", payload, se + 8 + 24)

    stsz = _find(payload, pos, end, b"stsz")
    _expect(stsz is not None, "missing stsz")
    fixed, count = struct.unpack_from(">II", payload, stsz[0] + 4)
    if fixed:
        sizes = [fixed] * count
    else:
        sizes = list(
            struct.unpack_from(f">{count}I", payload, stsz[0] + 12)
        )

    co = _find(payload, pos, end, b"stco")
    if co is not None:
        (n_chunks,) = struct.unpack_from(">I", payload, co[0] + 4)
        offsets = list(
            struct.unpack_from(f">{n_chunks}I", payload, co[0] + 8)
        )
    else:
        co = _find(payload, pos, end, b"co64")
        _expect(co is not None, "missing stco/co64")
        (n_chunks,) = struct.unpack_from(">I", payload, co[0] + 4)
        offsets = list(
            struct.unpack_from(f">{n_chunks}Q", payload, co[0] + 8)
        )

    stsc = _find(payload, pos, end, b"stsc")
    _expect(stsc is not None, "missing stsc")
    (n_runs,) = struct.unpack_from(">I", payload, stsc[0] + 4)
    runs = [
        struct.unpack_from(">III", payload, stsc[0] + 8 + 12 * i)
        for i in range(n_runs)
    ]  # (first_chunk 1-based, samples_per_chunk, sample_desc_idx)

    # stts -> per-sample durations (run-length (count, delta) pairs)
    stts = _find(payload, pos, end, b"stts")
    _expect(stts is not None, "missing stts")
    (n_tt,) = struct.unpack_from(">I", payload, stts[0] + 4)
    durations: list[int] = []
    for i in range(n_tt):
        cnt, delta = struct.unpack_from(
            ">II", payload, stts[0] + 8 + 8 * i
        )
        durations.extend([delta] * cnt)

    # expand the stsc run map chunk-by-chunk into per-sample ranges
    samples: list[tuple[int, int]] = []
    si = 0
    for ci in range(len(offsets)):
        spc = 0
        for ri, (first, per, _desc) in enumerate(runs):
            last = (
                runs[ri + 1][0] - 1 if ri + 1 < len(runs) else len(offsets)
            )
            if first <= ci + 1 <= last:
                spc = per
                break
        _expect(spc > 0, f"chunk {ci + 1} not covered by stsc")
        off = offsets[ci]
        for _ in range(spc):
            if si >= len(sizes):
                break
            samples.append((off, sizes[si]))
            off += sizes[si]
            si += 1
    _expect(si == len(sizes), "stsc/stco map does not cover stsz")
    return {
        "fourcc": fourcc.decode("ascii", "replace"),
        "width": int(width),
        "height": int(height),
        "timescale": int(timescale),
        "durations": durations,
        "samples": samples,
    }


def iter_mp4_frames(payload: bytes, step: int = 1) -> Iterator[np.ndarray]:
    """Yield every ``step``-th video sample as a decoded HxWxC uint8
    array. Intra-frame ``jpeg``/``mjpa`` samples decode through
    jpegcodec; inter-frame codecs raise NotImplementedError LOUDLY at
    the stsd gate — before any sample bytes are touched."""
    if step < 1:
        raise ValueError("mp4: step must be >= 1")
    from .jpegcodec import decode_jpeg

    meta = parse_mp4_samples(payload)
    fourcc = meta["fourcc"].encode()
    if fourcc not in _INTRA_JPEG:
        detail = (
            "inter-frame codec"
            if fourcc in _INTER_FRAME
            else "unsupported codec"
        )
        raise NotImplementedError(
            f"mp4: {detail} {meta['fourcc']!r} — intra-frame MJPEG "
            "(jpeg/mjpa) is the supported decode path"
        )
    for idx in range(0, len(meta["samples"]), step):
        off, size = meta["samples"][idx]
        frame = payload[off : off + size]
        _expect(frame[:2] == b"\xff\xd8", f"sample {idx} is not JPEG")
        arr = decode_jpeg(frame)
        yield arr[:, :, None] if arr.ndim == 2 else arr


def _box(typ: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + typ + body


def _full(typ: bytes, ver: int, flags: int, body: bytes) -> bytes:
    return _box(typ, struct.pack(">I", (ver << 24) | flags) + body)


def encode_mp4_mjpeg(
    jpeg_frames: list[bytes],
    width: int,
    height: int,
    timescale: int = 600,
    frame_duration: int = 25,
) -> bytes:
    """Assemble ``ftyp | mdat | moov`` around already-encoded JPEG
    payloads (use jpegcodec.encode_jpeg for the frames), with samples
    packed TWO PER CHUNK so stsc carries a real run map. Deterministic
    byte-for-byte for fixed inputs; ``fourcc='jpeg'`` sample entry."""
    if not jpeg_frames:
        raise ValueError("mp4: need at least one frame")
    nf = len(jpeg_frames)
    ftyp = _box(b"ftyp", b"mp42" + struct.pack(">I", 0) + b"mp42isom")

    # chunk layout: pairs of samples; odd count leaves a 1-sample tail
    chunks: list[list[bytes]] = [
        jpeg_frames[i : i + 2] for i in range(0, nf, 2)
    ]
    mdat_body = b"".join(f for c in chunks for f in c)
    mdat_pos = len(ftyp)  # mdat box starts right after ftyp
    first_sample = mdat_pos + 8
    offsets = []
    off = first_sample
    for c in chunks:
        offsets.append(off)
        off += sum(len(f) for f in c)

    duration = nf * frame_duration
    mvhd = _full(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">iH", 0x00010000, 0x0100)
        + b"\x00" * 10
        + struct.pack(
            ">9i",
            0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000,
        )
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = _full(
        b"tkhd",
        0,
        7,  # enabled | in movie | in preview
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 8
        + struct.pack(">hhhH", 0, 0, 0, 0)
        + struct.pack(
            ">9i",
            0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000,
        )
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _full(
        b"mdhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),  # 'und' language
    )
    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"mjpeg\x00",
    )
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(
        b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b"")
    )
    dinf = _box(b"dinf", dref)
    sample_entry = _box(
        b"jpeg",
        b"\x00" * 6
        + struct.pack(">H", 1)  # data reference index
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)  # frame count per sample
        + b"\x00" * 32  # compressor name
        + struct.pack(">Hh", 24, -1),
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    stts = _full(
        b"stts", 0, 0, struct.pack(">III", 1, nf, frame_duration)
    )
    runs = [(1, 2, 1)]
    if nf % 2 == 1:
        if nf == 1:
            runs = [(1, 1, 1)]
        else:
            runs = [(1, 2, 1), (len(chunks), 1, 1)]
    stsc = _full(
        b"stsc",
        0,
        0,
        struct.pack(">I", len(runs))
        + b"".join(struct.pack(">III", *r) for r in runs),
    )
    stsz = _full(
        b"stsz",
        0,
        0,
        struct.pack(">II", 0, nf)
        + b"".join(struct.pack(">I", len(f)) for f in jpeg_frames),
    )
    stco = _full(
        b"stco",
        0,
        0,
        struct.pack(">I", len(offsets))
        + b"".join(struct.pack(">I", o) for o in offsets),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", mdat_body) + moov
