"""ISO Base Media File Format (MP4/ISO-BMFF, ISO/IEC 14496-12)
container METADATA probe — pure stdlib box walking.

Compressed-video FRAME decode stays a codec library's job
(multimodal.sample_frames keeps its loud NotImplementedError), but the
container layer is plain length-prefixed box structure, and a 100 TB
multimodal ingest probes it BEFORE committing decode budget: brand,
movie timescale/duration, and track count are enough to size, bucket,
and triage a video corpus without touching a single codec. This module
is that probe: a top-level box walk that reads ``ftyp`` (major brand),
descends one level into ``moov`` for ``mvhd`` (version 0 and 1
layouts) and counts ``trak`` children. 64-bit large boxes (size==1)
are handled; a ``size==0`` box extends to end-of-file per the spec.

Like the image/video codecs, the function is scalar (payload -> dict)
and runs INSIDE mapInPandas batches — Spark parallelism comes from the
Arrow batch stream.
"""

from __future__ import annotations

import struct


def parse_mp4(payload: bytes) -> dict:
    """Probe an ISO-BMFF stream: {brand, timescale, duration,
    duration_ms, n_tracks}. Raises ValueError for malformed boxes or a
    stream with no ftyp/mvhd (quarantine path)."""
    n = len(payload)
    pos = 0
    brand = None
    timescale = None
    duration = None
    n_tracks = 0

    def _box(at: int, end: int):
        """(size, type, header_len) of the box at ``at``."""
        if at + 8 > end:
            return None
        (size,) = struct.unpack_from(">I", payload, at)
        typ = payload[at + 4 : at + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            if at + 16 > end:
                raise ValueError("mp4: truncated largesize box")
            (size,) = struct.unpack_from(">Q", payload, at + 8)
            hdr = 16
        elif size == 0:  # box extends to end of file
            size = end - at
        if size < hdr or at + size > end:
            raise ValueError("mp4: bad box size")
        return size, typ, hdr

    while True:
        box = _box(pos, n)
        if box is None:
            break
        size, typ, hdr = box
        if typ == b"ftyp":
            if size < hdr + 8:
                raise ValueError("mp4: truncated ftyp")
            brand = payload[pos + hdr : pos + hdr + 4].decode(
                "ascii", "replace"
            )
        elif typ == b"moov":
            cpos = pos + hdr
            cend = pos + size
            while True:
                child = _box(cpos, cend)
                if child is None:
                    break
                csize, ctyp, chdr = child
                if ctyp == b"mvhd":
                    body = cpos + chdr
                    ver = payload[body]
                    if ver == 1:  # 64-bit creation/modification/duration
                        (timescale,) = struct.unpack_from(
                            ">I", payload, body + 20
                        )
                        (duration,) = struct.unpack_from(
                            ">Q", payload, body + 24
                        )
                    else:
                        (timescale,) = struct.unpack_from(
                            ">I", payload, body + 12
                        )
                        (duration,) = struct.unpack_from(
                            ">I", payload, body + 16
                        )
                elif ctyp == b"trak":
                    n_tracks += 1
                cpos += csize
        pos += size
    if brand is None:
        raise ValueError("mp4: missing ftyp")
    if timescale is None or timescale == 0:
        raise ValueError("mp4: missing mvhd")
    return {
        "brand": brand,
        "timescale": int(timescale),
        "duration": int(duration),
        "duration_ms": int(duration) * 1000 // int(timescale),
        "n_tracks": n_tracks,
    }
