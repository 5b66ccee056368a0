"""Matroska / WebM (EBML, RFC 8794 + the public Matroska spec)
container METADATA probe — pure stdlib element walking.

The EBML layer is length-prefixed elements with variable-length IDs
and sizes — no codec anywhere — so, exactly like the ISO-BMFF probe
(operators/mp4probe.py), a 100 TB video ingest can read the doctype,
the segment's timestamp scale, and the track count WITHOUT decoding a
frame, and size its decode-farm bill per source. Frame decode stays
multimodal.sample_frames' loud NotImplementedError.

Coverage: EBML header (DocType), one Segment (known or unknown-size
per RFC 8794 §6.2), Segment > Info > TimestampScale (uint, default
1_000_000 ns when absent), Segment > Tracks > TrackEntry count.
Scalar (payload -> dict), runs INSIDE mapInPandas batches.
"""

from __future__ import annotations

_ID_EBML = 0x1A45DFA3
_ID_DOCTYPE = 0x4282
_ID_SEGMENT = 0x18538067
_ID_INFO = 0x1549A966
_ID_TIMESTAMP_SCALE = 0x2AD7B1
_ID_TRACKS = 0x1654AE6B
_ID_TRACK_ENTRY = 0xAE


def _read_vint(payload: bytes, pos: int, end: int, keep_marker: bool):
    """RFC 8794 variable-length integer at ``pos``: returns
    (value, next_pos). IDs keep the length-marker bit (matching the
    spec's element-ID notation); sizes strip it. An all-ones size is
    'unknown' and returned as None."""
    if pos >= end:
        raise ValueError("ebml: truncated vint")
    first = payload[pos]
    if first == 0:
        raise ValueError("ebml: invalid vint marker")
    length = 9 - first.bit_length()
    if pos + length > end:
        raise ValueError("ebml: truncated vint")
    if keep_marker:
        v = first
    else:
        v = first & ((1 << (8 - length)) - 1)
        unknown = v == (1 << (8 - length)) - 1
    for i in range(1, length):
        b = payload[pos + i]
        v = (v << 8) | b
        if not keep_marker:
            unknown = unknown and b == 0xFF
    if not keep_marker and unknown:
        return None, pos + length
    return v, pos + length


def _walk(payload: bytes, pos: int, end: int):
    """Yield (element_id, body_start, body_end) for each child element
    in [pos, end). An unknown-size element extends to ``end``."""
    while pos < end:
        eid, p = _read_vint(payload, pos, end, keep_marker=True)
        size, p = _read_vint(payload, p, end, keep_marker=False)
        body_end = end if size is None else p + size
        if body_end > end:
            raise ValueError("ebml: element overruns its parent")
        yield eid, p, body_end
        pos = body_end


def parse_mkv(payload: bytes) -> dict:
    """Probe a Matroska/WebM stream: {doctype, timestamp_scale_ns,
    n_tracks}. Raises ValueError for malformed EBML or a stream with
    no EBML header / Segment (quarantine path)."""
    n = len(payload)
    doctype = None
    scale = None
    n_tracks = 0
    saw_segment = False
    for eid, bs, be in _walk(payload, 0, n):
        if eid == _ID_EBML:
            for cid, cbs, cbe in _walk(payload, bs, be):
                if cid == _ID_DOCTYPE:
                    doctype = (
                        payload[cbs:cbe].split(b"\x00")[0].decode(
                            "ascii", "replace"
                        )
                    )
        elif eid == _ID_SEGMENT:
            saw_segment = True
            for cid, cbs, cbe in _walk(payload, bs, be):
                if cid == _ID_INFO:
                    for gid, gbs, gbe in _walk(payload, cbs, cbe):
                        if gid == _ID_TIMESTAMP_SCALE:
                            scale = int.from_bytes(
                                payload[gbs:gbe], "big"
                            )
                elif cid == _ID_TRACKS:
                    for gid, _gbs, _gbe in _walk(payload, cbs, cbe):
                        if gid == _ID_TRACK_ENTRY:
                            n_tracks += 1
    if doctype is None:
        raise ValueError("ebml: missing EBML header/DocType")
    if not saw_segment:
        raise ValueError("ebml: missing Segment")
    return {
        "doctype": doctype,
        # Matroska default when Info omits TimestampScale
        "timestamp_scale_ns": int(scale) if scale else 1_000_000,
        "n_tracks": n_tracks,
    }
