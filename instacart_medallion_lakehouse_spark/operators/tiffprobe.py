"""TIFF / EXIF-container IFD probe: byte order, dimensions,
orientation, samples per pixel.

The image-metadata sibling of mp4probe/mkvprobe/audioprobe: EXIF
triage (is this image rotated? what are its dimensions? how many
channels?) is the step an image-corpus ingest runs before committing
decode budget, and TIFF's Image File Directory is the container EXIF
lives in (TIFF 6.0 spec). The walk is real in BOTH byte orders: 'II'
(little-endian) and 'MM' (big-endian) streams put every multi-byte
field in opposite order, and SHORT values are left-justified inside
the 4-byte value field — the classic places a lazy parser breaks.

Pixel decode of TIFF strips is out of scope (the format is a
container of many encodings — raw, LZW, JPEG, deflate — and the
real ones this engine supports already decode via their own codecs);
this is the metadata half, like the video/audio probes.

Scalar by design — runs inside Arrow mapInPandas batches
(multimodal.extract_tiff_meta).
"""

from __future__ import annotations

import struct

_TAGS = {
    256: "width",  # ImageWidth
    257: "height",  # ImageLength
    274: "orientation",
    277: "samples_per_pixel",
}


def parse_tiff(payload: bytes) -> dict:
    """Walk the first IFD: returns byte_order ('II'/'MM'), width,
    height, orientation, samples_per_pixel. SHORT(3) and LONG(4)
    entry types are honored with correct left-justified inline
    values; unknown tags are skipped."""
    if len(payload) < 8:
        raise ValueError("tiff: truncated header")
    order = payload[:2]
    if order == b"II":
        e = "<"
    elif order == b"MM":
        e = ">"
    else:
        raise ValueError("tiff: bad byte-order mark")
    (magic,) = struct.unpack_from(e + "H", payload, 2)
    if magic != 42:
        raise ValueError(f"tiff: bad magic {magic}")
    (ifd_off,) = struct.unpack_from(e + "I", payload, 4)
    if ifd_off + 2 > len(payload):
        raise ValueError("tiff: IFD offset out of range")
    (count,) = struct.unpack_from(e + "H", payload, ifd_off)
    out = {
        "byte_order": order.decode("ascii"),
        "width": None,
        "height": None,
        "orientation": None,
        "samples_per_pixel": None,
    }
    pos = ifd_off + 2
    for _ in range(count):
        if pos + 12 > len(payload):
            raise ValueError("tiff: truncated IFD entry")
        tag, ftype = struct.unpack_from(e + "HH", payload, pos)
        (n,) = struct.unpack_from(e + "I", payload, pos + 4)
        name = _TAGS.get(tag)
        if name is not None and n == 1:
            if ftype == 3:  # SHORT, left-justified in the value field
                (val,) = struct.unpack_from(e + "H", payload, pos + 8)
            elif ftype == 4:  # LONG
                (val,) = struct.unpack_from(e + "I", payload, pos + 8)
            else:
                raise ValueError(f"tiff: tag {tag} has type {ftype}")
            out[name] = int(val)
        pos += 12
    if out["width"] is None or out["height"] is None:
        raise ValueError("tiff: missing dimension tags")
    return out
