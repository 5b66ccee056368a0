"""Pure stdlib+numpy GIF codec: GIF87a/89a decode AND encode.

GIF is the one ubiquitous web-corpus image format the engine's codec
family (imagecodec.py: PNG/BMP/PNM; jpegcodec.py: baseline/progressive/
lossless JPEG) did not cover, and — because GIF89a carries multi-frame
animations — it is also the first COMPRESSED video-ish container this
engine can demux AND fully frame-decode without a codec library: the
image data is LZW (GIF flavor: variable-width codes 3..12 bits packed
LSB-first, CLEAR/EOI codes, late width change), implemented here from
the GIF89a specification directly.

Coverage (decode):
- GIF87a and GIF89a, logical screen descriptor, global color table
- per-image local color tables, image sub-rectangles (left/top/w/h)
- 4-pass row interlacing
- Graphic Control Extension: transparency index + disposal methods
  0/1 (leave), 2 (restore to background), 3 (restore to previous)
- full animation composition: ``decode_gif_frames`` yields the
  COMPOSED logical-screen RGB canvas after each frame, which is what a
  training pipeline's frame sampler actually wants
- plain-text / comment / application extensions are skipped as opaque
  sub-block chains (NETSCAPE loop blocks included)

Coverage (encode): GIF89a writer with a global palette, optional
per-frame local palettes, per-frame interlace, disposal, delay and
transparency — a real LZW compressor (dict-reset at 4096, same late
width change), used to fabricate deterministic fixtures whose decoded
statistics a SQL oracle can restate in closed form (queries_ext
``gif_frame_stats``), and round-trip-tested against the decoder.

The per-CODE Python loop in LZW is bounded by the number of LZW codes
(≤ pixel count, typically ~pixels/run-length), not per-pixel numpy
scalar work: table entries are ``bytes`` objects and output is a
single bytearray extend per code. Like the sibling codecs, functions
are scalar (payload -> arrays) by design — they run inside Arrow
mapInPandas batches, so Spark parallelism comes from the batch
stream, not from here.
"""

from __future__ import annotations

import struct

import numpy as np

_GIF_SIGS = (b"GIF87a", b"GIF89a")

# interlace passes: (row_start, row_step), in stream order
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))

_MAX_CODE_WIDTH = 12
_TABLE_LIMIT = 1 << _MAX_CODE_WIDTH  # 4096


# ---------------------------------------------------------------------------
# LZW (GIF variant)
# ---------------------------------------------------------------------------


def lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytes:
    """GIF-flavor LZW: variable-width codes (min+1 .. 12 bits) packed
    LSB-first; CLEAR resets the table, EOI terminates. ``expected`` is
    the pixel count — output is truncated/validated against it (some
    encoders omit EOI; trailing garbage after the last full row is
    tolerated the way real decoders tolerate it)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"gif: bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    out = bytearray()
    acc = 0
    accbits = 0
    pos = 0
    n = len(data)
    prev: bytes | None = None
    while len(out) < expected:
        while accbits < width:
            if pos >= n:
                raise ValueError("gif: LZW stream truncated")
            acc |= data[pos] << accbits
            accbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        accbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        size = len(table)
        if code < size:
            entry = table[code]
            if not entry:
                raise ValueError("gif: LZW code references empty entry")
        elif code == size and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"gif: LZW code {code} out of range {size}")
        out += entry
        if prev is not None and size < _TABLE_LIMIT:
            table.append(prev + entry[:1])
            # late change: the width grows when the NEXT entry index
            # would not fit (table size reached 2^width)
            if len(table) == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        prev = entry
    if len(out) < expected:
        raise ValueError(
            f"gif: LZW ended early ({len(out)} of {expected} pixels)"
        )
    return bytes(out[:expected])


def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """LZW compressor matching ``lzw_decode``'s width schedule exactly:
    a leading CLEAR, dictionary reset via CLEAR when the table hits
    4096, width bumps one entry later than the decoder's table-size
    trigger (the encoder's dict runs one definition ahead), EOI last."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"gif: bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    accbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, accbits
        acc |= code << accbits
        accbits += width
        while accbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            accbits -= 8

    def fresh() -> tuple[dict[bytes, int], int, int]:
        return (
            {bytes([i]): i for i in range(clear)},
            eoi + 1,
            min_code_size + 1,
        )

    table, next_code, width = fresh()
    emit(clear, width)
    w = b""
    for b in indices:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        if next_code < _TABLE_LIMIT:
            table[wc] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < _MAX_CODE_WIDTH:
                width += 1
        else:
            emit(clear, width)
            table, next_code, width = fresh()
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if accbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container walk
# ---------------------------------------------------------------------------


def _sub_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a sub-block chain starting at ``pos``; returns
    (data, position after the 0x00 terminator)."""
    parts = []
    n = len(payload)
    while True:
        if pos >= n:
            raise ValueError("gif: truncated sub-block chain")
        ln = payload[pos]
        pos += 1
        if ln == 0:
            return b"".join(parts), pos
        if pos + ln > n:
            raise ValueError("gif: truncated sub-block")
        parts.append(payload[pos : pos + ln])
        pos += ln


def _read_palette(payload: bytes, pos: int, size: int):
    end = pos + 3 * size
    if end > len(payload):
        raise ValueError("gif: truncated color table")
    pal = np.frombuffer(payload, np.uint8, 3 * size, pos).reshape(size, 3)
    return pal, end


def parse_gif(payload: bytes) -> dict:
    """Walk the container WITHOUT decompressing pixel data: header,
    logical screen, per-frame descriptors (rect, interlace, local
    palette size, GCE disposal/transparency/delay) and the raw LZW
    byte ranges. ``decode_gif_frames`` builds on this."""
    if payload[:6] not in _GIF_SIGS:
        raise ValueError("gif: bad signature")
    if len(payload) < 13:
        raise ValueError("gif: truncated logical screen descriptor")
    w, h = struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    bg_index = payload[11]
    pos = 13
    gct = None
    if packed & 0x80:
        gct, pos = _read_palette(payload, pos, 2 << (packed & 0x07))
    frames = []
    gce: dict | None = None
    n = len(payload)
    while pos < n:
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= n:
                raise ValueError("gif: truncated extension")
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # Graphic Control Extension
                data, pos = _sub_blocks(payload, pos)
                if len(data) < 4:
                    raise ValueError("gif: short GCE")
                flags = data[0]
                gce = {
                    "disposal": (flags >> 2) & 0x07,
                    "delay_cs": struct.unpack_from("<H", data, 1)[0],
                    "transparent": data[3] if flags & 0x01 else None,
                }
            else:  # comment / plain text / application: opaque
                _, pos = _sub_blocks(payload, pos)
            continue
        if block == 0x2C:  # image descriptor
            if pos + 9 > n:
                raise ValueError("gif: truncated image descriptor")
            left, top, fw, fh = struct.unpack_from("<HHHH", payload, pos)
            fpacked = payload[pos + 8]
            pos += 9
            lct = None
            if fpacked & 0x80:
                lct, pos = _read_palette(payload, pos, 2 << (fpacked & 0x07))
            if pos >= n:
                raise ValueError("gif: missing LZW min code size")
            min_code = payload[pos]
            pos += 1
            lzw, pos = _sub_blocks(payload, pos)
            frames.append(
                {
                    "left": left,
                    "top": top,
                    "width": fw,
                    "height": fh,
                    "interlace": bool(fpacked & 0x40),
                    "palette": lct if lct is not None else gct,
                    "gce": gce,
                    "min_code_size": min_code,
                    "lzw": lzw,
                }
            )
            gce = None
            continue
        raise ValueError(f"gif: unknown block 0x{block:02x}")
    return {
        "version": payload[3:6].decode("ascii"),
        "width": w,
        "height": h,
        "background": bg_index,
        "global_palette": gct,
        "n_frames": len(frames),
        "frames": frames,
    }


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    out = np.empty_like(idx)
    src = 0
    for start, step in _INTERLACE:
        rows = range(start, h, step)
        cnt = len(rows)
        if cnt:
            out[start::step] = idx[src : src + cnt]
            src += cnt
    return out


def decode_gif_frames(payload: bytes) -> list[np.ndarray]:
    """Fully decode every frame and COMPOSE onto the logical screen:
    returns one HxWx3 uint8 canvas per frame (post-draw state), with
    transparency and disposal methods 0-3 honored. This is the
    standard what-a-viewer-shows semantics, i.e. what a frame sampler
    over an animated-GIF corpus wants."""
    meta = parse_gif(payload)
    w, h = meta["width"], meta["height"]
    gct = meta["global_palette"]
    if gct is not None and meta["background"] < len(gct):
        background = gct[meta["background"]]
    else:
        background = np.zeros(3, np.uint8)
    canvas = np.broadcast_to(background, (h, w, 3)).copy()
    out: list[np.ndarray] = []
    for fr in meta["frames"]:
        pal = fr["palette"]
        if pal is None:
            raise ValueError("gif: frame without any color table")
        fw, fh = fr["width"], fr["height"]
        left, top = fr["left"], fr["top"]
        if left + fw > w or top + fh > h:
            raise ValueError("gif: frame rect exceeds logical screen")
        idx = np.frombuffer(
            lzw_decode(fr["lzw"], fr["min_code_size"], fw * fh), np.uint8
        ).reshape(fh, fw)
        if fr["interlace"]:
            idx = _deinterlace(idx)
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("gif: pixel index out of palette range")
        gce = fr["gce"] or {}
        transparent = gce.get("transparent")
        disposal = gce.get("disposal", 0)
        prev = canvas.copy() if disposal == 3 else None
        rgb = pal[idx]
        region = canvas[top : top + fh, left : left + fw]
        if transparent is not None:
            opaque = (idx != transparent)[:, :, None]
            region[...] = np.where(opaque, rgb, region)
        else:
            region[...] = rgb
        out.append(canvas.copy())
        if disposal == 2:
            canvas[top : top + fh, left : left + fw] = background
        elif disposal == 3:
            canvas = prev
    return out


def decode_gif(payload: bytes) -> np.ndarray:
    """First composed frame as HxWx3 uint8 (the imagecodec.decode
    contract for still-image consumers; animations expose the rest via
    decode_gif_frames)."""
    frames = decode_gif_frames(payload)
    if not frames:
        raise ValueError("gif: no image data")
    return frames[0]


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def _palette_block(pal: np.ndarray) -> tuple[bytes, int]:
    """Pad a (N,3) palette to the next power of two >= 2; returns
    (raw bytes, size_exponent-1 for the packed field)."""
    pal = np.asarray(pal, np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= len(pal) <= 256:
        raise ValueError("gif: palette must be (N<=256, 3) uint8")
    size = 2
    while size < len(pal):
        size *= 2
    padded = np.zeros((size, 3), np.uint8)
    padded[: len(pal)] = pal
    return padded.tobytes(), size.bit_length() - 2


def _chunk_sub_blocks(data: bytes) -> bytes:
    parts = []
    for i in range(0, len(data), 255):
        block = data[i : i + 255]
        parts.append(bytes([len(block)]) + block)
    parts.append(b"\x00")
    return b"".join(parts)


def encode_gif(
    frames: list[np.ndarray],
    palette: np.ndarray,
    *,
    frame_opts: list[dict] | None = None,
    background: int = 0,
    loop: bool = True,
) -> bytes:
    """GIF89a writer. ``frames`` are palette-INDEX arrays (HxW uint8);
    ``palette`` is the (N,3) global color table. Per-frame ``frame_opts``
    dicts may carry: ``palette`` (local color table), ``interlace``
    (bool), ``disposal`` (0-3), ``delay_cs`` (centiseconds),
    ``transparent`` (index or None), ``left``/``top`` (sub-rect
    placement). The logical screen is the max frame extent."""
    if not frames:
        raise ValueError("gif: need at least one frame")
    opts = frame_opts or [{}] * len(frames)
    if len(opts) != len(frames):
        raise ValueError("gif: frame_opts length mismatch")
    gct_bytes, gct_exp = _palette_block(palette)
    screen_w = max(
        np.asarray(f).shape[1] + o.get("left", 0)
        for f, o in zip(frames, opts)
    )
    screen_h = max(
        np.asarray(f).shape[0] + o.get("top", 0)
        for f, o in zip(frames, opts)
    )
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", screen_w, screen_h)
    out += bytes([0x80 | (gct_exp & 0x07), background, 0])
    out += gct_bytes
    if loop:  # NETSCAPE2.0 looping application extension
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for arr, opt in zip(frames, opts):
        arr = np.asarray(arr, np.uint8)
        if arr.ndim != 2:
            raise ValueError("gif: frames are palette-index HxW arrays")
        fh, fw = arr.shape
        local = opt.get("palette")
        pal_n = len(local) if local is not None else len(palette)
        if int(arr.max(initial=0)) >= pal_n:
            raise ValueError("gif: frame index exceeds palette")
        transparent = opt.get("transparent")
        disposal = int(opt.get("disposal", 0))
        delay = int(opt.get("delay_cs", 0))
        flags = (disposal & 0x07) << 2
        tindex = 0
        if transparent is not None:
            flags |= 0x01
            tindex = int(transparent)
        out += b"\x21\xf9\x04" + bytes([flags])
        out += struct.pack("<H", delay) + bytes([tindex, 0])
        packed = 0
        lct_bytes = b""
        if local is not None:
            lct_bytes, lct_exp = _palette_block(local)
            packed |= 0x80 | (lct_exp & 0x07)
        if opt.get("interlace"):
            packed |= 0x40
        out += b"\x2c" + struct.pack(
            "<HHHH", opt.get("left", 0), opt.get("top", 0), fw, fh
        ) + bytes([packed])
        out += lct_bytes
        if opt.get("interlace"):
            rows = [arr[start::step] for start, step in _INTERLACE]
            stream = np.concatenate([r for r in rows if len(r)], axis=0)
        else:
            stream = arr
        # max(2, pal_n - 1) >= 2, so bit_length() >= 2 always — the
        # spec's floor of 2 holds without a second clamp
        min_code = max(2, pal_n - 1).bit_length()
        out += bytes([min_code])
        out += _chunk_sub_blocks(lzw_encode(stream.tobytes(), min_code))
    out += b"\x3b"
    return bytes(out)
