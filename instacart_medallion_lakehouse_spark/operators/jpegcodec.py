"""Pure numpy + stdlib baseline JPEG codec (ITU-T T.81 / JFIF).

Closes the one codec gap a real web corpus hits first (reference has no
media at all; VERDICT r7 queue item #7): baseline sequential DCT with
Huffman entropy coding, written from the public spec.

Decoder coverage: SOF0 baseline, 8-bit, 1 component (grayscale) or 3
components (JFIF YCbCr) at any of the common sampling factors (4:4:4,
4:2:2, 4:2:0), restart markers, multi-table DQT/DHT segments. Loud
``NotImplementedError`` for progressive (SOF2) and the exotic SOFs so
the multimodal quarantine path keeps routing those rows, and
``ValueError`` for malformed streams.

Encoder: baseline 4:4:4 (grayscale or color), Annex K quantization
tables scaled by the usual IJG quality curve, Annex K Huffman tables.
Not bit-identical to any other encoder (no encoder pair is), but
spec-conformant — decodable by this decoder and any other.

Performance posture: the DCT/IDCT, dequantize, level shift, upsample
and colorspace math are vectorized numpy over all blocks at once; the
Huffman entropy pass is per-symbol Python (a bitstream is inherently
sequential). Like the PNG notes in imagecodec.py this runs INSIDE
mapInPandas batches — Spark parallelism comes from the Arrow batch
stream — and bulk foreign-image ingest at corpus scale still belongs
on a real codec library; this covers self-produced assets and keeps
the plumbing (schema, quarantine, batch shape) real and testable.
"""

from __future__ import annotations

import struct

import numpy as np

# --- spec constants ---------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.intp)

# Annex K.1 / K.2 quantization tables (natural, i.e. row-major, order)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64)

# Annex K.3 Huffman tables: (BITS[1..16], HUFFVAL)
_HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# orthonormal 8x8 DCT-II basis: F = A @ f @ A.T, f = A.T @ F @ A
_A = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.5) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


# --- Huffman machinery -------------------------------------------------------


def _canonical_codes(bits, values):
    """(code, length) per symbol in canonical (spec C.2) order."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffDecoder:
    """Canonical per-length (mincode, maxcode, valptr) decoder — the
    F.2.2.3 DECODE procedure."""

    def __init__(self, bits, values):
        self.values = values
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1

    def decode(self, br: "_BitReader") -> int:
        code = br.read_bit()
        length = 1
        while code > self.maxcode[length]:
            length += 1
            if length > 16:
                raise ValueError("jpeg: invalid Huffman code")
            code = (code << 1) | br.read_bit()
        return self.values[self.valptr[length] + code - self.mincode[length]]


class _BitReader:
    """MSB-first bit reader over one entropy-coded interval (stuffing
    already stripped)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("jpeg: entropy data exhausted")
            self.buf = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, t: int) -> int:
    """F.2.2.1 EXTEND: map the t-bit magnitude to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# --- decoder -----------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG -> HxW (grayscale) or HxWx3 (RGB) uint8."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("jpeg: bad SOI")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None  # (h, w, comps) ; comps: (cid, hs, vs, tq)
    restart_interval = 0
    scan = None
    pos = 2
    n = len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError("jpeg: expected marker")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD8:
            continue
        if marker == 0xD9:  # EOI
            break
        if pos + 2 > n:
            raise ValueError("jpeg: truncated stream (no segment length)")
        (seglen,) = struct.unpack_from(">H", payload, pos)
        if pos + seglen > n:
            raise ValueError("jpeg: truncated segment")
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT — may hold several tables
            o = 0
            while o < len(seg):
                pq, tq_id = seg[o] >> 4, seg[o] & 0xF
                o += 1
                if pq == 0:
                    qt[tq_id] = np.frombuffer(
                        seg, dtype=np.uint8, count=64, offset=o
                    ).astype(np.float64)
                    o += 64
                else:  # 16-bit table
                    qt[tq_id] = np.frombuffer(
                        seg, dtype=">u2", count=64, offset=o
                    ).astype(np.float64)
                    o += 128
        elif marker == 0xC4:  # DHT — may hold several tables
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 0xF
                bits = list(seg[o + 1 : o + 17])
                nv = sum(bits)
                vals = list(seg[o + 17 : o + 17 + nv])
                huff[(tc, th)] = _HuffDecoder(bits, vals)
                o += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1: baseline ok
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError(f"jpeg: {prec}-bit precision unsupported")
            comps = []
            for i in range(nc):
                cid, hv, tq_id = struct.unpack_from(">BBB", seg, 3 + 5 + i * 3 - 2)
                comps.append((cid, hv >> 4, hv & 0xF, tq_id))
            frame = (h, w, comps)
        elif marker == 0xC2:
            raise NotImplementedError(
                "jpeg: progressive (SOF2) unsupported — baseline only; "
                "route to a codec-library environment"
            )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"jpeg: SOF{marker - 0xC0} coding process unsupported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tds = seg[1 + i * 2], seg[2 + i * 2]
                scan.append((cs, tds >> 4, tds & 0xF))
            pos += seglen
            break
        pos += seglen
    if frame is None or scan is None:
        raise ValueError("jpeg: missing SOF/SOS")

    # slice the entropy-coded stream (byte-stuffed) up to EOI / next marker,
    # splitting on restart markers
    intervals: list[bytes] = []
    cur = bytearray()
    i = pos
    while i < n:
        b = payload[i]
        if b == 0xFF:
            nxt = payload[i + 1] if i + 1 < n else 0xD9
            if nxt == 0x00:  # stuffed FF
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn
                intervals.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # EOI or another marker ends the scan
        cur.append(b)
        i += 1
    intervals.append(bytes(cur))

    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    dc_dec = {}
    ac_dec = {}
    for cs, td, ta in scan:
        if (0, td) not in huff or (1, ta) not in huff:
            raise ValueError("jpeg: scan references missing Huffman table")
        dc_dec[cs] = huff[(0, td)]
        ac_dec[cs] = huff[(1, ta)]

    # coefficient planes per component, in 8x8 block units
    coeff = {
        cid: np.zeros((mcuy * vs * 8, mcux * hs * 8)) for cid, hs, vs, _ in comps
    }
    pred = {cid: 0 for cid, *_ in comps}
    br = _BitReader(intervals[0])
    interval_idx = 0
    mcus_done = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (
                restart_interval
                and mcus_done
                and mcus_done % restart_interval == 0
            ):
                interval_idx += 1
                if interval_idx >= len(intervals):
                    raise ValueError("jpeg: missing restart interval data")
                br = _BitReader(intervals[interval_idx])
                pred = {cid: 0 for cid, *_ in comps}
            for cid, hs, vs, tq_id in comps:
                q = qt[tq_id]
                dch, ach = dc_dec[cid], ac_dec[cid]
                for by in range(vs):
                    for bx in range(hs):
                        blk = np.zeros(64)
                        t = dch.decode(br)
                        diff = _extend(br.receive(t), t)
                        pred[cid] += diff
                        blk[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = ach.decode(br)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("jpeg: AC run overflow")
                            blk[k] = _extend(br.receive(s), s)
                            k += 1
                        # DQT stores the table in zigzag order (B.2.4.1),
                        # the same order blk is in — scatter both to
                        # natural order together
                        out = np.zeros(64)
                        out[ZIGZAG] = blk * q
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        coeff[cid][y0 : y0 + 8, x0 : x0 + 8] = out.reshape(8, 8)
            mcus_done += 1

    # IDCT every block of every plane at once (vectorized numpy)
    planes = {}
    for cid, hs, vs, _ in comps:
        c = coeff[cid]
        ph, pw = c.shape
        blocks = c.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
        pix = np.einsum("xu,mnuv,vy->mnxy", _A.T, blocks, _A)
        plane = pix.transpose(0, 2, 1, 3).reshape(ph, pw) + 128.0
        # upsample to full MCU-padded resolution by sample replication
        if hs != hmax or vs != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1
            )
        planes[cid] = plane[:h, :w]

    if len(comps) == 1:
        return np.clip(planes[comps[0][0]] + 0.5, 0, 255).astype(np.uint8)
    if len(comps) == 3:
        y, cb, cr = (planes[c[0]] for c in comps)
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        return np.clip(np.stack([r, g, b], axis=-1) + 0.5, 0, 255).astype(
            np.uint8
        )
    raise ValueError(f"jpeg: {len(comps)}-component images unsupported")


# --- encoder -----------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.buf = (self.buf << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.buf)
                if self.buf == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.buf = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)  # 1-pad


def _magnitude(v: int) -> tuple[int, int]:
    """(category, magnitude bits) for a signed coefficient."""
    t = int(v).bit_length() if v >= 0 else int(-v).bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1)


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    return np.clip(np.floor((base * scale + 50) / 100), 1, 255)


def _encode_block(bw, zz, pred, ci, dc_codes, ac_codes, ti):
    diff = int(zz[0]) - pred[ci]
    pred[ci] = int(zz[0])
    t, mag = _magnitude(diff)
    code, ln = dc_codes[ti][t]
    bw.write(code, ln)
    if t:
        bw.write(mag, t)
    run = 0
    last_nz = np.nonzero(zz[1:])[0]
    end = (last_nz[-1] + 2) if len(last_nz) else 1
    for k in range(1, end):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[ti][0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s, mag = _magnitude(v)
        code, ln = ac_codes[ti][(run << 4) | s]
        bw.write(code, ln)
        bw.write(mag, s)
        run = 0
    if end < 64:
        code, ln = ac_codes[ti][0x00]  # EOB
        bw.write(code, ln)


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """HxW or HxWx3 uint8 -> baseline JFIF (Annex K tables).

    ``subsample`` selects the chroma layout: False/'444' full
    resolution, True/'420' 2x2 box-averaged (the web default), '422'
    horizontal-only 2x1 averaging. ``restart_interval`` > 0 emits a DRI
    segment and RSTn markers every that many MCUs (resync points a
    corruption-tolerant reader can restart from)."""
    arr = np.asarray(arr, dtype=np.float64)
    gray = arr.ndim == 2 or arr.shape[2] == 1
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    if not gray and arr.shape[2] != 3:
        raise ValueError("jpeg: encode expects HxW or HxWx3")
    h, w = arr.shape[:2]

    def _pad_to(plane, bh, bw_):
        sh, sw = plane.shape
        padded = np.empty((bh, bw_))
        padded[:sh, :sw] = plane
        padded[sh:, :sw] = plane[-1:, :]  # edge-replicate padding
        padded[:, sw:] = padded[:, sw - 1 : sw]
        return padded

    if gray:
        comps = [(arr, 1, 1)]  # (plane, hs, vs)
    else:
        r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        mode = {False: "444", True: "420"}.get(subsample, subsample)
        if mode == "420":
            # 2x2 box average on an even-padded plane
            def _half(p):
                p = _pad_to(p, -(-h // 2) * 2, -(-w // 2) * 2)
                return 0.25 * (
                    p[0::2, 0::2] + p[1::2, 0::2]
                    + p[0::2, 1::2] + p[1::2, 1::2]
                )

            comps = [(y, 2, 2), (_half(cb), 1, 1), (_half(cr), 1, 1)]
        elif mode == "422":
            # horizontal-only 2x1 average
            def _hhalf(p):
                p = _pad_to(p, h, -(-w // 2) * 2)
                return 0.5 * (p[:, 0::2] + p[:, 1::2])

            comps = [(y, 2, 1), (_hhalf(cb), 1, 1), (_hhalf(cr), 1, 1)]
        elif mode == "444":
            comps = [(y, 1, 1), (cb, 1, 1), (cr, 1, 1)]
        else:
            raise ValueError(f"jpeg: subsample mode {subsample!r} "
                             "unsupported (444/420/422)")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    qts = [_scaled_qt(_QT_LUMA, quality)]
    if not gray:
        qts.append(_scaled_qt(_QT_CHROMA, quality))
    dc_codes = [_canonical_codes(*_HUFF_DC_LUMA)]
    ac_codes = [_canonical_codes(*_HUFF_AC_LUMA)]
    if not gray:
        dc_codes.append(_canonical_codes(*_HUFF_DC_CHROMA))
        ac_codes.append(_canonical_codes(*_HUFF_AC_CHROMA))

    quantized = []  # per component: [by, bx, 64] zigzagged int blocks
    for ci, (plane, hs, vs) in enumerate(comps):
        ph, pw = mcuy * vs * 8, mcux * hs * 8
        padded = _pad_to(plane, ph, pw)
        blocks = (
            (padded - 128.0)
            .reshape(ph // 8, 8, pw // 8, 8)
            .transpose(0, 2, 1, 3)
        )
        coefs = np.einsum("ux,mnxy,yv->mnuv", _A, blocks, _A.T)
        q = qts[min(ci, len(qts) - 1)]
        qz = np.round(coefs / q.reshape(8, 8)).astype(np.int64)
        zz = qz.reshape(ph // 8, pw // 8, 64)[:, :, ZIGZAG]
        quantized.append(zz)

    bw = _BitWriter()
    pred = [0] * len(comps)
    mcus_done = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcus_done and (
                mcus_done % restart_interval == 0
            ):
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + (mcus_done // restart_interval - 1) % 8])
                pred = [0] * len(comps)
            for ci, (_plane, hs, vs) in enumerate(comps):
                ti = min(ci, 1)
                for by in range(vs):
                    for bx in range(hs):
                        _encode_block(
                            bw,
                            quantized[ci][my * vs + by, mx * hs + bx],
                            pred, ci, dc_codes, ac_codes, ti,
                        )
            mcus_done += 1
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti, q in enumerate(qts):
        out += seg(
            0xDB,
            bytes([ti]) + bytes(q.astype(np.uint8)[ZIGZAG]),
        )
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        hs, vs = comps[ci][1], comps[ci][2]
        sof += bytes([ci + 1, hs << 4 | vs, min(ci, 1)])
    out += seg(0xC0, sof)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    tables = [(0, 0, _HUFF_DC_LUMA), (1, 0, _HUFF_AC_LUMA)]
    if not gray:
        tables += [(0, 1, _HUFF_DC_CHROMA), (1, 1, _HUFF_AC_CHROMA)]
    for tc, th, (bits, values) in tables:
        out += seg(0xC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(values))
    sos = bytes([nc])
    for ci in range(nc):
        ti = min(ci, 1)
        sos += bytes([ci + 1, ti << 4 | ti])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
