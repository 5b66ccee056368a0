"""Pure numpy + stdlib JPEG codec (ITU-T T.81 / JFIF): baseline,
progressive, and lossless.

Closes the one codec gap a real web corpus hits first (reference has no
media at all; VERDICT r7 queue item #7): baseline sequential DCT with
Huffman entropy coding, written from the public spec.

Decoder coverage: baseline sequential (SOF0/1) AND progressive (SOF2
— spectral selection + successive approximation, EOB runs, all four
scan modes), 8-bit, 1 component (grayscale) or 3 components (JFIF
YCbCr) at any of the common sampling factors (4:4:4, 4:2:2, 4:2:0),
restart markers, multi-scan coefficient assembly, multi-table DQT/DHT
segments — plus the LOSSLESS process (SOF3, T.81 Annex H: predictors
1-7, point transform, restart resets, precisions 2-16 with >8-bit
stripped to the high byte; components returned RAW, no color
transform — lossless carries no JFIF color model). Loud
``NotImplementedError`` only for the hierarchical/arithmetic SOFs so
the multimodal quarantine path keeps routing those rows, and
``ValueError`` for malformed streams.

Encoder: baseline, progressive (four-phase scan script over the
same quantized coefficients, so the two forms decode bit-identically —
the round-trip invariant the tests pin), or lossless (SOF3, any
predictor, optional restarts — decode returns the input EXACTLY),
4:4:4 / 4:2:0 / 4:2:2, Annex
K quantization tables scaled by the usual IJG quality curve, Annex K
Huffman tables for baseline and flat custom tables for the progressive
scans (which need EOBn symbols Annex K does not define). Not
bit-identical to any other encoder (no encoder pair is), but
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


from functools import lru_cache


@lru_cache(maxsize=64)
def _huff_lut(bits: tuple, values: tuple):
    """16-bit lookup tables for one canonical Huffman table: every
    16-bit window whose prefix is a code of length L for symbol V maps
    to lut_sym[w]=V, lut_len[w]=L (0 = no valid code has this prefix).
    One table-driven lookup replaces the per-bit F.2.2.3 walk — the
    decode hot path drops from ~1 Python call per BIT to ~2 per
    SYMBOL. Cached: encoders overwhelmingly reuse the same tables
    (ours are fixed; foreign files repeat the Annex-K ones), so the
    65536-slot build is paid once per distinct table, not per image."""
    lut_sym = [0] * 65536
    lut_len = [0] * 65536
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            start = code << (16 - length)
            end = (code + 1) << (16 - length)
            lut_sym[start:end] = [values[k]] * (end - start)
            lut_len[start:end] = [length] * (end - start)
            code += 1
            k += 1
        code <<= 1
    return lut_sym, lut_len


class _HuffDecoder:
    """Canonical Huffman decoder, table-driven (peek-16 + skip) instead
    of the bit-at-a-time F.2.2.3 walk — same codes, same symbols."""

    def __init__(self, bits, values):
        self.lut_sym, self.lut_len = _huff_lut(
            tuple(bits), tuple(values)
        )

    def decode(self, br: "_BitReader") -> int:
        w = br.peek16()
        length = self.lut_len[w]
        if length == 0:
            raise ValueError("jpeg: invalid Huffman code")
        br.skip(length)
        return self.lut_sym[w]

    def decode_rs(self, br: "_BitReader") -> tuple:
        """(symbol, value): the per-coefficient hot path fused into ONE
        buffer transaction — Huffman code, the SSSS (= symbol & 0xF)
        magnitude bits, and F.2.2.1 EXTEND. Valid for any symbol whose
        low nibble is the magnitude length: AC rrrrssss bytes and DC
        categories (<= 15 in the 8-bit modes this decoder supports)."""
        nb = br.nbits
        if nb < 32:
            br._fill(32)
            nb = br.nbits
        if nb >= 16:
            w = (br.buf >> (nb - 16)) & 0xFFFF
        else:
            pad = 16 - nb
            w = ((br.buf << pad) | ((1 << pad) - 1)) & 0xFFFF
        length = self.lut_len[w]
        if length == 0:
            raise ValueError("jpeg: invalid Huffman code")
        rs = self.lut_sym[w]
        s = rs & 0xF
        nb -= length + s
        if nb < 0:
            raise ValueError("jpeg: entropy data exhausted")
        v = (br.buf >> nb) & ((1 << s) - 1)
        br.nbits = nb
        br.buf &= (1 << nb) - 1
        if s and v < (1 << (s - 1)):
            v -= (1 << s) - 1
        return rs, v


class _BitReader:
    """MSB-first bit reader over one entropy-coded interval (stuffing
    already stripped). Multi-bit buffered: peek16/skip serve the
    table-driven Huffman decoder, receive() pulls magnitude bits in
    one shot; read_bit remains for the refinement paths."""

    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data)
        self.pos = 0
        self.buf = 0
        self.nbits = 0

    def _fill(self, need: int) -> None:
        while self.nbits < need and self.pos < self.n:
            self.buf = (self.buf << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= self.n:
                raise ValueError("jpeg: entropy data exhausted")
            self.buf = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        if self.nbits < n:
            raise ValueError("jpeg: entropy data exhausted")
        self.nbits -= n
        v = (self.buf >> self.nbits) & ((1 << n) - 1)
        self.buf &= (1 << self.nbits) - 1
        return v

    def peek16(self) -> int:
        """Next 16 bits without consuming; the tail past end-of-data is
        padded with 1-bits (the B.1.1.5 pad convention), so a code that
        genuinely fits the remaining bits still resolves and skip()
        raises only when a decode would overrun the stream."""
        self._fill(16)
        if self.nbits >= 16:
            return (self.buf >> (self.nbits - 16)) & 0xFFFF
        pad = 16 - self.nbits
        return ((self.buf << pad) | ((1 << pad) - 1)) & 0xFFFF

    def skip(self, n: int) -> None:
        if self.nbits < n:
            raise ValueError("jpeg: entropy data exhausted")
        self.nbits -= n
        self.buf &= (1 << self.nbits) - 1


# --- decoder -----------------------------------------------------------------
# (F.2.2.1 EXTEND is fused into _HuffDecoder.decode_rs)


def _slice_entropy(payload: bytes, pos: int):
    """Slice one scan's entropy-coded bytes starting at ``pos``:
    un-stuff FF00, split on restart markers (skipping T.81 B.1.1.2
    fill bytes), stop at any other marker. Returns
    (intervals, next_marker_pos).

    Walks only the 0xFF positions (one numpy scan; ~1/256 of entropy
    bytes) and assembles intervals from clean-run slices instead of a
    per-byte Python append."""
    n = len(payload)
    ffs = np.flatnonzero(
        np.frombuffer(payload, np.uint8, n - pos, pos) == 0xFF
    )
    intervals: list[bytes] = []
    parts: list[bytes] = []
    start = pos  # start of the current clean (marker-free) run
    for off in ffs.tolist():
        i = pos + off
        if i < start:  # consumed by a previous FF00 skip
            continue
        nxt = payload[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:  # stuffed FF: keep the FF, drop the 00
            parts.append(payload[start : i + 1])
            start = i + 2
            continue
        if 0xD0 <= nxt <= 0xD7:  # RSTn: close this interval
            parts.append(payload[start:i])
            intervals.append(b"".join(parts))
            parts = []
            start = i + 2
            continue
        if nxt == 0xFF:  # fill byte before a marker (T.81 B.1.1.2)
            parts.append(payload[start:i])
            start = i + 1
            continue
        # EOI / next segment ends the scan
        parts.append(payload[start:i])
        intervals.append(b"".join(parts))
        return intervals, i
    parts.append(payload[start:n])
    intervals.append(b"".join(parts))
    return intervals, n


class _ScanState:
    """Mutable per-interval entropy state: bit reader, DC predictors,
    and the EOB run counter (progressive AC scans)."""

    def __init__(self, interval: bytes, cids):
        self.br = _BitReader(interval)
        self.pred = {cid: 0 for cid in cids}
        self.eobrun = 0


def _decode_dc(st, dc_dec, cid, b, ah, al):
    if ah == 0:  # first pass
        _t, v = dc_dec.decode_rs(st.br)
        st.pred[cid] += v
        b[0] = st.pred[cid] << al
    else:  # refinement: one bit per block
        if st.br.read_bit():
            b[0] |= 1 << al


def _decode_ac_first(st, ac_dec, b, ss, se, al):
    """AC first pass (also the baseline AC path: ss=1, al=0, where
    encoders only ever emit EOB runs of length 1).

    The bit cache lives in LOCALS for the whole block (the libjpeg
    structure): the per-coefficient path — Huffman code + SSSS
    magnitude + EXTEND — runs with zero method calls, and the reader
    state syncs back once per block. Semantics identical to
    _HuffDecoder.decode_rs."""
    if st.eobrun > 0:
        st.eobrun -= 1
        return
    br = st.br
    data, n = br.data, br.n
    pos, buf, nbits = br.pos, br.buf, br.nbits
    lut_sym, lut_len = ac_dec.lut_sym, ac_dec.lut_len
    k = ss
    while k <= se:
        if nbits < 32:
            while nbits < 32 and pos < n:
                buf = (buf << 8) | data[pos]
                pos += 1
                nbits += 8
        if nbits >= 16:
            w = (buf >> (nbits - 16)) & 0xFFFF
        else:
            pad = 16 - nbits
            w = ((buf << pad) | ((1 << pad) - 1)) & 0xFFFF
        length = lut_len[w]
        if length == 0:
            raise ValueError("jpeg: invalid Huffman code")
        rs = lut_sym[w]
        r = rs >> 4
        s = rs & 0xF
        nbits -= length + s
        if nbits < 0:
            raise ValueError("jpeg: entropy data exhausted")
        v = (buf >> nbits) & ((1 << s) - 1)
        buf &= (1 << nbits) - 1
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            st.eobrun = (1 << r) - 1
            if r:  # EOBn extra bits, straight off the local cache
                if nbits < r:
                    raise ValueError("jpeg: entropy data exhausted")
                nbits -= r
                st.eobrun += (buf >> nbits) & ((1 << r) - 1)
                buf &= (1 << nbits) - 1
            break
        k += r
        if k > se:
            raise ValueError("jpeg: AC run overflow")
        if v < (1 << (s - 1)):
            v -= (1 << s) - 1
        b[k] = v << al
        k += 1
    br.pos, br.buf, br.nbits = pos, buf, nbits


def _decode_ac_refine(st, ac_dec, b, ss, se, al):
    """AC successive-approximation refinement (T.81 G.1.2.3 /
    libjpeg's decode_mcu_AC_refine structure): newly significant
    coefficients arrive as (run, 1) symbols + sign, every nonzero
    coefficient passed on the way emits a correction bit. The symbol
    + sign pair rides decode_rs (EXTEND of a 1-bit magnitude is
    exactly the +-1 sign convention); correction bits go through a
    hoisted bound read_bit."""
    p1, m1 = 1 << al, -(1 << al)
    read_bit = st.br.read_bit

    def correct(k):
        while k <= se:
            if b[k] != 0:
                if read_bit() and not (b[k] & p1):
                    b[k] += p1 if b[k] >= 0 else m1
            k += 1

    if st.eobrun > 0:
        # block fully inside an EOB run: corrections only
        st.eobrun -= 1
        correct(ss)
        return
    k = ss
    in_run = False
    while k <= se:
        rs, v = ac_dec.decode_rs(st.br)
        r, s = rs >> 4, rs & 0xF
        newval = 0
        if s == 0:
            if r != 15:
                # EOBn: run of 2^r + ext blocks, INCLUDING this one —
                # st.eobrun stores only the extra blocks; this block's
                # tail is corrected unconditionally below
                st.eobrun = (1 << r) - 1
                if r:
                    st.eobrun += st.br.receive(r)
                in_run = True
                break
            # r == 15 (ZRL): skip 16 zero-history positions
        else:
            if s != 1:
                raise ValueError("jpeg: AC refine magnitude != 1")
            newval = p1 if v > 0 else m1
        while k <= se:
            if b[k] != 0:
                if read_bit() and not (b[k] & p1):
                    b[k] += p1 if b[k] >= 0 else m1
            else:
                if r == 0:
                    break
                r -= 1
            k += 1
        if newval and k <= se:
            b[k] = newval
        k += 1
    if in_run:
        correct(k)  # this block ENTERED the run: correct its tail


def _scan_units(scan_comps, geom):
    """Enumerate the scan's data units as (cid, by, bx) in spec order.
    Interleaved (multi-component): MCU raster, vs*hs blocks per comp
    per MCU, one MCU per restart unit. Non-interleaved: the single
    component's own block raster, one BLOCK per restart unit. Yields
    (restart_boundary, cid, by, bx)."""
    hmax, vmax, mcux, mcuy, dims = geom
    if len(scan_comps) > 1:
        for my in range(mcuy):
            for mx in range(mcux):
                first = True
                for cid, hs, vs in scan_comps:
                    for by in range(vs):
                        for bx in range(hs):
                            yield first, cid, my * vs + by, mx * hs + bx
                            first = False
    else:
        cid, hs, vs = scan_comps[0]
        nby, nbx = dims[cid][:2]
        for by in range(nby):
            for bx in range(nbx):
                yield True, cid, by, bx


def _decode_scan(payload, pos, scan, ss, se, ah, al, huff, coeff, geom,
                 restart_interval):
    """Decode one SOS's entropy data into the coefficient store.
    Returns the position of the next marker."""
    intervals, nxt = _slice_entropy(payload, pos)
    dc_dec, ac_dec = {}, {}
    for cs, td, ta in scan:
        # DC refinement scans (Ah>0) read one raw bit per block and
        # never touch a Huffman table (T.81 G.1.2.1), so only the FIRST
        # DC pass may demand Td's presence — real progressive encoders
        # routinely leave Td referencing an undefined table there.
        if ss == 0 and ah == 0 and (0, td) not in huff:
            raise ValueError("jpeg: scan references missing DC table")
        if se > 0 and (1, ta) not in huff:
            raise ValueError("jpeg: scan references missing AC table")
        dc_dec[cs] = huff.get((0, td))
        ac_dec[cs] = huff.get((1, ta))
    comp_geom = [(cs, *geom[4][cs][2:]) for cs, _, _ in scan]
    # comp_geom entries: (cid, hs, vs)
    cids = [c[0] for c in comp_geom]
    st = _ScanState(intervals[0], cids)
    interval_idx = 0
    units_done = 0
    for boundary, cid, by, bx in _scan_units(comp_geom, geom):
        if (
            boundary
            and restart_interval
            and units_done
            and units_done % restart_interval == 0
        ):
            interval_idx += 1
            if interval_idx >= len(intervals):
                raise ValueError("jpeg: missing restart interval data")
            st = _ScanState(intervals[interval_idx], cids)
        if boundary:
            units_done += 1
        b = coeff[cid][by, bx]
        if ss == 0:
            _decode_dc(st, dc_dec[cid], cid, b, ah, al)
        if se > 0:
            start = max(ss, 1)
            if ah == 0:
                _decode_ac_first(st, ac_dec[cid], b, start, se, al)
            else:
                # refinement reads EVERY coefficient in the band (the
                # correction-bit walk); hand it native ints, not numpy
                # scalar indexing, and sync the block back once
                bl = b.tolist()
                _decode_ac_refine(st, ac_dec[cid], bl, start, se, al)
                b[start : se + 1] = bl[start : se + 1]
    return nxt


def _decode_lossless_scan(payload, pos, scan, predictor, pt, huff,
                          samples, w, h, prec, restart_interval):
    """Decode one lossless-process (SOF3) scan into ``samples`` (dict
    cid -> h x w list-of-lists of reconstructed Rx values, still in
    the point-transformed domain). T.81 Annex H: per sample, a DC-type
    Huffman category + magnitude bits give the EXTENDed difference
    (SSSS=16 encodes 32768 with no extra bits), reconstruction is
    (prediction + diff) mod 65536, and the prediction follows H.1.2.2:
    the first sample of the scan/each restart interval uses
    2^(P-Pt-1), the remainder of that FIRST LINE uses Ra, the first
    sample of every other line uses Rb, and everything else uses the
    scan's selected predictor 1-7 (5/6 divide by arithmetic shift)."""
    if not 1 <= predictor <= 7:
        raise ValueError(f"jpeg: bad lossless predictor {predictor}")
    intervals, nxt = _slice_entropy(payload, pos)
    decs = []
    for cs, td, _ta in scan:
        if (0, td) not in huff:
            raise ValueError("jpeg: scan references missing DC table")
        decs.append((cs, huff[(0, td)]))
    default = 1 << (prec - pt - 1)
    interval_idx = 0
    br = _BitReader(intervals[0])
    # where the current restart interval began (shared: sampling is
    # 1x1 so every component advances through the same raster)
    ry, rx = 0, 0
    mcus = 0
    for y in range(h):
        for x in range(w):
            if restart_interval and mcus and mcus % restart_interval == 0:
                interval_idx += 1
                if interval_idx >= len(intervals):
                    raise ValueError("jpeg: missing restart interval data")
                br = _BitReader(intervals[interval_idx])
                ry, rx = y, x
            mcus += 1
            for cs, dec in decs:
                t = dec.decode(br)
                if t == 16:  # H.2: SSSS=16 -> 32768, no extra bits
                    diff = 32768
                elif t > 16:
                    raise ValueError("jpeg: bad lossless ssss category")
                elif t:
                    v = br.receive(t)
                    diff = v if v >= (1 << (t - 1)) else v - (1 << t) + 1
                else:
                    diff = 0
                rows = samples[cs]
                if y == ry:  # first line of the scan/restart interval
                    pred = default if x == rx else rows[y][x - 1]
                elif x == 0:
                    pred = rows[y - 1][0]
                else:
                    a = rows[y][x - 1]
                    b = rows[y - 1][x]
                    if predictor == 1:
                        pred = a
                    elif predictor == 2:
                        pred = b
                    elif predictor == 3:
                        pred = rows[y - 1][x - 1]
                    elif predictor == 4:
                        pred = a + b - rows[y - 1][x - 1]
                    elif predictor == 5:
                        pred = a + ((b - rows[y - 1][x - 1]) >> 1)
                    elif predictor == 6:
                        pred = b + ((a - rows[y - 1][x - 1]) >> 1)
                    else:
                        pred = (a + b) >> 1
                rows[y][x] = (pred + diff) & 0xFFFF
    return nxt


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline, progressive, OR lossless JPEG -> HxW (grayscale) /
    HxWx3 uint8. Sequential (SOF0/1) and progressive (SOF2) with
    spectral selection + successive approximation decode through the
    DCT path (3 components = JFIF YCbCr); the LOSSLESS process (SOF3,
    T.81 Annex H — predictors 1-7, point transform, restarts,
    precisions 2-16 with >8-bit stripped to the high byte like
    decode_png's 16-bit rule) returns component values AS STORED (no
    color transform: lossless carries raw components, e.g. RGB or
    sensor planes). Hierarchical/arithmetic SOFs stay
    NotImplementedError."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("jpeg: bad SOI")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None  # (h, w, comps, progressive); comps: (cid, hs, vs, tq)
    restart_interval = 0
    coeff = None  # cid -> (nby, nbx, 64) int64, ZIGZAG order
    geom = None
    samples = None  # lossless: cid -> h x w reconstructed values
    lossless_pt = 0
    saw_scan = False
    pos = 2
    n = len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError("jpeg: expected marker")
        # T.81 B.1.1.2: any marker may be preceded by 0xFF fill bytes
        while pos + 1 < n and payload[pos + 1] == 0xFF:
            pos += 1
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
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0/1, SOF2, SOF3
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            lossless = marker == 0xC3
            if lossless:
                if not 2 <= prec <= 16:
                    raise ValueError(
                        f"jpeg: {prec}-bit lossless precision invalid"
                    )
            elif prec != 8:
                raise ValueError(f"jpeg: {prec}-bit precision unsupported")
            comps = []
            for i in range(nc):
                cid, hv, tq_id = struct.unpack_from(">BBB", seg, 6 + i * 3)
                comps.append((cid, hv >> 4, hv & 0xF, tq_id))
            mode = 2 if lossless else (1 if marker == 0xC2 else 0)
            frame = (h, w, comps, mode, prec)
            if lossless:
                if nc > 1 and any(
                    c[1] != 1 or c[2] != 1 for c in comps
                ):
                    raise ValueError(
                        "jpeg: lossless with subsampling unsupported"
                    )
                samples = {
                    cid: [[0] * w for _ in range(h)]
                    for cid, _hs, _vs, _tq in comps
                }
            else:
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                dims = {}
                for cid, hs, vs, tq_id in comps:
                    cw = -(-(w * hs) // hmax)
                    ch = -(-(h * vs) // vmax)
                    dims[cid] = (-(-ch // 8), -(-cw // 8), hs, vs)
                geom = (hmax, vmax, mcux, mcuy, dims)
                coeff = {
                    cid: np.zeros(
                        (mcuy * vs, mcux * hs, 64), dtype=np.int64
                    )
                    for cid, hs, vs, _ in comps
                }
        elif marker in (0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"jpeg: SOF{marker - 0xC0} coding process unsupported "
                "(hierarchical/arithmetic — codec-library territory)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tds = seg[1 + i * 2], seg[2 + i * 2]
                scan.append((cs, tds >> 4, tds & 0xF))
            ss, se = seg[1 + ns * 2], seg[2 + ns * 2]
            ahal = seg[3 + ns * 2]
            ah, al = ahal >> 4, ahal & 0xF
            if frame[3] == 2:  # lossless: Ss = predictor, Al = Pt
                lossless_pt = al
                pos = _decode_lossless_scan(
                    payload, pos + seglen, scan, ss, al, huff,
                    samples, frame[1], frame[0], frame[4],
                    restart_interval,
                )
                saw_scan = True
                continue
            if frame[3] == 0:  # baseline scans are always full-band
                ss, se, ah, al = 0, 63, 0, 0
            pos = _decode_scan(
                payload, pos + seglen, scan, ss, se, ah, al, huff,
                coeff, geom, restart_interval,
            )
            saw_scan = True
            continue
        pos += seglen
    if frame is None or not saw_scan:
        raise ValueError("jpeg: missing SOF/SOS")

    h, w, comps, _mode, _prec = frame
    if _mode == 2:  # lossless: raw components, no color transform
        planes = []
        for cid, _hs, _vs, _tq in comps:
            p = np.array(samples[cid], dtype=np.int64) << lossless_pt
            if _prec > 8:  # strip to the high byte (decode_png rule)
                p >>= _prec - 8
            elif _prec < 8:
                p <<= 8 - _prec
            planes.append(np.clip(p, 0, 255).astype(np.uint8))
        if len(planes) == 1:
            return planes[0]
        if len(planes) == 3:
            return np.stack(planes, axis=-1)
        raise ValueError(
            f"jpeg: {len(planes)}-component images unsupported"
        )
    hmax, vmax, mcux, mcuy, dims = geom
    planes = {}
    for cid, hs, vs, tq_id in comps:
        if tq_id not in qt:
            raise ValueError("jpeg: missing quantization table")
        zz = coeff[cid].astype(np.float64)  # (nby, nbx, 64) zigzag
        # DQT stores tables in zigzag order too — dequantize in place,
        # then scatter both to natural order together
        nat = np.zeros_like(zz)
        nat[:, :, ZIGZAG] = zz * qt[tq_id][None, None, :]
        nby, nbx = nat.shape[:2]
        blocks = nat.reshape(nby, nbx, 8, 8)
        pix = np.einsum("xu,mnuv,vy->mnxy", _A.T, blocks, _A)
        plane = (
            pix.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8) + 128.0
        )
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


def _flat_table(symbols):
    """All-same-length canonical Huffman table: the smallest length L
    with 2^L > len(symbols) leaves the all-ones code unused (required
    by the spec). Deliberately non-optimal — the progressive scans
    need EOBn symbols that Annex K's baseline tables do not define, and
    a flat table is trivially correct."""
    L = len(symbols).bit_length()
    bits = [0] * 16
    bits[L - 1] = len(symbols)
    return bits, list(symbols)


_HUFF_DC_PROG = _flat_table(list(range(12)))
_HUFF_AC_PROG = _flat_table(
    [r << 4 for r in range(15)]                      # EOB0..EOB14
    + [0xF0]                                         # ZRL
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)


class _ProgAC:
    """Per-scan AC state shared across blocks: the EOB run counter and
    the correction bits buffered inside it (emitted right after the
    EOBn symbol, T.81 G.1.2.3)."""

    def __init__(self, bw, codes):
        self.bw = bw
        self.codes = codes
        self.eobrun = 0
        self.pending: list[int] = []

    def sym(self, s):
        code, ln = self.codes[s]
        self.bw.write(code, ln)

    def flush_eobrun(self):
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            self.sym(nbits << 4)
            if nbits:
                self.bw.write(self.eobrun - (1 << nbits), nbits)
            self.eobrun = 0
            for bit in self.pending:
                self.bw.write(bit, 1)
            self.pending = []

    def bump_eobrun(self, bits):
        self.eobrun += 1
        self.pending.extend(bits)
        if self.eobrun == 0x7FFF:
            self.flush_eobrun()


def _emit_ac_first(st: _ProgAC, zz, ss, se, al):
    """One block of an AC first-pass scan: band values are the point
    transform trunc(coef / 2^al); all-zero bands fold into EOB runs."""
    c = zz[ss : se + 1]
    vals = np.sign(c) * (np.abs(c) >> al)
    nz = np.nonzero(vals)[0]
    if not len(nz):
        st.bump_eobrun([])
        return
    st.flush_eobrun()
    last = nz[-1]
    r = 0
    for i in range(last + 1):
        v = int(vals[i])
        if v == 0:
            r += 1
            continue
        while r > 15:
            st.sym(0xF0)
            r -= 16
        s, mag = _magnitude(v)
        st.sym((r << 4) | s)
        st.bw.write(mag, s)
        r = 0
    if last < se - ss:
        st.bump_eobrun([])


def _emit_ac_refine(st: _ProgAC, zz, ss, se, al):
    """One block of an AC refinement scan (T.81 G.1.2.3): newly
    significant coefficients as (run, 1) + sign, correction bits for
    every already-significant coefficient passed, tails folded into
    the shared EOB run."""
    c = zz[ss : se + 1]
    absv = np.abs(c) >> al
    ones = np.nonzero(absv == 1)[0]
    eob = ones[-1] if len(ones) else -1
    r = 0
    br: list[int] = []
    for i in range(len(absv)):
        t = int(absv[i])
        if t == 0:
            r += 1
            continue
        while r > 15 and i <= eob:
            st.flush_eobrun()
            st.sym(0xF0)
            r -= 16
            for bit in br:
                st.bw.write(bit, 1)
            br = []
        if t > 1:
            br.append(t & 1)
            continue
        st.flush_eobrun()
        st.sym((r << 4) | 1)
        st.bw.write(1 if c[i] > 0 else 0, 1)
        for bit in br:
            st.bw.write(bit, 1)
        br = []
        r = 0
    if r > 0 or br:
        st.bump_eobrun(br)


def _write_progressive(out, seg, h, w, comps_hv, quantized, gray):
    """Emit SOF2 + the four-phase scan script: interleaved DC first
    (Al=1), per-component AC first (spectral selection 1..63, Al=1),
    interleaved DC refine, per-component AC refine — every scan mode
    the progressive decoder implements, so round-trips cover all four.
    """
    nc = len(comps_hv)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci, (hs, vs) in enumerate(comps_hv):
        sof += bytes([ci + 1, hs << 4 | vs, min(ci, 1)])
    out += seg(0xC2, sof)
    dc_codes = _canonical_codes(*_HUFF_DC_PROG)
    ac_codes = _canonical_codes(*_HUFF_AC_PROG)
    out += seg(
        0xC4,
        bytes([0x00]) + bytes(_HUFF_DC_PROG[0]) + bytes(_HUFF_DC_PROG[1]),
    )
    out += seg(
        0xC4,
        bytes([0x10]) + bytes(_HUFF_AC_PROG[0]) + bytes(_HUFF_AC_PROG[1]),
    )
    hmax = max(hs for hs, _ in comps_hv)
    vmax = max(vs for _, vs in comps_hv)
    mcuy = quantized[0].shape[0] // comps_hv[0][1]
    mcux = quantized[0].shape[1] // comps_hv[0][0]

    def sos(comp_ids, ss, se, ah, al):
        body = bytes([len(comp_ids)])
        for ci in comp_ids:
            body += bytes([ci + 1, 0x00])  # Td=0, Ta=0
        return seg(0xDA, body + bytes([ss, se, ah << 4 | al]))

    def mcu_blocks():
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (hs, vs) in enumerate(comps_hv):
                    for by in range(vs):
                        for bx in range(hs):
                            yield ci, my * vs + by, mx * hs + bx

    # scan 1: DC first, interleaved, Al=1 (point transform = dc >> 1)
    out += sos(list(range(nc)), 0, 0, 0, 1)
    bw = _BitWriter()
    pred = [0] * nc
    for ci, by, bx in mcu_blocks():
        dc = int(quantized[ci][by, bx, 0]) >> 1
        diff = dc - pred[ci]
        pred[ci] = dc
        t, mag = _magnitude(diff)
        code, ln = dc_codes[t]
        bw.write(code, ln)
        if t:
            bw.write(mag, t)
    bw.flush()
    out += bw.out

    # per-comp block grids for the NON-interleaved AC scans: only the
    # component's own sampling region, not the MCU-padded grid
    grids = []
    for hs, vs in comps_hv:
        cw = -(-(w * hs) // hmax)
        ch = -(-(h * vs) // vmax)
        grids.append((-(-ch // 8), -(-cw // 8)))

    # scans 2..: AC first per component (Ss=1..63, Al=1)
    for ci in range(nc):
        out += sos([ci], 1, 63, 0, 1)
        bw = _BitWriter()
        st = _ProgAC(bw, ac_codes)
        nby, nbx = grids[ci]
        for by in range(nby):
            for bx in range(nbx):
                _emit_ac_first(st, quantized[ci][by, bx], 1, 63, 1)
        st.flush_eobrun()
        bw.flush()
        out += bw.out

    # DC refine: one raw bit per block, interleaved
    out += sos(list(range(nc)), 0, 0, 1, 0)
    bw = _BitWriter()
    for ci, by, bx in mcu_blocks():
        bw.write(int(quantized[ci][by, bx, 0]) & 1, 1)
    bw.flush()
    out += bw.out

    # AC refine per component (Ah=1, Al=0)
    for ci in range(nc):
        out += sos([ci], 1, 63, 1, 0)
        bw = _BitWriter()
        st = _ProgAC(bw, ac_codes)
        nby, nbx = grids[ci]
        for by in range(nby):
            for bx in range(nbx):
                _emit_ac_refine(st, quantized[ci][by, bx], 1, 63, 0)
        st.flush_eobrun()
        bw.flush()
        out += bw.out

    out += b"\xff\xd9"
    return bytes(out)


# Lossless DC table: flat canonical codes over every legal SSSS
# category 0..16 (SSSS=16 encodes 32768 with no extra bits)
_HUFF_DC_LOSSLESS = _flat_table(list(range(17)))


def _write_lossless(out, seg, arr, predictor, restart_interval):
    """Emit a complete SOF3 (T.81 Annex H) stream: 8-bit precision,
    1x1 sampling, components stored RAW (gray or RGB — lossless
    carries no JFIF color model), one interleaved scan with the
    selected predictor, Pt=0, optional restart intervals. Decodes
    bit-exactly — that round-trip equality IS the test invariant."""
    if not 1 <= predictor <= 7:
        raise ValueError(f"jpeg: bad lossless predictor {predictor}")
    h, w = arr.shape[:2]
    nc = 1 if arr.ndim == 2 else arr.shape[2]
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])  # 1x1 sampling, Tq unused
    out += seg(0xC3, sof)
    bits, vals = _HUFF_DC_LOSSLESS
    out += seg(0xC4, bytes([0x00]) + bytes(bits) + bytes(vals))
    codes = _canonical_codes(bits, vals)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([predictor, 0, 0])  # Ss=pred, Se=0, AhAl=Pt=0
    out += seg(0xDA, sos)
    px = [
        [[int(v)] for v in row] for row in arr.tolist()
    ] if nc == 1 else [
        [list(map(int, v)) for v in row] for row in arr.tolist()
    ]
    bw = _BitWriter()
    mcus = 0
    rst = 0
    ry = rx = 0
    for y in range(h):
        row = px[y]
        above = px[y - 1] if y else None
        for x in range(w):
            if restart_interval and mcus and mcus % restart_interval == 0:
                bw.flush()
                out += bw.out
                out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                bw = _BitWriter()
                ry, rx = y, x
            mcus += 1
            for ci in range(nc):
                if y == ry:
                    pred = 128 if x == rx else row[x - 1][ci]
                elif x == 0:
                    pred = above[0][ci]
                else:
                    a = row[x - 1][ci]
                    b = above[x][ci]
                    if predictor == 1:
                        pred = a
                    elif predictor == 2:
                        pred = b
                    elif predictor == 3:
                        pred = above[x - 1][ci]
                    elif predictor == 4:
                        pred = a + b - above[x - 1][ci]
                    elif predictor == 5:
                        pred = a + ((b - above[x - 1][ci]) >> 1)
                    elif predictor == 6:
                        pred = b + ((a - above[x - 1][ci]) >> 1)
                    else:
                        pred = (a + b) >> 1
                t, mag = _magnitude(row[x][ci] - pred)
                code, ln = codes[t]
                bw.write(code, ln)
                if t:
                    bw.write(mag, t)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
    progressive: bool = False,
    lossless: bool = False,
    predictor: int = 1,
) -> bytes:
    """HxW or HxWx3 uint8 -> JFIF. Baseline (SOF0, Annex K Huffman
    tables) by default; ``progressive=True`` emits SOF2 with the
    four-phase spectral-selection + successive-approximation scan
    script (see _write_progressive) — same quantized coefficients, so
    both forms decode bit-identically. ``lossless=True`` emits the
    SOF3 lossless process (see _write_lossless; ``predictor`` selects
    the Annex-H predictor 1-7, ``quality``/``subsample`` are ignored,
    components are stored raw) — decode returns the input EXACTLY.

    ``subsample`` selects the chroma layout: False/'444' full
    resolution, True/'420' 2x2 box-averaged (the web default), '422'
    horizontal-only 2x1 averaging. ``restart_interval`` > 0 emits a DRI
    segment and RSTn markers every that many MCUs (baseline and
    lossless)."""
    if lossless:
        if progressive:
            raise ValueError("jpeg: lossless and progressive exclusive")
        a8 = np.asarray(arr, dtype=np.uint8)
        if a8.ndim == 3 and a8.shape[2] == 1:
            a8 = a8[:, :, 0]
        if a8.ndim == 3 and a8.shape[2] != 3:
            raise ValueError("jpeg: encode expects HxW or HxWx3")
        return _write_lossless(
            bytearray(b"\xff\xd8"),
            lambda m, body: bytes([0xFF, m])
            + struct.pack(">H", len(body) + 2)
            + body,
            a8,
            predictor,
            restart_interval,
        )
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

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti, qtab in enumerate(qts):
        out += seg(0xDB, bytes([ti]) + bytes(qtab.astype(np.uint8)[ZIGZAG]))

    if progressive:
        if restart_interval:
            raise ValueError(
                "jpeg: restart markers not supported with progressive "
                "encoding here"
            )
        return _write_progressive(
            out, seg, h, w, [(hs, vs) for _, hs, vs in comps],
            quantized, gray,
        )

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
