"""Spec-anchored golden vectors for the hand-written codec pairs
(VERDICT r9 #4): because encoder AND decoder are both in-repo, a
shared spec misunderstanding could cancel in round-trip tests. These
vectors are transcribed from the PUBLIC specifications by hand — bit
packing written out in comments, code words copied from the published
tables — so a shared bug cannot hide.

- GIF LZW: byte stream hand-packed per GIF89a §22 / Appendix F
  (LSB-first variable-width codes, CLEAR/EOI, the KwKwK case, the
  width bump after table entry 2^w).
- JPEG Huffman: Annex K.3 tables' published canonical code words
  (Tables K.3/K.4/K.5), including the famous EOB=1010 and
  ZRL=11111111001, plus an MSB-first bitstream decode.
- IMA ADPCM: the IMA/DVI recurrence hand-stepped (shift-add diff
  expansion, sign bit, index/step clamps) from the published tables.
"""

from __future__ import annotations

import pytest

from instacart_medallion_lakehouse_spark.operators.audioprobe import (
    IMA_INDEX_TABLE,
    IMA_STEP_TABLE,
    ima_adpcm_decode,
)
from instacart_medallion_lakehouse_spark.operators.gifcodec import (
    lzw_decode,
    lzw_encode,
)
from instacart_medallion_lakehouse_spark.operators.jpegcodec import (
    _HUFF_AC_LUMA,
    _HUFF_DC_CHROMA,
    _HUFF_DC_LUMA,
    _BitReader,
    _HuffDecoder,
    _canonical_codes,
)


class TestGifLzwSpecVector:
    """GIF89a LZW with min_code_size=2: clear=4, eoi=5, roots 0-3,
    first free entry 6, initial code width 3.

    Pixels [1, 1, 1, 1, 2] encode as the code sequence
      CLEAR(4)  1  6  1  2  EOI(5)
    where 6 is the KwKwK case ("11" referenced before the decoder has
    added it). Decoder-side table growth: after adding entry 7 the
    table holds 8 == 2^3 entries, so the LAST TWO codes (2, EOI) are
    read at width 4 — the deferred width change every real-world GIF
    decoder (giflib, browsers) implements.

    LSB-first packing (GIF89a §22 "the first byte contains the lowest
    bits"):
      value = 4 | 1<<3 | 6<<6 | 1<<9 | 2<<12 | 5<<16 = 0x5238C
      bytes (little-endian) = 8C 23 05
    """

    STREAM = bytes([0x8C, 0x23, 0x05])
    PIXELS = bytes([1, 1, 1, 1, 2])

    def test_decode_spec_stream(self):
        assert lzw_decode(self.STREAM, 2, 5) == self.PIXELS

    def test_encoder_produces_spec_stream(self):
        # the encoder must emit the identical canonical stream: same
        # clear/EOI framing, same deferred width change
        assert lzw_encode(self.PIXELS, 2) == self.STREAM

    def test_kwkwk_requires_prev(self):
        # code 6 with no previous code (straight after CLEAR) is
        # undecodable per the spec — must error, not fabricate pixels
        # stream: CLEAR(4), 6, EOI(5) -> 4 | 6<<3 | 5<<6 = 0x174
        with pytest.raises(ValueError):
            lzw_decode(bytes([0x74, 0x01]), 2, 2)


class TestJpegAnnexKVectors:
    def test_dc_luminance_code_words(self):
        """ITU T.81 Table K.3: luminance DC categories -> code words."""
        codes = _canonical_codes(*_HUFF_DC_LUMA)
        expect = {
            0: "00", 1: "010", 2: "011", 3: "100", 4: "101", 5: "110",
            6: "1110", 7: "11110", 8: "111110", 9: "1111110",
            10: "11111110", 11: "111111110",
        }
        got = {s: bin(c)[2:].zfill(ln) for s, (c, ln) in codes.items()}
        assert got == expect

    def test_dc_chrominance_code_words(self):
        """ITU T.81 Table K.4: chrominance DC categories -> code words."""
        codes = _canonical_codes(*_HUFF_DC_CHROMA)
        expect = {
            0: "00", 1: "01", 2: "10", 3: "110", 4: "1110", 5: "11110",
            6: "111110", 7: "1111110", 8: "11111110", 9: "111111110",
            10: "1111111110", 11: "11111111110",
        }
        got = {s: bin(c)[2:].zfill(ln) for s, (c, ln) in codes.items()}
        assert got == expect

    def test_ac_luminance_famous_code_words(self):
        """ITU T.81 Table K.5 head: run/size symbols -> code words,
        including EOB (0x00) = 1010 and ZRL (0xF0) = 11111111001."""
        codes = _canonical_codes(*_HUFF_AC_LUMA)
        expect = {
            0x01: "00", 0x02: "01", 0x03: "100", 0x00: "1010",
            0x04: "1011", 0x11: "1100", 0xF0: "11111111001",
        }
        for sym, word in expect.items():
            c, ln = codes[sym]
            assert bin(c)[2:].zfill(ln) == word, hex(sym)

    def test_bitstream_decode_msb_first(self):
        """JPEG entropy bits are MSB-first (F.2.2.3): the byte
        0b10101100 is EOB (1010) followed by 0x11 (1100)."""
        br = _BitReader(bytes([0b10101100]) + bytes(6))
        dec = _HuffDecoder(*_HUFF_AC_LUMA)
        assert dec.decode(br) == 0x00
        assert dec.decode(br) == 0x11


class TestImaAdpcmSpecVectors:
    def test_published_tables(self):
        # endpoints of the published 89-entry step table + the index
        # adjustment table (IMA ADPCM / DVI4, also RFC 3551 §4.5.1)
        assert len(IMA_STEP_TABLE) == 89
        assert IMA_STEP_TABLE[0] == 7
        assert IMA_STEP_TABLE[1] == 8
        assert IMA_STEP_TABLE[88] == 32767
        assert tuple(IMA_INDEX_TABLE) == (-1, -1, -1, -1, 2, 4, 6, 8)
        # the step table must be strictly increasing (spec property)
        assert all(
            a < b for a, b in zip(IMA_STEP_TABLE, IMA_STEP_TABLE[1:])
        )

    def test_hand_stepped_recurrence(self):
        """pred=0, index=0 (step 7), nibbles [7, 3, 8], stepped by hand:

        n=7 (b0,b1,b2): diff = 7>>3 + 7>>2 + 7>>1 + 7 = 0+1+3+7 = 11
            pred 11, index 0+8=8 (step 16)
        n=3 (b0,b1):    diff = 16>>3 + 16>>2 + 16>>1 = 2+4+8 = 14
            pred 25, index 8-1=7 (step 14)
        n=8 (sign only): diff = 14>>3 = 1 -> pred 25-1 = 24, index 6
        """
        assert ima_adpcm_decode([7, 3, 8], 0, 0) == [11, 25, 24]

    def test_clamps(self):
        # predictor clamp at +32767: pred=32760, index=88 (step 32767),
        # nibble 4 -> diff = 32767>>3 + 32767 = 36862 -> clamped
        assert ima_adpcm_decode([4], 32760, 88) == [32767]
        # negative clamp symmetric at -32768
        assert ima_adpcm_decode([12], -32760, 88) == [-32768]
        # index clamp: index stays at 88 after +8 and at 0 after -1
        assert ima_adpcm_decode([7, 7], 0, 88)[1] is not None
        assert ima_adpcm_decode([0, 0], 0, 0) == [0, 0]

    def test_initial_state_validation(self):
        with pytest.raises(ValueError):
            ima_adpcm_decode([0], 40000, 0)
        with pytest.raises(ValueError):
            ima_adpcm_decode([0], 0, 89)


def _mu_law_wav(codes: bytes) -> bytes:
    """Minimal RIFF/WAVE container with format tag 7 (G.711 mu-law),
    8-bit mono — hand-assembled per the canonical 44-byte layout."""
    import struct as _s

    n = len(codes)
    return (
        b"RIFF"
        + _s.pack("<I", 36 + n)
        + b"WAVEfmt "
        + _s.pack("<IHHIIHH", 16, 7, 1, 8000, 8000, 1, 8)
        + b"data"
        + _s.pack("<I", n)
        + codes
    )


class TestG711SpecVectors:
    """ITU-T G.711 mu-law expansion anchored to the published extreme
    values. The CCITT formula (u = ~code; t = ((u & 0xF) << 3 + 0x84)
    << segment; sign via bit 7) hand-stepped:

      code 0xFF: u=0x00 -> t = (0 + 132) << 0 = 132 -> +0   (plus zero)
      code 0x7F: u=0x80 -> t = 132, sign set        -> -0   (minus zero)
      code 0x80: u=0x7F -> t = (120 + 132) << 7 = 32256
                           -> +32124  (the published mu-law maximum)
      code 0x00: u=0xFF -> same magnitude, sign set -> -32124
    """

    def test_extreme_codes_decode_to_published_values(self, spark):
        from instacart_medallion_lakehouse_spark.operators import multimodal

        wav = _mu_law_wav(bytes([0xFF, 0x7F, 0x80, 0x00]))
        df = spark.createDataFrame(
            [(0, bytearray(wav))], "doc_id long, payload binary"
        )
        r = multimodal.extract_g711_stats(df).collect()[0]
        assert r.n_samples == 4
        assert r.peak == 32124
        assert r.dc_sum == 0  # +0, -0, +32124, -32124
        assert r.energy == 2 * 32124 * 32124

    def test_first_segment_step(self, spark):
        # code 0xF0: u=0x0F -> t = (15*8 + 132) << 0 = 252 -> +120;
        # code 0xFE: u=0x01 -> t = (8 + 132) = 140 -> +8 — the 8-unit
        # quantization step of the first mu-law segment
        from instacart_medallion_lakehouse_spark.operators import multimodal

        wav = _mu_law_wav(bytes([0xF0, 0xFE]))
        df = spark.createDataFrame(
            [(0, bytearray(wav))], "doc_id long, payload binary"
        )
        r = multimodal.extract_g711_stats(df).collect()[0]
        assert r.peak == 120
        assert r.dc_sum == 120 + 8
        assert r.energy == 120 * 120 + 8 * 8

    def test_non_mulaw_tag_quarantined(self, spark):
        import struct as _s

        from instacart_medallion_lakehouse_spark.operators import multimodal

        wav = bytearray(_mu_law_wav(bytes([0xFF])))
        # flip the format tag to PCM (1): extractor must emit no row
        wav[20:22] = _s.pack("<H", 1)
        df = spark.createDataFrame(
            [(0, bytes(wav))], "doc_id long, payload binary"
        )
        assert multimodal.extract_g711_stats(df).count() == 0
