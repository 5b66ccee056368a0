"""JPEG codec (operators/jpegcodec.py): spec-conformance by round-trip
at bounded error for the DCT processes (the bound is the quantization
error budget), EXACT round-trip for the lossless process, progressive
decoding bit-identical to baseline, plus the decoder paths the encoder
exercises deliberately (4:2:0/4:2:2, restart markers, grayscale, odd
dimensions) and the loud hierarchical/arithmetic rejections that keep
the multimodal quarantine contract honest."""

from __future__ import annotations

import numpy as np
import pytest

from instacart_medallion_lakehouse_spark.operators.jpegcodec import (
    decode_jpeg,
    encode_jpeg,
)


def _gradient(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [xx * 255 / w, yy * 255 / h, (xx + yy) * 255 / (h + w)], axis=-1
    ).astype(np.uint8)


class TestRoundTrip:
    def test_color_gradient_tight_bound(self):
        img = _gradient(40, 56)
        out = decode_jpeg(encode_jpeg(img, quality=95))
        assert out.shape == img.shape and out.dtype == np.uint8
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 4

    def test_flat_color_is_exact(self):
        img = np.full((16, 24, 3), 130, np.uint8)
        assert np.array_equal(decode_jpeg(encode_jpeg(img, 90)), img)

    def test_grayscale(self):
        g = (np.mgrid[0:32, 0:40][0] * 255 / 32).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(g, 95))
        assert out.shape == g.shape  # HxW, no channel axis
        assert np.abs(out.astype(int) - g.astype(int)).max() <= 3

    def test_noise_q100_near_lossless(self):
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, 100))
        # Q100 quant tables are all ones: only colorspace rounding left
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 3

    def test_odd_dimensions_cropped_back(self):
        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, (17, 19, 3), dtype=np.uint8)
        assert decode_jpeg(encode_jpeg(img, 95)).shape == (17, 19, 3)

    def test_quality_degrades_monotonically_in_size(self):
        img = _gradient(48, 48)
        sizes = [len(encode_jpeg(img, q)) for q in (30, 60, 90)]
        assert sizes == sorted(sizes)


class TestDecoderPaths:
    def test_420_subsampling(self):
        img = _gradient(40, 56)
        out = decode_jpeg(encode_jpeg(img, 95, subsample=True))
        assert out.shape == img.shape
        # chroma is box-averaged + replicated: looser but bounded
        assert np.abs(out.astype(float) - img).mean() <= 4

    def test_422_subsampling(self):
        img = _gradient(40, 56)
        out = decode_jpeg(encode_jpeg(img, 95, subsample="422"))
        assert out.shape == img.shape
        assert np.abs(out.astype(float) - img).mean() <= 3
        # odd dims crop back exactly
        rng = np.random.default_rng(3)
        odd = rng.integers(0, 256, (23, 25, 3), dtype=np.uint8)
        assert decode_jpeg(encode_jpeg(odd, 95, subsample="422")).shape == (
            23, 25, 3,
        )

    def test_unknown_subsample_mode_rejected(self):
        with pytest.raises(ValueError, match="subsample"):
            encode_jpeg(_gradient(8, 8), 90, subsample="411")

    def test_420_odd_dimensions(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (19, 21, 3), dtype=np.uint8)
        assert decode_jpeg(encode_jpeg(img, 95, subsample=True)).shape == (
            19, 21, 3,
        )

    def test_restart_markers(self):
        img = _gradient(40, 56)
        enc = encode_jpeg(img, 95, restart_interval=3)
        assert any(
            bytes([0xFF, 0xD0 + i]) in enc for i in range(8)
        )  # RSTn actually emitted
        out = decode_jpeg(enc)
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 4

    def test_restart_plus_subsampling(self):
        img = _gradient(32, 48)
        out = decode_jpeg(encode_jpeg(img, 90, subsample=True,
                                      restart_interval=2))
        assert np.abs(out.astype(float) - img).mean() <= 5


class TestProgressive:
    def test_bit_identical_to_baseline(self):
        """The progressive scan script re-orders the SAME quantized
        coefficients, so SOF2 and SOF0 encodes of one image must decode
        to bit-identical pixels — any desync in spectral selection,
        successive approximation, EOB runs, or correction bits flips
        this."""
        rng = np.random.default_rng(42)
        for h, w, q, sub in (
            (8, 8, 90, False),
            (17, 23, 60, False),
            (40, 56, 90, True),
            (24, 36, 30, "422"),
            (5, 47, 100, False),
        ):
            img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
            base = decode_jpeg(encode_jpeg(img, q, subsample=sub))
            prog = decode_jpeg(
                encode_jpeg(img, q, subsample=sub, progressive=True)
            )
            assert np.array_equal(base, prog), (h, w, q, sub)

    def test_gray_progressive(self):
        g = (np.mgrid[0:32, 0:40][0] * 255 / 32).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(g, 95))
        prog = decode_jpeg(encode_jpeg(g, 95, progressive=True))
        assert np.array_equal(base, prog)

    def test_sof2_marker_emitted(self):
        enc = encode_jpeg(np.zeros((8, 8), np.uint8), 90, progressive=True)
        assert b"\xff\xc2" in enc and b"\xff\xc0" not in enc

    def test_progressive_rejects_restart_markers(self):
        with pytest.raises(ValueError, match="restart"):
            encode_jpeg(
                np.zeros((8, 8), np.uint8), 90,
                progressive=True, restart_interval=2,
            )


class TestRejections:
    def test_arith_and_hierarchical_sofs_raise_not_implemented(self):
        for sof, name in ((0xC9, "SOF9"), (0xC5, "SOF5"), (0xCE, "SOF14")):
            enc = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8), 90))
            i = enc.find(b"\xff\xc0")
            enc[i + 1] = sof
            with pytest.raises(NotImplementedError, match=name):
                decode_jpeg(bytes(enc))

    def test_bad_soi_raises(self):
        with pytest.raises(ValueError, match="SOI"):
            decode_jpeg(b"\x00\x01notajpeg")

    def test_truncated_entropy_raises(self):
        enc = encode_jpeg(_gradient(24, 24), 90)
        with pytest.raises(ValueError):
            decode_jpeg(enc[: len(enc) // 2])


class TestPropertyRoundTrip:
    def test_random_shapes_and_qualities_round_trip_bounded(self):
        """Property sweep: any shape/quality/subsampling combination
        must decode to the original dimensions with error bounded by
        the quantization budget (smooth content, so the bound is
        tight). Deterministic seeds — no flaky tolerance hunting."""
        import itertools

        for seed, (hh, ww), q, sub in itertools.product(
            (0, 1), ((8, 8), (9, 15), (33, 17), (64, 48)),
            (60, 90), (False, True),
        ):
            rng = np.random.default_rng(seed)
            base = rng.integers(0, 256, (2, 2, 3))
            # smooth content: upsample a 2x2 seed bilinearly-ish
            yy, xx = np.mgrid[0:hh, 0:ww]
            fy, fx = yy / max(hh - 1, 1), xx / max(ww - 1, 1)
            img = np.zeros((hh, ww, 3))
            for c in range(3):
                img[:, :, c] = (
                    base[0, 0, c] * (1 - fy) * (1 - fx)
                    + base[0, 1, c] * (1 - fy) * fx
                    + base[1, 0, c] * fy * (1 - fx)
                    + base[1, 1, c] * fy * fx
                )
            img = img.astype(np.uint8)
            out = decode_jpeg(encode_jpeg(img, q, subsample=sub))
            assert out.shape == img.shape, (hh, ww, q, sub)
            err = np.abs(out.astype(float) - img).mean()
            # 4:2:0 error is dominated by chroma box-average+replicate,
            # which on a steep tiny-image gradient dwarfs quantization
            # (measured worst cases: 4:4:4 Q60 3.7 / Q90 1.5; 4:2:0
            # ~10 at either quality on the 8x8 gradient)
            bound = 13 if sub else (6 if q == 60 else 3)
            assert err <= bound, (hh, ww, q, sub, err)


def _scan_segments(payload: bytes):
    """(marker, seg_start, seg_end) for every lengthed segment; skips
    entropy data the way the decoder does (FF00 stuffing, RSTn)."""
    segs = []
    pos = 2
    n = len(payload)
    while pos < n:
        while pos + 1 < n and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
            if marker == 0xD9:
                break
            continue
        seglen = int.from_bytes(payload[pos : pos + 2], "big")
        segs.append((marker, pos, pos + seglen))
        pos += seglen
        if marker == 0xDA:  # skip entropy bytes to the next real marker
            while pos < n:
                if payload[pos] == 0xFF and pos + 1 < n:
                    nxt = payload[pos + 1]
                    if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                        pos += 2
                        continue
                    if nxt == 0xFF:
                        pos += 1
                        continue
                    break
                pos += 1
    return segs


class TestForeignStreamTolerance:
    """T.81 quirks real encoders emit that a strict parser rejects."""

    def test_dc_refinement_scan_with_undefined_td(self):
        """A DC refinement scan (Ss=0, Ah>0) reads one raw bit per
        block and needs NO DC table — patching its Td to an undefined
        table id must not change the decode (T.81 G.1.2.1)."""
        img = _gradient(24, 16)
        enc = bytearray(encode_jpeg(img, 90, progressive=True))
        baseline = decode_jpeg(bytes(enc))
        patched = 0
        for marker, s, e in _scan_segments(bytes(enc)):
            if marker != 0xDA:
                continue
            nc = enc[s + 2]
            params = s + 3 + 2 * nc
            ss, se, ahal = enc[params], enc[params + 1], enc[params + 2]
            if ss == 0 and (ahal >> 4) > 0:  # DC refinement
                for ci in range(nc):
                    td_ta = enc[s + 4 + 2 * ci]
                    enc[s + 4 + 2 * ci] = (0x3 << 4) | (td_ta & 0x0F)
                patched += 1
        assert patched == 1
        assert np.array_equal(decode_jpeg(bytes(enc)), baseline)

    def test_ff_fill_bytes_before_markers(self):
        """B.1.1.2 allows any marker to be preceded by 0xFF fill bytes
        — both between segments and at the end of entropy data."""
        for progressive in (False, True):
            img = _gradient(17, 23)
            enc = encode_jpeg(img, 85, progressive=progressive)
            baseline = decode_jpeg(enc)
            # insert fill bytes before EVERY marker segment boundary
            segs = _scan_segments(enc)
            padded = bytearray()
            prev = 0
            for _, s, _e in segs:
                # s-2 points at the 0xFF of this segment's marker
                padded += enc[prev : s - 2] + b"\xff\xff"
                prev = s - 2
            padded += enc[prev:]
            # and before the EOI that terminates the last entropy run
            assert padded.endswith(b"\xff\xd9")
            padded = padded[:-2] + b"\xff\xff\xff\xd9"
            assert np.array_equal(decode_jpeg(bytes(padded)), baseline)


class TestSliceEntropyEquivalence:
    """The vectorized FF-position slicer must match the per-byte spec
    walker on randomized stuffing/RST/fill/EOI streams."""

    @staticmethod
    def _reference(payload, pos):
        n = len(payload)
        intervals = []
        cur = bytearray()
        i = pos
        while i < n:
            b = payload[i]
            if b == 0xFF:
                nxt = payload[i + 1] if i + 1 < n else 0xD9
                if nxt == 0x00:
                    cur.append(0xFF)
                    i += 2
                    continue
                if 0xD0 <= nxt <= 0xD7:
                    intervals.append(bytes(cur))
                    cur = bytearray()
                    i += 2
                    continue
                if nxt == 0xFF:
                    i += 1
                    continue
                break
            cur.append(b)
            i += 1
        intervals.append(bytes(cur))
        return intervals, i

    def test_randomized_equivalence(self):
        from instacart_medallion_lakehouse_spark.operators.jpegcodec import (
            _slice_entropy,
        )

        rng = np.random.RandomState(4)
        special = [
            b"\xff\x00", b"\xff\xd0", b"\xff\xd7", b"\xff\xff\xd9",
            b"\xff\xd9", b"\xff", b"\x00", b"\xab",
        ]
        for trial in range(500):
            parts = [
                bytes(rng.randint(0, 256, rng.randint(0, 12), dtype=np.uint8))
            ]
            for _ in range(rng.randint(0, 8)):
                parts.append(special[rng.randint(0, len(special))])
                parts.append(
                    bytes(rng.randint(0, 256, rng.randint(0, 6), dtype=np.uint8))
                )
            payload = b"".join(parts)
            pos = rng.randint(0, max(1, len(payload)))
            assert self._reference(payload, pos) == _slice_entropy(
                payload, pos
            ), (trial, payload.hex(), pos)


class TestLossless:
    """SOF3 (T.81 Annex H): decode returns the input EXACTLY — the
    round-trip identity is the whole contract."""

    def test_exact_roundtrip_all_predictors(self):
        rng = np.random.RandomState(2)
        for shape in [(7, 5), (16, 24, 3), (1, 1), (2, 1, 3), (3, 9, 3)]:
            img = rng.randint(0, 256, shape, dtype=np.uint8)
            for pred in range(1, 8):
                out = decode_jpeg(
                    encode_jpeg(img, lossless=True, predictor=pred)
                )
                assert out.shape == img.shape
                assert np.array_equal(out, img), (shape, pred)

    def test_exact_roundtrip_with_restarts(self):
        rng = np.random.RandomState(5)
        img = rng.randint(0, 256, (9, 11, 3), dtype=np.uint8)
        for ri in (1, 2, 5, 50):
            enc = encode_jpeg(
                img, lossless=True, predictor=4, restart_interval=ri
            )
            if ri < 99:
                assert b"\xff\xd0" in enc  # RST0 actually emitted
            assert np.array_equal(decode_jpeg(enc), img), ri

    def test_gradient_compresses_under_predictor(self):
        # a smooth ramp has tiny diffs under predictor 1: the lossless
        # stream must be far smaller than the raw bytes
        img = _gradient(64, 64)
        enc = encode_jpeg(img, lossless=True, predictor=1)
        assert len(enc) < img.size  # beats raw despite Huffman headers
        assert np.array_equal(decode_jpeg(enc), img)

    def test_components_are_raw_not_ycbcr(self):
        # a pure-red image must come back pure red (no color transform)
        img = np.zeros((4, 4, 3), np.uint8)
        img[:, :, 0] = 200
        out = decode_jpeg(encode_jpeg(img, lossless=True))
        assert np.array_equal(out, img)

    def test_bad_predictor_rejected(self):
        img = np.zeros((4, 4), np.uint8)
        with pytest.raises(ValueError, match="predictor"):
            encode_jpeg(img, lossless=True, predictor=0)
        with pytest.raises(ValueError, match="predictor"):
            encode_jpeg(img, lossless=True, predictor=8)
        with pytest.raises(ValueError, match="exclusive"):
            encode_jpeg(img, lossless=True, progressive=True)

    def test_truncated_lossless_raises(self):
        enc = encode_jpeg(
            np.full((8, 8), 200, np.uint8), lossless=True
        )
        with pytest.raises(ValueError):
            decode_jpeg(enc[: len(enc) // 2])

    def test_dispatches_through_imagecodec_decode(self):
        from instacart_medallion_lakehouse_spark.operators.imagecodec import (
            decode,
        )

        img = _gradient(10, 12)
        enc = encode_jpeg(img, lossless=True, predictor=7)
        assert np.array_equal(decode(enc), img)
