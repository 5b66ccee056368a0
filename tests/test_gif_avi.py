"""GIF codec (operators/gifcodec.py), AVI/MJPEG codec
(operators/avicodec.py), and their multimodal integration: LZW
round-trips (incl. the 4096-entry dict reset and the width schedule),
interlace, local palettes, transparency/disposal composition, RIFF
demux with word padding, lossless-JPEG exact frame round-trips, the
extended sample_frames dispatch, and the Spark fixture/extract pairs
behind the gif_frame_stats / avi_frame_stats oracle queries."""

from __future__ import annotations

import numpy as np
import pytest

from instacart_medallion_lakehouse_spark.operators import multimodal
from instacart_medallion_lakehouse_spark.operators.avicodec import (
    encode_avi_mjpeg,
    iter_avi_frames,
    parse_avi,
)
from instacart_medallion_lakehouse_spark.operators.gifcodec import (
    decode_gif,
    decode_gif_frames,
    encode_gif,
    lzw_decode,
    lzw_encode,
    parse_gif,
)
from instacart_medallion_lakehouse_spark.operators.imagecodec import decode
from instacart_medallion_lakehouse_spark.operators.jpegcodec import (
    decode_jpeg,
    encode_jpeg,
)

PAL = np.array(
    [[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]], np.uint8
)


class TestLZW:
    def test_roundtrip_fuzz(self):
        rng = np.random.RandomState(7)
        for _ in range(60):
            n = rng.randint(1, 4000)
            nsym = int(rng.choice([2, 3, 4, 7, 16, 64, 256]))
            mcs = max(2, int(nsym - 1).bit_length())
            data = rng.randint(0, nsym, n).astype(np.uint8).tobytes()
            assert lzw_decode(lzw_encode(data, mcs), mcs, n) == data

    def test_dict_reset_at_4096(self):
        # long low-entropy stream forces the table past 4096 -> CLEAR
        data = (np.arange(120_000) % 3).astype(np.uint8).tobytes()
        enc = lzw_encode(data, 2)
        assert lzw_decode(enc, 2, len(data)) == data

    def test_truncated_stream_raises(self):
        data = bytes(100)
        enc = lzw_encode(data, 2)
        with pytest.raises(ValueError, match="truncated|early"):
            lzw_decode(enc[: len(enc) // 2], 2, len(data))


class TestGif:
    def _frames(self, n=4, h=13, w=17):
        return [
            ((np.add.outer(np.arange(h), np.arange(w)) + k) % 4).astype(
                np.uint8
            )
            for k in range(n)
        ]

    def test_roundtrip_global_local_interlace(self):
        lpal = np.array(
            [[1, 2, 3], [4, 5, 6], [7, 8, 9], [100, 110, 120]], np.uint8
        )
        frames = self._frames()
        opts = [
            {"interlace": True},
            {"palette": lpal},
            {"interlace": True, "palette": lpal, "delay_cs": 4},
            {},
        ]
        payload = encode_gif(frames, PAL, frame_opts=opts)
        meta = parse_gif(payload)
        assert meta["version"] == "89a"
        assert (meta["width"], meta["height"]) == (17, 13)
        assert meta["n_frames"] == 4
        assert meta["frames"][0]["interlace"]
        decoded = decode_gif_frames(payload)
        for k, (f, o) in enumerate(zip(frames, opts)):
            p = lpal if "palette" in o else PAL
            assert (decoded[k] == p[f]).all()

    def test_transparency_and_disposal(self):
        base = np.zeros((8, 8), np.uint8)
        f2 = np.full((4, 4), 2, np.uint8)
        f2[0, 0] = 3
        opts = [
            {"disposal": 1},
            {"left": 2, "top": 2, "transparent": 3, "disposal": 3},
            {"disposal": 1},
        ]
        payload = encode_gif([base, f2, base], PAL, frame_opts=opts)
        dec = decode_gif_frames(payload)
        exp0 = PAL[base]
        assert (dec[0] == exp0).all()
        exp1 = exp0.copy()
        exp1[2:6, 2:6] = PAL[f2]
        exp1[2, 2] = exp0[2, 2]  # transparent pixel keeps the canvas
        assert (dec[1] == exp1).all()
        # disposal 3 restored the canvas before frame 3 drew
        assert (dec[2] == exp0).all()

    def test_imagecodec_dispatch_first_frame(self):
        payload = encode_gif(self._frames(2), PAL)
        assert (decode(payload) == decode_gif(payload)).all()

    def test_corrupt_raises(self):
        payload = encode_gif(self._frames(1), PAL)
        with pytest.raises(ValueError):
            decode_gif(payload[:20])  # truncated mid-descriptor
        with pytest.raises(ValueError):
            decode_gif(b"GIF89a" + b"\x00" * 5)

    def test_sniff(self):
        payload = encode_gif(self._frames(1), PAL)
        assert multimodal.sniff_format(payload) == "gif"

    def test_sample_frames_gif(self):
        frames = self._frames(5)
        payload = encode_gif(frames, PAL)
        pngs = multimodal.sample_frames(payload, every_n=2)
        assert len(pngs) == 3  # frames 0, 2, 4
        assert (decode(pngs[1]) == PAL[frames[2]]).all()


class TestAvi:
    def _rgb_frames(self, n=4, h=12, w=16):
        rng = np.random.RandomState(11)
        return [
            rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
            for _ in range(n)
        ]

    def test_lossless_roundtrip_exact(self):
        frames = self._rgb_frames()
        avi = encode_avi_mjpeg(
            [encode_jpeg(f, lossless=True) for f in frames], 16, 12,
            us_per_frame=33_333,
        )
        meta = parse_avi(avi)
        assert (meta["width"], meta["height"]) == (16, 12)
        assert meta["n_frames"] == meta["avih_frames"] == 4
        assert meta["fourcc"] == "MJPG"
        assert meta["us_per_frame"] == 33_333
        for a, b in zip(iter_avi_frames(avi), frames):
            assert (a == b).all()

    def test_baseline_demux_equals_direct_decode(self):
        frames = self._rgb_frames(3)
        jpegs = [encode_jpeg(f, quality=85) for f in frames]
        avi = encode_avi_mjpeg(jpegs, 16, 12)
        for a, j in zip(iter_avi_frames(avi), jpegs):
            d = decode_jpeg(j)
            if d.ndim == 2:
                d = d[:, :, None]
            assert (a == d).all()

    def test_step_skips_decode(self):
        frames = self._rgb_frames(6)
        avi = encode_avi_mjpeg(
            [encode_jpeg(f, lossless=True) for f in frames], 16, 12
        )
        sampled = list(iter_avi_frames(avi, step=3))
        assert len(sampled) == 2
        assert (sampled[1] == frames[3]).all()

    def test_word_padding(self):
        # odd-length frame chunks must be even-padded without breaking
        # the walk; SOF3 streams routinely come out odd-length
        frames = self._rgb_frames(5)
        jpegs = [encode_jpeg(f, lossless=True) for f in frames]
        assert any(len(j) & 1 for j in jpegs)
        avi = encode_avi_mjpeg(jpegs, 16, 12)
        assert parse_avi(avi)["n_frames"] == 5

    def test_corrupt_raises(self):
        frames = self._rgb_frames(1)
        avi = encode_avi_mjpeg(
            [encode_jpeg(frames[0], lossless=True)], 16, 12
        )
        with pytest.raises(ValueError):
            parse_avi(avi[:16])
        with pytest.raises(ValueError):
            parse_avi(b"RIFF\x04\x00\x00\x00WAVE")

    def test_sniff_and_sample_frames(self):
        frames = self._rgb_frames(4)
        avi = encode_avi_mjpeg(
            [encode_jpeg(f, lossless=True) for f in frames], 16, 12
        )
        assert multimodal.sniff_format(avi) == "avi"
        pngs = multimodal.sample_frames(avi, every_n=2)
        assert len(pngs) == 2
        assert (decode(pngs[1]) == frames[2]).all()

    def test_headeronly_mp4_raises_value_error(self):
        # r11: mp4 routes through the real sample-table walk now; a
        # probe-only payload (no moov) fails the walk loudly
        with pytest.raises(ValueError):
            multimodal.sample_frames(
                b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 32
            )


class TestMp4Mjpeg:
    """MJPEG-in-MP4 demux/mux (operators/mp4codec.py, r11): the
    stsd/stts/stsc/stsz/stco sample-table walk, exact lossless frame
    round-trips, step sampling, the stsc two-per-chunk run map, and
    the loud inter-frame boundary."""

    def _payload(self, n=4, h=12, w=16, lossless=True):
        rng = np.random.RandomState(7)
        frames = [
            rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
            for _ in range(n)
        ]
        from instacart_medallion_lakehouse_spark.operators.mp4codec import (
            encode_mp4_mjpeg,
        )

        jpegs = [encode_jpeg(f, lossless=lossless) for f in frames]
        return frames, encode_mp4_mjpeg(jpegs, w, h)

    def test_lossless_roundtrip_exact(self):
        from instacart_medallion_lakehouse_spark.operators.mp4codec import (
            iter_mp4_frames,
            parse_mp4_samples,
        )

        frames, mp4 = self._payload()
        meta = parse_mp4_samples(mp4)
        assert (meta["width"], meta["height"]) == (16, 12)
        assert meta["fourcc"] == "jpeg"
        assert len(meta["samples"]) == 4
        assert meta["durations"] == [25, 25, 25, 25]
        for a, b in zip(iter_mp4_frames(mp4), frames):
            assert (a == b).all()

    def test_odd_count_second_stsc_run(self):
        # 5 samples -> chunks of 2,2,1: the second stsc run must be
        # honored or the last sample's byte range is wrong
        from instacart_medallion_lakehouse_spark.operators.mp4codec import (
            iter_mp4_frames,
            parse_mp4_samples,
        )

        frames, mp4 = self._payload(n=5)
        meta = parse_mp4_samples(mp4)
        assert len(meta["samples"]) == 5
        dec = list(iter_mp4_frames(mp4))
        assert (dec[4] == frames[4]).all()

    def test_step_skips_decode(self):
        from instacart_medallion_lakehouse_spark.operators.mp4codec import (
            iter_mp4_frames,
        )

        frames, mp4 = self._payload(n=6)
        sampled = list(iter_mp4_frames(mp4, step=3))
        assert len(sampled) == 2
        assert (sampled[1] == frames[3]).all()

    def test_interframe_codec_raises_loudly(self):
        from instacart_medallion_lakehouse_spark.operators.mp4codec import (
            iter_mp4_frames,
        )

        _, mp4 = self._payload(n=2)
        with pytest.raises(NotImplementedError, match="avc1"):
            list(iter_mp4_frames(mp4.replace(b"jpeg", b"avc1")))

    def test_corrupt_raises(self):
        from instacart_medallion_lakehouse_spark.operators.mp4codec import (
            parse_mp4_samples,
        )

        _, mp4 = self._payload(n=1)
        with pytest.raises(ValueError):
            parse_mp4_samples(mp4[:40])

    def test_sample_frames_and_probe_agree(self):
        from instacart_medallion_lakehouse_spark.operators.mp4probe import (
            parse_mp4,
        )

        frames, mp4 = self._payload(n=4)
        assert multimodal.sniff_format(mp4) == "mp4"
        pngs = multimodal.sample_frames(mp4, every_n=2)
        assert len(pngs) == 2
        assert (decode(pngs[1]) == frames[2]).all()
        assert parse_mp4(mp4)["n_tracks"] == 1


class TestSparkIntegration:
    def test_gif_frame_stats_pair(self, spark):
        docs = spark.range(0, 40).toDF("doc_id")
        stats = multimodal.extract_gif_frame_stats(
            multimodal.with_gif_media(docs)
        ).collect()
        by_key = {(r.doc_id, r.frame_idx): r for r in stats}
        for d in range(40):
            w, h, n = 2 + d % 24, 2 + d % 17, 1 + d % 5
            for k in range(n):
                r = by_key[(d, k)]
                assert (r.width, r.height) == (w, h)
                ys = np.arange(h)
                if k % 3 == 2:
                    rr = (5 * d + 19 * ((ys + k) % 4)) % 256
                else:
                    rr = (7 * d + 53 * ((ys + k) % 4)) % 256
                assert r.sum_r == w * int(rr.sum())
                assert r.ywsum_r == w * int((ys * rr).sum())

    def test_avi_frame_stats_pair(self, spark):
        docs = spark.range(0, 30).toDF("doc_id")
        stats = multimodal.extract_avi_frame_stats(
            multimodal.with_avi_media(docs)
        ).collect()
        by_key = {(r.doc_id, r.frame_idx): r for r in stats}
        for d in range(30):
            w, h, n = 3 + d % 13, 2 + d % 11, 1 + d % 4
            for k in range(n):
                r = by_key[(d, k)]
                assert (r.width, r.height) == (w, h)
                ys = np.arange(h)
                rr = (3 * d + 11 * k + 2 * ys) % 256
                gg = (5 * d + 7 * k + 3 * ys) % 256
                assert r.sum_r == w * int(rr.sum())
                assert r.sum_g == w * int(gg.sum())
                assert r.ywsum_r == w * int((ys * rr).sum())

    def test_triage_routes_gif_and_avi_ok(self, spark):
        from pyspark.sql import functions as F

        gif = encode_gif(
            [np.zeros((4, 4), np.uint8)], PAL[:2]
        )
        avi = encode_avi_mjpeg(
            [encode_jpeg(np.zeros((4, 4, 3), np.uint8), lossless=True)],
            4, 4,
        )
        df = spark.createDataFrame(
            [(0, bytearray(gif)), (1, bytearray(avi))],
            "doc_id long, payload binary",
        )
        tri = {
            r.doc_id: (r.format, r.status)
            for r in multimodal.triage_media(df).collect()
        }
        assert tri[0] == ("gif", "ok")
        assert tri[1] == ("avi", "ok")
