"""Property-based tests (hypothesis) for the round-9 codec family:
LZW and full-GIF round-trips over arbitrary index streams and
palette/interlace/geometry combinations, AVI/MJPEG lossless mux/demux
identity, IMA ADPCM decoder invariants (clamp bounds, state
determinism, prefix property), and archive walks against
adversarially-shaped member lists. These complement the fixed-seed
fuzz in test_gif_avi.py/test_audioprobe.py with minimized
counterexamples when a codec edge breaks."""

from __future__ import annotations

import io
import tarfile
import zipfile

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from instacart_medallion_lakehouse_spark.operators.audioprobe import (
    ima_adpcm_decode,
)
from instacart_medallion_lakehouse_spark.operators.archiveprobe import (
    parse_tar,
    parse_zip,
)
from instacart_medallion_lakehouse_spark.operators.avicodec import (
    encode_avi_mjpeg,
    iter_avi_frames,
    parse_avi,
)
from instacart_medallion_lakehouse_spark.operators.gifcodec import (
    decode_gif_frames,
    encode_gif,
    lzw_decode,
    lzw_encode,
)
from instacart_medallion_lakehouse_spark.operators.jpegcodec import (
    encode_jpeg,
)


class TestLzwProperties:
    @settings(max_examples=60, deadline=None)
    @given(
        data=st.binary(min_size=1, max_size=3000),
        mcs=st.integers(min_value=2, max_value=8),
    )
    def test_roundtrip_any_bytes(self, data: bytes, mcs: int):
        # clamp symbols into the alphabet for this code size
        alphabet = 1 << mcs
        clamped = bytes(b % alphabet for b in data)
        enc = lzw_encode(clamped, mcs)
        assert lzw_decode(enc, mcs, len(clamped)) == clamped

    @settings(max_examples=20, deadline=None)
    @given(
        run=st.integers(min_value=1, max_value=200),
        nsym=st.integers(min_value=2, max_value=4),
        reps=st.integers(min_value=1, max_value=40),
    )
    def test_repetitive_streams(self, run: int, nsym: int, reps: int):
        # long runs grow the dictionary fastest — the width-schedule
        # edge cases live here
        unit = bytes(
            (i // run) % nsym for i in range(run * nsym)
        )
        data = unit * reps
        enc = lzw_encode(data, 2 if nsym <= 4 else 3)
        assert lzw_decode(enc, 2 if nsym <= 4 else 3, len(data)) == data


class TestGifProperties:
    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=40),
        h=st.integers(min_value=1, max_value=30),
        n=st.integers(min_value=1, max_value=4),
        interlace_mask=st.integers(min_value=0, max_value=15),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def test_full_roundtrip(self, w, h, n, interlace_mask, seed):
        rng = np.random.RandomState(seed)
        pal = rng.randint(0, 256, (4, 3)).astype(np.uint8)
        frames = [
            rng.randint(0, 4, (h, w)).astype(np.uint8) for _ in range(n)
        ]
        opts = [
            {"interlace": bool(interlace_mask & (1 << k))}
            for k in range(n)
        ]
        payload = encode_gif(frames, pal, frame_opts=opts)
        decoded = decode_gif_frames(payload)
        assert len(decoded) == n
        for f, out in zip(frames, decoded):
            assert (out == pal[f]).all()


class TestAviProperties:
    @settings(max_examples=15, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=24),
        h=st.integers(min_value=1, max_value=20),
        n=st.integers(min_value=1, max_value=4),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def test_lossless_mux_demux_identity(self, w, h, n, seed):
        rng = np.random.RandomState(seed)
        frames = [
            rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
            for _ in range(n)
        ]
        avi = encode_avi_mjpeg(
            [encode_jpeg(f, lossless=True) for f in frames], w, h
        )
        meta = parse_avi(avi)
        assert meta["n_frames"] == n
        assert (meta["width"], meta["height"]) == (w, h)
        for a, b in zip(iter_avi_frames(avi), frames):
            assert (a == b).all()


class TestAdpcmProperties:
    @settings(max_examples=40, deadline=None)
    @given(
        nibbles=st.lists(
            st.integers(min_value=0, max_value=15), min_size=1,
            max_size=400,
        ),
        pred=st.integers(min_value=-32768, max_value=32767),
        idx=st.integers(min_value=0, max_value=88),
    )
    def test_bounds_and_prefix_property(self, nibbles, pred, idx):
        out = ima_adpcm_decode(nibbles, pred, idx)
        assert len(out) == len(nibbles)
        assert all(-32768 <= s <= 32767 for s in out)
        # prefix property: decoding a prefix yields the same samples
        # (the state is a pure function of the consumed codes)
        half = len(nibbles) // 2
        if half:
            assert ima_adpcm_decode(nibbles[:half], pred, idx) == out[:half]

    @settings(max_examples=20, deadline=None)
    @given(
        nibbles=st.lists(
            st.integers(min_value=0, max_value=15), min_size=1,
            max_size=100,
        )
    )
    def test_determinism(self, nibbles):
        a = ima_adpcm_decode(nibbles, 0, 40)
        b = ima_adpcm_decode(list(nibbles), 0, 40)
        assert a == b


class TestArchiveProperties:
    @settings(max_examples=20, deadline=None)
    @given(
        sizes=st.lists(
            st.integers(min_value=0, max_value=1200), min_size=1,
            max_size=8,
        ),
        stored_mask=st.integers(min_value=0, max_value=255),
    )
    def test_zip_member_accounting(self, sizes, stored_mask):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            for i, size in enumerate(sizes):
                zi = zipfile.ZipInfo(
                    f"member_{i}.bin", date_time=(1980, 1, 1, 0, 0, 0)
                )
                z.writestr(
                    zi,
                    bytes(j % 251 for j in range(size)),
                    compress_type=(
                        zipfile.ZIP_STORED
                        if stored_mask & (1 << i)
                        else zipfile.ZIP_DEFLATED
                    ),
                )
        m = parse_zip(buf.getvalue())
        assert m["n_members"] == len(sizes)
        assert m["total_uncompressed"] == sum(sizes)
        assert m["n_stored"] == sum(
            1 for i in range(len(sizes)) if stored_mask & (1 << i)
        )

    @settings(max_examples=20, deadline=None)
    @given(
        sizes=st.lists(
            st.integers(min_value=0, max_value=1500), min_size=1,
            max_size=6,
        )
    )
    def test_tar_member_accounting(self, sizes):
        # sizes straddling 512-block boundaries are the walk's edge
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as t:
            for i, size in enumerate(sizes):
                ti = tarfile.TarInfo(f"f{i}")
                ti.size = size
                ti.mtime = 0
                t.addfile(ti, io.BytesIO(b"q" * size))
        m = parse_tar(buf.getvalue())
        assert m["n_members"] == len(sizes)
        assert m["total_file_bytes"] == sum(sizes)
