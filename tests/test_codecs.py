"""Pure-stdlib media codecs (functions/codecs.py) + the codec="real"
multimodal stages.  Ray-free: stages are called as plain batch fns.

PNG decode is property-tested as the inverse of the minimal encoder
across all five filter types and gray/RGB/RGBA layouts (the encoder
and decoder implement the two DIRECTIONS of the spec's filter
recurrences independently — Sub/Up vectorized one way, inverted the
other — so round-trip equality is a real check, not a tautology).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from searchenginesimple_ray.functions.codecs import (decode_png,
                                                     decode_wav,
                                                     decode_y4m,
                                                     encode_png,
                                                     encode_wav,
                                                     encode_y4m,
                                                     wav_full_scale)
from searchenginesimple_ray.stages.multimodal import (AudioFrameStage,
                                                      ImageDecodeStage,
                                                      VideoFrameSampleStage)


class TestPng:
    @given(st.integers(1, 17), st.integers(1, 13), st.integers(0, 4),
           st.integers(0, 2**32 - 1))
    @settings(max_examples=60, deadline=None)
    def test_gray_roundtrip_all_filters(self, w, h, filt, seed):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        got = decode_png(encode_png(img, filter_type=filt))
        assert got.shape == (h, w)
        assert np.array_equal(got, img.astype(np.float64))

    @given(st.integers(1, 9), st.integers(1, 9), st.integers(0, 4),
           st.sampled_from([3, 4]), st.integers(0, 2**32 - 1))
    @settings(max_examples=40, deadline=None)
    def test_color_roundtrip(self, w, h, filt, ch, seed):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
        got = decode_png(encode_png(None, filter_type=filt, color=px))
        p = px.astype(np.int64)
        want = (299 * p[:, :, 0] + 587 * p[:, :, 1]
                + 114 * p[:, :, 2]) / 1000.0
        assert np.array_equal(got, want)

    def test_mixed_filters_per_line(self):
        # hand-build a PNG whose lines cycle filters 0..4
        import struct
        import zlib
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (5, 6), dtype=np.uint8).astype(np.int64)
        lines, prev = [], np.zeros(6, np.int64)
        for y in range(5):
            cur = img[y]
            f = y % 5
            left = np.concatenate([[0], cur[:-1]])
            ul = np.concatenate([[0], prev[:-1]])
            if f == 0:
                enc = cur
            elif f == 1:
                enc = (cur - left) % 256
            elif f == 2:
                enc = (cur - prev) % 256
            elif f == 3:
                enc = (cur - (left + prev) // 2) % 256
            else:
                p = left + prev - ul
                pred = np.where(
                    (np.abs(p - left) <= np.abs(p - prev))
                    & (np.abs(p - left) <= np.abs(p - ul)), left,
                    np.where(np.abs(p - prev) <= np.abs(p - ul),
                             prev, ul))
                enc = (cur - pred) % 256
            lines.append(bytes([f]) + enc.astype(np.uint8).tobytes())
            prev = cur

        def chunk(t, d):
            return (struct.pack(">I", len(d)) + t + d
                    + struct.pack(">I", zlib.crc32(t + d)))
        buf = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 5, 8, 0,
                                            0, 0, 0))
               + chunk(b"IDAT", zlib.compress(b"".join(lines)))
               + chunk(b"IEND", b""))
        assert np.array_equal(decode_png(buf), img.astype(np.float64))

    def test_rejects_garbage(self):
        with pytest.raises(ValueError):
            decode_png(b"JFIF not a png")
        with pytest.raises(ValueError):
            decode_png(b"")


class TestWav:
    @given(st.integers(1, 400), st.sampled_from([8, 16]),
           st.sampled_from([1, 2]), st.integers(0, 2**32 - 1))
    @settings(max_examples=40, deadline=None)
    def test_roundtrip(self, n, bits, ch, seed):
        rng = np.random.default_rng(seed)
        if bits == 8:
            s = rng.integers(0, 256, (n, ch)).astype(np.uint8)
            want = (s.astype(np.int64) - 128).sum(axis=1)
        else:
            s = rng.integers(-32768, 32768, (n, ch)).astype(np.int16)
            want = s.astype(np.int64).sum(axis=1)
        buf = encode_wav(s, rate=8000, bits=bits, n_channels=ch)
        rate, dev = decode_wav(buf)
        assert rate == 8000
        assert np.array_equal(dev, want)
        assert wav_full_scale(buf) == ch * (128 if bits == 8 else 32768)

    def test_rejects_garbage(self):
        with pytest.raises(ValueError):
            decode_wav(b"OggS not a wav")


class TestY4m:
    @given(st.integers(1, 12), st.integers(1, 12), st.integers(1, 5),
           st.sampled_from(["420", "422", "444", "mono"]),
           st.integers(0, 2**32 - 1))
    @settings(max_examples=40, deadline=None)
    def test_roundtrip(self, w, h, nf, cmode, seed):
        rng = np.random.default_rng(seed)
        frames = [rng.integers(0, 256, (h, w), dtype=np.uint8)
                  for _ in range(nf)]
        gw, gh, got = decode_y4m(encode_y4m(frames, cmode))
        assert (gw, gh, len(got)) == (w, h, nf)
        for a, b in zip(got, frames):
            assert np.array_equal(a, b)

    def test_rejects_garbage(self):
        with pytest.raises(ValueError):
            decode_y4m(b"RIFF nope")


class TestRealCodecStages:
    def test_image_stage_real_png(self):
        rng = np.random.default_rng(3)
        imgs = [rng.integers(0, 256, (8, 11), dtype=np.uint8),
                rng.integers(0, 256, (4, 4), dtype=np.uint8)]
        batch = pa.table({
            "media_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array(
                [encode_png(i, filter_type=2) for i in imgs],
                pa.binary()),
        })
        out = ImageDecodeStage(codec="real")(batch)
        for i, img in enumerate(imgs):
            f = img.astype(np.float64)
            assert out["img_mean"][i].as_py() == f.sum() / f.size
            gx = np.abs(np.diff(f, axis=1)).mean()
            gy = np.abs(np.diff(f, axis=0)).mean()
            assert out["img_edge_energy"][i].as_py() == gx + gy

    def test_audio_stage_real_wav(self):
        rng = np.random.default_rng(4)
        s = rng.integers(-32768, 32768, 5000).astype(np.int16)
        batch = pa.table({
            "media_id": pa.array([1], pa.int64()),
            "payload": pa.array([encode_wav(s, bits=16)], pa.binary()),
        })
        out = AudioFrameStage(codec="real", frame_len=1024, hop=512)(batch)
        d = s.astype(np.int64)
        ssq0 = int((d[:1024] * d[:1024]).sum())
        want0 = np.sqrt(ssq0 / (1024 * 32768.0 ** 2))
        assert out["n_frames"][0].as_py() == len(
            range(0, 5000 - 1024 + 1, 512))
        assert out["frame_rms"][0].as_py()[0] == want0

    def test_video_stage_real_y4m(self):
        rng = np.random.default_rng(5)
        frames = [rng.integers(0, 256, (6, 8), dtype=np.uint8)
                  for _ in range(7)]
        batch = pa.table({
            "media_id": pa.array([1], pa.int64()),
            "payload": pa.array([encode_y4m(frames)], pa.binary()),
        })
        out = VideoFrameSampleStage(codec="real", stride=2,
                                    max_frames=16)(batch)
        sel = frames[::2]
        assert out["n_sampled"][0].as_py() == len(sel)
        want = [f.astype(np.int64).sum() / 48.0 for f in sel]
        assert out["frame_mean"][0].as_py() == want

    def test_real_rejects_non_container_payloads(self):
        batch = pa.table({
            "media_id": pa.array([1], pa.int64()),
            "payload": pa.array([b"\xff\xd8\xff JPEG-ish"], pa.binary()),
        })
        with pytest.raises(ValueError):
            ImageDecodeStage(codec="real")(batch)

    def test_unknown_codec_rejected(self):
        with pytest.raises(ValueError):
            ImageDecodeStage(codec="pillow")
