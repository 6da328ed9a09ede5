"""Multimodal (image/audio/video) column plumbing.

Media ride as opaque ``binary`` columns with typed metadata columns
(``media_type``, ``width``/``height`` or ``sample_rate``/``n_samples``).
The Ray-side plumbing — schema, actor-pool stage signature, batch
sizing, output layout — is real and tested, with two codec modes:

- ``codec="fake"`` (default): a deterministic fake decoder derives
  pixel/sample arrays from the payload bytes (byte stream reshaped /
  tiled to the declared dims) — this is the oracle-checked path, so
  the driver's SQL can reproduce every statistic exactly;
- ``codec="real"``: pure-stdlib decoders from ``functions/codecs.py``
  — PNG (zlib + filter inversion) for images, RIFF PCM WAV for audio,
  YUV4MPEG2 for video.  Formats needing external libraries (JPEG,
  MP3, H.264, ...) raise ``ValueError`` from the parsers; a
  PIL/libsndfile/ffmpeg call plugs in at the same seam on a cluster
  image that ships them.

Batch-size guidance (SCALE): media payloads are large — callers should
pass a small ``batch_size`` (e.g. 16-64) so ``batch_size x concurrency
x payload`` stays inside the worker heap; blocks of binary columns are
already capped by ``DataContext.target_max_block_size``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _require_positive_ints(batch: pa.Table, col: str) -> np.ndarray:
    """Media dimension columns must be non-null positive ints — a null
    silently promotes to float NaN (then int() crashes mid-task) and a
    zero divides the stats; fail with the column named instead."""
    c = batch[col]
    if c.null_count:
        raise ValueError(f"{col!r} contains {c.null_count} null(s); "
                         "media dimensions must be non-null")
    v = c.to_numpy(zero_copy_only=False).astype(np.int64)
    if (v <= 0).any():
        raise ValueError(f"{col!r} contains non-positive values; "
                         "media dimensions must be >= 1")
    return v


class ImageDecodeStage:
    """binary payload -> decoded (h, w) feature summary columns.

    Output columns: ``img_mean``, ``img_std``, ``img_edge_energy``
    (float64) + passthrough.  Real decode is a stub (see module doc).
    """

    def __init__(self, payload_col: str = "payload", width_col: str = "width",
                 height_col: str = "height", codec: str = "fake",
                 resize_to: tuple[int, int] | None = None):
        if codec not in ("fake", "real"):
            raise ValueError(f"unknown codec {codec!r}")
        # codec="real": pure-stdlib PNG decode (functions/codecs.py) —
        # dims come from IHDR, so the width/height metadata columns are
        # neither required nor validated on this path
        self.codec = codec
        self.payload_col = payload_col
        self.width_col = width_col
        self.height_col = height_col
        self.resize_to = resize_to

    def _decode_fake(self, buf: bytes, w: int, h: int) -> np.ndarray:
        """Deterministic fake decode: tile payload bytes to (h, w)."""
        raw = np.frombuffer(buf, dtype=np.uint8)
        need = w * h
        if raw.size == 0:
            raw = np.zeros(1, dtype=np.uint8)
        reps = int(np.ceil(need / raw.size))
        return np.tile(raw, reps)[:need].reshape(h, w).astype(np.float64)

    @staticmethod
    def _resize(img: np.ndarray, to: tuple[int, int]) -> np.ndarray:
        """Nearest-neighbour resize (pure numpy; real impl swaps in a
        proper resampler)."""
        th, tw = to
        h, w = img.shape
        ri = (np.arange(th) * h // th).clip(0, h - 1)
        ci = (np.arange(tw) * w // tw).clip(0, w - 1)
        return img[np.ix_(ri, ci)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        if self.codec == "fake":
            ws = _require_positive_ints(batch, self.width_col)
            hs = _require_positive_ints(batch, self.height_col)
        n = len(payloads)
        mean = np.zeros(n)
        std = np.zeros(n)
        edge = np.zeros(n)
        for i, buf in enumerate(payloads):
            if self.codec == "real":
                from ..functions.codecs import decode_png
                img = decode_png(buf or b"")
            else:
                img = self._decode_fake(buf or b"", int(ws[i]),
                                        int(hs[i]))
            if self.resize_to:
                img = self._resize(img, self.resize_to)
            # mean/std via exact integer sums (pixel values are uint8 ->
            # float64 sums are exact), E[x^2] - mean^2 form: the same
            # arithmetic is expressible in SQL, so the driver oracle can
            # reproduce these to the last bit (np.std's two-pass form
            # rounds differently)
            need = img.size
            total = img.sum()
            total2 = (img * img).sum()
            mean[i] = total / need
            var = total2 / need - mean[i] * mean[i]
            std[i] = np.sqrt(max(var, 0.0))
            if img.shape[0] > 1 and img.shape[1] > 1:
                gx = np.abs(np.diff(img, axis=1)).mean()
                gy = np.abs(np.diff(img, axis=0)).mean()
                edge[i] = gx + gy
        return (batch
                .append_column("img_mean", pa.array(mean))
                .append_column("img_std", pa.array(std))
                .append_column("img_edge_energy", pa.array(edge)))


class AudioFrameStage:
    """binary payload -> fixed-rate frame sample + per-frame RMS energy.

    Output: ``n_frames`` (int32) and ``frame_rms`` (list<float64>, one
    value per hop) per row.  ``codec="real"`` parses RIFF PCM WAV
    (functions/codecs.py); ``codec="fake"`` derives bytes from the
    payload deterministically.

    RMS is computed from the EXACT integer sum of squared deviations
    ((b-128)^2, summed in int64 via a cumulative sum, so frame ssq is a
    range difference) then normalized once in float64:
    ``sqrt(ssq / (cnt * 128^2))``.  Summation-order-independent, so a
    SQL oracle reproduces every value bit-for-bit (same trick as
    ImageDecodeStage mean/std).
    """

    def __init__(self, payload_col: str = "payload",
                 rate_col: str = "sample_rate", codec: str = "fake",
                 frame_len: int = 1024, hop: int = 512, max_frames: int = 64):
        if codec not in ("fake", "real"):
            raise ValueError(f"unknown codec {codec!r}")
        # codec="real": pure-stdlib RIFF PCM WAV parse — the deviation
        # stream is the channel sum of signed offsets, full scale
        # n_channels * (128|32768); same exact-int64 RMS path either way
        self.codec = codec
        self.payload_col = payload_col
        self.rate_col = rate_col
        self.frame_len = frame_len
        self.hop = hop
        self.max_frames = max_frames

    def _decode_fake(self, buf: bytes) -> np.ndarray:
        """Bytes -> raw uint8 samples (centring happens in the exact
        integer RMS path of __call__)."""
        raw = np.frombuffer(buf, dtype=np.uint8)
        if raw.size == 0:
            raw = np.full(self.frame_len, 128, dtype=np.uint8)
        return raw

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        n_frames = np.zeros(len(payloads), np.int32)
        rms_rows: list[np.ndarray] = []
        fl, hop = self.frame_len, self.hop
        for i, buf in enumerate(payloads):
            if self.codec == "real":
                from ..functions.codecs import decode_wav, wav_full_scale
                _, d = decode_wav(buf or b"")
                if d.size == 0:
                    d = np.zeros(fl, np.int64)
                fs2 = float(wav_full_scale(buf)) ** 2
            else:
                raw = self._decode_fake(buf or b"")
                d = raw.astype(np.int64) - 128
                fs2 = 16384.0
            csum = np.concatenate(([0], np.cumsum(d * d)))
            starts = np.arange(0, max(1, d.size - fl + 1),
                               hop)[: self.max_frames]
            ends = np.minimum(starts + fl, d.size)
            ssq = csum[ends] - csum[starts]
            cnt = np.maximum(ends - starts, 1)
            rms = np.sqrt(ssq / (cnt * fs2))
            n_frames[i] = len(starts)
            rms_rows.append(rms)
        return (batch
                .append_column("n_frames", pa.array(n_frames, pa.int32()))
                .append_column("frame_rms",
                               pa.array([r.tolist() for r in rms_rows],
                                        pa.list_(pa.float64()))))


class VideoFrameSampleStage:
    """binary payload -> sampled frames + per-frame mean intensity.

    The fake video stream is the payload tiled to ``n_frames_total x
    (w x h)`` bytes; frame ``f`` is stream[f*w*h : (f+1)*w*h].  Every
    ``stride``-th frame is sampled (up to ``max_frames``).  Output:
    ``n_sampled`` (int32) + ``frame_mean`` (list<float64>).  Frame
    means are exact integer byte sums / (w*h) — reproducible by a SQL
    oracle via modular prefix sums over the payload (the tiled range
    [a, b) sums to P(b) - P(a) with P(x) = (x // L)*S + prefix(x % L)).
    ``codec="real"`` parses YUV4MPEG2 streams (functions/codecs.py).
    """

    def __init__(self, payload_col: str = "payload", width_col: str = "width",
                 height_col: str = "height",
                 n_frames_col: str = "n_frames_total", codec: str = "fake",
                 stride: int = 2, max_frames: int = 16):
        if codec not in ("fake", "real"):
            raise ValueError(f"unknown codec {codec!r}")
        # codec="real": pure-stdlib YUV4MPEG2 parse — dims and frame
        # count come from the stream header, luma plane means are the
        # same exact integer sums as the fake path
        self.codec = codec
        self.payload_col = payload_col
        self.width_col = width_col
        self.height_col = height_col
        self.n_frames_col = n_frames_col
        self.stride = stride
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        if self.codec == "fake":
            ws = _require_positive_ints(batch, self.width_col)
            hs = _require_positive_ints(batch, self.height_col)
            nt = _require_positive_ints(batch, self.n_frames_col)
        n_sampled = np.zeros(len(payloads), np.int32)
        mean_rows: list[list[float]] = []
        for i, buf in enumerate(payloads):
            if self.codec == "real":
                from ..functions.codecs import decode_y4m
                w, h, frames = decode_y4m(buf or b"")
                sel = frames[::self.stride][: self.max_frames]
                F = w * h
                means = [
                    float(int(f.astype(np.int64).sum()) / float(F))
                    for f in sel]
                n_sampled[i] = len(sel)
                mean_rows.append(means)
                continue
            raw = np.frombuffer(buf or b"\x00", dtype=np.uint8)
            L = raw.size
            F = int(ws[i]) * int(hs[i])
            samples = np.arange(0, int(nt[i]), self.stride)[: self.max_frames]
            # P(x) over the tiled stream from one prefix-sum of the payload
            pref = np.concatenate(([0], np.cumsum(raw, dtype=np.int64)))
            S = int(pref[-1])

            def P(x: np.ndarray) -> np.ndarray:
                return (x // L) * S + pref[x % L]

            a = samples.astype(np.int64) * F
            means = (P(a + F) - P(a)) / float(F)
            n_sampled[i] = len(samples)
            mean_rows.append(means.tolist())
        return (batch
                .append_column("n_sampled", pa.array(n_sampled, pa.int32()))
                .append_column("frame_mean",
                               pa.array(mean_rows, pa.list_(pa.float64()))))


def media_table_from_texts(ids: np.ndarray, texts: list[str],
                           kind: str = "image") -> pa.Table:
    """Deterministic synthetic media table for tests: payload bytes are
    the utf-8 text, dims derived from payload length (no randomness)."""
    payloads = [t.encode("utf-8") for t in texts]
    if kind == "image":
        ws = np.array([max(4, min(64, len(p) // 4)) for p in payloads])
        hs = np.maximum(4, ws // 2)
        return pa.table({
            "media_id": pa.array(np.asarray(ids, dtype=np.int64)),
            "media_type": pa.array(["image/fake"] * len(payloads)),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(ws.astype(np.int32)),
            "height": pa.array(hs.astype(np.int32)),
        })
    if kind == "video":
        ws = np.array([max(4, min(32, len(p) // 8)) for p in payloads])
        hs = np.maximum(4, ws // 2)
        nf = np.array([max(1, min(100, len(p) // 16)) for p in payloads])
        return pa.table({
            "media_id": pa.array(np.asarray(ids, dtype=np.int64)),
            "media_type": pa.array(["video/fake"] * len(payloads)),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(ws.astype(np.int32)),
            "height": pa.array(hs.astype(np.int32)),
            "n_frames_total": pa.array(nf.astype(np.int32)),
        })
    if kind != "audio":
        raise ValueError(f"unknown media kind {kind!r}; "
                         "one of image / video / audio")
    return pa.table({
        "media_id": pa.array(np.asarray(ids, dtype=np.int64)),
        "media_type": pa.array(["audio/fake"] * len(payloads)),
        "payload": pa.array(payloads, pa.binary()),
        "sample_rate": pa.array(np.full(len(payloads), 16000, np.int32)),
        "n_samples": pa.array(np.asarray([len(p) for p in payloads],
                                         dtype=np.int64)),
    })


def decode_images(ds: ray.data.Dataset, concurrency=(1, 4),
                  batch_size: int = 32, **kw) -> ray.data.Dataset:
    """Actor-pool image decode/feature stage (small batch size: payloads
    are large binaries — see module doc)."""
    return ds.map_batches(ImageDecodeStage, fn_constructor_kwargs=kw,
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


def frame_audio(ds: ray.data.Dataset, concurrency=(1, 4),
                batch_size: int = 32, **kw) -> ray.data.Dataset:
    return ds.map_batches(AudioFrameStage, fn_constructor_kwargs=kw,
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


def sample_video_frames(ds: ray.data.Dataset, concurrency=(1, 4),
                        batch_size: int = 16, **kw) -> ray.data.Dataset:
    """Actor-pool video frame-sample stage (smallest default batch of
    the three modalities: video payloads are the largest binaries)."""
    return ds.map_batches(VideoFrameSampleStage, fn_constructor_kwargs=kw,
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)
