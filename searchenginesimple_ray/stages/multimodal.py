"""Multimodal (image/audio/video) column plumbing.

Media ride as opaque ``binary`` columns with typed metadata columns
(``media_type``, ``width``/``height`` or ``sample_rate``/``n_samples``).
The Ray-side plumbing — schema, actor-pool stage signature, batch
sizing, output layout — is real and tested; the actual codec calls are
STUBBED because no image/audio libraries ship in this environment:

- with ``codec="fake"`` (default) a deterministic fake decoder derives
  pixel/sample arrays from the payload bytes (byte stream reshaped /
  tiled to the declared dims) so downstream feature stages exercise
  real array shapes end-to-end;
- with ``codec="real"`` the stage raises ``NotImplementedError`` at
  actor construction, marking exactly where a PIL/libsndfile/ffmpeg
  call plugs in on a cluster image that has them.

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
        if codec == "real":
            raise NotImplementedError(
                "real image decode requires PIL/opencv (not in this "
                "container); plug the decoder in here")
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
        ws = _require_positive_ints(batch, self.width_col)
        hs = _require_positive_ints(batch, self.height_col)
        n = len(payloads)
        mean = np.zeros(n)
        std = np.zeros(n)
        edge = np.zeros(n)
        for i, buf in enumerate(payloads):
            img = self._decode_fake(buf or b"", int(ws[i]), int(hs[i]))
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
    value per hop) per row.  Real codec stubbed as in ImageDecodeStage.

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
        if codec == "real":
            raise NotImplementedError(
                "real audio decode requires libsndfile/ffmpeg (not in "
                "this container); plug the decoder in here")
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
            raw = self._decode_fake(buf or b"")
            d = raw.astype(np.int64) - 128
            csum = np.concatenate(([0], np.cumsum(d * d)))
            starts = np.arange(0, max(1, raw.size - fl + 1),
                               hop)[: self.max_frames]
            ends = np.minimum(starts + fl, raw.size)
            ssq = csum[ends] - csum[starts]
            cnt = np.maximum(ends - starts, 1)
            rms = np.sqrt(ssq / (cnt * 16384.0))
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
    Real codec stubbed as in ImageDecodeStage.
    """

    def __init__(self, payload_col: str = "payload", width_col: str = "width",
                 height_col: str = "height",
                 n_frames_col: str = "n_frames_total", codec: str = "fake",
                 stride: int = 2, max_frames: int = 16):
        if codec == "real":
            raise NotImplementedError(
                "real video decode requires ffmpeg/pyav (not in this "
                "container); plug the frame extractor in here")
        self.payload_col = payload_col
        self.width_col = width_col
        self.height_col = height_col
        self.n_frames_col = n_frames_col
        self.stride = stride
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        ws = _require_positive_ints(batch, self.width_col)
        hs = _require_positive_ints(batch, self.height_col)
        nt = _require_positive_ints(batch, self.n_frames_col)
        n_sampled = np.zeros(len(payloads), np.int32)
        mean_rows: list[list[float]] = []
        for i, buf in enumerate(payloads):
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
