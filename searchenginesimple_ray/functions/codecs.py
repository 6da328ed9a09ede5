"""Pure-stdlib media codecs for the ``codec="real"`` multimodal path.

No image/audio/video library ships in this container, but three public
container formats are decodable with nothing beyond ``zlib`` /
``struct`` + numpy, which makes the ``stages/multimodal.py`` "real"
path genuinely real for them:

- **PNG** (RFC 2083): chunk walk -> IHDR dims -> zlib-inflated IDAT ->
  per-scanline filter inversion (None/Sub/Up/Average/Paeth) ->
  grayscale luma.  8-bit depth, color types 0/2/4/6, no interlace.
- **WAV** (RIFF PCM): ``fmt ``/``data`` chunk walk, 8-bit unsigned or
  16-bit signed LE samples, any channel count (channels are summed
  into one integer deviation stream — exact int64 arithmetic, same
  contract as the fake path's ``(b - 128)`` deviations).
- **Y4M** (YUV4MPEG2): ASCII stream header (``W.. H..``), per-frame
  ``FRAME`` headers, planar frames; the luma plane is the first
  ``W*H`` bytes of every frame regardless of chroma subsampling.

These parsers are written from the public format specifications; they
prioritize correctness and clarity over speed (Sub/Up filters are
vectorized; Average/Paeth invert per-pixel, as their recurrences
require).  Malformed payloads raise ``ValueError`` with the reason.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# channels per PNG color type (bit depth 8 only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(buf: bytes) -> np.ndarray:
    """PNG bytes -> (h, w) float64 grayscale image.

    Color images reduce via integer BT.601 luma
    ``(299*R + 587*G + 114*B) / 1000`` (documented deterministic
    choice); gray+alpha / RGBA ignore alpha.
    """
    if len(buf) < 8 or buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    ihdr = None
    idat = []
    while pos + 8 <= len(buf):
        (length,) = struct.unpack(">I", buf[pos:pos + 4])
        ctype = buf[pos + 4:pos + 8]
        data = buf[pos + 8:pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length          # length + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ct, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr[:13])
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (only 8)")
    if ct not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {ct}")
    if comp != 0 or filt != 0:
        raise ValueError("non-standard PNG compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced PNG unsupported")
    ch = _PNG_CHANNELS[ct]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != (stride + 1) * h:
        raise ValueError(
            f"PNG data size {len(raw)} != expected {(stride + 1) * h}")
    raw = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    ftypes = raw[:, 0]
    lines = raw[:, 1:].astype(np.int64)   # headroom for filter sums
    recon = np.empty((h, stride), np.int64)
    prev = np.zeros(stride, np.int64)
    for y in range(h):
        f = int(ftypes[y])
        ln = lines[y]
        if f == 0:                                       # None
            cur = ln.copy()
        elif f == 1:                                     # Sub
            cur = ln.reshape(-1, ch).cumsum(axis=0).reshape(-1) % 256
        elif f == 2:                                     # Up
            cur = (ln + prev) % 256
        elif f == 3:                                     # Average
            cur = np.empty(stride, np.int64)
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                cur[x] = (ln[x] + (a + prev[x]) // 2) % 256
        elif f == 4:                                     # Paeth
            cur = np.empty(stride, np.int64)
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else \
                    (b if pb <= pc else c)
                cur[x] = (ln[x] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        recon[y] = cur
        prev = cur
    px = recon.reshape(h, w, ch)
    if ct == 0:
        gray = px[:, :, 0].astype(np.float64)
    elif ct == 4:                 # gray + alpha
        gray = px[:, :, 0].astype(np.float64)
    else:                         # RGB / RGBA -> integer BT.601 luma
        gray = (299 * px[:, :, 0] + 587 * px[:, :, 1]
                + 114 * px[:, :, 2]) / 1000.0
    return gray


def encode_png(img: np.ndarray, filter_type: int = 0,
               color: np.ndarray | None = None) -> bytes:
    """Minimal PNG encoder (tests + fixtures): ``img`` is (h, w) uint8
    gray, or pass ``color`` as (h, w, 3|4) uint8.  Every scanline uses
    ``filter_type`` (0-4), exercising the decoder's filter inversion.
    """
    arr = color if color is not None else img[:, :, None]
    h, w, ch = arr.shape
    ct = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    arr = arr.astype(np.int64)
    stride = w * ch
    flat = arr.reshape(h, stride)
    out_lines = []
    prev = np.zeros(stride, np.int64)
    for y in range(h):
        cur = flat[y]
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            left = np.concatenate([np.zeros(ch, np.int64), cur[:-ch]])
            enc = (cur - left) % 256
        elif filter_type == 2:
            enc = (cur - prev) % 256
        elif filter_type == 3:
            left = np.concatenate([np.zeros(ch, np.int64), cur[:-ch]])
            enc = (cur - (left + prev) // 2) % 256
        elif filter_type == 4:
            left = np.concatenate([np.zeros(ch, np.int64), cur[:-ch]])
            ul = np.concatenate([np.zeros(ch, np.int64), prev[:-ch]])
            p = left + prev - ul
            pa_, pb, pc = (np.abs(p - left), np.abs(p - prev),
                           np.abs(p - ul))
            pred = np.where((pa_ <= pb) & (pa_ <= pc), left,
                            np.where(pb <= pc, prev, ul))
            enc = (cur - pred) % 256
        else:
            raise ValueError(f"unknown filter {filter_type}")
        out_lines.append(bytes([filter_type])
                         + enc.astype(np.uint8).tobytes())
        prev = cur
    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
    idat = zlib.compress(b"".join(out_lines))
    return (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))


def decode_wav(buf: bytes) -> tuple[int, np.ndarray]:
    """WAV (RIFF PCM) bytes -> (sample_rate, deviations int64).

    The deviation stream is the CHANNEL SUM of each sample's signed
    offset from center (8-bit: ``b - 128``; 16-bit: the sample value),
    i.e. the exact-integer quantity the multimodal RMS path consumes;
    full scale for normalization is ``n_channels * (128 or 32768)``
    (returned implicitly via the stage's fmt bookkeeping).
    """
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(buf):
        cid = buf[pos:pos + 4]
        (ln,) = struct.unpack("<I", buf[pos + 4:pos + 8])
        body = buf[pos + 8:pos + 8 + ln]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)      # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, n_ch, rate, _, _, bits = struct.unpack("<HHIIHH", fmt[:16])
    if audio_fmt != 1:
        raise ValueError(f"only PCM WAV supported (fmt {audio_fmt})")
    if n_ch < 1:
        raise ValueError("malformed WAV: fmt declares 0 channels")
    if bits == 8:
        s = np.frombuffer(data, np.uint8).astype(np.int64) - 128
    elif bits == 16:
        s = np.frombuffer(data[:len(data) // 2 * 2], "<i2") \
            .astype(np.int64)
    else:
        raise ValueError(f"unsupported WAV bit depth {bits}")
    n = len(s) // n_ch * n_ch
    dev = s[:n].reshape(-1, n_ch).sum(axis=1)
    return int(rate), dev


def wav_full_scale(buf: bytes) -> int:
    """n_channels * per-sample full scale — the RMS denominator base."""
    pos = 12
    while pos + 8 <= len(buf):
        cid = buf[pos:pos + 4]
        (ln,) = struct.unpack("<I", buf[pos + 4:pos + 8])
        if cid == b"fmt ":
            _, n_ch, _, _, _, bits = struct.unpack(
                "<HHIIHH", buf[pos + 8:pos + 24])
            return n_ch * (128 if bits == 8 else 32768)
        pos += 8 + ln + (ln & 1)
    raise ValueError("WAV missing fmt chunk")


def encode_wav(samples: np.ndarray, rate: int = 16000,
               bits: int = 16, n_channels: int = 1) -> bytes:
    """Minimal PCM WAV encoder (tests + fixtures).  ``samples`` is
    (n,) or (n, n_channels); 8-bit expects uint8, 16-bit int16."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    data = (arr.astype(np.uint8) if bits == 8
            else arr.astype("<i2")).tobytes()
    block = n_channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, n_channels, rate, rate * block,
                      block, bits)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def decode_y4m(buf: bytes) -> tuple[int, int, list[np.ndarray]]:
    """YUV4MPEG2 bytes -> (w, h, [luma plane (h, w) uint8 per frame]).

    The luma plane is the first ``w*h`` bytes of each frame for every
    chroma mode; chroma bytes are skipped by mode (C420* -> w*h//2,
    C422 -> w*h, C444 -> 2*w*h, Cmono -> 0).
    """
    nl = buf.find(b"\n")
    if nl < 0 or not buf.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = 0
    cmode = "420"
    for tok in buf[9:nl].split():
        t = tok.decode("ascii", "replace")
        if t.startswith("W"):
            w = int(t[1:])
        elif t.startswith("H"):
            h = int(t[1:])
        elif t.startswith("C"):
            cmode = t[1:]
    if w <= 0 or h <= 0:
        raise ValueError("Y4M header missing W/H")
    luma = w * h
    # chroma planes use PER-PLANE ceil dims (mjpegtools/ffmpeg write
    # ceil(w/2) x ceil(h/2) for odd sizes), not luma//2
    cw, chh = (w + 1) // 2, (h + 1) // 2
    if cmode.startswith("420"):
        chroma = 2 * cw * chh
    elif cmode.startswith("422"):
        chroma = 2 * cw * h
    elif cmode.startswith("444"):
        chroma = 2 * luma
    elif cmode.startswith("mono"):
        chroma = 0
    else:
        raise ValueError(f"unsupported Y4M chroma mode C{cmode}")
    frames = []
    pos = nl + 1
    while pos < len(buf):
        fnl = buf.find(b"\n", pos)
        if fnl < 0 or buf[pos:pos + 5] != b"FRAME":
            raise ValueError("malformed Y4M frame header")
        start = fnl + 1
        end = start + luma + chroma
        if end > len(buf):
            raise ValueError("truncated Y4M frame")
        frames.append(np.frombuffer(buf[start:start + luma], np.uint8)
                      .reshape(h, w))
        pos = end
    return w, h, frames


def encode_y4m(frames: list[np.ndarray], cmode: str = "420") -> bytes:
    """Minimal Y4M encoder (tests + fixtures): gray frames become the
    luma planes; chroma planes are zero-filled to the mode's size."""
    h, w = frames[0].shape
    cw, chh = (w + 1) // 2, (h + 1) // 2
    chroma = {"420": 2 * cw * chh, "422": 2 * cw * h,
              "444": 2 * w * h, "mono": 0}[cmode]
    out = [f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C{cmode}\n"
           .encode("ascii")]
    for f in frames:
        out.append(b"FRAME\n")
        out.append(f.astype(np.uint8).tobytes())
        out.append(bytes(chroma))
    return b"".join(out)
