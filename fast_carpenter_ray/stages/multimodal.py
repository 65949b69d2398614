"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The IMAGE leg has a real decode kernel: pure-NumPy PPM (P5/P6 netpbm) and
uncompressed BMP (24/32-bit BI_RGB) decoders + nearest-neighbor resize +
a 16-dim deterministic feature vector — no wheels needed, exact goldens
testable.  JPEG/PNG (and the audio/video codecs) are not available in
this sandbox, so those kernels stay stubbed (``NotImplementedError``
unless ``fake=True``, which substitutes a deterministic content-derived
fake).  Everything Ray-side is real and tested: schema handling,
actor-pool stage shape, small-batch sizing for wide binary rows, and the
fixed-size feature output layout — swap the codec table for PIL/ffmpeg
on a real cluster.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa

__all__ = ["ImageDecode", "FrameSample", "AudioResample", "media_schema",
           "decode_ppm", "decode_bmp", "encode_ppm",
           "decode_wav", "encode_wav", "split_ppm_frames"]


def decode_ppm(buf: bytes) -> np.ndarray:
    """Pure-NumPy netpbm decoder: binary P6 (RGB) / P5 (grayscale, expanded
    to 3 channels).  Returns uint8 [H, W, 3].  maxval must be <= 255."""
    if not buf or buf[:1] != b"P" or buf[1:2] not in b"56":
        raise ValueError("not a binary netpbm (P5/P6) payload")
    gray = buf[1:2] == b"5"
    # header: magic, width, height, maxval — '#' comments allowed between
    # tokens, a single whitespace byte separates maxval from raster data
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(buf) and buf[pos:pos + 1].isspace():
            pos += 1
        if buf[pos:pos + 1] == b"#":
            pos = buf.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(buf[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    ch = 1 if gray else 3
    raster = np.frombuffer(buf, dtype=np.uint8, count=w * h * ch, offset=pos)
    img = raster.reshape(h, w, ch)
    return np.repeat(img, 3, axis=2) if gray else img


def decode_bmp(buf: bytes) -> np.ndarray:
    """Pure-NumPy BMP decoder: uncompressed (BI_RGB) 24/32-bit, BITMAPINFO
    header.  Returns uint8 [H, W, 3] (RGB, top-down)."""
    if len(buf) < 54 or buf[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = int.from_bytes(buf[10:14], "little")
    w = int.from_bytes(buf[18:22], "little", signed=True)
    h = int.from_bytes(buf[22:26], "little", signed=True)
    bpp = int.from_bytes(buf[28:30], "little")
    comp = int.from_bytes(buf[30:34], "little")
    if comp != 0 or bpp not in (24, 32):
        raise ValueError(f"only uncompressed 24/32-bit BMP supported "
                         f"(bpp={bpp}, compression={comp})")
    nch = bpp // 8
    stride = (w * nch + 3) & ~3  # rows padded to 4 bytes
    rows = np.frombuffer(buf, dtype=np.uint8, count=stride * abs(h),
                         offset=off).reshape(abs(h), stride)
    img = rows[:, :w * nch].reshape(abs(h), w, nch)
    if h > 0:  # positive height = bottom-up storage
        img = img[::-1]
    return img[:, :, 2::-1]  # BGR(A) -> RGB


def encode_ppm(img: np.ndarray) -> bytes:
    """Inverse of :func:`decode_ppm` (P6) — used by tests and the
    deterministic payload synthesizer."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img.astype(np.uint8)).tobytes()


def decode_wav(buf: bytes):
    """Pure-NumPy RIFF/WAVE decoder: 16-bit PCM (format 1).  Returns
    ``(samples int16 [n, channels], sample_rate)``."""
    if len(buf) < 44 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, n_ch, bits, data = 12, None, None, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos:pos + 4]
        size = int.from_bytes(buf[pos + 4:pos + 8], "little")
        body = buf[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = int.from_bytes(body[0:2], "little")
            if fmt != 1:
                raise ValueError(f"only PCM (format 1) supported, got {fmt}")
            n_ch = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if bits != 16:
        raise ValueError(f"only 16-bit PCM supported, got {bits}")
    samples = np.frombuffer(data, dtype="<i2")
    return samples.reshape(-1, n_ch), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Inverse of :func:`decode_wav` (16-bit PCM) — used by tests and the
    deterministic payload synthesizer."""
    s = np.atleast_2d(np.asarray(samples, dtype="<i2"))
    if s.shape[0] == 1 and samples.ndim == 1:
        s = s.T
    n_ch = s.shape[1]
    data = np.ascontiguousarray(s).tobytes()
    block = n_ch * 2
    fmt = (b"fmt " + (16).to_bytes(4, "little")
           + (1).to_bytes(2, "little") + n_ch.to_bytes(2, "little")
           + int(rate).to_bytes(4, "little")
           + (int(rate) * block).to_bytes(4, "little")
           + block.to_bytes(2, "little") + (16).to_bytes(2, "little"))
    body = b"WAVE" + fmt + b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + (len(body)).to_bytes(4, "little") + body


def split_ppm_frames(buf: bytes) -> list:
    """Split a concatenation of binary P6 frames (the engine's trivial
    deterministic 'video container') into per-frame byte slices by parsing
    each header for its raster size."""
    frames, pos = [], 0
    while pos < len(buf):
        if buf[pos:pos + 2] != b"P6":
            raise ValueError(f"frame boundary at byte {pos} is not a P6 header")
        # parse width/height/maxval tokens exactly like decode_ppm
        p, fields = pos + 2, []
        while len(fields) < 3:
            while p < len(buf) and buf[p:p + 1].isspace():
                p += 1
            if buf[p:p + 1] == b"#":
                p = buf.index(b"\n", p) + 1
                continue
            start = p
            while p < len(buf) and not buf[p:p + 1].isspace():
                p += 1
            fields.append(int(buf[start:p]))
        p += 1  # single whitespace after maxval
        end = p + fields[0] * fields[1] * 3
        frames.append(buf[pos:end])
        pos = end
    return frames


def media_schema() -> pa.Schema:
    """Canonical multimodal table schema: opaque payload + typed metadata."""
    return pa.schema([
        ("media_id", pa.int64()),
        ("url", pa.string()),
        ("media_type", pa.string()),     # image/jpeg, audio/wav, video/mp4
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ])


def _default_pool(concurrency):
    """CPU-scaled actor-pool bounds: the decode stages are genuinely
    stateful (codec table / model slot per actor) so they stay actor
    pools, but a fixed (1, 2) ceiling starved them behind 32 CPUs —
    default to half the cluster so decode never bottlenecks the stream
    while leaving room for neighbour stages."""
    if concurrency is not None:
        return concurrency
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if \
        ray.is_initialized() else 8
    return (1, max(2, cpus // 2))


class ImageDecode:
    """Actor-pool stage: payload -> fixed-size feature vector.

    ``__init__`` is where a real model/codec loads (once per actor) — here
    the codec table (magic bytes -> decoder); ``__call__`` decodes +
    feature-extracts per batch.  PPM/BMP decode is REAL (pure NumPy, see
    :func:`decode_ppm`/:func:`decode_bmp`); JPEG/PNG payloads raise with a
    pointer to the PIL swap-in; ``fake=True`` keeps the content-derived
    deterministic double for payloadless tests.  Keep ``batch_size``
    small (payloads are wide): 64-256 rows per batch so batch x concurrency
    fits worker heaps (SURVEY.md memory guidance).

    Features (16, all deterministic): height, width, aspect, luma mean,
    then per RGB channel (mean, std, min, max).
    """

    FEATURE_DIM = 16

    def __init__(self, fake: bool = False, resize: Optional[tuple] = None):
        self.fake = fake
        self.resize = resize
        # codec table built once per actor (the "model load" slot)
        self._codecs = ((b"P5", decode_ppm), (b"P6", decode_ppm),
                        (b"BM", decode_bmp))

    def _decode(self, payload: bytes) -> np.ndarray:
        for magic, codec in self._codecs:
            if payload[:len(magic)] == magic:
                return codec(payload)
        raise NotImplementedError(
            f"image payload with magic {payload[:4]!r}: only PPM/BMP decode "
            "in this sandbox — swap in PIL for JPEG/PNG on a real cluster")

    @staticmethod
    def _resize_nn(img: np.ndarray, size: tuple) -> np.ndarray:
        """Nearest-neighbor resize to (width, height) — deterministic."""
        w, h = size
        yy = (np.arange(h) * img.shape[0]) // h
        xx = (np.arange(w) * img.shape[1]) // w
        return img[yy][:, xx]

    def _features(self, img: np.ndarray) -> np.ndarray:
        h, w = img.shape[:2]
        px = img.reshape(-1, 3).astype(np.float64)
        luma = (0.299 * px[:, 0] + 0.587 * px[:, 1] + 0.114 * px[:, 2])
        return np.concatenate([
            [np.float64(h), np.float64(w), np.float64(h) / np.float64(w),
             luma.mean()],
            px.mean(axis=0), px.std(axis=0),
            px.min(axis=0), px.max(axis=0)])

    def _decode_fake(self, payload: bytes) -> np.ndarray:
        # deterministic content-derived pseudo-features: stable across runs
        digest = hashlib.shake_256(payload or b"").digest(self.FEATURE_DIM * 8)
        raw = np.frombuffer(digest, dtype=np.uint64).astype(np.float64)
        return raw / np.float64(2**64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.fake:
            feats = [self._decode_fake(p)
                     for p in batch["payload"].to_pylist()]
        else:
            imgs = (self._decode(p) for p in batch["payload"].to_pylist())
            if self.resize is not None:
                imgs = (self._resize_nn(i, self.resize) for i in imgs)
            feats = [self._features(i) for i in imgs]
        col = pa.array([f.tolist() for f in feats], type=pa.list_(pa.float64()))
        out = batch.drop_columns(["payload"])  # payload never flows downstream
        return out.append_column("features", col)

    @classmethod
    def apply(cls, ds, concurrency=None, batch_size: int = 128, **kwargs):
        return ds.map_batches(
            cls, fn_constructor_kwargs=kwargs, batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=_default_pool(concurrency))


class FrameSample:
    """Video frame-sampling stage: emits ``n_frames`` rows per video — a
    flat_map-shaped expansion done batch-wise.

    Real path (default): the payload is a concatenation of binary P6
    frames (the engine's deterministic container; a real cluster swaps
    :func:`split_ppm_frames` + :func:`decode_ppm` for ffmpeg in the same
    actor slot).  Frames are sampled evenly — original frame index
    ``floor(k * T / n)`` for ``k in 0..n-1`` over ``T`` total frames —
    and each sampled frame emits its exact integer pixel sum
    (``frame_sum``), so the whole decode path is SQL-replayable.
    ``fake=True`` keeps the hash-double (``frame_sig``) for payloadless
    tests."""

    def __init__(self, n_frames: int = 4, fake: bool = False):
        self.n_frames = n_frames
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        rows = np.repeat(np.arange(n), self.n_frames)
        out = batch.take(pa.array(rows))
        out = out.drop_columns(["payload"])
        payloads = batch["payload"].to_pylist()
        if self.fake:
            frame_idx = np.tile(np.arange(self.n_frames), n)
            feats = [
                hashlib.blake2b((payloads[i] or b"") + bytes([fi % 256]),
                                digest_size=8).digest()
                for i, fi in zip(rows.tolist(), frame_idx.tolist())
            ]
            out = out.append_column(
                "frame_idx", pa.array(frame_idx, type=pa.int32()))
            return out.append_column(
                "frame_sig",
                pa.array([int.from_bytes(f, "little") & ((1 << 63) - 1)
                          for f in feats], type=pa.int64()))
        k = np.arange(self.n_frames)
        idx_all, sums_all = [], []
        for p in payloads:
            frames = split_ppm_frames(p or b"")
            t = len(frames)
            if t == 0:
                raise ValueError("empty video payload")
            sampled = (k * t) // self.n_frames
            idx_all.append(sampled)
            sums_all.append([int(decode_ppm(frames[j]).sum(dtype=np.int64))
                             for j in sampled])
        # sample_k distinguishes duplicate sampled frames when T < n_frames
        out = out.append_column(
            "sample_k", pa.array(np.tile(k, n).astype(np.int32),
                                 type=pa.int32()))
        out = out.append_column(
            "frame_idx",
            pa.array(np.concatenate(idx_all).astype(np.int32),
                     type=pa.int32()))
        return out.append_column(
            "frame_sum",
            pa.array(np.concatenate(sums_all).astype(np.int64),
                     type=pa.int64()))

    @classmethod
    def apply(cls, ds, concurrency=None, batch_size: int = 64, **kwargs):
        return ds.map_batches(
            cls, fn_constructor_kwargs=kwargs, batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=_default_pool(concurrency))


class AudioResample:
    """Audio decimate + window-energy stage.

    Real path (default): 16-bit PCM RIFF/WAVE decoded by the pure-NumPy
    :func:`decode_wav` (a real cluster swaps soundfile/librosa into the
    same actor slot for compressed codecs, which raise here).  Channel 0
    is decimated by the integer factor ``src_rate // target_hz`` (>= 1),
    then split into ``N_WINDOWS`` equal contiguous windows whose energies
    are EXACT int64 sums of squares — SQL-replayable.  ``fake=True``
    keeps the content-derived deterministic double.  Same actor-pool
    contract as :class:`ImageDecode`: codec state loads once per actor in
    ``__init__``; per-batch work is vectorized over the window axis."""

    N_WINDOWS = 8

    def __init__(self, target_hz: int = 16_000, fake: bool = False):
        self.target_hz = int(target_hz)
        self.fake = fake

    def _windows_fake(self, payload: bytes) -> np.ndarray:
        digest = hashlib.shake_256(
            (payload or b"") + self.target_hz.to_bytes(4, "little")
        ).digest(self.N_WINDOWS * 8)
        raw = np.frombuffer(digest, dtype=np.uint64).astype(np.float64)
        return raw / np.float64(2**64)

    def _windows_real(self, payload: bytes) -> np.ndarray:
        if (payload or b"")[:4] != b"RIFF":
            raise NotImplementedError(
                f"audio payload with magic {payload[:4]!r}: only 16-bit "
                "PCM WAV decode in this sandbox — swap in soundfile for "
                "compressed codecs on a real cluster")
        samples, rate = decode_wav(payload)
        mono = samples[:, 0].astype(np.int64)
        factor = max(1, rate // self.target_hz)
        y = mono[::factor]
        w = len(y) // self.N_WINDOWS
        if w == 0:
            raise ValueError("audio too short for the window count")
        trimmed = y[:w * self.N_WINDOWS].reshape(self.N_WINDOWS, w)
        return np.einsum("ij,ij->i", trimmed, trimmed)  # exact int64 sums

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        out = batch.drop_columns(["payload"])
        out = out.append_column("sample_rate",
                                pa.array([self.target_hz] * len(batch),
                                         type=pa.int32()))
        if self.fake:
            feats = [self._windows_fake(p) for p in payloads]
            col = pa.array([f.tolist() for f in feats],
                           type=pa.list_(pa.float64()))
        else:
            feats = [self._windows_real(p) for p in payloads]
            col = pa.array([f.tolist() for f in feats],
                           type=pa.list_(pa.int64()))
        return out.append_column("window_energy", col)

    @classmethod
    def apply(cls, ds, concurrency=None, batch_size: int = 64, **kwargs):
        return ds.map_batches(
            cls, fn_constructor_kwargs=kwargs, batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=_default_pool(concurrency))
