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
           "decode_ppm", "decode_bmp", "encode_ppm"]


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
    def apply(cls, ds, concurrency=(1, 2), batch_size: int = 128, **kwargs):
        return ds.map_batches(
            cls, fn_constructor_kwargs=kwargs, batch_format="pyarrow",
            batch_size=batch_size, concurrency=concurrency)


class FrameSample:
    """Video frame-sampling stage (stubbed decode, real plumbing):
    emits ``n_frames`` rows per video with a frame index + fake frame
    features — a flat_map-shaped expansion done batch-wise."""

    def __init__(self, n_frames: int = 4, fake: bool = False):
        self.n_frames = n_frames
        self.fake = fake
        if not fake:
            raise NotImplementedError(
                "video decode requires ffmpeg (not in this sandbox); "
                "construct with fake=True for the deterministic test double")

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        rows = np.repeat(np.arange(n), self.n_frames)
        out = batch.take(pa.array(rows))
        out = out.drop_columns(["payload"])
        frame_idx = np.tile(np.arange(self.n_frames), n)
        payloads = batch["payload"].to_pylist()
        feats = [
            hashlib.blake2b((payloads[i] or b"") + bytes([fi % 256]), digest_size=8).digest()
            for i, fi in zip(rows.tolist(), frame_idx.tolist())
        ]
        out = out.append_column("frame_idx", pa.array(frame_idx, type=pa.int32()))
        out = out.append_column(
            "frame_sig",
            pa.array([int.from_bytes(f, "little") & ((1 << 63) - 1) for f in feats],
                     type=pa.int64()))
        return out

    @classmethod
    def apply(cls, ds, concurrency=(1, 2), batch_size: int = 64, **kwargs):
        return ds.map_batches(
            cls, fn_constructor_kwargs=kwargs, batch_format="pyarrow",
            batch_size=batch_size, concurrency=concurrency)


class AudioResample:
    """Audio resample + feature stage (stubbed codec, real plumbing):
    payload -> ``n_windows`` mel-like window energies at ``target_hz``.
    Same actor-pool contract as :class:`ImageDecode`: codec loads once per
    actor in ``__init__`` (the real path imports soundfile/librosa there);
    per-batch work is vectorized over the window axis."""

    N_WINDOWS = 8

    def __init__(self, target_hz: int = 16_000, fake: bool = False):
        self.target_hz = int(target_hz)
        self.fake = fake
        if not fake:
            raise NotImplementedError(
                "audio decode requires soundfile/librosa (not in this "
                "sandbox); construct with fake=True for the deterministic "
                "test double")

    def _windows_fake(self, payload: bytes) -> np.ndarray:
        digest = hashlib.shake_256(
            (payload or b"") + self.target_hz.to_bytes(4, "little")
        ).digest(self.N_WINDOWS * 8)
        raw = np.frombuffer(digest, dtype=np.uint64).astype(np.float64)
        return raw / np.float64(2**64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._windows_fake(p) for p in batch["payload"].to_pylist()]
        col = pa.array([f.tolist() for f in feats], type=pa.list_(pa.float64()))
        out = batch.drop_columns(["payload"])
        out = out.append_column("sample_rate",
                                pa.array([self.target_hz] * len(batch),
                                         type=pa.int32()))
        return out.append_column("window_energy", col)

    @classmethod
    def apply(cls, ds, concurrency=(1, 2), batch_size: int = 64, **kwargs):
        return ds.map_batches(
            cls, fn_constructor_kwargs=kwargs, batch_format="pyarrow",
            batch_size=batch_size, concurrency=concurrency)
