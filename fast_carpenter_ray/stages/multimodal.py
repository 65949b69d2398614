"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are not available in this sandbox, so
the DECODE KERNEL is stubbed (``NotImplementedError`` unless
``fake=True``, which substitutes a deterministic content-derived fake).
Everything Ray-side is real and tested: schema handling, actor-pool stage
shape, small-batch sizing for wide binary rows, and the fixed-size feature
output layout — swap ``_decode_real`` for PIL/ffmpeg on a real cluster.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa

__all__ = ["ImageDecode", "FrameSample", "AudioResample", "media_schema"]


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

    ``__init__`` is where a real model/codec loads (once per actor);
    ``__call__`` decodes + feature-extracts per batch.  Keep ``batch_size``
    small (payloads are wide): 64-256 rows per batch so batch x concurrency
    fits worker heaps (SURVEY.md memory guidance).
    """

    FEATURE_DIM = 16

    def __init__(self, fake: bool = False, resize: Optional[tuple] = None):
        self.fake = fake
        self.resize = resize
        if not fake:
            # real path: import PIL / torchvision here, ONCE per actor
            raise NotImplementedError(
                "image decode requires PIL/torchvision (not in this sandbox); "
                "construct with fake=True for the deterministic test double")

    def _decode_fake(self, payload: bytes) -> np.ndarray:
        # deterministic content-derived pseudo-features: stable across runs
        digest = hashlib.shake_256(payload or b"").digest(self.FEATURE_DIM * 8)
        raw = np.frombuffer(digest, dtype=np.uint64).astype(np.float64)
        return raw / np.float64(2**64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._decode_fake(p) for p in batch["payload"].to_pylist()]
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
