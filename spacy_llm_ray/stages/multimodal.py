"""Multimodal column stages (image/audio/video as opaque binary columns).

The container ships no image/audio codecs, so the decode kernels are STUBS:
``decode_fn`` defaults to a deterministic fake that derives pseudo-pixels /
pseudo-samples from the payload bytes (md5-seeded), raising
``NotImplementedError`` when ``strict=True``. The Ray-side plumbing — schema,
actor-pool stage shape, small batch sizes for large binary rows, typed
metadata struct — is real and tested; a deployment plugs Pillow/ffmpeg into
``decode_fn``.

Batch-size guidance: binary payloads make rows wide — size ``batch_size`` so
batch x concurrency fits worker heap, and keep these stages in
``batch_format="pyarrow"`` (binary columns do not round-trip pandas cleanly).
"""

from __future__ import annotations

import hashlib
from typing import Callable, Optional

import numpy as np
import pyarrow as pa

MEDIA_META_TYPE = pa.struct(
    [
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
        ("sample_rate", pa.int32()),
    ]
)


def fake_decode_image(payload: bytes, size: int = 16) -> np.ndarray:
    """Deterministic fake decode: (size, size, 3) uint8 derived from an
    md5-seeded generator over the payload. Stands in for a real codec."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:4], "big")
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(size, size, 3), dtype=np.uint8)


class ImageDecodeStage:
    """binary ``data`` column -> fixed-size ``pixels`` tensor column +
    ``meta`` struct. Actor-pool stage: the (real) codec would be loaded once
    in ``__init__``."""

    def __init__(
        self,
        data_col: str = "data",
        out_col: str = "pixels",
        size: int = 16,
        decode_fn: Optional[Callable[[bytes], np.ndarray]] = None,
        strict: bool = False,
    ):
        if strict and decode_fn is None:
            raise NotImplementedError(
                "no image codec available in this environment; pass decode_fn"
            )
        self._decode = decode_fn or (lambda b: fake_decode_image(b, size))
        self._data_col = data_col
        self._out_col = out_col
        self._size = size

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self._data_col].to_pylist()
        pixels = np.stack([self._decode(p) for p in payloads]) if payloads else (
            np.zeros((0, self._size, self._size, 3), dtype=np.uint8)
        )
        flat = pa.FixedSizeListArray.from_arrays(
            pa.array(pixels.reshape(-1), type=pa.uint8()),
            self._size * self._size * 3,
        )
        metas = [
            {"mime": "image/fake", "width": self._size, "height": self._size,
             "n_frames": 1, "sample_rate": 0}
            for _ in payloads
        ]
        return batch.append_column(self._out_col, flat).append_column(
            "meta", pa.array(metas, type=MEDIA_META_TYPE)
        )


class ImageFeatureStage:
    """pixels tensor -> small feature vector (channel means/stds) — the shape
    of a batched embedding/feature-extraction stage."""

    def __init__(self, pixels_col: str = "pixels", out_col: str = "features", size: int = 16):
        self._pixels_col = pixels_col
        self._out_col = out_col
        self._size = size

    def __call__(self, batch: pa.Table) -> pa.Table:
        arr = np.array(batch[self._pixels_col].to_pylist(), dtype=np.float32)
        if arr.size:
            arr = arr.reshape(len(arr), self._size, self._size, 3)
            feats = np.concatenate(
                [arr.mean(axis=(1, 2)), arr.std(axis=(1, 2))], axis=1
            ).astype(np.float32)
        else:
            feats = np.zeros((0, 6), dtype=np.float32)
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1), type=pa.float32()), 6
        )
        return batch.append_column(self._out_col, col)


def frame_sample_indices(n_frames: int, every: int) -> list:
    """Deterministic frame sampling plan for a video payload."""
    return list(range(0, max(0, n_frames), max(1, every)))


def make_fake_media_table(n: int = 32, seed: int = 13) -> pa.Table:
    """Deterministic synthetic binary-media table for tests/benches."""
    rng = np.random.RandomState(seed)
    payloads = [rng.bytes(64 + int(i) * 7) for i in range(n)]
    return pa.table(
        {
            "media_id": pa.array(list(range(n)), type=pa.int64()),
            "data": pa.array(payloads, type=pa.binary()),
        }
    )
