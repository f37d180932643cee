"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a ``media_meta`` struct
(mime, width/height or sample_rate, duration). The decode/resize/
frame-sample compute is an actor-pool ``map_batches`` stage whose Ray-side
plumbing (schema, batch sizing, actor signature, output layout) is real and
tested; the *codec* itself is stubbed (no image/audio libraries in this
environment): ``DETERMINISTIC_FAKE`` mode derives stable pseudo-features
from the payload bytes, ``STRICT`` mode raises ``NotImplementedError`` —
the marked integration point for a real decoder (PIL/torchaudio/pyav).

Batch sizing note: binary payloads dominate memory — default batch_size is
deliberately small (8) so batch × concurrency × payload stays inside a
worker heap; tune per payload size, not per row count.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd

STRICT = "strict"
DETERMINISTIC_FAKE = "fake"


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Stable pseudo-embedding from payload bytes (seeded by crc32)."""
    seed = zlib.crc32(payload or b"\x00")
    rng = np.random.RandomState(seed % (2**31 - 1))
    return rng.standard_normal(dim).astype(np.float32)


class DecodeImages:
    """Actor UDF: binary column → (width, height, mime, feature vector).

    Real decode is NOT implemented in this environment — see class docstring.
    """

    def __init__(self, payload_col: str = "payload", mode: str = DETERMINISTIC_FAKE,
                 feature_dim: int = 64, resize_to: tuple[int, int] = (224, 224)):
        self.payload_col = payload_col
        self.mode = mode
        self.feature_dim = feature_dim
        self.resize_to = resize_to

    def _decode(self, payload: bytes) -> dict:
        if self.mode == STRICT:
            raise NotImplementedError(
                "image decode requires PIL/opencv — not available in this "
                "container; integration point: DecodeImages._decode")
        h = hashlib.md5(payload or b"").digest()
        return {
            "mime": "image/fake",
            "width": 64 + h[0] % 192 * 8,
            "height": 64 + h[1] % 192 * 8,
            "resized_w": self.resize_to[0],
            "resized_h": self.resize_to[1],
            "features": _fake_features(payload, self.feature_dim).tolist(),
        }

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        metas = [self._decode(p) for p in df[self.payload_col]]
        out = df.drop(columns=[self.payload_col]).copy()
        for key in ("mime", "width", "height", "resized_w", "resized_h"):
            out[key] = [m[key] for m in metas]
        out["features"] = [m["features"] for m in metas]
        return out


class SampleFrames:
    """Actor UDF for video payloads: emit ``n_frames`` stable frame rows per
    input (flat_map shape: one input row → many frame rows)."""

    def __init__(self, payload_col: str = "payload", n_frames: int = 4,
                 mode: str = DETERMINISTIC_FAKE):
        self.payload_col = payload_col
        self.n_frames = n_frames
        self.mode = mode

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if self.mode == STRICT:
            raise NotImplementedError(
                "video decode requires pyav — integration point: SampleFrames")
        rows = {"media_id": [], "frame_idx": [], "frame_hash": []}
        id_col = "media_id" if "media_id" in df.columns else df.columns[0]
        for mid, p in zip(df[id_col], df[self.payload_col]):
            digest = hashlib.md5(p or b"").hexdigest()
            for fi in range(self.n_frames):
                rows["media_id"].append(mid)
                rows["frame_idx"].append(fi)
                rows["frame_hash"].append(
                    hashlib.md5(f"{digest}:{fi}".encode()).hexdigest())
        return pd.DataFrame(rows)


def decode_media_dataset(ds, payload_col: str = "payload", *,
                         batch_size: int = 8, concurrency=(1, 4),
                         mode: str = DETERMINISTIC_FAKE, feature_dim: int = 64):
    return ds.map_batches(
        DecodeImages,
        fn_constructor_kwargs={"payload_col": payload_col, "mode": mode,
                               "feature_dim": feature_dim},
        batch_format="pandas", batch_size=batch_size, concurrency=concurrency)


def sample_frames_dataset(ds, payload_col: str = "payload", *,
                          n_frames: int = 4, batch_size: int = 8,
                          concurrency=(1, 4)):
    return ds.map_batches(
        SampleFrames,
        fn_constructor_kwargs={"payload_col": payload_col,
                               "n_frames": n_frames},
        batch_format="pandas", batch_size=batch_size, concurrency=concurrency)
