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


def decode_ppm(payload: bytes) -> tuple[int, int, np.ndarray]:
    """REAL decoder for binary PPM (P6, maxval<=255): header parse +
    zero-copy ``np.frombuffer`` into an (h, w, 3) uint8 array. PPM needs
    no codec library, so this path exercises the full decode→resize→
    featurize pipeline genuinely; compressed formats (JPEG/PNG) still
    route to the stub until PIL/opencv exists in the environment."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":          # comment to end of line
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1                                      # single whitespace byte
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    n = w * h * 3
    arr = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return w, h, arr.reshape(h, w, 3)


def _resize_nn(img: np.ndarray, to_w: int, to_h: int) -> np.ndarray:
    """Nearest-neighbor resize by index grids — pure numpy."""
    h, w = img.shape[:2]
    ys = (np.arange(to_h) * h // to_h).clip(0, h - 1)
    xs = (np.arange(to_w) * w // to_w).clip(0, w - 1)
    return img[ys[:, None], xs[None, :]]


def _image_features(img: np.ndarray, dim: int = 64) -> np.ndarray:
    """Real 64-dim feature: 4x4 grid of per-cell RGB means (48 dims) +
    16-bin grayscale histogram (fraction mass), all in [0, 1]."""
    g = _resize_nn(img, 4, 4).astype(np.float32) / 255.0
    grid = g.reshape(-1)                          # 4*4*3 = 48
    gray = img.astype(np.float32).mean(axis=2)
    hist, _ = np.histogram(gray, bins=16, range=(0.0, 255.0))
    hist = hist.astype(np.float32) / max(1, gray.size)
    feat = np.concatenate([grid, hist])
    if len(feat) < dim:
        feat = np.pad(feat, (0, dim - len(feat)))
    return feat[:dim].astype(np.float32)


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
        if (payload or b"").startswith(b"P6"):
            # real path: PPM decodes with numpy alone (both modes).
            # A corrupt/truncated payload behind the magic raises in
            # STRICT mode but falls through to the deterministic fake
            # otherwise — fake mode must never throw (advisor finding)
            try:
                w, hgt, img = decode_ppm(payload)
            except Exception:
                if self.mode == STRICT:
                    raise
            else:
                resized = _resize_nn(img, *self.resize_to)
                return {
                    "mime": "image/x-portable-pixmap",
                    "width": w,
                    "height": hgt,
                    "resized_w": resized.shape[1],
                    "resized_h": resized.shape[0],
                    "features": _image_features(
                        img, self.feature_dim).tolist(),
                }
        if self.mode == STRICT:
            raise NotImplementedError(
                "compressed-image decode requires PIL/opencv — not "
                "available in this container; integration point: "
                "DecodeImages._decode (PPM already decodes for real)")
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


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """REAL decoder for RIFF/WAV PCM via the stdlib ``wave`` module —
    no codec library needed. Returns (sample_rate, n_channels, mono
    float32 samples in [-1, 1]). 8/16/32-bit integer PCM supported."""
    import io
    import wave

    with wave.open(io.BytesIO(payload)) as wf:
        rate = wf.getframerate()
        nch = wf.getnchannels()
        width = wf.getsampwidth()
        raw = wf.readframes(wf.getnframes())
    if width == 2:
        x = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
             - 128.0) / 128.0
    elif width == 4:
        x = np.frombuffer(raw, dtype=np.int32).astype(np.float32) / 2**31
    else:
        raise ValueError(f"unsupported sample width {width}")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return rate, nch, x


def _audio_features(x: np.ndarray, rate: int, dim: int = 32) -> np.ndarray:
    """Real 32-dim audio feature: RMS, zero-crossing rate, then 30
    log-magnitude rFFT bands (mean-pooled) — numpy only."""
    if not len(x):
        return np.zeros(dim, dtype=np.float32)
    rms = float(np.sqrt(np.mean(x * x)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8)))))
    mag = np.abs(np.fft.rfft(x))
    bands = np.array_split(mag, dim - 2)
    spec = np.log1p(np.array([b.mean() if len(b) else 0.0
                              for b in bands], dtype=np.float64))
    return np.concatenate([[rms, zcr], spec]).astype(np.float32)[:dim]


class DecodeAudio:
    """Actor UDF: binary column → (sample_rate, channels, duration_sec,
    feature vector). WAV PCM decodes FOR REAL (stdlib wave + numpy);
    compressed audio (mp3/ogg/flac) routes to the deterministic fake or
    raises in strict mode — integration point for torchaudio/pyav."""

    def __init__(self, payload_col: str = "payload",
                 mode: str = DETERMINISTIC_FAKE, feature_dim: int = 32):
        self.payload_col = payload_col
        self.mode = mode
        self.feature_dim = feature_dim

    def _decode(self, payload: bytes) -> dict:
        if (payload or b"").startswith(b"RIFF"):
            # corrupt/truncated RIFF raises in STRICT mode only; fake
            # mode falls through and must never throw (advisor finding)
            try:
                rate, nch, x = decode_wav(payload)
            except Exception:
                if self.mode == STRICT:
                    raise
            else:
                return {"mime": "audio/wav", "sample_rate": rate,
                        "channels": nch,
                        "duration_sec":
                            float(len(x)) / rate if rate else 0.0,
                        "features": _audio_features(
                            x, rate, self.feature_dim).tolist()}
        if self.mode == STRICT:
            raise NotImplementedError(
                "compressed-audio decode requires torchaudio/pyav — "
                "integration point: DecodeAudio._decode (WAV already "
                "decodes for real)")
        h = hashlib.md5(payload or b"").digest()
        return {"mime": "audio/fake", "sample_rate": 8000 * (1 + h[0] % 5),
                "channels": 1 + h[1] % 2,
                "duration_sec": float(h[2]) / 8.0,
                "features": _fake_features(
                    payload, self.feature_dim).tolist()}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        metas = [self._decode(p) for p in df[self.payload_col]]
        out = df.drop(columns=[self.payload_col]).copy()
        for key in ("mime", "sample_rate", "channels", "duration_sec"):
            out[key] = [m[key] for m in metas]
        out["features"] = [m["features"] for m in metas]
        return out


def decode_audio_dataset(ds, payload_col: str = "payload", *,
                         batch_size: int = 8, concurrency=(1, 4),
                         mode: str = DETERMINISTIC_FAKE,
                         feature_dim: int = 32):
    return ds.map_batches(
        DecodeAudio,
        fn_constructor_kwargs={"payload_col": payload_col, "mode": mode,
                               "feature_dim": feature_dim},
        batch_format="pandas", batch_size=batch_size,
        concurrency=concurrency)


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


def decode_y4m(payload: bytes) -> dict:
    """REAL decoder for uncompressed YUV4MPEG2 (.y4m) video — header
    parse + per-frame ``np.frombuffer``, no codec library. Completes
    the real-decode triple (image=PPM, audio=WAV, video=Y4M); compressed
    codecs stay STRICT-stubbed in :class:`SampleFrames`.

    Returns {width, height, fps (num, den), colorspace, y_frames
    (n, h, w) uint8} — the luma planes; chroma planes are stride-skipped
    per the C420/C422/C444/mono subsampling geometry (a wrong skip
    shifts every later frame's bytes, which is exactly what the
    decode-law oracle in q83 would catch)."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\n")
    w = h = None
    fps = (0, 1)
    cs = "420"
    for tok in payload[:nl].decode("ascii").split()[1:]:
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "F":
            num, den = tok[1:].split(":")
            fps = (int(num), int(den))
        elif tok[0] == "C":
            cs = tok[1:]
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    if cs.startswith("420"):
        chroma = (w // 2) * (h // 2) * 2
    elif cs.startswith("422"):
        chroma = (w // 2) * h * 2
    elif cs.startswith("444"):
        chroma = w * h * 2
    elif cs.startswith("mono"):
        chroma = 0
    else:
        raise ValueError(f"unsupported Y4M colorspace {cs}")
    ysz = w * h
    frames = []
    pos = nl + 1
    while pos < len(payload):
        fe = payload.find(b"\n", pos)
        if fe < 0:
            raise ValueError("truncated Y4M frame marker")
        if not payload[pos:fe].startswith(b"FRAME"):
            raise ValueError("malformed Y4M frame marker")
        start = fe + 1
        # the CHROMA planes must be complete too: a file cut mid-chroma
        # is corrupt even though only luma is returned (review finding —
        # a strict decoder must not report success on it)
        if start + ysz + chroma > len(payload):
            raise ValueError("truncated Y4M frame")
        frames.append(np.frombuffer(payload, np.uint8, count=ysz,
                                    offset=start).reshape(h, w))
        pos = start + ysz + chroma
    y = np.stack(frames) if frames else np.empty((0, h, w), np.uint8)
    return {"width": w, "height": h, "fps": fps, "colorspace": cs,
            "y_frames": y}


class SampleY4MFrames:
    """Actor UDF: REAL frame sampling over uncompressed Y4M video
    payloads — every ``stride``-th frame's luma plane reduces to
    (y_sum, y_mean) features (flat_map shape: one row → many frame
    rows). Non-Y4M payloads raise in STRICT mode and emit the
    :class:`SampleFrames` deterministic fake rows (with null y stats)
    otherwise — same honesty contract as the image/audio stages."""

    def __init__(self, payload_col: str = "payload", stride: int = 2,
                 mode: str = STRICT):
        self.payload_col = payload_col
        self.stride = stride
        self.mode = mode

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        rows = {"media_id": [], "frame_idx": [], "y_sum": [],
                "y_mean": []}
        id_col = "media_id" if "media_id" in df.columns else df.columns[0]
        for mid, p in zip(df[id_col], df[self.payload_col]):
            if (p or b"").startswith(b"YUV4MPEG2"):
                v = decode_y4m(p)
                npx = v["width"] * v["height"]
                for fi in range(0, len(v["y_frames"]), self.stride):
                    s = int(v["y_frames"][fi].sum(dtype=np.int64))
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(fi)
                    rows["y_sum"].append(s)
                    rows["y_mean"].append(round(s / npx, 6))
                continue
            if self.mode == STRICT:
                raise NotImplementedError(
                    "compressed-video decode requires pyav — integration "
                    "point: SampleY4MFrames (Y4M already decodes for "
                    "real); use SampleFrames for the deterministic fake")
            digest = hashlib.md5(p or b"").hexdigest()
            for fi in range(0, 4, self.stride):
                rows["media_id"].append(mid)
                rows["frame_idx"].append(fi)
                rows["y_sum"].append(
                    int(hashlib.md5(f"{digest}:{fi}".encode())
                        .hexdigest()[:8], 16))
                rows["y_mean"].append(None)
        out = pd.DataFrame(rows)
        out["frame_idx"] = out["frame_idx"].astype("int64")
        out["y_sum"] = out["y_sum"].astype("int64")
        return out


def sample_y4m_dataset(ds, payload_col: str = "payload", *,
                       stride: int = 2, batch_size: int = 8,
                       concurrency=(1, 4), mode: str = STRICT):
    return ds.map_batches(
        SampleY4MFrames,
        fn_constructor_kwargs={"payload_col": payload_col,
                               "stride": stride, "mode": mode},
        batch_format="pandas", batch_size=batch_size,
        concurrency=concurrency)


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
