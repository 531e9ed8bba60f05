"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``
stages.

Real decode kernels are gated behind OPTIONAL imports (Pillow / imageio /
soundfile): when the library is importable, ``decoder="real"`` decodes
genuinely; when it is not (this sandbox ships none of them),
``decoder="real"`` raises ``NotImplementedError`` naming the missing
dependency, and ``decoder="fake"`` produces deterministic hash-derived
features so the Ray-side plumbing — schema, batch sizing for large binary
payloads, actor signature, output layout — is real and tested end-to-end
either way. A skip-marked integration test exercises the real path
wherever the libraries exist.

Scale notes baked into the defaults: binary payloads make rows wide, so
these stages use small ``batch_size`` (256) and ``batch_format="pyarrow"``
(binary round-trips zero-copy through Arrow; pandas would objectify it).
"""

from __future__ import annotations

import io

import numpy as np
import pyarrow as pa


def _optional(name: str):
    try:
        return __import__(name)
    except ImportError:
        return None

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("kind", pa.string()),            # image | audio | video
        pa.field("payload", pa.binary()),
        pa.field("mime", pa.string()),
        pa.field("width", pa.int32()),            # image/video
        pa.field("height", pa.int32()),
        pa.field("duration_ms", pa.int32()),      # audio/video
    ]
)

RECOMMENDED_BATCH_SIZE = 256  # payloads are MBs; batch × concurrency must fit heap


def _hash_bytes(buf: bytes, n: int, seed: int) -> np.ndarray:
    """Deterministic pseudo-features from payload bytes (the fake decoder)."""
    h = np.frombuffer(buf[:4096].ljust(4096, b"\0"), dtype=np.uint8).astype(np.float32)
    rng = np.random.default_rng(seed + len(buf))
    w = rng.standard_normal((4096, n)).astype(np.float32)
    return (h @ w) / 4096.0


class DecodeImage:
    """payload(binary) → pixel tensor (fake: deterministic noise of the
    requested size) + feature vector. Actor-pool stage: the decoder/model
    handle is constructed once per actor."""

    def __init__(self, decoder: str = "fake", feat_dim: int = 64,
                 resize: tuple[int, int] | None = (32, 32), seed: int = 42):
        if decoder not in ("fake", "real"):
            raise ValueError("decoder must be 'fake' or 'real'")
        self.decoder, self.feat_dim, self.resize, self.seed = decoder, feat_dim, resize, seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        if self.decoder == "real":
            pil = _optional("PIL.Image") or _optional("PIL")
            if pil is None:
                raise NotImplementedError(
                    "real image decode requires Pillow ('pip install Pillow'); "
                    "not available in this container — use decoder='fake' "
                    "for plumbing tests"
                )
            from PIL import Image

            rng = np.random.default_rng(self.seed)
            proj = rng.standard_normal(
                ((self.resize[0] if self.resize else 32) *
                 (self.resize[1] if self.resize else 32), self.feat_dim)
            ).astype(np.float32)
            rows = []
            for p in payloads:
                img = Image.open(io.BytesIO(p or b"")).convert("L")
                if self.resize:
                    img = img.resize(self.resize)
                px = np.asarray(img, dtype=np.float32).reshape(-1) / 255.0
                rows.append(px @ proj)
            feats = np.stack(rows)
        else:
            feats = np.stack([_hash_bytes(p or b"", self.feat_dim, self.seed) for p in payloads])
        h, w = self.resize or (0, 0)
        return pa.table({
            "media_id": batch.column("media_id"),
            "feature": pa.array(list(feats), type=pa.list_(pa.float32(), self.feat_dim)),
            "out_width": pa.array(np.full(len(payloads), w, np.int32)),
            "out_height": pa.array(np.full(len(payloads), h, np.int32)),
        })


class SampleFrames:
    """video payload → every Nth 'frame' (fake: payload slices). Shows the
    flat-map shape: one input row explodes into F output rows."""

    def __init__(self, decoder: str = "fake", every_ms: int = 1000, max_frames: int = 8):
        self.decoder, self.every_ms, self.max_frames = decoder, every_ms, max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder == "real" and _optional("imageio") is None:
            raise NotImplementedError(
                "real video decode requires imageio/ffmpeg bindings; not "
                "available in this container"
            )
        if self.decoder == "real":
            import imageio.v3 as iio

            ids, frames, idxs = [], [], []
            for mid, payload in zip(batch.column("media_id").to_pylist(),
                                    batch.column("payload").to_pylist()):
                for f, frame in enumerate(iio.imiter(io.BytesIO(payload or b""))):
                    if f >= self.max_frames:
                        break
                    ids.append(mid)
                    idxs.append(f)
                    frames.append(np.asarray(frame).tobytes())
            return pa.table({
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            })
        ids, frames, idxs = [], [], []
        for mid, payload, dur in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("duration_ms").to_pylist(),
        ):
            n = min(max((dur or 0) // self.every_ms, 1), self.max_frames)
            step = max(len(payload or b"") // max(n, 1), 1)
            for f in range(n):
                ids.append(mid)
                idxs.append(f)
                frames.append((payload or b"")[f * step:(f + 1) * step])
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(idxs, pa.int32()),
            "frame": pa.array(frames, pa.binary()),
        })


class AudioFeatures:
    """audio payload → fixed-size feature vector (fake: hash projection;
    real: NotImplementedError at the torchaudio call site)."""

    def __init__(self, decoder: str = "fake", feat_dim: int = 32, seed: int = 7):
        self.decoder, self.feat_dim, self.seed = decoder, feat_dim, seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        if self.decoder == "real":
            sf = _optional("soundfile")
            if sf is None:
                raise NotImplementedError(
                    "real audio decode requires soundfile/librosa; not "
                    "available in this container"
                )
            rows = []
            for p in payloads:
                wav, sr = sf.read(io.BytesIO(p or b""), dtype="float32")
                wav = np.atleast_2d(wav).mean(axis=-1) if wav.ndim > 1 else wav
                # fixed-size spectral profile: log-magnitude of the first
                # feat_dim rFFT bins (pad/truncate deterministic)
                spec = np.abs(np.fft.rfft(wav, n=max(2 * self.feat_dim, 64)))
                rows.append(np.log1p(spec[: self.feat_dim]).astype(np.float32))
            feats = np.stack(rows)
        else:
            feats = np.stack([_hash_bytes(p or b"", self.feat_dim, self.seed) for p in payloads])
        return pa.table({
            "media_id": batch.column("media_id"),
            "feature": pa.array(list(feats), type=pa.list_(pa.float32(), self.feat_dim)),
        })


def synthesize_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus for plumbing tests."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    payloads = [rng.integers(0, 256, size=int(sz), dtype=np.uint8).tobytes()
                for sz in rng.integers(512, 8192, n)]
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "kind": pa.array(kinds),
        "payload": pa.array(payloads, pa.binary()),
        "mime": pa.array(["application/octet-stream"] * n),
        "width": pa.array(rng.integers(16, 512, n).astype(np.int32)),
        "height": pa.array(rng.integers(16, 512, n).astype(np.int32)),
        "duration_ms": pa.array(rng.integers(100, 8000, n).astype(np.int32)),
    }, schema=MEDIA_SCHEMA)
