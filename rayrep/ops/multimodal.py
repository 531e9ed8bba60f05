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


def _fake_proj(n: int, seed: int) -> np.ndarray:
    """The fake decoder's 4096×n projection — built ONCE per actor in
    ``__init__`` (r3 advice: regenerating a fresh gaussian per row was
    per-row Python setup in disguise).  Per-payload variation comes from
    the byte vector itself, not the matrix."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((4096, n)).astype(np.float32)


def _hash_bytes(buf: bytes, proj: np.ndarray) -> np.ndarray:
    """Deterministic pseudo-features from payload bytes (the fake decoder)."""
    h = np.frombuffer(buf[:4096].ljust(4096, b"\0"), dtype=np.uint8).astype(np.float32)
    return (h @ proj) / 4096.0


# ------------------------------------------------------------------------
# Dependency-free container codecs ("builtin" decoders)
#
# PPM (P6) and WAV (RIFF PCM16 mono) are trivial public formats decodable
# with numpy alone — they make the REAL-decode path runnable and
# hash-verifiable in environments without Pillow/soundfile: the payload
# is a genuine binary container, the decoder genuinely parses it, and the
# decoded values feed exact integer aggregates a SQL oracle reproduces.
# ------------------------------------------------------------------------

def encode_ppm(px: np.ndarray) -> bytes:
    """Binary PPM (P6, maxval 255) from an (h, w, 3) uint8 array."""
    h, w, c = px.shape
    if c != 3 or px.dtype != np.uint8:
        raise ValueError("encode_ppm expects (h, w, 3) uint8")
    return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()


def decode_ppm(buf: bytes) -> np.ndarray:
    """Parse binary PPM (P6, maxval ≤ 255, '#' comments allowed) into an
    (h, w, 3) uint8 array — no imaging library."""
    if not buf.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(buf) and buf[pos:pos + 1].isspace():
            pos += 1
        if buf[pos:pos + 1] == b"#":  # comment to end of line
            pos = buf.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(buf[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    need = w * h * 3
    raster = np.frombuffer(buf, dtype=np.uint8, count=need, offset=pos)
    return raster.reshape(h, w, 3)


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Minimal RIFF/WAVE encoder: PCM16, mono."""
    import struct

    data = np.asarray(samples, dtype="<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16,
        b"data", len(data))
    return hdr + data


def decode_wav_pcm16(buf: bytes) -> tuple[np.ndarray, int]:
    """Parse RIFF/WAVE PCM16 mono: walk the chunk list (extra chunks are
    skipped, like any conformant reader) → (int16 samples, sample_rate)."""
    import struct

    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(buf):
        cid, size = struct.unpack_from("<4sI", buf, pos)
        body = pos + 8
        if cid == b"fmt ":
            fmt, ch, rate = struct.unpack_from("<HHI", buf, body)
            bits = struct.unpack_from("<H", buf, body + 14)[0]
            if (fmt, ch, bits) != (1, 1, 16):
                raise ValueError(
                    f"only PCM16 mono supported (fmt={fmt} ch={ch} bits={bits})")
        elif cid == b"data":
            samples = np.frombuffer(buf, dtype="<i2", count=size // 2,
                                    offset=body)
        pos = body + size + (size & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return samples, rate


class DecodeImage:
    """payload(binary) → pixel tensor (fake: deterministic noise of the
    requested size) + feature vector. Actor-pool stage: the decoder/model
    handle is constructed once per actor."""

    def __init__(self, decoder: str = "fake", feat_dim: int = 64,
                 resize: tuple[int, int] | None = (32, 32), seed: int = 42):
        if decoder not in ("fake", "real", "builtin"):
            raise ValueError("decoder must be 'fake', 'real' or 'builtin'")
        self.decoder, self.feat_dim, self.resize, self.seed = decoder, feat_dim, resize, seed
        # init-once per actor: the fake projection and (for real/builtin)
        # the pixel→feature projection — never rebuilt per row/batch
        self._proj = _fake_proj(feat_dim, seed) if decoder == "fake" else None
        if decoder in ("real", "builtin"):
            rng = np.random.default_rng(seed)
            side = (resize[0] if resize else 32) * (resize[1] if resize else 32)
            self._px_proj = rng.standard_normal((side, feat_dim)).astype(np.float32)

    def _decode_builtin(self, payloads) -> np.ndarray:
        """Dependency-free REAL decode: parse each PPM payload, grayscale
        via integer mean, nearest-neighbour resize, project."""
        rows = []
        th, tw = self.resize or (32, 32)
        for p in payloads:
            px = decode_ppm(p or b"")
            gray = px.astype(np.uint16).sum(axis=2) // 3  # integer grayscale
            h, w = gray.shape
            yi = (np.arange(th) * h) // th
            xi = (np.arange(tw) * w) // tw
            small = gray[yi][:, xi].astype(np.float32).reshape(-1) / 255.0
            rows.append(small @ self._px_proj)
        return np.stack(rows)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        if self.decoder == "builtin":
            feats = self._decode_builtin(payloads)
        elif self.decoder == "real":
            pil = _optional("PIL.Image") or _optional("PIL")
            if pil is None:
                raise NotImplementedError(
                    "real image decode requires Pillow ('pip install Pillow'); "
                    "not available in this container — use decoder='fake' "
                    "for plumbing tests"
                )
            from PIL import Image

            rows = []
            for p in payloads:
                img = Image.open(io.BytesIO(p or b"")).convert("L")
                if self.resize:
                    img = img.resize(self.resize)
                px = np.asarray(img, dtype=np.float32).reshape(-1) / 255.0
                rows.append(px @ self._px_proj)
            feats = np.stack(rows)
        else:
            feats = np.stack([_hash_bytes(p or b"", self._proj) for p in payloads])
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
        if decoder not in ("fake", "real", "builtin"):
            raise ValueError("decoder must be 'fake', 'real' or 'builtin'")
        self.decoder, self.feat_dim, self.seed = decoder, feat_dim, seed
        self._proj = _fake_proj(feat_dim, seed) if decoder == "fake" else None

    def _spectral(self, wav: np.ndarray) -> np.ndarray:
        # fixed-size spectral profile: log-magnitude of the first
        # feat_dim rFFT bins (pad/truncate deterministic)
        spec = np.abs(np.fft.rfft(wav, n=max(2 * self.feat_dim, 64)))
        return np.log1p(spec[: self.feat_dim]).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        if self.decoder == "builtin":
            # dependency-free REAL decode: parse the RIFF/WAVE container
            feats = np.stack([
                self._spectral(decode_wav_pcm16(p or b"")[0]
                               .astype(np.float32) / 32768.0)
                for p in payloads])
        elif self.decoder == "real":
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
                rows.append(self._spectral(wav))
            feats = np.stack(rows)
        else:
            feats = np.stack([_hash_bytes(p or b"", self._proj) for p in payloads])
        return pa.table({
            "media_id": batch.column("media_id"),
            "feature": pa.array(list(feats), type=pa.list_(pa.float32(), self.feat_dim)),
        })


def _codec_image_dims(media_id: int) -> tuple[int, int]:
    """(h, w) of the synthetic PPM for a media id — simple closed forms so
    a SQL oracle can regenerate the expected pixel stream."""
    return 12 + media_id % 3, 20 + media_id % 4


def _codec_audio_len(media_id: int) -> int:
    return 1000 + 100 * (media_id % 7)


def synthesize_codec_media_table(n: int = 64) -> pa.Table:
    """Deterministic REAL-container media corpus: even ids are binary PPM
    images with pixel[i] = (id*7 + i*13) % 256 over h*w*3 bytes, odd ids
    are RIFF/WAVE PCM16 mono with sample[i] = ((id*31 + i*17) % 4096) -
    2048.  The value streams are closed-form, so after a GENUINE container
    decode the integer aggregates are exactly reproducible in SQL — this
    is what lets ``MediaStats`` be hash-oracled instead of rows-only."""
    ids = np.arange(n, dtype=np.int64)
    payloads, kinds, mimes, widths, heights, durs = [], [], [], [], [], []
    for mid in ids:
        mid = int(mid)
        if mid % 2 == 0:
            h, w = _codec_image_dims(mid)
            i = np.arange(h * w * 3, dtype=np.int64)
            px = ((mid * 7 + i * 13) % 256).astype(np.uint8).reshape(h, w, 3)
            payloads.append(encode_ppm(px))
            kinds.append("image")
            mimes.append("image/x-portable-pixmap")
            widths.append(w)
            heights.append(h)
            durs.append(0)
        else:
            m = _codec_audio_len(mid)
            i = np.arange(m, dtype=np.int64)
            s = ((mid * 31 + i * 17) % 4096 - 2048).astype(np.int16)
            payloads.append(encode_wav_pcm16(s, 16000))
            kinds.append("audio")
            mimes.append("audio/wav")
            widths.append(0)
            heights.append(0)
            durs.append(m * 1000 // 16000)
    return pa.table({
        "media_id": pa.array(ids),
        "kind": pa.array(kinds),
        "payload": pa.array(payloads, pa.binary()),
        "mime": pa.array(mimes),
        "width": pa.array(np.asarray(widths, np.int32)),
        "height": pa.array(np.asarray(heights, np.int32)),
        "duration_ms": pa.array(np.asarray(durs, np.int32)),
    }, schema=MEDIA_SCHEMA)


class MediaStats:
    """Builtin-decode verification stage: parse each payload's REAL binary
    container (PPM via ``decode_ppm``, WAV via ``decode_wav_pcm16`` — by
    mime type) and emit EXACT integer aggregates of the decoded values:
    count, sum, position-weighted sum (pins element order), min, max.
    Any header mis-parse, offset error, byte-order mistake, or dropped
    sample changes the aggregates — so a SQL oracle over the closed-form
    value streams verifies the decoder itself, not just the plumbing."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        out = {
            "media_id": batch.column("media_id"),
            "kind": batch.column("kind"),
            "n_values": np.empty(n, np.int64),
            "sum_values": np.empty(n, np.int64),
            "wsum_values": np.empty(n, np.int64),
            "min_value": np.empty(n, np.int64),
            "max_value": np.empty(n, np.int64),
        }
        mimes = batch.column("mime").to_pylist()
        payloads = batch.column("payload").to_pylist()
        for j, (mime, p) in enumerate(zip(mimes, payloads)):
            if mime == "image/x-portable-pixmap":
                v = decode_ppm(p or b"").reshape(-1).astype(np.int64)
            elif mime == "audio/wav":
                v = decode_wav_pcm16(p or b"")[0].astype(np.int64)
            else:
                raise ValueError(f"MediaStats: unsupported mime {mime!r}")
            out["n_values"][j] = len(v)
            out["sum_values"][j] = int(v.sum())
            out["wsum_values"][j] = int((np.arange(len(v), dtype=np.int64) * v).sum())
            out["min_value"][j] = int(v.min())
            out["max_value"][j] = int(v.max())
        return pa.table({k: (pa.array(x) if isinstance(x, np.ndarray) else x)
                         for k, x in out.items()})


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
