"""Per-state-file key bloom sidecars: the lookup negative fast path.

Reference anchor: HBase's per-HFile row bloom filters — a get() consults
the bloom before touching an HFile, so a key-addressed read skips store
files that cannot contain the key (README.md:17-20 store semantics). A
lake partition's state CHAIN plays the HFile-set role here: point
lookups (rayrep/lookup.py) consult a small ``<state-file>.bloom``
sidecar and fold only the chain files that might contain a requested
key.

Safety argument (why a stale-but-superset sidecar can never corrupt a
read): a bloom false POSITIVE costs one extra file read; a false
negative would silently drop rows, so the invariant maintained by every
writer is "a sidecar's key set is a SUPERSET of its file's keys".
Writers that rewrite a path with a key SUBSET (``purge_lake`` dropping
rows) may leave the old sidecar; writers that could add keys to a path
never reuse paths (appliers emit one new delta file per epoch; repair
deletes the whole partition dir first). ``compact_lake`` refreshes the
sidecar with delete-old → rename-file → write-new ordering, so a crash
window leaves no sidecar at all — and lookup simply reads the file.

Format: 16-byte header (magic, n_bits, k) + the bit array; sized at
~10 bits/key (k=7 → ≲1% false positives), capped at 8 MiB. Hashing is
double-hashing over the engine's stable 64-bit key hash (the same
``stable_hash_strings`` that routes partitions), so build and probe are
vectorized numpy end-to-end.
"""

from __future__ import annotations

import os
import struct

import numpy as np

from rayrep.hashing import stable_hash_strings

_MAGIC = b"RBLM"
_K = 7
_BITS_PER_KEY = 10
_MAX_BITS = 8 * (8 << 20)  # 8 MiB


def _positions(hashes: np.ndarray, n_bits: int) -> np.ndarray:
    """(n, k) bit positions via double hashing: h1 + i*h2 (h2 forced
    odd so every probe stride is a unit mod any power-of-two-free
    n_bits; n_bits is kept odd-friendly by construction below)."""
    h = hashes.astype(np.uint64, copy=False)
    h1 = h
    h2 = (h >> np.uint64(33)) | np.uint64(1)
    i = np.arange(_K, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(n_bits)).astype(np.int64)


def build_bloom(conv_ids) -> bytes:
    """Bloom filter bytes for an array of conv_id strings (duplicates
    fine). Deterministic: same key set → same bytes."""
    hashes = stable_hash_strings(conv_ids)
    n = max(int(len(hashes)), 1)
    n_bits = int(min(max(1024, n * _BITS_PER_KEY), _MAX_BITS))
    bits = np.zeros((n_bits + 7) // 8, dtype=np.uint8)
    pos = _positions(hashes, n_bits).ravel()
    np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    return _MAGIC + struct.pack("<qi", n_bits, _K) + bits.tobytes()


def might_contain_any(blob: bytes, hashes: np.ndarray) -> bool:
    """True iff ANY of the key hashes might be in the filter."""
    if blob[:4] != _MAGIC:
        raise ValueError("not a rayrep bloom sidecar")
    n_bits, k = struct.unpack("<qi", blob[4:16])
    if k != _K:
        raise ValueError(f"unsupported bloom k={k}")
    bits = np.frombuffer(blob, dtype=np.uint8, offset=16)
    pos = _positions(np.asarray(hashes, dtype=np.uint64), n_bits)
    hit = (bits[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
    return bool(hit.all(axis=1).any())


def sidecar_path(lake_dir: str, rel_state_file: str) -> str:
    return os.path.join(lake_dir, rel_state_file + ".bloom")


def write_sidecar(lake_dir: str, rel_state_file: str, conv_ids) -> str:
    """Atomic sidecar write (tmp+rename) for a state file's key column."""
    p = sidecar_path(lake_dir, rel_state_file)
    blob = build_bloom(conv_ids)
    with open(p + ".tmp", "wb") as f:
        f.write(blob)
    os.replace(p + ".tmp", p)
    return p


def chain_candidates(lake_dir: str, chain: list[str],
                     conv_ids) -> list[str]:
    """The chain files that MIGHT contain any of ``conv_ids`` — files
    with a sidecar proving absence are skipped; files without one are
    kept (absence of a bloom never loses rows). Fold order preserved."""
    hashes = stable_hash_strings(list(conv_ids))
    keep = []
    for f in chain:
        p = sidecar_path(lake_dir, f)
        if os.path.exists(p):
            with open(p, "rb") as fh:
                if not might_contain_any(fh.read(), hashes):
                    continue
        keep.append(f)
    return keep
