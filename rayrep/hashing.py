"""Stable, vectorized key hashing for partition routing.

Reference analog: the HBase row key salt — first 4 bytes of md5 joined with
';' to the primary-key string (CHANGES.txt:102-104) — exists to spread hot
key ranges across regions. In Ray Data the same job is done by a hash
partition id computed per batch and a hash shuffle; the hash must be stable
across processes (no Python ``hash()``, which is salted per process).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def stable_hash_strings(values) -> np.ndarray:
    """Deterministic uint64 hash of a string array; vectorized (C speed via
    pandas' hash_array, which uses a fixed SipHash key)."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_numpy(zero_copy_only=False)
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, categorize=False)


def partition_ids(conv_ids, num_partitions: int) -> np.ndarray:
    """part_id = stable_hash(conv_id) % P, as int32."""
    return (stable_hash_strings(conv_ids) % np.uint64(num_partitions)).astype(np.int32)


def partition_ids_salted(conv_ids, turn_idx, num_partitions: int) -> np.ndarray:
    """Hot-key salting: part_id = (hash(conv_id) ^ mix(turn_idx)) % P —
    spreads ONE zipf-hot conversation's turns across partitions instead of
    pinning them to a single applier.  Correctness-neutral for the engine:
    every contract (LWW state, watermark anti-join, manifests, chain
    folds) is per (conv_id, turn_idx), so routing only needs to be STABLE
    across epochs/resumes — which the LakeMeta pin enforces."""
    h = stable_hash_strings(conv_ids)
    t = np.asarray(turn_idx, dtype=np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
    return ((h ^ t) % np.uint64(num_partitions)).astype(np.int32)
