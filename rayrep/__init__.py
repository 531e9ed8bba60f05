"""rayrep — a Ray-Data-native CDC / incremental-ingest engine.

A from-scratch rebuild of the *semantics* of mysql-time-machine
(reference: /root/reference/README.md:3, the binlog-flusher → replicator →
snapshotter triple) on idiomatic Ray Data primitives:

- changelog events live in partitioned Parquet (the "binlog"); ``seq`` is the
  pseudo-GTID total order (reference: CHANGES.txt:37),
- augmentation (raw row image × active schema → typed, named record;
  reference: CHANGES.txt:87,97-98) is a vectorized Arrow ``map_batches`` rewrite,
- the keyed, versioned upsert sink (reference HBase applier, README.md:17-20)
  is a hash-partitioned-by-``conv_id`` groupby shuffle feeding a stateful
  applier actor pool doing last-writer-wins by ``(ts, seq)``,
- pGTID safe checkpoints (CHANGES.txt:6-7) become per-partition committed-offset
  manifests making the sink exactly-once and resumable,
- the HBase-snapshotter point-in-time export (README.md:22-23) becomes a
  time-travel replay with a ``ts <= T`` predicate.
"""

from rayrep.config import EngineConfig
from rayrep.schema import CANONICAL_SCHEMA_V1, CANONICAL_SCHEMA_V2, CHANGELOG_SCHEMA

__all__ = [
    "EngineConfig",
    "CANONICAL_SCHEMA_V1",
    "CANONICAL_SCHEMA_V2",
    "CHANGELOG_SCHEMA",
]

__version__ = "0.1.0"
