"""Active-schema registry: versioned schema state + history persistence.

Reference analog: the replicator's "active schema" — a shadow schema DB
that DDL statements are replayed onto (loadActiveSchema, CHANGES.txt:57),
snapshotted per version into a schema-history table named like the
namespace (CHANGES.txt:45-46). Here:

- ``SchemaRegistry`` is the plain state machine (usable driver-side and in
  tests);
- ``SchemaRegistryActor`` is the singleton ``@ray.remote`` wrapper used by
  the streaming pipeline (the J2 "broadcast small side" lookup: augmenter
  actors receive the epoch's target version once via constructor args and
  never shuffle for it);
- every version is persisted to ``<lake>/schema_versions/v{N}.json`` so a
  resumed run reloads history instead of re-deriving it.
"""

from __future__ import annotations

import glob
import os

import ray

from rayrep.manifests import atomic_write_json
from rayrep.schema import CANONICAL_SCHEMA_V1, SchemaVersion, apply_ddl


class SchemaRegistry:
    def __init__(self, persist_dir: str | None = None, initial_json: str | None = None):
        """``initial_json``: override the v1 schema (default: the canonical
        transcript schema). The engine is payload-agnostic — any table with
        the (conv_id, turn_idx, ts) key/version columns replays; extra
        payload columns ride through augment → shuffle → LWW untouched."""
        self.persist_dir = persist_dir
        base = (
            SchemaVersion.from_json(initial_json)
            if initial_json
            else SchemaVersion(1, CANONICAL_SCHEMA_V1)
        )
        self.versions: dict[int, SchemaVersion] = {base.version: base}
        self.applied_ddl_seqs: set[int] = set()
        if persist_dir:
            self._load_history()
            if initial_json:
                # persist the custom base version so later readers of this
                # lake (final_table, compact_lake) reconstruct the right
                # target schema without being handed the JSON again
                self._persist(self.versions[base.version])

    # -- persistence (schema-history table analog, CHANGES.txt:45-46) -------
    def _dir(self) -> str:
        return os.path.join(self.persist_dir, "schema_versions")

    def _load_history(self) -> None:
        import json

        for path in sorted(glob.glob(os.path.join(self._dir(), "v*.json"))):
            with open(path) as f:
                raw = f.read()
            sv = SchemaVersion.from_json(raw)
            self.versions[sv.version] = sv
            seq = json.loads(raw).get("applied_ddl_seq")
            if seq is not None:
                self.applied_ddl_seqs.add(seq)
        # legacy side file (pre round-2 layout)
        seqs = os.path.join(self._dir(), "applied_seqs.json")
        if os.path.exists(seqs):
            with open(seqs) as f:
                self.applied_ddl_seqs |= set(json.load(f))

    def _persist(self, sv: SchemaVersion, applied_seq: int | None = None) -> None:
        """ONE atomic rename per version: the applied DDL seq rides inside
        the version file itself. (Two separate files had a crash window —
        schema persisted but seq lost — after which resume re-applied the
        DDL onto the evolved schema and wedged on 'column already exists'.)"""
        if not self.persist_dir:
            return
        import json

        os.makedirs(self._dir(), exist_ok=True)
        path = os.path.join(self._dir(), f"v{sv.version:05d}.json")
        d = json.loads(sv.to_json())
        if applied_seq is not None:
            d["applied_ddl_seq"] = applied_seq
        atomic_write_json(path, d)

    # -- DDL application (M9) ------------------------------------------------
    def apply_ddl_events(self, events: list[tuple[int, str]]) -> int:
        """Apply (seq, ddl_json) events in seq order; idempotent on replayed
        seqs (a resumed epoch re-reads its DDL rows). Returns current version."""
        for seq, ddl_json in sorted(events):
            if seq in self.applied_ddl_seqs:
                continue
            nxt = apply_ddl(self.current(), ddl_json)
            self.versions[nxt.version] = nxt
            self.applied_ddl_seqs.add(seq)
            self._persist(nxt, applied_seq=seq)
        return self.current_version()

    def current_version(self) -> int:
        return max(self.versions)

    def current(self) -> SchemaVersion:
        return self.versions[self.current_version()]

    def get(self, version: int) -> SchemaVersion:
        return self.versions[version]

    def current_json(self) -> str:
        return self.current().to_json()

    def history_json(self) -> str:
        """The full version history as one JSON string (broadcast to the
        augmenter with the target version): version-exact conformance of
        event batches whose file schema predates the round's target —
        required when ``epochs_per_round`` spans a DDL and a dropped or
        renamed-away column name has been reused since."""
        import json

        return json.dumps(
            [json.loads(sv.to_json()) for _, sv in sorted(self.versions.items())]
        )


# Singleton actor wrapper (T2). num_cpus=0: it is a metadata service, not a
# compute stage — it must never reserve a slot the applier pool needs.
SchemaRegistryActor = ray.remote(num_cpus=0)(SchemaRegistry)
