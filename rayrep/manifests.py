"""Per-partition committed-offset manifests — the exactly-once frontier.

Reference analog: the pseudo-GTID safe checkpoint, stored only when the
pGTID changes and only after every applier task for it has committed
(CHANGES.txt:6-7, 37, 113-116); position tracked in a file (ZooKeeper for
HA, CHANGES.txt:82,74). Here each lake partition owns a JSON manifest
`{epoch, last_seq, state_chain, counters}` written via tmp+rename so the
commit is atomic: a retried or resumed applier either sees the committed
manifest (and skips — idempotence) or re-does the full partition-epoch
apply against the previous state (deterministic output names → overwrite,
never append).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field, fields

COUNTER_KEYS = ["input_rows", "applied", "skipped", "conflict", "deleted"]

# Rollback horizon: per-epoch history entries kept per partition manifest
# (FIFO). ~150 B each → worst case ~75 KB/manifest; the USEFUL horizon is
# anyway bounded by chain retention (compaction + gc invalidate old
# chains), so an aggressive cap costs nothing in practice.
MANIFEST_HISTORY_MAX = 512


class StaleWriterError(RuntimeError):
    """A fenced-out writer (lower lease token) tried to overwrite a
    partition manifest committed by its successor (rayrep/lease.py)."""


def zero_counters() -> dict[str, int]:
    return {k: 0 for k in COUNTER_KEYS}


def merge_counters(a: dict[str, int], b: dict[str, int]) -> dict[str, int]:
    return {k: a.get(k, 0) + b.get(k, 0) for k in COUNTER_KEYS}


@dataclass
class PartitionManifest:
    part_id: int
    epoch: int = -1                     # last fully committed epoch
    last_seq: int = -1                  # committed watermark (pGTID analog)
    # State is an LSM-ish chain: an optional full base + per-epoch delta
    # files, oldest→newest; the partition's current image is the fold
    # "newest row per key" (merge-on-read). Epoch write cost is O(delta),
    # not O(partition state); the applier compacts the chain to one full
    # file every `state_snapshot_interval` epochs (reference analog:
    # HBase's LSM keeps writes O(delta) and versions cheap, README.md:18).
    state_chain: list[str] = field(default_factory=list)
    live_rows: int = 0                  # maintained incrementally per epoch
    counters: dict[str, int] = field(default_factory=zero_counters)        # cumulative
    epoch_counters: dict[str, int] = field(default_factory=zero_counters)  # last epoch only
    max_ts_us: int = 0                  # for the replication-delay gauge
    # Fencing stamp (rayrep/lease.py): the writer-lease token this commit
    # was made under. 0 = written without a lease (legacy lakes and
    # lease-disabled runs — no fencing). Maintenance ops that load→mutate→
    # save a manifest carry the stamp through unchanged.
    lease_token: int = 0
    # Per-epoch commit history (newest last), appended by the Applier at
    # every epoch commit: {epoch, last_seq, live_rows, max_ts_us,
    # counters, epoch_counters, chain}. This is what makes IN-PLACE
    # rollback (rayrep/rollback.py) O(files): the entry for epoch k IS
    # the manifest as of k, and its recorded chain names exactly the
    # files that represented the partition then (valid until compaction/
    # purge/gc removes them — rollback checks existence and refuses).
    # Bounded FIFO (MANIFEST_HISTORY_MAX); maintenance rewrites that
    # invalidate old chains (repartition) reset it to [].
    history: list = field(default_factory=list)

    @staticmethod
    def path(lake_dir: str, part_id: int) -> str:
        return os.path.join(lake_dir, "_manifests", f"p{part_id:05d}.json")

    @classmethod
    def load(cls, lake_dir: str, part_id: int) -> "PartitionManifest":
        p = cls.path(lake_dir, part_id)
        if not os.path.exists(p):
            return cls(part_id=part_id)
        with open(p) as f:
            d = json.load(f)
        # migrate the pre-chain layout (single `state_file`) and tolerate
        # unknown fields — an old lake must resume, not TypeError inside a
        # Ray task. live_rows for migrated manifests starts at 0 and
        # becomes exact again at the next compaction recount.
        if "state_file" in d and "state_chain" not in d:
            sf = d.get("state_file")
            d["state_chain"] = [sf] if sf else []
        known = {f.name for f in fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})

    @classmethod
    def load_file(cls, path: str, part_id: int) -> "PartitionManifest":
        """Load from an explicit path (the ``.prev`` snapshot used by
        barrier-consistent readers)."""
        if not os.path.exists(path):
            return cls(part_id=part_id)
        with open(path) as f:
            d = json.load(f)
        if "state_file" in d and "state_chain" not in d:
            sf = d.get("state_file")
            d["state_chain"] = [sf] if sf else []
        known = {f.name for f in fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})

    def save(self, lake_dir: str) -> None:
        p = self.path(lake_dir, self.part_id)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        if self.lease_token > 0 and os.path.exists(p):
            # Fencing backstop: a lease-holding writer may never overwrite
            # a commit stamped by a HIGHER token — that commit belongs to
            # the successor that fenced this writer out. (Token-0 writers
            # bypass: fencing binds only writers that opted into the
            # lease; mixing leased and unleased writers forfeits it.)
            with open(p) as f:
                existing_token = int(json.load(f).get("lease_token", 0) or 0)
            if existing_token > self.lease_token:
                raise StaleWriterError(
                    f"partition {self.part_id}: manifest committed under lease "
                    f"token {existing_token} > this writer's {self.lease_token}; "
                    "writer has been fenced out (rayrep/lease.py)"
                )
        if os.path.exists(p):
            # keep exactly ONE previous version: during a round's commit
            # window this partition is AHEAD of the global barrier, and
            # `.prev` is its last at-or-below-barrier state — what
            # `read_committed` serves to concurrent readers. Manifests
            # advance once per round, so one version always spans the gap.
            with open(p, "rb") as f:
                prev = f.read()
            tmp = p + ".prev.tmp"
            with open(tmp, "wb") as f:
                f.write(prev)
            os.replace(tmp, p + ".prev")
        atomic_write_json(p, asdict(self))


@dataclass
class EpochManifest:
    """Global barrier record: epoch E is listed only after every partition
    committed E (metrics-gated, the CHANGES.txt:113-116 analog)."""

    last_epoch: int = -1
    totals: dict[str, int] = field(default_factory=zero_counters)
    replication_delay_s: float = 0.0
    # pinned at first commit: resuming with a different partition count
    # would route keys to fresh partitions and silently duplicate rows
    num_partitions: int = 0

    @staticmethod
    def path(lake_dir: str) -> str:
        return os.path.join(lake_dir, "_manifests", "epoch.json")

    @classmethod
    def load(cls, lake_dir: str) -> "EpochManifest":
        p = cls.path(lake_dir)
        if not os.path.exists(p):
            return cls()
        with open(p) as f:
            d = json.load(f)
        known = {f.name for f in fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})

    def save(self, lake_dir: str) -> None:
        os.makedirs(os.path.dirname(self.path(lake_dir)), exist_ok=True)
        atomic_write_json(self.path(lake_dir), asdict(self))


@dataclass
class LakeMeta:
    """Lake-level invariants, pinned atomically BEFORE any partition commit
    (the epoch manifest is written only after a whole epoch commits, which
    left a crash window where a resume with a different partition count
    could pass validation). Also records the lake's state-fold semantics
    (row-LWW vs changed-cells) so readers fold the chain correctly without
    being told."""

    num_partitions: int = 0
    changed_cells: bool = False
    per_cell: bool = False
    salt_turn_keys: bool = False
    # Dedup-on-ingest is a row-EXISTENCE semantic: a lake written with it
    # off contains rows a deduping resume would have dropped (and has no
    # claim index), so the flag is pinned like the routing params.
    # Defaulted False on load: legacy lakes predate the feature.
    dedup_ingest: bool = False
    # Lake-level counter history carried across layout rewrites.
    # ``repartition_lake`` resets per-partition counters to zero (they are
    # not attributable across the new layout) and moves the cumulative
    # totals here, so ``aggregate_partition_counters`` = baseline + the
    # post-rescale partition counters and the lake's lifetime metrics
    # survive any number of rescales (T5 metrics continuity).
    counters_baseline: dict[str, int] = field(default_factory=zero_counters)

    @staticmethod
    def path(lake_dir: str) -> str:
        return os.path.join(lake_dir, "_manifests", "lake.json")

    @classmethod
    def load(cls, lake_dir: str) -> "LakeMeta | None":
        p = cls.path(lake_dir)
        if not os.path.exists(p):
            return None  # pre-LakeMeta lake (migration: EpochManifest pin)
        with open(p) as f:
            d = json.load(f)
        known = {f.name for f in fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})

    def save(self, lake_dir: str) -> None:
        atomic_write_json(self.path(lake_dir), asdict(self))


def atomic_write_json(path: str, obj) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def atomic_rename(tmp_path: str, final_path: str) -> None:
    os.replace(tmp_path, final_path)


class CompactedLogError(RuntimeError):
    """An operation that needs the changelog's INTERMEDIATE history —
    point-in-time reconstruction below a compacted span's ts horizon,
    ``end_epoch`` strictly inside a span, changed-cells replay of a
    row-compacted span — was asked to run against a COMPACTED changelog
    (``rayrep.logcompact``).  Compaction keeps exactly what final-state
    replay needs (Kafka compacted-topic semantics); anything finer is
    gone by design."""


# ------------------------------------------------------------ changelog floor
class TrimmedLogError(RuntimeError):
    """An operation that needs full changelog history (fresh replay from
    epoch 0, targeted partition repair, point-in-time snapshot) was asked
    to run against a TRIMMED changelog (``retention.trim_changelog``).
    The trimmed epochs are gone by design — resume from the lake's
    committed barrier instead, or restore the archived epochs."""


def log_floor_path(changelog_dir: str) -> str:
    return os.path.join(changelog_dir, "_floor.json")


def log_floor(changelog_dir: str) -> int:
    """First epoch still present in a trimmed changelog (0 = never
    trimmed). Written ATOMICALLY BEFORE any epoch is deleted, so a crash
    mid-trim leaves a consistent view: the floor says 'epochs below may
    be absent', and survivors below it are merely not-yet-deleted."""
    p = log_floor_path(changelog_dir)
    if not os.path.exists(p):
        return 0
    with open(p) as f:
        return int(json.load(f)["first_epoch"])


def require_full_history(changelog_dir: str, op: str) -> None:
    """Raise ``TrimmedLogError`` if ``changelog_dir`` was trimmed — for
    operations whose correctness silently depends on epoch-0 history."""
    floor = log_floor(changelog_dir)
    if floor > 0:
        raise TrimmedLogError(
            f"{op} needs the changelog from epoch 0, but {changelog_dir} "
            f"was trimmed to first_epoch={floor} "
            "(retention.trim_changelog); restore the archived epochs or "
            "use the lake's committed state instead"
        )
