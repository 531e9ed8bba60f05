"""Retention and erasure: bounded lake history as an explicit operator.

Reference anchor: the reference's primary store is HBase, where column
families carry a TTL and expired cells vanish at (minor/major)
compaction — retention is a STORE property applied when files rewrite,
not a per-read filter (README.md:17-20 store semantics). Here the lake
is Parquet chains, so the same semantics become two explicit operators:

- ``erase_keys(lake, conv_ids)`` — targeted erasure (GDPR/right-to-be-
  forgotten): the keys land in a small audit list
  (``_erasures/erased.json``, atomic rewrite, idempotent) that readers
  apply IMMEDIATELY (``final_table`` anti-filters it — erasure must be
  visible before any physical rewrite happens) and the next ``purge``
  or replay-time read applies physically. Erasure lists are small by
  nature (requests, not scans); readers ship the set in the fold
  closure — one serialization per task, ``ray.put`` it if a list ever
  grows large.
- ``purge_lake(lake, before_ts_us=None)`` — the compaction that makes
  retention physical: one bounded fold+rewrite per partition (the
  ``compact_lake`` shape) dropping (a) all erased keys and (b) every
  row — live OR tombstone — whose LWW ``ts`` is below the cutoff.
  Dropping old tombstones is safe: the seq watermark already guarantees
  events at-or-below it never re-apply, so a tombstone's shadow is
  never needed again after commit. An explicit ``before_ts_us`` keeps
  the operator deterministic and SQL-oracle-able; a standing TTL
  policy is just this operator on a schedule (cron the CLI).

Semantics note (documented, tested): erasure and TTL are POINT-IN-TIME
— a later epoch's INSERT for an erased key legitimately re-creates the
row (new data, new consent). The changelog and the ``delta/`` stream
are upstream/downstream artifacts with their own retention owners;
these operators govern the lake state only.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from rayrep.manifests import LakeMeta, PartitionManifest, atomic_write_json

_ERASE_PATH = ("_erasures", "erased.json")


def erasure_path(lake_dir: str) -> str:
    return os.path.join(lake_dir, *_ERASE_PATH)


def load_erased(lake_dir: str) -> frozenset[str]:
    p = erasure_path(lake_dir)
    if not os.path.exists(p):
        return frozenset()
    with open(p) as f:
        return frozenset(json.load(f)["conv_ids"])


def erase_keys(lake_dir: str, conv_ids: list[str]) -> dict:
    """Record an erasure request. Readers anti-filter the list at once;
    ``purge_lake`` makes it physical. Idempotent (set union), atomic
    (tmp+rename), audit-preserving (the list only grows)."""
    cur = set(load_erased(lake_dir))
    before = len(cur)
    cur.update(str(c) for c in conv_ids)
    atomic_write_json(erasure_path(lake_dir), {"conv_ids": sorted(cur)})
    return {"erased_total": len(cur), "added": len(cur) - before}


def _erase_filter(t: pa.Table, erased: frozenset[str]) -> pa.Table:
    if not erased or t.num_rows == 0:
        return t
    return t.filter(
        pc.invert(pc.is_in(t["conv_id"], value_set=pa.array(sorted(erased))))
    )


def purge_lake(lake_dir: str, before_ts_us: int | None = None,
               distributed: bool = False) -> dict:
    """Physical retention pass: fold every partition's chain and rewrite
    it WITHOUT erased keys and without rows older than ``before_ts_us``
    (live and tombstone alike — the seq watermark keeps old events from
    ever re-applying, so expired tombstones shadow nothing). Each
    partition's rewrite is manifest-atomic and independent, so a crash
    mid-purge leaves every partition either purged or intact — re-run to
    finish; ``distributed=True`` fans out one Ray task per partition
    (the ``compact_lake`` shape). Returns dropped-row accounting."""
    from rayrep.compact import _partition_ids
    from rayrep.maintenance import run_per_partition
    from rayrep.registry import SchemaRegistry

    target_json = SchemaRegistry(persist_dir=lake_dir).current_json()
    lm = LakeMeta.load(lake_dir)
    cells = bool(lm and lm.changed_cells)
    erased = load_erased(lake_dir)

    def one(part_id: int) -> dict:
        from rayrep.apply import (
            _live_count,
            _live_count_cells,
            fold_state_chain,
            prune_state_chain_cells,
            write_parquet_atomic,
        )
        from rayrep.schema import SchemaVersion

        target = SchemaVersion.from_json(target_json)
        # per-cell lakes purge over the version-preserving pruned row set
        # (the ts cutoff then drops old cell VERSIONS — retention's job —
        # while surviving cells keep their true versions for late events)
        fold_fn = prune_state_chain_cells if cells else fold_state_chain
        m = PartitionManifest.load(lake_dir, part_id)
        if not m.state_chain:
            return {"dropped_erased": 0, "dropped_expired": 0}
        state = fold_fn(lake_dir, m.state_chain, target)
        n0 = state.num_rows
        state = _erase_filter(state, erased)
        n1 = state.num_rows
        if before_ts_us is not None and state.num_rows:
            ts = state.column("ts").cast(pa.int64())
            state = state.filter(pc.greater_equal(ts, before_ts_us))
        n2 = state.num_rows
        if n2 == n0 and len(m.state_chain) == 1:
            return {"dropped_erased": 0, "dropped_expired": 0}
        out = os.path.join(
            lake_dir, f"part-{part_id:05d}", f"state-e{m.epoch:05d}-full.parquet"
        )
        from rayrep.schema import stamp_version

        write_parquet_atomic(stamp_version(state, target.version), out)
        old_chain = list(m.state_chain)
        m.state_chain = [os.path.relpath(out, lake_dir)]
        # pruned per-cell state keeps several rows per key: count live
        # KEYS via the per-cell argmax, not per-row masks
        m.live_rows = _live_count_cells(state) if cells else _live_count(state)
        m.save(lake_dir)  # atomic: readers see old chain or purged file
        # Erasure must be PHYSICAL: unlike `compact` (which leaves
        # superseded files for `gc`), purge removes them itself — a
        # superseded state file still carrying an erased key is exactly
        # what the operator exists to destroy.
        for f in old_chain:
            if f not in m.state_chain:
                try:
                    os.remove(os.path.join(lake_dir, f))
                except FileNotFoundError:
                    pass
        return {"dropped_erased": n0 - n1, "dropped_expired": n1 - n2}

    res = run_per_partition(one, _partition_ids(lake_dir), distributed)
    return {"dropped_erased": sum(r["dropped_erased"] for r in res),
            "dropped_expired": sum(r["dropped_expired"] for r in res),
            "erased_keys": len(erased)}


# ------------------------------------------------------------- changelog trim
def trim_changelog(changelog_dir: str, lake_dir: str,
                   keep_from_epoch: int, archive_dir: str | None = None) -> dict:
    """Bound the changelog itself: drop (or archive) epochs below
    ``keep_from_epoch``, recording the durable floor marker first.

    At the design scale the changelog is the largest artifact in the
    system (10^10 events vs a keys-sized lake) — it cannot grow forever.
    The reference's analog is binlog file rotation+expiry on the MySQL
    side: binlogs the replicator has safely passed (pGTID checkpoint
    committed, CHANGES.txt:74,82) are the DBA's to expire. Here "safely
    passed" is the lake's global epoch barrier: every trimmed epoch must
    be committed in ``lake_dir`` (barrier >= keep_from_epoch - 1), so
    resume/tail never needs it again.

    Ordering is crash-safe: the ``_floor.json`` marker is written
    ATOMICALLY BEFORE any deletion, so a crash mid-trim leaves a log
    whose floor already declares 'epochs below may be absent' — readers
    that need full history (fresh replay from 0, targeted repair,
    point-in-time snapshot, bootstrap-from-log) check the floor and
    refuse with ``TrimmedLogError`` instead of producing a silently
    incomplete table. With ``archive_dir`` the epochs are MOVED there
    (restorable: move them back and delete ``_floor.json``); without it
    they are deleted.

    The lake barrier check makes trim safe under a live leased tailer:
    a tailer only ever reads epochs ABOVE the barrier.
    """
    from rayrep.manifests import EpochManifest, log_floor, log_floor_path
    from rayrep.pipeline import discover_epochs

    em = EpochManifest.load(lake_dir)
    if em.last_epoch < keep_from_epoch - 1:
        raise ValueError(
            f"cannot trim {changelog_dir} below epoch {keep_from_epoch}: "
            f"lake {lake_dir} has only committed through epoch "
            f"{em.last_epoch} — trimmed epochs would be unrecoverable"
        )
    cur = log_floor(changelog_dir)
    if keep_from_epoch <= cur:
        return {"trimmed": [], "first_epoch": cur}
    atomic_write_json(log_floor_path(changelog_dir),
                      {"first_epoch": int(keep_from_epoch)})
    trimmed = []
    for e, p in discover_epochs(changelog_dir):
        if e >= keep_from_epoch:
            continue
        if archive_dir is not None:
            os.makedirs(archive_dir, exist_ok=True)
            os.replace(p, os.path.join(archive_dir, os.path.basename(p)))
        else:
            # rename first so the epoch disappears atomically from the
            # tailer's epoch-* glob, then delete at leisure
            trash = os.path.join(os.path.dirname(p),
                                 f"_trash-{os.path.basename(p)}")
            os.replace(p, trash)
            if os.path.isdir(trash):
                import shutil

                shutil.rmtree(trash)
            else:
                os.remove(trash)
        trimmed.append(e)
    return {"trimmed": trimmed, "first_epoch": int(keep_from_epoch),
            "archived_to": archive_dir}
