"""In-place rollback: rewind a lake to an earlier committed epoch barrier.

Reference anchor: the reference preserves "previous data versions" in
HBase precisely so operators can audit and restore past states
(/root/reference/README.md:17-20), and its point-in-time answer is the
snapshotter — a full Spark rebuild (README.md:22-23). The lake's LSM-ish
state chains give us something the reference never had: because every
epoch's effects land as SEPARATE chain files and every commit appends a
per-epoch history entry to the partition manifest
(rayrep/manifests.py:PartitionManifest.history), rewinding to barrier k
is an O(files) METADATA operation — restore each manifest to its
epoch-≤-k history entry and delete the now-unreferenced chain suffix —
not a replay. Replay-based alternatives remain for everything rollback
refuses: ``timetravel.as_of`` (exact at any T, out-of-place) and
``repair.repair_partitions`` (full-history rebuild).

When is rollback possible? The history entry for epoch k records the
exact chain that represented the partition at k; rollback requires those
files to still exist. Compaction/purge replace chains (their outputs
carry the CURRENT epoch number) and gc deletes superseded files, so:

- rollback works for any k whose recorded chain survives on disk —
  always true for the recent window before a compaction+gc cycle;
- after gc (or purge, which deletes eagerly) the horizon shortens and
  rollback refuses with ``RollbackError`` instead of producing a lake
  that silently lost rows;
- a repartitioned lake refuses (fresh manifests carry no history — the
  old layout's chains are gone by design);
- a partition whose FIRST commit is after k is deleted outright (it did
  not exist at barrier k) and a later resume recreates it.

Counters/watermarks restore EXACTLY (they ride in the history entry), so
a resumed replay after rollback is indistinguishable from a replay that
had only ever reached k: epochs k+1.. re-apply with the same skip/
conflict accounting as the first time. Deltas (the daily side-output)
for epochs > k are removed so downstream replica refreshes never see
rolled-back changes.

Crash safety: per-partition manifest restore is atomic (tmp+rename) and
file deletion happens only AFTER the restored manifest is durable — a
crash mid-rollback leaves every partition either rolled back or intact;
re-run to finish (idempotent: already-restored partitions match their
target entry). The global barrier is rewritten LAST, after every
partition succeeded.
"""

from __future__ import annotations

import glob
import os
import re

from rayrep.manifests import EpochManifest, LakeMeta, PartitionManifest

_EPOCH_RE = re.compile(r"state-e(\d+)")


class RollbackError(RuntimeError):
    """Rollback refused — the target epoch's recorded state is no longer
    on disk (compaction/purge/gc), the lake predates manifest history, or
    the layout was rewritten (repartition). Use ``timetravel.as_of`` or a
    full-history ``repair`` instead."""


def _file_epoch(rel: str) -> int:
    m = _EPOCH_RE.search(os.path.basename(rel))
    return int(m.group(1)) if m else -1


def _plan_partition(lake_dir: str, part_id: int, to_epoch: int) -> dict:
    """Validate one partition and return its rollback plan (no writes)."""
    m = PartitionManifest.load(lake_dir, part_id)
    if m.epoch <= to_epoch:
        return {"action": "keep", "part_id": part_id}
    entries = [h for h in m.history if h["epoch"] <= to_epoch]
    if not entries:
        if m.history:
            # every recorded commit is after to_epoch: the partition's
            # first write happened later — at barrier k it did not exist
            return {"action": "delete", "part_id": part_id, "manifest": m}
        raise RollbackError(
            f"partition {part_id}: manifest carries no commit history at "
            f"or below epoch {to_epoch} (legacy lake, or layout rewritten "
            "by repartition) — rollback cannot reconstruct its state; use "
            "timetravel.as_of or a full-history repair"
        )
    target = entries[-1]
    missing = [f for f in target["chain"]
               if not os.path.exists(os.path.join(lake_dir, f))]
    if missing:
        raise RollbackError(
            f"partition {part_id}: epoch-{target['epoch']} chain file(s) "
            f"{missing} no longer exist (compaction/purge/gc passed this "
            "point) — the rollback horizon has moved; use timetravel.as_of "
            "or a full-history repair"
        )
    return {"action": "restore", "part_id": part_id, "manifest": m,
            "entry": target}


def _execute_partition(lake_dir: str, plan: dict) -> dict:
    pid = plan["part_id"]
    if plan["action"] == "keep":
        return {"restored": 0, "deleted_parts": 0, "removed_files": 0}
    mpath = PartitionManifest.path(lake_dir, pid)
    removed = 0

    def _rm(path: str) -> None:
        nonlocal removed
        try:
            os.remove(path)
            removed += 1
        except FileNotFoundError:
            pass

    if plan["action"] == "delete":
        # partition did not exist at the target barrier
        for f in plan["manifest"].state_chain:
            _rm(os.path.join(lake_dir, f))
            _rm(os.path.join(lake_dir, f) + ".bloom")
        for p in glob.glob(os.path.join(lake_dir, "delta",
                                        f"p{pid:05d}", "e*.parquet")):
            _rm(p)
        _rm(mpath + ".prev")
        _rm(mpath)
        return {"restored": 0, "deleted_parts": 1, "removed_files": removed}

    m, e = plan["manifest"], plan["entry"]
    keep = set(e["chain"])
    old_chain = list(m.state_chain)
    m.epoch = e["epoch"]
    m.last_seq = e["last_seq"]
    m.state_chain = list(e["chain"])
    m.live_rows = e["live_rows"]
    m.max_ts_us = e["max_ts_us"]
    m.counters = dict(e["counters"])
    m.epoch_counters = dict(e["epoch_counters"])
    m.history = [h for h in m.history if h["epoch"] <= e["epoch"]]
    m.save(lake_dir)  # atomic; deletions only after the manifest is durable
    # the freshly-written .prev now snapshots the pre-rollback manifest —
    # stale by definition (it references deleted files): drop it
    _rm(mpath + ".prev")
    removed = 0
    for f in old_chain:
        if f not in keep:
            _rm(os.path.join(lake_dir, f))
            _rm(os.path.join(lake_dir, f) + ".bloom")
    # any state file above the restored epoch not in a chain (crash
    # leftovers, superseded deltas) plus rolled-back day-deltas
    for sp in glob.glob(os.path.join(lake_dir, f"part-{pid:05d}",
                                     "state-e*.parquet")):
        rel = os.path.relpath(sp, lake_dir)
        if _file_epoch(rel) > e["epoch"] and rel not in keep:
            _rm(sp)
            _rm(sp + ".bloom")
    for p in glob.glob(os.path.join(lake_dir, "delta",
                                    f"p{pid:05d}", "e*.parquet")):
        if int(re.search(r"e(\d+)\.parquet$", p).group(1)) > e["epoch"]:
            _rm(p)
    return {"restored": 1, "deleted_parts": 0, "removed_files": removed}


def rollback_lake(lake_dir: str, to_epoch: int,
                  distributed: bool = False) -> dict:
    """Rewind ``lake_dir`` in place to the state as of epoch barrier
    ``to_epoch``. Validates EVERY partition before touching ANY (an
    impossible rollback refuses up front, leaving the lake intact);
    execution is then per-partition atomic and idempotent — re-run after
    a crash to finish. ``distributed=True`` fans the execution out one
    Ray task per partition. Returns accounting."""
    from rayrep.compact import _partition_ids
    from rayrep.maintenance import run_per_partition

    em = EpochManifest.load(lake_dir)
    if to_epoch < 0 or to_epoch > em.last_epoch:
        raise ValueError(
            f"to_epoch must be in [0, {em.last_epoch}] (the committed "
            f"barrier); got {to_epoch}"
        )
    ids = _partition_ids(lake_dir)
    plans = [_plan_partition(lake_dir, pid, to_epoch) for pid in ids]

    res = run_per_partition(
        lambda pid, _plans={p["part_id"]: p for p in plans}:
            _execute_partition(lake_dir, _plans[pid]),
        ids, distributed,
    )
    from rayrep.pipeline import aggregate_partition_counters

    totals = aggregate_partition_counters(lake_dir)
    EpochManifest(last_epoch=to_epoch, totals=totals,
                  replication_delay_s=0.0,
                  num_partitions=em.num_partitions).save(lake_dir)
    lm = LakeMeta.load(lake_dir)
    if lm is not None:
        lm.save(lake_dir)  # no-op rewrite: keeps pins adjacent to barrier
    return {
        "barrier": to_epoch,
        "restored": sum(r["restored"] for r in res),
        "deleted_partitions": sum(r["deleted_parts"] for r in res),
        "removed_files": sum(r["removed_files"] for r in res),
        "totals": totals,
    }
