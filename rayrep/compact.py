"""Lake maintenance: major compaction and state-file garbage collection.

State is an LSM-ish chain per partition (`part-NNNNN/state-eEEEEE.parquet`
delta files + periodic full snapshots; manifests hold the live chain).
The applier auto-compacts when a chain exceeds
``EngineConfig.state_snapshot_interval``; ``compact_lake`` is the explicit
major compaction (fold every chain to one full file now), and ``gc_lake``
removes files that are neither in a live chain nor new enough to serve
epoch-level time travel (SURVEY.md §7.4.5: state must stay bounded).
"""

from __future__ import annotations

import glob
import os
import re

import pyarrow.compute as pc
import pyarrow.parquet as pq

from rayrep.manifests import EpochManifest, PartitionManifest

_STATE_RE = re.compile(r"state-e(\d+)(-full)?\.parquet$")


def _partition_ids(lake_dir: str) -> list[int]:
    return sorted(
        int(re.search(r"p(\d+)\.json$", mp).group(1))
        for mp in glob.glob(os.path.join(lake_dir, "_manifests", "p*.json"))
    )


def compact_lake(lake_dir: str, distributed: bool = False,
                 sort_keys: bool = True, force: bool = False) -> dict:
    """Major compaction: fold every partition's chain into one full state
    file (`state-eEEEEE-full.parquet`, epoch = the committed one) and point
    the manifest at it. Each partition's fold+rewrite+manifest-save is
    independent and manifest-atomic, so ``distributed=True`` fans it out
    as one Ray task per partition (the 10^3-partition shape);
    ``False`` keeps the Ray-free driver loop for small lakes / the CLI's
    sessionless path. Returns {"compacted": n, "skipped": n}.

    ``sort_keys`` (default on) writes the compacted file ordered by
    (conv_id, turn_idx), so parquet row-group min/max stats make point
    lookups (rayrep/lookup.py) row-group-prunable — the HBase sorted-
    region analog. Sorting is fold-neutral in both modes: a row-LWW
    compacted file holds exactly one row per key (positional last-per-key
    is vacuous), and the per-cell fold orders by (ts, __seq) itself."""
    from rayrep.maintenance import run_per_partition
    from rayrep.manifests import LakeMeta
    from rayrep.registry import SchemaRegistry

    target_json = SchemaRegistry(persist_dir=lake_dir).current_json()
    lm = LakeMeta.load(lake_dir)
    cells = bool(lm and lm.changed_cells)

    def one(part_id: int) -> dict:
        from rayrep.apply import fold_state_chain, prune_state_chain_cells
        from rayrep.schema import SchemaVersion

        target = SchemaVersion.from_json(target_json)
        # per-cell chains compact to the version-preserving PRUNED row set
        # (each cell's winner keeps its own ts/seq), never the one-row
        # image — a post-compaction late event must still resolve against
        # true cell versions (rayrep.apply.prune_cells)
        fold_fn = prune_state_chain_cells if cells else fold_state_chain
        m = PartitionManifest.load(lake_dir, part_id)
        canonical = os.path.join(
            f"part-{part_id:05d}", f"state-e{m.epoch:05d}-full.parquet")
        if not m.state_chain:
            return {"compacted": 0, "skipped": 1}
        if len(m.state_chain) <= 1 and (not force
                                        or m.state_chain == [canonical]):
            # `force` rewrites even a single-file chain unless it already
            # IS the canonical name for the committed epoch — used by
            # source-failover rebind, where chain file names carry
            # OLD-layout epoch coordinates that would collide with the
            # renumbered resume's deterministic commit names
            return {"compacted": 0, "skipped": 1}
        folded = fold_fn(lake_dir, m.state_chain, target)
        if sort_keys and folded.num_rows:
            folded = folded.take(pc.sort_indices(
                folded, sort_keys=[("conv_id", "ascending"),
                                   ("turn_idx", "ascending")]))
        out = os.path.join(
            lake_dir, f"part-{part_id:05d}", f"state-e{m.epoch:05d}-full.parquet"
        )
        from rayrep.schema import stamp_version

        from rayrep.bloom import sidecar_path, write_sidecar

        rel = os.path.relpath(out, lake_dir)
        # delete-old → rename-file → write-new: a crash window leaves no
        # sidecar (lookup just reads the file) — never a stale one whose
        # key set could under-claim the new content
        old_bloom = sidecar_path(lake_dir, rel)
        if os.path.exists(old_bloom):
            os.remove(old_bloom)
        pq.write_table(stamp_version(folded, target.version), out + ".tmp")
        os.replace(out + ".tmp", out)
        if folded.num_rows:
            write_sidecar(lake_dir, rel, folded.column("conv_id"))
        m.state_chain = [rel]
        m.save(lake_dir)  # atomic: readers see either old chain or new file
        return {"compacted": 1, "skipped": 0}

    res = run_per_partition(one, _partition_ids(lake_dir), distributed)
    return {"compacted": sum(r["compacted"] for r in res),
            "skipped": sum(r["skipped"] for r in res)}


def gc_lake(lake_dir: str, keep_epochs: int = 0) -> dict:
    """Delete state files that are NOT part of a live chain and are older
    than ``committed_epoch - keep_epochs``. Retained superseded files are
    forensic artifacts only — a delta file without its chain prefix cannot
    reconstruct a past epoch, so POINT-IN-TIME reconstruction should use
    ``timetravel.as_of`` (changelog replay — exact at any T), not retained
    state files. Never touches manifests. Returns {"deleted": n, "kept": n}."""
    deleted = kept = 0
    barrier = EpochManifest.load(lake_dir).last_epoch
    for part_id in _partition_ids(lake_dir):
        m = PartitionManifest.load(lake_dir, part_id)
        cutoff = m.epoch - keep_epochs
        live = {
            os.path.abspath(os.path.join(lake_dir, f)) for f in m.state_chain
        }
        # the .prev manifest backs barrier-consistent concurrent readers
        # (pipeline.read_committed) — but readers only reach it while the
        # partition is AHEAD of the barrier (the in-flight commit
        # window); a quiescent .prev is dead and must not pin old files
        if m.epoch > barrier:
            prev = PartitionManifest.load_file(
                PartitionManifest.path(lake_dir, part_id) + ".prev", part_id)
            live |= {
                os.path.abspath(os.path.join(lake_dir, f))
                for f in prev.state_chain
            }
        pdir = os.path.join(lake_dir, f"part-{part_id:05d}")
        for sp in glob.glob(os.path.join(pdir, "state-e*.parquet")):
            ep = int(_STATE_RE.search(sp).group(1))
            if ep < cutoff and os.path.abspath(sp) not in live:
                os.remove(sp)
                if os.path.exists(sp + ".bloom"):
                    os.remove(sp + ".bloom")  # sidecar dies with its file
                deleted += 1
            else:
                kept += 1
        for bp in glob.glob(os.path.join(pdir, "*.bloom")):
            if not os.path.exists(bp[:-len(".bloom")]):
                os.remove(bp)  # orphan sidecar (crash window)
    return {"deleted": deleted, "kept": kept}
