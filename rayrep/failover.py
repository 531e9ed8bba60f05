"""Source-failover checkpoint translation (the pGTID-failover analog).

Reference anchor: mysql-time-machine 0.12.0 resumes replication across a
MySQL master failover by translating its safe checkpoint onto the
replacement source via orchestrator pseudo-GTIDs (CHANGES.txt:17-19) —
the binlog *file/position* coordinates die with the old master, but the
logical stream position survives. The engine's analog: the lake's global
barrier is an EPOCH NUMBER in the old changelog's layout and dies with
it, but the per-partition ``last_seq`` watermarks — the pGTID — name the
exact logical position in the stream, independent of how any particular
source shards it into epochs.

``rebind_source`` points a committed lake at a REPLACEMENT changelog
that serves the same logical stream (identical events and ``seq``
assignment) under a different epoch layout — a promoted replica
publishing its own file boundaries:

1. The safe stream position: the global barrier means every event in
   the old log's epochs [0, barrier] was routed and applied, and epochs
   are CONTIGUOUS seq slices (the dense-seq contract check-log
   enforces), so the stream is complete through the barrier epoch's end
   seq. That end seq is bounded below by ``max`` over the watermarks of
   partitions AT the barrier — partitions that committed ahead of it
   (crash mid-round) are excluded, because their watermarks reflect
   epochs the rest of the lake has not sealed; their extra events
   re-read from the new log and re-skip via the seq anti-join — the
   same idempotence that powers crash resume. (Untouched partitions are
   implicitly at the barrier: the barrier only advances when every
   routed group committed, so "no manifest" means "nothing was ever
   routed here", not "behind".)
2. The new barrier is the longest prefix of the new log's epochs whose
   footer ``seq`` ranges lie entirely at/below that position (footer
   metadata only — no data bytes are read).
3. Every partition manifest is rewritten to the translated barrier
   epoch (keeping its watermark, counters and lake rows untouched);
   rollback ``history`` is reset and each state chain is force-compacted
   into the canonical ``state-e{new_barrier}-full.parquet`` — chain file
   names are old-layout epoch coordinates, and a renumbered resume's
   deterministic commit names would otherwise silently overwrite them
   (the one O(partition-state) rewrite a failover costs). An existing
   ``delta/`` stream is archived to ``delta-prefailover-N/`` for the
   same reason; downstream delta consumers must rebuild or rebase (the
   incremental-replica cap logic cannot span a renumbering).

After rebind, a normal ``replay``/``tail`` against the new changelog
resumes from the translated barrier; re-read events at/below a
partition's watermark are skipped exactly-once-style by the anti-join,
so a safe position strictly below some partitions' progress costs only
re-reading, never double-applying.
"""

from __future__ import annotations

import glob
import os

from rayrep.manifests import EpochManifest, PartitionManifest


class RebindError(ValueError):
    """The replacement changelog cannot serve this lake's position."""


def _epoch_seq_ranges(changelog_dir: str) -> list[tuple[int, int, int]]:
    """(epoch, seq_lo, seq_hi) per epoch of the new log, footer-only."""
    from rayrep.logcompact import _file_footer_stats, _span_files, span_meta
    from rayrep.pipeline import discover_epochs

    eps = discover_epochs(changelog_dir)
    if not eps:
        raise RebindError(f"no epochs in replacement log {changelog_dir}")
    out = []
    for e, p in eps:
        sm = span_meta(p)
        if sm is not None and sm.get("seq_lo") is not None:
            out.append((e, int(sm["seq_lo"]), int(sm["seq_hwm"])))
            continue
        st = _file_footer_stats(_span_files([p]))
        if st["seq_lo"] is None:
            raise RebindError(
                f"{p}: no seq statistics in parquet footers — cannot "
                "translate a checkpoint onto this log")
        out.append((e, int(st["seq_lo"]), int(st["seq_hi"])))
    return out


def rebind_source(lake_dir: str, new_changelog_dir: str) -> dict:
    """Translate the lake's checkpoint onto a replacement changelog.
    Returns the translated barrier and the safe stream position. The
    caller then resumes ``replay``/``tail`` with the new changelog dir.
    """
    em = EpochManifest.load(lake_dir)
    if em.num_partitions <= 0:
        raise RebindError(f"{lake_dir}: no committed barrier to translate")
    P = em.num_partitions
    manifests = [PartitionManifest.load(lake_dir, pid) for pid in range(P)]
    at_barrier = [m.last_seq for m in manifests if m.epoch <= em.last_epoch]
    safe_seq = max(at_barrier, default=-1)

    ranges = _epoch_seq_ranges(new_changelog_dir)
    hwm = max(hi for _, _, hi in ranges)
    if hwm < safe_seq:
        raise RebindError(
            f"replacement log ends at seq {hwm} < the lake's safe "
            f"position {safe_seq} — it is BEHIND this lake, not a "
            "continuation of its stream")
    new_barrier = -1
    for e, _lo, hi in ranges:  # discover_epochs yields ascending epochs
        if hi <= safe_seq:
            new_barrier = e
        else:
            break

    archived = None
    ddir = os.path.join(lake_dir, "delta")
    if os.path.isdir(ddir):
        n = len(glob.glob(os.path.join(lake_dir, "delta-prefailover-*")))
        archived = os.path.join(lake_dir, f"delta-prefailover-{n}")
        os.rename(ddir, archived)

    # State-chain files are DETERMINISTICALLY named by epoch
    # (state-eNNNNN[-full].parquet — retried commits overwrite, by
    # design). Those epoch numbers are OLD-layout coordinates: a resumed
    # commit for NEW epoch k would silently overwrite old epoch k's
    # chain file and destroy applied rows (caught by the rebind fuzz).
    # So: (1) rewrite every manifest to the translated barrier, (2)
    # force-compact each chain into the canonical
    # ``state-e{new_barrier}-full.parquet`` (fold machinery shared with
    # major compaction — cells-aware, bloom sidecars refreshed), then
    # (3) delete the old-numbering chain files the manifests no longer
    # reference. One O(partition-state) rewrite per failover event,
    # fan-out-able per partition.
    old_files = {rel for m in manifests for rel in m.state_chain}
    for m in manifests:
        m.epoch = new_barrier
        m.history = []  # old-layout epoch coordinates
        m.save(lake_dir)
    from rayrep.compact import compact_lake

    compact_lake(lake_dir, force=True)
    kept = {rel for pid in range(P)
            for rel in PartitionManifest.load(lake_dir, pid).state_chain}
    rewritten_chain_files = 0
    for rel in old_files - kept:
        try:
            os.remove(os.path.join(lake_dir, rel))
            rewritten_chain_files += 1
        except FileNotFoundError:
            pass
        try:
            os.remove(os.path.join(lake_dir, rel) + ".bloom")
        except FileNotFoundError:
            pass
    EpochManifest(last_epoch=new_barrier, totals=em.totals,
                  replication_delay_s=em.replication_delay_s,
                  num_partitions=P).save(lake_dir)
    return {
        "safe_seq": int(safe_seq),
        "new_barrier": int(new_barrier),
        "new_log_epochs": len(ranges),
        "reread_epochs": [e for e, _lo, hi in ranges if e > new_barrier
                          and _lo <= safe_seq],
        "archived_delta": archived,
        "rewritten_chain_files": rewritten_chain_files,
        "watermarks": {m.part_id: int(m.last_seq) for m in manifests},
    }
