"""Barrier-consistent lake clone: the DR / backup operator.

Reference anchor: HBase table snapshots — a snapshot is a manifest of
immutable HFiles plus metadata, cheap because store files are never
rewritten in place (README.md:17-20 store semantics; the reference's
snapshotter reads such consistent images). The lake has the same
immutability discipline (every state/delta file is written tmp+rename,
never mutated), so a clone is: the barrier-consistent manifest set (the
same ``.prev`` logic that backs ``read_committed``) plus hardlinks to
the immutable files it names.

The clone is a fully independent lake AS OF the global epoch barrier:
- readable (``final_table`` / ``lookup`` / ``read_committed``),
- resumable (``replay`` into it continues from barrier+1 — together
  with ``retention.trim_changelog`` this closes the DR loop: bounded
  changelog + restorable state),
- immune to the source's later compaction/gc (hardlink count keeps the
  bytes alive; ``mode="copy"`` for cross-filesystem targets).

Safe under a LIVE replay: partitions ahead of the barrier clone their
``.prev`` manifest (one version always spans the in-flight round); if
the barrier advances twice mid-scan the clone restarts (same bounded
optimistic retry as ``read_committed``).

Cost: O(files) link() calls + O(partitions) small jsons — no data
movement on one filesystem; at 100 TB the clone of a P=4096 lake is
seconds of metadata, not a copy of the lake.
"""

from __future__ import annotations

import glob
import os
import re
import shutil

from rayrep.manifests import EpochManifest, LakeMeta, PartitionManifest

_DELTA_RE = re.compile(r"e(\d+)\.parquet$")


def _link_or_copy(src: str, dst: str, copy: bool) -> None:
    if copy:
        shutil.copy2(src, dst)
        return
    try:
        os.link(src, dst)
    except OSError:
        shutil.copy2(src, dst)  # cross-device fallback


def clone_lake(src: str, dst: str, mode: str = "hardlink",
               include_delta: bool = True) -> dict:
    """Clone ``src`` into fresh ``dst`` as of the committed barrier."""
    if mode not in ("hardlink", "copy"):
        raise ValueError(f"mode must be hardlink|copy, got {mode!r}")
    if os.path.exists(dst) and os.listdir(dst):
        raise FileExistsError(f"{dst} exists and is not empty")
    copy = mode == "copy"
    for _ in range(8):
        em = EpochManifest.load(src)
        k = em.last_epoch
        manifests: list[PartitionManifest] = []
        ok = True
        for mp in sorted(glob.glob(os.path.join(src, "_manifests",
                                                "p*.json"))):
            part_id = int(re.search(r"p(\d+)\.json$", mp).group(1))
            m = PartitionManifest.load(src, part_id)
            if m.epoch > k:
                m = PartitionManifest.load_file(mp + ".prev", part_id)
                if m.epoch > k:
                    ok = False
                    break
            manifests.append(m)
        if ok:
            break
    else:
        raise RuntimeError(f"{src}: barrier kept advancing during clone")
    os.makedirs(os.path.join(dst, "_manifests"), exist_ok=True)
    n_files = 0
    for m in manifests:
        for rel in m.state_chain:
            sp, dp = os.path.join(src, rel), os.path.join(dst, rel)
            os.makedirs(os.path.dirname(dp), exist_ok=True)
            _link_or_copy(sp, dp, copy)
            n_files += 1
            if os.path.exists(sp + ".bloom"):  # sidecar travels with file
                _link_or_copy(sp + ".bloom", dp + ".bloom", copy)
        m.save(dst)
    em.save(dst)
    lm = LakeMeta.load(src)
    if lm is not None:
        lm.save(dst)
    for aux in ("schema_versions", "_erasures"):
        sdir = os.path.join(src, aux)
        if os.path.isdir(sdir):
            os.makedirs(os.path.join(dst, aux), exist_ok=True)
            for f in os.listdir(sdir):
                _link_or_copy(os.path.join(sdir, f),
                              os.path.join(dst, aux, f), copy)
    n_delta = 0
    if include_delta and os.path.isdir(os.path.join(src, "delta")):
        for pdir in sorted(os.listdir(os.path.join(src, "delta"))):
            spd = os.path.join(src, "delta", pdir)
            dpd = os.path.join(dst, "delta", pdir)
            os.makedirs(dpd, exist_ok=True)
            for f in sorted(os.listdir(spd)):
                mm = _DELTA_RE.search(f)
                if mm and int(mm.group(1)) <= k:  # barrier-consistent stream
                    _link_or_copy(os.path.join(spd, f),
                                  os.path.join(dpd, f), copy)
                    n_delta += 1
    return {"barrier": k, "partitions": len(manifests),
            "state_files": n_files, "delta_files": n_delta, "mode": mode}
