"""Lake maintenance: state-file garbage collection and compaction.

Each round writes a fresh per-partition state snapshot
(`part-NNNNN/state-eEEEEE.parquet`); manifests point at the live one.
Old snapshots enable epoch-level time travel but accumulate
(SURVEY.md §7.4.5: state must stay bounded). ``gc_lake`` removes
snapshots older than the committed one minus ``keep_epochs``.
"""

from __future__ import annotations

import glob
import os
import re

from rayrep.manifests import PartitionManifest

_STATE_RE = re.compile(r"state-e(\d+)\.parquet$")


def gc_lake(lake_dir: str, keep_epochs: int = 0) -> dict:
    """Delete per-partition state snapshots older than
    ``committed_epoch - keep_epochs``. Never touches the committed state
    file or manifests. Returns {"deleted": n, "kept": n}."""
    deleted = kept = 0
    for mp in glob.glob(os.path.join(lake_dir, "_manifests", "p*.json")):
        part_id = int(re.search(r"p(\d+)\.json$", mp).group(1))
        m = PartitionManifest.load(lake_dir, part_id)
        cutoff = m.epoch - keep_epochs
        live = os.path.join(lake_dir, m.state_file) if m.state_file else ""
        pdir = os.path.join(lake_dir, f"part-{part_id:05d}")
        for sp in glob.glob(os.path.join(pdir, "state-e*.parquet")):
            ep = int(_STATE_RE.search(sp).group(1))
            if ep < cutoff and os.path.abspath(sp) != os.path.abspath(live):
                os.remove(sp)
                deleted += 1
            else:
                kept += 1
    return {"deleted": deleted, "kept": kept}
