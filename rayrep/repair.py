"""Targeted partition repair: rebuild damaged partitions from the changelog.

Reference analog: the replication validator finds MySQL↔HBase divergence
and the fix is a targeted re-copy of the affected rows, never a full
re-replication (README.md:19-20 validation loop). Here `check --deep`
(rayrep/check.py) finds a corrupted/lost partition, and
``repair_partitions`` rebuilds ONLY that partition from the changelog:

- the partition's directory and manifest are discarded (its manifest
  watermark is what makes the applier idempotent — a fresh manifest means
  "apply everything again");
- the normal replay loop re-runs epochs 0..barrier with the exchange
  FILTERED to the repaired partitions (``_only_part_ids``): the changelog
  is re-read (unavoidable — the partition's events are scattered through
  it), but only ~|part_ids|/P of the rows are shuffled and applied;
- the global epoch barrier is never moved: healthy partitions stay at the
  committed frontier and remain readable throughout; the repaired
  partition lags the barrier (legal — BEHIND is a valid lag state) until
  its rebuild commits epoch by epoch.

Exactness: the rebuild replays the same events through the same
deterministic LWW fold, so the repaired partition's converged table,
seq watermark, and lifetime counters are identical to an undamaged
replay's (differential-tested, and SQL-oracled end-to-end by the
``cdc_partition_repair`` driver query).

Limits, by design:
- Repair rebuilds from the CHANGELOG. Retention actions that are lake
  state, not changelog events (``erase_keys``/``purge_lake``), must be
  re-applied to the repaired partitions afterwards — the caller owns
  that list (erasure requests are request-sized, never derived by
  scanning).
- A crash mid-repair leaves the partition behind the barrier with a
  partial chain; normal replay will NOT revisit those epochs. Re-run
  ``repair_partitions`` (it restarts from a clean slate); ``check
  --deep`` detects the inconsistent state either way.
"""

from __future__ import annotations

import os
import shutil

from rayrep.config import EngineConfig
from rayrep.manifests import EpochManifest, PartitionManifest


def repair_partitions(cfg: EngineConfig, part_ids: list[int]) -> dict:
    """Discard and rebuild ``part_ids`` of ``cfg.lake_dir`` from
    ``cfg.changelog_dir``. Returns the repair run's replay metrics —
    ``totals`` are lake-wide lifetime counters (recomputed from the
    rebuilt manifests); the per-epoch rows cover the filtered rows
    only."""
    from rayrep.pipeline import replay

    ids = sorted(set(int(p) for p in part_ids))
    if not ids:
        raise ValueError("repair_partitions: empty part_ids")
    bad = [p for p in ids if p < 0 or p >= cfg.num_partitions]
    if bad:
        raise ValueError(
            f"repair_partitions: part ids {bad} outside 0..{cfg.num_partitions - 1}"
        )
    em = EpochManifest.load(cfg.lake_dir)
    if em.last_epoch < 0:
        raise ValueError(
            f"{cfg.lake_dir}: no committed epoch barrier — nothing to repair "
            "(run replay instead)"
        )
    for p in ids:
        pdir = os.path.join(cfg.lake_dir, f"part-{p:05d}")
        if os.path.isdir(pdir):
            shutil.rmtree(pdir)
        mp = PartitionManifest.path(cfg.lake_dir, p)
        for path in (mp, mp + ".prev"):
            if os.path.exists(path):
                os.remove(path)
    return replay(cfg, end_epoch=em.last_epoch, _start_epoch=0,
                  _only_part_ids=tuple(ids))
