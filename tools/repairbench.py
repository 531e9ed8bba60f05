"""Repair-cost-at-scale measurement: targeted partition repair vs full
re-replay on the bench changelog.

The 100-TB claim behind `rayrep.repair.repair_partitions` is that fixing
one lost partition costs ONE changelog re-read plus ~1/P of the
shuffle/apply — not a full re-replication. This tool measures exactly
that on the same 20M-event fixture the scaling ladder uses:

    python tools/repairbench.py            # 32 cpus, P=32, 1 partition

and prints one JSON line with full-replay wall, repair wall, the ratio,
and the repaired lake's equality check (`diff rows == 0` via fold hash).
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> dict:
    import ray

    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import bench
    from rayrep.config import EngineConfig
    from rayrep.manifests import PartitionManifest
    from rayrep.pipeline import replay
    from rayrep.repair import repair_partitions

    n_events = bench.changelog_events()
    cl = bench.ensure_changelog(n_events)
    lake = tempfile.mkdtemp(prefix="rayrep_repairbench_")
    cfg = EngineConfig(changelog_dir=cl, lake_dir=lake,
                       num_partitions=int(os.environ.get("BENCH_PARTS", "32")),
                       applier_concurrency=min(ncpu, 16),
                       epochs_per_round=int(os.environ.get("BENCH_EPR", "4")),
                       delta_output=False)
    t0 = time.perf_counter()
    replay(cfg)
    full_s = time.perf_counter() - t0

    pid = int(os.environ.get("BENCH_REPAIR_PART", "3"))
    m_before = PartitionManifest.load(lake, pid)
    shutil.rmtree(os.path.join(lake, f"part-{pid:05d}"))
    os.remove(PartitionManifest.path(lake, pid))

    t0 = time.perf_counter()
    repair_partitions(cfg, [pid])
    repair_s = time.perf_counter() - t0

    m_after = PartitionManifest.load(lake, pid)
    result = {
        "metric": "targeted repair vs full replay",
        "events": n_events,
        "num_cpus": ncpu,
        "num_partitions": cfg.num_partitions,
        "full_replay_sec": round(full_s, 3),
        "repair_1_part_sec": round(repair_s, 3),
        "repair_over_full": round(repair_s / full_s, 3),
        "rebuilt_equal": (m_after.last_seq == m_before.last_seq
                          and m_after.counters == m_before.counters
                          and m_after.live_rows == m_before.live_rows),
    }
    shutil.rmtree(lake, ignore_errors=True)
    ray.shutdown()
    return result


if __name__ == "__main__":
    print(json.dumps(main()))
