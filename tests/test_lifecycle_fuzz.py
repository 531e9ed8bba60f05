"""Randomized full-lifecycle differential fuzz of the engine.

Every trial generates a random changelog (zipf skew, deletes, snapshot
prefix, mid-stream DDL, ts ties/inversions, optionally changed-cells
updates), replays it through a RANDOM engine configuration (partitions,
salting, map-combine levels, exchange flavor, packing, chaos injection,
compaction cadence, epochs-per-round) with a RANDOM lifecycle
interleaving (split replay at a random epoch, then redeliver / compact /
repartition mid-stream), and diffs the converged lake against the
sequential pure-Python oracle — final table AND applied/conflict
counters (reference analog: metrics-gated replication validation,
CHANGES.txt:113-116). A final full redelivery must be an exact no-op
(exactly-once, README.md:17-20).

Deterministic seeds (no hypothesis): each trial is a fixed point in the
config × lifecycle space, so a failure reproduces from its seed alone.
"""

import dataclasses
import os

import numpy as np
import pytest

from rayrep.compact import compact_lake
from rayrep.config import EngineConfig
from rayrep.gen import GenSpec, generate_changelog, write_changelog
from rayrep.pipeline import final_table_pandas, replay
from rayrep.repart import repartition_lake

from .oracle import replay_oracle
from .test_replay import assert_frames_equal


def _random_spec(rng: np.random.Generator, changed_cells: bool) -> GenSpec:
    return GenSpec(
        seed=int(rng.integers(1, 2**31)),
        n_conversations=int(rng.integers(8, 60)),
        max_turns=int(rng.integers(1, 8)),
        n_events=int(rng.integers(200, 900)),
        zipf_a=float(rng.choice([0.0, 1.1, 1.6])),
        delete_frac=float(rng.choice([0.0, 0.12, 0.3])),
        snapshot_frac=float(rng.choice([0.0, 0.2])),
        n_epochs=int(rng.integers(2, 6)),
        changed_cells_frac=0.6 if changed_cells else 0.0,
    )


def _random_cfg(rng: np.random.Generator, cl: str, lake: str,
                changed_cells: bool) -> EngineConfig:
    return EngineConfig(
        changelog_dir=cl,
        lake_dir=lake,
        num_partitions=int(rng.integers(2, 6)),
        applier_concurrency=2,
        salt_turn_keys=bool(rng.integers(0, 2)),
        map_combine=bool(rng.integers(0, 2)),
        map_combine2=bool(rng.integers(0, 2)),
        exchange=str(rng.choice(["groupby", "staged"])),
        pack_exchange=bool(rng.integers(0, 2)),
        validate_events=bool(rng.integers(0, 2)),
        chaos_fraction=float(rng.choice([0.0, 0.15])),
        chaos_seed=int(rng.integers(1, 1 << 16)),
        state_snapshot_interval=int(rng.choice([1, 2, 4])),
        delta_output=bool(rng.integers(0, 2)),
        changed_cells_updates=changed_cells,
        epochs_per_round=int(rng.choice([1, 2])),
    )


@pytest.mark.parametrize("seed", [101, 202, 303, 404, 505, 606, 707, 808])
def test_lifecycle_fuzz_matches_oracle(tmp_path, seed):
    rng = np.random.default_rng(seed)
    changed_cells = bool(rng.integers(0, 2))
    spec = _random_spec(rng, changed_cells)
    cl, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    write_changelog(cl, spec)
    cfg = _random_cfg(rng, cl, lake, changed_cells)

    # stage 1: replay a random epoch prefix (inclusive end_epoch)
    k = int(rng.integers(0, spec.n_epochs - 1))
    stage1 = replay(cfg, end_epoch=k)

    # random mid-lifecycle action
    action = str(rng.choice(["none", "redeliver", "compact", "repartition",
                             "repair"]))
    if action == "redeliver":
        # exactly-once: re-running committed epochs must change nothing
        res = replay(cfg, end_epoch=k)
        assert res["totals"] == stage1["totals"]
    elif action == "compact":
        compact_lake(lake)
    elif action == "repair":
        # destroy a random committed partition and rebuild it from the
        # changelog (targeted repair) — must be invisible to everything
        # downstream, including under this trial's chaos/packing config
        import shutil

        from rayrep.repair import repair_partitions

        parts = sorted(d for d in os.listdir(lake) if d.startswith("part-"))
        if parts:
            victim = parts[int(rng.integers(0, len(parts)))]
            pid = int(victim.split("-")[1])
            shutil.rmtree(os.path.join(lake, victim))
            mp = os.path.join(lake, "_manifests", f"p{pid:05d}.json")
            if rng.integers(0, 2) and os.path.exists(mp):
                os.remove(mp)  # half the trials lose the manifest too
            repair_partitions(cfg, [pid])
    elif action == "repartition":
        new_p = int(rng.integers(1, 7))
        dst = str(tmp_path / "lake_repart")
        repartition_lake(lake, dst, new_p)
        lake = dst
        cfg = dataclasses.replace(cfg, lake_dir=dst, num_partitions=new_p)

    # stage 2: replay to the end
    final = replay(cfg)

    # differential check vs the sequential oracle
    oracle_df, octr = replay_oracle(generate_changelog(spec),
                                    changed_cells=changed_cells)
    assert_frames_equal(final_table_pandas(lake), oracle_df)

    # counter reconciliation: committed totals are cumulative over the
    # lake's lifetime (and survive repartition via counters_baseline) and
    # exactly-once makes them exact even under chaos retries
    for key in ("applied", "conflict", "deleted", "input_rows"):
        assert final["totals"][key] == octr[key], (key, spec, cfg, action)

    # full redelivery of the whole log: an exact no-op on a converged lake
    res = replay(cfg)
    assert res["totals"] == final["totals"]
    assert_frames_equal(final_table_pandas(lake), oracle_df)
