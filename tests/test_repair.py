"""Targeted partition repair (rayrep/repair.py).

The reference's validation loop fixes MySQL↔HBase divergence by
re-copying the affected rows, never by full re-replication
(README.md:19-20). These tests pin the analog: destroy a partition,
rebuild ONLY it from the changelog, and require bit-identical
convergence — table, seq watermarks, lifetime counters — plus exact
no-op idempotence of the next ordinary replay.
"""

import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rayrep.cli import main as cli_main
from rayrep.config import EngineConfig
from rayrep.gen import GenSpec, T0_US, write_changelog
from rayrep.manifests import PartitionManifest
from rayrep.pipeline import aggregate_partition_counters, final_table_pandas, replay
from rayrep.repair import repair_partitions


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


SPEC = GenSpec(n_events=2500, n_conversations=90, n_epochs=4,
               zipf_a=1.1, delete_frac=0.15)


@pytest.fixture()
def replayed(tmp_path):
    cl, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    write_changelog(cl, SPEC)
    cfg = EngineConfig(changelog_dir=cl, lake_dir=lake, num_partitions=8,
                       applier_concurrency=2)
    res = replay(cfg)
    return cfg, res


def test_repair_restores_destroyed_partition_exactly(replayed):
    cfg, res = replayed
    before = _canon(final_table_pandas(cfg.lake_dir))
    tot = dict(res["totals"])
    wm3 = PartitionManifest.load(cfg.lake_dir, 3).last_seq

    shutil.rmtree(os.path.join(cfg.lake_dir, "part-00003"))
    os.remove(PartitionManifest.path(cfg.lake_dir, 3))

    repair_partitions(cfg, [3])

    assert _canon(final_table_pandas(cfg.lake_dir)).equals(before)
    assert aggregate_partition_counters(cfg.lake_dir) == tot
    assert PartitionManifest.load(cfg.lake_dir, 3).last_seq == wm3
    # the barrier never moved: the next replay is an exact no-op
    r2 = replay(cfg)
    assert r2["totals"] == tot and r2["epochs"] == []


def test_repair_multiple_partitions_and_lagging_manifest(replayed):
    """Losing the state files but KEEPING the manifest is the nastier
    corruption (the manifest watermark would make replay skip silently);
    repair discards the manifest so the rebuild re-applies everything."""
    cfg, res = replayed
    before = _canon(final_table_pandas(cfg.lake_dir))

    shutil.rmtree(os.path.join(cfg.lake_dir, "part-00001"))
    # partition 5: manifest intact, chain destroyed
    shutil.rmtree(os.path.join(cfg.lake_dir, "part-00005"))

    repair_partitions(cfg, [1, 5])
    assert _canon(final_table_pandas(cfg.lake_dir)).equals(before)
    assert aggregate_partition_counters(cfg.lake_dir) == res["totals"]


def test_repair_validation_errors(replayed, tmp_path):
    cfg, _ = replayed
    with pytest.raises(ValueError, match="empty"):
        repair_partitions(cfg, [])
    with pytest.raises(ValueError, match="outside"):
        repair_partitions(cfg, [99])
    import dataclasses
    fresh = dataclasses.replace(cfg, lake_dir=str(tmp_path / "fresh"))
    os.makedirs(fresh.lake_dir, exist_ok=True)
    with pytest.raises(ValueError, match="nothing to repair"):
        repair_partitions(fresh, [0])


def test_deep_check_detects_then_repair_heals(replayed):
    cfg, _ = replayed
    # corruption mode: one chain file vanishes, manifest untouched
    pdir = os.path.join(cfg.lake_dir, "part-00002")
    victim = sorted(os.listdir(pdir))[0]
    os.remove(os.path.join(pdir, victim))
    assert cli_main(["check", cfg.lake_dir, "--deep"]) == 3
    repair_partitions(cfg, [2])
    assert cli_main(["check", cfg.lake_dir, "--deep"]) == 0


def test_repair_across_ddl_drop_readd_chain(tmp_path):
    """Repair replays OLD epochs against the already-final registry: every
    round spans the whole version history, so the stepwise (version-exact)
    evolution must drive both the augmenter and the chain fold — a
    drop→re-add chain would otherwise resurrect discarded data."""
    from .test_ddl_chain_fuzz import _build_chain, _oracle_frame, _segment_table
    from .oracle import replay_oracle
    from .test_replay import assert_frames_equal

    rng = np.random.default_rng(77)
    segments = _build_chain(rng)
    cl = str(tmp_path / "cl")
    os.makedirs(cl)
    for e, (payload_cols, types, rows) in enumerate(segments):
        pq.write_table(_segment_table(payload_cols, rows, types),
                       os.path.join(cl, f"epoch-{e:05d}.parquet"))
    cfg = EngineConfig(changelog_dir=cl, lake_dir=str(tmp_path / "lake"),
                       num_partitions=4, applier_concurrency=2,
                       delta_output=False)
    replay(cfg)
    before = _canon(final_table_pandas(cfg.lake_dir))

    victims = sorted(d for d in os.listdir(cfg.lake_dir)
                     if d.startswith("part-"))
    pid = int(victims[0].split("-")[1])
    shutil.rmtree(os.path.join(cfg.lake_dir, victims[0]))
    os.remove(PartitionManifest.path(cfg.lake_dir, pid))
    repair_partitions(cfg, [pid])

    got = _canon(final_table_pandas(cfg.lake_dir))
    assert got.equals(before)
    oracle_df, _ = replay_oracle(_oracle_frame(segments))
    import pandas.api.types as ptypes
    for c in got.columns:
        if c != "text" and ptypes.is_numeric_dtype(got[c]):
            got[c] = got[c].astype("float64")
            oracle_df[c] = oracle_df[c].astype("float64")
    assert_frames_equal(got, oracle_df)


def test_repair_cli_roundtrip(tmp_path):
    cl, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    write_changelog(cl, GenSpec(n_events=800, n_conversations=40, n_epochs=3))
    assert cli_main(["replay", cl, lake, "--partitions", "4",
                     "--appliers", "2", "--no-delta"]) in (0, None)
    before = _canon(final_table_pandas(lake))
    shutil.rmtree(os.path.join(lake, "part-00002"))
    os.remove(PartitionManifest.path(lake, 2))
    assert cli_main(["repair", cl, lake, "--parts", "2", "--partitions", "4",
                     "--appliers", "2", "--no-delta"]) in (0, None)
    assert _canon(final_table_pandas(lake)).equals(before)
