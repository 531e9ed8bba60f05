"""Barrier-consistent lake clone (rayrep/clone.py): DR backup that is
readable, resumable, independent of source maintenance, and exact under
the in-flight-commit window (.prev manifests)."""

import os

import pytest

from rayrep.clone import clone_lake
from rayrep.config import EngineConfig
from rayrep.gen import GenSpec, generate_changelog, write_changelog
from rayrep.pipeline import final_table_pandas, replay

from .oracle import replay_oracle
from .test_replay import assert_frames_equal

SPEC = GenSpec(seed=63, n_conversations=50, max_turns=5, n_events=1000,
               n_epochs=4, zipf_a=1.1)


@pytest.fixture()
def env(tmp_path):
    cl = str(tmp_path / "cl")
    write_changelog(cl, SPEC)
    lake = str(tmp_path / "lake")
    cfg = EngineConfig(changelog_dir=cl, lake_dir=lake, num_partitions=4,
                       applier_concurrency=2)
    return cl, lake, cfg, tmp_path


def test_clone_resume_and_source_frozen(env):
    cl, lake, cfg, tmp = env
    import dataclasses

    replay(cfg, end_epoch=1)
    at_barrier = final_table_pandas(lake)
    dst = str(tmp / "dr")
    res = clone_lake(lake, dst)
    assert res["barrier"] == 1 and res["partitions"] == 4
    assert final_table_pandas(dst).equals(at_barrier)
    # resume INTO the clone: only epochs 2,3, converges to the oracle
    out = replay(dataclasses.replace(cfg, lake_dir=dst))
    assert [e["epoch"] for e in out["epochs"]] == [2, 3]
    oracle_df, _ = replay_oracle(generate_changelog(SPEC))
    assert_frames_equal(final_table_pandas(dst), oracle_df)
    # source untouched by the clone's progress
    assert final_table_pandas(lake).equals(at_barrier)


def test_clone_survives_source_maintenance(env):
    cl, lake, cfg, tmp = env
    import shutil

    from rayrep.compact import compact_lake, gc_lake

    replay(cfg)
    before = final_table_pandas(lake)
    dst = str(tmp / "dr")
    clone_lake(lake, dst)
    compact_lake(lake)
    gc_lake(lake)  # source rewrites + deletes superseded files
    assert final_table_pandas(dst).equals(before)  # hardlinks keep bytes
    shutil.rmtree(lake)  # even total source loss
    assert final_table_pandas(dst).equals(before)


def test_clone_uses_prev_for_ahead_partitions(env):
    """A partition whose manifest is ahead of the barrier (in-flight
    commit window) must clone its .prev image, exactly like
    read_committed."""
    cl, lake, cfg, tmp = env
    from rayrep.manifests import PartitionManifest

    replay(cfg, end_epoch=2)
    want = final_table_pandas(lake)
    # simulate partition 0 mid-commit of epoch 3: manifest ahead, .prev = now
    m = PartitionManifest.load(lake, 0)
    ahead = PartitionManifest(part_id=0, epoch=3, last_seq=m.last_seq,
                              state_chain=["part-00000/bogus.parquet"],
                              lease_token=m.lease_token)
    ahead.save(lake)  # save() keeps the real manifest as .prev
    dst = str(tmp / "dr")
    res = clone_lake(lake, dst)
    assert res["barrier"] == 2
    assert final_table_pandas(dst).equals(want)


def test_clone_refuses_nonempty_dst(env):
    cl, lake, cfg, tmp = env
    replay(cfg, end_epoch=0)
    dst = str(tmp / "dr")
    os.makedirs(dst)
    open(os.path.join(dst, "x"), "w").write("x")
    with pytest.raises(FileExistsError):
        clone_lake(lake, dst)


def test_clone_copy_mode_and_erasure(env):
    cl, lake, cfg, tmp = env
    from rayrep.retention import erase_keys

    replay(cfg)
    erase_keys(lake, ["c00000003"])
    dst = str(tmp / "dr")
    res = clone_lake(lake, dst, mode="copy")
    assert res["mode"] == "copy"
    df = final_table_pandas(dst)
    assert not (df["conv_id"] == "c00000003").any()  # erasure travels


def test_cli_clone(env, capsys):
    import json

    from rayrep import cli

    cl, lake, cfg, tmp = env
    replay(cfg)
    dst = str(tmp / "dr")
    assert cli.main(["clone", lake, dst]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["barrier"] == 3 and out["state_files"] > 0
    assert final_table_pandas(dst).equals(final_table_pandas(lake))
