"""Changelog trim/archival (retention.trim_changelog) — binlog-expiry
analog: epochs the lake's global barrier has committed past are dropped
(or archived), a durable floor marker is written FIRST, and every
operation whose correctness silently needs full history refuses with
TrimmedLogError instead of producing an incomplete table.
"""

import os

import pytest

from rayrep.config import EngineConfig
from rayrep.gen import GenSpec, generate_changelog, write_changelog
from rayrep.manifests import TrimmedLogError, log_floor
from rayrep.pipeline import final_table_pandas, replay, replay_batch
from rayrep.retention import trim_changelog

from .oracle import replay_oracle
from .test_replay import assert_frames_equal

SPEC = GenSpec(seed=93, n_conversations=50, max_turns=5, n_events=900, n_epochs=4)


@pytest.fixture()
def cl(tmp_path):
    d = str(tmp_path / "cl")
    write_changelog(d, SPEC)
    return d


def _mklake(cl, tmp_path, name="lake", **kw):
    lake = str(tmp_path / name)
    cfg = EngineConfig(changelog_dir=cl, lake_dir=lake, num_partitions=4,
                       applier_concurrency=2, **kw)
    return cfg, lake


def test_trim_then_resume_converges(cl, tmp_path):
    """Commit epochs 0-1, trim them, resume: the resumed replay applies
    only 2-3 and the final table equals the sequential oracle — trim is
    invisible to a lake at/above the floor."""
    cfg, lake = _mklake(cl, tmp_path)
    replay(cfg, end_epoch=1)
    res = trim_changelog(cl, lake, keep_from_epoch=2)
    assert res["trimmed"] == [0, 1] and log_floor(cl) == 2
    out = replay(cfg)
    assert [e["epoch"] for e in out["epochs"]] == [2, 3]
    oracle_df, _ = replay_oracle(generate_changelog(SPEC))
    assert_frames_equal(final_table_pandas(lake), oracle_df)


def test_trim_beyond_barrier_refused(cl, tmp_path):
    cfg, lake = _mklake(cl, tmp_path)
    replay(cfg, end_epoch=1)  # barrier at 1
    with pytest.raises(ValueError, match="unrecoverable"):
        trim_changelog(cl, lake, keep_from_epoch=3)
    assert log_floor(cl) == 0  # nothing written, nothing deleted
    assert "epoch-00000" in os.listdir(cl)


def test_trim_idempotent_and_monotone(cl, tmp_path):
    cfg, lake = _mklake(cl, tmp_path)
    replay(cfg)
    assert trim_changelog(cl, lake, keep_from_epoch=2)["trimmed"] == [0, 1]
    # re-trim at or below the floor is a no-op
    assert trim_changelog(cl, lake, keep_from_epoch=2)["trimmed"] == []
    assert trim_changelog(cl, lake, keep_from_epoch=1)["trimmed"] == []
    assert trim_changelog(cl, lake, keep_from_epoch=3)["trimmed"] == [2]
    assert log_floor(cl) == 3


def test_fresh_replay_of_trimmed_log_refused(cl, tmp_path):
    cfg, lake = _mklake(cl, tmp_path)
    replay(cfg)
    trim_changelog(cl, lake, keep_from_epoch=2)
    cfg2, _ = _mklake(cl, tmp_path, name="fresh")
    with pytest.raises(TrimmedLogError, match="trimmed to first_epoch=2"):
        replay(cfg2)


def test_repair_and_batch_read_refused_after_trim(cl, tmp_path):
    import shutil

    from rayrep.repair import repair_partitions

    cfg, lake = _mklake(cl, tmp_path)
    replay(cfg)
    trim_changelog(cl, lake, keep_from_epoch=2)
    shutil.rmtree(os.path.join(lake, "part-00001"))
    with pytest.raises(TrimmedLogError):
        repair_partitions(cfg, [1])
    with pytest.raises(TrimmedLogError, match="point-in-time"):
        replay_batch(cl, num_partitions=4)


def test_archive_and_restore(cl, tmp_path):
    """Archived epochs move (not delete); restoring them + dropping the
    floor marker makes full-history ops legal again, bit-equal."""
    cfg, lake = _mklake(cl, tmp_path)
    replay(cfg)
    before = final_table_pandas(lake)
    arch = str(tmp_path / "archive")
    res = trim_changelog(cl, lake, keep_from_epoch=2, archive_dir=arch)
    assert res["archived_to"] == arch
    assert sorted(os.listdir(arch)) == ["epoch-00000", "epoch-00001"]
    # restore
    for name in os.listdir(arch):
        os.replace(os.path.join(arch, name), os.path.join(cl, name))
    os.remove(os.path.join(cl, "_floor.json"))
    rebuilt = replay_batch(cl, num_partitions=4).to_pandas()
    cols = [c for c in before.columns]
    assert_frames_equal(
        rebuilt[cols].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
        before.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))


def test_checklog_honors_floor(cl, tmp_path):
    from rayrep.checklog import check_changelog

    cfg, lake = _mklake(cl, tmp_path)
    replay(cfg)
    assert check_changelog(cl)["ok"]
    trim_changelog(cl, lake, keep_from_epoch=2)
    rep = check_changelog(cl)  # floor auto-detected: epochs 2-3, any min_seq
    assert rep["ok"], rep["errors"]
    assert [e["epoch"] for e in rep["epochs"]] == [2, 3]
    assert all(e["dense"] for e in rep["epochs"])


def test_cli_trim_log(cl, tmp_path):
    import json as _json

    from rayrep import cli

    cfg, lake = _mklake(cl, tmp_path)
    replay(cfg, end_epoch=2)
    assert cli.main(["trim-log", cl, lake, "--keep-from-epoch", "1"]) == 0
    assert log_floor(cl) == 1
    assert cli.main(["check-log", cl]) == 0
