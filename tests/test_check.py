"""Lake fsck (rayrep/check.py): a healthy lake audits clean; every
corruption class the checker exists for is actually caught."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rayrep.check import check_lake
from rayrep.cli import main
from rayrep.config import EngineConfig
from rayrep.gen import GenSpec, write_changelog
from rayrep.manifests import PartitionManifest
from rayrep.pipeline import replay


@pytest.fixture()
def lake(tmp_path):
    cl = str(tmp_path / "cl")
    write_changelog(cl, GenSpec(n_events=800, n_conversations=40,
                                n_epochs=2, zipf_a=1.1))
    lk = str(tmp_path / "lake")
    replay(EngineConfig(changelog_dir=cl, lake_dir=lk, num_partitions=4,
                        delta_output=False))
    return lk


def _first_chain_file(lk):
    for pid in range(4):
        m = PartitionManifest.load(lk, pid)
        if m.state_chain:
            return pid, os.path.join(lk, m.state_chain[-1])
    raise AssertionError("no state files")


def test_healthy_lake_is_ok(lake, capsys):
    res = check_lake(lake, deep=True)
    assert res["ok"], res
    assert res["errors"] == []
    assert res["deep_rows"] > 0
    assert main(["check", lake, "--deep"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ok"]


def test_missing_chain_file_is_error(lake):
    _, f = _first_chain_file(lake)
    os.remove(f)
    res = check_lake(lake)
    assert not res["ok"]
    assert any("chain file missing" in e for e in res["errors"])


def test_torn_epoch_barrier_is_error(lake):
    """AHEAD of the barrier = unrepaired crash window (error); BEHIND is
    legal — the applier only commits partitions an epoch touched, so a
    partition with no rows in the last epochs lags the barrier."""
    m = PartitionManifest.load(lake, 0)
    m.epoch -= 1
    m.save(lake)
    res = check_lake(lake)
    assert not any("torn commit" in e for e in res["errors"])
    m.epoch += 2  # one past the barrier
    m.save(lake)
    res = check_lake(lake)
    assert any("torn commit" in e for e in res["errors"])


def test_deep_catches_live_rows_drift(lake):
    pid, _ = _first_chain_file(lake)
    m = PartitionManifest.load(lake, pid)
    m.live_rows += 7
    m.save(lake)
    assert check_lake(lake)["ok"]            # shallow can't see it
    res = check_lake(lake, deep=True)
    assert any("folded recount" in e for e in res["errors"])


def test_deep_catches_misrouted_row(lake):
    # graft one partition's winner row into ANOTHER partition's state
    pid, f = _first_chain_file(lake)
    other = (pid + 1) % 4
    mo = PartitionManifest.load(lake, other)
    of = os.path.join(lake, mo.state_chain[-1])
    t_src = pq.read_table(f).slice(0, 1)
    t_dst = pq.read_table(of)
    pq.write_table(pa.concat_tables([t_dst, t_src],
                                    promote_options="permissive"), of)
    res = check_lake(lake, deep=True)
    assert any("different partition" in e for e in res["errors"])


def test_cli_exit_code_on_corruption(lake, capsys):
    _, f = _first_chain_file(lake)
    os.remove(f)
    assert main(["check", lake]) == 3
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert not out["ok"]
