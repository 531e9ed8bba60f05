"""Retention & erasure (rayrep/retention.py): read-side anti-filter,
physical purge, point-in-time semantics, CLI surface."""

import json
import os

import pyarrow.parquet as pq
import pytest

from rayrep.cli import main
from rayrep.config import EngineConfig
from rayrep.pipeline import final_table_pandas, replay
from rayrep.retention import erase_keys, load_erased, purge_lake

from .test_ingest_dedup import _epoch


@pytest.fixture()
def lake(tmp_path):
    cl = str(tmp_path / "cl")
    # ts = 1_000_000 + seq (the _epoch helper's rule)
    _epoch(os.path.join(cl, "epoch-00000.parquet"), [
        (0, "I", "A", 0, "a0"), (1, "I", "B", 0, "b0"),
        (2, "I", "C", 0, "c0"), (3, "D", "B", 0, None),
    ])
    _epoch(os.path.join(cl, "epoch-00001.parquet"), [
        (10, "U", "A", 0, "a1"), (11, "I", "D", 0, "d0"),
    ])
    lk = str(tmp_path / "lake")
    replay(EngineConfig(changelog_dir=cl, lake_dir=lk, num_partitions=3,
                        delta_output=False))
    return cl, lk


def _texts(lk):
    df = final_table_pandas(lk)
    return dict(zip(df["conv_id"], df["text"]))


def test_erase_hides_immediately_and_purge_is_physical(lake):
    cl, lk = lake
    assert _texts(lk) == {"A": "a1", "C": "c0", "D": "d0"}
    erase_keys(lk, ["A"])
    assert _texts(lk) == {"C": "c0", "D": "d0"}   # no purge ran yet
    res = purge_lake(lk)
    assert res["dropped_erased"] == 1
    # physically gone: no state file row carries the erased key
    for part in sorted(os.listdir(lk)):
        if not part.startswith("part-"):
            continue
        for f in os.listdir(os.path.join(lk, part)):
            t = pq.read_table(os.path.join(lk, part, f), columns=["conv_id"])
            assert "A" not in t.column("conv_id").to_pylist()
    assert _texts(lk) == {"C": "c0", "D": "d0"}


def test_erase_is_point_in_time(lake):
    cl, lk = lake
    erase_keys(lk, ["A"])
    purge_lake(lk)
    # a LATER insert for the erased key legitimately re-creates the row
    _epoch(os.path.join(cl, "epoch-00002.parquet"), [(20, "I", "A", 0, "a2")])
    replay(EngineConfig(changelog_dir=cl, lake_dir=lk, num_partitions=3,
                        delta_output=False))
    got = _texts(lk)
    # NOTE: the erasure list still contains A, so the read-side filter
    # keeps hiding it until the request is considered served — the
    # CONSERVATIVE contract: un-hiding requires a fresh erasure file.
    assert "A" not in got
    os.remove(os.path.join(lk, "_erasures", "erased.json"))
    assert _texts(lk)["A"] == "a2"


def test_purge_before_ts_drops_expired_rows_and_tombstones(lake):
    cl, lk = lake
    # cutoff above C's/B's ts but below epoch-1 rows: C (live, old) and
    # B's tombstone both drop; A survives via its epoch-1 update
    res = purge_lake(lk, before_ts_us=1_000_005)
    assert res["dropped_expired"] == 2
    assert _texts(lk) == {"A": "a1", "D": "d0"}
    # watermark (not the tombstone) still guards re-application: a
    # re-run replay finds nothing uncommitted
    out = replay(EngineConfig(changelog_dir=cl, lake_dir=lk,
                              num_partitions=3, delta_output=False))
    assert out["epochs"] == []
    assert _texts(lk) == {"A": "a1", "D": "d0"}


def test_erase_idempotent_and_cli(lake, capsys):
    cl, lk = lake
    assert main(["erase", lk, "--key", "A", "--key", "C"]) == 0
    r1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r1 == {"erased_total": 2, "added": 2}
    assert main(["erase", lk, "--key", "A"]) == 0
    r2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r2 == {"erased_total": 2, "added": 0}
    assert load_erased(lk) == frozenset({"A", "C"})
    assert main(["purge", lk]) == 0
    r3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r3["dropped_erased"] == 2
    assert _texts(lk) == {"D": "d0"}


def test_purge_changed_cells_lake(tmp_path):
    cl = str(tmp_path / "cl")
    _epoch(os.path.join(cl, "epoch-00000.parquet"), [
        (0, "I", "A", 0, "a0"), (1, "I", "B", 0, "b0"),
    ])
    _epoch(os.path.join(cl, "epoch-00001.parquet"), [
        (10, "U", "A", 0, "a1"),
    ])
    lk = str(tmp_path / "lake")
    replay(EngineConfig(changelog_dir=cl, lake_dir=lk, num_partitions=2,
                        delta_output=False, changed_cells_updates=True))
    erase_keys(lk, ["B"])
    res = purge_lake(lk)
    assert res["dropped_erased"] >= 1  # cells mode: >=1 chain row for B
    assert _texts(lk) == {"A": "a1"}
    # the rewritten per-cell state is the PRUNED multi-row-per-key set;
    # manifests must carry the per-KEY live count (fsck recount agrees)
    from rayrep.check import check_lake
    assert check_lake(lk, deep=True)["errors"] == []


def test_distributed_purge_and_compact_match_serial(tmp_path):
    """distributed=True (one Ray task per partition) must be result-
    identical to the driver loop — tasks are independent because every
    rewrite is manifest-atomic."""
    from rayrep.compact import compact_lake

    cl = str(tmp_path / "cl")
    rows = [(i, "I", f"K{i % 7}", i % 3, f"t{i}") for i in range(20)]
    _epoch(os.path.join(cl, "epoch-00000.parquet"), rows[:10])
    _epoch(os.path.join(cl, "epoch-00001.parquet"), rows[10:])
    serial, dist = str(tmp_path / "s"), str(tmp_path / "d")
    for lk in (serial, dist):
        replay(EngineConfig(changelog_dir=cl, lake_dir=lk,
                            num_partitions=3, delta_output=False,
                            state_snapshot_interval=99))
        erase_keys(lk, ["K1"])
    rs = purge_lake(serial, before_ts_us=1_000_003, distributed=False)
    rd_ = purge_lake(dist, before_ts_us=1_000_003, distributed=True)
    assert rs == rd_
    assert _texts(serial) == _texts(dist)
    cs = compact_lake(serial, distributed=False)
    cd = compact_lake(dist, distributed=True)
    assert cs == cd
    assert _texts(serial) == _texts(dist)
