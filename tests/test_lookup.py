"""Point lookup (rayrep/lookup.py) — the key-addressed serving read:
partition prune via the pinned routing hash, key pushdown into the chain
fold, salting contract, erasure, and sorted-compaction row-group layout.
"""

import os

import pyarrow.parquet as pq
import pytest

from rayrep.config import EngineConfig
from rayrep.gen import GenSpec, write_changelog
from rayrep.lookup import LookupKeyError, lookup, lookup_plan
from rayrep.pipeline import final_table_pandas, replay

SPEC = GenSpec(seed=77, n_conversations=60, max_turns=6, n_events=1200,
               n_epochs=3, zipf_a=1.2)


@pytest.fixture(scope="module")
def lake(tmp_path_factory):
    d = tmp_path_factory.mktemp("lk")
    cl, lk = str(d / "cl"), str(d / "lake")
    write_changelog(cl, SPEC)
    cfg = EngineConfig(changelog_dir=cl, lake_dir=lk, num_partitions=8,
                       applier_concurrency=2)
    replay(cfg)
    return lk


def _expect(lake_dir, convs):
    df = final_table_pandas(lake_dir)
    return (df[df["conv_id"].isin(convs)]
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))


def test_conv_lookup_equals_filtered_final_table(lake):
    convs = ["c00000003", "c00000007", "c00000019"]
    got = (lookup(lake, convs).to_pandas()
           .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    exp = _expect(lake, convs)
    assert got.equals(exp[got.columns.tolist()])
    assert len(got) > 0  # the fixture must actually cover these keys


def test_plan_prunes_partitions(lake):
    plan = lookup_plan(lake, ["c00000003", "c00000007", "c00000019"])
    assert 1 <= len(plan) <= 3 < 8
    assert sum(len(v) for v in plan.values()) == 3


def test_pair_lookup_exact_rows(lake):
    df = final_table_pandas(lake)
    rows = df.head(3)[["conv_id", "turn_idx"]].itertuples(index=False)
    pairs = [(c, int(t)) for c, t in rows]
    got = lookup(lake, pairs).to_pandas()
    assert len(got) == 3
    assert set(zip(got["conv_id"], got["turn_idx"])) == set(pairs)


def test_unknown_key_missing_and_empty(lake):
    assert lookup(lake, ["no-such-conv"]).num_rows == 0
    assert lookup(lake, []).num_rows == 0


def test_erasure_honored(lake, tmp_path):
    import shutil

    from rayrep.retention import erase_keys

    lk2 = str(tmp_path / "lake2")
    shutil.copytree(lake, lk2)
    assert lookup(lk2, ["c00000003"]).num_rows > 0
    erase_keys(lk2, ["c00000003"])
    assert lookup(lk2, ["c00000003"]).num_rows == 0
    assert lookup(lk2, ["c00000007"]).num_rows > 0


def test_salted_lake_contract(tmp_path):
    cl, lk = str(tmp_path / "cl"), str(tmp_path / "lake")
    write_changelog(cl, SPEC)
    cfg = EngineConfig(changelog_dir=cl, lake_dir=lk, num_partitions=8,
                       applier_concurrency=2, salt_turn_keys=True)
    replay(cfg)
    with pytest.raises(LookupKeyError, match="salt_turn_keys"):
        lookup(lk, ["c00000003"])
    df = final_table_pandas(lk)
    sub = df[df["conv_id"] == "c00000003"]
    pairs = [("c00000003", int(t)) for t in sub["turn_idx"]]
    got = (lookup(lk, pairs).to_pandas()
           .sort_values("turn_idx").reset_index(drop=True))
    exp = sub.sort_values("turn_idx").reset_index(drop=True)
    assert got.equals(exp[got.columns.tolist()])


def test_sorted_compaction_layout_and_lookup(lake, tmp_path):
    import shutil

    from rayrep.compact import compact_lake

    lk2 = str(tmp_path / "lakec")
    shutil.copytree(lake, lk2)
    before = final_table_pandas(lk2)
    compact_lake(lk2)  # sort_keys default on
    assert final_table_pandas(lk2).equals(before)
    # every compacted file is (conv_id, turn_idx)-ordered → row-group
    # min/max stats prune point lookups
    for part in sorted(x for x in os.listdir(lk2) if x.startswith("part-")):
        fs = [f for f in os.listdir(os.path.join(lk2, part))
              if f.endswith("-full.parquet")]
        assert fs, part
        t = pq.read_table(os.path.join(lk2, part, fs[0]))
        ks = list(zip(t["conv_id"].to_pylist(),
                      t["turn_idx"].to_pylist()))
        assert ks == sorted(ks)
    got = (lookup(lk2, ["c00000003", "c00000007"]).to_pandas()
           .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    assert got.equals(_expect(lk2, ["c00000003", "c00000007"])[got.columns.tolist()])


def test_cells_lake_lookup(tmp_path):
    cl, lk = str(tmp_path / "cl"), str(tmp_path / "lake")
    write_changelog(cl, SPEC)
    cfg = EngineConfig(changelog_dir=cl, lake_dir=lk, num_partitions=8,
                       applier_concurrency=2, changed_cells_updates=True,
                       per_cell_conflicts=True)
    replay(cfg)
    got = (lookup(lk, ["c00000003", "c00000011"]).to_pandas()
           .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    exp = _expect(lk, ["c00000003", "c00000011"])
    assert len(got) > 0 and got.equals(exp[got.columns.tolist()])


def test_cli_get(lake, capsys):
    import json

    from rayrep import cli

    assert cli.main(["get", lake, "--key", "c00000003", "--key", "c00000007"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["n"] == len(_expect(lake, ["c00000003", "c00000007"]))
    assert all(r["conv_id"] in ("c00000003", "c00000007") for r in out["rows"])
