"""Bloom sidecars (rayrep/bloom.py): primitives, compaction wiring, gc
hygiene, and the lookup read-skip they exist for."""

import os

import numpy as np
import pytest

from rayrep.bloom import (
    build_bloom,
    chain_candidates,
    might_contain_any,
    sidecar_path,
    write_sidecar,
)
from rayrep.config import EngineConfig
from rayrep.gen import GenSpec, write_changelog
from rayrep.hashing import stable_hash_strings
from rayrep.lookup import lookup
from rayrep.pipeline import final_table_pandas, replay

SPEC = GenSpec(seed=55, n_conversations=50, max_turns=5, n_events=900,
               n_epochs=3)


def test_bloom_no_false_negatives_and_low_fp():
    keys = [f"c{i:08d}" for i in range(500)]
    blob = build_bloom(keys)
    for k in keys[::37]:
        assert might_contain_any(blob, stable_hash_strings([k]))
    absent = [f"x{i:08d}" for i in range(2000)]
    fp = sum(might_contain_any(blob, stable_hash_strings([a]))
             for a in absent)
    assert fp / len(absent) < 0.05  # ~10 bits/key, k=7 → ≲1% expected


def test_bloom_deterministic():
    keys = ["a", "b", "c"]
    assert build_bloom(keys) == build_bloom(list(keys))


def test_chain_candidates(tmp_path):
    lake = str(tmp_path)
    os.makedirs(os.path.join(lake, "p"))
    for name, keys in (("p/f1", ["k1", "k2"]), ("p/f2", ["k3"])):
        open(os.path.join(lake, name), "w").write("stub")
        write_sidecar(lake, name, keys)
    open(os.path.join(lake, "p/f3"), "w").write("stub")  # no sidecar
    assert chain_candidates(lake, ["p/f1", "p/f2", "p/f3"], ["k1"]) == [
        "p/f1", "p/f3"]  # f2 proven free; f3 kept (no sidecar = must read)
    assert chain_candidates(lake, ["p/f1", "p/f2", "p/f3"], ["k3"]) == [
        "p/f2", "p/f3"]


@pytest.fixture()
def lake(tmp_path):
    cl, lk = str(tmp_path / "cl"), str(tmp_path / "lake")
    write_changelog(cl, SPEC)
    replay(EngineConfig(changelog_dir=cl, lake_dir=lk, num_partitions=4,
                        applier_concurrency=2))
    return lk


def test_compaction_writes_sidecars_and_lookup_skips(lake, monkeypatch):
    from rayrep.compact import compact_lake

    compact_lake(lake)
    blooms = [f for p in os.listdir(lake) if p.startswith("part-")
              for f in os.listdir(os.path.join(lake, p))
              if f.endswith(".bloom")]
    assert len(blooms) == 4
    # an absent key on a fully-compacted lake must fold ZERO files
    import rayrep.apply as apply_mod

    reads = []
    orig = apply_mod.pq.read_table

    def counting(path, *a, **kw):
        reads.append(path)
        return orig(path, *a, **kw)

    monkeypatch.setattr(apply_mod.pq, "read_table", counting)
    assert lookup(lake, ["zz-not-a-conv"]).num_rows == 0
    assert reads == []
    # a present key still folds (and returns) its rows
    got = lookup(lake, ["c00000003"])
    assert got.num_rows > 0 and len(reads) == 1


def test_gc_removes_orphan_sidecars(lake):
    from rayrep.compact import compact_lake, gc_lake

    compact_lake(lake)
    pdir = os.path.join(lake, "part-00000")
    state = [f for f in os.listdir(pdir) if f.endswith("-full.parquet")][0]
    orphan = os.path.join(pdir, "state-e99999.parquet.bloom")
    open(orphan, "wb").write(build_bloom(["x"]))
    gc_lake(lake)
    assert not os.path.exists(orphan)
    assert os.path.exists(os.path.join(pdir, state + ".bloom"))  # live kept


def test_stale_superset_sidecar_is_safe(lake):
    """purge_lake rewrites chains with a key SUBSET; a sidecar left from
    before the purge over-claims — lookup must still return the purged
    key as absent (reads the file, finds nothing), never wrong rows."""
    from rayrep.compact import compact_lake
    from rayrep.retention import erase_keys, purge_lake

    compact_lake(lake)
    before = final_table_pandas(lake)
    victim = "c00000003"
    assert (before["conv_id"] == victim).any()
    erase_keys(lake, [victim])
    purge_lake(lake)
    assert lookup(lake, [victim]).num_rows == 0
    keep = before[before["conv_id"] == "c00000007"]
    assert lookup(lake, ["c00000007"]).num_rows == len(keep)
