"""Source-failover checkpoint translation (rayrep/failover.py): a lake
mid-way through changelog A rebinds onto replacement changelog B — the
same logical stream re-sharded into different epoch boundaries (a
promoted replica's own file layout) — and a normal resume converges to
the sequential oracle with no double-applies (pGTID translation,
CHANGES.txt:17-19)."""

import os

import pyarrow as pa
import pytest

from rayrep.config import EngineConfig
from rayrep.failover import RebindError, rebind_source
from rayrep.gen import GenSpec, generate_changelog, publish_epoch, write_changelog
from rayrep.pipeline import final_table_pandas, replay

from .oracle import replay_oracle
from .test_replay import assert_frames_equal

SPEC = GenSpec(seed=55, n_conversations=50, max_turns=5, n_events=1000,
               n_epochs=4, delete_frac=0.1, zipf_a=1.1)


def _reshard(full: pa.Table, out_dir: str, n_epochs: int) -> None:
    """Publish the same event stream under DIFFERENT epoch boundaries."""
    os.makedirs(out_dir, exist_ok=True)
    n = full.num_rows
    bounds = [n * i // n_epochs for i in range(n_epochs + 1)]
    for e in range(n_epochs):
        publish_epoch(out_dir, e,
                      full.slice(bounds[e], bounds[e + 1] - bounds[e]))


def test_rebind_mid_stream_failover(tmp_path):
    clA = str(tmp_path / "clA")
    write_changelog(clA, SPEC)
    full = generate_changelog(SPEC)
    clB = str(tmp_path / "clB")
    _reshard(full, clB, 7)  # replacement source: 7 epochs instead of 4

    lake = str(tmp_path / "lake")
    cfgA = EngineConfig(changelog_dir=clA, lake_dir=lake, num_partitions=4,
                        applier_concurrency=2, delta_output=True)
    replay(cfgA, end_epoch=1)  # old master dies mid-stream (epochs 0-1 in)

    res = rebind_source(lake, clB)
    assert res["safe_seq"] >= 0
    assert 0 <= res["new_barrier"] < 7
    assert res["archived_delta"] and os.path.isdir(res["archived_delta"])
    assert not os.path.isdir(os.path.join(lake, "delta"))

    cfgB = EngineConfig(changelog_dir=clB, lake_dir=lake, num_partitions=4,
                        applier_concurrency=2, delta_output=True)
    out = replay(cfgB)
    assert out["epochs"], "resume applied nothing"
    assert out["epochs"][0]["epoch"] == res["new_barrier"] + 1
    # anti-join idempotence: re-read events skip, nothing double-applies
    oracle_df, _ = replay_oracle(full)
    assert_frames_equal(final_table_pandas(lake), oracle_df)
    # fully caught up on B: a further replay is a no-op
    assert replay(cfgB)["epochs"] == []


def test_rebind_whole_lake_committed(tmp_path):
    """Failover AFTER full convergence: the translated barrier is B's last
    epoch and resume is an immediate no-op."""
    clA = str(tmp_path / "clA")
    write_changelog(clA, SPEC)
    full = generate_changelog(SPEC)
    clB = str(tmp_path / "clB")
    _reshard(full, clB, 3)

    lake = str(tmp_path / "lake")
    replay(EngineConfig(changelog_dir=clA, lake_dir=lake, num_partitions=4,
                        applier_concurrency=2))
    before = final_table_pandas(lake)
    res = rebind_source(lake, clB)
    # fully committed: the safe position is the stream head, so the
    # translated barrier is B's LAST epoch and resume is a no-op
    assert res["new_barrier"] == 2 and res["reread_epochs"] == []
    out = replay(EngineConfig(changelog_dir=clB, lake_dir=lake,
                              num_partitions=4, applier_concurrency=2))
    assert out["epochs"] == []
    assert_frames_equal(final_table_pandas(lake), before)


def test_rebind_refuses_behind_log(tmp_path):
    """A replacement log that ends BEFORE the lake's safe position is not
    a continuation of its stream — refuse loudly."""
    clA = str(tmp_path / "clA")
    write_changelog(clA, SPEC)
    full = generate_changelog(SPEC)
    clB = str(tmp_path / "clB")
    _reshard(full.slice(0, full.num_rows // 4), clB, 2)  # truncated replica

    lake = str(tmp_path / "lake")
    replay(EngineConfig(changelog_dir=clA, lake_dir=lake, num_partitions=4,
                        applier_concurrency=2))
    with pytest.raises(RebindError, match="BEHIND"):
        rebind_source(lake, clB)


def test_rebind_cli(tmp_path, capsys):
    import json as _json

    from rayrep.cli import main

    clA = str(tmp_path / "clA")
    write_changelog(clA, SPEC)
    full = generate_changelog(SPEC)
    clB = str(tmp_path / "clB")
    _reshard(full, clB, 5)
    lake = str(tmp_path / "lake")
    replay(EngineConfig(changelog_dir=clA, lake_dir=lake, num_partitions=4,
                        applier_concurrency=2, writer_lease=True))
    assert main(["rebind", lake, clB]) == 0
    res = _json.loads(capsys.readouterr().out.strip())
    assert res["new_barrier"] == 4 and res["safe_seq"] > 0


@pytest.mark.parametrize("seed", [7, 17, 27, 37])
def test_rebind_fuzz_random_kill_and_reshard(tmp_path, seed):
    """Randomized failover drill: kill at a random epoch, rebind onto a
    random reshard (2..9 epochs, boundaries nothing like the original),
    resume — the converged table must equal the sequential oracle of the
    full stream, with salting/partition-count randomized too."""
    import numpy as np

    rng = np.random.default_rng(seed)
    spec = GenSpec(seed=int(rng.integers(1, 1 << 16)),
                   n_conversations=int(rng.integers(20, 70)),
                   max_turns=5,
                   n_events=int(rng.integers(300, 1200)),
                   n_epochs=4,
                   delete_frac=float(rng.choice([0.0, 0.15])),
                   zipf_a=float(rng.choice([0.0, 1.3])))
    clA = str(tmp_path / "clA")
    write_changelog(clA, spec)
    full = generate_changelog(spec)
    clB = str(tmp_path / "clB")
    _reshard(full, clB, int(rng.integers(2, 10)))

    lake = str(tmp_path / "lake")
    P = int(rng.integers(2, 7))
    salt = bool(rng.integers(0, 2))
    replay(EngineConfig(changelog_dir=clA, lake_dir=lake, num_partitions=P,
                        applier_concurrency=2, salt_turn_keys=salt),
           end_epoch=int(rng.integers(0, 4)))
    rebind_source(lake, clB)
    replay(EngineConfig(changelog_dir=clB, lake_dir=lake, num_partitions=P,
                        applier_concurrency=2, salt_turn_keys=salt))
    oracle_df, _ = replay_oracle(full)
    assert_frames_equal(final_table_pandas(lake), oracle_df)


def test_rebind_changed_cells_lake(tmp_path):
    """Rebind on a changed-cells lake: the force-compaction must use the
    version-PRESERVING per-cell fold (each cell's winner keeps its own
    ts/seq), so partial updates re-read or resumed from the replacement
    log still resolve against true cell versions. Checked two ways:
    row-level-conflict mode against the merging oracle, and per-cell
    (HBase) mode against an UNINTERRUPTED per-cell replay of the same
    stream — the failover must be invisible in both semantics (the
    in-repo oracle implements the row-level rule; ts-inverted partials
    legitimately differ between the two modes)."""
    spec = GenSpec(seed=13, n_conversations=25, max_turns=4, n_events=800,
                   n_epochs=4, changed_cells_frac=0.7)
    clA = str(tmp_path / "clA")
    write_changelog(clA, spec)
    full = generate_changelog(spec)
    clB = str(tmp_path / "clB")
    _reshard(full, clB, 6)

    for pcc in (False, True):
        lake = str(tmp_path / f"lake{int(pcc)}")
        kw = dict(num_partitions=4, applier_concurrency=2,
                  changed_cells_updates=True, per_cell_conflicts=pcc)
        replay(EngineConfig(changelog_dir=clA, lake_dir=lake, **kw),
               end_epoch=1)
        rebind_source(lake, clB)
        replay(EngineConfig(changelog_dir=clB, lake_dir=lake, **kw))
        got = final_table_pandas(lake)
        if pcc:
            ref_lake = str(tmp_path / "lake_ref")
            replay(EngineConfig(changelog_dir=clA, lake_dir=ref_lake, **kw))
            assert_frames_equal(got, final_table_pandas(ref_lake))
        else:
            oracle_df, _ = replay_oracle(full, changed_cells=True)
            assert_frames_equal(got, oracle_df)
