"""Dedup-on-ingest (rayrep/ingest_dedup.py): content-level first-writer-wins
inside the replay — cross-epoch claim index, exactly-once claim deltas,
U/D/null pass-through, resume/chaos determinism, LakeMeta pin, compaction."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rayrep.config import EngineConfig
from rayrep.ingest_dedup import (
    compact_content_index,
    cumulative_deduped,
    read_bucket_claims,
)
from rayrep.pipeline import final_table_pandas, replay


def _epoch(path: str, rows: list[tuple]) -> None:
    """rows: (seq, op, conv_id, turn_idx, text)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    n = len(rows)
    pq.write_table(pa.table({
        "seq": pa.array([r[0] for r in rows], pa.int64()),
        "txn_id": pa.nulls(n, pa.int64()),
        "op": pa.array([r[1] for r in rows]),
        "schema_ver": pa.array([1] * n, pa.int32()),
        "conv_id": pa.array([r[2] for r in rows]),
        "turn_idx": pa.array([r[3] for r in rows], pa.int32()),
        "role": pa.array(["user"] * n),
        "text": pa.array([r[4] for r in rows]),
        "tool": pa.nulls(n, pa.string()),
        "ts": pa.array([1_000_000 + r[0] for r in rows], pa.timestamp("us")),
        "ddl": pa.nulls(n, pa.string()),
    }), path)


@pytest.fixture()
def changelog(tmp_path):
    cl = str(tmp_path / "cl")
    # epoch 0: A0 "dup" claims; B0 "dup" dropped; C0 "solo" claims;
    #          N0 null content passes through (never dedup-checked)
    _epoch(os.path.join(cl, "epoch-00000.parquet"), [
        (0, "I", "A", 0, "dup"), (1, "I", "B", 0, "dup"),
        (2, "I", "C", 0, "solo"), (3, "I", "N", 0, None),
    ])
    # epoch 1: D0 "dup" dropped via the PERSISTED index (cross-epoch);
    #          E0 "fresh" claims; U on B re-materializes the deduped key;
    #          D on C deletes; another within-epoch pair F/G on "pair"
    _epoch(os.path.join(cl, "epoch-00001.parquet"), [
        (10, "I", "D", 0, "dup"), (11, "I", "E", 0, "fresh"),
        (12, "U", "B", 0, "b-upd"), (13, "D", "C", 0, None),
        (14, "I", "F", 0, "pair"), (15, "I", "G", 0, "pair"),
    ])
    return cl


EXPECT = {  # conv_id -> text of the converged lake
    "A": "dup", "B": "b-upd", "E": "fresh", "F": "pair", "N": None,
}


def _cfg(cl: str, lake: str, **kw) -> EngineConfig:
    return EngineConfig(changelog_dir=cl, lake_dir=lake, num_partitions=4,
                        dedup_ingest=True, delta_output=False, **kw)


def _check(lake: str) -> None:
    df = final_table_pandas(lake)
    got = {r.conv_id: r.text for r in df.itertuples()}
    got = {k: (None if v != v else v) if not isinstance(v, str) else v
           for k, v in got.items()}
    assert got == EXPECT, got


def test_replay_dedup_semantics(changelog, tmp_path):
    lake = str(tmp_path / "lake")
    res = replay(_cfg(changelog, lake))
    _check(lake)
    # B (within-epoch dup), D (cross-epoch via index), G (within-epoch)
    assert [e["deduped"] for e in res["epochs"]] == [1, 2]
    assert res["deduped_total"] == 3
    assert cumulative_deduped(lake) == 3


def test_resume_identical_and_idempotent(changelog, tmp_path):
    lake = str(tmp_path / "lake")
    replay(_cfg(changelog, lake), end_epoch=0)  # simulated kill after epoch 0
    res = replay(_cfg(changelog, lake))         # resume: only epoch 1 runs
    assert [e["epoch"] for e in res["epochs"]] == [1]
    _check(lake)
    assert res["deduped_total"] == 3
    res2 = replay(_cfg(changelog, lake))        # finished: nothing re-runs
    assert res2["epochs"] == [] and res2["deduped_total"] == 3


def test_chaos_identical(changelog, tmp_path):
    lake = str(tmp_path / "lake")
    res = replay(_cfg(changelog, lake, chaos_fraction=0.5, chaos_seed=7))
    _check(lake)
    assert res["deduped_total"] == 3


def test_pin_flip_refused(changelog, tmp_path):
    lake = str(tmp_path / "lake")
    replay(_cfg(changelog, lake))
    with pytest.raises(ValueError, match="dedup_ingest"):
        replay(EngineConfig(changelog_dir=changelog, lake_dir=lake,
                            num_partitions=4, dedup_ingest=False))


def test_dedup_off_keeps_duplicates(changelog, tmp_path):
    lake = str(tmp_path / "lake")
    replay(EngineConfig(changelog_dir=changelog, lake_dir=lake,
                        num_partitions=4, delta_output=False))
    df = final_table_pandas(lake)
    assert sorted(df["conv_id"]) == ["A", "B", "D", "E", "F", "G", "N"]


def test_compaction_preserves_claims_and_counts(changelog, tmp_path):
    lake = str(tmp_path / "lake")
    replay(_cfg(changelog, lake))
    before = {
        b: read_bucket_claims(lake, b) for b in range(4)
    }
    removed = compact_content_index(lake)
    assert removed >= 1  # at least one bucket had a 2-file chain
    for b in range(4):
        k0, s0 = before[b]
        k1, s1 = read_bucket_claims(lake, b)
        assert list(k0) == list(k1) and list(s0) == list(s1)
    assert cumulative_deduped(lake) == 3  # footer counts survive the fold
    # claims still bite after compaction: re-ingest "dup" in a new epoch
    _epoch(os.path.join(changelog, "epoch-00002.parquet"),
           [(20, "I", "Z", 0, "dup")])
    res = replay(_cfg(changelog, lake))
    assert res["epochs"][-1]["deduped"] == 1
    _check(lake)  # Z never materialized


def test_dry_run_persists_nothing(changelog, tmp_path):
    lake = str(tmp_path / "lake")
    replay(_cfg(changelog, lake, dry_run=True))
    assert not os.path.exists(os.path.join(lake, "content_index"))
