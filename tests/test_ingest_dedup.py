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


# ---------------------------------------------------------------------------
# Property: the distributed dedup core == a sequential first-writer-wins
# oracle, for ANY op/content interleaving and ANY epoch split. Ray-free:
# stamp_content + dedup_group are plain Arrow/numpy functions; the Ray path
# shares this exact code (dedup_stage wires them into the exchange).
# ---------------------------------------------------------------------------

import numpy as np
from hypothesis import given, settings, strategies as st

from rayrep.ingest_dedup import CBUCKET, dedup_group, stamp_content

_POOL = ["x", "y", "z"]  # tiny content pool -> heavy collision pressure

dedup_event_st = st.tuples(
    st.sampled_from(["I", "U", "D"]),
    st.integers(0, 3),                      # key index (part_id analog)
    st.integers(-1, len(_POOL) - 1),        # -1 -> null content
)


def _dedup_oracle(events):
    """Sequential replay: an I with non-null content survives iff its
    content was never claimed by an earlier surviving I; U/D/null always
    survive. Returns the set of surviving seqs."""
    claimed, keep = set(), set()
    for seq, (op, _ki, ci) in enumerate(events):
        if op == "I" and ci >= 0:
            if _POOL[ci] in claimed:
                continue
            claimed.add(_POOL[ci])
        keep.add(seq)
    return keep


def _events_table(chunk, base_seq):
    n = len(chunk)
    return pa.table({
        "seq": pa.array([base_seq + i for i in range(n)], pa.int64()),
        "op": pa.array([e[0] for e in chunk]),
        "part_id": pa.array([e[1] for e in chunk], pa.int32()),
        "text": pa.array(
            [None if e[2] < 0 else _POOL[e[2]] for e in chunk], pa.string()
        ),
    })


def _run_epoch(tbl, lake, epoch, num_buckets=3):
    """Drive stamp -> bucket-group -> dedup_group exactly as dedup_stage
    does, without a Ray session."""
    stamped = stamp_content(tbl, "text", num_buckets)
    out = []
    buckets = stamped[CBUCKET].to_numpy(zero_copy_only=False)
    for b in np.unique(buckets):
        grp = stamped.filter(pa.array(buckets == b))
        out.append(dedup_group(grp, lake, epoch, persist=True))
    return pa.concat_tables(out) if out else tbl.slice(0, 0)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(dedup_event_st, min_size=1, max_size=40),
    st.lists(st.integers(0, 39), max_size=3),  # epoch split points
)
def test_dedup_core_matches_sequential_oracle(tmp_path_factory, events, cuts):
    lake = str(tmp_path_factory.mktemp("lake"))
    bounds = sorted({c for c in cuts if c < len(events)})
    spans = list(zip([0] + bounds, bounds + [len(events)]))
    survived = set()
    for epoch, (lo, hi) in enumerate(spans):
        if lo == hi:
            continue
        out = _run_epoch(_events_table(events[lo:hi], lo), lake, epoch)
        survived.update(out["seq"].to_pylist())
    assert survived == _dedup_oracle(events)


@settings(max_examples=60, deadline=None)
@given(st.lists(dedup_event_st, min_size=2, max_size=30),
       st.integers(1, 29))
def test_dedup_epoch_retry_is_self_healing(tmp_path_factory, events, cut):
    """Re-running an epoch's dedup (crash/retry: claims from the first
    attempt already persisted under the SAME epoch name) yields the
    identical survivor set — exclude_epoch + strictly-smaller-seq rule."""
    cut = min(cut, len(events) - 1)
    lake = str(tmp_path_factory.mktemp("lake"))
    _run_epoch(_events_table(events[:cut], 0), lake, 0)
    first = sorted(_run_epoch(_events_table(events[cut:], cut), lake, 1)
                   ["seq"].to_pylist())
    retry = sorted(_run_epoch(_events_table(events[cut:], cut), lake, 1)
                   ["seq"].to_pylist())
    assert retry == first
    oracle = _dedup_oracle(events)
    assert set(first) == {s for s in oracle if s >= cut}
