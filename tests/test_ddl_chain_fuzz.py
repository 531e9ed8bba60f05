"""Randomized DDL-chain differential fuzz (M9/S3/S8 depth).

Each trial builds a changelog whose schema evolves through a RANDOM
sequence of add_column / rename_column / drop_column DDLs (chains like
add x0 → rename role→r1 → drop x0 → add x2 ...), with every epoch file
written under its then-active PHYSICAL schema — exactly how binlog
events are persisted under the schema active when they were written
(reference: active-schema evolution, CHANGES.txt:57,45-46). The engine
replays the stream (with a random kill/resume split, so the schema
history must round-trip through the registry's persisted state — S8)
and must converge to the sequential oracle's table under the fully
evolved schema, column set included.

`text` is never renamed/dropped: it carries the north-star per-turn
text-equality invariant the comparator pins first.
"""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rayrep.config import EngineConfig
from rayrep.gen import T0_US
from rayrep.pipeline import final_table_pandas, replay

from .oracle import replay_oracle
from .test_replay import assert_frames_equal

_META_PRE = [
    ("seq", pa.int64()), ("txn_id", pa.int64()), ("op", pa.string()),
    ("schema_ver", pa.int32()), ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
]
_META_POST = [("ts", pa.timestamp("us")), ("ddl", pa.string())]


def _build_chain(rng: np.random.Generator):
    """Random evolving stream → (per-segment row dicts, per-segment payload
    columns, union-schema rows for the oracle)."""
    convs = [f"c{i}" for i in range(int(rng.integers(4, 12)))]
    payload = ["role", "text"]          # active payload columns, in order
    dropped: list[str] = []             # names freed by drops — reusable
    fresh = 0
    seq = 0
    segments = []                       # [(payload_cols, [row dicts])]
    n_segments = int(rng.integers(2, 6))
    for seg in range(n_segments):
        rows = []
        if seg > 0:
            mutable = [c for c in payload if c != "text"]
            act = str(rng.choice(["add"] + (["rename", "drop"] if mutable else [])))
            if act == "add":
                # half the time RE-ADD a previously dropped name: the old
                # data must not resurrect (version-stamped chain fold)
                if dropped and rng.integers(0, 2):
                    name = dropped.pop(0)
                else:
                    name = f"x{fresh}"; fresh += 1
                ddl = {"action": "add_column", "name": name, "type": "string"}
                payload = payload + [name]
            elif act == "rename":
                src = str(rng.choice(mutable))
                dst = f"r{fresh}"; fresh += 1
                ddl = {"action": "rename_column", "from": src, "to": dst}
                payload = [dst if c == src else c for c in payload]
                dropped.append(src)     # a rename frees its source name too
            else:
                victim = str(rng.choice(mutable))
                ddl = {"action": "drop_column", "name": victim}
                payload = [c for c in payload if c != victim]
                dropped.append(victim)
            rows.append({"seq": seq, "op": "DDL", "schema_ver": seg + 1,
                         "ddl": json.dumps(ddl), "ts": T0_US})
            seq += 1
        for _ in range(int(rng.integers(5, 40))):
            op = str(rng.choice(["I", "U", "U", "D"]))
            row = {
                "seq": seq, "op": op, "schema_ver": seg + 1, "ddl": None,
                "conv_id": str(rng.choice(convs)),
                "turn_idx": int(rng.integers(0, 4)),
                "ts": T0_US + int(rng.integers(0, 30)) * 1_000_000,
            }
            for c in payload:
                row[c] = None if op == "D" else f"{c}.s{seq}"
            rows.append(row)
            seq += 1
        segments.append((list(payload), rows))
    return segments


def _segment_table(payload_cols, rows) -> pa.Table:
    """One epoch file under the segment's then-active physical schema."""
    fields = (_META_PRE
              + [(c, pa.string()) for c in payload_cols]
              + _META_POST)
    cols = {}
    for name, typ in fields:
        cols[name] = pa.array([r.get(name) for r in rows], typ)
    return pa.table(cols)


def _oracle_table(segments) -> pa.Table:
    """Union-schema changelog for the sequential oracle: every column that
    ever existed, null where a row's schema lacked it."""
    all_payload = []
    for payload_cols, _ in segments:
        for c in payload_cols:
            if c not in all_payload:
                all_payload.append(c)
    rows = [r for _, rs in segments for r in rs]
    fields = _META_PRE + [(c, pa.string()) for c in all_payload] + _META_POST
    return pa.table({n: pa.array([r.get(n) for r in rows], t)
                     for n, t in fields})


@pytest.mark.parametrize("seed", [11, 22, 33, 44, 55, 66])
def test_ddl_chain_fuzz_matches_oracle(tmp_path, seed):
    rng = np.random.default_rng(seed)
    segments = _build_chain(rng)
    cl = str(tmp_path / "cl")
    os.makedirs(cl)
    for e, (payload_cols, rows) in enumerate(segments):
        pq.write_table(_segment_table(payload_cols, rows),
                       os.path.join(cl, f"epoch-{e:05d}.parquet"))

    cfg = EngineConfig(
        changelog_dir=cl, lake_dir=str(tmp_path / "lake"),
        num_partitions=int(rng.integers(2, 5)), applier_concurrency=2,
        map_combine=bool(rng.integers(0, 2)),
        state_snapshot_interval=int(rng.choice([1, 3])),
        # >1 makes one round span several schema versions: the augmenter
        # must evolve each epoch's batches stepwise from their own version
        epochs_per_round=int(rng.choice([1, 2, 3])),
        delta_output=False,
    )
    # kill/resume split: the schema history must survive the restart (S8)
    k = int(rng.integers(0, len(segments) - 1))
    replay(cfg, end_epoch=k)
    res = replay(cfg)

    oracle_df, octr = replay_oracle(_oracle_table(segments))
    got = final_table_pandas(cfg.lake_dir)
    assert set(got.columns) == set(oracle_df.columns), (
        sorted(got.columns), sorted(oracle_df.columns))
    assert_frames_equal(got, oracle_df)
    assert res["totals"]["applied"] == octr["applied"]
    assert res["totals"]["conflict"] == octr["conflict"]
    assert res["schema_version"] == len(segments)


def test_drop_then_readd_does_not_resurrect(tmp_path):
    """MySQL DROP COLUMN discards data: re-adding the same name later
    yields NULL for keys last written before the drop, even though their
    pre-drop state-chain files physically still carry the old values."""
    segs = [
        (["role", "text"], [
            {"seq": 0, "op": "I", "schema_ver": 1, "ddl": None, "conv_id": "a",
             "turn_idx": 0, "ts": T0_US, "role": "u", "text": "a0"},
        ]),
        (["role", "text", "x0"], [
            {"seq": 1, "op": "DDL", "schema_ver": 2, "ddl": json.dumps(
                {"action": "add_column", "name": "x0", "type": "string"}),
             "ts": T0_US},
            {"seq": 2, "op": "U", "schema_ver": 2, "ddl": None, "conv_id": "a",
             "turn_idx": 0, "ts": T0_US + 1_000_000, "role": "u",
             "text": "a1", "x0": "SECRET"},
        ]),
        (["role", "text"], [
            {"seq": 3, "op": "DDL", "schema_ver": 3, "ddl": json.dumps(
                {"action": "drop_column", "name": "x0"}), "ts": T0_US},
            {"seq": 4, "op": "I", "schema_ver": 3, "ddl": None, "conv_id": "b",
             "turn_idx": 0, "ts": T0_US + 2_000_000, "role": "u", "text": "b0"},
        ]),
        (["role", "text", "x0"], [
            {"seq": 5, "op": "DDL", "schema_ver": 4, "ddl": json.dumps(
                {"action": "add_column", "name": "x0", "type": "string"}),
             "ts": T0_US},
            {"seq": 6, "op": "I", "schema_ver": 4, "ddl": None, "conv_id": "c",
             "turn_idx": 0, "ts": T0_US + 3_000_000, "role": "u",
             "text": "c0", "x0": "fresh"},
        ]),
    ]
    cl = str(tmp_path / "cl")
    os.makedirs(cl)
    for e, (cols, rows) in enumerate(segs):
        pq.write_table(_segment_table(cols, rows),
                       os.path.join(cl, f"epoch-{e:05d}.parquet"))
    cfg = EngineConfig(changelog_dir=cl, lake_dir=str(tmp_path / "lake"),
                       num_partitions=2, applier_concurrency=2,
                       delta_output=False,
                       # keep a's pre-drop chain file alive through the re-add
                       state_snapshot_interval=10)
    replay(cfg)
    got = final_table_pandas(cfg.lake_dir).set_index("conv_id")
    import pandas as pd
    assert got.loc["c", "x0"] == "fresh"
    assert pd.isna(got.loc["a", "x0"]), (
        "dropped column data resurrected through re-add")
    assert pd.isna(got.loc["b", "x0"])
    oracle_df, _ = replay_oracle(_oracle_table(segs))
    assert_frames_equal(got.reset_index(), oracle_df)


@pytest.mark.parametrize("epochs_per_round", [1, 4])
def test_rename_readd_drop_chain_multi_epoch_round(tmp_path, epochs_per_round):
    """rename role→r0, re-add `role`, drop r0 — then events carrying the
    NEW-generation `role`. With epochs_per_round>1 one round spans all
    four schema versions, so the augmenter must evolve each epoch's
    batches stepwise from their own version: the cumulative rename map
    alone would misroute the new `role` into the dropped `r0`."""
    T = T0_US
    segs = [
        (["role", "text"], [
            {"seq": 0, "op": "I", "schema_ver": 1, "ddl": None, "conv_id": "a",
             "turn_idx": 0, "ts": T, "role": "gen1", "text": "t0"},
        ]),
        (["r0", "text"], [
            {"seq": 1, "op": "DDL", "schema_ver": 2, "ddl": json.dumps(
                {"action": "rename_column", "from": "role", "to": "r0"}),
             "ts": T},
            {"seq": 2, "op": "U", "schema_ver": 2, "ddl": None, "conv_id": "a",
             "turn_idx": 0, "ts": T + 1_000_000, "r0": "gen1b", "text": "t1"},
        ]),
        (["r0", "text", "role"], [
            {"seq": 3, "op": "DDL", "schema_ver": 3, "ddl": json.dumps(
                {"action": "add_column", "name": "role", "type": "string"}),
             "ts": T},
            {"seq": 4, "op": "U", "schema_ver": 3, "ddl": None, "conv_id": "a",
             "turn_idx": 0, "ts": T + 2_000_000, "r0": "gen1c",
             "role": "gen2", "text": "t2"},
        ]),
        (["text", "role"], [
            {"seq": 5, "op": "DDL", "schema_ver": 4, "ddl": json.dumps(
                {"action": "drop_column", "name": "r0"}), "ts": T},
            {"seq": 6, "op": "U", "schema_ver": 4, "ddl": None, "conv_id": "a",
             "turn_idx": 0, "ts": T + 3_000_000, "role": "gen2b",
             "text": "t3"},
        ]),
    ]
    cl = str(tmp_path / "cl")
    os.makedirs(cl)
    for e, (cols, rows) in enumerate(segs):
        pq.write_table(_segment_table(cols, rows),
                       os.path.join(cl, f"epoch-{e:05d}.parquet"))
    cfg = EngineConfig(changelog_dir=cl, lake_dir=str(tmp_path / "lake"),
                       num_partitions=2, applier_concurrency=2,
                       epochs_per_round=epochs_per_round, delta_output=False)
    replay(cfg)
    got = final_table_pandas(cfg.lake_dir)
    assert list(got["text"]) == ["t3"]
    assert list(got["role"]) == ["gen2b"]
    assert "r0" not in got.columns
    oracle_df, _ = replay_oracle(_oracle_table(segs))
    assert_frames_equal(got, oracle_df)
