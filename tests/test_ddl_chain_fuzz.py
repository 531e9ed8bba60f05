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


# lossless alter_type transitions (the test universe; the engine casts
# whatever Arrow casts — both replay engines agree bitwise on these)
_ALTERS = {"int32": ["int64", "string"], "int64": ["string"]}
_PA_TYPES = {"string": pa.string(), "int32": pa.int32(), "int64": pa.int64()}


def _build_chain(rng: np.random.Generator):
    """Random evolving stream → [(payload_cols, {col: type_name}, rows)]
    per segment, each written under its then-active physical schema."""
    convs = [f"c{i}" for i in range(int(rng.integers(4, 12)))]
    payload = ["role", "text"]          # active payload columns, in order
    types = {"role": "string", "text": "string"}
    dropped: list[str] = []             # names freed by drops — reusable
    fresh = 0
    seq = 0
    segments = []                       # [(payload_cols, types, rows)]
    n_segments = int(rng.integers(2, 6))
    for seg in range(n_segments):
        rows = []
        if seg > 0:
            mutable = [c for c in payload if c != "text"]
            alterable = [c for c in mutable if types[c] in _ALTERS]
            acts = ["add"] + (["rename", "drop"] if mutable else []) \
                + (["alter"] if alterable else [])
            act = str(rng.choice(acts))
            if act == "add":
                # half the time RE-ADD a previously dropped name: the old
                # data must not resurrect (version-stamped chain fold)
                if dropped and rng.integers(0, 2):
                    name = dropped.pop(0)
                else:
                    name = f"x{fresh}"; fresh += 1
                typ = str(rng.choice(["string", "int32"]))
                ddl = {"action": "add_column", "name": name, "type": typ}
                payload = payload + [name]
                types[name] = typ
            elif act == "rename":
                src = str(rng.choice(mutable))
                dst = f"r{fresh}"; fresh += 1
                ddl = {"action": "rename_column", "from": src, "to": dst}
                payload = [dst if c == src else c for c in payload]
                types[dst] = types.pop(src)
                dropped.append(src)     # a rename frees its source name too
            elif act == "alter":
                col = str(rng.choice(alterable))
                typ = str(rng.choice(_ALTERS[types[col]]))
                ddl = {"action": "alter_type", "name": col, "type": typ}
                types[col] = typ
            else:
                victim = str(rng.choice(mutable))
                ddl = {"action": "drop_column", "name": victim}
                payload = [c for c in payload if c != victim]
                types.pop(victim)
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
                if op == "D":
                    row[c] = None
                elif types[c] == "string":
                    row[c] = f"{c}.s{seq}"
                else:
                    row[c] = int(seq)
            rows.append(row)
            seq += 1
        segments.append((list(payload), dict(types), rows))
    return segments


def _segment_table(payload_cols, rows, types=None) -> pa.Table:
    """One epoch file under the segment's then-active physical schema."""
    types = types or {}
    fields = (_META_PRE
              + [(c, _PA_TYPES[types.get(c, "string")]) for c in payload_cols]
              + _META_POST)
    cols = {}
    for name, typ in fields:
        cols[name] = pa.array([r.get(name) for r in rows], typ)
    return pa.table(cols)


def _oracle_table(segments) -> pa.Table:
    """Union-schema changelog for the sequential oracle: every column that
    ever existed, null where a row's schema lacked it (all-string segs)."""
    all_payload = []
    for payload_cols, _ in segments:
        for c in payload_cols:
            if c not in all_payload:
                all_payload.append(c)
    rows = [r for _, rs in segments for r in rs]
    fields = _META_PRE + [(c, pa.string()) for c in all_payload] + _META_POST
    return pa.table({n: pa.array([r.get(n) for r in rows], t)
                     for n, t in fields})


def _oracle_frame(segments) -> "pd.DataFrame":
    """Union-schema changelog as an object-dtype frame: exact Python
    values survive (an Arrow union table can't hold a column whose type
    CHANGES mid-stream; the oracle applies each alter's cast itself)."""
    import pandas as pd

    all_payload = []
    for payload_cols, _, _ in segments:
        for c in payload_cols:
            if c not in all_payload:
                all_payload.append(c)
    rows = [r for _, _, rs in segments for r in rs]
    names = ([n for n, _ in _META_PRE] + all_payload
             + [n for n, _ in _META_POST])
    return pd.DataFrame(rows, columns=names, dtype=object)


@pytest.mark.parametrize("seed", [11, 22, 33, 44, 55, 66, 77, 88, 99,
                                  106, 107, 108, 114, 122, 125, 147])
def test_ddl_chain_fuzz_matches_oracle(tmp_path, seed):
    rng = np.random.default_rng(seed)
    segments = _build_chain(rng)
    cl = str(tmp_path / "cl")
    os.makedirs(cl)
    for e, (payload_cols, types, rows) in enumerate(segments):
        pq.write_table(_segment_table(payload_cols, rows, types),
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
    # random maintenance op at the split — DDL chains × state rewrites is
    # where version-stamp preservation gets stressed: a rewrite mid-chain
    # re-stamps at the THEN-current registry version, and later DDLs must
    # still evolve the rewritten file step-exact
    action = str(rng.choice(["none", "compact", "repartition", "repair",
                             "compact_log", "rebind"]))
    if action == "compact_log" and k >= 1:
        # Kafka-style span over the committed DDL-straddling prefix:
        # stresses the per-version mixed-batch evolution path (a span
        # read can bundle files at different physical schema versions)
        from rayrep.logcompact import compact_changelog

        compact_changelog(cl, through_epoch=k - 1, lake_dir=cfg.lake_dir)
    elif action == "rebind":
        # source failover mid-DDL-chain: the SAME stream re-published
        # under different epoch boundaries (each segment's rows split
        # into random sub-epochs, preserving the "file schema = then-
        # active schema" contract a real promoted replica keeps), then
        # checkpoint translation; the resume must evolve re-read
        # old-version rows step-exact against the already-advanced
        # registry
        import dataclasses

        from rayrep.failover import rebind_source

        clB = str(tmp_path / "clB")
        os.makedirs(clB)
        eB = 0
        for payload_cols, types, seg_rows in segments:
            n_sub = int(rng.integers(1, 4))
            nseg = len(seg_rows)
            bounds = sorted({nseg * i // n_sub for i in range(n_sub + 1)})
            for lo, hi in zip(bounds, bounds[1:]):
                pq.write_table(
                    _segment_table(payload_cols, seg_rows[lo:hi], types),
                    os.path.join(clB, f"epoch-{eB:05d}.parquet"))
                eB += 1
        rebind_source(cfg.lake_dir, clB)
        cfg = dataclasses.replace(cfg, changelog_dir=clB)
    if action == "compact":
        from rayrep.compact import compact_lake

        compact_lake(cfg.lake_dir)
    elif action == "repartition":
        import dataclasses

        from rayrep.repart import repartition_lake

        new_p = int(rng.integers(1, 6))
        dst = str(tmp_path / "lake_repart")
        repartition_lake(cfg.lake_dir, dst, new_p)
        cfg = dataclasses.replace(cfg, lake_dir=dst, num_partitions=new_p)
    elif action == "repair":
        import shutil

        from rayrep.repair import repair_partitions

        parts = sorted(d for d in os.listdir(cfg.lake_dir)
                       if d.startswith("part-"))
        if parts:
            victim = parts[int(rng.integers(0, len(parts)))]
            pid = int(victim.split("-")[1])
            shutil.rmtree(os.path.join(cfg.lake_dir, victim))
            mp = os.path.join(cfg.lake_dir, "_manifests", f"p{pid:05d}.json")
            if os.path.exists(mp):
                os.remove(mp)
            repair_partitions(cfg, [pid])
    res = replay(cfg)

    oracle_df, octr = replay_oracle(_oracle_frame(segments))
    got = final_table_pandas(cfg.lake_dir)
    assert set(got.columns) == set(oracle_df.columns), (
        sorted(got.columns), sorted(oracle_df.columns))
    # canonicalize numerics: the engine yields float64 for nullable ints,
    # the oracle object-dtype ints/Nones — compare both as float64
    import pandas.api.types as ptypes
    for c in got.columns:
        if c != "text" and (ptypes.is_numeric_dtype(got[c])
                            and not ptypes.is_bool_dtype(got[c])):
            got[c] = got[c].astype("float64")
            oracle_df[c] = oracle_df[c].astype("float64")
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


def test_alter_type_chain_casts_state_sequentially(tmp_path):
    """MySQL MODIFY converts existing data at each ALTER: a value written
    as int32 at v1, altered int32→int64 at v2 and int64→string at v3,
    must surface as its decimal string — including for keys whose LAST
    write predates both alters (the cast happens at the state-chain
    conform, driven by the file's version stamp)."""
    T = T0_US
    segs = [
        (["role", "text", "n"], {"n": "int32"}, [
            {"seq": 0, "op": "I", "schema_ver": 1, "ddl": None, "conv_id": "a",
             "turn_idx": 0, "ts": T, "role": "u", "text": "a0", "n": 7},
        ]),
        (["role", "text", "n"], {"n": "int64"}, [
            {"seq": 1, "op": "DDL", "schema_ver": 2, "ddl": json.dumps(
                {"action": "alter_type", "name": "n", "type": "int64"}),
             "ts": T},
            {"seq": 2, "op": "I", "schema_ver": 2, "ddl": None, "conv_id": "b",
             "turn_idx": 0, "ts": T + 1_000_000, "role": "u", "text": "b0",
             "n": 4_000_000_000},   # needs int64 — overflows int32
        ]),
        (["role", "text", "n"], {"n": "string"}, [
            {"seq": 3, "op": "DDL", "schema_ver": 3, "ddl": json.dumps(
                {"action": "alter_type", "name": "n", "type": "string"}),
             "ts": T},
            {"seq": 4, "op": "I", "schema_ver": 3, "ddl": None, "conv_id": "c",
             "turn_idx": 0, "ts": T + 2_000_000, "role": "u", "text": "c0",
             "n": "str-born"},
        ]),
    ]
    cl = str(tmp_path / "cl")
    os.makedirs(cl)
    for e, (cols, types, rows) in enumerate(segs):
        pq.write_table(_segment_table(cols, rows, types),
                       os.path.join(cl, f"epoch-{e:05d}.parquet"))
    from rayrep.schema import SchemaVersion as _SV
    sv1 = _SV(1, pa.schema([
        pa.field("conv_id", pa.string()), pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()), pa.field("text", pa.string()),
        pa.field("n", pa.int32()), pa.field("ts", pa.timestamp("us")),
    ]))
    cfg = EngineConfig(changelog_dir=cl, lake_dir=str(tmp_path / "lake"),
                       num_partitions=2, applier_concurrency=2,
                       initial_schema_json=sv1.to_json(),
                       delta_output=False,
                       # keep a's v1 chain file alive through both alters
                       state_snapshot_interval=10)
    replay(cfg)
    got = final_table_pandas(cfg.lake_dir).set_index("conv_id")
    assert got.loc["a", "n"] == "7"
    assert got.loc["b", "n"] == "4000000000"
    assert got.loc["c", "n"] == "str-born"
    oracle_df, _ = replay_oracle(_oracle_frame(segs), base_cols=[
        "conv_id", "turn_idx", "role", "text", "n", "ts"])
    assert list(oracle_df.sort_values("conv_id")["n"]) == [
        "7", "4000000000", "str-born"]


def test_alter_after_rename_follows_the_renamed_column(tmp_path):
    """rename n→m at v2, alter m→string at v3: a v1-written state file
    (column still named `n`, typed int32) must land as string under `m`."""
    T = T0_US
    segs = [
        (["text", "n"], {"n": "int32"}, [
            {"seq": 0, "op": "I", "schema_ver": 1, "ddl": None, "conv_id": "a",
             "turn_idx": 0, "ts": T, "text": "a0", "n": 42},
        ]),
        (["text", "m"], {"m": "int32"}, [
            {"seq": 1, "op": "DDL", "schema_ver": 2, "ddl": json.dumps(
                {"action": "rename_column", "from": "n", "to": "m"}),
             "ts": T},
        ]),
        (["text", "m"], {"m": "string"}, [
            {"seq": 2, "op": "DDL", "schema_ver": 3, "ddl": json.dumps(
                {"action": "alter_type", "name": "m", "type": "string"}),
             "ts": T},
            {"seq": 3, "op": "I", "schema_ver": 3, "ddl": None, "conv_id": "b",
             "turn_idx": 0, "ts": T + 1_000_000, "text": "b0", "m": "new"},
        ]),
    ]
    cl = str(tmp_path / "cl")
    os.makedirs(cl)
    for e, (cols, types, rows) in enumerate(segs):
        pq.write_table(_segment_table(cols, rows, types),
                       os.path.join(cl, f"epoch-{e:05d}.parquet"))
    from rayrep.schema import SchemaVersion as _SV
    sv1 = _SV(1, pa.schema([
        pa.field("conv_id", pa.string()), pa.field("turn_idx", pa.int32()),
        pa.field("text", pa.string()), pa.field("n", pa.int32()),
        pa.field("ts", pa.timestamp("us")),
    ]))
    cfg = EngineConfig(changelog_dir=cl, lake_dir=str(tmp_path / "lake"),
                       num_partitions=2, applier_concurrency=2,
                       initial_schema_json=sv1.to_json(),
                       delta_output=False, state_snapshot_interval=10)
    replay(cfg)
    got = final_table_pandas(cfg.lake_dir).set_index("conv_id")
    assert "n" not in got.columns
    assert got.loc["a", "m"] == "42"
    assert got.loc["b", "m"] == "new"


def test_apply_ddl_alter_type_validation():
    from rayrep.schema import SchemaVersion, apply_ddl

    sv = SchemaVersion(1, pa.schema([
        pa.field("conv_id", pa.string()), pa.field("turn_idx", pa.int32()),
        pa.field("n", pa.int32()), pa.field("ts", pa.timestamp("us")),
    ]))
    out = apply_ddl(sv, json.dumps(
        {"action": "alter_type", "name": "n", "type": "int64"}))
    assert out.schema.field("n").type == pa.int64()
    assert out.version == 2
    with pytest.raises(ValueError, match="key column"):
        apply_ddl(sv, json.dumps(
            {"action": "alter_type", "name": "turn_idx", "type": "int64"}))
    with pytest.raises(ValueError, match="not found"):
        apply_ddl(sv, json.dumps(
            {"action": "alter_type", "name": "nope", "type": "int64"}))


def test_evolve_table_from_applies_alter_steps():
    from rayrep.schema import SchemaVersion, apply_ddl, evolve_table_from

    v1 = SchemaVersion(1, pa.schema([
        pa.field("conv_id", pa.string()), pa.field("n", pa.int32()),
    ]))
    v2 = apply_ddl(v1, json.dumps(
        {"action": "alter_type", "name": "n", "type": "int64"}))
    v3 = apply_ddl(v2, json.dumps(
        {"action": "alter_type", "name": "n", "type": "string"}))
    hist = {1: v1, 2: v2, 3: v3}
    t = pa.table({"conv_id": pa.array(["a"]), "n": pa.array([5], pa.int32())})
    out = evolve_table_from(t, 1, v3, hist)
    assert out.schema.field("n").type == pa.string()
    assert out.column("n").to_pylist() == ["5"]
