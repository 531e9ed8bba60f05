"""CDC-envelope ingest/export (rayrep/ingest.py): Debezium-style JSONL →
engine epochs (dense seq, version-exact schema_ver, atomic in-order
publication) and the egress mirror; round-trip equality against the
generator's native changelog through a full engine replay."""

import json
import os

import pyarrow.parquet as pq
import pytest

from rayrep.config import EngineConfig
from rayrep.gen import GenSpec, generate_changelog, write_changelog
from rayrep.ingest import (
    IngestFormatError,
    IngestOrderError,
    export_envelopes,
    ingest_cdc_json,
)
from rayrep.pipeline import final_table_pandas, replay

from .oracle import replay_oracle
from .test_replay import assert_frames_equal


def _env(op, conv, turn, pos, ts_ms=1700000000000, file="binlog.000001",
         **kw):
    e = {"op": op, "ts_ms": ts_ms, "source": {"file": file, "pos": pos}}
    if op == "d":
        e["before"], e["after"] = {"conv_id": conv, "turn_idx": turn}, None
    elif op == "ddl":
        e["before"] = e["after"] = None
        e["ddl"] = kw.pop("ddl")
    else:
        e["before"] = None
        e["after"] = {"conv_id": conv, "turn_idx": turn, **kw}
    e.update(kw if op != "ddl" else {})
    return json.dumps(e)


def _write(src, name, lines):
    with open(os.path.join(src, name), "w") as f:
        f.write("\n".join(lines) + "\n")


@pytest.fixture()
def src(tmp_path):
    d = str(tmp_path / "src")
    os.makedirs(d)
    return d


def test_ingest_replay_end_to_end(src, tmp_path):
    """Hand-built envelope stream with mid-stream DDL, deletes, and an
    out-of-order-within-file pair (sorted by pos at parse): ingest →
    replay → exact expected table."""
    _write(src, "flush-000.jsonl", [
        _env("r", "c1", 0, 100, role="user", text="hello"),
        # deliberately out of pos order within the file:
        _env("u", "c1", 0, 300, role="user", text="hello v2",
             ts_ms=1700000002000),
        _env("c", "c2", 0, 200, role="user", text="hi", ts_ms=1700000001000),
    ])
    _write(src, "flush-001.jsonl", [
        _env("ddl", None, None, 400,
             ddl={"action": "add_column", "name": "tool", "type": "string"}),
        _env("c", "c1", 1, 500, role="assistant", text="resp", tool="calc",
             ts_ms=1700000003000),
        _env("d", "c2", 0, 600, ts_ms=1700000004000),
    ])
    cl = str(tmp_path / "cl")
    res = ingest_cdc_json(src, cl)
    assert [e["epoch"] for e in res["epochs"]] == [0, 1]
    assert res["next_seq"] == 6 and res["next_schema_ver"] == 2
    # pre-DDL epoch physically lacks the added column
    t0 = pq.read_table(os.path.join(cl, "epoch-00000"))
    assert "tool" not in t0.column_names
    assert t0.column("seq").to_pylist() == [0, 1, 2]  # pos-sorted, dense
    assert t0.column("text").to_pylist() == ["hello", "hi", "hello v2"]
    lake = str(tmp_path / "lake")
    replay(EngineConfig(changelog_dir=cl, lake_dir=lake, num_partitions=4,
                        applier_concurrency=2))
    df = final_table_pandas(lake)
    assert df[["conv_id", "turn_idx", "text", "tool"]].values.tolist() == [
        ["c1", 0, "hello v2", None], ["c1", 1, "resp", "calc"]]


def test_ingested_log_passes_checklog(src, tmp_path):
    from rayrep.checklog import check_changelog

    _write(src, "a.jsonl", [_env("c", "c1", 0, 1),
                            _env("c", "c2", 0, 2, ts_ms=1700000001000)])
    _write(src, "b.jsonl", [_env("u", "c1", 0, 3, role="user", text="x",
                                 ts_ms=1700000002000)])
    cl = str(tmp_path / "cl")
    ingest_cdc_json(src, cl)
    rep = check_changelog(cl)
    assert rep["ok"], rep["errors"]
    assert all(e["dense"] for e in rep["epochs"])


def test_order_violation_refused(src, tmp_path):
    _write(src, "a.jsonl", [_env("c", "c1", 0, 100)])
    _write(src, "b.jsonl", [_env("c", "c2", 0, 50)])  # pos regresses
    with pytest.raises(IngestOrderError, match="binlog order"):
        ingest_cdc_json(src, str(tmp_path / "cl"))


def test_format_errors(src, tmp_path):
    cl = str(tmp_path / "cl")
    _write(src, "a.jsonl", [json.dumps(
        {"op": "x", "ts_ms": 1, "source": {"file": "f", "pos": 1}})])
    with pytest.raises(IngestFormatError, match="unknown op"):
        ingest_cdc_json(src, cl)
    _write(src, "a.jsonl", [json.dumps(
        {"op": "c", "ts_ms": 1, "source": {"file": "f", "pos": 1},
         "after": {"conv_id": None, "turn_idx": 0}})])
    with pytest.raises(IngestFormatError, match="null key"):
        ingest_cdc_json(src, cl)
    _write(src, "a.jsonl", [json.dumps({"op": "c", "after": {}})])
    with pytest.raises(IngestFormatError, match="required"):
        ingest_cdc_json(src, cl)


def test_cursor_continuation(src, tmp_path):
    """A second ingest batch continues seq/schema_ver/epoch from the
    first result's cursor — continuous tailing of an external stream."""
    cl = str(tmp_path / "cl")
    _write(src, "a.jsonl", [_env("c", "c1", 0, 1)])
    r1 = ingest_cdc_json(src, cl)
    src2 = str(tmp_path / "src2")
    os.makedirs(src2)
    _write(src2, "b.jsonl", [_env("u", "c1", 0, 2, role="u", text="v2",
                                  ts_ms=1700000001000)])
    r2 = ingest_cdc_json(src2, cl, start_epoch=len(r1["epochs"]),
                         start_seq=r1["next_seq"],
                         start_schema_ver=r1["next_schema_ver"])
    assert r2["epochs"][0]["epoch"] == 1
    assert r2["epochs"][0]["min_seq"] == r1["next_seq"]
    lake = str(tmp_path / "lake")
    replay(EngineConfig(changelog_dir=cl, lake_dir=lake, num_partitions=2,
                        applier_concurrency=1))
    assert final_table_pandas(lake)["text"].tolist() == ["v2"]


def test_roundtrip_generator_log(tmp_path):
    """Native changelog → envelopes → re-ingested changelog → replay must
    equal the sequential oracle of the ORIGINAL log (loss-free egress +
    ingest, exercised distributed: >1 epoch file under a live Ray)."""
    spec = GenSpec(seed=31, n_conversations=40, max_turns=5, n_events=800,
                   n_epochs=3, zipf_a=1.1)
    cl0 = str(tmp_path / "cl0")
    write_changelog(cl0, spec)
    env = str(tmp_path / "env")
    res = export_envelopes(cl0, env)
    assert res["files"] == 3 and res["rows"] == 801  # + the DDL row
    cl1 = str(tmp_path / "cl1")
    ingest_cdc_json(env, cl1)
    lake = str(tmp_path / "lake")
    replay(EngineConfig(changelog_dir=cl1, lake_dir=lake, num_partitions=4,
                        applier_concurrency=2))
    oracle_df, _ = replay_oracle(generate_changelog(spec))
    assert_frames_equal(final_table_pandas(lake), oracle_df)


def test_cli_ingest_and_export(src, tmp_path, capsys):
    from rayrep import cli

    _write(src, "a.jsonl", [_env("c", "c1", 0, 1, role="u", text="t")])
    cl = str(tmp_path / "cl")
    assert cli.main(["ingest-json", src, cl]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["rows"] == 1
    env2 = str(tmp_path / "env2")
    assert cli.main(["export-json", cl, env2]) == 0
    assert json.loads(capsys.readouterr().out)["rows"] == 1
    line = json.loads(open(os.path.join(env2, "flush-00000.jsonl")).read())
    assert line["op"] == "c" and line["after"]["conv_id"] == "c1"


def test_follow_live_producer(tmp_path):
    """The streaming Debezium path: a producer thread keeps flushing
    envelope files (atomic rename publication) while ingest_cdc_json_tail
    follows the directory — each file lands as an engine epoch as it
    appears, a mid-stream restart resumes from the per-epoch source
    markers without re-ingesting or skipping, and the final replay equals
    the native-log oracle."""
    import threading
    import time as _t

    from rayrep.gen import generate_changelog, write_changelog
    from rayrep.ingest import ingest_cdc_json_tail

    spec = GenSpec(seed=37, n_conversations=40, max_turns=5, n_events=800,
                   n_epochs=4, zipf_a=1.1)
    cl0 = str(tmp_path / "cl0")
    write_changelog(cl0, spec)
    env_all = str(tmp_path / "env_all")
    export_envelopes(cl0, env_all)
    names = sorted(os.listdir(env_all))
    assert len(names) == 4
    src = str(tmp_path / "src")
    os.makedirs(src)

    def flush(name):
        tmp = os.path.join(src, "." + name + ".tmp")
        os.link(os.path.join(env_all, name), tmp)
        os.rename(tmp, os.path.join(src, name))

    # phase 1: two files exist; follower ingests them then stops at
    # max_files — the simulated crash point
    flush(names[0])
    flush(names[1])
    cl = str(tmp_path / "cl")
    r1 = ingest_cdc_json_tail(src, cl, poll_interval_s=0.1,
                              idle_timeout_s=3.0, max_files=2)
    assert r1["files"] == 2 and r1["next_epoch"] == 2
    # phase 2: a RESTARTED follower (fresh cursor recovery) picks up the
    # rest as a live producer flushes them
    def producer():
        for n in names[2:]:
            _t.sleep(0.5)
            flush(n)

    th = threading.Thread(target=producer)
    th.start()
    r2 = ingest_cdc_json_tail(src, cl, poll_interval_s=0.1,
                              idle_timeout_s=3.0)
    th.join()
    assert r2["files"] == 2 and r2["next_epoch"] == 4
    assert sorted(os.listdir(cl))[:4] == [f"epoch-{e:05d}" for e in range(4)]
    lake = str(tmp_path / "lake")
    replay(EngineConfig(changelog_dir=cl, lake_dir=lake, num_partitions=4,
                        applier_concurrency=2))
    oracle_df, _ = replay_oracle(generate_changelog(spec))
    assert_frames_equal(final_table_pandas(lake), oracle_df)
    # a third follower run over the quiet directory ingests nothing
    r3 = ingest_cdc_json_tail(src, cl, poll_interval_s=0.1,
                              idle_timeout_s=0.5)
    assert r3["files"] == 0 and r3["next_epoch"] == 4


def test_follow_refuses_cross_batch_order_violation(src, tmp_path):
    """A producer that flushes a later-named file whose binlog position
    regresses below the already-ingested frontier is refused, exactly
    like an in-batch violation."""
    from rayrep.ingest import ingest_cdc_json_tail

    cl = str(tmp_path / "cl")
    _write(src, "a.jsonl", [_env("c", "c1", 0, 100)])
    r1 = ingest_cdc_json_tail(src, cl, poll_interval_s=0.1,
                              idle_timeout_s=0.5)
    assert r1["files"] == 1
    _write(src, "b.jsonl", [_env("u", "c1", 0, 50, role="u", text="x")])
    with pytest.raises(IngestOrderError):
        ingest_cdc_json_tail(src, cl, poll_interval_s=0.1,
                             idle_timeout_s=0.5)
