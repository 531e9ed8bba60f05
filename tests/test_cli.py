"""CLI surface (rayrep/cli.py): drive `main()` in-process — gen → replay
(resume idempotence) and the dedup-ingest flags + `compact-index`
subcommand. The session fixture owns Ray; `main()` reuses a live session
(`if not ray.is_initialized()`), so these never re-init."""

import json
import os

from rayrep.cli import main

from .test_ingest_dedup import _epoch


def _last_json(capsys):
    out = capsys.readouterr().out.strip().splitlines()
    return json.loads(out[-1])


def test_cli_gen_replay_resume(tmp_path, capsys):
    cl, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    assert main(["gen", cl, "--events", "400", "--conversations", "20",
                 "--epochs", "2"]) == 0
    assert _last_json(capsys)["n_events"] >= 400  # +1 DDL row
    assert main(["replay", cl, lake, "--partitions", "4",
                 "--appliers", "2", "--num-cpus", "4"]) == 0
    res = _last_json(capsys)
    assert [e["epoch"] for e in res["epochs"]] == [0, 1]
    # idempotent re-run: everything committed, nothing replays
    assert main(["replay", cl, lake, "--partitions", "4",
                 "--appliers", "2", "--num-cpus", "4"]) == 0
    assert _last_json(capsys)["epochs"] == []


def test_cli_dedup_ingest_and_compact_index(tmp_path, capsys):
    cl, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    _epoch(os.path.join(cl, "epoch-00000.parquet"), [
        (0, "I", "A", 0, "dup"), (1, "I", "B", 0, "dup"),
        (2, "I", "C", 0, "solo"),
    ])
    _epoch(os.path.join(cl, "epoch-00001.parquet"), [
        (10, "I", "D", 0, "dup"), (11, "I", "E", 0, "solo"),
        (12, "I", "F", 0, "fresh"),
    ])
    assert main(["replay", cl, lake, "--partitions", "4", "--appliers", "2",
                 "--num-cpus", "4", "--no-delta", "--dedup-ingest"]) == 0
    res = _last_json(capsys)
    assert sum(e["deduped"] for e in res["epochs"]) == 3  # B, D, E dropped
    assert os.path.isdir(os.path.join(lake, "content_index"))
    assert main(["compact-index", lake]) == 0
    cres = _last_json(capsys)
    assert cres["deduped_total"] == 3
    assert cres["files_removed"] >= 0
    # claims survive compaction: a third epoch re-posting "dup" still dedups
    _epoch(os.path.join(cl, "epoch-00002.parquet"), [(20, "I", "Z", 0, "dup")])
    assert main(["replay", cl, lake, "--partitions", "4", "--appliers", "2",
                 "--num-cpus", "4", "--no-delta", "--dedup-ingest"]) == 0
    res = _last_json(capsys)
    assert res["epochs"][-1]["deduped"] == 1
