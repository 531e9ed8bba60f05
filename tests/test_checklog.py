"""Changelog integrity checker (rayrep/checklog.py) — the reference
validator's source-side analog (README.md:19-20): dense-seq / contiguous
epoch / row-hygiene audit over a published changelog.

Covers: a healthy generated log (incl. its mid-stream DDL row), each
corruption class — dropped row (gap), duplicate-paired-with-gap where
count/min/max are all UNCHANGED (only the hash-sum catches it), missing
epoch directory, broken epoch chaining, bad op domain, null routing key
— and the CLI exit-code contract.
"""

import glob
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from rayrep.checklog import check_changelog
from rayrep.gen import GenSpec, write_changelog

SPEC = GenSpec(seed=31, n_conversations=60, max_turns=5, n_events=2400, n_epochs=4)


def _mklog(tmp_path) -> str:
    cl = str(tmp_path / "cl")
    write_changelog(cl, SPEC)
    return cl


def _epoch_file(cl: str, epoch: int) -> str:
    hits = sorted(glob.glob(os.path.join(cl, f"epoch-{epoch:05d}", "*.parquet"))
                  or glob.glob(os.path.join(cl, f"epoch-{epoch:05d}.parquet")))
    return hits[0]


def test_healthy_log_passes(tmp_path):
    cl = _mklog(tmp_path)
    rep = check_changelog(cl)
    assert rep["ok"], rep["errors"]
    assert len(rep["epochs"]) == 4
    assert all(e["dense"] for e in rep["epochs"])
    # epochs chain: total rows == the full dense seq range
    assert rep["total_rows"] == rep["epochs"][-1]["max_seq"] + 1
    # the generator's mid-stream DDL row is counted, not flagged
    assert sum(e["n_ddl"] for e in rep["epochs"]) == 1


def test_dropped_row_detected(tmp_path):
    cl = _mklog(tmp_path)
    f = _epoch_file(cl, 1)
    t = pq.read_table(f)
    pq.write_table(pa.concat_tables([t.slice(0, 5), t.slice(6)]), f)
    rep = check_changelog(cl)
    assert not rep["ok"]
    assert any("epoch 1" in e and "contiguous" in e for e in rep["errors"])
    assert not rep["epochs"][1]["dense"]
    assert rep["epochs"][0]["dense"] and rep["epochs"][2]["dense"]


def test_dup_paired_with_gap_caught_by_hash_only(tmp_path):
    """Replace one INTERIOR seq with a copy of its neighbour: row count,
    min_seq and max_seq are all unchanged — only the hash-sum of the seq
    multiset can see it."""
    cl = _mklog(tmp_path)
    f = _epoch_file(cl, 2)
    t = pq.read_table(f)
    seqs = t["seq"].to_pylist()
    seqs[5] = seqs[4]  # interior dup+gap
    t2 = t.set_column(t.column_names.index("seq"), "seq", pa.array(seqs, pa.int64()))
    pq.write_table(t2, f)
    rep = check_changelog(cl)
    bad = rep["epochs"][2]
    good = pq.read_table(f).num_rows  # sanity: count unchanged
    assert bad["n_rows"] == t.num_rows == good
    assert bad["min_seq"] == min(t["seq"].to_pylist())
    assert bad["max_seq"] == max(t["seq"].to_pylist())
    assert not rep["ok"]
    assert any("epoch 2" in e and "hash MISMATCH" in e for e in rep["errors"])


def test_missing_epoch_dir(tmp_path):
    cl = _mklog(tmp_path)
    victim = sorted(glob.glob(os.path.join(cl, "epoch-00002*")))[0]
    shutil.move(victim, os.path.join(cl, "quarantine"))
    rep = check_changelog(cl)
    assert not rep["ok"]
    assert rep["missing_epochs"] == [2]
    # the surviving epochs also fail the chain check across the hole
    assert any("chain contiguously" in e for e in rep["errors"])


def test_bad_op_and_null_key(tmp_path):
    cl = _mklog(tmp_path)
    f = _epoch_file(cl, 0)
    t = pq.read_table(f)
    ops = t["op"].to_pylist()
    ops[3] = "X"  # outside I/U/D/DDL
    conv = t["conv_id"].to_pylist()
    conv[7] = None  # non-DDL row with null routing key
    t = t.set_column(t.column_names.index("op"), "op", pa.array(ops, pa.string()))
    t = t.set_column(t.column_names.index("conv_id"), "conv_id",
                     pa.array(conv, pa.string()))
    pq.write_table(t, f)
    rep = check_changelog(cl)
    assert not rep["ok"]
    assert any("op outside" in e for e in rep["errors"])
    assert any("null" in e and "route" in e for e in rep["errors"])


def test_cli_checklog_exit_codes(tmp_path):
    from rayrep import cli

    cl = _mklog(tmp_path)
    assert cli.main(["check-log", cl]) == 0
    f = _epoch_file(cl, 1)
    t = pq.read_table(f)
    pq.write_table(t.slice(1), f)  # drop the first row
    assert cli.main(["check-log", cl]) == 3
