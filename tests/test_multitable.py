"""Multi-table replay (rayrep/multitable.py): one changelog, one read,
one composite-id packed shuffle, N ordinary single-table lakes."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rayrep.multitable import replay_multi
from rayrep.pipeline import final_table_pandas
from rayrep.schema import SchemaVersion


def _sv(fields):
    return SchemaVersion(1, pa.schema(
        [pa.field("conv_id", pa.string()), pa.field("turn_idx", pa.int32())]
        + fields + [pa.field("ts", pa.timestamp("us"))]))


def _ts(sec):
    return pa.scalar(sec * 1_000_000, pa.timestamp("us")).as_py()


def _write_epoch(cl, e, rows: dict, n: int) -> None:
    base = {
        "seq": pa.nulls(n, pa.int64()), "op": pa.nulls(n, pa.string()),
        "table": pa.nulls(n, pa.string()),
        "conv_id": pa.nulls(n, pa.string()),
        "turn_idx": pa.nulls(n, pa.int32()),
        "val": pa.nulls(n, pa.int64()), "txt": pa.nulls(n, pa.string()),
        "ts": pa.nulls(n, pa.timestamp("us")),
        "ddl": pa.nulls(n, pa.string()),
    }
    base.update(rows)
    edir = os.path.join(cl, f"epoch-{e:05d}")
    os.makedirs(edir, exist_ok=True)
    pq.write_table(pa.table(base), os.path.join(edir, "part-0.parquet"))


@pytest.fixture()
def two_table_cl(tmp_path):
    cl = str(tmp_path / "cl")
    _write_epoch(cl, 0, {
        "seq": pa.array([1, 2, 3, 4], pa.int64()),
        "op": pa.array(["U", "U", "U", "U"]),
        "table": pa.array(["conv", "docs", "conv", "docs"]),
        "conv_id": pa.array(["c1", "d1", "c2", "d2"]),
        "turn_idx": pa.array([0, 0, 0, 0], pa.int32()),
        "val": pa.array([10, None, 30, None], pa.int64()),
        "txt": pa.array([None, "hello", None, "world"], pa.string()),
        "ts": pa.array([_ts(i) for i in range(1, 5)], pa.timestamp("us")),
    }, 4)
    _write_epoch(cl, 1, {
        "seq": pa.array([5, 6], pa.int64()),
        "op": pa.array(["U", "D"]),
        "table": pa.array(["conv", "docs"]),
        "conv_id": pa.array(["c1", "d2"]),
        "turn_idx": pa.array([0, 0], pa.int32()),
        "val": pa.array([99, None], pa.int64()),
        "txt": pa.nulls(2, pa.string()),
        "ts": pa.array([_ts(10), _ts(11)], pa.timestamp("us")),
    }, 2)
    return cl


def _tables(tmp_path):
    return {
        "conv": {"lake_dir": str(tmp_path / "lake_conv"),
                 "schema_json": _sv([pa.field("val", pa.int64())]).to_json()},
        "docs": {"lake_dir": str(tmp_path / "lake_docs"),
                 "schema_json": _sv([pa.field("txt", pa.string())]).to_json()},
    }


def test_two_tables_one_pass(two_table_cl, tmp_path):
    tables = _tables(tmp_path)
    res = replay_multi(two_table_cl, tables, num_partitions=4)
    assert [e["epoch"] for e in res["epochs"]] == [0, 1]
    conv = final_table_pandas(tables["conv"]["lake_dir"])
    docs = final_table_pandas(tables["docs"]["lake_dir"])
    assert dict(zip(conv.conv_id, conv.val)) == {"c1": 99, "c2": 30}
    # d2's tombstone must land in the DOCS lake only
    assert dict(zip(docs.conv_id, docs.txt)) == {"d1": "hello"}
    # no cross-table column leakage
    assert "txt" not in conv.columns and "val" not in docs.columns


def test_multi_resume_is_exactly_once(two_table_cl, tmp_path):
    tables = _tables(tmp_path)
    replay_multi(two_table_cl, tables, num_partitions=4, end_epoch=0)
    res = replay_multi(two_table_cl, tables, num_partitions=4)
    assert [e["epoch"] for e in res["epochs"]] == [1]
    conv = final_table_pandas(tables["conv"]["lake_dir"])
    assert dict(zip(conv.conv_id, conv.val)) == {"c1": 99, "c2": 30}
    assert replay_multi(two_table_cl, tables, num_partitions=4)["epochs"] == []


def test_multi_ddl_routes_to_one_table(two_table_cl, tmp_path):
    # mid-stream add_column on the DOCS table only: conv's schema must not
    # move, docs rows after the DDL carry the new column
    cl = two_table_cl
    _write_epoch(cl, 2, {
        "seq": pa.array([7, 8], pa.int64()),
        "op": pa.array(["DDL", "U"]),
        "table": pa.array(["docs", "docs"]),
        "conv_id": pa.array([None, "d3"], pa.string()),
        "turn_idx": pa.array([None, 0], pa.int32()),
        "txt": pa.array([None, "late"], pa.string()),
        "ts": pa.array([_ts(20), _ts(21)], pa.timestamp("us")),
        "ddl": pa.array([json.dumps({"action": "add_column", "name": "note",
                                     "type": "string"}), None]),
    }, 2)
    tables = _tables(tmp_path)
    replay_multi(cl, tables, num_partitions=4)
    docs = final_table_pandas(tables["docs"]["lake_dir"])
    conv = final_table_pandas(tables["conv"]["lake_dir"])
    assert "note" in docs.columns and "note" not in conv.columns
    assert set(docs.conv_id) == {"d1", "d3"}


def test_unknown_table_rows_are_dropped(two_table_cl, tmp_path):
    _write_epoch(two_table_cl, 2, {
        "seq": pa.array([7], pa.int64()),
        "op": pa.array(["U"]),
        "table": pa.array(["ghost"]),
        "conv_id": pa.array(["g1"]),
        "turn_idx": pa.array([0], pa.int32()),
        "ts": pa.array([_ts(30)], pa.timestamp("us")),
    }, 1)
    tables = _tables(tmp_path)
    res = replay_multi(two_table_cl, tables, num_partitions=4)
    e2 = [e for e in res["epochs"] if e["epoch"] == 2][0]
    assert e2["conv"]["input_rows"] == 0 and e2["docs"]["input_rows"] == 0
