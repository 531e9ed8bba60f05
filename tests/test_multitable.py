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


def test_multi_equals_per_table_single_replay(tmp_path):
    """Randomized equivalence: an interleaved two-table stream replayed
    through the ONE-shuffle multi path must converge to exactly what the
    ordinary single-table engine produces from each table's own slice —
    deletes, ts ties and key collisions included."""
    import numpy as np

    from rayrep.config import EngineConfig
    from rayrep.pipeline import replay

    rng = np.random.default_rng(1234)
    N = 3000
    tab = np.where(rng.random(N) < 0.5, "a", "b")
    conv = np.char.add("k", rng.integers(0, 40, N).astype("U3"))
    turn = rng.integers(0, 3, N).astype(np.int32)
    op = np.where(rng.random(N) < 0.1, "D", "U")
    val = rng.integers(0, 1000, N)
    txt = np.char.add("t", val.astype("U4"))
    ts_us = rng.integers(0, 50, N) * 1_000_000  # coarse: many ties
    seq = np.arange(1, N + 1, dtype=np.int64)
    epoch = (seq - 1) * 4 // N

    cl = str(tmp_path / "cl_multi")
    cls = {"a": str(tmp_path / "cl_a"), "b": str(tmp_path / "cl_b")}
    for e in range(4):
        m = epoch == e
        n = int(m.sum())
        rows = {
            "seq": pa.array(seq[m]), "op": pa.array(op[m]),
            "table": pa.array(tab[m]), "conv_id": pa.array(conv[m]),
            "turn_idx": pa.array(turn[m], pa.int32()),
            "val": pa.array(np.where(op[m] == "D", None, val[m]),
                            pa.int64(), mask=op[m] == "D"),
            "txt": pa.array(np.where(op[m] == "D", None, txt[m]),
                            pa.string(), mask=op[m] == "D"),
            "ts": pa.array(ts_us[m]).cast(pa.timestamp("us")),
        }
        _write_epoch(cl, e, dict(rows), n)
        for t in ("a", "b"):
            tm = m & (tab == t)
            tn = int(tm.sum())
            trows = {k: pa.array(v.to_pylist(), v.type) for k, v in rows.items()}
            sel = pa.array(tab[m] == t)
            _write_epoch(cls[t], e,
                         {k: v.filter(sel) for k, v in trows.items()}, tn)

    fields = {"a": [pa.field("val", pa.int64())],
              "b": [pa.field("txt", pa.string())]}
    tables = {t: {"lake_dir": str(tmp_path / f"ml_{t}"),
                  "schema_json": _sv(fields[t]).to_json()} for t in ("a", "b")}
    replay_multi(cl, tables, num_partitions=8)

    for t in ("a", "b"):
        single_lake = str(tmp_path / f"sl_{t}")
        replay(EngineConfig(changelog_dir=cls[t], lake_dir=single_lake,
                            num_partitions=8, delta_output=False,
                            initial_schema_json=_sv(fields[t]).to_json()))
        got = final_table_pandas(tables[t]["lake_dir"])
        want = final_table_pandas(single_lake)
        pd_testing_assert(got, want)


def pd_testing_assert(got, want):
    import pandas as pd

    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True))
