"""Pure-Python replay oracle (FIXTURES.md §3).

Replays changelog events one at a time in ``seq`` order — the trivially
correct sequential semantics the vectorized engine must match: LWW by
``(ts, seq)`` with tombstones, delete = drop payload, DDL extends the row
template. Also produces the expected counters (applied / skipped=0 /
conflict / deleted) that the engine's manifests must reconcile to
(reference analog: metrics-gated checkpoints, CHANGES.txt:113-116).
"""

from __future__ import annotations

import json

import pandas as pd
import pyarrow as pa

# Python-value analogs of the Arrow casts used by alter_type chains in
# tests (lossless transitions only: int widenings + int→string; str(int)
# matches Arrow's integer→utf8 cast exactly)
_PY_CAST = {"string": str, "int32": int, "int64": int, "float64": float}


def replay_oracle(
    changelog: pa.Table,
    as_of_ts_us: int | None = None,
    changed_cells: bool = False,
    base_cols: list[str] | None = None,
):
    cols_template = (list(base_cols) if base_cols
                     else ["conv_id", "turn_idx", "role", "text", "ts"])
    # pa.Table or a pandas frame (object-dtype frames preserve the exact
    # Python values the typed-DDL fuzz needs for sequential-cast replay)
    df = changelog.to_pandas() if isinstance(changelog, pa.Table) else changelog
    df = df.sort_values("seq", kind="stable")
    state: dict[tuple, tuple] = {}  # key -> (ts_us, seq, row_dict | None)
    ctr = {"input_rows": 0, "applied": 0, "skipped": 0, "conflict": 0, "deleted": 0}

    for rec in df.itertuples(index=False):
        ts_us = rec.ts.value // 1000 if hasattr(rec.ts, "value") else int(rec.ts)
        if as_of_ts_us is not None and ts_us > as_of_ts_us:
            continue
        if rec.op == "DDL":
            ddl = json.loads(rec.ddl)
            if ddl["action"] == "add_column":
                cols_template.append(ddl["name"])
            elif ddl["action"] == "rename_column":
                cols_template = [ddl["to"] if c == ddl["from"] else c for c in cols_template]
                # MySQL RENAME COLUMN preserves data: rows written before
                # the rename keep their value under the new name (the
                # engine rename-maps old files at fold; the oracle must
                # migrate its stored state keys the same way)
                for key, (t, s, row) in state.items():
                    if row is not None and ddl["from"] in row:
                        row[ddl["to"]] = row.pop(ddl["from"])
            elif ddl["action"] == "drop_column":
                cols_template = [c for c in cols_template if c != ddl["name"]]
                # MySQL DROP COLUMN discards data: a later re-add of the
                # same name must see NULLs, not resurrected values
                for key, (t, s, row) in state.items():
                    if row is not None:
                        row.pop(ddl["name"], None)
            elif ddl["action"] == "alter_type":
                # MySQL MODIFY converts existing data at the ALTER —
                # sequential cast semantics (from the CURRENT type)
                conv = _PY_CAST[ddl["type"]]
                for key, (t, s, row) in state.items():
                    if row is not None and row.get(ddl["name"]) is not None:
                        row[ddl["name"]] = conv(row[ddl["name"]])
            continue
        ctr["input_rows"] += 1
        key = (rec.conv_id, int(rec.turn_idx))
        prev = state.get(key)
        if prev is not None and ts_us < prev[0]:
            ctr["conflict"] += 1
            continue
        ctr["applied"] += 1
        if rec.op == "D":
            ctr["deleted"] += 1
            state[key] = (ts_us, int(rec.seq), None)
        else:
            row = {}
            for c in cols_template:
                v = getattr(rec, c, None)
                row[c] = None if (isinstance(v, float) and pd.isna(v)) or v is pd.NaT else v
            row["conv_id"], row["turn_idx"], row["ts"] = key[0], key[1], ts_us
            if changed_cells and prev is not None and prev[2] is not None:
                merged = dict(prev[2])
                for c, v in row.items():
                    if v is not None:
                        merged[c] = v
                merged["ts"] = ts_us
                row = merged
            state[key] = (ts_us, int(rec.seq), row)

    rows = [v[2] for v in state.values() if v[2] is not None]
    out = pd.DataFrame(rows, columns=cols_template)
    if len(out):
        out["ts"] = pd.to_datetime(out["ts"], unit="us")
        out = out.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)
        out["turn_idx"] = out["turn_idx"].astype("int32")
    return out, ctr
