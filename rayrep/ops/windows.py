"""Stream-shaped operators Ray Data lacks natively: session windows and
as-of joins (SURVEY.md §2 "custom operators" clause).

Both follow the engine's one-shuffle discipline: hash-partition by the
entity key, then do the whole windowed computation vectorized inside each
partition (`groupby(part).map_groups` with pandas kernels). The
partitioning assumption — all rows of one key in one group, ordered
in-group by (ts, tiebreak) — is the same one the CDC applier relies on.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _with_part(ds: rd.Dataset, key: str, num_partitions: int) -> rd.Dataset:
    def add(batch: pa.Table) -> pa.Table:
        pid = (batch.column(key).to_numpy() % num_partitions).astype(np.int32)
        return batch.append_column("part_id", pa.array(pid))

    return ds.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)


def sessionize(
    ds: rd.Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    gap: pd.Timedelta = pd.Timedelta(minutes=30),
    tiebreak: str = "event_id",
    num_partitions: int = 16,
) -> rd.Dataset:
    """Session-window aggregation: a new session starts when the gap since
    the key's previous event exceeds ``gap``. Returns one row per key:
    (key, n_sessions, n_events). Vectorized per partition (sort + lag
    diff + cumsum), no per-row Python."""

    def per_part(group: pa.Table) -> pa.Table:
        df = group.select([key, ts_col, tiebreak]).to_pandas()
        df = df.sort_values([key, ts_col, tiebreak], kind="stable")
        prev = df.groupby(key, sort=False)[ts_col].shift(1)
        new_sess = prev.isna() | ((df[ts_col] - prev) > gap)
        out = (
            df.assign(_ns=new_sess.astype("int64"))
            .groupby(key, sort=False)
            .agg(n_sessions=("_ns", "sum"), n_events=("_ns", "size"))
            .reset_index()
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    return _with_part(ds, key, num_partitions).groupby("part_id").map_groups(
        per_part, batch_format="pyarrow"
    )


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_right",
    num_partitions: int = 16,
    right_tiebreak: str | None = None,
) -> rd.Dataset:
    """As-of (backward) join: each left row picks the right row with the
    greatest ``ts <= left.ts`` for the same key; left rows without a match
    are dropped (inner-asof, matching SQL ASOF JOIN). Right rows are
    deduplicated to one per (key, ts) keeping the last occurrence.

    Implementation: tag side, union (ONE shuffle over the hash-partitioned
    key), then ``pd.merge_asof`` per partition. At cluster scale the right
    side per partition must fit a worker's heap — the usual as-of
    assumption (quotes ≪ trades per shard).
    """
    value_cols = value_cols or []

    rt_cols = [key, ts_col] + value_cols + ([right_tiebreak] if right_tiebreak else [])
    # union both sides under ONE schema (nulls for the other side's columns)
    lschema = left.schema()
    lcols = list(lschema.names)
    rschema = right.schema()
    union_fields = [(n, lschema.types[lcols.index(n)]) for n in lcols]
    for n in rt_cols:
        if n not in lcols:
            union_fields.append((n, rschema.types[list(rschema.names).index(n)]))

    def conform(t: pa.Table, side: int) -> pa.Table:
        cols = {}
        for n, typ in union_fields:
            if n in t.column_names:
                cols[n] = t.column(n).cast(typ)
            else:
                cols[n] = pa.nulls(t.num_rows, typ)
        out = pa.table(cols)
        return out.append_column(
            "__side", pa.array(np.full(t.num_rows, side, dtype=np.int8))
        )

    lt = left.map_batches(lambda t: conform(t, 0), batch_format="pyarrow")
    rt = right.map_batches(
        lambda t: conform(t.select(rt_cols), 1), batch_format="pyarrow"
    )
    both = lt.union(rt)

    # columns conform() null-filled into LEFT rows (right-only) — dropped
    # explicitly per partition so every group emits the same schema even
    # when a genuine left column is all-null within one partition
    right_only = [n for n, _ in union_fields if n not in lcols]
    # the output schema is FIXED up front so every partition emits
    # identical blocks (an empty-left group must not change the schema)
    type_of = dict(union_fields)
    out_names = list(lcols) + [
        (vc + suffix) if vc in lcols else vc for vc in value_cols
    ]
    out_schema = pa.schema(
        [(n, type_of[n.removesuffix(suffix)] if n not in type_of else type_of[n])
         for n in out_names]
    )

    def per_part(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        l = df[df["__side"] == 0].drop(columns=["__side"] + right_only)
        r = df[df["__side"] == 1][rt_cols]
        # deterministic dedup: among equal (key, ts) the max-tiebreak row
        # wins (matches the SQL oracle's row_number ... ORDER BY tiebreak DESC)
        sort_cols = [key, ts_col] + ([right_tiebreak] if right_tiebreak else [])
        r = (
            r.sort_values(sort_cols, kind="stable")
            .drop_duplicates([key, ts_col], keep="last")
        )
        if right_tiebreak:
            r = r.drop(columns=[right_tiebreak])
        if not len(l):
            return out_schema.empty_table()
        l = l.sort_values(ts_col, kind="stable")
        # explicit match marker: inner-asof must keep matched rows whose
        # VALUE happens to be NULL (a value-null test would drop them,
        # diverging from SQL ASOF JOIN) and must drop unmatched rows even
        # when value_cols is empty
        r = r.assign(__m=np.int8(1)).sort_values(ts_col, kind="stable")
        merged = pd.merge_asof(
            l, r, on=ts_col, by=key, direction="backward", suffixes=("", suffix)
        )
        merged = merged[merged["__m"].notna()]
        tbl = pa.Table.from_pandas(merged[out_names], preserve_index=False)
        return tbl.cast(out_schema)

    return _with_part(both, key, num_partitions).groupby("part_id").map_groups(
        per_part, batch_format="pyarrow"
    )
