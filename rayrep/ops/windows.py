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
        col = batch.column(key)
        if pa.types.is_integer(col.type):
            pid = (col.to_numpy(zero_copy_only=False)
                   % num_partitions).astype(np.int32)
        else:  # string keys: the repo's stable hash (rayrep.hashing)
            from rayrep.hashing import partition_ids

            pid = partition_ids(col, num_partitions)
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
    (key, n_sessions, n_events). Vectorized per partition with the repo's
    standard lexsort + segment-boundary kernels on the Arrow/numpy
    columns (the r3-advised rewrite of a pandas groupby that objectified
    the key column per group)."""
    gap_us = gap // pd.Timedelta(microseconds=1)

    def per_part(group: pa.Table) -> pa.Table:
        k = group.column(key).to_numpy(zero_copy_only=False)
        ts = (group.column(ts_col).to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        tb = group.column(tiebreak).to_numpy(zero_copy_only=False)
        order = np.lexsort((tb, ts, k))
        k_s, ts_s = k[order], ts[order]
        new_key = np.ones(len(k_s), dtype=bool)
        new_key[1:] = k_s[1:] != k_s[:-1]
        gap_hit = np.ones(len(k_s), dtype=bool)
        gap_hit[1:] = (ts_s[1:] - ts_s[:-1]) > gap_us
        new_sess = (new_key | gap_hit).astype(np.int64)
        starts = np.flatnonzero(new_key)
        return pa.table({
            key: pa.array(k_s[starts]),
            "n_sessions": pa.array(np.add.reduceat(new_sess, starts)),
            "n_events": pa.array(np.diff(np.r_[starts, len(k_s)])),
        })

    return _with_part(ds, key, num_partitions).groupby("part_id").map_groups(
        per_part, batch_format="pyarrow"
    )


def range_join_count(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    ts_col: str = "ts",
    window_us: int = 3_600_000_000,
    out_col: str = "n_in_window",
    keep_cols: list[str] | None = None,
    num_partitions: int = 16,
    left_schema: pa.Schema | None = None,
) -> rd.Dataset:
    """Bounded non-equi RANGE join, reduced to a count: for every left
    row, the number of right rows with the same key and
    ``ts in [left.ts - window, left.ts]`` (both ends inclusive — SQL
    BETWEEN). Left rows with no match emit 0 (LEFT JOIN COUNT semantics).

    One hash shuffle by key, then fully vectorized per partition: right
    rows sort by (key, ts) into contiguous segments, each segment's
    timestamps are SHIFTED by ``segment_index * stride`` (stride > span +
    window, so segments cannot collide), and both window bounds for ALL
    left rows resolve with two global ``np.searchsorted`` calls — no
    per-key Python loop. Segments whose shifted range would overflow
    int64 (≳2^62: ~10^5 keys/partition × a decade span in µs) fall back
    to chunked processing of the segment list.
    """
    keep_cols = keep_cols or []
    # Dataset.schema() on a lazy map_batches pipeline EXECUTES a prefix to
    # discover the schema (~1s fixed overhead) — callers that know their
    # schema pass it to skip that probe.
    lschema = left_schema if left_schema is not None else left.schema()
    keep_types = {c: lschema.types[list(lschema.names).index(c)]
                  for c in keep_cols}

    def tag(t: pa.Table, side: int, cols: list[str]) -> pa.Table:
        out = {c: t.column(c) for c in cols}
        n = t.num_rows
        for c in keep_cols:
            if c not in out:
                out[c] = pa.nulls(n, keep_types[c])
        out["__side"] = pa.array(np.full(n, side, dtype=np.int8))
        return pa.table(out)

    lt = left.map_batches(lambda t: tag(t, 0, [key, ts_col] + keep_cols),
                          batch_format="pyarrow")
    rt = right.map_batches(lambda t: tag(t, 1, [key, ts_col]),
                           batch_format="pyarrow")
    both = lt.union(rt)

    def per_part(group: pa.Table) -> pa.Table:
        side = group.column("__side").to_numpy(zero_copy_only=False)
        ts = group.column(ts_col)
        tsv = ts.cast(pa.int64()).to_numpy(zero_copy_only=False) \
            if pa.types.is_timestamp(ts.type) else ts.to_numpy()
        keys = group.column(key).to_numpy()
        li = np.flatnonzero(side == 0)
        ri = np.flatnonzero(side == 1)
        counts = np.zeros(len(li), np.int64)
        if len(ri) and len(li):
            tmin = tsv.min()
            span = int(tsv.max() - tmin)
            stride = span + window_us + 2
            order = np.lexsort((tsv[ri], keys[ri]))
            rk, rts = keys[ri][order], tsv[ri][order].astype(np.int64) - tmin
            uniq_k, seg_start = np.unique(rk, return_index=True)
            seg_len = np.diff(np.append(seg_start, len(rk)))
            seg_of_r = np.repeat(np.arange(len(uniq_k)), seg_len)
            lseg = np.searchsorted(uniq_k, keys[li])
            has = (lseg < len(uniq_k)) & (uniq_k[np.minimum(lseg, len(uniq_k) - 1)]
                                          == keys[li])
            max_chunk = max(int((2 ** 62) // stride), 1)
            for c0 in range(0, len(uniq_k), max_chunk):
                c1 = min(c0 + max_chunk, len(uniq_k))
                rmask = (seg_of_r >= c0) & (seg_of_r < c1)
                shifted_r = (seg_of_r[rmask] - c0) * stride + rts[rmask]
                lmask = has & (lseg >= c0) & (lseg < c1)
                lts = tsv[li][lmask].astype(np.int64) - tmin
                base = (lseg[lmask] - c0) * stride
                lo = np.searchsorted(shifted_r, base + lts - window_us,
                                     side="left")
                hi = np.searchsorted(shifted_r, base + lts, side="right")
                counts[lmask] = hi - lo
        cols = {key: pa.array(keys[li])}
        for c in keep_cols:
            cols[c] = group.column(c).take(pa.array(li))
        cols[out_col] = pa.array(counts)
        return pa.table(cols)

    return _with_part(both, key, num_partitions).groupby("part_id").map_groups(
        per_part, batch_format="pyarrow"
    )


def rolling_mean(
    ds: rd.Dataset,
    key: str,
    ts_col: str = "ts",
    value_col: str = "value",
    n: int = 5,
    tiebreak: str = "event_id",
    out_col: str = "rolling_avg",
    num_partitions: int = 16,
    emit_sum_count: bool = False,
) -> rd.Dataset:
    """Sliding-window aggregate: for every row, the mean of ``value_col``
    over the key's trailing ``n`` rows (ROWS BETWEEN n-1 PRECEDING AND
    CURRENT ROW, ordered by (ts, tiebreak)). One hash shuffle; inside a
    partition ALL keys resolve together — one lexsort, then the trailing
    window accumulates as ``n`` segment-masked shifted adds (oldest row
    first, the same left-to-right order a SQL engine sums a 5-row frame),
    NOT as a cumsum difference: subtracting two long prefixes carries the
    whole prefix's float error (~1e-10 at 10^5 rows) into a 5-term sum
    and flips 3-decimal rounding boundaries cross-engine; direct
    summation keeps the error at machine epsilon of the window sum.
    No per-key Python.

    ``emit_sum_count=True`` emits (``out_col`` = window sum, ``n_window``)
    instead of the mean — the cross-engine-deterministic form: a mean of
    k fixed-decimal values lands exactly on round-half boundaries
    (e.g. mean of four 2-decimal values = multiples of 0.0025), where
    Python's banker's rounding and SQL's half-away-from-zero disagree;
    the window SUM of fixed-decimal inputs never does."""

    def per_part(group: pa.Table) -> pa.Table:
        keys = group.column(key).to_numpy()
        ts = group.column(ts_col)
        tsv = ts.cast(pa.int64()).to_numpy(zero_copy_only=False) \
            if pa.types.is_timestamp(ts.type) else ts.to_numpy()
        tb = group.column(tiebreak).to_numpy()
        val = group.column(value_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((tb, tsv, keys))
        k_s, v_s = keys[order], val[order].astype(np.float64)
        m = len(k_s)
        seg_start = np.ones(m, dtype=bool)
        if m > 1:
            seg_start[1:] = k_s[1:] != k_s[:-1]
        start_pos = np.maximum.accumulate(
            np.where(seg_start, np.arange(m), 0))
        idx = np.arange(m)
        lo = np.maximum(idx - (n - 1), start_pos)
        sums = np.zeros(m, np.float64)
        for j in range(n - 1, -1, -1):  # oldest window row first
            valid = idx - j >= lo
            sums[valid] += v_s[idx[valid] - j]
        counts = idx - lo + 1
        out = np.empty(m, np.float64)
        if emit_sum_count:
            out[order] = sums
            nw = np.empty(m, np.int64)
            nw[order] = counts
            return group.append_column(out_col, pa.array(out)) \
                        .append_column("n_window", pa.array(nw))
        out[order] = sums / counts
        return group.append_column(out_col, pa.array(out))

    return _with_part(ds, key, num_partitions).groupby("part_id").map_groups(
        per_part, batch_format="pyarrow"
    )


def ordered_string_agg(
    ds: rd.Dataset,
    key: str,
    value_col: str,
    ts_col: str = "ts",
    tiebreak: str = "event_id",
    sep: str = ">",
    out_col: str = "journey",
    num_partitions: int = 16,
) -> rd.Dataset:
    """Ordered per-key string concatenation (SQL ``string_agg(v, sep
    ORDER BY ts, tiebreak)``) — the conversation-reconstruction /
    clickstream-path shape: every key's values joined in event order.
    One hash shuffle; inside a partition ALL keys resolve together:
    one lexsort, then ONE ``sep.join`` over the whole partition and
    per-key slicing by cumulative character offsets — O(total chars)
    with no per-key join calls (the only Python loop is one slice per
    OUTPUT row, unavoidable since each output cell is a fresh string).
    Returns (key, out_col, n_events)."""

    def per_part(group: pa.Table) -> pa.Table:
        keys = group.column(key).to_numpy()
        ts = group.column(ts_col)
        tsv = ts.cast(pa.int64()).to_numpy(zero_copy_only=False) \
            if pa.types.is_timestamp(ts.type) else ts.to_numpy()
        tb = group.column(tiebreak).to_numpy()
        vals = group.column(value_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((tb, tsv, keys))
        k_s, v_s = keys[order], vals[order]
        m = len(k_s)
        if m == 0:
            return pa.table({key: pa.array([], group.schema.field(key).type),
                             out_col: pa.array([], pa.string()),
                             "n_events": pa.array([], pa.int64())})
        starts = np.flatnonzero(
            np.concatenate(([True], k_s[1:] != k_s[:-1])))
        ends = np.concatenate((starts[1:], [m]))
        big = sep.join(v_s.tolist())
        lens = pa.compute.utf8_length(
            pa.array(v_s, pa.string())).to_numpy(zero_copy_only=False)
        # char offset where row i's value starts inside `big`
        char_start = np.concatenate(([0], np.cumsum(lens + len(sep))[:-1]))
        char_end = char_start + lens
        out = [big[char_start[s]:char_end[e - 1]]
               for s, e in zip(starts, ends)]
        return pa.table({
            key: pa.array(k_s[starts]),
            out_col: pa.array(out, pa.string()),
            "n_events": pa.array((ends - starts).astype(np.int64)),
        })

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
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
) -> rd.Dataset:
    """As-of (backward) join: each left row picks the right row with the
    greatest ``ts <= left.ts`` for the same key; left rows without a match
    are dropped (inner-asof, matching SQL ASOF JOIN). Right rows are
    deduplicated to one per (key, ts) keeping the last occurrence.

    Implementation: tag side, union (ONE shuffle over the hash-partitioned
    key), then a fully vectorized Arrow/numpy kernel per partition: both
    sides' keys dictionary-encode to shared integer codes, the right side
    lexsorts into per-key segments, each segment's timestamps SHIFT by
    ``segment_index * stride`` (stride > span, so segments cannot
    collide), and every left row's backward match resolves with ONE
    global ``np.searchsorted`` — no per-key Python, no pandas. At cluster
    scale a partition must fit a worker's heap — the usual as-of
    assumption (quotes ≪ trades per shard).
    """
    value_cols = value_cols or []

    rt_cols = [key, ts_col] + value_cols + ([right_tiebreak] if right_tiebreak else [])
    # union both sides under ONE schema (nulls for the other side's columns).
    # Dataset.schema() on a lazy pipeline EXECUTES a prefix to discover the
    # schema (~1s fixed overhead per side) — callers that know their schemas
    # pass them to skip both probes.
    lschema = left_schema if left_schema is not None else left.schema()
    lcols = list(lschema.names)
    rschema = right_schema if right_schema is not None else right.schema()
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
        side = group.column("__side").to_numpy(zero_copy_only=False)
        li = np.flatnonzero(side == 0)
        ri = np.flatnonzero(side == 1)
        if li.size == 0 or ri.size == 0:  # inner-asof: no side, no rows
            return out_schema.empty_table()
        # shared integer key codes for both sides (strings or ints alike)
        kcol = group.column(key).combine_chunks()
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.chunk(0) if kcol.num_chunks else pa.array([], kcol.type)
        kc = kcol.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        tcol = group.column(ts_col)
        tsv = (tcol.cast(pa.int64()) if pa.types.is_timestamp(tcol.type)
               else tcol).to_numpy(zero_copy_only=False).astype(np.int64)
        # deterministic right dedup: among equal (key, ts) the max-tiebreak
        # row wins, original order breaking residual ties (matches the SQL
        # oracle's row_number ... ORDER BY tiebreak DESC) — lexsort is
        # stable, so the run's LAST row is the winner
        if right_tiebreak:
            tb = group.column(right_tiebreak).to_numpy(zero_copy_only=False)
            order = ri[np.lexsort((tb[ri], tsv[ri], kc[ri]))]
        else:
            order = ri[np.lexsort((tsv[ri], kc[ri]))]
        rk_s, rts_s = kc[order], tsv[order]
        last = np.ones(len(order), dtype=bool)
        last[:-1] = (rk_s[1:] != rk_s[:-1]) | (rts_s[1:] != rts_s[:-1])
        rk, rts, ridx = rk_s[last], rts_s[last], order[last]
        # per-key segments over the deduped, sorted right side
        uniq_k, seg_start = np.unique(rk, return_index=True)
        lk, lts = kc[li], tsv[li]
        lseg = np.searchsorted(uniq_k, lk)
        has = (lseg < len(uniq_k)) & (
            uniq_k[np.minimum(lseg, len(uniq_k) - 1)] == lk)
        tmin = tsv.min()
        stride = int(tsv.max() - tmin) + 2
        pos = np.full(len(li), -1, np.int64)
        max_chunk = max(int((2 ** 62) // stride), 1)
        for c0 in range(0, len(uniq_k), max_chunk):
            c1 = min(c0 + max_chunk, len(uniq_k))
            rmask = (rk >= uniq_k[c0]) & (rk <= uniq_k[c1 - 1])
            seg_of_r = np.searchsorted(uniq_k, rk[rmask])
            shifted_r = (seg_of_r - c0) * stride + (rts[rmask] - tmin)
            lmask = has & (lseg >= c0) & (lseg < c1)
            p = np.searchsorted(
                shifted_r,
                (lseg[lmask] - c0) * stride + (lts[lmask] - tmin),
                side="right") - 1
            # map back into the deduped-right index space; p == -1 or a
            # previous segment's slot means "no right ts <= left ts"
            base = np.flatnonzero(rmask)[0] if rmask.any() else 0
            pos[lmask] = np.where(p >= 0, p + base, -1)
        matched = has & (pos >= 0) & (pos >= seg_start[np.minimum(
            lseg, len(uniq_k) - 1)])
        if not matched.any():
            return out_schema.empty_table()
        lsel = pa.array(li[matched])
        out = group.select(lcols).take(lsel)
        chosen = pa.array(ridx[pos[matched]])
        for vc in value_cols:
            name = (vc + suffix) if vc in lcols else vc
            out = out.append_column(name, group.column(vc).take(chosen))
        return out.select(out_names).cast(out_schema)

    return _with_part(both, key, num_partitions).groupby("part_id").map_groups(
        per_part, batch_format="pyarrow"
    )


def tumbling_window_agg(
    ds: rd.Dataset,
    key: str = "user_id",
    id_col: str = "event_id",
    ts_col: str = "ts",
    value_col: str = "value",
    width_us: int = 3_600_000_000,
    lateness_us: int = 600_000_000,
    backdate_mod: int = 0,
    backdate_step_us: int = 0,
    chunk: int = 8192,
) -> rd.Dataset:
    """Event-time TUMBLING windows with watermark late-data drops — the
    streaming-aggregation contract Ray Data has no native operator for.

    Semantics (deterministic, SQL-replayable): the watermark before each
    event is the PREFIX MAX of event-time over arrival order (``id_col``);
    an event is DROPPED iff its window had already closed past the
    allowed lateness when it arrived — ``wm_before > window_start +
    width + lateness`` — exactly the rule a streaming engine applies when
    it finalizes a window at ``watermark > end + lateness``. Survivors
    aggregate per (key, window_start): count + exact fixed-point value
    sum (``floor(value·10⁴)`` int64, the repo's standard no-float-sum
    discipline).

    ``backdate_mod``/``backdate_step_us`` synthesize deterministic
    event-time disorder (``event_time = ts − (id % mod)·step``) for
    fixtures whose arrival order is already time-ordered, as real binlog
    streams mostly are — the SQL oracle applies the same arithmetic, so
    the drop path itself is hash-pinned.

    Distributed shape (the ``pack_sequences_ds`` prefix pattern): a
    skinny map drops all payload columns (4×int64/row), per-part maxima
    reduce through a tiny groupby, the driver scans the P-row part table
    into exclusive prefix maxima and broadcasts it once; each part then
    computes its local watermarks vectorized and emits per-(key, window)
    partials, merged by one final small groupby. The corpus never lands
    on the driver; the only serial artifact is the P-row scan."""
    import ray
    from ray.data.aggregate import Max, Sum

    def skinny(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy()
        et = (t.column(ts_col).to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        if backdate_mod:
            et = et - (ids % backdate_mod) * backdate_step_us
        v = t.column(value_col).to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array(ids),
            "et": pa.array(et),
            key: t.column(key),
            "v_fp": pa.array(np.floor(v * 10_000).astype(np.int64)),
            "part_id": pa.array((ids // chunk).astype(np.int64)),
        })

    sk = ds.map_batches(skinny, batch_format="pyarrow", zero_copy_batch=True)
    parts = (
        sk.select_columns(["part_id", "et"])
        .groupby("part_id").aggregate(Max("et", alias_name="m"))
        .to_pandas().sort_values("part_id")
    )
    pids = parts["part_id"].to_numpy(np.int64)
    pmax = parts["m"].to_numpy(np.int64)
    # exclusive prefix max: watermark entering part i = max of parts < i
    incoming = np.empty(len(pmax), np.int64)
    incoming[0] = np.iinfo(np.int64).min
    np.maximum.accumulate(pmax[:-1], out=incoming[1:]) if len(pmax) > 1 else None
    offs_ref = ray.put((pids, incoming))

    def per_part(group: pa.Table) -> pa.Table:
        gpids, ginc = ray.get(offs_ref)
        ids = group.column(id_col).to_numpy()
        et = group.column("et").to_numpy()
        k = group.column(key).to_numpy(zero_copy_only=False)
        v = group.column("v_fp").to_numpy()
        order = np.argsort(ids, kind="stable")
        et_s = et[order]
        wm = np.empty(len(et_s), np.int64)
        part = int(group.column("part_id")[0].as_py())
        wm[0] = ginc[np.searchsorted(gpids, part)]
        if len(et_s) > 1:
            np.maximum.accumulate(et_s[:-1], out=wm[1:])
            np.maximum(wm[1:], wm[0], out=wm[1:])
        ws = (et_s // width_us) * width_us
        keep = wm <= ws + width_us + lateness_us
        k_s, v_s = k[order][keep], v[order][keep]
        ws = ws[keep]
        if not len(ws):  # every event in this part arrived too late
            return pa.table({
                key: pa.array([], group.schema.field(key).type),
                "window_start": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "value_fp": pa.array([], pa.int64()),
            })
        gkey = np.lexsort((ws, k_s))
        k_g, ws_g, v_g = k_s[gkey], ws[gkey], v_s[gkey]
        bounds = np.flatnonzero(
            np.r_[True, (k_g[1:] != k_g[:-1]) | (ws_g[1:] != ws_g[:-1])])
        return pa.table({
            key: pa.array(k_g[bounds]),
            "window_start": pa.array(ws_g[bounds]),
            "n_events": pa.array(np.diff(np.r_[bounds, len(k_g)])),
            "value_fp": pa.array(np.add.reduceat(v_g, bounds)
                                 if len(v_g) else np.array([], np.int64)),
        })

    return (
        sk.groupby("part_id").map_groups(per_part, batch_format="pyarrow")
        .groupby([key, "window_start"])
        .aggregate(Sum("n_events", alias_name="n_events"),
                   Sum("value_fp", alias_name="value_fp"))
    )


def hopping_window_agg(
    ds: rd.Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    width_us: int = 3_600_000_000,
    hop_us: int = 1_800_000_000,
) -> rd.Dataset:
    """HOPPING (sliding) event-time windows: window starts are multiples
    of ``hop``; each event lands in ``width/hop`` overlapping windows.
    The fan-out happens vectorized inside ``map_batches`` (np.repeat —
    rows × width/hop, still skinny: 3 int64 columns), then one grouped
    Sum; exact fixed-point value sums as everywhere in this repo."""
    from ray.data.aggregate import Sum

    if width_us % hop_us:
        raise ValueError("width_us must be a multiple of hop_us")
    m = width_us // hop_us

    def fan(t: pa.Table) -> pa.Table:
        et = (t.column(ts_col).to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        k = t.column(key).to_numpy(zero_copy_only=False)
        v = np.floor(t.column(value_col).to_numpy(zero_copy_only=False)
                     * 10_000).astype(np.int64)
        base = (et // hop_us) * hop_us
        ks = np.repeat(np.arange(m, dtype=np.int64), len(et))
        ws = np.tile(base, m) - ks * hop_us
        keep = ws >= 0  # windows that would start before the epoch floor
        return pa.table({
            key: pa.array(np.tile(k, m)[keep]),
            "window_start": pa.array(ws[keep]),
            "one": pa.array(np.ones(int(keep.sum()), np.int64)),
            "v_fp": pa.array(np.tile(v, m)[keep]),
        })

    return (
        ds.map_batches(fan, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([key, "window_start"])
        .aggregate(Sum("one", alias_name="n_events"),
                   Sum("v_fp", alias_name="value_fp"))
    )
