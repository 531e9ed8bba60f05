"""Map-side LWW pre-combining — shrink the one hash shuffle.

The sort exchange is the replay's scaling wall on a fixed memory-bandwidth
budget (BENCH/BASELINE.md per-stage breakdown), so the lever is shipping
fewer rows/bytes through it. Before the shuffle, each augmented batch is
collapsed to the per-key WEAK PREFIX-MAX payload rows (see below) plus
three compact list columns (``m_ts``, ``m_seq``, ``m_del``) carrying every
event's (ts, seq, is-delete) triple so the reducer reproduces EXACT
sequential counters (applied / conflict / deleted identical to a
one-event-at-a-time replay; the metrics-gated checkpoint invariant,
CHANGES.txt:113-116, still reconciles to the row).

Retention rule — which payload rows must survive the collapse:

An event can only win the sequential LWW fold if its ts is >= every
earlier same-key event's ts *in this batch* (the per-key running max only
grows as more context — other batches, prior state — is added, so a row
dominated inside its own batch is dominated everywhere). Those rows are
the key's WEAK PREFIX MAXIMA in seq order.

``combine_batch`` (level 1) retains ONE row per group — the
argmax-(ts, seq), which equals the group's last weak prefix max; groups
are (key) or, with ``by_day`` (the daily-delta engine path), (key, day).
This is EXACT — for state, counters, AND the per-(key, day) day images —
under the level-1 precondition that each batch is a CONTIGUOUS seq range
(true by construction: batches come from in-order parquet blocks of one
epoch slice). Proof sketch: external events' seqs all fall before or
after the range, so every in-batch event faces the same external
running-max threshold S at the range start; the winners among a group's
prefix maxima (ascending in ts) are exactly those with ts >= S — a
SUFFIX — so the day's winner-argmax is the group argmax or nothing.

``combine_combined`` (level 2) re-combines already-combined rows across
source batches (hot keys under zipf skew appear in many batches),
merging their meta lists. Its input is a union of DISJOINT ranges, not
one contiguous range, so with ``keep_all_pmax=True`` it retains EVERY
weak prefix max among its payload rows — an external event *can* fall
between two ranges and kill the later range's argmax, leaving an earlier
prefix max as the true day winner. Rows are already ~1 per (key, day)
per source range here, so the extra retention is bounded by genuine
cross-range ts inversions (rare in forward-mostly CDC streams). The
composition is exact: any globally-winning event is its range's group
argmax (level 1) and survives level 2's prefix-max filter. State-only
consumers pass ``keep_all_pmax=False`` for the tighter per-key argmax.

Correctness precondition (enforced by the replay driver): every event seq
in the round must be above every partition's committed watermark — always
true for normal forward replay. When a resumed round overlaps a partial
commit the driver disables combining for that round and the applier runs
the full per-event path (rare, same results). Changed-cells mode needs
every partial row's payload, so it never combines.

Reference analog: the replicator moved work map-side when augmentation
was the CPU bottleneck (parallelized mutations generator,
CHANGES.txt:97-98); the combine additionally absorbs the per-version
collapse that HBase's write path pays per cell version (README.md:18).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

COMBINE_META = ["m_ts", "m_seq", "m_del"]
DAY_US = 86_400_000_000


def _arr(col) -> pa.Array:
    """ChunkedArray | Array → contiguous Array."""
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks() if col.num_chunks == 1 else pa.concat_arrays(col.chunks)
    return col


def combined_schema(augmented: pa.Schema) -> pa.Schema:
    fields = list(augmented)
    fields += [
        pa.field("m_ts", pa.list_(pa.int64())),
        pa.field("m_seq", pa.list_(pa.int64())),
        pa.field("m_del", pa.list_(pa.bool_())),
    ]
    return pa.schema(fields)


def _prefix_max_mask(seg_id: np.ndarray, ts: np.ndarray) -> np.ndarray:
    """Weak prefix-max mask over rows ALREADY sorted by (seg_id, seq):
    True where ts >= every earlier ts in the same segment. Fast path is the
    same compressed running-max trick as apply._sequential_win; pandas
    grouped cummax fallback when seg_count × ts_range would overflow."""
    n = len(ts)
    if n == 0:
        return np.zeros(0, dtype=bool)
    tmin = int(ts.min())
    R = int(ts.max()) - tmin + 2
    nseg = int(seg_id[-1]) + 1
    if nseg * R < 2**62:
        comp = seg_id * np.int64(R) + (ts - tmin + 1)
        return comp >= np.maximum.accumulate(comp)
    cm = pd.Series(ts).groupby(pd.Series(seg_id)).cummax().to_numpy()
    return ts >= cm


def _retention(
    order: np.ndarray,
    seg_first: np.ndarray,
    ts_sorted: np.ndarray,
    keep_all_pmax: bool,
) -> tuple[np.ndarray, np.ndarray]:
    """Shared collapse plan over rows ALREADY sorted (``order``) with group
    boundaries ``seg_first`` (groups must be seq-ascending internally).
    Returns (retained_pos, list_offsets): positions (in sorted space) of
    the retained payload rows, and offsets partitioning the sorted rows
    into len(retained_pos) contiguous meta groups, each containing exactly
    its retained row."""
    n = len(order)
    seg_id = (np.cumsum(seg_first) - 1).astype(np.int64)
    pmax = _prefix_max_mask(seg_id, ts_sorted)
    pm_idx = np.flatnonzero(pmax)
    seg_of = seg_id[pm_idx]
    last_of_seg = np.ones(len(pm_idx), dtype=bool)
    last_of_seg[:-1] = seg_of[1:] != seg_of[:-1]
    if keep_all_pmax:
        retained = pm_idx
        # list j = rows (retained[j-1], retained[j]] within the segment,
        # with the segment tail folded into the segment's last list
        starts = seg_first.copy()
        starts[pm_idx[~last_of_seg] + 1] = True
    else:
        retained = pm_idx[last_of_seg]  # = per-group argmax-(ts, seq)
        starts = seg_first
    offsets = np.append(np.flatnonzero(starts), n)
    return retained, offsets


def combine_batch(batch: pa.Table, by_day: bool = False) -> pa.Table:
    """Collapse one augmented batch (a CONTIGUOUS seq range — see module
    docstring) to one argmax-(ts, seq) payload row per (key[, utc-day])
    group + meta lists covering every event."""
    n = batch.num_rows
    if n == 0:
        return combined_schema(batch.schema).empty_table()
    conv = batch.column("conv_id").to_numpy(zero_copy_only=False)
    turn = batch.column("turn_idx").to_numpy().astype(np.int64)
    ts64 = batch.column("ts").cast(pa.int64()).to_numpy()
    seq = batch.column("seq").to_numpy()
    codes, _ = pd.factorize(conv, sort=False)
    kid = (codes.astype(np.int64) << 32) | turn
    # part_id outermost: each key lives in exactly ONE partition, so adding
    # it never splits a key's segment — and the output comes out
    # part_id-contiguous. The sort exchange then permutes ALREADY-SORTED
    # blocks (sequential memcpy instead of a random full-column gather per
    # block — measured ~1.2M → ~1.7M ev/s replay ceiling at 32 cpus), and
    # the packed exchange can slice blobs without a second gather
    # (exchange.pack_batch fast path).
    pid = batch.column("part_id").to_numpy()

    if by_day:
        day = ts64 // DAY_US
        order = np.lexsort((seq, day, kid, pid))
        ks, ds_ = kid[order], day[order]
        seg_first = np.ones(n, dtype=bool)
        seg_first[1:] = (ks[1:] != ks[:-1]) | (ds_[1:] != ds_[:-1])
    else:
        order = np.lexsort((seq, kid, pid))
        ks = kid[order]
        seg_first = np.ones(n, dtype=bool)
        seg_first[1:] = ks[1:] != ks[:-1]
    retained, offsets = _retention(order, seg_first, ts64[order],
                                   keep_all_pmax=False)
    s = batch.take(pa.array(order))
    out = s.take(pa.array(retained))
    # the retained row's own (ts, seq, del) triple is EXCLUDED from its
    # meta list — the reducer reconstructs it from the payload columns.
    # Singleton groups (all of a snapshot epoch) then ship three EMPTY
    # lists (offsets only) instead of ~17 duplicated bytes per row.
    keep = np.ones(n, dtype=bool)
    keep[retained] = False
    # list j contains exactly one retained row, and exactly j retained
    # rows precede list j — offsets shift down by their index
    off_arr = pa.array((offsets - np.arange(len(offsets))).astype(np.int32),
                       pa.int32())
    lists = [
        ("m_ts", _arr(s.column("ts").cast(pa.int64()))),
        ("m_seq", _arr(s.column("seq"))),
        ("m_del", _arr(pc.equal(s.column("op"), "D"))),
    ]
    keep_arr = pa.array(keep)
    for name, vals in lists:
        out = out.append_column(
            name, pa.ListArray.from_arrays(off_arr, vals.filter(keep_arr))
        )
    return out


def combine_combined(batch: pa.Table, keep_all_pmax: bool = True) -> pa.Table:
    """Second-level combine: merge ALREADY-COMBINED rows across source
    batches (zipf hot keys appear in many batches, so their per-batch
    winners duplicate through the shuffle). A payload row dominated by an
    earlier same-key payload row with greater ts is a real dominated event
    and can never win; its meta list is folded into the survivor's group.
    Counters are preserved exactly (meta elements are only re-grouped)."""
    n = batch.num_rows
    if n <= 1:
        return batch
    conv = batch.column("conv_id").to_numpy(zero_copy_only=False)
    turn = batch.column("turn_idx").to_numpy().astype(np.int64)
    ts64 = batch.column("ts").cast(pa.int64()).to_numpy()
    seq = batch.column("seq").to_numpy()
    codes, _ = pd.factorize(conv, sort=False)
    kid = (codes.astype(np.int64) << 32) | turn

    order = np.lexsort((seq, kid, batch.column("part_id").to_numpy()))
    ks = kid[order]
    seg_first = np.ones(n, dtype=bool)
    seg_first[1:] = ks[1:] != ks[:-1]
    retained, row_offsets = _retention(order, seg_first, ts64[order],
                                       keep_all_pmax)
    if len(retained) == n:  # nothing to merge (all rows distinct keys)
        return batch
    s = batch.take(pa.array(order))
    out = s.take(pa.array(retained)).drop_columns(COMBINE_META)
    # Meta lists exclude their payload row's own triple (combine_batch
    # contract). A payload row DROPPED here stops being payload, so its
    # own triple must be spliced into the surviving merged list; retained
    # rows stay excluded. Build per-row element blocks = [list elements,
    # own triple if dropped], then cut at the retention boundaries.
    lens = pc.list_value_length(_arr(s.column("m_seq"))).to_numpy().astype(np.int64)
    dropped = np.ones(n, dtype=bool)
    dropped[retained] = False
    block_len = lens + dropped
    off2 = np.concatenate(([0], np.cumsum(block_len)))
    flat_start = np.concatenate(([0], np.cumsum(lens)[:-1]))
    pos_list = np.repeat(off2[:-1], lens) + (
        np.arange(int(lens.sum())) - np.repeat(flat_start, lens)
    )
    pos_own = off2[:-1][dropped] + lens[dropped]
    own = {
        "m_ts": s.column("ts").cast(pa.int64()).to_numpy(),
        "m_seq": s.column("seq").to_numpy(),
        "m_del": pc.equal(s.column("op"), "D").to_numpy(zero_copy_only=False),
    }
    el_offsets = pa.array(off2[row_offsets].astype(np.int32), pa.int32())
    total = int(off2[-1])
    for name in COMBINE_META:
        flat = pc.list_flatten(_arr(s.column(name))).to_numpy(zero_copy_only=False)
        vals = np.empty(total, dtype=own[name].dtype)
        vals[pos_list] = flat
        vals[pos_own] = own[name][dropped]
        out = out.append_column(
            name, pa.ListArray.from_arrays(el_offsets, pa.array(vals))
        )
    return out
