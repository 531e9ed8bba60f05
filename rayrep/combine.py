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
the key's WEAK PREFIX MAXIMA in seq order. Two retention modes:

- ``keep_all_pmax=False`` (state-only consumers, e.g. ``replay_batch``):
  keep ONE row per key — the argmax-(ts, seq), which equals the last weak
  prefix max. Sufficient for final state: the global per-key argmax is
  always its batch's argmax, and if the argmax loses (only possible to the
  prior-state seed) every event of the key loses.
- ``keep_all_pmax=True`` (the engine path with daily-delta output): keep
  EVERY weak prefix max. Required for exact per-(key, day) net images —
  a day's true winner can be an *earlier* prefix max when a cross-batch
  event with higher ts kills the later ones, so the reducer must have all
  candidate payloads to pick the argmax among actual sequential winners.
  (Round 2 kept only the per-(key, day) argmax, which could drop or
  substitute a day image under cross-batch ts inversions — fixed here.)

On the zipf-skewed bench stream the all-pmax mode still collapses
update-heavy epochs substantially: with jittered timestamps the expected
number of prefix maxima per k same-key rows is harmonic (~ln k), not k.
Snapshot epochs are all-unique keys and pass through ~1:1.

Correctness precondition (enforced by the replay driver): every event seq
in the round must be above every partition's committed watermark — always
true for normal forward replay. When a resumed round overlaps a partial
commit the driver disables combining for that round and the applier runs
the full per-event path (rare, same results). Changed-cells mode needs
every partial row's payload, so it never combines.

``combine_combined`` is the optional SECOND level: it re-combines
already-combined rows across source batches (hot keys under zipf skew
appear in many batches), merging their meta lists — the same retention
argument applies because every surviving payload row is a real event.

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
    kid: np.ndarray, ts: np.ndarray, seq: np.ndarray, keep_all_pmax: bool
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Shared collapse plan. Returns (order, retained_pos, list_offsets):
    ``order`` sorts rows by (kid, seq); ``retained_pos`` are positions (in
    sorted space) of the retained payload rows; ``list_offsets`` partitions
    the sorted rows into len(retained_pos) contiguous meta groups, each
    containing exactly its retained row."""
    n = len(kid)
    order = np.lexsort((seq, kid))
    ks, to = kid[order], ts[order]
    seg_first = np.ones(n, dtype=bool)
    seg_first[1:] = ks[1:] != ks[:-1]
    seg_id = (np.cumsum(seg_first) - 1).astype(np.int64)
    pmax = _prefix_max_mask(seg_id, to)
    pm_idx = np.flatnonzero(pmax)
    seg_of = seg_id[pm_idx]
    last_of_seg = np.ones(len(pm_idx), dtype=bool)
    last_of_seg[:-1] = seg_of[1:] != seg_of[:-1]
    if keep_all_pmax:
        retained = pm_idx
        # list j = rows (retained[j-1], retained[j]] within the segment,
        # with the segment tail folded into the segment's last list
        starts = np.zeros(n, dtype=bool)
        starts[np.flatnonzero(seg_first)] = True
        opens = pm_idx[~last_of_seg] + 1
        starts[opens] = True
    else:
        retained = pm_idx[last_of_seg]  # = per-key argmax-(ts, seq)
        starts = seg_first
    offsets = np.append(np.flatnonzero(starts), n)
    return order, retained, offsets


def combine_batch(batch: pa.Table, by_day: bool = False) -> pa.Table:
    """Collapse one augmented batch to retained payload rows + meta lists.
    ``by_day=True`` (the daily-delta engine path) retains every weak
    prefix max so the reducer's per-(key, day) winner selection is exact;
    ``by_day=False`` retains only the per-key argmax."""
    n = batch.num_rows
    if n == 0:
        return combined_schema(batch.schema).empty_table()
    conv = batch.column("conv_id").to_numpy(zero_copy_only=False)
    turn = batch.column("turn_idx").to_numpy().astype(np.int64)
    ts64 = batch.column("ts").cast(pa.int64()).to_numpy()
    seq = batch.column("seq").to_numpy()
    codes, _ = pd.factorize(conv, sort=False)
    kid = (codes.astype(np.int64) << 32) | turn

    order, retained, offsets = _retention(kid, ts64, seq, keep_all_pmax=by_day)
    s = batch.take(pa.array(order))
    out = s.take(pa.array(retained))
    lists = [
        ("m_ts", _arr(s.column("ts").cast(pa.int64()))),
        ("m_seq", _arr(s.column("seq"))),
        ("m_del", _arr(pc.equal(s.column("op"), "D"))),
    ]
    off_arr = pa.array(offsets.astype(np.int32), pa.int32())
    for name, vals in lists:
        out = out.append_column(name, pa.ListArray.from_arrays(off_arr, vals))
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

    order, retained, row_offsets = _retention(kid, ts64, seq, keep_all_pmax)
    if len(retained) == n:  # nothing to merge (all rows distinct keys)
        return batch
    s = batch.take(pa.array(order))
    out = s.take(pa.array(retained)).drop_columns(COMBINE_META)
    # row-space boundaries → element-space offsets over the flattened lists
    lens = pc.list_value_length(_arr(s.column("m_seq"))).to_numpy()
    row_off = np.concatenate(([0], np.cumsum(lens)))
    el_offsets = pa.array(row_off[row_offsets].astype(np.int32), pa.int32())
    for name in COMBINE_META:
        flat = pc.list_flatten(_arr(s.column(name)))
        out = out.append_column(name, pa.ListArray.from_arrays(el_offsets, flat))
    return out
