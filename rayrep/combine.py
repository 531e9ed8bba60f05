"""Map-side LWW pre-combining — shrink the one hash shuffle.

The sort exchange is the replay's scaling wall on a fixed memory-bandwidth
budget (BENCH/BASELINE.md per-stage breakdown), so the lever is shipping
fewer rows/bytes through it. Before the shuffle, each augmented batch is
collapsed to ONE full payload row per (conv_id, turn_idx[, utc-day])
group — the batch-local argmax-(ts, seq) winner, which is provably the
only row whose payload can still win the global LWW — plus three compact
list columns (``m_ts``, ``m_seq``, ``m_del``) carrying every event's
(ts, seq, is-delete) triple so the reducer reproduces EXACT sequential
counters (applied / conflict / deleted identical to a one-event-at-a-time
replay; the metrics-gated checkpoint invariant, CHANGES.txt:113-116,
still reconciles to the row).

Why the batch winner's payload suffices: the global final state per key
is the argmax-(ts, seq) event; the argmax over all events equals the
argmax over per-batch argmaxes, and any batch-local loser is a global
loser (the running per-key max only grows with more context). On the
zipf-skewed bench stream this cuts shuffled rows ~2.5x and bytes ~1.6x
in the update-heavy epochs (measured; snapshot epochs are all-unique keys
and pass through ~1:1).

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


def combine_batch(batch: pa.Table, by_day: bool = False) -> pa.Table:
    """Collapse one augmented batch to per-(key[, day]) winner rows + meta
    lists. ``by_day`` groups per UTC day as well, so the daily-delta side
    output can still emit one net change row per (key, day)."""
    n = batch.num_rows
    if n == 0:
        return combined_schema(batch.schema).empty_table()
    conv = batch.column("conv_id").to_numpy(zero_copy_only=False)
    turn = batch.column("turn_idx").to_numpy().astype(np.int64)
    ts64 = batch.column("ts").cast(pa.int64()).to_numpy()
    seq = batch.column("seq").to_numpy()
    codes, _ = pd.factorize(conv, sort=False)
    kid = (codes.astype(np.int64) << 32) | turn
    if by_day:
        day = ts64 // DAY_US
        order = np.lexsort((seq, ts64, day, kid))
    else:
        order = np.lexsort((seq, ts64, kid))
    kid_s = kid[order]
    first = np.ones(n, dtype=bool)
    if by_day:
        day_s = day[order]
        first[1:] = (kid_s[1:] != kid_s[:-1]) | (day_s[1:] != day_s[:-1])
    else:
        first[1:] = kid_s[1:] != kid_s[:-1]
    starts = np.flatnonzero(first)
    offsets = np.append(starts, n).astype(np.int32)
    winner_pos = offsets[1:] - 1  # last row of each group = argmax (ts, seq)

    s = batch.take(pa.array(order))
    out = s.take(pa.array(winner_pos))
    lists = [
        ("m_ts", _arr(s.column("ts").cast(pa.int64()))),
        ("m_seq", _arr(s.column("seq"))),
        ("m_del", _arr(pc.equal(s.column("op"), "D"))),
    ]
    off_arr = pa.array(offsets, pa.int32())
    for name, vals in lists:
        out = out.append_column(name, pa.ListArray.from_arrays(off_arr, vals))
    return out
