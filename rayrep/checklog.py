"""Changelog integrity checker: audit a published changelog BEFORE (or
while) replaying it, without mutating anything.

Reference analog: the reference ships a standalone validator service
that continuously samples the source and the replicated store and flags
divergence (README.md:19-20); upstream of that sits the binlog supplier
contract — events arrive exactly once, in order, with no holes
(CHANGES.txt:66-69 fail-fast on supplier exceptions). ``rayrep``'s
changelog carries that contract explicitly: ``seq`` is strictly
increasing and DENSE across the whole log, epochs partition the log
into contiguous ``seq`` ranges, and epoch directories are numbered
densely from 0 (``gen.py:13-18``, ``gen.publish_epoch``). A producer
bug, a lost part file, or a half-replicated object-store transfer
breaks one of those invariants long before it breaks the lake — this
module is the cheap audit that catches it at the source.

Checks (exact, one streaming pass over ``seq``-level columns only):

- **epoch numbering** — directories dense from ``expect_start_epoch``;
- **per-epoch density** — the epoch's seq multiset equals the
  contiguous range ``[min_seq, max_seq]``: row count must match the
  range size AND the wrapped-sum of a 64-bit multiplicative hash of the
  seqs must equal the same sum over the range. Count+min/max alone
  cannot see a duplicate-paired-with-a-gap; the hash-sum does (a
  collision needs the multiset difference to hash-sum to exactly 0 mod
  2^64 — vanishingly unlikely for non-adversarial corruption). This is
  the same mul-mod hash family the sketch oracles replay in SQL
  (``ops/sketch.py``), so the verdict itself is SQL-oracleable;
- **epoch chaining** — epoch e's ``min_seq`` == epoch e-1's
  ``max_seq`` + 1 (epochs are contiguous slices of the log);
- **row hygiene** — ``op`` within {I,U,D,DDL}; non-DDL rows carry a
  non-null routing key (``conv_id``, ``turn_idx``) — a null key would
  route non-portably (ADVICE r3) so it must be caught here.

Scale shape: ``read_parquet(columns=[seq, op, conv_id, turn_idx],
include_paths)`` prunes the read to ~16 B/row regardless of payload
width; per-batch partials are one tiny row per (batch × epoch); the
driver reduces O(batches) summary rows, never event-sized data. The
expected-range hash-sums run as one Ray task per epoch (chunked
``arange``, bounded memory), in parallel across epochs.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from rayrep.ops.sketch import KMV_MULT
from rayrep.pipeline import EPOCH_RE, discover_epochs

_OPS = np.array(["D", "DDL", "I", "U"])  # sorted, for searchsorted membership
_CHUNK = 1 << 22  # 4M seqs per arange chunk in the expected-hash task


def _hashsum(seqs: np.ndarray) -> np.uint64:
    """Wrapped mod-2^64 sum of the KMV multiplicative hash over seqs."""
    u = seqs.astype(np.uint64, copy=False) * KMV_MULT
    return np.sum(u, dtype=np.uint64)


@ray.remote
def _range_hashsum(lo: int, hi: int) -> int:
    """Expected hash-sum of the contiguous range [lo, hi], chunked so the
    task's memory stays bounded at any epoch size. Returned as the int64
    two's-complement view (Arrow/SQL friendly)."""
    total = np.uint64(0)
    x = lo
    while x <= hi:
        end = min(x + _CHUNK, hi + 1)
        total += _hashsum(np.arange(x, end, dtype=np.int64))
        x = end
    return int(np.int64(total))


def _stats_batch(batch: pa.Table) -> pa.Table:
    """Per-batch partial: one summary row per epoch present in the batch."""
    paths = batch.column("path").to_numpy(zero_copy_only=False)
    upaths, codes = np.unique(paths, return_inverse=True)
    epoch_of = np.empty(len(upaths), dtype=np.int64)
    for i, p in enumerate(upaths):  # O(files-in-batch), not O(rows)
        sp = str(p)
        # single-file epoch (epoch-NNNNN.parquet) matches directly; a part
        # file inside an epoch DIR (epoch-NNNNN/part-*.parquet) matches on
        # its parent directory
        parent = sp.rsplit("/", 1)[0]
        # a compacted span dir (epoch-FFFFF-cLLLLL, rayrep/logcompact.py)
        # reports under its END epoch number, like discover_epochs
        from rayrep.pipeline import SPAN_RE

        m2 = SPAN_RE.search(parent)
        if m2:
            epoch_of[i] = int(m2.group(2))
            continue
        m = EPOCH_RE.search(sp) or EPOCH_RE.search(parent)
        epoch_of[i] = int(m.group(1)) if m else -1
    ep = epoch_of[codes]

    seq_nulls = np.asarray(pa.compute.is_null(batch.column("seq")))
    seq = batch.column("seq").to_numpy(zero_copy_only=False)
    if seq_nulls.any():
        # a null seq is itself a contract violation (reported per epoch
        # below) — exclude it from the min/max/hash arithmetic instead of
        # crashing the audit on NaN
        seq = np.where(seq_nulls, np.int64(0), seq).astype(np.int64)
    else:
        seq = seq.astype(np.int64, copy=False)
    op = batch.column("op").to_numpy(zero_copy_only=False).astype("U4")
    is_ddl = op == "DDL"
    bad_op = _OPS[np.clip(np.searchsorted(_OPS, op), 0, len(_OPS) - 1)] != op
    conv_null = np.asarray(pa.compute.is_null(batch.column("conv_id")))
    turn_null = np.asarray(pa.compute.is_null(batch.column("turn_idx")))
    null_key = ~is_ddl & (conv_null | turn_null)

    order = np.argsort(ep, kind="stable")
    ep_s, seq_s = ep[order], seq[order]
    starts = np.flatnonzero(np.r_[True, ep_s[1:] != ep_s[:-1]])
    ends = np.r_[starts[1:], len(ep_s)]
    rows = {"epoch": [], "n": [], "min_seq": [], "max_seq": [],
            "hashsum": [], "bad_op": [], "null_key": [], "n_ddl": [],
            "null_seq": []}
    for s, e in zip(starts, ends):
        sl = slice(s, e)
        seg_mask = order[sl]
        rows["epoch"].append(int(ep_s[s]))
        rows["n"].append(int(e - s))
        rows["min_seq"].append(int(seq_s[sl].min()))
        rows["max_seq"].append(int(seq_s[sl].max()))
        rows["hashsum"].append(int(np.int64(_hashsum(seq_s[sl]))))
        rows["bad_op"].append(int(bad_op[seg_mask].sum()))
        rows["null_key"].append(int(null_key[seg_mask].sum()))
        rows["n_ddl"].append(int(is_ddl[seg_mask].sum()))
        rows["null_seq"].append(int(seq_nulls[seg_mask].sum()))
    return pa.table({k: pa.array(v, pa.int64()) for k, v in rows.items()})


def check_changelog(changelog_dir: str, expect_start_epoch: int | None = None,
                    expect_start_seq: int | None = 0) -> dict:
    """Audit ``changelog_dir``; returns a report dict (mutates nothing).

    ``expect_start_epoch`` defaults to the log's trim floor
    (``retention.trim_changelog`` marker; 0 for an untrimmed log) — a
    trimmed log is checked from its floor, with the first epoch's
    ``min_seq`` unconstrained. ``expect_start_seq``: the first epoch's
    expected ``min_seq`` (None = don't check).
    """
    from rayrep.manifests import log_floor

    floor = log_floor(changelog_dir)
    if expect_start_epoch is None:
        expect_start_epoch = floor
        if floor > 0:
            expect_start_seq = None
    from rayrep.logcompact import span_meta

    epochs = [(e, p) for e, p in discover_epochs(changelog_dir)
              if e >= expect_start_epoch]
    spans = {e: span_meta(p) for e, p in epochs if span_meta(p) is not None}
    errors: list[str] = []
    enos = [e for e, _ in epochs]
    # a compacted span (listed under its END epoch) covers its whole
    # [first, last] range — numbering is dense THROUGH spans
    missing: list[int] = []
    cursor = expect_start_epoch
    for e in enos:
        sm = spans.get(e)
        lo = sm["first_epoch"] if sm is not None else e
        if lo != cursor:
            missing.extend(range(cursor, lo))
        cursor = e + 1
    if missing:
        errors.append(
            f"epoch numbering not dense from {expect_start_epoch}: "
            f"found {enos[:8]}{'...' if len(enos) > 8 else ''}, missing {missing}")

    files: list[str] = []
    for _, p in epochs:  # expand epoch DIRS to their part files up front
        if os.path.isdir(p):
            files.extend(sorted(glob.glob(os.path.join(p, "*.parquet"))))
        else:
            files.append(p)
    ds = rd.read_parquet(
        files,
        columns=["seq", "op", "conv_id", "turn_idx"],
        include_paths=True,
    )
    partials = ds.map_batches(_stats_batch, batch_format="pyarrow").to_pandas()
    # driver reduce over O(batches) one-row-per-(batch,epoch) partials
    agg = partials.groupby("epoch").agg(
        n=("n", "sum"), min_seq=("min_seq", "min"), max_seq=("max_seq", "max"),
        bad_op=("bad_op", "sum"), null_key=("null_key", "sum"),
        null_seq=("null_seq", "sum"),
        n_ddl=("n_ddl", "sum"),
        hashsum=("hashsum", lambda s: int(np.int64(
            np.sum(s.to_numpy().astype(np.uint64), dtype=np.uint64)))),
    ).sort_index()

    # expected range hash-sums: one bounded task per PLAIN epoch, in
    # parallel (a compacted span's retained multiset is sparse by design —
    # its expected hash-sum was recorded at compaction time instead)
    exp_refs = {e: _range_hashsum.remote(int(r.min_seq), int(r.max_seq))
                for e, r in agg.iterrows() if e not in spans}
    exp = {e: ray.get(ref) for e, ref in exp_refs.items()}

    per_epoch = []
    prev_max = None
    for e, r in agg.iterrows():
        n, lo, hi = int(r.n), int(r.min_seq), int(r.max_seq)
        sm = spans.get(e)
        if sm is not None:
            # compacted span: verify the RETAINED multiset against the
            # compactor's receipt (count + hash-sum), the retained seqs
            # against the span's original [seq_lo, seq_hwm] envelope, and
            # chain neighbors through the envelope, not the observed ends
            dense = (n == sm["n_retained"]
                     and int(r.hashsum) == sm["retained_hashsum"])
            if not dense:
                errors.append(
                    f"span epoch {e}: retained seq multiset != compaction "
                    f"receipt (rows {n} vs {sm['n_retained']}; hash "
                    f"{'match' if int(r.hashsum) == sm['retained_hashsum'] else 'MISMATCH'})")
            if sm["seq_lo"] is not None and lo < sm["seq_lo"]:
                errors.append(
                    f"span epoch {e}: min retained seq {lo} below the "
                    f"span's original seq_lo {sm['seq_lo']}")
            if sm["seq_hwm"] is not None and hi > sm["seq_hwm"]:
                errors.append(
                    f"span epoch {e}: max retained seq {hi} above the "
                    f"span's original seq_hwm {sm['seq_hwm']}")
            if prev_max is not None and sm["seq_lo"] is not None \
                    and sm["seq_lo"] != prev_max + 1:
                errors.append(
                    f"span epoch {e}: seq_lo {sm['seq_lo']} != previous "
                    f"epoch max_seq {prev_max} + 1")
            if prev_max is None and expect_start_seq is not None \
                    and sm["seq_lo"] is not None \
                    and sm["seq_lo"] != expect_start_seq:
                errors.append(
                    f"first (span) epoch seq_lo {sm['seq_lo']} != "
                    f"expected {expect_start_seq}")
            chain_hi = sm["seq_hwm"] if sm["seq_hwm"] is not None else hi
        else:
            dense = (n == hi - lo + 1) and (int(r.hashsum) == exp[e])
            if not dense:
                errors.append(
                    f"epoch {e}: seq multiset != contiguous [{lo}, {hi}] "
                    f"(rows {n} vs range {hi - lo + 1}; hash "
                    f"{'match' if int(r.hashsum) == exp[e] else 'MISMATCH'})")
            if prev_max is not None and lo != prev_max + 1:
                errors.append(
                    f"epoch {e}: min_seq {lo} != previous epoch max_seq "
                    f"{prev_max} + 1 (epochs must chain contiguously)")
            if prev_max is None and expect_start_seq is not None and lo != expect_start_seq:
                errors.append(f"first epoch min_seq {lo} != expected {expect_start_seq}")
            chain_hi = hi
        if r.bad_op:
            errors.append(f"epoch {e}: {int(r.bad_op)} rows with op outside I/U/D/DDL")
        if r.null_seq:
            errors.append(
                f"epoch {e}: {int(r.null_seq)} rows with NULL seq (never "
                "entered the dense sequence; quarantine via "
                "dead_letter=True or fix the producer)")
        if r.null_key:
            errors.append(
                f"epoch {e}: {int(r.null_key)} non-DDL rows with null "
                "conv_id/turn_idx (would route non-portably)")
        prev_max = chain_hi
        per_epoch.append({"epoch": int(e), "n_rows": n, "min_seq": lo,
                          "max_seq": hi, "hashsum": int(r.hashsum),
                          "dense": bool(dense), "n_ddl": int(r.n_ddl),
                          "compacted_span": bool(sm is not None)})

    return {
        "ok": not errors,
        "errors": errors,
        "epochs": per_epoch,
        "total_rows": int(agg["n"].sum()) if len(agg) else 0,
        "missing_epochs": missing,
    }
