"""Incrementally maintained materialized aggregate views over the
daily-delta stream (the CDC feature downstream teams actually deploy a
replicator for: keep `GROUP BY g: COUNT(*), SUM(v)` current without ever
rescanning the lake).

Reference analog: the reference's downstream consumers rebuild derived
tables from the Kafka applier's change stream (CHANGES.txt:75); this
module is the AGGREGATE counterpart of `sinks.update_replica` (row
images).  Aggregates need *retractions* — an update that moves a key
from group A to group B must subtract its old contribution — and the
delta stream carries only after-images, so each view keeps a
per-partition **sidecar** (key → group, value, version, live) that
supplies the before-image at refresh time.

Scale shape (the 100-TB contract):

- The consumer inherits the producer's partitioning: delta files are
  already laid out per lake partition (``delta/pNNNNN/eEEEEE.parquet``),
  so a refresh is P independent tasks and **no shuffle** — only the
  final ``read_view`` merges P group-level partials (tiny: one row per
  (partition, group)).
- Refresh cost ∝ new delta rows + the *touched* partitions' sidecars;
  partitions with no new epochs are never read.  Sidecar memory per
  task = O(live keys in that partition) × 1 value column — the same
  envelope `num_partitions` is already sized for (COVERAGE.md
  "state-memory envelope").
- Exactly-once without coordination, the engine's own discipline:
  sidecar + partial files are **epoch-versioned** (``sidecar_eN``),
  the per-partition manifest publishes LAST, and a crashed refresh
  redoes its work from the files the manifest still names — unlike the
  idempotent row-image replica, `+=` arithmetic is NOT re-applicable,
  which is exactly why the files are versioned rather than rewritten
  in place.

Aggregate values are maintained in **fixed point** (``floor(value *
scale)`` as int64) so the view is bit-exact under any arrival order and
hash-comparable to a SQL recompute — the repo's standard discipline for
float aggregates (see `daily_revenue`).
"""

from __future__ import annotations

import glob
import json
import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from rayrep.apply import write_parquet_atomic
from rayrep.manifests import atomic_write_json

_EPOCH_RE = re.compile(r"e(\d+)\.parquet$")

# Sidecar meta columns (alongside the view's group column, whose name and
# type follow the spec).
_SIDE_META = ["conv_id", "turn_idx", "__val_fp", "__ts", "__seq", "__live"]


def _part_manifest_path(view_dir: str, pid: int) -> str:
    return os.path.join(view_dir, f"p{pid:05d}", "manifest.json")


def _load_part_manifest(view_dir: str, pid: int) -> dict:
    p = _part_manifest_path(view_dir, pid)
    if not os.path.exists(p):
        return {"epoch": -1, "sidecar": None, "partial": None}
    with open(p) as f:
        return json.load(f)


def _floor_fp(values: pa.ChunkedArray | pa.Array, scale: int) -> np.ndarray:
    """``floor(value * scale)`` as int64 with nulls → 0 (callers mask by
    null/liveness separately).  Matches SQL ``FLOOR(v * scale)::BIGINT``."""
    v = np.asarray(values.to_numpy(zero_copy_only=False), dtype=np.float64)
    out = np.floor(v * scale)
    return np.where(np.isnan(out), 0, out).astype(np.int64)


def _group_sum(groups: np.ndarray, d_n: np.ndarray,
               d_fp: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized groupby-sum over an object/typed group array (NULL is a
    group of its own, matching SQL GROUP BY).  Accumulates in int64 —
    bincount's float64 weights would silently lose exactness past 2^53."""
    codes, uniques = pd.factorize(groups, use_na_sentinel=False)
    n = np.zeros(len(uniques), dtype=np.int64)
    s = np.zeros(len(uniques), dtype=np.int64)
    np.add.at(n, codes, d_n)
    np.add.at(s, codes, d_fp)
    return np.asarray(uniques, dtype=object), n, s


def _key_ids_np(conv: np.ndarray, turn: np.ndarray) -> np.ndarray:
    codes, _ = pd.factorize(conv, sort=False)
    return (codes.astype(np.int64) << 32) | turn.astype(np.int64)


def _refresh_partition(pid: int, view_dir: str, files: list[str],
                       hi_epoch: int, group_col: str, value_col: str,
                       scale: int) -> dict:
    """Apply ``files`` (this partition's new delta epochs) to its sidecar
    and group partial.  Pure function of (manifest-named files, new
    files) — a redo after a crash recomputes the identical output."""
    man = _load_part_manifest(view_dir, pid)
    pdir = os.path.join(view_dir, f"p{pid:05d}")
    os.makedirs(pdir, exist_ok=True)

    group_field = None
    side = None
    if man["sidecar"]:
        side = pq.read_table(os.path.join(pdir, man["sidecar"]))
        group_field = side.schema.field("__group")

    # --- project new delta rows to sidecar layout ---
    news = []
    # group/value may themselves be key or version columns (e.g. a count
    # view over turn_idx): dedupe the projection, single-reference after
    cols = list(dict.fromkeys(
        ["conv_id", "turn_idx", "ts", "seq", "op", group_col, value_col]))
    for f in files:
        t = pq.read_table(f, columns=cols)
        news.append(pa.table({
            "conv_id": t.column("conv_id"),
            "turn_idx": t.column("turn_idx").cast(pa.int64()),
            "__group": t.column(group_col),
            "__val_fp": pa.array(_floor_fp(t.column(value_col), scale)),
            "__ts": t.column("ts").cast(pa.int64()),
            "__seq": t.column("seq").cast(pa.int64()),
            "__live": pc.invert(pc.equal(t.column("op"), "D")),
        }))
    new = pa.concat_tables(news, promote_options="permissive")

    # --- fold: newest (ts, seq) row per key across sidecar ∪ new ---
    # ONE factorization over the combined table: key ids from separate
    # pd.factorize calls are not comparable, so every mask below indexes
    # this `kid` array positionally.
    n_side = side.num_rows if side is not None else 0
    comb = (pa.concat_tables([side, new], promote_options="permissive")
            if side is not None else new)
    kid = _key_ids_np(comb.column("conv_id").to_numpy(zero_copy_only=False),
                      comb.column("turn_idx").to_numpy())
    ts = comb.column("__ts").to_numpy()
    seq = comb.column("__seq").to_numpy()
    # stable argmax by (ts, seq) per kid: lexsort then last-of-group
    order = np.lexsort((seq, ts, kid))
    k_s = kid[order]
    last = np.ones(len(k_s), dtype=bool)
    last[:-1] = k_s[1:] != k_s[:-1]
    sel = order[last]  # positions in comb forming the new sidecar
    new_side = comb.take(pa.array(sel))

    # --- retraction arithmetic on the keys that changed ---
    # Only keys present in `new` enter the delta: an untouched key's
    # before/after contributions are identical and cancel, so the
    # arithmetic is O(touched keys), never O(sidecar).
    touched = np.unique(kid[n_side:])
    live = comb.column("__live").to_numpy(zero_copy_only=False).astype(bool)
    grp = comb.column("__group").to_numpy(zero_copy_only=False)
    fp = np.asarray(comb.column("__val_fp").to_numpy(zero_copy_only=False),
                    dtype=np.int64)

    def contrib(pos: np.ndarray, sign: int):
        m = np.isin(kid[pos], touched) & live[pos]
        idx = pos[m]
        return grp[idx], np.full(len(idx), sign, dtype=np.int64), fp[idx] * sign

    g_new, n_new, s_new = contrib(sel, +1)
    if n_side:
        g_old, n_old, s_old = contrib(np.arange(n_side), -1)
        g_all = np.concatenate([g_new, g_old])
        n_all = np.concatenate([n_new, n_old])
        s_all = np.concatenate([s_new, s_old])
    else:
        g_all, n_all, s_all = g_new, n_new, s_new

    # --- merge into the running per-partition partial ---
    if man["partial"]:
        old_p = pq.read_table(os.path.join(pdir, man["partial"]))
        if group_field is None:
            group_field = old_p.schema.field("__group")
        g_all = np.concatenate(
            [g_all, old_p.column("__group").to_numpy(zero_copy_only=False)])
        n_all = np.concatenate([n_all, old_p.column("n_rows").to_numpy()])
        s_all = np.concatenate([s_all, old_p.column("sum_fp").to_numpy()])
    if group_field is None:
        group_field = new.schema.field("__group")
    ug, un, us = _group_sum(g_all, n_all, s_all)
    keep = un != 0  # n_rows == 0 ⇒ sum_fp == 0 (each unit is one live row)
    partial = pa.table({
        "__group": pa.array(ug[keep], type=group_field.type),
        "n_rows": pa.array(un[keep]),
        "sum_fp": pa.array(us[keep]),
    })

    # --- epoch-versioned publish: files first, manifest LAST ---
    side_name = f"sidecar_e{hi_epoch:05d}.parquet"
    part_name = f"partial_e{hi_epoch:05d}.parquet"
    write_parquet_atomic(new_side, os.path.join(pdir, side_name))
    write_parquet_atomic(partial, os.path.join(pdir, part_name))
    atomic_write_json(_part_manifest_path(view_dir, pid), {
        "epoch": hi_epoch, "sidecar": side_name, "partial": part_name,
        "group_col": group_col, "value_col": value_col, "scale": scale,
    })
    for f in glob.glob(os.path.join(pdir, "sidecar_e*.parquet")) + glob.glob(
            os.path.join(pdir, "partial_e*.parquet")):
        if f"_e{hi_epoch:05d}." not in f:
            os.remove(f)  # superseded or orphaned-by-crash versions
    return {"part_id": pid, "epochs_applied": len(files),
            "keys_touched": int(len(touched)), "groups": partial.num_rows}


def update_view(delta_dir: str, view_dir: str, group_col: str,
                value_col: str, scale: int = 10000,
                up_to_epoch: int | None = None,
                concurrency: int | None = None) -> dict:
    """Refresh the maintained view from every delta epoch past each
    partition's watermark (optionally capped at ``up_to_epoch``).

    One Ray task per TOUCHED partition (delta files are partition-local
    already — no shuffle); untouched partitions are skipped without a
    read.  Pins (group_col, value_col, scale) per partition and refuses
    a mismatched respec — a view is as routing-stable as the lake."""
    work: list[dict] = []
    for pdir in sorted(glob.glob(os.path.join(delta_dir, "p*"))):
        pid = int(os.path.basename(pdir)[1:])
        man = _load_part_manifest(view_dir, pid)
        for k, want in (("group_col", group_col), ("value_col", value_col),
                        ("scale", scale)):
            if man.get(k) is not None and man[k] != want:
                raise ValueError(
                    f"view {view_dir} p{pid} is pinned to {k}={man[k]!r}; "
                    f"got {want!r}")
        files, hi = [], man["epoch"]
        for f in glob.glob(os.path.join(pdir, "e*.parquet")):
            e = int(_EPOCH_RE.search(f).group(1))
            if e > man["epoch"] and (up_to_epoch is None or e <= up_to_epoch):
                files.append((e, f))
                hi = max(hi, e)
        if files:
            work.append({"pid": pid, "hi": hi,
                         "files": json.dumps([f for _, f in sorted(files)])})
    if not work:
        return {"partitions_refreshed": 0, "epochs_applied": 0}

    def run_one(batch: pa.Table) -> pa.Table:
        out = []
        for row in batch.to_pylist():
            out.append(_refresh_partition(
                int(row["pid"]), view_dir, json.loads(row["files"]),
                int(row["hi"]), group_col, value_col, scale))
        return pa.Table.from_pylist(out)

    summaries = (rd.from_items(work, override_num_blocks=len(work))
                 .map_batches(run_one, batch_format="pyarrow", batch_size=1,
                              concurrency=concurrency)
                 .take_all())  # one tiny row per touched partition
    return {"partitions_refreshed": len(summaries),
            "epochs_applied": int(sum(r["epochs_applied"] for r in summaries)),
            "keys_touched": int(sum(r["keys_touched"] for r in summaries))}


def read_view(view_dir: str, group_col: str = "group") -> pa.Table:
    """The current view: merge the P per-partition group partials (tiny —
    one row per (partition, group)) into one (group, n_rows, sum_fp)
    table.  Never touches sidecars or delta files."""
    tables = []
    for mp in sorted(glob.glob(os.path.join(view_dir, "p*", "manifest.json"))):
        with open(mp) as f:
            man = json.load(f)
        if man.get("partial"):
            tables.append(pq.read_table(
                os.path.join(os.path.dirname(mp), man["partial"])))
    if not tables:
        return pa.table({group_col: pa.array([], pa.string()),
                         "n_rows": pa.array([], pa.int64()),
                         "sum_fp": pa.array([], pa.int64())})
    t = pa.concat_tables(tables, promote_options="permissive")
    g = t.column("__group").to_numpy(zero_copy_only=False)
    ug, un, us = _group_sum(g, t.column("n_rows").to_numpy(),
                            t.column("sum_fp").to_numpy())
    keep = un != 0
    return pa.table({
        group_col: pa.array(ug[keep], type=t.schema.field("__group").type),
        "n_rows": pa.array(un[keep]),
        "sum_fp": pa.array(us[keep]),
    })
