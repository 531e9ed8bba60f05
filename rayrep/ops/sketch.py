"""Mergeable sketches for corpus-scale statistics.

Two operators a 100 TB pipeline reaches for long before an exact shuffle:

- ``kmv_distinct``: approximate COUNT(DISTINCT v) GROUP BY g via a
  K-minimum-values sketch.  Each batch emits at most ``k`` (group, hash)
  rows — its k smallest distinct multiplicative hashes per group — so the
  one shuffle carries O(batches x k x groups) eight-byte hashes instead of
  every value.  The estimate ``(k-1) * 2^64 / h_k`` (exact count when a
  group has fewer than k distinct hashes) is fully deterministic, so the
  DuckDB oracle reproduces it bit-for-bit with HUGEINT mul-mod arithmetic
  (same trick as the winnowing-fingerprint oracle in
  ``rayrep/queries.py``).
- ``bloom_filter`` / ``bloom_prefilter``: a broadcastable Bloom filter
  built from a key Dataset (per-batch partial bitmaps OR-merged; the
  bitmap — not the keys — crosses the cluster once via ``ray.put``), used
  to cut the probe side of a semi/inner join to near-matches before the
  exact hash join.  False positives are removed by the join itself, so
  the composition stays exactly-correct while the join's left input
  shrinks to ~|matches| + eps.

Reference anchor: the replicator ships full row sets to downstream
joins/filters (mysql-time-machine README "augmented data events"); these
are the sketch-sized alternatives that survive 10^10-row tables.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

# splitmix64's odd multiplier: a fixed, public constant — the oracle SQL
# must use the same one.
KMV_MULT = np.uint64(11400714819323198485)
_TWO64 = 18446744073709551616.0  # 2^64, exactly representable in float64


_SQL_TWO64 = "18446744073709551616::HUGEINT"
_SQL_TWO32 = "4294967296::HUGEINT"


def _sql_u64(expr: str) -> str:
    """HUGEINT expression for the uint64 value of an int64 SQL expression —
    numpy's ``astype(uint64)`` two's-complement wrap.  DuckDB's ``%`` takes
    the dividend's sign, so a bare ``key % 2^64`` stays negative for
    negative keys and the oracle would silently diverge from the sketch."""
    return f"((({expr})::HUGEINT % {_SQL_TWO64} + {_SQL_TWO64}) % {_SQL_TWO64})"


def _sql_mulmod64(uexpr: str, c: int) -> str:
    """``(u * c) mod 2^64`` for a non-negative ``u < 2^64`` WITHOUT int128
    overflow: a full u64 x u64 product can reach 2^128 > HUGEINT max, so
    split u into 32-bit halves — ``(hi*c mod 2^32)*2^32 + lo*c`` keeps every
    intermediate under 2^97."""
    return (f"((((({uexpr}) // {_SQL_TWO32}) * {c}::HUGEINT % {_SQL_TWO32})"
            f" * {_SQL_TWO32} + (({uexpr}) % {_SQL_TWO32}) * {c}::HUGEINT)"
            f" % {_SQL_TWO64})")


def sql_hash_pair_select(key_col: str, table_expr: str) -> str:
    """Subquery producing ``({key_col}, h1, h2)`` for every row of
    ``table_expr``, reproducing ``_bloom_positions``'s double hash
    bit-for-bit for ANY int64 key: two's-complement wrap (``_sql_u64``),
    LOGICAL right shift (``uv // 2^32`` — DuckDB's ``>>`` on a negative
    BIGINT sign-extends, numpy's uint64 shift does not), overflow-free
    mul-mod, and h2 forced odd (the numpy ``| 1``)."""
    c1, c2 = int(KMV_MULT), 14029467366897019727
    return f"""(
        SELECT {key_col},
               {_sql_mulmod64('uv', c1)} AS h1,
               m2 + 1 - (m2 % 2) AS h2
        FROM (
            SELECT {key_col}, uv, {_sql_mulmod64('xv', c2)} AS m2
            FROM (
                SELECT {key_col}, uv, xor(uv, uv // {_SQL_TWO32}) AS xv
                FROM (SELECT {key_col}, {_sql_u64(key_col)} AS uv
                      FROM {table_expr})
            )
        )
    )"""


def _kmv_hash(vals: np.ndarray) -> np.ndarray:
    """h(v) = (v * KMV_MULT) mod 2^64 — a Weyl-style multiplicative hash.
    uint64 multiply wraps mod 2^64 in numpy, which is the emulated
    HUGEINT ``(v * C) % 2^64`` in the SQL oracle."""
    return vals.astype(np.uint64, copy=False) * KMV_MULT


def _kmv_partial(batch: pa.Table, *, group_col: str, value_col: str,
                 k: int) -> pa.Table:
    """Per-batch partial: <=k smallest distinct hashes per group."""
    g = batch.column(group_col).to_numpy(zero_copy_only=False)
    h = _kmv_hash(batch.column(value_col).to_numpy(zero_copy_only=False))
    # factorize groups to int codes so the lexsort stays numeric (an
    # object-dtype string sort would be a per-element Python comparison)
    uniq_g, codes = np.unique(g, return_inverse=True)
    # distinct (group, hash) pairs, then the k smallest hashes per group:
    # one lexsort + boundary scan, no Python per row.
    order = np.lexsort((h, codes))
    c_s, h_s = codes[order], h[order]
    keep = np.ones(len(c_s), dtype=bool)
    keep[1:] = (c_s[1:] != c_s[:-1]) | (h_s[1:] != h_s[:-1])
    c_s, h_s = c_s[keep], h_s[keep]
    starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]])
    rank = np.arange(len(c_s)) - np.repeat(starts, np.diff(np.r_[starts, len(c_s)]))
    sel = rank < k
    return pa.table({group_col: pa.array(uniq_g[c_s[sel]]),
                     "__kmv_hash": pa.array(h_s[sel], pa.uint64())})


def _kmv_finalize(group: pa.Table, *, group_col: str, k: int,
                  out_col: str) -> pa.Table:
    hv = np.unique(
        group.column("__kmv_hash").to_numpy(zero_copy_only=False)
    )  # sorted ascending
    if len(hv) < k:
        est = float(len(hv))
    else:
        # (k-1) * 2^64 / h_k — two IEEE ops on exactly-converted inputs,
        # reproduced verbatim by the oracle's DOUBLE arithmetic.
        est = float(k - 1) * _TWO64 / float(hv[k - 1])
    return pa.table({group_col: group.column(group_col).slice(0, 1),
                     out_col: pa.array([est], pa.float64())})


def kmv_distinct(ds: rd.Dataset, *, group_col: str, value_col: str,
                 k: int = 64, out_col: str = "approx_distinct") -> pd.DataFrame:
    """Approximate per-group distinct counts.  The shuffle input is the
    sketch (<=k hashes per group per batch), the per-group finalize is a
    vectorized unique over batches x k values; result is group-count-sized."""
    partial = ds.map_batches(
        _kmv_partial,
        fn_kwargs={"group_col": group_col, "value_col": value_col, "k": k},
        batch_format="pyarrow",
    )
    out = partial.groupby(group_col).map_groups(
        _kmv_finalize,
        fn_kwargs={"group_col": group_col, "k": k, "out_col": out_col},
        batch_format="pyarrow",
    ).to_pandas()
    return out.sort_values(group_col).reset_index(drop=True)


def kmv_oracle_sql(*, table: str, group_col: str, value_col: str,
                   k: int = 64, out_col: str = "approx_distinct") -> str:
    """DuckDB SQL computing the identical KMV estimate: the same
    multiplicative hash via overflow-free HUGEINT mul-mod on the key's
    uint64 (two's-complement) value — bit-identical to numpy for ANY int64
    value, negative keys included — the same k-th-smallest selection, the
    same DOUBLE estimate formula."""
    c = int(KMV_MULT)
    return f"""
        WITH h AS (
            SELECT DISTINCT {group_col}, {_sql_mulmod64('uv', c)} AS hv
            FROM (SELECT {group_col}, {_sql_u64(value_col)} AS uv
                  FROM {table})
        ), r AS (
            SELECT {group_col}, hv,
                   row_number() OVER (PARTITION BY {group_col} ORDER BY hv) AS rk,
                   count(*)    OVER (PARTITION BY {group_col}) AS nd
            FROM h
        )
        SELECT {group_col},
               CASE WHEN nd < {k} THEN nd::DOUBLE
                    ELSE {k - 1}.0 * 18446744073709551616.0 / hv::DOUBLE
               END AS {out_col}
        FROM r
        WHERE rk = least(nd, {k})
        ORDER BY {group_col}
    """


# --------------------------------------------------------------------------
# Bloom-filter semi-join prefilter
# --------------------------------------------------------------------------

def _bloom_positions(keys: np.ndarray, m_bits: int, n_hashes: int) -> np.ndarray:
    """(len(keys), n_hashes) bit positions via double hashing:
    pos_i = (h1 + i*h2) mod m.  All uint64, vectorized."""
    u = keys.astype(np.uint64, copy=False)
    h1 = u * KMV_MULT
    h2 = (u ^ (u >> np.uint64(32))) * np.uint64(14029467366897019727) | np.uint64(1)
    i = np.arange(n_hashes, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(m_bits)).astype(np.int64)


def bloom_filter(keys_ds: rd.Dataset, key_col: str, *, m_bits: int = 1 << 20,
                 n_hashes: int = 4) -> "ray.ObjectRef":
    """Build a Bloom filter over a key Dataset and broadcast it.

    Each batch reduces to an m-bit partial bitmap; the driver ORs the
    per-batch bitmaps (bounded: batches x m/8 bytes, independent of key
    count) and ``ray.put``s the final filter ONCE — probe tasks read it
    zero-copy from the object store instead of re-receiving the key set
    per batch."""
    nbytes = m_bits // 8

    def partial(batch: pa.Table) -> pa.Table:
        bits = np.zeros(nbytes, dtype=np.uint8)
        pos = _bloom_positions(
            batch.column(key_col).to_numpy(zero_copy_only=False),
            m_bits, n_hashes).ravel()
        np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.large_binary())})

    def or_merge(batch: pa.Table) -> pa.Table:
        acc = np.zeros(nbytes, dtype=np.uint8)
        for buf in batch.column("bits").to_pylist():
            acc |= np.frombuffer(buf, dtype=np.uint8)
        return pa.table({"bits": pa.array([acc.tobytes()], pa.large_binary())})

    merged = np.zeros(nbytes, dtype=np.uint8)
    # one distributed tree-merge level (<=64 bitmaps per task) so the
    # driver pulls batches/64 bitmaps, not one per input batch
    folded = (keys_ds.map_batches(partial, batch_format="pyarrow")
              .map_batches(or_merge, batch_format="pyarrow", batch_size=64))
    for b in folded.iter_batches(batch_format="pyarrow"):
        for buf in b.column("bits").to_pylist():
            merged |= np.frombuffer(buf, dtype=np.uint8)
    return ray.put((merged, m_bits, n_hashes))


def bloom_prefilter(ds: rd.Dataset, key_col: str, bloom_ref) -> rd.Dataset:
    """Keep only rows whose key MIGHT be in the filter (no false
    negatives); an exact join downstream removes the false positives."""

    def probe(batch: pa.Table, *, ref) -> pa.Table:
        bits, m_bits, n_hashes = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        if batch.num_rows == 0:
            return batch
        pos = _bloom_positions(
            batch.column(key_col).to_numpy(zero_copy_only=False), m_bits, n_hashes)
        hit = (bits[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0
        return batch.filter(pa.array(hit.all(axis=1)))

    return ds.map_batches(probe, fn_kwargs={"ref": bloom_ref},
                          batch_format="pyarrow")


# --------------------------------------------------------------------------
# Count-min frequency sketch
# --------------------------------------------------------------------------

def cms_build(ds: rd.Dataset, key_col: str, *, width: int = 8192,
              depth: int = 4) -> np.ndarray:
    """Build a depth x width count-min sketch over a key column.

    The mergeable-frequency member of the sketch family (KMV=distinct,
    Bloom=membership, histogram=quantiles, CMS=frequency).  Per batch the
    keys reduce to occupied (cell, count) pairs — at most
    min(rows x depth, depth x width) rows of 16 bytes — via one vectorized
    bincount; ONE tiny grouped Sum merges the batches (the shuffle carries
    cell counts, never keys), and the driver materializes the final
    depth x width int64 matrix (256 KiB at the defaults — broadcastable
    with a single ``ray.put`` for distributed probing).  Buckets reuse the
    Bloom double-hash family ``(h1 + i*h2) mod width``, so the arithmetic
    is reproducible bit-for-bit by the DuckDB oracle's HUGEINT mul-mod
    (``cms_oracle_cells_sql``)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        pos = _bloom_positions(
            t.column(key_col).to_numpy(zero_copy_only=False), width, depth)
        flat = (np.arange(depth, dtype=np.int64)[None, :] * width + pos).ravel()
        cnt = np.bincount(flat, minlength=depth * width)
        nz = np.flatnonzero(cnt)
        return pa.table({"cell": pa.array(nz.astype(np.int64)),
                         "c": pa.array(cnt[nz].astype(np.int64))})

    cells = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("cell").aggregate(Sum("c", alias_name="c")).to_pandas())
    cms = np.zeros(depth * width, dtype=np.int64)
    cms[cells["cell"].to_numpy()] = cells["c"].to_numpy()
    return cms.reshape(depth, width)


def cms_estimate(cms: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Point-query the sketch: min over depth rows of the key's cell —
    the classic one-sided (never under-counting) CMS estimate."""
    depth, width = cms.shape
    pos = _bloom_positions(keys, width, depth)  # (n, depth)
    return cms[np.arange(depth)[None, :], pos].min(axis=1)


def cms_oracle_cells_sql(*, table: str, key_col: str, width: int,
                         depth: int) -> str:
    """SQL fragment computing the identical (i, bucket, count) cells via
    ``sql_hash_pair_select`` — the uint64-normalized, overflow-free
    double-hash family, bit-identical to ``_bloom_positions`` for ANY
    int64 key (negative keys wrap through two's complement exactly as
    numpy's ``astype(uint64)`` does)."""
    return f"""
        SELECT t2.i::BIGINT AS i,
               (((h1 + t2.i::HUGEINT * h2) % {_SQL_TWO64})
                   % {width})::BIGINT AS b,
               count(*)::BIGINT AS c
        FROM {sql_hash_pair_select(key_col, table)} t1, range({depth}) t2(i)
        GROUP BY 1, 2
    """


# --------------------------------------------------------------------------
# Fixed-bin histogram quantile sketch
# --------------------------------------------------------------------------

def histogram_quantiles(ds: rd.Dataset, *, group_col: str, value_col: str,
                        quantiles: tuple = (0.5, 0.95), scale: float = 10.0,
                        col_prefix: str = "p") -> pd.DataFrame:
    """Approximate per-group quantiles from a fixed-resolution histogram —
    the mergeable-sketch scale path that ``value_quantiles``' docstring
    points at.  Per batch: bin = floor(value*scale), one Arrow group-count
    per (group, bin); ONE tiny grouped Sum merges batches (the shuffle
    carries occupied-bin counts, never values); the finalize is a
    cumulative scan over groups x occupied-bins rows.  The estimate (lower
    edge of the first bin whose cumulative count reaches ceil(q*n)) is
    deterministic, so a SQL oracle reproduces it exactly; error is bounded
    by the bin width 1/scale."""
    import math

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(value_col).to_numpy(zero_copy_only=False)
        g = pa.table({
            group_col: t.column(group_col),
            "bin": pa.array(np.floor(v * scale).astype(np.int64)),
            "c": pa.array(np.ones(len(v), dtype=np.int64)),
        }).group_by([group_col, "bin"]).aggregate([("c", "sum")])
        return g.rename_columns([group_col, "bin", "c"])

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([group_col, "bin"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
        .sort_values([group_col, "bin"])
    )
    rows = []
    for key, grp in hist.groupby(group_col, sort=True):
        cc = grp["c"].cumsum().to_numpy()
        n = float(cc[-1])
        bins = grp["bin"].to_numpy()
        row = {group_col: key}
        for q in quantiles:
            # ceil(q*n) in IEEE double — the oracle computes the identical
            # expression, so an off-by-ulp threshold stays consistent.
            thr = math.ceil(q * n)
            row[f"{col_prefix}{int(q * 100)}_est"] = (
                float(bins[np.searchsorted(cc, thr)]) / scale)
        rows.append(row)
    return pd.DataFrame(rows).reset_index(drop=True)
