"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Ray-Data shapes (per the scale playbook):
- exact: vectorized content hash in ``map_batches`` → ``groupby(hash)`` →
  keep min-id row per group (ONE shuffle on the 64-bit hash — never on the
  raw text);
- MinHash/LSH: shingle→minhash per batch (stateful hasher actor holds the
  permutation coefficients) → explode to (band_idx, band_hash, doc_id) →
  ``groupby(band)`` → candidate pairs → verify via signature co-group
  attaches → distributed connected components;
- SimHash: 64-bit signature per batch → band buckets → hamming verify
  in-bucket → distributed components;
- embedding: random-hyperplane LSH buckets → exact cosine verify in-bucket.

Components close over edges with ``label_propagation`` (min-label with
pointer-jump shortcuts, O(log diameter) join rounds) — nothing
corpus-sized ever lands on the driver; ``union_find`` remains as the
in-memory reference implementation the pytest suite checks equivalence
against.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from rayrep.hashing import stable_hash_strings
from rayrep.ops.text import _tokens_and_offsets

UMAX = np.uint64(0xFFFFFFFFFFFFFFFF)
MERSENNE = np.uint64((1 << 61) - 1)


# ------------------------------------------------------------------- exact
def add_content_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    h = stable_hash_strings(batch.column(text_col)).view(np.int64)
    return batch.append_column("content_hash", pa.array(h))


def exact_dedup(ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id") -> rd.Dataset:
    """Keep the min-id row per distinct text. NOTE: this variant groups the
    FULL rows by the 8-byte hash, so documents do ride the shuffle — simple
    and fine when rows are narrow. ``exact_dedup_rows`` is the scale
    variant that shuffles only (hash, id) pairs and joins winners back."""
    hashed = ds.map_batches(
        add_content_hash, fn_kwargs={"text_col": text_col},
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def keep_first(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[(id_col, "ascending")])
        return group.take(idx[:1]).drop_columns(["content_hash"])

    return hashed.groupby("content_hash").map_groups(keep_first, batch_format="pyarrow")


def exact_dedup_rows(
    ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id",
    num_partitions: int = 16,
) -> rd.Dataset:
    """Winner-row exact dedup that shuffles only (hash, id) pairs — 16
    bytes/doc through the exchange, never the text. The min-id winner per
    hash group is then inner-joined back against the corpus on the id
    column (Ray native hash join; the corpus rows move at most once, which
    is unavoidable since the full winner rows ARE the output)."""
    from ray.data.aggregate import Min

    pairs = ds.map_batches(
        lambda t: pa.table({
            "content_hash": pa.array(stable_hash_strings(t.column(text_col)).view(np.int64)),
            id_col: t.column(id_col),
        }),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    winners = (
        pairs.groupby("content_hash")
        .aggregate(Min(id_col, alias_name="__winner_id"))
        .select_columns(["__winner_id"])
    )
    out = ds.join(
        winners, join_type="inner", num_partitions=num_partitions,
        on=(id_col,), right_on=("__winner_id",),
    )
    return out.select_columns(ds.schema().names)


def _sentinel_base(ids_np: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Per-doc-unique uint64 sentinel base for docs with no usable
    signature content (shingle-less / token-less): derived from the id so
    two such docs never collide in any band or bucket."""
    if ids_np.dtype.kind in "iu":
        base = ids_np[mask].astype(np.uint64)
    else:
        base = stable_hash_strings(ids_np[mask])
    with np.errstate(over="ignore"):
        return (base * np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)


def _cogroup_match(key: np.ndarray, is_right: np.ndarray):
    """Inside one co-grouped partition: for each LEFT row (``~is_right``),
    the index of the RIGHT row (unique per key) with the same key.
    Returns (left_indices, right_indices) for the rows that matched — the
    shared semi-join kernel of every sort-shuffle attach in this module."""
    ri = np.flatnonzero(is_right)
    li = np.flatnonzero(~is_right)
    if len(ri) == 0 or len(li) == 0:
        return li[:0], ri[:0]
    rk = key[ri]
    o = np.argsort(rk)
    lk = key[li]
    pos = np.minimum(np.searchsorted(rk[o], lk), len(o) - 1)
    ok = rk[o][pos] == lk
    return li[ok], ri[o[pos[ok]]]


_HASHER_CACHE: dict = {}


def _cached_cls_fn(batch: pa.Table, cls, kwargs: dict) -> pa.Table:
    """Task-mode stateful stage with a per-process instance cache (same
    pattern as the engine's cached-task applier): setup cost (permutation
    draws, compiled tables) is paid once per worker process, and running
    as tasks instead of an actor pool lets Ray Data fuse the hasher with
    the parquet read and the downstream band-explode into one operator."""
    key = (cls.__qualname__, tuple(sorted(kwargs.items())))
    inst = _HASHER_CACHE.get(key)
    if inst is None:
        _HASHER_CACHE.clear()
        inst = cls(**kwargs)
        _HASHER_CACHE[key] = inst
    return inst(batch)


# ----------------------------------------------------------------- minhash
class MinHasher:
    """Per-batch MinHash signatures over word-``shingle_k``-grams.

    The ``num_perm`` permutation coefficients are drawn once per actor
    (seeded — identical across actors). Shingle hashing is fully
    vectorized: tokens flattened once, k-gram hashes combined with fixed
    weights, per-doc minima via ``np.minimum.reduceat``.
    Emits one row per doc: (id, sig fixed-list, band_0..band_{b-1} hashes).
    """

    def __init__(self, id_col: str = "doc_id", text_col: str = "text",
                 num_perm: int = 64, shingle_k: int = 3, bands: int = 16,
                 seed: int = 42):
        assert num_perm % bands == 0
        self.id_col, self.text_col = id_col, text_col
        self.num_perm, self.k, self.bands = num_perm, shingle_k, bands
        self.rows_per_band = num_perm // bands
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, MERSENNE, size=num_perm, dtype=np.uint64)

    def shingle_hashes(self, texts) -> tuple[np.ndarray, np.ndarray]:
        """COMPACTED per-doc k-gram shingle hashes: returns ``(g, offsets)``
        where ``g[offsets[d]:offsets[d+1]]`` are exactly doc d's valid
        shingles. Docs with fewer than k tokens get an EMPTY segment (never
        another doc's values — the old clamped-reduceat bug)."""
        flat, tok_offsets = _tokens_and_offsets(texts)
        tok_h = stable_hash_strings(pc.utf8_lower(flat)) if len(flat) else np.empty(0, np.uint64)
        counts = np.diff(tok_offsets)
        n_sh = np.maximum(counts - self.k + 1, 0)
        offsets = np.zeros(len(counts) + 1, dtype=np.int64)
        np.cumsum(n_sh, out=offsets[1:])
        m = len(tok_h)
        g_len = max(m - self.k + 1, 0)
        with np.errstate(over="ignore"):
            g_all = np.zeros(g_len, dtype=np.uint64)
            w = np.uint64(1)
            for j in range(self.k):
                g_all += tok_h[j : g_len + j] * w
                w = np.uint64(w * np.uint64(1099511628211))
        if g_len == 0:
            return g_all, offsets
        # drop windows that cross a doc boundary → per-doc-contiguous layout
        pos = np.arange(g_len)
        doc_of = np.searchsorted(tok_offsets[1:], pos, side="right")
        valid = pos < tok_offsets[:-1][doc_of] + n_sh[doc_of]
        return g_all[valid], offsets

    def signatures(self, texts) -> tuple[np.ndarray, np.ndarray]:
        """Returns (sig matrix, empty-doc mask). Docs with zero valid
        shingles get all-UMAX rows; callers must replace those with a
        per-doc-unique sentinel before banding (``__call__`` does)."""
        g, offsets = self.shingle_hashes(texts)
        n_docs = len(offsets) - 1
        nz = np.diff(offsets) > 0
        sig = np.full((n_docs, self.num_perm), UMAX, dtype=np.uint64)
        if len(g) and nz.any():
            starts = offsets[:-1][nz]
            with np.errstate(over="ignore"):
                for i in range(self.num_perm):
                    hv = (self.a[i] * g + self.b[i]) % MERSENNE
                    sig[nz, i] = np.minimum.reduceat(hv, starts)
        return sig, ~nz

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column(self.text_col)
        sig, empty = self.signatures(
            text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
        )
        if empty.any():
            # per-doc-unique sentinel signatures: shingle-less docs must
            # never band together (est. Jaccard between any two of them = 0)
            ids_np = batch.column(self.id_col).to_numpy(zero_copy_only=False)
            with np.errstate(over="ignore"):
                sig[empty] = _sentinel_base(ids_np, empty)[:, None] * np.arange(
                    1, self.num_perm + 1, dtype=np.uint64
                )[None, :]
        n = batch.num_rows
        # band hash = stable mix of the band's signature rows
        cols = {self.id_col: batch.column(self.id_col)}
        bands = sig.reshape(n, self.bands, self.rows_per_band)
        with np.errstate(over="ignore"):
            bh = np.zeros((n, self.bands), dtype=np.uint64)
            for r in range(self.rows_per_band):
                bh = bh * np.uint64(0x100000001B3) + bands[:, :, r]
        cols["sig"] = pa.array(list(sig.view(np.int64)), type=pa.list_(pa.int64(), self.num_perm))
        for bidx in range(self.bands):
            cols[f"band_{bidx}"] = pa.array(bh[:, bidx].view(np.int64))
        return pa.table(cols)


def _explode_bands(batch: pa.Table, id_col: str, bands: int) -> pa.Table:
    n = batch.num_rows
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    bh = np.stack(
        [batch.column(f"band_{b}").to_numpy(zero_copy_only=False) for b in range(bands)],
        axis=1,
    )
    return pa.table(
        {
            id_col: pa.array(np.repeat(ids, bands)),
            "band_idx": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
            "band_hash": pa.array(bh.reshape(-1)),
        }
    )


def _bucket_pairs(
    exploded: rd.Dataset, id_col: str, bucket_cols: list[str], max_bucket: int,
    num_partitions: int = 16,
) -> rd.Dataset:
    """(id, bucket...) rows → candidate (a, b) pairs per bucket, capped at
    ``max_bucket`` members (lowest ids kept). ONE sort-shuffle partitioned
    by bucket hash; pair enumeration runs vectorized per partition and
    Python-loops only over the segments that actually collide (size ≥ 2) —
    never one interpreter call per bucket."""

    def part(t: pa.Table) -> pa.Table:
        key = t[bucket_cols[0]].to_numpy(zero_copy_only=False).astype(np.int64)
        for c in bucket_cols[1:]:
            with np.errstate(over="ignore"):
                key = key * np.int64(1000003) + t[c].to_numpy(zero_copy_only=False).astype(np.int64)
        out = t.append_column("_bkey", pa.array(key))
        return out.append_column("part_id", pa.array(_ipart(key, num_partitions)))

    def kernel(g: pa.Table) -> pa.Table:
        key = g.column("_bkey").to_numpy()
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, key))
        ks, vs = key[order], ids[order]
        seg = np.ones(len(ks), dtype=bool)
        if len(ks) > 1:
            seg[1:] = ks[1:] != ks[:-1]
        starts = np.flatnonzero(seg)
        ends = np.append(starts[1:], len(ks))
        outs_a, outs_b = [], []
        for st, en in zip(starts, ends):
            if en - st < 2:
                continue
            s = vs[st:en][:max_bucket]  # sorted asc already (lexsort)
            iu = np.triu_indices(len(s), k=1)
            outs_a.append(s[iu[0]])
            outs_b.append(s[iu[1]])
        if not outs_a:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        return pa.table({"a": pa.array(np.concatenate(outs_a)),
                         "b": pa.array(np.concatenate(outs_b))})

    return exploded.map_batches(part, batch_format="pyarrow").groupby(
        "part_id"
    ).map_groups(kernel, batch_format="pyarrow")


def minhash_candidate_pairs(
    ds: rd.Dataset, id_col: str = "doc_id", text_col: str = "text",
    num_perm: int = 64, shingle_k: int = 3, bands: int = 16, seed: int = 42,
    max_bucket: int = 200,
) -> tuple[rd.Dataset, rd.Dataset]:
    """Returns (signatures dataset, candidate-pair dataset). Buckets larger
    than ``max_bucket`` are truncated pairwise (logged via the `capped`
    column) — the standard LSH guard against degenerate buckets."""
    sigs = ds.map_batches(
        _cached_cls_fn,
        fn_kwargs=dict(cls=MinHasher,
                       kwargs=dict(id_col=id_col, text_col=text_col,
                                   num_perm=num_perm, shingle_k=shingle_k,
                                   bands=bands, seed=seed)),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    exploded = sigs.map_batches(
        _explode_bands, fn_kwargs=dict(id_col=id_col, bands=bands),
        batch_format="pyarrow",
    )
    cand = _bucket_pairs(exploded, id_col, ["band_idx", "band_hash"], max_bucket)
    return sigs, cand


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> np.ndarray:
    return (sig_a == sig_b).mean(axis=1)


def _sig_matrix(col, num_perm: int) -> np.ndarray:
    """fixed_size_list<int64, P> column → (n, P) ndarray, via flatten."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return arr.flatten().to_numpy(zero_copy_only=False).reshape(-1, num_perm)


def _dedup_pairs(cand: rd.Dataset, num_partitions: int) -> rd.Dataset:
    """Distinct (a, b) pairs (a pair surfaces from up to `bands` buckets).
    One sort-shuffle partitioned on `a`, then a vectorized first-occurrence
    mask per partition — never one Python call per pair."""

    def part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "part_id", pa.array(_ipart(t["a"].to_numpy(zero_copy_only=False),
                                       num_partitions)))

    def kernel(g: pa.Table) -> pa.Table:
        a = g.column("a").to_numpy()
        b = g.column("b").to_numpy()
        order = np.lexsort((b, a))
        As, Bs = a[order], b[order]
        first = np.ones(len(As), dtype=bool)
        if len(As) > 1:
            first[1:] = (As[1:] != As[:-1]) | (Bs[1:] != Bs[:-1])
        # keep the first occurrence's FULL row so payload columns (e.g. a
        # verified cosine) survive the dedup
        return g.take(pa.array(order[first])).drop_columns(["part_id"])

    return cand.map_batches(part, batch_format="pyarrow").groupby(
        "part_id"
    ).map_groups(kernel, batch_format="pyarrow")


def minhash_components(
    ds: rd.Dataset, id_col: str = "doc_id", text_col: str = "text",
    threshold: float = 0.8, num_perm: int = 64, num_partitions: int = 16, **kw,
) -> rd.Dataset:
    """Fully distributed near-dup clustering → (id, rep) Dataset.

    Candidate pairs come from banded LSH groups (bounded buckets); the
    Jaccard estimate is verified by CO-GROUPING the pair list with the
    signature table twice (sort-shuffle attach on each endpoint — 512 B of
    signature per side through the exchange, never the text), vectorized
    row compares; components close over the surviving edges with the
    distributed ``label_propagation``. Nothing corpus-sized ever lands on
    the driver (the round-1 ``to_pandas`` verification is gone)."""
    sigs, cand = minhash_candidate_pairs(
        ds, id_col=id_col, text_col=text_col, num_perm=num_perm, **kw
    )
    cand = _dedup_pairs(cand, num_partitions)
    sig_small = sigs.select_columns([id_col, "sig"])
    fsl = pa.list_(pa.int64(), num_perm)

    def _take(col, idx: np.ndarray):
        return col.take(pa.array(idx, pa.int64()))

    # stage 1 (co-group by a): attach sig_a — join-free, the same
    # sort-shuffle primitive as the CDC applier (see label_propagation's
    # note on Ray 2.49 hash-join re-execution)
    u1 = cand.map_batches(
        lambda t: pa.table({"key": t["a"], "oth": t["b"],
                            "sig": pa.nulls(t.num_rows, fsl),
                            "is_sig": pa.array(np.zeros(t.num_rows, bool))}),
        batch_format="pyarrow",
    ).union(sig_small.map_batches(
        lambda t: pa.table({"key": t[id_col], "oth": pa.nulls(t.num_rows, pa.int64()),
                            "sig": t["sig"],
                            "is_sig": pa.array(np.ones(t.num_rows, bool))}),
        batch_format="pyarrow",
    ))

    def part_key(t: pa.Table) -> pa.Table:
        return t.append_column(
            "part_id", pa.array(_ipart(t["key"].to_numpy(zero_copy_only=False),
                                       num_partitions)))

    def attach1(g: pa.Table) -> pa.Table:
        key = g.column("key").to_numpy()
        is_sig = g.column("is_sig").to_numpy(zero_copy_only=False)
        pr, sr = _cogroup_match(key, is_sig)
        return pa.table({"a": pa.array(key[pr]),
                         "b": _take(g.column("oth"), pr),
                         "sig_a": _take(g.column("sig"), sr)})

    j1 = u1.map_batches(part_key, batch_format="pyarrow").groupby("part_id").map_groups(
        attach1, batch_format="pyarrow"
    )

    # stage 2 (co-group by b): attach sig_b, verify the Jaccard estimate
    u2 = j1.map_batches(
        lambda t: pa.table({"key": t["b"], "oth": t["a"], "sig_a": t["sig_a"],
                            "sig": pa.nulls(t.num_rows, fsl),
                            "is_sig": pa.array(np.zeros(t.num_rows, bool))}),
        batch_format="pyarrow",
    ).union(sig_small.map_batches(
        lambda t: pa.table({"key": t[id_col], "oth": pa.nulls(t.num_rows, pa.int64()),
                            "sig_a": pa.nulls(t.num_rows, fsl),
                            "sig": t["sig"],
                            "is_sig": pa.array(np.ones(t.num_rows, bool))}),
        batch_format="pyarrow",
    ))

    def attach2_verify(g: pa.Table) -> pa.Table:
        key = g.column("key").to_numpy()
        is_sig = g.column("is_sig").to_numpy(zero_copy_only=False)
        pr, sr = _cogroup_match(key, is_sig)
        if len(pr) == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        A = _sig_matrix(_take(g.column("sig_a"), pr), num_perm)
        B = _sig_matrix(_take(g.column("sig"), sr), num_perm)
        est = (A == B).mean(axis=1)
        keep = est >= threshold
        return pa.table({"a": _take(g.column("oth"), pr[keep]),
                         "b": pa.array(key[pr[keep]])})

    edges = u2.map_batches(part_key, batch_format="pyarrow").groupby("part_id").map_groups(
        attach2_verify, batch_format="pyarrow"
    )
    selfe = sig_small.map_batches(
        lambda t: pa.table({"a": t[id_col], "b": t[id_col]}), batch_format="pyarrow"
    )
    comp = label_propagation(edges.union(selfe), num_partitions=num_partitions)
    return comp.map_batches(
        lambda t: pa.table({id_col: t["node"], "rep": t["label"]}), batch_format="pyarrow"
    )


def minhash_dedup(
    ds: rd.Dataset, id_col: str = "doc_id", text_col: str = "text",
    threshold: float = 0.8, **kw,
) -> pd.DataFrame:
    """Small-scale convenience wrapper: ``minhash_components`` collected to
    a DataFrame (the RESULT — one row per doc — is what materializes, not
    any intermediate)."""
    return minhash_components(
        ds, id_col=id_col, text_col=text_col, threshold=threshold, **kw
    ).to_pandas()


# ----------------------------------------------------------------- simhash
class SimHasher:
    """64-bit SimHash per doc over token hashes (vectorized bit-count via
    per-bit reduceat)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from rayrep.ops.text import segment_sum

        text = batch.column(self.text_col)
        flat, offsets = _tokens_and_offsets(
            text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
        )
        n = batch.num_rows
        counts = np.diff(offsets)
        th = stable_hash_strings(pc.utf8_lower(flat)) if len(flat) else np.empty(0, np.uint64)
        acc = np.zeros((n, 64), dtype=np.int64)
        for bit in range(64):
            bits = ((th >> np.uint64(bit)) & np.uint64(1)).astype(np.int64)
            acc[:, bit] = segment_sum(bits, offsets)
        votes = 2 * acc - counts[:, None]  # (+1 per set bit, -1 per clear)
        sh = np.zeros(n, dtype=np.uint64)
        for bit in range(64):
            sh |= (votes[:, bit] > 0).astype(np.uint64) << np.uint64(bit)
        empty = counts == 0
        if empty.any():
            # token-less docs: per-doc-unique sentinel, never hamming-close
            ids_np = batch.column(self.id_col).to_numpy(zero_copy_only=False)
            sh[empty] = _sentinel_base(ids_np, empty)
        return batch.append_column("simhash", pa.array(sh.view(np.int64)))


def simhash_dedup(
    ds: rd.Dataset, id_col: str = "doc_id", text_col: str = "text",
    max_hamming: int = 3, bands: int = 4, num_partitions: int = 16,
) -> pd.DataFrame:
    """Near-dup by SimHash: 16-bit band buckets (any equal band → candidate,
    catches all pairs with hamming ≤ bands-1 by pigeonhole), popcount
    verify INSIDE each band group, distributed ``label_propagation``
    components — no corpus-sized driver materialization."""
    hashed = ds.map_batches(
        _cached_cls_fn,
        fn_kwargs=dict(cls=SimHasher, kwargs=dict(id_col=id_col, text_col=text_col)),
        batch_format="pyarrow", zero_copy_batch=True,
    ).select_columns([id_col, "simhash"])

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sh = batch.column("simhash").to_numpy(zero_copy_only=False).view(np.uint64)
        width = 64 // bands
        mask = np.uint64((1 << width) - 1)
        parts = np.stack(
            [(sh >> np.uint64(b * width)) & mask for b in range(bands)], axis=1
        ).astype(np.int64)
        return pa.table({
            id_col: pa.array(np.repeat(ids, bands)),
            "simhash": pa.array(np.repeat(sh.view(np.int64), bands)),
            "band_idx": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
            "band_val": pa.array(parts.reshape(-1)),
        })

    exploded = hashed.map_batches(explode, batch_format="pyarrow")

    def part(t: pa.Table) -> pa.Table:
        with np.errstate(over="ignore"):
            key = (t["band_val"].to_numpy().astype(np.int64) * np.int64(1000003)
                   + t["band_idx"].to_numpy().astype(np.int64))
        out = t.append_column("_bkey", pa.array(key))
        return out.append_column("part_id", pa.array(_ipart(key, num_partitions)))

    def bucket_verify(g: pa.Table) -> pa.Table:
        """Vectorized per partition: hamming verify only inside the
        segments that collide (Python loop over colliding buckets only)."""
        key = g.column("_bkey").to_numpy()
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        sh = g.column("simhash").to_numpy(zero_copy_only=False).view(np.uint64)
        order = np.lexsort((ids, key))
        ks, vs, hs = key[order], ids[order], sh[order]
        seg = np.ones(len(ks), dtype=bool)
        if len(ks) > 1:
            seg[1:] = ks[1:] != ks[:-1]
        starts = np.flatnonzero(seg)
        ends = np.append(starts[1:], len(ks))
        outs_a, outs_b = [], []
        for st, en in zip(starts, ends):
            if en - st < 2:
                continue
            s, h = vs[st:en], hs[st:en]
            iu = np.triu_indices(len(s), k=1)
            x = h[iu[0]] ^ h[iu[1]]
            ham = np.zeros(len(x), dtype=np.int64)
            for _ in range(64):
                ham += (x & np.uint64(1)).astype(np.int64)
                x >>= np.uint64(1)
            keep = ham <= max_hamming
            outs_a.append(s[iu[0]][keep])
            outs_b.append(s[iu[1]][keep])
        if not outs_a:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        return pa.table({"a": pa.array(np.concatenate(outs_a)),
                         "b": pa.array(np.concatenate(outs_b))})

    cand = exploded.map_batches(part, batch_format="pyarrow").groupby(
        "part_id"
    ).map_groups(bucket_verify, batch_format="pyarrow")
    edges = _dedup_pairs(cand, num_partitions)
    selfe = hashed.map_batches(
        lambda t: pa.table({"a": t[id_col], "b": t[id_col]}), batch_format="pyarrow"
    )
    comp = label_propagation(edges.union(selfe), num_partitions=num_partitions)
    return comp.map_batches(
        lambda t: pa.table({id_col: t["node"], "rep": t["label"]}), batch_format="pyarrow"
    ).to_pandas()


# ------------------------------------------------------- n-gram Jaccard
def ngram_jaccard_verify(
    ds: rd.Dataset, pairs: pd.DataFrame, id_col: str = "doc_id",
    text_col: str = "text", n: int = 3, threshold: float = 0.7,
) -> pd.DataFrame:
    """Exact token n-gram Jaccard for candidate pairs. Texts for the
    candidate ids are fetched via a broadcast id-set semi-join (candidates
    ≪ corpus); exact sets built once per unique id."""
    if not len(pairs):
        return pairs.assign(jaccard=pd.Series(dtype=float))
    wanted = set(pairs["a"]) | set(pairs["b"])
    keep = ds.map_batches(
        lambda t: t.filter(pc.is_in(t[id_col], value_set=pa.array(list(wanted)))),
        batch_format="pyarrow",
    ).to_pandas()
    hasher = MinHasher(id_col=id_col, text_col=text_col, shingle_k=n)
    sets: dict[int, set] = {}
    g, off = hasher.shingle_hashes(pa.array(keep[text_col].astype(str)))
    for i, did in enumerate(keep[id_col]):
        sets[did] = set(g[off[i] : off[i + 1]].tolist())
    jac = []
    for a, b in zip(pairs["a"], pairs["b"]):
        sa, sb = sets.get(a, set()), sets.get(b, set())
        inter = len(sa & sb)
        union = len(sa | sb)
        jac.append(inter / union if union else 0.0)
    out = pairs.copy()
    out["jaccard"] = jac
    return out[out["jaccard"] >= threshold].reset_index(drop=True)


def ngram_jaccard_verify_ds(
    ds: rd.Dataset, pairs: rd.Dataset, id_col: str = "doc_id",
    text_col: str = "text", n: int = 3, threshold: float = 0.7,
    num_partitions: int = 16, seed: int = 42,
) -> rd.Dataset:
    """Distributed exact n-gram Jaccard for a candidate-pair Dataset: each
    doc's sorted-unique shingle-hash set rides two co-group attaches (one
    per endpoint; variable-length list column), then the intersection size
    is computed inside the second kernel. The per-pair loop runs on the
    WORKERS over LSH-bounded candidates — never a driver loop (the plain
    ``ngram_jaccard_verify`` stays as the small-scale DataFrame helper)."""
    hasher = MinHasher(id_col=id_col, text_col=text_col, shingle_k=n, seed=seed)

    def shingle_sets(t: pa.Table) -> pa.Table:
        text = t.column(text_col)
        g, off = hasher.shingle_hashes(
            text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
        )
        sets, offsets = [], [0]
        vals = []
        for i in range(t.num_rows):
            seg = np.unique(g[off[i] : off[i + 1]].view(np.int64))
            vals.append(seg)
            offsets.append(offsets[-1] + len(seg))
        flat = np.concatenate(vals) if vals else np.empty(0, np.int64)
        return pa.table({
            id_col: t.column(id_col),
            "shg": pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()), pa.array(flat, pa.int64())
            ),
        })

    sets_ds = ds.map_batches(shingle_sets, batch_format="pyarrow")
    lt = pa.list_(pa.int64())

    def part_key(t: pa.Table) -> pa.Table:
        return t.append_column(
            "part_id", pa.array(_ipart(t["key"].to_numpy(zero_copy_only=False),
                                       num_partitions)))

    u1 = pairs.map_batches(
        lambda t: pa.table({"key": t["a"], "oth": t["b"],
                            "shg": pa.nulls(t.num_rows, lt),
                            "is_set": pa.array(np.zeros(t.num_rows, bool))}),
        batch_format="pyarrow",
    ).union(sets_ds.map_batches(
        lambda t: pa.table({"key": t[id_col], "oth": pa.nulls(t.num_rows, pa.int64()),
                            "shg": t["shg"],
                            "is_set": pa.array(np.ones(t.num_rows, bool))}),
        batch_format="pyarrow",
    ))

    def attach1(g: pa.Table) -> pa.Table:
        key = g.column("key").to_numpy()
        pr, sr = _cogroup_match(key, g.column("is_set").to_numpy(zero_copy_only=False))
        return pa.table({
            "a": pa.array(key[pr]),
            "b": g.column("oth").take(pa.array(pr, pa.int64())),
            "shg_a": g.column("shg").take(pa.array(sr, pa.int64())),
        })

    j1 = u1.map_batches(part_key, batch_format="pyarrow").groupby("part_id").map_groups(
        attach1, batch_format="pyarrow")

    u2 = j1.map_batches(
        lambda t: pa.table({"key": t["b"], "oth": t["a"], "shg_a": t["shg_a"],
                            "shg": pa.nulls(t.num_rows, lt),
                            "is_set": pa.array(np.zeros(t.num_rows, bool))}),
        batch_format="pyarrow",
    ).union(sets_ds.map_batches(
        lambda t: pa.table({"key": t[id_col], "oth": pa.nulls(t.num_rows, pa.int64()),
                            "shg_a": pa.nulls(t.num_rows, lt),
                            "shg": t["shg"],
                            "is_set": pa.array(np.ones(t.num_rows, bool))}),
        batch_format="pyarrow",
    ))

    def attach2(g: pa.Table) -> pa.Table:
        key = g.column("key").to_numpy()
        pr, sr = _cogroup_match(key, g.column("is_set").to_numpy(zero_copy_only=False))
        if len(pr) == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "jaccard": pa.array([], pa.float64())})
        # Per-pair intersections over FLATTENED numpy views of the list
        # columns (sets are sorted-unique per row). Measured at 200k
        # pairs x 30 tokens: round-2's to_pylist + per-pair asarray 8.7 s;
        # a fully-vectorized global (pid, value) lexsort-merge 12.3 s
        # (recorded negative result: the O(n log n) composite sort costs
        # more than it saves); numpy segment views + intersect1d 0.96 s —
        # the Python-object churn, not the loop, was the cost.
        npair = len(pr)
        sa_col = g.column("shg_a").take(pa.array(pr, pa.int64()))
        sb_col = g.column("shg").take(pa.array(sr, pa.int64()))
        la = pc.fill_null(pc.list_value_length(sa_col), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        lb = pc.fill_null(pc.list_value_length(sb_col), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        fa = pc.list_flatten(sa_col).to_numpy(zero_copy_only=False)
        fb = pc.list_flatten(sb_col).to_numpy(zero_copy_only=False)
        offa = np.concatenate(([0], np.cumsum(la)))
        offb = np.concatenate(([0], np.cumsum(lb)))
        inter = np.empty(npair, dtype=np.int64)
        for i in range(npair):
            inter[i] = len(np.intersect1d(
                fa[offa[i]:offa[i + 1]], fb[offb[i]:offb[i + 1]],
                assume_unique=True))
        union = la + lb - inter
        jac = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        keep = jac >= threshold
        return pa.table({
            "a": g.column("oth").take(pa.array(pr[keep], pa.int64())),
            "b": pa.array(key[pr[keep]]),
            "jaccard": pa.array(jac[keep]),
        })

    return u2.map_batches(part_key, batch_format="pyarrow").groupby("part_id").map_groups(
        attach2, batch_format="pyarrow")


# --------------------------------------------------- embedding near-dup
def embedding_neardup_ds(
    ds: rd.Dataset, id_col: str = "vec_id", emb_col: str = "embedding",
    threshold: float = 0.95, planes: int = 12, seed: int = 42, dim: int | None = None,
    max_bucket: int = 1000, num_partitions: int = 16,
) -> rd.Dataset:
    """Dataset-returning cosine near-dup via random-hyperplane LSH buckets
    + exact verify; pair dedup (a pair can surface from several buckets —
    here only when codes tie, but the contract matches the MinHash path)
    runs DISTRIBUTED through _dedup_pairs, never a driver drop_duplicates.
    In-bucket verify is capped at ``max_bucket`` members (deterministic:
    lowest ids kept) — the same degenerate-bucket guard as the MinHash
    path; one all-near-zero-vector bucket must not go O(n²) in one task."""
    if dim is None:
        first = ds.take(1)[0]
        dim = len(first[emb_col])
    rng = np.random.default_rng(seed)
    proj = rng.standard_normal((dim, planes)).astype(np.float32)

    def bucket(batch: pa.Table) -> pa.Table:
        m = np.stack(batch.column(emb_col).to_numpy(zero_copy_only=False))
        sig = (m @ proj > 0).astype(np.uint64)
        code = np.zeros(len(m), dtype=np.uint64)
        for b in range(planes):
            code |= sig[:, b] << np.uint64(b)
        norm = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pa.table({
            id_col: batch.column(id_col),
            "bucket": pa.array(code.view(np.int64)),
            "nvec": pa.array(list(norm), type=pa.list_(pa.float32(), dim)),
        })

    bucketed = ds.map_batches(bucket, batch_format="pyarrow")

    def verify(group: pa.Table) -> pa.Table:
        if group.num_rows < 2:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        if group.num_rows > max_bucket:
            order = pc.sort_indices(group, sort_keys=[(id_col, "ascending")])
            group = group.take(order[:max_bucket])
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        m = np.stack(group.column("nvec").to_numpy(zero_copy_only=False))
        sim = m @ m.T
        iu = np.triu_indices(len(ids), k=1)
        s = sim[iu]
        keep = s >= threshold
        ia, ib = ids[iu[0]][keep], ids[iu[1]][keep]
        # canonical pair order (a < b) regardless of in-bucket row order
        return pa.table({"a": pa.array(np.minimum(ia, ib)), "b": pa.array(np.maximum(ia, ib)),
                         "cosine": pa.array(s[keep].astype(np.float64))})

    pairs = bucketed.groupby("bucket").map_groups(verify, batch_format="pyarrow")
    return _dedup_pairs(pairs, num_partitions)


def embedding_neardup(
    ds: rd.Dataset, id_col: str = "vec_id", emb_col: str = "embedding",
    threshold: float = 0.95, planes: int = 12, seed: int = 42, dim: int | None = None,
    max_bucket: int = 1000,
) -> pd.DataFrame:
    """Result-sized DataFrame convenience over ``embedding_neardup_ds``
    (everything distributed incl. the pair dedup; only the final verified
    pairs touch the driver)."""
    out = embedding_neardup_ds(ds, id_col=id_col, emb_col=emb_col,
                               threshold=threshold, planes=planes, seed=seed,
                               dim=dim, max_bucket=max_bucket).to_pandas()
    if out.empty:
        return pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
                             "cosine": pd.Series(dtype="float64")})
    return out.reset_index(drop=True)


# -------------------------------------------------------------- components
def union_find(ids, edges) -> dict:
    """Driver-side union-find → {id: representative(min id)}. Use only when
    edges provably fit the driver (candidates after LSH, test scale)."""
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {i: find(i) for i in parent}


_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _ipart(keys: np.ndarray, num_partitions: int) -> np.ndarray:
    """Balanced partition id for int64 keys (multiplicative mix so
    sequential ids don't stripe)."""
    with np.errstate(over="ignore"):
        h = keys.astype(np.uint64) * _GOLD
    return ((h >> np.uint64(32)) % np.uint64(num_partitions)).astype(np.int32)


def _grouped_min_labels(
    msgs: rd.Dataset, num_partitions: int, with_changed: bool = False
) -> rd.Dataset:
    """(node, cand) messages -> (node, label=min cand), via the sort-shuffle
    co-group (segment-min per node inside each hash partition).
    ``with_changed``: msgs carry an ``own`` flag marking each node's own
    prior-label message; the output gains ``changed`` = (new label != prior)
    — the overflow-free convergence signal (sum of at most n booleans)."""

    def part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "part_id", pa.array(_ipart(t["node"].to_numpy(zero_copy_only=False),
                                       num_partitions))
        )

    def kernel(g: pa.Table) -> pa.Table:
        node = g.column("node").to_numpy()
        cand = g.column("cand").to_numpy()
        order = np.lexsort((cand, node))
        ns, cs = node[order], cand[order]
        first = np.ones(len(ns), dtype=bool)
        if len(ns) > 1:
            first[1:] = ns[1:] != ns[:-1]
        out = {"node": pa.array(ns[first]), "label": pa.array(cs[first])}
        if with_changed:
            own = g.column("own").to_numpy(zero_copy_only=False)[order]
            seg_id = (np.cumsum(first) - 1).astype(np.int64)
            nseg = int(seg_id[-1]) + 1 if len(ns) else 0
            old = np.full(nseg, np.iinfo(np.int64).max, dtype=np.int64)
            if own.any():
                old[seg_id[own]] = cs[own]  # exactly one own msg per node
            out["changed"] = pa.array(cs[first] != old)
        return pa.table(out)

    return msgs.map_batches(part, batch_format="pyarrow").groupby("part_id").map_groups(
        kernel, batch_format="pyarrow"
    )


def label_propagation(
    edges: rd.Dataset, max_rounds: int = 50, num_partitions: int = 16,
    convergence: str = "sum",
) -> rd.Dataset:
    """Distributed connected components: min-label propagation with label
    SHORTCUTS (pointer jumping) -- each round every node takes the min of
    its own label, its neighbors' labels, and its label's current label,
    converging in O(log diameter) rounds instead of O(diameter).

    Fully Dataset-native (the round-1 driver-materialization is gone), and
    deliberately JOIN-FREE: Ray 2.49's hash-join operator mis-routes
    blocks between its shuffle aggregators when the same join shape is
    re-executed within one session (observed: "No match or multiple
    matches for FieldRef" on the second round), so each round uses the
    engine's proven sort-shuffle co-group instead -- one exchange
    partitioned by message SOURCE (edge rows co-located with their
    source's label row, plus reversed label-edges that realize the pointer
    jump), one exchange for the per-node min. The labels Dataset is
    materialized to the OBJECT STORE between rounds (a bounded
    one-row-per-node intermediate -- never a driver DataFrame).
    Convergence: ``convergence="sum"`` (default) uses the int64 sum of
    labels, which strictly decreases under any change — simple, but at
    >>10^9 nodes the sum could overflow; ``convergence="count"`` instead
    counts nodes whose label changed this round (each node's own
    prior-label message is flagged, the min kernel compares) — a sum of
    at most n booleans, overflow-free at any scale. Both reach the same
    fixed point (equivalence-tested against union_find).

    Input: (a, b) int64 edges; include (id, id) self-edges for nodes that
    must appear even when isolated. Output: (node, label) with label =
    component min id -- same fixed point as ``union_find``."""
    if convergence not in ("sum", "count"):
        raise ValueError(f"convergence must be 'sum' or 'count', got {convergence!r}")
    count_mode = convergence == "count"
    # static edge rows, partitioned by source: (key, dst)
    ekey = edges.map_batches(
        lambda t: pa.table({
            "key": pa.concat_arrays([t["a"].combine_chunks(), t["b"].combine_chunks()]),
            "dst": pa.concat_arrays([t["b"].combine_chunks(), t["a"].combine_chunks()]),
        }),
        batch_format="pyarrow",
    ).materialize()

    labels = _grouped_min_labels(
        ekey.map_batches(
            lambda t: pa.table({
                "node": t["key"],
                "cand": pc.min_element_wise(t["key"], t["dst"]),
            }),
            batch_format="pyarrow",
        ),
        num_partitions,
    ).materialize()

    def edge_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "key": t["key"], "dst": t["dst"],
            "lbl": pa.nulls(t.num_rows, pa.int64()),
        })

    def label_rows(t: pa.Table) -> pa.Table:
        # (a) the node's own label row (delivers l to its edge fan-out);
        # (b) reversed label-edge (key=label, dst=node): the node receives
        #     label(label(node)) next round -- the pointer jump
        n = t.num_rows
        own = pa.table({
            "key": t["node"], "dst": pa.nulls(n, pa.int64()), "lbl": t["label"],
        })
        rev = pa.table({
            "key": t["label"], "dst": t["node"], "lbl": pa.nulls(n, pa.int64()),
        })
        return pa.concat_tables([own, rev])

    def deliver(g: pa.Table) -> pa.Table:
        key = g.column("key").to_numpy()
        # validity masks + fill_null keep ids exact int64 end to end — a
        # float64 round-trip (to_numpy on null-bearing columns) would
        # silently round ids above 2^53 (e.g. content-hash-derived nodes)
        dst = pc.fill_null(g.column("dst"), 0).to_numpy(zero_copy_only=False)
        dst_valid = pc.is_valid(g.column("dst")).to_numpy(zero_copy_only=False)
        lbl = pc.fill_null(g.column("lbl"), 0).to_numpy(zero_copy_only=False)
        is_lbl = pc.is_valid(g.column("lbl")).to_numpy(zero_copy_only=False)
        order = np.argsort(key, kind="stable")
        ks = key[order]
        seg = np.ones(len(ks), dtype=bool)
        if len(ks) > 1:
            seg[1:] = ks[1:] != ks[:-1]
        seg_id = np.cumsum(seg) - 1
        n_seg = int(seg_id[-1]) + 1 if len(ks) else 0
        # per-segment label (each node carries exactly one label row; a
        # node reachable only as a reversed-label TARGET has none -> its
        # own id is the safe upper bound)
        seg_lbl = np.full(n_seg, np.iinfo(np.int64).max, dtype=np.int64)
        lo, li = lbl[order], is_lbl[order]
        if li.any():
            np.minimum.at(seg_lbl, seg_id[li], lo[li])
        no_lbl = seg_lbl == np.iinfo(np.int64).max
        if no_lbl.any():
            seg_lbl[no_lbl] = ks[seg][no_lbl]
        # messages: each edge row sends its source's label to dst; each
        # source also keeps its own label
        do = dst[order]
        de = dst_valid[order]
        out_node = np.concatenate([do[de], ks[seg]])
        out_cand = np.concatenate([seg_lbl[seg_id[de]], seg_lbl])
        out = {"node": pa.array(out_node), "cand": pa.array(out_cand)}
        if count_mode:
            # the self message IS the node's prior label — flag it so the
            # min kernel can report changed = (new != prior)
            out["own"] = pa.array(np.concatenate(
                [np.zeros(int(de.sum()), bool), np.ones(int(seg.sum()), bool)]))
        return pa.table(out)

    def part_by_key(t: pa.Table) -> pa.Table:
        return t.append_column(
            "part_id", pa.array(_ipart(t["key"].to_numpy(zero_copy_only=False),
                                       num_partitions))
        )

    static_edges = ekey.map_batches(edge_rows, batch_format="pyarrow").materialize()
    # seed the convergence check with the INITIAL sum: graphs whose initial
    # labels are already the fixed point (diameter <= 1 clusters, the common
    # near-dup case) then stop after a single confirming round
    prev_sum = None if count_mode else labels.sum("label")
    for _ in range(max_rounds):
        lrows = labels.map_batches(label_rows, batch_format="pyarrow")
        msgs = (
            static_edges.union(lrows)
            .map_batches(part_by_key, batch_format="pyarrow")
            .groupby("part_id")
            .map_groups(deliver, batch_format="pyarrow")
        )
        labels = _grouped_min_labels(
            msgs, num_partitions, with_changed=count_mode
        ).materialize()
        if count_mode:
            if labels.sum("changed") == 0:
                break
        else:
            s = labels.sum("label")
            if s == prev_sum:
                break
            prev_sum = s
    if count_mode:
        labels = labels.select_columns(["node", "label"])
    return labels
