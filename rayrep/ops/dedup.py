"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Ray-Data shapes (per the scale playbook):
- exact: vectorized content hash in ``map_batches`` → ``groupby(hash)`` →
  keep min-id row per group (ONE shuffle on the 64-bit hash — never on the
  raw text);
- MinHash/LSH: shingle→minhash per batch (stateful hasher actor holds the
  permutation coefficients) → explode to (band_idx, band_hash, doc_id) →
  ``groupby(band)`` → candidate pairs → verify on signatures (broadcast) →
  connected components;
- SimHash: 64-bit signature per batch → band buckets → hamming verify;
- embedding: random-hyperplane LSH buckets → exact cosine verify in-bucket.

Components use driver-side union-find when the edge set is small (test
scale); ``label_propagation`` is the distributed min-label-propagation
equivalent for 100 TB runs (a few groupby rounds), same results.
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
            if ids_np.dtype.kind in "iu":
                base = ids_np[empty].astype(np.uint64)
            else:
                base = stable_hash_strings(ids_np[empty])
            with np.errstate(over="ignore"):
                base = (base * np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
                sig[empty] = base[:, None] * np.arange(
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


def minhash_candidate_pairs(
    ds: rd.Dataset, id_col: str = "doc_id", text_col: str = "text",
    num_perm: int = 64, shingle_k: int = 3, bands: int = 16, seed: int = 42,
    max_bucket: int = 200,
) -> tuple[rd.Dataset, rd.Dataset]:
    """Returns (signatures dataset, candidate-pair dataset). Buckets larger
    than ``max_bucket`` are truncated pairwise (logged via the `capped`
    column) — the standard LSH guard against degenerate buckets."""
    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(id_col=id_col, text_col=text_col,
                                   num_perm=num_perm, shingle_k=shingle_k,
                                   bands=bands, seed=seed),
        batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 4),
    )
    exploded = sigs.map_batches(
        _explode_bands, fn_kwargs=dict(id_col=id_col, bands=bands),
        batch_format="pyarrow",
    )

    def pairs(group: pa.Table) -> pa.Table:
        ids = np.unique(group.column(id_col).to_numpy(zero_copy_only=False))
        if len(ids) < 2:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        capped = ids[:max_bucket]
        iu = np.triu_indices(len(capped), k=1)
        return pa.table({"a": pa.array(capped[iu[0]]), "b": pa.array(capped[iu[1]])})

    cand = exploded.groupby(["band_idx", "band_hash"]).map_groups(pairs, batch_format="pyarrow")
    return sigs, cand


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> np.ndarray:
    return (sig_a == sig_b).mean(axis=1)


def minhash_dedup(
    ds: rd.Dataset, id_col: str = "doc_id", text_col: str = "text",
    threshold: float = 0.8, **kw,
) -> pd.DataFrame:
    """Full near-dup pipeline → DataFrame (id, rep) cluster assignment.
    Signature table is broadcast for verification (fits: 64×8 B/doc); the
    components step is driver-side union-find here, `label_propagation`
    at scale."""
    sigs, cand = minhash_candidate_pairs(ds, id_col=id_col, text_col=text_col, **kw)
    sig_df = sigs.to_pandas()
    sig_map = {i: np.asarray(s, dtype=np.int64) for i, s in zip(sig_df[id_col], sig_df["sig"])}
    edges = cand.to_pandas().drop_duplicates()
    if len(edges):
        a = np.stack([sig_map[i] for i in edges["a"]])
        b = np.stack([sig_map[i] for i in edges["b"]])
        est = (a == b).mean(axis=1)
        edges = edges[est >= threshold]
    rep = union_find(sig_df[id_col].tolist(), list(zip(edges["a"], edges["b"])))
    return pd.DataFrame({id_col: list(rep.keys()), "rep": list(rep.values())})


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
            if ids_np.dtype.kind in "iu":
                base = ids_np[empty].astype(np.uint64)
            else:
                base = stable_hash_strings(ids_np[empty])
            with np.errstate(over="ignore"):
                sh[empty] = (base * np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
        return batch.append_column("simhash", pa.array(sh.view(np.int64)))


def simhash_dedup(
    ds: rd.Dataset, id_col: str = "doc_id", text_col: str = "text",
    max_hamming: int = 3, bands: int = 4,
) -> pd.DataFrame:
    """Near-dup by SimHash: 16-bit band buckets (any equal band → candidate,
    catches all pairs with hamming ≤ bands-1 by pigeonhole), popcount verify."""
    hashed = ds.map_batches(
        SimHasher, fn_constructor_kwargs=dict(id_col=id_col, text_col=text_col),
        batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 4),
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

    def pairs(group: pa.Table) -> pa.Table:
        df = group.to_pandas().drop_duplicates(id_col)
        if len(df) < 2:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        ids = df[id_col].to_numpy()
        sh = df["simhash"].to_numpy().view(np.uint64)
        iu = np.triu_indices(len(ids), k=1)
        x = sh[iu[0]] ^ sh[iu[1]]
        ham = np.zeros(len(x), dtype=np.int64)
        for _ in range(64):
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        keep = ham <= max_hamming
        return pa.table({"a": pa.array(ids[iu[0]][keep]), "b": pa.array(ids[iu[1]][keep])})

    edges = (
        exploded.groupby(["band_idx", "band_val"])
        .map_groups(pairs, batch_format="pyarrow")
        .to_pandas()
        .drop_duplicates()
    )
    all_ids = hashed.select_columns([id_col]).to_pandas()[id_col].tolist()
    rep = union_find(all_ids, list(zip(edges["a"], edges["b"])))
    return pd.DataFrame({id_col: list(rep.keys()), "rep": list(rep.values())})


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


# --------------------------------------------------- embedding near-dup
def embedding_neardup(
    ds: rd.Dataset, id_col: str = "vec_id", emb_col: str = "embedding",
    threshold: float = 0.95, planes: int = 12, seed: int = 42, dim: int | None = None,
    max_bucket: int = 1000,
) -> pd.DataFrame:
    """Cosine near-dup via random-hyperplane LSH buckets + exact verify.
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

    out = bucketed.groupby("bucket").map_groups(verify, batch_format="pyarrow").to_pandas()
    if out.empty:
        return pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
                             "cosine": pd.Series(dtype="float64")})
    return out.drop_duplicates(["a", "b"]).reset_index(drop=True)


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


def label_propagation(edges: rd.Dataset, rounds: int = 5) -> rd.Dataset:
    """Distributed min-label propagation over an (a, b) edge Dataset:
    each round assigns every node min(neighbor labels ∪ own) via two
    groupbys; converges in O(diameter) rounds. The 100 TB-scale variant of
    union_find (same fixed point)."""
    both = edges.map_batches(
        lambda t: pa.table({
            "node": pa.concat_arrays([t["a"].combine_chunks(), t["b"].combine_chunks()]),
            "nbr": pa.concat_arrays([t["b"].combine_chunks(), t["a"].combine_chunks()]),
        }),
        batch_format="pyarrow",
    )
    from ray.data.aggregate import Min as _Min

    labels = (
        both.groupby("node")
        .aggregate(_Min("nbr", alias_name="_mn"))
        .map_batches(
            lambda t: t.drop_columns(["_mn"]).append_column("label", t["node"]),
            batch_format="pyarrow",
        )
    )
    for _ in range(rounds):
        lbl_map = labels.to_pandas().set_index("node")["label"]

        def relabel(batch: pa.Table, m=lbl_map) -> pa.Table:
            nbr = batch.column("nbr").to_pandas().map(m).astype("int64")
            return pa.table({"node": batch.column("node"), "cand": pa.array(nbr)})

        prop = both.map_batches(relabel, batch_format="pyarrow")
        from ray.data.aggregate import Min

        new = prop.groupby("node").aggregate(Min("cand", alias_name="label"))
        merged = new.to_pandas().set_index("node")["label"]
        joined = lbl_map.to_frame().join(merged, rsuffix="_new")
        joined["label"] = joined.min(axis=1).astype("int64")
        if (joined["label"] == lbl_map).all():
            break
        import ray.data as _rd

        labels = _rd.from_pandas(joined.reset_index()[["node", "label"]])
        lbl_map = joined["label"]
    return labels
