"""Sequence packing (context packing) for LLM training data.

The standard pretraining data layout concatenates the token streams of
all documents in a fixed global order and slices the stream into
fixed-capacity training contexts ("concat-and-chunk"). The assignment of
document -> context bin is a GLOBAL PREFIX SUM over per-doc token counts
— the one training-data op in this repo whose result depends on every
row before it, so it cannot be a per-batch map or a keyed groupby alone.

Distributed plan (two passes, text never shuffles):
 1. A skinny map_batches computes per-doc token counts and a range-part
    id (``doc_id // chunk`` — doc ids are the deterministic global
    order), immediately dropping the text column, so every later stage
    moves 24 bytes/doc.
 2. Per-part token sums reduce map-side through a tiny groupby; the
    P-row result (P = corpus/chunk; ~1.5M rows at 10^11 docs — MBs, not
    GBs) is turned into exclusive prefix offsets on the driver and
    broadcast ONCE via ``ray.put`` as two sorted numpy arrays.
 3. One hash shuffle co-locates each part; inside a part the docs sort
    by id, a local cumsum plus the broadcast part offset yields each
    doc's global start position, and ``start // capacity`` is its bin.

At 100 TB the only serial artifact is the P-row offset table; everything
else is per-part parallel. ``chunk`` is the scale knob: keep parts at
~64Ki docs so the offset table stays small and per-group work stays
batched (the test-scale default of 256 exercises the multi-part merge on
the 500-doc fixtures).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from rayrep.ops.text import whitespace_token_counts


def pack_sequences_ds(
    ds: rd.Dataset,
    capacity: int = 2048,
    chunk: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """Assign each document to its concat-and-chunk context bin.

    Returns a Dataset of (id_col, n_tokens, bin_id) where bin_id =
    (sum of n_tokens of all docs with smaller id) // capacity.
    """

    def counts(t: pa.Table) -> pa.Table:
        ids = t.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        n_tok = whitespace_token_counts(t.column(text_col))
        part = (ids.to_numpy() // chunk).astype(np.int64)
        return pa.table({id_col: ids, "n_tokens": n_tok,
                         "part_id": pa.array(part)})

    skinny = ds.map_batches(counts, batch_format="pyarrow")

    from ray.data.aggregate import Sum

    sums = (
        skinny.select_columns(["part_id", "n_tokens"])
        .groupby("part_id")
        .aggregate(Sum("n_tokens", alias_name="s"))
        .to_pandas()
        .sort_values("part_id")
    )
    part_ids = sums["part_id"].to_numpy(np.int64)
    totals = sums["s"].to_numpy(np.int64)
    offsets = np.concatenate([[0], np.cumsum(totals)[:-1]]).astype(np.int64)
    offs_ref = ray.put((part_ids, offsets))

    def pack(group: pa.Table) -> pa.Table:
        pids, offs = ray.get(offs_ref)
        ids = group.column(id_col).to_numpy()
        toks = group.column("n_tokens").to_numpy()
        order = np.argsort(ids, kind="stable")
        start = np.empty(len(ids), np.int64)
        start[order] = np.cumsum(toks[order]) - toks[order]
        part = int(group.column("part_id")[0].as_py())
        start += offs[np.searchsorted(pids, part)]
        return pa.table({
            id_col: pa.array(ids),
            "n_tokens": pa.array(toks),
            "bin_id": pa.array(start // capacity),
        })

    return skinny.groupby("part_id").map_groups(pack, batch_format="pyarrow")
