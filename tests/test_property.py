"""Property-based testing of the LWW apply core (hypothesis).

Random event sequences — arbitrary interleavings of I/U/D over a small
key space with adversarial timestamps (ties, inversions, equal values) —
must converge identically to the sequential oracle, both in final rows
and counters. This explores corners the deterministic generator can't
(e.g. D as first event, long conflict chains, all-events-tie)."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings, strategies as st

from rayrep.apply import Applier
from rayrep.gen import T0_US
from rayrep.schema import CANONICAL_SCHEMA_V2, CHANGELOG_SCHEMA, SchemaVersion

from .oracle import replay_oracle

KEYS = [("a", 0), ("a", 1), ("b", 0)]

event_st = st.tuples(
    st.sampled_from(["I", "U", "D"]),
    st.integers(0, len(KEYS) - 1),
    st.integers(0, 5),           # coarse ts → many ties
)


def build_changelog(events) -> pa.Table:
    rows = []
    for seq, (op, ki, ts) in enumerate(events):
        conv, turn = KEYS[ki]
        rows.append({
            "seq": seq, "txn_id": 0, "op": op, "schema_ver": 2,
            "conv_id": conv, "turn_idx": turn,
            "role": None if op == "D" else "user",
            "text": None if op == "D" else f"{conv}{turn}-{seq}",
            "tool": None, "ts": T0_US + ts * 1_000_000, "ddl": None,
        })
    return pa.Table.from_pylist(rows, schema=CHANGELOG_SCHEMA)


@settings(max_examples=120, deadline=None)
@given(st.lists(event_st, min_size=1, max_size=30))
def test_lww_apply_matches_sequential_oracle(tmp_path_factory, events):
    """Engine's vectorized per-partition apply == one-at-a-time replay,
    for ANY op/ts interleaving."""
    cl = build_changelog(events)
    lake = str(tmp_path_factory.mktemp("lake"))

    # run the applier directly on one partition (no Ray needed: the class
    # is plain Python; the Ray path shares this exact code)
    tbl = cl.append_column("part_id", pa.array([0] * cl.num_rows, pa.int32()))
    app = Applier(lake, 0, SchemaVersion(2, CANONICAL_SCHEMA_V2).to_json(),
                  delta_output=False)
    summary = app(tbl)
    ctr = {k: summary[k][0].as_py() for k in
           ["input_rows", "applied", "skipped", "conflict", "deleted"]}

    odf, octr = replay_oracle(cl)
    assert ctr == octr, f"counters {ctr} != oracle {octr}"

    import glob

    state = pq.read_table(glob.glob(os.path.join(lake, "part-*", "state-*.parquet"))[0])
    live = state.filter(pa.compute.invert(state["__deleted"])).to_pandas()
    live = live.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(live) == len(odf)
    if len(odf):
        pd.testing.assert_series_equal(
            live["text"].reset_index(drop=True),
            odf["text"].reset_index(drop=True),
            check_names=False,
        )


@settings(max_examples=60, deadline=None)
@given(st.lists(event_st, min_size=1, max_size=30),
       st.lists(st.integers(0, 3), min_size=30, max_size=30))
def test_combined_apply_matches_oracle_for_any_batching(
    tmp_path_factory, events, batch_of
):
    """Map-side combining must reproduce the sequential oracle's rows AND
    counters for ANY assignment of events to source batches — batch
    boundaries are where combiner bugs hide (a batch-local winner can be a
    global loser and vice versa). Events keep their seq order inside each
    batch, like real epoch slices."""
    from rayrep.augment import Augmenter
    from rayrep.combine import combine_batch

    cl = build_changelog(events)
    sv = SchemaVersion(2, CANONICAL_SCHEMA_V2)
    aug = Augmenter(sv.to_json(), 1)
    groups: dict[int, list[int]] = {}
    for i in range(cl.num_rows):
        groups.setdefault(batch_of[i], []).append(i)
    parts = []
    for _, idxs in sorted(groups.items()):
        b = cl.take(pa.array(idxs, pa.int64()))
        parts.append(combine_batch(aug(b), by_day=True))
    group = pa.concat_tables(parts)

    lake = str(tmp_path_factory.mktemp("lakec"))
    app = Applier(lake, 0, sv.to_json(), delta_output=False)
    summary = app(group)
    ctr = {k: summary[k][0].as_py() for k in
           ["input_rows", "applied", "skipped", "conflict", "deleted"]}
    odf, octr = replay_oracle(cl)
    assert ctr == octr, f"counters {ctr} != oracle {octr}"

    def live(lakedir):
        from rayrep.apply import fold_state_chain
        from rayrep.manifests import PartitionManifest

        chain = PartitionManifest.load(lakedir, 0).state_chain
        s = fold_state_chain(lakedir, chain, sv)
        df = s.filter(pa.compute.invert(s["__deleted"])).to_pandas()
        return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    got = live(lake)
    assert len(got) == len(odf)
    if len(odf):
        pd.testing.assert_series_equal(got["text"].reset_index(drop=True),
                                       odf["text"].reset_index(drop=True),
                                       check_names=False)


@settings(max_examples=60, deadline=None)
@given(st.lists(event_st, min_size=1, max_size=30),
       st.lists(st.integers(0, 30), min_size=0, max_size=4),
       st.randoms(use_true_random=False))
def test_combined_daily_delta_matches_per_event_path(
    tmp_path_factory, events, cuts, rnd
):
    """The daily-delta side output (S7) must be IDENTICAL between the
    per-event path and the combined path for any CONTIGUOUS level-1
    batching (the real read-path contract: batches are in-order parquet
    slices) — including the second-level combine over an ARBITRARILY
    ORDERED union of those slices, where cross-range ts inversions can
    kill a later range's group argmax (the case level 2's prefix-max
    retention exists for)."""
    import glob

    from rayrep.augment import Augmenter
    from rayrep.combine import combine_batch, combine_combined

    cl = build_changelog(events)
    sv = SchemaVersion(2, CANONICAL_SCHEMA_V2)

    def read_deltas(lakedir):
        files = sorted(glob.glob(os.path.join(lakedir, "delta", "p*", "e*.parquet")))
        if not files:
            return pd.DataFrame(columns=["conv_id", "turn_idx", "change_date",
                                         "seq", "text"])
        df = pa.concat_tables([pq.read_table(f) for f in files]).to_pandas()
        return (df[["conv_id", "turn_idx", "change_date", "seq", "text"]]
                .sort_values(["conv_id", "turn_idx", "change_date"])
                .reset_index(drop=True))

    # per-event path
    lake_pe = str(tmp_path_factory.mktemp("pe"))
    tbl = cl.append_column("part_id", pa.array([0] * cl.num_rows, pa.int32()))
    Applier(lake_pe, 0, sv.to_json(), delta_output=True)(tbl)

    # combined path: contiguous slices, combined per slice, then the
    # second level over a shuffled (non-contiguous) union of the slices
    aug = Augmenter(sv.to_json(), 1)
    bounds = sorted({0, cl.num_rows, *[min(c, cl.num_rows) for c in cuts]})
    parts = [
        combine_batch(aug(cl.slice(a, b - a)), by_day=True)
        for a, b in zip(bounds, bounds[1:]) if b > a
    ]
    rnd.shuffle(parts)
    group = combine_combined(pa.concat_tables(parts).combine_chunks(),
                             keep_all_pmax=True)
    lake_cb = str(tmp_path_factory.mktemp("cb"))
    app = Applier(lake_cb, 0, sv.to_json(), delta_output=True)
    summary = app(group)

    pd.testing.assert_frame_equal(read_deltas(lake_pe), read_deltas(lake_cb))
    # counters must also match the sequential oracle
    _, octr = replay_oracle(cl)
    ctr = {k: summary[k][0].as_py() for k in
           ["input_rows", "applied", "skipped", "conflict", "deleted"]}
    assert ctr == octr


cc_event_st = st.tuples(
    st.sampled_from(["I", "U", "D"]),
    st.integers(0, len(KEYS) - 1),
    st.integers(0, 5),
    st.integers(0, 2),  # cell mask: 0=both, 1=text only, 2=role only
)


def build_cc_changelog(events) -> pa.Table:
    rows = []
    for seq, (op, ki, ts, mask) in enumerate(events):
        conv, turn = KEYS[ki]
        text = None if (op == "D" or mask == 2) else f"{conv}{turn}-{seq}"
        role = None if (op == "D" or mask == 1) else f"r{seq}"
        rows.append({
            "seq": seq, "txn_id": 0, "op": op, "schema_ver": 2,
            "conv_id": conv, "turn_idx": turn, "role": role, "text": text,
            "tool": None, "ts": T0_US + ts * 1_000_000, "ddl": None,
        })
    return pa.Table.from_pylist(rows, schema=CHANGELOG_SCHEMA)


@settings(max_examples=80, deadline=None)
@given(st.lists(cc_event_st, min_size=1, max_size=30),
       st.integers(0, 30))
def test_changed_cells_delta_path_matches_oracle(tmp_path_factory, events, split):
    """Changed-cells DELTA path (round 3): partial updates applied as
    per-epoch chain deltas + read-time cell fold must equal the sequential
    merging oracle for any I/U/D interleaving, any cell mask, any epoch
    split — including compaction (interval 1 forces a cells fold every
    epoch on the second lake)."""
    from rayrep.apply import fold_state_chain_cells
    from rayrep.manifests import PartitionManifest

    cl = build_cc_changelog(events)
    sv = SchemaVersion(2, CANONICAL_SCHEMA_V2)
    split = min(split, cl.num_rows)
    odf, octr = replay_oracle(cl, changed_cells=True)

    for interval in (4, 1):
        lake = str(tmp_path_factory.mktemp(f"cc{interval}"))
        ctr = {"input_rows": 0, "applied": 0, "skipped": 0, "conflict": 0,
               "deleted": 0}
        for epoch, chunk in ((0, cl.slice(0, split)), (1, cl.slice(split))):
            if chunk.num_rows == 0:
                continue
            t = chunk.append_column("part_id", pa.array([0] * chunk.num_rows, pa.int32()))
            s = Applier(lake, epoch, sv.to_json(), changed_cells=True,
                        delta_output=False, compact_interval=interval)(t)
            for k in ctr:
                ctr[k] += s[k][0].as_py()
        assert ctr == octr, f"counters {ctr} != oracle {octr}"
        chain = PartitionManifest.load(lake, 0).state_chain
        state = fold_state_chain_cells(lake, chain, sv)
        live = state.filter(pa.compute.invert(state["__deleted"])).to_pandas()
        live = live.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        assert len(live) == len(odf)
        if len(odf):
            for col in ("text", "role"):
                pd.testing.assert_series_equal(
                    live[col].reset_index(drop=True),
                    odf[col].reset_index(drop=True), check_names=False)


@settings(max_examples=40, deadline=None)
@given(st.lists(event_st, min_size=1, max_size=20),
       st.lists(event_st, min_size=0, max_size=20))
def test_incremental_epochs_equal_single_shot(tmp_path_factory, ev1, ev2):
    """Applying [epoch1, epoch2] incrementally equals applying the
    concatenated stream in one shot — the manifests/state handoff loses
    nothing for any split point."""
    all_events = ev1 + ev2
    cl_all = build_changelog(all_events)
    cl1 = cl_all.slice(0, len(ev1))
    cl2 = cl_all.slice(len(ev1), len(ev2))
    sv = SchemaVersion(2, CANONICAL_SCHEMA_V2).to_json()

    lake_inc = str(tmp_path_factory.mktemp("li"))
    for epoch, chunk in ((0, cl1), (1, cl2)):
        if chunk.num_rows == 0:
            continue
        t = chunk.append_column("part_id", pa.array([0] * chunk.num_rows, pa.int32()))
        Applier(lake_inc, epoch, sv, delta_output=False)(t)

    lake_one = str(tmp_path_factory.mktemp("lo"))
    t = cl_all.append_column("part_id", pa.array([0] * cl_all.num_rows, pa.int32()))
    Applier(lake_one, 0, sv, delta_output=False)(t)

    def live(lake):
        from rayrep.apply import fold_state_chain
        from rayrep.manifests import PartitionManifest
        from rayrep.schema import CANONICAL_SCHEMA_V2 as V2

        chain = PartitionManifest.load(lake, 0).state_chain
        s = fold_state_chain(lake, chain, SchemaVersion(2, V2))
        df = s.filter(pa.compute.invert(s["__deleted"])).to_pandas()
        return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    a, b = live(lake_inc), live(lake_one)
    pd.testing.assert_frame_equal(a[["conv_id", "turn_idx", "text"]],
                                  b[["conv_id", "turn_idx", "text"]])


# --------------------------------------------------------------------------
# Sketch mergeability (pure kernels, no Ray): for ANY split of the rows
# into batches, merging the per-batch partials yields the same result as
# one batch — the property that makes the sketches shuffle-safe.
# --------------------------------------------------------------------------

@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.tuples(st.sampled_from(["a", "b", "c"]),
                       st.integers(min_value=0, max_value=200)),
             min_size=1, max_size=120),
    st.integers(min_value=1, max_value=6),
    st.randoms(use_true_random=False),
)
def test_kmv_partial_merge_invariant(rows, n_splits, rnd):
    import pyarrow as pa

    from rayrep.ops.sketch import _TWO64, _kmv_partial

    k = 8

    def table(rws):
        return pa.table({"g": pa.array([r[0] for r in rws]),
                         "v": pa.array([r[1] for r in rws], pa.int64())})

    def finalize(parts):
        import numpy as np
        import pandas as pd

        df = pa.concat_tables(parts).to_pandas()
        out = {}
        for g, grp in df.groupby("g"):
            hv = np.unique(grp["__kmv_hash"].to_numpy())
            out[g] = (float(len(hv)) if len(hv) < k
                      else float(k - 1) * _TWO64 / float(hv[k - 1]))
        return out

    single = finalize([_kmv_partial(table(rows), group_col="g",
                                    value_col="v", k=k)])
    # random contiguous split into n_splits pieces
    idx = sorted(rnd.sample(range(1, len(rows)), min(n_splits - 1, len(rows) - 1))) \
        if len(rows) > 1 else []
    pieces, prev = [], 0
    for i in idx + [len(rows)]:
        if i > prev:
            pieces.append(rows[prev:i])
        prev = i
    split = finalize([_kmv_partial(table(p), group_col="g", value_col="v", k=k)
                      for p in pieces])
    assert single == split


@settings(max_examples=40, deadline=None)
@given(st.lists(st.lists(event_st, min_size=1, max_size=8),
                min_size=1, max_size=8))
def test_fold_state_chain_collapse_schedule_invariant(tmp_path_factory,
                                                     file_events):
    """The incremental chain fold's memory bound (collapse whenever the
    accumulator crosses ``collapse_rows``) must not change the result:
    positional-last-per-key is associative under ordered concatenation,
    so collapse_rows=1 (collapse after EVERY file — the deliberately
    oversized-partition schedule) must equal the one-shot fold for ANY
    chain of state files."""
    from rayrep.apply import fold_state_chain, state_schema

    sv = SchemaVersion(2, CANONICAL_SCHEMA_V2)
    lake = str(tmp_path_factory.mktemp("lakef"))
    chain = []
    seq = 0
    for fi, events in enumerate(file_events):
        rows = []
        for op, ki, ts in events:
            conv, turn = KEYS[ki]
            rows.append({
                "conv_id": conv, "turn_idx": turn,
                "role": None if op == "D" else "user",
                "text": None if op == "D" else f"{conv}{turn}-{seq}",
                "tool": None, "ts": T0_US + ts * 1_000_000,
                "__seq": seq, "__deleted": op == "D",
            })
            seq += 1
        t = pa.Table.from_pylist(rows, schema=state_schema(sv))
        fp = f"state-{fi:05d}.parquet"
        pq.write_table(t, os.path.join(lake, fp))
        chain.append(fp)
    oneshot = fold_state_chain(lake, chain, sv, collapse_rows=10**9)
    stepped = fold_state_chain(lake, chain, sv, collapse_rows=1)
    assert oneshot.equals(stepped)


# ---------------------------------------------------- prune_cells algebra
# the compaction contract prune_cells' docstring states:
#   fold_cells(prune_cells(prefix) ∪ suffix) ≡ fold_cells(prefix ∪ suffix)
# for ANY suffix — i.e. pruning a chain prefix is invisible to the
# per-cell fold no matter what arrives later (late older-ts writes,
# deletes, resurrections). Also idempotence and nested prunes (a chain
# compacted several times).

cc_state_row_st = st.tuples(
    st.integers(0, len(KEYS) - 1),   # key
    st.integers(0, 5),               # coarse ts (many ties)
    st.booleans(),                   # deleted
    st.integers(0, 2),               # text mask: 0=value 1=null
    st.integers(0, 2),               # role mask
)


def build_cc_state(rows, seq0=0) -> pa.Table:
    data = []
    for i, (ki, ts, dead, tmask, rmask) in enumerate(rows):
        conv, turn = KEYS[ki]
        seq = seq0 + i
        data.append({
            "conv_id": conv, "turn_idx": turn,
            "role": None if (dead or rmask == 1) else f"r{seq}",
            "text": None if (dead or tmask == 1) else f"t{seq}",
            "ts": T0_US + ts * 1_000_000,
            "__seq": seq, "__deleted": bool(dead),
        })
    return pa.Table.from_pylist(data, schema=pa.schema([
        pa.field("conv_id", pa.string()), pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()), pa.field("text", pa.string()),
        pa.field("ts", pa.timestamp("us")),
        pa.field("__seq", pa.int64()), pa.field("__deleted", pa.bool_()),
    ]))


_CC_PAYLOAD = ["conv_id", "turn_idx", "role", "text", "ts"]


def _fold_df(tbl: pa.Table) -> pd.DataFrame:
    from rayrep.apply import fold_cells

    df = fold_cells(tbl, _CC_PAYLOAD).to_pandas()
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


@settings(max_examples=150, deadline=None)
@given(st.lists(cc_state_row_st, min_size=1, max_size=24),
       st.integers(0, 24), st.integers(0, 24))
def test_prune_cells_invisible_to_fold_for_any_suffix(rows, cut1, cut2):
    from rayrep.apply import _live_count_cells, prune_cells

    tbl = build_cc_state(rows)
    n = tbl.num_rows
    a, b = sorted((min(cut1, n), min(cut2, n)))
    p1, p2, p3 = tbl.slice(0, a), tbl.slice(a, b - a), tbl.slice(b)
    whole = _fold_df(tbl)
    # single prune at any point
    pruned = prune_cells(pa.concat_tables([p1, p2]), _CC_PAYLOAD)
    pd.testing.assert_frame_equal(
        _fold_df(pa.concat_tables([pruned, p3])), whole)
    # nested prune (chain compacted twice)
    nested = prune_cells(
        pa.concat_tables([prune_cells(p1, _CC_PAYLOAD), p2]), _CC_PAYLOAD)
    pd.testing.assert_frame_equal(
        _fold_df(pa.concat_tables([nested, p3])), whole)
    # idempotence + bounded size: ≤ n_payload_cols + 2 rows per key
    again = prune_cells(pruned, _CC_PAYLOAD)
    assert again.num_rows == pruned.num_rows
    n_keys = len({(k, t) for k, t in zip(
        pruned.column("conv_id").to_pylist(),
        pruned.column("turn_idx").to_pylist())})
    assert pruned.num_rows <= n_keys * (len(_CC_PAYLOAD) - 3 + 2)
    # live-key count over the pruned set equals the fold's live rows
    assert _live_count_cells(pruned) == int(
        (~_fold_df(pruned)["__deleted"]).sum())


@settings(max_examples=60, deadline=None)
@given(st.lists(st.lists(cc_state_row_st, min_size=1, max_size=8),
                min_size=1, max_size=6))
def test_cells_chain_collapse_schedule_invariant(tmp_path_factory,
                                                 file_rows):
    """The per-cell chain loader's incremental prune-collapse must be
    invisible: collapse after EVERY file (collapse_rows=1) == one-shot
    whole-chain load, through both the read fold and the rewrite prune,
    for ANY chain of per-cell state files."""
    from rayrep.apply import _chain_tables, fold_cells, prune_cells

    sv = SchemaVersion(2, CANONICAL_SCHEMA_V2)
    lake = str(tmp_path_factory.mktemp("lakec"))
    chain, seq = [], 0
    for fi, rows in enumerate(file_rows):
        t = build_cc_state(rows, seq0=seq)
        seq += t.num_rows
        # state files carry the full canonical payload; add `tool` as null
        t = t.add_column(4, pa.field("tool", pa.string()),
                         pa.nulls(t.num_rows, pa.string()))
        fp = f"state-{fi:05d}.parquet"
        pq.write_table(t, os.path.join(lake, fp))
        chain.append(fp)
    payload = [f.name for f in sv.schema]
    one = _chain_tables(lake, chain, sv, collapse_rows=10**9)
    stepped = _chain_tables(lake, chain, sv, collapse_rows=1)

    def norm(tbl):
        df = fold_cells(tbl, payload).to_pandas()
        return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    pd.testing.assert_frame_equal(norm(one), norm(stepped))
    pd.testing.assert_frame_equal(norm(prune_cells(one, payload)),
                                  norm(prune_cells(stepped, payload)))


@settings(max_examples=150, deadline=None)
@given(st.lists(event_st, min_size=1, max_size=30),
       st.integers(0, 30), st.integers(0, 30))
def test_log_compaction_prefix_invisible_to_replay(events, cut1, cut2):
    """Kafka-style row compaction invariant (rayrep/logcompact.py):
    ``replay(retain_latest(prefix) ∪ suffix) == replay(prefix ∪ suffix)``
    on the FINAL STATE, for any split point and even nested compactions —
    retention keeps exactly the prefix's converged image, and the
    sequential-win continuation depends only on state."""
    from rayrep.logcompact import retain_latest

    tbl = build_changelog(events)
    expect, _ = replay_oracle(tbl)

    def compact_at(t: pa.Table, cut: int) -> pa.Table:
        cut = min(cut, t.num_rows)
        prefix, suffix = t.slice(0, cut), t.slice(cut)
        if prefix.num_rows == 0:
            return t
        return pa.concat_tables([retain_latest(prefix), suffix])

    once = compact_at(tbl, cut1)
    got1, _ = replay_oracle(once)
    pd.testing.assert_frame_equal(got1, expect)
    # nested: recompact a (possibly different) prefix of the compacted log
    twice = compact_at(once, cut2)
    got2, _ = replay_oracle(twice)
    pd.testing.assert_frame_equal(got2, expect)
