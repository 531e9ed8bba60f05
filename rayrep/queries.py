"""Driver-conformance queries: each operator from SURVEY.md §2 (plus the
training-data ops) expressed over the driver's /root/testdata tables, with
matching ANSI-SQL oracles for DuckDB (FIXTURES.md §5).

Column-name discipline: every computed column is named identically in the
Ray pipeline and the SQL (the driver's compare sorts columns by name and
hashes values). Float aggregates are rounded to 3 decimals ON BOTH SIDES
so summation-order differences can't flip the hash.

Each callable takes ``sf_dir`` and returns a Dataset / DataFrame / Table.
None of them calls ray.init (driver owns the session).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

# mid-stream literal inside the events table's Jan-2024 span at every sf
TT_CUTOFF = "2024-01-15 00:00:00"
EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def _events(sf_dir: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=columns)


def _docs(sf_dir: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


_STAGE_CACHE: dict = {}


def _cached_stage(batch: pa.Table, cls_path: str) -> pa.Table:
    """Task-mode stateful stage: one cached instance per (worker process,
    class). For cheap-init classes (compiled regexes, stopword sets) this
    beats an actor pool — same per-actor-once setup via the process cache,
    but no pool spin-up/reservation, and elastic width (Ray reuses warm
    workers). Same pattern as the engine's task-mode applier."""
    inst = _STAGE_CACHE.get(cls_path)
    if inst is None:
        import importlib

        mod, name = cls_path.rsplit(".", 1)
        inst = getattr(importlib.import_module(mod), name)()
        _STAGE_CACHE[cls_path] = inst
    return inst(batch)


def _stage(ds: rd.Dataset, cls_path: str) -> rd.Dataset:
    return ds.map_batches(
        _cached_stage, fn_kwargs={"cls_path": cls_path},
        batch_format="pyarrow", zero_copy_batch=True,
    )


# ---------------------------------------------------------------- CDC core
def _latest_per_user(group: pa.Table) -> pa.Table:
    """Vectorized argmax-(ts, event_id) per user within a partition — the
    generic form of the applier's LWW reduction (J3/A4)."""
    idx = pc.sort_indices(
        group,
        sort_keys=[("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")],
    )
    g = group.take(idx)
    users = g.column("user_id").to_numpy()
    last = np.ones(len(users), dtype=bool)
    if len(users) > 1:
        last[:-1] = users[1:] != users[:-1]
    return g.filter(pa.array(last)).select(EVENT_COLS)


def _add_part(batch: pa.Table, num_partitions: int = 16, key: str = "user_id") -> pa.Table:
    pid = (batch.column(key).to_numpy() % num_partitions).astype(np.int32)
    return batch.append_column("part_id", pa.array(pid))


def cdc_lww_latest(sf_dir: str) -> rd.Dataset:
    """Latest row per user_id by (ts, event_id) — the engine's LWW upsert
    (J3) over the events changelog-analog. One hash shuffle on the key."""
    ds = _events(sf_dir)
    ds = ds.map_batches(_add_part, batch_format="pyarrow", zero_copy_batch=True)
    return ds.groupby("part_id").map_groups(_latest_per_user, batch_format="pyarrow")


def cdc_time_travel(sf_dir: str) -> rd.Dataset:
    """As-of reconstruction (J4): same LWW with ts <= T pushed to the read."""
    cutoff = pa.scalar(pd.Timestamp(TT_CUTOFF), pa.timestamp("us"))
    ds = _events(sf_dir)
    ds = ds.map_batches(
        lambda t, c=cutoff: t.filter(pc.less_equal(t["ts"], c)),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    ds = ds.map_batches(_add_part, batch_format="pyarrow")
    return ds.groupby("part_id").map_groups(_latest_per_user, batch_format="pyarrow")


def cdc_daily_counts(sf_dir: str) -> pd.DataFrame:
    """Daily-delta aggregation (S7/M8/A5): UTC yyyymmdd windows. Partial
    per-batch aggregation before the tiny groupby — the pre-aggregate
    pattern (A1)."""

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.strftime(batch.column("ts"), format="%Y%m%d")
        t = pa.table({
            "day": day, "event_type": batch.column("event_type"),
            "value": batch.column("value"),
        })
        agg = pa.TableGroupBy(t, ["day", "event_type"]).aggregate(
            [("value", "count"), ("value", "sum")]
        )
        return agg.rename_columns(["day", "event_type", "n", "sum_value"])

    ds = _events(sf_dir, columns=["ts", "event_type", "value"])
    partials = ds.map_batches(partial, batch_format="pyarrow")
    from ray.data.aggregate import Sum

    out = partials.groupby(["day", "event_type"]).aggregate(
        Sum("n", alias_name="n"), Sum("sum_value", alias_name="sum_value")
    ).to_pandas()
    out["sum_value"] = out["sum_value"].round(3)
    return out


def cdc_event_type_filter(sf_dir: str) -> pd.DataFrame:
    """Table-filter regex (M7, CHANGES.txt:41-42 analog) + per-type counts."""
    ds = _events(sf_dir, columns=["event_type"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.match_substring_regex(t["event_type"], r"^(click|view)$")),
        batch_format="pyarrow",
    )
    from ray.data.aggregate import Count

    return ds.groupby("event_type").aggregate(Count(alias_name="n")).to_pandas()


def cdc_counters(sf_dir: str) -> pd.DataFrame:
    """Per-table row/event counters (A1/T5): counts + distinct writers."""
    ds = _events(sf_dir, columns=["event_type", "user_id"])
    # exact distinct: per-batch local dedup (shrinks the shuffle), then a
    # two-level groupby — dedup pairs, count pairs per type. Arrow-native:
    # a grouped count IS a distinct-pairs projection
    pairs = ds.map_batches(
        lambda t: pa.TableGroupBy(t, ["event_type", "user_id"]).aggregate([])
        ,
        batch_format="pyarrow",
    )
    from ray.data.aggregate import Count

    distinct = (
        pairs.groupby(["event_type", "user_id"]).aggregate(Count(alias_name="c"))
        .groupby("event_type").aggregate(Count(alias_name="users")).to_pandas()
    )
    counts = ds.groupby("event_type").aggregate(Count(alias_name="n")).to_pandas()
    return counts.merge(distinct, on="event_type")


def event_value_stats(sf_dir: str) -> pd.DataFrame:
    """Per-type numeric profile: min/max/avg aggregates (A-class)."""
    from ray.data.aggregate import Count, Max, Mean, Min

    ds = _events(sf_dir, columns=["event_type", "value"])
    out = (
        ds.groupby("event_type")
        .aggregate(
            Count(alias_name="n"),
            Min("value", alias_name="min_value"),
            Max("value", alias_name="max_value"),
            Mean("value", alias_name="avg_value"),
        )
        .to_pandas()
    )
    out["avg_value"] = out["avg_value"].round(3)
    return out


def top_users(sf_dir: str) -> pd.DataFrame:
    """Grouped count → global top-k with deterministic tiebreak."""
    from ray.data.aggregate import Count

    ds = _events(sf_dir, columns=["user_id"])
    counts = ds.groupby("user_id").aggregate(Count(alias_name="n"))
    return (
        counts.sort(["n", "user_id"], descending=[True, False]).limit(10).to_pandas()
    )


def doc_len_buckets(sf_dir: str) -> pd.DataFrame:
    """Length histogram over documents: 100-char buckets (integer math →
    byte-stable across engines)."""

    def bucketize(batch: pa.Table) -> pa.Table:
        n = pc.utf8_length(batch.column("text")).cast(pa.int64())
        b = pc.divide(n, 100)
        return pa.table({"bucket": b})

    from ray.data.aggregate import Count

    ds = _docs(sf_dir, columns=["text"])
    return (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket").aggregate(Count(alias_name="n")).to_pandas()
    )


# ----------------------------------------------------- generic relational
def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def revenue(batch: pa.Table) -> pa.Table:
        disc = pc.multiply(
            batch.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), batch.column("l_discount"))
        )
        return batch.append_column("disc_price", disc)

    from ray.data.aggregate import Count, Sum

    out = (
        ds.map_batches(revenue, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_base_price"),
            Sum("disc_price", alias_name="sum_disc_price"),
            Count(alias_name="count_order"),
        )
        .to_pandas()
    )
    for c in ["sum_qty", "sum_base_price", "sum_disc_price"]:
        out[c] = out[c].round(3)
    return out


def top_orders(sf_dir: str) -> pd.DataFrame:
    ds = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    return (
        ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(10)
        .to_pandas()
    )


class _BroadcastLookup:
    """J2 broadcast-lookup stage: the small side is `ray.put` ONCE as two
    sorted numpy arrays (fetched per actor in __init__, never re-shipped
    per batch); each batch resolves values via np.searchsorted — no Python
    dict hashing per row."""

    def __init__(self, r, key_col: str, out_col: str):
        keys, vals = ray.get(r)
        self.keys, self.vals = keys, vals
        self.key_col, self.out_col = key_col, out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        k = batch.column(self.key_col).to_numpy()
        if len(self.keys) == 0:
            # inner-join vs an empty dim = no rows (searchsorted would
            # otherwise index keys[-1] on the empty array)
            out = batch.append_column(
                self.out_col, pa.nulls(batch.num_rows, pa.string())
            )
            return out.slice(0, 0)
        pos = np.minimum(np.searchsorted(self.keys, k), len(self.keys) - 1)
        hit = self.keys[pos] == k
        out = batch.append_column(self.out_col, pa.array(self.vals[pos]))
        if hit.all():  # FK-by-construction fast path
            return out
        # inner-join semantics: rows whose key is absent from the dim are
        # DROPPED, never silently assigned a neighboring key's value
        return out.filter(pa.array(hit))


def _broadcast_sorted(keys: np.ndarray, vals: np.ndarray):
    order = np.argsort(keys)
    return ray.put((keys[order], vals[order]))


_LOOKUP_CACHE: dict = {}


def _lookup_task_fn(batch: pa.Table, r, key_col: str, out_col: str) -> pa.Table:
    """Task-mode broadcast lookup with a per-process instance cache (same
    pattern as the engine's cached-task applier): `ray.get` on the
    broadcast ref is a zero-copy plasma lookup, and running as tasks lets
    Ray Data fuse the lookup with the parquet read and the downstream
    partial aggregation into one operator — an actor pool would break the
    fusion and reserve CPUs while idle."""
    key = (r.hex() if isinstance(r, ray.ObjectRef) else id(r), key_col, out_col)
    fn = _LOOKUP_CACHE.get(key)
    if fn is None:
        _LOOKUP_CACHE.clear()
        fn = _BroadcastLookup(r, key_col, out_col)
        _LOOKUP_CACHE[key] = fn
    return fn(batch)


def orders_by_segment(sf_dir: str) -> pd.DataFrame:
    """Broadcast join (J2 pattern): customer dim is ray.put once, looked up
    per batch — no shuffle join for a small side."""
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_mktsegment"]
    )
    ref = _broadcast_sorted(cust["c_custkey"].to_numpy(),
                            cust["c_mktsegment"].to_numpy(zero_copy_only=False))

    ds = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey", "o_totalprice"]
    )
    from ray.data.aggregate import Count, Sum

    out = (
        ds.map_batches(_lookup_task_fn,
                       fn_kwargs={"r": ref, "key_col": "o_custkey",
                                  "out_col": "c_mktsegment"},
                       batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Count(alias_name="n"), Sum("o_totalprice", alias_name="revenue"))
        .to_pandas()
    )
    out["revenue"] = out["revenue"].round(3)
    return out


def revenue_by_nation(sf_dir: str) -> pd.DataFrame:
    """Two chained broadcast lookups (customer → nation), pre-composed
    driver-side into ONE custkey→nation map — the multi-dim star-join
    without any shuffle."""
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
    )
    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    nk = nat["n_nationkey"].to_numpy()
    nv = nat["n_name"].to_numpy(zero_copy_only=False)
    no = np.argsort(nk)
    ck = cust["c_custkey"].to_numpy()
    cn = cust["c_nationkey"].to_numpy()
    names = nv[no][np.minimum(np.searchsorted(nk[no], cn), len(no) - 1)]
    ref = _broadcast_sorted(ck, names)

    ds = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey", "o_totalprice"]
    )
    from ray.data.aggregate import Count, Sum

    out = (
        ds.map_batches(_lookup_task_fn,
                       fn_kwargs={"r": ref, "key_col": "o_custkey",
                                  "out_col": "n_name"},
                       batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Count(alias_name="n"), Sum("o_totalprice", alias_name="revenue"))
        .to_pandas()
    )
    out["revenue"] = out["revenue"].round(3)
    return out


def top_orders_per_segment(sf_dir: str) -> pd.DataFrame:
    """Grouped top-k (§2.6): top-3 orders by price per market segment.
    Partial top-k per batch (each batch keeps only its local top-3 per
    segment) before the tiny grouped finalize — the shuffle carries at
    most 3 × segments rows per batch, never the orders table."""
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_mktsegment"]
    )
    ref = _broadcast_sorted(cust["c_custkey"].to_numpy(),
                            cust["c_mktsegment"].to_numpy(zero_copy_only=False))
    ds = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                         columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def topk(group: pa.Table, k: int = 3) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[("o_totalprice", "descending"),
                                                ("o_orderkey", "ascending")])
        return group.take(idx[:k]).select(["c_mktsegment", "o_orderkey", "o_totalprice"])

    looked = ds.map_batches(
        _lookup_task_fn,
        fn_kwargs={"r": ref, "key_col": "o_custkey",
                   "out_col": "c_mktsegment"},
        batch_format="pyarrow",
    )

    def local_prune(t: pa.Table, k: int = 3) -> pa.Table:
        seg = t.column("c_mktsegment").to_numpy(zero_copy_only=False)
        price = t.column("o_totalprice").to_numpy()
        okey = t.column("o_orderkey").to_numpy()
        codes, _ = pd.factorize(seg, sort=False)
        order = np.lexsort((okey, -price, codes))
        cs = codes[order]
        # rank within segment = position since segment start (cs is sorted)
        seg_start = np.ones(len(cs), dtype=bool)
        if len(cs) > 1:
            seg_start[1:] = cs[1:] != cs[:-1]
        start_pos = np.maximum.accumulate(np.where(seg_start, np.arange(len(cs)), 0))
        keep = (np.arange(len(cs)) - start_pos) < k
        return t.take(pa.array(order[keep]))

    out = (
        looked.map_batches(local_prune, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .map_groups(topk, batch_format="pyarrow")
        .to_pandas()
    )
    return out


def distinct_event_types(sf_dir: str) -> pd.DataFrame:
    """Distinct values (set-op surface; A5/unique). Per-batch local dedup
    before the tiny shuffle — never ships duplicates."""
    ds = _events(sf_dir, columns=["event_type"])
    local = ds.map_batches(
        lambda t: pa.table({"event_type": pc.unique(t["event_type"])}),
        batch_format="pyarrow",
    )
    from ray.data.aggregate import Count

    out = local.groupby("event_type").aggregate(Count(alias_name="c")).to_pandas()
    return out[["event_type"]]


def sample_orders(sf_dir: str) -> pd.DataFrame:
    """Deterministic sampling surface: stable-hash-based 10% sample —
    unlike random_sample(), identical across engines, so it oracles
    (sample = hash(o_orderkey) % 10 == 0 in both)."""
    ds = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                         columns=["o_orderkey", "o_totalprice"])

    def pick(batch: pa.Table) -> pa.Table:
        keys = batch.column("o_orderkey").to_numpy()
        return batch.filter(pa.array(keys % 10 == 0))

    return ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True).to_pandas()


def order_priority_revenue(sf_dir: str) -> pd.DataFrame:
    """Large×large join: lineitem ⋈ orders on orderkey — the one join shape
    where a broadcast is wrong (both sides shuffle). Expressed as ONE
    sort-shuffle co-group instead of Ray's hash-shuffle ``Dataset.join``
    (measured 5-10x slower here, and unsafe to re-execute in one session
    on Ray 2.49): both sides are tagged into a common skinny schema and
    hash-partitioned by key in a single groupby; each partition runs a
    vectorized searchsorted semi-join (the same `_cogroup_match` kernel
    every dedup attach uses) and reduces to per-priority partials in
    place, so the final exchange carries P × |priorities| rows. Per-
    priority partials use masked pairwise ``np.sum`` (not bincount's
    sequential accumulation) to keep cross-engine float error orders of
    magnitude below the 3-decimal rounding the oracle hash relies on."""
    P = 32
    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    od = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority"],
    )

    def tag_li(t: pa.Table) -> pa.Table:
        key = t.column("l_orderkey").to_numpy()
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        return pa.table({
            "part_id": pa.array((key % P).astype(np.int32)),
            "key": pa.array(key),
            "pri": pa.nulls(len(key), pa.string()),
            "rev": rev,
        })

    def tag_od(t: pa.Table) -> pa.Table:
        key = t.column("o_orderkey").to_numpy()
        return pa.table({
            "part_id": pa.array((key % P).astype(np.int32)),
            "key": pa.array(key),
            "pri": t.column("o_orderpriority"),
            "rev": pa.nulls(len(key), pa.float64()),
        })

    both = li.map_batches(tag_li, batch_format="pyarrow").union(
        od.map_batches(tag_od, batch_format="pyarrow"))

    def join_agg(group: pa.Table) -> pa.Table:
        from rayrep.ops.dedup import _cogroup_match

        pri_col = group.column("pri")
        is_right = pc.is_valid(pri_col).to_numpy(zero_copy_only=False)
        li_idx, ri_idx = _cogroup_match(group.column("key").to_numpy(), is_right)
        empty = pa.table({"o_orderpriority": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64()),
                          "revenue": pa.array([], pa.float64())})
        if len(li_idx) == 0:
            return empty
        pris = pri_col.to_numpy(zero_copy_only=False)[ri_idx]
        revs = group.column("rev").to_numpy(zero_copy_only=False)[li_idx]
        uniq, inv = np.unique(pris, return_inverse=True)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        s = np.array([revs[inv == j].sum() for j in range(len(uniq))])
        return pa.table({"o_orderpriority": pa.array(uniq.astype(object), pa.string()),
                         "n": pa.array(n), "revenue": pa.array(s)})

    from ray.data.aggregate import Sum

    parts = both.groupby("part_id").map_groups(join_agg, batch_format="pyarrow")
    out = (
        parts.groupby("o_orderpriority")
        .aggregate(Sum("n", alias_name="n"), Sum("revenue", alias_name="revenue"))
        .to_pandas()
    )
    out["n"] = out["n"].astype(np.int64)
    out["revenue"] = out["revenue"].round(3)
    return out


def orders_expensive_item_counts(sf_dir: str) -> pd.DataFrame:
    """Large×large LEFT OUTER join: every order keeps a row even when no
    lineitem survives the price filter (n_items=0, revenue=0) — the outer
    semantics the inner co-group queries never exercise. Same ONE-shuffle
    tagged-union co-group as ``order_priority_revenue``; the right side is
    filtered at the read (only expensive items leave storage) and reduced
    per key with sort+reduceat inside each partition; left keys that miss
    get zeros via a searchsorted membership probe. No second shuffle: an
    order lives in exactly one partition, so partition outputs concatenate
    into the final result."""
    P = 32
    THR = 40_000.0
    od = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                         columns=["o_orderkey"])
    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def tag_od(t: pa.Table) -> pa.Table:
        key = t.column("o_orderkey").to_numpy()
        return pa.table({
            "part_id": pa.array((key % P).astype(np.int32)),
            "key": pa.array(key),
            "rev": pa.nulls(len(key), pa.int64()),  # null rev = left side
        })

    def tag_li(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("l_extendedprice"), THR))
        key = t.column("l_orderkey").to_numpy()
        # Fixed-point 1e-4 revenue (the daily_revenue pattern): floor of the
        # identical IEEE product as int64, summed EXACTLY in any arrival
        # order — a float64 reduceat in nondeterministic within-key order can
        # flip round(,3) at a .0005 boundary and break the oracle hash.
        rev = (t.column("l_extendedprice").to_numpy(zero_copy_only=False)
               * (1.0 - t.column("l_discount").to_numpy(zero_copy_only=False)))
        return pa.table({
            "part_id": pa.array((key % P).astype(np.int32)),
            "key": pa.array(key),
            "rev": pa.array(np.floor(rev * 10000.0).astype(np.int64)),
        })

    both = od.map_batches(tag_od, batch_format="pyarrow").union(
        li.map_batches(tag_li, batch_format="pyarrow"))

    def outer_join(group: pa.Table) -> pa.Table:
        rev_col = group.column("rev")
        is_left = pc.is_null(rev_col).to_numpy(zero_copy_only=False)
        keys = group.column("key").to_numpy()
        lk = keys[is_left]
        rk = keys[~is_left]
        rv = rev_col.to_numpy(zero_copy_only=False)[~is_left]
        n = np.zeros(len(lk), dtype=np.int64)
        s = np.zeros(len(lk), dtype=np.int64)
        if len(rk):
            o = np.argsort(rk, kind="stable")
            rk, rv = rk[o], rv[o].astype(np.int64)
            uk, starts = np.unique(rk, return_index=True)
            cnt = np.diff(np.r_[starts, len(rk)])
            sums = np.add.reduceat(rv, starts)
            pos = np.searchsorted(uk, lk)
            pos_c = np.minimum(pos, len(uk) - 1)
            hit = uk[pos_c] == lk
            n[hit] = cnt[pos_c[hit]]
            s[hit] = sums[pos_c[hit]]
        return pa.table({
            "o_orderkey": pa.array(lk),
            "n_items": pa.array(n),
            "revenue": pa.array(s.astype(np.float64) / 10000.0),
        })

    out = (
        both.groupby("part_id")
        .map_groups(outer_join, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("o_orderkey").reset_index(drop=True)


def customers_without_urgent_orders(sf_dir: str) -> pd.DataFrame:
    """Distributed ANTI-join (the set-difference shape of TPC-H Q22 and of
    the applier's idempotence filter J5): customers with no 1-URGENT order.
    Same ONE-shuffle tagged-union co-group as ``order_priority_revenue``,
    with two anti-join-specific scale moves: the right side is filtered at
    the read (only urgent orders leave storage) and pre-DISTINCTed per
    batch before the exchange, so the shuffle carries at most one 8-byte
    key per (batch, customer) instead of one row per order; each partition
    then inverts the `_cogroup_match` semi-join mask to keep the unmatched
    left rows."""
    P = 32
    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_acctbal"],
    )
    od = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderpriority"],
    )

    def tag_cust(t: pa.Table) -> pa.Table:
        key = t.column("c_custkey").to_numpy()
        return pa.table({
            "part_id": pa.array((key % P).astype(np.int32)),
            "key": pa.array(key),
            "bal": t.column("c_acctbal"),
            "is_right": pa.array(np.zeros(len(key), bool)),
        })

    def tag_orders(t: pa.Table) -> pa.Table:
        urgent = pc.equal(t.column("o_orderpriority"), pa.scalar("1-URGENT"))
        key = np.unique(t.filter(urgent).column("o_custkey").to_numpy())
        return pa.table({
            "part_id": pa.array((key % P).astype(np.int32)),
            "key": pa.array(key),
            "bal": pa.nulls(len(key), pa.float64()),
            "is_right": pa.array(np.ones(len(key), bool)),
        })

    both = cust.map_batches(tag_cust, batch_format="pyarrow").union(
        od.map_batches(tag_orders, batch_format="pyarrow"))

    def anti(group: pa.Table) -> pa.Table:
        is_right = group.column("is_right").to_numpy(zero_copy_only=False)
        key = group.column("key").to_numpy()
        li = np.flatnonzero(~is_right)
        rk = np.unique(key[is_right])
        lk = key[li]
        pos = np.searchsorted(rk, lk)
        matched = (pos < len(rk)) & (rk[np.minimum(pos, max(len(rk) - 1, 0))] == lk) \
            if len(rk) else np.zeros(len(lk), bool)
        keep = li[~matched]
        return pa.table({
            "c_custkey": pa.array(lk[~matched]),
            "c_acctbal": group.column("bal").take(pa.array(keep)),
        })

    out = both.groupby("part_id").map_groups(anti, batch_format="pyarrow").to_pandas()
    return out[["c_custkey", "c_acctbal"]]


def clean_text_docs(sf_dir: str) -> pd.DataFrame:
    """C4-style normalization over a deterministically dirtied corpus
    (the clean synthetic docs get a planted URL prefix + whitespace run,
    mirrored in the SQL oracle, so URL-strip / collapse / trim / length
    filter all do real work): strip URLs, collapse whitespace, trim,
    keep docs with >= 200 cleaned chars."""
    from rayrep.ops.text import CleanText

    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def dirty(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        text = pc.binary_join_element_wise(
            pa.scalar("http://spam.example/"), pc.cast(ids, pa.string()),
            pa.scalar("  "), t.column("text"), pa.scalar(" "), "")
        return pa.table({"doc_id": ids, "text": text})

    out = (
        ds.map_batches(dirty, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(CleanText(min_len=200), batch_format="pyarrow")
        .to_pandas()
    )
    return out[["doc_id", "clean_text", "clean_len"]]


def pii_redact_docs(sf_dir: str) -> pd.DataFrame:
    """PII redaction over a deterministically seeded corpus: every doc
    gets a planted email + phone suffix (mirrored verbatim in the SQL
    oracle — the synthetic corpus contains no organic PII, so without the
    plant the redaction would be an unverifiable no-op), then one
    stateless vectorized pass counts and masks both.  A wrong regex, a
    missed occurrence, or a count/replace order swap breaks the hash."""
    from rayrep.ops.text import PIIRedact

    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        tail = pa.array((ids.to_numpy() % 10000).astype("U5"))
        text = pc.binary_join_element_wise(
            t.column("text"), pa.scalar(" contact user"),
            pc.cast(ids, pa.string()),
            pa.scalar("@mail.example.org or call 415-555-"), tail, "")
        return pa.table({"doc_id": ids, "text": text})

    out = (
        ds.map_batches(plant, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(PIIRedact(), batch_format="pyarrow")
        .to_pandas()
    )
    return out[["doc_id", "redacted_text", "n_emails", "n_phones"]]


def stratified_sample_docs(sf_dir: str) -> pd.DataFrame:
    """Stratified sampling for data-mixture balancing: a deterministic
    20-doc sample per language, ordered by a Knuth multiplicative hash of
    doc_id (cross-engine reproducible, unlike random_sample). Same
    grouped-top-k discipline as top_orders_per_segment: each batch keeps
    only its local top-20 per lang, so the shuffle carries at most
    20 x langs rows per batch. (Hash stays in int64 up to ~3x10^9 ids;
    beyond that switch the multiplier to a 32-bit splitmix step.)"""
    K = 20
    ds = _docs(sf_dir, columns=["doc_id", "lang"])

    def add_h(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        h = (ids * 2654435761) % 4294967296
        return t.append_column("h", pa.array(h.astype(np.int64)))

    def local_prune(t: pa.Table, k: int = K) -> pa.Table:
        lang = t.column("lang").to_numpy(zero_copy_only=False)
        ids = t.column("doc_id").to_numpy()
        h = t.column("h").to_numpy()
        codes, _ = pd.factorize(lang, sort=False)
        order = np.lexsort((ids, h, codes))
        cs = codes[order]
        seg_start = np.ones(len(cs), dtype=bool)
        if len(cs) > 1:
            seg_start[1:] = cs[1:] != cs[:-1]
        start_pos = np.maximum.accumulate(np.where(seg_start, np.arange(len(cs)), 0))
        keep = (np.arange(len(cs)) - start_pos) < k
        return t.take(pa.array(order[keep]))

    def final(group: pa.Table, k: int = K) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[("h", "ascending"),
                                                ("doc_id", "ascending")])
        return group.take(idx[:k]).select(["lang", "doc_id"])

    out = (
        ds.map_batches(add_h, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(local_prune, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(final, batch_format="pyarrow")
        .to_pandas()
    )
    return out[["lang", "doc_id"]]


def pack_sequences(sf_dir: str) -> pd.DataFrame:
    """Concat-and-chunk sequence packing: assign every document to its
    2048-token pretraining context bin via a distributed global prefix
    sum (see rayrep/ops/pack.py for the two-pass plan — per-part partial
    sums -> broadcast exclusive offsets -> in-part cumsum)."""
    from rayrep.ops.pack import pack_sequences_ds

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    out = pack_sequences_ds(ds, capacity=2048, chunk=256).to_pandas()
    out["bin_id"] = out["bin_id"].astype(np.int64)
    return out[["doc_id", "n_tokens", "bin_id"]]


# ------------------------------------------------------- training-data ops
def dedup_exact(sf_dir: str) -> pd.DataFrame:
    """Min-id + count per distinct text via fully-vectorized grouped
    aggregates — at corpus scale a map_groups UDF here would mean one
    Python call per UNIQUE document (the anti-pattern this file bans)."""
    from ray.data.aggregate import Count, Min

    from rayrep.ops.dedup import add_content_hash

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    hashed = ds.map_batches(add_content_hash, batch_format="pyarrow", zero_copy_batch=True)
    out = (
        hashed.select_columns(["content_hash", "doc_id"])
        .groupby("content_hash")
        .aggregate(Min("doc_id", alias_name="doc_id"), Count(alias_name="dup_count"))
        .to_pandas()
    )
    return out[["doc_id", "dup_count"]]


def token_stats(sf_dir: str) -> pd.DataFrame:
    ds = _docs(sf_dir, columns=["doc_id", "text"])
    out = _stage(ds, "rayrep.ops.text.TextStats").to_pandas()
    return out[["doc_id", "n_chars_calc", "token_count", "n_punct", "n_digit"]]


def lang_id_pred(sf_dir: str) -> pd.DataFrame:
    ds = _docs(sf_dir, columns=["doc_id", "text"])
    out = _stage(ds, "rayrep.ops.text.LangId").to_pandas()
    return out[["doc_id", "lang_pred"]]


def doc_fingerprint(sf_dir: str) -> pd.DataFrame:
    ds = _docs(sf_dir, columns=["doc_id", "text"])
    out = _stage(ds, "rayrep.ops.text.Fingerprint").to_pandas()
    return out[["doc_id", "fingerprint"]]


def dedup_exact_rows(sf_dir: str) -> pd.DataFrame:
    """Exact dedup returning full winner ROWS while shuffling only
    (hash, id) pairs — the honest scale variant (winners recovered via a
    distributed semi-join, never a driver-side id set)."""
    from rayrep.ops.dedup import exact_dedup_rows

    return exact_dedup_rows(_docs(sf_dir)).to_pandas()


def _planted_docs(sf_dir: str) -> rd.Dataset:
    """Oracle-able near-dup fixture: corpus ∪ exact copies (doc_id + 10^6),
    with each text replaced by a deterministic 30-token pseudo-text derived
    from the FULL text hash. Exact copies keep identical token sets
    (Jaccard 1); distinct texts become independent token sets (Jaccard ≈ 0)
    — so detected clusters == text-equality groups, which DuckDB
    reconstructs with a UNION ALL + window min. The raw testdata corpus
    contains natural near-identical docs by design, which no SQL oracle can
    label; natural-corpus clustering stays pytest-pinned (test_ops)."""
    from rayrep.hashing import stable_hash_strings

    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    h = stable_hash_strings(docs["text"])
    K = 30
    with np.errstate(over="ignore"):
        toks = (
            h[:, None] * np.uint64(0x9E3779B97F4A7C15)
            + np.arange(1, K + 1, dtype=np.uint64)[None, :] * np.uint64(0xBF58476D1CE4E5B9)
        )
        toks = (toks ^ (toks >> np.uint64(31))) * np.uint64(0x94D049BB133111EB)
        toks %= np.uint64(999983)
    pseudo = pa.array([" ".join(map(str, row)) for row in toks])
    ids = docs["doc_id"].to_numpy()
    both = pa.table({
        "doc_id": pa.array(np.concatenate([ids, ids + 1_000_000])),
        "text": pa.concat_arrays([pseudo, pseudo]),
    })
    return rd.from_arrow(both)


def dedup_minhash(sf_dir: str) -> pd.DataFrame:
    from rayrep.ops.dedup import minhash_dedup

    out = minhash_dedup(_planted_docs(sf_dir), threshold=0.9)
    return out.astype({"doc_id": "int64", "rep": "int64"})


def dedup_simhash(sf_dir: str) -> pd.DataFrame:
    from rayrep.ops.dedup import simhash_dedup

    out = simhash_dedup(_planted_docs(sf_dir), max_hamming=2)
    return out.astype({"doc_id": "int64", "rep": "int64"})


def ngram_jaccard_pairs(sf_dir: str) -> pd.DataFrame:
    """Distributed exact n-gram Jaccard verification over planted
    candidate pairs (orig, orig+10^6) on the pseudo-token corpus: copies
    have identical shingle sets (jaccard exactly 1.0), distinct docs are
    disjoint — so the SQL oracle reconstructs the full output. The
    per-pair work runs on workers via two co-group attaches, not a driver
    loop."""
    from rayrep.ops.dedup import ngram_jaccard_verify_ds

    docs = _planted_docs(sf_dir)
    ids = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id"])["doc_id"].to_numpy()
    pairs = rd.from_arrow(pa.table({"a": pa.array(ids),
                                    "b": pa.array(ids + 1_000_000)}))
    out = ngram_jaccard_verify_ds(docs, pairs, threshold=0.5).to_pandas()
    out["jaccard"] = out["jaccard"].round(3)
    return out


def embedding_neardup_pairs(sf_dir: str) -> pd.DataFrame:
    """The driver's embeddings are near-orthogonal (no genuine near-dups),
    so the fixture plants deterministic exact copies (vec_id + 10^6); the
    LSH + in-bucket verify must recover exactly the planted pairs at
    cosine 1.0 — which the SQL oracle reconstructs. (Jittered-copy recall
    is covered by the pytest oracle suite.)"""
    from rayrep.ops.dedup import embedding_neardup

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    both = pa.table({
        "vec_id": pa.array(np.concatenate([ids, ids + 1_000_000])),
        "embedding": pa.concat_arrays([t["embedding"].combine_chunks()] * 2),
    })
    out = embedding_neardup(rd.from_arrow(both), threshold=0.98, planes=8)
    out["cosine"] = out["cosine"].round(3)
    return out


def _query_vec(sf_dir: str) -> np.ndarray:
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    idx = pc.index(t["vec_id"], pa.scalar(0, pa.int64())).as_py()
    return np.asarray(t["embedding"][idx].as_py(), dtype=np.float64)


def ann_topk(sf_dir: str) -> pd.DataFrame:
    from rayrep.ops.similarity import topk_cosine

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    out = topk_cosine(ds, _query_vec(sf_dir), k=10).to_pandas()
    return out[["vec_id"]]


def _ivf_float_index_dir(sf_dir: str, n_cells: int = 8,
                         sample_rows: int = 2048) -> str:
    """Cached cell-partitioned float-IVF layout over the embeddings table
    (train once from a hash sample, assign once, write ``cell=N`` hive
    dirs) — searches prune the READ instead of rescanning the corpus."""
    from rayrep.ops.similarity import train_ivf_from_dataset

    def build(stage: str) -> None:
        ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id", "embedding"])
        idx = train_ivf_from_dataset(ds, n_cells=n_cells,
                                     sample_rows=sample_rows)
        idx.materialize(ds, stage)

    return _disk_cached_dir(
        "ivff", [*_table_key(sf_dir, "embeddings"), n_cells, sample_rows],
        build)


def ann_ivf_topk(sf_dir: str) -> pd.DataFrame:
    """IVF search with nprobe = n_cells (exhaustive probe) over the
    MATERIALIZED cell-partitioned layout: must equal brute force exactly,
    so the brute-force SQL is its oracle — proves the cell-partitioned
    index layout loses nothing."""
    from rayrep.ops.similarity import IVFIndex

    index_dir = _ivf_float_index_dir(sf_dir)
    idx = IVFIndex.load(index_dir)
    out = idx.search_index(index_dir, _query_vec(sf_dir), k=10,
                           nprobe=idx.n_cells).to_pandas()
    return out[["vec_id"]]


def ann_ivf_pruned(sf_dir: str) -> pd.DataFrame:
    """The scale path: probe only the 4 nearest of 8 cells, READING only
    those cells' files from the materialized layout (~nprobe/n_cells of
    the corpus bytes — the r3 full-scan-probe fix).  Approximate by
    design → rows-only check; recall vs brute force is pytest-pinned."""
    from rayrep.ops.similarity import IVFIndex

    index_dir = _ivf_float_index_dir(sf_dir)
    idx = IVFIndex.load(index_dir)
    out = idx.search_index(index_dir, _query_vec(sf_dir), k=10,
                           nprobe=4).to_pandas()
    return out[["vec_id"]]


def corpus_curation(sf_dir: str) -> pd.DataFrame:
    """Composite training-data pipeline: TextStats quality scoring →
    language ID → filter (english AND quality ≥ 0.5) → exact-dedup
    winners — the end-to-end corpus-cleaning shape, all stages streaming.
    Every heuristic is mirrored exactly in the SQL oracle (length /
    punctuation / stopword math with LEAST/GREATEST clips)."""
    ds = _docs(sf_dir, columns=["doc_id", "text"])
    scored = _stage(_stage(ds, "rayrep.ops.text.TextStats"), "rayrep.ops.text.LangId")

    def keep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(t["lang_pred"], "en"),
                    pc.greater_equal(t["quality"], 0.5))
        return t.filter(m).select(["doc_id", "text"])

    kept = scored.map_batches(keep, batch_format="pyarrow")

    from ray.data.aggregate import Min

    from rayrep.ops.dedup import add_content_hash

    hashed = kept.map_batches(add_content_hash, batch_format="pyarrow")
    out = (
        hashed.select_columns(["content_hash", "doc_id"])
        .groupby("content_hash")
        .aggregate(Min("doc_id", alias_name="doc_id"))
        .to_pandas()
    )
    return out[["doc_id"]]


def ngram_topk(sf_dir: str) -> pd.DataFrame:
    """Global word-trigram frequency top-100 — the tokenizer-training /
    vocabulary-stats shape. Map-side partial counts collapse each batch to
    its distinct-gram table before ONE groupby-sum shuffle (shuffled bytes
    ~ distinct grams, never the corpus), then a deterministic
    (count desc, ngram asc) top-k."""
    from ray.data.aggregate import Sum

    from rayrep.ops.text import word_ngram_counts

    ds = _docs(sf_dir, columns=["text"])
    partials = ds.map_batches(word_ngram_counts, batch_format="pyarrow",
                              zero_copy_batch=True)
    counts = partials.groupby("ngram").aggregate(Sum("n", alias_name="n"))
    return counts.sort(["n", "ngram"], descending=[True, False]).limit(100).to_pandas()


def value_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact per-group quantiles (p50/p95 of value per event_type) — one
    shuffle keyed by the group, DISCRETE quantile per group (the element at
    index floor(q*(n-1)) of the sorted values: numpy method='lower'). An
    actual element passes through bit-identical on both engines — the
    interpolated quantile_cont differs from numpy in the last ulp, which
    flips the oracle hash at rounding boundaries. Scale note: exact
    quantiles need each group's values co-located once; at billions of
    rows per group the scale path is a mergeable sketch (t-digest) in the
    same partial/final shape as cdc_daily_counts — exactness is this
    query's contract, so it shuffles values."""

    def qs(g: pa.Table) -> pa.Table:
        v = g.column("value").to_numpy()
        return pa.table({
            "event_type": [g.column("event_type")[0].as_py()],
            "p50": [np.quantile(v, 0.5, method="lower")],
            "p95": [np.quantile(v, 0.95, method="lower")],
        })

    ds = _events(sf_dir, columns=["event_type", "value"])
    return ds.groupby("event_type").map_groups(qs, batch_format="pyarrow").to_pandas()


def user_peak_hour(sf_dir: str) -> pd.DataFrame:
    """Tumbling hourly windows per user → per-user peak window (argmax
    count, tie → earliest window). Map-side partials pre-count
    (user, window) per batch, so the single user-keyed shuffle carries
    window counts, not events; the per-user argmax folds inside
    map_groups."""

    def partial(batch: pa.Table) -> pa.Table:
        w = pc.strftime(batch.column("ts"), format="%Y-%m-%d %H:00:00")
        t = pa.table({"user_id": batch.column("user_id"), "window_start": w})
        agg = pa.TableGroupBy(t, ["user_id", "window_start"]).aggregate(
            [([], "count_all")]
        )
        return agg.rename_columns(["user_id", "window_start", "n"])

    def peak(g: pa.Table) -> pa.Table:
        df = g.to_pandas().groupby("window_start", as_index=False)["n"].sum()
        df = df.sort_values(["n", "window_start"], ascending=[False, True],
                            kind="stable").iloc[:1]
        return pa.table({
            "user_id": pa.array([g.column("user_id")[0].as_py()], pa.int64()),
            "window_start": pa.array(df["window_start"].values),
            "n": pa.array(df["n"].values.astype(np.int64)),
        })

    ds = _events(sf_dir, columns=["user_id", "ts"])
    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby("user_id").map_groups(peak, batch_format="pyarrow").to_pandas()


# ------------------------------------------------- windows / as-of joins
def sessionize_users(sf_dir: str) -> pd.DataFrame:
    """Session windows (30-min gap) per user — the streaming-window custom
    operator (SURVEY.md §2.9) over the events stream."""
    from rayrep.ops.windows import sessionize

    ds = _events(sf_dir, columns=["user_id", "ts", "event_id"])
    out = sessionize(ds, key="user_id", ts_col="ts", tiebreak="event_id").to_pandas()
    return out[["user_id", "n_sessions", "n_events"]]


def tumbling_window_values(sf_dir: str) -> pd.DataFrame:
    """Event-time tumbling windows (1 h) with WATERMARK LATE-DATA DROPS
    (10 min allowed lateness) — the streaming finalize-at-watermark rule,
    hash-pinned end to end: the watermark is a distributed prefix max
    over arrival order (the pack_sequences prefix pattern), and
    deterministic disorder (event_time = ts − (event_id % 97)·30 s) is
    synthesized because the fixture stream — like a real binlog — is
    arrival-ordered (disorder up to 97·250 s ≈ 6.7 h; ~15%% of sf0.01
    events arrive past the watermark+lateness cutoff and drop). The SQL
    oracle replays the same backdating, prefix
    max, and drop rule, so a single wrongly-dropped or wrongly-kept
    event breaks the value hash."""
    from rayrep.ops.windows import tumbling_window_agg

    ds = _events(sf_dir, columns=["event_id", "user_id", "ts", "value"])
    return tumbling_window_agg(
        ds, width_us=3_600_000_000, lateness_us=600_000_000,
        backdate_mod=97, backdate_step_us=250_000_000,
    ).to_pandas()


def hopping_window_values(sf_dir: str) -> pd.DataFrame:
    """Hopping (sliding) event-time windows: 1 h width, 30 min hop — each
    event fans out to width/hop overlapping windows vectorized inside
    map_batches (np.repeat over 3 skinny int64 columns), then ONE grouped
    Sum. Exact fixed-point value sums."""
    from rayrep.ops.windows import hopping_window_agg

    ds = _events(sf_dir, columns=["user_id", "ts", "value"])
    return hopping_window_agg(ds).to_pandas()


def clicks_before_purchase(sf_dir: str) -> pd.DataFrame:
    """Bounded range join (non-equi): for every purchase, the number of
    same-user clicks in the preceding hour (BETWEEN-inclusive). One hash
    shuffle; per-partition segment-shifted searchsorted — see
    rayrep/ops/windows.range_join_count."""
    from rayrep.ops.windows import range_join_count

    ev = _events(sf_dir, columns=["event_id", "user_id", "ts", "event_type"])
    purchases = ev.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "purchase")).select(
            ["event_id", "user_id", "ts"]),
        batch_format="pyarrow",
    )
    clicks = ev.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "click")).select(
            ["user_id", "ts"]),
        batch_format="pyarrow",
    )
    out = range_join_count(
        purchases, clicks, key="user_id", ts_col="ts",
        window_us=3_600_000_000, out_col="n_prior_clicks",
        keep_cols=["event_id"],
        left_schema=pa.schema([("event_id", pa.int64()),
                               ("user_id", pa.int64()),
                               ("ts", pa.timestamp("us"))]),
    ).to_pandas()
    return out[["event_id", "user_id", "n_prior_clicks"]]


def rolling_value_avg(sf_dir: str) -> pd.DataFrame:
    """Sliding-window aggregate: per event, SUM + COUNT of value over the
    user's trailing 5 events (see rayrep/ops/windows.rolling_mean —
    one shuffle, segment-masked shifted adds, no per-key Python).
    Emits (sum, count) rather than the mean: a mean of k 2-decimal
    values lands exactly on round-half boundaries where numpy
    (banker's) and SQL (half-away) disagree — measured 26/10k rows
    flipped at sf0.01; the window SUM is a multiple of 0.01 and
    round(2) is deterministic cross-engine."""
    from rayrep.ops.windows import rolling_mean

    ev = _events(sf_dir, columns=["event_id", "user_id", "ts", "value"])
    out = rolling_mean(ev, key="user_id", ts_col="ts", value_col="value",
                       n=5, out_col="rolling_sum",
                       emit_sum_count=True).to_pandas()
    out["rolling_sum"] = out["rolling_sum"].round(2)
    return out[["event_id", "user_id", "rolling_sum", "n_window"]]


def user_journey(sf_dir: str) -> pd.DataFrame:
    """Ordered per-key string aggregation (clickstream path / conversation
    reconstruction): every user's event types joined in (ts, event_id)
    order. One shuffle; per partition one lexsort + ONE join over the
    whole partition with per-key slicing by char offsets — no per-key
    join calls (see rayrep/ops/windows.ordered_string_agg)."""
    from rayrep.ops.windows import ordered_string_agg

    ev = _events(sf_dir, columns=["event_id", "user_id", "ts", "event_type"])
    out = ordered_string_agg(ev, key="user_id", value_col="event_type",
                             ts_col="ts", tiebreak="event_id").to_pandas()
    return out[["user_id", "journey", "n_events"]]


def event_type_pivot(sf_dir: str) -> pd.DataFrame:
    """Conditional-aggregate pivot (the funnel shape): per user, one count
    column per event type plus the total — SQL's ``count(*) FILTER``.
    Arrow-native per-batch partials (one boolean cast per pivot column,
    one TableGroupBy) collapse each batch to ≤|users| rows before the
    tiny final groupby — the same pre-aggregate discipline as A1."""
    TYPES = ["click", "view", "purchase", "signup", "error"]

    def partial(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type")
        cols = {"user_id": batch.column("user_id")}
        for t in TYPES:
            cols[f"n_{t}"] = pc.cast(pc.equal(et, pa.scalar(t)), pa.int64())
        cols["n_total"] = pa.array(np.ones(len(batch), np.int64))
        t = pa.table(cols)
        agg = pa.TableGroupBy(t, ["user_id"]).aggregate(
            [(c, "sum") for c in t.column_names if c != "user_id"])
        return agg.rename_columns(["user_id"] + [f"n_{t}" for t in TYPES]
                                  + ["n_total"])

    from ray.data.aggregate import Sum

    ds = _events(sf_dir, columns=["user_id", "event_type"])
    out = ds.map_batches(partial, batch_format="pyarrow").groupby(
        "user_id").aggregate(
        *[Sum(f"n_{t}", alias_name=f"n_{t}") for t in TYPES],
        Sum("n_total", alias_name="n_total"),
    ).to_pandas()
    for c in out.columns:
        if c != "user_id":
            out[c] = out[c].astype(np.int64)
    return out


def shipping_priority(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q3 shape: customer(segment) ⋉ orders(date) ⋈ lineitem(date),
    revenue per order, global top-10. Two co-group shuffles — the minimum
    for a 3-table join with different keys: (1) orders semi-join the
    BUILDING custkey set on custkey (filters pushed to the read side of
    each tag, so only qualifying skinny rows enter the exchange); (2) the
    surviving (orderkey, date, priority) rows co-group with date-filtered
    lineitem on orderkey, where each partition owns every lineitem of its
    orderkeys, so per-order revenue is final in place and each partition
    emits only its local top-10 — the driver sees ≤ P×10 rows."""
    P = 32
    CUT = pa.scalar(pd.Timestamp("1998-06-01"), pa.timestamp("us"))
    cust = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                           columns=["c_custkey", "c_mktsegment"])
    od = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"])
    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def tag_cust(t: pa.Table) -> pa.Table:
        key = np.unique(t.filter(pc.equal(t["c_mktsegment"],
                                          pa.scalar("BUILDING")))
                        .column("c_custkey").to_numpy())
        n = len(key)
        return pa.table({
            "part_id": pa.array((key % P).astype(np.int32)),
            "key": pa.array(key), "is_right": pa.array(np.ones(n, bool)),
            "o_orderkey": pa.nulls(n, pa.int64()),
            "o_orderdate": pa.nulls(n, pa.timestamp("us")),
            "o_orderpriority": pa.nulls(n, pa.string()),
        })

    def tag_od(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["o_orderdate"], CUT))
        key = t.column("o_custkey").to_numpy()
        return pa.table({
            "part_id": pa.array((key % P).astype(np.int32)),
            "key": pa.array(key),
            "is_right": pa.array(np.zeros(len(key), bool)),
            "o_orderkey": t.column("o_orderkey"),
            "o_orderdate": t.column("o_orderdate"),
            "o_orderpriority": t.column("o_orderpriority"),
        })

    def semi(group: pa.Table) -> pa.Table:
        is_right = group.column("is_right").to_numpy(zero_copy_only=False)
        key = group.column("key").to_numpy()
        li_idx = np.flatnonzero(~is_right)
        rk = np.unique(key[is_right])
        lk = key[li_idx]
        if len(rk):
            pos = np.searchsorted(rk, lk)
            matched = (pos < len(rk)) & \
                (rk[np.minimum(pos, len(rk) - 1)] == lk)
        else:
            matched = np.zeros(len(lk), bool)
        keep = pa.array(li_idx[matched])
        return pa.table({
            "o_orderkey": group.column("o_orderkey").take(keep),
            "o_orderdate": group.column("o_orderdate").take(keep),
            "o_orderpriority": group.column("o_orderpriority").take(keep),
        })

    qualified = (cust.map_batches(tag_cust, batch_format="pyarrow")
                 .union(od.map_batches(tag_od, batch_format="pyarrow"))
                 .groupby("part_id").map_groups(semi, batch_format="pyarrow"))

    def tag_qual(t: pa.Table) -> pa.Table:
        key = t.column("o_orderkey").to_numpy()
        return pa.table({
            "part_id": pa.array((key % P).astype(np.int32)),
            "key": pa.array(key),
            "o_orderdate": t.column("o_orderdate"),
            "o_orderpriority": t.column("o_orderpriority"),
            "rev": pa.nulls(len(key), pa.float64()),
        })

    def tag_li(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], CUT))
        key = t.column("l_orderkey").to_numpy()
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        return pa.table({
            "part_id": pa.array((key % P).astype(np.int32)),
            "key": pa.array(key),
            "o_orderdate": pa.nulls(len(key), pa.timestamp("us")),
            "o_orderpriority": pa.nulls(len(key), pa.string()),
            "rev": rev,
        })

    def join_topk(group: pa.Table) -> pa.Table:
        from rayrep.ops.dedup import _cogroup_match

        is_right = pc.is_valid(group.column("o_orderpriority")) \
            .to_numpy(zero_copy_only=False)
        empty = pa.table({"l_orderkey": pa.array([], pa.int64()),
                          "revenue": pa.array([], pa.float64()),
                          "o_orderdate": pa.array([], pa.timestamp("us")),
                          "o_orderpriority": pa.array([], pa.string())})
        li_idx, ri_idx = _cogroup_match(group.column("key").to_numpy(),
                                        is_right)
        if len(li_idx) == 0:
            return empty
        okey = group.column("key").to_numpy()[li_idx]
        revs = group.column("rev").to_numpy(zero_copy_only=False)[li_idx]
        order = np.argsort(okey, kind="stable")
        okey_s, revs_s = okey[order], revs[order]
        starts = np.flatnonzero(
            np.concatenate(([True], okey_s[1:] != okey_s[:-1])))
        rev_per = np.add.reduceat(revs_s, starts)
        uniq = okey_s[starts]
        # attach date/priority from the matched right rows (first match
        # per left row; dedup to per-order)
        first_ri = ri_idx[order][starts]
        dates = group.column("o_orderdate").take(pa.array(first_ri))
        pris = group.column("o_orderpriority").take(pa.array(first_ri))
        k = min(10, len(uniq))
        top = np.argsort(-rev_per, kind="stable")[:k]
        return pa.table({
            "l_orderkey": pa.array(uniq[top]),
            "revenue": pa.array(rev_per[top]),
            "o_orderdate": dates.take(pa.array(top)),
            "o_orderpriority": pris.take(pa.array(top)),
        })

    parts = (qualified.map_batches(tag_qual, batch_format="pyarrow")
             .union(li.map_batches(tag_li, batch_format="pyarrow"))
             .groupby("part_id").map_groups(join_topk,
                                            batch_format="pyarrow"))
    out = parts.to_pandas()
    out = out.sort_values(["revenue", "o_orderdate", "l_orderkey"],
                          ascending=[False, True, True],
                          kind="stable").head(10).reset_index(drop=True)
    out["revenue"] = out["revenue"].round(3)
    return out


def asof_click_value(sf_dir: str) -> pd.DataFrame:
    """As-of join: each purchase picks the latest prior click's value for
    the same user (backward inner as-of; tie on click ts broken by max
    event_id, mirrored in the SQL oracle)."""
    from rayrep.ops.windows import asof_join

    # prune at the read: only the 5 needed columns leave storage (props —
    # the wide column — never ships through the shuffle)
    ev = _events(sf_dir, columns=["event_id", "user_id", "ts", "event_type", "value"])
    purchases = ev.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "purchase")).select(
            ["event_id", "user_id", "ts"]
        ),
        batch_format="pyarrow",
    )
    clicks = ev.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "click")),
        batch_format="pyarrow",
    )
    ts_t = pa.timestamp("us")
    out = asof_join(
        purchases, clicks, key="user_id", ts_col="ts",
        value_cols=["value"], right_tiebreak="event_id",
        left_schema=pa.schema([("event_id", pa.int64()),
                               ("user_id", pa.int64()), ("ts", ts_t)]),
        right_schema=pa.schema([("event_id", pa.int64()),
                                ("user_id", pa.int64()), ("ts", ts_t),
                                ("event_type", pa.string()),
                                ("value", pa.float64())]),
    ).to_pandas()
    out = out.rename(columns={"value": "click_value"})
    return out[["event_id", "user_id", "ts", "click_value"]]


# ----------------------------------------------------------- multimodal
def multimodal_features(sf_dir: str) -> pd.DataFrame:
    """Multimodal decode as a SQL-ORACLED pipeline: a deterministic corpus
    of REAL binary containers (PPM images / RIFF-WAVE PCM16 audio with
    closed-form value streams, sized to the sf tier) → actor-pool
    ``MediaStats`` stage that genuinely PARSES each container
    (dependency-free decoders) and emits exact integer aggregates of the
    decoded values.  The DuckDB oracle regenerates the value streams from
    the closed forms, so any decoder mis-parse breaks the hash — the
    r3 'permanent FAIL row' is now a verified real-decode path."""
    from rayrep.ops.multimodal import synthesize_codec_media_table

    n = max(64, pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows // 4)
    ds = rd.from_arrow(synthesize_codec_media_table(n))
    # cheap-init stateless decoder → cached-task stage (init once per
    # worker process, no actor-pool spin-up); a model-holding decoder
    # would use map_batches(Cls, concurrency=N) instead
    out = _stage(ds, "rayrep.ops.multimodal.MediaStats").to_pandas()
    return out.sort_values("media_id").reset_index(drop=True)


# --------------------------------------------------- flagship CDC replay
def _parquet_col_max(path: str, col: str) -> int | None:
    """Max of an int column from Parquet row-group statistics (no data read)."""
    md = pq.read_metadata(path)
    names = md.schema.to_arrow_schema().names
    if col not in names:
        return None
    ci = names.index(col)
    mx = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(ci).statistics
        if st is None or not st.has_min_max:
            return None
        mx = st.max if mx is None else max(mx, st.max)
    return mx


def _emit_changelog_batch(
    batch: pa.Table,
    cl_dir: str,
    B: int,
    with_deletes: bool,
    first_ref,
    with_ddl: bool,
    mask_cells: bool = False,
    ddl_action: str = "add_column",
) -> pa.Table:
    """Per-batch changelog emitter (runs on workers): derive I/U/D ops,
    split rows into 4 contiguous-seq epochs by event_id, and write each
    slice as its own part file (tmp+rename; unique names) — the whole
    fixture build is a streaming map, nothing event-sized ever touches
    the driver (round-2 built it via a full driver-side pq.read_table)."""
    import uuid

    n = batch.num_rows
    eid = batch.column("event_id").to_numpy()
    if with_deletes:
        fk, fv = ray.get(first_ref)  # sorted user_id → min event_id
        uid = batch.column("user_id").to_numpy()
        pos = np.searchsorted(fk, uid)
        first = fv[np.minimum(pos, len(fk) - 1)] == eid
        is_del = (eid % 7 == 0) & ~first
        op = np.where(first, "I", np.where(is_del, "D", "U"))
    else:
        is_del = np.zeros(n, dtype=bool)
        op = np.full(n, "U", dtype="U1")  # full-row upserts: I/U identical
    del_mask = pa.array(is_del)

    def _null_if_del(col, typ, mask_mod: int = 0):
        out = pc.if_else(del_mask, pa.nulls(n, typ), _arr_c(col))
        if mask_cells and mask_mod:
            # changed-cells fixture: every mask_mod-th event leaves this
            # column untouched (null = "unchanged", CHANGES.txt:173)
            return pc.if_else(pa.array(eid % mask_mod == 0), pa.nulls(n, typ), out)
        return out

    cols = {
        # with_ddl: seq = 2*event_id leaves an odd gap for the DDL row
        "seq": pa.array(eid * 2 if with_ddl else eid),
        "txn_id": pa.nulls(n, pa.int64()),
        "op": pa.array(op),
        "schema_ver": pa.array(np.ones(n, np.int32)),
        "conv_id": batch.column("user_id").cast(pa.string()),
        "turn_idx": pa.array(np.zeros(n, np.int32)),
        "event_id": batch.column("event_id"),
        "event_type": _null_if_del(batch.column("event_type"), pa.string()),
        "value": _null_if_del(batch.column("value"), pa.float64(), mask_mod=3),
        "props": _null_if_del(batch.column("props"), pa.string(), mask_mod=5),
        "ts": batch.column("ts"),
        "ddl": pa.nulls(n, pa.string()),
    }
    epoch = np.minimum(3, eid * 4 // B).astype(np.int64)
    if with_ddl:
        # post-DDL rows (epochs 2,3 ⇔ event_id >= ceil(B/2)) are written
        # under the evolved schema; pre-DDL files physically keep the old
        # one (file-level schema evolution, like binlog events written
        # under the then-active schema)
        thr = (B + 1) // 2
        post = eid >= thr
        cols["schema_ver"] = pa.array(np.where(post, 2, 1).astype(np.int32))
        if ddl_action == "add_column":
            cols["note"] = pa.array(
                np.where(post, eid.astype("U20"), None), pa.string(),
                mask=~post,
            )
    tbl = pa.table(cols)
    for e in np.unique(epoch):
        sub = tbl.filter(pa.array(epoch == e))
        if with_ddl and ddl_action == "add_column" and e < 2:
            sub = sub.drop_columns(["note"])
        if with_ddl and ddl_action == "rename_column" and e >= 2:
            # post-rename files carry the NEW column name
            sub = sub.rename_columns(
                [c if c != "props" else "meta" for c in sub.column_names])
        if with_ddl and ddl_action == "drop_column" and e >= 2:
            # post-drop files physically lack the column
            sub = sub.drop_columns(["props"])
        if with_ddl and ddl_action == "alter_type" and e >= 2:
            # post-alter files physically carry the NEW type (MySQL MODIFY:
            # binlog row images after the ALTER are written converted)
            i = sub.column_names.index("event_id")
            sub = sub.set_column(i, pa.field("event_id", pa.string()),
                                 sub.column(i).cast(pa.string()))
        edir = os.path.join(cl_dir, f"epoch-{int(e):05d}")
        os.makedirs(edir, exist_ok=True)
        fp = os.path.join(edir, f"part-{uuid.uuid4().hex}.parquet")
        pq.write_table(sub, fp + ".tmp")
        os.replace(fp + ".tmp", fp)
    return pa.table({"rows": pa.array([n], pa.int64())})


def _arr_c(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _replica_from_deltas(delta_dir: str) -> pd.DataFrame:
    """Query wrapper over ``sinks.replica_from_deltas`` (S5 consumer, a
    streaming Dataset): the ``to_pandas`` here is result-sized at the
    conformance tiers; at scale the replica is consumed with
    ``write_parquet``, never the driver."""
    from rayrep.sinks import replica_from_deltas

    out = replica_from_deltas(delta_dir).to_pandas()
    out["user_id"] = out["conv_id"].astype("int64")
    return out[["event_id", "ts", "user_id", "event_type", "value", "props"]]


def _rollup_delta_dir(delta_dir: str) -> pd.DataFrame:
    """Distributed rollup of the S7 daily-delta side output: per change
    date, the number of net (key, day, epoch) change images, the distinct
    keys touched, and an exact fixed-point value sum.  Two bounded grouped
    aggregates — per-day counters plus one grouped count over distinct
    (day, key) pairs; nothing event-sized reaches the driver."""
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(delta_dir, columns=["change_date", "conv_id", "value"])

    def tag(t: pa.Table) -> pa.Table:
        # fixed-point 1e-4 sum: both engines floor identical IEEE
        # products, so the aggregate is exact under any summation order
        v = t.column("value").to_numpy(zero_copy_only=False)
        return pa.table({
            "change_date": t.column("change_date"),
            "conv_id": t.column("conv_id"),
            "vfp": pa.array(np.floor(v * 10000.0).astype(np.int64)),
        })

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    day = (tagged.groupby("change_date")
           .aggregate(Count(alias_name="n_changes"),
                      Sum("vfp", alias_name="sum_value_fp"))
           .to_pandas())
    keys = (tagged.groupby(["change_date", "conv_id"])
            .aggregate(Count(alias_name="c"))
            .groupby("change_date").aggregate(Count(alias_name="n_keys"))
            .to_pandas())
    out = day.merge(keys, on="change_date")
    out = out[["change_date", "n_changes", "n_keys", "sum_value_fp"]]
    return out.sort_values("change_date").reset_index(drop=True)


_FIXTURE_FORMAT = 1  # bump to invalidate cached changelog fixtures


def _scratch_root() -> str:
    """Root for worker-written fixture/lake staging.  On a multi-node
    cluster this MUST point at shared storage (set ``RAYREP_SCRATCH`` to a
    lake-adjacent shared path): the changelog fixture and the lake are
    written by WORKER tasks, and a driver-local tempdir is not visible to
    remote workers (r3 verdict item #3).  Defaults to the local tempdir,
    which is correct on the single-node conformance tiers."""
    import tempfile

    root = os.environ.get("RAYREP_SCRATCH") or tempfile.gettempdir()
    os.makedirs(root, exist_ok=True)
    return root


def _disk_cached_dir(name: str, key_parts, build) -> str:
    """Content-keyed on-disk directory cache under ``_scratch_root()``:
    ``build(stage_dir)`` runs at most once per key — the staged result is
    atomically renamed into place with a ``_COMPLETE`` marker, so reuse is
    safe across queries, processes, and rounds.  Callers must treat the
    returned directory as READ-ONLY."""
    import hashlib
    import json as _json
    import shutil
    import tempfile

    h = hashlib.sha256(_json.dumps(key_parts).encode()).hexdigest()[:16]
    final = os.path.join(_scratch_root(), f"rayrep_{name}_{h}")
    done = os.path.join(final, "_COMPLETE")
    if os.path.exists(done):
        return final
    stage = tempfile.mkdtemp(prefix=f"rayrep_{name}_{h}.build.",
                             dir=_scratch_root())
    build(stage)
    with open(os.path.join(stage, "_COMPLETE"), "w") as f:
        f.write("ok\n")
    try:
        os.rename(stage, final)
    except OSError:
        if os.path.exists(done):  # lost a benign build race: reuse theirs
            shutil.rmtree(stage, ignore_errors=True)
        else:
            raise
    return final


def _table_key(sf_dir: str, table: str) -> list:
    """Cache-key identity of one input parquet (path + size + mtime)."""
    p = os.path.realpath(os.path.join(sf_dir, f"{table}.parquet"))
    st = os.stat(p)
    return [p, st.st_size, st.st_mtime_ns]


def _changelog_fixture(sf_dir: str, *, with_deletes: bool, with_ddl: bool,
                       mask_cells: bool, ddl_action: str) -> tuple[str, int]:
    """Build (or reuse) the events-derived changelog fixture for one
    parameter combination, returning ``(cl_dir, B)``.

    The 13 ``cdc_replay_*`` conformance queries share only FOUR distinct
    fixtures (plain / deletes / ddl / changed-cells); building one per
    query meant 13 redundant full passes over the events table per
    conformance run (r3 verdict item #1).  The fixture is content-keyed
    (events.parquet identity + params + format version) and cached on
    disk under ``_scratch_root()``: built once into a staging dir, then
    atomically renamed into place with a ``_COMPLETE`` marker, so reuse
    is safe across queries, processes, and rounds.  Callers must treat
    the returned directory as READ-ONLY."""
    import json as _json

    path = os.path.join(sf_dir, "events.parquet")
    key = [_FIXTURE_FORMAT, *_table_key(sf_dir, "events"), with_deletes,
           with_ddl, mask_cells, ddl_action if with_ddl else ""]

    def build(stage: str) -> None:
        max_eid = _parquet_col_max(path, "event_id")
        ds = rd.read_parquet(path, columns=EVENT_COLS[:5] + ["props"])
        if max_eid is None:  # stats missing: one tiny distributed aggregate
            from ray.data.aggregate import Max

            max_eid = ds.select_columns(["event_id"]).aggregate(
                Max("event_id"))["max(event_id)"]
        B = int(max_eid) + 1
        first_ref = None
        if with_deletes:
            from ray.data.aggregate import Min

            fm = (
                ds.select_columns(["user_id", "event_id"])
                .groupby("user_id")
                .aggregate(Min("event_id", alias_name="min_eid"))
                .to_pandas()  # small: one row per user
            )
            fk = fm["user_id"].to_numpy()
            order = np.argsort(fk)
            first_ref = ray.put((fk[order], fm["min_eid"].to_numpy()[order]))

        counts = ds.map_batches(
            _emit_changelog_batch,
            fn_kwargs={"cl_dir": stage, "B": B, "with_deletes": with_deletes,
                       "first_ref": first_ref, "with_ddl": with_ddl,
                       "mask_cells": mask_cells, "ddl_action": ddl_action},
            batch_format="pyarrow",
        ).take_all()  # tiny: one count row per batch
        assert sum(r["rows"] for r in counts) > 0
        if with_ddl:
            # DDL row at seq 2*ceil(B/2)-1: strictly between epoch 1's and
            # epoch 2's data seqs, in epoch 2's directory
            thr = (B + 1) // 2
            if ddl_action == "add_column":
                ddl_json = {"action": "add_column", "name": "note",
                            "type": "string"}
                extra = {"note": pa.nulls(1, pa.string())}
                payload_col = "props"
            elif ddl_action == "rename_column":  # props -> meta mid-stream
                ddl_json = {"action": "rename_column", "from": "props",
                            "to": "meta"}
                extra = {}
                payload_col = "meta"  # DDL row written under the NEW schema
            elif ddl_action == "alter_type":  # event_id int64→string
                ddl_json = {"action": "alter_type", "name": "event_id",
                            "type": "string"}
                extra = {}
                payload_col = None
            else:  # drop_column: props removed mid-stream
                ddl_json = {"action": "drop_column", "name": "props"}
                extra = {}
                payload_col = None  # DDL row written under the NEW schema
            cells = {
                "seq": pa.array([2 * thr - 1], pa.int64()),
                "txn_id": pa.nulls(1, pa.int64()),
                "op": pa.array(["DDL"]),
                "schema_ver": pa.array([2], pa.int32()),
                "conv_id": pa.nulls(1, pa.string()),
                "turn_idx": pa.nulls(1, pa.int32()),
                "event_id": pa.nulls(1, pa.int64()),
                "event_type": pa.nulls(1, pa.string()),
                "value": pa.nulls(1, pa.float64()),
                "ts": pa.array([pd.Timestamp("2024-01-01")],
                               pa.timestamp("us")),
                "ddl": pa.array([_json.dumps(ddl_json)]),
                **extra,
            }
            if payload_col is not None:
                cells[payload_col] = pa.nulls(1, pa.string())
            if ddl_action == "alter_type":
                # the DDL row's file is written under the NEW schema
                cells["event_id"] = pa.nulls(1, pa.string())
            ddl_row = pa.table(cells)
            pq.write_table(ddl_row,
                           os.path.join(stage, "epoch-00002",
                                        "part-ddl.parquet"))
        with open(os.path.join(stage, "_META.json"), "w") as f:
            _json.dump({"B": B}, f)

    final = _disk_cached_dir("clfix", key, build)
    with open(os.path.join(final, "_META.json")) as f:
        return final, int(_json.load(f)["B"])


def _envelope_fixture(cl_src: str) -> str:
    """Debezium-JSONL export of a cached changelog fixture, itself disk-
    cached (keyed by the fixture dir, whose name already encodes the
    content key): built once, shared by every round-trip query."""
    def build(stage: str) -> None:
        from rayrep.ingest import export_envelopes

        export_envelopes(cl_src, stage)

    return _disk_cached_dir("envfix", [os.path.basename(cl_src)], build)


def _link_or_copy_tree(src: str, dst: str) -> None:
    """Populate ``dst`` with hardlinks to ``src``'s files (copy fallback
    across filesystems) — O(files), no data movement on the same fs."""
    import shutil

    os.makedirs(dst, exist_ok=True)
    for name in os.listdir(src):
        try:
            os.link(os.path.join(src, name), os.path.join(dst, name))
        except OSError:
            shutil.copy2(os.path.join(src, name), os.path.join(dst, name))


def _replay_events_through_engine(
    sf_dir: str, with_deletes: bool, with_ddl: bool = False,
    changed_cells: bool = False, end_epoch: int | None = None,
    delta_rollup: bool = False, chaos: float = 0.0,
    resume_split: bool = False, replica: bool = False,
    ddl_action: str = "add_column", metrics: bool | str = False,
    tail_mode: bool = False, repartition_to: int | None = None,
    erase_mod: int | None = None, purge_mid_ts: bool = False,
    replica_incremental: bool = False, snapshot_interval: int | None = None,
    view: bool = False, repair: bool = False, lease_failover: bool = False,
    rebind_failover: bool = False,
    trim_after_barrier: bool = False, point_lookup_mod: int | None = None,
    via_envelopes: bool = False, clone_resume: bool = False,
    rollback_drill: bool = False, compact_log: str | None = None,
    sec_index: bool = False, dead_letter: bool = False,
    tail_compact: bool = False, dlq_requeue: bool = False,
) -> pd.DataFrame:
    """A changelog derived deterministically from the driver's events
    table (`event_id % 7 == 0` = D when ``with_deletes``, payload nulled
    per the reference's deleted-rows rule; seq ∝ event_id; optional
    mid-stream add_column DDL when ``with_ddl``) replayed through the
    REAL engine — augment → hash shuffle → Applier → exactly-once
    manifests — on a custom payload schema, returning the converged lake
    table.  The fixture build is distributed AND shared: one cached
    changelog per parameter combination (``_changelog_fixture``) serves
    every query variant; only the lake is per-query."""
    import tempfile

    from rayrep.config import EngineConfig
    from rayrep.pipeline import final_table, replay
    from rayrep.schema import SchemaVersion

    cl_src, B = _changelog_fixture(
        sf_dir, with_deletes=with_deletes, with_ddl=with_ddl,
        mask_cells=changed_cells, ddl_action=ddl_action)
    d = tempfile.mkdtemp(prefix="rayrep_qe_", dir=_scratch_root())
    lake = os.path.join(d, "lake")
    if tail_mode or trim_after_barrier or compact_log or dead_letter:
        # private changelog dir: tail mode publishes epochs progressively;
        # trim and compact-log MUTATE the log (epoch deletion / span swap)
        # and the fixture is shared across queries, so each gets a
        # hardlink copy
        cl = os.path.join(d, "cl")
        os.makedirs(cl)
    elif via_envelopes:
        # external-source round-trip (rayrep/ingest.py): the fixture is
        # exported to Debezium-style JSONL envelopes (cached once per
        # fixture) and re-ingested into a FRESH engine changelog — replay
        # then runs on the ingested log, so the oracle hash pins the whole
        # envelope encode → parse → seq/schema_ver re-assignment path
        from rayrep.ingest import ingest_cdc_json

        env_dir = _envelope_fixture(cl_src)
        cl = os.path.join(d, "cl-ingested")
        res_i = ingest_cdc_json(env_dir, cl)
        assert res_i["rows"] > 0
    else:
        cl = cl_src  # read-only input to replay()

    sv = SchemaVersion(1, pa.schema([
        pa.field("conv_id", pa.string()), pa.field("turn_idx", pa.int32()),
        pa.field("event_id", pa.int64()), pa.field("event_type", pa.string()),
        pa.field("value", pa.float64()), pa.field("props", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]))
    cfg = EngineConfig(changelog_dir=cl, lake_dir=lake, num_partitions=16,
                       initial_schema_json=sv.to_json(),
                       delta_output=delta_rollup or replica
                       or replica_incremental or view or sec_index,
                       changed_cells_updates=changed_cells,
                       per_cell_conflicts=changed_cells,
                       chaos_fraction=chaos,
                       # the delta-rollup oracle nets per (key, day, EPOCH
                       # DIR); pin the round granularity so a future
                       # default change can't silently shift the contract
                       epochs_per_round=1)
    if snapshot_interval is not None:
        import dataclasses
        cfg = dataclasses.replace(cfg, state_snapshot_interval=snapshot_interval)
    if resume_split:
        # kill/resume mid-replay: the first run commits only the first two
        # epoch barriers; the second must re-run ONLY the uncommitted tail
        # and converge to the identical table (exactly-once redelivery).
        replay(cfg, end_epoch=1)
    if clone_resume:
        # DR drill (rayrep/clone.py): commit the epoch-1 barrier, clone
        # the lake (hardlinked barrier-consistent backup), then resume
        # the replay INTO THE CLONE — the remaining epochs apply against
        # the cloned manifests/state and must converge to the same
        # full-history oracle. The source lake stays frozen at its
        # barrier (checked), proving the clone is fully independent.
        import dataclasses

        from rayrep.clone import clone_lake
        from rayrep.manifests import EpochManifest

        replay(cfg, end_epoch=1)
        lake2 = os.path.join(d, "lake-clone")
        res_c = clone_lake(lake, lake2)
        # partitions cloned == partitions the replay actually touched
        # (TOUCHED count is data-dependent: sf0.01 hits all 16, the
        # sf0.001 pytest fixture only ~10 — never hard-code the scale)
        import glob as _glob
        n_src = len(_glob.glob(os.path.join(lake, "_manifests", "p*.json")))
        assert res_c["barrier"] == 1 and n_src > 0 \
            and res_c["partitions"] == n_src, (res_c, n_src)
        cfg = dataclasses.replace(cfg, lake_dir=lake2)
        src_lake = lake
        lake = lake2
    if trim_after_barrier:
        # binlog expiry mid-stream (retention.trim_changelog): commit the
        # epoch-1 barrier, TRIM the committed prefix (epochs 0-1 deleted,
        # durable floor marker written first), prove a fresh consumer is
        # refused, then resume — the resumed replay reads only the
        # surviving epochs and must converge to the full-history oracle:
        # trim is invisible to a lake at/above the floor.
        from rayrep.manifests import TrimmedLogError, log_floor
        from rayrep.pipeline import replay_batch
        from rayrep.retention import trim_changelog

        for name in sorted(os.listdir(cl_src)):
            if name.startswith("epoch-"):
                staged = os.path.join(d, "stage-" + name)
                _link_or_copy_tree(os.path.join(cl_src, name), staged)
                os.replace(staged, os.path.join(cl, name))
        replay(cfg, end_epoch=1)
        res_t = trim_changelog(cl, lake, keep_from_epoch=2)
        assert res_t["trimmed"] == [0, 1] and log_floor(cl) == 2, res_t
        try:  # full-history consumers must refuse the trimmed log
            replay_batch(cl, num_partitions=4)
            raise AssertionError("batch read of trimmed log was not refused")
        except TrimmedLogError:
            pass
    if compact_log:
        # Kafka-style log compaction (rayrep/logcompact.py): collapse
        # epochs 0-2 to latest-event-per-key (+tombstones +DDLs) in one
        # span dir; the active tail epoch 3 stays plain.  "fresh" proves
        # a from-zero replay of the compacted log converges to the
        # full-history oracle; "resume" commits the epoch-1 barrier FIRST
        # so the span lands mid-history and convergence additionally
        # exercises the watermark anti-join across a compacted span.
        # check-log must pass on the result (span receipt verification).
        from rayrep.checklog import check_changelog
        from rayrep.logcompact import compact_changelog

        for name in sorted(os.listdir(cl_src)):
            if name.startswith("epoch-"):
                staged = os.path.join(d, "stage-" + name)
                _link_or_copy_tree(os.path.join(cl_src, name), staged)
                os.replace(staged, os.path.join(cl, name))
        if compact_log == "resume":
            replay(cfg, end_epoch=1)
        res_k = compact_changelog(cl, through_epoch=2,
                                  mode="cells" if changed_cells else "row")
        assert res_k["n_retained"] < res_k["n_original"], res_k
        assert os.path.isdir(os.path.join(cl, "epoch-00000-c00002")), res_k
        if not with_ddl:
            # the ddl fixture's seqs are sparse BY DESIGN (seq=2*event_id
            # with one odd DDL seq), so the density audit doesn't apply to
            # it even uncompacted; the dense fixtures must pass check-log
            # end to end, span receipt included
            rep_k = check_changelog(cl)
            assert rep_k["ok"], rep_k["errors"][:3]
    n_poison = 0
    if dead_letter:
        # poison-message quarantine (rayrep/config.py dead_letter): copy
        # the fixture, INJECT malformed rows (null routing key / ts /
        # seq — the kinds a buggy producer actually emits) into every
        # epoch, replay with the quarantine on.  The oracle is the plain
        # deletes-LWW SQL: quarantined rows must be invisible to the
        # converged table, and the dlq must hold exactly the injected
        # rows (asserted below, after the replay).
        for name in sorted(os.listdir(cl_src)):
            if name.startswith("epoch-"):
                staged = os.path.join(d, "stage-" + name)
                _link_or_copy_tree(os.path.join(cl_src, name), staged)
                os.replace(staged, os.path.join(cl, name))
        for e in range(4):
            bad = pa.table({
                "seq": pa.nulls(3, pa.int64()),
                "txn_id": pa.nulls(3, pa.int64()),
                "op": pa.array(["U", "U", "U"]),
                "schema_ver": pa.array([1, 1, 1], pa.int32()),
                "conv_id": pa.array([None, "999999", None], pa.string()),
                "turn_idx": pa.array([0, None, None], pa.int32()),
                "event_id": pa.nulls(3, pa.int64()),
                "event_type": pa.array(["poison"] * 3),
                "value": pa.nulls(3, pa.float64()),
                "props": pa.nulls(3, pa.string()),
                "ts": pa.array([pd.Timestamp("2024-01-01"), None, None],
                               pa.timestamp("us")),
                "ddl": pa.nulls(3, pa.string()),
            })
            pq.write_table(bad, os.path.join(cl, f"epoch-{e:05d}",
                                             "part-poison.parquet"))
            n_poison += 3
        import dataclasses

        cfg = dataclasses.replace(cfg, dead_letter=True)
        # resume boundary inside the quarantined path
        replay(cfg, end_epoch=1)
    dead = None
    if lease_failover:
        # HA failover (rayrep/lease.py): writer A replays under a lease to
        # the epoch-1 barrier and "crashes" leaving a live-but-abandoned
        # lease; a successor WITHOUT takeover must be refused; the elected
        # successor (takeover=True) fences A, resumes from the manifests,
        # and converges — the failover must be INVISIBLE to the final
        # state (oracle = the plain deletes LWW SQL). The zombie is then
        # proven fenced at both layers below.
        import dataclasses

        from rayrep import lease as _lease_mod

        replay(dataclasses.replace(cfg, writer_lease=True,
                                   lease_owner="writer-a"), end_epoch=1)
        dead = _lease_mod.acquire(lake, owner="writer-a", ttl_s=3600)
        try:
            replay(dataclasses.replace(cfg, writer_lease=True,
                                       lease_owner="writer-b"))
            raise AssertionError("non-takeover successor was not refused")
        except _lease_mod.LeaseHeldError:
            pass
        cfg = dataclasses.replace(cfg, writer_lease=True,
                                  lease_owner="writer-b",
                                  lease_takeover=True)
    if rollback_drill:
        # in-place PITR drill (rayrep/rollback.py): replay EVERYTHING,
        # rewind the lake to the epoch-1 barrier (O(files) metadata:
        # manifests restore their epoch-1 history entries, the chain
        # suffix is deleted), then the ordinary resume below re-applies
        # the rolled-back epochs. Convergence to the full-history LWW SQL
        # proves rollback landed exactly on a committed barrier and the
        # restored watermarks re-admitted exactly the rolled-back events.
        from rayrep.manifests import EpochManifest as _EM
        from rayrep.manifests import PartitionManifest as _PM
        from rayrep.rollback import rollback_lake

        replay(cfg)
        assert _EM.load(lake).last_epoch == 3
        rb = rollback_lake(lake, to_epoch=1)
        assert rb["barrier"] == 1 and rb["restored"] >= 1, rb
        assert _EM.load(lake).last_epoch == 1
        import glob as _glob
        import re as _re
        for mp in _glob.glob(os.path.join(lake, "_manifests", "p*.json")):
            pid = int(_re.search(r"p(\d+)\.json$", mp).group(1))
            assert _PM.load(lake, pid).epoch <= 1
    if repartition_to is not None:
        # mid-stream cluster rescale (rayrep/repart.py): commit the first
        # two epochs at the original partition count, rescale the lake
        # offline, then replay the remaining epochs INTO the rescaled
        # lake at the new count. The final table must be bit-identical to
        # an uninterrupted replay — the repartition is invisible to LWW.
        import dataclasses

        from rayrep.repart import repartition_lake

        replay(cfg, end_epoch=1)
        lake2 = os.path.join(d, "lake2")
        repartition_lake(lake, lake2, repartition_to)
        cfg = dataclasses.replace(cfg, lake_dir=lake2,
                                  num_partitions=repartition_to)
        lake = lake2
    if tail_mode:
        from rayrep.pipeline import tail as _tail

        res = None
        for batch_epochs in ((0, 1), (2, 3)):
            for e in batch_epochs:
                # hardlink-stage the cached epoch on the SAME fs, then one
                # atomic rename makes it visible to the poller whole
                staged = os.path.join(d, f"stage-{e:05d}")
                _link_or_copy_tree(os.path.join(cl_src, f"epoch-{e:05d}"),
                                   staged)
                os.replace(staged, os.path.join(cl, f"epoch-{e:05d}"))
            res = _tail(cfg, poll_interval_s=0.05, idle_timeout_s=30.0,
                        max_epochs=2,
                        compact_log_every=2 if tail_compact else None)
        if tail_compact:
            # the tailer compacted its own log mid-session: a real span on
            # disk, and the log still serves the continuing lake (the
            # convergence below IS the oracle-hashed proof)
            import glob as _glob

            assert res["maintenance"]["log_compactions"] >= 1, res
            assert _glob.glob(os.path.join(cl, "epoch-*-c*"))
    elif rebind_failover:
        # source failover (rayrep/failover.py, pGTID translation,
        # CHANGES.txt:17-19): the lake commits epochs 0-1 from source A,
        # A dies, and a REPLACEMENT source serving the same stream under
        # DIFFERENT epoch boundaries (7 instead of 4) takes over. The
        # checkpoint translates onto B via the per-partition seq
        # watermarks; resume on B must converge to the same LWW state —
        # the failover is invisible to the oracle hash, with the anti-
        # join absorbing B's re-read overlap.
        import dataclasses
        import glob as _glob

        import pyarrow.parquet as _pq

        from rayrep.failover import rebind_source
        from rayrep.gen import publish_epoch as _pub

        replay(cfg, end_epoch=1)
        files = sorted(_glob.glob(os.path.join(cl, "epoch-*", "*.parquet")))
        full = pa.concat_tables([_pq.read_table(f) for f in files],
                                promote_options="permissive").sort_by("seq")
        clB = os.path.join(d, "clB")
        nB, mB = full.num_rows, 7
        for e in range(mB):
            lo, hi = nB * e // mB, nB * (e + 1) // mB
            _pub(clB, e, full.slice(lo, hi - lo))
        rb = rebind_source(lake, clB)
        assert 0 <= rb["new_barrier"] < mB, rb
        cfg = dataclasses.replace(cfg, changelog_dir=clB)
        res = replay(cfg)
        assert res["epochs"] and res["epochs"][0]["epoch"] == rb["new_barrier"] + 1
    else:
        res = replay(cfg, end_epoch=end_epoch)
    if clone_resume:
        from rayrep.manifests import EpochManifest as _EM

        # the resumed replay ran only in the clone: source frozen at 1
        assert _EM.load(src_lake).last_epoch == 1
        assert _EM.load(lake).last_epoch == 3
    if lease_failover:
        # zombie fencing, both layers: A's renew fails (token superseded),
        # and a manifest commit under A's token is refused on disk.
        from rayrep import lease as _lease_mod
        from rayrep.manifests import PartitionManifest, StaleWriterError

        try:
            dead.renew()
            raise AssertionError("fenced zombie renew did not fail")
        except _lease_mod.LeaseLostError:
            pass
        m0 = PartitionManifest.load(lake, 0)
        assert m0.lease_token > dead.token, (m0.lease_token, dead.token)
        try:
            PartitionManifest(part_id=0, epoch=m0.epoch + 1,
                              last_seq=m0.last_seq,
                              lease_token=dead.token).save(lake)
            raise AssertionError("zombie manifest commit was not refused")
        except StaleWriterError:
            pass
    if repair:
        # targeted partition repair (rayrep/repair.py): destroy two
        # committed partitions — one losing its manifest too (fresh-disk
        # mode), one keeping it (the nastier watermark-intact mode) —
        # then rebuild ONLY them from the changelog. The oracle is the
        # plain deletes-LWW SQL: repair must be invisible.
        import shutil

        from rayrep.manifests import PartitionManifest
        from rayrep.repair import repair_partitions

        parts = sorted(x for x in os.listdir(lake) if x.startswith("part-"))
        pids = [int(parts[0].split("-")[1]), int(parts[-1].split("-")[1])]
        for i, p in enumerate(pids):
            shutil.rmtree(os.path.join(lake, f"part-{p:05d}"))
            if i == 0:
                os.remove(PartitionManifest.path(lake, p))
        repair_partitions(cfg, pids)
    if erase_mod is not None:
        # targeted erasure (rayrep/retention.py): the request list is
        # user_id % erase_mod == 3 — request-sized, held on the driver by
        # design (erasure lists come from requests, not scans)
        from rayrep.retention import erase_keys

        uids = np.unique(
            pq.read_table(os.path.join(sf_dir, "events.parquet"),
                          columns=["user_id"]).column("user_id").to_numpy()
        )
        erase_keys(lake, [str(u) for u in uids if u % erase_mod == 3])
    if purge_mid_ts:
        # physical retention: purge below the 99.9% point of the events
        # ts range — min/max from row-group stats (no data read), floor'd in
        # integer µs exactly as the SQL. High on purpose: LWW winners are
        # each user's LATEST ts, so a median cutoff drops nothing and the
        # oracle would have no discriminating power.
        from rayrep.retention import purge_lake

        md = pq.read_metadata(os.path.join(sf_dir, "events.parquet"))
        names = md.schema.to_arrow_schema().names
        ci = names.index("ts")
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        lo_us = pa.scalar(lo, pa.timestamp("us")).cast(pa.int64()).as_py()
        hi_us = pa.scalar(hi, pa.timestamp("us")).cast(pa.int64()).as_py()
        purge_lake(lake, before_ts_us=lo_us + 999 * (hi_us - lo_us) // 1000)
    if metrics:
        if metrics == "stream":
            # read the counters back from the CONTINUOUS metrics stream
            # (rayrep/metrics.py) instead of the ReplayResult — same SQL
            # oracle, so the emitter itself is hash-verified end to end
            from rayrep.metrics import read_stream

            rows = read_stream(lake, kind="epoch")
        else:
            rows = res["epochs"]
        return pd.DataFrame(
            [{"epoch": np.int64(e["epoch"]), "input_rows": e["input_rows"],
              "applied": e["applied"], "conflict": e["conflict"]}
             for e in rows]
        ).sort_values("epoch").reset_index(drop=True)
    if delta_rollup:
        return _rollup_delta_dir(os.path.join(lake, "delta"))
    if replica:
        return _replica_from_deltas(os.path.join(lake, "delta"))
    if view:
        # maintained aggregate view (rayrep/views.py): TWO refreshes so the
        # incremental boundary — retractions of epoch-0/1 winners by later
        # epochs' updates and deletes — is inside the oracle-hashed path.
        from rayrep.views import read_view, update_view

        vdir = os.path.join(d, "view")
        update_view(os.path.join(lake, "delta"), vdir,
                    group_col="event_type", value_col="value",
                    up_to_epoch=1)
        update_view(os.path.join(lake, "delta"), vdir,
                    group_col="event_type", value_col="value")
        out = read_view(vdir, group_col="event_type").to_pandas()
        return (out.sort_values("event_type").reset_index(drop=True)
                [["event_type", "n_rows", "sum_fp"]])
    if sec_index:
        # secondary index (rayrep/secindex.py): TWO incremental refreshes
        # (the first capped at epoch 1) so retractions — a key's
        # event_type changing across the refresh boundary, deletes
        # removing entries — are inside the oracle-hashed path; then
        # serve "rows WHERE event_type='click'" entirely via the index
        # probe (reads exactly the ONE q file hash('click') names) +
        # pinned-routing point lookups. Never a lake scan.
        from rayrep.lookup import lookup, lookup_plan
        from rayrep.secindex import index_lookup, update_index

        idir = os.path.join(d, "index")
        update_index(os.path.join(lake, "delta"), idir, column="event_type",
                     num_index_partitions=8, up_to_epoch=1, lake_dir=lake)
        res_i = update_index(os.path.join(lake, "delta"), idir,
                             column="event_type", num_index_partitions=8,
                             lake_dir=lake)
        assert res_i["epoch"] == 3, res_i
        ent = index_lookup(idir, ["click"], lake_dir=lake)
        keys = list(zip(ent.column("conv_id").to_pylist(),
                        (int(t) for t in ent.column("turn_idx").to_pylist())))
        assert keys, "index probe returned nothing"
        plan = lookup_plan(lake, keys)
        assert 0 < len(plan) <= cfg.num_partitions
        out = lookup(lake, keys).to_pandas()
        out["user_id"] = out["conv_id"].astype("int64")
        return (out[["event_id", "ts", "user_id", "event_type", "value",
                     "props"]]
                .sort_values("user_id").reset_index(drop=True))
    if replica_incremental:
        # maintained consumer (sinks.update_replica): TWO refreshes — the
        # first capped at epoch 1, the second applying only the rest past
        # the replica's own watermark. Tombstone persistence across the
        # refresh boundary is exactly what the oracle hash checks.
        from rayrep.sinks import read_replica, update_replica

        rdir = os.path.join(d, "replica")
        update_replica(os.path.join(lake, "delta"), rdir, up_to_epoch=1)
        update_replica(os.path.join(lake, "delta"), rdir)
        out = read_replica(rdir).to_pandas()
        out["user_id"] = out["conv_id"].astype("int64")
        return out[["event_id", "ts", "user_id", "event_type", "value",
                    "props"]]
    if point_lookup_mod is not None:
        # key-addressed serving read (rayrep/lookup.py): fetch ONLY the
        # selected keys' rows via the routing-hash partition prune + chain
        # read pushdown — never a lake scan. The plan-size assert pins the
        # prune (probes ≤ min(P, |keys|) partitions); the oracle is the
        # deletes-LWW SQL restricted to the same key predicate.
        from rayrep.lookup import lookup, lookup_plan

        uids = np.unique(
            pq.read_table(os.path.join(sf_dir, "events.parquet"),
                          columns=["user_id"]).column("user_id").to_numpy())
        keys = [str(u) for u in uids if u % point_lookup_mod == 5]
        plan = lookup_plan(lake, keys)
        assert 0 < len(plan) <= min(cfg.num_partitions, len(keys)), (
            len(plan), len(keys))
        out = lookup(lake, keys).to_pandas()
        out["user_id"] = out["conv_id"].astype("int64")
        return (out[["event_id", "ts", "user_id", "event_type", "value",
                     "props"]]
                .sort_values("user_id").reset_index(drop=True))
    if dead_letter:
        # the quarantine holds EXACTLY the injected poison — no more
        # (valid rows never divert), no less (no silent drops), no
        # duplicates across the resume boundary
        from rayrep.sinks import read_dlq

        q = read_dlq(lake)
        assert q.num_rows == n_poison, (q.num_rows, n_poison)
        if dlq_requeue:
            # close the loop: repair the quarantined rows (existing key,
            # ANCIENT ts — guaranteed LWW losers, so the full-history
            # oracle is unchanged) and republish them as a proper epoch;
            # the resumed replay must apply the epoch and reject every
            # row as a conflict, and the active dlq must drain.
            from rayrep.sinks import requeue_dlq

            uid0 = str(int(pq.read_table(
                os.path.join(sf_dir, "events.parquet"),
                columns=["user_id"]).column("user_id")[0].as_py()))

            def fix(t: pa.Table) -> pa.Table:
                n = t.num_rows
                t = t.set_column(t.column_names.index("conv_id"),
                                 "conv_id", pa.array([uid0] * n))
                t = t.set_column(t.column_names.index("turn_idx"),
                                 "turn_idx", pa.array([0] * n, pa.int32()))
                return t.set_column(
                    t.column_names.index("ts"), "ts",
                    pa.array([1] * n, pa.timestamp("us")))

            res_q = requeue_dlq(lake, cl, fix_fn=fix)
            assert res_q["requeued"] == n_poison, res_q
            out_r = replay(cfg)
            assert sum(e["conflict"] for e in out_r["epochs"]) == n_poison
            assert read_dlq(lake).num_rows == 0
    out = final_table(lake).to_pandas()
    out["user_id"] = out["conv_id"].astype("int64")
    keep = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    if with_ddl:
        if ddl_action == "add_column":
            keep.append("note")
        elif ddl_action == "rename_column":
            # rename: pre-DDL rows' payload must have migrated to `meta`
            keep[keep.index("props")] = "meta"
        elif ddl_action == "drop_column":
            keep.remove("props")  # gone from the converged table
        # alter_type: same columns, event_id's TYPE changed to string
    return out[keep]


def cdc_replay_events(sf_dir: str) -> pd.DataFrame:
    """The flagship with a DRIVER ORACLE: real-engine replay of an
    events-derived changelog; converged table must equal the DuckDB
    ``row_number()`` LWW query. End-to-end, not a re-implementation."""
    return _replay_events_through_engine(sf_dir, with_deletes=False)


def cdc_tail_mode(sf_dir: str) -> pd.DataFrame:
    """Continuous-tail mode (§2.9) SQL-oracled: the changelog fixture is
    published PROGRESSIVELY (two epochs, then two more, each via the
    atomic-rename producer protocol) while ``pipeline.tail`` polls and
    applies them as they appear — with tombstones in the stream.  The
    converged table must equal the deletes LWW oracle; a tail that
    double-applied a polled epoch or missed a late-published one breaks
    the hash."""
    return _replay_events_through_engine(sf_dir, with_deletes=True,
                                         tail_mode=True)


def cdc_tail_compacting(sf_dir: str) -> pd.DataFrame:
    """Self-maintaining tail, SQL-oracled: the progressive-publication
    tail of ``cdc_tail_mode`` with ``compact_log_every=2`` — mid-session
    the tailer Kafka-compacts the epochs below its own barrier (asserted:
    a real span lands on disk) and keeps applying the live stream.  The
    converged table must still equal the deletes LWW oracle: maintenance
    under the held lease is invisible to the replicated state."""
    return _replay_events_through_engine(sf_dir, with_deletes=True,
                                         tail_mode=True, tail_compact=True)


def cdc_tail_evolution(sf_dir: str) -> pd.DataFrame:
    """Continuous tail ACROSS a mid-stream DDL (§2.9 × M9), SQL-oracled:
    epochs publish progressively while ``pipeline.tail`` polls; the
    ``add_column`` DDL arrives INSIDE a late-published epoch, so the
    tailer's registry must evolve mid-tail and conform both the already-
    committed pre-DDL state and the still-arriving post-DDL events.
    Oracle = the evolution LWW SQL (pre-DDL winners read NULL note)."""
    return _replay_events_through_engine(sf_dir, with_deletes=False,
                                         with_ddl=True, tail_mode=True,
                                         ddl_action="add_column")


def cdc_replay_metrics(sf_dir: str) -> pd.DataFrame:
    """The replication-metrics registry (T5/A1) against SQL: per-epoch
    (input_rows, applied, conflict) counters emitted by the real replay
    must equal the sequential-LWW win/lose counts DuckDB derives from a
    running window max over seq order.  Any combiner miscount, double
    apply, or dropped conflict breaks the hash."""
    return _replay_events_through_engine(sf_dir, with_deletes=False,
                                         metrics=True)


def cdc_source_failover(sf_dir: str) -> pd.DataFrame:
    """Source-failover checkpoint translation (rayrep/failover.py): the
    lake commits half the stream from source A, then rebinds onto a
    promoted replica serving the SAME events under different epoch
    boundaries and resumes there. Oracle = the plain deletes-LWW SQL —
    the failover must be invisible to the final state."""
    return _replay_events_through_engine(sf_dir, with_deletes=True,
                                         rebind_failover=True)


def cdc_metrics_stream(sf_dir: str) -> pd.DataFrame:
    """The continuous metrics stream (rayrep/metrics.py — the codahale
    time-series analog, CHANGES.txt:79-80) against SQL: the per-epoch
    (input_rows, applied, conflict) lines the replay APPENDS to
    ``_manifests/metrics.jsonl`` at each barrier must equal the
    sequential-LWW win/lose counts DuckDB derives — the same oracle as
    ``cdc_replay_metrics``, but read back through the stream file, so a
    dropped/duplicated/torn emission breaks the hash."""
    return _replay_events_through_engine(sf_dir, with_deletes=False,
                                         metrics="stream")


def cdc_bootstrap_tail(sf_dir: str) -> pd.DataFrame:
    """The CDC onboarding flow (S2 + tail), SQL-oracled: a key-unique
    snapshot (each user's first first-half event) is bootstrapped into
    the changelog as an op='I' prefix via the blackhole-twin trick
    (snapshot = log prefix, reference README.md:14-15), then the
    second-half events replay on top as a U-op tail.  The converged
    table must equal the LWW fold of snapshot ∪ tail — pinning the
    SeqAllocator contract (every snapshot seq strictly below every tail
    seq) against SQL.  Snapshot build, changelog write, and replay are
    all distributed; the only driver values are B and next_seq."""
    import tempfile
    import uuid as _uuid

    from rayrep.bootstrap import bootstrap_snapshot
    from rayrep.config import EngineConfig
    from rayrep.pipeline import final_table, replay
    from rayrep.schema import SchemaVersion

    path = os.path.join(sf_dir, "events.parquet")
    max_eid = _parquet_col_max(path, "event_id")
    ds = rd.read_parquet(path, columns=EVENT_COLS[:5] + ["props"])
    if max_eid is None:
        from ray.data.aggregate import Max

        max_eid = ds.select_columns(["event_id"]).aggregate(Max("event_id"))[
            "max(event_id)"
        ]
    B = int(max_eid) + 1
    thr = (B + 1) // 2
    P = 16

    def tag_first_half(t: pa.Table) -> pa.Table:
        t = t.filter(pa.array(t.column("event_id").to_numpy() < thr))
        uid = t.column("user_id").to_numpy()
        return t.append_column("part_id", pa.array((uid % P).astype(np.int32)))

    def first_per_user(g: pa.Table) -> pa.Table:
        # the user's FIRST first-half event = the snapshot image row
        uid = g.column("user_id").to_numpy()
        eid = g.column("event_id").to_numpy()
        order = np.lexsort((eid, uid))
        u = uid[order]
        first = np.ones(len(u), dtype=bool)
        first[1:] = u[1:] != u[:-1]
        s = g.take(pa.array(order[first]))
        return pa.table({
            "conv_id": s.column("user_id").cast(pa.string()),
            "turn_idx": pa.array(np.zeros(s.num_rows, np.int32)),
            "event_id": s.column("event_id"),
            "event_type": s.column("event_type"),
            "value": s.column("value"),
            "props": s.column("props"),
            "ts": s.column("ts"),
        })

    snap = (ds.map_batches(tag_first_half, batch_format="pyarrow")
            .groupby("part_id").map_groups(first_per_user,
                                           batch_format="pyarrow"))

    sv = SchemaVersion(1, pa.schema([
        pa.field("conv_id", pa.string()), pa.field("turn_idx", pa.int32()),
        pa.field("event_id", pa.int64()), pa.field("event_type", pa.string()),
        pa.field("value", pa.float64()), pa.field("props", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]))
    d = tempfile.mkdtemp(prefix="rayrep_bt_", dir=_scratch_root())
    cl, lake = os.path.join(d, "cl"), os.path.join(d, "lake")
    man = bootstrap_snapshot(snap, cl, payload_json=sv.to_json())
    off = int(man["next_seq"])  # tail seqs strictly above the prefix

    def emit_tail(t: pa.Table) -> pa.Table:
        eid_all = t.column("event_id").to_numpy()
        t = t.filter(pa.array(eid_all >= thr))
        eid = eid_all[eid_all >= thr]
        n = t.num_rows
        tbl = pa.table({
            "seq": pa.array(eid + off),
            "txn_id": pa.nulls(n, pa.int64()),
            "op": pa.array(np.full(n, "U", dtype="U1")),
            "schema_ver": pa.array(np.ones(n, np.int32)),
            "conv_id": t.column("user_id").cast(pa.string()),
            "turn_idx": pa.array(np.zeros(n, np.int32)),
            "event_id": t.column("event_id"),
            "event_type": t.column("event_type"),
            "value": t.column("value"),
            "props": t.column("props"),
            "ts": t.column("ts"),
            "ddl": pa.nulls(n, pa.string()),
        })
        mid = thr + (B - thr + 1) // 2  # two tail epochs
        ep = np.where(eid < mid, 1, 2)
        for e in np.unique(ep):
            sub = tbl.filter(pa.array(ep == e))
            edir = os.path.join(cl, f"epoch-{int(e):05d}")
            os.makedirs(edir, exist_ok=True)
            fp = os.path.join(edir, f"part-{_uuid.uuid4().hex}.parquet")
            pq.write_table(sub, fp + ".tmp")
            os.replace(fp + ".tmp", fp)
        return pa.table({"rows": pa.array([n], pa.int64())})

    ds.map_batches(emit_tail, batch_format="pyarrow").take_all()
    cfg = EngineConfig(changelog_dir=cl, lake_dir=lake, num_partitions=16,
                       initial_schema_json=sv.to_json(), delta_output=False)
    replay(cfg)
    out = final_table(lake).to_pandas()
    out["user_id"] = out["conv_id"].astype("int64")
    return out[["event_id", "ts", "user_id", "event_type", "value", "props"]]


def cdc_bulk_load(sf_dir: str) -> pd.DataFrame:
    """The bulk-load onboarding flow (rayrep/bulkload.py), SQL-oracled
    against the SAME oracle as ``cdc_bootstrap_tail``: the snapshot
    (each user's first first-half event) loads DIRECTLY into partition
    state files — no changelog round-trip, no per-event LWW — then the
    second-half U-op tail replays on top through the normal engine.
    Identical final state to the bootstrap path is the whole contract
    (HBase bulkload analog; CHANGES.txt:97-98 snapshot-speed claim)."""
    import tempfile
    import uuid as _uuid

    from rayrep.bulkload import bulk_load
    from rayrep.config import EngineConfig
    from rayrep.pipeline import final_table, replay
    from rayrep.schema import SchemaVersion

    path = os.path.join(sf_dir, "events.parquet")
    max_eid = _parquet_col_max(path, "event_id")
    ds = rd.read_parquet(path, columns=EVENT_COLS[:5] + ["props"])
    if max_eid is None:
        from ray.data.aggregate import Max

        max_eid = ds.select_columns(["event_id"]).aggregate(Max("event_id"))[
            "max(event_id)"
        ]
    B = int(max_eid) + 1
    thr = (B + 1) // 2
    P = 16

    def tag_first_half(t: pa.Table) -> pa.Table:
        t = t.filter(pa.array(t.column("event_id").to_numpy() < thr))
        uid = t.column("user_id").to_numpy()
        return t.append_column("part_id", pa.array((uid % P).astype(np.int32)))

    def first_per_user(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy()
        eid = g.column("event_id").to_numpy()
        order = np.lexsort((eid, uid))
        u = uid[order]
        first = np.ones(len(u), dtype=bool)
        first[1:] = u[1:] != u[:-1]
        s = g.take(pa.array(order[first]))
        return pa.table({
            "conv_id": s.column("user_id").cast(pa.string()),
            "turn_idx": pa.array(np.zeros(s.num_rows, np.int32)),
            "event_id": s.column("event_id"),
            "event_type": s.column("event_type"),
            "value": s.column("value"),
            "props": s.column("props"),
            "ts": s.column("ts"),
        })

    snap = (ds.map_batches(tag_first_half, batch_format="pyarrow")
            .groupby("part_id").map_groups(first_per_user,
                                           batch_format="pyarrow"))

    sv = SchemaVersion(1, pa.schema([
        pa.field("conv_id", pa.string()), pa.field("turn_idx", pa.int32()),
        pa.field("event_id", pa.int64()), pa.field("event_type", pa.string()),
        pa.field("value", pa.float64()), pa.field("props", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]))
    d = tempfile.mkdtemp(prefix="rayrep_bl_", dir=_scratch_root())
    cl, lake = os.path.join(d, "cl"), os.path.join(d, "lake")
    os.makedirs(cl, exist_ok=True)
    cfg = EngineConfig(changelog_dir=cl, lake_dir=lake, num_partitions=16,
                       initial_schema_json=sv.to_json(), delta_output=False)
    man = bulk_load(cfg, snap, payload_json=sv.to_json())
    assert man["conflict"] == 0, man  # the snapshot is key-unique
    off = int(man["next_seq"])  # tail seqs strictly above the snapshot's

    def emit_tail(t: pa.Table) -> pa.Table:
        eid_all = t.column("event_id").to_numpy()
        t = t.filter(pa.array(eid_all >= thr))
        eid = eid_all[eid_all >= thr]
        n = t.num_rows
        tbl = pa.table({
            "seq": pa.array(eid + off),
            "txn_id": pa.nulls(n, pa.int64()),
            "op": pa.array(np.full(n, "U", dtype="U1")),
            "schema_ver": pa.array(np.ones(n, np.int32)),
            "conv_id": t.column("user_id").cast(pa.string()),
            "turn_idx": pa.array(np.zeros(n, np.int32)),
            "event_id": t.column("event_id"),
            "event_type": t.column("event_type"),
            "value": t.column("value"),
            "props": t.column("props"),
            "ts": t.column("ts"),
            "ddl": pa.nulls(n, pa.string()),
        })
        mid = thr + (B - thr + 1) // 2  # two tail epochs (1 and 2)
        ep = np.where(eid < mid, 1, 2)
        for e in np.unique(ep):
            sub = tbl.filter(pa.array(ep == e))
            edir = os.path.join(cl, f"epoch-{int(e):05d}")
            os.makedirs(edir, exist_ok=True)
            fp = os.path.join(edir, f"part-{_uuid.uuid4().hex}.parquet")
            pq.write_table(sub, fp + ".tmp")
            os.replace(fp + ".tmp", fp)
        return pa.table({"rows": pa.array([n], pa.int64())})

    ds.map_batches(emit_tail, batch_format="pyarrow").take_all()
    res = replay(cfg)
    # the resume starts ABOVE the bulk-loaded barrier: only the tail ran
    assert [e["epoch"] for e in res["epochs"]] == [1, 2], res["epochs"]
    out = final_table(lake).to_pandas()
    out["user_id"] = out["conv_id"].astype("int64")
    return out[["event_id", "ts", "user_id", "event_type", "value", "props"]]


def cdc_replay_rename(sf_dir: str) -> pd.DataFrame:
    """Mid-stream ``rename_column`` (props → meta) through the real
    engine, SQL-oracled: pre-rename epochs' files physically carry the OLD
    column name, so the applier's chain-conform step must migrate their
    payload into the renamed column instead of stranding it — the exact
    failure mode the per-file conform exists for.  Oracle = the LWW SQL
    with ``props AS meta``."""
    return _replay_events_through_engine(sf_dir, with_deletes=False,
                                         with_ddl=True,
                                         ddl_action="rename_column")


_MT_UNION_FIELDS = [
    ("seq", pa.int64()), ("op", pa.string()), ("table", pa.string()),
    ("conv_id", pa.string()), ("turn_idx", pa.int32()),
    ("event_id", pa.int64()), ("event_type", pa.string()),
    ("value", pa.float64()), ("props", pa.string()),
    ("n_chars", pa.int64()), ("lang", pa.string()), ("source", pa.string()),
    ("ts", pa.timestamp("us")), ("ddl", pa.string()),
]


def _mt_write_epochs(tbl: pa.Table, epoch: np.ndarray, cl_dir: str) -> None:
    import uuid as _u

    for e in np.unique(epoch):
        sub = tbl.filter(pa.array(epoch == e))
        edir = os.path.join(cl_dir, f"epoch-{int(e):05d}")
        os.makedirs(edir, exist_ok=True)
        fp = os.path.join(edir, f"part-{_u.uuid4().hex}.parquet")
        pq.write_table(sub, fp + ".tmp")
        os.replace(fp + ".tmp", fp)


def _mt_union_table(n: int, cols: dict) -> pa.Table:
    """One union-schema changelog slice: every multi-table part file
    carries the SAME field list (a parquet epoch dir must be schema-
    homogeneous), with the other table's payload columns null."""
    out = {}
    for name, typ in _MT_UNION_FIELDS:
        out[name] = cols.get(name, pa.nulls(n, typ))
    return pa.table(out)


def _emit_mt_conv_batch(batch: pa.Table, cl_dir: str, B: int) -> pa.Table:
    eid = batch.column("event_id").to_numpy()
    n = batch.num_rows
    tbl = _mt_union_table(n, {
        "seq": pa.array(eid * 2),
        "op": pa.array(np.full(n, "U", dtype="U1")),
        "table": pa.array(np.full(n, "conv", dtype="U4")),
        "conv_id": batch.column("user_id").cast(pa.string()),
        "turn_idx": pa.array(np.zeros(n, np.int32)),
        "event_id": batch.column("event_id"),
        "event_type": _arr_c(batch.column("event_type")),
        "value": _arr_c(batch.column("value")),
        "props": _arr_c(batch.column("props")),
        "ts": batch.column("ts"),
    })
    _mt_write_epochs(tbl, np.minimum(3, eid * 4 // B), cl_dir)
    return pa.table({"rows": pa.array([n], pa.int64())})


def _emit_mt_docs_batch(batch: pa.Table, cl_dir: str, B: int, D: int) -> pa.Table:
    """Docs-table slice: one INSERT per doc (epochs 0–2 by doc_id range)
    plus, for every 3rd doc, a later UPDATE (epoch 3, seq above every
    insert, newer ts) bumping n_chars by 7 — the update must override the
    insert through the SAME shuffle that carries the conv table."""
    did = batch.column("doc_id").to_numpy()
    n = batch.num_rows
    base_us = np.int64(1704067200_000_000)  # 2024-01-01 in µs
    ts_ins = pa.array(base_us + did * 1_000_000).cast(pa.timestamp("us"))
    ins = _mt_union_table(n, {
        "seq": pa.array(did * 2 + 1),
        "op": pa.array(np.full(n, "I", dtype="U1")),
        "table": pa.array(np.full(n, "docs", dtype="U4")),
        "conv_id": batch.column("doc_id").cast(pa.string()),
        "turn_idx": pa.array(np.zeros(n, np.int32)),
        "n_chars": _arr_c(batch.column("n_chars")),
        "lang": _arr_c(batch.column("lang")),
        "source": _arr_c(batch.column("source")),
        "ts": ts_ins,
    })
    _mt_write_epochs(ins, np.minimum(2, did * 3 // D), cl_dir)
    um = did % 3 == 0
    u = batch.filter(pa.array(um))
    du = did[um]
    m = len(du)
    if m:
        upd = _mt_union_table(m, {
            "seq": pa.array(2 * (B + D + du) + 1),
            "op": pa.array(np.full(m, "U", dtype="U1")),
            "table": pa.array(np.full(m, "docs", dtype="U4")),
            "conv_id": u.column("doc_id").cast(pa.string()),
            "turn_idx": pa.array(np.zeros(m, np.int32)),
            "n_chars": pa.array(u.column("n_chars").to_numpy() + 7),
            "lang": _arr_c(u.column("lang")),
            "source": _arr_c(u.column("source")),
            "ts": pa.array(base_us + du * 1_000_000 + 86_400_000_000
                           ).cast(pa.timestamp("us")),
        })
        _mt_write_epochs(upd, np.full(m, 3, np.int64), cl_dir)
    return pa.table({"rows": pa.array([n], pa.int64())})


def _mt_fixture(sf_dir: str) -> str:
    """Cached two-table interleaved changelog (conv = events-derived,
    docs = documents-derived with late updates): disjoint seq spaces
    (even/odd), per-table seq monotone across epochs, one union schema."""
    key = ["mtfix-v1", *_table_key(sf_dir, "events"),
           *_table_key(sf_dir, "documents")]

    def build(stage: str) -> None:
        B = int(_parquet_col_max(
            os.path.join(sf_dir, "events.parquet"), "event_id")) + 1
        D = int(_parquet_col_max(
            os.path.join(sf_dir, "documents.parquet"), "doc_id")) + 1
        (rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=EVENT_COLS[:5] + ["props"])
         .map_batches(_emit_mt_conv_batch,
                      fn_kwargs={"cl_dir": stage, "B": B},
                      batch_format="pyarrow").take_all())
        (rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "n_chars", "lang", "source"])
         .map_batches(_emit_mt_docs_batch,
                      fn_kwargs={"cl_dir": stage, "B": B, "D": D},
                      batch_format="pyarrow").take_all())

    return _disk_cached_dir("mtfix", key, build)


def _mt_replay(sf_dir: str) -> dict:
    """Run the one-read one-shuffle multi-table replay (rayrep/multitable)
    over the cached two-table fixture; returns the per-table lake dirs."""
    import tempfile

    from rayrep.multitable import replay_multi
    from rayrep.schema import SchemaVersion

    cl = _mt_fixture(sf_dir)
    d = tempfile.mkdtemp(prefix="rayrep_mt_", dir=_scratch_root())
    sv_conv = SchemaVersion(1, pa.schema([
        pa.field("conv_id", pa.string()), pa.field("turn_idx", pa.int32()),
        pa.field("event_id", pa.int64()), pa.field("event_type", pa.string()),
        pa.field("value", pa.float64()), pa.field("props", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]))
    sv_docs = SchemaVersion(1, pa.schema([
        pa.field("conv_id", pa.string()), pa.field("turn_idx", pa.int32()),
        pa.field("n_chars", pa.int64()), pa.field("lang", pa.string()),
        pa.field("source", pa.string()), pa.field("ts", pa.timestamp("us")),
    ]))
    tables = {
        "conv": {"lake_dir": os.path.join(d, "conv"),
                 "schema_json": sv_conv.to_json()},
        "docs": {"lake_dir": os.path.join(d, "docs"),
                 "schema_json": sv_docs.to_json()},
    }
    replay_multi(cl, tables, num_partitions=16)
    return tables


def cdc_multi_table_conv(sf_dir: str) -> pd.DataFrame:
    """Whole-schema replication, table 1 of 2, SQL-oracled: BOTH tables'
    events ride one changelog read and ONE composite-id packed shuffle
    (rayrep/multitable.py — the reference replicates every table of a
    MySQL schema from the same binlog, README.md:14-16); the conv lake
    must still converge to the standard events LWW oracle.  Cross-table
    contamination, a composite-id routing slip, or a schema mix-up in
    the shared exchange breaks the hash."""
    from rayrep.pipeline import final_table

    tables = _mt_replay(sf_dir)
    out = final_table(tables["conv"]["lake_dir"]).to_pandas()
    out["user_id"] = out["conv_id"].astype("int64")
    return out[["event_id", "ts", "user_id", "event_type", "value", "props"]]


def cdc_multi_table_docs(sf_dir: str) -> pd.DataFrame:
    """Whole-schema replication, table 2 of 2 (same single replay shape):
    the docs lake — inserts in epochs 0–2, every-3rd-doc updates in epoch
    3 — must show exactly the updated n_chars for doc_id % 3 == 0 and the
    original otherwise; an update that lost LWW to its own insert, leaked
    into the conv lake, or was dropped by the composite routing breaks
    the hash."""
    from rayrep.pipeline import final_table

    tables = _mt_replay(sf_dir)
    out = final_table(tables["docs"]["lake_dir"]).to_pandas()
    out["doc_id"] = out["conv_id"].astype("int64")
    return (out[["doc_id", "n_chars", "lang", "source"]]
            .sort_values("doc_id").reset_index(drop=True))


def cdc_lake_diff(sf_dir: str) -> pd.DataFrame:
    """Replication audit (check.diff_lakes), SQL-oracled: replay the
    tombstoned changelog into lake A, clone it to lake B, erase every
    user_id % 10 == 3 key from B, then diff — P independent per-partition
    fold+merge tasks, NO shuffle, only differing keys ever reach the
    driver.  The diff must report exactly the erased-AND-live keys as
    ``only_a`` (erased keys whose LWW winner was a delete were never live,
    so a diff that consults raw chains instead of the folded image, or
    misses the erasure filter on either side, breaks the hash).  Reference
    analog: the MySQL-vs-HBase row validator (README.md:24-26)."""
    import shutil
    import tempfile

    from rayrep.check import diff_lakes
    from rayrep.config import EngineConfig
    from rayrep.pipeline import replay
    from rayrep.retention import erase_keys
    from rayrep.schema import SchemaVersion

    cl, _B = _changelog_fixture(sf_dir, with_deletes=True, with_ddl=False,
                                mask_cells=False, ddl_action="add_column")
    d = tempfile.mkdtemp(prefix="rayrep_diff_", dir=_scratch_root())
    lake_a, lake_b = os.path.join(d, "a"), os.path.join(d, "b")
    sv = SchemaVersion(1, pa.schema([
        pa.field("conv_id", pa.string()), pa.field("turn_idx", pa.int32()),
        pa.field("event_id", pa.int64()), pa.field("event_type", pa.string()),
        pa.field("value", pa.float64()), pa.field("props", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]))
    replay(EngineConfig(changelog_dir=cl, lake_dir=lake_a,
                        num_partitions=16, initial_schema_json=sv.to_json()))
    shutil.copytree(lake_a, lake_b)
    uids = np.unique(
        pq.read_table(os.path.join(sf_dir, "events.parquet"),
                      columns=["user_id"]).column("user_id").to_numpy())
    erase_keys(lake_b, [str(u) for u in uids if u % 10 == 3])
    diff = diff_lakes(lake_a, lake_b, distributed=True).to_pandas()
    diff["user_id"] = diff["conv_id"].astype("int64")
    return (diff[["user_id", "status"]]
            .sort_values("user_id").reset_index(drop=True))


def cdc_log_integrity(sf_dir: str) -> pd.DataFrame:
    """Changelog integrity audit (``rayrep/checklog.py``) over the shared
    deletes changelog fixture: one pruned streaming pass computes per-epoch
    row count / seq range / mul-mod hash-sum, and the DENSITY VERDICT — the
    epoch's seq multiset equals its contiguous [min,max] range iff the
    count matches AND the wrapped hash-sum equals the same sum over the
    range. The oracle recomputes count/min/max/hash-sum from the events
    view (seq = event_id, epoch = least(3, event_id*4 // B)) AND the
    expected range hash-sum via ``generate_series`` in overflow-free
    HUGEINT arithmetic, so the engine's verdict itself is hash-verified —
    not just the stats it is derived from. Reference analog: the
    source-side half of the replication validator (README.md:19-20)."""
    from rayrep.checklog import check_changelog

    cl, _B = _changelog_fixture(sf_dir, with_deletes=True, with_ddl=False,
                                mask_cells=False, ddl_action="add_column")
    rep = check_changelog(cl)
    assert rep["ok"], rep["errors"]  # the fixture is healthy by contract
    df = pd.DataFrame(rep["epochs"])
    return df[["epoch", "n_rows", "min_seq", "max_seq", "hashsum", "dense"]]


def cdc_replay_drop_column(sf_dir: str) -> pd.DataFrame:
    """Mid-stream ``drop_column`` (props) through the real engine,
    SQL-oracled: pre-drop epochs' files — and the already-committed state
    rows — physically carry the column, so the applier's chain-conform
    step must shed it at merge-on-read while post-drop files (which lack
    it entirely) apply cleanly.  Completes the M9 DDL trio
    (add/rename/drop, reference schema evolution) end-to-end; oracle =
    the LWW SQL without ``props``."""
    return _replay_events_through_engine(sf_dir, with_deletes=False,
                                         with_ddl=True,
                                         ddl_action="drop_column")


def cdc_replay_alter_type(sf_dir: str) -> pd.DataFrame:
    """Mid-stream ``alter_type`` (MySQL ALTER ... MODIFY: event_id int64 →
    string) through the real engine, SQL-oracled: post-ALTER epoch files
    physically carry the converted type while pre-ALTER committed state
    rows cast at the version-exact chain conform (the file's stamped
    version drives the step replay).  Extends M9 beyond the add/rename/
    drop trio; oracle = the LWW SQL with CAST(event_id AS VARCHAR)."""
    return _replay_events_through_engine(sf_dir, with_deletes=False,
                                         with_ddl=True,
                                         ddl_action="alter_type")


def cdc_partition_repair(sf_dir: str) -> pd.DataFrame:
    """Targeted partition repair through the real engine, SQL-oracled:
    after a full committed replay, two partitions are destroyed (one
    with its manifest — fresh-disk loss; one keeping it — the nastier
    watermark-intact corruption) and rebuilt from the changelog by
    ``repair_partitions`` — only their rows re-shuffle, the barrier
    never moves, healthy partitions stay untouched.  Oracle = the plain
    deletes-LWW SQL: a correct repair is indistinguishable from an
    undamaged replay (reference analog: the validator's targeted
    re-copy, README.md:19-20)."""
    return _replay_events_through_engine(sf_dir, with_deletes=True,
                                         repair=True)


def cdc_replay_chaos(sf_dir: str) -> pd.DataFrame:
    """Exactly-once UNDER FAILURES, SQL-oracled: the deletes replay with a
    5% injected applier crash rate (reference Chaos Monkey,
    CHANGES.txt:126).  Crashed tasks retry against deterministic
    tmp+rename writes and committed-manifest watermarks, so the converged
    table must be bit-identical to the no-chaos oracle — any double-apply
    or lost write breaks the hash match."""
    return _replay_events_through_engine(sf_dir, with_deletes=True,
                                         chaos=0.05)


def cdc_replay_resume(sf_dir: str) -> pd.DataFrame:
    """Kill/resume mid-replay, SQL-oracled: run to the epoch-1 barrier,
    then resume; the second run must re-apply ONLY the uncommitted tail
    (watermark anti-join skips redelivered events) and converge to the
    identical LWW table."""
    return _replay_events_through_engine(sf_dir, with_deletes=False,
                                         resume_split=True)


def cdc_lease_failover(sf_dir: str) -> pd.DataFrame:
    """HA single-writer failover, SQL-oracled end-to-end: writer A replays
    under the lake lease to the epoch-1 barrier and crashes (live stale
    lease left behind); a non-takeover successor is refused; the elected
    successor fences A by token order and converges; A's zombie renew AND
    manifest commit are both refused.  The converged table must equal the
    plain deletes LWW oracle — leader election is invisible to state.
    Reference: ZooKeeper leader election + pGTID handoff
    (README.md:17-20, CHANGES.txt:74,82)."""
    return _replay_events_through_engine(sf_dir, with_deletes=True,
                                         lease_failover=True)


def cdc_log_trim(sf_dir: str) -> pd.DataFrame:
    """Changelog retention through the real engine, SQL-oracled: replay
    the deletes changelog to the epoch-1 barrier, TRIM the committed
    prefix (retention.trim_changelog — the MySQL binlog-expiry analog:
    floor marker written atomically BEFORE deletion), prove a fresh
    full-history consumer refuses with TrimmedLogError, then resume the
    committed lake against the trimmed log.  Oracle = the plain
    deletes-LWW SQL over the FULL history: a correct trim is invisible
    to any lake already committed past the floor."""
    return _replay_events_through_engine(sf_dir, with_deletes=True,
                                         trim_after_barrier=True)


def cdc_dead_letter(sf_dir: str) -> pd.DataFrame:
    """Poison-message quarantine, SQL-oracled (EngineConfig.dead_letter):
    malformed rows (null routing key / ts / seq) are injected into every
    epoch of the deletes changelog; the replay diverts them to
    ``lake/dlq/e{epoch}/`` and applies the rest, across a resume
    boundary.  Oracle = the plain deletes-LWW SQL (poison must be
    invisible to the converged table); the dlq is asserted to hold
    exactly the injected rows — the reference's fail-fast model would
    instead HALT replication on the first bad producer row."""
    return _replay_events_through_engine(sf_dir, with_deletes=True,
                                         dead_letter=True)


def cdc_dlq_requeue(sf_dir: str) -> pd.DataFrame:
    """The full poison-message LOOP, SQL-oracled: inject malformed rows
    → quarantine them during replay (``cdc_dead_letter``'s path) →
    REPAIR them (``sinks.requeue_dlq`` with an operator fix_fn: existing
    key, ancient ts) → republish as a proper epoch with fresh dense seqs
    chaining from the log's high-water mark → resume applies the epoch
    through the standard path (every repaired row loses LWW as asserted
    conflicts) and the active dlq drains.  Oracle = the plain
    deletes-LWW SQL: the whole round trip must be invisible to the
    converged table."""
    return _replay_events_through_engine(sf_dir, with_deletes=True,
                                         dead_letter=True,
                                         dlq_requeue=True)


def cdc_secondary_index(sf_dir: str) -> pd.DataFrame:
    """Secondary index serving a value-equality query, SQL-oracled
    (rayrep/secindex.py — the Phoenix/Lily-indexer pattern over the
    reference's change stream): the event_type → (conv_id, turn_idx)
    index is maintained INCREMENTALLY from the daily-delta stream (two
    refreshes; retractions from updates/deletes cross the boundary),
    then "rows WHERE event_type='click'" is served by probing the one
    hash('click') index partition and point-looking-up the matched keys
    via the pinned routing — never a lake scan.  Oracle = the
    deletes-LWW SQL under the same predicate."""
    return _replay_events_through_engine(sf_dir, with_deletes=True,
                                         sec_index=True)


def cdc_log_compaction(sf_dir: str) -> pd.DataFrame:
    """Kafka-style changelog compaction, SQL-oracled (rayrep/logcompact.py):
    compact epochs 0-2 of the deletes changelog to latest-event-per-key
    (tombstones retained, original seq/ts preserved; the active tail
    epoch stays plain), verify the span receipt with check-log, then
    FRESH-replay the compacted log through the real engine.  Oracle =
    the plain deletes-LWW SQL over the FULL history: compaction keeps
    exactly what final-state replay needs — log storage becomes O(live
    keys) instead of O(history) at the 10^10-event design scale, and the
    log stays fully replayable (unlike trim-log)."""
    return _replay_events_through_engine(sf_dir, with_deletes=True,
                                         compact_log="fresh")


def cdc_log_compaction_resume(sf_dir: str) -> pd.DataFrame:
    """Log compaction landing MID-HISTORY, SQL-oracled: the lake commits
    the epoch-1 barrier first, THEN epochs 0-2 are compacted (the span
    straddles the barrier), then the lake resumes against the compacted
    log.  Convergence to the full-history deletes-LWW SQL proves the
    watermark anti-join composes with compaction: retained events at or
    below the watermark are skipped (already applied), retained events
    above it are each their key's overall LWW winner and beat whatever
    row the lake holds, and the discarded events were ts-losers the full
    replay would have rejected anyway."""
    return _replay_events_through_engine(sf_dir, with_deletes=True,
                                         compact_log="resume")


def cdc_log_compaction_evolution(sf_dir: str) -> pd.DataFrame:
    """Log compaction ACROSS a mid-stream DDL, SQL-oracled: the span
    [0, 2] contains the add_column DDL, so the compactor pre-evolves
    every retained event's payload stepwise to the span's final schema
    version (the same ``evolve_table_from`` the augmenter would apply
    lazily) while the DDL event itself rides the span with its original
    seq — a fresh replay rebuilds the identical schema-version chain and
    must converge to the same evolution LWW SQL as the uncompacted
    fixture path."""
    return _replay_events_through_engine(sf_dir, with_deletes=False,
                                         with_ddl=True,
                                         compact_log="fresh")


def cdc_log_compaction_cells(sf_dir: str) -> pd.DataFrame:
    """CELLS-mode log compaction, SQL-oracled: the changed-cells fixture
    (null = "unchanged") compacts with the per-cell winner-set retention
    (``prune_cells`` — row-mode latest-per-key would lose older partial-
    update carriers and is refused for per-cell replays), then a fresh
    per-cell replay must converge to the same last-non-null-per-column
    SQL as the uncompacted path."""
    return _replay_events_through_engine(sf_dir, with_deletes=False,
                                         changed_cells=True,
                                         compact_log="fresh")


def cdc_lake_clone(sf_dir: str) -> pd.DataFrame:
    """DR drill, SQL-oracled (rayrep/clone.py): replay the deletes
    changelog to the epoch-1 barrier, take a barrier-consistent hardlink
    clone (HBase-snapshot analog: manifests + immutable files, O(files)
    metadata), then RESUME THE REPLAY INTO THE CLONE while the source
    stays frozen at its barrier (asserted).  Oracle = the plain
    deletes-LWW SQL: backup + restore + resume must be invisible to the
    converged state."""
    return _replay_events_through_engine(sf_dir, with_deletes=True,
                                         clone_resume=True)


def cdc_json_ingest(sf_dir: str) -> pd.DataFrame:
    """External-source ingest round-trip, SQL-oracled (rayrep/ingest.py):
    the deletes changelog is exported to Debezium-style JSONL envelopes
    (op c/u/d, before/after images with nulls omitted, ts_ms+ts_us,
    binlog source positions) and re-ingested into a fresh engine
    changelog — dense seq and schema_ver re-assigned from the stream —
    then replayed through the real engine.  Oracle = the plain
    deletes-LWW SQL: the envelope encode→parse→stamp path must be
    loss-free down to the hash."""
    return _replay_events_through_engine(sf_dir, with_deletes=True,
                                         via_envelopes=True)


def cdc_json_ingest_evolution(sf_dir: str) -> pd.DataFrame:
    """Envelope round-trip WITH mid-stream DDL: the add_column DDL rides
    the JSONL stream as an ``op:"ddl"`` envelope (in binlog order, like
    the reference's in-stream schema events) and post-DDL after-images
    carry the new column; ingest re-stamps version-exact ``schema_ver``
    from the cumulative DDL count and the replay must converge to the
    same evolution LWW SQL as the native-fixture path."""
    return _replay_events_through_engine(sf_dir, with_deletes=False,
                                         with_ddl=True,
                                         via_envelopes=True)


def cdc_point_lookup(sf_dir: str) -> pd.DataFrame:
    """Key-addressed serving read, SQL-oracled (rayrep/lookup.py — the
    HBase get/row-key analog, CHANGES.txt:102-104): after a committed
    deletes replay, fetch the rows for ``user_id % 53 == 5`` by probing
    ONLY the partitions the pinned routing hash names (plan-size asserted
    inside), with the key predicate pushed into every chain-file read.
    Oracle = the deletes-LWW SQL under the same predicate: the pruned
    read must be indistinguishable from filtering a full scan."""
    return _replay_events_through_engine(sf_dir, with_deletes=True,
                                         point_lookup_mod=53)


def cdc_downstream_replica(sf_dir: str) -> pd.DataFrame:
    """Downstream consumer parity, SQL-oracled: rebuild the latest-image
    table from the daily-delta STREAM alone (the reference's Kafka
    applier analog) — one hash shuffle of day-netted delta rows, per-
    partition LWW argmax, tombstones dropped.  Must equal the engine's
    own converged table, i.e. the deletes LWW oracle."""
    return _replay_events_through_engine(sf_dir, with_deletes=True,
                                         replica=True)


def cdc_epoch_snapshot(sf_dir: str) -> pd.DataFrame:
    """Engine replay HALTED at the epoch-1 barrier (``end_epoch=1``): the
    lake must contain exactly the LWW fold of the first two epochs'
    events and nothing newer — the epoch-prefix contract the resume path
    and the point-in-time reader rely on, pinned against SQL (oracle =
    LWW over ``event_id*4 // B <= 1``, the fixture's epoch rule)."""
    return _replay_events_through_engine(sf_dir, with_deletes=False,
                                         end_epoch=1)


def cdc_delta_rollup(sf_dir: str) -> pd.DataFrame:
    """SQL-oracles the S7 daily-delta SIDE OUTPUT itself (not just the
    converged table): real-engine replay with ``delta_output=True``, then
    a distributed rollup of the delta files.  The oracle recomputes the
    engine's exact contract in SQL — sequential LWW wins via a running
    window max over seq order, then the per (key, epoch, utc-day) net
    winner by (ts, seq) — so this is the first end-to-end SQL pin on the
    map-side-combined delta netting (the round-2 ADVICE medium item)."""
    return _replay_events_through_engine(sf_dir, with_deletes=False,
                                         delta_rollup=True)


def cdc_replay_deletes(sf_dir: str) -> pd.DataFrame:
    """Flagship variant with TOMBSTONES driver-oracled: every 7th event is
    a delete (payload nulled); a user whose LWW-latest event is a delete
    must be ABSENT from the converged table, and a delete overwritten by a
    later event resurrects the row — mirrored exactly in the SQL."""
    return _replay_events_through_engine(sf_dir, with_deletes=True)


def cdc_rollback(sf_dir: str) -> pd.DataFrame:
    """In-place rollback drill (rayrep/rollback.py), SQL-oracled with
    tombstones in play: replay all four epochs, rewind the lake to the
    epoch-1 barrier (manifests restore their recorded history entries;
    the chain suffix is deleted — O(files), no replay), then resume.
    The resumed lake must hash-match the full-history deletes-LWW SQL,
    proving the restored watermarks/counters re-admitted EXACTLY the
    rolled-back events (a stale watermark would skip them; a reset-to-
    zero one would double-apply the prefix)."""
    return _replay_events_through_engine(sf_dir, with_deletes=True,
                                         rollback_drill=True)


def cdc_repartition(sf_dir: str) -> pd.DataFrame:
    """Mid-stream cluster rescale, SQL-oracled (rayrep/repart.py): two
    epochs commit at P=16, the lake repartitions offline to P=11 (per-
    source-partition fold → disjoint-key shards, NO shuffle), and the
    remaining epochs — tombstones included — replay into the rescaled
    lake. The converged table must equal the uninterrupted deletes LWW
    oracle: a routing drift, lost watermark, or dropped/duplicated state
    row across the rescale breaks the hash."""
    return _replay_events_through_engine(sf_dir, with_deletes=True,
                                         repartition_to=11)


def cdc_replica_incremental(sf_dir: str) -> pd.DataFrame:
    """Maintained downstream replica (sinks.update_replica), SQL-oracled:
    the delta stream applies in TWO watermarked refreshes (epochs ≤1,
    then the rest) instead of one full rebuild — refresh I/O ∝ new
    deltas. Internal tombstones persist across the refresh boundary
    (self-contained fold, exact under re-applied suffixes); a replica
    that lost a delete or double-applied a refresh breaks the hash.
    Result must equal the uninterrupted deletes LWW oracle."""
    return _replay_events_through_engine(sf_dir, with_deletes=True,
                                         replica_incremental=True)


def cdc_incremental_view(sf_dir: str) -> pd.DataFrame:
    """Incrementally maintained aggregate view (rayrep/views.py),
    SQL-oracled: `GROUP BY event_type: COUNT(*), SUM(fixed-point value)`
    kept current from the delta stream alone across TWO watermarked
    refreshes — updates RETRACT the old group's contribution (a key whose
    event_type changes moves between groups), deletes retract, and
    tombstone resurrection re-adds. Must equal a full GROUP BY over the
    deletes-LWW final state; a lost retraction, double-applied refresh,
    or float-ordering drift breaks the hash (sums are int64 fixed
    point)."""
    return _replay_events_through_engine(sf_dir, with_deletes=True,
                                         view=True)


def cdc_erasure(sf_dir: str) -> pd.DataFrame:
    """Targeted erasure (GDPR; rayrep/retention.py), SQL-oracled: after a
    tombstoned replay, every key with user_id % 10 == 3 is erased; the
    read-side anti-filter must hide them IMMEDIATELY (no purge runs
    here). Oracle = deletes LWW minus the erased users."""
    return _replay_events_through_engine(sf_dir, with_deletes=True,
                                         erase_mod=10)


def cdc_retention(sf_dir: str) -> pd.DataFrame:
    """Physical retention purge (HBase-TTL analog), SQL-oracled: after a
    tombstoned replay, ``purge_lake`` rewrites every chain dropping rows
    — live and tombstone — below the 99.9% point of the events ts range
    (that high on purpose: LWW winners are each user's LATEST ts, so any
    lower cutoff drops nothing and the oracle cannot discriminate). The surviving table must equal the
    deletes LWW oracle restricted to rows at-or-above the same
    integer-µs cutoff; a purge that consulted the wrong
    LWW ts, kept an expired winner, or dropped a boundary row (>= vs >)
    breaks the hash."""
    return _replay_events_through_engine(sf_dir, with_deletes=True,
                                         purge_mid_ts=True)


def cdc_replay_evolution(sf_dir: str) -> pd.DataFrame:
    """The schema-evolution flagship WITH A DRIVER ORACLE: an events-derived
    changelog with one mid-stream ``add_column`` DDL replayed through the
    real engine (registry picks up the DDL between rounds; pre-DDL epoch
    files physically lack the column; pre-DDL state rows are conformed with
    nulls at merge-on-read). The DuckDB oracle mirrors it exactly: LWW
    winner per user plus ``note`` = CAST(event_id AS VARCHAR) only for
    post-DDL winners (event_id >= ceil((max+1)/2)), NULL backfill
    otherwise."""
    return _replay_events_through_engine(sf_dir, with_deletes=False, with_ddl=True)


def cdc_replay_changed_cells(sf_dir: str) -> pd.DataFrame:
    """Changed-cells mode WITH A DRIVER ORACLE: an events-derived changelog
    where every 3rd event leaves ``value`` untouched and every 5th leaves
    ``props`` untouched (null = "unchanged", CHANGES.txt:173), replayed
    through the real engine with ``per_cell_conflicts=True`` — per
    (key, column) the max-(ts, event_id) non-null version wins, which
    DuckDB mirrors with ``last_value(... IGNORE NULLS)`` over the version
    window. Exercises the round-3 delta-chain + vectorized cell fold end
    to end against SQL."""
    return _replay_events_through_engine(sf_dir, with_deletes=False,
                                         changed_cells=True)


def cdc_replay_cells_compacted(sf_dir: str) -> pd.DataFrame:
    """Changed-cells replay with compaction forced after EVERY epoch
    (``state_snapshot_interval=1``): each epoch's apply resolves against a
    chain already rewritten by the version-preserving ``prune_cells``
    (each cell winner keeps its own ts/seq — HBase per-cell timestamps
    survive compaction). Same SQL oracle as ``cdc_replay_changed_cells``:
    compaction must be invisible to the converged table, hash-verified at
    driver scale."""
    return _replay_events_through_engine(sf_dir, with_deletes=False,
                                         changed_cells=True,
                                         snapshot_interval=1)


def cdc_replay_cells_deletes_compacted(sf_dir: str) -> pd.DataFrame:
    """Per-cell + deletes + per-epoch compaction: the pruned chain must
    also carry each key's last-DELETE row with its own version, so a
    later event older than the delete stays masked across a compaction
    boundary. Oracle = the deletes LWW SQL over cell-masked inputs."""
    return _replay_events_through_engine(sf_dir, with_deletes=True,
                                         changed_cells=True,
                                         snapshot_interval=1)


def _transcripts_dump_path() -> str:
    """Stable path where ``cdc_replay_transcripts`` dumps its generated
    changelog so the DuckDB oracle can ``read_parquet`` the identical
    input (the generator stream is PCG64-deterministic but not SQL-
    expressible from the events view)."""
    return os.path.join(_scratch_root(), "rayrep_transcripts_changelog.parquet")


def cdc_replay_transcripts(sf_dir: str) -> pd.DataFrame:
    """The flagship, now SQL-ORACLED: full streaming CDC replay (augment →
    shuffle → applier → manifests) on a deterministic generated changelog
    sized to the sf tier — tombstones, resurrection, ts inversions AND a
    mid-stream ``add_column`` DDL.  The generated log is dumped once to
    ``_transcripts_dump_path()``; the oracle replays the exact semantics
    in SQL over that dump (LWW winner per (conv_id, turn_idx) by
    (ts, seq), winner-delete absent, pre-DDL winners' ``tool`` NULL)."""
    import tempfile

    from rayrep.config import EngineConfig
    from rayrep.gen import GenSpec, generate_changelog, write_changelog
    from rayrep.pipeline import final_table_pandas, replay

    lake, _ = _transcripts_lake(sf_dir)
    from rayrep.pipeline import final_table_pandas

    return final_table_pandas(lake)


def _export_dump_path() -> str:
    """Separate stable dump for the training-export flagship (its spec
    pads text, so it must not clobber ``cdc_replay_transcripts``' dump)."""
    return os.path.join(_scratch_root(),
                        "rayrep_training_export_changelog.parquet")


# training-export pins (mirrored verbatim in the SQL oracle)
_EXPORT_CAP = 512          # packing context capacity (tokens)
_EXPORT_MIN_LEN = 20       # CleanText quality threshold (chars)
_EXPORT_GID_M = 1_000_000  # gid = conv_number * M + turn_idx


def cdc_training_export(sf_dir: str) -> pd.DataFrame:
    """Lake → training-data export, the A+B composition flagship: replay
    the transcript changelog through the real engine, then run the
    training-prep pipeline OVER THE CONVERGED LAKE as one streaming
    Dataset — deterministic dup/short plants (SQL-mirrored; every 5th
    conversation shares one text per turn, every 7th truncates under the
    quality bar) → C4-style CleanText (URL strip, whitespace collapse,
    length filter) → exact dedup (hash-pair shuffle, min-gid winner,
    text never shuffles) → whitespace token counts → concat-and-chunk
    sequence packing via the distributed global prefix sum.  Every stage
    is an existing oracled operator; this pins their COMPOSITION (and
    that the lake read streams into it) end-to-end against one SQL
    replay.  gid = conv_number·10^6 + turn_idx is the packing order —
    zero-padded conv ids make it lexicographic-consistent."""
    from rayrep.ops.dedup import exact_dedup_rows
    from rayrep.ops.pack import pack_sequences_ds
    from rayrep.ops.text import CleanText
    from rayrep.pipeline import final_table

    lake, _ = _transcripts_lake(sf_dir, text_pad=120,
                                dump_path=_export_dump_path())
    ds = final_table(lake)

    def plant(t: pa.Table) -> pa.Table:
        conv = t.column("conv_id")
        if isinstance(conv, pa.ChunkedArray):
            conv = conv.combine_chunks()
        cnum = pc.cast(pc.utf8_slice_codeunits(conv, 1), pa.int64())
        turn = pc.cast(t.column("turn_idx"), pa.int64())
        gid = pc.add(pc.multiply(cnum, pa.scalar(_EXPORT_GID_M, pa.int64())),
                     turn)
        text = t.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        cn = cnum.to_numpy()
        dup = pc.binary_join_element_wise(
            pa.scalar("duplicate turn payload number"),
            pc.cast(turn, pa.string()), " ")
        text = pc.if_else(pa.array(cn % 5 == 0), dup, text)
        text = pc.if_else(pa.array((cn % 7 == 0) & (cn % 5 != 0)),
                          pc.utf8_slice_codeunits(text, 0, 10), text)
        dirty = pc.binary_join_element_wise(
            pa.scalar("http://spam.example/"), pc.cast(gid, pa.string()),
            pa.scalar("  "), text, pa.scalar(" "), "")
        return pa.table({"gid": gid, "text": dirty})

    staged = ds.map_batches(plant, batch_format="pyarrow",
                            zero_copy_batch=True)
    cleaned = staged.map_batches(CleanText(min_len=_EXPORT_MIN_LEN),
                                 batch_format="pyarrow")
    uniq = exact_dedup_rows(cleaned, text_col="clean_text", id_col="gid")
    packed = pack_sequences_ds(uniq, capacity=_EXPORT_CAP, chunk=256,
                               id_col="gid", text_col="clean_text")
    out = packed.to_pandas()  # result-sized: one skinny row per kept turn
    out["n_tokens"] = out["n_tokens"].astype(np.int64)
    out["bin_id"] = out["bin_id"].astype(np.int64)
    return (out[["gid", "n_tokens", "bin_id"]]
            .sort_values("gid").reset_index(drop=True))


def _transcripts_lake(sf_dir: str, text_pad: int = 0,
                      dump_path: str | None = None) -> tuple[str, str]:
    """Generate the sf-sized deterministic transcript changelog, dump it
    to a stable parquet path (the oracle's input), and replay it through
    the real engine.  Returns (lake_dir, dump_path)."""
    import tempfile

    from rayrep.config import EngineConfig
    from rayrep.gen import GenSpec, generate_changelog, write_changelog
    from rayrep.pipeline import replay

    n_events = max(2000, pq.read_metadata(os.path.join(sf_dir, "events.parquet")).num_rows)
    d = tempfile.mkdtemp(prefix="rayrep_q_", dir=_scratch_root())
    cl, lake = os.path.join(d, "cl"), os.path.join(d, "lake")
    spec = GenSpec(seed=42, n_events=n_events,
                   n_conversations=max(50, n_events // 50),
                   n_epochs=4, zipf_a=1.1, text_pad=text_pad)
    table = generate_changelog(spec)
    write_changelog(cl, spec, table=table)
    dump = dump_path or _transcripts_dump_path()
    tmp = f"{dump}.tmp{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, dump)
    cfg = EngineConfig(changelog_dir=cl, lake_dir=lake, num_partitions=16,
                       applier_concurrency=4)
    replay(cfg)
    return lake, dump


def _emit_ingest_dedup_batch(batch: pa.Table, cl_dir: str, N: int) -> pa.Table:
    """Per-batch emitter for the dedup-on-ingest fixture (runs on workers):
    documents become I events (seq = doc_id, 4 contiguous-seq epochs by
    doc_id range) with a deterministically duplicated ``content`` payload
    (lang|source|n_chars%13 — many-to-one, so re-crawled bodies exist), and
    every 10th doc gets a later U event (seq = N + doc_id, epoch 4) bumping
    ``n_chars`` — updates must PASS THROUGH dedup untouched."""
    import uuid

    did = batch.column("doc_id").to_numpy()
    n = batch.num_rows
    lang, source = _arr_c(batch.column("lang")), _arr_c(batch.column("source"))
    nch = batch.column("n_chars").to_numpy()
    content = pc.binary_join_element_wise(
        lang, source, pc.cast(pa.array(nch % 13), pa.string()), "|"
    )
    base = 1_700_000_000_000_000  # fixed ts origin (us)

    def rows(op: str, dids, cont, lng, src, nch_vals, seq_off: int) -> pa.Table:
        m = len(dids)
        return pa.table({
            "seq": pa.array(seq_off + dids, pa.int64()),
            "txn_id": pa.nulls(m, pa.int64()),
            "op": pa.array([op] * m),
            "schema_ver": pa.array(np.ones(m, np.int32)),
            "conv_id": pc.cast(pa.array(dids), pa.string()),
            "turn_idx": pa.array(np.zeros(m, np.int32)),
            "content": cont,
            "lang": lng,
            "source": src,
            "n_chars": pa.array(nch_vals, pa.int64()),
            "ts": pa.array(base + seq_off + dids, pa.timestamp("us")),
            "ddl": pa.nulls(m, pa.string()),
        })

    def write(tbl: pa.Table, e: int) -> None:
        edir = os.path.join(cl_dir, f"epoch-{e:05d}")
        os.makedirs(edir, exist_ok=True)
        fp = os.path.join(edir, f"part-{uuid.uuid4().hex}.parquet")
        pq.write_table(tbl, fp + ".tmp")
        os.replace(fp + ".tmp", fp)

    ins = rows("I", did, content, lang, source, nch.astype(np.int64), 0)
    epoch = np.minimum(3, did * 4 // N)
    for e in np.unique(epoch):
        write(ins.filter(pa.array(epoch == e)), int(e))
    um = did % 10 == 0
    if um.any():
        u = pa.array(um)
        upd = rows("U", did[um], content.filter(u), lang.filter(u),
                   source.filter(u), (nch[um] + 1000).astype(np.int64), N)
        write(upd, 4)
    return pa.table({"rows": pa.array([n], pa.int64())})


def cdc_ingest_dedup(sf_dir: str) -> pd.DataFrame:
    """Dedup-on-ingest through the REAL engine (rayrep/ingest_dedup.py):
    a documents-derived changelog — inserts across 4 epochs with
    deterministically duplicated content, then updates in a 5th — replayed
    with ``dedup_ingest=True``. First-writer-wins at CONTENT level: an
    insert whose content was claimed by a smaller seq is dropped; updates
    pass through (an update to a deduped key re-materializes the row under
    LWW upsert — the documented wart, oracled here). The cross-epoch claim
    index, the extra content-bucket exchange, and the exactly-once claim
    deltas are all on the hot path of this oracle."""
    import tempfile

    from rayrep.config import EngineConfig
    from rayrep.pipeline import final_table, replay
    from rayrep.schema import SchemaVersion

    path = os.path.join(sf_dir, "documents.parquet")
    N = int(_parquet_col_max(path, "doc_id")) + 1
    key = [_FIXTURE_FORMAT, *_table_key(sf_dir, "documents"), "ingest_dedup"]

    def build(stage: str) -> None:
        ds = rd.read_parquet(path, columns=["doc_id", "lang", "source", "n_chars"])
        counts = ds.map_batches(
            _emit_ingest_dedup_batch,
            fn_kwargs={"cl_dir": stage, "N": N},
            batch_format="pyarrow",
        ).take_all()  # tiny: one count row per batch
        assert sum(r["rows"] for r in counts) > 0

    cl = _disk_cached_dir("ddfix", key, build)
    lake = os.path.join(tempfile.mkdtemp(prefix="rayrep_qd_", dir=_scratch_root()), "lake")
    sv = SchemaVersion(1, pa.schema([
        pa.field("conv_id", pa.string()), pa.field("turn_idx", pa.int32()),
        pa.field("content", pa.string()), pa.field("lang", pa.string()),
        pa.field("source", pa.string()), pa.field("n_chars", pa.int64()),
        pa.field("ts", pa.timestamp("us")),
    ]))
    cfg = EngineConfig(changelog_dir=cl, lake_dir=lake, num_partitions=16,
                       initial_schema_json=sv.to_json(), delta_output=False,
                       dedup_ingest=True, dedup_content_col="content",
                       epochs_per_round=1)
    replay(cfg)
    out = final_table(lake).to_pandas()
    out["turn_idx"] = out["turn_idx"].astype("int64")
    return out[["conv_id", "turn_idx", "content", "lang", "source", "n_chars"]]


def approx_distinct_users(sf_dir: str) -> pd.DataFrame:
    """Approximate COUNT(DISTINCT user_id) per event_type via a K-minimum-
    values sketch (``rayrep/ops/sketch.py``).  The shuffle carries at most
    k=64 eight-byte hashes per (batch, group) — never the user ids — which
    is the only distinct-count shape that survives 10^10 rows.  The
    estimate is deterministic (multiplicative hash + k-th-min formula), so
    the DuckDB oracle reproduces it exactly with HUGEINT mul-mod."""
    from rayrep.ops.sketch import kmv_distinct

    ds = _events(sf_dir, columns=["event_type", "user_id"])
    return kmv_distinct(ds, group_col="event_type", value_col="user_id",
                        k=64, out_col="approx_users")


def dup_span_docs(sf_dir: str) -> pd.DataFrame:
    """Exact duplicate-span (substring) detection over the corpus
    (``rayrep/ops/text.py dup_span_doc_counts``): per doc, the number of
    20-byte positions whose exact gram also appears in another doc — the
    span-level dedup signal suffix-array pipelines compute.  Oracle =
    the identical definition via substr()/range() in SQL (the corpus is
    ASCII, so byte grams == codepoint grams)."""
    from rayrep.ops.text import dup_span_doc_counts

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    return dup_span_doc_counts(ds, k=20)


def cms_user_counts(sf_dir: str) -> pd.DataFrame:
    """Count-min-sketch frequency estimates for a fixed watchlist of user
    ids (``rayrep/ops/sketch.py``) — the mergeable-frequency shape for key
    sets too large to count exactly: per-batch keys collapse to occupied
    sketch cells, ONE bounded grouped Sum (<= depth x width rows per
    batch, never a key) merges them, and the watchlist probes the final
    256 KiB matrix.  Estimates are one-sided (never under-count) and the
    bucket arithmetic is bitwise-reproducible in SQL, so the oracle is
    exact."""
    from rayrep.ops.sketch import cms_build, cms_estimate

    W, D = 8192, 4
    ds = _events(sf_dir, columns=["user_id"])
    cms = cms_build(ds, "user_id", width=W, depth=D)
    watch = np.arange(50, dtype=np.int64)
    return pd.DataFrame({"user_id": watch, "est_n": cms_estimate(cms, watch)})


def urgent_lineitems_bloom(sf_dir: str) -> pd.DataFrame:
    """Bloom-prefiltered exact semi-join (reference J-shape: route only the
    rows a downstream applier will accept): revenue of lineitems whose
    order is 1-URGENT, by return flag.  Scale shape: the urgent key set is
    folded into one fixed 128 KiB Bloom bitmap (per-batch partial bitmaps,
    OR-merge, ONE ``ray.put``), the probe drops non-matching lineitems
    BEFORE the exact co-group shuffle, and the co-group semi-join removes
    the Bloom's false positives — exact result with the join's left input
    cut to ~|matches|, and broadcast bytes independent of key count."""
    from rayrep.ops.sketch import bloom_filter, bloom_prefilter

    P = 32
    urgent = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority"],
    ).map_batches(
        lambda t: t.filter(pc.equal(t.column("o_orderpriority"), "1-URGENT"))
                   .select(["o_orderkey"]),
        batch_format="pyarrow",
    )
    bref = bloom_filter(urgent, "o_orderkey")
    li = bloom_prefilter(
        rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
        ),
        "l_orderkey", bref,
    )

    def tag_li(t: pa.Table) -> pa.Table:
        key = t.column("l_orderkey").to_numpy()
        # Fixed-point 1e-4 revenue: floor((x*(1-d))*10000) as int64, summed
        # EXACTLY — both engines floor identical IEEE products, so the
        # result is deterministic with no float-sum-order rounding cliff
        # (int64 headroom: ~9e18, i.e. ~1e14 rows of 1e5-dollar items per
        # group before a wider accumulator is needed).
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), t.column("l_discount"))
                          ).to_numpy(zero_copy_only=False)
        return pa.table({
            "part_id": pa.array((key % P).astype(np.int32)),
            "key": pa.array(key),
            "flag": t.column("l_returnflag"),
            "rev": pa.array(np.floor(rev * 10000.0).astype(np.int64)),
            "is_right": pa.array(np.zeros(len(key), dtype=bool)),
        })

    def tag_od(t: pa.Table) -> pa.Table:
        key = t.column("o_orderkey").to_numpy()
        return pa.table({
            "part_id": pa.array((key % P).astype(np.int32)),
            "key": pa.array(key),
            "flag": pa.nulls(len(key), pa.string()),
            "rev": pa.nulls(len(key), pa.int64()),
            "is_right": pa.array(np.ones(len(key), dtype=bool)),
        })

    both = li.map_batches(tag_li, batch_format="pyarrow").union(
        urgent.map_batches(tag_od, batch_format="pyarrow"))

    def semi_agg(group: pa.Table) -> pa.Table:
        from rayrep.ops.dedup import _cogroup_match

        is_right = group.column("is_right").to_numpy(zero_copy_only=False)
        li_idx, _ = _cogroup_match(group.column("key").to_numpy(), is_right)
        if len(li_idx) == 0:
            return pa.table({"l_returnflag": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "rev_fp": pa.array([], pa.int64())})
        flags = group.column("flag").to_numpy(zero_copy_only=False)[li_idx]
        revs = group.column("rev").to_numpy(zero_copy_only=False)[li_idx]
        uniq, inv = np.unique(flags, return_inverse=True)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        s = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(s, inv, revs)  # exact int64 segment sums
        return pa.table({"l_returnflag": pa.array(uniq.astype(object), pa.string()),
                         "n": pa.array(n), "rev_fp": pa.array(s)})

    from ray.data.aggregate import Sum

    parts = both.groupby("part_id").map_groups(semi_agg, batch_format="pyarrow")
    out = (
        parts.groupby("l_returnflag")
        .aggregate(Sum("n", alias_name="n"), Sum("rev_fp", alias_name="rev_fp"))
        .to_pandas()
    )
    out["n"] = out["n"].astype(np.int64)
    # one exact-int -> double conversion; identical to the oracle's
    # CAST(sum AS DOUBLE)/10000.0 bit for bit
    out["revenue"] = out.pop("rev_fp").astype(np.float64) / 10000.0
    return out.sort_values("l_returnflag").reset_index(drop=True)


def daily_type_rollup(sf_dir: str) -> pd.DataFrame:
    """Hierarchical ROLLUP(day, event_type) the scale-correct way: ONE
    shuffle at the finest grain (per-batch Arrow partial pre-aggregation,
    then a tiny grouped Sum), with the coarser levels derived from the
    finest aggregate on the driver — the rollup input is days x types
    rows, never the events table.  Sums use fixed-point 1e-4 int64 (exact,
    order-independent) so every level matches the oracle bit for bit;
    'ALL' is the rollup sentinel (no NULL-sort ambiguity cross-engine)."""
    ds = _events(sf_dir, columns=["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.strftime(t.column("ts"), format="%Y-%m-%d")
        v = pa.array(np.floor(
            t.column("value").to_numpy(zero_copy_only=False) * 10000.0
        ).astype(np.int64))
        g = pa.table({"day": day, "event_type": t.column("event_type"),
                      "n": pa.array(np.ones(len(day), dtype=np.int64)),
                      "v": v}).group_by(["day", "event_type"]).aggregate(
                          [("n", "sum"), ("v", "sum")])
        return g.rename_columns(["day", "event_type", "n", "v"])

    from ray.data.aggregate import Sum

    finest = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["day", "event_type"])
        .aggregate(Sum("n", alias_name="n"), Sum("v", alias_name="v"))
        .to_pandas()
    )
    lvl1 = (finest.groupby("day", as_index=False)[["n", "v"]].sum()
            .assign(event_type="ALL"))
    lvl0 = pd.DataFrame({"day": ["ALL"], "event_type": ["ALL"],
                         "n": [finest["n"].sum()], "v": [finest["v"].sum()]})
    out = pd.concat([finest, lvl1, lvl0], ignore_index=True)
    out["n"] = out["n"].astype(np.int64)
    out["total_value"] = out.pop("v").astype(np.float64) / 10000.0
    return (out[["day", "event_type", "n", "total_value"]]
            .sort_values(["day", "event_type"]).reset_index(drop=True))


def purchase_click_users(sf_dir: str) -> pd.DataFrame:
    """Distinct-set INTERSECT (§2.7): users with BOTH a click and a
    purchase.  Per-batch partial collapses to at most one (user, flags)
    row per user per batch, so the one shuffle carries distinct-user
    partials (not events); a grouped Max then ANDs the flags."""
    ds = _events(sf_dir, columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        mask = pc.is_in(et, value_set=pa.array(["click", "purchase"]))
        t = t.filter(mask)
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        is_p = pc.equal(t.column("event_type"), "purchase").to_numpy(
            zero_copy_only=False).astype(np.int64)
        g = pa.table({"user_id": pa.array(u),
                      "has_click": pa.array(1 - is_p),
                      "has_purchase": pa.array(is_p)}).group_by("user_id").aggregate(
                          [("has_click", "max"), ("has_purchase", "max")])
        return g.rename_columns(["user_id", "has_click", "has_purchase"])

    from ray.data.aggregate import Max

    both = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Max("has_click", alias_name="c"),
                   Max("has_purchase", alias_name="p"))
        .to_pandas()
    )
    out = both[(both["c"] == 1) & (both["p"] == 1)][["user_id"]]
    return out.sort_values("user_id").reset_index(drop=True)


def big_orders(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q18 shape (aggregate -> HAVING -> join back): orders whose
    total lineitem quantity exceeds 250.  Scale shape: per-batch Arrow
    partials + ONE grouped Sum over lineitem, the selective HAVING result
    (~2% of orders) is broadcast once, and the orders scan inner-joins
    against it per batch — no second shuffle.  l_quantity is
    integer-valued, so double sums are exact and order-independent."""
    from ray.data.aggregate import Sum

    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_orderkey", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("l_orderkey").aggregate([("l_quantity", "sum")])
        return g.rename_columns(["l_orderkey", "q"])

    agg = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("q", alias_name="sum_qty"))
        .filter(expr="sum_qty > 250")
        .to_pandas()  # selective HAVING result only — broadcast side
    )
    ref = _broadcast_sorted(agg["l_orderkey"].to_numpy(),
                            agg["sum_qty"].to_numpy())
    od = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    out = od.map_batches(
        _lookup_task_fn,
        fn_kwargs={"r": ref, "key_col": "o_orderkey", "out_col": "sum_qty"},
        batch_format="pyarrow",
    ).to_pandas()
    return out.sort_values("o_orderkey").reset_index(drop=True)


def label_centroids(sf_dir: str) -> pd.DataFrame:
    """Per-class mean embedding (the reduce step of k-means / class
    prototypes): a distributed vector aggregate over a ``list<float>``
    column.  Per batch: zero-copy flatten -> (n, d) view -> one lexsort +
    ``np.add.reduceat`` per label, emitting labels x d partial-sum rows;
    ONE tiny grouped Sum merges batches.  Fixed-point 2^20 int64 sums make
    the centroid bitwise-deterministic (same floor + single-division
    sequence as the DuckDB oracle)."""
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        emb = t.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        d = len(flat) // t.num_rows
        fp = np.floor(flat * 1048576.0).astype(np.int64).reshape(-1, d)
        lab = t.column("label").to_numpy(zero_copy_only=False)
        order = np.argsort(lab, kind="stable")
        lab_s = lab[order]
        starts = np.flatnonzero(np.r_[True, lab_s[1:] != lab_s[:-1]])
        sums = np.add.reduceat(fp[order], starts, axis=0)        # (L, d)
        counts = np.diff(np.r_[starts, len(lab_s)])
        L = len(starts)
        return pa.table({
            "label": pa.array(np.repeat(lab_s[starts], d).astype(np.int32)),
            "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), L)),
            "s": pa.array(sums.ravel()),
            "n": pa.array(np.repeat(counts.astype(np.int64), d)),
        })

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
        .to_pandas()
    )
    out["centroid"] = (out["s"].astype(np.float64)
                       / out.pop("n").astype(np.float64)) / 1048576.0
    out = out.drop(columns=["s"])
    out["label"] = out["label"].astype(np.int32)
    return (out[["label", "dim", "centroid"]]
            .sort_values(["label", "dim"]).reset_index(drop=True))


def value_quantile_sketch(sf_dir: str) -> pd.DataFrame:
    """The mergeable-sketch quantile path ``value_quantiles``' docstring
    points at: fixed-bin histogram (bin width 0.1), per-batch Arrow
    bin-counts, ONE tiny grouped Sum — values never shuffle, only occupied
    bins.  Estimates are bin lower edges, deterministic, oracle-exact;
    error <= bin width, vs the exact query's value co-location."""
    from rayrep.ops.sketch import histogram_quantiles

    ds = _events(sf_dir, columns=["event_type", "value"])
    return histogram_quantiles(ds, group_col="event_type", value_col="value",
                               quantiles=(0.5, 0.95), scale=10.0)


def decontaminate_docs(sf_dir: str) -> pd.DataFrame:
    """Benchmark decontamination (eval-set-overlap removal): docs with
    ``doc_id % 23 == 0`` play the held-out benchmark; every other doc is
    flagged if it shares any word 5-gram with it. The benchmark gram set is
    built once and broadcast once (``ray.put`` — eval suites are MBs while
    the corpus is TBs), then one vectorized ``is_in`` per corpus batch; the
    corpus text never shuffles and never lands on the driver."""
    from rayrep.ops.dedup import _cached_cls_fn
    from rayrep.ops.text import Decontaminate, benchmark_ngram_set

    n, mod = 5, 23

    def _split(is_bench: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            m = (ids % mod == 0) if is_bench else (ids % mod != 0)
            return t.filter(pa.array(m))
        return f

    docs = lambda: _docs(sf_dir, columns=["doc_id", "text"])  # noqa: E731
    bench = benchmark_ngram_set(
        docs().map_batches(_split(True), batch_format="pyarrow"), n=n
    )
    ref = ray.put(bench)
    out = (
        docs()
        .map_batches(_split(False), batch_format="pyarrow")
        .map_batches(
            _cached_cls_fn,
            fn_kwargs={"cls": Decontaminate, "kwargs": {"bench_ref": ref, "n": n}},
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def repetition_stats(sf_dir: str) -> pd.DataFrame:
    """Gopher-family within-doc repetition quality filter: duplicate-word
    fraction and top-word (mode) fraction per doc, plus the keep flag —
    one vectorized stage (dictionary-encode + one np.unique per batch)."""
    ds = _docs(sf_dir, columns=["doc_id", "text"])
    out = _stage(ds, "rayrep.ops.text.RepetitionStats").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def conv_stats(sf_dir: str) -> pd.DataFrame:
    """Conversation-level transcript summary — the per-dialog profile a
    training-data pipeline computes before mixing/filtering (turn counts
    by role, payload size, wall-clock span). Events play the transcript
    view (conv_id=user_id, role=event_id%3, text=props). One vectorized
    per-batch partial (Arrow grouped count/sum/min/max per conv) shrinks
    the shuffle to ≤1 row per (conv, batch); a tiny grouped Sum/Min/Max
    finishes. All outputs integer → the oracle comparison is exact."""
    from ray.data.aggregate import Max, Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy()
        role = eid % 3  # 0=user, 1=assistant, 2=tool
        chars = pc.utf8_length(batch.column("props")).cast(pa.int64())
        ts_us = batch.column("ts").cast(pa.int64())
        t = pa.table({
            "conv_id": batch.column("user_id").cast(pa.string()),
            "a": pa.array((role == 1).astype(np.int64)),
            "t": pa.array((role == 2).astype(np.int64)),
            "chars": chars, "ts_us": ts_us,
        })
        agg = pa.TableGroupBy(t, ["conv_id"]).aggregate(
            [([], "count_all"), ("a", "sum"), ("t", "sum"),
             ("chars", "sum"), ("ts_us", "min"), ("ts_us", "max")]
        )
        return agg.rename_columns(
            ["conv_id", "n", "a", "t", "chars", "ts_min", "ts_max"])

    ds = _events(sf_dir, columns=["event_id", "user_id", "props", "ts"])
    out = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("conv_id")
        .aggregate(Sum("n", alias_name="n_turns"),
                   Sum("a", alias_name="n_assistant_turns"),
                   Sum("t", alias_name="n_tool_turns"),
                   Sum("chars", alias_name="total_chars"),
                   Min("ts_min", alias_name="ts_min"),
                   Max("ts_max", alias_name="ts_max"))
        .to_pandas()
    )
    out["duration_us"] = (out["ts_max"] - out["ts_min"]).astype("int64")
    out = out.drop(columns=["ts_min", "ts_max"])
    return out.sort_values("conv_id").reset_index(drop=True)


def doc_token_rank(sf_dir: str) -> pd.DataFrame:
    """Global order statistics WITHOUT a global sort: per-doc rank() and
    dense_rank() by token count (desc) via a broadcast value histogram.
    Pass 1 ships per-batch (token_count, n) partials — the shuffle is the
    distinct-value table, bounded by max doc length, never the corpus;
    the driver folds it into value→(rank, dense_rank) (rank-with-gaps =
    1 + docs with a strictly greater count — tie-order-free), broadcast
    once; pass 2 is a searchsorted lookup per batch. Docs never move."""
    from ray.data.aggregate import Sum

    from rayrep.ops.text import word_ngrams_with_docs

    docs = lambda: _docs(sf_dir, columns=["doc_id", "text"])  # noqa: E731

    def count_partial(t: pa.Table) -> pa.Table:
        toks, doc_of, n_docs = word_ngrams_with_docs(t.column("text"), 1)
        n = np.zeros(n_docs, dtype=np.int64)
        np.add.at(n, doc_of, 1)
        agg = pa.TableGroupBy(pa.table({"v": pa.array(n)}), ["v"]).aggregate(
            [([], "count_all")])
        return agg.rename_columns(["v", "c"])

    hist = (
        docs().map_batches(count_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby("v").aggregate(Sum("c", alias_name="c")).to_pandas()
        .sort_values("v", ascending=False)
    )
    v_desc = hist["v"].to_numpy()
    c_desc = hist["c"].to_numpy()
    rank = np.ones(len(v_desc), dtype=np.int64)
    rank[1:] = 1 + np.cumsum(c_desc[:-1])
    dense = np.arange(1, len(v_desc) + 1, dtype=np.int64)
    order = np.argsort(v_desc)  # ascending for searchsorted
    ref = ray.put((v_desc[order], rank[order], dense[order]))

    def assign(t: pa.Table) -> pa.Table:
        vals, ranks, denses = ray.get(ref)
        toks, doc_of, n_docs = word_ngrams_with_docs(t.column("text"), 1)
        n = np.zeros(n_docs, dtype=np.int64)
        np.add.at(n, doc_of, 1)
        pos = np.searchsorted(vals, n)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "token_count": pa.array(n),
            "rnk": pa.array(ranks[pos]),
            "dense_rnk": pa.array(denses[pos]),
        })

    out = docs().map_batches(assign, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def tfidf_top_terms(sf_dir: str) -> pd.DataFrame:
    """Per-doc top TF-IDF keyword. Pass 1 builds the exact df table (per-
    batch distinct-(doc,word) partials → one vocab-sized groupby-sum —
    docs never span batches so the sum is exact); the vocab-sized result
    broadcasts back via ``ray.put`` and pass 2 scores each doc in place —
    the corpus text itself never shuffles. Score = tf·N/df computed as ONE
    double division from exact ints, so both engines emit identical IEEE
    doubles and ordering ties break on the term string."""
    from ray.data.aggregate import Sum

    from rayrep.ops.dedup import _cached_cls_fn
    from rayrep.ops.text import TfidfTopTerm, doc_freq_partial

    docs = lambda: _docs(sf_dir, columns=["doc_id", "text"])  # noqa: E731
    n_docs = docs().count()
    dfp = (
        docs().map_batches(doc_freq_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby("w").aggregate(Sum("df", alias_name="df")).to_pandas()
    )
    words = dfp["w"].to_numpy()
    order = np.argsort(words)
    ref = ray.put((words[order], dfp["df"].to_numpy()[order]))
    out = (
        docs().map_batches(
            _cached_cls_fn,
            fn_kwargs={"cls": TfidfTopTerm,
                       "kwargs": {"df_ref": ref, "n_docs": n_docs}},
            batch_format="pyarrow", zero_copy_batch=True,
        ).to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


SEMDEDUP_THETA = 1_300_000_000_000  # quantized L2² ball ≈ 0.05th pct of pairs


def semantic_dedup_docs(sf_dir: str) -> pd.DataFrame:
    """SemDeDup-shape semantic dedup over the embeddings table: exact
    k-means (k=8, 3 Lloyd iterations) clusters the corpus, then one
    cluster-hash shuffle and a blocked in-cluster pairwise pass marks rows
    with a lower-id neighbour within the θ ball. Fixed-point int64
    throughout → the DuckDB oracle replays centroids AND the pair rule
    bitwise. Scale note: k grows ∝ corpus size to bound the O(|cluster|²)
    verify (the SemDeDup cost model)."""
    from rayrep.ops.similarity import semantic_dedup

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    out = semantic_dedup(ds, theta=SEMDEDUP_THETA, k=8, iters=3).to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


def _ivf_exact_index_dir(sf_dir: str, k_clusters: int = 8,
                         iters: int = 3) -> str:
    """Cached EXACT-quantizer IVF layout (bitwise integer k-means cells,
    hive ``cell=N`` dirs + centroids)."""
    from rayrep.ops.similarity import ivf_exact_build

    def build(stage: str) -> None:
        ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id", "embedding"])
        ivf_exact_build(ds, stage, k_clusters=k_clusters, iters=iters)

    return _disk_cached_dir(
        "ivfx", [*_table_key(sf_dir, "embeddings"), k_clusters, iters], build)


def ann_ivf_exact_pruned(sf_dir: str) -> pd.DataFrame:
    """Pruned IVF search whose APPROXIMATE result is itself hash-verified,
    now over the MATERIALIZED cell-partitioned layout: coarse quantizer =
    the bitwise-exact integer k-means, probe choice and candidate ranking
    = integer squared L2 with (d2, id) tie-breaks, and the search READS
    only the 2 probed cells' files (~nprobe/k_clusters of the corpus) —
    DuckDB replays the identical pruned top-k, so the pruned-read path
    itself is hash-oracled (r3 verdict item #2)."""
    from rayrep.ops.similarity import KM_SCALE, ivf_exact_pruned_read_topk

    index_dir = _ivf_exact_index_dir(sf_dir)
    q_int = np.floor(_query_vec(sf_dir) * KM_SCALE).astype(np.int64)
    return ivf_exact_pruned_read_topk(index_dir, q_int, nprobe=2, k=10)


def kmeans_clusters(sf_dir: str) -> pd.DataFrame:
    """Distributed Lloyd k-means over the embeddings table (k=8, 3
    iterations), EXACT: fixed-point 2^20 quantization + integer distances +
    floor-div centroid updates make every iterate bit-identical across
    batch splits and engines — the DuckDB oracle replays all three
    iterations and the final (cluster, n, inertia) matches bitwise. The
    (vec_id, embedding) columns materialize ONCE; each Lloyd iteration and
    the final summary are lightweight task waves over the pinned blocks
    emitting dense k×d int64 partials — embeddings never shuffle, never
    land on the driver, and the corpus is read exactly once."""
    from rayrep.ops.similarity import (kmeans_cluster_summary, kmeans_fit,
                                       kmeans_prepare)

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    prepared = kmeans_prepare(ds)
    cent = kmeans_fit(ds, k=8, iters=3, prepared=prepared)
    return kmeans_cluster_summary(ds, cent, prepared=prepared)


# ------------------------------------------------------------------ registry
def queries() -> dict:
    # ORDER MATTERS: the conformance driver hashes only the FIRST 50 entries
    # (insertion order), so the window below leads with the flagship cdc_*
    # engine family (replay / resume / evolution / compaction / index / DLQ)
    # followed by one representative per operator family.  Everything in the
    # window has an oracle_sql() entry; the only rows-only query in the
    # registry (ann_ivf_pruned, approximate by design) sits past slot 50.
    # tests/test_queries.py pins this ordering against a checked-in manifest.
    return {
        # --- driver window slots 1-50: flagship CDC engine family ---------
        "cdc_replay_events": cdc_replay_events,
        "cdc_replay_deletes": cdc_replay_deletes,
        "cdc_replay_resume": cdc_replay_resume,
        "cdc_replay_chaos": cdc_replay_chaos,
        "cdc_replay_evolution": cdc_replay_evolution,
        "cdc_replay_rename": cdc_replay_rename,
        "cdc_replay_drop_column": cdc_replay_drop_column,
        "cdc_replay_alter_type": cdc_replay_alter_type,
        "cdc_replay_changed_cells": cdc_replay_changed_cells,
        "cdc_replay_cells_compacted": cdc_replay_cells_compacted,
        "cdc_replay_cells_deletes_compacted": cdc_replay_cells_deletes_compacted,
        "cdc_replay_metrics": cdc_replay_metrics,
        "cdc_replay_transcripts": cdc_replay_transcripts,
        "cdc_bootstrap_tail": cdc_bootstrap_tail,
        "cdc_bulk_load": cdc_bulk_load,
        "cdc_tail_mode": cdc_tail_mode,
        "cdc_tail_evolution": cdc_tail_evolution,
        "cdc_tail_compacting": cdc_tail_compacting,
        "cdc_lease_failover": cdc_lease_failover,
        "cdc_downstream_replica": cdc_downstream_replica,
        "cdc_replica_incremental": cdc_replica_incremental,
        "cdc_epoch_snapshot": cdc_epoch_snapshot,
        "cdc_delta_rollup": cdc_delta_rollup,
        "cdc_log_compaction": cdc_log_compaction,
        "cdc_log_compaction_cells": cdc_log_compaction_cells,
        "cdc_secondary_index": cdc_secondary_index,
        "cdc_dead_letter": cdc_dead_letter,
        "cdc_dlq_requeue": cdc_dlq_requeue,
        "cdc_ingest_dedup": cdc_ingest_dedup,
        "cdc_json_ingest": cdc_json_ingest,
        "cdc_training_export": cdc_training_export,
        "cdc_point_lookup": cdc_point_lookup,
        "cdc_repartition": cdc_repartition,
        "cdc_erasure": cdc_erasure,
        "cdc_lww_latest": cdc_lww_latest,
        "cdc_time_travel": cdc_time_travel,
        "cdc_daily_counts": cdc_daily_counts,
        "cdc_event_type_filter": cdc_event_type_filter,
        "cdc_counters": cdc_counters,
        # --- driver window: one representative per operator family --------
        "q1_pricing_summary": q1_pricing_summary,
        "revenue_by_nation": revenue_by_nation,
        "top_orders_per_segment": top_orders_per_segment,
        "dedup_exact": dedup_exact,
        "dedup_minhash": dedup_minhash,
        "embedding_neardup_pairs": embedding_neardup_pairs,
        "ann_topk": ann_topk,
        "ann_ivf_exact_pruned": ann_ivf_exact_pruned,
        "pack_sequences": pack_sequences,
        "asof_click_value": asof_click_value,
        "multimodal_features": multimodal_features,
        # --- past the 50-slot window (still judge/pytest conformance) ------
        "event_value_stats": event_value_stats,
        "top_users": top_users,
        "doc_len_buckets": doc_len_buckets,
        "top_orders": top_orders,
        "orders_by_segment": orders_by_segment,
        "order_priority_revenue": order_priority_revenue,
        "customers_without_urgent_orders": customers_without_urgent_orders,
        "distinct_event_types": distinct_event_types,
        "sample_orders": sample_orders,
        "clean_text_docs": clean_text_docs,
        "pii_redact_docs": pii_redact_docs,
        "stratified_sample_docs": stratified_sample_docs,
        "dedup_exact_rows": dedup_exact_rows,
        "token_stats": token_stats,
        "lang_id_pred": lang_id_pred,
        "doc_fingerprint": doc_fingerprint,
        "dedup_simhash": dedup_simhash,
        "ngram_jaccard_pairs": ngram_jaccard_pairs,
        "ann_ivf_topk": ann_ivf_topk,
        "ann_ivf_pruned": ann_ivf_pruned,
        "sessionize_users": sessionize_users,
        "tumbling_window_values": tumbling_window_values,
        "hopping_window_values": hopping_window_values,
        "clicks_before_purchase": clicks_before_purchase,
        "rolling_value_avg": rolling_value_avg,
        "user_journey": user_journey,
        "event_type_pivot": event_type_pivot,
        "shipping_priority": shipping_priority,
        "corpus_curation": corpus_curation,
        "ngram_topk": ngram_topk,
        "value_quantiles": value_quantiles,
        "user_peak_hour": user_peak_hour,
        "approx_distinct_users": approx_distinct_users,
        "cms_user_counts": cms_user_counts,
        "dup_span_docs": dup_span_docs,
        "urgent_lineitems_bloom": urgent_lineitems_bloom,
        "daily_type_rollup": daily_type_rollup,
        "purchase_click_users": purchase_click_users,
        "big_orders": big_orders,
        "label_centroids": label_centroids,
        "value_quantile_sketch": value_quantile_sketch,
        "decontaminate_docs": decontaminate_docs,
        "repetition_stats": repetition_stats,
        "conv_stats": conv_stats,
        "kmeans_clusters": kmeans_clusters,
        "semantic_dedup": semantic_dedup_docs,
        "tfidf_top_terms": tfidf_top_terms,
        "doc_token_rank": doc_token_rank,
        "orders_expensive_item_counts": orders_expensive_item_counts,
        "cdc_lake_diff": cdc_lake_diff,
        "cdc_log_integrity": cdc_log_integrity,
        "cdc_multi_table_conv": cdc_multi_table_conv,
        "cdc_multi_table_docs": cdc_multi_table_docs,
        "cdc_rollback": cdc_rollback,
        "cdc_partition_repair": cdc_partition_repair,
        "cdc_retention": cdc_retention,
        "cdc_incremental_view": cdc_incremental_view,
        "cdc_log_trim": cdc_log_trim,
        "cdc_log_compaction_resume": cdc_log_compaction_resume,
        "cdc_log_compaction_evolution": cdc_log_compaction_evolution,
        "cdc_json_ingest_evolution": cdc_json_ingest_evolution,
        "cdc_lake_clone": cdc_lake_clone,
        "cdc_metrics_stream": cdc_metrics_stream,
        "cdc_source_failover": cdc_source_failover,
    }


def oracle_sql() -> dict:
    d = _oracle_sql_base()
    # same final-state contract, different engine path under test:
    d["cdc_replay_chaos"] = d["cdc_replay_deletes"]        # + injected crashes
    d["cdc_downstream_replica"] = d["cdc_replay_deletes"]  # rebuilt from deltas
    d["cdc_replay_resume"] = d["cdc_replay_events"]        # kill/resume split
    d["cdc_lease_failover"] = d["cdc_replay_deletes"]      # leased HA failover
    d["cdc_tail_mode"] = d["cdc_replay_deletes"]           # progressive publish
    d["cdc_tail_compacting"] = d["cdc_replay_deletes"]     # tail + self-compact
    d["cdc_tail_evolution"] = d["cdc_replay_evolution"]    # DDL inside a tailed epoch
    d["cdc_repartition"] = d["cdc_replay_deletes"]         # mid-stream rescale
    d["cdc_log_trim"] = d["cdc_replay_deletes"]            # binlog-expiry trim
    d["cdc_dead_letter"] = d["cdc_replay_deletes"]         # poison quarantined
    d["cdc_dlq_requeue"] = d["cdc_replay_deletes"]         # quarantine round-trip
    d["cdc_log_compaction"] = d["cdc_replay_deletes"]      # Kafka-style compact
    d["cdc_log_compaction_resume"] = d["cdc_replay_deletes"]  # span mid-history
    d["cdc_log_compaction_evolution"] = d["cdc_replay_evolution"]  # + DDL span
    d["cdc_log_compaction_cells"] = d["cdc_replay_changed_cells"]  # per-cell span
    d["cdc_json_ingest"] = d["cdc_replay_deletes"]         # envelope round-trip
    d["cdc_metrics_stream"] = d["cdc_replay_metrics"]      # stream readback
    d["cdc_source_failover"] = d["cdc_replay_deletes"]     # pGTID rebind
    d["cdc_lake_clone"] = d["cdc_replay_deletes"]          # DR clone + resume
    d["cdc_json_ingest_evolution"] = d["cdc_replay_evolution"]  # + in-stream DDL
    # point lookup: the same deletes-LWW state restricted to the looked-up
    # key predicate — the pruned read must equal filter(full scan)
    d["cdc_point_lookup"] = d["cdc_replay_deletes"].replace(
        "WHERE rn = 1 AND NOT is_del",
        "WHERE rn = 1 AND NOT is_del AND user_id % 53 = 5")
    assert "user_id % 53" in d["cdc_point_lookup"]
    # secondary index: the same deletes-LWW state under the indexed-value
    # predicate — index probe + point lookups must equal filter(full scan)
    d["cdc_secondary_index"] = d["cdc_replay_deletes"].replace(
        "WHERE rn = 1 AND NOT is_del",
        "WHERE rn = 1 AND NOT is_del AND event_type = 'click'")
    assert "event_type = 'click'" in d["cdc_secondary_index"]
    d["cdc_replica_incremental"] = d["cdc_replay_deletes"]  # watermarked refreshes
    # Maintained aggregate view: GROUP BY over the same deletes-LWW final
    # state the replica queries pin, with int64 fixed-point sums (FLOOR
    # matches numpy floor; DuckDB SUM skipping NULL == the engine's 0
    # contribution for a null value on a live row).
    d["cdc_incremental_view"] = """
        WITH e AS (
            SELECT *,
                   (event_id % 7 = 0 AND row_number() OVER
                        (PARTITION BY user_id ORDER BY event_id) > 1) AS is_del
            FROM events
        ), r AS (
            SELECT *, row_number() OVER
                (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM e
        )
        SELECT event_type,
               COUNT(*) AS n_rows,
               CAST(COALESCE(SUM(CAST(FLOOR(value * 10000) AS BIGINT)), 0)
                    AS BIGINT) AS sum_fp
        FROM r WHERE rn = 1 AND NOT is_del
        GROUP BY event_type
        ORDER BY event_type
    """
    d["cdc_erasure"] = """
        WITH e AS (
            SELECT *,
                   (event_id % 7 = 0 AND row_number() OVER
                        (PARTITION BY user_id ORDER BY event_id) > 1) AS is_del
            FROM events
        ), r AS (
            SELECT *, row_number() OVER
                (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM e
        )
        SELECT event_id, ts, user_id, event_type, value, props
        FROM r WHERE rn = 1 AND NOT is_del AND user_id % 10 != 3
    """
    d["cdc_retention"] = """
        WITH e AS (
            SELECT *,
                   (event_id % 7 = 0 AND row_number() OVER
                        (PARTITION BY user_id ORDER BY event_id) > 1) AS is_del
            FROM events
        ), r AS (
            SELECT *, row_number() OVER
                (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM e
        )
        SELECT event_id, ts, user_id, event_type, value, props
        FROM r WHERE rn = 1 AND NOT is_del
          AND epoch_us(ts) >= (SELECT epoch_us(min(ts))
                                      + 999 * (epoch_us(max(ts))
                                             - epoch_us(min(ts))) // 1000
                               FROM events)
    """
    return d


def _oracle_sql_base() -> dict:
    from rayrep.ops.sketch import KMV_MULT, _sql_mulmod64, _sql_u64

    _two64 = "18446744073709551616::HUGEINT"
    _two63 = "9223372036854775808::HUGEINT"

    def _hs(expr: str) -> str:  # per-row mul-mod hash of a seq expression
        return _sql_mulmod64(_sql_u64(expr), int(KMV_MULT))

    def _signed(expr: str) -> str:  # u64 → int64 two's-complement view
        return (f"(CASE WHEN ({expr}) >= {_two63} THEN ({expr}) - {_two64} "
                f"ELSE ({expr}) END)::BIGINT")

    return {
        # Changelog integrity: per-epoch stats AND the density verdict —
        # the hash-sum over the epoch's seqs must equal the hash-sum over
        # generate_series(min_seq, max_seq) (fixture: seq = event_id,
        # epoch = least(3, event_id*4 // B)).
        "cdc_log_integrity": f"""
            WITH e AS (
                SELECT least(3, event_id * 4 //
                             (SELECT max(event_id) + 1 FROM events)) AS epoch,
                       event_id AS seq
                FROM events
            ), s AS (
                SELECT epoch, COUNT(*) AS n_rows,
                       MIN(seq) AS min_seq, MAX(seq) AS max_seq,
                       (SUM({_hs('seq')}) % {_two64}) AS h
                FROM e GROUP BY epoch
            ), ser AS (
                -- generate_series takes only CONSTANT bounds here, so the
                -- integer line is synthesized as a 2048x2048 cross join
                -- (covers seq < 4,194,304 at every oracle sf; an undersized
                -- series breaks the count match loudly, never silently)
                SELECT a.x * 2048 + b.x AS x
                FROM generate_series(0, 2047) a(x),
                     generate_series(0, 2047) b(x)
            ), x AS (
                SELECT s.epoch, COUNT(*) AS cnt,
                       (SUM({_hs('ser.x')}) % {_two64}) AS exph
                FROM s JOIN ser ON ser.x BETWEEN s.min_seq AND s.max_seq
                GROUP BY s.epoch
            )
            SELECT s.epoch, s.n_rows, s.min_seq, s.max_seq,
                   {_signed('s.h')} AS hashsum,
                   (s.n_rows = x.cnt AND s.h = x.exph) AS dense
            FROM s JOIN x USING (epoch)
            ORDER BY epoch
        """,
        "cdc_lww_latest": f"""
            SELECT event_id, ts, user_id, event_type, value, props
            FROM events
            QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        """,
        "cdc_time_travel": f"""
            SELECT event_id, ts, user_id, event_type, value, props
            FROM events
            WHERE ts <= TIMESTAMP '{TT_CUTOFF}'
            QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        """,
        "cdc_daily_counts": """
            SELECT strftime(ts, '%Y%m%d') AS day, event_type,
                   count(*) AS n, round(sum(value), 3) AS sum_value
            FROM events GROUP BY day, event_type
        """,
        "cdc_event_type_filter": """
            SELECT event_type, count(*) AS n
            FROM events WHERE regexp_matches(event_type, '^(click|view)$')
            GROUP BY event_type
        """,
        "cdc_counters": """
            SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS users
            FROM events GROUP BY event_type
        """,
        "event_value_stats": """
            SELECT event_type, count(*) AS n,
                   min(value) AS min_value, max(value) AS max_value,
                   round(avg(value), 3) AS avg_value
            FROM events GROUP BY event_type
        """,
        "top_users": """
            SELECT user_id, count(*) AS n FROM events
            GROUP BY user_id ORDER BY n DESC, user_id ASC LIMIT 10
        """,
        "doc_len_buckets": """
            SELECT length(text) // 100 AS bucket, count(*) AS n
            FROM documents GROUP BY bucket
        """,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 3) AS sum_qty,
                   round(sum(l_extendedprice), 3) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 3) AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "top_orders": """
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
        """,
        "top_orders_per_segment": """
            SELECT c_mktsegment, o_orderkey, o_totalprice
            FROM orders JOIN customer ON o_custkey = c_custkey
            QUALIFY row_number() OVER (PARTITION BY c_mktsegment
                ORDER BY o_totalprice DESC, o_orderkey ASC) <= 3
        """,
        "orders_by_segment": """
            SELECT c_mktsegment, count(*) AS n, round(sum(o_totalprice), 3) AS revenue
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "revenue_by_nation": """
            SELECT n_name, count(*) AS n, round(sum(o_totalprice), 3) AS revenue
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "distinct_event_types": """
            SELECT DISTINCT event_type FROM events
        """,
        "sample_orders": """
            SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 10 = 0
        """,
        "order_priority_revenue": """
            SELECT o_orderpriority, count(*) AS n,
                   round(sum(l_extendedprice * (1 - l_discount)), 3) AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority
        """,
        "customers_without_urgent_orders": """
            SELECT c_custkey, c_acctbal FROM customer
            WHERE c_custkey NOT IN (
                SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        """,
        "dedup_exact": """
            SELECT min(doc_id) AS doc_id, count(*) AS dup_count
            FROM documents GROUP BY text
        """,
        "dedup_exact_rows": """
            SELECT doc_id, text, lang, source, n_chars
            FROM documents
            QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
        """,
        "dedup_minhash": """
            WITH corpus AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000 AS doc_id, text FROM documents
            )
            SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS rep
            FROM corpus
        """,
        "dedup_simhash": """
            WITH corpus AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000 AS doc_id, text FROM documents
            )
            SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS rep
            FROM corpus
        """,
        "ngram_jaccard_pairs": """
            SELECT doc_id AS a, doc_id + 1000000 AS b, 1.0 AS jaccard
            FROM documents
        """,
        "embedding_neardup_pairs": """
            SELECT vec_id AS a, vec_id + 1000000 AS b, 1.0 AS cosine
            FROM embeddings
        """,
        "ann_ivf_topk": """
            SELECT vec_id FROM embeddings
            ORDER BY list_cosine_similarity(embedding,
                (SELECT embedding FROM embeddings WHERE vec_id = 0)) DESC, vec_id ASC
            LIMIT 10
        """,
        "cdc_replay_events": """
            SELECT event_id, ts, user_id, event_type, value, props
            FROM events
            QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        """,
        "dup_span_docs": """
            WITH g AS (
                SELECT doc_id, substr(text, i::INT, 20) AS gram
                FROM (
                    SELECT doc_id, text,
                           unnest(range(1, length(text) - 18)) AS i
                    FROM documents WHERE length(text) >= 20
                )
            ), c AS (
                SELECT gram FROM g GROUP BY gram
                HAVING count(DISTINCT doc_id) >= 2
            )
            SELECT doc_id, count(*) AS dup_spans
            FROM g JOIN c USING (gram)
            GROUP BY doc_id
        """,
        "cdc_bootstrap_tail": """
            WITH t AS (SELECT (max(event_id) + 2) // 2 AS thr FROM events),
            snap AS (
                SELECT user_id, event_id, ts, event_type, value, props
                FROM events WHERE event_id < (SELECT thr FROM t)
                QUALIFY row_number() OVER (PARTITION BY user_id
                                           ORDER BY event_id) = 1
            ),
            uni AS (
                SELECT user_id, event_id, ts, event_type, value, props,
                       0 AS pri FROM snap
                UNION ALL
                SELECT user_id, event_id, ts, event_type, value, props,
                       1 AS pri
                FROM events WHERE event_id >= (SELECT thr FROM t)
            )
            SELECT event_id, ts, user_id, event_type, value, props
            FROM uni
            QUALIFY row_number() OVER (PARTITION BY user_id
                ORDER BY ts DESC, pri DESC, event_id DESC) = 1
        """,
        # bulk load's entire contract is "indistinguishable from the
        # bootstrap path": same snapshot, same tail, same oracle.
        "cdc_bulk_load": """
            WITH t AS (SELECT (max(event_id) + 2) // 2 AS thr FROM events),
            snap AS (
                SELECT user_id, event_id, ts, event_type, value, props
                FROM events WHERE event_id < (SELECT thr FROM t)
                QUALIFY row_number() OVER (PARTITION BY user_id
                                           ORDER BY event_id) = 1
            ),
            uni AS (
                SELECT user_id, event_id, ts, event_type, value, props,
                       0 AS pri FROM snap
                UNION ALL
                SELECT user_id, event_id, ts, event_type, value, props,
                       1 AS pri
                FROM events WHERE event_id >= (SELECT thr FROM t)
            )
            SELECT event_id, ts, user_id, event_type, value, props
            FROM uni
            QUALIFY row_number() OVER (PARTITION BY user_id
                ORDER BY ts DESC, pri DESC, event_id DESC) = 1
        """,
        "cdc_replay_metrics": """
            WITH w AS (
                SELECT user_id, event_id, ts,
                       least(3, event_id * 4 //
                                (SELECT max(event_id) + 1 FROM events)) AS epoch,
                       max(ts) OVER (PARTITION BY user_id ORDER BY event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND 1 PRECEDING) AS prior
                FROM events
            )
            SELECT epoch, count(*) AS input_rows,
                   sum(CASE WHEN prior IS NULL OR ts >= prior
                            THEN 1 ELSE 0 END)::BIGINT AS applied,
                   sum(CASE WHEN ts < prior THEN 1 ELSE 0 END)::BIGINT AS conflict
            FROM w GROUP BY epoch ORDER BY epoch
        """,
        "cdc_replay_rename": """
            SELECT event_id, ts, user_id, event_type, value, props AS meta
            FROM events
            QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        """,
        "cdc_replay_drop_column": """
            SELECT event_id, ts, user_id, event_type, value
            FROM events
            QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        """,
        "cdc_replay_alter_type": """
            SELECT CAST(event_id AS VARCHAR) AS event_id,
                   ts, user_id, event_type, value, props
            FROM events
            QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        """,
        "cdc_multi_table_conv": """
            SELECT event_id, ts, user_id, event_type, value, props
            FROM events
            QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        """,
        "cdc_multi_table_docs": """
            SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0 THEN n_chars + 7
                        ELSE n_chars END AS n_chars,
                   lang, source
            FROM documents
            ORDER BY doc_id
        """,
        "cdc_lake_diff": """
            WITH e AS (
                SELECT *,
                       (event_id % 7 = 0 AND row_number() OVER
                            (PARTITION BY user_id ORDER BY event_id) > 1) AS is_del
                FROM events
            ), r AS (
                SELECT *, row_number() OVER
                    (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                FROM e
            )
            SELECT user_id, 'only_a' AS status
            FROM r WHERE rn = 1 AND NOT is_del AND user_id % 10 = 3
            ORDER BY user_id
        """,
        "cdc_epoch_snapshot": """
            SELECT event_id, ts, user_id, event_type, value, props
            FROM events
            WHERE event_id * 4 // (SELECT max(event_id) + 1 FROM events) <= 1
            QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        """,
        "cdc_delta_rollup": """
            WITH w AS (
                SELECT user_id, event_id, ts, value,
                       least(3, event_id * 4 //
                                (SELECT max(event_id) + 1 FROM events)) AS epoch,
                       max(ts) OVER (PARTITION BY user_id ORDER BY event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND 1 PRECEDING) AS prior
                FROM events
            ), wins AS (
                SELECT * FROM w WHERE prior IS NULL OR ts >= prior
            ), d AS (
                SELECT strftime(ts, '%Y%m%d') AS change_date, user_id, value,
                       row_number() OVER (
                           PARTITION BY user_id, epoch, strftime(ts, '%Y%m%d')
                           ORDER BY ts DESC, event_id DESC) AS rk
                FROM wins
            )
            SELECT change_date, count(*) AS n_changes,
                   count(DISTINCT user_id) AS n_keys,
                   CAST(sum(CAST(floor(value * 10000.0) AS BIGINT))
                        AS BIGINT) AS sum_value_fp
            FROM d WHERE rk = 1
            GROUP BY change_date
            ORDER BY change_date
        """,
        "cdc_replay_evolution": """
            SELECT event_id, ts, user_id, event_type, value, props,
                   CASE WHEN event_id >= (SELECT (max(event_id) + 2) // 2
                                          FROM events)
                        THEN CAST(event_id AS VARCHAR) END AS note
            FROM events
            QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        """,
        "cdc_replay_changed_cells": """
            WITH e AS (
                SELECT user_id, event_id, ts, event_type,
                       CASE WHEN event_id % 3 != 0 THEN value END AS value,
                       CASE WHEN event_id % 5 != 0 THEN props END AS props
                FROM events
            ), w AS (
                SELECT user_id,
                       last_value(event_id) OVER win AS event_id,
                       last_value(ts) OVER win AS ts,
                       last_value(event_type IGNORE NULLS) OVER win AS event_type,
                       last_value(value IGNORE NULLS) OVER win AS value,
                       last_value(props IGNORE NULLS) OVER win AS props,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC, event_id DESC) AS rn
                FROM e
                WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND UNBOUNDED FOLLOWING)
            )
            SELECT event_id, ts, user_id, event_type, value, props
            FROM w WHERE rn = 1
        """,
        # compaction is invisible: same oracle as changed_cells
        "cdc_replay_cells_compacted": """
            WITH e AS (
                SELECT user_id, event_id, ts, event_type,
                       CASE WHEN event_id % 3 != 0 THEN value END AS value,
                       CASE WHEN event_id % 5 != 0 THEN props END AS props
                FROM events
            ), w AS (
                SELECT user_id,
                       last_value(event_id) OVER win AS event_id,
                       last_value(ts) OVER win AS ts,
                       last_value(event_type IGNORE NULLS) OVER win AS event_type,
                       last_value(value IGNORE NULLS) OVER win AS value,
                       last_value(props IGNORE NULLS) OVER win AS props,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC, event_id DESC) AS rn
                FROM e
                WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND UNBOUNDED FOLLOWING)
            )
            SELECT event_id, ts, user_id, event_type, value, props
            FROM w WHERE rn = 1
        """,
        # per-cell + deletes: a delete masks every OLDER cell version and
        # tombstones the key iff it is the key's last version; columns are
        # the last non-null strictly after the last delete
        "cdc_replay_cells_deletes_compacted": """
            WITH d AS (
                SELECT user_id, event_id, ts, event_type, value, props,
                       (event_id % 7 = 0 AND row_number() OVER
                            (PARTITION BY user_id ORDER BY event_id) > 1) AS is_del
                FROM events
            ), e AS (
                SELECT user_id, event_id, ts, is_del,
                       CASE WHEN NOT is_del THEN event_type END AS event_type,
                       CASE WHEN NOT is_del AND event_id % 3 != 0
                            THEN value END AS value,
                       CASE WHEN NOT is_del AND event_id % 5 != 0
                            THEN props END AS props
                FROM d
            ), v AS (
                SELECT *, row_number() OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) AS pos
                FROM e
            ), dd AS (
                SELECT user_id,
                       max(CASE WHEN is_del THEN pos ELSE 0 END) AS del_pos,
                       max(pos) AS last_pos
                FROM v GROUP BY user_id
            ), w AS (
                SELECT v.user_id,
                       last_value(v.event_id) OVER win AS event_id,
                       last_value(v.ts) OVER win AS ts,
                       last_value(v.event_type IGNORE NULLS) OVER win AS event_type,
                       last_value(v.value IGNORE NULLS) OVER win AS value,
                       last_value(v.props IGNORE NULLS) OVER win AS props,
                       row_number() OVER (PARTITION BY v.user_id
                                          ORDER BY v.pos DESC) AS rn
                FROM v JOIN dd ON v.user_id = dd.user_id
                WHERE v.pos > dd.del_pos AND dd.del_pos != dd.last_pos
                WINDOW win AS (PARTITION BY v.user_id ORDER BY v.pos
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND UNBOUNDED FOLLOWING)
            )
            SELECT event_id, ts, user_id, event_type, value, props
            FROM w WHERE rn = 1
        """,
        "cdc_partition_repair": """
            WITH e AS (
                SELECT *,
                       (event_id % 7 = 0 AND row_number() OVER
                            (PARTITION BY user_id ORDER BY event_id) > 1) AS is_del
                FROM events
            ), r AS (
                SELECT *, row_number() OVER
                    (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                FROM e
            )
            SELECT event_id, ts, user_id, event_type, value, props
            FROM r WHERE rn = 1 AND NOT is_del
        """,
        "cdc_replay_deletes": """
            WITH e AS (
                SELECT *,
                       (event_id % 7 = 0 AND row_number() OVER
                            (PARTITION BY user_id ORDER BY event_id) > 1) AS is_del
                FROM events
            ), r AS (
                SELECT *, row_number() OVER
                    (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                FROM e
            )
            SELECT event_id, ts, user_id, event_type, value, props
            FROM r WHERE rn = 1 AND NOT is_del
        """,
        # rollback + resume must converge to the FULL-history LWW fold —
        # identical oracle to cdc_replay_deletes by design.
        "cdc_rollback": """
            WITH e AS (
                SELECT *,
                       (event_id % 7 = 0 AND row_number() OVER
                            (PARTITION BY user_id ORDER BY event_id) > 1) AS is_del
                FROM events
            ), r AS (
                SELECT *, row_number() OVER
                    (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                FROM e
            )
            SELECT event_id, ts, user_id, event_type, value, props
            FROM r WHERE rn = 1 AND NOT is_del
        """,
        "corpus_curation": r"""
            WITH s AS (
                SELECT doc_id, text,
                    length(text) AS nc,
                    length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS n_punct,
                    len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                        x -> x IN ('the','and','of','a','to','in','is','it','that','for'))) AS en,
                    len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                        x -> x IN ('der','die','das','und','ist','ich','nicht','ein','zu','mit'))) AS de,
                    len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                        x -> x IN ('le','la','les','et','est','un','une','pas','que','pour'))) AS fr,
                    len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                        x -> x IN ('el','la','los','y','es','un','una','que','no','por'))) AS es,
                    greatest(len(regexp_split_to_array(text, '\s+')), 1) AS tok_n
                FROM documents
            ), q AS (
                SELECT doc_id, text, en, de, fr, es,
                    least(greatest(nc / 200.0, 0), 1) * 0.4
                    + least(greatest(1 - 4.0 * n_punct / greatest(nc, 1), 0), 1) * 0.3
                    + least(greatest(5.0 * en / tok_n, 0), 1) * 0.3 AS quality
                FROM s
            ), f AS (
                SELECT doc_id, text FROM q
                WHERE quality >= 0.5
                  AND NOT (en = 0 AND de = 0 AND fr = 0 AND es = 0)
                  AND en >= de AND en >= fr AND en >= es
            )
            SELECT min(doc_id) AS doc_id FROM f GROUP BY text
        """,
        "stratified_sample_docs": """
            SELECT lang, doc_id FROM (
                SELECT lang, doc_id,
                       (doc_id * 2654435761) % 4294967296 AS h
                FROM documents)
            QUALIFY row_number() OVER (PARTITION BY lang
                                       ORDER BY h, doc_id) <= 20
        """,
        "pii_redact_docs": r"""
            WITH p AS (
                SELECT doc_id,
                       text || ' contact user' || doc_id
                            || '@mail.example.org or call 415-555-'
                            || (doc_id % 10000) AS t
                FROM documents
            ), r AS (
                SELECT doc_id,
                       len(regexp_extract_all(t,
                           '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}'
                       ))::BIGINT AS n_emails,
                       regexp_replace(t,
                           '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}',
                           '<EMAIL>', 'g') AS t1
                FROM p
            )
            SELECT doc_id,
                   regexp_replace(t1, '[0-9]{3}-[0-9]{3}-[0-9]{1,4}',
                                  '<PHONE>', 'g') AS redacted_text,
                   n_emails,
                   len(regexp_extract_all(t1,
                       '[0-9]{3}-[0-9]{3}-[0-9]{1,4}'))::BIGINT AS n_phones
            FROM r
        """,
        "clean_text_docs": r"""
            WITH d AS (
                SELECT doc_id,
                       'http://spam.example/' || doc_id || '  ' || text || ' '
                           AS text
                FROM documents
            ), c AS (
                SELECT doc_id,
                       trim(regexp_replace(regexp_replace(text,
                            'https?://\S+', '', 'g'), '\s+', ' ', 'g'),
                            ' ') AS clean_text
                FROM d
            )
            SELECT doc_id, clean_text,
                   CAST(length(clean_text) AS BIGINT) AS clean_len
            FROM c WHERE length(clean_text) >= 200
        """,
        "pack_sequences": r"""
            WITH t AS (
                SELECT doc_id,
                       length(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
                FROM documents
            ), c AS (
                SELECT doc_id, n_tokens,
                       coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                                0) AS strt
                FROM t
            )
            SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(strt // 2048 AS BIGINT) AS bin_id
            FROM c
        """,
        "token_stats": r"""
            SELECT doc_id,
                   length(text) AS n_chars_calc,
                   length(regexp_split_to_array(trim(text), '\s+')) AS token_count,
                   length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS n_punct,
                   length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit
            FROM documents
        """,
        "ann_topk": """
            SELECT vec_id FROM embeddings
            ORDER BY list_cosine_similarity(embedding,
                (SELECT embedding FROM embeddings WHERE vec_id = 0)) DESC, vec_id ASC
            LIMIT 10
        """,
        "sessionize_users": """
            SELECT user_id,
                   CAST(sum(newsess) AS BIGINT) AS n_sessions,
                   count(*) AS n_events
            FROM (
                SELECT user_id,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS newsess
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ) GROUP BY user_id
        """,
        "tumbling_window_values": """
            WITH e AS (
                SELECT user_id,
                       epoch_us(ts) - (event_id % 97) * 250000000 AS et,
                       CAST(floor(value * 10000) AS BIGINT) AS v_fp,
                       max(epoch_us(ts) - (event_id % 97) * 250000000)
                           OVER (ORDER BY event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING) AS wm
                FROM events
            )
            SELECT user_id,
                   (et // 3600000000) * 3600000000 AS window_start,
                   count(*) AS n_events,
                   CAST(sum(v_fp) AS BIGINT) AS value_fp
            FROM e
            WHERE wm IS NULL
               OR wm <= (et // 3600000000) * 3600000000
                        + 3600000000 + 600000000
            GROUP BY 1, 2
        """,
        "hopping_window_values": """
            WITH e AS (
                SELECT user_id, epoch_us(ts) AS et,
                       CAST(floor(value * 10000) AS BIGINT) AS v_fp
                FROM events
            ), f AS (
                SELECT user_id,
                       (et // 1800000000) * 1800000000
                           - k.k * 1800000000 AS window_start,
                       v_fp
                FROM e CROSS JOIN (SELECT unnest(range(2)) AS k) AS k
                WHERE (et // 1800000000) * 1800000000
                          - k.k * 1800000000 >= 0
            )
            SELECT user_id, window_start, count(*) AS n_events,
                   CAST(sum(v_fp) AS BIGINT) AS value_fp
            FROM f GROUP BY 1, 2
        """,
        "asof_click_value": """
            WITH p AS (
                SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
            ), c AS (
                SELECT user_id, ts, value FROM (
                    SELECT user_id, ts, value,
                           row_number() OVER (PARTITION BY user_id, ts
                                              ORDER BY event_id DESC) AS rn
                    FROM events WHERE event_type = 'click'
                ) WHERE rn = 1
            )
            SELECT p.event_id, p.user_id, p.ts, c.value AS click_value
            FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
        """,
        "rolling_value_avg": """
            SELECT event_id, user_id,
                   round(sum(value) OVER w, 2) AS rolling_sum,
                   count(value) OVER w AS n_window
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        """,
        "user_journey": """
            SELECT user_id,
                   string_agg(event_type, '>' ORDER BY ts, event_id)
                       AS journey,
                   count(*) AS n_events
            FROM events GROUP BY user_id
        """,
        "event_type_pivot": """
            SELECT user_id,
                   count(*) FILTER (WHERE event_type = 'click') AS n_click,
                   count(*) FILTER (WHERE event_type = 'view') AS n_view,
                   count(*) FILTER (WHERE event_type = 'purchase')
                       AS n_purchase,
                   count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
                   count(*) FILTER (WHERE event_type = 'error') AS n_error,
                   count(*) AS n_total
            FROM events GROUP BY user_id
        """,
        "shipping_priority": """
            SELECT l_orderkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 3)
                       AS revenue,
                   o_orderdate, o_orderpriority
            FROM customer, orders, lineitem
            WHERE c_mktsegment = 'BUILDING'
              AND c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND o_orderdate < TIMESTAMP '1998-06-01'
              AND l_shipdate > TIMESTAMP '1998-06-01'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC,
                     o_orderdate, l_orderkey
            LIMIT 10
        """,
        "clicks_before_purchase": """
            SELECT p.event_id, p.user_id,
                   count(c.ts) AS n_prior_clicks
            FROM (SELECT event_id, user_id, ts FROM events
                  WHERE event_type = 'purchase') p
            LEFT JOIN (SELECT user_id, ts FROM events
                       WHERE event_type = 'click') c
              ON p.user_id = c.user_id
             AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
            GROUP BY p.event_id, p.user_id
        """,
        "lang_id_pred": r"""
            WITH s AS (
                SELECT doc_id,
                    len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                        x -> x IN ('the','and','of','a','to','in','is','it','that','for'))) AS en,
                    len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                        x -> x IN ('der','die','das','und','ist','ich','nicht','ein','zu','mit'))) AS de,
                    len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                        x -> x IN ('le','la','les','et','est','un','une','pas','que','pour'))) AS fr,
                    len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                        x -> x IN ('el','la','los','y','es','un','una','que','no','por'))) AS es
                FROM documents)
            SELECT doc_id,
                CASE WHEN en = 0 AND de = 0 AND fr = 0 AND es = 0 THEN 'und'
                     WHEN en >= de AND en >= fr AND en >= es THEN 'en'
                     WHEN de >= fr AND de >= es THEN 'de'
                     WHEN fr >= es THEN 'fr'
                     ELSE 'es' END AS lang_pred
            FROM s
        """,
        "ngram_topk": r"""
            WITH toks AS (
                SELECT list_filter(regexp_split_to_array(text, '\s+'),
                                   x -> x <> '') AS tk
                FROM documents
            ),
            tg AS (
                SELECT tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS ngram
                FROM toks CROSS JOIN unnest(range(1, len(tk) - 1)) AS u(i)
                WHERE len(tk) >= 3
            )
            SELECT ngram, count(*) AS n
            FROM tg GROUP BY ngram
            ORDER BY n DESC, ngram ASC
            LIMIT 100
        """,
        "value_quantiles": """
            WITH r AS (
                SELECT event_type, value,
                       row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
                       count(*) OVER (PARTITION BY event_type) AS cnt
                FROM events
            )
            SELECT event_type,
                   max(CASE WHEN rn = (cnt - 1) * 50 // 100 + 1 THEN value END) AS p50,
                   max(CASE WHEN rn = (cnt - 1) * 95 // 100 + 1 THEN value END) AS p95
            FROM r GROUP BY event_type
        """,
        "user_peak_hour": """
            WITH h AS (
                SELECT user_id, strftime(ts, '%Y-%m-%d %H:00:00') AS window_start,
                       count(*) AS n
                FROM events GROUP BY 1, 2
            )
            SELECT user_id, window_start, n FROM h
            QUALIFY row_number() OVER (
                PARTITION BY user_id ORDER BY n DESC, window_start ASC) = 1
        """,
        # Same-estimate KMV sketch: multiplicative hash + k-th-min formula
        # replayed with HUGEINT mul-mod (rayrep/ops/sketch.py).
        "approx_distinct_users": _kmv_users_oracle_sql(),
        "cms_user_counts": _cms_users_oracle_sql(),
        # Fixed-point 1e-4 revenue: floor of identical IEEE products,
        # EXACT integer sum — deterministic across engines regardless of
        # summation order (no 3-decimal rounding cliff).
        "urgent_lineitems_bloom": """
            SELECT l_returnflag, count(*) AS n,
                   CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0)
                                 AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderpriority = '1-URGENT'
            GROUP BY l_returnflag
            ORDER BY l_returnflag
        """,
        # ROLLUP with the same fixed-point exact-sum trick; 'ALL' sentinel
        # instead of SQL NULL so cross-engine NULL ordering can't bite.
        "daily_type_rollup": """
            WITH e AS (
                SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
                       CAST(floor(value * 10000.0) AS BIGINT) AS v
                FROM events
            )
            SELECT COALESCE(day, 'ALL') AS day,
                   COALESCE(event_type, 'ALL') AS event_type,
                   count(*) AS n,
                   CAST(sum(v) AS DOUBLE) / 10000.0 AS total_value
            FROM e GROUP BY ROLLUP(day, event_type)
            ORDER BY day, event_type
        """,
        "purchase_click_users": """
            SELECT user_id FROM events WHERE event_type = 'click'
            INTERSECT
            SELECT user_id FROM events WHERE event_type = 'purchase'
            ORDER BY user_id
        """,
        # Same fixed-bin histogram estimate: identical binning, the same
        # ceil(q*n) DOUBLE threshold, first bin whose cumulative count
        # reaches it.
        "value_quantile_sketch": """
            WITH b AS (
                SELECT event_type, CAST(floor(value * 10.0) AS BIGINT) AS bin,
                       count(*) AS c
                FROM events GROUP BY 1, 2
            ), cum AS (
                SELECT event_type, bin,
                       sum(c) OVER (PARTITION BY event_type ORDER BY bin) AS cc,
                       sum(c) OVER (PARTITION BY event_type) AS n
                FROM b
            )
            SELECT event_type,
                   CAST(min(CASE WHEN cc >= ceil(0.5 * CAST(n AS DOUBLE))
                                 THEN bin END) AS DOUBLE) / 10.0 AS p50_est,
                   CAST(min(CASE WHEN cc >= ceil(0.95 * CAST(n AS DOUBLE))
                                 THEN bin END) AS DOUBLE) / 10.0 AS p95_est
            FROM cum GROUP BY event_type ORDER BY event_type
        """,
        "label_centroids": """
            WITH f AS (
                SELECT label, r.i AS dim,
                       CAST(floor(CAST(embedding[r.i] AS DOUBLE) * 1048576.0)
                            AS BIGINT) AS v_fp
                FROM embeddings
                CROSS JOIN (SELECT unnest(range(1, 65)) AS i) r
            )
            SELECT label, dim,
                   (CAST(sum(v_fp) AS DOUBLE) / CAST(count(*) AS DOUBLE))
                       / 1048576.0 AS centroid
            FROM f GROUP BY label, dim ORDER BY label, dim
        """,
        "decontaminate_docs": r"""
            WITH toks AS (
                SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
                                           x -> x <> '') AS tk
                FROM documents
            ),
            grams AS (
                SELECT doc_id, array_to_string(tk[i:i+4], ' ') AS g
                FROM toks CROSS JOIN unnest(range(1, len(tk) - 3)) AS u(i)
            ),
            bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 23 = 0),
            hits AS (
                SELECT doc_id, count(*) AS n FROM grams
                WHERE doc_id % 23 <> 0 AND g IN (SELECT g FROM bench)
                GROUP BY doc_id
            )
            SELECT t.doc_id,
                   CAST(COALESCE(h.n, 0) AS BIGINT) AS n_bench_hits,
                   COALESCE(h.n, 0) > 0 AS contaminated
            FROM toks t LEFT JOIN hits h USING (doc_id)
            WHERE t.doc_id % 23 <> 0
            ORDER BY t.doc_id
        """,
        "repetition_stats": r"""
            WITH toks AS (
                SELECT doc_id,
                       unnest(list_filter(regexp_split_to_array(text, '\s+'),
                                          x -> x <> '')) AS w
                FROM documents
            ),
            per AS (SELECT doc_id, w, count(*) AS c FROM toks GROUP BY doc_id, w),
            agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
                           CAST(count(*) AS BIGINT) AS n_distinct, max(c) AS mx
                    FROM per GROUP BY doc_id)
            SELECT d.doc_id,
                   COALESCE(a.n_words, 0) AS n_words,
                   COALESCE(a.n_distinct, 0) AS n_distinct,
                   CASE WHEN a.n_words > 0
                        THEN 1.0 - CAST(a.n_distinct AS DOUBLE) / a.n_words
                        ELSE 0.0 END AS dup_word_frac,
                   CASE WHEN a.n_words > 0
                        THEN CAST(a.mx AS DOUBLE) / a.n_words
                        ELSE 0.0 END AS top_word_frac,
                   CASE WHEN a.n_words > 0
                        THEN CAST(a.mx AS DOUBLE) / a.n_words <= 0.2
                        ELSE TRUE END AS keep
            FROM documents d LEFT JOIN agg a USING (doc_id)
            ORDER BY d.doc_id
        """,
        "conv_stats": """
            SELECT CAST(user_id AS VARCHAR) AS conv_id,
                   CAST(COUNT(*) AS BIGINT) AS n_turns,
                   CAST(SUM(CASE WHEN event_id % 3 = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_assistant_turns,
                   CAST(SUM(CASE WHEN event_id % 3 = 2 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_tool_turns,
                   CAST(SUM(length(props)) AS BIGINT) AS total_chars,
                   CAST(max(epoch_us(ts)) - min(epoch_us(ts)) AS BIGINT)
                       AS duration_us
            FROM events GROUP BY user_id ORDER BY conv_id
        """,
        "kmeans_clusters": _kmeans_oracle_sql(k=8, iters=3, d=64),
        "ann_ivf_exact_pruned": _ivf_exact_pruned_oracle_sql(),
        "semantic_dedup": _semantic_dedup_oracle_sql(SEMDEDUP_THETA, k=8, iters=3, d=64),
        "doc_token_rank": r"""
            WITH t AS (
                SELECT doc_id,
                       CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
                                            x -> x <> '')) AS BIGINT)
                           AS token_count
                FROM documents
            )
            SELECT doc_id, token_count,
                   CAST(rank() OVER (ORDER BY token_count DESC) AS BIGINT)
                       AS rnk,
                   CAST(dense_rank() OVER (ORDER BY token_count DESC) AS BIGINT)
                       AS dense_rnk
            FROM t ORDER BY doc_id
        """,
        "orders_expensive_item_counts": """
            -- fixed-point 1e-4 exact sum (daily_revenue pattern): both
            -- engines floor identical IEEE products, so int64 sums match
            -- bitwise in any order
            SELECT o.o_orderkey,
                   CAST(count(l.l_orderkey) AS BIGINT) AS n_items,
                   CAST(COALESCE(sum(CAST(floor(
                            l.l_extendedprice * (1 - l.l_discount) * 10000.0)
                        AS BIGINT)), 0) AS DOUBLE) / 10000.0 AS revenue
            FROM orders o LEFT JOIN lineitem l
              ON l.l_orderkey = o.o_orderkey AND l.l_extendedprice > 40000
            GROUP BY o.o_orderkey ORDER BY o.o_orderkey
        """,
        "tfidf_top_terms": r"""
            WITH toks AS (
                SELECT doc_id, unnest(list_filter(
                         regexp_split_to_array(text, '\s+'), x -> x <> ''))
                       AS w
                FROM documents
            ),
            tf AS (SELECT doc_id, w, count(*) AS tf FROM toks GROUP BY doc_id, w),
            df AS (SELECT w, count(DISTINCT doc_id) AS df FROM toks GROUP BY w),
            nd AS (SELECT count(*) AS n FROM documents)
            SELECT tf.doc_id, tf.w AS top_term,
                   CAST(tf.tf AS DOUBLE) * (SELECT n FROM nd) / df.df AS score
            FROM tf JOIN df USING (w)
            QUALIFY row_number() OVER (PARTITION BY tf.doc_id
                                       ORDER BY score DESC, tf.w ASC) = 1
            ORDER BY tf.doc_id
        """,
        "big_orders": """
            SELECT o_orderkey, o_custkey, o_totalprice, sum_qty
            FROM orders
            JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty
                  FROM lineitem GROUP BY l_orderkey
                  HAVING sum(l_quantity) > 250) j
              ON o_orderkey = l_orderkey
            ORDER BY o_orderkey
        """,
        # The winnowing fingerprint (rayrep/ops/text.py:Fingerprint) IS
        # SQL-expressible: k-gram polynomial hash mod 2^64 + murmur
        # finalizer + per-doc min, replayed in DuckDB over the UTF-8 bytes
        # (hex-pair extraction) with HUGEINT mul-mod arithmetic.
        "doc_fingerprint": _fingerprint_oracle_sql(),
        # The generator changelog is not derivable from the events view,
        # but the query dumps the exact PCG64-deterministic log it replays
        # to a stable parquet path — the oracle reads it back and applies
        # the engine's contract in SQL: LWW winner per (conv_id, turn_idx)
        # by (ts, seq); a winning tombstone removes the row; pre-DDL
        # winners read NULL ``tool`` (the dump already carries NULL there,
        # mirroring the engine's schema-evolution backfill).
        "cdc_replay_transcripts": f"""
            SELECT conv_id, turn_idx, role, text, tool, ts
            FROM read_parquet('{_transcripts_dump_path()}')
            WHERE op IN ('I', 'U', 'D')
            QUALIFY row_number() OVER (PARTITION BY conv_id, turn_idx
                                       ORDER BY ts DESC, seq DESC) = 1
                AND op <> 'D'
            ORDER BY conv_id, turn_idx
        """,
        # Lake -> training export: the SAME LWW replay, then the exact
        # SQL mirror of every prep stage — plants, clean chain, dedup
        # winner, whitespace token count, global prefix-sum packing.
        "cdc_training_export": rf"""
            WITH lww AS (
                SELECT conv_id, turn_idx, text
                FROM read_parquet('{_export_dump_path()}')
                WHERE op IN ('I', 'U', 'D')
                QUALIFY row_number() OVER (PARTITION BY conv_id, turn_idx
                                           ORDER BY ts DESC, seq DESC) = 1
                    AND op <> 'D'
            ), keyed AS (
                SELECT CAST(substr(conv_id, 2) AS BIGINT) * {_EXPORT_GID_M}
                           + turn_idx AS gid,
                       CAST(substr(conv_id, 2) AS BIGINT) AS cnum,
                       turn_idx, text
                FROM lww
            ), planted AS (
                SELECT gid,
                       CASE WHEN cnum % 5 = 0
                            THEN 'duplicate turn payload number ' ||
                                 CAST(turn_idx AS VARCHAR)
                            WHEN cnum % 7 = 0 THEN substr(text, 1, 10)
                            ELSE text END AS text
                FROM keyed
            ), dirty AS (
                SELECT gid, 'http://spam.example/' || CAST(gid AS VARCHAR)
                           || '  ' || text || ' ' AS text
                FROM planted
            ), cleaned AS (
                SELECT gid,
                       trim(regexp_replace(regexp_replace(text,
                            'https?://\S+', '', 'g'), '\s+', ' ', 'g'),
                            ' ') AS clean_text
                FROM dirty
            ), sized AS (
                SELECT gid, clean_text FROM cleaned
                WHERE length(clean_text) >= {_EXPORT_MIN_LEN}
            ), uniq AS (
                SELECT gid, clean_text,
                       row_number() OVER (PARTITION BY clean_text
                                          ORDER BY gid) AS rn
                FROM sized
            ), tok AS (
                SELECT gid,
                       length(regexp_split_to_array(trim(clean_text),
                                                    '\s+')) AS n_tokens
                FROM uniq WHERE rn = 1
            ), c AS (
                SELECT gid, n_tokens,
                       coalesce(sum(n_tokens) OVER (ORDER BY gid
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS strt
                FROM tok
            )
            SELECT gid, CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(strt // {_EXPORT_CAP} AS BIGINT) AS bin_id
            FROM c ORDER BY gid
        """,
        # dedup-on-ingest: first-writer-wins per CONTENT (min doc_id = min
        # seq); every 10th doc's later U passes through — and re-creates a
        # deduped key (LWW upsert), hence the `OR doc_id % 10 = 0` arm.
        "cdc_ingest_dedup": """
            WITH docs AS (
                SELECT doc_id, lang, source, n_chars,
                       lang || '|' || source || '|' ||
                           CAST(n_chars % 13 AS VARCHAR) AS content
                FROM documents
            ), first AS (
                SELECT doc_id,
                       row_number() OVER (PARTITION BY content
                                          ORDER BY doc_id) AS rn
                FROM docs
            )
            SELECT CAST(d.doc_id AS VARCHAR) AS conv_id,
                   CAST(0 AS BIGINT) AS turn_idx,
                   d.content, d.lang, d.source,
                   CAST(CASE WHEN d.doc_id % 10 = 0 THEN d.n_chars + 1000
                             ELSE d.n_chars END AS BIGINT) AS n_chars
            FROM docs d JOIN first f USING (doc_id)
            WHERE f.rn = 1 OR d.doc_id % 10 = 0
            ORDER BY conv_id
        """,
        # The media fixture's value streams are closed-form, so the oracle
        # regenerates each decoded payload with range()/unnest and the
        # engine's REAL container decode (PPM / RIFF-WAVE parsers) must
        # reproduce the exact integer aggregates.
        "multimodal_features": """
            WITH m AS (
                -- scalar-list range (table-function range can't take a
                -- subquery argument)
                SELECT unnest(range(greatest(64,
                    (SELECT count(*) FROM documents) // 4)))::BIGINT
                    AS media_id
            ),
            imgv AS (
                SELECT media_id, i, (media_id * 7 + i * 13) % 256 AS v
                FROM (
                    SELECT media_id,
                           unnest(range((12 + media_id % 3)
                                        * (20 + media_id % 4) * 3)) AS i
                    FROM m WHERE media_id % 2 = 0
                )
            ),
            audv AS (
                SELECT media_id, i,
                       (media_id * 31 + i * 17) % 4096 - 2048 AS v
                FROM (
                    SELECT media_id,
                           unnest(range(1000 + 100 * (media_id % 7))) AS i
                    FROM m WHERE media_id % 2 = 1
                )
            ),
            allv AS (
                SELECT media_id, 'image' AS kind, i, v FROM imgv
                UNION ALL
                SELECT media_id, 'audio' AS kind, i, v FROM audv
            )
            SELECT media_id, kind,
                   count(*)::BIGINT AS n_values,
                   sum(v)::BIGINT AS sum_values,
                   sum(i * v)::BIGINT AS wsum_values,
                   min(v)::BIGINT AS min_value,
                   max(v)::BIGINT AS max_value
            FROM allv GROUP BY media_id, kind ORDER BY media_id
        """,
        # ann_ivf_pruned (approximate by design — probed cells depend on
        # k-means training): genuinely non-SQL-expressible → rows-only
        # check; correctness covered by pytest oracles.
    }


def _kmv_users_oracle_sql() -> str:
    from rayrep.ops.sketch import kmv_oracle_sql

    return kmv_oracle_sql(table="events", group_col="event_type",
                          value_col="user_id", k=64, out_col="approx_users")


def _cms_users_oracle_sql(width: int = 8192, depth: int = 4,
                          n_watch: int = 50) -> str:
    """DuckDB mirror of ``cms_user_counts``: identical double-hash buckets
    (uint64-normalized overflow-free HUGEINT mul-mod via
    ``sql_hash_pair_select`` — valid for any int64 key), cell counts
    grouped over the full events stream, then per-watchlist-key min over
    the depth rows — a LEFT JOIN so a probe landing in an empty cell reads
    0, exactly like the numpy matrix lookup."""
    from rayrep.ops.sketch import cms_oracle_cells_sql, sql_hash_pair_select

    two64 = "18446744073709551616::HUGEINT"
    cells = cms_oracle_cells_sql(table="events", key_col="user_id",
                                 width=width, depth=depth)
    probe_hashes = sql_hash_pair_select(
        "user_id", f"(SELECT range::BIGINT AS user_id FROM range({n_watch}))")
    return f"""
        WITH cells AS ({cells}),
        probes AS (
            SELECT user_id, t2.i::BIGINT AS i,
                   (((h1 + t2.i::HUGEINT * h2) % {two64}) % {width})::BIGINT AS b
            FROM {probe_hashes} t1, range({depth}) t2(i)
        )
        SELECT p.user_id, min(COALESCE(c.c, 0))::BIGINT AS est_n
        FROM probes p LEFT JOIN cells c ON p.i = c.i AND p.b = c.b
        GROUP BY p.user_id
        ORDER BY p.user_id
    """


def _fingerprint_oracle_sql(k: int = 8) -> str:
    """DuckDB mirror of ``rayrep.ops.text.Fingerprint``: for each doc,
    min over all k-byte grams of finalize(sum_j byte[i+j] * B^j mod 2^64),
    finalize(g) = murmur3-style xor-shift/multiply — all uint64 wraparound
    arithmetic emulated with HUGEINT mul-mod (a*b mod 2^64 via 32-bit limb
    split so no intermediate exceeds 2^96)."""
    B, M = 1099511628211, 1 << 64
    P = [pow(B, j, M) for j in range(k)]
    C = 0xFF51AFD7ED558CCD
    gram = " + ".join(f"by[i+{j + 1}]::HUGEINT * {P[j]}::HUGEINT" for j in range(k))
    mulmod = (
        f"(((t::HUGEINT % 4294967296) * {C}::HUGEINT"
        f" + (((t::HUGEINT // 4294967296) * {C % (1 << 32)}::HUGEINT) % 4294967296)"
        f" * 4294967296) % {M})"
    )
    return f"""
        WITH b AS (
            SELECT doc_id,
                   hex(encode(COALESCE(text, ''))) AS hx,
                   octet_length(encode(COALESCE(text, ''))) AS len
            FROM documents
        ),
        bytes AS (
            SELECT doc_id, len,
                   list_transform(range(1, len + 1), i ->
                       (strpos('0123456789ABCDEF', substr(hx, 2*i - 1, 1)) - 1) * 16
                       + strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1
                   ) AS by
            FROM b
        ),
        fps AS (
            SELECT doc_id,
                CASE WHEN len >= {k} THEN
                    list_min(
                        list_transform(
                            list_transform(
                                list_transform(
                                    list_transform(range(0, len - {k - 1}), i -> ({gram}) % {M}),
                                    g -> xor(g::UBIGINT, g::UBIGINT >> 33)),
                                t -> {mulmod}),
                            m -> xor(m::UBIGINT, m::UBIGINT >> 33))
                    )::HUGEINT
                ELSE 0::HUGEINT END AS fp_u
            FROM bytes
        )
        SELECT doc_id,
            CAST(CASE WHEN fp_u >= 9223372036854775808::HUGEINT
                      THEN fp_u - {M}::HUGEINT ELSE fp_u END AS BIGINT) AS fingerprint
        FROM fps
    """


def _kmeans_oracle_sql(k: int = 8, iters: int = 3, d: int = 64) -> str:
    """DuckDB replay of the EXACT integer Lloyd iterations in
    ops/similarity.kmeans_fit: same 2^20 quantization (floor of an exact
    power-of-two product), same integer squared distances, same
    (d2, cluster) tie-break, same floor-division centroid update (the
    double-mod emulation matches Python ``//`` on negatives), same
    keep-old-centroid rule for empty clusters. Every iterate is integer,
    so the comparison is bitwise, not tolerance-based."""
    parts = [f"""
        comp AS (
            SELECT vec_id, r.i - 1 AS dim,
                   CAST(floor(CAST(embedding[r.i] AS DOUBLE) * 1048576.0)
                        AS BIGINT) AS q
            FROM embeddings CROSS JOIN (SELECT unnest(range(1, {d + 1})) AS i) r
        ),
        cent0 AS (SELECT vec_id AS cluster, dim, q AS c FROM comp WHERE vec_id < {k})"""]
    for t in range(iters):
        parts.append(f"""
        dist{t} AS (
            SELECT comp.vec_id, ct.cluster,
                   SUM((comp.q - ct.c) * (comp.q - ct.c)) AS d2
            FROM comp JOIN cent{t} ct USING (dim)
            GROUP BY comp.vec_id, ct.cluster
        ),
        assign{t} AS (
            SELECT vec_id, cluster FROM dist{t}
            QUALIFY row_number() OVER (PARTITION BY vec_id
                                       ORDER BY d2 ASC, cluster ASC) = 1
        ),
        stats{t} AS (
            SELECT a.cluster, comp.dim, SUM(comp.q) AS s, COUNT(*) AS n
            FROM assign{t} a JOIN comp USING (vec_id)
            GROUP BY a.cluster, comp.dim
        ),
        cent{t + 1} AS (
            SELECT p.cluster, p.dim,
                   CASE WHEN st.n IS NULL THEN p.c
                        ELSE CAST((st.s - (((st.s % st.n) + st.n) % st.n)) / st.n
                                  AS BIGINT)
                   END AS c
            FROM cent{t} p LEFT JOIN stats{t} st
              ON st.cluster = p.cluster AND st.dim = p.dim
        )""")
    parts.append(f"""
        distF AS (
            SELECT comp.vec_id, ct.cluster,
                   SUM((comp.q - ct.c) * (comp.q - ct.c)) AS d2
            FROM comp JOIN cent{iters} ct USING (dim)
            GROUP BY comp.vec_id, ct.cluster
        ),
        assignF AS (
            SELECT vec_id, cluster, d2 FROM distF
            QUALIFY row_number() OVER (PARTITION BY vec_id
                                       ORDER BY d2 ASC, cluster ASC) = 1
        )""")
    final = f"""
        summary AS (
            SELECT cluster, count(*) AS cnt,
                   SUM(CAST((d2 - (d2 % 1048576)) / 1048576 AS BIGINT)) AS inert
            FROM assignF GROUP BY cluster
        )
        SELECT r.cluster, CAST(COALESCE(s.cnt, 0) AS BIGINT) AS n,
               CAST(COALESCE(s.inert, 0) AS BIGINT) AS inertia
        FROM (SELECT unnest(range(0, {k})) AS cluster) r
        LEFT JOIN summary s USING (cluster)
        ORDER BY r.cluster"""
    return "WITH " + ",".join(parts) + "," + final


def _ivf_exact_pruned_oracle_sql(
    k_clusters: int = 8, iters: int = 3, d: int = 64,
    nprobe: int = 2, k: int = 10, query_id: int = 0,
) -> str:
    """Same exact k-means CTE chain up to the final assignment, then the
    pruned search verbatim: probe the ``nprobe`` centroids nearest to the
    query by integer squared L2 (ties → lowest cluster), rank probe-cell
    members by integer squared L2 to the query (ties → lowest vec_id) —
    the pruned result is deterministic, so the comparison is bitwise."""
    kmeans = _kmeans_oracle_sql(k=k_clusters, iters=iters, d=d)
    body = kmeans[: kmeans.index(",\n        summary AS")]
    return body + f""",
        qdist AS (
            SELECT ct.cluster, SUM((cq.q - ct.c) * (cq.q - ct.c)) AS d2
            FROM comp cq JOIN cent{iters} ct USING (dim)
            WHERE cq.vec_id = {query_id}
            GROUP BY ct.cluster
        ),
        probes AS (
            SELECT cluster FROM qdist
            QUALIFY row_number() OVER (ORDER BY d2 ASC, cluster ASC) <= {nprobe}
        ),
        cd AS (
            SELECT ca.vec_id, SUM((ca.q - cq.q) * (ca.q - cq.q)) AS d2
            FROM comp ca
            JOIN comp cq ON cq.dim = ca.dim AND cq.vec_id = {query_id}
            JOIN assignF a ON a.vec_id = ca.vec_id
            JOIN probes p ON p.cluster = a.cluster
            GROUP BY ca.vec_id
        )
        SELECT vec_id, CAST(d2 AS BIGINT) AS d2
        FROM cd ORDER BY d2 ASC, vec_id ASC LIMIT {k}
    """
    # ^ the BIGINT cast matters: DuckDB's SUM(BIGINT) is HUGEINT, which
    # pandas renders as float64 — and a driver-side round(6) on a ~1e12
    # float loses integer precision (1401388873746 -> ...745.9998) and
    # breaks the hash against the Ray side's exact int64.


def _semantic_dedup_oracle_sql(
    theta: int, k: int = 8, iters: int = 3, d: int = 64,
) -> str:
    """Same exact k-means CTE chain up to the final assignment, then the
    SemDeDup rule verbatim: a row is a duplicate iff some lower-vec_id row
    in its cluster is within quantized squared L2 ``theta``. Pair distance
    via list_zip + integer lambda (no dim unnest), bitwise-exact."""
    kmeans = _kmeans_oracle_sql(k=k, iters=iters, d=d)
    body = kmeans[: kmeans.index(",\n        summary AS")]
    return body + f""",
        q AS (
            SELECT vec_id, list_transform(embedding,
                     x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)
                   ) AS qv
            FROM embeddings
        ),
        dup AS (
            SELECT a.vec_id
            FROM assignF a
            JOIN assignF b ON b.cluster = a.cluster AND b.vec_id < a.vec_id
            JOIN q qa ON qa.vec_id = a.vec_id
            JOIN q qb ON qb.vec_id = b.vec_id
            WHERE list_sum(list_transform(list_zip(qa.qv, qb.qv),
                           x -> (x[1] - x[2]) * (x[1] - x[2]))) <= {theta}
            GROUP BY a.vec_id
        )
        SELECT a.vec_id, a.cluster, (dup.vec_id IS NOT NULL) AS is_dup
        FROM assignF a LEFT JOIN dup USING (vec_id)
        ORDER BY a.vec_id"""
