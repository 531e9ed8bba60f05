#!/usr/bin/env python
"""Benchmark harness.

Default: run the headline CDC replay plus representative operator queries
over ``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1) under
``ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and
print ONE JSON line::

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
     "replay_events": E, "replay_events_per_sec": X}

``--headline-only``: replay timing only (used by the scaling runs).
``--scaling``: run the SAME cached changelog in two fresh processes at
``$BENCH_LO``/``$BENCH_HI`` CPUs (default 8/32), report both throughputs +
scaling efficiency, append the result to BENCH/BASELINE.md.
``--probe``: the window-health gate (BENCH/BASELINE.md protocol): one
timed headline replay at NUM_CPUS plus single-process busprobe kernels
and measured hypervisor steal, one JSON line, appends nothing. Run
ladders only when ``healthy`` is true (replay ≥ 1M ev/s at 32 cpus;
clean-window record 1.49M, degraded windows read 100-600k).

The changelog input is cached under /tmp/rayrep_bench (same bytes for
every run/process — the scaling comparison is apples-to-apples) and a
small untimed warmup replay spawns workers + warms the page cache first,
so the timed section measures compute + shuffle, not process cold-start.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_ROOT = "/tmp/rayrep_bench"
# sf0.1 events table has 100k rows -> 20M-event replay (2 epochs of 10M);
# epochs must be big enough that the sort barrier's fixed latency amortizes,
# or the high-parallelism level never gets to use its extra CPUs
EVENTS_PER_SF_ROW = int(os.environ.get("BENCH_EVENTS_PER_SF_ROW", "200"))


def sf_tag() -> str:
    return os.path.basename(os.path.normpath(SF_DIR))


def changelog_events() -> int:
    abs_n = int(os.environ.get("BENCH_EVENTS_ABS", "0"))
    if abs_n:  # weak-scaling protocol pins the count directly
        return abs_n
    import pyarrow.parquet as pq

    n = pq.read_metadata(os.path.join(SF_DIR, "events.parquet")).num_rows
    return max(100_000, n * EVENTS_PER_SF_ROW)


TEXT_PAD = int(os.environ.get("BENCH_TEXT_PAD", "0"))


def ensure_changelog(n_events: int) -> str:
    """Generate (once) the deterministic bench changelog for this sf tier.
    ``BENCH_TEXT_PAD`` pads texts to ~N bytes (realistic transcript turns
    are hundreds of bytes; 0 keeps the short debug payload)."""
    tag = f"cl-{sf_tag()}-{n_events}-e4" + (f"-p{TEXT_PAD}" if TEXT_PAD else "")
    cl = os.path.join(BENCH_ROOT, tag)
    marker = os.path.join(cl, "_gen_manifest.json")
    if not os.path.exists(marker):
        from rayrep.gen import GenSpec, write_changelog

        shutil.rmtree(cl, ignore_errors=True)
        write_changelog(
            cl,
            GenSpec(
                seed=42,
                n_events=n_events,
                n_conversations=max(2000, n_events // 50),
                max_turns=50,
                n_epochs=4,
                zipf_a=1.1,
                text_pad=TEXT_PAD,
            ),
        )
    return cl


def warmup() -> None:
    from rayrep.config import EngineConfig
    from rayrep.gen import GenSpec, write_changelog
    from rayrep.pipeline import replay

    wcl = os.path.join(BENCH_ROOT, "warmup-cl")
    if not os.path.exists(os.path.join(wcl, "_gen_manifest.json")):
        write_changelog(wcl, GenSpec(n_events=50_000, n_conversations=2000, n_epochs=1))
    wlake = os.path.join(BENCH_ROOT, f"warmup-lake-{os.getpid()}")
    replay(EngineConfig(changelog_dir=wcl, lake_dir=wlake, num_partitions=32))
    shutil.rmtree(wlake, ignore_errors=True)
    # warm the groupby().aggregate() operator path too: its first execution
    # in a session pays ~6 s of one-off spin-up (measured r0 7.7 s vs warm
    # 1.3 s on dedup_exact) which otherwise lands on whichever timed query
    # hits it first
    import ray.data as rdm
    from ray.data.aggregate import Count, Min

    rdm.from_items([{"k": i % 8, "v": i} for i in range(1024)]).groupby(
        "k"
    ).aggregate(Min("v"), Count()).materialize()


def bench_pack() -> bool:
    """BENCH_PACK: 1/0 force; unset/"auto" = packed iff NUM_CPUS >= 16.
    The crossover is measured, three same-window A/Bs on 2026-08-18
    (BENCH/BASELINE.md): at 32 cpus packed-lz4 1.30M ev/s vs plain
    355-450k (this box's aggregate memory bandwidth FALLS from 8 to 32
    procs even at zero steal, so exchange bytes bind); at 8 cpus plain/
    uncompressed wins (bus unsaturated, LZ4 ALU is pure cost). The
    headline benches the engine's recommended config for the measured
    regime, and the result JSON self-describes which exchange ran."""
    env = os.environ.get("BENCH_PACK", "auto")
    if env in ("auto", ""):
        return NUM_CPUS >= 16
    return bool(int(env))


def run_replay(cl: str, n_events: int) -> dict:
    """Best of $BENCH_REPEATS (default 2) replays — the sandbox VM has
    ±20% run-to-run noise; min is the standard noise-robust statistic."""
    from rayrep.config import EngineConfig
    from rayrep.pipeline import replay

    best = None
    for rep in range(int(os.environ.get("BENCH_REPEATS", "2"))):
        lake = os.path.join(BENCH_ROOT, f"lake-{os.getpid()}")
        shutil.rmtree(lake, ignore_errors=True)
        t0 = time.perf_counter()
        res = replay(
            EngineConfig(
                changelog_dir=cl,
                lake_dir=lake,
                # P > cpus over-decomposes the apply wave so zipf-skew
                # stragglers backfill instead of idling cores; ladder
                # experiments set BENCH_PARTS at BOTH levels
                num_partitions=int(os.environ.get("BENCH_PARTS", "32")),
                epochs_per_round=int(os.environ.get("BENCH_EPR", "4")),
                # "auto" (engine default) floors blocks-per-read at the
                # core count; "none" keeps Ray's 200-block shred (the
                # pre-round-5 behavior, for A/B against old ladders)
                read_min_blocks=(lambda v: None if v == "none"
                                 else v if v == "auto" else int(v))(
                    os.environ.get("BENCH_READ_MIN_BLOCKS", "auto")),
                pack_exchange=bench_pack(),
                # lz4 | zstd | none (pack blobs, skip compression)
                pack_codec=os.environ.get("BENCH_PACK_CODEC", "lz4"),
            )
        )
        dt = time.perf_counter() - t0
        assert res["totals"]["input_rows"] == n_events  # DDL isn't a row event
        shutil.rmtree(lake, ignore_errors=True)
        best = dt if best is None else min(best, dt)
    return {"sec": best, "events_per_sec": n_events / best}


def consume(res) -> int:
    import pandas as pd

    if isinstance(res, pd.DataFrame):
        return len(res)
    return res.count() if hasattr(res, "count") else len(res.to_pandas())


def run_queries() -> dict[str, float]:
    from rayrep import queries as q

    timed = [
        "cdc_lww_latest",
        "cdc_daily_counts",
        "q1_pricing_summary",
        "orders_by_segment",
        "order_priority_revenue",
        "sessionize_users",
        "asof_click_value",
        "dedup_exact",
        "dedup_minhash",
        "token_stats",
        "ann_topk",
    ]
    out = {}
    reg = q.queries()
    for name in timed:
        t0 = time.perf_counter()
        consume(reg[name](SF_DIR))
        out[name] = round(time.perf_counter() - t0, 3)
    return out


# Second, VERSIONED suite (v2): the session-3/4 additions — sketches,
# delta rollup, exact k-means, pruned-read IVF, real-container decode —
# tracked per-round for scale behavior WITHOUT perturbing the
# round-comparable core suite above (their times are reported under
# ``queries_v2`` and excluded from the headline total).
SUITE_V2 = [
    "approx_distinct_users",
    "cms_user_counts",
    "value_quantile_sketch",
    "urgent_lineitems_bloom",
    "cdc_delta_rollup",
    "kmeans_clusters",
    "semantic_dedup",
    "ann_ivf_exact_pruned",
    "multimodal_features",
    "doc_fingerprint",
    "cdc_ingest_dedup",
    "cdc_repartition",
    # session-6 additions
    "cdc_lake_diff",
    "pii_redact_docs",
    "tumbling_window_values",
    "cdc_multi_table_docs",
    # session-8 additions
    "cdc_training_export",
    "cdc_partition_repair",
    # session-10 additions
    "cdc_bulk_load",
    # session-11 additions
    "cdc_log_compaction",
    "cdc_secondary_index",
    "cdc_dead_letter",
    "cdc_tail_compacting",
    "cdc_dlq_requeue",
    # round-5 additions
    "cdc_metrics_stream",
    "cdc_source_failover",
]


def run_queries_v2() -> dict[str, float]:
    from rayrep import queries as q

    out = {}
    reg = q.queries()
    for name in SUITE_V2:
        t0 = time.perf_counter()
        consume(reg[name](SF_DIR))
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def main_bench(headline_only: bool) -> dict:
    import ray

    n_events = changelog_events()
    cl = ensure_changelog(n_events)

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    s0 = _cpu_sample()
    try:
        warmup()
        replay_stats = run_replay(cl, n_events)
        queries = {} if headline_only else run_queries()
        queries_v2 = {} if headline_only else run_queries_v2()
    finally:
        ray.shutdown()
    steal = _steal_pct(s0, _cpu_sample())

    queries = {"cdc_replay": round(replay_stats["sec"], 3), **queries}
    total = round(sum(queries.values()), 3)
    out = {
        "metric": "rayrep bench: CDC replay + operator suite wall time",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf_tag(),
        "num_cpus": NUM_CPUS,
        "replay_events": n_events,
        "replay_events_per_sec": round(replay_stats["events_per_sec"]),
        "pack_exchange": bench_pack(),
        "pack_codec": os.environ.get("BENCH_PACK_CODEC", "lz4"),
        # window self-annotation: hypervisor steal% over the whole run.
        # Clean-window reference (BENCH/BASELINE.md 08-19 04:08): core
        # suite 22.9 s / replay 2.02M ev/s at ~0% steal — compare THERE
        # when this field shows a degraded window (>5%).
        "host_steal_pct": steal,
    }
    if queries_v2:
        # v2 suite tracked separately; NOT in `value` (round comparability)
        out["queries_v2"] = queries_v2
        out["v2_total"] = round(sum(queries_v2.values()), 3)
    return out


def _cpu_sample() -> tuple[int, int]:
    """(steal_ticks, total_ticks) from /proc/stat — hypervisor health."""
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = [int(x) for x in parts]
    steal = vals[7] if len(vals) > 7 else 0
    return steal, sum(vals)


def _steal_pct(before: tuple[int, int], after: tuple[int, int]) -> float:
    dt = after[1] - before[1]
    return round(100.0 * (after[0] - before[0]) / dt, 1) if dt > 0 else 0.0


def _ladder_pack() -> str:
    """Resolve BENCH_PACK ONCE for a ladder: both levels must run the
    SAME exchange shape or the ratio compares two different jobs. "auto"
    resolves by the HIGH level (the regime being scaled toward)."""
    env = os.environ.get("BENCH_PACK", "auto")
    if env in ("auto", ""):
        return "1" if int(os.environ.get("BENCH_HI", "32")) >= 16 else "0"
    return env


def main_scaling() -> dict:
    lo = int(os.environ.get("BENCH_LO", "8"))
    hi = int(os.environ.get("BENCH_HI", "32"))
    pack = _ladder_pack()
    # generate the cache up front so neither timed process pays for it
    ensure_changelog(changelog_events())

    def run(ncpu: int) -> dict:
        # steady-state throughput: best-of-2 inside one process, so the
        # one-off worker-spawn/page-cache cost (~5-8 s on this VM) does not
        # deflate both levels of the ratio — the 10^10-event design point
        # amortizes fixed startup to nothing
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   BENCH_REPEATS=os.environ.get("BENCH_LADDER_REPEATS", "2"),
                   BENCH_PACK=pack)
        s0 = _cpu_sample()
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--headline-only"],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        r = json.loads(out.strip().splitlines()[-1])
        # hypervisor-steal % over this level's whole run: every ladder is
        # self-annotating with host health, so a degraded-window number
        # can't masquerade as an engine property
        r["steal_pct"] = _steal_pct(s0, _cpu_sample())
        return r

    # interleave lo/hi rounds so machine drift (page cache, THP compaction)
    # biases both levels equally; best-of per level
    results: dict[int, dict] = {}
    for ncpu in (lo, hi, lo, hi):
        r = run(ncpu)
        cur = results.get(ncpu)
        if cur is None or r["replay_events_per_sec"] > cur["replay_events_per_sec"]:
            results[ncpu] = r
    r_lo, r_hi = results[lo], results[hi]
    thr_lo = r_lo["replay_events_per_sec"]
    thr_hi = r_hi["replay_events_per_sec"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    result = {
        "metric": "scaling efficiency (replay events/sec, fresh processes)",
        "sf": r_lo["sf"],
        "replay_events": r_lo["replay_events"],
        f"sec_{lo}": r_lo["queries"]["cdc_replay"],
        f"sec_{hi}": r_hi["queries"]["cdc_replay"],
        f"events_per_sec_{lo}": thr_lo,
        f"events_per_sec_{hi}": thr_hi,
        "cpus": [lo, hi],
        "scaling_efficiency": round(eff, 3),
        "per_cpu_throughput": {
            str(lo): round(thr_lo / lo), str(hi): round(thr_hi / hi)
        },
        "steal_pct": {str(lo): r_lo.get("steal_pct"),
                      str(hi): r_hi.get("steal_pct")},
        "pack_exchange": bool(int(pack)),
        "pack_codec": os.environ.get("BENCH_PACK_CODEC", "lz4"),
        "num_partitions": int(os.environ.get("BENCH_PARTS", "32")),
    }
    _append_bench_md(result)
    return result


def main_probe() -> dict:
    """Window-health gate. One timed headline replay (fresh subprocess,
    current NUM_CPUS, default exchange) + tools/busprobe.py single-process
    kernels + hypervisor steal over the replay. `healthy` operationalizes
    the BENCH/BASELINE.md protocol: record a ladder only from a window
    whose 32-cpu replay clears ~1M ev/s; otherwise the ladder measures the
    neighbors, not the engine."""
    ensure_changelog(changelog_events())
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
    import busprobe

    s0 = _cpu_sample()
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--headline-only"],
        env=dict(os.environ, BENCH_REPEATS="1"),
        capture_output=True, text=True, check=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    ).stdout
    r = json.loads(out.strip().splitlines()[-1])
    steal = _steal_pct(s0, _cpu_sample())
    alu_1 = busprobe.alu_kernel()
    data_1 = busprobe.data_kernel()
    evps = r["replay_events_per_sec"]
    return {
        "metric": "window-health probe",
        "num_cpus": NUM_CPUS,
        "replay_events_per_sec": evps,
        "pack_exchange": r.get("pack_exchange"),
        "steal_pct": steal,
        # clean-window 1-proc references (2026-08-18): alu ~6.1M it/s,
        # data ~1.09M rows/s — a big shortfall here means a noisy
        # neighbor holds the bus/cache even when steal reads 0
        "busprobe_1proc": {"alu": round(alu_1), "data": round(data_1)},
        "healthy": bool(evps >= 1_000_000 * (NUM_CPUS / 32) * 0.9
                        and steal < 5.0),
    }


def main_weak_scaling() -> dict:
    """WEAK scaling: per-cpu load held fixed — events scale with cpus
    (lo cpus × E events vs hi cpus × (hi/lo)·E events). This models the
    real cluster story ("add nodes, ingest proportionally more binlog"),
    and on one box it routes 4× the shuffle VOLUME through the same
    memory system at the hi level, so it is a conservative proxy.
    Efficiency = t_lo / t_hi (ideal 1.0: 4× data on 4× cpus, same wall)."""
    lo = int(os.environ.get("BENCH_LO", "8"))
    hi = int(os.environ.get("BENCH_HI", "32"))
    pack = _ladder_pack()
    base = changelog_events() // (hi // lo)

    def run(ncpu: int, n_events: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), BENCH_REPEATS="2",
                   BENCH_EVENTS_PER_SF_ROW="0", BENCH_EVENTS_ABS=str(n_events),
                   BENCH_PACK=pack)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--headline-only"],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # generate both changelogs up front, untimed
    ensure_changelog(base)
    ensure_changelog(base * (hi // lo))
    results: dict[int, dict] = {}
    for ncpu, n in ((lo, base), (hi, base * (hi // lo)), (lo, base), (hi, base * (hi // lo))):
        r = run(ncpu, n)
        cur = results.get(ncpu)
        if cur is None or r["queries"]["cdc_replay"] < cur["queries"]["cdc_replay"]:
            results[ncpu] = r
    t_lo = results[lo]["queries"]["cdc_replay"]
    t_hi = results[hi]["queries"]["cdc_replay"]
    result = {
        "metric": "WEAK scaling (fixed per-cpu load, fresh processes)",
        "sf": results[lo]["sf"],
        f"events_{lo}": results[lo]["replay_events"],
        f"events_{hi}": results[hi]["replay_events"],
        f"sec_{lo}": t_lo, f"sec_{hi}": t_hi,
        f"events_per_sec_{lo}": results[lo]["replay_events_per_sec"],
        f"events_per_sec_{hi}": results[hi]["replay_events_per_sec"],
        "cpus": [lo, hi],
        "weak_scaling_efficiency": round(t_lo / t_hi, 3),
        "pack_exchange": bool(int(pack)),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "a") as f:
        f.write(
            f"\n## WEAK scaling run {time.strftime('%Y-%m-%d %H:%M:%S')}\n\n"
            f"- per-cpu load fixed: {results[lo]['replay_events']:,} events @ {lo} cpus vs "
            f"{results[hi]['replay_events']:,} @ {hi} cpus ({results[lo]['sf']})\n"
            f"- num_cpus={lo}: {t_lo}s = {results[lo]['replay_events_per_sec']:,} ev/s\n"
            f"- num_cpus={hi}: {t_hi}s = {results[hi]['replay_events_per_sec']:,} ev/s\n"
            f"- weak scaling efficiency t_{lo}/t_{hi} = {result['weak_scaling_efficiency']}"
            f" (ideal 1.0: {hi // lo}x data on {hi // lo}x cpus, same wall)\n"
            f"- exchange mode: {'packed' if result['pack_exchange'] else 'plain groupby'}\n"
            f"- caveat: the {hi}-cpu level pushes {hi // lo}x the shuffle volume through ONE box's "
            f"memory system — conservative vs a real {hi // lo}x-node cluster\n"
        )
    return result


def _append_bench_md(result: dict) -> None:
    os.makedirs(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH"),
                exist_ok=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "BASELINE.md")
    stamp = time.strftime("%Y-%m-%d %H:%M:%S")
    lo, hi = result["cpus"]
    with open(path, "a") as f:
        f.write(
            f"\n## Scaling run {stamp}\n\n"
            f"- input: {result['replay_events']:,} events ({result['sf']}), same cached changelog for both levels\n"
            f"- num_cpus={lo}: {result[f'sec_{lo}']}s = {result[f'events_per_sec_{lo}']:,} ev/s "
            f"({result['per_cpu_throughput'][str(lo)]:,} ev/s/cpu)\n"
            f"- num_cpus={hi}: {result[f'sec_{hi}']}s = {result[f'events_per_sec_{hi}']:,} ev/s "
            f"({result['per_cpu_throughput'][str(hi)]:,} ev/s/cpu)\n"
            f"- scaling efficiency (thr_hi/thr_lo)/({hi}/{lo}) = {result['scaling_efficiency']}\n"
            f"- exchange mode: {'packed (BENCH_PACK=1, codec=' + result.get('pack_codec', 'lz4') + ')' if result.get('pack_exchange') else 'plain groupby'}"
            f"; num_partitions={result.get('num_partitions', 32)}\n"
            f"- hypervisor steal during best level runs: "
            f"{result.get('steal_pct', {})}\n"
            f"- caveat: both levels share ONE machine's memory/IO bandwidth; "
            f"shuffle bytes cross a single memory system, unlike a real {hi // lo}x-node cluster\n"
        )


def main_bytes() -> dict:
    """Exchange-volume accounting (STEAL-PROOF: row/byte counts are
    deterministic regardless of host state): bytes and rows entering the
    sort exchange per event, for raw-augmented vs map-side-combined vs
    packed-IPC variants.  This is the quantity the scaling ladder's
    memory-bus ceiling is made of."""
    import ray
    import ray.data as rd

    n = int(os.environ.get("BENCH_EVENTS_ABS", "2000000"))
    os.environ["BENCH_EVENTS_ABS"] = str(n)
    cl = ensure_changelog(n)
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    try:
        import pyarrow as pa

        from rayrep.combine import combine_batch
        from rayrep.exchange import pack_batch
        from rayrep.pipeline import _augment, discover_epochs
        from rayrep.registry import SchemaRegistry

        target_json = SchemaRegistry().current_json()

        def measure(ds) -> tuple[int, int]:
            def count(t: pa.Table) -> pa.Table:
                return pa.table({"rows": pa.array([t.num_rows], pa.int64()),
                                 "nbytes": pa.array([t.nbytes], pa.int64())})
            parts = ds.map_batches(count, batch_format="pyarrow").take_all()
            return (sum(r["rows"] for r in parts),
                    sum(r["nbytes"] for r in parts))

        from rayrep.ingest_dedup import stamp_content

        out = {}
        for name in ("augmented", "combined", "packed", "dedup_stamped"):
            total_rows = total_bytes = 0
            for _, path in discover_epochs(cl):
                ds = _augment(rd.read_parquet(path), target_json, 32)
                if name == "dedup_stamped":
                    # the EXTRA exchange dedup-on-ingest adds: full
                    # augmented rows + ckey(u64) + cbucket(i32) routed by
                    # content bucket BEFORE the conv exchange
                    ds = ds.map_batches(
                        stamp_content,
                        fn_kwargs={"content_col": "text", "num_buckets": 32},
                        batch_format="pyarrow", zero_copy_batch=True)
                if name in ("combined", "packed"):
                    ds = ds.map_batches(combine_batch, fn_kwargs={"by_day": True},
                                        batch_format="pyarrow", zero_copy_batch=True)
                if name == "packed":
                    ds = ds.map_batches(pack_batch, batch_format="pyarrow",
                                        zero_copy_batch=True)
                r, b = measure(ds)
                total_rows += r
                total_bytes += b
            out[name] = {"rows": total_rows,
                         "bytes_per_event": round(total_bytes / n, 1),
                         "rows_per_event": round(total_rows / n, 3)}
    finally:
        ray.shutdown()
    result = {"metric": "bytes entering the sort exchange per event",
              "events": n, "variants": out}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH", "BASELINE.md")
    with open(path, "a") as f:
        f.write(f"\n## Exchange-volume accounting {time.strftime('%Y-%m-%d %H:%M:%S')} "
                f"({n:,} events — deterministic, steal-independent)\n\n")
        for k, v in out.items():
            f.write(f"- {k}: {v['bytes_per_event']} B/event, "
                    f"{v['rows_per_event']} rows/event\n")
    return result


def main_delta_state() -> dict:
    """Long-tail epoch bench: a big snapshot builds a large converged lake,
    then many tiny epochs trickle in. Demonstrates that epoch wall-time in
    delta mode (state_snapshot_interval>1) tracks DELTA size, while the
    full-rewrite mode (interval=1) pays O(partition state) every epoch."""
    import numpy as np
    import pyarrow.parquet as pq2
    import ray

    from rayrep.config import EngineConfig
    from rayrep.gen import GenSpec, generate_changelog
    from rayrep.pipeline import replay

    n_snap, n_tail_epochs, tail_rows = 4_000_000, 12, 100_000
    n_events = n_snap + n_tail_epochs * tail_rows
    cl = os.path.join(BENCH_ROOT, f"cl-longtail-{n_events}")
    if not os.path.exists(os.path.join(cl, "_done")):
        shutil.rmtree(cl, ignore_errors=True)
        table = generate_changelog(GenSpec(
            seed=42, n_events=n_events, n_conversations=1_200_000, max_turns=8,
            snapshot_frac=n_snap / n_events, n_epochs=1, zipf_a=1.1,
        ))
        bounds = [0, n_snap] + [n_snap + (i + 1) * tail_rows for i in range(n_tail_epochs)]
        bounds[-1] = table.num_rows
        for e in range(len(bounds) - 1):
            edir = os.path.join(cl, f"epoch-{e:05d}")
            os.makedirs(edir)
            chunk = table.slice(bounds[e], bounds[e + 1] - bounds[e])
            nf = max(1, chunk.num_rows // 500_000)
            fb = np.linspace(0, chunk.num_rows, nf + 1).astype(np.int64)
            for i in range(nf):
                pq2.write_table(chunk.slice(int(fb[i]), int(fb[i + 1] - fb[i])),
                                os.path.join(edir, f"part-{i:04d}.parquet"))
        open(os.path.join(cl, "_done"), "w").close()

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    out = {}
    try:
        warmup()
        for label, interval, cc in (
            ("full_rewrite_interval1", 1, False),
            ("delta_interval8", 8, False),
            # round 3: changed-cells mode is a delta path too — tail
            # epochs must be O(delta), not O(state) (the round-2 mode
            # rewrote full partition state per epoch)
            ("delta_interval8_changed_cells", 8, True),
        ):
            lake = os.path.join(BENCH_ROOT, f"lt-lake-{os.getpid()}-{label}")
            shutil.rmtree(lake, ignore_errors=True)
            res = replay(EngineConfig(
                changelog_dir=cl, lake_dir=lake, num_partitions=32,
                epochs_per_round=1, state_snapshot_interval=interval,
                changed_cells_updates=cc,
            ))
            walls = [e["wall_s"] for e in res["epochs"]]
            tail = walls[1:]
            out[label] = {
                "snapshot_epoch_s": round(walls[0], 2),
                "tail_epoch_mean_s": round(sum(tail) / len(tail), 2),
                "tail_epoch_min_s": round(min(tail), 2),
                "tail_epoch_max_s": round(max(tail), 2),
                "total_s": round(sum(walls), 2),
            }
            shutil.rmtree(lake, ignore_errors=True)
    finally:
        ray.shutdown()
    result = {
        "metric": "delta-state long-tail epochs: wall per 100k-event epoch over a 4M-key lake",
        "num_cpus": NUM_CPUS,
        **out,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "BASELINE.md")
    with open(path, "a") as f:
        f.write(
            f"\n## Delta-state long-tail run {time.strftime('%Y-%m-%d %H:%M:%S')}\n\n"
            f"- 4M-event snapshot → 12 × 100k-event tail epochs, per-epoch commit, 32 cpus\n"
            f"- full rewrite (interval=1): tail epoch mean "
            f"{out['full_rewrite_interval1']['tail_epoch_mean_s']}s (O(state) per epoch)\n"
            f"- delta chain (interval=8):  tail epoch mean "
            f"{out['delta_interval8']['tail_epoch_mean_s']}s (O(delta) write + narrow seed read)\n"
            f"- changed-cells delta (interval=8): tail epoch mean "
            f"{out['delta_interval8_changed_cells']['tail_epoch_mean_s']}s "
            f"(per-event partial-row deltas, cell fold at read/compaction)\n"
        )
    return result


def main_staged() -> dict:
    """Staged-exchange bench on its TARGET topology assumption: a
    constrained object store (slow/small plasma, fast shared filesystem).
    Runs the same replay with exchange=groupby vs exchange=staged under a
    small object_store_memory so the sort shuffle must spill, which is the
    regime the staged mode exists for (COVERAGE.md claim)."""
    import ray

    from rayrep.config import EngineConfig
    from rayrep.pipeline import replay

    n_events = changelog_events()
    cl = ensure_changelog(n_events)
    budget_s = int(os.environ.get("BENCH_STAGED_TIMEOUT", "420"))
    out = {}
    for label, exchange in (("groupby_sort_shuffle", "groupby"),
                            ("staged_filesystem", "staged")):
        # one subprocess per mode with a hard wall-clock budget: under a
        # constrained object store the in-memory sort can stall on spill
        # backpressure for tens of minutes -- "did not finish" IS the result
        code = (
            "import ray, sys, time, shutil, os\n"
            "sys.path.insert(0, %r)\n"
            "ray.init(address='local', num_cpus=%d, include_dashboard=False,"
            " logging_level='ERROR', object_store_memory=1_500_000_000)\n"
            "from ray.data import DataContext\n"
            "DataContext.get_current().enable_progress_bars = False\n"
            "from rayrep.config import EngineConfig\n"
            "from rayrep.pipeline import replay\n"
            "lake = %r\n"
            "shutil.rmtree(lake, ignore_errors=True)\n"
            "t0 = time.perf_counter()\n"
            "replay(EngineConfig(changelog_dir=%r, lake_dir=lake,"
            " num_partitions=32, epochs_per_round=4, exchange=%r))\n"
            "print('SEC', time.perf_counter() - t0)\n"
            "shutil.rmtree(lake, ignore_errors=True)\n"
            "ray.shutdown()\n"
        ) % (os.path.dirname(os.path.abspath(__file__)), NUM_CPUS,
             os.path.join(BENCH_ROOT, f"staged-lake-{exchange}"), cl, exchange)
        try:
            r = subprocess.run([sys.executable, "-u", "-c", code],
                               capture_output=True, text=True, timeout=budget_s)
            sec = None
            for line in r.stdout.splitlines():
                if line.startswith("SEC "):
                    sec = float(line.split()[1])
            if sec is None:
                out[label] = {"sec": None, "note": "failed", "stderr": r.stderr[-300:]}
            else:
                out[label] = {"sec": round(sec, 2),
                              "events_per_sec": round(n_events / sec)}
        except subprocess.TimeoutExpired:
            out[label] = {"sec": None,
                          "note": f"did not finish within {budget_s}s (spill stall)"}
        subprocess.run(["pkill", "-f", "raylet"], capture_output=True)
        time.sleep(3)
    result = {"metric": "exchange modes under a 1.5 GB object store (spill regime)",
              "num_cpus": NUM_CPUS, "replay_events": n_events, **out}
    def fmt(d):
        if d.get("sec") is None:
            return d.get("note", "failed")
        return f"{d['sec']}s = {d['events_per_sec']:,} ev/s"

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "BASELINE.md")
    with open(path, "a") as f:
        f.write(
            f"\n## Staged-exchange run {time.strftime('%Y-%m-%d %H:%M:%S')} "
            f"(object store capped at 1.5 GB -> sort shuffle must spill)\n\n"
            f"- groupby sort shuffle: {fmt(out['groupby_sort_shuffle'])}\n"
            f"- staged filesystem:    {fmt(out['staged_filesystem'])}\n"
        )
    return result


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    if "--probe" in sys.argv:
        print(json.dumps(main_probe()))
    elif "--scaling" in sys.argv:
        print(json.dumps(main_scaling()))
    elif "--weak-scaling" in sys.argv:
        print(json.dumps(main_weak_scaling()))
    elif "--bytes" in sys.argv:
        print(json.dumps(main_bytes()))
    elif "--delta-state" in sys.argv:
        print(json.dumps(main_delta_state()))
    elif "--staged" in sys.argv:
        print(json.dumps(main_staged()))
    else:
        print(json.dumps(main_bench("--headline-only" in sys.argv)))
