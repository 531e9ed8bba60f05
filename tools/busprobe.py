"""No-Ray hardware probe: how much ALU and memory-system throughput does
this box ACTUALLY deliver at N concurrent processes?

Two kernels per worker process:
- alu:  tight integer multiply-xor loop on a register-resident value
        (no memory traffic) — measures deliverable core-seconds.
- data: lexsort + gather + memcpy over a ~100 MB working set — the
        replay exchange's memory-access shape; measures the shared
        cache/memory system.

Usage: python tools/busprobe.py [nprocs ...]   (default: 1 8 32)
Prints one JSON line per nproc level with per-process and aggregate
throughput plus the scaling ratio vs nproc=1. Readings are comparable
across runs/windows — record them next to any scaling ladder taken in
a suspect window (hypervisor steal shows in /proc/stat; a noisy
neighbor stealing cache/bandwidth only shows here)."""
import json
import multiprocessing as mp
import sys
import time

import numpy as np

N_DATA = 12_500_000  # ~100 MB of int64


def alu_kernel(_=None) -> float:
    x = 1469598103934665603
    t0 = time.perf_counter()
    iters = 20_000_000
    for _ in range(iters):
        x = (x * 1099511628211) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 33
    return iters / (time.perf_counter() - t0)


def data_kernel(_=None) -> float:
    rng = np.random.default_rng(0)
    k = rng.integers(0, 1 << 40, N_DATA)
    v = rng.integers(0, 1 << 40, N_DATA)
    t0 = time.perf_counter()
    rounds = 3
    for _ in range(rounds):
        o = np.lexsort((v, k))          # sort: the exchange's key order
        g = v[o]                         # gather
        _ = g.copy()                     # memcpy
    return rounds * N_DATA / (time.perf_counter() - t0)


def level(n: int) -> dict:
    out = {"nprocs": n}
    for name, fn in (("alu", alu_kernel), ("data", data_kernel)):
        with mp.Pool(n) as p:
            rates = p.map(fn, range(n))
        out[f"{name}_per_proc"] = round(sum(rates) / n)
        out[f"{name}_aggregate"] = round(sum(rates))
    return out


if __name__ == "__main__":
    levels = [int(a) for a in sys.argv[1:]] or [1, 8, 32]
    base = None
    for n in levels:
        r = level(n)
        if base is None:
            base = r
        for k in ("alu", "data"):
            r[f"{k}_scaling_vs_1"] = round(
                r[f"{k}_aggregate"] / (base[f"{k}_aggregate"] * n / base["nprocs"]), 3)
        print(json.dumps(r), flush=True)
