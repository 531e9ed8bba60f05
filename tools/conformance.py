"""Driver-protocol conformance check: run queries() vs oracle_sql().

Usage::

    python tools/conformance.py [--sf DIR] [name ...]

With no names, checks EVERY registry entry (the full dress rehearsal).
Protocol mirrors the driver: row count, column-name set, and a value
hash over columns sorted by name with rows sorted by all columns.
Queries without an ``oracle_sql()`` entry are reported ``rows_only``.
Exit 1 on any mismatch/error.
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _canon(df):
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def _hash(df) -> str:
    import pandas as pd

    body = pd.util.hash_pandas_object(_canon(df), index=False).to_numpy()
    return hashlib.sha256(body.tobytes()).hexdigest()[:16]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default=os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    args = ap.parse_args()

    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get(
            "RAY_GRAFT_CPUS", "32")), include_dashboard=False,
            ignore_reinit_error=True)

    import __ray_entry__ as entry

    reg = entry.queries()
    oracles = entry.oracle_sql()
    names = args.names or list(reg)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = 0
    t_all = time.perf_counter()
    for name in names:
        t0 = time.perf_counter()
        try:
            res = reg[name](args.sf)
            if isinstance(res, pa.Table):
                res = res.to_pandas()
            elif not isinstance(res, pd.DataFrame):
                res = res.to_pandas()
            dt = time.perf_counter() - t0
            if name not in oracles:
                print(f"{name:32s} rows_only rows={len(res)} {dt:6.1f}s")
                continue
            ora = con.execute(oracles[name]).df()
            ok_rows = len(res) == len(ora)
            ok_schema = sorted(res.columns) == sorted(ora.columns)
            ok_hash = ok_rows and ok_schema and _hash(res) == _hash(ora)
            verdict = "MATCH" if ok_hash else "FAIL"
            if not ok_hash:
                failures += 1
            print(f"{name:32s} {verdict} rows={len(res)}/{len(ora)} "
                  f"schema={ok_schema} {dt:6.1f}s")
        except Exception as e:  # noqa: BLE001 — report and count, keep going
            failures += 1
            print(f"{name:32s} ERROR {type(e).__name__}: {e}")
    print(json.dumps({"checked": len(names), "failures": failures,
                      "sec": round(time.perf_counter() - t_all, 1)}))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
