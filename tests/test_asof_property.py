"""Property test for the Arrow searchsorted as-of join kernel
(rayrep/ops/windows.asof_join, rewritten round 5): for RANDOM left/right
frames — duplicate (key, ts) right rows, null values, keys on one side
only, left ts before/after every right ts — the distributed kernel must
equal a pandas ``merge_asof`` reference implementing the documented
semantics (backward inner-asof; right dedup to the max-tiebreak winner
per (key, ts); matched-but-null values KEPT)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from rayrep.ops.windows import asof_join


def _reference(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    r = (right.sort_values(["k", "ts", "tb"], kind="stable")
         .drop_duplicates(["k", "ts"], keep="last")
         .drop(columns=["tb"])
         .assign(__m=np.int8(1))
         .sort_values("ts", kind="stable"))
    l = left.sort_values("ts", kind="stable")
    m = pd.merge_asof(l, r, on="ts", by="k", direction="backward",
                      suffixes=("", "_right"))
    m = m[m["__m"].notna()].drop(columns=["__m"])
    return m


def _dataset(df: pd.DataFrame) -> tuple[rd.Dataset, pa.Schema]:
    t = pa.Table.from_pandas(df, preserve_index=False)
    i = t.column_names.index("ts")
    t = t.set_column(i, "ts", t["ts"].cast(pa.timestamp("us")))
    return rd.from_arrow(t), t.schema


@pytest.mark.parametrize("seed", [11, 22, 33, 44, 55, 66])
def test_asof_matches_pandas_reference(seed):
    rng = np.random.default_rng(seed)
    nl, nr = int(rng.integers(1, 60)), int(rng.integers(1, 60))
    keys = np.array(["a", "b", "c", "only-left", "only-right"])
    left = pd.DataFrame({
        "k": rng.choice(keys[:4], nl),
        "ts": pd.to_datetime(rng.integers(0, 25, nl), unit="s"),
        "lid": np.arange(nl),
    })
    rv = rng.uniform(0, 100, nr).round(2)
    rv[rng.random(nr) < 0.25] = np.nan  # matched-but-null values KEPT
    right = pd.DataFrame({
        "k": rng.choice(np.concatenate([keys[:3], keys[4:]]), nr),
        "ts": pd.to_datetime(rng.integers(0, 25, nr), unit="s"),
        "v": rv,
        "tb": rng.integers(0, 1000, nr),
    })
    lds, lsch = _dataset(left)
    rds, rsch = _dataset(right)
    out = asof_join(
        lds, rds, key="k", ts_col="ts", value_cols=["v"],
        right_tiebreak="tb", num_partitions=int(rng.integers(1, 5)),
        left_schema=lsch, right_schema=rsch,
    ).to_pandas()
    exp = _reference(left, right)
    out = out.sort_values("lid").reset_index(drop=True)
    exp = exp.sort_values("lid").reset_index(drop=True)[out.columns]
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
