"""Lake diff (check.diff_lakes): the replication-audit operator.

Oracled in-repo against a pandas recompute over the two lakes' own
converged images — every status class (only_a / only_b / differs) is
exercised by diffing two lakes replayed from different seeds, and the
aligned-routing precondition is enforced, not assumed."""

import numpy as np
import pandas as pd
import pytest

from rayrep.check import diff_lakes
from rayrep.config import EngineConfig
from rayrep.gen import GenSpec, write_changelog
from rayrep.pipeline import final_table_pandas, replay
from rayrep.retention import erase_keys


def _mklake(tmp_path, name, seed, num_partitions=4):
    cl = str(tmp_path / f"cl_{name}")
    write_changelog(cl, GenSpec(seed=seed, n_events=700, n_conversations=30,
                                n_epochs=2, zipf_a=1.1))
    lk = str(tmp_path / f"lake_{name}")
    replay(EngineConfig(changelog_dir=cl, lake_dir=lk,
                        num_partitions=num_partitions, delta_output=False))
    return lk


def test_identical_lakes_diff_empty(tmp_path):
    a = _mklake(tmp_path, "a", seed=7)
    b = _mklake(tmp_path, "b", seed=7)
    assert diff_lakes(a, b).num_rows == 0


def test_erasure_shows_as_only_a(tmp_path):
    a = _mklake(tmp_path, "a", seed=7)
    b = _mklake(tmp_path, "b", seed=7)
    live = final_table_pandas(a)
    victims = sorted(live["conv_id"].unique())[:3]
    erase_keys(b, victims)
    d = diff_lakes(a, b).to_pandas()
    assert set(d["status"]) == {"only_a"}
    assert set(d["conv_id"]) == set(victims)
    # erased keys are hidden on EVERY read path: each victim's live turns
    # all surface, and nothing else does
    n_victim_rows = int((live["conv_id"].isin(victims)).sum())
    assert len(d) == n_victim_rows


def test_divergent_lakes_all_statuses_match_recompute(tmp_path):
    a = _mklake(tmp_path, "a", seed=7)
    b = _mklake(tmp_path, "b", seed=8)
    d = (diff_lakes(a, b, distributed=True).to_pandas()
         .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))

    fa, fb = final_table_pandas(a), final_table_pandas(b)
    keys = ["conv_id", "turn_idx"]
    j = fa.merge(fb, on=keys, how="outer", suffixes=("_a", "_b"),
                 indicator=True)
    payload = [c[:-2] for c in j.columns if c.endswith("_a")]
    same = np.ones(len(j), dtype=bool)
    for c in payload:
        va, vb = j[f"{c}_a"], j[f"{c}_b"]
        same &= (va == vb) | (va.isna() & vb.isna())
    expect = np.where(j["_merge"] == "left_only", "only_a",
                      np.where(j["_merge"] == "right_only", "only_b",
                               np.where(same, "same", "differs")))
    exp = (j.loc[expect != "same", keys]
           .assign(status=expect[expect != "same"])
           .sort_values(keys).reset_index(drop=True))
    assert {"only_a", "only_b", "differs"} <= set(exp["status"])
    pd.testing.assert_frame_equal(
        d[["conv_id", "turn_idx", "status"]].astype({"turn_idx": "int64"}),
        exp[["conv_id", "turn_idx", "status"]].astype({"turn_idx": "int64"}))


def test_diff_refuses_routing_pin_mismatch(tmp_path):
    a = _mklake(tmp_path, "a", seed=7, num_partitions=4)
    b = _mklake(tmp_path, "b", seed=7, num_partitions=5)
    with pytest.raises(ValueError, match="routing pin mismatch"):
        diff_lakes(a, b)
