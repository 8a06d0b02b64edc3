"""Boundary semantics of the temporal join operators (asof_join,
range_count_join) on a handcrafted frame — the DuckDB parity tests in
test_queries_vs_duckdb cover the bulk statistics; these pin the edges:

- asof: exact-instant match included (allow_exact), latest-not-first
  wins, unmatched left rows dropped (inner), keys never cross;
- range: lower bound strict, upper bound inclusive, zero counts kept.
"""

import numpy as np
import pandas as pd
import ray.data as rd

from no_fasel_scrapers_ray.ops.relational import asof_join, range_count_join


def _ds(rows: list[dict]) -> rd.Dataset:
    return rd.from_pandas(pd.DataFrame(rows))


def test_asof_join_edges():
    left = _ds([
        {"user_id": 1, "ts_us": 100, "event_id": 10},   # exact match
        {"user_id": 1, "ts_us": 250, "event_id": 11},   # picks latest
        {"user_id": 1, "ts_us": 50, "event_id": 12},    # before all → drop
        {"user_id": 2, "ts_us": 300, "event_id": 13},   # other key
        {"user_id": 3, "ts_us": 300, "event_id": 14},   # keyless → drop
    ])
    right = _ds([
        {"user_id": 1, "ts_us": 100, "click_id": 900},
        {"user_id": 1, "ts_us": 200, "click_id": 901},
        {"user_id": 2, "ts_us": 100, "click_id": 902},
    ])
    got = (asof_join(left, right, by="user_id", on="ts_us", n_buckets=4)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    assert got["event_id"].tolist() == [10, 11, 13]
    assert got["click_id"].tolist() == [900, 901, 902]
    assert got["click_id"].dtype == np.int64


def test_range_count_join_edges():
    left = _ds([
        {"user_id": 1, "ts_us": 100, "event_id": 10},
        {"user_id": 2, "ts_us": 100, "event_id": 11},   # zero matches
    ])
    right = _ds([
        {"user_id": 1, "ts_us": 100},   # at lower bound: EXCLUDED
        {"user_id": 1, "ts_us": 101},
        {"user_id": 1, "ts_us": 150},   # at upper bound: INCLUDED
        {"user_id": 1, "ts_us": 151},   # past window
        {"user_id": 2, "ts_us": 99},    # before window
    ])
    got = (range_count_join(left, right, by="user_id", on="ts_us",
                            window=50, out_col="n", n_buckets=4)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    assert got["event_id"].tolist() == [10, 11]
    assert got["n"].tolist() == [2, 0]
    assert got["n"].dtype == np.int64
