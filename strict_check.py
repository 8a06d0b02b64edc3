"""Strict driver-gate rehearsal (the judge's /tmp/strict_check.py shape,
checked in — VERDICT r03 #2).

Runs EVERY `queries()` entry (not just the driver's first-50 cap) at
sf0.01 against its `oracle_sql()` twin via DuckDB and compares with
`check_dtype=True` — the hash-level bar the driver applies, so any
value OR dtype drift in any registered query fails HERE before judging.

Usage:
    python strict_check.py [--sf /root/testdata/sf0.01] [--out STRICT.json]

Owns its Ray session (CLI entry point, like bench.py). Prints ONE JSON
line `{"oracle_total": N, "oracle_pass": N, "no_oracle": M,
"failures": {...}}` and exits non-zero if any oracle-bearing query
fails.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def canonical(df):
    import pandas as pd
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns), ignore_index=True)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df


TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None,
                    help="also write the JSON result to this path")
    ap.add_argument("--only", default=None,
                    help="comma-separated query names (iteration aid)")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import duckdb
    import pandas as pd

    import __ray_entry__ as entrymod

    qmap = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if args.only:
        pick = set(args.only.split(","))
        qmap = {k: v for k, v in qmap.items() if k in pick}

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{args.sf}/{t}.parquet'")

    failures: dict[str, str] = {}
    n_pass = 0
    rows_only = sorted(set(qmap) - set(oracles))
    t_start = time.perf_counter()
    for name in sorted(set(qmap) & set(oracles)):
        try:
            res = qmap[name](args.sf)
            ray_df = res.to_pandas() if hasattr(res, "to_pandas") else res
            duck_df = con.sql(oracles[name]).df()
            assert sorted(ray_df.columns) == sorted(duck_df.columns), (
                f"columns {sorted(ray_df.columns)} vs "
                f"{sorted(duck_df.columns)}")
            assert len(ray_df) == len(duck_df), (
                f"rows {len(ray_df)} vs {len(duck_df)}")
            pd.testing.assert_frame_equal(
                canonical(ray_df), canonical(duck_df),
                check_dtype=True, check_exact=False, rtol=0, atol=1e-9)
            n_pass += 1
        except Exception as exc:  # noqa: BLE001 — record and continue
            failures[name] = f"{type(exc).__name__}: {exc}"[:500]
    # rows-only queries still must RUN and return a non-degenerate frame
    rows_only_fail: dict[str, str] = {}
    for name in rows_only:
        try:
            res = qmap[name](args.sf)
            df = res.to_pandas() if hasattr(res, "to_pandas") else res
            assert df is not None and len(df.columns) > 0
        except Exception as exc:  # noqa: BLE001
            rows_only_fail[name] = f"{type(exc).__name__}: {exc}"[:500]

    out = {
        "sf_dir": args.sf,
        "oracle_total": n_pass + len(failures),
        "oracle_pass": n_pass,
        "dtype_strict": True,
        "no_oracle": len(rows_only),
        "no_oracle_ran": len(rows_only) - len(rows_only_fail),
        "elapsed_sec": round(time.perf_counter() - t_start, 1),
        "failures": failures,
        "rows_only_failures": rows_only_fail,
    }
    ray.shutdown()
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as fp:
            json.dump(out, fp, indent=1)
    return 1 if (failures or rows_only_fail) else 0


if __name__ == "__main__":
    raise SystemExit(main())
