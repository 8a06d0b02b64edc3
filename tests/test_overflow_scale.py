"""Overflow-path pins: the review-closeout fixes (object-space moment
combines, chunked weighted-moment partials) verified against DuckDB's
HUGEINT arithmetic at magnitudes where a plain int64 reduction WRAPS —
the failure the sf0.01 oracle gate can never see because TPC-H cents
at small scale stay far below 2^63."""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd


def _big_values(n: int) -> np.ndarray:
    """Deterministic positive int64 values ~6·10⁷ (within the
    queries' per-element contract: batch 2048 × x² < 2⁶³) whose
    squares still sum far past 2^63 at n ≈ 2M
    (Σx² ≈ n·3.6e15 ≈ 7e21 ≫ int64)."""
    x = (np.arange(n, dtype=np.int64) * 2654435761) % 10_000_000
    return x + 50_000_000


def test_moment_sums_match_hugeint_oracle_past_int64():
    n = 2_000_000
    x = _big_values(n)
    side = (np.arange(n) % 2).astype(np.int64)
    ds = rd.from_pandas(pd.DataFrame({"side": side, "x": x})) \
        .repartition(4)

    # engine shape: bounded-batch int64 partials + object combine
    # (the q_welch/q_anova pattern at the same batch_size contract)
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame({"side": b["side"],
                          "n": np.ones(len(b), dtype=np.int64),
                          "sx": b["x"],
                          "sxx": b["x"].to_numpy() ** 2})
        return t.groupby("side", as_index=False).sum()

    got = (ds.map_batches(partial, batch_format="pandas",
                          batch_size=2048).to_pandas()
           .astype({"n": object, "sx": object, "sxx": object})
           .groupby("side", as_index=False)[["n", "sx", "sxx"]].sum())

    con = duckdb.connect()
    con.register("t", pd.DataFrame({"side": side, "x": x}))
    ref = con.sql(
        "SELECT side, COUNT(*) AS n, SUM(x) AS sx, "
        "SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx "
        "FROM t GROUP BY side ORDER BY side").fetchall()
    for (side_v, n_ref, sx_ref, sxx_ref), (_, row) in zip(
            ref, got.sort_values("side").iterrows()):
        assert int(row["n"]) == int(n_ref)
        assert int(row["sx"]) == int(sx_ref)
        assert int(row["sxx"]) == int(sxx_ref)
        assert int(sxx_ref) > 2 ** 63          # the wrap regime


def test_weighted_moment_rows_exact_past_int64():
    from no_fasel_scrapers_ray.ops.relational import \
        _weighted_moment_rows
    # mixture of a hot pair (solo split path) and bulk rows whose
    # cumulative moment sums cross several chunk boundaries
    rng_c = (np.arange(5000, dtype=np.int64) * 48271) % 997 + 1
    c = np.concatenate([[4_000_000_000], rng_c])
    rx = np.concatenate([[1_500_000], (rng_c * 7) % 100_000 + 1])
    ry = np.concatenate([[1_499_999], (rng_c * 13) % 100_000 + 1])
    rows = _weighted_moment_rows(c, rx, ry)
    got = [sum(int(r[i]) for r in rows) for i in range(6)]
    want = [sum(int(a) for a in c),
            sum(int(a) * int(b) for a, b in zip(c, rx)),
            sum(int(a) * int(b) for a, b in zip(c, ry)),
            sum(int(a) * int(b) * int(d)
                for a, b, d in zip(c, rx, ry)),
            sum(int(a) * int(b) * int(b) for a, b in zip(c, rx)),
            sum(int(a) * int(b) * int(b) for a, b in zip(c, ry))]
    assert got == want
    assert want[3] > 2 ** 63                   # the wrap regime
    # every emitted row must individually fit int64 (Arrow-safe)
    flat = [v for r in rows for v in r]
    assert max(flat) < 2 ** 63


def test_rank_sum_rows_exact_past_int64():
    from no_fasel_scrapers_ray.ops.relational import rank_sum_rows
    # hot value: cnt so large that cnt^3 and cnt_a*rank2 both exceed
    # int64 — the split-filler path must still sum exactly
    cnt = np.array([3_000_000, 7, 11], dtype=np.int64)
    ca = np.array([2_999_999, 3, 11], dtype=np.int64)
    r2 = np.array([4_000_001, 9, 31], dtype=np.int64)
    rows = rank_sum_rows(cnt, ca, r2)
    got = [sum(int(r[i]) for r in rows) for i in range(4)]
    want = [sum(int(a) * int(b) for a, b in zip(ca, r2)),
            sum(int(c) ** 3 - int(c) for c in cnt),
            int(ca.sum()), int(cnt.sum())]
    assert got == want
    assert want[1] > 2 ** 63                  # the wrap regime
    flat = [v for r in rows for v in r]
    assert max(flat) < 2 ** 63                # every cell Arrow-safe
