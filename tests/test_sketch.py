"""Quality gate for the HyperLogLog sketch: the estimate must sit
within the published error envelope (sigma = 1.04/sqrt(2^p) ~ 0.81% at
p=14; we allow 3 sigma) against EXACT cardinalities, across the
linear-counting small range and the raw-estimator large range, and be
bit-reproducible across block layouts."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from no_fasel_scrapers_ray.ops.sketch import (
    approx_count_distinct,
    hll_estimate,
    hll_registers,
)


@pytest.mark.parametrize("n_distinct", [500, 20_000, 300_000])
def test_hll_error_envelope(n_distinct):
    rng = np.random.RandomState(11)
    vals = rng.randint(0, 2 ** 62, size=n_distinct).astype(np.int64)
    exact = len(np.unique(vals))
    # duplicate-heavy stream: every value appears ~3x
    stream = np.concatenate([vals, vals[: n_distinct // 2], vals])
    est = hll_estimate(hll_registers(stream))
    assert abs(est - exact) / exact < 0.025


def test_hll_merge_is_layout_invariant():
    vals = np.arange(50_000, dtype=np.int64) * 7919
    whole = hll_registers(vals)
    merged = np.zeros_like(whole)
    for chunk in np.array_split(vals, 13):
        np.maximum(merged, hll_registers(chunk), out=merged)
    assert np.array_equal(whole, merged)          # max-merge == one pass
    assert hll_estimate(merged) == hll_estimate(whole)


def test_grouped_approx_count_distinct():
    from no_fasel_scrapers_ray.ops.sketch import (
        grouped_approx_count_distinct)
    rng = np.random.RandomState(5)
    # 4 keys with very different true cardinalities, values duplicated
    frames = []
    for k, card in [(1, 50), (2, 1_000), (3, 7_000), (4, 1)]:
        v = rng.randint(0, 2 ** 60, size=card)
        frames.append(pd.DataFrame(
            {"k": k, "v": np.concatenate([v, v[: card // 2 + 1]])}))
    df = pd.concat(frames, ignore_index=True).sample(
        frac=1.0, random_state=0).reset_index(drop=True)
    ds = rd.from_pandas(df).repartition(6)
    out = (grouped_approx_count_distinct(ds, ["k"], "v", alias="nd", p=10)
           .to_pandas().sort_values("k", ignore_index=True))
    exact = df.groupby("k")["v"].nunique()
    for _, row in out.iterrows():
        e = exact[row["k"]]
        assert abs(row["nd"] - e) / e < 0.10, (row["k"], row["nd"], e)


def test_approx_count_distinct_dataset():
    df = pd.DataFrame({"u": np.arange(10_000, dtype=np.int64) % 3_000})
    ds = rd.from_pandas(df).repartition(5)
    est = approx_count_distinct(ds, "u")
    assert abs(est - 3_000) / 3_000 < 0.025


# ---------------------------------------------------------------------
# Misra-Gries heavy hitters: adversarially large vocabulary (forces
# eviction in every per-batch summary), verified against the exact
# pandas count — the MG superset guarantee in action.
# ---------------------------------------------------------------------

def _mk_docs(texts):
    return rd.from_pandas(pd.DataFrame(
        {"text": texts})).repartition(8)


def test_heavy_hitters_exact_under_eviction():
    from no_fasel_scrapers_ray.ops.sketch import heavy_hitter_terms
    rng = np.random.RandomState(3)
    # zipf-ish: 30 hot terms (freq 200..50) drowned in 20k unique terms
    hot = [f"hot{i:02d}" for i in range(30)]
    words = []
    for i, w in enumerate(hot):
        words += [w] * (200 - 5 * i)
    words += [f"u{j}" for j in range(20_000)]   # singletons
    rng.shuffle(words)
    texts = [" ".join(words[i:i + 40]) for i in range(0, len(words), 40)]
    # k_counters=512 << 20k distinct forces trimming in every batch
    got = heavy_hitter_terms(_mk_docs(texts), topn=10,
                             k_counters=512).to_pandas()
    exact = (pd.Series(words).value_counts().rename_axis("term")
             .reset_index(name="n"))
    exact = exact.sort_values(["n", "term"],
                              ascending=[False, True]).head(10)
    assert got["term"].tolist() == exact["term"].tolist()
    assert got["n"].tolist() == exact["n"].tolist()


def test_heavy_hitters_tie_break_on_boundary():
    from no_fasel_scrapers_ray.ops.sketch import heavy_hitter_terms
    # all counts equal -> top-n decided purely by term order
    texts = [" ".join(f"w{j:03d}" for j in range(50))] * 3
    got = heavy_hitter_terms(_mk_docs(texts), topn=5,
                             k_counters=1024).to_pandas()
    assert got["term"].tolist() == [f"w{j:03d}" for j in range(5)]
    assert got["n"].tolist() == [3] * 5


def test_approx_quantiles_rank_error_envelope():
    """Digest quantiles must land within 1% rank error of the exact
    order statistics, on both uniform and heavy-tailed data, across a
    multi-block layout that forces real merges."""
    import ray.data as rd
    from no_fasel_scrapers_ray.ops.sketch import approx_quantiles
    rng = np.random.RandomState(11)
    n = 200_000
    for vals in (rng.uniform(0, 1e6, n),
                 rng.lognormal(0, 2.5, n)):
        s = np.sort(vals)
        ds = rd.from_pandas(pd.DataFrame({"x": vals})).repartition(16)
        qs = [0.01, 0.25, 0.5, 0.75, 0.99]
        got = approx_quantiles(ds, "x", qs, k=256)
        for q, g in zip(qs, got):
            # rank of the estimate vs target rank
            r = np.searchsorted(s, g) / n
            assert abs(r - q) < 0.01, (q, g, r)


def test_approx_quantiles_exact_on_tiny_input():
    import ray.data as rd
    from no_fasel_scrapers_ray.ops.sketch import approx_quantiles
    ds = rd.from_pandas(pd.DataFrame({"x": [10.0, 20.0, 30.0, 40.0]}))
    got = approx_quantiles(ds, "x", [0.0, 1.0], k=64)
    # with n << k nothing is compressed: min/max are exact
    assert got[0] == 10.0 and got[1] == 40.0


def test_cms_one_sided_and_bounded():
    """Count-min estimates are one-sided (est >= true for EVERY key)
    and within the e/width·N additive envelope on zipf-skewed data
    across a multi-block layout that forces real partial merges."""
    from no_fasel_scrapers_ray.ops.sketch import cms_query, cms_sketch
    rng = np.random.RandomState(3)
    vals = rng.zipf(1.3, 100_000).astype(np.int64)
    vals = vals[vals < 50_000]
    n = len(vals)
    ds = rd.from_pandas(pd.DataFrame({"k": vals})).repartition(8)
    width, depth = 2048, 4
    m = cms_sketch(ds, "k", depth=depth, width=width)
    assert m.shape == (depth, width) and m.sum() == n * depth
    keys, true = np.unique(vals, return_counts=True)
    est = cms_query(m, keys)
    assert (est >= true).all()
    bound = np.e / width * n
    assert (est - true <= bound).all(), int((est - true).max())


def test_cms_string_keys_roundtrip():
    from no_fasel_scrapers_ray.ops.sketch import cms_query, cms_sketch
    words = np.array(["alpha"] * 50 + ["beta"] * 7 + ["gamma"] * 1)
    ds = rd.from_pandas(pd.DataFrame({"w": words}))
    m = cms_sketch(ds, "w", depth=4, width=512)
    est = cms_query(m, np.array(["alpha", "beta", "gamma", "absent"],
                                dtype=object))
    assert est[0] >= 50 and est[1] >= 7 and est[2] >= 1
    # 58 items in 512·4 counters: collisions are ~impossible here
    assert est.tolist() == [50, 7, 1, 0]


def test_grouped_approx_quantiles_rank_envelope():
    """Per-group digest quantiles stay within 2% rank error of each
    group's exact order statistics, including a HOT group 100× the
    others (the per-host skew case), across a multi-block layout."""
    from no_fasel_scrapers_ray.ops.sketch import grouped_approx_quantiles
    rng = np.random.RandomState(5)
    frames = []
    sizes = {"a": 100_000, "b": 1_000, "c": 1_000}
    for g, n in sizes.items():
        frames.append(pd.DataFrame({
            "g": g, "x": rng.lognormal(0, 2.0, n)}))
    df = pd.concat(frames, ignore_index=True).sample(
        frac=1.0, random_state=7).reset_index(drop=True)
    ds = rd.from_pandas(df).repartition(16)
    got = grouped_approx_quantiles(ds, ["g"], "x", [0.5, 0.95],
                                   k=128).to_pandas()
    assert sorted(got["g"]) == ["a", "b", "c"]
    for _, row in got.iterrows():
        vals = np.sort(df.loc[df["g"] == row["g"], "x"].to_numpy())
        for q, col in ((0.5, "q_50"), (0.95, "q_95")):
            r = np.searchsorted(vals, row[col]) / len(vals)
            assert abs(r - q) < 0.02, (row["g"], q, r)


def test_grouped_approx_quantiles_exact_on_small_groups():
    from no_fasel_scrapers_ray.ops.sketch import grouped_approx_quantiles
    df = pd.DataFrame({"g": ["x"] * 3 + ["y"] * 2,
                       "x": [1.0, 2.0, 3.0, 10.0, 20.0]})
    got = grouped_approx_quantiles(rd.from_pandas(df), ["g"], "x",
                                   [0.5]).to_pandas().set_index("g")
    # n << k: nothing compressed, midpoint interpolation hits the
    # true median for odd n and the midpoint for even n
    assert got.loc["x", "q_50"] == 2.0
    assert got.loc["y", "q_50"] == 15.0


def test_hll_set_ops_envelope_vs_exact():
    from no_fasel_scrapers_ray.ops.sketch import hll_set_ops
    rng = np.random.default_rng(3)
    # A = 0..5999, B = 4000..9999 → |A|=6000 |B|=6000 |A∩B|=2000
    a = np.arange(0, 6000, dtype=np.int64)
    b = np.arange(4000, 10000, dtype=np.int64)
    df = pd.DataFrame({
        "user_id": np.concatenate([a, b]),
        "event_type": ["click"] * len(a) + ["purchase"] * len(b)})
    df = df.sample(frac=1.0, random_state=1).reset_index(drop=True)
    out = hll_set_ops(rd.from_pandas(df).repartition(4),
                      "user_id", "event_type", "click", "purchase")
    # p=14 → rse ≈ 1.04/sqrt(2^14) ≈ 0.81%; 3σ envelope on each term;
    # intersection inherits ~3× the union-scale error budget
    assert abs(out["est_a"][0] - 6000) < 6000 * 0.025
    assert abs(out["est_b"][0] - 6000) < 6000 * 0.025
    assert abs(out["est_union"][0] - 10000) < 10000 * 0.025
    assert abs(out["est_intersection"][0] - 2000) < 10000 * 0.05


def test_grouped_heavy_hitters_adversarial_vocab():
    from no_fasel_scrapers_ray.ops.sketch import grouped_heavy_hitters
    rng = np.random.default_rng(21)
    rows = []
    # two groups; heavy items h0>h1>h2 planted over a long-tail
    # vocabulary much larger than k_counters
    for g, base in (("x", 0), ("y", 10_000)):
        rows += [(g, base + 1)] * 400 + [(g, base + 2)] * 300 \
              + [(g, base + 3)] * 200
        rows += [(g, base + 100 + int(rng.integers(0, 5000)))
                 for _ in range(3000)]
    df = pd.DataFrame(rows, columns=["g", "item"])
    df = df.sample(frac=1.0, random_state=2).reset_index(drop=True)
    out = grouped_heavy_hitters(rd.from_pandas(df).repartition(6),
                                "g", "item", topn=3, k_counters=64)
    got = {g: list(zip(sub["item"], sub["n"]))
           for g, sub in out.groupby("g")}
    assert got["x"] == [(1, 400), (2, 300), (3, 200)]
    assert got["y"] == [(10_001, 400), (10_002, 300), (10_003, 200)]


def test_grouped_heavy_hitters_raises_on_uniform_data():
    """Near-uniform data has no recoverable heavy hitters — the op
    must fail loudly (the silent-exactness-hole fix), never return an
    uncertifiable top-n."""
    from no_fasel_scrapers_ray.ops.sketch import grouped_heavy_hitters
    rng = np.random.default_rng(4)
    df = pd.DataFrame({
        "g": ["x"] * 20_000,
        "item": rng.integers(0, 15_000, 20_000)})   # ~1.3 avg count
    with pytest.raises(ValueError, match="no verifiable top"):
        grouped_heavy_hitters(rd.from_pandas(df).repartition(8),
                              "g", "item", topn=3, k_counters=64)


def test_rolling_approx_distinct_envelope():
    """The sketch twin of trailing_distinct_count stays inside the
    p=12 HLL envelope (sigma ~1.6%; 5% bar) for every window."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod
    from tests.conftest import SF_SMOKE
    exact = entrymod.queries()["rolling_distinct_users"](
        SF_SMOKE).to_pandas().sort_values("hr", ignore_index=True)
    approx = entrymod.queries()["rolling_approx_users"](
        SF_SMOKE).sort_values("hr", ignore_index=True)
    assert list(exact["hr"]) == list(approx["hr"])
    e = exact["n_users"].to_numpy(np.float64)
    a = approx["n_users_approx"].to_numpy(np.float64)
    rel = np.abs(a - e) / np.maximum(e, 1)
    assert rel.max() <= 0.05, f"max rel err {rel.max():.4f}"
