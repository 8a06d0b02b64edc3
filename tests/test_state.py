"""Unit + property tests for the frontier state layer: cuckoo filter
(no false negatives, bounded FP rate, delete), politeness token bucket,
robots gating, priority ordering, checkpoint round-trip."""

import numpy as np
import pytest
import ray

from no_fasel_scrapers_ray.state.cuckoo import CuckooFilter
from no_fasel_scrapers_ray.state.frontier import (
    FrontierShard, PolitenessConfig, push_table)
from no_fasel_scrapers_ray.pipelines.crawl import link_hashes


def _push(shard, rows):
    return ray.get(shard.push.remote(push_table(rows, link_hashes(rows))))


def _pop(shard, **kw):
    return ray.get(shard.pop_ready.remote(**kw)).to_pylist()


def _row(url, host="h.test", site="s", depth=0, ok="00", cat="c"):
    return {"url": url, "host": host, "site": site, "category": cat,
            "page_type": "listing", "depth": depth, "seq": 0,
            "order_key": ok, "meta": "{}"}


# ---------------------------------------------------------------------------
# cuckoo filter
# ---------------------------------------------------------------------------

def test_cuckoo_no_false_negatives():
    rng = np.random.RandomState(7)
    keys = rng.randint(0, 2**63, size=20000, dtype=np.int64).astype(np.uint64)
    f = CuckooFilter(capacity=64000)
    f.add_many(keys)
    assert f.contains_many(keys).all()


def test_cuckoo_fp_rate_bounded():
    rng = np.random.RandomState(11)
    keys = rng.randint(0, 2**63, size=20000, dtype=np.int64).astype(np.uint64)
    other = rng.randint(0, 2**63, size=20000, dtype=np.int64).astype(np.uint64)
    other = other[~np.isin(other, keys)]
    f = CuckooFilter(capacity=64000)
    f.add_many(keys)
    fp = f.contains_many(other).mean()
    # 2 * bucket_size / 2^16 ≈ 0.00012; allow 10x slack
    assert fp < 0.002, fp


def test_cuckoo_delete():
    keys = np.arange(1000, dtype=np.uint64) * np.uint64(2654435761)
    f = CuckooFilter(capacity=4096)
    f.add_many(keys)
    removed = f.delete_many(keys[:500])
    assert removed == 500
    assert f.contains_many(keys[500:]).all()  # survivors intact


def test_cuckoo_dump_load():
    keys = np.arange(5000, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    f = CuckooFilter(capacity=16384)
    f.add_many(keys)
    g = CuckooFilter.load(f.dump())
    assert g.contains_many(keys).all()
    assert g.size == f.size


# ---------------------------------------------------------------------------
# frontier shard: politeness, robots, priority, checkpoint
# ---------------------------------------------------------------------------

def test_politeness_budget_enforced():
    pol = PolitenessConfig(default_rate=None, host_rates={"slow.test": 2})
    s = FrontierShard.remote(0, 1, pol)
    rows = [_row(f"https://slow.test/p{i}", "slow.test", ok=f"{i:03d}")
            for i in range(7)]
    rows += [_row(f"https://fast.test/p{i}", "fast.test", ok=f"{i:03d}")
             for i in range(3)]
    assert _push(s, rows) == 10
    r1 = _pop(s)
    # 2 slow + all 3 fast in the first round-tick
    assert sum(r["host"] == "slow.test" for r in r1) == 2
    assert sum(r["host"] == "fast.test" for r in r1) == 3
    r2 = _pop(s)
    assert sum(r["host"] == "slow.test" for r in r2) == 2
    r3 = _pop(s)
    r4 = _pop(s)
    assert len(r3) == 2 and len(r4) == 1
    assert ray.get(s.pending_count.remote()) == 0


def test_robots_disallow():
    pol = PolitenessConfig(disallow={"h.test": ["/private"]})
    s = FrontierShard.remote(0, 1, pol)
    rows = [_row("https://h.test/private/x"), _row("https://h.test/public/y")]
    assert _push(s, rows) == 1
    stats = ray.get(s.stats.remote())
    assert stats["robots_blocked"] == 1


def test_priority_order_site_depth_orderkey():
    s = FrontierShard.remote(0, 1)
    rows = [
        _row("https://b.test/1", site="bsite", depth=0, ok="00"),
        _row("https://a.test/2", site="asite", depth=1, ok="00"),
        _row("https://a.test/1", site="asite", depth=0, ok="01"),
        _row("https://a.test/0", site="asite", depth=0, ok="00"),
    ]
    _push(s, rows)
    popped = _pop(s)
    assert [r["url"] for r in popped] == [
        "https://a.test/0", "https://a.test/1", "https://a.test/2",
        "https://b.test/1"]


def test_checkpoint_restore_roundtrip(tmp_path):
    s = FrontierShard.remote(0, 1)
    rows = [_row(f"https://h.test/{i}", ok=f"{i:03d}") for i in range(10)]
    _push(s, rows)
    _pop(s, max_rows=4)
    ray.get(s.checkpoint.remote(str(tmp_path)))

    s2 = FrontierShard.remote(0, 1)
    restored = ray.get(s2.restore.remote(str(tmp_path)))
    assert restored == 6
    # seen set survives: re-pushing the same URLs is a no-op
    assert _push(s2, rows) == 0
    popped = _pop(s2)
    assert [r["url"] for r in popped] == \
        [f"https://h.test/{i}" for i in range(4, 10)]


def test_duplicate_within_one_push_batch():
    s = FrontierShard.remote(0, 1)
    rows = [_row("https://h.test/same"), _row("https://h.test/same")]
    assert _push(s, rows) == 1


def test_cuckoo_stash_no_false_negatives_at_overload():
    """Past MAX_KICKS the victim fingerprint moves to the stash, never
    silently dropped — every inserted key still probes positive right
    up to the loud filter-full error."""
    from no_fasel_scrapers_ray.state.cuckoo import CuckooFilter
    f = CuckooFilter(capacity=64, bucket_size=2)
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 2**63, 600, dtype=np.int64).astype(np.uint64)
    inserted = []
    try:
        for k in keys:
            f.add_many(np.array([k], dtype=np.uint64))
            inserted.append(k)
    except RuntimeError:
        pass   # loud full — fine; everything inserted BEFORE must probe
    arr = np.array(inserted[:-1] if len(inserted) else [],
                   dtype=np.uint64)
    assert f.contains_many(arr).all()
    assert len(f.stash) > 0   # the overload actually exercised the stash


def test_frontier_restore_keeps_configured_capacity(tmp_path):
    """An early-crawl resume must NOT shrink the cuckoo filter below
    the configured capacity (the old 2x-restored-size rebuild made
    later filter-full unrecoverable)."""
    import ray as _ray
    from no_fasel_scrapers_ray.state.frontier import FrontierShard
    import pyarrow as pa
    from no_fasel_scrapers_ray.pipelines.crawl import PUSH_SCHEMA
    shard = FrontierShard.options(num_cpus=0).remote(
        0, 1, capacity=1 << 18, spill_dir=str(tmp_path / "spill"))
    t = pa.table({
        "url": ["https://a.test/1"], "host": ["a.test"],
        "site": ["a"], "category": ["x"], "page_type": ["listing"],
        "depth": pa.array([0], pa.int32()), "seq": [0],
        "order_key": ["0"], "meta": [""],
        "h": pa.array(np.array([123], dtype=np.uint64))},
        schema=PUSH_SCHEMA)
    _ray.get(shard.push.remote(t))
    ck = str(tmp_path / "ck")
    _ray.get(shard.checkpoint.remote(ck))
    _ray.get(shard.restore.remote(ck))
    stats = _ray.get(shard.stats.remote())
    assert stats["cuckoo_capacity_slots"] >= (1 << 18)
