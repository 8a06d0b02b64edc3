"""Sharded URL frontier: priority heap + cuckoo/exact seen-set +
per-host politeness token buckets + robots gating (north_rule).

One ``FrontierShard`` actor owns the slice of URL-hash space
``url_hash64(url) % n_shards == shard_id``. State per shard:

- **seen**: a CuckooFilter (fast path) + the exact uint64 key set (the
  truth — a cuckoo positive is verified against it, so membership
  answers are exact; the filter only short-circuits the common miss);
- **heap**: pending frontier rows ordered by the priority
  ``(site, depth, order_key)`` where ``order_key`` is the
  deterministic structural discovery clock (shard-rank.page.card...,
  lexicographic) — this reproduces the reference scrapers' crawl order
  (SURVEY.md §1.3/§7.3) regardless of the nondeterministic arrival
  order of pushes from parallel extract tasks;
- **politeness**: per-host token bucket refilled per pop round
  (logical time), plus robots.txt-style disallow prefixes per host.

The driver merges ``pop_ready`` results from all shards per round, so a
round = one politeness tick. Checkpoint/restore dump the heap + exact
seen set to parquet for exact resume.
"""

from __future__ import annotations

import heapq
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..corpus.schema import FRONTIER_SCHEMA
from ..functions.urls import canonicalize_url, url_host
from ..functions.hashing import stable_hash64
from .cuckoo import CuckooFilter

FRONTIER_COLS = [f.name for f in FRONTIER_SCHEMA]


def frontier_table(rows: list[dict]) -> pa.Table:
    arrays = {c: [r.get(c) for r in rows] for c in FRONTIER_COLS}
    return pa.table(arrays, schema=FRONTIER_SCHEMA)


class PolitenessConfig:
    """Per-host fetches allowed per round + robots disallow prefixes.

    The reference has NO rate limiting (SURVEY.md §4.1) — politeness is
    a north_rule engine addition; tests of crawl-order equivalence use
    the permissive default (rate=None → unlimited)."""

    def __init__(self, default_rate: int | None = None,
                 host_rates: dict[str, int] | None = None,
                 disallow: dict[str, list[str]] | None = None):
        self.default_rate = default_rate
        self.host_rates = host_rates or {}
        self.disallow = disallow or {}

    def rate(self, host: str) -> int | None:
        return self.host_rates.get(host, self.default_rate)

    def allowed(self, url: str, host: str) -> bool:
        for prefix in self.disallow.get(host, ()):
            if url.startswith(prefix) or url.replace(
                    f"https://{host}", "", 1).startswith(prefix):
                return False
        return True


@ray.remote(num_cpus=0.25)
class FrontierShard:
    """One shard of the frontier (see module docstring)."""

    def __init__(self, shard_id: int, n_shards: int,
                 politeness: PolitenessConfig | None = None,
                 capacity: int = 1 << 20):
        self.shard_id = shard_id
        self.n_shards = n_shards
        self.politeness = politeness or PolitenessConfig()
        self.filter = CuckooFilter(capacity=capacity)
        self.exact: set[int] = set()
        self.heap: list[tuple] = []   # (site, depth, order_key, counter, row)
        self._counter = 0
        self.robots_blocked = 0
        self.stats_pushed = 0
        self.stats_popped = 0

    # -- ingest ------------------------------------------------------------

    def push(self, rows: list[dict]) -> int:
        """Dedup + enqueue frontier rows (dicts with FRONTIER_SCHEMA
        fields). Returns number accepted. Arrival order does not matter:
        the heap orders by the deterministic (site, depth, order_key)."""
        accepted = 0
        new_hashes: list[int] = []
        new_in_batch: set[int] = set()
        for row in rows:
            url = canonicalize_url(row["url"])
            h = stable_hash64(url)
            if h % self.n_shards != self.shard_id:
                continue  # misrouted — defensive, caller routes by hash
            if not self.politeness.allowed(row["url"], row["host"]):
                self.robots_blocked += 1
                continue
            # cuckoo fast path: a miss is definitely new; a hit is
            # verified against the exact set (FP → actually new). The
            # filter is bulk-updated at batch end, so batch-local
            # inserts are tracked separately (same URL twice in one
            # push must dedup too).
            if h in new_in_batch or (
                    self.filter.contains_many(
                        np.array([h], dtype=np.uint64))[0]
                    and h in self.exact):
                continue
            new_in_batch.add(h)
            self.exact.add(h)
            new_hashes.append(h)
            heapq.heappush(self.heap, (
                row["site"], row["depth"], row["order_key"],
                self._counter, row))
            self._counter += 1
            accepted += 1
        if new_hashes:
            self.filter.add_many(np.array(new_hashes, dtype=np.uint64))
        self.stats_pushed += accepted
        return accepted

    # -- scheduling --------------------------------------------------------

    def pop_ready(self, max_rows: int = 1 << 30) -> list[dict]:
        """Pop up to max_rows respecting per-host budgets for this round
        (one call = one politeness tick). Rows over budget stay queued."""
        budget: dict[str, int] = {}
        ready: list[dict] = []
        deferred: list[tuple] = []
        while self.heap and len(ready) < max_rows:
            item = heapq.heappop(self.heap)
            row = item[4]
            host = row["host"]
            rate = self.politeness.rate(host)
            if rate is not None:
                used = budget.get(host, 0)
                if used >= rate:
                    deferred.append(item)
                    continue
                budget[host] = used + 1
            ready.append(row)
        for item in deferred:
            heapq.heappush(self.heap, item)
        self.stats_popped += len(ready)
        return ready

    def pending(self) -> int:
        return len(self.heap)

    def seen_hashes(self) -> np.ndarray:
        return np.fromiter(self.exact, dtype=np.uint64, count=len(self.exact))

    def stats(self) -> dict:
        return {
            "shard": self.shard_id,
            "pushed": self.stats_pushed,
            "popped": self.stats_popped,
            "pending": len(self.heap),
            "seen": len(self.exact),
            "robots_blocked": self.robots_blocked,
            "cuckoo_size": self.filter.size,
        }

    # -- checkpoint (per-partition lineage, north_rule) --------------------

    def checkpoint(self, ckpt_dir: str) -> str:
        os.makedirs(ckpt_dir, exist_ok=True)
        pending_rows = [item[4] for item in sorted(self.heap)]
        pq.write_table(frontier_table(pending_rows),
                       os.path.join(ckpt_dir, f"heap-{self.shard_id}.parquet"))
        pq.write_table(
            pa.table({"h": pa.array(self.seen_hashes(), type=pa.uint64())}),
            os.path.join(ckpt_dir, f"seen-{self.shard_id}.parquet"))
        return ckpt_dir

    def restore(self, ckpt_dir: str) -> int:
        heap_t = pq.read_table(os.path.join(
            ckpt_dir, f"heap-{self.shard_id}.parquet"))
        seen_t = pq.read_table(os.path.join(
            ckpt_dir, f"seen-{self.shard_id}.parquet"))
        self.exact = set(seen_t["h"].to_numpy().tolist())
        if self.exact:
            self.filter.add_many(np.fromiter(
                self.exact, dtype=np.uint64, count=len(self.exact)))
        self.heap = []
        self._counter = 0
        for row in heap_t.to_pylist():
            heapq.heappush(self.heap, (
                row["site"], row["depth"], row["order_key"],
                self._counter, row))
            self._counter += 1
        return len(self.heap)
