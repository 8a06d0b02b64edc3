"""The crawl round loop: frontier shards → groupby-host partitioning →
fetch actor pool → stateless extract → records sink + links back to the
frontier (SURVEY.md §7.0 stage layout).

Each round:
1. the driver pops every ready frontier row from all shards (one
   politeness tick) and merges them in (site, depth, order_key) order —
   this merged sequence is the frontier log used by the order-
   equivalence tests;
2. rows are partitioned by (host, salt) — the groupby-host shuffle with
   explicit hot-host salting: a host holding more than ``1/hot_frac``
   of the round is split into ⌈share×salts⌉ sub-buckets so one hot site
   (fasel, ~80% of pages) cannot serialize the fetch pool;
3. ``map_batches(Fetcher, concurrency=N)`` joins URLs against the
   broadcast corpus (the sandbox fetch);
4. a stateless ``map_batches`` extract runs the site adapters; links
   are pushed to the frontier shards from INSIDE the tasks (batched per
   shard — no driver round-trip for discoveries), records stream to a
   per-round parquet partition (resumable layout);
5. the shards checkpoint (heap + exact seen set) → exact resume.

The loop ends when every shard's heap is empty.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..corpus.schema import FRONTIER_SCHEMA
from ..corpus.spans import PageView
from ..functions.hashing import stable_hash64
from ..functions.urls import canonicalize_url
from ..state.frontier import FrontierShard, PolitenessConfig, frontier_table
from ..stages.adapters import extract_page, seed_rows
from ..stages.fetch import Fetcher

RECORD_COLS = ["catalog", "record_type", "key", "series_key", "season_key",
               "order_key", "payload"]
RECORD_SCHEMA_FLAT = pa.schema([(c, pa.string()) for c in RECORD_COLS])

_BCAST: dict = {}


def _bget(ref):
    key = ref.hex()
    if key not in _BCAST:
        _BCAST[key] = ray.get(ref)
    return _BCAST[key]


def route_shard(url: str, n_shards: int) -> int:
    return stable_hash64(canonicalize_url(url)) % n_shards


def partition_by_host(table: pa.Table, n_salts: int) -> list[pa.Table]:
    """The groupby-host shuffle with hot-host salting: one sub-table per
    (host, salt) bucket, hot hosts split across ``n_salts`` buckets."""
    import pyarrow.compute as pc
    hosts = table.column("host").to_pylist()
    n = len(hosts)
    counts: dict[str, int] = {}
    for h in hosts:
        counts[h] = counts.get(h, 0) + 1
    out = []
    for host, cnt in sorted(counts.items()):
        mask = pc.equal(table.column("host"), host)
        sub = table.filter(mask)
        salts = max(1, min(n_salts, round(n_salts * cnt / max(1, n)) + 1)) \
            if cnt > n // 4 else 1
        if salts == 1:
            out.append(sub)
        else:
            for s in range(salts):
                idx = np.arange(s, sub.num_rows, salts)
                out.append(sub.take(pa.array(idx)))
    return [t for t in out if t.num_rows]


class CrawlEngine:
    def __init__(self, corpus_table: pa.Table, seeds: list[dict],
                 run_dir: str, n_shards: int = 4,
                 politeness: PolitenessConfig | None = None,
                 old_catalogs: dict | None = None,
                 image_sources: dict | None = None,
                 fetch_concurrency: int = 4,
                 challenge_every: int = 0,
                 max_pop_per_round: int = 1 << 30):
        self.run_dir = run_dir
        os.makedirs(os.path.join(run_dir, "records"), exist_ok=True)
        os.makedirs(os.path.join(run_dir, "ckpt"), exist_ok=True)
        self.n_shards = n_shards
        self.shards = [
            FrontierShard.remote(i, n_shards, politeness)
            for i in range(n_shards)
        ]
        self.corpus_ref = ray.put(corpus_table)
        self.state_ref = ray.put({
            "old": _old_digests(old_catalogs or {}),
            "images": image_sources or {},
        })
        self.fetch_concurrency = fetch_concurrency
        self.challenge_every = challenge_every
        self.max_pop = max_pop_per_round
        self.frontier_log: list[pa.Table] = []
        self.metrics = {"rounds": 0, "popped": 0, "records": 0,
                        "round_secs": []}
        self._push_rows(seed_rows(seeds))
        self.round_idx = 0

    # -- frontier I/O ------------------------------------------------------

    def _push_rows(self, rows: list[dict]):
        by_shard: dict[int, list[dict]] = {}
        for r in rows:
            by_shard.setdefault(route_shard(r["url"], self.n_shards),
                                []).append(r)
        ray.get([self.shards[s].push.remote(rs)
                 for s, rs in by_shard.items()])

    def _pop_round(self) -> pa.Table | None:
        results = ray.get([s.pop_ready.remote(self.max_pop)
                           for s in self.shards])
        rows = [r for rs in results for r in rs]
        if not rows:
            return None
        rows.sort(key=lambda r: (r["site"], r["depth"], r["order_key"]))
        return frontier_table(rows)

    # -- the round ---------------------------------------------------------

    def run(self, start_round: int = 0, max_rounds: int | None = None) -> dict:
        """Drive rounds until the frontier drains (or ``max_rounds`` —
        used by the kill-and-resume test to simulate a crash)."""
        self.round_idx = start_round
        while True:
            if max_rounds is not None and \
                    self.round_idx - start_round >= max_rounds:
                return self.metrics  # simulated crash: no finalize
            t0 = time.perf_counter()
            ready = self._pop_round()
            if ready is None:
                break
            self.frontier_log.append(ready)
            n_records = self._execute_round(ready)
            self._checkpoint_round(ready)
            dt = time.perf_counter() - t0
            self.metrics["rounds"] += 1
            self.metrics["popped"] += ready.num_rows
            self.metrics["records"] += n_records
            self.metrics["round_secs"].append(round(dt, 3))
            self.round_idx += 1
        self._finalize()
        return self.metrics

    def _execute_round(self, ready: pa.Table) -> int:
        """One round = one Dataset execution of the fused
        fetch+extract task stage over the host-partitioned ready set.
        Fetch state (corpus index, per-host sessions) is cached per
        worker process (stages/fetch.py:get_fetcher) so warm workers
        carry it across rounds with no pool spin-up; link pushes go to
        the frontier shards from inside the tasks."""
        shards = self.shards
        n_shards = self.n_shards
        state_ref = self.state_ref
        corpus_ref = self.corpus_ref
        challenge_every = self.challenge_every

        def fetch_extract(batch: pa.Table) -> pa.Table:
            from ..stages.fetch import get_fetcher
            fetcher = get_fetcher(corpus_ref, challenge_every)
            fetched = fetcher(batch)
            state = _bget(state_ref)
            frontier_cols = {c: fetched.column(c).to_pylist()
                             for c in FRONTIER_SCHEMA.names
                             if c in fetched.column_names}
            spans = fetched.column("spans").to_pylist()
            records: list[dict] = []
            links: list[dict] = []
            for i in range(fetched.num_rows):
                row = {c: frontier_cols[c][i] for c in frontier_cols}
                recs, lks = extract_page(row, PageView(spans[i]), state)
                records.extend(recs)
                links.extend(lks)
            if links:
                by_shard: dict[int, list[dict]] = {}
                for lk in links:
                    by_shard.setdefault(
                        route_shard(lk["url"], n_shards), []).append(lk)
                ray.get([shards[s].push.remote(rs)
                         for s, rs in by_shard.items()])
            arrays = {c: pa.array([r[c] for r in records], type=pa.string())
                      for c in RECORD_COLS}
            return pa.table(arrays, schema=RECORD_SCHEMA_FLAT)

        out_dir = os.path.join(self.run_dir, "records",
                               f"round={self.round_idx:04d}")
        if ready.num_rows <= 64:
            # driver fast path: a Dataset execution costs seconds of
            # fixed overhead — pointless for seed-sized rounds
            os.makedirs(out_dir, exist_ok=True)
            table = fetch_extract(ready)
            pq.write_table(table, os.path.join(out_dir, "part-0.parquet"))
            return table.num_rows
        blocks = partition_by_host(ready, n_salts=self.fetch_concurrency)
        ds = rd.from_arrow(blocks)
        records_ds = ds.map_batches(fetch_extract, batch_format="pyarrow",
                                    batch_size=256)
        records_ds.write_parquet(out_dir)
        n = sum(pq.ParquetFile(os.path.join(out_dir, f)).metadata.num_rows
                for f in os.listdir(out_dir)) if os.path.isdir(out_dir) else 0
        return n

    # -- checkpoint / resume (per-partition lineage, north_rule) -----------

    def _checkpoint_round(self, ready: pa.Table):
        ckpt = os.path.join(self.run_dir, "ckpt", f"round-{self.round_idx:04d}")
        os.makedirs(ckpt, exist_ok=True)
        ray.get([s.checkpoint.remote(ckpt) for s in self.shards])
        pq.write_table(ready, os.path.join(ckpt, "popped.parquet"))
        with open(os.path.join(ckpt, "MANIFEST.json"), "w") as fp:
            json.dump({"round": self.round_idx,
                       "popped": ready.num_rows,
                       "n_shards": self.n_shards,
                       "metrics": self.metrics}, fp)

    def resume(self) -> int:
        """Restore frontier state from the latest complete checkpoint;
        returns the next round index. Records of completed rounds are
        already on disk (per-round partitions are skipped, not redone)."""
        ckpt_root = os.path.join(self.run_dir, "ckpt")
        rounds = sorted(d for d in os.listdir(ckpt_root)
                        if os.path.exists(os.path.join(ckpt_root, d,
                                                       "MANIFEST.json")))
        if not rounds:
            return 0
        last = os.path.join(ckpt_root, rounds[-1])
        ray.get([s.restore.remote(last) for s in self.shards])
        with open(os.path.join(last, "MANIFEST.json")) as fp:
            manifest = json.load(fp)
        # rebuild the frontier log from the popped tables
        self.frontier_log = [
            pq.read_table(os.path.join(ckpt_root, r, "popped.parquet"))
            for r in rounds]
        self.metrics = manifest["metrics"]
        return manifest["round"] + 1

    def _finalize(self):
        log = (pa.concat_tables(self.frontier_log)
               if self.frontier_log else frontier_table([]))
        pq.write_table(log, os.path.join(self.run_dir, "frontier_log.parquet"))
        stats = ray.get([s.stats.remote() for s in self.shards])
        self.metrics["shards"] = stats
        with open(os.path.join(self.run_dir, "metrics.json"), "w") as fp:
            json.dump(self.metrics, fp, indent=2)

    # -- outputs -----------------------------------------------------------

    def records_dataset(self) -> rd.Dataset:
        return rd.read_parquet(os.path.join(self.run_dir, "records"))

    def frontier_log_table(self) -> pa.Table:
        return pa.concat_tables(self.frontier_log) if self.frontier_log \
            else frontier_table([])

    def seen_urls(self) -> set[int]:
        hashes = ray.get([s.seen_hashes.remote() for s in self.shards])
        return set(np.concatenate(hashes).tolist()) if hashes else set()


def _old_digests(old_catalogs: dict) -> dict:
    """Previous-run catalogs → the per-site digests the adapters probe
    (D1 id sets, D2 count watermarks)."""
    out: dict = {}
    for cat, data in old_catalogs.items():
        if cat in ("movies", "WeCima", "hdwmovies", "CimaNowMovies"):
            out[cat] = set(data.keys())
        elif cat in ("series", "tvshows", "asian-series"):
            out[cat] = {
                sid: {s: sv["Number Of Episodes"]
                      for s, sv in rec.get("Seasons", {}).items()}
                for sid, rec in data.items()
            }
        elif cat in ("anime", "arabic-series"):
            out[cat] = {k: rec["Number Of Episodes"]
                        for k, rec in data.items()}
    return out
