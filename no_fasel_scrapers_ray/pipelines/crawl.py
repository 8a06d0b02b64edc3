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
from ..corpus.spans import pages_from_arrow
from ..corpus.storage import CORPUS_SALTS
from ..functions.hashing import stable_hash64
from ..functions.urls import canonicalize_url
from ..state.frontier import (
    PUSH_SCHEMA, FrontierShard, PolitenessConfig, push_table)
from ..stages.adapters import extract_page, seed_rows
# top-level (not inside the remote fns): workers resolve these through
# the by-value-pickled module globals — a runtime relative import inside
# a task body would re-import the package on the worker, which fails
# when /root/repo is not on the worker's sys.path
from ..stages.fetch import get_fetcher
from ..stages.parse import page_stats_record

RECORD_COLS = ["catalog", "record_type", "key", "series_key", "season_key",
               "order_key", "payload"]
RECORD_SCHEMA_FLAT = pa.schema([(c, pa.string()) for c in RECORD_COLS])

_BCAST: dict = {}


def _bget(ref):
    key = ref.hex()
    if key not in _BCAST:
        _BCAST[key] = ray.get(ref)
    return _BCAST[key]


def link_hashes(links: list[dict]) -> np.ndarray:
    """Canonical-URL hashes, computed ONCE in the (parallel) extract
    task and shipped with the push — the shard actors never re-hash."""
    out = np.empty(len(links), dtype=np.uint64)
    for i, lk in enumerate(links):
        out[i] = stable_hash64(canonicalize_url(lk["url"]))
    return out


def route_shard(url: str, n_shards: int) -> int:
    return stable_hash64(canonicalize_url(url)) % n_shards


def push_links(links: list[dict], shards, n_shards: int) -> None:
    """Route links to their shards by hash and push Arrow tables."""
    if not links:
        return
    hashes = link_hashes(links)
    table = push_table(links, hashes)
    owners = (hashes % np.uint64(n_shards)).astype(np.int64)
    refs = []
    for s in range(n_shards):
        idx = np.flatnonzero(owners == s)
        if len(idx):
            refs.append(shards[s].push.remote(table.take(pa.array(idx))))
    ray.get(refs)


def partition_by_host(table: pa.Table, n_salts: int) -> list[np.ndarray]:
    """The groupby-host shuffle with hot-host salting: one ROW-INDEX
    array per (host, salt) bucket, sized so each bucket holds ~target
    rows (~2 blocks per fetch slot). Returning indices (not sub-tables)
    lets the round table be ray.put ONCE and sliced inside the tasks —
    per-block sub-table serialization on the driver measured ~1-2 s/round.

    Salt ALIGNMENT: the primary split inside a host follows
    ``h % CORPUS_SALTS`` — the same url hash that partitioned the
    on-disk corpus (corpus/storage.py::url_salts) — so in path mode a
    block's worker reads exactly the corpus partitions its rows live
    in. Oversized salt groups stripe-split WITHIN the salt (still one
    partition); undersized groups of the same host coalesce (a merged
    block touches the few partitions it carries — the fetcher prunes
    per row-group either way). Broadcast mode is indifferent to block
    composition, so one scheme serves both."""
    import pyarrow.compute as pc
    n = table.num_rows
    target = max(256, -(-n // (2 * n_salts)))
    codes = pc.dictionary_encode(
        table.column("host")).combine_chunks().indices.to_numpy()
    h = (table.column("h").to_numpy()
         if "h" in table.column_names else None)
    out = []
    for code in np.unique(codes):
        rows = np.flatnonzero(codes == code)
        if h is None:                       # no hash column: stripe only
            splits = -(-len(rows) // target)
            for s in range(splits):
                out.append(rows[s::splits])
            continue
        salts = (h[rows] % np.uint64(CORPUS_SALTS)).astype(np.int64)
        pending: list[np.ndarray] = []
        pend_n = 0
        for s in range(CORPUS_SALTS):
            grp = rows[salts == s]
            if not len(grp):
                continue
            if len(grp) >= target:
                splits = -(-len(grp) // target)
                for k in range(splits):
                    out.append(grp[k::splits])
            else:
                pending.append(grp)
                pend_n += len(grp)
                if pend_n >= target:
                    out.append(np.concatenate(pending))
                    pending, pend_n = [], 0
        if pending:
            out.append(np.concatenate(pending))
    return [ix for ix in out if len(ix)]


@ray.remote
def _crawl_block(block_idx: np.ndarray, refs: list, shards,
                 n_shards: int, challenge_every: int, out_path: str,
                 pages_path: str) -> int:
    """One (host, salt) block of a crawl round: fetch+extract every
    row, write this block's records parquet part, push discovered
    links once. Runs as a raw Ray task: a crawl round is a small,
    latency-sensitive barrier over shared mutable frontier state — the
    case the design brief reserves for raw tasks. Per-round Dataset
    executions measured 8+ s of pure startup/teardown dead time across
    a 6-round crawl; the batch-level transform itself is unchanged.

    Catalog records and per-page parse stats go to SEPARATE parquet
    prefixes: assembly reads only catalog rows (never the ~3× larger
    page-stat stream), page analytics read only pages/."""
    # refs wrapped in a list so Ray does NOT auto-dereference them —
    # the workers resolve them once via the per-process caches
    ready_ref, corpus_ref, state_ref = refs
    block = _bget(ready_ref).take(pa.array(block_idx))
    fetcher = get_fetcher(corpus_ref, challenge_every)
    state = _bget(state_ref)
    records: list[dict] = []
    pages: list[dict] = []
    links: list[dict] = []
    for lo in range(0, block.num_rows, 2048):
        batch = block.slice(lo, 2048)
        fetched = fetcher(batch)
        frontier_cols = {c: fetched.column(c).to_pylist()
                         for c in FRONTIER_SCHEMA.names
                         if c in fetched.column_names}
        # columnar page views: three flat child to_pylist calls for the
        # whole batch instead of one python dict per span
        views = pages_from_arrow(fetched.column("spans"),
                                 fetched.num_rows)
        for i in range(fetched.num_rows):
            row = {c: frontier_cols[c][i] for c in frontier_cols}
            page = views[i]
            recs, lks = extract_page(row, page, state)
            records.extend(recs)
            links.extend(lks)
            pages.append(page_stats_record(row, page))
    push_links(links, shards, n_shards)
    for rows, path in ((records, out_path), (pages, pages_path)):
        arrays = {c: pa.array([r[c] for r in rows], type=pa.string())
                  for c in RECORD_COLS}
        pq.write_table(pa.table(arrays, schema=RECORD_SCHEMA_FLAT), path)
    return len(records) + len(pages)


@ray.remote
def _write_round_ckpt(ready: pa.Table, ckpt_dir: str, manifest: dict) -> int:
    """Round-checkpoint writer (runs off the driver): popped.parquet
    first, MANIFEST.json last — MANIFEST is resume()'s completeness
    marker, so a crash mid-write leaves an ignorable partial dir."""
    pq.write_table(ready, os.path.join(ckpt_dir, "popped.parquet"))
    with open(os.path.join(ckpt_dir, "MANIFEST.json"), "w") as fp:
        json.dump(manifest, fp)
    return ready.num_rows


@ray.remote
def _warm_worker(refs: list) -> int:
    """Pre-builds per-worker fetch state (worker spawn + corpus index)
    so the timed crawl measures steady-state throughput, not cluster
    warmup. The 0.5 s hold forces Ray to fan tasks over distinct
    workers instead of reusing one warm process."""
    get_fetcher(refs[0])
    time.sleep(0.5)
    return os.getpid()


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
        # SPREAD the shard actors across nodes: Ray's default actor
        # placement packs them onto the submitting node, which in
        # multi-node runs funnels every hash-routed push/pop RPC and
        # its plasma traffic through ONE raylet (no-op on one node).
        self.shards = [
            FrontierShard.options(scheduling_strategy="SPREAD")
            .remote(i, n_shards, politeness)
            for i in range(n_shards)
        ]
        # corpus: broadcast table (combined to single chunks so worker
        # gathers are zero-copy-fast and workers never re-combine) or a
        # storage path workers read themselves
        self.corpus_ref = (corpus_table if isinstance(corpus_table, str)
                           else ray.put(corpus_table.combine_chunks()))
        self.state_ref = ray.put({
            "old": _old_digests(old_catalogs or {}),
            "images": image_sources or {},
        })
        self.fetch_concurrency = fetch_concurrency
        self.challenge_every = challenge_every
        self.max_pop = max_pop_per_round
        self.frontier_log: list[pa.Table] = []
        self.metrics = {"rounds": 0, "popped": 0, "records": 0,
                        "round_secs": [], "driver_secs": []}
        self._push_rows(seed_rows(seeds))
        self.round_idx = 0

    def warmup(self) -> int:
        """Spawn ~one worker per CPU and build each worker's fetch
        state. Optional; bench.py calls it so throughput timing starts
        from a warm cluster."""
        if isinstance(self.corpus_ref, str):
            refs = [_warm_worker.remote([self.corpus_ref])
                    for _ in range(int(ray.cluster_resources().get("CPU", 4)))]
        else:
            refs = [_warm_worker.remote([self.corpus_ref])
                    for _ in range(int(ray.cluster_resources().get("CPU", 4)))]
        return len(set(ray.get(refs)))

    # -- frontier I/O ------------------------------------------------------

    def _push_rows(self, rows: list[dict]):
        push_links(rows, self.shards, self.n_shards)

    def _pop_round(self) -> pa.Table | None:
        results = ray.get([s.pop_ready.remote(self.max_pop)
                           for s in self.shards])
        tables = [t for t in results if t.num_rows]
        if not tables:
            return None
        return pa.concat_tables(tables).sort_by(
            [("site", "ascending"), ("depth", "ascending"),
             ("order_key", "ascending"), ("url", "ascending")])

    # -- the round ---------------------------------------------------------

    def run(self, start_round: int = 0, max_rounds: int | None = None) -> dict:
        """Drive rounds until the frontier drains (or ``max_rounds`` —
        used by the kill-and-resume test to simulate a crash)."""
        self.round_idx = start_round
        while True:
            if max_rounds is not None and \
                    self.round_idx - start_round >= max_rounds:
                # simulated crash AFTER the round's checkpoint settled
                # (no finalize) — the scenario kill-and-resume models
                if getattr(self, "_ckpt_refs", None):
                    ray.get(self._ckpt_refs)
                return self.metrics
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
            if n_records >= 0:
                self.metrics["records"] += n_records
            self.metrics["round_secs"].append(round(dt, 3))
            self.round_idx += 1
        self._finalize()
        return self.metrics

    def _execute_round(self, ready: pa.Table) -> int:
        """One round: host-partition the ready set (with hot-host
        salting) and run one raw _crawl_block task per block — the
        fused fetch+extract+sink+push transform. Fetch state (corpus
        index, per-host sessions) is cached per worker process
        (stages/fetch.py:get_fetcher) so warm workers carry it across
        rounds with zero spin-up."""
        t0 = time.perf_counter()
        out_dir = os.path.join(self.run_dir, "records",
                               f"round={self.round_idx:04d}")
        pages_dir = os.path.join(self.run_dir, "pages",
                                 f"round={self.round_idx:04d}")
        os.makedirs(out_dir, exist_ok=True)
        os.makedirs(pages_dir, exist_ok=True)
        blocks = partition_by_host(ready, n_salts=self.fetch_concurrency)
        ready_ref = ray.put(ready.combine_chunks())
        self._last_ready_ref = ready_ref
        refs = [
            _crawl_block.remote(
                idx, [ready_ref, self.corpus_ref, self.state_ref],
                self.shards, self.n_shards, self.challenge_every,
                os.path.join(out_dir, f"part-{k:05d}.parquet"),
                os.path.join(pages_dir, f"part-{k:05d}.parquet"))
            for k, idx in enumerate(blocks)
        ]
        self.metrics["driver_secs"].append(
            round(time.perf_counter() - t0, 3))
        return sum(ray.get(refs))

    # -- checkpoint / resume (per-partition lineage, north_rule) -----------

    def _checkpoint_round(self, ready: pa.Table):
        ckpt = os.path.join(self.run_dir, "ckpt", f"round-{self.round_idx:04d}")
        os.makedirs(ckpt, exist_ok=True)
        # non-blocking: settle the previous round's checkpoint instead
        # of stalling this round on shard serialization
        if getattr(self, "_ckpt_refs", None):
            ray.get(self._ckpt_refs)
        self._ckpt_refs = [s.checkpoint.remote(ckpt) for s in self.shards]
        # popped.parquet + MANIFEST written from a task (the round table
        # is already in the object store as _last_ready_ref) — a serial
        # driver-side parquet write per round was dead time in the
        # barrier loop. MANIFEST lands only after popped.parquet, so
        # resume's completeness marker is unchanged.
        manifest = {"round": self.round_idx,
                    "popped": ready.num_rows,
                    "n_shards": self.n_shards,
                    "metrics": json.loads(json.dumps(self.metrics))}
        self._ckpt_refs.append(
            _write_round_ckpt.remote(self._last_ready_ref, ckpt, manifest))

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
        if getattr(self, "_ckpt_refs", None):
            ray.get(self._ckpt_refs)
        log = (pa.concat_tables(self.frontier_log)
               if self.frontier_log else PUSH_SCHEMA.empty_table())
        pq.write_table(log, os.path.join(self.run_dir, "frontier_log.parquet"))
        stats = ray.get([s.stats.remote() for s in self.shards])
        self.metrics["shards"] = stats
        with open(os.path.join(self.run_dir, "metrics.json"), "w") as fp:
            json.dump(self.metrics, fp, indent=2)

    # -- outputs -----------------------------------------------------------

    def records_dataset(self) -> rd.Dataset:
        """Catalog record rows only (page stats live under pages/)."""
        from ..corpus.storage import read_parquet_sized
        return read_parquet_sized(os.path.join(self.run_dir, "records"))

    def pages_dataset(self) -> rd.Dataset:
        """Per-page parse artifacts: span-sequence fingerprint + text
        stats for every fetched page (stages/parse.py)."""
        from ..corpus.storage import read_parquet_sized
        return read_parquet_sized(os.path.join(self.run_dir, "pages"))

    def frontier_log_table(self) -> pa.Table:
        return pa.concat_tables(self.frontier_log) if self.frontier_log \
            else PUSH_SCHEMA.empty_table()

    def seen_urls(self) -> set[int]:
        hashes = ray.get([s.seen_hashes.remote() for s in self.shards])
        return set(np.concatenate(hashes).tolist()) if hashes else set()

    def release(self) -> None:
        """Free crawl-session cluster state once the crawl is done: the
        frontier shard actors and the broadcast corpus/state objects.
        Downstream stages (assembly reads parquet from run_dir) do not
        need any of it, and a multi-GB corpus broadcast left pinned in
        the object store starves the assembly shuffle into spilling
        (measured 534 s vs 71 s for the same assemble at bench scale).
        The engine is unusable for further rounds after release; resume
        via a fresh engine + ``resume()``."""
        for s in self.shards:
            ray.kill(s)
        self.shards = []
        self.corpus_ref = None
        self.state_ref = None


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
