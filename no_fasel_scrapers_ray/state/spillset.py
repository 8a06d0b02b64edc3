"""Spillable exact URL-seen key set — the "truth" tier behind each
frontier shard's cuckoo filter (north_rule: "partitioned cuckoo shards
spilled to Lance"; SURVEY.md §7.3).

Layout: a small in-memory buffer (python set, O(1) membership for the
hot recent keys) plus immutable **sorted uint64 runs** spilled to disk
as ``.npy`` files and probed through ``np.searchsorted`` over
memory-mapped arrays — a probe touches O(log n) pages, so shard
resident memory is bounded by ``buffer_cap`` + the cuckoo filter, not
by the key count (the r02 design kept the full exact set in a python
set: ~100 GB/shard at the 10^10-URL design point). Runs merge LSM-style
when more than ``max_runs`` accumulate; the merge materializes the key
array once (8 B/key) — a production tier would stream-merge, noted
here because the sandbox never exceeds a few million keys per shard.

Probes only happen on cuckoo POSITIVES (true re-discoveries + the ~e-4
false-positive residue), so the mmap path is off the hot push path for
fresh URLs.

Checkpoint/restore: run files are hardlinked (copy fallback) into the
round's checkpoint dir together with the buffer and a manifest —
immutability of runs makes the link safe across later compactions
(unlink in the spill dir leaves the checkpoint's link intact).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import numpy as np

CHUNK = 1 << 20


class SpilledKeySet:
    def __init__(self, spill_dir: str | None = None,
                 buffer_cap: int = 1 << 20, max_runs: int = 8):
        self.dir = spill_dir or tempfile.mkdtemp(prefix="seen-spill-")
        os.makedirs(self.dir, exist_ok=True)
        self.buffer_cap = buffer_cap
        self.max_runs = max_runs
        self.buf: set[int] = set()
        self.runs: list[np.ndarray] = []      # sorted uint64, mmap-backed
        self.run_files: list[str] = []
        self.n_spilled = 0
        self._next_run = 0

    def __len__(self) -> int:
        return self.n_spilled + len(self.buf)

    # -- membership ----------------------------------------------------------

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized exact membership for uint64 keys → bool array.
        Buffer first (cheap set probes), then each run via one
        searchsorted per run over the still-unresolved keys."""
        h = np.ascontiguousarray(hashes, dtype=np.uint64)
        if self.buf:
            out = np.fromiter((int(x) in self.buf for x in h),
                              dtype=bool, count=len(h))
        else:
            out = np.zeros(len(h), dtype=bool)
        for run in self.runs:
            miss = np.flatnonzero(~out)
            if not len(miss):
                break
            q = h[miss]
            pos = np.searchsorted(run, q)
            inb = pos < len(run)
            hit = np.zeros(len(q), dtype=bool)
            hit[inb] = run[pos[inb]] == q[inb]
            out[miss[hit]] = True
        return out

    # -- ingest ----------------------------------------------------------------

    def add_many(self, hashes: np.ndarray) -> None:
        """Add keys the caller already knows to be NEW (the frontier
        push dedups against the filter+this set before adding);
        compaction still unique-merges defensively."""
        self.buf.update(np.asarray(hashes, dtype=np.uint64).tolist())
        if len(self.buf) >= self.buffer_cap:
            self._spill()

    def _spill(self) -> None:
        if not self.buf:
            return
        arr = np.fromiter(self.buf, dtype=np.uint64, count=len(self.buf))
        arr.sort()
        self._write_run(arr)
        self.buf = set()
        if len(self.runs) > self.max_runs:
            self._compact()

    def _write_run(self, arr: np.ndarray) -> None:
        path = os.path.join(self.dir, f"run-{self._next_run:06d}.npy")
        self._next_run += 1
        np.save(path, arr)
        self.runs.append(np.load(path, mmap_mode="r"))
        self.run_files.append(path)
        self.n_spilled += len(arr)

    def _compact(self) -> None:
        merged = np.unique(np.concatenate(
            [np.asarray(r) for r in self.runs]))
        old = self.run_files
        self.runs, self.run_files, self.n_spilled = [], [], 0
        self._write_run(merged)
        for p in old:
            try:
                os.unlink(p)
            except OSError:
                pass

    # -- bulk access (tests / filter rebuild) ---------------------------------

    def iter_chunks(self, chunk: int = CHUNK):
        """Stream all keys in bounded chunks (cuckoo rebuild on
        restore) — never materializes the whole set."""
        for run in self.runs:
            for lo in range(0, len(run), chunk):
                yield np.asarray(run[lo:lo + chunk])
        if self.buf:
            yield np.fromiter(self.buf, dtype=np.uint64, count=len(self.buf))

    def to_array(self) -> np.ndarray:
        """TEST-ONLY: the full key set as one array (O(n) memory)."""
        parts = list(self.iter_chunks())
        return (np.concatenate(parts) if parts
                else np.empty(0, dtype=np.uint64))

    # -- checkpoint / restore ---------------------------------------------------

    def checkpoint(self, ckpt_dir: str, tag: str) -> None:
        os.makedirs(ckpt_dir, exist_ok=True)
        names = []
        for p in self.run_files:
            name = f"seen-{tag}-{os.path.basename(p)}"
            dst = os.path.join(ckpt_dir, name)
            # ALWAYS replace: run basenames restart at run-000000 per
            # restore generation and spill boundaries differ between
            # crash-resume attempts, so an existing dst of the same
            # name may hold a DIFFERENT (stale) key set — skipping the
            # link would bless it (silent seen-set loss on the next
            # restore). Link to a temp name, then atomic rename.
            tmp = dst + ".tmp"
            try:
                os.unlink(tmp)
            except OSError:
                pass
            try:
                os.link(p, tmp)
            except OSError:
                shutil.copy2(p, tmp)
            os.replace(tmp, dst)
            names.append(name)
        buf = np.fromiter(self.buf, dtype=np.uint64, count=len(self.buf))
        buf.sort()
        np.save(os.path.join(ckpt_dir, f"seen-{tag}-buf.npy"), buf)
        # atomic manifest: a crash mid-write must not leave a torn json
        mpath = os.path.join(ckpt_dir, f"seen-{tag}.json")
        with open(mpath + ".tmp", "w") as fp:
            json.dump({"runs": names, "count": len(self)}, fp)
        os.replace(mpath + ".tmp", mpath)

    @classmethod
    def restore(cls, ckpt_dir: str, tag: str,
                spill_dir: str | None = None, buffer_cap: int = 1 << 20,
                max_runs: int = 8) -> "SpilledKeySet":
        s = cls(spill_dir=spill_dir, buffer_cap=buffer_cap,
                max_runs=max_runs)
        with open(os.path.join(ckpt_dir, f"seen-{tag}.json")) as fp:
            man = json.load(fp)
        for name in man["runs"]:
            src = os.path.join(ckpt_dir, name)
            dst = os.path.join(s.dir, f"run-{s._next_run:06d}.npy")
            s._next_run += 1
            try:
                os.link(src, dst)
            except OSError:
                shutil.copy2(src, dst)
            s.runs.append(np.load(dst, mmap_mode="r"))
            s.run_files.append(dst)
            s.n_spilled += len(s.runs[-1])
        buf = np.load(os.path.join(ckpt_dir, f"seen-{tag}-buf.npy"))
        s.buf = set(buf.tolist())
        return s
