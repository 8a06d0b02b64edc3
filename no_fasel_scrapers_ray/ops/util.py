"""Shared sizing helpers for Ray Data stages."""

from __future__ import annotations

import ray


def stable_bucket(series, n_buckets: int):
    """Content-only bucket hash for a pandas Series.

    NOT ``pd.util.hash_pandas_object``: its row hashes depend on row
    POSITION within the series (measured: the same key string hashed to
    bucket 48 in one batch slice and 60 in another), which silently
    splits one key across shuffle buckets. Integer keys use a plain
    modulo; everything else goes through ``pd.util.hash_array`` —
    vectorized SipHash of the VALUES only (fixed default key, position-
    independent, deterministic across processes — the same primitive the
    shingle hashing relies on).
    """
    import numpy as np
    import pandas as pd

    if pd.api.types.is_integer_dtype(series.dtype):
        return (series.to_numpy(dtype=np.int64) % n_buckets).astype(np.int64)
    vals = series.to_numpy(dtype=object)
    return (pd.util.hash_array(vals) % np.uint64(n_buckets)).astype(np.int64)


def stable_bucket_cols(df, keys: list, n_buckets: int):
    """Content-only bucket hash over MULTIPLE key columns, vectorized:
    per-column ``hash_array`` folded with odd-multiplier mixing (order-
    sensitive so (a, b) and (b, a) differ). Replaces the per-row
    ``astype(str).agg("\\x00".join)`` string build, which measured ~10 s
    per million rows on pair-key aggregates."""
    import numpy as np
    import pandas as pd

    h = np.zeros(len(df), dtype=np.uint64)
    for i, k in enumerate(keys):
        col = df[k]
        if pd.api.types.is_integer_dtype(col.dtype):
            ch = col.to_numpy().astype(np.uint64, copy=False)
        else:
            ch = pd.util.hash_array(col.to_numpy(dtype=object))
        h = h * np.uint64(0x9E3779B97F4A7C15) + ch + np.uint64(i + 1)
    return (h % np.uint64(n_buckets)).astype(np.int64)


# Per-worker-process instance cache for task-based stateful stages.
# An actor pool is the right home for EXPENSIVE state (models, big
# indexes) — but a pool also RESERVES CPUs for the pipeline's lifetime,
# and two pools inside one multi-shuffle execution livelock a 4-CPU
# cluster (observed: minhash pipeline, r2). Cheap state (hash params,
# broadcast refs) lives here instead: tasks run on ordinary CPU slots
# and each worker process builds the instance once.
_WORKER_CACHE: dict = {}


def cached_instance(key, factory):
    if key not in _WORKER_CACHE:
        _WORKER_CACHE[key] = factory()
    return _WORKER_CACHE[key]


def pool_size(requested: int) -> int:
    """Clamp an actor-pool size so the pool can never reserve every CPU
    (a pool holding all CPUs starves the read/write stages and the
    pipeline deadlocks — observed with concurrency=4 on a 4-CPU local
    cluster). Leaves ≥2 CPUs for task-based stages."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(1, min(requested, cpus - 2))


@ray.remote(num_cpus=1)
def _touch_pages(mb: int) -> int:
    """Fault ``mb`` MiB of heap into this worker process and free it.
    glibc keeps the arena, so later large allocations in the same
    worker reuse already-faulted pages."""
    import numpy as np
    a = np.empty((mb << 20) // 8, dtype=np.float64)
    a.fill(1.0)
    return int(a[0])


def warm_workers(n: int | None = None, mb: int = 32) -> int:
    """Pre-fault worker heaps across the cluster.

    On lazily-backed VMs (measured on this sandbox) the FIRST large
    allocation in a fresh worker process runs 100-1000× slower than a
    warm one — a 2000×2000 matmul measured 6.3 s cold vs 0.02 s warm in
    the same worker; refilling freed pages measured 4.9 GB/s vs 7 MB/s
    for first-touch during the host's degraded windows. ``n`` concurrent
    1-CPU tasks land on ``n`` distinct workers (default: all CPUs) and
    each faults ``mb`` MiB once (glibc keeps the arena). ``mb`` is
    deliberately small: warming pays the same first-touch tax up front,
    so it must stay bounded — size it to the typical per-task numpy
    temporary, not the whole heap. Call AFTER ray.init, before timed
    work."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    n = n or cpus
    ray.get([_touch_pages.remote(mb) for _ in range(n)])
    return n
