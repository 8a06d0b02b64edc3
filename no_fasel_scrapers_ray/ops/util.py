"""Shared sizing helpers for Ray Data stages."""

from __future__ import annotations

import ray


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
