"""Deterministic hashing utilities.

The reference uses Python's salted ``hash()`` for CimaNow ids
(CimaNowMovieScraper.py:54) — non-deterministic across interpreter runs.
This engine replaces every hash with deterministic, seedable hashes so
results are reproducible and shardable (documented deviation, SURVEY.md
§2.4 U10).
"""

from __future__ import annotations

import hashlib
import json

import numpy as np


def stable_hash64(s: str | bytes, seed: int = 0) -> int:
    """Deterministic 64-bit unsigned hash of a string (blake2b-based).

    blake2b is C-accelerated in CPython's hashlib; at ~1 µs/call it is
    fast enough for seen-set keys. For bulk columns use
    :func:`stable_hash64_array`.
    """
    if isinstance(s, str):
        s = s.encode("utf-8")
    h = hashlib.blake2b(s, digest_size=8, key=seed.to_bytes(8, "little"))
    return int.from_bytes(h.digest(), "little")


def stable_hash64_array(strings, seed: int = 0) -> np.ndarray:
    """Vectorized-ish 64-bit hash over an iterable of strings → uint64 array."""
    key = seed.to_bytes(8, "little")
    out = np.empty(len(strings), dtype=np.uint64)
    blake2b = hashlib.blake2b
    for i, s in enumerate(strings):
        out[i] = int.from_bytes(
            blake2b(s.encode("utf-8"), digest_size=8, key=key).digest(), "little"
        )
    return out


def stable_id(title: str) -> str:
    """Deterministic replacement for ``str(hash(title))[1:7]``.

    Reference: CimaNowMovieScraper.py:54 synthesizes movie ids from the
    *salted* builtin hash — unstable across runs. We take the same
    "6 chars of a decimal hash" shape but from a stable hash, so ids are
    reproducible (deliberate, documented deviation).
    """
    return str(stable_hash64(title))[1:7]


def md5_of_json(obj) -> str:
    """md5 of the canonical JSON encoding — the reference's file checksum.

    Reference: Postprocessing.py:103-107 (``md5(json.dumps(content))``).
    """
    return hashlib.md5(json.dumps(obj).encode("utf-8")).hexdigest()
