"""Deduplication operators over the ``documents`` table.

Families (brief: "Deduplication"):
- exact: content-hash → groupby(hash) → keep first (min doc_id);
- MinHash + LSH: shingle → minhash signature → band buckets → groupby
  (band_id, band_hash) → candidate pairs → Jaccard verify;
- SimHash: 64-bit simhash, bucket by high bits, Hamming verify;
- embedding-cosine near-dup: LSH-bucketed (random hyperplanes) cosine.

The reference only has EXACT incremental dedup (the seen-set anti-join,
FaselMoviesScraper.py:28 / SURVEY.md §2.8); near-dup is an engine
addition. Scale shape: per-batch vectorized signatures, then ONE
groupby shuffle over (bucket-key) rows — candidate verification happens
inside the group, never a driver-side O(n²) loop. Pair outputs are
canonicalized (a < b) and deduplicated across buckets with a final
groupby.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray.data as rd

from .relational import broadcast_get
from .util import pool_size

# MinHash parameters: 64 permutations in 8 bands of 8 rows.
N_PERM = 64
N_BANDS = 8
ROWS_PER_BAND = N_PERM // N_BANDS
_MERSENNE = (1 << 61) - 1


def _perm_params(seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=N_PERM, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=N_PERM, dtype=np.int64).astype(np.uint64)
    return a, b


def _token_hashes(text: str, shingle: int) -> np.ndarray:
    toks = text.split(" ")
    if shingle > 1:
        toks = [" ".join(toks[i:i + shingle]) for i in range(max(1, len(toks) - shingle + 1))]
    hs = np.fromiter(
        (int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "little")
         for t in set(toks)),
        dtype=np.uint64,
    )
    return hs


def exact_dedup_key(docs: rd.Dataset, key_expr: str = "full") -> rd.Dataset:
    """Exact dedup groups: md5(text) (or a 20-char-prefix key) →
    representative = min(doc_id), group size.

    Hash computed vectorized per batch; the groupby shuffle moves only
    (key, doc_id) pairs. ``key_expr``: 'full' | 'prefix20'.
    """

    def hash_batch(batch: pd.DataFrame) -> pd.DataFrame:
        if key_expr == "prefix20":
            basis = batch["text"].str.slice(0, 20)
        else:
            basis = batch["text"]
        keys = basis.map(lambda t: hashlib.md5(t.encode()).hexdigest())
        return pd.DataFrame({"content_hash": keys, "doc_id": batch["doc_id"]})

    from ray.data.aggregate import Min, Count
    return (
        docs.map_batches(hash_batch, batch_format="pandas")
        .groupby("content_hash")
        .aggregate(Min("doc_id", alias_name="rep_doc_id"),
                   Count(alias_name="n_docs"))
    )


class MinHasher:
    """Per-batch MinHash signatures → exploded (band_id, band_hash, doc_id).

    Permutation params generated once per actor in ``__init__``.
    """

    def __init__(self, shingle: int = 3, seed: int = 42):
        self.a, self.b = _perm_params(seed)
        self.shingle = shingle

    def signature(self, text: str) -> np.ndarray:
        hs = _token_hashes(text, self.shingle)
        if len(hs) == 0:
            return np.zeros(N_PERM, dtype=np.uint64)
        # (n_perm, n_tok) universal hashing, min over tokens
        prod = (np.multiply.outer(self.a, hs) + self.b[:, None]) % _MERSENNE
        return prod.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        doc_ids, band_ids, band_hashes = [], [], []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            sig = self.signature(text)
            for band in range(N_BANDS):
                chunk = sig[band * ROWS_PER_BAND:(band + 1) * ROWS_PER_BAND]
                bh = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
                doc_ids.append(doc_id)
                band_ids.append(band)
                band_hashes.append(int.from_bytes(bh, "little") >> 1)
        return pd.DataFrame({
            "doc_id": np.asarray(doc_ids, dtype=np.int64),
            "band_id": np.asarray(band_ids, dtype=np.int8),
            "band_hash": np.asarray(band_hashes, dtype=np.int64),
        })


def minhash_lsh_pairs(docs: rd.Dataset, shingle: int = 3,
                      jaccard_threshold: float = 0.5,
                      concurrency: int = 4) -> rd.Dataset:
    """MinHash+LSH near-duplicate pairs with exact n-gram Jaccard verify.

    signature → band explode → groupby(band_id, band_hash) emits candidate
    pairs → pair-level groupby dedups across bands → Jaccard verify on the
    (re-hashed) shingle sets. Verification re-tokenizes the pair texts via
    a broadcast doc_id→text lookup, so the wide step only ever moves
    (band rows) and (pair keys), never full documents.
    """
    import ray

    texts = docs.select_columns(["doc_id", "text"]).to_pandas()
    text_ref = ray.put(dict(zip(texts["doc_id"], texts["text"])))

    bands = docs.map_batches(MinHasher, fn_constructor_args=(shingle,),
                             batch_format="pandas", concurrency=pool_size(concurrency), num_cpus=0.5)

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []}).astype(np.int64)
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[a], "doc_b": ids[b]})

    pairs = bands.groupby(["band_id", "band_hash"]).map_groups(
        emit_pairs, batch_format="pandas")

    from ray.data.aggregate import Count
    uniq = pairs.groupby(["doc_a", "doc_b"]).aggregate(Count(alias_name="n_bands"))

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        # task-based (broadcast texts fetched once per worker): a second
        # actor pool here could, with the MinHasher pool, reserve every
        # CPU and starve the read stage
        texts_map = broadcast_get(text_ref)
        jac = np.empty(len(batch), dtype=np.float64)
        for i, (da, db) in enumerate(zip(batch["doc_a"], batch["doc_b"])):
            sa = set(_token_hashes(texts_map[da], shingle).tolist())
            sb = set(_token_hashes(texts_map[db], shingle).tolist())
            union = len(sa | sb)
            jac[i] = (len(sa & sb) / union) if union else 0.0
        batch = batch.copy()
        batch["jaccard"] = np.round(jac, 6)
        return batch[batch["jaccard"] >= jaccard_threshold][
            ["doc_a", "doc_b", "jaccard"]]

    return uniq.map_batches(verify, batch_format="pandas")


class SimHasher:
    """64-bit SimHash per doc, vectorized over token hash bit-planes."""

    def __init__(self):
        self.bits = np.arange(64, dtype=np.uint64)

    def simhash(self, text: str) -> int:
        hs = _token_hashes(text, 1)
        if len(hs) == 0:
            return 0
        bitmat = ((hs[:, None] >> self.bits) & np.uint64(1)).astype(np.int32)
        votes = bitmat.sum(axis=0) * 2 - len(hs)
        return int(((votes > 0).astype(np.uint64) << self.bits).sum())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sh = np.fromiter((self.simhash(t) for t in batch["text"]),
                         dtype=np.uint64, count=len(batch))
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "simhash": sh.view(np.int64),
            "bucket": (sh >> np.uint64(48)).view(np.int64),
        })


def simhash_candidates(docs: rd.Dataset, max_hamming: int = 8,
                       concurrency: int = 4) -> rd.Dataset:
    """SimHash near-dup pairs: bucket on the top 16 bits, Hamming-verify
    within each bucket (vectorized popcount via uint8 bit tricks)."""
    sigs = docs.map_batches(SimHasher, batch_format="pandas",
                            concurrency=pool_size(concurrency), num_cpus=0.5)

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy().view(np.uint64)
        order = np.argsort(ids)
        ids, hs = ids[order], hs[order]
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                                 "doc_b": pd.Series([], dtype=np.int64),
                                 "hamming": pd.Series([], dtype=np.int64)})
        a, b = np.triu_indices(len(ids), k=1)
        x = (hs[a] ^ hs[b])
        ham = np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)
        keep = ham <= max_hamming
        return pd.DataFrame({"doc_a": ids[a][keep], "doc_b": ids[b][keep],
                             "hamming": ham[keep].astype(np.int64)})

    return sigs.groupby("bucket").map_groups(verify, batch_format="pandas")
