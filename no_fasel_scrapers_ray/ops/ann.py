"""Similarity search over the ``embeddings`` table (list<float> column).

- brute-force cosine top-k: numpy matmul per batch against a broadcast,
  pre-normalized query matrix (the baseline; exact);
- IVF variant: k-means-ish coarse centroids (deterministic seed), probe
  the nearest ``nprobe`` cells — the scale path (prunes the matmul to a
  fraction of the corpus);
- embedding-cosine near-dup: random-hyperplane LSH buckets + in-bucket
  cosine verify.

Engine additions per the brief ("Similarity search"); the brute-force
path has a DuckDB oracle (list_cosine_similarity).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from .util import pool_size


def _stack(batch_col) -> np.ndarray:
    return np.vstack(batch_col.to_numpy())


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class BruteForceTopK:
    """Per-batch exact top-k: one f32 matmul per batch against the
    broadcast query matrix; emits (query_id, neighbor candidates) partial
    top-k rows that a tiny driver-side reduce finalizes."""

    def __init__(self, queries_ref, k: int):
        qid, qmat = ray.get(queries_ref)
        self.qid = qid
        self.qmat = _normalize(qmat.astype(np.float64))
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        emb = _normalize(_stack(batch["embedding"]).astype(np.float64))
        sims = emb @ self.qmat.T  # (n_batch, n_query)
        vec_ids = batch["vec_id"].to_numpy()
        out = []
        k = min(self.k, sims.shape[0])
        for j, q in enumerate(self.qid):
            col = sims[:, j]
            idx = np.argpartition(-col, k - 1)[:k]
            out.append(pd.DataFrame({
                "query_id": q,
                "neighbor_id": vec_ids[idx],
                "cosine": col[idx],
            }))
        return pd.concat(out, ignore_index=True)


def knn_bruteforce(embeddings: rd.Dataset, query_ids: list[int], k: int = 5,
                   exclude_self: bool = True, concurrency: int = 4) -> pd.DataFrame:
    """Exact cosine top-k for query vectors drawn from the table itself.

    Distributed pass emits per-batch partial top-k; the final reduce over
    (n_queries × k × n_batches) rows is tiny and runs on the driver.
    Cosine rounded to 4 decimals for oracle bit-parity; ties broken by
    neighbor_id so results are deterministic.
    """
    qdf = embeddings.map_batches(
        lambda t: t[np.isin(t["vec_id"].to_numpy(), query_ids)],
        batch_format="pandas").to_pandas()
    qdf = qdf.sort_values("vec_id")
    queries_ref = ray.put((qdf["vec_id"].to_numpy(), _stack(qdf["embedding"])))

    partials = embeddings.map_batches(
        BruteForceTopK, fn_constructor_args=(queries_ref, k + 1),
        batch_format="pandas", concurrency=pool_size(concurrency), num_cpus=0.5).to_pandas()

    if exclude_self:
        partials = partials[partials["query_id"] != partials["neighbor_id"]]
    partials["cosine"] = partials["cosine"].round(4)
    partials = partials.sort_values(
        ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True])
    out = partials.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    return out[["query_id", "neighbor_id", "cosine"]]


def ivf_build_centroids(embeddings: rd.Dataset, n_cells: int = 16,
                        iters: int = 5, seed: int = 42) -> np.ndarray:
    """Deterministic mini k-means over a driver-side sample (the coarse
    quantizer is small state — built once, broadcast everywhere)."""
    sample = _stack(embeddings.limit(4096).to_pandas()["embedding"]).astype(np.float64)
    rng = np.random.RandomState(seed)
    cent = sample[rng.choice(len(sample), size=n_cells, replace=False)]
    for _ in range(iters):
        assign = np.argmax(_normalize(sample) @ _normalize(cent).T, axis=1)
        for c in range(n_cells):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


class IVFTopK:
    """IVF probe: per batch, keep only vectors whose nearest centroid is
    one of the query's ``nprobe`` cells, then exact cosine on survivors."""

    def __init__(self, queries_ref, centroids_ref, k: int, nprobe: int):
        qid, qmat = ray.get(queries_ref)
        self.qid, self.qmat = qid, _normalize(qmat.astype(np.float64))
        self.cent = _normalize(ray.get(centroids_ref).astype(np.float64))
        self.k, self.nprobe = k, nprobe
        self.qcells = np.argsort(-(self.qmat @ self.cent.T), axis=1)[:, :nprobe]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        emb = _normalize(_stack(batch["embedding"]).astype(np.float64))
        cells = np.argmax(emb @ self.cent.T, axis=1)
        vec_ids = batch["vec_id"].to_numpy()
        out = []
        for j, q in enumerate(self.qid):
            mask = np.isin(cells, self.qcells[j])
            if not mask.any():
                continue
            sims = emb[mask] @ self.qmat[j]
            ids = vec_ids[mask]
            k = min(self.k, len(ids))
            idx = np.argpartition(-sims, k - 1)[:k]
            out.append(pd.DataFrame({"query_id": q, "neighbor_id": ids[idx],
                                     "cosine": sims[idx]}))
        if not out:
            return pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                                 "neighbor_id": pd.Series([], dtype=np.int64),
                                 "cosine": pd.Series([], dtype=np.float64)})
        return pd.concat(out, ignore_index=True)


def knn_ivf(embeddings: rd.Dataset, query_ids: list[int], k: int = 5,
            n_cells: int = 16, nprobe: int = 4, concurrency: int = 4) -> pd.DataFrame:
    qdf = embeddings.map_batches(
        lambda t: t[np.isin(t["vec_id"].to_numpy(), query_ids)],
        batch_format="pandas").to_pandas().sort_values("vec_id")
    queries_ref = ray.put((qdf["vec_id"].to_numpy(), _stack(qdf["embedding"])))
    centroids_ref = ray.put(ivf_build_centroids(embeddings, n_cells))

    partials = embeddings.map_batches(
        IVFTopK, fn_constructor_args=(queries_ref, centroids_ref, k + 1, nprobe),
        batch_format="pandas", concurrency=pool_size(concurrency), num_cpus=0.5).to_pandas()
    partials = partials[partials["query_id"] != partials["neighbor_id"]]
    partials["cosine"] = partials["cosine"].round(4)
    partials = partials.sort_values(
        ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True])
    return partials.groupby("query_id", sort=True).head(k).reset_index(drop=True)


class HyperplaneLSH:
    """Random-hyperplane signatures for cosine near-dup bucketing."""

    def __init__(self, dim: int = 64, n_planes: int = 4, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.planes = rng.randn(dim, n_planes)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        emb = _stack(batch["embedding"]).astype(np.float64)
        bits = (emb @ self.planes) > 0
        bucket = (bits * (1 << np.arange(bits.shape[1]))).sum(axis=1)
        return pd.DataFrame({"vec_id": batch["vec_id"],
                             "bucket": bucket.astype(np.int64),
                             "embedding": batch["embedding"]})


def cosine_near_dup(embeddings: rd.Dataset, threshold: float = 0.95,
                    concurrency: int = 4) -> rd.Dataset:
    """Embedding near-dup pairs: LSH bucket → in-bucket exact cosine.

    Recall note (documented cap): pairs split across buckets are missed;
    raise recall by probing multiple plane sets. Exactness within a
    bucket is total.
    """
    bucketed = embeddings.map_batches(HyperplaneLSH, batch_format="pandas",
                                      concurrency=pool_size(concurrency), num_cpus=0.5)

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        emb = _normalize(_stack(g["embedding"].iloc[order]).astype(np.float64))
        if len(ids) < 2:
            return pd.DataFrame({"vec_a": pd.Series([], dtype=np.int64),
                                 "vec_b": pd.Series([], dtype=np.int64),
                                 "cosine": pd.Series([], dtype=np.float64)})
        sims = emb @ emb.T
        a, b = np.triu_indices(len(ids), k=1)
        keep = sims[a, b] >= threshold
        return pd.DataFrame({"vec_a": ids[a][keep], "vec_b": ids[b][keep],
                             "cosine": np.round(sims[a, b][keep], 4)})

    return bucketed.groupby("bucket").map_groups(verify, batch_format="pandas")
