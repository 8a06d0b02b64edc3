"""Distributed spherical k-means vs a single-process numpy Lloyd's
reference: same init, same update rule, same tie rule — the distributed
per-batch partial sums must land on the same partition (margins in the
synthetic blobs are wide, so float summation order cannot flip an
assignment)."""

import numpy as np
import pandas as pd
import ray.data as rd

from no_fasel_scrapers_ray.ops.ann import kmeans_embeddings


def _normalize(m):
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def make_blobs(k=3, per=120, d=16, sep=8.0, seed=7):
    rng = np.random.RandomState(seed)
    centers = rng.randn(k, d) * sep
    pts = np.vstack([centers[i] + rng.randn(per, d) for i in range(k)])
    return pts.astype(np.float32), np.repeat(np.arange(k), per)


def reference_lloyd(pts, init, iters):
    cent = np.array(init, dtype=np.float64, copy=True)
    emb = _normalize(pts.astype(np.float64))
    for _ in range(iters):
        a = np.argmax(emb @ _normalize(cent).T, axis=1)
        for c in range(len(cent)):
            m = emb[a == c]
            if len(m):
                cent[c] = m.mean(axis=0)
    a = np.argmax(emb @ _normalize(cent).T, axis=1)
    return a


def test_kmeans_matches_reference_partition():
    pts, truth = make_blobs()
    init = pts[[0, 120, 240]].astype(np.float64)  # one seed per true blob
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(len(pts), dtype=np.int64),
        "embedding": list(pts)})).repartition(6)
    out = kmeans_embeddings(ds, k=3, iters=4, init_centroids=init)
    ref_sizes = pd.Series(reference_lloyd(pts, init, 4)).value_counts()
    assert sorted(out["n_vecs"].tolist()) == sorted(ref_sizes.tolist())
    # blobs are recovered exactly (init seeded one per blob)
    assert sorted(out["n_vecs"].tolist()) == [120, 120, 120]
    assert (out["inertia_milli"] >= 0).all()
    assert out["cluster_id"].tolist() == sorted(out["cluster_id"].tolist())


def test_kmeans_default_init_runs_and_covers_all_rows():
    pts, _ = make_blobs(k=2, per=50)
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(len(pts), dtype=np.int64),
        "embedding": list(pts)})).repartition(3)
    out = kmeans_embeddings(ds, k=4, iters=2)
    assert out["n_vecs"].sum() == len(pts)
    assert out["n_vecs"].dtype == np.int64
