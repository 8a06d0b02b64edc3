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


def test_pca_matches_numpy_reference():
    """Distributed moment-sum PCA vs numpy's full-matrix PCA on the
    same data: projections must agree to float tolerance, components
    must be orthonormal, and pc_1 must carry the most variance."""
    from no_fasel_scrapers_ray.ops.ann import pca_embeddings
    rng = np.random.RandomState(11)
    # anisotropic cloud: variance concentrated along a known axis
    base = rng.randn(400, 8) * np.array([10, 5, 1, 1, 1, 1, 1, 1])
    rot = np.linalg.qr(rng.randn(8, 8))[0]
    pts = (base @ rot).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(len(pts), dtype=np.int64),
                       "embedding": list(pts)})
    out = (pca_embeddings(rd.from_pandas(df).repartition(5), k=2,
                          batch_size=64)
           .to_pandas().sort_values("vec_id", ignore_index=True))

    x = pts.astype(np.float64)
    mu = x.mean(axis=0)
    cov = (x - mu).T @ (x - mu) / len(x)
    evals, evecs = np.linalg.eigh(cov)
    comps = evecs[:, ::-1][:, :2].T.copy()
    for i in range(2):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    ref = (x - mu) @ comps.T

    got = out[["pc_1", "pc_2"]].to_numpy()
    assert np.allclose(got, ref, rtol=1e-6, atol=1e-6)
    assert got[:, 0].var() >= got[:, 1].var()
