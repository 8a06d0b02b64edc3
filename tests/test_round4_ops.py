"""Round-4 operator tests: substring-level dup-span dedup."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from no_fasel_scrapers_ray.ops.dedup import dup_spans


def _docs(texts):
    return rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts})).repartition(2)


def test_dup_spans_planted_duplicate():
    shared = " ".join(f"s{i}" for i in range(10))  # 10-token run
    texts = [
        "a0 a1 a2 " + shared + " a3 a4",          # span at offsets 3..13
        "b0 " + shared + " b1 b2 b3 b4 b5",       # span at offsets 1..11
        "c0 c1 c2 c3 c4 c5 c6 c7 c8 c9 c10",      # clean
    ]
    out = (dup_spans(_docs(texts), k=4).to_pandas()
           .sort_values(["doc_id", "span_start"], ignore_index=True))
    got = list(out.itertuples(index=False, name=None))
    # windows of the shared run: all 4-token windows inside it merge
    # into ONE maximal island per doc
    assert got == [(0, 3, 13), (1, 1, 11)]


def test_dup_spans_intra_doc_repeat_not_counted():
    # the same 4-gram repeated INSIDE one doc is not a cross-doc dup
    texts = ["x1 x2 x3 x4 z x1 x2 x3 x4",
             "other words entirely here now"]
    out = dup_spans(_docs(texts), k=4).to_pandas()
    assert len(out) == 0


def test_dup_spans_two_islands_per_doc():
    a = " ".join(f"p{i}" for i in range(6))
    b = " ".join(f"q{i}" for i in range(6))
    texts = [a + " gap1 gap2 gap3 " + b,
             a + " zzz1 zzz2 zzz3 " + b]
    out = (dup_spans(_docs(texts), k=4).to_pandas()
           .sort_values(["doc_id", "span_start"], ignore_index=True))
    # each doc: island p0..p5 (offsets 0..6) and island q (offsets 9..15)
    got = list(out.itertuples(index=False, name=None))
    assert got == [(0, 0, 6), (0, 9, 15), (1, 0, 6), (1, 9, 15)]


def test_dup_spans_candidate_cap_fails_loudly():
    shared = " ".join(f"w{i}" for i in range(30))
    with pytest.raises(ValueError, match="max_candidates"):
        dup_spans(_docs([shared, shared]), k=4, max_candidates=5)
