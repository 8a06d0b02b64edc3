"""Micro-batch incremental ingest (pipelines/ingest.py): cross-batch
dedup against the persistent seen store, exactly-once manifest,
crash-replay idempotence."""

import os

import numpy as np
import pandas as pd
import ray.data as rd

from no_fasel_scrapers_ray.pipelines.ingest import MicroBatchIngest


def _batch(rows):
    return rd.from_pandas(pd.DataFrame({
        "doc_id": np.array([r[0] for r in rows], dtype=np.int64),
        "text": [r[1] for r in rows]})).repartition(2)


def test_ingest_cross_batch_dedup(tmp_path):
    ing = MicroBatchIngest(str(tmp_path / "state"), n_partitions=4)
    r1 = ing.process("b1", _batch([(1, "aa bb"), (2, "cc dd"),
                                   (3, "aa bb")]))       # 3 in-batch dup
    assert (r1["arrived"], r1["new"], r1["dupes"]) == (3, 2, 1)
    r2 = ing.process("b2", _batch([(4, "cc dd"), (5, "ee ff")]))
    assert (r2["arrived"], r2["new"], r2["dupes"]) == (2, 1, 1)
    corpus = ing.corpus_dataset().to_pandas()
    assert sorted(corpus["text"]) == ["aa bb", "cc dd", "ee ff"]
    # first-wins inside a batch: doc 1, not doc 3, carries "aa bb"
    assert set(corpus["doc_id"]) == {1, 2, 5}


def test_ingest_replay_is_idempotent(tmp_path):
    sd = str(tmp_path / "state")
    ing = MicroBatchIngest(sd, n_partitions=4)
    ing.process("b1", _batch([(1, "aa bb"), (2, "cc dd")]))
    # committed batch replays as a manifest no-op
    r = ing.process("b1", _batch([(1, "aa bb"), (2, "cc dd")]))
    assert r["replayed"] and r["new"] == 2
    assert len(ing.corpus_dataset().to_pandas()) == 2


def test_ingest_crash_resume(tmp_path):
    """A crash BEFORE the manifest commit leaves partition files on
    disk; the replay overwrites them and commits — no duplicates."""
    sd = str(tmp_path / "state")
    ing = MicroBatchIngest(sd, n_partitions=4)
    ing.process("b1", _batch([(1, "aa bb")]))

    # simulate the crash: run batch 2's data plane, then FORGET the
    # commit (fresh instance from the on-disk manifest)
    ing2 = MicroBatchIngest(sd, n_partitions=4)
    ing2.process("b2", _batch([(2, "cc dd"), (3, "aa bb")]))
    del ing2.manifest["batches"]["b2"]
    ing2._commit()

    ing3 = MicroBatchIngest(sd, n_partitions=4)
    assert "b2" not in ing3.manifest["batches"]
    r = ing3.process("b2", _batch([(2, "cc dd"), (3, "aa bb")]))
    assert not r["replayed"]
    assert (r["arrived"], r["new"], r["dupes"]) == (2, 1, 1)
    corpus = ing3.corpus_dataset().to_pandas()
    assert sorted(corpus["text"]) == ["aa bb", "cc dd"]
    st = ing3.stats_frame()
    assert list(st["batch_id"]) == ["b1", "b2"]


def test_ingest_stats_frame_schema(tmp_path):
    ing = MicroBatchIngest(str(tmp_path / "state"), n_partitions=2)
    ing.process("b1", _batch([(1, "xx yy")]))
    st = ing.stats_frame()
    assert list(st.columns) == ["batch_id", "arrived", "new", "dupes"]
    assert st.iloc[0].tolist() == ["b1", 1, 1, 0]


def test_driver_query_ledger_sf0001():
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as M
    st = M.queries()["ingest_incremental"]("/root/testdata/sf0.001")
    assert list(st.columns) == ["batch_id", "arrived", "new", "dupes"]
    st = st.set_index("batch_id")
    # b2 fully replays a slice of b1; b3 is half-old, half-fresh
    assert st.loc["b2", "new"] == 0
    assert st.loc["b2", "dupes"] == st.loc["b2", "arrived"]
    assert st.loc["b3", "new"] > 0 and st.loc["b3", "dupes"] > 0


def test_ingest_compaction(tmp_path):
    """Many tiny batches → compact() merges committed seen files; the
    dedup result is unchanged, and an uncommitted phantom file is
    neither compacted nor consulted."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    sd = str(tmp_path / "state")
    ing = MicroBatchIngest(sd, n_partitions=2)
    for i in range(6):
        ing.process(f"b{i}", _batch([(10 * i + j, f"t{i} u{j} v")
                                     for j in range(3)]))
    # plant an UNCOMMITTED phantom seen file
    pdir = os.path.join(sd, "seen", "part=0")
    pq.write_table(pa.table({"fp1": [123], "fp2": [456]}),
                   os.path.join(pdir, "phantom.parquet"))
    n = ing.compact(max_files_per_partition=2)
    assert n >= 1
    # phantom survived (not compacted away), per-batch files merged
    left = sorted(os.listdir(pdir))
    assert "phantom.parquet" in left
    assert any(f.startswith("_compact-") for f in left)
    # dedup semantics intact after compaction: replaying old content
    # in a NEW batch counts as dupes
    r = ing.process("again", _batch([(900, "t0 u0 v"), (901, "fresh x")]))
    assert (r["arrived"], r["new"], r["dupes"]) == (2, 1, 1)
    # and a second compact() over already-compacted partitions is
    # stable (idempotent under the file-count threshold)
    ing.compact(max_files_per_partition=2)
    corpus = ing.corpus_dataset().to_pandas()
    assert len(corpus) == 19   # 18 distinct + "fresh x"
