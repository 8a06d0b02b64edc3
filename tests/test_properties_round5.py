"""Property-based tests (hypothesis) for the round-5 distributed
algorithms whose contracts are checkable against brute force: the
set-similarity hot-item cutover (any hot threshold must reproduce the
exact jaccard top-1), dup_spans on both candidate tiers vs a brute
window scan, and MSF tier equality on random tie-heavy multigraphs.
Example counts stay small — every example spins Ray Dataset ops."""

import numpy as np
import pandas as pd
import ray.data as rd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from no_fasel_scrapers_ray.ops.dedup import dup_spans, set_similarity_top1
from no_fasel_scrapers_ray.ops.graph import minimum_spanning_forest

RAY_SETTINGS = settings(max_examples=6, deadline=None,
                        derandomize=True,
                        suppress_health_check=[HealthCheck.too_slow])


@st.composite
def ui_tables(draw):
    n_users = draw(st.integers(3, 25))
    n_items = draw(st.integers(2, 10))
    rows = set()
    n_rows = draw(st.integers(n_users, n_users * 4))
    for _ in range(n_rows):
        rows.add((draw(st.integers(1, n_users)),
                  draw(st.integers(0, n_items - 1))))
    return pd.DataFrame(sorted(rows), columns=["u", "item"])


def _brute_top1(ui: pd.DataFrame) -> pd.DataFrame:
    users = np.sort(ui["u"].unique())
    sets = {int(u): set(ui.loc[ui["u"] == u, "item"]) for u in users}
    rows = []
    for a in users:
        best = None
        for b in users:
            if b == a:
                continue
            inter = len(sets[int(a)] & sets[int(b)])
            if inter == 0:
                continue
            jac = inter / (len(sets[int(a)]) + len(sets[int(b)])
                           - inter)
            if best is None or jac > best[0] or (jac == best[0]
                                                 and b < best[1]):
                best = (jac, int(b))
        if best is not None:
            rows.append((int(a), best[1], best[0]))
    return pd.DataFrame(rows, columns=["u", "similar_u", "jaccard"])


@RAY_SETTINGS
@given(ui_tables(), st.sampled_from([1, 2, 1 << 30]))
def test_set_similarity_exact_for_any_hot_threshold(ui, thr):
    got = set_similarity_top1(
        rd.from_pandas(ui).repartition(2), hot_threshold=thr,
        out_names=("u", "similar_u", "jaccard")).to_pandas()
    want = _brute_top1(ui)
    if want.empty:
        # empty Dataset → to_pandas loses the schema (documented Ray
        # gotcha); the contract here is just "no rows"
        assert len(got) == 0
        return
    got = got.sort_values("u", ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=True)


def _brute_dup_spans(texts, k):
    """Reference: for every doc, every maximal offset run whose
    k-token windows each appear in ≥ 1 OTHER doc."""
    toks = [t.split(" ") for t in texts]
    wins = []
    for d, tk in enumerate(toks):
        wins.append([tuple(tk[i:i + k])
                     for i in range(len(tk) - k + 1)])
    from collections import defaultdict
    owners = defaultdict(set)
    for d, ws in enumerate(wins):
        for w in ws:
            owners[w].add(d)
    rows = []
    for d, ws in enumerate(wins):
        dup = [i for i, w in enumerate(ws)
               if len(owners[w] - {d}) > 0]
        if not dup:
            continue
        start = prev = dup[0]
        for i in dup[1:] + [None]:
            if i is None or i != prev + 1:
                rows.append((d, start, prev + k))
                if i is not None:
                    start = i
            if i is not None:
                prev = i
    return sorted(rows)


@st.composite
def span_corpora(draw):
    n_docs = draw(st.integers(2, 8))
    vocab = [f"w{i}" for i in range(draw(st.integers(3, 8)))]
    texts = []
    for _ in range(n_docs):
        ln = draw(st.integers(4, 12))
        texts.append(" ".join(
            vocab[draw(st.integers(0, len(vocab) - 1))]
            for _ in range(ln)))
    return texts


@RAY_SETTINGS
@given(span_corpora(), st.sampled_from([0, 10 ** 9]))
def test_dup_spans_both_tiers_match_brute(texts, cap):
    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts})).repartition(2)
    out = dup_spans(ds, k=3, max_candidates=cap).to_pandas()
    got = sorted(map(tuple, out[["doc_id", "span_start",
                                 "span_end"]].to_numpy()))
    assert got == _brute_dup_spans(texts, 3)


@st.composite
def tie_graphs(draw):
    n = draw(st.integers(4, 20))
    m = draw(st.integers(3, 40))
    u = [draw(st.integers(0, n - 1)) for _ in range(m)]
    v = [draw(st.integers(0, n - 1)) for _ in range(m)]
    w = [draw(st.integers(1, 4)) for _ in range(m)]   # heavy ties
    return pd.DataFrame({"u": np.array(u, dtype=np.int64),
                         "v": np.array(v, dtype=np.int64),
                         "w": np.array(w, dtype=np.int64)})


@RAY_SETTINGS
@given(tie_graphs())
def test_msf_tiers_agree_on_random_tie_graphs(df):
    ds = rd.from_pandas(df).repartition(2)

    def run(**kw):
        out = minimum_spanning_forest(ds, **kw).to_pandas()
        if out.empty:     # self-loop-only graphs → empty forest
            return out
        return out.sort_values(["u", "v", "w"], ignore_index=True)

    kruskal = run()
    t3 = run(small_threshold=0, tier3_threshold=0, n_buckets=2)
    if kruskal.empty:
        assert len(t3) == 0
        return
    pd.testing.assert_frame_equal(t3, kruskal, check_dtype=True)


@st.composite
def batch_streams(draw):
    """A stream of 2-5 micro-batches over a small text universe with
    heavy overlap, plus one crash point (a batch whose commit is
    forgotten and replayed)."""
    universe = [f"doc text {i}" for i in range(draw(st.integers(2, 8)))]
    n_batches = draw(st.integers(2, 5))
    batches = []
    next_id = 0
    for _ in range(n_batches):
        n = draw(st.integers(1, 6))
        rows = []
        for _ in range(n):
            rows.append((next_id, universe[
                draw(st.integers(0, len(universe) - 1))]))
            next_id += 1
        batches.append(rows)
    crash_at = draw(st.integers(0, n_batches - 1))
    return batches, crash_at


@RAY_SETTINGS
@given(batch_streams())
def test_ingest_stream_matches_sequential_set(tmp_path_factory, stream):
    from no_fasel_scrapers_ray.pipelines.ingest import MicroBatchIngest
    batches, crash_at = stream
    sd = str(tmp_path_factory.mktemp("ing_prop"))
    ing = MicroBatchIngest(sd, n_partitions=4)

    seen: set = set()
    expect_rows = []
    for i, rows in enumerate(batches):
        bid = f"b{i}"
        ds = rd.from_pandas(pd.DataFrame({
            "doc_id": np.array([r[0] for r in rows], dtype=np.int64),
            "text": [r[1] for r in rows]})).repartition(2)
        if i == crash_at:
            # crashed attempt: data plane runs, commit is lost
            ing.process(bid, ds)
            del ing.manifest["batches"][bid]
            ing._commit()
            ing = MicroBatchIngest(sd, n_partitions=4)   # restart
        r = ing.process(bid, ds)
        # sequential reference: first-wins within and across batches
        batch_new = 0
        batch_seen_local: set = set()
        for doc_id, text in sorted(rows):
            if text in seen or text in batch_seen_local:
                continue
            batch_seen_local.add(text)
            batch_new += 1
            expect_rows.append(text)
        seen |= batch_seen_local
        assert r["arrived"] == len(rows)
        assert r["new"] == batch_new, (i, rows)
    corpus = ing.corpus_dataset().to_pandas()
    assert sorted(corpus["text"]) == sorted(expect_rows)
