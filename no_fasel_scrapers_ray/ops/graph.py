"""Distributed graph operators over Ray Data.

Connected components is the standard follow-on to every candidate-pair
near-dup stage (MinHash/SimHash/n-gram Jaccard emit PAIRS; dedup needs
CLUSTERS): transitively-linked documents form one duplicate group and a
single canonical representative survives. The reference's analogue is
its content-id seen-set (D1) — a degenerate one-hop version; the engine
generalizes it to true transitive closure.

Scale posture: label propagation ("min over the closed neighborhood")
expressed entirely as bucketed Ray Data passes — per iteration ONE
message shuffle (labels joined to edges) and ONE min-reduce, both moving
(node, label) pairs only, never documents. Per-block union-find
contraction collapses in-block paths before any shuffle, and pointer
doubling (label-pointer edges joined into the same offer pass) makes
the residual cross-block convergence O(log diameter); near-dup
components are shallow, so 2-3 iterations settle real corpora. Labels
are materialized once per iteration — each is a 2-int64-column dataset,
the one state that MUST persist across iterations (lineage re-execution
would otherwise re-run every prior iteration per pass).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _driver_union_find(a: np.ndarray, c: np.ndarray) -> pa.Table:
    """Union-find over an edge list small enough to hold on the
    driver; returns the (node, label) table with label = component
    min. Shared by the small-graph fast path and (conceptually) the
    per-block contraction."""
    ids, inv = np.unique(np.concatenate([a, c]), return_inverse=True)
    parent = np.arange(len(ids))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in zip(inv[:len(a)], inv[len(a):]):
        ru, rv = find(u), find(v)
        if ru < rv:
            parent[rv] = ru
        elif rv < ru:
            parent[ru] = rv
    roots = ids[np.fromiter((find(i) for i in range(len(ids))),
                            dtype=np.int64, count=len(ids))]
    return pa.table({"node": ids, "label": roots})


def connected_components(pairs: rd.Dataset, col_a: str, col_b: str,
                         n_buckets: int = 64,
                         max_iters: int = 50,
                         small_threshold: int = 1 << 18) -> rd.Dataset:
    """Label every node of the undirected pair graph with the MINIMUM
    node id reachable from it: ``(doc_id, cluster_id)`` — one row per
    node that appears in ``pairs``; ``cluster_id`` is the component's
    canonical representative (its smallest member).

    Per iteration: every node offers its current label to each
    neighbor (a bucketed join of labels to the edge list), then each
    node takes the min over its own label and all offers (a bucketed
    min-reduce). Labels only ever DECREASE, so the global label sum is
    strictly monotone and stalls exactly at the fixed point — the
    convergence check is one cheap streaming sum, no row-level diff.
    """

    def contract(b: pa.Table) -> pa.Table:
        """LOCAL CONTRACTION (the standard CC accelerator): union-find
        over this block's edges alone, replacing them with star edges
        node→local-root (root = the local component's min id). Pure
        per-block compute, no coordination; every path that co-resides
        in one block collapses to depth 1 BEFORE any shuffle, so the
        global iteration count drops from the raw graph's diameter to
        the cross-block diameter (a one-block graph converges in one
        verification round). Also compresses: ≤ one star edge per
        distinct node instead of one per input pair."""
        a = b[col_a].to_numpy(zero_copy_only=False).astype(np.int64)
        c = b[col_b].to_numpy(zero_copy_only=False).astype(np.int64)
        t = _driver_union_find(a, c)   # union by MIN id → root = min
        ids = t["node"].to_numpy()
        roots = t["label"].to_numpy()
        return pa.table({
            "node": np.concatenate([ids, roots]),
            "nbr": np.concatenate([roots, ids]),
        })

    # Per-block-contracted star edges, both directions; materialized
    # once — every iteration streams the same blocks instead of
    # re-reading pairs.
    edges = pairs.map_batches(contract, batch_format="pyarrow").materialize()
    # Size blocks to the DATA: the pair pipeline hands over dozens of
    # near-empty blocks, and every iteration re-launches one task per
    # block per stage (measured ~4.5 s/iteration of pure scheduling for
    # a 300-edge graph at 32 CPUs). One 64Ki-row block per ~64Ki edges.
    n_edge_rows = edges.count()

    # SMALL-GRAPH FAST PATH (the broadcast-join-style size cutover):
    # per-block contraction already shrank the graph to ≤ 2 star edges
    # per distinct node, so n_edge_rows ≤ small_threshold bounds the
    # driver pull at ~4 MB of int64 pairs — finishing with one local
    # union-find there replaces 2+ all-to-all shuffles per iteration
    # whose cost is pure task-launch overhead at this size (measured
    # ~10 s for a <1k-edge graph at 32 CPUs). Graphs above the
    # threshold take the iterative distributed path below, which never
    # materializes more than (node, label) pairs per bucket.
    if n_edge_rows <= small_threshold:
        star = edges.to_pandas()
        if star.empty:
            return rd.from_arrow(pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "cluster_id": pa.array([], pa.int64())}))
        t = _driver_union_find(star["node"].to_numpy(dtype=np.int64),
                               star["nbr"].to_numpy(dtype=np.int64))
        return rd.from_arrow(pa.table({"doc_id": t["node"],
                                       "cluster_id": t["label"]}))

    target_blocks = int(max(1, min(64, n_edge_rows // 65536 + 1)))
    if edges.num_blocks() > 2 * target_blocks:
        edges = edges.repartition(target_blocks).materialize()

    def init_labels(b: pd.DataFrame) -> pd.DataFrame:
        d = b[["node"]].drop_duplicates().copy()
        d["label"] = d["node"]
        return d

    labels = edges.map_batches(init_labels,
                               batch_format="pandas").materialize()
    n_nodes = labels.count()
    if n_nodes == 0:
        return rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                       "cluster_id": pa.array([], pa.int64())}))
    # Buckets scale with the graph: every iteration pays 2 all-to-alls,
    # and a 64-way shuffle of a 100-node label set is pure task-launch
    # overhead (measured ~5 s/iteration at sf0.01 for <100 edges).
    n_buckets = int(min(n_buckets, max(2, n_nodes // 4096)))
    if labels.num_blocks() > 2 * target_blocks:
        labels = labels.repartition(target_blocks).materialize()

    from .relational import bucketed_join, preagg_reduce

    def to_offer(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": b["nbr"].to_numpy(),
                             "label": b["label"].to_numpy()})

    def pointer_edges(b: pd.DataFrame) -> pd.DataFrame:
        # pointer doubling: an edge (label_u -> u) makes u receive
        # label(label_u) in the SAME offer join, so convergence is
        # O(log diameter) instead of O(diameter) — no extra shuffle,
        # just |labels| more rows in the join input
        return pd.DataFrame({"node": b["label"].to_numpy(),
                             "nbr": b["node"].to_numpy()})

    prev_sum = None
    converged = False
    for _ in range(max_iters):
        # Offers: co-locate each node's label with its outgoing edges
        # (one bucketed join shuffle), emit (nbr, label); then each
        # node takes the min over its own label and every offer.
        dyn = labels.map_batches(pointer_edges, batch_format="pandas")
        joined = bucketed_join(edges.union(dyn), labels, on="node",
                               n_buckets=n_buckets, how="inner")
        offers = joined.map_batches(to_offer, batch_format="pandas")
        labels = preagg_reduce(labels.union(offers), ["node"], "label",
                               how="min", n_buckets=n_buckets).materialize()
        cur_sum = int(labels.sum("label"))
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # returning part-propagated labels would silently split
        # components (duplicates survive dedup) — fail loudly instead
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} "
            "iterations (cross-block diameter exceeds max_iters); "
            "raise max_iters")

    return labels.map_batches(
        lambda b: pa.table({"doc_id": b["node"], "cluster_id": b["label"]}),
        batch_format="pyarrow")


def _driver_pagerank(src: np.ndarray, dst: np.ndarray, damping: float,
                     iters: int) -> pa.Table:
    """Power iteration over an edge list small enough for the driver
    (the same size cutover as ``connected_components``). Vectorized:
    per-iteration contribution scatter via ``np.add.at``."""
    nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    n = len(nodes)
    s, d = inv[:len(src)], inv[len(src):]
    deg = np.zeros(n, dtype=np.int64)
    np.add.at(deg, s, 1)
    rank = np.full(n, 1.0 / n)
    for _ in range(iters):
        dang = rank[deg == 0].sum()
        contrib = np.zeros(n)
        np.add.at(contrib, d, rank[s] / deg[s])
        rank = (1.0 - damping) / n + damping * (contrib + dang / n)
    return pa.table({"node": nodes, "rank": rank})


def pagerank(edges: rd.Dataset, damping: float = 0.85, iters: int = 5,
             n_buckets: int = 64,
             small_threshold: int = 1 << 18) -> rd.Dataset:
    """Fixed-iteration PageRank over a directed edge list
    ``(src, dst)`` — the crawl-native ranking (which pages matter in a
    link graph). Dangling mass (nodes with no out-edges) is
    redistributed uniformly each iteration, so total rank mass stays
    exactly 1; rank of a node with no in-links converges to the
    teleport floor plus its dangling share.

    Scale shape: degrees and the node universe are built once with
    bucketed partial aggregates; each iteration is ONE big bucketed
    join (ranks ⋈ edges on src — moves (node, rank, deg) pairs and
    edges, never payloads), one bucketed sum-reduce of the
    contributions, one small left join back to the static node list,
    and one streaming scalar (the dangling mass). Ranks — the only
    cross-iteration state — are materialized per iteration, a
    2-column dataset. Below ``small_threshold`` edges, a driver
    power iteration replaces ~4 shuffles/iteration of task-launch
    overhead (same cutover argument as ``connected_components``)."""
    from .relational import bucketed_join, preagg_reduce

    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()),
                                       "rank": pa.array([], pa.float64())}))
    if n_edges <= small_threshold:
        df = edges.to_pandas()
        return rd.from_arrow(_driver_pagerank(
            df["src"].to_numpy(dtype=np.int64),
            df["dst"].to_numpy(dtype=np.int64), damping, iters))

    # static: out-degree per src, and the distinct node universe
    deg = preagg_reduce(
        edges.map_batches(lambda b: pd.DataFrame({"node": b["src"]}),
                          batch_format="pandas"),
        ["node"], "deg", "count", n_buckets=n_buckets)

    def all_nodes(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": pd.unique(np.concatenate(
            [b["src"].to_numpy(dtype=np.int64),
             b["dst"].to_numpy(dtype=np.int64)]))})

    nodes = preagg_reduce(
        edges.map_batches(all_nodes, batch_format="pandas")
        .map_batches(lambda b: b.assign(one=np.int64(1)),
                     batch_format="pandas"),
        ["node"], "one", "min", n_buckets=n_buckets)
    base = bucketed_join(nodes, deg, on="node",
                         n_buckets=n_buckets, how="left")

    def init(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node": b["node"].to_numpy(dtype=np.int64),
            "deg": b["deg"].fillna(0).to_numpy(dtype=np.int64)})

    base = base.map_batches(init, batch_format="pandas").materialize()
    n_nodes = base.count()

    ranks = base.map_batches(
        lambda b: b.assign(rank=1.0 / n_nodes), batch_format="pandas"
    ).materialize()

    def to_src_rank(b: pd.DataFrame) -> pd.DataFrame:
        # only rank-carrying srcs matter for the edge join; deg > 0 by
        # construction for every src
        keep = b[b["deg"] > 0]
        return pd.DataFrame({"node": keep["node"].to_numpy(),
                             "share": keep["rank"].to_numpy()
                             / keep["deg"].to_numpy()})

    for _ in range(iters):
        dang = float(ranks.map_batches(
            lambda b: pd.DataFrame(
                {"d": [float(b.loc[b["deg"] == 0, "rank"].sum())]}),
            batch_format="pandas").sum("d"))
        shares = ranks.map_batches(to_src_rank, batch_format="pandas")
        ej = bucketed_join(
            edges.map_batches(lambda b: pd.DataFrame(
                {"node": b["src"], "dst": b["dst"]}),
                batch_format="pandas"),
            shares, on="node", n_buckets=n_buckets, how="inner")
        contribs = ej.map_batches(
            lambda b: pd.DataFrame({"node": b["dst"].to_numpy(),
                                    "contrib": b["share"].to_numpy()}),
            batch_format="pandas")
        agg = preagg_reduce(contribs, ["node"], "contrib", how="sum",
                            n_buckets=n_buckets)
        joined = bucketed_join(base, agg, on="node",
                               n_buckets=n_buckets, how="left")

        def renew(b: pd.DataFrame) -> pd.DataFrame:
            c = b["contrib"].fillna(0.0).to_numpy(dtype=np.float64)
            return pd.DataFrame({
                "node": b["node"].to_numpy(dtype=np.int64),
                "deg": b["deg"].to_numpy(dtype=np.int64),
                "rank": (1.0 - damping) / n_nodes
                        + damping * (c + dang / n_nodes)})

        ranks = joined.map_batches(renew, batch_format="pandas").materialize()

    return ranks.map_batches(
        lambda b: pa.table({"node": b["node"], "rank": b["rank"]}),
        batch_format="pyarrow")
