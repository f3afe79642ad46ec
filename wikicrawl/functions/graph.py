"""Graph operators: connected components over near-dup pair edge lists.

The dedup stages (q16/q17/q19/q22/q24) emit PAIRS; turning pairs into
canonical groups — "keep one document per duplicate CLUSTER" — is
transitive closure, i.e. connected components. The reference performs
per-pair deletes against MySQL (`wikipedia_crawler.py` maintenance
passes); at training-data scale the pair graph must be clustered first
so one canonical survivor is kept per component, not per pair.

Scale design (mirrors the repo's size-switched planner pattern):

- The edge list is the OUTPUT of a dedup pass — orders of magnitude
  smaller than the corpus — so the default path pulls the (bounded)
  pair list to the driver and runs union-find with path compression
  (exact, O(E alpha)).
- When the pair list itself exceeds ``driver_limit_bytes`` (adversarial
  corpora where dup density is high), the distributed path runs
  HASH-MIN label propagation with POINTER-JUMPING shortcuts, entirely
  as Dataset transforms: per round one co-partitioned join of
  (edges, labels) + one join of (labels, labels) + one groupby-min.
  Labels only ever DECREASE, so ``sum(label)`` is a convergence
  certificate — strictly decreasing until fixpoint, equal at fixpoint.
  Dup-pair graphs are near-cliques (diameter 2-3) and the shortcut edge
  ``v -> label[v]`` squares reachable distance each round, so the round
  count is O(log diameter): 3-5 rounds in practice, each a bounded
  shuffle of one row per node in the PAIR graph (not the corpus).

Both paths return the identical (node, cluster_id) assignment —
cluster_id = min node id of the component — and are parity-tested
against each other on the same inputs (tests/test_functions.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Min, Sum


def union_find_components(edges: pd.DataFrame, src: str, dst: str) -> pd.DataFrame:
    """Driver-side exact union-find -> (node, cluster_id), cluster_id =
    component-min node id. Vectorized find via repeated parent gather."""
    a = edges[src].to_numpy()
    b = edges[dst].to_numpy()
    nodes = np.unique(np.concatenate([a, b]))
    idx = {v: i for i, v in enumerate(nodes)}
    parent = np.arange(len(nodes), dtype=np.int64)

    def find(i: int) -> int:
        root = i
        while parent[root] != root:
            root = parent[root]
        while parent[i] != root:  # path compression
            parent[i], i = root, parent[i]
        return root

    for x, y in zip(a, b):
        rx, ry = find(idx[x]), find(idx[y])
        if rx != ry:
            # union by MIN so the root is always the smallest node index
            # (nodes is sorted, so index order == node-id order)
            if rx < ry:
                parent[ry] = rx
            else:
                parent[rx] = ry
    roots = np.array([find(i) for i in range(len(nodes))])
    return pd.DataFrame({"node": nodes, "cluster_id": nodes[roots]})


def _label_prop_components(edges_ds, src: str, dst: str, n_buckets: int,
                           max_rounds: int) -> pd.DataFrame:
    """Distributed hash-min + pointer-jumping label propagation.

    Partitioning assumption: one hash bucket of (node, label) rows fits a
    worker's heap — guaranteed by node-cardinality / n_buckets sizing, and
    independent of skew because the key is the node id, not the label."""
    import ray.data as rd

    from wikicrawl.functions.joins import hash_join

    def to_pairs(t: pa.Table) -> pa.Table:
        va = t[src].to_numpy()
        vb = t[dst].to_numpy()
        # both directions + self-loops: the first groupby-min over these
        # IS round 0 of hash-min (label[v] = min(v, neighbors))
        node = np.concatenate([va, vb, va, vb])
        lab = np.concatenate([vb, va, va, vb])
        return pa.table({"node": pa.array(node, pa.int64()),
                         "label": pa.array(lab, pa.int64())})

    # block-count discipline: unions SUM block counts and aggregates keep
    # them, so without an explicit repartition the per-round task count
    # compounds exponentially (measured: 2.5s -> 113s by round 6 on a
    # 300-node graph). One row per node bounds the data; n_buckets blocks
    # bound the scheduling.
    labels = (
        edges_ds.map_batches(to_pairs, batch_format="pyarrow")
        .groupby("node").aggregate(Min("label", alias_name="label"))
        .repartition(n_buckets)
        .materialize()
    )
    def to_bidir(t: pa.Table) -> pa.Table:
        va = t[src].to_numpy().astype(np.int64)
        vb = t[dst].to_numpy().astype(np.int64)
        return pa.table({"peer": pa.array(np.concatenate([va, vb]), pa.int64()),
                         "node": pa.array(np.concatenate([vb, va]), pa.int64())})

    edges = edges_ds.map_batches(to_bidir, batch_format="pyarrow").materialize()

    def _sum(ds) -> int:
        return ds.aggregate(Sum("label", alias_name="s"))["s"]

    def to_shortcuts(t: pa.Table) -> pa.Table:
        # pointer-jump edges (label[v] -> v): joining them against labels
        # yields (v, label[label[v]]), squaring path length per round
        return pa.table({"peer": t["label"], "node": t["node"]})

    prev_sum = _sum(labels)
    for _ in range(max_rounds):
        # ONE join per round: real edges and shortcut edges share the same
        # right side (labels keyed by node id), so their union joins once —
        # output rows are (v, label[u]) messages AND (v, label[label[v]])
        # jumps together
        left = edges.union(
            labels.map_batches(to_shortcuts, batch_format="pyarrow"))
        msgs = hash_join(
            left, labels.map_batches(
                lambda t: t.rename_columns(["peer", "label"]),
                batch_format="pyarrow"),
            on="peer", n_buckets=n_buckets,
        ).select_columns(["node", "label"])
        labels = (
            labels.union(msgs)
            .groupby("node").aggregate(Min("label", alias_name="label"))
            .repartition(n_buckets)
            .materialize()
        )
        cur = _sum(labels)
        if cur == prev_sum:  # labels only decrease: equal sum == fixpoint
            break
        prev_sum = cur
    else:
        raise RuntimeError(
            f"label propagation did not converge in {max_rounds} rounds")
    out = labels.to_pandas()
    return out.rename(columns={"label": "cluster_id"})


def connected_components(edges_ds, src: str = "id_a", dst: str = "id_b",
                         driver_limit_bytes: int = 256 << 20,
                         n_buckets: int = 16, max_rounds: int = 64,
                         force_distributed: bool = False) -> pd.DataFrame:
    """Connected components of an undirected pair list -> DataFrame
    (node, cluster_id) sorted by node; cluster_id = min node id of the
    component. Size-switched: driver union-find while the PAIR list is
    bounded, hash-min label propagation when it is not."""
    size = edges_ds.size_bytes()
    if (not force_distributed and size is not None
            and size <= driver_limit_bytes):
        edges = edges_ds.select_columns([src, dst]).to_pandas()
        out = union_find_components(edges, src, dst)
    else:
        out = _label_prop_components(edges_ds, src, dst, n_buckets,
                                     max_rounds)
    out = out.sort_values("node").reset_index(drop=True)
    out["node"] = out["node"].astype("int64")
    out["cluster_id"] = out["cluster_id"].astype("int64")
    return out
