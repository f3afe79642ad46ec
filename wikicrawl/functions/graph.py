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
import pyarrow.compute as pc

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


# ------------------------------------------------------------------ PageRank

PR_SCALE = 1_000_000_000_000  # rank mass in pico units (exact over 5 iters)
PR_ITERS = 5
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # damping 0.85 as the exact rational


def pagerank(edges_ds, src: str = "src", dst: str = "dst",
             n_buckets: int = 16, iters: int = PR_ITERS,
             driver_limit_nodes: int = 4_000_000,
             force_distributed: bool = False):
    """Integer-exact damped PageRank over a directed edge list, the
    link-analysis counterpart of :func:`connected_components` (the
    reference ranks pages by crawl family precedence and frequency
    reports — SURVEY §2.7/§2.8; at corpus scale link-graph centrality is
    the standard ordering signal).

    Exact-arithmetic contract (mirrored verbatim by the unrolled SQL
    twin, the q23 k-means precedent): ranks live in PR_SCALE pico units;
    with n = |nodes|, D_t = sum of ranks of out-degree-0 (dangling)
    nodes, and deg(u) = out-degree,

        r_0(v)     = PR_SCALE // n
        contrib(u) = r_t(u) // deg(u)
        r_{t+1}(v) = (15 * PR_SCALE) // (100 * n)
                     + (85 * (sum_in(v) + D_t // n)) // 100

    every operation an int64 floor-divide of non-negative values, so
    5 iterations are bit-reproducible on both engines.

    Size-switched like :func:`connected_components`, because the
    per-round STATE is one row per node while the edge table is the big
    side:

    - **Broadcast path** (n <= driver_limit_nodes): the rank vector is
      ``ray.put`` once per round and every round is ONE map_batches pass
      over the STATICALLY partitioned edge table — per batch, a
      searchsorted rank lookup, contrib = r // d, and a pre-aggregated
      per-dst partial sum (the combine-before-groupby rule), so the
      driver reduce sees O(distinct dst x blocks) rows, never the edge
      count. Zero per-round shuffles of the edges. Measured: the
      all-distributed loop re-sorted the 600k-edge table twice per round
      (15-27 s/round at sf0.1); this path runs the same round in ~0.5 s.
    - **Distributed path** (bigger graphs, or ``force_distributed`` —
      parity-tested equal): per round, shuffle #1 co-partitions (ranks,
      edges) by hash(src), emits per-edge contributions + ONE dangling
      partial row per bucket; shuffle #2 co-partitions (nodes, contribs)
      by hash(dst) and applies the formula. Edges and ranks are
      repartitioned to n_buckets blocks before each round's sort (the
      block-count discipline from the connected-components lesson).
      Partitioning assumption: one bucket's edges fit one worker's heap;
      salt hot dst keys upstream if a node's in-degree is corpus-sized."""
    import ray
    import ray.data as rd

    from wikicrawl.functions.joins import bucket_of

    # ---- static sides, built once: distinct edges + out-degree, nodes
    def tag_edges(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": t[src], "dst": t[dst],
            "__b": pa.array(bucket_of(t[src], n_buckets)),
        })

    def dedup_deg(g: pd.DataFrame) -> pd.DataFrame:
        e = g[["src", "dst"]].drop_duplicates()
        d = e.groupby("src", sort=False)["dst"].transform("size")
        return pd.DataFrame({
            "src": e["src"].to_numpy(np.int64),
            "dst": e["dst"].to_numpy(np.int64),
            "d": d.to_numpy(np.int64),
            "__b": bucket_of(e["src"].to_numpy(np.int64), n_buckets),
            "__side": np.ones(len(e), dtype=np.int8),
        })

    edges = (edges_ds.map_batches(tag_edges, batch_format="pyarrow")
             .groupby("__b").map_groups(dedup_deg, batch_format="pandas")
             .materialize())

    def emit_nodes(t: pa.Table) -> pa.Table:
        v = np.unique(np.concatenate([
            t["src"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)]))
        return pa.table({
            "node": pa.array(v),
            "__b": pa.array(bucket_of(v, n_buckets)),
            "__side": pa.array(np.zeros(len(v), dtype=np.int8)),
        })

    def uniq_nodes(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates("node")[["node", "__b", "__side"]]

    # nodes derive from the MATERIALIZED edge table (running them off
    # edges_ds would re-execute the whole upstream lineage a second time)
    nodes = (edges.map_batches(emit_nodes, batch_format="pyarrow")
             .groupby("__b").map_groups(uniq_nodes, batch_format="pandas")
             .materialize())
    n = nodes.count()

    if not force_distributed and n <= driver_limit_nodes:
        return _pagerank_broadcast(edges, nodes, n, iters)

    # ---- r0: one row per node, partitioned like nodes
    def init_rank(t: pa.Table) -> pa.Table:
        m = t.num_rows
        return pa.table({
            "node": t["node"],
            "r": pa.array(np.full(m, PR_SCALE // n, dtype=np.int64)),
            "__b": t["__b"],
            "__side": pa.array(np.zeros(m, dtype=np.int8)),
        })

    ranks = nodes.map_batches(init_rank, batch_format="pyarrow").materialize()

    edge_schema = pa.schema([
        ("node", pa.int64()), ("r", pa.int64()), ("src", pa.int64()),
        ("dst", pa.int64()), ("d", pa.int64()), ("__b", pa.int64()),
        ("__side", pa.int8()),
    ])

    def pad(t: pa.Table) -> pa.Table:
        cols = [t[c] if c in t.column_names
                else pa.nulls(t.num_rows, type=edge_schema.field(c).type)
                for c in edge_schema.names]
        return pa.table(cols, names=list(edge_schema.names))

    edges_p = (edges.map_batches(pad, batch_format="pyarrow")
               .repartition(n_buckets).materialize())

    for _ in range(iters):
        ranks_p = ranks.map_batches(pad, batch_format="pyarrow")

        def contrib_bucket(g: pd.DataFrame) -> pd.DataFrame:
            # union-padded int64 columns carry nulls from the other side,
            # so pandas upcasts them to float64 — values stay <= PR_SCALE
            # (2^40), far inside float64's 2^53 exact-integer range, and
            # every use below converts back to int64 before arithmetic
            rk = g[g["__side"] == 0]
            ed = g[g["__side"] == 1]
            m = ed.merge(
                rk[["node", "r"]].rename(columns={"node": "src"}),
                on="src", how="left", suffixes=("", "_rk"))
            # srcs are a subset of nodes by construction -> no NaN here
            contrib = (m["r_rk"].to_numpy(np.int64)
                       // m["d"].to_numpy(np.int64))
            dang = np.int64(
                rk.loc[~rk["node"].isin(ed["src"]), "r"].sum())
            out_dst = np.concatenate([m["dst"].to_numpy(np.int64),
                                      np.array([-1], dtype=np.int64)])
            out_s = np.concatenate([contrib, np.array([dang],
                                                      dtype=np.int64)])
            return pd.DataFrame({"dst": out_dst, "s": out_s})

        contribs = (ranks_p.union(edges_p).groupby("__b")
                    .map_groups(contrib_bucket, batch_format="pandas")
                    .materialize())
        # dangling mass: n_buckets partial rows, reduced by a distributed
        # filter + sum (the edge-sized contrib table never hits the driver)
        d_mass = int(
            contribs.map_batches(
                lambda t: t.filter(
                    pc.equal(t["dst"], pa.scalar(-1, pa.int64()))),
                batch_format="pyarrow",
            ).sum("s") or 0)
        base = (15 * PR_SCALE) // (100 * n)
        share = d_mass // n

        def tag_contrib(t: pa.Table) -> pa.Table:
            mask = pc.not_equal(t["dst"], pa.scalar(-1, pa.int64()))
            t = t.filter(mask)
            return pa.table({
                "node": t["dst"], "s": t["s"],
                "__b": pa.array(bucket_of(t["dst"], n_buckets)),
                "__side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
            })

        def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
            nd = g[g["__side"] == 0][["node", "__b"]]
            inc = (g[g["__side"] == 1].groupby("node", sort=False)["s"]
                   .sum().rename("inc").reset_index())
            m = nd.merge(inc, on="node", how="left")
            iv = m["inc"].fillna(0).to_numpy(np.int64)
            r_new = base + (PR_DAMP_NUM * (iv + share)) // PR_DAMP_DEN
            return pd.DataFrame({
                "node": m["node"].to_numpy(np.int64),
                "r": r_new.astype(np.int64),
                "__b": m["__b"].to_numpy(np.int64),
                "__side": np.zeros(len(m), dtype=np.int8),
            })

        def nodes_as_is(t: pa.Table) -> pa.Table:
            return pa.table({
                "node": t["node"],
                "s": pa.nulls(t.num_rows, pa.int64()),
                "__b": t["__b"], "__side": t["__side"],
            })

        ranks = (nodes.map_batches(nodes_as_is, batch_format="pyarrow")
                 .union(contribs.map_batches(tag_contrib,
                                             batch_format="pyarrow"))
                 .groupby("__b")
                 .map_groups(rank_bucket, batch_format="pandas")
                 .repartition(n_buckets)   # block-count discipline
                 .materialize())

    def strip(t: pa.Table) -> pa.Table:
        return t.select(["node", "r"])

    return ranks.map_batches(strip, batch_format="pyarrow")


def _pagerank_broadcast(edges, nodes, n: int, iters: int):
    """Broadcast-rank PageRank rounds: driver holds the O(n) rank vector
    (int64, sorted by node id), edges stay statically partitioned in the
    object store; each round = one ``ray.put`` of the vector + one
    map_batches pass emitting per-dst PARTIAL sums. Exact same integer
    contract as the distributed path (parity-tested)."""
    import ray
    import ray.data as rd

    node_arr = np.sort(nodes.select_columns(["node"]).to_pandas()
                       ["node"].to_numpy(np.int64))

    def src_uniq(t: pa.Table) -> pa.Table:
        return pa.table({"s": pa.array(np.unique(
            t["src"].to_numpy(zero_copy_only=False).astype(np.int64)))})

    srcs = np.unique(np.concatenate([
        b["s"].to_numpy(np.int64) for b in
        edges.map_batches(src_uniq, batch_format="pyarrow")
        .iter_batches(batch_format="pandas", batch_size=None)]
        or [np.array([], dtype=np.int64)]))
    # dangling = node has no out-edges
    pos = np.searchsorted(srcs, node_arr)
    pos[pos == len(srcs)] = 0 if len(srcs) else 0
    dangling = (~(srcs[pos] == node_arr) if len(srcs)
                else np.ones(len(node_arr), dtype=bool))

    r = np.full(n, PR_SCALE // n, dtype=np.int64)
    base = (15 * PR_SCALE) // (100 * n)
    for _ in range(iters):
        ref = ray.put((node_arr, r))

        def contrib_partial(t: pa.Table) -> pa.Table:
            na, rv = ray.get(ref)
            s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = t["d"].to_numpy(zero_copy_only=False).astype(np.int64)
            dv = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            c = rv[np.searchsorted(na, s)] // d
            ud, inv = np.unique(dv, return_inverse=True)
            sums = np.zeros(len(ud), dtype=np.int64)
            np.add.at(sums, inv, c)          # int64 pre-aggregation
            return pa.table({"node": pa.array(ud), "s": pa.array(sums)})

        parts = (edges.map_batches(contrib_partial, batch_format="pyarrow")
                 .to_pandas())
        inc_map = parts.groupby("node")["s"].sum()
        inc = np.zeros(n, dtype=np.int64)
        ipos = np.searchsorted(node_arr, inc_map.index.to_numpy(np.int64))
        inc[ipos] = inc_map.to_numpy(np.int64)
        share = int(r[dangling].sum()) // n
        r = base + (PR_DAMP_NUM * (inc + share)) // PR_DAMP_DEN

    out = pa.table({"node": pa.array(node_arr), "r": pa.array(r)})
    return rd.from_arrow(out)


# ------------------------------------------------------------- triangles

def triangle_count(edges_ds, src: str = "id_a", dst: str = "id_b",
                   n_buckets: int = 16):
    """Exact triangle / wedge / edge counts over an undirected edge list
    given with ``src < dst`` per row (the dedup-pair convention). The
    node-iterator formulation with the LOW endpoint as pivot: a triangle
    a < b < c is counted exactly once, as wedge (b, c) pivoted at a and
    closed by edge (b, c).

    Scale shape: shuffle #1 co-partitions edges by hash(src); each
    bucket generates its pivots' wedge pairs vectorized (sorted
    neighbor arrays + repeat/concat index arithmetic — no Python per
    wedge). Wedge volume is sum_a C(deg(a), 2); for near-dup cluster
    graphs (small cliques) this is bounded by cluster_size x edges —
    salt or cap mega-hubs upstream for general graphs (documented
    partitioning assumption). Shuffle #2 co-partitions wedges WITH the
    edge list by hash of the (lo, hi) key and counts closures by a
    per-bucket sorted membership probe. Driver traffic: one int per
    bucket."""
    import ray.data as rd

    from wikicrawl.functions.joins import bucket_of

    def tag_src(t: pa.Table) -> pa.Table:
        return pa.table({
            "a": t[src], "b": t[dst],
            "__b": pa.array(bucket_of(t[src], n_buckets)),
        })

    by_src = (edges_ds.map_batches(tag_src, batch_format="pyarrow")
              .materialize())
    n_edges = by_src.count()

    def key2(x: np.ndarray, y: np.ndarray) -> np.ndarray:
        # order-sensitive 128->64 mix for BUCKETING only (collisions just
        # co-locate; the in-bucket probe compares both columns exactly)
        return (x.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                + y.astype(np.uint64))

    def wedges_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["a", "b"]).sort_values(["a", "b"],
                                                      kind="mergesort")
        a = g["a"].to_numpy(np.int64)
        b = g["b"].to_numpy(np.int64)
        # per-pivot neighbor spans (sorted by b within each a)
        starts = np.r_[0, np.flatnonzero(a[1:] != a[:-1]) + 1]
        ends = np.r_[starts[1:], len(a)]
        lo_parts: list[np.ndarray] = []
        hi_parts: list[np.ndarray] = []
        n_wedges = 0
        for s, e in zip(starts, ends):
            d = e - s
            if d < 2:
                continue
            n_wedges += d * (d - 1) // 2
            nb = b[s:e]
            # all ordered pairs (nb[i], nb[j]) i<j, vectorized
            idx_i = np.repeat(np.arange(d - 1), np.arange(d - 1, 0, -1))
            idx_j = np.concatenate([np.arange(i + 1, d)
                                    for i in range(d - 1)])
            lo_parts.append(nb[idx_i])
            hi_parts.append(nb[idx_j])
        lo = (np.concatenate(lo_parts) if lo_parts
              else np.array([], dtype=np.int64))
        hi = (np.concatenate(hi_parts) if hi_parts
              else np.array([], dtype=np.int64))
        out = pd.DataFrame({
            "lo": np.r_[lo, np.int64(-1)],
            "hi": np.r_[hi, np.int64(-1)],
            "w": np.r_[np.zeros(len(lo), dtype=np.int64),
                       np.int64(n_wedges)],        # sentinel: wedge total
            "is_edge": np.zeros(len(lo) + 1, dtype=np.int8),
        })
        out["__k"] = bucket_of(key2(out["lo"].to_numpy(np.int64),
                                    out["hi"].to_numpy(np.int64)),
                               n_buckets)
        # arrow block, so the union with the arrow probe side stays
        # single-block-type through the closing shuffle; metadata-free
        # schema keeps Ray's schema-unify dedup quiet (the T() lesson)
        return pa.Table.from_pandas(
            out, preserve_index=False).replace_schema_metadata(None)

    wedges = (by_src.groupby("__b")
              .map_groups(wedges_bucket, batch_format="pandas"))

    def edges_as_probe(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "lo": pa.array(a), "hi": pa.array(b),
            "w": pa.array(np.zeros(len(a), dtype=np.int64)),
            "is_edge": pa.array(np.ones(len(a), dtype=np.int8)),
            "__k": pa.array(bucket_of(key2(a, b), n_buckets)),
        })

    def close_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ed = (g[g["is_edge"] == 1][["lo", "hi"]].drop_duplicates())
        wd = g[(g["is_edge"] == 0) & (g["lo"] >= 0)][["lo", "hi"]]
        w_total = np.int64(g["w"].sum())
        # exact two-column membership: inner merge against the deduped
        # edge set — each wedge row whose (lo, hi) is an edge is exactly
        # one triangle (one low pivot per triangle)
        tri = len(wd.merge(ed, on=["lo", "hi"], how="inner"))
        return pd.DataFrame({"w": [w_total], "t": [np.int64(tri)]})

    closed = (wedges
              .union(by_src.map_batches(edges_as_probe,
                                        batch_format="pyarrow"))
              .groupby("__k").map_groups(close_bucket,
                                         batch_format="pandas")
              .to_pandas())
    return int(n_edges), int(closed["w"].sum()), int(closed["t"].sum())


# ------------------------------------------------------------------ k-core

def _kcore_driver(a: np.ndarray, b: np.ndarray, k: int,
                  rounds: int) -> pd.DataFrame:
    """Driver-side exact fixed-round peel over distinct undirected edges
    (a[i] < b[i] not required; pairs are assumed distinct as given)."""
    for _ in range(rounds):
        if len(a) == 0:
            break
        nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
        deg = np.bincount(inv)
        keep = deg >= k
        if keep.all():
            break  # fixpoint: remaining rounds are identity
        mask = keep[inv[: len(a)]] & keep[inv[len(a):]]
        a, b = a[mask], b[mask]
    if len(a) == 0:
        return pd.DataFrame({"node": np.array([], dtype=np.int64),
                             "degree": np.array([], dtype=np.int64)})
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    deg = np.bincount(inv).astype(np.int64)
    return pd.DataFrame({"node": nodes.astype(np.int64), "degree": deg})


def kcore_peel(edges_ds, k: int = 3, rounds: int = 6,
               src: str = "src", dst: str = "dst",
               driver_limit_bytes: int = 256 << 20,
               n_buckets: int = 16,
               force_distributed: bool = False) -> pd.DataFrame:
    """Fixed-round k-core peel of an undirected graph -> DataFrame
    (node, degree) for nodes surviving ``rounds`` peel rounds, with their
    degree over the FINAL edge set.

    Semantics (mirrored verbatim by the unrolled SQL twin): the input is
    a DISTINCT undirected edge list (each edge once, either direction);
    round r computes every node's degree over the current edge set and
    deletes nodes with degree < k together with their incident edges.
    A fixed round count (not run-to-fixpoint) keeps the oracle a finite
    CTE chain; both paths early-exit once a round deletes nothing, which
    changes no output (further rounds are the identity).

    Size-switched like :func:`connected_components`:

    - driver path while the edge list is bounded: vectorized np.unique
      degree counts + boolean masks per round;
    - distributed path: per round ONE bucketed degree count (each
      bidirectional edge row lives in its u-endpoint's hash bucket, so
      per-bucket counts are global) and TWO co-partitioned semi-joins
      (kept nodes against each endpoint). Edges are repartitioned to
      ``n_buckets`` blocks before each materialize (block-count
      discipline: without it iterative unions compound task counts).
      Partitioning assumption: one hash bucket of edges fits a worker's
      heap; salt hot nodes upstream if a single node's degree is
      corpus-sized."""
    import ray.data as rd

    from wikicrawl.functions.joins import bucket_of, hash_join

    # materialize ONCE: size_bytes() on a lazy Dataset executes the plan,
    # and the chosen path would otherwise re-execute the whole upstream
    # lineage a second time (measured 12 s -> ~7 s on the q63 edge build)
    edges_ds = edges_ds.materialize()
    size = edges_ds.size_bytes()
    if (not force_distributed and size is not None
            and size <= driver_limit_bytes):
        e = edges_ds.select_columns([src, dst]).to_pandas()
        return _kcore_driver(e[src].to_numpy(np.int64),
                             e[dst].to_numpy(np.int64), k, rounds)

    def to_bidir(t: pa.Table) -> pa.Table:
        a = t[src].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        u = np.concatenate([a, b])
        v = np.concatenate([b, a])
        return pa.table({"u": pa.array(u), "v": pa.array(v)})

    bidir = (edges_ds.map_batches(to_bidir, batch_format="pyarrow")
             .repartition(n_buckets).materialize())
    n_edges = bidir.count()

    def tag_u(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__b", pa.array(bucket_of(t["u"], n_buckets)))

    def bucket_degrees(g: pd.DataFrame) -> pd.DataFrame:
        nodes, counts = np.unique(g["u"].to_numpy(np.int64),
                                  return_counts=True)
        return pd.DataFrame({"node": nodes, "degree": counts.astype(np.int64)})

    def degrees(ds):
        return (ds.map_batches(tag_u, batch_format="pyarrow")
                .groupby("__b").map_groups(bucket_degrees,
                                           batch_format="pandas"))

    for _ in range(rounds):
        if n_edges == 0:
            break
        def keep_batch(t: pa.Table) -> pa.Table:
            return t.filter(pc.greater_equal(t["degree"], k)).select(["node"])

        # materialize: kept feeds TWO semi-joins — unmaterialized, the
        # degrees groupby lineage would execute twice per round; and an
        # all-peeled round yields an empty dataset whose lazy schema is
        # None, which hash_join cannot pad (ADVICE r4 empty-peel crash)
        kept = (degrees(bidir)
                .map_batches(keep_batch, batch_format="pyarrow")
                .materialize())
        if kept.count() == 0:
            n_edges = 0
            break
        bidir = hash_join(
            bidir,
            kept.map_batches(lambda t: t.rename_columns(["u"]),
                             batch_format="pyarrow"),
            on="u", n_buckets=n_buckets)
        bidir = hash_join(
            bidir,
            kept.map_batches(lambda t: t.rename_columns(["v"]),
                             batch_format="pyarrow"),
            on="v", n_buckets=n_buckets)
        bidir = bidir.repartition(n_buckets).materialize()
        cur = bidir.count()
        if cur == n_edges:
            break  # nothing deleted: fixpoint reached
        n_edges = cur
    if n_edges == 0:
        # every edge peeled away: degrees() on an empty dataset yields a
        # column-less frame and the sort below would KeyError (ADVICE
        # r4); return the same typed empty frame as the driver path
        return pd.DataFrame({"node": np.array([], dtype=np.int64),
                             "degree": np.array([], dtype=np.int64)})
    out = degrees(bidir).to_pandas()
    out = out.sort_values("node").reset_index(drop=True)
    out["node"] = out["node"].astype("int64")
    out["degree"] = out["degree"].astype("int64")
    return out
