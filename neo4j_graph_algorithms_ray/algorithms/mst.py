"""Minimum spanning tree / forest.

Reference parity (algo/.../impl/MSTPrim.java:46-70, SURVEY.md §2.4):
`algo.mst` is *sequential* Prim from a start node over the undirected
weighted graph, reporting min/max/sum weight stats and the MST edges.
We provide Prim for parity (driver-side, oracle scale — sequential in
the reference too) and **distributed Borůvka** as the scale path
(SURVEY.md §2.4 mst row: per-component min edge + contraction, each
round one groupby(component).min + a WCC-style pointer-jump), which
yields the same forest weight on distinct-weight graphs.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa

from neo4j_graph_algorithms_ray.graph import GraphTables


def mst_prim(g: GraphTables, start_node) -> dict:
    """Prim from ``start_node`` → {"edges": DataFrame(src,dst,weight),
    "weight_sum","weight_min","weight_max"} over the reachable
    component. ``g`` must be built undirected + weighted."""
    from neo4j_graph_algorithms_ray.algorithms.sssp import _driver_adjacency, _to_vid
    offsets, dsts, ws = _driver_adjacency(g, weighted=True)
    svid = _to_vid(g, start_node)
    n = g.num_vertices
    in_tree = np.zeros(n, dtype=bool)
    in_tree[svid] = True
    pq = []
    for i in range(offsets[svid], offsets[svid + 1]):
        heapq.heappush(pq, (ws[i], svid, int(dsts[i])))
    out_s, out_d, out_w = [], [], []
    while pq:
        w, u, v = heapq.heappop(pq)
        if in_tree[v]:
            continue
        in_tree[v] = True
        out_s.append(u)
        out_d.append(v)
        out_w.append(w)
        for i in range(offsets[v], offsets[v + 1]):
            t = int(dsts[i])
            if not in_tree[t]:
                heapq.heappush(pq, (ws[i], v, t))
    vmap = g.vid_to_node_map()
    df = pd.DataFrame({
        "src": [vmap[int(u)].as_py() for u in out_s],
        "dst": [vmap[int(v)].as_py() for v in out_d],
        "weight": out_w,
    })
    wsum = float(np.sum(out_w)) if out_w else 0.0
    return {"edges": df, "weight_sum": wsum,
            "weight_min": float(np.min(out_w)) if out_w else 0.0,
            "weight_max": float(np.max(out_w)) if out_w else 0.0,
            "effective_node_count": int(in_tree.sum())}


_PICK_SCHEMA = pa.schema([("comp", pa.int64()), ("ocomp", pa.int64()),
                          ("weight", pa.float64()), ("src", pa.int64()),
                          ("dst", pa.int64())])


def _min_per_comp(comp, ocomp, w, s, d) -> pa.Table:
    """Cheapest row per ``comp`` under the deterministic
    (weight, src, dst) tie-break — the Borůvka map-side combiner."""
    order = np.lexsort((d, s, w))
    first = np.unique(comp[order], return_index=True)[1]
    idx = order[first]
    return pa.table({"comp": comp[idx].astype(np.int64),
                     "ocomp": ocomp[idx].astype(np.int64),
                     "weight": w[idx].astype(np.float64),
                     "src": s[idx].astype(np.int64),
                     "dst": d[idx].astype(np.int64)}, schema=_PICK_SCHEMA)


def msf_boruvka(g: GraphTables, *, max_rounds: int = 64,
                driver_limit: int = 5_000_000) -> dict:
    """Distributed Borůvka minimum spanning forest. The edge table never
    leaves the cluster: each round the component vector is broadcast
    once (``ray.put``; same broadcast regime as build_graph — shard it
    past BROADCAST_VERTEX_LIMIT), every block emits its per-component
    cheapest live edge (map-side combine), partials tree-reduce
    (coalesce + re-combine) until ≤ ``driver_limit`` rows, and only the
    picked pairs (≤ #components) are unioned on the driver (union-find
    + pointer-jump). Returns forest weight + edge count; exact on
    distinct-weight graphs (ties broken by (weight, src, dst)).
    Reference parity: SURVEY.md §2.4 `algo.mst` scale mapping
    (MSTPrim.java:46-70 is the sequential oracle)."""
    import ray

    n = g.num_vertices
    comp = np.arange(n, dtype=np.int64)
    total, nedges = 0.0, 0
    empty = _PICK_SCHEMA.empty_table()

    def _combine(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        return _min_per_comp(
            batch.column("comp").to_numpy(zero_copy_only=False),
            batch.column("ocomp").to_numpy(zero_copy_only=False),
            batch.column("weight").to_numpy(zero_copy_only=False),
            batch.column("src").to_numpy(zero_copy_only=False),
            batch.column("dst").to_numpy(zero_copy_only=False))

    for _ in range(max_rounds):
        ref = ray.put(comp)

        def _partial(batch: pa.Table, _ref=ref) -> pa.Table:
            c = ray.get(_ref)
            s = batch.column("src").to_numpy(zero_copy_only=False)
            d = batch.column("dst").to_numpy(zero_copy_only=False)
            w = (batch.column("weight").to_numpy(zero_copy_only=False)
                 if "weight" in batch.column_names
                 else np.ones(len(s), dtype=np.float64))
            cs, cd = c[s], c[d]
            live = cs != cd
            if not live.any():
                return empty
            return _min_per_comp(cs[live], cd[live], w[live],
                                 s[live], d[live])

        parts = g.edges.map_batches(_partial, batch_format="pyarrow",
                                    batch_size=None).materialize()
        while parts.count() > driver_limit and parts.num_blocks() > 1:
            parts = parts.repartition(max(1, parts.num_blocks() // 4)) \
                         .map_batches(_combine, batch_format="pyarrow",
                                      batch_size=None).materialize()
        batches = list(parts.iter_batches(batch_format="pyarrow",
                                          batch_size=1 << 22))
        tbl = pa.concat_tables(batches) if batches else empty
        if tbl.num_rows == 0:
            break
        picked = _combine(tbl)
        ls_f = picked.column("comp").to_numpy(zero_copy_only=False)
        ld_f = picked.column("ocomp").to_numpy(zero_copy_only=False)
        pick_w = picked.column("weight").to_numpy(zero_copy_only=False)
        # each chosen edge merges two components; dedupe pair picks
        a = np.minimum(ls_f, ld_f)
        b = np.maximum(ls_f, ld_f)
        key = a * np.int64(n) + b
        uniq, ui = np.unique(key, return_index=True)
        # union the picked pairs with a real union-find: several pairs can
        # share an endpoint component (a<-b and a<-c), so a one-shot fancy
        # assignment would keep only the last write and double-count the
        # re-picked edge's weight next round. Pairs ≤ #components per
        # round, so this driver loop is cheap.
        parent = np.arange(n, dtype=np.int64)

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for pi in ui:
            ra, rb = find(int(a[pi])), find(int(b[pi]))
            if ra != rb:
                # min-label union keeps component ids canonical
                lo_r, hi_r = (ra, rb) if ra < rb else (rb, ra)
                parent[hi_r] = lo_r
                total += float(pick_w[pi])
                nedges += 1
        for _ in range(64):
            nxt = parent[parent]
            if np.array_equal(nxt, parent):
                break
            parent = nxt
        comp = parent[comp]
    return {"weight_sum": total, "edge_count": nedges,
            "components": int(len(np.unique(comp)))}


def getting_started(g: GraphTables) -> bool:
    """algo.gettingStarted parity (GettingStarted.java:30-40): does any
    relationship exist."""
    return g.num_edges > 0
