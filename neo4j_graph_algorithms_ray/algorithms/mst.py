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


def msf_boruvka(g: GraphTables, *, max_rounds: int = 64) -> dict:
    """Distributed-shaped Borůvka minimum spanning forest: each round,
    every component picks its cheapest outgoing edge
    (``groupby(component).min`` — one shuffle) and merges (pointer-jump
    to fixpoint). Returns forest weight + edge count; exact on
    distinct-weight graphs (ties broken by (weight, src, dst))."""
    import pyarrow.compute as pc

    tbl = pa.concat_tables(g.edges.iter_batches(batch_format="pyarrow",
                                                batch_size=1 << 20))
    s = tbl.column("src").to_numpy(zero_copy_only=False)
    d = tbl.column("dst").to_numpy(zero_copy_only=False)
    w = (tbl.column("weight").to_numpy(zero_copy_only=False)
         if "weight" in tbl.column_names else np.ones(len(s)))
    del pc
    n = g.num_vertices
    comp = np.arange(n, dtype=np.int64)
    total, nedges = 0.0, 0
    for _ in range(max_rounds):
        cs, cd = comp[s], comp[d]
        live = cs != cd
        if not live.any():
            break
        ls, ld, lw = cs[live], cd[live], w[live]
        es, ed = s[live], d[live]
        # per-component cheapest outgoing edge (deterministic tie-break)
        order = np.lexsort((ed, es, lw))
        ls_o, ld_o = ls[order], ld[order]
        lw_o = lw[order]
        first = np.unique(ls_o, return_index=True)[1]
        # each chosen edge merges two components; dedupe pair picks
        a = np.minimum(ls_o[first], ld_o[first])
        b = np.maximum(ls_o[first], ld_o[first])
        pick_w = lw_o[first]
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
