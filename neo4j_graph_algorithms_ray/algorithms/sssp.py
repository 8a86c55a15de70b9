"""Shortest paths: SSSP relaxation, single-pair Dijkstra, all-pairs.

Reference parity (SURVEY.md §2.4):
- ``algo.shortestPath.deltaStepping`` (ShortestPathDeltaStepping.java:46-70):
  parallel bucketed SSSP. In BSP form the buckets degenerate into
  synchronous relaxation rounds — each superstep relaxes every edge
  whose source distance is finite, receivers keep elementwise minima
  (state/shards.py ``relax``/``relax_update``); fixpoint when no
  distance changes. Same min-plus fixpoint, deterministic.
- ``algo.shortestPath`` (ShortestPathDijkstra.java:47-120): sequential
  src→dst Dijkstra returning the path node sequence + cost. Sequential
  in the reference too — we run it driver-side over a fetched edge
  list (oracle scale only, as documented there).
- ``algo.allShortestPaths.stream`` weighted (AllShortestPaths.java:46-63):
  one Dijkstra per source streamed through a bounded queue → our
  per-source task parallelism: ``map_batches`` over a sources Dataset
  against a broadcast CSR (``ray.put`` once, read per task).
  Unweighted all-pairs = msbfs.msbfs_hop_counts.
"""

from __future__ import annotations

import heapq
import os
import time
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from neo4j_graph_algorithms_ray.algorithms.common import (
    IterativeResult, attach_node_ids, get_engine)
from neo4j_graph_algorithms_ray.graph import GraphTables


def sssp_delta_stepping(
    g: GraphTables,
    source,
    *,
    delta: Optional[float] = None,
    num_partitions: Optional[int] = None,
    max_iterations: int = 10_000,
    node_col: str = "node",
    mode: str = "bucketed",
) -> IterativeResult:
    """Distances from ``source`` (original id) → (node, distance);
    unreachable nodes get +inf. Uses edge weights when the graph was
    built with a weight column, else hop counts.

    ``mode="bucketed"`` (default) runs real delta-stepping
    (ShortestPathDeltaStepping.java:46-70): vertices settle in distance
    buckets of width Δ; LIGHT edges (w ≤ Δ) relax iteratively inside the
    current bucket, HEAVY edges (w > Δ) exactly once per settled bucket
    — on wide weight ranges this relaxes far fewer edges than
    synchronous rounds, because a vertex's heavy out-edges fire only
    after its distance is final. ``delta=None`` auto-picks the mean
    edge weight (1.0 hop on unweighted graphs, where buckets degenerate
    to BFS levels). ``mode="sync"`` keeps the frontier-sparse
    synchronous relaxation (same fixpoint; used as the comparison
    baseline in tests). Distances are bit-identical between modes:
    relaxation order never changes a path's float sum, and the fixpoint
    is the min over the same path-sum set."""
    eng = get_engine(g, num_partitions, weighted=g.weighted)
    svid = _to_vid(g, source)
    eng.init_state("dist", "const", np.inf)
    eng.set_state_from_table("dist", np.array([svid], dtype=np.int64),
                             np.array([0.0]))
    # frontier mask: only the source is "changed" before round 1, so
    # each round relaxes exactly the frontier
    eng.init_state("changed", "const", 0, dtype="int8")
    eng.set_state_from_table("changed", np.array([svid], dtype=np.int64),
                             np.array([1], dtype=np.int8))
    metrics, it, converged = [], 0, False
    t0 = time.perf_counter()
    buckets_done = 0
    if mode == "sync":
        while it < max_iterations:
            stats = eng.step("relax", "relax_update",
                             update_kw={"track_changed": True})
            it += 1
            if sum(s["changed"] for s in stats) == 0:
                converged = True
                break
    elif mode == "bucketed":
        if delta is None:
            mean_w, _ = eng.mean_max_weight()
            delta = mean_w if mean_w > 0 else 1.0
        bucket = 0
        while it < max_iterations:
            lo, hi = bucket * delta, (bucket + 1) * delta
            # light phase: members of bucket i relax light edges until
            # the bucket settles (improvements can pull new vertices
            # DOWN into this bucket — they join the next inner round)
            eng.apply_state("changed", "ge_lt", "dist", lo, hi, dtype="int8")
            while it < max_iterations and eng.state_sum("changed") > 0:
                eng.step("relax", "relax_update",
                         scatter_kw={"wclass": "light", "delta": delta},
                         update_kw={"track_changed": True})
                it += 1
                eng.apply_state("__inb", "ge_lt", "dist", lo, hi, dtype="int8")
                eng.apply_state("changed", "and_pos", "changed", "__inb",
                                dtype="int8")
            # heavy phase: every settled member fires its heavy edges
            # exactly once (targets land in strictly later buckets)
            eng.apply_state("changed", "ge_lt", "dist", lo, hi, dtype="int8")
            if eng.state_sum("changed") > 0:
                eng.step("relax", "relax_update",
                         scatter_kw={"wclass": "heavy", "delta": delta},
                         update_kw={"track_changed": False})
                it += 1
            buckets_done += 1
            nxt = eng.state_min_above("dist", hi)
            if not np.isfinite(nxt):
                converged = True
                break
            bucket = int(nxt // delta)
            # float corner: if fl((b+1)*delta) rounded below the true
            # product, nxt == hi of its own bucket and ge_lt [lo,hi)
            # would exclude it forever — force progress to the bucket
            # that actually contains nxt under the rounded bound
            if (bucket + 1) * delta <= nxt:
                bucket += 1
        eng.drop_states(["__inb"])
    else:
        raise ValueError(f"mode must be bucketed/sync, got {mode!r}")
    elapsed = time.perf_counter() - t0
    metrics.append(eng.drain_metrics())
    ds = eng.state_dataset(["dist"]).rename_columns({"dist": "distance"})
    ds = attach_node_ids(g, ds, out_col=node_col)
    stats_out = {"computeSec": elapsed}
    if mode == "bucketed":
        stats_out.update({"delta": delta, "buckets": buckets_done})
    return IterativeResult(dataset=ds, iterations=it, converged=converged,
                           metrics=metrics, stats=stats_out)


def _to_vid(g: GraphTables, node) -> int:
    """One original id → vid via the distributed is_in filter — never
    materializes the vertex table on the driver (works above the
    broadcast vertex limit, unlike the old vid_to_node_map() probe)."""
    from neo4j_graph_algorithms_ray.algorithms.common import node_to_vid_map
    m = node_to_vid_map(g, [node])
    if node not in m:
        raise KeyError(f"node {node!r} not in graph")
    return m[node]


def driver_adjacency_edge_limit() -> int:
    """Max edges _driver_adjacency may pull to the driver (override via
    NGA_DRIVER_ADJ_EDGE_LIMIT). Mirrors vid_to_node_map's broadcast
    guard (graph.py): the single-source oracle paths (Dijkstra/Prim/
    exact betweenness) are legitimate only at oracle scale — above the
    limit a stray call would OOM the driver, so raise and point at the
    distributed equivalents instead."""
    return int(os.environ.get("NGA_DRIVER_ADJ_EDGE_LIMIT", 50_000_000))


def _driver_adjacency(g: GraphTables, weighted: bool):
    """Dense-vid CSR pulled to the driver (oracle-scale paths only).

    Guarded by :func:`driver_adjacency_edge_limit`: callers needing
    scale must use sssp_delta_stepping (SSSP), msf_boruvka (MST) or
    betweenness_bsp (centrality), which keep edges sharded."""
    limit = driver_adjacency_edge_limit()
    if g.num_edges > limit:
        raise RuntimeError(
            f"_driver_adjacency(): {g.num_edges} edges exceeds the driver "
            f"pull limit ({limit}); this path is for oracle-scale graphs "
            "only — use sssp_delta_stepping / msf_boruvka / "
            "betweenness_bsp, which keep the edge table sharded")
    cols = ["src", "dst"] + (["weight"] if weighted and g.weighted else [])
    tbl = pa.concat_tables(g.edges.select_columns(cols)
                           .iter_batches(batch_format="pyarrow", batch_size=1 << 20))
    s = tbl.column("src").to_numpy(zero_copy_only=False)
    d = tbl.column("dst").to_numpy(zero_copy_only=False)
    w = (tbl.column("weight").to_numpy(zero_copy_only=False)
         if "weight" in tbl.column_names else np.ones(len(s)))
    order = np.argsort(s, kind="stable")
    s, d, w = s[order], d[order], w[order]
    offsets = np.searchsorted(s, np.arange(g.num_vertices + 1))
    return offsets, d, w


def _dijkstra_full(g: GraphTables, svid: int, tvid: int = -1):
    """Driver-side Dijkstra from ``svid``; stops early at ``tvid`` if
    given. Returns (dist, prev) over all vids."""
    offsets, dsts, ws = _driver_adjacency(g, weighted=True)
    n = g.num_vertices
    dist = np.full(n, np.inf)
    prev = np.full(n, -1, dtype=np.int64)
    dist[svid] = 0.0
    pq = [(0.0, svid)]
    while pq:
        dcur, u = heapq.heappop(pq)
        if dcur > dist[u]:
            continue
        if u == tvid:
            break
        for i in range(offsets[u], offsets[u + 1]):
            v, nd = dsts[i], dcur + ws[i]
            if nd < dist[v]:
                dist[v], prev[v] = nd, u
                heapq.heappush(pq, (nd, v))
    return dist, prev


def _backtrack(g: GraphTables, svid: int, tvid: int, dist, prev) -> dict:
    if not np.isfinite(dist[tvid]):
        return {"path": [], "cost": float("inf"), "found": False}
    path_vids = []
    cur = tvid
    while cur != -1:
        path_vids.append(cur)
        cur = prev[cur] if cur != svid else -1
    from neo4j_graph_algorithms_ray.algorithms.common import vid_to_node_lookup
    vmap = vid_to_node_lookup(g, path_vids)  # path-length lookups only
    path = [vmap[int(v)] for v in reversed(path_vids)]
    costs = [float(dist[int(v)]) for v in reversed(path_vids)]
    # path determinism (what the SQL oracle mirrors): the heap pops in
    # (dist, vid) order, so prev[v] is set by the FIRST predecessor to
    # reach v's final distance = argmin over {u : dist(u)+w(u,v) =
    # dist(v)} of (dist(u), u)
    return {"path": path, "cost": float(dist[tvid]), "found": True,
            "costs": costs}


def shortest_path_dijkstra(g: GraphTables, source, target) -> dict:
    """Single-pair Dijkstra (algo.shortestPath parity): returns
    {"path": [original ids...], "cost": float, "costs": [...],
    "found": bool}."""
    svid, tvid = _to_vid(g, source), _to_vid(g, target)
    dist, prev = _dijkstra_full(g, svid, tvid)
    return _backtrack(g, svid, tvid, dist, prev)


def shortest_path_to_farthest(g: GraphTables, source) -> dict:
    """Path from ``source`` to its farthest-by-max-vid reachable vertex
    (the max ORIGINAL id among reached vertices — vid order equals
    original-id order): one full Dijkstra, no second pass."""
    svid = _to_vid(g, source)
    dist, prev = _dijkstra_full(g, svid)
    reach = np.nonzero(np.isfinite(dist))[0]
    tvid = int(reach.max())
    return _backtrack(g, svid, tvid, dist, prev)


def all_shortest_paths_weighted(
    g: GraphTables,
    sources: Optional[Sequence] = None,
    *,
    concurrency: int = 4,
    batch_size: int = 8,
) -> rd.Dataset:
    """Weighted all-pairs (AllShortestPaths.java parity): one Dijkstra
    per source, fanned out as an actor-pool ``map_batches`` over a
    sources Dataset against the broadcast CSR. Emits
    (source, target, distance) rows for every reachable pair (distance
    > 0 — self rows omitted like the reference's stream)."""
    offsets, dsts, ws = _driver_adjacency(g, weighted=True)
    adj_ref = ray.put((offsets, dsts, ws))
    vmap_ref = ray.put(g.vid_to_node_map())
    n = g.num_vertices
    if sources is None:
        src_vids = np.arange(n, dtype=np.int64)
    else:
        src_vids = np.array([_to_vid(g, s) for s in sources], dtype=np.int64)
    sources_ds = rd.from_arrow(pa.table({"svid": pa.array(src_vids)})) \
        .repartition(max(concurrency * 2, (len(src_vids) + batch_size - 1) // batch_size))

    class PerSourceDijkstra:
        def __init__(self):
            self.offsets, self.dsts, self.ws = ray.get(adj_ref)
            self.vmap = ray.get(vmap_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            out_s, out_t, out_d = [], [], []
            for svid in batch.column("svid").to_pylist():
                dist = np.full(n, np.inf)
                dist[svid] = 0.0
                pq = [(0.0, svid)]
                while pq:
                    dcur, u = heapq.heappop(pq)
                    if dcur > dist[u]:
                        continue
                    for i in range(self.offsets[u], self.offsets[u + 1]):
                        v, nd = self.dsts[i], dcur + self.ws[i]
                        if nd < dist[v]:
                            dist[v] = nd
                            heapq.heappush(pq, (nd, v))
                reached = np.nonzero(np.isfinite(dist))[0]
                reached = reached[reached != svid]
                out_s.append(np.full(len(reached), svid, dtype=np.int64))
                out_t.append(reached.astype(np.int64))
                out_d.append(dist[reached])
            if not out_s:
                return pa.table({"source": pa.array([], pa.int64()),
                                 "target": pa.array([], pa.int64()),
                                 "distance": pa.array([], pa.float64())})
            s = np.concatenate(out_s)
            t = np.concatenate(out_t)
            return pa.table({"source": self.vmap.take(pa.array(s)),
                             "target": self.vmap.take(pa.array(t)),
                             "distance": pa.array(np.concatenate(out_d))})

    # autoscaling pool (1, N): a fixed-size pool of N can reserve every
    # cluster CPU and starve the upstream repartition → deadlock
    return sources_ds.map_batches(PerSourceDijkstra, batch_format="pyarrow",
                                  batch_size=batch_size,
                                  concurrency=(1, concurrency))
