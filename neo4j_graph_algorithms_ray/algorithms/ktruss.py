"""k-truss decomposition — the triangle-density community primitive.

The k-truss is the maximal subgraph whose every edge sits in ≥ k-2
triangles of that subgraph (Cohen 2008); beyond the reference's
triangle family (SURVEY §2.4), trusses are the standard "cohesive
web-community core" extraction at link-graph scale.

Ray shape: same two-regime contract as triangle counting
(algorithms/triangles.py). The peel runs in ONE remote worker against
the broadcast canonical edge set (driver only ever holds the object
ref) while edges ≤ the triangles fast-path limit — each peel round is
a rank-oriented wedge closure (reusing `_iter_wedges`/`_probe`) whose
hit triangles increment per-edge support via searchsorted on the
sorted canonical keys. Above the limit it raises loudly: the 100 TB
path is the triangles JOIN regime run once per peel round (support =
distributed wedge join, then an edge anti-join filter), which
multiplies the all-to-all cost by the peel depth — a cost the caller
must opt into, not be surprised by.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from neo4j_graph_algorithms_ray.algorithms.common import IterativeResult
from neo4j_graph_algorithms_ray.algorithms.triangles import (
    _fast_path_limit, _iter_wedges, _probe, _undirected_simple_edges)
from neo4j_graph_algorithms_ray.graph import GraphTables


def _support(n: int, ckeys: np.ndarray) -> np.ndarray:
    """Per-edge triangle support for the canonical (sorted u*n+v,
    u<v) edge-key array, via degree-oriented wedge closure."""
    u, v = ckeys // n, ckeys % n
    deg = np.bincount(u, minlength=n) + np.bincount(v, minlength=n)
    u_first = (deg[u] < deg[v]) | ((deg[u] == deg[v]) & (u < v))
    so = np.where(u_first, u, v)
    to = np.where(u_first, v, u)
    order = np.lexsort((to, deg[to], so))
    so, to = so[order], to[order]
    offsets = np.searchsorted(so, np.arange(n + 1))
    okeys = np.sort(so * np.int64(n) + to)
    support = np.zeros(len(ckeys), np.int64)
    srcs = np.arange(n, dtype=np.int64)
    for src_rep, t1, t2 in _iter_wedges(srcs, offsets, to, {}):
        hit = _probe(okeys, t1, t2, n)
        if not hit.any():
            continue
        s, a, b = src_rep[hit], t1[hit], t2[hit]
        for x, y in ((s, a), (s, b), (a, b)):
            ck = np.minimum(x, y) * np.int64(n) + np.maximum(x, y)
            np.add.at(support, np.searchsorted(ckeys, ck), 1)
    return support


@ray.remote
def _truss_peel(n: int, k: int, *blocks: pa.Table) -> pa.Table:
    us, vs = [], []
    for tbl in blocks:
        us.append(tbl.column("u").to_numpy(zero_copy_only=False))
        vs.append(tbl.column("v").to_numpy(zero_copy_only=False))
    u = np.concatenate(us) if us else np.empty(0, np.int64)
    v = np.concatenate(vs) if vs else np.empty(0, np.int64)
    ckeys = np.unique(u * np.int64(n) + v)
    rounds = 0
    while len(ckeys):
        rounds += 1
        sup = _support(n, ckeys)
        keep = sup >= (k - 2)
        if keep.all():
            break
        ckeys = ckeys[keep]
    return pa.table({"u": pa.array(ckeys // n, pa.int64()),
                     "v": pa.array(ckeys % n, pa.int64()),
                     "rounds": pa.array(np.full(len(ckeys), rounds,
                                                dtype=np.int64))})


@ray.remote
def _support_pass(n: int, *blocks: pa.Table) -> pa.Table:
    us, vs = [], []
    for tbl in blocks:
        us.append(tbl.column("u").to_numpy(zero_copy_only=False))
        vs.append(tbl.column("v").to_numpy(zero_copy_only=False))
    u = np.concatenate(us) if us else np.empty(0, np.int64)
    v = np.concatenate(vs) if vs else np.empty(0, np.int64)
    ckeys = np.unique(u * np.int64(n) + v)
    sup = _support(n, ckeys) if len(ckeys) else np.empty(0, np.int64)
    return pa.table({"u": pa.array(ckeys // n, pa.int64()),
                     "v": pa.array(ckeys % n, pa.int64()),
                     "support": pa.array(sup)})


def edge_support(
    g: GraphTables,
    *,
    node_cols: tuple[str, str] = ("u", "v"),
) -> rd.Dataset:
    """Per-edge triangle support of the undirected simple graph →
    (u, v, support) in original ids, u < v by dense-id order. One
    wedge-closure pass (no peel) — the primitive behind trusses,
    and support = 0 is exactly Granovetter's *local bridge* (an edge
    whose endpoints share no neighbor: its removal lengthens the
    u–v distance beyond 2). Same broadcast-regime contract and
    fast-path limit as :func:`k_truss`."""
    limit = _fast_path_limit()
    if g.num_edges > limit:
        raise RuntimeError(
            f"edge_support: {g.num_edges} edges exceed the "
            f"single-worker limit {limit}. The at-scale path is the "
            "distributed triangle JOIN regime emitting per-edge hit "
            "counts; raise NGA_TRIANGLE_FAST_PATH_EDGE_LIMIT if one "
            "worker can hold the edge set.")
    und = _undirected_simple_edges(g)
    blocks = und.to_arrow_refs()
    out_ref = _support_pass.remote(g.num_vertices, *blocks)
    ds = rd.from_arrow_refs([out_ref])
    vmap = g.vid_to_node_map()

    def to_ids(b: pa.Table) -> pa.Table:
        return pa.table({node_cols[0]: vmap.take(b["u"]),
                         node_cols[1]: vmap.take(b["v"]),
                         "support": b["support"]})

    return ds.map_batches(to_ids, batch_format="pyarrow")


def k_truss(
    g: GraphTables,
    k: int = 3,
    *,
    num_partitions: Optional[int] = None,
    node_cols: tuple[str, str] = ("u", "v"),
) -> IterativeResult:
    """Edges of the k-truss of the undirected simple graph → Dataset
    (u, v) in original ids, u < v by dense-id order. k=3 keeps every
    edge in ≥1 triangle."""
    if k < 3:
        raise ValueError("k-truss needs k >= 3")
    limit = _fast_path_limit()
    if g.num_edges > limit:
        raise RuntimeError(
            f"k_truss: {g.num_edges} edges exceed the single-worker "
            f"peel limit {limit}. The at-scale path is the triangle "
            "JOIN regime once per peel round — O(rounds) all-to-all "
            "exchanges; run it deliberately by peeling with "
            "triangle_stream + edge anti-joins, or raise "
            "NGA_TRIANGLE_FAST_PATH_EDGE_LIMIT if one worker can hold "
            "the edge set.")
    und = _undirected_simple_edges(g)
    blocks = und.to_arrow_refs()
    t0 = time.perf_counter()
    out_ref = _truss_peel.remote(g.num_vertices, k, *blocks)
    ds = rd.from_arrow_refs([out_ref])
    rounds_holder: dict[str, int] = {}

    def project(b: pa.Table) -> pa.Table:
        if b.num_rows:
            rounds_holder["rounds"] = int(b["rounds"][0].as_py())
        return b.select(["u", "v"])

    ds = ds.map_batches(project, batch_format="pyarrow")
    vmap = g.vid_to_node_map()

    def to_ids(b: pa.Table) -> pa.Table:
        return pa.table({node_cols[0]: vmap.take(b["u"]),
                         node_cols[1]: vmap.take(b["v"])})

    ds = ds.map_batches(to_ids, batch_format="pyarrow")
    elapsed = time.perf_counter() - t0
    return IterativeResult(dataset=ds, iterations=0, converged=True,
                           metrics=[],
                           stats={"computeSec": elapsed, "k": k})
