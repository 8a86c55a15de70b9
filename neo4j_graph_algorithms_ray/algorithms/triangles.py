"""Triangle counting / clustering coefficient.

Reference semantics (algo/.../impl/TriangleCount.java, SURVEY.md §2.4):
treat the graph as undirected (D=BOTH, TriangleCount.java:42), count
each triangle once, report the global count, per-node triangle counts,
local clustering coefficient ``2T / (deg·(deg-1))`` (:132-137) and its
average; ``algo.triangle.stream`` emits (a,b,c) node triples.

Distributed shape (different from the iterative kernels — this is the
canonical two-shuffle Dataset pipeline): orient each undirected edge
from lower to higher (degree, vid) rank — which kills hub wedge
explosion, the same reason the reference sorts adjacencies for
intersections (AdjacencyMatrix.sortAll:289-305) — generate wedges per
source via groupby(src).map_groups, then hash-join wedges back against
the oriented edge table. Per-node counts are one more groupby.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from neo4j_graph_algorithms_ray.algorithms.common import attach_node_ids, default_partitions
from neo4j_graph_algorithms_ray.graph import GraphTables
from neo4j_graph_algorithms_ray.util import safe_join


def _undirected_simple_edges(g: GraphTables) -> rd.Dataset:
    """Canonical (lo, hi) undirected edge set, self-loops dropped.

    Works whether ``g`` was built directed or undirected."""
    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({"u": np.minimum(s, d), "v": np.maximum(s, d)})

    e = g.edges.map_batches(canon, batch_format="pyarrow")
    return e.groupby(["u", "v"]).count().select_columns(["u", "v"])


def _degree_array(und: rd.Dataset, n: int) -> np.ndarray:
    """Undirected degree per vid, as a driver-side numpy vector.

    Scale note: fine to ~1e8 vertices (8n bytes); beyond that the
    orientation step should switch to a degree-table Dataset.join —
    same pipeline, one extra shuffle."""
    deg = np.zeros(n, dtype=np.int64)
    for col in ("u", "v"):
        cnt = und.groupby(col).count()
        for b in cnt.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
            deg[b.column(col).to_numpy(zero_copy_only=False)] += \
                b.column("count()").to_numpy(zero_copy_only=False)
    return deg


# Below this edge count the canonical edge set is deduped driver-side
# and the oriented CSR + sorted edge-key array are broadcast via
# ray.put (same regime as graph.BROADCAST_VERTEX_LIMIT); wedge
# generation/closure stays distributed across source-range tasks.
# Above it, the join-based all-shuffle path runs.
FAST_PATH_EDGE_LIMIT = 100_000_000


def triangle_count(
    g: GraphTables,
    *,
    num_partitions: Optional[int] = None,
    keep_vid: bool = False,
    emit_triples: bool = False,
):
    """Returns (per_node Dataset (node, triangles, coefficient),
    stats dict with triangleCount / averageClusteringCoefficient,
    triples Dataset (a, b, c) — empty unless ``emit_triples`` on the
    broadcast path; always populated on the join path)."""
    if g.num_edges <= FAST_PATH_EDGE_LIMIT:
        return _triangle_count_broadcast(g, num_partitions=num_partitions,
                                         keep_vid=keep_vid,
                                         emit_triples=emit_triples)
    return _triangle_count_join(g, num_partitions=num_partitions,
                                keep_vid=keep_vid)


def _triangle_count_broadcast(g: GraphTables, *, num_partitions, keep_vid,
                              emit_triples):
    """Degree-oriented wedge closure against a broadcast sorted edge-key
    array: the reference's sorted-adjacency intersection
    (TriangleCountExp3.java:129-187) with the membership probe
    vectorized as one searchsorted per wedge batch."""
    p = max(2, default_partitions(g, num_partitions))
    cols = g.edges.select_columns(["src", "dst"])
    tbl = pa.concat_tables(cols.iter_batches(batch_format="pyarrow",
                                             batch_size=1 << 22))
    n = g.num_vertices
    s = tbl.column("src").to_numpy(zero_copy_only=False)
    d = tbl.column("dst").to_numpy(zero_copy_only=False)
    keep = s != d
    u = np.minimum(s[keep], d[keep]).astype(np.int64)
    v = np.maximum(s[keep], d[keep]).astype(np.int64)
    key = np.unique(u * np.int64(n) + v)
    u, v = key // n, key % n
    m = len(key)
    deg = np.bincount(u, minlength=n) + np.bincount(v, minlength=n)
    u_first = (deg[u] < deg[v]) | ((deg[u] == deg[v]) & (u < v))
    so = np.where(u_first, u, v)
    to = np.where(u_first, v, u)
    # CSR sorted by (src, rank(target)) so generated wedge pairs are
    # rank-oriented and can be probed as oriented edge keys
    order = np.lexsort((to, deg[to], so))
    so, to = so[order], to[order]
    offsets = np.searchsorted(so, np.arange(n + 1))
    okeys = np.sort(so * np.int64(n) + to)
    ref = ray.put((offsets, to, okeys, deg))

    bounds = np.linspace(0, n, p + 1).astype(np.int64)
    ranges = rd.from_arrow(pa.table({"lo": bounds[:-1], "hi": bounds[1:]})) \
        .repartition(p)

    class WedgeCloser:
        def __init__(self):
            self.offsets, self.nbr, self.okeys, self.deg = ray.get(ref)
            self._triu: dict[int, tuple] = {}

        def __call__(self, batch: pa.Table) -> pa.Table:
            counts = np.zeros(n, dtype=np.int64)
            total = 0
            for lo, hi in zip(batch.column("lo").to_pylist(),
                              batch.column("hi").to_pylist()):
                for src in range(lo, hi):
                    a, b = self.offsets[src], self.offsets[src + 1]
                    k = b - a
                    if k < 2:
                        continue
                    nb = self.nbr[a:b]
                    ij = self._triu.get(k)
                    if ij is None:
                        ij = np.triu_indices(k, 1)
                        self._triu[k] = ij
                    t1, t2 = nb[ij[0]], nb[ij[1]]
                    keys = t1 * np.int64(n) + t2
                    pos = np.searchsorted(self.okeys, keys)
                    pos[pos >= len(self.okeys)] = 0
                    hit = self.okeys[pos] == keys
                    nhit = int(hit.sum())
                    if not nhit:
                        continue
                    total += nhit
                    counts[src] += nhit
                    np.add.at(counts, t1[hit], 1)
                    np.add.at(counts, t2[hit], 1)
            nz = np.nonzero(counts)[0]
            total_col = np.zeros(len(nz), dtype=np.int64)
            if len(nz):
                total_col[0] = total
            return pa.table({"vid": pa.array(nz), "cnt": pa.array(counts[nz]),
                             "total": pa.array(total_col)})

    parts = ranges.map_batches(WedgeCloser, batch_format="pyarrow",
                               batch_size=1, concurrency=(1, p))
    counts = np.zeros(n, dtype=np.int64)
    n_triangles = 0
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        # np.add.at — a concatenated batch can hold the same vid from
        # several range-tasks; fancy += would drop the duplicates
        np.add.at(counts, b.column("vid").to_numpy(zero_copy_only=False),
                  b.column("cnt").to_numpy(zero_copy_only=False))
        n_triangles += int(b.column("total").to_numpy(zero_copy_only=False).sum())

    with np.errstate(divide="ignore", invalid="ignore"):
        coeff = np.where(deg > 1, 2.0 * counts / (deg * (deg - 1.0)), 0.0)
    out = rd.from_arrow(pa.table({
        "vid": np.arange(n, dtype=np.int64),
        "triangles": counts, "coefficient": coeff,
    }))
    out = attach_node_ids(g, out, keep_vid=keep_vid)
    stats = {"triangleCount": int(n_triangles),
             "averageClusteringCoefficient": float(coeff.mean()) if n else 0.0,
             "nodeCount": n}
    tri = _triples_broadcast(ref, n, p) if emit_triples else rd.from_arrow(
        pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                  "c": pa.array([], pa.int64())}))
    return out, stats, tri


def _triples_broadcast(ref, n: int, p: int) -> rd.Dataset:
    """(a,b,c) rank-oriented triangle triples via the same broadcast
    closure (separate pass so the counting path stays lean)."""
    bounds = np.linspace(0, n, p + 1).astype(np.int64)
    ranges = rd.from_arrow(pa.table({"lo": bounds[:-1], "hi": bounds[1:]})) \
        .repartition(p)

    class TripleGen:
        def __init__(self):
            self.offsets, self.nbr, self.okeys, _ = ray.get(ref)
            self._triu: dict[int, tuple] = {}

        def __call__(self, batch: pa.Table) -> pa.Table:
            tri_a, tri_b, tri_c = [], [], []
            for lo, hi in zip(batch.column("lo").to_pylist(),
                              batch.column("hi").to_pylist()):
                for src in range(lo, hi):
                    a, b = self.offsets[src], self.offsets[src + 1]
                    k = b - a
                    if k < 2:
                        continue
                    nb = self.nbr[a:b]
                    ij = self._triu.get(k)
                    if ij is None:
                        ij = np.triu_indices(k, 1)
                        self._triu[k] = ij
                    t1, t2 = nb[ij[0]], nb[ij[1]]
                    keys = t1 * np.int64(n) + t2
                    pos = np.searchsorted(self.okeys, keys)
                    pos[pos >= len(self.okeys)] = 0
                    hit = self.okeys[pos] == keys
                    if hit.any():
                        tri_a.append(np.full(int(hit.sum()), src, np.int64))
                        tri_b.append(t1[hit])
                        tri_c.append(t2[hit])
            if not tri_a:
                return pa.table({"a": pa.array([], pa.int64()),
                                 "b": pa.array([], pa.int64()),
                                 "c": pa.array([], pa.int64())})
            return pa.table({"a": np.concatenate(tri_a),
                             "b": np.concatenate(tri_b),
                             "c": np.concatenate(tri_c)})

    return ranges.map_batches(TripleGen, batch_format="pyarrow",
                              batch_size=1, concurrency=(1, p))


def _triangle_count_join(
    g: GraphTables,
    *,
    num_partitions: Optional[int] = None,
    keep_vid: bool = False,
):
    """All-shuffle wedge-join path (no broadcast assumption)."""
    p = max(2, default_partitions(g, num_partitions))
    und = _undirected_simple_edges(g)
    deg = _degree_array(und, g.num_vertices)
    deg_ref = ray.put(deg)

    # orient by (degree, vid) rank: lower endpoint keeps the edge
    def orient(batch: pa.Table) -> pa.Table:
        dg = ray.get(deg_ref)
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        u_first = (dg[u] < dg[v]) | ((dg[u] == dg[v]) & (u < v))
        return pa.table({"s": np.where(u_first, u, v), "t": np.where(u_first, v, u)})

    oriented = und.map_batches(orient, batch_format="pyarrow").materialize()

    # wedges via SELF-JOIN on the shared lower-rank vertex (faster than
    # per-group python: one hash shuffle, vectorized filter). Keep the
    # (t_l, t_r) pair once, oriented by rank.
    wj = safe_join(oriented, oriented, "inner", p, on=("s",), right_on=("s",),
                   left_suffix="_l", right_suffix="_r")

    def mkwedge(batch: pa.Table) -> pa.Table:
        dg = ray.get(deg_ref)
        t1 = batch.column("t_l").to_numpy(zero_copy_only=False)
        t2 = batch.column("t_r").to_numpy(zero_copy_only=False)
        keep = (dg[t1] < dg[t2]) | ((dg[t1] == dg[t2]) & (t1 < t2))
        s = batch.column("s").to_numpy(zero_copy_only=False)
        return pa.table({"ws": t1[keep], "wt": t2[keep], "center": s[keep]})

    w = wj.map_batches(mkwedge, batch_format="pyarrow").materialize()

    # close the wedge: (ws, wt) must be an oriented edge. Orientation is
    # consistent (rank order), so a plain equi-join finds each triangle
    # exactly once.
    if w.count() == 0 or oriented.count() == 0:
        tri = rd.from_arrow(pa.table({"a": pa.array([], pa.int64()),
                                      "b": pa.array([], pa.int64()),
                                      "c": pa.array([], pa.int64())}))
    else:
        tri = safe_join(w, oriented, "inner", p, on=("ws", "wt"),
                        right_on=("s", "t"))
        tri = tri.select_columns(["center", "ws", "wt"]) \
                 .rename_columns({"center": "a", "ws": "b", "wt": "c"})
    tri = tri.materialize()
    n_triangles = tri.count()

    # per-node counts: every triangle credits its three corners
    def explode(batch: pa.Table) -> pa.Table:
        arr = np.concatenate([batch.column(c).to_numpy(zero_copy_only=False)
                              for c in ("a", "b", "c")])
        return pa.table({"vid": arr})

    if n_triangles:
        per = tri.map_batches(explode, batch_format="pyarrow") \
                 .groupby("vid").count().rename_columns({"count()": "triangles"})
        counts = np.zeros(g.num_vertices, dtype=np.int64)
        for b in per.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
            counts[b.column("vid").to_numpy(zero_copy_only=False)] = \
                b.column("triangles").to_numpy(zero_copy_only=False)
    else:
        counts = np.zeros(g.num_vertices, dtype=np.int64)

    with np.errstate(divide="ignore", invalid="ignore"):
        coeff = np.where(deg > 1, 2.0 * counts / (deg * (deg - 1.0)), 0.0)
    out = rd.from_arrow(pa.table({
        "vid": np.arange(g.num_vertices, dtype=np.int64),
        "triangles": counts, "coefficient": coeff,
    }))
    out = attach_node_ids(g, out, keep_vid=keep_vid)
    stats = {"triangleCount": int(n_triangles),
             "averageClusteringCoefficient": float(coeff.mean()) if g.num_vertices else 0.0,
             "nodeCount": g.num_vertices}
    return out, stats, tri


def triangle_stream(g: GraphTables, *, num_partitions: Optional[int] = None) -> rd.Dataset:
    """(a, b, c) original-id triples, one row per triangle
    (algo.triangle.stream parity, TriangleStream.java)."""
    _, _, tri = triangle_count(g, num_partitions=num_partitions,
                               emit_triples=True)
    ref = ray.put(g.vid_to_node_map())

    def translate(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        return pa.table({c: m.take(batch[c]) for c in ("a", "b", "c")})

    return tri.map_batches(translate, batch_format="pyarrow")
