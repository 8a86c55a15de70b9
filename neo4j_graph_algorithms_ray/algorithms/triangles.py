"""Triangle counting / clustering coefficient.

Reference semantics (algo/.../impl/TriangleCount.java, SURVEY.md §2.4):
treat the graph as undirected (D=BOTH, TriangleCount.java:42), count
each triangle once, report the global count, per-node triangle counts,
local clustering coefficient ``2T / (deg·(deg-1))`` (:132-137) and its
average; ``algo.triangle.stream`` emits (a,b,c) node triples.

Two regimes, same degree-orientation idea (orient each undirected edge
from lower to higher (degree, vid) rank — kills hub wedge explosion,
the reason the reference sorts adjacencies for intersections,
AdjacencyMatrix.sortAll:289-305):

- broadcast (≤ FAST_PATH_EDGE_LIMIT edges): the oriented CSR + sorted
  edge-key array are built in ONE remote task (never concatenated on
  the driver) and shared via its object ref; wedge closure runs as
  range tasks whose inner loop is batched per distinct degree — one
  searchsorted per (chunk × degree-class), not per vertex.
- join (above the limit, or forced): all-shuffle Dataset pipeline with
  degree as a joined column — no driver-side arrays of any kind. Wedges
  via self-join on the shared lower-rank vertex, closure via hash-join
  of wedge (t1,t2) pairs against the oriented edge table.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from neo4j_graph_algorithms_ray.algorithms.common import attach_node_ids, default_partitions
from neo4j_graph_algorithms_ray.graph import GraphTables
from neo4j_graph_algorithms_ray.util import preagg_sum, safe_join, to_arrow_blocks

# Below this edge count the oriented CSR is built in one remote task and
# broadcast by ref; above it the join-based all-shuffle path runs.
FAST_PATH_EDGE_LIMIT = 100_000_000
# Max wedges closed per searchsorted batch inside a range task.
WEDGE_BATCH = 1 << 22


def _fast_path_limit() -> int:
    return int(os.environ.get("NGA_TRIANGLE_FAST_PATH_EDGE_LIMIT",
                              FAST_PATH_EDGE_LIMIT))


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
    from neo4j_graph_algorithms_ray.util import distinct_pairs
    return distinct_pairs(e, "u", "v")


@ray.remote
def _build_oriented(n: int, *blocks: pa.Table):
    """Dedup + degree-orient the edge set and build the CSR inside a
    worker (the driver only ever holds the object ref). Returns
    (offsets, targets, sorted oriented edge keys, degree vector)."""
    us, vs = [], []
    for tbl in blocks:
        s = tbl.column("src").to_numpy(zero_copy_only=False)
        d = tbl.column("dst").to_numpy(zero_copy_only=False)
        keep = s != d
        us.append(np.minimum(s[keep], d[keep]).astype(np.int64))
        vs.append(np.maximum(s[keep], d[keep]).astype(np.int64))
    u = np.concatenate(us) if us else np.empty(0, np.int64)
    v = np.concatenate(vs) if vs else np.empty(0, np.int64)
    key = np.unique(u * np.int64(n) + v)
    u, v = key // n, key % n
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
    return offsets, to, okeys, deg


@ray.remote
def _close_wedge_range(built, lo: int, hi: int, n: int):
    """Close all rank-oriented wedges of vertices [lo, hi) against the
    sorted oriented-edge-key array; returns (nonzero vids, their
    per-vid triangle increments, range triangle total)."""
    offsets, nbr, okeys, _deg = built
    counts = np.zeros(n, dtype=np.int64)
    total = 0
    srcs = np.arange(lo, hi, dtype=np.int64)
    for src_rep, t1, t2 in _iter_wedges(srcs, offsets[lo:hi + 1], nbr, {}):
        hit = _probe(okeys, t1, t2, n)
        nhit = int(hit.sum())
        if not nhit:
            continue
        total += nhit
        np.add.at(counts, src_rep[hit], 1)
        np.add.at(counts, t1[hit], 1)
        np.add.at(counts, t2[hit], 1)
    nz = np.nonzero(counts)[0]
    return nz, counts[nz], total


@ray.remote
def _wedge_bounds(built, p: int) -> np.ndarray:
    """Wedge-weighted range bounds: split vertices into ≤p contiguous
    ranges of equal Σ C(outdeg,2) (the closure work unit), not equal
    vertex count — on a skewed web graph equal-width ranges put nearly
    all wedges in the hub ranges. Runs worker-side against the built
    CSR so the driver never holds the offsets array."""
    offsets = built[0]
    k = np.diff(offsets).astype(np.int64)
    n = len(k)
    w = k * (k - 1) // 2
    cw = np.cumsum(w)
    ecuts = np.linspace(0, n, p + 1).astype(np.int64)
    if n == 0 or cw[-1] == 0:
        return np.unique(ecuts)
    tgt = np.linspace(0, cw[-1], p + 1)[1:-1]
    # side="left" + 1: the vertex crossing each weight target closes its
    # range, so a dominant hub lands alone instead of collapsing every
    # cut onto itself (which would yield ONE range — no parallelism).
    wcuts = np.searchsorted(cw, tgt, side="left") + 1
    # union with equal-width cuts keeps the light tail split ≤2p ways
    # even when one vertex holds most of the wedge mass
    return np.unique(np.concatenate([[0], wcuts, ecuts, [n]])).astype(np.int64)


def _iter_wedges(srcs_all: np.ndarray, starts_all: np.ndarray, nbr: np.ndarray,
                 triu_cache: dict):
    """Yield (src_of_wedge, t1, t2) arrays for all rank-oriented wedges:
    vertex i's neighbors are ``nbr[starts_all[i]:starts_all[i+1]]``
    (rank-sorted). Batched per distinct degree class within wedge-budget
    chunks — no per-vertex Python loop."""
    k_all = np.diff(starts_all).astype(np.int64)
    offs_all = starts_all[:-1].astype(np.int64)
    sel = k_all >= 2
    srcs_all, k_all, offs_all = srcs_all[sel], k_all[sel], offs_all[sel]
    if not len(srcs_all):
        return
    w = k_all * (k_all - 1) // 2
    cum = np.cumsum(w)
    cuts = np.searchsorted(cum, np.arange(WEDGE_BATCH, cum[-1], WEDGE_BATCH),
                           side="left")
    starts = np.concatenate([[0], cuts + 1, [len(srcs_all)]])
    starts = np.unique(starts)
    for a, b in zip(starts[:-1], starts[1:]):
        srcs, k, offs = srcs_all[a:b], k_all[a:b], offs_all[a:b]
        for kk in np.unique(k):
            m = k == kk
            rows, ro = srcs[m], offs[m]
            ij = triu_cache.get(int(kk))
            if ij is None:
                ij = np.triu_indices(int(kk), 1)
                triu_cache[int(kk)] = ij
            # (len(rows), kk) neighbor matrix → all C(kk,2) pairs per row
            nbmat = nbr[ro[:, None] + np.arange(int(kk))[None, :]]
            t1 = nbmat[:, ij[0]].ravel()
            t2 = nbmat[:, ij[1]].ravel()
            src_rep = np.repeat(rows, len(ij[0]))
            yield src_rep, t1, t2


def _probe(okeys: np.ndarray, t1: np.ndarray, t2: np.ndarray, n: int) -> np.ndarray:
    keys = t1 * np.int64(n) + t2
    pos = np.searchsorted(okeys, keys)
    pos[pos >= len(okeys)] = 0
    return okeys[pos] == keys


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
    if g.num_edges <= _fast_path_limit():
        return _triangle_count_broadcast(g, num_partitions=num_partitions,
                                         keep_vid=keep_vid,
                                         emit_triples=emit_triples)
    return _triangle_count_join(g, num_partitions=num_partitions,
                                keep_vid=keep_vid)


def _triangle_count_broadcast(g: GraphTables, *, num_partitions, keep_vid,
                              emit_triples):
    """Degree-oriented wedge closure against a broadcast sorted edge-key
    array: the reference's sorted-adjacency intersection
    (TriangleCountExp3.java:129-187) with the membership probe batched
    over whole degree classes per searchsorted call."""
    p = max(2, default_partitions(g, num_partitions))
    n = g.num_vertices
    blocks = g.edges.select_columns(["src", "dst"]).materialize().to_arrow_refs()
    ref = _build_oriented.remote(n, *blocks)

    bounds = ray.get(_wedge_bounds.remote(ref, p))
    # plain Ray tasks, one per wedge-balanced range: tasks reuse warm
    # worker processes (an actor-pool map here pays ~2-3 s of pool
    # spawn per call) and the built CSR arrives as a zero-copy plasma
    # read via the resolved ``built`` argument
    futures = [_close_wedge_range.remote(ref, int(lo), int(hi), n)
               for lo, hi in zip(bounds[:-1], bounds[1:])]
    counts = np.zeros(n, dtype=np.int64)
    n_triangles = 0
    for nz, cnt, total in ray.get(futures):
        # np.add.at — several range-tasks can count the same vid;
        # fancy += would drop the duplicates
        np.add.at(counts, nz, cnt)
        n_triangles += int(total)

    deg = ray.get(ref)[3]
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


@ray.remote
def _gen_triples_range(built, lo: int, hi: int, n: int) -> pa.Table:
    offsets, nbr, okeys, _deg = built
    tri_a, tri_b, tri_c = [], [], []
    srcs = np.arange(lo, hi, dtype=np.int64)
    for src_rep, t1, t2 in _iter_wedges(srcs, offsets[lo:hi + 1], nbr, {}):
        hit = _probe(okeys, t1, t2, n)
        if hit.any():
            tri_a.append(src_rep[hit])
            tri_b.append(t1[hit])
            tri_c.append(t2[hit])
    if not tri_a:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "c": pa.array([], pa.int64())})
    return pa.table({"a": np.concatenate(tri_a), "b": np.concatenate(tri_b),
                     "c": np.concatenate(tri_c)})


def _triples_broadcast(ref, n: int, p: int) -> rd.Dataset:
    """(a,b,c) rank-oriented triangle triples via the same batched
    closure (separate pass so the counting path stays lean). One plain
    Ray task per wedge-balanced range (same rationale as the counting
    path: no actor-pool spawn); the per-range tables stay in plasma and
    come back as a Dataset."""
    bounds = ray.get(_wedge_bounds.remote(ref, p))
    refs = [_gen_triples_range.remote(ref, int(lo), int(hi), n)
            for lo, hi in zip(bounds[:-1], bounds[1:])]
    return rd.from_arrow_refs(refs)


def _degree_dataset(und: rd.Dataset) -> rd.Dataset:
    """(vid, deg) over the canonical undirected edge set — a Dataset,
    never a driver array."""
    def explode(batch: pa.Table) -> pa.Table:
        arr = np.concatenate([batch.column(c).to_numpy(zero_copy_only=False)
                              for c in ("u", "v")])
        return pa.table({"vid": arr, "one": np.ones(len(arr), np.int64)})

    return preagg_sum(und.map_batches(explode, batch_format="pyarrow"),
                      ["vid"], "one").rename_columns({"one": "deg"})


@ray.remote
def _orient_split(tbl: pa.Table, P: int, *deg_blocks: pa.Table):
    """Canonicalize + degree-orient one edge block and split it by
    ``s % P``. Degrees arrive as (vid, deg) blocks (the degree Dataset's
    object refs — node-shared in plasma, never on the driver)."""
    vlist = [db.column("vid").to_numpy(zero_copy_only=False) for db in deg_blocks]
    dlist = [db.column("deg").to_numpy(zero_copy_only=False) for db in deg_blocks]
    dv = np.concatenate(vlist) if vlist else np.empty(0, np.int64)
    dd = np.concatenate(dlist) if dlist else np.empty(0, np.int64)
    order = np.argsort(dv)
    dv_sorted, dd_sorted = dv[order], dd[order]

    def deg_of(x: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(dv_sorted, x)
        return dd_sorted[pos]

    u = tbl.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
    v = tbl.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
    du_, dv_ = deg_of(u), deg_of(v)
    u_first = (du_ < dv_) | ((du_ == dv_) & (u < v))
    s = np.where(u_first, u, v)
    t = np.where(u_first, v, u)
    dt = np.where(u_first, dv_, du_)
    b = s % P
    order = np.argsort(b, kind="stable")
    s, t, dt, b = s[order], t[order], dt[order], b[order]
    cuts = np.searchsorted(b, np.arange(P + 1))
    return tuple(pa.table({"s": s[cuts[j]:cuts[j + 1]],
                           "t": t[cuts[j]:cuts[j + 1]],
                           "dt": dt[cuts[j]:cuts[j + 1]]})
                 for j in range(P))


@ray.remote(num_returns=2)
def _build_partition(n: int, *slices: pa.Table):
    """Assemble one src-hash partition: compact rank-sorted CSR for
    wedge generation, and — as a SEPARATE object — the partition's
    sorted oriented edge keys for the closure probe (separate so a
    closure task probing this bucket fetches only the 8 B/edge key
    array, not the whole CSR). Returns ((srcs, starts, nbr), okeys)."""
    if slices:
        s = np.concatenate([x.column("s").to_numpy(zero_copy_only=False)
                            for x in slices]).astype(np.int64)
        t = np.concatenate([x.column("t").to_numpy(zero_copy_only=False)
                            for x in slices]).astype(np.int64)
        dt = np.concatenate([x.column("dt").to_numpy(zero_copy_only=False)
                             for x in slices]).astype(np.int64)
    else:
        s = t = dt = np.empty(0, np.int64)
    order = np.lexsort((t, dt, s))  # per-src neighbors rank-sorted
    s, t = s[order], t[order]
    srcs, starts = np.unique(s, return_index=True)
    starts = np.append(starts, len(s)).astype(np.int64)
    okeys = np.sort(s * np.int64(n) + t)
    return (srcs, starts, t), okeys


@ray.remote(num_returns=3)
def _close_partition(part, n: int, okey_refs: list):
    """Generate this partition's wedges and probe them against the
    src-hash-bucketed edge-key arrays, BUCKET-MAJOR: each wedge batch is
    sorted by target bucket ``t1 % P`` and probed one bucket at a time,
    with the bucket's plasma view released before the next fetch — the
    task never holds more than ONE okey bucket (total okeys are 8 B/edge
    ≈ 8 TB at 10^12 edges; pinning every touched bucket, as a naive
    cache would, converges each task's working set to the whole array
    and defeats plasma eviction). Re-fetches across batches hit the
    node-local plasma copy (zero-copy view) while memory allows; under
    pressure Ray evicts and re-pulls — residency is bounded by plasma,
    not by task-held references. Returns three refs:
    (per-vid counts table, triangle total, triples table)."""
    srcs, starts, nbr = part
    P = len(okey_refs)
    total = 0
    tri_a, tri_b, tri_c = [], [], []
    triu: dict[int, tuple] = {}
    partial_v, partial_c = [], []
    for src_rep, t1, t2 in _iter_wedges(srcs, starts, nbr, triu):
        buck = t1 % P
        border = np.argsort(buck, kind="stable")
        t1s, t2s = t1[border], t2[border]
        cuts = np.searchsorted(buck[border], np.arange(P + 1))
        hit_s = np.zeros(len(t1s), dtype=bool)
        for jb in range(P):
            a, b = cuts[jb], cuts[jb + 1]
            if a == b:
                continue
            ok = ray.get(okey_refs[jb])
            if len(ok):
                hit_s[a:b] = _probe(ok, t1s[a:b], t2s[a:b], n)
            del ok  # release the plasma view before the next bucket
        hit = np.empty_like(hit_s)
        hit[border] = hit_s
        nhit = int(hit.sum())
        if not nhit:
            continue
        total += nhit
        hv = np.concatenate([src_rep[hit], t1[hit], t2[hit]])
        uv, uc = np.unique(hv, return_counts=True)
        partial_v.append(uv)
        partial_c.append(uc)
        tri_a.append(src_rep[hit])
        tri_b.append(t1[hit])
        tri_c.append(t2[hit])
    if partial_v:
        allv = np.concatenate(partial_v)
        allc = np.concatenate(partial_c)
        uv, inv = np.unique(allv, return_inverse=True)
        uc = np.bincount(inv, weights=allc).astype(np.int64)
    else:
        uv = np.empty(0, np.int64)
        uc = np.empty(0, np.int64)
    cnt_tbl = pa.table({"vid": uv, "triangles": uc})
    tri_tbl = (pa.table({"a": np.concatenate(tri_a),
                         "b": np.concatenate(tri_b),
                         "c": np.concatenate(tri_c)}) if tri_a else
               pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "c": pa.array([], pa.int64())}))
    return cnt_tbl, total, tri_tbl


def _triangle_count_join(
    g: GraphTables,
    *,
    num_partitions: Optional[int] = None,
    keep_vid: bool = False,
):
    """Scale path without any broadcast-to-driver assumption: degrees,
    orientation and the closure-key buckets are built by Ray tasks from
    Dataset block refs; edges exchange once by ``s % P``; wedges are
    generated AND closed inside the partition tasks (they never hit a
    shuffle — at copart-sf0.1 density the wedge table is 60× the edge
    table); closure is bucket-major, holding at most ONE okey bucket at
    a time (see _close_partition). Partitioning assumption: one
    src-hash partition's edges + one closure bucket fit in a worker's
    heap; the okey buckets live in the object store, plasma-shared per
    node and evictable under pressure
    (reference test parity: tests/.../impl/TriangleCountTest.java:50-135)."""
    p = max(2, default_partitions(g, num_partitions))
    n = g.num_vertices
    und = _undirected_simple_edges(g).materialize()
    deg_ds = _degree_dataset(und).materialize()
    deg_refs = deg_ds.to_arrow_refs()

    # exchange: orient + split each block by s % p (tasks, not a shuffle
    # through the driver)
    splits = [_orient_split.options(num_returns=p).remote(blk, p, *deg_refs)
              for blk in und.to_arrow_refs()]
    if splits and p == 1:
        splits = [[s] for s in splits]
    built = [_build_partition.remote(n, *[sp[j] for sp in splits])
             for j in range(p)]
    csr_refs = [b[0] for b in built]
    okey_refs = [b[1] for b in built]

    cnt_refs, total_refs, tri_refs = [], [], []
    for j in range(p):
        c, tot, tr = _close_partition.remote(csr_refs[j], n, okey_refs)
        cnt_refs.append(c)
        total_refs.append(tot)
        tri_refs.append(tr)
    # only the scalar totals come to the driver; count/triple tables
    # stay in the object store as Dataset blocks
    n_triangles = int(sum(ray.get(total_refs)))
    per = preagg_sum(rd.from_arrow_refs(cnt_refs), ["vid"], "triangles")
    tri = rd.from_arrow_refs(tri_refs).materialize()

    # coefficient is 0 wherever the triangle count is 0, so degree is
    # only needed on the (small) triangle-bearing set: one inner join
    # there, then a single densifying left join over all vertices
    pj = safe_join(to_arrow_blocks(per), deg_ds.rename_columns({"vid": "dvid"}),
                   "inner", p, on=("vid",), right_on=("dvid",))

    def coeff_of(batch: pa.Table) -> pa.Table:
        tn = batch.column("triangles").to_numpy(zero_copy_only=False).astype(np.float64)
        dn = batch.column("deg").to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            coeff = np.where(dn > 1, 2.0 * tn / (dn * (dn - 1.0)), 0.0)
        return pa.table({"vid": batch["vid"], "triangles": batch["triangles"],
                         "coefficient": pa.array(coeff)})

    pj = pj.map_batches(coeff_of, batch_format="pyarrow")
    verts = g.vertices.select_columns(["vid"])
    dense = safe_join(verts, pj, "left_outer", p, on=("vid",), right_on=("vid",))

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = pc.coalesce(batch["triangles"], pa.scalar(0, pa.int64()))
        c = pc.coalesce(batch["coefficient"], pa.scalar(0.0, pa.float64()))
        return pa.table({"vid": batch["vid"], "triangles": t, "coefficient": c})

    per_node = dense.map_batches(finish, batch_format="pyarrow").materialize()
    coeff_sum = per_node.sum("coefficient") or 0.0
    out = attach_node_ids(g, per_node, keep_vid=keep_vid)
    nv = g.num_vertices
    stats = {"triangleCount": int(n_triangles),
             "averageClusteringCoefficient": float(coeff_sum) / nv if nv else 0.0,
             "nodeCount": nv}
    return out, stats, tri


def triangle_stream(g: GraphTables, *, num_partitions: Optional[int] = None) -> rd.Dataset:
    """(a, b, c) original-id triples, one row per triangle
    (algo.triangle.stream parity, TriangleStream.java)."""
    _, _, tri = triangle_count(g, num_partitions=num_partitions,
                               emit_triples=True)
    from neo4j_graph_algorithms_ray.algorithms.common import translate_vid_columns
    return translate_vid_columns(g, tri, ["a", "b", "c"])
