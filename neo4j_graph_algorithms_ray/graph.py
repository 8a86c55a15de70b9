"""Graph construction: edge table → dense ids → range-partitioned CSR shards.

Reference parity (SURVEY.md §1): the reference materializes an immutable
dense-id graph snapshot before any algorithm runs (IdMap +
AdjacencyMatrix/CSR — core/.../core/IdMap.java:71-84,
core/.../core/huge/HugeGraphFactory.java:66-146). Here the same
lifecycle is a Ray Data pipeline:

  edges Dataset (original ids) → dense-id assignment (sorted-distinct
  vertex table, ascending order like HugeIdMap) → degree histogram →
  **accumulated-degree range partitioning** (the reference's anti-skew
  policy, algo/.../impl/PageRank.java:85-91,184-218) → partitioned
  Parquet edge shards (the resumable checkpoint of the graph) → shard
  actors build in-memory CSR once and reuse it across iterations.

Partitioning contract: vertices are split into ``P`` contiguous dense-id
ranges chosen so each range owns ≈ equal *edge* count (not node count).
A shard owns (a) the out-edges of its vertex range and (b) the state
vector slice for its range. Scatter messages are pre-aggregated per
unique destination inside the sending shard (map-side combine), so a
hub destination receives at most P messages per iteration regardless of
its in-degree — this plus degree-balanced ranges is the explicit skew
handling required at 10^12-edge scale.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from neo4j_graph_algorithms_ray.util import zip_with_index

DEFAULT_GRAPH_ROOT = os.environ.get("NGA_GRAPH_ROOT", "/tmp/nga_ray/graphs")

# Below this vertex count the vid-mapping array is broadcast via ray.put
# and applied with pc.index_in inside map_batches (no shuffle); above it
# we fall back to two Dataset.join shuffles. 50M int64 ids ≈ 400 MB.
# Env-overridable so tests can force the join regime on tiny graphs.
BROADCAST_VERTEX_LIMIT = 50_000_000


def broadcast_vertex_limit() -> int:
    return int(os.environ.get("NGA_BROADCAST_VERTEX_LIMIT",
                              BROADCAST_VERTEX_LIMIT))
# Below this ESTIMATED DISTINCT-ENDPOINT count (sum of per-block unique
# counts — a cheap upper bound computed in parallel before deciding),
# distinct-vertex extraction merges per-block uniques on the driver
# (O(n) memory — same order as the broadcast vid map, which is what the
# merged array becomes anyway). Gating on edge count was wrong: a 200M-
# edge table with mostly-unique endpoints would pull ~3 GB to the driver.
EDGE_DRIVER_DISTINCT_LIMIT = 50_000_000


@dataclass
class GraphTables:
    """The materialized graph bundle every algorithm consumes.

    vertices: Dataset (vid:int64, node:<original id type>) — vid dense in
      [0, num_vertices), assigned in ascending original-id order.
    edges:    Dataset (src:int64, dst:int64 [, weight:float64]) in dense ids.
    """

    vertices: rd.Dataset
    edges: rd.Dataset
    num_vertices: int
    num_edges: int
    weighted: bool = False
    name: str = ""
    node_dtype: str = "int64"
    # filled by partition_edges(): checkpointed shard layout
    graph_dir: Optional[str] = None
    bounds: Optional[np.ndarray] = None  # P+1 vid range boundaries
    meta: dict = field(default_factory=dict)

    @property
    def num_partitions(self) -> int:
        return 0 if self.bounds is None else len(self.bounds) - 1

    def vid_to_node_map(self) -> pa.Array:
        """Original-id array indexed by vid — broadcast-regime use only.

        Guarded: above the broadcast limit this whole-vertex-table
        materialization is exactly the scale-killer the output boundary
        must avoid; callers must take the Dataset.join path instead
        (algorithms/common.py attach_node_ids / translate_vid_columns)."""
        limit = broadcast_vertex_limit()
        if self.num_vertices > limit:
            raise RuntimeError(
                f"vid_to_node_map(): {self.num_vertices} vertices exceeds the "
                f"broadcast limit ({limit}); use the join-based id translation "
                "(attach_node_ids / translate_vid_columns handle this split)")
        batches = list(self.vertices.sort("vid")
                       .iter_batches(batch_format="pyarrow", batch_size=1 << 20))
        if not batches:
            return pa.array([], type=pa.int64())
        return pa.concat_tables(batches).column("node").combine_chunks()


def _unique_endpoint_ids(edges: rd.Dataset, src_col: str, dst_col: str) -> rd.Dataset:
    """Distinct node ids across both endpoint columns (distributed path:
    per-batch partial unique → groupby). Used above the broadcast limit."""
    def partial(batch: pa.Table) -> pa.Table:
        u = pc.unique(pa.chunked_array([batch[src_col].combine_chunks(),
                                        batch[dst_col].combine_chunks()]))
        return pa.table({"node": u})

    both = edges.map_batches(partial, batch_format="pyarrow")
    return both.groupby("node").count().select_columns(["node"])


@ray.remote(num_returns=2)
def _block_unique(tbl: pa.Table, cols: list[str]):
    """(count, unique array) as TWO refs — the driver reads the tiny
    count refs to estimate distinct endpoints without ever pulling the
    arrays out of the object store."""
    arrs = [tbl[c].combine_chunks() for c in cols if c in tbl.column_names]
    if tbl.num_rows == 0 or not arrs:  # schema-less empty blocks
        return 0, pa.array([], pa.int64())
    u = pc.unique(pa.chunked_array(arrs))
    return len(u), u


def _block_unique_refs(edges: rd.Dataset, src_col: str, dst_col: str,
                       extra: Optional[rd.Dataset]) -> tuple[list, list]:
    """Per-block (count, distinct-endpoint-array) object refs (parallel,
    cheap: one pc.unique per block, arrays stay in the object store)."""
    pairs = [_block_unique.remote(r, [src_col, dst_col])
             for r in edges.materialize().to_arrow_refs()]
    if extra is not None:
        pairs += [_block_unique.remote(r, ["node"])
                  for r in extra.materialize().to_arrow_refs()]
    return [p[0] for p in pairs], [p[1] for p in pairs]


def _merge_unique_driver(refs: list) -> pa.Array:
    """Driver-side distinct+sort merge of per-block unique arrays for
    the broadcast regime. Memory is O(n + blocks·block_uniques) — same
    order as the broadcast vid map itself, so this costs nothing extra
    below BROADCAST_VERTEX_LIMIT. Returns the vid-ordered node array."""
    parts = ray.get(refs)
    allv = pc.unique(pa.chunked_array(parts)) if parts else pa.array([], pa.int64())
    order = pc.sort_indices(allv)
    res = allv.take(order)
    return res.combine_chunks() if isinstance(res, pa.ChunkedArray) else res


# The per-block unique-count sum double-counts endpoints shared across
# blocks, so it GROWS with block count: the same 166M-edge/2M-node
# table estimated 16M distinct at 8 input blocks but 64M at 32 — and
# fell off the fast broadcast path exactly when parallelism increased
# (measured: id-assign 18 s at 8 CPUs vs ~290 s at 32 through the
# distributed groupby-distinct). When the overestimate is within this
# factor of the limit, spend a cheap remote tree merge to resolve the
# overlap EXACTLY before deciding the regime; far above it (true huge
# graphs — at 10^12 docs the sum is 1000× the limit) go straight to
# the distributed id-assign path.
TREE_MERGE_OVERESTIMATE_FACTOR = 8


@ray.remote
def _arr_len(arr: pa.Array) -> int:
    return len(arr)


@ray.remote
def _union_unique(*parts: pa.Array) -> pa.Array:
    allv = pc.unique(pa.chunked_array(list(parts)))
    order = pc.sort_indices(allv)
    res = allv.take(order)
    return res.combine_chunks() if isinstance(res, pa.ChunkedArray) else res


def _tree_merge_unique(refs: list, fanin: int = 4):
    """Remote tree merge of per-block unique arrays → one object ref
    holding the sorted global distinct array. Each round unions
    ``fanin`` sorted-unique inputs per task (peak task memory ≈ fanin ·
    true-distinct ints); the driver never touches intermediates."""
    while len(refs) > 1:
        refs = [_union_unique.remote(*refs[i:i + fanin])
                for i in range(0, len(refs), fanin)]
    return refs[0]


def build_graph(
    edges: rd.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: Optional[str] = None,
    *,
    undirected: bool = False,
    accumulate_weights: bool = False,
    dedup: bool = False,
    extra_vertices: Optional[rd.Dataset] = None,
    name: str = "",
) -> GraphTables:
    """Materialize a GraphTables bundle from an edge Dataset of original ids.

    Mirrors the reference's GraphLoader contract
    (core/.../core/GraphLoader.java:90-496): direction handling
    (``undirected`` = loadAsUndirected: emit the reversed copy before
    the CSR build), duplicate-edge handling (``accumulate_weights`` =
    GraphSetup.accumulateWeights: sum parallel edges' weights;
    ``dedup`` = keep one), and weight defaulting.
    ``extra_vertices``: Dataset with a ``node`` column of ids that must
    exist even if isolated (the reference loads all label-matching nodes
    whether or not they have relationships).
    """
    cols = [src_col, dst_col] + ([weight_col] if weight_col else [])
    e = edges.select_columns(cols)
    ren = {src_col: "src", dst_col: "dst"}
    if weight_col:
        ren[weight_col] = "weight"
    e = e.rename_columns(ren)

    if undirected:
        swapped = e.rename_columns({"src": "dst", "dst": "src"}) \
                   .select_columns(["src", "dst"] + (["weight"] if weight_col else []))
        e = e.union(swapped)

    if accumulate_weights and weight_col:
        e = e.groupby(["src", "dst"]).sum("weight")
        e = e.rename_columns({"sum(weight)": "weight"})
    elif dedup:
        e = e.groupby(["src", "dst"]).count().select_columns(["src", "dst"])

    # --- dense-id assignment (IdMap analogue; ascending original-id order) ---
    e = e.materialize()
    node_arr = None
    distinct_driver_limit = int(os.environ.get("NGA_EDGE_DRIVER_DISTINCT_LIMIT",
                                               EDGE_DRIVER_DISTINCT_LIMIT))
    # gate on the actual driver cost — estimated distinct endpoints —
    # not edge count. Cheap pre-check first: 2·edges (+ extras) is an
    # upper bound on distinct endpoints, so small edge tables skip the
    # estimation entirely; otherwise sum the per-block unique counts
    # (an upper bound too — only the tiny count refs reach the driver).
    # Set NGA_EDGE_DRIVER_DISTINCT_LIMIT=0 on genuinely huge graphs to
    # skip the per-block unique pass and go straight to the distributed
    # id-assign path.
    bound = 2 * e.count() + (extra_vertices.count()
                             if extra_vertices is not None else 0)
    uniq_refs = None
    if bound <= distinct_driver_limit:
        est_distinct = bound
    elif distinct_driver_limit <= 0:
        est_distinct = bound
    else:
        len_refs, uniq_refs = _block_unique_refs(
            e, "src", "dst",
            extra_vertices.select_columns(["node"])
            if extra_vertices is not None else None)
        est_distinct = sum(ray.get(len_refs))
    if est_distinct <= distinct_driver_limit:
        if uniq_refs is None:
            _, uniq_refs = _block_unique_refs(
                e, "src", "dst",
                extra_vertices.select_columns(["node"])
                if extra_vertices is not None else None)
        # broadcast regime: distinct+sort merged on the driver from
        # per-block uniques (a 35M-row groupby-distinct costs minutes in
        # a hash shuffle; this path is seconds and the result is the
        # broadcast vid map we need anyway)
        node_arr = _merge_unique_driver(uniq_refs)
    elif (distinct_driver_limit > 0 and uniq_refs is not None
          and est_distinct <= (TREE_MERGE_OVERESTIMATE_FACTOR
                               * distinct_driver_limit)):
        # the estimate is an overlap-inflated upper bound (see
        # TREE_MERGE_OVERESTIMATE_FACTOR): resolve it exactly with a
        # remote tree merge and pull the array only if genuinely small
        merged = _tree_merge_unique(uniq_refs)
        if int(ray.get(_arr_len.remote(merged))) <= distinct_driver_limit:
            node_arr = ray.get(merged)
    if node_arr is not None:
        n = len(node_arr)
        vt = pa.table({"node": node_arr,
                       "vid": pa.array(np.arange(n, dtype=np.int64))})
        verts = rd.from_arrow(vt).materialize()
    else:
        verts = _unique_endpoint_ids(e, "src", "dst")
        if extra_vertices is not None:
            verts = verts.union(extra_vertices.select_columns(["node"])) \
                         .groupby("node").count().select_columns(["node"])
        verts = zip_with_index(verts.sort("node"), index_col="vid")
        verts = verts.materialize()
        n = verts.count()

    if n <= broadcast_vertex_limit():
        # broadcast mapping: vid == position in the vid-ordered node array
        if node_arr is None:
            vbatches = list(verts.sort("vid")
                            .iter_batches(batch_format="pyarrow", batch_size=1 << 22))
            node_arr = (pa.concat_tables(vbatches).column("node").combine_chunks()
                        if vbatches else pa.array([], type=pa.int64()))
        map_ref = ray.put(node_arr)

        def to_dense(batch: pa.Table, _ref=map_ref) -> pa.Table:
            m = ray.get(_ref)
            out = {
                "src": pc.index_in(batch["src"], value_set=m).cast(pa.int64()),
                "dst": pc.index_in(batch["dst"], value_set=m).cast(pa.int64()),
            }
            if "weight" in batch.column_names:
                out["weight"] = batch["weight"].cast(pa.float64())
            return pa.table(out)

        dense = e.map_batches(to_dense, batch_format="pyarrow")
    else:
        # big-graph path: two hash joins against the vertex table
        from neo4j_graph_algorithms_ray.util import join_partitions
        p = join_partitions(max(32, verts.num_blocks()))
        # join drops the right_on key column; only the left key + right
        # payload (vid) survive. safe_join culls schema-less empty blocks
        # that crash acero's hash join.
        from neo4j_graph_algorithms_ray.util import safe_join
        dense = safe_join(e, verts, "inner", p, on=("src",), right_on=("node",))
        dense = dense.drop_columns(["src"]).rename_columns({"vid": "src"})
        dense = safe_join(dense, verts, "inner", p, on=("dst",), right_on=("node",))
        dense = dense.drop_columns(["dst"]).rename_columns({"vid": "dst"})
        keep = ["src", "dst"] + (["weight"] if weight_col else [])
        dense = dense.select_columns(keep)

    dense = dense.materialize()
    m = dense.count()
    sch = verts.schema()
    node_dtype = str(dict(zip(sch.names, sch.types)).get("node", "int64"))
    return GraphTables(
        vertices=verts, edges=dense, num_vertices=n, num_edges=m,
        weighted=bool(weight_col), name=name, node_dtype=node_dtype,
    )


def degree_histogram(g: GraphTables, nbuckets: int = 4096) -> np.ndarray:
    """Edge count per coarse src-vid bucket (driver-sized; map-side partials).

    Used for accumulated-degree range partitioning; the full per-vertex
    degree table never leaves the cluster.
    """
    nbuckets = min(nbuckets, max(1, g.num_vertices))
    if g.num_edges == 0:
        return np.zeros(nbuckets, dtype=np.int64)
    bucket_size = (g.num_vertices + nbuckets - 1) // nbuckets

    def partial(batch: pa.Table) -> pa.Table:
        b = batch.column("src").to_numpy(zero_copy_only=False) // bucket_size
        cnt = np.bincount(b, minlength=nbuckets)
        nz = np.nonzero(cnt)[0]
        return pa.table({"bucket": nz.astype(np.int64), "cnt": cnt[nz].astype(np.int64)})

    parts = g.edges.map_batches(partial, batch_format="pyarrow")
    agg = parts.groupby("bucket").sum("cnt").to_pandas()
    hist = np.zeros(nbuckets, dtype=np.int64)
    hist[agg["bucket"].to_numpy()] = agg["sum(cnt)"].to_numpy()
    return hist


def choose_bounds(g: GraphTables, num_partitions: int, hist: Optional[np.ndarray] = None) -> np.ndarray:
    """P+1 vid boundaries balancing *accumulated degree* per range.

    This is the reference's PageRank partitioning policy
    (algo/.../impl/PageRank.java:85-91 "partition by accumulated degree
    to avoid having one partition with super nodes") generalized to
    range partitioning shared by every shard-based algorithm.
    """
    n = g.num_vertices
    p = max(1, min(num_partitions, n))
    if hist is None:
        hist = degree_histogram(g)
    nbuckets = len(hist)
    bucket_size = (n + nbuckets - 1) // nbuckets
    cum = np.cumsum(hist)
    total = cum[-1] if len(cum) else 0
    if total == 0:
        bounds = np.linspace(0, n, p + 1).astype(np.int64)
        bounds[-1] = n
        return bounds
    targets = (np.arange(1, p) * (total / p))
    cut_buckets = np.searchsorted(cum, targets, side="left")
    bounds = np.concatenate([[0], (cut_buckets + 1) * bucket_size, [n]]).astype(np.int64)
    bounds = np.clip(bounds, 0, n)
    bounds = np.maximum.accumulate(bounds)  # monotone (empty ranges allowed)
    return bounds


def partition_edges(
    g: GraphTables,
    num_partitions: int,
    *,
    graph_dir: Optional[str] = None,
    reverse: bool = False,
) -> GraphTables:
    """Range-partition the dense edge table by src (or dst when ``reverse``)
    and checkpoint it as Hive-partitioned Parquet — the durable graph
    layout shard actors rebuild their CSR from (lineage/resume).

    Layout: ``{graph_dir}/edges[{_rev}]/part=<i>/*.parquet`` plus
    ``{graph_dir}/bounds.npy``. Analogous to the reference's named graph
    cache (algo.graph.load — core/.../core/loadgraph/LoadGraphFactory.java:31-60)
    except durable on storage rather than pinned in heap.
    """
    if g.bounds is None:
        g.bounds = choose_bounds(g, num_partitions)
    bounds = g.bounds
    if graph_dir is None:
        # fingerprint = name + shape + bounds: a re-built graph with the
        # same name but different content must not reuse stale shards
        fp = hashlib.md5(
            f"{g.name}:{g.num_vertices}:{g.num_edges}:{g.weighted}:"
            f"{bounds.tobytes().hex()}".encode()).hexdigest()[:10]
        key = f"{g.name or 'g'}-{fp}"
        graph_dir = os.path.join(DEFAULT_GRAPH_ROOT, key)
    sub = "edges_rev" if reverse else "edges"
    out_dir = os.path.join(graph_dir, sub)
    os.makedirs(graph_dir, exist_ok=True)
    np.save(os.path.join(graph_dir, "bounds.npy"), bounds)

    key_col = "dst" if reverse else "src"

    def add_part(batch: pa.Table) -> pa.Table:
        v = batch.column(key_col).to_numpy(zero_copy_only=False)
        part = (np.searchsorted(bounds, v, side="right") - 1).astype(np.int32)
        return batch.append_column("part", pa.array(part))

    done_marker = os.path.join(out_dir, "_SUCCESS")
    if not os.path.exists(done_marker):
        g.edges.map_batches(add_part, batch_format="pyarrow") \
               .write_parquet(out_dir, partition_cols=["part"])
        os.makedirs(out_dir, exist_ok=True)  # empty dataset writes nothing
        with open(done_marker, "w") as f:
            f.write("ok")
    g.graph_dir = graph_dir
    return g
