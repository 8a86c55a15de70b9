"""Shared helpers for algorithm drivers."""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional

import pyarrow as pa
import ray
import ray.data as rd

from neo4j_graph_algorithms_ray.graph import GraphTables
from neo4j_graph_algorithms_ray.registry import GraphCatalog


def default_partitions(g: GraphTables, requested: Optional[int]) -> int:
    """P defaults to the cluster CPU count, capped so tiny graphs don't
    pay per-actor overhead (≥ ~10k edges per shard when possible)."""
    if requested:
        return max(1, min(requested, g.num_vertices))
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    by_size = max(1, (g.num_edges + 9_999) // 10_000)
    return max(1, min(cpus, by_size, g.num_vertices))


def _output_join_partitions(g: GraphTables) -> int:
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(8, min(cpus * 2, g.vertices.num_blocks() or 8))


def attach_node_ids(g: GraphTables, ds: rd.Dataset, vid_col: str = "vid",
                    out_col: str = "node", keep_vid: bool = False) -> rd.Dataset:
    """Translate dense vids back to original node ids (the reference's
    ``toOriginalNodeId`` output boundary, core/.../api/IdMapping.java:44).

    Regime split (same as graph.build_graph's input boundary): below the
    broadcast vertex limit the vid→node array ships once via ray.put and
    each task does a vectorized take (no shuffle); above it the vertex
    table never materializes anywhere — one Dataset.join against
    ``g.vertices`` per translated column.
    """
    from neo4j_graph_algorithms_ray.graph import broadcast_vertex_limit
    if g.num_vertices > broadcast_vertex_limit():
        from neo4j_graph_algorithms_ray.util import safe_join
        orig_cols = ds.schema().names
        verts = g.vertices.select_columns(["vid", "node"]) \
            .rename_columns({"vid": "__jvid", "node": out_col})
        joined = safe_join(ds, verts, "inner", _output_join_partitions(g),
                           on=(vid_col,), right_on=("__jvid",))
        keep = [out_col] + [c for c in orig_cols
                            if c != out_col and (keep_vid or c != vid_col)]
        return joined.select_columns(keep)

    ref = ray.put(g.vid_to_node_map())

    def translate(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        nodes = m.take(batch[vid_col])
        batch = batch.append_column(out_col, nodes)
        if not keep_vid:
            batch = batch.drop_columns([vid_col])
        # put node id first
        names = [out_col] + [c for c in batch.column_names if c != out_col]
        return batch.select(names)

    return ds.map_batches(translate, batch_format="pyarrow")


def translate_vid_columns(g: GraphTables, ds: rd.Dataset, cols: list[str]) -> rd.Dataset:
    """Map dense-vid-valued columns (component ids, label values) back to
    original node ids. Because vids are assigned in ascending original-id
    order, min-vid canonical ids translate to min-original-id canonical
    ids. Broadcast lookup below the vertex limit; Dataset.join against
    ``g.vertices`` above it (one join per translated column)."""
    from neo4j_graph_algorithms_ray.graph import broadcast_vertex_limit
    if g.num_vertices > broadcast_vertex_limit():
        from neo4j_graph_algorithms_ray.util import safe_join
        orig_cols = ds.schema().names
        p = _output_join_partitions(g)
        for c in cols:
            verts = g.vertices.select_columns(["vid", "node"]) \
                .rename_columns({"vid": "__jvid", "node": "__jnode"})
            # join drops the right_on key; left key c + __jnode survive
            ds = safe_join(ds, verts, "inner", p, on=(c,), right_on=("__jvid",))
            ds = ds.drop_columns([c]).rename_columns({"__jnode": c})
        return ds.select_columns(orig_cols)

    ref = ray.put(g.vid_to_node_map())

    def tr(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        for c in cols:
            idx = batch.column_names.index(c)
            batch = batch.set_column(idx, c, m.take(batch[c]))
        return batch

    return ds.map_batches(tr, batch_format="pyarrow")


def node_to_vid_map(g: GraphTables, nodes) -> dict:
    """Original ids → dense vids for a SMALL node set via a distributed
    is_in filter over the vertex table — the vertex table never leaves
    the cluster and never materializes on the driver (the lookup cost is
    one pruned scan regardless of graph size). Missing nodes are simply
    absent from the returned dict; callers decide whether that's an
    error."""
    import pyarrow.compute as pc

    keys = pa.array(list(dict.fromkeys(nodes)))

    def pick(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b["node"].cast(keys.type), value_set=keys))

    rows = g.vertices.select_columns(["vid", "node"]) \
        .map_batches(pick, batch_format="pyarrow").take_all()
    return {r["node"]: int(r["vid"]) for r in rows}


def vid_to_node_lookup(g: GraphTables, vids) -> dict:
    """Dense vids → original ids for a SMALL vid set (path endpoints,
    sampled sources) — same distributed-filter shape as
    :func:`node_to_vid_map`, inverse direction."""
    import numpy as np
    import pyarrow.compute as pc

    keys = pa.array(np.unique(np.asarray(list(vids), dtype=np.int64)))

    def pick(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b["vid"], value_set=keys))

    rows = g.vertices.select_columns(["vid", "node"]) \
        .map_batches(pick, batch_format="pyarrow").take_all()
    return {int(r["vid"]): r["node"] for r in rows}


@dataclass
class IterativeResult:
    """Common result shape for iterative algorithms (the reference's
    stats row — loadMillis/computeMillis/iterations etc.,
    algo/.../results/AbstractResultBuilder.java — plus our per-partition
    metrics/lineage)."""

    dataset: rd.Dataset
    iterations: int
    converged: bool
    metrics: list = field(default_factory=list)   # per-iteration per-partition dicts
    stats: dict = field(default_factory=dict)

    @property
    def edges_scattered(self) -> int:
        return sum(m.get("edges_scattered", 0) for it in self.metrics for m in it)


def get_engine(g: GraphTables, num_partitions: Optional[int], *, weighted=False,
               reverse=False):
    p = default_partitions(g, num_partitions)
    return GraphCatalog.engine(g, p, weighted=weighted, reverse=reverse)


def ensure_ckpt_dir(algo: str, g: GraphTables, explicit: Optional[str]) -> str:
    if explicit:
        return explicit
    base = g.graph_dir or os.path.join("/tmp/nga_ray/ckpt")
    return os.path.join(base, "ckpt", algo)
