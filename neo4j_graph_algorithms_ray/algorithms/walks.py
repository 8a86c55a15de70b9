"""Deterministic random-walk sampling over the link graph.

The training-data operator behind DeepWalk/node2vec-style graph
embeddings: sample fixed-length walks from a deterministic subset of
start vertices and emit (start, step, node) rows. The reference library
has no walk sampler (its closest primitive is per-source traversal,
e.g. msbfs/BFS); this is one of the beyond-reference corpus operators
the build brief mandates.

Determinism contract (what makes the SQL oracle possible):

- start set  = vertices whose md5-60bit(original id) % start_mod == 0
  (the same pinned-hash idiom as functions/text.doc_sample);
- at step t, a walk started at ``s`` standing on ``v`` moves to the
  ``md5-60bit(f"{s}|{t}") mod outdeg(v)``-th smallest out-neighbor of
  ``v`` — "smallest" by original id (dense vids are assigned in
  ascending original-id order, so the shard-side vid-ranked gather and
  a SQL ``ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst)`` rank
  identically);
- a walk stops early at a dangling vertex.

Scale shape: each step is a batched ranked-neighbor gather against the
resident CSR shard actors — the frontier (one row per live walk) is
routed to owning shards, no edge ever moves, and the adjacency is
vid-sorted once per shard and cached. At 10^12-document scale the
frontier for a corpus-wide walk set should itself stay a Dataset
partitioned by the same vid ranges (map_batches against the shard
pool); the driver-resident frontier here matches the sampled-walks use
(|starts| = |V| / start_mod) and keeps one superstep per walk step, the
same exchange discipline as the BSP kernels.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from neo4j_graph_algorithms_ray.algorithms.common import get_engine
from neo4j_graph_algorithms_ray.functions.dedup import _md5_int
from neo4j_graph_algorithms_ray.graph import GraphTables


def _start_table(g: GraphTables, start_mod: int) -> pa.Table:
    """(node, vid) of walk starts: md5-60bit(node) % start_mod == 0.
    A streaming filter over the vertex table — only the selected
    1/start_mod fraction reaches the driver."""

    def pick(b: pa.Table) -> pa.Table:
        from neo4j_graph_algorithms_ray.functions.dedup import _md5_u64
        urls = np.asarray(b["node"].to_pylist(), dtype=object)
        if len(urls) == 0:
            return b
        h, inv = _md5_u64(urls.astype(str).astype(object), 15)
        keep = (h[inv] % np.uint64(start_mod)) == 0
        return b.filter(pa.array(keep))

    parts = g.vertices.map_batches(pick, batch_format="pyarrow").to_arrow_refs()
    tbls = ray.get(parts)
    return pa.concat_tables(tbls).combine_chunks()


def random_walks(g: GraphTables, length: int = 4, start_mod: int = 7,
                 *, num_partitions: Optional[int] = None,
                 node_col: str = "node") -> rd.Dataset:
    """Sample one deterministic walk of ``length`` steps from every
    selected start vertex; returns (start, step, node) with step 0 =
    the start itself and early stop at dangling vertices."""
    eng = get_engine(g, num_partitions)
    starts = _start_table(g, start_mod)
    start_ids = np.asarray(starts["node"].to_pylist(), dtype=object)
    cur = starts["vid"].to_numpy(zero_copy_only=False).astype(np.int64)

    out_start = [start_ids]
    out_step = [np.zeros(len(cur), dtype=np.int64)]
    out_vid = [cur]
    alive = np.arange(len(cur))
    for t in range(length):
        if len(alive) == 0:
            break
        hashes = np.array(
            [_md5_int(f"{start_ids[i]}|{t}") for i in alive], dtype=np.int64)
        nxt = eng.walk_next(cur, hashes)
        ok = nxt >= 0
        alive, cur = alive[ok], nxt[ok]
        out_start.append(start_ids[alive])
        out_step.append(np.full(len(alive), t + 1, dtype=np.int64))
        out_vid.append(cur)

    tbl = pa.table({
        "start": pa.array(np.concatenate(out_start).tolist(),
                          type=starts.schema.field("node").type),
        "step": pa.array(np.concatenate(out_step)),
        "vid": pa.array(np.concatenate(out_vid)),
    })
    ds = rd.from_arrow(tbl)
    from neo4j_graph_algorithms_ray.algorithms.common import attach_node_ids
    ds = attach_node_ids(g, ds, out_col=node_col)
    return ds.select_columns(["start", "step", node_col]) \
             .sort(["start", "step"])


def node2vec_walks(g: GraphTables, length: int = 4, start_mod: int = 7,
                   *, p: int = 1, q: int = 2,
                   num_partitions: Optional[int] = None,
                   node_col: str = "node") -> rd.Dataset:
    """node2vec-biased deterministic walks (Grover & Leskovec, KDD'16):
    one walk of ``length`` steps per selected start; the second and
    later steps weight each vid-ranked candidate by the search bias
    α(prev, cand) — 1/p to return (cand == prev), 1 to a common
    neighbor (edge prev→cand exists), 1/q to explore — and pick
    deterministically: scale weights by p·q to integers (q, p·q, p),
    take the first candidate whose cumulative weight exceeds
    md5-60bit(f"{start}|{t}") mod Σweights. → (start, step, node).

    Scale shape: each step is two owner-routed shard gathers — the
    walker's candidate list from cur's shard (cost = walker degree;
    hub frontiers ship their adjacency, the standard node2vec scale
    cost) and an (prev, cand) edge-existence probe answered by prev's
    shard from its cached sorted key array. The frontier stays numpy;
    no edge table ever moves. Integer p, q keep the pick exact (no
    float cumsum ties), so a python/SQL oracle ranks identically.
    """
    if p < 1 or q < 1:
        raise ValueError("node2vec p, q must be positive integers")
    eng = get_engine(g, num_partitions)
    starts = _start_table(g, start_mod)
    start_ids = np.asarray(starts["node"].to_pylist(), dtype=object)
    cur = starts["vid"].to_numpy(zero_copy_only=False).astype(np.int64)

    out_start = [start_ids]
    out_step = [np.zeros(len(cur), dtype=np.int64)]
    out_vid = [cur]
    alive = np.arange(len(cur))
    prev = np.full(len(cur), -1, dtype=np.int64)
    for t in range(length):
        if len(alive) == 0:
            break
        hashes = np.array(
            [_md5_int(f"{start_ids[i]}|{t}") for i in alive], dtype=np.int64)
        if t == 0:
            nxt = eng.walk_next(cur, hashes)  # no prev: uniform ranked
        else:
            cand, cnt = eng.walk_neighbors(cur)
            nxt = np.full(len(cur), -1, dtype=np.int64)
            if len(cand):
                walker = np.repeat(np.arange(len(cur)), cnt)
                is_ret = cand == prev[walker]
                shared = eng.edge_mask(prev[walker], cand)
                w = np.where(is_ret, q,
                             np.where(shared, p * q, p)).astype(np.int64)
                # global cumsum + per-segment base: weights are ≥ 1 so
                # cw is strictly increasing and one vectorized
                # searchsorted picks every walker's candidate at once
                seg = np.concatenate([[0], np.cumsum(cnt)])
                cw = np.cumsum(w)
                cw0 = np.concatenate([[0], cw])
                base = cw0[seg[:-1]]
                tot = cw0[seg[1:]] - base
                has = tot > 0
                r = np.zeros(len(cur), dtype=np.int64)
                r[has] = hashes[has] % tot[has]
                nxt_idx = np.searchsorted(cw, base + r, side="right")
                nxt[has] = cand[nxt_idx[has]]
        ok = nxt >= 0
        prev = cur[ok]
        alive, cur = alive[ok], nxt[ok]
        out_start.append(start_ids[alive])
        out_step.append(np.full(len(alive), t + 1, dtype=np.int64))
        out_vid.append(cur)

    tbl = pa.table({
        "start": pa.array(np.concatenate(out_start).tolist(),
                          type=starts.schema.field("node").type),
        "step": pa.array(np.concatenate(out_step)),
        "vid": pa.array(np.concatenate(out_vid)),
    })
    ds = rd.from_arrow(tbl)
    from neo4j_graph_algorithms_ray.algorithms.common import attach_node_ids
    ds = attach_node_ids(g, ds, out_col=node_col)
    return ds.select_columns(["start", "step", node_col]) \
             .sort(["start", "step"])


__all__ = ["random_walks", "node2vec_walks"]
