"""Betweenness centrality — Brandes, per-source task parallelism.

Reference parity (algo/.../impl/betweenness/, SURVEY.md §2.4):
`BetweennessCentrality` runs Brandes' forward σ / backward δ passes per
source; `ParallelBetweennessCentrality` fans sources across threads
into a shared atomic array; `RABrandesBetweennessCentrality` samples a
source subset (random or degree-biased). The Ray shape is the same
fan-out: a sources Dataset mapped through an actor pool holding the
broadcast CSR (``ray.put`` once, read in ``__init__`` per actor —
never re-shipped per batch); each task emits its per-node dependency
partials, and the final ``groupby(vid).sum`` is the shared-array
equivalent. Per-source BFS levels are numpy-vectorized over the CSR.
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from neo4j_graph_algorithms_ray.algorithms.common import (
    IterativeResult, attach_node_ids)
from neo4j_graph_algorithms_ray.graph import GraphTables


def _md5_sample_vids(g: GraphTables, k: int) -> np.ndarray:
    """Deterministic, SQL-replicable source sampling: the ``k`` nodes
    with the smallest repo-standard md5-60bit hash of the original id's
    string form (DuckDB mirror:
    ``CAST(('0x'||substr(md5(node),1,15)) AS BIGINT)``), ties broken by
    node ascending. Distributed per-batch partial bottom-k — only k rows
    per block reach the driver."""
    import hashlib

    import pyarrow.compute as pc

    def part(b: pa.Table) -> pa.Table:
        nodes = b["node"].to_pylist()
        hs = np.array([int.from_bytes(hashlib.md5(str(x).encode()).digest()[:8],
                                      "big") >> 4 for x in nodes],
                      dtype=np.int64)
        order = np.argsort(hs, kind="stable")[:k]
        return pa.table({"vid": b["vid"].take(pa.array(order)),
                         "node": b["node"].take(pa.array(order)),
                         "h": pa.array(hs[order])})

    parts = g.vertices.select_columns(["vid", "node"]) \
        .map_batches(part, batch_format="pyarrow").take_all()
    parts.sort(key=lambda r: (r["h"], r["node"]))
    return np.array([r["vid"] for r in parts[:k]], dtype=np.int64)


def _pick_sources(g: GraphTables, eng_or_adj, sample: int, strategy: str,
                  seed: int) -> np.ndarray:
    """Shared source-selection for the sampled Brandes variants."""
    n = g.num_vertices
    rng = np.random.default_rng(seed)
    k = min(sample, n)
    if strategy == "md5":
        return _md5_sample_vids(g, k)
    if strategy == "degree":
        deg = eng_or_adj().astype(np.float64)
        k = min(k, int((deg > 0).sum()))
        if k == 0:
            return np.empty(0, dtype=np.int64)
        p = deg / deg.sum() if deg.sum() > 0 else None
        return rng.choice(n, size=k, replace=False, p=p).astype(np.int64)
    if strategy == "random":
        return rng.choice(n, size=k, replace=False).astype(np.int64)
    raise ValueError(f"strategy must be random/degree/md5, got {strategy!r}")


def betweenness(
    g: GraphTables,
    *,
    sources: Optional[Sequence] = None,
    sample: Optional[int] = None,
    strategy: str = "random",
    max_depth: Optional[int] = None,
    seed: int = 42,
    concurrency: int = 4,
    batch_size: int = 16,
    node_col: str = "node",
) -> IterativeResult:
    """Brandes betweenness over the directed graph as built → (node,
    centrality). ``sources=None`` = exact (every node a source);
    ``sample=k`` = RABrandes-style source subset, scores scaled by n/k
    (deterministic seed). ``strategy``: "random" = uniform
    (RandomSelectionStrategy); "degree" = degree-proportional inclusion
    (RandomDegreeSelectionStrategy.java:56-60 — p ∝ out-degree).
    ``max_depth`` bounds each source's BFS depth
    (MaxDepthBetweennessCentrality.java parity)."""
    from neo4j_graph_algorithms_ray.algorithms.sssp import _driver_adjacency, _to_vid
    offsets, dsts, _ = _driver_adjacency(g, weighted=False)
    n = g.num_vertices
    if sources is not None:
        src_vids = np.array([_to_vid(g, s) for s in sources], dtype=np.int64)
        scale = 1.0
    elif sample is not None:
        src_vids = _pick_sources(g, lambda: np.diff(offsets), sample,
                                 strategy, seed)
        # degree strategy on an edgeless graph clamps k to 0 — the
        # centrality is exactly zero everywhere, return it directly
        if len(src_vids) == 0:
            ds = attach_node_ids(g, rd.from_arrow(pa.table({
                "vid": pa.array(np.arange(n, dtype=np.int64)),
                "centrality": pa.array(np.zeros(n))})), out_col=node_col)
            return IterativeResult(dataset=ds, iterations=0, converged=True,
                                   metrics=[], stats={"computeSec": 0.0,
                                                      "sources": 0, "scale": 1.0})
        scale = n / len(src_vids)
    else:
        src_vids = np.arange(n, dtype=np.int64)
        scale = 1.0
    adj_ref = ray.put((offsets, dsts))
    sources_ds = rd.from_arrow(pa.table({"svid": pa.array(src_vids)})) \
        .repartition(max(concurrency * 2, (len(src_vids) + batch_size - 1) // batch_size))
    t0 = time.perf_counter()

    class BrandesTask:
        def __init__(self):
            self.offsets, self.dsts = ray.get(adj_ref)

        def _single(self, s: int) -> np.ndarray:
            off, dst = self.offsets, self.dsts
            dist = np.full(n, -1, dtype=np.int64)
            sigma = np.zeros(n)
            dist[s] = 0
            sigma[s] = 1.0
            frontier = np.array([s], dtype=np.int64)
            level_edges = []
            d = 0
            while len(frontier):
                if max_depth is not None and d >= max_depth:
                    break
                counts = off[frontier + 1] - off[frontier]
                nz = counts > 0
                frontier, counts = frontier[nz], counts[nz]
                if len(frontier) == 0:
                    break
                idx = np.concatenate([np.arange(off[u], off[u + 1]) for u in frontier]) \
                    if len(frontier) < 1024 else _ranges(off, frontier)
                targets = dst[idx]
                srcs = np.repeat(frontier, counts)
                newly = dist[targets] == -1
                if newly.any():
                    dist[targets[newly]] = d + 1
                on_sp = dist[targets] == d + 1
                t_sp, s_sp = targets[on_sp], srcs[on_sp]
                np.add.at(sigma, t_sp, sigma[s_sp])
                level_edges.append((s_sp, t_sp))
                frontier = np.unique(targets[newly])
                d += 1
            delta = np.zeros(n)
            for s_sp, t_sp in reversed(level_edges):
                contrib = sigma[s_sp] / np.maximum(sigma[t_sp], 1e-300) \
                    * (1.0 + delta[t_sp])
                np.add.at(delta, s_sp, contrib)
            delta[s] = 0.0
            return delta

        def __call__(self, batch: pa.Table) -> pa.Table:
            acc = np.zeros(n)
            for s in batch.column("svid").to_pylist():
                acc += self._single(int(s))
            nz = np.nonzero(acc)[0]
            return pa.table({"vid": pa.array(nz.astype(np.int64)),
                             "part": pa.array(acc[nz])})

    # autoscaling (1, N) — see sssp.all_shortest_paths_weighted
    parts = sources_ds.map_batches(BrandesTask, batch_format="pyarrow",
                                   batch_size=batch_size,
                                   concurrency=(1, concurrency)).materialize()
    if parts.count() == 0:
        # all dependencies zero (e.g. max_depth=1): empty blocks crash
        # the groupby/join shuffles — emit the all-zero result directly
        ds = rd.from_arrow(pa.table({
            "vid": pa.array(np.arange(n, dtype=np.int64)),
            "centrality": pa.array(np.zeros(n))}))
    else:
        summed = parts.groupby("vid").sum("part") \
            .rename_columns({"sum(part)": "centrality"})
        # densify: every node gets a row (0.0 when never on a shortest path)
        all_vids = rd.from_arrow(pa.table({"vid": pa.array(np.arange(n, dtype=np.int64))}))
        from neo4j_graph_algorithms_ray.util import safe_join, to_arrow_blocks
        dense = safe_join(all_vids, to_arrow_blocks(summed), "left_outer",
                          max(4, concurrency), on=("vid",), right_on=("vid",))

        def finish(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            c = pc.multiply(pc.coalesce(b["centrality"], pa.scalar(0.0)), scale)
            return pa.table({"vid": b["vid"], "centrality": c})

        ds = dense.map_batches(finish, batch_format="pyarrow")
    ds = attach_node_ids(g, ds, out_col=node_col)
    elapsed = time.perf_counter() - t0
    return IterativeResult(dataset=ds, iterations=len(src_vids), converged=True,
                           metrics=[],
                           stats={"computeSec": elapsed, "sources": len(src_vids),
                                  "scale": scale})


def betweenness_bsp(
    g: GraphTables,
    *,
    sources: Optional[Sequence] = None,
    sample: Optional[int] = None,
    strategy: str = "random",
    max_depth: Optional[int] = None,
    seed: int = 42,
    num_partitions: Optional[int] = None,
    wave: int = 64,
    node_col: str = "node",
) -> IterativeResult:
    """Distributed Brandes betweenness on the BSP shard engine — the
    scale path for graphs whose CSR exceeds a single worker's RAM (the
    task-parallel :func:`betweenness` broadcasts the whole adjacency per
    actor, reference ParallelBetweennessCentrality's shared-graph
    threads made explicit).

    Sources are processed in waves of ``wave`` columns: each shard holds
    (n_local, S) per-source σ/dist/δ state, forward supersteps push σ
    along the out-CSR level-synchronously, backward supersteps push
    (1+δ)/σ along the reverse CSR (shortest-path predecessors filter on
    ``dist == level-1`` receiver-side), and each wave folds Σ_cols δ
    into a 1-D centrality accumulator. Memory/vertex ≈ 20·S bytes per
    actor set — ``wave`` trades per-wave memory for fewer passes.
    Identical output contract to :func:`betweenness` (node, centrality),
    n/k scaling for sampled runs."""
    from neo4j_graph_algorithms_ray.algorithms.common import get_engine
    eng = get_engine(g, num_partitions, reverse=True)
    n = g.num_vertices
    if sources is not None:
        from neo4j_graph_algorithms_ray.algorithms.sssp import _to_vid
        src_vids = np.array([_to_vid(g, s) for s in sources], dtype=np.int64)
        scale = 1.0
    elif sample is not None:
        # degree strategy pulls the out-degree vector driver-side:
        # rng.choice needs the full probability vector anyway —
        # 8B/vertex, the selection boundary, not the graph
        def _deg():
            return np.concatenate([
                t.column("degree").to_numpy(zero_copy_only=False)
                for t in ray.get([a.out_degree_table.remote()
                                  for a in eng.actors])])

        src_vids = _pick_sources(g, _deg, sample, strategy, seed)
        if len(src_vids) == 0:  # degree strategy, edgeless graph
            ds = attach_node_ids(g, rd.from_arrow(pa.table({
                "vid": pa.array(np.arange(n, dtype=np.int64)),
                "centrality": pa.array(np.zeros(n))})), out_col=node_col)
            return IterativeResult(dataset=ds, iterations=0, converged=True,
                                   metrics=[], stats={"computeSec": 0.0,
                                                      "sources": 0, "scale": 1.0})
        scale = n / len(src_vids)
    else:
        src_vids = np.arange(n, dtype=np.int64)
        scale = 1.0
    t0 = time.perf_counter()
    supersteps = 0
    eng.init_state("centrality", "const", 0.0, rev=True)
    for ws in range(0, len(src_vids), wave):
        wsrc = src_vids[ws:ws + wave]
        S = len(wsrc)
        cols = np.arange(S, dtype=np.int64)
        eng.init_state_wave("dist2", S, -1, dtype="int32")
        eng.init_state_wave("sigma", S, 0.0)
        eng.set_cells("dist2", wsrc, cols, np.zeros(S, dtype=np.int32))
        eng.set_cells("sigma", wsrc, cols, np.ones(S))
        lv = 0
        while True:
            if max_depth is not None and lv >= max_depth:
                break
            stats = eng.step("brandes_fwd", "brandes_fwd_update",
                             scatter_kw={"level": lv}, update_kw={"level": lv})
            supersteps += 1
            if sum(s["new"] for s in stats) == 0:
                break
            lv += 1
        # deepest assigned BFS level is lv (the step at lv found nothing
        # new, or max_depth cut expansion there)
        eng.copy_state("dist2", to_rev=True)
        eng.copy_state("sigma", to_rev=True)
        eng.init_state_wave("delta", S, 0.0, rev=True)
        for blv in range(lv, 0, -1):
            eng.step("brandes_bwd", "brandes_bwd_update",
                     actors=eng.rev_actors, update_actors=eng.rev_actors,
                     scatter_kw={"level": blv}, update_kw={"level": blv})
            supersteps += 1
        # fold Σ_cols δ into the accumulator, zeroing each source's own
        # column first (a source takes no credit for its own paths)
        eng.fold_sum_cols("delta", "centrality", zero_cells=(wsrc, cols),
                          rev=True)
    eng.copy_state("centrality", to_rev=False)
    eng.drop_states(["dist2", "sigma"])
    eng.drop_states(["dist2", "sigma", "delta"], rev=True)
    metrics = eng.drain_metrics()
    ds = eng.state_dataset(["centrality"])
    if scale != 1.0:
        def rescale(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return b.set_column(b.column_names.index("centrality"), "centrality",
                                pc.multiply(b["centrality"], scale))
        ds = ds.map_batches(rescale, batch_format="pyarrow")
    ds = attach_node_ids(g, ds, out_col=node_col)
    elapsed = time.perf_counter() - t0
    return IterativeResult(dataset=ds, iterations=len(src_vids), converged=True,
                           metrics=[metrics],
                           stats={"computeSec": elapsed, "sources": len(src_vids),
                                  "scale": scale, "supersteps": supersteps,
                                  "wave": wave})


def _ranges(off: np.ndarray, frontier: np.ndarray) -> np.ndarray:
    """Concatenated index ranges [off[u], off[u+1]) for u in frontier,
    without a Python loop (large frontiers)."""
    counts = off[frontier + 1] - off[frontier]
    total = int(counts.sum())
    out = np.ones(total, dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    out[starts] = off[frontier]
    out[starts[1:]] -= off[frontier[:-1] + 1] - 1
    return np.cumsum(out)
