"""Multi-source BFS and the centralities built on it.

Reference parity (SURVEY.md §2.4): `MultiSourceBFS` packs ω=32 sources
into one bitset per node and runs them in a single traversal
(algo/.../impl/msbfs/MultiSourceBFS.java:79,153-168); closeness
accumulates ``farness[v] += |sources at depth d| * d``
(algo/.../impl/MSClosenessCentrality.java:62-66, score ``(n-1)/farness``
MSBFSCCAlgorithm.java:43-45); harmonic accumulates
``inv_farness[v] += |sources|/d`` scaled by ``1/(n-1)``
(algo/.../impl/MSHarmonicCentrality.java:59,67-72).

Ray shape: 64 sources per wave as a uint64 bitset state vector; each
BFS level is one BSP superstep — scatter ``bitwise_or`` of frontier
bitsets per unique destination (map-side combine), receivers AND-NOT
against their seen bitset (state/shards.py ``bits``/``bits_update``).
Waves run back-to-back on the same resident CSR shards; per-wave work
is one superstep per BFS level, exactly one shuffle-equivalent message
exchange per level.
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import ray.data as rd

from neo4j_graph_algorithms_ray.algorithms.common import (
    IterativeResult, attach_node_ids, get_engine)
from neo4j_graph_algorithms_ray.graph import GraphTables

WAVE = 64


def _run_waves(eng, sources: np.ndarray, *, accumulate: list[str],
               emit_hops: bool = False, max_depth: Optional[int] = None):
    """Run MSBFS from ``sources`` (dense vids) in 64-source waves.
    ``accumulate`` names the shard state vectors bits_update may add
    into ("farness" / "inv_farness") — passed through explicitly so a
    cached engine never mutates stale vectors from a prior run.
    Returns (supersteps, hop rows (source, target, depth) if emitted,
    per-source eccentricity = max BFS depth reached, tracked from the
    8-byte new-visit bit unions each shard already reports)."""
    hops_src, hops_dst, hops_depth = [], [], []
    ecc = np.zeros(len(sources), dtype=np.int64)
    supersteps = 0
    for base in range(0, len(sources), WAVE):
        wave = sources[base:base + WAVE]
        bits = np.zeros(len(wave), dtype=np.uint64)
        for i in range(len(wave)):
            bits[i] = np.uint64(1) << np.uint64(i)
        eng.init_state("seen", "const", 0, dtype="uint64")
        eng.init_state("frontier", "const", 0, dtype="uint64")
        eng.set_state_from_table("seen", wave, bits)
        eng.set_state_from_table("frontier", wave, bits)
        depth = 0
        while True:
            depth += 1
            if max_depth is not None and depth > max_depth:
                break
            stats = eng.step("bits", "bits_update",
                             update_kw={"depth": depth, "emit_hops": emit_hops,
                                        "accumulate": list(accumulate)})
            supersteps += 1
            if emit_hops:
                for s in stats:
                    v, b = s["hops"]
                    if len(v):
                        hops_src.append(wave[b])
                        hops_dst.append(v)
                        hops_depth.append(np.full(len(v), depth, dtype=np.int64))
            union = np.uint64(0)
            for s in stats:
                union |= np.uint64(s["new_union"])
            if union:
                hit = (union >> np.arange(len(wave), dtype=np.uint64)) \
                      & np.uint64(1)
                ecc[base:base + len(wave)][hit.astype(bool)] = depth
            if sum(s["new_visits"] for s in stats) == 0:
                break
    if emit_hops:
        if hops_src:
            return supersteps, (np.concatenate(hops_src),
                                np.concatenate(hops_dst),
                                np.concatenate(hops_depth)), ecc
        return supersteps, (np.empty(0, np.int64),) * 3, ecc
    return supersteps, None, ecc


def closeness(
    g: GraphTables,
    *,
    sources: Optional[Sequence[int]] = None,
    num_partitions: Optional[int] = None,
    node_col: str = "node",
) -> IterativeResult:
    """Closeness centrality ``(n-1)/farness`` (0 for unreachable nodes).
    ``sources`` (dense vids) restricts the farness sum to a source
    subset — the sampled form used at scale; None = exact (all nodes).
    """
    eng = get_engine(g, num_partitions)
    src = (np.arange(g.num_vertices, dtype=np.int64) if sources is None
           else np.asarray(list(sources), dtype=np.int64))
    eng.init_state("farness", "const", 0.0)
    t0 = time.perf_counter()
    steps, _, _ = _run_waves(eng, src, accumulate=["farness"])
    elapsed = time.perf_counter() - t0
    metrics = eng.drain_metrics()

    def score(batch: pa.Table) -> pa.Table:
        f = batch.column("farness").to_numpy(zero_copy_only=False)
        n = max(g.num_vertices - 1, 1)
        c = np.where(f > 0, n / np.maximum(f, 1e-300), 0.0)
        return pa.table({"vid": batch.column("vid"), "centrality": pa.array(c)})

    ds = eng.state_dataset(["farness"]).map_batches(score, batch_format="pyarrow")
    ds = attach_node_ids(g, ds, out_col=node_col)
    return IterativeResult(dataset=ds, iterations=steps, converged=True,
                           metrics=[metrics],
                           stats={"computeSec": elapsed, "sources": len(src)})


def harmonic(
    g: GraphTables,
    *,
    sources: Optional[Sequence[int]] = None,
    num_partitions: Optional[int] = None,
    node_col: str = "node",
) -> IterativeResult:
    """Harmonic centrality ``Σ_s 1/d(s,v) / (n-1)``."""
    eng = get_engine(g, num_partitions)
    src = (np.arange(g.num_vertices, dtype=np.int64) if sources is None
           else np.asarray(list(sources), dtype=np.int64))
    eng.init_state("inv_farness", "const", 0.0)
    t0 = time.perf_counter()
    steps, _, _ = _run_waves(eng, src, accumulate=["inv_farness"])
    elapsed = time.perf_counter() - t0
    metrics = eng.drain_metrics()

    def score(batch: pa.Table) -> pa.Table:
        f = batch.column("inv_farness").to_numpy(zero_copy_only=False)
        n = max(g.num_vertices - 1, 1)
        return pa.table({"vid": batch.column("vid"), "centrality": pa.array(f / n)})

    ds = eng.state_dataset(["inv_farness"]).map_batches(score, batch_format="pyarrow")
    ds = attach_node_ids(g, ds, out_col=node_col)
    return IterativeResult(dataset=ds, iterations=steps, converged=True,
                           metrics=[metrics],
                           stats={"computeSec": elapsed, "sources": len(src)})


def msbfs_hop_counts(
    g: GraphTables,
    sources: Optional[Sequence[int]] = None,
    *,
    num_partitions: Optional[int] = None,
    max_depth: Optional[int] = None,
) -> rd.Dataset:
    """Unweighted all-shortest-paths hop counts from ``sources`` (dense
    vids; None = all) → Dataset (source, target, distance) in ORIGINAL
    ids, one row per reached (source, target), distance ≥ 1.
    MSBFSAllShortestPaths parity (algo/.../impl/MSBFSAllShortestPaths.java).
    """
    eng = get_engine(g, num_partitions)
    src = (np.arange(g.num_vertices, dtype=np.int64) if sources is None
           else np.asarray(list(sources), dtype=np.int64))
    _, (hs, hd, hdep), _ = _run_waves(eng, src, accumulate=[], emit_hops=True,
                                   max_depth=max_depth)
    vmap = g.vid_to_node_map()
    tbl = pa.table({"source": vmap.take(pa.array(hs)),
                    "target": vmap.take(pa.array(hd)),
                    "distance": pa.array(hdep)})
    return rd.from_arrow(tbl)


def eccentricity(
    g: GraphTables,
    *,
    sources: Optional[Sequence[int]] = None,
    num_partitions: Optional[int] = None,
    node_col: str = "node",
) -> IterativeResult:
    """Per-source eccentricity: max BFS depth reached from each source
    (0 for sources with no out-edges). Rides the same MSBFS waves as
    closeness/harmonic, but needs NO per-node state or hop emission —
    each shard reports an 8-byte OR of newly-visited source bits per
    superstep, so the driver-side cost is |sources| ints total. The
    sampled form (sources ⊂ V) is the standard diameter
    lower-bound/estimation primitive at web scale."""
    eng = get_engine(g, num_partitions)
    src = (np.arange(g.num_vertices, dtype=np.int64) if sources is None
           else np.asarray(list(sources), dtype=np.int64))
    t0 = time.perf_counter()
    steps, _, ecc = _run_waves(eng, src, accumulate=[])
    elapsed = time.perf_counter() - t0
    metrics = eng.drain_metrics()
    ds = rd.from_arrow(pa.table({"vid": pa.array(src),
                                 "eccentricity": pa.array(ecc)}))
    ds = attach_node_ids(g, ds, out_col=node_col)
    return IterativeResult(dataset=ds, iterations=steps, converged=True,
                           metrics=[metrics],
                           stats={"computeSec": elapsed, "sources": len(src),
                                  "max_eccentricity": int(ecc.max()) if len(ecc) else 0})


def effective_diameter(g: GraphTables, *, percentile: float = 0.9,
                       sources: Optional[Sequence[int]] = None,
                       num_partitions: Optional[int] = None) -> rd.Dataset:
    """Distance-distribution summary over the (sampled) all-pairs BFS →
    ONE row (n_reachable_pairs, mean_distance, effective_diameter,
    diameter): effective diameter = smallest hop count d such that
    ≥ ``percentile`` of reachable ordered pairs are within d (the
    standard web-graph statistic from Broder et al. / Leskovec et al.).

    Scale shape: rides the MSBFS waves (``sources=None`` = exact, the
    small-graph / coarsened-host-graph regime; pass a vid sample for
    the estimation regime — ANF (`algorithms/anf.py`) is the sketch
    path when even sampled BFS is too wide). The per-pair hop rows
    never land anywhere: a map-side-combined groupby reduces them to a
    ≤ diameter-row histogram; only that histogram reaches the driver.
    """
    import pyarrow.compute as pc

    from neo4j_graph_algorithms_ray.util import collect_arrow, preagg_sum

    hops = msbfs_hop_counts(g, sources=sources,
                            num_partitions=num_partitions)

    def hist_partial(b: pa.Table) -> pa.Table:
        d = b["distance"].to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(d, return_counts=True)
        return pa.table({"d": pa.array(uniq.astype(np.int64)),
                         "n": pa.array(cnt.astype(np.int64))})

    hist = preagg_sum(hops.map_batches(hist_partial, batch_format="pyarrow"),
                      ["d"], "n")
    tabs = [t for t in collect_arrow(hist) if t.num_rows]
    if not tabs:
        return rd.from_arrow(pa.table({
            "n_reachable_pairs": pa.array([0], pa.int64()),
            "mean_distance": pa.array([0.0]),
            "effective_diameter": pa.array([0], pa.int64()),
            "diameter": pa.array([0], pa.int64())}))
    ht = pa.concat_tables(tabs)
    order = pc.sort_indices(ht, sort_keys=[("d", "ascending")])
    ht = ht.take(order)
    d = ht["d"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = ht["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    total = int(n.sum())
    cum = np.cumsum(n)
    eff = int(d[np.searchsorted(cum, percentile * total)])
    mean = round(float((d * n).sum()) / total, 6)
    return rd.from_arrow(pa.table({
        "n_reachable_pairs": pa.array([total], pa.int64()),
        "mean_distance": pa.array([mean]),
        "effective_diameter": pa.array([eff], pa.int64()),
        "diameter": pa.array([int(d[-1])], pa.int64())}))
