"""Approximate Neighborhood Function (ANF) and effective diameter.

The reference library estimates diameters only via per-source BFS
sampling (our ``eccentricity``); ANF (Palmer, Gibbons & Faloutsos,
KDD'02 — the precursor of HyperANF, Boldi et al. WWW'11) estimates the
FULL distance distribution N(h) = #{(u,v) : u≠v, dist(u→v) ≤ h} in
O(diameter) supersteps with k·8 bytes of state per node, making it the
standard web-graph "how far is everything" primitive at 10^12-doc
scale where exact all-pairs is unthinkable.

Ray shape: each node holds k Flajolet-Martin bitmasks (one geometric
bit per hash fn at init); one BSP superstep per hop ORs frontier
sketches along edges (``bits_wave`` / ``bits_wave_update`` in
state/shards.py — the k-column generalization of the MSBFS bitset
exchange, delta-only messages, map-side OR combine, or2d two-level
aggregation). After each hop a k·8-byte-per-shard estimate partial is
summed on the driver — no per-node data ever leaves the shards.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np
import pyarrow as pa
import ray.data as rd

from neo4j_graph_algorithms_ray.algorithms.common import (
    IterativeResult, get_engine)
from neo4j_graph_algorithms_ray.graph import GraphTables


def anf(
    g: GraphTables,
    *,
    k_hashes: int = 16,
    max_hops: int = 64,
    seed: int = 1,
    ratio: float = 0.9,
    num_partitions: Optional[int] = None,
) -> IterativeResult:
    """Estimate the neighborhood function → Dataset (hop, n_pairs_est)
    for hop = 1..convergence, n_pairs_est ≈ #{(u,v): u≠v,
    dist(u→v) ≤ hop}. Stats carry the effective diameter (smallest hop
    reaching ``ratio`` of the final pair count), the total reachable
    pair estimate, and the superstep count. Relative error ~1.2/√k.
    """
    eng = get_engine(g, num_partitions)
    eng.anf_init(k_hashes, seed)
    n = g.num_vertices
    base = eng.anf_estimate()  # h=0: every sketch holds only its owner
    hops: list[int] = []
    pairs: list[float] = []
    t0 = time.perf_counter()
    supersteps = 0
    for h in range(1, max_hops + 1):
        stats = eng.step("bits_wave", "bits_wave_update")
        supersteps += 1
        if sum(s["new_visits"] for s in stats) == 0:
            break
        # subtract the exactly-known self-pair mass (h=0 estimate)
        # instead of n: FM bias then cancels between the two estimates
        est = max(eng.anf_estimate() - base, 0.0)
        hops.append(h)
        pairs.append(est)
    elapsed = time.perf_counter() - t0
    metrics = eng.drain_metrics()
    total = pairs[-1] if pairs else 0.0
    eff = 0
    for h, p in zip(hops, pairs):
        if total > 0 and p >= ratio * total:
            eff = h
            break
    ds = rd.from_arrow(pa.table({
        "hop": pa.array(hops, pa.int64()),
        "n_pairs_est": pa.array(np.round(pairs, 3), pa.float64())}))
    return IterativeResult(
        dataset=ds, iterations=supersteps, converged=True, metrics=[metrics],
        stats={"computeSec": elapsed, "effective_diameter": eff,
               "total_pairs_est": total, "k_hashes": k_hashes,
               "nodes": n})
