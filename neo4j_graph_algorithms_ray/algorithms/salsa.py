"""SALSA — Stochastic Approach for Link-Structure Analysis (Lempel &
Moran, WWW 2000).

Beyond-reference link-graph operator (the reference ships PageRank,
`PageRankProc.java`; SALSA is the random-walk cousin of HITS): hub and
authority scores are the stationary distributions of two Markov chains
on the bipartite hub/authority view of the link graph —
    authority chain:  a'(j) = Σ_{i→j} (1/outdeg(i)) Σ_{i→k} a(k)/indeg(k)
    hub chain:        h'(i) = Σ_{i→j} (1/indeg(j))  Σ_{v→j} h(v)/outdeg(v)
each L1-normalized per round (the chains are sub-stochastic only at
dangling/sourceless vertices, so the explicit normalization keeps a
fixed-k unrolled SQL mirror exact).

Engine mapping: each half-step is one ``sum_state`` scatter — the
backward halves (sums over out-neighbors) run on the reverse CSR layout
with state shipped shard-to-shard in aligned ranges (the HITS hub-pull
pattern, hits.py:49), the forward halves on the forward shards; the
per-degree divisions are shard-local ``div0`` transforms. No
driver-side vectors; 4 supersteps per iteration.
"""

from __future__ import annotations

import time
from typing import Optional

from neo4j_graph_algorithms_ray.algorithms.common import (
    IterativeResult, attach_node_ids, get_engine)
from neo4j_graph_algorithms_ray.graph import GraphTables


def salsa(
    g: GraphTables,
    max_iterations: int = 20,
    *,
    num_partitions: Optional[int] = None,
    keep_vid: bool = False,
    node_col: str = "node",
) -> IterativeResult:
    """Returns (node, hub, authority), each L1-normalized, after
    ``max_iterations`` synchronous rounds (fixed-k for oracle parity).
    Scores start uniform at 1.0 (pre-normalization mirrors the SQL)."""
    eng = get_engine(g, num_partitions, reverse=True)
    eng.init_state("a", "const", 1.0)
    eng.init_state("h", "const", 1.0)
    eng.init_state("indeg", "const", 0.0)
    eng.step("in_degree_count", "add_update", update_kw={"name": "indeg"})
    eng.apply_state("outdeg", "degree")

    t0 = time.perf_counter()
    for _ in range(max_iterations):
        # ---- authority chain: back half then forward half ----
        # t(i) = Σ_{i→j} a(j)/indeg(j) — out-neighbor sum via the
        # reverse layout (its scatter routes by original src)
        eng.apply_state("a_div", "div0", "a", "indeg")
        eng.copy_state("a_div", to_rev=True)
        eng.step("sum_state", "set_sum_update",
                 actors=eng.rev_actors, update_actors=eng.actors,
                 scatter_kw={"name": "a_div"}, update_kw={"name": "t"})
        # a'(j) = Σ_{i→j} t(i)/outdeg(i) — in-neighbor sum, forward CSR
        eng.apply_state("t_div", "div0", "t", "outdeg")
        eng.step("sum_state", "set_sum_update",
                 scatter_kw={"name": "t_div"}, update_kw={"name": "a"})
        s = eng.state_sum("a") or 1.0
        eng.apply_state("a", "scale", "a", 1.0 / s)
        # ---- hub chain: forward half then back half ----
        # u(j) = Σ_{i→j} h(i)/outdeg(i)
        eng.apply_state("h_div", "div0", "h", "outdeg")
        eng.step("sum_state", "set_sum_update",
                 scatter_kw={"name": "h_div"}, update_kw={"name": "u"})
        # h'(i) = Σ_{i→j} u(j)/indeg(j)
        eng.apply_state("u_div", "div0", "u", "indeg")
        eng.copy_state("u_div", to_rev=True)
        eng.step("sum_state", "set_sum_update",
                 actors=eng.rev_actors, update_actors=eng.actors,
                 scatter_kw={"name": "u_div"}, update_kw={"name": "h"})
        s = eng.state_sum("h") or 1.0
        eng.apply_state("h", "scale", "h", 1.0 / s)
    elapsed = time.perf_counter() - t0

    ds = eng.state_dataset(["h", "a"]).rename_columns(
        {"h": "hub", "a": "authority"})
    ds = attach_node_ids(g, ds, out_col=node_col, keep_vid=keep_vid)
    return IterativeResult(
        dataset=ds, iterations=max_iterations, converged=False, metrics=[],
        stats={"computeSec": elapsed, "nodes": g.num_vertices,
               "edges": g.num_edges},
    )


__all__ = ["salsa"]
