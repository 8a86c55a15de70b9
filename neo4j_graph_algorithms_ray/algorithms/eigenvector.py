"""Eigenvector centrality — power iteration on the BSP engine.

Beyond-reference link-graph operator (the reference ships PageRank,
`PageRankProc.java`; eigenvector centrality is the undamped variant):
per iteration
    x'(v) = Σ_{u→v} x(u)      then x' /= ‖x'‖₂
i.e. repeated multiplication by the adjacency transpose, converging to
the principal eigenvector. One `sum_state` scatter per iteration on the
forward CSR shards (routes by dst = in-neighbor sum at the receiver);
normalization is a per-shard sum-of-squares reduce + broadcast scale —
no driver-side vectors, same machinery as HITS (hits.py).
"""

from __future__ import annotations

import math
import time
from typing import Optional

from neo4j_graph_algorithms_ray.algorithms.common import (
    IterativeResult, attach_node_ids, get_engine)
from neo4j_graph_algorithms_ray.graph import GraphTables


def eigenvector(
    g: GraphTables,
    max_iterations: int = 20,
    *,
    num_partitions: Optional[int] = None,
    keep_vid: bool = False,
    node_col: str = "node",
) -> IterativeResult:
    """Returns (node, score), L2-normalized, after ``max_iterations``
    synchronous power-iteration rounds (fixed-k for oracle parity)."""
    eng = get_engine(g, num_partitions)
    eng.init_state("x", "const", 1.0)

    t0 = time.perf_counter()
    for _ in range(max_iterations):
        stats = eng.step("sum_state", "set_sum_update",
                         scatter_kw={"name": "x"},
                         update_kw={"name": "x_new"})
        norm = math.sqrt(sum(s["sumsq"] for s in stats)) or 1.0
        eng.apply_state("x", "scale", "x_new", 1.0 / norm)
    elapsed = time.perf_counter() - t0

    ds = eng.state_dataset(["x"]).rename_columns({"x": "score"})
    ds = attach_node_ids(g, ds, out_col=node_col, keep_vid=keep_vid)
    return IterativeResult(
        dataset=ds, iterations=max_iterations, converged=False, metrics=[],
        stats={"computeSec": elapsed, "nodes": g.num_vertices,
               "edges": g.num_edges},
    )


__all__ = ["eigenvector"]
