"""HITS — hubs & authorities over the link graph (Kleinberg 1999).

Beyond-reference link-graph operator (the reference ships PageRank but
not HITS; same BSP machinery): per iteration
    auth(v) = Σ_{u→v} hub(u)   then auth /= ‖auth‖₂
    hub(u)  = Σ_{u→v} auth(v)  then hub  /= ‖hub‖₂
The auth pull runs on the forward CSR shards; the hub pull on the
reverse layout (state shipped shard-to-shard with aligned ranges, the
betweenness_bsp pattern). Normalization is a per-shard sum-of-squares
reduce + one broadcast scale — no driver-side vectors.
"""

from __future__ import annotations

import math
import time
from typing import Optional

from neo4j_graph_algorithms_ray.algorithms.common import (
    IterativeResult, attach_node_ids, get_engine)
from neo4j_graph_algorithms_ray.graph import GraphTables


def hits(
    g: GraphTables,
    max_iterations: int = 20,
    *,
    num_partitions: Optional[int] = None,
    keep_vid: bool = False,
    node_col: str = "node",
) -> IterativeResult:
    """Returns (node, hub, authority), L2-normalized, after
    ``max_iterations`` synchronous rounds (fixed-k for oracle parity)."""
    eng = get_engine(g, num_partitions, reverse=True)
    eng.init_state("hub", "const", 1.0)
    eng.init_state("auth", "const", 1.0)

    t0 = time.perf_counter()
    for _ in range(max_iterations):
        # auth := Σ_in hub (forward shards hold out-edges; their scatter
        # routes by dst, which IS the in-neighbor sum at the receiver)
        stats = eng.step("sum_state", "set_sum_update",
                         scatter_kw={"name": "hub"},
                         update_kw={"name": "auth"})
        norm = math.sqrt(sum(s["sumsq"] for s in stats)) or 1.0
        eng.apply_state("auth", "scale", "auth", 1.0 / norm)
        # hub := Σ_out auth — the reverse layout's scatter routes by
        # original src, i.e. the out-neighbor sum
        eng.copy_state("auth", to_rev=True)
        stats = eng.step("sum_state", "set_sum_update",
                         actors=eng.rev_actors, update_actors=eng.actors,
                         scatter_kw={"name": "auth"},
                         update_kw={"name": "hub"})
        norm = math.sqrt(sum(s["sumsq"] for s in stats)) or 1.0
        eng.apply_state("hub", "scale", "hub", 1.0 / norm)
    elapsed = time.perf_counter() - t0

    ds = eng.state_dataset(["hub", "auth"]).rename_columns({"auth": "authority"})
    ds = attach_node_ids(g, ds, out_col=node_col, keep_vid=keep_vid)
    return IterativeResult(
        dataset=ds, iterations=max_iterations, converged=False, metrics=[],
        stats={"computeSec": elapsed, "nodes": g.num_vertices,
               "edges": g.num_edges},
    )
