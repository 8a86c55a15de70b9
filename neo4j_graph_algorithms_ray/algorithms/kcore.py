"""k-core decomposition by iterative peeling.

Beyond-reference link-graph operator: the k-core is the maximal
subgraph where every vertex keeps ≥ k neighbors — the classic
well-linkedness filter for web corpora (spam/doorway pages fall out of
low cores). Build the graph with ``undirected=True, dedup=True`` so
neighbor counts are proper set degrees.

Each round is one BSP superstep: scatter the active flag over all
edges (sum at the receiver = live-neighbor count), deactivate vertices
below k, stop at the fixpoint. Peeling is not frontier-sparse (every
round re-counts), but rounds are few on heavy-tailed graphs; the state
exchanged is one float per touched vertex.
"""

from __future__ import annotations

import time
from typing import Optional

from neo4j_graph_algorithms_ray.algorithms.common import (
    IterativeResult, attach_node_ids, get_engine)
from neo4j_graph_algorithms_ray.graph import GraphTables


def k_core(
    g: GraphTables,
    k: int,
    *,
    num_partitions: Optional[int] = None,
    max_rounds: int = 10_000,
    keep_vid: bool = False,
    node_col: str = "node",
) -> IterativeResult:
    """(node, in_core 0/1) membership of the k-core."""
    eng = get_engine(g, num_partitions)
    eng.init_state("active", "const", 1.0)
    prev = eng.state_sum("active")
    rounds, converged = 0, False
    t0 = time.perf_counter()
    while rounds < max_rounds:
        eng.step("sum_state", "set_sum_update",
                 scatter_kw={"name": "active"},
                 update_kw={"name": "kc_deg"})
        eng.apply_state("kc_keep", "ge", "kc_deg", float(k))
        eng.apply_state("active", "scale", "active", "kc_keep")
        rounds += 1
        cur = eng.state_sum("active")
        if cur == prev:
            converged = True
            break
        prev = cur
    elapsed = time.perf_counter() - t0

    import pyarrow as pa
    import pyarrow.compute as pc
    ds = eng.state_dataset(["active"])
    ds = ds.map_batches(
        lambda b: b.set_column(b.column_names.index("active"), "in_core",
                               pc.cast(b["active"], pa.int64())),
        batch_format="pyarrow")
    ds = attach_node_ids(g, ds, out_col=node_col, keep_vid=keep_vid)
    return IterativeResult(
        dataset=ds, iterations=rounds, converged=converged, metrics=[],
        stats={"computeSec": elapsed, "k": k, "nodes": g.num_vertices,
               "edges": g.num_edges, "in_core": int(prev)},
    )


def kcore_decomposition(
    g: GraphTables,
    *,
    num_partitions: Optional[int] = None,
    max_rounds: int = 10_000,
    keep_vid: bool = False,
    node_col: str = "node",
) -> IterativeResult:
    """Full core decomposition: (node, core) with core = the largest k
    such that the node survives in the k-core (isolated nodes → 0).
    The graded well-linkedness signal (spam rings and doorway pages
    concentrate in low cores; navigational cores sit high).

    Level-synchronous peel on the BSP engine: for k = 1, 2, … peel the
    current survivor set to the k-core fixpoint (each round one
    scatter of the live flag — receivers count live neighbors), then
    credit every survivor one core level. Supersteps total
    Σ_k rounds_k; state exchanged per round is one float per touched
    vertex, hub-proof via the engine's pre-aggregated exchange. Stops
    when the survivor set empties (k reached degeneracy + 1).
    """
    eng = get_engine(g, num_partitions)
    eng.init_state("active", "const", 1.0)
    eng.init_state("core", "const", 0.0)
    total_rounds, converged = 0, False
    t0 = time.perf_counter()
    prev = eng.state_sum("active")
    k = 1
    while total_rounds < max_rounds:
        # peel the survivor set down to the k-core fixpoint
        while total_rounds < max_rounds:
            eng.step("sum_state", "set_sum_update",
                     scatter_kw={"name": "active"},
                     update_kw={"name": "kc_deg"})
            eng.apply_state("kc_keep", "ge", "kc_deg", float(k))
            eng.apply_state("active", "mul", "active", "kc_keep")
            total_rounds += 1
            cur = eng.state_sum("active")
            if cur == prev:
                break
            prev = cur
        if prev == 0:
            converged = True
            break
        eng.apply_state("core", "add", "core", "active")
        k += 1
    elapsed = time.perf_counter() - t0

    import pyarrow as pa
    import pyarrow.compute as pc
    ds = eng.state_dataset(["core"])
    ds = ds.map_batches(
        lambda b: b.set_column(b.column_names.index("core"), "core",
                               pc.cast(pc.round(b["core"]), pa.int64())),
        batch_format="pyarrow")
    ds = attach_node_ids(g, ds, out_col=node_col, keep_vid=keep_vid)
    return IterativeResult(
        dataset=ds, iterations=total_rounds, converged=converged, metrics=[],
        stats={"computeSec": elapsed, "degeneracy": k - 1,
               "nodes": g.num_vertices, "edges": g.num_edges},
    )
