"""Strongly-connected components — distributed Forward-Backward coloring.

Reference parity (SURVEY.md §2.4 scc row): the reference ships Tarjan
variants plus **MultistepSCC** = trim → Forward-Backward on a pivot →
MSColoring loop → Tarjan remainder
(algo/.../impl/multistepscc/MultistepSCC.java:43-70,102-130). Tarjan is
inherently sequential-shared-memory; the distributed-native equivalent
of its Multistep path is the FW-BW **coloring algorithm** (the
reference's own MultiStepColoring + MultiStepFWBW, generalized):

each round, among still-active vertices:
1. forward max-color propagation to fixpoint: ``color[v] = max vid
   that reaches v`` within the active subgraph (shards op
   ``max_state_masked`` — the same kernel as MSColoring.java:46-125);
2. every color root r (``color[r] == r``) backward-BFSes over the
   REVERSE CSR restricted to its own color region (op ``bwd_color``);
   the vertices reached form exactly SCC(r) [classic FW-BW argument:
   reached ⊆ color region ⊆ forward-reachable from r];
3. those vertices get ``component = color`` and deactivate; repeat.

All colors are processed simultaneously each round (one fixpoint per
phase, not per pivot), so rounds ≈ longest chain of nested SCC
condensation layers, not #SCCs.
"""

from __future__ import annotations

import time
from typing import Optional

from neo4j_graph_algorithms_ray.algorithms.common import (
    IterativeResult, attach_node_ids, get_engine)
from neo4j_graph_algorithms_ray.graph import GraphTables


def scc(
    g: GraphTables,
    *,
    num_partitions: Optional[int] = None,
    max_rounds: int = 10_000,
    trim_rounds: int = 1,
    node_col: str = "node",
) -> IterativeResult:
    """Exact SCCs of the directed graph → (node, component), component
    canonicalized to the max dense vid in the SCC (translated back to
    its original id).

    ``trim_rounds``: MultistepSCC's trim phase
    (algo/.../impl/multistepscc/MultistepSCC.java:43-70 — trim before
    FW-BW): vertices with no active in-edges OR no active out-edges
    are singleton SCCs; each trim round deactivates them in two
    supersteps (active in/out-degree via sum_state over the fwd and
    rev CSR) before the coloring loop ever touches them. Real web
    graphs shed a large leaf/source fringe here. More rounds cascade
    the trim (a removed sink exposes new sinks) at one full edge pass
    per round; the reference trims once."""
    eng = get_engine(g, num_partitions, reverse=True)
    eng.init_state("active", "const", 1, dtype="int8")
    eng.init_state("component", "const", -1, dtype="int64")
    supersteps, rounds, trimmed_total = 0, 0, 0
    t0 = time.perf_counter()
    remaining = g.num_vertices
    for _ in range(trim_rounds):
        if remaining == 0:
            break
        eng.copy_state("active", to_rev=True)
        # float64 indicator copy: sum_state reduceat in the state's own
        # dtype would wrap an int8 mask at in-degree > 127
        eng.apply_state("__actf", "copy", "active", dtype="float64")
        eng.apply_state("__actf", "copy", "active", dtype="float64", rev=True)
        eng.init_state("in_act", "const", 0.0)
        eng.init_state("out_act", "const", 0.0)
        eng.step("sum_state", "set_sum_update",
                 scatter_kw={"name": "__actf"}, update_kw={"name": "in_act"})
        eng.step("sum_state", "set_sum_update",
                 actors=eng.rev_actors, update_actors=eng.actors,
                 scatter_kw={"name": "__actf"}, update_kw={"name": "out_act"})
        supersteps += 2
        eng.apply_state("__trim", "trim", "active", "in_act", "out_act",
                        dtype="int8")
        ntrim = int(eng.state_sum("__trim"))
        if ntrim == 0:
            break
        eng.apply_state("component", "where_pos", "__trim", "vid", "component",
                        dtype="int64")
        eng.apply_state("active", "where_pos", "__trim", 0, "active",
                        dtype="int8")
        trimmed_total += ntrim
        remaining -= ntrim
    eng.drop_states(["in_act", "out_act", "__trim", "__actf"])
    eng.drop_states(["__actf"], rev=True)
    while remaining > 0 and rounds < max_rounds:
        rounds += 1
        # --- phase 1: forward max-color fixpoint over active subgraph ---
        eng.init_state("color", "vid")
        while True:
            stats = eng.step("max_state_masked", "max_update_masked",
                             scatter_kw={"name": "color"},
                             update_kw={"name": "color"})
            supersteps += 1
            if sum(s["changed"] for s in stats) == 0:
                break
        # --- phase 2: backward color-restricted reachability from roots ---
        eng.copy_state("color", to_rev=True)
        eng.copy_state("active", to_rev=True)
        eng.apply_state("in_bwd", "flag_and_eq", "active", "color", "vid",
                        dtype="int8", rev=True)
        eng.apply_state("bwd_frontier", "copy", "in_bwd", dtype="int8", rev=True)
        while True:
            stats = eng.step("bwd_color", "bwd_color_update",
                             actors=eng.rev_actors, update_actors=eng.rev_actors)
            supersteps += 1
            if sum(s["changed"] for s in stats) == 0:
                break
        # --- phase 3: fix components, deactivate, loop ---
        eng.copy_state("in_bwd", to_rev=False)
        eng.apply_state("component", "where_pos", "in_bwd", "color", "component",
                        dtype="int64")
        eng.apply_state("active", "where_pos", "in_bwd", 0, "active",
                        dtype="int8")
        remaining = int(eng.state_sum("active"))
    elapsed = time.perf_counter() - t0
    metrics = eng.drain_metrics()
    from neo4j_graph_algorithms_ray.algorithms.common import translate_vid_columns
    ds = eng.state_dataset(["component"])
    ds = translate_vid_columns(g, ds, ["component"])
    ds = attach_node_ids(g, ds, out_col=node_col)
    return IterativeResult(dataset=ds, iterations=rounds, converged=True,
                           metrics=[metrics],
                           stats={"computeSec": elapsed, "supersteps": supersteps,
                                  "trimmed": trimmed_total})
