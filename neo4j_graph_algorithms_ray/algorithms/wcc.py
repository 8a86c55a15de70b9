"""Weakly-connected components (the reference's unionFind family).

The reference's parallel variants all compute per-thread partial
disjoint-set structures then merge them sequentially in shared memory
(algo/.../impl/ParallelUnionFind*.java,
core/.../core/utils/dss/DisjointSetStruct.java). A shared-memory DSS
merge has no distributed equivalent, so the idiomatic Ray form is
**min-label propagation to fixpoint** over the symmetrized edge table —
deterministic exact components with the canonical id = min dense vid in
the component (SURVEY.md §2.4 unionFind row, and MSColoring which is
the same kernel with max, algo/.../impl/MSColoring.java:46-125).

Per iteration: each shard scatters min(component[src]) per unique
destination (map-side combine), receivers take elementwise minima;
fixpoint when no component id changed — `changed` is itself an
aggregate, like the reference's DisjointSetStruct merge loop
termination. Weight-threshold unions (GraphUnionFind.java:82-104) are
supported by filtering the edge table before graph build.
"""

from __future__ import annotations

import time
from typing import Optional

from neo4j_graph_algorithms_ray.algorithms.common import (
    IterativeResult, attach_node_ids, ensure_ckpt_dir, get_engine)
from neo4j_graph_algorithms_ray.graph import GraphTables
from neo4j_graph_algorithms_ray.state.checkpoint import read_manifest, write_manifest


def wcc(
    g: GraphTables,
    *,
    num_partitions: Optional[int] = None,
    max_iterations: int = 10_000,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 0,
    resume: bool = False,
    keep_vid: bool = False,
    jump_every: int = 4,
    init_components: Optional[object] = None,
) -> IterativeResult:
    """Exact WCC. ``g`` must be built with ``undirected=True`` (the
    engine treats the edge table as directed; symmetrize at build time,
    like the reference's loadAsUndirected).

    ``jump_every``: every k-th superstep also runs a pointer-jumping
    shortcut (component[v] := component[component[v]], one gather
    exchange) — plain hash-min needs O(diameter) supersteps on
    chain-heavy graphs; periodic shortcutting makes label depth halve
    per jump, i.e. O(log d). Labels only ever decrease to an
    in-component vid, so the fixpoint (and the min-vid canonical id)
    is unchanged; 0 disables."""
    eng = get_engine(g, num_partitions)
    # pointer_jump follows the same exchange regimes as step(): direct
    # P² refs below NGA_TWO_LEVEL_P, √P union aggregators + broadcast
    # answers above it — safe to keep the shortcut on at any P.
    config = {"P": eng.P}

    start_iter = 0
    if resume:
        ckpt = ensure_ckpt_dir("wcc", g, checkpoint_dir)
        man = read_manifest(ckpt)
        if man and man.get("algo") == "wcc":
            start_iter = man["iteration"]
            eng.restore(ckpt, start_iter, ["component"])
    if start_iter == 0:
        eng.init_state("component", "vid")
        if init_components is not None:
            # incremental warm start: seed with a PRIOR run's (node,
            # component) labels, both original ids (edges only ever
            # added ⇒ old components are subsets of new ones and each
            # old label — its component's min id — sits inside the
            # same new component, so hash-min still converges to the
            # new min-id fixpoint, just from a much shallower depth).
            # Map the keyed node AND the label into this graph's vid
            # space, then stream into the shard actors.
            j1 = init_components.join(g.vertices, "inner",
                                      num_partitions=max(2, eng.P),
                                      on=("node",))
            vl = g.vertices.rename_columns({"node": "component",
                                            "vid": "cvid"})
            j2 = j1.join(vl, "inner", num_partitions=max(2, eng.P),
                         on=("component",))
            eng.set_state_from_dataset("component", j2, vid_col="vid",
                                       val_col="cvid")
    eng.init_state("changed", "const", 1, dtype="int8")

    metrics, it, converged, jumps = [], start_iter, False, 0
    t0 = time.perf_counter()
    while it < max_iterations:
        op = "min_state" if it == start_iter else "min_state_delta"
        stats = eng.step(op, "min_update",
                         scatter_kw={"name": "component"},
                         update_kw={"name": "component",
                                    "track_changed": True})
        it += 1
        changed = sum(s["changed"] for s in stats)
        if changed and jump_every and (it % jump_every == 0):
            # shortcut: relabeled vertices rejoin the changed frontier
            # so the next delta scatter pushes the jumped labels
            changed += eng.pointer_jump("component")
            jumps += 1
        if checkpoint_every and (it % checkpoint_every == 0):
            ckpt = ensure_ckpt_dir("wcc", g, checkpoint_dir)
            iter_metrics = eng.drain_metrics()
            for m in iter_metrics:
                m["through_iteration"] = it
            metrics.append(iter_metrics)
            parts = eng.checkpoint(ckpt, it, ["component"])
            write_manifest(ckpt, iteration=it, algo="wcc", config=config,
                           partitions=parts, metrics=iter_metrics,
                           extra={"changed": changed})
        if changed == 0:
            converged = True
            break
    elapsed = time.perf_counter() - t0
    final_metrics = eng.drain_metrics()
    for m in final_metrics:
        m["through_iteration"] = it
    metrics.append(final_metrics)

    ds = eng.state_dataset(["component"])
    ds = attach_node_ids(g, ds, keep_vid=keep_vid)
    return IterativeResult(
        dataset=ds, iterations=it - start_iter, converged=converged, metrics=metrics,
        stats={"computeSec": elapsed, "nodes": g.num_vertices,
               "edges": g.num_edges, "pointer_jumps": jumps},
    )


def wcc_component_sizes(result: IterativeResult):
    """setCount/setSize histogram parity
    (DisjointSetStruct.resultStream, dss/DisjointSetStruct.java:113-120)."""
    return result.dataset.groupby("component").count()


def mscoloring(
    g: GraphTables,
    *,
    num_partitions: Optional[int] = None,
    max_iterations: int = 10_000,
    node_col: str = "node",
) -> IterativeResult:
    """algo.unionFind.mscoloring parity (algo/.../impl/MSColoring.java:
    46-125): WCC by propagating the MAX node id as the component color
    until stable — the same shuffle kernel as wcc() with max instead of
    min (component canonical id = max dense vid → max original id).
    ``g`` must be built undirected."""
    eng = get_engine(g, num_partitions)
    eng.init_state("active", "const", 1, dtype="int8")
    eng.init_state("color", "vid")
    it, converged = 0, False
    import time as _t
    t0 = _t.perf_counter()
    while it < max_iterations:
        stats = eng.step("max_state_masked", "max_update_masked",
                         scatter_kw={"name": "color"},
                         update_kw={"name": "color"})
        it += 1
        if sum(s["changed"] for s in stats) == 0:
            converged = True
            break
    elapsed = _t.perf_counter() - t0
    metrics = eng.drain_metrics()
    from neo4j_graph_algorithms_ray.algorithms.common import translate_vid_columns
    ds = eng.state_dataset(["color"]).rename_columns({"color": "component"})
    ds = translate_vid_columns(g, ds, ["component"])
    ds = attach_node_ids(g, ds, out_col=node_col)
    return IterativeResult(dataset=ds, iterations=it, converged=converged,
                           metrics=[metrics], stats={"computeSec": elapsed})
