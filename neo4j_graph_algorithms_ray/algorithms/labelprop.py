"""Label propagation.

The implementation was deleted in the reference fork (only the stats
row, docs and disabled tests remain — SURVEY.md §2.4); semantics are
re-derived from doc/label-propagation.adoc and the expected iteration
traces in tests/.../impl/LabelPropagation420Test.java:37-60: initial
label = seed property when present else the node id; each (synchronous)
iteration every node adopts the weight-majority label among its
neighbors; report ``iterations`` and ``didConverge``
(algo/.../results/LabelPropagationStats.java:21-25).

Determinism: ties broken by the minimum label (the reference doc says
ties are broken "uniformly and randomly"; we fix min-label so exact
assignments are reproducible across partition counts — FIXTURES.md §1.3).

Update schedule: the reference runs LPA *asynchronously* and shuffles
node order precisely because fully synchronous updates oscillate
(LabelPropagation420Test.java comment block: "labels for Charles, Doug
and Mark oscillate … LPA runs asynchronous"). The deterministic
distributed equivalent used here is **alternating-parity
semi-synchronous** updates: in superstep t only vertices with
``vid % 2 == t % 2`` adopt new labels (a fixed 2-coloring of the update
order). This converges on the reference's own oscillating fixture to
the documented partition, and is exactly reproducible at any partition
count. ``mode="sync"`` gives the textbook synchronous variant.

Direction: the gather direction is decided at graph build time — build
with ``undirected=True`` for BOTH (the doc's default examples), or pass
the directed edge table for OUTGOING-push semantics (a node's label is
influenced by its in-neighbors).
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np

from neo4j_graph_algorithms_ray.algorithms.common import (
    IterativeResult, attach_node_ids, ensure_ckpt_dir, get_engine)
from neo4j_graph_algorithms_ray.graph import GraphTables
from neo4j_graph_algorithms_ray.state.checkpoint import read_manifest, write_manifest


def label_propagation(
    g: GraphTables,
    max_iterations: int = 10,
    *,
    seeds: Optional[tuple[np.ndarray, np.ndarray]] = None,
    seed_dataset=None,
    num_partitions: Optional[int] = None,
    weighted: bool = False,
    mode: str = "semi",
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 0,
    resume: bool = False,
    keep_vid: bool = False,
) -> IterativeResult:
    """Synchronous LPA with deterministic min-label tie-break.

    ``seeds``: optional (node_original_ids, labels) arrays — the
    reference's ``partition`` seed property. ``seed_dataset``: Dataset
    with (node, label) columns for large seed tables.
    """
    eng = get_engine(g, num_partitions, weighted=weighted)
    config = {"P": eng.P, "max_iterations": max_iterations}

    start_iter = 0
    if resume:
        ckpt = ensure_ckpt_dir("lpa", g, checkpoint_dir)
        man = read_manifest(ckpt)
        if man and man.get("algo") == "lpa":
            start_iter = man["iteration"]
            eng.restore(ckpt, start_iter, ["label"])
    if start_iter == 0:
        eng.init_state("label", "vid")
        if seeds is not None:
            from neo4j_graph_algorithms_ray.algorithms.common import \
                node_to_vid_map
            node_ids, labels = seeds
            ids = list(node_ids) if isinstance(node_ids, (list, tuple)) \
                else node_ids.to_pylist() if hasattr(node_ids, "to_pylist") \
                else list(np.asarray(node_ids))
            nm = node_to_vid_map(g, ids)  # small seed set, distributed filter
            vids = np.array([nm[x] for x in ids], dtype=np.int64)
            eng.set_state_from_table("label", vids, np.asarray(labels, dtype=np.int64))
        elif seed_dataset is not None:
            joined = seed_dataset.join(g.vertices, "inner", num_partitions=max(2, eng.P),
                                       on=("node",))
            # corpus-sized seed tables stream straight from the map
            # tasks into the owning shard actors — never via the driver
            eng.set_state_from_dataset("label", joined,
                                       vid_col="vid", val_col="label")

    metrics, it, converged = [], start_iter, False
    quiet_streak = 0
    t0 = time.perf_counter()
    while it < max_iterations:
        kw = {"parity": it % 2} if mode == "semi" else {}
        stats = eng.step("lpa", "lpa_update", scatter_kw=kw, update_kw=kw)
        it += 1
        changed = sum(s["changed"] for s in stats)
        if checkpoint_every and (it % checkpoint_every == 0):
            ckpt = ensure_ckpt_dir("lpa", g, checkpoint_dir)
            iter_metrics = eng.drain_metrics()
            for m in iter_metrics:
                m["through_iteration"] = it
            metrics.append(iter_metrics)
            parts = eng.checkpoint(ckpt, it, ["label"])
            write_manifest(ckpt, iteration=it, algo="lpa", config=config,
                           partitions=parts, metrics=iter_metrics,
                           extra={"changed": changed})
        quiet_streak = quiet_streak + 1 if changed == 0 else 0
        # semi mode needs a full even+odd cycle without changes
        if quiet_streak >= (2 if mode == "semi" else 1):
            converged = True
            break
    elapsed = time.perf_counter() - t0
    final_metrics = eng.drain_metrics()
    for m in final_metrics:
        m["through_iteration"] = it
    metrics.append(final_metrics)

    ds = eng.state_dataset(["label"])
    ds = attach_node_ids(g, ds, keep_vid=keep_vid)
    return IterativeResult(
        dataset=ds, iterations=it - start_iter, converged=converged, metrics=metrics,
        stats={"computeSec": elapsed, "didConverge": converged,
               "nodes": g.num_vertices},
    )
