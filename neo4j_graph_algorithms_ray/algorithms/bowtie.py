"""Bow-tie decomposition of a directed graph (Broder et al., "Graph
structure in the Web", WWW 2000) — the canonical macro-structure report
for crawl-scale link graphs.

Every vertex is classified relative to the largest SCC (the CORE):

- ``CORE``          — member of the giant SCC;
- ``IN``            — reaches the core but is not reached by it;
- ``OUT``           — reached from the core but does not reach it;
- ``TENDRIL``       — weakly connected to the core without reaching or
  being reached by it (includes Broder's tubes);
- ``DISCONNECTED``  — in another weak component entirely.

Not a reference operator (the reference stops at SCC,
algo/.../impl/multistepscc/MultistepSCC.java) — it composes the
reference's SCC with three BSP reachability fixpoints, all on the
resident CSR shards:

1. :func:`scc.scc` — leaves the dense ``component`` state on the cached
   (graph, P, reverse=True) engine (GraphCatalog.engine contract:
   engines and their state vectors persist per key);
2. forward min-propagation of a 0/1 core indicator → OUT;
3. the same over the reverse CSR (state resident on the rev shards) →
   IN;
4. an alternating fwd/rev min fixpoint → weak reachability from the
   core (TENDRIL vs DISCONNECTED).

Each fixpoint is the WCC kernel (hash-min over the CSR), so the whole
report costs O((diameter) · E/P) per phase with no driver-side arrays —
the only driver materialization is the SCC size top-1 row.
"""

from __future__ import annotations

import time
from typing import Optional

from neo4j_graph_algorithms_ray.algorithms.common import (
    IterativeResult, attach_node_ids, default_partitions, get_engine)
from neo4j_graph_algorithms_ray.graph import GraphTables

CATEGORIES = ("CORE", "IN", "OUT", "TENDRIL", "DISCONNECTED")


def bowtie(
    g: GraphTables,
    *,
    num_partitions: Optional[int] = None,
    max_iterations: int = 10_000,
    node_col: str = "node",
) -> IterativeResult:
    """Per-vertex bow-tie category → (node, category) with
    ``category`` one of :data:`CATEGORIES`."""
    from neo4j_graph_algorithms_ray.algorithms.scc import scc
    P = default_partitions(g, num_partitions)
    t0 = time.perf_counter()
    scc_res = scc(g, num_partitions=P)
    # same cache key as scc's engine → its dense "component" state is
    # still resident on the shards
    eng = get_engine(g, P, reverse=True)

    # giant SCC id in dense-vid space; dense vids ascend in original-id
    # order so the "component ASC" tie-break matches an ORDER BY on the
    # original (string) ids
    top = (eng.state_dataset(["component"]).groupby("component").count()
           .sort(["count()", "component"], descending=[True, False])
           .limit(1).take_all())
    giant = int(top[0]["component"])

    eng.init_state("__one", "const", 1, dtype="int8")
    eng.apply_state("core", "flag_and_eq", "__one", "component", giant,
                    dtype="int8")

    def _fixpoint(state: str, *, rev: bool) -> int:
        """Min-propagate ``state`` (0 on seeds, 1 elsewhere) to fixpoint
        over one CSR direction; state and frontier live on the scatter
        actors."""
        acts = eng.rev_actors if rev else eng.actors
        eng.init_state("changed", "const", 1, dtype="int8", rev=rev)
        it = 0
        while it < max_iterations:
            op = "min_state" if it == 0 else "min_state_delta"
            stats = eng.step(op, "min_update", actors=acts,
                             update_actors=acts,
                             scatter_kw={"name": state},
                             update_kw={"name": state,
                                        "track_changed": True})
            it += 1
            if sum(s["changed"] for s in stats) == 0:
                break
        return it

    # OUT: forward reach from the core
    eng.apply_state("reach_f", "where_pos", "core", 0, 1, dtype="int64")
    it_f = _fixpoint("reach_f", rev=False)

    # IN: reach over the reverse CSR (rev shards hold their own state)
    eng.copy_state("core", to_rev=True)
    eng.apply_state("reach_b", "where_pos", "core", 0, 1, dtype="int64",
                    rev=True)
    it_b = _fixpoint("reach_b", rev=True)
    eng.copy_state("reach_b", to_rev=False)

    # weak reachability from the core: alternate fwd + rev scatters,
    # both applying min onto the forward-side state (rev scatter routes
    # by original src so update_actors=fwd is the backward half-step)
    eng.apply_state("wreach", "where_pos", "core", 0, 1, dtype="int64")
    eng.init_state("changed", "const", 1, dtype="int8")
    it_w = 0
    while it_w < max_iterations:
        eng.copy_state("wreach", to_rev=True)
        s1 = eng.step("min_state", "min_update",
                      scatter_kw={"name": "wreach"},
                      update_kw={"name": "wreach", "track_changed": True})
        s2 = eng.step("min_state", "min_update",
                      actors=eng.rev_actors, update_actors=eng.actors,
                      scatter_kw={"name": "wreach"},
                      update_kw={"name": "wreach", "track_changed": True})
        it_w += 1
        if sum(s["changed"] for s in s1) + sum(s["changed"] for s in s2) == 0:
            break

    # classify: DISCONNECTED base → TENDRIL → OUT → IN → CORE
    eng.apply_state("__w1", "ge", "wreach", 1)           # 1 ⇔ not weak-reach
    eng.apply_state("cat", "where_pos", "__w1", 4, 3, dtype="int64")
    eng.apply_state("__nf", "scale", "reach_f", -1)
    eng.apply_state("__isout", "add", "__nf", 1)         # 1 ⇔ reach_f == 0
    eng.apply_state("cat", "where_pos", "__isout", 2, "cat", dtype="int64")
    eng.apply_state("__nb", "scale", "reach_b", -1)
    eng.apply_state("__isin", "add", "__nb", 1)          # 1 ⇔ reach_b == 0
    eng.apply_state("cat", "where_pos", "__isin", 1, "cat", dtype="int64")
    eng.apply_state("cat", "where_pos", "core", 0, "cat", dtype="int64")
    eng.drop_states(["__one", "__w1", "__nf", "__isout", "__nb", "__isin"])

    ds = eng.state_dataset(["cat"])

    def _label(batch):
        import pyarrow as pa
        codes = batch["cat"]
        names = pa.DictionaryArray.from_arrays(
            codes.combine_chunks().cast(pa.int32()),
            pa.array(CATEGORIES)).cast(pa.string())
        return batch.drop_columns(["cat"]).append_column("category", names)

    ds = ds.map_batches(_label, batch_format="pyarrow")
    ds = attach_node_ids(g, ds, out_col=node_col)
    elapsed = time.perf_counter() - t0
    return IterativeResult(
        dataset=ds, iterations=it_f + it_b + it_w, converged=True,
        metrics=[eng.drain_metrics()],
        stats={"computeSec": elapsed, "scc_rounds": scc_res.iterations,
               "fwd_iters": it_f, "bwd_iters": it_b, "weak_iters": it_w})
