"""Neighborhood feature aggregation — the GNN-style message-passing
primitive (mean of a neighbor feature per node), composed entirely from
existing BSP engine ops: one ``sum_state`` scatter for the feature sum,
one ``in_degree_count`` scatter for the divisor, a ``div0`` shard-local
finalize. Not in the reference library (its closest primitive is the
per-node neighbor iteration every centrality uses); this is the feature
engineering step a web-scale ML pipeline runs over the link graph
("average authority of pages linking here").
"""

from __future__ import annotations

from typing import Optional

import ray.data as rd

from neo4j_graph_algorithms_ray.algorithms.common import (attach_node_ids,
                                                          get_engine)
from neo4j_graph_algorithms_ray.graph import GraphTables


def neighbor_degree_mean(g: GraphTables, *,
                         num_partitions: Optional[int] = None,
                         node_col: str = "node") -> rd.Dataset:
    """Per node v: mean out-degree of its in-neighbors (0 when v has no
    in-edges) → (node, in_degree, nbr_degree_mean). One superstep per
    aggregate; no edge ever moves."""
    eng = get_engine(g, num_partitions)
    eng.apply_state("feat", "degree", dtype="float64")
    eng.init_state("nbrsum", "const", 0.0)
    eng.init_state("indeg", "const", 0, dtype="int64")
    eng.step("sum_state", "add_update",
             scatter_kw={"name": "feat"}, update_kw={"name": "nbrsum"})
    eng.step("in_degree_count", "add_update", update_kw={"name": "indeg"})
    eng.apply_state("nbr_degree_mean", "div0", "nbrsum", "indeg",
                    dtype="float64")
    ds = eng.state_dataset(["indeg", "nbr_degree_mean"]) \
            .rename_columns({"indeg": "in_degree"})
    eng.drop_states(["feat", "nbrsum", "indeg", "nbr_degree_mean"])
    return attach_node_ids(g, ds, out_col=node_col)


def degree_assortativity(g: GraphTables, *,
                         num_partitions: Optional[int] = None) -> rd.Dataset:
    """Directed degree assortativity: Pearson correlation over edges
    (u→v) between outdeg(u) and indeg(v) — the Newman (2002) mixing
    coefficient, the standard first-order web-graph structure statistic
    (hub-to-hub vs hub-to-leaf wiring).

    Scale shape: every Σ over edges factorizes through per-destination
    sums the scatter already computes — Σ x·y = Σ_v indeg(v)·sumx(v),
    Σ x = Σ_v sumx(v), Σ y^k = Σ_v indeg(v)^(k+1) — so the whole
    statistic is two sum_state scatters + one in-degree superstep +
    shard-local products; only 6 scalars reach the driver."""
    import math

    import pyarrow as pa

    eng = get_engine(g, num_partitions)
    eng.apply_state("feat", "degree", dtype="float64")
    eng.apply_state("feat2", "mul", "feat", "feat", dtype="float64")
    eng.init_state("nbrsum", "const", 0.0)
    eng.init_state("nbrsum2", "const", 0.0)
    eng.init_state("indeg", "const", 0, dtype="int64")
    eng.step("sum_state", "add_update",
             scatter_kw={"name": "feat"}, update_kw={"name": "nbrsum"})
    eng.step("sum_state", "add_update",
             scatter_kw={"name": "feat2"}, update_kw={"name": "nbrsum2"})
    eng.step("in_degree_count", "add_update", update_kw={"name": "indeg"})
    eng.apply_state("y2", "mul", "indeg", "indeg", dtype="float64")
    eng.apply_state("y3", "mul", "y2", "indeg", dtype="float64")
    eng.apply_state("xy", "mul", "indeg", "nbrsum", dtype="float64")
    n = eng.state_sum("indeg")
    sx = eng.state_sum("nbrsum")
    sxx = eng.state_sum("nbrsum2")
    sy = eng.state_sum("y2")
    syy = eng.state_sum("y3")
    sxy = eng.state_sum("xy")
    eng.drop_states(["feat", "feat2", "nbrsum", "nbrsum2", "indeg",
                     "y2", "y3", "xy"])
    num = n * sxy - sx * sy
    den = math.sqrt(max(n * sxx - sx * sx, 0.0)) \
        * math.sqrt(max(n * syy - sy * sy, 0.0))
    from neo4j_graph_algorithms_ray.util import round6
    r = round6(num / den) if den > 0 else 0.0
    return rd.from_arrow(pa.table({
        "n_edges": pa.array([int(n)], pa.int64()),
        "assortativity": pa.array([r], pa.float64())}))


__all__ = ["neighbor_degree_mean", "degree_assortativity"]


def two_hop_size(g: GraphTables, *, num_partitions: Optional[int] = None,
                 node_col: str = "node") -> rd.Dataset:
    """Per node: |{u ≠ v reachable from v in ≤ 2 directed hops}| →
    (``node_col``, n_reach2). The friends-of-friends / crawl-frontier
    size signal — a cheap structural feature that separates hub-adjacent
    pages from periphery without running a full BFS.

    Scale shape: one self-join of the dense-id edge table
    (``util.broadcast_join`` — the second-hop side broadcasts once via
    ``ray.put`` below the 5M-row limit, hash-shuffles above), a
    map-side-distinct union with the 1-hop edges, and a combined
    groupby-count. Hub caveat (documented, not hidden): a vertex whose
    out-neighbors total D₂ second-hop edges expands to D₂ join rows —
    the same quadratic blowup every 2-hop query has; cap or sample
    upstream when D₂ per vertex is unbounded."""
    import numpy as np
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.util import (broadcast_join,
                                                 preagg_sum, predistinct)

    e = g.edges.select_columns(["src", "dst"])
    hop2 = broadcast_join(e, e, on="dst", right_on="src") \
        .select_columns(["src", "dst_b"]) \
        .rename_columns({"dst_b": "d"})
    hop1 = e.rename_columns({"dst": "d"})
    both = predistinct(hop1.union(hop2), ["src", "d"]) \
        .filter(expr="src != d")

    def ones(b: pa.Table) -> pa.Table:
        return pa.table({"vid": b["src"],
                         "n_reach2": pa.array(np.ones(b.num_rows, np.int64))})

    agg = preagg_sum(both.map_batches(ones, batch_format="pyarrow"),
                     ["vid"], "n_reach2")
    return attach_node_ids(g, agg, out_col=node_col)
