"""Link-prediction scores over the directed link graph.

Beyond-reference operator family (classic web/IR link-prediction
measures — Liben-Nowell & Kleinberg, CIKM 2003; newer neo4j releases
ship them as ``algo.linkprediction.*``): for candidate page pairs
(a, b) that share at least one in-linking source,
    n_common        = |in(a) ∩ in(b)|
    adamic_adar     = Σ_{z ∈ in(a) ∩ in(b)} 1 / ln(outdeg(z))
    jaccard         = n_common / (indeg(a) + indeg(b) − n_common)
    pref_attachment = indeg(a) · indeg(b)

Scale shape (the co-citation discipline, cocitation.py): candidate
generation explodes wedges per shared source z with a hard out-degree
cap (a deg-10^6 hub would emit 5·10^11 pairs) — each shard emits its
locally pre-summed (a, b, n, w) partials from the vid-sorted CSR
(state/shards.py copair_scores), a hierarchical ``preagg_sum`` combines
them without a full shuffle, in-degrees come from one
``in_degree_count`` superstep and join in via the broadcast regime.
Scores are rounded to 1e-6 BEFORE the top-k sort so float summation
order can't flip near-ties between the engine and a SQL oracle.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np
import pyarrow as pa
import ray.data as rd

from neo4j_graph_algorithms_ray.algorithms.common import (
    IterativeResult, get_engine, translate_vid_columns)
from neo4j_graph_algorithms_ray.graph import GraphTables


def link_prediction_topk(
    g: GraphTables,
    cap: int = 20,
    topk: int = 50,
    *,
    num_partitions: Optional[int] = None,
    col_a: str = "node_a",
    col_b: str = "node_b",
) -> IterativeResult:
    """Top-k candidate pairs by Adamic-Adar (ties broken by original-id
    order of (a, b)); returns (node_a, node_b, n_common, adamic_adar,
    jaccard, pref_attachment), floats rounded to 6 decimals."""
    from neo4j_graph_algorithms_ray.util import broadcast_join, preagg_sum

    eng = get_engine(g, num_partitions)
    t0 = time.perf_counter()
    eng.init_state("indeg", "const", 0.0)
    eng.step("in_degree_count", "add_update", update_kw={"name": "indeg"})
    indeg = eng.state_dataset(["indeg"])

    refs = [a.copair_scores.remote(cap) for a in eng.actors]
    pairs = preagg_sum(rd.from_arrow_refs(refs), ["a", "b"], ["n", "w"])
    pairs = broadcast_join(pairs, indeg.rename_columns({"indeg": "ia"}),
                           on="a", right_on="vid")
    pairs = broadcast_join(pairs, indeg.rename_columns({"indeg": "ib"}),
                           on="b", right_on="vid")

    def score(b: pa.Table) -> pa.Table:
        from neo4j_graph_algorithms_ray.functions.text import round6
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        w = b["w"].to_numpy(zero_copy_only=False)
        ia = b["ia"].to_numpy(zero_copy_only=False)
        ib = b["ib"].to_numpy(zero_copy_only=False)
        return pa.table({
            "a": b["a"], "b": b["b"],
            "n_common": b["n"],
            "adamic_adar": pa.array(round6(w)),
            "jaccard": pa.array(round6(n / (ia + ib - n))),
            "pref_attachment": pa.array((ia * ib).astype(np.int64)),
        })

    scored = pairs.map_batches(score, batch_format="pyarrow")
    top = scored.sort(["adamic_adar", "a", "b"],
                      descending=[True, False, False]).limit(topk)
    out = translate_vid_columns(g, top, ["a", "b"])
    out = out.rename_columns({"a": col_a, "b": col_b})
    out = out.sort(["adamic_adar", col_a, col_b],
                   descending=[True, False, False])
    elapsed = time.perf_counter() - t0
    return IterativeResult(
        dataset=out, iterations=1, converged=True, metrics=[],
        stats={"computeSec": elapsed, "nodes": g.num_vertices,
               "edges": g.num_edges},
    )


__all__ = ["link_prediction_topk"]
