"""Per-node top-k neighborhood similarity over the link graph.

The GDS-style nodeSimilarity operator (newer neo4j releases ship it as
``gds.nodeSimilarity``; this reference fork predates it — a
beyond-reference operator): for every node, the k most similar other
nodes by Jaccard overlap of IN-neighborhoods,

    jaccard(a, b) = |in(a) ∩ in(b)| / |in(a) ∪ in(b)|

"two hosts are similar when the same hosts link to both" — the
normalized co-citation signal. Out-neighborhood similarity (GDS's
default orientation) is this operator over the reversed projection:
build the graph with src/dst swapped and pass it in.

Scale shape: candidate pairs are generated INSIDE each source-range
shard from the resident vid-sorted adjacency (state/shards.py
copair_counts) with the hard out-degree eligibility cap
(2 <= outdeg(z) <= cap) that keeps the pair count linear-ish at web
scale; per-shard pre-counts flow through ``preagg_sum``'s map-side
combine; in-degrees come from one ``in_degree_count`` superstep and
attach via the broadcast-join regime. Scores are rounded to 1e-6
BEFORE the per-node top-k so float ties can't flip rows against a SQL
oracle, and the top-k itself is the bounded-exchange
``topk_per_group`` reduction (k rows per batch per node leave any
worker).
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


def node_similarity_topk(
    g: GraphTables,
    cap: int = 20,
    k: int = 3,
    *,
    num_partitions: Optional[int] = None,
    col_a: str = "node_a",
    col_b: str = "node_b",
) -> IterativeResult:
    """For each node with at least one similar peer, its top-k peers by
    in-neighborhood Jaccard (ties: lower original id of the peer
    first). Returns (node_a, node_b, n_common, jaccard) sorted by
    (node_a, jaccard desc, node_b); jaccard rounded to 6 decimals.

    ``cap`` bounds the out-degree of the shared in-neighbors that
    generate candidate pairs (the web-scale hub cap — a deg-10^6 hub
    links to "everything" and carries no similarity signal); the
    Jaccard denominator still uses full in-degrees.
    """
    from neo4j_graph_algorithms_ray.util import (broadcast_join, preagg_sum,
                                                 topk_per_group)

    eng = get_engine(g, num_partitions)
    t0 = time.perf_counter()
    eng.init_state("indeg", "const", 0.0)
    eng.step("in_degree_count", "add_update", update_kw={"name": "indeg"})
    indeg = eng.state_dataset(["indeg"])

    refs = [a.copair_counts.remote(cap) for a in eng.actors]
    pairs = preagg_sum(rd.from_arrow_refs(refs), ["a", "b"], "n")
    pairs = broadcast_join(pairs, indeg.rename_columns({"indeg": "ia"}),
                           on="a", right_on="vid")
    pairs = broadcast_join(pairs, indeg.rename_columns({"indeg": "ib"}),
                           on="b", right_on="vid")

    def score_mirror(b: pa.Table) -> pa.Table:
        from neo4j_graph_algorithms_ray.functions.text import round6
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        ia = b["ia"].to_numpy(zero_copy_only=False)
        ib = b["ib"].to_numpy(zero_copy_only=False)
        j = round6(n / (ia + ib - n))
        a_arr = b["a"].to_numpy(zero_copy_only=False)
        b_arr = b["b"].to_numpy(zero_copy_only=False)
        # emit both orientations so the per-node top-k sees every peer
        return pa.table({
            "v": pa.array(np.concatenate([a_arr, b_arr])),
            "u": pa.array(np.concatenate([b_arr, a_arr])),
            "n_common": pa.array(np.concatenate(
                [b["n"].to_numpy(zero_copy_only=False)] * 2)),
            "jaccard": pa.array(np.concatenate([j, j])),
        })

    sym = pairs.map_batches(score_mirror, batch_format="pyarrow")
    # vid order == original-id order, so tie-breaking on vids picks the
    # same rows as the oracle's tie-break on original ids
    top = topk_per_group(sym, ["v"], "jaccard", k, tie_cols=["u"])
    out = translate_vid_columns(g, top, ["v", "u"])
    out = out.rename_columns({"v": col_a, "u": col_b})
    out = out.sort([col_a, "jaccard", col_b],
                   descending=[False, True, False])
    elapsed = time.perf_counter() - t0
    return IterativeResult(
        dataset=out, iterations=1, converged=True, metrics=[],
        stats={"computeSec": elapsed, "nodes": g.num_vertices,
               "edges": g.num_edges},
    )


__all__ = ["node_similarity_topk"]
