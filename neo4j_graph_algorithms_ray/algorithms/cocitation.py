"""Co-citation similarity over the link graph.

Two pages are co-cited when the same source page links to both — the
classic link-structure similarity signal (Small 1973; "related pages"
in early web search). The reference library has no co-citation proc;
this is a beyond-reference link-graph operator built on the same CSR
shards as the BSP algorithms.

Scale shape: pairs are generated INSIDE each source-range shard from
its resident vid-sorted adjacency (no edge ever moves), with a hard
out-degree cap — the DF-cap discipline that keeps the pair count
linear-ish at web scale (a deg-10^6 hub would emit 5·10^11 pairs; it
carries no similarity signal anyway). Local pre-counts flow through
``util.preagg_sum``'s map-side combine, so the exchange carries
per-shard-distinct pairs only, and top-k is a sort over the combined
counts.
"""

from __future__ import annotations

from typing import Optional

import ray
import ray.data as rd

from neo4j_graph_algorithms_ray.algorithms.common import get_engine
from neo4j_graph_algorithms_ray.graph import GraphTables


def cocitation_topk(g: GraphTables, cap: int = 20, topk: int = 50,
                    *, num_partitions: Optional[int] = None,
                    col_a: str = "node_a", col_b: str = "node_b") -> rd.Dataset:
    """Top-k co-cited pairs: (node_a, node_b, n_common) where n_common
    counts distinct sources with 2 <= outdeg <= ``cap`` linking to
    both. a < b in original-id order; ties broken by (node_a, node_b).
    """
    from neo4j_graph_algorithms_ray.algorithms.common import translate_vid_columns
    from neo4j_graph_algorithms_ray.util import preagg_sum

    eng = get_engine(g, num_partitions)
    refs = [a.copair_counts.remote(cap) for a in eng.actors]
    parts = rd.from_arrow_refs(refs)
    counts = preagg_sum(parts, ["a", "b"], "n")
    # vid order == original-id order, so sorting by (n desc, a, b) on
    # vids picks the same top-k rows as the SQL oracle's
    # (n desc, url_a, url_b)
    top = counts.sort(["n", "a", "b"], descending=[True, False, False]) \
                .limit(topk)
    out = translate_vid_columns(g, top, ["a", "b"])
    out = out.rename_columns({"a": col_a, "b": col_b, "n": "n_common"})
    return out.sort(["n_common", col_a, col_b],
                    descending=[True, False, False])


__all__ = ["cocitation_topk"]
