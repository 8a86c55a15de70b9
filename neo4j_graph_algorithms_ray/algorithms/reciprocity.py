"""Edge reciprocity over a directed edge table.

Fraction of directed edges whose reverse edge also exists — the
standard first-order link-graph symmetry statistic (mutual links are a
strong same-site / navigation-template signal on the web). Not in the
reference library; a beyond-reference link-graph operator.

Scale shape: one streaming pass over the DISTINCT edge table. Each
edge folds into its unordered pair key with an orientation value
(src<dst → 1, src>dst → 2); util.preagg_sum's map-side combine means
the exchange carries per-batch-distinct pairs, and a pair's summed
orientation is 3 iff both directions exist. No joins, no driver-side
edge materialization — the final reduce is three scalars.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


def edge_reciprocity(edges: rd.Dataset, src_col: str = "src",
                     dst_col: str = "dst") -> rd.Dataset:
    """One-row Dataset (total_edges, reciprocal_edges, reciprocity)
    over a distinct directed edge table with no self-loops."""
    import pyarrow.compute as pc

    from neo4j_graph_algorithms_ray.util import preagg_sum

    def orient(b: pa.Table) -> pa.Table:
        s, d = b[src_col], b[dst_col]
        lt = pc.less(s, d)
        o = pc.if_else(lt, pa.scalar(1, pa.int64()), pa.scalar(2, pa.int64()))
        return pa.table({"a": pc.min_element_wise(s, d),
                         "b": pc.max_element_wise(s, d), "o": o})

    pairs = preagg_sum(edges.map_batches(orient, batch_format="pyarrow"),
                       ["a", "b"], "o")

    def reduce_part(b: pa.Table) -> pa.Table:
        o = b["o"].to_numpy(zero_copy_only=False)
        recip = int((o == 3).sum())
        total = int(len(o) - recip + 2 * recip)
        return pa.table({"total_edges": pa.array([total], pa.int64()),
                         "reciprocal_edges": pa.array([2 * recip], pa.int64())})

    parts = ray.get(pairs.map_batches(reduce_part, batch_format="pyarrow")
                    .to_arrow_refs())
    merged = pa.concat_tables([t for t in parts if t.num_rows])
    from neo4j_graph_algorithms_ray.util import round6
    total = int(pc.sum(merged["total_edges"]).as_py() or 0)
    recip = int(pc.sum(merged["reciprocal_edges"]).as_py() or 0)
    ratio = round6(recip / total) if total else 0.0
    return rd.from_arrow(pa.table({
        "total_edges": pa.array([total], pa.int64()),
        "reciprocal_edges": pa.array([recip], pa.int64()),
        "reciprocity": pa.array([ratio], pa.float64())}))


__all__ = ["edge_reciprocity"]
