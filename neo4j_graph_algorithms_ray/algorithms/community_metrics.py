"""Community-quality metrics over a labeled partition.

Beyond-reference operator (partition scoring for LPA/Louvain output —
the conductance / cut-ratio family of Kannan, Vempala & Vetta (2004),
the standard cluster-quality report a community pipeline emits next to
its labels): given an edge table and a (node → label) assignment,
per community
    internal_edges = |{(u,v) : label(u) = label(v) = c}|
    cut_edges      = |{(u,v) : exactly one endpoint in c}|
    conductance    = cut / (2·internal + cut)

Scale shape: the label map joins onto the edge table through the
broadcast regime (ray.put once, vectorized probe per batch; hash
shuffle above the limit — util.broadcast_join), each batch emits
pre-counted per-community partials (a cut edge credits BOTH sides),
and a hierarchical ``preagg_sum`` reduces them — the edge table
streams, nothing materializes per-edge after the partial counts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd


def community_conductance(
    edges: rd.Dataset,
    labels: rd.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    label_col: str = "label",
) -> rd.Dataset:
    """Returns (community, n_nodes, internal_edges, cut_edges,
    conductance) sorted by community. ``labels`` must cover every edge
    endpoint (inner-join semantics drop unlabeled edges)."""
    from neo4j_graph_algorithms_ray.functions.text import round6
    from neo4j_graph_algorithms_ray.util import broadcast_join, preagg_sum

    # labels feeds three consumers (two probe joins + the size count):
    # pin the per-node table in the object store once instead of
    # re-executing its upstream pipeline per consumer
    lab = labels.select_columns([node_col, label_col]).materialize()
    e = broadcast_join(
        edges.select_columns([src_col, dst_col]),
        lab.rename_columns({node_col: "__n", label_col: "cs"}),
        on=src_col, right_on="__n")
    e = broadcast_join(
        e, lab.rename_columns({node_col: "__n", label_col: "cd"}),
        on=dst_col, right_on="__n")

    def partials(b: pa.Table) -> pa.Table:
        cs = b["cs"].to_numpy(zero_copy_only=False)
        cd = b["cd"].to_numpy(zero_copy_only=False)
        same = cs == cd
        diff = ~same
        # src-side credit for every edge; dst-side credit for cut edges
        comm = np.concatenate([cs, cd[diff]])
        internal = np.concatenate(
            [same.astype(np.int64), np.zeros(int(diff.sum()), np.int64)])
        cut = np.concatenate(
            [diff.astype(np.int64), np.ones(int(diff.sum()), np.int64)])
        return pa.table({"community": pa.array(comm),
                         "internal_edges": pa.array(internal),
                         "cut_edges": pa.array(cut)})

    agg = preagg_sum(e.map_batches(partials, batch_format="pyarrow"),
                     ["community"], ["internal_edges", "cut_edges"])

    sizes = preagg_sum(
        lab.map_batches(
            lambda b: pa.table({
                "community": b[label_col],
                "n_nodes": pa.array(np.ones(b.num_rows, np.int64))}),
            batch_format="pyarrow"),
        ["community"], ["n_nodes"])

    out = broadcast_join(agg, sizes, on="community")

    def finish(b: pa.Table) -> pa.Table:
        internal = b["internal_edges"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        cut = b["cut_edges"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        cond = np.divide(cut, 2 * internal + cut,
                         out=np.zeros_like(cut),
                         where=(2 * internal + cut) != 0)
        return b.append_column("conductance", pa.array(round6(cond)))

    return out.map_batches(finish, batch_format="pyarrow").sort("community")


def powerlaw_alpha(degrees: rd.Dataset, *, degree_col: str = "out_degree",
                   dmin: int = 2) -> rd.Dataset:
    """Power-law exponent MLE for a degree column (Clauset, Shalizi &
    Newman 2009, discrete approximation):

        α = 1 + n · [ Σ_{d_i ≥ dmin} ln(d_i / (dmin − ½)) ]⁻¹

    — the standard scale-free-ness summary of a web link graph.
    Returns one row (alpha, n_tail). Scale shape: per-batch scalar
    partials (a log-sum and a count), one driver-side add — the degree
    table streams, nothing shuffles."""
    from neo4j_graph_algorithms_ray.functions.text import round6
    from neo4j_graph_algorithms_ray.util import collect_arrow

    def partial(b: pa.Table) -> pa.Table:
        d = b[degree_col].to_numpy(zero_copy_only=False).astype(np.float64)
        d = d[d >= dmin]
        return pa.table({"s": pa.array([float(np.log(d / (dmin - 0.5)).sum())]),
                         "n": pa.array([len(d)], pa.int64())})

    s = n = 0.0
    for t in collect_arrow(degrees.map_batches(partial,
                                               batch_format="pyarrow")):
        if t.num_rows:
            s += t["s"].to_numpy(zero_copy_only=False).sum()
            n += int(t["n"].to_numpy(zero_copy_only=False).sum())
    alpha = 1.0 + n / s if s > 0 else 0.0
    return rd.from_arrow(pa.table({
        "alpha": pa.array(round6(np.array([alpha]))),
        "n_tail": pa.array([int(n)], pa.int64())}))


__all__ = ["community_conductance", "powerlaw_alpha"]
