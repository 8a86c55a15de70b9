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


def modularity(
    edges: rd.Dataset,
    labels: rd.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    label_col: str = "label",
) -> rd.Dataset:
    """Directed Newman modularity (Leicht & Newman PRL 2008) per
    community: contribution_c = internal_c/m − out_c·in_c/m²; the
    partition's modularity Q is the sum of the contributions. Returns
    (community, n_nodes, internal_edges, out_edges, in_edges,
    contribution) sorted by community.

    Scale shape: same as :func:`community_conductance` — broadcast
    label probe onto the streaming edge table, per-batch pre-counted
    per-community partials, hierarchical ``preagg_sum``; m comes from
    the already-reduced per-community table (Σ out_c), so no second
    pass over the edges and only the community table (small) is
    materialized."""
    from neo4j_graph_algorithms_ray.functions.text import round6
    from neo4j_graph_algorithms_ray.util import broadcast_join, preagg_sum

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
        same = (cs == cd).astype(np.int64)
        n = len(cs)
        zeros = np.zeros(n, np.int64)
        ones = np.ones(n, np.int64)
        # src-side row carries the out-edge + internal credit,
        # dst-side row carries the in-edge credit
        return pa.table({
            "community": pa.array(np.concatenate([cs, cd])),
            "internal_edges": pa.array(np.concatenate([same, zeros])),
            "out_edges": pa.array(np.concatenate([ones, zeros])),
            "in_edges": pa.array(np.concatenate([zeros, ones]))})

    agg = preagg_sum(
        e.map_batches(partials, batch_format="pyarrow"),
        ["community"], ["internal_edges", "out_edges", "in_edges"]
    ).materialize()
    m = float(agg.sum("out_edges") or 0)

    sizes = preagg_sum(
        lab.map_batches(
            lambda b: pa.table({
                "community": b[label_col],
                "n_nodes": pa.array(np.ones(b.num_rows, np.int64))}),
            batch_format="pyarrow"),
        ["community"], ["n_nodes"])

    out = broadcast_join(sizes, agg, on="community")

    def finish(b: pa.Table) -> pa.Table:
        internal = b["internal_edges"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        oe = b["out_edges"].to_numpy(zero_copy_only=False).astype(np.float64)
        ie = b["in_edges"].to_numpy(zero_copy_only=False).astype(np.float64)
        if m > 0:
            contrib = internal / m - (oe * ie) / (m * m)
        else:
            contrib = np.zeros_like(internal)
        return b.append_column("contribution", pa.array(round6(contrib)))

    return out.map_batches(finish, batch_format="pyarrow").sort("community")


def rich_club(
    edges: rd.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    ks: tuple = (2, 4, 8, 16, 32),
) -> rd.Dataset:
    """Rich-club coefficient φ(k) (Zhou & Mondragón 2004; Colizza et
    al. Nature Physics 2006, unnormalized variant) of the undirected
    simple graph underlying a directed edge table: for each degree
    threshold k, with N_k = |{v : deg(v) > k}| and E_k = edges with
    both endpoints above the threshold, φ(k) = 2·E_k / (N_k·(N_k−1)).
    Rows with N_k = 0 are dropped (no club). Returns
    (k, n_rich, rich_edges, phi) sorted by k.

    Scale shape: symmetrize+distinct via hash shuffle once, degree
    table via map-side-combined counts, degrees probed back onto the
    streaming pair set through the broadcast-join regime (shuffle
    fallback above the limit), and each batch reduces to len(ks)
    partial-count rows — only the |ks|-row result reaches the driver.
    """
    import pyarrow.compute as pc

    from neo4j_graph_algorithms_ray.functions.text import round6
    from neo4j_graph_algorithms_ray.util import (broadcast_join, preagg_sum,
                                                 predistinct)

    karr = np.asarray(sorted(ks), np.int64)

    def orient(b: pa.Table) -> pa.Table:
        lt = pc.less(b[src_col], b[dst_col])
        return pa.table({"u": pc.if_else(lt, b[src_col], b[dst_col]),
                         "v": pc.if_else(lt, b[dst_col], b[src_col])})

    und = predistinct(
        edges.select_columns([src_col, dst_col])
        .filter(expr=f"{src_col} != {dst_col}")
        .map_batches(orient, batch_format="pyarrow"),
        ["u", "v"]).materialize()

    def endpoints(b: pa.Table) -> pa.Table:
        one = pa.array(np.ones(b.num_rows, np.int64))
        return pa.concat_tables([pa.table({"node": b["u"], "d": one}),
                                 pa.table({"node": b["v"], "d": one})])

    deg = preagg_sum(und.map_batches(endpoints, batch_format="pyarrow"),
                     ["node"], "d").materialize()

    pairs = broadcast_join(
        und, deg.rename_columns({"node": "__n", "d": "du"}),
        on="u", right_on="__n")
    pairs = broadcast_join(
        pairs, deg.rename_columns({"node": "__n", "d": "dv"}),
        on="v", right_on="__n")

    def edge_partials(b: pa.Table) -> pa.Table:
        du = b["du"].to_numpy(zero_copy_only=False)
        dv = b["dv"].to_numpy(zero_copy_only=False)
        mn = np.minimum(du, dv)
        return pa.table({"k": pa.array(karr),
                         "rich_edges": pa.array(
                             (mn[None, :] > karr[:, None]).sum(axis=1)
                             .astype(np.int64))})

    ek = preagg_sum(pairs.map_batches(edge_partials, batch_format="pyarrow"),
                    ["k"], "rich_edges")

    def node_partials(b: pa.Table) -> pa.Table:
        d = b["d"].to_numpy(zero_copy_only=False)
        return pa.table({"k": pa.array(karr),
                         "n_rich": pa.array(
                             (d[None, :] > karr[:, None]).sum(axis=1)
                             .astype(np.int64))})

    nk = preagg_sum(deg.map_batches(node_partials, batch_format="pyarrow"),
                    ["k"], "n_rich")

    out = broadcast_join(nk, ek, on="k")

    def finish(b: pa.Table) -> pa.Table:
        n = b["n_rich"].to_numpy(zero_copy_only=False).astype(np.float64)
        e_ = b["rich_edges"].to_numpy(zero_copy_only=False).astype(np.float64)
        phi = np.where(n > 1, 2.0 * e_ / (n * (n - 1.0)), 0.0)
        t = b.append_column("phi", pa.array(round6(phi)))
        return t.filter(pc.greater(t["n_rich"], 0))

    return out.map_batches(finish, batch_format="pyarrow").sort("k")


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


__all__ = ["community_conductance", "modularity", "powerlaw_alpha",
           "rich_club"]
