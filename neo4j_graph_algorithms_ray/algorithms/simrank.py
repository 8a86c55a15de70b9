"""SimRank structural similarity (Jeh & Widom, KDD'02) over an edge
Dataset — "two pages are similar if they are linked-to by similar
pages". Run here over the coarsened host graph, where the pair state
is small and the score is a standard domain-similarity signal.

In-neighbor formulation, decay ``c``:

    s(a, a) = 1
    s_{k+1}(a, b) = c / (|I(a)|·|I(b)|) · Σ_{i∈I(a), j∈I(b)} s_k(i, j)

and s(a, b) = 0 whenever a ≠ b and either side has no in-neighbors.

Scale shape: the pair state (a, b, s) is a Dataset; each sweep is two
hash joins of the state against the edge table (state.a = edge.src,
then state.b = edge.src), a map-side-combined groupby over the
destination pair, and a scale join against the in-degree table — no
driver state, no dense matrix. Pair-state cardinality is the classical
SimRank cost: at web scale run it on a coarsened (host-level) graph
and set ``eps`` > 0 so only material similarities survive each sweep
(the pruned variant of Lizorkin et al., VLDB'08). Dropping rows with
s ≤ eps is exact for eps = 0: a zero pair contributes nothing to any
later sum and is re-derived fresh if it becomes nonzero.

Below ``NGA_SIMRANK_DRIVER_LIMIT`` nodes (default 4096) a dense numpy
regime runs the same sweeps on the driver (S ← c·Mᵀ S M with M the
in-degree-normalized adjacency, diagonal re-pinned to 1); the two
regimes are pinned equal by the regime-parity pytest.

Not in the reference library; nearest neighbours there are the
neighbourhood-similarity procs this repo maps to algorithms/nodesim.py.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

DRIVER_LIMIT = 4096


def _distinct_edges(edges: rd.Dataset, src_col: str,
                    dst_col: str) -> rd.Dataset:
    from neo4j_graph_algorithms_ray.util import predistinct
    e = edges.select_columns([src_col, dst_col]) \
        .rename_columns({src_col: "src", dst_col: "dst"}) \
        .filter(expr="src != dst")
    return predistinct(e, ["src", "dst"])


def _simrank_driver(etbl: pa.Table, c: float, iterations: int,
                    eps: float) -> pa.Table:
    """Dense sweeps on the driver — byte-parity target for the
    distributed regime (same formula, summation fused by BLAS)."""
    src = np.asarray(etbl["src"].to_pylist(), dtype=object)
    dst = np.asarray(etbl["dst"].to_pylist(), dtype=object)
    nodes = np.unique(np.concatenate([src, dst]))
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    si = np.fromiter((idx[x] for x in src), np.int64, len(src))
    di = np.fromiter((idx[x] for x in dst), np.int64, len(dst))
    m = np.zeros((n, n), dtype=np.float64)          # M[i, a] = 1/|I(a)|
    m[si, di] = 1.0
    indeg = m.sum(axis=0)
    np.divide(m, indeg, out=m, where=indeg > 0)
    s = np.eye(n)
    for _ in range(iterations):
        s = c * (m.T @ s @ m)
        s[s <= eps] = 0.0
        np.fill_diagonal(s, 1.0)
    a, b = np.nonzero(s)
    return pa.table({"a": pa.array(nodes[a]), "b": pa.array(nodes[b]),
                     "s": pa.array(s[a, b])})


def simrank(edges: rd.Dataset, *, src_col: str = "src",
            dst_col: str = "dst", c: float = 0.8, iterations: int = 5,
            eps: float = 0.0,
            num_partitions: Optional[int] = None) -> rd.Dataset:
    """All-pairs SimRank over the distinct simple digraph in ``edges``.

    Returns a Dataset (a, b, s) holding every pair with s > eps,
    diagonal included; symmetric (both (a,b) and (b,a) present).
    """
    from neo4j_graph_algorithms_ray.util import (preagg_sum, predistinct,
                                                 safe_join)
    e = _distinct_edges(edges, src_col, dst_col).materialize()
    limit = int(os.environ.get("NGA_SIMRANK_DRIVER_LIMIT", DRIVER_LIMIT))
    nodes = predistinct(
        e.map_batches(
            lambda b: pa.table({"node": pa.concat_arrays(
                [b["src"].combine_chunks(), b["dst"].combine_chunks()])}),
            batch_format="pyarrow"), ["node"]).materialize()
    if nodes.count() <= limit:
        tbl = pa.concat_tables(ray.get(e.to_arrow_refs()))
        return rd.from_arrow(_simrank_driver(tbl, c, iterations, eps))

    P = num_partitions or 16
    indeg = preagg_sum(e.map_batches(
        lambda b: pa.table({"node": b["dst"],
                            "__d": pa.array(np.ones(b.num_rows, np.float64))}),
        batch_format="pyarrow"), ["node"], "__d")
    ind_a = indeg.rename_columns({"node": "a", "__d": "__da"}).materialize()
    ind_b = indeg.rename_columns({"node": "b", "__d": "__db"}).materialize()
    e_a = e.rename_columns({"src": "a", "dst": "__na"}).materialize()
    e_b = e.rename_columns({"src": "b", "dst": "__nb"}).materialize()
    diag = nodes.map_batches(
        lambda b: pa.table({"a": b["node"], "b": b["node"],
                            "s": pa.array(np.ones(b.num_rows, np.float64))}),
        batch_format="pyarrow").materialize()

    pairs = diag
    for _ in range(iterations):
        j = safe_join(pairs, e_a, "inner", P, on=("a",))
        j = safe_join(j.select_columns(["__na", "b", "s"]), e_b, "inner", P,
                      on=("b",))
        sums = preagg_sum(
            j.select_columns(["__na", "__nb", "s"])
            .rename_columns({"__na": "a", "__nb": "b"}), ["a", "b"], "s")
        sums = safe_join(sums, ind_a, "inner", P, on=("a",))
        sums = safe_join(sums, ind_b, "inner", P, on=("b",))

        def scale(b: pa.Table, *, _c=c, _eps=eps) -> pa.Table:
            s = (_c * b["s"].to_numpy(zero_copy_only=False)
                 / (b["__da"].to_numpy(zero_copy_only=False)
                    * b["__db"].to_numpy(zero_copy_only=False)))
            same = np.asarray(b["a"]) == np.asarray(b["b"])
            keep = (s > _eps) & ~same
            return pa.table({"a": b["a"].filter(pa.array(keep)),
                             "b": b["b"].filter(pa.array(keep)),
                             "s": pa.array(s[keep])})

        pairs = diag.union(
            sums.map_batches(scale, batch_format="pyarrow")).materialize()
    return pairs
