"""Oracles for the two previously-untested §2 operators:
MetaPathPrecomputeHighDegreeNodes (brute-force path enumeration on the
reference's F7 typed fixture, MetaPathPrecomputeHighDegreeNodes.java:
18-76 semantics) and the algo.isFinite/isInfinite/Infinity/NaN scalar
kernels (IsFiniteFunc.java:27-45)."""

import math

import numpy as np
import pyarrow as pa
import ray.data as rd

from neo4j_graph_algorithms_ray import fixtures as fx
from neo4j_graph_algorithms_ray.algorithms.metapath import \
    metapath_precompute_high_degree_nodes
from neo4j_graph_algorithms_ray.functions import scalars


def _brute_force(edges, labels, ratio, length=3):
    sym = []
    for s, d in edges:
        sym.append((s, d))
        sym.append((d, s))
    deg = {}
    for s, _ in sym:
        deg[s] = deg.get(s, 0) + 1
    nodes = sorted(deg, key=lambda v: (-deg[v], v))
    k = max(1, int(len(deg) * ratio))
    hubs = set(nodes[:k])
    rows = set()
    for s, d in sym:
        if s in hubs:
            p2 = f"{labels[s]} | TYPE1 | {labels[d]}"
            rows.add((s, p2, d))
            for s2, d2 in sym:
                if s2 == d:
                    rows.add((s, f"{p2} | TYPE1 | {labels[d2]}", d2))
    return rows


def test_precompute_high_degree_nodes_brute_force():
    ds = rd.from_arrow(fx.typed_edge_table(fx.F7_EDGES, fx.F7_LABELS))
    for ratio in (0.1, 0.35):
        got = {(r["start"], r["path"], r["end"])
               for r in metapath_precompute_high_degree_nodes(
                   ds, ratio=ratio, length=3).take_all()}
        want = _brute_force(fx.F7_EDGES, fx.F7_LABELS, ratio)
        assert got == want, f"ratio={ratio}"


def test_precompute_hub_pick_deterministic():
    """Degree ties must break by node id: ratio that lands inside a
    degree tie still produces a stable hub set (run twice, same rows)."""
    ds = rd.from_arrow(fx.typed_edge_table(fx.F7_EDGES, fx.F7_LABELS))
    a = sorted((r["start"], r["path"], r["end"]) for r in
               metapath_precompute_high_degree_nodes(ds, ratio=0.25).take_all())
    b = sorted((r["start"], r["path"], r["end"]) for r in
               metapath_precompute_high_degree_nodes(ds, ratio=0.25).take_all())
    assert a == b and a


def test_scalar_kernels():
    arr = pa.array([1.0, scalars.infinity(), -scalars.infinity(),
                    scalars.nan(), None])
    assert scalars.is_finite(arr).to_pylist() == [True, False, False,
                                                  False, False]
    assert scalars.is_infinite(arr).to_pylist() == [False, True, True,
                                                    False, False]
    assert math.isinf(scalars.infinity()) and scalars.infinity() > 0
    assert math.isnan(scalars.nan())
    # numpy round-trip: the injected constants behave like IEEE specials
    v = np.array([scalars.infinity(), scalars.nan()])
    assert np.isinf(v[0]) and np.isnan(v[1])
