"""Property-based parity: the BSP engine vs dense driver oracles on
hypothesis-generated random graphs.

The reference pins behavior with hand-picked fixture graphs
(tests/.../impl/PageRankTest.java, UnionFindTest.java,
ShortestPathDeltaSteppingTest.java); these tests widen that to random
topologies — self-loops, multi-components, hubs, isolated cycles —
checking the distributed result against an independent single-process
implementation on every example."""

import itertools

import numpy as np
import pytest
import ray.data as rd
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from neo4j_graph_algorithms_ray import build_graph
from neo4j_graph_algorithms_ray.algorithms import (pagerank,
                                                   sssp_delta_stepping, wcc)

_uid = itertools.count()

graph_params = st.tuples(
    st.integers(min_value=2, max_value=40),    # n vertices
    st.integers(min_value=1, max_value=120),   # m edge draws
    st.integers(min_value=0, max_value=2**31), # rng seed
    st.sampled_from([1, 2, 4]),                # engine partitions
)


def _random_edges(n: int, m: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    e = rng.integers(0, n, size=(m, 2))
    return np.unique(e, axis=0)


def _edge_ds(e: np.ndarray) -> rd.Dataset:
    return rd.from_items([{"src": int(s), "dst": int(d)} for s, d in e])


def _union_find(e: np.ndarray):
    parent = {}

    def find(x):
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for s, d in e:
        parent[find(int(s))] = find(int(d))
    return {x: find(x) for x in parent}


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(graph_params)
def test_wcc_matches_union_find(params):
    n, m, seed, parts = params
    e = _random_edges(n, m, seed)
    g = build_graph(_edge_ds(e), undirected=True,
                    name=f"prop_wcc_{next(_uid)}")
    got = {r["node"]: r["component"]
           for r in wcc(g, num_partitions=parts).dataset.take_all()}
    want = _union_find(e)
    assert set(got) == set(want)
    # same partition into components (labels may differ)
    by_got, by_want = {}, {}
    for v in got:
        by_got.setdefault(got[v], set()).add(v)
        by_want.setdefault(want[v], set()).add(v)
    assert sorted(map(frozenset, by_got.values())) == \
        sorted(map(frozenset, by_want.values()))


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(graph_params)
def test_pagerank_matches_dense_power_iteration(params):
    n, m, seed, parts = params
    e = _random_edges(n, m, seed)
    g = build_graph(_edge_ds(e), name=f"prop_pr_{next(_uid)}")
    res = pagerank(g, 0.85, max_iterations=500, tolerance=1e-9,
                   num_partitions=parts)
    got = {r["node"]: r["score"] for r in res.dataset.take_all()}

    nodes = sorted({int(x) for x in e.ravel()})
    idx = {v: i for i, v in enumerate(nodes)}
    k = len(nodes)
    out = np.zeros(k)
    for s, _ in e:
        out[idx[int(s)]] += 1
    r = np.full(k, 0.15)
    for _ in range(1000):
        push = np.where(out > 0, r / np.maximum(out, 1), 0.0)
        nxt = np.full(k, 0.15)
        for s, d in e:
            nxt[idx[int(d)]] += 0.85 * push[idx[int(s)]]
        if np.abs(nxt - r).max() <= 1e-12:
            r = nxt
            break
        r = nxt
    for v in nodes:
        assert got[v] == pytest.approx(r[idx[v]], abs=1e-6), v


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(graph_params)
@example(
    params=(4, 103, 57551, 2),
).via('discovered failure')
def test_delta_stepping_matches_dijkstra(params):
    import heapq
    n, m, seed, parts = params
    e = _random_edges(n, m, seed)
    rng = np.random.default_rng(seed + 1)
    w = np.round(rng.uniform(0.1, 10.0, size=len(e)), 3)
    ds = rd.from_items([{"src": int(s), "dst": int(d), "weight": float(wi)}
                        for (s, d), wi in zip(e, w)])
    g = build_graph(ds, weight_col="weight", name=f"prop_sssp_{next(_uid)}")
    source = int(e[0][0])
    got = {r["node"]: r["distance"]
           for r in sssp_delta_stepping(
               g, source, num_partitions=parts).dataset.take_all()}

    adj = {}
    for (s, d), wi in zip(e, w):
        adj.setdefault(int(s), []).append((int(d), float(wi)))
    dist = {int(x): float("inf") for x in e.ravel()}
    dist[source] = 0.0
    pq = [(0.0, source)]
    while pq:
        du, u = heapq.heappop(pq)
        if du > dist[u]:
            continue
        for v, wi in adj.get(u, []):
            nd = du + wi
            if nd < dist[v]:
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    assert set(got) == set(dist)
    for v, dv in dist.items():
        if np.isinf(dv):
            assert np.isinf(got[v]), v
        else:
            assert got[v] == pytest.approx(dv, abs=1e-9), v


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(graph_params)
def test_balanced_partition_invariants(params):
    """Invariants over random topologies: every vertex assigned exactly
    once, no part above the balance cap, assignment deterministic.
    (Locality improvement is asserted on clustered fixtures in
    test_partition.py — random graphs have no structure to find.)"""
    from neo4j_graph_algorithms_ray.algorithms.partition import \
        balanced_partition
    n, m, seed, P = params
    e = _random_edges(n, m, seed)
    if len(e) == 0:
        return
    g = build_graph(_edge_ds(e), name=f"blp_prop{next(_uid)}")
    r = balanced_partition(g, num_parts=min(4, max(2, P * 2)),
                           max_iterations=3)
    rows = r.dataset.take_all()
    assert len(rows) == g.num_vertices
    assert len({x["node"] for x in rows}) == g.num_vertices
    import numpy as _np
    sizes = _np.array(r.stats["sizes_final"])
    assert sizes.sum() == g.num_vertices
    assert sizes.max() <= r.stats["balance_cap"]
    r2 = balanced_partition(g, num_parts=min(4, max(2, P * 2)),
                            max_iterations=3)
    assert sorted((x["node"], x["part"]) for x in rows) == \
        sorted((x["node"], x["part"]) for x in r2.dataset.take_all())
