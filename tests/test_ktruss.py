"""k-truss vs a brute-force python peeling oracle."""

import itertools

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from neo4j_graph_algorithms_ray import build_graph
from neo4j_graph_algorithms_ray.algorithms.ktruss import k_truss


def brute_truss(edges, k):
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    while True:
        adj = {}
        for a, b in es:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        drop = {e for e in es
                if len(adj[e[0]] & adj[e[1]]) < k - 2}
        if not drop:
            return es
        es -= drop


def _run(edges, k):
    t = pa.table({"src": pa.array([e[0] for e in edges], pa.int64()),
                  "dst": pa.array([e[1] for e in edges], pa.int64())})
    g = build_graph(rd.from_arrow(t), name=f"truss_{len(edges)}_{k}")
    got = k_truss(g, k).dataset.to_pandas()
    return {tuple(sorted((int(r.u), int(r.v)))) for r in got.itertuples()}


def test_ktruss_clique_plus_tail():
    # K5 on 0-4 (a 5-truss), a triangle 5-6-7 (3-truss), a dangling path
    k5 = list(itertools.combinations(range(5), 2))
    tri = [(5, 6), (6, 7), (5, 7)]
    tail = [(7, 8), (8, 9)]
    edges = k5 + tri + tail
    assert _run(edges, 3) == brute_truss(edges, 3)
    assert _run(edges, 4) == set(map(tuple, k5))
    assert _run(edges, 5) == set(map(tuple, k5))
    assert _run(edges, 6) == set()


def test_ktruss_peel_cascade():
    # triangle chain where removing one edge cascades: two triangles
    # sharing an edge + a pendant triangle -> 4-truss empty, 3-truss
    # keeps both triangles
    edges = [(0, 1), (1, 2), (0, 2), (1, 3), (2, 3)]
    assert _run(edges, 3) == brute_truss(edges, 3)
    assert _run(edges, 4) == brute_truss(edges, 4) == set()


def test_ktruss_random_matches_bruteforce():
    rng = np.random.default_rng(11)
    n, m = 60, 400
    edges = list({tuple(sorted((int(a), int(b))))
                  for a, b in zip(rng.integers(0, n, m),
                                  rng.integers(0, n, m)) if a != b})
    for k in (3, 4, 5):
        assert _run(edges, k) == brute_truss(edges, k), k


def test_ktruss_k_validation():
    with pytest.raises(ValueError):
        _run([(0, 1)], 2)


def test_edge_support_matches_bruteforce():
    from neo4j_graph_algorithms_ray.algorithms.ktruss import edge_support
    rng = np.random.default_rng(12)
    n, m = 50, 260
    edges = list({tuple(sorted((int(a), int(b))))
                  for a, b in zip(rng.integers(0, n, m),
                                  rng.integers(0, n, m)) if a != b})
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expect = {(a, b): len(adj[a] & adj[b]) for a, b in edges}

    t = pa.table({"src": pa.array([e[0] for e in edges], pa.int64()),
                  "dst": pa.array([e[1] for e in edges], pa.int64())})
    g = build_graph(rd.from_arrow(t), name="edge_support_rand")
    got = {tuple(sorted((int(r.u), int(r.v)))): int(r.support)
           for r in edge_support(g).to_pandas().itertuples()}
    assert got == expect
    # local bridges = support-0 edges (Granovetter weak ties)
    bridges = {e for e, s in got.items() if s == 0}
    assert bridges == {e for e, s in expect.items() if s == 0}
