"""Eccentricity (MSBFS bit-union tracking) and edge-reciprocity tests
against brute-force replays."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from neo4j_graph_algorithms_ray.algorithms import eccentricity
from neo4j_graph_algorithms_ray.algorithms.reciprocity import edge_reciprocity
from neo4j_graph_algorithms_ray.graph import build_graph


def _graph(edges, name):
    src, dst = zip(*edges)
    ds = rd.from_arrow(pa.table({"src": list(src), "dst": list(dst)}))
    return build_graph(ds, name=name)


def _brute_ecc(edges, nodes):
    adj = {}
    for s, d in set(edges):
        adj.setdefault(s, []).append(d)
    out = {}
    for s in nodes:
        dist, frontier, depth = {s: 0}, [s], 0
        while frontier:
            depth += 1
            nxt = []
            for u in frontier:
                for v in adj.get(u, []):
                    if v not in dist:
                        dist[v] = depth
                        nxt.append(v)
            frontier = nxt
        out[s] = max(dist.values())
    return out


def test_eccentricity_matches_bfs():
    rng = np.random.default_rng(13)
    edges = list({(int(a), int(b)) for a, b in rng.integers(0, 60, (150, 2))
                  if a != b})
    edges.append((98, 99))   # 99 is a sink: ecc 0
    g = _graph(edges, "ecc_t")
    nodes = sorted({x for e in edges for x in e})
    res = eccentricity(g, sources=range(len(nodes)))
    got = {r["node"]: r["eccentricity"] for r in res.dataset.take_all()}
    assert got == _brute_ecc(edges, nodes)
    assert got[99] == 0


def test_eccentricity_multiwave():
    # > 64 sources forces a second MSBFS wave; chain graph has known ecc
    n = 80
    edges = [(i, i + 1) for i in range(n - 1)]
    g = _graph(edges, "ecc_chain")
    res = eccentricity(g, sources=range(n))
    got = {r["node"]: r["eccentricity"] for r in res.dataset.take_all()}
    assert got == {i: n - 1 - i for i in range(n)}


def test_reciprocity():
    edges = [(0, 1), (1, 0), (1, 2), (2, 3), (3, 2), (4, 0)]
    ds = rd.from_arrow(pa.table({"src": [e[0] for e in edges],
                                 "dst": [e[1] for e in edges]}))
    row = edge_reciprocity(ds).take_all()[0]
    assert row["total_edges"] == 6
    assert row["reciprocal_edges"] == 4
    assert abs(row["reciprocity"] - round(4 / 6, 6)) < 1e-9
