"""Neighborhood aggregation (GNN-style mean) and degree assortativity
vs brute-force replays on random digraphs."""

import math

import numpy as np
import pyarrow as pa
import ray.data as rd

from neo4j_graph_algorithms_ray.algorithms.neighborhood import (
    degree_assortativity, neighbor_degree_mean)
from neo4j_graph_algorithms_ray.graph import build_graph


def _graph(edges, name):
    src, dst = zip(*edges)
    ds = rd.from_arrow(pa.table({"src": list(src), "dst": list(dst)}))
    return build_graph(ds, name=name)


def _edges(seed=41, hi=30, n=250):
    rng = np.random.default_rng(seed)
    return list({(int(a), int(b)) for a, b in rng.integers(0, hi, (n, 2))
                 if a != b})


def test_neighbor_degree_mean_brute():
    edges = _edges()
    g = _graph(edges, "nbh_t")
    got = {r["node"]: (r["in_degree"], round(r["nbr_degree_mean"], 9))
           for r in neighbor_degree_mean(g).take_all()}
    out = {}
    inn = {}
    for s, d in edges:
        out[s] = out.get(s, 0) + 1
        inn.setdefault(d, []).append(s)
    for v in {x for e in edges for x in e}:
        preds = inn.get(v, [])
        mean = (sum(out.get(u, 0) for u in preds) / len(preds)
                if preds else 0.0)
        assert got[v] == (len(preds), round(mean, 9)), v


def test_degree_assortativity_brute():
    edges = _edges(seed=47)
    g = _graph(edges, "asst_t")
    row = degree_assortativity(g).take_all()[0]
    out, inn = {}, {}
    for s, d in edges:
        out[s] = out.get(s, 0) + 1
        inn[d] = inn.get(d, 0) + 1
    x = np.array([out[s] for s, d in edges], dtype=float)
    y = np.array([inn[d] for s, d in edges], dtype=float)
    n = len(edges)
    num = n * (x * y).sum() - x.sum() * y.sum()
    den = math.sqrt(n * (x * x).sum() - x.sum() ** 2) \
        * math.sqrt(n * (y * y).sum() - y.sum() ** 2)
    assert row["n_edges"] == n
    assert row["assortativity"] == round(num / den, 6)
