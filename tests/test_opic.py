"""OPIC and dangling-mass PageRank: dense numpy replays, conservation
invariants, and partition invariance."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from neo4j_graph_algorithms_ray.algorithms.opic import (
    opic, pagerank_dangling)
from neo4j_graph_algorithms_ray.graph import build_graph


def _graph(edges, name, **kw):
    src, dst = zip(*edges)
    ds = rd.from_arrow(pa.table({"src": list(src), "dst": list(dst)}))
    return build_graph(ds, name=name, **kw)


def _rand_edges(seed, n, m):
    rng = np.random.default_rng(seed)
    return list({(int(a), int(b)) for a, b in rng.integers(0, n, (m, 2))
                 if a != b})


def _dense(edges):
    nodes = sorted({x for e in edges for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for s, d in set(edges):
        A[idx[s], idx[d]] = 1.0
    return nodes, A


def test_opic_matches_dense_replay_and_conserves_mass():
    edges = _rand_edges(17, 35, 300)
    edges += [(40, 41)]  # 41 is dangling: its cash must recirculate
    nodes, A = _dense(edges)
    n = len(nodes)
    outd = A.sum(1)
    cash = np.full(n, 1.0 / n)
    hist = np.zeros(n)
    for _ in range(12):
        dang = cash[outd == 0].sum()
        hist += cash
        push = np.divide(cash, outd, out=np.zeros_like(cash),
                         where=outd != 0)
        cash = A.T @ push + dang / n
    want = (hist + cash) / 13
    g = _graph(edges, "opic_bf")
    got = {r["node"]: r["score"]
           for r in opic(g, max_iterations=12).dataset.take_all()}
    for v, i in zip(nodes, range(n)):
        assert abs(got[v] - want[i]) < 1e-9
    # importance estimate is a probability vector (cash conserved)
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_dangling_matches_dense_and_sums_to_one():
    edges = _rand_edges(23, 30, 250)
    edges += [(50, 51)]  # dangling sink 51
    nodes, A = _dense(edges)
    n = len(nodes)
    outd = A.sum(1)
    r = np.full(n, 1.0 / n)
    for _ in range(15):
        dang = r[outd == 0].sum()
        push = np.divide(r, outd, out=np.zeros_like(r), where=outd != 0)
        r = 0.85 * (A.T @ push) + (0.15 / n + 0.85 * dang / n)
    g = _graph(edges, "prd_bf")
    got = {row["node"]: row["score"]
           for row in pagerank_dangling(g, 0.85, max_iterations=15)
           .dataset.take_all()}
    for v, i in zip(nodes, range(n)):
        assert abs(got[v] - r[i]) < 1e-9
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_opic_partition_invariance():
    edges = _rand_edges(3, 60, 800)
    g1 = _graph(edges, "opic_p1")
    g4 = _graph(edges, "opic_p4")
    r1 = {r["node"]: r["score"]
          for r in opic(g1, 10, num_partitions=1).dataset.take_all()}
    r4 = {r["node"]: r["score"]
          for r in opic(g4, 10, num_partitions=4).dataset.take_all()}
    assert r1.keys() == r4.keys()
    for k in r1:
        assert abs(r1[k] - r4[k]) < 1e-12
