"""Link-prediction, SALSA, and eigenvector-centrality tests: numpy
dense-matrix replays on random graphs, plus partition invariance of
the weighted co-pair shards."""

import math
from collections import Counter

import numpy as np
import pyarrow as pa
import ray.data as rd

from neo4j_graph_algorithms_ray.algorithms.eigenvector import eigenvector
from neo4j_graph_algorithms_ray.algorithms.linkpred import \
    link_prediction_topk
from neo4j_graph_algorithms_ray.algorithms.salsa import salsa
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


def test_eigenvector_matches_dense_power_iteration():
    edges = _rand_edges(7, 40, 500)
    nodes, A = _dense(edges)
    x = np.ones(len(nodes))
    for _ in range(15):
        x = A.T @ x
        x /= np.linalg.norm(x) or 1.0
    g = _graph(edges, "eig_bf")
    got = {r["node"]: r["score"]
           for r in eigenvector(g, max_iterations=15).dataset.take_all()}
    for v, i in zip(nodes, range(len(nodes))):
        assert abs(got[v] - x[i]) < 1e-9


def test_salsa_matches_dense_chains():
    edges = _rand_edges(13, 30, 300)
    nodes, A = _dense(edges)
    outd = A.sum(1)
    ind = A.sum(0)
    a = np.ones(len(nodes))
    h = np.ones(len(nodes))
    for _ in range(10):
        # authority chain: t(i) = Σ_j A[i,j] a(j)/ind(j); a'(j) = Σ_i A[i,j] t(i)/outd(i)
        t = A @ np.divide(a, ind, out=np.zeros_like(a), where=ind != 0)
        a = A.T @ np.divide(t, outd, out=np.zeros_like(t), where=outd != 0)
        a /= a.sum() or 1.0
        u = A.T @ np.divide(h, outd, out=np.zeros_like(h), where=outd != 0)
        h = A @ np.divide(u, ind, out=np.zeros_like(u), where=ind != 0)
        h /= h.sum() or 1.0
    g = _graph(edges, "salsa_bf")
    got = {r["node"]: (r["hub"], r["authority"])
           for r in salsa(g, max_iterations=10).dataset.take_all()}
    for v, i in zip(nodes, range(len(nodes))):
        assert abs(got[v][0] - h[i]) < 1e-9
        assert abs(got[v][1] - a[i]) < 1e-9
    # stationary scores are probability vectors
    assert abs(sum(x[0] for x in got.values()) - 1.0) < 1e-9
    assert abs(sum(x[1] for x in got.values()) - 1.0) < 1e-9


def _brute_linkpred(edges, cap):
    adj, ind = {}, Counter()
    for s, d in set(edges):
        adj.setdefault(s, set()).add(d)
        ind[d] += 1
    n_c, aa = Counter(), Counter()
    for s, ds_ in adj.items():
        if not (2 <= len(ds_) <= cap):
            continue
        ns = sorted(ds_)
        w = 1.0 / math.log(len(ds_))
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                n_c[(ns[i], ns[j])] += 1
                aa[(ns[i], ns[j])] += w
    rows = []
    for (x, y), n in n_c.items():
        union = ind[x] + ind[y] - n
        rows.append((x, y, n, round(aa[(x, y)], 6),
                     round(n / union, 6), ind[x] * ind[y]))
    return rows


def test_link_prediction_brute_force_and_cap():
    edges = _rand_edges(29, 30, 400)
    edges += [(99, t) for t in range(25)]  # hub above the cap: excluded
    cap, k = 10, 25
    g = _graph(edges, "lp_bf")
    got = [(r["node_a"], r["node_b"], r["n_common"], r["adamic_adar"],
            r["jaccard"], r["pref_attachment"])
           for r in link_prediction_topk(g, cap=cap, topk=k)
           .dataset.take_all()]
    want = sorted(_brute_linkpred(edges, cap),
                  key=lambda r: (-r[3], r[0], r[1]))[:k]
    assert len(got) == len(want)
    for grow, wrow in zip(got, want):
        assert grow[:3] == wrow[:3]
        assert abs(grow[3] - wrow[3]) < 1e-6
        assert abs(grow[4] - wrow[4]) < 1e-6
        assert grow[5] == wrow[5]


def test_link_prediction_partition_invariance():
    edges = _rand_edges(31, 50, 700)
    g1 = _graph(edges, "lp_p1")
    g4 = _graph(edges, "lp_p4")
    r1 = link_prediction_topk(g1, cap=15, topk=30, num_partitions=1) \
        .dataset.take_all()
    r4 = link_prediction_topk(g4, cap=15, topk=30, num_partitions=4) \
        .dataset.take_all()
    assert [tuple(sorted(r.items())) for r in r1] \
        == [tuple(sorted(r.items())) for r in r4]
