"""node_similarity_topk: hand-graph replay and brute-force parity on a
random directed graph (per-node top-k in-neighborhood Jaccard with the
shared-source eligibility cap)."""

from collections import Counter

import numpy as np
import pyarrow as pa
import ray.data as rd

from neo4j_graph_algorithms_ray.algorithms.nodesim import node_similarity_topk
from neo4j_graph_algorithms_ray.graph import build_graph


def _graph(edges, name, parts=None):
    src, dst = zip(*edges)
    ds = rd.from_arrow(pa.table({"src": list(src), "dst": list(dst)}))
    return build_graph(ds, name=name)


def _brute(edges, cap, k):
    edges = set(edges)
    adj, indeg = {}, Counter()
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        indeg[d] += 1
    n = Counter()
    for s, ds_ in adj.items():
        if not (2 <= len(ds_) <= cap):
            continue
        ns = sorted(ds_)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                n[(ns[i], ns[j])] += 1
    per = {}
    for (a, b), c in n.items():
        j = round(c / (indeg[a] + indeg[b] - c), 6)
        per.setdefault(a, []).append((b, c, j))
        per.setdefault(b, []).append((a, c, j))
    out = []
    for v in sorted(per):
        peers = sorted(per[v], key=lambda t: (-t[2], t[0]))[:k]
        out.extend((v, u, c, j) for u, c, j in peers)
    return out


def test_node_similarity_hand_graph():
    # z1 -> {a,b}, z2 -> {a,b}, z3 -> {b,c}  (ints: a=1, b=2, c=3,
    # z1=10, z2=11, z3=12)
    edges = [(10, 1), (10, 2), (11, 1), (11, 2), (12, 2), (12, 3)]
    g = _graph(edges, "nodesim_hand")
    rows = node_similarity_topk(g, cap=20, k=2).dataset.take_all()
    got = [(r["node_a"], r["node_b"], r["n_common"], r["jaccard"])
           for r in rows]
    assert got == [(1, 2, 2, round(2 / 3, 6)),
                   (2, 1, 2, round(2 / 3, 6)),
                   (2, 3, 1, round(1 / 3, 6)),
                   (3, 2, 1, round(1 / 3, 6))]


def test_node_similarity_brute_force_random():
    rng = np.random.default_rng(7)
    edges = list({(int(s), int(d)) for s, d in
                  zip(rng.integers(0, 40, 300), rng.integers(0, 40, 300))
                  if s != d})
    g = _graph(edges, "nodesim_rand")
    rows = node_similarity_topk(g, cap=5, k=3).dataset.take_all()
    got = [(r["node_a"], r["node_b"], r["n_common"], r["jaccard"])
           for r in rows]
    want = _brute(edges, cap=5, k=3)
    assert got == want
