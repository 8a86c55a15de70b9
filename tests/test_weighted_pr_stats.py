"""Weighted PageRank vs an independent numpy power iteration, and the
ngram/percentile corpus stats vs brute-force replays."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from neo4j_graph_algorithms_ray.algorithms import pagerank
from neo4j_graph_algorithms_ray.functions.text import (column_percentiles,
                                                       ngram_topk)
from neo4j_graph_algorithms_ray.graph import build_graph


def test_weighted_pagerank_matches_numpy():
    rng = np.random.default_rng(21)
    edges = list({(int(a), int(b)) for a, b in rng.integers(0, 25, (120, 2))
                  if a != b})
    w = {e: float(1 + (e[0] * 7 + e[1]) % 5) for e in edges}
    ds = rd.from_arrow(pa.table({"src": [e[0] for e in edges],
                                 "dst": [e[1] for e in edges],
                                 "weight": [w[e] for e in edges]}))
    g = build_graph(ds, weight_col="weight", name="wpr_t")
    res = pagerank(g, 0.85, max_iterations=30, weighted=True)
    got = {r["node"]: r["score"] for r in res.dataset.take_all()}

    nodes = sorted({x for e in edges for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    wout = np.zeros(n)
    for (s, d), wv in w.items():
        wout[idx[s]] += wv
    r = np.full(n, 0.15)
    for _ in range(30):
        nxt = np.full(n, 0.15)
        for (s, d), wv in w.items():
            nxt[idx[d]] += 0.85 * r[idx[s]] * wv / wout[idx[s]]
        r = nxt
    for v in nodes:
        assert abs(got[v] - r[idx[v]]) < 1e-9, v


def test_ngram_topk_brute():
    docs = ["the cat sat", "the cat ran", "cat", ""]
    ds = rd.from_arrow(pa.table({"text": docs}))
    got = [(r["ngram"], r["n_occ"], r["n_docs"])
           for r in ngram_topk(ds, n=2, topk=10).take_all()]
    from collections import Counter
    occ, dfc = Counter(), Counter()
    for d in docs:
        t = d.lower().split()
        grams = ([" ".join(t[i:i + 2]) for i in range(len(t) - 1)]
                 if len(t) >= 2 else ([" ".join(t)] if t else []))
        occ.update(grams)
        dfc.update(set(grams))
    want = sorted(((gm, c, dfc[gm]) for gm, c in occ.items()),
                  key=lambda r: (-r[1], r[0]))[:10]
    assert got == want


def test_column_percentiles_exact():
    vals = list(range(1, 101)) * 3   # N=300, values 1..100
    ds = rd.from_arrow(pa.table({"n": vals})).repartition(8)
    got = {r["pct"]: r["value"] for r in column_percentiles(ds, "n").take_all()}
    import math
    sv = sorted(vals)
    want = {p: sv[math.ceil(len(sv) * p / 100) - 1] for p in (25, 50, 75, 90, 99)}
    assert got == want
