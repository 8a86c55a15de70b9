"""DSIR importance weights: brute-force replay with the md5 bucket
hash, and the directional sanity check (target-like docs score higher)."""

import hashlib
import math

import numpy as np
import pyarrow as pa
import ray.data as rd

from neo4j_graph_algorithms_ray.functions.text import dsir_weights


def _grams(text):
    toks = text.lower().split()
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _bucket(g, buckets):
    return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % buckets


def test_dsir_brute_force():
    docs = ["the cat sat on the mat", "dogs bark loudly at night",
            "the cat purred", "stock prices fell sharply today",
            "", "cat cat cat"]
    target = [docs[0], docs[2]]
    B = 64
    raw_c = np.zeros(B)
    tgt_c = np.zeros(B)
    for d in docs:
        for g in _grams(d):
            raw_c[_bucket(g, B)] += 1
    for d in target:
        for g in _grams(d):
            tgt_c[_bucket(g, B)] += 1
    lr = (np.log2((tgt_c + 1) / (tgt_c.sum() + B))
          - np.log2((raw_c + 1) / (raw_c.sum() + B)))
    want = [sum(lr[_bucket(g, B)] for g in _grams(d)) for d in docs]

    d_ds = rd.from_arrow(pa.table({"doc_id": list(range(len(docs))),
                                   "text": docs}))
    t_ds = rd.from_arrow(pa.table({"doc_id": [0, 2],
                                   "text": target}))
    got = {r["doc_id"]: r["log_weight"]
           for r in dsir_weights(d_ds, t_ds, buckets=B).take_all()}
    for i in range(len(docs)):
        assert abs(got[i] - want[i]) < 1e-6, (i, got[i], want[i])
    # direction: the cat docs (target-like) outscore the stock doc
    assert got[0] > got[3] and got[2] > got[3]
    assert got[4] == 0.0  # empty doc scores 0
