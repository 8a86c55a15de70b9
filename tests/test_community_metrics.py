"""community_conductance: brute-force replay on a random labeled graph."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from neo4j_graph_algorithms_ray.algorithms.community_metrics import \
    community_conductance


def test_conductance_brute_force():
    rng = np.random.default_rng(41)
    edges = list({(int(a), int(b)) for a, b in rng.integers(0, 40, (300, 2))
                  if a != b})
    nodes = sorted({x for e in edges for x in e})
    lab = {v: int(rng.integers(0, 5)) for v in nodes}

    internal, cut, sizes = {}, {}, {}
    for v in nodes:
        sizes[lab[v]] = sizes.get(lab[v], 0) + 1
    for s, d in edges:
        cs, cd = lab[s], lab[d]
        if cs == cd:
            internal[cs] = internal.get(cs, 0) + 1
        else:
            cut[cs] = cut.get(cs, 0) + 1
            cut[cd] = cut.get(cd, 0) + 1

    src, dst = zip(*edges)
    e_ds = rd.from_arrow(pa.table({"src": list(src), "dst": list(dst)}))
    l_ds = rd.from_arrow(pa.table({"node": nodes,
                                   "label": [lab[v] for v in nodes]}))
    got = {r["community"]: r
           for r in community_conductance(e_ds, l_ds).take_all()}

    seen = {c for c in sizes if internal.get(c, 0) or cut.get(c, 0)}
    assert set(got) == seen
    for c in seen:
        i, k = internal.get(c, 0), cut.get(c, 0)
        assert got[c]["n_nodes"] == sizes[c]
        assert got[c]["internal_edges"] == i
        assert got[c]["cut_edges"] == k
        assert abs(got[c]["conductance"] - k / (2 * i + k)) < 1e-6
