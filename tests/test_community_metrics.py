"""community_conductance / modularity / rich_club: brute-force replay
on random graphs."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from neo4j_graph_algorithms_ray.algorithms.community_metrics import (
    community_conductance, modularity, rich_club)


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


def test_modularity_brute_force():
    rng = np.random.default_rng(43)
    edges = list({(int(a), int(b)) for a, b in rng.integers(0, 40, (300, 2))
                  if a != b})
    nodes = sorted({x for e in edges for x in e})
    lab = {v: int(rng.integers(0, 5)) for v in nodes}
    m = len(edges)

    internal, out_e, in_e = {}, {}, {}
    for s, d in edges:
        cs, cd = lab[s], lab[d]
        out_e[cs] = out_e.get(cs, 0) + 1
        in_e[cd] = in_e.get(cd, 0) + 1
        if cs == cd:
            internal[cs] = internal.get(cs, 0) + 1

    src, dst = zip(*edges)
    e_ds = rd.from_arrow(pa.table({"src": list(src), "dst": list(dst)}))
    l_ds = rd.from_arrow(pa.table({"node": nodes,
                                   "label": [lab[v] for v in nodes]}))
    got = {r["community"]: r for r in modularity(e_ds, l_ds).take_all()}

    q = 0.0
    for c, r in got.items():
        i = internal.get(c, 0)
        o, n = out_e.get(c, 0), in_e.get(c, 0)
        assert r["internal_edges"] == i
        assert r["out_edges"] == o
        assert r["in_edges"] == n
        expect = i / m - o * n / (m * m)
        assert abs(r["contribution"] - expect) < 1e-6
        q += r["contribution"]
    # directed modularity of a random partition hovers near 0
    assert -0.5 < q < 1.0


def test_rich_club_brute_force():
    rng = np.random.default_rng(44)
    edges = list({(int(a), int(b)) for a, b in rng.integers(0, 30, (250, 2))
                  if a != b})
    und = {tuple(sorted(e)) for e in edges}
    deg = {}
    for u, v in und:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1

    src, dst = zip(*edges)
    e_ds = rd.from_arrow(pa.table({"src": list(src), "dst": list(dst)}))
    ks = (2, 4, 8)
    got = {r["k"]: r for r in rich_club(e_ds, ks=ks).take_all()}

    for k in ks:
        rich = {v for v, d in deg.items() if d > k}
        ek = sum(1 for u, v in und if u in rich and v in rich)
        if not rich:
            assert k not in got
            continue
        assert got[k]["n_rich"] == len(rich)
        assert got[k]["rich_edges"] == ek
        expect = (2.0 * ek / (len(rich) * (len(rich) - 1))
                  if len(rich) > 1 else 0.0)
        assert abs(got[k]["phi"] - expect) < 1e-6
