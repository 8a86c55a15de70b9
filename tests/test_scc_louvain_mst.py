"""SCC / MSColoring / Louvain / MST — brute-force-verified oracles.

F5 (FIXTURES.md) is three directed 3-cycles {a,b,c},{d,e,f},{g,h,i}
bridged by one-way edges (c→h, b→d) plus sink h — its SCCs are exactly
the three cycles (+ singletons), mirroring the reference's
SCCTarjanTest-style fixtures."""

import numpy as np
import pytest
import ray.data as rd

from neo4j_graph_algorithms_ray import build_graph, fixtures as fx
from neo4j_graph_algorithms_ray.algorithms import (
    louvain, mscoloring, msf_boruvka, mst_prim, scc, wcc)


def tarjan_ref(nodes, edges):
    """Iterative Tarjan (independent oracle)."""
    adj = {n: [] for n in nodes}
    for a, b in edges:
        adj[a].append(b)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    sccs = []
    counter = [0]
    for root in nodes:
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                sccs.append(frozenset(comp))
            work.pop()
            if work:
                u, _ = work[-1]
                low[u] = min(low[u], low[v])
    return set(sccs)


@pytest.mark.parametrize("parts", [1, 3])
def test_scc_f5(parts):
    nodes = sorted({x for e in fx.F5_EDGES for x in e})
    g = build_graph(rd.from_arrow(fx.edge_table(fx.F5_EDGES)),
                    name=f"f5scc{parts}")
    res = scc(g, num_partitions=parts)
    got = {}
    for r in res.dataset.take_all():
        got.setdefault(r["component"], set()).add(r["node"])
    want = tarjan_ref(nodes, fx.F5_EDGES)
    assert {frozenset(s) for s in got.values()} == want
    # canonical id = max member (max-vid translated to original)
    for comp, members in got.items():
        assert comp == max(members)


def test_scc_dag_singletons():
    edges = [("a", "b"), ("b", "c"), ("a", "c")]
    g = build_graph(rd.from_arrow(fx.edge_table(edges)), name="dagscc")
    res = scc(g)
    comps = {r["node"]: r["component"] for r in res.dataset.take_all()}
    assert comps == {"a": "a", "b": "b", "c": "c"}


def test_mscoloring_matches_wcc():
    tbl = fx.wcc_lines_table(5, 6)
    g = build_graph(rd.from_arrow(tbl), undirected=True, name="mscol")
    a = {r["node"]: r["component"] for r in mscoloring(g).dataset.take_all()}
    b = {r["node"]: r["component"] for r in wcc(g).dataset.take_all()}
    # same partition, different canonical ids (max vs min member)
    groups_a = {}
    groups_b = {}
    for n, c in a.items():
        groups_a.setdefault(c, set()).add(n)
    for n, c in b.items():
        groups_b.setdefault(c, set()).add(n)
    assert set(map(frozenset, groups_a.values())) == set(map(frozenset, groups_b.values()))
    for c, mem in groups_a.items():
        assert c == max(mem)


def two_cliques_edges(k=5):
    e = []
    for base in (0, 100):
        for i in range(k):
            for j in range(i + 1, k):
                e.append((base + i, base + j))
    e.append((0, 100))  # bridge
    return e


def test_louvain_two_cliques():
    tbl = fx.edge_table(two_cliques_edges())
    import pyarrow as pa
    tbl = pa.table({"src": pa.array([a for a, _ in two_cliques_edges()], pa.int64()),
                    "dst": pa.array([b for _, b in two_cliques_edges()], pa.int64())})
    g = build_graph(rd.from_arrow(tbl), undirected=True, name="louv2c")
    res = louvain(g, max_iterations=8)
    comm = {r["node"]: r["community"] for r in res.dataset.take_all()}
    left = {comm[i] for i in range(5)}
    right = {comm[100 + i] for i in range(5)}
    assert len(left) == 1 and len(right) == 1 and left != right
    assert res.stats["modularity"] > 0.3


MST_EDGES = [("a", "b", 1.0), ("b", "c", 2.0), ("a", "c", 4.0),
             ("c", "d", 3.0), ("b", "d", 7.0)]


@pytest.fixture(scope="module")
def mst_graph():
    ds = rd.from_items([{"src": s, "dst": d, "weight": w} for s, d, w in MST_EDGES])
    return build_graph(ds, weight_col="weight", undirected=True, name="mstg")


def test_mst_prim(mst_graph):
    out = mst_prim(mst_graph, "a")
    assert out["weight_sum"] == pytest.approx(6.0)  # 1 + 2 + 3
    assert out["weight_min"] == pytest.approx(1.0)
    assert out["weight_max"] == pytest.approx(3.0)
    assert out["effective_node_count"] == 4
    got = {tuple(sorted((r.src, r.dst))) for r in out["edges"].itertuples()}
    assert got == {("a", "b"), ("b", "c"), ("c", "d")}


def test_msf_boruvka(mst_graph):
    out = msf_boruvka(mst_graph)
    assert out["weight_sum"] == pytest.approx(6.0)
    assert out["edge_count"] == 3
    assert out["components"] == 1


def test_msf_boruvka_shared_max_component():
    """Regression: two picked pairs sharing the same endpoint component
    (star 1-5, 2-5) must both merge in one round without double-counting
    the re-picked edge's weight (fancy-assignment union kept only the
    last write and re-counted the lost pair next round)."""
    import pyarrow as pa
    edges = pa.table({"src": [1, 2], "dst": [5, 5],
                      "weight": [10.0, 20.0]})
    g = build_graph(rd.from_arrow(edges), weight_col="weight",
                    undirected=True, name="boruvka_star")
    out = msf_boruvka(g)
    assert out["weight_sum"] == pytest.approx(30.0)
    assert out["edge_count"] == 2
    assert out["components"] == 1


def test_msf_boruvka_matches_prim_random():
    """Borůvka forest weight == Prim tree weight on a random connected
    distinct-weight graph."""
    rng = np.random.default_rng(7)
    n = 40
    src = list(range(1, n)) + rng.integers(0, n, 60).tolist()
    dst = list(rng.integers(0, np.arange(1, n))) + rng.integers(0, n, 60).tolist()
    import pyarrow as pa
    w = rng.permutation(len(src)).astype(np.float64) + 1.0
    keep = [i for i, (a, b) in enumerate(zip(src, dst)) if a != b]
    tbl = pa.table({"src": np.array(src)[keep], "dst": np.array(dst)[keep],
                    "weight": w[keep]})
    g = build_graph(rd.from_arrow(tbl), weight_col="weight", dedup=False,
                    undirected=True, accumulate_weights=False,
                    name="boruvka_rand")
    want = mst_prim(g, 0)["weight_sum"]
    got = msf_boruvka(g)
    assert got["weight_sum"] == pytest.approx(want)
    assert got["components"] == 1


def test_msf_boruvka_tree_reduce_path():
    """Force the partial-combine tree-reduce (driver_limit=1) so the
    coalesce + re-combine loop is exercised, not just the direct
    driver finalize."""
    rng = np.random.default_rng(11)
    n = 30
    src = list(range(1, n)) + rng.integers(0, n, 40).tolist()
    dst = list(rng.integers(0, np.arange(1, n))) + rng.integers(0, n, 40).tolist()
    import pyarrow as pa
    w = rng.permutation(len(src)).astype(np.float64) + 1.0
    keep = [i for i, (a, b) in enumerate(zip(src, dst)) if a != b]
    tbl = pa.table({"src": np.array(src)[keep], "dst": np.array(dst)[keep],
                    "weight": w[keep]})
    g = build_graph(rd.from_arrow(tbl).repartition(6), weight_col="weight",
                    undirected=True, name="boruvka_tree")
    want = mst_prim(g, 0)["weight_sum"]
    got = msf_boruvka(g, driver_limit=1)
    assert got["weight_sum"] == pytest.approx(want)
    assert got["components"] == 1


def _weighted_louvain_fixture():
    """WeightedLouvainModularityTest.java fixture: two K4 cliques
    {a,b,c,d} / {e,f,g,h} (unit weights), isolated z, and one heavy
    bridge e-b with w=10."""
    import pyarrow as pa
    edges = [("a","b",1.),("a","c",1.),("a","d",1.),("c","d",1.),
             ("b","c",1.),("b","d",1.),
             ("e","f",1.),("e","g",1.),("e","h",1.),("f","h",1.),
             ("f","g",1.),("g","h",1.),
             ("e","b",10.)]
    tbl = pa.table({"src": [e[0] for e in edges],
                    "dst": [e[1] for e in edges],
                    "weight": [e[2] for e in edges]})
    extra = rd.from_arrow(pa.table({"node": ["z"]}))
    return build_graph(rd.from_arrow(tbl), weight_col="weight",
                       undirected=True, extra_vertices=extra,
                       name="wlouvain_fx")


def test_weighted_louvain_reference_fixture():
    """WeightedLouvain parity (algo/.../impl/louvain/WeightedLouvain.java;
    golden from tests/.../WeightedLouvainModularityTest.java:186 —
    4 communities: the w=10 bridge pulls b and e out of their cliques)."""
    g = _weighted_louvain_fixture()
    res = louvain(g, max_iterations=20)
    comm = {r["node"]: r["community"] for r in res.dataset.take_all()}
    assert comm["b"] == comm["e"]                      # heavy pair sticks
    assert len(set(comm.values())) == 4
    assert comm["z"] not in {v for k, v in comm.items() if k != "z"}
    # modularity must match the independent brute-force formula
    edges = [("a","b",1.),("a","c",1.),("a","d",1.),("c","d",1.),
             ("b","c",1.),("b","d",1.),("e","f",1.),("e","g",1.),
             ("e","h",1.),("f","h",1.),("f","g",1.),("g","h",1.),("e","b",10.)]
    m2 = 2 * sum(w for _,_,w in edges)
    win = sum(2*w for a,b,w in edges if comm[a] == comm[b])
    strength = {}
    for a,b,w in edges:
        strength[a] = strength.get(a,0)+w
        strength[b] = strength.get(b,0)+w
    stot = {}
    for v,s in strength.items():
        stot[comm[v]] = stot.get(comm[v],0)+s
    q = win/m2 - sum((s/m2)**2 for s in stot.values())
    assert res.stats["modularity"] == pytest.approx(q, abs=1e-12)


def test_weighted_vs_unweighted_louvain_differ():
    """Ignoring the weights (weighted=False) must keep the two K4
    cliques intact (the unit bridge can't break them apart)."""
    g = _weighted_louvain_fixture()
    res = louvain(g, max_iterations=20, weighted=False)
    comm = {r["node"]: r["community"] for r in res.dataset.take_all()}
    assert comm["a"] == comm["b"] == comm["c"] == comm["d"]
    assert comm["e"] == comm["f"] == comm["g"] == comm["h"]
    assert len(set(comm.values())) == 3
