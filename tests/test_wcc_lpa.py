"""WCC and label propagation oracles (reference tests re-expressed:
UnionFindsTest.java line fixture; label-propagation doc fixture)."""

import numpy as np
import pytest
import ray.data as rd

from neo4j_graph_algorithms_ray import build_graph, fixtures as fx
from neo4j_graph_algorithms_ray.algorithms import label_propagation, wcc
from neo4j_graph_algorithms_ray.algorithms.wcc import wcc_component_sizes


@pytest.mark.parametrize("parts", [1, 4])
def test_wcc_lines(parts):
    tbl = fx.wcc_lines_table(10, 10)
    g = build_graph(rd.from_arrow(tbl), undirected=True, name=f"lines_p{parts}")
    res = wcc(g, num_partitions=parts)
    assert res.converged
    comp = {r["node"]: r["component"] for r in res.dataset.take_all()}
    assert len(comp) == 100
    for n_, c in comp.items():
        assert c == 10 * (n_ // 10), n_
    sizes = {r["component"]: r["count()"] for r in wcc_component_sizes(res).take_all()}
    assert len(sizes) == 10 and all(v == 10 for v in sizes.values())


def test_wcc_threshold():
    """Weighted threshold union (GraphUnionFind.java:82-104): only edges
    with weight >= threshold union — expressed as an edge filter."""
    import pyarrow as pa
    tbl = pa.table({"src": [0, 1, 2, 3], "dst": [1, 2, 3, 4],
                    "weight": [5.0, 1.0, 5.0, 5.0]})
    ds = rd.from_arrow(tbl).filter(lambda r: r["weight"] >= 2.0)
    g = build_graph(ds, weight_col="weight", undirected=True,
                    extra_vertices=rd.from_items([{"node": i} for i in range(5)]),
                    name="thresh")
    res = wcc(g)
    comp = {r["node"]: r["component"] for r in res.dataset.take_all()}
    assert comp[0] == comp[1]
    assert comp[2] == comp[3] == comp[4]
    assert comp[0] != comp[2]


@pytest.mark.parametrize("parts", [1, 3])
def test_lpa_fixture_partition(parts):
    """F6: the {Alice,Bridget,Michael} / {Charles,Doug,Mark} partition
    from doc/label-propagation.adoc:60-78 / LabelPropagation420Test
    (direction OUTGOING like the 420 test's lp.compute(OUTGOING, 10):
    each node votes among its out-neighbors' labels, i.e. labels flow
    along reversed edges — build the engine graph with edges reversed)."""
    names = sorted(fx.F6_SEEDS)
    tbl = fx.edge_table([(b, a) for a, b in fx.F6_EDGES])
    g = build_graph(rd.from_arrow(tbl), name=f"lpa6_p{parts}")
    seeds = (np.array(names), np.array([fx.F6_SEEDS[n] for n in names]))
    res = label_propagation(g, max_iterations=50, seeds=seeds, num_partitions=parts)
    assert res.converged
    lab = {r["node"]: r["label"] for r in res.dataset.take_all()}
    assert lab["Alice"] == lab["Bridget"] == lab["Michael"]
    assert lab["Charles"] == lab["Doug"] == lab["Mark"]
    assert lab["Alice"] != lab["Charles"]


def test_lpa_default_seeds_and_determinism():
    """Without seed property, initial label = node id (dense vid); two
    runs at different partition counts agree exactly."""
    tbl = fx.scale_free_edges(500, seed=3)
    outs = []
    for p in (1, 4):
        g = build_graph(rd.from_arrow(tbl), undirected=True, name=f"lpad_p{p}")
        res = label_propagation(g, max_iterations=20, num_partitions=p)
        outs.append(res.dataset.to_pandas().sort_values("node")["label"].to_numpy())
    assert np.array_equal(outs[0], outs[1])


def test_wcc_checkpoint_resume(tmp_path):
    tbl = fx.wcc_lines_table(4, 25)  # diameter 24 → ~24 iterations
    g = build_graph(rd.from_arrow(tbl), undirected=True, name="wccck_a")
    straight = wcc(g, num_partitions=2)
    c1 = straight.dataset.to_pandas().sort_values("node")["component"].to_numpy()

    g2 = build_graph(rd.from_arrow(tbl), undirected=True, name="wccck_b")
    ck = str(tmp_path / "wcc")
    wcc(g2, num_partitions=2, max_iterations=5, checkpoint_dir=ck, checkpoint_every=5)
    from neo4j_graph_algorithms_ray.registry import GraphCatalog
    GraphCatalog.remove("wccck_b")
    g2b = build_graph(rd.from_arrow(tbl), undirected=True, name="wccck_b2")
    g2b.graph_dir, g2b.bounds = g2.graph_dir, g2.bounds
    resumed = wcc(g2b, num_partitions=2, checkpoint_dir=ck, resume=True)
    c2 = resumed.dataset.to_pandas().sort_values("node")["component"].to_numpy()
    assert np.array_equal(c1, c2)
    assert resumed.converged


def test_k_core_peeling():
    """Two triangles joined by a bridge vertex: the 2-core keeps both
    triangles and the bridge IF the bridge keeps >= 2 live neighbors;
    a dangling path peels away entirely."""
    import ray.data as rd

    from neo4j_graph_algorithms_ray.algorithms.kcore import k_core
    from neo4j_graph_algorithms_ray.graph import build_graph

    edges = [(0, 1), (1, 2), (2, 0),          # triangle A
             (3, 4), (4, 5), (5, 3),          # triangle B
             (2, 3),                          # bridge edge
             (5, 6), (6, 7)]                  # dangling path
    g = build_graph(rd.from_items([{"src": s, "dst": d} for s, d in edges]),
                    undirected=True, dedup=True, name="kcore_test")
    res = k_core(g, 2)
    got = {r["node"]: r["in_core"] for r in res.dataset.take_all()}
    assert got == {0: 1, 1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 0, 7: 0}
    assert res.converged and res.stats["in_core"] == 6

    # 3-core: triangles alone have degree 2 -> everything peels
    res3 = k_core(g, 3)
    assert all(r["in_core"] == 0 for r in res3.dataset.take_all())


def test_weighted_lpa_matches_replay():
    """Weighted LPA (weight-summed votes, argmax-weight min-label
    tie-break, alternating-parity semi-sync sweeps) vs a pure-python
    replay on a small weighted digraph."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from neo4j_graph_algorithms_ray.algorithms import label_propagation
    from neo4j_graph_algorithms_ray.graph import build_graph

    rng = np.random.default_rng(31)
    edges = list({(int(a), int(b)) for a, b in rng.integers(0, 20, (80, 2))
                  if a != b})
    w = {e: float(1 + (e[0] + e[1]) % 5) for e in edges}
    ds = rd.from_arrow(pa.table({"src": [e[0] for e in edges],
                                 "dst": [e[1] for e in edges],
                                 "weight": [w[e] for e in edges]}))
    g = build_graph(ds, weight_col="weight", name="wlpa_t")
    res = label_propagation(g, max_iterations=4, mode="semi", weighted=True)
    got = {r["node"]: r["label"] for r in res.dataset.take_all()}

    nodes = sorted({x for e in edges for x in e})
    vid = {v: i for i, v in enumerate(nodes)}
    lab = {vid[v]: vid[v] for v in nodes}
    for it in range(4):
        parity = it % 2
        votes = {}
        for (s, d), wv in w.items():
            key = (vid[d], lab[vid[s]])
            votes[key] = votes.get(key, 0.0) + wv
        best = {}
        for (dv, lb), c in votes.items():
            cur = best.get(dv)
            if cur is None or (c, -lb) > (cur[0], -cur[1]):
                best[dv] = (c, lb)
        for dv, (c, lb) in best.items():
            if dv % 2 == parity:
                lab[dv] = lb
    assert got == {v: lab[vid[v]] for v in nodes}


def _brute_core_numbers(edges, nodes):
    """Reference peel: repeatedly remove min-degree vertices."""
    adj = {v: set() for v in nodes}
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    core = {v: 0 for v in nodes}
    k = 1
    live = set(nodes)
    while live:
        changed = True
        while changed:
            drop = {v for v in live if len(adj[v] & live) < k}
            live -= drop
            changed = bool(drop)
        for v in live:
            core[v] = k
        k += 1
    return core


def test_kcore_decomposition_matches_brute_force():
    import numpy as np
    import ray.data as rd

    from neo4j_graph_algorithms_ray.algorithms.kcore import kcore_decomposition
    from neo4j_graph_algorithms_ray.graph import build_graph

    rng = np.random.default_rng(9)
    nodes = list(range(30))
    edges = {tuple(sorted(rng.choice(30, 2, replace=False)))
             for _ in range(70)}
    edges = sorted(edges)
    g = build_graph(rd.from_items([{"src": s, "dst": d} for s, d in edges]),
                    undirected=True, dedup=True,
                    extra_vertices=rd.from_items(
                        [{"node": v} for v in nodes]),
                    name="kcore_decomp_test")
    res = kcore_decomposition(g, num_partitions=3)
    got = {r["node"]: r["core"] for r in res.dataset.take_all()}
    want = _brute_core_numbers(edges, nodes)
    assert got == want
    assert res.converged
    assert res.stats["degeneracy"] == max(want.values())


def test_wcc_incremental_seed_matches_cold_run():
    """Warm-starting WCC from a subgraph's components yields the same
    labels as the cold run on the full graph."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from neo4j_graph_algorithms_ray.algorithms.common import \
        translate_vid_columns
    from neo4j_graph_algorithms_ray.algorithms.wcc import wcc
    from neo4j_graph_algorithms_ray.graph import build_graph
    rng = np.random.default_rng(5)
    full = sorted({(int(s), int(d)) for s, d in
                   zip(rng.integers(0, 80, 160), rng.integers(0, 80, 160))
                   if s != d})
    old = [e for i, e in enumerate(full) if i % 4 != 0]

    def g_of(edges, name):
        s, d = zip(*edges)
        return build_graph(rd.from_arrow(pa.table({"src": list(s),
                                                   "dst": list(d)})),
                           undirected=True, name=name)

    g_old, g_new = g_of(old, "wcc_inc_old"), g_of(full, "wcc_inc_new")
    seed = translate_vid_columns(g_old, wcc(g_old).dataset, ["component"])
    warm = wcc(g_new, init_components=seed)
    cold = wcc(g_new)
    w = {r["node"]: r["component"] for r in translate_vid_columns(
        g_new, warm.dataset, ["component"]).take_all()}
    c = {r["node"]: r["component"] for r in translate_vid_columns(
        g_new, cold.dataset, ["component"]).take_all()}
    assert w == c
