"""PageRank oracles — re-expressed from the reference's unit tests
(tests/.../impl/PageRankTest.java, PageRankWikiTest.java): same fixture
edges, same goldens at 40 iterations / damping 0.85 / tolerance 1e-2,
parameterized across partition counts instead of graph implementations;
plus the north rule's 1e-6 convergence check against an independent
numpy power iteration with identical (1-d) + d·Σ semantics."""

import numpy as np
import pytest
import ray.data as rd

from neo4j_graph_algorithms_ray import build_graph, fixtures as fx
from neo4j_graph_algorithms_ray.algorithms import pagerank


def numpy_pagerank(nodes, edges, damping=0.85, iters=200):
    idx = {n: i for i, n in enumerate(sorted(nodes))}
    n = len(idx)
    outdeg = np.zeros(n)
    for s, _ in edges:
        outdeg[idx[s]] += 1
    r = np.full(n, 1 - damping)
    for _ in range(iters):
        nxt = np.full(n, 1 - damping)
        for s, d in edges:
            nxt[idx[d]] += damping * r[idx[s]] / outdeg[idx[s]]
        r = nxt
    return {n_: r[i] for n_, i in idx.items()}


def _build(nodes, edges, parts, name):
    g = build_graph(rd.from_arrow(fx.edge_table(edges)),
                    extra_vertices=rd.from_items([{"node": n} for n in nodes]),
                    name=f"{name}_p{parts}")
    return g


@pytest.mark.parametrize("parts", [1, 3])
@pytest.mark.parametrize("fixture", ["f1", "f2"])
def test_pagerank_goldens(parts, fixture):
    nodes, edges, golden = {
        "f1": (fx.F1_NODES, fx.F1_EDGES, fx.F1_GOLDEN),
        "f2": (fx.F2_NODES, fx.F2_EDGES, fx.F2_GOLDEN),
    }[fixture]
    g = _build(nodes, edges, parts, fixture)
    res = pagerank(g, 0.85, 40, num_partitions=parts)
    scores = {r["node"]: r["score"] for r in res.dataset.take_all()}
    for k, v in golden.items():
        assert scores[k] == pytest.approx(v, abs=1e-2), k
    assert res.iterations == 40


@pytest.mark.parametrize("parts", [1, 3])
def test_pagerank_convergence_1e6(parts):
    g = _build(fx.F2_NODES, fx.F2_EDGES, parts, "f2conv")
    # stop at max|delta| <= 1e-7: the fixpoint residual is bounded by
    # d/(1-d) * max_delta ≈ 5.7x, so 1e-7 guarantees 1e-6 closeness
    res = pagerank(g, 0.85, max_iterations=500, tolerance=1e-7, num_partitions=parts)
    assert res.converged
    expect = numpy_pagerank(fx.F2_NODES, fx.F2_EDGES)
    scores = {r["node"]: r["score"] for r in res.dataset.take_all()}
    for k, v in expect.items():
        assert scores[k] == pytest.approx(v, abs=1e-6), k


def test_pagerank_partition_invariance():
    """Same result at 1 partition vs 4 partitions (replaces the
    reference's cross-graph-impl parameterization)."""
    tbl = fx.scale_free_edges(2000, seed=7)
    r = {}
    for p in (1, 4):
        g = build_graph(rd.from_arrow(tbl), name=f"sf2000_p{p}")
        res = pagerank(g, 0.85, max_iterations=300, tolerance=1e-9, num_partitions=p)
        df = res.dataset.to_pandas().sort_values("node").reset_index(drop=True)
        r[p] = df
    assert np.allclose(r[1]["score"], r[4]["score"], atol=1e-9)


def test_pagerank_checkpoint_resume(tmp_path):
    """Kill-and-resume: run 5 iterations with checkpointing, then resume
    to 40; must equal a straight 40-iteration run."""
    tbl = fx.edge_table(fx.F2_EDGES)
    g1 = build_graph(rd.from_arrow(tbl), name="ckpt_a")
    straight = pagerank(g1, 0.85, 40, num_partitions=2)
    s1 = straight.dataset.to_pandas().sort_values("node")["score"].to_numpy()

    g2 = build_graph(rd.from_arrow(tbl), name="ckpt_b")
    ck = str(tmp_path / "pr")
    pagerank(g2, 0.85, 5, num_partitions=2, checkpoint_dir=ck, checkpoint_every=5)
    from neo4j_graph_algorithms_ray.registry import GraphCatalog
    # simulate loss of in-memory state: rebuild engine actors from shards
    GraphCatalog.remove("ckpt_b")
    g2b = build_graph(rd.from_arrow(tbl), name="ckpt_b2")
    g2b.graph_dir = g2.graph_dir  # same checkpointed layout
    g2b.bounds = g2.bounds
    resumed = pagerank(g2b, 0.85, 40, num_partitions=2, checkpoint_dir=ck, resume=True)
    s2 = resumed.dataset.to_pandas().sort_values("node")["score"].to_numpy()
    assert resumed.iterations == 35
    assert np.allclose(s1, s2, atol=0)


def test_personalized_pagerank_vs_numpy():
    """PPR seeds get teleport mass; everything else only inherits.
    Brute-force numpy reference on a small digraph."""
    import numpy as np
    import ray.data as rd

    from neo4j_graph_algorithms_ray.algorithms import pagerank
    from neo4j_graph_algorithms_ray.graph import build_graph

    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2), (5, 0)]
    g = build_graph(rd.from_items([{"src": s, "dst": d} for s, d in edges]),
                    name="ppr_test")
    seeds = [0, 5]
    res = pagerank(g, 0.85, max_iterations=30, source_nodes=seeds)
    got = {r["node"]: r["score"] for r in res.dataset.take_all()}

    n = 6
    out = np.zeros(n)
    adj = np.zeros((n, n))
    for s, d in edges:
        out[s] += 1
        adj[s, d] = 1
    r = np.where(np.isin(np.arange(n), seeds), 0.15, 0.0)
    for _ in range(30):
        push = np.where(out > 0, r / np.maximum(out, 1), 0.0)
        r = np.where(np.isin(np.arange(n), seeds), 0.15, 0.0) + 0.85 * (adj.T @ push)
    for v in range(n):
        assert abs(got[v] - r[v]) < 1e-9
    # seed 5 has no in-edges -> its score is teleport mass only
    assert abs(got[5] - 0.15) < 1e-12


def test_ppr_unknown_seed_raises():
    import pytest
    import ray.data as rd

    from neo4j_graph_algorithms_ray.algorithms import pagerank
    from neo4j_graph_algorithms_ray.graph import build_graph
    g = build_graph(rd.from_items([{"src": 0, "dst": 1}]), name="ppr_test2")
    with pytest.raises(ValueError):
        pagerank(g, 0.85, max_iterations=2, source_nodes=[99])


def test_hits_vs_numpy():
    import numpy as np
    import ray.data as rd

    from neo4j_graph_algorithms_ray.algorithms.hits import hits
    from neo4j_graph_algorithms_ray.graph import build_graph

    edges = [(0, 2), (1, 2), (3, 2), (2, 4), (4, 0), (3, 4)]
    g = build_graph(rd.from_items([{"src": s, "dst": d} for s, d in edges]),
                    name="hits_test")
    res = hits(g, max_iterations=15)
    got = {r["node"]: (r["hub"], r["authority"])
           for r in res.dataset.take_all()}

    n = 5
    adj = np.zeros((n, n))
    for s, d in edges:
        adj[s, d] = 1
    h = np.ones(n)
    a = np.ones(n)
    for _ in range(15):
        a = adj.T @ h
        a /= np.linalg.norm(a) or 1.0
        h = adj @ a
        h /= np.linalg.norm(h) or 1.0
    for v in range(n):
        assert abs(got[v][0] - h[v]) < 1e-9
        assert abs(got[v][1] - a[v]) < 1e-9
    # node 2 is the authority (3 in-links); nodes 3 the top hub
    assert max(range(n), key=lambda v: got[v][1]) == 2


def test_articlerank_uniform_cycle():
    import math

    import ray.data as rd

    from neo4j_graph_algorithms_ray.algorithms.pagerank import articlerank
    from neo4j_graph_algorithms_ray.graph import build_graph
    # 3-cycle: deg=1 everywhere, avg=1 -> AR = 0.15 + 0.85*AR/2
    g = build_graph(rd.from_items(
        [{"src": 0, "dst": 1}, {"src": 1, "dst": 2}, {"src": 2, "dst": 0}]),
        name="ar_cycle")
    res = articlerank(g, 0.85, max_iterations=60)
    fix = 0.15 / (1 - 0.85 / 2)
    for r in res.dataset.take_all():
        assert math.isclose(r["score"], fix, rel_tol=1e-9)


def test_articlerank_dampens_hubs():
    import ray.data as rd

    from neo4j_graph_algorithms_ray.algorithms.pagerank import (articlerank,
                                                                pagerank)
    from neo4j_graph_algorithms_ray.graph import build_graph
    # hub 0 links to 1..5; node 6 links only to 1
    edges = [{"src": 0, "dst": i} for i in range(1, 6)] \
        + [{"src": 6, "dst": 1}]
    g = build_graph(rd.from_items(edges), name="ar_hub")
    pr = {r["node"]: r["score"] for r in
          pagerank(g, 0.85, max_iterations=20).dataset.take_all()}
    ar = {r["node"]: r["score"] for r in
          articlerank(g, 0.85, max_iterations=20).dataset.take_all()}
    # node 1's extra endorsement comes from LOW-out-degree node 6;
    # ArticleRank's +avg divisor shrinks low-degree endorsements
    # relatively more (1 -> 1+avg vs 5 -> 5+avg), so node 1's lead
    # over node 2 must NARROW vs plain PageRank
    assert (ar[1] - ar[2]) / ar[2] < (pr[1] - pr[2]) / pr[2]


def test_katz_cycle_closed_form():
    import math

    import ray.data as rd

    from neo4j_graph_algorithms_ray.algorithms.pagerank import katz
    from neo4j_graph_algorithms_ray.graph import build_graph
    # on a cycle every node has exactly one in-neighbor:
    # x_{t+1} = 1 + a x_t -> fixpoint 1/(1-a)
    g = build_graph(rd.from_items(
        [{"src": 0, "dst": 1}, {"src": 1, "dst": 2}, {"src": 2, "dst": 0}]),
        name="katz_cycle")
    res = katz(g, alpha=0.2, beta=1.0, max_iterations=80)
    for r in res.dataset.take_all():
        assert math.isclose(r["score"], 1 / (1 - 0.2), rel_tol=1e-9)


def test_katz_no_degree_normalization():
    import ray.data as rd

    from neo4j_graph_algorithms_ray.algorithms.pagerank import katz
    from neo4j_graph_algorithms_ray.graph import build_graph
    # hub 0 -> {1,2}: both targets receive the hub's FULL attenuated
    # score (no /outdeg split), so x1 == x2 == beta + alpha*beta
    g = build_graph(rd.from_items(
        [{"src": 0, "dst": 1}, {"src": 0, "dst": 2}]), name="katz_hub")
    xs = {r["node"]: r["score"]
          for r in katz(g, 0.5, 1.0, max_iterations=5).dataset.take_all()}
    assert xs[1] == xs[2] == 1.5


def test_pagerank_warm_continues_cold_series():
    """10 warm Jacobi sweeps from the cold 20-iteration vector must
    equal the cold 30-iteration run (same truncated Neumann series)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from neo4j_graph_algorithms_ray.algorithms.pagerank import (pagerank,
                                                                pagerank_warm)
    from neo4j_graph_algorithms_ray.graph import build_graph
    rng = np.random.default_rng(3)
    e = {(int(s), int(d)) for s, d in
         zip(rng.integers(0, 60, 400), rng.integers(0, 60, 400)) if s != d}
    src, dst = zip(*sorted(e))
    g = build_graph(rd.from_arrow(pa.table({"src": list(src),
                                            "dst": list(dst)})),
                    name="pr_warm")
    x20 = pagerank(g, 0.85, max_iterations=20).dataset
    warm = pagerank_warm(g, x20, 0.85, max_iterations=10).dataset
    cold = pagerank(g, 0.85, max_iterations=30).dataset
    w = {r["node"]: r["score"] for r in warm.take_all()}
    c = {r["node"]: r["score"] for r in cold.take_all()}
    assert set(w) == set(c)
    assert all(abs(w[k] - c[k]) < 1e-9 for k in w)


def test_pagerank_warm_missing_nodes_cold_init():
    """Nodes absent from the init vector start at 1-d."""
    import pyarrow as pa
    import ray.data as rd

    from neo4j_graph_algorithms_ray.algorithms.pagerank import pagerank_warm
    from neo4j_graph_algorithms_ray.graph import build_graph
    g = build_graph(rd.from_arrow(pa.table({"src": [1, 2], "dst": [2, 3]})),
                    name="pr_warm_miss")
    init = rd.from_arrow(pa.table({"node": [1], "score": [0.15]}))
    got = {r["node"]: r["score"] for r in
           pagerank_warm(g, init, 0.85, max_iterations=1)
           .dataset.take_all()}
    # one sweep from all-0.15: r(2) = 0.15 + 0.85*0.15, r(3) likewise
    assert abs(got[1] - 0.15) < 1e-12
    assert abs(got[2] - (0.15 + 0.85 * 0.15)) < 1e-12
    assert abs(got[3] - (0.15 + 0.85 * 0.15)) < 1e-12


def test_pagerank_batch_matches_single_seed_columns():
    """Each column of the batched multi-seed PPR equals the independent
    single-seed run exactly (same delta-push recurrence per column)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from neo4j_graph_algorithms_ray.algorithms.pagerank import (
        pagerank, pagerank_batch)
    from neo4j_graph_algorithms_ray.graph import build_graph
    rng = np.random.default_rng(2)
    e = sorted({(int(s), int(d)) for s, d in
                zip(rng.integers(0, 50, 300), rng.integers(0, 50, 300))
                if s != d})
    src, dst = zip(*e)
    g = build_graph(rd.from_arrow(pa.table({"src": list(src),
                                            "dst": list(dst)})),
                    name="pprb_test")
    seeds = [0, 7, 13]
    bt = {(r["seed"], r["node"]): r["score"]
          for r in pagerank_batch(g, seeds, 0.85, max_iterations=20)
          .dataset.take_all()}
    assert len(bt) == len(seeds) * g.num_vertices
    for s in seeds:
        for r in pagerank(g, 0.85, max_iterations=20,
                          source_nodes=[s]).dataset.take_all():
            assert abs(bt[(s, r["node"])] - r["score"]) < 1e-12


def test_pipelined_bit_parity_with_barriered(monkeypatch):
    """The pipelined superstep loop (speculative wave + snapshot
    rollback) must reproduce the barriered loop bit for bit — same
    iteration count, converged flag, and scores — in both convergence
    and fixed-iteration modes."""
    tbl = fx.scale_free_edges(4000, mean_deg=6, seed=11)
    import ray.data as rd
    g = build_graph(rd.from_arrow(tbl).repartition(4), name="pipeparity")
    for kwargs in ({"max_iterations": 200, "tolerance": 1e-4},
                   {"max_iterations": 7}):
        monkeypatch.setenv("NGA_PIPELINE_PR", "0")
        r0 = pagerank(g, 0.85, num_partitions=4, **kwargs)
        monkeypatch.setenv("NGA_PIPELINE_PR", "1")
        r1 = pagerank(g, 0.85, num_partitions=4, **kwargs)
        assert (r0.iterations, r0.converged) == (r1.iterations, r1.converged)
        d0 = {r["node"]: r["score"] for r in r0.dataset.take_all()}
        d1 = {r["node"]: r["score"] for r in r1.dataset.take_all()}
        assert d0 == d1   # bit-identical, not approx
