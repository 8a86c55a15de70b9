"""Output-boundary id translation — broadcast vs join regime parity.

The reference translates every result through ``toOriginalNodeId``
(core/.../api/IdMapping.java:44). Our output boundary must stay
scale-safe: above the broadcast vertex limit no code path may
materialize the whole vertex table on the driver — these tests force
the limit to 1 (env-overridable) and assert the join regime produces
byte-identical results to the broadcast regime, end to end through
build_graph + pagerank + wcc.
"""

import numpy as np
import pytest
import ray.data as rd

from neo4j_graph_algorithms_ray import build_graph, fixtures as fx
from neo4j_graph_algorithms_ray.algorithms import pagerank, wcc
from neo4j_graph_algorithms_ray.algorithms.common import translate_vid_columns


def _pr_scores(g):
    res = pagerank(g, 0.85, max_iterations=30)
    return {r["node"]: r["score"] for r in res.dataset.take_all()}


def _wcc_comps(g):
    res = wcc(g)
    ds = translate_vid_columns(g, res.dataset, ["component"])
    return {r["node"]: r["component"] for r in ds.take_all()}


def test_join_regime_matches_broadcast(monkeypatch):
    tbl = fx.edge_table(fx.F5_EDGES)
    g_b = build_graph(rd.from_arrow(tbl), name="outb_bcast")
    want_pr = _pr_scores(g_b)
    want_wcc = _wcc_comps(g_b)

    monkeypatch.setenv("NGA_BROADCAST_VERTEX_LIMIT", "1")
    monkeypatch.setenv("NGA_EDGE_DRIVER_DISTINCT_LIMIT", "0")
    g_j = build_graph(rd.from_arrow(tbl), name="outb_join")
    got_pr = _pr_scores(g_j)
    got_wcc = _wcc_comps(g_j)

    assert set(got_pr) == set(want_pr)
    for k in want_pr:
        assert got_pr[k] == pytest.approx(want_pr[k], abs=1e-12), k
    assert got_wcc == want_wcc


def test_vid_to_node_map_guarded(monkeypatch):
    g = build_graph(rd.from_arrow(fx.edge_table(fx.F5_EDGES)), name="outb_guard")
    monkeypatch.setenv("NGA_BROADCAST_VERTEX_LIMIT", "1")
    with pytest.raises(RuntimeError, match="broadcast limit"):
        g.vid_to_node_map()


def test_attach_keep_vid_join_regime(monkeypatch):
    import pyarrow as pa
    from neo4j_graph_algorithms_ray.algorithms.common import attach_node_ids
    g = build_graph(rd.from_arrow(fx.edge_table(fx.F5_EDGES)), name="outb_keep")
    state = rd.from_arrow(pa.table({
        "vid": np.arange(g.num_vertices, dtype=np.int64),
        "value": np.arange(g.num_vertices, dtype=np.float64) * 2.0,
    }))
    monkeypatch.setenv("NGA_BROADCAST_VERTEX_LIMIT", "1")
    out = attach_node_ids(g, state, keep_vid=True)
    rows = sorted(out.take_all(), key=lambda r: r["vid"])
    assert out.schema().names[0] == "node"
    assert [r["vid"] for r in rows] == list(range(g.num_vertices))
    assert all(r["value"] == 2.0 * r["vid"] for r in rows)


def test_distinct_gate_routes_on_endpoint_cardinality(monkeypatch):
    """The driver-merge regime is gated on ESTIMATED DISTINCT ENDPOINTS,
    not edge count: a many-edge table over few vertices stays on the
    driver-merge path, while a high-cardinality table (limit shrunk
    below its distinct count) must route to the distributed id-assign
    path — both producing identical graphs."""
    import neo4j_graph_algorithms_ray.graph as gmod

    calls = []
    orig = gmod._merge_unique_driver
    monkeypatch.setattr(gmod, "_merge_unique_driver",
                        lambda refs: calls.append(1) or orig(refs))

    # 60 edges over 6 vertices, limit 10: edge count >> limit but the
    # distinct estimate (<=12 per block-unique sum) fits -> driver merge
    src = np.arange(60, dtype=np.int64) % 6
    dst = (np.arange(60, dtype=np.int64) + 1) % 6
    import pyarrow as pa
    tbl = pa.table({"src": src, "dst": dst})
    monkeypatch.setenv("NGA_EDGE_DRIVER_DISTINCT_LIMIT", "13")
    g_small = build_graph(rd.from_arrow(tbl), name="gate_small", dedup=True)
    assert calls, "dense many-edge table should use the driver merge"
    assert g_small.num_vertices == 6

    # same table, limit 3 < 6 distinct endpoints -> distributed path
    calls.clear()
    monkeypatch.setenv("NGA_EDGE_DRIVER_DISTINCT_LIMIT", "3")
    g_big = build_graph(rd.from_arrow(tbl), name="gate_big", dedup=True)
    assert not calls, "high-cardinality table must take the distributed path"
    assert g_big.num_vertices == 6
    assert g_big.num_edges == g_small.num_edges


def test_block_overlap_resolved_by_tree_merge(monkeypatch):
    """The per-block unique-count SUM grows with block count (overlap
    double-counting): at high parallelism the same graph used to fall
    off the broadcast path into the minutes-long distributed distinct
    (measured 18 s @ 8 CPUs vs ~290 s @ 32 on the 166M-edge scaling
    graph). The remote tree merge must resolve the overlap exactly and
    keep the broadcast regime."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    import neo4j_graph_algorithms_ray.graph as gmod
    from neo4j_graph_algorithms_ray.graph import build_graph

    tree_calls, dist_calls = [], []
    orig_tree = gmod._tree_merge_unique
    monkeypatch.setattr(gmod, "_tree_merge_unique",
                        lambda refs, **kw: tree_calls.append(1)
                        or orig_tree(refs, **kw))
    orig_dist = gmod._unique_endpoint_ids
    monkeypatch.setattr(gmod, "_unique_endpoint_ids",
                        lambda *a, **kw: dist_calls.append(1)
                        or orig_dist(*a, **kw))

    # 200 distinct nodes spread over 16 blocks (no dedup — its groupby
    # would collapse the block structure): the per-block unique sum is
    # ~16×200 ≈ 3200 (> limit 500, within the ×8 tree-merge window);
    # the true distinct 200 <= 500
    rng = np.random.RandomState(7)
    src = rng.randint(0, 200, 4000).astype(np.int64)
    dst = rng.randint(0, 200, 4000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(16)
    monkeypatch.setenv("NGA_EDGE_DRIVER_DISTINCT_LIMIT", "500")
    g = build_graph(ds, name="tree_gate")
    assert tree_calls, "overlap-inflated estimate must trigger tree merge"
    assert not dist_calls, "tree merge must keep the broadcast regime"
    assert g.num_vertices == len(np.unique(np.concatenate([src, dst])))
