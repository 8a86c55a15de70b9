"""Triangle count oracles (TriangleCountTest.java ring fixture,
TriangleProcTest 3-community fixture)."""

import pytest
import ray.data as rd

from neo4j_graph_algorithms_ray import build_graph, fixtures as fx
from neo4j_graph_algorithms_ray.algorithms import triangle_count, triangle_stream


def test_triangle_ring():
    """F4: 1000 triangles sharing a center (TriangleCountTest.java:50-135):
    global count 1000, center 1000, ring nodes 2; ring coefficient 2/3."""
    n = 1000
    g = build_graph(rd.from_arrow(fx.triangle_ring_table(n)), undirected=True,
                    name="ring1000")
    per, stats, _ = triangle_count(g)
    assert stats["triangleCount"] == n
    rows = {r["node"]: r for r in per.take_all()}
    assert rows[0]["triangles"] == n
    for i in range(1, n + 1):
        assert rows[i]["triangles"] == 2
        assert rows[i]["coefficient"] == pytest.approx(2 * 2 / (3 * 2), abs=1e-3)


@pytest.mark.parametrize("parts", [2, 4])
def test_triangle_three_communities(parts):
    """F5: directed edges treated as undirected (TriangleCount.java:42);
    3 triangles, per-node count 1, bridges create none."""
    g = build_graph(rd.from_arrow(fx.edge_table(fx.F5_EDGES)), name=f"tri3_p{parts}")
    per, stats, _ = triangle_count(g, num_partitions=parts)
    assert stats["triangleCount"] == 3
    rows = {r["node"]: r["triangles"] for r in per.take_all()}
    for v in "abcdefghi":
        assert rows[v] == 1, v


def test_triangle_stream_triples():
    g = build_graph(rd.from_arrow(fx.edge_table(fx.F5_EDGES)), name="tri3s")
    triples = {tuple(sorted((r["a"], r["b"], r["c"])))
               for r in triangle_stream(g).take_all()}
    assert triples == {("a", "b", "c"), ("d", "e", "f"), ("g", "h", "i")}


def test_triangle_join_path_matches_broadcast(monkeypatch):
    """Force the all-shuffle join path (FAST_PATH_EDGE_LIMIT=0) and
    assert identical per-node counts / coefficients / stats vs the
    broadcast path — no driver arrays anywhere on the join path."""
    g = build_graph(rd.from_arrow(fx.triangle_ring_table(60)), undirected=True,
                    name="ring60_joinpath")
    per_b, stats_b, _ = triangle_count(g)
    monkeypatch.setenv("NGA_TRIANGLE_FAST_PATH_EDGE_LIMIT", "0")
    per_j, stats_j, tri_j = triangle_count(g)
    assert stats_j["triangleCount"] == stats_b["triangleCount"] == 60
    assert stats_j["averageClusteringCoefficient"] == pytest.approx(
        stats_b["averageClusteringCoefficient"], abs=1e-12)
    rows_b = {r["node"]: (r["triangles"], r["coefficient"])
              for r in per_b.take_all()}
    rows_j = {r["node"]: (r["triangles"], r["coefficient"])
              for r in per_j.take_all()}
    assert rows_b == rows_j
    assert tri_j.count() == 60  # join path always materializes triples


def test_triangle_stream_join_path(monkeypatch):
    monkeypatch.setenv("NGA_TRIANGLE_FAST_PATH_EDGE_LIMIT", "0")
    g = build_graph(rd.from_arrow(fx.edge_table(fx.F5_EDGES)), name="tri3s_join")
    triples = {tuple(sorted((r["a"], r["b"], r["c"])))
               for r in triangle_stream(g).take_all()}
    assert triples == {("a", "b", "c"), ("d", "e", "f"), ("g", "h", "i")}


def test_wedge_bounds_balance_skewed():
    """Wedge-weighted range bounds: on a hub-dominated graph the bounds
    isolate the hub's wedge mass instead of equal-width ranges putting
    all work in one task; ranges must tile [0, n) exactly and balance
    cumulative C(k,2) to within one vertex's weight."""
    import numpy as np
    import ray
    from neo4j_graph_algorithms_ray.algorithms.triangles import _wedge_bounds
    # oriented out-degrees: one 1000-degree hub + 999 degree-2 vertices
    k = np.concatenate([[1000], np.full(999, 2)]).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(k)])
    built = (offsets, None, None, None)
    p = 8
    bounds = ray.get(_wedge_bounds.remote(built, p))
    assert bounds[0] == 0 and bounds[-1] == len(k)
    assert (np.diff(bounds) > 0).all()
    w = k * (k - 1) // 2
    loads = np.array([w[a:b].sum() for a, b in zip(bounds[:-1], bounds[1:])])
    # the hub (weight 499500) sits alone in its range; remaining ranges
    # split the tail's 999 weight evenly
    assert loads.max() == w[0]
    assert (loads[loads != w[0]] <= w.sum() / p + w.max()).all()
