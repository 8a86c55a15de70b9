"""Parallel maximal matching — property-checked on small graphs."""

import ray.data as rd

from neo4j_graph_algorithms_ray.algorithms.matching import maximal_matching
from neo4j_graph_algorithms_ray.graph import build_graph


def _check_matching(rows, edges):
    pairs = {(r["node_a"], r["node_b"]) for r in rows}
    used = [n for p in pairs for n in p]
    assert len(used) == len(set(used)), "matched pairs share an endpoint"
    und = {tuple(sorted(e)) for e in edges}
    assert pairs <= und, "matched a non-edge"
    # maximality: every unmatched-unmatched edge would extend it
    matched = set(used)
    for u, v in und:
        assert u in matched or v in matched, f"edge {u}-{v} extendable"
    return pairs


def test_matching_triangle_pendant():
    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    ds = rd.from_items([{"src": u, "dst": v} for u, v in edges])
    g = build_graph(ds, src_col="src", dst_col="dst", undirected=True,
                    name="match_tri")
    rows = maximal_matching(g, rounds=8).take_all()
    pairs = _check_matching(rows, edges)
    # triangle+pendant: a maximal matching has 1 or 2 edges
    assert 1 <= len(pairs) <= 2


def test_matching_path_graph():
    edges = [(f"n{i}", f"n{i+1}") for i in range(9)]
    ds = rd.from_items([{"src": u, "dst": v} for u, v in edges])
    g = build_graph(ds, src_col="src", dst_col="dst", undirected=True,
                    name="match_path")
    rows = maximal_matching(g, rounds=12).take_all()
    pairs = _check_matching(rows, edges)
    # a maximal matching on P10 has between 3 and 5 edges
    assert 3 <= len(pairs) <= 5


def test_matching_regime_parity(monkeypatch):
    # distributed rounds and the driver-escape numpy loop must agree
    edges = [(f"h{i}", f"h{(i * 7 + 3) % 23}") for i in range(40)]
    edges = [(u, v) for u, v in edges if u != v]
    ds = rd.from_items([{"src": u, "dst": v} for u, v in edges])
    g = build_graph(ds, src_col="src", dst_col="dst", undirected=True,
                    name="match_parity")
    monkeypatch.setenv("NGA_MATCH_DRIVER_LIMIT", "200000")
    local = sorted((r["node_a"], r["node_b"], r["matched_round"])
                   for r in maximal_matching(g, rounds=8).take_all())
    monkeypatch.setenv("NGA_MATCH_DRIVER_LIMIT", "0")
    dist = sorted((r["node_a"], r["node_b"], r["matched_round"])
                  for r in maximal_matching(g, rounds=8).take_all())
    assert local == dist
    assert len(local) >= 1
