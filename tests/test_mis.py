"""Luby maximal independent set — property-checked on small graphs."""

import ray.data as rd

from neo4j_graph_algorithms_ray.algorithms.mis import mis_luby
from neo4j_graph_algorithms_ray.graph import build_graph


def _check_mis(rows, edges):
    st = {r["node"]: r["status"] for r in rows}
    mis = {n for n, s in st.items() if s == "in_mis"}
    assert all(s != "active" for s in st.values()), "did not converge"
    for u, v in edges:
        assert not (u in mis and v in mis), f"edge {u}-{v} inside MIS"
    for n, s in st.items():
        if s == "removed":
            assert any((u == n and v in mis) or (v == n and u in mis)
                       for u, v in edges), f"{n} removed without MIS neighbor"
    return mis


def test_mis_luby_triangle_pendant():
    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    ds = rd.from_items([{"src": u, "dst": v} for u, v in edges])
    g = build_graph(ds, src_col="src", dst_col="dst", undirected=True,
                    name="mis_tri")
    rows = mis_luby(g, rounds=8).take_all()
    assert len(rows) == 4
    _check_mis(rows, edges)


def test_mis_luby_path_graph():
    edges = [(f"n{i}", f"n{i+1}") for i in range(9)]
    ds = rd.from_items([{"src": u, "dst": v} for u, v in edges])
    g = build_graph(ds, src_col="src", dst_col="dst", undirected=True,
                    name="mis_path")
    rows = mis_luby(g, rounds=12).take_all()
    mis = _check_mis(rows, edges)
    # a maximal independent set on P10 has between 4 and 5 vertices
    assert 4 <= len(mis) <= 5


def test_mis_luby_regime_parity(monkeypatch):
    # distributed rounds and the driver-escape numpy loop must agree
    import ray.data as rd2
    edges = [(f"h{i}", f"h{(i * 7 + 3) % 23}") for i in range(40)]
    edges = [(u, v) for u, v in edges if u != v]
    ds = rd2.from_items([{"src": u, "dst": v} for u, v in edges])
    g = build_graph(ds, src_col="src", dst_col="dst", undirected=True,
                    name="mis_parity")
    monkeypatch.setenv("NGA_MIS_DRIVER_LIMIT", "200000")
    local = sorted((r["node"], r["status"])
                   for r in mis_luby(g, rounds=8).take_all())
    monkeypatch.setenv("NGA_MIS_DRIVER_LIMIT", "0")
    dist = sorted((r["node"], r["status"])
                  for r in mis_luby(g, rounds=8).take_all())
    assert local == dist
