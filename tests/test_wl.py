"""Weisfeiler-Leman color refinement — brute-force replay parity and
symmetry detection on small graphs."""

import hashlib

import ray.data as rd

from neo4j_graph_algorithms_ray.algorithms.wl import wl_colors


def _md5i(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _brute(edges, rounds=2):
    und = sorted({tuple(sorted(e)) for e in edges if e[0] != e[1]})
    nbrs = {}
    for a, b in und:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    c = {n: len(v) for n, v in nbrs.items()}
    for _ in range(rounds):
        c = {n: _md5i(f"{c[n]}|"
                      + ",".join(str(x) for x in sorted(c[m]
                                                        for m in nbrs[n])))
             for n in nbrs}
    return c


def _run(edges, rounds=2):
    ds = rd.from_items([{"src": u, "dst": v} for u, v in edges])
    return {r["node"]: r["wl_color"]
            for r in wl_colors(ds, rounds=rounds).take_all()}


def test_wl_matches_brute_force():
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")]
    assert _run(edges) == _brute(edges)


def test_wl_symmetry_classes():
    # triangle with a pendant path: a,b symmetric; c,d,e all distinct
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")]
    got = _run(edges)
    assert got["a"] == got["b"]
    assert len({got["a"], got["c"], got["d"], got["e"]}) == 4


def test_wl_regular_graph_single_color():
    # 4-cycle: vertex-transitive, every node identical at any depth
    edges = [("p", "q"), ("q", "r"), ("r", "s"), ("s", "p")]
    got = _run(edges, rounds=3)
    assert len(set(got.values())) == 1


def test_wl_rounds_refine():
    # path P4: round 1 separates ends from middles; star center vs leaf
    edges = [("1", "2"), ("2", "3"), ("3", "4")]
    got = _run(edges, rounds=2)
    assert got["1"] == got["4"] and got["2"] == got["3"]
    assert got["1"] != got["2"]
    assert _run(edges, rounds=2) == _brute(edges, rounds=2)


def test_wl_self_loops_and_direction_ignored():
    base = _run([("a", "b"), ("b", "c")])
    with_noise = _run([("b", "a"), ("a", "b"), ("b", "c"), ("c", "c")])
    assert base == with_noise
