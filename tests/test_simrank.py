"""SimRank — brute-force parity on small digraphs plus the
driver/distributed regime-parity pin."""

import numpy as np
import pytest
import ray.data as rd

from neo4j_graph_algorithms_ray.algorithms.simrank import simrank


def _brute(edges, c=0.8, iters=5):
    """Independent dict-based reference of the in-neighbor recurrence."""
    nodes = sorted({x for e in edges for x in e})
    inn = {n: sorted({s for s, d in edges if d == n and s != d})
           for n in nodes}
    s = {(a, b): 1.0 if a == b else 0.0 for a in nodes for b in nodes}
    for _ in range(iters):
        nxt = {}
        for a in nodes:
            for b in nodes:
                if a == b:
                    nxt[(a, b)] = 1.0
                elif inn[a] and inn[b]:
                    nxt[(a, b)] = (c / (len(inn[a]) * len(inn[b]))
                                   * sum(s[(i, j)] for i in inn[a]
                                         for j in inn[b]))
                else:
                    nxt[(a, b)] = 0.0
        s = nxt
    return s


FIXTURE = [("U", "PA"), ("U", "PB"), ("PA", "SA"), ("PB", "SB"),
           ("SA", "U"), ("SB", "U"), ("SA", "SA")]  # self-loop dropped


def _as_ds(edges):
    return rd.from_items([{"src": u, "dst": v} for u, v in edges])


def _pairs(ds):
    return {(r["a"], r["b"]): r["s"] for r in ds.take_all()}


def test_simrank_matches_brute_force():
    want = _brute(FIXTURE)
    got = _pairs(simrank(_as_ds(FIXTURE)))
    for k, v in want.items():
        assert abs(got.get(k, 0.0) - v) < 1e-12, (k, v, got.get(k))
    assert all(v > 0 for v in got.values())  # zero pairs pruned


def test_simrank_symmetric_and_diagonal():
    got = _pairs(simrank(_as_ds(FIXTURE)))
    nodes = {x for e in FIXTURE for x in e}
    for n in nodes:
        assert got[(n, n)] == 1.0
    for (a, b), v in got.items():
        assert abs(got[(b, a)] - v) < 1e-15


def test_simrank_regime_parity(monkeypatch):
    """Distributed join/groupby sweeps == dense driver sweeps."""
    rng = np.random.default_rng(7)
    edges = sorted({(f"n{int(a)}", f"n{int(b)}")
                    for a, b in rng.integers(0, 14, size=(60, 2))
                    if a != b})
    drv = _pairs(simrank(_as_ds(edges)))
    monkeypatch.setenv("NGA_SIMRANK_DRIVER_LIMIT", "0")
    dist = _pairs(simrank(_as_ds(edges), num_partitions=4))
    assert set(drv) == set(dist)
    for k, v in drv.items():
        assert abs(dist[k] - v) < 1e-9, (k, v, dist[k])


def test_simrank_no_inneighbor_pair_is_zero():
    # "z" points in but nothing points at z: every (z, other) pair is 0
    edges = [("z", "a"), ("z", "b"), ("a", "b"), ("b", "a")]
    got = _pairs(simrank(_as_ds(edges)))
    assert got[("z", "z")] == 1.0
    assert ("z", "a") not in got and ("a", "z") not in got
    want = _brute(edges)
    assert abs(got[("a", "b")] - want[("a", "b")]) < 1e-12


@pytest.mark.parametrize("c,iters", [(0.6, 3), (0.9, 7)])
def test_simrank_params(c, iters):
    want = _brute(FIXTURE, c=c, iters=iters)
    got = _pairs(simrank(_as_ds(FIXTURE), c=c, iterations=iters))
    for k, v in want.items():
        assert abs(got.get(k, 0.0) - v) < 1e-12
