"""DAG longest-path layering — golden values and regime parity."""

import pytest
import ray.data as rd

from neo4j_graph_algorithms_ray.algorithms.dag import dag_levels


def _levels(edges, **kw):
    ds = rd.from_items([{"src": u, "dst": v} for u, v in edges])
    return {r["node"]: r["level"]
            for r in dag_levels(ds, **kw).take_all()}


def test_dag_levels_diamond():
    #   0 -> 1 -> 3,  0 -> 2 -> 3,  3 -> 4 ; longest path wins
    lv = _levels([(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)])
    assert lv == {0: 0, 1: 1, 2: 1, 3: 2, 4: 3}


def test_dag_levels_longest_path_dominates():
    # 0->1->2->3 and a shortcut 0->3: level(3) is 3, not 1
    lv = _levels([(0, 1), (1, 2), (2, 3), (0, 3)])
    assert lv[3] == 3


def test_dag_levels_cycle_raises():
    with pytest.raises(RuntimeError):
        _levels([(0, 1), (1, 0)], max_rounds=16)


def test_dag_levels_regime_parity(monkeypatch):
    edges = [(i, (i * 3 + 1) % 40 + i + 1) for i in range(40)]
    edges = [(u, v) for u, v in edges if u < v]  # acyclic: u < v
    monkeypatch.setenv("NGA_DAG_DRIVER_LIMIT", "200000")
    local = _levels(edges)
    monkeypatch.setenv("NGA_DAG_DRIVER_LIMIT", "0")
    dist = _levels(edges)
    assert local == dist


def test_dag_levels_distributed_cycle_raises(monkeypatch):
    monkeypatch.setenv("NGA_DAG_DRIVER_LIMIT", "0")
    with pytest.raises(RuntimeError):
        _levels([(0, 1), (1, 2), (2, 0)], max_rounds=16)
