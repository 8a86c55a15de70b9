"""Density-adaptive dense message blocks (state/shards.py _route):
contract tests — dense and sparse exchanges must produce identical
sums, and the adaptive switch must respect NGA_DENSE_MSG_RATIO."""

import numpy as np
import pytest
import ray.data as rd

from neo4j_graph_algorithms_ray import build_graph, fixtures as fx
from neo4j_graph_algorithms_ray.algorithms import pagerank
from neo4j_graph_algorithms_ray.algorithms.common import get_engine


@pytest.fixture(scope="module")
def dense_graph():
    # mean degree >> P so per-sender pre-aggregated messages cover most
    # of every receiver's range — the regime dense blocks target
    tbl = fx.scale_free_edges(3000, mean_deg=24, seed=5)
    return build_graph(rd.from_arrow(tbl).repartition(4), name="densemsg")


def _scores(g, ratio, monkeypatch):
    monkeypatch.setenv("NGA_DENSE_MSG_RATIO", ratio)
    r = pagerank(g, 0.85, max_iterations=12, num_partitions=4)
    return {x["node"]: x["score"] for x in r.dataset.take_all()}


def test_dense_equals_sparse_exchange(dense_graph, monkeypatch):
    dense = _scores(dense_graph, "0.0", monkeypatch)    # always dense
    sparse = _scores(dense_graph, "off", monkeypatch)   # never (non-numeric)
    adaptive = _scores(dense_graph, "0.35", monkeypatch)
    assert dense == sparse == adaptive  # bit-identical, not approx


def test_dense_blocks_actually_engage(dense_graph, monkeypatch):
    """At ratio 0 every (sender, receiver) slice ships a dense block —
    msgs_out then counts receiver-range slots (P * n per superstep),
    not unique-dst entries."""
    import ray
    monkeypatch.setenv("NGA_DENSE_MSG_RATIO", "0.0")
    eng = get_engine(dense_graph, 4)
    [a.drain_metrics.remote() for a in eng.actors]
    ray.get([a.drain_metrics.remote() for a in eng.actors])
    r = pagerank(dense_graph, 0.85, max_iterations=3, num_partitions=4)
    total_msgs = sum(m.get("msgs_out", 0) for it in r.metrics for m in it)
    n, P, iters = dense_graph.num_vertices, 4, 3
    assert total_msgs == n * P * iters


def test_sum_state_dense_parity(dense_graph, monkeypatch):
    """sum_state → set_sum_update (the HITS/eigenvector pull) through
    dense blocks must match the sparse exchange exactly."""
    import ray
    outs = {}
    for tag, ratio in (("dense", "0.0"), ("sparse", "off")):
        monkeypatch.setenv("NGA_DENSE_MSG_RATIO", ratio)
        eng = get_engine(dense_graph, 4)
        eng.init_state("x", "const", 1.0)
        eng.step("sum_state", "set_sum_update",
                 scatter_kw={"name": "x"}, update_kw={"name": "y"})
        tabs = ray.get([a.state_table.remote(["y"])
                        for a in eng.actors]) \
            if hasattr(eng.actors[0], "state_table") else None
        if tabs is None:
            outs[tag] = eng.state_dataset(["y"]).to_pandas()
        else:
            import pyarrow as pa
            outs[tag] = pa.concat_tables(tabs).to_pandas()
    a = outs["dense"].sort_values("vid").reset_index(drop=True)
    b = outs["sparse"].sort_values("vid").reset_index(drop=True)
    assert (a["y"].to_numpy() == b["y"].to_numpy()).all()


def test_two_level_dense_parity(dense_graph, monkeypatch):
    """Dense blocks through the two-level aggregators (_combine_member
    folds mixed sparse/dense into one block per member) must match the
    direct dense exchange exactly."""
    monkeypatch.setenv("NGA_DENSE_MSG_RATIO", "0.0")
    monkeypatch.setenv("NGA_TWO_LEVEL_P", "1000")   # direct
    direct = {x["node"]: x["score"] for x in pagerank(
        dense_graph, 0.85, max_iterations=8,
        num_partitions=4).dataset.take_all()}
    monkeypatch.setenv("NGA_TWO_LEVEL_P", "2")      # two-level at P=4
    two = {x["node"]: x["score"] for x in pagerank(
        dense_graph, 0.85, max_iterations=8,
        num_partitions=4).dataset.take_all()}
    for k, v in direct.items():
        assert two[k] == pytest.approx(v, abs=1e-9), k
