"""Two-level (√P aggregator) message exchange parity.

Every algorithm must produce identical results whether supersteps route
messages directly (P² refs) or through ⌈√P⌉ aggregator tasks with
op-aware combining (the P ≥ NGA_TWO_LEVEL_P regime a wide multi-node
cluster runs in). Exercises every combiner kind: sum (pagerank),
min (wcc hash-min, sssp relax), or (MSBFS bits), 2-D sum (Brandes
waves), plus the forward-only lpa triple messages.
"""

import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from neo4j_graph_algorithms_ray import build_graph
from neo4j_graph_algorithms_ray.registry import GraphCatalog


def _edges(seed=7, n=400, m=2500):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    w = (1 + (src[keep] + dst[keep]) % 5).astype(np.float64)
    return pa.table({"src": src[keep].astype(np.int64),
                     "dst": dst[keep].astype(np.int64),
                     "weight": w})


def _results(tag, edges):
    from neo4j_graph_algorithms_ray.algorithms import (
        anf, betweenness_bsp, closeness, label_propagation, pagerank,
        sssp_delta_stepping, wcc)
    g = build_graph(rd.from_arrow(edges), name=f"tlx_{tag}")
    gu = build_graph(rd.from_arrow(edges.select(["src", "dst"])),
                     undirected=True, name=f"tlxu_{tag}")
    gw = build_graph(rd.from_arrow(edges), weight_col="weight",
                     name=f"tlxw_{tag}")
    out = {
        "pr": pagerank(g, 0.85, max_iterations=10, num_partitions=8)
        .dataset.to_pandas().sort_values("node").reset_index(drop=True),
        "wcc": wcc(gu, num_partitions=8)
        .dataset.to_pandas().sort_values("node").reset_index(drop=True),
        "lpa": label_propagation(g, max_iterations=6, mode="semi",
                                 num_partitions=8)
        .dataset.to_pandas().sort_values("node").reset_index(drop=True),
        "sssp": sssp_delta_stepping(gw, 0, num_partitions=8)
        .dataset.to_pandas().sort_values("node").reset_index(drop=True),
        "close": closeness(g, sources=range(32), num_partitions=8)
        .dataset.to_pandas().sort_values("node").reset_index(drop=True),
        "btw": betweenness_bsp(g, sources=list(range(16)), num_partitions=8,
                               wave=8)
        .dataset.to_pandas().sort_values("node").reset_index(drop=True),
        # or2d combiner (ANF bits_wave sketches)
        "anf": anf(g, k_hashes=16, seed=2, num_partitions=8)
        .dataset.to_pandas().sort_values("hop").reset_index(drop=True),
    }
    return out


@pytest.fixture()
def _restore_threshold():
    prev = os.environ.get("NGA_TWO_LEVEL_P")
    yield
    if prev is None:
        os.environ.pop("NGA_TWO_LEVEL_P", None)
    else:
        os.environ["NGA_TWO_LEVEL_P"] = prev


def test_two_level_pointer_jump_matches_direct(_restore_threshold):
    """Chain graph forces pointer jumps to fire; the √P-union + broadcast
    pj exchange must relabel identically to the direct P² exchange."""
    from neo4j_graph_algorithms_ray.algorithms import wcc
    n = 300
    edges = pa.table({"src": np.arange(n - 1, dtype=np.int64),
                      "dst": np.arange(1, n, dtype=np.int64)})
    os.environ["NGA_TWO_LEVEL_P"] = "1000"   # direct pj
    g1 = build_graph(rd.from_arrow(edges), undirected=True, name="pjchain_d")
    direct = wcc(g1, num_partitions=8, jump_every=2)
    os.environ["NGA_TWO_LEVEL_P"] = "2"      # two-level pj at P=8
    g2 = build_graph(rd.from_arrow(edges), undirected=True, name="pjchain_t")
    twolvl = wcc(g2, num_partitions=8, jump_every=2)
    assert direct.stats["pointer_jumps"] >= 1
    assert twolvl.stats["pointer_jumps"] >= 1
    a = direct.dataset.to_pandas().sort_values("node").reset_index(drop=True)
    b = twolvl.dataset.to_pandas().sort_values("node").reset_index(drop=True)
    assert np.array_equal(a["component"].to_numpy(),
                          b["component"].to_numpy())
    assert (a["component"] == a["component"].iloc[0]).all()


def test_two_level_matches_direct(_restore_threshold):
    edges = _edges()
    os.environ["NGA_TWO_LEVEL_P"] = "1000"   # force direct
    direct = _results("direct", edges)
    os.environ["NGA_TWO_LEVEL_P"] = "2"      # force two-level at P=8 (G=3)
    GraphCatalog.clear()
    twolvl = _results("twolevel", edges)
    for name, a in direct.items():
        b = twolvl[name]
        assert list(a.columns) == list(b.columns), name
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if av.dtype.kind == "f":
                assert np.allclose(av, bv, atol=1e-9, equal_nan=True), \
                    (name, c)
            else:
                assert np.array_equal(av, bv), (name, c)
