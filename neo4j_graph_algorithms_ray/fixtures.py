"""Fixture graphs from the reference's unit tests (FIXTURES.md).

These are the exact edge lists of the reference's golden tests,
re-expressed as Arrow tables; goldens live in the pytest files.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# F1 — PageRankTest.java:65-106 (filtered Label1/TYPE1 subgraph)
F1_NODES = list("abcdefghij")
F1_EDGES = [("b", "c"), ("c", "b"), ("d", "a"), ("d", "b"), ("e", "b"),
            ("e", "d"), ("e", "f"), ("f", "b"), ("f", "e")]
F1_GOLDEN = {"a": 0.243007, "b": 1.9183995, "c": 1.7806315, "d": 0.21885,
             "e": 0.243007, "f": 0.21885, "g": 0.15, "h": 0.15, "i": 0.15, "j": 0.15}

# F2 — PageRankWikiTest.java:59-100 (node `a` is dangling)
F2_NODES = list("abcdefghijk")
F2_EDGES = [("b", "c"), ("c", "b"), ("d", "a"), ("d", "b"), ("e", "b"), ("e", "d"),
            ("e", "f"), ("f", "b"), ("f", "e"), ("g", "b"), ("g", "e"), ("h", "b"),
            ("h", "e"), ("i", "b"), ("i", "e"), ("j", "e"), ("k", "e")]
F2_GOLDEN = {"a": 0.3040965, "b": 3.5658695, "c": 3.180981, "d": 0.3625935,
             "e": 0.7503465, "f": 0.3625935, "g": 0.15, "h": 0.15, "i": 0.15,
             "j": 0.15, "k": 0.15}

# F6 — label propagation (doc/label-propagation.adoc:60-78)
F6_SEEDS = {"Alice": 2, "Bridget": 3, "Charles": 4, "Doug": 3, "Mark": 4, "Michael": 2}
F6_EDGES = [("Alice", "Bridget"), ("Alice", "Charles"), ("Mark", "Doug"),
            ("Bridget", "Michael"), ("Doug", "Mark"), ("Michael", "Alice"),
            ("Alice", "Michael"), ("Bridget", "Alice"), ("Michael", "Bridget"),
            ("Charles", "Doug")]

# F7 — metapath typed fixture (ComputeAllMetaPathsTest.java:51-121)
F7_LABELS = {"a": "A", "b": "B", "c": "A", "i": "A", "k": "B", "o": "A",
             "s": "C", "t": "C"}
F7_EDGES = [("a", "t"), ("a", "c"), ("a", "b"), ("a", "s"), ("b", "s"), ("b", "t"),
            ("c", "s"), ("c", "b"), ("i", "t"), ("t", "s"), ("t", "o"), ("k", "s")]
# the test's expected set uses label ids A=0,B=1,C=2 and type TYPE1=0
F7_EXPECTED = {
    "0": 4, "1": 2, "2": 2,
    "0 | 0 | 0 | 0 | 0": 2, "0 | 0 | 0 | 0 | 1": 2, "0 | 0 | 0 | 0 | 2": 3,
    "0 | 0 | 1 | 0 | 0": 4, "0 | 0 | 1 | 0 | 2": 4, "0 | 0 | 2 | 0 | 0": 13,
    "0 | 0 | 2 | 0 | 1": 7, "0 | 0 | 2 | 0 | 2": 5,
    "1 | 0 | 0 | 0 | 0": 2, "1 | 0 | 0 | 0 | 1": 2, "1 | 0 | 0 | 0 | 2": 3,
    "1 | 0 | 2 | 0 | 0": 7, "1 | 0 | 2 | 0 | 1": 5, "1 | 0 | 2 | 0 | 2": 3,
    "2 | 0 | 0 | 0 | 0": 3, "2 | 0 | 0 | 0 | 1": 3, "2 | 0 | 0 | 0 | 2": 7,
    "2 | 0 | 1 | 0 | 0": 4, "2 | 0 | 1 | 0 | 2": 5, "2 | 0 | 2 | 0 | 0": 5,
    "2 | 0 | 2 | 0 | 1": 3, "2 | 0 | 2 | 0 | 2": 2,
    "0 | 0 | 1": 2, "0 | 0 | 2": 5, "0 | 0 | 0": 2,
    "1 | 0 | 0": 2, "1 | 0 | 2": 3,
    "2 | 0 | 0": 5, "2 | 0 | 1": 3, "2 | 0 | 2": 2,
}


def edge_table(edges: list[tuple[str, str]]) -> pa.Table:
    return pa.table({"src": [e[0] for e in edges], "dst": [e[1] for e in edges]})


def wcc_lines_table(k: int = 10, line_len: int = 10) -> pa.Table:
    """F3 — UnionFindsTest.java:55-165: k disjoint paths of line_len nodes."""
    src, dst = [], []
    for i in range(k):
        base = i * line_len
        for j in range(line_len - 1):
            src.append(base + j)
            dst.append(base + j + 1)
    return pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})


def triangle_ring_table(n: int = 1000) -> pa.Table:
    """F4 — TriangleCountTest ring: center 0, ring nodes 1..n;
    edges center–ri and ri–r(i+1 mod n)."""
    center = np.zeros(n, dtype=np.int64)
    ring = np.arange(1, n + 1, dtype=np.int64)
    nxt = np.roll(ring, -1)
    return pa.table({"src": np.concatenate([center, ring]),
                     "dst": np.concatenate([ring, nxt])})


F5_EDGES = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "h"), ("d", "e"), ("e", "f"),
            ("f", "d"), ("b", "d"), ("g", "h"), ("h", "i"), ("i", "g")]


def typed_edge_table(edges, labels, edge_type="TYPE1") -> pa.Table:
    return pa.table({
        "src": [e[0] for e in edges], "dst": [e[1] for e in edges],
        "src_label": [labels[e[0]] for e in edges],
        "edge_type": [edge_type] * len(edges),
        "dst_label": [labels[e[1]] for e in edges],
    })


def scale_free_edges(n_nodes: int = 10_000, mean_deg: int = 8, seed: int = 42,
                     hub_fraction: float = 0.25) -> pa.Table:
    """F8 — deterministic scale-free generator (Zipf-ish out-degrees,
    one deliberate hub with degree ~ n*hub_fraction) for skew/bench
    tests. Seed-pinned; no external data."""
    rng = np.random.default_rng(seed)
    # discrete power-law out-degree via inverse transform (vectorized —
    # rng.zipf's rejection sampling is far too slow at 1e8-edge scale):
    # tail exponent alpha=2.1 → D ∝ u^(-1/(alpha-1))
    u = rng.random(n_nodes)
    deg = (mean_deg / 5.5 * np.power(u, -1 / 1.1)).astype(np.int64)
    deg = np.clip(deg, 1, n_nodes // 10)
    hub = int(rng.integers(0, n_nodes))
    deg[hub] = max(deg[hub], int(n_nodes * hub_fraction))
    src = np.repeat(np.arange(n_nodes, dtype=np.int64), deg)
    # targets: half uniform, half power-law popularity (low-id bias)
    m = len(src)
    t_uni = rng.integers(0, n_nodes, size=m)
    t_bias = (n_nodes * np.power(rng.random(m), 3.0)).astype(np.int64)
    dst = np.where(rng.random(m) < 0.5, t_uni, t_bias).astype(np.int64)
    keep = src != dst
    return pa.table({"src": src[keep], "dst": dst[keep]})
