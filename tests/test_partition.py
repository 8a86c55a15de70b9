"""Balanced label-propagation partitioning (Ugander & Backstrom
WSDM'13): determinism, balance invariant, locality improvement."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from neo4j_graph_algorithms_ray.algorithms.partition import balanced_partition
from neo4j_graph_algorithms_ray.graph import build_graph


def _community_graph(name: str):
    # 4 dense 50-node communities + sparse cross links (seed-pinned)
    rng = np.random.RandomState(3)
    src, dst = [], []
    for c in range(4):
        base = c * 50
        for _ in range(600):
            a, b = rng.randint(0, 50, 2)
            if a != b:
                src.append(base + a)
                dst.append(base + b)
    for _ in range(60):
        a, b = rng.randint(0, 200, 2)
        if a != b:
            src.append(a)
            dst.append(b)
    tbl = pa.table({"src": np.array(src, dtype=np.int64),
                    "dst": np.array(dst, dtype=np.int64)})
    return build_graph(rd.from_arrow(tbl), name=name)


def test_balanced_partition_locality_and_balance():
    g = _community_graph("blp_fix")
    r = balanced_partition(g, num_parts=4, max_iterations=8)
    # balance invariant: no part ever exceeds ceil(n/P * (1+slack))
    assert max(r.stats["sizes_final"]) <= r.stats["balance_cap"]
    assert sum(r.stats["sizes_final"]) == g.num_vertices
    # locality must improve substantially over the random baseline
    # (~1/P) on a strongly clustered graph
    assert r.stats["locality_init"] < 0.35
    assert r.stats["locality_final"] > 0.8
    # partitions should largely align with the planted communities:
    # most vertices share a part with their community's majority
    parts = {x["node"]: x["part"] for x in r.dataset.take_all()}
    agree = 0
    for c in range(4):
        ids = [base for base in range(c * 50, c * 50 + 50)]
        vals = [parts[i] for i in ids]
        maj = max(set(vals), key=vals.count)
        agree += sum(v == maj for v in vals)
    assert agree >= 160  # >= 80% majority agreement


def test_balanced_partition_deterministic():
    g = _community_graph("blp_fix2")
    a = sorted((x["node"], x["part"]) for x in balanced_partition(
        g, num_parts=4, max_iterations=3).dataset.take_all())
    b = sorted((x["node"], x["part"]) for x in balanced_partition(
        g, num_parts=4, max_iterations=3).dataset.take_all())
    assert a == b
