"""Bow-tie decomposition on a hand-built graph covering all five
categories (the sf web graph is almost all CORE, so the driver oracle
alone would not exercise IN/OUT/TENDRIL/DISCONNECTED)."""

import pyarrow as pa
import ray.data as rd

from neo4j_graph_algorithms_ray import build_graph
from neo4j_graph_algorithms_ray.algorithms import bowtie

EDGES = [
    (10, 11), (11, 12), (12, 10),       # CORE cycle
    (0, 1), (1, 10),                    # IN chain
    (12, 20), (20, 21),                 # OUT chain
    (1, 30),                            # tendril off IN
    (31, 20),                           # tendril into OUT
    (1, 40), (40, 20),                  # tube (IN → OUT avoiding core)
    (50, 51),                           # disconnected pair
]

EXPECTED = {
    10: "CORE", 11: "CORE", 12: "CORE",
    0: "IN", 1: "IN",
    20: "OUT", 21: "OUT",
    30: "TENDRIL", 31: "TENDRIL", 40: "TENDRIL",
    50: "DISCONNECTED", 51: "DISCONNECTED",
}


def test_bowtie_all_categories():
    tbl = pa.table({"src": [e[0] for e in EDGES],
                    "dst": [e[1] for e in EDGES]})
    g = build_graph(rd.from_arrow(tbl), name="bowtie_fix")
    res = bowtie(g, num_partitions=4)
    got = {r["node"]: r["category"] for r in res.dataset.take_all()}
    assert got == EXPECTED
    assert res.converged


def test_bowtie_single_partition():
    tbl = pa.table({"src": [e[0] for e in EDGES],
                    "dst": [e[1] for e in EDGES]})
    g = build_graph(rd.from_arrow(tbl), name="bowtie_fix_p1")
    res = bowtie(g, num_partitions=1)
    got = {r["node"]: r["category"] for r in res.dataset.take_all()}
    assert got == EXPECTED
