"""algo.list parity (list_operators) and direction-selectable degrees
(the reference's Degrees.degree(node, direction),
core/.../api/Degrees.java:22)."""

import numpy as np
import pytest
import ray.data as rd

from neo4j_graph_algorithms_ray import build_graph, fixtures as fx, list_operators
from neo4j_graph_algorithms_ray.algorithms.common import get_engine


def test_list_operators_covers_driver_queries():
    import __ray_entry__ as entry
    names = {r["name"] for r in list_operators()}
    for q in entry.queries():
        assert q in names, q
    # core algorithms present with signatures
    rows = {r["name"]: r for r in list_operators()}
    for algo in ("pagerank", "wcc", "label_propagation", "triangle_count",
                 "louvain", "betweenness", "scc", "closeness", "harmonic",
                 "compute_all_metapaths", "exact_dedup", "minhash_lsh_pairs"):
        assert algo in rows, algo
        assert rows[algo]["signature"].startswith("("), algo


def test_degrees_directions():
    g = build_graph(rd.from_arrow(fx.edge_table(fx.F5_EDGES)), name="degdir")
    eng = get_engine(g, None)
    vmap = {i: g.vid_to_node_map()[i].as_py() for i in range(g.num_vertices)}

    out_deg = {}
    in_deg = {}
    for a, b in fx.F5_EDGES:
        out_deg[a] = out_deg.get(a, 0) + 1
        in_deg[b] = in_deg.get(b, 0) + 1

    got_out = {vmap[r["vid"]]: r["degree"]
               for r in eng.degrees_dataset("out").take_all()}
    got_in = {vmap[r["vid"]]: r["degree"]
              for r in eng.degrees_dataset("in").take_all()}
    got_both = {vmap[r["vid"]]: r["degree"]
                for r in eng.degrees_dataset("both").take_all()}
    for v in vmap.values():
        assert got_out[v] == out_deg.get(v, 0), ("out", v)
        assert got_in[v] == in_deg.get(v, 0), ("in", v)
        assert got_both[v] == out_deg.get(v, 0) + in_deg.get(v, 0), ("both", v)

    with pytest.raises(ValueError):
        eng.degrees_dataset("sideways")
