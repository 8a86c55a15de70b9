"""Two-pass Misra-Gries heavy hitters + two-hop neighborhood size."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from neo4j_graph_algorithms_ray.functions.sketches import heavy_hitters


def _stream(counts: dict[str, int], block_size: int = 37) -> rd.Dataset:
    # interleave keys deterministically so every block mixes keys
    keys = []
    for rep in range(max(counts.values())):
        for k, n in sorted(counts.items()):
            if rep < n:
                keys.append(k)
    tab = pa.table({"host": pa.array(keys, pa.string())})
    return rd.from_arrow(tab).repartition(max(1, len(keys) // block_size))


def test_heavy_hitters_exact_topk_with_decrements():
    counts = {f"k{i:02d}": 5 + i for i in range(40)}
    counts["big0"], counts["big1"], counts["big2"] = 500, 400, 300
    ds = _stream(counts)
    # cap far below per-batch distinct (43) -> MG decrement path runs
    rows = heavy_hitters(ds, "host", k=3, cap=8).take_all()
    assert [(r["host"], r["n"]) for r in rows] == [
        ("big0", 500), ("big1", 400), ("big2", 300)]


def test_heavy_hitters_tie_break_and_small_keyspace():
    ds = rd.from_items([{"host": h} for h in
                        ["b", "a", "b", "a", "c", "c", "d"]])
    rows = heavy_hitters(ds, "host", k=3, cap=512).take_all()
    # counts a=2 b=2 c=2 d=1; ties break host-ascending
    assert [(r["host"], r["n"]) for r in rows] == [
        ("a", 2), ("b", 2), ("c", 2)]


def test_two_hop_size_chain_and_diamond():
    from neo4j_graph_algorithms_ray.algorithms.neighborhood import \
        two_hop_size
    from neo4j_graph_algorithms_ray.graph import build_graph
    # 0->1->2->3, 0->2  (2-hop from 0: {1,2,3}; from 1: {2,3}; from 2: {3})
    edges = rd.from_items([
        {"src": 0, "dst": 1}, {"src": 1, "dst": 2},
        {"src": 2, "dst": 3}, {"src": 0, "dst": 2}])
    g = build_graph(edges, name="twohop_t")
    rows = {r["node"]: r["n_reach2"]
            for r in two_hop_size(g).take_all()}
    assert rows == {0: 3, 1: 2, 2: 1}


def test_effective_diameter_path_graph():
    from neo4j_graph_algorithms_ray.algorithms.msbfs import \
        effective_diameter
    from neo4j_graph_algorithms_ray.graph import build_graph
    # directed path 0->1->2->3->4: pairs at d=1:4, d=2:3, d=3:2, d=4:1
    edges = rd.from_items([{"src": i, "dst": i + 1} for i in range(4)])
    g = build_graph(edges, name="effdiam_t")
    row = effective_diameter(g, percentile=0.9).take_all()[0]
    assert row["n_reachable_pairs"] == 10
    assert row["diameter"] == 4
    # cum: 4,7,9,10 -> 0.9*10=9 reached at d=3
    assert row["effective_diameter"] == 3
    assert abs(row["mean_distance"] - 2.0) < 1e-9


def test_embedding_dim_stats_reference():
    import numpy as np

    from neo4j_graph_algorithms_ray.functions.ann import embedding_dim_stats
    vecs = [[1.0, 2.0, 3.0], [3.0, 2.0, 1.0], [2.0, 2.0, 2.0]]
    ds = rd.from_items([{"embedding": v} for v in vecs])
    rows = {r["dim"]: r for r in embedding_dim_stats(ds).take_all()}
    m = np.array(vecs)
    for d in (1, 2, 3):
        assert abs(rows[d]["mean"] - m[:, d - 1].mean()) < 1e-6
        assert abs(rows[d]["std"] - m[:, d - 1].std()) < 1e-6
