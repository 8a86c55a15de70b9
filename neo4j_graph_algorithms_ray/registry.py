"""Named graph catalog — the analogue of ``algo.graph.load/info/remove``
(reference: core/.../core/loadgraph/LoadGraphFactory.java:31-60,
algo/.../LoadGraphProc.java:50-137).

Holds materialized GraphTables bundles and their shard engines so one
loaded graph serves many algorithm calls ("load once, run PageRank +
WCC + LPA + triangles on the same shards").
"""

from __future__ import annotations

from typing import Optional

from neo4j_graph_algorithms_ray.graph import GraphTables


class GraphCatalog:
    _graphs: dict[str, GraphTables] = {}
    _engines: dict[tuple, object] = {}

    @classmethod
    def set(cls, name: str, g: GraphTables) -> GraphTables:
        g.name = name
        cls._graphs[name] = g
        return g

    @classmethod
    def get(cls, name: str) -> Optional[GraphTables]:
        return cls._graphs.get(name)

    @classmethod
    def check(cls, name: str) -> bool:
        return name in cls._graphs

    @classmethod
    def info(cls, name: str) -> Optional[dict]:
        g = cls._graphs.get(name)
        if g is None:
            return None
        return {"name": name, "nodes": g.num_vertices, "relationships": g.num_edges,
                "weighted": g.weighted, "partitions": g.num_partitions,
                "graph_dir": g.graph_dir}

    @classmethod
    def engine(cls, g: GraphTables, num_partitions: int, *, weighted: bool = False,
               reverse: bool = False):
        """Cached ShardEngine per (graph, P, weighted, reverse)."""
        from neo4j_graph_algorithms_ray.state.shards import ShardEngine
        key = (id(g), num_partitions, weighted, reverse)
        eng = cls._engines.get(key)
        if eng is None:
            eng = ShardEngine(g, num_partitions, weighted=weighted, reverse=reverse)
            cls._engines[key] = eng
        return eng

    @classmethod
    def remove(cls, name: str) -> bool:
        g = cls._graphs.pop(name, None)
        gone = []
        for key, eng in list(cls._engines.items()):
            if g is not None and key[0] == id(g):
                eng.close()
                gone.append(key)
        for k in gone:
            cls._engines.pop(k, None)
        return g is not None

    @classmethod
    def clear(cls):
        for eng in cls._engines.values():
            eng.close()
        cls._engines.clear()
        cls._graphs.clear()
