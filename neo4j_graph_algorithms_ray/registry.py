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


def list_operators() -> list[dict]:
    """Enumerate the engine's operator surface — ``algo.list`` parity
    (algo/.../ListProc.java:42-46). One row per public algorithm /
    function / pipeline callable with its python signature, plus one row
    per driver query name (the procedure-level surface).
    """
    import importlib
    import inspect

    rows: list[dict] = []
    modules = {
        "algorithm": "neo4j_graph_algorithms_ray.algorithms",
        "function": "neo4j_graph_algorithms_ray.functions.scalars",
        "dedup": "neo4j_graph_algorithms_ray.functions.dedup",
        "ann": "neo4j_graph_algorithms_ray.functions.ann",
        "text": "neo4j_graph_algorithms_ray.functions.text",
        "multimodal": "neo4j_graph_algorithms_ray.functions.multimodal",
        "events": "neo4j_graph_algorithms_ray.functions.events",
    }
    for kind, modname in modules.items():
        mod = importlib.import_module(modname)
        for name, obj in sorted(vars(mod).items()):
            if name.startswith("_") or not callable(obj):
                continue
            if getattr(obj, "__module__", "").startswith("neo4j_graph_algorithms_ray"):
                try:
                    sig = str(inspect.signature(obj))
                except (TypeError, ValueError):
                    sig = "(...)"
                rows.append({"name": name, "kind": kind,
                             "signature": sig,
                             "module": getattr(obj, "__module__", modname)})
    try:
        entry = importlib.import_module("__ray_entry__")
        for qname in entry.queries():
            rows.append({"name": qname, "kind": "query",
                         "signature": "(sf_dir: str)",
                         "module": "__ray_entry__"})
    except ImportError:
        pass
    return rows
