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


# Reference procedure surface → this engine's implementation, one row
# per @Procedure the fork exposes (enumerated from the reference source;
# ListProc.java:42-46 lists these via dbms.procedures()). ``.stream``
# variants map to the same impl: every algorithm here already returns a
# streaming Dataset. algo.list itself is excluded from its own output,
# like the reference's QUERY filter.
PROCEDURES: list[tuple[str, str]] = [
    ("algo.ComputeAllMetaPathsSchemaFullWeights", "algorithms.metapath.compute_all_metapaths_schema_full"),
    ("algo.GetSchema", "algorithms.metapath.get_schema"),
    ("algo.allShortestPaths.stream", "algorithms.sssp.all_shortest_paths_weighted"),
    ("algo.betweenness", "algorithms.betweenness.betweenness"),
    ("algo.betweenness.sampled", "algorithms.betweenness.betweenness_bsp"),
    ("algo.betweenness.sampled.stream", "algorithms.betweenness.betweenness_bsp"),
    ("algo.betweenness.stream", "algorithms.betweenness.betweenness"),
    ("algo.closeness", "algorithms.msbfs.closeness"),
    ("algo.closeness.stream", "algorithms.msbfs.closeness"),
    ("algo.computeAllMetaPaths", "algorithms.metapath.compute_all_metapaths"),
    ("algo.computeAllMetaPathsBetweenTypes", "algorithms.metapath.compute_all_metapaths"),
    ("algo.computeAllMetaPathsForInstances", "algorithms.metapath.compute_metapaths_for_instances"),
    ("algo.computeAllMetaPathsSchemaFull", "algorithms.metapath.compute_all_metapaths_schema_full"),
    ("algo.filterMetaPaths", "algorithms.metapath.filter_metapaths"),
    ("algo.getLabelIdToLabelNameMapping", "algorithms.metapath.label_id_mapping"),
    ("algo.gettingStarted", "algorithms.mst.getting_started"),
    ("algo.gettingStarted.stream", "algorithms.mst.getting_started"),
    ("algo.graph.info", "registry.GraphCatalog.info"),
    ("algo.graph.load", "registry.GraphCatalog.set"),
    ("algo.graph.remove", "registry.GraphCatalog.remove"),
    ("algo.graphReducer", "algorithms.metapath.graph_reducer"),
    ("algo.harmonic", "algorithms.msbfs.harmonic"),
    ("algo.harmonic.stream", "algorithms.msbfs.harmonic"),
    ("algo.louvain", "algorithms.louvain.louvain"),
    ("algo.louvain.stream", "algorithms.louvain.louvain"),
    ("algo.metaPath", "algorithms.mst.getting_started"),
    ("algo.metaPath.stream", "algorithms.mst.getting_started"),
    ("algo.metaPathPrecomputeHighDegreeNodes", "algorithms.metapath.metapath_precompute_high_degree_nodes"),
    ("algo.mst", "algorithms.mst.mst_prim"),
    ("algo.pageRank", "algorithms.pagerank.pagerank"),
    ("algo.pageRank.stream", "algorithms.pagerank.pagerank"),
    ("algo.readPrecomputedMetaPaths", "algorithms.metapath.read_precomputed_metapaths"),
    ("algo.scc", "algorithms.scc.scc"),
    ("algo.scc.forwardBackward.stream", "algorithms.scc.scc"),
    ("algo.scc.iterative", "algorithms.scc.scc"),
    ("algo.scc.iterative.stream", "algorithms.scc.scc"),
    ("algo.scc.multistep", "algorithms.scc.scc"),
    ("algo.scc.multistep.stream", "algorithms.scc.scc"),
    ("algo.scc.recursive.tarjan", "algorithms.scc.scc"),
    ("algo.scc.recursive.tunedTarjan", "algorithms.scc.scc"),
    ("algo.scc.recursive.tunedTarjan.stream", "algorithms.scc.scc"),
    ("algo.scc.stream", "algorithms.scc.scc"),
    ("algo.shortestPath", "algorithms.sssp.shortest_path_dijkstra"),
    ("algo.shortestPath.deltaStepping", "algorithms.sssp.sssp_delta_stepping"),
    ("algo.shortestPath.deltaStepping.stream", "algorithms.sssp.sssp_delta_stepping"),
    ("algo.shortestPath.stream", "algorithms.sssp.shortest_path_dijkstra"),
    ("algo.shortestPaths", "algorithms.msbfs.msbfs_hop_counts"),
    ("algo.shortestPaths.stream", "algorithms.msbfs.msbfs_hop_counts"),
    ("algo.triangle.stream", "algorithms.triangles.triangle_stream"),
    ("algo.triangleCount", "algorithms.triangles.triangle_count"),
    ("algo.triangleCount.forkJoin", "algorithms.triangles.triangle_count"),
    ("algo.triangleCount.forkJoin.stream", "algorithms.triangles.triangle_count"),
    ("algo.triangleCount.stream", "algorithms.triangles.triangle_count"),
    ("algo.unionFind", "algorithms.wcc.wcc"),
    ("algo.unionFind.forkJoin", "algorithms.wcc.wcc"),
    ("algo.unionFind.forkJoin.stream", "algorithms.wcc.wcc"),
    ("algo.unionFind.forkJoinMerge", "algorithms.wcc.wcc"),
    ("algo.unionFind.forkJoinMerge.stream", "algorithms.wcc.wcc"),
    ("algo.unionFind.mscoloring", "algorithms.wcc.mscoloring"),
    ("algo.unionFind.mscoloring.stream", "algorithms.wcc.mscoloring"),
    ("algo.unionFind.queue", "algorithms.wcc.wcc"),
    ("algo.unionFind.queue.stream", "algorithms.wcc.wcc"),
    ("algo.unionFind.stream", "algorithms.wcc.wcc"),
]


def list_procedures(name_filter: str = ""):
    """``algo.list`` parity (ListProc.java:42-46): (name, impl) rows for
    every algo.* procedure, optional substring filter, ordered by name,
    the lister itself excluded."""
    import pyarrow as pa
    rows = [(n, i) for n, i in PROCEDURES
            if n != "algo.list" and (not name_filter or name_filter in n)]
    rows.sort()
    return pa.table({"name": pa.array([r[0] for r in rows]),
                     "impl": pa.array(["neo4j_graph_algorithms_ray." + r[1]
                                       for r in rows])})


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
