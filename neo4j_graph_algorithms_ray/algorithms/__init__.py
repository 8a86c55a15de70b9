from neo4j_graph_algorithms_ray.algorithms.pagerank import pagerank  # noqa: F401
from neo4j_graph_algorithms_ray.algorithms.wcc import (  # noqa: F401
    mscoloring, wcc, wcc_component_sizes)
from neo4j_graph_algorithms_ray.algorithms.labelprop import label_propagation  # noqa: F401
from neo4j_graph_algorithms_ray.algorithms.triangles import triangle_count, triangle_stream  # noqa: F401
from neo4j_graph_algorithms_ray.algorithms.metapath import (  # noqa: F401
    compute_all_metapaths, compute_all_metapaths_schema_full,
    compute_metapaths_for_instances, filter_metapaths, get_schema,
    graph_reducer, label_id_mapping, metapath_precompute_high_degree_nodes,
    read_precomputed_metapaths, write_metapaths_tsv)
from neo4j_graph_algorithms_ray.algorithms.msbfs import (  # noqa: F401
    closeness, eccentricity, harmonic, msbfs_hop_counts)
from neo4j_graph_algorithms_ray.algorithms.sssp import (  # noqa: F401
    all_shortest_paths_weighted, shortest_path_dijkstra, sssp_delta_stepping)
from neo4j_graph_algorithms_ray.algorithms.bowtie import bowtie  # noqa: F401
from neo4j_graph_algorithms_ray.algorithms.scc import scc  # noqa: F401
from neo4j_graph_algorithms_ray.algorithms.louvain import louvain  # noqa: F401
from neo4j_graph_algorithms_ray.algorithms.betweenness import (  # noqa: F401
    betweenness, betweenness_bsp)
from neo4j_graph_algorithms_ray.algorithms.mst import (  # noqa: F401
    getting_started, msf_boruvka, mst_prim)
from neo4j_graph_algorithms_ray.algorithms.anf import anf  # noqa: F401
from neo4j_graph_algorithms_ray.algorithms.ktruss import k_truss  # noqa: F401
