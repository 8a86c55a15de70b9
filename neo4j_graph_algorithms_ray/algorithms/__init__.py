from neo4j_graph_algorithms_ray.algorithms.pagerank import pagerank  # noqa: F401
from neo4j_graph_algorithms_ray.algorithms.wcc import wcc  # noqa: F401
from neo4j_graph_algorithms_ray.algorithms.labelprop import label_propagation  # noqa: F401
from neo4j_graph_algorithms_ray.algorithms.triangles import triangle_count, triangle_stream  # noqa: F401
from neo4j_graph_algorithms_ray.algorithms.metapath import compute_all_metapaths, get_schema  # noqa: F401
