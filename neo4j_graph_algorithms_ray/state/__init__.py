from neo4j_graph_algorithms_ray.state.shards import ShardEngine  # noqa: F401
