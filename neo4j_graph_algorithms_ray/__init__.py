"""Ray-Data-native link-graph analytics engine.

A brand-new engine with the query/data-processing capabilities of the
reference library ``meta-exp/neo4j-graph-algorithms`` (a Neo4j 3.x
parallel graph-algorithm procedure library, surveyed in SURVEY.md),
re-expressed Ray-Data-first:

- input tables are ``ray.data.Dataset``s of Arrow blocks (pages table,
  edge tables, documents/embeddings tables);
- per-batch transforms are vectorized ``map_batches`` over zero-copy
  pyarrow/numpy batches; stateful stages are actor pools;
- wide steps are ``groupby``/``aggregate``/``sort``/``join`` shuffles;
- iterative kernels (PageRank, WCC, label propagation, MSBFS, SSSP,
  SCC coloring) run on hash/range-partitioned CSR shards held by a
  pool of shard actors (the one place the Dataset API genuinely cannot
  express the semantics: a mutable per-vertex state vector reused
  across tens of iterations), with per-iteration checkpoint/resume and
  per-partition lineage metrics.

Nothing in here is a port: no Graph interface hierarchy, no thread
pools, no paged arrays (see SURVEY.md §7.0).
"""

from neo4j_graph_algorithms_ray.graph import GraphTables, build_graph  # noqa: F401
from neo4j_graph_algorithms_ray.registry import GraphCatalog, list_operators  # noqa: F401

__version__ = "0.1.0"
