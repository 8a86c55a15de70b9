"""Crawl-ordering importance: OPIC and dangling-mass PageRank.

Two beyond-reference link-graph operators on the BSP engine
(state/shards.py), both with exact unrolled SQL mirrors:

- ``opic`` — Adaptive On-line Page Importance Computation (Abiteboul,
  Preda & Cobena, WWW 2003), the classic crawl-frontier prioritizer:
  every page holds *cash*; each synchronous round a page banks its
  cash into *history* and distributes it equally to its out-neighbors;
  dangling cash redistributes uniformly (the virtual-page trick).
  Importance estimate after t rounds = (history + cash) / (t + 1)
  (total cash is conserved at 1 per round, so the estimate is a
  probability vector).

- ``pagerank_dangling`` — normalized PageRank with uniform dangling-
  mass redistribution: pr'(v) = (1−d)/n + d·(Σ_{u→v} pr(u)/outdeg(u)
  + D/n) where D = Σ_{dangling u} pr(u). Unlike the reference's
  convention (`PageRank.java:54` drops dangling mass, so scores don't
  sum to 1), this is the probability-distribution PageRank used for
  crawl scheduling and spam-mass denominators. The uniform D/n term
  touches every vertex each round, so this variant runs dense
  power-iteration supersteps (no delta-frontier sparsity) — pick
  ``pagerank`` when reference parity or frontier sparsity matters.

Both need one scalar per round (the dangling sum D): a masked
shard-local reduce (`mul` by a cached dangling mask, then `state_sum`)
— no per-vertex driver traffic.
"""

from __future__ import annotations

import time
from typing import Optional

from neo4j_graph_algorithms_ray.algorithms.common import (
    IterativeResult, attach_node_ids, get_engine)
from neo4j_graph_algorithms_ray.graph import GraphTables


def _prep_dangling_mask(eng) -> None:
    eng.apply_state("outdeg", "degree")
    # dangling = (0 <= outdeg < 0.5) — ge_lt is the only interval op
    eng.apply_state("dangling", "ge_lt", "outdeg", 0.0, 0.5)


def _dangling_sum(eng) -> float:
    eng.apply_state("_dmass", "mul", "cash", "dangling")
    return eng.state_sum("_dmass")


def opic(
    g: GraphTables,
    max_iterations: int = 20,
    *,
    num_partitions: Optional[int] = None,
    keep_vid: bool = False,
    node_col: str = "node",
) -> IterativeResult:
    """Returns (node, score) with score = (history + cash)/(t+1) after
    ``max_iterations`` synchronous rounds from uniform cash 1/n."""
    eng = get_engine(g, num_partitions)
    n = g.num_vertices or 1
    eng.init_state("cash", "const", 1.0 / n)
    eng.init_state("hist", "const", 0.0)
    _prep_dangling_mask(eng)

    t0 = time.perf_counter()
    for _ in range(max_iterations):
        d = _dangling_sum(eng)
        eng.apply_state("hist", "add", "hist", "cash")
        eng.apply_state("cash_div", "div0", "cash", "outdeg")
        eng.step("sum_state", "set_sum_update",
                 scatter_kw={"name": "cash_div"},
                 update_kw={"name": "cash"})
        eng.apply_state("cash", "add", "cash", d / n)
    elapsed = time.perf_counter() - t0

    eng.apply_state("score", "add", "hist", "cash")
    eng.apply_state("score", "scale", "score", 1.0 / (max_iterations + 1))
    ds = eng.state_dataset(["score"])
    ds = attach_node_ids(g, ds, out_col=node_col, keep_vid=keep_vid)
    return IterativeResult(
        dataset=ds, iterations=max_iterations, converged=False, metrics=[],
        stats={"computeSec": elapsed, "nodes": g.num_vertices,
               "edges": g.num_edges},
    )


def pagerank_dangling(
    g: GraphTables,
    damping: float = 0.85,
    max_iterations: int = 20,
    *,
    num_partitions: Optional[int] = None,
    keep_vid: bool = False,
    node_col: str = "node",
) -> IterativeResult:
    """Returns (node, score); scores sum to 1 (probability PageRank)."""
    eng = get_engine(g, num_partitions)
    n = g.num_vertices or 1
    eng.init_state("cash", "const", 1.0 / n)  # "cash" = current pr
    _prep_dangling_mask(eng)

    t0 = time.perf_counter()
    for _ in range(max_iterations):
        d = _dangling_sum(eng)
        eng.apply_state("pr_div", "div0", "cash", "outdeg")
        eng.step("sum_state", "set_sum_update",
                 scatter_kw={"name": "pr_div"},
                 update_kw={"name": "inc"})
        # pr' = (1-d)/n + damping*(inc + D/n): the two uniform terms
        # fold into one scalar constant
        eng.apply_state("cash", "scale", "inc", damping)
        eng.apply_state("cash", "add", "cash",
                        (1.0 - damping) / n + damping * d / n)
    elapsed = time.perf_counter() - t0

    ds = eng.state_dataset(["cash"]).rename_columns({"cash": "score"})
    ds = attach_node_ids(g, ds, out_col=node_col, keep_vid=keep_vid)
    return IterativeResult(
        dataset=ds, iterations=max_iterations, converged=False, metrics=[],
        stats={"computeSec": elapsed, "nodes": g.num_vertices,
               "edges": g.num_edges},
    )


__all__ = ["opic", "pagerank_dangling"]
