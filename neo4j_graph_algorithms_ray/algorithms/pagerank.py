"""PageRank — delta-push formulation over CSR shards.

Semantics match the reference (algo/.../impl/PageRank.java, surveyed in
SURVEY.md §2.4): the unnormalized Neo4j convention
``PR(v) = (1-d) + d * Σ_{u→v} PR(u)/outdeg(u)`` (doc/pagerank.adoc:15-17),
rank initialized to ``1-d``, dangling nodes simply stop pushing (no
dangling-mass redistribution, PageRank.java:455-469), fixed iteration
count supported for golden parity. Differences (documented, not bugs):
float64 deltas instead of the reference's ×100_000 int quantization
(PageRank.java:54), and an optional L∞ convergence tolerance (the north
rule's 1e-6 stopping rule) on top of fixed-k.

Each BSP superstep is the reference's CALC (push d·delta/outdeg to
out-neighbors) + transpose + SYNC (combine + update) cycle
(PageRank.java:432-519) as a scatter → shard-to-shard exchange →
update over range-partitioned CSR shards with map-side combine.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np
import pyarrow as pa

from neo4j_graph_algorithms_ray.algorithms.common import (
    IterativeResult, attach_node_ids, ensure_ckpt_dir, get_engine)
from neo4j_graph_algorithms_ray.graph import GraphTables
from neo4j_graph_algorithms_ray.state.checkpoint import read_manifest, write_manifest


def pagerank(
    g: GraphTables,
    damping: float = 0.85,
    max_iterations: int = 20,
    tolerance: Optional[float] = None,
    *,
    num_partitions: Optional[int] = None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 0,
    resume: bool = False,
    keep_vid: bool = False,
    node_col: str = "node",
    source_nodes: Optional[list] = None,
    weighted: bool = False,
) -> IterativeResult:
    """Run PageRank; returns (node, score) plus iteration stats.

    ``tolerance=None`` reproduces the reference's fixed-iteration mode
    (default 20 iterations, ProcedureConstants.java:27-65);
    ``tolerance=1e-6`` is the north-rule convergence mode.

    ``source_nodes`` switches to PERSONALIZED PageRank: teleport mass
    lands only on the given original node ids —
    ``PR_p(v) = (1−d)·1[v∈S] + d·Σ_{u→v} PR_p(u)/outdeg(u)`` (the
    unnormalized Neo4j convention restricted to a seed set). Same
    delta-push kernel; only the init vector changes (rank = delta =
    1−d on seeds, 0 elsewhere), so cost per superstep is identical
    and frontier sparsity makes early supersteps cheaper.

    ``weighted=True`` pushes mass proportional to edge weight
    (``d·delta[u]·w(u,v)/Σ_out w(u)``) — the weightProperty PageRank
    variant; the graph must have been built with a ``weight_col``.
    """
    eng = get_engine(g, num_partitions, weighted=weighted)
    config = {"damping": damping, "max_iterations": max_iterations,
              "tolerance": tolerance, "P": eng.P}

    start_iter = 0
    if resume:
        ckpt = ensure_ckpt_dir("pagerank", g, checkpoint_dir)
        man = read_manifest(ckpt)
        if man and man.get("algo") == "pagerank":
            start_iter = man["iteration"]
            eng.restore(ckpt, start_iter, ["rank", "delta"])
    if start_iter == 0:
        if source_nodes is None:
            eng.init_state("rank", "const", 1.0 - damping)
            eng.init_state("delta", "const", 1.0 - damping)
        else:
            import numpy as np
            vids = _seed_vids(g, source_nodes)
            eng.init_state("rank", "const", 0.0)
            eng.init_state("delta", "const", 0.0)
            seed_val = np.full(len(vids), 1.0 - damping)
            eng.set_rows("rank", vids, seed_val)
            eng.set_rows("delta", vids, seed_val)

    # float32 messages halve the bandwidth-bound gather/exchange traffic
    # (bench opt-in; default float64 keeps exact SQL-oracle parity)
    msg_dtype = os.environ.get("NGA_PR_MSG_DTYPE", "float64")
    metrics, it, converged = [], start_iter, False
    scatter_op = "pr_push_w" if weighted else "pr_push"
    scatter_kw = ({"damping": damping} if weighted else
                  {"damping": damping, "msg_dtype": msg_dtype})
    # pipelined iteration (NGA_PIPELINE_PR=0 disables): submit superstep
    # k+1 before collecting superstep k's stats — actor task order
    # guarantees scatter(k+1) runs after update(k) on each shard, so the
    # driver round-trip + resubmission latency leaves every superstep's
    # critical path. Convergence then lags one superstep; the one
    # speculative superstep is reversed exactly via a pre-update rank
    # snapshot (rollback_pr), so results are bit-identical to the
    # barriered loop's. Direct-exchange regime only; the checkpointing
    # loop stays barriered (manifests must see settled state).
    pipelined = (os.environ.get("NGA_PIPELINE_PR", "1") != "0"
                 and eng.P > 1 and not checkpoint_every)
    t0 = time.perf_counter()
    if pipelined:
        it, converged = _pagerank_pipelined(
            eng, scatter_op, scatter_kw, start_iter, max_iterations,
            tolerance)
    else:
        while it < max_iterations:
            stats = eng.step(scatter_op, "pr_update", scatter_kw=scatter_kw)
            it += 1
            max_delta = max(s["max_delta"] for s in stats)
            if checkpoint_every and (it % checkpoint_every == 0):
                ckpt = ensure_ckpt_dir("pagerank", g, checkpoint_dir)
                iter_metrics = eng.drain_metrics()
                for m in iter_metrics:
                    m["through_iteration"] = it
                metrics.append(iter_metrics)
                parts = eng.checkpoint(ckpt, it, ["rank", "delta"])
                write_manifest(ckpt, iteration=it, algo="pagerank",
                               config=config, partitions=parts,
                               metrics=iter_metrics,
                               extra={"max_delta": max_delta})
            if tolerance is not None and max_delta <= tolerance:
                converged = True
                break
    elapsed = time.perf_counter() - t0
    final_metrics = eng.drain_metrics()
    for m in final_metrics:
        m["through_iteration"] = it
    metrics.append(final_metrics)

    ds = eng.state_dataset(["rank"]).rename_columns({"rank": "score"})
    ds = attach_node_ids(g, ds, out_col=node_col, keep_vid=keep_vid)
    edges_scattered = sum(m.get("edges_scattered", 0) for im in metrics for m in im)
    return IterativeResult(
        dataset=ds, iterations=it - start_iter, converged=converged, metrics=metrics,
        stats={"computeSec": elapsed, "dampingFactor": damping, "nodes": g.num_vertices,
               "edges": g.num_edges, "edges_scattered": edges_scattered,
               "edges_scattered_per_sec": edges_scattered / elapsed if elapsed else 0.0},
    )


def _pagerank_pipelined(eng, scatter_op: str, scatter_kw: dict,
                        start_iter: int, max_iterations: int,
                        tolerance: Optional[float]) -> tuple[int, bool]:
    """Pipelined PageRank supersteps (see the call site's comment).

    With ``tolerance`` set the pipeline depth is 2: after submitting
    wave k the driver collects wave k-1's stats while k executes; on
    convergence at k-1 the already-queued wave k completes and is then
    reversed via the pre-update rank snapshot, so final ranks equal
    the barriered loop's bit for bit (the snapshot's extra copy per
    superstep is why ``keep_prev`` is only sent in this mode). With
    ``tolerance=None`` (fixed-iteration mode) no stats are needed
    mid-run and the submission queue is drained lazily at depth 4.
    Returns (iterations_applied_through, converged)."""
    import ray

    pending: list = []     # (iteration number, update refs)
    it, submitted, converged = start_iter, start_iter, False
    uk = {"keep_prev": True} if tolerance is not None else {}
    while submitted < max_iterations:
        upd = eng.step_async(scatter_op, "pr_update",
                             scatter_kw=scatter_kw, update_kw=uk)
        submitted += 1
        pending.append((submitted, upd))
        if tolerance is not None:
            if len(pending) >= 2:
                k, refs = pending.pop(0)
                stats = ray.get(refs)
                it = k
                if max(s["max_delta"] for s in stats) <= tolerance:
                    converged = True
                    _, spec = pending.pop(0)   # the one speculative wave
                    ray.get(spec)
                    eng.rollback_pr()
                    break
        elif len(pending) >= 4:
            k, refs = pending.pop(0)
            ray.get(refs)
            it = k
    if not converged:
        for k, refs in pending:
            stats = ray.get(refs)
            it = k
            if (tolerance is not None and not converged
                    and max(s["max_delta"] for s in stats) <= tolerance):
                converged = True   # converged exactly on the final wave
    return it, converged


def _seed_vids(g: GraphTables, source_nodes: list):
    """Original node ids → vids via a distributed is_in filter over the
    vertex table (the seed set is small; the vertex table never leaves
    the cluster).

    Duplicate seed semantics: duplicates in ``source_nodes`` are
    collapsed — each distinct seed gets exactly one unit of teleport
    mass (the reference's sourceNodes list is a node set,
    PageRankAlgorithm personalized variant). Validation compares
    against the distinct count so a duplicated-but-valid list doesn't
    misreport as a missing node."""
    import numpy as np

    from neo4j_graph_algorithms_ray.algorithms.common import node_to_vid_map

    distinct = list(dict.fromkeys(source_nodes))
    m = node_to_vid_map(g, distinct)
    if len(m) != len(distinct):
        raise ValueError(f"{len(distinct) - len(m)} source node(s) "
                         "not present in the graph")
    return np.array([m[s] for s in distinct], dtype=np.int64)


def articlerank(
    g: GraphTables,
    damping: float = 0.85,
    max_iterations: int = 20,
    *,
    num_partitions: Optional[int] = None,
    keep_vid: bool = False,
    node_col: str = "node",
) -> IterativeResult:
    """ArticleRank — the hub-dampened PageRank variant (Li et al. 2009;
    shipped by later Neo4j GDS releases, beyond this reference):

        AR(v) = (1−d) + d · Σ_{u→v} AR(u) / (outdeg(u) + avg_outdeg)

    The +avg_outdeg term shrinks the per-link endorsement of prolific
    linkers, so mass concentrates less on pages hub farms point at —
    a standard spam-resistant ranking tweak on web graphs.

    Engine shape: full-recompute synchronous iteration — one shard-local
    ``div0`` by the precomputed (deg + avg) vector, one ``sum_state``
    scatter (same exchange as eigenvector/HITS), two shard-local
    ``scale``/``add`` finalizes. Fixed-k iterations for oracle parity.
    """
    eng = get_engine(g, num_partitions)
    avg = g.num_edges / max(g.num_vertices, 1)
    eng.init_state("rank", "const", 1.0 - damping)
    eng.apply_state("deg_f", "degree")
    eng.apply_state("denom", "add", "deg_f", float(avg))

    t0 = time.perf_counter()
    for _ in range(max_iterations):
        eng.apply_state("push", "div0", "rank", "denom")
        eng.step("sum_state", "set_sum_update",
                 scatter_kw={"name": "push"},
                 update_kw={"name": "acc"})
        eng.apply_state("acc_d", "scale", "acc", damping)
        eng.apply_state("rank", "add", "acc_d", 1.0 - damping)
    elapsed = time.perf_counter() - t0
    metrics = [eng.drain_metrics()]

    ds = eng.state_dataset(["rank"]).rename_columns({"rank": "score"})
    ds = attach_node_ids(g, ds, out_col=node_col, keep_vid=keep_vid)
    edges_scattered = sum(m.get("edges_scattered", 0)
                          for im in metrics for m in im)
    return IterativeResult(
        dataset=ds, iterations=max_iterations, converged=False,
        metrics=metrics,
        stats={"computeSec": elapsed, "nodes": g.num_vertices,
               "edges": g.num_edges, "avg_outdeg": avg,
               "edgesScattered": edges_scattered},
    )


def katz(
    g: GraphTables,
    alpha: float = 0.05,
    beta: float = 1.0,
    max_iterations: int = 20,
    *,
    num_partitions: Optional[int] = None,
    keep_vid: bool = False,
    node_col: str = "node",
) -> IterativeResult:
    """Katz centrality (Katz 1953) — attenuated path counting:

        x_{t+1}(v) = β + α · Σ_{u→v} x_t(u),   x_0 = β

    i.e. Σ_k α^k ·(#paths of length k into v): unlike PageRank no
    out-degree normalization, so prolific linkers transmit full (but
    attenuated) endorsement — the classic influence measure on citation
    and link graphs. Converges for α < 1/λ_max; fixed-k iterations for
    oracle parity.

    Engine shape: one ``sum_state`` scatter + one shard-local
    scale-and-add per iteration — the cheapest possible BSP centrality
    (no divisor precompute, no normalization exchange)."""
    eng = get_engine(g, num_partitions)
    eng.init_state("x", "const", beta)

    t0 = time.perf_counter()
    for _ in range(max_iterations):
        eng.step("sum_state", "set_sum_update",
                 scatter_kw={"name": "x"},
                 update_kw={"name": "acc"})
        eng.apply_state("acc_a", "scale", "acc", alpha)
        eng.apply_state("x", "add", "acc_a", beta)
    elapsed = time.perf_counter() - t0
    metrics = [eng.drain_metrics()]

    ds = eng.state_dataset(["x"]).rename_columns({"x": "score"})
    ds = attach_node_ids(g, ds, out_col=node_col, keep_vid=keep_vid)
    return IterativeResult(
        dataset=ds, iterations=max_iterations, converged=False,
        metrics=metrics,
        stats={"computeSec": elapsed, "alpha": alpha, "beta": beta,
               "nodes": g.num_vertices, "edges": g.num_edges},
    )


def pagerank_warm(
    g: GraphTables,
    init_scores,
    damping: float = 0.85,
    max_iterations: int = 10,
    *,
    num_partitions: Optional[int] = None,
    keep_vid: bool = False,
    node_col: str = "node",
) -> IterativeResult:
    """PageRank warm-started from a prior score vector — the
    incremental-recrawl path: after an edge delta lands, re-converge
    from yesterday's ranks instead of from scratch (the fixpoint is a
    contraction, so k warm Jacobi sweeps from a near-fixpoint beat 20
    cold ones).

        r_{t+1}(v) = (1−d) + d · Σ_{u→v} r_t(u) / outdeg(u),
        r_0(v) = init_scores[v] if present else (1−d)

    ``init_scores``: Dataset/result with (node, score) keyed by
    ORIGINAL node id — typically ``pagerank(old_graph).dataset``. The
    vector streams from its map tasks straight into the owning shard
    actors (no driver materialization), tolerating both missing nodes
    (new pages since the last crawl → cold init) and extra nodes
    (pages that dropped out → inner-join discard).

    Fixed-k iterations for oracle parity (the SQL mirror unrolls the
    same warm chain); converged-flag semantics mirror articlerank.
    """
    eng = get_engine(g, num_partitions)
    eng.init_state("rank", "const", 1.0 - damping)
    joined = init_scores.join(g.vertices, "inner",
                              num_partitions=max(2, eng.P), on=("node",))
    eng.set_state_from_dataset("rank", joined, vid_col="vid",
                               val_col="score")
    eng.apply_state("deg_f", "degree")

    t0 = time.perf_counter()
    for _ in range(max_iterations):
        eng.apply_state("push", "div0", "rank", "deg_f")
        eng.step("sum_state", "set_sum_update",
                 scatter_kw={"name": "push"},
                 update_kw={"name": "acc"})
        eng.apply_state("acc_d", "scale", "acc", damping)
        eng.apply_state("rank", "add", "acc_d", 1.0 - damping)
    elapsed = time.perf_counter() - t0
    metrics = [eng.drain_metrics()]

    ds = eng.state_dataset(["rank"]).rename_columns({"rank": "score"})
    ds = attach_node_ids(g, ds, out_col=node_col, keep_vid=keep_vid)
    edges_scattered = sum(m.get("edges_scattered", 0)
                          for im in metrics for m in im)
    return IterativeResult(
        dataset=ds, iterations=max_iterations, converged=False,
        metrics=metrics,
        stats={"computeSec": elapsed, "dampingFactor": damping,
               "nodes": g.num_vertices, "edges": g.num_edges,
               "edgesScattered": edges_scattered},
    )


def pagerank_batch(
    g: GraphTables,
    seeds: list,
    damping: float = 0.85,
    max_iterations: int = 20,
    *,
    num_partitions: Optional[int] = None,
    node_col: str = "node",
    seed_col: str = "seed",
) -> IterativeResult:
    """S personalized PageRank vectors computed in ONE BSP pass —
    matrix messages amortize every superstep's exchange over the whole
    seed set (the MSBFS batching idea applied to rank mass): at 10^12
    edges, 16 topic seeds cost ~one exchange, not sixteen.

    Per seed column the recurrence is exactly ``pagerank(...,
    source_nodes=[seed])`` (delta-push, teleport (1−d) on the seed
    only), so each column value-hash-matches the single-seed oracle.
    Returns a long-form Dataset (node, seed, score)."""
    from neo4j_graph_algorithms_ray.algorithms.common import node_to_vid_map

    eng = get_engine(g, num_partitions)
    S = len(seeds)
    nm = node_to_vid_map(g, list(seeds))
    missing = [s for s in seeds if s not in nm]
    if missing:
        raise ValueError(f"seeds not in graph: {missing[:3]}")
    svids = np.array([nm[s] for s in seeds], dtype=np.int64)
    cols = np.arange(S, dtype=np.int64)
    eng.init_state_wave("rankM", S, 0.0)
    eng.init_state_wave("deltaM", S, 0.0)
    eng.set_cells("rankM", svids, cols, np.full(S, 1.0 - damping))
    eng.set_cells("deltaM", svids, cols, np.full(S, 1.0 - damping))

    t0 = time.perf_counter()
    for _ in range(max_iterations):
        eng.step("ppr_push_multi", "ppr_update_multi",
                 scatter_kw={"damping": damping})
    elapsed = time.perf_counter() - t0
    metrics = [eng.drain_metrics()]

    seed_arr = np.asarray(list(seeds), dtype=object)

    def label_seed(b: pa.Table) -> pa.Table:
        c = b["col"].to_numpy(zero_copy_only=False)
        return pa.table({"vid": b["vid"],
                         seed_col: pa.array(seed_arr[c]),
                         "score": b["value"]})

    ds = eng.state_wave_dataset("rankM").map_batches(
        label_seed, batch_format="pyarrow")
    ds = attach_node_ids(g, ds, out_col=node_col)
    edges_scattered = sum(m.get("edges_scattered", 0)
                          for im in metrics for m in im)
    return IterativeResult(
        dataset=ds, iterations=max_iterations, converged=False,
        metrics=metrics,
        stats={"computeSec": elapsed, "dampingFactor": damping,
               "seeds": S, "nodes": g.num_vertices, "edges": g.num_edges,
               "edgesScattered": edges_scattered},
    )
