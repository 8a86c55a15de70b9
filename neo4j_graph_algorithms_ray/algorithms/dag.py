"""DAG layering — longest-path level per node of a directed acyclic
graph (here: the SCC condensation DAG, giving the topological "depth"
of every component — the schedule wave a reachability analysis or
incremental recompute would process it in).

level(n) = 0 if n has no predecessor, else 1 + max(level(pred)) —
i.e. the longest path length ending at n. Computed by synchronous
Bellman-style relaxation: each round joins the current levels onto the
edge list, takes a groupby-max per destination (map-side combine via
preagg_max) and merges; a round with no increase is the fixpoint.
Round count = DAG depth, so the loop shuffles |E| rows × depth — on a
condensation DAG both shrink with every SCC collapse. The SQL oracle
(oracles.condensation_levels_sql) is the exact recursive-CTE longest
path, so the relaxation must converge — it always does on a DAG.

Same two-regime convention as algorithms/mis.py: below
NGA_DAG_DRIVER_LIMIT edges one numpy loop runs the identical
relaxation on the driver (pinned by the regime-parity pytest).

Not in the reference library; the nearest consumer is its multistep
SCC (algo/.../impl/multistep/MultistepSCC.java), whose output this
layers."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def dag_levels(edges: rd.Dataset, *, src_col: str = "src",
               dst_col: str = "dst", out_col: str = "node",
               max_rounds: int = 10_000) -> rd.Dataset:
    """(src, dst) DAG edge list → (``out_col``, level) for every
    vertex appearing in the edge list. Caller guarantees acyclicity
    (a cycle would relax forever; the round cap raises instead of
    returning a wrong fixpoint)."""
    from neo4j_graph_algorithms_ray.util import (collect_arrow,
                                                 join_partitions,
                                                 predistinct, preagg_max,
                                                 safe_join)

    e = predistinct(edges.select_columns([src_col, dst_col]),
                    [src_col, dst_col]).materialize()
    limit = int(os.environ.get("NGA_DAG_DRIVER_LIMIT", 200_000))
    if e.count() <= limit:
        tabs = [t for t in collect_arrow(e) if t.num_rows]
        if not tabs:
            return rd.from_arrow(pa.table({
                out_col: pa.array([], pa.int64()),
                "level": pa.array([], pa.int64())}))
        et = pa.concat_tables(tabs)
        s = et[src_col].to_numpy(zero_copy_only=False)
        d = et[dst_col].to_numpy(zero_copy_only=False)
        nodes = pd.unique(np.concatenate([s, d]))
        idx = pd.Index(nodes)
        a, b = idx.get_indexer(pd.Index(s)), idx.get_indexer(pd.Index(d))
        lvl = np.zeros(len(nodes), np.int64)
        for _ in range(max_rounds):
            cand = lvl[a] + 1
            new = lvl.copy()
            np.maximum.at(new, b, cand)
            if (new == lvl).all():
                break
            lvl = new
        else:
            raise RuntimeError("dag_levels: no fixpoint — input has a cycle")
        return rd.from_arrow(pa.table({
            out_col: pa.array(nodes), "level": pa.array(lvl)}))

    nparts = join_partitions(8)
    lv = predistinct(
        e.select_columns([src_col]).rename_columns({src_col: out_col})
        .union(e.select_columns([dst_col]).rename_columns({dst_col: out_col})),
        [out_col]).map_batches(
        lambda b: b.append_column(
            "level", pa.array(np.zeros(b.num_rows, np.int64))),
        batch_format="pyarrow").materialize()
    for _ in range(max_rounds):
        cand = safe_join(
            e, lv.rename_columns({out_col: src_col, "level": "__sl"}),
            "inner", nparts, on=(src_col,))
        upd = preagg_max(
            cand.map_batches(
                lambda b: pa.table({
                    out_col: b[dst_col],
                    "__nl": pa.compute.add(b["__sl"], 1)}),
                batch_format="pyarrow"),
            [out_col], "__nl").materialize()
        merged = safe_join(lv, upd, "left_outer", nparts, on=(out_col,))

        def mx(b: pa.Table) -> pa.Table:
            cur = b["level"].to_numpy(zero_copy_only=False)
            nl = b["__nl"].to_numpy(zero_copy_only=False).astype(np.float64)
            out = np.maximum(cur, np.nan_to_num(nl, nan=-1)).astype(np.int64)
            return pa.table({out_col: b[out_col], "level": pa.array(out),
                             "__chg": pa.array((out > cur).astype(np.int64))})

        nxt = merged.map_batches(mx, batch_format="pyarrow").materialize()
        changed = nxt.sum("__chg")
        lv = nxt.select_columns([out_col, "level"]).materialize()
        if not changed:
            return lv
    raise RuntimeError("dag_levels: no fixpoint — input has a cycle")
