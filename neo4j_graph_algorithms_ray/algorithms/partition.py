"""Balanced label-propagation graph partitioning (Ugander & Backstrom,
WSDM'13 "Balanced label propagation for partitioning massive graphs") —
assign each vertex to one of ``num_parts`` partitions so that edge
locality (fraction of edges with both endpoints in one part) is
maximized under a balance constraint. This is the production
partitioning technique the north rule's "explicit partitioning / skew
handling" story builds on: a locality-improved assignment cuts the
per-iteration exchange volume of every BSP algorithm in this engine.

Semantics (deterministic):
- init: round-robin over the md5 ordering of vids — sort vids by
  ``md5(v)`` and deal parts ``0,1,…,P-1,0,…`` in that order. As
  locality-free as a hash-mod layout, but sizes start exactly
  ``n/P ± 1`` so the grower's balance-cap invariant holds from
  iteration 0 (a plain ``md5(v) mod P`` init can begin over-cap, and
  gain-positive moves alone may never drain it).
- each iteration every vertex tallies its neighbors' parts over the
  UNDIRECTED edge view and proposes moving to the part with the most
  neighbors (ties → lowest part id) when that strictly beats its
  current part's tally.
- balance: proposed moves are granted per ordered part pair: swaps
  ``min(#a→b, #b→a)`` are always size-neutral; additionally parts
  below the balance cap ``ceil(n/P · (1+slack))`` admit overflow moves
  up to the cap, allocated in ascending (from, to) order. Within a
  pair's quota, moves are granted by (gain desc, md5(v) asc) — fully
  deterministic. (The reference formulation solves a per-pair linear
  program; the swap+fill rule is its standard greedy specialization.)

Scale shape: the per-iteration tally is one ``map_batches`` pass over
the dense edge table (both directions emitted batch-locally) into a
map-side-combined ``preagg_sum`` keyed (v, part) — the exchange is
bounded by touched (v, part) pairs, not edges — followed by a
vectorized per-vertex argmax (``topk_per_group`` k=1). The label
vector itself is the broadcast state (``ray.put`` once per iteration,
zero-copy per worker), so the operator requires ``n ≤
NGA_BROADCAST_VERTEX_LIMIT`` — the same contract as every
broadcast-regime stage here — and raises loudly above it; the
move list that reaches the driver is ≤ n rows (same order as the
label vector it already holds). Beyond-reference operator; driver
check is rows-only (iterative, no SQL equivalent) — the pytest oracle
asserts determinism, balance, and locality improvement.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from neo4j_graph_algorithms_ray.algorithms.common import IterativeResult
from neo4j_graph_algorithms_ray.graph import GraphTables, broadcast_vertex_limit
from neo4j_graph_algorithms_ray.util import preagg_sum, to_arrow_blocks


def _md5_pri(vids: np.ndarray) -> np.ndarray:
    """Deterministic per-vertex priority (uint64 from the md5 of the
    decimal vid — the repo-wide pinned sampling hash)."""
    return pd.util.hash_array(vids.astype(str).astype(object)).view(np.uint64)


def balanced_partition(g: GraphTables, num_parts: int = 8, *,
                       max_iterations: int = 5, slack: float = 0.05,
                       node_col: str = "node") -> IterativeResult:
    """→ Dataset(node_col, part) plus stats
    ``{locality_init, locality_final, sizes_final, iterations}``."""
    n = g.num_vertices
    if n > broadcast_vertex_limit():
        raise ValueError(
            f"balanced_partition: n={n} exceeds the broadcast label "
            f"regime (NGA_BROADCAST_VERTEX_LIMIT); the >limit path "
            f"keeps labels as a Dataset and tallies via hash joins — "
            f"not implemented")
    P = int(num_parts)
    cap = int(np.ceil(n / P * (1.0 + slack)))
    edges = g.edges.select_columns(["src", "dst"]).materialize()

    # deterministic balanced init: round-robin over the md5 ordering —
    # locality of a random layout (≈1/P) but sizes exactly n/P ± 1, so
    # the grower's cap invariant holds from the start (a plain
    # hash-mod init can begin over-cap, and gain-positive moves alone
    # may never drain it)
    part = np.empty(n, np.int32)
    part[np.argsort(_md5_pri(np.arange(n, dtype=np.int64)),
                    kind="stable")] = np.arange(n, dtype=np.int32) % P

    def locality(part_arr: np.ndarray) -> float:
        if g.num_edges == 0:
            return 1.0
        ref = ray.put(part_arr)

        def count(b: pa.Table) -> pa.Table:
            p = ray.get(ref)
            s = b["src"].to_numpy(zero_copy_only=False)
            d = b["dst"].to_numpy(zero_copy_only=False)
            return pa.table({"internal": pa.array(
                [int((p[s] == p[d]).sum())]),
                "total": pa.array([len(s)])})

        t = edges.map_batches(count, batch_format="pyarrow") \
                 .sum(["internal", "total"])
        tot = t["sum(total)"]
        return float(t["sum(internal)"]) / tot if tot else 1.0

    loc_init = locality(part)
    iters_run = 0
    converged = False
    for _ in range(max_iterations):
        ref = ray.put(part)

        def tally(b: pa.Table) -> pa.Table:
            p = ray.get(ref)
            s = b["src"].to_numpy(zero_copy_only=False)
            d = b["dst"].to_numpy(zero_copy_only=False)
            # undirected view: each edge votes in both directions
            v = np.concatenate([s, d])
            np_ = np.concatenate([p[d], p[s]]).astype(np.int64)
            key = v * P + np_
            uk, cnt = np.unique(key, return_counts=True)
            return pa.table({"v": pa.array(uk // P),
                             "p": pa.array(uk % P),
                             "cnt": pa.array(cnt.astype(np.int64))})

        votes = preagg_sum(edges.map_batches(tally, batch_format="pyarrow"),
                           ["v", "p"], "cnt").materialize()

        # per-vertex argmax with min-part tie-break, plus the current
        # part's tally — both vectorized per batch, merged driver-side
        # (rows ≤ n, the same order as the broadcast label vector)
        def best_partial(b: pa.Table) -> pa.Table:
            p_cur = ray.get(ref)
            v = b["v"].to_numpy(zero_copy_only=False)
            p = b["p"].to_numpy(zero_copy_only=False)
            c = b["cnt"].to_numpy(zero_copy_only=False)
            score = c * (P + 1) + (P - p)      # max cnt, then min p
            order = np.lexsort((-score, v))    # by v, score desc
            v_s, p_s, c_s, = v[order], p[order], c[order]
            first = np.ones(len(v_s), dtype=bool)
            first[1:] = v_s[1:] != v_s[:-1]
            cur_mask = p == p_cur[v]
            cur = pa.table({"v": pa.array(v[cur_mask]),
                            "ccur": pa.array(c[cur_mask])})
            bst = pa.table({"v": pa.array(v_s[first]),
                            "pbest": pa.array(p_s[first]),
                            "cbest": pa.array(c_s[first])})
            bst = bst.join(cur, keys="v", join_type="left outer")
            return bst

        # votes is keyed-complete per (v,p) after preagg_sum, but one
        # vertex's rows can still span blocks — finish on the driver
        tabs = [t for t in ray.get(
            votes.map_batches(best_partial, batch_format="pyarrow")
                 .to_arrow_refs()) if t.num_rows]
        if not tabs:
            converged = True
            break
        allb = pa.concat_tables(tabs)
        v = allb["v"].to_numpy(zero_copy_only=False)
        pbest = allb["pbest"].to_numpy(zero_copy_only=False)
        cbest = allb["cbest"].to_numpy(zero_copy_only=False)
        ccur = np.nan_to_num(
            allb["ccur"].to_numpy(zero_copy_only=False).astype(np.float64)
        ).astype(np.int64)
        # merge split vertices: keep the global best row per v
        score = cbest * (P + 1) + (P - pbest)
        order = np.lexsort((-score, v))
        v, pbest, cbest, ccur = (a[order] for a in (v, pbest, cbest, ccur))
        first = np.ones(len(v), dtype=bool)
        first[1:] = v[1:] != v[:-1]
        # ccur of the winning row may be null if the current part had
        # no votes in that block — take the max ccur per v instead
        ccur_max = np.maximum.reduceat(ccur, np.nonzero(first)[0]) \
            if len(v) else ccur
        v, pbest, cbest = v[first], pbest[first], cbest[first]
        ccur = ccur_max

        frm = part[v].astype(np.int64)
        gain = cbest - ccur
        mv = (pbest != frm) & (gain > 0)
        if not mv.any():
            iters_run += 1
            converged = True
            break
        mvv, mvf, mvt, mvg = v[mv], frm[mv], pbest[mv], gain[mv]
        pri = _md5_pri(mvv)

        # per-pair quotas: swaps + fill-to-cap, deterministic order
        pair = mvf * P + mvt
        sizes = np.bincount(part, minlength=P).astype(np.int64)
        pair_n = np.bincount(pair, minlength=P * P).astype(np.int64)
        quota = np.zeros(P * P, np.int64)
        for a in range(P):
            for b2 in range(P):
                if a == b2:
                    continue
                quota[a * P + b2] = min(pair_n[a * P + b2],
                                        pair_n[b2 * P + a])
        # overflow fill: parts under cap admit extras in (from, to)
        # order. Swaps are size-neutral so room is measured against
        # current sizes; outflow-freed room is conservatively ignored.
        room = cap - sizes
        for a in range(P):
            for b2 in range(P):
                if a == b2:
                    continue
                extra = pair_n[a * P + b2] - quota[a * P + b2]
                if extra > 0 and room[b2] > 0:
                    add = min(extra, room[b2])
                    quota[a * P + b2] += add
                    room[b2] -= add

        # grant within each pair by (gain desc, pri asc)
        order = np.lexsort((pri, -mvg, pair))
        pair_s = pair[order]
        firstp = np.ones(len(pair_s), dtype=bool)
        firstp[1:] = pair_s[1:] != pair_s[:-1]
        grp = np.cumsum(firstp) - 1
        rank = np.arange(len(pair_s)) - np.nonzero(firstp)[0][grp]
        granted = rank < quota[pair_s]
        gv = mvv[order][granted]
        gt = mvt[order][granted]
        if len(gv) == 0:
            iters_run += 1
            converged = True
            break
        part = part.copy()
        part[gv] = gt.astype(np.int32)
        iters_run += 1

    loc_final = locality(part)
    out = pa.table({"vid": pa.array(np.arange(n, dtype=np.int64)),
                    "part": pa.array(part.astype(np.int64))})
    ds = rd.from_arrow(out)
    from neo4j_graph_algorithms_ray.algorithms.common import attach_node_ids
    ds = attach_node_ids(g, ds, out_col=node_col)
    return IterativeResult(
        dataset=to_arrow_blocks(ds), iterations=iters_run,
        converged=converged,
        stats={"locality_init": round(loc_init, 6),
               "locality_final": round(loc_final, 6),
               "sizes_final": np.bincount(part, minlength=P).tolist(),
               "balance_cap": cap})
