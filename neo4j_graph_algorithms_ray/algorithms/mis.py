"""Maximal independent set — Luby's classic parallel algorithm (Luby
1986), the symmetry-breaking primitive behind distributed coloring /
scheduling, run here over the undirected host graph (pick a maximal set
of mutually non-linking hosts — e.g. independent crawl seeds).

Round r (on the active subgraph): every active vertex draws the
deterministic priority md5(node ∥ '#' ∥ r) (the repo-standard 60-bit
md5 so a DuckDB oracle reproduces it); a vertex joins the MIS iff its
priority is strictly below every active neighbor's (ties block both —
deterministic on both sides; md5 ties are ~2^-60) or it has no active
neighbor; winners' neighbors leave. Expected O(log n) rounds.

Scale shape: per round two hash joins (edges ⋈ active priorities on
each endpoint) + one groupby-min over surviving edges + an
anti-membership filter — every step bounded by the ACTIVE subgraph,
which shrinks geometrically. State (node, status) is vertex-sized and
re-materialized per round (O(V) rows, never corpus-sized). A
resident-CSR variant on the BSP engine would avoid the per-round edge
joins; this Dataset composition is the portable form.

Not in the reference library; the nearest primitive is its MSColoring
seed selection."""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from neo4j_graph_algorithms_ray.graph import GraphTables


def _priorities(nodes: rd.Dataset, r: int) -> rd.Dataset:
    """(node) → (node, p) with p = 60-bit md5(node ∥ '#r') as int64."""
    from neo4j_graph_algorithms_ray.functions.dedup import _md5_u64

    def add_p(b: pa.Table) -> pa.Table:
        s = np.asarray(
            pc.binary_join_element_wise(
                b["node"].cast(pa.string()), f"#{r}", "").to_pylist(),
            dtype=object)
        if len(s) == 0:
            return pa.table({"node": b["node"],
                             "p": pa.array([], pa.int64())})
        vals, inv = _md5_u64(s, 15)
        return pa.table({"node": b["node"],
                         "p": pa.array(vals[inv].astype(np.int64))})

    return nodes.map_batches(add_p, batch_format="pyarrow")


def mis_luby(g: GraphTables, *, rounds: int = 12,
             node_col: str = "node",
             num_partitions: Optional[int] = None) -> rd.Dataset:
    """Run ``rounds`` Luby rounds → (``node_col``, status) for every
    vertex, status ∈ {'in_mis', 'removed', 'active'} ('active' only if
    the round budget ran out before convergence — deterministic either
    way, and the oracle unrolls the identical rounds)."""
    from neo4j_graph_algorithms_ray.algorithms.common import \
        translate_vid_columns
    from neo4j_graph_algorithms_ray.util import (join_partitions,
                                                 predistinct, safe_join)

    nparts = join_partitions(num_partitions or max(8, g.num_partitions))

    # symmetrized neighbor pairs in ORIGINAL ids (priorities hash the
    # original node string so the SQL oracle can reproduce them)
    e = g.edges.select_columns(["src", "dst"])
    und = predistinct(
        e.union(e.rename_columns({"src": "dst", "dst": "src"})),
        ["src", "dst"]).filter(expr="src != dst")
    und = translate_vid_columns(g, und, ["src", "dst"]) \
        .rename_columns({"src": "a", "dst": "b"}).materialize()

    # driver-escape regime (same two-regime convention as the dedup /
    # aggregation stages): below the limit the whole graph fits one
    # heap and 8 rounds of numpy beat 8 rounds of shuffle-join setup
    # by ~10×; the algorithm and priorities are IDENTICAL (pinned by
    # the regime-parity pytest), so the result is too.
    import os
    limit = int(os.environ.get("NGA_MIS_DRIVER_LIMIT", 200_000))
    if g.num_vertices <= limit and g.num_edges <= 4 * limit:
        return _mis_local(g, und, rounds=rounds, node_col=node_col)

    act = g.vertices.select_columns(["node"]).materialize()
    mis_parts: list[rd.Dataset] = []
    rem_parts: list[rd.Dataset] = []

    for r in range(rounds):
        if act.count() == 0:
            break
        pr = _priorities(act, r).materialize()
        # edges with BOTH endpoints active, priorities attached
        ea = safe_join(und, pr.rename_columns({"node": "b", "p": "pb"}),
                       "inner", nparts, on=("b",))
        ea = safe_join(ea, pr.rename_columns({"node": "a", "p": "pa"}),
                       "inner", nparts, on=("a",)).materialize()
        if ea.count() == 0:
            # every remaining active vertex is isolated → all join
            mis_parts.append(act)
            act = act.limit(0).materialize()
            break
        nm = ea.groupby("a").min("pb").rename_columns({"min(pb)": "mp"})
        cand = safe_join(pr, nm.rename_columns({"a": "node"}),
                         "left_outer", nparts, on=("node",))

        def pick(b: pa.Table) -> pa.Table:
            p = b["p"].to_numpy(zero_copy_only=False)
            mp = b["mp"].to_numpy(zero_copy_only=False)
            win = np.isnan(mp.astype(np.float64)) | (p < np.nan_to_num(
                mp.astype(np.float64), nan=np.inf))
            return b.filter(pa.array(win)).select(["node"])

        win = cand.map_batches(pick, batch_format="pyarrow").materialize()
        if win.count() == 0:
            continue  # all-ties round (md5-improbable): deterministic no-op
        mis_parts.append(win)
        # active neighbors of winners leave (ea rows already active-active)
        rem = predistinct(
            safe_join(ea.select_columns(["a", "b"]),
                      win.rename_columns({"node": "a"}),
                      "inner", nparts, on=("a",)).select_columns(["b"]),
            ["b"]).rename_columns({"b": "node"}).materialize()
        if rem.count() > 0:
            rem_parts.append(rem)
            gone = win.union(rem)
        else:
            gone = win
        # act \ (win ∪ rem) via an anti-join shape (no driver
        # materialization — the gone set is vertex-sized)
        gone = gone.map_batches(
            lambda b: b.append_column(
                "__m", pa.array(np.ones(b.num_rows, np.int8))),
            batch_format="pyarrow")
        act = safe_join(act, gone, "left_outer", nparts, on=("node",)) \
            .map_batches(
                lambda b: b.filter(pc.is_null(b["__m"])).select(["node"]),
                batch_format="pyarrow").materialize()

    def tag(ds: rd.Dataset, status: str) -> rd.Dataset:
        return ds.map_batches(
            lambda b, s=status: pa.table(
                {node_col: b["node"],
                 "status": pa.array([s] * b.num_rows, pa.string())}),
            batch_format="pyarrow")

    parts = [tag(p, "in_mis") for p in mis_parts] \
        + [tag(p, "removed") for p in rem_parts] + [tag(act, "active")]
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def _mis_local(g: GraphTables, und: rd.Dataset, *, rounds: int,
               node_col: str) -> rd.Dataset:
    """Small-graph regime: one numpy Luby loop on the driver —
    byte-identical semantics to the distributed rounds (same md5
    priorities, same strict-less rule, same tie behavior)."""
    import hashlib

    import pandas as pd

    from neo4j_graph_algorithms_ray.util import collect_arrow

    tabs = [t for t in collect_arrow(und) if t.num_rows]
    nodes = np.asarray(g.vertices.select_columns(["node"]).to_pandas()
                       ["node"].astype(str).to_numpy(), dtype=object)
    order = np.argsort(nodes)
    nodes = nodes[order]
    idx = pd.Index(nodes)
    if tabs:
        et = pa.concat_tables(tabs)
        a = idx.get_indexer(pd.Index(
            np.asarray(et["a"].to_pylist(), dtype=object)))
        b = idx.get_indexer(pd.Index(
            np.asarray(et["b"].to_pylist(), dtype=object)))
    else:
        a = b = np.empty(0, np.int64)
    n = len(nodes)
    status = np.zeros(n, np.int8)  # 0 active, 1 mis, 2 removed
    md5 = hashlib.md5
    fb = int.from_bytes
    for r in range(rounds):
        active = status == 0
        if not active.any():
            break
        p = np.full(n, np.iinfo(np.int64).max, np.int64)
        av = np.flatnonzero(active)
        tag = f"#{r}".encode()
        p[av] = np.fromiter(
            (fb(md5(s.encode() + tag).digest()[:8], "big") >> 4
             for s in nodes[av]),
            dtype=np.int64, count=len(av))
        live = active[a] & active[b]
        mn = np.full(n, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mn, a[live], p[b[live]])
        win = active & (p < mn)       # isolated actives: mn=max → win
        if not win.any():
            continue
        status[win] = 1
        nb_of_win = win[a] & active[b]
        status[b[nb_of_win]] = np.where(
            status[b[nb_of_win]] == 1, 1, 2)
        # a winner is never adjacent to another winner (strict-less),
        # so the where() above only guards md5-tie corner cases
        status[win] = 1
    lab = np.array(["active", "in_mis", "removed"], dtype=object)
    return rd.from_arrow(pa.table({
        node_col: pa.array(nodes, pa.string()),
        "status": pa.array(lab[status], pa.string())}))
