"""Maximal matching — parallel local-minimum edge matching (the edge
analogue of Luby's MIS; Israeli & Itai 1986), run here over the
undirected web page graph: pair up pages so no two chosen link-pairs
share a page (e.g. disjoint compare-pairs for human dedup review, or
conflict-free edge-local work scheduling).

Round r (on live edges = both endpoints unmatched): every edge
{a, b} (a < b by string order) draws the deterministic priority
md5(a ∥ '|' ∥ b ∥ '#r') (repo-standard 60-bit md5 → the DuckDB oracle
reproduces it bit-for-bit); an edge joins the matching iff its
priority is the strict unique minimum among live edges at BOTH
endpoints (md5 ties — p ≈ 2^-60 — block all tied edges, identically
on both sides). Matched endpoints leave; expected O(log n) rounds.

Scale shape: per round two hash joins (live edges against the active
set), one endpoint-incidence explode (2|E| rows), a groupby-min +
count-at-min per endpoint, and two stat joins back to the live edges
— every step bounded by the LIVE subgraph, which shrinks
geometrically. State is vertex/edge-sized, never corpus-sized. Same
two-regime convention as algorithms/mis.py: below
NGA_MATCH_DRIVER_LIMIT vertices one numpy loop on the driver runs the
byte-identical rounds (pinned by the regime-parity pytest).

Not in the reference library; nearest primitives are its MSColoring
seed selection and the MIS composition here."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from neo4j_graph_algorithms_ray.graph import GraphTables


def _edge_priorities(live: rd.Dataset, r: int) -> rd.Dataset:
    """(a, b) → (a, b, p) with p = 60-bit md5(a ∥ '|' ∥ b ∥ '#r')."""
    from neo4j_graph_algorithms_ray.functions.dedup import _md5_u64

    def add_p(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column("p", pa.array([], pa.int64()))
        s = np.asarray(
            pc.binary_join_element_wise(
                b["a"].cast(pa.string()), "|", b["b"].cast(pa.string()),
                f"#{r}", "").to_pylist(), dtype=object)
        vals, inv = _md5_u64(s, 15)
        return b.append_column("p", pa.array(vals[inv].astype(np.int64)))

    return live.map_batches(add_p, batch_format="pyarrow")


def maximal_matching(g: GraphTables, *, rounds: int = 12,
                     node_col: str = "node",
                     num_partitions: Optional[int] = None) -> rd.Dataset:
    """Run ``rounds`` matching rounds → (``node_col``_a, ``node_col``_b,
    matched_round) for every matched pair, a < b by string order.
    Unmatched vertices simply never appear — once no live edge remains
    the matching is maximal."""
    from neo4j_graph_algorithms_ray.algorithms.common import \
        translate_vid_columns
    from neo4j_graph_algorithms_ray.util import (join_partitions,
                                                 predistinct, safe_join)

    nparts = join_partitions(num_partitions or max(8, g.num_partitions))
    out_a, out_b = f"{node_col}_a", f"{node_col}_b"

    # canonical a<b undirected pairs in ORIGINAL ids (priorities hash
    # the original node strings so the SQL oracle can reproduce them)
    e = translate_vid_columns(
        g, g.edges.select_columns(["src", "dst"]), ["src", "dst"])

    def canon(b: pa.Table) -> pa.Table:
        sa = b["src"].cast(pa.string())
        sb = b["dst"].cast(pa.string())
        lo = pc.min_element_wise(sa, sb)
        hi = pc.max_element_wise(sa, sb)
        keep = pc.not_equal(lo, hi)
        return pa.table({"a": lo.filter(keep), "b": hi.filter(keep)})

    und = predistinct(
        e.map_batches(canon, batch_format="pyarrow"), ["a", "b"]) \
        .materialize()

    limit = int(os.environ.get("NGA_MATCH_DRIVER_LIMIT", 200_000))
    if g.num_vertices <= limit and g.num_edges <= 4 * limit:
        return _matching_local(und, rounds=rounds, out_a=out_a, out_b=out_b)

    act = g.vertices.select_columns(["node"]).map_batches(
        lambda b: pa.table({"node": b["node"].cast(pa.string())}),
        batch_format="pyarrow").materialize()
    won: list[rd.Dataset] = []

    for r in range(rounds):
        live = safe_join(und, act.rename_columns({"node": "a"}),
                         "inner", nparts, on=("a",))
        live = safe_join(live, act.rename_columns({"node": "b"}),
                         "inner", nparts, on=("b",))
        live = _edge_priorities(live, r).materialize()
        if live.count() == 0:
            break

        # per-endpoint stats over the live incidence: min priority and
        # whether that minimum is unique (cnt == 1)
        inc = live.map_batches(
            lambda t: pa.table({
                "node": pa.concat_arrays(
                    [t["a"].combine_chunks().cast(pa.string()),
                     t["b"].combine_chunks().cast(pa.string())]),
                "p": pa.concat_arrays([t["p"].combine_chunks(),
                                       t["p"].combine_chunks()])}),
            batch_format="pyarrow")
        mp = inc.groupby("node").min("p").rename_columns({"min(p)": "mp"})
        atmin = safe_join(inc, mp, "inner", nparts, on=("node",)) \
            .filter(expr="p == mp")
        cnt = atmin.groupby("node").count() \
            .rename_columns({"count()": "cnt"})
        ok = safe_join(mp, cnt, "inner", nparts, on=("node",)) \
            .filter(expr="cnt == 1").select_columns(["node", "mp"]) \
            .materialize()

        win = safe_join(live, ok.rename_columns({"node": "a", "mp": "ma"}),
                        "inner", nparts, on=("a",))
        win = safe_join(win, ok.rename_columns({"node": "b", "mp": "mb"}),
                        "inner", nparts, on=("b",)) \
            .filter(expr="p == ma and p == mb") \
            .select_columns(["a", "b"]).materialize()
        if win.count() == 0:
            continue  # all-ties round (md5-improbable): deterministic no-op
        won.append(win.map_batches(
            lambda t, rr=r: t.append_column(
                "matched_round",
                pa.array(np.full(t.num_rows, rr, np.int64))),
            batch_format="pyarrow").materialize())

        gone = predistinct(
            win.select_columns(["a"]).rename_columns({"a": "node"}).union(
                win.select_columns(["b"]).rename_columns({"b": "node"})),
            ["node"]).map_batches(
            lambda b: b.append_column(
                "__m", pa.array(np.ones(b.num_rows, np.int8))),
            batch_format="pyarrow")
        act = safe_join(act, gone, "left_outer", nparts, on=("node",)) \
            .map_batches(
                lambda b: b.filter(pc.is_null(b["__m"])).select(["node"]),
                batch_format="pyarrow").materialize()

    if not won:
        return rd.from_arrow(pa.table({
            out_a: pa.array([], pa.string()),
            out_b: pa.array([], pa.string()),
            "matched_round": pa.array([], pa.int64())}))
    out = won[0]
    for p in won[1:]:
        out = out.union(p)
    return out.rename_columns({"a": out_a, "b": out_b})


def _matching_local(und: rd.Dataset, *, rounds: int,
                    out_a: str, out_b: str) -> rd.Dataset:
    """Small-graph regime: one numpy loop on the driver —
    byte-identical semantics to the distributed rounds (same md5 edge
    priorities, same unique-strict-min rule, same tie behavior)."""
    import hashlib

    from neo4j_graph_algorithms_ray.util import collect_arrow

    tabs = [t for t in collect_arrow(und) if t.num_rows]
    if not tabs:
        return rd.from_arrow(pa.table({
            out_a: pa.array([], pa.string()),
            out_b: pa.array([], pa.string()),
            "matched_round": pa.array([], pa.int64())}))
    et = pa.concat_tables(tabs)
    ea = np.asarray(et["a"].to_pylist(), dtype=object)
    eb = np.asarray(et["b"].to_pylist(), dtype=object)
    nodes = pd.unique(np.concatenate([ea, eb]))
    idx = pd.Index(nodes)
    a = idx.get_indexer(pd.Index(ea))
    b = idx.get_indexer(pd.Index(eb))
    n = len(nodes)
    m = len(ea)
    matched = np.zeros(n, bool)
    pair_str = np.fromiter(
        (f"{x}|{y}" for x, y in zip(ea, eb)), dtype=object, count=m)
    md5 = hashlib.md5
    fb = int.from_bytes
    res_a, res_b, res_r = [], [], []
    imax = np.iinfo(np.int64).max
    for r in range(rounds):
        live = ~(matched[a] | matched[b])
        if not live.any():
            break
        p = np.full(m, imax, np.int64)
        lv = np.flatnonzero(live)
        tag = f"#{r}".encode()
        p[lv] = np.fromiter(
            (fb(md5(s.encode() + tag).digest()[:8], "big") >> 4
             for s in pair_str[lv]), dtype=np.int64, count=len(lv))
        mn = np.full(n, imax, np.int64)
        np.minimum.at(mn, a[lv], p[lv])
        np.minimum.at(mn, b[lv], p[lv])
        at_min_a = live & (p == mn[a])
        at_min_b = live & (p == mn[b])
        # count of live edges achieving the endpoint minimum, per node
        cnt = np.zeros(n, np.int64)
        np.add.at(cnt, a[at_min_a], 1)
        np.add.at(cnt, b[at_min_b], 1)
        win = at_min_a & at_min_b & (cnt[a] == 1) & (cnt[b] == 1)
        if not win.any():
            continue
        wi = np.flatnonzero(win)
        res_a.extend(ea[wi])
        res_b.extend(eb[wi])
        res_r.extend([r] * len(wi))
        matched[a[wi]] = True
        matched[b[wi]] = True
    return rd.from_arrow(pa.table({
        out_a: pa.array(res_a, pa.string()),
        out_b: pa.array(res_b, pa.string()),
        "matched_round": pa.array(res_r, pa.int64())}))
