"""Louvain community detection — dataset-native local-move sweeps.

Reference parity (algo/.../impl/louvain/Louvain.java:96-155, SURVEY.md
§2.4): single-level Louvain (this fork has no graph-aggregation phase):
init each node in its own community; sweep nodes, moving each to the
neighbor community with the best modularity gain
``l_vc − deg_v·sTot_c/(2m)`` (Louvain.java ``kIIn/m2 −
sTot[c]·deg/mq2``); stop after ``max_iterations`` sweeps or when no
node moves. The reference sweeps sequentially (node order); the
deterministic distributed analogue used here is **semi-synchronous
parity sweeps** — only vids of the sweep's parity may move per sweep,
with ties broken (gain desc, community asc). Parity is not a proper
graph coloring (two same-parity neighbors can still move
simultaneously on stale labels), so it *reduces*, not eliminates,
simultaneous adjacent moves; oscillation is bounded by
``max_iterations`` and the reported modularity is computed honestly
from the final assignment.

Per sweep: one hash join (labels onto edge dsts) + groupby(src,
community) for neighbor-community weights, a groupby(community) for
sTot, and a map_groups argmax — three shuffles, all map-side combined.

``g`` must be built ``undirected=True`` (symmetrized rows; 2m = row
count / weight sum).
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np
import pandas as pd
import ray.data as rd

from neo4j_graph_algorithms_ray.algorithms.common import (
    IterativeResult, attach_node_ids)
from neo4j_graph_algorithms_ray.graph import GraphTables
from neo4j_graph_algorithms_ray.util import safe_join, to_arrow_blocks


# Below this vertex count the label vector is broadcast as a numpy
# array (ray.put per sweep) and all per-sweep joins/aggregations become
# vectorized lookups — no shuffle. Same regime split as
# graph.BROADCAST_VERTEX_LIMIT.
LOUVAIN_BROADCAST_LIMIT = 50_000_000


def louvain(
    g: GraphTables,
    *,
    max_iterations: int = 10,
    num_partitions: Optional[int] = None,
    node_col: str = "node",
    weighted: Optional[bool] = None,
) -> IterativeResult:
    """``weighted=None`` follows the graph (WeightedLouvain dispatch
    parity: the reference picks algo/.../impl/louvain/WeightedLouvain.java
    when a weight property is configured, LouvainProc.java): edge weight
    replaces the unit edge count in l_vc, node degree becomes strength
    (Σ incident weight), and 2m is the total symmetric weight."""
    if weighted is None:
        weighted = g.weighted
    if g.num_vertices <= LOUVAIN_BROADCAST_LIMIT \
            and g.num_edges <= LOUVAIN_BROADCAST_LIMIT:
        return _louvain_broadcast(g, max_iterations=max_iterations,
                                  node_col=node_col, weighted=weighted)
    return _louvain_shuffle(g, max_iterations=max_iterations,
                            num_partitions=num_partitions, node_col=node_col,
                            weighted=weighted)


def _louvain_broadcast(g: GraphTables, *, max_iterations: int,
                       node_col: str, weighted: bool = False) -> IterativeResult:
    """Broadcast-label sweeps: per sweep one map_batches over the edge
    table computes (src, dcomm, lw) partials against the ray.put label
    vector; sTot / gains / argmax are vectorized on the driver."""
    import pyarrow as pa
    import ray

    from neo4j_graph_algorithms_ray.util import preagg_sum

    n = g.num_vertices
    cols = ["src", "dst"] + (["weight"] if weighted else [])
    edges = g.edges.select_columns(cols).materialize()
    deg_np = np.zeros(n, dtype=np.float64)  # strength when weighted
    w2m = 0.0
    for b in edges.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        s = b.column("src").to_numpy(zero_copy_only=False)
        wv = (b.column("weight").to_numpy(zero_copy_only=False) if weighted
              else np.ones(len(s)))
        np.add.at(deg_np, s, wv)
        w2m += float(wv.sum())
    labels_np = np.arange(n, dtype=np.int64)

    it, changed_total, converged = 0, 0, False
    quiet_streak = 0
    t0 = time.perf_counter()
    while it < max_iterations:
        parity = it % 2
        ref = ray.put(labels_np)

        def nbr_comm(b: pa.Table, _ref=ref) -> pa.Table:
            lab = ray.get(_ref)
            d = b.column("dst").to_numpy(zero_copy_only=False)
            lw = (b.column("weight").to_numpy(zero_copy_only=False)
                  .astype(np.float64) if weighted
                  else np.ones(b.num_rows, np.float64))
            return pa.table({"src": b["src"], "dcomm": pa.array(lab[d]),
                             "lw": pa.array(lw)})

        lvc = preagg_sum(edges.map_batches(nbr_comm, batch_format="pyarrow"),
                         ["src", "dcomm"], "lw")
        tl = pa.concat_tables(lvc.iter_batches(batch_format="pyarrow",
                                               batch_size=1 << 22))
        src = tl.column("src").to_numpy(zero_copy_only=False)
        dcomm = tl.column("dcomm").to_numpy(zero_copy_only=False)
        lw = tl.column("lw").to_numpy(zero_copy_only=False).astype(np.float64)
        # stay candidates for every vertex
        allv = np.arange(n, dtype=np.int64)
        src = np.concatenate([src, allv])
        dcomm = np.concatenate([dcomm, labels_np])
        lw = np.concatenate([lw, np.zeros(n)])
        own = labels_np[src]
        k = deg_np[src].astype(np.float64)
        stot_full = np.bincount(labels_np, weights=deg_np, minlength=n)
        stot = stot_full[dcomm] - np.where(dcomm == own, k, 0.0)
        gain = lw - k * stot / w2m
        order = np.lexsort((dcomm, -gain, src))
        first = np.unique(src[order], return_index=True)[1]
        b_src = src[order][first]
        b_comm = dcomm[order][first]
        b_gain = gain[order][first]
        own_rows = np.nonzero(dcomm == own)[0]
        oo = np.argsort(src[own_rows], kind="stable")
        # duplicate own rows possible (stay + real neighbor row merged in
        # lvc already; stay appended separately) — keep best own gain
        o_src = src[own_rows][oo]
        o_gain = gain[own_rows][oo]
        ofirst = np.unique(o_src, return_index=True)[1]
        o_gain = np.maximum.reduceat(o_gain, ofirst) if len(o_src) else o_gain
        o_own = labels_np[b_src]
        move = ((b_src % 2 == parity) & (b_comm != o_own)
                & (b_gain > o_gain + 1e-12))
        labels_np = labels_np.copy()
        labels_np[b_src[move]] = b_comm[move]
        moved = int(move.sum())
        it += 1
        changed_total += moved
        # converged = a FULL parity cycle (both parities) made no moves:
        # that state is a fixpoint for every future sweep, so stopping
        # here equals running out max_iterations — which is what the
        # fixed-sweep SQL-unroll oracle replays. (Breaking on a single
        # quiet parity-1 sweep, as before, could stop with parity-0
        # moves still pending.)
        quiet_streak = quiet_streak + 1 if moved == 0 else 0
        if quiet_streak >= 2:
            converged = True
            break
    elapsed = time.perf_counter() - t0

    # modularity from the final labels (distributed intra-edge count)
    ref = ray.put(labels_np)

    def intra(b: pa.Table, _ref=ref) -> pa.Table:
        lab = ray.get(_ref)
        s = b.column("src").to_numpy(zero_copy_only=False)
        d = b.column("dst").to_numpy(zero_copy_only=False)
        wv = (b.column("weight").to_numpy(zero_copy_only=False) if weighted
              else np.ones(len(s)))
        return pa.table({"w": pa.array([float(wv[lab[s] == lab[d]].sum())])})

    w_in = edges.map_batches(intra, batch_format="pyarrow").sum("w") or 0
    stot_full = np.bincount(labels_np, weights=deg_np, minlength=n)
    q = w_in / w2m - float(((stot_full / w2m) ** 2).sum())

    out = rd.from_arrow(pa.table({"vid": np.arange(n, dtype=np.int64),
                                  "community": labels_np}))
    from neo4j_graph_algorithms_ray.algorithms.common import translate_vid_columns
    out = translate_vid_columns(g, out, ["community"])
    out = attach_node_ids(g, out, out_col=node_col)
    return IterativeResult(dataset=out, iterations=it, converged=converged,
                           metrics=[],
                           stats={"computeSec": elapsed, "modularity": float(q),
                                  "moves": changed_total})


def _louvain_shuffle(
    g: GraphTables,
    *,
    max_iterations: int = 10,
    num_partitions: Optional[int] = None,
    node_col: str = "node",
    weighted: bool = False,
) -> IterativeResult:
    import pyarrow as pa

    p = num_partitions or 8
    cols = ["src", "dst"] + (["weight"] if weighted else [])
    edges = g.edges.select_columns(cols).materialize()
    # 2m = total symmetric weight (row count when unweighted)
    w2m = float(edges.sum("weight")) if weighted else float(g.num_edges)
    # degrees/strengths via groupby (no shard engine needed here); left
    # join keeps isolated vertices at degree 0
    if weighted:
        degc = edges.groupby("src").sum("weight") \
            .rename_columns({"src": "vid", "sum(weight)": "dcnt"})
    else:
        degc = edges.groupby("src").count() \
            .rename_columns({"src": "vid", "count()": "dcnt"})
    verts = g.vertices.select_columns(["vid"]).materialize()
    joined = safe_join(verts, to_arrow_blocks(degc), "left_outer", p,
                       on=("vid",), right_on=("vid",))

    def fill0(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({"vid": b["vid"],
                         "degree": pc.coalesce(b["dcnt"].cast(pa.float64()),
                                               pa.scalar(0.0, pa.float64()))})

    deg = joined.map_batches(fill0, batch_format="pyarrow").materialize()

    # labels carry the (static) degree so sTot and the pick need no
    # extra per-sweep joins: (vid, comm, degree)
    labels = deg.map_batches(
        lambda b: pa.table({"vid": b["vid"], "comm": b["vid"],
                            "degree": b["degree"]}),
        batch_format="pyarrow").materialize()

    it, changed_total, converged = 0, 0, False
    quiet_streak = 0
    t0 = time.perf_counter()
    while it < max_iterations:
        parity = it % 2
        lab_dst = labels.rename_columns(
            {"vid": "dvid", "comm": "dcomm", "degree": "ddeg"}) \
            .select_columns(["dvid", "dcomm"])
        nbr = safe_join(edges, lab_dst, "inner", p, on=("dst",), right_on=("dvid",))
        from neo4j_graph_algorithms_ray.util import preagg_sum

        def mk_lvc(b: pa.Table) -> pa.Table:
            lw = (b.column("weight").to_numpy(zero_copy_only=False)
                  .astype(np.float64) if weighted
                  else np.ones(b.num_rows, np.float64))
            return pa.table({"src": b["src"], "dcomm": b["dcomm"],
                             "lw": pa.array(lw)})

        lvc = preagg_sum(nbr.map_batches(mk_lvc, batch_format="pyarrow"),
                         ["src", "dcomm"], "lw")
        # inject a zero-weight "stay" candidate for every node's own
        # community so the stay gain always has a correct sTot
        stay = labels.map_batches(
            lambda b: pa.table({"src": b["vid"], "dcomm": b["comm"],
                                "lw": pa.array([0.0] * b.num_rows, pa.float64())}),
            batch_format="pyarrow")
        # stay rows have lw=0, real rows ≥1 → sum == max here (a pair
        # appears at most once in each branch)
        lvc = preagg_sum(to_arrow_blocks(lvc).union(stay),
                         ["src", "dcomm"], "lw")
        stot_ds = preagg_sum(labels.map_batches(
            lambda b: pa.table({"comm": b["comm"], "stot": b["degree"]}),
            batch_format="pyarrow"), ["comm"], "stot")
        cand = safe_join(to_arrow_blocks(lvc), to_arrow_blocks(stot_ds),
                         "inner", p, on=("dcomm",), right_on=("comm",))
        cand = safe_join(cand, labels.rename_columns(
            {"comm": "own", "degree": "kdeg"}),
                         "inner", p, on=("src",), right_on=("vid",))

        # bucketed vectorized argmax: shuffle by src-bucket (not src) so
        # each map_groups call handles ~n/B nodes with pure numpy — the
        # per-node-group form costs one Python call per node per sweep
        def add_bucket(b):
            s = b.column("src").to_numpy(zero_copy_only=False)
            return b.append_column("bucket", pa.array(s % 64, pa.int64()))

        def pick(df: pd.DataFrame) -> pd.DataFrame:
            src = df["src"].to_numpy(dtype=np.int64)
            comms = df["dcomm"].to_numpy(dtype=np.int64)
            own = df["own"].to_numpy(dtype=np.int64)
            k = df["kdeg"].to_numpy(dtype=np.float64)
            # gain of membership in c; own community's sTot excludes v
            stot = df["stot"].to_numpy(dtype=np.float64) \
                - np.where(comms == own, k, 0.0)
            gain = df["lw"].to_numpy(dtype=np.float64) - k * stot / w2m
            order = np.lexsort((comms, -gain, src))
            first = np.unique(src[order], return_index=True)[1]
            b_src = src[order][first]
            b_comm = comms[order][first]
            b_gain = gain[order][first]
            own_rows = np.nonzero(comms == own)[0]
            oo = np.argsort(src[own_rows], kind="stable")
            o_src = src[own_rows][oo]          # == b_src (every node has a stay row)
            o_own = own[own_rows][oo]
            o_gain = gain[own_rows][oo]
            assert np.array_equal(b_src, o_src)
            move = ((b_src % 2 == parity) & (b_comm != o_own)
                    & (b_gain > o_gain + 1e-12))
            k_by_src = k[own_rows][oo]
            return pd.DataFrame({"vid": b_src,
                                 "comm": np.where(move, b_comm, o_own),
                                 "degree": k_by_src.astype(np.float64),
                                 "moved": move.astype(np.int64)})

        cand = cand.materialize()
        if cand.count() <= 5_000_000:
            # driver pick: one numpy pass (the bucket shuffle costs
            # seconds of fixed overhead at this size)
            full = pd.concat([b for b in cand.iter_batches(
                batch_format="pandas", batch_size=1 << 20)], ignore_index=True)
            picked = rd.from_arrow(pa.Table.from_pandas(
                pick(full), preserve_index=False)
                .replace_schema_metadata(None)).materialize()
        else:
            picked = cand.map_batches(add_bucket, batch_format="pyarrow") \
                .groupby("bucket").map_groups(pick, batch_format="pandas")
            picked = to_arrow_blocks(picked).materialize()
        moved = int(picked.sum("moved") or 0)
        # the injected stay rows guarantee every vertex appears in picked
        labels = picked.select_columns(["vid", "comm", "degree"]).materialize()
        it += 1
        changed_total += moved
        # full-parity-cycle fixpoint test — see _louvain_broadcast
        quiet_streak = quiet_streak + 1 if moved == 0 else 0
        if quiet_streak >= 2:
            converged = True
            break
    elapsed = time.perf_counter() - t0

    modularity = _modularity(edges, labels, w2m, p, weighted=weighted)
    ds = labels.select_columns(["vid", "comm"]).rename_columns({"comm": "community"})
    from neo4j_graph_algorithms_ray.algorithms.common import translate_vid_columns
    ds = translate_vid_columns(g, ds, ["community"])
    ds = attach_node_ids(g, ds, out_col=node_col)
    return IterativeResult(dataset=ds, iterations=it, converged=converged,
                           metrics=[],
                           stats={"computeSec": elapsed, "modularity": modularity,
                                  "moves": changed_total})


def _modularity(edges: rd.Dataset, labels: rd.Dataset,
                w2m: float, p: int, *, weighted: bool = False) -> float:
    """labels: (vid, comm, degree)."""
    import pyarrow as pa

    ls = labels.select_columns(["vid", "comm"]) \
        .rename_columns({"vid": "svid", "comm": "scomm"})
    ld = labels.select_columns(["vid", "comm"]) \
        .rename_columns({"vid": "dvid", "comm": "dcomm"})
    j = safe_join(edges, ls, "inner", p, on=("src",), right_on=("svid",))
    j = safe_join(j, ld, "inner", p, on=("dst",), right_on=("dvid",))

    def intra(b: pa.Table) -> pa.Table:
        same = (b.column("scomm").to_numpy(zero_copy_only=False)
                == b.column("dcomm").to_numpy(zero_copy_only=False))
        wv = (b.column("weight").to_numpy(zero_copy_only=False) if weighted
              else np.ones(b.num_rows))
        return pa.table({"w": pa.array([float(wv[same].sum())])})

    w_in = j.map_batches(intra, batch_format="pyarrow").sum("w") or 0
    stot = labels.groupby("comm").sum("degree") \
        .rename_columns({"sum(degree)": "stot"})

    def sq(b: pa.Table) -> pa.Table:
        s = b.column("stot").to_numpy(zero_copy_only=False) / w2m
        return pa.table({"sq": pa.array([float((s * s).sum())])})

    # sum((stot/w2m)^2) as a distributed partial-sum aggregate — the
    # community-degree table can be O(nodes) in early sweeps, so it
    # never lands on the driver.
    sq_sum = stot.map_batches(sq, batch_format="pyarrow").sum("sq") or 0.0
    return float(w_in / w2m - sq_sum)
