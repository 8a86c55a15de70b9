"""Louvain community detection — dataset-native local-move sweeps.

Reference parity (algo/.../impl/louvain/Louvain.java:96-155, SURVEY.md
§2.4): single-level Louvain (this fork has no graph-aggregation phase):
init each node in its own community; sweep nodes, moving each to the
neighbor community with the best modularity gain
``l_vc − deg_v·sTot_c/(2m)`` (Louvain.java ``kIIn/m2 −
sTot[c]·deg/mq2``); stop after ``max_iterations`` sweeps or when no
node moves. The reference sweeps sequentially (node order); the
deterministic distributed equivalent is **semi-synchronous parity
sweeps** — only vids of the sweep's parity may move, so no two
adjacent updates race — with ties broken (gain desc, community asc).

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
    IterativeResult, attach_node_ids, get_engine)
from neo4j_graph_algorithms_ray.graph import GraphTables
from neo4j_graph_algorithms_ray.util import safe_join, to_arrow_blocks


def louvain(
    g: GraphTables,
    *,
    max_iterations: int = 10,
    num_partitions: Optional[int] = None,
    node_col: str = "node",
) -> IterativeResult:
    import pyarrow as pa

    eng = get_engine(g, num_partitions)
    p = max(4, eng.P)
    w2m = float(g.num_edges)  # symmetric row count = 2m (unweighted)

    deg = eng.degrees_dataset().materialize()  # (vid, degree) out==in here
    edges = g.edges.select_columns(["src", "dst"]).materialize()

    labels = deg.map_batches(
        lambda b: pa.table({"vid": b["vid"], "comm": b["vid"]}),
        batch_format="pyarrow").materialize()

    it, changed_total, converged = 0, 0, False
    t0 = time.perf_counter()
    while it < max_iterations:
        parity = it % 2
        lab_dst = labels.rename_columns({"vid": "dvid", "comm": "dcomm"})
        nbr = safe_join(edges, lab_dst, "inner", p, on=("dst",), right_on=("dvid",))
        lvc = nbr.groupby(["src", "dcomm"]).count() \
                 .rename_columns({"count()": "lw"})
        # inject a zero-weight "stay" candidate for every node's own
        # community so the stay gain always has a correct sTot
        stay = labels.map_batches(
            lambda b: pa.table({"src": b["vid"], "dcomm": b["comm"],
                                "lw": pa.array([0] * b.num_rows, pa.int64())}),
            batch_format="pyarrow")
        lvc = to_arrow_blocks(lvc).union(stay) \
            .groupby(["src", "dcomm"]).max("lw").rename_columns({"max(lw)": "lw"})
        stot_ds = safe_join(labels, deg, "inner", p, on=("vid",), right_on=("vid",)) \
            .groupby("comm").sum("degree").rename_columns({"sum(degree)": "stot"})
        cand = safe_join(to_arrow_blocks(lvc), to_arrow_blocks(stot_ds),
                         "inner", p, on=("dcomm",), right_on=("comm",))
        cand = safe_join(cand, labels.rename_columns({"comm": "own"}),
                         "inner", p, on=("src",), right_on=("vid",))
        cand = safe_join(cand, deg.rename_columns({"degree": "kdeg"}),
                         "inner", p, on=("src",), right_on=("vid",))

        def pick(df: pd.DataFrame) -> pd.DataFrame:
            v = int(df["src"].iloc[0])
            own = int(df["own"].iloc[0])
            k = float(df["kdeg"].iloc[0])
            if v % 2 != parity:
                return pd.DataFrame({"vid": [v], "comm": [own], "moved": [0]})
            comms = df["dcomm"].to_numpy()
            # gain of membership in c; own community's sTot excludes v
            stot = df["stot"].to_numpy(dtype=np.float64) \
                - np.where(comms == own, k, 0.0)
            gain = df["lw"].to_numpy(dtype=np.float64) - k * stot / w2m
            own_row = np.nonzero(comms == own)[0][0]
            order = np.lexsort((comms, -gain))
            best = order[0]
            best_comm = int(comms[best])
            if best_comm != own and gain[best] > gain[own_row] + 1e-12:
                return pd.DataFrame({"vid": [v], "comm": [best_comm], "moved": [1]})
            return pd.DataFrame({"vid": [v], "comm": [own], "moved": [0]})

        picked = cand.groupby("src").map_groups(pick, batch_format="pandas")
        picked = to_arrow_blocks(picked).materialize()
        moved = int(picked.sum("moved") or 0)
        # nodes with no candidates (isolated) keep their label
        new_labels = picked.select_columns(["vid", "comm"])
        seen = new_labels.count()
        if seen < g.num_vertices:
            have = new_labels.rename_columns({"comm": "ncomm"})
            rest = safe_join(labels, have, "left_outer", p,
                             on=("vid",), right_on=("vid",))

            def keep(b: pa.Table) -> pa.Table:
                import pyarrow.compute as pc
                comm = pc.coalesce(b["ncomm"], b["comm"])
                return pa.table({"vid": b["vid"], "comm": comm})

            new_labels = rest.map_batches(keep, batch_format="pyarrow")
        labels = to_arrow_blocks(new_labels).materialize()
        it += 1
        changed_total += moved
        if moved == 0 and parity == 1:
            converged = True
            break
    elapsed = time.perf_counter() - t0

    modularity = _modularity(edges, labels, deg, w2m, p)
    ds = labels.rename_columns({"comm": "community"})
    from neo4j_graph_algorithms_ray.algorithms.common import translate_vid_columns
    ds = translate_vid_columns(g, ds, ["community"])
    ds = attach_node_ids(g, ds, out_col=node_col)
    return IterativeResult(dataset=ds, iterations=it, converged=converged,
                           metrics=[],
                           stats={"computeSec": elapsed, "modularity": modularity,
                                  "moves": changed_total})


def _modularity(edges: rd.Dataset, labels: rd.Dataset, deg: rd.Dataset,
                w2m: float, p: int) -> float:
    import pyarrow as pa

    ls = labels.rename_columns({"vid": "svid", "comm": "scomm"})
    ld = labels.rename_columns({"vid": "dvid", "comm": "dcomm"})
    j = safe_join(edges, ls, "inner", p, on=("src",), right_on=("svid",))
    j = safe_join(j, ld, "inner", p, on=("dst",), right_on=("dvid",))

    def intra(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        same = pc.equal(b["scomm"], b["dcomm"])
        return pa.table({"w": pa.array(
            [int(pc.sum(pc.cast(same, pa.int64())).as_py() or 0)], pa.int64())})

    w_in = j.map_batches(intra, batch_format="pyarrow").sum("w") or 0
    stot = safe_join(labels, deg, "inner", p, on=("vid",), right_on=("vid",)) \
        .groupby("comm").sum("degree").rename_columns({"sum(degree)": "stot"})
    stot_pdf = stot.to_pandas()
    q = w_in / w2m - float(((stot_pdf["stot"] / w2m) ** 2).sum())
    return float(q)
