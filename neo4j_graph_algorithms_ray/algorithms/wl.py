"""Weisfeiler-Leman color refinement (1-WL) over an undirected edge
Dataset — iterated neighborhood hashing, the classical graph
fingerprint (Weisfeiler & Leman 1968; Shervashidze et al. JMLR'11).
Per round every node's color becomes

    md5_60bit( "<own color>|<neighbor colors sorted, comma-joined>" )

starting from color_0 = degree. The color histogram after R rounds is
a structural signature (graph-kernel feature / symmetry detector); two
nodes sharing a color are 1-WL-indistinguishable at that depth.

Scale shape: each round is one hash join of the symmetric edge list
against the color vector plus one join for the node's own color, then
a COARSE HASH BUCKET of nodes per map_groups call (the
events.sessionize discipline — one bucket holds many nodes; a single
lexsort + Arrow ListArray/binary_join builds every node's sorted
neighbor string vectorized; one md5 per node via the shared
``_md5_u64``). No driver state; the color table is node-sized.

Repo-standard 60-bit md5 (== DuckDB ``('0x' || substr(md5(s),1,15))``),
so the SQL oracle replays every round bit-for-bit.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _num_buckets(n: Optional[int]) -> int:
    return n if n else 32


def wl_colors(edges: rd.Dataset, *, src_col: str = "src",
              dst_col: str = "dst", rounds: int = 2,
              num_buckets: Optional[int] = None) -> rd.Dataset:
    """(node, wl_color) after ``rounds`` refinement sweeps over the
    undirected simple graph spanned by ``edges``."""
    import pyarrow.compute as pc

    from neo4j_graph_algorithms_ray.functions.dedup import _md5_u64
    from neo4j_graph_algorithms_ray.util import (preagg_sum, predistinct,
                                                 safe_join, to_arrow_blocks)

    def to_und(b: pa.Table) -> pa.Table:
        lt = pc.less(b[src_col], b[dst_col])
        return pa.table({"a": pc.if_else(lt, b[src_col], b[dst_col]),
                         "b": pc.if_else(lt, b[dst_col], b[src_col])})

    und = predistinct(
        edges.filter(expr=f"{src_col} != {dst_col}")
        .map_batches(to_und, batch_format="pyarrow"), ["a", "b"])
    sym = und.map_batches(
        lambda t: pa.table({
            "a": pa.concat_arrays([t["a"].combine_chunks(),
                                   t["b"].combine_chunks()]),
            "b": pa.concat_arrays([t["b"].combine_chunks(),
                                   t["a"].combine_chunks()])}),
        batch_format="pyarrow").materialize()

    colors = to_arrow_blocks(preagg_sum(sym.map_batches(
        lambda t: pa.table({"node": t["a"],
                            "c": pa.array(np.ones(t.num_rows, np.int64))}),
        batch_format="pyarrow"), ["node"], "c")).materialize()   # degree

    nb = _num_buckets(num_buckets)
    for _ in range(rounds):
        j = safe_join(sym, colors.rename_columns({"node": "b",
                                                  "c": "__cb"}),
                      "inner", 16, on=("b",))
        j = safe_join(j.select_columns(["a", "__cb"]),
                      colors.rename_columns({"node": "a", "c": "__ca"}),
                      "inner", 16, on=("a",))

        def bucket(t: pa.Table) -> pa.Table:
            from neo4j_graph_algorithms_ray.functions.events import _bucket_of
            return t.append_column("__b", pa.array(_bucket_of(t["a"], nb)))

        def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
            a = df["a"].to_numpy()
            cb = df["__cb"].to_numpy(np.int64)
            ca = df["__ca"].to_numpy(np.int64)
            codes, uniq = pd.factorize(a)
            order = np.lexsort((cb, codes))
            cc, sb = codes[order], cb[order]
            ub = np.ones(len(cc), dtype=bool)
            if len(cc) > 1:
                ub[1:] = cc[1:] != cc[:-1]
            starts = np.flatnonzero(ub)
            offsets = np.append(starts, len(cc)).astype(np.int32)
            lst = pa.ListArray.from_arrays(
                pa.array(offsets),
                pa.array(sb.astype(str), type=pa.string()))
            import pyarrow.compute as _pc
            joined = _pc.binary_join(lst, ",").to_pandas().to_numpy()
            own = ca[order][starts].astype(str)
            full = np.char.add(np.char.add(own, "|"),
                               joined.astype(str)).astype(object)
            vals, inv = _md5_u64(full, 15)
            return pd.DataFrame({"node": a[order][starts],
                                 "c": vals[inv].astype(np.int64)})

        colors = to_arrow_blocks(
            j.map_batches(bucket, batch_format="pyarrow")
            .groupby("__b").map_groups(per_bucket, batch_format="pandas")) \
            .materialize()
    return colors.rename_columns({"c": "wl_color"})
