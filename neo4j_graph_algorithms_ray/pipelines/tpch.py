"""Graph derivations over the driver's TPC-H-ish tables (TESTDATA.md).

The correctness gate runs each ``queries()[name](sf_dir)`` against a
DuckDB oracle on the same parquet tables, so every derivation here has
an exactly-matching SQL definition in ``pipelines/oracles.py``. Node id
spaces are made disjoint by fixed offsets (suppliers +1_000_000,
nations +2_000_000).

Graphs:
- G1 ``purchase``: directed bipartite customer → supplier, one edge per
  distinct (customer, supplier) purchase relation (lineitem ⋈ orders).
- G2 ``copart``: undirected part–part co-occurrence within an order.
- G3 ``typed``: customer/supplier/nation typed graph for the metapath
  suite (IN = lives-in nation, BUYS = purchase relation).
- G4 ``trade``: G1 plus supplier → customer edges within the same
  nation (adds cycles, used by SCC).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from neo4j_graph_algorithms_ray.graph import GraphTables, build_graph
from neo4j_graph_algorithms_ray.util import (broadcast_join, distinct_pairs,
                                             to_arrow_blocks)
from neo4j_graph_algorithms_ray.registry import GraphCatalog

SUPP_OFF = 1_000_000
NATION_OFF = 2_000_000


def _read(sf_dir: str, table: str, columns=None) -> rd.Dataset:
    from neo4j_graph_algorithms_ray.util import read_parquet_clean
    return read_parquet_clean(f"{sf_dir}/{table}.parquet", columns=columns)


_PURCHASE_CACHE: dict[str, rd.Dataset] = {}


def purchase_edge_ds(sf_dir: str) -> rd.Dataset:
    """Materialized-once per sf_dir: the purchase relation feeds G1,
    G3 (typed) and G4 (trade) — the reference's graph.load reuse
    pattern applies to the derivation too."""
    cached = _PURCHASE_CACHE.get(sf_dir)
    if cached is not None:
        return cached
    ds = _purchase_edge_ds(sf_dir).materialize()
    _PURCHASE_CACHE[sf_dir] = ds
    return ds


def _purchase_edge_ds(sf_dir: str) -> rd.Dataset:
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    # orders is the dimension side (one row per key): broadcast it and
    # probe inside map_batches — no shuffle; hash-join fallback above
    # BCAST_JOIN_LIMIT rows
    j = broadcast_join(li, orders, on="l_orderkey", right_on="o_orderkey")

    def mk(batch: pa.Table) -> pa.Table:
        return pa.table({
            "src": batch.column("o_custkey").cast(pa.int64()),
            "dst": pa.compute.add(batch.column("l_suppkey").cast(pa.int64()), SUPP_OFF),
        })

    e = j.map_batches(mk, batch_format="pyarrow")
    return distinct_pairs(e, "src", "dst")


def copart_edge_ds(sf_dir: str) -> rd.Dataset:
    """Part–part co-occurrence within an order, via self-join on the
    order key (broadcast regime below 5M rows — shuffle-free; the
    hash-shuffle fallback above it is still one exchange, and per-order
    python groups would be ~10x slower at 15k+ orders)."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    j = broadcast_join(li, li, on="l_orderkey",
                       left_suffix="_a", right_suffix="_b")

    def mk(batch: pa.Table) -> pa.Table:
        a = batch.column("l_partkey_a").to_numpy(zero_copy_only=False)
        b = batch.column("l_partkey_b").to_numpy(zero_copy_only=False)
        keep = a < b
        return pa.table({"src": a[keep].astype(np.int64),
                         "dst": b[keep].astype(np.int64)})

    e = j.map_batches(mk, batch_format="pyarrow")
    return distinct_pairs(e, "src", "dst")


def trade_edge_ds(sf_dir: str) -> rd.Dataset:
    g1 = purchase_edge_ds(sf_dir)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    j = broadcast_join(supp, cust, on="s_nationkey", right_on="c_nationkey")

    def mk(batch: pa.Table) -> pa.Table:
        return pa.table({
            "src": pa.compute.add(batch.column("s_suppkey").cast(pa.int64()), SUPP_OFF),
            "dst": batch.column("c_custkey").cast(pa.int64()),
        })

    back = distinct_pairs(j.map_batches(mk, batch_format="pyarrow"), "src", "dst")
    return g1.union(back)


_TYPED_CACHE: dict[str, rd.Dataset] = {}


def typed_edge_ds(sf_dir: str) -> rd.Dataset:
    """Materialized-once per sf_dir (several queries consume it)."""
    ds = _TYPED_CACHE.get(sf_dir)
    if ds is None:
        ds = _typed_edge_ds(sf_dir).materialize()
        _TYPED_CACHE[sf_dir] = ds
    return ds


def _typed_edge_ds(sf_dir: str) -> rd.Dataset:
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])

    def cust_in(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "src": batch.column("c_custkey").cast(pa.int64()),
            "dst": pa.compute.add(batch.column("c_nationkey").cast(pa.int64()), NATION_OFF),
            "src_label": pa.array(["Customer"] * n), "edge_type": pa.array(["IN"] * n),
            "dst_label": pa.array(["Nation"] * n)})

    def supp_in(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "src": pa.compute.add(batch.column("s_suppkey").cast(pa.int64()), SUPP_OFF),
            "dst": pa.compute.add(batch.column("s_nationkey").cast(pa.int64()), NATION_OFF),
            "src_label": pa.array(["Supplier"] * n), "edge_type": pa.array(["IN"] * n),
            "dst_label": pa.array(["Nation"] * n)})

    def buys(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "src": batch.column("src"), "dst": batch.column("dst"),
            "src_label": pa.array(["Customer"] * n), "edge_type": pa.array(["BUYS"] * n),
            "dst_label": pa.array(["Supplier"] * n)})

    return cust.map_batches(cust_in, batch_format="pyarrow") \
        .union(supp.map_batches(supp_in, batch_format="pyarrow")) \
        .union(purchase_edge_ds(sf_dir).map_batches(buys, batch_format="pyarrow"))


def trade_weighted_edge_ds(sf_dir: str) -> rd.Dataset:
    """Trade edges with deterministic arithmetic weights
    ``w = 1 + (src + dst) % 5`` (SQL-reproducible, strictly positive)."""
    def add_w(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        w = (1 + (s + d) % 5).astype(np.float64)
        return batch.append_column("weight", pa.array(w))

    return trade_edge_ds(sf_dir).map_batches(add_w, batch_format="pyarrow")


_BUILDERS = {
    "purchase": (purchase_edge_ds, False, None),
    "purchase_und": (purchase_edge_ds, True, None),
    "copart": (copart_edge_ds, True, None),
    "trade": (trade_edge_ds, False, None),
    "trade_w": (trade_weighted_edge_ds, False, "weight"),
}


def get_graph(sf_dir: str, which: str) -> GraphTables:
    """Build-once graph cache per (sf_dir, derivation) — the
    algo.graph.load usage pattern: many algorithm calls over one load."""
    name = f"tpch:{sf_dir}:{which}"
    g = GraphCatalog.get(name)
    if g is None:
        builder, undirected, wcol = _BUILDERS[which]
        g = build_graph(builder(sf_dir), undirected=undirected, weight_col=wcol,
                        name=name.replace("/", "_"))
        GraphCatalog.set(name, g)
    return g
