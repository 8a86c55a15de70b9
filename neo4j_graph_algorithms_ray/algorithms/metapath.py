"""MetaPath suite — typed-path aggregation (the fork's addition).

Reference semantics (algo/.../impl/metapath/ComputeAllMetaPaths.java,
verified against tests/.../metaPathComputationTests/ComputeAllMetaPathsTest.java):
the graph is loaded **undirected** (test: .asUndirected(true)); a
metapath of "length" ℓ is a label/type-alternating token sequence
``L0 | T1 | L1 | ... | Lk`` with 1..ℓ node labels (k = 0..ℓ-1 edges);
its count is the number of *walks* realizing it — backtracking allowed
(the reference test's own comment: returning to the previous node is
counted). Single-label paths count nodes with that label.

Relational shape (SURVEY.md §2.5): the reference's BFS over states
keyed by (edgeType,label) holding node→instanceCount maps
(ComputeAllMetaPaths.java:141-174) is exactly an iterated
``paths ⋈ edges ON paths.end = edges.src`` hash join followed by
``groupby(path_tokens, end).sum(count)`` — one shuffle per expansion
level — with a final ``groupby(path_tokens).sum``.

Input: a typed edge Dataset with columns
(src, dst, src_label:string, edge_type:string, dst_label:string).
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from neo4j_graph_algorithms_ray.util import preagg_sum, safe_join


class _Expander:
    """frontier.end ⋈ e.src — the path⋈edge expansion join
    (ComputeAllMetaPaths.expand, :154-174). The edge table is
    loop-invariant across expansion levels, so its broadcast side is
    prepared ONCE here (key-sorted + ray.put) and every level probes it
    with vectorized searchsorted inside map_batches; past
    BCAST_JOIN_LIMIT rows every level falls back to the hash-shuffle
    join instead."""

    def __init__(self, e: rd.Dataset, num_partitions: int):
        from neo4j_graph_algorithms_ray.util import prepare_broadcast
        self.payload = e.select_columns(
            ["src", "edge_type", "dst_label", "dst"])
        self.side = prepare_broadcast(self.payload, "src")
        self.num_partitions = num_partitions

    def __call__(self, frontier: rd.Dataset) -> rd.Dataset:
        from neo4j_graph_algorithms_ray.util import probe_broadcast
        if self.side is not None:
            return probe_broadcast(frontier, self.side, on="end")
        return safe_join(frontier, self.payload, "inner",
                         self.num_partitions, on=("end",), right_on=("src",))

SEP = " | "


def _symmetrize(edges: rd.Dataset) -> rd.Dataset:
    rev = edges.select_columns(["dst", "src", "dst_label", "edge_type", "src_label"]) \
               .rename_columns({"dst": "src", "src": "dst",
                                "dst_label": "src_label", "src_label": "dst_label"}) \
               .select_columns(["src", "dst", "src_label", "edge_type", "dst_label"])
    return edges.select_columns(["src", "dst", "src_label", "edge_type", "dst_label"]).union(rev)


def _nodes_with_labels(edges: rd.Dataset) -> rd.Dataset:
    """(node, label) distinct over both endpoints — one map over the
    edge table emitting both ends pre-deduped per batch (a two-branch
    union of projections schedules as two pipelines and measured ~4x
    slower than this single pass)."""
    def both_ends(b: pa.Table) -> pa.Table:
        t = pa.table({
            "node": pa.concat_arrays([b["src"].combine_chunks(),
                                      b["dst"].combine_chunks()]),
            "label": pa.concat_arrays([
                b["src_label"].cast(pa.string()).combine_chunks(),
                b["dst_label"].cast(pa.string()).combine_chunks()]),
        })
        return t.group_by(["node", "label"]).aggregate([])

    from neo4j_graph_algorithms_ray.util import predistinct
    return predistinct(edges.map_batches(both_ends, batch_format="pyarrow"),
                       ["node", "label"])


def compute_all_metapaths(
    typed_edges: rd.Dataset,
    length: int = 3,
    *,
    undirected: bool = True,
    num_partitions: int = 8,
    start_labels: Optional[Sequence[str]] = None,
    end_labels: Optional[Sequence[str]] = None,
) -> rd.Dataset:
    """All metapaths of 1..``length`` node labels with walk counts →
    Dataset (path:string, count:int64).

    ``start_labels``/``end_labels`` give ComputeAllMetaPathsBetweenTypes
    parity (ComputeAllMetaPathsBetweenTypes.java:18-60): restrict to
    paths starting/ending at the given node types.
    """
    e = _symmetrize(typed_edges) if undirected else typed_edges.select_columns(
        ["src", "dst", "src_label", "edge_type", "dst_label"])
    # materialize unconditionally: even at length 2 the two consumers
    # (node-label distinct + first hop) would each re-execute the whole
    # symmetrize DAG — measured 2x slower lazy than the barrier here
    e = e.materialize()

    # single-label paths: one per node of that label. Each level is
    # materialized eagerly — leaving the whole multi-branch DAG lazy
    # makes the streaming executor schedule all unioned branches as one
    # deep pipeline (measured 3x slower than stage-at-a-time here).
    nodes = _nodes_with_labels(e)
    level0 = preagg_sum(nodes.map_batches(
        lambda b: pa.table({"path": b["label"],
                            "count": pa.array([1] * b.num_rows, pa.int64())}),
        batch_format="pyarrow"), ["path"], "count")

    def first_hop(batch: pa.Table) -> pa.Table:
        path = pc.binary_join_element_wise(
            batch["src_label"].cast(pa.string()),
            batch["edge_type"].cast(pa.string()),
            batch["dst_label"].cast(pa.string()), SEP)
        return pa.table({"path": path, "end": batch["dst"],
                         "count": pa.array([1] * batch.num_rows, pa.int64())})

    frontier = preagg_sum(e.map_batches(first_hop, batch_format="pyarrow"),
                          ["path", "end"], "count").materialize()

    levels = [frontier]
    expand = _Expander(e, num_partitions) if length > 2 else None
    for _ in range(length - 2):
        joined = expand(frontier)

        def extend(batch: pa.Table) -> pa.Table:
            path = pc.binary_join_element_wise(
                batch["path"], batch["edge_type"].cast(pa.string()),
                batch["dst_label"].cast(pa.string()), SEP)
            return pa.table({"path": path, "end": batch["dst"], "count": batch["count"]})

        frontier = preagg_sum(joined.map_batches(extend, batch_format="pyarrow"),
                              ["path", "end"], "count").materialize()
        levels.append(frontier)

    total = levels[0].select_columns(["path", "count"])
    for lv in levels[1:]:
        total = total.union(lv.select_columns(["path", "count"]))
    out = level0
    out = out.union(total)
    out = preagg_sum(out, ["path"], "count")
    if start_labels is not None or end_labels is not None:
        out = filter_metapaths(out, start_labels, end_labels)
    return out


def filter_metapaths(paths: rd.Dataset, start_labels: Optional[Sequence[str]] = None,
                     end_labels: Optional[Sequence[str]] = None) -> rd.Dataset:
    """algo.filterMetaPaths parity (impl/FilterMetaPaths.java:17-55):
    keep metapaths whose first/last label token matches."""
    starts = list(start_labels) if start_labels else None
    ends = list(end_labels) if end_labels else None

    def flt(batch: pa.Table) -> pa.Table:
        keep = pa.array([True] * batch.num_rows)
        if starts is not None:
            first = pc.list_element(pc.split_pattern(batch["path"], SEP), 0)
            keep = pc.and_(keep, pc.is_in(first, value_set=pa.array(starts)))
        if ends is not None:
            # last token = path with everything up to the final SEP
            # stripped (greedy ^.* eats through the last separator) —
            # one vectorized RE2 kernel, no per-row .as_py()
            last = pc.replace_substring_regex(
                batch["path"], r"^.* \| ", "", max_replacements=1)
            keep = pc.and_(keep, pc.is_in(last, value_set=pa.array(ends)))
        return batch.filter(keep)

    return paths.map_batches(flt, batch_format="pyarrow")


def compute_metapaths_for_instances(
    typed_edges: rd.Dataset,
    start_nodes: Sequence,
    end_nodes: Sequence,
    length: int = 3,
    *,
    undirected: bool = True,
    num_partitions: int = 8,
) -> rd.Dataset:
    """ComputeAllMetaPathsForInstances parity: metapaths (with walk
    counts) between two concrete node sets → (path, count)."""
    e = _symmetrize(typed_edges) if undirected else typed_edges
    e = e.materialize()
    start_set = pa.array(list(start_nodes))
    end_set = pa.array(list(end_nodes))

    def first_hop(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch["src"], value_set=start_set)
        batch = batch.filter(keep)
        path = pc.binary_join_element_wise(
            batch["src_label"].cast(pa.string()),
            batch["edge_type"].cast(pa.string()),
            batch["dst_label"].cast(pa.string()), SEP)
        return pa.table({"path": path, "end": batch["dst"],
                         "count": pa.array([1] * batch.num_rows, pa.int64())})

    frontier = preagg_sum(e.map_batches(first_hop, batch_format="pyarrow"),
                          ["path", "end"], "count")
    levels = [frontier]
    expand = _Expander(e, num_partitions) if length > 2 else None
    for _ in range(length - 2):
        joined = expand(frontier)

        def extend(batch: pa.Table) -> pa.Table:
            path = pc.binary_join_element_wise(
                batch["path"], batch["edge_type"].cast(pa.string()),
                batch["dst_label"].cast(pa.string()), SEP)
            return pa.table({"path": path, "end": batch["dst"], "count": batch["count"]})

        frontier = preagg_sum(joined.map_batches(extend, batch_format="pyarrow"),
                              ["path", "end"], "count")
        levels.append(frontier)

    out = None
    for lv in levels:
        part = lv.map_batches(
            lambda b: b.filter(pc.is_in(b["end"], value_set=end_set)),
            batch_format="pyarrow").select_columns(["path", "count"])
        out = part if out is None else out.union(part)
    return out.groupby("path").sum("count").rename_columns({"sum(count)": "count"})


def get_schema(typed_edges: rd.Dataset) -> rd.Dataset:
    """algo.GetSchema parity (getSchema/GetSchema.java:46-100): the
    label-level adjacency — distinct (src_label, edge_type, dst_label)
    triples. One groupby."""
    return typed_edges.select_columns(["src_label", "edge_type", "dst_label"]) \
        .groupby(["src_label", "edge_type", "dst_label"]).count() \
        .select_columns(["src_label", "edge_type", "dst_label"])


def graph_reducer(typed_edges: rd.Dataset, keep_labels: Sequence[str],
                  keep_types: Optional[Sequence[str]] = None) -> rd.Dataset:
    """algo.graphReducer parity (GraphReducer.java:30-100) as a pure
    filter (non-destructive): keep edges whose endpoint labels are all
    in the keep-list (and type in keep_types when given)."""
    labs = pa.array(list(keep_labels))
    typs = pa.array(list(keep_types)) if keep_types is not None else None

    def flt(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_in(batch["src_label"], value_set=labs),
                       pc.is_in(batch["dst_label"], value_set=labs))
        if typs is not None:
            keep = pc.and_(keep, pc.is_in(batch["edge_type"], value_set=typs))
        return batch.filter(keep)

    return typed_edges.map_batches(flt, batch_format="pyarrow")


def compute_all_metapaths_schema_full(
    typed_edges: rd.Dataset,
    length: int = 3,
    *,
    undirected: bool = True,
    with_weights: bool = False,
):
    """ComputeAllMetaPathsSchemaFull(+Weights) parity
    (algo/.../impl/metapath/ComputeAllMetaPathsSchemaFull.java,
    ComputeAllMetaPathsSchemaFullWeights.java): walk the *schema graph*
    (label-level adjacency) instead of the instance graph — the schema
    is tiny, so after one distributed distinct (get_schema) the walk is
    driver-side (SURVEY.md §2.5: "schema graph is tiny → driver-side").

    Returns a pandas DataFrame (path[, weight]); without weights each
    schema-realizable metapath appears once; with weights the path
    weight is the product of per-hop instance-edge counts (the number
    of instance edges realizing each (src_label, type, dst_label) hop).
    """
    import pandas as pd

    e = _symmetrize(typed_edges) if undirected else typed_edges.select_columns(
        ["src", "dst", "src_label", "edge_type", "dst_label"])
    triples = e.groupby(["src_label", "edge_type", "dst_label"]).count() \
        .rename_columns({"count()": "n"}).to_pandas()
    adj: dict[str, list[tuple[str, str, int]]] = {}
    labels = set()
    for r in triples.itertuples(index=False):
        adj.setdefault(r.src_label, []).append((r.edge_type, r.dst_label, int(r.n)))
        labels.add(r.src_label)
        labels.add(r.dst_label)
    rows = [(lab, 1) for lab in sorted(labels)]
    frontier = [(lab, lab, 1) for lab in sorted(labels)]
    for _ in range(length - 1):
        nxt = []
        for path, end, w in frontier:
            for et, dl, n in adj.get(end, []):
                nxt.append((f"{path}{SEP}{et}{SEP}{dl}", dl, w * n))
        rows.extend((p, w) for p, _, w in nxt)
        frontier = nxt
    df = pd.DataFrame(rows, columns=["path", "weight"]).drop_duplicates("path") \
        .sort_values("path").reset_index(drop=True)
    return df if with_weights else df[["path"]]


def write_metapaths_tsv(paths: rd.Dataset, path: str) -> str:
    """The reference's TSV sink ``Precomputed_MetaPaths.txt`` —
    ``metapath \\t count`` lines (ComputeAllMetaPaths.java:52)."""
    import pandas as pd  # noqa: F401

    df = paths.to_pandas().sort_values("path")
    df.to_csv(path, sep="\t", index=False, header=False)
    return path


def read_precomputed_metapaths(path: str) -> rd.Dataset:
    """ReadPrecomputedMetaPaths parity
    (algo/.../impl/metapath/ReadPrecomputedMetaPaths.java:13-31)."""
    import pandas as pd

    df = pd.read_csv(path, sep="\t", names=["path", "count"])
    return rd.from_pandas(df)


def label_id_mapping(typed_edges: rd.Dataset) -> rd.Dataset:
    """algo.getLabelIdToLabelNameMapping parity
    (algo/.../impl/metapath/LabelIdToLabelNameMapping.java): token
    dictionary label_id ↔ label_name (ids assigned in sorted-name
    order, deterministic)."""
    labs = _nodes_with_labels(typed_edges).groupby("label").count() \
        .select_columns(["label"]).sort("label")
    from neo4j_graph_algorithms_ray.util import zip_with_index
    return zip_with_index(labs, index_col="label_id") \
        .select_columns(["label_id", "label"])


def metapath_precompute_high_degree_nodes(
    typed_edges: rd.Dataset,
    ratio: float = 0.01,
    length: int = 3,
    *,
    undirected: bool = True,
    num_partitions: int = 8,
) -> rd.Dataset:
    """MetaPathPrecomputeHighDegreeNodes parity
    (MetaPathPrecomputeHighDegreeNodes.java:18-76): for the top-``ratio``
    highest-degree nodes, precompute (start, path, end) reachable
    instance rows — the hub-precompute skew idea. Returns a Dataset
    (start, path, end) with distinct rows."""
    e = _symmetrize(typed_edges) if undirected else typed_edges
    e = e.materialize()
    deg = e.groupby("src").count()
    k = max(1, int(deg.count() * ratio))
    # deterministic hub pick: (degree DESC, node ASC) — ties on degree
    # would otherwise make the hub set run-dependent (and un-oracle-able)
    hubs = pa.array([r["src"] for r in
                     deg.sort(["count()", "src"],
                              descending=[True, False]).limit(k).take_all()])

    def first_hop(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_in(batch["src"], value_set=hubs))
        path = pc.binary_join_element_wise(
            batch["src_label"].cast(pa.string()),
            batch["edge_type"].cast(pa.string()),
            batch["dst_label"].cast(pa.string()), SEP)
        return pa.table({"start": batch["src"], "path": path, "end": batch["dst"]})

    from neo4j_graph_algorithms_ray.util import predistinct
    cols = ["start", "path", "end"]
    frontier = predistinct(e.map_batches(first_hop, batch_format="pyarrow"),
                           cols).materialize()
    levels = [frontier]
    expand = _Expander(e, num_partitions) if length > 2 else None
    for _ in range(length - 2):
        joined = expand(frontier)

        def extend(batch: pa.Table) -> pa.Table:
            path = pc.binary_join_element_wise(
                batch["path"], batch["edge_type"].cast(pa.string()),
                batch["dst_label"].cast(pa.string()), SEP)
            return pa.table({"start": batch["start"], "path": path, "end": batch["dst"]})

        frontier = predistinct(joined.map_batches(extend, batch_format="pyarrow"),
                               cols).materialize()
        levels.append(frontier)
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return predistinct(out, cols)
