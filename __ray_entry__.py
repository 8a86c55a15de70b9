"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here calls ray.init()/ray.shutdown(). Each ``queries()[name](sf_dir)``
returns a Dataset / pandas DataFrame / pyarrow Table, and (where
SQL-expressible) ``oracle_sql()[name]`` is the exactly-equivalent DuckDB
query over the same parquet tables — identical column names, floats
rounded to 6 decimals on both sides, iterative algorithms matched by
running the engine for the same fixed number of supersteps the SQL
unrolls (see neo4j_graph_algorithms_ray/pipelines/oracles.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

PR_ITERS = 20
WCC_SQL_ITERS = 25
LPA_SWEEPS = 6
LOUVAIN_SWEEPS = 6
TOPK = 20


def _empty_safe(ds):
    """Dataset.to_pandas() drops column names on empty datasets (Ray
    2.49); hand the driver a typed empty pyarrow Table instead."""
    import pyarrow as pa
    import ray.data as rd
    if isinstance(ds, rd.Dataset):
        ds = ds.materialize()
        if ds.count() == 0:
            sch = ds.schema()
            return pa.table({n: pa.array([], t)
                             for n, t in zip(sch.names, sch.types)})
    return ds


def _round6(ds, col):
    import pyarrow as pa
    import pyarrow.compute as pc

    def r(batch: pa.Table) -> pa.Table:
        idx = batch.column_names.index(col)
        # half_towards_infinity matches DuckDB's round()
        return batch.set_column(idx, col, pc.round(
            batch[col], ndigits=6, round_mode="half_towards_infinity"))

    return ds.map_batches(r, batch_format="pyarrow")


# ---------------- graph queries ----------------

def _q_pagerank(sf_dir: str):
    from neo4j_graph_algorithms_ray.algorithms import pagerank
    from neo4j_graph_algorithms_ray.pipelines.tpch import get_graph
    g = get_graph(sf_dir, "purchase")
    res = pagerank(g, 0.85, max_iterations=PR_ITERS)
    return _round6(res.dataset, "score")


def _q_pagerank_topk(sf_dir: str):
    ds = _q_pagerank(sf_dir)
    return ds.sort(["score", "node"], descending=[True, False]).limit(TOPK)


def _q_wcc(sf_dir: str):
    from neo4j_graph_algorithms_ray.algorithms import wcc
    from neo4j_graph_algorithms_ray.algorithms.common import translate_vid_columns
    from neo4j_graph_algorithms_ray.pipelines.tpch import get_graph
    g = get_graph(sf_dir, "purchase_und")
    res = wcc(g)
    return translate_vid_columns(g, res.dataset, ["component"])


def _q_wcc_sizes(sf_dir: str):
    ds = _q_wcc(sf_dir)
    return ds.groupby("component").count().rename_columns({"count()": "size"})


def _q_labelprop(sf_dir: str):
    from neo4j_graph_algorithms_ray.algorithms import label_propagation
    from neo4j_graph_algorithms_ray.algorithms.common import translate_vid_columns
    from neo4j_graph_algorithms_ray.pipelines.tpch import get_graph
    g = get_graph(sf_dir, "purchase")
    res = label_propagation(g, max_iterations=LPA_SWEEPS, mode="semi")
    return translate_vid_columns(g, res.dataset, ["label"])


def _q_community_conductance(sf_dir: str):
    """Cluster-quality report for the LPA partition: per community,
    internal/cut edge counts and conductance (community_metrics.py)."""
    from neo4j_graph_algorithms_ray.algorithms import label_propagation
    from neo4j_graph_algorithms_ray.algorithms.common import \
        translate_vid_columns
    from neo4j_graph_algorithms_ray.algorithms.community_metrics import \
        community_conductance
    from neo4j_graph_algorithms_ray.pipelines.tpch import (
        get_graph, purchase_edge_ds)
    g = get_graph(sf_dir, "purchase")
    res = label_propagation(g, max_iterations=LPA_SWEEPS, mode="semi")
    labels = translate_vid_columns(g, res.dataset, ["label"])
    return community_conductance(purchase_edge_ds(sf_dir), labels,
                                 src_col="src", dst_col="dst")


def _q_modularity_score(sf_dir: str):
    """Directed Newman modularity report for the LPA partition
    (community_metrics.modularity): per community internal/out/in
    edge counts and the modularity contribution — the partition-
    quality number a community pipeline prints next to conductance."""
    from neo4j_graph_algorithms_ray.algorithms import label_propagation
    from neo4j_graph_algorithms_ray.algorithms.common import \
        translate_vid_columns
    from neo4j_graph_algorithms_ray.algorithms.community_metrics import \
        modularity
    from neo4j_graph_algorithms_ray.pipelines.tpch import (
        get_graph, purchase_edge_ds)
    g = get_graph(sf_dir, "purchase")
    res = label_propagation(g, max_iterations=LPA_SWEEPS, mode="semi")
    labels = translate_vid_columns(g, res.dataset, ["label"])
    return modularity(purchase_edge_ds(sf_dir), labels,
                      src_col="src", dst_col="dst")


def _q_labelprop_seeded(sf_dir: str):
    """Seeded label propagation — the reference's ``partition`` seed
    property (LabelPropagation420Test.java:37-60 seeds, doc/
    label-propagation.adoc): every node starts from a supplied class
    label (here node % 97, a 97-class semi-supervised seeding) and the
    same semi-synchronous min-tie kernel propagates them. Labels stay
    in seed-class space, so the result is (node, class) — the
    propagate-labels-from-seeds workflow of semi-supervised node
    classification."""
    import numpy as np
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.algorithms import label_propagation
    from neo4j_graph_algorithms_ray.pipelines.tpch import get_graph
    g = get_graph(sf_dir, "purchase")

    def seed(b: pa.Table) -> pa.Table:
        n = b["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": pa.array(n), "label": pa.array(n % 97)})

    seeds = g.vertices.select_columns(["node"]).map_batches(
        seed, batch_format="pyarrow")
    res = label_propagation(g, max_iterations=LPA_SWEEPS, mode="semi",
                            seed_dataset=seeds)
    return res.dataset


def _q_labelprop_weighted(sf_dir: str):
    from neo4j_graph_algorithms_ray.algorithms import label_propagation
    from neo4j_graph_algorithms_ray.algorithms.common import translate_vid_columns
    from neo4j_graph_algorithms_ray.pipelines.tpch import get_graph
    g = get_graph(sf_dir, "trade_w")
    res = label_propagation(g, max_iterations=LPA_SWEEPS, mode="semi",
                            weighted=True)
    return translate_vid_columns(g, res.dataset, ["label"])


def _q_triangle_global(sf_dir: str):
    import pandas as pd
    from neo4j_graph_algorithms_ray.algorithms import triangle_count
    from neo4j_graph_algorithms_ray.pipelines.tpch import get_graph
    g = get_graph(sf_dir, "copart")
    _, stats, _ = triangle_count(g)
    return pd.DataFrame({"triangle_count": [stats["triangleCount"]]})


def _q_zipf_alpha(sf_dir: str):
    """Zipf exponent MLE over the documents corpus vocabulary
    (functions/text.zipf_alpha) — one row (alpha, n_tail)."""
    from neo4j_graph_algorithms_ray.functions.text import zipf_alpha
    return zipf_alpha(_docs(sf_dir))


def _q_vocab_coverage(sf_dir: str):
    """Tokenizer-budget coverage curve: fraction of corpus token
    occurrences covered by the top-k vocabulary for k in
    {5, 15, 10000} — small ks exercise a real partial-coverage curve
    on the 31-token synthetic vocabulary
    (functions/text.vocab_coverage)."""
    from neo4j_graph_algorithms_ray.functions.text import vocab_coverage
    return vocab_coverage(_docs(sf_dir), ks=(5, 15, 10000))


def _q_host_outlink_entropy(sf_dir: str):
    """Per-host outlink diversity: Shannon entropy of each host's
    outlink distribution over target hosts (weights = distinct page
    links), with target count and total links — the crawl-frontier
    diversity signal separating broad hubs from link farms.
    H = ln(T) − (Σ n·ln n)/T from map-side-combinable scalar partials;
    only the per-host table shuffles."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.functions.text import round6
    from neo4j_graph_algorithms_ray.pipelines.webgraph import host_edge_ds
    from neo4j_graph_algorithms_ray.util import preagg_sum

    def partials(b: pa.Table) -> pa.Table:
        codes, uniq = pd.factorize(
            b["src_host"].to_numpy(zero_copy_only=False))
        n = b["n_links"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "host": pa.array(uniq),
            "n_targets": np.bincount(codes,
                                     minlength=len(uniq)).astype(np.int64),
            "total_links": np.bincount(codes, weights=n,
                                       minlength=len(uniq))
            .astype(np.int64),
            "s2": np.bincount(codes, weights=n * np.log(n),
                              minlength=len(uniq))})

    agg = preagg_sum(
        host_edge_ds(sf_dir).map_batches(partials, batch_format="pyarrow"),
        ["host"], ["n_targets", "total_links", "s2"])

    def finish(b: pa.Table) -> pa.Table:
        t = b["total_links"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        s2 = b["s2"].to_numpy(zero_copy_only=False)
        ent = round6(np.log(t) - s2 / t)
        return pa.table({"host": b["host"], "n_targets": b["n_targets"],
                         "total_links": b["total_links"],
                         "entropy": pa.array(ent)})

    return agg.map_batches(finish, batch_format="pyarrow").sort("host")


def _condensation_edges(sf_dir: str):
    """Distinct (src_comp, dst_comp) SCC-condensation edges of the
    thinned trade graph — shared by scc_condensation and
    condensation_levels."""
    import numpy as np
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.algorithms import scc
    from neo4j_graph_algorithms_ray.graph import build_graph
    from neo4j_graph_algorithms_ray.pipelines.tpch import trade_edge_ds
    from neo4j_graph_algorithms_ray.registry import GraphCatalog
    from neo4j_graph_algorithms_ray.util import (broadcast_join,
                                                 predistinct)

    def thin(b: pa.Table) -> pa.Table:
        src = b["src"].to_numpy(zero_copy_only=False)
        dst = b["dst"].to_numpy(zero_copy_only=False)
        keep = (src < 1_000_000) | ((src + dst) % 3 == 0)
        return b.filter(pa.array(keep))

    e = trade_edge_ds(sf_dir).map_batches(thin, batch_format="pyarrow") \
        .materialize()
    name = f"trade_thin:{sf_dir}"
    g = GraphCatalog.get(name)
    if g is None:
        g = build_graph(e, name=name.replace("/", "_"))
        GraphCatalog.set(name, g)
    labels = scc(g).dataset.materialize()
    j = broadcast_join(
        e, labels.rename_columns({"node": "__n", "component": "src_comp"}),
        on="src", right_on="__n")
    j = broadcast_join(
        j, labels.rename_columns({"node": "__n", "component": "dst_comp"}),
        on="dst", right_on="__n")
    j = j.select_columns(["src_comp", "dst_comp"]) \
        .filter(expr="src_comp != dst_comp")
    return predistinct(j, ["src_comp", "dst_comp"]).materialize()


def _q_scc_condensation(sf_dir: str):
    """Condensation DAG of strongly connected components: distinct
    (src_comp, dst_comp) edges between different SCCs — the DAG a
    reachability / bow-tie analysis walks. Input: the trade graph
    with the supplier→customer backedges deterministically thinned
    (keep (src+dst) % 3 == 0), because the full trade AND page graphs
    both collapse into one giant SCC at driver scale — the thinned
    graph exposes a real SCC mixture."""
    import pyarrow as pa

    res = _condensation_edges(sf_dir) \
        .sort(["src_comp", "dst_comp"]).materialize()
    if res.count() == 0:
        return pa.table({"src_comp": pa.array([], pa.int64()),
                         "dst_comp": pa.array([], pa.int64())})
    return res


def _q_condensation_levels(sf_dir: str):
    """Topological layering of the SCC condensation DAG: longest-path
    level per component (algorithms/dag.dag_levels) — the wave order
    an incremental recompute or reachability sweep processes
    components in. Exact recursive-CTE longest-path SQL oracle."""
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.algorithms.dag import dag_levels
    res = dag_levels(_condensation_edges(sf_dir),
                     src_col="src_comp", dst_col="dst_comp",
                     out_col="component").sort("component").materialize()
    if res.count() == 0:
        return pa.table({"component": pa.array([], pa.int64()),
                         "level": pa.array([], pa.int64())})
    return res


def _q_local_bridges(sf_dir: str):
    """Local bridges of the co-purchase graph (Granovetter's weak
    ties): edges whose endpoints share no common neighbor — triangle
    support 0 from one wedge-closure pass (ktruss.edge_support)."""
    from neo4j_graph_algorithms_ray.algorithms.ktruss import edge_support
    from neo4j_graph_algorithms_ray.pipelines.tpch import get_graph
    import pyarrow as pa
    g = get_graph(sf_dir, "copart")
    sup = edge_support(g)
    res = sup.filter(expr="support == 0").select_columns(["u", "v"]) \
        .sort(["u", "v"]).materialize()
    if res.count() == 0:
        # filtered-empty Datasets lose their schema entirely (not just
        # the column names _empty_safe recovers) — hand back typed empty
        return pa.table({"u": pa.array([], pa.int64()),
                         "v": pa.array([], pa.int64())})
    return res


def _q_pagerank_trace(sf_dir: str):
    """PageRank convergence telemetry: per-iteration L1 residual
    Σ_v |r_k(v) − r_{k−1}(v)| over the purchase graph — the monitor
    a to-1e-6-convergence run reads to decide when to stop. Full-
    recompute supersteps (one sum_state scatter per iteration) so
    iteration k is exactly the SQL unroll's r_k; only one scalar per
    iteration reaches the driver."""
    import numpy as np
    import pandas as pd

    from neo4j_graph_algorithms_ray.algorithms.common import get_engine
    from neo4j_graph_algorithms_ray.functions.text import round6
    from neo4j_graph_algorithms_ray.pipelines.tpch import get_graph
    g = get_graph(sf_dir, "purchase")
    eng = get_engine(g, None)
    eng.init_state("r", "const", 0.15)
    eng.apply_state("outdeg", "degree")
    iters, residuals = [], []
    for k in range(1, PR_ITERS + 1):
        eng.apply_state("prev", "copy", "r")
        eng.apply_state("pr_div", "div0", "r", "outdeg")
        eng.step("sum_state", "set_sum_update",
                 scatter_kw={"name": "pr_div"},
                 update_kw={"name": "inc"})
        eng.apply_state("r", "scale", "inc", 0.85)
        eng.apply_state("r", "add", "r", 0.15)
        eng.apply_state("__res", "absdiff", "r", "prev")
        iters.append(k)
        residuals.append(float(eng.state_sum("__res")))
    eng.drop_states(["prev", "pr_div", "inc", "__res"])
    return pd.DataFrame({
        "iteration": pd.array(iters, dtype="int64"),
        "residual": round6(np.array(residuals))})


def _q_radius_diameter(sf_dir: str):
    """Sampled graph radius and diameter (one row): min / max
    eccentricity over the 64 lowest-id MSBFS sources on the trade
    graph — the distance summary next to effective_diameter's hop
    percentile (unreaching sources keep eccentricity 0, mirroring
    the eccentricity_sampled contract)."""
    import pandas as pd

    from neo4j_graph_algorithms_ray.algorithms import eccentricity
    from neo4j_graph_algorithms_ray.pipelines.tpch import get_graph
    g = get_graph(sf_dir, "trade")
    res = eccentricity(g, sources=range(min(64, g.num_vertices))).dataset \
        .materialize()
    return pd.DataFrame({
        "n_sources": pd.array([res.count()], dtype="int64"),
        "radius": pd.array([int(res.min("eccentricity") or 0)],
                           dtype="int64"),
        "diameter": pd.array([int(res.max("eccentricity") or 0)],
                             dtype="int64")})


def _q_dedup_rate_by_source(sf_dir: str):
    """Per-source duplication report: doc count, distinct-text count
    and dup_rate = 1 − unique/docs per corpus slice — the planning
    table a dedup run prints before choosing per-slice strategies.
    Distinctness via 64-bit md5 keys (one hash per distinct string
    per batch), so only (source, hash) pairs shuffle — never text."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.functions.dedup import _md5_u64
    from neo4j_graph_algorithms_ray.functions.text import round6
    from neo4j_graph_algorithms_ray.util import (broadcast_join,
                                                 predistinct, preagg_sum)

    docs = _docs_full(sf_dir).select_columns(["source", "text"])

    def counts(b: pa.Table) -> pa.Table:
        codes, uniq = pd.factorize(
            b["source"].to_numpy(zero_copy_only=False))
        return pa.table({"source": pa.array(uniq),
                         "n_docs": np.bincount(
                             codes, minlength=len(uniq)).astype(np.int64)})

    n_docs = preagg_sum(docs.map_batches(counts, batch_format="pyarrow"),
                        ["source"], "n_docs")

    def hashes(b: pa.Table) -> pa.Table:
        t = b["text"].to_numpy(zero_copy_only=False)
        hu, inv = _md5_u64(t, hexdigits=16)
        return pa.table({"source": b["source"],
                         "h": pa.array(hu[inv].view(np.int64))})

    uniq = preagg_sum(
        predistinct(docs.map_batches(hashes, batch_format="pyarrow"),
                    ["source", "h"])
        .map_batches(counts_ones_by_source, batch_format="pyarrow"),
        ["source"], "n_unique")

    out = broadcast_join(n_docs, uniq, on="source")

    def finish(b: pa.Table) -> pa.Table:
        n = b["n_docs"].to_numpy(zero_copy_only=False).astype(np.float64)
        u = b["n_unique"].to_numpy(zero_copy_only=False).astype(np.float64)
        return b.append_column("dup_rate", pa.array(round6(1.0 - u / n)))

    return out.map_batches(finish, batch_format="pyarrow").sort("source")


def counts_ones_by_source(b):
    """(source, …) batch → per-source row counts named n_unique."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    codes, uniq = pd.factorize(b["source"].to_numpy(zero_copy_only=False))
    return pa.table({"source": pa.array(uniq),
                     "n_unique": np.bincount(
                         codes, minlength=len(uniq)).astype(np.int64)})


def _q_avg_clustering(sf_dir: str):
    """Watts–Strogatz average clustering coefficient (one row): the
    mean of the per-node coefficients over the co-purchase graph —
    the small-world summary companion of global_transitivity (they
    differ: transitivity weights hubs, this weights nodes equally)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.algorithms import triangle_count
    from neo4j_graph_algorithms_ray.functions.text import round6
    from neo4j_graph_algorithms_ray.pipelines.tpch import get_graph
    from neo4j_graph_algorithms_ray.util import collect_arrow
    g = get_graph(sf_dir, "copart")
    per, _, _ = triangle_count(g)

    def partial(b: pa.Table) -> pa.Table:
        c = b["coefficient"].to_numpy(zero_copy_only=False)
        return pa.table({"s": pa.array([float(round6(c).sum())]),
                         "n": pa.array([len(c)], pa.int64())})

    s = 0.0
    n = 0
    for t in collect_arrow(per.map_batches(partial,
                                           batch_format="pyarrow")):
        if t.num_rows:
            s += float(t["s"].to_numpy(zero_copy_only=False).sum())
            n += int(t["n"].to_numpy(zero_copy_only=False).sum())
    avg = round6(np.array([s / n if n else 0.0]))
    return pd.DataFrame({"n_nodes": pd.array([n], dtype="int64"),
                         "avg_clustering": avg})


def _q_degree_gini(sf_dir: str):
    """Gini coefficient of the page out-degree distribution (one
    row) — the attention-inequality summary of a link graph, exact
    from the degree histogram: with degrees ranked ascending,
    G = 2·Σ i·dᵢ / (n·Σ d) − (n+1)/n. The rank sum collapses over
    equal-degree ties, so only the (degree → count) histogram reaches
    the driver — integer-exact at any scale."""
    import numpy as np
    import pandas as pd

    import pyarrow as pa

    from neo4j_graph_algorithms_ray.algorithms.common import get_engine
    from neo4j_graph_algorithms_ray.functions.text import round6
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_web_graph
    from neo4j_graph_algorithms_ray.util import collect_arrow, preagg_sum

    g = get_web_graph(sf_dir)
    eng = get_engine(g, None)
    deg = eng.degrees_dataset()

    def hist(b: pa.Table) -> pa.Table:
        d = b["degree"].to_numpy(zero_copy_only=False).astype(np.int64)
        vals, cnts = np.unique(d, return_counts=True)
        return pa.table({"d": pa.array(vals),
                         "c": pa.array(cnts.astype(np.int64))})

    h = pa.concat_tables(
        [t for t in collect_arrow(
            preagg_sum(deg.map_batches(hist, batch_format="pyarrow"),
                       ["d"], "c"))
         if t.num_rows])
    d = h["d"].to_numpy(zero_copy_only=False).astype(np.int64)
    c = h["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(d, kind="stable")
    d, c = d[order], c[order]
    n = int(c.sum())
    s = int((d * c).sum())
    # Σ i·d over a tie block of size c at cumulative offset p:
    # d · (p·c + c(c+1)/2)
    p = np.concatenate([[0], np.cumsum(c)[:-1]])
    t2 = int((d * (p * c + c * (c + 1) // 2)).sum())
    gini = round6(np.array(
        [2.0 * t2 / (float(n) * s) - (n + 1.0) / n if n and s else 0.0]))
    return pd.DataFrame({"n_nodes": pd.array([n], dtype="int64"),
                         "gini": gini})


def _q_triangles_stream(sf_dir: str):
    """algo.triangle.stream parity (TriangleStream.java): one row per
    triangle as an (a, b, c) node triple over the co-purchase graph,
    normalized a < b < c."""
    import numpy as np
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.algorithms import triangle_stream
    from neo4j_graph_algorithms_ray.pipelines.tpch import get_graph
    g = get_graph(sf_dir, "copart")

    def norm(b: pa.Table) -> pa.Table:
        m = np.sort(np.stack([
            b["a"].to_numpy(zero_copy_only=False),
            b["b"].to_numpy(zero_copy_only=False),
            b["c"].to_numpy(zero_copy_only=False)]), axis=0)
        return pa.table({"a": m[0], "b": m[1], "c": m[2]})

    return triangle_stream(g).map_batches(norm, batch_format="pyarrow") \
        .sort(["a", "b", "c"])


def _q_labelprop_resumed(sf_dir: str):
    """Kill-and-resume parity for label propagation: two semi-sweeps
    with a checkpoint, then a second call restores the label vector
    from the per-partition-lineage manifest and finishes the 6-sweep
    schedule — must value-hash-match the straight-run unroll used by
    ``labelprop`` (completes the resume story across PageRank / WCC /
    LPA, the north rule's resume-from-checkpoint clause)."""
    import hashlib
    import shutil

    from neo4j_graph_algorithms_ray.algorithms import label_propagation
    from neo4j_graph_algorithms_ray.algorithms.common import \
        translate_vid_columns
    from neo4j_graph_algorithms_ray.pipelines.tpch import get_graph
    g = get_graph(sf_dir, "purchase")
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    ck = f"/tmp/nga_ray/ckpt_q/lpa_{tag}"
    shutil.rmtree(ck, ignore_errors=True)
    label_propagation(g, max_iterations=2, mode="semi",
                      checkpoint_dir=ck, checkpoint_every=2)
    res = label_propagation(g, max_iterations=LPA_SWEEPS, mode="semi",
                            checkpoint_dir=ck, resume=True)
    return translate_vid_columns(g, res.dataset, ["label"])


def _q_global_transitivity(sf_dir: str):
    """Global transitivity (one-row graph summary): 3·triangles /
    wedges with wedges = Σ_v d_v(d_v−1)/2 over the undirected
    co-purchase simple graph — the whole-graph companion of the
    per-node clustering coefficient."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.algorithms import triangle_count
    from neo4j_graph_algorithms_ray.functions.text import round6
    from neo4j_graph_algorithms_ray.pipelines.tpch import (copart_edge_ds,
                                                           get_graph)
    from neo4j_graph_algorithms_ray.util import collect_arrow, preagg_sum
    g = get_graph(sf_dir, "copart")
    _, stats, _ = triangle_count(g)
    tri = int(stats["triangleCount"])

    def endpoints(b: pa.Table) -> pa.Table:
        one = pa.array(np.ones(b.num_rows, np.int64))
        return pa.concat_tables([pa.table({"node": b["src"], "d": one}),
                                 pa.table({"node": b["dst"], "d": one})])

    deg = preagg_sum(
        copart_edge_ds(sf_dir).map_batches(endpoints,
                                           batch_format="pyarrow"),
        ["node"], "d")

    def wedge_partial(b: pa.Table) -> pa.Table:
        d = b["d"].to_numpy(zero_copy_only=False)
        return pa.table({"w": pa.array([int((d * (d - 1) // 2).sum())],
                                       pa.int64())})

    wedges = 0
    for t in collect_arrow(deg.map_batches(wedge_partial,
                                           batch_format="pyarrow")):
        if t.num_rows:
            wedges += int(t["w"].to_numpy(zero_copy_only=False).sum())
    trans = round6(np.array([3.0 * tri / wedges if wedges > 0 else 0.0]))
    return pd.DataFrame({"triangles": pd.array([tri], dtype="int64"),
                         "wedges": pd.array([wedges], dtype="int64"),
                         "transitivity": trans})


def _q_rich_club(sf_dir: str):
    """Rich-club coefficient profile of the page link graph — do the
    high-degree pages preferentially link to each other? φ(k) for
    k ∈ {2,4,8,16,32} over the symmetrized simple graph."""
    from neo4j_graph_algorithms_ray.algorithms.community_metrics import \
        rich_club
    from neo4j_graph_algorithms_ray.pipelines.webgraph import web_edge_ds
    return rich_club(web_edge_ds(sf_dir), src_col="src_url",
                     dst_col="dst_url")


def _q_triangle_per_node(sf_dir: str):
    from neo4j_graph_algorithms_ray.algorithms import triangle_count
    from neo4j_graph_algorithms_ray.pipelines.tpch import get_graph
    g = get_graph(sf_dir, "copart")
    per, _, _ = triangle_count(g)
    return _round6(per, "coefficient")


def _q_degrees(sf_dir: str):
    import pyarrow as pa
    from neo4j_graph_algorithms_ray.algorithms.common import get_engine
    from neo4j_graph_algorithms_ray.algorithms.common import attach_node_ids
    from neo4j_graph_algorithms_ray.pipelines.tpch import get_graph
    g = get_graph(sf_dir, "purchase")
    eng = get_engine(g, None)
    ds = eng.degrees_dataset().rename_columns({"degree": "out_degree"})
    return attach_node_ids(g, ds)


def _q_in_degrees(sf_dir: str):
    """Direction-selectable degrees (reference Degrees.degree(node,
    Direction.INCOMING), core/.../api/Degrees.java:22) — in-degrees
    from one CSR scatter superstep."""
    from neo4j_graph_algorithms_ray.algorithms.common import (
        attach_node_ids, get_engine)
    from neo4j_graph_algorithms_ray.pipelines.tpch import get_graph
    g = get_graph(sf_dir, "purchase")
    eng = get_engine(g, None)
    ds = eng.degrees_dataset("in").rename_columns({"degree": "in_degree"})
    return attach_node_ids(g, ds)


def _q_graph_stats(sf_dir: str):
    import pandas as pd
    from neo4j_graph_algorithms_ray.algorithms.common import get_engine
    from neo4j_graph_algorithms_ray.pipelines.tpch import get_graph
    g = get_graph(sf_dir, "purchase")
    eng = get_engine(g, None)
    deg = eng.degrees_dataset()
    dangling = deg.filter(expr="degree == 0").count()
    return pd.DataFrame({"nodes": [g.num_vertices], "relationships": [g.num_edges],
                         "dangling_nodes": [dangling]})


def _q_metapaths(sf_dir: str):
    from neo4j_graph_algorithms_ray.algorithms import compute_all_metapaths
    from neo4j_graph_algorithms_ray.pipelines.tpch import typed_edge_ds
    return compute_all_metapaths(typed_edge_ds(sf_dir), length=3, undirected=True)


def _q_get_schema(sf_dir: str):
    from neo4j_graph_algorithms_ray.algorithms import get_schema
    from neo4j_graph_algorithms_ray.pipelines.tpch import typed_edge_ds
    return get_schema(typed_edge_ds(sf_dir))


def _q_metapaths_schema_full(sf_dir: str):
    from neo4j_graph_algorithms_ray.algorithms import compute_all_metapaths_schema_full
    from neo4j_graph_algorithms_ray.pipelines.tpch import typed_edge_ds
    return compute_all_metapaths_schema_full(typed_edge_ds(sf_dir), length=3)


def _q_label_ids(sf_dir: str):
    from neo4j_graph_algorithms_ray.algorithms import label_id_mapping
    from neo4j_graph_algorithms_ray.pipelines.tpch import typed_edge_ds
    return label_id_mapping(typed_edge_ds(sf_dir))


# ---------------- centrality / path / community queries ----------------

def _q_closeness_sampled(sf_dir: str):
    from neo4j_graph_algorithms_ray.algorithms import closeness
    from neo4j_graph_algorithms_ray.pipelines.tpch import get_graph
    g = get_graph(sf_dir, "trade")
    res = closeness(g, sources=range(min(64, g.num_vertices)))
    return _round6(res.dataset, "centrality")


def _q_harmonic_sampled(sf_dir: str):
    from neo4j_graph_algorithms_ray.algorithms import harmonic
    from neo4j_graph_algorithms_ray.pipelines.tpch import get_graph
    g = get_graph(sf_dir, "trade")
    res = harmonic(g, sources=range(min(64, g.num_vertices)))
    return _round6(res.dataset, "centrality")


def _q_sssp(sf_dir: str):
    from neo4j_graph_algorithms_ray.algorithms import sssp_delta_stepping
    from neo4j_graph_algorithms_ray.pipelines.tpch import get_graph
    g = get_graph(sf_dir, "trade_w")
    src = g.vid_to_node_map()[0].as_py()  # smallest original id
    res = sssp_delta_stepping(g, src)
    ds = res.dataset.filter(expr="distance < 1e308")  # reached rows only
    return _round6(ds, "distance")


def _q_sssp_path(sf_dir: str):
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.algorithms.sssp import (
        shortest_path_to_farthest)
    from neo4j_graph_algorithms_ray.pipelines.tpch import get_graph
    g = get_graph(sf_dir, "trade_w")
    source = _min_node(g)
    # target = max reachable original id, picked inside the same
    # Dijkstra pass (vid order == original-id order)
    r = shortest_path_to_farthest(g, source)
    return pa.table({
        "step": pa.array(range(len(r["path"])), pa.int64()),
        "node": pa.array(r["path"], pa.int64()),
        "cost": pa.array([round(c, 6) for c in r["costs"]], pa.float64())})


def _min_node(g):
    import pyarrow.compute as pc
    refs = g.vertices.select_columns(["node"]).to_arrow_refs()
    import ray as _ray
    vals = [pc.min(t["node"]).as_py() for t in _ray.get(refs) if t.num_rows]
    return min(vals)


def _q_wcc_threshold(sf_dir: str):
    """unionFind threshold variant: union only edges with weight >= 3
    (GraphUnionFind.java:82-104 — threshold filter before the build)."""
    from neo4j_graph_algorithms_ray import build_graph
    from neo4j_graph_algorithms_ray.algorithms import wcc
    from neo4j_graph_algorithms_ray.algorithms.common import translate_vid_columns
    from neo4j_graph_algorithms_ray.pipelines.tpch import (
        get_graph, trade_weighted_edge_ds)
    from neo4j_graph_algorithms_ray.registry import GraphCatalog
    name = f"tpch:{sf_dir}:trade_thr3"
    g = GraphCatalog.get(name)
    if g is None:
        # node set = ALL trade nodes (the reference loads every node,
        # thresholding only the unions)
        gt = get_graph(sf_dir, "trade")
        verts = gt.vertices.select_columns(["node"])
        edges = trade_weighted_edge_ds(sf_dir).filter(expr="weight >= 3.0")
        g = build_graph(edges, undirected=True, extra_vertices=verts,
                        name=name.replace("/", "_"))
        GraphCatalog.set(name, g)
    res = wcc(g)
    return translate_vid_columns(g, res.dataset, ["component"])


def _q_closeness_weighted(sf_dir: str):
    """Weighted closeness of the 4 smallest node ids: (n-1)/farness
    over weighted shortest-path distances (beyond-reference; the
    reference's closeness is hop-based only). Composition: per-source
    Dijkstra fan-out → per-source map-side farness sum."""
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.algorithms import all_shortest_paths_weighted
    from neo4j_graph_algorithms_ray.pipelines.tpch import get_graph
    from neo4j_graph_algorithms_ray.util import preagg_sum
    g = get_graph(sf_dir, "trade_w")
    m = g.vid_to_node_map()
    srcs = [m[i].as_py() for i in range(min(4, g.num_vertices))]
    ap = all_shortest_paths_weighted(g, sources=srcs)

    def fold(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["source"], "farness": b["distance"]})

    agg = preagg_sum(ap.map_batches(fold, batch_format="pyarrow"),
                     ["node"], "farness")
    n = g.num_vertices
    # one row per SOURCE (|srcs| rows total), including zero-reach
    # sources the aggregate never saw — tiny, finalize on the driver
    far = {r["node"]: r["farness"] for r in agg.take_all()}
    import ray.data as rd

    from neo4j_graph_algorithms_ray.util import round6
    cent = [round6((n - 1) / far[s]) if far.get(s, 0) > 0 else 0.0
            for s in srcs]
    return rd.from_arrow(pa.table({"node": pa.array(srcs),
                                   "centrality": pa.array(cent,
                                                          pa.float64())}))


def _q_eccentricity_sampled(sf_dir: str):
    from neo4j_graph_algorithms_ray.algorithms import eccentricity
    from neo4j_graph_algorithms_ray.pipelines.tpch import get_graph
    g = get_graph(sf_dir, "trade")
    return eccentricity(g, sources=range(min(64, g.num_vertices))).dataset


def _q_hop_distances(sf_dir: str):
    from neo4j_graph_algorithms_ray.algorithms import msbfs_hop_counts
    from neo4j_graph_algorithms_ray.pipelines.tpch import get_graph
    g = get_graph(sf_dir, "trade")
    return msbfs_hop_counts(g, sources=range(min(64, g.num_vertices)))


def _q_all_pairs_weighted(sf_dir: str):
    from neo4j_graph_algorithms_ray.algorithms import all_shortest_paths_weighted
    from neo4j_graph_algorithms_ray.pipelines.tpch import get_graph
    g = get_graph(sf_dir, "trade_w")
    m = g.vid_to_node_map()
    srcs = [m[i].as_py() for i in range(min(4, g.num_vertices))]
    return _round6(all_shortest_paths_weighted(g, sources=srcs), "distance")


def _q_scc(sf_dir: str):
    from neo4j_graph_algorithms_ray.algorithms import scc
    from neo4j_graph_algorithms_ray.pipelines.tpch import get_graph
    g = get_graph(sf_dir, "trade")
    return scc(g).dataset


def _q_louvain(sf_dir: str):
    from neo4j_graph_algorithms_ray.algorithms import louvain
    from neo4j_graph_algorithms_ray.pipelines.tpch import get_graph
    g = get_graph(sf_dir, "copart")
    return louvain(g, max_iterations=LOUVAIN_SWEEPS).dataset


def _q_betweenness_sampled(sf_dir: str):
    # BSP scale path (sharded CSR waves): identical output contract to
    # the task-parallel exact path (pytest asserts parity), exercised
    # here so the driver gate covers the variant that survives graphs
    # larger than one worker's RAM. Runs on the host graph with the
    # deterministic md5 sampling strategy so a DuckDB oracle can replay
    # the exact source set (oracles_web.host_betweenness_sql).
    from neo4j_graph_algorithms_ray.algorithms import betweenness_bsp
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_host_graph
    g = get_host_graph(sf_dir)
    res = betweenness_bsp(g, sample=10, strategy="md5", node_col="host")
    return _round6(res.dataset, "centrality")


def _q_algo_list(sf_dir: str):
    # algo.list parity (ListProc.java:42-46): the procedure surface as
    # (name, impl) rows. The oracle is a hand-pinned VALUES literal, so
    # registry drift fails the value-hash gate.
    from neo4j_graph_algorithms_ray.registry import list_procedures
    return list_procedures()


def _q_betweenness_exact(sf_dir: str):
    # exact Brandes (every node a source) on the directed host graph —
    # the task-parallel variant, value-hash-gated against the SQL
    # pair-dependency oracle.
    from neo4j_graph_algorithms_ray.algorithms import betweenness
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_host_graph
    g = get_host_graph(sf_dir)
    return _round6(betweenness(g, node_col="host").dataset, "centrality")


def _q_mscoloring(sf_dir: str):
    # algo.unionFind.mscoloring (MSColoring.java:46-125): WCC by MAX-id
    # propagation; oracle = wcc_sql unroll with greatest/max.
    from neo4j_graph_algorithms_ray.algorithms import mscoloring
    from neo4j_graph_algorithms_ray.pipelines.tpch import get_graph
    g = get_graph(sf_dir, "purchase_und")
    return mscoloring(g).dataset


def _q_mst_prim(sf_dir: str):
    import numpy as np
    # algo.mst (MSTPrim.java:46-70): sequential Prim from the smallest
    # host over the undirected weighted host graph; oracle = recursive
    # single-row Prim replay (oracles_web.host_mst_sql).
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.algorithms import mst_prim
    from neo4j_graph_algorithms_ray.pipelines.webgraph import \
        get_host_graph_weighted_und
    from neo4j_graph_algorithms_ray.util import round6
    g = get_host_graph_weighted_und(sf_dir)
    start = g.vid_to_node_map()[0].as_py()
    r = mst_prim(g, start)
    rr = lambda x: float(round6(np.array([x]))[0])
    return pa.table({
        "weight_sum": pa.array([rr(r["weight_sum"])]),
        "weight_min": pa.array([rr(r["weight_min"])]),
        "weight_max": pa.array([rr(r["weight_max"])]),
        "edge_count": pa.array([len(r["edges"])], pa.int64()),
        "effective_node_count": pa.array([r["effective_node_count"]], pa.int64()),
    })


def _q_msf_boruvka(sf_dir: str):
    import numpy as np
    # distributed Borůvka MSF on the same graph — all MSTs share one
    # weight multiset, so the Prim oracle's totals gate it too.
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.algorithms import msf_boruvka
    from neo4j_graph_algorithms_ray.pipelines.webgraph import \
        get_host_graph_weighted_und
    from neo4j_graph_algorithms_ray.util import round6
    g = get_host_graph_weighted_und(sf_dir)
    r = msf_boruvka(g)
    return pa.table({
        "weight_sum": pa.array([float(round6(np.array([r["weight_sum"]]))[0])]),
        "edge_count": pa.array([r["edge_count"]], pa.int64()),
        "components": pa.array([r["components"]], pa.int64()),
    })


def _q_getting_started(sf_dir: str):
    # algo.gettingStarted (GettingStarted.java:30-40): any relationship?
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.algorithms import getting_started
    from neo4j_graph_algorithms_ray.pipelines.tpch import get_graph
    g = get_graph(sf_dir, "purchase")
    return pa.table({"has_relationships": pa.array([getting_started(g)])})


def _q_filter_metapaths(sf_dir: str):
    # algo.filterMetaPaths (FilterMetaPaths.java:17-55) composed over
    # computeAllMetaPaths output: Customer-start, Nation-end paths.
    from neo4j_graph_algorithms_ray.algorithms import (
        compute_all_metapaths, filter_metapaths)
    from neo4j_graph_algorithms_ray.pipelines.tpch import typed_edge_ds
    paths = compute_all_metapaths(typed_edge_ds(sf_dir), length=3,
                                  undirected=True)
    return filter_metapaths(paths, start_labels=["Customer"],
                            end_labels=["Nation"])


def _q_metapaths_for_instances(sf_dir: str):
    # ComputeAllMetaPathsForInstances: paths between the 5 smallest
    # customers and every Nation node, with walk counts.
    from neo4j_graph_algorithms_ray.algorithms import \
        compute_metapaths_for_instances
    from neo4j_graph_algorithms_ray.pipelines.tpch import (_read,
                                                           typed_edge_ds)
    te = typed_edge_ds(sf_dir)
    starts = [r["c_custkey"] for r in _read(sf_dir, "customer", ["c_custkey"])
              .sort("c_custkey").limit(5).take_all()]
    ends = sorted({r["dst"] for r in te.filter(expr="dst_label == 'Nation'")
                  .select_columns(["dst"]).take_all()})
    return compute_metapaths_for_instances(te, starts, ends, length=3,
                                           undirected=True)


def _q_metapath_precompute_hubs(sf_dir: str):
    # MetaPathPrecomputeHighDegreeNodes.java:18-76: (start, path, end)
    # instance rows for the top-1% degree hubs, deterministic tie-break.
    from neo4j_graph_algorithms_ray.algorithms import \
        metapath_precompute_high_degree_nodes
    from neo4j_graph_algorithms_ray.pipelines.tpch import typed_edge_ds
    return metapath_precompute_high_degree_nodes(
        typed_edge_ds(sf_dir), ratio=0.01, length=3, undirected=True)


def _q_scalars_flags(sf_dir: str):
    import numpy as np
    # algo.isFinite/isInfinite/Infinity/NaN (IsFiniteFunc.java:27-45)
    # exercised as batch kernels over a lineitem-derived column with
    # injected inf/nan; single aggregated row of flag counts.
    import pyarrow as pa
    import pyarrow.compute as pc

    from neo4j_graph_algorithms_ray.functions import scalars
    from neo4j_graph_algorithms_ray.util import read_parquet_clean
    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount", "l_tax"])

    def flags(b: "pa.Table") -> "pa.Table":
        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        tax = b["l_tax"].to_numpy(zero_copy_only=False)
        safe = np.where(disc > 0, disc, 1.0)
        val = np.where(disc > 0, price / safe, scalars.infinity())
        val = np.where(tax == 0, scalars.nan(), val)
        arr = pa.array(val)
        return pa.table({
            "n_finite": pa.array([int(pc.sum(scalars.is_finite(arr)).as_py() or 0)], pa.int64()),
            "n_infinite": pa.array([int(pc.sum(scalars.is_infinite(arr)).as_py() or 0)], pa.int64()),
            "n_nan": pa.array([int(pc.sum(pc.is_nan(arr)).as_py() or 0)], pa.int64()),
        })

    part = li.map_batches(flags, batch_format="pyarrow")
    import pyarrow as _pa
    return _pa.table({
        "n_finite": _pa.array([int(part.sum("n_finite") or 0)], _pa.int64()),
        "n_infinite": _pa.array([int(part.sum("n_infinite") or 0)], _pa.int64()),
        "n_nan": _pa.array([int(part.sum("n_nan") or 0)], _pa.int64()),
    })


def _q_graph_catalog(sf_dir: str):
    import numpy as np
    # LoadGraphFactory / algo.graph.load+info+remove round trip
    # (registry.py GraphCatalog) on a fresh tiny nation→region graph —
    # not an alias of a shared cached graph, so remove() closing its
    # engines cannot disturb other queries.
    import pyarrow as pa

    from neo4j_graph_algorithms_ray import build_graph
    from neo4j_graph_algorithms_ray.pipelines.tpch import _read
    from neo4j_graph_algorithms_ray.registry import GraphCatalog

    def mk(b: pa.Table) -> pa.Table:
        return pa.table({
            "src": b["n_nationkey"].cast(pa.int64()),
            "dst": pa.array(3_000_000
                            + b["n_regionkey"].to_numpy(zero_copy_only=False)
                            .astype(np.int64)),
        })

    edges = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]) \
        .map_batches(mk, batch_format="pyarrow")
    g = build_graph(edges, name="driver_catalog_rt")
    GraphCatalog.set("driver_catalog_rt", g)
    info = GraphCatalog.info("driver_catalog_rt")
    removed = GraphCatalog.remove("driver_catalog_rt")
    exists_after = GraphCatalog.check("driver_catalog_rt")
    return pa.table({
        "name": pa.array([info["name"]]),
        "nodes": pa.array([info["nodes"]], pa.int64()),
        "relationships": pa.array([info["relationships"]], pa.int64()),
        "removed": pa.array([removed]),
        "exists_after": pa.array([exists_after]),
    })


def _q_betweenness_maxdepth(sf_dir: str):
    # MaxDepthBetweennessCentrality.java parity: exact BSP Brandes with
    # the BFS capped at depth 3; oracle = the bounded pair-dependency
    # SQL with the same cap.
    from neo4j_graph_algorithms_ray.algorithms import betweenness_bsp
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_host_graph
    g = get_host_graph(sf_dir)
    res = betweenness_bsp(g, max_depth=3, node_col="host")
    return _round6(res.dataset, "centrality")


# ---------------- event-stream queries (functions/events.py) ----------------

EVENT_WINDOW_S = 3600
EVENT_GAP_S = 1800


def _events(sf_dir: str):
    from neo4j_graph_algorithms_ray.util import read_parquet_clean
    return read_parquet_clean(f"{sf_dir}/events.parquet")


def _q_window_agg(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.events import windowed_aggregate
    ds = windowed_aggregate(_events(sf_dir), window_s=EVENT_WINDOW_S)
    return _round6(ds, "sum_value")


def _q_ann_eval(sf_dir: str):
    """Per-query recall@10 of the LSH ANN index against brute-force
    ground truth (functions/ann.ann_recall_report)."""
    from neo4j_graph_algorithms_ray.functions.ann import (ann_recall_report,
                                                          brute_force_topk,
                                                          lsh_topk)
    vecs, ids = _ann_queries(sf_dir)
    bf = brute_force_topk(_emb(sf_dir), vecs, ids, k=10)
    ap = lsh_topk(_emb(sf_dir), vecs, ids, k=10)
    return ann_recall_report(bf, ap, k=10)


def _q_embedding_quantize(sf_dir: str):
    """Per-dimension int8 quantization audit
    (functions/ann.embedding_quantize_report)."""
    from neo4j_graph_algorithms_ray.functions.ann import \
        embedding_quantize_report
    return embedding_quantize_report(_emb(sf_dir))


def _q_langid_confusion(sf_dir: str):
    """Language-ID confusion matrix: labeled lang vs the LangId
    heuristic (functions/text.langid_confusion)."""
    from neo4j_graph_algorithms_ray.functions.text import langid_confusion
    from neo4j_graph_algorithms_ray.util import read_parquet_clean
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["text", "lang"])
    return langid_confusion(docs)


def _q_quality_by_source(sf_dir: str):
    """Per-source corpus quality aggregate
    (functions/text.quality_by_source)."""
    from neo4j_graph_algorithms_ray.functions.text import quality_by_source
    from neo4j_graph_algorithms_ray.util import read_parquet_clean
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["text", "source"])
    return quality_by_source(docs)


def _q_embedding_gram(sf_dir: str):
    """Distributed Gram matrix (upper triangle, round6) over the
    embeddings table (functions/ann.embedding_gram)."""
    from neo4j_graph_algorithms_ray.functions.ann import embedding_gram
    return embedding_gram(_emb(sf_dir))


def _q_embedding_pca(sf_dir: str):
    """Top-8 PCA explained-variance ratios from the distributed Gram
    partials (functions/ann.embedding_pca). Rows-only driver check —
    eigensolves have no SQL mirror; the Gram itself is value-hash
    checked by ``embedding_gram``."""
    from neo4j_graph_algorithms_ray.functions.ann import embedding_pca
    return embedding_pca(_emb(sf_dir), topk=8)


def _q_web_matching(sf_dir: str):
    """Parallel maximal matching (Israeli-Itai local-minimum edge
    matching, the edge analogue of Luby MIS) over the undirected web
    page graph — disjoint page pairs for e.g. conflict-free pairwise
    dedup review. Deterministic md5 edge priorities, mirrored
    bit-for-bit by the unrolled SQL oracle
    (oracles_web.web_matching_sql)."""
    from neo4j_graph_algorithms_ray.algorithms.matching import \
        maximal_matching
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_web_graph
    g = get_web_graph(sf_dir)
    return maximal_matching(g, rounds=8, node_col="url")


def _q_crawl_frontier(sf_dir: str):
    """Crawl-frontier prioritization: pages already crawled = warc_ts
    before the cutoff (the first 60% of the crawl window — a REAL
    timestamp filter on the input-hint column, not id arithmetic);
    frontier = outlink targets of crawled pages that are not
    themselves crawled, scored by expected crawl mass
    sum(1/outdeg(src)) over crawled sources. The SQL oracle mirrors
    the cutoff arithmetically (warc_ts = base + doc_id seconds by
    fixture construction)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from neo4j_graph_algorithms_ray.pipelines.webgraph import web_edge_ds
    from neo4j_graph_algorithms_ray.sources.pages import (BASE_TS_US,
                                                          pages_path)
    from neo4j_graph_algorithms_ray.util import (join_partitions,
                                                 preagg_sum,
                                                 read_parquet_clean,
                                                 round6, safe_join)
    pages = read_parquet_clean(pages_path(sf_dir),
                               columns=["url", "warc_ts"])
    n = pages.count()
    cutoff_us = BASE_TS_US + ((3 * n) // 5) * 1_000_000

    def crawled_only(b: pa.Table) -> pa.Table:
        ts = b["warc_ts"].cast(pa.timestamp("us")).cast(pa.int64())
        return b.filter(pc.less(ts, cutoff_us)).select(["url"])

    crawled = pages.map_batches(crawled_only, batch_format="pyarrow") \
        .materialize()
    nparts = join_partitions(8)
    ce = safe_join(web_edge_ds(sf_dir),
                   crawled.rename_columns({"url": "src_url"}),
                   "inner", nparts, on=("src_url",)).materialize()
    outdeg = preagg_sum(
        ce.map_batches(
            lambda b: pa.table({
                "src_url": b["src_url"],
                "__c": pa.array(np.ones(b.num_rows, np.int64))}),
            batch_format="pyarrow"), ["src_url"], "__c")
    contrib = safe_join(ce, outdeg, "inner", nparts, on=("src_url",)) \
        .map_batches(
            lambda b: pa.table({
                "url": b["dst_url"],
                "__s": pc.divide(pa.array(np.ones(b.num_rows, np.float64)),
                                 b["__c"].cast(pa.float64()))}),
            batch_format="pyarrow")
    score = preagg_sum(contrib, ["url"], "__s")
    # frontier only: drop targets already crawled (left-anti shape)
    mark = crawled.map_batches(
        lambda b: b.append_column(
            "__m", pa.array(np.ones(b.num_rows, np.int8))),
        batch_format="pyarrow")
    frontier = safe_join(score, mark, "left_outer", nparts, on=("url",)) \
        .map_batches(
            lambda b: pa.table({
                "url": b.filter(pc.is_null(b["__m"]))["url"],
                "score": pa.array(round6(
                    b.filter(pc.is_null(b["__m"]))["__s"]
                    .to_numpy(zero_copy_only=False)))}),
            batch_format="pyarrow")
    return frontier.sort("url").materialize()


def _q_url_templates(sf_dir: str):
    """URL path-template mining over the pages table
    (functions/urls.url_templates): digit runs in the path collapse to
    '{n}', count per template."""
    from neo4j_graph_algorithms_ray.functions.urls import url_templates
    from neo4j_graph_algorithms_ray.sources.pages import read_pages
    return url_templates(read_pages(sf_dir, columns=["url"])) \
        .sort("template")


def _q_canonical_dedup(sf_dir: str):
    """Crawl-snapshot compaction: decorate every page with pid%3+1
    captures (original / +tracking-params / +trailing-slash, one day
    apart), canonicalize (functions/urls.normalize_urls), and keep the
    LATEST capture per canonical url (functions/urls.canonical_latest).
    The oracle derives captures, canonical keys and winners
    analytically from the same case split."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from neo4j_graph_algorithms_ray.functions.urls import canonical_latest
    from neo4j_graph_algorithms_ray.sources.pages import read_pages

    DAY_US = 86_400_000_000

    def decorate(b: pa.Table) -> pa.Table:
        urls = b["url"].cast(pa.string())
        pid = pc.cast(pc.struct_field(
            pc.extract_regex(urls, r"/page/(?P<pid>\d+)$"), "pid"),
            pa.int64()).to_numpy(zero_copy_only=False)
        ts = b["warc_ts"].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        u = np.asarray(urls.to_pylist(), dtype=object)
        nv = pid % 3 + 1  # captures per page
        idx = np.repeat(np.arange(len(u)), nv)
        v = np.arange(int(nv.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(nv) - nv, nv)
        base = u[idx]
        messy = base.copy()
        messy[v == 1] = base[v == 1] + "?utm_source=feed&ref=rss"
        messy[v == 2] = base[v == 2] + "/"
        return pa.table({
            "url": pa.array(messy, pa.string()),
            "ts_us": pa.array(ts[idx] + v * DAY_US)})

    caps = read_pages(sf_dir, columns=["url", "warc_ts"]) \
        .map_batches(decorate, batch_format="pyarrow")
    return canonical_latest(caps).sort("url_canon").materialize()


def _q_degree_percentiles(sf_dir: str):
    """Exact out-degree percentiles (p50/p90/p99/p100) of the web
    graph via the degree HISTOGRAM (inverse CDF, lower interpolation):
    the percentile never touches per-node rows on the driver — only
    the |distinct degrees| histogram does."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    ds = _q_web_degrees(sf_dir)  # (url, out_degree) incl. zeros
    from neo4j_graph_algorithms_ray.util import preagg_sum

    def ones(b: pa.Table) -> pa.Table:
        return pa.table({"deg": b["out_degree"],
                         "c": pa.array(np.ones(b.num_rows, np.int64))})

    hist = preagg_sum(ds.map_batches(ones, batch_format="pyarrow"),
                      ["deg"], "c").take_all()
    deg = np.array([r["deg"] for r in hist], dtype=np.int64)
    cnt = np.array([r["c"] for r in hist], dtype=np.int64)
    order = np.argsort(deg)
    deg, cnt = deg[order], cnt[order]
    cum = np.cumsum(cnt)
    n = int(cum[-1]) if len(cum) else 0
    rows = []
    for p in (50, 90, 99, 100):
        target = int(np.ceil(p * n / 100.0))
        idx = int(np.searchsorted(cum, target))
        rows.append((p, int(deg[idx]) if n else 0))
    return pd.DataFrame(rows, columns=["pct", "degree"]).astype(
        {"pct": "int64", "degree": "int64"})


def _q_ranked_anchor_report(sf_dir: str):
    """Search-quality report: the top-20 pages by PageRank, each with
    its dominant anchor text — what the link graph 'calls' its most
    authoritative pages. Composition: rank top-k ⋈ anchor top-1."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from neo4j_graph_algorithms_ray.util import safe_join, to_arrow_blocks
    topk = _q_web_pagerank_topk(sf_dir)
    ta = to_arrow_blocks(_q_top_anchor_per_page(sf_dir)) \
        .rename_columns({"dst_url": "__t"})
    j = safe_join(topk, ta, "left_outer", 8, on=("url",),
                  right_on=("__t",))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "url": b["url"], "score": b["score"],
            "anchor": pc.coalesce(b["anchor"], pa.scalar("", pa.string())),
            "n_anchor": pc.coalesce(pc.cast(b["n"], pa.int64()),
                                    pa.scalar(0, pa.int64()))})

    return to_arrow_blocks(j).map_batches(finish, batch_format="pyarrow") \
        .sort(["score", "url"], descending=[True, False])


def _q_host_hits(sf_dir: str):
    """HITS hub/authority over the coarsened host graph — domain-level
    portal vs authority separation."""
    from neo4j_graph_algorithms_ray.algorithms.hits import hits
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_host_graph
    g = get_host_graph(sf_dir)
    res = hits(g, max_iterations=PR_ITERS, node_col="host")
    out = _round6(res.dataset, "hub")
    return _round6(out, "authority")


def _q_window_anomaly(sf_dir: str):
    """Event-rate anomaly flags: tumbling-window counts z-scored
    against the all-windows mean/std (events.window_anomaly)."""
    from neo4j_graph_algorithms_ray.functions.events import window_anomaly
    return window_anomaly(_events(sf_dir), window_s=EVENT_WINDOW_S, z_threshold=2.0)


def _q_latest_event_per_user(sf_dir: str):
    """Last-write-wins compaction: per user the most recent event row
    (events.latest_event_per_user) — the CDC/upsert primitive."""
    from neo4j_graph_algorithms_ray.functions.events import \
        latest_event_per_user
    return latest_event_per_user(_events(sf_dir))


def _q_event_transitions(sf_dir: str):
    """First-order Markov transition counts over each user's
    time-ordered event stream (events.event_transitions) — exact LAG
    SQL oracle."""
    from neo4j_graph_algorithms_ray.functions.events import \
        event_transitions
    return event_transitions(_events(sf_dir))


def _q_window_topk_types(sf_dir: str):
    """Top-3 event types per tumbling window
    (events.window_topk_types)."""
    from neo4j_graph_algorithms_ray.functions.events import window_topk_types
    return window_topk_types(_events(sf_dir), window_s=EVENT_WINDOW_S, k=3)


def _q_hopping_agg(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.events import hopping_aggregate
    ds = hopping_aggregate(_events(sf_dir), window_s=EVENT_WINDOW_S,
                           hop_s=EVENT_WINDOW_S // 4)
    return _round6(ds, "sum_value")


def _q_sessionize(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.events import sessionize
    return sessionize(_events(sf_dir), gap_s=EVENT_GAP_S)


def _q_session_stats(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.events import session_stats
    return session_stats(_events(sf_dir), gap_s=EVENT_GAP_S)


def _q_asof_purchase(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.events import asof_join
    ev = _events(sf_dir)
    left = ev.select_columns(["event_id", "user_id", "ts"])
    purchases = ev.filter(expr="event_type == 'purchase'") \
        .select_columns(["user_id", "ts", "event_id"])
    out = asof_join(left, purchases, on="user_id", left_time="ts",
                    right_cols=["event_id"], strict=True, fill_value=-1)
    import pyarrow as pa

    def fin(b: pa.Table) -> pa.Table:
        # Dataset.rename_columns assumes arrow blocks; map_groups emits
        # pandas blocks, so rename inside an arrow map_batches instead
        return b.rename_columns(["event_id", "user_id", "prev_purchase_id"])

    return out.select_columns(["event_id", "user_id", "event_id_r"]) \
        .map_batches(fin, batch_format="pyarrow")


# ---------------- documents / embeddings pipeline queries ----------------

def _docs(sf_dir: str):
    import ray.data as rd
    from neo4j_graph_algorithms_ray.util import read_parquet_clean
    return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def _docs_full(sf_dir: str):
    from neo4j_graph_algorithms_ray.util import read_parquet_clean
    return read_parquet_clean(f"{sf_dir}/documents.parquet")


def _emb(sf_dir: str):
    import ray.data as rd
    from neo4j_graph_algorithms_ray.util import read_parquet_clean
    return read_parquet_clean(f"{sf_dir}/embeddings.parquet")


def _q_funnel(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.events import funnel
    from neo4j_graph_algorithms_ray.util import read_parquet_clean
    ev = read_parquet_clean(f"{sf_dir}/events.parquet")
    return funnel(ev, ["view", "click", "purchase"], within_s=86400)


def _q_retention(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.events import retention_cohorts
    from neo4j_graph_algorithms_ray.util import read_parquet_clean
    ev = read_parquet_clean(f"{sf_dir}/events.parquet")
    return retention_cohorts(ev, bucket_s=604800)


def _q_exact_dedup(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.dedup import exact_dedup
    return exact_dedup(_docs(sf_dir))


def _q_token_count(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.text import TokenCount
    return _docs(sf_dir).map_batches(TokenCount(), batch_format="pyarrow",
                                     batch_size=4096)


def _q_char_entropy(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.text import CharEntropy
    return _docs(sf_dir).map_batches(CharEntropy(), batch_format="pyarrow",
                                     batch_size=4096)


def _q_lexical_diversity(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.text import lexical_diversity
    return lexical_diversity(_docs(sf_dir))


def _q_sentence_stats(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.text import sentence_stats
    return sentence_stats(_docs(sf_dir))


def _q_slice_kl(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.text import slice_kl
    from neo4j_graph_algorithms_ray.util import read_parquet_clean
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "lang", "text"])
    return slice_kl(docs, group_col="lang")


def _q_dup_ngram_frac(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.text import dup_ngram_frac
    return dup_ngram_frac(_docs(sf_dir), k=5, min_docs=2)


def _q_winnow_fingerprints(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.text import winnow_fingerprints
    return winnow_fingerprints(_docs(sf_dir), k=8, w=4)


def _q_dsir_weights(sf_dir: str):
    """DSIR importance weights vs a deterministic curated slice
    (doc_id % 10 == 0 stands in for the target corpus)."""
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.functions.text import dsir_weights
    docs = _docs(sf_dir)

    def tgt(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % 10 == 0))

    target = docs.map_batches(tgt, batch_format="pyarrow")
    return dsir_weights(docs, target, buckets=1024)


def _q_quality(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.text import QualityScore
    return _docs(sf_dir).map_batches(QualityScore(), batch_format="pyarrow",
                                     batch_size=4096)


def _q_langid(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.text import LangId
    return _docs(sf_dir).map_batches(LangId(), batch_format="pyarrow",
                                     batch_size=4096)


def _q_fingerprint(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.text import Fingerprint
    return _docs(sf_dir).map_batches(Fingerprint(), batch_format="pyarrow",
                                     batch_size=4096)


def _q_gopher_quality(sf_dir: str):
    """Gopher rule-based quality filter (Rae et al. 2021 §A1.1) signals
    + passes flag; thresholds chosen so the synthetic corpus SPLITS on
    n_words and stop_hits (defaults would fail every doc)."""
    from neo4j_graph_algorithms_ray.functions.text import GopherQuality
    return _docs(sf_dir).map_batches(
        GopherQuality(min_words=40, min_stop_hits=1),
        batch_format="pyarrow", batch_size=4096)


def _q_vocab_topk(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.text import vocab_topk
    return vocab_topk(_docs(sf_dir), topk=100)


def _q_cms_tokens(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.sketches import cms_table
    return cms_table(_docs(sf_dir))


def _q_bloom_urls(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.sketches import bloom_bits
    from neo4j_graph_algorithms_ray.sources.pages import read_pages
    return bloom_bits(read_pages(sf_dir, columns=["url"]), "url")


def _q_bigram_topk(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.text import ngram_topk
    return ngram_topk(_docs(sf_dir), n=2, topk=100)


def _q_hash_features(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.text import hash_features
    return hash_features(_docs(sf_dir), dims=256)


def _q_pmi_topk(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.text import pmi_topk
    return pmi_topk(_docs(sf_dir), topk=50, min_count=5)


def _q_length_percentiles(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.text import column_percentiles
    return column_percentiles(_docs_full(sf_dir), "n_chars")


def _q_degree_histogram(sf_dir: str):
    from neo4j_graph_algorithms_ray.algorithms.common import get_engine
    from neo4j_graph_algorithms_ray.functions.text import column_histogram
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_web_graph
    g = get_web_graph(sf_dir)
    deg = get_engine(g, None).degrees_dataset()
    return column_histogram(deg, "degree", width=1.0) \
        .rename_columns({"bucket": "degree"})


def _q_hll_registers(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.sketches import hll_registers
    return hll_registers(_docs(sf_dir))


def _q_doc_sample(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.text import doc_sample
    return doc_sample(_docs_full(sf_dir), pct=20)


def _q_repetition_ratio(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.text import repetition_ratio
    return repetition_ratio(_docs(sf_dir), k=3)


def _q_decontaminate(sf_dir: str):
    """Benchmark decontamination: docs sharing a 3-gram with the eval
    subset (doc_id % 97 == 0 — deterministic stand-in benchmark set)."""
    from neo4j_graph_algorithms_ray.functions.text import decontaminate
    import numpy as _np
    import pyarrow as _pa

    # materialize: ev derivation + probe would otherwise re-execute
    # the read pipeline twice
    docs = _docs(sf_dir).materialize()
    ev = docs.map_batches(
        lambda b: b.filter(_pa.array(
            b["doc_id"].to_numpy(zero_copy_only=False) % 97 == 0)),
        batch_format="pyarrow")
    return decontaminate(docs, ev, k=3, min_overlap=1)


def _q_pii_counts(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.text import pii_counts
    return pii_counts(_docs(sf_dir))


def _q_pq_codes(sf_dir: str):
    """Product-quantization encoding of the embeddings table
    (functions/ann.pq_encode): m=8 subspaces x k=16 centroids → 8
    bytes per 64-dim vector (32x compression), per-vector
    reconstruction error. Rows-only driver check — k-means codebooks
    have no SQL mirror; reconstruction quality and determinism are
    pinned by pytest (test_dedup_ann.test_pq_encode_reconstruction)."""
    from neo4j_graph_algorithms_ray.functions.ann import pq_encode
    return pq_encode(_emb(sf_dir), m=8, k=16)


def _q_pii_redact(sf_dir: str):
    """PII masking over the documents table: typed-token replacement
    (<EMAIL>/<PHONE>/<IP>) + per-doc redaction counts
    (functions/text.pii_redact). Value-hash oracle on the full masked
    TEXT, not just the counts."""
    from neo4j_graph_algorithms_ray.functions.text import pii_redact
    return pii_redact(_docs(sf_dir))


def _q_line_dedup(sf_dir: str):
    """CCNet-style corpus line dedup over deterministically constructed
    multi-line docs (the sf documents are single-line): each doc becomes
    shared-header boilerplate \\n original text [\\n empty line for
    doc_id%5==0] \\n (promo line for doc_id%3==0, else a per-doc unique
    tail). Boilerplate/promo/empty lines are corpus-duplicated → removed
    from every doc; the distinct content + tail lines survive. Oracle:
    LINE_DEDUP_SQL mirrors the construction and the semantics."""
    import numpy as _np
    import pyarrow as _pa
    import pyarrow.compute as _pc

    from neo4j_graph_algorithms_ray.functions.text import line_dedup

    def build(b: _pa.Table) -> _pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        base = _pc.fill_null(b["text"].cast(_pa.string()), "") \
            .to_numpy(zero_copy_only=False).astype(object)
        tails = _np.where(ids % 3 == 0, "PROMO OFFER CLICK HERE",
                          _np.char.add("tail-", ids.astype(str)).astype(object))
        extra = _np.where(ids % 5 == 0, "\n", "").astype(object)
        txt = "SHARED HEADER BOILERPLATE\n" + base + extra + "\n" + tails
        return _pa.table({"doc_id": b["doc_id"],
                          "text": _pa.array(txt, _pa.string())})

    docs = _docs(sf_dir).map_batches(build, batch_format="pyarrow")
    return line_dedup(docs, min_count=2)


def _q_boilerplate_strip(sf_dir: str):
    """Within-source boilerplate stripping over deterministically
    constructed multi-line docs: every doc of a source shares a NAV
    line (frac 1.0 → stripped), doc_id%4==0 docs share a per-source
    COPYRIGHT footer (stripped where its within-source count clears
    max(2, ceil(0.2·group docs))), tails are unique (kept), and the
    MIRROR SYNC LINE (doc_id%25==0) is corpus-common but rare within
    each source so it SURVIVES — the per-group semantics that
    corpus-global line_dedup cannot express. Oracle:
    BOILERPLATE_STRIP_SQL mirrors construction and threshold."""
    import numpy as _np
    import pyarrow as _pa
    import pyarrow.compute as _pc

    from neo4j_graph_algorithms_ray.functions.text import boilerplate_strip

    def build(b: _pa.Table) -> _pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        src = b["source"].to_numpy(zero_copy_only=False).astype(object)
        base = _pc.fill_null(b["text"].cast(_pa.string()), "") \
            .to_numpy(zero_copy_only=False).astype(object)
        nav = "NAV " + src + " HOME ABOUT\n"
        tails = _np.where(ids % 4 == 0,
                          "COPYRIGHT " + src + " FOOTER",
                          _np.char.add("tail-", ids.astype(str)).astype(object))
        sync = _np.where(ids % 25 == 0, "\nMIRROR SYNC LINE", "").astype(object)
        txt = nav + base + "\n" + tails + sync
        return _pa.table({"doc_id": b["doc_id"],
                          "source": b["source"],
                          "text": _pa.array(txt, _pa.string())})

    from neo4j_graph_algorithms_ray.util import read_parquet_clean
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text", "source"]) \
        .map_batches(build, batch_format="pyarrow")
    return boilerplate_strip(docs, frac=0.2, min_docs=2)


def _q_incremental_dedup(sf_dir: str):
    """Cross-snapshot dedup: corpus split by doc_id%3 into old (!=0) /
    new (==0) snapshots with planted 'DUP CONTENT <doc_id%50>' overlap;
    new docs whose normalized-text fingerprint exists in the old
    snapshot are dropped. The Ray path Bloom-prefilters (16 bits/key)
    and exact-verifies; oracle: INCREMENTAL_DEDUP_SQL is the plain
    anti-join — identical output by construction."""
    import numpy as _np
    import pyarrow as _pa
    import pyarrow.compute as _pc

    from neo4j_graph_algorithms_ray.functions.dedup import incremental_dedup

    def build(b: _pa.Table) -> _pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        base = _pc.fill_null(b["text"].cast(_pa.string()), "") \
            .to_numpy(zero_copy_only=False).astype(object)
        dup = _np.char.add("DUP CONTENT ", (ids % 50).astype(str)).astype(object)
        txt = _np.where((ids % 15 == 0) | ((ids % 3 != 0) & (ids % 5 == 0)),
                        dup, base)
        return _pa.table({"doc_id": b["doc_id"],
                          "text": _pa.array(txt, _pa.string()),
                          "snap": _pa.array((ids % 3 == 0).astype("int8"))})

    docs = _docs(sf_dir).map_batches(build, batch_format="pyarrow")
    new = docs.filter(expr="snap == 1").select_columns(["doc_id", "text"])
    old = docs.filter(expr="snap == 0").select_columns(["doc_id", "text"])
    return incremental_dedup(new, old)


def _q_balanced_partition(sf_dir: str):
    """Balanced label-propagation partitioning (Ugander & Backstrom
    WSDM'13) of the web link graph: locality-maximizing part
    assignment under a ceil(n/P*(1+slack)) balance cap — the layout
    optimization that cuts every BSP algorithm's exchange volume.
    Deterministic (md5 priorities, swap+fill quotas); rows-only driver
    check (iterative LP-relaxation semantics have no SQL equivalent;
    pytest pins determinism, balance invariant, and locality gain)."""
    from neo4j_graph_algorithms_ray.algorithms.partition import balanced_partition
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_web_graph
    g = get_web_graph(sf_dir)
    return balanced_partition(g, num_parts=8, max_iterations=5,
                              node_col="url").dataset


def _q_corpus_clean(sf_dir: str):
    """End-to-end corpus cleaning (language+quality gate → corpus line
    dedup → exact collapse) over the line_dedup multi-line construction
    plus doc_id%7∈{1,2} "paired" docs whose cleaned text is identical
    within each pair — their content/tail lines occur exactly twice,
    below line_min_count=3, so they survive line dedup and exercise the
    exact-collapse stage. Oracle: corpus_clean_sql mirrors everything."""
    import numpy as _np
    import pyarrow as _pa
    import pyarrow.compute as _pc

    from neo4j_graph_algorithms_ray.functions.text import corpus_clean

    def build(b: _pa.Table) -> _pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        base = _pc.fill_null(b["text"].cast(_pa.string()), "") \
            .to_numpy(zero_copy_only=False).astype(object)
        tails = _np.where(ids % 3 == 0, "PROMO OFFER CLICK HERE",
                          _np.char.add("tail-", ids.astype(str)).astype(object))
        extra = _np.where(ids % 5 == 0, "\n", "").astype(object)
        normal = "SHARED HEADER BOILERPLATE\n" + base + extra + "\n" + tails
        k = (ids // 7).astype(str)
        paired = _np.char.add(
            _np.char.add("SHARED HEADER BOILERPLATE\nTHE PAIRED CONTENT BLOCK ", k),
            _np.char.add("\ntail-pair-", k)).astype(object)
        txt = _np.where(_np.isin(ids % 7, (1, 2)), paired, normal)
        return _pa.table({"doc_id": b["doc_id"],
                          "text": _pa.array(txt, _pa.string())})

    docs = _docs(sf_dir).map_batches(build, batch_format="pyarrow")
    return corpus_clean(docs, langs=("en",), min_tokens=8,
                        min_stopword_ratio=0.0, line_min_count=3)


def _q_tfidf_topk(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.text import tfidf_topk
    return tfidf_topk(_docs(sf_dir), topk=3)


BM25_TERMS = ("spark", "merge", "window")


def _q_bm25_topk(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.text import bm25_topk
    return bm25_topk(_docs(sf_dir), BM25_TERMS, topk=25)


def _q_span_dedup(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.text import span_dedup
    return span_dedup(_docs(sf_dir), k=5, min_count=2)


def _q_bigram_xent(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.text import bigram_xent
    return bigram_xent(_docs(sf_dir), min_count=2)


def _q_trigram_xent(sf_dir: str):
    """Trigram stupid-backoff LM cross-entropy (Brants et al. 2007)
    self-trained on the corpus. Oracle: trigram_xent_sql mirrors fold,
    backoff chain, and alpha."""
    from neo4j_graph_algorithms_ray.functions.text import trigram_xent
    return trigram_xent(_docs(sf_dir), min_count=2)


def _q_stratified_sample(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.text import stratified_sample
    from neo4j_graph_algorithms_ray.util import read_parquet_clean
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "lang"])
    return stratified_sample(docs, key_col="lang", per_group=50)


def _q_inverted_index(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.text import inverted_index
    return inverted_index(_docs(sf_dir), min_df=2)


def _q_doc_length_histogram(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.text import column_histogram
    from neo4j_graph_algorithms_ray.util import read_parquet_clean
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "n_chars"])
    return column_histogram(docs, "n_chars", width=100)


def _q_mixture_weights(sf_dir: str):
    """α=0.5 exponent-smoothed language mixing weights (XLM-R rule)."""
    from neo4j_graph_algorithms_ray.functions.text import mixture_weights
    return mixture_weights(_docs_full(sf_dir), group_col="lang")


def _q_weighted_sample(sf_dir: str):
    """Deterministic weighted-priority sample ∝ n_chars (the
    quality/length-weighted subsampling primitive)."""
    from neo4j_graph_algorithms_ray.functions.text import weighted_sample
    from neo4j_graph_algorithms_ray.util import read_parquet_clean
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "n_chars"])
    return weighted_sample(docs, k=50, weight_col="n_chars")


def _q_gopher_repetition(sf_dir: str):
    """Gopher within-doc repetition signals (dup lines, top bigram)."""
    from neo4j_graph_algorithms_ray.functions.text import gopher_repetition
    return gopher_repetition(_docs(sf_dir))


def _q_chunk_documents(sf_dir: str):
    """Fixed-token training-window chunking with overlap (stride 112)."""
    from neo4j_graph_algorithms_ray.functions.text import chunk_documents
    return chunk_documents(_docs(sf_dir), chunk_tokens=128, overlap=16)


def _q_pack_sequences(sf_dir: str):
    """GPT-style concat-and-split packing layout via distributed
    prefix sum (per-block subtotals → driver offsets → in-place stamp)."""
    from neo4j_graph_algorithms_ray.functions.text import pack_sequences
    return pack_sequences(_docs(sf_dir), seq_tokens=1024)


def _q_nb_quality(sf_dir: str):
    """Self-distilled NB quality classifier (GPT-3 §A / CCNet recipe):
    rule-label → train multinomial NB on the corpus → score log-odds.
    Thresholds match gopher_quality's so the synthetic corpus splits."""
    from neo4j_graph_algorithms_ray.functions.text import nb_quality_score
    return nb_quality_score(_docs(sf_dir), min_words=40, min_stop_hits=1)


def _q_ngram_jaccard(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.dedup import ngram_jaccard_pairs
    return _empty_safe(ngram_jaccard_pairs(_docs(sf_dir), k=3, threshold=0.5))


def _q_minhash_pairs(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.dedup import minhash_lsh_pairs
    return _empty_safe(minhash_lsh_pairs(_docs(sf_dir), num_perm=8, bands=4,
                                         threshold=0.5))


def _q_ngram_containment(sf_dir: str):
    """Directional containment near-dup pairs (quote/superset
    detection, Broder 1997). threshold=0.5 so the synthetic corpus
    emits both full near-dups and asymmetric subset hits."""
    from neo4j_graph_algorithms_ray.functions.dedup import (
        ngram_containment_pairs)
    return _empty_safe(ngram_containment_pairs(_docs(sf_dir), k=3,
                                               threshold=0.5))


def _q_neardup_clusters(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.dedup import neardup_clusters
    return neardup_clusters(_docs(sf_dir), num_perm=8, bands=4, threshold=0.5)


def _q_simhash_pairs(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.dedup import simhash_pairs
    return _empty_safe(simhash_pairs(_docs(sf_dir), max_hamming=8))


def _q_simhash_clusters(sf_dir: str):
    """Near-dup cluster resolution over the SimHash pair set — the
    same pairs → WCC closure → min-id representative composition as
    neardup_clusters, fed by the hamming-verified SimHash candidates
    (dedup.neardup_clusters accepts any pair Dataset)."""
    from neo4j_graph_algorithms_ray.functions.dedup import (
        neardup_clusters, simhash_pairs)
    docs = _docs(sf_dir)
    return neardup_clusters(docs, pairs=simhash_pairs(docs, max_hamming=8))


def _q_emb_neardup(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.dedup import embedding_neardup_pairs
    return _empty_safe(embedding_neardup_pairs(_emb(sf_dir), threshold=0.95))


def _q_semantic_dedup(sf_dir: str):
    """SemDeDup-style embedding dedup. ncells=1 makes the run
    SQL-expressible (all-pairs cosine + recursive closure oracle); the
    k-means bucketing path is pinned by pytest
    (test_semantic_dedup_bucketed_keeps_blob_dups). threshold=0.5 sits
    between the corpus's top two cosine pairs (0.513 / 0.493), so the
    output has a real collapse with a wide float-precision margin."""
    from neo4j_graph_algorithms_ray.functions.ann import semantic_dedup
    return semantic_dedup(_emb(sf_dir), ncells=1, threshold=0.5)


SEMANTIC_DEDUP_SQL = """WITH RECURSIVE pairs AS (
  SELECT e1.vec_id AS a, e2.vec_id AS b
  FROM embeddings e1 JOIN embeddings e2 ON e1.vec_id < e2.vec_id
  WHERE list_cosine_similarity(e1.embedding, e2.embedding) >= 0.5),
edges AS (SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs),
reach(id, r) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT e.b, r.r FROM reach r JOIN edges e ON e.a = r.id)
SELECT id AS vec_id, min(r) AS rep_id, min(r) = id AS keep
FROM reach GROUP BY id ORDER BY vec_id"""


def _ann_queries(sf_dir: str):
    import numpy as np
    q = _emb(sf_dir).sort("vec_id").limit(5).take_all()
    ids = np.array([r["vec_id"] for r in q], dtype=np.int64)
    vecs = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in q])
    return vecs, ids


def _q_ann_topk(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.ann import brute_force_topk
    vecs, ids = _ann_queries(sf_dir)
    return brute_force_topk(_emb(sf_dir), vecs, ids, k=10)


def _q_ann_lsh_topk(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.ann import lsh_topk
    vecs, ids = _ann_queries(sf_dir)
    return lsh_topk(_emb(sf_dir), vecs, ids, k=10)


def _q_ann_ivf_topk(sf_dir: str):
    # nprobe == ncells → exhaustive probe, so the result is EXACT and
    # shares the brute-force SQL oracle while driving the full IVF
    # machinery (k-means training, cell assignment, probe masking).
    # Sampled-probe (nprobe < ncells) recall is pinned in pytest — the
    # k-means training itself is not SQL-expressible.
    from neo4j_graph_algorithms_ray.functions.ann import ivf_topk
    vecs, ids = _ann_queries(sf_dir)
    return ivf_topk(_emb(sf_dir), vecs, ids, k=10, ncells=16, nprobe=16)


def _q_knn_graph(sf_dir: str):
    """Exact cosine k-NN graph over the embeddings table — the
    vector→graph bridge (feed to build_graph + any graph algorithm)."""
    from neo4j_graph_algorithms_ray.functions.ann import knn_graph
    return knn_graph(_emb(sf_dir), k=5)


def _q_embedding_clusters(sf_dir: str):
    """Composed pipeline: exact knn graph (k=3, cosine ≥ 0.2) →
    undirected CSR → BSP WCC → (vec_id, component=min reachable id).
    Embedding-space clustering expressed as graph connectivity — the
    two halves of the engine in one query."""
    from neo4j_graph_algorithms_ray.algorithms import wcc
    from neo4j_graph_algorithms_ray.algorithms.common import translate_vid_columns
    from neo4j_graph_algorithms_ray.functions.ann import knn_graph
    from neo4j_graph_algorithms_ray.graph import build_graph
    edges = knn_graph(_emb(sf_dir), k=3, threshold=0.2) \
        .select_columns(["src", "dst"])
    verts = _emb(sf_dir).select_columns(["vec_id"]) \
        .rename_columns({"vec_id": "node"})
    g = build_graph(edges, undirected=True, dedup=True, extra_vertices=verts,
                    name=f"knn3-{sf_dir.rstrip('/').rsplit('/', 1)[-1]}")
    res = wcc(g)
    out = translate_vid_columns(g, res.dataset, ["component"])
    return out.rename_columns({"node": "vec_id"}).sort("vec_id")


def _q_kmeans_clusters(sf_dir: str):
    # no SQL oracle: iterative k-means training is not SQL-expressible
    # (rows-only check; determinism + blob-separation pinned in pytest)
    from neo4j_graph_algorithms_ray.functions.ann import kmeans_clusters
    return kmeans_clusters(_emb(sf_dir), ncells=8)


def _q_cluster_sample(sf_dir: str):
    # no SQL oracle: derived from k-means clusters (see above)
    from neo4j_graph_algorithms_ray.functions.ann import cluster_balanced_sample
    return cluster_balanced_sample(_emb(sf_dir), per_cluster=5, ncells=8)


def _q_media(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.multimodal import media_pipeline
    out = media_pipeline(_docs(sf_dir))
    return out.select_columns(["doc_id", "n_bytes", "first_byte"])


# ---------------- web-pages pipeline (the north-star flagship) ----------------

def _q_page_text(sf_dir: str):
    from neo4j_graph_algorithms_ray.pipelines.webgraph import extracted_text_ds
    return extracted_text_ds(sf_dir).select_columns(["url", "text"])


def _q_page_meta(sf_dir: str):
    """Per-page metadata extraction: <title>, first <h1>, raw href
    count — the page-descriptor stage (title dedup / snippets /
    quality rules). Oracle: PAGE_META_SQL reconstructs all three from
    the deterministic page template."""
    from neo4j_graph_algorithms_ray.pipelines.webgraph import page_meta_ds
    return page_meta_ds(sf_dir)


def _q_page_links(sf_dir: str):
    from neo4j_graph_algorithms_ray.pipelines.webgraph import web_edge_ds
    return web_edge_ds(sf_dir)


def _q_page_links_tolerant(sf_dir: str):
    """Real-crawl HTML robustness, end to end: every page's anchors are
    deterministically rewritten into one of four quoting/case/spacing
    variants (messify_pages), then the TOLERANT extractor
    (stages/extract.py, single/unquoted hrefs, case-insensitive tags,
    base-href resolution) must recover the canonical edge set exactly —
    the oracle is the same PAGE_LINKS_SQL as page_links."""
    from neo4j_graph_algorithms_ray.pipelines.webgraph import web_edge_ds_tolerant
    return web_edge_ds_tolerant(sf_dir)


def _q_web_degrees(sf_dir: str):
    from neo4j_graph_algorithms_ray.algorithms.common import attach_node_ids, get_engine
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_web_graph
    g = get_web_graph(sf_dir)
    ds = get_engine(g, None).degrees_dataset() \
        .rename_columns({"degree": "out_degree"})
    return attach_node_ids(g, ds, out_col="url")


def _q_filter_report(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.text import filter_report
    return filter_report(_docs(sf_dir))


def _q_corpus_token_budget(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.text import corpus_token_budget
    from neo4j_graph_algorithms_ray.util import read_parquet_clean
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["source", "text"])
    return corpus_token_budget(docs, group_col="source")


def _q_lang_length_percentiles(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.text import grouped_percentiles
    from neo4j_graph_algorithms_ray.util import read_parquet_clean
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["lang", "n_chars"])
    return grouped_percentiles(docs, "n_chars", "lang")


def _q_induced_subgraph(sf_dir: str):
    """Deterministic sampled subgraph extraction: keep pages whose
    md5(url)[:15] % 10 < 2 (the repo-standard hash sample) and emit the
    induced edge list — the debug-at-1%-scale primitive for a 10^12-edge
    graph. Batch-local filter on both endpoints; no shuffle."""
    import numpy as np
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.functions.dedup import _md5_u64
    from neo4j_graph_algorithms_ray.pipelines.webgraph import web_edge_ds

    def keep(b: pa.Table) -> pa.Table:
        sv, si = _md5_u64(np.asarray(
            b["src_url"].to_numpy(zero_copy_only=False), dtype=object), 15)
        dv, di = _md5_u64(np.asarray(
            b["dst_url"].to_numpy(zero_copy_only=False), dtype=object), 15)
        m = ((sv[si] % 10) < 2) & ((dv[di] % 10) < 2)
        return b.filter(pa.array(m))

    return web_edge_ds(sf_dir).map_batches(keep, batch_format="pyarrow") \
        .sort(["src_url", "dst_url"])


def _q_url_depth_stats(sf_dir: str):
    """URL path-depth histogram over the crawl: depth = number of path
    segments after the host, (depth, n_pages) — the crawl-frontier
    shape metric. Vectorized split-count per batch + count combine."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from neo4j_graph_algorithms_ray.sources.pages import read_pages
    from neo4j_graph_algorithms_ray.util import preagg_sum

    def depth(b: pa.Table) -> pa.Table:
        # strip scheme://host, count non-empty path segments: each
        # matches "/<non-slash>" once
        path = pc.replace_substring_regex(b["url"], r"^[a-z]+://[^/]*",
                                          "")
        d = pc.count_substring_regex(path, "/[^/]") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"depth": pa.array(d),
                         "n_pages": pa.array(np.ones(len(d), np.int64))})

    pages = read_pages(sf_dir, columns=["url"])
    return preagg_sum(pages.map_batches(depth, batch_format="pyarrow"),
                      ["depth"], "n_pages").sort("depth")


def _q_url_canonical(sf_dir: str):
    """URL canonicalization parity: decorate every page url with a
    deterministic pid%4 mess (tracking params / fragment+tracker /
    uppercased host + default port / trailing slash), then run
    functions/urls.normalize_urls — the oracle derives the expected
    canonical form analytically from the same case split."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from neo4j_graph_algorithms_ray.functions.urls import normalize_urls
    from neo4j_graph_algorithms_ray.sources.pages import read_pages

    def mk(b: pa.Table) -> pa.Table:
        u = b["url"].cast(pa.string())
        if isinstance(u, pa.ChunkedArray):
            u = u.combine_chunks()
        pid = pc.cast(pc.struct_field(
            pc.extract_regex(u, r"page/(?P<pid>[0-9]+)$"), "pid"), pa.int64())
        pid_s = pc.cast(pid, pa.string())
        case = pc.bit_wise_and(pid, 3)
        head = pc.struct_field(
            pc.extract_regex(u, r"(?P<h>^[a-z]+://[^/?#]*)"), "h")
        rest = pc.replace_substring_regex(
            u, pattern=r"^[a-z]+://[^/?#]*", replacement="",
            max_replacements=1)
        j = pc.binary_join_element_wise
        c0 = j(u, "?utm_source=feed&ref=rss", "")
        c1 = j(u, "?id=", pid_s, "&fbclid=abc123#sec2", "")
        c2 = j(pc.utf8_upper(head), ":80", rest, "")
        c3 = j(u, "/", "")
        messy = pc.if_else(pc.equal(case, 0), c0,
                pc.if_else(pc.equal(case, 1), c1,
                pc.if_else(pc.equal(case, 2), c2, c3)))
        return pa.table({"url": u, "url_messy": messy,
                         "url_canon": normalize_urls(messy)})

    return read_pages(sf_dir, columns=["url"]).map_batches(
        mk, batch_format="pyarrow")


def _q_effective_diameter(sf_dir: str):
    """Distance-distribution summary (effective diameter at the 90th
    pair percentile) over the coarsened host graph — exact MSBFS
    regime; ANF is the sketch path at page scale."""
    from neo4j_graph_algorithms_ray.algorithms.msbfs import \
        effective_diameter
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_host_graph
    return effective_diameter(get_host_graph(sf_dir), percentile=0.9)


def _q_heavy_hitter_hosts(sf_dir: str):
    """Exact top-20 hosts by inbound page links via the two-pass
    Misra-Gries heavy-hitter pattern (sketch candidates + exact
    recount) — the frequent-items primitive for key spaces too large
    to groupby raw."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from neo4j_graph_algorithms_ray.functions.sketches import heavy_hitters
    from neo4j_graph_algorithms_ray.pipelines.webgraph import (HOST_RE,
                                                               web_edge_ds)

    def to_host(b: pa.Table) -> pa.Table:
        h = pc.struct_field(pc.extract_regex(b["dst_url"], HOST_RE), "host")
        return pa.table({"host": h})

    hosts = web_edge_ds(sf_dir).map_batches(to_host, batch_format="pyarrow")
    return heavy_hitters(hosts, "host", k=20, cap=512)


def _q_two_hop_size(sf_dir: str):
    """Distinct ≤2-hop out-neighborhood size per host (friends-of-
    friends / crawl-frontier signal) via a broadcast edge self-join."""
    from neo4j_graph_algorithms_ray.algorithms.neighborhood import \
        two_hop_size
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_host_graph
    return two_hop_size(get_host_graph(sf_dir), node_col="host")


def _q_host_triangles(sf_dir: str):
    """Per-host triangle count + clustering coefficient over the
    undirected host graph — the domain-level community-density signal
    (link farms show as dense host triangles)."""
    from neo4j_graph_algorithms_ray.algorithms import triangle_count
    from neo4j_graph_algorithms_ray.graph import build_graph
    from neo4j_graph_algorithms_ray.pipelines.webgraph import host_edge_ds
    from neo4j_graph_algorithms_ray.registry import GraphCatalog
    name = f"hostgraph_und:{sf_dir}"
    g = GraphCatalog.get(name)
    if g is None:
        edges = host_edge_ds(sf_dir).filter(expr="src_host != dst_host")
        g = build_graph(edges, src_col="src_host", dst_col="dst_host",
                        undirected=True, name=name.replace("/", "_"))
        GraphCatalog.set(name, g)
    per_node, _, _ = triangle_count(g)
    return per_node.rename_columns({"node": "host"})


def _q_host_features(sf_dir: str):
    """ML feature assembly over the host graph: one wide row per host
    (out/in degree, PageRank, triangle count, clustering coefficient)
    — the feature-extraction join a ranking / spam model trains on.
    Composes the existing distributed chains; the degree and rank
    sides attach through left-outer hash joins keyed by host."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import numpy as np

    from neo4j_graph_algorithms_ray.algorithms import pagerank
    from neo4j_graph_algorithms_ray.pipelines.webgraph import (
        get_host_graph, host_edge_ds)
    from neo4j_graph_algorithms_ray.util import (preagg_sum, safe_join,
                                                 to_arrow_blocks)

    g = get_host_graph(sf_dir)
    pr = _round6(pagerank(g, 0.85, max_iterations=PR_ITERS,
                          node_col="host").dataset, "score") \
        .rename_columns({"score": "pagerank"})

    he = host_edge_ds(sf_dir).filter(expr="src_host != dst_host")

    def ones(col, out):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({out: b[col],
                             f"n_{out}": pa.array(
                                 np.ones(b.num_rows, np.int64))})
        return f

    outd = preagg_sum(he.map_batches(ones("src_host", "oh"),
                                     batch_format="pyarrow"),
                      ["oh"], "n_oh")
    ind = preagg_sum(he.map_batches(ones("dst_host", "ih"),
                                    batch_format="pyarrow"),
                     ["ih"], "n_ih")
    tri = _q_host_triangles(sf_dir)  # (host, triangles, coefficient)

    j = safe_join(pr, outd, "left_outer", 8, on=("host",),
                  right_on=("oh",))
    j = safe_join(j, ind, "left_outer", 8, on=("host",),
                  right_on=("ih",))
    j = safe_join(j, tri.rename_columns({"host": "th"}), "left_outer", 8,
                  on=("host",), right_on=("th",))

    def finish(b: pa.Table) -> pa.Table:
        z = pa.scalar(0, pa.int64())
        return pa.table({
            "host": b["host"],
            "out_degree": pc.coalesce(pc.cast(b["n_oh"], pa.int64()), z),
            "in_degree": pc.coalesce(pc.cast(b["n_ih"], pa.int64()), z),
            "pagerank": b["pagerank"],
            "triangles": pc.coalesce(pc.cast(b["triangles"], pa.int64()),
                                     z),
            "clustering": pc.coalesce(b["coefficient"],
                                      pa.scalar(0.0, pa.float64())),
        })

    return to_arrow_blocks(j).map_batches(finish, batch_format="pyarrow")


def _q_host_distinct_outlinks(sf_dir: str):
    """Per-host distinct-outlink-target estimate via a per-group HLL —
    the sketched COUNT(DISTINCT) GROUP BY of crawl budgeting."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from neo4j_graph_algorithms_ray.functions.sketches import \
        grouped_hll_distinct
    from neo4j_graph_algorithms_ray.pipelines.webgraph import (HOST_RE,
                                                               web_edge_ds)

    def to_host(b: pa.Table) -> pa.Table:
        h = pc.struct_field(pc.extract_regex(b["src_url"], HOST_RE), "host")
        return pa.table({"host": h, "dst_url": b["dst_url"]})

    hh = web_edge_ds(sf_dir).map_batches(to_host, batch_format="pyarrow")
    return grouped_hll_distinct(hh, "host", "dst_url")


def _q_embedding_dim_stats(sf_dir: str):
    from neo4j_graph_algorithms_ray.functions.ann import embedding_dim_stats
    return embedding_dim_stats(_emb(sf_dir))


def _q_web_graph_summary(sf_dir: str):
    """One-row link-graph report card: nodes, edges, density, max
    out/in degree, reciprocal-edge fraction — the shape sanity check a
    crawl run prints before anything expensive. Composed from
    map-side-combined degree partials, distributed max aggregates, and
    one self-join for reciprocity; only scalars reach the driver."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.pipelines.webgraph import web_edge_ds
    from neo4j_graph_algorithms_ray.util import (join_partitions,
                                                 preagg_sum, predistinct,
                                                 safe_join)

    e = web_edge_ds(sf_dir).materialize()
    n_edges = e.count()

    def ones(col):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({"node": b[col],
                             "n": pa.array(np.ones(b.num_rows, np.int64))})
        return f

    out_deg = preagg_sum(e.map_batches(ones("src_url"),
                                       batch_format="pyarrow"), ["node"], "n")
    in_deg = preagg_sum(e.map_batches(ones("dst_url"),
                                      batch_format="pyarrow"), ["node"], "n")
    max_out = int(out_deg.max("n") or 0)
    max_in = int(in_deg.max("n") or 0)
    n_nodes = predistinct(
        e.select_columns(["src_url"]).rename_columns({"src_url": "node"})
        .union(e.select_columns(["dst_url"])
               .rename_columns({"dst_url": "node"})), ["node"]).count()
    rev = e.rename_columns({"src_url": "dst_url", "dst_url": "src_url"})
    n_recip = safe_join(e, rev, "inner", join_partitions(8),
                        on=("src_url", "dst_url")).count()
    def _r6(x: float) -> float:  # half-away-from-zero, DuckDB round()
        import math
        return math.floor(abs(x) * 1e6 + 0.5) / 1e6 * (1 if x >= 0 else -1)

    density = _r6(n_edges / max(n_nodes * (n_nodes - 1), 1))
    recip = _r6(n_recip / max(n_edges, 1))
    return pd.DataFrame({
        "n_nodes": [n_nodes], "n_edges": [n_edges],
        "density": [density], "max_out_degree": [max_out],
        "max_in_degree": [max_in], "reciprocity": [recip]})


def _q_mis_hosts(sf_dir: str):
    """Luby maximal independent set over the undirected host graph
    (independent crawl-seed selection) — deterministic md5-priority
    rounds, mirrored exactly by the unrolled SQL oracle."""
    from neo4j_graph_algorithms_ray.algorithms.mis import mis_luby
    from neo4j_graph_algorithms_ray.graph import build_graph
    from neo4j_graph_algorithms_ray.pipelines.webgraph import host_edge_ds
    from neo4j_graph_algorithms_ray.registry import GraphCatalog
    name = f"hostgraph_und:{sf_dir}"
    g = GraphCatalog.get(name)
    if g is None:
        edges = host_edge_ds(sf_dir).filter(expr="src_host != dst_host")
        g = build_graph(edges, src_col="src_host", dst_col="dst_host",
                        undirected=True, name=name.replace("/", "_"))
        GraphCatalog.set(name, g)
    return mis_luby(g, rounds=8, node_col="host")


def _q_web_bowtie(sf_dir: str):
    """Broder et al. bow-tie macro-structure of the page graph: every
    url classified CORE/IN/OUT/TENDRIL/DISCONNECTED relative to the
    giant SCC — the classic crawl-scale link-graph shape report."""
    from neo4j_graph_algorithms_ray.algorithms import bowtie
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_web_graph
    g = get_web_graph(sf_dir)
    return bowtie(g, node_col="url").dataset


def _q_web_powerlaw(sf_dir: str):
    from neo4j_graph_algorithms_ray.algorithms.community_metrics import \
        powerlaw_alpha
    return powerlaw_alpha(_q_web_degrees(sf_dir),
                          degree_col="out_degree", dmin=2)


def _q_web_pagerank(sf_dir: str):
    from neo4j_graph_algorithms_ray.algorithms import pagerank
    from neo4j_graph_algorithms_ray.algorithms.common import attach_node_ids
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_web_graph
    g = get_web_graph(sf_dir)
    res = pagerank(g, 0.85, max_iterations=PR_ITERS, node_col="url")
    return _round6(res.dataset, "score")


def _q_web_pagerank_topk(sf_dir: str):
    ds = _q_web_pagerank(sf_dir)
    return ds.sort(["score", "url"], descending=[True, False]).limit(TOPK)


def _q_web_ppr(sf_dir: str):
    from neo4j_graph_algorithms_ray.algorithms import pagerank
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_web_graph
    from neo4j_graph_algorithms_ray.sources.pages import url_of
    g = get_web_graph(sf_dir)
    res = pagerank(g, 0.85, max_iterations=PR_ITERS, node_col="url",
                   source_nodes=[url_of(0), url_of(1)])
    return _round6(res.dataset, "score")


def _q_web_hits(sf_dir: str):
    from neo4j_graph_algorithms_ray.algorithms.hits import hits
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_web_graph
    g = get_web_graph(sf_dir)
    res = hits(g, max_iterations=PR_ITERS, node_col="url")
    ds = _round6(res.dataset, "hub")
    return _round6(ds, "authority")


def _q_web_eigenvector(sf_dir: str):
    from neo4j_graph_algorithms_ray.algorithms.eigenvector import eigenvector
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_web_graph
    g = get_web_graph(sf_dir)
    res = eigenvector(g, max_iterations=PR_ITERS, node_col="url")
    return _round6(res.dataset, "score")


def _q_web_salsa(sf_dir: str):
    from neo4j_graph_algorithms_ray.algorithms.salsa import salsa
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_web_graph
    g = get_web_graph(sf_dir)
    res = salsa(g, max_iterations=PR_ITERS, node_col="url")
    ds = _round6(res.dataset, "hub")
    return _round6(ds, "authority")


def _q_link_prediction(sf_dir: str):
    from neo4j_graph_algorithms_ray.algorithms.linkpred import \
        link_prediction_topk
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_web_graph
    g = get_web_graph(sf_dir)
    res = link_prediction_topk(g, cap=20, topk=50,
                               col_a="url_a", col_b="url_b")
    return res.dataset


def _q_web_opic(sf_dir: str):
    from neo4j_graph_algorithms_ray.algorithms.opic import opic
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_web_graph
    g = get_web_graph(sf_dir)
    res = opic(g, max_iterations=PR_ITERS, node_col="url")
    return _round6(res.dataset, "score")


def _q_web_pagerank_dangling(sf_dir: str):
    from neo4j_graph_algorithms_ray.algorithms.opic import pagerank_dangling
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_web_graph
    g = get_web_graph(sf_dir)
    res = pagerank_dangling(g, 0.85, max_iterations=PR_ITERS, node_col="url")
    return _round6(res.dataset, "score")


def _q_web_pagerank_resumed(sf_dir: str):
    """Kill-and-resume parity against the straight-run oracle: run the
    first half of the iterations with a checkpoint, then a second call
    restores the rank/delta vectors from the manifest (per-partition
    lineage, state/checkpoint.py) and finishes — the result must
    value-hash-match the same 20-iteration SQL unroll as
    ``web_pagerank``, proving resume-from-checkpoint is exact."""
    import hashlib
    import shutil

    from neo4j_graph_algorithms_ray.algorithms import pagerank
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_web_graph
    g = get_web_graph(sf_dir)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    ck = f"/tmp/nga_ray/ckpt_q/web_pr_{tag}"
    shutil.rmtree(ck, ignore_errors=True)
    half = PR_ITERS // 2
    pagerank(g, 0.85, max_iterations=half, node_col="url",
             checkpoint_dir=ck, checkpoint_every=half)
    res = pagerank(g, 0.85, max_iterations=PR_ITERS, node_col="url",
                   checkpoint_dir=ck, resume=True)
    assert res.iterations == PR_ITERS - half, "resume did not restore"
    return _round6(res.dataset, "score")


def _q_web_pagerank_incremental(sf_dir: str):
    """Incremental-recrawl PageRank: rank the thinned "previous crawl"
    graph cold (20 iterations), then warm-start 10 Jacobi sweeps on
    the full graph from those scores (pagerank_warm streams the prior
    vector into the shard actors; new-crawl nodes cold-init). Mirrors
    the 30-CTE warm-chain SQL unroll."""
    from neo4j_graph_algorithms_ray.algorithms.pagerank import (pagerank,
                                                                pagerank_warm)
    from neo4j_graph_algorithms_ray.pipelines.webgraph import (
        get_web_graph, get_web_graph_thinned)
    g_old = get_web_graph_thinned(sf_dir)
    x0 = pagerank(g_old, 0.85, max_iterations=PR_ITERS).dataset
    g_new = get_web_graph(sf_dir)
    res = pagerank_warm(g_new, x0, 0.85, max_iterations=10, node_col="url")
    return _round6(res.dataset, "score")


def _q_wcc_resumed(sf_dir: str):
    """Kill-and-resume parity for WCC (the north rule's
    components-from-checkpoint clause): two supersteps with a
    checkpoint, then a second call restores the component vector from
    the per-partition manifest and runs to the fixpoint — must
    value-hash-match the straight-run SQL unroll used by ``wcc``."""
    import hashlib
    import shutil

    from neo4j_graph_algorithms_ray.algorithms import wcc
    from neo4j_graph_algorithms_ray.algorithms.common import \
        translate_vid_columns
    from neo4j_graph_algorithms_ray.pipelines.tpch import get_graph
    g = get_graph(sf_dir, "purchase_und")
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    ck = f"/tmp/nga_ray/ckpt_q/wcc_{tag}"
    shutil.rmtree(ck, ignore_errors=True)
    wcc(g, max_iterations=2, checkpoint_dir=ck, checkpoint_every=2,
        jump_every=0)
    res = wcc(g, checkpoint_dir=ck, resume=True)
    assert res.stats.get("nodes") == g.num_vertices
    return translate_vid_columns(g, res.dataset, ["component"])


def _q_web_spam_mass(sf_dir: str):
    """TrustRank spam mass (Gyöngyi et al. VLDB'04): the PageRank
    fraction NOT reachable from trusted seeds — spam_mass =
    (pr − trust_ppr)/pr. Composes the BSP PageRank twice (plain +
    seed-personalized) and joins; the link-spam demotion signal."""
    import numpy as np
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.algorithms import pagerank
    from neo4j_graph_algorithms_ray.functions.text import round6
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_web_graph
    from neo4j_graph_algorithms_ray.sources.pages import url_of
    from neo4j_graph_algorithms_ray.util import broadcast_join
    g = get_web_graph(sf_dir)
    pr = pagerank(g, 0.85, max_iterations=PR_ITERS, node_col="url").dataset
    tr = pagerank(g, 0.85, max_iterations=PR_ITERS, node_col="url",
                  source_nodes=[url_of(0), url_of(1)]).dataset         .rename_columns({"score": "trust"})
    j = broadcast_join(pr, tr, on="url")

    def mass(b: pa.Table) -> pa.Table:
        r = b["score"].to_numpy(zero_copy_only=False)
        t = b["trust"].to_numpy(zero_copy_only=False)
        return pa.table({"url": b["url"],
                         "spam_mass": pa.array(round6((r - t) / r))})

    return j.map_batches(mass, batch_format="pyarrow").sort("url")


def _q_anf(sf_dir: str):
    """Approximate neighborhood function of the web link graph
    (Palmer et al. KDD'02) — rows-only driver check: the FM sketch
    estimates are approximate, so no exact SQL mirror exists; the
    statistical oracle is tests/test_anf.py (vs exact MSBFS counts)."""
    from neo4j_graph_algorithms_ray.algorithms import anf
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_web_graph
    g = get_web_graph(sf_dir)
    return anf(g, k_hashes=32, seed=1).dataset


def _q_web_ktruss(sf_dir: str):
    """4-truss of the undirected web link graph. SQL-oracled: the
    support-peel unrolls to a fixpoint (drop edges in < k−2 triangles
    per round; stable from ≤10 rounds at both test scales, margin 14)
    — extra rounds are no-ops, so the unroll equals the engine's peel
    exactly. Brute-force peel parity additionally pinned by
    tests/test_ktruss.py."""
    from neo4j_graph_algorithms_ray.algorithms.ktruss import k_truss
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_web_und_graph
    g = get_web_und_graph(sf_dir)
    return k_truss(g, 4, node_cols=("url_u", "url_v")).dataset


def _q_web_kcore(sf_dir: str):
    from neo4j_graph_algorithms_ray.algorithms.kcore import k_core
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_web_und_graph
    g = get_web_und_graph(sf_dir)
    return k_core(g, 3, node_col="url").dataset


def _q_web_kcore_decomposition(sf_dir: str):
    """Full core decomposition of the undirected web link graph.
    SQL-oracled via the iterated-h-index fixpoint (Lü et al. PNAS
    2016): h-index rounds converge monotonically to the exact
    coreness, so the unrolled SQL equals the engine's level-
    synchronous peel; convergence margin pinned at 32 rounds
    (stable from ≤24 at both test scales). Peel parity additionally
    pinned by tests/test_wcc_lpa.py brute-force comparison."""
    from neo4j_graph_algorithms_ray.algorithms.kcore import kcore_decomposition
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_web_und_graph
    g = get_web_und_graph(sf_dir)
    return kcore_decomposition(g, node_col="url").dataset


def _q_random_walks(sf_dir: str):
    from neo4j_graph_algorithms_ray.algorithms.walks import random_walks
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_web_graph
    g = get_web_graph(sf_dir)
    return random_walks(g, length=4, start_mod=7)


def _q_node2vec_walks(sf_dir: str):
    from neo4j_graph_algorithms_ray.algorithms.walks import node2vec_walks
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_web_graph
    g = get_web_graph(sf_dir)
    return node2vec_walks(g, length=4, start_mod=7, p=1, q=2)


def _q_reciprocity(sf_dir: str):
    from neo4j_graph_algorithms_ray.algorithms.reciprocity import edge_reciprocity
    from neo4j_graph_algorithms_ray.pipelines.webgraph import web_edge_ds
    return edge_reciprocity(web_edge_ds(sf_dir), "src_url", "dst_url")


def _q_cocitation(sf_dir: str):
    from neo4j_graph_algorithms_ray.algorithms.cocitation import cocitation_topk
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_web_graph
    g = get_web_graph(sf_dir)
    return cocitation_topk(g, cap=20, topk=50)


def _q_anchor_texts(sf_dir: str):
    from neo4j_graph_algorithms_ray.pipelines.webgraph import anchor_text_ds
    return anchor_text_ds(sf_dir)


def _q_top_anchor_per_page(sf_dir: str):
    """The single most-frequent anchor string per target page (ties by
    anchor asc) — the canonical link-text label used as a document
    title/description feature. Composition: anchor index → grouped
    top-1."""
    from neo4j_graph_algorithms_ray.pipelines.webgraph import anchor_text_ds
    from neo4j_graph_algorithms_ray.util import topk_per_group
    top = topk_per_group(anchor_text_ds(sf_dir), ["dst_url"], "n", 1,
                         tie_cols=["anchor"])
    return top.select_columns(["dst_url", "anchor", "n"]).sort("dst_url")


def _q_window_unique_users(sf_dir: str):
    """Distinct users per tumbling window — the streaming cardinality
    metric. Exchange carries only per-batch-distinct (window, user)
    pairs (predistinct), then a count combine; raw events never move."""
    import numpy as np
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.functions.events import _ts_us
    from neo4j_graph_algorithms_ray.util import preagg_sum, predistinct
    win_us = EVENT_WINDOW_S * 1_000_000

    def tag(b: pa.Table) -> pa.Table:
        ts = _ts_us(b.column("ts")).to_numpy(zero_copy_only=False)
        ws = (ts // win_us) * EVENT_WINDOW_S
        return pa.table({"window_start_s": pa.array(ws),
                         "user_id": b["user_id"]})

    pairs = predistinct(_events(sf_dir).map_batches(tag, batch_format="pyarrow"),
                        ["window_start_s", "user_id"])

    def ones(b: pa.Table) -> pa.Table:
        return pa.table({"window_start_s": b["window_start_s"],
                         "n_users": pa.array(np.ones(b.num_rows, np.int64))})

    agg = preagg_sum(pairs.map_batches(ones, batch_format="pyarrow"),
                     ["window_start_s"], "n_users")
    return agg.sort("window_start_s")


def _q_host_crawl_recency(sf_dir: str):
    """Crawl freshness per host: page count + newest warc_ts — the
    recrawl-scheduling signal, and the only query exercising the
    input-hint's timestamp column. Map-side max/count combine over a
    column-pruned read (url, warc_ts only)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from neo4j_graph_algorithms_ray.pipelines.webgraph import HOST_RE
    from neo4j_graph_algorithms_ray.sources.pages import read_pages
    from neo4j_graph_algorithms_ray.util import preagg_max, preagg_sum
    import numpy as np
    import ray.data as rd

    pages = read_pages(sf_dir, columns=["url", "warc_ts"])

    def tag(b: pa.Table) -> pa.Table:
        h = pc.struct_field(pc.extract_regex(b["url"], HOST_RE), "host")
        return pa.table({"host": h, "latest_ts": b["warc_ts"],
                         "n_pages": pa.array(np.ones(b.num_rows, np.int64))})

    # materialize: max and count below each consume the tagged table —
    # without it the parquet read + regex would execute twice
    tagged = pages.map_batches(tag, batch_format="pyarrow").materialize()
    mx = {r["host"]: r["latest_ts"]
          for r in preagg_max(tagged, ["host"], "latest_ts").take_all()}
    ct = {r["host"]: r["n_pages"]
          for r in preagg_sum(tagged.drop_columns(["latest_ts"]),
                              ["host"], "n_pages").take_all()}
    hosts = sorted(mx)
    return rd.from_arrow(pa.table({
        "host": pa.array(hosts),
        "n_pages": pa.array([ct[h] for h in hosts], pa.int64()),
        "latest_ts": pa.array([mx[h] for h in hosts],
                              pa.timestamp("us"))}))


def _q_host_graph(sf_dir: str):
    from neo4j_graph_algorithms_ray.pipelines.webgraph import host_edge_ds
    return host_edge_ds(sf_dir)


def _q_host_pagerank(sf_dir: str):
    from neo4j_graph_algorithms_ray.algorithms import pagerank
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_host_graph
    g = get_host_graph(sf_dir)
    res = pagerank(g, 0.85, max_iterations=PR_ITERS, node_col="host")
    return _round6(res.dataset, "score")


def _q_host_articlerank(sf_dir: str):
    """Hub-dampened ArticleRank over the host graph (divisor =
    outdeg + avg outdeg) — the spam-resistant ranking variant."""
    from neo4j_graph_algorithms_ray.algorithms.pagerank import articlerank
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_host_graph
    g = get_host_graph(sf_dir)
    res = articlerank(g, 0.85, max_iterations=PR_ITERS, node_col="host")
    return _round6(res.dataset, "score")


def _q_dedup_sensitivity(sf_dir: str):
    """Fuzzy-dedup threshold sweep: per-threshold near-dup pair and
    cluster statistics (functions/dedup.dedup_sensitivity)."""
    from neo4j_graph_algorithms_ray.functions.dedup import dedup_sensitivity
    return dedup_sensitivity(_docs(sf_dir))


def _q_lang_vocab_overlap(sf_dir: str):
    """Cross-language vocabulary Jaccard matrix via the token-bitmask
    fold (functions/text.lang_vocab_overlap)."""
    from neo4j_graph_algorithms_ray.functions.text import lang_vocab_overlap
    from neo4j_graph_algorithms_ray.util import read_parquet_clean
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["text", "lang"])
    return lang_vocab_overlap(docs)


def _q_tfidf_cosine_pairs(sf_dir: str):
    """All-pairs TF-IDF cosine ≥ 0.5 via the sparse inverted-index dot
    (functions/text.tfidf_cosine_pairs)."""
    from neo4j_graph_algorithms_ray.functions.text import tfidf_cosine_pairs
    return _empty_safe(tfidf_cosine_pairs(_docs(sf_dir), threshold=0.5))


def _q_simhash_eval(sf_dir: str):
    """SimHash quality self-evaluation against the exact n-gram-Jaccard
    pair set (functions/dedup.simhash_eval). One row."""
    from neo4j_graph_algorithms_ray.functions.dedup import simhash_eval
    return simhash_eval(_docs(sf_dir))


def _q_vocab_novelty(sf_dir: str):
    """Marginal vocabulary gain per source (tokens attributed to their
    lexicographically-first source; functions/text.vocab_novelty)."""
    from neo4j_graph_algorithms_ray.functions.text import vocab_novelty
    from neo4j_graph_algorithms_ray.util import read_parquet_clean
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["text", "source"])
    return vocab_novelty(docs)


def _q_minhash_eval(sf_dir: str):
    """LSH quality self-evaluation: recall/precision of the verified
    MinHash-LSH pair set against the exact all-pairs n-gram Jaccard
    ground truth (functions/dedup.minhash_eval). One row."""
    from neo4j_graph_algorithms_ray.functions.dedup import minhash_eval
    return minhash_eval(_docs(sf_dir))


def _q_node_similarity(sf_dir: str):
    """Per-host top-3 most similar hosts by in-neighborhood Jaccard
    (GDS-style nodeSimilarity; algorithms/nodesim.py) over the host
    graph, candidate pairs capped at shared-source outdeg <= 20."""
    from neo4j_graph_algorithms_ray.algorithms.nodesim import \
        node_similarity_topk
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_host_graph
    g = get_host_graph(sf_dir)
    return node_similarity_topk(g, cap=20, k=3).dataset


def _q_host_katz(sf_dir: str):
    """Katz centrality over the host graph (attenuated path counts,
    no degree normalization) — the third of the engine's one-scatter
    centralities alongside eigenvector and ArticleRank."""
    from neo4j_graph_algorithms_ray.algorithms.pagerank import katz
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_host_graph
    g = get_host_graph(sf_dir)
    res = katz(g, 0.05, 1.0, max_iterations=PR_ITERS, node_col="host")
    return _round6(res.dataset, "score")


def _q_neighbor_degree_mean(sf_dir: str):
    from neo4j_graph_algorithms_ray.algorithms.neighborhood import (
        neighbor_degree_mean)
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_web_graph
    g = get_web_graph(sf_dir)
    ds = neighbor_degree_mean(g, node_col="url")
    return _round6(ds, "nbr_degree_mean")


def _q_assortativity(sf_dir: str):
    from neo4j_graph_algorithms_ray.algorithms.neighborhood import (
        degree_assortativity)
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_web_graph
    return degree_assortativity(get_web_graph(sf_dir))


def _q_host_top_pages(sf_dir: str):
    import pyarrow as pa
    import pyarrow.compute as pc

    from neo4j_graph_algorithms_ray.pipelines.webgraph import HOST_RE
    from neo4j_graph_algorithms_ray.util import topk_per_group

    def add_host(b: pa.Table) -> pa.Table:
        h = pc.struct_field(pc.extract_regex(b["url"], HOST_RE), "host")
        return b.append_column("host", h)

    deg = _q_web_degrees(sf_dir).map_batches(add_host, batch_format="pyarrow")
    top = topk_per_group(deg, ["host"], "out_degree", 2, tie_cols=["url"])
    return top.select_columns(["host", "url", "out_degree"]) \
              .sort(["host", "url"])


def _q_host_pagerank_weighted(sf_dir: str):
    from neo4j_graph_algorithms_ray.algorithms import pagerank
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_host_graph_weighted
    g = get_host_graph_weighted(sf_dir)
    res = pagerank(g, 0.85, max_iterations=PR_ITERS, node_col="host",
                   weighted=True)
    return _round6(res.dataset, "score")


def _q_host_rank_mass(sf_dir: str):
    """PageRank mass aggregated per host — pipeline chaining: BSP rank
    → vectorized host extraction → map-side-combined sum. The crawl
    prioritization signal (which hosts hold the rank)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from neo4j_graph_algorithms_ray.algorithms import pagerank
    from neo4j_graph_algorithms_ray.pipelines.webgraph import (HOST_RE,
                                                               get_web_graph)
    from neo4j_graph_algorithms_ray.util import preagg_sum
    g = get_web_graph(sf_dir)
    res = pagerank(g, 0.85, max_iterations=PR_ITERS, node_col="url")

    def to_host(b: pa.Table) -> pa.Table:
        h = pc.struct_field(pc.extract_regex(b["url"], HOST_RE), "host")
        return pa.table({"host": h, "rank_mass": b["score"],
                         "n_pages": pa.array(np.ones(b.num_rows, np.int64))})

    agg = preagg_sum(res.dataset.map_batches(to_host, batch_format="pyarrow"),
                     ["host"], ["rank_mass", "n_pages"])
    return _round6(agg, "rank_mass").sort("host")


def _q_host_rank_hhi(sf_dir: str):
    """Rank concentration per host (Herfindahl index of within-host
    PageRank shares): HHI = sum((r/mass)^2) = sum(r^2)/mass^2 — one
    map-side-combined aggregation pass over (r, r^2, 1) partials, no
    join. Near 1 → the host's authority sits on one page; near
    1/n_pages → evenly spread. Crawl-budget / site-structure signal."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from neo4j_graph_algorithms_ray.algorithms import pagerank
    from neo4j_graph_algorithms_ray.pipelines.webgraph import (HOST_RE,
                                                               get_web_graph)
    from neo4j_graph_algorithms_ray.util import preagg_sum, round6
    g = get_web_graph(sf_dir)
    res = pagerank(g, 0.85, max_iterations=PR_ITERS, node_col="url")

    def to_host(b: pa.Table) -> pa.Table:
        h = pc.struct_field(pc.extract_regex(b["url"], HOST_RE), "host")
        r = b["score"].to_numpy(zero_copy_only=False)
        return pa.table({"host": h, "__r": b["score"],
                         "__r2": pa.array(r * r),
                         "n_pages": pa.array(np.ones(b.num_rows, np.int64))})

    agg = preagg_sum(res.dataset.map_batches(to_host, batch_format="pyarrow"),
                     ["host"], ["__r", "__r2", "n_pages"])

    def finish(b: pa.Table) -> pa.Table:
        mass = b["__r"].to_numpy(zero_copy_only=False)
        r2 = b["__r2"].to_numpy(zero_copy_only=False)
        return pa.table({"host": b["host"], "n_pages": b["n_pages"],
                         "hhi": pa.array(round6(r2 / (mass * mass)))})

    return agg.map_batches(finish, batch_format="pyarrow").sort("host")


def _q_web_ppr_batch(sf_dir: str):
    """Batched multi-seed personalized PageRank: 3 topic seeds in ONE
    BSP pass via matrix messages (pagerank.pagerank_batch) — each
    column must match its independent single-seed unroll."""
    from neo4j_graph_algorithms_ray.algorithms.pagerank import pagerank_batch
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_web_graph
    from neo4j_graph_algorithms_ray.sources.pages import url_of
    g = get_web_graph(sf_dir)
    res = pagerank_batch(g, [url_of(0), url_of(1), url_of(2)], 0.85,
                         max_iterations=PR_ITERS, node_col="url")
    return _round6(res.dataset, "score")


def _q_shard_plan(sf_dir: str):
    """Partition-layout audit of the web graph's resident CSR shards:
    per shard its vid range, vertex/edge counts and resident footprint
    (state/shards.py info) — the per-partition lineage surface the
    north star calls for. Engine-internal; rows-only driver check (the
    accumulated-degree bounds have no SQL equivalent)."""
    import pandas as pd
    import ray

    from neo4j_graph_algorithms_ray.algorithms.common import get_engine
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_web_graph
    g = get_web_graph(sf_dir)
    eng = get_engine(g, None)
    infos = ray.get([a.info.remote() for a in eng.actors])
    df = pd.DataFrame(infos).sort_values("part").reset_index(drop=True)
    return df[["part", "lo", "hi", "n_local", "m", "resident_bytes",
               "bytes_per_edge"]]


def _q_edge_prune_topm(sf_dir: str):
    """Rank-weighted crawl-graph compaction: per-source top-3 outlinks
    by round6-ed target PageRank (webgraph.edge_prune_topm)."""
    from neo4j_graph_algorithms_ray.pipelines.webgraph import (
        edge_prune_topm, web_edge_ds)
    ranks = _q_web_pagerank(sf_dir)
    return edge_prune_topm(web_edge_ds(sf_dir), ranks, m=3)


def _q_wcc_incremental(sf_dir: str):
    """Incremental-recrawl WCC: components of the thinned "previous
    crawl" graph seed the full graph's hash-min (old components are
    subsets of new ones, so the warm start only shortens convergence);
    must value-hash-match the straight-run web WCC unroll."""
    from neo4j_graph_algorithms_ray.algorithms import wcc
    from neo4j_graph_algorithms_ray.algorithms.common import \
        translate_vid_columns
    from neo4j_graph_algorithms_ray.pipelines.webgraph import (
        get_web_graph, get_web_graph_thinned)
    g_old = get_web_graph_thinned(sf_dir, undirected=True)
    seed = translate_vid_columns(g_old, wcc(g_old).dataset, ["component"])
    g_new = get_web_graph(sf_dir, undirected=True)
    res = wcc(g_new, init_components=seed)
    comp = translate_vid_columns(g_new, res.dataset, ["component"])
    return comp.rename_columns({"node": "url"})


def _q_hub_removal_wcc(sf_dir: str):
    """Robustness-to-hub-loss report: remove the top-20 out-degree
    pages (ties by url — deterministic), then component sizes of the
    remaining undirected page graph. The skew story measured from the
    other side: how much connectivity the hub vertices carry. Isolated
    survivors stay as singleton components (extra_vertices)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from neo4j_graph_algorithms_ray.algorithms import wcc
    from neo4j_graph_algorithms_ray.algorithms.common import \
        translate_vid_columns
    from neo4j_graph_algorithms_ray.graph import build_graph
    from neo4j_graph_algorithms_ray.pipelines.webgraph import web_edge_ds
    from neo4j_graph_algorithms_ray.registry import GraphCatalog
    from neo4j_graph_algorithms_ray.util import preagg_sum, predistinct

    name = f"web_hubless:{sf_dir}"
    g = GraphCatalog.get(name)
    if g is None:
        edges = web_edge_ds(sf_dir).materialize()
        deg = preagg_sum(edges.map_batches(
            lambda b: pa.table({
                "url": b["src_url"],
                "__c": pa.array(np.ones(b.num_rows, np.int64))}),
            batch_format="pyarrow"), ["url"], "__c")
        hubs = {r["url"] for r in deg.sort(["__c", "url"],
                                           descending=[True, False])
                .limit(20).take_all()}  # 20 urls on the driver
        hub_arr = pa.array(sorted(hubs))

        def drop_hubs(b: pa.Table) -> pa.Table:
            keep = pc.and_(
                pc.invert(pc.is_in(b["src_url"], value_set=hub_arr)),
                pc.invert(pc.is_in(b["dst_url"], value_set=hub_arr)))
            return b.filter(keep)

        survivors = predistinct(
            edges.map_batches(
                lambda b: pa.table({"node": pa.concat_arrays(
                    [b["src_url"].combine_chunks(),
                     b["dst_url"].combine_chunks()])}),
                batch_format="pyarrow"), ["node"]) \
            .map_batches(
                lambda b: b.filter(pc.invert(
                    pc.is_in(b["node"], value_set=hub_arr))),
                batch_format="pyarrow")
        g = build_graph(edges.map_batches(drop_hubs,
                                          batch_format="pyarrow"),
                        src_col="src_url", dst_col="dst_url",
                        undirected=True, extra_vertices=survivors,
                        name=name.replace("/", "_"))
        GraphCatalog.set(name, g)
    res = wcc(g)
    comp = translate_vid_columns(g, res.dataset, ["component"])
    return comp.groupby("component").count() \
        .rename_columns({"count()": "size"})


def _q_host_simrank(sf_dir: str):
    """SimRank domain similarity over the host graph (Jeh & Widom
    KDD'02, in-neighbor form, c=0.8, 5 sweeps): hosts are similar when
    similar hosts link to them — the link-structure complement of the
    content near-dup family. Pair state stays a Dataset; zero pairs are
    pruned each sweep (exact). Oracle: unrolled join/groupby CTE chain."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from neo4j_graph_algorithms_ray.algorithms.simrank import simrank
    from neo4j_graph_algorithms_ray.functions.text import round6
    from neo4j_graph_algorithms_ray.pipelines.webgraph import host_edge_ds

    pairs = simrank(host_edge_ds(sf_dir), src_col="src_host",
                    dst_col="dst_host", c=0.8, iterations=5)

    def fin(b: pa.Table) -> pa.Table:
        keep = pc.less(b["a"], b["b"])
        b = b.filter(keep)
        return pa.table({
            "host_a": b["a"], "host_b": b["b"],
            "simrank": pa.array(round6(
                b["s"].to_numpy(zero_copy_only=False)))})

    return pairs.map_batches(fin, batch_format="pyarrow") \
        .sort(["host_a", "host_b"])


def _lang_edge_matrix(sf_dir: str):
    """(src_lang, dst_lang, n_edges) over the distinct page link graph.

    Scale shape: the url→lang map is a projection of the pages table
    (corpus-sized), so both sides attach via hash joins keyed on url —
    never a driver or broadcast copy; the groupby shuffle then carries
    at most |langs|² rows after the map-side combine."""
    import numpy as np
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.pipelines.webgraph import web_edge_ds
    from neo4j_graph_algorithms_ray.sources.pages import read_pages
    from neo4j_graph_algorithms_ray.util import preagg_sum, safe_join

    langmap = read_pages(sf_dir, columns=["url", "lang"])
    j = safe_join(web_edge_ds(sf_dir), langmap, "inner", 16,
                  on=("src_url",), right_on=("url",))
    j = j.rename_columns({"lang": "src_lang"})
    j = safe_join(j, langmap, "inner", 16, on=("dst_url",),
                  right_on=("url",))
    j = j.rename_columns({"lang": "dst_lang"})
    counts = preagg_sum(j.map_batches(
        lambda b: pa.table({
            "src_lang": b["src_lang"], "dst_lang": b["dst_lang"],
            "n_edges": pa.array(np.ones(b.num_rows, np.int64))}),
        batch_format="pyarrow"), ["src_lang", "dst_lang"], "n_edges")
    # ≤ |langs|² rows from here on — driver-finish is bounded
    return counts.sort(["src_lang", "dst_lang"]).take_all()


def _q_lang_mixing(sf_dir: str):
    """Language mixing matrix of the page link graph: for every
    (src_lang, dst_lang) pair the edge count and corpus-wide fraction —
    the cross-lingual linking report a multilingual crawl QA pass runs."""
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.functions.text import round6
    rows = _lang_edge_matrix(sf_dir)
    tot = float(sum(r["n_edges"] for r in rows))
    return pa.table({
        "src_lang": pa.array([r["src_lang"] for r in rows]),
        "dst_lang": pa.array([r["dst_lang"] for r in rows]),
        "n_edges": pa.array([r["n_edges"] for r in rows],
                            type=pa.int64()),
        "frac": pa.array(round6([r["n_edges"] / tot for r in rows]))})


def _q_lang_assortativity(sf_dir: str):
    """Newman's categorical assortativity coefficient (PRE 67, 2003)
    of page language over directed link edges:
    r = (Σᵢ eᵢᵢ − Σᵢ aᵢbᵢ) / (1 − Σᵢ aᵢbᵢ) with e the mixing matrix,
    a/b its row/col sums — do pages link within their own language?"""
    import numpy as np
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.functions.text import round6
    rows = _lang_edge_matrix(sf_dir)
    langs = sorted({r["src_lang"] for r in rows}
                   | {r["dst_lang"] for r in rows})
    li = {l: i for i, l in enumerate(langs)}
    e = np.zeros((len(langs), len(langs)))
    for r in rows:
        e[li[r["src_lang"]], li[r["dst_lang"]]] = r["n_edges"]
    e /= e.sum()
    ab = float(e.sum(axis=1) @ e.sum(axis=0))
    r_coef = (float(np.trace(e)) - ab) / (1.0 - ab)
    return pa.table({"assortativity": pa.array(round6([r_coef]))})


def _q_lang_rank_mass(sf_dir: str):
    """Total PageRank mass per page language and its corpus share —
    "which languages hold the link authority", the slice-level rank
    report a multilingual corpus curation pass reads. One hash join of
    the rank vector against the url→lang projection, then a ≤|langs|
    groupby."""
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.algorithms import pagerank
    from neo4j_graph_algorithms_ray.functions.text import round6
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_web_graph
    from neo4j_graph_algorithms_ray.sources.pages import read_pages
    from neo4j_graph_algorithms_ray.util import preagg_sum, safe_join

    g = get_web_graph(sf_dir)
    pr = pagerank(g, 0.85, max_iterations=PR_ITERS, node_col="url").dataset
    langmap = read_pages(sf_dir, columns=["url", "lang"])
    j = safe_join(pr, langmap, "inner", 16, on=("url",))
    mass = preagg_sum(j.select_columns(["lang", "score"]),
                      ["lang"], "score")
    rows = sorted(mass.take_all(), key=lambda r: r["lang"])  # ≤ |langs|
    tot = float(sum(r["score"] for r in rows))
    return pa.table({
        "lang": pa.array([r["lang"] for r in rows]),
        "rank_mass": pa.array(round6([r["score"] for r in rows])),
        "share": pa.array(round6([r["score"] / tot for r in rows]))})


def _q_rank_degree_corr(sf_dir: str):
    """Pearson correlation between per-page in-degree and PageRank —
    the classic "is rank just degree?" diagnostic (Pandurangan et al.
    2002 find ~0.3–0.6 on real webs). Distributed moment sums: one
    left join rank×in-degree, per-batch partial (n, Σx, Σy, Σxy, Σx²,
    Σy²), a 6-scalar reduce, closed form on the driver."""
    import numpy as np
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.algorithms import pagerank
    from neo4j_graph_algorithms_ray.functions.text import round6
    from neo4j_graph_algorithms_ray.pipelines.webgraph import (get_web_graph,
                                                               web_edge_ds)
    from neo4j_graph_algorithms_ray.util import preagg_sum, safe_join

    g = get_web_graph(sf_dir)
    pr = pagerank(g, 0.85, max_iterations=PR_ITERS, node_col="url").dataset
    ind = preagg_sum(web_edge_ds(sf_dir).map_batches(
        lambda b: pa.table({"url": b["dst_url"],
                            "idg": pa.array(np.ones(b.num_rows,
                                                    np.float64))}),
        batch_format="pyarrow"), ["url"], "idg")
    j = safe_join(pr, ind, "left_outer", 16, on=("url",))

    def partial(b: pa.Table) -> pa.Table:
        x = np.nan_to_num(b["idg"].to_numpy(zero_copy_only=False))
        y = b["score"].to_numpy(zero_copy_only=False)
        return pa.table({"n": [float(len(x))], "sx": [x.sum()],
                         "sy": [y.sum()], "sxy": [(x * y).sum()],
                         "sxx": [(x * x).sum()], "syy": [(y * y).sum()]})

    cols = ["n", "sx", "sy", "sxy", "sxx", "syy"]
    s = j.map_batches(partial, batch_format="pyarrow").sum(cols)
    n, sx, sy, sxy, sxx, syy = (s[f"sum({c})"] for c in cols)
    r = (n * sxy - sx * sy) / np.sqrt((n * sxx - sx * sx)
                                      * (n * syy - sy * sy))
    return pa.table({"pearson_r": pa.array(round6([r]))})


def _q_host_lang_profile(sf_dir: str):
    """Per-host language profile: page count, distinct languages,
    dominant language (ties → lexicographically first) and Shannon
    language entropy (nats) — the host-level multilingualism report.
    Scale shape: map-side-combined (host, lang) counts, then a
    per-host map_groups whose group size is bounded by |langs|."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from neo4j_graph_algorithms_ray.functions.text import round6
    from neo4j_graph_algorithms_ray.pipelines.webgraph import HOST_RE
    from neo4j_graph_algorithms_ray.sources.pages import read_pages
    from neo4j_graph_algorithms_ray.util import preagg_sum

    pages = read_pages(sf_dir, columns=["url", "lang"])

    def to_host(b: pa.Table) -> pa.Table:
        h = pc.struct_field(pc.extract_regex(b["url"], HOST_RE), "host")
        return pa.table({"host": h, "lang": b["lang"],
                         "n": pa.array(np.ones(b.num_rows, np.int64))})

    counts = preagg_sum(pages.map_batches(to_host, batch_format="pyarrow"),
                        ["host", "lang"], "n")

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        tot = int(df["n"].sum())
        dom = df.sort_values(["n", "lang"],
                             ascending=[False, True]).iloc[0]["lang"]
        p = df["n"].to_numpy(np.float64) / tot
        return pd.DataFrame({
            "host": [df["host"].iloc[0]], "n_pages": [tot],
            "n_langs": [len(df)], "dominant_lang": [dom],
            "lang_entropy": [float(round6(-(p * np.log(p)).sum()))]})

    return counts.groupby("host").map_groups(
        fin, batch_format="pandas").sort("host")


def _q_reciprocal_rank_boost(sf_dir: str):
    """Link-exchange diagnostic: mean PageRank of pages holding at
    least one reciprocal link vs the rest — elevated reciprocal-page
    rank is the classic link-scheme smell checked alongside
    web_spam_mass. One self-join for the reciprocal set, one
    rank join, a 4-scalar reduce."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from neo4j_graph_algorithms_ray.algorithms import pagerank
    from neo4j_graph_algorithms_ray.functions.text import round6
    from neo4j_graph_algorithms_ray.pipelines.webgraph import (get_web_graph,
                                                               web_edge_ds)
    from neo4j_graph_algorithms_ray.util import (predistinct, safe_join)

    g = get_web_graph(sf_dir)
    pr = pagerank(g, 0.85, max_iterations=PR_ITERS, node_col="url").dataset
    e = web_edge_ds(sf_dir).materialize()
    rev = e.map_batches(
        lambda b: pa.table({"src_url": b["dst_url"],
                            "dst_url": b["src_url"],
                            "__r": pa.array(np.ones(b.num_rows, np.int8))}),
        batch_format="pyarrow")
    both = safe_join(e, rev, "inner", 16, on=("src_url", "dst_url"))
    recip = predistinct(both.select_columns(["src_url"])
                        .rename_columns({"src_url": "url"}), ["url"]) \
        .map_batches(
            lambda b: b.append_column(
                "__h", pa.array(np.ones(b.num_rows, np.int8))),
            batch_format="pyarrow")
    j = safe_join(pr, recip, "left_outer", 16, on=("url",))

    def partial(b: pa.Table) -> pa.Table:
        has = pc.is_valid(b["__h"]).to_numpy(zero_copy_only=False)
        r = b["score"].to_numpy(zero_copy_only=False)
        return pa.table({"nr": [float(has.sum())],
                         "no": [float((~has).sum())],
                         "sr": [float(r[has].sum())],
                         "so": [float(r[~has].sum())]})

    agg = j.map_batches(partial, batch_format="pyarrow") \
        .sum(["nr", "no", "sr", "so"])
    nr, no = agg["sum(nr)"], agg["sum(no)"]
    return pa.table({
        "n_reciprocal": pa.array([int(nr)], type=pa.int64()),
        "n_other": pa.array([int(no)], type=pa.int64()),
        "mean_rank_reciprocal": pa.array(round6([agg["sum(sr)"] / nr])),
        "mean_rank_other": pa.array(round6([agg["sum(so)"] / no]))})


def _q_web_pagerank_anchor_weighted(sf_dir: str):
    """Page-level PageRank weighted by href multiplicity: parallel
    links are NOT deduped — every anchor occurrence is an endorsement,
    so a page linked 5 times from one source receives 5× the push
    share. Raw extraction → (src,dst) occurrence counts (map-side
    combined) → weighted CSR → BSP rank."""
    from neo4j_graph_algorithms_ray.algorithms import pagerank
    from neo4j_graph_algorithms_ray.graph import build_graph
    from neo4j_graph_algorithms_ray.registry import GraphCatalog
    from neo4j_graph_algorithms_ray.sources.pages import read_pages
    from neo4j_graph_algorithms_ray.stages.extract import ExtractLinks
    from neo4j_graph_algorithms_ray.util import preagg_sum

    import numpy as np
    import pyarrow as pa

    name = f"web_anchorw:{sf_dir}"
    g = GraphCatalog.get(name)
    if g is None:
        pages = read_pages(sf_dir, columns=["url", "html"])
        raw = pages.map_batches(ExtractLinks(), batch_format="pyarrow") \
            .filter(expr="src_url != dst_url")
        w = preagg_sum(raw.map_batches(
            lambda b: pa.table({"src_url": b["src_url"],
                                "dst_url": b["dst_url"],
                                "w": pa.array(np.ones(b.num_rows,
                                                      np.float64))}),
            batch_format="pyarrow"), ["src_url", "dst_url"], "w")
        g = build_graph(w, src_col="src_url", dst_col="dst_url",
                        weight_col="w", name=name.replace("/", "_"))
        GraphCatalog.set(name, g)
    res = pagerank(g, 0.85, max_iterations=PR_ITERS, node_col="url",
                   weighted=True)
    return _round6(res.dataset, "score").sort("url")


def _q_host_rank_gini(sf_dir: str):
    """Gini coefficient of PageRank mass across hosts — the
    authority-inequality summary at domain granularity (complement of
    host_rank_hhi). Distributed shape: host mass aggregation → global
    (mass, host) sort → zip_with_index rank stamp → 3-scalar partial
    sums; no driver array of hosts."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from neo4j_graph_algorithms_ray.algorithms import pagerank
    from neo4j_graph_algorithms_ray.functions.text import round6
    from neo4j_graph_algorithms_ray.pipelines.webgraph import (HOST_RE,
                                                               get_web_graph)
    from neo4j_graph_algorithms_ray.util import preagg_sum, zip_with_index

    g = get_web_graph(sf_dir)
    pr = pagerank(g, 0.85, max_iterations=PR_ITERS, node_col="url").dataset

    def to_host(b: pa.Table) -> pa.Table:
        h = pc.struct_field(pc.extract_regex(b["url"], HOST_RE), "host")
        return pa.table({"host": h, "mass": b["score"]})

    hm = preagg_sum(pr.map_batches(to_host, batch_format="pyarrow"),
                    ["host"], "mass")
    ranked = zip_with_index(hm.sort(["mass", "host"]), index_col="rnk")

    def partial(b: pa.Table) -> pa.Table:
        m = b["mass"].to_numpy(zero_copy_only=False)
        r = b["rnk"].to_numpy(zero_copy_only=False).astype(np.float64) + 1
        return pa.table({"n": [float(len(m))], "s": [m.sum()],
                         "t2": [(r * m).sum()]})

    agg = ranked.map_batches(partial, batch_format="pyarrow")
    n = agg.sum("n")
    s = agg.sum("s")
    t2 = agg.sum("t2")
    return pa.table({
        "n_hosts": pa.array([int(n)], type=pa.int64()),
        "gini": pa.array(round6([2.0 * t2 / (n * s) - (n + 1.0) / n]))})


def _q_orphan_pages(sf_dir: str):
    """Crawl QA: pages no other page links to (zero in-degree over the
    distinct link graph) — orphans are unreachable by link-following
    and signal sitemap/discovery gaps. One anti-join of the page list
    against the distinct target set; three scalars out."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from neo4j_graph_algorithms_ray.functions.text import round6
    from neo4j_graph_algorithms_ray.pipelines.webgraph import web_edge_ds
    from neo4j_graph_algorithms_ray.sources.pages import read_pages
    from neo4j_graph_algorithms_ray.util import predistinct, safe_join

    pages = read_pages(sf_dir, columns=["url"])
    n_pages = pages.count()
    tgt = predistinct(web_edge_ds(sf_dir).select_columns(["dst_url"]),
                      ["dst_url"]).map_batches(
        lambda b: pa.table({"url": b["dst_url"],
                            "__t": pa.array(np.ones(b.num_rows, np.int8))}),
        batch_format="pyarrow")
    aj = safe_join(pages, tgt, "left_outer", 16, on=("url",))
    orphans = aj.map_batches(
        lambda b: pa.table({"n": [float(pc.sum(
            pc.is_null(b["__t"]).cast(pa.int64())).as_py() or 0)]}),
        batch_format="pyarrow")
    n_orph = int(orphans.sum("n"))
    return pa.table({
        "n_pages": pa.array([n_pages], type=pa.int64()),
        "n_orphans": pa.array([n_orph], type=pa.int64()),
        "orphan_frac": pa.array(round6([n_orph / n_pages]))})


def _q_degree_drift(sf_dir: str):
    """Crawl-to-crawl drift monitor: two-sample KS statistic between
    the out-degree distributions of the current and thinned
    previous-crawl graphs (zero-out-degree nodes included) — the
    cheap structural-change alarm a recrawl pipeline evaluates before
    re-ranking. Degree histograms are distribution-sized (≤ max
    degree), so the KS finish on the driver is bounded regardless of
    corpus size."""
    import numpy as np
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.functions.text import round6
    from neo4j_graph_algorithms_ray.pipelines.webgraph import web_edge_ds
    from neo4j_graph_algorithms_ray.util import preagg_sum
    import pyarrow.compute as pc

    def hist_of(edges, nodes):
        deg = preagg_sum(edges.map_batches(
            lambda b: pa.table({"node": b["src_url"],
                                "d": pa.array(np.ones(b.num_rows,
                                                      np.int64))}),
            batch_format="pyarrow"), ["node"], "d")
        n_nodes = nodes.count()
        h = preagg_sum(deg.map_batches(
            lambda b: pa.table({"deg": b["d"],
                                "n": pa.array(np.ones(b.num_rows,
                                                      np.int64))}),
            batch_format="pyarrow"), ["deg"], "n")
        rows = {r["deg"]: r["n"] for r in h.take_all()}  # ≤ max-degree
        rows[0] = n_nodes - sum(rows.values())           # zero-outdeg
        return rows, n_nodes

    from neo4j_graph_algorithms_ray.util import predistinct

    def nodes_of(edges):
        return predistinct(edges.map_batches(
            lambda b: pa.table({"node": pa.concat_arrays(
                [b["src_url"].combine_chunks(),
                 b["dst_url"].combine_chunks()])}),
            batch_format="pyarrow"), ["node"])

    full = web_edge_ds(sf_dir).materialize()
    md = 5

    def thin(b: pa.Table) -> pa.Table:
        from neo4j_graph_algorithms_ray.functions.dedup import _md5_u64
        s = pc.binary_join_element_wise(b["src_url"], "|", b["dst_url"], "")
        vals, inv = _md5_u64(np.asarray(s.to_pylist(), dtype=object), 15)
        return b.filter(pa.array((vals[inv] % md) != 0))

    prev = full.map_batches(thin, batch_format="pyarrow").materialize()
    ha, na = hist_of(full, nodes_of(full))
    hb, nb = hist_of(prev, nodes_of(prev))
    support = sorted(set(ha) | set(hb))
    fa = np.cumsum([ha.get(d, 0) for d in support]) / na
    fb = np.cumsum([hb.get(d, 0) for d in support]) / nb
    ks = float(np.max(np.abs(fa - fb)))
    return pa.table({"ks_stat": pa.array(round6([ks])),
                     "n_nodes_full": pa.array([na], type=pa.int64()),
                     "n_nodes_prev": pa.array([nb], type=pa.int64())})


def _q_rank_residual(sf_dir: str):
    """Convergence audit: L1 / max distance between the PageRank
    vectors at 10 and 20 iterations — the "is the iteration budget
    enough" scalar an operator reads before trusting fixed-k runs at
    scale. Two BSP runs, one hash join, a 3-scalar reduce."""
    import numpy as np
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.algorithms import pagerank
    from neo4j_graph_algorithms_ray.functions.text import round6
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_web_graph
    from neo4j_graph_algorithms_ray.util import safe_join

    g = get_web_graph(sf_dir)
    ra = pagerank(g, 0.85, max_iterations=10, node_col="url").dataset \
        .rename_columns({"score": "ra"})
    rb = pagerank(g, 0.85, max_iterations=PR_ITERS, node_col="url").dataset
    j = safe_join(rb, ra, "inner", 16, on=("url",))

    def partial(b: pa.Table) -> pa.Table:
        d = np.abs(b["score"].to_numpy(zero_copy_only=False)
                   - b["ra"].to_numpy(zero_copy_only=False))
        return pa.table({"l1": [d.sum()],
                         "mx": [d.max() if len(d) else 0.0],
                         "n": [float(len(d))]})

    agg = j.map_batches(partial, batch_format="pyarrow")
    return pa.table({
        "l1_residual": pa.array(round6([agg.sum("l1")])),
        "max_residual": pa.array(round6([agg.max("mx")])),
        "n_nodes": pa.array([int(agg.sum("n"))], type=pa.int64())})


def _q_value_percentiles(sf_dir: str):
    """Exact per-event-type value percentiles (p50/p90/p99,
    nearest-rank on the distributed value histogram — the
    length_percentiles discipline, partitioned by type). The
    histogram shuffle carries (type, distinct value) rows; per-type
    finish is a vectorized cumsum in one map_groups. At 100 TB with
    high-cardinality doubles, bucket values first (the histogram IS
    the accuracy knob)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.functions.text import round6
    from neo4j_graph_algorithms_ray.util import (preagg_sum,
                                                 read_parquet_clean)

    PCTS = (50, 90, 99)
    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])
    hist = preagg_sum(ev.map_batches(
        lambda b: pa.table({"event_type": b["event_type"],
                            "v": b["value"],
                            "n": pa.array(np.ones(b.num_rows, np.int64))}),
        batch_format="pyarrow"), ["event_type", "v"], "n")

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("v")
        cum = df["n"].cumsum().to_numpy()
        vals = df["v"].to_numpy()
        N = int(cum[-1])
        out_p, out_v = [], []
        for p in PCTS:
            k = int(np.ceil(N * p / 100.0))
            out_p.append(p)
            out_v.append(float(round6(vals[np.searchsorted(cum, k)])))
        return pd.DataFrame({"event_type": df["event_type"].iloc[0],
                             "pct": np.array(out_p, np.int64),
                             "value": out_v})

    return hist.groupby("event_type").map_groups(
        fin, batch_format="pandas").sort(["event_type", "pct"])


def _q_conversion_lag(sf_dir: str):
    """Funnel timing: for users whose first 'view' is followed
    (strictly later) by a 'purchase', the lag to the earliest such
    purchase — conversion-latency stats the growth dashboard reads
    next to `funnel`. Two filtered per-user min aggregations + one
    hash join; only 4 scalars reach the driver."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from neo4j_graph_algorithms_ray.functions.events import _ts_us
    from neo4j_graph_algorithms_ray.functions.text import round6
    from neo4j_graph_algorithms_ray.util import (preagg_min,
                                                 read_parquet_clean,
                                                 safe_join)

    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type", "ts"])

    def pick(t: str):
        def fn(b: pa.Table, *, _t=t) -> pa.Table:
            m = pc.equal(b["event_type"], _t)
            b = b.filter(m)
            return pa.table({"user_id": b["user_id"],
                             "t": _ts_us(b["ts"])})
        return fn

    ta = preagg_min(ev.map_batches(pick("view"), batch_format="pyarrow"),
                    ["user_id"], "t").rename_columns({"t": "ta"}) \
        .materialize()
    n_start = ta.count()
    evb = ev.map_batches(pick("purchase"), batch_format="pyarrow")
    j = safe_join(evb, ta, "inner", 16, on=("user_id",))
    j = j.map_batches(lambda b: b.filter(pc.greater(b["t"], b["ta"])),
                      batch_format="pyarrow")
    tb = preagg_min(j, ["user_id", "ta"], "t")

    def partial(b: pa.Table) -> pa.Table:
        lag = (b["t"].to_numpy(zero_copy_only=False)
               - b["ta"].to_numpy(zero_copy_only=False)) / 1e6
        return pa.table({"n": [float(len(lag))], "s": [lag.sum()],
                         "mx": [lag.max() if len(lag) else 0.0]})

    agg = tb.map_batches(partial, batch_format="pyarrow")
    n = agg.sum("n")
    s = agg.sum("s")
    mx = agg.max("mx")
    return pa.table({
        "n_users_start": pa.array([n_start], type=pa.int64()),
        "n_converted": pa.array([int(n)], type=pa.int64()),
        "mean_lag_s": pa.array(round6([s / n])),
        "max_lag_s": pa.array(round6([mx]))})


def _q_crawl_budget(sf_dir: str):
    """Crawl-budget allocation: Hamilton (largest-remainder)
    apportionment of 1000 fetch slots across hosts proportional to
    their PageRank mass — the rank-weighted politeness scheduler's
    input table. Host mass is one map-side-combined aggregation over
    the rank vector; apportionment runs on the |hosts|-bounded result
    (at web scale: apportion over the top-N host slice)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from neo4j_graph_algorithms_ray.algorithms import pagerank
    from neo4j_graph_algorithms_ray.functions.text import round6
    from neo4j_graph_algorithms_ray.pipelines.webgraph import (HOST_RE,
                                                               get_web_graph)
    from neo4j_graph_algorithms_ray.util import preagg_sum

    B = 1000
    g = get_web_graph(sf_dir)
    pr = pagerank(g, 0.85, max_iterations=PR_ITERS, node_col="url").dataset

    def to_host(b: pa.Table) -> pa.Table:
        h = pc.struct_field(pc.extract_regex(b["url"], HOST_RE), "host")
        return pa.table({"host": h, "mass": b["score"]})

    hm = preagg_sum(pr.map_batches(to_host, batch_format="pyarrow"),
                    ["host"], "mass")
    rows = sorted(hm.take_all(), key=lambda r: r["host"])   # |hosts| rows
    mass = np.array([r["mass"] for r in rows])
    quota = B * mass / mass.sum()
    base = np.floor(quota).astype(np.int64)
    rem = quota - np.floor(quota)
    left = B - int(base.sum())
    order = sorted(range(len(rows)),
                   key=lambda i: (-rem[i], rows[i]["host"]))
    slots = base.copy()
    for i in order[:left]:
        slots[i] += 1
    return pa.table({"host": pa.array([r["host"] for r in rows]),
                     "slots": pa.array(slots, type=pa.int64()),
                     "rank_mass": pa.array(round6(mass))})


def _q_token_burstiness(sf_dir: str):
    """Fano factor (variance/mean of per-doc counts, zeros included)
    for the top-50 corpus tokens — bursty content words vs evenly
    spread function words (Church & Gale 1995), the dispersion signal
    stopword-list builders read. Per-batch (token, Σc, Σc²) partials
    (a doc never spans batches), vocab-sized shuffle, top-k sort."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.functions.dedup import _token_arrays
    from neo4j_graph_algorithms_ray.functions.text import round6
    from neo4j_graph_algorithms_ray.util import preagg_sum

    K = 50
    docs = _docs(sf_dir)
    n_docs = float(docs.count())

    def partial(b: pa.Table) -> pa.Table:
        doc_idx, toks = _token_arrays(b["text"])
        if len(toks) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "s": pa.array([], pa.float64()),
                             "ss": pa.array([], pa.float64())})
        codes, uniq = pd.factorize(toks)
        key = doc_idx.astype(np.int64) * len(uniq) + codes
        uk, cnt = np.unique(key, return_counts=True)
        tok_of = (uk % len(uniq)).astype(np.int64)
        c = cnt.astype(np.float64)
        s = np.zeros(len(uniq))
        ss = np.zeros(len(uniq))
        np.add.at(s, tok_of, c)
        np.add.at(ss, tok_of, c * c)
        return pa.table({"token": pa.array(uniq, pa.string()),
                         "s": pa.array(s), "ss": pa.array(ss)})

    tot = preagg_sum(docs.map_batches(partial, batch_format="pyarrow"),
                     ["token"], ["s", "ss"])
    top = tot.sort(["s", "token"], descending=[True, False]).limit(K) \
        .take_all()                                        # K rows
    top.sort(key=lambda r: r["token"])
    mean = np.array([r["s"] for r in top]) / n_docs
    var = (np.array([r["ss"] for r in top])
           - np.array([r["s"] for r in top]) ** 2 / n_docs) / n_docs
    return pa.table({"token": pa.array([r["token"] for r in top]),
                     "mean_count": pa.array(round6(mean)),
                     "fano": pa.array(round6(var / mean))})


def _q_damping_sensitivity(sf_dir: str):
    """Rank-stability report: top-20 page overlap between PageRank at
    damping 0.5 / 0.85 / 0.95 and the 0.85 baseline — how sensitive
    the ranking head is to the teleport mix (Boldi et al. WWW'05).
    Three BSP rank runs; only three top-k url sets reach the driver."""
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.algorithms import pagerank
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_web_graph

    K = 20
    g = get_web_graph(sf_dir)
    tops = {}
    for d in (0.5, 0.85, 0.95):
        pr = pagerank(g, d, max_iterations=PR_ITERS, node_col="url").dataset
        top = _round6(pr, "score") \
            .sort(["score", "url"], descending=[True, False]).limit(K)
        tops[d] = {r["url"] for r in top.take_all()}        # K urls
    base = tops[0.85]
    return pa.table({
        "damping": pa.array([0.5, 0.85, 0.95]),
        "overlap_with_085": pa.array(
            [len(tops[d] & base) for d in (0.5, 0.85, 0.95)],
            type=pa.int64())})


def _q_host_hll_outlinks(sf_dir: str):
    """Keyed HLL: per-host estimated distinct outlink targets vs the
    exact count — the bounded-memory per-key distinct pattern a 100 TB
    run uses when the exact table (host × url) no longer fits. Sketch
    state is |hosts| × 256 registers (mergeable by max), never
    url-sized; the exact side here exists only to report rel_err.
    Same 60-bit-md5 register/rho rule as the corpus HLL
    (functions/sketches.py), so the oracle replays it bit-for-bit."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from neo4j_graph_algorithms_ray.functions.dedup import _md5_u64
    from neo4j_graph_algorithms_ray.functions.sketches import (HLL_M,
                                                               HLL_REST_BITS)
    from neo4j_graph_algorithms_ray.functions.text import round6
    from neo4j_graph_algorithms_ray.pipelines.webgraph import (HOST_RE,
                                                               web_edge_ds)
    from neo4j_graph_algorithms_ray.util import (preagg_max, preagg_sum,
                                                 predistinct)

    edges = web_edge_ds(sf_dir)

    def to_host(b: pa.Table) -> pa.Table:
        h = pc.struct_field(pc.extract_regex(b["src_url"], HOST_RE), "host")
        return pa.table({"host": h, "dst": b["dst_url"]})

    hd = predistinct(edges.map_batches(to_host, batch_format="pyarrow"),
                     ["host", "dst"]).materialize()

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd
        hosts = np.asarray(b["host"].to_pylist(), dtype=object)
        h, inv = _md5_u64(np.asarray(b["dst"].to_pylist(), dtype=object),
                          15)
        hv = h[inv]
        reg = (hv % HLL_M).astype(np.int64)
        rest = (hv // HLL_M).astype(np.uint64)
        rho = np.full(len(hv), HLL_REST_BITS + 1, dtype=np.int64)
        nz = rest > 0
        rho[nz] = HLL_REST_BITS - np.floor(
            np.log2(rest[nz].astype(np.float64))).astype(np.int64)
        codes, uniq = pd.factorize(hosts)
        key = codes.astype(np.int64) * HLL_M + reg
        order = np.argsort(key, kind="stable")
        k, rh = key[order], rho[order]
        uk, starts = np.unique(k, return_index=True)
        mx = np.maximum.reduceat(rh, starts)
        return pa.table({"host": pa.array(uniq[(uk // HLL_M)]),
                         "register": pa.array(uk % HLL_M),
                         "max_rho": pa.array(mx)})

    regs = preagg_max(hd.map_batches(partial, batch_format="pyarrow"),
                      ["host", "register"], "max_rho")
    exact = preagg_sum(hd.map_batches(
        lambda b: pa.table({"host": b["host"],
                            "n": pa.array(np.ones(b.num_rows, np.int64))}),
        batch_format="pyarrow"), ["host"], "n")
    ex = {r["host"]: r["n"] for r in exact.take_all()}       # |hosts| rows
    by_host: dict = {}
    for r in regs.take_all():                  # |hosts| × ≤256 rows
        by_host.setdefault(r["host"], {})[r["register"]] = r["max_rho"]
    alpha = 0.7213 / (1.0 + 1.079 / HLL_M)
    rows = []
    for host in sorted(by_host):
        M = np.zeros(HLL_M)
        for reg, mr in by_host[host].items():
            M[reg] = mr
        est = alpha * HLL_M * HLL_M / np.sum(np.power(2.0, -M))
        zeros = int((M == 0).sum())
        if est <= 2.5 * HLL_M and zeros:
            est = HLL_M * np.log(HLL_M / zeros)
        rows.append((host, float(round6(est)), int(ex[host]),
                     float(round6(abs(est - ex[host]) / ex[host]))))
    return pa.table({
        "host": pa.array([r[0] for r in rows]),
        "hll_estimate": pa.array([r[1] for r in rows]),
        "exact_distinct": pa.array([r[2] for r in rows], type=pa.int64()),
        "rel_err": pa.array([r[3] for r in rows])})


def _q_tokenizer_fertility(sf_dir: str):
    """Chars-per-token by language — the tokenizer-budget planning
    stat (CJK-like langs run short tokens; fertility drives context
    cost). Per-batch (lang, chars, tokens) partials, ≤|langs| rows
    shuffled."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from neo4j_graph_algorithms_ray.functions.text import round6
    from neo4j_graph_algorithms_ray.util import (preagg_sum,
                                                 read_parquet_clean)

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["lang", "text"])

    def partial(b: pa.Table) -> pa.Table:
        ch = pc.utf8_length(b["text"]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        tk = pc.count_substring_regex(b["text"], r"\S+") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"lang": b["lang"], "n_chars": pa.array(ch),
                         "n_tokens": pa.array(tk)})

    agg = preagg_sum(docs.map_batches(partial, batch_format="pyarrow"),
                     ["lang"], ["n_chars", "n_tokens"])

    def fin(b: pa.Table) -> pa.Table:
        c = b["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        t = b["n_tokens"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"lang": b["lang"], "n_chars": b["n_chars"],
                         "n_tokens": b["n_tokens"],
                         "chars_per_token": pa.array(round6(
                             c / np.maximum(t, 1.0)))})

    return agg.map_batches(fin, batch_format="pyarrow").sort("lang")


def _q_quality_assortativity(sf_dir: str):
    """Numeric assortativity of content volume over link edges:
    Pearson r of (src word count, dst word count) across all page
    links — do pages link to similarly-sized pages? Two hash joins of
    the edge table against the doc-length projection, then the
    distributed moment-sum reduction."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from neo4j_graph_algorithms_ray.functions.text import round6
    from neo4j_graph_algorithms_ray.pipelines.webgraph import web_edge_ds
    from neo4j_graph_algorithms_ray.util import safe_join

    def words(b: pa.Table) -> pa.Table:
        dn = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        url = pc.binary_join_element_wise(
            "http://site-", pa.array((dn % 20).astype(str)),
            ".test/page/", pa.array(dn.astype(str)), "")
        w = pc.count_substring_regex(b["text"], r"\S+") \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"url": url, "w": pa.array(w)})

    dw = _docs(sf_dir).map_batches(words, batch_format="pyarrow") \
        .materialize()
    j = safe_join(web_edge_ds(sf_dir), dw, "inner", 16,
                  on=("src_url",), right_on=("url",))
    j = j.rename_columns({"w": "x"})
    j = safe_join(j, dw, "inner", 16, on=("dst_url",), right_on=("url",))
    j = j.rename_columns({"w": "y"})

    def partial(b: pa.Table) -> pa.Table:
        x = b["x"].to_numpy(zero_copy_only=False)
        y = b["y"].to_numpy(zero_copy_only=False)
        return pa.table({"n": [float(len(x))], "sx": [x.sum()],
                         "sy": [y.sum()], "sxy": [(x * y).sum()],
                         "sxx": [(x * x).sum()], "syy": [(y * y).sum()]})

    cols = ["n", "sx", "sy", "sxy", "sxx", "syy"]
    s = j.map_batches(partial, batch_format="pyarrow").sum(cols)
    n, sx, sy, sxy, sxx, syy = (s[f"sum({c})"] for c in cols)
    r = (n * sxy - sx * sy) / np.sqrt((n * sxx - sx * sx)
                                      * (n * syy - sy * sy))
    return pa.table({"assortativity": pa.array(round6([r]))})


def _q_simhash_bit_balance(sf_dir: str):
    """SimHash index-health diagnostic: per-bit ones-fraction of the
    corpus's 64-bit signatures. A bit stuck near 0 or 1 carries no
    discriminating power and weakens the hamming bands — the
    fingerprint-quality report the dedup operator checks. Per-batch
    bit-count partials (64 rows each), one tiny groupby."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.functions.dedup import SimHash
    from neo4j_graph_algorithms_ray.functions.text import round6
    from neo4j_graph_algorithms_ray.util import preagg_sum

    sh = SimHash()

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        sig = sh.simhash_all(b["text"].to_numpy())
        bits = np.unpackbits(sig.view(np.uint8).reshape(-1, 8), axis=1,
                             bitorder="little").astype(np.int64)
        return pd.DataFrame({"bit": np.arange(64, dtype=np.int64),
                             "n_ones": bits.sum(axis=0),
                             "n_docs": np.full(64, len(sig), np.int64)})

    agg = preagg_sum(_docs(sf_dir).map_batches(partial,
                                               batch_format="pandas",
                                               batch_size=4096),
                     ["bit"], ["n_ones", "n_docs"])

    def fin(b: pa.Table) -> pa.Table:
        o = b["n_ones"].to_numpy(zero_copy_only=False)
        d = b["n_docs"].to_numpy(zero_copy_only=False)
        return pa.table({"bit": b["bit"], "n_ones": b["n_ones"],
                         "frac_ones": pa.array(round6(o / d))})

    return agg.map_batches(fin, batch_format="pyarrow").sort("bit")


def _q_minhash_band_load(sf_dir: str):
    """LSH index-health diagnostic: per-band histogram of MinHash
    bucket sizes. A fat bucket is a hot key that will dominate pair
    generation — the skew report an operator checks before running the
    dedup pass at scale. Per-batch signatures (actor state), map-side
    combined (band, key) counts, then a ≤|distinct sizes| histogram."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.functions.dedup import MinHashSignatures
    from neo4j_graph_algorithms_ray.util import preagg_sum

    NUM_PERM, BANDS = 8, 4
    r = NUM_PERM // BANDS

    class BandKeys(MinHashSignatures):
        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            sig = self.signature_matrix(batch[self.text_col].to_numpy())
            frames = []
            for b in range(BANDS):
                cols = sig[:, b * r:(b + 1) * r].astype(str)
                key = cols[:, 0]
                for i in range(1, r):
                    key = np.char.add(np.char.add(key, ":"), cols[:, i])
                frames.append(pd.DataFrame({
                    "band": np.full(len(key), b, np.int64),
                    "bkey": key,
                    "n": np.ones(len(key), np.int64)}))
            return pd.concat(frames, ignore_index=True)

    bk = _docs(sf_dir).map_batches(BandKeys(NUM_PERM),
                                   batch_format="pandas", batch_size=4096)
    sizes = preagg_sum(bk, ["band", "bkey"], "n")
    hist = preagg_sum(sizes.map_batches(
        lambda b: pa.table({"band": b["band"], "bucket_size": b["n"],
                            "n_buckets": pa.array(np.ones(b.num_rows,
                                                          np.int64))}),
        batch_format="pyarrow"), ["band", "bucket_size"], "n_buckets")
    return hist.sort(["band", "bucket_size"])


def _q_edge_percolation(sf_dir: str):
    """Bond-percolation robustness curve: keep a deterministic md5
    slice of 20% / 50% / 80% of the page links, run WCC on each
    surviving graph, report the largest-component size — how much
    random link loss the web graph's connectivity tolerates (the
    complement of hub_removal_wcc's targeted attack). Each level is
    one filtered edge scan + one BSP WCC; nothing driver-sized."""
    import numpy as np
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.algorithms import wcc
    from neo4j_graph_algorithms_ray.functions.dedup import _md5_u64
    from neo4j_graph_algorithms_ray.graph import build_graph
    from neo4j_graph_algorithms_ray.pipelines.webgraph import web_edge_ds
    from neo4j_graph_algorithms_ray.registry import GraphCatalog

    edges = web_edge_ds(sf_dir).materialize()
    out = {"keep_tenths": [], "n_edges": [], "n_nodes": [], "lcc_size": []}
    for k in (2, 5, 8):
        def keep(b: pa.Table, *, _k=k) -> pa.Table:
            import pyarrow.compute as pc
            s = pc.binary_join_element_wise(b["src_url"], "|",
                                            b["dst_url"], "")
            vals, inv = _md5_u64(np.asarray(s.to_pylist(), dtype=object),
                                 15)
            return b.filter(pa.array((vals[inv] % 10) < _k))

        ke = edges.map_batches(keep, batch_format="pyarrow")
        name = f"web_perc:{sf_dir}:{k}"
        g = GraphCatalog.get(name)
        if g is None:
            g = build_graph(ke, src_col="src_url", dst_col="dst_url",
                            undirected=True, name=name.replace("/", "_"))
            GraphCatalog.set(name, g)
        comp = wcc(g).dataset
        sizes = comp.groupby("component").count()
        lcc = int(sizes.max("count()"))
        out["keep_tenths"].append(k)
        out["n_edges"].append(ke.count())
        out["n_nodes"].append(comp.count())
        out["lcc_size"].append(lcc)
    return pa.table({c: pa.array(v, type=pa.int64())
                     for c, v in out.items()})


def _q_heaps_law(sf_dir: str):
    """Heaps-law vocabulary growth: cumulative distinct-token count
    after each doc_id-order quarter of the corpus — the
    vocabulary-budget curve tokenizer planners read. Distributed shape:
    per-batch (token, min doc_id) partials → preagg_min (vocab-sized
    shuffle, corpus never re-scanned), then a 4-bucket histogram and a
    driver cumsum over 4 rows."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.functions.dedup import _token_arrays
    from neo4j_graph_algorithms_ray.util import preagg_min, preagg_sum

    Q = 4
    docs = _docs(sf_dir)
    n_docs = int(docs.max("doc_id")) + 1

    def partial(b: pa.Table) -> pa.Table:
        doc_idx, toks = _token_arrays(b["text"])
        if len(toks) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "first_doc": pa.array([], pa.int64())})
        ids = b["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[doc_idx]
        codes, uniq = pd.factorize(toks)
        first = np.full(len(uniq), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(first, codes, ids)
        return pa.table({"token": pa.array(uniq, pa.string()),
                         "first_doc": pa.array(first)})

    fo = preagg_min(docs.map_batches(partial, batch_format="pyarrow"),
                    ["token"], "first_doc")
    hist = preagg_sum(fo.map_batches(
        lambda b: pa.table({
            "q": pa.array(np.minimum(
                b["first_doc"].to_numpy(zero_copy_only=False)
                * Q // n_docs, Q - 1).astype(np.int64)),
            "nt": pa.array(np.ones(b.num_rows, np.int64))}),
        batch_format="pyarrow"), ["q"], "nt")
    rows = sorted(hist.take_all(), key=lambda r: r["q"])     # ≤ Q rows
    qs = [r["q"] for r in rows]
    cum = np.cumsum([r["nt"] for r in rows])
    return pa.table({"quarter": pa.array([q + 1 for q in qs],
                                         type=pa.int64()),
                     "vocab_size": pa.array(cum, type=pa.int64())})


def _q_square_count(sf_dir: str):
    """Hub-capped 4-cycle (square) census of the undirected page graph:
    squares = ½·Σ_{u<v} C(codeg(u,v), 2) where codeg counts common
    neighbors through vertices with degree in [2, 20] — same shard-local
    co-pair kernel and DF-cap discipline as cocitation (hubs above the
    cap excluded; the oracle mirrors the filter). Squares are the next
    motif after triangles in web community structure (bipartite cores =
    spam/link-farm signatures, Kumar et al. WWW'99)."""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    from neo4j_graph_algorithms_ray.algorithms.common import get_engine
    from neo4j_graph_algorithms_ray.graph import build_graph
    from neo4j_graph_algorithms_ray.pipelines.webgraph import web_edge_ds
    from neo4j_graph_algorithms_ray.registry import GraphCatalog
    from neo4j_graph_algorithms_ray.util import preagg_sum

    # deduped undirected graph: reciprocal page links must collapse to
    # ONE und edge or co-degree (and the hub cap) overcounts them
    name = f"web_und_dedup:{sf_dir}"
    g = GraphCatalog.get(name)
    if g is None:
        g = build_graph(web_edge_ds(sf_dir), src_col="src_url",
                        dst_col="dst_url", undirected=True, dedup=True,
                        name=name.replace("/", "_"))
        GraphCatalog.set(name, g)
    eng = get_engine(g, None)
    parts = rd.from_arrow_refs(
        [a.copair_counts.remote(20) for a in eng.actors])
    counts = preagg_sum(parts, ["a", "b"], "n")

    def partial(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"pairs": pa.array([int(len(n))]),
                         "ch2": pa.array([int((n * (n - 1) // 2).sum())])})

    s = counts.map_batches(partial, batch_format="pyarrow") \
        .sum(["pairs", "ch2"])
    return pa.table({
        "n_codeg_pairs": pa.array([int(s["sum(pairs)"])], type=pa.int64()),
        "squares": pa.array([int(s["sum(ch2)"]) // 2], type=pa.int64())})


def _q_wl_colors(sf_dir: str):
    """1-WL color-refinement histogram of the undirected page graph
    (2 rounds) — the structural fingerprint / symmetry report;
    algorithms/wl.py."""
    import numpy as np
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.algorithms.wl import wl_colors
    from neo4j_graph_algorithms_ray.pipelines.webgraph import web_edge_ds
    from neo4j_graph_algorithms_ray.util import preagg_sum

    cols = wl_colors(web_edge_ds(sf_dir), src_col="src_url",
                     dst_col="dst_url", rounds=2)
    hist = preagg_sum(cols.map_batches(
        lambda b: pa.table({"wl_color": b["wl_color"],
                            "n_nodes": pa.array(np.ones(b.num_rows,
                                                        np.int64))}),
        batch_format="pyarrow"), ["wl_color"], "n_nodes")
    return hist.sort("wl_color")


def _q_coupling(sf_dir: str):
    """Bibliographic coupling — pages sharing OUT-links (the dual of
    co-citation): run the same shard-local pair kernel on the REVERSED
    graph (cached by web_cheirank), so in-neighbor pairs there are
    out-neighbor pairs here. Hub guard: targets with in-degree > 20
    excluded, as in cocitation."""
    from neo4j_graph_algorithms_ray.algorithms.cocitation import \
        cocitation_topk
    from neo4j_graph_algorithms_ray.graph import build_graph
    from neo4j_graph_algorithms_ray.pipelines.webgraph import web_edge_ds
    from neo4j_graph_algorithms_ray.registry import GraphCatalog

    name = f"web_rev:{sf_dir}"
    g = GraphCatalog.get(name)
    if g is None:
        g = build_graph(web_edge_ds(sf_dir), src_col="dst_url",
                        dst_col="src_url", name=name.replace("/", "_"))
        GraphCatalog.set(name, g)
    return cocitation_topk(g, cap=20, topk=50)


def _q_host_insularity(sf_dir: str):
    """Per-host link insularity: fraction of a host's page-level
    outlinks that stay on-host — the site-structure metric crawl
    budgeting reads (insular sites need fewer cross-host fetch slots).
    One map-side-combined aggregation over the host-pair counts."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from neo4j_graph_algorithms_ray.functions.text import round6
    from neo4j_graph_algorithms_ray.pipelines.webgraph import host_edge_ds
    from neo4j_graph_algorithms_ray.util import preagg_sum

    he = host_edge_ds(sf_dir)

    def partial(b: pa.Table) -> pa.Table:
        n = b["n_links"].to_numpy(zero_copy_only=False)
        internal = pc.equal(b["src_host"], b["dst_host"]) \
            .to_numpy(zero_copy_only=False)
        return pa.table({"host": b["src_host"],
                         "n_internal": pa.array(np.where(internal, n, 0)),
                         "n_total": pa.array(n)})

    agg = preagg_sum(he.map_batches(partial, batch_format="pyarrow"),
                     ["host"], ["n_internal", "n_total"])

    def fin(b: pa.Table) -> pa.Table:
        i = b["n_internal"].to_numpy(zero_copy_only=False)
        t = b["n_total"].to_numpy(zero_copy_only=False)
        return pa.table({"host": b["host"], "n_internal": b["n_internal"],
                         "n_total": b["n_total"],
                         "insularity": pa.array(round6(i / t))})

    return agg.map_batches(fin, batch_format="pyarrow").sort("host")


def _q_host_reciprocity(sf_dir: str):
    """Edge reciprocity of the host graph (distinct cross-host edges):
    do domains link back? Same unordered-pair reduction as the page
    level query, one aggregation over host pairs."""
    from neo4j_graph_algorithms_ray.algorithms.reciprocity import \
        edge_reciprocity
    from neo4j_graph_algorithms_ray.pipelines.webgraph import host_edge_ds
    he = host_edge_ds(sf_dir).filter(expr="src_host != dst_host") \
        .select_columns(["src_host", "dst_host"])
    return edge_reciprocity(he, "src_host", "dst_host")


def _q_snowball_sample(sf_dir: str):
    """Snowball (bounded-BFS) neighborhood sampler from the seed page:
    each hop expands the frontier to unvisited out-neighbors and keeps
    the md5-least 50 (ties by url) — the deterministic GNN-minibatch /
    neighborhood-audit sampler. Repo-standard 60-bit md5 so the SQL
    oracle replays the per-hop selection exactly.

    Scale shape: each hop is one hash join (frontier × edges), a
    distinct combine, an anti-join against the visited set, and a
    global top-``cap`` (bounded output); frontier and visited stay
    Datasets — nothing corpus-sized touches the driver."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from neo4j_graph_algorithms_ray.functions.dedup import _md5_u64
    from neo4j_graph_algorithms_ray.pipelines.webgraph import web_edge_ds
    from neo4j_graph_algorithms_ray.sources.pages import url_of
    from neo4j_graph_algorithms_ray.util import predistinct, safe_join
    import ray.data as rd

    HOPS, CAP = 3, 50
    edges = web_edge_ds(sf_dir).materialize()
    frontier = rd.from_items([{"url": url_of(0)}]).materialize()
    visited = frontier
    out = [(url_of(0), 0)]
    for h in range(1, HOPS + 1):
        nbr = safe_join(frontier, edges, "inner", 8,
                        on=("url",), right_on=("src_url",))
        cand = predistinct(nbr.select_columns(["dst_url"])
                           .rename_columns({"dst_url": "url"}), ["url"])
        seen = visited.map_batches(
            lambda b: b.append_column(
                "__v", pa.array(np.ones(b.num_rows, np.int8))),
            batch_format="pyarrow")
        cand = safe_join(cand, seen, "left_outer", 8, on=("url",))
        cand = cand.map_batches(
            lambda b: b.filter(pc.is_null(b["__v"])).select(["url"]),
            batch_format="pyarrow")

        def key(b: pa.Table) -> pa.Table:
            u = np.asarray(b["url"].to_pylist(), dtype=object)
            vals, inv = _md5_u64(u, 15)
            return pa.table({"url": b["url"],
                             "k": pa.array(vals[inv].astype(np.int64))})

        picked = cand.map_batches(key, batch_format="pyarrow") \
            .sort(["k", "url"]).limit(CAP).select_columns(["url"]) \
            .materialize()
        out += [(r["url"], h) for r in picked.take_all()]   # ≤ cap rows
        visited = visited.union(picked).materialize()
        frontier = picked
    urls, hop = zip(*out)
    return pa.table({"url": pa.array(list(urls)),
                     "hop": pa.array(list(hop), type=pa.int64())}) \
        .sort_by([("hop", "ascending"), ("url", "ascending")])


def _q_length_rank_corr(sf_dir: str):
    """Webtext × link-graph fusion: Pearson r between document word
    count and the page's PageRank — "does link authority track content
    volume?". Same distributed moment-sum reduction as
    rank_degree_corr, with the doc→url map computed vectorized from
    doc ids (no extra table scan)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from neo4j_graph_algorithms_ray.algorithms import pagerank
    from neo4j_graph_algorithms_ray.functions.text import round6
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_web_graph
    from neo4j_graph_algorithms_ray.util import safe_join

    g = get_web_graph(sf_dir)
    pr = pagerank(g, 0.85, max_iterations=PR_ITERS, node_col="url").dataset

    def words(b: pa.Table) -> pa.Table:
        dn = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        url = pc.binary_join_element_wise(
            "http://site-", pa.array((dn % 20).astype(str)),
            ".test/page/", pa.array(dn.astype(str)), "")
        w = pc.count_substring_regex(b["text"], r"\S+") \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"url": url, "w": pa.array(w)})

    dw = _docs(sf_dir).map_batches(words, batch_format="pyarrow")
    j = safe_join(pr, dw, "inner", 16, on=("url",))

    def partial(b: pa.Table) -> pa.Table:
        x = b["w"].to_numpy(zero_copy_only=False)
        y = b["score"].to_numpy(zero_copy_only=False)
        return pa.table({"n": [float(len(x))], "sx": [x.sum()],
                         "sy": [y.sum()], "sxy": [(x * y).sum()],
                         "sxx": [(x * x).sum()], "syy": [(y * y).sum()]})

    cols = ["n", "sx", "sy", "sxy", "sxx", "syy"]
    s = j.map_batches(partial, batch_format="pyarrow").sum(cols)
    n, sx, sy, sxy, sxx, syy = (s[f"sum({c})"] for c in cols)
    r = (n * sxy - sx * sy) / np.sqrt((n * sxx - sx * sx)
                                      * (n * syy - sy * sy))
    return pa.table({"pearson_r": pa.array(round6([r]))})


def _q_dup_rank_report(sf_dir: str):
    """Dedup × rank fusion: PageRank mass sitting on non-canonical
    near-duplicate pages (MinHash-LSH transitive closure, rep = min
    doc id) — the wasted crawl/rank budget a dedup pass recovers.
    Composition: neardup_clusters → vectorized doc→url map → hash join
    with the rank vector → 3-scalar reduce."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from neo4j_graph_algorithms_ray.algorithms import pagerank
    from neo4j_graph_algorithms_ray.functions.dedup import neardup_clusters
    from neo4j_graph_algorithms_ray.functions.text import round6
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_web_graph
    from neo4j_graph_algorithms_ray.util import safe_join

    g = get_web_graph(sf_dir)
    pr = pagerank(g, 0.85, max_iterations=PR_ITERS, node_col="url").dataset
    clusters = neardup_clusters(_docs(sf_dir), num_perm=8, bands=4,
                                threshold=0.5)

    def to_url(b: pa.Table) -> pa.Table:
        dn = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        url = pc.binary_join_element_wise(
            "http://site-", pa.array((dn % 20).astype(str)),
            ".test/page/", pa.array(dn.astype(str)), "")
        dup = pc.not_equal(b["rep_id"], b["doc_id"])
        return pa.table({"url": url, "dup": dup})

    cl = clusters.map_batches(to_url, batch_format="pyarrow")
    j = safe_join(pr, cl, "inner", 16, on=("url",))

    def partial(b: pa.Table) -> pa.Table:
        dup = b["dup"].to_numpy(zero_copy_only=False)
        r = b["score"].to_numpy(zero_copy_only=False)
        return pa.table({"nd": [float(dup.sum())],
                         "dmass": [float(r[dup].sum())],
                         "tmass": [float(r.sum())]})

    s = j.map_batches(partial, batch_format="pyarrow") \
        .sum(["nd", "dmass", "tmass"])
    return pa.table({
        "n_dup_docs": pa.array([int(s["sum(nd)"])], type=pa.int64()),
        "dup_rank_mass": pa.array(round6([s["sum(dmass)"]])),
        "dup_rank_frac": pa.array(round6([s["sum(dmass)"]
                                          / s["sum(tmass)"]]))})


def _q_rank_movers(sf_dir: str):
    """Temporal rank churn: PageRank on the current crawl vs the
    thinned "previous crawl" graph (the incremental-recrawl fixture),
    top-25 pages by |Δscore| among nodes present in both — the
    rank-volatility report a recrawl scheduler reads. Two BSP rank
    runs + one hash join; top-k bounded."""
    import numpy as np
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.algorithms import pagerank
    from neo4j_graph_algorithms_ray.functions.text import round6
    from neo4j_graph_algorithms_ray.pipelines.webgraph import (
        get_web_graph, get_web_graph_thinned)
    from neo4j_graph_algorithms_ray.util import safe_join

    g_now = get_web_graph(sf_dir)
    g_old = get_web_graph_thinned(sf_dir, mod=5)
    now = pagerank(g_now, 0.85, max_iterations=PR_ITERS,
                   node_col="url").dataset
    old = pagerank(g_old, 0.85, max_iterations=PR_ITERS, node_col="url") \
        .dataset.rename_columns({"score": "score_prev"})
    j = safe_join(now, old, "inner", 16, on=("url",))

    def fin(b: pa.Table) -> pa.Table:
        f = b["score"].to_numpy(zero_copy_only=False)
        o = b["score_prev"].to_numpy(zero_copy_only=False)
        return pa.table({"url": b["url"],
                         "score_prev": pa.array(round6(o)),
                         "score_now": pa.array(round6(f)),
                         "delta": pa.array(round6(f - o)),
                         "__absd": pa.array(round6(np.abs(f - o)))})

    return j.map_batches(fin, batch_format="pyarrow") \
        .sort(["__absd", "url"], descending=[True, False]).limit(25) \
        .drop_columns(["__absd"])


def _q_web_cheirank(sf_dir: str):
    """CheiRank — PageRank over the reversed link graph
    (Chepelianskii 2010): scores pages by how much they POINT AT
    important content (communicativity/hub-ness), the dual of
    authority rank. Same BSP engine on the reversed edge table."""
    from neo4j_graph_algorithms_ray.algorithms import pagerank
    from neo4j_graph_algorithms_ray.graph import build_graph
    from neo4j_graph_algorithms_ray.pipelines.webgraph import web_edge_ds
    from neo4j_graph_algorithms_ray.registry import GraphCatalog

    name = f"web_rev:{sf_dir}"
    g = GraphCatalog.get(name)
    if g is None:
        g = build_graph(web_edge_ds(sf_dir), src_col="dst_url",
                        dst_col="src_url", name=name.replace("/", "_"))
        GraphCatalog.set(name, g)
    res = pagerank(g, 0.85, max_iterations=PR_ITERS, node_col="url")
    return _round6(res.dataset, "score").sort("url")


def _q_rank_flows(sf_dir: str):
    """Top-50 edges by transferred rank mass r(src)/outdeg(src) — which
    individual links carry the most authority (the link-sculpting /
    endorsement report). One corpus-scale join of the edge table
    against the rank and out-degree vectors, then a bounded top-k."""
    import numpy as np
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.algorithms import pagerank
    from neo4j_graph_algorithms_ray.functions.text import round6
    from neo4j_graph_algorithms_ray.pipelines.webgraph import (get_web_graph,
                                                               web_edge_ds)
    from neo4j_graph_algorithms_ray.util import preagg_sum, safe_join

    g = get_web_graph(sf_dir)
    pr = pagerank(g, 0.85, max_iterations=PR_ITERS, node_col="url").dataset
    edges = web_edge_ds(sf_dir)
    deg = preagg_sum(edges.map_batches(
        lambda b: pa.table({"url": b["src_url"],
                            "dg": pa.array(np.ones(b.num_rows, np.float64))}),
        batch_format="pyarrow"), ["url"], "dg")
    src_stats = safe_join(pr, deg, "inner", 16, on=("url",))
    j = safe_join(edges, src_stats, "inner", 16,
                  on=("src_url",), right_on=("url",))

    def flow(b: pa.Table) -> pa.Table:
        f = (b["score"].to_numpy(zero_copy_only=False)
             / b["dg"].to_numpy(zero_copy_only=False))
        return pa.table({"src_url": b["src_url"], "dst_url": b["dst_url"],
                         "flow": pa.array(round6(f))})

    return j.map_batches(flow, batch_format="pyarrow") \
        .sort(["flow", "src_url", "dst_url"],
              descending=[True, False, False]).limit(50)


def _q_anchor_entropy(sf_dir: str):
    """Per-target anchor-text diversity: inlink count, distinct anchor
    strings and Shannon entropy (nats) — high-entropy targets are
    described many ways (navigational hubs), low-entropy ones carry a
    consistent label. Composition: anchor index → per-target
    map_groups (group size bounded by distinct anchors per page)."""
    import numpy as np
    import pandas as pd

    from neo4j_graph_algorithms_ray.functions.text import round6
    from neo4j_graph_algorithms_ray.pipelines.webgraph import anchor_text_ds

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        tot = int(df["n"].sum())
        p = df["n"].to_numpy(np.float64) / tot
        return pd.DataFrame({
            "dst_url": [df["dst_url"].iloc[0]], "n_anchors": [tot],
            "n_distinct": [len(df)],
            "anchor_entropy": [float(round6(-(p * np.log(p)).sum()))]})

    return anchor_text_ds(sf_dir).groupby("dst_url").map_groups(
        fin, batch_format="pandas").sort("dst_url")


def _q_rank_by_depth(sf_dir: str):
    """Do deeper URLs rank lower? Mean PageRank by URL path depth —
    the rank/crawl-depth diagnostic. Map-side (depth, Σr, n) partials;
    the shuffle carries ≤ max-depth rows per batch."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from neo4j_graph_algorithms_ray.algorithms import pagerank
    from neo4j_graph_algorithms_ray.functions.text import round6
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_web_graph
    from neo4j_graph_algorithms_ray.util import preagg_sum

    g = get_web_graph(sf_dir)
    pr = pagerank(g, 0.85, max_iterations=PR_ITERS, node_col="url").dataset

    def partial(b: pa.Table) -> pa.Table:
        path = pc.replace_substring_regex(b["url"],
                                          pattern=r"^[a-z]+://[^/]*",
                                          replacement="")
        depth = pc.count_substring_regex(path, r"/[^/]") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"depth": pa.array(depth),
                         "sum_r": b["score"],
                         "n_pages": pa.array(np.ones(b.num_rows, np.int64))})

    agg = preagg_sum(pr.map_batches(partial, batch_format="pyarrow"),
                     ["depth"], ["sum_r", "n_pages"])

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({
            "depth": b["depth"], "n_pages": b["n_pages"],
            "mean_rank": pa.array(round6(
                b["sum_r"].to_numpy(zero_copy_only=False)
                / b["n_pages"].to_numpy(zero_copy_only=False)))})

    return agg.map_batches(fin, batch_format="pyarrow").sort("depth")


def _q_freq_spectrum(sf_dir: str):
    """Token count-of-counts (Zipf spectrum) — functions/text.freq_spectrum."""
    from neo4j_graph_algorithms_ray.functions.text import freq_spectrum
    return freq_spectrum(_docs(sf_dir))


def _q_compression_ratio(sf_dir: str):
    """zlib compressibility per doc (rows-only; pinned pytest) —
    functions/text.CompressionRatio."""
    from neo4j_graph_algorithms_ray.functions.text import CompressionRatio
    return _docs(sf_dir).map_batches(CompressionRatio(),
                                     batch_format="pyarrow",
                                     batch_size=4096)


def _q_logreg_quality(sf_dir: str):
    """Distributed logistic-regression language classifier (rows-only;
    numpy-replay pytest) — functions/text.logreg_quality."""
    from neo4j_graph_algorithms_ray.functions.text import logreg_quality
    from neo4j_graph_algorithms_ray.util import read_parquet_clean
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text", "lang"])
    return logreg_quality(docs)


def _q_readability(sf_dir: str):
    """Flesch-style readability proxies per document (three RE2 count
    kernels, no shuffle) — functions/text.py:readability."""
    from neo4j_graph_algorithms_ray.functions.text import readability
    return readability(_docs(sf_dir))


def _q_negative_edges(sf_dir: str):
    """Deterministic negative sampling for contrastive link-prediction
    training: per source url, 8 md5 trials index into the global url
    ordinal table; candidates that hit the source itself or an existing
    edge are discarded and the first 3 survivors (by trial order) kept.

    Scale shape: the ordinal map is a sorted zip_with_index Dataset
    (never a driver array); candidates attach their target url through
    an integer-keyed join, existing edges are removed by a left-outer
    anti-join on (src, dst), and the per-source head-k is the grouped
    top-k primitive (map-side partial + grouped finish). Repo-standard
    60-bit md5 so the SQL oracle replays the trials bit-for-bit."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from neo4j_graph_algorithms_ray.functions.dedup import _md5_u64
    from neo4j_graph_algorithms_ray.pipelines.webgraph import web_edge_ds
    from neo4j_graph_algorithms_ray.sources.pages import read_pages
    from neo4j_graph_algorithms_ray.util import (safe_join, topk_per_group,
                                                 zip_with_index)

    J, K = 8, 3
    urls = read_pages(sf_dir, columns=["url"]).sort("url")
    ords = zip_with_index(urls, index_col="ord")
    n = ords.count()

    def cand(b: pa.Table) -> pa.Table:
        u = b["url"].combine_chunks()
        j = np.tile(np.arange(1, J + 1, dtype=np.int64), len(u))
        src = pa.array(np.repeat(np.asarray(u.to_pylist(), dtype=object), J))
        keys = pc.binary_join_element_wise(
            src, "#neg#", pa.array(j.astype(str)), "")
        vals, inv = _md5_u64(np.asarray(keys.to_pylist(), dtype=object), 15)
        o = (vals[inv] % np.uint64(n)).astype(np.int64)
        return pa.table({"src_url": src, "trial": pa.array(j),
                         "ord": pa.array(o)})

    cands = urls.map_batches(cand, batch_format="pyarrow")
    tgt = safe_join(cands, ords.rename_columns({"url": "dst_url"}),
                    "inner", 16, on=("ord",))
    tgt = tgt.filter(expr="dst_url != src_url") \
        .select_columns(["src_url", "trial", "dst_url"])
    edges = web_edge_ds(sf_dir).map_batches(
        lambda b: pa.table({"src_url": b["src_url"],
                            "dst_url": b["dst_url"],
                            "__hit": pa.array(np.ones(b.num_rows, np.int8))}),
        batch_format="pyarrow")
    aj = safe_join(tgt, edges, "left_outer", 16, on=("src_url", "dst_url"))
    neg = aj.map_batches(
        lambda b: b.filter(pc.is_null(b["__hit"])).drop_columns(["__hit"]),
        batch_format="pyarrow")
    out = topk_per_group(neg, ["src_url"], "trial", K, descending=False)
    return out.select_columns(["src_url", "dst_url", "trial"]) \
        .sort(["src_url", "trial"])


def _q_ppr_sweep_cut(sf_dir: str):
    """Local community detection by PPR sweep cut (Andersen-Chung-Lang
    FOCS'06): rank pages by personalized PageRank from the seed page
    (round6 scores, ties by url — bit-reproducible order), then the
    conductance φ(S_k) = cut(S_k) / min(vol(S_k), vol(V∖S_k)) of every
    prefix of the top-100 ranks over the undirected page graph — the
    curve whose argmin is the seed's community.

    Scale shape: the sweep is capped at T ranks, so only the T-row rank
    map travels (closure-broadcast); per-edge min/max-rank histograms
    are map-side bincounts reduced to ≤T rows, and prefix sums finish
    on the driver over T rows. The corpus-sized pieces (PPR, degree
    table, edge classification) all stay distributed."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from neo4j_graph_algorithms_ray.algorithms import pagerank
    from neo4j_graph_algorithms_ray.functions.text import round6
    from neo4j_graph_algorithms_ray.pipelines.webgraph import (get_web_graph,
                                                               web_edge_ds)
    from neo4j_graph_algorithms_ray.sources.pages import url_of
    from neo4j_graph_algorithms_ray.util import preagg_sum, predistinct

    T = 100
    g = get_web_graph(sf_dir)
    ppr = pagerank(g, 0.85, max_iterations=PR_ITERS, node_col="url",
                   source_nodes=[url_of(0)]).dataset
    top = _round6(ppr, "score") \
        .sort(["score", "url"], descending=[True, False]).limit(T).take_all()
    rank = {r["url"]: i + 1 for i, r in enumerate(top)}     # ≤ T entries
    ranked_urls = pa.array(list(rank))

    def to_und(b: pa.Table) -> pa.Table:
        lt = pc.less(b["src_url"], b["dst_url"])
        lo = pc.if_else(lt, b["src_url"], b["dst_url"])
        hi = pc.if_else(lt, b["dst_url"], b["src_url"])
        return pa.table({"a": lo, "b": hi})

    und = predistinct(web_edge_ds(sf_dir).map_batches(
        to_und, batch_format="pyarrow"), ["a", "b"]).materialize()
    n_pairs = und.count()

    # degree of each RANKED node over the undirected simple graph
    incid = und.map_batches(
        lambda b: pa.table({
            "url": pa.concat_arrays([b["a"].combine_chunks(),
                                     b["b"].combine_chunks()]),
            "dg": pa.array(np.ones(2 * b.num_rows, np.int64))}),
        batch_format="pyarrow")
    incid = incid.map_batches(
        lambda b: b.filter(pc.is_in(b["url"], value_set=ranked_urls)),
        batch_format="pyarrow")
    degs = {r["url"]: r["dg"]
            for r in preagg_sum(incid, ["url"], "dg").take_all()}  # ≤ T

    def hist(b: pa.Table, *, _urls=ranked_urls, _t=T) -> pa.Table:
        # vectorized rank lookup: position in the rank-ordered url list
        # (+1 → 1-based rank), misses → T+1
        ra = pc.add(pc.fill_null(pc.index_in(b["a"], value_set=_urls), _t),
                    1).to_numpy(zero_copy_only=False).astype(np.int64)
        rb = pc.add(pc.fill_null(pc.index_in(b["b"], value_set=_urls), _t),
                    1).to_numpy(zero_copy_only=False).astype(np.int64)
        mn, mx = np.minimum(ra, rb), np.maximum(ra, rb)
        hmin = np.bincount(mn[mn <= _t], minlength=_t + 1)[1:]
        hmax = np.bincount(mx[mx <= _t], minlength=_t + 1)[1:]
        return pa.table({"k": pa.array(np.arange(1, _t + 1)),
                         "hmin": pa.array(hmin.astype(np.int64)),
                         "hmax": pa.array(hmax.astype(np.int64))})

    hs = preagg_sum(und.map_batches(hist, batch_format="pyarrow"),
                    ["k"], ["hmin", "hmax"]).take_all()          # ≤ T rows
    hmin = np.zeros(T + 1, np.int64)
    hmax = np.zeros(T + 1, np.int64)
    for r in hs:
        hmin[r["k"]], hmax[r["k"]] = r["hmin"], r["hmax"]
    cut = np.cumsum(hmin) - np.cumsum(hmax)
    vol_tot = 2 * n_pairs
    vol = np.cumsum([0] + [degs.get(r["url"], 0) for r in top])
    ks, cuts, vols, conds = [], [], [], []
    for k in range(1, len(top) + 1):
        mv = min(vol[k], vol_tot - vol[k])
        if mv <= 0:
            continue
        ks.append(k)
        cuts.append(int(cut[k]))
        vols.append(int(vol[k]))
        conds.append(cut[k] / mv)
    return pa.table({"k": pa.array(ks, type=pa.int64()),
                     "cut_edges": pa.array(cuts, type=pa.int64()),
                     "volume": pa.array(vols, type=pa.int64()),
                     "conductance": pa.array(round6(conds))})


def _q_web_wcc_sizes(sf_dir: str):
    from neo4j_graph_algorithms_ray.algorithms import wcc
    from neo4j_graph_algorithms_ray.algorithms.common import translate_vid_columns
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_web_graph
    g = get_web_graph(sf_dir, undirected=True)
    res = wcc(g)
    comp = translate_vid_columns(g, res.dataset, ["component"])
    return comp.groupby("component").count().rename_columns({"count()": "size"})


def entry() -> Any:
    """Flagship pipeline (the north star end-to-end): Common-Crawl-style
    pages parquet → actor-pool href extraction over zero-copy Arrow →
    CSR link graph → PageRank to 1e-7 convergence → top-20 urls."""
    sf_dir = "/root/testdata/sf0.001"
    from neo4j_graph_algorithms_ray.algorithms import pagerank
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_web_graph
    g = get_web_graph(sf_dir)
    res = pagerank(g, 0.85, max_iterations=200, tolerance=1e-7, node_col="url")
    return res.dataset.sort(["score", "url"], descending=[True, False]).limit(TOPK)


def _quiet_point(fn: Callable[[str], Any]) -> Callable[[str], Any]:
    """Collect garbage at the query boundary before running `fn`.

    Long single-session harness runs (50+ back-to-back pipelines) let
    CPython's allocator-triggered gc free dead ObjectRefs at arbitrary
    moments — including while the *next* pipeline's tasks are in
    flight. That free path (RemoveLocalReference → cancel) racing a
    task-completion reply is the Ray 2.49 crash we've observed twice
    (`task_manager.cc:930 Check failed: it != submissible_tasks_`,
    after ~40 and ~94 consecutive queries). Forcing collection while
    nothing is in flight drains the finalizer backlog at a quiet point
    and shrinks that race window to near zero.
    """
    import functools
    import gc

    @functools.wraps(fn)
    def run(sf_dir: str) -> Any:
        gc.collect()
        return fn(sf_dir)

    return run


# Round-5 driver window (the correctness gate checks the FIRST 50
# queries() entries only). Composition per VERDICT r04 item 1: the two
# permanently-`no_oracle` rows (kmeans_clusters, cluster_balanced_sample)
# are evicted past position 50; 48 slots go to SQL-oracled queries that
# have never had a driver-signed row — the session-9/10 additions, the
# §2 stragglers (triangles_stream, avg_clustering, labelprop_seeded,
# scc_condensation, radius_diameter, algo_list) and the north-rule
# resume/incremental family (labelprop_resumed, web_pagerank_incremental,
# wcc_incremental) — plus minhash_lsh_pairs / simhash_pairs kept as
# regression sentinels for the round-5 Arrow-native dedup bucket rewrite
# (VERDICT item 5).
_WINDOW_R05 = [
    "minhash_lsh_pairs", "simhash_pairs",
    "hub_removal_wcc", "host_simrank", "wl_colors", "edge_percolation",
    "negative_edges", "web_cheirank", "minhash_band_load",
    "simhash_bit_balance", "triangles_stream", "avg_clustering",
    "labelprop_seeded", "scc_condensation", "radius_diameter", "algo_list",
    "labelprop_resumed", "web_pagerank_incremental", "wcc_incremental",
    "boilerplate_strip", "page_meta", "trigram_xent", "incremental_dedup",
    "condensation_levels", "web_matching", "crawl_frontier",
    "canonical_dedup", "pii_redact", "event_transitions", "host_rank_hhi",
    "url_templates", "lang_mixing", "lang_assortativity", "lang_rank_mass",
    "rank_degree_corr", "host_lang_profile", "readability",
    "ppr_sweep_cut", "rank_movers", "length_rank_corr", "snowball_sample",
    "coupling", "square_count", "heaps_law", "tokenizer_fertility",
    "host_hll_outlinks", "damping_sensitivity", "token_burstiness",
    "crawl_budget", "conversion_lag",
]


def _queries_impl() -> dict[str, Callable[[str], Any]]:
    # ORDER MATTERS: the driver's correctness gate checks the FIRST 50
    # entries only; _WINDOW_R05 (above) is pulled to the front, the
    # rest keep their round-4 relative order (multi-round-green queries
    # stay at the back).
    base = {
        "minhash_lsh_pairs": _q_minhash_pairs,
        "simhash_pairs": _q_simhash_pairs,
        "ann_lsh_topk": _q_ann_lsh_topk,
        # token_count / quality_score / langid rotated below the window
        # (r03 driver passes, implementations unchanged); their slots go
        # to the north-star resume/convergence queries, never
        # driver-checked.
        "web_pagerank_resumed": _q_web_pagerank_resumed,
        "wcc_resumed": _q_wcc_resumed,
        "pagerank_trace": _q_pagerank_trace,
        # fingerprint rotated below the window (r01 driver pass; this
        # round's vectorization is pinned by pytest + the local gate);
        # its slot goes to gopher_quality (new, never driver-checked).
        "gopher_quality": _q_gopher_quality,
        "vocab_topk": _q_vocab_topk,
        "hll_registers": _q_hll_registers,
        "bloom_urls": _q_bloom_urls,
        "cms_tokens": _q_cms_tokens,
        "bigram_topk": _q_bigram_topk,
        "length_percentiles": _q_length_percentiles,
        "pmi_topk": _q_pmi_topk,
        "hash_features": _q_hash_features,
        "degree_histogram": _q_degree_histogram,
        # doc_sample rotated back: its md5-pinned sampling mechanism is the
        # same as stratified_sample's (which stays in the window) and it has
        # a local SQL-oracle green; the slot goes to pii_counts (new, never
        # driver-checked).
        "pii_counts": _q_pii_counts,
        "repetition_ratio": _q_repetition_ratio,
        "tfidf_topk": _q_tfidf_topk,
        "stratified_sample": _q_stratified_sample,
        "inverted_index": _q_inverted_index,
        "doc_length_histogram": _q_doc_length_histogram,
        # ngram_jaccard_pairs rotated below the window (r03 driver pass);
        # slot goes to community_conductance (never driver-checked).
        "community_conductance": _q_community_conductance,
        "neardup_clusters": _q_neardup_clusters,
        # embedding_neardup rotated below the window (r01 driver pass;
        # its within-block pairs kernel is exercised by semantic_dedup,
        # which is new and SQL-oracled).
        "semantic_dedup": _q_semantic_dedup,
        # ann_cosine_topk rotated below the window (r03 driver pass);
        # slot goes to web_eigenvector (BSP engine, never driver-checked).
        "web_eigenvector": _q_web_eigenvector,
        "ann_ivf_topk": _q_ann_ivf_topk,
        "kmeans_clusters": _q_kmeans_clusters,
        "cluster_balanced_sample": _q_cluster_sample,
        # media_pipeline / window_agg rotated below the window: both have
        # driver passes (r01 / r02) and neither implementation changed this
        # round; their slots go to line_dedup / corpus_clean (new round-4
        # operators, locally SQL-oracle green, never driver-checked).
        "line_dedup": _q_line_dedup,
        # exact_dedup rotated below the window (r03 driver pass);
        # slot goes to host_katz (BSP engine, never driver-checked).
        "host_katz": _q_host_katz,
        # algo_list rotated back: a static registry listing pinned by pytest;
        # the slot goes to decontaminate (new, never driver-checked).
        "decontaminate": _q_decontaminate,
        "corpus_clean": _q_corpus_clean,
        "hopping_agg": _q_hopping_agg,
        "window_unique_users": _q_window_unique_users,
        "sessionize": _q_sessionize,
        "session_stats": _q_session_stats,
        "asof_purchase": _q_asof_purchase,
        "funnel": _q_funnel,
        "retention_cohorts": _q_retention,
        # ---- end of the 40 previously-unverified; the 10 slots below
        # carry this round's NEW §2-coverage queries (operators that
        # were pytest-only or untested until now) ----
        "mscoloring": _q_mscoloring,
        "mst_prim": _q_mst_prim,
        "msf_boruvka": _q_msf_boruvka,
        "getting_started": _q_getting_started,
        "filter_metapaths": _q_filter_metapaths,
        "metapaths_for_instances": _q_metapaths_for_instances,
        "metapath_precompute_hubs": _q_metapath_precompute_hubs,
        "scalars_flags": _q_scalars_flags,
        "graph_catalog": _q_graph_catalog,
        "betweenness_maxdepth": _q_betweenness_maxdepth,
        # --- below here: outside the r04 window; rotate into the
        # window next round (never driver-verified yet). Session-10
        # additions (boilerplate_strip, page_meta, trigram_xent,
        # incremental_dedup, balanced_partition) lead the queue. ---
        "boilerplate_strip": _q_boilerplate_strip,
        "page_meta": _q_page_meta,
        "trigram_xent": _q_trigram_xent,
        "incremental_dedup": _q_incremental_dedup,
        "balanced_partition": _q_balanced_partition,
        "web_matching": _q_web_matching,
        "condensation_levels": _q_condensation_levels,
        "crawl_frontier": _q_crawl_frontier,
        "canonical_dedup": _q_canonical_dedup,
        "pii_redact": _q_pii_redact,
        "pq_codes": _q_pq_codes,
        "event_transitions": _q_event_transitions,
        "host_rank_hhi": _q_host_rank_hhi,
        "url_templates": _q_url_templates,
        "hub_removal_wcc": _q_hub_removal_wcc,
        "host_simrank": _q_host_simrank,
        "lang_mixing": _q_lang_mixing,
        "lang_assortativity": _q_lang_assortativity,
        "lang_rank_mass": _q_lang_rank_mass,
        "rank_degree_corr": _q_rank_degree_corr,
        "host_lang_profile": _q_host_lang_profile,
        "readability": _q_readability,
        "ppr_sweep_cut": _q_ppr_sweep_cut,
        "rank_movers": _q_rank_movers,
        "length_rank_corr": _q_length_rank_corr,
        "snowball_sample": _q_snowball_sample,
        "coupling": _q_coupling,
        "wl_colors": _q_wl_colors,
        "square_count": _q_square_count,
        "heaps_law": _q_heaps_law,
        "edge_percolation": _q_edge_percolation,
        "minhash_band_load": _q_minhash_band_load,
        "simhash_bit_balance": _q_simhash_bit_balance,
        "tokenizer_fertility": _q_tokenizer_fertility,
        "host_hll_outlinks": _q_host_hll_outlinks,
        "damping_sensitivity": _q_damping_sensitivity,
        "token_burstiness": _q_token_burstiness,
        "crawl_budget": _q_crawl_budget,
        "conversion_lag": _q_conversion_lag,
        "value_percentiles": _q_value_percentiles,
        "rank_residual": _q_rank_residual,
        "degree_drift": _q_degree_drift,
        "orphan_pages": _q_orphan_pages,
        "host_rank_gini": _q_host_rank_gini,
        "web_pagerank_anchor_weighted": _q_web_pagerank_anchor_weighted,
        "reciprocal_rank_boost": _q_reciprocal_rank_boost,
        "quality_assortativity": _q_quality_assortativity,
        "host_insularity": _q_host_insularity,
        "host_reciprocity": _q_host_reciprocity,
        "dup_rank_report": _q_dup_rank_report,
        "web_cheirank": _q_web_cheirank,
        "rank_flows": _q_rank_flows,
        "anchor_entropy": _q_anchor_entropy,
        "rank_by_depth": _q_rank_by_depth,
        "freq_spectrum": _q_freq_spectrum,
        "compression_ratio": _q_compression_ratio,
        "logreg_quality": _q_logreg_quality,
        "negative_edges": _q_negative_edges,
        "bm25_topk": _q_bm25_topk,
        "nb_quality": _q_nb_quality,
        "knn_graph": _q_knn_graph,
        "embedding_clusters": _q_embedding_clusters,
        "chunk_documents": _q_chunk_documents,
        "pack_sequences": _q_pack_sequences,
        "gopher_repetition": _q_gopher_repetition,
        "weighted_sample": _q_weighted_sample,
        "mixture_weights": _q_mixture_weights,
        "ngram_containment_pairs": _q_ngram_containment,
        "span_dedup": _q_span_dedup,
        "anf": _q_anf,
        "bigram_xent": _q_bigram_xent,
        "web_ktruss": _q_web_ktruss,
        "web_kcore_decomposition": _q_web_kcore_decomposition,
        "web_spam_mass": _q_web_spam_mass,
        "node2vec_walks": _q_node2vec_walks,
        "ann_cosine_topk": _q_ann_topk,
        "web_salsa": _q_web_salsa,
        "link_prediction": _q_link_prediction,
        "web_opic": _q_web_opic,
        "web_pagerank_dangling": _q_web_pagerank_dangling,
        "token_count": _q_token_count,
        "quality_score": _q_quality,
        "langid": _q_langid,
        "char_entropy": _q_char_entropy,
        "dsir_weights": _q_dsir_weights,
        "web_powerlaw": _q_web_powerlaw,
        "host_triangles": _q_host_triangles,
        "web_bowtie": _q_web_bowtie,
        "lexical_diversity": _q_lexical_diversity,
        "sentence_stats": _q_sentence_stats,
        "slice_kl": _q_slice_kl,
        "dup_ngram_frac": _q_dup_ngram_frac,
        "winnow_fingerprints": _q_winnow_fingerprints,
        "heavy_hitter_hosts": _q_heavy_hitter_hosts,
        "two_hop_size": _q_two_hop_size,
        "effective_diameter": _q_effective_diameter,
        "url_canonical": _q_url_canonical,
        "corpus_token_budget": _q_corpus_token_budget,
        "lang_length_percentiles": _q_lang_length_percentiles,
        "mis_hosts": _q_mis_hosts,
        "host_distinct_outlinks": _q_host_distinct_outlinks,
        "filter_report": _q_filter_report,
        "host_articlerank": _q_host_articlerank,
        "web_graph_summary": _q_web_graph_summary,
        "embedding_dim_stats": _q_embedding_dim_stats,
        "ngram_jaccard_pairs": _q_ngram_jaccard,
        "modularity_score": _q_modularity_score,
        "labelprop_seeded": _q_labelprop_seeded,
        "rich_club": _q_rich_club,
        "global_transitivity": _q_global_transitivity,
        "zipf_alpha": _q_zipf_alpha,
        "vocab_coverage": _q_vocab_coverage,
        "host_outlink_entropy": _q_host_outlink_entropy,
        "scc_condensation": _q_scc_condensation,
        "local_bridges": _q_local_bridges,
        "simhash_clusters": _q_simhash_clusters,
        "triangles_stream": _q_triangles_stream,
        "labelprop_resumed": _q_labelprop_resumed,
        "avg_clustering": _q_avg_clustering,
        "degree_gini": _q_degree_gini,
        "radius_diameter": _q_radius_diameter,
        "dedup_rate_by_source": _q_dedup_rate_by_source,
        "exact_dedup": _q_exact_dedup,
        "node_similarity": _q_node_similarity,
        "minhash_eval": _q_minhash_eval,
        "vocab_novelty": _q_vocab_novelty,
        "lang_vocab_overlap": _q_lang_vocab_overlap,
        "dedup_sensitivity": _q_dedup_sensitivity,
        "web_pagerank_incremental": _q_web_pagerank_incremental,
        "wcc_incremental": _q_wcc_incremental,
        "edge_prune_topm": _q_edge_prune_topm,
        "shard_plan": _q_shard_plan,
        "web_ppr_batch": _q_web_ppr_batch,
        "simhash_eval": _q_simhash_eval,
        "host_features": _q_host_features,
        "tfidf_cosine_pairs": _q_tfidf_cosine_pairs,
        "latest_event_per_user": _q_latest_event_per_user,
        "window_topk_types": _q_window_topk_types,
        "embedding_gram": _q_embedding_gram,
        "embedding_pca": _q_embedding_pca,
        "langid_confusion": _q_langid_confusion,
        "quality_by_source": _q_quality_by_source,
        "embedding_quantize": _q_embedding_quantize,
        "ann_eval": _q_ann_eval,
        "induced_subgraph": _q_induced_subgraph,
        "url_depth_stats": _q_url_depth_stats,
        "window_anomaly": _q_window_anomaly,
        "host_hits": _q_host_hits,
        "ranked_anchor_report": _q_ranked_anchor_report,
        "degree_percentiles": _q_degree_percentiles,
        # ---------------- position 51+ (multi-round green) -------
        "fingerprint": _q_fingerprint,
        "embedding_neardup": _q_emb_neardup,
        "media_pipeline": _q_media,
        "window_agg": _q_window_agg,
        "web_pagerank": _q_web_pagerank,
        "pagerank": _q_pagerank,
        "wcc": _q_wcc,
        "louvain": _q_louvain,
        "triangle_count_per_node": _q_triangle_per_node,
        "metapaths": _q_metapaths,
        "betweenness_sampled": _q_betweenness_sampled,
        "sssp": _q_sssp,
        "scc": _q_scc,
        "labelprop": _q_labelprop,
        "page_text": _q_page_text,
        "page_links": _q_page_links,
        "page_links_tolerant": _q_page_links_tolerant,
        "web_degrees": _q_web_degrees,
        "web_pagerank_topk": _q_web_pagerank_topk,
        "web_wcc_sizes": _q_web_wcc_sizes,
        "web_ppr": _q_web_ppr,
        "web_hits": _q_web_hits,
        "web_kcore": _q_web_kcore,
        "random_walks": _q_random_walks,
        "cocitation": _q_cocitation,
        "reciprocity": _q_reciprocity,
        "anchor_texts": _q_anchor_texts,
        "top_anchor_per_page": _q_top_anchor_per_page,
        "host_graph": _q_host_graph,
        "host_crawl_recency": _q_host_crawl_recency,
        "host_pagerank": _q_host_pagerank,
        "host_pagerank_weighted": _q_host_pagerank_weighted,
        "host_rank_mass": _q_host_rank_mass,
        "host_top_pages": _q_host_top_pages,
        "neighbor_degree_mean": _q_neighbor_degree_mean,
        "assortativity": _q_assortativity,
        "pagerank_topk": _q_pagerank_topk,
        "wcc_sizes": _q_wcc_sizes,
        "labelprop_weighted": _q_labelprop_weighted,
        "triangle_count_global": _q_triangle_global,
        "degrees": _q_degrees,
        "in_degrees": _q_in_degrees,
        "graph_stats": _q_graph_stats,
        "get_schema": _q_get_schema,
        "metapaths_schema_full": _q_metapaths_schema_full,
        "label_ids": _q_label_ids,
        "closeness_sampled": _q_closeness_sampled,
        "harmonic_sampled": _q_harmonic_sampled,
        "eccentricity_sampled": _q_eccentricity_sampled,
        "closeness_weighted": _q_closeness_weighted,
        "sssp_path": _q_sssp_path,
        "wcc_threshold": _q_wcc_threshold,
        "hop_distances": _q_hop_distances,
        "all_pairs_weighted": _q_all_pairs_weighted,
        "betweenness_exact": _q_betweenness_exact,
        # rotated out of the window to make room for decontaminate /
        # pii_counts above (both never driver-checked)
        "algo_list": _q_algo_list,
        "doc_sample": _q_doc_sample,
    }
    out = {k: base[k] for k in _WINDOW_R05}
    # after the window: queries with no driver-signed green row yet
    # (the r06 rotation queue), then the multi-round-verified backlog —
    # keeps "rotate the first 50 after the window" a one-list edit.
    never_verified = [
        "page_links_tolerant",
        "value_percentiles", "rank_residual", "degree_drift",
        "orphan_pages", "host_rank_gini", "web_pagerank_anchor_weighted",
        "reciprocal_rank_boost",
        "quality_assortativity", "host_insularity", "host_reciprocity",
        "dup_rank_report", "rank_flows", "anchor_entropy", "rank_by_depth",
        "freq_spectrum", "bm25_topk", "nb_quality", "knn_graph",
        "embedding_clusters", "chunk_documents", "pack_sequences",
        "gopher_repetition", "weighted_sample", "mixture_weights",
        "ngram_containment_pairs", "span_dedup", "bigram_xent",
        "web_ktruss", "web_kcore_decomposition", "web_spam_mass",
        "node2vec_walks", "web_salsa", "link_prediction", "web_opic",
        "web_pagerank_dangling", "char_entropy", "dsir_weights",
        "web_powerlaw", "host_triangles", "web_bowtie",
        "lexical_diversity", "sentence_stats", "slice_kl",
        "dup_ngram_frac", "winnow_fingerprints", "heavy_hitter_hosts",
        "two_hop_size", "effective_diameter", "url_canonical",
        "corpus_token_budget", "lang_length_percentiles", "mis_hosts",
        "host_distinct_outlinks", "filter_report", "host_articlerank",
        "web_graph_summary", "embedding_dim_stats", "modularity_score",
        "rich_club", "global_transitivity", "zipf_alpha",
        "vocab_coverage", "host_outlink_entropy", "local_bridges",
        "simhash_clusters", "degree_gini", "dedup_rate_by_source",
        "node_similarity", "minhash_eval", "vocab_novelty",
        "lang_vocab_overlap", "dedup_sensitivity", "edge_prune_topm",
        "web_ppr_batch", "simhash_eval", "host_features",
        "tfidf_cosine_pairs", "latest_event_per_user", "window_topk_types",
        "embedding_gram", "langid_confusion", "quality_by_source",
        "embedding_quantize", "ann_eval", "induced_subgraph",
        "url_depth_stats", "window_anomaly", "host_hits",
        "ranked_anchor_report", "degree_percentiles", "doc_sample",
        # rows-only (no SQL oracle — keep OUT of any driver window)
        "kmeans_clusters", "cluster_balanced_sample", "balanced_partition",
        "pq_codes", "compression_ratio", "logreg_quality", "anf",
        "shard_plan", "embedding_pca",
    ]
    out.update((k, base[k]) for k in never_verified if k not in out)
    out.update((k, v) for k, v in base.items() if k not in out)
    return out


def queries() -> dict[str, Callable[[str], Any]]:  # noqa: F811
    return {k: _quiet_point(v) for k, v in _queries_impl().items()}


def oracle_sql() -> dict[str, str]:
    from neo4j_graph_algorithms_ray.pipelines import oracles as o
    from neo4j_graph_algorithms_ray.pipelines import oracles_docs as od
    from neo4j_graph_algorithms_ray.pipelines import oracles_events as oe
    from neo4j_graph_algorithms_ray.pipelines import oracles_web as ow
    return {
        "page_text": ow.PAGE_TEXT_SQL,
        "page_links": ow.PAGE_LINKS_SQL,
        "page_links_tolerant": ow.PAGE_LINKS_SQL,
        "web_degrees": ow.WEB_DEGREES_SQL,
        "web_pagerank": ow.web_pagerank_sql(PR_ITERS),
        "web_pagerank_topk": ow.web_pagerank_sql(PR_ITERS, topk=TOPK),
        "web_wcc_sizes": ow.web_wcc_sql(30, "sizes"),
        "web_ppr": ow.web_ppr_sql(PR_ITERS),
        "web_spam_mass": ow.web_spam_mass_sql(PR_ITERS),
        "web_hits": ow.web_hits_sql(PR_ITERS),
        "web_eigenvector": ow.web_eigenvector_sql(PR_ITERS),
        "web_salsa": ow.web_salsa_sql(PR_ITERS),
        "link_prediction": ow.link_prediction_sql(20, 50),
        "web_opic": ow.web_opic_sql(PR_ITERS),
        "web_pagerank_dangling": ow.web_pagerank_dangling_sql(PR_ITERS),
        # resume parity: same oracle as the straight run — that's the
        # point (checkpoint+restore must be value-identical)
        "web_pagerank_resumed": ow.web_pagerank_sql(PR_ITERS),
        "wcc_resumed": o.wcc_sql(WCC_SQL_ITERS, "components"),
        "web_kcore": ow.web_kcore_sql(3, 40),
        "web_kcore_decomposition": ow.web_kcore_decomposition_sql(32),
        "web_ktruss": ow.web_ktruss_sql(4, 14),
        "random_walks": ow.random_walks_sql(4, 7),
        "node2vec_walks": ow.node2vec_walks_sql(4, 7, 1, 2),
        "cocitation": ow.cocitation_sql(20, 50),
        "reciprocity": ow.RECIPROCITY_SQL,
        "anchor_texts": ow.ANCHOR_TEXTS_SQL,
        "top_anchor_per_page": ow.TOP_ANCHOR_PER_PAGE_SQL,
        "host_graph": ow.HOST_GRAPH_SQL,
        "host_crawl_recency": ow.HOST_CRAWL_RECENCY_SQL,
        "host_pagerank": ow.host_pagerank_sql(PR_ITERS),
        "host_pagerank_weighted": ow.host_pagerank_weighted_sql(PR_ITERS),
        "host_rank_mass": ow.host_rank_mass_sql(PR_ITERS),
        "host_top_pages": ow.host_top_pages_sql(2),
        "neighbor_degree_mean": ow.NEIGHBOR_DEGREE_MEAN_SQL,
        "assortativity": ow.ASSORTATIVITY_SQL,
        "pagerank": o.pagerank_sql(PR_ITERS),
        "pagerank_topk": o.pagerank_topk_sql(PR_ITERS, TOPK),
        "wcc": o.wcc_sql(WCC_SQL_ITERS, "components"),
        "wcc_sizes": o.wcc_sql(WCC_SQL_ITERS, "sizes"),
        "labelprop": o.lpa_sql(LPA_SWEEPS),
        "labelprop_resumed": o.lpa_sql(LPA_SWEEPS),
        "triangles_stream": o.TRIANGLES_STREAM_SQL,
        "avg_clustering": o.AVG_CLUSTERING_SQL,
        "degree_gini": ow.DEGREE_GINI_SQL,
        "radius_diameter": o.radius_diameter_sql(10),
        "dedup_rate_by_source": od.DEDUP_RATE_BY_SOURCE_SQL,
        "pagerank_trace": o.pagerank_trace_sql(PR_ITERS),
        "community_conductance": o.lpa_conductance_sql(LPA_SWEEPS),
        "modularity_score": o.lpa_modularity_sql(LPA_SWEEPS),
        "labelprop_seeded": o.lpa_seeded_sql(LPA_SWEEPS),
        "rich_club": ow.RICH_CLUB_SQL,
        "global_transitivity": o.GLOBAL_TRANSITIVITY_SQL,
        "zipf_alpha": od.zipf_alpha_sql(2),
        "vocab_coverage": od.vocab_coverage_sql(ks=(5, 15, 10000)),
        "host_outlink_entropy": ow.HOST_OUTLINK_ENTROPY_SQL,
        "scc_condensation": o.SCC_CONDENSATION_SQL,
        "condensation_levels": o.CONDENSATION_LEVELS_SQL,
        "local_bridges": o.LOCAL_BRIDGES_SQL,
        "simhash_clusters": od.simhash_clusters_sql(),
        "labelprop_weighted": o.lpa_weighted_sql(LPA_SWEEPS),
        "triangle_count_global": o.TRIANGLE_GLOBAL_SQL,
        "triangle_count_per_node": o.TRIANGLE_PER_NODE_SQL,
        "degrees": o.DEGREE_SQL,
        "in_degrees": o.IN_DEGREE_SQL,
        "graph_stats": o.GRAPH_STATS_SQL,
        "metapaths": o.metapath_sql(3),
        "get_schema": o.GET_SCHEMA_SQL,
        # louvain: exact unrolled parity-sweep mirror (gains are
        # integer-valued doubles, so the SQL replays the engine
        # decision-for-decision); betweenness via the pair-dependency
        # identity with md5-deterministic sampling.
        "louvain": o.louvain_sql(LOUVAIN_SWEEPS),
        "betweenness_sampled": ow.host_betweenness_sql(sample=10),
        "betweenness_exact": ow.host_betweenness_sql(),
        "betweenness_maxdepth": ow.host_betweenness_sql(max_depth=3),
        "mscoloring": o.mscoloring_sql(WCC_SQL_ITERS),
        "mst_prim": ow.host_mst_sql("prim"),
        "msf_boruvka": ow.host_mst_sql("boruvka"),
        "getting_started": o.GETTING_STARTED_SQL,
        "filter_metapaths": o.filter_metapaths_sql(3, "Customer", "Nation"),
        "metapaths_for_instances": o.METAPATHS_FOR_INSTANCES_SQL,
        "metapath_precompute_hubs": o.precompute_high_degree_sql(0.01),
        "scalars_flags": o.SCALARS_SQL,
        "graph_catalog": o.GRAPH_CATALOG_SQL,
        "algo_list": o.ALGO_LIST_SQL,
        "metapaths_schema_full": o.SCHEMA_FULL_SQL,
        "label_ids": o.LABEL_IDS_SQL,
        "closeness_sampled": o.closeness_sampled_sql(10),
        "harmonic_sampled": o.harmonic_sampled_sql(10),
        "eccentricity_sampled": o.eccentricity_sampled_sql(10),
        "closeness_weighted": o.closeness_weighted_sql(15, 4),
        "sssp": o.sssp_sql(15),
        "sssp_path": o.sssp_path_sql(15),
        "wcc_threshold": o.wcc_threshold_sql(30, 3),
        "hop_distances": o.hop_distances_sql(10),
        "all_pairs_weighted": o.all_pairs_weighted_sql(15, 4),
        # scc: exact SQL oracle via a recursive reachability closure
        # (mutual-reach max-id components — feasible at sf0.01 scale).
        "scc": o.SCC_SQL,
        # documents / embeddings pipelines (oracles_docs.py). Every hash
        # sketch is md5-anchored, so minhash/simhash have bit-exact SQL
        # mirrors. ann_lsh stays rows-only: its buckets come from seeded
        # Gaussian projection planes (not SQL-expressible); pytest checks
        # its recall against brute force instead.
        # event-stream operators (oracles_events.py): tumbling window,
        # gap sessionization, strict as-of join (DuckDB ASOF JOIN).
        "window_agg": oe.window_agg_sql(EVENT_WINDOW_S),
        "hopping_agg": oe.hopping_agg_sql(EVENT_WINDOW_S, EVENT_WINDOW_S // 4),
        "window_unique_users": oe.window_unique_users_sql(EVENT_WINDOW_S),
        "sessionize": oe.sessionize_sql(EVENT_GAP_S),
        "session_stats": oe.session_stats_sql(EVENT_GAP_S),
        "asof_purchase": oe.ASOF_PURCHASE_SQL,
        "funnel": oe.funnel_sql(("view", "click", "purchase"), 86400),
        "retention_cohorts": oe.retention_sql(604800),
        "exact_dedup": od.EXACT_DEDUP_SQL,
        "token_count": od.TOKEN_COUNT_SQL,
        "quality_score": od.QUALITY_SQL,
        "char_entropy": od.CHAR_ENTROPY_SQL,
        "dsir_weights": od.dsir_sql(1024, 10),
        "lexical_diversity": od.LEXICAL_DIVERSITY_SQL,
        "sentence_stats": od.SENTENCE_STATS_SQL,
        "slice_kl": od.SLICE_KL_SQL,
        "dup_ngram_frac": od.dup_ngram_frac_sql(5, 2),
        "winnow_fingerprints": od.winnow_sql(8, 4),
        "heavy_hitter_hosts": ow.heavy_hitter_hosts_sql(20),
        "two_hop_size": ow.TWO_HOP_SIZE_SQL,
        "effective_diameter": ow.effective_diameter_sql(0.9),
        "url_canonical": ow.URL_CANONICAL_SQL,
        "corpus_token_budget": od.TOKEN_BUDGET_SQL,
        "lang_length_percentiles": od.lang_length_percentiles_sql(),
        "mis_hosts": ow.mis_luby_sql(8),
        "web_matching": ow.web_matching_sql(8),
        "crawl_frontier": ow.CRAWL_FRONTIER_SQL,
        "canonical_dedup": ow.CANONICAL_DEDUP_SQL,
        "pii_redact": od.PII_REDACT_SQL,
        "event_transitions": oe.EVENT_TRANSITIONS_SQL,
        "host_rank_hhi": ow.host_rank_hhi_sql(PR_ITERS),
        "url_templates": ow.URL_TEMPLATES_SQL,
        "hub_removal_wcc": ow.hub_removal_wcc_sql(60, 20),
        "host_simrank": ow.host_simrank_sql(5, 0.8),
        "lang_mixing": ow.LANG_MIXING_SQL,
        "lang_assortativity": ow.LANG_ASSORTATIVITY_SQL,
        "lang_rank_mass": ow.lang_rank_mass_sql(PR_ITERS),
        "rank_degree_corr": ow.rank_degree_corr_sql(PR_ITERS),
        "host_lang_profile": ow.HOST_LANG_PROFILE_SQL,
        "readability": od.READABILITY_SQL,
        "ppr_sweep_cut": ow.ppr_sweep_cut_sql(PR_ITERS, 100, 0),
        "freq_spectrum": od.FREQ_SPECTRUM_SQL,
        "anchor_entropy": ow.ANCHOR_ENTROPY_SQL,
        "web_cheirank": ow.web_cheirank_sql(PR_ITERS),
        "rank_movers": ow.rank_movers_sql(PR_ITERS, 5, 25),
        "length_rank_corr": ow.length_rank_corr_sql(PR_ITERS),
        "snowball_sample": ow.snowball_sample_sql(3, 50, 0),
        "coupling": ow.coupling_sql(20, 50),
        "wl_colors": ow.wl_colors_sql(2),
        "square_count": ow.SQUARE_COUNT_SQL,
        "heaps_law": od.heaps_law_sql(4),
        "edge_percolation": ow.edge_percolation_sql((2, 5, 8), 40),
        "minhash_band_load": od.minhash_band_load_sql(8, 4),
        "simhash_bit_balance": od.SIMHASH_BIT_BALANCE_SQL,
        "tokenizer_fertility": od.TOKENIZER_FERTILITY_SQL,
        "host_hll_outlinks": ow.HOST_HLL_OUTLINKS_SQL,
        "damping_sensitivity": ow.damping_sensitivity_sql(
            PR_ITERS, (0.5, 0.85, 0.95), 20),
        "token_burstiness": od.token_burstiness_sql(50),
        "crawl_budget": ow.crawl_budget_sql(PR_ITERS, 1000),
        "conversion_lag": oe.conversion_lag_sql("view", "purchase"),
        "value_percentiles": oe.VALUE_PERCENTILES_SQL,
        "rank_residual": ow.rank_residual_sql(10, PR_ITERS),
        "degree_drift": ow.degree_drift_sql(5),
        "orphan_pages": ow.ORPHAN_PAGES_SQL,
        "host_rank_gini": ow.host_rank_gini_sql(PR_ITERS),
        "web_pagerank_anchor_weighted":
            ow.web_pagerank_anchor_weighted_sql(PR_ITERS),
        "reciprocal_rank_boost": ow.reciprocal_rank_boost_sql(PR_ITERS),
        "quality_assortativity": ow.QUALITY_ASSORTATIVITY_SQL,
        "host_insularity": ow.HOST_INSULARITY_SQL,
        "host_reciprocity": ow.HOST_RECIPROCITY_SQL,
        "dup_rank_report": ow.dup_rank_report_sql(PR_ITERS, 25),
        "rank_flows": ow.rank_flows_sql(PR_ITERS, 50),
        "rank_by_depth": ow.rank_by_depth_sql(PR_ITERS),
        "negative_edges": ow.negative_edges_sql(8, 3),
        "host_distinct_outlinks": ow.HOST_DISTINCT_OUTLINKS_SQL,
        "filter_report": od.filter_report_sql(),
        "host_articlerank": ow.host_articlerank_sql(PR_ITERS),
        "web_graph_summary": ow.WEB_GRAPH_SUMMARY_SQL,
        "embedding_dim_stats": od.EMBEDDING_DIM_STATS_SQL,
        "host_katz": ow.host_katz_sql(0.05, 1.0, PR_ITERS),
        "node_similarity": ow.node_similarity_sql(20, 3),
        "minhash_eval": od.minhash_eval_sql(8, 4, 0.5),
        "vocab_novelty": od.VOCAB_NOVELTY_SQL,
        "lang_vocab_overlap": od.LANG_VOCAB_OVERLAP_SQL,
        "dedup_sensitivity": od.dedup_sensitivity_sql((0.3, 0.5, 0.8)),
        "web_pagerank_incremental":
            ow.web_pagerank_incremental_sql(PR_ITERS, 10),
        "wcc_incremental": ow.web_wcc_sql(30, "components"),
        "edge_prune_topm": ow.edge_prune_sql(3, PR_ITERS),
        "web_ppr_batch": ow.web_ppr_batch_sql(PR_ITERS, (0, 1, 2)),
        "simhash_eval": od.simhash_eval_sql(8, 0.5),
        "host_features": ow.host_features_sql(PR_ITERS),
        "tfidf_cosine_pairs": od.tfidf_cosine_sql(0.5, 50),
        "latest_event_per_user": oe.LATEST_EVENT_SQL,
        "embedding_gram": od.EMBEDDING_GRAM_SQL,
        "langid_confusion": od.langid_confusion_sql(),
        "quality_by_source": od.quality_by_source_sql(),
        "embedding_quantize": od.EMBEDDING_QUANTIZE_SQL,
        "ann_eval": od.ANN_EVAL_SQL,
        "induced_subgraph": ow.INDUCED_SUBGRAPH_SQL,
        "url_depth_stats": ow.URL_DEPTH_SQL,
        "window_anomaly": oe.window_anomaly_sql(EVENT_WINDOW_S, 2.0),
        "host_hits": ow.host_hits_sql(PR_ITERS),
        "ranked_anchor_report": ow.ranked_anchor_sql(PR_ITERS, TOPK),
        "degree_percentiles": ow.DEGREE_PERCENTILES_SQL,
        "window_topk_types": oe.window_topk_types_sql(EVENT_WINDOW_S, 3),
        "web_powerlaw": ow.WEB_POWERLAW_SQL,
        "host_triangles": ow.HOST_TRIANGLES_SQL,
        "web_bowtie": ow.WEB_BOWTIE_SQL,
        "langid": od.langid_sql(),
        "fingerprint": od.FINGERPRINT_SQL,
        "gopher_quality": od.gopher_quality_sql(min_words=40,
                                                min_stop_hits=1),
        "vocab_topk": od.vocab_topk_sql(100),
        "hll_registers": od.HLL_REGISTERS_SQL,
        "bloom_urls": ow.BLOOM_URLS_SQL,
        "cms_tokens": od.CMS_TABLE_SQL,
        "bigram_topk": od.BIGRAM_TOPK_SQL,
        "length_percentiles": od.LENGTH_PERCENTILES_SQL,
        "pmi_topk": od.pmi_topk_sql(50, 5),
        "hash_features": od.hash_features_sql(256),
        "degree_histogram": ow.DEGREE_HISTOGRAM_SQL,
        "doc_sample": od.doc_sample_sql(20),
        "repetition_ratio": od.repetition_ratio_sql(),
        "decontaminate": od.DECONTAMINATE_SQL,
        "pii_counts": od.PII_COUNTS_SQL,
        "line_dedup": od.LINE_DEDUP_SQL,
        "boilerplate_strip": od.BOILERPLATE_STRIP_SQL,
        "page_meta": ow.PAGE_META_SQL,
        "trigram_xent": od.trigram_xent_sql(2),
        "incremental_dedup": od.INCREMENTAL_DEDUP_SQL,
        "corpus_clean": od.corpus_clean_sql(),
        "tfidf_topk": od.tfidf_topk_sql(3),
        "bm25_topk": od.bm25_topk_sql(BM25_TERMS, 25),
        "nb_quality": od.nb_quality_sql(min_words=40, min_stop_hits=1),
        "knn_graph": od.knn_graph_sql(5),
        "embedding_clusters": od.embedding_clusters_sql(3, 0.2),
        "chunk_documents": od.chunk_documents_sql(128, 16),
        "pack_sequences": od.pack_sequences_sql(1024),
        "gopher_repetition": od.GOPHER_REPETITION_SQL,
        "weighted_sample": od.weighted_sample_sql(50),
        "mixture_weights": od.MIXTURE_WEIGHTS_SQL,
        "ngram_containment_pairs": od.ngram_containment_sql(threshold=0.5),
        "span_dedup": od.span_dedup_sql(5, 2),
        "bigram_xent": od.bigram_xent_sql(2),
        "stratified_sample": od.stratified_sample_sql(50),
        "inverted_index": od.inverted_index_sql(2),
        "doc_length_histogram": od.doc_length_histogram_sql(100),
        "ngram_jaccard_pairs": od.ngram_jaccard_sql(),
        "minhash_lsh_pairs": od.minhash_sql(),
        "neardup_clusters": od.neardup_clusters_sql(),
        "simhash_pairs": od.simhash_sql(),
        "embedding_neardup": od.EMB_NEARDUP_SQL,
        "semantic_dedup": SEMANTIC_DEDUP_SQL,
        "ann_cosine_topk": od.ANN_TOPK_SQL,
        "ann_lsh_topk": od.ANN_LSH_TOPK_SQL,
        "ann_ivf_topk": od.ANN_TOPK_SQL,
        "media_pipeline": od.MEDIA_SQL,
    }
