"""The flagship web-link-graph pipeline (the north star end-to-end):

    pages parquet (url, warc_ts, html, text, lang)
      → ExtractLinks map_batches (zero-copy Arrow batches, warm task pool)
      → (src_url, dst_url) href edges, self-link filter + distinct
      → dense-id assignment + accumulated-degree CSR shards
      → PageRank / WCC / … over the link graph, scores per url.

Node "original ids" are url strings (the reference's IdMapping maps any
external id space to dense ints — core/.../core/IdMap.java:71-84; ours
maps strings the same way via the vid-ordered vertex table).
"""

from __future__ import annotations

import ray.data as rd

from neo4j_graph_algorithms_ray.graph import GraphTables, build_graph
from neo4j_graph_algorithms_ray.registry import GraphCatalog
from neo4j_graph_algorithms_ray.sources.pages import read_pages
from neo4j_graph_algorithms_ray.stages.extract import ExtractLinks, ExtractText

EXTRACT_BATCH = 4096


def extracted_text_ds(sf_dir: str) -> rd.Dataset:
    """(url, text, lang, warc_ts) with text re-extracted from html
    (must equal the pages table's own text column byte-for-byte).

    The extract stages are INSTANCES, not classes: their state is a few
    pattern strings, so shipping the callable in each task closure and
    running on warm task-pool workers beats an actor pool (which pays
    ~2s pool spin-up per call) ~3.5× at 100k pages. Classes with heavy
    per-actor state (decoders, CSR shards) still go through actor pools
    — see functions/multimodal.py, algorithms/betweenness.py."""
    pages = read_pages(sf_dir, columns=["url", "html", "lang", "warc_ts"])
    return pages.map_batches(ExtractText(), batch_format="pyarrow",
                             batch_size=EXTRACT_BATCH)


def page_meta_ds(sf_dir: str) -> rd.Dataset:
    """(url, title, h1, n_links) per page — title/first-h1 extraction
    plus raw href count (out-degree before self-link/distinct
    normalization). Same warm-task-pool instance pattern as the other
    extract stages."""
    from neo4j_graph_algorithms_ray.stages.extract import ExtractMeta
    pages = read_pages(sf_dir, columns=["url", "html"])
    return pages.map_batches(ExtractMeta(), batch_format="pyarrow",
                             batch_size=EXTRACT_BATCH)


def web_edge_ds(sf_dir: str) -> rd.Dataset:
    """Distinct (src_url, dst_url) href edges, self-links dropped."""
    pages = read_pages(sf_dir, columns=["url", "html"])
    edges = pages.map_batches(ExtractLinks(), batch_format="pyarrow",
                              batch_size=EXTRACT_BATCH)
    edges = edges.filter(expr="src_url != dst_url")
    from neo4j_graph_algorithms_ray.util import predistinct
    return predistinct(edges, ["src_url", "dst_url"])


def messify_pages(batch):
    """Deterministically rewrite each page's anchors into one of four
    real-crawl quoting/case variants chosen by md5(url) % 4 — the
    tolerant-extraction test harness. Only the literal anchor
    delimiters move: in the canonical page template ``<a href="`` and
    ``">`` occur ONLY at href boundaries (raw ``>`` in body text is
    entity-escaped, so a stray ``"`` in text can never be followed by
    a real ``>``), making the rewrites semantics-preserving — a
    tolerant parse of the messy page must recover the canonical edge
    set exactly."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from neo4j_graph_algorithms_ray.functions.dedup import _md5_u64
    html = batch.column("html").cast(pa.string()).combine_chunks()
    urls = batch.column("url").to_numpy(zero_copy_only=False)
    h, inv = _md5_u64(urls.astype(object), hexdigits=8)
    variant = (h[inv] % 4).astype(np.int64)
    v1 = pc.replace_substring(pc.replace_substring(
        html, pattern='<a href="', replacement="<a href='"),
        pattern='">', replacement="'>")
    v2 = pc.replace_substring(html, pattern='<a href="',
                              replacement='<A  HREF = "')
    v3 = pc.replace_substring(pc.replace_substring(
        html, pattern='<a href="', replacement='<a href='),
        pattern='">', replacement='>')
    va = pa.array(variant)
    out = pc.if_else(pc.equal(va, 1), v1,
                     pc.if_else(pc.equal(va, 2), v2,
                                pc.if_else(pc.equal(va, 3), v3, html)))
    return pa.table({"url": batch.column("url"),
                     "html": pc.cast(out, pa.binary())})


def web_edge_ds_tolerant(sf_dir: str) -> rd.Dataset:
    """Distinct (src_url, dst_url) edges recovered by the TOLERANT
    extractor from deterministically-messified pages (messify_pages).
    Oracle: PAGE_LINKS_SQL over the canonical pages — the rewrites are
    semantics-preserving, so tolerant extraction must reproduce the
    canonical edge set byte-for-byte."""
    pages = read_pages(sf_dir, columns=["url", "html"])
    messy = pages.map_batches(messify_pages, batch_format="pyarrow",
                              batch_size=EXTRACT_BATCH)
    edges = messy.map_batches(ExtractLinks(tolerant=True),
                              batch_format="pyarrow",
                              batch_size=EXTRACT_BATCH)
    edges = edges.filter(expr="src_url != dst_url")
    from neo4j_graph_algorithms_ray.util import predistinct
    return predistinct(edges, ["src_url", "dst_url"])


def get_web_graph(sf_dir: str, *, undirected: bool = False) -> GraphTables:
    name = f"web:{sf_dir}:{'und' if undirected else 'dir'}"
    g = GraphCatalog.get(name)
    if g is None:
        g = build_graph(web_edge_ds(sf_dir), src_col="src_url",
                        dst_col="dst_url", undirected=undirected,
                        name=name.replace("/", "_"))
        GraphCatalog.set(name, g)
    return g


def get_web_graph_thinned(sf_dir: str, *, mod: int = 5,
                          undirected: bool = False) -> GraphTables:
    """The "previous crawl" web graph: the full edge set minus the
    deterministic 1/``mod`` slice where md5(src||'|'||dst)[:15] ≡ 0
    (mod ``mod``) — the synthetic stand-in for edges discovered since
    the last crawl, used by the incremental (warm-start) rank path.
    Same md5 discipline the samplers use, so the SQL oracle can
    reproduce the slice exactly."""
    name = f"web_thin:{sf_dir}:{mod}:{'und' if undirected else 'dir'}"
    g = GraphCatalog.get(name)
    if g is None:
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        from neo4j_graph_algorithms_ray.functions.dedup import _md5_u64

        def keep_old(b: pa.Table) -> pa.Table:
            key = pc.binary_join_element_wise(b["src_url"], b["dst_url"],
                                              "|")
            vals, inv = _md5_u64(
                np.asarray(key.to_numpy(zero_copy_only=False), dtype=object),
                15)
            return b.filter(pa.array((vals[inv] % mod) != 0))

        edges = web_edge_ds(sf_dir).map_batches(keep_old,
                                                batch_format="pyarrow")
        g = build_graph(edges, src_col="src_url", dst_col="dst_url",
                        undirected=undirected, name=name.replace("/", "_"))
        GraphCatalog.set(name, g)
    return g


HOST_RE = r"^[a-z]+://(?P<host>[^/]+)"


def host_edge_ds(sf_dir: str) -> rd.Dataset:
    """Coarsen the page link graph to the host (domain) graph:
    (src_host, dst_host, n_links) with n_links = count of distinct
    page-level links between the two hosts. The standard web-corpus
    aggregation level (domain ranking, spam filtering, crawl budgeting).

    Scale shape: host extraction is a vectorized RE2 kernel over the
    already-distinct page edges; the pair count is a map-side Arrow
    combine (util.preagg_sum), so the shuffle carries per-batch-distinct
    host pairs (~|hosts|² rows max, tiny next to page edges).
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from neo4j_graph_algorithms_ray.util import preagg_sum

    def to_hosts(b: pa.Table) -> pa.Table:
        sh = pc.struct_field(pc.extract_regex(b["src_url"], HOST_RE), "host")
        dh = pc.struct_field(pc.extract_regex(b["dst_url"], HOST_RE), "host")
        one = pa.array(np.ones(b.num_rows, np.int64))
        return pa.table({"src_host": sh, "dst_host": dh, "n_links": one})

    he = web_edge_ds(sf_dir).map_batches(to_hosts, batch_format="pyarrow")
    return preagg_sum(he, ["src_host", "dst_host"], "n_links")


def get_host_graph(sf_dir: str) -> GraphTables:
    """Host graph for ranking: distinct host→host edges, self-host
    links dropped (they would dominate rank mass — every site links
    mostly within itself)."""
    name = f"hostgraph:{sf_dir}"
    g = GraphCatalog.get(name)
    if g is None:
        edges = host_edge_ds(sf_dir).filter(expr="src_host != dst_host")
        g = build_graph(edges, src_col="src_host", dst_col="dst_host",
                        name=name.replace("/", "_"))
        GraphCatalog.set(name, g)
    return g


def get_host_graph_weighted(sf_dir: str) -> GraphTables:
    """Host graph with ``n_links`` (distinct page-level links between
    the hosts) as edge weight — the input for weighted host ranking,
    where a host pointed at by many distinct pages of another host
    receives proportionally more mass."""
    name = f"hostgraph_w:{sf_dir}"
    g = GraphCatalog.get(name)
    if g is None:
        edges = host_edge_ds(sf_dir).filter(expr="src_host != dst_host")
        g = build_graph(edges, src_col="src_host", dst_col="dst_host",
                        weight_col="n_links", name=name.replace("/", "_"))
        GraphCatalog.set(name, g)
    return g


def get_host_graph_weighted_und(sf_dir: str) -> GraphTables:
    """Undirected weighted host graph (both orientations of every
    host→host edge, w = n_links) — the MST/MSF input."""
    name = f"hostgraph_wu:{sf_dir}"
    g = GraphCatalog.get(name)
    if g is None:
        edges = host_edge_ds(sf_dir).filter(expr="src_host != dst_host")
        g = build_graph(edges, src_col="src_host", dst_col="dst_host",
                        weight_col="n_links", undirected=True,
                        name=name.replace("/", "_"))
        GraphCatalog.set(name, g)
    return g


def anchor_text_ds(sf_dir: str) -> rd.Dataset:
    """Anchor-text index: (dst_url, anchor, n) — how often each anchor
    string points at each target page, every occurrence counted.
    Target-page description/ranking features from the link graph.

    Scale shape: vectorized anchor extraction (actor pool) feeding a
    map-side Arrow combine; the shuffle carries per-batch-distinct
    (target, anchor) rows."""
    import numpy as np
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.stages.extract import ExtractAnchors
    from neo4j_graph_algorithms_ray.util import preagg_sum

    pages = read_pages(sf_dir, columns=["url", "html"])
    an = pages.map_batches(ExtractAnchors(), batch_format="pyarrow",
                           batch_size=EXTRACT_BATCH)
    an = an.map_batches(
        lambda b: pa.table({"dst_url": b["dst_url"], "anchor": b["anchor"],
                            "n": pa.array(np.ones(b.num_rows, np.int64))}),
        batch_format="pyarrow")
    return preagg_sum(an, ["dst_url", "anchor"], "n")


def get_web_und_graph(sf_dir: str) -> GraphTables:
    """Undirected DEDUPED web graph (proper neighbor sets — k-core and
    other degree-sensitive undirected algorithms need set degrees, not
    the reversed-copy multigraph WCC tolerates)."""
    name = f"web:{sf_dir}:undd"
    g = GraphCatalog.get(name)
    if g is None:
        g = build_graph(web_edge_ds(sf_dir), src_col="src_url",
                        dst_col="dst_url", undirected=True, dedup=True,
                        name=name.replace("/", "_"))
        GraphCatalog.set(name, g)
    return g


def edge_prune_topm(edges: rd.Dataset, ranks: rd.Dataset, m: int = 3, *,
                    src_col: str = "src_url", dst_col: str = "dst_url",
                    node_col: str = "url",
                    score_col: str = "score") -> rd.Dataset:
    """Rank-weighted graph compaction: keep each source's top-``m``
    outlinks by target score (ties: lower dst id first) →
    (src, dst, score). The crawl-graph maintenance pass that bounds
    per-page fanout while preserving the highest-authority endorsements
    — run after every rank refresh at recrawl time.

    Scale shape: the rank vector attaches to the edge stream through
    the broadcast-join regime (put once, probed per batch; falls back
    to a hash join past the byte/row caps) and the per-source top-m is
    the bounded-exchange ``topk_per_group`` reduction — at most m rows
    per (batch, source) ever shuffle. Scores must be pre-rounded
    (round6) so float ties cannot flip the cut against a SQL oracle."""
    from neo4j_graph_algorithms_ray.util import broadcast_join, topk_per_group

    r = ranks.rename_columns({node_col: "__rnode"})
    j = broadcast_join(edges, r, on=dst_col, right_on="__rnode")
    top = topk_per_group(j, [src_col], score_col, m, tie_cols=[dst_col])
    return top.select_columns([src_col, dst_col, score_col]) \
        .sort([src_col, score_col, dst_col], descending=[False, True, False])
