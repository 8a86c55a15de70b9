"""DuckDB oracles for the web-pages pipeline.

The pages table (sources/pages.py) is a pure deterministic function of
``documents.parquet``, so every oracle here reconstructs pages/links
with SQL arithmetic only — no access to the generated parquet — and
must match the Ray pipeline (extraction included) byte-for-byte.
"""

from __future__ import annotations


def _url(x: str) -> str:
    return f"'http://site-' || ({x} % 20) || '.test/page/' || {x}"


# link rule mirror of sources/pages.py: deg(d), t = (d*31 + j*17 + 1) % N,
# self-links skipped
WEB_BASE = """nn AS (SELECT count(*) AS n FROM documents),
degs AS (SELECT doc_id AS d, text,
                CASE WHEN doc_id % 50 = 0 THEN 40 ELSE 1 + doc_id % 7 END AS deg
         FROM documents),
links AS MATERIALIZED (
  SELECT d, j, t FROM (
    SELECT d, j, (d * 31 + j * 17 + 1) % (SELECT n FROM nn) AS t
    FROM (SELECT d, unnest(generate_series(1, deg)) AS j FROM degs) e) x
  WHERE t != d)"""

WEB_EDGES = f"""wedges AS MATERIALIZED (
  SELECT DISTINCT {_url('d')} AS src, {_url('t')} AS dst FROM links)"""

WEB_NODES = """wnodes AS MATERIALIZED (
  SELECT src AS node FROM wedges UNION SELECT dst FROM wedges)"""

_ESC = ("replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), "
        "'>', '&gt;')")

PAGE_TEXT_SQL = f"""WITH {WEB_BASE},
lab AS (SELECT d, string_agg('link ' || j, ' ' ORDER BY j) AS labels
        FROM links GROUP BY d)
SELECT {_url('degs.d')} AS url,
       trim(regexp_replace(
         'Doc ' || degs.d || ' Doc ' || degs.d || ' ' || {_ESC}
           || coalesce(' ' || lab.labels, ''),
         '\\s+', ' ', 'g')) AS text
FROM degs LEFT JOIN lab ON lab.d = degs.d
ORDER BY url"""

# Mirrors page_meta_ds: title/h1 are 'Doc d' by the page template;
# n_links counts raw href occurrences = the links CTE rows per page
# (self-links skipped at compose time, zero-link pages keep a row).
PAGE_META_SQL = f"""WITH {WEB_BASE},
lc AS (SELECT d, CAST(count(*) AS BIGINT) AS n_links FROM links GROUP BY d)
SELECT {_url('degs.d')} AS url,
       'Doc ' || degs.d AS title,
       'Doc ' || degs.d AS h1,
       coalesce(lc.n_links, CAST(0 AS BIGINT)) AS n_links
FROM degs LEFT JOIN lc ON lc.d = degs.d
ORDER BY url"""

PAGE_LINKS_SQL = f"""WITH {WEB_BASE},
{WEB_EDGES}
SELECT src AS src_url, dst AS dst_url FROM wedges ORDER BY src_url, dst_url"""

WEB_DEGREES_SQL = f"""WITH {WEB_BASE},
{WEB_EDGES},
{WEB_NODES},
wdeg AS (SELECT src, count(*) AS dg FROM wedges GROUP BY src)
SELECT n.node AS url, coalesce(wdeg.dg, 0) AS out_degree
FROM wnodes n LEFT JOIN wdeg ON wdeg.src = n.node ORDER BY url"""


def web_pagerank_sql(iters: int = 20, topk: int = 0) -> str:
    ctes = [WEB_BASE, WEB_EDGES, WEB_NODES,
            "wdeg AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) AS dg "
            "FROM wedges GROUP BY src)",
            "r0 AS (SELECT node, CAST(0.15 AS DOUBLE) AS r FROM wnodes)"]
    for k in range(1, iters + 1):
        ctes.append(f"""r{k} AS MATERIALIZED (
  SELECT n.node, 0.15 + 0.85 * coalesce(sum(p.r / dg.dg), 0) AS r
  FROM wnodes n
  LEFT JOIN wedges e ON e.dst = n.node
  LEFT JOIN r{k-1} p ON p.node = e.src
  LEFT JOIN wdeg dg ON dg.src = e.src
  GROUP BY n.node)""")
    head = "WITH " + ",\n".join(ctes)
    if topk:
        return head + (f"\nSELECT node AS url, round(r, 6) AS score FROM r{iters} "
                       f"ORDER BY score DESC, url ASC LIMIT {topk}")
    return head + (f"\nSELECT node AS url, round(r, 6) AS score FROM r{iters} "
                   "ORDER BY url")


INDUCED_SUBGRAPH_SQL = f"""WITH {WEB_BASE},
{WEB_EDGES}
SELECT src AS src_url, dst AS dst_url FROM wedges
WHERE CAST(('0x' || substr(md5(src), 1, 15)) AS BIGINT) % 10 < 2
  AND CAST(('0x' || substr(md5(dst), 1, 15)) AS BIGINT) % 10 < 2
ORDER BY src_url, dst_url"""


URL_DEPTH_SQL = f"""WITH {WEB_BASE}
SELECT CAST(depth AS BIGINT) AS depth,
       CAST(count(*) AS BIGINT) AS n_pages
FROM (SELECT len(regexp_extract_all(
        regexp_replace({_url('degs.d')}, '^[a-z]+://[^/]*', ''),
        '/[^/]')) AS depth
      FROM degs) t
GROUP BY depth ORDER BY depth"""


def edge_prune_sql(m: int = 3, iters: int = 20) -> str:
    """Mirror of webgraph.edge_prune_topm over round6-ed web PageRank:
    per-source top-m outlinks by target score, ties by dst asc."""
    ctes = [WEB_BASE, WEB_EDGES, WEB_NODES,
            "wdeg AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) "
            "AS dg FROM wedges GROUP BY src)",
            "r0 AS (SELECT node, CAST(0.15 AS DOUBLE) AS r FROM wnodes)"]
    for k in range(1, iters + 1):
        ctes.append(f"""r{k} AS MATERIALIZED (
  SELECT n.node, 0.15 + 0.85 * coalesce(sum(p.r / dg.dg), 0) AS r
  FROM wnodes n
  LEFT JOIN wedges e ON e.dst = n.node
  LEFT JOIN r{k-1} p ON p.node = e.src
  LEFT JOIN wdeg dg ON dg.src = e.src
  GROUP BY n.node)""")
    ctes.append(f"pr AS (SELECT node, round(r, 6) AS score FROM r{iters})")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT src_url, dst_url, score FROM (
  SELECT e.src AS src_url, e.dst AS dst_url, p.score,
         row_number() OVER (PARTITION BY e.src
                            ORDER BY p.score DESC, e.dst ASC) AS rn
  FROM wedges e JOIN pr p ON p.node = e.dst) t
WHERE rn <= {m} ORDER BY src_url, score DESC, dst_url""")


def web_pagerank_incremental_sql(old_iters: int = 20, warm_iters: int = 10,
                                 mod: int = 5) -> str:
    """Mirror of the incremental-recrawl path: Jacobi PageRank on the
    thinned "previous crawl" graph (edges with md5(src||'|'||dst)[:15]
    % mod == 0 removed), then ``warm_iters`` warm sweeps on the full
    graph starting from those ranks (missing nodes cold-init at
    0.15)."""
    ctes = [WEB_BASE, WEB_EDGES, WEB_NODES,
            f"""oedges AS MATERIALIZED (
  SELECT src, dst FROM wedges
  WHERE CAST(('0x' || substr(md5(src || '|' || dst), 1, 15)) AS BIGINT)
        % {mod} != 0)""",
            "onodes AS MATERIALIZED (SELECT src AS node FROM oedges "
            "UNION SELECT dst FROM oedges)",
            "odeg AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) "
            "AS dg FROM oedges GROUP BY src)",
            "o0 AS (SELECT node, CAST(0.15 AS DOUBLE) AS r FROM onodes)"]
    for k in range(1, old_iters + 1):
        ctes.append(f"""o{k} AS MATERIALIZED (
  SELECT n.node, 0.15 + 0.85 * coalesce(sum(p.r / dg.dg), 0) AS r
  FROM onodes n
  LEFT JOIN oedges e ON e.dst = n.node
  LEFT JOIN o{k-1} p ON p.node = e.src
  LEFT JOIN odeg dg ON dg.src = e.src
  GROUP BY n.node)""")
    ctes.append(
        "wdeg AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) AS dg "
        "FROM wedges GROUP BY src)")
    ctes.append(f"""w0 AS (
  SELECT n.node, coalesce(o.r, CAST(0.15 AS DOUBLE)) AS r
  FROM wnodes n LEFT JOIN o{old_iters} o ON o.node = n.node)""")
    for k in range(1, warm_iters + 1):
        ctes.append(f"""w{k} AS MATERIALIZED (
  SELECT n.node, 0.15 + 0.85 * coalesce(sum(p.r / dg.dg), 0) AS r
  FROM wnodes n
  LEFT JOIN wedges e ON e.dst = n.node
  LEFT JOIN w{k-1} p ON p.node = e.src
  LEFT JOIN wdeg dg ON dg.src = e.src
  GROUP BY n.node)""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node AS url, round(r, 6) AS score FROM w{warm_iters} "
              "ORDER BY url")


def web_wcc_sql(iters: int = 30, final: str = "sizes") -> str:
    ctes = [WEB_BASE, WEB_EDGES, WEB_NODES,
            "sym AS MATERIALIZED (SELECT src AS a, dst AS b FROM wedges "
            "UNION ALL SELECT dst, src FROM wedges)",
            "c0 AS (SELECT node, node AS c FROM wnodes)"]
    for k in range(1, iters + 1):
        ctes.append(f"""c{k} AS MATERIALIZED (
  SELECT n.node, least(p.c, coalesce(min(q.c), p.c)) AS c
  FROM wnodes n
  JOIN c{k-1} p ON p.node = n.node
  LEFT JOIN sym e ON e.a = n.node
  LEFT JOIN c{k-1} q ON q.node = e.b
  GROUP BY n.node, p.c)""")
    head = "WITH " + ",\n".join(ctes)
    if final == "components":
        return head + f"\nSELECT node AS url, c AS component FROM c{iters} ORDER BY url"
    return head + (f"\nSELECT c AS component, count(*) AS size FROM c{iters} "
                   "GROUP BY c ORDER BY component")


HOST_GRAPH_SQL = f"""WITH {WEB_BASE},
{WEB_EDGES},
hp AS (SELECT regexp_extract(src, '^[a-z]+://([^/]+)', 1) AS src_host,
              regexp_extract(dst, '^[a-z]+://([^/]+)', 1) AS dst_host
       FROM wedges)
SELECT src_host, dst_host, count(*) AS n_links
FROM hp GROUP BY src_host, dst_host ORDER BY src_host, dst_host"""


def host_pagerank_sql(iters: int = 20) -> str:
    """PageRank over the coarsened host graph (distinct host→host
    edges, self-host links dropped) — mirror of webgraph.get_host_graph
    + pagerank."""
    ctes = [WEB_BASE, WEB_EDGES,
            """hedges AS MATERIALIZED (
  SELECT DISTINCT regexp_extract(src, '^[a-z]+://([^/]+)', 1) AS src,
                  regexp_extract(dst, '^[a-z]+://([^/]+)', 1) AS dst
  FROM wedges
  WHERE regexp_extract(src, '^[a-z]+://([^/]+)', 1)
     != regexp_extract(dst, '^[a-z]+://([^/]+)', 1))""",
            "hnodes AS MATERIALIZED (SELECT src AS node FROM hedges "
            "UNION SELECT dst FROM hedges)",
            "hdeg AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) AS dg "
            "FROM hedges GROUP BY src)",
            "h0 AS (SELECT node, CAST(0.15 AS DOUBLE) AS r FROM hnodes)"]
    for k in range(1, iters + 1):
        ctes.append(f"""h{k} AS MATERIALIZED (
  SELECT n.node, 0.15 + 0.85 * coalesce(sum(p.r / dg.dg), 0) AS r
  FROM hnodes n
  LEFT JOIN hedges e ON e.dst = n.node
  LEFT JOIN h{k-1} p ON p.node = e.src
  LEFT JOIN hdeg dg ON dg.src = e.src
  GROUP BY n.node)""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node AS host, round(r, 6) AS score FROM h{iters} ORDER BY host")


def host_features_sql(iters: int = 20) -> str:
    """Mirror of the host feature-assembly join: per host its out/in
    degree, round6 PageRank, triangle count and clustering
    coefficient, nesting the existing chains as CTE subqueries."""
    return f"""WITH pr AS ({host_pagerank_sql(iters)}),
tri AS ({HOST_TRIANGLES_SQL}),
deg AS (WITH {WEB_BASE},
{WEB_EDGES},
hedges AS MATERIALIZED (
  SELECT DISTINCT regexp_extract(src, '^[a-z]+://([^/]+)', 1) AS src,
                  regexp_extract(dst, '^[a-z]+://([^/]+)', 1) AS dst
  FROM wedges
  WHERE regexp_extract(src, '^[a-z]+://([^/]+)', 1)
     != regexp_extract(dst, '^[a-z]+://([^/]+)', 1)),
hn AS (SELECT src AS host FROM hedges UNION SELECT dst FROM hedges),
o AS (SELECT src AS host, count(*) AS od FROM hedges GROUP BY src),
i AS (SELECT dst AS host, count(*) AS idg FROM hedges GROUP BY dst)
SELECT hn.host, coalesce(o.od, 0) AS od, coalesce(i.idg, 0) AS idg
FROM hn LEFT JOIN o ON o.host = hn.host LEFT JOIN i ON i.host = hn.host)
SELECT pr.host,
       CAST(d.od AS BIGINT) AS out_degree,
       CAST(d.idg AS BIGINT) AS in_degree,
       pr.score AS pagerank,
       CAST(coalesce(t.triangles, 0) AS BIGINT) AS triangles,
       coalesce(t.coefficient, 0) AS clustering
FROM pr
JOIN deg d ON d.host = pr.host
LEFT JOIN tri t ON t.host = pr.host
ORDER BY pr.host"""


def host_betweenness_sql(sample: int = 0, max_depth: int = 19) -> str:
    """Exact directed Brandes betweenness over the host graph via the
    pair-dependency identity bc(v) = Σ_{s≠v≠t} σ_sv·σ_vt/σ_st with
    dist(s,v)+dist(v,t)=dist(s,t): shortest distances from a bounded
    recursive BFS closure, path counts σ from UNION ALL enumeration of
    shortest-path-DAG walks (each walk row is one distinct shortest
    path, so count(*) = σ). ``sample=k`` restricts sources to the k
    hosts with the smallest repo-standard md5-60bit hash (the engine's
    strategy='md5') and scales by n/k — the engine's RABrandes
    semantics made deterministic. Feasible because the host graph is
    ~20 nodes; the engine runs the same values distributed."""
    srcs = ("srcs AS (SELECT node FROM hnodes ORDER BY "
            "CAST(('0x'||substr(md5(node),1,15)) AS BIGINT) ASC, node ASC "
            f"LIMIT {sample})" if sample
            else "srcs AS (SELECT node FROM hnodes)")
    scale = (f"((SELECT CAST(count(*) AS DOUBLE) FROM hnodes) / {sample})"
             if sample else "1.0")
    return f"""WITH RECURSIVE {WEB_BASE},
{WEB_EDGES},
hedges AS MATERIALIZED (
  SELECT DISTINCT regexp_extract(src, '^[a-z]+://([^/]+)', 1) AS src,
                  regexp_extract(dst, '^[a-z]+://([^/]+)', 1) AS dst
  FROM wedges
  WHERE regexp_extract(src, '^[a-z]+://([^/]+)', 1)
     != regexp_extract(dst, '^[a-z]+://([^/]+)', 1)),
hnodes AS MATERIALIZED (
  -- DISTINCT over UNION ALL, not UNION: under WITH RECURSIVE, DuckDB
  -- 1.0 stops deduplicating UNION in non-recursive CTEs
  SELECT DISTINCT node FROM (SELECT src AS node FROM hedges
                             UNION ALL SELECT dst FROM hedges)),
{srcs},
reach(s, v, d) AS (
  SELECT node, node, 0 FROM hnodes
  UNION
  SELECT r.s, e.dst, r.d + 1 FROM reach r JOIN hedges e ON e.src = r.v
  WHERE r.d < {max_depth}),
dist AS MATERIALIZED (SELECT s, v, MIN(d) AS d FROM reach GROUP BY s, v),
spw(s, v, d) AS (
  SELECT node, node, 0 FROM hnodes
  UNION ALL
  SELECT w.s, e.dst, w.d + 1
  FROM spw w JOIN hedges e ON e.src = w.v
  JOIN dist dd ON dd.s = w.s AND dd.v = e.dst AND dd.d = w.d + 1),
sigma AS MATERIALIZED (
  SELECT s, v, MIN(d) AS d, CAST(count(*) AS DOUBLE) AS sig
  FROM spw GROUP BY s, v),
bc AS (
  SELECT sv.v AS node, SUM(sv.sig * vt.sig / st.sig) AS c
  FROM sigma sv
  JOIN srcs ON srcs.node = sv.s
  JOIN sigma vt ON vt.s = sv.v
  JOIN sigma st ON st.s = sv.s AND st.v = vt.v AND st.d = sv.d + vt.d
  WHERE sv.v != sv.s AND vt.v != sv.v AND vt.v != sv.s
  GROUP BY sv.v)
SELECT n.node AS host,
       round(coalesce(bc.c, 0) * {scale}, 6) AS centrality
FROM hnodes n LEFT JOIN bc ON bc.node = n.node ORDER BY host"""


ANCHOR_TEXTS_SQL = f"""WITH {WEB_BASE}
SELECT {_url('t')} AS dst_url, 'link ' || j AS anchor, count(*) AS n
FROM links GROUP BY dst_url, anchor ORDER BY dst_url, anchor"""


def web_ppr_sql(iters: int = 20, seed_docs=(0, 1)) -> str:
    """Personalized PageRank mirror: teleport mass only on the seed
    urls — r_p(v) = 0.15·1[v∈S] + 0.85·Σ r_p(u)/deg(u), unrolled."""
    seeds = ", ".join(_url(str(d)) for d in seed_docs)
    seed_case = f"CASE WHEN n.node IN ({seeds}) THEN 0.15 ELSE 0 END"
    ctes = [WEB_BASE, WEB_EDGES, WEB_NODES,
            "wdeg AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) AS dg "
            "FROM wedges GROUP BY src)",
            f"""p0 AS (SELECT node,
  CAST(CASE WHEN node IN ({seeds}) THEN 0.15 ELSE 0 END AS DOUBLE) AS r
  FROM wnodes)"""]
    for k in range(1, iters + 1):
        ctes.append(f"""p{k} AS MATERIALIZED (
  SELECT n.node, {seed_case} + 0.85 * coalesce(sum(p.r / dg.dg), 0) AS r
  FROM wnodes n
  LEFT JOIN wedges e ON e.dst = n.node
  LEFT JOIN p{k-1} p ON p.node = e.src
  LEFT JOIN wdeg dg ON dg.src = e.src
  GROUP BY n.node)""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node AS url, round(r, 6) AS score FROM p{iters} ORDER BY url")


def web_ppr_batch_sql(iters: int = 20, seed_docs=(0, 1, 2)) -> str:
    """Mirror of pagerank.pagerank_batch: one independent PPR unroll
    per seed, UNION ALL'd long-form (url, seed, score)."""
    ctes = [WEB_BASE, WEB_EDGES, WEB_NODES,
            "wdeg AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) "
            "AS dg FROM wedges GROUP BY src)"]
    sels = []
    for i, d in enumerate(seed_docs):
        seed = _url(str(d))
        seed_case = f"CASE WHEN n.node = {seed} THEN 0.15 ELSE 0 END"
        ctes.append(f"""s{i}_p0 AS (SELECT node,
  CAST(CASE WHEN node = {seed} THEN 0.15 ELSE 0 END AS DOUBLE) AS r
  FROM wnodes)""")
        for k in range(1, iters + 1):
            ctes.append(f"""s{i}_p{k} AS MATERIALIZED (
  SELECT n.node, {seed_case} + 0.85 * coalesce(sum(p.r / dg.dg), 0) AS r
  FROM wnodes n
  LEFT JOIN wedges e ON e.dst = n.node
  LEFT JOIN s{i}_p{k-1} p ON p.node = e.src
  LEFT JOIN wdeg dg ON dg.src = e.src
  GROUP BY n.node)""")
        sels.append(f"SELECT node AS url, {seed} AS seed, "
                    f"round(r, 6) AS score FROM s{i}_p{iters}")
    return ("WITH " + ",\n".join(ctes) + "\n"
            + " UNION ALL ".join(sels) + " ORDER BY seed, url")


def web_hits_sql(iters: int = 20) -> str:
    """HITS mirror: auth = Σ_in hub, hub = Σ_out auth, each L2-normalized
    per round; fixed ``iters`` rounds, round6 output."""
    return _hits_chain_sql(iters, [WEB_BASE, WEB_EDGES, WEB_NODES],
                           "wedges", "wnodes", "url")


def host_hits_sql(iters: int = 20) -> str:
    """HITS over the coarsened host graph (same recurrence as
    web_hits_sql over the distinct host→host edges)."""
    base = [WEB_BASE, WEB_EDGES,
            """hedges AS MATERIALIZED (
  SELECT DISTINCT regexp_extract(src, '^[a-z]+://([^/]+)', 1) AS src,
                  regexp_extract(dst, '^[a-z]+://([^/]+)', 1) AS dst
  FROM wedges
  WHERE regexp_extract(src, '^[a-z]+://([^/]+)', 1)
     != regexp_extract(dst, '^[a-z]+://([^/]+)', 1))""",
            "hnodes AS MATERIALIZED (SELECT src AS node FROM hedges "
            "UNION SELECT dst FROM hedges)"]
    return _hits_chain_sql(iters, base, "hedges", "hnodes", "host")


def _hits_chain_sql(iters: int, base_ctes: list, edges: str, nodes: str,
                    out_col: str) -> str:
    ctes = list(base_ctes) + [
        f"h0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS h FROM {nodes})",
        f"a0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS a FROM {nodes})"]
    return _hits_loop(ctes, iters, edges, nodes, out_col)


def _hits_loop(ctes, iters, wedges="wedges", wnodes="wnodes",
               out_col="url"):
    for k in range(1, iters + 1):
        ctes.append(f"""ar{k} AS MATERIALIZED (
  SELECT n.node, coalesce(sum(p.h), 0) AS a
  FROM {wnodes} n
  LEFT JOIN {wedges} e ON e.dst = n.node
  LEFT JOIN h{k-1} p ON p.node = e.src
  GROUP BY n.node)""")
        ctes.append(f"an{k} AS (SELECT CASE WHEN sqrt(sum(a*a)) = 0 THEN 1 "
                    f"ELSE sqrt(sum(a*a)) END AS s FROM ar{k})")
        ctes.append(f"a{k} AS MATERIALIZED (SELECT node, a / (SELECT s FROM an{k}) AS a FROM ar{k})")
        ctes.append(f"""hr{k} AS MATERIALIZED (
  SELECT n.node, coalesce(sum(p.a), 0) AS h
  FROM {wnodes} n
  LEFT JOIN {wedges} e ON e.src = n.node
  LEFT JOIN a{k} p ON p.node = e.dst
  GROUP BY n.node)""")
        ctes.append(f"hn{k} AS (SELECT CASE WHEN sqrt(sum(h*h)) = 0 THEN 1 "
                    f"ELSE sqrt(sum(h*h)) END AS s FROM hr{k})")
        ctes.append(f"h{k} AS MATERIALIZED (SELECT node, h / (SELECT s FROM hn{k}) AS h FROM hr{k})")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT h.node AS {out_col}, round(h.h, 6) AS hub, round(a.a, 6) AS authority
FROM h{iters} h JOIN a{iters} a ON a.node = h.node ORDER BY {out_col}""")


def web_kcore_sql(k: int = 3, rounds: int = 40) -> str:
    """k-core peeling mirror over the deduped undirected web graph:
    act_{i+1}(v) = act_i(v) AND |{active neighbors}| >= k, unrolled
    ``rounds`` times (the engine peels to fixpoint; at oracle scale the
    fixpoint lands well inside 40 rounds — the driver's value-hash
    would catch any shortfall)."""
    ctes = [WEB_BASE, WEB_EDGES, WEB_NODES,
            """undw AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM wedges)""",
            "symw AS MATERIALIZED (SELECT a AS x, b AS y FROM undw "
            "UNION ALL SELECT b, a FROM undw)",
            "k0 AS (SELECT node, 1 AS act FROM wnodes)"]
    for i in range(1, rounds + 1):
        ctes.append(f"""k{i} AS MATERIALIZED (
  SELECT n.node,
    CASE WHEN p.act = 1 AND coalesce(sum(q.act), 0) >= {k} THEN 1 ELSE 0 END AS act
  FROM wnodes n
  JOIN k{i-1} p ON p.node = n.node
  LEFT JOIN symw e ON e.x = n.node
  LEFT JOIN k{i-1} q ON q.node = e.y
  GROUP BY n.node, p.act)""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node AS url, act AS in_core FROM k{rounds} ORDER BY url")


def random_walks_sql(length: int = 4, start_mod: int = 7) -> str:
    """Deterministic random-walk mirror (algorithms/walks.py): starts =
    urls with md5-60bit % start_mod == 0; step t moves from cur to the
    (md5-60bit(start||'|'||t) mod outdeg(cur))-th out-neighbor in dst
    order; early stop on dangling vertices. Unrolled ``length`` steps."""
    h = lambda expr: f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"
    ctes = [WEB_BASE, WEB_EDGES, WEB_NODES,
            """ranked AS MATERIALIZED (
  SELECT src, dst,
         ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1 AS rnk,
         COUNT(*) OVER (PARTITION BY src) AS deg
  FROM wedges)""",
            f"""w0 AS (SELECT node AS start, node AS cur FROM wnodes
  WHERE {h('node')} % {start_mod} = 0)"""]
    for t in range(length):
        ctes.append(f"""w{t+1} AS MATERIALIZED (
  SELECT w.start, r.dst AS cur
  FROM w{t} w JOIN ranked r ON r.src = w.cur
   AND r.rnk = {h(f"w.start || '|{t}'")} % r.deg)""")
    sel = "\nUNION ALL ".join(
        f"SELECT start, {t} AS step, cur AS node FROM w{t}"
        for t in range(length + 1))
    return ("WITH " + ",\n".join(ctes) + "\n" + sel
            + "\nORDER BY start, step")


def node2vec_walks_sql(length: int = 4, start_mod: int = 7,
                       p: int = 1, q: int = 2) -> str:
    """node2vec-biased walk mirror (algorithms/walks.node2vec_walks):
    step 0 is the uniform ranked pick; later steps weight candidates
    (q = return, p·q = common neighbor, p = explore — the 1/p:1:1/q
    bias scaled to integers) in dst order and take the first whose
    cumulative weight exceeds md5-60bit(start||'|'||t) mod Σw."""
    h = lambda expr: f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"
    ctes = [WEB_BASE, WEB_EDGES, WEB_NODES,
            """ranked AS MATERIALIZED (
  SELECT src, dst,
         ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1 AS rnk,
         COUNT(*) OVER (PARTITION BY src) AS deg
  FROM wedges)""",
            f"""w0 AS (SELECT node AS start, node AS cur,
  CAST(NULL AS VARCHAR) AS prev FROM wnodes
  WHERE {h('node')} % {start_mod} = 0)""",
            f"""w1 AS MATERIALIZED (
  SELECT w.start, r.dst AS cur, w.cur AS prev
  FROM w0 w JOIN ranked r ON r.src = w.cur
   AND r.rnk = {h("w.start || '|0'")} % r.deg)"""]
    for t in range(1, length):
        ctes.append(f"""w{t+1} AS MATERIALIZED (
  SELECT start, cand AS cur, cur AS prev FROM (
    SELECT start, cand, cur, wt,
           SUM(wt) OVER (PARTITION BY start ORDER BY cand) AS cw,
           SUM(wt) OVER (PARTITION BY start) AS tot
    FROM (
      SELECT w.start AS start, r.dst AS cand, w.cur AS cur,
             CASE WHEN r.dst = w.prev THEN {q}
                  WHEN pe.src IS NOT NULL THEN {p * q}
                  ELSE {p} END AS wt
      FROM w{t} w JOIN ranked r ON r.src = w.cur
      LEFT JOIN wedges pe ON pe.src = w.prev AND pe.dst = r.dst))
  WHERE cw > {h(f"start || '|{t}'")} % tot
    AND cw - wt <= {h(f"start || '|{t}'")} % tot)""")
    sel = "\nUNION ALL ".join(
        f"SELECT start, {t} AS step, cur AS node FROM w{t}"
        for t in range(length + 1))
    return ("WITH " + ",\n".join(ctes) + "\n" + sel
            + "\nORDER BY start, step")


def cocitation_sql(cap: int = 20, topk: int = 50) -> str:
    """Co-citation mirror (algorithms/cocitation.py): pairs of targets
    sharing a source whose outdeg is in [2, cap]; top-k by count with
    (url_a, url_b) tie-break."""
    return f"""WITH {WEB_BASE},
{WEB_EDGES},
elig AS (SELECT src FROM wedges GROUP BY src
         HAVING count(*) BETWEEN 2 AND {cap}),
pairs AS (
  SELECT e1.dst AS a, e2.dst AS b
  FROM wedges e1 JOIN wedges e2
    ON e1.src = e2.src AND e1.dst < e2.dst
  WHERE e1.src IN (SELECT src FROM elig))
SELECT a AS node_a, b AS node_b, count(*) AS n_common
FROM pairs GROUP BY a, b
ORDER BY n_common DESC, node_a, node_b LIMIT {topk}"""


RECIPROCITY_SQL = f"""WITH {WEB_BASE},
{WEB_EDGES},
p AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b,
             sum(CASE WHEN src < dst THEN 1 ELSE 2 END) AS o
      FROM wedges GROUP BY a, b)
SELECT CAST(sum(CASE WHEN o = 3 THEN 2 ELSE 1 END) AS BIGINT) AS total_edges,
       CAST(sum(CASE WHEN o = 3 THEN 2 ELSE 0 END) AS BIGINT) AS reciprocal_edges,
       round(sum(CASE WHEN o = 3 THEN 2.0 ELSE 0.0 END)
             / sum(CASE WHEN o = 3 THEN 2 ELSE 1 END), 6) AS reciprocity
FROM p"""


def host_pagerank_weighted_sql(iters: int = 20) -> str:
    """Weighted host PageRank mirror: edge weight = n_links (count of
    distinct page-level links between the hosts, self-host dropped);
    push proportional to w/Σ_out w."""
    ctes = [WEB_BASE, WEB_EDGES,
            """hw AS MATERIALIZED (
  SELECT sh AS src, dh AS dst, CAST(count(*) AS DOUBLE) AS w FROM (
    SELECT regexp_extract(src, '^[a-z]+://([^/]+)', 1) AS sh,
           regexp_extract(dst, '^[a-z]+://([^/]+)', 1) AS dh
    FROM wedges) x
  WHERE sh != dh GROUP BY sh, dh)""",
            "hnodes AS MATERIALIZED (SELECT src AS node FROM hw "
            "UNION SELECT dst FROM hw)",
            "hwd AS MATERIALIZED (SELECT src, sum(w) AS wd FROM hw GROUP BY src)",
            "g0 AS (SELECT node, CAST(0.15 AS DOUBLE) AS r FROM hnodes)"]
    for k in range(1, iters + 1):
        ctes.append(f"""g{k} AS MATERIALIZED (
  SELECT n.node, 0.15 + 0.85 * coalesce(sum(p.r * e.w / dg.wd), 0) AS r
  FROM hnodes n
  LEFT JOIN hw e ON e.dst = n.node
  LEFT JOIN g{k-1} p ON p.node = e.src
  LEFT JOIN hwd dg ON dg.src = e.src
  GROUP BY n.node)""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node AS host, round(r, 6) AS score FROM g{iters} ORDER BY host")


DEGREE_HISTOGRAM_SQL = f"""WITH {WEB_BASE},
{WEB_EDGES},
{WEB_NODES},
wdeg AS (SELECT n.node, coalesce(d.dg, 0) AS degree
         FROM wnodes n LEFT JOIN (SELECT src, count(*) AS dg
                                  FROM wedges GROUP BY src) d
           ON d.src = n.node)
SELECT degree, count(*) AS n FROM wdeg GROUP BY degree ORDER BY degree"""


def host_top_pages_sql(k: int = 2) -> str:
    """Grouped top-k mirror (util.topk_per_group): the k highest
    out-degree pages per host, ties broken by url."""
    return f"""WITH {WEB_BASE},
{WEB_EDGES},
{WEB_NODES},
wdeg AS (SELECT n.node AS url, coalesce(d.dg, 0) AS out_degree
         FROM wnodes n LEFT JOIN (SELECT src, count(*) AS dg
                                  FROM wedges GROUP BY src) d
           ON d.src = n.node),
rnk AS (SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host, url,
               out_degree,
               ROW_NUMBER() OVER (
                 PARTITION BY regexp_extract(url, '^[a-z]+://([^/]+)', 1)
                 ORDER BY out_degree DESC, url) AS rn
        FROM wdeg)
SELECT host, url, out_degree FROM rnk WHERE rn <= {k}
ORDER BY host, url"""


BLOOM_URLS_SQL = f"""WITH {WEB_BASE},
keys AS (SELECT {_url('d')} AS u FROM degs),
kk AS (SELECT unnest(range(4)) AS j),
h AS (SELECT CAST(('0x' || substr(md5(u || '|bloom:' || j), 1, 15)) AS BIGINT)
             % 16384 AS pos
      FROM keys CROSS JOIN kk),
b AS (SELECT pos // 32 AS word, pos % 32 AS bit FROM h)
SELECT word, CAST(sum(DISTINCT CAST(1 AS BIGINT) << CAST(bit AS INT)) AS BIGINT) AS bits
FROM b GROUP BY word ORDER BY word"""


NEIGHBOR_DEGREE_MEAN_SQL = f"""WITH {WEB_BASE},
{WEB_EDGES},
{WEB_NODES},
wdeg AS (SELECT src, count(*) AS dg FROM wedges GROUP BY src),
nd AS (SELECT n.node, count(e.src) AS ind, coalesce(sum(d.dg), 0) AS sd
       FROM wnodes n
       LEFT JOIN wedges e ON e.dst = n.node
       LEFT JOIN wdeg d ON d.src = e.src
       GROUP BY n.node)
SELECT node AS url, CAST(ind AS BIGINT) AS in_degree,
       round(CASE WHEN ind > 0 THEN sd * 1.0 / ind ELSE 0 END, 6)
         AS nbr_degree_mean
FROM nd ORDER BY url"""


ASSORTATIVITY_SQL = f"""WITH {WEB_BASE},
{WEB_EDGES},
od AS (SELECT src, count(*) AS dg FROM wedges GROUP BY src),
idg AS (SELECT dst, count(*) AS dg FROM wedges GROUP BY dst),
xy AS (SELECT CAST(o.dg AS DOUBLE) AS x, CAST(i.dg AS DOUBLE) AS y
       FROM wedges e JOIN od o ON o.src = e.src JOIN idg i ON i.dst = e.dst),
s AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy FROM xy)
SELECT CAST(n AS BIGINT) AS n_edges,
       round(CASE WHEN (n*sxx - sx*sx) > 0 AND (n*syy - sy*sy) > 0
             THEN (n*sxy - sx*sy)
                  / (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy))
             ELSE 0 END, 6) AS assortativity
FROM s"""


def host_rank_mass_sql(iters: int = 20) -> str:
    """PageRank-mass-per-host mirror: the web_pagerank unroll grouped
    by host (sum of unrounded rank, then round)."""
    ctes = [WEB_BASE, WEB_EDGES, WEB_NODES,
            "wdeg AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) AS dg "
            "FROM wedges GROUP BY src)",
            "r0 AS (SELECT node, CAST(0.15 AS DOUBLE) AS r FROM wnodes)"]
    for k in range(1, iters + 1):
        ctes.append(f"""r{k} AS MATERIALIZED (
  SELECT n.node, 0.15 + 0.85 * coalesce(sum(p.r / dg.dg), 0) AS r
  FROM wnodes n
  LEFT JOIN wedges e ON e.dst = n.node
  LEFT JOIN r{k-1} p ON p.node = e.src
  LEFT JOIN wdeg dg ON dg.src = e.src
  GROUP BY n.node)""")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT regexp_extract(node, '^[a-z]+://([^/]+)', 1) AS host,
       round(sum(r), 6) AS rank_mass, count(*) AS n_pages
FROM r{iters} GROUP BY host ORDER BY host""")


TOP_ANCHOR_PER_PAGE_SQL = f"""WITH {WEB_BASE},
an AS (SELECT {_url('t')} AS dst_url, 'link ' || j AS anchor, count(*) AS n
       FROM links GROUP BY dst_url, anchor),
rk AS (SELECT dst_url, anchor, n,
              ROW_NUMBER() OVER (PARTITION BY dst_url
                                 ORDER BY n DESC, anchor) AS rn
       FROM an)
SELECT dst_url, anchor, n FROM rk WHERE rn = 1 ORDER BY dst_url"""


DEGREE_PERCENTILES_SQL = f"""WITH {WEB_BASE},
{WEB_EDGES},
{WEB_NODES},
wdeg AS (SELECT src, count(*) AS dg FROM wedges GROUP BY src),
d AS (SELECT coalesce(wdeg.dg, 0) AS deg FROM wnodes n
      LEFT JOIN wdeg ON wdeg.src = n.node),
nn2 AS (SELECT count(*) AS n FROM d),
h AS (SELECT deg, count(*) AS c FROM d GROUP BY deg),
cum AS (SELECT deg, sum(c) OVER (ORDER BY deg) AS cc FROM h),
ks AS (SELECT unnest([50, 90, 99, 100]) AS p)
SELECT CAST(ks.p AS BIGINT) AS pct, CAST(min(cum.deg) AS BIGINT) AS degree
FROM ks CROSS JOIN nn2
JOIN cum ON cum.cc >= CAST(ceil(ks.p * nn2.n / 100.0) AS BIGINT)
GROUP BY ks.p ORDER BY pct"""


def ranked_anchor_sql(iters: int = 20, topk: int = 20) -> str:
    """Mirror of the ranked-anchor report: top-k pages by PageRank with
    each page's dominant anchor text."""
    return f"""WITH pr AS ({web_pagerank_sql(iters, topk)}),
ta AS ({TOP_ANCHOR_PER_PAGE_SQL})
SELECT pr.url, pr.score, coalesce(ta.anchor, '') AS anchor,
       CAST(coalesce(ta.n, 0) AS BIGINT) AS n_anchor
FROM pr LEFT JOIN ta ON ta.dst_url = pr.url
ORDER BY pr.score DESC, pr.url"""


HOST_CRAWL_RECENCY_SQL = """SELECT 'site-' || (doc_id % 20) || '.test' AS host,
       count(*) AS n_pages,
       TIMESTAMP '2024-01-01 00:00:00' + max(doc_id) * INTERVAL 1 SECOND
         AS latest_ts
FROM documents GROUP BY host ORDER BY host"""


def host_mst_sql(kind: str = "prim") -> str:
    """MST over the undirected weighted host graph (w = n_links per
    directed host pair, both orientations usable) — a sequential Prim
    replay as a single-row recursive CTE: the state row carries the
    visited list; each step LATERAL-picks the (w, u, v)-lexicographic
    minimum crossing edge, exactly the engine heap's pop order
    (mst.py:24, ties (weight, src_vid, dst_vid); vid order == host
    string order so the string ORDER BY matches). All MSTs share one
    weight multiset, so the same totals also oracle Borůvka
    (kind='boruvka': weight_sum/edge_count/components; the host graph
    is connected, components = nodes - tree edges)."""
    head = f"""WITH RECURSIVE {WEB_BASE},
{WEB_EDGES},
hw AS MATERIALIZED (
  SELECT sh AS src, dh AS dst, CAST(count(*) AS DOUBLE) AS w FROM (
    SELECT regexp_extract(src, '^[a-z]+://([^/]+)', 1) AS sh,
           regexp_extract(dst, '^[a-z]+://([^/]+)', 1) AS dh
    FROM wedges) x
  WHERE sh != dh GROUP BY sh, dh),
und AS MATERIALIZED (
  SELECT src AS u, dst AS v, w FROM hw
  UNION ALL SELECT dst, src, w FROM hw),
hn AS MATERIALIZED (SELECT DISTINCT u AS node FROM und),
st(vis, total, cnt, wmin, wmax) AS (
  SELECT [(SELECT min(node) FROM hn)], CAST(0 AS DOUBLE), 0,
         CAST('infinity' AS DOUBLE), CAST('-infinity' AS DOUBLE)
  UNION ALL
  SELECT list_append(st.vis, pick.v), st.total + pick.w, st.cnt + 1,
         least(st.wmin, pick.w), greatest(st.wmax, pick.w)
  FROM st, LATERAL (
    SELECT w, u, v FROM und
    WHERE list_contains(st.vis, u) AND NOT list_contains(st.vis, v)
    ORDER BY w, u, v LIMIT 1) pick),
fin AS (SELECT * FROM st ORDER BY cnt DESC LIMIT 1)"""
    if kind == "prim":
        return head + """
SELECT round(total, 6) AS weight_sum, round(wmin, 6) AS weight_min,
       round(wmax, 6) AS weight_max, cnt AS edge_count,
       cnt + 1 AS effective_node_count
FROM fin"""
    return head + """
SELECT round(total, 6) AS weight_sum, cnt AS edge_count,
       (SELECT count(*) FROM hn) - cnt AS components
FROM fin"""


def web_spam_mass_sql(iters: int = 20, seed_docs=(0, 1)) -> str:
    """Spam-mass mirror (Gyöngyi et al. 2004): unroll plain PageRank
    r{k} AND trust-seeded personalized PageRank p{k} in one CTE chain,
    spam_mass = (r − p) / r (r ≥ 0.15 > 0 always)."""
    seeds = ", ".join(_url(str(d)) for d in seed_docs)
    seed_case = f"CASE WHEN n.node IN ({seeds}) THEN 0.15 ELSE 0 END"
    ctes = [WEB_BASE, WEB_EDGES, WEB_NODES,
            "wdeg AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) AS dg "
            "FROM wedges GROUP BY src)",
            "r0 AS (SELECT node, CAST(0.15 AS DOUBLE) AS r FROM wnodes)",
            f"""p0 AS (SELECT node,
  CAST(CASE WHEN node IN ({seeds}) THEN 0.15 ELSE 0 END AS DOUBLE) AS r
  FROM wnodes)"""]
    for k in range(1, iters + 1):
        ctes.append(f"""r{k} AS MATERIALIZED (
  SELECT n.node, 0.15 + 0.85 * coalesce(sum(p.r / dg.dg), 0) AS r
  FROM wnodes n
  LEFT JOIN wedges e ON e.dst = n.node
  LEFT JOIN r{k-1} p ON p.node = e.src
  LEFT JOIN wdeg dg ON dg.src = e.src
  GROUP BY n.node)""")
        ctes.append(f"""p{k} AS MATERIALIZED (
  SELECT n.node, {seed_case} + 0.85 * coalesce(sum(p.r / dg.dg), 0) AS r
  FROM wnodes n
  LEFT JOIN wedges e ON e.dst = n.node
  LEFT JOIN p{k-1} p ON p.node = e.src
  LEFT JOIN wdeg dg ON dg.src = e.src
  GROUP BY n.node)""")
    return ("WITH " + ",\n".join(ctes)
            + f"""
SELECT r.node AS url, round((r.r - p.r) / r.r, 6) AS spam_mass
FROM r{iters} r JOIN p{iters} p ON p.node = r.node
ORDER BY url""")


def web_eigenvector_sql(iters: int = 20) -> str:
    """Eigenvector-centrality mirror (algorithms/eigenvector.py): power
    iteration x' = Σ_in x, L2-normalized per round; fixed ``iters``
    rounds from x0 = 1, round6 output."""
    ctes = [WEB_BASE, WEB_EDGES, WEB_NODES,
            "x0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS x FROM wnodes)"]
    for k in range(1, iters + 1):
        ctes.append(f"""xr{k} AS MATERIALIZED (
  SELECT n.node, coalesce(sum(p.x), 0) AS x
  FROM wnodes n
  LEFT JOIN wedges e ON e.dst = n.node
  LEFT JOIN x{k-1} p ON p.node = e.src
  GROUP BY n.node)""")
        ctes.append(f"xn{k} AS (SELECT CASE WHEN sqrt(sum(x*x)) = 0 THEN 1 "
                    f"ELSE sqrt(sum(x*x)) END AS s FROM xr{k})")
        ctes.append(f"x{k} AS MATERIALIZED (SELECT node, "
                    f"x / (SELECT s FROM xn{k}) AS x FROM xr{k})")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node AS url, round(x, 6) AS score FROM x{iters} "
              "ORDER BY url")


def web_salsa_sql(iters: int = 20) -> str:
    """SALSA mirror (algorithms/salsa.py): per round, the authority
    chain's two half-steps (back: t(i) = Σ_{{i→j}} a(j)/indeg(j);
    forward: a'(j) = Σ_{{i→j}} t(i)/outdeg(i)) then L1 normalization,
    and symmetrically for the hub chain. Fixed ``iters`` rounds from
    a0 = h0 = 1, round6 output. Edge endpoints always have the degree
    being divided by (a dst has indeg >= 1, a src outdeg >= 1), so the
    divisions are total — matching the engine's div0."""
    ctes = [WEB_BASE, WEB_EDGES, WEB_NODES,
            "wout AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) "
            "AS deg FROM wedges GROUP BY src)",
            "wind AS MATERIALIZED (SELECT dst, CAST(count(*) AS DOUBLE) "
            "AS ind FROM wedges GROUP BY dst)",
            "a0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS a FROM wnodes)",
            "h0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS h FROM wnodes)"]
    for k in range(1, iters + 1):
        ctes.append(f"""t{k} AS MATERIALIZED (
  SELECT n.node, coalesce(sum(p.a / wi.ind), 0) AS t
  FROM wnodes n
  LEFT JOIN wedges e ON e.src = n.node
  LEFT JOIN a{k-1} p ON p.node = e.dst
  LEFT JOIN wind wi ON wi.dst = e.dst
  GROUP BY n.node)""")
        ctes.append(f"""ar{k} AS MATERIALIZED (
  SELECT n.node, coalesce(sum(t.t / wo.deg), 0) AS a
  FROM wnodes n
  LEFT JOIN wedges e ON e.dst = n.node
  LEFT JOIN t{k} t ON t.node = e.src
  LEFT JOIN wout wo ON wo.src = e.src
  GROUP BY n.node)""")
        ctes.append(f"an{k} AS (SELECT CASE WHEN sum(a) = 0 THEN 1 "
                    f"ELSE sum(a) END AS s FROM ar{k})")
        ctes.append(f"a{k} AS MATERIALIZED (SELECT node, "
                    f"a / (SELECT s FROM an{k}) AS a FROM ar{k})")
        ctes.append(f"""u{k} AS MATERIALIZED (
  SELECT n.node, coalesce(sum(p.h / wo.deg), 0) AS u
  FROM wnodes n
  LEFT JOIN wedges e ON e.dst = n.node
  LEFT JOIN h{k-1} p ON p.node = e.src
  LEFT JOIN wout wo ON wo.src = e.src
  GROUP BY n.node)""")
        ctes.append(f"""hr{k} AS MATERIALIZED (
  SELECT n.node, coalesce(sum(u.u / wi.ind), 0) AS h
  FROM wnodes n
  LEFT JOIN wedges e ON e.src = n.node
  LEFT JOIN u{k} u ON u.node = e.dst
  LEFT JOIN wind wi ON wi.dst = e.dst
  GROUP BY n.node)""")
        ctes.append(f"hn{k} AS (SELECT CASE WHEN sum(h) = 0 THEN 1 "
                    f"ELSE sum(h) END AS s FROM hr{k})")
        ctes.append(f"h{k} AS MATERIALIZED (SELECT node, "
                    f"h / (SELECT s FROM hn{k}) AS h FROM hr{k})")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT h.node AS url, round(h.h, 6) AS hub, round(a.a, 6) AS authority
FROM h{iters} h JOIN a{iters} a ON a.node = h.node ORDER BY url""")


def link_prediction_sql(cap: int = 20, topk: int = 50) -> str:
    """Link-prediction mirror (algorithms/linkpred.py): candidate pairs
    share an in-linking source with outdeg in [2, cap]; scores rounded
    to 1e-6 BEFORE the top-k sort (so float summation order can't flip
    near-ties), (url_a, url_b) tie-break."""
    return f"""WITH {WEB_BASE},
{WEB_EDGES},
wout AS MATERIALIZED (SELECT src, count(*) AS deg FROM wedges GROUP BY src),
wind AS MATERIALIZED (SELECT dst, count(*) AS ind FROM wedges GROUP BY dst),
pairs AS MATERIALIZED (
  SELECT e1.dst AS a, e2.dst AS b, count(*) AS n,
         sum(1.0 / ln(wo.deg)) AS w
  FROM wedges e1
  JOIN wedges e2 ON e2.src = e1.src AND e1.dst < e2.dst
  JOIN wout wo ON wo.src = e1.src
  WHERE wo.deg BETWEEN 2 AND {cap}
  GROUP BY e1.dst, e2.dst)
SELECT p.a AS url_a, p.b AS url_b, p.n AS n_common,
       round(p.w, 6) AS adamic_adar,
       round(CAST(p.n AS DOUBLE) / (ia.ind + ib.ind - p.n), 6) AS jaccard,
       ia.ind * ib.ind AS pref_attachment
FROM pairs p
JOIN wind ia ON ia.dst = p.a
JOIN wind ib ON ib.dst = p.b
ORDER BY adamic_adar DESC, url_a, url_b LIMIT {topk}"""


def node_similarity_sql(cap: int = 20, k: int = 3) -> str:
    """Mirror of algorithms/nodesim.node_similarity_topk over the host
    graph: per-host top-k peers by in-neighborhood Jaccard; candidate
    pairs share an in-linking host with outdeg in [2, cap]; jaccard
    rounded to 1e-6 BEFORE the per-node rank; ties by peer host asc."""
    return f"""WITH {WEB_BASE},
{WEB_EDGES},
hedges AS MATERIALIZED (
  SELECT DISTINCT regexp_extract(src, '^[a-z]+://([^/]+)', 1) AS src,
                  regexp_extract(dst, '^[a-z]+://([^/]+)', 1) AS dst
  FROM wedges
  WHERE regexp_extract(src, '^[a-z]+://([^/]+)', 1)
     != regexp_extract(dst, '^[a-z]+://([^/]+)', 1)),
hout AS MATERIALIZED (SELECT src, count(*) AS deg FROM hedges GROUP BY src),
hind AS MATERIALIZED (SELECT dst, count(*) AS ind FROM hedges GROUP BY dst),
pairs AS MATERIALIZED (
  SELECT e1.dst AS a, e2.dst AS b, count(*) AS n
  FROM hedges e1
  JOIN hedges e2 ON e2.src = e1.src AND e1.dst < e2.dst
  JOIN hout ho ON ho.src = e1.src
  WHERE ho.deg BETWEEN 2 AND {cap}
  GROUP BY e1.dst, e2.dst),
sym AS (SELECT a AS v, b AS u, n FROM pairs
        UNION ALL SELECT b, a, n FROM pairs),
sc AS (SELECT s.v, s.u, s.n,
              round(CAST(s.n AS DOUBLE) / (ia.ind + ib.ind - s.n), 6)
                AS jaccard
       FROM sym s
       JOIN hind ia ON ia.dst = s.v
       JOIN hind ib ON ib.dst = s.u),
rk AS (SELECT v, u, n, jaccard,
              row_number() OVER (PARTITION BY v
                                 ORDER BY jaccard DESC, u ASC) AS rn
       FROM sc)
SELECT v AS node_a, u AS node_b, CAST(n AS BIGINT) AS n_common, jaccard
FROM rk WHERE rn <= {k} ORDER BY node_a, jaccard DESC, node_b"""


def web_opic_sql(iters: int = 20) -> str:
    """OPIC mirror (algorithms/opic.py): per round, bank cash into
    history, push cash/outdeg along out-edges, redistribute dangling
    cash uniformly; score = (history + cash)/(iters + 1), round6."""
    ctes = [WEB_BASE, WEB_EDGES, WEB_NODES,
            "nw AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM wnodes)",
            "wout AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) "
            "AS deg FROM wedges GROUP BY src)",
            "c0 AS (SELECT node, 1.0 / (SELECT n FROM nw) AS c FROM wnodes)",
            "h0 AS (SELECT node, CAST(0.0 AS DOUBLE) AS h FROM wnodes)"]
    for k in range(1, iters + 1):
        ctes.append(f"""d{k} AS (
  SELECT coalesce(sum(c.c), 0) AS d
  FROM c{k-1} c LEFT JOIN wout wo ON wo.src = c.node
  WHERE wo.src IS NULL)""")
        ctes.append(f"""h{k} AS MATERIALIZED (
  SELECT h.node, h.h + c.c AS h
  FROM h{k-1} h JOIN c{k-1} c ON c.node = h.node)""")
        ctes.append(f"""c{k} AS MATERIALIZED (
  SELECT n.node,
         coalesce(sum(p.c / wo.deg), 0)
           + (SELECT d FROM d{k}) / (SELECT n FROM nw) AS c
  FROM wnodes n
  LEFT JOIN wedges e ON e.dst = n.node
  LEFT JOIN c{k-1} p ON p.node = e.src
  LEFT JOIN wout wo ON wo.src = e.src
  GROUP BY n.node)""")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT h.node AS url, round((h.h + c.c) / {iters + 1}, 6) AS score
FROM h{iters} h JOIN c{iters} c ON c.node = h.node ORDER BY url""")


def web_pagerank_dangling_sql(iters: int = 20, damping: float = 0.85) -> str:
    """Normalized dangling-mass PageRank mirror (algorithms/opic.py
    pagerank_dangling): pr' = (1-d)/n + d*(Σ_in pr/outdeg + D/n) with
    D = dangling pr mass; scores sum to 1; round6."""
    ctes = [WEB_BASE, WEB_EDGES, WEB_NODES,
            "nw AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM wnodes)",
            "wout AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) "
            "AS deg FROM wedges GROUP BY src)",
            "r0 AS (SELECT node, 1.0 / (SELECT n FROM nw) AS r FROM wnodes)"]
    for k in range(1, iters + 1):
        ctes.append(f"""dm{k} AS (
  SELECT coalesce(sum(r.r), 0) AS d
  FROM r{k-1} r LEFT JOIN wout wo ON wo.src = r.node
  WHERE wo.src IS NULL)""")
        ctes.append(f"""r{k} AS MATERIALIZED (
  SELECT n.node,
         (1 - {damping}) / (SELECT n FROM nw)
           + {damping} * (coalesce(sum(p.r / wo.deg), 0))
           + {damping} * (SELECT d FROM dm{k}) / (SELECT n FROM nw) AS r
  FROM wnodes n
  LEFT JOIN wedges e ON e.dst = n.node
  LEFT JOIN r{k-1} p ON p.node = e.src
  LEFT JOIN wout wo ON wo.src = e.src
  GROUP BY n.node)""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node AS url, round(r, 6) AS score FROM r{iters} "
              "ORDER BY url")


WEB_POWERLAW_SQL = f"""WITH {WEB_BASE},
{WEB_EDGES},
wdeg AS (SELECT src, count(*) AS dg FROM wedges GROUP BY src),
t AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(ln(dg / 1.5)) AS s
      FROM wdeg WHERE dg >= 2)
SELECT round(1 + n / s, 6) AS alpha, CAST(n AS BIGINT) AS n_tail FROM t"""


DEGREE_GINI_SQL = f"""WITH {WEB_BASE},
{WEB_EDGES},
{WEB_NODES},
wdeg AS (SELECT src, count(*) AS dg FROM wedges GROUP BY src),
gd AS (SELECT coalesce(wdeg.dg, 0) AS d
       FROM wnodes n LEFT JOIN wdeg ON wdeg.src = n.node),
r AS (SELECT d, row_number() OVER (ORDER BY d) AS rnk FROM gd),
t AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(d) AS BIGINT) AS s,
             CAST(sum(rnk * d) AS BIGINT) AS t2 FROM r)
SELECT n AS n_nodes,
       round(2.0 * t2 / (CAST(n AS DOUBLE) * s) - (n + 1.0) / n, 6) AS gini
FROM t"""


HOST_OUTLINK_ENTROPY_SQL = f"""WITH {WEB_BASE},
{WEB_EDGES},
hp AS (SELECT regexp_extract(src, '^[a-z]+://([^/]+)', 1) AS src_host,
              regexp_extract(dst, '^[a-z]+://([^/]+)', 1) AS dst_host
       FROM wedges),
hc AS (SELECT src_host AS host, dst_host, count(*) AS n
       FROM hp GROUP BY src_host, dst_host),
agg AS (SELECT host, CAST(count(*) AS BIGINT) AS n_targets,
               CAST(sum(n) AS BIGINT) AS total_links,
               sum(n * ln(n)) AS s2
        FROM hc GROUP BY host)
SELECT host, n_targets, total_links,
       round(ln(total_links) - s2 / total_links, 6) AS entropy
FROM agg ORDER BY host"""


RICH_CLUB_SQL = f"""WITH {WEB_BASE},
{WEB_EDGES},
und AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM wedges),
deg AS (SELECT node, count(*) AS d FROM
        (SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und) t
        GROUP BY node),
ks AS (SELECT CAST(unnest([2, 4, 8, 16, 32]) AS BIGINT) AS k),
ek AS (SELECT ks.k, count(*) AS rich_edges
       FROM und p JOIN deg da ON da.node = p.u
       JOIN deg db ON db.node = p.v
       CROSS JOIN ks
       WHERE least(da.d, db.d) > ks.k GROUP BY ks.k),
nk AS (SELECT ks.k, count(*) AS n_rich FROM deg CROSS JOIN ks
       WHERE deg.d > ks.k GROUP BY ks.k)
SELECT nk.k, nk.n_rich, coalesce(ek.rich_edges, 0) AS rich_edges,
       round(CASE WHEN nk.n_rich > 1
             THEN 2.0 * coalesce(ek.rich_edges, 0)
                  / (nk.n_rich * (nk.n_rich - 1.0))
             ELSE 0 END, 6) AS phi
FROM nk LEFT JOIN ek ON ek.k = nk.k
ORDER BY nk.k"""


HOST_TRIANGLES_SQL = f"""WITH {WEB_BASE},
{WEB_EDGES},
hp AS MATERIALIZED (
  SELECT DISTINCT regexp_extract(src, '^[a-z]+://([^/]+)', 1) AS sh,
                  regexp_extract(dst, '^[a-z]+://([^/]+)', 1) AS dh
  FROM wedges),
und AS MATERIALIZED (
  SELECT DISTINCT least(sh, dh) AS u, greatest(sh, dh) AS v
  FROM hp WHERE sh != dh),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM und e1
  JOIN und e2 ON e2.u = e1.u AND e2.v > e1.v
  JOIN und e3 ON e3.u = e1.v AND e3.v = e2.v),
hnodes AS (SELECT u AS node FROM und UNION SELECT v FROM und),
hdeg AS (SELECT node, count(*) AS d FROM
         (SELECT u AS node FROM und UNION ALL SELECT v FROM und) t
         GROUP BY node),
cnt AS (SELECT node, count(*) AS t FROM
        (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
         UNION ALL SELECT c FROM tri) x GROUP BY node)
SELECT n.node AS host, coalesce(cnt.t, 0) AS triangles,
       round(CASE WHEN hdeg.d > 1
             THEN 2.0 * coalesce(cnt.t, 0) / (hdeg.d * (hdeg.d - 1.0))
             ELSE 0 END, 6) AS coefficient
FROM hnodes n JOIN hdeg ON hdeg.node = n.node
LEFT JOIN cnt ON cnt.node = n.node
ORDER BY host"""


# Bow-tie decomposition (Broder et al. WWW 2000): SCC membership via a
# full reachability closure (fine at oracle scale), then IN/OUT from
# the closure and TENDRIL vs DISCONNECTED from undirected reachability
# off the core. Mirrors algorithms/bowtie.py's category precedence.
WEB_BOWTIE_SQL = f"""WITH RECURSIVE {WEB_BASE},
{WEB_EDGES},
bnodes AS MATERIALIZED (
  SELECT DISTINCT node FROM (SELECT src AS node FROM wedges
                             UNION ALL SELECT dst FROM wedges) t),
reach(s, d) AS (
  SELECT src, dst FROM wedges
  UNION
  SELECT r.s, e.dst FROM reach r JOIN wedges e ON e.src = r.d),
mut AS MATERIALIZED (
  SELECT r1.s AS v, r1.d AS u FROM reach r1
  JOIN reach r2 ON r2.s = r1.d AND r2.d = r1.s),
sccid AS MATERIALIZED (
  SELECT n.node AS v,
         greatest(n.node, coalesce(max(m.u), n.node)) AS comp
  FROM bnodes n LEFT JOIN mut m ON m.v = n.node
  GROUP BY n.node),
giant AS (SELECT comp FROM sccid GROUP BY comp
          ORDER BY count(*) DESC, comp ASC LIMIT 1),
core AS MATERIALIZED (
  SELECT v FROM sccid WHERE comp = (SELECT comp FROM giant)),
outset AS MATERIALIZED (
  SELECT DISTINCT r.d AS v FROM reach r
  WHERE r.s IN (SELECT v FROM core)),
inset AS MATERIALIZED (
  SELECT DISTINCT r.s AS v FROM reach r
  WHERE r.d IN (SELECT v FROM core)),
uedges AS MATERIALIZED (
  SELECT DISTINCT a, b FROM (SELECT src AS a, dst AS b FROM wedges
                             UNION ALL SELECT dst, src FROM wedges) t),
weak(v) AS (
  SELECT v FROM core
  UNION
  SELECT e.b FROM weak w JOIN uedges e ON e.a = w.v)
SELECT n.node AS url,
  CASE WHEN n.node IN (SELECT v FROM core) THEN 'CORE'
       WHEN n.node IN (SELECT v FROM inset) THEN 'IN'
       WHEN n.node IN (SELECT v FROM outset) THEN 'OUT'
       WHEN n.node IN (SELECT v FROM weak) THEN 'TENDRIL'
       ELSE 'DISCONNECTED' END AS category
FROM bnodes n ORDER BY url"""


def heavy_hitter_hosts_sql(k: int = 20) -> str:
    """Mirror of functions/sketches.heavy_hitters over inbound host
    link counts (page-level distinct links into each host)."""
    return f"""WITH {WEB_BASE},
{WEB_EDGES},
hh AS (SELECT regexp_extract(dst, '^[a-z]+://([^/]+)', 1) AS host
       FROM wedges),
c AS (SELECT host, count(*) AS n FROM hh GROUP BY host)
SELECT host, n FROM c ORDER BY n DESC, host LIMIT {k}"""


TWO_HOP_SIZE_SQL = f"""WITH {WEB_BASE},
{WEB_EDGES},
hedges AS MATERIALIZED (
  SELECT DISTINCT regexp_extract(src, '^[a-z]+://([^/]+)', 1) AS src,
                  regexp_extract(dst, '^[a-z]+://([^/]+)', 1) AS dst
  FROM wedges
  WHERE regexp_extract(src, '^[a-z]+://([^/]+)', 1)
     != regexp_extract(dst, '^[a-z]+://([^/]+)', 1)),
two AS (
  SELECT src, dst AS d FROM hedges
  UNION
  SELECT e1.src, e2.dst AS d FROM hedges e1
  JOIN hedges e2 ON e1.dst = e2.src)
SELECT src AS host, count(*) AS n_reach2
FROM two WHERE d != src GROUP BY src ORDER BY host"""


def effective_diameter_sql(percentile: float = 0.9,
                           max_depth: int = 64) -> str:
    """Mirror of algorithms/msbfs.effective_diameter over the host
    graph: recursive-CTE all-pairs shortest hop counts (depth-bounded;
    exact while the true diameter < max_depth), then the percentile
    cut over the cumulative pair histogram."""
    return f"""WITH RECURSIVE {WEB_BASE},
{WEB_EDGES},
hedges AS MATERIALIZED (
  SELECT DISTINCT regexp_extract(src, '^[a-z]+://([^/]+)', 1) AS src,
                  regexp_extract(dst, '^[a-z]+://([^/]+)', 1) AS dst
  FROM wedges
  WHERE regexp_extract(src, '^[a-z]+://([^/]+)', 1)
     != regexp_extract(dst, '^[a-z]+://([^/]+)', 1)),
r(s, t, d) AS (
  SELECT src, dst, 1 FROM hedges
  UNION
  SELECT r.s, e.dst, r.d + 1 FROM r JOIN hedges e ON e.src = r.t
  WHERE r.d < {max_depth}),
sp AS MATERIALIZED (
  SELECT s, t, min(d) AS d FROM r WHERE s != t GROUP BY s, t),
h AS (SELECT d, count(*) AS n FROM sp GROUP BY d),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS np,
               CAST(sum(d * n) AS DOUBLE) AS sd FROM h),
c AS (SELECT d, sum(n) OVER (ORDER BY d) AS cum FROM h)
SELECT tot.np AS n_reachable_pairs,
       round(tot.sd / tot.np, 6) AS mean_distance,
       CAST((SELECT min(d) FROM c WHERE cum >= {percentile} * tot.np)
            AS BIGINT) AS effective_diameter,
       CAST((SELECT max(d) FROM h) AS BIGINT) AS diameter
FROM tot"""


URL_CANONICAL_SQL = """WITH p AS (
  SELECT doc_id AS pid,
         'http://site-' || (doc_id % 20) || '.test/page/' || doc_id AS url
  FROM documents)
SELECT url,
       CASE pid % 4
         WHEN 0 THEN url || '?utm_source=feed&ref=rss'
         WHEN 1 THEN url || '?id=' || pid || '&fbclid=abc123#sec2'
         WHEN 2 THEN upper('http://site-' || (pid % 20) || '.test')
                     || ':80/page/' || pid
         ELSE url || '/'
       END AS url_messy,
       CASE WHEN pid % 4 = 1 THEN url || '?id=' || pid ELSE url END
         AS url_canon
FROM p ORDER BY url"""


def mis_luby_sql(rounds: int = 8) -> str:
    """Mirror of algorithms/mis.mis_luby over the undirected host
    graph: identical md5(node ∥ '#r') priorities, rounds unrolled."""
    ctes = [WEB_BASE, WEB_EDGES,
            """hedges AS MATERIALIZED (
  SELECT DISTINCT regexp_extract(src, '^[a-z]+://([^/]+)', 1) AS src,
                  regexp_extract(dst, '^[a-z]+://([^/]+)', 1) AS dst
  FROM wedges
  WHERE regexp_extract(src, '^[a-z]+://([^/]+)', 1)
     != regexp_extract(dst, '^[a-z]+://([^/]+)', 1))""",
            "hund AS MATERIALIZED (SELECT src AS a, dst AS b FROM hedges "
            "UNION SELECT dst, src FROM hedges)",
            "act0 AS (SELECT DISTINCT a AS node FROM hund)"]
    for r in range(rounds):
        ctes += [
            f"pr{r} AS MATERIALIZED (SELECT node, CAST(('0x' || "
            f"substr(md5(node || '#{r}'), 1, 15)) AS BIGINT) AS p "
            f"FROM act{r})",
            f"nm{r} AS (SELECT e.a AS node, min(p2.p) AS mp FROM hund e "
            f"JOIN pr{r} p1 ON p1.node = e.a "
            f"JOIN pr{r} p2 ON p2.node = e.b GROUP BY e.a)",
            f"win{r} AS MATERIALIZED (SELECT p.node FROM pr{r} p "
            f"LEFT JOIN nm{r} m ON m.node = p.node "
            f"WHERE m.mp IS NULL OR p.p < m.mp)",
            f"rem{r} AS MATERIALIZED (SELECT DISTINCT e.b AS node "
            f"FROM hund e JOIN win{r} w ON w.node = e.a "
            f"JOIN pr{r} p2 ON p2.node = e.b)",
            f"act{r + 1} AS MATERIALIZED (SELECT node FROM act{r} "
            f"EXCEPT SELECT node FROM win{r} "
            f"EXCEPT SELECT node FROM rem{r})",
        ]
    wins = " UNION ALL ".join(
        f"SELECT node, 'in_mis' AS status FROM win{r}" for r in range(rounds))
    rems = " UNION ALL ".join(
        f"SELECT node, 'removed' AS status FROM rem{r}" for r in range(rounds))
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT node AS host, status FROM ({wins}
UNION ALL {rems}
UNION ALL SELECT node, 'active' AS status FROM act{rounds}) t
ORDER BY host""")


HOST_DISTINCT_OUTLINKS_SQL = f"""WITH {WEB_BASE},
{WEB_EDGES},
hh AS (SELECT regexp_extract(src, '^[a-z]+://([^/]+)', 1) AS host, dst
       FROM wedges),
h AS (SELECT host,
             CAST(('0x' || substr(md5(dst), 1, 15)) AS BIGINT) AS hv
      FROM hh),
r AS (SELECT host, hv % 256 AS reg,
             CASE WHEN hv // 256 = 0 THEN 53
                  ELSE 52 - CAST(floor(log2(hv // 256)) AS BIGINT) END AS rho
      FROM h),
mr AS (SELECT host, reg, max(rho) AS mrho FROM r GROUP BY host, reg),
agg AS (SELECT host, count(*) AS hits,
               sum(pow(2.0, -mrho)) AS s FROM mr GROUP BY host),
e AS (SELECT host, hits,
             (0.7213 / (1 + 1.079 / 256.0)) * 256.0 * 256.0
               / (s + (256 - hits)) AS raw,
             256 - hits AS zeros
      FROM agg)
SELECT host, CAST(hits AS BIGINT) AS hit_registers,
       round(CASE WHEN raw <= 2.5 * 256 AND zeros > 0
                  THEN 256.0 * ln(256.0 / zeros) ELSE raw END, 6)
         AS n_distinct_est
FROM e ORDER BY host"""


def host_articlerank_sql(iters: int = 20) -> str:
    """Mirror of algorithms/pagerank.articlerank over the host graph:
    divisor = outdeg + avg_outdeg (edges/nodes of the host graph)."""
    ctes = [WEB_BASE, WEB_EDGES,
            """hedges AS MATERIALIZED (
  SELECT DISTINCT regexp_extract(src, '^[a-z]+://([^/]+)', 1) AS src,
                  regexp_extract(dst, '^[a-z]+://([^/]+)', 1) AS dst
  FROM wedges
  WHERE regexp_extract(src, '^[a-z]+://([^/]+)', 1)
     != regexp_extract(dst, '^[a-z]+://([^/]+)', 1))""",
            "hnodes AS MATERIALIZED (SELECT src AS node FROM hedges "
            "UNION SELECT dst FROM hedges)",
            "avgd AS (SELECT CAST((SELECT count(*) FROM hedges) AS DOUBLE) "
            "/ (SELECT count(*) FROM hnodes) AS a)",
            "hdeg AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) AS dg "
            "FROM hedges GROUP BY src)",
            "a0 AS (SELECT node, CAST(0.15 AS DOUBLE) AS r FROM hnodes)"]
    for k in range(1, iters + 1):
        ctes.append(f"""a{k} AS MATERIALIZED (
  SELECT n.node,
         0.15 + 0.85 * coalesce(sum(p.r / (dg.dg + (SELECT a FROM avgd))), 0)
           AS r
  FROM hnodes n
  LEFT JOIN hedges e ON e.dst = n.node
  LEFT JOIN a{k-1} p ON p.node = e.src
  LEFT JOIN hdeg dg ON dg.src = e.src
  GROUP BY n.node)""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node AS host, round(r, 6) AS score FROM a{iters} "
              "ORDER BY host")


def web_kcore_decomposition_sql(rounds: int = 64) -> str:
    """Mirror of algorithms/kcore.kcore_decomposition over the deduped
    undirected web graph, via the iterated-h-index fixpoint (Lü et al.
    PNAS 2016): c_0 = degree, c_{t+1}(v) = H({c_t(u) : u ∼ v})
    converges monotonically to the exact coreness, so with enough
    unrolled rounds the integer core numbers equal the engine's
    peel exactly. h-index per node = max(min(rank, value)) over
    neighbors' values ranked descending."""
    ctes = [WEB_BASE, WEB_EDGES, WEB_NODES,
            """wund AS MATERIALIZED (
  SELECT src AS a, dst AS b FROM wedges
  UNION SELECT dst, src FROM wedges)""",
            """h0 AS MATERIALIZED (
  SELECT n.node, CAST(coalesce(d.dg, 0) AS BIGINT) AS c
  FROM wnodes n LEFT JOIN (SELECT a, count(*) AS dg FROM wund GROUP BY a) d
  ON d.a = n.node)"""]
    for t in range(1, rounds + 1):
        ctes.append(f"""h{t} AS MATERIALIZED (
  SELECT n.node, CAST(coalesce(max(least(x.rn, x.c)), 0) AS BIGINT) AS c
  FROM wnodes n LEFT JOIN (
    SELECT e.a AS node, p.c,
           row_number() OVER (PARTITION BY e.a ORDER BY p.c DESC) AS rn
    FROM wund e JOIN h{t - 1} p ON p.node = e.b) x ON x.node = n.node
  GROUP BY n.node)""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node AS url, c AS core FROM h{rounds} ORDER BY url")


def web_ktruss_sql(k: int = 4, rounds: int = 16) -> str:
    """Mirror of algorithms/ktruss.k_truss over the deduped undirected
    web graph: per round drop edges in < k−2 triangles, unrolled to a
    fixpoint (extra rounds are no-ops once stable). Canonical u < v
    pairs — dense-id order equals url order."""
    sup = k - 2
    ctes = [WEB_BASE, WEB_EDGES,
            """e0 AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
  FROM wedges WHERE src != dst)"""]
    for t in range(rounds):
        ctes.append(f"""w{t} AS (SELECT u AS a, v AS b FROM e{t}
  UNION ALL SELECT v, u FROM e{t})""")
        ctes.append(f"""e{t + 1} AS MATERIALIZED (
  SELECT e.u, e.v FROM e{t} e
  JOIN w{t} x ON x.a = e.u
  JOIN w{t} y ON y.a = e.v AND y.b = x.b
  GROUP BY e.u, e.v HAVING count(*) >= {sup})""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT u AS url_u, v AS url_v FROM e{rounds} "
              "ORDER BY url_u, url_v")


WEB_GRAPH_SUMMARY_SQL = f"""WITH {WEB_BASE},
{WEB_EDGES},
{WEB_NODES},
od AS (SELECT max(c) AS m FROM (SELECT count(*) AS c FROM wedges GROUP BY src)),
idg AS (SELECT max(c) AS m FROM (SELECT count(*) AS c FROM wedges GROUP BY dst)),
nn2 AS (SELECT count(*) AS n FROM wnodes),
ne AS (SELECT count(*) AS n FROM wedges),
rc AS (SELECT count(*) AS n FROM wedges a
       JOIN wedges b ON b.src = a.dst AND b.dst = a.src)
SELECT nn2.n AS n_nodes, ne.n AS n_edges,
       round(ne.n / greatest(CAST(nn2.n AS DOUBLE) * (nn2.n - 1), 1), 6)
         AS density,
       od.m AS max_out_degree, idg.m AS max_in_degree,
       round(rc.n / greatest(CAST(ne.n AS DOUBLE), 1), 6) AS reciprocity
FROM nn2, ne, od, idg, rc"""


def host_katz_sql(alpha: float = 0.05, beta: float = 1.0,
                  iters: int = 20) -> str:
    """Mirror of algorithms/pagerank.katz over the host graph."""
    ctes = [WEB_BASE, WEB_EDGES,
            """hedges AS MATERIALIZED (
  SELECT DISTINCT regexp_extract(src, '^[a-z]+://([^/]+)', 1) AS src,
                  regexp_extract(dst, '^[a-z]+://([^/]+)', 1) AS dst
  FROM wedges
  WHERE regexp_extract(src, '^[a-z]+://([^/]+)', 1)
     != regexp_extract(dst, '^[a-z]+://([^/]+)', 1))""",
            "hnodes AS MATERIALIZED (SELECT src AS node FROM hedges "
            "UNION SELECT dst FROM hedges)",
            f"x0 AS (SELECT node, CAST({beta} AS DOUBLE) AS r FROM hnodes)"]
    for k in range(1, iters + 1):
        ctes.append(f"""x{k} AS MATERIALIZED (
  SELECT n.node, {beta} + {alpha} * coalesce(sum(p.r), 0) AS r
  FROM hnodes n
  LEFT JOIN hedges e ON e.dst = n.node
  LEFT JOIN x{k-1} p ON p.node = e.src
  GROUP BY n.node)""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node AS host, round(r, 6) AS score FROM x{iters} "
              "ORDER BY host")


def web_matching_sql(rounds: int = 8) -> str:
    """Mirror of algorithms/matching.maximal_matching over the
    undirected web page graph: identical md5(a ∥ '|' ∥ b ∥ '#r') edge
    priorities, unique-strict-min win rule, rounds unrolled."""
    ctes = [WEB_BASE, WEB_EDGES,
            "mund AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, "
            "greatest(src, dst) AS b FROM wedges WHERE src != dst)",
            "mact0 AS (SELECT a AS node FROM mund UNION SELECT b FROM mund)"]
    for r in range(rounds):
        ctes += [
            f"live{r} AS MATERIALIZED (SELECT e.a, e.b, "
            f"CAST(('0x' || substr(md5(e.a || '|' || e.b || '#{r}'), 1, 15)) "
            f"AS BIGINT) AS p FROM mund e "
            f"JOIN mact{r} x ON x.node = e.a "
            f"JOIN mact{r} y ON y.node = e.b)",
            f"inc{r} AS (SELECT a AS node, p FROM live{r} "
            f"UNION ALL SELECT b, p FROM live{r})",
            f"st{r} AS MATERIALIZED (SELECT g.node, m.mp FROM "
            f"(SELECT node, p, count(*) AS c FROM inc{r} GROUP BY node, p) g "
            f"JOIN (SELECT node, min(p) AS mp FROM inc{r} GROUP BY node) m "
            f"ON m.node = g.node AND g.p = m.mp WHERE g.c = 1)",
            f"win{r} AS MATERIALIZED (SELECT l.a, l.b FROM live{r} l "
            f"JOIN st{r} sa ON sa.node = l.a AND sa.mp = l.p "
            f"JOIN st{r} sb ON sb.node = l.b AND sb.mp = l.p)",
            f"mact{r + 1} AS MATERIALIZED (SELECT node FROM mact{r} "
            f"EXCEPT (SELECT a FROM win{r} UNION SELECT b FROM win{r}))",
        ]
    wins = " UNION ALL ".join(
        f"SELECT a, b, {r} AS matched_round FROM win{r}"
        for r in range(rounds))
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT a AS url_a, b AS url_b, CAST(matched_round AS BIGINT) AS matched_round
FROM ({wins}) t ORDER BY url_a, url_b""")


CRAWL_FRONTIER_SQL = f"""WITH {WEB_BASE},
{WEB_EDGES},
kk AS (SELECT (3 * n) // 5 AS k FROM nn),
cw AS MATERIALIZED (
  SELECT src, dst FROM wedges
  WHERE CAST(regexp_extract(src, '/page/(\\d+)$', 1) AS BIGINT)
        < (SELECT k FROM kk)),
od AS (SELECT src, count(*) AS c FROM cw GROUP BY src)
SELECT cw.dst AS url, round(sum(1.0 / od.c), 6) AS score
FROM cw JOIN od ON od.src = cw.src
WHERE CAST(regexp_extract(cw.dst, '/page/(\\d+)$', 1) AS BIGINT)
      >= (SELECT k FROM kk)
GROUP BY cw.dst ORDER BY url"""


CANONICAL_DEDUP_SQL = """WITH caps AS (
  SELECT doc_id AS pid, unnest(generate_series(0, doc_id % 3)) AS v
  FROM documents),
u AS (SELECT pid, v,
             'http://site-' || (pid % 20) || '.test/page/' || pid AS url
      FROM caps)
SELECT url AS url_canon,
       CAST(pid % 3 + 1 AS BIGINT) AS n_captures,
       CASE pid % 3
         WHEN 0 THEN url
         WHEN 1 THEN url || '?utm_source=feed&ref=rss'
         ELSE url || '/'
       END AS kept_url,
       CAST(1704067200000000 + pid * 1000000
            + (pid % 3) * 86400000000 AS BIGINT) AS kept_ts_us
FROM u WHERE v = 0 ORDER BY url_canon"""


def host_rank_hhi_sql(iters: int = 20) -> str:
    """Mirror of _q_host_rank_hhi: the web_pagerank unroll grouped by
    host, HHI = sum(r^2) / sum(r)^2 per host."""
    ctes = [WEB_BASE, WEB_EDGES, WEB_NODES,
            "wdeg AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) AS dg "
            "FROM wedges GROUP BY src)",
            "r0 AS (SELECT node, CAST(0.15 AS DOUBLE) AS r FROM wnodes)"]
    for k in range(1, iters + 1):
        ctes.append(f"""r{k} AS MATERIALIZED (
  SELECT n.node, 0.15 + 0.85 * coalesce(sum(p.r / dg.dg), 0) AS r
  FROM wnodes n
  LEFT JOIN wedges e ON e.dst = n.node
  LEFT JOIN r{k-1} p ON p.node = e.src
  LEFT JOIN wdeg dg ON dg.src = e.src
  GROUP BY n.node)""")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT regexp_extract(node, '^[a-z]+://([^/]+)', 1) AS host,
       count(*) AS n_pages,
       round(sum(r * r) / (sum(r) * sum(r)), 6) AS hhi
FROM r{iters} GROUP BY host ORDER BY host""")


URL_TEMPLATES_SQL = """WITH p AS (
  SELECT 'http://site-' || (doc_id % 20) || '.test/page/' || doc_id AS url
  FROM documents)
SELECT regexp_extract(url, '^[a-z]+://[^/?#]*')
         || regexp_replace(regexp_replace(url, '^[a-z]+://[^/?#]*', ''),
                           '[0-9]+', '{n}', 'g') AS template,
       CAST(count(*) AS BIGINT) AS n_urls
FROM p GROUP BY template ORDER BY template"""


def hub_removal_wcc_sql(iters: int = 60, k: int = 20) -> str:
    """Mirror of _q_hub_removal_wcc: drop the top-k out-degree pages
    (ties by url asc), hash-min WCC sizes over the survivors
    (isolated survivors = singletons)."""
    ctes = [WEB_BASE, WEB_EDGES, WEB_NODES,
            "wdeg2 AS (SELECT src, count(*) AS dg FROM wedges GROUP BY src)",
            f"hubs AS MATERIALIZED (SELECT src AS node FROM wdeg2 "
            f"ORDER BY dg DESC, src ASC LIMIT {k})",
            "fnodes AS MATERIALIZED (SELECT node FROM wnodes "
            "WHERE node NOT IN (SELECT node FROM hubs))",
            "fedges AS MATERIALIZED (SELECT src, dst FROM wedges "
            "WHERE src NOT IN (SELECT node FROM hubs) "
            "AND dst NOT IN (SELECT node FROM hubs))",
            "fsym AS MATERIALIZED (SELECT src AS a, dst AS b FROM fedges "
            "UNION ALL SELECT dst, src FROM fedges)",
            "h0 AS (SELECT node, node AS c FROM fnodes)"]
    for i in range(1, iters + 1):
        ctes.append(f"""h{i} AS MATERIALIZED (
  SELECT n.node, least(p.c, coalesce(min(q.c), p.c)) AS c
  FROM fnodes n
  JOIN h{i-1} p ON p.node = n.node
  LEFT JOIN fsym e ON e.a = n.node
  LEFT JOIN h{i-1} q ON q.node = e.b
  GROUP BY n.node, p.c)""")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT c AS component, count(*) AS size FROM h{iters}
GROUP BY c ORDER BY component""")


_HEDGES = """hedges AS MATERIALIZED (
  SELECT DISTINCT regexp_extract(src, '^[a-z]+://([^/]+)', 1) AS src,
                  regexp_extract(dst, '^[a-z]+://([^/]+)', 1) AS dst
  FROM wedges
  WHERE regexp_extract(src, '^[a-z]+://([^/]+)', 1)
     != regexp_extract(dst, '^[a-z]+://([^/]+)', 1))"""


def host_simrank_sql(iters: int = 5, c: float = 0.8) -> str:
    """Mirror of algorithms/simrank.py over the host graph: in-neighbor
    SimRank, decay c, diagonal pinned to 1, zero pairs pruned each
    sweep (exact), emitted as a < b with round6 scores."""
    ctes = [WEB_BASE, WEB_EDGES, _HEDGES,
            "hnodes AS MATERIALIZED (SELECT src AS node FROM hedges "
            "UNION SELECT dst FROM hedges)",
            "hind AS (SELECT dst, CAST(count(*) AS DOUBLE) AS d "
            "FROM hedges GROUP BY dst)",
            "p0 AS (SELECT node AS a, node AS b, CAST(1 AS DOUBLE) AS s "
            "FROM hnodes)"]
    for k in range(1, iters + 1):
        ctes.append(f"""p{k} AS MATERIALIZED (
  SELECT x.a, x.b, {c} * x.ss / (ia.d * ib.d) AS s
  FROM (SELECT e1.dst AS a, e2.dst AS b, sum(p.s) AS ss
        FROM p{k-1} p
        JOIN hedges e1 ON e1.src = p.a
        JOIN hedges e2 ON e2.src = p.b
        WHERE e1.dst != e2.dst
        GROUP BY 1, 2) x
  JOIN hind ia ON ia.dst = x.a
  JOIN hind ib ON ib.dst = x.b
  WHERE x.ss > 0
  UNION ALL SELECT node, node, CAST(1 AS DOUBLE) FROM hnodes)""")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT a AS host_a, b AS host_b, round(s, 6) AS simrank
FROM p{iters} WHERE a < b ORDER BY host_a, host_b""")


_PAGE_LANG = (f"pl AS (SELECT {_url('doc_id')} AS url, lang "
              "FROM documents)")

LANG_MIXING_SQL = f"""WITH {WEB_BASE},
{WEB_EDGES},
{_PAGE_LANG},
m AS (SELECT s.lang AS src_lang, t.lang AS dst_lang, count(*) AS n_edges
      FROM wedges e
      JOIN pl s ON s.url = e.src
      JOIN pl t ON t.url = e.dst
      GROUP BY 1, 2)
SELECT src_lang, dst_lang, CAST(n_edges AS BIGINT) AS n_edges,
       round(n_edges / (SELECT CAST(sum(n_edges) AS DOUBLE) FROM m), 6)
         AS frac
FROM m ORDER BY src_lang, dst_lang"""

LANG_ASSORTATIVITY_SQL = f"""WITH {WEB_BASE},
{WEB_EDGES},
{_PAGE_LANG},
m AS (SELECT s.lang AS src_lang, t.lang AS dst_lang,
             CAST(count(*) AS DOUBLE) AS n_edges
      FROM wedges e
      JOIN pl s ON s.url = e.src
      JOIN pl t ON t.url = e.dst
      GROUP BY 1, 2),
tot AS (SELECT sum(n_edges) AS t FROM m),
eii AS (SELECT coalesce(sum(n_edges / (SELECT t FROM tot)), 0) AS x
        FROM m WHERE src_lang = dst_lang),
ab AS (SELECT coalesce(sum(a.sa * b.sb), 0) AS y FROM
         (SELECT src_lang AS l, sum(n_edges / (SELECT t FROM tot)) AS sa
          FROM m GROUP BY 1) a
       JOIN
         (SELECT dst_lang AS l, sum(n_edges / (SELECT t FROM tot)) AS sb
          FROM m GROUP BY 1) b ON a.l = b.l)
SELECT round(((SELECT x FROM eii) - (SELECT y FROM ab))
             / (1 - (SELECT y FROM ab)), 6) AS assortativity"""


def _rank_ctes(iters: int) -> list:
    """The unrolled raw (unrounded) web PageRank chain r0..r{iters}."""
    ctes = [WEB_BASE, WEB_EDGES, WEB_NODES,
            "wdeg AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) "
            "AS dg FROM wedges GROUP BY src)",
            "r0 AS (SELECT node, CAST(0.15 AS DOUBLE) AS r FROM wnodes)"]
    for k in range(1, iters + 1):
        ctes.append(f"""r{k} AS MATERIALIZED (
  SELECT n.node, 0.15 + 0.85 * coalesce(sum(p.r / dg.dg), 0) AS r
  FROM wnodes n
  LEFT JOIN wedges e ON e.dst = n.node
  LEFT JOIN r{k-1} p ON p.node = e.src
  LEFT JOIN wdeg dg ON dg.src = e.src
  GROUP BY n.node)""")
    return ctes


def lang_rank_mass_sql(iters: int = 20) -> str:
    """Mirror of _q_lang_rank_mass: total raw PageRank mass per page
    language plus its share of the corpus total."""
    ctes = _rank_ctes(iters)
    ctes.append(f"pl AS (SELECT {_url('doc_id')} AS url, lang "
                "FROM documents)")
    ctes.append(f"m AS (SELECT pl.lang, sum(r.r) AS mass FROM r{iters} r "
                "JOIN pl ON pl.url = r.node GROUP BY pl.lang)")
    return ("WITH " + ",\n".join(ctes) + """
SELECT lang, round(mass, 6) AS rank_mass,
       round(mass / (SELECT sum(mass) FROM m), 6) AS share
FROM m ORDER BY lang""")


def rank_degree_corr_sql(iters: int = 20) -> str:
    """Mirror of _q_rank_degree_corr: Pearson r between per-page
    in-degree and raw PageRank, moment-sum formula."""
    ctes = _rank_ctes(iters)
    ctes.append("ind AS (SELECT dst, CAST(count(*) AS DOUBLE) AS idg "
                "FROM wedges GROUP BY dst)")
    ctes.append(f"""xy AS (SELECT coalesce(i.idg, 0) AS x, r.r AS y
  FROM r{iters} r LEFT JOIN ind i ON i.dst = r.node)""")
    return ("WITH " + ",\n".join(ctes) + """,
s AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
      FROM xy)
SELECT round((n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
         AS pearson_r
FROM s""")


HOST_LANG_PROFILE_SQL = """WITH pl AS (
  SELECT 'site-' || (doc_id % 20) || '.test' AS host, lang FROM documents),
c AS (SELECT host, lang, CAST(count(*) AS DOUBLE) AS n
      FROM pl GROUP BY 1, 2),
t AS (SELECT host, sum(n) AS tot, CAST(count(*) AS BIGINT) AS n_langs
      FROM c GROUP BY 1),
dom AS (SELECT host, lang,
               row_number() OVER (PARTITION BY host
                                  ORDER BY n DESC, lang ASC) AS rk
        FROM c),
ent AS (SELECT c.host, -sum((c.n / t.tot) * ln(c.n / t.tot)) AS h
        FROM c JOIN t ON t.host = c.host GROUP BY c.host)
SELECT t.host, CAST(t.tot AS BIGINT) AS n_pages, t.n_langs,
       d.lang AS dominant_lang, round(ent.h, 6) AS lang_entropy
FROM t
JOIN dom d ON d.host = t.host AND d.rk = 1
JOIN ent ON ent.host = t.host
ORDER BY t.host"""


def negative_edges_sql(trials: int = 8, k: int = 3) -> str:
    """Mirror of _q_negative_edges: per source url, md5 trials index
    the global url ordinal table; self-hits and existing edges are
    discarded; first k survivors per source by trial order."""
    ctes = [WEB_BASE, WEB_EDGES,
            f"pl AS (SELECT {_url('doc_id')} AS url FROM documents)",
            "ords AS MATERIALIZED (SELECT url, row_number() "
            "OVER (ORDER BY url) - 1 AS ord FROM pl)",
            "n2 AS (SELECT count(*) AS n FROM ords)",
            f"""cand AS MATERIALIZED (
  SELECT o.url AS src_url, j AS trial,
         CAST(('0x' || substr(md5(o.url || '#neg#' || j), 1, 15))
              AS BIGINT) % (SELECT n FROM n2) AS ord
  FROM ords o, (SELECT unnest(generate_series(1, {trials})) AS j) t)""",
            """tgt AS (SELECT c.src_url, c.trial, o.url AS dst_url
  FROM cand c JOIN ords o ON o.ord = c.ord WHERE o.url != c.src_url)""",
            """neg AS (SELECT t.* FROM tgt t
  LEFT JOIN wedges e ON e.src = t.src_url AND e.dst = t.dst_url
  WHERE e.src IS NULL)"""]
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT src_url, dst_url, CAST(trial AS BIGINT) AS trial
FROM (SELECT *, row_number() OVER (PARTITION BY src_url
                                   ORDER BY trial) AS rk FROM neg)
WHERE rk <= {k} ORDER BY src_url, trial""")


def ppr_sweep_cut_sql(iters: int = 20, t: int = 100, seed: int = 0) -> str:
    """Mirror of _q_ppr_sweep_cut: rank by round6 PPR from the seed
    page (ties by url), conductance of each top-t prefix over the
    undirected simple page graph."""
    seed_url = _url(str(seed))
    seed_case = f"CASE WHEN n.node = {seed_url} THEN 0.15 ELSE 0 END"
    ctes = [WEB_BASE, WEB_EDGES, WEB_NODES,
            "wdeg AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) "
            "AS dg FROM wedges GROUP BY src)",
            f"""p0 AS (SELECT node,
  CAST(CASE WHEN node = {seed_url} THEN 0.15 ELSE 0 END AS DOUBLE) AS r
  FROM wnodes)"""]
    for k in range(1, iters + 1):
        ctes.append(f"""p{k} AS MATERIALIZED (
  SELECT n.node, {seed_case} + 0.85 * coalesce(sum(p.r / dg.dg), 0) AS r
  FROM wnodes n
  LEFT JOIN wedges e ON e.dst = n.node
  LEFT JOIN p{k-1} p ON p.node = e.src
  LEFT JOIN wdeg dg ON dg.src = e.src
  GROUP BY n.node)""")
    ctes += [
        f"""rk AS MATERIALIZED (SELECT node, rank FROM (
  SELECT node, row_number() OVER (ORDER BY round(r, 6) DESC, node ASC)
    AS rank FROM p{iters}) WHERE rank <= {t})""",
        """wund AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM wedges)""",
        """udeg AS (SELECT n, count(*) AS dg FROM (
  SELECT a AS n FROM wund UNION ALL SELECT b FROM wund) GROUP BY n)""",
        f"""er AS MATERIALIZED (
  SELECT coalesce(ra.rank, {t + 1}) AS ra, coalesce(rb.rank, {t + 1}) AS rb
  FROM wund w
  LEFT JOIN rk ra ON ra.node = w.a
  LEFT JOIN rk rb ON rb.node = w.b)""",
        "tot AS (SELECT sum(dg) AS v FROM udeg)",
        """sw AS (SELECT r2.rank AS k,
  (SELECT count(*) FROM er WHERE least(ra, rb) <= r2.rank)
    - (SELECT count(*) FROM er WHERE greatest(ra, rb) <= r2.rank) AS cut,
  (SELECT coalesce(sum(udeg.dg), 0) FROM rk JOIN udeg ON udeg.n = rk.node
   WHERE rk.rank <= r2.rank) AS vol
  FROM rk r2)"""]
    return ("WITH " + ",\n".join(ctes) + """
SELECT k, CAST(cut AS BIGINT) AS cut_edges, CAST(vol AS BIGINT) AS volume,
       round(CAST(cut AS DOUBLE)
             / least(vol, (SELECT v FROM tot) - vol), 6) AS conductance
FROM sw WHERE least(vol, (SELECT v FROM tot) - vol) > 0 ORDER BY k""")


ANCHOR_ENTROPY_SQL = f"""WITH {WEB_BASE},
a AS (SELECT {_url('t')} AS dst_url, 'link ' || j AS anchor,
             CAST(count(*) AS DOUBLE) AS n
      FROM links GROUP BY 1, 2),
t AS (SELECT dst_url, sum(n) AS tot, CAST(count(*) AS BIGINT) AS n_distinct
      FROM a GROUP BY 1),
e AS (SELECT a.dst_url, -sum((a.n / t.tot) * ln(a.n / t.tot)) AS h
      FROM a JOIN t ON t.dst_url = a.dst_url GROUP BY a.dst_url)
SELECT t.dst_url, CAST(t.tot AS BIGINT) AS n_anchors, t.n_distinct,
       round(e.h, 6) AS anchor_entropy
FROM t JOIN e ON e.dst_url = t.dst_url ORDER BY t.dst_url"""


def rank_by_depth_sql(iters: int = 20) -> str:
    """Mirror of _q_rank_by_depth: mean raw PageRank by URL path depth
    (same depth rule as URL_DEPTH_SQL)."""
    ctes = _rank_ctes(iters)
    ctes.append("""dep AS (SELECT node,
  len(regexp_extract_all(regexp_replace(node, '^[a-z]+://[^/]*', ''),
      '/[^/]')) AS depth
  FROM wnodes)""")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT CAST(d.depth AS BIGINT) AS depth,
       CAST(count(*) AS BIGINT) AS n_pages,
       round(avg(r.r), 6) AS mean_rank
FROM r{iters} r JOIN dep d ON d.node = r.node
GROUP BY d.depth ORDER BY depth""")


def web_cheirank_sql(iters: int = 20) -> str:
    """Mirror of _q_web_cheirank: PageRank over the REVERSED edge set
    (communicativity / hub-ness; Chepelianskii 2010)."""
    ctes = [WEB_BASE, WEB_EDGES, WEB_NODES,
            "rdeg AS MATERIALIZED (SELECT dst AS src, "
            "CAST(count(*) AS DOUBLE) AS dg FROM wedges GROUP BY dst)",
            "c0 AS (SELECT node, CAST(0.15 AS DOUBLE) AS r FROM wnodes)"]
    for k in range(1, iters + 1):
        ctes.append(f"""c{k} AS MATERIALIZED (
  SELECT n.node, 0.15 + 0.85 * coalesce(sum(p.r / dg.dg), 0) AS r
  FROM wnodes n
  LEFT JOIN wedges e ON e.src = n.node
  LEFT JOIN c{k-1} p ON p.node = e.dst
  LEFT JOIN rdeg dg ON dg.src = e.dst
  GROUP BY n.node)""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node AS url, round(r, 6) AS score FROM c{iters} "
            "ORDER BY url")


def rank_flows_sql(iters: int = 20, topk: int = 50) -> str:
    """Mirror of _q_rank_flows: top-k edges by transferred rank mass
    r(src)/outdeg(src), ties by (src, dst)."""
    ctes = _rank_ctes(iters)
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT e.src AS src_url, e.dst AS dst_url,
       round(r.r / dg.dg, 6) AS flow
FROM wedges e
JOIN r{iters} r ON r.node = e.src
JOIN wdeg dg ON dg.src = e.src
ORDER BY round(r.r / dg.dg, 6) DESC, e.src ASC, e.dst ASC
LIMIT {topk}""")


def rank_movers_sql(iters: int = 20, mod: int = 5, topk: int = 25) -> str:
    """Mirror of _q_rank_movers: full vs previous-crawl (thinned)
    PageRank, top-k movers by |delta| among nodes present in both."""
    ctes = _rank_ctes(iters)
    ctes += [f"""oedges AS MATERIALIZED (
  SELECT src, dst FROM wedges
  WHERE CAST(('0x' || substr(md5(src || '|' || dst), 1, 15)) AS BIGINT)
        % {mod} != 0)""",
             "onodes AS MATERIALIZED (SELECT src AS node FROM oedges "
             "UNION SELECT dst FROM oedges)",
             "odeg AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) "
             "AS dg FROM oedges GROUP BY src)",
             "o0 AS (SELECT node, CAST(0.15 AS DOUBLE) AS r FROM onodes)"]
    for k in range(1, iters + 1):
        ctes.append(f"""o{k} AS MATERIALIZED (
  SELECT n.node, 0.15 + 0.85 * coalesce(sum(p.r / dg.dg), 0) AS r
  FROM onodes n
  LEFT JOIN oedges e ON e.dst = n.node
  LEFT JOIN o{k-1} p ON p.node = e.src
  LEFT JOIN odeg dg ON dg.src = e.src
  GROUP BY n.node)""")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT f.node AS url, round(o.r, 6) AS score_prev,
       round(f.r, 6) AS score_now, round(f.r - o.r, 6) AS delta
FROM r{iters} f JOIN o{iters} o ON o.node = f.node
ORDER BY round(abs(f.r - o.r), 6) DESC, f.node ASC LIMIT {topk}""")


def length_rank_corr_sql(iters: int = 20) -> str:
    """Mirror of _q_length_rank_corr: Pearson r between document word
    count (\\S+ runs) and the page's raw PageRank."""
    ctes = _rank_ctes(iters)
    ctes.append(f"""dw AS (SELECT {_url('doc_id')} AS url,
  CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE) AS w
  FROM documents)""")
    return ("WITH " + ",\n".join(ctes) + f""",
xy AS (SELECT dw.w AS x, r.r AS y FROM r{iters} r JOIN dw ON dw.url = r.node),
s AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
      FROM xy)
SELECT round((n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
         AS pearson_r
FROM s""")


def dup_rank_report_sql(iters: int = 20, nd_iters: int = 25) -> str:
    """Mirror of _q_dup_rank_report: PageRank mass held by non-canonical
    near-duplicate pages (rep_id != doc_id under MinHash-LSH transitive
    closure) — the wasted crawl/rank budget scalar."""
    from neo4j_graph_algorithms_ray.pipelines.oracles_docs import \
        neardup_clusters_sql
    rank_sel = ("WITH " + ",\n".join(_rank_ctes(iters))
                + f"\nSELECT node, r FROM r{iters}")
    return f"""WITH nc AS ({neardup_clusters_sql(nd_iters, 8, 4, 0.5)}),
pr AS ({rank_sel}),
j AS (SELECT nc.doc_id, nc.rep_id, pr.r
      FROM nc JOIN pr ON pr.node = {_url('nc.doc_id')})
SELECT CAST(sum(CASE WHEN rep_id != doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_docs,
       round(sum(CASE WHEN rep_id != doc_id THEN r ELSE 0 END), 6)
         AS dup_rank_mass,
       round(sum(CASE WHEN rep_id != doc_id THEN r ELSE 0 END) / sum(r), 6)
         AS dup_rank_frac
FROM j"""


def snowball_sample_sql(hops: int = 3, cap: int = 50, seed: int = 0) -> str:
    """Mirror of _q_snowball_sample: BFS from the seed page, each hop
    expanding to unvisited out-neighbors, keeping the md5-least ``cap``
    of them (ties by url) — the bounded neighborhood sampler."""
    seed_url = _url(str(seed))
    ctes = [WEB_BASE, WEB_EDGES,
            f"f0 AS (SELECT {seed_url} AS url, 0 AS hop)",
            f"v0 AS (SELECT url FROM f0)"]
    for h in range(1, hops + 1):
        ctes.append(f"""f{h} AS MATERIALIZED (
  SELECT url, {h} AS hop FROM (
    SELECT url, row_number() OVER (ORDER BY
      CAST(('0x' || substr(md5(url), 1, 15)) AS BIGINT), url) AS rk
    FROM (SELECT DISTINCT e.dst AS url
          FROM f{h-1} f JOIN wedges e ON e.src = f.url
          WHERE e.dst NOT IN (SELECT url FROM v{h-1})))
  WHERE rk <= {cap})""")
        ctes.append(f"v{h} AS (SELECT url FROM v{h-1} "
                    f"UNION SELECT url FROM f{h})")
    sel = " UNION ALL ".join(f"SELECT url, hop FROM f{h}"
                             for h in range(hops + 1))
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT url, CAST(hop AS BIGINT) AS hop FROM ({sel}) "
            "ORDER BY hop, url")


def coupling_sql(cap: int = 20, topk: int = 50) -> str:
    """Bibliographic coupling mirror — the out-link dual of
    cocitation_sql: pairs of SOURCES sharing a target whose in-degree
    is in [2, cap]; top-k by count, (url_a, url_b) tie-break."""
    return f"""WITH {WEB_BASE},
{WEB_EDGES},
elig AS (SELECT dst FROM wedges GROUP BY dst
         HAVING count(*) BETWEEN 2 AND {cap}),
pairs AS (
  SELECT e1.src AS a, e2.src AS b
  FROM wedges e1 JOIN wedges e2
    ON e1.dst = e2.dst AND e1.src < e2.src
  WHERE e1.dst IN (SELECT dst FROM elig))
SELECT a AS node_a, b AS node_b, count(*) AS n_common
FROM pairs GROUP BY a, b
ORDER BY n_common DESC, node_a ASC, node_b ASC LIMIT {topk}"""


HOST_INSULARITY_SQL = f"""WITH {WEB_BASE},
{WEB_EDGES},
hp AS (SELECT regexp_extract(src, '^[a-z]+://([^/]+)', 1) AS s,
              regexp_extract(dst, '^[a-z]+://([^/]+)', 1) AS d
       FROM wedges)
SELECT s AS host,
       CAST(sum(CASE WHEN s = d THEN 1 ELSE 0 END) AS BIGINT) AS n_internal,
       CAST(count(*) AS BIGINT) AS n_total,
       round(sum(CASE WHEN s = d THEN 1.0 ELSE 0.0 END) / count(*), 6)
         AS insularity
FROM hp GROUP BY s ORDER BY host"""


HOST_RECIPROCITY_SQL = f"""WITH {WEB_BASE},
{WEB_EDGES},
{_HEDGES},
p AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b,
             sum(CASE WHEN src < dst THEN 1 ELSE 2 END) AS o
      FROM hedges GROUP BY a, b)
SELECT CAST(sum(CASE WHEN o = 3 THEN 2 ELSE 1 END) AS BIGINT) AS total_edges,
       CAST(sum(CASE WHEN o = 3 THEN 2 ELSE 0 END) AS BIGINT)
         AS reciprocal_edges,
       round(sum(CASE WHEN o = 3 THEN 2.0 ELSE 0.0 END)
             / sum(CASE WHEN o = 3 THEN 2 ELSE 1 END), 6) AS reciprocity
FROM p"""


def wl_colors_sql(rounds: int = 2) -> str:
    """Mirror of algorithms/wl.py over the undirected page graph:
    color_0 = degree; per round md5_60bit(own || '|' || sorted
    neighbor colors comma-joined); final color histogram."""
    ctes = [WEB_BASE, WEB_EDGES,
            """wund AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM wedges WHERE src != dst)""",
            "sym AS MATERIALIZED (SELECT a, b FROM wund "
            "UNION ALL SELECT b, a FROM wund)",
            "wc0 AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS c "
            "FROM sym GROUP BY a)"]
    for k in range(1, rounds + 1):
        ctes.append(f"""wc{k} AS MATERIALIZED (
  SELECT s.a AS node,
         CAST(('0x' || substr(md5(
             CAST(any_value(ca.c) AS VARCHAR) || '|' ||
             string_agg(CAST(cb.c AS VARCHAR), ',' ORDER BY cb.c)),
           1, 15)) AS BIGINT) AS c
  FROM sym s
  JOIN wc{k-1} ca ON ca.node = s.a
  JOIN wc{k-1} cb ON cb.node = s.b
  GROUP BY s.a)""")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT c AS wl_color, CAST(count(*) AS BIGINT) AS n_nodes
FROM wc{rounds} GROUP BY c ORDER BY wl_color""")


SQUARE_COUNT_SQL = f"""WITH {WEB_BASE},
{WEB_EDGES},
wund AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM wedges WHERE src != dst),
sym AS MATERIALIZED (SELECT a, b FROM wund UNION ALL SELECT b, a FROM wund),
deg AS (SELECT a AS z, count(*) AS d FROM sym GROUP BY a),
pairs AS (
  SELECT s1.b AS x, s2.b AS y
  FROM sym s1 JOIN sym s2 ON s1.a = s2.a AND s1.b < s2.b
  WHERE s1.a IN (SELECT z FROM deg WHERE d BETWEEN 2 AND 20)),
pc2 AS (SELECT x, y, count(*) AS n FROM pairs GROUP BY x, y)
SELECT CAST(count(*) AS BIGINT) AS n_codeg_pairs,
       CAST((sum(n * (n - 1) // 2)) // 2 AS BIGINT) AS squares
FROM pc2"""


def edge_percolation_sql(keeps=(2, 5, 8), iters: int = 40) -> str:
    """Mirror of _q_edge_percolation: for each keep-tenths level k the
    surviving edge slice is md5_60(src||'|'||dst) % 10 < k; report
    edge/node counts and the largest WCC size over incident nodes."""
    blocks = []
    for k in keeps:
        ctes = [f"""ke{k} AS MATERIALIZED (
  SELECT src, dst FROM wedges
  WHERE CAST(('0x' || substr(md5(src || '|' || dst), 1, 15)) AS BIGINT)
        % 10 < {k})""",
                f"kn{k} AS MATERIALIZED (SELECT src AS node FROM ke{k} "
                f"UNION SELECT dst FROM ke{k})",
                f"ks{k} AS MATERIALIZED (SELECT src AS a, dst AS b "
                f"FROM ke{k} UNION ALL SELECT dst, src FROM ke{k})",
                f"kc{k}_0 AS (SELECT node, node AS c FROM kn{k})"]
        for it in range(1, iters + 1):
            ctes.append(f"""kc{k}_{it} AS MATERIALIZED (
  SELECT n.node, least(p.c, coalesce(min(q.c), p.c)) AS c
  FROM kn{k} n
  JOIN kc{k}_{it-1} p ON p.node = n.node
  LEFT JOIN ks{k} e ON e.a = n.node
  LEFT JOIN kc{k}_{it-1} q ON q.node = e.b
  GROUP BY n.node, p.c)""")
        blocks.append((k, ctes))
    all_ctes = [WEB_BASE, WEB_EDGES]
    for _, ctes in blocks:
        all_ctes += ctes
    sels = []
    for k, _ in blocks:
        sels.append(f"""SELECT {k} AS keep_tenths,
  (SELECT CAST(count(*) AS BIGINT) FROM ke{k}) AS n_edges,
  (SELECT CAST(count(*) AS BIGINT) FROM kn{k}) AS n_nodes,
  (SELECT CAST(max(s) AS BIGINT) FROM
     (SELECT count(*) AS s FROM kc{k}_{iters} GROUP BY c)) AS lcc_size""")
    return ("WITH " + ",\n".join(all_ctes) + "\n"
            + " UNION ALL ".join(sels) + "\nORDER BY keep_tenths")


QUALITY_ASSORTATIVITY_SQL = f"""WITH {WEB_BASE},
{WEB_EDGES},
dw AS (SELECT {_url('doc_id')} AS url,
              CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE) AS w
       FROM documents),
xy AS (SELECT s.w AS x, t.w AS y
       FROM wedges e JOIN dw s ON s.url = e.src JOIN dw t ON t.url = e.dst),
s AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
      FROM xy)
SELECT round((n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
         AS assortativity
FROM s"""


HOST_HLL_OUTLINKS_SQL = f"""WITH {WEB_BASE},
{WEB_EDGES},
hp AS (SELECT regexp_extract(src, '^[a-z]+://([^/]+)', 1) AS host, dst
       FROM wedges),
hd AS MATERIALIZED (SELECT DISTINCT host, dst FROM hp),
hh AS (SELECT host,
              CAST(('0x' || substr(md5(dst), 1, 15)) AS BIGINT) AS hv
       FROM hd),
r AS (SELECT host, hv % 256 AS reg,
             CASE WHEN hv // 256 = 0 THEN 53
                  ELSE 52 - CAST(floor(log2(hv // 256)) AS BIGINT) END AS rho
      FROM hh),
mr AS (SELECT host, reg, max(rho) AS m FROM r GROUP BY host, reg),
agg AS (SELECT host,
               sum(power(2.0, -m)) + (256 - count(*)) AS s,
               256 - count(*) AS zeros
        FROM mr GROUP BY host),
est AS (SELECT host, zeros,
               (0.7213 / (1 + 1.079 / 256)) * 256 * 256 / s AS e
        FROM agg),
fin AS (SELECT host,
               CASE WHEN e <= 2.5 * 256 AND zeros > 0
                    THEN 256 * ln(256.0 / zeros) ELSE e END AS e
        FROM est),
ex AS (SELECT host, CAST(count(*) AS BIGINT) AS exact_distinct
       FROM hd GROUP BY host)
SELECT f.host, round(f.e, 6) AS hll_estimate, ex.exact_distinct,
       round(abs(f.e - ex.exact_distinct) / ex.exact_distinct, 6)
         AS rel_err
FROM fin f JOIN ex ON ex.host = f.host ORDER BY f.host"""


def damping_sensitivity_sql(iters: int = 20, dampings=(0.5, 0.85, 0.95),
                            topk: int = 20) -> str:
    """Mirror of _q_damping_sensitivity: for each damping factor, the
    top-k page set (round6 score desc, url asc) and its overlap with
    the d=0.85 baseline set."""
    ctes = [WEB_BASE, WEB_EDGES, WEB_NODES,
            "wdeg AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) "
            "AS dg FROM wedges GROUP BY src)"]
    tops = []
    for di, d in enumerate(dampings):
        base = round(1.0 - d, 6)
        ctes.append(f"d{di}_0 AS (SELECT node, CAST({base} AS DOUBLE) AS r "
                    "FROM wnodes)")
        for k in range(1, iters + 1):
            ctes.append(f"""d{di}_{k} AS MATERIALIZED (
  SELECT n.node, {base} + {d} * coalesce(sum(p.r / dg.dg), 0) AS r
  FROM wnodes n
  LEFT JOIN wedges e ON e.dst = n.node
  LEFT JOIN d{di}_{k-1} p ON p.node = e.src
  LEFT JOIN wdeg dg ON dg.src = e.src
  GROUP BY n.node)""")
        ctes.append(f"""t{di} AS MATERIALIZED (
  SELECT node FROM d{di}_{iters}
  ORDER BY round(r, 6) DESC, node ASC LIMIT {topk})""")
        tops.append(di)
    base_idx = dampings.index(0.85)
    sels = []
    for di, d in zip(tops, dampings):
        sels.append(f"""SELECT CAST({d} AS DOUBLE) AS damping,
  (SELECT CAST(count(*) AS BIGINT) FROM t{di}
   WHERE node IN (SELECT node FROM t{base_idx})) AS overlap_with_085""")
    return ("WITH " + ",\n".join(ctes) + "\n"
            + " UNION ALL ".join(sels) + "\nORDER BY damping")


def crawl_budget_sql(iters: int = 20, budget: int = 1000) -> str:
    """Mirror of _q_crawl_budget: Hamilton (largest-remainder)
    apportionment of ``budget`` fetch slots over hosts proportional to
    their PageRank mass."""
    ctes = _rank_ctes(iters)
    ctes += ["""hm AS (SELECT regexp_extract(node, '^[a-z]+://([^/]+)', 1)
    AS host, sum(r) AS mass
  FROM r{it} GROUP BY 1)""".format(it=iters),
             "tm AS (SELECT sum(mass) AS t FROM hm)",
             f"""q AS (SELECT host, mass,
  {budget} * mass / (SELECT t FROM tm) AS quota FROM hm)""",
             """b AS (SELECT host, mass, quota,
  CAST(floor(quota) AS BIGINT) AS base, quota - floor(quota) AS rem
  FROM q)""",
             f"""lo AS (SELECT {budget} - sum(base) AS left_over FROM b)""",
             """rk AS (SELECT host, mass, base, rem,
  row_number() OVER (ORDER BY rem DESC, host ASC) AS rr FROM b)"""]
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT host,
       CAST(base + CASE WHEN rr <= (SELECT left_over FROM lo)
                        THEN 1 ELSE 0 END AS BIGINT) AS slots,
       round(mass, 6) AS rank_mass
FROM rk ORDER BY host""")


def rank_residual_sql(it_a: int = 10, it_b: int = 20) -> str:
    """Mirror of _q_rank_residual: L1 and max distance between the
    rank vectors at two iteration depths (one unrolled chain, two
    taps)."""
    ctes = _rank_ctes(it_b)
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT round(sum(abs(b.r - a.r)), 6) AS l1_residual,
       round(max(abs(b.r - a.r)), 6) AS max_residual,
       CAST(count(*) AS BIGINT) AS n_nodes
FROM r{it_a} a JOIN r{it_b} b ON b.node = a.node""")


def degree_drift_sql(mod: int = 5) -> str:
    """Mirror of _q_degree_drift: two-sample KS statistic between the
    out-degree distributions (zero-degree nodes included) of the full
    and thinned previous-crawl graphs."""
    return f"""WITH {WEB_BASE},
{WEB_EDGES},
{WEB_NODES},
oedges AS MATERIALIZED (
  SELECT src, dst FROM wedges
  WHERE CAST(('0x' || substr(md5(src || '|' || dst), 1, 15)) AS BIGINT)
        % {mod} != 0),
onodes AS (SELECT src AS node FROM oedges UNION SELECT dst FROM oedges),
da AS (SELECT n.node, coalesce(d.dg, 0) AS deg FROM wnodes n
       LEFT JOIN (SELECT src, count(*) AS dg FROM wedges GROUP BY src) d
         ON d.src = n.node),
db AS (SELECT n.node, coalesce(d.dg, 0) AS deg FROM onodes n
       LEFT JOIN (SELECT src, count(*) AS dg FROM oedges GROUP BY src) d
         ON d.src = n.node),
ha AS (SELECT deg, CAST(count(*) AS DOUBLE) AS n FROM da GROUP BY deg),
hb AS (SELECT deg, CAST(count(*) AS DOUBLE) AS n FROM db GROUP BY deg),
na AS (SELECT sum(n) AS t FROM ha), nb AS (SELECT sum(n) AS t FROM hb),
sup AS (SELECT deg FROM ha UNION SELECT deg FROM hb),
cdf AS (SELECT s.deg,
  coalesce((SELECT sum(a.n) FROM ha a WHERE a.deg <= s.deg), 0)
    / (SELECT t FROM na) AS fa,
  coalesce((SELECT sum(b.n) FROM hb b WHERE b.deg <= s.deg), 0)
    / (SELECT t FROM nb) AS fb
  FROM sup s)
SELECT round(max(abs(fa - fb)), 6) AS ks_stat,
       (SELECT CAST(t AS BIGINT) FROM na) AS n_nodes_full,
       (SELECT CAST(t AS BIGINT) FROM nb) AS n_nodes_prev
FROM cdf"""


ORPHAN_PAGES_SQL = f"""WITH {WEB_BASE},
{WEB_EDGES},
pl AS (SELECT {_url('doc_id')} AS url FROM documents),
tgt AS (SELECT DISTINCT dst FROM wedges)
SELECT CAST((SELECT count(*) FROM pl) AS BIGINT) AS n_pages,
       CAST(count(*) AS BIGINT) AS n_orphans,
       round(CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM pl), 6)
         AS orphan_frac
FROM pl WHERE pl.url NOT IN (SELECT dst FROM tgt)"""


def host_rank_gini_sql(iters: int = 20) -> str:
    """Mirror of _q_host_rank_gini: Gini of PageRank mass across
    hosts, exact from the ascending-mass rank sum."""
    ctes = _rank_ctes(iters)
    ctes.append("""hm AS (SELECT regexp_extract(node, '^[a-z]+://([^/]+)', 1)
    AS host, sum(r) AS mass
  FROM r{it} GROUP BY 1)""".format(it=iters))
    return ("WITH " + ",\n".join(ctes) + """,
rk AS (SELECT mass, row_number() OVER (ORDER BY mass, host) AS rnk FROM hm),
t AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(mass) AS s,
             sum(rnk * mass) AS t2 FROM rk)
SELECT CAST(n AS BIGINT) AS n_hosts,
       round(2.0 * t2 / (n * s) - (n + 1.0) / n, 6) AS gini
FROM t""")


def web_pagerank_anchor_weighted_sql(iters: int = 20) -> str:
    """Mirror of _q_web_pagerank_anchor_weighted: page-level PageRank
    with edge weight = href occurrence count (parallel links NOT
    deduped — each anchor is an endorsement); push ∝ w/Σ_out w."""
    ctes = [WEB_BASE,
            f"""wl AS MATERIALIZED (
  SELECT {_url('d')} AS src, {_url('t')} AS dst,
         CAST(count(*) AS DOUBLE) AS w
  FROM links GROUP BY 1, 2)""",
            "wn AS MATERIALIZED (SELECT src AS node FROM wl "
            "UNION SELECT dst FROM wl)",
            "wwd AS MATERIALIZED (SELECT src, sum(w) AS wd "
            "FROM wl GROUP BY src)",
            "a0 AS (SELECT node, CAST(0.15 AS DOUBLE) AS r FROM wn)"]
    for k in range(1, iters + 1):
        ctes.append(f"""a{k} AS MATERIALIZED (
  SELECT n.node, 0.15 + 0.85 * coalesce(sum(p.r * e.w / dg.wd), 0) AS r
  FROM wn n
  LEFT JOIN wl e ON e.dst = n.node
  LEFT JOIN a{k-1} p ON p.node = e.src
  LEFT JOIN wwd dg ON dg.src = e.src
  GROUP BY n.node)""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node AS url, round(r, 6) AS score FROM a{iters} "
            "ORDER BY url")


def reciprocal_rank_boost_sql(iters: int = 20) -> str:
    """Mirror of _q_reciprocal_rank_boost: mean raw PageRank of pages
    with at least one reciprocal link vs pages with none."""
    ctes = _rank_ctes(iters)
    ctes.append("""recip AS MATERIALIZED (
  SELECT DISTINCT e1.src AS node
  FROM wedges e1 JOIN wedges e2 ON e2.src = e1.dst AND e2.dst = e1.src)""")
    return ("WITH " + ",\n".join(ctes) + f""",
j AS (SELECT r.node, r.r,
             CASE WHEN rc.node IS NOT NULL THEN 1 ELSE 0 END AS has_recip
      FROM r{iters} r LEFT JOIN recip rc ON rc.node = r.node)
SELECT CAST(sum(has_recip) AS BIGINT) AS n_reciprocal,
       CAST(sum(1 - has_recip) AS BIGINT) AS n_other,
       round(sum(CASE WHEN has_recip = 1 THEN r ELSE 0 END)
             / nullif(sum(has_recip), 0), 6) AS mean_rank_reciprocal,
       round(sum(CASE WHEN has_recip = 0 THEN r ELSE 0 END)
             / nullif(sum(1 - has_recip), 0), 6) AS mean_rank_other
FROM j""")
