"""DuckDB oracle SQL for every SQL-expressible query in __ray_entry__.

Iterative algorithms are expressed by *unrolling* a fixed number of
iterations into chained CTEs (generated here), with semantics matching
the engine exactly:

- pagerank: r0 = 0.15, k sweeps of r = 0.15 + 0.85 * Σ r/outdeg
  (identical to the engine's delta-push after k supersteps);
- wcc: min-label propagation over the symmetrized edge table, k sweeps
  (k chosen ≥ graph diameter for the derived graphs);
- lpa: alternating-parity semi-synchronous majority vote in dense-vid
  space (vid = row_number over sorted node id, same as the engine's
  id assignment), min-label tie-break.

Floats are rounded to 6 decimals on BOTH sides before comparison.
"""

from __future__ import annotations

G1_EDGES = """edges AS MATERIALIZED (
  SELECT DISTINCT o_custkey AS src, 1000000 + l_suppkey AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)"""

G1_NODES = """nodes AS MATERIALIZED (
  SELECT src AS node FROM edges UNION SELECT dst AS node FROM edges
)"""

CO_EDGES = """co AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)"""

TYPED_EDGES = """te AS MATERIALIZED (
  SELECT c_custkey AS src, 2000000 + c_nationkey AS dst,
         'Customer' AS sl, 'IN' AS et, 'Nation' AS dl FROM customer
  UNION ALL
  SELECT 1000000 + s_suppkey, 2000000 + s_nationkey,
         'Supplier', 'IN', 'Nation' FROM supplier
  UNION ALL
  SELECT b.src, b.dst, 'Customer', 'BUYS', 'Supplier' FROM (
    SELECT DISTINCT o_custkey AS src, 1000000 + l_suppkey AS dst
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey) b
)"""


def pagerank_sql(iters: int = 20) -> str:
    ctes = [G1_EDGES, G1_NODES,
            "deg AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) AS d FROM edges GROUP BY src)",
            "r0 AS (SELECT node, CAST(0.15 AS DOUBLE) AS r FROM nodes)"]
    for k in range(1, iters + 1):
        ctes.append(f"""r{k} AS MATERIALIZED (
  SELECT n.node, 0.15 + 0.85 * coalesce(sum(p.r / dg.d), 0) AS r
  FROM nodes n
  LEFT JOIN edges e ON e.dst = n.node
  LEFT JOIN r{k-1} p ON p.node = e.src
  LEFT JOIN deg dg ON dg.src = e.src
  GROUP BY n.node)""")
    return ("WITH " + ",\n".join(ctes) +
            f"\nSELECT node, round(r, 6) AS score FROM r{iters} ORDER BY node")


def pagerank_topk_sql(iters: int = 20, k: int = 20) -> str:
    base = pagerank_sql(iters)
    base = base.replace(f"\nSELECT node, round(r, 6) AS score FROM r{iters} ORDER BY node",
                        f"\nSELECT node, round(r, 6) AS score FROM r{iters} "
                        f"ORDER BY score DESC, node ASC LIMIT {k}")
    return base


def pagerank_trace_sql(iters: int = 20) -> str:
    """Per-iteration L1 residual Σ|r_k − r_{k−1}| over the same
    unrolled iteration CTEs as pagerank_sql."""
    ctes = [G1_EDGES, G1_NODES,
            "deg AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) AS d FROM edges GROUP BY src)",
            "r0 AS (SELECT node, CAST(0.15 AS DOUBLE) AS r FROM nodes)"]
    for k in range(1, iters + 1):
        ctes.append(f"""r{k} AS MATERIALIZED (
  SELECT n.node, 0.15 + 0.85 * coalesce(sum(p.r / dg.d), 0) AS r
  FROM nodes n
  LEFT JOIN edges e ON e.dst = n.node
  LEFT JOIN r{k-1} p ON p.node = e.src
  LEFT JOIN deg dg ON dg.src = e.src
  GROUP BY n.node)""")
    rows = " UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS iteration, "
        f"(SELECT round(sum(abs(a.r - b.r)), 6) FROM r{k} a "
        f"JOIN r{k-1} b ON b.node = a.node) AS residual"
        for k in range(1, iters + 1))
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT * FROM ({rows}) ORDER BY iteration")


def wcc_sql(iters: int = 25, final: str = "components") -> str:
    ctes = [G1_EDGES, G1_NODES,
            "sym AS MATERIALIZED (SELECT src AS a, dst AS b FROM edges "
            "UNION ALL SELECT dst AS a, src AS b FROM edges)",
            "c0 AS (SELECT node, node AS c FROM nodes)"]
    for k in range(1, iters + 1):
        ctes.append(f"""c{k} AS MATERIALIZED (
  SELECT n.node, least(p.c, coalesce(min(q.c), p.c)) AS c
  FROM nodes n
  JOIN c{k-1} p ON p.node = n.node
  LEFT JOIN sym e ON e.a = n.node
  LEFT JOIN c{k-1} q ON q.node = e.b
  GROUP BY n.node, p.c)""")
    head = "WITH " + ",\n".join(ctes)
    if final == "components":
        return head + f"\nSELECT node, c AS component FROM c{iters} ORDER BY node"
    return head + (f"\nSELECT c AS component, count(*) AS size FROM c{iters} "
                   "GROUP BY c ORDER BY component")


def _lpa_label_ctes(sweeps: int) -> list:
    """Shared LPA unroll ending in ``lab(node, label)`` — used by
    lpa_sql and lpa_conductance_sql."""
    ctes = [G1_EDGES, G1_NODES,
            "vn AS MATERIALIZED (SELECT node, row_number() OVER (ORDER BY node) - 1 AS vid FROM nodes)",
            "ev AS MATERIALIZED (SELECT s.vid AS sv, t.vid AS tv FROM edges e "
            "JOIN vn s ON s.node = e.src JOIN vn t ON t.node = e.dst)",
            "l0 AS (SELECT vid, vid AS lab FROM vn)"]
    for k in range(1, sweeps + 1):
        parity = (k - 1) % 2
        ctes.append(f"""v{k} AS MATERIALIZED (
  SELECT e.tv AS vid, p.lab AS lab, count(*) AS c
  FROM ev e JOIN l{k-1} p ON p.vid = e.sv GROUP BY e.tv, p.lab)""")
        ctes.append(f"""b{k} AS MATERIALIZED (
  SELECT vid, lab AS best FROM (
    SELECT vid, lab, row_number() OVER (PARTITION BY vid ORDER BY c DESC, lab ASC) AS rn
    FROM v{k}) t WHERE rn = 1)""")
        ctes.append(f"""l{k} AS MATERIALIZED (
  SELECT n.vid,
         CASE WHEN n.vid % 2 = {parity} AND b.best IS NOT NULL THEN b.best ELSE p.lab END AS lab
  FROM vn n JOIN l{k-1} p ON p.vid = n.vid LEFT JOIN b{k} b ON b.vid = n.vid)""")
    ctes.append(f"""lab AS MATERIALIZED (
  SELECT n.node, ln.node AS label
  FROM vn n JOIN l{sweeps} l ON l.vid = n.vid JOIN vn ln ON ln.vid = l.lab)""")
    return ctes


def lpa_sql(sweeps: int = 6) -> str:
    return ("WITH " + ",\n".join(_lpa_label_ctes(sweeps))
            + "\nSELECT node, label FROM lab ORDER BY node")


def lpa_conductance_sql(sweeps: int = 6) -> str:
    """Community-quality mirror (algorithms/community_metrics.py):
    per LPA community, internal / cut edge counts (a cut edge credits
    both sides) and conductance = cut/(2*internal + cut), round6."""
    ctes = _lpa_label_ctes(sweeps)
    ctes.append("""el AS MATERIALIZED (
  SELECT ls.label AS cs, ld.label AS cd
  FROM edges e JOIN lab ls ON ls.node = e.src
  JOIN lab ld ON ld.node = e.dst)""")
    ctes.append("""contrib AS (
  SELECT cs AS community,
         CASE WHEN cs = cd THEN 1 ELSE 0 END AS i,
         CASE WHEN cs != cd THEN 1 ELSE 0 END AS c
  FROM el
  UNION ALL
  SELECT cd, 0, 1 FROM el WHERE cs != cd)""")
    ctes.append("""agg AS (
  SELECT community, CAST(sum(i) AS BIGINT) AS internal_edges,
         CAST(sum(c) AS BIGINT) AS cut_edges
  FROM contrib GROUP BY community)""")
    ctes.append("""sizes AS (
  SELECT label AS community, count(*) AS n_nodes FROM lab GROUP BY label)""")
    return ("WITH " + ",\n".join(ctes) + """
SELECT s.community, s.n_nodes, a.internal_edges, a.cut_edges,
       round(CAST(a.cut_edges AS DOUBLE)
             / (2 * a.internal_edges + a.cut_edges), 6) AS conductance
FROM sizes s JOIN agg a ON a.community = s.community
ORDER BY s.community""")


def lpa_modularity_sql(sweeps: int = 6) -> str:
    """Directed-modularity mirror (algorithms/community_metrics.py
    ``modularity``): per LPA community, internal / out / in edge
    counts and contribution = internal/m − out·in/m², round6."""
    ctes = _lpa_label_ctes(sweeps)
    ctes.append("""el AS MATERIALIZED (
  SELECT ls.label AS cs, ld.label AS cd
  FROM edges e JOIN lab ls ON ls.node = e.src
  JOIN lab ld ON ld.node = e.dst)""")
    ctes.append("mm AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM el)")
    ctes.append("""contrib AS (
  SELECT cs AS community, CASE WHEN cs = cd THEN 1 ELSE 0 END AS i,
         1 AS o, 0 AS ii FROM el
  UNION ALL
  SELECT cd, 0, 0, 1 FROM el)""")
    ctes.append("""agg AS (
  SELECT community, CAST(sum(i) AS BIGINT) AS internal_edges,
         CAST(sum(o) AS BIGINT) AS out_edges,
         CAST(sum(ii) AS BIGINT) AS in_edges
  FROM contrib GROUP BY community)""")
    ctes.append("""sizes AS (
  SELECT label AS community, count(*) AS n_nodes FROM lab GROUP BY label)""")
    return ("WITH " + ",\n".join(ctes) + """
SELECT s.community, s.n_nodes, a.internal_edges, a.out_edges, a.in_edges,
       round(a.internal_edges / (SELECT m FROM mm)
             - (CAST(a.out_edges AS DOUBLE) * a.in_edges)
               / ((SELECT m FROM mm) * (SELECT m FROM mm)), 6) AS contribution
FROM sizes s JOIN agg a ON a.community = s.community
ORDER BY s.community""")


def lpa_seeded_sql(sweeps: int = 6, mod: int = 97) -> str:
    """Seeded-LPA mirror: identical unroll to :func:`lpa_sql` except
    l0 starts from the seed class ``node % mod`` instead of the vid,
    and labels stay in seed-class space (no vid→node mapping)."""
    ctes = [G1_EDGES, G1_NODES,
            "vn AS MATERIALIZED (SELECT node, row_number() OVER (ORDER BY node) - 1 AS vid FROM nodes)",
            "ev AS MATERIALIZED (SELECT s.vid AS sv, t.vid AS tv FROM edges e "
            "JOIN vn s ON s.node = e.src JOIN vn t ON t.node = e.dst)",
            f"l0 AS (SELECT vid, node % {mod} AS lab FROM vn)"]
    for k in range(1, sweeps + 1):
        parity = (k - 1) % 2
        ctes.append(f"""v{k} AS MATERIALIZED (
  SELECT e.tv AS vid, p.lab AS lab, count(*) AS c
  FROM ev e JOIN l{k-1} p ON p.vid = e.sv GROUP BY e.tv, p.lab)""")
        ctes.append(f"""b{k} AS MATERIALIZED (
  SELECT vid, lab AS best FROM (
    SELECT vid, lab, row_number() OVER (PARTITION BY vid ORDER BY c DESC, lab ASC) AS rn
    FROM v{k}) t WHERE rn = 1)""")
        ctes.append(f"""l{k} AS MATERIALIZED (
  SELECT n.vid,
         CASE WHEN n.vid % 2 = {parity} AND b.best IS NOT NULL THEN b.best ELSE p.lab END AS lab
  FROM vn n JOIN l{k-1} p ON p.vid = n.vid LEFT JOIN b{k} b ON b.vid = n.vid)""")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT n.node, l.lab AS label
FROM vn n JOIN l{sweeps} l ON l.vid = n.vid
ORDER BY n.node""")


LOCAL_BRIDGES_SQL = f"""WITH {CO_EDGES},
nbr AS (SELECT u AS x, v AS y FROM co UNION ALL SELECT v, u FROM co),
sup AS (SELECT e.u, e.v, count(*) AS s
        FROM co e JOIN nbr n1 ON n1.x = e.u
        JOIN nbr n2 ON n2.x = e.v AND n2.y = n1.y
        GROUP BY e.u, e.v)
SELECT e.u AS u, e.v AS v
FROM co e LEFT JOIN sup ON sup.u = e.u AND sup.v = e.v
WHERE coalesce(sup.s, 0) = 0
ORDER BY u, v"""


GLOBAL_TRANSITIVITY_SQL = f"""WITH {CO_EDGES},
tri AS (SELECT count(*) AS t FROM co e1
        JOIN co e2 ON e2.u = e1.u AND e2.v > e1.v
        JOIN co e3 ON e3.u = e1.v AND e3.v = e2.v),
deg AS (SELECT node, count(*) AS d FROM
        (SELECT u AS node FROM co UNION ALL SELECT v AS node FROM co) x
        GROUP BY node),
w AS (SELECT CAST(sum(d * (d - 1)) / 2 AS BIGINT) AS wedges FROM deg)
SELECT tri.t AS triangles, w.wedges,
       round(CASE WHEN w.wedges > 0 THEN 3.0 * tri.t / w.wedges
             ELSE 0 END, 6) AS transitivity
FROM tri, w"""


def louvain_sql(sweeps: int = 6) -> str:
    """Exact unrolled mirror of the engine's semi-synchronous parity
    Louvain sweeps over the copart graph (algorithms/louvain.py
    _louvain_broadcast): per sweep, each vertex of the sweep's parity
    moves to the candidate community with the best modularity gain
    ``lw − k·sTot_c/(2m)`` (own community's sTot excludes the vertex),
    tie-break community-vid ascending, move only if it beats the stay
    gain by > 1e-12. All gain operands are integer-valued doubles and
    the expression tree matches the numpy one, so gains are
    bit-identical and the unroll replays the engine decision-for-
    decision. Running the full ``sweeps`` unroll equals the engine's
    early-converged result because the engine only stops after a full
    quiet parity cycle (a fixpoint for every later sweep)."""
    ctes = [
        CO_EDGES,
        "conodes AS MATERIALIZED (SELECT u AS node FROM co UNION SELECT v FROM co)",
        "cvn AS MATERIALIZED (SELECT node, row_number() OVER (ORDER BY node) - 1 AS vid FROM conodes)",
        """cev AS MATERIALIZED (
  SELECT s.vid AS sv, t.vid AS tv
  FROM (SELECT u, v FROM co UNION ALL SELECT v, u FROM co) e
  JOIN cvn s ON s.node = e.u JOIN cvn t ON t.node = e.v)""",
        "cdeg AS MATERIALIZED (SELECT sv AS vid, CAST(count(*) AS DOUBLE) AS k FROM cev GROUP BY sv)",
        "w2m AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS m2 FROM cev)",
        "L0 AS (SELECT vid, vid AS comm FROM cvn)",
    ]
    for k in range(1, sweeps + 1):
        parity = (k - 1) % 2
        ctes.append(f"""cand{k} AS MATERIALIZED (
  SELECT src, dcomm, SUM(lw) AS lw FROM (
    SELECT e.sv AS src, l.comm AS dcomm, CAST(1 AS DOUBLE) AS lw
    FROM cev e JOIN L{k-1} l ON l.vid = e.tv
    UNION ALL
    SELECT vid, comm, CAST(0 AS DOUBLE) FROM L{k-1}
  ) GROUP BY src, dcomm)""")
        ctes.append(f"""stot{k} AS MATERIALIZED (
  SELECT l.comm, SUM(d.k) AS stot FROM L{k-1} l
  JOIN cdeg d ON d.vid = l.vid GROUP BY l.comm)""")
        ctes.append(f"""gain{k} AS MATERIALIZED (
  SELECT c.src, c.dcomm, o.comm AS own,
         c.lw - d.k * (s.stot - CASE WHEN c.dcomm = o.comm THEN d.k
                                     ELSE 0 END) / (SELECT m2 FROM w2m) AS g
  FROM cand{k} c
  JOIN stot{k} s ON s.comm = c.dcomm
  JOIN L{k-1} o ON o.vid = c.src
  JOIN cdeg d ON d.vid = c.src)""")
        ctes.append(f"""best{k} AS (
  SELECT src, dcomm, own, g FROM (
    SELECT *, row_number() OVER (PARTITION BY src
                                 ORDER BY g DESC, dcomm ASC) AS rn
    FROM gain{k}) t WHERE rn = 1)""")
        ctes.append(f"""L{k} AS MATERIALIZED (
  SELECT b.src AS vid,
         CASE WHEN b.src % 2 = {parity} AND b.dcomm != b.own
                   AND b.g > o.g + 1e-12
              THEN b.dcomm ELSE b.own END AS comm
  FROM best{k} b
  JOIN gain{k} o ON o.src = b.src AND o.dcomm = b.own)""")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT n.node AS node, c.node AS community
FROM cvn n JOIN L{sweeps} l ON l.vid = n.vid JOIN cvn c ON c.vid = l.comm
ORDER BY n.node""")


AVG_CLUSTERING_SQL = f"""WITH {CO_EDGES},
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM co e1
  JOIN co e2 ON e2.u = e1.u AND e2.v > e1.v
  JOIN co e3 ON e3.u = e1.v AND e3.v = e2.v),
nodes AS (SELECT u AS node FROM co UNION SELECT v AS node FROM co),
deg AS (SELECT node, count(*) AS d FROM
        (SELECT u AS node FROM co UNION ALL SELECT v AS node FROM co) t
        GROUP BY node),
cnt AS (SELECT node, count(*) AS t FROM
        (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
         UNION ALL SELECT c FROM tri) x GROUP BY node),
per AS (
  SELECT round(CASE WHEN deg.d > 1
               THEN 2.0 * coalesce(cnt.t, 0) / (deg.d * (deg.d - 1.0))
               ELSE 0 END, 6) AS coef
  FROM nodes n JOIN deg ON deg.node = n.node
  LEFT JOIN cnt ON cnt.node = n.node)
SELECT CAST(count(*) AS BIGINT) AS n_nodes,
       round(sum(coef) / count(*), 6) AS avg_clustering
FROM per"""


TRIANGLES_STREAM_SQL = f"""WITH {CO_EDGES},
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM co e1
  JOIN co e2 ON e2.u = e1.u AND e2.v > e1.v
  JOIN co e3 ON e3.u = e1.v AND e3.v = e2.v)
SELECT a, b, c FROM tri ORDER BY a, b, c"""


TRIANGLE_GLOBAL_SQL = f"""WITH {CO_EDGES}
SELECT count(*) AS triangle_count
FROM co e1
JOIN co e2 ON e2.u = e1.u AND e2.v > e1.v
JOIN co e3 ON e3.u = e1.v AND e3.v = e2.v"""

TRIANGLE_PER_NODE_SQL = f"""WITH {CO_EDGES},
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM co e1
  JOIN co e2 ON e2.u = e1.u AND e2.v > e1.v
  JOIN co e3 ON e3.u = e1.v AND e3.v = e2.v),
nodes AS (SELECT u AS node FROM co UNION SELECT v AS node FROM co),
deg AS (SELECT node, count(*) AS d FROM
        (SELECT u AS node FROM co UNION ALL SELECT v AS node FROM co) t GROUP BY node),
cnt AS (SELECT node, count(*) AS t FROM
        (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri) x
        GROUP BY node)
SELECT n.node, coalesce(cnt.t, 0) AS triangles,
       round(CASE WHEN deg.d > 1 THEN 2.0 * coalesce(cnt.t, 0) / (deg.d * (deg.d - 1.0))
                  ELSE 0 END, 6) AS coefficient
FROM nodes n JOIN deg ON deg.node = n.node LEFT JOIN cnt ON cnt.node = n.node
ORDER BY n.node"""

DEGREE_SQL = f"""WITH {G1_EDGES},
{G1_NODES},
deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src)
SELECT n.node, coalesce(deg.d, 0) AS out_degree
FROM nodes n LEFT JOIN deg ON deg.src = n.node ORDER BY n.node"""

IN_DEGREE_SQL = f"""WITH {G1_EDGES},
{G1_NODES},
deg AS (SELECT dst, count(*) AS d FROM edges GROUP BY dst)
SELECT n.node, coalesce(deg.d, 0) AS in_degree
FROM nodes n LEFT JOIN deg ON deg.dst = n.node ORDER BY n.node"""

GRAPH_STATS_SQL = f"""WITH {G1_EDGES},
{G1_NODES}
SELECT (SELECT count(*) FROM nodes) AS nodes,
       (SELECT count(*) FROM edges) AS relationships,
       (SELECT count(*) FROM nodes
        WHERE node NOT IN (SELECT src FROM edges)) AS dangling_nodes"""


def metapath_sql(length: int = 3) -> str:
    assert length == 3
    return f"""WITH {TYPED_EDGES},
sym AS MATERIALIZED (SELECT src, dst, sl, et, dl FROM te
        UNION ALL SELECT dst, src, dl, et, sl FROM te),
lv1 AS (SELECT label AS path, count(*) AS cnt FROM (
          SELECT DISTINCT node, label FROM (
            SELECT src AS node, sl AS label FROM sym
            UNION ALL SELECT dst, dl FROM sym) t) u GROUP BY label),
lv2 AS (SELECT sl || ' | ' || et || ' | ' || dl AS path, count(*) AS cnt
        FROM sym GROUP BY 1),
lv3 AS (SELECT e1.sl || ' | ' || e1.et || ' | ' || e1.dl || ' | ' || e2.et || ' | ' || e2.dl AS path,
               count(*) AS cnt
        FROM sym e1 JOIN sym e2 ON e2.src = e1.dst GROUP BY 1)
SELECT path, CAST(sum(cnt) AS BIGINT) AS "count"
FROM (SELECT * FROM lv1 UNION ALL SELECT * FROM lv2 UNION ALL SELECT * FROM lv3) allp
GROUP BY path ORDER BY path"""


GET_SCHEMA_SQL = f"""WITH {TYPED_EDGES}
SELECT DISTINCT sl AS src_label, et AS edge_type, dl AS dst_label
FROM te ORDER BY src_label, edge_type, dst_label"""


SCHEMA_FULL_SQL = f"""WITH {TYPED_EDGES},
sym AS (SELECT sl, et, dl FROM te UNION ALL SELECT dl, et, sl FROM te),
tri AS (SELECT DISTINCT sl, et, dl FROM sym),
labs AS (SELECT DISTINCT sl AS l FROM tri UNION SELECT DISTINCT dl FROM tri),
lv1 AS (SELECT l AS path FROM labs),
lv2 AS (SELECT DISTINCT sl || ' | ' || et || ' | ' || dl AS path FROM tri),
lv3 AS (SELECT DISTINCT e1.sl || ' | ' || e1.et || ' | ' || e1.dl || ' | '
               || e2.et || ' | ' || e2.dl AS path
        FROM tri e1 JOIN tri e2 ON e2.sl = e1.dl)
SELECT DISTINCT path FROM (SELECT * FROM lv1 UNION ALL SELECT * FROM lv2
                           UNION ALL SELECT * FROM lv3) p
ORDER BY path"""

LABEL_IDS_SQL = f"""WITH {TYPED_EDGES},
labs AS (SELECT DISTINCT l FROM (
  SELECT sl AS l FROM te UNION SELECT dl FROM te) x)
SELECT row_number() OVER (ORDER BY l) - 1 AS label_id, l AS label
FROM labs ORDER BY label_id"""

TRADE_EDGES = """tedges AS MATERIALIZED (
  SELECT DISTINCT o_custkey AS src, 1000000 + l_suppkey AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  UNION
  SELECT DISTINCT 1000000 + s_suppkey, c_custkey
  FROM supplier JOIN customer ON s_nationkey = c_nationkey
)"""

TRADE_NODES = """tnodes AS MATERIALIZED (
  SELECT src AS node FROM tedges UNION SELECT dst FROM tedges
)"""


def _bfs_ctes(iters: int) -> list[str]:
    """Multi-source BFS distance table d{K}(s, v, d) from the 64
    smallest node ids over the trade graph (matches the engine's MSBFS
    with sources = dense vids 0..63, which are exactly the 64 smallest
    original ids by the ascending-id vid assignment)."""
    ctes = [TRADE_EDGES, TRADE_NODES,
            "srcs AS (SELECT node AS s FROM tnodes ORDER BY node LIMIT 64)",
            "d0 AS (SELECT s, s AS v, 0 AS d FROM srcs)"]
    for k in range(1, iters + 1):
        ctes.append(f"""d{k} AS MATERIALIZED (
  SELECT s, v, min(d) AS d FROM (
    SELECT s, v, d FROM d{k-1}
    UNION ALL
    SELECT p.s, e.dst AS v, p.d + 1 AS d
    FROM d{k-1} p JOIN tedges e ON e.src = p.v
  ) u GROUP BY s, v)""")
    return ctes


def closeness_sampled_sql(iters: int = 10) -> str:
    ctes = _bfs_ctes(iters)
    return ("WITH " + ",\n".join(ctes) + f""",
far AS (SELECT v AS node, CAST(sum(d) AS DOUBLE) AS f FROM d{iters} GROUP BY v),
nn AS (SELECT count(*) AS n FROM tnodes)
SELECT t.node,
       round(CASE WHEN coalesce(far.f, 0) > 0
                  THEN ((SELECT n FROM nn) - 1) / far.f ELSE 0 END, 6) AS centrality
FROM tnodes t LEFT JOIN far ON far.node = t.node ORDER BY t.node""")


def harmonic_sampled_sql(iters: int = 10) -> str:
    ctes = _bfs_ctes(iters)
    return ("WITH " + ",\n".join(ctes) + f""",
inv AS (SELECT v AS node, sum(CASE WHEN d > 0 THEN 1.0 / d ELSE 0 END) AS f
        FROM d{iters} GROUP BY v),
nn AS (SELECT count(*) AS n FROM tnodes)
SELECT t.node,
       round(coalesce(inv.f, 0) / ((SELECT n FROM nn) - 1), 6) AS centrality
FROM tnodes t LEFT JOIN inv ON inv.node = t.node ORDER BY t.node""")


def wcc_threshold_sql(iters: int = 30, threshold: int = 3) -> str:
    """Threshold union (GraphUnionFind.java:82-104): WCC over trade
    edges with weight = 1+(src+dst)%5 >= threshold, undirected."""
    ctes = [TRADE_EDGES, TRADE_NODES,
            f"""fe AS MATERIALIZED (
  SELECT src, dst FROM tedges WHERE 1 + (src + dst) % 5 >= {threshold})""",
            "fsym AS MATERIALIZED (SELECT src AS a, dst AS b FROM fe "
            "UNION ALL SELECT dst, src FROM fe)",
            "t0 AS (SELECT node, node AS c FROM tnodes)"]
    for k in range(1, iters + 1):
        ctes.append(f"""t{k} AS MATERIALIZED (
  SELECT n.node, least(p.c, coalesce(min(q.c), p.c)) AS c
  FROM tnodes n
  JOIN t{k-1} p ON p.node = n.node
  LEFT JOIN fsym e ON e.a = n.node
  LEFT JOIN t{k-1} q ON q.node = e.b
  GROUP BY n.node, p.c)""")
    return ("WITH " + ",\n".join(ctes) +
            f"\nSELECT node, c AS component FROM t{iters} ORDER BY node")


def hop_distances_sql(iters: int = 10) -> str:
    """MSBFS hop counts from the 64 smallest node ids (reached pairs,
    distance ≥ 1) — same BFS unroll as closeness."""
    ctes = _bfs_ctes(iters)
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT s AS source, v AS target, CAST(d AS BIGINT) AS distance
FROM d{iters} WHERE d > 0 ORDER BY source, target""")


def all_pairs_weighted_sql(iters: int = 15, nsources: int = 4) -> str:
    """Weighted distances from the ``nsources`` smallest node ids over
    the weighted trade graph (Bellman-Ford unroll per source)."""
    ctes = [TRADE_EDGES, TRADE_NODES,
            f"srcs AS (SELECT node AS s FROM tnodes ORDER BY node LIMIT {nsources})",
            "w0 AS (SELECT s, s AS v, CAST(0 AS DOUBLE) AS d FROM srcs)"]
    for k in range(1, iters + 1):
        ctes.append(f"""w{k} AS MATERIALIZED (
  SELECT s, v, min(d) AS d FROM (
    SELECT s, v, d FROM w{k-1}
    UNION ALL
    SELECT p.s, te.dst AS v, p.d + 1 + (te.src + te.dst) % 5 AS d
    FROM w{k-1} p JOIN tedges te ON te.src = p.v
  ) u GROUP BY s, v)""")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT s AS source, v AS target, round(d, 6) AS distance
FROM w{iters} WHERE v != s ORDER BY source, target""")


def sssp_sql(iters: int = 15) -> str:
    """Bellman-Ford unroll over the weighted trade graph
    (w = 1 + (src+dst) % 5) from the smallest node id; reached rows only."""
    ctes = [TRADE_EDGES, TRADE_NODES,
            "s0 AS (SELECT min(node) AS v FROM tnodes)",
            "e0 AS (SELECT v, CAST(0 AS DOUBLE) AS d FROM s0)"]
    for k in range(1, iters + 1):
        ctes.append(f"""e{k} AS MATERIALIZED (
  SELECT v, min(d) AS d FROM (
    SELECT v, d FROM e{k-1}
    UNION ALL
    SELECT te.dst AS v, p.d + 1 + (te.src + te.dst) % 5 AS d
    FROM e{k-1} p JOIN tedges te ON te.src = p.v
  ) u GROUP BY v)""")
    return ("WITH " + ",\n".join(ctes) +
            f"\nSELECT v AS node, round(d, 6) AS distance FROM e{iters} ORDER BY v")


SCC_SQL = f"""WITH RECURSIVE {TRADE_EDGES},
{TRADE_NODES},
reach(s, d) AS (
  SELECT src, dst FROM tedges
  UNION
  SELECT r.s, e.dst FROM reach r JOIN tedges e ON e.src = r.d
),
mutual AS (
  SELECT r1.s AS v, r1.d AS w
  FROM reach r1 JOIN reach r2 ON r1.s = r2.d AND r1.d = r2.s
)
SELECT n.node AS node,
       greatest(n.node, coalesce(max(m.w), n.node)) AS component
FROM tnodes n LEFT JOIN mutual m ON m.v = n.node
GROUP BY n.node ORDER BY node"""


SCC_CONDENSATION_SQL = f"""WITH RECURSIVE {TRADE_EDGES},
thin AS MATERIALIZED (
  SELECT src, dst FROM tedges
  WHERE src < 1000000 OR (src + dst) % 3 = 0),
tn AS MATERIALIZED (
  SELECT src AS node FROM thin UNION SELECT dst FROM thin),
reach(s, d) AS (
  SELECT src, dst FROM thin
  UNION
  SELECT r.s, e.dst FROM reach r JOIN thin e ON e.src = r.d
),
mutual AS (
  SELECT r1.s AS v, r1.d AS w
  FROM reach r1 JOIN reach r2 ON r1.s = r2.d AND r1.d = r2.s
),
comp AS (
  SELECT n.node, greatest(n.node, coalesce(max(m.w), n.node)) AS c
  FROM tn n LEFT JOIN mutual m ON m.v = n.node GROUP BY n.node
)
SELECT DISTINCT cs.c AS src_comp, cd.c AS dst_comp
FROM thin e JOIN comp cs ON cs.node = e.src
JOIN comp cd ON cd.node = e.dst
WHERE cs.c != cd.c
ORDER BY src_comp, dst_comp"""


def eccentricity_sampled_sql(iters: int = 10) -> str:
    """Eccentricity of the 64 smallest node ids: max BFS depth over the
    same unrolled distance table as closeness (d=0 for the source
    itself keeps unreaching sources at eccentricity 0)."""
    ctes = _bfs_ctes(iters)
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT s AS node, CAST(max(d) AS BIGINT) AS eccentricity
FROM d{iters} GROUP BY s ORDER BY node""")


def radius_diameter_sql(iters: int = 10) -> str:
    """One-row min/max eccentricity over the same sampled-source BFS
    unroll as eccentricity_sampled_sql."""
    ctes = _bfs_ctes(iters)
    return ("WITH " + ",\n".join(ctes) + f""",
ecc AS (SELECT s, CAST(max(d) AS BIGINT) AS e FROM d{iters} GROUP BY s)
SELECT CAST(count(*) AS BIGINT) AS n_sources,
       CAST(min(e) AS BIGINT) AS radius,
       CAST(max(e) AS BIGINT) AS diameter
FROM ecc""")


def lpa_weighted_sql(sweeps: int = 6) -> str:
    """Weighted LPA mirror over the weighted trade graph (w = 1 +
    (src+dst) % 5): votes are weight sums, argmax-weight tie-broken by
    min label, semi-synchronous parity sweeps — same schedule as
    lpa_sql, weightProperty semantics of the reference's LPA."""
    ctes = [TRADE_EDGES, TRADE_NODES,
            "vn AS MATERIALIZED (SELECT node, row_number() OVER (ORDER BY node) - 1 "
            "AS vid FROM tnodes)",
            """ev AS MATERIALIZED (
  SELECT s.vid AS sv, t.vid AS tv,
         CAST(1 + (e.src + e.dst) % 5 AS DOUBLE) AS w
  FROM tedges e JOIN vn s ON s.node = e.src JOIN vn t ON t.node = e.dst)""",
            "l0 AS (SELECT vid, vid AS lab FROM vn)"]
    for k in range(1, sweeps + 1):
        parity = (k - 1) % 2
        ctes.append(f"""v{k} AS MATERIALIZED (
  SELECT e.tv AS vid, p.lab AS lab, sum(e.w) AS c
  FROM ev e JOIN l{k-1} p ON p.vid = e.sv GROUP BY e.tv, p.lab)""")
        ctes.append(f"""b{k} AS MATERIALIZED (
  SELECT vid, lab AS best FROM (
    SELECT vid, lab, row_number() OVER (PARTITION BY vid ORDER BY c DESC, lab ASC) AS rn
    FROM v{k}) t WHERE rn = 1)""")
        ctes.append(f"""l{k} AS MATERIALIZED (
  SELECT n.vid,
         CASE WHEN n.vid % 2 = {parity} AND b.best IS NOT NULL THEN b.best ELSE p.lab END AS lab
  FROM vn n JOIN l{k-1} p ON p.vid = n.vid LEFT JOIN b{k} b ON b.vid = n.vid)""")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT n.node AS node, ln.node AS label
FROM vn n JOIN l{sweeps} l ON l.vid = n.vid JOIN vn ln ON ln.vid = l.lab
ORDER BY n.node""")


def sssp_path_sql(iters: int = 15) -> str:
    """Shortest-path PATH reconstruction mirror (shortest_path_dijkstra,
    algo.shortestPath stream parity): source = min node, target = max
    reachable node over the weighted trade graph. Distances via the
    Bellman-Ford unroll; predecessor of v = argmin (dist(u), u) among
    tight edges — exactly the engine heap's first-popper rule; the path
    walks target→source by recursive CTE and is emitted forward."""
    ctes = [TRADE_EDGES, TRADE_NODES,
            "s0 AS (SELECT min(node) AS v FROM tnodes)",
            "e0 AS (SELECT v, CAST(0 AS DOUBLE) AS d FROM s0)"]
    for k in range(1, iters + 1):
        ctes.append(f"""e{k} AS MATERIALIZED (
  SELECT v, min(d) AS d FROM (
    SELECT v, d FROM e{k-1}
    UNION ALL
    SELECT te.dst AS v, p.d + 1 + (te.src + te.dst) % 5 AS d
    FROM e{k-1} p JOIN tedges te ON te.src = p.v
  ) u GROUP BY v)""")
    ctes.append(f"dst_pick AS (SELECT max(v) AS t FROM e{iters})")
    ctes.append(f"""pred AS MATERIALIZED (
  SELECT v, u FROM (
    SELECT dv.v AS v, du.v AS u,
           row_number() OVER (PARTITION BY dv.v ORDER BY du.d, du.v) AS rn
    FROM e{iters} dv
    JOIN tedges te ON te.dst = dv.v
    JOIN e{iters} du ON du.v = te.src
    WHERE du.d + 1 + (te.src + te.dst) % 5 = dv.d) x
  WHERE rn = 1)""")
    return ("WITH RECURSIVE " + ",\n".join(ctes) + f""",
walk(back, v) AS (
  SELECT 0, (SELECT t FROM dst_pick)
  UNION ALL
  SELECT w.back + 1, p.u FROM walk w JOIN pred p ON p.v = w.v
  WHERE w.v != (SELECT v FROM s0)
)
SELECT CAST((SELECT max(back) FROM walk) - back AS BIGINT) AS step,
       v AS node,
       round((SELECT d FROM e{iters} e WHERE e.v = walk.v), 6) AS cost
FROM walk ORDER BY step""")


def closeness_weighted_sql(iters: int = 15, nsources: int = 4) -> str:
    """Weighted closeness mirror: (n-1)/Σ weighted distances from the
    same Bellman-Ford unroll as all_pairs_weighted (self excluded)."""
    ctes = [TRADE_EDGES, TRADE_NODES,
            f"srcs AS (SELECT node AS s FROM tnodes ORDER BY node LIMIT {nsources})",
            "w0 AS (SELECT s, s AS v, CAST(0 AS DOUBLE) AS d FROM srcs)"]
    for k in range(1, iters + 1):
        ctes.append(f"""w{k} AS MATERIALIZED (
  SELECT s, v, min(d) AS d FROM (
    SELECT s, v, d FROM w{k-1}
    UNION ALL
    SELECT p.s, te.dst AS v, p.d + 1 + (te.src + te.dst) % 5 AS d
    FROM w{k-1} p JOIN tedges te ON te.src = p.v
  ) u GROUP BY s, v)""")
    return ("WITH " + ",\n".join(ctes) + f""",
nn AS (SELECT count(*) AS n FROM tnodes),
far AS (SELECT s, sum(d) AS f FROM w{iters} WHERE v != s GROUP BY s)
SELECT srcs.s AS node,
       round(CASE WHEN coalesce(f, 0) > 0
             THEN ((SELECT n FROM nn) - 1) / f ELSE 0 END, 6) AS centrality
FROM srcs LEFT JOIN far ON far.s = srcs.s ORDER BY node""")


# algo.list oracle: a HAND-PINNED literal of the procedure surface
# (deliberately not generated from registry.PROCEDURES at runtime —
# drift between the registry and this pin fails the value-hash gate,
# which is the point of gating an introspection query).
ALGO_LIST_SQL = """SELECT name, impl FROM (VALUES
  ('algo.ComputeAllMetaPathsSchemaFullWeights', 'neo4j_graph_algorithms_ray.algorithms.metapath.compute_all_metapaths_schema_full'),
  ('algo.GetSchema', 'neo4j_graph_algorithms_ray.algorithms.metapath.get_schema'),
  ('algo.allShortestPaths.stream', 'neo4j_graph_algorithms_ray.algorithms.sssp.all_shortest_paths_weighted'),
  ('algo.betweenness', 'neo4j_graph_algorithms_ray.algorithms.betweenness.betweenness'),
  ('algo.betweenness.sampled', 'neo4j_graph_algorithms_ray.algorithms.betweenness.betweenness_bsp'),
  ('algo.betweenness.sampled.stream', 'neo4j_graph_algorithms_ray.algorithms.betweenness.betweenness_bsp'),
  ('algo.betweenness.stream', 'neo4j_graph_algorithms_ray.algorithms.betweenness.betweenness'),
  ('algo.closeness', 'neo4j_graph_algorithms_ray.algorithms.msbfs.closeness'),
  ('algo.closeness.stream', 'neo4j_graph_algorithms_ray.algorithms.msbfs.closeness'),
  ('algo.computeAllMetaPaths', 'neo4j_graph_algorithms_ray.algorithms.metapath.compute_all_metapaths'),
  ('algo.computeAllMetaPathsBetweenTypes', 'neo4j_graph_algorithms_ray.algorithms.metapath.compute_all_metapaths'),
  ('algo.computeAllMetaPathsForInstances', 'neo4j_graph_algorithms_ray.algorithms.metapath.compute_metapaths_for_instances'),
  ('algo.computeAllMetaPathsSchemaFull', 'neo4j_graph_algorithms_ray.algorithms.metapath.compute_all_metapaths_schema_full'),
  ('algo.filterMetaPaths', 'neo4j_graph_algorithms_ray.algorithms.metapath.filter_metapaths'),
  ('algo.getLabelIdToLabelNameMapping', 'neo4j_graph_algorithms_ray.algorithms.metapath.label_id_mapping'),
  ('algo.gettingStarted', 'neo4j_graph_algorithms_ray.algorithms.mst.getting_started'),
  ('algo.gettingStarted.stream', 'neo4j_graph_algorithms_ray.algorithms.mst.getting_started'),
  ('algo.graph.info', 'neo4j_graph_algorithms_ray.registry.GraphCatalog.info'),
  ('algo.graph.load', 'neo4j_graph_algorithms_ray.registry.GraphCatalog.set'),
  ('algo.graph.remove', 'neo4j_graph_algorithms_ray.registry.GraphCatalog.remove'),
  ('algo.graphReducer', 'neo4j_graph_algorithms_ray.algorithms.metapath.graph_reducer'),
  ('algo.harmonic', 'neo4j_graph_algorithms_ray.algorithms.msbfs.harmonic'),
  ('algo.harmonic.stream', 'neo4j_graph_algorithms_ray.algorithms.msbfs.harmonic'),
  ('algo.louvain', 'neo4j_graph_algorithms_ray.algorithms.louvain.louvain'),
  ('algo.louvain.stream', 'neo4j_graph_algorithms_ray.algorithms.louvain.louvain'),
  ('algo.metaPath', 'neo4j_graph_algorithms_ray.algorithms.mst.getting_started'),
  ('algo.metaPath.stream', 'neo4j_graph_algorithms_ray.algorithms.mst.getting_started'),
  ('algo.metaPathPrecomputeHighDegreeNodes', 'neo4j_graph_algorithms_ray.algorithms.metapath.metapath_precompute_high_degree_nodes'),
  ('algo.mst', 'neo4j_graph_algorithms_ray.algorithms.mst.mst_prim'),
  ('algo.pageRank', 'neo4j_graph_algorithms_ray.algorithms.pagerank.pagerank'),
  ('algo.pageRank.stream', 'neo4j_graph_algorithms_ray.algorithms.pagerank.pagerank'),
  ('algo.readPrecomputedMetaPaths', 'neo4j_graph_algorithms_ray.algorithms.metapath.read_precomputed_metapaths'),
  ('algo.scc', 'neo4j_graph_algorithms_ray.algorithms.scc.scc'),
  ('algo.scc.forwardBackward.stream', 'neo4j_graph_algorithms_ray.algorithms.scc.scc'),
  ('algo.scc.iterative', 'neo4j_graph_algorithms_ray.algorithms.scc.scc'),
  ('algo.scc.iterative.stream', 'neo4j_graph_algorithms_ray.algorithms.scc.scc'),
  ('algo.scc.multistep', 'neo4j_graph_algorithms_ray.algorithms.scc.scc'),
  ('algo.scc.multistep.stream', 'neo4j_graph_algorithms_ray.algorithms.scc.scc'),
  ('algo.scc.recursive.tarjan', 'neo4j_graph_algorithms_ray.algorithms.scc.scc'),
  ('algo.scc.recursive.tunedTarjan', 'neo4j_graph_algorithms_ray.algorithms.scc.scc'),
  ('algo.scc.recursive.tunedTarjan.stream', 'neo4j_graph_algorithms_ray.algorithms.scc.scc'),
  ('algo.scc.stream', 'neo4j_graph_algorithms_ray.algorithms.scc.scc'),
  ('algo.shortestPath', 'neo4j_graph_algorithms_ray.algorithms.sssp.shortest_path_dijkstra'),
  ('algo.shortestPath.deltaStepping', 'neo4j_graph_algorithms_ray.algorithms.sssp.sssp_delta_stepping'),
  ('algo.shortestPath.deltaStepping.stream', 'neo4j_graph_algorithms_ray.algorithms.sssp.sssp_delta_stepping'),
  ('algo.shortestPath.stream', 'neo4j_graph_algorithms_ray.algorithms.sssp.shortest_path_dijkstra'),
  ('algo.shortestPaths', 'neo4j_graph_algorithms_ray.algorithms.msbfs.msbfs_hop_counts'),
  ('algo.shortestPaths.stream', 'neo4j_graph_algorithms_ray.algorithms.msbfs.msbfs_hop_counts'),
  ('algo.triangle.stream', 'neo4j_graph_algorithms_ray.algorithms.triangles.triangle_stream'),
  ('algo.triangleCount', 'neo4j_graph_algorithms_ray.algorithms.triangles.triangle_count'),
  ('algo.triangleCount.forkJoin', 'neo4j_graph_algorithms_ray.algorithms.triangles.triangle_count'),
  ('algo.triangleCount.forkJoin.stream', 'neo4j_graph_algorithms_ray.algorithms.triangles.triangle_count'),
  ('algo.triangleCount.stream', 'neo4j_graph_algorithms_ray.algorithms.triangles.triangle_count'),
  ('algo.unionFind', 'neo4j_graph_algorithms_ray.algorithms.wcc.wcc'),
  ('algo.unionFind.forkJoin', 'neo4j_graph_algorithms_ray.algorithms.wcc.wcc'),
  ('algo.unionFind.forkJoin.stream', 'neo4j_graph_algorithms_ray.algorithms.wcc.wcc'),
  ('algo.unionFind.forkJoinMerge', 'neo4j_graph_algorithms_ray.algorithms.wcc.wcc'),
  ('algo.unionFind.forkJoinMerge.stream', 'neo4j_graph_algorithms_ray.algorithms.wcc.wcc'),
  ('algo.unionFind.mscoloring', 'neo4j_graph_algorithms_ray.algorithms.wcc.mscoloring'),
  ('algo.unionFind.mscoloring.stream', 'neo4j_graph_algorithms_ray.algorithms.wcc.mscoloring'),
  ('algo.unionFind.queue', 'neo4j_graph_algorithms_ray.algorithms.wcc.wcc'),
  ('algo.unionFind.queue.stream', 'neo4j_graph_algorithms_ray.algorithms.wcc.wcc'),
  ('algo.unionFind.stream', 'neo4j_graph_algorithms_ray.algorithms.wcc.wcc')
) AS t(name, impl) ORDER BY name"""


def mscoloring_sql(iters: int = 25) -> str:
    """algo.unionFind.mscoloring mirror: WCC by MAX-id propagation over
    the symmetrized purchase graph (MSColoring.java:46-125 semantics),
    unrolled like wcc_sql with greatest/max instead of least/min."""
    ctes = [G1_EDGES, G1_NODES,
            "sym AS MATERIALIZED (SELECT src AS a, dst AS b FROM edges "
            "UNION ALL SELECT dst AS a, src AS b FROM edges)",
            "c0 AS (SELECT node, node AS c FROM nodes)"]
    for k in range(1, iters + 1):
        ctes.append(f"""c{k} AS MATERIALIZED (
  SELECT n.node, greatest(p.c, coalesce(max(q.c), p.c)) AS c
  FROM nodes n
  JOIN c{k-1} p ON p.node = n.node
  LEFT JOIN sym e ON e.a = n.node
  LEFT JOIN c{k-1} q ON q.node = e.b
  GROUP BY n.node, p.c)""")
    return ("WITH " + ",\n".join(ctes) +
            f"\nSELECT node, c AS component FROM c{iters} ORDER BY node")


GETTING_STARTED_SQL = f"""WITH {G1_EDGES}
SELECT (SELECT count(*) FROM edges) > 0 AS has_relationships"""


def filter_metapaths_sql(length: int = 3, start: str = "Customer",
                         end: str = "Nation") -> str:
    """compute_all_metapaths + filter_metapaths mirror: keep paths whose
    first/last label token matches (FilterMetaPaths.java:17-55)."""
    base = metapath_sql(length).replace(" ORDER BY path", "")
    return f"""SELECT path, "count" FROM ({base}) t
WHERE string_split(path, ' | ')[1] = '{start}'
  AND string_split(path, ' | ')[-1] = '{end}'
ORDER BY path"""


METAPATHS_FOR_INSTANCES_SQL = f"""WITH {TYPED_EDGES},
sym AS MATERIALIZED (SELECT src, dst, sl, et, dl FROM te
        UNION ALL SELECT dst, src, dl, et, sl FROM te),
starts AS (SELECT c_custkey AS v FROM customer ORDER BY c_custkey LIMIT 5),
ends AS (SELECT DISTINCT dst AS v FROM te WHERE dl = 'Nation'),
lv2 AS (SELECT sl || ' | ' || et || ' | ' || dl AS path, count(*) AS cnt
        FROM sym WHERE src IN (SELECT v FROM starts)
          AND dst IN (SELECT v FROM ends) GROUP BY 1),
lv3 AS (SELECT e1.sl || ' | ' || e1.et || ' | ' || e1.dl || ' | '
               || e2.et || ' | ' || e2.dl AS path, count(*) AS cnt
        FROM sym e1 JOIN sym e2 ON e2.src = e1.dst
        WHERE e1.src IN (SELECT v FROM starts)
          AND e2.dst IN (SELECT v FROM ends) GROUP BY 1)
SELECT path, CAST(sum(cnt) AS BIGINT) AS "count"
FROM (SELECT * FROM lv2 UNION ALL SELECT * FROM lv3) u
GROUP BY path ORDER BY path"""


def precompute_high_degree_sql(ratio: float = 0.01) -> str:
    """MetaPathPrecomputeHighDegreeNodes mirror: distinct (start, path,
    end) instance rows for the top-ratio degree hubs (symmetrized typed
    graph, tie-break degree DESC then node ASC), path length <= 3."""
    return f"""WITH {TYPED_EDGES},
sym AS MATERIALIZED (SELECT src, dst, sl, et, dl FROM te
        UNION ALL SELECT dst, src, dl, et, sl FROM te),
deg AS (SELECT src, count(*) AS d FROM sym GROUP BY src),
hubs AS (SELECT src FROM deg
         QUALIFY row_number() OVER (ORDER BY d DESC, src) <=
           greatest(1, CAST(floor((SELECT count(*) FROM deg) * {ratio}) AS BIGINT))),
lv2 AS (SELECT src AS start, sl || ' | ' || et || ' | ' || dl AS path,
               dst AS "end"
        FROM sym WHERE src IN (SELECT src FROM hubs)),
lv3 AS (SELECT e1.src AS start, e1.sl || ' | ' || e1.et || ' | ' || e1.dl
               || ' | ' || e2.et || ' | ' || e2.dl AS path, e2.dst AS "end"
        FROM sym e1 JOIN sym e2 ON e2.src = e1.dst
        WHERE e1.src IN (SELECT src FROM hubs))
SELECT DISTINCT start, path, "end"
FROM (SELECT * FROM lv2 UNION ALL SELECT * FROM lv3) u
ORDER BY start, path, "end" """


SCALARS_SQL = """WITH v AS (
  SELECT CASE WHEN l_tax = 0 THEN CAST('nan' AS DOUBLE)
              WHEN l_discount = 0 THEN CAST('infinity' AS DOUBLE)
              ELSE l_extendedprice / l_discount END AS val
  FROM lineitem)
SELECT CAST(count(*) FILTER (WHERE isfinite(val)) AS BIGINT) AS n_finite,
       CAST(count(*) FILTER (WHERE isinf(val)) AS BIGINT) AS n_infinite,
       CAST(count(*) FILTER (WHERE isnan(val)) AS BIGINT) AS n_nan
FROM v"""


GRAPH_CATALOG_SQL = """SELECT 'driver_catalog_rt' AS name,
  CAST((SELECT count(DISTINCT n_nationkey) FROM nation)
     + (SELECT count(DISTINCT n_regionkey) FROM nation) AS BIGINT) AS nodes,
  CAST((SELECT count(*) FROM (
     SELECT DISTINCT n_nationkey, n_regionkey FROM nation) x) AS BIGINT)
     AS relationships,
  TRUE AS removed, FALSE AS exists_after"""


CONDENSATION_LEVELS_SQL = f"""WITH RECURSIVE {TRADE_EDGES},
thin AS MATERIALIZED (
  SELECT src, dst FROM tedges
  WHERE src < 1000000 OR (src + dst) % 3 = 0),
tn AS MATERIALIZED (
  SELECT src AS node FROM thin UNION SELECT dst FROM thin),
reach(s, d) AS (
  SELECT src, dst FROM thin
  UNION
  SELECT r.s, e.dst FROM reach r JOIN thin e ON e.src = r.d
),
mutual AS (
  SELECT r1.s AS v, r1.d AS w
  FROM reach r1 JOIN reach r2 ON r1.s = r2.d AND r1.d = r2.s
),
comp AS (
  SELECT n.node, greatest(n.node, coalesce(max(m.w), n.node)) AS c
  FROM tn n LEFT JOIN mutual m ON m.v = n.node GROUP BY n.node
),
cedges AS MATERIALIZED (
  SELECT DISTINCT cs.c AS s, cd.c AS d
  FROM thin e JOIN comp cs ON cs.node = e.src
  JOIN comp cd ON cd.node = e.dst
  WHERE cs.c != cd.c),
cnodes AS (SELECT s AS node FROM cedges UNION SELECT d FROM cedges),
walk(node, dp) AS (
  SELECT node, 0 FROM cnodes
  UNION
  SELECT e.d, w.dp + 1 FROM walk w JOIN cedges e ON e.s = w.node
)
SELECT node AS component, CAST(max(dp) AS BIGINT) AS level
FROM walk GROUP BY node ORDER BY component"""
