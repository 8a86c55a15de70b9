"""Deterministic random-walk sampler tests (algorithms/walks.py):
golden walk on a hand-built graph vs a pure-python replay of the
hash→ranked-neighbor rule, early stop at dangling vertices, and
partition-count invariance (the ranked gather must not depend on how
the CSR is sharded)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from neo4j_graph_algorithms_ray.algorithms.walks import random_walks
from neo4j_graph_algorithms_ray.functions.dedup import _md5_int
from neo4j_graph_algorithms_ray.graph import build_graph


def _graph(edges, name):
    src, dst = zip(*edges)
    ds = rd.from_arrow(pa.table({"src": list(src), "dst": list(dst)}))
    return build_graph(ds, name=name)


def _replay(edges, starts, length):
    """Reference replay: adjacency ranked by original id."""
    adj = {}
    for s, d in sorted(set(edges)):
        adj.setdefault(s, []).append(d)
    rows = []
    for s in starts:
        cur = s
        rows.append((s, 0, s))
        for t in range(length):
            nbrs = adj.get(cur)
            if not nbrs:
                break
            cur = nbrs[_md5_int(f"{s}|{t}") % len(nbrs)]
            rows.append((s, t + 1, cur))
    return sorted(rows)


def _got(ds):
    return sorted((r["start"], r["step"], r["node"]) for r in ds.take_all())


def test_walks_golden_with_dangling():
    # vertex 3 is dangling (no out-edges): walks stop early there
    edges = [(0, 1), (0, 2), (0, 3), (1, 0), (1, 3), (2, 0), (4, 3)]
    g = _graph(edges, "walks_gold")
    got = _got(random_walks(g, length=5, start_mod=1))
    want = _replay(edges, [0, 1, 2, 3, 4], 5)
    assert got == want
    # at least one walk actually stopped early at the dangling vertex
    by_start = {}
    for s, t, _ in got:
        by_start[s] = max(by_start.get(s, 0), t)
    assert by_start[3] == 0 and by_start[4] == 1


def test_walks_partition_invariance():
    rng = np.random.default_rng(7)
    edges = list({(int(a), int(b)) for a, b in rng.integers(0, 40, (300, 2))
                  if a != b})
    g1 = _graph(edges, "walks_p1")
    g4 = _graph(edges, "walks_p4")
    a = _got(random_walks(g1, length=4, start_mod=2, num_partitions=1))
    b = _got(random_walks(g4, length=4, start_mod=2, num_partitions=4))
    assert a == b == _replay(
        edges, [v for v in sorted({x for e in edges for x in e})
                if _md5_int(str(v)) % 2 == 0], 4)


def _replay_n2v(edges, starts, length, p, q):
    """Reference replay of the node2vec integer-bias pick."""
    eset = set(edges)
    adj = {}
    for s, d in sorted(set(edges)):
        adj.setdefault(s, []).append(d)
    rows = []
    for s in starts:
        cur, prev = s, None
        rows.append((s, 0, s))
        for t in range(length):
            nbrs = adj.get(cur)
            if not nbrs:
                break
            h = _md5_int(f"{s}|{t}")
            if t == 0:
                nxt = nbrs[h % len(nbrs)]
            else:
                ws = [q if c == prev else (p * q if (prev, c) in eset else p)
                      for c in nbrs]
                r = h % sum(ws)
                acc = 0
                for c, wt in zip(nbrs, ws):
                    acc += wt
                    if acc > r:
                        nxt = c
                        break
            rows.append((s, t + 1, nxt))
            prev, cur = cur, nxt
    return sorted(rows)


def test_node2vec_golden_vs_replay():
    from neo4j_graph_algorithms_ray.algorithms.walks import node2vec_walks
    edges = [(0, 1), (0, 2), (0, 3), (1, 0), (1, 2), (1, 3), (2, 0),
             (2, 3), (3, 1), (4, 3), (3, 4)]
    g = _graph(edges, "n2v_gold")
    for p, q in ((1, 2), (4, 1), (2, 3)):
        got = _got(node2vec_walks(g, length=6, start_mod=1, p=p, q=q))
        want = _replay_n2v(edges, [0, 1, 2, 3, 4], 6, p, q)
        assert got == want, (p, q)


def test_node2vec_random_graph_and_partition_invariance():
    from neo4j_graph_algorithms_ray.algorithms.walks import node2vec_walks
    rng = np.random.default_rng(5)
    edges = list({(int(a), int(b)) for a, b in
                  zip(rng.integers(0, 40, 300), rng.integers(0, 40, 300))
                  if a != b})
    g1 = _graph(edges, "n2v_r1")
    g4 = _graph(edges, "n2v_r4")
    a = _got(node2vec_walks(g1, length=5, start_mod=2, p=1, q=4,
                            num_partitions=1))
    b = _got(node2vec_walks(g4, length=5, start_mod=2, p=1, q=4,
                            num_partitions=4))
    assert a == b
    starts = [s for s in range(40)
              if _md5_int(str(s)) % 2 == 0 and any(e[0] == s or e[1] == s
                                                   for e in edges)]
    want = _replay_n2v(edges, starts, 5, 1, 4)
    assert a == want
