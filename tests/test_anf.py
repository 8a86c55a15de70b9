"""ANF (approximate neighborhood function) vs exact MSBFS hop counts."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from neo4j_graph_algorithms_ray import build_graph
from neo4j_graph_algorithms_ray.algorithms import anf, msbfs_hop_counts


@pytest.fixture(scope="module")
def rand_graph():
    rng = np.random.default_rng(7)
    n, m = 500, 2500
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    t = pa.table({"src": pa.array(src[keep], pa.int64()),
                  "dst": pa.array(dst[keep], pa.int64())})
    return build_graph(rd.from_arrow(t), name="anf_rand")


def test_anf_matches_exact_distance_distribution(rand_graph):
    g = rand_graph
    res = anf(g, k_hashes=64, seed=3)
    got = {int(r["hop"]): float(r["n_pairs_est"])
           for r in res.dataset.take_all()}

    hops = msbfs_hop_counts(g).to_pandas()
    exact_total = len(hops)
    max_d = int(hops["distance"].max())
    # estimate should converge in exactly max-distance supersteps
    # (+1 no-change step to detect the fixpoint)
    assert res.iterations in (max_d, max_d + 1)
    assert max(got) == max_d
    # FM with k=64 → σ ≈ 14%; assert within 30% at every hop ≥ 2
    # (hop-1 sets are tiny — skip the small-range regime)
    for h in range(2, max_d + 1):
        exact_h = int((hops["distance"] <= h).sum())
        assert got[h] == pytest.approx(exact_h, rel=0.30), (h, got[h], exact_h)
    assert got[max_d] == pytest.approx(exact_total, rel=0.30)
    # monotone non-decreasing by construction (OR-closure only grows)
    vals = [got[h] for h in sorted(got)]
    assert all(b >= a - 1e-9 for a, b in zip(vals, vals[1:]))
    # effective diameter: smallest h with exact N(h) >= 0.9 N(max)
    exact_eff = next(h for h in range(1, max_d + 1)
                     if (hops["distance"] <= h).sum() >= 0.9 * exact_total)
    assert abs(res.stats["effective_diameter"] - exact_eff) <= 1


def test_anf_deterministic_and_seed_sensitive(rand_graph):
    a = anf(rand_graph, k_hashes=16, seed=5).dataset.to_pandas()
    b = anf(rand_graph, k_hashes=16, seed=5).dataset.to_pandas()
    c = anf(rand_graph, k_hashes=16, seed=6).dataset.to_pandas()
    assert a.equals(b)
    assert not a["n_pairs_est"].equals(c["n_pairs_est"])


def test_anf_empty_and_single_edge():
    g = build_graph(rd.from_arrow(pa.table(
        {"src": pa.array([0], pa.int64()),
         "dst": pa.array([1], pa.int64())})), name="anf_tiny")
    res = anf(g, k_hashes=32)
    rows = res.dataset.take_all()
    assert len(rows) == 1 and rows[0]["hop"] == 1
    # exactly one reachable pair (0 -> 1); FM on a 1-element delta is
    # noisy but must stay positive and finite
    assert 0 < rows[0]["n_pairs_est"] < 10
