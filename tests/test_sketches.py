"""HyperLogLog sketch tests: register table matches a pure-python
replay, the estimate lands within HLL's expected error of the true
distinct count (σ ≈ 1.04/√m ≈ 6.5% at m=256), and batch layout does
not change the sketch (merge idempotence)."""

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

from neo4j_graph_algorithms_ray.functions.sketches import (HLL_M,
                                                           hll_estimate,
                                                           hll_registers)


def _replay(tokens):
    regs = {}
    for t in set(tokens):
        h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        reg, rest = h % HLL_M, h // HLL_M
        rho = 53 if rest == 0 else 52 - int(np.floor(np.log2(rest)))
        regs[reg] = max(regs.get(reg, 0), rho)
    return sorted(regs.items())


def _corpus(n_docs, vocab, seed=3):
    rng = np.random.default_rng(seed)
    docs = [" ".join(f"w{rng.integers(0, vocab)}" for _ in range(50))
            for _ in range(n_docs)]
    return docs


def test_hll_registers_match_replay_and_estimate():
    docs = _corpus(200, 5000)
    ds = rd.from_arrow(pa.table({"text": docs}))
    got = sorted((r["register"], r["max_rho"])
                 for r in hll_registers(ds).take_all())
    toks = [t for d in docs for t in d.lower().split()]
    assert got == _replay(toks)
    true = len(set(toks))
    est = hll_estimate(hll_registers(ds))
    assert abs(est - true) / true < 0.2   # 3σ at m=256


def test_hll_batch_invariance():
    docs = _corpus(120, 800, seed=9)
    one = rd.from_arrow(pa.table({"text": docs}))
    many = rd.from_arrow(pa.table({"text": docs})).repartition(16)
    a = sorted((r["register"], r["max_rho"]) for r in hll_registers(one).take_all())
    b = sorted((r["register"], r["max_rho"]) for r in hll_registers(many).take_all())
    assert a == b


def test_bloom_no_false_negatives_and_batch_invariance():
    from neo4j_graph_algorithms_ray.functions.sketches import (bloom_bits,
                                                               bloom_probe)
    keys = [f"http://h{i}.test/p{i}" for i in range(300)]
    ds = rd.from_arrow(pa.table({"url": keys}))
    bloom = bloom_bits(ds, "url")
    assert all(bloom_probe(bloom, keys))          # no false negatives
    other = [f"http://other{i}.test/x" for i in range(500)]
    fp = sum(bloom_probe(bloom, other)) / len(other)
    assert fp < 0.05                              # m/n≈55 bits/key, k=4
    sharded = rd.from_arrow(pa.table({"url": keys})).repartition(16)
    a = [(r["word"], r["bits"]) for r in bloom.take_all()]
    b = [(r["word"], r["bits"]) for r in bloom_bits(sharded, "url").take_all()]
    assert sorted(a) == sorted(b)


def test_cms_overestimates_and_exact_for_heavy_hitters():
    from collections import Counter
    from neo4j_graph_algorithms_ray.functions.sketches import (cms_estimate,
                                                               cms_table)
    docs = _corpus(100, 300, seed=4)
    ds = rd.from_arrow(pa.table({"text": docs})).repartition(8)
    cms = cms_table(ds)
    true = Counter(t for d in docs for t in d.lower().split())
    est = cms_estimate(cms, list(true))
    for tok, c in true.items():
        assert est[tok] >= c                       # never underestimates
    # vocab 300 << D*W cells: collisions rare, most estimates exact
    exact = sum(1 for t, c in true.items() if est[t] == c)
    assert exact / len(true) > 0.9


def test_grouped_hll_distinct_accuracy():
    import ray.data as rd

    from neo4j_graph_algorithms_ray.functions.sketches import \
        grouped_hll_distinct
    rows = []
    for i in range(1000):
        rows.append({"g": "big", "v": f"item-{i % 700}"})
    for i in range(30):
        rows.append({"g": "small", "v": f"s-{i % 10}"})
    out = {r["g"]: r for r in
           grouped_hll_distinct(rd.from_items(rows).repartition(4),
                                "g", "v").take_all()}
    # HLL with m=256 has ~6.5% relative error; allow 3 sigma
    assert abs(out["big"]["n_distinct_est"] - 700) / 700 < 0.2
    # small-range correction regime: near-exact for 10 distinct
    assert abs(out["small"]["n_distinct_est"] - 10) < 2
    assert out["small"]["hit_registers"] <= 10


def test_grouped_hll_partition_invariance():
    import ray.data as rd

    from neo4j_graph_algorithms_ray.functions.sketches import \
        grouped_hll_distinct
    rows = [{"g": f"g{i % 3}", "v": f"val-{i}"} for i in range(300)]
    a = sorted((r["g"], r["n_distinct_est"]) for r in
               grouped_hll_distinct(rd.from_items(rows).repartition(1),
                                    "g", "v").take_all())
    b = sorted((r["g"], r["n_distinct_est"]) for r in
               grouped_hll_distinct(rd.from_items(rows).repartition(7),
                                    "g", "v").take_all())
    assert a == b
