"""Dedup (exact / minhash-LSH / simhash / n-gram Jaccard / embedding) and
ANN (brute-force + LSH) oracles against brute-force references."""

import numpy as np
import ray.data as rd

from neo4j_graph_algorithms_ray.functions.ann import brute_force_topk, lsh_topk
from neo4j_graph_algorithms_ray.functions.dedup import (
    embedding_neardup_pairs, exact_dedup, minhash_lsh_pairs,
    ngram_jaccard_pairs, simhash_pairs, word_shingles)

BASE = ("the quick brown fox jumps over the lazy dog while the rain "
        "falls on the quiet green hills beyond the river and the old mill")
DOCS = [
    {"doc_id": 0, "text": BASE},
    {"doc_id": 1, "text": BASE},                        # exact dup of 0
    {"doc_id": 2, "text": BASE.replace("lazy", "sleepy")},  # near dup of 0
    {"doc_id": 3, "text": "completely different content about spark and ray data engines"},
    {"doc_id": 4, "text": "another unrelated sentence with nothing shared at all"},
]


def _ds():
    return rd.from_items(DOCS)


def true_jaccard(a, b, k=3):
    sa, sb = set(word_shingles(a, k)), set(word_shingles(b, k))
    return len(sa & sb) / len(sa | sb)


def test_exact_dedup():
    rows = sorted(exact_dedup(_ds()).take_all(), key=lambda r: r["doc_id"])
    by_id = {r["doc_id"]: r["dup_count"] for r in rows}
    assert by_id[0] == 2          # docs 0 and 1 collapse, min id kept
    assert 1 not in by_id
    assert by_id[2] == by_id[3] == by_id[4] == 1


def test_minhash_lsh_finds_dups():
    pairs = {(r["a"], r["b"]): r["jaccard"]
             for r in minhash_lsh_pairs(_ds(), threshold=0.5).take_all()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs  # jaccard ≈ 0.86, identical minhash bands likely
    assert all(not (a in (3, 4) or b in (3, 4)) for a, b in pairs)


def test_ngram_jaccard_exact_allpairs():
    pairs = {(r["a"], r["b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(_ds(), threshold=0.5).take_all()}
    tj02 = round(true_jaccard(DOCS[0]["text"], DOCS[2]["text"]), 6)
    assert pairs[(0, 1)] == 1.0
    assert pairs[(0, 2)] == tj02 == pairs[(1, 2)]
    assert len(pairs) == 3


def test_simhash_pairs():
    pairs = {(r["a"], r["b"]): r["hamming"]
             for r in simhash_pairs(_ds(), max_hamming=10).take_all()}
    assert pairs[(0, 1)] == 0
    assert (0, 2) in pairs            # near dup → small hamming distance
    assert (0, 3) not in pairs and (3, 4) not in pairs


def _emb_ds(n=60, dim=16, seed=11):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n, dim))
    v[1] = v[0] + 0.01 * rng.standard_normal(dim)   # near dup pair (0,1)
    items = [{"vec_id": i, "embedding": v[i].astype(np.float32).tolist(),
              "label": i % 3} for i in range(n)]
    return rd.from_items(items), v


def test_embedding_neardup():
    ds, v = _emb_ds()
    # (0,1) share label 0 and 1? labels are i%3 → 0 and 1 differ. Put both in one block:
    items = ds.take_all()
    items[1]["label"] = 0
    ds = rd.from_items(items)
    pairs = {(r["a"], r["b"]) for r in
             embedding_neardup_pairs(ds, threshold=0.95).take_all()}
    assert (0, 1) in pairs


def test_ann_brute_force_matches_numpy():
    ds, v = _emb_ds()
    vn = v / np.linalg.norm(v, axis=1, keepdims=True)
    sims = vn @ vn[:3].T
    res = brute_force_topk(ds, v[:3], np.arange(3), k=5).take_all()
    for q in range(3):
        got = [r["vec_id"] for r in sorted(
            (r for r in res if r["query_id"] == q),
            key=lambda r: (-r["cosine"], r["vec_id"]))]
        s = sims[:, q].copy()
        s[q] = -np.inf
        expect = np.lexsort((np.arange(len(s)), -s))[:5]
        assert got == list(expect)


def test_ann_lsh_recall():
    ds, v = _emb_ds(n=200, dim=16)
    brute = brute_force_topk(ds, v[:3], np.arange(3), k=5).take_all()
    # 2^6 buckets for 200 vectors: code length scales with corpus size,
    # and 8 bits over dim=16 over-shards (recall 0.4 with the pinned
    # md5 planes); 6 bits measures 0.87
    approx = lsh_topk(ds, v[:3], np.arange(3), k=5, nbits=6).take_all()
    bset = {(r["query_id"], r["vec_id"]) for r in brute}
    aset = {(r["query_id"], r["vec_id"]) for r in approx}
    recall = len(bset & aset) / len(bset)
    assert recall >= 0.5  # multi-probe 6-bit LSH on random data
    # the engineered near-dup must always be found
    assert (0, 1) in aset


def test_ann_ivf_full_probe_equals_brute_force():
    """nprobe == ncells searches every cell — IVF must then reproduce
    the exact brute-force top-k (same tie-break contract)."""
    from neo4j_graph_algorithms_ray.functions.ann import ivf_topk
    ds, v = _emb_ds(n=120, dim=16)
    brute = {(r["query_id"], r["vec_id"], r["cosine"])
             for r in brute_force_topk(ds, v[:3], np.arange(3), k=5).take_all()}
    full = {(r["query_id"], r["vec_id"], r["cosine"])
            for r in ivf_topk(ds, v[:3], np.arange(3), k=5, ncells=8,
                              nprobe=8).take_all()}
    assert full == brute


def test_ann_ivf_recall():
    """nprobe < ncells: probing the nearest cells keeps recall high on
    random data, and the engineered near-dup pair is always found."""
    from neo4j_graph_algorithms_ray.functions.ann import ivf_topk
    ds, v = _emb_ds(n=200, dim=16)
    brute = brute_force_topk(ds, v[:3], np.arange(3), k=5).take_all()
    approx = ivf_topk(ds, v[:3], np.arange(3), k=5, ncells=16,
                      nprobe=4).take_all()
    bset = {(r["query_id"], r["vec_id"]) for r in brute}
    aset = {(r["query_id"], r["vec_id"]) for r in approx}
    recall = len(bset & aset) / len(bset)
    assert recall >= 0.5
    assert (0, 1) in aset


def test_ann_ivf_centroid_training_deterministic():
    from neo4j_graph_algorithms_ray.functions.ann import ivf_train_centroids
    ds, _ = _emb_ds(n=150, dim=16)
    c1 = ivf_train_centroids(ds, ncells=8, sample=100)
    c2 = ivf_train_centroids(ds, ncells=8, sample=100)
    np.testing.assert_array_equal(c1, c2)
    # spherical: unit-norm centroids
    np.testing.assert_allclose(np.linalg.norm(c1, axis=1), 1.0, atol=1e-9)


def test_neardup_clusters_transitive_and_singletons():
    from neo4j_graph_algorithms_ray.functions.dedup import neardup_clusters
    # explicit pair set with a transitive chain 10-11, 11-12 (10 and 12
    # never appear as a direct pair) plus an isolated pair 20-21
    docs = rd.from_items([{"doc_id": d, "text": f"doc {d}"} for d in
                          [10, 11, 12, 20, 21, 30]])
    pairs = rd.from_items([{"a": 10, "b": 11}, {"a": 11, "b": 12},
                           {"a": 20, "b": 21}])
    got = {r["doc_id"]: r["rep_id"]
           for r in neardup_clusters(docs, pairs).take_all()}
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30}


def test_neardup_clusters_no_pairs_identity():
    from neo4j_graph_algorithms_ray.functions.dedup import neardup_clusters
    docs = rd.from_items([{"doc_id": d, "text": f"unique {d} " * 5}
                          for d in range(4)])
    empty = rd.from_items([{"a": 1, "b": 2}]).filter(lambda r: False)
    got = {r["doc_id"]: r["rep_id"]
           for r in neardup_clusters(docs, empty).take_all()}
    assert got == {d: d for d in range(4)}


def test_neardup_clusters_minhash_end_to_end():
    from neo4j_graph_algorithms_ray.functions.dedup import neardup_clusters
    got = {r["doc_id"]: r["rep_id"] for r in neardup_clusters(_ds()).take_all()}
    # 0, 1 exact dups; 2 near-dup of both -> one cluster with rep 0
    assert got[0] == got[1] == got[2] == 0
    assert got[3] == 3 and got[4] == 4


def test_kmeans_clusters_separates_blobs():
    from neo4j_graph_algorithms_ray.functions.ann import kmeans_clusters
    rng = np.random.default_rng(7)
    a = rng.normal(0, 0.05, (40, 8)) + np.eye(8)[0]
    b = rng.normal(0, 0.05, (40, 8)) + np.eye(8)[3]
    items = [{"vec_id": i, "embedding": v.tolist()}
             for i, v in enumerate(np.vstack([a, b]))]
    ds = rd.from_items(items)
    rows = kmeans_clusters(ds, ncells=2).take_all()
    got = {r["vec_id"]: r["cluster"] for r in rows}
    ca = {got[i] for i in range(40)}
    cb = {got[i] for i in range(40, 80)}
    assert len(ca) == 1 and len(cb) == 1 and ca != cb
    # deterministic across runs
    rows2 = kmeans_clusters(ds, ncells=2).take_all()
    assert {r["vec_id"]: r["cluster"] for r in rows2} == got


def test_cluster_balanced_sample_caps_per_cluster():
    from collections import Counter

    from neo4j_graph_algorithms_ray.functions.ann import cluster_balanced_sample
    rng = np.random.default_rng(11)
    # skewed corpus: 90 vectors near axis0, 10 near axis3
    a = rng.normal(0, 0.05, (90, 8)) + np.eye(8)[0]
    b = rng.normal(0, 0.05, (10, 8)) + np.eye(8)[3]
    items = [{"vec_id": i, "embedding": v.tolist()}
             for i, v in enumerate(np.vstack([a, b]))]
    rows = cluster_balanced_sample(rd.from_items(items), per_cluster=5,
                                   ncells=2).take_all()
    per = Counter(r["cluster"] for r in rows)
    assert set(per.values()) == {5}          # balanced despite 9:1 skew
    assert len(rows) == 10


def test_neardup_scale_paths_match_small_paths(monkeypatch):
    """Force the shuffle/WCC regime (driver limits -> 0) and check the
    results are identical to the small-regime escapes."""
    import neo4j_graph_algorithms_ray.functions.dedup as dd
    from neo4j_graph_algorithms_ray.functions.dedup import (
        minhash_lsh_pairs, neardup_clusters)

    small_pairs = sorted((r["a"], r["b"], r["jaccard"])
                         for r in minhash_lsh_pairs(_ds()).take_all())
    small_reps = {r["doc_id"]: r["rep_id"]
                  for r in neardup_clusters(_ds()).take_all()}

    monkeypatch.setattr(dd, "VERIFY_DRIVER_PAIR_LIMIT", 0)
    import neo4j_graph_algorithms_ray.util as u
    monkeypatch.setattr(u, "SMALL_AGG_DRIVER_LIMIT", 0)

    big_pairs = sorted((r["a"], r["b"], r["jaccard"])
                       for r in minhash_lsh_pairs(_ds()).take_all())
    big_reps = {r["doc_id"]: r["rep_id"]
                for r in neardup_clusters(_ds()).take_all()}
    assert big_pairs == small_pairs
    assert big_reps == small_reps


def test_embedding_neardup_group_cap_fails_loudly():
    """Oversized blocks must raise (explicit quadratic-contract guard),
    not silently attempt an all-pairs comparison."""
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from neo4j_graph_algorithms_ray.functions.dedup import (
        embedding_neardup_pairs)

    n, d = 30, 4
    rng = np.random.default_rng(0)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(rng.normal(size=n * d).astype(np.float32)), d),
        "label": pa.array(np.zeros(n, dtype=np.int64)),
    })
    ds = rd.from_arrow(tbl)
    with pytest.raises((ValueError, Exception)) as ei:
        embedding_neardup_pairs(ds, group_cap=10).materialize()
    assert "group_cap" in str(ei.value)
    # under the cap it works
    out = embedding_neardup_pairs(ds, group_cap=1000).materialize()
    assert out.count() >= 0


def test_collapse_matches_direct():
    """collapse_dups (exact-dup collapse + expansion, the default) must
    produce exactly the direct computation's pairs for all three pair
    queries — including triple duplicate groups, empty-text duplicate
    groups (zero shingles), and near-dup groups of duplicated texts."""
    docs = rd.from_items([
        {"doc_id": 0, "text": BASE},
        {"doc_id": 1, "text": BASE},
        {"doc_id": 2, "text": BASE},                          # triple group
        {"doc_id": 3, "text": BASE.replace("lazy", "sleepy")},
        {"doc_id": 4, "text": BASE.replace("lazy", "sleepy")},  # dup of 3
        {"doc_id": 5, "text": ""},
        {"doc_id": 6, "text": ""},                            # empty dup group
        {"doc_id": 7, "text": "   "},                         # whitespace-only
        {"doc_id": 8, "text": "solo unrelated document nothing shared"},
    ])

    def pairset(ds, measure):
        return sorted((r["a"], r["b"], r[measure]) for r in ds.take_all())

    for fn, measure, kw in [
        (minhash_lsh_pairs, "jaccard", {"threshold": 0.5}),
        (ngram_jaccard_pairs, "jaccard", {"threshold": 0.5}),
        (simhash_pairs, "hamming", {"max_hamming": 10}),
    ]:
        got = pairset(fn(docs, collapse_dups=True, **kw), measure)
        want = pairset(fn(docs, collapse_dups=False, **kw), measure)
        assert got == want, f"{fn.__name__}: {got} != {want}"
        assert (0, 1, 1.0 if measure == "jaccard" else 0) in got


def test_ngram_distinct_df_semantics():
    """The ngram df hub-guard counts DISTINCT TEXTS, and exact
    duplicates of non-empty texts always pair at jaccard 1.0 even when
    every shingle is capped — engine and SQL oracle must agree in the
    cap-binding regime. Whitespace variants give distinct texts with
    identical shingle sets (tokens are whitespace-split)."""
    import duckdb
    import pandas as pd

    from neo4j_graph_algorithms_ray.pipelines.oracles_docs import \
        ngram_jaccard_sql

    rows = [
        {"doc_id": 0, "text": "w1 w2 w3"},     # dup group {0,1}
        {"doc_id": 1, "text": "w1 w2 w3"},
        {"doc_id": 2, "text": "w1  w2 w3"},    # distinct texts, same
        {"doc_id": 3, "text": "w1 w2  w3"},    # single shingle
        {"doc_id": 4, "text": "w1 w2 w3 "},
    ]
    docs = rd.from_items(rows)
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows))

    for cap, n_expected in [(3, 1), (4, 10)]:
        got = sorted((r["a"], r["b"], r["jaccard"])
                     for r in ngram_jaccard_pairs(docs, df_cap=cap,
                                                  threshold=0.5).take_all())
        want = sorted(tuple(t) for t in con.execute(
            ngram_jaccard_sql(df_cap=cap, threshold=0.5)).fetchall())
        assert got == want, f"cap={cap}: {got} != {want}"
        assert len(got) == n_expected
        assert (0, 1, 1.0) in got  # exact dups pair regardless of cap


def test_null_texts_never_pair():
    """Null texts normalize to '' (zero shingles): two null-text docs
    bucket-collide on all-zero signatures but must verify at jaccard 0
    — a factorize(-1) sentinel once aliased them to the LAST distinct
    text's shingle set, emitting a spurious 1.0 pair. Filler docs keep
    the duplicate fraction under the collapse gate so the direct
    verify path runs."""
    rows = [{"doc_id": 0, "text": None}, {"doc_id": 1, "text": None}]
    rows += [{"doc_id": 2 + i,
              "text": f"filler document number {i} with unique words "
                      f"alpha{i} beta{i} gamma{i}"} for i in range(58)]
    pairs = minhash_lsh_pairs(rd.from_items(rows), threshold=0.5).take_all()
    assert all(r["a"] >= 2 and r["b"] >= 2 for r in pairs), pairs


def _semantic_brute(vecs: np.ndarray, threshold: float) -> dict[int, int]:
    """Brute-force SemDeDup oracle: all-pairs cosine >= threshold,
    transitive closure, rep = min member id."""
    n = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
    sims = n @ n.T
    parent = list(range(len(vecs)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(len(vecs)):
        for j in range(i + 1, len(vecs)):
            if sims[i, j] >= threshold:
                ri, rj = find(i), find(j)
                parent[max(ri, rj)] = min(ri, rj)
    return {i: find(i) for i in range(len(vecs))}


def test_semantic_dedup_matches_brute_force_single_cell():
    from neo4j_graph_algorithms_ray.functions.ann import semantic_dedup
    rng = np.random.default_rng(3)
    base = rng.normal(0, 1.0, (12, 8))
    # three near-dup groups: 0≈12≈13, 5≈14, others singletons
    vecs = np.vstack([base, base[0] + 0.001, base[0] - 0.001,
                      base[5] * 1.01])
    ds = rd.from_items([{"vec_id": i, "embedding": v.tolist()}
                        for i, v in enumerate(vecs)])
    want = _semantic_brute(vecs, 0.999)
    rows = semantic_dedup(ds, ncells=1, threshold=0.999).take_all()
    got = {r["vec_id"]: r["rep_id"] for r in rows}
    assert got == want
    keep = {r["vec_id"] for r in rows if r["keep"]}
    assert keep == {i for i, r in want.items() if r == i}


def test_semantic_dedup_bucketed_keeps_blob_dups():
    from neo4j_graph_algorithms_ray.functions.ann import semantic_dedup
    rng = np.random.default_rng(9)
    a = rng.normal(0, 0.05, (30, 8)) + np.eye(8)[0]
    b = rng.normal(0, 0.05, (30, 8)) + np.eye(8)[3]
    # duplicate 3 vectors of each blob (perturbation ≪ blob spread)
    vecs = np.vstack([a, b, a[:3] + 1e-4, b[:3] + 1e-4])
    ds = rd.from_items([{"vec_id": i, "embedding": v.tolist()}
                        for i, v in enumerate(vecs)])
    rows = semantic_dedup(ds, ncells=2, threshold=0.9999).take_all()
    got = {r["vec_id"]: r["rep_id"] for r in rows}
    # each dup maps to its original; originals map to themselves
    for k in range(3):
        assert got[60 + k] == k
        assert got[63 + k] == 30 + k
    assert sum(1 for r in rows if not r["keep"]) == 6


def _knn_brute(v: np.ndarray, k: int) -> set[tuple[int, int]]:
    vn = v / np.linalg.norm(v, axis=1, keepdims=True)
    sims = vn @ vn.T
    np.fill_diagonal(sims, -np.inf)
    out = set()
    for i in range(len(v)):
        order = np.lexsort((np.arange(len(v)), -sims[i]))[:k]
        out |= {(i, int(j)) for j in order}
    return out


def test_knn_graph_exact_matches_brute_force():
    from neo4j_graph_algorithms_ray.functions.ann import knn_graph
    ds, v = _emb_ds()
    rows = knn_graph(ds, k=4).take_all()
    got = {(r["src"], r["dst"]) for r in rows}
    assert got == _knn_brute(v, 4)
    # per-src exactly k edges, no self loops
    from collections import Counter
    c = Counter(r["src"] for r in rows)
    assert set(c.values()) == {4}
    assert all(r["src"] != r["dst"] for r in rows)


def test_knn_graph_threshold_floor():
    from neo4j_graph_algorithms_ray.functions.ann import knn_graph
    ds, v = _emb_ds()
    rows = knn_graph(ds, k=4, threshold=0.9).take_all()
    # only the planted near-dup pair survives a 0.9 cosine floor
    assert {(r["src"], r["dst"]) for r in rows} == {(0, 1), (1, 0)}
    assert all(r["cosine"] >= 0.9 for r in rows)


def test_knn_graph_ivf_recall_and_cap():
    import pytest

    from neo4j_graph_algorithms_ray.functions.ann import knn_graph
    # two tight blobs: within-blob neighbors dominate, cells align with
    # blobs, so IVF recall vs exact is ~1 at k << blob size
    rng = np.random.default_rng(3)
    a = rng.normal(0, 0.05, (40, 8)) + np.eye(8)[0]
    b = rng.normal(0, 0.05, (40, 8)) + np.eye(8)[3]
    v = np.vstack([a, b])
    ds = rd.from_items([{"vec_id": i, "embedding": x.tolist()}
                        for i, x in enumerate(v)])
    exact = _knn_brute(v, 3)
    got = {(r["src"], r["dst"])
           for r in knn_graph(ds, k=3, ncells=2).take_all()}
    recall = len(got & exact) / len(exact)
    assert recall >= 0.95
    with pytest.raises(ValueError, match="group_cap"):
        knn_graph(ds, k=3, ncells=2, group_cap=10).take_all()


def test_knn_graph_exact_bcast_cap_fails_loudly():
    import pytest

    from neo4j_graph_algorithms_ray.functions.ann import knn_graph
    ds, _ = _emb_ds()
    with pytest.raises(ValueError, match="bcast_cap"):
        knn_graph(ds, k=2, bcast_cap=10)


def test_ngram_containment_asymmetry():
    from neo4j_graph_algorithms_ray.functions.dedup import (
        ngram_containment_pairs)
    sub = "alpha beta gamma delta epsilon"
    docs = rd.from_items([
        {"doc_id": 0, "text": sub},                               # subset
        {"doc_id": 1, "text": sub + " zeta eta theta iota kappa"},  # superset
        {"doc_id": 2, "text": "totally different words here now"},
    ])
    rows = {(r["src"], r["dst"]): r["containment"]
            for r in ngram_containment_pairs(docs, k=3,
                                             threshold=0.2).take_all()}
    # doc 0 is fully contained in doc 1 → containment(0→1) = 1.0
    assert rows[(0, 1)] == 1.0
    # reverse direction is weak: 3 of 8 shingles shared
    assert rows[(1, 0)] == round(3 / 8, 6)
    assert (0, 2) not in rows and (2, 0) not in rows


def test_ngram_containment_shuffle_regime_matches(monkeypatch):
    import neo4j_graph_algorithms_ray.functions.dedup as dd
    import neo4j_graph_algorithms_ray.util as util
    docs = rd.from_items([
        {"doc_id": i,
         "text": " ".join(f"w{(i * 5 + j) % 23}" for j in range(12))}
        for i in range(30)])
    small = {(r["src"], r["dst"]): r["containment"]
             for r in dd.ngram_containment_pairs(docs,
                                                 threshold=0.1).take_all()}
    monkeypatch.setattr(util, "SMALL_AGG_DRIVER_LIMIT", 0)
    big = {(r["src"], r["dst"]): r["containment"]
           for r in dd.ngram_containment_pairs(docs,
                                               threshold=0.1).take_all()}
    assert small == big and len(small) > 0


def test_minhash_eval_cross_checks_pair_sets():
    from neo4j_graph_algorithms_ray.functions.dedup import (
        minhash_eval, minhash_lsh_pairs, ngram_jaccard_pairs)
    # widen the corpus with mid-jaccard pairs so the sets are non-trivial
    docs = DOCS + [
        {"doc_id": 10, "text": "alpha beta gamma delta epsilon zeta eta theta"},
        {"doc_id": 11, "text": "alpha beta gamma delta epsilon zeta iota kappa"},
        {"doc_id": 12, "text": "alpha beta gamma delta mu nu xi omicron"},
    ]
    ds = rd.from_items(docs)
    thr = 0.2
    ex = {(r["a"], r["b"]) for r in
          ngram_jaccard_pairs(ds, threshold=thr).take_all()}
    ls = {(r["a"], r["b"]) for r in
          minhash_lsh_pairs(ds, threshold=thr).take_all()}
    row = minhash_eval(rd.from_items(docs), threshold=thr).iloc[0]
    assert (row.n_exact, row.n_lsh, row.n_both) == \
        (len(ex), len(ls), len(ex & ls))
    assert row.n_both <= min(row.n_exact, row.n_lsh)
    assert abs(row.recall - len(ex & ls) / len(ex)) < 5e-7
    assert abs(row.precision - len(ex & ls) / len(ls)) < 5e-7
    # LSH-verified pairs all satisfy the exact threshold, so on a
    # corpus whose dfs stay under the hub cap they are a subset
    assert ls <= ex and row.precision == 1.0


def test_embedding_gram_and_pca_match_numpy():
    import numpy as np

    from neo4j_graph_algorithms_ray.functions.ann import (embedding_gram,
                                                          embedding_pca)
    rng = np.random.default_rng(4)
    X = rng.normal(size=(120, 6))
    # stretch one direction so the spectrum is non-flat
    X[:, 0] *= 3
    emb = rd.from_items([
        {"vec_id": i,
         "embedding": [float(v) for v in X[i].astype("float32")]}
        for i in range(len(X))])
    Xf = X.astype("float32").astype("float64")
    G = Xf.T @ Xf
    rows = embedding_gram(emb).take_all()
    assert len(rows) == 6 * 7 // 2
    for r in rows:
        assert abs(r["g"] - G[r["i"] - 1, r["j"] - 1]) < 5e-6
    cov = G / len(X) - np.outer(Xf.mean(0), Xf.mean(0))
    ev = np.linalg.eigvalsh(cov)[::-1]
    df = embedding_pca(emb, topk=3)
    got = df["eigenvalue"].to_numpy()
    # round6 on the gram + mean round6 perturb the eigenvalues slightly
    assert np.allclose(got, ev[:3], atol=1e-4)
    assert df["explained_ratio"].iloc[0] > 0.5  # the stretched direction


def test_pq_encode_reconstruction():
    import numpy as np
    import ray.data as rd

    from neo4j_graph_algorithms_ray.functions.ann import (pq_encode,
                                                          pq_train_codebooks)
    rng = np.random.default_rng(7)
    # 3 well-separated planted clusters per subspace → PQ should hit
    # near-zero reconstruction error with k=4
    base = rng.normal(0, 0.01, size=(120, 16))
    centers = np.repeat(np.array([[0.0], [5.0], [-5.0]]), 40, axis=0)
    vecs = base + centers  # all 16 dims shifted per planted cluster
    items = [{"vec_id": i, "embedding": vecs[i].astype("float32").tolist()}
             for i in range(len(vecs))]
    ds = rd.from_items(items)
    out = {r["vec_id"]: r for r in pq_encode(ds, m=4, k=4).take_all()}
    assert len(out) == 120
    errs = np.array([out[i]["recon_err"] for i in range(120)])
    # planted structure: reconstruction error far below raw norm (~400)
    assert errs.mean() < 1.0
    assert all(len(out[i]["codes"]) == 4 for i in range(120))
    # determinism: same input → same codes
    out2 = {r["vec_id"]: r for r in pq_encode(ds, m=4, k=4).take_all()}
    assert all(out[i]["codes"] == out2[i]["codes"] for i in range(120))
    # codebooks shape
    books = pq_train_codebooks(ds, m=4, k=4)
    assert books.shape == (4, 4, 4)


def test_pq_encode_dim_mismatch_raises():
    import pytest
    import ray.data as rd

    from neo4j_graph_algorithms_ray.functions.ann import pq_train_codebooks
    ds = rd.from_items([{"vec_id": 0, "embedding": [1.0] * 10}])
    with pytest.raises(ValueError):
        pq_train_codebooks(ds, m=4, k=2)


def test_incremental_dedup_exact_and_bloom_parity():
    import ray.data as rd

    from neo4j_graph_algorithms_ray.functions.dedup import incremental_dedup
    old = rd.from_items([
        {"doc_id": 1, "text": "the old corpus document"},
        {"doc_id": 2, "text": "  Shared   Text  "},   # normalizes
        {"doc_id": 3, "text": "another old one"},
    ])
    new = rd.from_items([
        {"doc_id": 10, "text": "shared text"},         # dup of 2 (normalized)
        {"doc_id": 11, "text": "a genuinely new doc"},
        {"doc_id": 12, "text": "the old corpus document"},  # dup of 1
        {"doc_id": 13, "text": "shared  TEXT"},        # dup of 2 too
        {"doc_id": 14, "text": "fresh content here"},
    ])
    kept = sorted(r["doc_id"]
                  for r in incremental_dedup(new, old).take_all())
    assert kept == [11, 14]
    # prefilter disabled (limit 0 -> straight anti-join): same output
    kept2 = sorted(r["doc_id"] for r in incremental_dedup(
        new, old, bloom_limit_bits=0).take_all())
    assert kept2 == kept
