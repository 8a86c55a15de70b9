"""Approximate-nearest-neighbor search over an embedding column.

- ``brute_force_topk``: exact cosine top-k — numpy matmul per batch
  against a broadcast query matrix (ray.put once, read per task). The
  baseline, and the verifier for the approximate variants.
- ``lsh_topk``: random-hyperplane LSH bucketing — a scale path:
  candidates restricted to query-colliding buckets (multi-probe over
  bands), exact re-rank inside. Deterministic planes from a pinned seed.
- ``ivf_topk``: inverted-file (IVF) cells — the other scale path:
  spherical k-means centroids trained on a deterministic hash sample
  (driver holds ncells×dim floats, never the corpus), vectors assigned
  to their nearest cell per batch, each query searching only its
  ``nprobe`` nearest cells with exact re-rank inside.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from neo4j_graph_algorithms_ray.functions.text import round6


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _vec_matrix(col) -> np.ndarray:
    """(n, d) float64 matrix from an Arrow ``list<float>`` column — one
    flattened-values reshape (zero-copy from the block for non-null
    fixed-width lists) instead of a per-row object stack."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros((0, 0), dtype=np.float64)
    vals = col.flatten().to_numpy(zero_copy_only=False)
    return vals.reshape(n, -1).astype(np.float64, copy=False)


def _empty_topk() -> pd.DataFrame:
    """Typed empty partial for zero-row blocks — a (0, 0) vector matrix
    would otherwise crash the query matmul with a dim mismatch."""
    return pd.DataFrame({"query_id": np.empty(0, np.int64),
                         "vec_id": np.empty(0, np.int64),
                         "cosine": np.empty(0, np.float64)})


def brute_force_topk(emb: rd.Dataset, queries: np.ndarray, query_ids: np.ndarray,
                     k: int = 10, *, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     exclude_self: bool = True) -> rd.Dataset:
    """(query_id, vec_id, cosine) top-k per query; ties broken by vec_id.

    Per-batch partial top-k (numpy matmul against the broadcast query
    matrix) then a final tiny per-query merge — only n_queries × k rows
    per batch cross the cluster, never the full similarity matrix."""
    qm = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put((qm, np.asarray(query_ids, dtype=np.int64)))

    def partial(batch: pa.Table) -> pd.DataFrame:
        if batch.num_rows == 0:
            return _empty_topk()
        qmat, qids = ray.get(q_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        m = _normalize(_vec_matrix(batch[vec_col]))
        sims = qmat @ m.T  # (Q, B)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(qids)):
            s = sims[qi]
            mask = np.ones(len(ids), dtype=bool)
            if exclude_self:
                mask &= ids != qids[qi]
            order = np.lexsort((ids[mask], -s[mask]))[:k]
            sel = np.nonzero(mask)[0][order]
            out_q.append(np.full(len(sel), qids[qi]))
            out_v.append(ids[sel])
            out_s.append(s[sel])
        return pd.DataFrame({"query_id": np.concatenate(out_q),
                             "vec_id": np.concatenate(out_v),
                             "cosine": np.concatenate(out_s)})

    from neo4j_graph_algorithms_ray.util import to_arrow_blocks
    partials = to_arrow_blocks(emb.map_batches(partial, batch_format="pyarrow"))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        g = g.copy()
        g["cosine"] = round6(g["cosine"].to_numpy())
        return g

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def ivf_train_centroids(emb: rd.Dataset, ncells: int = 64, *,
                        sample: int = 65536, iters: int = 10,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        seed: int = 42) -> np.ndarray:
    """Spherical k-means centroids for IVF, trained on a deterministic
    hash sample of the corpus (rows whose ``hash(id) % stride == 0``) —
    the training boundary is ``sample`` vectors on the driver, never the
    corpus. Init = first ncells sampled vectors (hash order), ``iters``
    Lloyd rounds with L2-renormalized means (cosine geometry); empty
    cells re-seeded from the farthest-assigned points."""
    n = emb.count()
    stride = max(1, n // max(1, sample))

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        keep = (pd.util.hash_array(np.asarray(ids)) % np.uint64(stride)) == 0
        return batch.filter(pa.array(keep))

    rows = emb.map_batches(pick, batch_format="pyarrow").take_all()
    if not rows:
        rows = emb.limit(max(ncells, 1)).take_all()
    m = _normalize(np.stack([np.asarray(r[vec_col], dtype=np.float64)
                             for r in rows]))
    order = np.argsort([r[id_col] for r in rows])
    m = m[order]
    ncells = min(ncells, len(m))
    cents = m[:ncells].copy()
    for _ in range(iters):
        sims = m @ cents.T
        assign = sims.argmax(axis=1)
        for c in range(ncells):
            sel = assign == c
            if sel.any():
                cents[c] = m[sel].sum(axis=0)
            else:
                # re-seed an empty cell from the overall worst-served point
                cents[c] = m[sims.max(axis=1).argmin()]
        cents = _normalize(cents)
    return cents


def ivf_topk(emb: rd.Dataset, queries: np.ndarray, query_ids: np.ndarray,
             k: int = 10, *, ncells: int = 64, nprobe: int = 8,
             centroids: np.ndarray | None = None,
             id_col: str = "vec_id", vec_col: str = "embedding",
             exclude_self: bool = True, seed: int = 42) -> rd.Dataset:
    """IVF-cell ANN: each vector belongs to its nearest centroid's cell;
    a query searches only its ``nprobe`` nearest cells, with exact
    cosine re-rank inside. Same output schema/tie-break contract as
    :func:`brute_force_topk`; recall measured in tests (no SQL oracle —
    the k-means training is not SQL-expressible, unlike the md5-pinned
    LSH planes).

    Scale shape: centroids are ncells×dim floats broadcast once; the
    per-batch work is one matmul for assignment + one masked matmul for
    scoring; only n_queries×k rows leave each batch. A persisted-index
    deployment would store ``cell`` as a partition column and prune
    whole files at the read — here assignment is recomputed per batch
    to keep the operator input a bare embedding table."""
    if centroids is None:
        centroids = ivf_train_centroids(emb, ncells, id_col=id_col,
                                        vec_col=vec_col, seed=seed)
    cents = np.asarray(centroids, dtype=np.float64)
    qm = _normalize(np.asarray(queries, dtype=np.float64))
    nprobe = min(nprobe, len(cents))
    # (Q, ncells) probe mask: each query's nprobe nearest cells
    qcell = np.argsort(-(qm @ cents.T), axis=1)[:, :nprobe]
    probe_mask = np.zeros((len(qm), len(cents)), dtype=bool)
    np.put_along_axis(probe_mask, qcell, True, axis=1)
    state = ray.put((cents, qm, np.asarray(query_ids, dtype=np.int64),
                     probe_mask))

    def partial(batch: pa.Table) -> pd.DataFrame:
        if batch.num_rows == 0:
            return _empty_topk()
        cts, qmat, qids, pmask = ray.get(state)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        m = _normalize(_vec_matrix(batch[vec_col]))
        cell = (m @ cts.T).argmax(axis=1)
        cand = pmask[:, cell].any(axis=0)
        ids, m, cell = ids[cand], m[cand], cell[cand]
        if not len(ids):
            return pd.DataFrame({"query_id": np.empty(0, np.int64),
                                 "vec_id": np.empty(0, np.int64),
                                 "cosine": np.empty(0)})
        sims = qmat @ m.T  # (Q, B)
        allowed = pmask[:, cell]  # (Q, B)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(qids)):
            mask = allowed[qi].copy()
            if exclude_self:
                mask &= ids != qids[qi]
            s = sims[qi]
            order = np.lexsort((ids[mask], -s[mask]))[:k]
            sel = np.nonzero(mask)[0][order]
            out_q.append(np.full(len(sel), qids[qi]))
            out_v.append(ids[sel])
            out_s.append(s[sel])
        return pd.DataFrame({"query_id": np.concatenate(out_q),
                             "vec_id": np.concatenate(out_v),
                             "cosine": np.concatenate(out_s)})

    from neo4j_graph_algorithms_ray.util import to_arrow_blocks
    partials = to_arrow_blocks(emb.map_batches(partial, batch_format="pyarrow"))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        g = g.copy()
        g["cosine"] = round6(g["cosine"].to_numpy())
        return g

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def _md5_planes(nbits: int, dim: int) -> np.ndarray:
    """Deterministic ±1 (Rademacher) projection planes pinned to md5 —
    sign(first hex digit of md5("plane:b:j")) — so a DuckDB oracle can
    reproduce the bucketing bit-for-bit (same trick as the minhash /
    simhash sketches)."""
    import hashlib
    signs = np.empty((nbits, dim), dtype=np.float64)
    for b in range(nbits):
        for j in range(dim):
            h = int(hashlib.md5(f"plane:{b}:{j}".encode()).hexdigest()[0], 16)
            signs[b, j] = 1.0 if h % 2 == 1 else -1.0
    return signs


def lsh_topk(emb: rd.Dataset, queries: np.ndarray, query_ids: np.ndarray,
             k: int = 10, *, nbits: int = 12, seed: int = 42,
             plane_mode: str = "md5",
             id_col: str = "vec_id", vec_col: str = "embedding",
             exclude_self: bool = True) -> rd.Dataset:
    """LSH-bucketed ANN: sign-random-projection code per vector;
    candidates = vectors whose code is within hamming 1 of any query's
    (multi-probe); exact cosine re-rank. Returns the same schema as
    brute_force_topk; recall measured in tests.

    ``plane_mode="md5"`` (default) uses deterministic ±1 planes the SQL
    oracle replicates; ``"gaussian"`` uses seed-pinned N(0,1) planes."""
    dim = len(np.asarray(queries)[0])
    if plane_mode == "md5":
        planes = _md5_planes(nbits, dim)
    else:
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((nbits, dim))
    qm = _normalize(np.asarray(queries, dtype=np.float64))
    qcodes = (qm @ planes.T > 0).astype(np.uint64)
    qcode_int = (qcodes << np.arange(nbits, dtype=np.uint64)).sum(axis=1)
    # multi-probe: query code + all 1-bit flips
    probe = {int(c) for c in qcode_int}
    for c in qcode_int:
        for b in range(nbits):
            probe.add(int(c) ^ (1 << b))
    state = ray.put((planes, qm, np.asarray(query_ids, dtype=np.int64),
                     np.array(sorted(probe), dtype=np.uint64)))

    def partial(batch: pa.Table) -> pd.DataFrame:
        if batch.num_rows == 0:
            return _empty_topk()
        pl, qmat, qids, probes = ray.get(state)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        m = _normalize(_vec_matrix(batch[vec_col]))
        codes = ((m @ pl.T > 0).astype(np.uint64)
                 << np.arange(pl.shape[0], dtype=np.uint64)).sum(axis=1)
        cand = np.isin(codes, probes)
        ids, m = ids[cand], m[cand]
        if not len(ids):
            return pd.DataFrame({"query_id": np.empty(0, np.int64),
                                 "vec_id": np.empty(0, np.int64),
                                 "cosine": np.empty(0)})
        sims = qmat @ m.T
        out_q, out_v, out_s = [], [], []
        for qi in range(len(qids)):
            s = sims[qi]
            mask = np.ones(len(ids), dtype=bool)
            if exclude_self:
                mask &= ids != qids[qi]
            order = np.lexsort((ids[mask], -s[mask]))[:k]
            sel = np.nonzero(mask)[0][order]
            out_q.append(np.full(len(sel), qids[qi]))
            out_v.append(ids[sel])
            out_s.append(s[sel])
        return pd.DataFrame({"query_id": np.concatenate(out_q),
                             "vec_id": np.concatenate(out_v),
                             "cosine": np.concatenate(out_s)})

    from neo4j_graph_algorithms_ray.util import to_arrow_blocks
    partials = to_arrow_blocks(emb.map_batches(partial, batch_format="pyarrow"))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        g = g.copy()
        g["cosine"] = round6(g["cosine"].to_numpy())
        return g

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def kmeans_clusters(emb: rd.Dataset, ncells: int = 16, *,
                    sample: int = 65536, iters: int = 10,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> rd.Dataset:
    """Corpus clustering over an embedding column → (id, cluster, sim):
    every vector assigned to its nearest spherical-k-means centroid
    (cosine), sim = similarity to the centroid (round6). The curation
    primitive behind topic bucketing / diversity analysis of a corpus.

    Scale shape: centroids are trained on a deterministic hash sample
    (ivf_train_centroids — driver holds ``sample`` vectors, never the
    corpus), broadcast once via ``ray.put``, and assignment is one
    matmul per batch. No shuffle at all.
    """
    cents = ivf_train_centroids(emb, ncells, sample=sample, iters=iters,
                                id_col=id_col, vec_col=vec_col)
    cref = ray.put(cents)

    def assign(batch: pa.Table) -> pd.DataFrame:
        if batch.num_rows == 0:
            return pd.DataFrame({id_col: np.empty(0, np.int64),
                                 "cluster": np.empty(0, np.int64),
                                 "sim": np.empty(0, np.float64)})
        c = ray.get(cref)
        m = _normalize(_vec_matrix(batch[vec_col]))
        sims = m @ c.T
        a = sims.argmax(axis=1)
        return pd.DataFrame({id_col: batch[id_col].to_numpy(zero_copy_only=False),
                             "cluster": a.astype(np.int64),
                             "sim": round6(sims[np.arange(len(a)), a])})

    return emb.map_batches(assign, batch_format="pyarrow")


def cluster_balanced_sample(emb: rd.Dataset, per_cluster: int = 10, *,
                            ncells: int = 16, id_col: str = "vec_id",
                            vec_col: str = "embedding") -> rd.Dataset:
    """Diversity-preserving subsample: the ``per_cluster`` vectors
    closest to each k-means centroid (ties → lower id). Bounds every
    topic's representation — the standard antidote to head-heavy web
    corpora. Per-batch top-k partials keep the shuffle at
    O(ncells · per_cluster · nblocks) rows, then one tiny per-cluster
    merge."""
    assigned = kmeans_clusters(emb, ncells, id_col=id_col, vec_col=vec_col)

    def partial_top(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.sort_values(["cluster", "sim", id_col],
                              ascending=[True, False, True])
        return b.groupby("cluster", sort=False).head(per_cluster)

    part = assigned.map_batches(partial_top, batch_format="pandas")
    return part.groupby("cluster").map_groups(
        lambda g: g.sort_values(["sim", id_col], ascending=[False, True])
                   .head(per_cluster),
        batch_format="pandas")


def semantic_dedup(emb: rd.Dataset, *, ncells: int = 16,
                   threshold: float = 0.95, sample: int = 65536,
                   iters: int = 10, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   group_cap: int = 100_000) -> rd.Dataset:
    """SemDeDup-style embedding-space dedup (Abbas et al. 2023):
    spherical k-means buckets the corpus, cosine pairs ≥ ``threshold``
    are generated ONLY within a bucket, and the pair graph's transitive
    closure elects one representative (min id) per duplicate group →
    ``(id, rep_id, keep)`` for every vector; ``keep`` rows ARE the
    deduplicated corpus.

    Scale shape: centroids train on a driver-bounded hash sample and
    broadcast once (``ray.put``); assignment is one matmul per batch
    (no shuffle); the quadratic cosine compare is confined to a k-means
    cell (``group_cap`` raises loudly on an oversized cell — re-bucket
    with more cells, same contract as embedding_neardup_pairs); the
    closure runs over the sparse PAIR graph (neardup_clusters), never
    the corpus.
    """
    from neo4j_graph_algorithms_ray.functions.dedup import (
        embedding_neardup_pairs, neardup_clusters)
    import pyarrow.compute as pc

    if ncells <= 1:
        # single cell = exact all-pairs semantics; skip centroid training
        def assign(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "cluster", pa.array(np.zeros(batch.num_rows, np.int64)))
    else:
        cents = ivf_train_centroids(emb, ncells, sample=sample, iters=iters,
                                    id_col=id_col, vec_col=vec_col)
        cref = ray.put(cents)

        def assign(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch.append_column("cluster", pa.array([], pa.int64()))
            c = ray.get(cref)
            a = (_normalize(_vec_matrix(batch[vec_col])) @ c.T).argmax(axis=1)
            return batch.append_column("cluster", pa.array(a.astype(np.int64)))

    tagged = emb.map_batches(assign, batch_format="pyarrow")
    pairs = embedding_neardup_pairs(tagged, threshold=threshold,
                                    id_col=id_col, vec_col=vec_col,
                                    block_col="cluster", group_cap=group_cap)
    reps = neardup_clusters(emb.select_columns([id_col]), pairs,
                            id_col=id_col)
    return reps.map_batches(
        lambda b: b.append_column("keep", pc.equal(b[id_col], b["rep_id"])),
        batch_format="pyarrow")


def knn_graph(emb: rd.Dataset, k: int = 10, *, ncells: int | None = None,
              threshold: float | None = None, id_col: str = "vec_id",
              vec_col: str = "embedding", bcast_cap: int = 65536,
              group_cap: int = 100_000, seed: int = 42) -> rd.Dataset:
    """k-nearest-neighbor GRAPH over the embedding column: one edge
    (src, dst, cosine) per vector to each of its k most-similar other
    vectors (ties by dst asc; optional cosine ``threshold`` floor).
    The bridge from the vector half of the engine to the graph half —
    feed the result to ``build_graph`` and any graph algorithm
    (WCC = embedding clusters, PageRank = centrality in semantic
    space, label propagation = semi-supervised tagging).

    Two regimes, one contract:

    - ``ncells=None`` (exact): the id-sorted corpus matrix broadcasts
      once via ``ray.put`` and every batch does one matmul against it.
      Loudly capped at ``bcast_cap`` vectors — the exact path's cost
      is corpus-in-worker-heap, which stops being true at web scale.
    - ``ncells=N`` (IVF, the scale path): spherical-k-means cells train
      on a driver-bounded hash sample (``ivf_train_centroids``),
      vectors assign to their nearest cell per batch (one matmul, no
      shuffle), and neighbors are searched within the cell —
      ``group_cap`` raises on an oversized cell (re-bucket with more
      cells), the embedding_neardup_pairs contract. Approximate near
      cell boundaries; recall vs exact is pinned in pytest.
    """
    from neo4j_graph_algorithms_ray.util import collect_arrow

    def _topk_rows(ids_q: np.ndarray, sims: np.ndarray,
                   ids_c: np.ndarray) -> pa.Table:
        """Per-row top-k of a (B, N) sims matrix, self excluded,
        dst-asc tie-break via stable argsort over the id-sorted axis."""
        pos = np.searchsorted(ids_c, ids_q)
        pos = np.clip(pos, 0, len(ids_c) - 1)
        self_row = ids_c[pos] == ids_q
        sims[np.nonzero(self_row)[0], pos[self_row]] = -np.inf
        kk = min(k, sims.shape[1] - 1) if sims.shape[1] > 1 else 0
        if kk <= 0:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        order = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
        cos = np.take_along_axis(sims, order, axis=1)
        keep = np.isfinite(cos)
        if threshold is not None:
            keep &= cos >= threshold
        src = np.repeat(ids_q, kk).reshape(-1, kk)
        return pa.table({"src": pa.array(src[keep].astype(np.int64)),
                         "dst": pa.array(ids_c[order][keep].astype(np.int64)),
                         "cosine": pa.array(round6(cos[keep]))})

    if ncells is None:
        n = emb.count()
        if n > bcast_cap:
            raise ValueError(
                f"knn_graph exact path: {n} vectors > bcast_cap="
                f"{bcast_cap}; pass ncells= for the IVF regime")
        tabs = [t for t in collect_arrow(
            emb.select_columns([id_col, vec_col])) if t.num_rows]
        if not tabs:
            return rd.from_arrow(pa.table(
                {"src": pa.array([], pa.int64()),
                 "dst": pa.array([], pa.int64()),
                 "cosine": pa.array([], pa.float64())}))
        tab = pa.concat_tables(tabs)
        ids_c = tab[id_col].to_numpy(zero_copy_only=False)
        order = np.argsort(ids_c, kind="stable")
        ids_c = ids_c[order]
        mat = _normalize(_vec_matrix(tab[vec_col]))[order]
        corpus_ref = ray.put((ids_c, mat))

        def partial(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({"src": pa.array([], pa.int64()),
                                 "dst": pa.array([], pa.int64()),
                                 "cosine": pa.array([], pa.float64())})
            cids, cmat = ray.get(corpus_ref)
            ids_q = batch[id_col].to_numpy(zero_copy_only=False)
            sims = _normalize(_vec_matrix(batch[vec_col])) @ cmat.T
            return _topk_rows(ids_q, sims, cids)

        # batch × corpus sims matrix: 512 × bcast_cap × 8B ≤ 256 MB
        return emb.map_batches(partial, batch_format="pyarrow",
                               batch_size=512)

    cents = _normalize(ivf_train_centroids(
        emb, ncells, id_col=id_col, vec_col=vec_col, seed=seed))
    c_ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("_cell",
                                       pa.array([], pa.int64()))
        cell = np.argmax(_normalize(_vec_matrix(batch[vec_col]))
                         @ ray.get(c_ref).T, axis=1).astype(np.int64)
        return batch.append_column("_cell", pa.array(cell))

    def pergroup(g: pd.DataFrame) -> pa.Table:
        if len(g) > group_cap:
            raise ValueError(
                f"knn_graph: cell {g['_cell'].iloc[0]} has {len(g)} "
                f"vectors > group_cap={group_cap}; raise ncells")
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        m = _normalize(np.stack(g[vec_col].to_numpy()).astype(np.float64))
        return _topk_rows(ids, m @ m.T, ids)

    return emb.select_columns([id_col, vec_col]) \
        .map_batches(assign, batch_format="pyarrow") \
        .groupby("_cell").map_groups(pergroup, batch_format="pandas")


def embedding_dim_stats(emb, *, vec_col: str = "embedding"):
    """Per-dimension mean / population-std over an embedding column →
    (dim, mean, std), dim 1-based — the drift/hygiene report run before
    trusting a vector corpus (dead dims, scale skew, normalization
    checks).

    Scale shape: per-batch fixed-size (D × [sum, sumsq, n]) partials
    (one reshape + two vectorized reductions per batch) into a
    map-side-combined groupby; only the D-row moment table reaches the
    finalize. Zero-copy Arrow list flatten, float64 accumulation."""
    import numpy as np
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.util import preagg_sum

    def partial(b: pa.Table) -> pa.Table:
        col = b[vec_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten()
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        x = flat.to_numpy(zero_copy_only=False).astype(np.float64)
        n = b.num_rows
        if n == 0 or len(x) == 0:
            return pa.table({"dim": pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64()),
                             "ss": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        d = len(x) // n
        m = x.reshape(n, d)
        return pa.table({"dim": pa.array(np.arange(1, d + 1)),
                         "s": pa.array(m.sum(axis=0)),
                         "ss": pa.array((m * m).sum(axis=0)),
                         "n": pa.array(np.full(d, n, np.int64))})

    agg = preagg_sum(emb.select_columns([vec_col]).map_batches(
        partial, batch_format="pyarrow"), ["dim"], ["s", "ss", "n"])

    def finish(b: pa.Table) -> pa.Table:
        s = b["s"].to_numpy(zero_copy_only=False)
        ss = b["ss"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        mean = s / n
        var = np.maximum(ss / n - mean * mean, 0.0)
        r6 = lambda v: np.copysign(np.floor(np.abs(v) * 1e6 + 0.5), v) / 1e6
        return pa.table({"dim": b["dim"],
                         "mean": pa.array(r6(mean)),
                         "std": pa.array(r6(np.sqrt(var)))})

    return agg.map_batches(finish, batch_format="pyarrow")


def embedding_gram(emb, *, vec_col: str = "embedding"):
    """Distributed Gram matrix XᵀX over the embedding column — the
    linear-algebra partial behind PCA / whitening / covariance drift:
    each batch contributes one D×D matmul, partials combine through the
    (i, j)-keyed map-side tree, and only the D(D+1)/2 upper-triangle
    rows (i ≤ j, 1-based, round6) ever reach the driver. The
    eigen-step runs driver-side on the tiny result (see
    ``embedding_pca``); the data-sized work is all here.

    Returns (i, j, g) sorted by (i, j)."""
    import numpy as np
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.util import preagg_sum

    def partial(b: pa.Table) -> pa.Table:
        col = b[vec_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten()
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        x = flat.to_numpy(zero_copy_only=False).astype(np.float64)
        n = b.num_rows
        if n == 0 or len(x) == 0:
            return pa.table({"i": pa.array([], pa.int64()),
                             "j": pa.array([], pa.int64()),
                             "g": pa.array([], pa.float64())})
        d = len(x) // n
        m = x.reshape(n, d)
        gram = m.T @ m
        iu, ju = np.triu_indices(d)
        return pa.table({"i": pa.array(iu + 1), "j": pa.array(ju + 1),
                         "g": pa.array(gram[iu, ju])})

    agg = preagg_sum(emb.select_columns([vec_col]).map_batches(
        partial, batch_format="pyarrow"), ["i", "j"], "g")

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({"i": b["i"], "j": b["j"],
                         "g": pa.array(round6(
                             b["g"].to_numpy(zero_copy_only=False)))})

    return agg.map_batches(finish, batch_format="pyarrow").sort(["i", "j"])


def embedding_pca(emb, *, vec_col: str = "embedding", topk: int = 8):
    """Top-``topk`` PCA explained-variance ratios from the distributed
    Gram matrix: the D×D covariance assembles from ``embedding_gram``'s
    partials plus the per-dimension means, and the eigendecomposition
    runs on the driver (D² floats — microscopic next to the corpus).
    Returns (component, eigenvalue, explained_ratio) — pytest-pinned
    (eigensolves have no SQL mirror)."""
    import numpy as np
    import pandas as pd_

    rows = embedding_gram(emb, vec_col=vec_col).take_all()
    if not rows:
        return pd_.DataFrame(columns=["component", "eigenvalue",
                                      "explained_ratio"])
    d = max(r["j"] for r in rows)
    G = np.zeros((d, d))
    for r in rows:
        G[r["i"] - 1, r["j"] - 1] = r["g"]
        G[r["j"] - 1, r["i"] - 1] = r["g"]
    stats = embedding_dim_stats(emb, vec_col=vec_col).take_all()
    mean = np.zeros(d)
    n = 0
    for r in stats:
        mean[r["dim"] - 1] = r["mean"]
        n = r["n"] if "n" in r else n
    # embedding_dim_stats drops n from its output; recount cheaply
    n = emb.count()
    cov = G / n - np.outer(mean, mean)
    ev = np.linalg.eigvalsh(cov)[::-1]
    tot = float(ev.sum()) or 1.0
    k = min(topk, d)
    return pd_.DataFrame({
        "component": np.arange(1, k + 1),
        "eigenvalue": ev[:k],
        "explained_ratio": ev[:k] / tot})


def embedding_quantize_report(emb, *, vec_col: str = "embedding"):
    """Symmetric int8 quantization audit: per dimension its scale
    (corpus max |v|) and the mean absolute reconstruction error of
    q = round(v / scale * 127) — the decide-before-you-compress report
    for a vector store. Returns (dim, scale, mae), round6.

    Scale shape: two streaming passes — a per-dim max-abs reduce
    (map-side ``preagg_max``), scales broadcast once via ``ray.put``,
    then per-dim absolute-error sum partials. Rounding is
    half-away-from-zero to match the SQL mirror."""
    import pyarrow.compute as pc

    from neo4j_graph_algorithms_ray.util import preagg_max, preagg_sum

    def _mat(b: pa.Table):
        col = b[vec_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten()
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        x = flat.to_numpy(zero_copy_only=False).astype(np.float64)
        n = b.num_rows
        return (x.reshape(n, len(x) // n) if n and len(x) else
                np.zeros((0, 0)))

    def max_partial(b: pa.Table) -> pa.Table:
        m = _mat(b)
        if m.size == 0:
            return pa.table({"dim": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.float64())})
        return pa.table({"dim": pa.array(np.arange(1, m.shape[1] + 1)),
                         "mx": pa.array(np.abs(m).max(axis=0))})

    sel = emb.select_columns([vec_col])
    mx = preagg_max(sel.map_batches(max_partial, batch_format="pyarrow"),
                    ["dim"], "mx").take_all()
    d = len(mx)
    scales = np.zeros(d)
    for r in mx:
        scales[r["dim"] - 1] = r["mx"]
    scale_ref = ray.put(scales)

    def err_partial(b: pa.Table) -> pa.Table:
        sc = ray.get(scale_ref)
        m = _mat(b)
        if m.size == 0:
            return pa.table({"dim": pa.array([], pa.int64()),
                             "ae": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        s = np.where(sc > 0, sc, 1.0)
        q = pc.round(pa.array((m / s * 127.0).ravel()), ndigits=0,
                     round_mode="half_towards_infinity") \
            .to_numpy(zero_copy_only=False).reshape(m.shape)
        q = np.clip(q, -127, 127)
        err = np.abs(m - q * s / 127.0)
        return pa.table({"dim": pa.array(np.arange(1, m.shape[1] + 1)),
                         "ae": pa.array(err.sum(axis=0)),
                         "n": pa.array(np.full(m.shape[1], m.shape[0],
                                               np.int64))})

    agg = preagg_sum(sel.map_batches(err_partial, batch_format="pyarrow"),
                     ["dim"], ["ae", "n"])

    def finish(b: pa.Table) -> pa.Table:
        sc = scales[b["dim"].to_numpy(zero_copy_only=False) - 1]
        ae = b["ae"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"dim": b["dim"],
                         "scale": pa.array(round6(sc)),
                         "mae": pa.array(round6(ae / n))})

    return agg.map_batches(finish, batch_format="pyarrow").sort("dim")


def ann_recall_report(exact_topk: rd.Dataset, approx_topk: rd.Dataset,
                      *, k: int = 10) -> rd.Dataset:
    """Per-query recall@k of an approximate top-k result against the
    brute-force ground truth → (query_id, n_hit, k, recall) — the
    index-quality eval run before trusting an ANN structure at corpus
    scale. Both inputs are (query_id, vec_id, ...) top-k Datasets.

    Scale shape: flagged union → (query, vec)-keyed ``preagg_sum`` →
    per-query hit counts; the top-k lists are already tiny (Q×k), the
    shape just keeps the comparison driver-free."""
    from neo4j_graph_algorithms_ray.functions.text import round6
    from neo4j_graph_algorithms_ray.util import preagg_sum

    def flag(col):
        def f(b: pa.Table) -> pa.Table:
            one = np.ones(b.num_rows, np.int64)
            z = np.zeros(b.num_rows, np.int64)
            return pa.table({"query_id": b["query_id"],
                             "vec_id": b["vec_id"],
                             "in_e": pa.array(one if col == "e" else z),
                             "in_a": pa.array(one if col == "a" else z)})
        return f

    u = exact_topk.select_columns(["query_id", "vec_id"]) \
        .map_batches(flag("e"), batch_format="pyarrow") \
        .union(approx_topk.select_columns(["query_id", "vec_id"])
               .map_batches(flag("a"), batch_format="pyarrow"))
    m = preagg_sum(u, ["query_id", "vec_id"], ["in_e", "in_a"])

    def per_query(b: pa.Table) -> pa.Table:
        e = b["in_e"].to_numpy(zero_copy_only=False) > 0
        a = b["in_a"].to_numpy(zero_copy_only=False) > 0
        t = pa.table({"query_id": b["query_id"],
                      "n_hit": pa.array((e & a).astype(np.int64))})
        return t.group_by(["query_id"]).aggregate([("n_hit", "sum")]) \
                .rename_columns(["query_id", "n_hit"])

    hits = preagg_sum(m.map_batches(per_query, batch_format="pyarrow"),
                      ["query_id"], "n_hit")

    def finish(b: pa.Table) -> pa.Table:
        nh = b["n_hit"].to_numpy(zero_copy_only=False)
        return pa.table({"query_id": b["query_id"], "n_hit": b["n_hit"],
                         "k": pa.array(np.full(len(nh), k, np.int64)),
                         "recall": pa.array(round6(nh / float(k)))})

    return hits.map_batches(finish, batch_format="pyarrow").sort("query_id")


def pq_train_codebooks(emb: rd.Dataset, m: int = 4, k: int = 16, *,
                       sample: int = 65536, iters: int = 10,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> np.ndarray:
    """Product-quantization codebooks (Jegou et al. 2011): split each
    vector into ``m`` contiguous subspaces and train ``k`` L2 k-means
    centroids per subspace on the SAME deterministic hash sample as
    ivf_train_centroids — the driver holds ``sample`` vectors, never
    the corpus. Init = first k sampled subvectors (id order), Lloyd
    rounds with plain means (L2 geometry — PQ quantizes raw
    subvectors, unlike the spherical IVF codebook); empty cells
    re-seeded from the worst-served point. Returns (m, k, dim/m)."""
    n = emb.count()
    stride = max(1, n // max(1, sample))

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        keep = (pd.util.hash_array(np.asarray(ids)) % np.uint64(stride)) == 0
        return batch.filter(pa.array(keep))

    rows = emb.map_batches(pick, batch_format="pyarrow").take_all()
    if not rows:
        rows = emb.limit(max(k, 1)).take_all()
    mat = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    order = np.argsort([r[id_col] for r in rows])
    mat = mat[order]
    dim = mat.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    k = min(k, len(mat))
    books = np.empty((m, k, sub), np.float64)
    for s in range(m):
        x = mat[:, s * sub:(s + 1) * sub]
        c = x[:k].copy()
        for _ in range(iters):
            d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            a = d.argmin(axis=1)
            for j in range(k):
                sel = a == j
                if sel.any():
                    c[j] = x[sel].mean(axis=0)
                else:
                    c[j] = x[d.min(axis=1).argmax()]
        books[s] = c
    return books


def pq_encode(emb: rd.Dataset, m: int = 4, k: int = 16, *,
              sample: int = 65536, iters: int = 10,
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> rd.Dataset:
    """PQ-encode the corpus → (id, codes list<int8>, recon_err): the
    memory-compression path for web-scale embedding stores (dim
    float32 → m bytes per vector, 32x at dim=64/m=8). Codebooks train
    once on the driver sample, broadcast via ``ray.put``; encoding is
    one (batch x k) distance matmul per subspace per batch — no
    shuffle at all. recon_err = squared L2 reconstruction error,
    round6."""
    books = pq_train_codebooks(emb, m, k, sample=sample, iters=iters,
                               id_col=id_col, vec_col=vec_col)
    bref = ray.put(books)
    sub = books.shape[2]

    def encode(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "codes": pa.array([], pa.list_(pa.int8())),
                             "recon_err": pa.array([], pa.float64())})
        bks = ray.get(bref)
        x = _vec_matrix(batch[vec_col]).astype(np.float64)
        n = x.shape[0]
        codes = np.empty((n, bks.shape[0]), np.int8)
        err = np.zeros(n, np.float64)
        for s in range(bks.shape[0]):
            xs = x[:, s * sub:(s + 1) * sub]
            c = bks[s]
            # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 (argmin drops ||x||^2)
            d = -2.0 * (xs @ c.T) + (c * c).sum(axis=1)[None, :]
            a = d.argmin(axis=1)
            codes[:, s] = a.astype(np.int8)
            err += ((xs - c[a]) ** 2).sum(axis=1)
        return pa.table({
            id_col: batch[id_col],
            "codes": pa.array(list(codes), pa.list_(pa.int8())),
            "recon_err": pa.array(round6(err))})

    return emb.map_batches(encode, batch_format="pyarrow")
