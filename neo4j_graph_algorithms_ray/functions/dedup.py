"""Deduplication stages for training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Shapes (ray_guide "Aggregation at scale"): per-batch vectorized
signature computation inside map_batches (sketch state compiled once
per actor), explode to (bucket, doc) rows, bucket groupby (the shuffle),
verify candidates exactly, and resolve duplicate *clusters* with the
engine's own WCC kernel when needed. Hash functions are pinned to
md5-based integers so the DuckDB oracles can replicate them bit-for-bit.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from neo4j_graph_algorithms_ray.util import safe_join, to_arrow_blocks

_TOK = re.compile(r"\S+")


def _ensure_pair_schema(ds: rd.Dataset, cols: dict[str, "pa.DataType"]) -> rd.Dataset:
    """Pair pipelines can legitimately produce zero rows; make sure the
    result still carries the expected schema (empty map_groups blocks
    are schema-less otherwise)."""
    ds = ds.materialize()
    if ds.count() == 0:
        return rd.from_arrow(pa.table({c: pa.array([], t) for c, t in cols.items()}))
    return ds


def _md5_int(s: str) -> int:
    """First 60 bits of md5 — fits int64, matches the SQL expression
    CAST(('0x' || substr(md5(s),1,15)) AS BIGINT)... computed as
    int(md5[:15], 16)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def word_shingles(text: str, k: int = 3) -> list[str]:
    toks = [t.lower() for t in _TOK.findall(text or "")]
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]


# ---------------- exact dedup ----------------

def exact_dedup(docs: rd.Dataset, id_col: str = "doc_id", text_col: str = "text") -> rd.Dataset:
    """One row per distinct text: (doc_id = min id, dup_count).

    hash-partition by content then per-group first — the canonical
    exact-dedup shuffle. Content hashed to md5 before the groupby so the
    shuffle key is 32 bytes, not the document."""
    def h(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: batch[id_col],
            "h": batch[text_col].map(
                lambda t: hashlib.md5((t or "").encode("utf-8")).hexdigest()),
        })

    hashed = docs.map_batches(h, batch_format="pandas")
    from ray.data.aggregate import Count, Min
    agg = hashed.groupby("h").aggregate(Min(id_col, alias_name=id_col),
                                        Count(alias_name="dup_count"))
    return agg.select_columns([id_col, "dup_count"])


# ---------------- MinHash + LSH ----------------

class MinHashSignatures:
    """(id, text) → (id, sig: fixed_size_list<int64>) word-shingle
    minhash; ``num_perm`` permutations via md5(perm:shingle)."""

    def __init__(self, num_perm: int = 8, k: int = 3,
                 id_col: str = "doc_id", text_col: str = "text"):
        self.num_perm, self.k = num_perm, k
        self.id_col, self.text_col = id_col, text_col

    def signature(self, text: str) -> list[int]:
        sh = set(word_shingles(text, self.k))
        if not sh:
            return [0] * self.num_perm
        return [min(_md5_int(f"{j}:{s}") for s in sh) for j in range(self.num_perm)]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = batch[self.text_col].map(self.signature)
        out = pd.DataFrame({self.id_col: batch[self.id_col]})
        out["sig"] = sigs
        return out


def minhash_lsh_pairs(docs: rd.Dataset, *, num_perm: int = 8, bands: int = 4,
                      k: int = 3, threshold: float = 0.5,
                      id_col: str = "doc_id", text_col: str = "text") -> rd.Dataset:
    """Candidate pairs via banded LSH, verified by exact shingle-set
    Jaccard ≥ threshold → (a, b, jaccard) with a < b.

    shingle→minhash→band→bucket groupby; pairs generated per bucket;
    verification joins the shingle sets back by re-computing them from
    the broadcast doc payloads of candidate ids only (candidates are
    sparse)."""
    rows_per_band = num_perm // bands
    sig_stage = MinHashSignatures(num_perm, k, id_col, text_col)

    def to_buckets(batch: pd.DataFrame) -> pd.DataFrame:
        out_id, out_band, out_key = [], [], []
        for _, row in sig_stage(batch).iterrows():
            sig = row["sig"]
            for b in range(bands):
                chunk = tuple(sig[b * rows_per_band:(b + 1) * rows_per_band])
                out_id.append(row[id_col])
                out_band.append(b)
                out_key.append(hash(chunk) & 0x7FFFFFFFFFFFFFFF)
        return pd.DataFrame({id_col: out_id, "band": out_band, "bkey": out_key})

    buckets = docs.map_batches(to_buckets, batch_format="pandas")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g[id_col].unique())
        if len(ids) < 2:
            return pd.DataFrame({"a": np.empty(0, np.int64), "b": np.empty(0, np.int64)})
        i, j = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[i], "b": ids[j]})

    cand = to_arrow_blocks(buckets.groupby(["band", "bkey"]).map_groups(pairs, batch_format="pandas"))
    cand = cand.groupby(["a", "b"]).count().select_columns(["a", "b"])

    # exact verify: candidates are sparse → pull candidate ids' texts via join
    texts = docs.select_columns([id_col, text_col])
    ca = safe_join(cand, texts, "inner", 4, on=("a",), right_on=(id_col,))
    ca = ca.rename_columns({text_col: "text_a"}).select_columns(["a", "b", "text_a"])
    cb = safe_join(ca, texts, "inner", 4, on=("b",), right_on=(id_col,))
    cb = cb.rename_columns({text_col: "text_b"})

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        ja = []
        for _, r in batch.iterrows():
            sa, sb = set(word_shingles(r["text_a"], k)), set(word_shingles(r["text_b"], k))
            inter = len(sa & sb)
            union = len(sa | sb)
            ja.append(inter / union if union else 0.0)
        out = pd.DataFrame({"a": batch["a"], "b": batch["b"], "jaccard": ja})
        return out[out["jaccard"] >= threshold]

    from neo4j_graph_algorithms_ray.functions.text import round6
    res = cb.map_batches(verify, batch_format="pandas")
    res = res.map_batches(
        lambda b: pd.DataFrame({"a": b["a"], "b": b["b"], "jaccard": round6(b["jaccard"])}),
        batch_format="pandas")
    return _ensure_pair_schema(res, {"a": pa.int64(), "b": pa.int64(),
                                     "jaccard": pa.float64()})


# ---------------- n-gram Jaccard (all-pairs, shuffle formulation) ----------------

def ngram_jaccard_pairs(docs: rd.Dataset, *, k: int = 3, threshold: float = 0.5,
                        id_col: str = "doc_id", text_col: str = "text") -> rd.Dataset:
    """Exact all-pairs word-k-gram Jaccard ≥ threshold → (a, b, jaccard).

    Inverted-index formulation: explode (shingle, doc) rows, groupby
    shingle → per-shingle doc pairs (hub shingles truncated never — the
    group sizes here are document-frequency bounded; at web scale add a
    DF cap), then groupby pair → intersection size, then jaccard from
    per-doc shingle counts."""
    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        ids, shs = [], []
        for _, r in batch.iterrows():
            for s in set(word_shingles(r[text_col], k)):
                ids.append(r[id_col])
                shs.append(s)
        return pd.DataFrame({id_col: ids, "sh": shs})

    sh = to_arrow_blocks(docs.map_batches(explode, batch_format="pandas")).materialize()
    counts = sh.groupby(id_col).count().rename_columns({"count()": "n_sh"})

    def pairgen(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g[id_col].unique())
        if len(ids) < 2:
            return pd.DataFrame({"a": np.empty(0, np.int64), "b": np.empty(0, np.int64)})
        i, j = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[i], "b": ids[j]})

    inter = to_arrow_blocks(sh.groupby("sh").map_groups(pairgen, batch_format="pandas")) \
              .groupby(["a", "b"]).count().rename_columns({"count()": "inter"})
    j1 = safe_join(inter, counts, "inner", 4, on=("a",), right_on=(id_col,))
    j1 = j1.rename_columns({"n_sh": "na"}).select_columns(["a", "b", "inter", "na"])
    j2 = safe_join(j1, counts, "inner", 4, on=("b",), right_on=(id_col,))
    j2 = j2.rename_columns({"n_sh": "nb"})

    from neo4j_graph_algorithms_ray.functions.text import round6

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        jac = batch["inter"] / (batch["na"] + batch["nb"] - batch["inter"])
        out = pd.DataFrame({"a": batch["a"], "b": batch["b"], "jaccard": round6(jac)})
        return out[out["jaccard"] >= threshold]

    return _ensure_pair_schema(j2.map_batches(finish, batch_format="pandas"),
                               {"a": pa.int64(), "b": pa.int64(),
                                "jaccard": pa.float64()})


# ---------------- SimHash ----------------

class SimHash:
    """64-bit simhash over word hashes → (id, simhash:int64-as-uint)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col

    @staticmethod
    def simhash(text: str) -> int:
        acc = np.zeros(64, dtype=np.int64)
        toks = [t.lower() for t in _TOK.findall(text or "")]
        for t in toks:
            h = np.uint64(int(hashlib.md5(t.encode()).hexdigest()[:16], 16))
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits == 1, 1, -1)
        return int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            self.id_col: batch[self.id_col],
            "simhash": batch[self.text_col].map(self.simhash).astype(np.uint64),
        })


def simhash_pairs(docs: rd.Dataset, *, max_hamming: int = 8,
                  id_col: str = "doc_id", text_col: str = "text") -> rd.Dataset:
    """Near-dup pairs with simhash hamming distance ≤ max_hamming.
    Banded: 4 16-bit bands; a pair within distance ≤ max_hamming<16
    shares at least one exact band (pigeonhole holds for ≤3 flips per
    64/16 bands; for larger budgets recall is approximate — documented)."""
    sigs = docs.map_batches(SimHash(id_col, text_col), batch_format="pandas").materialize()

    def to_bands(batch: pd.DataFrame) -> pd.DataFrame:
        h = batch["simhash"].to_numpy(dtype=np.uint64)
        ids = batch[id_col].to_numpy(dtype=np.int64)
        out_ids = np.repeat(ids, 4)
        band = np.tile(np.arange(4, dtype=np.int64), len(ids))
        key = ((np.repeat(h, 4) >> (np.uint64(16) * band.astype(np.uint64)))
               & np.uint64(0xFFFF)).astype(np.int64)
        return pd.DataFrame({id_col: out_ids, "band": band, "bkey": key})

    buckets = sigs.map_batches(to_bands, batch_format="pandas")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g[id_col].unique())
        if len(ids) < 2:
            return pd.DataFrame({"a": np.empty(0, np.int64), "b": np.empty(0, np.int64)})
        i, j = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[i], "b": ids[j]})

    cand = to_arrow_blocks(buckets.groupby(["band", "bkey"]).map_groups(pairs, batch_format="pandas")) \
                  .groupby(["a", "b"]).count().select_columns(["a", "b"])
    sa = safe_join(cand, sigs, "inner", 4, on=("a",), right_on=(id_col,))
    sa = sa.rename_columns({"simhash": "ha"}).select_columns(["a", "b", "ha"])
    sb = safe_join(sa, sigs, "inner", 4, on=("b",), right_on=(id_col,))
    sb = sb.rename_columns({"simhash": "hb"})

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        x = batch["ha"].to_numpy(dtype=np.uint64) ^ batch["hb"].to_numpy(dtype=np.uint64)
        from neo4j_graph_algorithms_ray.util import popcount64
        d = popcount64(x)
        out = pd.DataFrame({"a": batch["a"], "b": batch["b"], "hamming": d})
        return out[out["hamming"] <= max_hamming]

    return _ensure_pair_schema(sb.map_batches(verify, batch_format="pandas"),
                               {"a": pa.int64(), "b": pa.int64(),
                                "hamming": pa.int64()})


# ---------------- embedding cosine near-dup ----------------

def embedding_neardup_pairs(emb: rd.Dataset, *, threshold: float = 0.95,
                            id_col: str = "vec_id", vec_col: str = "embedding",
                            block_col: str | None = "label") -> rd.Dataset:
    """Pairs with cosine ≥ threshold, blocked by ``block_col`` (the
    IVF-style candidate restriction: only same-block pairs are compared;
    at web scale the block is a coarse quantizer cell)."""
    from neo4j_graph_algorithms_ray.functions.text import round6

    def pergroup(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        m = np.stack(g[vec_col].to_numpy()).astype(np.float64)
        norm = np.linalg.norm(m, axis=1, keepdims=True)
        norm[norm == 0] = 1.0
        mn = m / norm
        sims = mn @ mn.T
        i, j = np.triu_indices(len(ids), k=1)
        sel = sims[i, j] >= threshold
        return pd.DataFrame({"a": ids[i][sel], "b": ids[j][sel],
                             "cosine": round6(sims[i, j][sel])})

    if block_col is None:
        import pyarrow as pa_
        one = emb.map_batches(
            lambda b: b.append_column("_blk", pa.array(np.zeros(b.num_rows, np.int64))),
            batch_format="pyarrow")
        return _ensure_pair_schema(
            one.groupby("_blk").map_groups(pergroup, batch_format="pandas"),
            {"a": pa.int64(), "b": pa.int64(), "cosine": pa.float64()})
    return _ensure_pair_schema(
        emb.groupby(block_col).map_groups(pergroup, batch_format="pandas"),
        {"a": pa.int64(), "b": pa.int64(), "cosine": pa.float64()})
