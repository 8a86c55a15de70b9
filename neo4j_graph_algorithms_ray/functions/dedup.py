"""Deduplication stages for training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Shapes (ray_guide "Aggregation at scale"): per-batch vectorized
signature computation inside map_batches (sketch state compiled once
per actor), explode to (bucket, doc) rows, bucket groupby (the shuffle),
verify candidates exactly, and resolve duplicate *clusters* with the
engine's own WCC kernel when needed.

Hash pinning: every sketch is md5-anchored so the DuckDB oracles can
replicate it bit-for-bit — one md5 per shingle/token, then pure
integer arithmetic (affine permutations mod 2^61-1 for MinHash,
per-bit majority for SimHash). The only remaining per-string Python
is the md5 call itself, amortized over an actor-local cache of unique
strings; tokenize/shingle/band/verify stages are Arrow/numpy
vectorized.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from neo4j_graph_algorithms_ray.util import safe_join, to_arrow_blocks

_TOK = re.compile(r"\S+")

# MinHash permutation space: p = 2^61 - 1 (Mersenne prime). Affine
# perms sig_j = min((A_j·h + C_j) mod p) with A_j = 2j+1 ≤ 15 so A·h
# stays inside uint64 for h < 2^60 (h = first 15 md5 hex digits).
MINHASH_MOD = (1 << 61) - 1
_MAX_PERMS = 8

# candidate-pair sets below this size verify / cluster on the driver
# (pairs only — never the corpus); above it the shuffle paths run
VERIFY_DRIVER_PAIR_LIMIT = 1_000_000


def minhash_params(num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    if num_perm > _MAX_PERMS:
        raise ValueError(f"num_perm > {_MAX_PERMS} would overflow the "
                         "uint64 affine step (A_j capped at 15)")
    a = (2 * np.arange(num_perm, dtype=np.uint64) + 1)
    c = np.array([int(hashlib.md5(f"minhash:{j}".encode()).hexdigest()[:15], 16)
                  for j in range(num_perm)], dtype=np.uint64)
    return a, c


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
    CAST(('0x' || substr(md5(s),1,15)) AS BIGINT)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def _md5_u64(strings: np.ndarray, hexdigits: int) -> tuple[np.ndarray, np.ndarray]:
    """md5-derived uint64 per DISTINCT string (+ inverse indices):
    np.unique first (tokens/shingles repeat), then one md5 per distinct
    string decoded straight from the digest bytes (no hex parse).
    ``int.from_bytes(digest[:8]) >> 4`` == int(hexdigest[:15], 16);
    without the shift it's int(hexdigest[:16], 16)."""
    inv, uniq = pd.factorize(strings)  # hash-based, ~14x np.unique here
    md5 = hashlib.md5
    fb = int.from_bytes
    shift = (16 - hexdigits) * 4
    vals = np.fromiter(
        (fb(md5(s.encode("utf-8")).digest()[:8], "big") >> shift for s in uniq),
        dtype=np.uint64, count=len(uniq))
    return vals, inv


def word_shingles(text: str, k: int = 3) -> list[str]:
    toks = [t.lower() for t in _TOK.findall(text or "")]
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]


def _token_arrays(texts) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized tokenize: lowered whitespace tokens of every doc →
    (doc_index_per_token, token object array), duplicates preserved.
    Matches ``[t.lower() for t in \\S+.findall(text)]``."""
    arr = texts if isinstance(texts, (pa.Array, pa.ChunkedArray)) else pa.array(texts)
    t = pc.utf8_trim_whitespace(pc.utf8_lower(arr.cast(pa.string())))
    t = pc.fill_null(t, "")
    parts = pc.utf8_split_whitespace(t)
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    flat = np.asarray(parts.flatten(), dtype=object)
    counts = np.diff(parts.offsets.to_numpy(zero_copy_only=False))
    doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    # empty doc → [''] from split; drop the empty token
    keep = flat != ""
    return doc_idx[keep], flat[keep]


def _shingle_arrays(texts, k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized word-k-shingles: (doc_index_per_shingle, shingle obj
    array), duplicates preserved — semantics of ``word_shingles``
    (short docs yield their single joined-token shingle)."""
    doc_idx, toks = _token_arrays(texts)
    ndocs = (int(doc_idx.max()) + 1) if len(doc_idx) else 0
    cnt = np.bincount(doc_idx, minlength=ndocs) if ndocs else np.zeros(0, np.int64)
    starts = np.concatenate([[0], np.cumsum(cnt)]).astype(np.int64)
    out_doc, out_sh = [], []
    # full-length shingles for docs with >= k tokens, fully vectorized
    full = np.nonzero(cnt >= k)[0]
    if len(full):
        m = cnt[full] - k + 1
        # flat indices of each shingle's first token
        base = np.repeat(starts[full], m) + _seg_arange(m)
        sh = toks[base]
        for off in range(1, k):
            sh = sh + " "
            sh = sh + toks[base + off]
        out_doc.append(np.repeat(full, m))
        out_sh.append(sh)
    # short docs (< k tokens, > 0): one joined shingle each
    short = np.nonzero((cnt > 0) & (cnt < k))[0]
    for d in short:
        out_doc.append(np.array([d], dtype=np.int64))
        out_sh.append(np.array([" ".join(toks[starts[d]:starts[d + 1]])],
                               dtype=object))
    if not out_doc:
        return np.empty(0, np.int64), np.empty(0, object)
    return np.concatenate(out_doc), np.concatenate(out_sh)


def _seg_arange(lengths: np.ndarray) -> np.ndarray:
    """Concatenated [0..l) ranges per segment, no Python loop."""
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, np.int64)
    out = np.ones(total, dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    out[starts] = 0
    out[starts[1:]] -= lengths[:-1] - 1
    np.cumsum(out, out=out)
    return out


def _dedupe_doc_strings(doc_idx: np.ndarray, strings: np.ndarray):
    """Distinct (doc, string) pairs via one pandas drop_duplicates."""
    df = pd.DataFrame({"d": doc_idx, "s": strings}).drop_duplicates()
    return df["d"].to_numpy(), df["s"].to_numpy()


# ---------------- exact dedup ----------------

def _content_hashes(batch: pa.Table, id_col: str, text_col: str,
                    with_nz: bool = True) -> pa.Table:
    """(id, h[, nz]): md5 of the text column hashed straight off the
    Arrow flat utf-8 buffer via offset memoryview slices — no
    Python-string materialization or re-encode per doc (2× the
    to_pylist() form; the remaining per-doc cost is the C md5 call
    itself). ``nz`` flags texts with at least one token (trimmed
    length > 0) — the zero-shingle guard for duplicate-group pairs;
    callers that don't need it (exact_dedup) skip the extra
    trim+length pass over the text buffer."""
    txt = pc.fill_null(batch[text_col].cast(pa.string()), "").combine_chunks()
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.chunk(0) if txt.num_chunks else pa.array([], pa.string())
    offs = np.frombuffer(txt.buffers()[1], np.int32)[
        txt.offset: txt.offset + len(txt) + 1]
    mv = memoryview(txt.buffers()[2] or b"")
    md5 = hashlib.md5
    hs = [md5(mv[offs[i]:offs[i + 1]]).hexdigest() for i in range(len(txt))]
    cols = {id_col: batch[id_col], "h": pa.array(hs, pa.string())}
    if with_nz:
        cols["nz"] = pc.greater(
            pc.utf8_length(pc.utf8_trim_whitespace(txt)), 0)
    return pa.table(cols)


def exact_dedup(docs: rd.Dataset, id_col: str = "doc_id", text_col: str = "text") -> rd.Dataset:
    """One row per distinct text: (doc_id = min id, dup_count).

    hash-partition by content then per-group first — the canonical
    exact-dedup shuffle. Content hashed to md5 before the groupby so the
    shuffle key is 32 bytes, not the document."""
    def h(batch: pa.Table) -> pa.Table:
        return _content_hashes(batch, id_col, text_col, with_nz=False)

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by("h").aggregate([(id_col, "min"), ("n", "sum")])
        return g.rename_columns(["h", id_col, "n"])

    hashed = docs.map_batches(h, batch_format="pyarrow").map_batches(
        lambda b: b.append_column("n", pa.array(np.ones(b.num_rows, np.int64))),
        batch_format="pyarrow")
    # map-side combine (duplicates of one text CAN span batches, so a
    # final min/sum merge is still needed — but it runs over per-batch-
    # distinct partials, driver-side below the small-aggregate limit)
    red = hashed.map_batches(combine, batch_format="pyarrow").materialize()
    from neo4j_graph_algorithms_ray.util import SMALL_AGG_DRIVER_LIMIT
    if red.count() <= SMALL_AGG_DRIVER_LIMIT:
        from neo4j_graph_algorithms_ray.util import collect_arrow
        tbl = pa.concat_tables(collect_arrow(red))
        out = tbl.group_by("h").aggregate([(id_col, "min"), ("n", "sum")]) \
                 .rename_columns(["h", id_col, "dup_count"])
        return rd.from_arrow(out.select([id_col, "dup_count"]))
    from ray.data.aggregate import Min, Sum
    agg = red.groupby("h").aggregate(Min(id_col, alias_name=id_col),
                                     Sum("n", alias_name="dup_count"))
    return agg.select_columns([id_col, "dup_count"])


# ---------------- exact-duplicate collapse ----------------
#
# Near-dup candidate generation is quadratic in exact-duplicate
# multiplicity: a text copied m times turns every bucket/shingle group
# it touches into an m-clique (40k docs with 8 copies each made the
# ngram pair explosion 64× — 88M intermediate rows for a 156k-pair
# result). The pair queries therefore collapse exact duplicates FIRST
# (md5 groupby → one representative per distinct text), run candidate
# generation + verification over representatives only, and expand the
# rep-level pairs back over the duplicate groups at the end. Identical
# texts have identical signatures (minhash bands / simhash), so for
# minhash and simhash the expanded result is exactly the direct
# computation's (pinned by test_collapse_matches_direct). ngram's df
# hub-guard is DEFINED over distinct texts (a shingle is not "hot"
# because one page was mirrored a million times) and exact-duplicate
# pairs are always emitted at jaccard 1.0 — so ngram engages the
# collapse whenever any duplicate exists, and its SQL oracle mirrors
# the collapse (rep-level computation + expansion) rather than the
# raw-doc formulation.


class _DupGroups:
    """Two-phase exact-duplicate index: counting (cheap, for the
    engage-gate) is separated from building the full id→rep membership
    (a corpus-sized join at scale), so a disengaged gate never pays
    the join."""

    def __init__(self, docs: rd.Dataset, id_col: str, text_col: str):
        from neo4j_graph_algorithms_ray.util import SMALL_AGG_DRIVER_LIMIT

        self.id_col = id_col
        self.hashed = docs.map_batches(
            lambda b: _content_hashes(b, id_col, text_col),
            batch_format="pyarrow").materialize()
        self.n_docs = self.hashed.count()
        self._small = self.n_docs <= SMALL_AGG_DRIVER_LIMIT
        self._df = None
        self._rep = None
        if self._small:
            from neo4j_graph_algorithms_ray.util import collect_arrow
            tabs = collect_arrow(self.hashed)
            tbl = (pa.concat_tables(tabs) if tabs
                   else pa.table({id_col: pa.array([], pa.int64()),
                                  "h": pa.array([], pa.string()),
                                  "nz": pa.array([], pa.bool_())}))
            self._df = tbl.to_pandas()
            self.n_reps = int(self._df["h"].nunique())
        else:
            from ray.data.aggregate import Min
            self._rep = self.hashed.groupby("h") \
                .aggregate(Min(self.id_col, alias_name="rep")).materialize()
            self.n_reps = self._rep.count()

    def membership(self) -> rd.Dataset:
        """(id, rep, nz) Dataset — rep = min id among exact duplicates.
        Only called once a gate decides to collapse."""
        if self._small:
            df = self._df
            rep = df.groupby("h")[self.id_col].transform("min")
            out = pa.table({
                self.id_col: pa.array(df[self.id_col].to_numpy()),
                "rep": pa.array(rep.to_numpy(dtype=np.int64)),
                "nz": pa.array(df["nz"].to_numpy())})
            return rd.from_arrow(out).materialize()
        member = safe_join(self.hashed, self._rep, "inner", 8, on=("h",))
        return member.select_columns([self.id_col, "rep", "nz"]) \
                     .materialize()


def _representative_docs(docs: rd.Dataset, member: rd.Dataset,
                         id_col: str) -> rd.Dataset:
    """docs filtered to duplicate-group representatives (id == rep)."""
    from neo4j_graph_algorithms_ray.util import broadcast_join

    def reps_only(b: pa.Table) -> pa.Table:
        keep = pc.equal(b[id_col], b["rep"])
        return b.filter(keep).select([id_col])

    rep_ids = member.map_batches(reps_only, batch_format="pyarrow")
    return broadcast_join(docs, rep_ids, on=id_col)


def _expand_rep_pairs(rep_pairs: rd.Dataset, member: rd.Dataset, *,
                      id_col: str, measure_col: str,
                      self_measure, measure_type: "pa.DataType",
                      emit_self: bool, require_nz: bool) -> rd.Dataset:
    """Rep-level (a, b, measure) → doc-level: every member of a's group
    pairs with every member of b's group (measure unchanged — identical
    texts), plus within-group pairs at ``self_measure`` for groups ≥ 2
    (skipped for zero-token groups when ``require_nz``, whose shingle
    union is empty and thus never pairs in the direct computation)."""
    from neo4j_graph_algorithms_ray.util import broadcast_join

    empty = rd.from_arrow(pa.table({"a": pa.array([], pa.int64()),
                                    "b": pa.array([], pa.int64()),
                                    measure_col: pa.array([], measure_type)}))
    mm = member.select_columns([id_col, "rep"])
    rep_pairs = rep_pairs.materialize()
    if rep_pairs.count() == 0:
        # no rep-level pairs (e.g. every shared shingle capped):
        # schema-less empty datasets can't feed the joins below
        cross = empty
    else:
        j = broadcast_join(rep_pairs, mm, on="a", right_on="rep")
        j = j.rename_columns({id_col: "_ma"})
        j = broadcast_join(j, mm, on="b", right_on="rep")
        j = j.rename_columns({id_col: "_mb"})

        def fin(b: pa.Table) -> pa.Table:
            x = b["_ma"].to_numpy(zero_copy_only=False).astype(np.int64)
            y = b["_mb"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"a": pa.array(np.minimum(x, y)),
                             "b": pa.array(np.maximum(x, y)),
                             measure_col: b[measure_col].cast(measure_type)})

        cross = j.map_batches(fin, batch_format="pyarrow")
    if not emit_self:
        return cross

    groups = member
    if require_nz:
        groups = groups.map_batches(
            lambda b: b.filter(pc.equal(b["nz"], True)),
            batch_format="pyarrow")
    wp = _bucketed_pairs(groups.select_columns([id_col, "rep"]),
                         ["rep"], id_col)
    wp = wp.map_batches(
        lambda b: b.append_column(
            measure_col, pa.array(np.full(b.num_rows, self_measure),
                                  measure_type)),
        batch_format="pyarrow")
    return cross.union(wp)


def _collapsed_pairs(docs: rd.Dataset, direct_fn, *, id_col: str,
                     text_col: str, measure_col: str, self_measure,
                     measure_type: "pa.DataType", emit_self: bool,
                     require_nz: bool, min_dup_fraction: float):
    """Shared collapse gate for the pair queries: build the duplicate
    index, engage when the duplicate fraction ≥ ``min_dup_fraction``
    (collapse pays two extra exchange rounds — rep filter + expansion),
    else return None and let the caller run the direct path.
    ``direct_fn(dataset)`` runs the algorithm over representatives."""
    dg = _DupGroups(docs, id_col, text_col)
    n_dups = dg.n_docs - dg.n_reps
    if n_dups <= 0 or n_dups < min_dup_fraction * dg.n_docs:
        return None
    member = dg.membership()
    reps = _representative_docs(docs, member, id_col)
    rp = direct_fn(reps)
    return _ensure_pair_schema(
        _expand_rep_pairs(rp, member, id_col=id_col,
                          measure_col=measure_col,
                          self_measure=self_measure,
                          measure_type=measure_type,
                          emit_self=emit_self, require_nz=require_nz),
        {"a": pa.int64(), "b": pa.int64(), measure_col: measure_type})


# ---------------- MinHash + LSH ----------------

class MinHashSignatures:
    """(id, text) → (id, sig list<int64>) word-shingle minhash: one md5
    per distinct shingle (actor-cached), then ``num_perm`` affine
    permutations mod 2^61-1 minimized per doc in one numpy reduceat —
    no per-row Python. SQL-replicable (oracles_docs.minhash_sql)."""

    def __init__(self, num_perm: int = 8, k: int = 3,
                 id_col: str = "doc_id", text_col: str = "text"):
        self.num_perm, self.k = num_perm, k
        self.id_col, self.text_col = id_col, text_col
        self.a, self.c = minhash_params(num_perm)

    def signature_matrix(self, texts) -> np.ndarray:
        """(ndocs, num_perm) int64 signature matrix; docs without
        shingles get all-zero rows."""
        n = len(texts)
        doc_idx, sh = _shingle_arrays(texts, self.k)
        sig = np.zeros((n, self.num_perm), dtype=np.int64)
        if not len(sh):
            return sig
        # one md5 per DISTINCT shingle; duplicate (doc, shingle) rows
        # don't matter under min, so no dedupe pass is needed
        hu, inv = _md5_u64(sh, hexdigits=15)  # uint64 < 2^60
        # affine permutations over the distinct hashes only: (A_j·h)
        # mod p then +C_j mod p (stays in uint64: A ≤ 15, h < 2^60)
        perms_u = (self.a[None, :] * hu[:, None]) % np.uint64(MINHASH_MOD)
        perms_u = (perms_u + self.c[None, :]) % np.uint64(MINHASH_MOD)
        order = np.argsort(doc_idx, kind="stable")
        # .take is ~20x faster than fancy indexing for 2D row gathers
        perms = perms_u.take(inv[order], axis=0)
        uniq, starts = np.unique(doc_idx[order], return_index=True)
        mins = np.minimum.reduceat(perms, starts, axis=0)
        sig[uniq] = mins.astype(np.int64)
        return sig

    def signature(self, text: str) -> list[int]:
        return self.signature_matrix([text])[0].tolist()

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sig = self.signature_matrix(batch[self.text_col].to_numpy())
        out = pd.DataFrame({self.id_col: batch[self.id_col]})
        out["sig"] = list(sig)
        return out


def minhash_lsh_pairs(docs: rd.Dataset, *, num_perm: int = 8, bands: int = 4,
                      k: int = 3, threshold: float = 0.5,
                      id_col: str = "doc_id", text_col: str = "text",
                      collapse_dups: bool = True) -> rd.Dataset:
    """Candidate pairs via banded LSH, verified by exact shingle-set
    Jaccard ≥ threshold → (a, b, jaccard) with a < b.

    shingle→minhash→band→bucket groupby; pairs generated per bucket;
    verification recomputes exact shingle sets for candidate ids only
    (candidates are sparse). Every stage vectorized; bucket keys are
    the band's signature values joined as a string (exact, collision-
    free, and what the SQL oracle reproduces).

    ``collapse_dups`` (default) runs the whole pipeline over one
    representative per distinct text and expands pairs back over the
    duplicate groups — identical texts share every band, so the result
    is exactly the direct computation's (identical-text pairs carry
    jaccard 1.0); it engages only when ≥ 5% of docs are duplicates
    (below that the two extra exchange rounds outweigh the win;
    results identical either way, parity-tested). Skipped entirely at
    threshold ≤ 0, where the direct path also emits zero-shingle
    bucket collisions at jaccard 0.0."""
    if collapse_dups and threshold > 0:
        out = _collapsed_pairs(
            docs,
            lambda reps: _minhash_lsh_pairs_direct(
                reps, num_perm=num_perm, bands=bands, k=k,
                threshold=threshold, id_col=id_col, text_col=text_col),
            id_col=id_col, text_col=text_col, measure_col="jaccard",
            self_measure=1.0, measure_type=pa.float64(),
            emit_self=(1.0 >= threshold), require_nz=True,
            min_dup_fraction=0.05)
        if out is not None:
            return out
    return _minhash_lsh_pairs_direct(docs, num_perm=num_perm, bands=bands,
                                     k=k, threshold=threshold,
                                     id_col=id_col, text_col=text_col)


def _minhash_lsh_pairs_direct(docs: rd.Dataset, *, num_perm: int = 8,
                              bands: int = 4, k: int = 3,
                              threshold: float = 0.5, id_col: str = "doc_id",
                              text_col: str = "text") -> rd.Dataset:
    rows_per_band = num_perm // bands
    sig_stage = MinHashSignatures(num_perm, k, id_col, text_col)

    def to_buckets(batch: pa.Table) -> pa.Table:
        # Arrow-native (no per-batch pandas copy of the text column):
        # band keys are built band-major — downstream consumption is a
        # keyed groupby, so row order is free — with the ":"-joined
        # decimal key strings rendered by one binary_join_element_wise
        # C kernel per band (same key text as the former
        # numpy-object-concat, which the SQL oracle mirrors).
        texts = batch[text_col].to_numpy(zero_copy_only=False)
        sig = sig_stage.signature_matrix(texts)
        n = len(texts)
        out_id = batch[id_col].take(pa.array(np.tile(np.arange(n), bands)))
        out_band = pa.array(np.repeat(np.arange(bands, dtype=np.int64), n))
        keys = []
        for b in range(bands):
            parts = [pc.cast(pa.array(sig[:, b * rows_per_band + r]),
                             pa.string())
                     for r in range(rows_per_band)]
            keys.append(parts[0] if len(parts) == 1
                        else pc.binary_join_element_wise(*parts, ":"))
        bkey = pa.concat_arrays([k.combine_chunks() if
                                 isinstance(k, pa.ChunkedArray) else k
                                 for k in keys])
        return pa.table({id_col: out_id, "band": out_band, "bkey": bkey})

    buckets = docs.map_batches(to_buckets, batch_format="pyarrow")
    cand = _bucketed_pairs(buckets, ["band", "bkey"], id_col).materialize()

    from neo4j_graph_algorithms_ray.functions.text import round6

    def verify(batch: pa.Table) -> pa.Table:
        # Arrow-native: no pandas copy of the two wide text columns
        na, nb, inter = _pairwise_shingle_overlap(
            batch["text_a"].to_numpy(zero_copy_only=False),
            batch["text_b"].to_numpy(zero_copy_only=False), k)
        union = na + nb - inter
        ja = round6(np.where(union > 0, inter / np.maximum(union, 1), 0.0))
        keep = ja >= threshold
        return pa.table({
            "a": pa.array(batch["a"].to_numpy(zero_copy_only=False)[keep]),
            "b": pa.array(batch["b"].to_numpy(zero_copy_only=False)[keep]),
            "jaccard": pa.array(ja[keep])})

    # small regime: candidate pairs fit the driver → fetch only the
    # candidate ids' texts with a distributed is_in filter (the corpus
    # itself stays out) and verify in one vectorized pass — two Ray
    # hash joins cost seconds of fixed overhead regardless of size.
    if cand.count() <= VERIFY_DRIVER_PAIR_LIMIT:
        cp = cand.to_pandas()
        if not len(cp):
            return _ensure_pair_schema(cand, {"a": pa.int64(), "b": pa.int64(),
                                              "jaccard": pa.float64()})
        import ray
        need = ray.put(np.unique(np.concatenate([cp["a"].to_numpy(),
                                                 cp["b"].to_numpy()])))

        def pick(b: pa.Table) -> pa.Table:
            return b.filter(pc.is_in(b[id_col],
                                     value_set=pa.array(ray.get(need))))

        tx = docs.select_columns([id_col, text_col]) \
                 .map_batches(pick, batch_format="pyarrow").to_pandas()
        m = pd.Series(tx[text_col].to_numpy(), index=tx[id_col].to_numpy())
        out = verify(pa.table({
            "a": pa.array(cp["a"].to_numpy(dtype=np.int64)),
            "b": pa.array(cp["b"].to_numpy(dtype=np.int64)),
            "text_a": pa.array(m.reindex(cp["a"]).to_numpy(dtype=object)),
            "text_b": pa.array(m.reindex(cp["b"]).to_numpy(dtype=object))}))
        return _ensure_pair_schema(
            rd.from_arrow(out),
            {"a": pa.int64(), "b": pa.int64(), "jaccard": pa.float64()})

    # scale path: pull candidate ids' texts via two hash joins
    texts = docs.select_columns([id_col, text_col])
    ca = safe_join(cand, texts, "inner", 4, on=("a",), right_on=(id_col,))
    ca = ca.rename_columns({text_col: "text_a"}).select_columns(["a", "b", "text_a"])
    cb = safe_join(ca, texts, "inner", 4, on=("b",), right_on=(id_col,))
    cb = cb.rename_columns({text_col: "text_b"})
    res = cb.map_batches(verify, batch_format="pyarrow")
    return _ensure_pair_schema(res, {"a": pa.int64(), "b": pa.int64(),
                                     "jaccard": pa.float64()})


def _segmented_pairs(ids_sorted: np.ndarray, seg_starts: np.ndarray,
                     group_cap: int | None = None):
    """All within-segment (a<b) pairs of a segment-sorted id array,
    batched per distinct segment size (the _iter_wedges trick) — no
    per-group Python. Segments larger than ``group_cap`` are skipped."""
    lens = np.diff(np.append(seg_starts, len(ids_sorted)))
    keep = lens >= 2
    if group_cap is not None:
        keep &= lens <= group_cap
    starts, lens = seg_starts[keep], lens[keep]
    a_out, b_out = [], []
    triu: dict[int, tuple] = {}
    for L in np.unique(lens):
        rows = starts[lens == L]
        ij = triu.setdefault(int(L), np.triu_indices(int(L), 1))
        mat = ids_sorted[rows[:, None] + np.arange(int(L))[None, :]]
        a_out.append(mat[:, ij[0]].ravel())
        b_out.append(mat[:, ij[1]].ravel())
    if not a_out:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(a_out), np.concatenate(b_out)


def _bucketed_pairs(ds: rd.Dataset, key_cols: list[str], id_col: str, *,
                    nbuckets: int = 128, group_cap: int | None = None) -> rd.Dataset:
    """Distinct candidate pairs (a, b) of ids sharing a key: keys hash
    (deterministically, pd.util.hash_array — NOT the per-process-salted
    builtin) into ``nbuckets`` groups so ONE vectorized map_groups call
    handles thousands of keys instead of one Python call per key."""
    def add_bucket(batch: pa.Table) -> pa.Table:
        # Arrow-native: the "\x1f"-joined key renders through one
        # binary_join_element_wise C kernel (same key text as the former
        # pandas astype(str) concat — int casts format identically);
        # only the finished key column materializes to objects, for the
        # deterministic pd.util.hash_array bucket hash.
        parts = [pc.cast(batch[c], pa.string()).combine_chunks()
                 for c in key_cols]
        k = (parts[0] if len(parts) == 1
             else pc.binary_join_element_wise(*parts, "\x1f"))
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        bucket = (pd.util.hash_array(k.to_numpy(zero_copy_only=False))
                  % nbuckets).astype(np.int64)
        return pa.table({"k": k, id_col: batch[id_col],
                         "bucket": pa.array(bucket)})

    # 0-row batches from an upstream filter still carry the schema in
    # pyarrow format (unlike the old pandas path) but drop them anyway
    from neo4j_graph_algorithms_ray.util import drop_empty_blocks
    keyed = drop_empty_blocks(
        to_arrow_blocks(ds.map_batches(add_bucket, batch_format="pyarrow")))

    def gen(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["k", id_col]).sort_values(["k", id_col])
        k = g["k"].to_numpy()
        d = g[id_col].to_numpy(dtype=np.int64)
        if not len(k):
            return pd.DataFrame({"a": np.empty(0, np.int64),
                                 "b": np.empty(0, np.int64)})
        newseg = np.empty(len(k), dtype=bool)
        newseg[0] = True
        newseg[1:] = k[1:] != k[:-1]
        a, b = _segmented_pairs(d, np.nonzero(newseg)[0], group_cap)
        return pd.DataFrame({"a": a, "b": b}).drop_duplicates()

    # small regime: below the driver limit one gen() call over the whole
    # keyed table (all keys, one vectorized pass) replaces the bucket
    # groupby — a Ray shuffle costs seconds of fixed overhead regardless
    # of size (same escape hatch as util.distinct_pairs/preagg_sum).
    from neo4j_graph_algorithms_ray.util import SMALL_AGG_DRIVER_LIMIT, predistinct
    keyed = keyed.materialize()
    if keyed.count() <= SMALL_AGG_DRIVER_LIMIT:
        import ray
        tabs = [t for t in (ray.get(r) for r in keyed.to_arrow_refs())
                if t.num_rows]
        frame = (pa.concat_tables(tabs).to_pandas()
                 if tabs else pd.DataFrame({"k": [], id_col: []}))
        out = gen(frame)
        return rd.from_arrow(pa.Table.from_pandas(out, preserve_index=False)
                             .replace_schema_metadata(None))

    pairs = to_arrow_blocks(keyed.groupby("bucket").map_groups(gen, batch_format="pandas"))
    return predistinct(pairs, ["a", "b"])


def _pairwise_shingle_overlap(texts_a: np.ndarray, texts_b: np.ndarray,
                              k: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-row (|A|, |B|, |A∩B|) of the two texts' shingle sets.

    Each DISTINCT text is shingled exactly once (a duplicate-heavy
    candidate set repeats the same doc in many pairs — re-shingling per
    occurrence made verify quadratic-ish: 40k docs / 156k pairs took
    ~80 s, now ~1 s), shingle strings factorize to int codes, and the
    per-pair intersection is an ``intersect1d`` over composite
    ``row*ncodes + code`` int64 keys — exact string-set semantics, no
    object-dtype merge."""
    n = len(texts_a)
    if n == 0:
        z = np.zeros(0, np.float64)
        return z, z, z
    allt = np.concatenate([texts_a, texts_b])
    # factorize maps None/NaN to sentinel -1, which would alias a
    # null-text doc to the LAST distinct text's shingle rows below —
    # normalize nulls to "" (the direct pipeline's fill_null semantics)
    nulls = pd.isna(allt)
    if nulls.any():
        allt = allt.copy()
        allt[nulls] = ""
    inv, uniq = pd.factorize(allt)
    d_idx, sh = _dedupe_doc_strings(*_shingle_arrays(uniq, k))
    codes = pd.factorize(sh)[0] if len(sh) else np.empty(0, np.int64)
    order = np.argsort(d_idx, kind="stable")
    d_idx, codes = d_idx[order], codes[order].astype(np.int64)
    n_sh = np.bincount(d_idx, minlength=len(uniq)).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(n_sh)[:-1]]).astype(np.int64)
    inv_a, inv_b = inv[:n].astype(np.int64), inv[n:].astype(np.int64)
    ncodes = np.int64(codes.max() + 1) if len(codes) else np.int64(1)

    def side_keys(inv_side: np.ndarray) -> np.ndarray:
        lens = n_sh[inv_side]
        nz = lens > 0  # _seg_arange requires strictly positive segments
        lens_nz = lens[nz]
        base = np.repeat(starts[inv_side][nz], lens_nz) + _seg_arange(lens_nz)
        rows = np.repeat(np.nonzero(nz)[0].astype(np.int64), lens_nz)
        return rows * ncodes + codes[base]

    # keys are unique within each side (per-doc shingles deduped), so
    # assume_unique skips intersect1d's internal dedup sort
    common = np.intersect1d(side_keys(inv_a), side_keys(inv_b),
                            assume_unique=True)
    inter = np.bincount(common // ncodes, minlength=n).astype(np.float64)
    return (n_sh[inv_a].astype(np.float64), n_sh[inv_b].astype(np.float64),
            inter)


# ---------------- n-gram Jaccard (all-pairs, shuffle formulation) ----------------

# Shingles seen in more documents than this are dropped before pair
# generation (both here and in the SQL oracle): a stopword-like shingle
# at corpus scale makes the per-shingle pair explosion O(df²).
NGRAM_DF_CAP = 10_000


def ngram_jaccard_pairs(docs: rd.Dataset, *, k: int = 3, threshold: float = 0.5,
                        df_cap: int = NGRAM_DF_CAP,
                        id_col: str = "doc_id", text_col: str = "text",
                        collapse_dups: bool = True) -> rd.Dataset:
    """All-pairs word-k-gram Jaccard ≥ threshold → (a, b, jaccard).

    Inverted-index formulation: explode (shingle, doc) rows (vectorized
    Arrow shingling), drop shingles with document frequency > ``df_cap``
    (the hub guard — exact for every pair whose shared shingles are all
    under the cap; pairs held together ONLY by ultra-common shingles are
    intentionally not emitted), groupby shingle → per-shingle doc pairs,
    groupby pair → intersection size, jaccard from per-doc shingle
    counts.

    The query's SEMANTICS are defined over distinct texts: the df
    hub-guard counts DISTINCT TEXTS per shingle (a shingle is not
    "hot" because one page was mirrored a million times), and exact
    duplicates of a non-empty text always pair at jaccard 1.0 (exact
    copies are maximal near-dups by definition, hub-guard or not).
    ``collapse_dups`` (default) therefore engages whenever ANY
    duplicate exists — unlike minhash/simhash there is no 5% fraction
    gate, because the direct path computes raw-doc df and would
    diverge from the distinct-text contract (and the SQL oracle, which
    mirrors the collapse) as soon as a raw df crosses the cap.
    ``collapse_dups=False`` is the raw-doc-df formulation, kept for
    parity testing on fixtures whose dfs stay under the cap."""
    if collapse_dups:
        out = _collapsed_pairs(
            docs,
            lambda reps: _ngram_jaccard_pairs_direct(
                reps, k=k, threshold=threshold, df_cap=df_cap,
                id_col=id_col, text_col=text_col),
            id_col=id_col, text_col=text_col, measure_col="jaccard",
            self_measure=1.0, measure_type=pa.float64(),
            emit_self=(1.0 >= threshold), require_nz=True,
            min_dup_fraction=0.0)
        if out is not None:
            return out
    return _ngram_jaccard_pairs_direct(docs, k=k, threshold=threshold,
                                       df_cap=df_cap, id_col=id_col,
                                       text_col=text_col)


def _ngram_jaccard_pairs_direct(docs: rd.Dataset, *, k: int = 3,
                                threshold: float = 0.5,
                                df_cap: int = NGRAM_DF_CAP,
                                id_col: str = "doc_id",
                                text_col: str = "text") -> rd.Dataset:
    def explode(batch: pa.Table) -> pa.Table:
        # Arrow-native: the wide text column never transits pandas
        di, sh = _dedupe_doc_strings(*_shingle_arrays(
            batch[text_col].to_numpy(zero_copy_only=False), k))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table({id_col: pa.array(ids[di]), "sh": pa.array(sh)})

    from neo4j_graph_algorithms_ray.util import drop_empty_blocks
    # drop_empty_blocks: 0-row pandas batches (empty/whitespace-only
    # docs, filtered upstreams) convert to 0-column arrow blocks that
    # crash concat and shuffles
    sh = drop_empty_blocks(to_arrow_blocks(
        docs.map_batches(explode, batch_format="pyarrow")))
    # per-doc shingle counts: docs never span batches, so a per-batch
    # Arrow combine is exact and skips the full groupby shuffle
    from neo4j_graph_algorithms_ray.util import preagg_sum as _psum
    counts = _psum(sh.map_batches(
        lambda b: b.group_by(id_col).aggregate([("sh", "count")])
                   .rename_columns([id_col, "n_sh"]),
        batch_format="pyarrow"), [id_col], "n_sh")

    # per-shingle doc pairs (capped), then intersection sizes — unlike
    # the LSH candidates these pairs keep their multiplicity (one row
    # per shared shingle), so count per pair = |A ∩ B|
    def pair_explode(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["k", id_col])
        k = g["k"].to_numpy()
        d = g[id_col].to_numpy(dtype=np.int64)
        if not len(k):
            return pd.DataFrame({"a": np.empty(0, np.int64),
                                 "b": np.empty(0, np.int64)})
        newseg = np.empty(len(k), dtype=bool)
        newseg[0] = True
        newseg[1:] = k[1:] != k[:-1]
        a, b = _segmented_pairs(d, np.nonzero(newseg)[0], df_cap)
        return pd.DataFrame({"a": a, "b": b})

    def add_bucket(batch: pa.Table) -> pa.Table:
        ksh = batch["sh"].combine_chunks()
        bucket = (pd.util.hash_array(ksh.to_numpy(zero_copy_only=False))
                  % 128).astype(np.int64)
        return pa.table({"k": ksh, id_col: batch[id_col],
                         "bucket": pa.array(bucket)})

    keyed = drop_empty_blocks(to_arrow_blocks(
        sh.map_batches(add_bucket, batch_format="pyarrow")))

    from neo4j_graph_algorithms_ray.functions.text import round6
    from neo4j_graph_algorithms_ray.util import SMALL_AGG_DRIVER_LIMIT

    # small regime: the exploded (shingle, doc) table fits the driver →
    # one pair_explode pass + pandas aggregation replaces the bucket
    # groupby, the pair-count shuffle and both count joins.
    if keyed.count() <= SMALL_AGG_DRIVER_LIMIT:
        import ray
        tabs = [t for t in (ray.get(r) for r in keyed.to_arrow_refs())
                if t.num_rows]
        frame = (pa.concat_tables(tabs).to_pandas()
                 if tabs else pd.DataFrame({"k": [], id_col: []}))
        pdf = pair_explode(frame)
        empty = {"a": pa.int64(), "b": pa.int64(), "jaccard": pa.float64()}
        if not len(pdf):
            return _ensure_pair_schema(
                rd.from_arrow(pa.table({c: pa.array([], t)
                                        for c, t in empty.items()})), empty)
        g = pdf.groupby(["a", "b"]).size().reset_index(name="inter")
        cdf = counts.to_pandas()
        cs = pd.Series(cdf["n_sh"].to_numpy(), index=cdf[id_col].to_numpy())
        na = cs.reindex(g["a"]).to_numpy()
        nb = cs.reindex(g["b"]).to_numpy()
        jac = round6(g["inter"].to_numpy() / (na + nb - g["inter"].to_numpy()))
        out = pd.DataFrame({"a": g["a"], "b": g["b"], "jaccard": jac})
        out = out[out["jaccard"] >= threshold]
        return _ensure_pair_schema(
            rd.from_arrow(pa.Table.from_pandas(out, preserve_index=False)
                          .replace_schema_metadata(None)), empty)

    pairs = to_arrow_blocks(keyed.groupby("bucket")
                            .map_groups(pair_explode, batch_format="pandas"))
    inter = _psum(pairs.map_batches(
        lambda b: b.append_column("one", pa.array(np.ones(b.num_rows, np.int64))),
        batch_format="pyarrow"), ["a", "b"], "one") \
        .rename_columns({"one": "inter"})
    j1 = safe_join(inter, counts, "inner", 4, on=("a",), right_on=(id_col,))
    j1 = j1.rename_columns({"n_sh": "na"}).select_columns(["a", "b", "inter", "na"])
    j2 = safe_join(j1, counts, "inner", 4, on=("b",), right_on=(id_col,))
    j2 = j2.rename_columns({"n_sh": "nb"})

    def finish(batch: pa.Table) -> pa.Table:
        inter = batch["inter"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = batch["na"].to_numpy(zero_copy_only=False).astype(np.float64)
        nb = batch["nb"].to_numpy(zero_copy_only=False).astype(np.float64)
        jac = round6(inter / (na + nb - inter))
        keep = jac >= threshold
        return pa.table({
            "a": pa.array(batch["a"].to_numpy(zero_copy_only=False)[keep]),
            "b": pa.array(batch["b"].to_numpy(zero_copy_only=False)[keep]),
            "jaccard": pa.array(jac[keep])})

    return _ensure_pair_schema(j2.map_batches(finish, batch_format="pyarrow"),
                               {"a": pa.int64(), "b": pa.int64(),
                                "jaccard": pa.float64()})


# ---------------- SimHash ----------------

class SimHash:
    """64-bit simhash over word hashes → (id, simhash:uint64): one md5
    per distinct token (actor-cached), bit-majority accumulated with a
    per-doc reduceat — no per-row Python. SQL-replicable."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col

    def simhash_all(self, texts) -> np.ndarray:
        n = len(texts)
        doc_idx, toks = _token_arrays(texts)  # duplicates preserved
        out = np.zeros(n, dtype=np.uint64)
        if not len(toks):
            return out
        hu, inv = _md5_u64(toks, hexdigits=16)  # md5 per DISTINCT token
        # bit matrix of the distinct hashes only (unpackbits), as
        # float32: ufunc.reduceat's float32 loop is SIMD-vectorized
        # (~5x the integer loops) and counts ≤ 2^24 stay exact
        bits_u = np.unpackbits(hu.view(np.uint8).reshape(-1, 8), axis=1,
                               bitorder="little").astype(np.float32)
        order = np.argsort(doc_idx, kind="stable")
        uniq, starts = np.unique(doc_idx[order], return_index=True)
        ones = np.add.reduceat(bits_u.take(inv[order], axis=0), starts, axis=0)
        ntok = np.diff(np.append(starts, len(doc_idx))).astype(np.float32)
        acc = 2.0 * ones - ntok[:, None]
        sh = ((acc > 0).astype(np.uint64)
              << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1)
        out[uniq] = sh
        return out

    @staticmethod
    def simhash(text: str) -> int:
        return int(SimHash().simhash_all([text])[0])

    def __call__(self, batch):
        # accepts pyarrow (hot path — no pandas copy of text) or pandas
        if isinstance(batch, pa.Table):
            sh = self.simhash_all(
                batch[self.text_col].to_numpy(zero_copy_only=False))
            return pa.table({self.id_col: batch[self.id_col],
                             "simhash": pa.array(sh)})
        return pd.DataFrame({
            self.id_col: batch[self.id_col],
            "simhash": self.simhash_all(batch[self.text_col].to_numpy()),
        })


def simhash_pairs(docs: rd.Dataset, *, max_hamming: int = 8,
                  id_col: str = "doc_id", text_col: str = "text",
                  collapse_dups: bool = True) -> rd.Dataset:
    """Near-dup pairs with simhash hamming distance ≤ max_hamming.
    Banded: 4 16-bit bands; a pair within distance ≤ max_hamming<16
    shares at least one exact band (pigeonhole holds for ≤3 flips per
    64/16 bands; for larger budgets recall is approximate — documented).

    ``collapse_dups`` (default) computes over one representative per
    distinct text and expands — identical texts have identical
    simhashes (hamming 0, always ≤ max_hamming), so the result equals
    the direct computation's, including empty-text duplicate groups
    (simhash 0); engages only when ≥ 5% of docs are duplicates
    (results identical either way, parity-tested)."""
    if collapse_dups and max_hamming >= 0:
        out = _collapsed_pairs(
            docs,
            lambda reps: _simhash_pairs_direct(
                reps, max_hamming=max_hamming, id_col=id_col,
                text_col=text_col),
            id_col=id_col, text_col=text_col, measure_col="hamming",
            self_measure=0, measure_type=pa.int64(),
            emit_self=True, require_nz=False, min_dup_fraction=0.05)
        if out is not None:
            return out
    return _simhash_pairs_direct(docs, max_hamming=max_hamming,
                                 id_col=id_col, text_col=text_col)


def _simhash_pairs_direct(docs: rd.Dataset, *, max_hamming: int = 8,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> rd.Dataset:
    sigs = to_arrow_blocks(docs.map_batches(SimHash(id_col, text_col),
                                        batch_format="pyarrow")).materialize()

    def to_bands(batch: pa.Table) -> pa.Table:
        # Arrow-native (zero-copy numeric view of both input columns)
        h = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        out_ids = np.repeat(ids, 4)
        band = np.tile(np.arange(4, dtype=np.int64), len(ids))
        key = ((np.repeat(h, 4) >> (np.uint64(16) * band.astype(np.uint64)))
               & np.uint64(0xFFFF)).astype(np.int64)
        return pa.table({id_col: pa.array(out_ids), "band": pa.array(band),
                         "bkey": pa.array(key)})

    buckets = sigs.map_batches(to_bands, batch_format="pyarrow")
    cand = _bucketed_pairs(buckets, ["band", "bkey"], id_col).materialize()

    # small regime: verify hamming on the driver from a broadcast-free
    # signature fetch (is_in filter) — skips two hash joins
    if cand.count() <= VERIFY_DRIVER_PAIR_LIMIT:
        cp = cand.to_pandas()
        empty = {"a": pa.int64(), "b": pa.int64(), "hamming": pa.int64()}
        if not len(cp):
            return _ensure_pair_schema(cand, empty)
        import ray

        from neo4j_graph_algorithms_ray.util import popcount64
        need = ray.put(np.unique(np.concatenate([cp["a"].to_numpy(),
                                                 cp["b"].to_numpy()])))

        def pick(b: pa.Table) -> pa.Table:
            return b.filter(pc.is_in(b[id_col],
                                     value_set=pa.array(ray.get(need))))

        sg = sigs.map_batches(pick, batch_format="pyarrow").to_pandas()
        m = pd.Series(sg["simhash"].to_numpy(dtype=np.uint64),
                      index=sg[id_col].to_numpy())
        x = (m.reindex(cp["a"]).to_numpy(dtype=np.uint64)
             ^ m.reindex(cp["b"]).to_numpy(dtype=np.uint64))
        cp["hamming"] = popcount64(x).astype(np.int64)
        out = cp[cp["hamming"] <= max_hamming][["a", "b", "hamming"]]
        return _ensure_pair_schema(
            rd.from_arrow(pa.Table.from_pandas(out, preserve_index=False)
                          .replace_schema_metadata(None)), empty)

    sa = safe_join(cand, sigs, "inner", 4, on=("a",), right_on=(id_col,))
    sa = sa.rename_columns({"simhash": "ha"}).select_columns(["a", "b", "ha"])
    sb = safe_join(sa, sigs, "inner", 4, on=("b",), right_on=(id_col,))
    sb = sb.rename_columns({"simhash": "hb"})

    def verify(batch: pa.Table) -> pa.Table:
        from neo4j_graph_algorithms_ray.util import popcount64
        x = (batch["ha"].to_numpy(zero_copy_only=False).astype(np.uint64)
             ^ batch["hb"].to_numpy(zero_copy_only=False).astype(np.uint64))
        d = popcount64(x).astype(np.int64)
        keep = d <= max_hamming
        return pa.table({
            "a": pa.array(batch["a"].to_numpy(zero_copy_only=False)[keep]),
            "b": pa.array(batch["b"].to_numpy(zero_copy_only=False)[keep]),
            "hamming": pa.array(d[keep])})

    return _ensure_pair_schema(sb.map_batches(verify, batch_format="pyarrow"),
                               {"a": pa.int64(), "b": pa.int64(),
                                "hamming": pa.int64()})


# ---------------- embedding cosine near-dup ----------------

def embedding_neardup_pairs(emb: rd.Dataset, *, threshold: float = 0.95,
                            id_col: str = "vec_id", vec_col: str = "embedding",
                            block_col: str | None = "label",
                            group_cap: int = 100_000) -> rd.Dataset:
    """Pairs with cosine ≥ threshold, blocked by ``block_col`` (the
    IVF-style candidate restriction: only same-block pairs are compared;
    at web scale the block is a coarse quantizer cell).

    ``group_cap`` makes the within-block all-pairs contract EXPLICIT:
    a block larger than the cap raises instead of silently attempting a
    quadratic comparison (a 10M-vector cell would be 10^14 cosine
    pairs). Blocks that trip the cap need a finer quantizer (more IVF
    cells) or the LSH path — that re-blocking decision belongs to the
    caller, not here, so failing loudly is the correct scale behavior."""
    from neo4j_graph_algorithms_ray.functions.text import round6

    def pergroup(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) > group_cap:
            blk = g[block_col].iloc[0] if block_col else "<all>"
            raise ValueError(
                f"embedding_neardup_pairs: block {blk!r} has {len(g)} "
                f"vectors > group_cap={group_cap}; use a finer quantizer "
                "(more blocks) or an LSH candidate stage")
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
        one = emb.map_batches(
            lambda b: b.append_column("_blk", pa.array(np.zeros(b.num_rows, np.int64))),
            batch_format="pyarrow")
        return _ensure_pair_schema(
            one.groupby("_blk").map_groups(pergroup, batch_format="pandas"),
            {"a": pa.int64(), "b": pa.int64(), "cosine": pa.float64()})
    return _ensure_pair_schema(
        emb.groupby(block_col).map_groups(pergroup, batch_format="pandas"),
        {"a": pa.int64(), "b": pa.int64(), "cosine": pa.float64()})


# ---------------- near-dup cluster resolution (pairs -> corpus filter) ----------------

def neardup_clusters(docs: rd.Dataset, pairs: rd.Dataset | None = None, *,
                     num_perm: int = 8, bands: int = 4, k: int = 3,
                     threshold: float = 0.5,
                     id_col: str = "doc_id", text_col: str = "text") -> rd.Dataset:
    """Resolve near-duplicate *clusters* over the whole corpus:
    (doc_id, rep_id) where rep_id = min doc id of the doc's near-dup
    connected component (docs with no near-dup map to themselves).
    Keeping ``doc_id == rep_id`` rows IS the deduplicated corpus — the
    end-to-end shape of web-scale fuzzy dedup (pairs alone are not a
    dedup decision; transitive closure is).

    ``pairs`` defaults to :func:`minhash_lsh_pairs` on ``docs``; any
    (a, b) pair Dataset works (simhash, embedding cosine, ...).

    Scale shape: the pair graph is sparse (bounded by LSH collisions,
    orders of magnitude smaller than the corpus), and the transitive
    closure runs on the engine's own distributed WCC kernel — no
    driver-side union-find over the corpus. The rep mapping reaches the
    corpus via a hash join, not a broadcast.
    """
    from neo4j_graph_algorithms_ray.algorithms.wcc import wcc
    from neo4j_graph_algorithms_ray.graph import build_graph

    if pairs is None:
        pairs = minhash_lsh_pairs(docs, num_perm=num_perm, bands=bands, k=k,
                                  threshold=threshold, id_col=id_col,
                                  text_col=text_col)
    ids = docs.select_columns([id_col])
    pairs = to_arrow_blocks(pairs).select_columns(["a", "b"]).materialize()
    npairs = pairs.count()
    if npairs == 0:
        return ids.map_batches(
            lambda b: b.append_column("rep_id", b[id_col]),
            batch_format="pyarrow")

    # small regime: the PAIR set (not the corpus) fits the driver →
    # vectorized min-label union-find over the pairs, rep map broadcast
    # into a corpus-side lookup (same regime split as build_graph /
    # translate_vid_columns; the BSP kernel costs seconds of actor
    # spin-up that a 10^6-row pair graph doesn't need).
    if npairs <= VERIFY_DRIVER_PAIR_LIMIT:
        import ray

        from neo4j_graph_algorithms_ray.util import collect_arrow
        pt = pa.concat_tables(collect_arrow(pairs))
        a = pt["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = pt["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        inv, uniq = pd.factorize(np.concatenate([a, b]))
        lab = np.arange(len(uniq), dtype=np.int64)
        ea, eb = inv[:len(a)], inv[len(a):]
        while True:  # min-label propagation; O(diameter) vectorized sweeps
            la = np.minimum(lab[ea], lab[eb])
            new = lab.copy()
            np.minimum.at(new, ea, la)
            np.minimum.at(new, eb, la)
            new = new[new]  # pointer-jump halves remaining depth
            if np.array_equal(new, lab):
                break
            lab = new
        # canonical rep = MIN member id (label indices follow pandas
        # first-seen order, not value order) — min node id per root
        comp = pd.DataFrame({"root": lab, "nid": uniq.astype(np.int64)})
        minid = comp.groupby("root")["nid"].transform("min")
        rep = pd.Series(minid.to_numpy(), index=uniq)
        rref = ray.put(rep)

        def attach(t: pa.Table) -> pa.Table:
            m = ray.get(rref)
            idv = t[id_col].to_numpy(zero_copy_only=False)
            rv = m.reindex(idv).to_numpy()
            rv = np.where(pd.isna(rv), idv, rv).astype(np.int64)
            return pa.table({id_col: t[id_col], "rep_id": rv})

        return ids.map_batches(attach, batch_format="pyarrow")

    # min-label WCC over the pair graph; vids ascend with original ids,
    # so the min-vid component label translates to the min doc id.
    from neo4j_graph_algorithms_ray.algorithms.common import translate_vid_columns
    g = build_graph(pairs, "a", "b", undirected=True, dedup=True,
                    name="neardup")
    comp = translate_vid_columns(g, wcc(g).dataset, ["component"])
    comp = comp.rename_columns({"node": "__dn", "component": "__rep"})

    out = safe_join(ids, comp, "left_outer", 8, on=(id_col,),
                    right_on=("__dn",))

    def finish(b: pa.Table) -> pa.Table:
        rep = pc.coalesce(b["__rep"], b[id_col])
        return pa.table({id_col: b[id_col], "rep_id": pc.cast(rep, pa.int64())})

    return to_arrow_blocks(out).map_batches(finish, batch_format="pyarrow")


def ngram_containment_pairs(docs: rd.Dataset, *, k: int = 3,
                            threshold: float = 0.8,
                            df_cap: int = NGRAM_DF_CAP,
                            id_col: str = "doc_id",
                            text_col: str = "text") -> rd.Dataset:
    """DIRECTIONAL near-dup pairs by word-k-gram containment:
    (src, dst, containment) with containment = |sh(src) ∩ sh(dst)| /
    |sh(src)| ≥ threshold, both directions emitted. Containment
    catches what Jaccard structurally misses — a short doc quoted or
    embedded inside a longer one scores ~1 from the short side while
    the pair's Jaccard stays low. The quote/superset detection
    primitive of fuzzy dedup (Broder 1997's "containment").

    Raw-doc formulation (no exact-duplicate collapse; mirror the SQL
    when composing). Same scale skeleton as ngram_jaccard_pairs:
    distinct-shingle explode, df-cap hub guard, per-shingle pair
    explode bucketed by shingle hash, map-side-combined intersection
    counts, driver escape below SMALL_AGG_DRIVER_LIMIT.
    """
    from neo4j_graph_algorithms_ray.functions.text import round6
    from neo4j_graph_algorithms_ray.util import (SMALL_AGG_DRIVER_LIMIT,
                                                 drop_empty_blocks, safe_join)
    from neo4j_graph_algorithms_ray.util import preagg_sum as _psum

    def explode(batch: pa.Table) -> pa.Table:
        # Arrow-native: the wide text column never transits pandas
        di, sh = _dedupe_doc_strings(*_shingle_arrays(
            batch[text_col].to_numpy(zero_copy_only=False), k))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table({id_col: pa.array(ids[di]), "sh": pa.array(sh)})

    sh = drop_empty_blocks(to_arrow_blocks(
        docs.map_batches(explode, batch_format="pyarrow")))
    counts = _psum(sh.map_batches(
        lambda b: b.group_by(id_col).aggregate([("sh", "count")])
                   .rename_columns([id_col, "n_sh"]),
        batch_format="pyarrow"), [id_col], "n_sh")

    def pair_explode(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["k", id_col])
        kk = g["k"].to_numpy()
        d = g[id_col].to_numpy(dtype=np.int64)
        if not len(kk):
            return pd.DataFrame({"a": np.empty(0, np.int64),
                                 "b": np.empty(0, np.int64)})
        newseg = np.empty(len(kk), dtype=bool)
        newseg[0] = True
        newseg[1:] = kk[1:] != kk[:-1]
        a, b = _segmented_pairs(d, np.nonzero(newseg)[0], df_cap)
        return pd.DataFrame({"a": a, "b": b})

    def add_bucket(batch: pa.Table) -> pa.Table:
        ksh = batch["sh"].combine_chunks()
        bucket = (pd.util.hash_array(ksh.to_numpy(zero_copy_only=False))
                  % 128).astype(np.int64)
        return pa.table({"k": ksh, id_col: batch[id_col],
                         "bucket": pa.array(bucket)})

    keyed = drop_empty_blocks(to_arrow_blocks(
        sh.map_batches(add_bucket, batch_format="pyarrow")))
    empty = {"src": pa.int64(), "dst": pa.int64(),
             "containment": pa.float64()}

    def both_dirs(g: pd.DataFrame, cs: pd.Series) -> pd.DataFrame:
        inter = g["inter"].to_numpy()
        a, b = g["a"].to_numpy(), g["b"].to_numpy()
        na = cs.reindex(a).to_numpy()
        nb = cs.reindex(b).to_numpy()
        out = pd.DataFrame({
            "src": np.concatenate([a, b]),
            "dst": np.concatenate([b, a]),
            "containment": round6(np.concatenate([inter / na, inter / nb]))})
        return out[out["containment"] >= threshold]

    if keyed.count() <= SMALL_AGG_DRIVER_LIMIT:
        import ray
        tabs = [t for t in (ray.get(r) for r in keyed.to_arrow_refs())
                if t.num_rows]
        frame = (pa.concat_tables(tabs).to_pandas()
                 if tabs else pd.DataFrame({"k": [], id_col: []}))
        pdf = pair_explode(frame)
        if not len(pdf):
            return _ensure_pair_schema(
                rd.from_arrow(pa.table({c: pa.array([], t)
                                        for c, t in empty.items()})), empty)
        g = pdf.groupby(["a", "b"]).size().reset_index(name="inter")
        cdf = counts.to_pandas()
        cs = pd.Series(cdf["n_sh"].to_numpy(), index=cdf[id_col].to_numpy())
        out = both_dirs(g, cs)
        return _ensure_pair_schema(
            rd.from_arrow(pa.Table.from_pandas(out, preserve_index=False)
                          .replace_schema_metadata(None)), empty)

    pairs = to_arrow_blocks(keyed.groupby("bucket")
                            .map_groups(pair_explode, batch_format="pandas"))
    inter = _psum(pairs.map_batches(
        lambda b: b.append_column("one", pa.array(np.ones(b.num_rows, np.int64))),
        batch_format="pyarrow"), ["a", "b"], "one") \
        .rename_columns({"one": "inter"})
    j1 = safe_join(inter, counts, "inner", 4, on=("a",), right_on=(id_col,))
    j1 = j1.rename_columns({"n_sh": "na"}).select_columns(["a", "b", "inter", "na"])
    j2 = safe_join(j1, counts, "inner", 4, on=("b",), right_on=(id_col,))
    j2 = j2.rename_columns({"n_sh": "nb"})

    def finish(batch: pa.Table) -> pa.Table:
        inter = batch["inter"].to_numpy(zero_copy_only=False).astype(np.float64)
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        na = batch["na"].to_numpy(zero_copy_only=False).astype(np.float64)
        nb = batch["nb"].to_numpy(zero_copy_only=False).astype(np.float64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        cont = round6(np.concatenate([inter / na, inter / nb]))
        keep = cont >= threshold
        return pa.table({"src": pa.array(src[keep]),
                         "dst": pa.array(dst[keep]),
                         "containment": pa.array(cont[keep])})

    return _ensure_pair_schema(j2.map_batches(finish, batch_format="pyarrow"),
                               empty)


def minhash_eval(docs: rd.Dataset, *, num_perm: int = 8, bands: int = 4,
                 k: int = 3, threshold: float = 0.5,
                 df_cap: int = NGRAM_DF_CAP, id_col: str = "doc_id",
                 text_col: str = "text"):
    """MinHash-LSH quality report: how much of the exact near-dup pair
    set (``ngram_jaccard_pairs``, the all-pairs ground truth) does the
    banded-LSH pipeline (``minhash_lsh_pairs``) recover? One row
    (n_exact, n_lsh, n_both, recall, precision) — the
    banding-parameter tuning loop (more bands → higher recall, more
    candidate verification work) run as an engine self-evaluation.

    Both sides can miss the other legitimately: LSH misses true pairs
    whose signatures never collide in a band (the recall gap being
    measured), and LSH-verified pairs can fall outside the exact set
    when held together only by shingles above the exact side's df
    hub-cap (precision < 1 flags exactly those).

    Scale shape: both pair sets stream through their own factorized
    pipelines; the comparison is a flagged union → ``preagg_sum`` on
    the pair key → per-batch count partials, so only per-batch partial
    triples reach the driver-side sum. Returns a one-row pandas
    DataFrame."""
    exact = ngram_jaccard_pairs(docs, k=k, threshold=threshold,
                                df_cap=df_cap, id_col=id_col,
                                text_col=text_col)
    lsh = minhash_lsh_pairs(docs, num_perm=num_perm, bands=bands, k=k,
                            threshold=threshold, id_col=id_col,
                            text_col=text_col)
    return _pair_set_report(exact, lsh)


def _pair_set_report(exact: rd.Dataset, cand: rd.Dataset):
    """Recall/precision of a candidate (a, b) pair set against an
    exact one: flagged union → pair-key ``preagg_sum`` → per-batch
    count partials; only partial triples reach the driver-side sum.
    One-row pandas DataFrame (n_exact, n_lsh, n_both, recall,
    precision)."""
    import pandas as pd_

    from neo4j_graph_algorithms_ray.functions.text import round6
    from neo4j_graph_algorithms_ray.util import preagg_sum

    def flag(in_e: int, in_l: int):
        def f(b: pa.Table) -> pa.Table:
            n = b.num_rows
            return pa.table({"a": b["a"], "b": b["b"],
                             "in_e": pa.array(np.full(n, in_e, np.int64)),
                             "in_l": pa.array(np.full(n, in_l, np.int64))})
        return f

    u = exact.select_columns(["a", "b"]) \
        .map_batches(flag(1, 0), batch_format="pyarrow") \
        .union(cand.select_columns(["a", "b"])
               .map_batches(flag(0, 1), batch_format="pyarrow"))
    m = preagg_sum(u, ["a", "b"], ["in_e", "in_l"])

    def partials(b: pa.Table) -> pa.Table:
        e = b["in_e"].to_numpy(zero_copy_only=False) > 0
        ll = b["in_l"].to_numpy(zero_copy_only=False) > 0
        return pa.table({"n_exact": pa.array([int(e.sum())]),
                         "n_lsh": pa.array([int(ll.sum())]),
                         "n_both": pa.array([int((e & ll).sum())])})

    agg = m.map_batches(partials, batch_format="pyarrow")
    s = agg.sum(["n_exact", "n_lsh", "n_both"]) or {}
    ne = int(s.get("sum(n_exact)") or 0)
    nl = int(s.get("sum(n_lsh)") or 0)
    nb = int(s.get("sum(n_both)") or 0)
    r6 = lambda x: float(round6(np.array([x]))[0])  # noqa: E731
    return pd_.DataFrame({
        "n_exact": [ne], "n_lsh": [nl], "n_both": [nb],
        "recall": [r6(nb / ne) if ne else 0.0],
        "precision": [r6(nb / nl) if nl else 0.0]})


def simhash_eval(docs: rd.Dataset, *, max_hamming: int = 8, k: int = 3,
                 threshold: float = 0.5, df_cap: int = NGRAM_DF_CAP,
                 id_col: str = "doc_id", text_col: str = "text"):
    """SimHash quality report: recall/precision of the hamming-verified
    SimHash pair set against the exact n-gram-Jaccard ground truth —
    unlike MinHash-LSH the SimHash side is NOT Jaccard-verified, so
    both its misses (sketch collisions that never happen) and its
    extras (hamming-close docs below the Jaccard bar) show up here.
    The pick-your-sketch companion to :func:`minhash_eval`; same
    flagged-union comparison shape."""
    exact = ngram_jaccard_pairs(docs, k=k, threshold=threshold,
                                df_cap=df_cap, id_col=id_col,
                                text_col=text_col)
    cand = simhash_pairs(docs, max_hamming=max_hamming, id_col=id_col,
                         text_col=text_col)
    return _pair_set_report(exact, cand)


def dedup_sensitivity(docs: rd.Dataset, *, thresholds=(0.3, 0.5, 0.8),
                      num_perm: int = 8, bands: int = 4, k: int = 3,
                      id_col: str = "doc_id", text_col: str = "text"):
    """Threshold-sensitivity sweep for fuzzy dedup: for each Jaccard
    threshold, resolve the near-dup clusters (minhash→LSH→verify→WCC)
    and report (threshold, n_pairs, n_dup_clusters, n_docs_in_dups,
    n_removed) — how many docs a keep-one-representative dedup would
    drop. The pick-the-threshold report run BEFORE committing a 100 TB
    dedup pass.

    Scale shape: one pipeline per threshold (thresholds are a handful);
    within each, cluster sizes reduce through a rep-keyed
    ``preagg_sum`` and only per-batch partial triples reach the
    driver. Returns a pandas DataFrame ordered by threshold."""
    import pandas as pd_

    from neo4j_graph_algorithms_ray.util import preagg_sum

    rows = []
    for thr in sorted(thresholds):
        pairs = minhash_lsh_pairs(docs, num_perm=num_perm, bands=bands,
                                  k=k, threshold=thr, id_col=id_col,
                                  text_col=text_col) \
            .select_columns(["a", "b"]).materialize()
        n_pairs = pairs.count()
        clusters = neardup_clusters(docs, pairs, id_col=id_col,
                                    text_col=text_col)

        def ones(b: pa.Table) -> pa.Table:
            return pa.table({"rep_id": b["rep_id"],
                             "sz": pa.array(np.ones(b.num_rows, np.int64))})

        sizes = preagg_sum(clusters.map_batches(ones, batch_format="pyarrow"),
                           ["rep_id"], "sz")

        def partials(b: pa.Table) -> pa.Table:
            sz = b["sz"].to_numpy(zero_copy_only=False)
            dup = sz[sz > 1]
            return pa.table({"n_dup_clusters": pa.array([len(dup)]),
                             "n_docs_in_dups": pa.array([int(dup.sum())])})

        s = sizes.map_batches(partials, batch_format="pyarrow") \
            .sum(["n_dup_clusters", "n_docs_in_dups"]) or {}
        nc = int(s.get("sum(n_dup_clusters)") or 0)
        nd = int(s.get("sum(n_docs_in_dups)") or 0)
        rows.append((float(thr), int(n_pairs), nc, nd, nd - nc))
    return pd_.DataFrame(rows, columns=[
        "threshold", "n_pairs", "n_dup_clusters", "n_docs_in_dups",
        "n_removed"]).astype({"n_pairs": "int64", "n_dup_clusters": "int64",
                              "n_docs_in_dups": "int64",
                              "n_removed": "int64"})


def incremental_dedup(new_docs: rd.Dataset, old_docs: rd.Dataset, *,
                      id_col: str = "doc_id", text_col: str = "text",
                      bits_per_key: int = 16, num_hashes: int = 4,
                      bloom_limit_bits: int | None = None,
                      num_partitions: int = 32) -> rd.Dataset:
    """Cross-snapshot exact dedup with a Bloom prefilter — the rolling
    corpus-build pattern: each new crawl snapshot is deduplicated
    against the corpus-so-far WITHOUT joining the full new snapshot
    against the full old corpus. Returns the ``id_col`` of new-snapshot
    docs whose normalized-text fingerprint (md5 of
    lower→collapse-ws→trim, = functions/text.Fingerprint) does NOT
    appear in the old snapshot.

    EXACT semantics — the Bloom only prunes: new docs that miss the
    filter are definitely-new (no false negatives) and skip the join
    entirely; the (few) hits — true duplicates plus the ~0.05% false
    positives at 16 bits/key — are verified with an exact anti-join on
    the full 128-bit hex fingerprint. Output is therefore identical to
    the plain anti-join whatever the filter's FP rate.

    Scale shape: the filter is sized ``bits_per_key`` · old-count and
    broadcast once via ``ray.put`` (read zero-copy per node); per-batch
    build partials are (word, bits) rows OR-merged into one numpy
    scatter on the driver. Past ``bloom_limit_bits`` (default
    NGA_INCR_BLOOM_LIMIT_BITS = 2^30 ≈ 134 MB packed — ~67M old docs
    at 16 bits/key) the prefilter is skipped and every new doc goes to
    the anti-join: same output, one shuffle more. Beyond-reference
    corpus operator; oracle: INCREMENTAL_DEDUP_SQL (plain anti-join on
    the same md5 expression)."""
    import os

    import ray

    from neo4j_graph_algorithms_ray.functions.text import Fingerprint
    from neo4j_graph_algorithms_ray.util import safe_join

    new_fp = new_docs.map_batches(Fingerprint(id_col, text_col),
                                  batch_format="pyarrow")
    # consumed twice (filter build + verify marks): materialize the
    # 32-byte-per-doc fp column once rather than re-running the md5
    # pass over the full old corpus
    old_fp = old_docs.map_batches(Fingerprint(id_col, text_col),
                                  batch_format="pyarrow") \
        .select_columns(["fingerprint"]).materialize()

    limit = (bloom_limit_bits if bloom_limit_bits is not None
             else int(os.environ.get("NGA_INCR_BLOOM_LIMIT_BITS", 1 << 30)))
    n_old = old_docs.count()
    m = max(1024, bits_per_key * n_old)
    use_bloom = m <= limit
    if use_bloom:
        nwords = (m + 31) // 32

        def bloom_partial(b: pa.Table) -> pa.Table:
            fps = np.asarray(b["fingerprint"].to_pylist(), dtype=object)
            if len(fps) == 0:
                return pa.table({"word": pa.array([], pa.int64()),
                                 "bits": pa.array([], pa.int64())})
            pos_list = []
            for j in range(num_hashes):
                salted = np.char.add(fps.astype(str),
                                     f"|incr:{j}").astype(object)
                h, inv = _md5_u64(salted, 16)
                pos_list.append((h[inv] % np.uint64(m)).astype(np.int64))
            pos = np.concatenate(pos_list)
            word = pos // 32
            bit = (np.int64(1) << (pos % 32)).astype(np.int64)
            order = np.argsort(word, kind="stable")
            word, bit = word[order], bit[order]
            uniq, starts = np.unique(word, return_index=True)
            return pa.table({"word": pa.array(uniq),
                             "bits": pa.array(
                                 np.bitwise_or.reduceat(bit, starts))})

        parts = [t for t in ray.get(
            old_fp.map_batches(bloom_partial, batch_format="pyarrow")
                  .to_arrow_refs()) if t.num_rows]
        bloom = np.zeros(nwords, np.int64)
        for t in parts:
            w = t["word"].to_numpy(zero_copy_only=False)
            v = t["bits"].to_numpy(zero_copy_only=False)
            np.bitwise_or.at(bloom, w, v)
        bloom_ref = ray.put(bloom)

        def probe(b: pa.Table) -> pa.Table:
            fps = np.asarray(b["fingerprint"].to_pylist(), dtype=object)
            if len(fps) == 0:
                return b.append_column("_hit", pa.array([], pa.bool_()))
            blm = ray.get(bloom_ref)  # local plasma, zero-copy
            hit = np.ones(len(fps), dtype=bool)
            for j in range(num_hashes):
                salted = np.char.add(fps.astype(str),
                                     f"|incr:{j}").astype(object)
                h, inv = _md5_u64(salted, 16)
                pos = (h[inv] % np.uint64(m)).astype(np.int64)
                hit &= (blm[pos // 32] >> (pos % 32)).astype(bool) & True
            return b.append_column("_hit", pa.array(hit))

        probed = new_fp.map_batches(probe, batch_format="pyarrow") \
                       .materialize()
        definite = probed.filter(expr="_hit == False") \
                         .select_columns([id_col])
        cand = probed.filter(expr="_hit == True") \
                     .select_columns([id_col, "fingerprint"])
    else:
        definite = None
        cand = new_fp

    marks = old_fp.map_batches(
        lambda b: pa.table({
            "fingerprint": b["fingerprint"],
            "_dup": pa.array(np.ones(b.num_rows, dtype=np.int8))}),
        batch_format="pyarrow")
    from neo4j_graph_algorithms_ray.util import predistinct
    marks = predistinct(marks, ["fingerprint", "_dup"])
    joined = safe_join(cand, marks, "left_outer", num_partitions,
                       on=("fingerprint",))
    kept = joined.map_batches(
        lambda b: b.filter(pc.is_null(b["_dup"])).select([id_col]),
        batch_format="pyarrow")
    return kept.union(definite) if definite is not None else kept
