"""Streaming cardinality sketches over the document corpus.

HyperLogLog (Flajolet et al. 2007) with md5-pinned hashing: the
distinct-count primitive a 100-TB corpus pipeline uses where an exact
``COUNT(DISTINCT token)`` would shuffle the whole vocabulary. The
register table is a deterministic function of the corpus (every hash
is the repo-standard md5-60bit), so a DuckDB oracle reproduces it
bit-for-bit — and merging sketches is a per-register max, which is
exactly the map-side combine the Ray plan uses (util.preagg_max), so
the exchange carries at most ``m`` rows per batch regardless of corpus
size.

Layout (m = 256 registers, 60-bit hash h):
  register = h % m                 (low bits)
  rest     = h // m                (52 bits)
  rho      = 52 - floor(log2(rest))   [= leading-zeros+1; 53 if rest=0]
floor(log2(rest)) is computed in float64 on BOTH sides (numpy here,
DuckDB in the oracle) and the two round identically, which is the
parity contract. It is NOT exact in corner cases: for rest within ~11
of 2^52 (and analogously just below lower powers of two), float64
log2 rounds up across the integer boundary, yielding rho one lower
than the true leading-zero count (e.g. rest = 2^52-1 → rho 0, true
rho 1). The register value can therefore deviate from textbook HLL by
1 on ~2^-40 of hashes — irrelevant to the estimate and bit-identical
between engine and oracle, which is what the value-hash gate checks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

HLL_M = 256          # registers (b = 8 index bits)
HLL_REST_BITS = 52   # 60-bit md5 hash minus the 8 index bits


def _hll_partial(b: pa.Table, text_col: str) -> pa.Table:
    from neo4j_graph_algorithms_ray.functions.dedup import (_md5_u64,
                                                            _token_arrays)
    _, toks = _token_arrays(b[text_col])
    if len(toks) == 0:
        return pa.table({"register": pa.array([], pa.int64()),
                         "max_rho": pa.array([], pa.int64())})
    h, _ = _md5_u64(np.unique(toks), 15)
    reg = (h % HLL_M).astype(np.int64)
    rest = (h // HLL_M).astype(np.uint64)
    rho = np.full(len(h), HLL_REST_BITS + 1, dtype=np.int64)
    nz = rest > 0
    rho[nz] = HLL_REST_BITS - np.floor(np.log2(rest[nz].astype(np.float64))).astype(np.int64)
    order = np.argsort(reg, kind="stable")
    reg, rho = reg[order], rho[order]
    uniq, starts = np.unique(reg, return_index=True)
    mx = np.maximum.reduceat(rho, starts)
    return pa.table({"register": pa.array(uniq), "max_rho": pa.array(mx)})


def hll_registers(docs: rd.Dataset, *, text_col: str = "text") -> rd.Dataset:
    """(register, max_rho) HLL register table over the corpus's lowered
    whitespace tokens — only registers that saw at least one token
    appear. Deterministic; mergeable by per-register max."""
    from neo4j_graph_algorithms_ray.util import preagg_max
    parts = docs.map_batches(lambda b: _hll_partial(b, text_col),
                             batch_format="pyarrow")
    return preagg_max(parts, ["register"], "max_rho").sort("register")


def hll_estimate(registers: rd.Dataset) -> float:
    """Bias-corrected HLL cardinality estimate from a register table
    (registers absent from the table count as zero)."""
    rows = registers.take_all()
    m = HLL_M
    M = np.zeros(m)
    for r in rows:
        M[int(r["register"])] = r["max_rho"]
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -M))
    zeros = int((M == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)   # small-range correction
    return float(est)


BLOOM_BITS = 16384   # m (total filter bits)
BLOOM_K = 4          # hash functions
BLOOM_WORD = 32      # bits packed per output word (int64-safe, no sign)


def _bloom_partial(b: pa.Table, col: str) -> pa.Table:
    from neo4j_graph_algorithms_ray.functions.dedup import _md5_u64
    keys = np.unique(np.asarray(b[col].to_pylist(), dtype=object))
    if len(keys) == 0:
        return pa.table({"word": pa.array([], pa.int64()),
                         "bits": pa.array([], pa.int64())})
    pos_list = []
    for j in range(BLOOM_K):
        salted = np.array([f"{s}|bloom:{j}" for s in keys], dtype=object)
        h, _ = _md5_u64(salted, 15)
        pos_list.append((h % BLOOM_BITS).astype(np.int64))
    pos = np.concatenate(pos_list)
    word = pos // BLOOM_WORD
    bit = (np.int64(1) << (pos % BLOOM_WORD)).astype(np.int64)
    order = np.argsort(word, kind="stable")
    word, bit = word[order], bit[order]
    uniq, starts = np.unique(word, return_index=True)
    packed = np.bitwise_or.reduceat(bit, starts)
    return pa.table({"word": pa.array(uniq), "bits": pa.array(packed)})


def bloom_bits(ds: rd.Dataset, col: str) -> rd.Dataset:
    """Bloom filter over a key column → (word, bits): BLOOM_BITS bits
    packed 32 per int64 word, BLOOM_K md5-pinned hashes per key. The
    set-membership sketch a crawl pipeline uses to probe "was this URL
    already fetched" without a join against the full key table.

    Scale shape: per-batch partials are at most BLOOM_BITS/32 = 512
    rows regardless of batch size, and OR-merging is idempotent, so the
    driver-side merge stays 512 rows however large the corpus. Only
    words with at least one set bit appear."""
    parts = [t for t in ray.get(
        ds.map_batches(lambda b: _bloom_partial(b, col),
                       batch_format="pyarrow").to_arrow_refs())
        if t.num_rows]
    agg: dict[int, int] = {}
    for t in parts:
        for w, v in zip(t["word"].to_pylist(), t["bits"].to_pylist()):
            agg[w] = agg.get(w, 0) | v
    words = sorted(agg)
    return rd.from_arrow(pa.table({
        "word": pa.array(words, pa.int64()),
        "bits": pa.array([agg[w] for w in words], pa.int64())}))


def bloom_probe(bloom: rd.Dataset, keys) -> list[bool]:
    """Membership probe against a (word, bits) table — false positives
    possible, false negatives not."""
    from neo4j_graph_algorithms_ray.functions.dedup import _md5_int
    table = {r["word"]: r["bits"] for r in bloom.take_all()}
    out = []
    for s in keys:
        hit = True
        for j in range(BLOOM_K):
            pos = _md5_int(f"{s}|bloom:{j}") % BLOOM_BITS
            if not (table.get(pos // BLOOM_WORD, 0) >> (pos % BLOOM_WORD)) & 1:
                hit = False
                break
        out.append(hit)
    return out


CMS_D = 4       # hash rows
CMS_W = 1024    # buckets per row


def _cms_partial(b: pa.Table, text_col: str) -> pa.Table:
    from neo4j_graph_algorithms_ray.functions.dedup import _md5_u64, _token_arrays
    _, toks = _token_arrays(b[text_col])
    if len(toks) == 0:
        return pa.table({"row": pa.array([], pa.int64()),
                         "bucket": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64())})
    uniq, counts = np.unique(toks, return_counts=True)
    rows, buckets, ns = [], [], []
    for j in range(CMS_D):
        salted = np.array([f"{s}|cms:{j}" for s in uniq], dtype=object)
        h, _ = _md5_u64(salted, 15)
        bkt = (h % CMS_W).astype(np.int64)
        order = np.argsort(bkt, kind="stable")
        bs, cs = bkt[order], counts[order]
        ub, starts = np.unique(bs, return_index=True)
        sums = np.add.reduceat(cs, starts).astype(np.int64)
        rows.append(np.full(len(ub), j, dtype=np.int64))
        buckets.append(ub)
        ns.append(sums)
    return pa.table({"row": pa.array(np.concatenate(rows)),
                     "bucket": pa.array(np.concatenate(buckets)),
                     "n": pa.array(np.concatenate(ns))})


def cms_table(docs: rd.Dataset, *, text_col: str = "text") -> rd.Dataset:
    """Count-min sketch of token occurrence counts (Cormode &
    Muthukrishnan 2005): CMS_D md5-pinned hash rows × CMS_W buckets.
    Merging is per-cell SUM, so the sketch flows through the same
    map-side combine as every aggregate here (util.preagg_sum) and the
    exchange is capped at D·W = 4096 rows per batch whatever the corpus
    size. Point-estimate = min over the D rows (cms_estimate);
    overestimates only. Only non-zero cells appear."""
    from neo4j_graph_algorithms_ray.util import preagg_sum
    parts = docs.map_batches(lambda b: _cms_partial(b, text_col),
                             batch_format="pyarrow")
    return preagg_sum(parts, ["row", "bucket"], "n").sort(["row", "bucket"])


def cms_estimate(cms: rd.Dataset, tokens) -> dict[str, int]:
    """Point estimates for the given tokens (≥ true count)."""
    from neo4j_graph_algorithms_ray.functions.dedup import _md5_int
    cells = {(r["row"], r["bucket"]): r["n"] for r in cms.take_all()}
    out = {}
    for t in tokens:
        out[t] = min(cells.get((j, _md5_int(f"{t}|cms:{j}") % CMS_W), 0)
                     for j in range(CMS_D))
    return out


__all__ = ["hll_registers", "hll_estimate", "HLL_M",
           "bloom_bits", "bloom_probe", "BLOOM_BITS", "BLOOM_K",
           "cms_table", "cms_estimate", "CMS_D", "CMS_W"]


def heavy_hitters(ds, key_col: str, *, k: int = 20, cap: int = 512):
    """Exact top-``k`` keys by count via the two-pass Misra-Gries
    pattern → (``key_col``, n) ordered (n desc, key asc), k rows.

    The streaming-frequent-items shape a 100 TB pipeline uses instead
    of a raw groupby over billions of distinct keys:

    pass 1 — per-batch Misra-Gries compression: keep at most ``cap``
      (key, counter) pairs per batch by subtracting the (d−cap)-th
      smallest count from every counter and dropping non-positives
      (the batched MG decrement); per-batch decrement totals ride a
      sentinel row. Summing MG counters across batches (map-side
      combined groupby) is the standard mergeable-summaries bound:
      merged_counter ≤ true_count ≤ merged_counter + total_decrements.
    candidate cut — every key whose upper bound reaches the k-th
      largest lower bound survives; the guarantee is EXACTNESS of the
      final top-k, not of the sketch counts.
    pass 2 — exact recount of candidates only (broadcast membership
      filter + map-side-combined groupby), then the true top-k.

    With ``cap`` ≥ per-batch distinct keys the sketch never decrements
    and pass 1 is already exact; the knob matters only when the key
    space explodes."""
    import pyarrow.compute as pc
    import ray

    from neo4j_graph_algorithms_ray.util import collect_arrow, preagg_sum

    SENT = "\x00__mg_decrements__"

    def mg_partial(b: pa.Table) -> pa.Table:
        arr = b[key_col]
        tab = pa.table({"k": arr}).group_by("k").aggregate([("k", "count")])
        keys = tab["k"]
        cnt = tab["k_count"].to_numpy(zero_copy_only=False).astype(np.int64)
        dec = 0
        if len(cnt) > cap:
            t = np.partition(cnt, len(cnt) - cap - 1)[len(cnt) - cap - 1]
            cnt = cnt - t
            keep = cnt > 0
            keys, cnt, dec = keys.filter(pa.array(keep)), cnt[keep], int(t)
        out_k = pa.concat_arrays(
            [keys.combine_chunks() if isinstance(keys, pa.ChunkedArray)
             else keys, pa.array([SENT], pa.string())])
        return pa.table({key_col: out_k,
                         "n": pa.array(np.append(cnt, dec))})

    merged = preagg_sum(ds.select_columns([key_col]).map_batches(
        mg_partial, batch_format="pyarrow"), [key_col], "n").materialize()
    tabs = [t for t in collect_arrow(merged) if t.num_rows]
    mt = pa.concat_tables(tabs)
    kk = np.asarray(mt[key_col].to_pylist(), dtype=object)
    nn = mt["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    sent = kk == SENT
    err = int(nn[sent].sum()) if sent.any() else 0
    kk, nn = kk[~sent], nn[~sent]
    if len(kk) == 0:
        return rd.from_arrow(pa.table({key_col: pa.array([], pa.string()),
                                       "n": pa.array([], pa.int64())}))
    kth = (np.partition(nn, len(nn) - k)[len(nn) - k]
           if len(nn) >= k else 0)
    cand = frozenset(kk[nn + err >= kth])
    cand_ref = ray.put(cand)

    def exact_partial(b: pa.Table) -> pa.Table:
        cs = ray.get(cand_ref)
        mask = pc.is_in(b[key_col],
                        value_set=pa.array(sorted(cs), pa.string()))
        sub = b.filter(mask)
        tab = pa.table({key_col: sub[key_col]}).group_by(key_col) \
            .aggregate([(key_col, "count")])
        return pa.table({key_col: tab[key_col],
                         "n": tab[f"{key_col}_count"].cast(pa.int64())})

    exact = preagg_sum(ds.select_columns([key_col]).map_batches(
        exact_partial, batch_format="pyarrow"), [key_col], "n")
    etabs = [t for t in collect_arrow(exact) if t.num_rows]
    et = pa.concat_tables(etabs) if etabs else pa.table(
        {key_col: pa.array([], pa.string()), "n": pa.array([], pa.int64())})
    order = pc.sort_indices(et, sort_keys=[("n", "descending"),
                                           (key_col, "ascending")])
    return rd.from_arrow(et.take(order[:k]))


def grouped_hll_distinct(ds, group_col: str, value_col: str):
    """Per-group HLL distinct-count estimate → (``group_col``,
    hit_registers, n_distinct_est): the COUNT(DISTINCT …) GROUP BY a
    100 TB pipeline replaces with a fixed-size sketch per group (e.g.
    distinct outlink targets per host for crawl budgeting).

    Scale shape: per-batch distinct (group, value) hashes fold into
    (group, register, rho) partials; the shuffle carries ≤ 256 rows per
    (group, batch) regardless of value cardinality (``preagg_max``
    merge, OR/max-idempotent like the global HLL); the estimate
    finalize is batch-local over ≤ 256-row groups. Same md5-60bit /
    float64-log2 register convention as ``hll_registers`` so a DuckDB
    oracle reproduces every register — and the estimate — exactly."""
    import pyarrow.compute as pc

    from neo4j_graph_algorithms_ray.functions.dedup import _md5_u64
    from neo4j_graph_algorithms_ray.util import preagg_max, preagg_sum

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({group_col: pa.array([], pa.string()),
                             "register": pa.array([], pa.int64()),
                             "rho": pa.array([], pa.int64())})
        import pandas as pd
        g = np.asarray(b[group_col].to_pylist(), dtype=object)
        v = np.asarray(b[value_col].to_pylist(), dtype=object)
        vals, inv = _md5_u64(v, 15)
        hv = vals[inv]
        reg = (hv % np.uint64(HLL_M)).astype(np.int64)
        rest = (hv // np.uint64(HLL_M)).astype(np.uint64)
        rho = np.full(len(hv), HLL_REST_BITS + 1, dtype=np.int64)
        nz = rest > 0
        rho[nz] = HLL_REST_BITS - np.floor(
            np.log2(rest[nz].astype(np.float64))).astype(np.int64)
        df = pd.DataFrame({"g": g, "r": reg, "rho": rho})
        mx = df.groupby(["g", "r"], sort=False)["rho"].max()
        idx = mx.index.to_frame(index=False)
        return pa.table({group_col: pa.array(idx["g"], pa.string()),
                         "register": pa.array(idx["r"].to_numpy(), pa.int64()),
                         "rho": pa.array(mx.to_numpy().astype(np.int64))})

    regs = preagg_max(ds.select_columns([group_col, value_col]).map_batches(
        partial, batch_format="pyarrow"), [group_col, "register"], "rho")

    def fold(b: pa.Table) -> pa.Table:
        import pandas as pd
        g = np.asarray(b[group_col].to_pylist(), dtype=object)
        rho = b["rho"].to_numpy(zero_copy_only=False).astype(np.float64)
        df = pd.DataFrame({"g": g, "p": np.power(2.0, -rho),
                           "one": np.ones(len(g), np.int64)})
        agg = df.groupby("g", sort=False).sum()
        return pa.table({group_col: pa.array(agg.index.to_numpy(), pa.string()),
                         "s": pa.array(agg["p"].to_numpy()),
                         "hits": pa.array(agg["one"].to_numpy()
                                          .astype(np.int64))})

    # register rows per group ≤ 256, so the fold partials merge exactly
    folded = preagg_sum(regs.map_batches(fold, batch_format="pyarrow"),
                        [group_col], ["s", "hits"])

    def finish(b: pa.Table) -> pa.Table:
        m = float(HLL_M)
        s = b["s"].to_numpy(zero_copy_only=False)
        hits = b["hits"].to_numpy(zero_copy_only=False).astype(np.int64)
        zeros = HLL_M - hits
        alpha = 0.7213 / (1.0 + 1.079 / m)
        est = alpha * m * m / (s + zeros)  # unseen registers: 2^-0 = 1
        sm = (est <= 2.5 * m) & (zeros > 0)
        with np.errstate(divide="ignore"):
            corr = m * np.log(m / np.maximum(zeros, 1))
        est = np.where(sm, corr, est)
        est = np.copysign(np.floor(np.abs(est) * 1e6 + 0.5), est) / 1e6
        return pa.table({group_col: b[group_col],
                         "hit_registers": pa.array(hits),
                         "n_distinct_est": pa.array(est)})

    return folded.map_batches(finish, batch_format="pyarrow")
