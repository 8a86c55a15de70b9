"""Range-partitioned CSR shard actors + BSP driver loop.

This is the one deliberate drop below the Dataset API: every iterative
algorithm (PageRank, WCC, label propagation, MSBFS, SSSP, SCC coloring)
needs a mutable per-vertex state vector and a static adjacency reused
across tens of iterations. Re-shuffling the edge table through a
``Dataset.join`` every iteration would move the (huge) edge table per
step; instead each shard actor builds its CSR once from the
checkpointed partitioned Parquet (graph.partition_edges) and iterations
exchange only the small pre-aggregated message vectors — the same
gather → scatter → combine → update cycle the reference runs between
thread barriers (PageRank CALC/transpose/SYNC,
algo/.../impl/PageRank.java:432-519), made distributed.

Scale notes:
- shard i owns dense vids [bounds[i], bounds[i+1]) — ranges chosen by
  accumulated degree (graph.choose_bounds), the reference's anti-skew
  partitioning policy;
- scatter pre-aggregates per unique destination inside the sender
  (np.*.reduceat over a once-precomputed dst-sorted permutation), so
  any destination receives ≤ P messages per iteration (hub-proof);
- messages route shard→shard as Ray objects (num_returns=P), an
  all-to-all of O(touched vertices) not O(edges). Direct exchange is P²
  refs per superstep — cheap at P ≤ 64 (the per-ref overhead is ~µs and
  the payloads dominate); past NGA_TWO_LEVEL_P (default 96, the
  measured single-node crossover — see _two_level_threshold) the engine
  switches to a TWO-LEVEL exchange: senders emit G = ⌈√P⌉ grouped packs
  (P·G refs), one aggregator task per group combines them op-aware
  (sum/min/max/or; 2-D sum for Brandes waves) and re-emits per-member
  messages (P refs) — P·√P + P refs total, and a hub vertex receives
  ≤ G combined messages instead of ≤ P;
- state checkpoints to Parquet per iteration with a manifest
  (per-partition lineage + metrics) and can resume (state/checkpoint.py).
"""

from __future__ import annotations

import glob
import os
import time
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from neo4j_graph_algorithms_ray.util import popcount64

# scatter-op → aggregator combine kind for the two-level exchange.
# Ops absent here (lpa's (idx,label,w) triples, bwd_color's exact pairs)
# are forwarded uncombined — still one ref per group instead of one per
# sender. Combining changes float summation ORDER only, which both the
# SQL oracles and the pytest allclose checks already tolerate (round6 /
# 1e-9), exactly as for the direct exchange.
_COMBINE_OF_OP = {
    "pr_push": "sum", "pr_push_w": "sum", "sum_state": "sum",
    "in_degree_count": "sum", "min_state": "min", "min_state_delta": "min",
    "relax": "min", "max_state_masked": "max", "bits": "or",
    "brandes_fwd": "sum2d", "brandes_bwd": "sum2d", "bits_wave": "or2d",
    "ppr_push_multi": "sum2d",
}

_COMBINE_UFUNC = {"sum": np.add, "min": np.minimum, "max": np.maximum,
                  "or": np.bitwise_or, "sum2d": np.add,
                  "or2d": np.bitwise_or}


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 (wraparound mul) —
    the per-(vid, hash-fn) PRNG for ANF sketch init."""
    with np.errstate(over="ignore"):
        x = x + np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def _indexed_combine(kind, block, locs, vals):
    """Fold one sparse (locs, vals) message into a dense block in place
    (locs are unique per message, so indexed ops are exact)."""
    if kind in ("sum", "sum2d"):
        block[locs] += vals
    elif kind == "min":
        block[locs] = np.minimum(block[locs], vals)
    elif kind == "max":
        block[locs] = np.maximum(block[locs], vals)
    else:  # "or" / "or2d"
        block[locs] |= vals


def _combine_member(kind, member_lists):
    """Merge one member shard's messages from all senders of a group
    into a single message tuple (map-side combine, tier 2). Mixed
    sparse/dense inputs fold into one dense block: dense blocks carry
    their op's combine identity in empty slots (0 for sums, the
    sentinel for min/max — _route fills them), so elementwise ufuncs
    and indexed combines compose exactly."""
    dense = [m for m in member_lists if m[0] is None]
    nz = [m for m in member_lists if m[0] is not None and len(m[0])]
    if dense:
        ufunc = _COMBINE_UFUNC[kind]
        block = dense[0][1].copy()
        for m in dense[1:]:
            ufunc(block, m[1], out=block)
        for locs, vals in nz:
            _indexed_combine(kind, block, locs, vals)
        return [(None, block)]
    if not nz:
        return [(np.empty(0, np.int64), np.empty(0))]
    locs = np.concatenate([m[0] for m in nz])
    axis0 = kind in ("sum2d", "or2d")
    vals = np.concatenate([m[1] for m in nz], axis=0)
    order = np.argsort(locs, kind="stable")
    locs_s = locs[order]
    uniq, starts = np.unique(locs_s, return_index=True)
    vals_s = np.take(vals, order, axis=0) if axis0 else vals[order]
    merged = _COMBINE_UFUNC[kind].reduceat(vals_s, starts,
                                           axis=0 if axis0 else -1)
    return [(uniq.astype(locs.dtype), merged)]


@ray.remote
def _aggregate_group(nmembers: int, combine, *packs):
    """Tier-2 exchange node: ``packs`` = one grouped pack per sender,
    each a tuple of per-member message tuples. Emits one object per
    member (num_returns=nmembers) holding a LIST of message tuples —
    combined to length 1 when the op has a combiner."""
    outs = []
    for m in range(nmembers):
        member_lists = [p[m] for p in packs]
        if combine is None:
            outs.append(list(member_lists))
        else:
            outs.append(_combine_member(combine, member_lists))
    return tuple(outs) if nmembers > 1 else outs[0]


@ray.remote
def _pj_union_group(nmembers: int, *packs):
    """Tier-2 node for the pointer-jump exchange: ``packs`` = one
    grouped pack per sender, each a tuple of per-member sorted-unique
    label-vid request arrays. Emits one deduped union per member so the
    owner answers each requested label once, not once per requester."""
    outs = tuple(
        np.unique(np.concatenate([np.asarray(p[m], np.int64)
                                  for p in packs]))
        for m in range(nmembers))
    return outs if nmembers > 1 else outs[0]


# num_cpus=0: shard actors are resident state holders that compute only
# during BSP supersteps. Reserving whole CPUs would (a) deadlock when
# P > cluster CPUs (actors are long-lived, the pool must fully
# materialize) and (b) starve concurrent Dataset stages. Parallelism is
# governed by P (default = cluster CPU count), each step being
# single-threaded numpy per shard.
@ray.remote(num_cpus=0)
class ShardActor:
    """Holds one vertex range's out-edge CSR + state slices.

    ``reverse=True`` loads the dst-partitioned layout (in-edge CSR) used
    by backward passes (SCC).
    """

    def __init__(self, part: int, bounds: np.ndarray, graph_dir: str,
                 weighted: bool = False, reverse: bool = False):
        self.part = int(part)
        self.bounds = np.asarray(bounds, dtype=np.int64)
        self.P = len(bounds) - 1
        self.lo = int(bounds[part])
        self.hi = int(bounds[part + 1])
        self.n_local = self.hi - self.lo
        self.graph_dir = graph_dir
        self.reverse = reverse
        sub = "edges_rev" if reverse else "edges"
        part_dir = os.path.join(graph_dir, sub, f"part={part}")
        files = sorted(glob.glob(os.path.join(part_dir, "*.parquet")))
        cols = ["src", "dst"] + (["weight"] if weighted else [])
        if files:
            # use_threads=False: P actors load in parallel already; each
            # defaulting to pyarrow's full thread pool (= all cores) puts
            # P × cores threads on the box and the loads thrash instead
            # of streaming (observed 26s → 160s load variance at P=32)
            tbl = pq.read_table(part_dir, columns=cols, use_threads=False)
        else:
            tbl = pa.table({c: pa.array([], type=pa.float64() if c == "weight" else pa.int64())
                            for c in cols})
        key, other = ("dst", "src") if reverse else ("src", "dst")
        k = tbl.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        o = tbl.column(other).to_numpy(zero_copy_only=False).astype(np.int64)
        w = (tbl.column("weight").to_numpy(zero_copy_only=False).astype(np.float64)
             if weighted else None)
        # int32 per-edge index arrays where the id ranges allow — the
        # scatter gather is memory-bandwidth-bound, so index bytes are
        # roughly half the traffic per edge (the reference's analogous
        # trick is int-quantized score exchange, PageRank.java:54)
        loc_dtype = np.int32 if self.n_local < (1 << 31) else np.int64
        self.glob_dtype = np.int32 if int(bounds[-1]) < (1 << 31) else np.int64
        self.m = len(k)
        self.deg = np.bincount(k - self.lo, minlength=self.n_local).astype(np.int64)
        # COMPACT resident layout: only the destination-sorted view is
        # kept — (src_in_dst_order, and dst ids implicitly as
        # uniq_dst + seg_starts run lengths). Every scatter/update op is
        # expressed in dst order, so the original edge order, the
        # dst-sort permutation and the per-edge dst column are all
        # redundant and are NOT retained: ~4 B/edge resident instead of
        # the ~20 B/edge of a flat (key_local, nbr, perm, gather) CSR —
        # the same resident-bytes battle the reference fights with
        # delta+vlong adjacency compression
        # (core/.../huge/HugeGraphFactory.java:393,428), won here by
        # de-duplication instead of bit-packing so the hot path pays
        # zero decode. Ops that need explicit per-edge dst ids (LPA
        # votes, SCC backward coloring, ranked walks) re-expand them
        # with one np.repeat over the run lengths (see _dsts).
        order = np.argsort(o, kind="stable")
        nbr_sorted = o[order]
        self.src_in_dst_order = (k[order] - self.lo).astype(loc_dtype)
        self.w_dst = w[order] if w is not None else None
        self.weighted = w is not None
        self.uniq_dst, self.seg_starts = np.unique(nbr_sorted, return_index=True)
        self.dst_slices = np.searchsorted(self.uniq_dst, self.bounds)
        # per-unique-dst target shard + local index (int32 when ranges
        # allow): messages ship (local_idx, value), 12B/row not 16B
        part_of_uniq = np.searchsorted(self.bounds, self.uniq_dst, side="right") - 1
        local_of_uniq = self.uniq_dst - self.bounds[part_of_uniq]
        max_range = int(np.max(self.bounds[1:] - self.bounds[:-1])) if self.P else 0
        self.idx_dtype = np.int32 if max_range < (1 << 31) else np.int64
        self.uniq_local = local_of_uniq.astype(self.idx_dtype)
        self.state: dict[str, np.ndarray] = {}
        self.metrics = self._fresh_metrics()

    def _dsts(self) -> np.ndarray:
        """Per-edge destination vids in dst-sorted order, re-expanded
        from the run-length form (repeat of uniq_dst by segment length).
        NOT cached: the expansion is one vectorized repeat per call and
        caching would put the 4-8 B/edge column back on the resident
        budget that dropping it bought."""
        seg_len = np.diff(np.append(self.seg_starts, self.m))
        return np.repeat(self.uniq_dst.astype(self.glob_dtype), seg_len)

    def _fresh_metrics(self):
        return {"part": self.part, "edges_scattered": 0, "msgs_out": 0,
                "scatter_ms": 0.0, "update_ms": 0.0}

    # ---- introspection ----
    def info(self):
        resident = (self.src_in_dst_order.nbytes + self.deg.nbytes
                    + self.uniq_dst.nbytes + self.seg_starts.nbytes
                    + self.uniq_local.nbytes
                    + (self.w_dst.nbytes if self.w_dst is not None else 0))
        return {"part": self.part, "lo": self.lo, "hi": self.hi,
                "n_local": self.n_local, "m": self.m,
                "resident_bytes": int(resident),
                "bytes_per_edge": round(resident / self.m, 2) if self.m else 0.0}

    def drain_metrics(self):
        m, self.metrics = self.metrics, self._fresh_metrics()
        return m

    # ---- state management ----
    def init_state(self, name: str, kind: str, value: float = 0.0, dtype="float64"):
        if kind == "const":
            self.state[name] = np.full(self.n_local, value, dtype=dtype)
        elif kind == "vid":
            self.state[name] = np.arange(self.lo, self.hi, dtype=np.int64)
        else:
            raise ValueError(kind)
        return True

    def set_rows(self, name: str, vids: np.ndarray, values: np.ndarray):
        self.state[name][np.asarray(vids) - self.lo] = values
        return True

    # ---- wave (2-D) state: (n_local, S) per-source columns, used by
    # multi-source algorithms that need numeric per-source state where
    # the MSBFS bit-packing doesn't apply (Brandes σ/δ) ----
    def init_state_wave(self, name: str, width: int, value=0.0,
                        dtype="float64"):
        self.state[name] = np.full((self.n_local, int(width)), value,
                                   dtype=dtype)
        return True

    def set_cells(self, name: str, vids, cols, values):
        st = self.state[name]
        st[np.asarray(vids, dtype=np.int64) - self.lo,
           np.asarray(cols, dtype=np.int64)] = values
        return True

    def anf_init(self, k: int, seed: int):
        """Init ANF Flajolet-Martin sketches (Palmer et al., KDD'02):
        ``anf_seen``/``anf_frontier`` = (n_local, k) uint64, one
        geometric bit per (node, hash fn) — bit position = trailing
        zeros of splitmix64(vid, fn)."""
        vids = np.arange(self.lo, self.hi, dtype=np.uint64)
        seen = np.zeros((self.n_local, k), dtype=np.uint64)
        for f in range(k):
            h = _splitmix64(vids
                            + np.uint64(seed + f) * np.uint64(0x9E3779B97F4A7C15))
            low = h & (~h + np.uint64(1))          # isolate lowest set bit
            tz = np.minimum(popcount64(low - np.uint64(1)), 63)
            seen[:, f] = np.uint64(1) << tz.astype(np.uint64)
        self.state["anf_seen"] = seen
        self.state["anf_frontier"] = seen.copy()
        return True

    def anf_estimate(self) -> float:
        """FM estimate partial: Σ_local 2^(mean_f R_f) / 0.77351 with
        R_f = position of the lowest ZERO bit of the seen mask."""
        seen = self.state["anf_seen"]
        if seen.size == 0:
            return 0.0
        flat = np.ascontiguousarray(seen).ravel()
        y = ~flat & (flat + np.uint64(1))           # lowest zero bit
        r = popcount64(y - np.uint64(1)).astype(np.float64)  # y==0 → 64
        big_r = r.reshape(seen.shape).mean(axis=1)
        return float(np.exp2(big_r).sum() / 0.77351)

    def fold_sum_cols(self, src: str, dst: str, zero_cells=None):
        """1-D ``dst`` += 2-D ``src``.sum(axis=1), first zeroing the
        given (vid, col) cells (e.g. each Brandes source's own δ)."""
        st = self.state[src]
        if zero_cells is not None:
            vids = np.asarray(zero_cells[0], dtype=np.int64)
            cols = np.asarray(zero_cells[1], dtype=np.int64)
            own = (vids >= self.lo) & (vids < self.hi)
            st[vids[own] - self.lo, cols[own]] = 0.0
        self.state[dst] += st.sum(axis=1)
        return True

    def drop_states(self, names) -> bool:
        for nm in names:
            self.state.pop(nm, None)
        return True

    def get_state(self, name: str) -> np.ndarray:
        return self.state[name]

    def set_state(self, name: str, arr: np.ndarray):
        assert len(arr) == self.n_local
        self.state[name] = np.array(arr)
        return True

    def state_sum(self, name: str) -> float:
        return float(self.state[name].sum())

    def state_min_above(self, name: str, lo: float) -> float:
        """Smallest FINITE state value ≥ lo (delta-stepping next-bucket
        probe; 8 bytes per shard per bucket transition)."""
        st = self.state[name]
        sel = (st >= lo) & np.isfinite(st)
        return float(st[sel].min()) if sel.any() else float("inf")

    def weight_stats(self) -> tuple:
        """(Σw, m, max w) for auto-Δ selection; zeros when unweighted."""
        if self.w_dst is None or self.m == 0:
            return 0.0, 0, 0.0
        return float(self.w_dst.sum()), int(self.m), float(self.w_dst.max())

    def apply_state(self, out: str, op: str, *operands, dtype=None):
        """Elementwise derived state via a TYPED op over the shard's
        state vectors — no eval(). Operands are state names, the
        literal "vid" (global dense ids of the range), or numeric
        constants. Driver-free per-shard transform for algorithm glue
        (e.g. SCC root flags)."""
        def val(x):
            if isinstance(x, str):
                if x == "vid":
                    return np.arange(self.lo, self.hi, dtype=np.int64)
                return self.state[x]
            return x

        if op == "copy":                  # out = a
            res = np.array(val(operands[0]))
        elif op == "where_pos":           # out = where(flag > 0, a, b)
            f, a, b = operands
            res = np.where(val(f) > 0, val(a), val(b))
        elif op == "flag_and_eq":         # out = (flag > 0) & (a == b)
            f, a, b = operands
            res = (val(f) > 0) & (val(a) == val(b))
        elif op == "scale":               # out = a * c
            a, c = operands
            res = val(a) * val(c)
        elif op == "ge":                  # out = (a >= c) as float
            a, c = operands
            res = (val(a) >= val(c)).astype(np.float64)
        elif op == "degree":              # out = local out-degree vector
            res = self.deg.astype(np.float64)
        elif op == "mul":                 # out = a * b elementwise
            a, b = operands
            res = np.asarray(val(a), dtype=np.float64) \
                * np.asarray(val(b), dtype=np.float64)
        elif op == "div0":                # out = a / b, 0 where b == 0
            a, b = operands
            av, bv = val(a), val(b)
            res = np.divide(av, bv, out=np.zeros(self.n_local),
                            where=np.asarray(bv) != 0)
        elif op == "ge_lt":               # out = (lo <= a < hi)
            a, lo, hi = operands
            av = val(a)
            res = (av >= lo) & (av < hi)
        elif op == "add":                 # out = a + b elementwise
            a, b = operands
            res = np.asarray(val(a), dtype=np.float64) \
                + np.asarray(val(b), dtype=np.float64)
        elif op == "absdiff":             # out = |a - b|
            a, b = operands
            res = np.abs(np.asarray(val(a), dtype=np.float64)
                         - np.asarray(val(b), dtype=np.float64))
        elif op == "and_pos":             # out = (a > 0) & (b > 0)
            a, b = operands
            res = (np.asarray(val(a)) > 0) & (np.asarray(val(b)) > 0)
        elif op == "trim":                # out = (f > 0) & (a<=0 | b<=0)
            f, a, b = operands            # SCC trim: active with no
            res = (np.asarray(val(f)) > 0) & (  # active in- OR out-edges
                (np.asarray(val(a)) <= 0) | (np.asarray(val(b)) <= 0))
        else:
            raise ValueError(f"unknown apply_state op {op}")
        if res.shape == ():
            res = np.full(self.n_local, res)
        self.state[out] = res.astype(dtype) if dtype else res
        return True

    def state_table(self, names: list[str], node_col: str = "vid") -> pa.Table:
        cols = {node_col: pa.array(np.arange(self.lo, self.hi, dtype=np.int64))}
        for nm in names:
            cols[nm] = pa.array(self.state[nm])
        return pa.table(cols)

    def state_wave_table(self, name: str) -> pa.Table:
        """2-D wave state in long form: (vid, col, value), one row per
        (local vertex, seed column)."""
        st = self.state[name]
        n, S = st.shape
        return pa.table({
            "vid": pa.array(np.repeat(
                np.arange(self.lo, self.hi, dtype=np.int64), S)),
            "col": pa.array(np.tile(np.arange(S, dtype=np.int64), n)),
            "value": pa.array(st.ravel()),
        })

    def out_degree_table(self) -> pa.Table:
        return pa.table({"vid": pa.array(np.arange(self.lo, self.hi, dtype=np.int64)),
                         "degree": pa.array(self.deg)})

    def _ensure_ranked_adj(self):
        """Lazily build (once, cached) the vid-sorted adjacency: for
        each local vertex its out-neighbors in ascending global-vid
        order — which equals original-id order, the determinism
        contract the walk and co-citation SQL oracles rank by."""
        if not hasattr(self, "_walk_nbr"):
            dsts = self._dsts()
            order = np.lexsort((dsts, self.src_in_dst_order))
            self._walk_nbr = dsts[order].astype(np.int64)
            self._walk_off = np.zeros(self.n_local + 1, dtype=np.int64)
            np.cumsum(self.deg, out=self._walk_off[1:])

    def copair_counts(self, cap: int) -> pa.Table:
        """Local co-citation pairs: every owned source with
        2 <= outdeg <= cap emits its C(deg,2) unordered out-neighbor
        pairs (a < b by vid == original-id order), pre-counted locally.
        Hubs above the cap are excluded entirely — the web-scale DF-cap
        discipline (a deg-10^6 hub would emit 5·10^11 pairs); callers'
        oracles must mirror the same eligibility filter.

        Vectorized per distinct degree value: vertices of one degree d
        form a (k, d) adjacency matrix (one gather), and np.triu_indices
        expands all pairs at once — no per-vertex Python loop."""
        t = self.copair_scores(cap)
        return t.select(["a", "b", "n"])

    def copair_scores(self, cap: int) -> pa.Table:
        """copair_counts plus the Adamic-Adar partial: each shared
        source z of out-degree d contributes 1/ln(d) to its pairs'
        ``w`` (link-prediction score numerator; eligibility 2<=d<=cap
        keeps ln(d) > 0 and enforces the same web-scale hub cap)."""
        self._ensure_ranked_adj()
        pas, pbs, pws = [], [], []
        elig = (self.deg >= 2) & (self.deg <= cap)
        for d in np.unique(self.deg[elig]):
            vs = np.nonzero(self.deg == d)[0]
            mat = self._walk_nbr[self._walk_off[vs][:, None]
                                 + np.arange(d)[None, :]]
            ii, jj = np.triu_indices(int(d), 1)
            pas.append(mat[:, ii].ravel())
            pbs.append(mat[:, jj].ravel())
            pws.append(np.full(len(vs) * len(ii), 1.0 / np.log(float(d))))
        if not pas:
            e = np.empty(0, np.int64)
            return pa.table({"a": pa.array(e), "b": pa.array(e),
                             "n": pa.array(e),
                             "w": pa.array(np.empty(0, np.float64))})
        a = np.concatenate(pas)
        b = np.concatenate(pbs)
        w = np.concatenate(pws)
        # neighbor lists are vid-sorted, so ii<jj already gives a<b
        order = np.lexsort((b, a))
        a, b, w = a[order], b[order], w[order]
        newseg = np.empty(len(a), dtype=bool)
        newseg[0] = True
        newseg[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        starts = np.nonzero(newseg)[0]
        n = np.diff(np.append(starts, len(a))).astype(np.int64)
        ws = np.add.reduceat(w, starts)
        return pa.table({"a": pa.array(a[starts]), "b": pa.array(b[starts]),
                         "n": pa.array(n), "w": pa.array(ws)})

    def walk_next(self, vids: np.ndarray, hashes: np.ndarray) -> np.ndarray:
        """Ranked-neighbor gather for deterministic random walks: for
        each owned global vid, return the (hash mod degree)-th smallest
        out-neighbor's global vid, or -1 when the vertex is dangling.

        "Smallest" is by dense vid, which equals original-id order
        (IdMap assigns vids ascending in original-id order), so a SQL
        oracle's ROW_NUMBER() OVER (ORDER BY dst) ranks identically.
        The vid-sorted adjacency is built lazily (one lexsort over the
        shard's edges) and cached for the walk's remaining steps."""
        self._ensure_ranked_adj()
        loc = np.asarray(vids, dtype=np.int64) - self.lo
        deg = self.deg[loc]
        nxt = np.full(len(loc), -1, dtype=np.int64)
        has = deg > 0
        if has.any():
            r = np.asarray(hashes, dtype=np.int64)[has] % deg[has]
            nxt[has] = self._walk_nbr[self._walk_off[loc[has]] + r]
        return nxt

    def walk_neighbors(self, vids: np.ndarray):
        """Per owned vid, its full vid-sorted out-neighbor list →
        (flat neighbor vids, count per input). The node2vec candidate
        gather: per-walker cost is the walker's out-degree, so a hub
        frontier ships its adjacency — cap walk sampling rates on
        hub-heavy graphs accordingly."""
        self._ensure_ranked_adj()
        loc = np.asarray(vids, dtype=np.int64) - self.lo
        cnt = self.deg[loc].astype(np.int64)
        total = int(cnt.sum())
        if total == 0:
            return np.empty(0, np.int64), cnt
        starts = self._walk_off[loc]
        flat_idx = (np.repeat(starts, cnt)
                    + np.arange(total, dtype=np.int64)
                    - np.repeat(np.cumsum(cnt) - cnt, cnt))
        return self._walk_nbr[flat_idx], cnt

    def edge_mask(self, srcs: np.ndarray, dsts: np.ndarray) -> np.ndarray:
        """Edge-existence probe for owned ``srcs`` → bool per (src,
        dst) query, via a cached sorted (src·n + dst) key array (the
        triangles okeys idiom, int64-safe to ~3e9 vertices)."""
        if not hasattr(self, "_edge_keys"):
            n = np.int64(self.bounds[-1])
            # the shard's edge arrays are DST-sorted (scatter-segment
            # layout): the source of edge i is src_in_dst_order[i]
            dsts_all = self._dsts().astype(np.int64)
            srcs_all = self.src_in_dst_order.astype(np.int64) + self.lo
            self._edge_keys = np.sort(srcs_all * n + dsts_all)
            self._edge_n = n
        keys = (np.asarray(srcs, dtype=np.int64) * self._edge_n
                + np.asarray(dsts, dtype=np.int64))
        if not len(self._edge_keys):
            return np.zeros(len(keys), dtype=bool)
        pos = np.minimum(np.searchsorted(self._edge_keys, keys),
                         len(self._edge_keys) - 1)
        return self._edge_keys[pos] == keys

    # ---- pointer jumping (label shortcut: state[v] := state[state[v]]) ----
    def pj_requests(self, name: str):
        """Phase 1: unique label-pointers this shard holds, split by
        owning shard (labels are global vids)."""
        ptrs = self.state[name].astype(np.int64)
        uq = np.unique(ptrs)
        self._pj_uniq = uq
        cuts = np.searchsorted(uq, self.bounds)
        return tuple(uq[cuts[j]:cuts[j + 1]] for j in range(self.P))

    def pj_requests_grouped(self, name: str, group_bounds):
        """Two-level tier 1 for pointer jumping: pack the per-owner
        request arrays into one object per aggregator group
        (num_returns = #groups instead of P)."""
        out = self.pj_requests(name)
        return tuple(tuple(out[a:b])
                     for a, b in zip(group_bounds[:-1], group_bounds[1:]))

    def pj_answer_union(self, name: str, req):
        """Phase 2 (owner side, two-level): answer the deduped union of
        every requester's pointers as one (vids, labels) pair — it is
        broadcast back and each requester slices out what it asked for."""
        req = np.asarray(req, dtype=np.int64)
        return req, self.state[name][req - self.lo]

    def pj_apply_union(self, name: str, *pairs) -> int:
        """Phase 3 (two-level): rebuild this shard's aligned answer
        vector from the P broadcast (vids, labels) unions, then relabel
        exactly as pj_apply."""
        uq = self._pj_uniq
        cuts = np.searchsorted(uq, self.bounds)
        parts = []
        for j, (vids, vals) in enumerate(pairs):
            mine = uq[cuts[j]:cuts[j + 1]]
            parts.append(np.asarray(vals)[
                np.searchsorted(np.asarray(vids), mine)]
                if len(mine) else np.empty(0, np.int64))
        return self.pj_apply(name, *parts)

    def pj_answer(self, name: str, *reqs):
        """Phase 2 (owner side): answer each requester's pointer list
        with the owner's current labels for those vids."""
        st = self.state[name]
        return tuple(st[np.asarray(r, dtype=np.int64) - self.lo]
                     for r in reqs)

    def pj_apply(self, name: str, *answers) -> int:
        """Phase 3: relabel state[v] := label(state[v]); newly-changed
        vertices are added to the ``changed`` frontier so the next
        delta scatter pushes the shortcut labels."""
        uq = self._pj_uniq
        del self._pj_uniq
        vals = (np.concatenate([np.asarray(a) for a in answers])
                if answers else np.empty(0, np.int64))
        st = self.state[name]
        new = vals[np.searchsorted(uq, st)].astype(st.dtype)
        ch = new != st
        nch = int(ch.sum())
        if nch:
            st[ch] = new[ch]
            if "changed" in self.state:
                self.state["changed"][ch] = 1
        return nch

    def rollback_pr(self) -> bool:
        """Discard the last pr_update by restoring the pre-update rank
        snapshot taken under ``keep_prev`` (an arithmetic
        ``rank -= delta`` would NOT round-trip in floating point). The
        engine's pipelined convergence path uses this to reverse its
        one speculative superstep, making final ranks bit-identical to
        the barriered loop's."""
        self.state["rank"] = self.state.pop("_rank_prev")
        return True

    # ---- checkpoint / restore (per-partition lineage) ----
    def checkpoint(self, ckpt_dir: str, iteration: int, names: list[str]) -> dict:
        d = os.path.join(ckpt_dir, f"iter={iteration}")
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"part-{self.part:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(self.state_table(names), tmp)
        os.replace(tmp, path)
        return {"part": self.part, "file": path, "rows": self.n_local}

    def restore(self, ckpt_dir: str, iteration: int, names: list[str]) -> bool:
        path = os.path.join(ckpt_dir, f"iter={iteration}", f"part-{self.part:05d}.parquet")
        tbl = pq.read_table(path)
        for nm in names:
            self.state[nm] = tbl.column(nm).to_numpy(zero_copy_only=False).copy()
        return True

    # ---- message plumbing ----
    def _route(self, uniq_idx: np.ndarray, *vals: np.ndarray,
               dense_ok: bool = False, fill=0) -> list:
        """Split (local_dst_idx, values...) message arrays by target shard.
        Indices are LOCAL to the receiving shard (int32 when possible).

        ``dense_ok`` (sum-combine single-value ops only): when a
        receiver-slice's unique-dst count exceeds ``NGA_DENSE_MSG_RATIO``
        (default 0.35) of that receiver's vertex range, ship a DENSE
        value block ``(None, zeros-filled array over the full range)``
        instead of (idx, val) pairs. On web-scale graphs with mean
        degree ≫ P the per-sender pre-aggregated messages cover most of
        every receiver's range, so sparse pairs cost 8-12 B/entry where
        the dense block costs 4 B/slot AND turns the receiver's
        indexed-scatter add into one SIMD ``+=``. Receivers detect the
        form by ``dsts is None`` (pr_update / set_sum_update /
        add_update / min_update / relax_update / …). Under the
        two-level exchange _combine_member folds mixed sparse/dense
        member messages into one dense block per receiver."""
        out = []
        if uniq_idx is None:
            locs, dsts = self.uniq_local, self.uniq_dst
        else:
            locs, dsts = self.uniq_local[uniq_idx], self.uniq_dst[uniq_idx]
        cuts = np.searchsorted(dsts, self.bounds)
        dense_ratio = (self._dense_ratio()
                       if dense_ok and getattr(self, "_dense_enabled", True)
                       else None)
        for j in range(self.P):
            sl = slice(cuts[j], cuts[j + 1])
            if dense_ratio is not None and len(vals) == 1:
                rsize = int(self.bounds[j + 1] - self.bounds[j])
                n_msg = cuts[j + 1] - cuts[j]
                # 2-D (wave) messages carry S values per row, so the
                # 4 B/row index overhead dense saves is marginal while
                # zero-filled slots cost 8S B each — dense only pays
                # off near-full density there (the win left is the
                # receiver's contiguous += over the indexed scatter)
                ratio = (dense_ratio if getattr(vals[0], "ndim", 1) == 1
                         else max(dense_ratio, 0.9))
                if fill != 0:
                    # sentinel-filled (min/max) blocks: the empty slots
                    # cost full value width with no index saving below
                    # ~2/3 density, so demand more coverage than sums
                    ratio = max(ratio, 0.67)
                if rsize and n_msg > ratio * rsize:
                    block = np.full((rsize,) + vals[0].shape[1:], fill,
                                    dtype=vals[0].dtype)
                    block[locs[sl]] = vals[0][sl]
                    out.append((None, block))
                    continue
            out.append((locs[sl],) + tuple(v[sl] for v in vals))
        return out

    @staticmethod
    def _dense_ratio() -> float:
        r = os.environ.get("NGA_DENSE_MSG_RATIO", "0.35")
        try:
            return float(r)
        except ValueError:
            return float("inf")  # any non-numeric value disables

    def _empty_msgs(self, nvals: int = 1) -> list:
        e = np.empty(0, dtype=np.int64)
        return [(e,) + tuple(np.empty(0) for _ in range(nvals)) for _ in range(self.P)]

    # ---- scatter ops (sender side; map-side combine per unique dst) ----
    def scatter(self, op: str, **kw) -> list:
        t0 = time.perf_counter()
        try:
            if self.m == 0:
                return self._empty_msgs(2 if op == "lpa" else 1)
            if op == "pr_push":
                d = kw["damping"]
                # msg_dtype=float32 halves the per-edge gather+message
                # value traffic (the reference quantizes deltas to ints
                # for the same reason, PageRank.java:54). Default stays
                # float64 — the SQL oracles need exact parity; bench can
                # opt in via NGA_PR_MSG_DTYPE=float32.
                msg_dtype = np.dtype(kw.get("msg_dtype") or "float64")
                if msg_dtype == np.int16:
                    # int-quantized messages (the reference's ×100k trick,
                    # PageRank.java:54): the per-edge gather — the DRAM-
                    # dominant term — moves 2 B/edge instead of 4/8.
                    # The scale is DYNAMIC per shard per superstep
                    # (dequantization happens sender-side before routing,
                    # so receivers never see it): capped at msg_scale but
                    # lowered when this step's max |push| would overflow
                    # int16 — hub sources can accumulate delta ≫ 2 on
                    # skewed graphs, so a fixed scale is unsafe. Segment
                    # sums accumulate in int64 (hub dst segments overflow
                    # int32) and dequantize to float32 before routing, so
                    # the exchange contract is unchanged. Opt-in
                    # (NGA_PR_MSG_DTYPE=int16): the ~1/scale quantization
                    # error perturbs convergence, so oracle paths stay
                    # float64.
                    cap = float(kw.get("msg_scale") or 16384.0)
                    push = np.zeros(self.n_local, dtype=np.float64)
                    nz = self.deg > 0
                    push[nz] = (d * self.state["delta"][nz] / self.deg[nz])
                    amax = float(np.abs(push).max()) if push.size else 0.0
                    scale = min(cap, 32000.0 / amax) if amax > 0 else 1.0
                    q = np.round(push * scale).astype(np.int16)
                    vals = q[self.src_in_dst_order]
                    sums = (np.add.reduceat(vals, self.seg_starts,
                                            dtype=np.int64)
                            .astype(np.float32) / np.float32(scale))
                else:
                    push = np.zeros(self.n_local, dtype=msg_dtype)
                    nz = self.deg > 0
                    push[nz] = (d * self.state["delta"][nz] / self.deg[nz])
                    vals = push[self.src_in_dst_order]
                    sums = np.add.reduceat(vals, self.seg_starts)
                self.metrics["edges_scattered"] += self.m
                return self._route(None, sums, dense_ok=True)
            if op == "pr_push_w":
                # weighted delta-push: each edge carries
                # d * delta[src] * w_edge / Σ_out w — the weightProperty
                # PageRank variant (push mass proportional to edge
                # weight). Requires a weighted engine: the graph must
                # have been built with a weight column (a weighted
                # ShardActor loads it in __init__ or fails there).
                assert self.w_dst is not None, \
                    "pr_push_w needs weighted=True shards (weight column)"
                d = kw["damping"]
                if not hasattr(self, "_wdeg"):
                    self._wdeg = np.bincount(self.src_in_dst_order,
                                             weights=self.w_dst,
                                             minlength=self.n_local)
                coef = np.zeros(self.n_local)
                nz = self._wdeg > 0
                coef[nz] = d * self.state["delta"][nz] / self._wdeg[nz]
                vals = coef[self.src_in_dst_order] * self.w_dst
                sums = np.add.reduceat(vals, self.seg_starts)
                self.metrics["edges_scattered"] += self.m
                return self._route(None, sums, dense_ok=True)
            if op == "in_degree_count":
                # per-unique-dst edge counts = scatter-segment lengths; one
                # superstep computes global in-degrees without a reverse CSR
                lens = np.diff(np.append(self.seg_starts, self.m)).astype(np.int64)
                self.metrics["edges_scattered"] += self.m
                return self._route(None, lens, dense_ok=True)
            if op == "min_state":
                st = self.state[kw["name"]]
                vals = st[self.src_in_dst_order]
                mins = np.minimum.reduceat(vals, self.seg_starts)
                self.metrics["edges_scattered"] += self.m
                sent = (np.iinfo(st.dtype).max
                        if np.issubdtype(st.dtype, np.integer) else np.inf)
                return self._route(None, mins, dense_ok=True, fill=sent)
            if op == "sum_state":
                # plain neighbor sum of a state vector (HITS hub/auth
                # pull; pr_push without the out-degree division)
                vals = self.state[kw["name"]][self.src_in_dst_order]
                sums = np.add.reduceat(vals, self.seg_starts)
                self.metrics["edges_scattered"] += self.m
                return self._route(None, sums, dense_ok=True)
            if op == "min_state_delta":
                # frontier-sparse variant: only edges whose source
                # changed last superstep carry messages (the fixpoint
                # tail touches a shrinking frontier, not all E edges)
                ch = self.state["changed"] > 0
                sel = ch[self.src_in_dst_order]
                if not sel.any():
                    return self._empty_msgs(1)
                st = self.state[kw["name"]]
                sentinel = (np.iinfo(st.dtype).max
                            if np.issubdtype(st.dtype, np.integer) else np.inf)
                vals = np.where(sel, st[self.src_in_dst_order], sentinel)
                mins = np.minimum.reduceat(vals, self.seg_starts)
                keep = mins < sentinel
                idx = np.nonzero(keep)[0]
                self.metrics["edges_scattered"] += int(sel.sum())
                return self._route(idx, mins[keep], dense_ok=True,
                                   fill=sentinel)
            if op == "max_state_masked":
                vals = self.state[kw["name"]][self.src_in_dst_order]
                active = self.state["active"][self.src_in_dst_order] > 0
                vals = np.where(active, vals, np.int64(-1))
                maxs = np.maximum.reduceat(vals, self.seg_starts)
                keep = maxs >= 0
                self.metrics["edges_scattered"] += self.m
                idx = np.nonzero(keep)[0]
                return self._route(idx, maxs[keep], dense_ok=True,
                                   fill=np.int64(-1))
            if op == "lpa":
                lab = self.state["label"][self.src_in_dst_order]
                wgt = self.w_dst if self.w_dst is not None else np.ones(self.m)
                alldst = self._dsts()
                # alldst is already sorted; lexsort = per-dst-segment
                # sort by label (same (dst, label) order as before)
                order = np.lexsort((lab, alldst))
                dsts, labs, ws = alldst[order], lab[order], wgt[order]
                newseg = np.empty(self.m, dtype=bool)
                newseg[0] = True
                np.not_equal(dsts[1:], dsts[:-1], out=newseg[1:])
                newseg[1:] |= labs[1:] != labs[:-1]
                starts = np.nonzero(newseg)[0]
                sums = np.add.reduceat(ws, starts)
                gd, gl = dsts[starts], labs[starts]
                parity = kw.get("parity")
                if parity is not None:
                    # semi-synchronous LPA: only dsts of this parity update
                    # this superstep — don't ship the other half's votes
                    keep = (gd & 1) == parity
                    gd, gl, sums = gd[keep], gl[keep], sums[keep]
                self.metrics["edges_scattered"] += self.m
                cuts = np.searchsorted(gd, self.bounds)
                return [((gd[cuts[j]:cuts[j + 1]] - self.bounds[j]).astype(self.idx_dtype),
                         gl[cuts[j]:cuts[j + 1]],
                         sums[cuts[j]:cuts[j + 1]]) for j in range(self.P)]
            if op == "bits_wave":
                # ANF superstep: OR of the (n_local, K) frontier sketch
                # columns per unique destination — the K-hash-function
                # generalization of "bits"; delta-only (newly-set bits)
                # like MSBFS, which preserves OR-closure semantics.
                fr = self.state["anf_frontier"]
                kcols = fr.shape[1]
                if not fr.any():
                    return [(np.empty(0, dtype=self.idx_dtype),
                             np.empty((0, kcols), np.uint64))
                            for _ in range(self.P)]
                vals = np.take(fr, self.src_in_dst_order, axis=0)
                ors = np.bitwise_or.reduceat(vals, self.seg_starts, axis=0)
                keep = ors.any(axis=1)
                idx = np.nonzero(keep)[0]
                self.metrics["edges_scattered"] += self.m
                return self._route(idx, ors[keep])
            if op == "bits":
                fr = self.state["frontier"]
                if not fr.any():
                    return self._empty_msgs(1)
                vals = fr[self.src_in_dst_order]
                ors = np.bitwise_or.reduceat(vals, self.seg_starts)
                nz = np.nonzero(ors)[0]
                self.metrics["edges_scattered"] += self.m
                return self._route(nz, ors[nz])
            if op == "relax":
                w = self.w_dst if self.w_dst is not None else 1.0
                sel = None
                if "changed" in self.state:
                    # frontier-sparse: only sources relaxed last round push
                    sel = (self.state["changed"] > 0)[self.src_in_dst_order]
                wc = kw.get("wclass")
                if wc:
                    # delta-stepping edge classing: light (w ≤ Δ) edges
                    # relax repeatedly within a bucket, heavy (w > Δ)
                    # once per settled bucket
                    # (ShortestPathDeltaStepping.java:46-70). Masks are
                    # static per (class, Δ) — cached across supersteps.
                    dlt = float(kw["delta"])
                    key = (wc, dlt)
                    masks = getattr(self, "_wclass_masks", None)
                    if masks is None:
                        masks = self._wclass_masks = {}
                    cmask = masks.get(key)
                    if cmask is None:
                        wp = (w if isinstance(w, np.ndarray)
                              else np.full(self.m, w))
                        cmask = (wp <= dlt) if wc == "light" else (wp > dlt)
                        masks[key] = cmask
                    sel = cmask if sel is None else (sel & cmask)
                vals = self.state["dist"][self.src_in_dst_order] + w
                if sel is not None:
                    vals = np.where(sel, vals, np.inf)
                mins = np.minimum.reduceat(vals, self.seg_starts)
                fin = np.isfinite(mins)
                idx = np.nonzero(fin)[0]
                self.metrics["edges_scattered"] += int(np.isfinite(vals).sum())
                return self._route(idx, mins[fin], dense_ok=True,
                                   fill=np.inf)
            if op == "ppr_push_multi":
                # batched personalized PageRank: all S delta columns
                # push in ONE superstep — matrix messages amortize the
                # exchange over the seed set (the MSBFS idea applied to
                # rank mass). Per column identical to pr_push.
                d = kw["damping"]
                delta = self.state["deltaM"]
                S = delta.shape[1]
                nz = delta.any(axis=1) & (self.deg > 0)
                if not nz.any():
                    return [(np.empty(0, dtype=self.idx_dtype),
                             np.empty((0, S))) for _ in range(self.P)]
                push = np.where(nz[:, None],
                                d * delta / np.maximum(self.deg, 1)[:, None],
                                0.0)
                vals = np.take(push, self.src_in_dst_order, axis=0)
                sums = np.add.reduceat(vals, self.seg_starts, axis=0)
                keep = sums.any(axis=1)
                idx = np.nonzero(keep)[0]
                self.metrics["edges_scattered"] += int(
                    nz[self.src_in_dst_order].sum())
                return self._route(idx, sums[keep], dense_ok=True)
            if op == "brandes_fwd":
                # forward Brandes superstep: frontier vertices (dist ==
                # level, per source column) push their σ along out-edges;
                # map-side combine sums per unique destination. 2-D
                # messages: (local_idx, (rows, S) σ-sums).
                lv = kw["level"]
                dist = self.state["dist2"]
                sig = self.state["sigma"]
                S = sig.shape[1]
                mask = dist == lv
                if not mask.any():
                    return [(np.empty(0, dtype=self.idx_dtype),
                             np.empty((0, S))) for _ in range(self.P)]
                contrib = np.where(mask, sig, 0.0)
                vals = np.take(contrib, self.src_in_dst_order, axis=0)
                sums = np.add.reduceat(vals, self.seg_starts, axis=0)
                keep = sums.any(axis=1)
                idx = np.nonzero(keep)[0]
                self.metrics["edges_scattered"] += int(
                    mask.any(axis=1)[self.src_in_dst_order].sum())
                return self._route(idx, sums[keep], dense_ok=True)
            if op == "brandes_bwd":
                # backward dependency superstep over the REVERSE CSR:
                # vertices w at dist == level send (1+δ_w)/σ_w to their
                # shortest-path predecessors; receivers at level-1
                # multiply by their own σ.
                lv = kw["level"]
                dist = self.state["dist2"]
                sig = self.state["sigma"]
                delta = self.state["delta"]
                S = sig.shape[1]
                mask = (dist == lv) & (sig > 0)
                if not mask.any():
                    return [(np.empty(0, dtype=self.idx_dtype),
                             np.empty((0, S))) for _ in range(self.P)]
                contrib = np.where(mask, (1.0 + delta) / np.where(sig > 0, sig, 1.0), 0.0)
                vals = np.take(contrib, self.src_in_dst_order, axis=0)
                sums = np.add.reduceat(vals, self.seg_starts, axis=0)
                keep = sums.any(axis=1)
                idx = np.nonzero(keep)[0]
                self.metrics["edges_scattered"] += int(
                    mask.any(axis=1)[self.src_in_dst_order].sum())
                return self._route(idx, sums[keep], dense_ok=True)
            if op == "bwd_color":
                # SCC backward pass over the reverse CSR: frontier vertices w
                # (in_flag newly set) push their color to in-neighbors u of
                # edge u→w; receiver accepts iff color matches. No reduce —
                # exact (dst, color) pairs, deduped.
                fr = self.state["bwd_frontier"] > 0
                edge_sel = fr[self.src_in_dst_order]
                if not edge_sel.any():
                    return self._empty_msgs(1)
                dsts = self._dsts()[edge_sel].astype(np.int64)
                cols = self.state["color"][self.src_in_dst_order][edge_sel]
                key = np.stack([dsts, cols])
                _, ui = np.unique(key, axis=1, return_index=True)
                dsts, cols = dsts[ui], cols[ui]
                order = np.argsort(dsts, kind="stable")
                dsts, cols = dsts[order], cols[order]
                self.metrics["edges_scattered"] += int(edge_sel.sum())
                cuts = np.searchsorted(dsts, self.bounds)
                return [((dsts[cuts[j]:cuts[j + 1]] - self.bounds[j]).astype(self.idx_dtype),
                         cols[cuts[j]:cuts[j + 1]])
                        for j in range(self.P)]
            raise ValueError(f"unknown scatter op {op}")
        finally:
            self.metrics["scatter_ms"] += (time.perf_counter() - t0) * 1e3

    def scatter_grouped(self, op: str, group_bounds, **kw):
        """Two-level exchange tier 1: run the scatter, then pack the
        per-shard slices into one object per aggregator group
        (num_returns = #groups instead of P). Dense value blocks flow
        through: _combine_member folds mixed sparse/dense inputs into
        one dense block per member, so at high P each receiver gets ONE
        block per group instead of P sparse tuples — the multi-node
        NIC-traffic shape the two-level topology exists for."""
        out = self.scatter(op, **kw)
        return tuple(tuple(out[a:b])
                     for a, b in zip(group_bounds[:-1], group_bounds[1:]))

    # ---- update ops (receiver side) ----
    def update(self, op: str, *msgs, **kw):
        t0 = time.perf_counter()
        # two-level exchange delivers LISTS of message tuples (one per
        # aggregator group); flatten to the direct-exchange shape
        if msgs and not isinstance(msgs[0], tuple):
            flat = []
            for m in msgs:
                if isinstance(m, tuple):
                    flat.append(m)
                else:
                    flat.extend(m)
            msgs = tuple(flat)
        try:
            self.metrics["msgs_out"] += sum(
                len(m[1]) if m[0] is None else len(m[0]) for m in msgs)
            if op == "pr_update":
                if kw.get("keep_prev"):
                    # pipelined loop: snapshot the pre-update rank so a
                    # speculative superstep can be discarded EXACTLY
                    # (float a+b-b does not round-trip; a copy does)
                    self.state["_rank_prev"] = self.state["rank"].copy()
                incoming = np.zeros(self.n_local)
                for dsts, vals in msgs:
                    if dsts is None:          # dense block (see _route)
                        incoming += vals
                    else:
                        incoming[dsts] += vals
                self.state["delta"] = incoming
                self.state["rank"] += incoming
                return {"max_delta": float(np.abs(incoming).max()) if self.n_local else 0.0}
            if op == "set_sum_update":
                # state := incoming neighbor sums; report the shard's
                # sum of squares for driver-side L2 normalization
                incoming = np.zeros(self.n_local)
                for dsts, vals in msgs:
                    if dsts is None:          # dense block (see _route)
                        incoming += vals
                    else:
                        incoming[dsts] += vals
                self.state[kw["name"]] = incoming
                return {"sumsq": float(np.square(incoming).sum())}
            if op == "add_update":
                st = self.state[kw["name"]]
                for dsts, vals in msgs:
                    if dsts is None:          # dense block (see _route)
                        st += vals.astype(st.dtype)
                        continue
                    # dsts are unique WITHIN one message (each sender
                    # pre-aggregates per unique dst, _route), so fancy
                    # += is exact here; cross-sender repeats are
                    # handled by applying messages sequentially
                    st[dsts] += vals.astype(st.dtype)
                return {}
            if op == "min_update":
                name = kw["name"]
                st = self.state[name]
                cand = np.full(self.n_local, np.iinfo(np.int64).max
                               if st.dtype == np.int64 else np.inf, dtype=st.dtype)
                for dsts, vals in msgs:
                    if dsts is None:          # sentinel-filled dense block
                        np.minimum(cand, vals.astype(st.dtype), out=cand)
                        continue
                    # unique per message (see add_update note)
                    cand[dsts] = np.minimum(cand[dsts],
                                            vals.astype(st.dtype))
                changed = cand < st
                st[changed] = cand[changed]
                if kw.get("track_changed"):
                    self.state["changed"] = changed.astype(np.int8)
                return {"changed": int(changed.sum())}
            if op == "max_update_masked":
                st = self.state[kw["name"]]
                act = self.state["active"] > 0
                cand = np.full(self.n_local, -1, dtype=np.int64)
                for dsts, vals in msgs:
                    if dsts is None:          # sentinel-filled dense block
                        np.maximum(cand, vals.astype(np.int64), out=cand)
                        continue
                    cand[dsts] = np.maximum(cand[dsts],
                                            vals.astype(np.int64))
                changed = act & (cand > st)
                st[changed] = cand[changed]
                return {"changed": int(changed.sum())}
            if op == "lpa_update":
                prev = self.state["label"]
                parity = kw.get("parity")
                if msgs:
                    dsts = np.concatenate([m[0] for m in msgs]).astype(np.int64)
                    labs = np.concatenate([m[1] for m in msgs])
                    ws = np.concatenate([m[2] for m in msgs])
                else:
                    dsts = np.empty(0, np.int64); labs = dsts; ws = np.empty(0)
                if len(dsts):
                    order = np.lexsort((labs, dsts))
                    dsts, labs, ws = dsts[order], labs[order], ws[order]
                    newseg = np.empty(len(dsts), dtype=bool)
                    newseg[0] = True
                    newseg[1:] = (dsts[1:] != dsts[:-1]) | (labs[1:] != labs[:-1])
                    starts = np.nonzero(newseg)[0]
                    gd, gl = dsts[starts], labs[starts]
                    gw = np.add.reduceat(ws, starts)
                    # per dst: argmax weight, tie-break min label (deterministic)
                    pick = np.lexsort((gl, -gw, gd))
                    gd, gl, gw = gd[pick], gl[pick], gw[pick]
                    first = np.unique(gd, return_index=True)[1]
                    upd_idx, upd_lab = gd[first], gl[first]
                    if parity is not None:
                        keep = ((upd_idx + self.lo) & 1) == parity
                        upd_idx, upd_lab = upd_idx[keep], upd_lab[keep]
                    changed = int((prev[upd_idx] != upd_lab).sum())
                    prev[upd_idx] = upd_lab
                else:
                    changed = 0
                return {"changed": changed}
            if op == "bits_update":
                depth = kw["depth"]
                inc = np.zeros(self.n_local, dtype=np.uint64)
                for dsts, vals in msgs:
                    # unique per message (see add_update note)
                    inc[dsts] |= vals.astype(np.uint64)
                new = inc & ~self.state["seen"]
                self.state["seen"] |= new
                self.state["frontier"] = new
                nz = np.nonzero(new)[0]
                npop = popcount64(new[nz]) if len(nz) else np.empty(0, np.int64)
                # accumulate ONLY the explicitly named states — keying on
                # which state names happen to exist would silently mutate
                # stale vectors left by a prior run on a cached engine
                for acc in kw.get("accumulate", ()):
                    if acc == "farness":
                        self.state["farness"][nz] += npop * depth
                    elif acc == "inv_farness":
                        self.state["inv_farness"][nz] += npop / depth
                    else:
                        raise ValueError(f"unknown accumulate target {acc}")
                out = {"new_visits": int(npop.sum()),
                       # OR of newly-visited source bits: 8 bytes per
                       # shard per superstep lets the driver track
                       # per-source max depth (eccentricity) without
                       # emitting per-node hop rows
                       "new_union": int(np.bitwise_or.reduce(new[nz]))
                                    if len(nz) else 0}
                if kw.get("emit_hops") and len(nz):
                    rows_v, rows_b = [], []
                    rem = new[nz].copy()
                    for b in range(64):
                        hit = (rem >> np.uint64(b)) & np.uint64(1)
                        sel = np.nonzero(hit)[0]
                        if len(sel):
                            rows_v.append(nz[sel] + self.lo)
                            rows_b.append(np.full(len(sel), b, dtype=np.int64))
                    out["hops"] = (np.concatenate(rows_v), np.concatenate(rows_b))
                elif kw.get("emit_hops"):
                    out["hops"] = (np.empty(0, np.int64), np.empty(0, np.int64))
                return out
            if op == "bits_wave_update":
                seen = self.state["anf_seen"]
                inc = np.zeros_like(seen)
                for m_ in msgs:
                    if len(m_[0]) == 0:
                        continue
                    inc[m_[0].astype(np.int64)] |= m_[1].astype(np.uint64)
                new = inc & ~seen
                seen |= new
                self.state["anf_frontier"] = new
                return {"new_visits": int(np.count_nonzero(new))}
            if op == "relax_update":
                st = self.state["dist"]
                cand = np.full(self.n_local, np.inf)
                for dsts, vals in msgs:
                    if dsts is None:          # sentinel-filled dense block
                        np.minimum(cand, vals, out=cand)
                        continue
                    # unique per message (see add_update note)
                    cand[dsts] = np.minimum(cand[dsts], vals)
                changed = cand < st
                st[changed] = cand[changed]
                if kw.get("track_changed"):
                    self.state["changed"] = changed.astype(np.int8)
                return {"changed": int(changed.sum())}
            if op == "ppr_update_multi":
                rank = self.state["rankM"]
                acc = np.zeros_like(rank)
                for m_ in msgs:
                    if m_[0] is None:         # dense block (see _route)
                        acc += m_[1]
                    elif len(m_[0]):
                        acc[m_[0].astype(np.int64)] += m_[1]
                rank += acc
                self.state["deltaM"] = acc
                return {"max_delta": float(acc.max()) if acc.size else 0.0}
            if op == "brandes_fwd_update":
                lv = kw["level"]
                sig = self.state["sigma"]
                dist = self.state["dist2"]
                acc = np.zeros_like(sig)
                for m_ in msgs:
                    if m_[0] is None:         # dense block (see _route)
                        acc += m_[1]
                        continue
                    if len(m_[0]) == 0:
                        continue
                    acc[m_[0].astype(np.int64)] += m_[1]
                new = (acc > 0) & (dist < 0)
                if new.any():
                    dist[new] = lv + 1
                    sig[new] = acc[new]
                return {"new": int(new.sum())}
            if op == "brandes_bwd_update":
                lv = kw["level"]
                sig = self.state["sigma"]
                dist = self.state["dist2"]
                delta = self.state["delta"]
                acc = np.zeros_like(sig)
                for m_ in msgs:
                    if m_[0] is None:         # dense block (see _route)
                        acc += m_[1]
                        continue
                    if len(m_[0]) == 0:
                        continue
                    acc[m_[0].astype(np.int64)] += m_[1]
                mask = dist == lv - 1
                delta += np.where(mask, sig * acc, 0.0)
                return {}
            if op == "bwd_color_update":
                color = self.state["color"]
                act = self.state["active"] > 0
                inb = self.state["in_bwd"] > 0
                hit = np.zeros(self.n_local, dtype=bool)
                for dsts, cols in msgs:
                    idx = dsts.astype(np.int64)
                    hit[idx] |= (color[idx] == cols)
                new = hit & act & ~inb
                self.state["in_bwd"][new] = 1
                self.state["bwd_frontier"] = new.astype(np.int8)
                return {"changed": int(new.sum())}
            raise ValueError(f"unknown update op {op}")
        finally:
            self.metrics["update_ms"] += (time.perf_counter() - t0) * 1e3


class ShardEngine:
    """Driver-side coordinator over a pool of ShardActors (the role the
    reference's ParallelUtil barrier loop plays,
    core/.../core/utils/ParallelUtil.java:208-713)."""

    def __init__(self, g, num_partitions: int, *, weighted: bool = False,
                 reverse: bool = False):
        from neo4j_graph_algorithms_ray.graph import partition_edges
        partition_edges(g, num_partitions, reverse=False)
        if reverse:
            partition_edges(g, num_partitions, reverse=True)
        self.g = g
        self.bounds = g.bounds
        self.P = len(self.bounds) - 1
        # SPREAD: num_cpus=0 actors carry no resource request, so without
        # an explicit strategy Ray gives no placement guarantee on a real
        # multi-node cluster (shards could pack onto one node and share
        # its DRAM bus). No effect single-node.
        mk = ShardActor.options(scheduling_strategy="SPREAD")
        self.actors = [mk.remote(i, self.bounds, g.graph_dir, weighted, False)
                       for i in range(self.P)]
        self.rev_actors = ([mk.remote(i, self.bounds, g.graph_dir, weighted, True)
                            for i in range(self.P)] if reverse else None)
        ray.get([a.info.remote() for a in self.actors])
        if self.rev_actors:
            ray.get([a.info.remote() for a in self.rev_actors])

    def _acts(self, rev: bool):
        if rev:
            assert self.rev_actors, "engine built without reverse layout"
            return self.rev_actors
        return self.actors

    # -- state plumbing --
    def init_state(self, name, kind, value=0.0, dtype="float64", rev=False):
        ray.get([a.init_state.remote(name, kind, value, dtype)
                 for a in self._acts(rev)])

    def init_state_wave(self, name, width, value=0.0, dtype="float64", rev=False):
        ray.get([a.init_state_wave.remote(name, width, value, dtype)
                 for a in self._acts(rev)])

    def set_rows(self, name, vids, values, rev=False):
        """Seed rows of a 1-D state vector, routed to owning shards
        (personalized-teleport seeds, SSSP sources, ...)."""
        vids = np.asarray(vids, dtype=np.int64)
        values = np.asarray(values)
        part = np.searchsorted(self.bounds, vids, side="right") - 1
        order = np.argsort(part, kind="stable")
        vids, values, part = vids[order], values[order], part[order]
        cuts = np.searchsorted(part, np.arange(self.P + 1))
        acts = self._acts(rev)
        ray.get([acts[j].set_rows.remote(name, vids[cuts[j]:cuts[j + 1]],
                                         values[cuts[j]:cuts[j + 1]])
                 for j in range(self.P) if cuts[j + 1] > cuts[j]])

    def set_cells(self, name, vids, cols, values, rev=False):
        """Seed (vid, col) cells of a 2-D wave state, routed to owners."""
        vids = np.asarray(vids, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        values = np.asarray(values)
        part = np.searchsorted(self.bounds, vids, side="right") - 1
        order = np.argsort(part, kind="stable")
        vids, cols, values, part = vids[order], cols[order], values[order], part[order]
        cuts = np.searchsorted(part, np.arange(self.P + 1))
        acts = self._acts(rev)
        ray.get([acts[j].set_cells.remote(name, vids[cuts[j]:cuts[j + 1]],
                                          cols[cuts[j]:cuts[j + 1]],
                                          values[cuts[j]:cuts[j + 1]])
                 for j in range(self.P) if cuts[j + 1] > cuts[j]])

    def fold_sum_cols(self, src, dst, zero_cells=None, rev=False):
        ray.get([a.fold_sum_cols.remote(src, dst, zero_cells)
                 for a in self._acts(rev)])

    def walk_next(self, vids: np.ndarray, hashes: np.ndarray) -> np.ndarray:
        """Route one walk step to owning shards and reassemble the next
        frontier in input order (-1 marks a dangling stop). The frontier
        never leaves numpy arrays; each shard only sees its own range."""
        vids = np.asarray(vids, dtype=np.int64)
        hashes = np.asarray(hashes, dtype=np.int64)
        part = np.searchsorted(self.bounds, vids, side="right") - 1
        order = np.argsort(part, kind="stable")
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order))
        v, h, p = vids[order], hashes[order], part[order]
        cuts = np.searchsorted(p, np.arange(self.P + 1))
        refs, slots = [], []
        for j in range(self.P):
            if cuts[j + 1] > cuts[j]:
                refs.append(self.actors[j].walk_next.remote(
                    v[cuts[j]:cuts[j + 1]], h[cuts[j]:cuts[j + 1]]))
                slots.append(j)
        out = np.empty(len(vids), dtype=np.int64)
        for j, res in zip(slots, ray.get(refs)):
            out[cuts[j]:cuts[j + 1]] = res
        return out[inv]

    def _route_by_owner(self, vids: np.ndarray):
        """Owner-routing scaffold shared by the walk gathers: returns
        (order, inv, cuts, per-shard slices of the sort order)."""
        part = np.searchsorted(self.bounds, vids, side="right") - 1
        order = np.argsort(part, kind="stable")
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order))
        cuts = np.searchsorted(part[order], np.arange(self.P + 1))
        return order, inv, cuts

    def walk_neighbors(self, vids: np.ndarray):
        """Per input vid (any owner), its vid-sorted out-neighbor list
        → (flat neighbors concatenated in INPUT order, counts per
        input)."""
        vids = np.asarray(vids, dtype=np.int64)
        order, inv, cuts = self._route_by_owner(vids)
        v = vids[order]
        refs, slots = [], []
        for j in range(self.P):
            if cuts[j + 1] > cuts[j]:
                refs.append(self.actors[j].walk_neighbors.remote(
                    v[cuts[j]:cuts[j + 1]]))
                slots.append(j)
        flat_s = [np.empty(0, np.int64)] * self.P
        cnt_sorted = np.zeros(len(vids), dtype=np.int64)
        for j, (fl, ct) in zip(slots, ray.get(refs)):
            flat_s[j] = fl
            cnt_sorted[cuts[j]:cuts[j + 1]] = ct
        # reassemble flats in input order: per sorted-position segment
        # boundaries, then permute segments by inv
        seg_starts = np.concatenate([[0], np.cumsum(cnt_sorted)])
        flat_sorted = (np.concatenate(flat_s)
                       if any(len(f) for f in flat_s)
                       else np.empty(0, np.int64))
        counts = cnt_sorted[inv]
        if len(flat_sorted) == 0:
            return flat_sorted, counts
        take_start = seg_starts[:-1][inv]
        take_cnt = cnt_sorted[inv]
        total = int(take_cnt.sum())
        idx = (np.repeat(take_start, take_cnt)
               + np.arange(total, dtype=np.int64)
               - np.repeat(np.cumsum(take_cnt) - take_cnt, take_cnt))
        return flat_sorted[idx], counts

    def edge_mask(self, srcs: np.ndarray, dsts: np.ndarray) -> np.ndarray:
        """Edge-existence probe routed to the shards owning ``srcs``."""
        srcs = np.asarray(srcs, dtype=np.int64)
        dsts = np.asarray(dsts, dtype=np.int64)
        order, inv, cuts = self._route_by_owner(srcs)
        s, d = srcs[order], dsts[order]
        refs, slots = [], []
        for j in range(self.P):
            if cuts[j + 1] > cuts[j]:
                refs.append(self.actors[j].edge_mask.remote(
                    s[cuts[j]:cuts[j + 1]], d[cuts[j]:cuts[j + 1]]))
                slots.append(j)
        out = np.zeros(len(srcs), dtype=bool)
        for j, res in zip(slots, ray.get(refs)):
            out[cuts[j]:cuts[j + 1]] = res
        return out[inv]

    def drop_states(self, names, rev=False):
        ray.get([a.drop_states.remote(list(names)) for a in self._acts(rev)])

    def broadcast_state(self, name: str):
        """Copy a state vector from forward actors to reverse actors."""
        self.copy_state(name, to_rev=True)

    def copy_state(self, name: str, *, to_rev: bool):
        """Ship a state vector between the forward and reverse actor
        sets (shard ranges align — same bounds)."""
        if not self.rev_actors:
            return
        src = self.actors if to_rev else self.rev_actors
        dst = self.rev_actors if to_rev else self.actors
        refs = [a.get_state.remote(name) for a in src]
        ray.get([d.set_state.remote(name, r) for d, r in zip(dst, refs)])

    def apply_state(self, out: str, op: str, *operands, dtype=None,
                    rev: bool = False):
        acts = self.rev_actors if rev else self.actors
        ray.get([a.apply_state.remote(out, op, *operands, dtype=dtype)
                 for a in acts])

    def state_sum(self, name: str) -> float:
        return sum(ray.get([a.state_sum.remote(name) for a in self.actors]))

    def anf_init(self, k: int, seed: int):
        ray.get([a.anf_init.remote(k, seed) for a in self.actors])

    def anf_estimate(self) -> float:
        return sum(ray.get([a.anf_estimate.remote() for a in self.actors]))

    def state_min_above(self, name: str, lo: float) -> float:
        return min(ray.get([a.state_min_above.remote(name, lo)
                            for a in self.actors]))

    def pointer_jump(self, name: str = "component") -> int:
        """One shortcut round: state[v] := state[state[v]] everywhere —
        a distributed gather (request → owner answer → apply), cutting
        min-label fixpoints from O(diameter) to O(log d) supersteps on
        chain-heavy graphs. Returns the number of relabeled vertices.

        Exchange topology mirrors step(): direct P² request/answer refs
        below NGA_TWO_LEVEL_P; above it, requests route through ⌈√P⌉
        union aggregators (P·√P + P refs) and the per-owner answers are
        broadcast (P refs, each fetched once per node)."""
        P = self.P
        if P == 1:
            reqs = ray.get(self.actors[0].pj_requests.remote(name))
            ans = ray.get(self.actors[0].pj_answer.remote(name, reqs[0]))
            return ray.get(self.actors[0].pj_apply.remote(name, ans[0]))
        if P >= self._two_level_threshold():
            G = int(np.ceil(np.sqrt(P)))
            size = (P + G - 1) // G
            gb = [min(g * size, P) for g in range(G + 1)]
            packs = [a.pj_requests_grouped.options(num_returns=G)
                     .remote(name, gb) for a in self.actors]
            owner_req: list = [None] * P
            for g in range(G):
                nm = gb[g + 1] - gb[g]
                if nm <= 0:
                    continue
                out = _pj_union_group.options(num_returns=nm).remote(
                    nm, *[packs[i][g] for i in range(P)])
                if nm == 1:
                    owner_req[gb[g]] = out
                else:
                    for m in range(nm):
                        owner_req[gb[g] + m] = out[m]
            ans = [self.actors[j].pj_answer_union.remote(name, owner_req[j])
                   for j in range(P)]
            return sum(ray.get([a.pj_apply_union.remote(name, *ans)
                                for a in self.actors]))
        req = [a.pj_requests.options(num_returns=P).remote(name)
               for a in self.actors]
        ans = [self.actors[j].pj_answer.options(num_returns=P)
               .remote(name, *[req[i][j] for i in range(P)])
               for j in range(P)]
        return sum(ray.get([
            self.actors[i].pj_apply.remote(name, *[ans[j][i] for j in range(P)])
            for i in range(P)]))

    def mean_max_weight(self) -> tuple:
        stats = ray.get([a.weight_stats.remote() for a in self.actors])
        tot = sum(s[0] for s in stats)
        m = sum(s[1] for s in stats)
        mx = max((s[2] for s in stats), default=0.0)
        return (tot / m if m else 0.0), mx

    def set_state_from_table(self, name: str, vids: np.ndarray, values: np.ndarray):
        part = np.searchsorted(self.bounds, vids, side="right") - 1
        order = np.argsort(part, kind="stable")
        vids, values, part = vids[order], values[order], part[order]
        cuts = np.searchsorted(part, np.arange(self.P + 1))
        ray.get([self.actors[j].set_rows.remote(name, vids[cuts[j]:cuts[j + 1]],
                                                values[cuts[j]:cuts[j + 1]])
                 for j in range(self.P) if cuts[j + 1] > cuts[j]])

    def set_state_from_dataset(self, name: str, ds, *, vid_col: str = "vid",
                               val_col: str = "label") -> int:
        """Distributed state load: every Dataset block routes its rows
        to the owning shard actors directly from the map task — unlike
        :meth:`set_state_from_table`, the table never transits the
        driver, so corpus-sized seed/property tables stream in at any
        scale. Returns the number of rows applied."""
        actors, bounds, P = self.actors, self.bounds, self.P

        def route(b):
            import numpy as _np
            import pyarrow as _pa
            import ray as _ray
            vids = b[vid_col].to_numpy(zero_copy_only=False) \
                .astype(_np.int64)
            vals = b[val_col].to_numpy(zero_copy_only=False)
            part = _np.searchsorted(bounds, vids, side="right") - 1
            order = _np.argsort(part, kind="stable")
            v, x, p = vids[order], vals[order], part[order]
            cuts = _np.searchsorted(p, _np.arange(P + 1))
            _ray.get([actors[j].set_rows.remote(
                name, v[cuts[j]:cuts[j + 1]], x[cuts[j]:cuts[j + 1]])
                for j in range(P) if cuts[j + 1] > cuts[j]])
            return _pa.table({"n": _pa.array([b.num_rows], _pa.int64())})

        total = ds.map_batches(route, batch_format="pyarrow").sum("n")
        return int(total or 0)

    def step_async(self, scatter_op: str, update_op: str, *,
                   scatter_kw=None, update_kw=None) -> list:
        """Submit one BSP superstep WITHOUT waiting — returns the update
        ObjectRefs. Callers may submit the next superstep before
        collecting these: Ray actors execute tasks in submission order,
        so scatter(k+1) on shard j is guaranteed to run after
        update_j(k) writes the state it reads. This removes the driver
        round-trip + resubmission latency from every superstep's
        critical path (pipelined iteration, see algorithms/pagerank.py).
        Works in both exchange regimes (direct P² refs below the
        two-level threshold, grouped aggregators above); callers gate
        on ``P > 1``."""
        sk, uk = scatter_kw or {}, update_kw or {}
        if self.P >= self._two_level_threshold():
            return self._submit_two_level(scatter_op, update_op,
                                          self.actors, self.actors, sk, uk)
        refs = [a.scatter.options(num_returns=self.P).remote(scatter_op, **sk)
                for a in self.actors]
        return [self.actors[j].update.remote(
                    update_op, *[refs[i][j] for i in range(self.P)], **uk)
                for j in range(self.P)]

    def rollback_pr(self) -> None:
        """Undo the last applied pr_update on every shard
        (rank -= delta; delta holds exactly the last incoming vector) —
        the pipelined convergence path lets one speculative superstep
        complete, then reverses it, so final ranks are bit-identical to
        the barriered loop's."""
        ray.get([a.rollback_pr.remote() for a in self.actors])

    def step(self, scatter_op: str, update_op: str, *, actors=None,
             update_actors=None, scatter_kw=None, update_kw=None) -> list[dict]:
        """One BSP superstep: scatter on all shards → route → update.

        Exchange topology: direct all-to-all (P² refs) below
        NGA_TWO_LEVEL_P shards, two-level ⌈√P⌉-group aggregation above
        it (P·√P + P refs, op-aware combining at the aggregator — see
        module docstring)."""
        actors = actors or self.actors
        update_actors = update_actors or self.actors
        sk, uk = scatter_kw or {}, update_kw or {}
        if self.P == 1:
            msgs = [actors[0].scatter.remote(scatter_op, **sk)]
            # single ref holding the list of 1 message
            stats = [ray.get(update_actors[0].update.remote(
                update_op, *ray.get(msgs[0]), **uk))]
            return stats
        if self.P >= self._two_level_threshold():
            return self._step_two_level(scatter_op, update_op, actors,
                                        update_actors, sk, uk)
        refs = [a.scatter.options(num_returns=self.P).remote(scatter_op, **sk)
                for a in actors]
        upd = [update_actors[j].update.remote(update_op,
                                              *[refs[i][j] for i in range(self.P)], **uk)
               for j in range(self.P)]
        return ray.get(upd)

    @staticmethod
    def _two_level_threshold() -> int:
        # Measured crossover on a single 32-core node (166M-edge
        # scale-free PageRank, f32 messages, 10 iters). With SPARSE
        # messages (round 2): P=64 direct 173M edges-scattered/s vs
        # 123M two-level — the aggregator hop re-serialized every
        # sparse byte, so the old default was 96. With DENSE blocks
        # (round 5) the aggregator folds P sender blocks into ONE per
        # receiver (SIMD adds, parallel tasks), flipping the economics:
        # P=32 two-level 967M vs direct 434M (same warm phase), P=48
        # 864M vs 730M, P=64 316M vs 200M, P=128 445M vs 56M (round-2
        # sparse number). Default 32 = the measured break-even; below
        # it the extra hop's latency still loses on this box. Pinned
        # north-metric pair under two-level: T32 848.3M / T8 386.4M —
        # both all-time records.
        return int(os.environ.get("NGA_TWO_LEVEL_P", "32"))

    def _step_two_level(self, scatter_op, update_op, actors, update_actors,
                        sk, uk) -> list[dict]:
        return ray.get(self._submit_two_level(scatter_op, update_op,
                                              actors, update_actors, sk, uk))

    def _submit_two_level(self, scatter_op, update_op, actors,
                          update_actors, sk, uk) -> list:
        """Submit one two-level superstep without waiting; returns the
        update ObjectRefs (the step_async analogue for the P ≥
        threshold regime — actor task order provides the same
        scatter-after-update guarantee)."""
        P = self.P
        G = int(np.ceil(np.sqrt(P)))
        size = (P + G - 1) // G
        gb = [min(g * size, P) for g in range(G + 1)]
        gb_arr = [g for g in gb]
        combine = _COMBINE_OF_OP.get(scatter_op)
        packs = [a.scatter_grouped.options(num_returns=G)
                 .remote(scatter_op, gb_arr, **sk) for a in actors]
        # packs[i][g] → aggregator g → per-member combined message lists
        member_refs: list = [None] * P
        for g in range(G):
            nm = gb[g + 1] - gb[g]
            if nm <= 0:
                continue
            out = _aggregate_group.options(num_returns=nm).remote(
                nm, combine, *[packs[i][g] for i in range(P)])
            if nm == 1:
                member_refs[gb[g]] = out
            else:
                for m in range(nm):
                    member_refs[gb[g] + m] = out[m]
        return [update_actors[j].update.remote(update_op, member_refs[j], **uk)
                for j in range(P)]

    def drain_metrics(self) -> list[dict]:
        out = ray.get([a.drain_metrics.remote() for a in self.actors])
        if self.rev_actors:
            out += ray.get([a.drain_metrics.remote() for a in self.rev_actors])
        return out

    def state_dataset(self, names: list[str], node_col: str = "vid"):
        import ray.data as rd
        refs = [a.state_table.remote(names, node_col) for a in self.actors]
        return rd.from_arrow_refs(refs)

    def state_wave_dataset(self, name: str):
        """Long-form (vid, col, value) Dataset of a 2-D wave state."""
        import ray.data as rd
        refs = [a.state_wave_table.remote(name) for a in self.actors]
        return rd.from_arrow_refs(refs)

    def degrees_dataset(self, direction: str = "out"):
        """(vid, degree) Dataset; ``direction`` ∈ {"out", "in", "both"} —
        the reference's Degrees.degree(node, direction)
        (core/.../api/Degrees.java:22). In-degrees are computed in one
        superstep from the forward CSR's scatter-segment lengths (no
        reverse layout needed)."""
        import ray.data as rd
        if direction == "out":
            return rd.from_arrow_refs([a.out_degree_table.remote() for a in self.actors])
        if direction not in ("in", "both"):
            raise ValueError(f"direction must be out/in/both, got {direction!r}")
        self.init_state("__in_degree", "const", 0.0, dtype="int64")
        self.step("in_degree_count", "add_update", update_kw={"name": "__in_degree"})
        if direction == "in":
            ds = self.state_dataset(["__in_degree"])
            return ds.rename_columns({"__in_degree": "degree"})
        refs = [a.state_table.remote(["__in_degree"]) for a in self.actors]
        outs = [a.out_degree_table.remote() for a in self.actors]

        @ray.remote
        def _both(ind: pa.Table, outd: pa.Table) -> pa.Table:
            tot = (ind.column("__in_degree").to_numpy(zero_copy_only=False)
                   + outd.column("degree").to_numpy(zero_copy_only=False))
            return pa.table({"vid": ind.column("vid"), "degree": pa.array(tot)})

        return rd.from_arrow_refs([_both.remote(i, o) for i, o in zip(refs, outs)])

    def fetch_state(self, name: str) -> np.ndarray:
        """Concatenated full state vector — small graphs / tests only."""
        return np.concatenate(ray.get([a.get_state.remote(name) for a in self.actors]))

    def checkpoint(self, ckpt_dir: str, iteration: int, names: list[str]) -> list[dict]:
        return ray.get([a.checkpoint.remote(ckpt_dir, iteration, names)
                        for a in self.actors])

    def restore(self, ckpt_dir: str, iteration: int, names: list[str]):
        ray.get([a.restore.remote(ckpt_dir, iteration, names) for a in self.actors])

    def close(self):
        for a in self.actors + (self.rev_actors or []):
            ray.kill(a)
        self.actors, self.rev_actors = [], None
