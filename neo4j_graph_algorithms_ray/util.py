"""Small distributed utilities shared across the engine."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

# Popcount lookup for uint8 — used by the MSBFS bitset kernels.
_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint16)


def popcount64(a: np.ndarray) -> np.ndarray:
    """Per-element popcount of a uint64 array (numpy<2 has no bitwise_count)."""
    b = a.view(np.uint8).reshape(len(a), 8)
    return _POP8[b].sum(axis=1).astype(np.int64)


def zip_with_index(ds: rd.Dataset, index_col: str = "vid") -> rd.Dataset:
    """Assign a global 0-based row index to a dataset, preserving block order.

    Ray Data has no zip_with_index; the distributed-safe formulation is:
    materialize → count rows per block with tiny Ray tasks → cumulative
    offsets → stamp each block with ``offset + arange(len)``. Blocks stay
    in the object store; only per-block row counts travel to the driver.

    The reference's analogue is dense-id assignment in ``HugeIdMap``
    (ascending original-id order, core/.../core/huge/HugeIdMap.java:39-72):
    callers sort first, then stamp.
    """
    ds = ds.materialize()
    refs = ds.to_arrow_refs()

    @ray.remote
    def _count(tbl: pa.Table) -> int:
        return tbl.num_rows

    @ray.remote
    def _stamp(tbl: pa.Table, offset: int) -> pa.Table:
        idx = pa.array(np.arange(offset, offset + tbl.num_rows, dtype=np.int64))
        return tbl.append_column(index_col, idx)

    counts = ray.get([_count.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    stamped = [_stamp.remote(r, int(o)) for r, o in zip(refs, offsets)]
    return rd.from_arrow_refs(stamped)


def round6(x):
    """round-half-away-from-zero to 6 decimals — DuckDB's round()
    semantics (Python round()/np.round are half-to-even and disagree
    with the SQL oracles at exact midpoints). Scalar or ndarray."""
    import pyarrow.compute as _pc
    arr = np.atleast_1d(np.asarray(x, dtype=np.float64))
    out = _pc.round(pa.array(arr), ndigits=6,
                    round_mode="half_towards_infinity") \
        .to_numpy(zero_copy_only=False)
    return float(out[0]) if np.isscalar(x) or np.ndim(x) == 0 else out


def to_arrow_blocks(ds: rd.Dataset) -> rd.Dataset:
    """Normalize block format to Arrow. Datasets produced by
    pandas-format map_groups carry pandas blocks, on which downstream
    Project ops (rename_columns / select_columns) fail in Ray 2.49 —
    route them through an identity pyarrow map_batches. Also strips
    schema metadata: pandas→arrow conversions attach a metadata dict
    that makes pa.Schema unhashable, spamming "Failed to hash the
    schemas (for deduplication)" from every downstream hash shuffle."""
    return ds.map_batches(lambda t: t.replace_schema_metadata(None),
                          batch_format="pyarrow")


def collect_arrow(ds: rd.Dataset) -> list[pa.Table]:
    """ray.get a (materialized) dataset's blocks as NON-EMPTY arrow
    tables — the safe input to a driver-side pa.concat_tables. Empty
    pandas blocks pass through map_batches unconverted and surface as
    0-column arrow/pandas blocks that crash concat (see
    drop_empty_blocks)."""
    import pandas as pd

    out = []
    for t in ray.get(ds.to_arrow_refs()):
        if isinstance(t, pd.DataFrame):
            if len(t):
                out.append(pa.Table.from_pandas(t, preserve_index=False)
                           .replace_schema_metadata(None))
        elif t.num_rows:
            out.append(t)
    return out


def drop_empty_blocks(ds: rd.Dataset) -> rd.Dataset:
    """Remove schema-less empty blocks (emitted by groupby/map_groups for
    empty partitions) — they crash pyarrow's acero hash join with
    "No match ... for key field reference". Materializes the dataset.

    Blocks can still be PANDAS here even after an arrow map_batches:
    Ray passes empty input blocks through without running the fn — so
    inspect/convert per block rather than assuming pa.Table."""
    import pandas as pd

    ds = ds.materialize()
    refs = ds.to_arrow_refs()

    @ray.remote
    def _rows(t) -> tuple:
        if isinstance(t, pd.DataFrame):
            return len(t), True
        return t.num_rows, False

    @ray.remote
    def _to_arrow(t) -> pa.Table:
        return pa.Table.from_pandas(t, preserve_index=False) \
                       .replace_schema_metadata(None)

    stats = ray.get([_rows.remote(r) for r in refs])
    keep = [(_to_arrow.remote(r) if is_pd else r)
            for r, (c, is_pd) in zip(refs, stats) if c > 0]
    if not keep:
        return ds  # fully empty; caller must handle
    return rd.from_arrow_refs(keep)


def join_partitions(requested: int) -> int:
    """Clamp a join's partition count to the cluster CPU count: the hash
    shuffle spins up one aggregator actor per slot and a request far
    above the available CPUs deadlocks on a small cluster (observed at
    num_partitions=32 with num_cpus=4)."""
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(1, min(requested, cpus))


def safe_join(left: rd.Dataset, right: rd.Dataset, join_type: str,
              num_partitions: int, on: tuple, right_on: tuple | None = None,
              **kw) -> rd.Dataset:
    """Dataset.join that tolerates empty upstream partitions and clamps
    the partition count to the cluster size (see join_partitions)."""
    left = drop_empty_blocks(left)
    right = drop_empty_blocks(right)
    return left.join(right, join_type, join_partitions(num_partitions), on=on,
                     right_on=right_on, **kw)


# Right-side row limit for the broadcast-join regime: 5M rows of a few
# int64 columns ≈ 100-200 MB in the object store — read zero-copy by
# every map task on a node, shipped once per node, never per batch.
BCAST_JOIN_LIMIT = 5_000_000
# ... and the byte cap that actually enforces that sizing note: a 5M-row
# side with wide string payload columns can be several GB, which the
# _BCAST_CACHE then copies into every worker heap. Past this, fall back
# to the shuffle join.
BCAST_JOIN_BYTE_LIMIT = 256 * 1024 * 1024
_BCAST_CACHE: dict = {}


class BroadcastSide:
    """Key-sorted, ``ray.put`` right side of a broadcast join — build
    once with :func:`prepare_broadcast`, probe with any number of left
    datasets (:func:`probe_broadcast`). Reuse matters when the same
    dimension table joins in a loop (metapath expansion levels)."""

    def __init__(self, ref, payload_names: list[str]):
        self.ref = ref
        self.payload_names = payload_names


def prepare_broadcast(right: rd.Dataset, rk_col: str,
                      limit: int = BCAST_JOIN_LIMIT):
    """Collect + key-sort ``right`` into the object store for the
    broadcast-join regime. Returns ``None`` (caller must use the
    shuffle join) when the table exceeds ``limit`` rows or the key is
    not an integer type. Null keys are dropped here — an inner join
    never matches NULL to NULL (the numpy NaN→INT64_MIN cast otherwise
    would, diverging from the hash-join fallback)."""
    import pyarrow.compute as pc

    right = right.materialize()
    if right.count() > limit:
        return None
    refs = [t for t in ray.get(right.to_arrow_refs()) if t.num_rows]
    if refs:
        rtbl = pa.concat_tables(refs, promote_options="default")
    else:
        sch = right.schema()
        rtbl = pa.table({n: pa.array([], type=t)
                         for n, t in zip(sch.names, sch.types)})
    if not pa.types.is_integer(rtbl.schema.field(rk_col).type):
        return None
    if rtbl.nbytes > int(os.environ.get("NGA_BCAST_BYTE_LIMIT",
                                        BCAST_JOIN_BYTE_LIMIT)):
        return None
    keycol = rtbl.column(rk_col)
    if keycol.null_count:
        rtbl = rtbl.filter(pc.is_valid(keycol))
    rk = rtbl.column(rk_col).to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(rk, kind="stable")
    payload_names = [n for n in rtbl.schema.names if n != rk_col]
    payload = {n: rtbl.column(n).take(pa.array(order)).combine_chunks()
               for n in payload_names}
    return BroadcastSide(ray.put((rk[order], payload)), payload_names)


def probe_broadcast(left: rd.Dataset, side: BroadcastSide, *, on: str,
                    left_suffix: str = "_a",
                    right_suffix: str = "_b") -> rd.Dataset:
    """Inner-join ``left`` against a prepared broadcast side: vectorized
    ``searchsorted`` + repeat-expansion per batch, M:N supported, no
    shuffle. Output matches ``Dataset.join``: all left columns + right
    payload columns (right key dropped), collisions suffixed."""
    import pyarrow.compute as pc

    bc, payload_names = side.ref, side.payload_names
    left_names = set(left.schema().names)

    def probe(batch: pa.Table) -> pa.Table:
        # one zero-copy plasma read per worker process, not per batch;
        # evict OTHER joins' entries when the cache grows (clearing our
        # own would re-fetch every batch)
        key = bc.hex()
        if len(_BCAST_CACHE) > 8:
            for stale in [k for k in _BCAST_CACHE if k != key]:
                del _BCAST_CACHE[stale]
        rks, pay = _BCAST_CACHE.get(key) or _BCAST_CACHE.setdefault(
            key, ray.get(bc))
        kc = batch.column(on)
        if kc.null_count:  # inner join: NULL keys never match
            batch = batch.filter(pc.is_valid(kc))
            kc = batch.column(on)
        k = kc.to_numpy(zero_copy_only=False).astype(np.int64)
        lo = np.searchsorted(rks, k, side="left")
        hi = np.searchsorted(rks, k, side="right")
        cnt = hi - lo
        total = int(cnt.sum())
        li = np.repeat(np.arange(len(k), dtype=np.int64), cnt)
        # right indices: each left row i maps to rks[lo[i]:hi[i]]
        starts = np.repeat(lo, cnt)
        offs = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(cnt) - cnt, cnt)
        ri = starts + offs
        out = batch.take(pa.array(li))
        cols, names = list(out.columns), list(out.schema.names)
        ri_arr = pa.array(ri)
        for n in payload_names:
            pn = n + right_suffix if n in left_names else n
            if n in left_names:
                names[names.index(n)] = n + left_suffix
            cols.append(pay[n].take(ri_arr))
            names.append(pn)
        return pa.table(dict(zip(names, cols)))

    return left.map_batches(probe, batch_format="pyarrow")


def broadcast_join(left: rd.Dataset, right: rd.Dataset, *, on: str,
                   right_on: str | None = None,
                   left_suffix: str = "_a", right_suffix: str = "_b",
                   num_partitions: int = 8,
                   limit: int = BCAST_JOIN_LIMIT) -> rd.Dataset:
    """Inner equi-join where the right side broadcasts when small.

    Below ``limit`` right rows (and integer keys on BOTH sides) the
    right table is key-sorted once, ``ray.put`` into the object store,
    and the join runs as a vectorized ``searchsorted`` +
    repeat-expansion inside ``map_batches`` — no shuffle, no aggregator
    actors, M:N supported. Above the limit (or for non-integer keys) it
    falls back to the hash-shuffle ``safe_join``. This is the
    prescribed 100-TB shape for fact⋈dimension joins: the small side
    moves once per node instead of the big side moving once per join.

    Output schema matches ``Dataset.join``: all left columns + right
    payload columns (the right key column is dropped); collisions get
    ``left_suffix``/``right_suffix``. NULL join keys never match (both
    regimes).
    """
    # the left key must be integer too: astype(int64) in the probe
    # would silently truncate floats that the hash join instead rejects
    lsch = left.schema()
    if lsch is None:  # schema-less (fully empty) left: shuffle join
        return safe_join(left, right, "inner", num_partitions,
                         on=(on,), right_on=((right_on,) if right_on else None),
                         left_suffix=left_suffix, right_suffix=right_suffix)
    ltype = dict(zip(lsch.names, lsch.types)).get(on)
    side = (prepare_broadcast(right, right_on or on, limit)
            if ltype is not None and pa.types.is_integer(ltype) else None)
    if side is None:
        return safe_join(left, right, "inner", num_partitions,
                         on=(on,), right_on=((right_on,) if right_on else None),
                         left_suffix=left_suffix, right_suffix=right_suffix)
    return probe_broadcast(left, side, on=on, left_suffix=left_suffix,
                           right_suffix=right_suffix)


DISTINCT_DRIVER_LIMIT = 50_000_000


def distinct_pairs(ds: rd.Dataset, c1: str, c2: str,
                   *, limit: int = DISTINCT_DRIVER_LIMIT) -> rd.Dataset:
    """Distinct (c1, c2) int rows. Below ``limit`` distinct rows the
    merge runs driver-side over per-block ``np.unique`` partials (a Ray
    groupby-distinct costs ~10x more at small/mid scale — measured in
    /tmp/groupby_tune.py style experiments); above it, or for ids ≥
    2^31 (unpackable), falls back to the groupby shuffle."""
    ds = ds.materialize()

    @ray.remote
    def block_uniq(tbl: pa.Table) -> np.ndarray:
        if tbl.num_rows == 0:  # 0-chunk columns crash to_numpy
            return np.empty(0, np.uint64)
        a = tbl.column(c1).to_numpy(zero_copy_only=False).astype(np.int64)
        b = tbl.column(c2).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(a) and (a.max() >= 1 << 31 or b.max() >= 1 << 31
                       or a.min() < 0 or b.min() < 0):
            return None  # unpackable — caller falls back
        return np.unique((a.astype(np.uint64) << np.uint64(32))
                         | b.astype(np.uint64))

    parts = ray.get([block_uniq.remote(r) for r in ds.to_arrow_refs()])
    if any(p is None for p in parts) or sum(len(p) for p in parts) > limit:
        return ds.groupby([c1, c2]).count().select_columns([c1, c2])
    key = np.unique(np.concatenate(parts)) if parts else np.empty(0, np.uint64)
    a = (key >> np.uint64(32)).astype(np.int64)
    b = (key & np.uint64(0xFFFFFFFF)).astype(np.int64)
    return rd.from_arrow(pa.table({c1: a, c2: b}))


# When map-side partials reduce below this row count, the final merge
# runs driver-side with one vectorized pa.Table.group_by — a Ray
# shuffle costs seconds of fixed overhead regardless of size.
SMALL_AGG_DRIVER_LIMIT = 5_000_000


def _hierarchical_combine(red: rd.Dataset, partial) -> rd.Dataset:
    """Extra map-side combine rounds before a groupby shuffle: when
    per-batch partials overlap heavily (every batch sees the same hot
    keys — token/window/line counts do), coalescing 8 blocks at a time
    and re-combining shrinks e.g. 64×240k overlapping rows → 8×240k →
    driver-mergeable, never paying the sort-based groupby. Keys mostly
    unique? A round barely shrinks (<2×) and we stop, having touched
    only partial rows — never the corpus."""
    while red.count() > SMALL_AGG_DRIVER_LIMIT:
        nblocks = red.num_blocks()
        if nblocks <= 8:
            break
        prev = red.count()
        red = red.repartition(max(1, nblocks // 8)) \
                 .map_batches(partial, batch_format="pyarrow").materialize()
        if red.count() * 2 > prev:
            break
    return red


def _preagg(ds: rd.Dataset, keys: list[str], val: str | list[str],
            op: str) -> rd.Dataset:
    """groupby(keys).<op>(val(s)) with an Arrow map-side combine: each
    batch is pre-aggregated with ``pa.Table.group_by`` (vectorized) so
    the shuffle moves only per-batch-distinct rows; when the partials
    are small the final merge happens on the driver (no shuffle at all).
    ``op`` in {"sum", "max", "min"} — all associative+commutative, so
    the same combine regime is exact for any. Returns keys + vals."""
    vals = [val] if isinstance(val, str) else list(val)
    aggs = [(v, op) for v in vals]

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(keys).aggregate(aggs)
        return g.rename_columns(keys + vals)

    red = ds.map_batches(partial, batch_format="pyarrow").materialize()
    red = _hierarchical_combine(red, partial)
    if red.count() <= SMALL_AGG_DRIVER_LIMIT:
        batches = list(red.iter_batches(batch_format="pyarrow",
                                        batch_size=1 << 20))
        if not batches:
            return red
        merged = pa.concat_tables(batches).group_by(keys) \
            .aggregate(aggs).rename_columns(keys + vals)
        return rd.from_arrow(merged)
    out = (red.groupby(keys).sum(vals) if op == "sum"
           else red.groupby(keys).max(vals) if op == "max"
           else red.groupby(keys).min(vals))
    return out.rename_columns({f"{op}({v})": v for v in vals})


def preagg_sum(ds: rd.Dataset, keys: list[str], val: str | list[str]) -> rd.Dataset:
    return _preagg(ds, keys, val, "sum")


def preagg_max(ds: rd.Dataset, keys: list[str], val: str | list[str]) -> rd.Dataset:
    return _preagg(ds, keys, val, "max")


def preagg_min(ds: rd.Dataset, keys: list[str], val: str | list[str]) -> rd.Dataset:
    return _preagg(ds, keys, val, "min")


def topk_per_group(ds: rd.Dataset, keys: list[str], order_col: str, k: int,
                   *, descending: bool = True,
                   tie_cols: list[str] | None = None) -> rd.Dataset:
    """Top-k rows per key group by ``order_col`` (deterministic:
    ``tie_cols`` break equal values) — the windowed
    ROW_NUMBER()-per-partition primitive.

    Scale shape: top-k is a per-key idempotent reduction, so each batch
    first shrinks to its LOCAL per-key top-k (vectorized sort + group
    head), bounding the exchange at k rows per (batch, key); small
    partials finalize on the driver, larger ones go through one
    ``groupby().map_groups`` shuffle keyed by the group columns."""
    ties = tie_cols or []

    def partial(df):
        s = df.sort_values(keys + [order_col] + ties,
                           ascending=[True] * len(keys) + [not descending]
                           + [True] * len(ties), kind="mergesort")
        return s.groupby(keys, sort=False).head(k)

    red = ds.map_batches(partial, batch_format="pandas").materialize()
    if red.count() <= SMALL_AGG_DRIVER_LIMIT:
        import pandas as pd
        batches = list(red.iter_batches(batch_format="pandas",
                                        batch_size=1 << 20))
        if not batches:
            return red
        return rd.from_pandas(partial(pd.concat(batches, ignore_index=True))
                              .reset_index(drop=True))
    return to_arrow_blocks(red.groupby(keys).map_groups(
        lambda df: partial(df), batch_format="pandas"))


def predistinct(ds: rd.Dataset, keys: list[str]) -> rd.Dataset:
    """Distinct rows over ``keys`` with an Arrow map-side combine
    (per-batch ``group_by(keys).aggregate([])``) before the shuffle;
    small partials merge driver-side."""
    def partial(b: pa.Table) -> pa.Table:
        return b.group_by(keys).aggregate([])

    red = ds.map_batches(partial, batch_format="pyarrow").materialize()
    red = _hierarchical_combine(red, partial)
    if red.count() <= SMALL_AGG_DRIVER_LIMIT:
        batches = list(red.iter_batches(batch_format="pyarrow",
                                        batch_size=1 << 20))
        if not batches:
            return red
        merged = pa.concat_tables(batches).group_by(keys).aggregate([])
        return rd.from_arrow(merged)
    return red.groupby(keys).count().select_columns(keys)


def table_from_arrays(**cols) -> pa.Table:
    """pa.Table from name→numpy/arrow arrays (order preserved)."""
    return pa.table({k: v for k, v in cols.items()})


def ds_from_pandas(df) -> rd.Dataset:
    return rd.from_pandas(df)


def read_parquet_clean(path, **kw) -> rd.Dataset:
    """read_parquet with schema metadata stripped: pandas-written
    parquet carries a b'pandas' schema-metadata dict that makes
    pa.Schema unhashable and spams "Failed to hash the schemas" from
    every downstream hash shuffle. An explicit metadata-free ``schema``
    makes even the ReadParquet operator's own blocks clean (the strip
    map alone runs too late for warnings raised inside the read); the
    strip map stays as belt-and-braces for file-level metadata."""
    if "schema" not in kw:
        try:
            import pyarrow.dataset as pads
            sch = pads.dataset(path, format="parquet").schema
            cols = kw.get("columns")
            if cols:
                sch = pa.schema([sch.field(c) for c in cols])
            kw["schema"] = pa.schema(
                [f.remove_metadata() for f in sch]).remove_metadata()
        except Exception:
            pass
    return rd.read_parquet(path, **kw).map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow")
