"""Small distributed utilities shared across the engine."""

from __future__ import annotations

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


def to_arrow_blocks(ds: rd.Dataset) -> rd.Dataset:
    """Normalize block format to Arrow. Datasets produced by
    pandas-format map_groups carry pandas blocks, on which downstream
    Project ops (rename_columns / select_columns) fail in Ray 2.49 —
    route them through an identity pyarrow map_batches."""
    return ds.map_batches(lambda t: t, batch_format="pyarrow")


def drop_empty_blocks(ds: rd.Dataset) -> rd.Dataset:
    """Remove schema-less empty blocks (emitted by groupby/map_groups for
    empty partitions) — they crash pyarrow's acero hash join with
    "No match ... for key field reference". Materializes the dataset."""
    ds = ds.materialize()
    refs = ds.to_arrow_refs()

    @ray.remote
    def _rows(t: pa.Table) -> int:
        return t.num_rows

    counts = ray.get([_rows.remote(r) for r in refs])
    keep = [r for r, c in zip(refs, counts) if c > 0]
    if not keep:
        return ds  # fully empty; caller must handle
    return rd.from_arrow_refs(keep)


def safe_join(left: rd.Dataset, right: rd.Dataset, join_type: str,
              num_partitions: int, on: tuple, right_on: tuple | None = None,
              **kw) -> rd.Dataset:
    """Dataset.join that tolerates empty upstream partitions."""
    left = drop_empty_blocks(left)
    right = drop_empty_blocks(right)
    return left.join(right, join_type, num_partitions, on=on,
                     right_on=right_on, **kw)


def table_from_arrays(**cols) -> pa.Table:
    """pa.Table from name→numpy/arrow arrays (order preserved)."""
    return pa.table({k: v for k, v in cols.items()})


def ds_from_pandas(df) -> rd.Dataset:
    return rd.from_pandas(df)
