"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decode / feature-extract as actor-pool map_batches stages.

The container has no image/audio codecs, so the *decode* itself is a
deterministic fake behind ``FakeDecoder`` (clearly marked; a real
deployment swaps in PIL/torchaudio in ``__init__``); everything Ray-side
— schema (binary column kept in Arrow end to end, never pandas object
dtype), small batch sizes for wide rows, actor signature, output layout
— is real and tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def attach_payload(docs: rd.Dataset, text_col: str = "text",
                   payload_col: str = "payload") -> rd.Dataset:
    """Fabricate a binary payload column (utf-8 bytes of the text) so
    the multimodal path can be exercised on the synthetic tables."""
    def mk(batch: pa.Table) -> pa.Table:
        return batch.append_column(payload_col, batch[text_col].cast(pa.binary()))

    return docs.map_batches(mk, batch_format="pyarrow")


class FakeDecoder:
    """STUB decoder (deterministic fake — no media codecs in this
    container). Real plumbing: binary in via zero-copy Arrow, fixed-size
    feature vector out. Emits (id, n_bytes, first_byte, feature).

    ``strict=True`` raises NotImplementedError like a missing codec
    would, exercising the error path."""

    def __init__(self, id_col: str = "doc_id", payload_col: str = "payload",
                 feature_dim: int = 8, strict: bool = False):
        self.id_col, self.payload_col = id_col, payload_col
        self.dim = feature_dim
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "media codecs unavailable in this environment; "
                "install PIL/torchaudio and swap FakeDecoder for a real one")
        payload = batch[self.payload_col]
        n_bytes = pc.binary_length(payload).cast(pa.int64())
        # vectorized over the Arrow flat layout: one np.frombuffer over
        # the value buffer + the offsets vector, no per-row .as_py() —
        # the pattern a real codec swap should inherit (decode batched
        # against the contiguous buffer, slice by offsets)
        arr = pc.fill_null(payload, b"").combine_chunks()
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.chunk(0) if arr.num_chunks else pa.array([], pa.binary())
        off_dtype = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
        offs = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
            arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
        data = np.frombuffer(arr.buffers()[2] or b"", dtype=np.uint8)
        lens = np.diff(offs)
        n = batch.num_rows
        first = np.full(n, -1, dtype=np.int64)
        nz = lens > 0
        first[nz] = data[offs[:-1][nz]]
        # deterministic fake "feature": bucketed byte histogram per row,
        # computed for ALL rows at once via one flat bincount keyed by
        # row_index * dim + (byte % dim)
        row_of_byte = np.repeat(np.arange(n, dtype=np.int64), lens)
        flat = np.bincount(row_of_byte * self.dim
                           + (data[offs[0]:offs[-1]] % self.dim),
                           minlength=n * self.dim)
        feats = flat.reshape(n, self.dim).astype(np.float32) if n else \
            np.zeros((0, self.dim), dtype=np.float32)
        return pa.table({
            self.id_col: batch[self.id_col],
            "n_bytes": n_bytes,
            "first_byte": pa.array(first),
            "feature": pa.FixedSizeListArray.from_arrays(
                pa.array(feats.ravel(), pa.float32()), self.dim),
        })


def media_pipeline(docs: rd.Dataset, *, id_col: str = "doc_id",
                   batch_size: int = 256, concurrency: int = 2) -> rd.Dataset:
    """attach payload → actor-pool decode. Small batches because binary
    rows are wide (ray_guide: memory-aware batch sizing)."""
    with_payload = attach_payload(docs)
    # autoscaling (1, N): a fixed pool of N can reserve every cluster
    # CPU and starve/deadlock the upstream payload stage
    return with_payload.map_batches(
        FakeDecoder, fn_constructor_kwargs={"id_col": id_col},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency), num_cpus=1)
