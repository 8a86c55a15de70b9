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
        buf = payload.combine_chunks()
        feats = np.zeros((batch.num_rows, self.dim), dtype=np.float32)
        first = np.full(batch.num_rows, -1, dtype=np.int64)
        for i in range(batch.num_rows):
            b = buf[i].as_py() or b""
            if b:
                first[i] = b[0]
                arr = np.frombuffer(b, dtype=np.uint8)
                # deterministic fake "feature": bucketed byte histogram
                feats[i] = np.bincount(arr % self.dim, minlength=self.dim)[:self.dim]
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
    return with_payload.map_batches(
        FakeDecoder, fn_constructor_kwargs={"id_col": id_col},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)
