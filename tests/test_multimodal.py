"""Multimodal plumbing: binary payload column through an actor-pool
decode stage — schema, batch sizing, stub error path."""

import numpy as np
import pytest
import ray.data as rd

from neo4j_graph_algorithms_ray.functions.multimodal import (
    FakeDecoder, attach_payload, media_pipeline)

DOCS = [{"doc_id": 0, "text": "hello"}, {"doc_id": 1, "text": ""},
        {"doc_id": 2, "text": "héllo"}]


def test_media_pipeline_schema_and_values():
    out = {r["doc_id"]: r for r in media_pipeline(rd.from_items(DOCS)).take_all()}
    assert out[0]["n_bytes"] == 5 and out[0]["first_byte"] == ord("h")
    assert out[1]["n_bytes"] == 0 and out[1]["first_byte"] == -1
    assert out[2]["n_bytes"] == 6  # é is 2 bytes in utf-8
    assert len(out[0]["feature"]) == 8
    f = np.asarray(out[0]["feature"])
    assert f.sum() == 5  # histogram over 5 bytes


def test_fake_decoder_strict_raises():
    import pyarrow as pa
    dec = FakeDecoder(strict=True)
    with pytest.raises(NotImplementedError):
        dec(pa.table({"doc_id": [1], "payload": [b"x"]}))


def test_payload_stays_binary_arrow():
    ds = attach_payload(rd.from_items(DOCS))
    sch = ds.schema()
    t = dict(zip(sch.names, [str(x) for x in sch.types]))
    assert t["payload"] == "binary"
