"""Resumable partitioned output: skip-finished, retry-partial semantics."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from neo4j_graph_algorithms_ray.sinks import (
    read_resumable_output, resumable_write)


@pytest.fixture()
def input_shards(tmp_path):
    files = []
    for i in range(6):
        p = tmp_path / f"in_{i}.parquet"
        pq.write_table(pa.table({"x": [i * 10 + j for j in range(5)]}), p)
        files.append(str(p))
    return files


def _double(ds):
    return ds.map_batches(
        lambda t: pa.table({"x": pa.compute.multiply(t["x"], 2)}),
        batch_format="pyarrow")


def test_resumable_write_and_skip(input_shards, tmp_path):
    out = str(tmp_path / "out")
    r1 = resumable_write(input_shards, _double, out, group_size=2)
    assert r1 == {"written": [0, 1, 2], "skipped": []}
    back = read_resumable_output(out)
    vals = sorted(r["x"] for r in back.take_all())
    assert vals == sorted((i * 10 + j) * 2 for i in range(6) for j in range(5))

    # second run: everything already done — nothing recomputed or rewritten
    r2 = resumable_write(input_shards, _double, out, group_size=2)
    assert r2 == {"written": [], "skipped": [0, 1, 2]}


def test_resumable_write_retries_partial(input_shards, tmp_path):
    out = str(tmp_path / "out")
    resumable_write(input_shards, _double, out, group_size=2)
    # simulate a crashed partition: marker missing, stale rows present
    part1 = os.path.join(out, "part=00001")
    os.remove(os.path.join(part1, "_SUCCESS"))
    # duplicate a data file to prove residue is cleared, not appended to
    data = glob.glob(os.path.join(part1, "*.parquet"))[0]
    import shutil
    shutil.copy(data, data + "_stale.parquet")

    r = resumable_write(input_shards, _double, out, group_size=2)
    assert r == {"written": [1], "skipped": [0, 2]}
    back = read_resumable_output(out)
    vals = sorted(r["x"] for r in back.take_all())
    assert vals == sorted((i * 10 + j) * 2 for i in range(6) for j in range(5))


def test_resumable_write_detects_changed_input_set(input_shards, tmp_path):
    """_SUCCESS markers record the group's input files; a changed file
    set must fail loudly instead of silently remapping groups."""
    out = str(tmp_path / "out")
    resumable_write(input_shards, _double, out, group_size=2)
    # drop one input file: group boundaries shift
    changed = input_shards[:1] + input_shards[2:]
    with pytest.raises(RuntimeError, match="input file set changed"):
        resumable_write(changed, _double, out, group_size=2)


def test_resumable_write_rejects_legacy_empty_marker(input_shards, tmp_path):
    out = str(tmp_path / "out")
    resumable_write(input_shards, _double, out, group_size=2)
    marker = os.path.join(out, "part=00000", "_SUCCESS")
    with open(marker, "w"):
        pass  # blank pre-manifest marker — unverifiable
    with pytest.raises(RuntimeError, match="no input manifest"):
        resumable_write(input_shards, _double, out, group_size=2)
