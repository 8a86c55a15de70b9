"""Resumable partitioned-Parquet output.

The 100-TB operating pattern: a pipeline maps *input shard groups* to
*output partitions* one-to-one; a failed or pre-empted run re-executes
only the groups whose output partition lacks a ``_SUCCESS`` marker —
finished partitions are never re-read OR re-computed (the skip happens
before the input files for that group are even opened).

This mirrors the reference's parallel write-back contract
(core/.../core/write/Exporter.java:151-270 batches the node range and
writes batches independently) lifted to restartable whole-partition
granularity, and the established Hadoop/Spark ``_SUCCESS`` convention.

Partition layout::

    out_dir/part=00000/ *.parquet + _SUCCESS
    out_dir/part=00001/ ...

Pick ``group_size`` so one group's pipeline saturates the cluster
(failure granularity = one group's work).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
from typing import Callable, Optional, Sequence

import ray.data as rd


def _marker(part_dir: str) -> str:
    return os.path.join(part_dir, "_SUCCESS")


def _marker_matches(part_dir: str, group: Sequence[str]) -> bool:
    """A _SUCCESS marker is only honored when the group's recorded input
    file list equals the current one. Positional group ids silently
    remap when the input file set changes between the failed run and
    the retry (file added/removed/renamed) — that must fail loudly, not
    drop or double-count input."""
    try:
        with open(_marker(part_dir)) as f:
            content = f.read()
    except OSError:
        return False
    if not content.strip():
        # legacy empty marker (pre-manifest): can't verify — refuse the
        # skip so the group recomputes rather than trusting a blind match
        raise RuntimeError(
            f"{_marker(part_dir)} has no input manifest; delete the "
            "partition (or the marker) to recompute it explicitly")
    recorded = json.loads(content).get("input_files")
    if recorded != [os.path.basename(p) for p in group]:
        raise RuntimeError(
            f"input file set changed for {part_dir}: marker recorded "
            f"{recorded}, current group is "
            f"{[os.path.basename(p) for p in group]}; delete {part_dir} "
            "(or the whole output dir) to recompute with the new inputs")
    return True


def partition_done(out_dir: str, gid: int,
                   group: Optional[Sequence[str]] = None) -> bool:
    """True when partition ``gid`` has a _SUCCESS marker. Pass the
    partition's input-file ``group`` to also validate the marker's
    input manifest (the same check resumable_write applies before
    skipping) — without it a marker written from a STALE input set
    still reports done."""
    part_dir = os.path.join(out_dir, f"part={gid:05d}")
    if not os.path.exists(_marker(part_dir)):
        return False
    if group is None:
        return True
    return _marker_matches(part_dir, list(group))


def resumable_write(
    input_files: Sequence[str],
    transform: Callable[[rd.Dataset], rd.Dataset],
    out_dir: str,
    *,
    read_fn: Optional[Callable[[Sequence[str]], rd.Dataset]] = None,
    group_size: int = 8,
) -> dict:
    """Run ``transform`` over ``input_files`` in shard groups, writing
    ``out_dir/part=<gid>`` per group with a ``_SUCCESS`` marker;
    groups whose marker exists are skipped entirely (not read, not
    computed). Partial output from a crashed attempt is cleared before
    the retry so re-runs never double rows.

    ``read_fn`` builds the group's Dataset (default:
    ``util.read_parquet_clean``). Returns
    ``{"written": [...gids], "skipped": [...gids]}``.
    """
    from neo4j_graph_algorithms_ray.util import read_parquet_clean

    files = sorted(input_files)
    if not files:
        return {"written": [], "skipped": []}
    rf = read_fn or (lambda fs: read_parquet_clean(list(fs)))
    groups = [files[i:i + group_size] for i in range(0, len(files), group_size)]
    written, skipped = [], []
    for gid, group in enumerate(groups):
        part_dir = os.path.join(out_dir, f"part={gid:05d}")
        if os.path.exists(_marker(part_dir)) and _marker_matches(part_dir, group):
            skipped.append(gid)
            continue
        if os.path.isdir(part_dir):  # residue of a failed attempt
            shutil.rmtree(part_dir)
        os.makedirs(part_dir, exist_ok=True)
        transform(rf(group)).write_parquet(part_dir)
        with open(_marker(part_dir), "w") as f:
            json.dump({"input_files": [os.path.basename(p) for p in group]}, f)
        written.append(gid)
    return {"written": written, "skipped": skipped}


def read_resumable_output(out_dir: str) -> rd.Dataset:
    """Read back only the *completed* partitions of a resumable_write
    output directory."""
    from neo4j_graph_algorithms_ray.util import read_parquet_clean

    parts = sorted(glob.glob(os.path.join(out_dir, "part=*")))
    done = [p for p in parts if os.path.exists(_marker(p))]
    if not done:
        raise FileNotFoundError(f"no completed partitions under {out_dir}")
    return read_parquet_clean(done, file_extensions=["parquet"])
