"""Iteration checkpoints: manifest with per-partition lineage + metrics.

Layout (north-rule "resumable output"):

    {ckpt_dir}/iter={k}/part-00000.parquet ...
    {ckpt_dir}/manifest.json       # latest completed iteration + lineage

The reference has no in-engine checkpointing (its only cross-call reuse
is the named graph cache, core/.../core/loadgraph/LoadGraphFactory.java);
this is the explicit distributed-design addition the north rule asks for.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Optional


def write_manifest(ckpt_dir: str, *, iteration: int, algo: str, config: dict,
                   partitions: list[dict], metrics: list[dict],
                   extra: Optional[dict] = None) -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    doc = {
        "algo": algo,
        "iteration": iteration,
        "written_at": time.time(),
        "config": config,
        "partitions": partitions,   # per-partition file lineage
        "metrics": metrics,         # per-partition per-iteration metrics
    }
    if extra:
        doc.update(extra)
    path = os.path.join(ckpt_dir, "manifest.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(doc, f, indent=1, default=str)
    os.replace(tmp, path)
    return path


def read_manifest(ckpt_dir: str) -> Optional[dict[str, Any]]:
    path = os.path.join(ckpt_dir, "manifest.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)
