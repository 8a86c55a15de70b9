"""Format-agnostic edge-table ingestion: parquet / CSV / TSV / JSONL
must produce identical graphs."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from neo4j_graph_algorithms_ray.sources.edges import (load_graph_from,
                                                      read_edge_table)

EDGES = [(0, 1), (1, 2), (2, 0), (2, 3)]


def _write_all(tmp_path):
    t = pa.table({"src": [e[0] for e in EDGES],
                  "dst": [e[1] for e in EDGES],
                  "junk": ["x"] * len(EDGES)})
    paths = {}
    paths["parquet"] = str(tmp_path / "e.parquet")
    pq.write_table(t, paths["parquet"])
    paths["csv"] = str(tmp_path / "e.csv")
    with open(paths["csv"], "w") as f:
        f.write("src,dst,junk\n")
        for s, d in EDGES:
            f.write(f"{s},{d},x\n")
    paths["tsv"] = str(tmp_path / "e.tsv")
    with open(paths["tsv"], "w") as f:
        f.write("src\tdst\tjunk\n")
        for s, d in EDGES:
            f.write(f"{s}\t{d}\tx\n")
    paths["json"] = str(tmp_path / "e.jsonl")
    with open(paths["json"], "w") as f:
        for s, d in EDGES:
            f.write(json.dumps({"src": s, "dst": d, "junk": "x"}) + "\n")
    return paths


def test_read_edge_table_all_formats(tmp_path):
    paths = _write_all(tmp_path)
    want = sorted(EDGES)
    for fmt, path in paths.items():
        rows = read_edge_table(path).take_all()
        got = sorted((r["src"], r["dst"]) for r in rows)
        assert got == want, fmt
        assert set(rows[0].keys()) == {"src", "dst"}, fmt


def test_load_graph_from_csv_pagerank_parity(tmp_path):
    from neo4j_graph_algorithms_ray.algorithms import pagerank
    paths = _write_all(tmp_path)
    scores = {}
    for fmt in ("parquet", "csv"):
        g = load_graph_from(paths[fmt], name=f"edgesrc_{fmt}")
        res = pagerank(g, 0.85, max_iterations=50, tolerance=1e-8)
        scores[fmt] = {r["node"]: round(r["score"], 9)
                       for r in res.dataset.take_all()}
    assert scores["parquet"] == scores["csv"]


def test_sniff_unknown_raises(tmp_path):
    p = tmp_path / "edges.xyz"
    p.write_text("src,dst\n0,1\n")
    import pytest
    with pytest.raises(ValueError):
        read_edge_table(str(p))
