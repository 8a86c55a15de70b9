"""Edge-table ingestion from any on-disk format Ray Data reads.

The reference accepts edge input through Cypher projections and the
native store (core/.../heavyweight/HeavyCypherGraphFactory.java); our
native input model is "any (src, dst[, weight]) Dataset", so the only
source question is the file format. ``read_edge_table`` sniffs
parquet / CSV / JSONL by extension (or takes it explicitly), prunes to
the named columns at the read where the format supports it (parquet
column pruning; CSV/JSON prune in a map), and hands back a Dataset
ready for ``build_graph`` — every downstream stage is format-blind.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data as rd

_EXT_FORMATS = {
    ".parquet": "parquet", ".pq": "parquet",
    ".csv": "csv", ".tsv": "tsv",
    ".json": "json", ".jsonl": "json", ".ndjson": "json",
}


def _sniff(path: str) -> str:
    p = path.rstrip("/")
    ext = os.path.splitext(p)[1].lower()
    if ext in _EXT_FORMATS:
        return _EXT_FORMATS[ext]
    if os.path.isdir(p):  # directory: sniff the first data file
        for name in sorted(os.listdir(p)):
            e = os.path.splitext(name)[1].lower()
            if e in _EXT_FORMATS:
                return _EXT_FORMATS[e]
    raise ValueError(f"cannot sniff edge-table format of {path!r}; "
                     f"pass format= explicitly")


def read_edge_table(path: str, *, format: str | None = None,
                    src_col: str = "src", dst_col: str = "dst",
                    weight_col: str | None = None) -> rd.Dataset:
    """Read an edge table from parquet / CSV / TSV / JSONL →
    Dataset with exactly (src_col, dst_col[, weight_col])."""
    from neo4j_graph_algorithms_ray.util import read_parquet_clean

    fmt = format or _sniff(path)
    cols = [src_col, dst_col] + ([weight_col] if weight_col else [])
    if fmt == "parquet":
        return read_parquet_clean(path, columns=cols)
    if fmt in ("csv", "tsv"):
        from pyarrow import csv as pacsv
        parse = pacsv.ParseOptions(delimiter="\t" if fmt == "tsv" else ",")
        ds = rd.read_csv(path, parse_options=parse)
    elif fmt == "json":
        ds = rd.read_json(path)
    else:
        raise ValueError(f"unsupported edge-table format {fmt!r}")
    return ds.map_batches(lambda b: b.select(cols), batch_format="pyarrow")


def load_graph_from(path: str, *, format: str | None = None,
                    src_col: str = "src", dst_col: str = "dst",
                    weight_col: str | None = None, **graph_kw):
    """read_edge_table + build_graph in one call — the format-agnostic
    analogue of the reference's GraphLoader entry point."""
    from neo4j_graph_algorithms_ray.graph import build_graph
    edges = read_edge_table(path, format=format, src_col=src_col,
                            dst_col=dst_col, weight_col=weight_col)
    return build_graph(edges, src_col=src_col, dst_col=dst_col,
                       weight_col=weight_col, **graph_kw)
