"""Procedure-style CLI — the reference's `CALL algo.<name>(...)` surface
as a command line (reference procedure inventory: ListProc.java:42-46;
name→impl mapping in registry.PROCEDURES).

    python -m neo4j_graph_algorithms_ray list [substring]
    python -m neo4j_graph_algorithms_ray run algo.pageRank \
        --edges /data/edges.parquet --out /tmp/pr \
        --param damping=0.85 --param max_iterations=20

`run` loads a (src, dst[, weight]) parquet edge table, builds the graph
(GraphLoader analogue: --undirected, --weight-col, --dedup), resolves
the procedure to its implementation, binds --param k=v pairs to the
function's keyword signature, and writes the streamed result to
partitioned parquet (or prints the head without --out).

Owns its Ray session (guarded init) — the library itself never calls
ray.init().
"""

from __future__ import annotations

import argparse
import ast
import importlib
import inspect
import shutil
import sys


def _resolve(proc: str):
    from neo4j_graph_algorithms_ray.registry import PROCEDURES
    table = dict(PROCEDURES)
    if proc not in table:
        tail = proc.rpartition(".")[2].lower()
        near = [n for n, _ in PROCEDURES if tail and tail in n.lower()]
        raise SystemExit(
            f"unknown procedure {proc!r}"
            + (f"; close matches: {', '.join(near[:5])}" if near else
               " (see `list`)"))
    mod, _, fn = table[proc].rpartition(".")
    obj = importlib.import_module(f"neo4j_graph_algorithms_ray.{mod}")
    return getattr(obj, fn)


def _parse_params(pairs: list[str]) -> dict:
    out = {}
    for p in pairs:
        if "=" not in p:
            raise SystemExit(f"--param expects k=v, got {p!r}")
        k, _, v = p.partition("=")
        try:
            out[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            out[k] = v  # bare string value
    return out


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(prog="neo4j_graph_algorithms_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    lp = sub.add_parser("list", help="algo.list — enumerate procedures")
    lp.add_argument("filter", nargs="?", default="")

    rp = sub.add_parser("run", help="run a procedure over a parquet edge table")
    rp.add_argument("procedure")
    rp.add_argument("--edges", required=True,
                    help="parquet file/dir with (src, dst[, weight]) columns")
    rp.add_argument("--src-col", default="src")
    rp.add_argument("--dst-col", default="dst")
    rp.add_argument("--weight-col", default=None)
    rp.add_argument("--undirected", action="store_true")
    rp.add_argument("--no-dedup", action="store_true")
    rp.add_argument("--partitions", type=int, default=None,
                    help="engine shard count (default: auto)")
    rp.add_argument("--out", default=None,
                    help="output parquet dir (overwritten); prints head if omitted")
    rp.add_argument("--param", action="append", default=[],
                    help="algorithm kwarg as k=v (repeatable), e.g. damping=0.85")
    rp.add_argument("--num-cpus", type=int, default=None)

    args = ap.parse_args(argv)

    if args.cmd == "list":
        from neo4j_graph_algorithms_ray.registry import list_procedures
        for row in list_procedures(args.filter).to_pylist():
            print(f"{row['name']:55s} {row['impl']}")
        return

    import os

    import ray
    owns_session = not ray.is_initialized()
    if owns_session:
        # honor RAY_ADDRESS so the same entrypoint works as a
        # `ray job submit` driver on a running cluster (the job runner
        # sets RAY_ADDRESS to the cluster address); default local.
        # num_cpus only makes sense when we start the local node.
        addr = os.environ.get("RAY_ADDRESS", "local")
        ray.init(address=addr, include_dashboard=False,
                 logging_level="ERROR",
                 **({"num_cpus": args.num_cpus}
                    if args.num_cpus and addr == "local" else {}))
    import logging

    import ray.data as rd
    rd.DataContext.get_current().enable_progress_bars = False
    for name in ("ray", "ray.data"):
        logging.getLogger(name).setLevel(logging.CRITICAL)

    from neo4j_graph_algorithms_ray.graph import build_graph
    from neo4j_graph_algorithms_ray.util import read_parquet_clean

    fn = _resolve(args.procedure)
    params = _parse_params(args.param)

    edges = read_parquet_clean(args.edges)
    g = build_graph(edges, src_col=args.src_col, dst_col=args.dst_col,
                    weight_col=args.weight_col, undirected=args.undirected,
                    dedup=not args.no_dedup,
                    name=f"cli_{abs(hash((args.edges, args.undirected)))}")
    if args.partitions:
        params.setdefault("num_partitions", args.partitions)

    sig = inspect.signature(fn)
    accepted = set(sig.parameters)
    unknown = [k for k in params if k not in accepted]
    if unknown:
        raise SystemExit(f"{args.procedure} does not accept {unknown}; "
                         f"signature: {fn.__name__}{sig}")
    res = fn(g, **params)

    ds = getattr(res, "dataset", res)  # IterativeResult | Dataset | Table
    if not isinstance(ds, rd.Dataset):
        import pyarrow as pa
        if isinstance(ds, pa.Table):
            ds = rd.from_arrow(ds)
        elif isinstance(ds, tuple):  # e.g. triangle_count → (per-node, stats)
            ds = ds[0]
        else:
            print(ds)
            if owns_session:
                ray.shutdown()
            return
    stats = getattr(res, "stats", None)
    if stats:
        print({k: v for k, v in stats.items() if not isinstance(v, list)},
              file=sys.stderr)
    if args.out:
        shutil.rmtree(args.out, ignore_errors=True)  # write_parquet appends
        ds.write_parquet(args.out)
        print(f"wrote {ds.count()} rows to {args.out}")
    else:
        for row in ds.take(20):
            print(row)
    if owns_session:
        ray.shutdown()


if __name__ == "__main__":
    main()
