"""Bench harness.

Default: run the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) with ray.init(num_cpus=$RAY_GRAFT_CPUS or 32) and
print ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "edges_scattered_per_sec": ...}

--scaling: run the north-metric workload (PageRank over a deterministic
seed-pinned scale-free graph, ~6.5M edges) twice in FRESH processes at
num_cpus=8 and num_cpus=32 on the identical input, and report both
throughputs plus scaling efficiency = (T_32/T_8)/4. This is the
sandbox stand-in for the N→4N two-cluster-size criterion (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
SCALE_N = int(os.environ.get("NGA_SCALE_NODES", "2000000"))


def _init_ray(num_cpus: int):
    import logging

    import ray
    import ray.data as rd
    os.environ.setdefault("OMP_NUM_THREADS", "1")
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ctx = rd.DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray").setLevel(logging.CRITICAL)
    logging.getLogger("ray.data").setLevel(logging.CRITICAL)
    return ray


def _calibrate() -> float:
    """Single-thread box-speed calibration: best-of-3 np.unique over a
    fixed 2.4M-element random int64 array. A quiet box measures ~0.25 s;
    noisy-neighbor / throttled phases measure 0.8-1.2 s and inflate every
    sort/shuffle-bound query 2-4x with near-zero visible CPU steal —
    recorded with each bench so artifacts from different box states are
    comparable."""
    import numpy as np
    rng = np.random.default_rng(42)
    a = rng.integers(0, 1 << 40, size=2_400_000)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.unique(a)
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def headline(num_cpus: int) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    # settle: a prior Ray session's teardown (e.g. the correctness gate
    # run just before this) leaves the box noisy for ~30s and inflates
    # single-shot timings 2-3x
    time.sleep(int(os.environ.get("NGA_BENCH_SETTLE", "30")))
    # then wait (bounded) for a window without host-VM CPU steal —
    # steal waves of 10-25% lasting minutes double every query timing
    deadline = time.monotonic() + int(os.environ.get("NGA_BENCH_WAIT_QUIET", "300"))
    while time.monotonic() < deadline:
        def _jif():
            with open("/proc/stat") as f:
                v = [int(x) for x in f.readline().split()[1:]]
            return sum(v), v[7] if len(v) > 7 else 0
        a_tot, a_st = _jif()
        time.sleep(5)
        b_tot, b_st = _jif()
        if 100.0 * (b_st - a_st) / max(1, b_tot - a_tot) < 2.0:
            break
    os.environ["NGA_GRAPH_ROOT"] = tempfile.mkdtemp(prefix="nga_bench_")
    ray = _init_ray(num_cpus)
    from neo4j_graph_algorithms_ray.algorithms import (
        compute_all_metapaths, label_propagation, pagerank, triangle_count, wcc)
    from neo4j_graph_algorithms_ray.pipelines.tpch import get_graph, typed_edge_ds

    # prewarm the Ray worker pool (untimed): the first Dataset execution
    # of a session pays ~3s of worker-process spawn that belongs to
    # cluster startup, not to any query
    import ray.data as _rdw
    _rdw.range(4096, override_num_blocks=num_cpus * 2).map_batches(
        lambda b: b, batch_format="pyarrow").materialize()

    queries: dict[str, float] = {}
    extras: dict[str, float] = {}
    extras["calib_sort_sec"] = _calibrate()

    def _steal_now(interval=1.0):
        def jif():
            with open("/proc/stat") as f:
                v = [int(x) for x in f.readline().split()[1:]]
            return sum(v), v[7] if len(v) > 7 else 0
        a_tot, a_st = jif()
        time.sleep(interval)
        b_tot, b_st = jif()
        return 100.0 * (b_st - a_st) / max(1, b_tot - a_tot)

    def timed(name, fn, repeats=1):
        # steal waves arrive MID-run too, not just at start: give each
        # query its own bounded wait for a quiet window (a 10-25% wave
        # doubles or triples any single-shot timing); compute queries
        # additionally take best-of-``repeats`` (loads stay single-shot
        # — their caches would make a second run measure nothing)
        best, out = None, None
        for _ in range(max(1, repeats)):
            q_deadline = time.monotonic() + 60
            while _steal_now() >= 2.0 and time.monotonic() < q_deadline:
                pass
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        queries[name] = round(best, 3)
        return out

    # graph load (the reference's loadMillis) measured separately
    g = timed("load_purchase", lambda: get_graph(SF_DIR, "purchase"))
    res = timed("pagerank", lambda: pagerank(
        g, 0.85, max_iterations=100, tolerance=1e-6), repeats=2)
    extras["pagerank_iterations"] = res.iterations
    extras["edges_scattered_per_sec"] = round(res.stats["edges_scattered_per_sec"], 1)

    gu = timed("load_purchase_und", lambda: get_graph(SF_DIR, "purchase_und"))
    timed("wcc", lambda: wcc(gu).dataset.materialize(), repeats=2)
    timed("labelprop", lambda: label_propagation(
        g, max_iterations=6).dataset.materialize(), repeats=2)

    gc = timed("load_copart", lambda: get_graph(SF_DIR, "copart"))
    timed("triangles", lambda: triangle_count(gc)[0].materialize(), repeats=2)
    timed("metapaths_l2", lambda: compute_all_metapaths(
        typed_edge_ds(SF_DIR), length=2).materialize(), repeats=2)

    # flagship web pipeline: pages → extraction → link graph → PageRank
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_web_graph
    gw = timed("load_webgraph", lambda: get_web_graph(SF_DIR))
    timed("web_pagerank", lambda: pagerank(
        gw, 0.85, max_iterations=100, tolerance=1e-6,
        node_col="url").dataset.materialize(), repeats=2)

    # per-source BSP betweenness throughput (extras only — headline
    # composition is pinned): 64 sampled sources through the sharded
    # forward/backward wave engine; sources/s is the number that scales
    # with cluster size (the task-parallel exact path broadcasts the
    # whole CSR per actor instead)
    from neo4j_graph_algorithms_ray.algorithms.betweenness import betweenness_bsp
    bc_sources = int(os.environ.get("NGA_BENCH_BC_SOURCES", "64"))
    timed("betweenness_bsp", lambda: betweenness_bsp(
        gw, sample=bc_sources, node_col="url").dataset.materialize(),
        repeats=2)
    extras["betweenness_bsp_sources_per_sec"] = round(
        bc_sources / queries.pop("betweenness_bsp"), 1)

    # batched multi-seed PPR: S rank vectors per exchange — report the
    # amortization vs S independent single-seed runs (4 singles timed,
    # extrapolated ×4)
    from neo4j_graph_algorithms_ray.algorithms.pagerank import pagerank_batch
    from neo4j_graph_algorithms_ray.sources.pages import url_of
    seeds16 = [url_of(i) for i in range(16)]
    timed("ppr_batch16", lambda: pagerank_batch(
        gw, seeds16, 0.85, max_iterations=20,
        node_col="url").dataset.materialize(), repeats=2)
    t0 = time.perf_counter()
    for _s in seeds16[:4]:
        pagerank(gw, 0.85, max_iterations=20,
                 source_nodes=[_s]).dataset.materialize()
    t_single4 = time.perf_counter() - t0
    extras["ppr_batch16_amortization_x"] = round(
        4 * t_single4 / max(queries["ppr_batch16"], 1e-9), 1)

    # extraction throughput over bench-scale synthetic pages
    n_pages = int(os.environ.get("NGA_BENCH_PAGES", "100000"))
    import ray.data as _rd

    from neo4j_graph_algorithms_ray.sources.pages import synthetic_pages_path
    from neo4j_graph_algorithms_ray.stages.extract import ExtractLinks
    pdir = synthetic_pages_path(n_pages)  # cached; generation not timed

    def extract_all():
        from neo4j_graph_algorithms_ray.util import read_parquet_clean
        pages = read_parquet_clean(pdir, columns=["url", "html"],
                                   file_extensions=["parquet"])
        edges = pages.map_batches(ExtractLinks(), batch_format="pyarrow",
                                  batch_size=2048)
        return edges.count()

    n_edges = timed(f"extract_links_{n_pages}p", extract_all, repeats=2)
    extras["extract_pages_per_sec"] = round(
        n_pages / queries[f"extract_links_{n_pages}p"], 1)
    extras["extract_edges"] = n_edges

    # tolerant-mode extraction (real-crawl HTML variants + base-href
    # resolution) — contract: within ~2x of the strict path's pages/s
    def extract_tolerant():
        from neo4j_graph_algorithms_ray.util import read_parquet_clean
        pages = read_parquet_clean(pdir, columns=["url", "html"],
                                   file_extensions=["parquet"])
        edges = pages.map_batches(ExtractLinks(tolerant=True),
                                  batch_format="pyarrow", batch_size=2048)
        return edges.count()

    timed("extract_tolerant", extract_tolerant, repeats=2)
    extras["extract_tolerant_pages_per_sec"] = round(
        n_pages / queries.pop("extract_tolerant"), 1)

    # training-data dedup throughput: MinHash signatures → LSH buckets →
    # verified pairs → WCC cluster resolution, end to end over documents
    from neo4j_graph_algorithms_ray.functions.dedup import neardup_clusters
    from neo4j_graph_algorithms_ray.util import read_parquet_clean
    docs = read_parquet_clean(f"{SF_DIR}/documents.parquet",
                              columns=["doc_id", "text"])
    n_docs = docs.count()
    timed("neardup_dedup", lambda: neardup_clusters(docs).materialize(),
          repeats=2)
    extras["dedup_docs_per_sec"] = round(n_docs / queries["neardup_dedup"], 1)

    # duplicate-heavy dedup throughput (extras only — the headline's
    # query composition is pinned): the same end-to-end pipeline over
    # the corpus replicated 8×, the regime where exact-dup collapse
    # carries the cost. Real crawl corpora are duplicate-heavy, so this
    # is the more scale-honest docs/s number.
    import pyarrow as _pa
    reps = 8
    dt = ray.get(docs.to_arrow_refs())
    dtbl = _pa.concat_tables([t for t in dt if t.num_rows])
    # offset by the max id, not a fixed constant — a corpus with ids
    # >= the constant would silently collide replica ids
    id_off = int(dtbl["doc_id"].to_numpy().max()) + 1
    dup_tabs = [_pa.table({
        "doc_id": _pa.array(dtbl["doc_id"].to_numpy() + r * id_off),
        "text": dtbl["text"]}) for r in range(reps)]
    dup_docs = _rd.from_arrow(_pa.concat_tables(dup_tabs)) \
                  .repartition(num_cpus * 2).materialize()
    n_dup = n_docs * reps

    def dedup_dup_heavy():
        return neardup_clusters(dup_docs).materialize()

    timed(f"neardup_dupheavy_{n_dup}d", dedup_dup_heavy, repeats=2)
    dh_sec = queries.pop(f"neardup_dupheavy_{n_dup}d")
    extras["dedup_dupheavy_docs"] = n_dup
    extras["dedup_dupheavy_docs_per_sec"] = round(n_dup / dh_sec, 1)

    # corpus-featurizer throughput (the per-document stages a 100 TB run
    # executes on everything): quality features + language ID in one
    # pass. sf0.1 has only 5k docs — fixed pipeline costs would swamp a
    # docs/s number — so replicate to ~160k docs (featurizers are
    # row-local; replication changes nothing about per-doc work).
    reps = int(os.environ.get("NGA_BENCH_DOC_REPS", "32"))
    import pyarrow.parquet as _pq
    _t = _pq.read_table(f"{SF_DIR}/documents.parquet",
                        columns=["doc_id", "text"]) \
             .replace_schema_metadata(None)  # pandas metadata breaks block-schema hashing
    import pyarrow as _pa

    # one replicated Arrow table (chained Dataset.union builds a deeply
    # nested plan that the executor schedules pathologically)
    big_docs = _rd.from_arrow(
        _pa.concat_tables([_t] * reps)).repartition(num_cpus * 2).materialize()
    n_big = _t.num_rows * reps
    from neo4j_graph_algorithms_ray.functions.text import LangId, QualityScore

    def featurize_all():
        q = big_docs.map_batches(QualityScore(), batch_format="pyarrow",
                                 batch_size=4096)
        lang = big_docs.map_batches(LangId(), batch_format="pyarrow",
                                    batch_size=4096)
        return q.count() + lang.count()

    timed(f"text_featurize_{n_big}d", featurize_all, repeats=2)
    # throughput line only — NOT part of the headline total (the total's
    # query composition is pinned so it stays comparable across rounds;
    # BASELINE.md bands were measured without this stage)
    feat_sec = queries.pop(f"text_featurize_{n_big}d")
    extras["featurize_sec"] = feat_sec
    extras["featurize_docs"] = n_big
    extras["featurize_docs_per_sec"] = round(n_big / feat_sec, 1)

    # duplicate-span removal + bigram-LM scoring throughput (round-4
    # corpus operators; same replicated corpus, throughput lines only)
    from neo4j_graph_algorithms_ray.functions.text import (bigram_xent,
                                                           span_dedup)

    def span_pass():
        return span_dedup(big_docs, k=5, min_count=2).count()

    timed(f"span_dedup_{n_big}d", span_pass, repeats=2)
    sp_sec = queries.pop(f"span_dedup_{n_big}d")
    extras["span_dedup_docs_per_sec"] = round(n_big / sp_sec, 1)

    def xent_pass():
        return bigram_xent(big_docs, min_count=2).count()

    timed(f"bigram_xent_{n_big}d", xent_pass, repeats=2)
    bx_sec = queries.pop(f"bigram_xent_{n_big}d")
    extras["bigram_xent_docs_per_sec"] = round(n_big / bx_sec, 1)

    # round-4 session-3 corpus operators (throughput lines only)
    from neo4j_graph_algorithms_ray.functions.text import (chunk_documents,
                                                           nb_quality_score)

    def nb_pass():
        return nb_quality_score(big_docs, min_words=40,
                                min_stop_hits=1).count()

    timed(f"nb_quality_{n_big}d", nb_pass, repeats=2)
    nb_sec = queries.pop(f"nb_quality_{n_big}d")
    extras["nb_quality_docs_per_sec"] = round(n_big / nb_sec, 1)

    def chunk_pass():
        return chunk_documents(big_docs, chunk_tokens=128,
                               overlap=16).count()

    timed(f"chunk_docs_{n_big}d", chunk_pass, repeats=2)
    ck_sec = queries.pop(f"chunk_docs_{n_big}d")
    extras["chunk_docs_per_sec"] = round(n_big / ck_sec, 1)

    # round-4 session-5 corpus operators (throughput lines only):
    # winnowing fingerprints (byte-level, every doc) and cross-doc
    # duplicate-n-gram scoring (two corpus passes + broadcast dup set)
    from neo4j_graph_algorithms_ray.functions.text import (dup_ngram_frac,
                                                           winnow_fingerprints)

    def winnow_pass():
        return winnow_fingerprints(big_docs, k=8, w=4).count()

    timed(f"winnow_{n_big}d", winnow_pass, repeats=2)
    wn_sec = queries.pop(f"winnow_{n_big}d")
    extras["winnow_docs_per_sec"] = round(n_big / wn_sec, 1)

    def dupgram_pass():
        return dup_ngram_frac(big_docs, k=5, min_docs=2).count()

    timed(f"dup_ngram_{n_big}d", dupgram_pass, repeats=2)
    dg_sec = queries.pop(f"dup_ngram_{n_big}d")
    extras["dup_ngram_docs_per_sec"] = round(n_big / dg_sec, 1)

    # round-4 session-8: PII masking throughput (safety-filter stage a
    # 100 TB run executes on every document; throughput line only)
    from neo4j_graph_algorithms_ray.functions.text import pii_redact

    def pii_pass():
        return pii_redact(big_docs).count()

    timed(f"pii_redact_{n_big}d", pii_pass, repeats=2)
    pr_sec = queries.pop(f"pii_redact_{n_big}d")
    extras["pii_redact_docs_per_sec"] = round(n_big / pr_sec, 1)

    # round-4 session-10 corpus operators (throughput lines only):
    # trigram stupid-backoff LM scoring (three count passes + broadcast
    # tables + score pass) and per-host boilerplate stripping (count
    # pass + threshold join + rebuild pass). boilerplate groups by a
    # synthetic host key (doc_id % 64) since the replicated corpus
    # carries no source column.
    from neo4j_graph_algorithms_ray.functions.text import (boilerplate_strip,
                                                           trigram_xent)

    def trigram_pass():
        return trigram_xent(big_docs, min_count=16).count()

    timed(f"trigram_xent_{n_big}d", trigram_pass, repeats=2)
    tx_sec = queries.pop(f"trigram_xent_{n_big}d")
    extras["trigram_xent_docs_per_sec"] = round(n_big / tx_sec, 1)

    def _with_host(b):
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "source", _pa.array((ids % 64).astype("int64").astype(str)))

    host_docs = big_docs.map_batches(_with_host, batch_format="pyarrow")

    def boiler_pass():
        return boilerplate_strip(host_docs, frac=0.3, min_docs=3).count()

    timed(f"boilerplate_{n_big}d", boiler_pass, repeats=2)
    bp_sec = queries.pop(f"boilerplate_{n_big}d")
    extras["boilerplate_docs_per_sec"] = round(n_big / bp_sec, 1)

    # incremental cross-snapshot dedup, worst case: new == old, so
    # every document Bloom-hits and transits the exact verify join —
    # the upper bound on per-doc cost (real crawls mostly miss the
    # filter and skip the join entirely). Distinct Dataset objects per
    # side: sharing one materialized handle across both trips a Ray
    # core task-manager check (observed ray 2.49 crash).
    from neo4j_graph_algorithms_ray.functions.dedup import incremental_dedup
    big_docs2 = _rd.from_arrow(
        _pa.concat_tables([_t] * reps)).repartition(num_cpus * 2).materialize()

    def incr_pass():
        return incremental_dedup(big_docs, big_docs2).count()

    timed(f"incr_dedup_{n_big}d", incr_pass, repeats=2)
    ic_sec = queries.pop(f"incr_dedup_{n_big}d")
    extras["incr_dedup_alldup_docs_per_sec"] = round(n_big / ic_sec, 1)

    total = round(sum(queries.values()), 3)
    ray.shutdown()
    return {"metric": "headline_pipelines_total", "value": total, "unit": "sec",
            "queries": queries, "sf": SF_DIR, "num_cpus": num_cpus, **extras}


def scaling_workload(num_cpus: int) -> dict:
    """North-metric workload: PageRank over the seed-pinned scale-free
    graph; throughput = edges-scattered/sec across fixed 10 iterations."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    # stable root: the second CPU-count run reuses the identical
    # partitioned-parquet graph layout (same content fingerprint)
    os.environ["NGA_GRAPH_ROOT"] = os.environ.get(
        "NGA_SCALE_ROOT", "/tmp/nga_scale_shared")
    # float32 message traffic is the production configuration for the
    # north-metric kernel (halves exchange+scatter DRAM bytes; the
    # reference's analogous cut is ×100k int score quantization,
    # PageRank.java:54) — overridable for f64 comparison runs
    os.environ.setdefault("NGA_PR_MSG_DTYPE", "float32")
    ray = _init_ray(num_cpus)
    import ray.data as rd

    from neo4j_graph_algorithms_ray import build_graph, fixtures as fx
    from neo4j_graph_algorithms_ray.algorithms import pagerank

    from neo4j_graph_algorithms_ray.algorithms.common import get_engine

    t0 = time.perf_counter()
    mean_deg = int(os.environ.get("NGA_SCALE_DEG", "64"))
    # cache the generated table: gen costs minutes at 166M edges and the
    # scaling comparison re-runs this workload at two CPU counts
    cache = os.path.join(os.environ["NGA_GRAPH_ROOT"],
                         f"scalefree_{SCALE_N}_{mean_deg}_42.parquet")
    if os.path.exists(cache):
        import pyarrow.parquet as _pq
        tbl = _pq.read_table(cache)
    else:
        tbl = fx.scale_free_edges(SCALE_N, mean_deg=mean_deg, seed=42)
        import pyarrow.parquet as _pq
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        tmp = cache + ".tmp"
        _pq.write_table(tbl, tmp)
        os.replace(tmp, cache)
    gen_sec = time.perf_counter() - t0
    t0 = time.perf_counter()
    g = build_graph(rd.from_arrow(tbl).repartition(max(8, num_cpus)),
                    name=f"scalefree{SCALE_N}")
    build_sec = time.perf_counter() - t0
    # engine warm-up = the reference's load phase (loadMillis); the north
    # metric is edges-scattered/sec per *iteration*, i.e. compute only
    # P is FIXED at 32 shards for both CPU counts: the two runs differ
    # only in execution parallelism, exactly like growing a cluster
    # under a fixed sharding — partitioning, message volume and results
    # are bit-identical across the two measurements.
    P = int(os.environ.get("NGA_SCALE_P", "32"))
    t0 = time.perf_counter()
    get_engine(g, P)
    load_sec = time.perf_counter() - t0
    # one untimed warmup superstep, then best-of-3 timed runs (OS noise
    # from prior Ray sessions' teardown inflates single measurements)
    pagerank(g, 0.85, max_iterations=1, num_partitions=P)

    def cpu_jiffies():
        with open("/proc/stat") as f:
            parts = f.readline().split()[1:]
        vals = [int(x) for x in parts]
        return sum(vals), vals[7] if len(vals) > 7 else 0  # total, steal

    best, res, best_steal = None, None, 0.0
    for _ in range(int(os.environ.get("NGA_SCALE_REPEATS", "3"))):
        tot0, st0 = cpu_jiffies()
        t0 = time.perf_counter()
        r = pagerank(g, 0.85, max_iterations=10, num_partitions=P)
        dt = time.perf_counter() - t0
        tot1, st1 = cpu_jiffies()
        steal = 100.0 * (st1 - st0) / max(1, tot1 - tot0)
        if best is None or dt < best:
            best, res, best_steal = dt, r, steal
    compute = best
    out = {"num_cpus": num_cpus, "edges": g.num_edges,
           "calib_sort_sec": _calibrate(),
           "iterations": res.iterations,
           "edges_scattered": res.stats["edges_scattered"],
           "gen_sec": round(gen_sec, 3), "build_sec": round(build_sec, 3),
           "load_sec": round(load_sec, 3), "sec": round(compute, 3),
           # host-VM CPU steal during the best timed window — context for
           # run-to-run variance on shared-tenant boxes (0 = clean)
           "steal_pct": round(best_steal, 1),
           "edges_scattered_per_sec": round(res.stats["edges_scattered"] / compute, 1)}
    ray.shutdown()
    return out


def main():
    if "--scaling-worker" in sys.argv:
        print(json.dumps(scaling_workload(NUM_CPUS)))
        return
    if "--scaling" in sys.argv:
        # Host-VM CPU steal perturbs single runs by up to 2-3x (noise is
        # strictly additive: it can only slow a run down). Each CPU count
        # therefore runs NGA_SCALE_OUTER fresh processes and reports the
        # fastest. NGA_SCALE_CONTROL=1 appends the unpinned control pair
        # (num_cpus limit only, full physical bandwidth at both settings)
        # — the sandbox stand-in for N→4N cluster nodes each bringing
        # their own DRAM bus (BASELINE.md).
        outer = int(os.environ.get("NGA_SCALE_OUTER", "2"))
        # The N→4N pair: default 8→32 (the full box). NGA_SCALE_CPUS
        # picks other levels, e.g. "2,8" — a pair where the shared DRAM
        # bus is NOT saturated at either leg, isolating the engine's own
        # scaling from the single-box bandwidth ceiling (BASELINE.md).
        lo, hi = (int(x) for x in
                  os.environ.get("NGA_SCALE_CPUS", "8,32").split(","))
        if not 0 < lo < hi:  # fail fast, not after an hour of legs
            raise SystemExit(f"NGA_SCALE_CPUS must be 0<lo<hi, got {lo},{hi}")

        def run_pair(pinned: bool) -> dict:
            results = {}
            for n in (lo, hi):
                env = dict(os.environ, RAY_GRAFT_CPUS=str(n))
                cmd = [sys.executable, os.path.abspath(__file__),
                       "--scaling-worker"]
                import shutil as _sh
                if pinned and _sh.which("taskset"):
                    # pin the whole Ray worker tree to n PHYSICAL cores:
                    # ray.init(num_cpus=n) alone only limits logical
                    # scheduling — num_cpus=0 shard actors would
                    # otherwise use every core at both settings.
                    cmd = ["taskset", "-c", f"0-{n - 1}"] + cmd
                best = None
                for _ in range(outer):
                    # prior Ray sessions' teardown leaves the box noisy
                    # for ~30s; then wait (bounded) for a window without
                    # host-VM CPU steal — steal waves of 10-20% cut
                    # measured throughput up to 3x (see steal_pct in the
                    # per-run record)
                    time.sleep(int(os.environ.get("NGA_SCALE_COOLDOWN", "30")))
                    deadline = time.monotonic() + int(
                        os.environ.get("NGA_SCALE_WAIT_QUIET", "600"))
                    while time.monotonic() < deadline:
                        def jif():
                            with open("/proc/stat") as f:
                                v = [int(x) for x in f.readline().split()[1:]]
                            return sum(v), v[7] if len(v) > 7 else 0
                        a_tot, a_st = jif()
                        time.sleep(5)
                        b_tot, b_st = jif()
                        if 100.0 * (b_st - a_st) / max(1, b_tot - a_tot) < 2.0:
                            break
                    out = subprocess.run(cmd, env=env, capture_output=True,
                                         text=True, check=True)
                    r = json.loads(out.stdout.strip().splitlines()[-1])
                    if best is None or (r["edges_scattered_per_sec"]
                                        > best["edges_scattered_per_sec"]):
                        best = r
                    if best["steal_pct"] < 2.0:
                        break  # got a clean window — no need for more
                # steal-aware retries: a wave can cover BOTH outer runs
                # (observed: a 6.3%-steal 32-CPU leg measuring half the
                # clean-window number); retry until a <2%-steal run or
                # the retry budget runs out
                extra = 0
                while (best["steal_pct"] >= 2.0
                       and extra < int(os.environ.get("NGA_SCALE_RETRIES", "3"))):
                    extra += 1
                    time.sleep(60)
                    out = subprocess.run(cmd, env=env, capture_output=True,
                                         text=True, check=True)
                    r = json.loads(out.stdout.strip().splitlines()[-1])
                    if (r["edges_scattered_per_sec"]
                            > best["edges_scattered_per_sec"]):
                        best = r
                results[n] = best
            return results

        results = run_pair(pinned=True)
        factor = hi / lo
        t_lo = results[lo]["edges_scattered_per_sec"]
        t_hi = results[hi]["edges_scattered_per_sec"]
        eff = (t_hi / t_lo) / factor if t_lo else 0.0
        rec = {"metric": f"scaling_efficiency_{lo}_to_{hi}",
               "value": round(eff, 3), "unit": "ratio",
               f"throughput_{lo}": t_lo, f"throughput_{hi}": t_hi,
               "runs": results}
        if os.environ.get("NGA_SCALE_CONTROL"):
            ctl = run_pair(pinned=False)
            c_lo = ctl[lo]["edges_scattered_per_sec"]
            c_hi = ctl[hi]["edges_scattered_per_sec"]
            rec["control_unpinned"] = {
                f"throughput_{lo}": c_lo, f"throughput_{hi}": c_hi,
                # equal physical bandwidth at both settings → the
                # meaningful ratio is T_hi/T_lo (expected ≈ 1.0), not /factor
                "t_hi_over_t_lo": round(c_hi / c_lo if c_lo else 0.0, 3),
                "efficiency": round((c_hi / c_lo) / factor if c_lo else 0.0, 3),
                "runs": ctl}
        print(json.dumps(rec))
        return
    print(json.dumps(headline(NUM_CPUS)))


if __name__ == "__main__":
    main()
