"""Synthetic Common-Crawl-style pages source (the north-rule input).

Input-hint schema: ``pages(url:string, warc_ts:timestamp[us],
html:binary, text:string, lang:string)``. Pages are derived
DETERMINISTICALLY from the driver's ``documents.parquet`` (doc_id is
contiguous ``0..N-1``) with pure-arithmetic link structure, so a DuckDB
oracle can reconstruct every page — url, links and the byte-identical
extracted text — from SQL alone (pipelines/oracles_web.py).

Page ``d`` of ``N``:
- url       = ``http://site-{d % 20}.test/page/{d}``
- out-links = for ``j`` in ``1..deg(d)``: target ``t = (d*31 + j*17 + 1) % N``,
  skipping self-links. ``deg(d) = 40 if d % 50 == 0 else 1 + d % 7`` —
  every 50th page is a hub, giving the skewed out-degree distribution
  the north rule's skew handling is exercised against. Targets are
  distinct per page because gcd(17, N) == 1 for the driver's N.
- html      = single-line template (tags only, attribute quotes only in
  hrefs):
  ``<html><head><title>Doc {d}</title></head><body><h1>Doc {d}</h1>
  <p>{text}</p><ul><li><a href="{target_url}">link {j}</a></li>…</ul>
  </body></html>``
- text      = the canonical extraction of that html (strip tags →
  collapse whitespace → trim; stages/extract.py applies the identical
  rule, which is what makes "byte-identical extracted text per url"
  verifiable byte-for-byte).
- warc_ts   = 2024-01-01T00:00:00Z + d seconds;  lang = document lang.

The reference's analogue of this module is the benchmark dataset
fetcher (benchmark/.../bench/LdbcDownloader.java:53-54); ours is
deterministic and offline (no external data).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import ray.data as rd

PAGES_CACHE_ROOT = os.environ.get("NGA_PAGES_ROOT", "/tmp/nga_ray/pages")
NUM_SITES = 20
HUB_EVERY = 50
HUB_DEGREE = 40
BASE_TS_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in epoch-us


def out_degree(d: np.ndarray) -> np.ndarray:
    return np.where(d % HUB_EVERY == 0, HUB_DEGREE, 1 + d % 7)


def link_targets(d: int, n: int) -> np.ndarray:
    """Distinct non-self link targets of page d (j ascending)."""
    deg = HUB_DEGREE if d % HUB_EVERY == 0 else 1 + d % 7
    t = (d * 31 + np.arange(1, deg + 1) * 17 + 1) % n
    return t[t != d]


def url_of(d: int) -> str:
    return f"http://site-{d % NUM_SITES}.test/page/{d}"


def _norm_ws(s: str) -> str:
    return " ".join(s.split())


def compose_page(d: int, text: str, n: int) -> tuple[str, str]:
    """(html, extracted_text) for page d. The text is computed by the
    same strip→collapse→trim rule the extraction stage applies, so the
    byte-identity invariant holds by construction and is re-verified by
    running the real extractor in tests."""
    esc = text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    deg = HUB_DEGREE if d % HUB_EVERY == 0 else 1 + d % 7
    lis, labels = [], []
    for j in range(1, deg + 1):
        t = (d * 31 + j * 17 + 1) % n
        if t == d:
            continue
        lis.append(f'<li><a href="{url_of(t)}">link {j}</a></li>')
        labels.append(f"link {j}")
    html = (f"<html><head><title>Doc {d}</title></head><body>"
            f"<h1>Doc {d}</h1><p>{esc}</p><ul>{''.join(lis)}</ul></body></html>")
    extracted = _norm_ws(f"Doc {d} Doc {d} {esc} {' '.join(labels)}")
    return html, extracted


def generate_pages(sf_dir: str, out_dir: str) -> str:
    """documents.parquet → pages parquet (Ray Data pipeline, streamed)."""
    from neo4j_graph_algorithms_ray.util import read_parquet_clean
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text", "lang"])
    n = docs.count()

    def compose(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        htmls, exts, urls = [], [], []
        for d, txt in zip(ids, texts):
            h, e = compose_page(int(d), txt, n)
            htmls.append(h.encode("utf-8"))
            exts.append(e)
            urls.append(url_of(int(d)))
        ts = pa.array(BASE_TS_US + ids.astype(np.int64) * 1_000_000,
                      type=pa.timestamp("us"))
        return pa.table({
            "url": pa.array(urls), "warc_ts": ts,
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(exts), "lang": batch.column("lang"),
        })

    docs.map_batches(compose, batch_format="pyarrow").write_parquet(out_dir)
    return out_dir


def synth_text(d: int) -> str:
    """Deterministic word salad for bench-scale synthetic pages."""
    return " ".join(f"w{(d * 7 + i * 13) % 997}" for i in range(30))


def generate_synthetic_pages(n: int, out_dir: str, *,
                             num_blocks: int = 64) -> str:
    """n synthetic pages with the same deterministic link rule —
    bench-scale extraction input with no external data."""
    ds = rd.range(n, override_num_blocks=num_blocks)

    def compose(batch) -> pa.Table:
        ids = batch["id"].astype(np.int64) if hasattr(batch["id"], "astype") \
            else np.asarray(batch["id"], dtype=np.int64)
        htmls, exts, urls = [], [], []
        for d in ids:
            h, e = compose_page(int(d), synth_text(int(d)), n)
            htmls.append(h.encode("utf-8"))
            exts.append(e)
            urls.append(url_of(int(d)))
        ts = pa.array(BASE_TS_US + ids * 1_000_000, type=pa.timestamp("us"))
        return pa.table({
            "url": pa.array(urls), "warc_ts": ts,
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(exts),
            "lang": pa.array(["en"] * len(ids)),
        })

    ds.map_batches(compose, batch_format="numpy").write_parquet(out_dir)
    return out_dir


def synthetic_pages_path(n: int) -> str:
    out_dir = os.path.join(PAGES_CACHE_ROOT, f"synth-{n}")
    marker = os.path.join(out_dir, "_SUCCESS")
    if not os.path.exists(marker):
        os.makedirs(out_dir, exist_ok=True)
        generate_synthetic_pages(n, out_dir)
        with open(marker, "w") as f:
            f.write("ok")
    return out_dir


def pages_path(sf_dir: str) -> str:
    """Cached pages parquet dir for an sf_dir (generated once)."""
    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    out_dir = os.path.join(PAGES_CACHE_ROOT, key)
    marker = os.path.join(out_dir, "_SUCCESS")
    if not os.path.exists(marker):
        os.makedirs(out_dir, exist_ok=True)
        generate_pages(sf_dir, out_dir)
        with open(marker, "w") as f:
            f.write("ok")
    return out_dir


def read_pages(sf_dir: str, columns=None) -> rd.Dataset:
    """The pages Dataset (input-hint schema), column-pruned at the read."""
    from neo4j_graph_algorithms_ray.util import read_parquet_clean
    return read_parquet_clean(pages_path(sf_dir), columns=columns,
                              file_extensions=["parquet"])
