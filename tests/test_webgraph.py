"""Web-pages pipeline tests (the north-star end-to-end slice):
pages parquet → actor-pool extraction → link graph → PageRank.

Covers the input-hint contract (schema of the pages table), the
per-row invariant "byte-identical extracted text per url", link
extraction vs the generator's arithmetic link rule, and PageRank over
the extracted graph vs an independent numpy power iteration."""

import numpy as np
import pyarrow as pa
import pytest

from neo4j_graph_algorithms_ray.sources import pages as P

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pages_ds():
    return P.read_pages(SF)


def test_pages_schema(pages_ds):
    sch = dict(zip(pages_ds.schema().names, pages_ds.schema().types))
    assert sch["url"] == pa.string()
    assert sch["warc_ts"] == pa.timestamp("us")
    assert sch["html"] in (pa.binary(), pa.large_binary())
    assert sch["text"] == pa.string()
    assert sch["lang"] == pa.string()
    assert pages_ds.count() == 500


def test_extracted_text_byte_identical(pages_ds):
    """ExtractText(html) must equal the pages table's text column
    byte-for-byte for every url (north-rule per-row invariant)."""
    from neo4j_graph_algorithms_ray.stages.extract import ExtractText
    out = pages_ds.map_batches(ExtractText, batch_format="pyarrow",
                               concurrency=2).take_all()
    stored = {r["url"]: r["text"] for r in pages_ds.take_all()}
    assert len(out) == len(stored)
    for r in out:
        assert r["text"].encode() == stored[r["url"]].encode(), r["url"]


def test_extracted_links_match_rule(pages_ds):
    from neo4j_graph_algorithms_ray.pipelines.webgraph import web_edge_ds
    got = {(r["src_url"], r["dst_url"]) for r in web_edge_ds(SF).take_all()}
    n = pages_ds.count()
    want = set()
    for d in range(n):
        for t in P.link_targets(d, n):
            want.add((P.url_of(d), P.url_of(int(t))))
    assert got == want


def test_web_pagerank_vs_numpy():
    from neo4j_graph_algorithms_ray.algorithms import pagerank
    from neo4j_graph_algorithms_ray.pipelines.webgraph import get_web_graph
    g = get_web_graph(SF)
    res = pagerank(g, 0.85, max_iterations=500, tolerance=1e-9, node_col="url")
    assert res.converged

    n = 500
    edges = [(d, int(t)) for d in range(n) for t in P.link_targets(d, n)]
    outdeg = np.zeros(n)
    for s, _ in edges:
        outdeg[s] += 1
    r = np.full(n, 0.15)
    for _ in range(300):
        nxt = np.full(n, 0.15)
        for s, t in edges:
            nxt[t] += 0.85 * r[s] / outdeg[s]
        if np.abs(nxt - r).max() < 1e-12:
            r = nxt
            break
        r = nxt
    scores = {row["url"]: row["score"] for row in res.dataset.take_all()}
    for d in range(n):
        assert scores[P.url_of(d)] == pytest.approx(r[d], abs=1e-6)


def test_hub_skew_present(pages_ds):
    """The generator must produce the hub-skewed out-degree profile the
    north rule's skew handling is exercised against."""
    degs = np.array([len(P.link_targets(d, 500)) for d in range(500)])
    assert degs.max() >= 39 and np.median(degs) <= 5


def test_extract_links_ignores_quotes_in_prefix_text():
    """Regression: page text containing a double quote BEFORE the first
    '<a href=\"' must not produce a spurious edge (ADVICE r1)."""
    from neo4j_graph_algorithms_ray.stages.extract import ExtractLinks
    html = [
        b'He said "hello" and left. <a href="http://x.test/a">A</a>',
        b'no links but a "quoted" word here',
        b'<a href="http://x.test/b">B</a> then "quotes" after',
    ]
    batch = pa.table({"url": ["u1", "u2", "u3"],
                      "html": pa.array(html, pa.binary())})
    out = ExtractLinks()(batch)
    got = set(zip(out.column("src_url").to_pylist(),
                  out.column("dst_url").to_pylist()))
    assert got == {("u1", "http://x.test/a"), ("u3", "http://x.test/b")}


def test_host_graph_coarsening():
    """host_edge_ds must equal the page edge table aggregated by the
    url→host rule, and the host graph must drop self-host edges."""
    from collections import Counter
    import re

    from neo4j_graph_algorithms_ray.pipelines.webgraph import (
        get_host_graph, host_edge_ds, web_edge_ds)

    host = lambda u: re.match(r"^[a-z]+://([^/]+)", u).group(1)
    pages = web_edge_ds(SF).take_all()
    want = Counter((host(r["src_url"]), host(r["dst_url"])) for r in pages)

    got = {(r["src_host"], r["dst_host"]): r["n_links"]
           for r in host_edge_ds(SF).take_all()}
    assert got == dict(want)

    g = get_host_graph(SF)
    n_cross = sum(v for (s, d), v in want.items() if s != d)
    assert g.num_edges == len({k for k in want if k[0] != k[1]})
    assert g.num_vertices <= 20 and n_cross > 0


def test_extract_anchors_text_and_duplicates():
    from neo4j_graph_algorithms_ray.stages.extract import ExtractAnchors
    html = [
        b'intro "quoted" <a href="http://x.test/a">Alpha</a> mid '
        b'<a href="http://x.test/a">Alpha</a> <a href="http://x.test/b">B two</a>',
        b'no links at all',
    ]
    batch = pa.table({"url": ["u1", "u2"],
                      "html": pa.array(html, pa.binary())})
    out = ExtractAnchors()(batch)
    rows = list(zip(out["src_url"].to_pylist(), out["dst_url"].to_pylist(),
                    out["anchor"].to_pylist()))
    assert rows == [("u1", "http://x.test/a", "Alpha"),
                    ("u1", "http://x.test/a", "Alpha"),
                    ("u1", "http://x.test/b", "B two")]


def test_extract_meta_title_h1_links():
    from neo4j_graph_algorithms_ray.stages.extract import ExtractMeta
    html = [
        b'<html><head><title>First T</title></head><body><h1>Head A</h1>'
        b'<a href="http://x.test/a">a</a><a href="http://x.test/b">b</a>'
        b'</body></html>',
        # no title/h1, no links -> empty strings, 0
        b'<html><body><p>plain</p></body></html>',
        # two titles -> leftmost match wins (RE2 / regexp_extract parity)
        b'<title>One</title><title>Two</title><h1>H</h1>',
    ]
    batch = pa.table({"url": ["u1", "u2", "u3"],
                      "html": pa.array(html, pa.binary())})
    out = ExtractMeta()(batch)
    assert out["title"].to_pylist() == ["First T", "", "One"]
    assert out["h1"].to_pylist() == ["Head A", "", "H"]
    assert out["n_links"].to_pylist() == [2, 0, 0]
