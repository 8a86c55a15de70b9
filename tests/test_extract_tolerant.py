"""Tolerant-mode ExtractLinks: messy real-crawl HTML fixtures with
exact expected edge sets (VERDICT r04 item 4). Strict mode keeps the
byte-parity contract with sources/pages.py; tolerant mode must handle
the quoting/case/whitespace variants a Common-Crawl WARC actually
contains, deterministically."""

import pyarrow as pa
import pytest

from neo4j_graph_algorithms_ray.stages.extract import ExtractLinks


def run(pages, **kw):
    batch = pa.table({"url": [u for u, _ in pages],
                      "html": [h.encode() for _, h in pages]})
    out = ExtractLinks(**kw)(batch)
    return list(zip(out["src_url"].to_pylist(), out["dst_url"].to_pylist()))


def test_quoting_and_case_variants():
    pages = [("http://a.com/p", '''
        <A HREF="http://b.com/1">double</A>
        <a href='http://b.com/2'>single</a>
        <a href=http://b.com/3>unquoted</a>
        <a href = "http://b.com/4">spaced eq</a>
        <a class="x" rel=nofollow href="http://b.com/5">late attr</a>
        <a\nhref="http://b.com/6">newline</a>
    ''')]
    assert run(pages, tolerant=True) == [
        ("http://a.com/p", f"http://b.com/{i}") for i in range(1, 7)]


def test_relative_resolution_against_page_url():
    pages = [("http://a.com/dir/page.html", '''
        <a href="sub/x.html">rel</a>
        <a href="/root.html">root</a>
        <a href="//c.com/pp">proto-rel</a>
        <a href="https://d.com/abs">abs</a>
    ''')]
    assert run(pages, tolerant=True) == [
        ("http://a.com/dir/page.html", "http://a.com/dir/sub/x.html"),
        ("http://a.com/dir/page.html", "http://a.com/root.html"),
        ("http://a.com/dir/page.html", "http://c.com/pp"),
        ("http://a.com/dir/page.html", "https://d.com/abs"),
    ]


def test_base_href_wins_over_page_url():
    pages = [("http://a.com/deep/page", '''
        <base href="http://cdn.a.com/assets/">
        <a href="img.html">rel</a>
        <a href="/top.html">root</a>
    ''')]
    assert run(pages, tolerant=True) == [
        ("http://a.com/deep/page", "http://cdn.a.com/assets/img.html"),
        ("http://a.com/deep/page", "http://cdn.a.com/top.html"),
    ]


def test_schemeless_base_falls_back_to_page_url():
    pages = [("http://a.com/d/p", '<base href="/x/"><a href="q.html">r</a>')]
    # base without a scheme is itself relative: fall back to the page url
    assert run(pages, tolerant=True) == [
        ("http://a.com/d/p", "http://a.com/d/q.html")]


def test_fragments_stripped_and_empty_dropped():
    pages = [("http://a.com/", '''
        <a href="http://b.com/x#frag">f</a>
        <a href="#local">local-only</a>
        <a href="">empty</a>
        <a>no href</a>
    ''')]
    # #local resolves to base dir + "" after fragment strip -> non-empty
    assert run(pages, tolerant=True) == [
        ("http://a.com/", "http://b.com/x"),
        ("http://a.com/", "http://a.com/"),
    ]


def test_data_href_attribute_is_not_href():
    pages = [("http://a.com/", '<a data-href="http://no.com" href="http://yes.com">x</a>')]
    assert run(pages, tolerant=True) == [("http://a.com/", "http://yes.com")]


def test_page_with_host_only_base_dir():
    pages = [("http://a.com", '<a href="x.html">r</a>')]
    assert run(pages, tolerant=True) == [("http://a.com", "http://a.com/x.html")]


def test_no_resolution_mode_keeps_raw_hrefs():
    pages = [("http://a.com/d/", '<a href="x.html">r</a><a href=\'/y\'>s</a>')]
    assert run(pages, tolerant=True, resolve_base=False) == [
        ("http://a.com/d/", "x.html"), ("http://a.com/d/", "/y")]


def test_strict_mode_unchanged_on_canonical_html():
    html = '<p>t</p><a href="http://b.com/1">x</a><a href="http://b.com/2">y</a>'
    pages = [("http://a.com/", html)]
    strict = run(pages)
    tol = run(pages, tolerant=True)
    assert strict == tol == [("http://a.com/", "http://b.com/1"),
                             ("http://a.com/", "http://b.com/2")]


def test_strict_mode_ignores_messy_variants():
    # the byte-parity contract: strict only sees the exact '<a href="' form
    pages = [("http://a.com/", "<a href='http://s.com'>s</a>"
                               '<A HREF="http://c.com">c</A>'
                               '<a href="http://ok.com">ok</a>')]
    assert run(pages) == [("http://a.com/", "http://ok.com")]


def test_multi_page_batch_attribution():
    pages = [("http://p1/", '<a href="http://x.com/1">a</a>'),
             ("http://p2/", 'no links here'),
             ("http://p3/", "<a href=http://x.com/3>b</a>")]
    assert run(pages, tolerant=True) == [
        ("http://p1/", "http://x.com/1"), ("http://p3/", "http://x.com/3")]


def test_determinism():
    pages = [("http://a.com/%d" % i,
              f'<a href="p{i}.html">x</a><a href=/q{i}>y</a>') for i in range(50)]
    assert run(pages, tolerant=True) == run(pages, tolerant=True)
