"""HTML → text / link extraction stages (actor-pool map_batches).

The reference's graph source is a live Neo4j store scanned by importer
tasks (core/.../core/heavyweight/RelationshipImporter.java:45); our
native source is the Common-Crawl-style pages table, and these stages
are the importer analogue: callable classes with setup in ``__init__``
and zero-copy Arrow kernels per batch in ``__call__``. Because their
state is a few pattern strings, call sites pass an INSTANCE
(``ds.map_batches(ExtractLinks(), batch_format="pyarrow")``) so the
stage runs on warm task-pool workers — measured ~3.5× faster than an
actor pool at 100k pages (pool spin-up ~2s dominates). Heavy-state
stages (decoders, resident CSR) still use the actor-pool form
(``map_batches(Cls, concurrency=(1, N))``).

Both stages are fully vectorized: tag-stripping and whitespace
normalization run through ``pyarrow.compute.replace_substring_regex``
(RE2 over the whole column), href extraction through
``split_pattern`` + ``extract_regex`` over the flattened list values —
no per-row Python in the hot path.

Extraction rule (the byte-identity contract with sources/pages.py and
the SQL oracle): ``trim(collapse_ws(strip_tags(html)))`` where tags are
``<[^>]*>`` → one space and whitespace runs collapse to one space.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TAG_RE = r"<[^>]*>"
WS_RE = r"\s+"
HREF_OPEN = '<a href="'
URL_HEAD_RE = r'^(?P<u>[^"]*)"'


def _html_utf8(batch: pa.Table) -> pa.Array:
    return batch.column("html").cast(pa.string()).combine_chunks()


class ExtractText:
    """pages(url, html, …) → (url, text, lang, warc_ts) with text
    byte-identical to the canonical extraction of the html column."""

    def __init__(self):
        self.tag_re = TAG_RE
        self.ws_re = WS_RE

    def __call__(self, batch: pa.Table) -> pa.Table:
        html = _html_utf8(batch)
        txt = pc.replace_substring_regex(html, pattern=self.tag_re,
                                         replacement=" ")
        txt = pc.replace_substring_regex(txt, pattern=self.ws_re,
                                         replacement=" ")
        txt = pc.utf8_trim_whitespace(txt)
        cols = {"url": batch.column("url"), "text": txt}
        for extra in ("lang", "warc_ts"):
            if extra in batch.column_names:
                cols[extra] = batch.column(extra)
        return pa.table(cols)


class ExtractLinks:
    """pages(url, html) → href edge list (src_url, dst_url).

    Vectorized multi-match: split each html on ``<a href="`` (ListArray),
    then anchor-extract the quoted url head from every flattened list
    element. The first split element of each page is the text BEFORE the
    first ``<a href="`` — it is masked out explicitly (not just left to
    fail the regex) so page text containing a double quote can never
    produce a spurious edge (byte-parity contract with PAGE_LINKS_SQL).
    """

    def __init__(self):
        self.href_open = HREF_OPEN
        self.url_head = URL_HEAD_RE

    def __call__(self, batch: pa.Table) -> pa.Table:
        html = _html_utf8(batch)
        urls = batch.column("url").combine_chunks()
        parts = pc.split_pattern(html, self.href_open)
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        flat = parts.flatten()
        offsets = parts.offsets.to_numpy(zero_copy_only=False)
        counts = np.diff(offsets)
        src_flat = np.repeat(np.arange(len(urls)), counts)
        match = pc.extract_regex(flat, self.url_head)
        valid = pc.is_valid(match).to_numpy(zero_copy_only=False)
        # mask each page's first element: text before the first href is
        # not a link even if it happens to contain a double quote
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
        is_first = np.zeros(len(flat), dtype=bool)
        is_first[starts[counts > 0]] = True
        keep = valid & ~is_first
        idx = pa.array(np.nonzero(keep)[0])
        dsts = pc.struct_field(match.take(idx), "u")
        srcs = urls.take(pa.array(src_flat[keep]))
        return pa.table({"src_url": srcs, "dst_url": dsts})


TITLE_RE = r"<title>(?P<t>[^<]*)</title>"
H1_RE = r"<h1>(?P<h>[^<]*)</h1>"


class ExtractMeta:
    """pages(url, html) → (url, title, h1, n_links): per-page metadata
    — the <title> and first <h1> text plus the raw href count. Title
    extraction is the classic page-descriptor stage (title-based dedup,
    SERP snippets, quality rules); n_links is the out-degree before any
    normalization. First-match semantics for title/h1 (RE2 leftmost),
    matching DuckDB ``regexp_extract``; pages without the tag get ''.
    Fully vectorized: two ``extract_regex`` + one
    ``count_substring`` over the whole column, no per-row Python."""

    def __init__(self):
        self.title_re = TITLE_RE
        self.h1_re = H1_RE
        self.href_open = HREF_OPEN

    def __call__(self, batch: pa.Table) -> pa.Table:
        html = _html_utf8(batch)
        tm = pc.extract_regex(html, self.title_re)
        hm = pc.extract_regex(html, self.h1_re)
        title = pc.fill_null(pc.struct_field(tm, "t"), "")
        h1 = pc.fill_null(pc.struct_field(hm, "h"), "")
        n_links = pc.count_substring(html, self.href_open).cast(pa.int64())
        return pa.table({"url": batch.column("url"), "title": title,
                         "h1": h1, "n_links": n_links})


ANCHOR_HEAD_RE = r'^(?P<u>[^"]*)">(?P<a>[^<]*)'


class ExtractAnchors:
    """pages(url, html) → (src_url, dst_url, anchor): every href
    occurrence with its anchor text (the chars between the href's
    closing ``">`` and the next tag). Anchor text is how the web
    describes the *target* page — the classic ranking / target-description signal — and
    unlike ExtractLinks duplicates are kept (each occurrence counts).

    Same vectorized multi-match shape as ExtractLinks: one
    ``split_pattern`` + one ``extract_regex`` over the flattened
    elements, first-element mask, no per-row Python."""

    def __init__(self):
        self.href_open = HREF_OPEN
        self.head = ANCHOR_HEAD_RE

    def __call__(self, batch: pa.Table) -> pa.Table:
        html = _html_utf8(batch)
        urls = batch.column("url").combine_chunks()
        parts = pc.split_pattern(html, self.href_open)
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        flat = parts.flatten()
        counts = np.diff(parts.offsets.to_numpy(zero_copy_only=False))
        src_flat = np.repeat(np.arange(len(urls)), counts)
        match = pc.extract_regex(flat, self.head)
        valid = pc.is_valid(match).to_numpy(zero_copy_only=False)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
        is_first = np.zeros(len(flat), dtype=bool)
        is_first[starts[counts > 0]] = True
        keep = valid & ~is_first
        idx = pa.array(np.nonzero(keep)[0])
        m = match.take(idx)
        return pa.table({"src_url": urls.take(pa.array(src_flat[keep])),
                         "dst_url": pc.struct_field(m, "u"),
                         "anchor": pc.struct_field(m, "a")})
