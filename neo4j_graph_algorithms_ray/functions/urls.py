"""URL hygiene for web-corpus pipelines: vectorized canonicalization.

All kernels are pyarrow.compute RE2 passes over the whole column — no
per-row Python — so they run as plain map_batches stages at any scale.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# query params that never change page identity (trackers)
TRACKING_PARAMS = ("utm_[a-z]+", "fbclid", "gclid", "msclkid", "ref")


def normalize_urls(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Canonicalize a url column:
    scheme+host lowercased · fragment stripped · default ports removed
    (http:80 / https:443) · tracking params dropped (utm_*, fbclid,
    gclid, msclkid, ref) · dangling '?'/'&' cleaned · trailing slash
    trimmed from non-root paths."""
    u = arr.cast(pa.string())
    if isinstance(u, pa.ChunkedArray):
        u = u.combine_chunks()
    # 1. lowercase scheme://host (leave path/query case alone)
    head_pat = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
    m = pc.extract_regex(u, f"(?P<head>{head_pat})")
    head = pc.struct_field(m, "head")
    head_lc = pc.utf8_lower(pc.fill_null(head, ""))
    headed = pc.is_valid(head)
    rest = pc.replace_substring_regex(u, pattern=head_pat, replacement="",
                                      max_replacements=1)
    u = pc.if_else(headed, pc.binary_join_element_wise(head_lc, rest, ""), u)
    # 2. strip fragment
    u = pc.replace_substring_regex(u, pattern=r"#.*$", replacement="")
    # 3. default ports
    # RE2 has no lookahead: capture the boundary char (or end) instead
    u = pc.replace_substring_regex(u, pattern=r"^(http://[^/?#:]*):80([/?#]|$)",
                                   replacement=r"\1\2")
    u = pc.replace_substring_regex(u, pattern=r"^(https://[^/?#:]*):443([/?#]|$)",
                                   replacement=r"\1\2")
    # 4. tracking params: a tracker followed by another param keeps its
    # leading separator (two passes cover adjacent trackers — RE2 scans
    # the original string, so runs share consumed boundary chars); a
    # tracker in final position drops separator and all
    alt = "|".join(TRACKING_PARAMS)
    for _ in range(2):
        u = pc.replace_substring_regex(
            u, pattern=rf"([?&])(?:{alt})=[^&#]*&", replacement=r"\1")
    u = pc.replace_substring_regex(
        u, pattern=rf"[?&](?:{alt})=[^&#]*$", replacement="")
    # 5. trailing slash on non-root path
    u = pc.replace_substring_regex(u, pattern=r"(://[^/?#]+/.+?)/$",
                                   replacement=r"\1")
    return u


def normalize_url_column(ds, col: str = "url", out_col: str | None = None):
    """Dataset stage: add/replace the normalized url column."""
    out = out_col or col

    def f(b: pa.Table) -> pa.Table:
        norm = normalize_urls(b[col])
        if out in b.column_names:
            return b.set_column(b.column_names.index(out), out, norm)
        return b.append_column(out, norm)

    return ds.map_batches(f, batch_format="pyarrow")


def canonical_latest(ds, *, url_col: str = "url", ts_col: str = "ts_us"):
    """Crawl-snapshot compaction keyed by CANONICAL url: collapse a
    capture log (messy url, capture timestamp) to one row per
    canonical page — how many captures were seen, which capture wins
    (latest timestamp; ties broken by min url string, deterministic),
    and when. The scale shape is three map-side-combined aggregations
    over the canonical key (max ts, count, min winning url) plus one
    hash join back onto the capture log — no per-group Python, no
    driver materialization; skew is bounded by captures-per-page.

    Returns (url_canon, n_captures, kept_url, kept_ts_us)."""
    import numpy as np

    from neo4j_graph_algorithms_ray.util import (join_partitions,
                                                 preagg_max, preagg_min,
                                                 preagg_sum, safe_join)

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "url_canon": normalize_urls(b[url_col]),
            "__u": b[url_col].cast(pa.string()),
            "__ts": b[ts_col].cast(pa.int64()),
            "__one": pa.array(np.ones(b.num_rows, np.int64))})

    rec = ds.map_batches(prep, batch_format="pyarrow").materialize()
    nparts = join_partitions(8)
    mx = preagg_max(rec.select_columns(["url_canon", "__ts"]),
                    ["url_canon"], "__ts") \
        .rename_columns({"__ts": "kept_ts_us"})
    cnt = preagg_sum(rec.select_columns(["url_canon", "__one"]),
                     ["url_canon"], "__one") \
        .rename_columns({"__one": "n_captures"})
    at = safe_join(rec.select_columns(["url_canon", "__u", "__ts"]),
                   mx, "inner", nparts, on=("url_canon",)) \
        .filter(expr="__ts == kept_ts_us") \
        .select_columns(["url_canon", "__u"])
    kept = preagg_min(at, ["url_canon"], "__u") \
        .rename_columns({"__u": "kept_url"})
    out = safe_join(cnt, mx, "inner", nparts, on=("url_canon",))
    return safe_join(out, kept, "inner", nparts, on=("url_canon",))


def url_templates(ds, *, url_col: str = "url"):
    """URL pattern mining: collapse digit runs in the PATH (host left
    intact) to '{n}' and count urls per template — the standard
    crawl-side structure report (which url shapes dominate a site,
    which to canonicalize or skip). Vectorized RE2 + one
    map-side-combined count; returns (template, n_urls)."""
    import numpy as np

    from neo4j_graph_algorithms_ray.util import preagg_sum

    head_pat = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"

    def to_template(b: pa.Table) -> pa.Table:
        u = b[url_col].cast(pa.string())
        if isinstance(u, pa.ChunkedArray):
            u = u.combine_chunks()
        m = pc.extract_regex(u, f"(?P<head>{head_pat})")
        head = pc.fill_null(pc.struct_field(m, "head"), "")
        rest = pc.replace_substring_regex(u, pattern=head_pat,
                                          replacement="",
                                          max_replacements=1)
        rest = pc.replace_substring_regex(rest, pattern=r"[0-9]+",
                                          replacement="{n}")
        return pa.table({
            "template": pc.binary_join_element_wise(head, rest, ""),
            "n_urls": pa.array(np.ones(b.num_rows, np.int64))})

    return preagg_sum(ds.map_batches(to_template, batch_format="pyarrow"),
                      ["template"], "n_urls")
