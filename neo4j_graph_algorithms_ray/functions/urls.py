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
