"""URL canonicalization kernel (vectorized; no Ray needed for the
array-level checks, one Dataset round-trip for the stage)."""

import pyarrow as pa

from neo4j_graph_algorithms_ray.functions.urls import normalize_urls

CASES = [
    ("HTTP://Example.COM/Path/Sub/", "http://example.com/Path/Sub"),
    ("https://a.test:443/x?utm_source=tw&q=1#frag", "https://a.test/x?q=1"),
    ("http://a.test:80/", "http://a.test/"),
    ("http://a.test/x?fbclid=abc", "http://a.test/x"),
    ("http://a.test/x?q=1&gclid=z&r=2", "http://a.test/x?q=1&r=2"),
    ("http://a.test/x?utm_campaign=c&utm_medium=m", "http://a.test/x"),
    ("http://a.test", "http://a.test"),
    ("not a url at all", "not a url at all"),
]


def test_normalize_urls_cases():
    got = normalize_urls(pa.array([c[0] for c in CASES])).to_pylist()
    assert got == [c[1] for c in CASES]


def test_normalize_url_column_stage():
    import ray.data as rd

    from neo4j_graph_algorithms_ray.functions.urls import normalize_url_column
    ds = rd.from_items([{"url": c[0], "i": i} for i, c in enumerate(CASES)])
    rows = sorted(normalize_url_column(ds).take_all(), key=lambda r: r["i"])
    assert [r["url"] for r in rows] == [c[1] for c in CASES]


def test_normalize_urls_idempotent():
    once = normalize_urls(pa.array([c[0] for c in CASES]))
    twice = normalize_urls(once)
    assert once.to_pylist() == twice.to_pylist()


def test_canonical_latest_brute_force():
    import ray.data as rd

    from neo4j_graph_algorithms_ray.functions.urls import canonical_latest

    caps = [  # (messy url, ts) — three canonical groups
        ("http://a.test/p?utm_source=x", 10),
        ("http://a.test/p/", 30),
        ("HTTP://A.test/p", 20),
        ("http://b.test/q", 5),
        ("http://c.test/r?ref=z", 7),
        ("http://c.test/r", 7),  # ts tie → min url string wins
    ]
    ds = rd.from_items([{"url": u, "ts_us": t} for u, t in caps])
    rows = {r["url_canon"]: r for r in canonical_latest(ds).take_all()}
    assert rows["http://a.test/p"]["n_captures"] == 3
    assert rows["http://a.test/p"]["kept_url"] == "http://a.test/p/"
    assert rows["http://a.test/p"]["kept_ts_us"] == 30
    assert rows["http://b.test/q"]["n_captures"] == 1
    assert rows["http://c.test/r"]["kept_url"] == "http://c.test/r"
    assert rows["http://c.test/r"]["kept_ts_us"] == 7
