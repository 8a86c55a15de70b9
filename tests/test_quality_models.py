"""CompressionRatio golden values and a numpy replay pin for the
distributed logistic-regression trainer."""

import zlib

import numpy as np
import pyarrow as pa
import ray.data as rd

from neo4j_graph_algorithms_ray.functions.text import (CompressionRatio,
                                                       logreg_quality)


def test_compression_ratio_golden():
    docs = rd.from_items([
        {"doc_id": 0, "text": "a" * 1000},          # highly compressible
        {"doc_id": 1, "text": "The quick brown fox jumps over the lazy dog."},
        {"doc_id": 2, "text": ""},
    ])
    rows = {r["doc_id"]: r for r in
            docs.map_batches(CompressionRatio(),
                             batch_format="pyarrow").take_all()}
    assert rows[0]["n_bytes"] == 1000
    assert rows[0]["n_compressed"] == len(zlib.compress(b"a" * 1000, 6))
    assert rows[0]["ratio"] < 0.05
    assert rows[1]["ratio"] > 0.8  # short natural text barely compresses
    assert rows[2]["n_bytes"] == 0 and rows[2]["ratio"] == 0.0


def _replay_logreg(texts, langs, iterations=20, lr=0.5):
    """Independent numpy replay of the documented recipe."""
    import re
    ch = np.array([len(t) for t in texts], float)
    w = np.array([len(re.findall(r"\S+", t)) for t in texts], float)
    s = np.array([len(re.findall(r"[.!?]+", t)) for t in texts], float)
    v = np.array([len(re.findall(r"[aeiouyAEIOUY]+", t)) for t in texts],
                 float)
    x = np.column_stack([np.ones_like(ch), ch / 1e3, w / 1e2, s / 1e1,
                         v / np.maximum(w, 1.0)])
    y = np.array([l == "en" for l in langs], float)
    wv = np.zeros(5)
    for _ in range(iterations):
        p = 1.0 / (1.0 + np.exp(-(x @ wv)))
        wv = wv - lr * (x.T @ (p - y)) / len(y)
    p = 1.0 / (1.0 + np.exp(-(x @ wv)))
    acc = float(np.mean((p > 0.5) == (y > 0.5)))
    return wv, acc


def test_logreg_quality_numpy_replay():
    rng = np.random.default_rng(3)
    texts, langs = [], []
    for i in range(120):
        en = i % 2 == 0
        n = int(rng.integers(5, 30))
        toks = ["the cat sat on a mat." if en else "der Hund lief schnell!"
                ] * n
        texts.append(" ".join(toks))
        langs.append("en" if en else "de")
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts), "lang": pa.array(langs)}))
    res = logreg_quality(docs).to_pylist()
    got = {r["name"]: r["value"] for r in res}
    wv, acc = _replay_logreg(texts, langs)
    names = ["w_bias", "w_chars", "w_words", "w_sentences", "w_vowel_rate"]
    for n, v in zip(names, wv):
        assert abs(got[n] - v) < 1e-5, (n, got[n], v)
    assert abs(got["train_accuracy"] - acc) < 1e-6  # module round6s
    assert got["train_accuracy"] >= 0.9  # separable fixture trains
