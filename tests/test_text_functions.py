"""Text-analysis stage oracles (token count, quality, langid,
fingerprint) — semantics pinned against plain-python references."""

import hashlib

import ray.data as rd

from neo4j_graph_algorithms_ray.functions.text import (
    Fingerprint, LangId, QualityScore, TokenCount)

DOCS = [
    {"doc_id": 0, "text": "The cat and the dog, in a house."},
    {"doc_id": 1, "text": "der hund und die katze ist nicht hier"},
    {"doc_id": 2, "text": "zzz qqq xxx"},
    {"doc_id": 3, "text": ""},
    {"doc_id": 4, "text": "  spaced   out\ttabs  "},
]


def _ds():
    return rd.from_items(DOCS)


def test_token_count():
    out = {r["doc_id"]: r["n_tokens"]
           for r in _ds().map_batches(TokenCount, batch_format="pandas", concurrency=1).take_all()}
    assert out == {0: 8, 1: 8, 2: 3, 3: 0, 4: 3}


def test_quality_score():
    rows = {r["doc_id"]: r for r in
            _ds().map_batches(QualityScore, batch_format="pandas", concurrency=1).take_all()}
    assert rows[3]["n_tokens"] == 0 and rows[3]["stopword_ratio"] == 0.0
    r0 = rows[0]
    assert r0["n_chars"] == len(DOCS[0]["text"])
    # tokens: The cat and the dog, in a house. → stopwords (en, lowered):
    # the, and, the, in, a → 5/8
    assert r0["stopword_ratio"] == round(5 / 8, 6)
    assert r0["punct_ratio"] == round(2 / r0["n_chars"], 6)


def test_langid():
    out = {r["doc_id"]: r["pred_lang"]
           for r in _ds().map_batches(LangId, batch_format="pandas", concurrency=1).take_all()}
    assert out[0] == "en"
    assert out[1] == "de"
    assert out[2] == "und"
    assert out[3] == "und"


def test_fingerprint_normalization():
    out = {r["doc_id"]: r["fingerprint"]
           for r in _ds().map_batches(Fingerprint, batch_format="pandas", concurrency=1).take_all()}
    expect4 = hashlib.md5(b"spaced out tabs").hexdigest()
    assert out[4] == expect4
    assert out[3] == hashlib.md5(b"").hexdigest()
