"""lexical_diversity / sentence_stats / slice_kl — semantics pinned
against hand-computed references on tiny corpora."""

import math

import pytest
import ray.data as rd

from neo4j_graph_algorithms_ray.functions.text import (
    lexical_diversity, sentence_stats, slice_kl)

DOCS = [
    {"doc_id": 0, "lang": "en", "text": "the cat the cat sat"},
    {"doc_id": 1, "lang": "en", "text": "dog dog dog"},
    {"doc_id": 2, "lang": "de", "text": "the hund"},
    {"doc_id": 3, "lang": "en", "text": ""},
]


def _ds():
    return rd.from_items(DOCS)


def test_lexical_diversity():
    rows = {r["doc_id"]: r for r in lexical_diversity(_ds()).take_all()}
    # doc 0: 5 tokens {the:2, cat:2, sat:1} -> 3 distinct, 1 hapax
    assert rows[0]["n_tokens"] == 5
    assert rows[0]["ttr"] == pytest.approx(3 / 5)
    assert rows[0]["hapax_ratio"] == pytest.approx(1 / 5)
    # doc 1: one type repeated -> ttr 1/3, no hapax
    assert rows[1]["ttr"] == pytest.approx(1 / 3)
    assert rows[1]["hapax_ratio"] == 0.0
    # empty doc -> zeros
    assert rows[3]["n_tokens"] == 0 and rows[3]["ttr"] == 0.0


def test_sentence_stats():
    docs = rd.from_items([
        {"doc_id": 0, "text": "One two. Three!  Four? "},
        {"doc_id": 1, "text": "no terminator here"},
        {"doc_id": 2, "text": "..."},
        {"doc_id": 3, "text": ""},
    ])
    rows = {r["doc_id"]: r for r in sentence_stats(docs).take_all()}
    # "One two" (7) / "Three" (5) / "Four" (4)
    assert rows[0]["n_sentences"] == 3
    assert rows[0]["mean_sentence_chars"] == pytest.approx((7 + 5 + 4) / 3)
    assert rows[1]["n_sentences"] == 1
    assert rows[2]["n_sentences"] == 0
    assert rows[2]["mean_sentence_chars"] == 0.0
    assert rows[3]["n_sentences"] == 0


def test_slice_kl():
    rows = {r["lang"]: r for r in slice_kl(_ds()).take_all()}
    # corpus: the:3 cat:2 sat:1 dog:3 hund:1 (N=10)
    # en slice (8): the:2 cat:2 sat:1 dog:3
    def term(n, nl, nt, big_n):
        p, q = n / nl, nt / big_n
        return p * math.log(p / q)
    kl_en = (term(2, 8, 3, 10) + term(2, 8, 2, 10)
             + term(1, 8, 1, 10) + term(3, 8, 3, 10))
    kl_de = term(1, 2, 3, 10) + term(1, 2, 1, 10)
    assert rows["en"]["n_tokens"] == 8
    assert rows["en"]["kl_div"] == pytest.approx(kl_en, abs=2e-6)
    assert rows["de"]["n_tokens"] == 2
    assert rows["de"]["kl_div"] == pytest.approx(kl_de, abs=2e-6)


def test_dup_ngram_frac():
    from neo4j_graph_algorithms_ray.functions.text import dup_ngram_frac
    docs = rd.from_items([
        # docs 0 and 1 share the window "a b c" exactly once each
        {"doc_id": 0, "text": "a b c x y"},
        {"doc_id": 1, "text": "q a b c r"},
        {"doc_id": 2, "text": "unrelated words entirely here now"},
        {"doc_id": 3, "text": "short"},
    ])
    rows = {r["doc_id"]: r for r in
            dup_ngram_frac(docs, k=3, min_docs=2).take_all()}
    # doc 0 windows: "a b c","b c x","c x y" -> 3 distinct, 1 dup
    assert rows[0]["n_grams_distinct"] == 3
    assert rows[0]["dup_gram_frac"] == pytest.approx(1 / 3)
    assert rows[1]["dup_gram_frac"] == pytest.approx(1 / 3)
    assert rows[2]["dup_gram_frac"] == 0.0
    # too short for a 3-gram
    assert rows[3]["n_grams_distinct"] == 0 and rows[3]["dup_gram_frac"] == 0.0


def test_dup_ngram_frac_within_doc_repeat_not_dup():
    from neo4j_graph_algorithms_ray.functions.text import dup_ngram_frac
    # the same window repeated WITHIN one doc is not a cross-doc dup
    docs = rd.from_items([
        {"doc_id": 0, "text": "a b c a b c"},
        {"doc_id": 1, "text": "totally different text here"},
    ])
    rows = {r["doc_id"]: r for r in
            dup_ngram_frac(docs, k=3, min_docs=2).take_all()}
    assert rows[0]["dup_gram_frac"] == 0.0


def test_winnow_fingerprints_guarantee():
    from neo4j_graph_algorithms_ray.functions.text import winnow_fingerprints
    # two docs sharing a long substring must share >= 1 fingerprint
    shared = "the quick brown fox jumps over the lazy dog"
    docs = rd.from_items([
        {"doc_id": 0, "text": "AAA " + shared + " BBB"},
        {"doc_id": 1, "text": "xyz123 " + shared + " qqq"},
        {"doc_id": 2, "text": "completely different content 98765"},
    ])
    rows = winnow_fingerprints(docs, k=8, w=4).take_all()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[0] & by_doc[1], "shared substring must share a fingerprint"
    assert not (by_doc[0] & by_doc[1] & by_doc[2])


def test_winnow_fingerprints_reference():
    from neo4j_graph_algorithms_ray.functions.text import winnow_fingerprints
    text = "abcdefghijkl"
    k, w = 8, 4
    rows = winnow_fingerprints(
        rd.from_items([{"doc_id": 0, "text": text}]), k=k, w=w).take_all()
    # plain-python winnowing reference
    grams = [sum(ord(text[i + j]) * 256 ** j for j in range(k))
             for i in range(len(text) - k + 1)]
    expect = set()
    for s in range(len(grams) - w + 1):
        win = grams[s:s + w]
        mn = min(win)
        pos = s + max(i for i, v in enumerate(win) if v == mn)
        expect.add((pos, mn))
    assert {(r["pos"], r["fp"]) for r in rows} == expect


def test_filter_report_all_branches():
    from neo4j_graph_algorithms_ray.functions.text import filter_report
    docs = rd.from_items([
        {"doc_id": 0, "text": "short"},                            # too_short
        {"doc_id": 1, "text": "der hund und die katze ist nicht hier gut"},
        {"doc_id": 2, "text": "the " + " ".join(f"w{i}x" for i in range(39))},
        {"doc_id": 3, "text": ("the cat sat " * 10).strip()},      # repetitive
        {"doc_id": 4, "text": "the quick brown fox jumps over the lazy "
                              "dog and then the cat sat on a warm mat"},
    ])
    rows = {r["doc_id"]: r for r in filter_report(docs).take_all()}
    assert rows[0]["reason"] == "too_short" and rows[0]["keep"] == 0
    assert rows[1]["reason"] == "non_english"
    assert rows[2]["reason"] == "low_stopword"
    assert rows[3]["reason"] == "repetitive"
    assert rows[4]["reason"] == "keep" and rows[4]["keep"] == 1
