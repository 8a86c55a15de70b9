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
    rows = _ds().map_batches(TokenCount, batch_format="pyarrow",
                             concurrency=1).take_all()
    out = {r["doc_id"]: r["n_tokens"] for r in rows}
    assert out == {0: 8, 1: 8, 2: 3, 3: 0, 4: 3}
    bpe = {r["doc_id"]: r["n_bpe_pieces"] for r in rows}
    # doc 0 "The cat and the dog, in a house.": 8 letter runs + ',' + '.'
    assert bpe[0] == 10
    assert bpe[3] == 0
    assert bpe[4] == 3  # spaced / out / tabs


def test_quality_score():
    rows = {r["doc_id"]: r for r in
            _ds().map_batches(QualityScore, batch_format="pyarrow", concurrency=1).take_all()}
    assert rows[3]["n_tokens"] == 0 and rows[3]["stopword_ratio"] == 0.0
    r0 = rows[0]
    assert r0["n_chars"] == len(DOCS[0]["text"])
    # tokens: The cat and the dog, in a house. → stopwords (en, lowered):
    # the, and, the, in, a → 5/8
    assert r0["stopword_ratio"] == round(5 / 8, 6)
    assert r0["punct_ratio"] == round(2 / r0["n_chars"], 6)


def test_langid():
    out = {r["doc_id"]: r["pred_lang"]
           for r in _ds().map_batches(LangId, batch_format="pyarrow", concurrency=1).take_all()}
    assert out[0] == "en"
    assert out[1] == "de"
    assert out[2] == "und"
    assert out[3] == "und"


def test_fingerprint_normalization():
    out = {r["doc_id"]: r["fingerprint"]
           for r in _ds().map_batches(Fingerprint, batch_format="pyarrow", concurrency=1).take_all()}
    expect4 = hashlib.md5(b"spaced out tabs").hexdigest()
    assert out[4] == expect4
    assert out[3] == hashlib.md5(b"").hexdigest()


def test_vocab_topk_brute_force():
    from collections import Counter

    from neo4j_graph_algorithms_ray.functions.text import vocab_topk
    occ, df = Counter(), Counter()
    for d in DOCS:
        toks = d["text"].lower().split()
        occ.update(toks)
        df.update(set(toks))
    want = sorted(occ, key=lambda t: (-occ[t], t))[:5]
    rows = vocab_topk(_ds(), topk=5).take_all()
    assert [r["token"] for r in rows] == want
    for r in rows:
        assert r["n_occ"] == occ[r["token"]] and r["n_docs"] == df[r["token"]]


def test_vocab_coverage_brute_force():
    from collections import Counter

    from neo4j_graph_algorithms_ray.functions.text import vocab_coverage
    occ = Counter()
    for d in DOCS:
        occ.update(d["text"].lower().split())
    total = sum(occ.values())
    ranked = sorted(occ, key=lambda t: (-occ[t], t))
    df = vocab_coverage(_ds(), ks=(2, 5, 1000))
    got = {int(r.k): (int(r.covered_occ), int(r.total_occ), r.coverage)
           for r in df.itertuples()}
    assert list(got) == [2, 5, 1000]
    for k, (cov, tot, frac) in got.items():
        want = sum(occ[t] for t in ranked[:k])
        assert (cov, tot) == (want, total)
        assert abs(frac - want / total) < 5e-7  # round6-ed
    # full-vocab k covers everything
    assert got[1000][0] == total and got[1000][2] == 1.0


def test_doc_sample_deterministic_and_pct():
    from neo4j_graph_algorithms_ray.functions.text import doc_sample
    big = rd.from_items([{"doc_id": i, "text": "x"} for i in range(1000)])
    got = sorted(r["doc_id"] for r in doc_sample(big, pct=20).take_all())
    got2 = sorted(r["doc_id"] for r in doc_sample(big, pct=20).take_all())
    assert got == got2                       # deterministic
    assert 120 <= len(got) <= 280            # ~20%
    want = [i for i in range(1000)
            if int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 100 < 20]
    assert got == want
    sup = sorted(r["doc_id"] for r in doc_sample(big, pct=50).take_all())
    assert set(got) <= set(sup)              # nested samples


def test_repetition_ratio():
    from neo4j_graph_algorithms_ray.functions.text import repetition_ratio
    docs = rd.from_items([
        {"doc_id": 0, "text": "a b c a b c a b c a b c"},  # heavy repeat
        {"doc_id": 1, "text": "all words here are unique tokens now"},
        {"doc_id": 2, "text": ""},
    ])
    got = {r["doc_id"]: r["rep_ratio"] for r in repetition_ratio(docs).take_all()}
    # doc 0: 10 shingles, 3 distinct -> 0.7
    assert abs(got[0] - 0.7) < 1e-9
    assert got[1] == 0.0 and got[2] == 0.0


def test_tfidf_topk_brute_force():
    import math
    from collections import Counter

    from neo4j_graph_algorithms_ray.functions.text import tfidf_topk
    texts = {d["doc_id"]: d["text"].lower().split() for d in DOCS}
    df = Counter()
    for toks in texts.values():
        df.update(set(toks))
    n = len(DOCS)
    want = {}
    for d, toks in texts.items():
        tf = Counter(toks)
        sc = {t: round(c * math.log(n / df[t]), 6) for t, c in tf.items()}
        want[d] = sorted(sc, key=lambda t: (-sc[t], t))[:3]
    rows = tfidf_topk(_ds(), topk=3).take_all()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append(r["token"])
    assert got == {d: w for d, w in want.items() if w}


def test_stratified_sample_caps_and_determinism():
    from neo4j_graph_algorithms_ray.functions.text import stratified_sample
    items = [{"doc_id": i, "lang": ["en", "de", "fr"][i % 3]}
             for i in range(300)]
    ds = rd.from_items(items)
    rows = stratified_sample(ds, key_col="lang", per_group=7).take_all()
    from collections import Counter
    per = Counter(r["lang"] for r in rows)
    assert per == {"en": 7, "de": 7, "fr": 7}
    # matches the md5-order brute force
    def hk(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
    want = set()
    for lang in ["en", "de", "fr"]:
        ids = [d["doc_id"] for d in items if d["lang"] == lang]
        want |= set(sorted(ids, key=lambda i: (hk(i), i))[:7])
    assert {r["doc_id"] for r in rows} == want


def test_inverted_index_postings():
    from neo4j_graph_algorithms_ray.functions.text import inverted_index
    docs = rd.from_items([
        {"doc_id": 3, "text": "apple banana"},
        {"doc_id": 1, "text": "apple cherry apple"},
        {"doc_id": 2, "text": "banana apple"},
    ])
    rows = {r["token"]: (r["df"], r["postings"])
            for r in inverted_index(docs, min_df=2).take_all()}
    assert rows == {"apple": (3, "1,2,3"), "banana": (2, "2,3")}


def test_column_histogram_exact():
    from neo4j_graph_algorithms_ray.functions.text import column_histogram
    ds = rd.from_items([{"doc_id": i, "v": float(i)} for i in range(250)])
    rows = {r["bucket"]: r["n"]
            for r in column_histogram(ds, "v", width=100).take_all()}
    assert rows == {0: 100, 1: 100, 2: 50}


def test_pmi_topk_brute():
    import math
    from collections import Counter

    import pyarrow as pa
    import ray.data as rd

    from neo4j_graph_algorithms_ray.functions.text import pmi_topk

    docs = ["new york new york city", "york new haven", "the city of new york",
            "city the the", "a", ""] * 5
    ds = rd.from_arrow(pa.table({"text": docs})).repartition(4)
    got = [(r["bigram"], r["n_xy"], r["pmi"])
           for r in pmi_topk(ds, topk=10, min_count=3).take_all()]
    uni, big = Counter(), Counter()
    for d in docs:
        t = d.lower().split()
        uni.update(t)
        big.update(f"{a} {b}" for a, b in zip(t, t[1:]))
    nt, nb = sum(uni.values()), sum(big.values())
    want = []
    for bg, cxy in big.items():
        if cxy < 3:
            continue
        x, y = bg.split(" ")
        want.append((bg, cxy,
                     round(math.log((cxy * nt * nt) / (nb * uni[x] * uni[y])), 6)))
    want.sort(key=lambda r: (-r[2], r[0]))
    assert got == want[:10]


def test_hash_features_brute():
    import hashlib

    import pyarrow as pa
    import ray.data as rd

    from neo4j_graph_algorithms_ray.functions.text import hash_features

    docs = {"d1": "a b a c", "d2": "b b", "d3": ""}
    ds = rd.from_arrow(pa.table({"doc_id": list(docs), "text": list(docs.values())}))
    got = [(r["doc_id"], r["feature"], r["n"])
           for r in hash_features(ds, dims=16).take_all()]
    want = {}
    for d, t in docs.items():
        for tok in t.lower().split():
            f = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % 16
            want[(d, f)] = want.get((d, f), 0) + 1
    assert sorted(got) == sorted((d, f, n) for (d, f), n in want.items())


def test_decontaminate_and_pii():
    import ray.data as rd

    from neo4j_graph_algorithms_ray.functions.text import (decontaminate,
                                                           pii_counts)
    docs = rd.from_items([
        {"doc_id": 0, "text": "the quick brown fox jumps high"},
        {"doc_id": 1, "text": "quick brown fox is a benchmark phrase"},
        {"doc_id": 2, "text": "totally unrelated content here now"},
        {"doc_id": 3, "text": "contact me at a.b@test.org or 555-123-4567 ok"},
    ])
    ev = rd.from_items([{"doc_id": 100, "text": "a quick brown fox appears"}])
    got = {r["doc_id"]: r["overlap"]
           for r in decontaminate(docs, ev, k=3).take_all()}
    # shared 3-gram "quick brown fox": docs 0 and 1 hit, 2 and 3 clean
    assert got == {0: 1, 1: 1}
    pii = {r["doc_id"]: (r["n_email"], r["n_phone"], r["n_ipv4"])
           for r in pii_counts(docs).take_all()}
    assert pii[3][0] == 1 and pii[3][1] >= 1
    assert pii[0] == (0, 0, 0)


# ---------------- line_dedup (CCNet-style corpus line dedup) ----------------

LINE_DOCS = [
    {"doc_id": 1, "text": "a\nX\nb"},
    {"doc_id": 2, "text": "c\nX\nd"},
    {"doc_id": 3, "text": "e"},
    {"doc_id": 4, "text": "X\nX"},   # pure boilerplate → dropped
    {"doc_id": 5, "text": ""},       # '' line occurs twice (with doc 6)
    {"doc_id": 6, "text": None},     # null → '' line
]


def _line_out(bcast_limit=None, min_count=2):
    from neo4j_graph_algorithms_ray.functions.text import line_dedup
    out = line_dedup(rd.from_items(LINE_DOCS), min_count=min_count,
                     bcast_limit=bcast_limit).take_all()
    return {r["doc_id"]: r["text"] for r in out}


def test_line_dedup_basic():
    # X appears 4x → removed everywhere; doc 4 (only X) is dropped;
    # '' appears 2x (docs 5+null 6) → both dropped
    assert _line_out() == {1: "a\nb", 2: "c\nd", 3: "e"}


def test_line_dedup_min_count():
    # min_count=3: the two ''s survive (docs 5/6 keep an empty text);
    # X (4 occurrences) is still removed, so doc 4 is still dropped
    assert _line_out(min_count=3) == {
        1: "a\nb", 2: "c\nd", 3: "e", 5: "", 6: ""}


def test_line_dedup_regime_parity():
    # force the shuffle regime (bcast_limit=0) — identical output
    assert _line_out(bcast_limit=0) == _line_out()
    assert _line_out(bcast_limit=0, min_count=3) == _line_out(min_count=3)


# -------------- boilerplate_strip (within-group nav/footer) --------------

BOILER_DOCS = [
    # host A (5 docs incl. doc 7): NAV in all 5 (stripped at any frac),
    # FOOT in 2 of 5 (below ceil(0.5·5)=3 → kept at frac=0.5)
    {"doc_id": 1, "source": "a", "text": "NAV A\nalpha\nFOOT A"},
    {"doc_id": 2, "source": "a", "text": "NAV A\nbeta\nFOOT A"},
    {"doc_id": 3, "source": "a", "text": "NAV A\ngamma"},
    {"doc_id": 4, "source": "a", "text": "NAV A\nCROSS HOST LINE"},
    # host B: its own NAV; CROSS HOST LINE appears once here — common
    # corpus-wide (2×) but rare within each host, so it SURVIVES
    {"doc_id": 5, "source": "b", "text": "NAV B\ndelta\nCROSS HOST LINE"},
    {"doc_id": 6, "source": "b", "text": "NAV B\nepsilon"},
    # doc 7: everything boilerplate → dropped entirely
    {"doc_id": 7, "source": "a", "text": "NAV A"},
]


def _boiler_out(bcast_limit=None, frac=0.5, min_docs=2):
    from neo4j_graph_algorithms_ray.functions.text import boilerplate_strip
    out = boilerplate_strip(rd.from_items(BOILER_DOCS), frac=frac,
                            min_docs=min_docs,
                            bcast_limit=bcast_limit).take_all()
    return {r["doc_id"]: r["text"] for r in out}


def test_boilerplate_strip_per_group():
    # host a has 5 docs (1,2,3,4,7) → threshold max(2, ceil(0.5·5))=3:
    # NAV A (5 docs) stripped, FOOT A (2 docs) kept. host b has 2 docs
    # → threshold 2: NAV B (2 docs) stripped.
    out = _boiler_out()
    assert out[1] == "alpha\nFOOT A"
    assert out[2] == "beta\nFOOT A"
    assert out[3] == "gamma"
    # CROSS HOST LINE survives in BOTH hosts (rare within each)
    assert out[4] == "CROSS HOST LINE"
    assert out[5] == "delta\nCROSS HOST LINE"
    assert out[6] == "epsilon"
    # doc 7 was pure boilerplate → dropped
    assert 7 not in out


def test_boilerplate_strip_threshold_scales_with_group():
    # min_docs=2, frac tiny → FOOT A (2 docs) now clears the bar too
    out = _boiler_out(frac=0.01)
    assert out[1] == "alpha" and out[2] == "beta"


def test_boilerplate_strip_regime_parity():
    # force the shuffle regime (bcast_limit=0) — identical output
    assert _boiler_out(bcast_limit=0) == _boiler_out()
    assert _boiler_out(bcast_limit=0, frac=0.01) == _boiler_out(frac=0.01)


# ---------------- corpus_clean (composed cleaning pipeline) ----------------

def test_corpus_clean_three_stages():
    from neo4j_graph_algorithms_ray.functions.text import corpus_clean
    B = "BOILER PLATE LINE"
    docs = rd.from_items([
        # en docs sharing a boilerplate line (3 occurrences → removed
        # at line_min_count=3)
        {"doc_id": 1, "text": f"{B}\nthe cat sat on a mat and the dog ran off"},
        {"doc_id": 2, "text": f"{B}\nthe rain in spain is wet for the most part"},
        {"doc_id": 3, "text": f"{B}\nthe quick brown fox is in the barn for now"},
        # exact pair after cleaning → collapse keeps min id 4
        {"doc_id": 4, "text": "the same it is that for a paired test here"},
        {"doc_id": 5, "text": "the same it is that for a paired test here"},
        # german → filtered by the language gate
        {"doc_id": 6, "text": "der hund und die katze ist nicht hier mit von zu"},
        # too short → filtered by min_tokens
        {"doc_id": 7, "text": "the end"},
    ])
    out = {r["doc_id"]: r["text"]
           for r in corpus_clean(docs, min_tokens=8).take_all()}
    assert out == {
        1: "the cat sat on a mat and the dog ran off",
        2: "the rain in spain is wet for the most part",
        3: "the quick brown fox is in the barn for now",
        4: "the same it is that for a paired test here",
    }


def test_preagg_min():
    from neo4j_graph_algorithms_ray.util import preagg_min
    ds = rd.from_items([{"k": 1, "v": 5}, {"k": 1, "v": 2},
                        {"k": 2, "v": 9}, {"k": 2, "v": 11}])
    out = {r["k"]: r["v"] for r in preagg_min(ds, ["k"], "v").take_all()}
    assert out == {1: 2, 2: 9}


GOPHER_DOCS = [
    # passes every rule (≥5 words, has 'the' + 'and', mwl in range)
    {"doc_id": 0, "text": "the cat and dog sat near that house with care"},
    # bullet lines: 3 of 4 lines bulleted → bullet_line_frac 0.75
    {"doc_id": 1, "text": "the list and that\n- one\n* two\n  • three"},
    # ellipsis endings: both flavors → ellipsis_line_frac 1.0
    {"doc_id": 2, "text": "and then...\nthe rest…"},
    # symbol-heavy: '#' x3 + '....' counts one '...' → 4 symbols / 4 words
    {"doc_id": 3, "text": "## tag # wow...."},
    # no stopwords, no alpha words
    {"doc_id": 4, "text": "123 456 789"},
    {"doc_id": 5, "text": ""},
]


def test_gopher_quality_rules():
    from neo4j_graph_algorithms_ray.functions.text import GopherQuality
    rows = {r["doc_id"]: r for r in rd.from_items(GOPHER_DOCS).map_batches(
        GopherQuality(min_words=5, min_stop_hits=2, min_mwl=1.0,
                      max_bullet=0.5),
        batch_format="pyarrow", concurrency=1).take_all()}
    r0 = rows[0]
    assert r0["n_words"] == 10 and r0["stop_hits"] == 4  # the,and,that,with
    assert r0["alpha_word_frac"] == 1.0 and r0["passes"]
    r1 = rows[1]
    assert r1["bullet_line_frac"] == 0.75 and not r1["passes"]
    r2 = rows[2]
    assert r2["ellipsis_line_frac"] == 1.0 and not r2["passes"]
    r3 = rows[3]
    assert r3["symbol_ratio"] == 1.0 and not r3["passes"]
    r4 = rows[4]
    assert r4["alpha_word_frac"] == 0.0 and r4["stop_hits"] == 0
    r5 = rows[5]
    assert r5["n_words"] == 0 and not r5["passes"]
    assert r5["bullet_line_frac"] == 0.0  # empty text = one '' line


def test_gopher_quality_duckdb_parity():
    import duckdb
    import pandas as pd

    from neo4j_graph_algorithms_ray.functions.text import GopherQuality
    from neo4j_graph_algorithms_ray.pipelines.oracles_docs import (
        gopher_quality_sql)
    docs = pd.DataFrame(GOPHER_DOCS)
    got = rd.from_pandas(docs).map_batches(
        GopherQuality(), batch_format="pyarrow", concurrency=1) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.execute(gopher_quality_sql()).df()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False)


def test_bm25_topk_hand_case():
    import math

    from neo4j_graph_algorithms_ray.functions.text import bm25_topk
    docs = [
        {"doc_id": 0, "text": "spark spark spark merge"},   # heavy spark
        {"doc_id": 1, "text": "merge sort join"},
        {"doc_id": 2, "text": "window window"},
        {"doc_id": 3, "text": "nothing relevant here at all"},
        {"doc_id": 4, "text": ""},
    ]
    got = bm25_topk(rd.from_items(docs), ("spark", "merge", "window"),
                    topk=10).to_pandas()
    # doc 3 and the empty doc 4 score 0 -> excluded
    assert set(got["doc_id"]) == {0, 1, 2}
    # hand-check doc 2: dl=2, tf(window)=2, df(window)=1, N=5,
    # avgdl over non-empty docs = (4+3+2+5)/4 = 3.5
    k1, b = 1.2, 0.75
    idf_w = math.log(1 + (5 - 1 + 0.5) / (1 + 0.5))
    norm = k1 * (1 - b + b * 2 / 3.5)
    want = idf_w * 2 * (k1 + 1) / (2 + norm)
    s2 = float(got.set_index("doc_id").loc[2, "score"])
    assert abs(s2 - want) < 1e-6
    # ranking is (score desc, doc_id asc)
    assert list(got["score"]) == sorted(got["score"], reverse=True)


def test_bm25_topk_no_hits():
    from neo4j_graph_algorithms_ray.functions.text import bm25_topk
    docs = [{"doc_id": 0, "text": "alpha beta"}]
    got = bm25_topk(rd.from_items(docs), ("zzznotpresent",), topk=5) \
        .to_pandas()
    assert len(got) == 0


def test_span_dedup_hand_case():
    from neo4j_graph_algorithms_ray.functions.text import span_dedup
    # "a b c" (k=3) appears in docs 0 and 1 -> covered in both.
    # doc 0's windows: [a b c][b c d][c d e]; only "a b c" dups, so
    # positions 0..2 drop, leaving "d e".
    docs = [
        {"doc_id": 0, "text": "a b c d e"},
        {"doc_id": 1, "text": "x a b c y"},
        {"doc_id": 2, "text": "unique tokens only here"},
        {"doc_id": 3, "text": ""},
    ]
    got = span_dedup(rd.from_items(docs), k=3, min_count=2) \
        .to_pandas().set_index("doc_id").sort_index()
    assert got.loc[0, "text"] == "d e" and got.loc[0, "n_dropped"] == 3
    assert got.loc[1, "text"] == "x y" and got.loc[1, "n_dropped"] == 3
    assert got.loc[2, "text"] == "unique tokens only here"
    assert got.loc[3, "text"] == "" and got.loc[3, "n_dropped"] == 0


def test_span_dedup_overlapping_covers_merge():
    from neo4j_graph_algorithms_ray.functions.text import span_dedup
    # doc 0 repeats "p q p q p q": windows "p q p","q p q" each occur
    # twice WITHIN the doc -> whole doc covered.
    docs = [
        {"doc_id": 0, "text": "p q p q p q"},
        {"doc_id": 1, "text": "solo words stay put"},
    ]
    got = span_dedup(rd.from_items(docs), k=3, min_count=2) \
        .to_pandas().set_index("doc_id").sort_index()
    assert got.loc[0, "text"] == "" and got.loc[0, "n_dropped"] == 6
    assert got.loc[1, "n_dropped"] == 0


def test_span_dedup_cap_raises_loudly():
    import pytest

    from neo4j_graph_algorithms_ray.functions.text import span_dedup
    docs = [{"doc_id": i, "text": "same five token span here"}
            for i in range(4)]
    with pytest.raises(RuntimeError, match="broadcast cap"):
        span_dedup(rd.from_items(docs), k=5, min_count=2,
                   bcast_limit=0).to_pandas()


def test_span_dedup_duckdb_parity():
    import duckdb
    import pandas as pd

    from neo4j_graph_algorithms_ray.functions.text import span_dedup
    from neo4j_graph_algorithms_ray.pipelines.oracles_docs import (
        span_dedup_sql)
    docs = pd.DataFrame([
        {"doc_id": 0, "text": "the quick brown fox jumps over the lazy dog"},
        {"doc_id": 1, "text": "a quick brown fox jumps today"},
        {"doc_id": 2, "text": "  spaced   quick brown fox jumps  "},
        {"doc_id": 3, "text": "Case Quick Brown differs"},
        {"doc_id": 4, "text": ""},
    ])
    got = span_dedup(rd.from_pandas(docs), k=4, min_count=2) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.execute(span_dedup_sql(4, 2)).df()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False)


def test_bigram_xent_hand_case():
    import math

    import pytest

    from neo4j_graph_algorithms_ray.functions.text import bigram_xent
    # corpus: "a b" x2 and "a c". vocab (min_count=2): {a, b}; c -> unk.
    # V = 3. counts on folded stream: C(a)=3, C(b)=2, C(u)=1;
    # C(a,b)=2, C(a,u)=1.
    docs = [
        {"doc_id": 0, "text": "a b"},
        {"doc_id": 1, "text": "a b"},
        {"doc_id": 2, "text": "a c"},
        {"doc_id": 3, "text": "single"},
        {"doc_id": 4, "text": ""},
    ]
    got = bigram_xent(rd.from_items(docs), min_count=2) \
        .to_pandas().set_index("doc_id").sort_index()
    x_ab = -math.log2((2 + 1) / (3 + 3))      # P(b|a) = 3/6
    x_au = -math.log2((1 + 1) / (3 + 3))      # P(unk|a) = 2/6
    assert float(got.loc[0, "xent"]) == pytest.approx(x_ab, abs=1e-6)
    assert float(got.loc[1, "xent"]) == pytest.approx(x_ab, abs=1e-6)
    assert float(got.loc[2, "xent"]) == pytest.approx(x_au, abs=1e-6)
    assert float(got.loc[3, "xent"]) == 0.0   # < 2 tokens
    assert float(got.loc[4, "xent"]) == 0.0


def test_bigram_xent_ranks_gibberish_higher():
    from neo4j_graph_algorithms_ray.functions.text import bigram_xent
    common = [{"doc_id": i, "text": "the quick brown fox jumps"}
              for i in range(8)]
    docs = common + [{"doc_id": 100, "text": "fox the jumps quick brown"}]
    got = bigram_xent(rd.from_items(docs), min_count=2) \
        .to_pandas().set_index("doc_id")
    # scrambled word order = unseen bigrams = higher cross-entropy
    assert float(got.loc[100, "xent"]) > float(got.loc[0, "xent"])


NB_DOCS = [
    # label-positive: >= 6 words and contains a Gopher stopword
    {"doc_id": 0, "text": "the quick brown fox jumps over lazy dogs"},
    {"doc_id": 1, "text": "the market rallied and closed higher today again"},
    # label-negative: short / stopword-free
    {"doc_id": 2, "text": "buy cheap pills"},
    {"doc_id": 3, "text": "zzz qqq"},
    {"doc_id": 4, "text": ""},
    # short but shares 'the' + positive-class words: score should pull up
    {"doc_id": 5, "text": "the fox"},
]


def test_nb_quality_hand_case():
    import math

    from neo4j_graph_algorithms_ray.functions.text import nb_quality_score
    rows = {r["doc_id"]: r for r in nb_quality_score(
        rd.from_items(NB_DOCS), min_words=6, min_stop_hits=1).take_all()}
    assert [rows[i]["label"] for i in range(6)] == \
        [True, True, False, False, False, False]
    # docs 0/1 trained the positive class → strongly positive log-odds
    assert rows[0]["pred"] and rows[1]["pred"]
    assert rows[2]["log_odds"] < 0 and rows[3]["log_odds"] < 0
    # empty doc scores exactly the smoothed prior: log2((2+1)/(4+1))
    assert rows[4]["log_odds"] == round(math.log2(3 / 5), 6)
    # doc 5 is itself a negative training doc, but sharing the/fox with
    # the positive class keeps it far above the pure-spam doc 2
    assert rows[5]["log_odds"] > rows[2]["log_odds"] + 3


def test_nb_quality_duckdb_parity():
    import duckdb
    import pandas as pd

    from neo4j_graph_algorithms_ray.functions.text import nb_quality_score
    from neo4j_graph_algorithms_ray.pipelines.oracles_docs import nb_quality_sql
    docs = pd.DataFrame(NB_DOCS)
    got = nb_quality_score(rd.from_pandas(docs), min_words=6,
                           min_stop_hits=1) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.execute(nb_quality_sql(min_words=6, min_stop_hits=1)).df()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False)


def test_chunk_documents_windows():
    from neo4j_graph_algorithms_ray.functions.text import chunk_documents
    docs = [
        {"doc_id": 0, "text": "a b c d e"},
        {"doc_id": 1, "text": "x"},
        {"doc_id": 2, "text": ""},          # no chunks
        {"doc_id": 3, "text": "p q r s t u"},
    ]
    rows = chunk_documents(rd.from_items(docs), chunk_tokens=3,
                           overlap=1).take_all()
    got = {(r["doc_id"], r["chunk_id"]): (r["text"], r["n_tokens"])
           for r in rows}
    assert got == {
        (0, 0): ("a b c", 3), (0, 1): ("c d e", 3),
        (1, 0): ("x", 1),
        (3, 0): ("p q r", 3), (3, 1): ("r s t", 3), (3, 2): ("t u", 2),
    }


def test_chunk_documents_duckdb_parity():
    import duckdb
    import pandas as pd

    from neo4j_graph_algorithms_ray.functions.text import chunk_documents
    from neo4j_graph_algorithms_ray.pipelines.oracles_docs import (
        chunk_documents_sql)
    docs = pd.DataFrame([
        {"doc_id": i, "text": " ".join(f"w{j}" for j in range(i * 3))}
        for i in range(8)])
    got = chunk_documents(rd.from_pandas(docs), chunk_tokens=5, overlap=2) \
        .to_pandas().sort_values(["doc_id", "chunk_id"]) \
        .reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.execute(chunk_documents_sql(5, 2)).df()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False)


def test_pack_sequences_prefix_sum():
    from neo4j_graph_algorithms_ray.functions.text import pack_sequences
    docs = [
        {"doc_id": 0, "text": "a b c"},
        {"doc_id": 1, "text": ""},
        {"doc_id": 2, "text": "x y"},
        {"doc_id": 3, "text": "p q r s t"},
    ]
    rows = {r["doc_id"]: r for r in pack_sequences(
        rd.from_items(docs), seq_tokens=4).take_all()}
    assert [(rows[i]["tok_start"], rows[i]["seq_first"], rows[i]["seq_last"])
            for i in range(4)] == [(0, 0, 0), (3, 0, 0), (3, 0, 1), (5, 1, 2)]


def test_pack_sequences_many_blocks_matches_sql():
    import duckdb
    import pandas as pd

    from neo4j_graph_algorithms_ray.functions.text import pack_sequences
    from neo4j_graph_algorithms_ray.pipelines.oracles_docs import (
        pack_sequences_sql)
    docs = pd.DataFrame([
        {"doc_id": i, "text": " ".join("t" * ((i * 7) % 13))}
        for i in range(200)])
    # force multiple blocks so cross-block offsets are exercised
    ds = rd.from_pandas(docs).repartition(8)
    got = pack_sequences(ds, seq_tokens=16).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.execute(pack_sequences_sql(16)).df()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False)


def test_gopher_repetition_signals():
    from neo4j_graph_algorithms_ray.functions.text import gopher_repetition
    docs = [
        {"doc_id": 0, "text": "hello\nworld\nhello\nhello"},   # dup lines
        {"doc_id": 1, "text": "new york new york city"},        # hot bigram
        {"doc_id": 2, "text": "all unique lines\nhere now"},
        {"doc_id": 3, "text": ""},
    ]
    rows = {r["doc_id"]: r for r in gopher_repetition(
        rd.from_items(docs)).take_all()}
    r0 = rows[0]
    # 4 lines, 2 repeats of 'hello'; chars: 5*3 + 5 = 20 total, 10 dup
    assert r0["dup_line_frac"] == 0.5
    assert r0["dup_line_char_frac"] == 0.5
    r1 = rows[1]
    # 'new york' x2: chars 2*(3+4)=14 over token chars 3+4+3+4+4=18
    assert r1["top_bigram"] == "new york"
    assert r1["top_bigram_char_frac"] == round(14 / 18, 6)
    assert rows[2]["dup_line_frac"] == 0.0
    # 5 bigrams all count 1 → lexicographically smallest wins
    assert rows[2]["top_bigram"] == "all unique"
    r3 = rows[3]
    assert (r3["dup_line_frac"], r3["top_bigram"],
            r3["top_bigram_char_frac"]) == (0.0, "", 0.0)


def test_gopher_repetition_duckdb_parity():
    import duckdb
    import pandas as pd

    from neo4j_graph_algorithms_ray.functions.text import gopher_repetition
    from neo4j_graph_algorithms_ray.pipelines.oracles_docs import (
        GOPHER_REPETITION_SQL)
    rng = __import__("numpy").random.default_rng(5)
    words = ["aa", "bb", "cc", "the", "of"]
    docs = pd.DataFrame([
        {"doc_id": i,
         "text": "\n".join(" ".join(rng.choice(words, rng.integers(0, 6)))
                           for _ in range(rng.integers(1, 5)))}
        for i in range(40)])
    got = gopher_repetition(rd.from_pandas(docs)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.execute(GOPHER_REPETITION_SQL).df()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False)


def test_weighted_sample_deterministic_and_weighted():
    import hashlib

    from neo4j_graph_algorithms_ray.functions.text import weighted_sample
    items = [{"doc_id": i, "w": (10_000 if i % 10 == 0 else 1)}
             for i in range(500)]
    ds = rd.from_items(items)
    rows = weighted_sample(ds, k=40, weight_col="w").take_all()
    got = [r["doc_id"] for r in rows]
    # brute-force the same priorities
    def pri(i, w):
        u = float(int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16))
        return u / w
    want = sorted(items, key=lambda d: (pri(d["doc_id"], d["w"]),
                                        d["doc_id"]))[:40]
    assert got == [d["doc_id"] for d in want]
    # heavy-weight rows dominate: all 50 weight-10000 rows beat almost
    # every weight-1 row in expectation
    heavy = sum(1 for i in got if i % 10 == 0)
    assert heavy >= 30
    # determinism across runs + partitionings
    rows2 = weighted_sample(ds.repartition(7), k=40,
                            weight_col="w").take_all()
    assert [r["doc_id"] for r in rows2] == got
    # zero/negative weights never selected
    ds3 = rd.from_items([{"doc_id": i, "w": (0 if i < 490 else 1)}
                         for i in range(500)])
    sel = {r["doc_id"] for r in
           weighted_sample(ds3, k=40, weight_col="w").take_all()}
    assert sel == set(range(490, 500))


def test_char_entropy_brute_force():
    import math
    from collections import Counter

    import pyarrow as pa
    import ray.data as rd

    from neo4j_graph_algorithms_ray.functions.text import CharEntropy
    docs = ["aab", "", "abcd", "aaaa", "héllo ✓ wörld", "x" * 1000 + "y"]
    ds = rd.from_arrow(pa.table({"doc_id": list(range(len(docs))),
                                 "text": docs}))
    got = {r["doc_id"]: r
           for r in ds.map_batches(CharEntropy(), batch_format="pyarrow",
                                   batch_size=3).take_all()}
    for i, t in enumerate(docs):
        n = len(t)
        if n == 0:
            want_h, want_a = 0.0, 0.0
        else:
            c = Counter(t)
            want_h = -sum(v / n * math.log2(v / n) for v in c.values())
            want_a = sum(ch.isascii() and ch.isalpha() for ch in t) / n
        assert abs(got[i]["char_entropy"] - want_h) < 1e-6, (i, t)
        assert abs(got[i]["alpha_ratio"] - want_a) < 1e-6, (i, t)


def test_vocab_novelty_min_source_attribution():
    from neo4j_graph_algorithms_ray.functions.text import vocab_novelty
    docs = rd.from_items([
        {"text": "a b c", "source": "s2"},
        {"text": "a b d", "source": "s1"},
        {"text": "e", "source": "s3"},
        {"text": "", "source": "s3"},
    ])
    df = vocab_novelty(docs)
    got = [tuple(r) for r in df.itertuples(index=False)]
    # s1 claims a,b,d (lexicographic min source); s2 adds c; s3 adds e
    assert got == [("s1", 3, 3), ("s2", 1, 4), ("s3", 1, 5)]


def test_lang_vocab_overlap_hand_case():
    from neo4j_graph_algorithms_ray.functions.text import lang_vocab_overlap
    docs = rd.from_items([
        {"text": "a b c", "lang": "en"},
        {"text": "a b d", "lang": "de"},
        {"text": "x y", "lang": "fr"},
        {"text": "a", "lang": "fr"},
        {"text": "", "lang": "zh"},        # empty: no tokens, no rows
    ])
    df = lang_vocab_overlap(docs)
    got = [tuple(r) for r in df.itertuples(index=False)]
    assert got == [("de", "en", 2, 3, 3, 0.5),
                   ("de", "fr", 1, 3, 3, 0.2),
                   ("en", "fr", 1, 3, 3, 0.2)]


def test_tfidf_cosine_pairs_hand_case():
    import math

    from neo4j_graph_algorithms_ray.functions.text import tfidf_cosine_pairs
    docs = rd.from_items([
        {"doc_id": 0, "text": "apple banana cherry"},
        {"doc_id": 1, "text": "apple banana date"},
        {"doc_id": 2, "text": "unrelated words entirely"},
        {"doc_id": 3, "text": ""},
    ])
    rows = tfidf_cosine_pairs(docs, threshold=0.1).take_all()
    # only (0,1) shares tokens: apple+banana df=2 (idf=ln2),
    # cherry/date df=1 (idf=ln4=2ln2) -> cos = 2/(2+4) = 1/3
    assert len(rows) == 1
    r = rows[0]
    assert (r["a"], r["b"]) == (0, 1)
    assert abs(r["cosine"] - round(1 / 3, 6)) < 5e-7
    # df_cap excludes ubiquitous tokens from the space entirely
    docs2 = rd.from_items([
        {"doc_id": i, "text": "common filler"} for i in range(5)
    ] + [{"doc_id": 9, "text": "common rare"}])
    got = tfidf_cosine_pairs(docs2, threshold=0.0, df_cap=5).take_all()
    # 'common' has df=6 > 5 -> dropped; 'filler' df=5 pairs the first five
    assert {(r["a"], r["b"]) for r in got} == {
        (a, b) for a in range(5) for b in range(a + 1, 5)}


def test_pii_redact_masks_and_counts():
    import ray.data as rd

    from neo4j_graph_algorithms_ray.functions.text import pii_redact
    docs = rd.from_items([
        {"doc_id": 0, "text": "mail a.b@c.de or +1 (555) 123-4567 at 10.0.0.1"},
        {"doc_id": 1, "text": "clean"},
        {"doc_id": 2, "text": "x@y.zz x@y.zz"},
    ])
    rows = {r["doc_id"]: r for r in pii_redact(docs).take_all()}
    assert rows[0]["text"] == "mail <EMAIL> or <PHONE> at <IP>"
    assert rows[0]["n_redactions"] == 3
    assert rows[1] == {"doc_id": 1, "text": "clean", "n_redactions": 0}
    assert rows[2]["text"] == "<EMAIL> <EMAIL>"
    assert rows[2]["n_redactions"] == 2


def test_trigram_xent_matches_bruteforce():
    import math
    from collections import Counter

    from neo4j_graph_algorithms_ray.functions.text import trigram_xent
    docs = [
        {"doc_id": 1, "text": "a b c a b c a b"},
        {"doc_id": 2, "text": "a b d c a b"},
        {"doc_id": 3, "text": "b c x y a"},   # x/y fold to <unk>
        {"doc_id": 4, "text": "a b"},          # < 3 tokens -> 0
    ]
    min_count, alpha = 2, 0.4
    # brute-force reference: fold, count, stupid backoff
    toks = {d["doc_id"]: d["text"].lower().split() for d in docs}
    uni0 = Counter(t for tk in toks.values() for t in tk)
    voc = {t for t, n in uni0.items() if n >= min_count}
    fold = {d: [t if t in voc else "\x01" for t in tk]
            for d, tk in toks.items()}
    uni = Counter(t for tk in fold.values() for t in tk)
    big = Counter((tk[i], tk[i + 1]) for tk in fold.values()
                  for i in range(len(tk) - 1))
    tri = Counter((tk[i], tk[i + 1], tk[i + 2]) for tk in fold.values()
                  for i in range(len(tk) - 2))
    n_total = sum(uni.values())
    want = {}
    for d, tk in fold.items():
        if len(tk) < 3:
            want[d] = 0.0
            continue
        tot = 0.0
        for i in range(len(tk) - 2):
            x, y, z = tk[i], tk[i + 1], tk[i + 2]
            if tri[(x, y, z)]:
                s = tri[(x, y, z)] / big[(x, y)]
            elif big[(y, z)]:
                s = alpha * big[(y, z)] / uni[y]
            else:
                s = alpha * alpha * uni[z] / n_total
            tot -= math.log2(s)
        want[d] = round(tot / (len(tk) - 2), 6)
    got = {r["doc_id"]: r["xent"]
           for r in trigram_xent(rd.from_items(docs),
                                 min_count=min_count).take_all()}
    assert got == want
    assert got[4] == 0.0 and got[1] > 0.0
