"""Text-analysis stages for large-scale training-data pipelines:
token counting, quality scoring, language ID, fingerprinting.

All are stateless-per-batch; the tiny regex/stopword state is built in
`__init__` and ships inside the serialized callable, so call sites pass
an instance to plain (task-pool) map_batches — warm workers, no
actor-pool spin-up.
Semantics are pinned so the DuckDB oracles can replicate them exactly
(see pipelines/oracles_docs.py): tokens = maximal ``\\S+`` runs of the
*trimmed* text; ratios rounded half-away-from-zero at 6 decimals.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "para", "en", "que"],
    "it": ["il", "la", "gli", "e", "è", "un", "una", "per", "non", "che"],
}
PUNCT = ".,!?;:"


def round6(x: np.ndarray) -> np.ndarray:
    """Half-away-from-zero at 6 decimals — DuckDB round() semantics."""
    x = np.asarray(x, dtype=np.float64)
    return np.copysign(np.floor(np.abs(x) * 1e6 + 0.5), x) / 1e6


def _text_column(batch: pa.Table, col: str) -> pa.ChunkedArray:
    return pc.fill_null(batch[col].cast(pa.string()), "")


def _split_tokens(txt) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Arrow-native whitespace tokenize of a string column →
    (flat_tokens pa.Array, doc_idx int64[], n_tok int64[]).

    One `utf8_split_whitespace` over the trimmed column — ~10× faster
    than an RE2 ``\\S+`` scan per the kernel profile. Empty /
    whitespace-only docs yield one '' entry in ``flat`` (harmless for
    length sums and set membership) but n_tok = 0 for them."""
    trimmed = pc.utf8_trim_whitespace(txt)
    parts = pc.utf8_split_whitespace(trimmed)
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    flat = parts.flatten()
    counts = np.diff(parts.offsets.to_numpy(zero_copy_only=False))
    empty = pc.utf8_length(trimmed).to_numpy(zero_copy_only=False) == 0
    n_tok = np.where(empty, 0, counts).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    return flat, doc_idx, n_tok


# RE2-safe BPE-ish piece pattern: letter runs | digit runs | single
# non-alnum non-space char — the subword-ish unit count used for token
# budgeting when no real tokenizer model ships with the engine. RE2
# semantics are shared with DuckDB's regexp_extract_all, so the SQL
# oracle counts the identical pieces.
BPE_PIECE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


class TokenCount:
    """(id, text) → (id, n_tokens, n_bpe_pieces): whitespace token
    count (one Arrow split kernel) plus the BPE-ish subword-piece count
    (one RE2 scan, BPE_PIECE_RE) — no per-row Python."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        txt = _text_column(batch, self.text_col)
        _, _, n_tok = _split_tokens(txt)
        n_bpe = pc.cast(pc.count_substring_regex(txt, BPE_PIECE_RE),
                        pa.int64())
        return pa.table({self.id_col: batch[self.id_col],
                         "n_tokens": pa.array(n_tok),
                         "n_bpe_pieces": n_bpe})


def _lang_hits(flat_lower: pa.Array, doc_idx: np.ndarray, ndocs: int,
               words) -> np.ndarray:
    """Per-doc count of lowered tokens in ``words`` — Arrow hash
    ``is_in`` over the flat token array (no Python-object conversion),
    then a bincount over the matching doc indices."""
    if len(flat_lower) == 0:
        return np.zeros(ndocs, dtype=np.int64)
    mask = pc.is_in(flat_lower, value_set=pa.array(sorted(words))) \
             .to_numpy(zero_copy_only=False)
    return np.bincount(doc_idx[mask], minlength=ndocs).astype(np.int64)


class QualityScore:
    """(id, text) → per-doc quality features: n_chars, n_tokens,
    mean_token_len, stopword_ratio (English list), punct_ratio.
    The shape of the reference-free heuristics used for corpus filtering.

    Fully vectorized: one Arrow whitespace split per batch drives token
    count / summed token length (utf8_length over the flat tokens +
    weighted bincount) / stopword hits (hash `is_in` + bincount); the
    punct count is a single RE2 char-class scan. Zero per-row Python.
    """

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col
        self.stop = frozenset(STOPWORDS["en"])

    def __call__(self, batch: pa.Table) -> pa.Table:
        txt = _text_column(batch, self.text_col)
        ndocs = len(txt)
        n_chars = pc.utf8_length(txt).to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
        punct = pc.count_substring_regex(txt, "[" + PUNCT + "]") \
                  .to_numpy(zero_copy_only=False).astype(np.int64)
        flat, doc_idx, n_tok = _split_tokens(txt)
        tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        tok_chars = np.bincount(doc_idx, weights=tok_len.astype(np.float64),
                                minlength=ndocs)
        stop_hits = _lang_hits(pc.utf8_lower(flat), doc_idx, ndocs, self.stop)
        mean_len = np.where(n_tok > 0, tok_chars / np.maximum(n_tok, 1), 0.0)
        stop_ratio = np.where(n_tok > 0, stop_hits / np.maximum(n_tok, 1), 0.0)
        punct_ratio = np.where(n_chars > 0, punct / np.maximum(n_chars, 1), 0.0)
        return pa.table({
            self.id_col: batch[self.id_col],
            "n_chars": pa.array(n_chars), "n_tokens": pa.array(n_tok),
            "mean_token_len": pa.array(round6(mean_len)),
            "stopword_ratio": pa.array(round6(stop_ratio)),
            "punct_ratio": pa.array(round6(punct_ratio)),
        })


class LangId:
    """N-gram-free heuristic language ID: stopword hit counts per
    language; predicted lang = argmax hits (alphabetical tie-break),
    'und' when no hits.

    Vectorized: one Arrow split per batch, then one hash `is_in` +
    bincount per language over the shared flat token array; argmax over
    the (langs × docs) hit matrix — ``self.langs`` is sorted, so numpy's
    first-max argmax IS the alphabetical tie-break."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col
        self.langs = sorted(STOPWORDS)
        self.sets = {lang: frozenset(ws) for lang, ws in STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        txt = _text_column(batch, self.text_col)
        ndocs = len(txt)
        flat, doc_idx, _ = _split_tokens(txt)
        low = pc.utf8_lower(flat)
        hits = np.stack([
            _lang_hits(low, doc_idx, ndocs, self.sets[lang])
            for lang in self.langs]) if ndocs else np.zeros((len(self.langs), 0))
        best = np.asarray(self.langs, dtype=object)[hits.argmax(axis=0)]
        pred = np.where(hits.max(axis=0) > 0, best, "und") if ndocs \
            else np.empty(0, object)
        return pa.table({self.id_col: batch[self.id_col],
                         "pred_lang": pa.array(pred.astype(object), pa.string())})


class Fingerprint:
    """Deterministic document fingerprint: md5 hex of the normalized
    text (lowercase, whitespace collapsed to single spaces, trimmed).

    Normalization is column-level Arrow (`utf8_lower` →
    `replace_substring_regex(\\s+→' ')` → trim spaces), matching the SQL
    ``trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))`` exactly;
    only the md5 itself runs per DISTINCT normalized string."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        txt = _text_column(batch, self.text_col)
        norm = pc.utf8_trim(
            pc.replace_substring_regex(pc.utf8_lower(txt), r"\s+", " "), " ")
        inv, uniq = pd.factorize(norm.to_numpy(zero_copy_only=False))
        md5 = hashlib.md5
        digests = np.fromiter(
            (md5(s.encode("utf-8")).hexdigest() for s in uniq),
            dtype=object, count=len(uniq))
        fp = digests[inv] if len(uniq) else np.empty(0, object)
        return pa.table({self.id_col: batch[self.id_col],
                         "fingerprint": pa.array(fp, pa.string())})


class CharEntropy:
    """(id, text) → (id, char_entropy, alpha_ratio): Shannon entropy
    over the document's characters (bits) and the alphabetic-character
    fraction — the classic gibberish / binary-junk screens a crawl
    filter runs on every document.

    Vectorized: the batch's string column decodes once (whole-buffer
    utf-8 → utf-32 codepoint array, two C passes, unicode-correct), a
    repeat-expanded doc index keys one ``np.unique`` over packed
    (doc, codepoint) pairs, and per-doc entropy reduces with
    ``np.add.reduceat`` via H = log2(n) − Σ c·log2(c) / n (the same
    expression tree as the SQL mirror). The alpha count is a single
    RE2 char-class scan. Zero per-row Python."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        txt = _text_column(batch, self.text_col)
        ndocs = len(txt)
        n = pc.utf8_length(txt).to_numpy(zero_copy_only=False) \
              .astype(np.int64)
        arr = txt.combine_chunks() if isinstance(txt, pa.ChunkedArray) \
            else txt
        # whole-buffer decode: concatenated utf8 payload → codepoints
        off = arr.buffers()[1]
        lo = np.frombuffer(off, np.int32)[arr.offset]
        hi = np.frombuffer(off, np.int32)[arr.offset + len(arr)]
        payload = arr.buffers()[2].to_pybytes()[lo:hi] if hi > lo else b""
        cp = np.frombuffer(payload.decode("utf-8", "surrogatepass")
                           .encode("utf-32-le"), np.uint32) \
               .astype(np.int64)
        doc_idx = np.repeat(np.arange(ndocs, dtype=np.int64), n)
        key, cnt = np.unique((doc_idx << 21) | cp, return_counts=True)
        doc_of = key >> 21
        contrib = cnt * np.log2(cnt)
        s = np.zeros(ndocs)
        if len(doc_of):
            starts = np.nonzero(np.r_[True, doc_of[1:] != doc_of[:-1]])[0]
            s[doc_of[starts]] = np.add.reduceat(contrib, starts)
        ent = np.where(n > 0, np.log2(np.maximum(n, 1)) - s / np.maximum(n, 1),
                       0.0)
        alpha = pc.count_substring_regex(txt, "[A-Za-z]") \
                  .to_numpy(zero_copy_only=False).astype(np.float64)
        aratio = np.divide(alpha, n, out=np.zeros(ndocs), where=n != 0)
        return pa.table({self.id_col: batch[self.id_col],
                         "char_entropy": pa.array(round6(ent)),
                         "alpha_ratio": pa.array(round6(aratio))})


# The Gopher rule-based quality filter's stop-word set (Rae et al.
# 2021, "Scaling Language Models", §A1.1): a doc must contain at least
# ``min_stop_hits`` DISTINCT words from this list.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


class GopherQuality:
    """(id, text) → the Gopher rule-based quality signals (Rae et al.
    2021 §A1.1) plus a combined ``passes`` flag:

    - ``n_words`` in [min_words, max_words]
    - ``mean_word_len`` in [min_mwl, max_mwl]
    - ``symbol_ratio`` (count of '#' chars + non-overlapping '...'/'…'
      occurrences, per word) ≤ max_symbol_ratio
    - ``alpha_word_frac`` (words containing ≥1 ASCII letter) ≥ min_alpha
    - ``stop_hits`` (DISTINCT GOPHER_STOPWORDS present) ≥ min_stop_hits
    - ``bullet_line_frac`` (lines starting with -, * or •) ≤ max_bullet
    - ``ellipsis_line_frac`` (lines ending with '...' or '…') ≤ max_ellipsis

    Fully vectorized — one whitespace split + one line split per batch;
    per-word predicates are Arrow regex/hash kernels over the flat token
    array; distinct-stopword counts come from a doc×word pair-encode +
    ``np.unique``. Semantics mirror ``gopher_quality_sql`` exactly
    (non-overlapping substring counts, lines = string_split on \\n)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text", *,
                 min_words: int = 50, max_words: int = 100_000,
                 min_mwl: float = 3.0, max_mwl: float = 10.0,
                 max_symbol_ratio: float = 0.1, min_alpha: float = 0.8,
                 min_stop_hits: int = 2, max_bullet: float = 0.9,
                 max_ellipsis: float = 0.3):
        self.id_col, self.text_col = id_col, text_col
        self.th = (min_words, max_words, min_mwl, max_mwl, max_symbol_ratio,
                   min_alpha, min_stop_hits, max_bullet, max_ellipsis)

    def __call__(self, batch: pa.Table) -> pa.Table:
        (min_words, max_words, min_mwl, max_mwl, max_sym, min_alpha,
         min_stop, max_bullet, max_ellipsis) = self.th
        txt = _text_column(batch, self.text_col)
        ndocs = len(txt)
        flat, doc_idx, n_tok = _split_tokens(txt)
        tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        tok_chars = np.bincount(doc_idx, weights=tok_len.astype(np.float64),
                                minlength=ndocs)
        nz = np.maximum(n_tok, 1)
        mwl = np.where(n_tok > 0, tok_chars / nz, 0.0)
        # symbol counts: '#' chars + non-overlapping '...' / '…'
        sym = (pc.count_substring(txt, "#").to_numpy(zero_copy_only=False)
               + pc.count_substring(txt, "...").to_numpy(zero_copy_only=False)
               + pc.count_substring(txt, "…").to_numpy(zero_copy_only=False)
               ).astype(np.int64)
        sym_ratio = np.where(n_tok > 0, sym / nz, 0.0)
        alpha = pc.match_substring_regex(flat, "[A-Za-z]") \
                  .to_numpy(zero_copy_only=False)
        alpha_cnt = np.bincount(doc_idx[alpha], minlength=ndocs)
        alpha_frac = np.where(n_tok > 0, alpha_cnt / nz, 0.0)
        # distinct Gopher stop words present per doc
        low = pc.utf8_lower(flat)
        hit = pc.is_in(low, value_set=pa.array(GOPHER_STOPWORDS)) \
                .to_numpy(zero_copy_only=False)
        if hit.any():
            codes = pd.Categorical(
                low.filter(pa.array(hit)).to_numpy(zero_copy_only=False),
                categories=GOPHER_STOPWORDS).codes.astype(np.int64)
            pairs = np.unique(doc_idx[hit] * len(GOPHER_STOPWORDS) + codes)
            stop_hits = np.bincount(pairs // len(GOPHER_STOPWORDS),
                                    minlength=ndocs).astype(np.int64)
        else:
            stop_hits = np.zeros(ndocs, dtype=np.int64)
        # line-level signals
        lines, line_idx, n_lines = _split_lines(txt)
        bullet = pc.match_substring_regex(lines, r"^\s*[-*•]") \
                   .to_numpy(zero_copy_only=False)
        ellip = pc.match_substring_regex(lines, r"(\.\.\.|…)$") \
                  .to_numpy(zero_copy_only=False)
        lz = np.maximum(n_lines, 1)
        bullet_frac = np.bincount(line_idx[bullet], minlength=ndocs) / lz
        ellip_frac = np.bincount(line_idx[ellip], minlength=ndocs) / lz
        passes = ((n_tok >= min_words) & (n_tok <= max_words)
                  & (mwl >= min_mwl) & (mwl <= max_mwl)
                  & (sym_ratio <= max_sym) & (alpha_frac >= min_alpha)
                  & (stop_hits >= min_stop) & (bullet_frac <= max_bullet)
                  & (ellip_frac <= max_ellipsis))
        return pa.table({
            self.id_col: batch[self.id_col],
            "n_words": pa.array(n_tok),
            "mean_word_len": pa.array(round6(mwl)),
            "symbol_ratio": pa.array(round6(sym_ratio)),
            "alpha_word_frac": pa.array(round6(alpha_frac)),
            "stop_hits": pa.array(stop_hits),
            "bullet_line_frac": pa.array(round6(bullet_frac)),
            "ellipsis_line_frac": pa.array(round6(ellip_frac)),
            "passes": pa.array(passes),
        })


def vocab_topk(docs, *, topk: int = 100, id_col: str = "doc_id",
               text_col: str = "text"):
    """Corpus-wide vocabulary statistics: the ``topk`` most frequent
    lowered whitespace tokens → (token, n_occ, n_docs), ranked by
    occurrence count desc then token asc. The shape of tokenizer /
    BPE-vocabulary training stats over a web corpus.

    Scale shape: per-batch vectorized tokenize + factorize combine
    (occurrence AND document frequency computed inside the batch — a
    doc never spans batches), so the shuffle carries per-batch-distinct
    tokens only; top-k is a tiny sort on the aggregated vocab.
    """
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.functions.dedup import _token_arrays
    from neo4j_graph_algorithms_ray.util import preagg_sum

    def partial(b: pa.Table) -> pa.Table:
        doc_idx, toks = _token_arrays(b[text_col])
        if len(toks) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "n_occ": pa.array([], pa.int64()),
                             "n_docs": pa.array([], pa.int64())})
        codes, uniq = pd.factorize(toks)
        n_occ = np.bincount(codes, minlength=len(uniq))
        pair = np.unique(doc_idx.astype(np.int64) * len(uniq) + codes)
        n_docs = np.bincount((pair % len(uniq)).astype(np.int64),
                             minlength=len(uniq))
        return pa.table({"token": pa.array(uniq, pa.string()),
                         "n_occ": n_occ.astype(np.int64),
                         "n_docs": n_docs.astype(np.int64)})

    agg = preagg_sum(docs.map_batches(partial, batch_format="pyarrow"),
                     ["token"], ["n_occ", "n_docs"])
    return agg.sort(["n_occ", "token"], descending=[True, False]).limit(topk)


def vocab_counts(docs, *, text_col: str = "text"):
    """Corpus token-frequency table (token, f) via the same factorized
    map-side combine as vocab_topk — the shared base of zipf_alpha and
    vocab_coverage."""
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.functions.dedup import _token_arrays
    from neo4j_graph_algorithms_ray.util import preagg_sum

    def partial(b: pa.Table) -> pa.Table:
        _, toks = _token_arrays(b[text_col])
        if len(toks) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "f": pa.array([], pa.int64())})
        codes, uniq = pd.factorize(toks)
        return pa.table({"token": pa.array(uniq, pa.string()),
                         "f": np.bincount(codes,
                                          minlength=len(uniq))
                         .astype(np.int64)})

    return preagg_sum(docs.map_batches(partial, batch_format="pyarrow"),
                      ["token"], "f")


def zipf_alpha(docs, *, fmin: int = 2, text_col: str = "text"):
    """Zipf exponent of the corpus token-frequency distribution — the
    discrete power-law MLE (Clauset-Shalizi-Newman 2009, same
    estimator as community_metrics.powerlaw_alpha) over per-token
    occurrence counts with frequency ≥ ``fmin``. The is-my-corpus-
    Zipfian sanity check before subword-vocab sizing. One row
    (alpha, n_tail)."""
    from neo4j_graph_algorithms_ray.algorithms.community_metrics import \
        powerlaw_alpha
    return powerlaw_alpha(vocab_counts(docs, text_col=text_col),
                          degree_col="f", dmin=fmin)


def vocab_coverage(docs, *, ks=(100, 1000, 10000),
                   text_col: str = "text"):
    """Tokenizer-budget planning: the fraction of corpus token
    occurrences covered by the top-k vocabulary (ranked count desc,
    token asc) for each k — the head/tail coverage curve that sizes a
    subword vocabulary. Returns (k, covered_occ, total_occ, coverage).

    Scale shape: the vocabulary reduces through the map-side combine;
    only the top-max(k) rows (and one total) reach the driver."""
    import pandas as pd_

    freq = vocab_counts(docs, text_col=text_col).materialize()
    total = int(freq.sum("f") or 0)
    kmax = max(ks)
    top = freq.sort(["f", "token"], descending=[True, False]).limit(kmax)
    f = np.concatenate(
        [t["f"].to_numpy(zero_copy_only=False)
         for t in top.iter_batches(batch_format="pyarrow",
                                   batch_size=kmax)] or
        [np.empty(0, np.int64)])
    cum = np.cumsum(f)
    rows = []
    for k in sorted(ks):
        nv = min(k, len(f))
        covered = int(cum[nv - 1]) if nv else 0
        rows.append((k, covered, total,
                     float(round6(np.array([covered / total
                                            if total else 0.0]))[0])))
    return pd_.DataFrame(rows, columns=["k", "covered_occ", "total_occ",
                                        "coverage"]).astype(
        {"k": "int64", "covered_occ": "int64", "total_occ": "int64"})


def doc_sample(docs, *, pct: int = 20, id_col: str = "doc_id"):
    """Deterministic hash sampling: keep rows whose md5(id) bucket
    (mod 100) is < ``pct``. The reproducible corpus-subsetting primitive
    — same doc set on every run, any cluster size, any partitioning
    (unlike Dataset.random_sample). Pure vectorized filter, no shuffle.
    """
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.functions.dedup import _md5_u64

    def keep(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        h, _ = _md5_u64(ids.astype(str).astype(object), 15)
        return b.filter(pa.array((h % 100) < pct))

    return docs.map_batches(keep, batch_format="pyarrow")


def repetition_ratio(docs, *, k: int = 3, id_col: str = "doc_id",
                     text_col: str = "text"):
    """Per-doc duplicate-k-gram fraction: 1 − distinct/total word
    k-shingles (0 when the doc has no shingles). High values flag
    boilerplate/spam — the Gopher-style repetition quality signal.
    Vectorized shingling shared with the dedup sketches."""
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.functions.dedup import _shingle_arrays

    def score(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        doc_idx, sh = _shingle_arrays(b[text_col], k)
        total = np.bincount(doc_idx, minlength=len(ids)).astype(np.float64)
        if len(sh):
            d = pd.DataFrame({"d": doc_idx, "s": sh}).drop_duplicates()
            dist = np.bincount(d["d"].to_numpy(), minlength=len(ids))
        else:
            dist = np.zeros(len(ids))
        ratio = np.where(total > 0, 1.0 - dist / np.maximum(total, 1), 0.0)
        return pa.table({id_col: b[id_col],
                         "rep_ratio": pa.array(round6(ratio))})

    return docs.map_batches(score, batch_format="pyarrow")


def tfidf_topk(docs, *, topk: int = 3, id_col: str = "doc_id",
               text_col: str = "text"):
    """Per-doc top-``topk`` keywords by tf·idf → (doc_id, token, tfidf):
    tf = raw occurrence count in the doc, idf = ln(N / df) over lowered
    whitespace tokens, ranked (tfidf desc, token asc). Document
    keywording / topic features for corpus curation.

    Scale shape: the document-frequency table is aggregated with a
    map-side combine (same pass as vocab_topk) and then BROADCAST via
    ``ray.put`` — one object-store copy read by every scoring task, not
    re-shipped per batch and never a shuffle join. Assumes the distinct
    vocab fits a worker's heap (true even at web scale with the usual
    df≥2 floor; tokens seen once get idf=ln N and never rank anyway).
    """
    import pyarrow as pa
    import ray

    from neo4j_graph_algorithms_ray.functions.dedup import _token_arrays
    from neo4j_graph_algorithms_ray.util import preagg_sum

    def df_partial(b: pa.Table) -> pa.Table:
        doc_idx, toks = _token_arrays(b[text_col])
        if len(toks) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64())})
        codes, uniq = pd.factorize(toks)
        pair = np.unique(doc_idx.astype(np.int64) * len(uniq) + codes)
        df = np.bincount((pair % len(uniq)).astype(np.int64),
                         minlength=len(uniq))
        return pa.table({"token": pa.array(uniq, pa.string()),
                         "df": df.astype(np.int64)})

    n_docs = docs.count()
    dft = preagg_sum(docs.map_batches(df_partial, batch_format="pyarrow"),
                     ["token"], "df").materialize()
    from neo4j_graph_algorithms_ray.util import collect_arrow
    vocab = pa.concat_tables(collect_arrow(dft))
    idf_map = pd.Series(
        np.log(float(n_docs) / vocab["df"].to_numpy(zero_copy_only=False)),
        index=pd.Index(vocab["token"].to_pylist()))
    idf_ref = ray.put(idf_map)

    def score(b: pa.Table) -> pa.Table:
        idf = ray.get(idf_ref)
        doc_idx, toks = _token_arrays(b[text_col])
        ids = b[id_col].to_numpy(zero_copy_only=False)
        if len(toks) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "token": pa.array([], pa.string()),
                             "tfidf": pa.array([], pa.float64())})
        codes, uniq = pd.factorize(toks)
        key = doc_idx.astype(np.int64) * len(uniq) + codes
        ukey, tf = np.unique(key, return_counts=True)
        d = (ukey // len(uniq)).astype(np.int64)
        tok = uniq[(ukey % len(uniq)).astype(np.int64)]
        sc = round6(tf * idf.reindex(tok).to_numpy())
        frame = pd.DataFrame({id_col: ids[d], "token": tok, "tfidf": sc})
        frame = frame.sort_values([id_col, "tfidf", "token"],
                                  ascending=[True, False, True])
        top = frame.groupby(id_col, sort=False).head(topk)
        return pa.Table.from_pandas(top, preserve_index=False) \
                       .replace_schema_metadata(None)

    return docs.map_batches(score, batch_format="pyarrow")


def bm25_topk(docs, terms, *, topk: int = 10, k1: float = 1.2,
              b: float = 0.75, id_col: str = "doc_id",
              text_col: str = "text"):
    """BM25 lexical retrieval: score every document against a fixed
    bag of query ``terms`` and return the ``topk`` highest-scoring
    docs → (doc_id, score). Lucene-flavoured BM25:

        idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
        s(d)    = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))

    with N = corpus size, dl = doc token count, avgdl the mean dl over
    non-empty docs. The lexical counterpart to the embedding ANN
    retrieval in functions/ann.py.

    Scale shape: ONE stats scan emits per-batch partials — df per
    query term (≤|terms| rows), token totals, non-empty doc counts —
    combined map-side then reduced to a handful of rows; the driver
    holds only |terms| idf values, broadcast to the scoring scan.
    Pass 2 computes per-doc scores batch-locally (a doc never spans
    batches) and keeps a per-batch top-k partial, so the final sort
    sees ≤ topk·nblocks rows. No shuffle touches the corpus.
    """
    import ray

    from neo4j_graph_algorithms_ray.functions.dedup import _token_arrays
    from neo4j_graph_algorithms_ray.util import collect_arrow, preagg_sum

    terms = sorted(set(terms))
    term_idx = pd.Index(np.array(terms, dtype=object))
    STATS = "\x00stats"  # never a token: tokens are \S+ runs

    def partial(batch: pa.Table) -> pa.Table:
        doc_idx, toks = _token_arrays(batch[text_col])
        rows_tok = np.array(terms + [STATS], dtype=object)
        df = np.zeros(len(terms) + 1, np.int64)
        ntoks = np.zeros(len(terms) + 1, np.int64)
        ndocs = np.zeros(len(terms) + 1, np.int64)
        if len(toks):
            j = term_idx.get_indexer(toks)
            hit = j >= 0
            # distinct (doc, term) pairs -> df contribution
            pair = np.unique(doc_idx[hit] * len(terms) + j[hit])
            df[: len(terms)] = np.bincount(pair % len(terms),
                                           minlength=len(terms))
            ntoks[-1] = len(toks)
            ndocs[-1] = len(np.unique(doc_idx))
        return pa.table({"token": pa.array(rows_tok, pa.string()),
                         "df": df, "ntoks": ntoks, "ndocs": ndocs})

    n_total = docs.count()
    agg = preagg_sum(
        docs.select_columns([text_col]).map_batches(
            partial, batch_format="pyarrow"),
        ["token"], ["df", "ntoks", "ndocs"])
    stats = pa.concat_tables(collect_arrow(agg)).to_pandas() \
              .set_index("token")
    n_nonempty = int(stats.loc[STATS, "ndocs"]) if STATS in stats.index else 0
    avgdl = (float(stats.loc[STATS, "ntoks"]) / n_nonempty
             if n_nonempty else 1.0)
    dfv = stats.reindex(terms)["df"].fillna(0).to_numpy(np.float64)
    idf = np.log(1.0 + (n_total - dfv + 0.5) / (dfv + 0.5))
    idf_ref = ray.put(idf)

    def score(batch: pa.Table) -> pa.Table:
        w = ray.get(idf_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        doc_idx, toks = _token_arrays(batch[text_col])
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "score": pa.array([], pa.float64())})
        if not len(toks):
            return empty
        dl = np.bincount(doc_idx, minlength=len(ids)).astype(np.float64)
        j = term_idx.get_indexer(toks)
        hit = j >= 0
        if not hit.any():
            return empty
        key = doc_idx[hit] * len(terms) + j[hit]
        ukey, tf = np.unique(key, return_counts=True)
        d = ukey // len(terms)
        t = ukey % len(terms)
        tf = tf.astype(np.float64)
        norm = k1 * (1.0 - b + b * dl[d] / avgdl)
        contrib = w[t] * tf * (k1 + 1.0) / (tf + norm)
        sc = np.bincount(d, weights=contrib, minlength=len(ids))
        keep = sc > 0
        out = pd.DataFrame({id_col: ids[keep], "score": round6(sc[keep])})
        out = out.sort_values(["score", id_col],
                              ascending=[False, True]).head(topk)
        return pa.Table.from_pandas(out, preserve_index=False) \
                       .replace_schema_metadata(None)

    ranked = docs.select_columns([id_col, text_col]) \
                 .map_batches(score, batch_format="pyarrow")
    return ranked.sort(["score", id_col], descending=[True, False]) \
                 .limit(topk)


def stratified_sample(docs, *, key_col: str = "lang", per_group: int = 50,
                      id_col: str = "doc_id"):
    """Deterministic per-group cap: within each ``key_col`` group keep
    the ``per_group`` rows with the smallest (md5(id), id) order — a
    language-balanced (or source-balanced) corpus subsample that is
    reproducible on any cluster size. → (id, key).

    Scale shape: per-batch partial head per group (each batch can only
    contribute its own best ``per_group`` rows), so the shuffle carries
    ≤ groups·per_group·nblocks rows; the final per-group merge is tiny.
    """
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.functions.dedup import _md5_u64
    from neo4j_graph_algorithms_ray.util import to_arrow_blocks

    def partial(b: pa.Table) -> pa.Table:
        # Arrow-native per-batch head-per-group (no pandas round-trip):
        # lexsort by (key, md5(id), id), then rank-within-group < cap
        ids = b[id_col].to_numpy(zero_copy_only=False)
        keys = b[key_col].to_numpy(zero_copy_only=False)
        h, inv = _md5_u64(ids.astype(str).astype(object), 15)
        hh = h[inv]
        order = np.lexsort((ids, hh, keys))
        k_s = keys[order]
        first = np.concatenate([[True], k_s[1:] != k_s[:-1]]) \
            if len(k_s) else np.empty(0, bool)
        starts = np.nonzero(first)[0]
        grp = np.cumsum(first) - 1
        rank = np.arange(len(k_s)) - starts[grp] if len(k_s) else first
        sel = order[rank < per_group]
        return pa.table({id_col: pa.array(ids[sel]),
                         key_col: pa.array(keys[sel]),
                         "_h": pa.array(hh[sel])})

    part = docs.select_columns([id_col, key_col]) \
               .map_batches(partial, batch_format="pyarrow")
    out = part.groupby(key_col).map_groups(
        lambda g: g.sort_values(["_h", id_col]).head(per_group),
        batch_format="pandas")
    return to_arrow_blocks(out).select_columns([id_col, key_col])


def inverted_index(docs, *, min_df: int = 2, id_col: str = "doc_id",
                   text_col: str = "text"):
    """Build the inverted index over lowered whitespace tokens →
    (token, df, postings) with postings = comma-joined ascending doc
    ids, tokens with document frequency ≥ ``min_df``. The search-index
    / corpus-audit primitive.

    Scale shape: per-batch distinct (token, doc) explode (a doc never
    spans batches, so batch-local dedup is global), then ONE exchange
    bucketed by token hash — per-bucket vectorized pandas groupby
    builds all posting lists at once (the _bucketed_pairs trick; no
    per-token Ray groupby). At web scale postings for stopword-like
    tokens are df-capped by ``min_df``'s dual: pass a max_df filter
    before emitting if lists must stay bounded.
    """
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.functions.dedup import (
        _dedupe_doc_strings, _token_arrays)
    from neo4j_graph_algorithms_ray.util import to_arrow_blocks

    def explode(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        doc_idx, toks = _token_arrays(b[text_col])
        d, s = _dedupe_doc_strings(doc_idx, toks)
        return pa.table({"token": pa.array(s.astype(object), pa.string()),
                         id_col: ids[d]})

    pairs = docs.map_batches(explode, batch_format="pyarrow")

    def add_bucket(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        df["_bkt"] = (pd.util.hash_array(df["token"].to_numpy())
                      % np.uint64(64)).astype(np.int64)
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # segmented posting-list build, no per-token Python: run-length
        # segments over the (token, id)-sorted frame become a ListArray
        # whose binary_join emits every bucket's postings in one kernel.
        if len(g) == 0:
            return pd.DataFrame({"token": pd.Series(dtype=object),
                                 "df": pd.Series(dtype=np.int64),
                                 "postings": pd.Series(dtype=object)})
        g = g.sort_values(["token", id_col])
        toks = g["token"].to_numpy()
        ids = g[id_col].to_numpy()
        starts = np.flatnonzero(np.concatenate(([True], toks[1:] != toks[:-1])))
        bounds = np.concatenate((starts, [len(toks)]))
        counts = np.diff(bounds)
        lst = pa.ListArray.from_arrays(
            pa.array(bounds.astype(np.int32), pa.int32()),
            pa.array(ids.astype(str), pa.string()))
        postings = pc.binary_join(lst, ",").to_pandas()
        out = pd.DataFrame({"token": toks[starts],
                            "df": counts.astype(np.int64),
                            "postings": postings})
        return out[out["df"] >= min_df].reset_index(drop=True)

    out = pairs.map_batches(add_bucket, batch_format="pyarrow") \
               .groupby("_bkt").map_groups(per_bucket, batch_format="pandas")
    return to_arrow_blocks(out).map_batches(
        lambda b: b.select(["token", "df", "postings"]).cast(
            pa.schema([("token", pa.string()), ("df", pa.int64()),
                       ("postings", pa.string())])),
        batch_format="pyarrow")


def column_histogram(ds, col: str, *, width: float, lo: float = 0.0):
    """Fixed-width histogram of a numeric column → (bucket, n) with
    bucket = floor((x − lo)/width). The distributed profiling primitive
    (exact, unlike sampled quantiles): per-batch bincount partials, one
    tiny combine — no sort, no shuffle of raw values."""
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.util import preagg_sum

    def partial(b: pa.Table) -> pa.Table:
        x = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
        bkt = np.floor((x - lo) / width).astype(np.int64)
        u, n = np.unique(bkt, return_counts=True)
        return pa.table({"bucket": u, "n": n.astype(np.int64)})

    agg = preagg_sum(ds.map_batches(partial, batch_format="pyarrow"),
                     ["bucket"], "n")
    return agg.sort("bucket")


def ngram_topk(docs, *, n: int = 2, topk: int = 100, text_col: str = "text"):
    """Top-k word n-grams by occurrence (the LM-training companion to
    vocab_topk): lowered whitespace tokens joined by single spaces,
    short docs (< n tokens) contributing their full token string —
    word_shingles semantics, so the same vectorized shingle kernel
    serves dedup sketches and n-gram stats. Returns
    (ngram, n_occ, n_docs), ranked (n_occ DESC, ngram ASC)."""
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.functions.dedup import _shingle_arrays
    from neo4j_graph_algorithms_ray.util import preagg_sum

    def partial(b: pa.Table) -> pa.Table:
        doc_idx, grams = _shingle_arrays(b[text_col], n)
        if len(grams) == 0:
            return pa.table({"ngram": pa.array([], pa.string()),
                             "n_occ": pa.array([], pa.int64()),
                             "n_docs": pa.array([], pa.int64())})
        codes, uniq = pd.factorize(grams)
        n_occ = np.bincount(codes, minlength=len(uniq))
        pair = np.unique(doc_idx.astype(np.int64) * len(uniq) + codes)
        n_docs = np.bincount((pair % len(uniq)).astype(np.int64),
                             minlength=len(uniq))
        return pa.table({"ngram": pa.array(uniq, pa.string()),
                         "n_occ": n_occ.astype(np.int64),
                         "n_docs": n_docs.astype(np.int64)})

    agg = preagg_sum(docs.map_batches(partial, batch_format="pyarrow"),
                     ["ngram"], ["n_occ", "n_docs"])
    return agg.sort(["n_occ", "ngram"], descending=[True, False]).limit(topk)


def column_percentiles(ds, col: str, pcts=(25, 50, 75, 90, 99)):
    """Exact percentiles of an integer-valued column without sorting the
    data: per-value histogram partials (map-side combine) plus a tiny
    driver-side cumulative walk. percentile p = smallest value whose
    cumulative count reaches ceil(N·p/100) — the "lower" discrete
    quantile, SQL-reproducible with a windowed running sum."""
    import math

    import pyarrow as pa
    import ray
    import ray.data as rd

    hist = column_histogram(ds, col, width=1.0)
    rows = [t for t in ray.get(hist.to_arrow_refs()) if t.num_rows]
    tbl = pa.concat_tables(rows)
    v = tbl["bucket"].to_numpy(zero_copy_only=False)
    n = tbl["n"].to_numpy(zero_copy_only=False)
    order = np.argsort(v)
    v, n = v[order], n[order]
    cum = np.cumsum(n)
    total = int(cum[-1]) if len(cum) else 0
    out_p, out_v = [], []
    for p in pcts:
        thr = math.ceil(total * p / 100)
        idx = int(np.searchsorted(cum, thr))
        out_p.append(int(p))
        out_v.append(int(v[min(idx, len(v) - 1)]) if total else 0)
    return rd.from_arrow(pa.table({"pct": pa.array(out_p, pa.int64()),
                                   "value": pa.array(out_v, pa.int64())}))


def pmi_topk(docs, *, topk: int = 50, min_count: int = 5,
             text_col: str = "text"):
    """Top-k bigram collocations by pointwise mutual information:
    pmi(x,y) = ln(c_xy·Nt² / (Nb·c_x·c_y)) over STRICT adjacent token
    pairs (docs with ≥2 tokens), floored at ``min_count`` occurrences —
    the classic collocation / multi-word-expression detector for
    tokenizer and phrase-vocabulary curation.

    Scale shape: unigram and bigram counts are map-side-combined
    aggregates; the unigram table is then BROADCAST via ray.put (the
    tfidf DF-table pattern — one object-store copy, no shuffle join)
    into the bigram scoring pass. Ranking is on round(pmi, 6) with
    bigram tie-break so the SQL oracle orders identically.
    """
    import pyarrow as pa
    import ray

    from neo4j_graph_algorithms_ray.functions.dedup import _token_arrays
    from neo4j_graph_algorithms_ray.util import preagg_sum

    def uni_partial(b: pa.Table) -> pa.Table:
        _, toks = _token_arrays(b[text_col])
        if len(toks) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        codes, uniq = pd.factorize(toks)
        return pa.table({"token": pa.array(uniq, pa.string()),
                         "n": np.bincount(codes, minlength=len(uniq))
                                .astype(np.int64)})

    def big_partial(b: pa.Table) -> pa.Table:
        doc_idx, toks = _token_arrays(b[text_col])
        if len(toks) < 2:
            return pa.table({"x": pa.array([], pa.string()),
                             "y": pa.array([], pa.string()),
                             "n_xy": pa.array([], pa.int64())})
        same = doc_idx[:-1] == doc_idx[1:]
        x, y = toks[:-1][same], toks[1:][same]
        pair = np.char.add(np.char.add(x.astype(str), " "), y.astype(str))
        codes, uniq = pd.factorize(pair)
        n = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        sp = np.char.partition(uniq.astype(str), " ")
        return pa.table({"x": pa.array(sp[:, 0]), "y": pa.array(sp[:, 2]),
                         "n_xy": pa.array(n)})

    uni = preagg_sum(docs.map_batches(uni_partial, batch_format="pyarrow"),
                     ["token"], "n").materialize()
    big = preagg_sum(docs.map_batches(big_partial, batch_format="pyarrow"),
                     ["x", "y"], "n_xy").materialize()
    uni_tbls = [t for t in ray.get(uni.to_arrow_refs()) if t.num_rows]
    vocab = pa.concat_tables(uni_tbls)
    nt = int(pc.sum(vocab["n"]).as_py() or 0)
    nb_parts = [int(pc.sum(t["n_xy"]).as_py() or 0)
                for t in ray.get(big.to_arrow_refs()) if t.num_rows]
    nb = sum(nb_parts)
    cnt_map = pd.Series(vocab["n"].to_numpy(zero_copy_only=False),
                        index=pd.Index(vocab["token"].to_pylist()))
    cnt_ref = ray.put(cnt_map)

    def score(b: pa.Table) -> pa.Table:
        cnt = ray.get(cnt_ref)
        keep = b.filter(pc.greater_equal(b["n_xy"], min_count))
        if keep.num_rows == 0:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "n_xy": pa.array([], pa.int64()),
                             "pmi": pa.array([], pa.float64())})
        x = keep["x"].to_pylist()
        y = keep["y"].to_pylist()
        cxy = keep["n_xy"].to_numpy(zero_copy_only=False).astype(np.float64)
        cx = cnt.reindex(x).to_numpy(dtype=np.float64)
        cy = cnt.reindex(y).to_numpy(dtype=np.float64)
        from neo4j_graph_algorithms_ray.util import round6
        pmi = round6(np.log((cxy * nt * nt) / (nb * cx * cy)))
        bigram = [f"{a} {b_}" for a, b_ in zip(x, y)]
        return pa.table({"bigram": pa.array(bigram, pa.string()),
                         "n_xy": keep["n_xy"], "pmi": pa.array(pmi)})

    scored = big.map_batches(score, batch_format="pyarrow")
    return scored.sort(["pmi", "bigram"], descending=[True, False]) \
                 .limit(topk)


def bigram_xent(docs, *, min_count: int = 2, id_col: str = "doc_id",
                text_col: str = "text"):
    """Per-doc bigram-LM cross-entropy — the CCNet / Wenzek et al. 2020
    perplexity-filter signal, self-trained: an add-one-smoothed bigram
    LM with ``<unk>`` folding (vocab = tokens with count ≥
    ``min_count``) is fit on the corpus itself, then every doc scores

        xent(d) = -(1/(T-1)) Σ_{i≥2} log2 P(t_i | t_{i-1}),
        P(y|x)  = (C(x,y) + 1) / (C(x) + V)

    over lowered whitespace tokens (0 for docs with < 2 tokens).
    High xent ≈ incoherent/boilerplate text. → (doc_id, xent).

    Scale shape: pass 1 unigram counts and pass 2 unk-folded bigram
    counts are map-side-combined aggregates (bounded by distinct
    [folded] grams, not corpus size) broadcast once via ``ray.put``
    (the tfidf DF-table pattern); pass 3 scores each doc batch-locally
    with sorted-key searchsorted lookups — no shuffle touches the
    corpus. For open-domain 100 TB text, floor the vocab harder
    (min_count ≥ 100) so the folded bigram table stays worker-heap
    sized; in production CCNet ships a fixed pretrained LM instead,
    which this operator accepts implicitly (pass any dataset as the
    training corpus by composing two calls).
    """
    import pyarrow as pa
    import ray

    from neo4j_graph_algorithms_ray.functions.dedup import _token_arrays
    from neo4j_graph_algorithms_ray.util import collect_arrow, preagg_sum

    def uni_partial(b: pa.Table) -> pa.Table:
        _, toks = _token_arrays(b[text_col])
        if len(toks) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        codes, uniq = pd.factorize(toks)
        return pa.table({"token": pa.array(uniq, pa.string()),
                         "n": np.bincount(codes, minlength=len(uniq))
                                .astype(np.int64)})

    uni = preagg_sum(docs.select_columns([text_col]).map_batches(
        uni_partial, batch_format="pyarrow"), ["token"], "n")
    utabs = [t for t in collect_arrow(uni) if t.num_rows]
    utab = (pa.concat_tables(utabs) if utabs
            else pa.table({"token": pa.array([], pa.string()),
                           "n": pa.array([], pa.int64())}))
    n_arr = utab["n"].to_numpy(zero_copy_only=False)
    keep = n_arr >= min_count
    vocab = pd.Index(np.asarray(utab["token"].to_pylist(), dtype=object)[keep])
    vtot = len(vocab) + 1  # +1: <unk>
    uni_cnt = np.concatenate([n_arr[keep].astype(np.float64),
                              [float(n_arr[~keep].sum())]])  # unk mass last
    vocab_ref = ray.put(vocab)
    uni_ref = ray.put(uni_cnt)

    def _codes(toks) -> np.ndarray:
        voc = ray.get(vocab_ref)
        c = voc.get_indexer(toks)
        c[c < 0] = len(voc)  # fold OOV to <unk>
        return c.astype(np.int64)

    def big_partial(b: pa.Table) -> pa.Table:
        doc_idx, toks = _token_arrays(b[text_col])
        if len(toks) < 2:
            return pa.table({"k": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        c = _codes(toks)
        same = doc_idx[:-1] == doc_idx[1:]
        key = c[:-1][same] * vtot + c[1:][same]
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({"k": pa.array(uk), "n": cnt.astype(np.int64)})

    big = preagg_sum(docs.select_columns([text_col]).map_batches(
        big_partial, batch_format="pyarrow"), ["k"], "n")
    btabs = [t for t in collect_arrow(big) if t.num_rows]
    if btabs:
        bt = pa.concat_tables(btabs)
        bkeys = bt["k"].to_numpy(zero_copy_only=False)
        order = np.argsort(bkeys)
        bkeys = bkeys[order]
        bcnt = bt["n"].to_numpy(zero_copy_only=False)[order].astype(np.float64)
    else:
        bkeys = np.empty(0, np.int64)
        bcnt = np.empty(0, np.float64)
    bkeys_ref, bcnt_ref = ray.put(bkeys), ray.put(bcnt)

    def score(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        doc_idx, toks = _token_arrays(b[text_col])
        xent = np.zeros(b.num_rows, np.float64)
        if len(toks) >= 2:
            uc = ray.get(uni_ref)
            bk, bc = ray.get(bkeys_ref), ray.get(bcnt_ref)
            c = _codes(toks)
            same = doc_idx[:-1] == doc_idx[1:]
            prev, cur, d = c[:-1][same], c[1:][same], doc_idx[:-1][same]
            key = prev * vtot + cur
            cxy = np.zeros(len(key), np.float64)
            if len(bk):
                pos = np.minimum(np.searchsorted(bk, key), len(bk) - 1)
                hit = bk[pos] == key
                cxy[hit] = bc[pos[hit]]
            logp = np.log2((cxy + 1.0) / (uc[prev] + vtot))
            tot = np.bincount(d, weights=-logp, minlength=b.num_rows)
            npair = np.bincount(d, minlength=b.num_rows)
            nz = npair > 0
            xent[nz] = tot[nz] / npair[nz]
        return pa.table({id_col: b[id_col],
                         "xent": pa.array(round6(xent))})

    return docs.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow")


def trigram_xent(docs, *, min_count: int = 2, alpha: float = 0.4,
                 id_col: str = "doc_id", text_col: str = "text"):
    """Per-doc trigram-LM cross-entropy with STUPID BACKOFF (Brants et
    al. 2007 — the web-scale smoothing: no discounting, a fixed
    backoff factor, scores not probabilities). Self-trained with
    ``<unk>`` folding (vocab = tokens with count ≥ ``min_count``):

        S(z|x,y) = C(xyz)/C(xy)          if C(xyz) > 0
                 = α · C(yz)/C(y)        elif C(yz) > 0
                 = α² · C(z)/N           otherwise
        xent(d)  = -(1/(T-2)) Σ_{i≥3} log2 S(t_i | t_{i-2}, t_{i-1})

    over lowered whitespace tokens (0 for docs with < 3 tokens; folded
    C(z) > 0 always since scoring corpus = training corpus).
    → (doc_id, xent). Scale shape identical to :func:`bigram_xent`:
    three map-side-combined count aggregates (bounded by distinct
    folded grams) broadcast once via ``ray.put``, then batch-local
    sorted-key searchsorted scoring — no shuffle touches the corpus.
    Floor the vocab hard (min_count ≥ 100) at open-domain scale so the
    folded trigram table stays worker-heap sized. Oracle:
    trigram_xent_sql mirrors fold, backoff chain, and α."""
    import pyarrow as pa
    import ray

    from neo4j_graph_algorithms_ray.functions.dedup import _token_arrays
    from neo4j_graph_algorithms_ray.util import collect_arrow, preagg_sum

    def uni_partial(b: pa.Table) -> pa.Table:
        _, toks = _token_arrays(b[text_col])
        if len(toks) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        codes, uniq = pd.factorize(toks)
        return pa.table({"token": pa.array(uniq, pa.string()),
                         "n": np.bincount(codes, minlength=len(uniq))
                                .astype(np.int64)})

    uni = preagg_sum(docs.select_columns([text_col]).map_batches(
        uni_partial, batch_format="pyarrow"), ["token"], "n")
    utabs = [t for t in collect_arrow(uni) if t.num_rows]
    utab = (pa.concat_tables(utabs) if utabs
            else pa.table({"token": pa.array([], pa.string()),
                           "n": pa.array([], pa.int64())}))
    n_arr = utab["n"].to_numpy(zero_copy_only=False)
    keep = n_arr >= min_count
    vocab = pd.Index(np.asarray(utab["token"].to_pylist(), dtype=object)[keep])
    vtot = len(vocab) + 1  # +1: <unk>
    if vtot ** 3 >= 2 ** 62:  # packed int64 trigram keys would overflow
        raise ValueError(
            f"trigram_xent: folded vocab {vtot} too large for packed "
            f"int64 keys — raise min_count (Brants-scale corpora floor "
            f"the vocab aggressively anyway)")
    uni_cnt = np.concatenate([n_arr[keep].astype(np.float64),
                              [float(n_arr[~keep].sum())]])  # unk mass last
    n_total = float(uni_cnt.sum())
    vocab_ref = ray.put(vocab)
    uni_ref = ray.put(uni_cnt)

    def _codes(toks) -> np.ndarray:
        voc = ray.get(vocab_ref)
        c = voc.get_indexer(toks)
        c[c < 0] = len(voc)  # fold OOV to <unk>
        return c.astype(np.int64)

    def gram_partial(order: int):
        def part(b: pa.Table) -> pa.Table:
            doc_idx, toks = _token_arrays(b[text_col])
            if len(toks) < order:
                return pa.table({"k": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64())})
            c = _codes(toks)
            key = c[:len(c) - order + 1].copy()
            same = np.ones(len(key), dtype=bool)
            for j in range(1, order):
                sl = slice(j, len(c) - order + 1 + j)
                key = key * vtot + c[sl]
                same &= doc_idx[:len(key)] == doc_idx[sl]
            uk, cnt = np.unique(key[same], return_counts=True)
            return pa.table({"k": pa.array(uk),
                             "n": cnt.astype(np.int64)})
        return part

    def _collect_sorted(order: int):
        g = preagg_sum(docs.select_columns([text_col]).map_batches(
            gram_partial(order), batch_format="pyarrow"), ["k"], "n")
        tabs = [t for t in collect_arrow(g) if t.num_rows]
        if not tabs:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        t = pa.concat_tables(tabs)
        k = t["k"].to_numpy(zero_copy_only=False)
        order_ix = np.argsort(k)
        return (k[order_ix],
                t["n"].to_numpy(zero_copy_only=False)[order_ix]
                 .astype(np.float64))

    bk, bc = _collect_sorted(2)
    tk, tc = _collect_sorted(3)
    bk_ref, bc_ref = ray.put(bk), ray.put(bc)
    tk_ref, tc_ref = ray.put(tk), ray.put(tc)

    def _lookup(keys, sk, sc_):
        out = np.zeros(len(keys), np.float64)
        if len(sk) and len(keys):
            pos = np.minimum(np.searchsorted(sk, keys), len(sk) - 1)
            hit = sk[pos] == keys
            out[hit] = sc_[pos[hit]]
        return out

    def score(b: pa.Table) -> pa.Table:
        doc_idx, toks = _token_arrays(b[text_col])
        xent = np.zeros(b.num_rows, np.float64)
        if len(toks) >= 3:
            uc = ray.get(uni_ref)
            sbk, sbc = ray.get(bk_ref), ray.get(bc_ref)
            stk, stc = ray.get(tk_ref), ray.get(tc_ref)
            c = _codes(toks)
            x, y, z = c[:-2], c[1:-1], c[2:]
            d0, d1, d2 = doc_idx[:-2], doc_idx[1:-1], doc_idx[2:]
            same = (d0 == d1) & (d1 == d2)
            x, y, z, d = x[same], y[same], z[same], d0[same]
            kxy, kyz = x * vtot + y, y * vtot + z
            kxyz = kxy * vtot + z
            cxyz = _lookup(kxyz, stk, stc)
            cxy = _lookup(kxy, sbk, sbc)
            cyz = _lookup(kyz, sbk, sbc)
            s = np.where(
                cxyz > 0, cxyz / np.maximum(cxy, 1.0),
                np.where(cyz > 0, alpha * cyz / uc[y],
                         alpha * alpha * uc[z] / n_total))
            logp = np.log2(s)
            tot = np.bincount(d, weights=-logp, minlength=b.num_rows)
            ntri = np.bincount(d, minlength=b.num_rows)
            nz = ntri > 0
            xent[nz] = tot[nz] / ntri[nz]
        return pa.table({id_col: b[id_col],
                         "xent": pa.array(round6(xent))})

    return docs.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow")


def hash_features(docs, *, dims: int = 256, id_col: str = "doc_id",
                  text_col: str = "text"):
    """Hashing-trick featurizer (Weinberger et al. 2009): each doc's
    lowered whitespace tokens fold into a ``dims``-bucket sparse count
    vector via the md5-pinned hash → (doc_id, feature, n), one row per
    non-zero cell. The fixed-dimension text-vectorization step for
    downstream ML (classifiers, dedup prefilters) — no vocabulary
    table, so no shuffle and no broadcast at any corpus size.

    Scale shape: entirely per-batch (a doc never spans batches);
    factorize + bincount on (doc, feature) codes, zero exchange."""
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.functions.dedup import (_md5_u64,
                                                            _token_arrays)

    def partial(b: pa.Table) -> pa.Table:
        doc_idx, toks = _token_arrays(b[text_col])
        ids = b[id_col]
        if len(toks) == 0:
            return pa.table({id_col: ids.slice(0, 0),
                             "feature": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        h, inv = _md5_u64(toks, 15)
        feat = (h[inv] % dims).astype(np.int64)
        key = doc_idx.astype(np.int64) * dims + feat
        uniq, counts = np.unique(key, return_counts=True)
        return pa.table({
            id_col: ids.take(pa.array(uniq // dims)),
            "feature": pa.array(uniq % dims),
            "n": pa.array(counts.astype(np.int64))})

    return docs.map_batches(partial, batch_format="pyarrow") \
               .sort([id_col, "feature"])


# ---------------- decontamination / PII scan ----------------

def decontaminate(docs, eval_docs, *, k: int = 3, min_overlap: int = 1,
                  id_col: str = "doc_id", text_col: str = "text"):
    """Benchmark decontamination: training docs sharing ≥ ``min_overlap``
    distinct word-k-grams with ANY eval-set document →
    (doc_id, overlap) — the docs a training run must drop.

    100 TB shape: the EVAL side is small (benchmarks are thousands of
    docs) — its distinct shingle set broadcasts once via ``ray.put``
    and each training batch probes it with one Arrow hash ``is_in``
    over its flat shingle array + a bincount; the training corpus
    streams, nothing shuffles."""
    import ray

    from neo4j_graph_algorithms_ray.functions.dedup import (
        _dedupe_doc_strings, _shingle_arrays)

    ev = pa.concat_tables(
        eval_docs.select_columns([text_col])
                 .map_batches(lambda b: b.select([text_col]),
                              batch_format="pyarrow")
                 .iter_batches(batch_format="pyarrow", batch_size=1 << 20))
    _, ev_sh = _shingle_arrays(ev[text_col].combine_chunks(), k)
    ev_set = ray.put(pa.array(sorted(set(ev_sh.tolist()))))

    def probe(batch: pa.Table) -> pa.Table:
        doc_idx, sh = _dedupe_doc_strings(
            *_shingle_arrays(batch[text_col], k))
        n = batch.num_rows
        if len(sh) == 0:
            return pa.table({id_col: batch[id_col].slice(0, 0),
                             "overlap": pa.array([], pa.int64())})
        hit = pc.is_in(pa.array(sh, pa.string()), value_set=ray.get(ev_set)) \
                .to_numpy(zero_copy_only=False)
        ov = np.bincount(doc_idx[hit], minlength=n).astype(np.int64)
        keep = ov >= min_overlap
        idx = pa.array(np.nonzero(keep)[0])
        return pa.table({id_col: batch[id_col].take(idx),
                         "overlap": pa.array(ov[keep])})

    return docs.map_batches(probe, batch_format="pyarrow")


PII_PATTERNS = {
    # RE2-safe (no lookaround); counts are per occurrence
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9()\-\s]{7,}[0-9]",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def pii_counts(docs, *, id_col: str = "doc_id", text_col: str = "text"):
    """Per-doc PII-pattern occurrence counts (email / phone / ipv4) —
    the safety-filter stage of a corpus pipeline. One vectorized RE2
    ``count_substring_regex`` per pattern per batch; zero per-row
    Python."""
    def scan(batch: pa.Table) -> pa.Table:
        txt = _text_column(batch, text_col)
        cols = {id_col: batch[id_col]}
        for name, pat in PII_PATTERNS.items():
            cols[f"n_{name}"] = pc.cast(
                pc.count_substring_regex(txt, pat), pa.int64())
        return pa.table(cols)

    return docs.map_batches(scan, batch_format="pyarrow")


# ---------------- corpus line-level dedup (CCNet-style) ----------------

def _split_lines(txt) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Arrow-native line split of a string column → (flat_lines
    pa.Array, doc_idx int64[], n_lines int64[]). Every doc yields ≥ 1
    line (empty text → one '' line — same as DuckDB string_split)."""
    parts = pc.split_pattern(txt, "\n")
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    flat = parts.flatten()
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    counts = np.diff(parts.offsets.to_numpy(zero_copy_only=False)).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    return flat, doc_idx, counts


def _line_hashes(flat: pa.Array) -> np.ndarray:
    """Deterministic 64-bit hash per line (pandas siphash — vectorized,
    fixed key, stable across processes). Internal keys only: the
    operator's OUTPUT is text, so a 2^-64 collision is the only failure
    mode — the standard large-corpus dedup tradeoff."""
    s = flat.to_numpy(zero_copy_only=False)
    return pd.util.hash_array(s).view(np.int64)


def line_dedup(docs, *, min_count: int = 2, id_col: str = "doc_id",
               text_col: str = "text", bcast_limit: int | None = None,
               num_partitions: int = 32, nbuckets: int = 64):
    """Corpus-level line deduplication — the CCNet / RefinedWeb
    boilerplate-removal stage: any exact line occurring ≥ ``min_count``
    times ACROSS THE CORPUS is removed from every document. Returns
    (id_col, text_col) with each doc's surviving lines joined by
    ``\\n``; documents with no surviving line (pure boilerplate) are
    dropped.

    100 TB shape: pass 1 streams the corpus once — per-batch
    (line-hash, count) partials into a map-side-combined groupby whose
    output is bounded by the number of DISTINCT duplicated lines, not
    corpus size. Pass 2 streams the corpus again (re-read beats pinning
    100 TB in the object store) and rebuilds each doc batch-locally.
    The duplicated-line set broadcasts once via ``ray.put`` (8 B/line)
    when ≤ ``bcast_limit`` (default NGA_LINE_BCAST_LIMIT = 20M ≈
    160 MB); above that the same semantics run shuffle-side: explode →
    left-anti hash join on line hash → doc-bucketed vectorized
    reassembly (one segmented binary_join per bucket, no per-doc
    Python). Regime parity is pinned by test_line_dedup_regime_parity.
    """
    import os

    import ray

    from neo4j_graph_algorithms_ray.util import (preagg_sum, safe_join,
                                                 to_arrow_blocks)

    def count_partial(b: pa.Table) -> pa.Table:
        flat, _, _ = _split_lines(_text_column(b, text_col))
        if len(flat) == 0:
            return pa.table({"h": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        uniq, cnt = np.unique(_line_hashes(flat), return_counts=True)
        return pa.table({"h": pa.array(uniq),
                         "n": pa.array(cnt.astype(np.int64))})

    dup = preagg_sum(docs.map_batches(count_partial, batch_format="pyarrow"),
                     ["h"], "n") \
        .map_batches(lambda b: b.filter(
            pc.greater_equal(b["n"], min_count)).select(["h"]),
            batch_format="pyarrow") \
        .materialize()

    limit = (bcast_limit if bcast_limit is not None
             else int(os.environ.get("NGA_LINE_BCAST_LIMIT", 20_000_000)))
    if dup.count() <= limit:
        tabs = [t for t in ray.get(dup.to_arrow_refs()) if t.num_rows]
        hs = (np.sort(np.concatenate(
            [t["h"].to_numpy(zero_copy_only=False) for t in tabs]))
            if tabs else np.empty(0, np.int64))
        ref = ray.put(hs)

        def rebuild(b: pa.Table) -> pa.Table:
            flat, doc_idx, _ = _split_lines(_text_column(b, text_col))
            dupset = ray.get(ref)  # local plasma, zero-copy numpy
            h = _line_hashes(flat)
            if len(dupset) and len(h):
                pos = np.minimum(np.searchsorted(dupset, h),
                                 len(dupset) - 1)
                keep = dupset[pos] != h
            else:
                keep = np.ones(len(h), dtype=bool)
            nrows = b.num_rows
            kept_per_doc = np.bincount(doc_idx[keep], minlength=nrows)
            offsets = np.zeros(nrows + 1, dtype=np.int32)
            np.cumsum(kept_per_doc, out=offsets[1:])
            kept_lines = flat.filter(pa.array(keep))
            if isinstance(kept_lines, pa.ChunkedArray):
                kept_lines = kept_lines.combine_chunks()
            lst = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                           kept_lines)
            text = pc.binary_join(lst, "\n")
            mask = pa.array(kept_per_doc > 0)
            return pa.table({id_col: b[id_col].filter(mask),
                             text_col: text.filter(mask)})

        return docs.map_batches(rebuild, batch_format="pyarrow")

    # shuffle regime: the dup set is too large to broadcast
    def explode(b: pa.Table) -> pa.Table:
        flat, doc_idx, n_lines = _split_lines(_text_column(b, text_col))
        starts = np.repeat(np.cumsum(n_lines) - n_lines, n_lines)
        line_no = np.arange(len(doc_idx), dtype=np.int64) - starts
        return pa.table({id_col: b[id_col].take(pa.array(doc_idx)),
                         "line_no": pa.array(line_no),
                         "ln": flat,
                         "h": pa.array(_line_hashes(flat))})

    lines = docs.map_batches(explode, batch_format="pyarrow")
    dupm = dup.map_batches(
        lambda b: b.append_column(
            "_dup", pa.array(np.ones(b.num_rows, dtype=np.int8))),
        batch_format="pyarrow")
    joined = safe_join(lines, dupm, "left_outer", num_partitions, on=("h",))

    def keep_unmarked(b: pa.Table) -> pd.DataFrame:
        t = b.filter(pc.is_null(b["_dup"])).select([id_col, "line_no", "ln"])
        df = t.to_pandas()
        df["_bkt"] = (pd.util.hash_array(df[id_col].to_numpy())
                      % np.uint64(nbuckets)).astype(np.int64)
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({id_col: g[id_col] if id_col in g else
                                 pd.Series(dtype=object),
                                 text_col: pd.Series(dtype=object)})
        g = g.sort_values([id_col, "line_no"])
        codes, uniq = pd.factorize(g[id_col].to_numpy())  # sorted order
        cnt = np.bincount(codes)
        bounds = np.concatenate(([0], np.cumsum(cnt))).astype(np.int32)
        lst = pa.ListArray.from_arrays(
            pa.array(bounds, pa.int32()),
            pa.array(g["ln"].to_numpy(), pa.string()))
        return pd.DataFrame({id_col: uniq,
                             text_col: pc.binary_join(lst, "\n").to_pandas()})

    out = joined.map_batches(keep_unmarked, batch_format="pyarrow") \
                .groupby("_bkt").map_groups(per_bucket, batch_format="pandas")
    return to_arrow_blocks(out).map_batches(
        lambda b: b.select([id_col, text_col]), batch_format="pyarrow")


def _mix_gh(gh: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Mix a group hash and a line hash into one 64-bit key (Fibonacci
    multiply + xor). Internal membership keys only — same collision
    contract as :func:`_line_hashes`."""
    return ((gh.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
            ^ h.view(np.uint64)).view(np.int64)


def boilerplate_strip(docs, *, frac: float = 0.2, min_docs: int = 2,
                      group_col: str = "source", id_col: str = "doc_id",
                      text_col: str = "text", bcast_limit: int | None = None,
                      num_partitions: int = 32, nbuckets: int = 64):
    """Per-group boilerplate-line removal — the within-host nav/footer
    stage (boilerpipe/trafilatura semantics at corpus scale): a line is
    boilerplate FOR A GROUP (host / source) when it occurs in ≥
    max(``min_docs``, ceil(``frac`` · group-doc-count)) distinct
    documents of that group, and is stripped only from that group's
    documents. Distinct from corpus-global :func:`line_dedup`: a line
    shared across many hosts but rare within each survives here, and
    the threshold scales with host size. Returns (id_col, text_col)
    with surviving lines joined by ``\\n``; documents with no surviving
    line are dropped.

    100 TB shape: pass 1 streams the corpus once emitting per-batch
    (group-hash, line-hash, doc-count) partials — map-side combined,
    distinct-doc counting is exact because a document occupies exactly
    one row, so per-batch per-doc uniqueness suffices. Group document
    totals are a second tiny aggregate, joined on group hash (a proper
    shuffle join — hosts can be 100M+). Pass 2 streams the corpus
    again and rebuilds each batch locally against the boilerplate set:
    broadcast once via ``ray.put`` when ≤ NGA_LINE_BCAST_LIMIT mixed
    keys, else the same semantics run shuffle-side (explode →
    anti-join on (gh, h) → bucketed segmented reassembly — the
    line_dedup machinery keyed per group). Beyond-reference corpus
    operator; oracle: BOILERPLATE_STRIP_SQL mirrors construction,
    threshold, and drop semantics."""
    import os

    import ray

    from neo4j_graph_algorithms_ray.util import (preagg_sum, safe_join,
                                                 to_arrow_blocks)

    def count_partial(b: pa.Table) -> pa.Table:
        flat, doc_idx, _ = _split_lines(_text_column(b, text_col))
        if len(flat) == 0:
            return pa.table({"gh": pa.array([], pa.int64()),
                             "h": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        ghr = _line_hashes(b[group_col].cast(pa.string()).combine_chunks()
                           if isinstance(b[group_col], pa.ChunkedArray)
                           else b[group_col].cast(pa.string()))
        h = _line_hashes(flat)
        pairs = np.stack([ghr[doc_idx], h, doc_idx], axis=1)
        # one row per doc → distinct (doc, line) within the batch IS
        # distinct corpus-wide; collapse repeats of a line inside a doc
        uniq = np.unique(pairs, axis=0)
        gl = uniq[:, :2]
        key, cnt = np.unique(gl, axis=0, return_counts=True)
        return pa.table({"gh": pa.array(key[:, 0]),
                         "h": pa.array(key[:, 1]),
                         "n": pa.array(cnt.astype(np.int64))})

    def total_partial(b: pa.Table) -> pa.Table:
        ghr = _line_hashes(b[group_col].cast(pa.string()).combine_chunks()
                           if isinstance(b[group_col], pa.ChunkedArray)
                           else b[group_col].cast(pa.string()))
        key, cnt = np.unique(ghr, return_counts=True)
        return pa.table({"gh": pa.array(key),
                         "nd": pa.array(cnt.astype(np.int64))})

    counts = preagg_sum(docs.map_batches(count_partial,
                                         batch_format="pyarrow"),
                        ["gh", "h"], "n")
    totals = preagg_sum(docs.map_batches(total_partial,
                                         batch_format="pyarrow"),
                        ["gh"], "nd")

    def threshold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"gh": pa.array([], pa.int64()),
                             "h": pa.array([], pa.int64())})
        need = np.maximum(min_docs, np.ceil(
            frac * b["nd"].to_numpy(zero_copy_only=False)).astype(np.int64))
        keep = b["n"].to_numpy(zero_copy_only=False) >= need
        return b.filter(pa.array(keep)).select(["gh", "h"])

    boiler = safe_join(counts, totals, "inner", num_partitions,
                       on=("gh",)) \
        .map_batches(threshold, batch_format="pyarrow").materialize()

    limit = (bcast_limit if bcast_limit is not None
             else int(os.environ.get("NGA_LINE_BCAST_LIMIT", 20_000_000)))
    if boiler.count() <= limit:
        tabs = [t for t in ray.get(boiler.to_arrow_refs()) if t.num_rows]
        ks = (np.sort(np.concatenate(
            [_mix_gh(t["gh"].to_numpy(zero_copy_only=False),
                     t["h"].to_numpy(zero_copy_only=False)) for t in tabs]))
            if tabs else np.empty(0, np.int64))
        ref = ray.put(ks)

        def rebuild(b: pa.Table) -> pa.Table:
            flat, doc_idx, _ = _split_lines(_text_column(b, text_col))
            bset = ray.get(ref)  # local plasma, zero-copy numpy
            ghr = _line_hashes(b[group_col].cast(pa.string()).combine_chunks()
                               if isinstance(b[group_col], pa.ChunkedArray)
                               else b[group_col].cast(pa.string()))
            k = _mix_gh(ghr[doc_idx], _line_hashes(flat))
            if len(bset) and len(k):
                pos = np.minimum(np.searchsorted(bset, k), len(bset) - 1)
                keep = bset[pos] != k
            else:
                keep = np.ones(len(k), dtype=bool)
            nrows = b.num_rows
            kept_per_doc = np.bincount(doc_idx[keep], minlength=nrows)
            offsets = np.zeros(nrows + 1, dtype=np.int32)
            np.cumsum(kept_per_doc, out=offsets[1:])
            kept_lines = flat.filter(pa.array(keep))
            if isinstance(kept_lines, pa.ChunkedArray):
                kept_lines = kept_lines.combine_chunks()
            lst = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                           kept_lines)
            text = pc.binary_join(lst, "\n")
            mask = pa.array(kept_per_doc > 0)
            return pa.table({id_col: b[id_col].filter(mask),
                             text_col: text.filter(mask)})

        return docs.map_batches(rebuild, batch_format="pyarrow")

    # shuffle regime: boilerplate set too large to broadcast — same
    # anti-join + bucketed reassembly as line_dedup, keyed (gh, h)
    def explode(b: pa.Table) -> pa.Table:
        flat, doc_idx, n_lines = _split_lines(_text_column(b, text_col))
        ghr = _line_hashes(b[group_col].cast(pa.string()).combine_chunks()
                           if isinstance(b[group_col], pa.ChunkedArray)
                           else b[group_col].cast(pa.string()))
        starts = np.repeat(np.cumsum(n_lines) - n_lines, n_lines)
        line_no = np.arange(len(doc_idx), dtype=np.int64) - starts
        return pa.table({id_col: b[id_col].take(pa.array(doc_idx)),
                         "line_no": pa.array(line_no),
                         "ln": flat,
                         "gh": pa.array(ghr[doc_idx]),
                         "h": pa.array(_line_hashes(flat))})

    lines = docs.map_batches(explode, batch_format="pyarrow")
    marks = boiler.map_batches(
        lambda b: b.append_column(
            "_dup", pa.array(np.ones(b.num_rows, dtype=np.int8))),
        batch_format="pyarrow")
    joined = safe_join(lines, marks, "left_outer", num_partitions,
                       on=("gh", "h"))

    def keep_unmarked(b: pa.Table) -> pd.DataFrame:
        t = b.filter(pc.is_null(b["_dup"])).select([id_col, "line_no", "ln"])
        df = t.to_pandas()
        df["_bkt"] = (pd.util.hash_array(df[id_col].to_numpy())
                      % np.uint64(nbuckets)).astype(np.int64)
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({id_col: pd.Series(dtype=np.int64),
                                 text_col: pd.Series(dtype=object)})
        g = g.sort_values([id_col, "line_no"])
        codes, uniq = pd.factorize(g[id_col].to_numpy())  # sorted order
        cnt = np.bincount(codes)
        bounds = np.concatenate(([0], np.cumsum(cnt))).astype(np.int32)
        lst = pa.ListArray.from_arrays(
            pa.array(bounds, pa.int32()),
            pa.array(g["ln"].to_numpy(), pa.string()))
        return pd.DataFrame({id_col: uniq,
                             text_col: pc.binary_join(lst, "\n").to_pandas()})

    out = joined.map_batches(keep_unmarked, batch_format="pyarrow") \
                .groupby("_bkt").map_groups(per_bucket, batch_format="pandas")
    return to_arrow_blocks(out).map_batches(
        lambda b: b.select([id_col, text_col]), batch_format="pyarrow")


def _raw_token_arrays(txt) -> tuple[np.ndarray, object, np.ndarray]:
    """Case-preserving whitespace tokenize → (doc_idx int64[], flat
    token pa.Array, tokens_per_doc int64[]). Empty/whitespace-only
    docs contribute zero tokens."""
    t = pc.utf8_trim_whitespace(pc.fill_null(txt.cast(pa.string()), ""))
    parts = pc.utf8_split_whitespace(t)
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    flat = parts.flatten()
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    counts = np.diff(parts.offsets.to_numpy(zero_copy_only=False)).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    # trimmed-empty doc → [''] from split; drop the phantom token
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    if not keep.all():
        drop_doc = doc_idx[~keep]
        counts = counts - np.bincount(drop_doc, minlength=len(counts))
        doc_idx = doc_idx[keep]
        flat = flat.filter(pa.array(keep))
    return doc_idx, flat, counts


_SPAN_C = np.uint64(0x9E3779B97F4A7C15)


def _window_hashes(flat, doc_idx: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """u64 hash of every in-doc k-token window → (window_hashes,
    global start indices into flat). Polynomial combine of per-token
    siphashes (wraparound u64): equal windows always collide, unequal
    ones at ~2^-64 — the standard large-corpus dedup tradeoff."""
    n = len(doc_idx)
    if n < k:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    t64 = pd.util.hash_array(flat.to_numpy(zero_copy_only=False))
    m = n - k + 1
    w = np.zeros(m, np.uint64)
    c = np.uint64(1)
    with np.errstate(over="ignore"):  # u64 wraparound is the hash
        for j in range(k):
            w += t64[j:j + m] * c
            c = c * _SPAN_C
    valid = doc_idx[:m] == doc_idx[k - 1:]
    return w[valid], np.flatnonzero(valid).astype(np.int64)


def span_dedup(docs, *, k: int = 5, min_count: int = 2,
               id_col: str = "doc_id", text_col: str = "text",
               bcast_limit: int | None = None):
    """Duplicate-span removal — the exact-substring dedup stage of
    *Deduplicating Training Data Makes Language Models Better* (Lee et
    al. 2022) at k-token-window granularity: every k-gram occurring
    ≥ ``min_count`` times across the corpus marks its k token
    positions; marked tokens are removed from every doc. Returns
    (id_col, text_col, n_dropped) with surviving tokens joined by a
    single space; every input doc keeps its row (possibly with ''
    text). Case-sensitive, whitespace-normalizing.

    100 TB shape: pass 1 streams the corpus once emitting per-batch
    (window-hash, count) partials into a map-side-combined groupby —
    output bounded by distinct DUPLICATED windows, not corpus size.
    The dup set broadcasts once via ``ray.put`` (8 B/window, default
    cap NGA_SPAN_BCAST_LIMIT = 20M ≈ 160 MB); pass 2 re-streams the
    corpus and rewrites each doc batch-locally (sliding-window cover
    via a diff/cumsum mask, segmented binary_join rebuild — no per-doc
    Python). Above the cap it raises loudly with the partitioned
    escape hatch (shard the corpus by doc hash and run per shard with
    a shared pass-1 count) rather than silently shipping a multi-GB
    set to every worker.
    """
    import os

    import ray

    from neo4j_graph_algorithms_ray.util import collect_arrow, preagg_sum

    def count_partial(b: pa.Table) -> pa.Table:
        doc_idx, flat, _ = _raw_token_arrays(b[text_col])
        w, _ = _window_hashes(flat, doc_idx, k)
        if len(w) == 0:
            return pa.table({"h": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        uniq, cnt = np.unique(w, return_counts=True)
        return pa.table({"h": pa.array(uniq.view(np.int64)),
                         "n": pa.array(cnt.astype(np.int64))})

    dup = preagg_sum(docs.select_columns([text_col]).map_batches(
        count_partial, batch_format="pyarrow"), ["h"], "n") \
        .map_batches(lambda b: b.filter(
            pc.greater_equal(b["n"], min_count)).select(["h"]),
            batch_format="pyarrow") \
        .materialize()

    limit = (bcast_limit if bcast_limit is not None
             else int(os.environ.get("NGA_SPAN_BCAST_LIMIT", 20_000_000)))
    n_dup = dup.count()
    if n_dup > limit:
        raise RuntimeError(
            f"span_dedup: {n_dup} distinct duplicated {k}-gram windows "
            f"exceed the broadcast cap {limit} (~{8 * limit >> 20} MB). "
            "Shard the corpus by doc-id hash and run span_dedup per "
            "shard against the shared pass-1 counts, or raise "
            "NGA_SPAN_BCAST_LIMIT if workers have the heap.")
    tabs = [t for t in collect_arrow(dup) if t.num_rows]
    hs = (np.sort(np.concatenate(
        [t["h"].to_numpy(zero_copy_only=False) for t in tabs]).view(np.uint64))
        if tabs else np.empty(0, np.uint64))
    ref = ray.put(hs)

    def rewrite(b: pa.Table) -> pa.Table:
        doc_idx, flat, counts = _raw_token_arrays(b[text_col])
        dupset = ray.get(ref)  # local plasma, zero-copy numpy
        w, starts = _window_hashes(flat, doc_idx, k)
        covered = np.zeros(len(doc_idx), dtype=bool)
        if len(w) and len(dupset):
            pos = np.minimum(np.searchsorted(dupset, w), len(dupset) - 1)
            s = starts[dupset[pos] == w]
            delta = np.zeros(len(doc_idx) + 1, np.int64)
            np.add.at(delta, s, 1)
            np.add.at(delta, s + k, -1)
            covered = np.cumsum(delta[:-1]) > 0
        keep = ~covered
        nrows = b.num_rows
        kept_per_doc = (np.bincount(doc_idx[keep], minlength=nrows)
                        if len(doc_idx) else np.zeros(nrows, np.int64))
        offsets = np.zeros(nrows + 1, dtype=np.int32)
        np.cumsum(kept_per_doc, out=offsets[1:])
        kept_toks = flat.filter(pa.array(keep)) if len(doc_idx) else flat
        if isinstance(kept_toks, pa.ChunkedArray):
            kept_toks = kept_toks.combine_chunks()
        lst = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                       kept_toks)
        return pa.table({
            id_col: b[id_col],
            text_col: pc.binary_join(lst, " "),
            "n_dropped": pa.array(counts - kept_per_doc, pa.int64())})

    return docs.select_columns([id_col, text_col]).map_batches(
        rewrite, batch_format="pyarrow")


def corpus_clean(docs, *, langs=("en",), min_tokens: int = 8,
                 min_stopword_ratio: float = 0.0, line_min_count: int = 3,
                 id_col: str = "doc_id", text_col: str = "text",
                 bcast_limit: int | None = None):
    """End-to-end corpus cleaning — the composed pipeline a training-data
    run executes over every crawled document:

    1. language + quality gate: per-batch LangId/QualityScore kernels,
       keep docs with pred_lang ∈ ``langs``, n_tokens ≥ ``min_tokens``,
       stopword_ratio ≥ ``min_stopword_ratio`` (zero shuffle);
    2. corpus line-level dedup (:func:`line_dedup`) over the survivors
       with ``line_min_count``;
    3. exact-duplicate collapse: one min-id representative per distinct
       cleaned text.

    Returns the cleaned (id, text) corpus. Stage-3 shape: the winner
    table is (hash → min id) via map-side-combined ``preagg_min`` —
    bounded by distinct cleaned texts — then a doc-id semi-join
    (broadcast below the cap, hash-shuffle above) keeps the winners'
    rows, so full document text never becomes a shuffle key. The
    cleaned corpus materializes once between stages 2 and 3 (it is the
    pipeline product and strictly smaller than the input; line_dedup
    already streams the raw corpus twice)."""
    from neo4j_graph_algorithms_ray.util import broadcast_join, preagg_min

    qs = QualityScore(id_col, text_col)
    li = LangId(id_col, text_col)
    lang_list = list(langs)

    def gate(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.select([id_col, text_col])
        q, lang = qs(b), li(b)
        keep = ((q["n_tokens"].to_numpy(zero_copy_only=False) >= min_tokens)
                & (q["stopword_ratio"].to_numpy(zero_copy_only=False)
                   >= min_stopword_ratio)
                & np.isin(lang["pred_lang"].to_numpy(zero_copy_only=False),
                          lang_list))
        return b.select([id_col, text_col]).filter(pa.array(keep))

    survivors = docs.map_batches(gate, batch_format="pyarrow")
    cleaned = line_dedup(survivors, min_count=line_min_count, id_col=id_col,
                         text_col=text_col, bcast_limit=bcast_limit) \
        .materialize()

    def hpart(b: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            _text_column(b, text_col).to_numpy(zero_copy_only=False)) \
            .view(np.int64)
        return pa.table({"h": pa.array(h), id_col: b[id_col]})

    winners = preagg_min(
        cleaned.map_batches(hpart, batch_format="pyarrow"), ["h"], id_col) \
        .map_batches(lambda b: b.select([id_col]), batch_format="pyarrow")
    return broadcast_join(cleaned, winners, on=id_col)


def nb_quality_score(docs, *, min_words: int = 40, min_stop_hits: int = 1,
                     id_col: str = "doc_id", text_col: str = "text"):
    """Self-distilled quality classifier — the GPT-3 / CCNet recipe
    (Brown et al. 2020 §A; Wenzek et al. 2020): label each doc with a
    cheap rule (here: n_words ≥ ``min_words`` AND distinct Gopher
    stopwords present ≥ ``min_stop_hits``), train a multinomial Naive
    Bayes over lowered whitespace tokens on those labels, then score
    every doc with the smoothed log-odds

        log_odds(d) = log2((D⁺+1)/(D⁻+1))
                      + Σ_t [log2((C(t,+)+1)/(N⁺+V)) −
                             log2((C(t,−)+1)/(N⁻+V))]

    (occurrences with multiplicity, Laplace-smoothed, V = corpus
    vocabulary size). → (doc_id, label, log_odds, pred) with pred =
    log_odds > 0. The learned score generalizes beyond the rule — the
    standard quality-filter signal for pretraining-corpus selection.

    Scale shape: pass 1 emits per-batch (token, cls) count partials —
    map-side combined (``preagg_sum``), bounded by 2 × vocab, never by
    corpus size — plus a two-row class-prior aggregate; the weight
    table ships once via ``ray.put`` (the tfidf DF-table pattern);
    pass 2 scores each batch locally with an index lookup + weighted
    bincount. No shuffle touches the corpus. For open-domain 100 TB
    text, floor the vocab (min_df) before weighting so the broadcast
    stays worker-heap sized.
    """
    import pyarrow as pa
    import ray

    from neo4j_graph_algorithms_ray.functions.dedup import _token_arrays
    from neo4j_graph_algorithms_ray.util import collect_arrow, preagg_sum

    def _labels(b: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(doc_idx, toks, label bool[]) for one batch."""
        doc_idx, toks = _token_arrays(b[text_col])
        ndocs = b.num_rows
        n_tok = np.bincount(doc_idx, minlength=ndocs).astype(np.int64)
        hit = pc.is_in(pa.array(toks, pa.string()),
                       value_set=pa.array(GOPHER_STOPWORDS)) \
                .to_numpy(zero_copy_only=False)
        if hit.any():
            codes = pd.Categorical(
                toks[hit], categories=GOPHER_STOPWORDS).codes.astype(np.int64)
            pairs = np.unique(doc_idx[hit] * len(GOPHER_STOPWORDS) + codes)
            stop_hits = np.bincount(pairs // len(GOPHER_STOPWORDS),
                                    minlength=ndocs).astype(np.int64)
        else:
            stop_hits = np.zeros(ndocs, dtype=np.int64)
        label = (n_tok >= min_words) & (stop_hits >= min_stop_hits)
        return doc_idx, toks, label

    def count_partial(b: pa.Table) -> pa.Table:
        doc_idx, toks, label = _labels(b)
        npos = int(label.sum())
        if len(toks) == 0:
            return pa.table({"token": pa.array([chr(1)], pa.string()),
                             "c1": pa.array([0], pa.int64()),
                             "c0": pa.array([0], pa.int64()),
                             "d1": pa.array([npos], pa.int64()),
                             "d0": pa.array([b.num_rows - npos], pa.int64())})
        tok_pos = label[doc_idx]
        codes, uniq = pd.factorize(toks)
        c1 = np.bincount(codes[tok_pos], minlength=len(uniq)).astype(np.int64)
        c0 = np.bincount(codes[~tok_pos], minlength=len(uniq)).astype(np.int64)
        # class doc-count partials ride on the first token row (chr(1)
        # sorts before any real token and is never produced by a
        # whitespace split, so it can't collide with a vocab entry)
        return pa.table({
            "token": pa.array(np.concatenate([[chr(1)], uniq]), pa.string()),
            "c1": pa.array(np.concatenate([[0], c1])),
            "c0": pa.array(np.concatenate([[0], c0])),
            "d1": pa.array(np.concatenate([[npos], np.zeros(len(uniq), np.int64)])),
            "d0": pa.array(np.concatenate([[b.num_rows - npos],
                                           np.zeros(len(uniq), np.int64)]))})

    agg = preagg_sum(docs.select_columns([text_col]).map_batches(
        count_partial, batch_format="pyarrow"),
        ["token"], ["c1", "c0", "d1", "d0"])
    tabs = [t for t in collect_arrow(agg) if t.num_rows]
    tab = pa.concat_tables(tabs) if tabs else pa.table(
        {"token": pa.array([], pa.string()), "c1": pa.array([], pa.int64()),
         "c0": pa.array([], pa.int64()), "d1": pa.array([], pa.int64()),
         "d0": pa.array([], pa.int64())})
    toks_all = np.asarray(tab["token"].to_pylist(), dtype=object)
    is_meta = toks_all == chr(1)
    d1 = float(tab["d1"].to_numpy(zero_copy_only=False).sum())
    d0 = float(tab["d0"].to_numpy(zero_copy_only=False).sum())
    vocab = pd.Index(toks_all[~is_meta])
    c1 = tab["c1"].to_numpy(zero_copy_only=False)[~is_meta].astype(np.float64)
    c0 = tab["c0"].to_numpy(zero_copy_only=False)[~is_meta].astype(np.float64)
    v = float(len(vocab))
    n1, n0 = c1.sum(), c0.sum()
    w = np.log2((c1 + 1.0) / (n1 + v)) - np.log2((c0 + 1.0) / (n0 + v))
    prior = float(np.log2((d1 + 1.0) / (d0 + 1.0)))
    vocab_ref, w_ref = ray.put(vocab), ray.put(w)

    def score(b: pa.Table) -> pa.Table:
        doc_idx, toks, label = _labels(b)
        s = np.full(b.num_rows, prior, np.float64)
        if len(toks):
            voc, wt = ray.get(vocab_ref), ray.get(w_ref)
            idx = voc.get_indexer(toks)  # trained on this corpus → no OOV
            ok = idx >= 0
            s += np.bincount(doc_idx[ok], weights=wt[idx[ok]],
                             minlength=b.num_rows)
        return pa.table({id_col: b[id_col], "label": pa.array(label),
                         "log_odds": pa.array(round6(s)),
                         "pred": pa.array(s > 0)})

    return docs.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow")


def chunk_documents(docs, *, chunk_tokens: int = 128, overlap: int = 0,
                    id_col: str = "doc_id", text_col: str = "text"):
    """Split every document into fixed-size token windows — the
    training-example prep stage: chunk i covers tokens
    [i·stride, i·stride + chunk_tokens) with stride = chunk_tokens −
    overlap; the last window keeps the tail (shorter is fine); empty
    docs emit no chunks. → (doc_id, chunk_id, text, n_tokens) with
    chunk text = ' '-joined tokens.

    Scale shape: entirely per-batch (a doc never spans batches) and
    fully vectorized — one whitespace split, one gather of the flat
    token array into a ListArray, one Arrow ``binary_join``. Zero
    exchange at any corpus size.
    """
    import pyarrow as pa

    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap

    def explode(b: pa.Table) -> pa.Table:
        txt = _text_column(b, text_col)
        flat, doc_idx, n_tok = _split_tokens(txt)
        flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
        # real flat positions per doc: empty docs leave one '' entry in
        # flat (counts=1, n_tok=0), so cumsum(n_tok) would misalign —
        # doc_idx carries the true layout
        doc_tok_start = np.searchsorted(doc_idx, np.arange(len(n_tok)))
        k = np.where(n_tok > 0,
                     np.maximum(1, -(-(n_tok - overlap) // stride)),
                     0).astype(np.int64)
        total = int(k.sum())
        if total == 0:
            return pa.table({id_col: b[id_col].slice(0, 0),
                             "chunk_id": pa.array([], pa.int64()),
                             text_col: pa.array([], pa.string()),
                             "n_tokens": pa.array([], pa.int64())})
        chunk_doc = np.repeat(np.arange(len(n_tok)), k)
        k_start = np.concatenate([[0], np.cumsum(k)[:-1]])
        chunk_id = np.arange(total) - k_start[chunk_doc]
        s = chunk_id * stride
        length = np.minimum(chunk_tokens, n_tok[chunk_doc] - s)
        # gather flat-token indices for every chunk in one shot
        off = np.concatenate([[0], np.cumsum(length)]).astype(np.int64)
        gidx = (np.repeat(doc_tok_start[chunk_doc] + s, length)
                + np.arange(off[-1]) - np.repeat(off[:-1], length))
        lists = pa.ListArray.from_arrays(pa.array(off),
                                         flat.take(pa.array(gidx)))
        text = pc.binary_join(lists, " ")
        return pa.table({id_col: b[id_col].take(pa.array(chunk_doc)),
                         "chunk_id": pa.array(chunk_id),
                         text_col: text,
                         "n_tokens": pa.array(length.astype(np.int64))})

    return docs.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow")


def pack_sequences(docs, *, seq_tokens: int = 1024,
                   id_col: str = "doc_id", text_col: str = "text"):
    """Concat-and-split sequence packing (the GPT-pretraining layout):
    documents concatenate in ascending ``id_col`` order and the token
    stream splits into fixed ``seq_tokens`` windows; each doc reports
    its global token offset and the first/last sequence it lands in.
    → (doc_id, n_tokens, tok_start, seq_first, seq_last).

    Scale shape: a distributed prefix sum — per-block token subtotals
    (one tiny int per block) travel to the driver, cumulative block
    offsets stamp each block in place (the ``zip_with_index`` pattern:
    blocks never leave the object store). The only exchange is the
    ``sort`` that defines concat order — at web scale feed an
    id-sorted/partitioned corpus and the sort is a no-op.
    """
    import pyarrow as pa
    import ray

    def count(b: pa.Table) -> pa.Table:
        txt = _text_column(b, text_col)
        _, _, n_tok = _split_tokens(txt)
        return pa.table({id_col: b[id_col], "n_tokens": pa.array(n_tok)})

    counts = docs.select_columns([id_col, text_col]) \
        .map_batches(count, batch_format="pyarrow") \
        .sort(id_col).materialize()
    refs = counts.to_arrow_refs()

    @ray.remote
    def _subtotal(tbl) -> int:
        if "n_tokens" not in getattr(tbl, "column_names", tbl.columns):
            return 0  # empty 0-column block from the sort
        return int(pc.sum(tbl["n_tokens"]).as_py() or 0)

    @ray.remote
    def _stamp(tbl, offset: int) -> pa.Table:
        empty_cols = "n_tokens" not in getattr(tbl, "column_names",
                                               tbl.columns)
        if empty_cols or len(tbl) == 0:
            z = pa.array([], pa.int64())
            return pa.table({id_col: z, "n_tokens": z, "tok_start": z,
                             "seq_first": z, "seq_last": z})
        if not isinstance(tbl, pa.Table):
            tbl = pa.Table.from_pandas(tbl, preserve_index=False)
        n = tbl["n_tokens"].to_numpy(zero_copy_only=False)
        start = offset + np.concatenate([[0], np.cumsum(n)[:-1]]).astype(np.int64)
        seq_first = start // seq_tokens
        seq_last = (start + np.maximum(n - 1, 0)) // seq_tokens
        return pa.table({id_col: tbl[id_col], "n_tokens": tbl["n_tokens"],
                         "tok_start": pa.array(start),
                         "seq_first": pa.array(seq_first),
                         "seq_last": pa.array(seq_last)})

    subtotals = ray.get([_subtotal.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(subtotals)[:-1]]).astype(np.int64)
    import ray.data as rd
    return rd.from_arrow_refs(
        [_stamp.remote(r, int(o)) for r, o in zip(refs, offsets)])


def gopher_repetition(docs, *, id_col: str = "doc_id",
                      text_col: str = "text"):
    """The Gopher WITHIN-document repetition signals (Rae et al. 2021
    §A1.1, the half GopherQuality doesn't cover — duplicate content
    inside one doc rather than rule thresholds):

    - ``dup_line_frac``: lines repeating an earlier identical line,
      over total lines;
    - ``dup_line_char_frac``: characters in those repeat occurrences,
      over total line characters;
    - ``top_bigram`` / ``top_bigram_char_frac``: the most frequent
      lowered word 2-gram (ties: higher count, then lexicographically
      smallest) and the characters its occurrences cover over total
      token characters (uncapped — overlapping occurrences can exceed
      1, same as the SQL mirror).

    Scale shape: entirely per-batch (a doc never spans batches) —
    line/bigram counting is factorize + bincount over encoded
    (doc, key) pairs; only the tiny per-doc tie-break candidate set
    touches pandas. Zero exchange at any corpus size.
    """
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.functions.dedup import _token_arrays

    def per_batch(b: pa.Table) -> pa.Table:
        txt = _text_column(b, text_col)
        ndocs = b.num_rows
        # ---- duplicate lines ----
        lines, line_doc, n_lines = _split_lines(txt)
        lens = pc.utf8_length(lines).to_numpy(zero_copy_only=False) \
                 .astype(np.int64)
        codes, _ = pd.factorize(np.asarray(lines, dtype=object))
        key = line_doc * (codes.max() + 1 if len(codes) else 1) + codes
        uniq, first_pos, cnt = np.unique(key, return_index=True,
                                         return_counts=True)
        tot_chars = np.bincount(line_doc, weights=lens, minlength=ndocs)
        uniq_doc = line_doc[first_pos]
        uniq_len = lens[first_pos]
        n_distinct = np.bincount(uniq_doc, minlength=ndocs)
        dup_chars = np.bincount(uniq_doc, weights=uniq_len * (cnt - 1),
                                minlength=ndocs)
        nl = np.maximum(n_lines, 1)
        dup_line_frac = (n_lines - n_distinct) / nl
        dup_line_char_frac = np.where(tot_chars > 0,
                                      dup_chars / np.maximum(tot_chars, 1),
                                      0.0)
        # ---- top word bigram ----
        doc_idx, toks = _token_arrays(txt)
        top_bigram = np.full(ndocs, "", dtype=object)
        top_frac = np.zeros(ndocs, np.float64)
        if len(toks) >= 2:
            tcodes, tuniq = pd.factorize(toks)
            tok_lens = np.char.str_len(tuniq.astype(str))
            tok_chars = np.bincount(doc_idx, weights=tok_lens[tcodes],
                                    minlength=ndocs)
            same = doc_idx[:-1] == doc_idx[1:]
            if same.any():
                v = len(tuniq)
                d = doc_idx[:-1][same]
                k1, k2 = tcodes[:-1][same], tcodes[1:][same]
                bkey = (d * v + k1) * v + k2
                ub, bcnt = np.unique(bkey, return_counts=True)
                ud, r = ub // (v * v), ub % (v * v)
                uw1, uw2 = r // v, r % v
                # per-doc max count, then smallest (w1, w2) among ties
                cand = pd.DataFrame({
                    "doc": ud, "c": bcnt,
                    "w1": tuniq[uw1].astype(str), "w2": tuniq[uw2].astype(str)})
                mx = cand.groupby("doc")["c"].transform("max")
                cand = cand[cand["c"] == mx].sort_values(
                    ["doc", "w1", "w2"]).drop_duplicates("doc")
                di = cand["doc"].to_numpy()
                chars = (cand["w1"].str.len() + cand["w2"].str.len() + 0) \
                    .to_numpy() * cand["c"].to_numpy()
                top_bigram[di] = (cand["w1"] + " " + cand["w2"]).to_numpy()
                top_frac[di] = chars / np.maximum(tok_chars[di], 1)
        return pa.table({
            id_col: b[id_col],
            "dup_line_frac": pa.array(round6(dup_line_frac)),
            "dup_line_char_frac": pa.array(round6(dup_line_char_frac)),
            "top_bigram": pa.array(top_bigram, pa.string()),
            "top_bigram_char_frac": pa.array(round6(top_frac)),
        })

    return docs.select_columns([id_col, text_col]).map_batches(
        per_batch, batch_format="pyarrow")


def weighted_sample(ds, k: int = 100, *, weight_col: str,
                    id_col: str = "doc_id"):
    """Deterministic weighted-priority sampling: keep the ``k`` rows
    with the smallest priority = u / w, where u is the md5-derived
    integer of the row id and w = ``weight_col`` (rows with w ≤ 0 are
    excluded). Inclusion probability grows with weight; the same rows
    are selected on every run, any cluster size, any partitioning —
    the "subsample the corpus ∝ quality score / token count" primitive.

    The priority is ONE correctly-rounded float64 division of exact
    integers, so engine and SQL mirror agree bit-for-bit (no
    transcendental drift). Scale shape: per-batch partial top-k (k
    rows per block cross the cluster), then a tiny final sort+limit.
    """
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.functions.dedup import _md5_u64

    def part(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        w = b[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        h, _ = _md5_u64(ids.astype(str).astype(object), 15)
        ok = w > 0
        pri = np.full(len(ids), np.inf)
        pri[ok] = h[ok].astype(np.float64) / w[ok]
        order = np.lexsort((ids, pri))[:k]
        order = order[np.isfinite(pri[order])]
        sel = pa.array(np.sort(order))
        out = b.select([id_col, weight_col]).take(sel)
        return out.append_column("priority", pa.array(round6(pri[np.sort(order)])))

    return ds.map_batches(part, batch_format="pyarrow") \
        .sort(["priority", id_col]).limit(k)


def mixture_weights(ds, *, group_col: str = "lang", id_col: str = "doc_id"):
    """Exponent-smoothed sampling weights per corpus slice (the
    multilingual-pretraining mixing rule, α = 0.5): weight(g) =
    √n_g / Σ_h √n_h — upweights tail languages/domains relative to
    proportional sampling. → (group, n_docs, weight). α is pinned at
    0.5 because IEEE sqrt is correctly rounded, so the engine and the
    SQL mirror agree bit-for-bit (pow(x, α) is not).

    Scale shape: one map-side-combined count aggregate (bounded by
    #groups); the normalization runs on the driver over the tiny
    group table.
    """
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.util import collect_arrow, preagg_sum

    def ones(b: pa.Table) -> pa.Table:
        return pa.table({group_col: b[group_col],
                         "n_docs": pa.array(np.ones(b.num_rows, np.int64))})

    agg = preagg_sum(ds.select_columns([group_col]).map_batches(
        ones, batch_format="pyarrow"), [group_col], "n_docs")
    tabs = [t for t in collect_arrow(agg) if t.num_rows]
    tab = pa.concat_tables(tabs) if tabs else pa.table(
        {group_col: pa.array([], pa.string()),
         "n_docs": pa.array([], pa.int64())})
    n = tab["n_docs"].to_numpy(zero_copy_only=False).astype(np.float64)
    g = np.asarray(tab[group_col].to_pylist(), dtype=object)
    order = np.argsort(g)
    n, g = n[order], g[order]
    s = np.sqrt(n)
    w = round6(s / s.sum()) if len(s) else s
    import ray.data as rd
    return rd.from_arrow(pa.table({
        group_col: pa.array(g, pa.string()),
        "n_docs": pa.array(n.astype(np.int64)),
        "weight": pa.array(w)}))


def _uni_bi_grams(texts) -> tuple[np.ndarray, np.ndarray]:
    """Unigrams + adjacent bigrams (lowered whitespace tokens; bigrams
    only within a doc, no short-doc fallback) → (doc_index_per_gram,
    gram object array). The DSIR hashed-gram feature stream."""
    from neo4j_graph_algorithms_ray.functions.dedup import _token_arrays
    doc_idx, toks = _token_arrays(texts)
    if len(toks) == 0:
        return doc_idx, toks
    same = np.nonzero(doc_idx[1:] == doc_idx[:-1])[0]
    big = toks[same] + " "
    big = big + toks[same + 1]
    return (np.concatenate([doc_idx, doc_idx[same]]),
            np.concatenate([toks, big]))


def dsir_weights(docs, target, *, buckets: int = 1024,
                 id_col: str = "doc_id", text_col: str = "text"):
    """DSIR importance weights (Xie et al., NeurIPS 2023 — "Data
    Selection for Language Models via Importance Resampling"): score
    every raw document by how target-like its hashed n-gram features
    are,

        log_w(d) = Σ_{g ∈ grams(d)} log2 p̂_target(b(g)) − log2 p̂_raw(b(g))

    with b(g) = md5-60bit(gram) mod ``buckets`` and add-one-smoothed
    bucket categoricals p̂(b) = (c(b)+1)/(total+buckets). Grams are
    unigrams + adjacent bigrams of lowered whitespace tokens. High
    log_w docs resemble the curated ``target`` slice → sample ∝ exp.
    Returns (id, log_weight round6).

    Scale shape: both corpora reduce to a fixed ``buckets``-sized count
    vector (map-side bincount partials + one tiny combine — the sketch
    discipline); the log-ratio table broadcasts once via ``ray.put``
    and scoring is batch-local (md5 per distinct gram + one weighted
    bincount) — no shuffle touches the corpus.
    """
    import pyarrow as pa
    import ray

    from neo4j_graph_algorithms_ray.functions.dedup import _md5_u64
    from neo4j_graph_algorithms_ray.util import collect_arrow, preagg_sum

    def bucket_partial(b: pa.Table) -> pa.Table:
        _, grams = _uni_bi_grams(b[text_col])
        if len(grams) == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        h, inv = _md5_u64(grams, 15)
        bkt = (h % np.uint64(buckets)).astype(np.int64)[inv]
        u, n = np.unique(bkt, return_counts=True)
        return pa.table({"bucket": pa.array(u),
                         "n": pa.array(n.astype(np.int64))})

    def bucket_counts(ds) -> np.ndarray:
        agg = preagg_sum(ds.select_columns([text_col]).map_batches(
            bucket_partial, batch_format="pyarrow"), ["bucket"], "n")
        vec = np.zeros(buckets, np.float64)
        for t in collect_arrow(agg):
            if t.num_rows:
                vec[t["bucket"].to_numpy(zero_copy_only=False)] += \
                    t["n"].to_numpy(zero_copy_only=False)
        return vec

    cr = bucket_counts(docs)
    ct = bucket_counts(target)
    lr = (np.log2((ct + 1.0) / (ct.sum() + buckets))
          - np.log2((cr + 1.0) / (cr.sum() + buckets)))
    lr_ref = ray.put(lr)

    def score(b: pa.Table) -> pa.Table:
        table = ray.get(lr_ref)
        doc_idx, grams = _uni_bi_grams(b[text_col])
        if len(grams):
            h, inv = _md5_u64(grams, 15)
            bkt = (h % np.uint64(buckets)).astype(np.int64)[inv]
            w = np.bincount(doc_idx, weights=table[bkt],
                            minlength=b.num_rows)
        else:
            w = np.zeros(b.num_rows)
        return pa.table({id_col: b[id_col],
                         "log_weight": pa.array(round6(w))})

    return docs.map_batches(score, batch_format="pyarrow", batch_size=4096)


def lexical_diversity(docs, *, id_col: str = "doc_id",
                      text_col: str = "text"):
    """Per-doc lexical-diversity features → (doc_id, n_tokens, ttr,
    hapax_ratio): type-token ratio (distinct lowered tokens / tokens)
    and hapax ratio (tokens occurring exactly once in the doc /
    tokens); 0.0 for empty docs. Standard corpus-quality screens —
    machine-generated / keyword-stuffed text sits at the extremes.

    Scale shape: entirely batch-local (one Arrow split + one factorize
    + bincounts per batch, no shuffle, no per-row Python)."""
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.functions.dedup import _token_arrays

    def score(b: pa.Table) -> pa.Table:
        n = b.num_rows
        doc_idx, toks = _token_arrays(b[text_col])
        n_tok = np.bincount(doc_idx, minlength=n).astype(np.int64)
        if len(toks):
            codes, uniq = pd.factorize(toks)
            key = doc_idx * len(uniq) + codes
            uk, kc = np.unique(key, return_counts=True)
            ud = (uk // len(uniq)).astype(np.int64)
            n_dist = np.bincount(ud, minlength=n)
            n_hapax = np.bincount(ud[kc == 1], minlength=n)
        else:
            n_dist = n_hapax = np.zeros(n, np.int64)
        denom = np.maximum(n_tok, 1).astype(np.float64)
        return pa.table({
            id_col: b[id_col],
            "n_tokens": pa.array(n_tok),
            "ttr": pa.array(round6(np.where(n_tok > 0, n_dist / denom, 0.0))),
            "hapax_ratio": pa.array(
                round6(np.where(n_tok > 0, n_hapax / denom, 0.0)))})

    return docs.map_batches(score, batch_format="pyarrow", batch_size=4096)


# What ends a sentence for sentence_stats — kept RE2-simple so the SQL
# oracle's regexp_split_to_array uses the identical pattern.
SENT_SPLIT_RE = r"[.!?]+"
_WS_CHARS = " \t\n\r"


def sentence_stats(docs, *, id_col: str = "doc_id",
                   text_col: str = "text"):
    """Per-doc sentence segmentation stats → (doc_id, n_sentences,
    mean_sentence_chars): split on runs of ``[.!?]``, trim ASCII
    whitespace, drop empty pieces; mean length in chars of the
    surviving sentences (0.0 when none). The shape of readability /
    fragment screens used in corpus filtering.

    Scale shape: batch-local (one RE2 split kernel + one trim + length
    bincounts; no shuffle, no per-row Python)."""
    import pyarrow as pa

    def score(b: pa.Table) -> pa.Table:
        n = b.num_rows
        txt = _text_column(b, text_col)
        parts = pc.split_pattern_regex(txt, SENT_SPLIT_RE)
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        flat = parts.flatten()
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        counts = np.diff(parts.offsets.to_numpy(zero_copy_only=False))
        doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        trimmed = pc.utf8_trim(flat, _WS_CHARS)
        ln = pc.utf8_length(trimmed).to_numpy(zero_copy_only=False)
        keep = ln > 0
        n_sent = np.bincount(doc_idx[keep], minlength=n).astype(np.int64)
        chars = np.bincount(doc_idx[keep], weights=ln[keep].astype(np.float64),
                            minlength=n)
        mean = np.where(n_sent > 0, chars / np.maximum(n_sent, 1), 0.0)
        return pa.table({id_col: b[id_col],
                         "n_sentences": pa.array(n_sent),
                         "mean_sentence_chars": pa.array(round6(mean))})

    return docs.map_batches(score, batch_format="pyarrow", batch_size=4096)


def slice_kl(docs, *, group_col: str = "lang", text_col: str = "text"):
    """Per-slice token-distribution divergence → (``group_col``, kl_div,
    n_tokens): KL(P_slice ‖ P_corpus) over lowered whitespace tokens,
    natural log. The slice-drift signal used to monitor mixture skew
    when assembling multi-source / multi-lingual training corpora
    (each slice's support ⊆ corpus support, so KL is always finite).

    Scale shape: one streaming pass emits per-batch (slice, token, n)
    partials into a map-side-combined groupby — the shuffle carries
    distinct (slice, token) pairs, not corpus tokens. Corpus token
    totals derive from those pairs (second tiny aggregate); only the
    per-slice scalar sums land on the driver."""
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.functions.dedup import _token_arrays
    from neo4j_graph_algorithms_ray.util import collect_arrow, preagg_sum

    def pair_partial(b: pa.Table) -> pa.Table:
        doc_idx, toks = _token_arrays(b[text_col])
        grp = np.asarray(b[group_col].to_numpy(zero_copy_only=False),
                         dtype=object)
        if len(toks) == 0:
            return pa.table({group_col: pa.array([], pa.string()),
                             "token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        key = pd.DataFrame({group_col: grp[doc_idx], "token": toks})
        cnt = key.groupby([group_col, "token"], sort=False).size()
        idx = cnt.index.to_frame(index=False)
        return pa.table({group_col: pa.array(idx[group_col], pa.string()),
                         "token": pa.array(idx["token"], pa.string()),
                         "n": pa.array(cnt.to_numpy().astype(np.int64))})

    pairs = preagg_sum(docs.select_columns([group_col, text_col]).map_batches(
        pair_partial, batch_format="pyarrow"), [group_col, "token"], "n") \
        .materialize()

    # corpus token totals (vocab-sized) broadcast once; slice totals tiny
    tok_tot = preagg_sum(pairs, ["token"], "n")
    ttabs = [t for t in collect_arrow(tok_tot) if t.num_rows]
    tot = pa.concat_tables(ttabs) if ttabs else pa.table(
        {"token": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
    q_map = pd.Series(tot["n"].to_numpy(zero_copy_only=False).astype(np.float64),
                      index=pd.Index(tot["token"].to_pylist()))
    big_n = float(q_map.sum()) or 1.0
    import ray
    q_ref = ray.put(q_map / big_n)

    grp_tot = preagg_sum(pairs, [group_col], "n")
    gtabs = [t for t in collect_arrow(grp_tot) if t.num_rows]
    gt = pa.concat_tables(gtabs) if gtabs else pa.table(
        {group_col: pa.array([], pa.string()), "n": pa.array([], pa.int64())})
    nl_map = {g: float(v) for g, v in zip(gt[group_col].to_pylist(),
                                          gt["n"].to_pylist())}
    nl_ref = ray.put(nl_map)

    def contrib(b: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        nl = ray.get(nl_ref)
        grp = np.asarray(b[group_col].to_numpy(zero_copy_only=False),
                         dtype=object)
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        nls = np.array([nl[g] for g in grp], np.float64)
        p = n / nls
        qv = q.reindex(pd.Index(b["token"].to_pylist())).to_numpy()
        term = p * np.log(p / qv)
        return pa.table({group_col: b[group_col], "term": pa.array(term),
                         "nl": pa.array(nls.astype(np.int64))})

    agg = preagg_sum(pairs.map_batches(contrib, batch_format="pyarrow"),
                     [group_col], ["term", "nl"])

    def finish(b: pa.Table) -> pa.Table:
        # nl summed one copy per pair row; recover the slice total from
        # the broadcast map instead (exact, no double count)
        nl = ray.get(nl_ref)
        grp = b[group_col].to_pylist()
        return pa.table({
            group_col: b[group_col],
            "kl_div": pa.array(round6(
                b["term"].to_numpy(zero_copy_only=False))),
            "n_tokens": pa.array(np.array([int(nl[g]) for g in grp],
                                          np.int64))})

    return agg.map_batches(finish, batch_format="pyarrow")


def dup_ngram_frac(docs, *, k: int = 5, min_docs: int = 2,
                   id_col: str = "doc_id", text_col: str = "text",
                   bcast_limit: int | None = None):
    """Cross-document duplicate-k-gram fraction → (doc_id,
    n_grams_distinct, dup_gram_frac): for each doc, the share of its
    DISTINCT k-token windows that also occur in ≥ ``min_docs`` distinct
    documents corpus-wide. The RefinedWeb/FineWeb-style signal that
    separates boilerplate-laden pages (nav bars, license blocks,
    syndicated text) from original content — complements the
    within-doc repetition_ratio.

    100 TB shape (same two-pass contract as span_dedup): pass 1
    streams the corpus once emitting per-batch DISTINCT (window-hash,
    1) rows — each doc lives in exactly one batch, so summing the
    per-batch distincts in a map-side-combined groupby yields exact
    distinct-DOC counts per window. Windows in ≥ min_docs docs
    broadcast once via ``ray.put`` (8 B each, NGA_SPAN_BCAST_LIMIT
    cap, loud raise above it); pass 2 re-streams and scores each batch
    locally via sorted-array membership. Hash granularity: u64
    polynomial window hashes (``_window_hashes``) — distinct windows
    collide at ~2^-64, the standard corpus-dedup tradeoff."""
    import os

    import ray

    from neo4j_graph_algorithms_ray.util import collect_arrow, preagg_sum

    def _doc_distinct(b: pa.Table):
        """(per-row doc index, distinct window hashes, inverse doc idx
        per distinct hash) for one batch."""
        doc_idx, flat, _ = _raw_token_arrays(b[text_col])
        w, starts = _window_hashes(flat, doc_idx, k)
        if len(w) == 0:
            return (np.empty(0, np.int64), np.empty(0, np.uint64))
        wd = doc_idx[starts]
        key = np.stack([wd.astype(np.uint64), w], axis=1)
        uniq = np.unique(key, axis=0)
        return uniq[:, 0].astype(np.int64), uniq[:, 1]

    def count_partial(b: pa.Table) -> pa.Table:
        _, wh = _doc_distinct(b)
        if len(wh) == 0:
            return pa.table({"h": pa.array([], pa.int64()),
                             "nd": pa.array([], pa.int64())})
        uniq, cnt = np.unique(wh, return_counts=True)
        return pa.table({"h": pa.array(uniq.view(np.int64)),
                         "nd": pa.array(cnt.astype(np.int64))})

    dup = preagg_sum(
        docs.select_columns([text_col]).map_batches(
            count_partial, batch_format="pyarrow"), ["h"], "nd") \
        .map_batches(lambda b: b.filter(
            pc.greater_equal(b["nd"], min_docs)).select(["h"]),
            batch_format="pyarrow").materialize()

    limit = (bcast_limit if bcast_limit is not None
             else int(os.environ.get("NGA_SPAN_BCAST_LIMIT", 20_000_000)))
    n_dup = dup.count()
    if n_dup > limit:
        raise RuntimeError(
            f"dup_ngram_frac: {n_dup} cross-doc duplicated {k}-gram "
            f"windows exceed the broadcast cap {limit}. Shard the "
            "corpus by doc-id hash and score per shard against the "
            "shared pass-1 counts, or raise NGA_SPAN_BCAST_LIMIT.")
    tabs = [t for t in collect_arrow(dup) if t.num_rows]
    hs = (np.sort(np.concatenate(
        [t["h"].to_numpy(zero_copy_only=False) for t in tabs]).view(np.uint64))
        if tabs else np.empty(0, np.uint64))
    ref = ray.put(hs)

    def score(b: pa.Table) -> pa.Table:
        n = b.num_rows
        dd, wh = _doc_distinct(b)
        dupset = ray.get(ref)
        n_dist = np.bincount(dd, minlength=n).astype(np.int64)
        if len(wh) and len(dupset):
            pos = np.minimum(np.searchsorted(dupset, wh), len(dupset) - 1)
            isdup = dupset[pos] == wh
            n_dupg = np.bincount(dd[isdup], minlength=n)
        else:
            n_dupg = np.zeros(n, np.int64)
        frac = np.where(n_dist > 0,
                        n_dupg / np.maximum(n_dist, 1).astype(np.float64), 0.0)
        return pa.table({id_col: b[id_col],
                         "n_grams_distinct": pa.array(n_dist),
                         "dup_gram_frac": pa.array(round6(frac))})

    return docs.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow")


def _flat_utf8(arr) -> tuple[np.ndarray, np.ndarray]:
    """String column → (flat utf8 bytes uint8[], per-doc offsets
    int64[ndocs+1]) with zero copies beyond the offset rebase — reads
    the Arrow string buffers directly."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.fill_null(arr.cast(pa.string()), "")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    off_buf, data_buf = arr.buffers()[1], arr.buffers()[2]
    off = np.frombuffer(off_buf, np.int32,
                        len(arr) + 1 + arr.offset)[arr.offset:]
    if data_buf is None:
        return np.empty(0, np.uint8), (off - off[0]).astype(np.int64)
    data = np.frombuffer(data_buf, np.uint8)[off[0]:off[-1]]
    return data, (off - off[0]).astype(np.int64)


def winnow_fingerprints(docs, *, k: int = 8, w: int = 4,
                        id_col: str = "doc_id", text_col: str = "text"):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003,
    the MOSS algorithm) → (doc_id, pos, fp): hash every k-byte char
    gram, slide a window of ``w`` consecutive gram positions, keep the
    window minimum (rightmost on ties), dedupe selections. Guarantees
    every shared substring of length ≥ k + w − 1 yields at least one
    shared fingerprint — the position-robust local fingerprinting used
    for plagiarism / near-dup detection where shingle sets are too
    coarse.

    Hash = Σ byte[j]·256^j (exact, order-preserving) so the DuckDB
    oracle reproduces it with ascii(substr(…)) arithmetic; exact in
    int64 for ASCII text (the synthetic corpus contract — swap in a
    u64 rolling hash for arbitrary bytes, same selection logic).

    Scale shape: entirely batch-local and loop-free — grams and window
    minima are computed over ONE flat byte buffer per batch (Arrow
    string storage read in place; per-doc boundaries enforced by masks,
    sliding_window_view for the minima), no shuffle, no per-row
    Python."""
    from numpy.lib.stride_tricks import sliding_window_view

    def fp(b: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], b[id_col].type),
                          "pos": pa.array([], pa.int64()),
                          "fp": pa.array([], pa.int64())})
        data, offs = _flat_utf8(b[text_col])
        m = len(data) - k + 1
        if m <= 0:
            return empty
        lengths = np.diff(offs)
        bidx = np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)
        h = np.zeros(m, np.uint64)
        for j in range(k):
            h += data[j:j + m].astype(np.uint64) << np.uint64(8 * j)
        valid = bidx[:m] == bidx[k - 1:k - 1 + m]
        mw = m - w + 1
        if mw <= 0:
            return empty
        wvalid = valid[:mw] & valid[w - 1:w - 1 + mw] \
            & (bidx[:mw] == bidx[w - 1:w - 1 + mw])
        if not wvalid.any():
            return empty
        wv = sliding_window_view(h, w)
        ridx = (w - 1) - np.argmin(wv[:, ::-1], axis=1)
        starts = np.flatnonzero(wvalid)
        sel = starts + ridx[starts]
        doc = bidx[sel]
        key = np.stack([doc, sel], axis=1)
        uniq = np.unique(key, axis=0)
        doc_u, sel_u = uniq[:, 0], uniq[:, 1]
        ids = b[id_col].take(pa.array(doc_u))
        return pa.table({id_col: ids,
                         "pos": pa.array(sel_u - offs[doc_u]),
                         "fp": pa.array(h[sel_u].astype(np.int64))})

    return docs.select_columns([id_col, text_col]).map_batches(
        fp, batch_format="pyarrow", batch_size=4096)


def corpus_token_budget(docs, *, group_col: str = "source",
                        text_col: str = "text"):
    """Per-slice corpus accounting → (``group_col``, n_docs, n_tokens,
    token_share): document and whitespace-token totals per slice plus
    each slice's share of the corpus token budget — the bookkeeping
    table behind training-mixture planning ("how many tokens do we
    actually have per source?").

    Scale shape: one streaming pass emitting per-batch (slice, n_docs,
    n_tokens) partials into a map-side-combined groupby; the result is
    |slices| rows."""
    import pyarrow as pa
    import ray.data as rd

    from neo4j_graph_algorithms_ray.util import collect_arrow, preagg_sum

    def partial(b: pa.Table) -> pa.Table:
        txt = _text_column(b, text_col)
        _, _, n_tok = _split_tokens(txt)
        grp = np.asarray(b[group_col].to_numpy(zero_copy_only=False),
                         dtype=object)
        codes, uniq = pd.factorize(grp)
        return pa.table({
            group_col: pa.array(uniq, pa.string()),
            "n_docs": pa.array(np.bincount(codes, minlength=len(uniq))
                               .astype(np.int64)),
            "n_tokens": pa.array(np.bincount(codes, weights=n_tok,
                                             minlength=len(uniq))
                                 .astype(np.int64))})

    agg = preagg_sum(docs.select_columns([group_col, text_col]).map_batches(
        partial, batch_format="pyarrow"), [group_col], ["n_docs", "n_tokens"])
    tabs = [t for t in collect_arrow(agg) if t.num_rows]
    if not tabs:
        return rd.from_arrow(pa.table({
            group_col: pa.array([], pa.string()),
            "n_docs": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "token_share": pa.array([], pa.float64())}))
    t = pa.concat_tables(tabs)
    tok = t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.float64)
    share = round6(tok / max(tok.sum(), 1.0))
    return rd.from_arrow(t.append_column("token_share", pa.array(share)))


def grouped_percentiles(ds, col: str, group_col: str,
                        pcts=(25, 50, 75, 90, 99)):
    """Exact per-group percentiles of an integer column →
    (``group_col``, pct, value) — the per-slice spread report (e.g.
    doc-length distribution per language). Same no-sort shape as
    column_percentiles: per-(group, value) histogram partials with a
    map-side combine; only the merged histogram (≤ |groups|·|distinct
    values| rows) reaches the driver for the cumulative walk."""
    import math

    import pyarrow as pa
    import ray.data as rd

    from neo4j_graph_algorithms_ray.util import collect_arrow, preagg_sum

    def partial(b: pa.Table) -> pa.Table:
        v = b[col].to_numpy(zero_copy_only=False).astype(np.int64)
        grp = np.asarray(b[group_col].to_numpy(zero_copy_only=False),
                         dtype=object)
        df = pd.DataFrame({"g": grp, "v": v})
        cnt = df.groupby(["g", "v"], sort=False).size()
        idx = cnt.index.to_frame(index=False)
        return pa.table({group_col: pa.array(idx["g"], pa.string()),
                         "v": pa.array(idx["v"].to_numpy(), pa.int64()),
                         "n": pa.array(cnt.to_numpy().astype(np.int64))})

    hist = preagg_sum(ds.select_columns([group_col, col]).map_batches(
        partial, batch_format="pyarrow"), [group_col, "v"], "n")
    tabs = [t for t in collect_arrow(hist) if t.num_rows]
    if not tabs:
        return rd.from_arrow(pa.table({group_col: pa.array([], pa.string()),
                                       "pct": pa.array([], pa.int64()),
                                       "value": pa.array([], pa.int64())}))
    t = pa.concat_tables(tabs).to_pandas()
    out_g, out_p, out_v = [], [], []
    for g, sub in t.groupby(group_col, sort=True):
        sub = sub.sort_values("v")
        v = sub["v"].to_numpy()
        cum = np.cumsum(sub["n"].to_numpy())
        total = int(cum[-1])
        for p in pcts:
            thr = math.ceil(total * p / 100)
            idx = int(np.searchsorted(cum, thr))
            out_g.append(g)
            out_p.append(int(p))
            out_v.append(int(v[min(idx, len(v) - 1)]))
    return rd.from_arrow(pa.table({group_col: pa.array(out_g, pa.string()),
                                   "pct": pa.array(out_p, pa.int64()),
                                   "value": pa.array(out_v, pa.int64())}))


def filter_report(docs, *, min_tokens: int = 8, lang: str = "en",
                  min_stopword_ratio: float = 0.03,
                  max_rep_ratio: float = 0.3,
                  id_col: str = "doc_id", text_col: str = "text"):
    """Composed corpus-filter decision report → (doc_id, keep, reason):
    every document gets the FIRST failing rule (priority order
    too_short → non_english → low_stopword → repetitive) or 'keep' —
    the audit-trail form of a filtering pipeline, kept alongside the
    destructive corpus_clean so a curation run can quantify and review
    what each rule removes before dropping anything.

    Scale shape: one batch-local pass composing the existing
    QualityScore / LangId / shingle kernels (no shuffle, no per-row
    Python); thresholds compare the same round6 values the SQL oracle
    rounds to, so the decision boundary is bit-reproducible."""
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.functions.dedup import _shingle_arrays

    qs = QualityScore(id_col, text_col)
    li = LangId(id_col, text_col)

    def report(b: pa.Table) -> pa.Table:
        n = b.num_rows
        q, lg = qs(b), li(b)
        n_tok = q["n_tokens"].to_numpy(zero_copy_only=False)
        stop = q["stopword_ratio"].to_numpy(zero_copy_only=False)
        pred = np.asarray(lg["pred_lang"].to_pylist(), dtype=object)
        doc_idx, sh = _shingle_arrays(b[text_col], 3)
        total = np.bincount(doc_idx, minlength=n).astype(np.float64)
        if len(sh):
            d = pd.DataFrame({"d": doc_idx, "s": sh}).drop_duplicates()
            dist = np.bincount(d["d"].to_numpy(), minlength=n)
        else:
            dist = np.zeros(n)
        rep = round6(np.where(total > 0, 1.0 - dist / np.maximum(total, 1),
                              0.0))
        reason = np.full(n, "keep", dtype=object)
        reason[rep > max_rep_ratio] = "repetitive"
        reason[stop < min_stopword_ratio] = "low_stopword"
        reason[pred != lang] = "non_english"
        reason[n_tok < min_tokens] = "too_short"
        keep = (reason == "keep").astype(np.int64)
        return pa.table({id_col: b[id_col],
                         "keep": pa.array(keep),
                         "reason": pa.array(reason, pa.string())})

    return docs.map_batches(report, batch_format="pyarrow", batch_size=4096)


def vocab_novelty(docs, *, text_col: str = "text",
                  source_col: str = "source"):
    """Marginal vocabulary gain per source: each distinct corpus token
    is attributed to its lexicographically-first source, giving
    (source, n_new_tokens, cum_vocab) in source order — the which-
    source-still-adds-vocabulary curve used when curating a pretraining
    mixture (a source whose tokens all appeared in earlier sources adds
    spelling diversity, not vocabulary).

    Scale shape: per-batch (token, min source) partials combine through
    the ``preagg_min`` map-side tree, so the shuffle carries per-batch-
    distinct tokens; the per-source counts then reduce to |sources|
    rows and the cumulative sum runs on that tiny result. Returns a
    pandas DataFrame."""
    import pandas as pd_

    from neo4j_graph_algorithms_ray.functions.dedup import _token_arrays
    from neo4j_graph_algorithms_ray.util import preagg_min, preagg_sum

    def partial(b: pa.Table) -> pa.Table:
        di, toks = _token_arrays(b[text_col])
        src = b[source_col].to_numpy(zero_copy_only=False)[di]
        # per-batch combine: one row per (token) with its min source
        t = pa.table({"token": pa.array(toks, pa.string()),
                      "source": pa.array(src, pa.string())})
        return t.group_by(["token"]).aggregate([("source", "min")]) \
                .rename_columns(["token", "source"])

    first = preagg_min(docs.map_batches(partial, batch_format="pyarrow"),
                       ["token"], "source")

    def ones(b: pa.Table) -> pa.Table:
        return pa.table({"source": b["source"],
                         "n_new_tokens": pa.array(
                             np.ones(b.num_rows, np.int64))})

    per = preagg_sum(first.map_batches(ones, batch_format="pyarrow"),
                     ["source"], "n_new_tokens")
    df = per.sort("source").to_pandas()
    df["cum_vocab"] = df["n_new_tokens"].cumsum()
    return df


def lang_vocab_overlap(docs, *, text_col: str = "text",
                       lang_col: str = "lang"):
    """Cross-language vocabulary overlap: for every language pair with
    at least one shared distinct token, (lang_a, lang_b, n_shared,
    n_a, n_b, jaccard) — the is-my-language-ID-leaking /
    script-sharing diagnostic over a multilingual corpus.

    Scale shape: the (lang, token) incidence reduces to global-distinct
    rows through one ``preagg_sum`` tree; each token then folds its
    languages into a bitmask via a second token-keyed ``preagg_sum``
    (sum of distinct per-lang bits == OR), and the mask histogram —
    at most 2^|langs| rows — is the ONLY thing that reaches the
    driver, where the pair matrix expands combinatorially. No
    token-level self-join ever happens. Returns a pandas DataFrame
    ordered by (lang_a, lang_b)."""
    import pandas as pd_

    from neo4j_graph_algorithms_ray.functions.dedup import _token_arrays
    from neo4j_graph_algorithms_ray.util import preagg_sum

    langs = sorted({r[lang_col] for r in
                    preagg_sum(docs.map_batches(
                        lambda b: pa.table({
                            lang_col: pc.unique(b[lang_col]),
                        }).append_column("one", pa.array(
                            np.ones(len(pc.unique(b[lang_col])), np.int64))),
                        batch_format="pyarrow"), [lang_col], "one")
                    .take_all()})
    bit_of = {l: 1 << i for i, l in enumerate(langs)}

    def incidence(b: pa.Table) -> pa.Table:
        di, toks = _token_arrays(b[text_col])
        lg = b[lang_col].to_numpy(zero_copy_only=False)[di]
        t = pa.table({"lang": pa.array(lg, pa.string()),
                      "token": pa.array(toks, pa.string()),
                      "one": pa.array(np.ones(len(toks), np.int64))})
        return t.group_by(["lang", "token"]).aggregate([("one", "min")]) \
                .rename_columns(["lang", "token", "one"])

    dist = preagg_sum(docs.map_batches(incidence, batch_format="pyarrow"),
                      ["lang", "token"], "one")

    def to_bits(b: pa.Table) -> pa.Table:
        lg = b["lang"].to_numpy(zero_copy_only=False)
        bits = np.array([bit_of[x] for x in lg], dtype=np.int64)
        return pa.table({"token": b["token"], "mask": pa.array(bits)})

    masks = preagg_sum(dist.map_batches(to_bits, batch_format="pyarrow"),
                       ["token"], "mask")

    def mask_hist(b: pa.Table) -> pa.Table:
        t = pa.table({"mask": b["mask"],
                      "n": pa.array(np.ones(b.num_rows, np.int64))})
        return t.group_by(["mask"]).aggregate([("n", "sum")]) \
                .rename_columns(["mask", "n"])

    hist = preagg_sum(masks.map_batches(mask_hist, batch_format="pyarrow"),
                      ["mask"], "n").take_all()
    mk = np.array([r["mask"] for r in hist], dtype=np.int64)
    cnt = np.array([r["n"] for r in hist], dtype=np.int64)
    rows = []
    for i, la in enumerate(langs):
        na = int(cnt[(mk >> i) & 1 == 1].sum())
        for j in range(i + 1, len(langs)):
            lb = langs[j]
            nb = int(cnt[(mk >> j) & 1 == 1].sum())
            sh = int(cnt[((mk >> i) & 1 == 1) & ((mk >> j) & 1 == 1)].sum())
            if sh:
                rows.append((la, lb, sh, na, nb,
                             float(round6(np.array(
                                 [sh / (na + nb - sh)]))[0])))
    return pd_.DataFrame(rows, columns=["lang_a", "lang_b", "n_shared",
                                        "n_a", "n_b", "jaccard"]).astype(
        {"n_shared": "int64", "n_a": "int64", "n_b": "int64"})


def tfidf_cosine_pairs(docs, *, threshold: float = 0.5, df_cap: int = 50,
                       id_col: str = "doc_id", text_col: str = "text"):
    """All-pairs TF-IDF cosine similarity ≥ ``threshold`` →
    (a, b, cosine): the classic sparse-vector near-dup / related-docs
    measure (tf = raw count, idf = ln(N/df)) computed as a sparse dot
    product through the inverted index — no dense vectors, no
    len(vocab)-wide state.

    The vector space is restricted to tokens with df ≤ ``df_cap`` (the
    stop-word-by-df discipline: an every-doc token carries no
    discrimination and would make every per-token group C(N,2) pairs);
    norms use the same restricted space so cosine stays a true cosine
    there. Cosine is rounded to 1e-6 BEFORE the threshold so float
    summation order can't flip boundary pairs against the SQL oracle.

    Scale shape: per-batch (doc, token, tf) is exact (docs never span
    batches); the df table reduces through the map-side combine and
    broadcasts once via ``ray.put``; pair dots form per token group
    (group size ≤ df_cap) and combine through a pair-keyed
    ``preagg_sum``; norms attach via the broadcast-join regime."""
    import ray

    from neo4j_graph_algorithms_ray.functions.dedup import _token_arrays
    from neo4j_graph_algorithms_ray.util import (broadcast_join, preagg_sum,
                                                 to_arrow_blocks)

    def df_partial(b: pa.Table) -> pa.Table:
        doc_idx, toks = _token_arrays(b[text_col])
        if len(toks) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64())})
        codes, uniq = pd.factorize(toks)
        pair = np.unique(doc_idx.astype(np.int64) * len(uniq) + codes)
        dfc = np.bincount((pair % len(uniq)).astype(np.int64),
                          minlength=len(uniq))
        return pa.table({"token": pa.array(uniq, pa.string()),
                         "df": dfc.astype(np.int64)})

    n_docs = docs.count()
    dft = preagg_sum(docs.map_batches(df_partial, batch_format="pyarrow"),
                     ["token"], "df").materialize()
    from neo4j_graph_algorithms_ray.util import collect_arrow
    vocab = pa.concat_tables(collect_arrow(dft))
    dfv = vocab["df"].to_numpy(zero_copy_only=False)
    keep = dfv <= df_cap
    idf_map = pd.Series(np.log(float(n_docs) / dfv[keep]),
                        index=pd.Index(np.asarray(
                            vocab["token"].to_pylist(), dtype=object)[keep]))
    idf_ref = ray.put(idf_map)

    def weights(b: pa.Table) -> pa.Table:
        idf = ray.get(idf_ref)
        doc_idx, toks = _token_arrays(b[text_col])
        ids = b[id_col].to_numpy(zero_copy_only=False)
        if len(toks) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             id_col: pa.array([], pa.int64()),
                             "w": pa.array([], pa.float64())})
        codes, uniq = pd.factorize(toks)
        key = doc_idx.astype(np.int64) * len(uniq) + codes
        upair, tf = np.unique(key, return_counts=True)
        di = (upair // len(uniq)).astype(np.int64)
        ti = (upair % len(uniq)).astype(np.int64)
        iv = idf.reindex(pd.Index(uniq[ti])).to_numpy()
        ok = ~np.isnan(iv)
        return pa.table({"token": pa.array(uniq[ti][ok], pa.string()),
                         id_col: pa.array(ids[di[ok]]),
                         "w": pa.array(tf[ok] * iv[ok])})

    wt = to_arrow_blocks(docs.map_batches(weights, batch_format="pyarrow")) \
        .materialize()

    def norm_partial(b: pa.Table) -> pa.Table:
        # docs never span batches: per-batch sum of squares is exact
        ww = b["w"].to_numpy(zero_copy_only=False)
        t = pa.table({id_col: b[id_col], "sq": pa.array(ww * ww)})
        return t.group_by([id_col]).aggregate([("sq", "sum")]) \
                .rename_columns([id_col, "sq"])

    norms = preagg_sum(wt.map_batches(norm_partial, batch_format="pyarrow"),
                       [id_col], "sq")

    def pair_dots(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy()
        ww = df["w"].to_numpy()
        order = np.argsort(ids, kind="mergesort")
        ids, ww = ids[order], ww[order]
        n = len(ids)
        if n < 2:
            return pd.DataFrame({"a": np.empty(0, np.int64),
                                 "b": np.empty(0, np.int64),
                                 "dp": np.empty(0, np.float64)})
        ii, jj = np.triu_indices(n, 1)
        return pd.DataFrame({"a": ids[ii], "b": ids[jj],
                             "dp": ww[ii] * ww[jj]})

    # groups are ≤ df_cap rows; singleton-token groups emit nothing
    dots = preagg_sum(
        to_arrow_blocks(wt.groupby("token").map_groups(
            pair_dots, batch_format="pandas")),
        ["a", "b"], "dp")

    j = broadcast_join(dots, norms.rename_columns({id_col: "na_id",
                                                   "sq": "na_sq"}),
                       on="a", right_on="na_id")
    j = broadcast_join(j, norms.rename_columns({id_col: "nb_id",
                                                "sq": "nb_sq"}),
                       on="b", right_on="nb_id")

    def finish(b: pa.Table) -> pa.Table:
        dp = b["dp"].to_numpy(zero_copy_only=False)
        na = np.sqrt(b["na_sq"].to_numpy(zero_copy_only=False))
        nb = np.sqrt(b["nb_sq"].to_numpy(zero_copy_only=False))
        cos = round6(dp / (na * nb))
        m = cos >= threshold
        return pa.table({"a": pa.array(
                             b["a"].to_numpy(zero_copy_only=False)[m]),
                         "b": pa.array(
                             b["b"].to_numpy(zero_copy_only=False)[m]),
                         "cosine": pa.array(cos[m])})

    return j.map_batches(finish, batch_format="pyarrow")


def langid_confusion(docs, *, lang_col: str = "lang",
                     text_col: str = "text"):
    """Language-ID confusion matrix: (lang, pred_lang, n) — labeled
    language vs the LangId heuristic's prediction, the
    is-my-language-filter-lying eval before a lang-gated corpus clean.

    Scale shape: prediction and the (label, pred) count partial happen
    in the same batch pass (no join — the label rides the batch);
    only the ≤|langs|² count matrix shuffles."""
    lid = LangId(id_col=lang_col, text_col=text_col)  # id col = label

    from neo4j_graph_algorithms_ray.util import preagg_sum

    def partial(b: pa.Table) -> pa.Table:
        p = lid(b)  # (lang, pred_lang)
        t = p.append_column("n", pa.array(np.ones(p.num_rows, np.int64)))
        return t.group_by([lang_col, "pred_lang"]).aggregate(
            [("n", "sum")]).rename_columns([lang_col, "pred_lang", "n"])

    return preagg_sum(docs.map_batches(partial, batch_format="pyarrow"),
                      [lang_col, "pred_lang"], "n") \
        .sort([lang_col, "pred_lang"])


def quality_by_source(docs, *, source_col: str = "source",
                      text_col: str = "text"):
    """Per-source corpus quality aggregate: (source, n_docs, n_tokens,
    mean_tokens, mean_stopword_ratio, mean_punct_ratio) — the
    mixture-curation dashboard row telling which feeds are worth their
    tokens.

    Scale shape: the QualityScore kernel and the per-source moment
    partials share one batch pass; only |sources| moment rows
    shuffle."""
    qs = QualityScore(id_col=source_col, text_col=text_col)

    from neo4j_graph_algorithms_ray.util import preagg_sum

    def partial(b: pa.Table) -> pa.Table:
        q = qs(b)
        t = pa.table({
            source_col: q[source_col],
            "n_docs": pa.array(np.ones(q.num_rows, np.int64)),
            "n_tokens": q["n_tokens"],
            "sw": q["stopword_ratio"],
            "pr": q["punct_ratio"],
        })
        return t.group_by([source_col]).aggregate(
            [("n_docs", "sum"), ("n_tokens", "sum"), ("sw", "sum"),
             ("pr", "sum")]).rename_columns(
            [source_col, "n_docs", "n_tokens", "sw", "pr"])

    agg = preagg_sum(docs.map_batches(partial, batch_format="pyarrow"),
                     [source_col], ["n_docs", "n_tokens", "sw", "pr"])

    def finish(b: pa.Table) -> pa.Table:
        n = b["n_docs"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            source_col: b[source_col],
            "n_docs": b["n_docs"],
            "n_tokens": b["n_tokens"],
            "mean_tokens": pa.array(round6(
                b["n_tokens"].to_numpy(zero_copy_only=False) / n)),
            "mean_stopword_ratio": pa.array(round6(
                b["sw"].to_numpy(zero_copy_only=False) / n)),
            "mean_punct_ratio": pa.array(round6(
                b["pr"].to_numpy(zero_copy_only=False) / n)),
        })

    return agg.map_batches(finish, batch_format="pyarrow").sort(source_col)


PII_TOKENS = {"email": "<EMAIL>", "phone": "<PHONE>", "ipv4": "<IP>"}


def pii_redact(docs, *, id_col: str = "doc_id", text_col: str = "text"):
    """PII masking — the redaction counterpart of pii_counts: replace
    every email / phone / ipv4 occurrence with its typed token and
    count replacements. Patterns apply in PII_PATTERNS order, each
    counting + rewriting the PREVIOUS pattern's output (the SQL oracle
    chains regexp_replace identically). One vectorized RE2 count + one
    replace per pattern per batch; zero per-row Python.

    Returns (id_col, text, n_redactions)."""
    def scrub(batch: pa.Table) -> pa.Table:
        txt = _text_column(batch, text_col)
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        total = np.zeros(batch.num_rows, np.int64)
        for name, pat in PII_PATTERNS.items():
            total += pc.count_substring_regex(txt, pat) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            txt = pc.replace_substring_regex(
                txt, pattern=pat, replacement=PII_TOKENS[name])
        return pa.table({id_col: batch[id_col], "text": txt,
                         "n_redactions": pa.array(total)})

    return docs.map_batches(scrub, batch_format="pyarrow")


def readability(docs, *, id_col: str = "doc_id", text_col: str = "text"):
    """Per-doc Flesch-reading-ease-style score from regex proxies:
    words = ``\\S+`` runs, sentences = ``[.!?]+`` runs (floored at 1),
    syllables = vowel-run count ``[aeiouyAEIOUY]+`` — the cheap
    fluency screen corpus filters apply next to gopher_quality.

        flesch = 206.835 − 1.015·words/sentences − 84.6·syllables/words

    (words floored at 1 in the second ratio). Scale shape: three RE2
    count kernels per batch, no shuffle, no per-row Python."""
    import pyarrow as pa

    def score(b: pa.Table) -> pa.Table:
        txt = _text_column(b, text_col)
        w = pc.count_substring_regex(txt, r"\S+") \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        s = pc.count_substring_regex(txt, r"[.!?]+") \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        y = pc.count_substring_regex(txt, r"[aeiouyAEIOUY]+") \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        fl = (206.835 - 1.015 * w / np.maximum(s, 1.0)
              - 84.6 * y / np.maximum(w, 1.0))
        return pa.table({id_col: b[id_col],
                         "words": pa.array(w.astype(np.int64)),
                         "sentences": pa.array(s.astype(np.int64)),
                         "syllables": pa.array(y.astype(np.int64)),
                         "flesch": pa.array(round6(fl))})

    return docs.map_batches(score, batch_format="pyarrow",
                            batch_size=4096)


def freq_spectrum(docs, *, text_col: str = "text"):
    """Token frequency spectrum (count-of-counts): for each corpus
    frequency f, how many distinct lowered whitespace tokens occur
    exactly f times — the Zipf/heaps diagnostic vocabulary planners
    read (singleton mass = hapax count).

    Scale shape: per-batch factorize partials shuffle at most
    per-batch-distinct tokens (the vocab_topk combine); the second
    groupby is over distinct frequency VALUES — tiny."""
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.functions.dedup import _token_arrays
    from neo4j_graph_algorithms_ray.util import preagg_sum

    def partial(b: pa.Table) -> pa.Table:
        _, toks = _token_arrays(b[text_col])
        if len(toks) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "f": pa.array([], pa.int64())})
        codes, uniq = pd.factorize(toks)
        return pa.table({"token": pa.array(uniq, pa.string()),
                         "f": np.bincount(codes,
                                          minlength=len(uniq)).astype(np.int64)})

    counts = preagg_sum(docs.map_batches(partial, batch_format="pyarrow"),
                        ["token"], "f")
    spec = preagg_sum(counts.map_batches(
        lambda b: pa.table({"freq": b["f"],
                            "n_tokens": pa.array(np.ones(b.num_rows,
                                                         np.int64))}),
        batch_format="pyarrow"), ["freq"], "n_tokens")
    return spec.sort("freq")


class CompressionRatio:
    """(id, text) → (id, n_bytes, n_compressed, ratio): zlib(level=6)
    compressed size over utf-8 byte size — the repetition / boilerplate
    proxy quality filters use next to dup_ngram_frac (highly repetitive
    pages compress far below ~0.4). Deterministic (fixed zlib level,
    no dictionary), so results are stable across runs and workers.

    The per-doc zlib call is an opaque C kernel like the md5 hashes —
    row-at-a-time by nature but no Python-level work besides the loop;
    no SQL mirror exists (rows-only driver check + pinned pytest)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text",
                 level: int = 6):
        import zlib
        self.id_col, self.text_col, self.level = id_col, text_col, level
        self._compress = zlib.compress

    def __call__(self, batch: pa.Table) -> pa.Table:
        txt = _text_column(batch, self.text_col)
        raw = [t.encode("utf-8") if t is not None else b""
               for t in txt.to_pylist()]
        nb = np.fromiter((len(r) for r in raw), np.int64, len(raw))
        nc = np.fromiter((len(self._compress(r, self.level)) for r in raw),
                         np.int64, len(raw))
        ratio = np.where(nb > 0, nc / np.maximum(nb, 1), 0.0)
        return pa.table({self.id_col: batch[self.id_col],
                         "n_bytes": pa.array(nb), "n_compressed": pa.array(nc),
                         "ratio": pa.array(round6(ratio))})


def logreg_quality(docs, *, iterations: int = 20, lr: float = 0.5,
                   id_col: str = "doc_id", text_col: str = "text",
                   lang_col: str = "lang", pos_lang: str = "en"):
    """Distributed logistic-regression quality/language classifier —
    full-batch gradient descent, the FineWeb-style "train a cheap
    linear filter on weak labels" recipe. Features per doc (scaled to
    O(1) for conditioning): bias, chars/1e3, words/1e2, sentences/1e1,
    vowel-runs per word; label y = (lang == ``pos_lang``).

    Each iteration is one streaming pass: every batch emits the exact
    partial gradient Xᵀ(σ(Xw) − y) (+ row count and running hit count
    for accuracy), a 6-scalar Dataset.sum reduces them, and the driver
    applies w ← w − lr·g/n. Only the weight vector (5 floats) crosses
    the driver boundary per sweep. Returns one (name, value) row per
    weight plus train_accuracy — pinned by a numpy-replay pytest
    (rows-only driver check; the sigmoid iteration isn't SQL)."""
    import pyarrow as pa

    names = ["w_bias", "w_chars", "w_words", "w_sentences", "w_vowel_rate"]

    def feats(b: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        txt = _text_column(b, text_col)
        ch = pc.utf8_length(txt).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        w = pc.count_substring_regex(txt, r"\S+") \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        s = pc.count_substring_regex(txt, r"[.!?]+") \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        v = pc.count_substring_regex(txt, r"[aeiouyAEIOUY]+") \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        x = np.column_stack([np.ones_like(ch), ch / 1e3, w / 1e2, s / 1e1,
                             v / np.maximum(w, 1.0)])
        y = pc.equal(b[lang_col], pos_lang).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return x, y

    d = len(names)
    wvec = np.zeros(d)
    for _ in range(iterations):
        def grad(b: pa.Table, *, _w=wvec.copy()) -> pa.Table:
            x, y = feats(b)
            p = 1.0 / (1.0 + np.exp(-(x @ _w)))
            g = x.T @ (p - y)
            cols = {f"g{i}": [g[i]] for i in range(d)}
            cols["n"] = [float(len(y))]
            cols["hits"] = [float(np.sum((p > 0.5) == (y > 0.5)))]
            return pa.table(cols)

        cols = [f"g{i}" for i in range(d)] + ["n", "hits"]
        s = docs.map_batches(grad, batch_format="pyarrow").sum(cols)
        n = s["sum(n)"]
        wvec = wvec - lr * np.array([s[f"sum(g{i})"] for i in range(d)]) / n
    # final accuracy pass with the trained weights
    def acc(b: pa.Table, *, _w=wvec.copy()) -> pa.Table:
        x, y = feats(b)
        p = 1.0 / (1.0 + np.exp(-(x @ _w)))
        return pa.table({"n": [float(len(y))],
                         "hits": [float(np.sum((p > 0.5) == (y > 0.5)))]})

    s = docs.map_batches(acc, batch_format="pyarrow").sum(["n", "hits"])
    vals = list(round6(wvec)) + [float(round6(s["sum(hits)"] / s["sum(n)"]))]
    return pa.table({"name": pa.array(names + ["train_accuracy"]),
                     "value": pa.array(vals)})
