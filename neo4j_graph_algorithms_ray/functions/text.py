"""Text-analysis stages for large-scale training-data pipelines:
token counting, quality scoring, language ID, fingerprinting.

All are stateless-per-batch but regex/stopword state is compiled once
per actor (`__init__`), so they run as actor-pool map_batches stages.
Semantics are pinned so the DuckDB oracles can replicate them exactly
(see pipelines/oracles_docs.py): tokens = maximal ``\\S+`` runs of the
*trimmed* text; ratios rounded half-away-from-zero at 6 decimals.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

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


class TokenCount:
    """(id, text) → (id, n_tokens). Whitespace tokenization."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col
        self.pat = re.compile(r"\S+")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[self.text_col].map(lambda t: len(self.pat.findall(t or "")))
        return pd.DataFrame({self.id_col: batch[self.id_col],
                             "n_tokens": toks.astype(np.int64)})


class QualityScore:
    """(id, text) → per-doc quality features: n_chars, n_tokens,
    mean_token_len, stopword_ratio (English list), punct_ratio.
    The shape of the reference-free heuristics used for corpus filtering."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col
        self.tok = re.compile(r"\S+")
        self.stop = set(STOPWORDS["en"])

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, rows = batch[self.id_col], batch[self.text_col]
        n_chars = rows.str.len().astype(np.int64)
        toks = rows.map(lambda t: self.tok.findall(t or ""))
        n_tok = toks.map(len).astype(np.int64)
        tok_chars = toks.map(lambda ts: sum(len(t) for t in ts))
        mean_len = np.where(n_tok > 0, tok_chars / np.maximum(n_tok, 1), 0.0)
        stop_hits = toks.map(lambda ts: sum(1 for t in ts if t.lower() in self.stop))
        stop_ratio = np.where(n_tok > 0, stop_hits / np.maximum(n_tok, 1), 0.0)
        punct = rows.map(lambda t: sum(1 for ch in (t or "") if ch in PUNCT))
        punct_ratio = np.where(n_chars > 0, punct / np.maximum(n_chars, 1), 0.0)
        return pd.DataFrame({
            self.id_col: ids, "n_chars": n_chars, "n_tokens": n_tok,
            "mean_token_len": round6(mean_len),
            "stopword_ratio": round6(stop_ratio),
            "punct_ratio": round6(punct_ratio),
        })


class LangId:
    """N-gram-free heuristic language ID: stopword hit counts per
    language; predicted lang = argmax hits (alphabetical tie-break),
    'und' when no hits."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col
        self.tok = re.compile(r"\S+")
        self.langs = sorted(STOPWORDS)
        self.sets = {lang: set(ws) for lang, ws in STOPWORDS.items()}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        def pred(t: str) -> str:
            toks = [w.lower() for w in self.tok.findall(t or "")]
            hits = {lang: sum(1 for w in toks if w in self.sets[lang])
                    for lang in self.langs}
            m = max(hits.values()) if hits else 0
            if m == 0:
                return "und"
            return min(lang for lang, h in hits.items() if h == m)

        return pd.DataFrame({self.id_col: batch[self.id_col],
                             "pred_lang": batch[self.text_col].map(pred)})


class Fingerprint:
    """Deterministic document fingerprint: md5 hex of the normalized
    text (lowercase, whitespace collapsed to single spaces, trimmed)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col
        self.ws = re.compile(r"\s+")

    def normalize(self, t: str) -> str:
        # collapse first, then strip: matches the SQL
        # trim(regexp_replace(lower(text), '\s+', ' ', 'g')) exactly
        return self.ws.sub(" ", (t or "").lower()).strip(" ")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        fp = batch[self.text_col].map(
            lambda t: hashlib.md5(self.normalize(t).encode("utf-8")).hexdigest())
        return pd.DataFrame({self.id_col: batch[self.id_col], "fingerprint": fp})
