"""Vectorized text kernels: tokenization, fingerprinting, language ID,
quality scoring — the text-analysis operator family a training-data
pipeline needs (task brief), expressed batch-first.

The tokenizer rule (non-whitespace runs, ``\\S+``) is shared verbatim
with the DuckDB oracle (``regexp_extract_all(text, '\\S+')``) so token
counts match exactly.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

_TOKEN_RE = re.compile(r"\S+")

# tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic (public-knowledge approach: stopword hit-rate voting)
_LANG_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to a in is it you that for on with as".split()),
    "de": frozenset("der die das und ist ich nicht mit sich auf für ein eine".split()),
    "fr": frozenset("le la les et de un une est pas pour que dans sur".split()),
    "es": frozenset("el la los las y de un una es no por que en con".split()),
}

_STOP_EN = _LANG_STOPWORDS["en"]


def token_count(texts: pd.Series) -> np.ndarray:
    """Whitespace token count; matches the SQL oracle's
    ``len(regexp_extract_all(text, '\\S+'))`` exactly (empty → 0)."""
    return texts.fillna("").str.count(r"\S+").to_numpy(dtype=np.int64)


def token_fingerprint(texts: pd.Series, k: int = 5) -> pd.Series:
    """First-k-token fingerprint (document clustering key); SQL mirror:
    ``array_to_string(regexp_extract_all(text,'\\S+')[1:k], ' ')``."""
    return (
        texts.fillna("")
        .str.findall(_TOKEN_RE)
        .map(lambda ts: " ".join(ts[:k]))
    )


def lang_id(texts: pd.Series) -> pd.Series:
    """Stopword-voting language ID over the supported set; returns
    'und' (undetermined) when no language scores > 0."""
    def _one(t: str) -> str:
        toks = _TOKEN_RE.findall(t.lower())
        if not toks:
            return "und"
        best_lang, best = "und", 0
        for lang, stops in _LANG_STOPWORDS.items():
            score = sum(1 for w in toks if w in stops)
            if score > best:
                best_lang, best = lang, score
        return best_lang

    return texts.fillna("").map(_one)


def quality_scores(texts: pd.Series) -> pd.DataFrame:
    """Heuristic document-quality features (length, alpha ratio,
    stopword ratio, mean token length) + a composite [0,1] score —
    the usual pretraining-corpus filters, batch-vectorized."""
    t = texts.fillna("")
    n_chars = t.str.len().to_numpy(dtype=np.int64)
    toks = t.str.findall(_TOKEN_RE)
    n_tokens = toks.map(len).to_numpy(dtype=np.int64)
    alpha = t.str.count(r"[A-Za-z]").to_numpy(dtype=np.int64)
    stop_hits = toks.map(
        lambda ws: sum(1 for w in ws if w.lower() in _STOP_EN)
    ).to_numpy(dtype=np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        alpha_ratio = np.where(n_chars > 0, alpha / np.maximum(n_chars, 1), 0.0)
        stop_ratio = np.where(n_tokens > 0, stop_hits / np.maximum(n_tokens, 1), 0.0)
        mean_tok_len = np.where(
            n_tokens > 0,
            (n_chars - np.maximum(n_tokens - 1, 0)) / np.maximum(n_tokens, 1),
            0.0,
        )
    score = np.clip(
        0.25 * (n_tokens >= 5)
        + 0.25 * np.clip(alpha_ratio / 0.6, 0, 1)
        + 0.25 * np.clip(stop_ratio / 0.2, 0, 1)
        + 0.25 * np.clip(mean_tok_len / 4.0, 0, 1),
        0.0,
        1.0,
    )
    return pd.DataFrame(
        {
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "alpha_ratio": alpha_ratio,
            "stop_ratio": stop_ratio,
            "quality": score,
        }
    )


def rolling_fingerprint64(texts: pd.Series) -> np.ndarray:
    """Deterministic 64-bit rolling-hash document fingerprint
    (polynomial rolling hash over tokens, public-knowledge scheme)."""
    out = np.empty(len(texts), dtype=np.int64)
    M = (1 << 61) - 1
    for i, t in enumerate(texts.fillna("")):
        h = 0
        for tok in _TOKEN_RE.findall(t):
            th = 0
            for ch in tok:
                th = (th * 131 + ord(ch)) % M
            h = (h * 1_000_003 + th) % M
        out[i] = np.int64(h & 0x7FFFFFFFFFFFFFFF)
    return out


def repetition_stats(texts: pd.Series) -> pd.DataFrame:
    """Within-document REPETITION signals (the Gopher/MassiveText
    quality-filter family, Rae et al. 2021 — public): token and
    bigram type counts plus the modal token/bigram occurrence count.
    All INTEGER outputs (consumers derive fractions like
    top_bigram_n / n_bigrams), so the SQL oracle replays hash-exact;
    only the modal COUNT is emitted, so gram ties need no tie-break
    at all."""
    n_tok, n_dtok, top_tok = [], [], []
    n_bi, n_dbi, top_bi = [], [], []
    for t in texts.fillna(""):
        toks = _TOKEN_RE.findall(t)
        n_tok.append(len(toks))
        tc: dict[str, int] = {}
        for w in toks:
            tc[w] = tc.get(w, 0) + 1
        n_dtok.append(len(tc))
        top_tok.append(max(tc.values()) if tc else 0)
        bis = list(zip(toks[:-1], toks[1:]))
        n_bi.append(len(bis))
        bc: dict[tuple[str, str], int] = {}
        for b in bis:
            bc[b] = bc.get(b, 0) + 1
        n_dbi.append(len(bc))
        top_bi.append(max(bc.values()) if bc else 0)
    return pd.DataFrame(
        {
            "n_tokens": np.asarray(n_tok, dtype=np.int64),
            "n_distinct_tokens": np.asarray(n_dtok, dtype=np.int64),
            "top_token_n": np.asarray(top_tok, dtype=np.int64),
            "n_bigrams": np.asarray(n_bi, dtype=np.int64),
            "n_distinct_bigrams": np.asarray(n_dbi, dtype=np.int64),
            "top_bigram_n": np.asarray(top_bi, dtype=np.int64),
        }
    )
