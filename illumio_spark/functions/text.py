"""Text-analysis operators for training-data pipelines.

JVM column expressions where built-ins suffice (token counts, quality
ratios); Arrow-batched pandas UDFs (numpy-vectorized, never per-row
Python loops over rows) where they don't (simhash, language n-gram
scoring, rolling-hash fingerprints).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, functions as F, types as T
from pyspark.sql.functions import pandas_udf

# ---------------------------------------------------------------------------
# JVM-side building blocks
# ---------------------------------------------------------------------------


def token_count(text: Column) -> Column:
    """Whitespace token count (BPE-ish regex variant below)."""
    return F.size(F.split(F.trim(text), r"\s+"))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: words + punctuation as separate tokens."""
    return F.size(F.regexp_extract_all(text, F.lit(r"\w+|[^\w\s]"), 0))


def quality_columns(text: Column) -> dict[str, Column]:
    """Cheap quality signals: length, word count, chars/word, punct ratio."""
    n_chars = F.length(text)
    n_words = token_count(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[.,!?;:]", ""))
    # try_divide: empty text (n_chars = 0) must yield NULL, not a
    # DIVIDE_BY_ZERO abort under Spark 4's default ANSI mode
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "chars_per_word": F.round(F.try_divide(n_chars.cast("double"), n_words), 4),
        "punct_ratio": F.round(F.try_divide(n_punct.cast("double"), n_chars), 6),
    }


STOPWORDS_EN = ["the", "a", "of", "and", "to", "in", "is"]


def stopword_count(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(w) for w in (stopwords or STOPWORDS_EN)])
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    return F.size(F.filter(toks, lambda w: F.array_contains(sw, w)))


# ---------------------------------------------------------------------------
# pandas-UDF operators (Arrow-batched, numpy-vectorized)
# ---------------------------------------------------------------------------

_SIMHASH_BITS = 64
_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _token_hashes(tokens: list[str]) -> np.ndarray:
    """FNV-1a 64-bit per token (pure numpy, deterministic)."""
    out = np.empty(len(tokens), dtype=np.uint64)
    with np.errstate(over="ignore"):  # uint64 wrap is the FNV contract
        for i, t in enumerate(tokens):
            h = _FNV_OFFSET
            for b in t.encode("utf-8"):
                h = (h ^ np.uint64(b)) * _FNV_PRIME
            out[i] = h
    return out


@pandas_udf(T.LongType())
def simhash(text: pd.Series) -> pd.Series:
    """64-bit SimHash per document: sign-sum of token hash bits."""
    bit_cols = (np.uint64(1) << np.arange(_SIMHASH_BITS, dtype=np.uint64))[None, :]

    def one(t):
        if not isinstance(t, str) or not t.strip():
            return 0
        hs = _token_hashes(list(dict.fromkeys(t.split())))
        bits = (hs[:, None] & bit_cols) != 0  # (n_tok, 64) bool
        votes = np.where(bits, 1, -1).sum(axis=0)
        sig = np.uint64(0)
        sig = (bit_cols[0] * (votes > 0)).sum(dtype=np.uint64)
        return int(sig.astype(np.int64))  # two's-complement into LongType

    return text.map(one)


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


_LANG_MARKERS = {
    "en": ["the", "and", "of", "is", "was"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "est", "pas"],
    "es": ["el", "la", "que", "es", "los"],
}


@pandas_udf(T.StringType())
def lang_guess(text: pd.Series) -> pd.Series:
    """Marker-word language ID (vectorized str.count per marker).

    CJK-codepoint presence short-circuits to 'zh'."""
    low = text.fillna("").str.lower()
    scores = pd.DataFrame(index=low.index)
    for lang, words in _LANG_MARKERS.items():
        s = None
        for w in words:
            c = low.str.count(rf"\b{w}\b")
            s = c if s is None else s + c
        scores[lang] = s
    best = scores.idxmax(axis=1).where(scores.max(axis=1) > 0, "unk")
    cjk = low.str.contains(r"[一-鿿]", regex=True)
    return best.mask(cjk, "zh")


@pandas_udf(T.LongType())
def rolling_fingerprint(text: pd.Series) -> pd.Series:
    """Polynomial rolling-hash document fingerprint (numpy Horner)."""
    base = np.uint64(1000003)

    def one(t):
        if not isinstance(t, str) or not t:
            return 0
        arr = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        # h = Σ byte[i]·base^(n-1-i) mod 2^64 — fully vectorized wrap arithmetic
        with np.errstate(over="ignore"):
            pows = np.empty(len(arr), dtype=np.uint64)
            pows[0] = 1
            np.cumprod(np.full(len(arr) - 1, base, dtype=np.uint64), out=pows[1:])
            h = (arr * pows[::-1]).sum(dtype=np.uint64)
        return int(h.astype(np.int64))

    return text.map(one)
