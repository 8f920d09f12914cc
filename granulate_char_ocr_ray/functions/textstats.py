"""Text-analysis scalar functions: token counting, quality scoring,
language ID, document fingerprinting. Pure stdlib/NumPy; vectorized
entry points operate on lists of strings (one batch).

These generalize the reference's per-document metric computations
(char/word accuracy and stats, ``evaluate_new_testdata.py:52-95``) into
the standard large-corpus text-quality toolkit.
"""

from __future__ import annotations

import re
import zlib

import numpy as np

_WS_SPLIT = re.compile(r"\s+")
_DIGITS = re.compile(r"[0-9]")
_UPPER = re.compile(r"[A-Z]")
_PUNCT = re.compile(r"[!-/:-@\[-`{-~]")

# Small stopword profiles for the n-gram/stopword language heuristic.
STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for",
           "on", "with", "as", "was", "at", "by"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu",
           "den", "von", "für", "auf", "im"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "du", "que",
           "pour", "dans", "par", "sur"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "de", "que",
           "en", "por", "para", "con"},
}


def tokenize(text: str) -> list[str]:
    """Whitespace tokenization; empty/whitespace-only -> []."""
    t = text.strip()
    return _WS_SPLIT.split(t) if t else []


def token_count(text: str) -> int:
    return len(tokenize(text))


def quality_features(text: str) -> dict[str, float]:
    """Length/character-class quality signals for corpus filtering.

    Ratios are over the raw character length (0.0 for empty text).
    """
    n = len(text)
    toks = tokenize(text)
    if n == 0:
        return {"n_chars": 0, "n_tokens": 0, "digit_ratio": 0.0,
                "upper_ratio": 0.0, "punct_ratio": 0.0, "mean_token_len": 0.0}
    return {
        "n_chars": n,
        "n_tokens": len(toks),
        "digit_ratio": len(_DIGITS.findall(text)) / n,
        "upper_ratio": len(_UPPER.findall(text)) / n,
        "punct_ratio": len(_PUNCT.findall(text)) / n,
        "mean_token_len": (sum(len(t) for t in toks) / len(toks)) if toks else 0.0,
    }


def lang_id(text: str) -> tuple[str, float]:
    """Stopword-profile language heuristic -> (lang, score).

    Score = fraction of tokens hitting the winning profile; 'und'
    (undetermined) when no profile scores > 0.
    """
    toks = [t.lower() for t in tokenize(text)]
    if not toks:
        return "und", 0.0
    best_lang, best = "und", 0.0
    for lang in sorted(STOPWORDS):
        sw = STOPWORDS[lang]
        score = sum(1 for t in toks if t in sw) / len(toks)
        if score > best:
            best_lang, best = lang, score
    return best_lang, best


_FP_BASE = np.uint64(1099511628211)       # FNV prime, used as rolling base
_FP_OFFSET = np.uint64(14695981039346656037)


def fingerprint64(text: str) -> int:
    """Deterministic 64-bit rolling-polynomial fingerprint of the
    whitespace-normalized text (stable across processes; unlike
    ``hash()``). Returned as a signed int64 for Arrow friendliness."""
    data = " ".join(tokenize(text)).encode("utf-8")
    h = _FP_OFFSET
    with np.errstate(over="ignore"):
        for b in np.frombuffer(data, dtype=np.uint8):
            h = (h ^ np.uint64(b)) * _FP_BASE
    return int(h.view(np.int64)) if isinstance(h, np.uint64) else int(np.uint64(h).astype(np.int64))


def crc64(text: str) -> int:
    """Stable 64-bit content hash (blake2b, 8-byte digest).

    NOT a pair of crc32s: crc32(d) ^ crc32(d, alt_init) is CONSTANT for
    same-length inputs (crc is affine in the init), so a crc32-pair
    "64-bit" hash carries only 32 bits of entropy per length class —
    found in review; blake2b gives genuine 64-bit collision behavior."""
    import hashlib

    digest = hashlib.blake2b(text.encode("utf-8"), digest_size=8).digest()
    return int(np.frombuffer(digest, dtype=np.uint64)[0].view(np.int64))
