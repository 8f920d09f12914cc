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

# splitmix64 finalizer constants (Steele/Lea/Flajolet PRNG finalizer —
# public mixing function; spreads the polynomial hash's weak low bits)
_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)


def _splitmix64(z: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = (z + _SM_GAMMA)
        z = (z ^ (z >> np.uint64(30))) * _SM_M1
        z = (z ^ (z >> np.uint64(27))) * _SM_M2
        return z ^ (z >> np.uint64(31))


def hash64(data: bytes) -> int:
    """Scalar reference for :func:`hash64_flat`: rolling polynomial hash
    of the byte string mod 2^64 (base = FNV prime), length-mixed, then
    splitmix64-finalized. Returns uint64 as a Python int."""
    n = len(data)
    h = np.uint64(0)
    with np.errstate(over="ignore"):
        for b in data:
            h = h * _FP_BASE + np.uint64(b)
        h = h ^ np.uint64(n)
    return int(_splitmix64(np.array([h], dtype=np.uint64))[0])


def string_bytes(arr) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy view of an Arrow string array as (flat uint8 bytes,
    int64 absolute offsets[n+1] into the flat buffer)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.cast(arr, pa.large_string())
    if isinstance(arr, pa.ChunkedArray):        # cast may re-chunk
        arr = arr.combine_chunks()
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int64)[
        arr.offset: arr.offset + len(arr) + 1]
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else \
        np.empty(0, dtype=np.uint8)
    return data, offsets


def hash64_flat(data: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Vectorized :func:`hash64` over N byte strings stored flat.

    h_k = (sum_i b_i * BASE^(len_k-1-i)) mod 2^64, xor len_k, splitmix64.
    One pass: gathered powers, wrap-mod cumsum, per-segment difference
    (uint64 subtraction is exact mod 2^64) — no per-row Python."""
    n = len(offsets) - 1
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
    lo, hi = int(offsets[0]), int(offsets[-1])
    with np.errstate(over="ignore"):
        if hi > lo:
            maxlen = int(lens.max())
            powers = np.full(maxlen, _FP_BASE, dtype=np.uint64)
            powers[0] = np.uint64(1)
            powers = np.cumprod(powers)          # BASE^k mod 2^64
            idx = np.arange(lo, hi, dtype=np.int64)
            ends = np.repeat(offsets[1:], lens)   # end offset per byte
            exp = ends - 1 - idx
            vals = data[lo:hi].astype(np.uint64) * powers[exp]
            cum = np.concatenate(
                [np.zeros(1, dtype=np.uint64), np.cumsum(vals, dtype=np.uint64)])
            sums = cum[offsets[1:] - lo] - cum[offsets[:-1] - lo]
        else:
            sums = np.zeros(n, dtype=np.uint64)
        return _splitmix64(sums ^ lens.astype(np.uint64))


def hash64_batch(arr) -> np.ndarray:
    """uint64 hash per string of an Arrow string array (vectorized)."""
    data, offsets = string_bytes(arr)
    return hash64_flat(data, offsets)


_FP_BASE_INV = np.uint64(pow(int(_FP_BASE), -1, 1 << 64))


def window_hashes_flat(data: np.ndarray, offsets: np.ndarray, k: int
                       ) -> tuple[np.ndarray, np.ndarray]:
    """Every k-byte sliding-window hash within each segment of a flat
    byte array, fully vectorized (the batch shingle kernel).

    Returns (segment index int64, uint64 hash) per window; windows
    never cross segment boundaries. Each hash equals
    :func:`hash64` of the window's bytes (tested) — algebra: the base
    is odd, hence invertible mod 2^64, so with prefix sums
    P_m = sum_{j<m} b_j * BASE^(-j) every window sum
    sum b_j * BASE^(i+k-1-j) factors as (P_{i+k} - P_i) * BASE^(i+k-1)
    in exact wrap-around uint64 arithmetic — one cumsum, no per-window
    loop. Byte windows equal character windows for ASCII corpora (the
    oracle's substr operates on characters)."""
    n = len(offsets) - 1
    lo, hi = int(offsets[0]), int(offsets[-1])
    m = hi - lo
    if n == 0 or m < k:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64))
    b = data[lo:hi].astype(np.uint64)
    with np.errstate(over="ignore"):
        invp = np.full(m, _FP_BASE_INV, dtype=np.uint64)
        invp[0] = np.uint64(1)
        invp = np.cumprod(invp)                  # BASE^(-j) mod 2^64
        pref = np.concatenate([np.zeros(1, dtype=np.uint64),
                               np.cumsum(b * invp, dtype=np.uint64)])
        sums = pref[k:] - pref[:-k]              # window starts 0..m-k
        basep = np.full(m, _FP_BASE, dtype=np.uint64)
        basep[0] = np.uint64(1)
        basep = np.cumprod(basep)                # BASE^i mod 2^64
        h = _splitmix64((sums * basep[k - 1:m]) ^ np.uint64(k))
    starts = np.arange(m - k + 1, dtype=np.int64) + lo
    seg = np.searchsorted(offsets, starts, side="right").astype(np.int64) - 1
    valid = starts + k <= offsets[seg + 1]
    return seg[valid], h[valid]


def fingerprint64(text: str) -> int:
    """Deterministic 64-bit rolling-polynomial fingerprint of the
    whitespace-normalized text (stable across processes; unlike
    ``hash()``). Signed int64 for Arrow friendliness. The batch form is
    :func:`fingerprint64_batch` (bit-identical; tested)."""
    data = " ".join(tokenize(text)).encode("utf-8")
    return int(np.uint64(hash64(data)).view(np.int64))


def fingerprint64_batch(arr) -> np.ndarray:
    """Vectorized fingerprint64 over an Arrow string array -> int64[n]."""
    import pyarrow.compute as pc

    norm = pc.replace_substring_regex(
        pc.utf8_trim_whitespace(arr), r"\s+", " ")
    return hash64_batch(norm).view(np.int64)


def quality_features_batch(texts) -> dict[str, np.ndarray]:
    """Vectorized :func:`quality_features` over an Arrow string array.

    Arrow kernels only (utf8_length / count_substring_regex /
    split+list_value_length); ratios are float64 with 0.0 for empty
    text, matching the scalar form (tested bit-identical)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.int64)
    trimmed = pc.utf8_trim_whitespace(texts)
    toks = pc.list_value_length(
        pc.split_pattern_regex(trimmed, r"\s+")
    ).to_numpy(zero_copy_only=False).astype(np.int64)
    empty = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
    toks[empty] = 0
    digits = pc.count_substring_regex(texts, "[0-9]").to_numpy(
        zero_copy_only=False).astype(np.float64)
    upper = pc.count_substring_regex(texts, "[A-Z]").to_numpy(
        zero_copy_only=False).astype(np.float64)
    punct = pc.count_substring_regex(
        texts, r"[!-/:-@\[-`{-~]").to_numpy(zero_copy_only=False).astype(np.float64)
    ws = pc.count_substring_regex(texts, r"\s").to_numpy(
        zero_copy_only=False).astype(np.float64)
    nf = n.astype(np.float64)
    safe_n = np.where(n == 0, 1.0, nf)
    safe_t = np.where(toks == 0, 1.0, toks.astype(np.float64))
    return {
        "n_chars": n,
        "n_tokens": toks,
        "digit_ratio": np.where(n == 0, 0.0, digits / safe_n),
        "upper_ratio": np.where(n == 0, 0.0, upper / safe_n),
        "punct_ratio": np.where(n == 0, 0.0, punct / safe_n),
        # sum of token lengths == non-whitespace chars
        "mean_token_len": np.where(toks == 0, 0.0, (nf - ws) / safe_t),
    }


def lang_id_batch(texts) -> tuple[list[str], np.ndarray]:
    """Vectorized :func:`lang_id` over an Arrow string array ->
    (pred_lang[n], score[n]). Flattened token membership per stopword
    profile, segment-summed with bincount — no per-row Python."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_docs = len(texts)
    toks = pc.split_pattern_regex(
        pc.utf8_lower(pc.utf8_trim_whitespace(texts)), r"\s+")
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    n_toks = pc.list_value_length(toks).to_numpy(
        zero_copy_only=False).astype(np.float64)
    n_toks[n_toks == 0] = 1.0                    # only empty docs; score 0
    langs = sorted(STOPWORDS)
    scores = np.zeros((n_docs, len(langs)), dtype=np.float64)
    for j, lang in enumerate(langs):
        member = pc.is_in(
            flat, value_set=pa.array(sorted(STOPWORDS[lang]))
        ).to_numpy(zero_copy_only=False)
        if len(parent):
            hits = np.bincount(parent, weights=member.astype(np.float64),
                               minlength=n_docs)
        else:
            hits = np.zeros(n_docs)
        scores[:, j] = hits / n_toks
    best = scores.argmax(axis=1)                 # first max = sorted order,
    best_score = scores[np.arange(n_docs), best]  # same tie rule as scalar
    pred = [langs[b] if s > 0 else "und" for b, s in zip(best, best_score)]
    return pred, best_score


GOPHER_STOPWORDS = ("and", "be", "have", "of", "that", "the", "to", "with")


def gopher_rules_batch(texts) -> dict[str, np.ndarray]:
    """Vectorized Gopher/MassiveText quality-rule signals (Rae et al.,
    arXiv:2112.11446, Appendix A.1.1) over an Arrow string array:

    - ``word_count``: \\s+ tokens of the trimmed text (0 for empty),
    - ``mean_word_len``: non-whitespace chars / word_count,
    - ``symbol_ratio``: ('#' + non-overlapping '...') / word_count,
    - ``alpha_frac``: fraction of words containing [a-zA-Z],
    - ``stop_hits``: DISTINCT Gopher stopwords present (of 8).

    The reference corpus carries no newline structure, so the two
    line-level Gopher rules (bullet-start / ellipsis-end fractions)
    have no analogue here and are omitted. Arrow kernels + bincount
    segment reduces only — no per-row Python."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_docs = len(texts)
    n = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.int64)
    trimmed = pc.utf8_trim_whitespace(texts)
    toks = pc.split_pattern_regex(trimmed, r"\s+")
    wc = pc.list_value_length(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    empty = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
    wc[empty] = 0
    ws = pc.count_substring_regex(texts, r"\s").to_numpy(
        zero_copy_only=False).astype(np.int64)
    symbols = (
        pc.count_substring(texts, "#").to_numpy(
            zero_copy_only=False).astype(np.int64)
        + pc.count_substring(texts, "...").to_numpy(
            zero_copy_only=False).astype(np.int64))
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    alpha = pc.match_substring_regex(flat, "[a-zA-Z]").to_numpy(
        zero_copy_only=False)
    if len(parent):
        alpha_words = np.bincount(
            parent, weights=alpha.astype(np.float64), minlength=n_docs)
    else:
        alpha_words = np.zeros(n_docs)
    flat_lower = pc.utf8_lower(flat)
    stop_hits = np.zeros(n_docs, dtype=np.int64)
    for sw in GOPHER_STOPWORDS:
        member = pc.equal(flat_lower, sw).to_numpy(zero_copy_only=False)
        if len(parent):
            stop_hits += (np.bincount(
                parent, weights=member.astype(np.float64),
                minlength=n_docs) > 0)
    safe_wc = np.where(wc == 0, 1.0, wc.astype(np.float64))
    zero = wc == 0
    return {
        "word_count": wc,
        "mean_word_len": np.where(zero, 0.0, (n - ws) / safe_wc),
        "symbol_ratio": np.where(zero, 0.0, symbols / safe_wc),
        "alpha_frac": np.where(zero, 0.0, alpha_words / safe_wc),
        "stop_hits": stop_hits,
    }


def crc64(text: str) -> int:
    """Stable 64-bit content hash (blake2b, 8-byte digest).

    NOT a pair of crc32s: crc32(d) ^ crc32(d, alt_init) is CONSTANT for
    same-length inputs (crc is affine in the init), so a crc32-pair
    "64-bit" hash carries only 32 bits of entropy per length class —
    found in review; blake2b gives genuine 64-bit collision behavior."""
    import hashlib

    digest = hashlib.blake2b(text.encode("utf-8"), digest_size=8).digest()
    return int(np.frombuffer(digest, dtype=np.uint64)[0].view(np.int64))


def levenshtein_batch(a_list, b_list) -> "np.ndarray":
    """Batched Levenshtein (unit-cost edit distance) over string pairs.

    One DP over (max_len_a x max_len_b) positions with every cell
    operation vectorized across the BATCH axis — no per-row Python DP.
    Padded positions use per-side sentinels that can never match, and
    each row's answer is read at its own (len_a, len_b) cell, so
    padding never corrupts a result. O(La*Lb) vector ops; intended for
    short strings (words, labels); int64 output. Matches DuckDB's
    ``levenshtein``.
    """
    n = len(a_list)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    la = np.array([len(s) for s in a_list], dtype=np.int64)
    lb = np.array([len(s) for s in b_list], dtype=np.int64)
    La, Lb = int(la.max()), int(lb.max())
    A = np.full((n, max(La, 1)), -1, dtype=np.int64)
    B = np.full((n, max(Lb, 1)), -2, dtype=np.int64)
    for r, s in enumerate(a_list):
        if s:
            A[r, : len(s)] = [ord(c) for c in s]
    for r, s in enumerate(b_list):
        if s:
            B[r, : len(s)] = [ord(c) for c in s]
    dp = np.zeros((n, La + 1, Lb + 1), dtype=np.int64)
    dp[:, :, 0] = np.arange(La + 1)[None, :]
    dp[:, 0, :] = np.arange(Lb + 1)[None, :]
    for i in range(1, La + 1):
        for j in range(1, Lb + 1):
            sub = dp[:, i - 1, j - 1] + (A[:, i - 1] != B[:, j - 1])
            dele = dp[:, i - 1, j] + 1
            ins = dp[:, i, j - 1] + 1
            dp[:, i, j] = np.minimum(np.minimum(dele, ins), sub)
    return dp[np.arange(n), la, lb]


def jaro_winkler_batch(a_list, b_list) -> "np.ndarray":
    """Batched Jaro-Winkler similarity over string pairs (Winkler
    1990): standard parameters — match window floor(max_len/2)-1,
    floored half-transposition count, prefix bonus up to 4 chars at scale
    0.1 applied only when the Jaro base exceeds 0.7. Matches DuckDB's
    ``jaro_winkler_similarity`` (verified on the Winkler reference
    pairs and randomized cross-checks in tests).

    Vectorized across the BATCH axis: the greedy match scan loops
    over character POSITIONS only (O(La) iterations, each an
    (n, Lb) mask + argmax), never over rows; transpositions come
    from cumsum-compacted matched-character matrices. Intended for
    short strings (names, vocabulary words); float64 output."""
    n = len(a_list)
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    # DuckDB scores UTF-8 BYTE sequences, not codepoints — encode
    # first so multibyte text matches bit-for-bit
    ab = [s.encode("utf-8") if isinstance(s, str) else s
          for s in a_list]
    bb = [s.encode("utf-8") if isinstance(s, str) else s
          for s in b_list]
    la = np.array([len(s) for s in ab], dtype=np.int64)
    lb = np.array([len(s) for s in bb], dtype=np.int64)
    La, Lb = max(int(la.max()), 1), max(int(lb.max()), 1)
    A = np.full((n, La), -1, dtype=np.int64)
    B = np.full((n, Lb), -2, dtype=np.int64)
    for r, s in enumerate(ab):
        if s:
            A[r, : len(s)] = np.frombuffer(s, dtype=np.uint8)
    for r, s in enumerate(bb):
        if s:
            B[r, : len(s)] = np.frombuffer(s, dtype=np.uint8)
    w = np.maximum(np.maximum(la, lb) // 2 - 1, 0)
    jcol = np.arange(Lb)[None, :]
    matched_b = np.zeros((n, Lb), dtype=bool)
    # matched chars of A in i-order, compacted left
    a_ord = np.full((n, La), -1, dtype=np.int64)
    m_cnt = np.zeros(n, dtype=np.int64)
    rows = np.arange(n)
    for i in range(La):
        active = i < la
        lo = i - w
        hi = i + w
        cand = ((B == A[:, i: i + 1]) & ~matched_b
                & (jcol >= lo[:, None]) & (jcol <= hi[:, None])
                & (jcol < lb[:, None]) & active[:, None])
        has = cand.any(axis=1)
        first = cand.argmax(axis=1)
        matched_b[rows[has], first[has]] = True
        a_ord[rows[has], m_cnt[has]] = A[rows[has], i]
        m_cnt[has] += 1
    m = m_cnt.astype(np.float64)
    # matched chars of B in j-order, compacted left
    b_pos = np.cumsum(matched_b, axis=1) - 1
    b_ord = np.full((n, Lb), -1, dtype=np.int64)
    rr, cc = np.nonzero(matched_b)
    b_ord[rr, b_pos[rr, cc]] = B[rr, cc]
    k = min(La, Lb)
    trans = (a_ord[:, :k] != b_ord[:, :k]) & (a_ord[:, :k] >= 0)
    # DuckDB (jarowinkler-cpp) FLOORS the half-transposition count
    # (t = mismatches // 2), unlike Winkler's strcmp95 half count —
    # matched bit-for-bit against jaro_winkler_similarity in tests
    t = (trans.sum(axis=1) // 2).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        jaro = (m / la + m / lb + (m - t) / m) / 3.0
    jaro = np.where(m > 0, jaro, 0.0)
    # common prefix up to 4
    kp = min(4, La, Lb)
    if kp > 0:
        eq = A[:, :kp] == B[:, :kp]
        pref = np.where(eq.all(axis=1), kp, eq.argmin(axis=1))
    else:
        pref = np.zeros(n, dtype=np.int64)
    jw = np.where(jaro > 0.7,
                  jaro + pref * 0.1 * (1.0 - jaro), jaro)
    return jw
