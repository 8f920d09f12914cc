"""Similarity sketches: character shingles, MinHash, LSH banding,
SimHash, exact Jaccard. Deterministic (fixed-seed hash parameters),
vectorized NumPy; shared by the distributed pipelines and the pytest
brute-force cross-checks.

Algorithms follow the published formulations: MinHash resemblance
estimation (Broder, "On the resemblance and containment of documents",
1997), banded LSH for near-duplicate candidate generation (Indyk &
Motwani 1998; banding analysis as in Mining of Massive Datasets ch. 3),
and SimHash random-hyperplane fingerprints (Charikar, "Similarity
estimation techniques from rounding algorithms", STOC 2002).
"""

from __future__ import annotations

import zlib

import numpy as np

_MERSENNE = np.uint64((1 << 61) - 1)


def char_shingles(text: str, k: int = 3) -> set[str]:
    """Distinct character k-grams of the text (as-is, no normalization)."""
    if len(text) < k:
        return {text} if text else set()
    return {text[i: i + k] for i in range(len(text) - k + 1)}


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Sorted distinct uint64 base-hashes of the k-gram set (blake2b;
    a crc32-pair construction only carries 32 bits per length class —
    crc is affine in its init — so it is not used here)."""
    import hashlib

    out = set()
    for s in char_shingles(text, k):
        d = hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest()
        out.add(int.from_bytes(d, "little"))
    return np.array(sorted(out), dtype=np.uint64)


def _minhash_params(num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(1729)
    a = rng.randint(1, (1 << 61) - 1, size=num_perm).astype(np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=num_perm).astype(np.uint64)
    return a, b


_PARAM_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def minhash_signature(base_hashes: np.ndarray, num_perm: int = 128) -> np.ndarray:
    """MinHash signature (uint64[num_perm]) over the base hash set.

    h_i(x) = (a_i * x + b_i) mod (2^61 - 1); empty sets get all-max
    sentinels (never collide with real signatures)."""
    if num_perm not in _PARAM_CACHE:
        _PARAM_CACHE[num_perm] = _minhash_params(num_perm)
    a, b = _PARAM_CACHE[num_perm]
    if len(base_hashes) == 0:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    x = base_hashes % _MERSENNE
    with np.errstate(over="ignore"):
        # (num_perm, n) universal hashing; uint64 wrap-mod then Mersenne mod
        vals = (a[:, None] * x[None, :] + b[:, None]) % _MERSENNE
    return vals.min(axis=1)


def gram_hashes(text: str, k: int = 3) -> np.ndarray:
    """uint64 hash64 per (non-distinct) UTF-8 BYTE k-gram; texts whose
    encoding is shorter than ``k`` bytes hash as one whole gram. Byte
    shingling (not codepoint shingling) is deliberate: it is what the
    vectorized flat-buffer pass computes, so scalar == batch for ALL
    input including multibyte text (hypothesis-tested), and it is the
    standard choice for content-defined dedup. Scalar reference for
    :func:`minhash_signatures_batch` — min over the multiset equals min
    over the set, so distinctness is irrelevant for MinHash."""
    from .textstats import hash64

    data = text.encode("utf-8")
    if not data:
        return np.empty(0, dtype=np.uint64)
    if len(data) < k:
        return np.array([hash64(data)], dtype=np.uint64)
    return np.array(
        [hash64(data[i: i + k]) for i in range(len(data) - k + 1)],
        dtype=np.uint64,
    )


def minhash_signatures_batch(texts, k: int = 3,
                             num_perm: int = 128) -> np.ndarray:
    """Vectorized MinHash signatures for an Arrow string array ->
    uint64[(n, num_perm)]. One windowed polynomial-hash pass over the
    flat UTF-8 buffer produces every k-gram hash; permutations apply as
    a chunked (perm x grams) universal-hash matrix min-reduced per doc
    segment. No per-document Python. Matches
    ``minhash_signature(gram_hashes(t, k), num_perm)`` exactly (tested).
    """
    from .textstats import _splitmix64, string_bytes, _FP_BASE

    if num_perm not in _PARAM_CACHE:
        _PARAM_CACHE[num_perm] = _minhash_params(num_perm)
    a, b = _PARAM_CACHE[num_perm]
    data, off = string_bytes(texts)
    n = len(off) - 1
    out = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if n == 0:
        return out
    lens = off[1:] - off[:-1]
    lo = int(off[0])

    # ---- k-gram hashes for docs with len >= k: windowed poly hash ----
    long_mask = lens >= k
    gram_vals_parts: list[np.ndarray] = []
    gram_doc_parts: list[np.ndarray] = []
    if long_mask.any():
        flat = data[lo:int(off[-1])].astype(np.uint64)
        with np.errstate(over="ignore"):
            # value at flat position p (relative): poly over bytes p..p+k-1
            win = np.zeros(len(flat) - k + 1 if len(flat) >= k else 0,
                           dtype=np.uint64)
            for j in range(k):
                win = win * _FP_BASE + flat[j: len(flat) - k + 1 + j]
            win = _splitmix64(win ^ np.uint64(k))
        # valid gram start positions: within a doc, start <= end-k
        starts = np.repeat(off[:-1][long_mask] - lo,
                           (lens[long_mask] - k + 1))
        # per-gram offset within its doc
        within = np.concatenate(
            [np.arange(m) for m in (lens[long_mask] - k + 1)]
        ) if long_mask.any() else np.empty(0, dtype=np.int64)
        pos = starts + within
        gram_vals_parts.append(win[pos])
        gram_doc_parts.append(
            np.repeat(np.nonzero(long_mask)[0], (lens[long_mask] - k + 1)))

    # ---- short non-empty docs hash as one whole-text gram ----
    short_mask = (lens > 0) & (lens < k)
    if short_mask.any():
        from .textstats import hash64_flat

        idxs = np.nonzero(short_mask)[0]
        # build a compact offsets array for just the short docs
        short_lens = lens[idxs]
        s_off = np.concatenate([np.zeros(1, dtype=np.int64),
                                np.cumsum(short_lens)])
        s_data = np.concatenate(
            [data[int(off[i]): int(off[i + 1])] for i in idxs])
        gram_vals_parts.append(hash64_flat(s_data, s_off))
        gram_doc_parts.append(idxs)

    if not gram_vals_parts:
        return out
    grams = np.concatenate(gram_vals_parts)
    owners = np.concatenate(gram_doc_parts)
    order = np.argsort(owners, kind="stable")
    grams, owners = grams[order], owners[order]
    seg_docs, seg_starts = np.unique(owners, return_index=True)

    x = grams % _MERSENNE
    CHUNK = 16       # perms per pass: bounds the (chunk x tile) matrix
    TILE = 1 << 12   # grams per pass: the (CHUNK x TILE) matrix = 512 KB
    # Two-level blocking, both measured on a 320k-doc corpus:
    # - one reusable buffer + out= kernels: a fresh 100+ MB allocation
    #   per pass page-faults its whole extent every time (25.8 s/block
    #   vs ~2 s with reuse);
    # - gram TILING: an untiled (CHUNK x all-grams) matrix is ~130 MB
    #   streamed from DRAM 3x per chunk pass, and under full-node
    #   concurrency the kernel went memory-bandwidth-bound — the sig
    #   stage ran NO faster at 32 CPUs than at 8 (59 s vs 48 s), and
    #   the old untiled form measured 11x slower even single-core
    #   (38.8 s vs 3.5 s per 10k docs). Tile-size sweep: single-core
    #   mildly prefers 2^14 (3.1 s vs 3.5 s), but under 32-way
    #   concurrency the SHARED L3 is the constraint — 512 KB tiles
    #   (L2-private per core) run the 320k-doc sig stage in 10.1 s vs
    #   18.9 s at 2^14. The outer-tile/inner-chunk loop order streams
    #   the gram array from DRAM once per task, not once per chunk.
    # NumPy's constant-divisor % is faster than a Mersenne shift-add
    # fold here (the fold's extra temporaries cost more than hardware
    # division; both measured). Tiling is exact: per-tile segment mins
    # combine through np.minimum into the running signature.
    buf = np.empty((min(CHUNK, num_perm), min(TILE, len(x))),
                   dtype=np.uint64)
    with np.errstate(over="ignore"):
        for t0 in range(0, len(x), TILE):
            t1 = min(t0 + TILE, len(x))
            xt = x[t0:t1]
            # docs overlapping [t0, t1): only the first may straddle t0
            s_lo = int(np.searchsorted(seg_starts, t0, side="right")) - 1
            s_hi = int(np.searchsorted(seg_starts, t1, side="left"))
            loc = seg_starts[s_lo:s_hi] - t0
            if len(loc) and loc[0] < 0:
                loc = loc.copy()
                loc[0] = 0
            docs_t = seg_docs[s_lo:s_hi]
            for c0 in range(0, num_perm, CHUNK):
                ac, bc = a[c0: c0 + CHUNK], b[c0: c0 + CHUNK]
                v = buf[: len(ac), : t1 - t0]
                np.multiply(ac[:, None], xt[None, :], out=v)
                np.add(v, bc[:, None], out=v)
                np.mod(v, _MERSENNE, out=v)
                mins = np.minimum.reduceat(v, loc, axis=1)
                np.minimum(out[docs_t, c0: c0 + len(ac)], mins.T,
                           out=mins.T)
                out[docs_t, c0: c0 + len(ac)] = mins.T
    return out


def band_keys_batch(sigs: np.ndarray, bands: int) -> np.ndarray:
    """Vectorized LSH band keys: uint64[(n, perm)] -> int64[(n, bands)].

    Each band's rows-per-band chunk folds through splitmix64 with the
    band index mixed in, so identical chunks in DIFFERENT bands never
    share a key (the banding requirement). Scalar parity is trivial:
    this IS the definition (no separate scalar form needed)."""
    from .textstats import _splitmix64

    n, num_perm = sigs.shape
    assert num_perm % bands == 0
    r = num_perm // bands
    chunks = sigs.reshape(n, bands, r)
    h = np.broadcast_to(
        np.arange(bands, dtype=np.uint64)[None, :], (n, bands)).copy()
    for j in range(r):
        h = _splitmix64(h ^ chunks[:, :, j])
    return h.view(np.int64)


def lsh_band_keys(signature: np.ndarray, bands: int) -> list[int]:
    """Split the signature into ``bands`` rows-per-band chunks; each
    chunk hashes to one stable int key. Docs sharing any band key are
    near-dup candidates (standard MinHash-LSH)."""
    num_perm = len(signature)
    assert num_perm % bands == 0
    r = num_perm // bands
    keys = []
    for i in range(bands):
        chunk = signature[i * r: (i + 1) * r].tobytes()
        keys.append((i << 32) | zlib.crc32(chunk))
    return keys


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float((sig_a == sig_b).mean())


def exact_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    a, b = char_shingles(text_a, k), char_shingles(text_b, k)
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def token_hashes(text: str) -> np.ndarray:
    """uint64 hash per (non-distinct) lowercase whitespace token
    (textstats.hash64 — splitmix64-finalized polynomial; a crc32 pair
    is not a 64-bit hash, see shingle_hashes)."""
    from .textstats import hash64

    toks = text.lower().split()
    if not toks:
        return np.empty(0, dtype=np.uint64)
    return np.array([hash64(t.encode("utf-8")) for t in toks],
                    dtype=np.uint64)


def simhash64(text: str) -> int:
    """64-bit SimHash over token hashes (signed int64 for Arrow)."""
    hs = token_hashes(text)
    if len(hs) == 0:
        return 0
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out.astype(np.int64))


def simhash64_batch(texts) -> np.ndarray:
    """Vectorized :func:`simhash64` over an Arrow string array ->
    int64[n]. Flat token hashing (hash64_batch), bit expansion over ALL
    tokens at once, scatter-add votes per document — no per-doc Python.
    Bit-identical to the scalar form on ASCII-whitespace text (tested).
    """
    import pyarrow.compute as pc

    from .textstats import hash64_batch

    n_docs = len(texts)
    toks = pc.split_pattern_regex(
        pc.utf8_lower(pc.utf8_trim_whitespace(texts)), r"\s+")
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    hs = hash64_batch(flat)[nonempty]
    parent = parent[nonempty]
    out = np.zeros(n_docs, dtype=np.uint64)
    if len(hs):
        # parent (list_parent_indices) is non-decreasing, so per-doc
        # vote sums are contiguous segments: add.reduceat beats the
        # np.add.at scatter (which dispatches per element) and needs no
        # (n_docs, 64) dense votes table. Tiled like the minhash
        # kernel: the (tile, 64) int32 bit matrix stays L2-resident.
        seg_docs, seg_starts = np.unique(parent, return_index=True)
        votes = np.zeros((len(seg_docs), 64), dtype=np.int64)
        shifts = np.arange(64, dtype=np.uint64)[None, :]
        TILE = 1 << 11
        for t0 in range(0, len(hs), TILE):
            t1 = min(t0 + TILE, len(hs))
            bits = ((hs[t0:t1, None] >> shifts)
                    & np.uint64(1)).astype(np.int32)
            s_lo = int(np.searchsorted(seg_starts, t0, side="right")) - 1
            s_hi = int(np.searchsorted(seg_starts, t1, side="left"))
            loc = seg_starts[s_lo:s_hi] - t0
            if len(loc) and loc[0] < 0:
                loc = loc.copy()
                loc[0] = 0
            votes[s_lo:s_hi] += np.add.reduceat(2 * bits - 1, loc, axis=0)
        pos = (votes > 0).astype(np.uint64)
        out[seg_docs] = (pos << np.arange(64, dtype=np.uint64)[None, :]
                         ).sum(axis=1, dtype=np.uint64)
    return out.view(np.int64)


def simhash_band_keys_batch(sims: np.ndarray, bands: int = 4) -> np.ndarray:
    """Vectorized :func:`simhash_band_keys`: int64[n] -> int64[(n, bands)]."""
    width = 64 // bands
    u = sims.view(np.uint64) if sims.dtype == np.int64 else sims.astype(np.uint64)
    i = np.arange(bands, dtype=np.uint64)
    mask = np.uint64((1 << width) - 1)
    with np.errstate(over="ignore"):
        keys = (i[None, :] << np.uint64(56)) | (
            (u[:, None] >> (i[None, :] * np.uint64(width))) & mask)
    return keys.view(np.int64)


def hamming64(a: int, b: int) -> int:
    return bin((int(a) ^ int(b)) & ((1 << 64) - 1)).count("1")


_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def hamming64_batch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized pairwise Hamming distance of two uint64 arrays
    (XOR + byte-table popcount; one pass per pair)."""
    x = a.astype(np.uint64) ^ b.astype(np.uint64)
    out = np.zeros(len(x), dtype=np.int64)
    for s in range(0, 64, 8):
        out += _POPCNT8[((x >> np.uint64(s)) & np.uint64(0xFF)).astype(np.int64)]
    return out


def simhash_band_keys(sim: int, bands: int = 4) -> list[int]:
    """Split the 64-bit simhash into ``bands`` chunks (Charikar-style
    blocking): near-dups within Hamming distance bands-1 share >= 1 key."""
    width = 64 // bands
    u = int(sim) & ((1 << 64) - 1)
    mask = (1 << width) - 1
    return [(i << 56) | ((u >> (i * width)) & mask) for i in range(bands)]


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007) — mergeable distinct-count sketch
# ---------------------------------------------------------------------------

HLL_P = 12            # 4096 registers -> ~1.6% standard error
_HLL_M = 1 << HLL_P


def hll_create() -> np.ndarray:
    """Empty HLL register array (uint8[4096])."""
    return np.zeros(_HLL_M, dtype=np.uint8)


def hll_add_hashes(registers: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Fold uint64 hashes into the registers (vectorized; in place)."""
    if len(hashes) == 0:
        return registers
    idx = (hashes >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = hashes << np.uint64(HLL_P)
    # rank = leading zeros of the remaining 64-P bits, +1 (capped)
    rank = np.zeros(len(hashes), dtype=np.uint8)
    mask = np.ones(len(hashes), dtype=bool)
    cur = rest.copy()
    for _ in range(64 - HLL_P + 1):
        top = (cur >> np.uint64(63)) & np.uint64(1)
        stop = mask & (top == 1)
        rank[stop] = rank[stop] + 1
        cont = mask & (top == 0)
        rank[cont] += 1
        mask = cont
        cur = cur << np.uint64(1)
        if not mask.any():
            break
    np.maximum.at(registers, idx, rank)
    return registers


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Merge two sketches (element-wise max) — the associative combine
    that makes HLL shuffle-free: one sketch per batch, max-merged."""
    return np.maximum(a, b)


def hll_estimate(registers: np.ndarray) -> float:
    """Standard HLL estimator with small-range (linear counting)
    correction."""
    m = float(_HLL_M)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -registers.astype(np.float64)))
    zeros = int((registers == 0).sum())
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return float(est)


# ---------------------------------------------------------------------------
# Bloom filter — broadcastable membership sketch for semi/anti joins
# ---------------------------------------------------------------------------

def bloom_create(n_items: int, fp_rate: float = 0.01) -> np.ndarray:
    """Sized bit array (uint8-packed) for n items at the target false
    positive rate (m = -n ln p / ln2^2)."""
    m = max(64, int(-n_items * np.log(fp_rate) / (np.log(2) ** 2)))
    return np.zeros((m + 7) // 8, dtype=np.uint8)


def _bloom_positions(hashes: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """k positions per item via double hashing h1 + i*h2 (Kirsch &
    Mitzenmacher 2006)."""
    h1 = hashes
    h2 = (hashes >> np.uint64(32)) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return ((h1[:, None] + i[None, :] * h2[:, None])
                % np.uint64(m_bits)).astype(np.int64)


def bloom_add(filt: np.ndarray, hashes: np.ndarray, k: int = 7) -> np.ndarray:
    """Fold uint64 item hashes into the filter (in place)."""
    if len(hashes) == 0:
        return filt
    pos = _bloom_positions(hashes, len(filt) * 8, k).ravel()
    np.bitwise_or.at(filt, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    return filt


def bloom_contains(filt: np.ndarray, hashes: np.ndarray, k: int = 7) -> np.ndarray:
    """Vectorized membership test -> bool[n] (no false negatives)."""
    if len(hashes) == 0:
        return np.zeros(0, dtype=bool)
    pos = _bloom_positions(hashes, len(filt) * 8, k)
    bits = (filt[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return bits.all(axis=1)


# ---------------------------------------------------------------------------
# KLL-style quantile sketch (Karnin-Lang-Liberty 2016, deterministic
# compaction variant) — mergeable approximate quantiles
# ---------------------------------------------------------------------------

KLL_K = 256     # buffer capacity per level; rank error ~ O(1/k) of n


def kll_create() -> list[np.ndarray]:
    """Empty sketch: list of per-level float64 buffers. An item at
    level L represents 2^L original items."""
    return [np.empty(0, dtype=np.float64)]


def _kll_compact(levels: list[np.ndarray]) -> None:
    """Compact any over-full level: sort, keep every other element
    (even indices — DETERMINISTIC, unlike the coin-flip in the paper;
    trades a provably-unbiased estimator for run-to-run reproducibility,
    the property the test gate needs), push survivors one level up."""
    for li in range(len(levels)):
        if len(levels[li]) <= KLL_K:
            continue
        buf = np.sort(levels[li])
        keep = buf[::2]
        levels[li] = np.empty(0, dtype=np.float64)
        if li + 1 == len(levels):
            levels.append(np.empty(0, dtype=np.float64))
        levels[li + 1] = np.concatenate([levels[li + 1], keep])


def kll_add(levels: list[np.ndarray], values: np.ndarray) -> list[np.ndarray]:
    """Fold raw values into level 0 (vectorized; compacts as needed)."""
    values = np.asarray(values, dtype=np.float64)
    for lo in range(0, len(values), KLL_K):
        levels[0] = np.concatenate([levels[0], values[lo: lo + KLL_K]])
        _kll_compact(levels)
    return levels


def kll_merge(a: list[np.ndarray], b: list[np.ndarray]) -> list[np.ndarray]:
    """Merge two sketches level-wise then compact — the associative
    combine that makes distributed quantiles shuffle-free."""
    out = []
    for li in range(max(len(a), len(b))):
        va = a[li] if li < len(a) else np.empty(0, dtype=np.float64)
        vb = b[li] if li < len(b) else np.empty(0, dtype=np.float64)
        out.append(np.concatenate([va, vb]))
    _kll_compact(out)
    return out


def kll_serialize(levels: list[np.ndarray]) -> bytes:
    import struct as _s

    parts = [_s.pack("<I", len(levels))]
    for buf in levels:
        parts.append(_s.pack("<I", len(buf)))
        parts.append(np.ascontiguousarray(buf).tobytes())
    return b"".join(parts)


def kll_deserialize(data: bytes) -> list[np.ndarray]:
    import struct as _s

    (n_levels,) = _s.unpack_from("<I", data, 0)
    pos = 4
    out = []
    for _ in range(n_levels):
        (n,) = _s.unpack_from("<I", data, pos)
        pos += 4
        out.append(np.frombuffer(data, dtype=np.float64, count=n,
                                 offset=pos).copy())
        pos += 8 * n
    return out


def kll_quantiles(levels: list[np.ndarray], qs: list[float]) -> np.ndarray:
    """Approximate quantiles: weighted rank selection over all levels
    (item at level L weighs 2^L)."""
    vals = np.concatenate([b for b in levels if len(b)]) \
        if any(len(b) for b in levels) else np.empty(0)
    if len(vals) == 0:
        return np.full(len(qs), np.nan)
    wts = np.concatenate([
        np.full(len(b), float(1 << li))
        for li, b in enumerate(levels) if len(b)])
    order = np.argsort(vals, kind="stable")
    vals, wts = vals[order], wts[order]
    cum = np.cumsum(wts)
    total = cum[-1]
    out = np.empty(len(qs))
    for i, q in enumerate(qs):
        rank = q * total
        out[i] = vals[min(int(np.searchsorted(cum, rank)), len(vals) - 1)]
    return out


# ---------------------------------------------------------------------------
# Misra-Gries heavy-hitters sketch — mergeable top-k candidate counters
# ---------------------------------------------------------------------------

def mg_create() -> dict[str, int]:
    return {}


def mg_add(counters: dict[str, int], items: list[str],
           k: int = 256) -> dict[str, int]:
    """Fold items into at most ``k`` counters (Misra-Gries 1982): every
    kept count undercounts the true frequency by at most n/(k+1), so any
    item with true count > n/(k+1) is guaranteed present."""
    for it in items:
        if it in counters:
            counters[it] += 1
        elif len(counters) < k:
            counters[it] = 1
        else:
            dead = [key for key in counters if counters[key] == 1]
            for key in counters:
                counters[key] -= 1
            for key in dead:
                del counters[key]
    return counters


def mg_add_counts(counters: dict[str, int], items: list[str],
                  counts: np.ndarray, k: int = 256) -> dict[str, int]:
    """Weighted fold (pre-aggregated (item, count) pairs — the partial
    combine path: one local pandas value_counts per batch, then MG over
    the distinct items)."""
    for it, c in zip(items, counts):
        counters[it] = counters.get(it, 0) + int(c)
    if len(counters) > k:
        # subtract the (k+1)-th largest count from everything and drop
        # non-positives: keeps <= k counters and preserves the
        # undercount-bounded guarantee (the weighted MG decrement)
        vals = sorted(counters.values(), reverse=True)
        sub = vals[k]
        trimmed = {key: v - sub for key, v in counters.items() if v > sub}
        counters.clear()
        counters.update(trimmed)
    return counters


def mg_merge(a: dict[str, int], b: dict[str, int],
             k: int = 256) -> dict[str, int]:
    """Merge two MG sketches (add counts, re-trim to k) — associative
    up to the undercount bound (Agarwal et al., mergeable summaries)."""
    out = dict(a)
    for key, v in b.items():
        out[key] = out.get(key, 0) + v
    if len(out) > k:
        vals = sorted(out.values(), reverse=True)
        sub = vals[k]
        out = {key: v - sub for key, v in out.items() if v > sub}
    return out


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005) — mergeable frequency
# sketch: est(x) >= true(x) always; est(x) <= true(x) + eps*N with
# probability 1 - delta for eps = e/width, delta = exp(-depth).
# Merge of a union stream = elementwise SUM of the count matrices.
# ---------------------------------------------------------------------------

_CMS_SALTS = np.arange(1, 64, dtype=np.uint64) * np.uint64(
    0x9E3779B97F4A7C15)


def cms_create(depth: int = 4, width: int = 1024) -> np.ndarray:
    """Zeroed (depth, width) int64 count matrix."""
    return np.zeros((depth, width), dtype=np.int64)


def _cms_cols(hashes: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(depth, n) column indices: one salted xorshift remix per row."""
    h = hashes.astype(np.uint64)
    cols = np.empty((depth, len(h)), dtype=np.int64)
    with np.errstate(over="ignore"):
        for d in range(depth):
            x = h ^ _CMS_SALTS[d]
            x *= np.uint64(0xFF51AFD7ED558CCD)
            x ^= x >> np.uint64(33)
            cols[d] = (x % np.uint64(width)).astype(np.int64)
    return cols


def cms_add_hashes(sk: np.ndarray, hashes: np.ndarray,
                   counts: np.ndarray | None = None) -> np.ndarray:
    """Add pre-hashed items (optionally with multiplicities) in place;
    fully vectorized via np.add.at per row."""
    depth, width = sk.shape
    if counts is None:
        counts = np.ones(len(hashes), dtype=np.int64)
    cols = _cms_cols(hashes, depth, width)
    for d in range(depth):
        np.add.at(sk[d], cols[d], counts)
    return sk


def cms_estimate_hashes(sk: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Point estimates: min over rows of the hashed cells."""
    depth, width = sk.shape
    cols = _cms_cols(hashes, depth, width)
    ests = np.stack([sk[d][cols[d]] for d in range(depth)])
    return ests.min(axis=0)


def cms_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Sketch of the concatenated streams == elementwise sum."""
    return a + b


# --- KMV (k-minimum-values / bottom-k theta) distinct sketch ---------
#
# Beyer, Haas, Reinwald, Sismanis, Gemulla, "On synopses for
# distinct-value estimation under multiset operations" (SIGMOD 2007);
# bottom-k form of Bar-Yossef et al. 2002. Unlike HLL, a KMV sketch
# supports SET INTERSECTION estimates (the theta-sketch trick): the
# union sketch's k-th smallest hash defines a sampling threshold theta,
# and the fraction of union-sample members present in both inputs is an
# unbiased Jaccard estimate. Mergeable (union = k smallest of the
# concatenation), shuffle-free partials.

_KMV_K = 256


def kmv_from_hashes(hashes: np.ndarray, k: int = _KMV_K) -> np.ndarray:
    """Bottom-k sketch of a batch of uint64 element hashes: the k
    smallest DISTINCT hash values, sorted ascending."""
    return np.unique(hashes.astype(np.uint64))[:k]


def kmv_merge(a: np.ndarray, b: np.ndarray, k: int = _KMV_K) -> np.ndarray:
    """Union of two sketches (associative, commutative)."""
    return np.unique(np.concatenate([a, b]))[:k]


def kmv_estimate(sk: np.ndarray, k: int = _KMV_K) -> float:
    """Distinct-count estimate: exact count while the sketch is not
    yet full; else the unbiased (k-1)/U_(k) estimator with U_(k) the
    k-th smallest hash normalized to (0, 1]."""
    if len(sk) < k:
        return float(len(sk))
    theta = (float(sk[k - 1]) + 1.0) / float(1 << 64)
    return (k - 1) / theta


def kmv_jaccard(a: np.ndarray, b: np.ndarray, k: int = _KMV_K) -> float:
    """Jaccard estimate |A∩B| / |A∪B|: the union sketch is a uniform
    distinct-element sample of A∪B; count how many of its members both
    sides retain. Exact when both inputs fit in one sketch."""
    u = kmv_merge(a, b, k)
    if len(u) == 0:
        return 0.0
    both = np.intersect1d(a, b, assume_unique=True)
    n_both = int(np.isin(u, both, assume_unique=True).sum())
    return n_both / len(u)


def kmv_intersection(a: np.ndarray, b: np.ndarray,
                     k: int = _KMV_K) -> float:
    """Intersection-size estimate: Jaccard(A,B) x |A∪B| estimate."""
    return kmv_jaccard(a, b, k) * kmv_estimate(kmv_merge(a, b, k), k)
