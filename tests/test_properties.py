"""Property-based tests (hypothesis) for the pure kernels: codecs
round-trip on arbitrary inputs, batch hashes equal scalar hashes on
arbitrary strings, sketches respect their published bounds."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

TEXT = st.text(
    alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FF),
    max_size=200,
)


@settings(max_examples=60, deadline=None)
@given(st.lists(TEXT, min_size=0, max_size=20))
def test_hash64_batch_equals_scalar(texts):
    import pyarrow as pa

    from granulate_char_ocr_ray.functions.textstats import hash64, hash64_batch

    got = hash64_batch(pa.array(texts, pa.string()))
    for t, h in zip(texts, got):
        assert hash64(t.encode("utf-8")) == int(h)


@settings(max_examples=60, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=12))
def test_minhash_batch_equals_scalar(texts):
    import pyarrow as pa

    from granulate_char_ocr_ray.functions.sketch import (
        gram_hashes,
        minhash_signature,
        minhash_signatures_batch,
    )

    sigs = minhash_signatures_batch(pa.array(texts, pa.string()),
                                    k=3, num_perm=32)
    for i, t in enumerate(texts):
        ref = minhash_signature(gram_hashes(t, 3), 32)
        assert np.array_equal(sigs[i], ref), t


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 4),
       st.integers(0, 2**32 - 1))
def test_png_gray_roundtrip_random(h, w, filt, seed):
    from granulate_char_ocr_ray.functions.codecs import (
        decode_png_gray,
        encode_png_gray,
    )

    img = np.random.RandomState(seed).randint(
        0, 256, size=(h, w), dtype=np.uint8)
    assert np.array_equal(decode_png_gray(encode_png_gray(img, filt)), img)


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 5000), st.integers(0, 2**32 - 1))
def test_wav_roundtrip_random(n, seed):
    from granulate_char_ocr_ray.functions.codecs import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    samples = np.random.RandomState(seed).randint(
        -32768, 32768, size=n).astype(np.int16)
    got, rate = decode_wav_pcm16(encode_wav_pcm16(samples, 8000))
    assert rate == 8000
    assert np.array_equal(got, samples)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=1,
                max_size=2000))
def test_kll_quantiles_within_rank_bound(values):
    from granulate_char_ocr_ray.functions.sketch import (
        kll_add,
        kll_create,
        kll_quantiles,
    )

    vals = np.array(values, dtype=np.float64)
    sk = kll_create()
    kll_add(sk, vals)
    vals.sort()
    n = len(vals)
    for q in (0.25, 0.5, 0.75):
        est = kll_quantiles(sk, [q])[0]
        lo = np.searchsorted(vals, est, side="left")
        hi = np.searchsorted(vals, est, side="right")
        target = q * n
        # the estimate's rank INTERVAL is [lo, hi] (duplicates widen
        # it); error is the distance from the target to that interval,
        # and rank error is quantized to 1/n at tiny n
        err = (0.0 if lo <= target <= hi
               else min(abs(lo - target), abs(hi - target)) / n)
        assert err <= max(0.05, 1.0 / n), (q, est, err)


ASCII_TEXT = st.text(
    alphabet=st.characters(min_codepoint=1, max_codepoint=0x7F),
    max_size=200,
)


@settings(max_examples=40, deadline=None)
@given(st.lists(ASCII_TEXT, min_size=0, max_size=15))
def test_simhash_batch_equals_scalar_ascii_ws(texts):
    # ASCII alphabet: beyond it, Arrow utf8_lower and Python str.lower
    # disagree on special-casing codepoints (e.g. U+0130 'İ'), and
    # str.split treats more codepoints as whitespace than RE2 \s —
    # the documented ASCII scope of the batch tokenizer kernels
    import pyarrow as pa

    from granulate_char_ocr_ray.functions.sketch import (
        simhash64,
        simhash64_batch,
    )

    # restrict to inputs whose whitespace is the RE2 \s set (the batch
    # form splits on ASCII \s; Python str.split additionally treats
    # \x1c-\x1f, \x85 and unicode spaces as separators — the documented
    # ASCII-whitespace scope of the batch kernels)
    re2_ws = set("\t\n\x0c\r ")     # RE2 \s excludes \x0b (vertical tab)
    texts = ["".join(c for c in t if (not c.isspace()) or c in re2_ws)
             for t in texts]
    got = simhash64_batch(pa.array(texts, pa.string()))
    for t, s in zip(texts, got):
        assert simhash64(t) == int(s), repr(t)


@settings(max_examples=60, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=10),
       st.integers(min_value=1, max_value=30),
       st.integers(min_value=0, max_value=20))
def test_chunk_batch_reconstructs_and_bounds(texts, step, extra):
    import pyarrow as pa

    from granulate_char_ocr_ray.pipelines.training import chunk_batch

    size = step + extra
    batch = pa.table({"doc_id": list(range(len(texts))),
                      "text": pa.array(texts, pa.string())})
    out = chunk_batch(batch, size=size, step=step).to_pandas()
    for i, t in enumerate(texts):
        rows = out[out["doc_id"] == i].sort_values("chunk_id")
        # starts are exactly 0, step, ... < max(len, 1)
        assert list(rows["start"]) == list(range(0, max(len(t), 1), step))
        # each chunk is the python slice, and stepped prefixes + the
        # last chunk reconstruct the document
        for r in rows.itertuples():
            assert r.chunk_text == t[r.start:r.start + size]
        chunks = list(rows["chunk_text"])
        assert "".join(c[:step] for c in chunks[:-1]) + chunks[-1] == t


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(TEXT, TEXT), min_size=0, max_size=12))
def test_levenshtein_batch_equals_scalar_dp(pairs):
    from granulate_char_ocr_ray.functions.textstats import levenshtein_batch

    def scalar(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[len(b)]

    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = levenshtein_batch(a, b)
    for x, y, d in zip(a, b, got):
        assert scalar(x, y) == int(d)


def test_window_hashes_match_scalar_hash64():
    import numpy as np
    import pyarrow as pa
    from granulate_char_ocr_ray.functions.textstats import (
        hash64, string_bytes, window_hashes_flat)

    texts = ["hello world abc", "xy", "", "the quick brown fox", "aaaaaaa"]
    arr = pa.array(texts)
    data, offsets = string_bytes(arr)
    for k in (3, 7, 8):
        seg, h = window_hashes_flat(data, offsets, k)
        exp_seg, exp_h = [], []
        for i, t in enumerate(texts):
            bs = t.encode()
            for j in range(len(bs) - k + 1):
                exp_seg.append(i)
                exp_h.append(hash64(bs[j:j + k]))
        assert list(seg) == exp_seg
        assert [int(x) for x in h] == exp_h


@settings(max_examples=80, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 15), st.integers(0, 15)),
                min_size=1, max_size=40))
def test_skyline_block_matches_bruteforce(pts):
    import pandas as pd

    from granulate_char_ocr_ray.pipelines.relational import _skyline_block

    df = pd.DataFrame({
        "p_partkey": range(len(pts)),
        "p_retailprice": [float(a) for a, _ in pts],
        "p_size": [b for _, b in pts]})
    got = set(_skyline_block(df)["p_partkey"])
    exp = set()
    for i, (pi, si) in enumerate(pts):
        dominated = any(
            (pj <= pi and sj >= si and (pj < pi or sj > si))
            for j, (pj, sj) in enumerate(pts) if j != i)
        if not dominated:
            exp.add(i)
    assert got == exp


@settings(max_examples=80, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 100), st.integers(0, 30)),
                min_size=1, max_size=30))
def test_merge_intervals_matches_bruteforce(raw):
    import pandas as pd

    from granulate_char_ocr_ray.pipelines.events import _merge_intervals

    iv = [(s, s + d) for s, d in raw]
    df = pd.DataFrame({"s": [s for s, _ in iv], "e": [e for _, e in iv]})
    # associativity: merging a random split then re-merging == one merge
    half = len(df) // 2
    two_step = _merge_intervals(
        pd.concat([_merge_intervals(df.iloc[:half]),
                   _merge_intervals(df.iloc[half:])]))
    one_step = _merge_intervals(df)
    assert one_step.values.tolist() == two_step.values.tolist()
    # brute-force sweep: merge when start <= running max end
    islands = []
    for s, e in sorted(iv):
        if islands and s <= islands[-1][1]:
            islands[-1][1] = max(islands[-1][1], e)
        else:
            islands.append([s, e])
    got = [[int(r.s), int(r.e)] for r in one_step.itertuples()]
    assert got == islands


def test_silence_segment_stage_known_bursts():
    """One 50ms burst + 50ms silence per letter at 16kHz/25ms frames:
    n_frames = 4k, n_segments = k, voiced_frac = 0.5."""
    import base64

    import numpy as np
    import pyarrow as pa

    from granulate_char_ocr_ray.functions.codecs import encode_wav_pcm16
    from granulate_char_ocr_ray.pipelines.media import SilenceSegmentStage

    k = 3
    burst = np.concatenate([np.full(800, 1000, dtype=np.int16),
                            np.zeros(800, dtype=np.int16)])
    wav = encode_wav_pcm16(np.tile(burst, k))
    batch = pa.Table.from_pydict({
        "doc_id": ["doc-x"],
        "media_ref": ["wavb64:" + base64.b64encode(wav).decode()]})
    out = SilenceSegmentStage()(batch).to_pydict()
    assert out["n_frames"] == [4 * k]
    assert out["n_segments"] == [k]
    assert out["voiced_frac"] == [0.5]


@given(st.integers(min_value=1, max_value=500),
       st.integers(min_value=1, max_value=12))
@settings(max_examples=60, deadline=None)
def test_ntile_of_rank0_matches_sql_semantics(n, k):
    """SQL NTILE: first n%k buckets get ceil(n/k) rows, rest floor."""
    import numpy as np

    from granulate_char_ocr_ray.pipelines.relational import (
        _ntile_of_rank0)

    tiles = _ntile_of_rank0(np.arange(n, dtype=np.int64), n, k)
    # non-decreasing, 1-based, spans exactly min(n, k) buckets
    assert tiles[0] == 1
    assert np.all(np.diff(tiles) >= 0)
    assert tiles[-1] == min(n, k)
    q, r = divmod(n, k)
    sizes = np.bincount(tiles)[1:]
    for b, s in enumerate(sizes, start=1):
        assert s == (q + 1 if b <= r else q)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(TEXT, TEXT), min_size=0, max_size=12))
def test_jaro_winkler_batch_matches_duckdb(pairs):
    """Bit-exact vs DuckDB's jaro_winkler_similarity (the
    jarowinkler-cpp semantics: floored half-transpositions, 0.7
    boost threshold, 4-char prefix cap)."""
    import duckdb

    from granulate_char_ocr_ray.functions.textstats import (
        jaro_winkler_batch)

    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = jaro_winkler_batch(a, b)
    con = duckdb.connect()
    for x, y, s in zip(a, b, got):
        exp = con.execute("SELECT jaro_winkler_similarity(?, ?)",
                          [x, y]).fetchone()[0]
        assert s == exp


# ---- fast HTML extractor == stdlib HTMLParser stack machine ----

_HTML_ATOMS = [
    "<main>", "</main>", "<article>", "</article>", "<div>", "</div>",
    "<p>", "</p>", "<script>", "</script>", "<style>", "</style>",
    "<nav>", "</nav>", "<header>", "</header>", "<footer>", "</footer>",
    "<br>", "<img src='x'>", "<a href='/'>", "</a>", "<main/>",
    "<div/>", "<!DOCTYPE html>", "<?pi data?>", "<!-- a comment -->",
    "<P>", "</P>", "<SCRIPT>", "</SCRIPT>", "< ", "<3", "&amp;",
    "&lt;tag&gt;", "a b", "x", " ", "if (a<b) {}", 'title="a>b"',
    "<em title=\"a>b\">", "<em title='a>b'>", "</em>",
    "<svg:rect>", "</svg:rect>", "<o:p>", "</o:p>", "</ p>", "</3>",
    "<p >", "</p attr>", "<p-x>", "</p-x>", "</ script>", "</ SCRIPT >",
    "</ main >", "</scriptx>", "</script foo>", "<script/>", "<>",
    "</>", "<!x>", "&#65;", "&bogus;", "<title>", "</title>", "\n",
]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.sampled_from(_HTML_ATOMS), min_size=0, max_size=30))
def test_fast_html_extractor_matches_stdlib(atoms):
    """The regex fast path of extract_html_main must reproduce the
    stdlib HTMLParser machine on an adversarial grammar (nested and
    unbalanced tags, boilerplate, main/article, void elements,
    self-closing, declarations, PIs, comments, literal '<', charrefs,
    rawtext script bodies, and quoted '>' attributes that force the
    bail path)."""
    from granulate_char_ocr_ray.functions.textext import (
        _extract_html_main_slow,
        extract_html_main,
    )

    payload = "".join(atoms)
    assert extract_html_main(payload) == _extract_html_main_slow(payload)


@settings(max_examples=80, deadline=None)
@given(st.lists(st.lists(st.sampled_from(["text", "html", "pdf", "media"]),
                         min_size=0, max_size=12),
                min_size=0, max_size=10),
       st.integers(1, 6))
def test_whale_flags_match_per_row_count(kind_lists, threshold):
    """The vectorized whale detector (list-offset cumsum differencing)
    equals a plain per-row count on arbitrary span-kind layouts,
    including empty span lists and empty batches."""
    import pyarrow as pa

    from granulate_char_ocr_ray.pipelines.extract import _whale_flags
    from granulate_char_ocr_ray.schema import DOCS_SCHEMA

    rows = [{"doc_id": f"d{i}",
             "spans": [{"kind": k, "text": "", "media_ref": "",
                        "offset": j}
                       for j, k in enumerate(kinds)]}
            for i, kinds in enumerate(kind_lists)]
    batch = pa.Table.from_pylist(rows, schema=DOCS_SCHEMA)
    got = list(_whale_flags(batch, threshold))
    want = [sum(k == "media" for k in kinds) >= threshold
            for kinds in kind_lists]
    assert got == want
