"""Training-data preparation pipelines (chunk / scrub / repetition /
packing) — semantic properties beyond the SQL parity the driver gate
runs (tools/check_parity.py covers value equality)."""

import re

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_chunks_reconstruct_documents():
    from granulate_char_ocr_ray.pipelines.training import chunk_docs

    got = chunk_docs(SF, size=200, step=150).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    rebuilt = got.sort_values(["doc_id", "chunk_id"]).groupby("doc_id").agg(
        text=("chunk_text",
              lambda s: "".join(c[:150] for c in s[:-1]) + s.iloc[-1]))
    merged = docs.merge(rebuilt, on="doc_id", suffixes=("", "_r"))
    assert len(merged) == len(docs)
    assert (merged["text"] == merged["text_r"]).all()
    # overlap property: chunk i starts 150 chars after chunk i-1 and
    # repeats its last 50 chars
    one = got[got["doc_id"] == got.loc[got["chunk_id"] == 2,
                                       "doc_id"].iloc[0]]
    c0, c1 = one.sort_values("chunk_id")["chunk_text"].iloc[:2]
    assert c0[150:200] == c1[: len(c0) - 150]


def test_pii_redact_scrubs_everything():
    from granulate_char_ocr_ray.pipelines.training import (
        EMAIL_RE,
        PHONE_RE,
        pii_redact,
    )

    got = pii_redact(SF).to_pandas()
    assert (got["n_emails"] >= 1).all()
    assert (got["n_phones"] >= 1).all()
    joined = " ".join(got["clean_text"])
    assert not re.search(EMAIL_RE, joined)
    assert not re.search(PHONE_RE, joined)
    assert "[EMAIL]" in got["clean_text"].iloc[0]
    assert "[PHONE]" in got["clean_text"].iloc[0]


def test_repetition_stats_against_bruteforce():
    from collections import Counter

    from granulate_char_ocr_ray.pipelines.training import repetition_stats

    got = repetition_stats(SF).to_pandas().set_index("doc_id")
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    for _, row in docs.head(20).iterrows():
        toks = row["text"].strip().split()
        c = Counter(toks)
        g = got.loc[row["doc_id"]]
        assert g["n_tokens"] == len(toks)
        assert g["n_distinct"] == len(c)
        assert abs(g["dup_ratio"] - (1 - len(c) / len(toks))) < 5e-5
        assert abs(g["top_ratio"] - max(c.values()) / len(toks)) < 5e-5


def test_ngram_repetition_against_bruteforce():
    """Fixture corpus + crafted edge cases (empty, 1-token, 2-token,
    all-repeated) vs a plain-Python Counter re-derivation."""
    from collections import Counter

    from granulate_char_ocr_ray.pipelines.training import ngram_repetition

    def brute(text, n):
        toks = text.strip().split()
        grams = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        if not grams:
            return 0, 0.0, 0.0
        c = Counter(grams)
        total = len(grams)
        dup = sum(v for v in c.values() if v > 1)
        return total, max(c.values()) / total, dup / total

    got = ngram_repetition(SF).to_pandas().set_index("doc_id")
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    for _, row in docs.head(20).iterrows():
        g = got.loc[row["doc_id"]]
        for n in (2, 3):
            total, top, dup = brute(row["text"], n)
            assert g[f"n_{n}grams"] == total
            assert abs(g[f"top{n}_frac"] - top) <= 5e-5 + 1e-12
            assert abs(g[f"dup{n}_frac"] - dup) <= 5e-5 + 1e-12

    # crafted edge cases through the real pipeline (temp corpus)
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = ["", "  ", "one", "one two", "a a a a a", "x y x y x y"]
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(
            pa.table({"doc_id": list(range(len(texts))), "text": texts}),
            f"{d}/documents.parquet")
        out = ngram_repetition(d).to_pandas().set_index("doc_id")
    for i, t in enumerate(texts):
        g = out.loc[i]
        for n in (2, 3):
            total, top, dup = brute(t, n)
            assert g[f"n_{n}grams"] == total
            assert abs(g[f"top{n}_frac"] - top) <= 5e-5 + 1e-12
            assert abs(g[f"dup{n}_frac"] - dup) <= 5e-5 + 1e-12


def test_pack_sequences_offsets_and_block_invariance():
    from granulate_char_ocr_ray.pipelines.training import pack_sequences

    a = pack_sequences(SF, capacity=512, block=4096).to_pandas()
    # offsets are the exclusive prefix sum of token counts in doc order
    a = a.sort_values("doc_id").reset_index(drop=True)
    expect = np.concatenate([[0], a["n_tokens"].cumsum().to_numpy()[:-1]])
    assert (a["tok_offset"].to_numpy() == expect).all()
    assert (a["seq_id"] == a["tok_offset"] // 512).all()
    # the distributed prefix must not depend on the range partitioning
    b = pack_sequences(SF, capacity=512, block=7).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_training_corpus_writer_roundtrip(tmp_path):
    from granulate_char_ocr_ray.functions.classify import prototype_matrix
    from granulate_char_ocr_ray.functions.codecs import decode_png_gray
    from granulate_char_ocr_ray.functions.image import hash8x8_bits
    from granulate_char_ocr_ray.pipelines.training import (
        write_training_corpus,
    )

    out = str(tmp_path / "corpus")
    write_training_corpus(SF, out)
    df = pd.read_parquet(out)
    assert len(df) > 0
    assert set(df.columns) >= {"doc_id", "glyph_idx", "label",
                               "x", "y", "w", "h", "png"}
    # label-partitioned layout: one directory per class
    import os

    parts = {d for d in os.listdir(out) if d.startswith("label=")}
    assert parts == {f"label={c}" for c in df["label"].unique()}
    # every stored glyph decodes to 64x64 and classifies back to its
    # label at Hamming distance 0 (prototypes share the M6 chain)
    proto, letters = prototype_matrix(chain=True)
    sample = df.head(50)
    for _, row in sample.iterrows():
        img = decode_png_gray(row["png"])
        assert img.shape == (64, 64)
        bits = hash8x8_bits(img)
        d = (bits[None, :] != proto).sum(axis=1)
        assert letters[int(d.argmin())] == row["label"]
        assert int(d.min()) == 0


def test_augment_corpus_deterministic_and_label_preserving():
    from granulate_char_ocr_ray.functions.classify import (
        classify_features,
        prototype_matrix,
    )
    from granulate_char_ocr_ray.functions.codecs import decode_png_gray
    from granulate_char_ocr_ray.functions.image import hash8x8_bits
    from granulate_char_ocr_ray.pipelines.training import augment_corpus

    kw = dict(max_shift=2, max_angle=0.0, brightness=(0.95, 1.05),
              noise_p=0.0)
    a = augment_corpus(SF, variants=2, **kw).to_pandas().sort_values(
        ["doc_id", "glyph_idx", "variant"]).reset_index(drop=True)
    b = augment_corpus(SF, variants=2, **kw).to_pandas().sort_values(
        ["doc_id", "glyph_idx", "variant"]).reset_index(drop=True)
    assert (a["png"] == b["png"]).all()
    aug = a[a["variant"] > 0]
    assert len(aug) == 2 * len(a[a["variant"] == 0])
    # augmented variants actually differ from the original
    orig = a[a["variant"] == 0].set_index(["doc_id", "glyph_idx"])["png"]
    changed = [
        row["png"] != orig.loc[(row["doc_id"], row["glyph_idx"])]
        for _, row in aug.head(50).iterrows()
    ]
    assert np.mean(changed) > 0.5
    # mild augmentation preserves the label through the SERVING path
    # (tight_crop absorbs the translation before hashing)
    from granulate_char_ocr_ray.functions.classify import tight_crop

    proto, letters = prototype_matrix(chain=False)
    feats = np.stack([hash8x8_bits(tight_crop(decode_png_gray(p)))
                      for p in aug["png"].head(200)])
    idx, _conf = classify_features(feats, proto)
    labels = aug["label"].head(200).to_numpy()
    got = np.array([letters[i] if i >= 0 else "?" for i in idx])
    assert (got == labels).mean() >= 0.95


def test_chunk_batch_empty_and_empty_doc():
    import pyarrow as pa

    from granulate_char_ocr_ray.pipelines.training import chunk_batch

    empty = chunk_batch(pa.table({"doc_id": pa.array([], pa.int64()),
                                  "text": pa.array([], pa.string())}),
                        size=200, step=150)
    assert empty.num_rows == 0
    assert empty.schema.names == ["doc_id", "chunk_id", "start",
                                  "chunk_text"]
    # an empty DOCUMENT still yields exactly one (empty) chunk,
    # matching the SQL oracle's greatest(length, 1) range
    one = chunk_batch(pa.table({"doc_id": [7], "text": [""]}),
                      size=200, step=150).to_pandas()
    assert len(one) == 1 and one["chunk_text"].iloc[0] == ""


def test_bpe_token_counts_vs_python_re():
    import re as _re

    from granulate_char_ocr_ray.pipelines.training import (
        BPE_RE,
        bpe_token_counts,
    )

    got = bpe_token_counts(SF).to_pandas().set_index("doc_id")
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    pat = _re.compile(BPE_RE)
    for _, row in docs.head(30).iterrows():
        assert got.loc[row["doc_id"], "n_bpe_tokens"] == len(
            pat.findall(row["text"]))
    # a contraction splits off its suffix; punctuation separates
    assert pat.findall("it's fine, really") == [
        "it", "'s", " fine", ",", " really"]


def test_llm_prep_pipeline_composition():
    from granulate_char_ocr_ray.pipelines.training import llm_prep_pipeline

    got = llm_prep_pipeline(SF).to_pandas()
    import duckdb

    want = duckdb.sql(f"""
        WITH q AS (
          SELECT doc_id, text
          FROM '{SF}/documents.parquet'
          WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= 20
            AND CAST(length(regexp_replace(text, '[^A-Z]', '', 'g'))
                     AS DOUBLE) / length(text) <= 0.3
            AND trim(text) != ''
        ), d AS (
          SELECT min(doc_id) AS doc_id, text FROM q GROUP BY text
        )
        SELECT doc_id, CAST(s // 150 AS BIGINT) AS chunk_id,
               CAST(s AS BIGINT) AS start,
               substr(text, CAST(s AS INT) + 1, 200) AS chunk_text
        FROM d, UNNEST(range(0, greatest(length(text), 1), 150)) AS t(s)
        ORDER BY doc_id, chunk_id
    """).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                  check_dtype=False)
    # the gate and dedup both actually fire on this corpus
    n_docs = len(pd.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id"]))
    assert got["doc_id"].nunique() < n_docs


def test_bpe_merge_loop_reference():
    from granulate_char_ocr_ray.pipelines.training import bpe_merge_loop

    # classic BPE example: 'es' dominates, then 'est'
    wc = [("newest", 6), ("widest", 3), ("lowest", 2), ("low", 7)]
    merges = bpe_merge_loop(wc, 3)
    assert merges[0] == ("e", "s")           # 11 weighted occurrences
    assert merges[1] == ("es", "t")          # merged pair wins next
    assert len(merges) == 3


def test_learn_bpe_merges_matches_local():
    import pyarrow.dataset as pads
    from collections import Counter
    from granulate_char_ocr_ray.pipelines.training import (
        bpe_merge_loop, learn_bpe_merges)

    got = learn_bpe_merges(SF, n_merges=8).to_pandas()
    # scalar reference from the same corpus
    t = pads.dataset(f"{SF}/documents.parquet").to_table(columns=["text"])
    wc = Counter()
    for txt in t.column("text").to_pylist():
        for w in txt.split():
            wc[w] += 1
    want = bpe_merge_loop(list(wc.items()), 8)
    assert [tuple(r) for r in got[["left", "right"]].to_numpy()] == want
    assert (got["merged"] == got["left"] + got["right"]).all()


def test_mixture_manifest_matches_bruteforce():
    import numpy as np
    import pyarrow.dataset as pads
    from granulate_char_ocr_ray.pipelines.training import (
        MIXTURE_WEIGHTS, mixture_manifest)

    got = mixture_manifest(SF).to_pandas()
    docs = pads.dataset(f"{SF}/documents.parquet").to_table(
        columns=["doc_id", "lang", "n_chars"]).to_pandas()
    total = int(docs["n_chars"].sum())
    want = []
    for lang, wt in MIXTURE_WEIGHTS:
        g = docs[docs["lang"] == lang]
        if not len(g):
            continue
        budget = (total * wt) // 1000
        ids = g["doc_id"].to_numpy(dtype=np.int64)
        h = (ids.view(np.uint64) * np.uint64(2654435761)) \
            & np.uint64(0xFFFFFFFF)
        order = np.lexsort((ids, h))
        chars = g["n_chars"].to_numpy(dtype=np.int64)[order]
        before = np.concatenate(([0], np.cumsum(chars)[:-1]))
        keep = before < budget
        for d, c in zip(ids[order][keep], chars[keep]):
            want.append((lang, int(d), int(c)))
        # greedy fill: selected chars reach the budget (last doc crosses)
        assert chars[keep].sum() >= min(budget, chars.sum())
    want.sort()
    assert [(r.lang, r.doc_id, r.n_chars)
            for r in got.itertuples()] == want


def test_collapse_repeat_tokens_invariants():
    from granulate_char_ocr_ray.pipelines.training import (
        collapse_repeat_tokens)

    got = collapse_repeat_tokens(SF).to_pandas()
    import pandas as pd
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    assert len(got) == len(docs)
    merged = got.merge(docs, on="doc_id")
    removed = 0
    for row in merged.itertuples():
        toks = row.text.split(" ")
        want = [t for i, t in enumerate(toks) if i == 0 or t != toks[i - 1]]
        assert row.clean_text == " ".join(want)
        assert (row.n_tokens, row.n_kept) == (len(toks), len(want))
        removed += len(toks) - len(want)
    assert removed > 0          # the corpus exercises collapsing


def test_epoch_shuffle_order_permutation_and_determinism():
    from granulate_char_ocr_ray.pipelines.training import (
        epoch_shuffle_order)

    SF = "/root/testdata/sf0.001"
    e1a = epoch_shuffle_order(SF, epoch=1).to_pandas()
    e1b = epoch_shuffle_order(SF, epoch=1).to_pandas()
    e2 = epoch_shuffle_order(SF, epoch=2).to_pandas()
    n = len(e1a)
    # exact permutation of 1..n
    assert sorted(e1a["pos"]) == list(range(1, n + 1))
    assert sorted(e2["pos"]) == list(range(1, n + 1))
    # same epoch -> identical order; different epoch -> different order
    assert e1a.equals(e1b)
    assert not e1a["pos"].equals(e2["pos"])


def test_sanitize_text_properties():
    """Unicode hygiene: control chars gone, whitespace single-spaced,
    combining sequences NFC-composed (é not e+U+0301), counts exact."""
    import unicodedata

    from granulate_char_ocr_ray.pipelines.training import sanitize_text

    got = sanitize_text(SF).to_pandas()
    assert (got["n_ctrl"] == 1).all()  # exactly the injected BEL
    joined = "".join(got["clean_text"])
    assert not re.search(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", joined)
    assert not re.search(r"\s\s|\t|\n", joined)
    assert "́" not in joined          # composed away
    assert got["clean_text"].iloc[0].endswith(" é")
    for v in got["clean_text"].head(20):
        assert unicodedata.is_normalized("NFC", v)
        assert v == v.strip(" ")


def test_interleave_sources_round_robin():
    """Round-robin schedule: positions are a permutation; doc k of any
    source precedes doc k+1 of every source; within a round, sources
    order alphabetically."""
    from granulate_char_ocr_ray.pipelines.training import (
        interleave_sources)

    got = interleave_sources(SF).to_pandas()
    n = len(got)
    assert sorted(got["interleave_order"]) == list(range(n))
    order = got.sort_values("interleave_order")
    # rank_in_source is non-decreasing along the schedule, and ties
    # (same round) are in source order
    r = order["rank_in_source"].to_numpy()
    assert (np.diff(r) >= 0).all()
    same_round = np.diff(r) == 0
    srcs = order["source"].to_numpy()
    assert all(srcs[i] < srcs[i + 1]
               for i in np.flatnonzero(same_round))
    # per-source ranks are 0..c_s-1 in doc_id order
    for s, g in got.groupby("source"):
        g = g.sort_values("doc_id")
        assert list(g["rank_in_source"]) == list(range(len(g)))


def test_interleave_sources_block_invariance():
    """The prefix-sum range size never changes the result."""
    from granulate_char_ocr_ray.pipelines.training import (
        interleave_sources)

    a = interleave_sources(SF, block=4096).to_pandas()
    b = interleave_sources(SF, block=64).to_pandas()
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))


def test_word_blocklist_filter_bruteforce():
    from granulate_char_ocr_ray.pipelines.analysis import (
        word_blocklist_filter)

    got = word_blocklist_filter(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    bl = {"dup", "slow", "spark"}
    want = docs["text"].map(
        lambda t: sum(tok in bl for tok in t.strip(" ").lower().split()))
    merged = docs.assign(want=want).merge(got, on="doc_id")
    assert (merged["n_banned"] == merged["want"]).all()
    assert (merged["keep"] == (merged["want"] == 0)).all()
    assert (~got["keep"]).sum() > 0  # the filter actually fires


def test_tokenizers_match_sql_on_whitespace_edges(tmp_path):
    """Regression for ADVICE r03: DuckDB trim() strips spaces only, so
    a tab/newline-edged document must tokenize identically in the
    engine (space-only utf8_trim) and the SQL oracle — including the
    phantom '' token a leading tab produces and the kept/dropped
    decision for whitespace-only docs."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from granulate_char_ocr_ray.pipelines.analysis import (
        word_blocklist_filter)

    texts = ["\tdup foo", "bar baz\n", "  x  ", "", "\t", " \n ",
             "dup\tdup", "plain words"]
    sf = tmp_path
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["s0"] * len(texts)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), sf / "documents.parquet")

    got = word_blocklist_filter(str(sf)).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * "
                f"FROM '{sf}/documents.parquet'")
    import __ray_entry__ as e

    want = con.sql(e.oracle_sql()["word_blocklist_filter"]).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False)
