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
