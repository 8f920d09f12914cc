"""The BASELINE.json per-row invariant: engine output equals the
single-process oracle on (doc_id, order, kind, text, media_ref) for
every fixture corpus, in both classifier topologies."""

import pandas as pd
import pytest
import ray.data as rd

from granulate_char_ocr_ray import oracle, synth
from granulate_char_ocr_ray.pipelines.extract import (
    extract_spans,
    extract_spans_sorted,
    reassemble_docs,
)

FIXTURES = {
    "tiny": synth.docs_tiny,
    "alpha": synth.docs_alpha,
    "words": synth.docs_words,
    "interleaved": lambda: synth.docs_interleaved(100),
    "skew": synth.docs_skew,
    "edge": synth.docs_edge,
}


def _run(table, **kwargs) -> pd.DataFrame:
    ds = rd.from_arrow(table)
    return extract_spans_sorted(ds, concurrency=2, **kwargs).to_pandas().reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_engine_matches_oracle_fused(name):
    table = FIXTURES[name]()
    got = _run(table)
    want = oracle.extract_spans_table(table).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.parametrize("name", ["interleaved", "skew", "edge"])
def test_engine_matches_oracle_fanout(name):
    table = FIXTURES[name]()
    got = _run(table, mode="fanout")
    want = oracle.extract_spans_table(table).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_alpha_sweep_classifies_every_letter():
    got = _run(synth.docs_alpha())
    assert "".join(got.sort_values("doc_id")["text"]) == "ABCDEFGHIJKLMNOPQRSTUVWXYZ"


def test_word_corpus_classifies_perfectly():
    got = _run(synth.docs_words())
    words = [r[len("glyph:"):] for r in got["media_ref"]]
    assert got["text"].tolist() == words


def test_reassembled_docs():
    table = synth.docs_tiny()
    spans = extract_spans(rd.from_arrow(table), concurrency=2)
    docs = reassemble_docs(spans).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(docs) == 8
    want = oracle.extract_spans_table(table).to_pandas()
    for _, row in docs.iterrows():
        expected = " ".join(
            t for t in want[want["doc_id"] == row["doc_id"]].sort_values("order")["text"] if t
        )
        assert row["text"] == expected
    assert (docs["avg_confidence"] == 1.0).all()  # tiny is all text-like


def test_order_restoration_under_rotation():
    # docs_interleaved stores spans rotated; output must be offset-ordered
    got = _run(synth.docs_interleaved(30))
    for _, g in got.groupby("doc_id"):
        assert g["order"].tolist() == sorted(g["order"].tolist())
        assert g["order"].tolist() == list(range(len(g)))
