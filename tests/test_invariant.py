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


@pytest.mark.parametrize("name", ["interleaved", "skew", "edge"])
def test_engine_matches_oracle_auto(name):
    """mode="auto" detects whale docs and salts only their media spans;
    identity must hold whether the whale arm is populated (skew: one
    40-media-span doc clears the threshold), empty (interleaved/edge:
    nothing clears it), or mixed."""
    table = FIXTURES[name]()
    got = _run(table, mode="auto")
    want = oracle.extract_spans_table(table).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_auto_mode_whale_detection_routes_exactly_once():
    """Every span of a mixed whale/normal corpus appears exactly once
    regardless of which arm handled it, including at a threshold that
    splits the corpus."""
    table = synth.docs_skew(n=32, whale_spans=40)
    got = _run(table, mode="auto", whale_media_spans=8)
    want = oracle.extract_spans_table(table).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # threshold above every doc: the whale arm is empty, still identical
    got_hi = _run(table, mode="auto", whale_media_spans=10_000)
    pd.testing.assert_frame_equal(got_hi, want)
    # threshold of 1: EVERY media span takes the salted arm
    got_lo = _run(table, mode="auto", whale_media_spans=1)
    pd.testing.assert_frame_equal(got_lo, want)


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


def test_random_sample_and_split():
    """O5 sampling coverage: seeded random_sample bounds + split
    disjointness (training-only ops in the reference,
    train_cnn_model.py:334-340)."""
    import ray.data as rd

    from granulate_char_ocr_ray import synth

    ds = rd.from_arrow(synth.docs_interleaved(100))
    sampled = ds.random_sample(0.3, seed=42)
    n = sampled.count()
    assert 10 <= n <= 60  # loose binomial bounds
    train, test = ds.train_test_split(test_size=0.25, seed=7)
    assert train.count() + test.count() == 100
    train_ids = set(train.to_pandas()["doc_id"])
    test_ids = set(test.to_pandas()["doc_id"])
    assert not (train_ids & test_ids)


def test_cc_segmenter_engine_matches_oracle():
    """Connected-component segmentation (M5) as the serving-path
    segmenter: engine output equals the oracle with the same config."""
    table = synth.docs_words()
    ds = rd.from_arrow(table)
    got = (
        extract_spans_sorted(ds, concurrency=2, segmenter="cc")
        .to_pandas().reset_index(drop=True)
    )
    want = oracle.extract_spans_table(table, segmenter="cc").to_pandas().reset_index(
        drop=True)
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.parametrize("binarizer", ["fixed", "otsu", "adaptive"])
def test_engine_matches_oracle_all_binarizers(binarizer):
    """Engine == oracle row-for-row under every binarizer config (M1,
    M2, M3) — parity holds whatever the preprocessing choice."""
    table = FIXTURES["interleaved"]()
    got = _run(table, binarizer=binarizer)
    want = oracle.extract_spans_table(
        table, binarizer=binarizer).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_engine_matches_oracle_cascade():
    """Engine == oracle with the recognizer cascade on, and the cascade
    output equals the flat rule on clean strips (exact tier fires)."""
    table = FIXTURES["interleaved"]()
    got = _run(table, cascade=True)
    want = oracle.extract_spans_table(
        table, cascade=True).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    flat = _run(table)
    pd.testing.assert_frame_equal(got, flat)


def test_engine_matches_oracle_normalize_chain():
    """Engine == oracle with the M6 glyph-normalization chain on, and
    clean strips still classify identically (prototypes travel the same
    chain, so clean glyphs match at distance 0)."""
    table = FIXTURES["interleaved"]()
    got = _run(table, normalize_chain=True)
    want = oracle.extract_spans_table(
        table, normalize_chain=True).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    flat = _run(table)
    pd.testing.assert_frame_equal(got, flat)
