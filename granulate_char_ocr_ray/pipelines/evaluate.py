"""OCR evaluation pipelines — the reference's accuracy harness
(``evaluate_new_testdata.py``) as distributed queries:

- per-doc char/word accuracy via positional alignment of expected vs
  recognized (J4, ``evaluate_new_testdata.py:52-57``)
- global stats (G2, ``:82-95``)
- grouped stats by word length (G3, ``:100-134``)
- confusion-pair counts, sorted desc (G4, ``:137-163``)

Evaluation corpus: one media-span doc per source document; the glyph
strip encodes the doc's word REVERSED for every 7th doc (a deterministic
"degradation"), while the expected label stays the forward word — so
accuracies are nontrivial yet the whole computation has an exact SQL
oracle (the classifier is perfect on clean strips by construction).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..functions.tables import table_from_pandas
from ray.data.aggregate import Sum

from ..functions.glyphs import MEDIA_PREFIX
from ..functions.numeric import round_half_up
from ..sources.storage import read_table
from ..synth import doc_key, word_for_doc
from .extract import extract_spans


def derive_eval_docs(sf_dir: str) -> rd.Dataset:
    """One media span per source doc; every 7th doc's strip is the
    reversed word (expected label remains the forward word)."""

    def _derive(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        rows = {"doc_id": [], "spans": []}
        for d in ids:
            d = int(d)
            word = word_for_doc(d)
            strip_word = word[::-1] if d % 7 == 0 else word
            rows["doc_id"].append(doc_key(d))
            rows["spans"].append(
                [{"kind": "media", "text": "",
                  "media_ref": MEDIA_PREFIX + strip_word, "offset": 0}]
            )
        from ..schema import DOCS_SCHEMA

        return pa.Table.from_pydict(rows, schema=DOCS_SCHEMA)

    ds = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return ds.map_batches(_derive, batch_format="pyarrow")


def _recognized(sf_dir: str) -> rd.Dataset:
    """(doc_id, expected, recognized) for the evaluation corpus."""
    spans = extract_spans(derive_eval_docs(sf_dir))

    def label(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        expected = [word_for_doc(int(d[4:])) for d in doc_ids]
        return pa.Table.from_pydict(
            {
                "doc_id": doc_ids,
                "expected": expected,
                "recognized": batch.column("text"),
            }
        )

    return spans.map_batches(label, batch_format="pyarrow")


def _char_acc(expected: str, recognized: str) -> float:
    """Positional char accuracy (zip alignment over the longer length),
    the reference's metric at evaluate_new_testdata.py:52-55."""
    n = max(len(expected), len(recognized))
    if n == 0:
        return 1.0
    hits = sum(1 for a, b in zip(expected, recognized) if a == b)
    return hits / n


def ocr_char_accuracy(sf_dir: str) -> rd.Dataset:
    """(doc_id, expected, recognized, char_acc, word_acc) per doc."""

    def acc(batch: pa.Table) -> pa.Table:
        exp = batch.column("expected").to_pylist()
        rec = batch.column("recognized").to_pylist()
        char_acc = [round_half_up(_char_acc(e, r), 4).item() for e, r in zip(exp, rec)]
        word_acc = [1 if e == r else 0 for e, r in zip(exp, rec)]
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "expected": exp,
                "recognized": rec,
                "char_acc": pa.array(char_acc, pa.float64()),
                "word_acc": pa.array(word_acc, pa.int64()),
            }
        )

    return _recognized(sf_dir).map_batches(acc, batch_format="pyarrow").repartition(4).sort("doc_id")


def ocr_eval_stats(sf_dir: str) -> rd.Dataset:
    """Single-row global stats (G2): n_docs, mean char/word accuracy."""
    per_doc = ocr_char_accuracy(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "key": [1],
                "n_docs": [len(batch)],
                "sum_char_acc": [float(np.sum(batch.column("char_acc").to_numpy(zero_copy_only=False)))],
                "sum_word_acc": [int(np.sum(batch.column("word_acc").to_numpy(zero_copy_only=False)))],
            }
        )

    agg = per_doc.map_batches(partial, batch_format="pyarrow").repartition(2).groupby(
        "key"
    ).aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("sum_char_acc", alias_name="sum_char_acc"),
        Sum("sum_word_acc", alias_name="sum_word_acc"),
    )

    def final(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.Table.from_pydict(
            {
                "n_docs": df["n_docs"].astype(np.int64),
                "mean_char_acc": round_half_up(df["sum_char_acc"] / df["n_docs"], 4),
                "mean_word_acc": round_half_up(
                    df["sum_word_acc"].astype(np.float64) / df["n_docs"], 4),
            }
        )

    return agg.map_batches(final, batch_format="pyarrow")


def ocr_accuracy_by_length(sf_dir: str) -> rd.Dataset:
    """Grouped stats by expected word length (G3)."""
    per_doc = ocr_char_accuracy(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["word_len"] = df["expected"].str.len().astype(np.int64)
        g = df.groupby("word_len", as_index=False).agg(
            n_docs=("doc_id", "size"),
            sum_char_acc=("char_acc", "sum"),
            sum_word_acc=("word_acc", "sum"),
        )
        return table_from_pandas(g, preserve_index=False)

    agg = per_doc.map_batches(partial, batch_format="pyarrow").repartition(2).groupby(
        "word_len"
    ).aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("sum_char_acc", alias_name="sum_char_acc"),
        Sum("sum_word_acc", alias_name="sum_word_acc"),
    )

    def final(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.Table.from_pydict(
            {
                "word_len": df["word_len"].astype(np.int64),
                "n_docs": df["n_docs"].astype(np.int64),
                "mean_char_acc": round_half_up(df["sum_char_acc"] / df["n_docs"], 4),
                "mean_word_acc": round_half_up(
                    df["sum_word_acc"].astype(np.float64) / df["n_docs"], 4),
            }
        )

    return agg.map_batches(final, batch_format="pyarrow")


def ocr_confusions(sf_dir: str) -> rd.Dataset:
    """Positional confusion pairs expected->recognized where they
    differ, counted and sorted desc (G4). Output: (expected_char,
    recognized_char, n)."""
    rec = _recognized(sf_dir)

    def pairs(batch: pa.Table) -> pa.Table:
        exp = batch.column("expected").to_pylist()
        recs = batch.column("recognized").to_pylist()
        counts: dict[tuple[str, str], int] = {}
        for e, r in zip(exp, recs):
            for a, b in zip(e, r):
                if a != b:
                    counts[(a, b)] = counts.get((a, b), 0) + 1
        return pa.Table.from_pydict(
            {
                "expected_char": [k[0] for k in counts],
                "recognized_char": [k[1] for k in counts],
                "n": pa.array(list(counts.values()), pa.int64()),
            },
            schema=pa.schema([("expected_char", pa.string()),
                              ("recognized_char", pa.string()),
                              ("n", pa.int64())]),
        )

    agg = rec.map_batches(pairs, batch_format="pyarrow").repartition(2).groupby(
        ["expected_char", "recognized_char"]
    ).aggregate(Sum("n", alias_name="n"))
    return agg.sort(["n", "expected_char", "recognized_char"],
                    descending=[True, False, False])


def ocr_cer(sf_dir: str) -> rd.Dataset:
    """Per-doc character error rate via LEVENSHTEIN distance — the
    industry CER metric (edit_dist / len(expected)), alongside the
    reference's positional alignment (ocr_char_accuracy). The distance
    runs as a batch-vectorized DP (functions/textstats.levenshtein_batch
    — one (La x Lb) loop of whole-batch vector ops, no per-row Python
    DP); DuckDB's levenshtein() is the oracle. Output: (doc_id,
    expected, recognized, edit_dist, cer)."""
    from ..functions.textstats import levenshtein_batch

    def cer(batch: pa.Table) -> pa.Table:
        exp = batch.column("expected").to_pylist()
        rec = batch.column("recognized").to_pylist()
        d = levenshtein_batch(exp, rec)
        lens = np.maximum(np.array([len(e) for e in exp]), 1)
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "expected": exp,
                "recognized": rec,
                "edit_dist": pa.array(d, pa.int64()),
                "cer": pa.array(round_half_up(d / lens, 4), pa.float64()),
            }
        )

    return _recognized(sf_dir).map_batches(cer, batch_format="pyarrow").sort(
        "doc_id")
