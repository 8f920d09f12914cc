"""Deterministic synthetic corpus builders (seed-free: every value is a
pure function of doc_id / table contents — see FIXTURES.md).

Two corpus families:

1. **Derived corpus** — the interleaved docs table derived row-by-row
   from the driver's ``documents.parquet`` (doc_id, text). Each source
   document yields 3-4 spans: a plain-text span, an HTML-wrapped span,
   a pseudo-PDF layout span, and (for every third doc) a media span
   whose glyph word is ``translate(str(doc_id), '0123456789',
   'ABCDEFGHIJ')``. The spans list is stored ROTATED by ``doc_id %
   n_spans`` so order restoration is exercised. Because every payload
   is a deterministic function of (doc_id, text), the full extraction
   output has an exact DuckDB SQL oracle (see __ray_entry__.py).

2. **Fixture corpora** — the FIXTURES.md §2 tables (tiny/alpha/words/
   interleaved/skew/edge/bench), echoing the reference's test corpus
   (88 filename-labeled words, evaluate_new_testdata.py:28-45; A-Z
   sweep, tests/debug/test_integrated_ocr.py:33-107).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .functions.glyphs import MEDIA_PREFIX
from .functions.textext import html_wrap, pdf_layout_encode
from .schema import DOCS_SCHEMA

DIGIT_LETTERS = "ABCDEFGHIJ"

# The reference's word corpus (test_data/ filename stems,
# evaluate_new_testdata.py:28-45), restricted to A-Z words.
REFERENCE_WORDS = [
    "AND", "A", "BE", "BY", "B", "CAN", "CHANGE", "COME", "CONFERENCE",
    "COSTS", "COVERED", "C", "EASY", "ENJOYABLE", "EQPHGTGPE", "E",
    "FACTORY", "FOR", "F", "G", "HEAD", "HIRING", "HUMAN", "H", "INC",
    "INDIVIDUALS", "IS", "I", "JOB", "JOIN", "KPE", "LAB", "LANGO",
    "LOOKING", "L", "M", "NYELV", "N", "OF", "OPERATE", "OUR", "O",
    "PART", "PASSIONATE", "PLEASURE", "PROUD", "PROVIDED", "RE", "ROOM",
    "R", "STOMACH", "SWEETS", "S", "TEAM", "THE", "TO", "TRANSPORTATION",
    "T", "UNIFORM", "US", "UVQOCEJ", "V", "WE", "WORK", "WORLD", "W",
    "YAMIGASHI", "YOU", "YUMMY", "Y",
]


def doc_key(doc_id_int: int) -> str:
    """Canonical string doc_id: 'doc-%08d'."""
    return f"doc-{doc_id_int:08d}"


def word_for_doc(doc_id_int: int) -> str:
    """Glyph word for a derived media span: digits of doc_id mapped to
    letters A-J (SQL: translate(cast(doc_id as varchar),'0123456789','ABCDEFGHIJ'))."""
    return "".join(DIGIT_LETTERS[int(d)] for d in str(doc_id_int))


def derive_spans(doc_id_int: int, text: str) -> list[dict]:
    """The 3-4 spans derived from one source document (stored rotated)."""
    spans = [
        {"kind": "text", "text": text, "media_ref": "", "offset": 0},
        {"kind": "html", "text": html_wrap(text), "media_ref": "", "offset": 1},
        {"kind": "pdf", "text": pdf_layout_encode(text, seed=doc_id_int),
         "media_ref": "", "offset": 2},
    ]
    if doc_id_int % 3 == 0:
        spans.append({"kind": "media", "text": "",
                      "media_ref": MEDIA_PREFIX + word_for_doc(doc_id_int),
                      "offset": 3})
    rot = doc_id_int % len(spans)
    return spans[rot:] + spans[:rot]


def derive_docs_batch(doc_ids: np.ndarray, texts: list[str]) -> pa.Table:
    """Vector entry point used by the Ray derivation stage AND the oracle:
    (int doc_ids, texts) -> docs-schema Arrow table."""
    keys = [doc_key(int(d)) for d in doc_ids]
    spans = [derive_spans(int(d), t) for d, t in zip(doc_ids, texts)]
    return pa.Table.from_pydict(
        {"doc_id": keys, "spans": spans}, schema=DOCS_SCHEMA
    )


# ---------------------------------------------------------------------------
# Fixture corpora (FIXTURES.md §2)
# ---------------------------------------------------------------------------

def _mk(rows: list[tuple[str, list[dict]]]) -> pa.Table:
    return pa.Table.from_pydict(
        {"doc_id": [r[0] for r in rows], "spans": [r[1] for r in rows]},
        schema=DOCS_SCHEMA,
    )


def _tspan(offset: int, kind: str, payload: str) -> dict:
    return {"kind": kind, "text": payload, "media_ref": "", "offset": offset}


def _mspan(offset: int, word: str) -> dict:
    return {"kind": "media", "text": "", "media_ref": MEDIA_PREFIX + word,
            "offset": offset}


def docs_tiny() -> pa.Table:
    """8 docs, 1-3 text-like spans each (minimum slice)."""
    rows = []
    for i in range(8):
        body = f"tiny document {i} body   with  spaced\ttext"
        spans = [_tspan(0, "text", body)]
        if i % 2:
            spans.append(_tspan(1, "html", html_wrap(body)))
        if i % 3 == 0:
            spans.append(_tspan(len(spans), "pdf", pdf_layout_encode(body, seed=i)))
        rot = i % len(spans)
        rows.append((doc_key(i), spans[rot:] + spans[:rot]))
    return _mk(rows)


def docs_alpha() -> pa.Table:
    """26 docs, one media span each: the per-letter A-Z sweep."""
    return _mk([(doc_key(i), [_mspan(0, c)])
                for i, c in enumerate("ABCDEFGHIJKLMNOPQRSTUVWXYZ")])


def docs_words() -> pa.Table:
    """Reference word corpus, one media span per doc."""
    return _mk([(doc_key(i), [_mspan(0, w)])
                for i, w in enumerate(REFERENCE_WORDS)])


def docs_interleaved(n: int = 200) -> pa.Table:
    """Mixed-kind docs, 1-12 spans, spans stored rotated (main invariant)."""
    rows = []
    for i in range(n):
        n_spans = 1 + (i * 7 + 3) % 12
        spans = []
        for j in range(n_spans):
            sel = (i + j) % 4
            if sel == 0:
                spans.append(_tspan(j, "text", f"doc {i} span {j}  plain\tpayload"))
            elif sel == 1:
                spans.append(_tspan(j, "html", html_wrap(f"doc {i} span {j} html body")))
            elif sel == 2:
                spans.append(_tspan(j, "pdf", pdf_layout_encode(
                    " ".join(f"w{i}x{j}t{k}" for k in range(20)), seed=i * 31 + j)))
            else:
                spans.append(_mspan(j, REFERENCE_WORDS[(i + j) % len(REFERENCE_WORDS)]))
        rot = i % n_spans
        rows.append((doc_key(i), spans[rot:] + spans[:rot]))
    return _mk(rows)


def docs_skew(n: int = 64, whale_spans: int = 40) -> pa.Table:
    """One whale doc with ``whale_spans`` media spans; rest have 1-4."""
    rows = []
    for i in range(n):
        if i == n // 2:
            spans = [_mspan(j, REFERENCE_WORDS[j % len(REFERENCE_WORDS)])
                     for j in range(whale_spans)]
        else:
            k = 1 + i % 4
            spans = [_mspan(j, "ABC"[: 1 + (i + j) % 3]) for j in range(k)]
        rot = i % len(spans)
        rows.append((doc_key(i), spans[rot:] + spans[:rot]))
    return _mk(rows)


def docs_edge() -> pa.Table:
    """Edge cases: empty span list, only-media, only-text, 1-letter strip,
    unknown media payload (decodes to None -> empty text), duplicate
    doc_id pair (dedup-first semantics handled by exact_dedup pipeline,
    not the extractor)."""
    rows = [
        (doc_key(0), []),
        (doc_key(1), [_mspan(0, "PLEASURE")]),
        (doc_key(2), [_tspan(0, "text", "   only   text   ")]),
        (doc_key(3), [_mspan(0, "A")]),
        (doc_key(4), [{"kind": "media", "text": "", "media_ref": MEDIA_PREFIX + "a?z",
                       "offset": 0}]),
        (doc_key(5), [_tspan(0, "text", "dup candidate")]),
        (doc_key(5), [_tspan(0, "text", "dup candidate")]),
        (doc_key(6), [_tspan(1, "text", "second"), _tspan(0, "text", "first")]),
    ]
    return _mk(rows)


def docs_bench(n: int = 5000) -> pa.Table:
    """Parametrized interleaved-style corpus for BENCH runs."""
    return docs_interleaved(n)
