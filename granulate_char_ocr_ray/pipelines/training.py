"""Training-data preparation pipelines: chunking, PII scrubbing,
repetition signals, and sequence packing over the documents table.

These are the LLM-pretraining-corpus operators a 100 TB pipeline runs
between raw extraction and tokenizer ingestion (graft additions; the
reference stops at per-image OCR). Everything is expressed as Arrow
kernels inside ``map_batches`` plus the repo's two-phase hash aggregate
— the only global coordination is the O(num_partitions) prefix-sum
exchange in :func:`pack_sequences`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions.tables import table_from_pandas

from ..functions.numeric import round_half_up
from ..sources.storage import read_table

# RE2 syntax, identical semantics in Arrow's and DuckDB's regex engines
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+1-555-[0-9]{4}"


def _docs(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return read_table(f"{sf_dir}/documents.parquet", columns=columns)


def chunk_batch(batch: pa.Table, size: int, step: int) -> pa.Table:
    """Pure chunking kernel over one Arrow batch (see
    :func:`chunk_docs`); module-level so property tests can drive it
    without a Ray session."""
    text = batch.column("text")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
    n = pc.utf8_length(text).to_numpy(zero_copy_only=False)
    if len(batch) == 0:
        return pa.Table.from_pydict({
            "doc_id": pa.array([], batch.schema.field("doc_id").type),
            "chunk_id": pa.array([], pa.int64()),
            "start": pa.array([], pa.int64()),
            "chunk_text": pa.array([], pa.string()),
        })
    out_doc, out_cid, out_start, out_text = [], [], [], []
    i = 0
    while True:
        start = i * step
        alive = np.flatnonzero((n > start) | ((n == 0) & (start == 0)))
        if not len(alive):
            break
        idx = pa.array(alive)
        sliced = pc.utf8_slice_codeunits(
            pc.take(text, idx), start, start + size)
        out_doc.append(doc_id[alive])
        out_cid.append(np.full(len(alive), i, dtype=np.int64))
        out_start.append(np.full(len(alive), start, dtype=np.int64))
        out_text.append(sliced)
        i += 1
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(np.concatenate(out_doc)),
            "chunk_id": pa.array(np.concatenate(out_cid)),
            "start": pa.array(np.concatenate(out_start)),
            "chunk_text": pa.concat_arrays(
                [a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                 else a for a in out_text]),
        }
    )


def chunk_docs(sf_dir: str, size: int = 200, step: int = 150) -> rd.Dataset:
    """Overlapping fixed-window chunking: one output row per (doc,
    window) with starts 0, step, 2*step, ... < len(text) — the standard
    pre-tokenization split for long documents (window ``size`` chars,
    overlap ``size - step``).

    Vectorized as a loop over CHUNK INDICES (bounded by the longest doc
    in the batch), each iteration one ``utf8_slice_codeunits`` over the
    still-alive docs — never a per-row Python loop. Chunking is
    embarrassingly parallel; no shuffle. Output: (doc_id, chunk_id,
    start, chunk_text).
    """
    assert 0 < step <= size
    import functools

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        functools.partial(chunk_batch, size=size, step=step),
        batch_format="pyarrow").repartition(4).sort(["doc_id", "chunk_id"])


def _with_pii(batch: pa.Table) -> pa.Table:
    """Deterministically inject synthetic PII derived from doc_id (the
    synth documents corpus is digit-free word salad, so the scrub path
    would otherwise never fire). Reproduced verbatim in the SQL oracle."""
    doc_id = batch.column("doc_id")
    ids = pc.cast(doc_id, pa.string())
    phone4 = pc.utf8_rpad(pc.utf8_slice_codeunits(ids, 0, 4), 4, "0")
    pii = pc.binary_join_element_wise(
        pa.array(["contact user"] * len(batch)), ids,
        pa.array(["@example.com or +1-555-"] * len(batch)), phone4, "")
    text2 = pc.binary_join_element_wise(batch.column("text"), pii, " ")
    return pa.Table.from_arrays([doc_id, text2], names=["doc_id", "text"])


def pii_redact(sf_dir: str) -> rd.Dataset:
    """PII scrub: replace email addresses and phone numbers with typed
    placeholder tokens, counting each. Pure Arrow RE2 kernels
    (count_substring_regex + replace_substring_regex) — per-batch,
    shuffle-free, and byte-identical to DuckDB's RE2 regexp_replace.
    Output: (doc_id, clean_text, n_emails, n_phones)."""

    def scrub(batch: pa.Table) -> pa.Table:
        batch = _with_pii(batch)
        text = batch.column("text")
        n_email = pc.count_substring_regex(text, EMAIL_RE)
        cleaned = pc.replace_substring_regex(text, EMAIL_RE, "[EMAIL]")
        n_phone = pc.count_substring_regex(cleaned, PHONE_RE)
        cleaned = pc.replace_substring_regex(cleaned, PHONE_RE, "[PHONE]")
        return pa.Table.from_arrays(
            [batch.column("doc_id"), cleaned,
             pc.cast(n_email, pa.int64()), pc.cast(n_phone, pa.int64())],
            names=["doc_id", "clean_text", "n_emails", "n_phones"])

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        scrub, batch_format="pyarrow").repartition(4).sort("doc_id")


def pii_stats_by_source(sf_dir: str) -> rd.Dataset:
    """Typed PII audit rolled up per source — the report a curation
    pipeline reads before deciding which crawl sources need heavier
    scrubbing (pii_redact is the per-doc scrub; this is its
    monitoring sibling). Same injected-PII convention and RE2
    patterns as pii_redact, so both stay oracle-identical.

    Plan: per-batch count fold -> |sources|-bounded two-phase
    aggregate — the exchange carries one row per (source, block),
    never documents. Output: (source, n_docs, n_emails, n_phones,
    emails_per_doc) sorted by source."""
    from ..stages.hashagg import hash_groupby_agg

    def counts(batch: pa.Table) -> pa.Table:
        src = batch.column("source")
        pii = _with_pii(pa.Table.from_arrays(
            [batch.column("doc_id"), batch.column("text")],
            names=["doc_id", "text"]))
        text = pii.column("text")
        n_email = pc.cast(pc.count_substring_regex(text, EMAIL_RE),
                          pa.int64())
        cleaned = pc.replace_substring_regex(text, EMAIL_RE, "[EMAIL]")
        n_phone = pc.cast(pc.count_substring_regex(cleaned, PHONE_RE),
                          pa.int64())
        return table_from_pandas(pd.DataFrame({
            "source": src.to_pandas(),
            "n_docs": np.int64(1),
            "n_emails": n_email.to_numpy(zero_copy_only=False),
            "n_phones": n_phone.to_numpy(zero_copy_only=False),
        }).groupby("source", as_index=False).sum())

    agg = hash_groupby_agg(
        _docs(sf_dir, ["doc_id", "text", "source"]).map_batches(
            counts, batch_format="pyarrow"),
        ["source"],
        {"n_docs": ("n_docs", "sum"), "n_emails": ("n_emails", "sum"),
         "n_phones": ("n_phones", "sum")}, num_parts=2)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.astype({"n_docs": "int64", "n_emails": "int64",
                        "n_phones": "int64"})
        df["emails_per_doc"] = round_half_up(
            df["n_emails"].to_numpy(np.float64)
            / df["n_docs"].to_numpy(np.float64), 4)
        return df.sort_values("source").reset_index(drop=True)

    return agg.repartition(1).map_batches(finish,
                                          batch_format="pandas")


# control characters stripped by sanitize_text: C0 minus \t \n \r,
# plus DEL — the bytes no text corpus should carry into a tokenizer
_CTRL_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"

# rows where NFC can differ from identity: combining diacritics /
# marks, or Hangul jamo (composition targets). Everything else is
# NFC-invariant, so normalization skips it entirely.
_NFC_TRIGGER_RE = (r"[\x{0300}-\x{036F}\x{1AB0}-\x{1AFF}"
                   r"\x{1DC0}-\x{1DFF}\x{20D0}-\x{20FF}"
                   r"\x{FE20}-\x{FE2F}\x{1100}-\x{11FF}"
                   r"\x{3130}-\x{318F}\x{A960}-\x{A97F}]")


def sanitize_text(sf_dir: str) -> rd.Dataset:
    """Unicode hygiene pass (the C4/CCNet-style cleanup every crawl
    corpus runs before tokenization): strip control characters
    (C0 minus tab/newline/CR, plus DEL), collapse whitespace runs to
    single spaces, trim, and NFC-normalize so visually-identical
    combining sequences unify. Deterministic mess is injected per doc
    (tab + 'e' + U+0301 combining acute + BEL) since the synthetic
    corpus is already clean — reproduced verbatim in the SQL oracle
    (chr() concatenation), whose nfc_normalize() must agree with
    DuckDB's nfc_normalize() codepoint-for-codepoint.

    Strip/collapse/trim are Arrow kernels; NFC composition is NOT
    (this pyarrow build's ``utf8_normalize`` fails to compose
    e+U+0301 -> U+00E9 — verified), so normalization runs
    ``unicodedata.normalize`` ONLY on rows a vectorized regex flags
    as carrying combining marks or Hangul jamo — NFC is the identity
    everywhere else, so the Python cost is proportional to the rare
    rows that need it, not the corpus. Embarrassingly parallel, no
    shuffle. Output: (doc_id, clean_text, n_ctrl) sorted by doc_id."""
    import unicodedata

    def scrub(batch: pa.Table) -> pa.Table:
        text = pc.binary_join_element_wise(
            batch.column("text"),
            pa.array(["\te\u0301\x07"] * len(batch)), "")
        no_ctrl = pc.replace_substring_regex(text, _CTRL_RE, "")
        n_ctrl = pc.subtract(pc.utf8_length(text),
                             pc.utf8_length(no_ctrl))
        collapsed = pc.replace_substring_regex(no_ctrl, r"\s+", " ")
        trimmed = pc.utf8_trim(collapsed, " ")
        need = pc.match_substring_regex(
            trimmed, _NFC_TRIGGER_RE).to_numpy(zero_copy_only=False)
        idx = np.flatnonzero(need)
        if len(idx):
            vals = trimmed.to_pandas().to_numpy(dtype=object)
            vals[idx] = [unicodedata.normalize("NFC", v)
                         for v in vals[idx]]
            clean = pa.array(vals, pa.string())
        else:
            clean = trimmed
        return pa.Table.from_arrays(
            [batch.column("doc_id"), clean,
             pc.cast(n_ctrl, pa.int64())],
            names=["doc_id", "clean_text", "n_ctrl"])

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        scrub, batch_format="pyarrow").repartition(4).sort("doc_id")


def interleave_sources(sf_dir: str, block: int = 4096) -> rd.Dataset:
    """Deterministic round-robin source interleaving — the mixture
    SCHEDULE for training: doc k of every source sits before doc k+1
    of any source, so a sequential reader consumes sources as evenly
    as their sizes allow (the interleaving step of mixture sampling;
    the weighted sibling is mixture_manifest, which decides COUNTS
    while this decides ORDER).

    Exact and sort-free: (1) the same contiguous ``doc_id // block``
    range keying as pack_sequences gives per-(range, source) counts —
    an O(ranges x sources) reduce, never doc rows; (2) the driver
    prefix-sums each source's counts over ranges and broadcasts the
    offset table; each range places its docs by local cumcount +
    offset = exact rank_in_source; (3) the global interleave position
    is CLOSED-FORM from the per-source totals c_s:
    pos(r, s) = sum_s' min(c_s', r) + |{s' < s : c_s' > r}| — no
    global sort, no second exchange. Output: (doc_id, source,
    rank_in_source, interleave_order) sorted by doc_id."""
    from ..stages.hashagg import hash_groupby_agg

    ds = _docs(sf_dir, ["doc_id", "source"])

    def key(batch: pa.Table) -> pa.Table:
        rng = pc.divide(batch.column("doc_id"),
                        pa.scalar(block, pa.int64()))
        return pa.Table.from_arrays(
            [batch.column("doc_id"), batch.column("source"),
             pc.cast(rng, pa.int64()), pa.array([1] * len(batch),
                                                pa.int64())],
            names=["doc_id", "source", "rng", "one"])

    keyed = ds.map_batches(key, batch_format="pyarrow")
    # O(ranges x sources) rows to the driver — the prefix exchange
    cnt = hash_groupby_agg(
        keyed, ["rng", "source"], {"c": ("one", "sum")}, num_parts=4
    ).to_pandas().sort_values(["source", "rng"])
    cnt["c"] = cnt["c"].astype(np.int64)
    offs = {}
    for s, g in cnt.groupby("source"):
        ex = np.concatenate([[0], g["c"].cumsum().to_numpy()[:-1]])
        offs.update({(s, int(r)): int(o)
                     for r, o in zip(g["rng"], ex)})
    totals = cnt.groupby("source")["c"].sum()
    srcs = sorted(totals.index)
    c_vec = totals.reindex(srcs).to_numpy(dtype=np.int64)
    s_idx = {s: i for i, s in enumerate(srcs)}
    ref = ray.put((offs, c_vec, s_idx))

    def place(g: pd.DataFrame) -> pd.DataFrame:
        offs_, c_vec_, s_idx_ = ray.get(ref)
        g = g.sort_values("doc_id")
        out = []
        for s, gg in g.groupby("source", sort=False):
            base = offs_[(s, int(gg["rng"].iloc[0]))]
            r = base + np.arange(len(gg), dtype=np.int64)
            si = s_idx_[s]
            # pos(r, s): every source contributes its first min(c, r)
            # docs (full earlier rounds), plus this round's earlier
            # sources that still have a doc r to place
            pos = np.minimum(c_vec_[None, :], r[:, None]).sum(axis=1) \
                + (c_vec_[:si][None, :] > r[:, None]).sum(axis=1)
            out.append(pd.DataFrame({
                "doc_id": gg["doc_id"].to_numpy(np.int64),
                "source": s,
                "rank_in_source": r,
                "interleave_order": pos.astype(np.int64)}))
        return pd.concat(out, ignore_index=True)

    placed = keyed.groupby("rng").map_groups(place,
                                             batch_format="pandas")
    return placed.repartition(4).sort("doc_id")


def repetition_stats(sf_dir: str) -> rd.Dataset:
    """Gopher-style repetition signals per document: token count,
    distinct-token count, duplicate-token fraction and top-token
    fraction (the "fraction of tokens in the most common token" filter
    from the Gopher corpus rules, arXiv:2112.11446 A1.1). Per-batch
    explode + pandas grouped kernels — each doc lives in one batch, so
    no shuffle. Output: (doc_id, n_tokens, n_distinct, dup_ratio,
    top_ratio)."""

    def stats(batch: pa.Table) -> pa.Table:
        text = pc.utf8_trim(batch.column("text"), " ")
        toks = pc.split_pattern_regex(text, r"\s+")
        raw_counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        empty = pc.equal(text, "").to_numpy(zero_copy_only=False)
        counts = np.where(empty, 0, raw_counts)
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
        # flatten aligns with RAW list lengths (an empty text splits to
        # [""]); drop the empty-row sentinel tokens afterwards
        flat = pc.list_flatten(toks).to_pandas()
        rep = np.repeat(np.arange(len(batch)), raw_counts)
        keep = ~np.repeat(empty, raw_counts)
        df = pd.DataFrame({"row": rep[keep], "tok": flat[keep]})
        per_pair = df.groupby(["row", "tok"], sort=False).size()
        per_row = per_pair.groupby(level="row")
        n_distinct = np.zeros(len(batch), dtype=np.int64)
        top = np.zeros(len(batch), dtype=np.int64)
        idx = per_row.size().index.to_numpy()
        n_distinct[idx] = per_row.size().to_numpy()
        top[idx] = per_row.max().to_numpy()
        n_tok = counts.astype(np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            dup = np.where(n_tok > 0, 1.0 - n_distinct / n_tok, 0.0)
            topr = np.where(n_tok > 0, top / n_tok, 0.0)
        return pa.Table.from_pydict({
            "doc_id": pa.array(doc_id),
            "n_tokens": pa.array(n_tok),
            "n_distinct": pa.array(n_distinct),
            "dup_ratio": pa.array(round_half_up(dup, 4)),
            "top_ratio": pa.array(round_half_up(topr, 4)),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow").repartition(4).sort("doc_id")


def ngram_repetition(sf_dir: str) -> rd.Dataset:
    """Gopher word-n-gram repetition signals (arXiv:2112.11446 A.1.2)
    per document for n = 2 and n = 3: total n-gram occurrences, the
    fraction of occurrences claimed by the most frequent n-gram, and
    the fraction of occurrences belonging to any DUPLICATED n-gram
    (count > 1). Fractions are in n-gram OCCURRENCES — the paper's
    character-weighted, overlap-deduplicated variant is not
    SQL-expressible; the occurrence form ranks documents identically
    on near-uniform token lengths and is the form the oracle verifies.

    Fully vectorized, shuffle-free (each doc lives in one batch): one
    token split + flat 64-bit token hashes per batch, n-gram keys from
    shifted-view mixes, per-(doc, gram) run lengths via one lexsort,
    per-doc max / dup-sum via reduceat and bincount. Gram identity is
    by 64-bit hash (collision-free whp; oracle compares the strings).

    Output: (doc_id, n_2grams, top2_frac, dup2_frac, n_3grams,
    top3_frac, dup3_frac), sorted by doc_id."""
    from ..functions.textstats import hash64_batch

    F = np.uint64(1099511628211)

    def per_doc(parent: np.ndarray, h: np.ndarray, n: int,
                n_rows: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        L = len(h)
        n_grams = np.zeros(n_rows, dtype=np.int64)
        top = np.zeros(n_rows, dtype=np.int64)
        dup = np.zeros(n_rows, dtype=np.int64)
        if L < n:
            return n_grams, top, dup
        with np.errstate(over="ignore"):
            g = h[: L - n + 1].copy()
            for j in range(1, n):
                g = (g * F) ^ h[j: L - n + 1 + j]
        valid = parent[: L - n + 1] == parent[n - 1: L]
        docs, g = parent[: L - n + 1][valid], g[valid]
        if not len(docs):
            return n_grams, top, dup
        order = np.lexsort((g, docs))
        docs, g = docs[order], g[order]
        starts = np.flatnonzero(
            np.r_[True, (docs[1:] != docs[:-1]) | (g[1:] != g[:-1])])
        counts = np.diff(np.r_[starts, len(g)])
        run_doc = docs[starts]
        n_grams[:] = np.bincount(docs, minlength=n_rows)
        first = np.flatnonzero(np.r_[True, run_doc[1:] != run_doc[:-1]])
        top[run_doc[first]] = np.maximum.reduceat(counts, first)
        dup[:] = np.bincount(run_doc, weights=counts * (counts > 1),
                             minlength=n_rows).astype(np.int64)
        return n_grams, top, dup

    def stats(batch: pa.Table) -> pa.Table:
        text = pc.utf8_trim(batch.column("text"), " ")
        toks = pc.split_pattern_regex(text, r"\s+")
        raw = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        empty = pc.equal(text, "").to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        h = hash64_batch(flat)
        parent = np.repeat(np.arange(len(batch)), raw)
        keep = ~np.repeat(empty, raw)
        h, parent = h[keep], parent[keep]
        cols = {"doc_id": batch.column("doc_id")}
        for n in (2, 3):
            ng, top, dup = per_doc(parent, h, n, len(batch))
            safe = np.where(ng == 0, 1, ng).astype(np.float64)
            cols[f"n_{n}grams"] = pa.array(ng, pa.int64())
            cols[f"top{n}_frac"] = pa.array(
                round_half_up(np.where(ng == 0, 0.0, top / safe), 4))
            cols[f"dup{n}_frac"] = pa.array(
                round_half_up(np.where(ng == 0, 0.0, dup / safe), 4))
        return pa.Table.from_pydict(cols)

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow").repartition(4).sort("doc_id")


def pack_sequences(sf_dir: str, capacity: int = 512,
                   block: int = 4096) -> rd.Dataset:
    """GPT-style sequence packing: concatenate all documents in doc_id
    order and cut the token stream into fixed ``capacity`` windows;
    each doc reports the global token offset it starts at and the
    sequence window containing that offset.

    This is a distributed PREFIX SUM (ordered scan) — the one shape a
    shuffle cannot express. Two passes:

    1. per-range partials: docs group by the CONTIGUOUS range key
       ``doc_id // block``; each range's token sum flows to the driver
       (O(n_docs / block) rows — bounded, not the corpus);
    2. the driver computes exclusive range prefixes, broadcasts the
       small offset table, and a per-range ordered cumsum places every
       doc.

    Output: (doc_id, n_tokens, tok_offset, seq_id, offset_in_seq).
    """
    from ..stages.hashagg import hash_groupby_agg

    ds = _docs(sf_dir, ["doc_id", "text"])

    def tokens(batch: pa.Table) -> pa.Table:
        text = pc.utf8_trim(batch.column("text"), " ")
        toks = pc.split_pattern_regex(text, r"\s+")
        n = pc.list_value_length(toks)
        n = pc.if_else(pc.equal(text, ""), pa.scalar(0, pa.int32()), n)
        rng = pc.divide(batch.column("doc_id"), pa.scalar(block, pa.int64()))
        return pa.Table.from_arrays(
            [batch.column("doc_id"), pc.cast(n, pa.int64()),
             pc.cast(rng, pa.int64())],
            names=["doc_id", "n_tokens", "rng"])

    with_n = ds.map_batches(tokens, batch_format="pyarrow")
    # pass 1: O(ranges) rows to the driver — the prefix exchange
    range_sums = hash_groupby_agg(
        with_n, ["rng"], {"rng_tokens": ("n_tokens", "sum")}, num_parts=4
    ).to_pandas().sort_values("rng")
    prefix = dict(zip(
        range_sums["rng"].astype(np.int64),
        np.concatenate([[0], range_sums["rng_tokens"].cumsum().to_numpy()[:-1]])
        .astype(np.int64)))
    prefix_ref = ray.put(prefix)

    def place(g: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(prefix_ref)
        g = g.sort_values("doc_id")
        base = np.int64(offs[int(g["rng"].iloc[0])])
        cum = g["n_tokens"].cumsum().shift(1, fill_value=0).to_numpy(
            dtype=np.int64) + base
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(),
            "n_tokens": g["n_tokens"].to_numpy(),
            "tok_offset": cum,
            "seq_id": cum // capacity,
            "offset_in_seq": cum % capacity,
        })

    return with_n.groupby("rng").map_groups(
        place, batch_format="pandas").repartition(4).sort("doc_id")


class TrainingCorpusStage:
    """Actor stage (S7, re-expressed for a table engine): decode each
    media payload, segment it, normalize every glyph through the M6
    chain target geometry, and emit one labeled PNG-encoded training
    example per glyph with its bounding box — the reference's Tesseract
    training-corpus writer (create_tesseract_data.py:45-107 writes
    multi-page TIFF + BOX files; here each row IS the (image, box,
    label) record and the sink is partitioned parquet).

    Label provenance: the derived corpus encodes the ground-truth word
    in the media ref itself, mirroring the reference's filename-label
    extractor (M12)."""

    def __init__(self) -> None:
        # warm per-actor state: codec + normalizer imports resolved once
        from ..functions.codecs import encode_png_gray
        from ..functions.glyphs import MEDIA_PREFIX, decode_media_ref
        from ..functions.image import normalize_glyph, preprocess
        from ..functions.segment import segment_projection

        self._encode = encode_png_gray
        self._decode = decode_media_ref
        self._prefix = MEDIA_PREFIX
        self._preprocess = preprocess
        self._segment = segment_projection
        self._normalize = normalize_glyph

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        refs = batch.column("media_ref").to_pylist()
        out = {"doc_id": [], "glyph_idx": [], "label": [],
               "x": [], "y": [], "w": [], "h": [], "png": []}
        for doc_id, ref in zip(doc_ids, refs):
            img = self._decode(ref or "")
            if img is None:
                continue
            word = (ref or "")[len(self._prefix):]
            binary = self._preprocess(img)
            boxes = self._segment(binary)
            for i, (x, y, w, h) in enumerate(boxes):
                if i >= len(word):
                    break
                glyph = self._normalize(binary[y:y + h, x:x + w])
                out["doc_id"].append(doc_id)
                out["glyph_idx"].append(i)
                out["label"].append(word[i])
                out["x"].append(x)
                out["y"].append(y)
                out["w"].append(w)
                out["h"].append(h)
                out["png"].append(self._encode(glyph))
        return pa.Table.from_pydict({
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "glyph_idx": pa.array(out["glyph_idx"], pa.int64()),
            "label": pa.array(out["label"], pa.string()),
            "x": pa.array(out["x"], pa.int64()),
            "y": pa.array(out["y"], pa.int64()),
            "w": pa.array(out["w"], pa.int64()),
            "h": pa.array(out["h"], pa.int64()),
            "png": pa.array(out["png"], pa.binary()),
        })


def build_training_corpus(sf_dir: str, concurrency=(1, 8)) -> rd.Dataset:
    """Labeled per-glyph training corpus from the derived media spans:
    (doc_id, glyph_idx, label, x, y, w, h, png)."""
    import pyarrow.compute as _pc

    from ..stages.explode import explode_spans
    from .extract import derive_docs

    spans = derive_docs(sf_dir).map_batches(explode_spans,
                                            batch_format="pyarrow")
    media = spans.map_batches(
        lambda t: t.filter(_pc.equal(t["kind"], "media")),
        batch_format="pyarrow")
    return media.map_batches(TrainingCorpusStage, batch_format="pyarrow",
                             concurrency=concurrency)


def write_training_corpus(sf_dir: str, out_dir: str,
                          concurrency=(1, 8)) -> None:
    """Write the training corpus as label-partitioned parquet (one
    directory per class — the resumable, per-key layout; reference
    analog: the per-glyph PNG writer S6 + training writer S7)."""
    build_training_corpus(sf_dir, concurrency).write_parquet(
        out_dir, partition_cols=["label"])


def training_corpus_stats(sf_dir: str) -> rd.Dataset:
    """(label, n_glyphs) class distribution of the training corpus —
    the closed-form SQL check that the decode -> segment -> label path
    found every glyph exactly once."""
    from ..stages.hashagg import hash_groupby_agg

    corpus = build_training_corpus(sf_dir)
    agg = hash_groupby_agg(corpus.map_batches(
        lambda t: t.select(["label", "glyph_idx"]), batch_format="pyarrow"),
        ["label"], {"n_glyphs": ("glyph_idx", "count")}, num_parts=4)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"label": df["label"],
                             "n_glyphs": df["n_glyphs"].astype(np.int64)})

    return agg.map_batches(final, batch_format="pandas").sort("label")


def augment_corpus(sf_dir: str, variants: int = 2,
                   concurrency=(1, 8), **aug_kwargs) -> rd.Dataset:
    """M11 augmentation maps over the training corpus: every glyph row
    expands to (variants + 1) rows — the original (variant 0) plus
    ``variants`` deterministic augmentations, seeded per
    (doc_id, glyph_idx, variant) so the expansion is reproducible and
    resumable on any worker. Output: corpus schema + variant."""
    from ..functions.codecs import decode_png_gray, encode_png_gray
    from ..functions.image import augment_glyph
    from ..functions.textstats import hash64

    corpus = build_training_corpus(sf_dir, concurrency)

    def expand(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        gidx = batch.column("glyph_idx").to_pylist()
        labels = batch.column("label").to_pylist()
        pngs = batch.column("png").to_pylist()
        out = {"doc_id": [], "glyph_idx": [], "variant": [],
               "label": [], "png": []}
        for d, g, lab, png in zip(doc_ids, gidx, labels, pngs):
            img = decode_png_gray(png)
            for v in range(variants + 1):
                if v == 0:
                    blob = png
                else:
                    seed = int(hash64(f"{d}/{g}/{v}".encode()) & 0x7FFFFFFF)
                    blob = encode_png_gray(
                        augment_glyph(img, seed, **aug_kwargs))
                out["doc_id"].append(d)
                out["glyph_idx"].append(g)
                out["variant"].append(v)
                out["label"].append(lab)
                out["png"].append(blob)
        return pa.Table.from_pydict({
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "glyph_idx": pa.array(out["glyph_idx"], pa.int64()),
            "variant": pa.array(out["variant"], pa.int64()),
            "label": pa.array(out["label"], pa.string()),
            "png": pa.array(out["png"], pa.binary()),
        })

    return corpus.map_batches(expand, batch_format="pyarrow")


def augmented_corpus_stats(sf_dir: str, variants: int = 2) -> rd.Dataset:
    """(label, n_images) of the augmented corpus — closed form
    (n_glyphs * (variants + 1)), SQL-verified."""
    from ..stages.hashagg import hash_groupby_agg

    aug = augment_corpus(sf_dir, variants)
    agg = hash_groupby_agg(aug.map_batches(
        lambda t: t.select(["label", "variant"]), batch_format="pyarrow"),
        ["label"], {"n_images": ("variant", "count")}, num_parts=4)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"label": df["label"],
                             "n_images": df["n_images"].astype(np.int64)})

    return agg.map_batches(final, batch_format="pandas").sort("label")


# RE2-safe simplification of the GPT-2 pre-tokenizer (the real pattern
# uses a negative lookahead RE2 lacks): contractions, letter runs,
# digit runs, punctuation runs, whitespace runs — each with the
# optional leading space. Identical semantics in Arrow and DuckDB.
BPE_RE = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def bpe_token_counts(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_bpe_tokens) — token counts under a BPE-style
    pre-tokenizer regex (the unit an LLM tokenizer budget is measured
    in, vs the whitespace count in analysis.token_counts). One Arrow
    RE2 kernel per batch; shuffle-free."""

    def count(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch.column("text"), BPE_RE)
        return pa.Table.from_arrays(
            [batch.column("doc_id"), pc.cast(n, pa.int64())],
            names=["doc_id", "n_bpe_tokens"])

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        count, batch_format="pyarrow").repartition(4).sort("doc_id")


def llm_prep_pipeline(sf_dir: str, min_tokens: int = 20,
                      max_upper_ratio: float = 0.3, size: int = 200,
                      step: int = 150, num_parts: int = 64) -> rd.Dataset:
    """The composed LLM-corpus preparation story as ONE streaming
    pipeline: quality gate -> exact dedup (keep smallest doc_id per
    distinct text) -> overlapping chunking. Demonstrates operator
    composition: the gate and chunker fuse into the surrounding
    map_batches chain; the only shuffle is the dedup's hash exchange,
    which carries one (hash, doc_id, text) row per batch-distinct text
    — exactly the payload the chunker needs afterwards, so no second
    corpus scan. Output: (doc_id, chunk_id, start, chunk_text)."""
    import functools

    from ..functions.textstats import hash64_batch, quality_features_batch
    from ..stages.hashagg import stable_hash_column

    def gate_and_hash(batch: pa.Table) -> pa.Table:
        f = quality_features_batch(batch.column("text"))
        mask = (f["n_tokens"] >= min_tokens) & (
            f["upper_ratio"] <= max_upper_ratio)
        kept = batch.filter(pa.array(mask))
        df = pd.DataFrame({
            "doc_id": kept.column("doc_id").to_numpy(zero_copy_only=False),
            "text": kept.column("text").to_pandas(),
            "text_hash": hash64_batch(kept.column("text")).view(np.int64),
        })
        # batch-local pre-dedup: keep the min doc_id per hash so the
        # shuffle moves one row per batch-distinct text
        df = df.sort_values(["text_hash", "doc_id"]).drop_duplicates(
            "text_hash", keep="first")
        df["_part"] = (stable_hash_column(df["text_hash"])
                       % np.uint64(num_parts)).astype(np.int64)
        return table_from_pandas(df, preserve_index=False)

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["text_hash", "doc_id"]).drop_duplicates(
            "text_hash", keep="first")
        return g[["doc_id", "text"]]

    deduped = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        gate_and_hash, batch_format="pyarrow").groupby("_part").map_groups(
        keep_first, batch_format="pandas")

    return deduped.map_batches(
        functools.partial(chunk_batch, size=size, step=step),
        batch_format="pyarrow").repartition(4).sort(["doc_id", "chunk_id"])


def learn_bpe_merges(sf_dir: str, n_merges: int = 12) -> rd.Dataset:
    """BPE tokenizer TRAINING at corpus scale — the standard protocol:
    the only corpus-sized pass reduces text to a (word, count)
    vocabulary table (explode + two-phase hash aggregate); the
    merge-learning loop then runs on that vocabulary-sized table
    driver-locally, exactly as real BPE trainers do (pair statistics
    are weighted by word frequency, so the loop never needs the corpus
    again). Deterministic tie-break: highest pair count, then
    lexicographically smallest (left, right). Output:
    (rank, left, right, merged) — the learned merge table, the
    artifact a tokenizer ships. Iterative and therefore not
    SQL-expressible; verified against a scalar reference in pytest."""
    from ..stages.hashagg import hash_groupby_agg

    def explode_words(batch: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim(batch.column("text"), " ")
        nonempty = pc.filter(trimmed, pc.not_equal(trimmed, ""))
        flat = pc.list_flatten(pc.split_pattern_regex(nonempty, r"\s+"))
        return pa.Table.from_pydict({"word": flat})

    counts = hash_groupby_agg(
        _docs(sf_dir, ["text"]).map_batches(explode_words,
                                            batch_format="pyarrow"),
        ["word"], {"c": ("word", "count")}, num_parts=16).to_pandas()

    merges = bpe_merge_loop(
        list(zip(counts["word"], counts["c"].astype(int))), n_merges)
    return rd.from_arrow(pa.Table.from_pydict(
        {"rank": np.arange(len(merges), dtype=np.int64),
         "left": [m[0] for m in merges],
         "right": [m[1] for m in merges],
         "merged": [m[0] + m[1] for m in merges]},
        schema=pa.schema([("rank", pa.int64()), ("left", pa.string()),
                          ("right", pa.string()),
                          ("merged", pa.string())])))


def bpe_merge_loop(word_counts: list, n_merges: int) -> list:
    """Classic frequency-weighted BPE merge learning over a
    (word, count) vocabulary (driver-local: the vocab table is small
    by construction). Shared scalar reference for the pipeline and its
    tests."""
    from collections import Counter

    vocab = {}
    for w, c in word_counts:
        key = tuple(w)
        if key:
            vocab[key] = vocab.get(key, 0) + int(c)
    merges: list = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == best[0]
                        and syms[i + 1] == best[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


#: Per-language target mixture, in per-mille of TOTAL corpus chars —
#: the output of a mixing policy (DoReMi / tier-mix weights) frozen to
#: a deterministic table so the manifest below is oracle-checkable.
MIXTURE_WEIGHTS = (("en", 50), ("de", 15), ("fr", 15),
                   ("es", 10), ("zh", 10))

_KNUTH = np.uint64(2654435761)
_M32 = np.uint64(0xFFFFFFFF)


def mixture_manifest(sf_dir: str,
                     weights=MIXTURE_WEIGHTS) -> rd.Dataset:
    """Training-mixture manifest: for each language, greedily select
    docs in Knuth-multiplicative-hash order (== a deterministic uniform
    sample) until the language's char budget — ``weight`` per-mille of
    TOTAL corpus chars — is filled; the doc that crosses the boundary
    is included (selection rule: running char total BEFORE the doc is
    strictly under budget). Output: (lang, doc_id, n_chars), sorted.

    Scale plan (no per-lang global sort): the hash is uniform on
    [0, 2^32), so a (lang x 256-bucket) char histogram — ONE two-phase
    reduce over a 3-column projection — locates each language's
    boundary bucket on the driver. Docs in buckets strictly below the
    boundary stream straight to the output; only the ~1/256 boundary
    sliver per language ships to a per-lang local sort + prefix-sum
    gate (the same crossing-bucket-sliver pattern as
    price_trimmed_mean / weighted_median). Budgets are exact integers
    end-to-end (chars, per-mille weights, floor division), so the SQL
    window-cumsum oracle agrees at every boundary."""
    from ..stages.hashagg import hash_groupby_agg

    wmap = dict(weights)
    path = f"{sf_dir}/documents.parquet"
    ds = read_table(path, columns=["doc_id", "lang", "n_chars"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).view(np.uint64)
        h = (ids * _KNUTH) & _M32
        return batch.append_column(
            "hbucket", pa.array((h >> np.uint64(24)).astype(np.int64)))

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow")
    hist = hash_groupby_agg(
        bucketed.map_batches(lambda t: t.select(
            ["lang", "hbucket", "n_chars"]), batch_format="pyarrow"),
        ["lang", "hbucket"], {"chars": ("n_chars", "sum")},
        num_parts=4).to_pandas()

    total_chars = int(hist["chars"].sum())
    plan: dict[str, tuple[int, int, int]] = {}
    for lang, g in hist.groupby("lang"):
        budget = (total_chars * wmap.get(lang, 0)) // 1000
        g = g.sort_values("hbucket")
        cum = g["chars"].cumsum().to_numpy(dtype=np.int64)
        before = cum - g["chars"].to_numpy(dtype=np.int64)
        cross = np.flatnonzero((before < budget) & (cum > budget))
        if len(cross):
            b_star = int(g["hbucket"].iloc[cross[0]])
            chars_before = int(before[cross[0]])
        else:
            # budget falls exactly on a bucket edge (or past the end):
            # no sliver — everything with before < budget is whole-bucket
            sel = np.flatnonzero(cum <= budget)
            b_star = int(g["hbucket"].iloc[sel[-1]]) + 1 if len(sel) else -1
            chars_before = 0
        plan[lang] = (b_star, chars_before, budget)
    plan_ref = ray.put(plan)

    schema = pa.schema([("lang", pa.string()), ("doc_id", pa.int64()),
                        ("n_chars", pa.int64())])

    def route(batch: pa.Table, want_sliver: bool) -> pa.Table:
        p = ray.get(plan_ref)
        langs = batch.column("lang").to_numpy(zero_copy_only=False)
        hb = batch.column("hbucket").to_numpy(zero_copy_only=False)
        # factorize -> |langs|-sized lut, no per-row Python
        codes, uniq = pd.factorize(langs)
        lut = np.array([p.get(l, (-1, 0, 0))[0] for l in uniq],
                       dtype=np.int64)
        bstar = lut[codes]
        mask = (hb == bstar) if want_sliver else (hb < bstar)
        return batch.filter(pa.array(mask)).select(
            ["lang", "doc_id", "n_chars"]).cast(schema)

    selected = bucketed.map_batches(
        lambda t: route(t, False), batch_format="pyarrow")
    sliver = bucketed.map_batches(
        lambda t: route(t, True), batch_format="pyarrow")

    def gate_sliver(g: pd.DataFrame) -> pa.Table:
        p = ray.get(plan_ref)
        out = []
        for lang, gl in g.groupby("lang"):
            _, chars_before, budget = p[lang]
            ids = gl["doc_id"].to_numpy(dtype=np.int64)
            h = (ids.view(np.uint64) * _KNUTH) & _M32
            order = np.lexsort((ids, h))
            chars = gl["n_chars"].to_numpy(dtype=np.int64)[order]
            before = chars_before + np.concatenate(
                ([0], np.cumsum(chars)[:-1]))
            keep = before < budget
            out.append(pd.DataFrame({
                "lang": lang, "doc_id": ids[order][keep],
                "n_chars": chars[keep]}))
        if not out:
            return schema.empty_table()
        return pa.Table.from_pandas(pd.concat(out, ignore_index=True),
                                    schema=schema, preserve_index=False)

    gated = sliver.repartition(1).map_batches(
        gate_sliver, batch_format="pandas")
    return selected.union(gated).repartition(4).sort(["lang", "doc_id"])


def collapse_repeat_tokens(sf_dir: str) -> rd.Dataset:
    """De-repetition editor: collapse runs of immediately repeated
    tokens to a single occurrence ("the the the" -> "the") — the
    stutter-cleanup rule applied to crawled/ASR/generated text before
    training (a within-doc complement of the corpus-frequency rules;
    cf. the repetition removal family in Rae et al. 2021,
    arXiv:2112.11446 §A1.1, which gates on repeat fractions).

    Embarrassingly parallel — ZERO exchanges: each batch splits to a
    flat token buffer once, compares adjacent token slices vectorized
    over the flat offsets (no per-row Python), rebuilds each doc with
    one ``binary_join`` over a filtered ListArray, and emits counts.
    At 100 TB this is a pure streaming map with perfect scaling.

    Output: (doc_id, clean_text, n_tokens, n_kept) sorted by doc_id.
    """
    docs = _docs(sf_dir, ["doc_id", "text"])

    def collapse(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.Table.from_pydict({
                "doc_id": pa.array([], pa.int64()),
                "clean_text": pa.array([], pa.string()),
                "n_tokens": pa.array([], pa.int64()),
                "n_kept": pa.array([], pa.int64())})
        toks = pc.split_pattern(batch.column("text"), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = toks.offsets.to_numpy().astype(np.int64)
        from ..functions.textstats import string_bytes

        vals = toks.values                      # flat token StringArray
        buf, voffs = string_bytes(vals)
        n = len(vals)
        # token i repeats token i-1 iff same byte length and identical
        # bytes; compare lengths first, then only equal-length pairs
        keep = np.ones(n, dtype=bool)
        if n > 1:
            ln = np.diff(voffs)
            cand = np.flatnonzero(ln[1:] == ln[:-1]) + 1
            # exclude document-boundary positions (first token of a doc
            # never repeats the previous doc's last token)
            doc_start = np.zeros(n, dtype=bool)
            doc_start[offs[:-1]] = True
            cand = cand[~doc_start[cand]]
            if len(cand):
                # vectorized byte comparison over gathered windows
                w = ln[cand]
                m = int(w.max()) if len(w) else 0
                idx = np.arange(m)
                a = buf[np.minimum(voffs[cand][:, None] + idx,
                                   voffs[-1] - 1)]
                b = buf[np.minimum(voffs[cand - 1][:, None] + idx,
                                   voffs[-1] - 1)]
                valid = idx[None, :] < w[:, None]
                eq = ((a == b) | ~valid).all(axis=1)
                keep[cand[eq]] = False
        # rebuild docs: filter the flat tokens, re-slice with adjusted
        # offsets (cumulative kept count at each old offset)
        kept_cum = np.concatenate(([0], np.cumsum(keep)))
        new_offs = kept_cum[offs].astype(np.int32)
        kept_vals = vals.filter(pa.array(keep))
        plist = pa.ListArray.from_arrays(pa.array(new_offs, pa.int32()),
                                         kept_vals)
        clean = pc.binary_join(plist, " ")
        n_tok = np.diff(offs)
        n_kept = np.diff(kept_cum[offs])
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "clean_text": clean,
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_kept": pa.array(n_kept, pa.int64())})

    return docs.map_batches(collapse, batch_format="pyarrow").sort("doc_id")


def adjacent_chunk_pairs(sf_dir: str, size: int = 200,
                         step: int = 150) -> rd.Dataset:
    """Contrastive-positive pair mining: (chunk i, chunk i+1) of the
    same document — the standard self-supervised positive pair for
    retrieval/embedding training (adjacent windows share topic;
    in-batch others become negatives). Pairs are generated inside the
    SAME map_batches that chunks (a doc's windows never leave the
    task), so the op is shuffle-free. Output: (doc_id, chunk_a,
    chunk_b, text_a, text_b) sorted."""
    from ..sources.storage import read_table, rows_to_blocks

    path = f"{sf_dir}/documents.parquet"
    ds = read_table(path, columns=["doc_id", "text"],
                    num_blocks=rows_to_blocks(path))

    def pairs(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        out_id, out_a, out_ta, out_tb = [], [], [], []
        for did, t in zip(ids, texts):
            t = t or ""
            starts = range(0, max(len(t), 1), step)
            chunks = [t[s:s + size] for s in starts]
            for i in range(len(chunks) - 1):
                out_id.append(int(did))
                out_a.append(i)
                out_ta.append(chunks[i])
                out_tb.append(chunks[i + 1])
        n = len(out_id)
        return pa.Table.from_pydict({
            "doc_id": pa.array(out_id, pa.int64()),
            "chunk_a": pa.array(out_a, pa.int64()),
            "chunk_b": pa.array([a + 1 for a in out_a], pa.int64()),
            "text_a": pa.array(out_ta, pa.string()),
            "text_b": pa.array(out_tb, pa.string())}) if n else \
            pa.Table.from_pydict({
                "doc_id": pa.array([], pa.int64()),
                "chunk_a": pa.array([], pa.int64()),
                "chunk_b": pa.array([], pa.int64()),
                "text_a": pa.array([], pa.string()),
                "text_b": pa.array([], pa.string())})

    return (ds.map_batches(pairs, batch_format="pyarrow")
            .repartition(4).sort(["doc_id", "chunk_a"]))


def epoch_shuffle_order(sf_dir: str, epoch: int = 1) -> rd.Dataset:
    """Deterministic epoch-seeded global shuffle order — the
    reproducible permutation a multi-epoch training loader needs
    (same (corpus, epoch) -> same order on any cluster size, no RNG
    state to ship). The shuffle key is the Knuth multiplicative hash
    ``((doc_id + epoch * 1000003) * 2654435761) mod 2^32`` (same
    multiplier as train_test_split / leakage_safe_split so splits and
    shuffles stay consistent); position assignment is ONE range
    exchange on the key (sorting by an incompressible hash IS the
    shuffle — there is no cheaper exact global permutation) followed by
    the block-offset prefix-scan of doc_row_numbers: one stats row per
    sorted block, offsets broadcast, rn = offset + intra-block rank.
    Output: (doc_id, pos) by doc_id."""
    ds = _docs(sf_dir, ["doc_id"])

    def key_of(ids: np.ndarray) -> np.ndarray:
        return ((ids + np.int64(epoch) * np.int64(1000003))
                * np.int64(2654435761)) % np.int64(1 << 32)

    def add_key(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": pa.array(ids.astype(np.int64)),
                         "k": pa.array(key_of(ids.astype(np.int64)))})

    keyed = (ds.map_batches(add_key, batch_format="pyarrow")
             .sort(["k", "doc_id"]).materialize())

    _EMPTY = pa.table({"mnk": pa.array([], pa.int64()),
                       "mnd": pa.array([], pa.int64()),
                       "cnt": pa.array([], pa.int64())})

    def stats(batch: pa.Table) -> pa.Table:
        # blocks arrive sorted by (k, doc_id): row 0 IS the block min;
        # the (k, doc_id) PAIR keys the offset table exactly, so equal
        # hash keys straddling a block boundary can't mis-anchor
        k = batch.column("k").to_numpy(zero_copy_only=False)
        if len(k) == 0:
            return _EMPTY
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({"mnk": pa.array([int(k[0])], pa.int64()),
                         "mnd": pa.array([int(d[0])], pa.int64()),
                         "cnt": pa.array([len(k)], pa.int64())})

    st = (keyed.map_batches(stats, batch_format="pyarrow",
                            batch_size=None)
          .to_pandas().sort_values(["mnk", "mnd"])
          .reset_index(drop=True))
    cnt = st["cnt"].to_numpy(dtype=np.int64)
    offs = np.cumsum(cnt) - cnt
    lut_ref = ray.put({(int(a), int(b)): int(o) for a, b, o in zip(
        st["mnk"], st["mnd"], offs)})

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64())})
        lut = ray.get(lut_ref)
        k = batch.column("k").to_numpy(zero_copy_only=False)
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        base = lut[(int(k[0]), int(d[0]))]
        pos = base + 1 + np.arange(len(k), dtype=np.int64)
        return pa.table({"doc_id": pa.array(d.astype(np.int64)),
                         "pos": pa.array(pos)})

    return (keyed.map_batches(assign, batch_format="pyarrow",
                              batch_size=None).sort("doc_id"))
