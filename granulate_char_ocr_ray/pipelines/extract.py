"""The flagship extraction pipeline (Ray-Data-first assembly).

    read docs table (column-pruned)
      -> explode spans (vectorized Arrow fan-out; doc-level skew defense)
      -> stateless text extraction (html strip / pdf layout / normalize)
      -> glyph classification (actor pool, warm prototype model per actor)
      -> [fanout mode only] groupby span-key reassembly of salted glyphs
      -> final sort by (doc_id, order) only at the consumption edge

Three classifier topologies:

- ``mode="fused"`` (default): decode+segment+classify per media span in
  one actor call. No extra shuffle; span-level parallelism from explode.
- ``mode="fanout"``: segmentation explodes per-glyph rows (the salt),
  classification runs on fixed-width feature rows, one
  ``groupby(span_key)`` restores span text. Use when single media spans
  are themselves huge (north-rule skew path). Pre-split since round 5:
  text spans take a shuffle-free branch; only media glyph rows ride the
  reassembly exchange.
- ``mode="auto"``: DETECTS media-heavy whale documents (vectorized
  per-doc media-span count >= ``whale_media_spans``) and salts only
  their media spans through the fanout arm; all text spans and normal
  docs' media spans run fused with zero shuffle (north rule:
  "media-heavy documents detected and salted to defeat skew").

All modes produce identical results (tests/test_invariant.py) under the
schema precondition that span ``offset`` values are unique within a
document (fanout reassembly keys on (doc_id, order); two MEDIA spans
sharing an offset would merge there while fused mode keeps them
separate — duplicate offsets are malformed input).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..sources.storage import read_table
from ..stages.classify import GlyphClassifierStage, GlyphFeatureClassifier, segment_glyphs
from ..stages.explode import explode_spans
from ..stages.extract import extract_text_spans
from ..synth import derive_docs_batch

INVARIANT_COLS = ["doc_id", "order", "kind", "text", "media_ref"]


def derive_docs(sf_dir: str) -> rd.Dataset:
    """Derive the interleaved docs table from the driver's documents
    table (see synth.derive_spans for the deterministic span rules)."""

    def _derive(batch: pa.Table) -> pa.Table:
        return derive_docs_batch(
            batch.column("doc_id").to_numpy(zero_copy_only=False),
            batch.column("text").to_pylist(),
        )

    ds = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(_derive, batch_format="pyarrow")


def read_docs(path: str) -> rd.Dataset:
    return read_table(path, columns=["doc_id", "spans"])


_SPAN_SCHEMA = pa.schema([
    ("doc_id", pa.string()), ("order", pa.int32()),
    ("kind", pa.string()), ("text", pa.string()),
    ("media_ref", pa.string()), ("confidence", pa.float64()),
])


def _normalize_spans(batch: pa.Table) -> pa.Table:
    """Cast to the one canonical span schema: every union arm emits
    IDENTICAL arrow schemas (the media arm arrives as pandas blocks
    from map_groups; a schema mismatch at the union would spam the
    RefBundle warnings bench.py asserts to zero)."""
    return pa.Table.from_arrays(
        [batch.column(f.name).cast(f.type) for f in _SPAN_SCHEMA],
        schema=_SPAN_SCHEMA)


def _media_placeholders(s: pa.Table) -> pa.Table:
    """Blank text + zero confidence on media-only span rows — the
    classifier fills both; skips the per-row extractor dispatch."""
    n = len(s)
    idx = s.schema.get_field_index("text")
    s = s.set_column(idx, "text", pa.array([""] * n, type=pa.string()))
    if "confidence" in s.schema.names:
        return s
    return s.append_column(
        "confidence", pa.array(np.zeros(n), type=pa.float64()))


def _whale_flags(batch: pa.Table, threshold: int) -> np.ndarray:
    """Per-doc media-heavy ("whale") detector: True where a document
    carries >= ``threshold`` media spans. Fully vectorized: list
    lengths -> flat kind comparison -> per-doc segment sums via
    cumulative-sum differencing (no Python row loop)."""
    import pyarrow.compute as pc

    spans = batch.column("spans")
    spans = spans.combine_chunks() if spans.num_chunks != 1 else spans.chunk(0)
    lengths = pc.list_value_length(spans).to_numpy(zero_copy_only=False)
    lengths = np.nan_to_num(lengths, nan=0).astype(np.int64)
    flat = pc.list_flatten(spans)
    m = pc.equal(pc.struct_field(flat, "kind"), "media") \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    cs = np.concatenate([[0], np.cumsum(m)])
    ends = np.cumsum(lengths)
    return (cs[ends] - cs[ends - lengths]) >= threshold


def extract_spans(
    docs: rd.Dataset,
    *,
    mode: str = "fused",
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int | None = None,
    segmenter: str = "projection",
    binarizer: str = "fixed",
    cascade: bool = False,
    normalize_chain: bool = False,
    whale_media_spans: int = 16,
) -> rd.Dataset:
    """docs Dataset -> flat extracted span rows (unordered; order is an
    explicit column). Columns: doc_id, order, kind, text, media_ref,
    confidence.

    Default ``concurrency=(1, 8)`` is an AUTOSCALING actor pool: it can
    run with a single actor when CPUs are scarce (a fixed-size pool equal
    to the session CPU count starves the read stage and deadlocks small
    sessions) and grows under load. Pass an explicit int for benchmarks.

    ``batch_size=None`` (default) keeps block-sized batches: Ray fuses
    the explode/extract/classify chain into one operator whose task
    granularity then equals the INPUT block count — set block count at
    the read (``override_num_blocks``) to control parallelism. Passing
    an explicit batch_size re-batches the fused chain's INPUT rows
    (docs, not spans), which can silently collapse parallelism."""
    bs = {} if batch_size is None else {"batch_size": batch_size}

    def _fused(src: rd.Dataset) -> rd.Dataset:
        spans = src.map_batches(explode_spans, batch_format="pyarrow")
        spans = spans.map_batches(extract_text_spans,
                                  batch_format="pyarrow")
        return spans.map_batches(
            GlyphClassifierStage,
            batch_format="pyarrow",
            concurrency=concurrency,
            fn_constructor_kwargs={"segmenter": segmenter,
                                   "binarizer": binarizer,
                                   "cascade": cascade,
                                   "normalize_chain": normalize_chain},
            **bs,
        )

    def _media_arm(media_spans: rd.Dataset,
                   pool: int | tuple[int, int]) -> rd.Dataset:
        """media span rows -> reassembled span rows (the SALT path)."""
        glyphs = media_spans.map_batches(
            segment_glyphs, batch_format="pyarrow",
            fn_kwargs={"segmenter": segmenter, "binarizer": binarizer},
        )
        classified = glyphs.map_batches(
            GlyphFeatureClassifier,
            batch_format="pyarrow",
            concurrency=pool,
            **bs,
        )
        # Coalesce the classified glyph rows before the reassembly
        # groupby: Ray's sort exchange pays a fixed per-block cost, and
        # the media-only stream arrives as input-block-count near-empty
        # blocks (the repo's tiny-sort lesson — 10.2 s -> 7.9 s measured
        # on the branch at sf0.1/32 CPUs). Half the cluster's cores
        # keeps the regroup stage fully parallel while bounding the
        # exchange's task count proportionally on any cluster size.
        import ray as _ray

        ncpu = (int(_ray.cluster_resources().get("CPU", 8))
                if _ray.is_initialized() else 8)
        classified = classified.repartition(max(16, ncpu // 2))
        return _reassemble_spans(classified).map_batches(
            _normalize_spans, batch_format="pyarrow")

    if mode == "fused":
        return _fused(docs)
    if mode == "fanout":
        # PRE-SPLIT topology (VERDICT r04 next-steps #6): only media-span
        # glyph rows ride the reassembly exchange. Text spans take a
        # shuffle-free branch (explode -> filter -> extract) and union
        # with the reassembled media spans. The duplicated lineage is
        # read+explode only — cheap vectorized Arrow — while the heavy
        # text payload never shuffles and the classifier actor pool
        # exists solely in the media branch (so the r02 two-consumer
        # pool-duplication hazard documented in _reassemble_spans does
        # not apply: the shared parent is `docs`, upstream of the pool).
        import pyarrow.compute as pc

        def _explode_text(batch: pa.Table) -> pa.Table:
            s = explode_spans(batch)
            return s.filter(pc.not_equal(s.column("kind"), "media"))

        def _explode_media(batch: pa.Table) -> pa.Table:
            s = explode_spans(batch)
            return _media_placeholders(
                s.filter(pc.equal(s.column("kind"), "media")))

        text_spans = docs.map_batches(
            _explode_text, batch_format="pyarrow"
        ).map_batches(extract_text_spans, batch_format="pyarrow"
        ).map_batches(_normalize_spans, batch_format="pyarrow")
        media_spans = docs.map_batches(_explode_media,
                                       batch_format="pyarrow")
        return text_spans.union(_media_arm(media_spans, concurrency))
    if mode == "auto":
        # DETECTED skew (north rule: "media-heavy documents detected
        # and salted"): per-doc whale flags route ONLY whale documents'
        # media spans through the salted fanout arm; everything else —
        # all text spans plus normal docs' media spans — runs the fused
        # path with zero shuffle. Both branches compute the SAME
        # vectorized flags, so every span lands in exactly one arm.
        import pyarrow.compute as pc

        def _explode_regular(batch: pa.Table) -> pa.Table:
            w = _whale_flags(batch, whale_media_spans)
            s = explode_spans(batch)
            lengths = pc.list_value_length(batch.column("spans")) \
                .to_numpy(zero_copy_only=False)
            lengths = np.nan_to_num(lengths, nan=0).astype(np.int64)
            w_rows = np.repeat(w, lengths)
            is_media = pc.equal(s.column("kind"), "media") \
                .to_numpy(zero_copy_only=False)
            return s.filter(pa.array(~(w_rows & is_media)))

        def _explode_whale_media(batch: pa.Table) -> pa.Table:
            w = _whale_flags(batch, whale_media_spans)
            s = explode_spans(batch.filter(pa.array(w)))
            return _media_placeholders(
                s.filter(pc.equal(s.column("kind"), "media")))

        regular = docs.map_batches(
            _explode_regular, batch_format="pyarrow"
        ).map_batches(extract_text_spans, batch_format="pyarrow"
        ).map_batches(
            GlyphClassifierStage,
            batch_format="pyarrow",
            concurrency=concurrency,
            fn_constructor_kwargs={"segmenter": segmenter,
                                   "binarizer": binarizer,
                                   "cascade": cascade,
                                   "normalize_chain": normalize_chain},
            **bs,
        ).map_batches(_normalize_spans, batch_format="pyarrow")
        whale_media = docs.map_batches(_explode_whale_media,
                                       batch_format="pyarrow")
        # whales are by definition rare: a small autoscaling pool
        # suffices and never competes with the fused pool for cores
        return regular.union(_media_arm(whale_media, (1, 4)))
    raise ValueError(f"unknown mode {mode!r}")


def _reassemble_spans(classified: rd.Dataset, num_buckets: int = 64) -> rd.Dataset:
    """Fan-out path reassembly: per-glyph rows -> span rows.

    The one required shuffle: group by the synthesized span key, sort
    glyphs within the group, concat recognized letters. Explicit-order
    restoration — never relies on executor arrival order (SURVEY.md
    §7.7 hard part #1).

    The shuffle keys on ``stable_hash(span_key) % num_buckets`` — a
    COARSE bucket, with a local pandas groupby over the real span keys
    inside each bucket — because Ray's per-group dispatch overhead at
    span-count cardinality dominates wall time (the repo's own hashagg
    lesson; VERDICT r01 next-steps #6). Per-span glyph order still
    restores exactly; bucket count only bounds task granularity.

    Since round 5 only MEDIA rows reach this exchange: ``extract_spans``
    pre-splits the branches at the DOCS level (text spans bypass the
    shuffle entirely; see the fanout branch there). The r02 rejection of
    branching ``classified`` itself — two consumers duplicate the
    classifier actor pool via lineage re-execution — still stands; the
    docs-level split shares only the cheap read+explode lineage."""

    def _add_bucket(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..functions.textstats import hash64_batch

        # separator \x1f (unit separator): NEVER \x00 — pandas' object
        # hashtable hashes strings through a C string and silently MERGES
        # keys that differ only after an embedded NUL (two spans of one
        # doc would concatenate; caught by the invariant suite)
        key = pc.binary_join_element_wise(
            batch.column("doc_id"),
            pc.cast(batch.column("order"), pa.string()),
            "\x1f",
        )
        bucket = (hash64_batch(key) % np.uint64(num_buckets)).astype(np.int64)
        # the 8-byte packed feature is classifier input only — never
        # ride it through the exchange just to drop it after
        t = batch.drop(["feature"])
        t = t.append_column("span_key", key)
        return t.append_column("span_bucket", pa.array(bucket))

    def _regroup_bucket(part: pd.DataFrame) -> pd.DataFrame:
        # Vectorized media-span reassembly (VERDICT r02 next-steps #2):
        # one stable sort by glyph_idx, then grouped string-join /
        # mean — no per-span Python frame construction.
        drop = ["span_key", "span_bucket", "glyph_idx"]
        passthrough = part[part["kind"] != "media"].drop(columns=drop)
        media = part[part["kind"] == "media"]
        if len(media) == 0:
            return passthrough
        # stable sort by glyph_idx: within each span_key group, rows
        # then appear in glyph order (pandas groupby preserves the
        # frame's row order inside each group)
        media = media.sort_values("glyph_idx", kind="stable")
        rec = media[(media["glyph_idx"] >= 0) & (media["text"] != "")]
        by_key = rec.groupby("span_key", sort=False)
        joined = by_key["text"].agg("".join)
        conf = by_key["confidence"].mean()
        heads = media.drop_duplicates("span_key")[
            ["span_key", "doc_id", "order", "kind", "media_ref"]
        ].copy()
        heads["text"] = heads["span_key"].map(joined).fillna("")
        heads["confidence"] = (
            heads["span_key"].map(conf).fillna(0.0).astype(np.float64)
        )
        heads = heads.drop(columns=["span_key"])[
            ["doc_id", "order", "kind", "text", "media_ref", "confidence"]
        ]
        return pd.concat([passthrough, heads], ignore_index=True)

    keyed = classified.map_batches(_add_bucket, batch_format="pyarrow")
    return keyed.groupby("span_bucket").map_groups(_regroup_bucket,
                                                  batch_format="pandas")


def extract_spans_sorted(docs: rd.Dataset, **kwargs) -> rd.Dataset:
    """Invariant-surface output: the 5 invariant columns sorted by
    (doc_id, order)."""
    ds = extract_spans(docs, **kwargs)
    return ds.select_columns(INVARIANT_COLS).sort(["doc_id", "order"])


def reassemble_docs(spans: rd.Dataset, num_buckets: int = 64) -> rd.Dataset:
    """Per-document reassembly (the OCRResult analog, ocr_result.py:7-22):
    ordered concat of span texts + mean confidence per doc_id.

    Coarse-bucketed like ``_reassemble_spans`` (VERDICT r02 next-steps
    #3): a native groupby at DOC cardinality pays Ray's per-group
    dispatch per document; instead shuffle on ``stable_hash(doc_id) %
    num_buckets`` and run one vectorized pandas groupby per bucket."""

    def _add_bucket(batch: pa.Table) -> pa.Table:
        from ..functions.textstats import hash64_batch

        bucket = (
            hash64_batch(batch.column("doc_id")) % np.uint64(num_buckets)
        ).astype(np.int64)
        return batch.append_column("doc_bucket", pa.array(bucket))

    def _assemble_bucket(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values("order", kind="stable")
        grp = part.groupby("doc_id", sort=False)
        nonempty = part[part["text"] != ""]
        joined = nonempty.groupby("doc_id", sort=False)["text"].agg(" ".join)
        out = pd.DataFrame(
            {
                "n_spans": grp.size().astype(np.int64),
                "avg_confidence": grp["confidence"].mean().astype(np.float64),
            }
        )
        out.insert(0, "text", out.index.map(joined).fillna(""))
        out = out.reset_index()  # doc_id column first
        return out[["doc_id", "text", "n_spans", "avg_confidence"]]

    keyed = spans.map_batches(_add_bucket, batch_format="pyarrow")
    return keyed.groupby("doc_bucket").map_groups(
        _assemble_bucket, batch_format="pandas"
    )


def extract_kind(docs: rd.Dataset, kind: str) -> rd.Dataset:
    """Extract only spans of one text-like kind: filter right after the
    explode so media decoding/classification never runs. Returns
    (doc_id, text) sorted by doc_id."""
    import pyarrow.compute as pc

    spans = docs.map_batches(explode_spans, batch_format="pyarrow")
    spans = spans.map_batches(
        lambda t, k=kind: t.filter(pc.equal(t["kind"], k)),
        batch_format="pyarrow",
    )
    spans = spans.map_batches(extract_text_spans, batch_format="pyarrow")
    return spans.select_columns(["doc_id", "text"]).repartition(4).sort("doc_id")


def extract_from_sf(sf_dir: str, **kwargs) -> rd.Dataset:
    """Full flagship: derive docs from sf_dir -> extract -> sorted spans."""
    return extract_spans_sorted(derive_docs(sf_dir), **kwargs)
