"""Text-analysis pipelines over the documents table (vectorized
map_batches + pre-aggregated groupbys). The engine-level generalization
of the reference's evaluation statistics (G2/G3, per-doc metrics and
grouped aggregates, ``evaluate_new_testdata.py:82-134``)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.tables import table_from_pandas
from ray.data.aggregate import Sum

from ..functions.numeric import round_half_up
from ..functions.textstats import (
    fingerprint64_batch,
    gopher_rules_batch,
    hash64_batch,
    lang_id_batch,
    quality_features_batch,
)
from ..sources.storage import read_table, rows_to_blocks


def _docs(sf_dir: str, columns: list[str]) -> rd.Dataset:
    # blocks sized to the data, not the CPU count: a small corpus runs
    # as a handful of tasks instead of 64 near-empty ones (measured 2-3s
    # of pure task overhead per pass at sf0.1), a 100 TB one still fans
    # out to the cap
    path = f"{sf_dir}/documents.parquet"
    return read_table(path, columns=columns,
                      num_blocks=rows_to_blocks(path))


def token_counts(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_tokens) — whitespace token count per document.

    Arrow-native: split_pattern_regex + list_value_length; trimmed empty
    strings count 0."""

    def count(batch: pa.Table) -> pa.Table:
        text = pc.utf8_trim(batch.column("text"), " ")
        toks = pc.split_pattern_regex(text, r"\s+")
        n = pc.list_value_length(toks)
        # empty string -> split yields [""] -> force 0
        n = pc.if_else(pc.equal(text, ""), pa.scalar(0, pa.int32()), n)
        return pa.Table.from_arrays(
            [batch.column("doc_id"), pc.cast(n, pa.int64())],
            names=["doc_id", "n_tokens"],
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(count, batch_format="pyarrow")


def dup_length_bias(sf_dir: str, prefix: int = 64,
                    broadcast_threshold: int = 2_000_000
                    ) -> rd.Dataset:
    """Does duplication correlate with document length? Point-biserial
    correlation between prefix-duplicate membership (the doc's first
    ``prefix`` chars appear in more than one doc — the "same lede"
    boilerplate signal, the prefix key snm_candidate_pairs blocks on)
    and n_chars, plus the two group means — the curation audit run
    before trusting a dedup pass (boilerplate dups skew short;
    mirrored articles skew long; a strong correlation means dedup
    will shift the corpus length distribution). Prefix is codepoints
    (== DuckDB substr on the ASCII fixtures; substring_dups caveat).

    Plan: one (text_hash, count) vocabulary-sized reduce finds dup
    hashes (bounded by DISTINCT duplicated texts, a small fraction);
    below ``broadcast_threshold`` they broadcast once as a sorted
    array and each batch folds exact integer moments (n, sum flag,
    sum chars, sum flag*chars, sum chars^2) — a 5-number partial per
    block, no second exchange. corr from the closed form on exact
    sums. Output: one row (n_docs, n_dups, mean_chars_dup,
    mean_chars_uniq, corr_dup_len) rounded to 6."""
    import ray

    from ..functions.textstats import hash64_batch
    from ..stages.hashagg import hash_groupby_agg

    docs = read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text", "n_chars"])

    def add_hash(batch: pa.Table) -> pa.Table:
        pre = pc.utf8_slice_codeunits(batch.column("text"), 0, prefix)
        h = hash64_batch(pre).view(np.int64)
        # second independent witness hash (reversed prefix — a
        # different polynomial, so a forward collision almost surely
        # splits): lets the dup-group reduce detect 64-bit collisions
        # and fail loud instead of inflating n_dups (ADVICE r04 #3,
        # same hazard naive_bayes_langid asserts on).
        h2 = hash64_batch(pc.utf8_reverse(pre)).view(np.int64)
        return pa.Table.from_pydict({
            "text_hash": pa.array(h, pa.int64()),
            "h2": pa.array(h2, pa.int64()),
            "one": pa.array(np.ones(len(batch), np.int64))})

    counts = hash_groupby_agg(
        docs.map_batches(add_hash, batch_format="pyarrow"),
        ["text_hash"], {"c": ("one", "sum"), "h2min": ("h2", "min"),
                        "h2max": ("h2", "max")}, num_parts=16)
    dup_df = counts.map_batches(
        lambda t: t.filter(pc.greater(t.column("c"), 1)),
        batch_format="pyarrow").to_pandas()
    # a collision that inflates n_dups necessarily lands in a c>1
    # group with two distinct prefixes -> witness hashes disagree
    if len(dup_df) and (dup_df["h2min"] != dup_df["h2max"]).any():
        raise AssertionError(
            "dup_length_bias: 64-bit prefix-hash collision detected; "
            "membership needs exact (128-bit) keying for this corpus")
    if len(dup_df) > broadcast_threshold:
        raise ValueError(
            "dup_length_bias: distinct duplicated texts exceed the "
            "broadcast budget; partition the moment fold on text_hash "
            "(the docs_without_media Bloom path) for this corpus")
    # empty result survives as a (0, 0) frame pre-schema-fix paths
    dh_col = dup_df["text_hash"] if "text_hash" in dup_df.columns \
        else pd.Series(dtype=np.int64)
    dup_ref = ray.put(np.sort(dh_col.to_numpy(np.int64)))

    def moments(batch: pa.Table) -> pd.DataFrame:
        dh = ray.get(dup_ref)
        h = hash64_batch(pc.utf8_slice_codeunits(
            batch.column("text"), 0, prefix)).view(np.int64)
        x = np.zeros(len(h), dtype=np.int64)
        if len(dh):
            pos = np.searchsorted(dh, h)
            pos[pos >= len(dh)] = len(dh) - 1
            x = (dh[pos] == h).astype(np.int64)
        y = batch.column("n_chars").to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pd.DataFrame({
            "n": [np.int64(len(h))], "sx": [x.sum()],
            "sy": [y.sum()], "sxy": [(x * y).sum()],
            "syy": [(y * y).sum()]})

    part = docs.map_batches(moments, batch_format="pyarrow")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = float(df["n"].sum())
        sx = float(df["sx"].sum())
        sy = float(df["sy"].sum())
        sxy = float(df["sxy"].sum())
        syy = float(df["syy"].sum())
        # flag is 0/1 -> sum x^2 == sum x
        num = n * sxy - sx * sy
        den = np.sqrt((n * sx - sx * sx) * (n * syy - sy * sy))
        corr = num / den if den > 0 else np.nan
        mean_dup = sxy / sx if sx else np.nan
        mean_uniq = (sy - sxy) / (n - sx) if n > sx else np.nan
        return pd.DataFrame({
            "n_docs": np.array([n], np.int64),
            "n_dups": np.array([sx], np.int64),
            "mean_chars_dup": round_half_up(np.array([mean_dup]), 6),
            "mean_chars_uniq": round_half_up(np.array([mean_uniq]), 6),
            "corr_dup_len": round_half_up(np.array([corr]), 6)})

    return part.repartition(1).map_batches(finish,
                                           batch_format="pandas")


def word_blocklist_filter(sf_dir: str,
                          blocklist: tuple[str, ...] = ("dup", "slow",
                                                        "spark")
                          ) -> rd.Dataset:
    """C4-style banned-word page filter (Raffel et al. 2020 §2.2
    removed any page containing a blocklist word; RefinedWeb keeps the
    same gate): per document, count token-level blocklist hits and
    emit the keep decision — the report form, so curators can audit
    what a hard filter WOULD drop before enabling it.

    Plan: tokenize per batch (same space-only trim + ``\\s+`` split as
    every SQL-paired tokenizer here), flatten, one vectorized ``isin``
    probe against the broadcast-in-closure blocklist, segment-sum back
    to docs. Embarrassingly parallel — no shuffle; the blocklist ships
    once in the task closure (bytes, not a table), exactly how a real
    50k-word list would ship via ``ray.put``. Output: (doc_id,
    n_banned, keep) sorted by doc_id."""
    blockset = pa.array(sorted(blocklist), pa.string())

    def score(batch: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim(batch.column("text"), " ")
        mask = pc.not_equal(trimmed, "")
        lists = pc.split_pattern_regex(
            pc.utf8_lower(pc.filter(trimmed, mask)), r"\s+")
        lens = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        hit = pc.cast(pc.is_in(pc.list_flatten(lists),
                               value_set=blockset),
                      pa.int64()).to_numpy(zero_copy_only=False)
        n_banned = np.zeros(len(batch), dtype=np.int64)
        kept_rows = np.flatnonzero(
            mask.to_numpy(zero_copy_only=False))
        if len(lens):
            seg = np.repeat(np.arange(len(lens)), lens)
            n_banned[kept_rows] = np.bincount(
                seg, weights=hit, minlength=len(lens)).astype(np.int64)
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "n_banned": pa.array(n_banned),
            "keep": pa.array(n_banned == 0)})

    return (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(score, batch_format="pyarrow")
            .repartition(4).sort("doc_id"))


def doc_quality(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_chars, n_tokens, digit_ratio, upper_ratio) quality
    signals, ratios rounded to 4 decimals (SQL-reproducible)."""

    def q(batch: pa.Table) -> pa.Table:
        f = quality_features_batch(batch.column("text"))
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": pa.array(f["n_chars"], pa.int64()),
                "n_tokens": pa.array(f["n_tokens"], pa.int64()),
                "digit_ratio": pa.array(round_half_up(f["digit_ratio"], 4)),
                "upper_ratio": pa.array(round_half_up(f["upper_ratio"], 4)),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(q, batch_format="pyarrow")


def gopher_quality_rules(sf_dir: str, min_words: int = 50,
                         max_words: int = 100_000) -> rd.Dataset:
    """Gopher/MassiveText repetition-free quality rules (Rae et al.,
    arXiv:2112.11446 Appendix A.1.1) per document: word-count bounds,
    mean word length in [3, 10], symbol-to-word ratio <= 0.1, >= 80%
    alphabetic words, >= 2 distinct Gopher stopwords. Emits the rule
    signals for EVERY doc plus an int ``passes`` flag — one stateless
    map over the corpus, no shuffle (the filter a 100 TB pipeline runs
    before any dedup). ``passes`` is computed on the UNROUNDED float
    signals (engine and SQL both derive them from exact integers, so
    boundary comparisons agree bit-for-bit); only the emitted columns
    round for the hash compare."""

    def g(batch: pa.Table) -> pa.Table:
        f = gopher_rules_batch(batch.column("text"))
        passes = (
            (f["word_count"] >= min_words) & (f["word_count"] <= max_words)
            & (f["mean_word_len"] >= 3.0) & (f["mean_word_len"] <= 10.0)
            & (f["symbol_ratio"] <= 0.1)
            & (f["alpha_frac"] >= 0.8)
            & (f["stop_hits"] >= 2))
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "word_count": pa.array(f["word_count"], pa.int64()),
                "mean_word_len": pa.array(
                    round_half_up(f["mean_word_len"], 4)),
                "symbol_ratio": pa.array(round_half_up(f["symbol_ratio"], 4)),
                "alpha_frac": pa.array(round_half_up(f["alpha_frac"], 4)),
                "stop_hits": pa.array(f["stop_hits"], pa.int64()),
                "passes": pa.array(passes.astype(np.int64), pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        g, batch_format="pyarrow")


def lang_id_scores(sf_dir: str) -> rd.Dataset:
    """(doc_id, pred_lang, score) — stopword-profile language heuristic."""

    def li(batch: pa.Table) -> pa.Table:
        pred, score = lang_id_batch(batch.column("text"))
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "pred_lang": pa.array(pred, pa.string()),
                "score": pa.array(round_half_up(score, 4)),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(li, batch_format="pyarrow")


def fingerprints(sf_dir: str) -> rd.Dataset:
    """(doc_id, fp) — stable 64-bit rolling-hash document fingerprint."""

    def fp(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "fp": pa.array(fingerprint64_batch(batch.column("text")),
                               pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fp, batch_format="pyarrow")


def docs_by_lang(sf_dir: str) -> rd.Dataset:
    """(lang, n_docs, avg_chars) — grouped corpus stats with explicit
    partial aggregation before the shuffle (G3 shape)."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("lang", as_index=False).agg(
            n_docs=("doc_id", "size"), sum_chars=("n_chars", "sum")
        )
        return table_from_pandas(g, preserve_index=False)

    ds = _docs(sf_dir, ["doc_id", "lang", "n_chars"]).map_batches(
        partial, batch_format="pyarrow"
    ).repartition(4)
    agg = ds.groupby("lang").aggregate(
        Sum("n_docs", alias_name="n_docs"), Sum("sum_chars", alias_name="sum_chars")
    )

    def final(batch: pa.Table) -> pa.Table:
        n = batch.column("n_docs").to_numpy(zero_copy_only=False).astype(np.float64)
        s = batch.column("sum_chars").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.Table.from_pydict(
            {
                "lang": batch.column("lang"),
                "n_docs": batch.column("n_docs"),
                "avg_chars": round_half_up(s / n, 2),
            }
        )

    return agg.map_batches(final, batch_format="pyarrow")


def length_histogram(sf_dir: str, bucket: int = 50) -> rd.Dataset:
    """(bucket_lo, n_docs) histogram of document lengths — grouped agg
    by derived key (the analyze_by_word_length analog, G3)."""

    def partial(batch: pa.Table) -> pa.Table:
        n_chars = batch.column("n_chars").to_numpy(zero_copy_only=False)
        lo = (n_chars // bucket) * bucket
        df = pd.DataFrame({"bucket_lo": lo}).groupby("bucket_lo", as_index=False).size()
        return table_from_pandas(
            df.rename(columns={"size": "n"}), preserve_index=False
        )

    ds = _docs(sf_dir, ["n_chars"]).map_batches(partial, batch_format="pyarrow")
    return ds.repartition(4).groupby("bucket_lo").aggregate(Sum("n", alias_name="n_docs"))


def distinct_langs(sf_dir: str) -> pa.Table:
    """Distinct values of one column via Dataset.unique (shuffle-backed
    distinct). Returned as a one-column Arrow table sorted ascending."""
    vals = _docs(sf_dir, ["lang"]).unique("lang")
    return pa.Table.from_pydict({"lang": sorted(v for v in vals if v is not None)})


def filter_quality(sf_dir: str, min_tokens: int = 20,
                   max_upper_ratio: float = 0.3) -> rd.Dataset:
    """Corpus quality filter: doc_ids passing minimum-token-count and
    maximum-uppercase-ratio gates (vectorized per-batch predicate —
    the filter stage of a training-data pipeline)."""

    def keep(batch: pa.Table) -> pa.Table:
        f = quality_features_batch(batch.column("text"))
        mask = (f["n_tokens"] >= min_tokens) & (f["upper_ratio"] <= max_upper_ratio)
        return batch.select(["doc_id"]).filter(pa.array(mask))

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        keep, batch_format="pyarrow").repartition(4).sort("doc_id")


def top_tokens(sf_dir: str, k: int = 20) -> rd.Dataset:
    """Corpus token frequencies, top-k: explode whitespace tokens ->
    two-phase hash aggregate -> global top-k (ties broken by token)."""
    from ..stages.hashagg import hash_groupby_agg

    def explode_tokens(batch: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim(batch.column("text"), " ")
        nonempty = pc.filter(trimmed, pc.not_equal(trimmed, ""))
        flat = pc.list_flatten(pc.split_pattern_regex(nonempty, r"\s+"))
        return pa.Table.from_pydict({"token": flat})

    tokens = _docs(sf_dir, ["text"]).map_batches(explode_tokens,
                                                 batch_format="pyarrow")
    counts = hash_groupby_agg(tokens, ["token"], {"n": ("token", "count")},
                              num_parts=16)
    return counts.sort(["n", "token"], descending=[True, False]).limit(k)


def approx_distinct_tokens(sf_dir: str) -> pa.Table:
    """Approximate distinct-token count via a mergeable HyperLogLog
    sketch: one 4 KiB sketch per batch, max-merged on the driver — the
    shuffle-free cardinality pattern (vs an exact distinct's full
    all-to-all). ~1.6% standard error at p=12. Output: one row
    (approx_distinct, exact-checkable only in tests).

    Token hashing is the splitmix64-finalized polynomial hash
    (textstats.hash64_batch) — a crc32-pair is NOT a 64-bit hash (crc is
    affine in its init: ~32 bits of entropy per length class, which
    biases HLL rank bits; see textstats.hash64 docs and the 10^6-token
    accuracy pytest)."""
    from ..functions.sketch import (
        hll_add_hashes,
        hll_create,
        hll_estimate,
        hll_merge,
    )

    def sketch_batch(batch: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim(batch.column("text"), " ")
        nonempty = pc.filter(trimmed, pc.not_equal(trimmed, ""))
        flat = pc.list_flatten(pc.split_pattern_regex(nonempty, r"\s+"))
        regs = hll_create()
        hll_add_hashes(regs, hash64_batch(flat))
        return pa.Table.from_pydict({"sketch": [regs.tobytes()]})

    sketches = _docs(sf_dir, ["text"]).map_batches(
        sketch_batch, batch_format="pyarrow").to_pandas()
    merged = hll_create()
    for blob in sketches["sketch"]:
        merged = hll_merge(merged, np.frombuffer(blob, dtype=np.uint8))
    return pa.Table.from_pydict(
        {"approx_distinct": pa.array([int(round(hll_estimate(merged)))],
                                     pa.int64())})


def approx_top_tokens(sf_dir: str, k: int = 20,
                      sketch_k: int = 256) -> pa.Table:
    """Approximate token top-k via mergeable Misra-Gries heavy-hitter
    sketches: each batch pre-aggregates locally (Arrow split + pandas
    value_counts) and folds into a bounded counter set; the driver
    merges the small sketches — shuffle-free, vs `top_tokens`' exact
    explode + hash-aggregate. Every token with true count > n/(k+1) is
    guaranteed present; reported counts are lower bounds (accuracy
    pytest bounds the undercount). Output: (token, approx_count) —
    rows-only under the driver gate (approximate by design)."""
    import json as _json

    from ..functions.sketch import mg_add_counts, mg_create, mg_merge

    def sketch_batch(batch: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim(batch.column("text"), " ")
        nonempty = pc.filter(trimmed, pc.not_equal(trimmed, ""))
        flat = pc.list_flatten(pc.split_pattern_regex(nonempty, r"\s+"))
        vc = pd.Series(flat.to_pylist()).value_counts()
        counters = mg_create()
        mg_add_counts(counters, vc.index.tolist(),
                      vc.to_numpy(), k=sketch_k)
        return pa.Table.from_pydict({"sketch": [_json.dumps(counters)]})

    parts = _docs(sf_dir, ["text"]).map_batches(
        sketch_batch, batch_format="pyarrow").to_pandas()
    merged = mg_create()
    for blob in parts["sketch"]:
        merged = mg_merge(merged, _json.loads(blob), k=sketch_k)
    top = sorted(merged.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return pa.Table.from_pydict(
        {"token": pa.array([t for t, _ in top], pa.string()),
         "approx_count": pa.array([c for _, c in top], pa.int64())})


def unigram_logprob_scores(sf_dir: str) -> rd.Dataset:
    """Sorted public form of :func:`_unigram_scores_unsorted` (coalesce
    before the tiny final sort — the range exchange on 64 near-empty
    blocks costs ~2.4 s of pure constant at sf0.1)."""
    return _unigram_scores_unsorted(sf_dir).repartition(4).sort("doc_id")


def _unigram_scores_unsorted(sf_dir: str,
                             with_lang: bool = False) -> rd.Dataset:
    """Unigram LM quality score per doc (the CCNet-style perplexity
    proxy an LLM data pipeline uses to rank documents): mean
    ln p(token) under the corpus's own unigram distribution —
    low-probability word salad scores far below fluent text.

    Scale plan: token frequencies reduce to vocab cardinality via the
    two-phase hash aggregate, then the (token -> ln p) table
    broadcasts once via ``ray.put`` (at web scale: cap to top-K vocab
    with an OOV floor — the broadcast side is vocabulary-sized by
    construction, not corpus-sized); the scoring pass is one
    vectorized Arrow split + sorted-array lookup + segment cumsum per
    block, no shuffle, no per-row Python. Docs are never split across
    blocks, so each block emits finished scores. Output:
    (doc_id, n_tokens, logprob), unsorted (the public wrapper sorts);
    empty docs are excluded (no tokens to score). The broadcast lnp
    ref is built ONCE per call — callers that consume the result twice
    (e.g. :func:`filter_lm_quality`) re-execute only the streaming
    scoring map, never the vocab reduce. ``with_lang=True`` threads the
    document's lang column through the scoring map (free — the batch is
    already in hand) for per-language consumers like
    :func:`lm_quality_tiers`."""
    import ray

    from ..stages.hashagg import hash_groupby_agg

    def explode_tokens(batch: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim(batch.column("text"), " ")
        nonempty = pc.filter(trimmed, pc.not_equal(trimmed, ""))
        flat = pc.list_flatten(pc.split_pattern_regex(nonempty, r"\s+"))
        return pa.Table.from_pydict({"token": flat})

    tokens = _docs(sf_dir, ["text"]).map_batches(explode_tokens,
                                                 batch_format="pyarrow")
    vocab = hash_groupby_agg(tokens, ["token"], {"c": ("token", "count")},
                             num_parts=16).to_pandas()
    total = float(vocab["c"].sum())
    # lookup key is the vectorized 64-bit token hash, NOT the string:
    # object-dtype searchsorted would fall back to per-element Python
    # string comparison (hidden per-row cost)
    vh = hash64_batch(pa.array(vocab["token"], pa.string()))
    order = np.argsort(vh)
    vh = vh[order]
    vlogp = np.log(vocab["c"].to_numpy(dtype=np.float64)[order] / total)
    ref = ray.put((vh, vlogp))

    def score(batch: pa.Table) -> pa.Table:
        # DuckDB trim() strips spaces only — match it exactly so a
        # tab/newline-edged doc tokenizes identically to the oracle
        # (ADVICE r03)
        trimmed = pc.utf8_trim(batch.column("text"), " ")
        mask = pc.not_equal(trimmed, "")
        mask_np = mask.to_numpy(zero_copy_only=False)
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False)[mask_np]
        lists = pc.split_pattern_regex(pc.filter(trimmed, mask), r"\s+")
        lens = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        th = hash64_batch(pc.list_flatten(lists))
        vhs, vls = ray.get(ref)
        pos = np.searchsorted(vhs, th)
        pos[pos >= len(vhs)] = len(vhs) - 1 if len(vhs) else 0
        logp = vls[pos]
        ends = np.cumsum(lens)
        cs = np.concatenate([np.zeros(1), np.cumsum(logp)])
        sums = cs[ends] - cs[ends - lens]
        cols: dict = {"doc_id": ids.astype(np.int64)}
        fields = [("doc_id", pa.int64())]
        if with_lang:
            cols["lang"] = pc.filter(batch.column("lang"), mask)
            fields.append(("lang", pa.string()))
        cols["n_tokens"] = lens
        cols["logprob"] = round_half_up(sums / lens, 6)
        fields += [("n_tokens", pa.int64()), ("logprob", pa.float64())]
        return pa.Table.from_pydict(cols, schema=pa.schema(fields))

    read_cols = ["doc_id", "lang", "text"] if with_lang else \
        ["doc_id", "text"]
    return _docs(sf_dir, read_cols).map_batches(
        score, batch_format="pyarrow")


def dsir_importance_weights(sf_dir: str, target_lang: str = "en",
                            alpha: float = 0.5) -> rd.Dataset:
    """DSIR-style importance weight per document (Xie et al.,
    arXiv:2302.03169): mean per-token log-likelihood ratio
    ln p_target(tok) - ln p_raw(tok) between a TARGET distribution
    (here: the ``target_lang`` subset's unigram LM — the stand-in for
    DSIR's target-domain corpus) and the RAW corpus unigram LM, both
    add-``alpha`` smoothed over the shared vocabulary. Documents that
    look like the target domain score high; importance resampling
    keeps docs proportional to exp(weight).

    Scale plan (same as :func:`unigram_logprob_scores`): ONE token
    explode carrying the target flag reduces to vocabulary cardinality
    via the two-phase hash aggregate (count + target-count in the same
    exchange); the (token-hash -> ln ratio) table broadcasts once via
    ``ray.put`` (vocabulary-sized; DSIR's hashed-feature variant caps
    it at a fixed 2^k buckets at web scale); the scoring pass is a
    vectorized sorted-array lookup + segment cumsum per block — no
    second shuffle. Output: (doc_id, n_tokens, lnw) sorted by doc_id;
    empty docs excluded (no tokens to weigh)."""
    import ray

    from ..stages.hashagg import hash_groupby_agg

    def explode_tokens(batch: pa.Table) -> pa.Table:
        # DuckDB trim() strips spaces only — match it exactly so a
        # tab/newline-edged doc tokenizes identically to the oracle
        # (ADVICE r03)
        trimmed = pc.utf8_trim(batch.column("text"), " ")
        mask = pc.not_equal(trimmed, "")
        mask_np = mask.to_numpy(zero_copy_only=False)
        lists = pc.split_pattern_regex(pc.filter(trimmed, mask), r"\s+")
        lens = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        is_t = pc.equal(pc.filter(batch.column("lang"), mask),
                        target_lang).to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {"token": pc.list_flatten(lists),
             "t": pa.array(np.repeat(is_t.astype(np.int64), lens))})

    tokens = _docs(sf_dir, ["lang", "text"]).map_batches(
        explode_tokens, batch_format="pyarrow")
    vocab = hash_groupby_agg(tokens, ["token"],
                             {"c": ("token", "count"), "ct": ("t", "sum")},
                             num_parts=16).to_pandas()
    c = vocab["c"].to_numpy(dtype=np.float64)
    ct = vocab["ct"].to_numpy(dtype=np.float64)
    n_raw, n_tgt, v = float(c.sum()), float(ct.sum()), float(len(vocab))
    vh = hash64_batch(pa.array(vocab["token"], pa.string()))
    order = np.argsort(vh)
    lnr = (np.log((ct + alpha) / (n_tgt + alpha * v))
           - np.log((c + alpha) / (n_raw + alpha * v)))[order]
    ref = ray.put((vh[order], lnr))

    def score(batch: pa.Table) -> pa.Table:
        # DuckDB trim() strips spaces only — match it exactly so a
        # tab/newline-edged doc tokenizes identically to the oracle
        # (ADVICE r03)
        trimmed = pc.utf8_trim(batch.column("text"), " ")
        mask = pc.not_equal(trimmed, "")
        mask_np = mask.to_numpy(zero_copy_only=False)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)[mask_np]
        lists = pc.split_pattern_regex(pc.filter(trimmed, mask), r"\s+")
        lens = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        th = hash64_batch(pc.list_flatten(lists))
        vhs, vls = ray.get(ref)
        pos = np.searchsorted(vhs, th)
        pos[pos >= len(vhs)] = len(vhs) - 1 if len(vhs) else 0
        ends = np.cumsum(lens)
        cs = np.concatenate([np.zeros(1), np.cumsum(vls[pos])])
        sums = cs[ends] - cs[ends - lens]
        return pa.Table.from_pydict(
            {"doc_id": ids.astype(np.int64),
             "n_tokens": lens,
             "lnw": round_half_up(sums / lens, 6)},
            schema=pa.schema([("doc_id", pa.int64()),
                              ("n_tokens", pa.int64()),
                              ("lnw", pa.float64())]))

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow").repartition(4).sort("doc_id")


def cap_docs_per_source(sf_dir: str, cap: int = 10) -> rd.Dataset:
    """Per-domain document quota (the C4/RefinedWeb hot-domain cap): at
    most ``cap`` documents per source, keeping the lowest doc_ids —
    the skew-control step a web-scale pipeline runs so no domain
    dominates the training mix. Distributed top-n-per-key via
    :func:`stages.hashagg.hash_groupby_topn` (local per-block top-n
    bounds the exchange to cap x |sources| rows per block — never a
    corpus-sized shuffle even when one domain is 90% of the crawl).
    Output: (doc_id, source) sorted by doc_id."""
    from ..stages.hashagg import hash_groupby_topn

    ds = _docs(sf_dir, ["doc_id", "source"])
    kept = hash_groupby_topn(ds, ["source"], ["doc_id"], [True], cap,
                             num_parts=16)
    return kept.select_columns(["doc_id", "source"]) \
        .repartition(4).sort("doc_id")


def token_freq_of_freq(sf_dir: str) -> rd.Dataset:
    """Frequency-of-frequencies histogram over the corpus vocabulary
    (the Zipf-tail audit a data pipeline runs before choosing vocab
    cutoffs / Good-Turing smoothing): how many distinct tokens occur
    exactly c times. Output: (freq, n_tokens) ordered by freq.

    Two chained two-phase hash aggregates; the second one's input is
    already vocabulary-sized and its output is at most |distinct
    counts| rows (~log-scale small), so the wide work is one narrow
    shuffle of per-block token partials."""
    from ..stages.hashagg import hash_groupby_agg

    def explode_tokens(batch: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim(batch.column("text"), " ")
        nonempty = pc.filter(trimmed, pc.not_equal(trimmed, ""))
        flat = pc.list_flatten(pc.split_pattern_regex(nonempty, r"\s+"))
        return pa.Table.from_pydict({"token": flat})

    tokens = _docs(sf_dir, ["text"]).map_batches(explode_tokens,
                                                 batch_format="pyarrow")
    counts = hash_groupby_agg(tokens, ["token"], {"freq": ("token", "count")},
                              num_parts=16)
    fof = hash_groupby_agg(counts, ["freq"], {"n_tokens": ("freq", "count")},
                           num_parts=4)
    return fof.sort("freq")


def tfidf_top_terms(sf_dir: str) -> rd.Dataset:
    """Most characteristic token per document by TF-IDF (the classic
    keyword/topic signal a training-data pipeline uses for corpus
    composition audits): score(t, d) = tf(t, d) * ln(N / df(t)),
    highest score wins, ties broken by the lexicographically smallest
    token. Output: (doc_id, token, tf, tfidf) ordered by doc_id.

    Distributed plan — three bounded exchanges, nothing driver-sized:
    (1) term frequencies are complete per block with NO shuffle (a doc
    is one row, so its token counts never split); (2) document
    frequency reduces tf to vocabulary cardinality via the two-phase
    hash aggregate; (3) tf joins df token-partitioned (vocabulary can
    exceed broadcast size at web scale), and (4) the per-doc argmax is
    the associative keep-best reduce (one row per (block, doc) leaves
    each block). N (non-empty doc count) is a one-row-per-block scalar
    exchange over the pruned text column."""
    from ..stages.hashagg import hash_groupby_agg, hash_groupby_best
    from ..stages.join import partitioned_join

    docs = _docs(sf_dir, ["doc_id", "text"])

    def term_freq(batch: pa.Table) -> pa.Table:
        # DuckDB trim() strips spaces only — match it exactly so a
        # tab/newline-edged doc tokenizes identically to the oracle
        # (ADVICE r03)
        trimmed = pc.utf8_trim(batch.column("text"), " ")
        mask = pc.not_equal(trimmed, "")
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False)[mask.to_numpy(zero_copy_only=False)]
        lists = pc.split_pattern_regex(pc.filter(trimmed, mask), r"\s+")
        lens = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({
            "doc_id": np.repeat(ids, lens),
            "token": pc.list_flatten(lists).to_pandas(),
        })
        tf = df.groupby(["doc_id", "token"], as_index=False).agg(
            tf=("token", "size"))
        return table_from_pandas(tf, preserve_index=False)

    tf = docs.map_batches(term_freq, batch_format="pyarrow")
    # df(t): each tf row is one distinct (doc, token) pair, so counting
    # rows per token IS the document frequency
    df_tbl = hash_groupby_agg(tf, ["token"], {"df": ("token", "count")},
                              num_parts=16)

    def ndocs_partial(batch: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim(batch.column("text"), " ")
        n = pc.sum(pc.cast(pc.not_equal(trimmed, ""), pa.int64()))
        return pa.Table.from_pydict(
            {"n": pa.array([n.as_py() or 0], pa.int64())})

    n_docs = float(_docs(sf_dir, ["text"]).map_batches(
        ndocs_partial, batch_format="pyarrow").to_pandas()["n"].sum())

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        m = left.merge(right, on="token")
        idf = np.log(n_docs / m["df"].to_numpy(dtype=np.float64))
        m["tfidf"] = round_half_up(m["tf"].to_numpy(dtype=np.float64) * idf, 4)
        return m[["doc_id", "token", "tf", "tfidf"]]

    scored = partitioned_join(
        tf, df_tbl, "token", "token", merge, num_buckets=16,
        left_schema=pa.schema([("doc_id", pa.int64()), ("token", pa.string()),
                               ("tf", pa.int64())]),
        right_schema=pa.schema([("token", pa.string()), ("df", pa.int64())]),
    )
    best = hash_groupby_best(scored, ["doc_id"], ["tfidf", "token"],
                             ascending=[False, True], num_parts=16)
    return best.repartition(4).sort("doc_id")


def bm25_search(sf_dir: str, terms: tuple[str, ...] = ("spark", "hash",
                                                       "window"),
                k1: float = 1.2, b: float = 0.75, k: int = 20
                ) -> rd.Dataset:
    """BM25 keyword retrieval (Robertson/Sparck-Jones, the standard
    lexical ranking an LLM-data pipeline uses for targeted corpus
    slicing): score each document against a fixed bag of query terms,
    return the top-k. idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1);
    score(d) = sum_t idf * tf * (k1+1) / (tf + k1 * (1 - b + b *
    dl / avgdl)).

    Distributed plan — two streaming passes, no shuffle of doc rows:
    (1) corpus statistics fold to ONE row per block (doc count, total
    length, per-term document frequency) and the driver finishes the
    |terms|+2 scalars; (2) scoring is embarrassingly parallel per
    batch (flattened-token vector compare + segment-sum per term) with
    a partial top-k per block, so the final exchange carries k x
    blocks rows. Terms ship in the closure (bytes, not a table).
    Output: (doc_id, score) top-k by score desc, doc_id asc.

    Reference analogue: the keyword-presence filters of
    evaluate_new_testdata.py:137-163 upgraded to a ranked retrieval."""

    def _tok(batch: pa.Table):
        # DuckDB trim() strips spaces only — match it exactly so a
        # tab/newline-edged doc tokenizes identically to the oracle
        # (ADVICE r03)
        trimmed = pc.utf8_trim(batch.column("text"), " ")
        mask = pc.not_equal(trimmed, "")
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False)[mask.to_numpy(zero_copy_only=False)]
        lists = pc.split_pattern_regex(pc.filter(trimmed, mask), r"\s+")
        lens = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(lists)
        return ids, lens, flat

    def _tf_matrix(lens: np.ndarray, flat: pa.Array) -> np.ndarray:
        """(docs x terms) term counts via vectorized compare +
        reduceat segment sums — no Python loop over rows."""
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        out = np.zeros((len(lens), len(terms)), dtype=np.int64)
        for j, t in enumerate(terms):
            eq = pc.cast(pc.equal(flat, t), pa.int64()).to_numpy(
                zero_copy_only=False)
            if len(eq):
                sums = np.add.reduceat(eq, starts)
                sums[lens == 0] = 0
                out[:, j] = sums
        return out

    def stats_partial(batch: pa.Table) -> pa.Table:
        ids, lens, flat = _tok(batch)
        tfm = _tf_matrix(lens, flat)
        row = {"n": pa.array([len(ids)], pa.int64()),
               "total": pa.array([int(lens.sum())], pa.int64())}
        for j in range(len(terms)):
            row[f"df{j}"] = pa.array([int((tfm[:, j] > 0).sum())],
                                     pa.int64())
        return pa.Table.from_pydict(row)

    stats = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        stats_partial, batch_format="pyarrow").to_pandas()
    n_docs = float(stats["n"].sum())
    avgdl = float(stats["total"].sum()) / n_docs
    idf = np.array([
        np.log((n_docs - float(stats[f"df{j}"].sum()) + 0.5)
               / (float(stats[f"df{j}"].sum()) + 0.5) + 1.0)
        for j in range(len(terms))])

    def score_partial(batch: pa.Table) -> pa.Table:
        ids, lens, flat = _tok(batch)
        tfm = _tf_matrix(lens, flat).astype(np.float64)
        norm = k1 * (1.0 - b + b * lens.astype(np.float64) / avgdl)
        score = np.zeros(len(ids))
        for j in range(len(terms)):  # fixed order == SQL's + chain
            score = score + idf[j] * tfm[:, j] * (k1 + 1.0) \
                / (tfm[:, j] + norm)
        df = pd.DataFrame({"doc_id": ids.astype(np.int64),
                           "score": round_half_up(score, 4)})
        return table_from_pandas(
            df.sort_values(["score", "doc_id"],
                           ascending=[False, True]).head(k),
            preserve_index=False)

    partial = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        score_partial, batch_format="pyarrow")
    # the partials are k x blocks rows — coalesce before the sort so
    # the final ordering is one tiny task, not a full range exchange
    return partial.repartition(1).sort(
        ["score", "doc_id"], descending=[True, False]).limit(k)


def bigram_pmi(sf_dir: str, min_count: int = 5, k: int = 30,
               broadcast_threshold: int = 1_000_000) -> rd.Dataset:
    """Collocation mining: the top-k adjacent token pairs by pointwise
    mutual information, PMI(w1, w2) = ln((c12/B) / ((c1/U) * (c2/U)))
    with B = total bigrams, U = total unigrams — the standard
    phrase-discovery signal a tokenizer/vocab pipeline computes over a
    corpus. Pairs below ``min_count`` occurrences are dropped (PMI is
    noise at low counts).

    Distributed plan — exactly TWO exchanges: bigrams form VECTORIZED
    per block (the flattened token array zipped with its shift, doc
    boundaries masked via the segment ids — no Python loop), and the
    bigram / unigram counts reduce through two-phase hash aggregates.
    Both REDUCED tables materialize once (bigram- and
    vocab-cardinality — the multi-consumer rule), so the U and B
    scalars fold from them with no third pass over the corpus. The
    unigram counts then attach by size dispatch: a vocabulary under
    the broadcast threshold ships once as a driver dict (the common
    case — natural-language vocabularies are ~10⁷ even at 100 TB);
    above it, TWO token-partitioned joins. Final top-k coalesces to
    one block before sorting (the filtered table is collocation-
    cardinality). Output: (w1, w2, c12, pmi) by pmi desc, w1, w2."""
    import ray

    from ..stages.hashagg import hash_groupby_agg
    from ..stages.join import partitioned_join

    docs = _docs(sf_dir, ["text"])

    def _flat(batch: pa.Table):
        # DuckDB trim() strips spaces only — match it exactly so a
        # tab/newline-edged doc tokenizes identically to the oracle
        # (ADVICE r03)
        trimmed = pc.utf8_trim(batch.column("text"), " ")
        mask = pc.not_equal(trimmed, "")
        lists = pc.split_pattern_regex(pc.filter(trimmed, mask), r"\s+")
        lens = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(lists).to_pandas().to_numpy(dtype=object)
        seg = np.repeat(np.arange(len(lens)), lens)
        return flat, seg

    def bigram_partial(batch: pa.Table) -> pa.Table:
        flat, seg = _flat(batch)
        if len(flat) < 2:
            return pa.Table.from_pydict(
                {"w1": pa.array([], pa.string()),
                 "w2": pa.array([], pa.string()),
                 "c12": pa.array([], pa.int64())})
        same = seg[1:] == seg[:-1]  # mask cross-document pairs
        df = pd.DataFrame({"w1": flat[:-1][same], "w2": flat[1:][same]})
        g = df.groupby(["w1", "w2"], as_index=False).agg(c12=("w1", "size"))
        return table_from_pandas(g, preserve_index=False)

    bc = hash_groupby_agg(
        docs.map_batches(bigram_partial, batch_format="pyarrow"),
        ["w1", "w2"], {"c12": ("c12", "sum")}, num_parts=16).materialize()

    def unigram_partial(batch: pa.Table) -> pa.Table:
        flat, _ = _flat(batch)
        g = pd.DataFrame({"w": flat}).groupby("w", as_index=False).agg(
            c=("w", "size"))
        return table_from_pandas(g, preserve_index=False)

    uc = hash_groupby_agg(
        docs.map_batches(unigram_partial, batch_format="pyarrow"),
        ["w"], {"c": ("c", "sum")}, num_parts=16).materialize()

    # U and B fold from the materialized REDUCED tables — no third
    # pass over the corpus, O(vocab)/O(bigram) partial sums
    def _fold(ds: rd.Dataset, col: str) -> float:
        part = ds.map_batches(
            lambda df, c=col: pd.DataFrame({"s": [np.int64(df[c].sum())]}),
            batch_format="pandas").to_pandas()
        return float(part["s"].sum())

    u_tot = _fold(uc, "c")
    b_tot = _fold(bc, "c12")

    filt = bc.map_batches(
        lambda df: df[df["c12"] >= min_count], batch_format="pandas")

    def _pmi(m: pd.DataFrame) -> pd.DataFrame:
        c12 = m["c12"].to_numpy(dtype=np.float64)
        c1 = m["c1"].to_numpy(dtype=np.float64)
        c2 = m["c2"].to_numpy(dtype=np.float64)
        pmi = np.log((c12 / b_tot) / ((c1 / u_tot) * (c2 / u_tot)))
        m["pmi"] = round_half_up(pmi, 4)
        m["c12"] = m["c12"].astype(np.int64)
        return m[["w1", "w2", "c12", "pmi"]]

    # uc is materialized, so count() is a metadata read — no execution
    if uc.count() <= broadcast_threshold:
        uc_df = uc.to_pandas()
        cmap_ref = ray.put(dict(zip(uc_df["w"], uc_df["c"].astype(
            np.int64))))

        def attach(df: pd.DataFrame) -> pd.DataFrame:
            cmap = ray.get(cmap_ref)
            df = df.copy()
            df["c1"] = df["w1"].map(cmap)
            df["c2"] = df["w2"].map(cmap)
            return _pmi(df)

        scored = filt.map_batches(attach, batch_format="pandas")
    else:
        def attach1(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
            return lf.merge(rf.rename(columns={"w": "w1", "c": "c1"}),
                            on="w1", how="inner")

        j1 = partitioned_join(
            filt, uc, "w1", "w", attach1, num_buckets=16,
            left_schema=pa.schema([("w1", pa.string()),
                                   ("w2", pa.string()),
                                   ("c12", pa.int64())]),
            right_schema=pa.schema([("w", pa.string()),
                                    ("c", pa.int64())]))

        def attach2(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
            return _pmi(lf.merge(rf.rename(columns={"w": "w2",
                                                    "c": "c2"}),
                                 on="w2", how="inner"))

        scored = partitioned_join(
            j1, uc, "w2", "w", attach2, num_buckets=16,
            left_schema=pa.schema([("w1", pa.string()),
                                   ("w2", pa.string()),
                                   ("c12", pa.int64()),
                                   ("c1", pa.int64())]),
            right_schema=pa.schema([("w", pa.string()),
                                    ("c", pa.int64())]))

    return scored.repartition(1).sort(
        ["pmi", "w1", "w2"], descending=[True, False, False]).limit(k)


def vocab_coverage(sf_dir: str,
                   pcts: tuple[int, ...] = (50, 90, 99)) -> pa.Table:
    """Vocabulary coverage curve: the number of most-frequent token
    types needed to cover each percentage of total token mass — the
    Zipf-curve summary a tokenizer-budget decision reads (how large
    must a vocab be to cover 99% of the corpus). Token counts reduce
    through the two-phase hash aggregate to VOCAB cardinality; the
    cumulative scan then runs on the reduced table collected once
    (natural-language vocabularies are ~10⁷ types even at 100 TB —
    the documented bounded-collect; the count order is (count desc,
    token asc), deterministic). Output: (pct, n_token_types,
    covered_tokens) per requested percentage."""
    from ..stages.hashagg import hash_groupby_agg

    def explode_tokens(batch: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim(batch.column("text"), " ")
        nonempty = pc.filter(trimmed, pc.not_equal(trimmed, ""))
        flat = pc.list_flatten(pc.split_pattern_regex(nonempty, r"\s+"))
        return pa.Table.from_pydict({"token": flat})

    tokens = _docs(sf_dir, ["text"]).map_batches(explode_tokens,
                                                 batch_format="pyarrow")
    counts = hash_groupby_agg(tokens, ["token"],
                              {"n": ("token", "count")},
                              num_parts=16).to_pandas()
    counts = counts.sort_values(["n", "token"],
                                ascending=[False, True])
    n = counts["n"].to_numpy(dtype=np.int64)
    cum = np.cumsum(n)
    total = int(cum[-1]) if len(cum) else 0
    rows = []
    for p in pcts:
        need = -(-total * p // 100)  # ceil(total * p / 100) in ints
        idx = int(np.searchsorted(cum, need, side="left"))
        rows.append((int(p), idx + 1 if total else 0,
                     int(cum[idx]) if total else 0))
    return pa.Table.from_pydict({
        "pct": pa.array([r[0] for r in rows], pa.int64()),
        "n_token_types": pa.array([r[1] for r in rows], pa.int64()),
        "covered_tokens": pa.array([r[2] for r in rows], pa.int64())})


def filter_lm_quality(sf_dir: str, drop_below: float = 0.1
                      ) -> rd.Dataset:
    """Perplexity-gated corpus filter (the CCNet recipe): drop the
    bottom ``drop_below`` fraction of documents by unigram-LM score,
    with an EXACT distributed quantile threshold. The per-doc scores
    are 6-decimal-rounded, so their distribution reduces to a
    domain-bounded value histogram (two-phase hash aggregate, one
    narrow exchange); the threshold is the smallest score whose
    cumulative distribution reaches ``drop_below`` (ties kept —
    identical to SQL ``cume_dist()``), computed from the collected
    histogram and applied as a broadcast scalar gate in a second
    scoring pass. Scoring re-executes rather than materializing the
    doc-cardinality score table (two streaming passes beat pinning a
    corpus-sized intermediate; the vocab reduce and lnp broadcast run
    ONCE — both passes share the same lazy dataset). Output:
    (doc_id, n_tokens, logprob) for surviving docs, by doc_id."""
    scores = _unigram_scores_unsorted(sf_dir)

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("logprob", as_index=False)
                .agg(n=("logprob", "size")))

    from ..stages.hashagg import hash_groupby_agg
    hist = hash_groupby_agg(
        scores.map_batches(hist_partial, batch_format="pandas"),
        ["logprob"], {"n": ("n", "sum")}, num_parts=8).to_pandas()
    hist = hist.sort_values("logprob")
    cum = np.cumsum(hist["n"].to_numpy(dtype=np.int64))
    n_total = int(cum[-1]) if len(cum) else 0
    cd = cum / float(n_total) if n_total else cum.astype(float)
    idx = int(np.searchsorted(cd, drop_below, side="left"))
    threshold = float(hist["logprob"].to_numpy()[idx]) if n_total else 0.0

    return scores.map_batches(
        lambda df: df[df["logprob"] >= threshold],
        batch_format="pandas").repartition(4).sort("doc_id")


def _lang_tier_cuts(hist: pd.DataFrame) -> dict[str, tuple[float, float]]:
    """Per-language (head_cut, middle_cut) logprob thresholds from a
    reduced (lang, logprob, n) value histogram, with descending
    cume_dist semantics: a doc is head iff
    count(logprob >= x)/n_lang <= 1/3 at its value x (ties share a
    tier — identical to SQL ``cume_dist() OVER (PARTITION BY lang
    ORDER BY logprob DESC)``). A language whose top value already
    holds >1/3 of its mass gets an ``inf`` head cut: no head docs,
    matching the window function exactly."""
    cuts: dict[str, tuple[float, float]] = {}
    for lang, g in hist.groupby("lang"):
        g = g.sort_values("logprob", ascending=False)
        n = g["n"].to_numpy(dtype=np.int64)
        cd = np.cumsum(n) / float(n.sum())
        vals = g["logprob"].to_numpy(dtype=np.float64)
        head = vals[cd <= 1.0 / 3.0]
        mid = vals[cd <= 2.0 / 3.0]
        cuts[str(lang)] = (
            float(head[-1]) if len(head) else float("inf"),
            float(mid[-1]) if len(mid) else float("inf"))
    return cuts


def lm_quality_tiers(sf_dir: str) -> rd.Dataset:
    """CCNet-style quality tiers (the 'tier extraction' a web-scale
    corpus pipeline runs before mixing training data, arXiv:1911.00359
    §4.4): every document is labeled head / middle / tail by where its
    unigram-LM logprob falls within ITS LANGUAGE's score distribution
    — head is the most-fluent third. Extends the reference's single
    global quality gate (backend/application/services/
    ocr_service.py:283-329 confidence thresholding) to the grouped,
    distribution-calibrated form.

    Scale plan: scores are 6-decimal-rounded, so each language's score
    distribution reduces EXACTLY to a (lang, logprob) value histogram
    (two-phase hash aggregate, one narrow exchange — never a global
    sort or corpus-sized window); the per-language cuts are computed
    driver-side on the reduced table and applied as a broadcast gate
    in a second streaming pass that shares the vocab reduce + lnp
    broadcast with the first (same lazy dataset — only the scoring
    map re-executes). Output: (doc_id, lang, n_tokens, logprob, tier)
    sorted by doc_id."""
    from ..stages.hashagg import hash_groupby_agg

    scores = _unigram_scores_unsorted(sf_dir, with_lang=True)

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(["lang", "logprob"], as_index=False)
                .agg(n=("logprob", "size")))

    hist = hash_groupby_agg(
        scores.map_batches(hist_partial, batch_format="pandas"),
        ["lang", "logprob"], {"n": ("n", "sum")}, num_parts=8).to_pandas()
    cuts = _lang_tier_cuts(hist)
    head_cut = {k: v[0] for k, v in cuts.items()}
    mid_cut = {k: v[1] for k, v in cuts.items()}

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        lp = df["logprob"].to_numpy(dtype=np.float64)
        t_head = df["lang"].map(head_cut).to_numpy(dtype=np.float64)
        t_mid = df["lang"].map(mid_cut).to_numpy(dtype=np.float64)
        df = df.copy()
        df["tier"] = np.where(
            lp >= t_head, "head",
            np.where(lp >= t_mid, "middle", "tail"))
        return df

    return scores.map_batches(attach, batch_format="pandas").repartition(4).sort("doc_id")


def tier_mix_weights(sf_dir: str) -> pa.Table:
    """Per-(lang, tier) corpus mix table: document counts and token
    mass of each CCNet quality tier — the table a data-mixing step
    reads to set per-tier sampling weights (e.g. upsample heads,
    downsample tails). ONE streaming pass total: the histogram partial
    also sums n_tokens per (lang, logprob), so both the tier cuts AND
    the per-tier doc/token masses fall out of the same reduced value
    histogram driver-side — no second pass over the corpus, no join.
    Output: (lang, tier, n_docs, n_tokens) sorted by (lang, tier)."""
    from ..stages.hashagg import hash_groupby_agg

    scores = _unigram_scores_unsorted(sf_dir, with_lang=True)

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(["lang", "logprob"], as_index=False)
                .agg(n=("logprob", "size"), tok=("n_tokens", "sum")))

    hist = hash_groupby_agg(
        scores.map_batches(hist_partial, batch_format="pandas"),
        ["lang", "logprob"],
        {"n": ("n", "sum"), "tok": ("tok", "sum")},
        num_parts=8).to_pandas()
    cuts = _lang_tier_cuts(hist)
    t_head = hist["lang"].map({k: v[0] for k, v in cuts.items()})
    t_mid = hist["lang"].map({k: v[1] for k, v in cuts.items()})
    lp = hist["logprob"].to_numpy(dtype=np.float64)
    hist["tier"] = np.where(
        lp >= t_head.to_numpy(dtype=np.float64), "head",
        np.where(lp >= t_mid.to_numpy(dtype=np.float64), "middle",
                 "tail"))
    out = (hist.groupby(["lang", "tier"], as_index=False)
           .agg(n_docs=("n", "sum"), n_tokens=("tok", "sum"))
           .sort_values(["lang", "tier"]))
    return pa.Table.from_pydict({
        "lang": pa.array(out["lang"].to_numpy(dtype=object), pa.string()),
        "tier": pa.array(out["tier"].to_numpy(dtype=object), pa.string()),
        "n_docs": pa.array(out["n_docs"].to_numpy(dtype=np.int64),
                           pa.int64()),
        "n_tokens": pa.array(out["n_tokens"].to_numpy(dtype=np.int64),
                             pa.int64())})


def kwic_snippets(sf_dir: str, term: str = "spark", window: int = 3
                  ) -> rd.Dataset:
    """Keyword-in-context extraction: for every occurrence of ``term``,
    the surrounding ±``window``-token snippet — the concordance /
    search-result-highlight op of an extraction pipeline. Fully
    streaming and embarrassingly parallel: each block splits its docs
    with one Arrow kernel, finds hits with one vectorized compare, and
    builds snippets only for the HITS (output-sized work, never a loop
    over the corpus). Output: (doc_id, pos, snippet) sorted — pos is
    the 1-based token position of the hit."""

    def snip(batch: pa.Table) -> pa.Table:
        # DuckDB trim() strips spaces only — match it exactly so a
        # tab/newline-edged doc tokenizes identically to the oracle
        # (ADVICE r03)
        trimmed = pc.utf8_trim(batch.column("text"), " ")
        mask = pc.not_equal(trimmed, "")
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False)[mask.to_numpy(zero_copy_only=False)]
        lists = pc.split_pattern_regex(pc.filter(trimmed, mask), r"\s+")
        lens = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(lists)
        hit = pc.equal(flat, term).to_numpy(zero_copy_only=False)
        if not hit.any():
            return pa.Table.from_pydict(
                {"doc_id": pa.array([], pa.int64()),
                 "pos": pa.array([], pa.int64()),
                 "snippet": pa.array([], pa.string())})
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        seg = np.repeat(np.arange(len(lens)), lens)
        gidx = np.nonzero(hit)[0]
        docs_of_hit = seg[gidx]
        local = gidx - starts[docs_of_hit]
        toks = flat.to_pandas().to_numpy(dtype=object)
        lo = np.maximum(local - window, 0) + starts[docs_of_hit]
        hi = np.minimum(local + window + 1,
                        lens[docs_of_hit]) + starts[docs_of_hit]
        # join per HIT (output-sized, bounded by term frequency)
        snippets = [" ".join(toks[a:b]) for a, b in zip(lo, hi)]
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids[docs_of_hit].astype(np.int64),
                               pa.int64()),
            "pos": pa.array(local + 1, pa.int64()),
            "snippet": pa.array(snippets, pa.string())})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        snip, batch_format="pyarrow").sort(["doc_id", "pos"])


def lang_vocab_overlap(sf_dir: str) -> rd.Dataset:
    """Cross-corpus vocabulary overlap: Jaccard similarity between the
    token vocabularies of every language pair — the corpus-composition
    audit for multilingual mixes (shared-script contamination shows up
    as unexpectedly high overlap). Plan: the distinct (lang, token)
    pairs reduce once partitioned on TOKEN, so each final combine holds
    every language of its tokens and expands language pairs locally
    (the co-purchase lowering on a different domain); per-lang vocab
    sizes fold from the same reduced table; the pair table is
    |langs|²-bounded. Output: (lang_a, lang_b, n_shared, jaccard) for
    pairs with non-empty intersection, sorted."""
    from ..stages.hashagg import _stable_partition, hash_groupby_agg

    docs = _docs(sf_dir, ["lang", "text"])

    def distinct_partial(batch: pa.Table) -> pa.Table:
        # DuckDB trim() strips spaces only — match it exactly so a
        # tab/newline-edged doc tokenizes identically to the oracle
        # (ADVICE r03)
        trimmed = pc.utf8_trim(batch.column("text"), " ")
        mask = pc.not_equal(trimmed, "")
        langs = batch.column("lang").to_numpy(
            zero_copy_only=False)[mask.to_numpy(zero_copy_only=False)]
        lists = pc.split_pattern_regex(pc.filter(trimmed, mask), r"\s+")
        lens = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({
            "lang": np.repeat(langs, lens),
            "token": pc.list_flatten(lists).to_pandas(),
        }).drop_duplicates()
        df["_tbucket"] = _stable_partition(df, ["token"], 32)
        return table_from_pandas(df, preserve_index=False)

    def dedup_and_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["lang", "token"]].drop_duplicates()
        sizes = g.groupby("lang", as_index=False).agg(
            n=("token", "size"))
        sizes["kind"] = "size"
        m = g.merge(g, on="token")
        m = m[m["lang_x"] < m["lang_y"]]
        inter = (m.groupby(["lang_x", "lang_y"], as_index=False)
                 .agg(n=("token", "size")))
        inter["kind"] = "inter"
        out = pd.concat([
            sizes.rename(columns={"lang": "lang_a"}).assign(lang_b=""),
            inter.rename(columns={"lang_x": "lang_a",
                                  "lang_y": "lang_b"})])
        return out[["kind", "lang_a", "lang_b", "n"]]

    partials = (docs.map_batches(distinct_partial, batch_format="pyarrow")
                .groupby("_tbucket")
                .map_groups(dedup_and_pairs, batch_format="pandas"))

    agg = hash_groupby_agg(partials, ["kind", "lang_a", "lang_b"],
                           {"n": ("n", "sum")}, num_parts=4).to_pandas()
    sizes = dict(zip(agg.loc[agg["kind"] == "size", "lang_a"],
                     agg.loc[agg["kind"] == "size", "n"].astype(int)))
    inter = agg[agg["kind"] == "inter"].copy()
    i = inter["n"].to_numpy(dtype=np.float64)
    sa = inter["lang_a"].map(sizes).to_numpy(dtype=np.float64)
    sb = inter["lang_b"].map(sizes).to_numpy(dtype=np.float64)
    out = pd.DataFrame({
        "lang_a": inter["lang_a"],
        "lang_b": inter["lang_b"],
        "n_shared": inter["n"].astype(np.int64),
        "jaccard": round_half_up(i / (sa + sb - i), 6),
    }).sort_values(["lang_a", "lang_b"]).reset_index(drop=True)
    return table_from_pandas(out, preserve_index=False)


def next_token_stats(sf_dir: str, min_count: int = 5) -> rd.Dataset:
    """Bigram language-model table: for every token, its most likely
    continuation and the conditional probability P(next | token) — the
    n-gram-LM building block (and a corpus-predictability audit).
    Tokens with fewer than ``min_count`` occurrences are dropped.
    Plan: bigram and unigram counts reduce through two-phase hash
    aggregates (the PMI machinery); the per-token argmax is the
    keep-best reduce ordered (count desc, continuation asc); the
    unigram denominator attaches by the vocab-dispatch broadcast.
    Output: (token, next_token, n, p_next) sorted by token."""
    import ray

    from ..stages.hashagg import hash_groupby_agg, hash_groupby_best

    docs = _docs(sf_dir, ["text"])

    def _flat(batch: pa.Table):
        # DuckDB trim() strips spaces only — match it exactly so a
        # tab/newline-edged doc tokenizes identically to the oracle
        # (ADVICE r03)
        trimmed = pc.utf8_trim(batch.column("text"), " ")
        mask = pc.not_equal(trimmed, "")
        lists = pc.split_pattern_regex(pc.filter(trimmed, mask), r"\s+")
        lens = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(lists).to_pandas().to_numpy(dtype=object)
        seg = np.repeat(np.arange(len(lens)), lens)
        return flat, seg

    def bigram_partial(batch: pa.Table) -> pa.Table:
        flat, seg = _flat(batch)
        if len(flat) < 2:
            return pa.Table.from_pydict(
                {"token": pa.array([], pa.string()),
                 "next_token": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())})
        same = seg[1:] == seg[:-1]
        df = pd.DataFrame({"token": flat[:-1][same],
                           "next_token": flat[1:][same]})
        g = df.groupby(["token", "next_token"], as_index=False).agg(
            n=("token", "size"))
        return table_from_pandas(g, preserve_index=False)

    bc = hash_groupby_agg(
        docs.map_batches(bigram_partial, batch_format="pyarrow"),
        ["token", "next_token"], {"n": ("n", "sum")}, num_parts=16)

    # denominator: count of positions where `token` has ANY successor
    # == sum of its bigram counts; reduce from the bigram table itself
    # (vocab-cardinality, no extra corpus pass)
    bc = bc.materialize()
    denom = hash_groupby_agg(bc, ["token"], {"tot": ("n", "sum")},
                             num_parts=8).to_pandas()
    dref = ray.put(dict(zip(denom["token"],
                            denom["tot"].astype(np.int64))))

    best = hash_groupby_best(bc, ["token"], ["n", "next_token"],
                             ascending=[False, True], num_parts=8)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        lut = ray.get(dref)
        tot = df["token"].map(lut).to_numpy(dtype=np.float64)
        n = df["n"].to_numpy(dtype=np.int64)
        keep = tot >= min_count
        return pd.DataFrame({
            "token": df["token"].to_numpy()[keep],
            "next_token": df["next_token"].to_numpy()[keep],
            "n": n[keep],
            "p_next": round_half_up(n[keep] / tot[keep], 6)})

    return (best.map_batches(final, batch_format="pandas")
            .sort("token"))


def doc_len_zscore_outliers(sf_dir: str, z_cut: float = 2.0) -> rd.Dataset:
    """Per-language standardization (the z-score length filter of a
    quality pipeline): docs whose length is >= ``z_cut`` sample
    standard deviations from their language's mean.

    Plan: per-batch moment partials (count, sum, sum of squares) per
    lang reduce to a tiny per-lang stats table — the mergeable-moments
    trick, no Welford state needed across workers — which is computed
    driver-side (|langs| rows) and broadcast back into a vectorized
    filter pass. Two narrow passes, no row-level shuffle. Output:
    (doc_id, lang, n_chars, z) sorted by doc_id."""
    import ray

    def moments(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["sq"] = df["n_chars"].astype(np.float64) ** 2
        g = df.groupby("lang", as_index=False).agg(
            n=("n_chars", "size"), s=("n_chars", "sum"), ss=("sq", "sum"))
        return table_from_pandas(g, preserve_index=False)

    stats = (_docs(sf_dir, ["lang", "n_chars"])
             .map_batches(moments, batch_format="pyarrow")
             .repartition(2).groupby("lang").aggregate(
                 Sum("n", alias_name="n"), Sum("s", alias_name="s"),
                 Sum("ss", alias_name="ss")).to_pandas())
    n = stats["n"].to_numpy(dtype=np.float64)
    mu = stats["s"].to_numpy(dtype=np.float64) / n
    # sample variance from raw moments: (ss - n*mu^2) / (n - 1)
    sd = np.sqrt((stats["ss"].to_numpy(dtype=np.float64) - n * mu * mu)
                 / np.maximum(n - 1.0, 1.0))
    lut_ref = ray.put({l: (m, s) for l, m, s in zip(stats["lang"], mu, sd)})

    def zfilter(batch: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        df = batch.to_pandas()
        m = df["lang"].map(lambda l: lut[l][0]).to_numpy()
        s = df["lang"].map(lambda l: lut[l][1]).to_numpy()
        # ADVICE r02: a degenerate group (all docs one length, or n==1)
        # has sd == 0 — SQL's stddev_samp yields NULL there and the row
        # drops; mask those groups out instead of dividing to inf/nan
        ok = s > 0.0
        z = np.zeros(len(df), dtype=np.float64)
        x = df["n_chars"].to_numpy(dtype=np.float64)
        z[ok] = (x[ok] - m[ok]) / s[ok]
        keep = ok & (np.abs(z) >= z_cut)
        out = df.loc[keep, ["doc_id", "lang", "n_chars"]].copy()
        out["z"] = round_half_up(z[keep], 4)
        return table_from_pandas(out, preserve_index=False)

    return (_docs(sf_dir, ["doc_id", "lang", "n_chars"])
            .map_batches(zfilter, batch_format="pyarrow").repartition(4).sort("doc_id"))


def dup_rate_by_source(sf_dir: str) -> rd.Dataset:
    """Per-source exact-duplicate audit (the 'which crawl/domain is
    dirty' question): docs, distinct texts, duplicate share per source.

    Plan: texts collapse to 64-bit content hashes in the scan (8-byte
    shuffle payload, same collision argument as exact_dedup), the
    two-phase hash aggregate reduces to one row per (source, hash),
    then per-batch partials count distincts and docs per source and a
    tiny final combine computes the rate. Output: (source, n_docs,
    n_unique, dup_pct)."""
    from ..functions.textstats import hash64_batch
    from ..stages.hashagg import hash_groupby_agg

    def add_hash(batch: pa.Table) -> pa.Table:
        h = hash64_batch(batch.column("text"))
        return pa.Table.from_pydict({
            "source": batch.column("source"),
            "h": pa.array(h.astype(np.int64), pa.int64()),
            "one": pa.array(np.ones(len(h), dtype=np.int64), pa.int64())})

    per_text = hash_groupby_agg(
        _docs(sf_dir, ["source", "text"]).map_batches(
            add_hash, batch_format="pyarrow"),
        ["source", "h"], {"n_docs": ("one", "sum")}, num_parts=16)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("source", as_index=False).agg(
            n_docs=("n_docs", "sum"), n_unique=("h", "size"))
        return table_from_pandas(g, preserve_index=False)

    agg = (per_text.map_batches(partial, batch_format="pyarrow")
           .repartition(2).groupby("source").aggregate(
               Sum("n_docs", alias_name="n_docs"),
               Sum("n_unique", alias_name="n_unique")))

    def final(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["n_docs"] = df["n_docs"].astype(np.int64)
        df["n_unique"] = df["n_unique"].astype(np.int64)
        df["dup_pct"] = round_half_up(
            100.0 * (df["n_docs"] - df["n_unique"]) / df["n_docs"], 4)
        return table_from_pandas(df, preserve_index=False)

    # ADVICE r02: the oracle ends with ORDER BY source — emit the same
    # contract instead of leaving row order to the groupby exchange
    return agg.map_batches(final, batch_format="pyarrow").sort("source")


def source_token_entropy(sf_dir: str) -> rd.Dataset:
    """Shannon entropy (bits) of each source's token distribution — the
    corpus-diversity signal a data-mixing pipeline uses to weight
    sources (low entropy = templated/boilerplate crawl).

    Plan: one explode pass folds per-batch (source, token) counts, the
    two-phase hash aggregate reduces to one row per distinct
    (source, token) — the only exchange, sized by vocabulary not by
    corpus — then per-batch partials fold Σc, Σ c·log2(c) and the
    distinct count per source so the final combine is |sources| rows.
    Entropy comes out as log2(N) - Σ c·log2(c) / N; the float partial
    is order-sensitive only below 1e-8 of the rounded digit because
    the division by N rescales the accumulated error. Output:
    (source, n_tokens, n_distinct, entropy_bits)."""
    from ..stages.hashagg import hash_groupby_agg

    def tok_counts(batch: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim(batch.column("text"), " ")
        keep = pc.not_equal(trimmed, "")
        src = pc.filter(batch.column("source"), keep)
        toks = pc.split_pattern_regex(pc.filter(trimmed, keep), r"\s+")
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "source": np.repeat(src.to_numpy(zero_copy_only=False), n),
            "token": pc.list_flatten(toks).to_pandas()})
        g = df.groupby(["source", "token"], as_index=False).size()
        return table_from_pandas(g.rename(columns={"size": "c"}),
                                    preserve_index=False)

    per_token = hash_groupby_agg(
        _docs(sf_dir, ["source", "text"]).map_batches(
            tok_counts, batch_format="pyarrow"),
        ["source", "token"], {"c": ("c", "sum")}, num_parts=16)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        c = df["c"].to_numpy(dtype=np.float64)
        df["clogc"] = c * np.log2(c)
        g = df.groupby("source", as_index=False).agg(
            n_tokens=("c", "sum"), n_distinct=("c", "size"),
            s=("clogc", "sum"))
        return table_from_pandas(g, preserve_index=False)

    agg = (per_token.map_batches(partial, batch_format="pyarrow")
           .repartition(2).groupby("source").aggregate(
               Sum("n_tokens", alias_name="n_tokens"),
               Sum("n_distinct", alias_name="n_distinct"),
               Sum("s", alias_name="s")))

    def final(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        n = df["n_tokens"].to_numpy(dtype=np.float64)
        df["entropy_bits"] = round_half_up(
            np.log2(n) - df["s"].to_numpy() / n, 6)
        df["n_tokens"] = df["n_tokens"].astype(np.int64)
        df["n_distinct"] = df["n_distinct"].astype(np.int64)
        return table_from_pandas(
            df[["source", "n_tokens", "n_distinct", "entropy_bits"]],
            preserve_index=False)

    return agg.map_batches(final, batch_format="pyarrow").sort("source")


def rrf_hybrid_search(sf_dir: str,
                      terms: tuple[str, ...] = ("spark", "hash", "window"),
                      k1: float = 1.2, b: float = 0.75,
                      k_list: int = 50, rrf_k: float = 60.0,
                      k: int = 20) -> rd.Dataset:
    """Hybrid retrieval via reciprocal-rank fusion (Cormack et al.,
    SIGIR'09): rank the corpus with TWO scorers — BM25 and plain
    tf·idf — take each scorer's top ``k_list``, and fuse with
    RRF(d) = Σ_lists 1 / (rrf_k + rank_list(d)). The standard recipe
    for combining lexical and secondary signals when slicing a corpus.

    Distributed plan: ONE stats fold (N, avgdl, per-term df — |terms|+2
    scalars) then ONE embarrassingly-parallel scoring pass computing
    both scores per block and keeping each block's top k_list per
    scorer — the exchange carries ≤ 2·k_list·blocks rows, never doc
    rows. Ranks are assigned on the coalesced candidate set: every
    global top-k_list doc is in its block's top-k_list, so survivor
    ranks equal global ranks. Ranking uses the ROUNDED (4dp) scores
    with doc_id tie-break so the order is reproducible across float
    summation orders. Output: (doc_id, rrf_score, r_bm25, r_tfidf)
    top-k by rrf desc; rank 0 = absent from that scorer's top list."""

    def _tok(batch: pa.Table):
        # DuckDB trim() strips spaces only — match it exactly so a
        # tab/newline-edged doc tokenizes identically to the oracle
        # (ADVICE r03)
        trimmed = pc.utf8_trim(batch.column("text"), " ")
        mask = pc.not_equal(trimmed, "")
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False)[mask.to_numpy(zero_copy_only=False)]
        lists = pc.split_pattern_regex(pc.filter(trimmed, mask), r"\s+")
        lens = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return ids, lens, pc.list_flatten(lists)

    def _tf_matrix(lens: np.ndarray, flat: pa.Array) -> np.ndarray:
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        out = np.zeros((len(lens), len(terms)), dtype=np.int64)
        for j, t in enumerate(terms):
            eq = pc.cast(pc.equal(flat, t), pa.int64()).to_numpy(
                zero_copy_only=False)
            if len(eq):
                sums = np.add.reduceat(eq, starts)
                sums[lens == 0] = 0
                out[:, j] = sums
        return out

    def stats_partial(batch: pa.Table) -> pa.Table:
        ids, lens, flat = _tok(batch)
        tfm = _tf_matrix(lens, flat)
        row = {"n": pa.array([len(ids)], pa.int64()),
               "total": pa.array([int(lens.sum())], pa.int64())}
        for j in range(len(terms)):
            row[f"df{j}"] = pa.array([int((tfm[:, j] > 0).sum())],
                                     pa.int64())
        return pa.Table.from_pydict(row)

    stats = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        stats_partial, batch_format="pyarrow").to_pandas()
    n_docs = float(stats["n"].sum())
    avgdl = float(stats["total"].sum()) / n_docs
    dfs = np.array([float(stats[f"df{j}"].sum())
                    for j in range(len(terms))])
    idf_bm = np.log((n_docs - dfs + 0.5) / (dfs + 0.5) + 1.0)
    idf_tf = np.where(dfs > 0, np.log(n_docs / np.maximum(dfs, 1.0)), 0.0)

    def score_partial(batch: pa.Table) -> pa.Table:
        ids, lens, flat = _tok(batch)
        tfm = _tf_matrix(lens, flat).astype(np.float64)
        norm = k1 * (1.0 - b + b * lens.astype(np.float64) / avgdl)
        s1 = np.zeros(len(ids))
        for j in range(len(terms)):  # fixed order == SQL's + chain
            s1 = s1 + idf_bm[j] * tfm[:, j] * (k1 + 1.0) \
                / (tfm[:, j] + norm)
        s2 = np.zeros(len(ids))
        for j in range(len(terms)):
            s2 = s2 + tfm[:, j] * idf_tf[j]
        df = pd.DataFrame({"doc_id": ids.astype(np.int64),
                           "s1": round_half_up(s1, 4),
                           "s2": round_half_up(s2, 4)})
        top1 = df.sort_values(["s1", "doc_id"],
                              ascending=[False, True]).head(k_list)
        top2 = df.sort_values(["s2", "doc_id"],
                              ascending=[False, True]).head(k_list)
        return table_from_pandas(
            pd.concat([top1, top2]).drop_duplicates("doc_id"),
            preserve_index=False)

    cands = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        score_partial, batch_format="pyarrow").repartition(1)

    def fuse(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates("doc_id")
        r1 = (df.sort_values(["s1", "doc_id"], ascending=[False, True])
              .head(k_list).reset_index(drop=True))
        r1["r_bm25"] = np.arange(1, len(r1) + 1, dtype=np.int64)
        r2 = (df.sort_values(["s2", "doc_id"], ascending=[False, True])
              .head(k_list).reset_index(drop=True))
        r2["r_tfidf"] = np.arange(1, len(r2) + 1, dtype=np.int64)
        f = r1[["doc_id", "r_bm25"]].merge(
            r2[["doc_id", "r_tfidf"]], on="doc_id", how="outer")
        f["r_bm25"] = f["r_bm25"].fillna(0).astype(np.int64)
        f["r_tfidf"] = f["r_tfidf"].fillna(0).astype(np.int64)
        rrf = (np.where(f["r_bm25"] > 0, 1.0 / (rrf_k + f["r_bm25"]), 0.0)
               + np.where(f["r_tfidf"] > 0,
                          1.0 / (rrf_k + f["r_tfidf"]), 0.0))
        f["rrf_score"] = round_half_up(rrf, 6)
        f = f.sort_values(["rrf_score", "doc_id"],
                          ascending=[False, True]).head(k)
        return f[["doc_id", "rrf_score", "r_bm25", "r_tfidf"]]

    return cands.map_batches(fuse, batch_format="pandas")


def source_topp_vocab(sf_dir: str, p: float = 0.9) -> rd.Dataset:
    """Per-source nucleus (top-p) vocabulary size: how many of its most
    frequent tokens cover ``p`` of each source's token mass, vs its full
    vocabulary — the tokenizer-budget / boilerplate signal (a templated
    crawl covers 90% of its mass with a handful of tokens).

    Plan: the vocab-sized (source, token) count reduce (shared shape
    with source_token_entropy), then ONE ordered scan per source via
    groupby(source).map_groups on the REDUCED table — group count =
    |sources|, group size = that source's vocabulary, both far below
    corpus size. Tie order (count desc, token asc) is pinned so the
    cumulative crossing is reproducible. Output: (source,
    n_tokens_topp, vocab_size)."""
    from ..stages.hashagg import hash_groupby_agg

    def tok_counts(batch: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim(batch.column("text"), " ")
        keep = pc.not_equal(trimmed, "")
        src = pc.filter(batch.column("source"), keep)
        toks = pc.split_pattern_regex(pc.filter(trimmed, keep), r"\s+")
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "source": np.repeat(src.to_numpy(zero_copy_only=False), n),
            "token": pc.list_flatten(toks).to_pandas()})
        g = df.groupby(["source", "token"], as_index=False).size()
        return table_from_pandas(g.rename(columns={"size": "c"}),
                                    preserve_index=False)

    per_token = hash_groupby_agg(
        _docs(sf_dir, ["source", "text"]).map_batches(
            tok_counts, batch_format="pyarrow"),
        ["source", "token"], {"c": ("c", "sum")}, num_parts=16)

    def per_source(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["c", "token"], ascending=[False, True])
        c = g["c"].to_numpy(dtype=np.int64)
        cum = np.cumsum(c)
        thr = p * float(c.sum())
        k = int(np.searchsorted(cum, thr) + 1)  # first cum >= p*tot
        return pd.DataFrame({
            "source": [g["source"].iloc[0]],
            "n_tokens_topp": np.array([k], dtype=np.int64),
            "vocab_size": np.array([len(g)], dtype=np.int64)})

    return (per_token.groupby("source")
            .map_groups(per_source, batch_format="pandas")
            .sort("source"))


#: Embedded scoring lexicon — the broadcast-small-model shape: a linear
#: text classifier (fastText-style bag-of-words with per-term weights)
#: reduced to a deterministic term->weight table so the oracle can
#: express it as VALUES + LEFT JOIN. A real model swaps the table for
#: learned weights; the Ray plumbing (per-batch flatten + weight
#: lookup + segment reduce) is identical.
SCORING_LEXICON = (
    ("fast", 3), ("big", 2), ("merge", 1),
    ("slow", -3), ("dup", -2), ("error", -1),
)


def lexicon_score(sf_dir: str) -> rd.Dataset:
    """Per-doc linear lexicon score: sum of per-token weights from
    SCORING_LEXICON divided by the doc's whitespace token count,
    rounded to 4 decimals — the linear-classifier scoring stage of a
    quality-filter pipeline, run as a shuffle-free map.

    Vectorized batch path: Arrow split_pattern_regex + list_flatten
    (no Python per-row loop), token->weight lookup via a single
    searchsorted probe against the 64-bit-hashed lexicon terms (the
    same hashed-broadcast-lookup pattern a 100k-term learned lexicon
    would use; the table ships once in the task closure), and a
    bincount segment reduce back to docs. Empty docs are excluded (no
    tokens -> no score), mirroring the oracle's trim(text) <> ''
    gate. Output: (doc_id, lex_score) sorted by doc_id."""
    terms = np.array([t for t, _ in SCORING_LEXICON])
    th = hash64_batch(pa.array(terms))
    order = np.argsort(th)
    lex_hashes = th[order]
    lex_weights = np.array(
        [w for _, w in SCORING_LEXICON], dtype=np.float64)[order]

    def score(batch: pa.Table) -> pa.Table:
        text = pc.utf8_trim(batch.column("text"), " ")
        nonempty = pc.not_equal(text, "")
        batch = batch.filter(nonempty)
        text = text.filter(nonempty)
        if not len(batch):
            return pa.Table.from_pydict(
                {"doc_id": pa.array([], pa.int64()),
                 "lex_score": pa.array([], pa.float64())})
        toks = pc.split_pattern_regex(text, r"\s+")
        n = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        h = hash64_batch(flat)
        pos = np.searchsorted(lex_hashes, h)
        pos[pos >= len(lex_hashes)] = 0
        w = np.where(lex_hashes[pos] == h, lex_weights[pos], 0.0)
        docidx = np.repeat(np.arange(len(batch)), n)
        sums = np.bincount(docidx, weights=w, minlength=len(batch))
        return pa.Table.from_pydict(
            {"doc_id": batch.column("doc_id"),
             "lex_score": pa.array(
                 np.asarray(round_half_up(sums / n, 4)), pa.float64())})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow").repartition(4).sort("doc_id")


QUALITY_CLF_FEATURES = ("log_word_count", "mean_word_len", "symbol_ratio",
                        "alpha_frac", "stop_frac")


def _quality_clf_xy(text_col) -> tuple[np.ndarray, np.ndarray]:
    """Bounded feature matrix + teacher label for the quality
    classifier, per batch. Features are pure per-row functions of the
    text (block-split invariant); the teacher is the cheap rule pair
    (word_count >= 50 AND stop_hits >= 1) — the distillation target."""
    f = gopher_rules_batch(text_col)
    X = np.stack([
        np.log1p(f["word_count"]) / 10.0,
        f["mean_word_len"] / 10.0,
        f["symbol_ratio"],
        f["alpha_frac"],
        np.minimum(f["stop_hits"], 10) / 10.0,
    ], axis=1)
    y = ((f["word_count"] >= 50) & (f["stop_hits"] >= 1)
         ).astype(np.float64)
    return X, y


def train_quality_classifier(sf_dir: str, iters: int = 40, lr: float = 4.0,
                             local_threshold: int = 500_000) -> rd.Dataset:
    """Distributed training of a linear quality classifier — the
    CCNet/DCLM pattern of distilling a quality teacher into a cheap
    linear scorer that then gates the 100-TB corpus with one dot
    product per doc (Wenzek et al. arXiv:1911.00359 §4.3 train a
    fastText classifier the same way; the reference's trainable stage
    is the CNN loop of backend train script — this is its
    tabular-engine analog). Teacher label: the deterministic rule pair
    (word_count >= 50 AND stop_hits >= 1); features: the five bounded
    Gopher signals.

    Full-batch gradient descent with per-block int64 fixed-point
    gradient partials (``functions/linear.py``): quantizing each row's
    contribution BEFORE the fold makes every iteration's global
    gradient bit-identical under any block split or parallelism level
    — float-sum nondeterminism, the classic distributed-training
    reproducibility hole, is designed out rather than tolerated.

    Plan: one featurize pass reduces the corpus to a (d+1)-column
    numeric table, materialized once (REDUCED — ~48 B/doc; the
    multi-consumer-intermediate rule). Each iteration is one
    O(blocks)-row partial-gradient fold; the update runs driver-side
    on the tiny integer sum. Size dispatch: below ``local_threshold``
    rows the feature table pulls to the driver once and the SAME
    quantized loop runs locally — both plans emit bit-identical
    weights (tested), so the dispatch is purely a latency choice.

    Output: (feature, value) rows — the centered-feature means
    ``mu_*``, learned weights, bias, and final train accuracy.
    """
    from ..functions.linear import (
        GRAD_SCALE,
        linear_z,
        logreg_fit_quantized,
        quantized_colsums,
        quantized_logreg_grad,
    )

    def featurize(batch: pa.Table) -> pa.Table:
        X, y = _quality_clf_xy(batch.column("text"))
        cols = {f"x{j}": pa.array(X[:, j], pa.float64())
                for j in range(X.shape[1])}
        cols["y"] = pa.array(y, pa.float64())
        return pa.Table.from_pydict(cols)

    feats = _docs(sf_dir, ["text"]).map_batches(
        featurize, batch_format="pyarrow").materialize()
    n = feats.count()
    d = len(QUALITY_CLF_FEATURES)

    def _xy(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        X = np.stack([t.column(f"x{j}").to_numpy(zero_copy_only=False)
                      for j in range(d)], axis=1)
        return X, t.column("y").to_numpy(zero_copy_only=False)

    if n <= local_threshold:
        df = feats.to_pandas()
        X = np.stack([df[f"x{j}"].to_numpy(dtype=np.float64)
                      for j in range(d)], axis=1)
        y = df["y"].to_numpy(dtype=np.float64)
        mu, w = logreg_fit_quantized(X, y, iters, lr)
        z = linear_z(X - mu, w)
        acc = float(((z > 0) == (y > 0.5)).sum()) / n
    else:
        def fold(fn) -> np.ndarray:
            def partial(t: pa.Table) -> pa.Table:
                q = fn(*_xy(t))
                return pa.Table.from_pydict(
                    {f"q{j}": pa.array([int(q[j])], pa.int64())
                     for j in range(len(q))})
            parts = feats.map_batches(
                partial, batch_format="pyarrow").take_all()
            keys = sorted(parts[0].keys())
            return np.array([sum(int(p[k]) for p in parts)
                             for k in keys], dtype=np.int64)

        mu = fold(lambda X, y: quantized_colsums(X)) / (
            float(GRAD_SCALE) * n)
        w = np.zeros(d + 1, dtype=np.float64)
        for _ in range(iters):
            g = fold(lambda X, y, _w=w.copy():
                     quantized_logreg_grad(X - mu, y, _w))
            w = w - lr * (g / (float(GRAD_SCALE) * n))
        correct = fold(lambda X, y, _w=w.copy(): np.array(
            [((linear_z(X - mu, _w) > 0) == (y > 0.5)).sum()],
            dtype=np.int64))
        acc = float(correct[0]) / n

    names = ([f"mu_{f}" for f in QUALITY_CLF_FEATURES]
             + [f"w_{f}" for f in QUALITY_CLF_FEATURES]
             + ["bias", "train_acc"])
    vals = np.concatenate([mu, w, [acc]])
    return rd.from_arrow(pa.Table.from_pydict({
        "feature": pa.array(names, pa.string()),
        "value": pa.array(round_half_up(vals, 6), pa.float64())}))


def source_kl_divergence(sf_dir: str, token_buckets: int = 64
                         ) -> rd.Dataset:
    """KL divergence (nats) of each source's unigram token distribution
    from the corpus-wide distribution — the drift/skew audit a data
    mixture runs per ingest source (a templated or off-domain crawl
    shows up as a high-KL outlier; the CCNet/DSIR family uses the same
    quantity to weight domains).

    KL(P_s || P_c) factors into mergeable pieces:
    (Σ c·ln c − Σ c·ln C_t)/N_s − ln N_s + ln N, where c is the
    (source, token) count, C_t the corpus count of the token, N_s and
    N the source/corpus totals. Plan: the (source, token) table
    reduces ONCE (vocabulary-sized two-phase hash aggregate — the
    only corpus-scale exchange, shared shape with
    :func:`source_token_entropy`); a token-bucketed exchange of that
    REDUCED table co-locates every source's count of a token, so C_t
    is a local per-bucket groupby and no join materializes; per-source
    partials then fold to |sources| rows. Output:
    (source, n_tokens, kl_nats) sorted by source."""
    from ..stages.hashagg import _stable_partition, hash_groupby_agg

    def tok_counts(batch: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim(batch.column("text"), " ")
        keep = pc.not_equal(trimmed, "")
        src = pc.filter(batch.column("source"), keep)
        toks = pc.split_pattern_regex(pc.filter(trimmed, keep), r"\s+")
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "source": np.repeat(src.to_numpy(zero_copy_only=False), n),
            "token": pc.list_flatten(toks).to_pandas()})
        g = df.groupby(["source", "token"], as_index=False).size()
        return table_from_pandas(g.rename(columns={"size": "c"}),
                                 preserve_index=False)

    per_token = hash_groupby_agg(
        _docs(sf_dir, ["source", "text"]).map_batches(
            tok_counts, batch_format="pyarrow"),
        ["source", "token"], {"c": ("c", "sum")}, num_parts=16)

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_tbucket"] = _stable_partition(df, ["token"], token_buckets)
        return df

    def bucket_partials(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({
                "source": pd.Series(dtype=object),
                "n_s": pd.Series(dtype=np.int64),
                "s1": pd.Series(dtype=np.float64),
                "s2": pd.Series(dtype=np.float64)})
        c = g["c"].to_numpy(dtype=np.float64)
        # corpus count of each token: all of a token's rows share a
        # bucket, so this per-bucket groupby IS the global C_t
        ct = g.groupby("token")["c"].transform("sum").to_numpy(
            dtype=np.float64)
        out = pd.DataFrame({
            "source": g["source"].to_numpy(),
            "n_s": g["c"].to_numpy(dtype=np.int64),
            "s1": c * np.log(c),
            "s2": c * np.log(ct)})
        return out.groupby("source", as_index=False).agg(
            n_s=("n_s", "sum"), s1=("s1", "sum"), s2=("s2", "sum"))

    parts = (per_token.map_batches(bucket, batch_format="pandas")
             .groupby("_tbucket").map_groups(
                 bucket_partials, batch_format="pandas")
             .repartition(2).groupby("source").aggregate(
                 Sum("n_s", alias_name="n_s"),
                 Sum("s1", alias_name="s1"),
                 Sum("s2", alias_name="s2")))

    def final(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        ns = df["n_s"].to_numpy(dtype=np.float64)
        n = float(ns.sum())     # one batch holds all |sources| rows
        kl = (df["s1"].to_numpy() - df["s2"].to_numpy()) / ns \
            - np.log(ns) + np.log(n)
        return table_from_pandas(pd.DataFrame({
            "source": df["source"],
            "n_tokens": df["n_s"].astype(np.int64),
            "kl_nats": round_half_up(kl, 6)}), preserve_index=False)

    return parts.repartition(1).map_batches(
        final, batch_format="pyarrow").sort("source")


def source_gram_coverage(sf_dir: str, k: int = 3) -> rd.Dataset:
    """Greedy source coverage curve — for the fixed lexicographic
    source order, how many NOVEL k-grams each source contributes (its
    grams not present in any earlier source) and the cumulative
    coverage fraction. The data-valuation signal behind greedy corpus
    selection (each source's marginal utility under a submodular
    coverage objective).

    Plan: each block emits its DISTINCT (gram-hash, source) pairs via
    the vectorized rolling-hash shingle kernel (shared with
    :func:`dedup.substring_dups`, same 64-bit gram-identity caveat);
    ONE gram-partitioned exchange lexsorts each partition so the
    min-source per gram run and the per-source novel counts fall out
    of one pass; a |sources|-row combine then computes the running
    coverage on a single final block. Output:
    (source, n_new_grams, cum_coverage) sorted by source."""
    from ..functions.textstats import string_bytes, window_hashes_flat
    from ..sources.storage import parquet_data_bytes, scaled_parts
    from ..stages.hashagg import hash_groupby_agg

    path = f"{sf_dir}/documents.parquet"
    NPART = scaled_parts(parquet_data_bytes(path), 8 << 20)

    def gram_pairs(batch: pa.Table) -> pa.Table:
        src = batch.column("source").to_numpy(zero_copy_only=False)
        data, offsets = string_bytes(batch.column("text"))
        seg, h = window_hashes_flat(data, offsets, k)
        if len(h) == 0:
            return pa.Table.from_pydict(
                {"g": pa.array([], pa.int64()),
                 "source": pa.array([], pa.string()),
                 "gpart": pa.array([], pa.int64())})
        order = np.lexsort((h, seg))
        seg, h = seg[order], h[order]
        first = np.ones(len(seg), dtype=bool)
        first[1:] = (seg[1:] != seg[:-1]) | (h[1:] != h[:-1])
        seg, h = seg[first], h[first]
        return pa.Table.from_pydict({
            "g": pa.array(h.view(np.int64), pa.int64()),
            "source": pa.array(src[seg], pa.string()),
            "gpart": pa.array((h % np.uint64(NPART)).astype(np.int64),
                              pa.int64())})

    pairs = read_table(path, columns=["source", "text"],
                       num_blocks=rows_to_blocks(path)).map_batches(
        gram_pairs, batch_format="pyarrow")

    def min_source_counts(part: pd.DataFrame) -> pd.DataFrame:
        if not len(part):
            return pd.DataFrame({"source": pd.Series(dtype=object),
                                 "n_new": pd.Series(dtype=np.int64)})
        part = part.sort_values(["g", "source"], kind="mergesort")
        winner = ~part["g"].duplicated().to_numpy()
        return (part.loc[winner].groupby("source", as_index=False)
                .size().rename(columns={"size": "n_new"}))

    per_src = hash_groupby_agg(
        pairs.groupby("gpart").map_groups(
            min_source_counts, batch_format="pandas"),
        ["source"], {"n_new": ("n_new", "sum")}, num_parts=4)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("source", kind="mergesort")
        n = df["n_new"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "source": df["source"].to_numpy(),
            "n_new_grams": n,
            "cum_coverage": round_half_up(
                np.cumsum(n) / float(n.sum()), 6)})

    return per_src.repartition(1).map_batches(
        final, batch_format="pandas").sort("source")


class RerankStage:
    """Actor-pool second-stage ranker — the cross-encoder seam of a
    retrieve->rerank pipeline. The sandbox has no torch, so the scorer
    is a deterministic stand-in (query-term frequency + adjacent
    query-term phrase bonus + a retrieval-score prior); a real model
    drops into ``__init__`` (load once per actor) / ``__call__``
    (batched inference) unchanged — the same seam contract as
    stages/classify.GlyphClassifierStage."""

    def __init__(self, terms: tuple, bm25_by_doc: dict) -> None:
        self.terms = np.asarray(terms)
        self.bm25 = bm25_by_doc

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        trimmed = pc.utf8_trim(batch.column("text"), " ")
        lists = pc.split_pattern_regex(trimmed, r"\s+")
        lens = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(lists).to_numpy(zero_copy_only=False)
        n = len(ids)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        if len(flat):
            member = np.isin(flat, self.terms)
            tf = np.add.reduceat(member.astype(np.int64), starts)
            # adjacency bonus: consecutive tokens both query terms and
            # inside the same doc. Pad the pair array to |flat| slots,
            # then zero every doc's LAST slot (the pair there crosses
            # into the next doc; the final doc's is the pad itself).
            pairs = np.append(member[:-1] & member[1:], False)
            ends = starts + lens - 1
            pairs[ends[lens > 0]] = False
            adj = np.add.reduceat(pairs.astype(np.int64), starts)
            tf[lens == 0] = 0
            adj[lens == 0] = 0
        else:
            tf = adj = np.zeros(n, dtype=np.int64)
        prior = pd.Series(ids).map(self.bm25).fillna(0.0).to_numpy()
        score = tf + 2.0 * adj + 0.1 * prior
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids, pa.int64()),
            "bm25": pa.array(round_half_up(prior, 4), pa.float64()),
            "rerank_score": pa.array(round_half_up(score, 4),
                                     pa.float64())})


def rerank_search(sf_dir: str, terms: tuple = ("spark", "hash", "window"),
                  k_retrieve: int = 50, k: int = 10,
                  concurrency=(1, 4)) -> rd.Dataset:
    """Two-stage retrieval: BM25 recall (top ``k_retrieve``) followed
    by an actor-pool reranker over the candidates — the standard
    retrieve->rerank composition of an LLM-data search stack. The
    candidate set is k_retrieve rows BY CONSTRUCTION, so attaching
    text is a broadcast semi-join (candidate-id set ships in the task
    closure; one corpus scan filters) and the rerank pool sees a
    bounded input regardless of corpus size. Output:
    (doc_id, bm25, rerank_score) top-k by rerank_score desc, doc_id
    asc ties."""
    cand = bm25_search(sf_dir, terms=terms, k=k_retrieve).to_pandas()
    bm25_by_doc = dict(zip(cand["doc_id"].astype(np.int64),
                           cand["score"].astype(float)))
    id_set = np.sort(cand["doc_id"].to_numpy(dtype=np.int64))

    def only_candidates(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(np.isin(ids, id_set)))

    scored = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        only_candidates, batch_format="pyarrow"
    ).map_batches(
        RerankStage, batch_format="pyarrow", concurrency=concurrency,
        fn_constructor_kwargs={"terms": terms,
                               "bm25_by_doc": bm25_by_doc})

    def top(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["rerank_score", "doc_id"],
                            ascending=[False, True], kind="mergesort")
        return df.head(k)

    return scored.repartition(1).map_batches(
        top, batch_format="pandas")


def filter_attrition_report(sf_dir: str, min_chars: int = 200,
                            word_lo: int = 30, word_hi: int = 10_000,
                            ttr_min: float = 0.35, k: int = 48,
                            dup_max: float = 0.8) -> pd.DataFrame:
    """Sequential quality-funnel attrition report: how many docs each
    cleaning rule removes, applied in pipeline order — the per-stage
    removal table every corpus release publishes (cf. RefinedWeb
    arXiv:2306.01116 Table 2 / FineWeb's ablation funnel). Rules:

    1. ``min_chars``        — length(text) >= min_chars;
    2. ``word_bounds``      — token count in [word_lo, word_hi];
    3. ``type_token_ratio`` — distinct/total tokens >= ttr_min
       (the Gopher-family repetition proxy);
    4. ``dup_windows``      — share of the doc's distinct k-byte
       windows duplicated within the SURVIVOR set < dup_max (dedup
       runs after filtering, so duplication is measured against what
       the earlier rules kept — matching a real pipeline's ordering).

    Scale plan: rules 1-3 are one stateless pass folding to per-batch
    1-row count partials (O(blocks) driver state). Rule 4 reuses the
    :func:`...dedup.dup_window_fraction` plan restricted to survivors:
    gram-partitioned exchange, O(docs) per-doc partials, narrow hash
    aggregate, then a final 1-row count fold. The combined report is
    four rows assembled from two scalar aggregates — never a
    corpus-sized driver materialization.

    Output: (rule_idx, rule, n_in, n_removed, n_out) ordered by stage.
    """
    from ..functions.textstats import (hash64_batch, string_bytes,
                                       window_hashes_flat)
    from ..sources.storage import parquet_data_bytes, scaled_parts
    from ..stages.hashagg import hash_groupby_agg

    path = f"{sf_dir}/documents.parquet"
    NPART = scaled_parts(parquet_data_bytes(path), 8 << 20)

    def flags(batch: pa.Table):
        txt = batch.column("text")
        nch = pc.utf8_length(txt).to_numpy(
            zero_copy_only=False).astype(np.int64)
        toks = pc.split_pattern(txt, " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = toks.offsets.to_numpy().astype(np.int64)
        ntok = np.diff(offs)
        h = hash64_batch(toks.values)
        seg = np.repeat(np.arange(len(ntok)), ntok)
        order = np.lexsort((h, seg))
        s2, h2 = seg[order], h[order]
        first = np.ones(len(s2), dtype=bool)
        first[1:] = (s2[1:] != s2[:-1]) | (h2[1:] != h2[:-1])
        ndis = np.bincount(s2[first], minlength=len(ntok))
        p1 = nch >= min_chars
        p2 = (ntok >= word_lo) & (ntok <= word_hi)
        p3 = ndis / ntok >= ttr_min
        return p1, p2, p3

    def count_partial(batch: pa.Table) -> pa.Table:
        p1, p2, p3 = flags(batch)
        return pa.Table.from_pydict({
            "n0": pa.array([batch.num_rows], pa.int64()),
            "n1": pa.array([int(p1.sum())], pa.int64()),
            "n2": pa.array([int((p1 & p2).sum())], pa.int64()),
            "n3": pa.array([int((p1 & p2 & p3).sum())], pa.int64())})

    docs = read_table(path, columns=["doc_id", "text"],
                      num_blocks=rows_to_blocks(path))
    counts = docs.map_batches(
        count_partial, batch_format="pyarrow").to_pandas().sum()
    n0, n1, n2, n3 = (int(counts[c]) for c in ("n0", "n1", "n2", "n3"))

    def survivor_grams(batch: pa.Table) -> pa.Table:
        p1, p2, p3 = flags(batch)
        batch = batch.filter(pa.array(p1 & p2 & p3))
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        data, offsets = string_bytes(batch.column("text"))
        seg, h = window_hashes_flat(data, offsets, k)
        if len(h) == 0:
            return pa.Table.from_pydict(
                {"g": pa.array([], pa.int64()),
                 "doc_id": pa.array([], pa.int64()),
                 "gpart": pa.array([], pa.int64())})
        order = np.lexsort((h, seg))
        seg, h = seg[order], h[order]
        first = np.ones(len(seg), dtype=bool)
        first[1:] = (seg[1:] != seg[:-1]) | (h[1:] != h[:-1])
        seg, h = seg[first], h[first]
        return pa.Table.from_pydict({
            "g": pa.array(h.view(np.int64), pa.int64()),
            "doc_id": pa.array(ids[seg], pa.int64()),
            "gpart": pa.array((h % NPART).astype(np.int64), pa.int64())})

    def count_dups(part: pd.DataFrame) -> pd.DataFrame:
        if not len(part):
            return pd.DataFrame({
                "doc_id": pd.Series(dtype=np.int64),
                "n_grams": pd.Series(dtype=np.int64),
                "n_dup_grams": pd.Series(dtype=np.int64)})
        g = part["g"].to_numpy(dtype=np.int64)
        ids = part["doc_id"].to_numpy(dtype=np.int64)
        order = np.lexsort((ids, g))
        g, ids = g[order], ids[order]
        run = np.ones(len(g), dtype=bool)
        run[1:] = g[1:] != g[:-1]
        gid = np.cumsum(run) - 1
        runlen = np.bincount(gid)
        dup = (runlen > 1)[gid]
        uid, inv = np.unique(ids, return_inverse=True)
        n = np.bincount(inv)
        ndup = np.bincount(inv, weights=dup).astype(np.int64)
        return pd.DataFrame({"doc_id": uid, "n_grams": n.astype(np.int64),
                             "n_dup_grams": ndup})

    docs_b = read_table(path, columns=["doc_id", "text"],
                        num_blocks=rows_to_blocks(path))
    pairs = docs_b.map_batches(survivor_grams, batch_format="pyarrow")
    partials = pairs.groupby("gpart").map_groups(
        count_dups, batch_format="pandas")
    totals = hash_groupby_agg(
        partials, ["doc_id"],
        {"n_grams": ("n_grams", "sum"), "n_dup_grams": ("n_dup_grams", "sum")},
        num_parts=8)

    def dup_partial(df: pd.DataFrame) -> pd.DataFrame:
        frac = df["n_dup_grams"].to_numpy() / df["n_grams"].to_numpy()
        return pd.DataFrame({"rem": [int((frac >= dup_max).sum())]})

    rem4 = int(totals.map_batches(
        dup_partial, batch_format="pandas").to_pandas()["rem"].sum())

    return pd.DataFrame({
        "rule_idx": pd.array([1, 2, 3, 4], dtype="int64"),
        "rule": ["min_chars", "word_bounds", "type_token_ratio",
                 "dup_windows"],
        "n_in": pd.array([n0, n1, n2, n3], dtype="int64"),
        "n_removed": pd.array(
            [n0 - n1, n1 - n2, n2 - n3, rem4], dtype="int64"),
        "n_out": pd.array([n1, n2, n3, n3 - rem4], dtype="int64")})


def lang_source_mi(sf_dir: str) -> rd.Dataset:
    """Mutual information (bits) between the lang and source columns —
    the dataset-audit signal for "does provenance determine language"
    (high MI = sources are language-siloed; a mixing pipeline wants to
    know before stratifying). Generalizes the reference's per-class
    count reports (evaluate_new_testdata.py:120-134) to a two-variable
    dependence measure.

    Plan: ONE narrow pass folds per-batch (lang, source) contingency
    partials (cells bounded by |langs|x|sources|, never by rows), a
    tiny combine, then the closed-form finish H(L) + H(S) - H(L,S)
    with every entropy computed as log2(N) - sum(n*log2(n))/N on exact
    integer counts. Output: one row (n_docs, h_lang_bits,
    h_source_bits, mi_bits)."""
    ds = _docs(sf_dir, ["lang", "source"])

    def cells(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(["lang", "source"], as_index=False).size()
        return table_from_pandas(g.rename(columns={"size": "n"}))

    agg = ds.map_batches(cells, batch_format="pyarrow").repartition(1)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lang", "source"], as_index=False)["n"].sum()
        n = g["n"].to_numpy(dtype=np.float64)
        tot = n.sum()

        def ent(counts: np.ndarray) -> float:
            return float(np.log2(tot)
                         - (counts * np.log2(counts)).sum() / tot)

        hl = ent(g.groupby("lang")["n"].sum().to_numpy(
            dtype=np.float64))
        hs = ent(g.groupby("source")["n"].sum().to_numpy(
            dtype=np.float64))
        hls = ent(n)
        return pd.DataFrame({
            "n_docs": [np.int64(tot)],
            "h_lang_bits": round_half_up(np.array([hl]), 4),
            "h_source_bits": round_half_up(np.array([hs]), 4),
            "mi_bits": round_half_up(np.array([hl + hs - hls]), 4),
        })

    return agg.map_batches(finish, batch_format="pandas")


def oov_rate_per_doc(sf_dir: str, top_n: int = 20) -> rd.Dataset:
    """Out-of-vocabulary token rate per document against the corpus
    top-``top_n`` vocabulary — the tokenizer-coverage / noisy-doc
    signal (a doc whose tokens mostly fall outside the head vocabulary
    is boilerplate, code, or the wrong language; CCNet and Gopher both
    gate on vocabulary-coverage cousins of this).

    Plan: pass 1 reduces token counts through the two-phase hash
    aggregate (vocab-sized exchange), per-block partial top-n + one
    tiny final top-n pins the vocabulary (ties broken by token asc —
    fully deterministic); the vocab set (top_n strings) broadcasts
    driver-side, and pass 2 scores every doc with a vectorized
    isin + segment reduce — no second shuffle. Output: (doc_id,
    n_tokens, n_oov, oov_rate) for non-empty docs, sorted doc_id."""
    from ..stages.hashagg import hash_groupby_agg

    def tok_counts(batch: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim(batch.column("text"), " ")
        keep = pc.not_equal(trimmed, "")
        toks = pc.split_pattern_regex(pc.filter(trimmed, keep), r"\s+")
        flat = pc.list_flatten(toks)
        df = pd.DataFrame({"token": flat.to_pandas()})
        g = df.groupby("token", as_index=False).size()
        return table_from_pandas(g.rename(columns={"size": "c"}))

    counts = hash_groupby_agg(
        _docs(sf_dir, ["text"]).map_batches(
            tok_counts, batch_format="pyarrow"),
        ["token"], {"c": ("c", "sum")}, num_parts=8)

    def top_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["c", "token"],
                              ascending=[False, True]).head(top_n)

    vocab_df = (counts.map_batches(top_partial, batch_format="pandas")
                .repartition(1)
                .map_batches(top_partial, batch_format="pandas")
                .to_pandas())
    vocab = set(vocab_df["token"].tolist())

    def score(batch: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim(batch.column("text"), " ")
        keep = pc.not_equal(trimmed, "")
        did = pc.filter(batch.column("doc_id"), keep).to_numpy(
            zero_copy_only=False)
        toks = pc.split_pattern_regex(pc.filter(trimmed, keep), r"\s+")
        n = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        inv = pd.Series(pc.list_flatten(toks).to_pandas()).isin(
            vocab).to_numpy()
        seg = np.zeros(len(n) + 1, dtype=np.int64)
        np.cumsum(n, out=seg[1:])
        oov = np.add.reduceat(
            (~inv).astype(np.int64), seg[:-1]) if len(n) else \
            np.zeros(0, dtype=np.int64)
        oov = np.where(n == 0, 0, oov)
        return table_from_pandas(pd.DataFrame({
            "doc_id": did.astype(np.int64),
            "n_tokens": n,
            "n_oov": oov.astype(np.int64),
            "oov_rate": round_half_up(oov / n, 4),
        }))

    return (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(score, batch_format="pyarrow")
            .repartition(4).sort("doc_id"))


def cms_token_counts(sf_dir: str, depth: int = 4, width: int = 1024,
                     top: int = 10) -> rd.Dataset:
    """Count-Min-sketch token-frequency audit: build one mergeable CMS
    over the whole token stream (one (depth x width) int64 matrix per
    block, elementwise-SUM merged — the shuffle carries sketches,
    never tokens) and report the sketch estimate next to the exact
    count for the corpus's top-``top`` tokens. The CMS guarantee
    (est >= exact; overcount <= e/width * N w.h.p.) is asserted in
    pytest; approximate by construction, so rows-only for the driver
    gate.

    Plan: ONE narrow pass folds both the per-block sketch AND the
    per-block token counts; the vocab-sized exact reduce picks the
    deterministic top-``top`` (count desc, token asc); sketches
    repartition(1)-sum and the probe is a vectorized min-over-rows
    lookup. Output: (token, exact_c, cms_est)."""
    from ..functions.sketch import cms_add_hashes, cms_create, \
        cms_estimate_hashes
    from ..stages.hashagg import hash_groupby_agg

    def tok_counts(batch: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim(batch.column("text"), " ")
        keep = pc.not_equal(trimmed, "")
        toks = pc.split_pattern_regex(pc.filter(trimmed, keep), r"\s+")
        flat = pc.list_flatten(toks)
        df = pd.DataFrame({"token": flat.to_pandas()})
        g = df.groupby("token", as_index=False).size()
        return table_from_pandas(g.rename(columns={"size": "c"}))

    counts = hash_groupby_agg(
        _docs(sf_dir, ["text"]).map_batches(
            tok_counts, batch_format="pyarrow"),
        ["token"], {"c": ("c", "sum")}, num_parts=8).materialize()

    def sketch_block(batch: pa.Table) -> pa.Table:
        # blocks here are already (token, count) partials, so the CMS
        # folds weighted hashes — identical to adding the raw stream
        sk = cms_create(depth, width)
        h = hash64_batch(batch.column("token"))
        cms_add_hashes(sk, h, batch.column("c").to_numpy(
            zero_copy_only=False).astype(np.int64))
        return pa.Table.from_pydict(
            {"sk": pa.array([sk.tobytes()], pa.binary())})

    sketches = counts.map_batches(sketch_block, batch_format="pyarrow")

    # deterministic probe set: driver-side top-N on the REDUCED table
    # (vocab-sized; built eagerly once, closed over by the finish)
    t = (counts.map_batches(
        lambda df: df.sort_values(["c", "token"],
                                  ascending=[False, True]).head(top),
        batch_format="pandas")
        .repartition(1)
        .map_batches(
        lambda df: df.sort_values(["c", "token"],
                                  ascending=[False, True]).head(top),
        batch_format="pandas")
        .to_pandas())

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        merged = cms_create(depth, width)
        for b in df["sk"]:
            merged += np.frombuffer(b, dtype=np.int64).reshape(
                depth, width)
        h = hash64_batch(pa.array(t["token"].tolist(), pa.string()))
        est = cms_estimate_hashes(merged, h)
        return pd.DataFrame({
            "token": t["token"].to_numpy(),
            "exact_c": t["c"].to_numpy(dtype=np.int64),
            "cms_est": est.astype(np.int64),
        }).sort_values("token").reset_index(drop=True)

    return sketches.repartition(1).map_batches(probe,
                                               batch_format="pandas")


def sample_docs_per_source(sf_dir: str, k: int = 5) -> rd.Dataset:
    """Deterministic pseudo-random sample of ``k`` docs per source —
    the per-stratum eyeball sample every corpus audit starts with. The
    shuffle key is a Knuth multiplicative scramble of doc_id
    ((doc_id * 2654435761) mod 2^32), SQL-expressible so the oracle is
    exact, uniform-ish, and stable across engines and runs.

    Plan: the scramble is computed vectorized per block; the
    distributed row_number() <= k lowers to hash_groupby_topn (local
    top-k per block -> key-hash exchange of at most k x |sources| x
    blocks rows -> final re-pick). Output: (source, doc_id, skey)
    sorted by (source, skey)."""
    from ..stages.hashagg import hash_groupby_topn

    ds = _docs(sf_dir, ["doc_id", "source"])

    def scramble(batch: pa.Table) -> pa.Table:
        did = batch.column("doc_id").to_numpy(zero_copy_only=False)
        skey = (did.astype(np.uint64)
                * np.uint64(2654435761)) % np.uint64(4294967296)
        return pa.Table.from_pydict({
            "source": batch.column("source"),
            "doc_id": pa.array(did.astype(np.int64), pa.int64()),
            "skey": pa.array(skey.astype(np.int64), pa.int64())})

    keyed = ds.map_batches(scramble, batch_format="pyarrow")
    top = hash_groupby_topn(keyed, ["source"], ["skey", "doc_id"],
                            [True, True], k, num_parts=8)
    return top.repartition(1).sort(["source", "skey"])


def source_ablation_impact(sf_dir: str) -> rd.Dataset:
    """Leave-one-source-out ablation of the corpus mean doc length —
    the cheapest data-valuation signal (how much does dropping each
    source move a corpus statistic): delta_mean = mean(without s) -
    mean(all). Sources whose removal RAISES the mean are dragging
    quality down.

    Plan: per-source (sum, count) partials fold through ONE
    |sources|-bounded exchange; every LOO mean is then a closed-form
    transform of the |sources|-row table — no second pass, no join.
    Output: (source, n_docs, mean_all, mean_without, delta_mean)."""
    from ..stages.hashagg import hash_groupby_agg

    ds = _docs(sf_dir, ["source", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return table_from_pandas(df.groupby("source", as_index=False)
                                 .agg(s=("n_chars", "sum"),
                                      n=("n_chars", "size")))

    agg = hash_groupby_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["source"], {"s": ("s", "sum"), "n": ("n", "sum")},
        num_parts=4)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        s = df["s"].to_numpy(dtype=np.float64)
        n = df["n"].to_numpy(dtype=np.float64)
        tot_s, tot_n = s.sum(), n.sum()
        mean_all = tot_s / tot_n
        mean_wo = (tot_s - s) / (tot_n - n)
        return pd.DataFrame({
            "source": df["source"].to_numpy(),
            "n_docs": n.astype(np.int64),
            "mean_all": round_half_up(
                np.full(len(df), mean_all), 4),
            "mean_without": round_half_up(mean_wo, 4),
            "delta_mean": round_half_up(mean_wo - mean_all, 4),
        }).sort_values("source").reset_index(drop=True)

    return agg.repartition(1).map_batches(finish,
                                          batch_format="pandas")


def approx_doclen_quantiles_by_lang(sf_dir: str) -> rd.Dataset:
    """Grouped approximate quantiles: per-language p50/p90 of doc
    length via one mergeable KLL sketch per (lang, block) — the
    sketch-inside-a-groupby pattern (same shape as the grouped HLL):
    the exchange carries serialized sketches, never values, so a
    100-TB group costs the same shuffle bytes as a 1-MB one.
    Approximate by construction -> rows-only; the accuracy pytest
    bounds the rank error against the exact quantile. Output:
    (lang, n_docs, p50, p90)."""
    from ..functions.sketch import (kll_add, kll_create,
                                    kll_deserialize, kll_merge,
                                    kll_quantiles, kll_serialize)

    ds = _docs(sf_dir, ["lang", "n_chars"])

    def sketch_block(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        rows = []
        for lang, g in df.groupby("lang"):
            sk = kll_add(kll_create(),
                         g["n_chars"].to_numpy(dtype=np.float64))
            rows.append((lang, len(g), kll_serialize(sk)))
        out = pd.DataFrame(rows, columns=["lang", "n", "sk"])
        return pa.Table.from_pydict({
            "lang": pa.array(out["lang"], pa.string()),
            "n": pa.array(out["n"].to_numpy(np.int64), pa.int64()),
            "sk": pa.array(out["sk"], pa.binary())})

    partials = ds.map_batches(sketch_block, batch_format="pyarrow")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for lang, g in df.groupby("lang"):
            merged = kll_deserialize(g["sk"].iloc[0])
            for b in g["sk"].iloc[1:]:
                merged = kll_merge(merged, kll_deserialize(b))
            q = kll_quantiles(merged, [0.5, 0.9])
            rows.append((lang, int(g["n"].sum()), float(q[0]),
                         float(q[1])))
        out = pd.DataFrame(rows,
                           columns=["lang", "n_docs", "p50", "p90"])
        out["n_docs"] = out["n_docs"].astype(np.int64)
        return out.sort_values("lang").reset_index(drop=True)

    return partials.repartition(1).map_batches(finish,
                                               batch_format="pandas")


def token_fertility_by_lang(sf_dir: str) -> rd.Dataset:
    """Tokenizer fertility audit: BPE-ish subword tokens per
    whitespace word, per language — the standard multi-lingual
    tokenizer-cost signal (a lang whose fertility is 2x pays 2x the
    context budget). Both counts come from vectorized RE2/Arrow
    kernels; ONE |langs|-bounded reduce.
    Output: (lang, n_words, n_bpe_tokens, fertility)."""
    from ..pipelines.training import BPE_RE
    from ..stages.hashagg import hash_groupby_agg

    ds = _docs(sf_dir, ["lang", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim(batch.column("text"), " ")
        empty = pc.equal(trimmed, "")
        words = pc.list_value_length(
            pc.split_pattern_regex(trimmed, r"\s+"))
        words = pc.if_else(empty, pa.scalar(0, pa.int32()), words)
        bpe = pc.count_substring_regex(batch.column("text"), BPE_RE)
        df = pd.DataFrame({
            "lang": batch.column("lang").to_numpy(
                zero_copy_only=False),
            "w": words.to_numpy(zero_copy_only=False).astype(
                np.int64),
            "b": bpe.to_numpy(zero_copy_only=False).astype(np.int64)})
        return table_from_pandas(
            df.groupby("lang", as_index=False).agg(
                n_words=("w", "sum"), n_bpe_tokens=("b", "sum")))

    agg = hash_groupby_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["lang"], {"n_words": ("n_words", "sum"),
                   "n_bpe_tokens": ("n_bpe_tokens", "sum")},
        num_parts=4)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.astype({"n_words": "int64", "n_bpe_tokens": "int64"})
        df["fertility"] = round_half_up(
            df["n_bpe_tokens"].to_numpy()
            / df["n_words"].to_numpy(), 4)
        return df[["lang", "n_words", "n_bpe_tokens", "fertility"]]

    return (agg.map_batches(finish, batch_format="pandas")
            .repartition(1).sort("lang"))


class CompressionRatioStage:
    """Actor stage: per-doc zlib compression ratio — the
    model-free redundancy/quality signal (highly compressible text is
    templated or repetitive; Gopher-class filters use the same idea
    via repetition fractions). zlib level pinned for determinism."""

    def __init__(self, level: int = 6) -> None:
        import zlib

        self._compress = lambda b: zlib.compress(b, level)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        nb, nc = [], []
        for t in texts:
            raw = (t or "").encode("utf-8")
            nb.append(len(raw))
            nc.append(len(self._compress(raw)) if raw else 0)
        nb_a = np.array(nb, dtype=np.int64)
        nc_a = np.array(nc, dtype=np.int64)
        ratio = np.where(nb_a > 0, nc_a / np.maximum(nb_a, 1), 0.0)
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "n_bytes": pa.array(nb_a, pa.int64()),
            "n_compressed": pa.array(nc_a, pa.int64()),
            "ratio": pa.array(round_half_up(ratio, 4), pa.float64())})


def compression_ratio_quality(sf_dir: str,
                              concurrency=(1, 8)) -> rd.Dataset:
    """(doc_id, n_bytes, n_compressed, ratio) per document via an
    actor-pool zlib pass — rows-only (compressed size is
    implementation-defined, not SQL-expressible); pytest pins
    determinism and the ratio's monotonicity on known-redundancy
    fixtures. Output sorted by doc_id."""
    return (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(CompressionRatioStage, batch_format="pyarrow",
                         concurrency=concurrency)
            .repartition(4).sort("doc_id"))


def cluster_top_terms(sf_dir: str, top: int = 3) -> rd.Dataset:
    """Class-based TF-IDF topic labels (the BERTopic c-TF-IDF shape,
    Grootendorst 2022): for every embedding-label class, the ``top``
    terms by W(t,c) = tf(t,c) * ln(1 + A / f(t)), where A = mean
    tokens per class and f(t) = the term's corpus count — the "name
    the clusters" step after any embedding clustering.

    Plan: labels attach to documents through ONE hash-partitioned
    join on doc_id (`stages/join.partitioned_join` — the label table
    is corpus-sized, so no broadcast); per-class term counts reduce
    vocab-sized; f(t) and A fold from the same reduced table inside
    one repartition(1) finish (classes x vocab is small; at web scale
    the finish keys on term like source_kl_divergence). Output:
    (label, rank, token, score)."""
    from ..stages.hashagg import hash_groupby_agg
    from ..stages.join import partitioned_join

    docs = _docs(sf_dir, ["doc_id", "text"])
    emb = read_table(f"{sf_dir}/embeddings.parquet",
                     columns=["vec_id", "label"])

    def merge(ld: pd.DataFrame, rd_: pd.DataFrame) -> pd.DataFrame:
        return ld.merge(rd_, left_on="doc_id", right_on="vec_id")[
            ["label", "text"]]

    joined = partitioned_join(
        docs, emb, "doc_id", "vec_id", merge, num_buckets=16,
        left_schema=pa.schema([("doc_id", pa.int64()),
                               ("text", pa.string())]),
        right_schema=pa.schema([("vec_id", pa.int64()),
                                ("label", pa.int64())]))

    def tok_counts(batch: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim(batch.column("text"), " ")
        keep = pc.not_equal(trimmed, "")
        lab = pc.filter(batch.column("label"), keep)
        toks = pc.split_pattern_regex(pc.filter(trimmed, keep), r"\s+")
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "label": np.repeat(lab.to_numpy(zero_copy_only=False), n),
            "token": pc.list_flatten(toks).to_pandas()})
        g = df.groupby(["label", "token"], as_index=False).size()
        return table_from_pandas(g.rename(columns={"size": "tf"}))

    per_class = hash_groupby_agg(
        joined.map_batches(tok_counts, batch_format="pyarrow"),
        ["label", "token"], {"tf": ("tf", "sum")}, num_parts=8)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.astype({"label": "int64", "tf": "int64"})
        n_classes = df["label"].nunique()
        a = df["tf"].sum() / n_classes
        ft = df.groupby("token")["tf"].transform("sum").to_numpy(
            dtype=np.float64)
        df = df.assign(score=df["tf"].to_numpy(dtype=np.float64)
                       * np.log(1.0 + a / ft))
        df = df.sort_values(["label", "score", "token"],
                            ascending=[True, False, True])
        df = df.groupby("label", as_index=False).head(top)
        df["rank"] = df.groupby("label").cumcount() + 1
        out = pd.DataFrame({
            "label": df["label"].to_numpy(dtype=np.int64),
            "rank": df["rank"].to_numpy(dtype=np.int64),
            "token": df["token"].to_numpy(),
            "score": round_half_up(df["score"].to_numpy(), 4)})
        return out.reset_index(drop=True)

    return per_class.repartition(1).map_batches(
        finish, batch_format="pandas").sort(["label", "rank"])


def temperature_mix_weights(sf_dir: str, alpha: float = 0.7
                            ) -> rd.Dataset:
    """Temperature-scaled sampling weights per source (the
    multilingual-LM mixing rule, alpha < 1 upsamples the tail —
    mBERT/XLM-R exponent smoothing): w_s = share_s^alpha /
    sum(share^alpha), plus the implied up/down-sampling factor
    w_s / share_s.

    Plan: ONE |sources|-bounded token-count reduce (shares from token
    mass, not doc counts); the smoothing is a closed-form finish.
    Output: (source, n_tokens, share, weight, sampling_factor)."""
    from ..stages.hashagg import hash_groupby_agg

    ds = _docs(sf_dir, ["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim(batch.column("text"), " ")
        empty = pc.equal(trimmed, "")
        n = pc.list_value_length(
            pc.split_pattern_regex(trimmed, r"\s+"))
        n = pc.if_else(empty, pa.scalar(0, pa.int32()), n)
        df = pd.DataFrame({
            "source": batch.column("source").to_numpy(
                zero_copy_only=False),
            "n": n.to_numpy(zero_copy_only=False).astype(np.int64)})
        return table_from_pandas(
            df.groupby("source", as_index=False)["n"].sum()
            .rename(columns={"n": "n_tokens"}))

    agg = hash_groupby_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["source"], {"n_tokens": ("n_tokens", "sum")}, num_parts=4)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n_tokens"].to_numpy(dtype=np.float64)
        share = n / n.sum()
        sm = np.power(share, alpha)
        w = sm / sm.sum()
        return pd.DataFrame({
            "source": df["source"].to_numpy(),
            "n_tokens": n.astype(np.int64),
            "share": round_half_up(share, 6),
            "weight": round_half_up(w, 6),
            "sampling_factor": round_half_up(w / share, 4),
        }).sort_values("source").reset_index(drop=True)

    return agg.repartition(1).map_batches(finish,
                                          batch_format="pandas")


def hive_partition_stats(sf_dir: str, lang: str = "en") -> rd.Dataset:
    """Doc count + char mass of ONE language read through the
    hive-partitioned lake layout: the documents table is written
    ``lang=<v>/`` partitioned once (sources/storage.
    write_hive_partitioned), then the query lists and scans ONLY the
    requested partition's directory — zero bytes of any other
    language move (the partition-pruning half of "prune at the
    read"; row-group pruning inside a partition is write_clustered's
    job). Output: (lang, n_docs, total_chars)."""
    from ..sources.storage import (cached_layout, read_hive_partition,
                                   write_hive_partitioned)

    base = cached_layout(
        "hive_docs_lang", [f"{sf_dir}/documents.parquet"],
        lambda d: write_hive_partitioned(
            _docs(sf_dir, ["doc_id", "lang", "n_chars"]),
            d, ["lang"]))

    ds = read_hive_partition(base, "lang", lang,
                             columns=["doc_id", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        n = batch.column("n_chars").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "lang": pa.array([lang], pa.string()),
            "n_docs": pa.array([len(n)], pa.int64()),
            "total_chars": pa.array([int(n.sum())], pa.int64())})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("lang", as_index=False).sum()
        g["n_docs"] = g["n_docs"].astype(np.int64)
        g["total_chars"] = g["total_chars"].astype(np.int64)
        return g

    return (ds.map_batches(partial, batch_format="pyarrow")
            .repartition(1).map_batches(finish, batch_format="pandas"))


def zipf_fit_by_source(sf_dir: str, top_k: int = 100) -> rd.Dataset:
    """Zipf-law fit per source: the OLS slope of ln(count) ~ ln(rank)
    over each source's ``top_k`` most frequent tokens — the classic
    corpus-health diagnostic (natural text sits near -1; templated or
    machine-generated crawls flatten or steepen the curve; see
    Piantadosi 2014 for the public background). Plan: one explode pass
    folds per-batch (source, token) counts; the two-phase hash
    aggregate reduces to one row per distinct (source, token) — the
    only exchange, vocabulary-sized; each reduced block keeps its local
    top-k per source under the total order (count desc, token asc), a
    superset of the global top-k, so the final fit touches at most
    |sources| x top_k rows in one tiny block. Sources with fewer than
    two distinct tokens are dropped (the fit is undefined — mirrors
    the oracle's HAVING). Output: (source, n_top, zipf_slope) sorted
    by source, slope rounded to 6."""
    from ..stages.hashagg import hash_groupby_agg

    def tok_counts(batch: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim(batch.column("text"), " ")
        keep = pc.not_equal(trimmed, "")
        src = pc.filter(batch.column("source"), keep)
        toks = pc.split_pattern_regex(pc.filter(trimmed, keep), r"\s+")
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "source": np.repeat(src.to_numpy(zero_copy_only=False), n),
            "token": pc.list_flatten(toks).to_pandas()})
        g = df.groupby(["source", "token"], as_index=False).size()
        return table_from_pandas(g.rename(columns={"size": "c"}),
                                 preserve_index=False)

    per_token = hash_groupby_agg(
        _docs(sf_dir, ["source", "text"]).map_batches(
            tok_counts, batch_format="pyarrow"),
        ["source", "token"], {"c": ("c", "sum")}, num_parts=16)

    def topk_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["source", "c", "token"],
                            ascending=[True, False, True])
        return df.groupby("source", as_index=False).head(top_k)

    small = (per_token.map_batches(topk_partial, batch_format="pandas")
             .repartition(1))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = (df.sort_values(["source", "c", "token"],
                             ascending=[True, False, True])
              .groupby("source", as_index=False).head(top_k))
        x = np.log(df.groupby("source").cumcount().to_numpy() + 1.0)
        y = np.log(df["c"].to_numpy(dtype=np.float64))
        g = (df.assign(x=x, y=y, xy=x * y, xx=x * x)
             .groupby("source", as_index=False)
             .agg(n_top=("x", "size"), sx=("x", "sum"),
                  sy=("y", "sum"), sxy=("xy", "sum"),
                  sxx=("xx", "sum")))
        g = g[g["n_top"] >= 2]
        n = g["n_top"].to_numpy(dtype=np.float64)
        slope = ((g["sxy"].to_numpy() - g["sx"].to_numpy()
                  * g["sy"].to_numpy() / n)
                 / (g["sxx"].to_numpy() - g["sx"].to_numpy() ** 2 / n))
        return pd.DataFrame({
            "source": g["source"],
            "n_top": g["n_top"].astype(np.int64),
            "zipf_slope": round_half_up(slope, 6)})

    return (small.map_batches(final, batch_format="pandas")
            .sort("source"))


def doc_row_numbers(sf_dir: str) -> rd.Dataset:
    """Global contiguous ROW_NUMBER() OVER (ORDER BY doc_id) — the
    zipWithIndex primitive (stable global indexing for sharding,
    pairing and resumable addressing) WITHOUT a global sort when the
    lake layout already provides order. Plan: pass 1 folds one
    (min, max, count, sorted) row per block; the driver checks the
    blocks form non-overlapping sorted runs (true for the clustered /
    hive layouts this repo writes and for the fixture parquet) and
    prefix-sums the counts into per-block offsets keyed by block-min;
    pass 2 assigns rn = offset + intra-block rank with one searchsorted
    and one argsort per block. If the runs DO overlap, the engine
    falls back to one range-exchange sort first — correctness never
    depends on layout luck. Output: (doc_id, rn) by doc_id."""
    import ray

    _EMPTY_STATS = pa.table({
        "mn": pa.array([], pa.int64()), "mx": pa.array([], pa.int64()),
        "cnt": pa.array([], pa.int64()), "srt": pa.array([], pa.bool_())})

    def stats(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        if len(d) == 0:
            return _EMPTY_STATS
        srt = bool(np.all(d[1:] >= d[:-1])) if len(d) > 1 else True
        return pa.table({
            "mn": pa.array([int(d.min())], pa.int64()),
            "mx": pa.array([int(d.max())], pa.int64()),
            "cnt": pa.array([len(d)], pa.int64()),
            "srt": pa.array([srt], pa.bool_())})

    def _block_stats(ds: rd.Dataset) -> pd.DataFrame:
        return (ds.map_batches(stats, batch_format="pyarrow",
                               batch_size=None)
                .to_pandas().sort_values("mn").reset_index(drop=True))

    ds = _docs(sf_dir, ["doc_id"])
    st = _block_stats(ds)
    overlapping = bool((st["mn"].to_numpy()[1:]
                        <= st["mx"].to_numpy()[:-1]).any())
    if overlapping:
        ds = ds.sort("doc_id").materialize()
        st = _block_stats(ds)

    offs = np.cumsum(st["cnt"].to_numpy(dtype=np.int64)) \
        - st["cnt"].to_numpy(dtype=np.int64)
    mins = st["mn"].to_numpy(dtype=np.int64)
    lut_ref = ray.put((mins, offs))

    def assign(batch: pa.Table) -> pa.Table:
        mn, of = ray.get(lut_ref)
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        if len(d) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "rn": pa.array([], pa.int64())})
        base = of[np.searchsorted(mn, int(d.min()))]
        order = np.argsort(d, kind="stable")
        rn = np.empty(len(d), dtype=np.int64)
        rn[order] = base + 1 + np.arange(len(d), dtype=np.int64)
        return pa.table({"doc_id": pa.array(d.astype(np.int64)),
                         "rn": pa.array(rn)})

    return (ds.map_batches(assign, batch_format="pyarrow",
                           batch_size=None).sort("doc_id"))


def bigram_logprob_scores(sf_dir: str) -> rd.Dataset:
    """Bigram LM fluency score per doc: mean ln p(w2 | w1) under the
    corpus's own MLE bigram model — the next step up from the unigram
    CCNet proxy (:func:`unigram_logprob_scores`); word salad that
    passes a unigram filter (common words, shuffled) fails here
    because its TRANSITIONS are rare. Scale plan mirrors the unigram
    path: bigram frequencies reduce to bigram-vocabulary cardinality
    through ONE two-phase (w1, w2)-keyed aggregate (strings joined
    with \\x1f — the repo's object-key separator); context counts
    c(w1) fold from that reduced table on the driver; the
    (hash64(pair) -> ln p) array broadcasts once (at web scale: cap to
    top-K pairs with an OOV floor, vocabulary-sized by construction);
    the scoring pass is one Arrow join_element_wise + sorted-array
    lookup + segment cumsum per block — no second shuffle, no per-row
    Python. Docs with fewer than two tokens are excluded (no
    transition to score). Output: (doc_id, n_bigrams, bigram_logprob)
    by doc_id, score rounded to 6."""
    import ray

    from ..stages.hashagg import hash_groupby_agg

    def _doc_bigram_parts(batch: pa.Table, with_ids: bool):
        # DuckDB trim() strips spaces only — match it exactly so a
        # tab/newline-edged doc tokenizes identically to the oracle
        # (ADVICE r03)
        trimmed = pc.utf8_trim(batch.column("text"), " ")
        mask = pc.not_equal(trimmed, "")
        lists = pc.split_pattern_regex(pc.filter(trimmed, mask), r"\s+")
        lens = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(lists)
        n = len(flat)
        # positions whose successor is in the SAME doc
        ends = np.cumsum(lens)
        last = np.zeros(n, dtype=bool)
        if n:
            last[ends - 1] = True
        w1 = flat.filter(pa.array(~last))
        first = np.zeros(n, dtype=bool)
        if n:
            first[ends - lens] = True
        w2 = flat.filter(pa.array(~first))
        pair = pc.binary_join_element_wise(w1, w2, "\x1f")
        if not with_ids:
            return pair
        mask_np = mask.to_numpy(zero_copy_only=False)
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False)[mask_np]
        return pair, ids, np.maximum(lens - 1, 0)

    def explode_pairs(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"pair": _doc_bigram_parts(batch, with_ids=False)})

    pairs = _docs(sf_dir, ["text"]).map_batches(explode_pairs,
                                                batch_format="pyarrow")
    vocab = hash_groupby_agg(pairs, ["pair"], {"c": ("pair", "count")},
                             num_parts=16).to_pandas()
    w1 = vocab["pair"].str.split("\x1f", n=1).str[0]
    ctx = vocab.assign(w1=w1).groupby("w1")["c"].transform("sum")
    lnp = np.log(vocab["c"].to_numpy(dtype=np.float64)
                 / ctx.to_numpy(dtype=np.float64))
    ph = hash64_batch(pa.array(vocab["pair"], pa.string()))
    order = np.argsort(ph)
    ref = ray.put((ph[order], lnp[order]))

    def score(batch: pa.Table) -> pa.Table:
        pair, ids, blens = _doc_bigram_parts(batch, with_ids=True)
        keep = blens > 0
        ids, blens = ids[keep], blens[keep]
        th = hash64_batch(pair)
        vhs, vls = ray.get(ref)
        pos = np.searchsorted(vhs, th)
        pos[pos >= len(vhs)] = len(vhs) - 1 if len(vhs) else 0
        lp = vls[pos] if len(vhs) else np.zeros(len(th))
        ends = np.cumsum(blens)
        cs = np.concatenate([np.zeros(1), np.cumsum(lp)])
        sums = cs[ends] - cs[ends - blens]
        return pa.table({
            "doc_id": pa.array(ids.astype(np.int64)),
            "n_bigrams": pa.array(blens),
            "bigram_logprob": pa.array(round_half_up(
                sums / blens, 6))})

    return (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(score, batch_format="pyarrow")
            .repartition(4).sort("doc_id"))


def length_pct_rank_by_source(sf_dir: str) -> rd.Dataset:
    """Source-relative quantile normalization: each document's
    percent_rank of n_chars WITHIN its source — the cross-source score
    calibration a mixing pipeline applies before comparing quality
    cutoffs between crawls with different length profiles. n_chars is
    an exact integer, so per-source ranks come from DOMAIN-BOUNDED
    value histograms (one (source, n_chars) keyed exchange, sized by
    sources x length domain, never by docs); the histogram CDFs
    broadcast once and every batch probes by searchsorted — SQL
    percent_rank ties (same length, same source) share the min-rank
    value exactly. Output: (doc_id, source, pct_rank) by doc_id,
    rounded to 6."""
    import ray

    from ..stages.hashagg import hash_groupby_agg

    ds = _docs(sf_dir, ["doc_id", "source", "n_chars"])

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(["source", "n_chars"], as_index=False)
                .size().rename(columns={"size": "c"}))

    hist = hash_groupby_agg(
        ds.map_batches(hist_partial, batch_format="pandas"),
        ["source", "n_chars"], {"c": ("c", "sum")},
        num_parts=8).to_pandas().sort_values(["source", "n_chars"])

    luts = {}
    for src, g in hist.groupby("source", sort=False):
        v = g["n_chars"].to_numpy(dtype=np.int64)
        c = g["c"].to_numpy(dtype=np.int64)
        n = int(c.sum())
        cum_less = np.cumsum(c) - c
        # percent_rank = (min_rank - 1) / (n - 1); ties share it
        pr = cum_less / max(n - 1, 1)
        luts[src] = (v, pr)
    lut_ref = ray.put(luts)

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        lu = ray.get(lut_ref)
        src = df["source"].to_numpy()
        nc = df["n_chars"].to_numpy(dtype=np.int64)
        out = np.empty(len(df), dtype=np.float64)
        for s in pd.unique(src):
            m = src == s
            v, pr = lu[s]
            out[m] = pr[np.searchsorted(v, nc[m])]
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype(np.int64),
            "source": src,
            "pct_rank": round_half_up(out, 6)})

    return (ds.map_batches(probe, batch_format="pandas")
            .repartition(4).sort("doc_id"))


def rbo_rankings(sf_dir: str, p: float = 0.9, depth: int = 20
                 ) -> pd.DataFrame:
    """Rank-Biased Overlap (Webber et al., TOIS 2010) between the BM25
    ranking and the RRF hybrid ranking for the same query — the
    top-weighted ranking-agreement metric an IR/eval pipeline uses to
    quantify how much a reranker actually changed. Both rankings come
    from the existing DISTRIBUTED retrieval pipelines (corpus-wide
    scoring, partial top-k per block); the RBO fold itself runs on two
    depth-bounded lists only, so driver work is O(depth) regardless of
    corpus size. Reports the truncated base sum RBO@depth =
    (1-p)/(1-p^depth-ish normalized) — specifically the MIN form
    (known-prefix agreement) plus extrapolated RBO_ext. Output: one
    row (depth, p, rbo_min, rbo_ext) — rows-only (iterative prefix
    overlap over two rankings; closed-form pytest oracle)."""
    a = (bm25_search(sf_dir).to_pandas()
         .sort_values(["score", "doc_id"], ascending=[False, True])
         ["doc_id"].tolist()[:depth])
    b = (rrf_hybrid_search(sf_dir).to_pandas()
         .sort_values(["rrf_score", "doc_id"], ascending=[False, True])
         ["doc_id"].tolist()[:depth])
    d = min(len(a), len(b), depth)
    sa, sb = set(), set()
    overlap = 0
    agreement = []
    for i in range(d):
        sa.add(a[i]); sb.add(b[i])
        overlap = len(sa & sb)
        agreement.append(overlap / (i + 1))
    # truncated (min) RBO: weights (1-p) p^(i) over seen prefix
    w = np.array([(1 - p) * p ** i for i in range(d)])
    rbo_min = float((w * np.array(agreement)).sum())
    # extrapolated: assume agreement at depth d persists
    rbo_ext = rbo_min + agreement[-1] * (p ** d) if d else 0.0
    from ..functions.numeric import round_half_up as _r
    return pd.DataFrame({
        "depth": np.array([d], dtype=np.int64),
        "p": np.array([p]),
        "rbo_min": _r(np.array([rbo_min]), 6),
        "rbo_ext": _r(np.array([rbo_ext]), 6)})


def classifier_calibration_bins(sf_dir: str, nbins: int = 10
                                ) -> rd.Dataset:
    """Reliability diagram of the distilled quality classifier: the
    corpus bucketed by predicted probability, each bin reporting how
    often the teacher label is actually positive — the calibration
    audit (Guo et al. 2017 shape) every learned gating model needs
    before its threshold is trusted on 100 TB. Composition: the
    deterministic quantized-gradient trainer
    (:func:`train_quality_classifier`) yields (mu, w) as a tiny row
    table; ONE streaming scoring pass re-featurizes each block,
    applies the sigmoid, and folds per-bin (n, n_pos, Σp) partials —
    the exchange is nbins x blocks rows. Output: (bin, n_docs,
    frac_positive, mean_pred) sorted by bin, rounded to 6."""
    from ..functions.linear import linear_z
    from ..stages.hashagg import hash_groupby_agg

    model = train_quality_classifier(sf_dir).to_pandas() \
        .set_index("feature")["value"]
    d = len(QUALITY_CLF_FEATURES)
    mu = np.array([model[f"mu_{f}"] for f in QUALITY_CLF_FEATURES])
    w = np.array([model[f"w_{f}"] for f in QUALITY_CLF_FEATURES]
                 + [model["bias"]])

    def partial(batch: pa.Table) -> pa.Table:
        X, y = _quality_clf_xy(batch.column("text"))
        p = 1.0 / (1.0 + np.exp(-linear_z(X - mu, w)))
        b = np.minimum((p * nbins).astype(np.int64), nbins - 1)
        g = (pd.DataFrame({"bin": b, "n": np.int64(1),
                           "n_pos": y.astype(np.int64), "sp": p})
             .groupby("bin", as_index=False).sum())
        return table_from_pandas(g, preserve_index=False)

    agg = hash_groupby_agg(
        _docs(sf_dir, ["text"]).map_batches(partial,
                                            batch_format="pyarrow"),
        ["bin"], {"n": ("n", "sum"), "n_pos": ("n_pos", "sum"),
                  "sp": ("sp", "sum")}, num_parts=2)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(dtype=np.float64)
        return pd.DataFrame({
            "bin": df["bin"].astype(np.int64),
            "n_docs": df["n"].astype(np.int64),
            "frac_positive": round_half_up(
                df["n_pos"].to_numpy(dtype=np.float64) / n, 6),
            "mean_pred": round_half_up(
                df["sp"].to_numpy(dtype=np.float64) / n, 6)})

    return (agg.map_batches(finish, batch_format="pandas")
            .repartition(1).sort("bin"))


def gram_novelty(sf_dir: str, k: int = 12) -> rd.Dataset:
    """Per-doc n-gram novelty: the fraction of a doc's distinct
    k-character grams whose FIRST corpus appearance (minimum doc_id)
    is in that doc — the marginal-contribution / data-valuation signal
    behind greedy source selection (a doc full of already-seen grams
    adds nothing to a training mix; see source_gram_coverage for the
    source-level curve). Graft addition (no reference counterpart).

    Plan: two narrow passes over documents. Pass A folds each doc's
    distinct-gram COUNT locally (a doc lives in one row — no
    exchange). Pass B emits per-block (gram, min doc_id) partials via
    the vectorized rolling-hash shingle kernel
    (``textstats.window_hashes_flat``) and reduces the global min per
    gram through ONE gram-hash exchange (``hash_groupby_agg``); the
    (gram, first_doc) table then folds to (doc_id, n_novel) by a
    doc-cardinality sum. A doc-keyed partitioned join stitches the two
    reduced tables. Byte windows equal character windows on ASCII
    corpora and 64-bit window hashes stand in for gram strings (same
    documented caveats as substring_dups, dedup.py:1075). Output:
    (doc_id, n_grams, n_novel, novelty_pct) by doc_id."""
    from ..functions.textstats import string_bytes, window_hashes_flat
    from ..stages.hashagg import hash_groupby_agg
    from ..stages.join import partitioned_join

    path = f"{sf_dir}/documents.parquet"

    def _distinct(batch: pa.Table) -> tuple[np.ndarray, np.ndarray,
                                            np.ndarray]:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        data, offsets = string_bytes(batch.column("text"))
        seg, h = window_hashes_flat(data, offsets, k)
        order = np.lexsort((h, seg))
        seg, h = seg[order], h[order]
        first = np.ones(len(seg), dtype=bool)
        first[1:] = (seg[1:] != seg[:-1]) | (h[1:] != h[:-1])
        return ids, seg[first], h[first]

    def sizes(batch: pa.Table) -> pa.Table:
        ids, seg, _ = _distinct(batch)
        n = np.bincount(seg, minlength=len(ids)).astype(np.int64)
        keep = n > 0
        return pa.Table.from_pydict(
            {"doc_id": ids[keep].astype(np.int64), "n_grams": n[keep]},
            schema=pa.schema([("doc_id", pa.int64()),
                              ("n_grams", pa.int64())]))

    def gram_min_partial(batch: pa.Table) -> pa.Table:
        ids, seg, h = _distinct(batch)
        doc = ids[seg].astype(np.int64)
        g = h.view(np.int64)
        # local min per gram before the exchange (grams repeat across
        # the block's docs): sorted by (g, doc) keeps the first
        order = np.lexsort((doc, g))
        g, doc = g[order], doc[order]
        first = np.ones(len(g), dtype=bool)
        first[1:] = g[1:] != g[:-1]
        return pa.Table.from_pydict(
            {"g": g[first], "first_doc": doc[first]},
            schema=pa.schema([("g", pa.int64()),
                              ("first_doc", pa.int64())]))

    size_ds = read_table(path, columns=["doc_id", "text"]) \
        .map_batches(sizes, batch_format="pyarrow")
    firsts = hash_groupby_agg(
        read_table(path, columns=["doc_id", "text"])
        .map_batches(gram_min_partial, batch_format="pyarrow"),
        keys=["g"], aggs={"first_doc": ("first_doc", "min")})

    def novel_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("first_doc", as_index=False).size()
        return pd.DataFrame({"doc_id": g["first_doc"].astype(np.int64),
                             "n_novel": g["size"].astype(np.int64)})

    novel = hash_groupby_agg(
        firsts.map_batches(novel_partial, batch_format="pandas"),
        keys=["doc_id"], aggs={"n_novel": ("n_novel", "sum")},
        num_parts=16)

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        m = left.merge(right, on="doc_id", how="left")
        m["n_novel"] = m["n_novel"].fillna(0).astype(np.int64)
        m["novelty_pct"] = round_half_up(
            100.0 * m["n_novel"] / m["n_grams"], 4)
        return m

    out = partitioned_join(
        size_ds, novel, "doc_id", "doc_id", merge, num_buckets=16,
        left_schema=pa.schema([("doc_id", pa.int64()),
                               ("n_grams", pa.int64())]),
        right_schema=pa.schema([("doc_id", pa.int64()),
                                ("n_novel", pa.int64())]))
    return out.repartition(4).sort("doc_id")


def isotonic_calibration(sf_dir: str, nbins: int = 50) -> "pa.Table":
    """Isotonic (PAV) calibration map for the distilled quality
    classifier (Zadrozny & Elkan 2002; pool-adjacent-violators,
    Ayer et al. 1955): the monotone step function g(score) that best
    fits P(label=1 | score) in least squares — the non-parametric
    upgrade over the fixed-width reliability diagram
    (:func:`classifier_calibration_bins`), producing the actual
    calibrated probabilities a gating threshold would use.

    Plan: PAV is sequential, but it only ever needs the
    SCORE-HISTOGRAM sufficient statistics: one streaming scoring pass
    folds per-bin (n, n_pos) partials (nbins x blocks exchange, same
    shape as the reliability diagram), and the driver pools adjacent
    violators over the nbins-row table — never over docs. Output one
    row per merged pool: (score_lo, score_hi, n_docs, iso_prob),
    iso_prob non-decreasing, by score_lo."""
    from ..functions.linear import linear_z
    from ..stages.hashagg import hash_groupby_agg

    model = train_quality_classifier(sf_dir).to_pandas() \
        .set_index("feature")["value"]
    mu = np.array([model[f"mu_{f}"] for f in QUALITY_CLF_FEATURES])
    w = np.array([model[f"w_{f}"] for f in QUALITY_CLF_FEATURES]
                 + [model["bias"]])

    def partial(batch: pa.Table) -> pa.Table:
        X, y = _quality_clf_xy(batch.column("text"))
        p = 1.0 / (1.0 + np.exp(-linear_z(X - mu, w)))
        b = np.minimum((p * nbins).astype(np.int64), nbins - 1)
        g = (pd.DataFrame({"bin": b, "n": np.int64(1),
                           "n_pos": y.astype(np.int64)})
             .groupby("bin", as_index=False).sum())
        return table_from_pandas(g, preserve_index=False)

    agg = hash_groupby_agg(
        _docs(sf_dir, ["text"]).map_batches(partial,
                                            batch_format="pyarrow"),
        ["bin"], {"n": ("n", "sum"), "n_pos": ("n_pos", "sum")},
        num_parts=2).to_pandas().sort_values("bin")

    bins = agg["bin"].to_numpy(dtype=np.int64)
    n = agg["n"].to_numpy(dtype=np.float64)
    pos = agg["n_pos"].to_numpy(dtype=np.float64)

    # pool-adjacent-violators over the nbins-row histogram: maintain a
    # stack of pools (lo_bin, hi_bin, weight, weighted mean); merge
    # while the tail is non-monotone
    pools: list[list[float]] = []
    for i in range(len(bins)):
        lo = hi = int(bins[i])
        wt, mean = n[i], pos[i] / n[i]
        while pools and pools[-1][3] >= mean:
            plo, _, pwt, pmean = pools.pop()
            lo = int(plo)
            mean = (pwt * pmean + wt * mean) / (pwt + wt)
            wt = pwt + wt
        pools.append([lo, hi, wt, mean])

    from ..functions.numeric import round_half_up as _r
    return pa.Table.from_pydict({
        "score_lo": pa.array(
            _r([p[0] / nbins for p in pools], 6), pa.float64()),
        "score_hi": pa.array(
            _r([(p[1] + 1) / nbins for p in pools], 6), pa.float64()),
        "n_docs": pa.array([int(p[2]) for p in pools], pa.int64()),
        "iso_prob": pa.array(_r([p[3] for p in pools], 6),
                             pa.float64())})


def classifier_auc(sf_dir: str) -> "pa.Table":
    """Exact ROC-AUC of the distilled quality classifier against its
    teacher labels, computed from a SCORE HISTOGRAM instead of a
    global sort: scores are quantized to 1e-6 (a bounded <=1e6+1-value
    domain), one streaming scoring pass folds per-value (n, n_pos)
    partials, and the driver applies the rank-sum identity
    AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos * n_neg) with tie-aware
    average ranks over the value domain — the Mann-Whitney/AUC
    equivalence, never materializing per-doc scores. Exact w.r.t. the
    quantized scores (documented; 1e-6 << the score resolution the
    8-feature model produces). Output: (n_docs, n_pos, auc) rounded
    to 6."""
    from ..functions.linear import linear_z
    from ..stages.hashagg import hash_groupby_agg

    model = train_quality_classifier(sf_dir).to_pandas() \
        .set_index("feature")["value"]
    mu = np.array([model[f"mu_{f}"] for f in QUALITY_CLF_FEATURES])
    w = np.array([model[f"w_{f}"] for f in QUALITY_CLF_FEATURES]
                 + [model["bias"]])

    def partial(batch: pa.Table) -> pa.Table:
        X, y = _quality_clf_xy(batch.column("text"))
        p = 1.0 / (1.0 + np.exp(-linear_z(X - mu, w)))
        sq = np.rint(p * 1e6).astype(np.int64)
        g = (pd.DataFrame({"s": sq, "n": np.int64(1),
                           "n_pos": y.astype(np.int64)})
             .groupby("s", as_index=False).sum())
        return table_from_pandas(g, preserve_index=False)

    hist = hash_groupby_agg(
        _docs(sf_dir, ["text"]).map_batches(partial,
                                            batch_format="pyarrow"),
        ["s"], {"n": ("n", "sum"), "n_pos": ("n_pos", "sum")},
        num_parts=4).to_pandas().sort_values("s")

    cn = hist["n"].to_numpy(dtype=np.int64)
    npos_v = hist["n_pos"].to_numpy(dtype=np.int64)
    cum_less = np.cumsum(cn) - cn
    ravg = cum_less + (cn + 1) / 2.0
    n = int(cn.sum())
    n_pos = int(npos_v.sum())
    n_neg = n - n_pos
    r_pos = float((npos_v * ravg).sum())
    auc = (r_pos - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)

    from ..functions.numeric import round_half_up as _r
    return pa.Table.from_pydict({
        "n_docs": pa.array([n], pa.int64()),
        "n_pos": pa.array([n_pos], pa.int64()),
        "auc": pa.array(_r(np.array([auc]), 6), pa.float64())})


def langid_agreement_kappa(sf_dir: str) -> rd.Dataset:
    """Cohen's kappa between the stopword-profile language classifier
    (lang_id_batch) and the ground-truth ``lang`` column — the
    chance-corrected inter-rater agreement statistic (Cohen 1960)
    every labeling/review pipeline reports before trusting a weak
    labeler. Generalizes the reference's accuracy report
    (evaluate_new_testdata.py:105-118) to the agreement form that
    stays meaningful under class imbalance.

    Plan: ONE narrow pass scores each block and folds a
    (pred_lang, lang) contingency partial (cells bounded by
    (|langs|+1)^2, never by rows), a tiny combine, then the
    closed-form finish kappa = (po - pe) / (1 - pe) with po/pe
    computed from exact integer margins. Output: one row
    (n_docs, po, pe, kappa) rounded to 6."""
    ds = _docs(sf_dir, ["doc_id", "text", "lang"])

    def cells(batch: pa.Table) -> pa.Table:
        pred, _ = lang_id_batch(batch.column("text"))
        df = pd.DataFrame({"pred_lang": pred,
                           "lang": batch.column("lang").to_pylist()})
        g = df.groupby(["pred_lang", "lang"], as_index=False).size()
        return table_from_pandas(g.rename(columns={"size": "n"}))

    agg = ds.map_batches(cells, batch_format="pyarrow").repartition(1)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["pred_lang", "lang"], as_index=False)["n"].sum()
        tot = float(g["n"].sum())
        diag = float(g.loc[g["pred_lang"] == g["lang"], "n"].sum())
        rows = g.groupby("pred_lang")["n"].sum()
        cols = g.groupby("lang")["n"].sum()
        labels = rows.index.union(cols.index)
        r = rows.reindex(labels, fill_value=0).to_numpy(np.float64)
        c = cols.reindex(labels, fill_value=0).to_numpy(np.float64)
        po = diag / tot
        pe = float((r * c).sum()) / (tot * tot)
        kappa = (po - pe) / (1.0 - pe)
        return pd.DataFrame({
            "n_docs": [np.int64(tot)],
            "po": round_half_up(np.array([po]), 6),
            "pe": round_half_up(np.array([pe]), 6),
            "kappa": round_half_up(np.array([kappa]), 6)})

    return agg.map_batches(finish, batch_format="pandas")


def _doc_token_lists(batch: pa.Table):
    """Shared lower/trim/whitespace tokenizer: returns (kept-row mask
    as numpy bool, Arrow list<string> token lists for kept rows).
    Matches the SQL form regexp_split_to_array(lower(trim(text)),
    '\\s+') with empty docs dropped."""
    # DuckDB trim() strips spaces only — match it exactly (ADVICE r03)
    trimmed = pc.utf8_trim(batch.column("text"), " ")
    mask = pc.not_equal(trimmed, "")
    lists = pc.split_pattern_regex(
        pc.utf8_lower(pc.filter(trimmed, mask)), r"\s+")
    return mask.to_numpy(zero_copy_only=False), lists


def chi2_token_lang(sf_dir: str, k: int = 10) -> rd.Dataset:
    """Per-language top-``k`` discriminative tokens by one-vs-rest
    chi-squared on document-level token presence — the classic
    feature-selection statistic (Yang-Pedersen ICML'97) a corpus
    curator runs to see WHICH words drive a language/domain split.
    Generalizes the reference's per-class frequency report
    (evaluate_new_testdata.py:120-134) to an association-ranked form.

    Plan: per-block (token, lang) DISTINCT-doc partials (docs are
    block-local so block distinct == global distinct), ONE two-phase
    (token, lang)-keyed aggregate, then ONE token-keyed bucket
    exchange where each bucket derives per-token corpus totals and
    the closed-form chi2 against broadcast per-lang doc counts.
    Top-k per lang folds as per-block partial top-k (superset of the
    global top-k under the (chi2 desc, token asc) total order) + a
    tiny final select. Tokens present in every document carry no
    signal and are excluded (denominator zero). Output: (lang, tok,
    df_lang, chi2) sorted lang, chi2 desc, tok."""
    from ..stages.hashagg import _stable_partition, hash_groupby_agg

    def presence(batch: pa.Table) -> pa.Table:
        mask, lists = _doc_token_lists(batch)
        lens = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        langs = np.asarray(batch.column("lang").to_pylist(),
                           dtype=object)[mask]
        df = pd.DataFrame({
            "tok": pc.list_flatten(lists).to_pandas(),
            "lang": np.repeat(langs, lens),
            "d": np.repeat(np.arange(len(lens)), lens)})
        df = df.drop_duplicates()
        g = (df.groupby(["tok", "lang"], as_index=False)
             .agg(a=("d", "size")))
        return table_from_pandas(g, preserve_index=False)

    docs = _docs(sf_dir, ["doc_id", "text", "lang"])
    lt = hash_groupby_agg(
        docs.map_batches(presence, batch_format="pyarrow"),
        ["tok", "lang"], {"a": ("a", "sum")}, num_parts=16)

    nl_df = (docs.map_batches(
        lambda b: table_from_pandas(
            b.to_pandas().groupby("lang", as_index=False)
            .agg(n=("doc_id", "size"))),
        batch_format="pyarrow")
        .repartition(1)
        .map_batches(
            lambda df: df.groupby("lang", as_index=False)["n"].sum(),
            batch_format="pandas")
        .to_pandas())
    nl_map = dict(zip(nl_df["lang"], nl_df["n"].astype(np.float64)))
    n_total = float(nl_df["n"].sum())

    def tag_tok(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_tpart"] = _stable_partition(df, ["tok"], 16)
        return df

    def score_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["tok", "lang", "a"]].copy()
        ta = g.groupby("tok")["a"].transform("sum").to_numpy(
            np.float64)
        a = g["a"].to_numpy(dtype=np.float64)
        nl = g["lang"].map(nl_map).to_numpy(dtype=np.float64)
        keep = ta < n_total
        g, a, ta, nl = g[keep], a[keep], ta[keep], nl[keep]
        b = nl - a
        c = ta - a
        d = n_total - nl - c
        num = a * d - b * c
        chi2 = n_total * num * num / (
            nl * (n_total - nl) * ta * (n_total - ta))
        return pd.DataFrame({
            "lang": g["lang"].to_numpy(),
            "tok": g["tok"].to_numpy(),
            "df_lang": g["a"].to_numpy(np.int64),
            "chi2": chi2})

    scored = (lt.map_batches(tag_tok, batch_format="pandas")
              .groupby("_tpart")
              .map_groups(score_bucket, batch_format="pandas"))

    def topk_partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(["lang", "chi2", "tok"],
                               ascending=[True, False, True])
                .groupby("lang", as_index=False).head(k))

    return (scored.map_batches(topk_partial, batch_format="pandas")
            .repartition(1)
            .map_batches(
                lambda df: (df.sort_values(
                    ["lang", "chi2", "tok"],
                    ascending=[True, False, True])
                    .groupby("lang", as_index=False).head(k)
                    .assign(chi2=lambda x: round_half_up(
                        x["chi2"].to_numpy(), 4))),
                batch_format="pandas"))


def naive_bayes_langid(sf_dir: str, alpha: float = 1.0) -> rd.Dataset:
    """Multinomial Naive Bayes language identification trained on the
    corpus's own labels (McCallum-Nigam AAAI'98 workshop form, Laplace
    smoothing): the supervised step up from the stopword heuristic
    (:func:`lang_id_scores`) — and the engine-side shape of every
    fastText-style distributed label scorer: train = one keyed count
    reduce, score = broadcast model + one streaming pass.

    Plan: (token, lang) term counts reduce through ONE two-phase
    keyed aggregate (vocabulary x langs cardinality, never rows);
    class totals, vocabulary size and ln-priors derive from that
    reduced table plus a tiny lang doc-count fold; the dense
    (vocab x langs) ln-likelihood matrix broadcasts once via
    ``ray.put`` (at web scale: top-K vocabulary with an OOV floor,
    same cap as the unigram-LM path). The scoring pass is one
    map_batches: per-doc token counts fold via sorted-hash lookup +
    np.add.at into a (docs, langs) score matrix; argmax ties break
    to the alphabetically-first lang (matching the SQL
    row_number ... ORDER BY s DESC, lang oracle). Empty docs are
    excluded (no tokens to score). Output: (doc_id, pred_lang,
    is_correct) by doc_id."""
    import ray

    from ..stages.hashagg import hash_groupby_agg

    docs = _docs(sf_dir, ["doc_id", "text", "lang"])

    def term_counts(batch: pa.Table) -> pa.Table:
        mask, lists = _doc_token_lists(batch)
        lens = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        langs = np.asarray(batch.column("lang").to_pylist(),
                           dtype=object)[mask]
        df = pd.DataFrame({
            "tok": pc.list_flatten(lists).to_pandas(),
            "lang": np.repeat(langs, lens)})
        g = df.groupby(["tok", "lang"], as_index=False).size()
        return table_from_pandas(g.rename(columns={"size": "c"}),
                                 preserve_index=False)

    model = hash_groupby_agg(
        docs.map_batches(term_counts, batch_format="pyarrow"),
        ["tok", "lang"], {"c": ("c", "sum")}, num_parts=16).to_pandas()

    langs = sorted(model["lang"].unique())
    lidx = {g: i for i, g in enumerate(langs)}
    toks = np.sort(model["tok"].unique())
    vocab_v = float(len(toks))
    cmat = np.zeros((len(toks), len(langs)), dtype=np.float64)
    ti = np.searchsorted(toks, model["tok"].to_numpy())
    li = model["lang"].map(lidx).to_numpy()
    cmat[ti, li] = model["c"].to_numpy(dtype=np.float64)
    n_l = cmat.sum(axis=0)
    lnp = np.log((cmat + alpha) / (n_l + vocab_v))

    prior_df = (docs.map_batches(
        lambda b: table_from_pandas(
            b.to_pandas().groupby("lang", as_index=False)
            .agg(n=("doc_id", "size"))),
        batch_format="pyarrow").repartition(1)
        .map_batches(
            lambda df: df.groupby("lang", as_index=False)["n"].sum(),
            batch_format="pandas").to_pandas())
    nd = prior_df.set_index("lang")["n"].astype(np.float64)
    ln_prior = np.array([np.log(nd[g] / nd.sum()) for g in langs])

    th = hash64_batch(pa.array(toks, pa.string()))
    # ADVICE r03: likelihood lookup is keyed by 64-bit token hash; a
    # vocabulary collision would silently merge two tokens' rows.
    # Astronomically unlikely at any real vocab size (birthday bound
    # ~2^32 tokens) — assert so a collision fails loud, not wrong.
    assert len(np.unique(th)) == len(toks), \
        "64-bit vocabulary hash collision; langid needs exact keying"
    horder = np.argsort(th)
    ref = ray.put((th[horder], lnp[horder], ln_prior))

    def score(batch: pa.Table) -> pa.Table:
        vhs, vlp, lp0 = ray.get(ref)
        mask, lists = _doc_token_lists(batch)
        lens = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False)[mask]
        true_lang = np.asarray(batch.column("lang").to_pylist(),
                               dtype=object)[mask]
        flat = pc.list_flatten(lists)
        fh = hash64_batch(flat)
        pos = np.searchsorted(vhs, fh)
        pos[pos >= len(vhs)] = len(vhs) - 1 if len(vhs) else 0
        drow = np.repeat(np.arange(len(lens)), lens)
        scores = np.tile(lp0, (len(lens), 1))
        np.add.at(scores, drow, vlp[pos])
        best = np.argmax(scores, axis=1)
        pred = np.array(langs, dtype=object)[best]
        return pa.table({
            "doc_id": pa.array(ids.astype(np.int64)),
            "pred_lang": pa.array(list(pred), pa.string()),
            "is_correct": pa.array(pred == true_lang)})

    return (docs.map_batches(score, batch_format="pyarrow")
            .repartition(4).sort("doc_id"))

def ndcg_retrieval_eval(sf_dir: str,
                        terms: tuple[str, ...] = ("spark", "hash",
                                                  "window"),
                        k1: float = 1.2, b: float = 0.75,
                        k: int = 20) -> rd.Dataset:
    """Ranking-quality evaluation of the BM25 retriever: NDCG@k
    (Jarvelin-Kekalainen 2002 exponential-gain form) and MRR@k
    against a graded relevance oracle rel(d) = total query-term
    occurrences in d — the standard offline IR report an LLM
    retrieval/data-selection pipeline runs before trusting a ranker.
    The ranked-overlap sibling (:func:`rbo_rankings`) compares two
    rankings; this scores one ranking against labels.

    Plan: the same two streaming passes as :func:`bm25_search`
    (corpus-stats fold, then embarrassingly-parallel scoring), except
    the scoring pass keeps TWO partial top-k folds per block — by
    (score desc, doc_id) for the DCG numerator and by (rel desc,
    doc_id) for the ideal DCG — so the final exchange carries
    2k x blocks rows and nothing is globally sorted. MRR@k is the
    reciprocal rank of the first rel>0 doc within the final top-k
    (0 when none). Output: one row (k, n_rel_at_k, ndcg_at_k,
    mrr_at_k) rounded to 6."""

    def _tok(batch: pa.Table):
        # DuckDB trim() strips spaces only — match it exactly so a
        # tab/newline-edged doc tokenizes identically to the oracle
        # (ADVICE r03)
        trimmed = pc.utf8_trim(batch.column("text"), " ")
        mask = pc.not_equal(trimmed, "")
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False)[mask.to_numpy(zero_copy_only=False)]
        lists = pc.split_pattern_regex(pc.filter(trimmed, mask),
                                       r"\s+")
        lens = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return ids, lens, pc.list_flatten(lists)

    def _tf(lens: np.ndarray, flat: pa.Array) -> np.ndarray:
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        out = np.zeros((len(lens), len(terms)), dtype=np.int64)
        for j, t in enumerate(terms):
            eq = pc.cast(pc.equal(flat, t), pa.int64()).to_numpy(
                zero_copy_only=False)
            if len(eq):
                s = np.add.reduceat(eq, starts)
                s[lens == 0] = 0
                out[:, j] = s
        return out

    def stats_partial(batch: pa.Table) -> pa.Table:
        ids, lens, flat = _tok(batch)
        tfm = _tf(lens, flat)
        row = {"n": pa.array([len(ids)], pa.int64()),
               "total": pa.array([int(lens.sum())], pa.int64())}
        for j in range(len(terms)):
            row[f"df{j}"] = pa.array([int((tfm[:, j] > 0).sum())],
                                     pa.int64())
        return pa.Table.from_pydict(row)

    stats = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        stats_partial, batch_format="pyarrow").to_pandas()
    n_docs = float(stats["n"].sum())
    avgdl = float(stats["total"].sum()) / n_docs
    idf = np.array([
        np.log((n_docs - float(stats[f"df{j}"].sum()) + 0.5)
               / (float(stats[f"df{j}"].sum()) + 0.5) + 1.0)
        for j in range(len(terms))])

    def fold_partial(batch: pa.Table) -> pa.Table:
        ids, lens, flat = _tok(batch)
        tfm = _tf(lens, flat).astype(np.float64)
        norm = k1 * (1.0 - b + b * lens.astype(np.float64) / avgdl)
        score = np.zeros(len(ids))
        for j in range(len(terms)):  # fixed order == SQL's + chain
            score = score + idf[j] * tfm[:, j] * (k1 + 1.0) \
                / (tfm[:, j] + norm)
        df = pd.DataFrame({"doc_id": ids.astype(np.int64),
                           "score": score,
                           "rel": tfm.sum(axis=1).astype(np.int64)})
        top = df.sort_values(["score", "doc_id"],
                             ascending=[False, True]).head(k) \
            .assign(is_ideal=False)
        ideal = df.sort_values(["rel", "doc_id"],
                               ascending=[False, True]).head(k) \
            .assign(is_ideal=True)
        return table_from_pandas(pd.concat([top, ideal],
                                           ignore_index=True),
                                 preserve_index=False)

    folded = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fold_partial, batch_format="pyarrow").repartition(1)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        ranked = df[~df["is_ideal"]].sort_values(
            ["score", "doc_id"], ascending=[False, True]).head(k)
        ideal = df[df["is_ideal"]].sort_values(
            ["rel", "doc_id"], ascending=[False, True]).head(k)
        disc = np.log2(np.arange(1, len(ranked) + 1) + 1.0)
        rrel = ranked["rel"].to_numpy(np.float64)
        dcg = float(((2.0 ** rrel - 1.0) / disc).sum())
        idisc = np.log2(np.arange(1, len(ideal) + 1) + 1.0)
        idcg = float(((2.0 ** ideal["rel"].to_numpy(np.float64)
                       - 1.0) / idisc).sum())
        hit = np.nonzero(rrel > 0)[0]
        mrr = 1.0 / (int(hit[0]) + 1) if len(hit) else 0.0
        return pd.DataFrame({
            "k": [np.int64(k)],
            "n_rel_at_k": [np.int64((rrel > 0).sum())],
            "ndcg_at_k": round_half_up(
                np.array([dcg / idcg if idcg > 0 else 0.0]), 6),
            "mrr_at_k": round_half_up(np.array([mrr]), 6)})

    return folded.map_batches(finish, batch_format="pandas")


def conformal_length_bounds(sf_dir: str,
                            alpha: float = 0.1) -> rd.Dataset:
    """Split-conformal prediction intervals for document length by
    language (Vovk et al. 2005; Lei et al. JASA'18 split form): the
    calibration half (Knuth-hash doc split, consistent with
    train_test_split) fits the trivial per-lang mean predictor and
    takes the ceil((n+1)(1-alpha))-th smallest absolute residual as
    the conformal radius q_hat; the held-out half reports empirical
    coverage — the finite-sample-valid uncertainty audit a data-
    quality pipeline runs before trusting per-group tolerance bands.

    Plan: ONE narrow pass folds a (lang, split, n_chars) VALUE
    histogram (domain-bounded: langs x 2 x |length domain|, never
    rows); every downstream quantity — calibration mean, the exact
    k-th order statistic of |y - mu| (weighted selection over the
    value domain), and test-side coverage — derives from that one
    reduced table in the finish. No sort of the corpus, no second
    pass. Output: (lang, n_calib, n_test, mu, q_hat, coverage)
    sorted by lang, floats rounded to 6."""
    from ..stages.hashagg import hash_groupby_agg

    ds = _docs(sf_dir, ["doc_id", "lang", "n_chars"])

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        u = df["doc_id"].to_numpy(dtype=np.int64)
        with np.errstate(over="ignore"):
            split = ((u.astype(np.uint64) * np.uint64(2654435761))
                     % np.uint64(1 << 32) % np.uint64(2)).astype(
                         np.int64)
        return (pd.DataFrame({"lang": df["lang"].to_numpy(),
                              "split": split,
                              "n_chars": df["n_chars"].to_numpy(
                                  np.int64),
                              "c": np.int64(1)})
                .groupby(["lang", "split", "n_chars"],
                         as_index=False).sum())

    h = hash_groupby_agg(
        ds.map_batches(hist, batch_format="pandas"),
        ["lang", "split", "n_chars"], {"c": ("c", "sum")},
        num_parts=4)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for lang, g in df.groupby("lang"):
            cal = g[g["split"] == 0]
            tst = g[g["split"] == 1]
            # ADVICE r03: a language with an empty calibration or
            # test split has no conformal bound — skip it, mirroring
            # the oracle's inner-join semantics (its rows drop out)
            if len(cal) == 0 or len(tst) == 0:
                continue
            v = cal["n_chars"].to_numpy(np.float64)
            c = cal["c"].to_numpy(np.float64)
            n_cal = c.sum()
            mu = float((v * c).sum()) / n_cal
            score = np.abs(v - mu)
            order = np.argsort(score, kind="stable")
            k = float(np.ceil((n_cal + 1.0) * (1.0 - alpha)))
            k = min(k, n_cal)
            cum = np.cumsum(c[order])
            q_hat = float(score[order][np.searchsorted(
                cum, k, side="left")])
            tv = tst["n_chars"].to_numpy(np.float64)
            tc = tst["c"].to_numpy(np.float64)
            n_tst = tc.sum()
            cov = float(tc[np.abs(tv - mu) <= q_hat].sum()) / n_tst
            out.append((lang, int(n_cal), int(n_tst), mu, q_hat,
                        cov))
        r = pd.DataFrame(out, columns=["lang", "n_calib", "n_test",
                                       "mu", "q_hat", "coverage"])
        r["mu"] = round_half_up(r["mu"].to_numpy(), 6)
        r["q_hat"] = round_half_up(r["q_hat"].to_numpy(), 6)
        r["coverage"] = round_half_up(r["coverage"].to_numpy(), 6)
        return r.sort_values("lang").reset_index(drop=True)

    return h.repartition(1).map_batches(finish,
                                        batch_format="pandas")
