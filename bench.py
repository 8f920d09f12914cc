"""Benchmark driver.

    python bench.py             # one JSON line: headline + per-query secs
    python bench.py --scaling   # same headline at num_cpus=8 and 32 in
                                # fresh processes; reports scaling efficiency

Input: $GRAFT_SF_DIR (default /root/testdata/sf0.1).
CPUs:  $RAY_GRAFT_CPUS (default 32).
Trials: $GRAFT_BENCH_TRIALS (default 2) — every timing is best-of-N:
this host shows heavy steal-time variance (identical queries vary
1.5-5x minutes apart), so the minimum wall is the estimator of machine
capability; a single sample is dominated by scheduler noise.

Headline: the flagship extraction pipeline (derive interleaved docs from
the documents table, replicated REPLICATE times with distinct doc_ids ->
explode -> text extractors -> glyph classifier actor pool -> sorted
parquet sink under /tmp). Reported value = wall seconds; docs/sec and
spans/sec ride along (BASELINE.md context: the reference runs the same
per-document work single-process at ~23.5 docs/s).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("GRAFT_BENCH_REPLICATE", "16"))
TRIALS = int(os.environ.get("GRAFT_BENCH_TRIALS", "2"))


def derive_docs_replicated(sf_dir: str, replicate: int):
    """derive_docs over the documents table replicated with doc_id
    offsets of 10^7 per replica (deterministic, distinct doc ids)."""
    import pyarrow as pa
    import ray.data as rd

    from granulate_char_ocr_ray.synth import derive_docs_batch

    def _derive(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        tables = []
        for r in range(replicate):
            tables.append(derive_docs_batch(ids + r * 10_000_000, texts))
        return pa.concat_tables(tables)

    # force enough input blocks that every stage can use all CPUs: the
    # fused derive->explode->extract->classify chain gets one task per
    # block, so block count must comfortably exceed the actor pool size
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"],
                         override_num_blocks=max(128, 4 * NUM_CPUS))
    return ds.map_batches(_derive, batch_format="pyarrow")


def _best_of(fn, trials: int = TRIALS) -> float:
    """Best-of-N wall time of fn() (see module docstring: min wall is
    the capability estimator under heavy steal-time variance)."""
    best = float("inf")
    for _ in range(max(1, trials)):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def _free_gb(path: str = "/tmp") -> float:
    return shutil.disk_usage(path).free / 2**30


# Ray kills tasks outright at 95% fs utilization (OutOfDiskError), so
# the guard must trip FIRST: 7% of the filesystem (or 8 GB if larger).
# Measured in this sandbox: ~95 queries in one session accumulate tens
# of GB of spilled objects; the guard's session restart reclaims them.
MIN_FREE_GB = float(os.environ.get(
    "GRAFT_BENCH_MIN_FREE_GB",
    str(max(8.0, shutil.disk_usage("/tmp").total / 2**30 * 0.07))))


def _cleanup_tmp() -> None:
    """Drop every persistent bench/layout artifact under /tmp so
    repeated rounds can't accumulate toward the 95% disk-kill
    threshold (VERDICT r03: BENCH_r03 died of OutOfDiskError with
    parsed=null — a bench must never be able to report nothing)."""
    import glob

    for pat in ("/tmp/bench_out", "/tmp/graft_layouts",
                "/tmp/clustered_*", "/tmp/bucketed_*",
                "/tmp/hive_docs_*"):
        for d in glob.glob(pat):
            shutil.rmtree(d, ignore_errors=True)


def _restart_ray() -> None:
    """Fresh Ray session: reclaims every spilled object accumulated by
    earlier queries (the cause of mid-bench OutOfDiskError)."""
    import gc

    import ray

    gc.collect()
    ray.shutdown()
    ray.init(address="local", num_cpus=NUM_CPUS,
             include_dashboard=False, ignore_reinit_error=True,
             logging_level="ERROR")


def _disk_guard(queries: dict, errors: dict, name: str) -> bool:
    """True = enough disk to run the next query. Below MIN_FREE_GB the
    Ray session restarts once (frees spilled objects); still below ->
    the query is recorded as skipped and the bench emits partial JSON
    instead of dying at Ray's 95% disk kill."""
    if _free_gb() >= MIN_FREE_GB:
        return True
    _restart_ray()
    if _free_gb() >= MIN_FREE_GB:
        return True
    errors[name] = "skipped_low_disk(%.1fGB)" % _free_gb()
    return False


class _SchemaWarningCounter:
    """The VERDICT r02 #6 clean-log assertion, as data in the bench
    JSON. Two distinct warning species:

    - 'Failed to hash the schemas' — was OUR bug (pandas metadata made
      block schemas unhashable); fixed at the source (metadata-free
      read schemas + table_from_pandas), so the bench asserts ZERO.
    - 'RefBundle with a different schema' — WAS Ray-internal noise
      (the range sort emits schema-less empty blocks for empty key
      ranges); fixed at the executor boundary by
      raycompat.install() — 0-row empty-schema bundles now adopt the
      stream's schema — so since round 5 the bench asserts ZERO of
      these too (VERDICT r04 #2)."""

    def __init__(self) -> None:
        import logging

        self.unhashable = 0
        self.empty_bundle = 0
        counter = self

        class _H(logging.Handler):
            def emit(self, record):
                msg = record.getMessage()
                if "Failed to hash the schemas" in msg:
                    counter.unhashable += 1
                elif "RefBundle with a different schema" in msg:
                    counter.empty_bundle += 1

        logging.getLogger("ray.data").addHandler(_H())


def run_benchmarks() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    schema_warnings = _SchemaWarningCounter()

    from granulate_char_ocr_ray.pipelines import dedup, relational, similarity
    from granulate_char_ocr_ray.pipelines.extract import extract_spans

    _cleanup_tmp()

    # warm the page cache so we measure compute + shuffle, not cold reads
    derive_docs_replicated(SF_DIR, 1).count()

    queries: dict[str, float] = {}
    errors: dict[str, str] = {}

    only = os.environ.get("GRAFT_BENCH_QUERIES")
    if only:
        # query-subset mode (used by --scaling-queries): skip the
        # headline/fanout/reassembly extraction entirely
        _run_query_subset(set(only.split(",")), queries)
        return {
            "metric": "query subset wall times",
            "value": round(sum(queries.values()), 3),
            "unit": "sec",
            "queries": queries,
            "sf": SF_DIR,
            "num_cpus": NUM_CPUS,
            "schema_unhashable_warnings": schema_warnings.unhashable,
            "ray_empty_bundle_warnings": schema_warnings.empty_bundle,
        }

    # --- headline: flagship extraction to parquet sink ---
    out_dir = f"/tmp/bench_out/extract_cpus{NUM_CPUS}"

    def _headline():
        shutil.rmtree(out_dir, ignore_errors=True)
        docs = derive_docs_replicated(SF_DIR, REPLICATE)
        spans = extract_spans(docs, concurrency=max(2, NUM_CPUS - 4))
        spans.write_parquet(out_dir)

    headline_trials = max(1, TRIALS) if not os.environ.get(
        "GRAFT_BENCH_HEADLINE_ONLY") else 1
    result = {
        "metric": "flagship extraction wall time (sf docs x%d replicas)" % REPLICATE,
        "value": None,
        "unit": "sec",
        "queries": queries,
        "errors": errors,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "trials": headline_trials,
        "free_gb_start": round(_free_gb(), 1),
    }
    try:
        headline = _best_of(_headline, headline_trials)
        queries["extract_spans"] = headline

        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        out_tbl = pads.dataset(out_dir).to_table(columns=["doc_id"])
        n_spans = out_tbl.num_rows
        n_docs = len(pc.unique(out_tbl.column("doc_id")))
        result.update({
            "value": headline,
            "docs": n_docs,
            "spans": n_spans,
            "docs_per_s": round(n_docs / headline, 1),
            "spans_per_s": round(n_spans / headline, 1),
        })
    except Exception as exc:  # noqa: BLE001 — partial JSON beats rc=1
        errors["extract_spans"] = repr(exc)[:300]
    if os.environ.get("GRAFT_BENCH_HEADLINE_ONLY"):
        return result

    # --- fanout (salted) topology on the same corpus: the skew path.
    # VERDICT r01 #6 done-criterion: within 2x of fused after the
    # coarse-bucketed reassembly ---
    out_dir_f = f"/tmp/bench_out/extract_fanout_cpus{NUM_CPUS}"

    def _fanout():
        shutil.rmtree(out_dir_f, ignore_errors=True)
        docs = derive_docs_replicated(SF_DIR, REPLICATE)
        # AUTOSCALING pool for the pre-split topology: a fixed pool the
        # size of the fused one starves the concurrent text branch of
        # CPUs (11.7 s vs 8.8 s measured at sf0.1/32)
        spans_f = extract_spans(docs, mode="fanout",
                                concurrency=(2, max(2, NUM_CPUS - 4)))
        spans_f.write_parquet(out_dir_f)

    # --- auto (detected-skew) topology: whale detection runs on every
    # doc; the bench corpus has <=1 media span per doc so the whale arm
    # is empty — this measures the detection dispatch overhead vs fused
    out_dir_a = f"/tmp/bench_out/extract_auto_cpus{NUM_CPUS}"

    def _auto():
        shutil.rmtree(out_dir_a, ignore_errors=True)
        docs = derive_docs_replicated(SF_DIR, REPLICATE)
        # autoscaling pool like _fanout: a fixed fused pool starves the
        # concurrent whale-detection branch
        spans_a = extract_spans(docs, mode="auto",
                                concurrency=(2, max(2, NUM_CPUS - 4)))
        spans_a.write_parquet(out_dir_a)

    def _reassemble():
        import ray.data as rd

        # VERDICT r02 #3 done-criterion: within 1.5x of the span pipeline
        from granulate_char_ocr_ray.pipelines.extract import \
            reassemble_docs

        spans = rd.read_parquet(out_dir,
                                override_num_blocks=max(64, 2 * NUM_CPUS))
        reassemble_docs(spans).count()

    # --- fanout topology, per-doc reassembly, then the secondary
    # pipelines: each best-of-N, each individually guarded so one
    # failure (or a filling disk) costs one entry, never the JSON ---
    entries = [("extract_spans_fanout", _fanout),
               ("extract_spans_auto", _auto),
               ("reassemble_docs", _reassemble)] + _secondary_list()
    import gc

    for name, fn in entries:
        if not _disk_guard(queries, errors, name):
            continue
        try:
            queries[name] = _best_of(fn)
        except Exception as exc:  # noqa: BLE001
            if "OutOfDisk" in repr(exc):
                # spill refusal (object store + disk over Ray's 95%
                # threshold): accumulated spill from earlier queries
                # is the usual cause — a fresh session reclaims every
                # spilled object; retry the query once
                _restart_ray()
                try:
                    queries[name] = _best_of(fn, trials=1)
                except Exception as exc2:  # noqa: BLE001
                    errors[name] = repr(exc2)[:300]
            else:
                errors[name] = repr(exc)[:300]
        # drop the query's Dataset refs NOW so Ray can GC their
        # spilled objects — without this, spill accumulates across
        # the ~95 queries until Ray's 95% disk kill fires
        gc.collect()

    # clean-log check (VERDICT r02 #6): the unhashable-schema warning
    # must never reappear — it silently disables Ray's block schema
    # dedupe fast path on every merge. Recorded (not asserted): a
    # regression must show up in the JSON, not turn the run into rc=1.
    if schema_warnings.unhashable:
        errors["schema_unhashable_warnings"] = str(
            schema_warnings.unhashable)
    # same contract for empty-bundle schema divergence since the
    # raycompat fix (VERDICT r04 #2): any recurrence is a regression
    # and must show up in the JSON, not turn the run into rc=1.
    if schema_warnings.empty_bundle:
        errors["ray_empty_bundle_warnings"] = str(
            schema_warnings.empty_bundle)
    result["schema_unhashable_warnings"] = schema_warnings.unhashable
    result["ray_empty_bundle_warnings"] = schema_warnings.empty_bundle
    return result


def _run_query_subset(wanted: set, queries: dict) -> None:
    for name, fn in _secondary_list():
        if name in wanted:
            try:
                queries[name] = _best_of(fn)
            except Exception as exc:  # noqa: BLE001
                print("bench subset %s failed: %r" % (name, exc),
                      file=sys.stderr)


def _secondary_list():
    from granulate_char_ocr_ray.pipelines import (analysis, dedup, events,
                                                  media, relational,
                                                  similarity, training)

    return [
        ("q1_pricing_summary",
         lambda: relational.q1_pricing_summary(SF_DIR).to_pandas()),
        ("top_event_types",
         lambda: relational.top_event_types(SF_DIR).to_pandas()),
        ("revenue_by_nation",
         lambda: relational.revenue_by_nation(SF_DIR).to_pandas()),
        ("exact_dedup",
         lambda: dedup.exact_dedup(SF_DIR).to_pandas()),
        ("minhash_lsh_dups",
         lambda: dedup.minhash_lsh_dups(SF_DIR, threshold=0.8).to_pandas()),
        ("ann_cosine_topk",
         lambda: similarity.cosine_topk(SF_DIR, k=10).to_pandas()),
        ("simhash_near_dups",
         lambda: dedup.simhash_near_dups(SF_DIR).to_pandas()),
        ("embedding_cosine_dups",
         lambda: similarity.embedding_cosine_dups(SF_DIR).to_pandas()),
        ("q3_shipping_priority",
         lambda: relational.q3_shipping_priority(SF_DIR).to_pandas()),
        ("doc_quality",
         lambda: analysis.doc_quality(SF_DIR).to_pandas()),
        ("docs_without_media",
         lambda: media.docs_without_media(SF_DIR).to_pandas()),
        ("chunk_docs",
         lambda: training.chunk_docs(SF_DIR).count()),
        ("pii_redact",
         lambda: training.pii_redact(SF_DIR).count()),
        ("pack_sequences",
         lambda: training.pack_sequences(SF_DIR).count()),
        ("q5_local_supplier_volume",
         lambda: relational.q5_local_supplier_volume(SF_DIR).to_pandas()),
        ("large_orders",
         lambda: relational.large_orders(SF_DIR).to_pandas()),
        ("q4_order_priority",
         lambda: relational.q4_order_priority(SF_DIR).to_pandas()),
        ("q9_product_type_profit",
         lambda: relational.q9_product_type_profit(SF_DIR).to_pandas()),
        ("q21_waiting_suppliers",
         lambda: relational.q21_waiting_suppliers(SF_DIR).to_pandas()),
        ("bm25_search",
         lambda: analysis.bm25_search(SF_DIR).to_pandas()),
        ("bigram_pmi",
         lambda: analysis.bigram_pmi(SF_DIR).to_pandas()),
        ("substring_dups",
         lambda: dedup.substring_dups(SF_DIR).to_pandas()),
        ("funnel_counts",
         lambda: events.funnel_counts(SF_DIR).to_pandas()),
        ("co_purchase_pairs",
         lambda: relational.co_purchase_pairs(SF_DIR).to_pandas()),
        ("order_price_cume_dist",
         lambda: relational.order_price_cume_dist(SF_DIR).to_pandas()),
        ("filter_lm_quality",
         lambda: analysis.filter_lm_quality(SF_DIR).to_pandas()),
        ("knn_join",
         lambda: similarity.knn_join(SF_DIR).to_pandas()),
        ("source_token_entropy",
         lambda: analysis.source_token_entropy(SF_DIR).to_pandas()),
        ("session_time_coverage",
         lambda: events.session_time_coverage(SF_DIR).to_pandas()),
        ("revenue_gini",
         lambda: relational.revenue_gini(SF_DIR).to_pandas()),
        ("rrf_hybrid_search",
         lambda: analysis.rrf_hybrid_search(SF_DIR).to_pandas()),
        ("weighted_median_price",
         lambda: relational.weighted_median_price(SF_DIR).to_pandas()),
        ("event_transition_probs",
         lambda: events.event_transition_probs(SF_DIR).to_pandas()),
        ("lm_quality_tiers",
         lambda: analysis.lm_quality_tiers(SF_DIR).count()),
        ("leakage_safe_split",
         lambda: dedup.leakage_safe_split(SF_DIR).count()),
        ("gopher_quality_rules",
         lambda: analysis.gopher_quality_rules(SF_DIR).count()),
        ("ngram_repetition",
         lambda: training.ngram_repetition(SF_DIR).count()),
        ("dsir_importance_weights",
         lambda: analysis.dsir_importance_weights(SF_DIR).count()),
        ("incremental_dedup",
         lambda: dedup.incremental_dedup(SF_DIR).count()),
        ("ngram_containment_dups",
         lambda: dedup.ngram_containment_dups(SF_DIR).count()),
        ("image_phash_dups",
         lambda: media.image_phash_dups(SF_DIR).count()),
        ("user_event_windows",
         lambda: events.user_event_windows(SF_DIR).count()),
        ("event_rate_anomalies",
         lambda: events.event_rate_anomalies(SF_DIR).count()),
        ("paragraph_dedup",
         lambda: dedup.paragraph_dedup(SF_DIR).count()),
        ("boilerplate_removal",
         lambda: dedup.boilerplate_removal(SF_DIR).count()),
        ("collapse_repeat_tokens",
         lambda: training.collapse_repeat_tokens(SF_DIR).count()),
        ("filter_attrition_report",
         lambda: analysis.filter_attrition_report(SF_DIR)),
        ("dup_window_fraction",
         lambda: dedup.dup_window_fraction(SF_DIR).count()),
        ("train_quality_classifier",
         lambda: analysis.train_quality_classifier(SF_DIR).count()),
        ("source_kl_divergence",
         lambda: analysis.source_kl_divergence(SF_DIR).count()),
        ("snapshot_diff",
         lambda: dedup.snapshot_diff(SF_DIR).count()),
        ("triangle_count",
         lambda: relational.triangle_count(SF_DIR).to_pandas()),
        ("vertex_clustering",
         lambda: relational.vertex_clustering(SF_DIR).to_pandas()),
        ("snm_candidate_pairs",
         lambda: dedup.snm_candidate_pairs(SF_DIR).count()),
        ("oov_rate_per_doc",
         lambda: analysis.oov_rate_per_doc(SF_DIR).count()),
        ("late_event_counts",
         lambda: events.late_event_counts(SF_DIR).to_pandas()),
        ("cross_source_dup_matrix",
         lambda: dedup.cross_source_dup_matrix(SF_DIR).count()),
        ("pq_recall",
         lambda: similarity.pq_recall(SF_DIR).to_pandas()),
        ("star_revenue_rollup",
         lambda: relational.star_revenue_rollup(SF_DIR).count()),
        ("rfm_scores",
         lambda: relational.rfm_scores(SF_DIR).count()),
        ("data_expectations",
         lambda: relational.data_expectations(SF_DIR).to_pandas()),
        ("cluster_top_terms",
         lambda: analysis.cluster_top_terms(SF_DIR).to_pandas()),
        ("compression_ratio_quality",
         lambda: analysis.compression_ratio_quality(SF_DIR).count()),
        ("purchase_view_band_join",
         lambda: events.purchase_view_band_join(SF_DIR).count()),
        ("session_paths_topk",
         lambda: events.session_paths_topk(SF_DIR).to_pandas()),
        ("priority_price_ntile",
         lambda: relational.priority_price_ntile(SF_DIR).to_pandas()),
        ("zipf_fit_by_source",
         lambda: analysis.zipf_fit_by_source(SF_DIR).to_pandas()),
        ("epoch_shuffle_order",
         lambda: training.epoch_shuffle_order(SF_DIR).count()),
        ("kcenter_coreset",
         lambda: similarity.kcenter_coreset(SF_DIR, k=8)),
        ("gram_novelty",
         lambda: analysis.gram_novelty(SF_DIR).count()),
        ("hopping_event_counts",
         lambda: events.hopping_event_counts(SF_DIR).count()),
        ("audience_overlap",
         lambda: events.audience_overlap(SF_DIR).to_pandas()),
        ("session_duration_km",
         lambda: events.session_duration_km(SF_DIR)),
        ("isotonic_calibration",
         lambda: analysis.isotonic_calibration(SF_DIR)),
        ("qty_discount_kendall",
         lambda: relational.qty_discount_kendall(SF_DIR).to_pandas()),
        ("price_mannwhitney",
         lambda: relational.price_mannwhitney(SF_DIR).to_pandas()),
        ("classifier_auc",
         lambda: analysis.classifier_auc(SF_DIR)),
        ("als_recommendations",
         lambda: relational.als_recommendations(SF_DIR).to_pandas()),
        ("price_ks_test",
         lambda: relational.price_ks_test(SF_DIR).to_pandas()),
        ("price_anova_f",
         lambda: relational.price_anova_f(SF_DIR).to_pandas()),
        ("qty_discount_theilsen",
         lambda: relational.qty_discount_theilsen(SF_DIR).to_pandas()),
        ("dbscan_embeddings",
         lambda: similarity.dbscan_embeddings(SF_DIR).to_pandas()),
        ("holt_winters_daily",
         lambda: relational.holt_winters_daily(SF_DIR).to_pandas()),
        # --- round 4: lakehouse layouts + curation ops ---
        ("pruned_orderkey_revenue",
         lambda: relational.pruned_orderkey_revenue(SF_DIR).to_pandas()),
        ("bucketed_segment_revenue",
         lambda: relational.bucketed_segment_revenue(SF_DIR).to_pandas()),
        ("hive_partition_stats",
         lambda: analysis.hive_partition_stats(SF_DIR).to_pandas()),
        ("word_blocklist_filter",
         lambda: analysis.word_blocklist_filter(SF_DIR).count()),
        ("sanitize_text",
         lambda: training.sanitize_text(SF_DIR).count()),
        ("interleave_sources",
         lambda: training.interleave_sources(SF_DIR).count()),
        ("pii_stats_by_source",
         lambda: training.pii_stats_by_source(SF_DIR).to_pandas()),
        ("media_jpeg_metadata",
         lambda: media.media_jpeg_metadata(SF_DIR).count()),
        ("dedup_survivors",
         lambda: dedup.dedup_survivors(SF_DIR).count()),
        ("interarrival_exp_fit",
         lambda: events.interarrival_exp_fit(SF_DIR).to_pandas()),
        ("dup_length_bias",
         lambda: analysis.dup_length_bias(SF_DIR).to_pandas()),
        ("checkpointed_dedup", _checkpointed_dedup),
    ]


def _checkpointed_dedup():
    """End-to-end resumable dedup job (round 5): decision drop-set +
    partitioned anti-filter apply, fresh run each trial."""
    import shutil as _sh

    from granulate_char_ocr_ray.state.checkpoint import run_dedup_job

    out = "/tmp/bench_out/ckpt_dedup"
    _sh.rmtree(out, ignore_errors=True)
    run_dedup_job(SF_DIR, out, pair_source="minhash",
                  num_partitions=8, resume=False)


def _burn_task(_: int) -> float:
    """One perfectly-parallel CPU-bound work unit (vectorized uint64
    mix over a 24 MB buffer — no BLAS threads, no shared state)."""
    import numpy as np
    x = np.arange(3_000_000, dtype=np.uint64)
    t0 = time.time()
    for _ in range(60):
        x = x * np.uint64(0x9E3779B97F4A7C15) + np.uint64(1)
        x ^= x >> np.uint64(31)
    return time.time() - t0


def host_ceiling(lo_cpu: int, hi_cpu: int) -> dict:
    """Measured MAXIMUM achievable lo->hi scaling efficiency on this
    host *right now*: a perfectly-parallel multiprocessing burn (one
    task per worker) at both worker counts. This sandbox is a KVM
    guest with invisible steal (steal=0 in /proc/stat while vCPU
    throughput drops up to 5x) — in a contended window even ideal code
    measures far below 1.0 (observed burn ceilings 0.41-0.5), so every
    query efficiency must be read AGAINST the ceiling of its window,
    and scaling evidence is only collected when the ceiling itself is
    healthy (see run_scaling_queries' quiet-window gate)."""
    import multiprocessing as mp

    walls = {}
    for n in (lo_cpu, hi_cpu):
        with mp.Pool(n) as p:
            t0 = time.time()
            p.map(_burn_task, range(n))
            walls[n] = time.time() - t0
    # throughput = tasks/sec; efficiency = throughput ratio / cpu ratio
    thr_lo, thr_hi = lo_cpu / walls[lo_cpu], hi_cpu / walls[hi_cpu]
    return {
        "ceiling": round((thr_hi / thr_lo) / (hi_cpu / lo_cpu), 3),
        f"burn_{lo_cpu}w_s": round(walls[lo_cpu], 2),
        f"burn_{hi_cpu}w_s": round(walls[hi_cpu], 2),
    }


def run_scaling() -> dict:
    """Same headline job at two parallelism levels in fresh processes
    (the sandbox stand-in for N vs 4N cluster nodes)."""
    results = {}
    # scaling runs use a larger corpus so fixed costs (session + actor
    # pool startup, final sort, sink) amortize: the point is steady-state
    # throughput ratio, the sandbox stand-in for N vs 4N nodes
    scaling_replicate = str(max(REPLICATE, 64))
    trials = int(os.environ.get("GRAFT_SCALING_TRIALS", "2"))
    lo_cpu, hi_cpu = (
        int(x) for x in os.environ.get("GRAFT_SCALING_CPUS", "8,32").split(",")
    )
    for ncpu in (lo_cpu, hi_cpu):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_BENCH_HEADLINE_ONLY="1",
                   GRAFT_BENCH_REPLICATE=scaling_replicate)
        best = None
        for _ in range(trials):
            proc = subprocess.run(
                [sys.executable,
                 os.path.join(os.path.dirname(__file__) or ".", "bench.py")],
                env=env, capture_output=True, text=True,
            )
            try:
                r = json.loads(proc.stdout.strip().splitlines()[-1])
            except (IndexError, ValueError):
                print("scaling trial (cpus=%d) failed rc=%d: %s"
                      % (ncpu, proc.returncode, proc.stderr[-400:]),
                      file=sys.stderr)
                continue
            if r.get("value") is None:
                continue
            # best-of-N: this host shows heavy steal-time variance; min
            # wall is the estimator of machine capability at each level
            if best is None or r["value"] < best["value"]:
                best = r
        results[ncpu] = best
    if results[lo_cpu] is None or results[hi_cpu] is None:
        return {"metric": "scaling efficiency (flagship extraction)",
                "value": None, "unit": "efficiency", "sf": SF_DIR,
                "error": "a parallelism level produced no successful trial"}
    t_lo, t_hi = results[lo_cpu]["value"], results[hi_cpu]["value"]
    eff = (t_lo / t_hi) / (hi_cpu / lo_cpu)
    return {
        "metric": f"scaling efficiency {lo_cpu}->{hi_cpu} cpus (flagship extraction)",
        "value": round(eff, 3),
        "unit": "efficiency",
        f"sec_{lo_cpu}cpu": t_lo,
        f"sec_{hi_cpu}cpu": t_hi,
        f"docs_per_s_{lo_cpu}cpu": results[lo_cpu]["docs_per_s"],
        f"docs_per_s_{hi_cpu}cpu": results[hi_cpu]["docs_per_s"],
        "host_ceiling": host_ceiling(lo_cpu, hi_cpu),
        "sf": SF_DIR,
    }


def _wait_quiet_window(lo_cpu: int, hi_cpu: int) -> dict:
    """Poll the burn ceiling until the host is quiet enough for a
    meaningful scaling A/B (or the wait budget runs out). Controlled by
    GRAFT_SCALING_MIN_CEILING (default 0.8 — below that even perfectly
    parallel code cannot register) and GRAFT_SCALING_MAX_WAIT_S
    (default 0: measure once, don't wait)."""
    min_ceiling = float(os.environ.get("GRAFT_SCALING_MIN_CEILING", "0.8"))
    max_wait = float(os.environ.get("GRAFT_SCALING_MAX_WAIT_S", "0"))
    deadline = time.time() + max_wait
    best = host_ceiling(lo_cpu, hi_cpu)
    while best["ceiling"] < min_ceiling and time.time() < deadline:
        time.sleep(60)
        c = host_ceiling(lo_cpu, hi_cpu)
        if c["ceiling"] > best["ceiling"]:
            best = c
        if c["ceiling"] >= min_ceiling:
            return c
    return best


def _prepare_scaling_corpus(replicate: int) -> str:
    """Synthetic scaled documents table for query-level scaling runs:
    sf0.1 holds only 5k docs / 1.5 MB of text — far too small for a
    parallelism A/B (fixed session + exchange costs dominate sub-second
    walls). Docs are sampled deterministically (PCG64 seed 0) from the
    sf0.1 word distribution with lengths drawn from the original
    doc-length distribution, plus a bounded 3% exact-duplicate
    injection (each dup copies one of the previous 1,000 docs) so the
    dedup queries have real pairs to find. Two rejected designs:

    - replicated/rotated corpus: every doc's N replicas are mutual
      near-duplicates -> LSH-bucket pairwork O(N^2) per original doc;
    - resampling the RAW 31-word sf0.1 vocabulary: background
      char-3-gram Jaccard between unrelated docs stays ~0.5, so LSH
      candidate pairs grow quadratically in corpus size regardless of
      dup structure (3e9 candidate pairs at x64). Real corpora grow
      vocabulary with size (Heaps' law), keeping background similarity
      low; the generator therefore maps each (base word, uniform 0-63
      tag) pair to a distinct random letter string (31 -> 1,984
      distinct words with the original frequency shape). Suffix-only
      tags were ALSO rejected: the char-3-grams inside the 31 base
      words are shared by every suffixed variant, keeping background
      signature agreement ~0.3. Fully distinct words put LSH in its
      linear regime: only injected dups collide."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out_dir = f"/tmp/scaling_synth_x{replicate}"
    out = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(out):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["text", "lang", "source"])
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    sources = t.column("source").to_pylist()
    words = np.array(" ".join(texts).split(" "))
    lens = np.array([max(1, s.count(" ") + 1) for s in texts])
    rng = np.random.Generator(np.random.PCG64(0))
    _, base_rank = np.unique(words, return_inverse=True)
    n_base = int(base_rank.max()) + 1
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    vocab = np.array([
        "".join(letters[rng.integers(0, 26, size=int(L))])
        for L in rng.integers(4, 10, size=n_base * 64)])
    n_docs = replicate * len(texts)
    doc_lens = rng.choice(lens, size=n_docs)
    doc_texts: list[str] = []
    for i in range(n_docs):
        if i >= 40 and rng.random() < 0.03:
            doc_texts.append(
                doc_texts[i - 1 - int(rng.integers(0, min(i, 1000)))])
        else:
            n_w = int(doc_lens[i])
            base = base_rank[rng.integers(0, len(words), size=n_w)]
            suf = rng.integers(0, 64, size=n_w)
            doc_texts.append(" ".join(vocab[base * 64 + suf]))
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": pa.array(doc_texts, pa.string()),
        "lang": pa.array([langs[i % len(langs)] for i in range(n_docs)]),
        "source": pa.array([sources[i % len(sources)] for i in range(n_docs)]),
        "n_chars": pa.array([len(s) for s in doc_texts], pa.int64()),
        # 5k-row groups (~2 MB text): Ray fuses ReadParquet->MapBatches
        # and cannot split a parquet read below row-group granularity,
        # so a 50k-row-group file capped every fused map stage at
        # 320k/50k = 7 concurrent tasks NO MATTER the CPU count —
        # measured as a hard 8->32 scaling ceiling (minhash 0.41)
        # that vanished with data-sized groups. Real multi-file corpora
        # parallelize by file; a single-file benchmark must carry its
        # parallelism in its row groups.
    }), out, row_group_size=5_000)
    return out_dir


def run_scaling_queries() -> dict:
    """Two-level scaling evidence for the LLM-pipeline family (VERDICT
    r02 next-steps #8): minhash / substring-dedup / perplexity-filter
    at lo and hi num_cpus in fresh processes, best-of-N each, with
    per-query efficiency. Runs over the synthetic scaled corpus from
    :func:`_prepare_scaling_corpus` — at raw sf0.1 (5k docs) these
    queries finish in ~1-7 s where fixed costs dominate and no
    parallelism level can help."""
    qnames = os.environ.get(
        "GRAFT_SCALING_QUERY_SET",
        "minhash_lsh_dups,substring_dups,filter_lm_quality")
    trials = int(os.environ.get("GRAFT_SCALING_TRIALS", "2"))
    replicate = int(os.environ.get("GRAFT_SCALING_QUERY_REPLICATE", "64"))
    corpus = _prepare_scaling_corpus(replicate)
    lo_cpu, hi_cpu = (
        int(x) for x in os.environ.get("GRAFT_SCALING_CPUS", "8,32").split(",")
    )
    ceiling = _wait_quiet_window(lo_cpu, hi_cpu)
    per_level: dict[int, dict] = {}
    for ncpu in (lo_cpu, hi_cpu):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_BENCH_QUERIES=qnames,
                   GRAFT_SF_DIR=corpus)
        best: dict[str, float] = {}
        for _ in range(trials):
            proc = subprocess.run(
                [sys.executable,
                 os.path.join(os.path.dirname(__file__) or ".", "bench.py")],
                env=env, capture_output=True, text=True,
            )
            try:
                r = json.loads(proc.stdout.strip().splitlines()[-1])
            except (IndexError, ValueError):
                print("scaling-query trial (cpus=%d) failed rc=%d: %s"
                      % (ncpu, proc.returncode, proc.stderr[-400:]),
                      file=sys.stderr)
                continue
            for q, sec in r["queries"].items():
                best[q] = min(best.get(q, float("inf")), sec)
        per_level[ncpu] = best
    ratio = hi_cpu / lo_cpu
    out = {"metric": f"per-query scaling {lo_cpu}->{hi_cpu} cpus",
           "unit": "efficiency", "sf": SF_DIR,
           "host_ceiling": ceiling, "queries": {}}
    for q in per_level[lo_cpu]:
        if q not in per_level[hi_cpu]:
            continue
        t_lo, t_hi = per_level[lo_cpu][q], per_level[hi_cpu][q]
        out["queries"][q] = {
            f"sec_{lo_cpu}cpu": t_lo, f"sec_{hi_cpu}cpu": t_hi,
            "efficiency": round((t_lo / t_hi) / ratio, 3),
        }
    out["value"] = round(
        sum(v["efficiency"] for v in out["queries"].values())
        / max(1, len(out["queries"])), 3)
    return out


if __name__ == "__main__":
    try:
        if "--scaling-queries" in sys.argv:
            print(json.dumps(run_scaling_queries()))
        elif "--scaling" in sys.argv:
            print(json.dumps(run_scaling()))
        else:
            result = run_benchmarks()
            import ray

            ray.shutdown()
            print(json.dumps(result))
    except Exception as exc:  # noqa: BLE001 — the ONE bench contract:
        # always print a parseable JSON line, whatever happened
        import traceback

        traceback.print_exc()
        print(json.dumps({"metric": "bench crashed", "value": None,
                          "unit": "sec", "queries": {},
                          "sf": SF_DIR, "num_cpus": NUM_CPUS,
                          "error": repr(exc)[:500]}))
