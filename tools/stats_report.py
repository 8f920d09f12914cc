"""Per-stage performance anatomy of the flagship pipeline.

Runs the flagship extraction over $GRAFT_SF_DIR (default sf0.1) and
prints Ray Data's per-operator stats (``Dataset.stats()``) — wall time,
task counts, block sizes, and where memory went — the feedback loop
used to keep wall time dominated by useful compute (VERDICT criterion).

Usage: python tools/stats_report.py [fused|fanout|minhash|llm_prep]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    import ray

    mode = sys.argv[1] if len(sys.argv) > 1 else "fused"
    sf = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    t0 = time.time()
    if mode in ("fused", "fanout"):
        from granulate_char_ocr_ray.pipelines.extract import (
            derive_docs,
            extract_spans,
        )

        ds = extract_spans(derive_docs(sf), mode=mode,
                           concurrency=max(2, ncpu - 4))
    elif mode == "minhash":
        from granulate_char_ocr_ray.pipelines.dedup import minhash_lsh_dups

        ds = minhash_lsh_dups(sf, threshold=0.8)
    elif mode == "llm_prep":
        from granulate_char_ocr_ray.pipelines.training import (
            llm_prep_pipeline,
        )

        ds = llm_prep_pipeline(sf)
    else:
        raise SystemExit(f"unknown pipeline {mode!r}")
    out = ds.materialize()
    wall = time.time() - t0
    print(out.stats())
    print(f"\n=== {mode}: {out.count()} rows in {wall:.2f}s "
          f"({ncpu} cpus, {sf}) ===")
    ray.shutdown()


if __name__ == "__main__":
    main()
