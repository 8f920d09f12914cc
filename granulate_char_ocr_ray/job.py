"""Batch-job entrypoint (the ``ray job submit`` surface, replacing the
reference's FastAPI serving surface, ``backend/main.py:1-33``).

    python -m granulate_char_ocr_ray.job --input docs.parquet \
        --output /tmp/out --partitions 8 [--resume] [--mode fused]

Owns its Ray session (guarded init) — library code never does.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="granulate extraction job")
    p.add_argument("--input", required=True, help="docs table (parquet dir/file)"
                   " — for --job dedup, the sf dir holding documents.parquet")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--job", choices=["extract", "dedup"], default="extract",
                   help="extract: the flagship span pipeline; dedup: the"
                   " checkpointed near-dedup job (decision + apply)")
    p.add_argument("--pair-source", choices=["minhash", "ngram"],
                   default="minhash", help="dedup pair tier")
    p.add_argument("--partitions", type=int, default=8)
    p.add_argument("--mode", choices=["fused", "fanout", "auto"],
                   default="fused")
    p.add_argument("--concurrency", type=int, default=4)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--stop-after", type=int, default=None,
                   help="process at most N partitions (testing)")
    p.add_argument("--num-cpus", type=int, default=None)
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    if args.job == "dedup":
        from .state.checkpoint import run_dedup_job

        summary = run_dedup_job(
            args.input,
            args.output,
            pair_source=args.pair_source,
            num_partitions=args.partitions,
            resume=not args.no_resume,
            stop_after=args.stop_after,
        )
    else:
        from .state.checkpoint import run_extract_job

        summary = run_extract_job(
            args.input,
            args.output,
            num_partitions=args.partitions,
            resume=not args.no_resume,
            mode=args.mode,
            concurrency=args.concurrency,
            stop_after=args.stop_after,
        )
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
