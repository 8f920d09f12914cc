"""Hard-kill recovery demonstration for the checkpointed job surface.

The pytest suite proves kill/resume identity via the ``stop_after``
hook (a cooperative stop). This script proves the REAL thing the north
rule asks for: a ``ray job``-style process is SIGKILLed mid-run — no
cleanup code runs — and a fresh process resumes from the last
committed partition, producing byte-identical output to an
uninterrupted run.

    python tools/kill_resume_demo.py [--job extract|dedup]

Prints one JSON line: {job, killed_after_s, partitions_before_kill,
partitions_after_resume, identical, wall_clean_s, wall_resume_s}.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spawn(args: list[str]):
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.Popen(
        [sys.executable, "-m", "granulate_char_ocr_ray.job", *args],
        cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )


def _committed(out_dir: str) -> list[int]:
    sys.path.insert(0, REPO)
    from granulate_char_ocr_ray.state.checkpoint import committed_partitions
    return sorted(committed_partitions(out_dir))


def _output_table(out_dir: str):
    sys.path.insert(0, REPO)
    from granulate_char_ocr_ray.state.checkpoint import read_job_output
    return read_job_output(out_dir)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--job", choices=["extract", "dedup"], default="extract")
    p.add_argument("--partitions", type=int, default=8)
    p.add_argument("--kill-after", type=float, default=None,
                   help="seconds before SIGKILL (default: ~40%% of the"
                   " clean run's wall)")
    args = p.parse_args()

    sf = "/root/testdata/sf0.001"
    base = f"/tmp/kill_resume_demo_{args.job}"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)

    if args.job == "dedup":
        job_args = ["--job", "dedup", "--input", sf]
    else:
        # stage the derived interleaved docs once as the job input
        import ray
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
        from ray.data import DataContext
        DataContext.get_current().enable_progress_bars = False
        sys.path.insert(0, REPO)
        from granulate_char_ocr_ray.pipelines.extract import derive_docs
        derive_docs(sf).write_parquet(f"{base}/docs")
        ray.shutdown()
        job_args = ["--input", f"{base}/docs"]

    common = job_args + ["--partitions", str(args.partitions),
                         "--num-cpus", "8"]

    # 1. uninterrupted reference run
    t0 = time.time()
    proc = _spawn(common + ["--output", f"{base}/clean"])
    proc.wait()
    wall_clean = time.time() - t0
    assert proc.returncode == 0, "clean run failed"

    # 2. killed run: SIGKILL mid-apply — no cooperative shutdown
    kill_after = args.kill_after or max(2.0, 0.4 * wall_clean)
    proc = _spawn(common + ["--output", f"{base}/killed"])
    time.sleep(kill_after)
    if proc.poll() is None:
        os.kill(proc.pid, signal.SIGKILL)
        proc.wait()
        killed = True
    else:
        killed = False  # finished before the kill: demo degenerates
    before = _committed(f"{base}/killed")

    # 3. resume in a fresh process (default --resume)
    t0 = time.time()
    proc = _spawn(common + ["--output", f"{base}/killed"])
    out = proc.communicate()[0]
    wall_resume = time.time() - t0
    assert proc.returncode == 0, "resume run failed"
    summary = json.loads(out.strip().splitlines()[-1])

    a = _output_table(f"{base}/clean").to_pandas()
    b = _output_table(f"{base}/killed").to_pandas()
    identical = a.equals(b)

    print(json.dumps({
        "job": args.job,
        "was_killed_mid_run": killed,
        "killed_after_s": round(kill_after, 2),
        "partitions_before_kill": before,
        "resume_skipped": summary["skipped"],
        "resume_processed": summary["processed"],
        "identical_output": bool(identical),
        "rows": int(len(a)),
        "wall_clean_s": round(wall_clean, 2),
        "wall_resume_s": round(wall_resume, 2),
    }))
    shutil.rmtree(base, ignore_errors=True)
    return 0 if identical else 1


if __name__ == "__main__":
    raise SystemExit(main())
